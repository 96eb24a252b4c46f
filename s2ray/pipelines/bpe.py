"""Byte-level BPE tokenizer: bounded-sample training, distributed encode.

The canonical LLM-pipeline tokenization step.  Training is the classic
greedy merge loop (Sennrich et al. 2016) over the DISTINCT-word vocabulary
of a bounded deterministic sample — tokenizer training is never
distributed in practice (the vocabulary, not the corpus, is the state);
what must scale is ENCODING, which here is an actor-pool `map_batches`
stage holding the broadcast merge table plus a per-worker distinct-word
encoding cache (web text repeats words heavily, so the cache hit rate is
the whole game).

Determinism: sample = first `sample_rows` of the documents table in
doc_id order; merge ties break on (count DESC, pair lexicographic ASC).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.readers import read_table


def _word_counts(texts) -> dict[bytes, int]:
    import re

    vocab: dict[bytes, int] = {}
    for t in texts:
        if t is None:
            continue
        for w in re.split(r"\s+", t, flags=re.ASCII):
            if w:
                b = w.encode("utf-8")
                vocab[b] = vocab.get(b, 0) + 1
    return vocab


def train_bpe(sf_dir: str, n_merges: int = 200, sample_rows: int = 4096,
              text_col: str = "text") -> list[tuple[bytes, bytes]]:
    """Greedy BPE merge table from a bounded deterministic sample.

    Returns merges in rank order; merge i joins adjacent symbols (a, b)
    into a+b.  Training cost is O(n_merges * distinct words) on the
    driver — the sample is bounded (like ivf's k-means trainer), never
    the corpus.
    """
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/documents.parquet")
    first = next(pf.iter_batches(batch_size=sample_rows,
                                 columns=[text_col]), None)
    texts = first.column(0).to_pylist() if first is not None else []
    vocab = _word_counts(texts)
    # word -> list of byte symbols
    words = [( [bytes([c]) for c in w], n ) for w, n in vocab.items()]
    merges: list[tuple[bytes, bytes]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[bytes, bytes], int] = {}
        for syms, n in words:
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        new_words = []
        for syms, n in words:
            if len(syms) >= 2:
                out = []
                i = 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i+1] == b:
                        out.append(ab)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            new_words.append((syms, n))
        words = new_words
    return merges


def encode_word(w: bytes, rank: dict[tuple[bytes, bytes], int]) -> list[bytes]:
    """Encode one word: repeatedly merge the LOWEST-RANK adjacent pair
    (the canonical BPE apply rule — rank order, not left-to-right)."""
    syms = [bytes([c]) for c in w]
    while len(syms) >= 2:
        best_i, best_r = -1, None
        for i in range(len(syms) - 1):
            r = rank.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class BpeEncodeStage:
    """Actor-pool encode stage: merge table fetched once per worker
    (broadcast ref), distinct-word encodings memoized per worker — the
    per-batch work is a dictionary-encode plus cache lookups, with the
    merge loop running only on cache misses."""

    def __init__(self, merges_ref, id_col: str = "doc_id",
                 text_col: str = "text"):
        import ray

        merges = ray.get(merges_ref)
        self.rank = {p: i for i, p in enumerate(merges)}
        self.cache: dict[bytes, int] = {}   # word -> n_subwords
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import re

        ids = batch[self.id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        texts = batch[self.text_col].to_pylist()
        n_bpe = np.zeros(len(ids), dtype=np.int64)
        n_ws = np.zeros(len(ids), dtype=np.int64)
        for r, t in enumerate(texts):
            if t is None:
                continue
            total = 0
            k = 0
            for w in re.split(r"\s+", t, flags=re.ASCII):
                if not w:
                    continue
                k += 1
                b = w.encode("utf-8")
                c = self.cache.get(b)
                if c is None:
                    c = len(encode_word(b, self.rank))
                    self.cache[b] = c
                total += c
            n_bpe[r], n_ws[r] = total, k
        return pa.table({
            self.id_col: pa.array(ids),
            "n_words": pa.array(n_ws),
            "n_subwords": pa.array(n_bpe),
        })


def bpe_token_counts(sf_dir: str, n_merges: int = 200,
                     concurrency=(1, 8)):
    """Per-document whitespace-token and BPE-subword counts — the token
    budget a training pipeline actually bills against.

    Train once on the bounded sample, broadcast the merge table, encode
    the corpus with an actor pool (state in __init__, work in __call__).
    """
    import ray

    merges = train_bpe(sf_dir, n_merges=n_merges)
    merges_ref = ray.put(merges)
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    # autoscaling (min, max) actor pool: min 1 so the pool can never
    # starve the upstream read of CPU slots on small machines
    return ds.map_batches(
        BpeEncodeStage,
        fn_constructor_kwargs={"merges_ref": merges_ref},
        batch_format="pyarrow", batch_size=None,
        concurrency=concurrency)
