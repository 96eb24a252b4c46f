"""Text-analysis operators: token stats, quality scoring, language ID,
document fingerprinting.

All stateless vectorized ``map_batches`` stages except LangId (actor pool:
marker sets built once per actor in __init__).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import fnv1a_bytes


def text_stats(batch: pa.Table, id_col: str = "doc_id",
               text_col: str = "text") -> pa.Table:
    """(id, n_chars, n_tokens, n_distinct_tokens, avg_token_len).

    Semantics chosen to be SQL-mirrorable: tokens = whitespace-split
    non-empty; avg_token_len = sum(len(token)) / n_tokens as float64.
    """
    texts = batch[text_col].to_pandas()
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)
    n_tokens = np.empty(len(texts), dtype=np.int64)
    n_distinct = np.empty(len(texts), dtype=np.int64)
    tok_chars = np.empty(len(texts), dtype=np.int64)
    for k, t in enumerate(texts):
        toks = t.split()
        n_tokens[k] = len(toks)
        n_distinct[k] = len(set(toks))
        tok_chars[k] = sum(len(w) for w in toks)
    avg_len = tok_chars.astype(np.float64) / np.maximum(1, n_tokens)
    return pa.table({
        id_col: batch[id_col],
        "n_chars": pa.array(n_chars),
        "n_tokens": pa.array(n_tokens),
        "n_distinct_tokens": pa.array(n_distinct),
        "avg_token_len": pa.array(avg_len, type=pa.float64()),
    })


_STOPWORDS = frozenset(
    "the a an and or of to in is are was were for on with as by at from".split())


def quality_score(batch: pa.Table, id_col: str = "doc_id",
                  text_col: str = "text") -> pa.Table:
    """Heuristic quality signals: stopword ratio, alpha ratio, mean word
    length, repetition ratio + a combined [0,1] score."""
    texts = batch[text_col].to_pandas()
    n = len(texts)
    stop_ratio = np.zeros(n)
    alpha_ratio = np.zeros(n)
    rep_ratio = np.zeros(n)
    mean_len = np.zeros(n)
    for k, t in enumerate(texts):
        toks = t.split()
        if not toks:
            continue
        stop_ratio[k] = sum(w in _STOPWORDS for w in toks) / len(toks)
        alpha_chars = sum(c.isalpha() or c.isspace() for c in t)
        alpha_ratio[k] = alpha_chars / max(1, len(t))
        rep_ratio[k] = 1.0 - len(set(toks)) / len(toks)
        mean_len[k] = sum(len(w) for w in toks) / len(toks)
    # crude web-text quality heuristic (Gopher-rules-flavoured)
    score = (
        np.clip(alpha_ratio, 0, 1) * 0.4
        + np.clip(1.0 - rep_ratio * 2.0, 0, 1) * 0.3
        + np.clip(1.0 - np.abs(mean_len - 5.0) / 5.0, 0, 1) * 0.2
        + np.clip(stop_ratio * 5.0, 0, 1) * 0.1
    )
    return pa.table({
        id_col: batch[id_col],
        "stop_ratio": pa.array(stop_ratio, type=pa.float64()),
        "alpha_ratio": pa.array(alpha_ratio, type=pa.float64()),
        "rep_ratio": pa.array(rep_ratio, type=pa.float64()),
        "quality": pa.array(score, type=pa.float64()),
    })


class LangId:
    """Actor-pool stage: n-gram/marker-word language ID (en/de/fr/es + CJK).

    Marker tables are built once per actor (__init__), per the stateful-stage
    pattern; __call__ is per batch.
    """

    MARKERS = {
        "en": "the and is of to in that it with for this are was",
        "de": "der die das und ist von zu mit den nicht ein eine",
        "fr": "le la les et est de des un une pour que dans",
        "es": "el la los las y es de un una que para con",
    }

    def __init__(self):
        self.tables = {lang: frozenset(words.split())
                       for lang, words in self.MARKERS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pandas()
        preds = []
        confs = []
        for t in texts:
            # CJK detection first (codepoint ranges)
            cjk = sum(1 for c in t[:200] if "一" <= c <= "鿿")
            if cjk > len(t[:200]) * 0.2:
                preds.append("zh")
                confs.append(1.0)
                continue
            toks = t.lower().split()
            if not toks:
                preds.append("und")
                confs.append(0.0)
                continue
            scores = {lang: sum(w in tbl for w in toks) / len(toks)
                      for lang, tbl in self.tables.items()}
            best = max(scores, key=lambda l: (scores[l], l))
            preds.append(best if scores[best] > 0.02 else "und")
            confs.append(scores[best])
        out = batch.append_column("lang_pred", pa.array(preds, type=pa.string()))
        return out.append_column("lang_conf", pa.array(confs, type=pa.float64()))


def fingerprint(batch: pa.Table, id_col: str = "doc_id",
                text_col: str = "text") -> pa.Table:
    """64-bit document fingerprint: FNV over the rolling word sequence
    (order-sensitive, whitespace-normalized)."""
    texts = batch[text_col].to_pandas()
    fps = np.array(
        [np.int64(fnv1a_bytes(" ".join(t.split()).encode()) - (1 << 63))
         for t in texts], dtype=np.int64)
    return pa.table({
        id_col: batch[id_col],
        "fingerprint": pa.array(fps, type=pa.int64()),
    })
