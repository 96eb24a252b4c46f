"""Deduplication operators for the training-data pipeline.

All operators are Ray-Data-first: per-batch vectorized preparation, shuffles
only over *small derived rows* (hashes / signatures / pair keys), never over
full document text except the exact-dedup groupby (whose key is the dedup
criterion itself).

Operators:
- exact_dedup            hash-partition groupby(text) -> keeper + count
- near_dup_pairs_exact   word-k-gram shingle inverted-index join ->
                         exact Jaccard >= tau pairs (SQL-oracle-checkable)
- minhash_lsh_pairs      MinHash signatures + banded LSH buckets ->
                         candidate pairs with estimated Jaccard (scale path)
- simhash_pairs          64-bit SimHash + 16-bit band buckets ->
                         pairs with Hamming distance <= k
- embedding_near_dup     brute-force cosine >= tau pairs over a broadcast
                         normalized matrix (LSH-bucketed variant: ann.py)

Determinism: all hashing is salted FNV-1a/crc-free integer hashing (no
Python hash()), so signatures are identical across workers and runs.
"""

from __future__ import annotations

import numpy as np

from ..sources.readers import read_table
import pyarrow as pa

_MERSENNE61 = np.uint64((1 << 61) - 1)
_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)

# All sketch hashing (token hash, shingle combine, minhash perms, band
# keys) runs in the field mod 2^61-1 with SMALL multipliers (< 2^20), so
# every step is exactly expressible in DuckDB HUGEINT arithmetic — that is
# what makes the minhash/simhash oracle SQL possible.  The numpy side
# emulates the 81-bit products with a 2^61 == 1 (mod M61) fold.
_SHINGLE_Q = np.uint64(1048573)    # shingle Horner multiplier (prime < 2^20)
_BAND_P = np.uint64(524287)        # band-key Horner multiplier (2^19-1)
_MASK32 = np.uint64(0xFFFFFFFF)
_MASK29 = np.uint64((1 << 29) - 1)


def _mod61(x: np.ndarray) -> np.ndarray:
    """Reduce values < 2^63 mod 2^61-1 (fold high bits: 2^61 == 1)."""
    x = (x & _MERSENNE61) + (x >> np.uint64(61))
    return np.where(x >= _MERSENNE61, x - _MERSENNE61, x)


def _mulmod61_small(a, x):
    """(a * x) mod 2^61-1 for a < 2^20 and x < 2^61, without overflow:
    split x = xh*2^32 + xl; a*xh*2^32 folds via 2^61 == 1."""
    a = np.asarray(a, dtype=np.uint64)
    x = np.asarray(x, dtype=np.uint64)
    xh = x >> np.uint64(32)
    xl = x & _MASK32
    lo = a * xl                         # < 2^52
    hi = a * xh                         # < 2^49
    part = (hi >> np.uint64(29)) + ((hi & _MASK29) << np.uint64(32))
    return _mod61(_mod61(part) + _mod61(lo))


def content_digest(text) -> bytes:
    """128-bit blake2b digest of a document/chunk text — THE shuffle key
    for exact content equality (exact_dedup, chunk_dedup).  Domain-
    separated so null text can never collide with any real text."""
    import hashlib

    if text is None or (isinstance(text, float) and np.isnan(text)):
        return hashlib.blake2b(b"\x00", digest_size=16).digest()
    return hashlib.blake2b(b"\x01" + text.encode(), digest_size=16).digest()


def fnv1a_bytes(data: bytes, seed: int = 0) -> int:
    """Deterministic 64-bit hash of bytes (C-speed blake2b core)."""
    import hashlib

    h = hashlib.blake2b(data, digest_size=8,
                        salt=seed.to_bytes(8, "little", signed=False)[:8])
    return int.from_bytes(h.digest(), "little")


def key64_strings(arr: np.ndarray) -> np.ndarray:
    """int64 blake2b-64 shuffle keys for an object array of strings,
    hashing each DISTINCT value once (vocab-bounded per batch).  The
    repo-wide digest-key contract (content_digest) applies: collisions
    are 2^-64-scale and would need ~2^32 distinct values per bucket."""
    uniq, inv = np.unique(arr.astype(object), return_inverse=True)
    ks = np.array([fnv1a_bytes(str(u).encode()) for u in uniq],
                  dtype=np.uint64).view(np.int64)
    return ks[inv] if len(arr) else np.empty(0, dtype=np.int64)


def _cat_i64_blobs(col) -> np.ndarray:
    """Decode a binary column of concatenated int64 little-endian blobs
    into one flat int64 array (the compact-blob shuffle's row format)."""
    blobs = col.to_pylist()
    if not blobs:
        return np.empty(0, dtype=np.int64)
    return np.frombuffer(b"".join(blobs), dtype=np.int64)


def _poly_token_hash_array(tokens) -> np.ndarray:
    """Tokens -> uint64 hashes < 2^61-1: the dual 31-bit polynomial rolling
    hash (same fold as text.fingerprint) packed and reduced mod 2^61-1.
    SQL-equivalent: (fold1 * 2^31 + fold2) % (2^61-1)."""
    import pyarrow as pa

    from .text import FP_MUL1, FP_MUL2, _codepoint_matrix, _poly_hash_cols

    arr = tokens if isinstance(tokens, pa.Array) \
        else pa.array(list(tokens), type=pa.string())
    cp = _codepoint_matrix(arr)
    if cp.shape[1] == 0:
        return np.zeros(len(arr), dtype=np.uint64)
    p1 = _poly_hash_cols(cp, FP_MUL1).astype(np.uint64)
    p2 = _poly_hash_cols(cp, FP_MUL2).astype(np.uint64)
    return ((p1 << np.uint64(31)) + p2) % _MERSENNE61


def hash_tokens(tokens: list[str]) -> np.ndarray:
    """Token list -> uint64 hashes < 2^61-1 (scalar convenience wrapper
    around the vectorized polynomial hash)."""
    return _poly_token_hash_array(tokens)


def _hash_tokens_batch(texts) -> tuple[np.ndarray, np.ndarray, int]:
    """Whitespace-tokenize a batch of texts and hash every token.

    Vectorized: Arrow split + dictionary-encode, so the polynomial hash
    runs once per UNIQUE token, then fans out through the code array.
    Returns (row_idx, token_hashes, n_rows), doc-major order — identical
    values to per-doc ``hash_tokens`` over the RE2-ASCII ``\s+`` token
    split (see shingle_hashes).
    """
    import pyarrow as pa

    from .text import _token_codes

    arr = texts if isinstance(texts, pa.Array) \
        else pa.array(list(texts), type=pa.string())
    # single tokenizer source of truth: identical split/filter/encode
    # semantics to every text.* operator (the shared SQL oracles rely on it)
    row_idx, codes, uniques, _n_tokens, _flat = _token_codes(arr)
    uh = _poly_token_hash_array(pa.array(uniques, type=pa.string()))
    return row_idx, uh[codes], len(arr)


def _shingle_hashes_batch(texts, k: int = 3,
                          drop_empty: bool = False,
                          counts: bool = False):
    """Distinct word-k-gram shingle hashes for a whole batch at once.

    Returns (row_idx, sh) sorted by (row, hash) with per-row duplicates
    removed — value-identical to calling :func:`shingle_hashes` per doc.
    The k-gram mix runs on the flat token-hash array with windows that span
    document boundaries masked out; docs with < k tokens get the short-doc
    fallback hash.  With ``drop_empty``, zero-token documents emit NO
    shingle at all (instead of the empty-fold hash 0) — the semantics of
    SQL mirrors where the empty-doc fallback string aggregates to NULL and
    never joins (decontaminate relies on this).  With ``counts``, returns
    (row_idx, sh, tf) where tf is each distinct shingle's multiplicity in
    its document — the term-frequency view cosine_sim_pairs builds on.
    """
    row_idx, th, n = _hash_tokens_batch(texts)
    n_tok = np.bincount(row_idx, minlength=n)
    if len(th) >= k:
        sh = th[: len(th) - k + 1]
        for j in range(1, k):
            sh = _mod61(_mulmod61_small(_SHINGLE_Q, sh)
                        + th[j: len(th) - k + 1 + j])
        valid = row_idx[: len(th) - k + 1] == row_idx[k - 1:]
        srow = row_idx[: len(th) - k + 1][valid]
        sh = sh[valid]
    else:
        srow = np.empty(0, dtype=np.int64)
        sh = np.empty(0, dtype=np.uint64)
    # short docs (< k tokens, incl. empty): fold over their whole sequence
    short = np.flatnonzero((n_tok < k) & (n_tok > 0)) if drop_empty \
        else np.flatnonzero(n_tok < k)
    if len(short):
        starts = np.concatenate([[0], np.cumsum(n_tok)]).astype(np.int64)
        extra_h = np.empty(len(short), dtype=np.uint64)
        for t, r in enumerate(short):
            h = np.zeros(1, dtype=np.uint64)
            for v in th[starts[r]:starts[r + 1]]:
                h = _mod61(_mulmod61_small(_SHINGLE_Q, h) + v)
            extra_h[t] = h[0]
        srow = np.concatenate([srow, short])
        sh = np.concatenate([sh, extra_h])
    # distinct per row + doc-major order: one global sort on (row, hash)
    order = np.lexsort((sh, srow))
    srow, sh = srow[order], sh[order]
    if len(sh):
        keep = np.concatenate([[True],
                               (srow[1:] != srow[:-1]) | (sh[1:] != sh[:-1])])
        if counts:
            starts = np.flatnonzero(keep)
            tf = np.diff(np.concatenate([starts, [len(sh)]])).astype(np.int64)
            return srow[keep], sh[keep], tf
        srow, sh = srow[keep], sh[keep]
    elif counts:
        return srow, sh, np.empty(0, dtype=np.int64)
    return srow, sh


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Distinct word-k-gram shingle hashes (< 2^61-1).

    Combination is a Horner fold of the token hashes mod 2^61-1 with a
    small prime multiplier — SQL-equivalent:
    ``((th1*Q + th2) % M * Q + th3) % M`` in HUGEINT.  Documents shorter
    than k tokens hash their whole token sequence with the same fold.
    Tokenization is RE2-ASCII ``\s+`` like the batch path and the SQL
    oracles (python str.split would split on UNICODE whitespace).
    """
    import re

    words = [w for w in re.split(r"\s+", text, flags=re.ASCII) if w]
    th = hash_tokens(words)
    if len(words) < k:
        h = np.zeros(1, dtype=np.uint64)
        for v in th:
            h = _mod61(_mulmod61_small(_SHINGLE_Q, h) + v)
        return h.astype(np.uint64)
    sh = th[: len(th) - k + 1]
    for j in range(1, k):
        sh = _mod61(_mulmod61_small(_SHINGLE_Q, sh)
                    + th[j: len(th) - k + 1 + j])
    return np.unique(sh)


# ---------------------------------------------------------------------------
# exact dedup

def exact_dedup(ds, text_col: str = "text", id_col: str = "page_id"):
    """Keep the smallest id per distinct text; also count copies.

    Scale design: the shuffle key is a 128-bit blake2b content digest, NOT
    the text — the all-to-all moves ~40 B/distinct-text instead of the
    document body (collision probability ~2^-64: negligible even at 10^12
    docs).  The per-batch partial pass also shrinks each batch to its
    distinct texts first.
    """
    from ray.data.aggregate import Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        # pandas hash groupby: pa.Table.group_by is pathologically slow in
        # this pyarrow version
        import pandas as pd

        df = pd.DataFrame({
            "t": batch[text_col].to_pandas(),
            "i": batch[id_col].to_numpy(zero_copy_only=False),
        })
        # dropna=False: NULL text is a legal group (the SQL oracle's
        # GROUP BY keeps it); dropping it silently loses those doc ids.
        g = df.groupby("t", sort=False, dropna=False)["i"] \
            .agg(["min", "count"]).reset_index()
        digests = [content_digest(t) for t in g["t"]]
        return pa.table({
            "digest": pa.array(digests, type=pa.binary()),
            "min_id": pa.array(g["min"].to_numpy()),
            "cnt": pa.array(g["count"].to_numpy().astype(np.int64)),
        })

    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("digest")
        .aggregate(Min("min_id", alias_name=id_col),
                   Sum("cnt", alias_name="n_copies"))
    )
    return out.select_columns([id_col, "n_copies"])


_N_PAIR_PARTITIONS = 256


def _add_partition(key_col: str):
    """Append a coarse shuffle partition 'part' = key mod P.

    Grouping by 'part' instead of the raw bucket key gives ~P map_groups
    calls (vectorized inside) instead of one Python call per tiny bucket —
    Ray's per-group overhead dominates otherwise.
    """

    def fn(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        part = (k % _N_PAIR_PARTITIONS).astype(np.int32)
        return batch.append_column("part", pa.array(part))

    return fn


def _pairs_from_buckets(df, key_col: str, carry: tuple, max_bucket: int):
    """All intra-bucket pairs (i<j) within a partition, vectorized.

    Buckets of size 1 (the vast majority) are dropped with one value_counts
    pass; remaining buckets emit upper-triangle pairs.
    """
    import pandas as pd

    vc = df[key_col].value_counts()
    multi = vc[(vc > 1) & (vc <= max_bucket)].index
    if len(multi) == 0:
        cols = {"i": pd.Series(dtype=np.int64), "j": pd.Series(dtype=np.int64)}
        if "sz" in carry:
            cols["si"] = pd.Series(dtype=np.int64)
            cols["sj"] = pd.Series(dtype=np.int64)
        cols["inter"] = pd.Series(dtype=np.int64)
        return pd.DataFrame(cols)
    sub = df[df[key_col].isin(multi)].sort_values([key_col, carry[0]])
    out_i, out_j, out_si, out_sj = [], [], [], []
    for _key, grp in sub.groupby(key_col, sort=False):
        docs = grp[carry[0]].to_numpy()
        ii, jj = np.triu_indices(len(docs), 1)
        out_i.append(docs[ii])
        out_j.append(docs[jj])
        if "sz" in carry:
            szs = grp["sz"].to_numpy()
            out_si.append(szs[ii])
            out_sj.append(szs[jj])
    res = {"i": np.concatenate(out_i), "j": np.concatenate(out_j)}
    if "sz" in carry:
        res["si"] = np.concatenate(out_si)
        res["sj"] = np.concatenate(out_sj)
    res["inter"] = np.ones(len(res["i"]), dtype=np.int64)
    return pd.DataFrame(res)


# ---------------------------------------------------------------------------
# exact near-dup pairs via shingle inverted index

def _pair_intersections(ds, k: int, id_col: str, text_col: str,
                        max_posting: int, finish):
    """Shared distributed inverted-index pair-intersection core: doc ->
    (shingle_hash, doc_id, set_size) postings, blob-compacted two-level
    shuffle, and a caller-supplied ``finish(table)`` applied per pair
    partition over the merged (pk, inter, si, sj) blob groups.  Backs
    near_dup_pairs_exact (Jaccard) and containment_pairs (overlap
    coefficient) with identical candidate generation.
    """
    import pandas as pd

    from ..kernel import keys as _keys

    def to_postings(batch: pa.Table) -> pa.Table:
        """Compact per-batch postings: ONE row per coarse partition holding
        the (sh, doc, sz) arrays as binary blobs — the shuffle then moves
        ~P rows per batch instead of one row per posting (Ray's sort
        shuffle costs ~80us/row; postings are numerous)."""
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if len(ids) and (int(ids.min()) < 0 or int(ids.max()) >= 1 << 31):
            # pair keys are packed as i << 32 | j in SIGNED int64 downstream,
            # so i must fit in 31 bits (and j rides in the low 32); anything
            # larger would wrap negative and merge/corrupt distinct pairs
            raise ValueError(
                "near_dup_pairs_exact requires doc ids in [0, 2^31); "
                f"got range [{ids.min()}, {ids.max()}]")
        texts = batch[text_col].to_pandas()
        # drop_empty: null/whitespace-only docs emit NO shingles — the SQL
        # mirror's empty-doc fallback aggregates to NULL and never joins,
        # so such docs can never pair (null-injection sweep parity)
        srow, sh_flat = _shingle_hashes_batch(texts, k, drop_empty=True)
        sizes = np.bincount(srow, minlength=len(ids)).astype(np.int64)
        sh = _keys.to_key(sh_flat)
        doc = ids[srow].astype(np.int64)
        sz = sizes[srow]
        if len(sh) == 0:
            # a batch of only empty/null docs emits no postings at all
            return pa.table({
                "part": pa.array([], type=pa.int32()),
                "sh_b": pa.array([], type=pa.binary()),
                "doc_b": pa.array([], type=pa.binary()),
                "sz_b": pa.array([], type=pa.binary()),
            })
        part = (sh % _N_PAIR_PARTITIONS).astype(np.int32)
        order = np.argsort(part, kind="stable")
        sh, doc, sz, part = sh[order], doc[order], sz[order], part[order]
        starts = np.concatenate([[0], np.flatnonzero(part[1:] != part[:-1]) + 1,
                                 [len(part)]])
        rows_p, rows_sh, rows_doc, rows_sz = [], [], [], []
        for s, e_ in zip(starts[:-1], starts[1:]):
            rows_p.append(int(part[s]))
            rows_sh.append(sh[s:e_].tobytes())
            rows_doc.append(doc[s:e_].tobytes())
            rows_sz.append(sz[s:e_].tobytes())
        return pa.table({
            "part": pa.array(rows_p, type=pa.int32()),
            "sh_b": pa.array(rows_sh, type=pa.binary()),
            "doc_b": pa.array(rows_doc, type=pa.binary()),
            "sz_b": pa.array(rows_sz, type=pa.binary()),
        })

    def emit_pairs(t: pa.Table) -> pa.Table:
        # one call per coarse shingle-partition: decode blobs, bucket scan,
        # pre-sum duplicate pairs, then re-emit COMPACT rows partitioned by
        # pair key (pk = i << 32 | j) for the second-level merge.  Both
        # shuffles move blob rows, never per-pair rows (Ray's sort-based
        # groupby/aggregate costs ~0.3-1 ms per group in Python).  Arrow
        # in/out: the blob rows never round-trip through pandas blocks.
        sub = pd.DataFrame({
            "sh": _cat_i64_blobs(t["sh_b"]),
            "doc": _cat_i64_blobs(t["doc_b"]),
            "sz": _cat_i64_blobs(t["sz_b"]),
        })
        out = _pairs_from_buckets(sub, "sh", ("doc", "sz"), max_posting)
        pk = np.left_shift(out["i"].to_numpy().astype(np.int64), 32) \
            | out["j"].to_numpy().astype(np.int64)
        si = out["si"].to_numpy().astype(np.int64)
        sj = out["sj"].to_numpy().astype(np.int64)
        inter = out["inter"].to_numpy().astype(np.int64)
        # pre-aggregate within this partition
        order = np.argsort(pk, kind="stable")
        pk, si, sj, inter = pk[order], si[order], sj[order], inter[order]
        starts = (np.concatenate([[0], np.flatnonzero(pk[1:] != pk[:-1]) + 1])
                  if len(pk) else np.empty(0, dtype=np.int64))
        u = pk[starts] if len(pk) else pk
        inter_s = (np.add.reduceat(inter, starts) if len(pk) else inter)
        si_u = si[starts] if len(pk) else si
        sj_u = sj[starts] if len(pk) else sj
        pkpart = (u % _N_PAIR_PARTITIONS).astype(np.int32)
        porder = np.argsort(pkpart, kind="stable")
        u, inter_s, si_u, sj_u, pkpart = (u[porder], inter_s[porder],
                                          si_u[porder], sj_u[porder],
                                          pkpart[porder])
        bounds = np.concatenate([[0], np.flatnonzero(
            pkpart[1:] != pkpart[:-1]) + 1, [len(pkpart)]]) if len(pkpart) \
            else np.array([0, 0])
        rows = {"pkpart": [], "pk_b": [], "inter_b": [], "si_b": [], "sj_b": []}
        for s, e_ in zip(bounds[:-1], bounds[1:]):
            if e_ <= s:
                continue
            rows["pkpart"].append(int(pkpart[s]))
            rows["pk_b"].append(u[s:e_].tobytes())
            rows["inter_b"].append(inter_s[s:e_].tobytes())
            rows["si_b"].append(si_u[s:e_].tobytes())
            rows["sj_b"].append(sj_u[s:e_].tobytes())
        return pa.table({
            "pkpart": pa.array(rows["pkpart"], type=pa.int64()),
            "pk_b": pa.array(rows["pk_b"], type=pa.binary()),
            "inter_b": pa.array(rows["inter_b"], type=pa.binary()),
            "si_b": pa.array(rows["si_b"], type=pa.binary()),
            "sj_b": pa.array(rows["sj_b"], type=pa.binary()),
        })

    return (
        ds.map_batches(to_postings, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(emit_pairs, batch_format="pyarrow")
        .groupby("pkpart")
        .map_groups(finish, batch_format="pyarrow")
    )


def near_dup_pairs_exact(ds, tau: float = 0.5, k: int = 3,
                         id_col: str = "doc_id", text_col: str = "text",
                         max_posting: int = 10000):
    """Exact Jaccard >= tau pairs via a distributed inverted-index join.

    doc -> (shingle_hash, doc_id, set_size) rows; groupby shingle emits
    candidate pairs; groupby pair sums intersections; jaccard from carried
    set sizes.  ``max_posting`` caps pathological stop-shingles (documented
    deviation; groups above the cap are dropped — at the default it never
    triggers on sane corpora).  Candidate generation lives in
    :func:`_pair_intersections`; only the Jaccard finish is local here.
    """
    def merge_pairs(t: pa.Table) -> pa.Table:
        pk = _cat_i64_blobs(t["pk_b"])
        inter = _cat_i64_blobs(t["inter_b"])
        si = _cat_i64_blobs(t["si_b"])
        sj = _cat_i64_blobs(t["sj_b"])
        order = np.argsort(pk, kind="stable")
        pk, inter, si, sj = pk[order], inter[order], si[order], sj[order]
        starts = (np.concatenate([[0], np.flatnonzero(pk[1:] != pk[:-1]) + 1])
                  if len(pk) else np.empty(0, dtype=np.int64))
        u = pk[starts] if len(pk) else pk
        inter_s = (np.add.reduceat(inter, starts) if len(pk)
                   else inter).astype(np.float64)
        si_u = si[starts].astype(np.float64) if len(pk) else si
        sj_u = sj[starts].astype(np.float64) if len(pk) else sj
        jac = inter_s / (si_u + sj_u - inter_s) if len(u) else inter_s
        keep = jac >= tau
        return pa.table({
            "i": pa.array((u[keep] >> 32).astype(np.int64)),
            "j": pa.array((u[keep] & 0xFFFFFFFF).astype(np.int64)),
            "jaccard": pa.array(jac[keep], type=pa.float64()),
        })

    return _pair_intersections(ds, k, id_col, text_col, max_posting,
                               merge_pairs)


def containment_pairs(ds, c_num: int = 9, c_den: int = 10, k: int = 3,
                      id_col: str = "doc_id", text_col: str = "text",
                      max_posting: int = 10000):
    """Exact shingle-containment pairs (overlap coefficient): document
    pairs whose shingle-set intersection covers >= c_num/c_den of the
    SMALLER document — (i, j, inter, size_i, size_j, containment).
    Jaccard misses quote/subset relationships (a short doc fully
    embedded in a long one has tiny Jaccard but containment 1.0), and
    those are exactly the contamination/quotation cases an LLM data
    pipeline must see; this is the subset-detection face of the same
    inverted-index core as near_dup_pairs.

    Exactness: the threshold is evaluated ENTIRELY in integers
    (c_den * inter >= c_num * min(si, sj)), so boundary pairs agree
    bit-exactly with the SQL mirror; the reported containment is one
    mirrored float division rounded to 6 dp.

    Scale shape: identical to near_dup_pairs_exact — the shared
    :func:`_pair_intersections` blob-compacted two-level shuffle; only
    the finish differs.
    """
    cn = int(c_num)
    cd = int(c_den)

    def merge_containment(t: pa.Table) -> pa.Table:
        from .text import round_half_away

        pk = _cat_i64_blobs(t["pk_b"])
        inter = _cat_i64_blobs(t["inter_b"])
        si = _cat_i64_blobs(t["si_b"])
        sj = _cat_i64_blobs(t["sj_b"])
        order = np.argsort(pk, kind="stable")
        pk, inter, si, sj = pk[order], inter[order], si[order], sj[order]
        starts = (np.concatenate([[0],
                                  np.flatnonzero(pk[1:] != pk[:-1]) + 1])
                  if len(pk) else np.empty(0, dtype=np.int64))
        u = pk[starts] if len(pk) else pk
        inter_s = (np.add.reduceat(inter, starts) if len(pk) else inter)
        si_u = si[starts] if len(pk) else si
        sj_u = sj[starts] if len(pk) else sj
        mn = np.minimum(si_u, sj_u)
        keep = cd * inter_s >= cn * mn          # exact integer threshold
        u, inter_s, si_u, sj_u, mn = (u[keep], inter_s[keep], si_u[keep],
                                      sj_u[keep], mn[keep])
        cont = (inter_s.astype(np.float64) / mn.astype(np.float64)
                if len(u) else np.zeros(0))
        return pa.table({
            "i": pa.array((u >> 32).astype(np.int64)),
            "j": pa.array((u & 0xFFFFFFFF).astype(np.int64)),
            "inter": pa.array(inter_s.astype(np.int64)),
            "size_i": pa.array(si_u.astype(np.int64)),
            "size_j": pa.array(sj_u.astype(np.int64)),
            "containment": pa.array(round_half_away(cont, 6),
                                    type=pa.float64()),
        })

    return _pair_intersections(ds, k, id_col, text_col, max_posting,
                               merge_containment)


def _weighted_pairs_from_buckets(df, key_col: str, max_bucket: int):
    """All intra-bucket pairs (i<j) with dot-product partials, vectorized.

    Like :func:`_pairs_from_buckets` but each posting carries a term
    frequency ``w`` and a per-doc norm ``nrm``; a pair contributes
    ``w_i * w_j`` to its dot product and carries both norms.
    """
    import pandas as pd

    vc = df[key_col].value_counts()
    multi = vc[(vc > 1) & (vc <= max_bucket)].index
    if len(multi) == 0:
        return pd.DataFrame({
            "i": pd.Series(dtype=np.int64), "j": pd.Series(dtype=np.int64),
            "wprod": pd.Series(dtype=np.int64),
            "ni": pd.Series(dtype=np.int64), "nj": pd.Series(dtype=np.int64),
        })
    sub = df[df[key_col].isin(multi)].sort_values([key_col, "doc"])
    out_i, out_j, out_w, out_ni, out_nj = [], [], [], [], []
    for _key, grp in sub.groupby(key_col, sort=False):
        docs = grp["doc"].to_numpy()
        ws = grp["w"].to_numpy()
        nrms = grp["nrm"].to_numpy()
        ii, jj = np.triu_indices(len(docs), 1)
        out_i.append(docs[ii])
        out_j.append(docs[jj])
        out_w.append(ws[ii] * ws[jj])
        out_ni.append(nrms[ii])
        out_nj.append(nrms[jj])
    return pd.DataFrame({
        "i": np.concatenate(out_i), "j": np.concatenate(out_j),
        "wprod": np.concatenate(out_w),
        "ni": np.concatenate(out_ni), "nj": np.concatenate(out_nj),
    })


# norms are bounded so den^2*dot^2 (dot <= sqrt(ni*nj) < 2^28) stays well
# inside int64 for any threshold denominator <= 32
_COSINE_MAX_NORM = 1 << 28


def cosine_sim_pairs(ds, tau_num: int = 3, tau_den: int = 5, k: int = 3,
                     id_col: str = "doc_id", text_col: str = "text",
                     max_posting: int = 10000):
    """Exact sparse TF cosine similarity join: all document pairs whose
    k-gram term-frequency vectors have cosine >= tau_num/tau_den.

    The vector space is the mod-(2^61-1) shingle-hash domain of
    :func:`shingle_hashes` WITH multiplicity (tf), so this generalizes
    the Jaccard join to a weighted similarity: dot = sum tf_i*tf_j over
    shared shingles, norm = sum tf^2 per doc.  Same distributed shape as
    :func:`near_dup_pairs_exact` — an inverted-index join where both
    all-to-alls move compact blob rows, never per-posting or per-pair
    rows; ``max_posting`` caps pathological stop-shingles (documented
    deviation, never triggers at the default on sane corpora).

    The threshold is evaluated EXACTLY in integers (no float order
    dependence): cos >= num/den  <=>  den^2*dot^2 >= num^2*ni*nj, valid
    because dot >= 0.  Doc ids must fit 31 bits (pair keys pack as
    i<<32|j) and per-doc norms must stay below 2^28 (raise otherwise) so
    every product stays inside int64.  The reported ``cosine`` column is
    round(dot/sqrt(ni*nj), 6), bit-identical to the SQL mirror.
    """
    import pandas as pd

    from ..kernel import keys as _keys
    from .text import round_half_away

    def to_postings(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if len(ids) and (int(ids.min()) < 0 or int(ids.max()) >= 1 << 31):
            raise ValueError(
                "cosine_sim_pairs requires doc ids in [0, 2^31); "
                f"got range [{ids.min()}, {ids.max()}]")
        texts = batch[text_col].to_pandas()
        srow, sh_flat, tf = _shingle_hashes_batch(texts, k, drop_empty=True,
                                                  counts=True)
        nrm_row = np.zeros(len(ids), dtype=np.int64)
        np.add.at(nrm_row, srow, tf * tf)
        if len(nrm_row) and int(nrm_row.max()) >= _COSINE_MAX_NORM:
            raise ValueError(
                "cosine_sim_pairs: document tf-norm exceeds 2^28; the "
                "integer threshold algebra would overflow int64")
        sh = _keys.to_key(sh_flat)
        doc = ids[srow].astype(np.int64)
        nrm = nrm_row[srow]
        if len(sh) == 0:
            return pa.table({
                "part": pa.array([], type=pa.int32()),
                "sh_b": pa.array([], type=pa.binary()),
                "doc_b": pa.array([], type=pa.binary()),
                "tf_b": pa.array([], type=pa.binary()),
                "nrm_b": pa.array([], type=pa.binary()),
            })
        part = (sh % _N_PAIR_PARTITIONS).astype(np.int32)
        order = np.argsort(part, kind="stable")
        sh, doc, tf, nrm, part = (sh[order], doc[order], tf[order],
                                  nrm[order], part[order])
        starts = np.concatenate([[0], np.flatnonzero(part[1:] != part[:-1])
                                 + 1, [len(part)]])
        rows = {"part": [], "sh_b": [], "doc_b": [], "tf_b": [], "nrm_b": []}
        for s, e_ in zip(starts[:-1], starts[1:]):
            rows["part"].append(int(part[s]))
            rows["sh_b"].append(sh[s:e_].tobytes())
            rows["doc_b"].append(doc[s:e_].tobytes())
            rows["tf_b"].append(tf[s:e_].tobytes())
            rows["nrm_b"].append(nrm[s:e_].tobytes())
        return pa.table({
            "part": pa.array(rows["part"], type=pa.int32()),
            "sh_b": pa.array(rows["sh_b"], type=pa.binary()),
            "doc_b": pa.array(rows["doc_b"], type=pa.binary()),
            "tf_b": pa.array(rows["tf_b"], type=pa.binary()),
            "nrm_b": pa.array(rows["nrm_b"], type=pa.binary()),
        })

    def emit_pairs(t: pa.Table) -> pa.Table:
        # Arrow in/out (cf. near_dup_pairs_exact): blob rows never
        # round-trip through pandas blocks
        sub = pd.DataFrame({
            "sh": _cat_i64_blobs(t["sh_b"]),
            "doc": _cat_i64_blobs(t["doc_b"]),
            "w": _cat_i64_blobs(t["tf_b"]),
            "nrm": _cat_i64_blobs(t["nrm_b"]),
        })
        out = _weighted_pairs_from_buckets(sub, "sh", max_posting)
        pk = np.left_shift(out["i"].to_numpy().astype(np.int64), 32) \
            | out["j"].to_numpy().astype(np.int64)
        w = out["wprod"].to_numpy().astype(np.int64)
        ni = out["ni"].to_numpy().astype(np.int64)
        nj = out["nj"].to_numpy().astype(np.int64)
        # pre-aggregate duplicate pairs within this partition
        order = np.argsort(pk, kind="stable")
        pk, w, ni, nj = pk[order], w[order], ni[order], nj[order]
        starts = (np.concatenate([[0], np.flatnonzero(pk[1:] != pk[:-1]) + 1])
                  if len(pk) else np.empty(0, dtype=np.int64))
        u = pk[starts] if len(pk) else pk
        dot = (np.add.reduceat(w, starts) if len(pk) else w)
        ni_u = ni[starts] if len(pk) else ni
        nj_u = nj[starts] if len(pk) else nj
        pkpart = (u % _N_PAIR_PARTITIONS).astype(np.int32)
        porder = np.argsort(pkpart, kind="stable")
        u, dot, ni_u, nj_u, pkpart = (u[porder], dot[porder], ni_u[porder],
                                      nj_u[porder], pkpart[porder])
        bounds = np.concatenate([[0], np.flatnonzero(
            pkpart[1:] != pkpart[:-1]) + 1, [len(pkpart)]]) if len(pkpart) \
            else np.array([0, 0])
        rows = {"pkpart": [], "pk_b": [], "dot_b": [], "ni_b": [], "nj_b": []}
        for s, e_ in zip(bounds[:-1], bounds[1:]):
            if e_ <= s:
                continue
            rows["pkpart"].append(int(pkpart[s]))
            rows["pk_b"].append(u[s:e_].tobytes())
            rows["dot_b"].append(dot[s:e_].tobytes())
            rows["ni_b"].append(ni_u[s:e_].tobytes())
            rows["nj_b"].append(nj_u[s:e_].tobytes())
        return pa.table({
            "pkpart": pa.array(rows["pkpart"], type=pa.int64()),
            "pk_b": pa.array(rows["pk_b"], type=pa.binary()),
            "dot_b": pa.array(rows["dot_b"], type=pa.binary()),
            "ni_b": pa.array(rows["ni_b"], type=pa.binary()),
            "nj_b": pa.array(rows["nj_b"], type=pa.binary()),
        })

    def merge_pairs(t: pa.Table) -> pa.Table:
        pk = _cat_i64_blobs(t["pk_b"])
        dot = _cat_i64_blobs(t["dot_b"])
        ni = _cat_i64_blobs(t["ni_b"])
        nj = _cat_i64_blobs(t["nj_b"])
        order = np.argsort(pk, kind="stable")
        pk, dot, ni, nj = pk[order], dot[order], ni[order], nj[order]
        starts = (np.concatenate([[0], np.flatnonzero(pk[1:] != pk[:-1]) + 1])
                  if len(pk) else np.empty(0, dtype=np.int64))
        u = pk[starts] if len(pk) else pk
        dot_s = np.add.reduceat(dot, starts) if len(pk) else dot
        ni_u = ni[starts] if len(pk) else ni
        nj_u = nj[starts] if len(pk) else nj
        # exact rational threshold: cos >= num/den <=> den^2 dot^2 >= num^2 ni nj
        keep = (tau_den * tau_den * dot_s * dot_s
                >= tau_num * tau_num * ni_u * nj_u)
        u, dot_s, ni_u, nj_u = u[keep], dot_s[keep], ni_u[keep], nj_u[keep]
        cos = (dot_s / np.sqrt((ni_u * nj_u).astype(np.float64))
               if len(u) else np.empty(0, dtype=np.float64))
        return pa.table({
            "i": pa.array((u >> 32).astype(np.int64)),
            "j": pa.array((u & 0xFFFFFFFF).astype(np.int64)),
            "dot": pa.array(dot_s.astype(np.int64)),
            "norm_i": pa.array(ni_u.astype(np.int64)),
            "norm_j": pa.array(nj_u.astype(np.int64)),
            "cosine": pa.array(round_half_away(cos), type=pa.float64()),
        })

    return (
        ds.map_batches(to_postings, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(emit_pairs, batch_format="pyarrow")
        .groupby("pkpart")
        .map_groups(merge_pairs, batch_format="pyarrow")
    )


def _union_find_labels(pairs_i: np.ndarray, pairs_j: np.ndarray):
    """Connected-component labels (min member id) for the nodes appearing
    in the pair list.  Vectorized-ish union-find with path compression."""
    nodes = np.unique(np.concatenate([pairs_i, pairs_j]))
    idx = {int(n): k for k, n in enumerate(nodes)}
    parent = np.arange(len(nodes), dtype=np.int64)

    def find(a: int) -> int:
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:
            parent[a], a = root, parent[a]
        return root

    for i, j in zip(pairs_i, pairs_j):
        ri, rj = find(idx[int(i)]), find(idx[int(j)])
        if ri != rj:
            # union by smaller node id so the final root is the min member
            if nodes[ri] < nodes[rj]:
                parent[rj] = ri
            else:
                parent[ri] = rj
    roots = np.array([find(k) for k in range(len(nodes))], dtype=np.int64)
    return nodes, nodes[roots]


def _cc_label_propagation(pairs, n_parts: int = 64, max_rounds: int = 64):
    """Distributed connected components over a pair Dataset via hash-min
    label propagation: every node starts labeled with itself; each round,
    every node takes the min of its own label and its neighbors' labels
    (co-partitioned by ``node % n_parts`` so one round = two bounded
    shuffles of E+N rows); rounds stop when no label changed.  Converges
    in O(graph diameter) rounds — near-dup clusters are dense and shallow,
    so a handful in practice.  Per-round state is the (node, label) table
    only, never the corpus and never a driver-side edge list.

    Returns a Dataset with columns (node, label), label = component min.
    """
    import pandas as pd
    import ray.data

    P = np.int64(n_parts)

    def to_edges(batch: pa.Table) -> pa.Table:
        i = batch["i"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = batch["j"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([i, j])
        dst = np.concatenate([j, i])
        return pa.table({
            "part": pa.array((src % P).astype(np.int32)),
            "node": pa.array(src),
            "other": pa.array(dst),
            "label": pa.array(np.full(len(src), -1, dtype=np.int64)),
        })

    edges = pairs.map_batches(to_edges, batch_format="pyarrow",
                              batch_size=None).materialize()

    def init_labels(df):
        # returns an Arrow table: union() requires label blocks to be the
        # same block type as the Arrow edge blocks
        u = np.unique(df["node"].to_numpy())
        return pa.table({
            "part": pa.array((u % n_parts).astype(np.int32)),
            "node": pa.array(u),
            "other": pa.array(np.full(len(u), -1, dtype=np.int64)),
            "label": pa.array(u),
        })

    labels = edges.groupby("part").map_groups(
        init_labels, batch_format="pandas").materialize()

    def propagate(df):
        lab = df[df["other"] < 0]
        edg = df[df["other"] >= 0]
        m = edg.merge(lab[["node", "label"]].rename(columns={"label": "lab"}),
                      on="node", how="left")
        cand_n = m["other"].to_numpy().astype(np.int64)
        cand_l = m["lab"].to_numpy().astype(np.int64)
        out_n = np.concatenate([cand_n, lab["node"].to_numpy()])
        out_l = np.concatenate([cand_l, lab["label"].to_numpy()])
        out_o = np.concatenate([np.zeros(len(cand_n), dtype=np.int64),
                                np.ones(len(lab), dtype=np.int64)])
        return pd.DataFrame({"part": (out_n % n_parts).astype(np.int32),
                             "node": out_n, "is_old": out_o,
                             "label": out_l})

    def reduce_min(df):
        new = df.groupby("node")["label"].min()
        old = df.loc[df["is_old"] == 1].set_index("node")["label"]
        nodes = new.index.to_numpy().astype(np.int64)
        chg = (new.to_numpy() < old.reindex(new.index).to_numpy()) \
            .astype(np.int64)
        return pa.table({
            "part": pa.array((nodes % n_parts).astype(np.int32)),
            "node": pa.array(nodes),
            "other": pa.array(np.full(len(nodes), -1, dtype=np.int64)),
            "label": pa.array(new.to_numpy().astype(np.int64)),
            "chg": pa.array(chg),
        })

    changed = 0
    for _ in range(max_rounds):
        step = edges.union(labels).groupby("part").map_groups(
            propagate, batch_format="pandas")
        new_labels = step.groupby("part").map_groups(
            reduce_min, batch_format="pandas").materialize()
        changed = new_labels.sum("chg")
        labels = new_labels.drop_columns(["chg"]).materialize()
        if not changed:
            break
    if changed:
        # labels are still mid-propagation: returning them would silently
        # mis-cluster (component min not yet reached everywhere).  Plain
        # hash-min needs O(component diameter) rounds; a corpus with a
        # longer duplicate chain must raise, not corrupt.
        raise RuntimeError(
            f"label propagation did not converge in {max_rounds} rounds "
            f"({changed} labels still changing); raise max_rounds — the "
            f"pair graph has a component with diameter > {max_rounds}")
    return labels.select_columns(["node", "label"])


def near_dup_clusters(ds, tau: float = 0.5, k: int = 3,
                      id_col: str = "doc_id", text_col: str = "text",
                      method: str = "auto",
                      driver_pairs_max: int = 5_000_000):
    """Connected components of the exact near-dup pair graph:
    (doc_id, cluster_id) for every document in some duplicate cluster,
    cluster_id = min doc id in its component.

    Scale design: the distributed inverted-index join produces the pair
    list (compact: only duplicate documents appear — orders of magnitude
    smaller than the corpus).  ``method="driver"`` resolves components
    with union-find over that SMALL derived set on the driver — the fast
    path while pairs fit in memory.  ``method="distributed"`` runs
    hash-min label propagation over the pair Dataset instead
    (:func:`_cc_label_propagation`) — nothing touches the driver, for
    corpora whose pair list is itself huge; equivalence vs union-find is
    pytest-asserted on the stress corpus.  ``method="auto"`` (default)
    materializes the pair list once and picks by its count: driver
    union-find up to ``driver_pairs_max`` pairs (~80 MB of int64 edges),
    label propagation beyond — so a duplicate-heavy corpus can never
    pull an unbounded edge list onto the driver.
    """
    import pandas as pd
    import ray.data

    pairs = near_dup_pairs_exact(ds, tau=tau, k=k, id_col=id_col,
                                 text_col=text_col)
    if method == "auto":
        # count() on the materialized pair list is metadata-cheap, and
        # both downstream paths consume the same materialized blocks
        pairs = pairs.materialize()
        method = ("distributed" if pairs.count() > driver_pairs_max
                  else "driver")
    if method == "distributed":
        out = _cc_label_propagation(pairs.select_columns(["i", "j"]))

        def rename(batch: pa.Table) -> pa.Table:
            return pa.table({id_col: batch["node"],
                             "cluster_id": batch["label"]})

        return out.map_batches(rename, batch_format="pyarrow")
    pdf = pairs.select_columns(["i", "j"]).to_pandas()
    if len(pdf) == 0:
        return ray.data.from_pandas(pd.DataFrame({
            id_col: pd.Series(dtype=np.int64),
            "cluster_id": pd.Series(dtype=np.int64)}))
    nodes, labels = _union_find_labels(pdf["i"].to_numpy(np.int64),
                                       pdf["j"].to_numpy(np.int64))
    return ray.data.from_pandas(pd.DataFrame({
        id_col: nodes, "cluster_id": labels}))


def corpus_dedup_keep(sf_dir: str, tau: float = 0.5, k: int = 3,
                      min_quality: float = 0.5, langs=("en", "de", "fr",
                                                       "es", "zh"),
                      broadcast_drop_max: int = 2_000_000):
    """The canonical training-data cleaning pipeline, composed end-to-end:

    documents -> language allow-list -> quality threshold -> exact dedup
    (keep min doc_id per byte-identical text) -> near-dup cluster dedup
    (keep min doc_id per Jaccard>=tau cluster) -> kept doc ids.

    Every stage is an already-oracle-checked operator; the composition has
    its own end-to-end SQL oracle.  Scale notes: exact dedup keys are
    content digests; quality/langid are vectorized map stages — nothing
    materializes the corpus.  The near-dup drop set (non-minimal cluster
    members) is broadcast into an np.isin filter only while it holds
    <= ``broadcast_drop_max`` ids (~16 MB of int64); a duplicate-heavier
    corpus — at 100 TB the drop set can be ~10 % of all ids — routes
    through :func:`..join.copartition_hash_join`'s anti-join instead
    (only keys shuffle), so no corpus-proportional object ever reaches
    the driver or the object store in one piece.  Both plans are
    pytest-equivalence-checked on a majority-duplicate corpus.
    """
    import pyarrow.compute as pc
    import ray
    import ray.data

    from .text import lang_id_batch, quality_score

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def keep_mask(batch: pa.Table) -> pa.Table:
        q = quality_score(batch)
        lang = lang_id_batch(batch)
        ok = pc.and_(
            pc.greater_equal(q["quality"], pa.scalar(float(min_quality))),
            pc.is_in(lang["lang_pred"],
                     value_set=pa.array(list(langs))))
        return batch.filter(ok)

    filtered = ds.map_batches(keep_mask, batch_format="pyarrow",
                              batch_size=None)
    # exact dedup keeps min doc_id per text (content-digest shuffle)
    keepers = exact_dedup(filtered, text_col="text", id_col="doc_id") \
        .select_columns(["doc_id"])
    # near-dup clusters over the FILTERED corpus; drop non-minimal members
    clusters = near_dup_clusters(filtered, tau=tau, k=k)

    def nonmin(batch: pa.Table) -> pa.Table:
        keep = pc.not_equal(batch["doc_id"], batch["cluster_id"])
        return batch.filter(keep).select(["doc_id"])

    drop_ds = clusters.map_batches(nonmin, batch_format="pyarrow",
                                   batch_size=None).materialize()
    n_drop = drop_ds.count()
    if n_drop > broadcast_drop_max:
        # scale path: co-partition anti-join — only the drop KEYS move,
        # never onto the driver
        from .join import copartition_hash_join

        return copartition_hash_join(keepers, drop_ds, on="doc_id",
                                     how="anti")
    drop_ids = np.sort(drop_ds.to_pandas()["doc_id"].to_numpy()
                       .astype(np.int64))
    drop_ref = ray.put(drop_ids)

    def not_near_dup(batch: pa.Table, drop_ref=drop_ref) -> pa.Table:
        dd = ray.get(drop_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = ~np.isin(ids, dd)
        return batch.filter(pa.array(keep))

    return keepers.map_batches(not_near_dup, batch_format="pyarrow",
                               batch_size=None)


# ---------------------------------------------------------------------------
# MinHash + LSH (the 100-TB scale path)

_N_PERM = 64
_BAND_ROWS = 4  # 16 bands of 4 rows


def decontaminate(sf_dir: str, eval_mod: int = 97, k: int = 3,
                  id_col: str = "doc_id", text_col: str = "text"):
    """Eval-set decontamination: flag training documents that share word-
    k-gram shingles with a benchmark ("eval") set — the standard
    pre-training hygiene step before a corpus ships.  The eval set here is
    deterministic (doc_id % eval_mod == 0; no external data), the overlap
    unit is the same distinct-shingle machinery as near_dup_pairs_exact
    (incl. the short-document whole-sequence fallback).

    Output: (doc_id, n_shingles, n_overlap, ratio) for every NON-eval
    document with >= 1 overlapping shingle; ratio = n_overlap/n_shingles.

    Scale design: pass 1 reduces the eval set to its DISTINCT shingle
    hashes — eval sets are tiny relative to the corpus, so this is a
    sorted int64 array broadcast once via ray.put + worker cache; pass 2
    streams the whole corpus with a vectorized searchsorted probe per
    batch.  NO shuffle at all: two read passes total (eval-shingle scan +
    probe scan), and in production the first pass reads only the eval
    split, so the full-corpus cost is one streaming pass.

    Zero-token documents emit no shingles on either side (SQL's empty-doc
    fallback aggregates to NULL and never joins), so empty training docs
    are never flagged even when the eval set contains empty docs.
    """
    import ray
    import ray.data

    from ..state.bcast import cached_get
    from .text import round_half_away

    ds = read_table(sf_dir, "documents", columns=[id_col, text_col])

    def eval_shingles(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = (ids % eval_mod) == 0
        if not m.any():
            return pa.table({"sh": pa.array([], type=pa.int64())})
        texts = batch[text_col].combine_chunks() if isinstance(
            batch[text_col], pa.ChunkedArray) else batch[text_col]
        texts = texts.filter(pa.array(m))
        _row, sh = _shingle_hashes_batch(texts, k, drop_empty=True)
        return pa.table({"sh": pa.array(np.unique(sh.astype(np.int64)),
                                        type=pa.int64())})

    ev_pd = (ds.map_batches(eval_shingles, batch_format="pyarrow",
                            batch_size=None).to_pandas())
    ev = np.unique(ev_pd["sh"].to_numpy())
    ev_ref = ray.put(ev)

    def probe(batch: pa.Table, ev_ref=ev_ref) -> pa.Table:
        ev = cached_get(ev_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = (ids % eval_mod) != 0
        keep_ids = ids[m]
        if len(keep_ids) == 0:
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                "n_shingles": pa.array([], type=pa.int64()),
                "n_overlap": pa.array([], type=pa.int64()),
                "ratio": pa.array([], type=pa.float64()),
            })
        texts = batch[text_col].combine_chunks() if isinstance(
            batch[text_col], pa.ChunkedArray) else batch[text_col]
        texts = texts.filter(pa.array(m))
        row_idx, sh = _shingle_hashes_batch(texts, k, drop_empty=True)
        sh = sh.astype(np.int64)
        n_sh = np.bincount(row_idx, minlength=len(keep_ids)).astype(np.int64)
        if len(ev):
            pos = np.searchsorted(ev, sh)
            hit = (pos < len(ev)) & (ev[np.minimum(pos, len(ev) - 1)] == sh)
        else:
            hit = np.zeros(len(sh), dtype=bool)
        n_ov = np.bincount(row_idx[hit],
                           minlength=len(keep_ids)).astype(np.int64)
        sel = n_ov > 0
        ratio = n_ov[sel].astype(np.float64) / n_sh[sel].astype(np.float64)
        return pa.table({
            id_col: pa.array(keep_ids[sel], type=pa.int64()),
            "n_shingles": pa.array(n_sh[sel]),
            "n_overlap": pa.array(n_ov[sel]),
            "ratio": pa.array(round_half_away(ratio), type=pa.float64()),
        })

    return ds.map_batches(probe, batch_format="pyarrow", batch_size=None)


def decontaminate_bloom(sf_dir: str, eval_mod: int = 97, k: int = 3,
                        m_bits: int = 1 << 20, n_hashes: int = 6,
                        id_col: str = "doc_id", text_col: str = "text"):
    """:func:`decontaminate` with the eval shingle set compressed into a
    Bloom filter — the broadcast scale path when the eval/blocklist side
    is too large to ship as a sorted int64 array (at 10 bits/key the
    filter is ~6x smaller; a 1B-shingle blocklist is ~1.2 GB of filter
    vs 8 GB of array).

    Guarantees: NO false negatives — every document the exact operator
    flags is flagged here with n_overlap_bloom >= n_overlap_exact (a
    contaminated document can never slip through).  False positives
    (rate ~ (1 - e^(-h*n/m))^h) only inflate n_overlap.  The filter's
    hashing is splitmix double hashing mirrored exactly in HUGEINT SQL
    (functions/bloom.py), so even the false positives are deterministic
    and the operator sits under the bit-exact DuckDB oracle gate.

    Scale design: pass 1 builds ONE partial filter per batch (an
    m_bits/8-byte blob, independent of batch size) and OR-merges the
    blobs — the driver never sees a shingle, only #batches fixed-size
    blobs (tree-mergeable); pass 2 is the same zero-shuffle streaming
    probe as the exact path.
    """
    import ray
    import ray.data

    from ..functions.bloom import bloom_build, bloom_contains, bloom_merge
    from ..state.bcast import cached_get
    from .text import round_half_away

    ds = read_table(sf_dir, "documents", columns=[id_col, text_col])

    def eval_partial_filter(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = (ids % eval_mod) == 0
        if not m.any():
            return pa.table({"bloom": pa.array([], type=pa.binary())})
        texts = batch[text_col].combine_chunks() if isinstance(
            batch[text_col], pa.ChunkedArray) else batch[text_col]
        texts = texts.filter(pa.array(m))
        _row, sh = _shingle_hashes_batch(texts, k, drop_empty=True)
        words = bloom_build(sh, m_bits, n_hashes)
        return pa.table({"bloom": pa.array([words.tobytes()],
                                           type=pa.binary())})

    blobs = (ds.map_batches(eval_partial_filter, batch_format="pyarrow",
                            batch_size=None).to_pandas())
    parts = [np.frombuffer(b, dtype=np.uint64) for b in blobs["bloom"]]
    words = bloom_merge(parts) if parts \
        else np.zeros(m_bits >> 6, dtype=np.uint64)
    w_ref = ray.put(words)

    def probe(batch: pa.Table, w_ref=w_ref) -> pa.Table:
        w = cached_get(w_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = (ids % eval_mod) != 0
        keep_ids = ids[m]
        if len(keep_ids) == 0:
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                "n_shingles": pa.array([], type=pa.int64()),
                "n_overlap": pa.array([], type=pa.int64()),
                "ratio": pa.array([], type=pa.float64()),
            })
        texts = batch[text_col].combine_chunks() if isinstance(
            batch[text_col], pa.ChunkedArray) else batch[text_col]
        texts = texts.filter(pa.array(m))
        row_idx, sh = _shingle_hashes_batch(texts, k, drop_empty=True)
        n_sh = np.bincount(row_idx, minlength=len(keep_ids)).astype(np.int64)
        hit = bloom_contains(w, sh, n_hashes, m_bits)
        n_ov = np.bincount(row_idx[hit],
                           minlength=len(keep_ids)).astype(np.int64)
        sel = n_ov > 0
        ratio = n_ov[sel].astype(np.float64) / n_sh[sel].astype(np.float64)
        return pa.table({
            id_col: pa.array(keep_ids[sel], type=pa.int64()),
            "n_shingles": pa.array(n_sh[sel]),
            "n_overlap": pa.array(n_ov[sel]),
            "ratio": pa.array(round_half_away(ratio), type=pa.float64()),
        })

    return ds.map_batches(probe, batch_format="pyarrow", batch_size=None)


def chunk_dedup(sf_dir: str, chunk_tokens: int = 50, min_docs: int = 2,
                id_col: str = "doc_id", text_col: str = "text"):
    """C4/CCNet-style duplicated-span removal: delete every fixed-token
    chunk that occurs (verbatim) in >= min_docs distinct documents —
    boilerplate paragraphs, navigation text, legal footers — and rebuild
    each document from its surviving chunks.

    Output: (doc_id, clean_text, n_chunks, n_kept) for EVERY document;
    clean_text = kept chunks joined by ' ' in chunk order ('' if all
    chunks were boilerplate or the document was empty).

    Scale design: the counting shuffle moves only (16-byte content digest,
    partial distinct-doc count) rows — per-batch pre-aggregated, never the
    chunk text (same blake2b-digest trick as exact_dedup, collision
    ~2^-64).  The duplicated-digest set is collected AFTER the >=min_docs
    filter, so only true boilerplate digests reach the driver — bounded
    by the corpus's boilerplate vocabulary, small in practice — and are
    broadcast once via ray.put + worker cache.  The cleaning pass is one
    stream with doc-local reassembly (documents are whole within a row),
    so the full corpus text is never shuffled.  For a pathological corpus
    whose duplicated-chunk set outgrows one heap, swap the broadcast for
    a digest-keyed co-partition join (join.copartition_hash_join
    contract) — same output.
    """
    import pandas as pd
    import pyarrow.compute as pc
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..state.bcast import cached_get
    from .text import _chunk_arrays, _string_array

    C = int(chunk_tokens)
    ds = read_table(sf_dir, "documents", columns=[id_col, text_col])

    def _digests(txt: pa.Array) -> list[bytes]:
        # the exact_dedup content-digest contract; chunk texts never null
        return [content_digest(t) for t in txt.to_pylist()]

    def partial(batch: pa.Table) -> pa.Table:
        texts = _string_array(batch[text_col])
        crow, _cid, _ctok, txt = _chunk_arrays(texts, C)
        if len(crow) == 0:
            return pa.table({"digest": pa.array([], type=pa.binary()),
                             "partial_docs": pa.array([], type=pa.int64())})
        df = pd.DataFrame({"d": _digests(txt), "doc": crow})
        g = (df.drop_duplicates().groupby("d", sort=False)
             .size().reset_index(name="n"))
        return pa.table({
            "digest": pa.array(g["d"], type=pa.binary()),
            "partial_docs": pa.array(g["n"].to_numpy().astype(np.int64)),
        })

    def only_dup(batch: pa.Table) -> pa.Table:
        m = pc.greater_equal(batch["n_docs"], min_docs)
        return batch.filter(m).select(["digest"])

    dup_pd = (ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=None)
              .groupby("digest")
              .aggregate(Sum("partial_docs", alias_name="n_docs"))
              .map_batches(only_dup, batch_format="pyarrow")
              .to_pandas())
    # an all-empty result loses its column names through to_pandas: a
    # corpus with NO duplicated chunks must yield an empty set, not a
    # KeyError (caught by the unicode stress corpus, all-unique chunks)
    dup_set = frozenset(dup_pd["digest"]) if "digest" in dup_pd.columns \
        else frozenset()
    dup_ref = ray.put(dup_set)

    def clean(batch: pa.Table, dup_ref=dup_ref) -> pa.Table:
        dup = cached_get(dup_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = _string_array(batch[text_col])
        n = len(texts)
        crow, _cid, _ctok, txt = _chunk_arrays(texts, C)
        if len(crow):
            # NEVER pd.Series.isin for bytes membership: pandas coerces
            # the probe values through numpy 'S16', which SILENTLY STRIPS
            # trailing null bytes — any digest ending in b'\x00' (~1 in
            # 256) then fails the lookup (caught by the heavy-duplication
            # stress oracle).  Plain set lookups hash raw bytes exactly.
            digs = _digests(txt)
            hit = np.fromiter((d in dup for d in digs), dtype=bool,
                              count=len(digs))
        else:
            hit = np.empty(0, dtype=bool)
        keep = ~hit
        n_chunks_row = np.bincount(crow, minlength=n).astype(np.int64)
        n_kept_row = np.bincount(crow[keep], minlength=n).astype(np.int64)
        kept_txt = txt.filter(pa.array(keep))
        # chunk rows are doc-major + chunk_id ascending, so per-row counts
        # are valid ListArray offsets and binary_join rebuilds each doc in
        # order; rows with zero kept chunks join to ''
        offsets = np.concatenate([[0], np.cumsum(n_kept_row)]) \
            .astype(np.int32)
        la = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                      kept_txt)
        clean_text = pc.binary_join(la, " ")
        return pa.table({
            id_col: pa.array(ids, type=pa.int64()),
            "clean_text": clean_text,
            "n_chunks": pa.array(n_chunks_row),
            "n_kept": pa.array(n_kept_row),
        })

    return ds.map_batches(clean, batch_format="pyarrow", batch_size=None)


def _perm_params(n_perm: int = _N_PERM) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(1234567)
    # small multipliers (< 2^20) keep a*x inside HUGEINT in the SQL mirror
    # and inside the fold-emulated 81-bit product on the numpy side
    a = rng.randint(1, 1 << 20, size=n_perm).astype(np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=n_perm).astype(np.uint64)
    return a, b


_PERM_A, _PERM_B = _perm_params()


def minhash_signature(sh: np.ndarray) -> np.ndarray:
    """(n_perm,) uint64 MinHash signature of a shingle-hash set.

    h_i(x) = (a_i * x + b_i) mod 2^61-1 — exact modular arithmetic
    (SQL-mirrorable), vectorized over shingles x perms.
    """
    vals = _mod61(_mulmod61_small(_PERM_A[None, :], sh[:, None])
                  + _PERM_B[None, :])
    return vals.min(axis=0)


def _minhash_signatures_flat(srow: np.ndarray, sh: np.ndarray,
                             n: int) -> np.ndarray:
    """(n, n_perm) signatures for a whole batch from doc-major flat shingle
    hashes — value-identical to per-doc :func:`minhash_signature` (same
    uint64 wrap + mod ops), via minimum.reduceat over doc segments.  Perms
    are processed in groups of 8 to bound the intermediate matrix.
    """
    counts = np.bincount(srow, minlength=n)
    assert (counts > 0).all(), "every doc must have >= 1 shingle"
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    sigs = np.empty((n, _N_PERM), dtype=np.uint64)
    step = 8
    for p0 in range(0, _N_PERM, step):
        vals = _mod61(_mulmod61_small(_PERM_A[None, p0:p0 + step],
                                      sh[:, None])
                      + _PERM_B[None, p0:p0 + step])
        sigs[:, p0:p0 + step] = np.minimum.reduceat(vals, starts, axis=0)
    return sigs


def _band_keys(sigs: np.ndarray) -> np.ndarray:
    """(n, n_bands) uint64 bucket keys < 2^61-1: Horner fold of each band's
    signature rows mod 2^61-1, seeded with band_idx+1 (SQL-mirrorable),
    vectorized across docs."""
    nb = _N_PERM // _BAND_ROWS
    out = np.empty((len(sigs), nb), dtype=np.uint64)
    for band in range(nb):
        h = np.full(len(sigs), np.uint64(band + 1), dtype=np.uint64)
        for c in range(_BAND_ROWS):
            h = _mod61(_mulmod61_small(_BAND_P, h)
                       + sigs[:, band * _BAND_ROWS + c])
        out[:, band] = h
    return out


def minhash_lsh_pairs(ds, tau: float = 0.5, k: int = 3,
                      id_col: str = "doc_id", text_col: str = "text"):
    """Near-dup candidate pairs via banded MinHash-LSH.

    doc -> signature -> 16 band-bucket rows; groupby(band, bucket) emits
    pairs; estimated jaccard = fraction of matching signature components;
    pairs deduped by groupby.  Scale: the shuffle moves (band_key, doc_id,
    signature) rows — 16 x (8 + 512) bytes per doc regardless of text size.
    """
    import pandas as pd
    from ray.data.aggregate import Max

    n_bands = _N_PERM // _BAND_ROWS

    def to_bands(batch: pa.Table) -> pa.Table:
        from ..kernel import keys as _keys

        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = batch[text_col].to_pandas()
        # empty docs emit no shingles (SQL-mirror parity, cf.
        # near_dup_pairs_exact) and therefore no signature/bands
        srow, sh_flat = _shingle_hashes_batch(texts, k, drop_empty=True)
        has = np.bincount(srow, minlength=len(ids)) > 0
        if not has.all():
            ids = ids[has]
            srow = (np.cumsum(has) - 1)[srow]
        if len(ids) == 0:
            # a batch of only empty/null docs emits no band rows
            return pa.table({
                "band_key": pa.array([], type=pa.int64()),
                "doc": pa.array([], type=pa.int64()),
                "sig": pa.array([], type=pa.binary()),
            })
        sigs = _minhash_signatures_flat(srow, sh_flat, len(ids))
        bk = _keys.to_key(_band_keys(sigs).reshape(-1))   # doc-major
        sig_bytes = np.array([s.tobytes() for s in sigs], dtype=object)
        return pa.table({
            "band_key": pa.array(bk, type=pa.int64()),
            "doc": pa.array(np.repeat(ids, n_bands), type=pa.int64()),
            "sig": pa.array(np.repeat(sig_bytes, n_bands).tolist(),
                            type=pa.binary()),
        })

    def emit_pairs(t: pa.Table) -> pa.Table:
        # one call per coarse partition; pair emission vectorized ACROSS
        # buckets — one pass per distinct bucket SIZE (a handful), never
        # one Python iteration per bucket.  Arrow in/out: the signature
        # blobs never round-trip through pandas blocks.
        if t.num_rows == 0:
            return pa.table({"i": pa.array([], type=pa.int64()),
                             "j": pa.array([], type=pa.int64()),
                             "est_jaccard": pa.array([], type=pa.float64())})
        bk0 = t["band_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        docs0 = t["doc"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((docs0, bk0))
        bk, docs = bk0[order], docs0[order]
        dup = np.concatenate([[False], (bk[1:] == bk[:-1])
                              & (docs[1:] == docs[:-1])])
        bk, docs = bk[~dup], docs[~dup]
        sig_col = t["sig"].take(pa.array(order[~dup]))
        # one frombuffer over the concatenated blob, not one per row
        sig_mat = np.frombuffer(b"".join(sig_col.to_pylist()),
                                dtype=np.uint64).reshape(len(bk), _N_PERM)
        starts = np.concatenate([[0],
                                 np.flatnonzero(bk[1:] != bk[:-1]) + 1])
        counts = np.diff(np.concatenate([starts, [len(bk)]]))
        out_i = [np.empty(0, dtype=np.int64)]
        out_j = [np.empty(0, dtype=np.int64)]
        out_e = [np.empty(0, dtype=np.float64)]
        for c in np.unique(counts[counts >= 2]):
            runs = starts[counts == c]
            idx = runs[:, None] + np.arange(c)[None, :]      # (R, c)
            ii, jj = np.triu_indices(int(c), 1)
            I, J = idx[:, ii].ravel(), idx[:, jj].ravel()
            est = (sig_mat[I] == sig_mat[J]).mean(axis=1)
            keep = est >= tau
            out_i.append(docs[I][keep])
            out_j.append(docs[J][keep])
            out_e.append(est[keep])
        return pa.table({
            "i": pa.array(np.concatenate(out_i)),
            "j": pa.array(np.concatenate(out_j)),
            "est_jaccard": pa.array(np.concatenate(out_e)),
        })

    return (
        ds.map_batches(to_bands, batch_format="pyarrow", batch_size=None)
        .map_batches(_add_partition("band_key"), batch_format="pyarrow")
        .groupby("part")
        .map_groups(emit_pairs, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Max("est_jaccard", alias_name="est_jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash

def _simhash_batch(row_idx: np.ndarray, th: np.ndarray, n: int) -> np.ndarray:
    """(n,) uint64 SimHashes for a batch from doc-major flat token hashes —
    value-identical to per-doc :func:`simhash64`.  Per-bit one-counts via
    weighted bincount (64 C passes), majority = 2*ones > n_tokens."""
    n_tok = np.bincount(row_idx, minlength=n).astype(np.int64)
    sims = np.zeros(n, dtype=np.uint64)
    for b in range(64):
        bit = ((th >> np.uint64(b)) & np.uint64(1)).astype(np.float64)
        ones = np.bincount(row_idx, weights=bit, minlength=n)
        sims |= (2 * ones > n_tok).astype(np.uint64) << np.uint64(b)
    return sims


def simhash64(tokens_hashes: np.ndarray) -> int:
    """64-bit SimHash of token hashes (majority vote per bit)."""
    if len(tokens_hashes) == 0:
        return 0
    bits = ((tokens_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for b in range(64):
        if votes[b] > 0:
            out |= np.uint64(1) << np.uint64(b)
    return int(out)


def simhash_pairs(ds, max_hamming: int = 3, id_col: str = "doc_id",
                  text_col: str = "text"):
    """Near-dup pairs with SimHash Hamming distance <= max_hamming.

    Banding: 4 x 16-bit chunks — any pair within Hamming 3 shares at least
    one exact chunk (pigeonhole), so groupby(chunk_id, chunk_value) finds
    all such pairs; exact Hamming verification inside the group.
    """
    import pandas as pd
    from ray.data.aggregate import Min

    def to_chunks(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = batch[text_col].to_pandas()
        row_idx, th, n = _hash_tokens_batch(texts)
        sims = _simhash_batch(row_idx, th, n)
        # 4 x 16-bit chunk rows per doc, doc-major
        shifts = (np.uint64(16) * np.arange(4, dtype=np.uint64))[None, :]
        vals = ((sims[:, None] >> shifts) & np.uint64(0xFFFF)).astype(np.int64)
        chunk_no = np.broadcast_to(np.arange(4, dtype=np.int64)[None, :],
                                   vals.shape)
        bucket = (chunk_no << 32) | vals
        sim_signed = (sims ^ np.uint64(1 << 63)).view(np.int64)
        return pa.table({
            "bucket": pa.array(bucket.reshape(-1), type=pa.int64()),
            "doc": pa.array(np.repeat(ids, 4), type=pa.int64()),
            "sim": pa.array(np.repeat(sim_signed, 4), type=pa.int64()),
        })

    def emit_pairs(t: pa.Table) -> pa.Table:
        # vectorized ACROSS buckets: one pass per distinct bucket size,
        # never one Python iteration per bucket (same shape as the
        # minhash emitter); Arrow in/out — no pandas block round-trip
        if t.num_rows == 0:
            return pa.table({"i": pa.array([], type=pa.int64()),
                             "j": pa.array([], type=pa.int64()),
                             "hamming": pa.array([], type=pa.int64())})
        bkt0 = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        docs0 = t["doc"].to_numpy(zero_copy_only=False).astype(np.int64)
        sims0 = t["sim"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((docs0, bkt0))
        bkt, docs, simsv = bkt0[order], docs0[order], sims0[order]
        dup = np.concatenate([[False], (bkt[1:] == bkt[:-1])
                              & (docs[1:] == docs[:-1])])
        bkt, docs, simsv = bkt[~dup], docs[~dup], simsv[~dup]
        # bias-decode via view+xor: int64 + 2**63 would silently
        # promote to float64 and corrupt the low bits (bug caught by
        # the simhash SQL oracle)
        sims = simsv.view(np.uint64) ^ np.uint64(1 << 63)
        starts = np.concatenate([[0],
                                 np.flatnonzero(bkt[1:] != bkt[:-1]) + 1])
        counts = np.diff(np.concatenate([starts, [len(bkt)]]))
        out_i = [np.empty(0, dtype=np.int64)]
        out_j = [np.empty(0, dtype=np.int64)]
        out_h = [np.empty(0, dtype=np.int64)]
        for c in np.unique(counts[counts >= 2]):
            runs = starts[counts == c]
            idx = runs[:, None] + np.arange(c)[None, :]
            ii, jj = np.triu_indices(int(c), 1)
            I, J = idx[:, ii].ravel(), idx[:, jj].ravel()
            x = sims[I] ^ sims[J]
            ham = np.zeros(len(x), dtype=np.int64)
            for _ in range(64):
                ham += (x & np.uint64(1)).astype(np.int64)
                x = x >> np.uint64(1)
            keep = ham <= max_hamming
            out_i.append(docs[I][keep])
            out_j.append(docs[J][keep])
            out_h.append(ham[keep])
        return pa.table({
            "i": pa.array(np.concatenate(out_i)),
            "j": pa.array(np.concatenate(out_j)),
            "hamming": pa.array(np.concatenate(out_h)),
        })

    return (
        ds.map_batches(to_chunks, batch_format="pyarrow", batch_size=None)
        .map_batches(_add_partition("bucket"), batch_format="pyarrow")
        .groupby("part")
        .map_groups(emit_pairs, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Min("hamming", alias_name="hamming"))
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup

def embedding_near_dup(sf_dir: str, tau: float = 0.45):
    """Pairs of embeddings with cosine similarity >= tau.

    Small-side design: the normalized matrix is broadcast once (ray.put);
    each batch matmuls its rows against the full matrix and emits pairs
    (i < j).  The LSH-bucketed variant for matrices that don't fit in one
    object lives in ann.py (same bucketing as similarity search).
    """
    import ray
    import ray.data

    tbl = _load_embedding_matrix(sf_dir)
    mat_ref = ray.put(tbl)

    def stage(batch: pa.Table, mat_ref=mat_ref) -> pa.Table:
        from ..functions.vecs import normalized_matrix

        vec_ids, mat = ray.get(mat_ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        emb = normalized_matrix(batch["embedding"])
        sims = emb @ mat.T
        rr, cc = np.nonzero(sims >= tau)          # one 2-D pass, no row loop
        keep = vec_ids[cc] > ids[rr]
        return pa.table({
            "i": pa.array(ids[rr[keep]], type=pa.int64()),
            "j": pa.array(vec_ids[cc[keep]], type=pa.int64()),
        })

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ds.map_batches(stage, batch_format="pyarrow", batch_size=None)


EMB_LSH_MAX_BUCKET = 4096


def embedding_near_dup_lsh(sf_dir: str, tau: float = 0.45,
                           multi_probe_hamming: int = 1, n_planes: int = 8,
                           max_bucket: int = EMB_LSH_MAX_BUCKET):
    """Scale path for cosine near-dup: random-hyperplane LSH bucketing.

    Each vector is emitted into its own bucket plus all buckets within
    multi_probe_hamming bit flips (multi-probe); candidate pairs form inside
    buckets only, verified with the exact cosine.  No broadcast matrix, no
    O(N^2): the shuffle key is the bucket id.  Recall < 1 by design —
    measured against the exact operator in tests.

    ``max_bucket`` guards the one quadratic hazard: a degenerate corpus
    (many identical / near-zero vectors collapsing onto one signature)
    would make a single reducer O(B^2).  Buckets with more than
    ``max_bucket`` distinct vectors are dropped — the same documented
    deviation as ``near_dup_pairs_exact``'s ``max_posting``; the SQL
    oracle mirrors the cap bucket-for-bucket, so the operator stays
    hash-exact even when the cap fires.
    """
    import ray.data

    from ..functions.vecs import embedding_dim, normalized_matrix
    from .ann import _lsh_planes, lsh_signature

    # dim from a 1-row probe of the first row group — never a driver
    # whole-column read
    dim = embedding_dim(f"{sf_dir}/embeddings.parquet")
    # fewer planes than the search index: near-dup recall needs coarser
    # buckets (true near-dups at cos >= 0.9 land within hamming<=2 of 8
    # bits with ~90% probability)
    planes = _lsh_planes(dim, n_planes)

    def to_buckets(batch: pa.Table) -> pa.Table:
        import pandas as pd

        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        emb = normalized_matrix(batch["embedding"])
        sig = lsh_signature(emb, planes).astype(np.int64)
        probes = np.array([0] + ([1 << b for b in range(n_planes)]
                                 if multi_probe_hamming >= 1 else []),
                          dtype=np.int64)
        # vectorized multi-probe fan-out: (N, P) buckets, row-major
        buckets = (sig[:, None] ^ probes[None, :]).reshape(-1)
        np_ = len(probes)
        blobs = [emb[r].tobytes() for r in range(len(ids))]  # one per vec
        rows_v = np.repeat(np.array(blobs, dtype=object), np_)
        return pa.table({
            "bucket": pa.array(buckets, type=pa.int64()),
            "vec_id": pa.array(np.repeat(ids, np_), type=pa.int64()),
            "vec": pa.array(rows_v.tolist(), type=pa.binary()),
        })

    def emit_pairs(df):
        import pandas as pd

        empty = pd.DataFrame({"i": pd.Series(dtype=np.int64),
                              "j": pd.Series(dtype=np.int64)})
        d = df.drop_duplicates("vec_id").sort_values("vec_id")
        if len(d) < 2 or len(d) > max_bucket:
            # oversized bucket: documented drop (mirrored by the oracle)
            return empty
        ids = d["vec_id"].to_numpy()
        mat = np.frombuffer(b"".join(d["vec"]), dtype=np.float64) \
            .reshape(len(ids), -1)
        # row-chunked matmul keeps the sims allocation bounded even at the
        # max_bucket ceiling (4096 rows -> <=16 MB per chunk, not 128 MB)
        out_i, out_j = [], []
        for s in range(0, len(ids), 512):
            e = min(s + 512, len(ids))
            sims = mat[s:e] @ mat.T               # (chunk, B)
            rr, cc = np.nonzero(sims >= tau)
            keep = cc > (rr + s)                  # global i < j only
            out_i.append(ids[rr[keep] + s])
            out_j.append(ids[cc[keep]])
        if not out_i:
            return empty
        return pd.DataFrame({"i": np.concatenate(out_i),
                             "j": np.concatenate(out_j)})

    def pack_pairs(batch: pa.Table) -> pa.Table:
        # compact pair-dedup partials: one blob row per coarse partition
        # instead of one Ray group per pair (a pair found in all 9 shared
        # buckets would otherwise cost ~1 ms of sort-groupby each)
        i = batch["i"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = batch["j"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(i) == 0:
            return pa.table({"part": pa.array([], type=pa.int32()),
                             "pk_b": pa.array([], type=pa.binary())})
        if int(i.min()) < 0 or int(j.max()) >= 1 << 31:
            raise ValueError(
                "embedding_near_dup_lsh requires vec ids in [0, 2^31)")
        pk = np.unique((i << 32) | j)
        part = (pk % _N_PAIR_PARTITIONS).astype(np.int32)
        order = np.argsort(part, kind="stable")
        pk, part = pk[order], part[order]
        starts = np.concatenate([[0], np.flatnonzero(
            part[1:] != part[:-1]) + 1, [len(part)]])
        return pa.table({
            "part": pa.array([int(part[s]) for s in starts[:-1]],
                             type=pa.int32()),
            "pk_b": pa.array([pk[s:e].tobytes() for s, e in
                              zip(starts[:-1], starts[1:])],
                             type=pa.binary()),
        })

    def dedup_part(df):
        import pandas as pd

        if len(df) == 0:
            return pd.DataFrame({"i": pd.Series(dtype=np.int64),
                                 "j": pd.Series(dtype=np.int64)})
        pk = np.unique(np.concatenate(
            [np.frombuffer(x, dtype=np.int64) for x in df["pk_b"]]))
        return pd.DataFrame({"i": pk >> np.int64(32),
                             "j": pk & np.int64(0xFFFFFFFF)})

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return (
        ds.map_batches(to_buckets, batch_format="pyarrow", batch_size=None)
        .groupby("bucket")
        .map_groups(emit_pairs, batch_format="pandas")
        .map_batches(pack_pairs, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dedup_part, batch_format="pandas")
    )


def _load_embedding_matrix(sf_dir: str):
    # declared broadcast baseline: embedding_near_dup ships the WHOLE
    # normalized matrix once by design (the LSH variant is the scale path)
    from ..sources.readers import load_embedding_matrix

    return load_embedding_matrix(sf_dir)


def semantic_dedup(sf_dir: str, tau: float = 0.45, n_clusters: int = 8,
                   train_rows: int = 4096, max_cluster: int = 100_000):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    the embedding space with deterministic spherical k-means, then dedup
    EXACTLY (pairwise cosine >= tau, connected components, keep the min
    vec_id per component) WITHIN each cluster only.

    Output: one row per DROPPED vector — (vec_id, rep_id, sim) where
    rep_id is the kept representative (component min) and sim the exact
    cosine to it.  Precision is 1 by construction (every drop is backed
    by an exact >= tau within-cluster pair); recall vs the global exact
    operator depends on how often near-dup pairs straddle a centroid
    boundary — pytest-measured on the test corpus.

    Scale shape: centroids train on a bounded sample and broadcast; the
    ONE all-to-all moves (cluster, vec_id, float32 embedding blob) rows —
    each vector shuffles exactly once to its cluster's reducer, which is
    the minimum co-location any within-cluster pairwise method needs.
    Clusters larger than ``max_cluster`` are split into deterministic
    vec_id-hash sub-buckets (bounded O(max_cluster^2) per reducer;
    boundary pairs across sub-buckets are forgone, same contract as the
    LSH hot-bucket cap).
    """
    import pandas as pd
    import ray
    import pyarrow.parquet as pq

    from ..functions.vecs import normalized_matrix
    from ..state.bcast import cached_get
    from .ann import _kmeans_centroids

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    first = next(pf.iter_batches(batch_size=train_rows,
                                 columns=["vec_id", "embedding"]))
    sample = normalized_matrix(pa.Table.from_batches([first])["embedding"])
    cent = _kmeans_centroids(sample, n_clusters)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table, cent_ref=cent_ref) -> pa.Table:
        cent = cached_get(cent_ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        emb = normalized_matrix(batch["embedding"]).astype(np.float32)
        cl = np.argmax(emb @ cent.T.astype(np.float32), axis=1) \
            .astype(np.int64)
        # deterministic sub-bucket for oversized clusters (splitmix-mixed
        # id so the split is stable across runs and block layouts)
        sub = ((ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
               >> np.uint64(33)).astype(np.int64)
        # zero-copy fixed-width blob column (no per-row python tobytes)
        d4 = emb.shape[1] * 4
        blob = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(d4), len(ids),
            [None, pa.py_buffer(np.ascontiguousarray(emb).tobytes())])
        return pa.table({
            "cluster": pa.array(cl),
            "sub": pa.array(sub),
            "vec_id": pa.array(ids),
            "emb": blob,
        })

    def dedup_cluster(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_id": pd.Series(dtype=np.int64),
                              "rep_id": pd.Series(dtype=np.int64),
                              "sim": pd.Series(dtype=np.float64)})
        if len(df) < 2:
            return empty
        out = [empty]
        n_sub = max(1, int(np.ceil(len(df) / max_cluster)))
        sub = (df["sub"].to_numpy() % n_sub) if n_sub > 1 \
            else np.zeros(len(df), dtype=np.int64)
        for b in range(n_sub):
            part = df.iloc[np.nonzero(sub == b)[0]]
            if len(part) < 2:
                continue
            ids = part["vec_id"].to_numpy().astype(np.int64)
            order = np.argsort(ids)
            ids = ids[order]
            E = np.frombuffer(b"".join(part["emb"].iloc[order]),
                              dtype=np.float32).reshape(len(ids), -1)
            sims = (E @ E.T).astype(np.float64)
            iu, ju = np.triu_indices(len(ids), 1)
            hit = sims[iu, ju] >= tau
            if not hit.any():
                continue
            nodes, labels = _union_find_labels(ids[iu[hit]], ids[ju[hit]])
            drop = nodes != labels
            didx = np.searchsorted(ids, nodes[drop])
            ridx = np.searchsorted(ids, labels[drop])
            out.append(pd.DataFrame({
                "vec_id": nodes[drop],
                "rep_id": labels[drop],
                "sim": sims[didx, ridx],
            }))
        return pd.concat(out, ignore_index=True)

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return (ds.map_batches(assign, batch_format="pyarrow", batch_size=None)
            .groupby("cluster")
            .map_groups(dedup_cluster, batch_format="pandas"))


def _doc_shingle_stats(sf_dir: str, k: int, id_col: str, text_col: str,
                       flag_fn, count_col: str, frac_col: str):
    """Shared engine for per-document distinct-shingle statistics computed
    against the global shingle->documents inverted index (dup_span_stats,
    ngram_novelty).  ``flag_fn(doc_sorted, starts, runlen)`` receives the
    partition's postings sorted by (shingle, doc) — ``starts`` delimits
    each shingle's run (len = n_runs + 1) — and returns one 0/1 flag per
    posting; the output is per-doc (n_shingles, sum(flag), flag_frac).

    Scale shape: the same compact-blob inverted shuffle as
    near_dup_pairs_exact — per batch, ONE row per coarse shingle partition
    carrying (sh, doc) int64 blobs; each partition reducer computes per-
    shingle document runs locally (per-doc shingles are already distinct,
    so run length == distinct docs; every posting of a shingle lands in
    its one hash partition, so run-level facts are globally exact) and
    emits its per-document PARTIAL (n, n_flag) sums as ONE blob row per
    doc-hash bucket; a second bucket-keyed merge folds the <=
    n_partitions x n_doc_buckets blob rows into per-doc totals.  Both
    shuffles move compact blobs, never text and never one row per
    (doc, partition) — a doc-keyed row-wise groupby here measured
    80us/row through Ray's sort shuffle and dominated the whole query 10x.
    """
    import pandas as pd

    from ..kernel import keys as _keys
    from .text import round_half_away

    n_doc_buckets = 64

    ds = read_table(sf_dir, "documents", columns=[id_col, text_col])

    def to_postings(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch[text_col].to_pandas()
        srow, sh_flat = _shingle_hashes_batch(texts, k, drop_empty=True)
        if len(sh_flat) == 0:
            return pa.table({
                "part": pa.array([], type=pa.int32()),
                "sh_b": pa.array([], type=pa.binary()),
                "doc_b": pa.array([], type=pa.binary()),
            })
        sh = _keys.to_key(sh_flat)
        doc = ids[srow]
        part = (sh % _N_PAIR_PARTITIONS).astype(np.int32)
        order = np.argsort(part, kind="stable")
        sh, doc, part = sh[order], doc[order], part[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(part[1:] != part[:-1]) + 1, [len(part)]])
        rows_p, rows_sh, rows_doc = [], [], []
        for s, e_ in zip(starts[:-1], starts[1:]):
            rows_p.append(int(part[s]))
            rows_sh.append(sh[s:e_].tobytes())
            rows_doc.append(doc[s:e_].tobytes())
        return pa.table({
            "part": pa.array(rows_p, type=pa.int32()),
            "sh_b": pa.array(rows_sh, type=pa.binary()),
            "doc_b": pa.array(rows_doc, type=pa.binary()),
        })

    def bucket_partials(df: pd.DataFrame) -> pd.DataFrame:
        sh = np.concatenate([np.frombuffer(b, dtype=np.int64)
                             for b in df["sh_b"]])
        doc = np.concatenate([np.frombuffer(b, dtype=np.int64)
                              for b in df["doc_b"]])
        order = np.lexsort((doc, sh))
        sh, doc = sh[order], doc[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(sh[1:] != sh[:-1]) + 1, [len(sh)]])
        runlen = np.diff(starts)
        flag = flag_fn(doc, starts, runlen)
        u_doc, inv = np.unique(doc, return_inverse=True)
        pn = np.bincount(inv, minlength=len(u_doc)).astype(np.int64)
        pdup = np.bincount(inv, weights=flag,
                           minlength=len(u_doc)).astype(np.int64)
        # one compact blob row per doc-hash bucket (u_doc is sorted, so
        # each bucket's slice stays doc-sorted after the stable argsort)
        db = (u_doc % n_doc_buckets).astype(np.int64)
        o2 = np.argsort(db, kind="stable")
        db, u_doc, pn, pdup = db[o2], u_doc[o2], pn[o2], pdup[o2]
        bstarts = np.concatenate(
            [[0], np.flatnonzero(db[1:] != db[:-1]) + 1, [len(db)]])
        rows = {"db": [], "doc_b": [], "n_b": [], "d_b": []}
        for s, e_ in zip(bstarts[:-1], bstarts[1:]):
            rows["db"].append(int(db[s]))
            rows["doc_b"].append(u_doc[s:e_].tobytes())
            rows["n_b"].append(pn[s:e_].tobytes())
            rows["d_b"].append(pdup[s:e_].tobytes())
        return pd.DataFrame(rows)

    def merge_doc_bucket(df: pd.DataFrame) -> pd.DataFrame:
        doc = np.concatenate([np.frombuffer(b, dtype=np.int64)
                              for b in df["doc_b"]])
        n = np.concatenate([np.frombuffer(b, dtype=np.int64)
                            for b in df["n_b"]])
        d = np.concatenate([np.frombuffer(b, dtype=np.int64)
                            for b in df["d_b"]])
        order = np.argsort(doc, kind="stable")
        doc, n, d = doc[order], n[order], d[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(doc[1:] != doc[:-1]) + 1])
        u = doc[starts]
        ns = np.add.reduceat(n, starts)
        dsum = np.add.reduceat(d, starts)
        return pd.DataFrame({
            id_col: u,
            "n_shingles": ns,
            count_col: dsum,
            frac_col: round_half_away(dsum / np.maximum(1, ns)),
        })

    return (ds.map_batches(to_postings, batch_format="pyarrow",
                           batch_size=None)
            .groupby("part")
            .map_groups(bucket_partials, batch_format="pandas")
            .groupby("db")
            .map_groups(merge_doc_bucket, batch_format="pandas"))


def dup_span_stats(sf_dir: str, k: int = 3, id_col: str = "doc_id",
                   text_col: str = "text"):
    """Fine-grained duplication signal (the span-level view behind C4 /
    "Deduplicating Training Data Makes LMs Better"-style cleaning): for
    every document, how many of its DISTINCT word-k-gram shingles also
    occur in at least one OTHER document.  Output: (doc_id, n_shingles,
    n_dup, dup_frac) for documents with >= 1 shingle (zero-token docs emit
    none, mirroring the SQL empty-doc fallback).  Execution shape:
    :func:`_doc_shingle_stats`.
    """

    def dup_flags(doc, starts, runlen):
        # a run's length IS the number of distinct documents holding the
        # shingle (per-doc shingles are distinct)
        return np.repeat(runlen >= 2, runlen)

    return _doc_shingle_stats(sf_dir, k, id_col, text_col, dup_flags,
                              "n_dup", "dup_frac")


def ngram_novelty(sf_dir: str, k: int = 3, id_col: str = "doc_id",
                  text_col: str = "text"):
    """Order-aware novelty diagnostic (the signal behind "how much new
    text does each crawl snapshot add"): for every document, how many of
    its DISTINCT word-k-gram shingles have their corpus-wide FIRST
    occurrence in this document, taking doc_id order as corpus order
    (min-doc_id rule, the same convention as corpus_dedup_keep).  Output:
    (doc_id, n_shingles, n_novel, novelty_frac); zero-shingle docs emit
    no row.  A boilerplate page re-crawled late scores ~0; the origin of
    a duplicated span scores it as novel.

    Execution shape: :func:`_doc_shingle_stats` — one extra fact per
    shingle run (its min doc id, exact because a shingle's postings all
    land in one hash partition and arrive doc-sorted).
    """

    def novel_flags(doc, starts, runlen):
        # postings are (shingle, doc)-lexsorted, so each run's first doc
        # is the shingle's global min doc id
        return doc == np.repeat(doc[starts[:-1]], runlen)

    return _doc_shingle_stats(sf_dir, k, id_col, text_col, novel_flags,
                              "n_novel", "novelty_frac")


def dup_degree_hist(sf_dir: str, tau: float = 0.5,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Degree distribution of the near-duplicate graph: (degree, n_docs)
    where degree = number of Jaccard >= tau neighbors a document has.
    The graph-shape diagnostic behind dedup policy choices (a heavy tail
    means clusters, not pairs — cluster-level dedup pays off).

    Pair volume is already compact (near_dup_pairs_exact's contract), so
    both follow-up aggregations move pair-scale rows: endpoint partials
    -> doc-keyed degree Sum -> degree histogram.
    """
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=[id_col, text_col])
    pairs = near_dup_pairs_exact(ds, tau=tau, id_col=id_col,
                                 text_col=text_col)

    def endpoint_partial(batch: pa.Table) -> pa.Table:
        both = np.concatenate([
            batch["i"].to_numpy(zero_copy_only=False).astype(np.int64),
            batch["j"].to_numpy(zero_copy_only=False).astype(np.int64)])
        u, c = np.unique(both, return_counts=True)
        return pa.table({"doc": pa.array(u),
                         "pdeg": pa.array(c.astype(np.int64))})

    deg = (pairs.map_batches(endpoint_partial, batch_format="pyarrow",
                             batch_size=None)
           .groupby("doc").aggregate(Sum("pdeg", alias_name="degree")))

    def hist_partial(batch: pa.Table) -> pa.Table:
        d = batch["degree"].to_numpy(zero_copy_only=False)
        u, c = np.unique(d, return_counts=True)
        return pa.table({"degree": pa.array(u.astype(np.int64)),
                         "pn": pa.array(c.astype(np.int64))})

    return (deg.map_batches(hist_partial, batch_format="pyarrow",
                            batch_size=None)
            .groupby("degree").aggregate(Sum("pn", alias_name="n_docs")))


def dup_by_length(sf_dir: str, n_parts: int = 64):
    """Duplicate rate by document-length decile: are long documents more
    (or less) likely to be exact duplicates?  Joins the exact-dup flag
    (content-digest groups of size >= 2) with the per-language NTILE(10)
    length decile — (lang, decile, n_docs, n_dups, dup_rate).  The
    curation-dashboard composition of exact_dedup and doc_deciles.

    Scale plan: the dup flag rides ONE digest-hashed blob co-partition
    (16-byte digest + id per doc; all copies of a digest co-locate, so
    group size finishes in-block); the per-doc decile comes from the
    established doc_deciles two-level scan; ONE doc_id co-partition
    joins flag to decile and only (lang, decile) cell partials reach
    the final bounded groupby.  The rate is the single mirrored
    division.
    """
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table
    from .analytics import doc_deciles
    from .join import (_ipc_bytes, _ipc_table, _part_of,
                       copartition_hash_join)
    from .text import round_half_away

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def tag(batch: pa.Table) -> pa.Table:
        t = batch["text"].to_pandas()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        dig = [content_digest(x) for x in t]  # handles None/NaN itself
        d1 = np.frombuffer(b"".join(d[:8] for d in dig),
                           dtype=">i8").astype(np.int64) \
            if dig else np.empty(0, np.int64)
        d2 = np.frombuffer(b"".join(d[8:] for d in dig),
                           dtype=">i8").astype(np.int64) \
            if dig else np.empty(0, np.int64)
        part = _part_of(d1, n_parts).astype(np.int64)
        ordp = np.argsort(part, kind="stable")
        part, d1, d2, ids = part[ordp], d1[ordp], d2[ordp], ids[ordp]
        bstarts = np.concatenate(
            [[0], np.flatnonzero(part[1:] != part[:-1]) + 1,
             [len(part)]]) if len(part) else np.array([0, 0])
        rows_p, rows_b = [], []
        for a_, b_ in zip(bstarts[:-1], bstarts[1:]):
            if b_ <= a_:
                continue
            rows_p.append(int(part[a_]))
            rows_b.append(_ipc_bytes(pa.table({
                "d1": pa.array(d1[a_:b_]), "d2": pa.array(d2[a_:b_]),
                "i": pa.array(ids[a_:b_])})))
        return pa.table({
            "part": pa.array(rows_p, type=pa.int32()),
            "blob": pa.array(rows_b, type=pa.large_binary()),
        })

    def flags(df) -> pa.Table:
        tabs = [_ipc_table(b) for b in df["blob"]]
        t = pa.concat_tables(tabs) if tabs else pa.table(
            {"d1": pa.array([], type=pa.int64()),
             "d2": pa.array([], type=pa.int64()),
             "i": pa.array([], type=pa.int64())})
        d1 = t["d1"].to_numpy(zero_copy_only=False).astype(np.int64)
        d2 = t["d2"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = t["i"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(i):
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "dup": pa.array([], type=pa.int64())})
        order = np.lexsort((d2, d1))
        d1, d2, i = d1[order], d2[order], i[order]
        new = np.concatenate(
            [[True], (d1[1:] != d1[:-1]) | (d2[1:] != d2[:-1])])
        seg = np.cumsum(new) - 1
        sz = np.bincount(seg).astype(np.int64)
        return pa.table({"doc_id": pa.array(i),
                         "dup": pa.array((sz[seg] >= 2)
                                         .astype(np.int64))})

    flag_ds = (docs.map_batches(tag, batch_format="pyarrow",
                                batch_size=None)
               .groupby("part")
               .map_groups(flags, batch_format="pandas"))

    dec = doc_deciles(sf_dir).map_batches(
        lambda b: b.select(["doc_id", "lang", "decile"]),
        batch_format="pyarrow", batch_size=None)

    j = copartition_hash_join(dec, flag_ds, on="doc_id",
                              n_parts=n_parts, how="inner")

    def cells(batch: pa.Table) -> pa.Table:
        lang = batch["lang"].to_pandas()
        gk = lang.where(lang.notna(), "\x00").astype(str).to_numpy()
        dc = batch["decile"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        dup = batch["dup"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        g = pd.DataFrame({"lang": gk, "decile": dc, "dup": dup}) \
            .groupby(["lang", "decile"], sort=False) \
            .agg(pn=("dup", "size"), pd_=("dup", "sum")).reset_index()
        return pa.table({
            "lang": pa.array(g["lang"], type=pa.string()),
            "decile": pa.array(g["decile"].to_numpy()
                               .astype(np.int64)),
            "pn": pa.array(g["pn"].to_numpy().astype(np.int64)),
            "pd_": pa.array(g["pd_"].to_numpy().astype(np.int64)),
        })

    m = (j.map_batches(cells, batch_format="pyarrow", batch_size=None)
         .groupby(["lang", "decile"])
         .aggregate(Sum("pn", alias_name="n_docs"),
                    Sum("pd_", alias_name="n_dups"))).to_pandas() \
        .sort_values(["lang", "decile"], ignore_index=True)
    rate = [float(round_half_away(np.float64(
        float(int(d_)) / float(int(n_)))))
        for d_, n_ in zip(m["n_dups"], m["n_docs"])] if len(m) else []
    lang_out = m["lang"].where(m["lang"] != "\x00", None) if len(m) \
        else m.get("lang", pd.Series(dtype=object))
    return ray.data.from_arrow(pa.table({
        "lang": pa.array(lang_out, type=pa.string()),
        "decile": pa.array(m["decile"].to_numpy().astype(np.int64)
                           if len(m) else np.empty(0, np.int64)),
        "n_docs": pa.array(m["n_docs"].to_numpy().astype(np.int64)
                           if len(m) else np.empty(0, np.int64)),
        "n_dups": pa.array(m["n_dups"].to_numpy().astype(np.int64)
                           if len(m) else np.empty(0, np.int64)),
        "dup_rate": pa.array(rate, type=pa.float64()),
    }))


DUP_BY_LENGTH_SQL = """
WITH dec AS (
  SELECT doc_id, lang,
         CAST(ntile(10) OVER (PARTITION BY lang
                              ORDER BY n_chars, doc_id) AS BIGINT)
           AS decile
  FROM documents),
fl AS (SELECT doc_id,
              CASE WHEN count(*) OVER (PARTITION BY text) >= 2
                   THEN 1 ELSE 0 END AS dup
       FROM documents)
SELECT dec.lang, dec.decile, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(fl.dup) AS BIGINT) AS n_dups,
       round(CAST(sum(fl.dup) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         AS dup_rate
FROM dec JOIN fl USING (doc_id)
GROUP BY 1, 2 ORDER BY 1, 2"""


def source_cooccurrence(pages_ds, n_parts: int = 64):
    """Cross-domain contamination matrix over the crawl: for each
    unordered domain pair, the number of DISTINCT page texts both
    domains serve — (source_a, source_b, n_shared_texts).  High
    off-diagonal mass means mirrored feeds; the provenance companion
    of exact_dedup (dup_span_stats tells you how much is duplicated,
    this tells you between whom).  Domains extract from the url — the
    only provenance field a real crawl record carries.

    Scale plan: distinct (digest, domain) pairs collapse per batch and
    ride ONE digest-hashed blob co-partition (16-byte digest + domain
    string, never the text); each merge block sees every domain of a
    digest, enumerates its C(k, 2) domain pairs (k <= domain
    vocabulary, and ONLY shared digests enter the python loop) and
    emits pair count partials — the final groupby is
    |domains|^2-bounded.  NULL urls drop on both engines.
    """
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Sum

    from .join import _ipc_bytes, _ipc_table, _part_of

    def tag(batch: pa.Table) -> pa.Table:
        t = batch["text"].to_pandas()
        dom = pc.struct_field(
            pc.extract_regex(pc.cast(batch["url"], pa.string()),
                             r"https://(?P<d>[^/]+)/"), "d")
        s = dom.to_pandas()
        ok = s.notna().to_numpy()
        t, s = t[ok], s[ok].astype(str)
        pairs = pd.DataFrame({"t": t, "s": s}).drop_duplicates()
        dig = [content_digest(x) for x in pairs["t"]]
        d1 = np.frombuffer(b"".join(d[:8] for d in dig),
                           dtype=">i8").astype(np.int64) \
            if dig else np.empty(0, np.int64)
        d2 = np.frombuffer(b"".join(d[8:] for d in dig),
                           dtype=">i8").astype(np.int64) \
            if dig else np.empty(0, np.int64)
        sv = pairs["s"].to_numpy()
        part = _part_of(d1, n_parts).astype(np.int64)
        ordp = np.argsort(part, kind="stable")
        part, d1, d2, sv = part[ordp], d1[ordp], d2[ordp], sv[ordp]
        bstarts = np.concatenate(
            [[0], np.flatnonzero(part[1:] != part[:-1]) + 1,
             [len(part)]]) if len(part) else np.array([0, 0])
        rows_p, rows_b = [], []
        for a_, b_ in zip(bstarts[:-1], bstarts[1:]):
            if b_ <= a_:
                continue
            rows_p.append(int(part[a_]))
            rows_b.append(_ipc_bytes(pa.table({
                "d1": pa.array(d1[a_:b_]), "d2": pa.array(d2[a_:b_]),
                "s": pa.array(sv[a_:b_], type=pa.string())})))
        return pa.table({
            "part": pa.array(rows_p, type=pa.int32()),
            "blob": pa.array(rows_b, type=pa.large_binary()),
        })

    def pairs_of(df) -> pa.Table:
        from collections import Counter

        tabs = [_ipc_table(b) for b in df["blob"]]
        t = pa.concat_tables(tabs) if tabs else pa.table(
            {"d1": pa.array([], type=pa.int64()),
             "d2": pa.array([], type=pa.int64()),
             "s": pa.array([], type=pa.string())})
        d1 = t["d1"].to_numpy(zero_copy_only=False).astype(np.int64)
        d2 = t["d2"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = np.asarray(t["s"].to_pandas(), dtype=object)
        if not len(d1):
            return pa.table({
                "source_a": pa.array([], type=pa.string()),
                "source_b": pa.array([], type=pa.string()),
                "pn": pa.array([], type=pa.int64())})
        order = np.lexsort((s, d2, d1))
        d1, d2, s = d1[order], d2[order], s[order]
        # cross-batch duplicates of (digest, source) collapse here
        new = np.concatenate(
            [[True], (d1[1:] != d1[:-1]) | (d2[1:] != d2[:-1])
             | (s[1:] != s[:-1])])
        d1, d2, s = d1[new], d2[new], s[new]
        dstart = np.concatenate(
            [[True], (d1[1:] != d1[:-1]) | (d2[1:] != d2[:-1])])
        starts = np.flatnonzero(dstart).astype(np.int64)
        sizes = np.diff(np.concatenate([starts, [len(d1)]])) \
            .astype(np.int64)
        cnt = Counter()
        multi = sizes >= 2        # python loop over SHARED digests only
        for st, sz in zip(starts[multi], sizes[multi]):
            grp = s[st:st + sz]          # sorted, distinct sources
            for i in range(sz - 1):
                for j in range(i + 1, sz):
                    cnt[(grp[i], grp[j])] += 1
        keys = sorted(cnt)
        return pa.table({
            "source_a": pa.array([k[0] for k in keys],
                                 type=pa.string()),
            "source_b": pa.array([k[1] for k in keys],
                                 type=pa.string()),
            "pn": pa.array([cnt[k] for k in keys], type=pa.int64()),
        })

    return (pages_ds.map_batches(tag, batch_format="pyarrow",
                                 batch_size=None)
            .groupby("part")
            .map_groups(pairs_of, batch_format="pandas")
            .groupby(["source_a", "source_b"])
            .aggregate(Sum("pn", alias_name="n_shared_texts"))
            .sort(["source_a", "source_b"]))


def source_cooccurrence_sql(cte: str) -> str:
    """Oracle for :func:`source_cooccurrence` — distinct (text, domain)
    self-join on text equality across domain pairs."""
    return f"""{cte},
g AS (SELECT DISTINCT text,
             regexp_extract(url, 'https://([^/]+)/', 1) AS source
      FROM pages_geo),
pr AS (SELECT a.source AS source_a, b.source AS source_b
       FROM g a JOIN g b ON a.text IS NOT DISTINCT FROM b.text
                        AND a.source < b.source)
SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_shared_texts
FROM pr GROUP BY 1, 2 ORDER BY 1, 2"""


def dup_cluster_purity(sf_dir: str, tau: float = 0.5):
    """Language purity of the near-duplicate clusters — (cluster_size,
    n_clusters, n_pure, sum_max_lang, avg_purity, pure_rate), one row
    per observed cluster size.  Cross-language "duplicates" out of a
    Jaccard-shingle join are usually template/boilerplate families
    rather than true copies, so a falling purity at a given size is a
    direct measure of template pollution the dedup keep-rule is about
    to mis-drop.

    Exactness: clusters come from the oracle-gated near_dup_clusters
    core; per-cluster language counts follow SQL GROUP BY semantics
    (NULL lang is its own label); purity facts (max-language count,
    size, pure flag) are exact integers grouped by size, and the two
    rate columns are mirrored float divisions.

    Scale shape: the cluster table is duplicate-bounded; its doc-id
    set broadcasts into an np.isin scan filter (the corpus_dedup_keep
    pattern), so only cluster members' (doc_id, lang) rows — never the
    corpus — reach the driver join.
    """
    import ray
    import ray.data

    from ..sources.readers import read_table
    from ..state.bcast import cached_get
    from .text import round_half_away

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    cl = near_dup_clusters(docs, tau=tau).to_pandas()
    empty = pa.table({
        "cluster_size": pa.array([], type=pa.int64()),
        "n_clusters": pa.array([], type=pa.int64()),
        "n_pure": pa.array([], type=pa.int64()),
        "sum_max_lang": pa.array([], type=pa.int64()),
        "avg_purity": pa.array([], type=pa.float64()),
        "pure_rate": pa.array([], type=pa.float64()),
    })
    if not len(cl):
        return ray.data.from_arrow(empty)
    member_ids = np.sort(cl["doc_id"].to_numpy().astype(np.int64))
    ref = ray.put(member_ids)

    def members_only(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        mm = cached_get(ref)
        keep = np.isin(ids, mm)
        out = batch.filter(pa.array(keep))
        lang = pc.fill_null(out["lang"], "\x00null\x00")
        return pa.table({"doc_id": out["doc_id"], "lang": lang})

    mem = (read_table(sf_dir, "documents", columns=["doc_id", "lang"])
           .map_batches(members_only, batch_format="pyarrow",
                        batch_size=None)).to_pandas()
    j = cl.merge(mem, on="doc_id", how="inner")
    lc = j.groupby(["cluster_id", "lang"], sort=False) \
        .size().reset_index(name="c")
    cs = lc.groupby("cluster_id", sort=False).agg(
        size=("c", "sum"), mx=("c", "max")).reset_index()
    out = {"cluster_size": [], "n_clusters": [], "n_pure": [],
           "sum_max_lang": [], "avg_purity": [], "pure_rate": []}
    for sz, grp in cs.groupby("size", sort=True):
        nc = len(grp)
        npure = int((grp["mx"] == sz).sum())
        smx = int(grp["mx"].sum())
        out["cluster_size"].append(int(sz))
        out["n_clusters"].append(nc)
        out["n_pure"].append(npure)
        out["sum_max_lang"].append(smx)
        out["avg_purity"].append(float(round_half_away(np.float64(
            float(smx) / (float(int(sz)) * float(nc))))))
        out["pure_rate"].append(float(round_half_away(np.float64(
            float(npure) / float(nc)))))
    return ray.data.from_arrow(pa.table({
        "cluster_size": pa.array(out["cluster_size"], type=pa.int64()),
        "n_clusters": pa.array(out["n_clusters"], type=pa.int64()),
        "n_pure": pa.array(out["n_pure"], type=pa.int64()),
        "sum_max_lang": pa.array(out["sum_max_lang"], type=pa.int64()),
        "avg_purity": pa.array(out["avg_purity"], type=pa.float64()),
        "pure_rate": pa.array(out["pure_rate"], type=pa.float64()),
    }))


DUP_CURVE_TAUS = (0.5, 0.6, 0.7, 0.8, 0.9)


def dup_threshold_curve(sf_dir: str, taus=DUP_CURVE_TAUS):
    """Dedup threshold calibration curve: for each Jaccard threshold
    in ``taus``, the connected-component census of the near-dup pair
    graph — (tau, n_pairs, n_clusters, n_members, largest_cluster).
    THE operator you run before choosing a dedup tau: the knee where
    n_members stops falling (and largest_cluster stops exploding) is
    where near-duplication ends and template pollution begins.

    Exactness: the pair list is computed ONCE at min(taus) (the
    oracle-gated inverted-index join) and re-thresholded per tau — the
    float comparison jaccard >= tau sees identical doubles on both
    engines (the near_dup_pairs contract); component facts per tau are
    exact integers (driver union-find over the duplicate-bounded pair
    list, the near_dup_clusters fast path; the distributed
    label-propagation variant applies verbatim when pairs outgrow the
    driver).

    Scale shape: one inverted-index pair join + a pair-bounded driver
    sweep; the curve itself is len(taus) rows.
    """
    import ray.data

    from ..sources.readers import read_table
    from .text import round_half_away  # noqa: F401  (module convention)

    taus = sorted(float(t) for t in taus)
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = near_dup_pairs_exact(ds, tau=taus[0]).to_pandas()
    out = {"tau": [], "n_pairs": [], "n_clusters": [], "n_members": [],
           "largest_cluster": []}
    for t in taus:
        sel = pairs[pairs["jaccard"] >= t]
        parent = {}

        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for i_, j_ in zip(sel["i"].astype(int), sel["j"].astype(int)):
            parent.setdefault(i_, i_)
            parent.setdefault(j_, j_)
            ri, rj = find(i_), find(j_)
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)
        sizes = {}
        for x in list(parent):
            sizes[find(x)] = sizes.get(find(x), 0) + 1
        out["tau"].append(t)
        out["n_pairs"].append(int(len(sel)))
        out["n_clusters"].append(len(sizes))
        out["n_members"].append(int(sum(sizes.values())))
        out["largest_cluster"].append(int(max(sizes.values()))
                                      if sizes else 0)
    return ray.data.from_arrow(pa.table({
        "tau": pa.array(out["tau"], type=pa.float64()),
        "n_pairs": pa.array(out["n_pairs"], type=pa.int64()),
        "n_clusters": pa.array(out["n_clusters"], type=pa.int64()),
        "n_members": pa.array(out["n_members"], type=pa.int64()),
        "largest_cluster": pa.array(out["largest_cluster"],
                                    type=pa.int64()),
    }))
