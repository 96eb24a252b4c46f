"""Text-analysis operators: token stats, quality scoring, language ID,
document fingerprinting.

All stages are fully vectorized (Arrow compute kernels + dictionary-encoded
token codes + numpy bincount) — no per-row Python loops — and their
semantics are chosen to be SQL-mirrorable so every operator has a DuckDB
oracle (see __ray_entry__.oracle_sql and s2ray/functions/sqlgen.py):

- tokens   = whitespace-split non-empty (== regexp_split_to_array '\\s+')
- alpha    = ASCII [A-Za-z] + ASCII whitespace, counted in characters
- langid   = marker-token ratio argmax, ties -> lexicographically largest
- fingerprint = order-sensitive dual 31-bit polynomial rolling hash over
  the codepoints of the whitespace-normalized text, packed to 62 bits
"""

from __future__ import annotations

import numpy as np

from ..sources.readers import read_table
import pyarrow as pa
import pyarrow.compute as pc

# rolling-hash parameters (fingerprint): two 31-bit Mersenne-mod polynomial
# hashes with distinct multipliers, packed as fp1 << 31 | fp2.  31-bit lanes
# keep every intermediate in int64 in BOTH numpy and DuckDB BIGINT.
FP_MOD = 2147483647        # 2^31 - 1
FP_MUL1 = 1000003
FP_MUL2 = 8191


def _string_array(col) -> pa.StringArray:
    """Text-operator ingestion contract: one contiguous StringArray with
    NULL text normalized to '' — every text operator treats a missing
    document body as an empty one (mirrored by coalesce(text, '') in the
    SQL oracles).  Without this, Arrow kernels propagate nulls into
    numpy NaN->int casts and produce garbage stats (caught by the
    null-injection stress sweep).  exact_dedup deliberately does NOT use
    this helper: its oracle's GROUP BY keeps null as a distinct group."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = pc.fill_null(col, "")
    return col


def _token_codes(texts: pa.StringArray, lower: bool = False):
    """Tokenize (whitespace-split, non-empty) a string column, vectorized.

    Returns (row_idx, codes, uniques, n_tokens): per-token row index and
    dictionary code, the unique-token strings, and per-row token counts.
    """
    if getattr(texts, "null_count", 0):
        texts = pc.fill_null(texts, "")   # null text == empty (see _string_array)
    if lower:
        texts = pc.utf8_lower(texts)
    # RE2 \s+ (ASCII whitespace), NOT utf8_split_whitespace: the Arrow
    # kernel splits on UNICODE whitespace (NBSP, U+2028, thin space...)
    # while every SQL oracle tokenizes with regexp_split_to_array '\s+'
    # — RE2 ASCII \s — so the kernels must match it by construction
    # (caught by the unicode-whitespace stress sweep)
    split = pc.split_pattern_regex(texts, r"\s+")
    flat = split.flatten()
    n = len(texts)
    offs = np.asarray(split.offsets, dtype=np.int64)
    row_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
    mask = np.asarray(pc.not_equal(flat, "").combine_chunks(), dtype=bool) \
        if isinstance(flat, pa.ChunkedArray) else \
        pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    row_idx = row_idx[mask]
    flat = flat.filter(pa.array(mask))
    dict_arr = flat.dictionary_encode()
    codes = np.asarray(dict_arr.indices, dtype=np.int64)
    uniques = np.asarray(dict_arr.dictionary, dtype=object)
    n_tokens = np.bincount(row_idx, minlength=n).astype(np.int64)
    return row_idx, codes, uniques, n_tokens, flat


def round_half_away(x: np.ndarray, ndigits: int = 6) -> np.ndarray:
    """Decimal rounding with ties away from zero — DuckDB's ``round(x, n)``
    for DOUBLE (C ``std::round`` on the scaled value).  numpy's ``np.round``
    and Arrow's ``pc.round`` default to half-to-even, which diverges from
    the SQL oracles on exact dyadic ties (e.g. 10/256 = 0.0390625 rounds
    to 0.039062 half-even but 0.039063 in DuckDB).  Ratios of small integer
    counts hit such ties routinely, so every oracled ratio column must use
    this helper."""
    x = np.asarray(x, dtype=np.float64)
    s = 10.0 ** ndigits
    scaled = np.abs(x) * s
    r = np.floor(scaled + 0.5)
    # undo the float-addition carry when scaled+0.5 rounded up past the tie
    r = np.where(r - scaled > 0.5, r - 1.0, r)
    return np.copysign(r, x) / s


def _distinct_per_row(row_idx, codes, n_uniq, n_rows):
    """Distinct-code count per row via one np.unique over packed keys."""
    if len(row_idx) == 0:
        return np.zeros(n_rows, dtype=np.int64)
    key = row_idx * np.int64(max(1, n_uniq)) + codes
    uk = np.unique(key)
    return np.bincount(uk // np.int64(max(1, n_uniq)),
                       minlength=n_rows).astype(np.int64)


def text_stats(batch: pa.Table, id_col: str = "doc_id",
               text_col: str = "text") -> pa.Table:
    """(id, n_chars, n_tokens, n_distinct_tokens, avg_token_len)."""
    texts = _string_array(batch[text_col])
    n = len(texts)
    n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
    row_idx, codes, uniques, n_tokens, flat = _token_codes(texts)
    tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    tok_chars = np.bincount(row_idx, weights=tok_len, minlength=n).astype(np.int64)
    n_distinct = _distinct_per_row(row_idx, codes, len(uniques), n)
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

# ASCII alpha + ASCII whitespace, one RE2 char class (count == #matching
# chars because every match is a single character)
_ALPHA_CLASS = "[A-Za-z \\t\\n\\r\\x0b\\x0c]"


def quality_score(batch: pa.Table, id_col: str = "doc_id",
                  text_col: str = "text") -> pa.Table:
    """Heuristic quality signals: stopword ratio, alpha ratio, mean word
    length, repetition ratio + a combined [0,1] score (Gopher-flavoured)."""
    texts = _string_array(batch[text_col])
    n = len(texts)
    n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
    alpha_n = pc.count_substring_regex(texts, _ALPHA_CLASS) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    row_idx, codes, uniques, n_tokens, flat = _token_codes(texts)
    has = n_tokens > 0
    nt = np.maximum(1, n_tokens).astype(np.float64)

    stop_uniq = np.isin(uniques, list(_STOPWORDS))
    stop_n = np.bincount(row_idx, weights=stop_uniq[codes],
                         minlength=n).astype(np.int64)
    stop_ratio = np.where(has, stop_n / nt, 0.0)

    alpha_ratio = np.where(has, alpha_n / np.maximum(1, n_chars), 0.0)

    n_distinct = _distinct_per_row(row_idx, codes, len(uniques), n)
    rep_ratio = np.where(has, 1.0 - n_distinct / nt, 0.0)

    tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    tok_chars = np.bincount(row_idx, weights=tok_len, minlength=n)
    mean_len = np.where(has, tok_chars / nt, 0.0)

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
    """Actor-pool stage: marker-word language ID (en/de/fr/es + CJK).

    Marker tables are built once per actor (__init__); __call__ is a fully
    vectorized per-batch pass (dictionary-encoded token membership).
    """

    MARKERS = {
        "en": "the and is of to in that it with for this are was",
        "de": "der die das und ist von zu mit den nicht ein eine",
        "fr": "le la les et est de des un une pour que dans",
        "es": "el la los las y es de un una que para con",
    }
    CJK_HEAD = 200          # chars examined for the CJK check
    CJK_FRACTION = 0.2
    MIN_SCORE = 0.02

    def __init__(self):
        # langs in ASCENDING name order; argmax over the REVERSED column
        # order implements the "largest lang wins ties" rule
        self.langs = sorted(self.MARKERS)
        self.tables = [np.array(sorted(self.MARKERS[lang].split()),
                                dtype=object) for lang in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = _string_array(batch["text"])
        n = len(texts)
        head = pc.utf8_slice_codeunits(texts, 0, self.CJK_HEAD)
        head_len = pc.utf8_length(head).to_numpy(zero_copy_only=False)
        cjk_n = pc.count_substring_regex(head, "[一-鿿]") \
            .to_numpy(zero_copy_only=False)
        is_cjk = cjk_n > head_len * self.CJK_FRACTION

        row_idx, codes, uniques, n_tokens, _flat = _token_codes(
            texts, lower=True)
        nt = np.maximum(1, n_tokens).astype(np.float64)
        scores = np.empty((n, len(self.langs)), dtype=np.float64)
        for c, table in enumerate(self.tables):
            hit_uniq = np.isin(uniques, table)
            cnt = np.bincount(row_idx, weights=hit_uniq[codes], minlength=n)
            scores[:, c] = cnt / nt
        rev = scores[:, ::-1]
        best_rev = np.argmax(rev, axis=1)              # first max -> largest lang
        best = len(self.langs) - 1 - best_rev
        conf = rev[np.arange(n), best_rev]
        lang_arr = np.array(self.langs, dtype=object)[best]
        preds = np.where(conf > self.MIN_SCORE, lang_arr, "und")
        preds = np.where(n_tokens == 0, "und", preds)
        conf = np.where(n_tokens == 0, 0.0, conf)
        preds = np.where(is_cjk, "zh", preds)
        conf = np.where(is_cjk, 1.0, conf)
        out = batch.append_column(
            "lang_pred", pa.array(preds.tolist(), type=pa.string()))
        return out.append_column("lang_conf", pa.array(conf, type=pa.float64()))


_LANGID: LangId | None = None


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Task-pool form of LangId with a worker-process-level singleton:
    fuses with upstream map operators (an actor pool pays ~2 s spin-up per
    query and breaks operator fusion — same measurement as the broadcast
    joins).  The LangId class stays for callers that want an explicit
    actor pool."""
    global _LANGID
    if _LANGID is None:
        _LANGID = LangId()
    return _LANGID(batch)


def _codepoint_matrix(arr: pa.StringArray) -> np.ndarray:
    """(rows, L) int64 codepoint matrix, rows right-aligned (left-padded
    with zeros).  ASCII fast path reads the UTF-8 buffer directly (fully
    vectorized scatter); non-ASCII rows fall back to a per-row decode."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if len(arr) == 0:
        return np.zeros((0, 0), dtype=np.int64)
    off0 = arr.offset
    # large_string carries int64 offsets; reading them as int32 would
    # silently produce an empty matrix (all hashes collide to 0)
    off_width = (np.int64 if pa.types.is_large_string(arr.type)
                 else np.int32)
    offs = np.asarray(arr.buffers()[1], dtype=np.uint8).view(off_width)
    offs = offs[off0:off0 + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    flat = data[offs[0]:offs[-1]]
    offs = offs - offs[0]
    lens_b = np.diff(offs)
    if flat.size and flat.max() >= 128:
        # non-ASCII present: per-row decode (bytes != codepoints)
        strs = np.asarray(arr, dtype=object)
        lens = np.array([len(t) for t in strs], dtype=np.int64)
        L = int(lens.max())
        cp = np.zeros((len(strs), L), dtype=np.int64)
        for r, t in enumerate(strs):
            if t:
                cp[r, L - len(t):] = np.frombuffer(
                    t.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
        return cp
    L = int(lens_b.max()) if len(lens_b) else 0
    cp = np.zeros((len(arr), L), dtype=np.int64)
    if L:
        total = int(lens_b.sum())
        rows = np.repeat(np.arange(len(arr), dtype=np.int64), lens_b)
        in_row = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], lens_b)
        cols = np.repeat(L - lens_b, lens_b) + in_row
        cp[rows, cols] = flat
    return cp


def _poly_hash_cols(cp: np.ndarray, mul: int) -> np.ndarray:
    """Column-wise Horner over a left-zero-padded (rows, L) codepoint
    matrix: h = (h * mul + cp) % FP_MOD, vectorized across rows."""
    h = np.zeros(cp.shape[0], dtype=np.int64)
    m = np.int64(mul)
    mod = np.int64(FP_MOD)
    for k in range(cp.shape[1]):
        h = (h * m + cp[:, k]) % mod
    return h


def fingerprint(batch: pa.Table, id_col: str = "doc_id",
                text_col: str = "text", chunk_rows: int = 2048) -> pa.Table:
    """62-bit order-sensitive document fingerprint: two 31-bit polynomial
    rolling hashes (mod 2^31-1, multipliers 1000003 / 8191) over the
    codepoints of the whitespace-normalized text, packed fp1 << 31 | fp2.

    SQL-oracle-expressible (list_reduce over unicode(codepoints)); the
    Horner recurrence is evaluated column-wise over row chunks so the work
    is numpy-vectorized across documents.
    """
    texts = _string_array(batch[text_col])
    # whitespace-normalize: split, drop empties, re-join with single spaces
    # (all Arrow kernels)
    # RE2 \s+ (ASCII whitespace), NOT utf8_split_whitespace: the Arrow
    # kernel splits on UNICODE whitespace (NBSP, U+2028, thin space...)
    # while every SQL oracle tokenizes with regexp_split_to_array '\s+'
    # — RE2 ASCII \s — so the kernels must match it by construction
    # (caught by the unicode-whitespace stress sweep)
    split = pc.split_pattern_regex(texts, r"\s+")
    flat = split.flatten()
    mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    offs = np.asarray(split.offsets, dtype=np.int64)
    n = len(texts)
    row_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))[mask]
    kept = flat.filter(pa.array(mask))
    counts = np.bincount(row_idx, minlength=n)
    new_offs = np.concatenate([[0], counts.cumsum()]).astype(np.int32)
    norm_arr = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(new_offs, type=pa.int32()), kept),
        " ")
    fps = np.zeros(n, dtype=np.int64)
    for s in range(0, n, chunk_rows):
        sub = norm_arr.slice(s, chunk_rows)
        cp = _codepoint_matrix(sub)
        if cp.shape[1] == 0:
            continue
        h1 = _poly_hash_cols(cp, FP_MUL1)
        h2 = _poly_hash_cols(cp, FP_MUL2)
        fps[s:s + chunk_rows] = (h1 << np.int64(31)) | h2
    return pa.table({
        id_col: batch[id_col],
        "fingerprint": pa.array(fps, type=pa.int64()),
    })


def fingerprint_sql(text_expr: str = "text") -> str:
    """DuckDB expression mirroring :func:`fingerprint` bit-exactly."""
    # array_to_string of an empty list is NULL in DuckDB -> coalesce to ''
    norm = (f"coalesce(array_to_string(list_filter(regexp_split_to_array("
            f"{text_expr}, '\\s+'), x -> x <> ''), ' '), '')")
    cps = (f"list_transform(regexp_split_to_array({norm}, ''), "
           f"c -> CAST(unicode(c) AS BIGINT))")
    fold1 = f"list_reduce({cps}, (a, b) -> (a * {FP_MUL1} + b) % {FP_MOD})"
    fold2 = f"list_reduce({cps}, (a, b) -> (a * {FP_MUL2} + b) % {FP_MOD})"
    return (f"CASE WHEN length({norm}) = 0 THEN 0 "
            f"ELSE {fold1} * 2147483648 + {fold2} END")


# BPE-style pre-tokenizer (GPT-2's split regex minus its \s+(?!\S) lookahead
# branch, which RE2 cannot express; the trailing \s+ branch subsumes it for
# counting purposes).  Both Arrow and DuckDB run RE2, so the engine count
# and the SQL oracle count agree by construction.
BPE_SPLIT_RE = (r"'(?:[sdmt]|ll|ve|re)"
                r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+")


def token_counts(batch: pa.Table, id_col: str = "doc_id",
                 text_col: str = "text") -> pa.Table:
    """(id, n_chars, n_ws_tokens, n_bpe_tokens): whitespace tokens and
    BPE-pre-tokenizer segments, both via Arrow RE2 kernels (training-data
    budgeting: token counts drive sampling weights and cost estimates)."""
    texts = _string_array(batch[text_col])
    n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
    ws = pc.count_substring_regex(texts, r"\S+") \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    bpe = pc.count_substring_regex(texts, BPE_SPLIT_RE) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table({
        id_col: batch[id_col],
        "n_chars": pa.array(n_chars),
        "n_ws_tokens": pa.array(ws),
        "n_bpe_tokens": pa.array(bpe),
    })


def token_counts_sql(text_expr: str = "text") -> str:
    """DuckDB mirror of token_counts (same RE2 patterns)."""
    pat = BPE_SPLIT_RE.replace("'", "''")
    return (f"length({text_expr}) AS n_chars, "
            f"len(regexp_extract_all({text_expr}, '\\S+')) AS n_ws_tokens, "
            f"len(regexp_extract_all({text_expr}, '{pat}')) AS n_bpe_tokens")


def vocab_top_k(sf_dir: str, k: int = 100, lower: bool = True,
                text_col: str = "text"):
    """Corpus vocabulary: top-k (token, n) by frequency, deterministic
    tie-break (count DESC, token ASC) — the vocabulary-building step of a
    tokenizer training pipeline.

    Per-batch token counting is one dictionary-encode + bincount (no Python
    loop); the shuffle moves (token, partial_count) rows — vocabulary-sized,
    not corpus-sized; the global top-k is a sort+limit over the merged
    counts.  At 100 TB add a pre-filter dropping per-batch hapax tokens
    below a noise floor before the shuffle if the vocabulary itself becomes
    large."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=[text_col])

    def partial(batch: pa.Table) -> pa.Table:
        texts = _string_array(batch[text_col])
        _, codes, uniques, _, _ = _token_codes(texts, lower=lower)
        cnt = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
        return pa.table({
            "token": pa.array(uniques.tolist(), type=pa.string()),
            "partial_n": pa.array(cnt),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
           .groupby("token")
           .aggregate(Sum("partial_n", alias_name="n")))
    return agg.sort(["n", "token"], descending=[True, False]).limit(k)


_BG_SEP = "\x1f"  # bigram pack separator: a control char, NOT RE2 \s, so
# both engines pack identically even if a token contained it


def _pmi_score_joined(bg_ds, lm_ds, rm_ds, n_total: int, min_count: int):
    """Web-vocabulary PMI scoring path: marginals attach to the bigram
    table via two co-partition hash joins keyed by blake2b-64 token
    digests (no driver dict, no broadcast copy).  Bit-identical rows to
    the broadcast path: same exact int64 counts, same single np.log
    over the identical double ratio (equivalence pytest:
    tests/test_pipelines_robustness.py::test_pmi_joined_path)."""
    from .dedup import key64_strings
    from .join import copartition_hash_join

    def split_keyed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.greater_equal(batch["n_ab"], min_count))
        parts = pc.split_pattern(batch["bg"], _BG_SEP)
        w1 = pc.list_element(parts, 0) if len(batch) \
            else pa.array([], type=pa.string())
        w2 = pc.list_element(parts, 1) if len(batch) \
            else pa.array([], type=pa.string())
        return pa.table({
            "k": pa.array(key64_strings(
                np.asarray(w1.to_pylist(), dtype=object))),
            "w1": w1, "w2": w2, "n_ab": batch["n_ab"]})

    lmk = lm_ds.map_batches(
        lambda b: pa.table({
            "k": pa.array(key64_strings(np.asarray(
                b["token"].to_pylist(), dtype=object))),
            "n_left": b["n"]}),
        batch_format="pyarrow", batch_size=None)
    rmk = rm_ds.map_batches(
        lambda b: pa.table({
            "k": pa.array(key64_strings(np.asarray(
                b["token"].to_pylist(), dtype=object))),
            "n_right": b["n"]}),
        batch_format="pyarrow", batch_size=None)
    j1 = copartition_hash_join(
        bg_ds.map_batches(split_keyed, batch_format="pyarrow",
                          batch_size=None), lmk, on="k")
    j2 = copartition_hash_join(
        j1.map_batches(lambda b: pa.table({
            "k": pa.array(key64_strings(np.asarray(
                b["w2"].to_pylist(), dtype=object))),
            "w1": b["w1"], "w2": b["w2"], "n_ab": b["n_ab"],
            "n_left": b["n_left"]}),
            batch_format="pyarrow", batch_size=None),
        rmk, on="k")

    def score(batch: pa.Table) -> pa.Table:
        n_ab = batch["n_ab"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nl = batch["n_left"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nr = batch["n_right"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(n_ab):
            if (int(n_ab.max()) * n_total >= 1 << 63
                    or int(nl.max()) * int(nr.max()) >= 1 << 63):
                raise ValueError("pmi_collocations: count products "
                                 "overflow int64")
            pmi = round_half_away(np.log((n_ab * np.int64(n_total))
                                         / (nl * nr)))
        else:
            pmi = np.empty(0, dtype=np.float64)
        return pa.table({
            "w1": batch["w1"], "w2": batch["w2"],
            "n_ab": pa.array(n_ab), "n_left": pa.array(nl),
            "n_right": pa.array(nr),
            "pmi": pa.array(pmi, type=pa.float64()),
        })

    return j2.map_batches(score, batch_format="pyarrow",
                          batch_size=None)


def pmi_collocations(sf_dir: str, min_count: int = 5, lower: bool = False,
                     text_col: str = "text",
                     marginal_broadcast_max: int = 2_000_000):
    """Bigram collocation mining by pointwise mutual information:
    (w1, w2, n_ab, n_left, n_right, pmi) for every within-document
    bigram with n_ab >= min_count, where
    pmi = ln((n_ab * N) / (n_left * n_right)) over positional marginals
    (n_left = occurrences of w1 as a bigram's left token, N = total
    bigram occurrences).  The ratio's numerator and denominator are
    EXACT int64 products (guarded < 2^63), so both engines take ln of
    the identical double — the doc_perplexity ln-mirror precedent.

    Shape: per-batch packed-bigram counting (one np.unique over
    code pairs, no Python loop over tokens) -> a bigram-vocabulary-sized
    count shuffle -> two TOKEN-vocabulary marginal aggregations -> one
    streaming score pass over the bigram table.  No stage ever moves
    corpus rows, and the bigram table never leaves the cluster.  The
    marginals dispatch on vocabulary size (round-4 review): at or below
    ``marginal_broadcast_max`` distinct tokens they collect once and
    broadcast via ray.put (the rare_tokens budget — fast, and the
    oracle-gate path); above it they stay Datasets and attach to the
    bigram table through two ``copartition_hash_join`` passes keyed by
    blake2b-64 token digests, so a Heaps-law 1e8-token web vocabulary
    never forms a driver dict or a per-worker broadcast copy.
    """
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..state.bcast import cached_get

    ds = read_table(sf_dir, "documents", columns=[text_col])

    def partial(batch: pa.Table) -> pa.Table:
        texts = _string_array(batch[text_col])
        row_idx, codes, uniques, _, _ = _token_codes(texts, lower=lower)
        if len(codes) < 2:
            return pa.table({"bg": pa.array([], type=pa.string()),
                             "pn": pa.array([], type=pa.int64())})
        same = row_idx[1:] == row_idx[:-1]
        left, right = codes[:-1][same], codes[1:][same]
        if len(left) == 0:
            return pa.table({"bg": pa.array([], type=pa.string()),
                             "pn": pa.array([], type=pa.int64())})
        packed = left * np.int64(len(uniques)) + right
        u, cnt = np.unique(packed, return_counts=True)
        ul = u // np.int64(len(uniques))
        ur = u % np.int64(len(uniques))
        bgs = [uniques[a] + _BG_SEP + uniques[b] for a, b in zip(ul, ur)]
        return pa.table({"bg": pa.array(bgs, type=pa.string()),
                         "pn": pa.array(cnt.astype(np.int64))})

    bg_ds = (ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=None)
             .groupby("bg")
             .aggregate(Sum("pn", alias_name="n_ab"))).materialize()

    def side_partial(col_idx: int):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            w = pc.list_element(pc.split_pattern(batch["bg"], _BG_SEP),
                                col_idx)
            return pa.table({"token": w, "pm": batch["n_ab"]})
        return fn

    marg_ds = []
    for ci in (0, 1):
        marg_ds.append(
            (bg_ds.map_batches(side_partial(ci), batch_format="pyarrow",
                               batch_size=None)
             .groupby("token")
             .aggregate(Sum("pm", alias_name="n"))).materialize())
    vocab_n = marg_ds[0].count()
    # n_total = sum of left-marginals: exact int64 per-block partials,
    # driver folds block-count rows
    tot_rows = marg_ds[0].map_batches(
        lambda b: pa.table({"s": pa.array([np.int64(np.sum(
            b["n"].to_numpy(zero_copy_only=False)))])}),
        batch_format="pyarrow", batch_size=None).to_pandas()
    n_total = int(tot_rows["s"].sum()) if len(tot_rows) else 0

    if vocab_n > marginal_broadcast_max:
        return _pmi_score_joined(bg_ds, marg_ds[0], marg_ds[1],
                                 n_total, min_count)

    marg = []
    for m_ds in marg_ds:
        m = m_ds.to_pandas()
        marg.append(dict(zip(m["token"], m["n"].astype(np.int64)))
                    if len(m) else {})
    lm_ref = ray.put(marg[0])
    rm_ref = ray.put(marg[1])

    def score(batch: pa.Table, lm_ref=lm_ref, rm_ref=rm_ref) -> pa.Table:
        import pyarrow.compute as pc

        lm, rm = cached_get(lm_ref), cached_get(rm_ref)
        keep = pc.greater_equal(batch["n_ab"], min_count)
        batch = batch.filter(keep)
        parts = pc.split_pattern(batch["bg"], _BG_SEP)
        w1 = pc.list_element(parts, 0).to_pylist() if len(batch) else []
        w2 = pc.list_element(parts, 1).to_pylist() if len(batch) else []
        n_ab = batch["n_ab"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nl = np.array([lm[w] for w in w1], dtype=np.int64)
        nr = np.array([rm[w] for w in w2], dtype=np.int64)
        if len(n_ab):
            if (int(n_ab.max()) * n_total >= 1 << 63
                    or int(nl.max()) * int(nr.max()) >= 1 << 63):
                raise ValueError("pmi_collocations: count products "
                                 "overflow int64")
            pmi = round_half_away(np.log((n_ab * np.int64(n_total))
                                         / (nl * nr)))
        else:
            pmi = np.empty(0, dtype=np.float64)
        return pa.table({
            "w1": pa.array(w1, type=pa.string()),
            "w2": pa.array(w2, type=pa.string()),
            "n_ab": pa.array(n_ab),
            "n_left": pa.array(nl),
            "n_right": pa.array(nr),
            "pmi": pa.array(pmi, type=pa.float64()),
        })

    return bg_ds.map_batches(score, batch_format="pyarrow",
                             batch_size=None)


def standardize_by_group(sf_dir: str, group_col: str = "lang",
                         value_col: str = "n_chars",
                         id_col: str = "doc_id"):
    """Per-group z-score standardization (feature normalization for ML
    prep): z = (x - mean) / population-std per group, over an INTEGER
    value column so the moments are exact int64 sums — the float math
    that follows is the identical expression on both engines, making
    even z's last bit deterministic.  Zero-variance groups emit z = 0;
    NULL values pass through as NULL (SQL semantics); NULL group values
    form their own group.

    Two passes: per-batch (sum, sumsq, count) partials -> group-
    cardinality groupby -> broadcast moment dict -> one streaming score
    pass.  Guarded: n * sumsq and sum^2 must stay inside int64.
    """
    import ray
    from ray.data.aggregate import Sum

    from ..state.bcast import cached_get

    ds = read_table(sf_dir, "documents",
                    columns=[id_col, group_col, value_col])

    def moments(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({
            "g": batch[group_col].to_pandas(),
            "v": batch[value_col].to_pandas(),
        })
        df = df[df["v"].notna()]
        v = df["v"].to_numpy().astype(np.int64)
        agg = df.assign(v=v, v2=v * v).groupby("g", sort=False,
                                               dropna=False) \
            .agg(ps=("v", "sum"), pq=("v2", "sum"), pn=("v", "size")) \
            .reset_index()
        key = agg["g"].where(agg["g"].notna(), "\x00").astype(str)
        return pa.table({
            "gk": pa.array(key.tolist(), type=pa.string()),
            "ps": pa.array(agg["ps"].to_numpy().astype(np.int64)),
            "pq": pa.array(agg["pq"].to_numpy().astype(np.int64)),
            "pn": pa.array(agg["pn"].to_numpy().astype(np.int64)),
        })

    m = (ds.map_batches(moments, batch_format="pyarrow", batch_size=None)
         .groupby("gk")
         .aggregate(Sum("ps", alias_name="s"),
                    Sum("pq", alias_name="q"),
                    Sum("pn", alias_name="n"))).to_pandas()
    table = {}
    for r in m.itertuples():
        s, qq, n = int(r.s), int(r.q), int(r.n)
        if abs(n) and (abs(n * qq) >= 1 << 62 or abs(s) >= 1 << 31):
            raise ValueError("standardize_by_group: moment products "
                             "would overflow int64")
        table[r.gk] = (s, qq, n)
    m_ref = ray.put(table)

    def score(batch: pa.Table, m_ref=m_ref) -> pa.Table:
        mm = cached_get(m_ref)
        g = batch[group_col].to_pandas()
        keys = g.where(g.notna(), "\x00").astype(str)
        # nulls surface as NaN through pandas (value_col is integral, so
        # NaN can only mean NULL)
        v = np.asarray(batch[value_col].to_pandas(), dtype=np.float64)
        valid = ~np.isnan(v)
        v = np.where(valid, v, 0.0)
        # a group whose values are ALL NULL never enters the moment
        # table (moments() drops NULL values); its rows are invalid and
        # must come out z=NULL like the oracle's outer join — the (0,
        # 0, 1) stand-in keeps the arithmetic finite and is never
        # emitted because valid is False for every such row
        s = np.array([mm.get(k, (0, 0, 1))[0] for k in keys],
                     dtype=np.int64)
        qq = np.array([mm.get(k, (0, 0, 1))[1] for k in keys],
                      dtype=np.int64)
        n = np.array([mm.get(k, (0, 0, 1))[2] for k in keys],
                     dtype=np.int64)
        mean = s / n
        var = qq / n - mean * mean
        zero = (n * qq) == (s * s)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(zero, 0.0, (v - mean) / np.sqrt(var))
        z = round_half_away(z)
        return pa.table({
            id_col: batch[id_col],
            group_col: batch[group_col],
            value_col: batch[value_col],
            "z": pa.array([float(x) if ok else None
                           for x, ok in zip(z, valid)],
                          type=pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


def _df_partial(batch: pa.Table, text_col: str = "text",
                lower: bool = True) -> pa.Table:
    """Per-batch document-frequency partial: distinct (doc, token) pairs
    via one packed np.unique, then a bincount per unique token.  Exact
    under the row-=-document invariant (each document lives in exactly
    one batch), so the partials compose into global df with a plain Sum.
    Shared by token_doc_freq and tfidf_top_terms — one source of truth
    for the distinct-pair trick and the tokenizer semantics."""
    texts = _string_array(batch[text_col])
    row_idx, codes, uniques, _, _ = _token_codes(texts, lower=lower)
    if len(codes):
        pair = np.unique(row_idx * np.int64(len(uniques)) + codes)
        dfc = np.bincount(pair % np.int64(len(uniques)),
                          minlength=len(uniques)).astype(np.int64)
    else:
        dfc = np.zeros(len(uniques), dtype=np.int64)
    return pa.table({
        "token": pa.array(uniques.tolist(), type=pa.string()),
        "partial_df": pa.array(dfc),
    })


def token_doc_freq(sf_dir: str, k: int = 100, lower: bool = True,
                   text_col: str = "text"):
    """Document frequency: top-k (token, df) where df = #documents
    containing the token — the IDF denominator of TF-IDF weighting.

    Exactness relies on each document living in exactly one batch (row =
    document), so the per-batch distinct (token, doc) dedup composes into
    the global distinct count with a plain Sum."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    import functools

    ds = read_table(sf_dir, "documents", columns=[text_col])

    partial = functools.partial(_df_partial, text_col=text_col, lower=lower)
    agg = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
           .groupby("token")
           .aggregate(Sum("partial_df", alias_name="df")))
    return agg.sort(["df", "token"], descending=[True, False]).limit(k)


def _tfidf_joined(ds, df_ds, n_docs: int, top_n: int, lower: bool,
                  text_col: str, id_col: str, n_parts: int = 64):
    """Web-vocabulary TF-IDF path: per-(doc, token) tf rows join the DF
    Dataset through one token-digest co-partition, then re-bucket by
    doc id for the per-document top-N — no vocab-sized driver Series
    or broadcast.  Bit-identical to the broadcast path: idf is
    ``math.log(n_docs / int(df))`` per DISTINCT df value (identical
    constants), same tf * idf double, same (tfidf DESC, token) rank."""
    import math

    import pandas as pd

    from .dedup import key64_strings
    from .join import _part_of, copartition_hash_join

    def tf_rows(batch: pa.Table) -> pa.Table:
        texts = _string_array(batch[text_col])
        ids = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        row_idx, codes, uniques, _, _ = _token_codes(texts, lower=lower)
        if len(codes) == 0:
            return pa.table({
                "k": pa.array([], type=pa.int64()),
                "doc": pa.array([], type=pa.int64()),
                "token": pa.array([], type=pa.string()),
                "tf": pa.array([], type=pa.int64())})
        nu = np.int64(len(uniques))
        pk, tf = np.unique(row_idx * nu + codes, return_counts=True)
        r = (pk // nu).astype(np.int64)
        c = (pk % nu).astype(np.int64)
        toks = uniques[c]
        return pa.table({
            "k": pa.array(key64_strings(toks.astype(object))),
            "doc": pa.array(ids[r]),
            "token": pa.array(toks.tolist(), type=pa.string()),
            "tf": pa.array(tf.astype(np.int64))})

    dfk = df_ds.map_batches(
        lambda b: pa.table({
            "k": pa.array(key64_strings(np.asarray(
                b["token"].to_pylist(), dtype=object))),
            "df": b["df"]}),
        batch_format="pyarrow", batch_size=None)
    j = copartition_hash_join(
        ds.map_batches(tf_rows, batch_format="pyarrow",
                       batch_size=None),
        dfk, on="k", n_parts=n_parts)

    tagged = j.map_batches(
        lambda b: b.append_column("part", pa.array(_part_of(
            b["doc"].to_numpy(zero_copy_only=False).astype(np.int64),
            n_parts))),
        batch_format="pyarrow", batch_size=None)

    def per_doc(dfr: "pd.DataFrame") -> pa.Table:
        dvals = np.unique(dfr["df"].to_numpy(np.int64))
        idf_map = {int(d): math.log(n_docs / int(d))
                   for d in dvals.tolist()}    # distinct-df-bounded
        idf = dfr["df"].map(idf_map).to_numpy(np.float64)
        s = dfr["tf"].to_numpy(np.int64).astype(np.float64) * idf
        toks = dfr["token"].to_numpy(dtype=object)
        r = dfr["doc"].to_numpy(np.int64)
        order = np.lexsort((toks, -s, r))
        r, s, toks = r[order], s[order], toks[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(r[1:] != r[:-1]) + 1])
        counts = np.diff(np.concatenate([starts, [len(r)]]))
        rank = (np.arange(len(r), dtype=np.int64)
                - np.repeat(starts, counts) + 1)
        keep = rank <= top_n
        return pa.table({
            id_col: pa.array(r[keep], type=pa.int64()),
            "token": pa.array(toks[keep].tolist(), type=pa.string()),
            "tfidf": pa.array(round_half_away(s[keep]),
                              type=pa.float64()),
            "rank": pa.array(rank[keep], type=pa.int64())})

    return tagged.groupby("part").map_groups(per_doc,
                                             batch_format="pandas")


def tfidf_top_terms(sf_dir: str, top_n: int = 3, lower: bool = True,
                    text_col: str = "text", id_col: str = "doc_id",
                    df_broadcast_max: int = 2_000_000):
    """Per-document top-N terms by TF-IDF: (doc_id, token, tfidf, rank),
    tfidf = tf * ln(N / df), rank by (tfidf DESC, token ASC).

    Two passes: (1) distributed document-frequency aggregation (the same
    partial as :func:`token_doc_freq`, un-limited); (2) scoring.  The
    DF table is Heaps-sublinear in corpus size, so at or below
    ``df_broadcast_max`` distinct tokens it collects into an idf Series
    broadcast once via ``ray.put`` + worker cache and pass 2 is one
    shuffle-free streaming score.  Above the threshold (round-4
    review) the DF table stays a Dataset: per-(doc, token) tf rows
    co-partition-join it by token digest and re-bucket by doc id for
    the per-document top-N — two corpus shuffles instead of a
    vocab-sized per-worker dict (:func:`_tfidf_joined`, bit-identical
    output, equivalence pytest in tests/test_pipelines_robustness.py).
    idf values are computed ONCE per distinct df value with
    ``math.log`` on both paths so identical constants apply.
    """
    import math

    import pandas as pd
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..state.bcast import cached_get

    import functools

    ds = read_table(sf_dir, "documents", columns=[id_col, text_col])
    # pass 1 only needs the text column — read a separate projection so
    # the full-corpus DF scan never decodes/ships doc ids
    ds_text = read_table(sf_dir, "documents", columns=[text_col])

    partial_df = functools.partial(_df_partial, text_col=text_col,
                                   lower=lower)
    df_ds = (ds_text.map_batches(partial_df, batch_format="pyarrow",
                                 batch_size=None)
             .groupby("token")
             .aggregate(Sum("partial_df", alias_name="df"))).materialize()
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    if df_ds.count() > df_broadcast_max:
        return _tfidf_joined(ds, df_ds, n_docs, top_n=top_n,
                             lower=lower, text_col=text_col,
                             id_col=id_col)
    df_pd = df_ds.to_pandas()
    idf_ser = pd.Series(
        [math.log(n_docs / int(d)) for d in df_pd["df"]],
        index=df_pd["token"].to_numpy(), dtype=np.float64) \
        if len(df_pd) else pd.Series(dtype=np.float64)
    idf_ref = ray.put(idf_ser)

    def score(batch: pa.Table, idf_ref=idf_ref) -> pa.Table:
        idf = cached_get(idf_ref)
        texts = _string_array(batch[text_col])
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        row_idx, codes, uniques, _, _ = _token_codes(texts, lower=lower)
        if len(codes) == 0:
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                "token": pa.array([], type=pa.string()),
                "tfidf": pa.array([], type=pa.float64()),
                "rank": pa.array([], type=pa.int64()),
            })
        nu = np.int64(len(uniques))
        pk, tf = np.unique(row_idx * nu + codes, return_counts=True)
        r = (pk // nu).astype(np.int64)
        c = (pk % nu).astype(np.int64)
        idf_u = idf.reindex(uniques).fillna(0.0).to_numpy()
        s = tf.astype(np.float64) * idf_u[c]
        toks = uniques[c]
        order = np.lexsort((toks, -s, r))
        r, s, toks = r[order], s[order], toks[order]
        starts = np.concatenate([[0], np.flatnonzero(r[1:] != r[:-1]) + 1])
        counts = np.diff(np.concatenate([starts, [len(r)]]))
        rank = (np.arange(len(r), dtype=np.int64)
                - np.repeat(starts, counts) + 1)
        keep = rank <= top_n
        return pa.table({
            id_col: pa.array(ids[r[keep]], type=pa.int64()),
            "token": pa.array(toks[keep].tolist(), type=pa.string()),
            "tfidf": pa.array(round_half_away(s[keep]), type=pa.float64()),
            "rank": pa.array(rank[keep], type=pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


def repetition_stats(sf_dir: str, text_col: str = "text",
                     id_col: str = "doc_id"):
    """Gopher-style repetition signal per document: the fraction of all
    word-bigrams taken by the single most frequent bigram —
    (doc_id, n_bigrams, top_bigram_n, rep_ratio).  High rep_ratio marks
    boilerplate/spam for corpus filtering.

    One streaming pass, no shuffle: bigram hashes via the same mod-(2^61-1)
    Horner fold as the shingle machinery (SQL-mirrorable), per-(doc,bigram)
    counts from one lexsort + run-length pass.
    """
    import ray
    import ray.data

    from .dedup import (_hash_tokens_batch, _mod61, _mulmod61_small,
                        _SHINGLE_Q)

    ds = read_table(sf_dir, "documents", columns=[id_col, text_col])

    def stats(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = _string_array(batch[text_col])
        row_idx, th, n = _hash_tokens_batch(texts)
        n_tok = np.bincount(row_idx, minlength=n)
        n_bg = np.maximum(n_tok - 1, 0).astype(np.int64)
        top = np.zeros(n, dtype=np.int64)
        if len(th) >= 2:
            bh = _mod61(_mulmod61_small(_SHINGLE_Q, th[:-1]) + th[1:])
            valid = row_idx[:-1] == row_idx[1:]
            r = row_idx[:-1][valid]
            bh = bh[valid]
            if len(bh):
                order = np.lexsort((bh, r))
                r, bh = r[order], bh[order]
                new = np.concatenate([[True], (r[1:] != r[:-1])
                                      | (bh[1:] != bh[:-1])])
                starts = np.flatnonzero(new)
                c = np.diff(np.concatenate([starts, [len(r)]]))
                rr = r[starts]
                gstart = np.concatenate([[0], np.flatnonzero(
                    rr[1:] != rr[:-1]) + 1])
                tops = np.maximum.reduceat(c, gstart)
                top[rr[gstart]] = tops
        ratio = np.where(n_bg > 0, top / np.maximum(n_bg, 1), 0.0)
        return pa.table({
            id_col: pa.array(ids, type=pa.int64()),
            "n_bigrams": pa.array(n_bg),
            "top_bigram_n": pa.array(top),
            "top_bigram_ratio": pa.array(round_half_away(ratio),
                                         type=pa.float64()),
        })

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=None)


def chunk_documents(sf_dir: str, chunk_tokens: int = 100,
                    text_col: str = "text", id_col: str = "doc_id"):
    """Context-window packing: split every document into fixed-size token
    chunks — (doc_id, chunk_id, n_tokens, chunk_text), chunk_text = the
    chunk's tokens joined by single spaces (whitespace-normalized, same
    tokenizer as every other text operator).

    One streaming pass, no shuffle.  Chunk texts are rebuilt with ONE
    Arrow kernel: the chunk boundaries tile the flat token array exactly,
    so a ListArray view over it + ``pc.binary_join`` emits all chunk
    strings without any per-chunk Python work.
    """
    import ray
    import ray.data

    C = int(chunk_tokens)
    ds = read_table(sf_dir, "documents", columns=[id_col, text_col])

    def chunks(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = _string_array(batch[text_col])
        crow, cid, ctok, txt = _chunk_arrays(texts, C)
        return pa.table({
            id_col: pa.array(ids[crow], type=pa.int64()),
            "chunk_id": pa.array(cid),
            "n_tokens": pa.array(ctok),
            "chunk_text": txt,
        })

    return ds.map_batches(chunks, batch_format="pyarrow", batch_size=None)


def _chunk_arrays(texts: pa.StringArray, C: int):
    """Per-batch fixed-token chunking, fully vectorized.

    Returns (crow, chunk_id, chunk_n_tokens, chunk_text): the row index of
    each chunk's document (doc-major, chunk_id ascending within a row),
    its ordinal, its token count and its rebuilt text (tokens joined by
    single spaces).  Shared by chunk_documents and chunk_dedup."""
    n = len(texts)
    _row, _codes, _uniq, n_tokens, flat = _token_codes(texts)
    n_chunks = (n_tokens + C - 1) // C
    total = int(n_chunks.sum())
    if total == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64), pa.array([], type=pa.string()))
    crow = np.repeat(np.arange(n, dtype=np.int64), n_chunks)
    gstart = np.concatenate([[0], np.cumsum(n_chunks)])[:-1]
    cid = np.arange(total, dtype=np.int64) - np.repeat(gstart, n_chunks)
    row_start = np.concatenate([[0], np.cumsum(n_tokens)]).astype(np.int64)
    starts = row_start[crow] + cid * C
    ends = np.minimum(starts + C, row_start[crow] + n_tokens[crow])
    # chunks tile the flat token array exactly (empty docs emit no
    # chunks and zero tokens), so starts + final end form valid
    # monotone ListArray offsets over `flat` — zero copies
    offsets = np.concatenate([starts, [row_start[-1]]]).astype(np.int32)
    la = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), flat)
    txt = pc.binary_join(la, " ")
    return crow, cid, ends - starts, txt


def rare_token_stats(sf_dir: str, q: float = 0.2, lower: bool = True,
                     id_col: str = "doc_id", text_col: str = "text"):
    """Corpus-frequency quality signal (CCNet-style lexicon filtering):
    per document, the count and fraction of token OCCURRENCES whose
    corpus-wide frequency is <= the q-quantile of all token frequencies
    (quantile_disc rule: rank max(0, ceil(q*n)-1) of the sorted counts) —
    gibberish/OCR noise scores high in rare tokens.  A relative threshold
    adapts to any corpus; output: (doc_id, n_tokens, n_rare, rare_ratio),
    zero-token documents report ratio 0.

    Two passes, same shape as tfidf: (1) global token counts (vocabulary-
    sized shuffle of pre-aggregated partials), the RARE subset collected
    and broadcast as a sorted hash array (rare vocabulary is the long
    tail by type count but bounded; swap for a token-keyed co-partition
    join if a corpus's tail outgrows one heap); (2) one streaming pass
    scoring each document with a searchsorted membership probe.
    """
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..state.bcast import cached_get
    from .dedup import _poly_token_hash_array

    ds_text = read_table(sf_dir, "documents", columns=[text_col])

    def partial_counts(batch: pa.Table) -> pa.Table:
        texts = _string_array(batch[text_col])
        _row, codes, uniques, _, _ = _token_codes(texts, lower=lower)
        c = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
        return pa.table({
            "token": pa.array(uniques.tolist(), type=pa.string()),
            "partial_n": pa.array(c),
        })

    cnt_pd = (ds_text.map_batches(partial_counts, batch_format="pyarrow",
                                  batch_size=None)
              .groupby("token")
              .aggregate(Sum("partial_n", alias_name="n"))).to_pandas()
    # vocabulary-sized table on the driver (same budget as tfidf's DF);
    # threshold = quantile_disc(counts, q)
    counts = np.sort(cnt_pd["n"].to_numpy().astype(np.int64))
    if len(counts):
        thr = int(counts[max(0, int(np.ceil(q * len(counts))) - 1)])
        rare_tok = cnt_pd["token"][cnt_pd["n"].to_numpy() <= thr]
        rare = np.unique(_poly_token_hash_array(
            pa.array(rare_tok.tolist(), type=pa.string())).astype(np.int64))
    else:
        rare = np.empty(0, dtype=np.int64)
    rare_ref = ray.put(rare)

    ds = read_table(sf_dir, "documents", columns=[id_col, text_col])

    def score(batch: pa.Table, rare_ref=rare_ref) -> pa.Table:
        rr = cached_get(rare_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = _string_array(batch[text_col])
        row_idx, codes, uniques, n_tok, _ = _token_codes(texts, lower=lower)
        n = len(ids)
        if len(codes):
            uh = _poly_token_hash_array(
                pa.array(uniques.tolist(), type=pa.string())) \
                .astype(np.int64)
            pos = np.searchsorted(rr, uh)
            is_rare = (pos < len(rr)) & (rr[np.minimum(pos, len(rr) - 1)]
                                         == uh)
            n_rare = np.bincount(row_idx[is_rare[codes]],
                                 minlength=n).astype(np.int64)
        else:
            n_rare = np.zeros(n, dtype=np.int64)
        ratio = np.where(n_tok > 0, n_rare / np.maximum(n_tok, 1), 0.0)
        return pa.table({
            id_col: pa.array(ids, type=pa.int64()),
            "n_tokens": pa.array(n_tok),
            "n_rare": pa.array(n_rare),
            "rare_ratio": pa.array(round_half_away(ratio),
                                   type=pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


def normalize_text(sf_dir: str, id_col: str = "doc_id",
                   text_col: str = "text"):
    """Canonical text normalization before exact/near dedup: lowercase,
    strip every char outside [a-z0-9\\s], collapse whitespace runs to one
    space, trim — (doc_id, norm_text, n_chars, n_norm_chars).  Pure
    streaming Arrow RE2 kernels, no shuffle; the same RE2 regexes run in
    the DuckDB oracle, so parity is by construction.
    """
    import ray
    import ray.data

    ds = read_table(sf_dir, "documents", columns=[id_col, text_col])

    def stage(batch: pa.Table) -> pa.Table:
        t = _string_array(batch[text_col])
        n_chars = pc.utf8_length(t)
        low = pc.utf8_lower(t)
        stripped = pc.replace_substring_regex(low, r"[^a-z0-9\s]", "")
        collapsed = pc.replace_substring_regex(stripped, r"\s+", " ")
        norm = pc.utf8_trim_whitespace(collapsed)
        return pa.table({
            id_col: batch[id_col],
            "norm_text": norm,
            "n_chars": pc.cast(n_chars, pa.int64()),
            "n_norm_chars": pc.cast(pc.utf8_length(norm), pa.int64()),
        })

    return ds.map_batches(stage, batch_format="pyarrow", batch_size=None)


def normalize_text_sql(text_expr: str = "text") -> str:
    """DuckDB mirror of normalize_text's expression chain."""
    return (f"trim(regexp_replace(regexp_replace(lower({text_expr}), "
            f"'[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))")


def quality_median_filter(sf_dir: str):
    """Composition: keep documents whose quality is >= their language's
    median quality — per-group exact median (analytics.group_quantiles,
    the bounded-memory three-pass machinery) feeding a broadcast filter.
    Output: (doc_id, lang)."""
    import ray

    from .analytics import group_quantiles

    def make_ds():
        ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "text"])

        def with_quality(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            # NULL-lang docs drop: the oracle's JOIN USING (lang)
            # discards them, and the per-language median machinery
            # cannot sort a None group key (review finding)
            if batch["lang"].null_count:
                batch = batch.filter(pc.is_valid(batch["lang"]))
            q = quality_score(batch)
            return pa.table({
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "quality": q["quality"],
            })

        return ds.map_batches(with_quality, batch_format="pyarrow",
                              batch_size=None)

    med = group_quantiles(sf_dir, qs=(0.5,), group_col="lang",
                          value_col="quality", make_ds=make_ds)
    med_by_lang = dict(zip(med["lang"], med["quality"]))
    med_obj = ray.put(med_by_lang)

    def keep(batch: pa.Table) -> pa.Table:
        m = ray.get(med_obj)
        lang = np.asarray(batch["lang"].to_pandas(), dtype=object)
        qv = batch["quality"].to_numpy(zero_copy_only=False)
        thr = np.fromiter((m[x] for x in lang), count=len(lang),
                          dtype=np.float64)
        return batch.filter(pa.array(qv >= thr)).select(["doc_id", "lang"])

    return make_ds().map_batches(keep, batch_format="pyarrow",
                                 batch_size=None)


def heavy_hitters(sf_dir: str, k: int = 100, width: int = 1024,
                  lower: bool = True, text_col: str = "text"):
    """Top-k tokens via the two-pass exact heavy-hitters pattern: a
    Misra-Gries summary per batch (width counters) merged into a candidate
    set, then ONE exact recount of candidates only.

    This is vocab_top_k's scale path: the shuffle moves width-bounded
    sketch rows + candidate counts instead of the full vocabulary.  The
    result is EXACT whenever the true rank-k frequency exceeds n/width
    (MG's undercount bound guarantees every such token survives into the
    candidate set); the pytest suite asserts equality with vocab_top_k on
    the test corpora."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=[text_col])

    def mg_partial(batch: pa.Table) -> pa.Table:
        texts = _string_array(batch[text_col])
        _, codes, uniques, _, _ = _token_codes(texts, lower=lower)
        cnt = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
        if len(cnt) > width:
            # Misra-Gries decrement: keep the width largest, subtract the
            # (width+1)-th count from the survivors (the classic summary,
            # computed directly from the batch-local exact counts)
            order = np.argsort(-cnt, kind="stable")
            thresh = cnt[order[width]]
            keep = order[:width]
            uniques, cnt = uniques[keep], np.maximum(cnt[keep] - thresh, 1)
        return pa.table({
            "token": pa.array(uniques.tolist(), type=pa.string()),
            "partial_n": pa.array(cnt),
        })

    cand = (ds.map_batches(mg_partial, batch_format="pyarrow",
                           batch_size=None)
            .groupby("token")
            .aggregate(Sum("partial_n", alias_name="mg_n")))
    cand_tokens = np.asarray(cand.select_columns(["token"]).to_pandas()
                             ["token"], dtype=object)
    cand_ref = ray.put(frozenset(cand_tokens.tolist()))

    def exact_partial(batch: pa.Table) -> pa.Table:
        texts = _string_array(batch[text_col])
        _, codes, uniques, _, _ = _token_codes(texts, lower=lower)
        cnt = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
        cs = ray.get(cand_ref)
        keep = np.fromiter((u in cs for u in uniques),
                           count=len(uniques), dtype=bool)
        return pa.table({
            "token": pa.array(uniques[keep].tolist(), type=pa.string()),
            "partial_n": pa.array(cnt[keep]),
        })

    agg = (ds.map_batches(exact_partial, batch_format="pyarrow",
                          batch_size=None)
           .groupby("token")
           .aggregate(Sum("partial_n", alias_name="n")))
    return agg.sort(["n", "token"], descending=[True, False]).limit(k)


def doc_perplexity(sf_dir: str, alpha: float = 0.5,
                   id_col: str = "doc_id", text_col: str = "text"):
    """Per-document bigram language-model perplexity — the CCNet-style
    corpus-level quality signal (documents that "look like" the corpus
    score low, boilerplate/garbage scores high).

    Train: corpus unigram and bigram counts over the mod-(2^61-1) token
    hashes (the dedup family's machinery, so the SQL oracle mirrors the
    hashing exactly).  Smoothing is add-alpha over the unigram context:
    P(b|a) = (c(ab) + alpha) / (c(a) + alpha*V), V = distinct unigrams.
    Score: ppl = round(exp(-mean ln P), 6) per document with >= 2 tokens.

    Scale shape: the training shuffle moves (order, hash, partial_count)
    rows — VOCABULARY-sized, not corpus-sized (same contract as
    vocab_top_k / token_doc_freq); the merged count table broadcasts once
    (same bounded-vocabulary assumption as tfidf's DF broadcast) and
    scoring is one zero-shuffle streaming pass with two searchsorted
    lookups per bigram.
    """
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from .dedup import (_SHINGLE_Q, _hash_tokens_batch, _mod61,
                        _mulmod61_small)
    from ..state.bcast import cached_get

    ds = read_table(sf_dir, "documents", columns=[id_col, text_col])

    def _grams(texts):
        """(row_idx, unigram hashes, bigram rows, bigram hashes, a-hashes)."""
        row_idx, th, n = _hash_tokens_batch(texts)
        if len(th) >= 2:
            b = _mod61(_mulmod61_small(_SHINGLE_Q, th[:-1]) + th[1:])
            valid = row_idx[:-1] == row_idx[1:]
            return (row_idx, th, row_idx[:-1][valid], b[valid],
                    th[:-1][valid], n)
        z = np.empty(0, dtype=np.int64)
        return (row_idx, th, z, z.astype(np.uint64), z.astype(np.uint64), n)

    def gram_partial(batch: pa.Table) -> pa.Table:
        texts = _string_array(batch[text_col])
        _row, th, _brow, bh, _ah, _n = _grams(texts)
        uh, uc = np.unique(th, return_counts=True)
        bh2, bc = np.unique(bh, return_counts=True)
        return pa.table({
            "o": pa.array(np.concatenate([np.ones(len(uh), dtype=np.int8),
                                          np.full(len(bh2), 2,
                                                  dtype=np.int8)])),
            "h": pa.array(np.concatenate([uh, bh2]).astype(np.int64)),
            "partial_n": pa.array(np.concatenate([uc, bc])
                                  .astype(np.int64)),
        })

    counts = (ds.map_batches(gram_partial, batch_format="pyarrow",
                             batch_size=None)
              .groupby(["o", "h"])
              .aggregate(Sum("partial_n", alias_name="n"))
              .to_pandas())   # vocabulary-sized, never corpus-sized
    uni = counts[counts["o"] == 1].sort_values("h")
    big = counts[counts["o"] == 2].sort_values("h")
    model = (uni["h"].to_numpy().astype(np.uint64),
             uni["n"].to_numpy().astype(np.float64),
             big["h"].to_numpy().astype(np.uint64),
             big["n"].to_numpy().astype(np.float64),
             float(len(uni)))
    m_ref = ray.put(model)

    def score(batch: pa.Table, m_ref=m_ref) -> pa.Table:
        uh, uc, bh, bc, V = cached_get(m_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = _string_array(batch[text_col])
        _row, _th, brow, b, ah, n_rows = _grams(texts)
        if len(b) == 0:
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                "n_bigrams": pa.array([], type=pa.int64()),
                "ppl": pa.array([], type=pa.float64()),
            })
        # self-inclusive training guarantees every scored gram is present
        cb = bc[np.searchsorted(bh, b)]
        ca = uc[np.searchsorted(uh, ah)]
        logp = np.log((cb + alpha) / (ca + alpha * V))
        sums = np.bincount(brow, weights=logp, minlength=n_rows)
        cnts = np.bincount(brow, minlength=n_rows)
        sel = cnts > 0
        return pa.table({
            id_col: pa.array(ids[sel]),
            "n_bigrams": pa.array(cnts[sel].astype(np.int64)),
            "ppl": pa.array(round_half_away(
                np.exp(-sums[sel] / cnts[sel])), type=pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


# Pattern redaction (PII / boilerplate scrubbing). RE2 on both engines:
# Arrow's replace_substring_regex/count_substring_regex and DuckDB's
# regexp_replace/regexp_extract_all are all RE2, so parity is by
# construction.  Applied IN ORDER — each pattern sees the previous
# pattern's output, and its count is taken on that same intermediate
# state (the oracle mirrors the chain stage by stage).
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s\"<]+", "<URL>"),
    ("ip", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("num", r"[0-9]{6,}", "<NUM>"),
)


def redact_pii(sf_dir: str, patterns=PII_PATTERNS, repl: int = 1):
    """Scrub PII-ish / boilerplate patterns from page html: emails, URLs,
    IPv4s, long digit runs -> typed placeholder tokens, with a per-page
    match count for each pattern.  Output: (page_id, n_<name>s per
    pattern, redacted, n_chars).

    Pure streaming map_batches — zero shuffle, zero state; the hot path is
    Arrow RE2 kernels over the html column (never a Python loop).  At
    100 TB this is the canonical cheap stage: it pipelines behind the read
    and ahead of dedup/tokenization with no materialization.
    """
    from ..sources.pages import read_pages

    ds = read_pages(sf_dir, repl=repl)
    return ds.map_batches(redact_batch, fn_kwargs={"patterns": patterns},
                          batch_format="pyarrow", batch_size=None)


def redact_batch(batch: pa.Table, patterns=PII_PATTERNS) -> pa.Table:
    """The redact_pii per-batch transform (module-level for direct tests)."""
    h = batch["html"].cast(pa.string())
    cols = {"page_id": batch["page_id"]}
    for name, pat, repl in patterns:
        cols[f"n_{name}s"] = pc.cast(
            pc.count_substring_regex(h, pat), pa.int64())
        h = pc.replace_substring_regex(h, pat, repl)
    cols["redacted"] = h
    cols["n_chars"] = pc.cast(pc.utf8_length(h), pa.int64())
    return pa.table(cols)


def redact_pii_sql(html_expr: str, patterns=PII_PATTERNS) -> str:
    """DuckDB mirror of redact_pii's staged chain over ``html_expr`` (a
    relation exposing page_id and an ``h`` html column)."""
    q = html_expr
    names = []
    for name, pat, repl in patterns:
        assert "'" not in pat and "'" not in repl
        names.append(f"n_{name}s")
        q = (f"SELECT * EXCLUDE (h), "
             f"len(regexp_extract_all(h, '{pat}')) AS n_{name}s, "
             f"regexp_replace(h, '{pat}', '{repl}', 'g') AS h FROM ({q})")
    cols = ", ".join(names)
    return (f"SELECT page_id, {cols}, h AS redacted, "
            f"length(h) AS n_chars FROM ({q})")


def inverted_index(sf_dir: str, shard_docs: int = 100, lower: bool = True,
                   id_col: str = "doc_id", text_col: str = "text"):
    """Sharded inverted-index build (search-index sink): one row per
    (token, shard) with df = #distinct documents in the shard containing
    the token and postings = the comma-joined ASCENDING doc-id list.

    shard = doc_id // shard_docs.  Sharding is what makes the index
    scale-safe: a stop-token's global posting list is unbounded, but each
    (token, shard) list is capped at shard_docs ids, so no reducer and no
    output cell ever exceeds a fixed size — pick shard_docs so one shard's
    postings fit a task (the classic segmented-index layout).

    Per-batch partial: distinct (token, doc) pairs via one packed
    np.unique (row = document invariant makes the dedup exact), emitted as
    ONE compact row per (token, shard) per batch carrying the sorted id
    blob; the shuffle moves those blobs — vocabulary x shards rows, never
    corpus rows.  map_groups concatenates blobs (ids are globally distinct
    across batches) and sorts once.
    """
    import ray
    import ray.data

    ds = read_table(sf_dir, "documents", columns=[id_col, text_col])
    s = np.int64(shard_docs)

    def partial(batch: pa.Table) -> pa.Table:
        texts = _string_array(batch[text_col])
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        row_idx, codes, uniques, _, _ = _token_codes(texts, lower=lower)
        if not len(codes):
            return pa.table({"token": pa.array([], type=pa.string()),
                             "shard": pa.array([], type=pa.int64()),
                             "ids_b": pa.array([], type=pa.binary())})
        nv = np.int64(len(uniques))
        pair = np.unique(row_idx * nv + codes)
        prow, pcode = pair // nv, pair % nv
        doc = ids[prow]
        shard = np.floor_divide(doc, s)
        # group rows by (code, shard): sort by packed key, runs = groups;
        # doc ascending within a run because doc//s is monotone in doc
        order = np.lexsort((doc, shard, pcode))
        pcode, shard, doc = pcode[order], shard[order], doc[order]
        key_change = np.flatnonzero(
            (pcode[1:] != pcode[:-1]) | (shard[1:] != shard[:-1])) + 1
        starts = np.concatenate([[0], key_change, [len(pcode)]])
        toks, shards, blobs = [], [], []
        for a, b in zip(starts[:-1], starts[1:]):
            toks.append(uniques[pcode[a]])
            shards.append(int(shard[a]))
            blobs.append(doc[a:b].tobytes())
        return pa.table({"token": pa.array(toks, type=pa.string()),
                         "shard": pa.array(shards, type=pa.int64()),
                         "ids_b": pa.array(blobs, type=pa.binary())})

    def merge(df):
        import pandas as pd

        ids = np.sort(np.concatenate(
            [np.frombuffer(b, dtype=np.int64) for b in df["ids_b"]]))
        return pd.DataFrame({
            "token": [df["token"].iloc[0]],
            "shard": [np.int64(df["shard"].iloc[0])],
            "df": [np.int64(len(ids))],
            "postings": [",".join(map(str, ids.tolist()))],
        })

    return (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby(["token", "shard"])
            .map_groups(merge, batch_format="pandas"))


def langid_confusion(sf_dir: str):
    """Label-quality audit: confusion matrix of the corpus's labeled
    ``lang`` column vs the marker-word LangId prediction — (lang,
    lang_pred, n), one row per observed pair.  The standard first look at
    whether a crawl's self-declared languages can be trusted.

    One streaming pass (the LangId singleton fuses with the scan), then a
    (labels x predictions)-bounded count groupby over sentinel-packed
    keys (a shuffle key cannot be NULL; NULL labels are restored in the
    finalize).
    """
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        batch = lang_id_batch(batch)
        lab = batch["lang"].to_pandas()
        key = lab.where(lab.notna(), "\x00").astype(str) + "\x1f" + \
            batch["lang_pred"].to_pandas().astype(str)
        g = key.groupby(key, sort=False).size()
        return pa.table({
            "gk": pa.array(g.index.to_numpy(), type=pa.string()),
            "pn": pa.array(g.to_numpy().astype(np.int64)),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
           .groupby("gk")
           .aggregate(Sum("pn", alias_name="n")))

    def finalize(batch: pa.Table) -> pa.Table:
        import pandas as pd

        gk = batch["gk"].to_pandas()
        parts = gk.str.split("\x1f", n=1, expand=True)
        lab = parts[0].where(parts[0] != "\x00", None)
        return pa.table({
            "lang": pa.array(lab, type=pa.string()),
            "lang_pred": pa.array(parts[1], type=pa.string()),
            "n": batch["n"],
        })

    return agg.map_batches(finalize, batch_format="pyarrow",
                           batch_size=None)


def vocab_coverage(sf_dir: str, p_num: int = 1, p_den: int = 2,
                   lower: bool = True, count_bucket: int = 16,
                   text_col: str = "text"):
    """Nucleus (top-p) vocabulary cut: the tokens of the frequency-sorted
    vocabulary (n DESC, token ASC) whose PRECEDING cumulative occurrence
    count stays under p = p_num/p_den of all occurrences — (token, n,
    cum_before).  The coverage analysis behind vocabulary truncation and
    stop-list construction; the keep rule ``p_den * cum_before <
    p_num * total`` is pure int64, so the boundary token can never
    float-diverge.

    Distributed DESCENDING cumulative sum, the doc_token_rank two-level
    scan flipped: vocabulary counts (a vocabulary-sized aggregate) ->
    per-count-range occurrence totals -> driver exclusive offsets over
    ranges in DESCENDING count order (bounded by count spread, never
    vocabulary size) -> per-range local (n DESC, token) sort + cumsum +
    offset; equal counts live in one range, so the tie order is local.
    """
    import ray
    from ray.data.aggregate import Sum

    from ..state.bcast import cached_get
    from ..sources.readers import read_table

    CB = np.int64(count_bucket)
    ds = read_table(sf_dir, "documents", columns=[text_col])

    def partial(batch: pa.Table) -> pa.Table:
        texts = _string_array(batch[text_col])
        _, codes, uniques, _, _ = _token_codes(texts, lower=lower)
        cnt = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
        return pa.table({
            "token": pa.array(uniques.tolist(), type=pa.string()),
            "partial_n": pa.array(cnt),
        })

    vocab = (ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=None)
             .groupby("token")
             .aggregate(Sum("partial_n", alias_name="n"))).materialize()

    def range_partial(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False)
        r = n // CB
        u, inv = np.unique(r, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, n)
        return pa.table({"vr": pa.array(u),
                         "ps": pa.array(s)})

    rng = (vocab.map_batches(range_partial, batch_format="pyarrow",
                             batch_size=None)
           .groupby("vr")
           .aggregate(Sum("ps", alias_name="s"))).to_pandas()
    rng = rng.sort_values("vr", ascending=False).reset_index(drop=True)
    starts = rng["vr"].to_numpy().astype(np.int64)       # DESC order
    sums = rng["s"].to_numpy().astype(np.int64)
    total = int(sums.sum())
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]])  # exclusive
    bc = ray.put((starts, offsets, total))

    def cut_range(df, bc=bc):
        import pandas as pd

        if len(df) == 0:
            return pd.DataFrame({
                "token": pd.Series(dtype=object),
                "n": pd.Series(dtype=np.int64),
                "cum_before": pd.Series(dtype=np.int64),
            })
        st, off, tot = cached_get(bc)
        vr = int(df["n"].iloc[0] // CB)
        # st is descending: find vr's slot
        base = off[len(st) - 1 - np.searchsorted(st[::-1], vr)]
        df = df.sort_values(["n", "token"],
                            ascending=[False, True]).reset_index(drop=True)
        n = df["n"].to_numpy().astype(np.int64)
        cb_ = base + np.concatenate([[0], np.cumsum(n)[:-1]])
        keep = p_den * cb_ < p_num * tot
        return pd.DataFrame({
            "token": df["token"].to_numpy()[keep],
            "n": n[keep],
            "cum_before": cb_[keep].astype(np.int64),
        })

    def add_vr(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False)
        return batch.append_column("vr", pa.array(n // CB))

    return (vocab.map_batches(add_vr, batch_format="pyarrow",
                              batch_size=None)
            .groupby("vr")
            .map_groups(cut_range, batch_format="pandas"))


def _lev_bounded(a: bytes, b: bytes, k: int) -> int:
    """Byte-level Levenshtein distance, exact up to ``k`` (returns k+1 as
    soon as the true distance exceeds k).  Byte-level because DuckDB's
    ``levenshtein`` counts UTF-8 bytes, not codepoints (verified:
    levenshtein('é','e') = 2).  Banded DP: only the 2k+1 diagonal band
    can hold values <= k, so each row aborts early when its band
    minimum exceeds k — O(len * k) per pair, called on vocabulary-sized
    candidate lists only, never per corpus row.
    """
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return k + 1
    if a == b:
        return 0
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        ca = a[i - 1]
        cur = [i] + [0] * lb
        lo = max(1, i - k)
        hi = min(lb, i + k)
        if lo > 1:
            cur[lo - 1] = k + 1        # outside the band: poison
        row_min = cur[lo - 1] if lo > 1 else i
        for j in range(lo, hi + 1):
            c = min(prev[j] + 1, cur[j - 1] + 1,
                    prev[j - 1] + (ca != b[j - 1]))
            cur[j] = c
            if c < row_min:
                row_min = c
        if hi < lb:
            cur[hi + 1:] = [k + 1] * (lb - hi)
        if row_min > k:
            return k + 1
        prev = cur
    return prev[lb] if prev[lb] <= k else k + 1


def token_edit_pairs(sf_dir: str, max_dist: int = 2, n_parts: int = 64,
                     max_bucket: int = 65536, max_token_bytes: int = 64):
    """Edit-distance similarity self-join over the corpus vocabulary —
    the FastSS / SymSpell deletion-neighborhood join: all unordered
    pairs of DISTINCT corpus tokens with byte-level Levenshtein
    distance in [1, max_dist], plus the exact distance.  Byte-level
    because the oracle's ``levenshtein`` counts UTF-8 bytes, so the
    whole plan runs on encoded bytes for bit parity.

    FastSS invariant (Bocek et al. 2007): lev(a, b) <= k iff
    D_k(a) ∩ D_k(b) != Ø, where D_k(x) = every string obtainable from
    x by deleting up to k bytes.  Sharing a deletion variant is
    necessary but NOT sufficient ("ab"/"ba" share "a" yet lev = 2 ...
    which max_dist=2 accepts; "abc"/"ca" share "c" at k=2 yet lev = 3),
    so every candidate pair is verified with the exact banded DP above.

    Tokens longer than ``max_token_bytes`` are excluded on BOTH engines
    (the SQL mirrors with ``octet_length(tok) <= N``): the deletion
    neighborhood is O(len^k) variants per token, so an unbounded token
    length would let one adversarial megabyte token explode the variant
    table — the cap keeps the neighborhood <= 1 + L + L(L-1)/2 ≈ 2k
    rows per token and is a no-op on natural-language vocabularies.

    Scale shape: three vocabulary-sized shuffles, never corpus-sized —
    (1) per-batch-distinct tokens hash-partitioned to a global distinct,
    (2) (variant, token) rows partitioned by variant hash; within a
    variant bucket all O(bucket²) candidate pairs verify locally
    (buckets = tokens sharing a k-deletion variant; a bucket over
    ``max_bucket`` raises rather than going quadratic — same contract
    as knn_graph), (3) verified pairs partitioned by pair hash for the
    final distinct (a pair can meet in many buckets; the min dist is
    identical in every copy because the verifier is exact).  The
    per-token Python loops run over the VOCABULARY (post-distinct),
    not the corpus — the corpus-sized work (tokenize + per-batch
    distinct) is all Arrow.
    """
    import zlib

    import pandas as pd

    k = int(max_dist)

    ds = read_table(sf_dir, "documents", columns=["text"])

    def _np_crc(strs) -> np.ndarray:
        # vocabulary-sized loop by construction (inputs are distinct)
        return np.fromiter(
            (zlib.crc32(s.encode("utf-8") if isinstance(s, str) else s)
             for s in strs), dtype=np.int64, count=len(strs))

    def batch_vocab(batch: pa.Table) -> pa.Table:
        _row, _codes, uniques, _n, _flat = _token_codes(
            _string_array(batch["text"]))
        toks = pa.array(uniques, type=pa.string())
        blen = pc.binary_length(pc.cast(toks, pa.binary()))
        keep = pc.less_equal(blen, max_token_bytes)
        toks = pc.filter(toks, keep)
        h = _np_crc(toks.to_pylist())
        return pa.table({"tok": toks,
                         "part": pa.array((h % n_parts).astype(np.int32))})

    def _deletions(b: bytes, kk: int) -> set:
        out = {b}
        frontier = {b}
        for _ in range(kk):
            nxt = set()
            for v in frontier:
                for i in range(len(v)):
                    nxt.add(v[:i] + v[i + 1:])
            nxt -= out
            out |= nxt
            frontier = nxt
        return out

    def expand_variants(df: pd.DataFrame) -> pd.DataFrame:
        toks = pd.unique(df["tok"])
        vs, ts = [], []
        for t in toks:
            b = t.encode("utf-8")
            for v in _deletions(b, k):
                vs.append(v)
                ts.append(t)
        if not vs:
            return pd.DataFrame({"vpart": pd.Series(dtype=np.int32),
                                 "variant": pd.Series(dtype=object),
                                 "tok": pd.Series(dtype=object)})
        vh = np.fromiter((zlib.crc32(v) for v in vs), dtype=np.int64,
                         count=len(vs))
        return pd.DataFrame({
            "vpart": (vh % n_parts).astype(np.int32),
            "variant": vs, "tok": ts})

    def candidate_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_d = [], [], []
        seen = set()                   # pairs verified in THIS partition
        for _v, g in df.groupby("variant", sort=False):
            toks = sorted(pd.unique(g["tok"]))
            m = len(toks)
            if m < 2:
                continue
            if m > max_bucket:
                raise ValueError(
                    f"token_edit_pairs variant bucket {m} > max_bucket="
                    f"{max_bucket}: raise the cap explicitly rather than "
                    "letting a degenerate vocabulary go quadratic")
            enc = [t.encode("utf-8") for t in toks]
            for i in range(m):
                for j in range(i + 1, m):
                    key = (toks[i], toks[j])
                    if key in seen:
                        continue
                    seen.add(key)
                    d = _lev_bounded(enc[i], enc[j], k)
                    if 1 <= d <= k:
                        out_a.append(toks[i])
                        out_b.append(toks[j])
                        out_d.append(d)
        if not out_a:
            return pd.DataFrame({"ppart": pd.Series(dtype=np.int32),
                                 "tok_a": pd.Series(dtype=object),
                                 "tok_b": pd.Series(dtype=object),
                                 "dist": pd.Series(dtype=np.int64)})
        ph = np.fromiter(
            (zlib.crc32(a.encode() + b"\x00" + b.encode())
             for a, b in zip(out_a, out_b)),
            dtype=np.int64, count=len(out_a))
        return pd.DataFrame({"ppart": (ph % n_parts).astype(np.int32),
                             "tok_a": out_a, "tok_b": out_b,
                             "dist": np.asarray(out_d, dtype=np.int64)})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"tok_a": pd.Series(dtype=object),
                                 "tok_b": pd.Series(dtype=object),
                                 "dist": pd.Series(dtype=np.int64)})
        g = df.drop_duplicates(["tok_a", "tok_b"])
        return pd.DataFrame({"tok_a": g["tok_a"].to_numpy(),
                             "tok_b": g["tok_b"].to_numpy(),
                             "dist": g["dist"].to_numpy().astype(np.int64)})

    return (ds.map_batches(batch_vocab, batch_format="pyarrow",
                           batch_size=None)
            .groupby("part")
            .map_groups(expand_variants, batch_format="pandas")
            .groupby("vpart")
            .map_groups(candidate_pairs, batch_format="pandas")
            .groupby("ppart")
            .map_groups(finish, batch_format="pandas"))


TOKEN_EDIT_PAIRS_SQL = r"""
WITH toks AS (
  SELECT DISTINCT unnest(list_filter(
           regexp_split_to_array(text, '\s+'), x -> x <> '')) AS tok
  FROM documents WHERE text IS NOT NULL)
SELECT a.tok AS tok_a, b.tok AS tok_b,
       CAST(levenshtein(a.tok, b.tok) AS BIGINT) AS dist
FROM toks a JOIN toks b
  ON a.tok < b.tok AND levenshtein(a.tok, b.tok) BETWEEN 1 AND 2
WHERE octet_length(CAST(a.tok AS BLOB)) <= 64
  AND octet_length(CAST(b.tok AS BLOB)) <= 64"""


def phrase_search(sf_dir: str, t1: str = "data", t2: str = "line",
                  text_col: str = "text", id_col: str = "doc_id"):
    """Positional phrase query — the IR primitive the flat inverted index
    cannot answer: (doc_id, n_occ) for every document where token i is
    ``t1`` and token i+1 is ``t2`` (token-exact adjacency, NOT substring
    match — 'database lineage' does not match 'data line').  Overlapping
    occurrences count individually, mirroring the positional-join
    semantics ('x x x' has two occurrences of phrase 'x x').

    Fully vectorized and embarrassingly parallel: Arrow split_pattern
    gives the flat token array + offsets zero-copy; the adjacency test is
    two shifted equality masks with cross-document pairs masked out via
    the offset boundaries; per-doc occurrence counts come from one
    searchsorted + unique.  No shuffle at all — the output is per-doc and
    each batch is independent (the 100-TB shape: a pure streaming scan).
    Tokenization is split-on-single-space to match the oracle's
    string_split(text, ' ') exactly (empty segments preserved).
    """
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "documents", columns=[id_col, text_col])

    def scan(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch[text_col]))
        empty = pa.table({id_col: pa.array([], type=pa.int64()),
                          "n_occ": pa.array([], type=pa.int64())})
        if not len(batch):
            return empty
        toks = pc.split_pattern(_string_array(batch[text_col]), " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) \
            else toks
        flat = toks.flatten()
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]   # rebase in case of a sliced array
        if len(flat) < 2:
            return empty
        m1 = pc.equal(flat, t1).to_numpy(zero_copy_only=False)
        m2 = pc.equal(flat, t2).to_numpy(zero_copy_only=False)
        hit = m1[:-1] & m2[1:]
        # a pair (i, i+1) is valid only inside one document: kill pairs
        # whose successor index is a document start
        starts = offsets[1:-1]
        doc_starts = starts[(starts > 0) & (starts < len(flat))]
        hit[doc_starts - 1] = False
        pos = np.flatnonzero(hit)
        if not len(pos):
            return empty
        doc_idx = np.searchsorted(offsets[1:], pos, side="right")
        u, c = np.unique(doc_idx, return_counts=True)
        ids = batch[id_col].to_numpy(zero_copy_only=False)[u]
        return pa.table({id_col: pa.array(ids, type=pa.int64()),
                         "n_occ": pa.array(c.astype(np.int64))})

    return ds.map_batches(scan, batch_format="pyarrow", batch_size=None)


def phrase_search_sql(t1: str = "data", t2: str = "line") -> str:
    """Oracle: 1-based list positional scan via list_filter over
    range(1, len) — token-exact adjacency identical to the engine."""
    return (
        "SELECT doc_id, n_occ FROM ("
        "SELECT doc_id, CAST(len(list_filter(range(1, len(l)), "
        f"i -> l[i] = '{t1}' AND l[i+1] = '{t2}')) AS BIGINT) AS n_occ "
        "FROM (SELECT doc_id, string_split(text, ' ') AS l "
        "FROM documents WHERE text IS NOT NULL)"
        ") WHERE n_occ >= 1"
    )


def source_js_divergence(sf_dir: str, src_a: str = "src0",
                         src_b: str = "src1"):
    """Jensen-Shannon divergence between two sources' token unigram
    distributions — the symmetric, always-finite corpus-similarity
    statistic (0 = identical distributions, ln 2 = disjoint support),
    complementing the bucket-level PSI drift monitor
    (:func:`analytics.source_drift_psi`) with a full-vocabulary
    comparison.  ONE row (n_tokens_a, n_tokens_b, n_shared, js) where
    n_tokens_* are distinct-token counts per source and js is NULL when
    either source has no tokens.

    Exactness: token counts flow through the vocabulary-bounded (token,
    na, nb) shuffle (per-batch pre-aggregation); the JS fold is
    ORDER-PINNED to ascending token with every element evaluated in the
    oracle's exact op order — p = CAST/CAST division, m = 0.5*(p + q),
    term = 0.5*(p*ln(p/m)) with zero-count terms exactly 0.0 — using
    math.log (C libm, same as DuckDB ln).  At web scale the final fold
    is vocabulary-sized, the same bound every vocab op here carries.
    """
    import math

    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["text", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        src = batch["source"]
        sel = pc.or_(pc.equal(src, src_a), pc.equal(src, src_b))
        sel = pc.fill_null(sel, False)
        batch = batch.filter(sel)
        empty = pa.table({
            "token": pa.array([], type=pa.string()),
            "na": pa.array([], type=pa.int64()),
            "nb": pa.array([], type=pa.int64()),
        })
        if not len(batch):
            return empty
        texts = _string_array(batch["text"])
        row_idx, codes, uniques, _, _ = _token_codes(texts, lower=True)
        if not len(codes):
            return empty
        is_a = np.asarray(pc.equal(batch["source"], src_a)
                          .to_numpy(zero_copy_only=False))[row_idx]
        k = len(uniques)
        na = np.bincount(codes[is_a], minlength=k).astype(np.int64)
        nb = np.bincount(codes[~is_a], minlength=k).astype(np.int64)
        return pa.table({
            "token": pa.array(uniques.tolist(), type=pa.string()),
            "na": pa.array(na),
            "nb": pa.array(nb),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None)
           .groupby("token").aggregate(Sum("na", alias_name="na"),
                                       Sum("nb", alias_name="nb")))

    def fold(batch: pa.Table) -> pa.Table:
        tok = np.asarray(batch["token"].to_pylist(), dtype=object)
        na = batch["na"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = batch["nb"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(tok, kind="stable")     # ascending token
        na, nb = na[order], nb[order]
        ta = int(na.sum())
        tb = int(nb.sum())
        ka = int((na > 0).sum())
        kb = int((nb > 0).sum())
        ks = int(((na > 0) & (nb > 0)).sum())
        js = None
        if ta > 0 and tb > 0:
            acc = 0.0
            fta, ftb = float(ta), float(tb)
            for a, b in zip(na.tolist(), nb.tolist()):
                p = float(a) / fta
                q = float(b) / ftb
                m = 0.5 * (p + q)
                el = 0.0
                if a > 0:
                    el = 0.5 * (p * math.log(p / m))
                if b > 0:
                    el = el + 0.5 * (q * math.log(q / m))
                acc += el
            js = float(round_half_away(np.float64(acc), 6))
        return pa.table({
            "n_tokens_a": pa.array([ka], type=pa.int64()),
            "n_tokens_b": pa.array([kb], type=pa.int64()),
            "n_shared": pa.array([ks], type=pa.int64()),
            "js": pa.array([js], type=pa.float64()),
        })

    return agg.repartition(1).map_batches(fold, batch_format="pyarrow",
                                          batch_size=None)


def source_js_divergence_sql(src_a: str = "src0",
                             src_b: str = "src1") -> str:
    """Oracle for :func:`source_js_divergence`: order-pinned list_reduce
    fold ascending token, zero-count terms exactly 0.0."""
    pa_ = "(CAST(na AS DOUBLE) / CAST(t.ta AS DOUBLE))"
    qb_ = "(CAST(nb AS DOUBLE) / CAST(t.tb AS DOUBLE))"
    mm_ = f"(0.5 * ({pa_} + {qb_}))"
    el = (f"(CASE WHEN na > 0 THEN 0.5 * ({pa_} * ln({pa_} / {mm_})) "
          f"ELSE 0.0 END + "
          f"CASE WHEN nb > 0 THEN 0.5 * ({qb_} * ln({qb_} / {mm_})) "
          f"ELSE 0.0 END)")
    return rf"""
WITH tok AS (SELECT source,
  unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x <> '')) AS token
  FROM documents WHERE source IN ('{src_a}', '{src_b}')),
cnt AS (SELECT token,
  CAST(count(*) FILTER (WHERE source = '{src_a}') AS BIGINT) AS na,
  CAST(count(*) FILTER (WHERE source = '{src_b}') AS BIGINT) AS nb
  FROM tok GROUP BY 1),
tot AS (SELECT CAST(coalesce(sum(na), 0) AS BIGINT) AS ta,
               CAST(coalesce(sum(nb), 0) AS BIGINT) AS tb,
               CAST(count(*) FILTER (WHERE na > 0) AS BIGINT) AS ka,
               CAST(count(*) FILTER (WHERE nb > 0) AS BIGINT) AS kb,
               CAST(count(*) FILTER (WHERE na > 0 AND nb > 0) AS BIGINT)
                 AS ks
        FROM cnt),
f AS (SELECT t.ka, t.kb, t.ks, t.ta, t.tb,
  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
    list({el} ORDER BY token)), (x, y) -> x + y) AS js
  FROM cnt CROSS JOIN tot t GROUP BY t.ka, t.kb, t.ks, t.ta, t.tb)
SELECT ka AS n_tokens_a, kb AS n_tokens_b, ks AS n_shared,
       CASE WHEN ta = 0 OR tb = 0 THEN NULL ELSE round(js, 6) END AS js
FROM f"""


def heaps_law(sf_dir: str, n_checkpoints: int = 10):
    """Heaps'-law fit of vocabulary growth — V(N) ~ K * N^beta over the
    corpus processed in ascending doc_id order: the companion statistic
    to :func:`analytics.zipf_slope` (natural text sits near beta ~ 0.5).
    ONE row (total_tokens, vocab_size, beta, k_coef) from a least-squares
    fit of ln(V_k) on ln(N_k) at ``n_checkpoints`` doc_id-range
    checkpoints t_k = dmin + ((dmax - dmin) * k) // n (pure int math,
    deterministic and rank-free — no quantile pass needed); checkpoints
    with N_k = 0 or V_k = 0 are excluded from the fit on both engines.
    beta/k_coef are NULL when fewer than 2 usable checkpoints or zero
    variance in ln(N).

    Scale shape: cumulative totals come from TWO vocabulary/checkpoint-
    bounded reductions — per-token first-occurrence doc (Min groupby on
    the token shuffle, the ngram_novelty core) bucketed by checkpoint,
    and per-batch token counts bucketed by doc checkpoint — then a
    10-row final fold.  Exactness: bucket assignment is the identical
    integer comparison sum on both engines; the regression moments are
    ORDER-PINNED sequential folds ascending checkpoint with math.log /
    libm parity (zipf_slope precedent).
    """
    import math

    from ray.data.aggregate import Max, Min, Sum

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    # checkpoint thresholds from exact int min/max of doc_id — its own
    # SINGLE-COLUMN projection so this pass never decodes the text
    # column (review finding; mapping over `ds` would re-read text)
    stats = read_table(sf_dir, "documents", columns=["doc_id"]) \
        .map_batches(lambda b: pa.table({"d": b["doc_id"]}),
                     batch_format="pyarrow", batch_size=None) \
        .aggregate(Min("d"), Max("d"))
    dmin = int(stats["min(d)"]) if stats["min(d)"] is not None else 0
    dmax = int(stats["max(d)"]) if stats["max(d)"] is not None else 0
    nck = n_checkpoints
    thr = [dmin + ((dmax - dmin) * k) // nck for k in range(1, nck + 1)]

    def bucket_of(doc: np.ndarray) -> np.ndarray:
        # smallest k with doc <= t_k, as the SQL-mirrorable comparison sum
        b = np.zeros(len(doc), dtype=np.int64)
        for t in thr[:-1]:
            b += (doc > t)
        return b

    def tok_partial(batch: pa.Table) -> pa.Table:
        texts = _string_array(batch["text"])
        doc = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        row_idx, codes, uniques, n_tok, _ = _token_codes(texts, lower=True)
        # per-token min doc in this batch
        first = np.full(len(uniques), np.iinfo(np.int64).max,
                        dtype=np.int64)
        np.minimum.at(first, codes, doc[row_idx])
        # per-checkpoint token counts in this batch
        bk = bucket_of(doc)
        cnt = np.zeros(nck, dtype=np.int64)
        np.add.at(cnt, bk, n_tok)
        t1 = pa.table({
            "token": pa.array(uniques.tolist(), type=pa.string()),
            "fdoc": pa.array(first),
            "b": pa.array(np.full(len(uniques), -1, dtype=np.int64)),
            "nt": pa.array(np.zeros(len(uniques), dtype=np.int64)),
        })
        t2 = pa.table({
            "token": pa.array([f"\x00ck{k}" for k in range(nck)],
                              type=pa.string()),
            "fdoc": pa.array(np.zeros(nck, dtype=np.int64)),
            "b": pa.array(np.arange(nck, dtype=np.int64)),
            "nt": pa.array(cnt),
        })
        return pa.concat_tables([t1, t2])

    # one shuffle: token rows (b = -1) reduce by Min(fdoc); checkpoint
    # rows (reserved \x00-prefixed keys, disjoint from real tokens which
    # never contain NUL) reduce by Sum(nt)
    agg = (ds.map_batches(tok_partial, batch_format="pyarrow",
                          batch_size=None)
           .groupby(["b", "token"])
           .aggregate(Min("fdoc", alias_name="fdoc"),
                      Sum("nt", alias_name="nt")))

    def fold(batch: pa.Table) -> pa.Table:
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        fdoc = batch["fdoc"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nt = batch["nt"].to_numpy(zero_copy_only=False).astype(np.int64)
        tok_rows = b < 0
        vb = np.zeros(nck, dtype=np.int64)
        if tok_rows.any():
            np.add.at(vb, bucket_of(fdoc[tok_rows]), 1)
        nb = np.zeros(nck, dtype=np.int64)
        ck = ~tok_rows
        np.add.at(nb, b[ck], nt[ck])
        v_cum = np.cumsum(vb)
        n_cum = np.cumsum(nb)
        total = int(n_cum[-1]) if nck else 0
        vocab = int(v_cum[-1]) if nck else 0
        use = [(int(n_cum[k]), int(v_cum[k])) for k in range(nck)
               if n_cum[k] > 0 and v_cum[k] > 0]
        beta = kc = None
        if len(use) >= 2:
            sx = sy = sxx = sxy = 0.0
            for nk, vk in use:                 # ascending checkpoint
                x = math.log(float(nk))
                y = math.log(float(vk))
                sx += x
                sy += y
                sxx += x * x
                sxy += x * y
            m = float(len(use))
            den = m * sxx - sx * sx
            if den != 0.0:
                sl = (m * sxy - sx * sy) / den
                beta = float(round_half_away(np.float64(sl), 6))
                kc = float(round_half_away(np.float64(
                    math.exp((sy - sl * sx) / m)), 6))
        return pa.table({
            "total_tokens": pa.array([total], type=pa.int64()),
            "vocab_size": pa.array([vocab], type=pa.int64()),
            "beta": pa.array([beta], type=pa.float64()),
            "k_coef": pa.array([kc], type=pa.float64()),
        })

    return agg.repartition(1).map_batches(fold, batch_format="pyarrow",
                                          batch_size=None)


def heaps_law_sql(n_checkpoints: int = 10) -> str:
    """Oracle for :func:`heaps_law`: cumulative token/vocab counts at the
    same int-math checkpoints, order-pinned regression fold ascending k;
    the slope expression is inlined twice (beta and k_coef) exactly as
    the engine evaluates it."""
    n = n_checkpoints
    sl = "((mf * sxy - sx * sy) / (mf * sxx - sx * sx))"
    return rf"""
WITH mm AS (SELECT CAST(min(doc_id) AS BIGINT) AS dmin,
                   CAST(max(doc_id) AS BIGINT) AS dmax FROM documents),
thr AS (SELECT CAST(r.k AS BIGINT) AS k,
               dmin + ((dmax - dmin) * r.k) // {n} AS t
        FROM mm CROSS JOIN range(1, {n + 1}) r(k)),
tok AS (SELECT doc_id,
  unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x <> '')) AS token FROM documents),
fo AS (SELECT token, min(doc_id) AS fdoc FROM tok GROUP BY 1),
ck AS (SELECT k, t,
  (SELECT CAST(count(*) AS BIGINT) FROM tok WHERE doc_id <= t) AS nk,
  (SELECT CAST(count(*) AS BIGINT) FROM fo WHERE fdoc <= t) AS vk
  FROM thr),
u AS (SELECT k, ln(CAST(nk AS DOUBLE)) AS x, ln(CAST(vk AS DOUBLE)) AS y
      FROM ck WHERE nk > 0 AND vk > 0),
m AS (SELECT CAST(count(*) AS BIGINT) AS mu,
             CAST(count(*) AS DOUBLE) AS mf,
  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(x ORDER BY k)),
              (a, b) -> a + b) AS sx,
  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(y ORDER BY k)),
              (a, b) -> a + b) AS sy,
  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(x * x ORDER BY k)),
              (a, b) -> a + b) AS sxx,
  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(x * y ORDER BY k)),
              (a, b) -> a + b) AS sxy
  FROM u)
SELECT (SELECT nk FROM ck WHERE k = {n}) AS total_tokens,
       (SELECT vk FROM ck WHERE k = {n}) AS vocab_size,
       CASE WHEN mu < 2 OR mf * sxx - sx * sx = 0.0 THEN NULL ELSE
         round({sl}, 6) END AS beta,
       CASE WHEN mu < 2 OR mf * sxx - sx * sx = 0.0 THEN NULL ELSE
         round(exp((sy - {sl} * sx) / mf), 6) END AS k_coef
FROM m"""


def source_vocab_jaccard(sf_dir: str):
    """Pairwise vocabulary overlap between sources — the corpus-similarity
    matrix: for every source pair (a < b), the exact Jaccard of their
    distinct-token sets (n_shared / (|A| + |B| - n_shared)).  Output:
    (src_a, src_b, n_shared, jaccard), pairs with n_shared >= 1 only.

    Scale shape: the event_cooccurrence bitmask pattern on the token
    axis — ONE distinct (token, source) shuffle collapses to per-token
    source bitmasks (source vocabulary capped at 62, the int64 mask
    budget; raising beats corrupting), whose histogram is at most
    min(#distinct masks, vocab) rows; per-source set sizes and all
    pairwise intersections then come from the mask histogram in one
    bounded final task with exact integers.  The single float division
    per pair runs in the oracle's CAST-then-divide order.
    """
    from ray.data.aggregate import Count, Sum

    ds = read_table(sf_dir, "documents", columns=["text", "source"])

    src_ds = (ds.select_columns(["source"])
              .map_batches(lambda b: b.filter(
                  pc.is_valid(b["source"])),
                  batch_format="pyarrow", batch_size=None)
              .groupby("source").aggregate(Count()))
    sources = sorted(r["source"] for r in src_ds.take_all())
    k = len(sources)
    if k > 62:
        raise ValueError(
            f"source_vocab_jaccard: {k} sources exceed the 62-bit int64 "
            "mask budget; route the distinct (token, source) table "
            "through the generic pair self-join instead")
    sarr = np.array(sources, dtype=object)

    def pair_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "token": pa.array([], type=pa.string()),
            "bit": pa.array([], type=pa.int64()),
        })
        batch = batch.filter(pc.is_valid(batch["source"]))
        if not len(batch):
            return empty
        texts = _string_array(batch["text"])
        row_idx, codes, uniques, _, _ = _token_codes(texts, lower=True)
        if not len(codes):
            return empty
        sidx = np.searchsorted(sarr, np.asarray(
            batch["source"].to_pylist(), dtype=object))[row_idx]
        packed = codes * k + sidx
        u = np.unique(packed)
        return pa.table({
            "token": pa.array(uniques[(u // k)].tolist(),
                              type=pa.string()),
            "bit": pa.array((np.int64(1) << (u % k)).astype(np.int64)),
        })

    masks = (ds.map_batches(pair_partial, batch_format="pyarrow",
                            batch_size=None)
             .groupby(["token", "bit"]).aggregate(Count())
             .groupby("token").aggregate(Sum("bit", alias_name="mask")))

    def mask_hist(batch: pa.Table) -> pa.Table:
        m = batch["mask"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(m, return_counts=True)
        return pa.table({"mask": pa.array(u),
                         "mn": pa.array(c.astype(np.int64))})

    hist = (masks.map_batches(mask_hist, batch_format="pyarrow",
                              batch_size=None)
            .groupby("mask").aggregate(Sum("mn", alias_name="n")))

    def pairs(batch: pa.Table) -> pa.Table:
        m = batch["mask"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        has = [((m >> a) & 1).astype(bool) for a in range(k)]
        size = [int(n[has[a]].sum()) for a in range(k)]
        rows_a, rows_b, rows_i, rows_j = [], [], [], []
        for a in range(k):
            for b in range(a + 1, k):
                inter = int(n[has[a] & has[b]].sum())
                if inter == 0:
                    continue
                union = size[a] + size[b] - inter
                rows_a.append(sources[a])
                rows_b.append(sources[b])
                rows_i.append(inter)
                rows_j.append(float(round_half_away(np.float64(
                    float(inter) / float(union)), 6)))
        return pa.table({
            "src_a": pa.array(rows_a, type=pa.string()),
            "src_b": pa.array(rows_b, type=pa.string()),
            "n_shared": pa.array(rows_i, type=pa.int64()),
            "jaccard": pa.array(rows_j, type=pa.float64()),
        })

    return hist.repartition(1).map_batches(pairs, batch_format="pyarrow",
                                           batch_size=None)


SOURCE_VOCAB_JACCARD_SQL = r"""
WITH tok AS (SELECT source,
  unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x <> '')) AS token
  FROM documents WHERE source IS NOT NULL),
ts AS (SELECT DISTINCT token, source FROM tok),
per AS (SELECT source, CAST(count(*) AS BIGINT) AS sz FROM ts GROUP BY 1),
inter AS (SELECT a.source AS src_a, b.source AS src_b,
                 CAST(count(*) AS BIGINT) AS n_shared
          FROM ts a JOIN ts b ON a.token = b.token AND a.source < b.source
          GROUP BY 1, 2)
SELECT i.src_a, i.src_b, i.n_shared,
       round(CAST(i.n_shared AS DOUBLE)
             / CAST(pa.sz + pb.sz - i.n_shared AS DOUBLE), 6) AS jaccard
FROM inter i JOIN per pa ON pa.source = i.src_a
JOIN per pb ON pb.source = i.src_b"""


def lexical_simpson(sf_dir: str, lower: bool = True):
    """Per-language Simpson repeat index over the token distribution:
    the probability two tokens drawn without replacement are identical —
    (lang, n_tokens, vocab, simpson), simpson = sum c*(c-1) / (N*(N-1)).
    High values mark repetitive/templated corpora (the collection-level
    cousin of repetition_stats' per-document ratios).

    Exactness: per-(lang, token) counts come from ONE vocabulary-sized
    shuffle (same partial as vocab_top_k, keyed by lang too); the
    c*(c-1) sum is folded per-batch in exact Python big ints and rides
    wrap-safe hi/lo-split int64 lanes (at 100 TB a hot token's c^2 is
    ~1e18 and the per-lang sum would wrap int64; HUGEINT mirrors it in
    SQL); the only float op is the final mirrored division.  NULL lang
    drops on both engines; N < 2 yields NULL like the SQL CASE.
    """
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        lang = batch["lang"].to_pandas()
        ok = lang.notna().to_numpy()
        texts = _string_array(batch["text"]).filter(pa.array(ok))
        lang = lang[ok].astype(str).to_numpy()
        row_idx, codes, uniques, _, _ = _token_codes(texts, lower=lower)
        if not len(codes):
            return pa.table({"lang": pa.array([], type=pa.string()),
                             "token": pa.array([], type=pa.string()),
                             "pn": pa.array([], type=pa.int64())})
        # count per (row-lang, token): lang factorizes via row_idx
        lcodes, luniq = pd.factorize(pd.Series(lang[row_idx]))
        key = lcodes.astype(np.int64) * np.int64(len(uniques)) + codes
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "lang": pa.array(luniq[(uk // len(uniques)).astype(np.int64)],
                             type=pa.string()),
            "token": pa.array(uniques[(uk % len(uniques)).astype(np.int64)]
                              .tolist(), type=pa.string()),
            "pn": pa.array(cnt.astype(np.int64)),
        })

    cnt = (ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None)
           .groupby(["lang", "token"])
           .aggregate(Sum("pn", alias_name="c")))

    def moments(batch: pa.Table) -> pa.Table:
        lang = batch["lang"].to_pandas().astype(str).to_numpy()
        c = batch["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        luniq, lcode = np.unique(lang, return_inverse=True)
        rows = {"lang": [], "v": [], "nh": [], "nl": [], "qh": [],
                "ql": []}
        for i, lg in enumerate(luniq.tolist()):
            sel = lcode == i
            cc = c[sel]
            n = int(cc.sum())
            q = sum(int(x) * (int(x) - 1) for x in cc)
            rows["lang"].append(lg)
            rows["v"].append(int(sel.sum()))
            rows["nh"].append(n >> 31)
            rows["nl"].append(n & ((1 << 31) - 1))
            rows["qh"].append(q >> 31)
            rows["ql"].append(q & ((1 << 31) - 1))
        return pa.table({
            "lang": pa.array(rows["lang"], type=pa.string()),
            "v": pa.array(rows["v"], type=pa.int64()),
            "nh": pa.array(rows["nh"], type=pa.int64()),
            "nl": pa.array(rows["nl"], type=pa.int64()),
            "qh": pa.array(rows["qh"], type=pa.int64()),
            "ql": pa.array(rows["ql"], type=pa.int64()),
        })

    m = (cnt.map_batches(moments, batch_format="pyarrow",
                         batch_size=None)
         .groupby("lang")
         .aggregate(Sum("v", alias_name="vocab"),
                    Sum("nh"), Sum("nl"), Sum("qh"), Sum("ql"))) \
        .to_pandas().sort_values("lang", ignore_index=True)

    out = {"lang": [], "n_tokens": [], "vocab": [], "simpson": []}
    for _, r in m.iterrows():
        n = (int(r["sum(nh)"]) << 31) + int(r["sum(nl)"])
        q = (int(r["sum(qh)"]) << 31) + int(r["sum(ql)"])
        out["lang"].append(r["lang"])
        out["n_tokens"].append(n)
        out["vocab"].append(int(r["vocab"]))
        out["simpson"].append(
            None if n < 2 else float(round_half_away(np.float64(
                float(q) / float(n * (n - 1))))))
    return ray.data.from_arrow(pa.table({
        "lang": pa.array(out["lang"], type=pa.string()),
        "n_tokens": pa.array(out["n_tokens"], type=pa.int64()),
        "vocab": pa.array(out["vocab"], type=pa.int64()),
        "simpson": pa.array(out["simpson"], type=pa.float64()),
    }))


LEXICAL_SIMPSON_SQL = r"""
WITH tok AS (SELECT lang,
                    unnest(list_filter(regexp_split_to_array(
                      lower(coalesce(text, '')), '\s+'), x -> x <> ''))
                      AS token
             FROM documents WHERE lang IS NOT NULL),
cnt AS (SELECT lang, token, CAST(count(*) AS HUGEINT) AS c
        FROM tok GROUP BY 1, 2),
m AS (SELECT lang, CAST(count(*) AS BIGINT) AS vocab, sum(c) AS n,
             sum(c * (c - 1)) AS q
      FROM cnt GROUP BY 1)
SELECT lang, CAST(n AS BIGINT) AS n_tokens, vocab,
       CASE WHEN n < 2 THEN NULL ELSE
         round(CAST(q AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE), 6) END
         AS simpson
FROM m ORDER BY 1"""


def anagram_groups(sf_dir: str, lower: bool = True, min_tokens: int = 1):
    """Anagram classes of the corpus vocabulary: distinct tokens grouped
    by their sorted-codepoint signature — (signature, n_tokens,
    n_occurrences) for classes with at least ``min_tokens`` distinct
    members.  A vocabulary-normalization probe (OCR shuffles, leet
    variants) exercising a derived-key regroup of an already-shuffled
    aggregate.  The default keeps every class (min_tokens=1): the
    synthetic corpus vocabulary is anagram-free, so a >= 2 cut would
    gate a vacuously-empty result.

    Scale plan: token counts come from the vocabulary-sized shuffle;
    signatures are computed per VOCABULARY row (never per corpus token)
    in the post-aggregate pass, and the signature regroup moves
    vocabulary-cardinality rows once more.  Sorting is by raw codepoint
    (Python sorted == DuckDB list_sort over single-char strings: UTF-8
    memcmp preserves codepoint order).
    """
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        texts = _string_array(batch["text"])
        _, codes, uniques, _, _ = _token_codes(texts, lower=lower)
        cnt = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
        return pa.table({
            "token": pa.array(uniques.tolist(), type=pa.string()),
            "pn": pa.array(cnt),
        })

    vocab = (ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=None)
             .groupby("token").aggregate(Sum("pn", alias_name="c")))

    def sig_partial(batch: pa.Table) -> pa.Table:
        toks = batch["token"].to_pandas().astype(str).tolist()
        c = batch["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        sigs = ["".join(sorted(t)) for t in toks]  # vocab-sized, not hot
        df = pd.DataFrame({"s": sigs, "c": c}).groupby("s", sort=False) \
            .agg(nt=("c", "size"), no=("c", "sum")).reset_index()
        return pa.table({
            "signature": pa.array(df["s"], type=pa.string()),
            "nt": pa.array(df["nt"].to_numpy().astype(np.int64)),
            "no": pa.array(df["no"].to_numpy().astype(np.int64)),
        })

    g = (vocab.map_batches(sig_partial, batch_format="pyarrow",
                           batch_size=None)
         .groupby("signature")
         .aggregate(Sum("nt", alias_name="n_tokens"),
                    Sum("no", alias_name="n_occurrences")))

    def cut(batch: pa.Table) -> pa.Table:
        keep = pc.greater_equal(batch["n_tokens"],
                                pa.scalar(min_tokens, type=pa.int64()))
        return batch.filter(keep)

    return g.map_batches(cut, batch_format="pyarrow", batch_size=None)


def anagram_groups_sql(min_tokens: int = 1) -> str:
    """Oracle for :func:`anagram_groups` — list_sort over single-char
    splits mirrors the engine's codepoint sort."""
    return rf"""
WITH tok AS (SELECT unnest(list_filter(regexp_split_to_array(
               lower(coalesce(text, '')), '\s+'), x -> x <> '')) AS token
             FROM documents),
cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS c
        FROM tok GROUP BY 1),
s AS (SELECT array_to_string(list_sort(string_split(token, '')), '')
        AS signature, c
      FROM cnt)
SELECT signature, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(c) AS BIGINT) AS n_occurrences
FROM s GROUP BY 1 HAVING count(*) >= {min_tokens} ORDER BY 1"""


def char_entropy(sf_dir: str):
    """Per-language Shannon entropy of the character (codepoint)
    distribution — (lang, n_chars, alphabet, entropy) in nats; the
    corpus-level "is this text natural?" signal complementing
    zipf_slope's token-rank fit (natural languages sit near 4-5 nats,
    random bytes near 5.5).

    Exactness: codepoint counts per (lang, cp) come from the
    alphabet-bounded shuffle (the _codepoint_matrix vectorized extract;
    NUL codepoints are excluded by contract — they are the matrix pad
    sentinel, mirrored by the oracle's chr(0) filter); entropy is the
    ORDER-PINNED float fold -sum (c/N) ln(c/N) ascending codepoint,
    mirrored by list_reduce over the cp-ordered term list.  NULL lang
    drops on both engines.
    """
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        lang = batch["lang"].to_pandas()
        ok = lang.notna().to_numpy()
        texts = _string_array(batch["text"]).filter(pa.array(ok))
        lang = lang[ok].astype(str).to_numpy()
        empty = pa.table({"lang": pa.array([], type=pa.string()),
                          "cp": pa.array([], type=pa.int64()),
                          "pn": pa.array([], type=pa.int64())})
        if len(lang) == 0:
            return empty
        lcodes, luniq = pd.factorize(pd.Series(lang))
        # chunk the dense (rows x longest-doc) matrix like fingerprint:
        # one megabyte-scale document in a 16k-row block must not
        # allocate rows x 1e6 int64 cells (review finding)
        CH = 2048
        uks, cnts = [], []
        for s0 in range(0, len(lang), CH):
            cp = _codepoint_matrix(texts.slice(s0, CH))
            if cp.size == 0:
                continue
            rows = np.repeat(
                lcodes[s0:s0 + cp.shape[0]].astype(np.int64),
                cp.shape[1])
            flat = cp.ravel()
            keep = flat > 0               # 0 == pad sentinel (and NUL)
            u_, c_ = np.unique(rows[keep] * (np.int64(1) << 21)
                               + flat[keep], return_counts=True)
            uks.append(u_)
            cnts.append(c_.astype(np.int64))
        if not uks:
            return empty
        allk = np.concatenate(uks)
        allc = np.concatenate(cnts)
        order = np.argsort(allk, kind="stable")
        allk, allc = allk[order], allc[order]
        starts = np.flatnonzero(np.concatenate(
            [[True], allk[1:] != allk[:-1]]))
        uk = allk[starts]
        cnt = np.add.reduceat(allc, starts)
        return pa.table({
            "lang": pa.array(luniq[(uk >> 21).astype(np.int64)],
                             type=pa.string()),
            "cp": pa.array((uk & ((1 << 21) - 1)).astype(np.int64)),
            "pn": pa.array(cnt.astype(np.int64)),
        })

    m = (ds.map_batches(partial, batch_format="pyarrow",
                        batch_size=None)
         .groupby(["lang", "cp"])
         .aggregate(Sum("pn", alias_name="c"))).to_pandas()

    out = {"lang": [], "n_chars": [], "alphabet": [], "entropy": []}
    for lg, grp in m.groupby("lang", sort=True):
        grp = grp.sort_values("cp")
        c = grp["c"].to_numpy().astype(np.int64)
        n = int(c.sum())
        acc = np.float64(0.0)
        nf = np.float64(float(n))
        for x in c.tolist():              # alphabet-sized, not hot
            p = np.float64(float(x)) / nf
            acc = acc + p * np.log(p)
        out["lang"].append(lg)
        out["n_chars"].append(n)
        out["alphabet"].append(len(c))
        out["entropy"].append(float(round_half_away(-acc)))
    return ray.data.from_arrow(pa.table({
        "lang": pa.array(out["lang"], type=pa.string()),
        "n_chars": pa.array(out["n_chars"], type=pa.int64()),
        "alphabet": pa.array(out["alphabet"], type=pa.int64()),
        "entropy": pa.array(out["entropy"], type=pa.float64()),
    }))


CHAR_ENTROPY_SQL = r"""
WITH ch AS (SELECT lang,
                   CAST(unicode(unnest(list_filter(
                     regexp_split_to_array(coalesce(text, ''), ''),
                     x -> x <> '' AND x <> chr(0)))) AS BIGINT) AS cp
            FROM documents WHERE lang IS NOT NULL),
cnt AS (SELECT lang, cp, CAST(count(*) AS BIGINT) AS c
        FROM ch GROUP BY 1, 2),
tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS alphabet
        FROM cnt GROUP BY 1),
m AS (SELECT cnt.lang, t.n, t.alphabet,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list((CAST(c AS DOUBLE) / CAST(t.n AS DOUBLE))
                    * ln(CAST(c AS DOUBLE) / CAST(t.n AS DOUBLE))
                    ORDER BY cp)), (a, b) -> a + b) AS acc
      FROM cnt JOIN tot t USING (lang)
      GROUP BY cnt.lang, t.n, t.alphabet)
SELECT lang, n AS n_chars, alphabet, round(-acc, 6) AS entropy
FROM m ORDER BY 1"""


def token_len_stats(sf_dir: str, lower: bool = True):
    """Per-language token-length profile — (lang, n_tokens, avg_len,
    max_len); codepoint lengths of whitespace tokens.  The quick
    tokenizer-sanity probe (a drifting avg_len flags segmentation or
    encoding regressions upstream).

    Exactness: per-batch (lang: count, length-sum, length-max) partials
    feed one lang-cardinality groupby; the length sum is int64-safe
    (len < 2^20, rows < 2^43 per lang at 100 TB) and the only float op
    is the mirrored avg division.  NULL lang drops on both engines.
    """
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Max, Sum

    ds = read_table(sf_dir, "documents", columns=["lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        lang = batch["lang"].to_pandas()
        ok = lang.notna().to_numpy()
        texts = _string_array(batch["text"]).filter(pa.array(ok))
        lang = lang[ok].astype(str).to_numpy()
        row_idx, _, _, _, flat = _token_codes(texts, lower=lower)
        z = np.zeros(0, dtype=np.int64)
        if not len(row_idx):
            return pa.table({"lang": pa.array([], type=pa.string()),
                             "pn": z, "ps": z, "pm": z})
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        lcodes, luniq = pd.factorize(pd.Series(lang[row_idx]))
        k = len(luniq)
        pn = np.bincount(lcodes, minlength=k).astype(np.int64)
        ps = np.zeros(k, dtype=np.int64)
        np.add.at(ps, lcodes, lens)
        pm = np.zeros(k, dtype=np.int64)
        np.maximum.at(pm, lcodes, lens)
        return pa.table({
            "lang": pa.array(luniq, type=pa.string()),
            "pn": pa.array(pn), "ps": pa.array(ps), "pm": pa.array(pm),
        })

    m = (ds.map_batches(partial, batch_format="pyarrow",
                        batch_size=None)
         .groupby("lang")
         .aggregate(Sum("pn", alias_name="n_tokens"),
                    Sum("ps", alias_name="len_sum"),
                    Max("pm", alias_name="max_len"))).to_pandas() \
        .sort_values("lang", ignore_index=True)
    avg = np.array([
        float(round_half_away(np.float64(float(s_) / float(n_))))
        if n_ else None
        for s_, n_ in zip(m["len_sum"], m["n_tokens"])], dtype=object) \
        if len(m) else np.empty(0, object)
    import ray.data as _rd
    return _rd.from_arrow(pa.table({
        "lang": pa.array(m["lang"], type=pa.string()),
        "n_tokens": pa.array(m["n_tokens"].to_numpy().astype(np.int64)
                             if len(m) else np.empty(0, np.int64)),
        "avg_len": pa.array(avg.tolist(), type=pa.float64()),
        "max_len": pa.array(m["max_len"].to_numpy().astype(np.int64)
                            if len(m) else np.empty(0, np.int64)),
    }))


TOKEN_LEN_STATS_SQL = r"""
WITH tok AS (SELECT lang,
                    unnest(list_filter(regexp_split_to_array(
                      lower(coalesce(text, '')), '\s+'), x -> x <> ''))
                      AS token
             FROM documents WHERE lang IS NOT NULL)
SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
       round(CAST(sum(length(token)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS avg_len,
       CAST(max(length(token)) AS BIGINT) AS max_len
FROM tok GROUP BY 1 ORDER BY 1"""


def langid_mismatch_by_source(sf_dir: str):
    """Label-quality drill-down: per source, the share of documents
    whose labeled ``lang`` disagrees with the marker-word LangId
    prediction — (source, n_docs, n_mismatch, mismatch_rate).  The
    per-provenance slice of :func:`langid_confusion` (a single noisy
    source shows up here long before it moves the global matrix).

    One streaming pass (LangId fuses with the scan); mismatch uses
    IS-DISTINCT-FROM semantics (NULL label != prediction); only
    (source)-bounded count partials shuffle; NULL source is its own
    group via the sentinel key, restored in the finalize.
    """
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents",
                    columns=["doc_id", "text", "lang", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        pred = lang_id_batch(batch)["lang_pred"].to_pandas()
        lab = batch["lang"].to_pandas()
        src = batch["source"].to_pandas()
        gk = src.where(src.notna(), "\x00").astype(str)
        mism = ~(lab.eq(pred) | (lab.isna() & pred.isna()))
        g = pd.DataFrame({"gk": gk, "m": mism.astype(np.int64)}) \
            .groupby("gk", sort=False) \
            .agg(pn=("m", "size"), pm=("m", "sum")).reset_index()
        return pa.table({
            "gk": pa.array(g["gk"], type=pa.string()),
            "pn": pa.array(g["pn"].to_numpy().astype(np.int64)),
            "pm": pa.array(g["pm"].to_numpy().astype(np.int64)),
        })

    m = (ds.map_batches(partial, batch_format="pyarrow",
                        batch_size=None)
         .groupby("gk")
         .aggregate(Sum("pn", alias_name="n_docs"),
                    Sum("pm", alias_name="n_mismatch"))).to_pandas() \
        .sort_values("gk", ignore_index=True)
    rate = [float(round_half_away(np.float64(
        float(int(x)) / float(int(n)))))
        for x, n in zip(m["n_mismatch"], m["n_docs"])] if len(m) else []
    src_out = m["gk"].where(m["gk"] != "\x00", None) if len(m) else []
    import ray.data as _rd
    return _rd.from_arrow(pa.table({
        "source": pa.array(src_out, type=pa.string()),
        "n_docs": pa.array(m["n_docs"].to_numpy().astype(np.int64)
                           if len(m) else np.empty(0, np.int64)),
        "n_mismatch": pa.array(m["n_mismatch"].to_numpy()
                               .astype(np.int64) if len(m)
                               else np.empty(0, np.int64)),
        "mismatch_rate": pa.array(rate, type=pa.float64()),
    }))


def search_rank(sf_dir: str, terms=("data", "spark", "vector"),
                k: int = 20, lower: bool = True):
    """Fixed-query TF-IDF retrieval: score every document against a
    ``terms`` query (score = sum over matched terms of tf * ln(N/df))
    and return the top ``k`` — (doc_id, score), score DESC then doc_id.
    The minimal search-engine shape over the same tokenizer as
    token_doc_freq / tfidf_top3.

    Exactness: df and N are exact integers from one pass; idf =
    ln(N/df) is the identical double chain; per-doc scores fold over
    PRESENT terms in ascending term order (mirroring the oracle's
    list_reduce ORDER BY token), rank on the ROUNDED score with doc_id
    tie-break, and the two-level local top-k keeps only k rows per
    batch in flight.
    """
    import math

    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..state.bcast import cached_get

    terms = sorted(set(terms))
    T = len(terms)

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def tf_matrix(batch: pa.Table):
        texts = _string_array(batch["text"])
        row_idx, codes, uniques, _, _ = _token_codes(texts, lower=lower)
        n = len(texts)
        tf = np.zeros((n, T), dtype=np.int64)
        upos = {u: i for i, u in enumerate(uniques.tolist())}
        for ti, t in enumerate(terms):
            c = upos.get(t)
            if c is None:
                continue
            sel = codes == c
            np.add.at(tf[:, ti], row_idx[sel], 1)
        return tf

    def df_partial(batch: pa.Table) -> pa.Table:
        tf = tf_matrix(batch)
        return pa.table({
            "ti": pa.array(np.arange(T + 1, dtype=np.int64)),
            "pn": pa.array(np.concatenate(
                [(tf > 0).sum(axis=0).astype(np.int64),
                 [np.int64(tf.shape[0])]])),
        })

    stats = (ds.map_batches(df_partial, batch_format="pyarrow",
                            batch_size=None)
             .groupby("ti").aggregate(Sum("pn", alias_name="n"))) \
        .to_pandas().sort_values("ti", ignore_index=True)
    N = int(stats["n"].iloc[T])
    df = stats["n"].to_numpy()[:T].astype(np.int64)
    idf = np.array([math.log(float(N) / float(d)) if d else 0.0
                    for d in df], dtype=np.float64)
    idf_ref = ray.put(idf)

    def score(batch: pa.Table) -> pa.Table:
        w = cached_get(idf_ref)
        tf = tf_matrix(batch)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sc = np.zeros(len(ids), dtype=np.float64)
        for ti in range(T):      # ascending term order, sequential adds
            hit = tf[:, ti] > 0
            sc[hit] = sc[hit] + tf[hit, ti].astype(np.float64) * w[ti]
        keep = (tf > 0).any(axis=1)
        ids, sc = ids[keep], round_half_away(sc[keep])
        order = np.lexsort((ids, -sc))[:k]
        return pa.table({"doc_id": pa.array(ids[order]),
                         "score": pa.array(sc[order])})

    def topk(batch: pa.Table) -> pa.Table:
        if not len(batch):
            return batch
        ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sc = batch["score"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sc))[:k]
        return batch.take(pa.array(order))

    return (ds.map_batches(score, batch_format="pyarrow",
                           batch_size=None)
            .repartition(1)
            .map_batches(topk, batch_format="pyarrow", batch_size=None))


def search_rank_sql(terms=("data", "spark", "vector"),
                    k: int = 20) -> str:
    """Oracle for :func:`search_rank` — ordered term fold, rank on the
    rounded score."""
    terms = sorted(set(terms))
    tl = ", ".join(f"'{t}'" for t in terms)
    return rf"""
WITH tok AS (SELECT doc_id,
                    unnest(list_filter(regexp_split_to_array(
                      lower(coalesce(text, '')), '\s+'), x -> x <> ''))
                      AS token
             FROM documents),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
df AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       FROM tok WHERE token IN ({tl}) GROUP BY 1),
tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
       FROM tok WHERE token IN ({tl}) GROUP BY 1, 2),
sc AS (SELECT tf.doc_id,
              round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list(CAST(tf.tf AS DOUBLE)
                     * ln(CAST(nn.n AS DOUBLE) / CAST(df.df AS DOUBLE))
                     ORDER BY tf.token)), (a, b) -> a + b), 6) AS score
       FROM tf JOIN df USING (token) CROSS JOIN nn
       GROUP BY tf.doc_id, nn.n)
SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT {k}"""


def search_bm25(sf_dir: str, terms=("data", "spark", "vector"),
                k: int = 20, k1: float = 1.25, b: float = 0.75,
                lower: bool = True):
    """BM25 retrieval for a fixed query: the production-grade scoring
    next to :func:`search_rank`'s raw TF-IDF — per matched term,
    idf * tf*(k1+1) / (tf + k1*(1 - b + b*len/avglen)) with document
    length saturation; top ``k`` (doc_id, score).

    Exactness: df, N, total token count (hence avglen = total/N, one
    double division of exact ints) come from one pass; per-doc scores
    fold over PRESENT terms ascending (list_reduce mirror), the BM25
    term is one arithmetic chain evaluated in the identical op order,
    rank is on the ROUNDED score with doc_id tie-break.  k1/b must be
    exact binary fractions (1.25 / 0.75 defaults).
    """
    import math

    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..state.bcast import cached_get

    terms = sorted(set(terms))
    T = len(terms)

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def matrices(batch: pa.Table):
        texts = _string_array(batch["text"])
        row_idx, codes, uniques, n_tokens, _ = _token_codes(
            texts, lower=lower)
        n = len(texts)
        tf = np.zeros((n, T), dtype=np.int64)
        upos = {u: i for i, u in enumerate(uniques.tolist())}
        for ti, t in enumerate(terms):
            c = upos.get(t)
            if c is None:
                continue
            sel = codes == c
            np.add.at(tf[:, ti], row_idx[sel], 1)
        return tf, n_tokens

    def stats_partial(batch: pa.Table) -> pa.Table:
        tf, n_tokens = matrices(batch)
        return pa.table({
            "ti": pa.array(np.arange(T + 2, dtype=np.int64)),
            "pn": pa.array(np.concatenate(
                [(tf > 0).sum(axis=0).astype(np.int64),
                 [np.int64(tf.shape[0])],
                 [np.int64(int(n_tokens.sum()))]])),
        })

    st = (ds.map_batches(stats_partial, batch_format="pyarrow",
                         batch_size=None)
          .groupby("ti").aggregate(Sum("pn", alias_name="n"))) \
        .to_pandas().sort_values("ti", ignore_index=True)
    N = int(st["n"].iloc[T])
    total_tok = int(st["n"].iloc[T + 1])
    df = st["n"].to_numpy()[:T].astype(np.int64)
    idf = np.array([math.log(float(N) / float(d)) if d else 0.0
                    for d in df], dtype=np.float64)
    avglen = np.float64(float(total_tok)) / np.float64(float(N))
    bc = ray.put((idf, avglen))
    K1 = np.float64(k1)
    B = np.float64(b)

    def score(batch: pa.Table) -> pa.Table:
        w, avg = cached_get(bc)
        tf, n_tokens = matrices(batch)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        dl = n_tokens.astype(np.float64)
        norm = K1 * (np.float64(1.0) - B + B * dl / avg)
        sc = np.zeros(len(ids), dtype=np.float64)
        for ti in range(T):      # ascending term order, sequential adds
            hit = tf[:, ti] > 0
            tfd = tf[hit, ti].astype(np.float64)
            sc[hit] = sc[hit] + w[ti] * (tfd * (K1 + np.float64(1.0))) \
                / (tfd + norm[hit])
        keep = (tf > 0).any(axis=1)
        ids, sc = ids[keep], round_half_away(sc[keep])
        order = np.lexsort((ids, -sc))[:k]
        return pa.table({"doc_id": pa.array(ids[order]),
                         "score": pa.array(sc[order])})

    def topk(batch: pa.Table) -> pa.Table:
        if not len(batch):
            return batch
        ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sc = batch["score"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sc))[:k]
        return batch.take(pa.array(order))

    return (ds.map_batches(score, batch_format="pyarrow",
                           batch_size=None)
            .repartition(1)
            .map_batches(topk, batch_format="pyarrow", batch_size=None))


def search_bm25_sql(terms=("data", "spark", "vector"), k: int = 20,
                    k1: float = 1.25, b: float = 0.75) -> str:
    """Oracle for :func:`search_bm25` — the identical BM25 chain with
    the ordered term fold."""
    terms = sorted(set(terms))
    tl = ", ".join(f"'{t}'" for t in terms)
    return rf"""
WITH tok AS (SELECT doc_id,
                    unnest(list_filter(regexp_split_to_array(
                      lower(coalesce(text, '')), '\s+'), x -> x <> ''))
                      AS token
             FROM documents),
dl AS (SELECT d.doc_id,
              CAST(coalesce(t.c, 0) AS BIGINT) AS len
       FROM documents d LEFT JOIN (
         SELECT doc_id, count(*) AS c FROM tok GROUP BY 1) t
         USING (doc_id)),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST((SELECT count(*) FROM tok) AS BIGINT) AS tot
       FROM documents),
df AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       FROM tok WHERE token IN ({tl}) GROUP BY 1),
tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
       FROM tok WHERE token IN ({tl}) GROUP BY 1, 2),
sc AS (SELECT tf.doc_id,
              round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list(ln(CAST(nn.n AS DOUBLE) / CAST(df.df AS DOUBLE))
                     * (CAST(tf.tf AS DOUBLE) * ({k1!r} + 1.0))
                     / (CAST(tf.tf AS DOUBLE)
                        + {k1!r} * (1.0 - {b!r}
                                    + {b!r} * CAST(dl.len AS DOUBLE)
                                    / (CAST(nn.tot AS DOUBLE)
                                       / CAST(nn.n AS DOUBLE))))
                     ORDER BY tf.token)), (a, x) -> a + x), 6) AS score
       FROM tf JOIN df USING (token) JOIN dl ON dl.doc_id = tf.doc_id
       CROSS JOIN nn
       GROUP BY tf.doc_id, nn.n, nn.tot, dl.len)
SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT {k}"""


def flesch_lang(sf_dir: str):
    """Per-language Flesch reading-ease profile — (lang, n_docs, n_words,
    n_sentences, n_syllables, words_per_sentence, syllables_per_word,
    flesch).  The corpus-quality readability dial next to
    :func:`token_len_stats` (a collapsing Flesch score flags boilerplate
    or OCR noise entering one language's slice).

    Contract (identical by construction on both engines): words =
    whitespace tokens; sentences = runs of ``[.!?]+`` in the raw text,
    floored at ONE per document (the standard readability fallback —
    an unpunctuated document is a single sentence, which also keeps the
    score live on corpora with no terminal punctuation at all);
    syllables = runs of ``[aeiouy]+`` in the lowercased text (the classic
    vowel-cluster heuristic, applied corpus-wide — no per-word minimum,
    documented semantics rather than a dictionary).  NULL lang drops,
    NULL text == empty (the _string_array contract).  The score
    206.835 - 1.015*(w/s) - 84.6*(y/w) is ONE scalar float chain per
    language over the EXACT integer corpus sums, mirrored op-for-op
    (NULL when a denominator is zero).

    Scale shape: per-batch per-lang integer partials (three regex-count
    kernels fused with the scan), one lang-cardinality groupby, and a
    lang-bounded driver finish — no corpus rows ever shuffle.
    """
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        lang = batch["lang"].to_pandas()
        ok = lang.notna().to_numpy()
        texts = _string_array(batch["text"]).filter(pa.array(ok))
        lang = lang[ok].astype(str).to_numpy()
        z = np.zeros(0, dtype=np.int64)
        if not len(lang):
            return pa.table({"lang": pa.array([], type=pa.string()),
                             "pd_": z, "pw": z, "ps": z, "py": z})
        _, _, _, n_tokens, _ = _token_codes(texts, lower=False)
        sent = np.maximum(
            pc.count_substring_regex(texts, r"[.!?]+")
            .to_numpy(zero_copy_only=False).astype(np.int64), 1)
        syl = pc.count_substring_regex(pc.utf8_lower(texts), r"[aeiouy]+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        lcodes, luniq = pd.factorize(pd.Series(lang))
        k = len(luniq)
        pw = np.zeros(k, dtype=np.int64)
        ps = np.zeros(k, dtype=np.int64)
        py = np.zeros(k, dtype=np.int64)
        np.add.at(pw, lcodes, n_tokens)
        np.add.at(ps, lcodes, sent)
        np.add.at(py, lcodes, syl)
        return pa.table({
            "lang": pa.array(luniq, type=pa.string()),
            "pd_": pa.array(np.bincount(lcodes, minlength=k)
                            .astype(np.int64)),
            "pw": pa.array(pw), "ps": pa.array(ps), "py": pa.array(py),
        })

    m = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
         .groupby("lang")
         .aggregate(Sum("pd_", alias_name="n_docs"),
                    Sum("pw", alias_name="n_words"),
                    Sum("ps", alias_name="n_sentences"),
                    Sum("py", alias_name="n_syllables"))).to_pandas() \
        .sort_values("lang", ignore_index=True)
    wps, spw, fl = [], [], []
    for w_, s_, y_ in zip(m["n_words"], m["n_sentences"], m["n_syllables"]):
        w_, s_, y_ = int(w_), int(s_), int(y_)
        a = float(w_) / float(s_) if s_ else None
        b = float(y_) / float(w_) if w_ else None
        wps.append(float(round_half_away(np.float64(a))) if a is not None
                   else None)
        spw.append(float(round_half_away(np.float64(b))) if b is not None
                   else None)
        fl.append(float(round_half_away(np.float64(
            206.835 - 1.015 * a - 84.6 * b)))
            if a is not None and b is not None else None)
    return ray.data.from_arrow(pa.table({
        "lang": pa.array(m["lang"], type=pa.string()),
        "n_docs": pa.array(m["n_docs"].to_numpy().astype(np.int64)
                           if len(m) else np.empty(0, np.int64)),
        "n_words": pa.array(m["n_words"].to_numpy().astype(np.int64)
                            if len(m) else np.empty(0, np.int64)),
        "n_sentences": pa.array(m["n_sentences"].to_numpy()
                                .astype(np.int64)
                                if len(m) else np.empty(0, np.int64)),
        "n_syllables": pa.array(m["n_syllables"].to_numpy()
                                .astype(np.int64)
                                if len(m) else np.empty(0, np.int64)),
        "words_per_sentence": pa.array(wps, type=pa.float64()),
        "syllables_per_word": pa.array(spw, type=pa.float64()),
        "flesch": pa.array(fl, type=pa.float64()),
    }))


FLESCH_LANG_SQL = r"""
WITH d AS (SELECT lang,
                  length(list_filter(regexp_split_to_array(
                    coalesce(text, ''), '\s+'), x -> x <> '')) AS w,
                  greatest(1, length(regexp_extract_all(coalesce(text, ''),
                                                        '[.!?]+'))) AS s,
                  length(regexp_extract_all(lower(coalesce(text, '')),
                                            '[aeiouy]+')) AS y
           FROM documents WHERE lang IS NOT NULL),
a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(w) AS BIGINT) AS n_words,
             CAST(sum(s) AS BIGINT) AS n_sentences,
             CAST(sum(y) AS BIGINT) AS n_syllables
      FROM d GROUP BY 1)
SELECT lang, n_docs, n_words, n_sentences, n_syllables,
       CASE WHEN n_sentences = 0 THEN NULL
            ELSE round(CAST(n_words AS DOUBLE)
                       / CAST(n_sentences AS DOUBLE), 6) END
         AS words_per_sentence,
       CASE WHEN n_words = 0 THEN NULL
            ELSE round(CAST(n_syllables AS DOUBLE)
                       / CAST(n_words AS DOUBLE), 6) END
         AS syllables_per_word,
       CASE WHEN n_sentences = 0 OR n_words = 0 THEN NULL
            ELSE round(206.835
                       - 1.015 * (CAST(n_words AS DOUBLE)
                                  / CAST(n_sentences AS DOUBLE))
                       - 84.6 * (CAST(n_syllables AS DOUBLE)
                                 / CAST(n_words AS DOUBLE)), 6) END
         AS flesch
FROM a ORDER BY lang"""


def _lang_token_counts(sf_dir: str, lower: bool = True):
    """Shared (lang, token) count table: per-batch packed counting, one
    (langs x vocabulary)-bounded Sum shuffle, returned as the pandas
    frame (lang, token, n).  NULL lang drops, NULL text == empty — the
    contract of every per-language vocabulary statistic built on it
    (log_odds_keywords, yules_k, vocab_richness)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        lang = batch["lang"].to_pandas()
        ok = lang.notna().to_numpy()
        texts = _string_array(batch["text"]).filter(pa.array(ok))
        lang = lang[ok].astype(str).to_numpy()
        empty = pa.table({"lang": pa.array([], type=pa.string()),
                          "token": pa.array([], type=pa.string()),
                          "pn": pa.array([], type=pa.int64())})
        if not len(lang):
            return empty
        row_idx, codes, uniques, _, _ = _token_codes(texts, lower=lower)
        if not len(codes):
            return empty
        lcodes, luniq = pd.factorize(pd.Series(lang))
        packed = lcodes[row_idx].astype(np.int64) \
            * np.int64(len(uniques)) + codes
        u, cnt = np.unique(packed, return_counts=True)
        return pa.table({
            "lang": pa.array(luniq[(u // len(uniques)).astype(np.int64)],
                             type=pa.string()),
            "token": pa.array(uniques[(u % len(uniques)).astype(np.int64)],
                              type=pa.string()),
            "pn": pa.array(cnt.astype(np.int64)),
        })

    out = (ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None)
           .groupby(["lang", "token"])
           .aggregate(Sum("pn", alias_name="n"))).to_pandas()
    if "lang" not in out.columns:   # empty input loses the schema
        import pandas as pd
        out = pd.DataFrame({"lang": pd.Series(dtype=object),
                            "token": pd.Series(dtype=object),
                            "n": pd.Series(dtype=np.int64)})
    return out


def log_odds_keywords(sf_dir: str, k: int = 15, min_count: int = 5,
                      lower: bool = True):
    """Distinctive vocabulary per language by smoothed log-odds z-score
    (the "Fightin' Words" statistic, Monroe et al. 2008, with a uniform
    +1 Dirichlet prior): for each language, the ``k`` tokens whose usage
    rate most exceeds the rest of the corpus — (lang, token, n_lang,
    n_rest, z_score, rank).  Candidates need >= ``min_count``
    occurrences inside the language; z =
    [ln((y+1)/(nl+V-y-1)) - ln((r+1)/(nr+V-r-1))] / sqrt(1/(y+1) +
    1/(r+1)) with V = global distinct tokens, nl/nr = token totals of
    the language / the rest, r = rest count of the token.

    Exactness: every count is an exact int64 from ONE
    (lang, token)-cardinality shuffle; the z chain is per-candidate
    scalar float math (math.log like the doc_perplexity/PMI ln-mirror
    precedent — numpy's SIMD log diverges from libm by an ulp), and the
    top-k order (z DESC, token ASC) compares identical doubles on both
    engines.  Denominator guards drop the degenerate single-token
    corner on both sides.  NULL lang drops; NULL text == empty.

    Scale shape: per-batch packed (lang, token) counting (np.unique
    over fused codes), one vocabulary-x-languages count shuffle, and a
    vocabulary-bounded driver finish (rare_tokens' documented budget) —
    corpus rows never move.
    """
    import math

    import ray.data

    c = _lang_token_counts(sf_dir, lower=lower)
    out = {"lang": [], "token": [], "n_lang": [], "n_rest": [],
           "z_score": [], "rank": []}
    if len(c):
        g = c.groupby("token", sort=False)["n"].sum()
        nl = c.groupby("lang", sort=False)["n"].sum()
        tot = int(nl.sum())
        v = int(len(g))
        g_of = g.to_dict()
        for lang_, grp in c.groupby("lang", sort=True):
            nl_ = int(nl[lang_])
            nr_ = tot - nl_
            cand = []
            for t_, y_ in zip(grp["token"], grp["n"]):
                y_ = int(y_)
                if y_ < min_count:
                    continue
                r_ = int(g_of[t_]) - y_
                d1 = nl_ + v - y_ - 1
                d2 = nr_ + v - r_ - 1
                if d1 <= 0 or d2 <= 0:
                    continue
                delta = math.log(float(y_ + 1) / float(d1)) \
                    - math.log(float(r_ + 1) / float(d2))
                var = 1.0 / float(y_ + 1) + 1.0 / float(r_ + 1)
                cand.append((delta / math.sqrt(var), t_, y_, r_))
            cand.sort(key=lambda x: (-x[0], x[1]))
            for i, (z_, t_, y_, r_) in enumerate(cand[:k], start=1):
                out["lang"].append(lang_)
                out["token"].append(t_)
                out["n_lang"].append(y_)
                out["n_rest"].append(r_)
                out["z_score"].append(float(round_half_away(
                    np.float64(z_))))
                out["rank"].append(i)
    return ray.data.from_arrow(pa.table({
        "lang": pa.array(out["lang"], type=pa.string()),
        "token": pa.array(out["token"], type=pa.string()),
        "n_lang": pa.array(out["n_lang"], type=pa.int64()),
        "n_rest": pa.array(out["n_rest"], type=pa.int64()),
        "z_score": pa.array(out["z_score"], type=pa.float64()),
        "rank": pa.array(out["rank"], type=pa.int64()),
    }))


def log_odds_keywords_sql(k: int = 15, min_count: int = 5) -> str:
    """Oracle for :func:`log_odds_keywords` — the identical smoothed
    log-odds chain over exact counts, ranked on the unrounded double."""
    return rf"""
WITH tok AS (SELECT lang,
                    unnest(list_filter(regexp_split_to_array(
                      lower(coalesce(text, '')), '\s+'), x -> x <> ''))
                      AS token
             FROM documents WHERE lang IS NOT NULL),
c AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS n
      FROM tok GROUP BY 1, 2),
g AS (SELECT token, CAST(sum(n) AS BIGINT) AS g FROM c GROUP BY 1),
nl AS (SELECT lang, CAST(sum(n) AS BIGINT) AS nl FROM c GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) AS tot,
             CAST(count(DISTINCT token) AS BIGINT) AS v FROM c),
sc AS (SELECT c.lang, c.token, c.n AS n_lang, g.g - c.n AS n_rest,
              (ln(CAST(c.n + 1 AS DOUBLE)
                  / CAST(nl.nl + t.v - c.n - 1 AS DOUBLE))
               - ln(CAST(g.g - c.n + 1 AS DOUBLE)
                    / CAST(t.tot - nl.nl + t.v - (g.g - c.n) - 1
                           AS DOUBLE)))
              / sqrt(1.0 / CAST(c.n + 1 AS DOUBLE)
                     + 1.0 / CAST(g.g - c.n + 1 AS DOUBLE)) AS z
       FROM c JOIN g USING (token) JOIN nl USING (lang) CROSS JOIN t
       WHERE c.n >= {min_count}
         AND nl.nl + t.v - c.n - 1 > 0
         AND t.tot - nl.nl + t.v - (g.g - c.n) - 1 > 0)
SELECT lang, token, n_lang, n_rest, round(z, 6) AS z_score,
       CAST(row_number() OVER (PARTITION BY lang
                               ORDER BY z DESC, token) AS BIGINT) AS rank
FROM sc
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY z DESC, token)
        <= {k}
ORDER BY lang, rank"""


def textrank_keywords(sf_dir: str, n_nodes: int = 200, k: int = 50,
                      damping: float = 0.85, iters: int = 20,
                      lower: bool = True):
    """Corpus-level TextRank keyword extraction (Mihalcea & Tarau 2004):
    weighted PageRank over the co-occurrence graph of the ``n_nodes``
    most frequent tokens, edges = within-document ADJACENT token pairs
    (both endpoints in the node set, self-pairs dropped, weights
    symmetrized) — (token, n_count, score, rank), the top ``k`` by
    score.  Centrality separates topical vocabulary from merely
    frequent vocabulary, which raw counts (vocab_top100) cannot.

    Exactness: node selection (count DESC, token ASC) and edge weights
    are exact int64 from ONE fused unigram+bigram count shuffle; the
    power iteration mirrors domain_pagerank's contract — transition
    weights w/out and r' = (1-d)/nf + d * fold evaluated in identical
    IEEE order, the per-target fold ORDER-PINNED to ascending source
    token (sequential left fold from 0.0 == the oracle's list_reduce
    with a 0.0 prepend over list(... ORDER BY s)); the oracle's
    recursion carries zero-weight self-edges so isolated nodes survive
    its join (+0.0 is an exact identity, so the engine omits them).
    Final ranking compares identical doubles (score DESC, token ASC).

    Scale shape (round-4 review fix — the bigram vocabulary grows
    superlinearly with corpus size and must never reach the driver):
    TWO corpus passes.  Pass 1 counts unigrams (token-vocabulary
    shuffle) and selects the top ``n_nodes`` with the two-level cut
    (per-block partial + one n_nodes-bounded merge, the basket_pairs
    shape).  The node set broadcasts (n_nodes strings) and pass 2
    filters adjacent pairs to node x node INSIDE each batch BEFORE the
    aggregate, so at most n_nodes^2 pair rows ever enter the shuffle
    or the n_nodes-bounded driver iteration.  Two reads beat shipping
    the full bigram table at any scale where it matters.
    """
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["text"])

    def uni_partial(batch: pa.Table) -> pa.Table:
        texts = _string_array(batch["text"])
        row_idx, codes, uniques, _, _ = _token_codes(texts, lower=lower)
        if not len(codes):
            return pa.table({"w1": pa.array([], type=pa.string()),
                             "pn": pa.array([], type=pa.int64())})
        uc, ucnt = np.unique(codes, return_counts=True)
        return pa.table({
            "w1": pa.array([uniques[c] for c in uc], type=pa.string()),
            "pn": pa.array(ucnt.astype(np.int64))})

    def uni_cut(batch: pa.Table) -> pa.Table:
        # post-aggregate: every token appears once, so a per-block cut
        # keeps every global top-n_nodes candidate
        if not len(batch):
            return batch
        df = batch.to_pandas().sort_values(
            ["n", "w1"], ascending=[False, True], ignore_index=True,
            kind="stable").head(n_nodes)
        return pa.Table.from_pandas(df, preserve_index=False)

    uni = (ds.map_batches(uni_partial, batch_format="pyarrow",
                          batch_size=None)
           .groupby("w1").aggregate(Sum("pn", alias_name="n"))
           .map_batches(uni_cut, batch_format="pyarrow",
                        batch_size=None)
           .repartition(1)
           .map_batches(uni_cut, batch_format="pyarrow",
                        batch_size=None)).to_pandas()  # <= n_nodes rows
    out = {"token": [], "n_count": [], "score": [], "rank": []}
    if len(uni):
        nodes = sorted(uni["w1"].tolist())
        count_of = dict(zip(uni["w1"], uni["n"].astype(int)))
        idx = {t: i for i, t in enumerate(nodes)}
        nn_ = len(nodes)
        node_set = frozenset(nodes)    # n_nodes strings: closure bcast

        def bg_partial(batch: pa.Table) -> pa.Table:
            empty = pa.table({"w1": pa.array([], type=pa.string()),
                              "w2": pa.array([], type=pa.string()),
                              "pn": pa.array([], type=pa.int64())})
            texts = _string_array(batch["text"])
            row_idx, codes, uniques, _, _ = _token_codes(texts,
                                                         lower=lower)
            if len(codes) < 2:
                return empty
            nu = np.int64(len(uniques))
            in_set = np.array([u in node_set for u in uniques],
                              dtype=bool)        # vocab-bounded probe
            same = row_idx[1:] == row_idx[:-1]
            left, right = codes[:-1][same], codes[1:][same]
            keep = (left != right) & in_set[left] & in_set[right]
            left, right = left[keep], right[keep]
            if not len(left):
                return empty
            packed = left * nu + right
            ub, bcnt = np.unique(packed, return_counts=True)
            return pa.table({
                "w1": pa.array([uniques[c] for c in (ub // nu)],
                               type=pa.string()),
                "w2": pa.array([uniques[c] for c in (ub % nu)],
                               type=pa.string()),
                "pn": pa.array(bcnt.astype(np.int64))})

        bg = (ds.map_batches(bg_partial, batch_format="pyarrow",
                             batch_size=None)
              .groupby(["w1", "w2"])
              .aggregate(Sum("pn", alias_name="n"))) \
            .to_pandas()                         # <= n_nodes^2 rows
        if "w1" not in bg.columns:       # empty groupby loses schema
            bg = pd.DataFrame({"w1": [], "w2": [], "n": []})
        w = {}
        for a_, b_, n_ in zip(bg["w1"], bg["w2"], bg["n"]):
            ia, ib = idx[a_], idx[b_]
            w[(ia, ib)] = w.get((ia, ib), 0) + int(n_)
            w[(ib, ia)] = w.get((ib, ia), 0) + int(n_)
        out_w = np.zeros(nn_, dtype=np.int64)
        for (ia, _), n_ in w.items():
            out_w[ia] += n_
        es = np.array([e[0] for e in w], dtype=np.int64)
        ed = np.array([e[1] for e in w], dtype=np.int64)
        en = np.array(list(w.values()), dtype=np.int64)
        t = en.astype(np.float64) / out_w[es].astype(np.float64) \
            if len(es) else np.zeros(0)
        order = np.lexsort((es, ed)) if len(es) else np.zeros(0, np.int64)
        es, ed, t = es[order], ed[order], t[order]
        nf = float(nn_)
        base = (1.0 - damping) / nf
        r = np.full(nn_, 1.0 / nf)
        for _ in range(iters):
            acc = np.zeros(nn_)
            pos = 0
            while pos < len(ed):
                end = pos
                dd = ed[pos]
                sacc = 0.0
                while end < len(ed) and ed[end] == dd:
                    sacc += t[end] * r[es[end]]
                    end += 1
                acc[dd] = sacc
                pos = end
            r = base + damping * acc
        top = sorted(range(nn_), key=lambda i: (-r[i], nodes[i]))[:k]
        for rk, i in enumerate(top, start=1):
            out["token"].append(nodes[i])
            out["n_count"].append(count_of[nodes[i]])
            out["score"].append(float(round_half_away(
                np.float64(r[i]), 9)))
            out["rank"].append(rk)
    return ray.data.from_arrow(pa.table({
        "token": pa.array(out["token"], type=pa.string()),
        "n_count": pa.array(out["n_count"], type=pa.int64()),
        "score": pa.array(out["score"], type=pa.float64()),
        "rank": pa.array(out["rank"], type=pa.int64()),
    }))


def textrank_keywords_sql(n_nodes: int = 200, k: int = 50,
                          damping: float = 0.85, iters: int = 20) -> str:
    """Oracle for :func:`textrank_keywords` — weighted PageRank as a
    recursive CTE over the top-``n_nodes`` adjacency graph, zero-weight
    self-edges keeping isolated nodes alive, the contribution fold
    order-pinned to ascending source token (domain_pagerank's mirror)."""
    return rf"""
WITH RECURSIVE tok AS (SELECT list_filter(regexp_split_to_array(
                         lower(coalesce(text, '')), '\s+'),
                         x -> x <> '') AS ws
                       FROM documents),
uni AS (SELECT unnest(ws) AS token FROM tok),
cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM uni GROUP BY 1),
nodes AS (SELECT token, n FROM cnt ORDER BY n DESC, token
          LIMIT {n_nodes}),
bg AS (SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
               i -> ws[i] || chr(31) || ws[i+1])) AS b
       FROM tok WHERE coalesce(len(ws), 0) >= 2),
cb AS (SELECT string_split(b, chr(31))[1] AS s,
              string_split(b, chr(31))[2] AS d,
              CAST(count(*) AS BIGINT) AS n
       FROM bg GROUP BY 1, 2),
eb AS (SELECT s, d, n FROM cb
       WHERE s <> d AND s IN (SELECT token FROM nodes)
         AND d IN (SELECT token FROM nodes)),
und AS (SELECT s, d, CAST(sum(n) AS BIGINT) AS w
        FROM (SELECT s, d, n FROM eb
              UNION ALL SELECT d AS s, s AS d, n FROM eb)
        GROUP BY 1, 2),
ow AS (SELECT s, CAST(sum(w) AS BIGINT) AS ow FROM und GROUP BY 1),
p AS (SELECT und.s, und.d,
             CAST(und.w AS DOUBLE) / CAST(ow.ow AS DOUBLE) AS t
      FROM und JOIN ow ON und.s = ow.s
      UNION ALL
      SELECT token, token, 0.0 FROM nodes),
nf AS (SELECT CAST(count(*) AS DOUBLE) AS nf FROM nodes),
pr(d, r, kk) AS (
  SELECT token, 1.0 / (SELECT nf FROM nf), 0 FROM nodes
  UNION ALL
  SELECT p.d,
         (1.0 - {damping!r}) / (SELECT nf FROM nf)
         + {damping!r} * list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                    list(p.t * pr.r ORDER BY p.s)), (a, b) -> a + b),
         pr.kk + 1
  FROM pr JOIN p ON p.s = pr.d
  WHERE pr.kk < {iters}
  GROUP BY p.d, pr.kk)
SELECT f.token AS token, nodes.n AS n_count,
       round(f.r, 9) AS score, f.rank
FROM (SELECT pr.d AS token, pr.r AS r,
             CAST(row_number() OVER (ORDER BY pr.r DESC, pr.d)
                  AS BIGINT) AS rank
      FROM pr WHERE pr.kk = {iters}) f
JOIN nodes USING (token)
WHERE f.rank <= {k} ORDER BY f.rank"""


def yules_k(sf_dir: str, lower: bool = True):
    """Yule's K vocabulary-concentration characteristic per language —
    (lang, n_tokens, v_distinct, s2, yules_k) where
    K = 10^4 * (S2 - N) / N^2 with S2 = sum of squared per-token
    counts.  The classic author/register "repetitiveness" constant:
    unlike a raw type-token ratio it is (asymptotically) corpus-size
    invariant, so drift in K is a real register change, not just more
    data.  Companion of lexical_simpson (same moments, different
    normalization and literature).

    Exactness: per-(lang, token) counts are exact int64 from ONE
    vocabulary-sized shuffle; S2 folds in PYTHON INTS (c^2 can overflow
    int64 only beyond 3e9 occurrences of one token per language —
    carried as HUGEINT in the oracle, object ints here); K is one
    mirrored float expression; NULL when N = 0.  NULL lang drops,
    NULL text == empty.

    Scale shape: identical to log_odds_keywords' — packed per-batch
    counting, a (lang x vocabulary)-bounded count shuffle, lang-bounded
    driver finish.
    """
    import ray.data

    c = _lang_token_counts(sf_dir, lower=lower)
    out = {"lang": [], "n_tokens": [], "v_distinct": [], "s2": [],
           "yules_k": []}
    if len(c):
        for lang_, grp in c.groupby("lang", sort=True):
            cnts = [int(x) for x in grp["n"]]
            n = sum(cnts)
            s2 = sum(x * x for x in cnts)
            out["lang"].append(lang_)
            out["n_tokens"].append(n)
            out["v_distinct"].append(len(cnts))
            out["s2"].append(s2)
            out["yules_k"].append(
                float(round_half_away(np.float64(
                    10000.0 * (float(s2 - n)
                               / (float(n) * float(n))))))
                if n else None)
    return ray.data.from_arrow(pa.table({
        "lang": pa.array(out["lang"], type=pa.string()),
        "n_tokens": pa.array(out["n_tokens"], type=pa.int64()),
        "v_distinct": pa.array(out["v_distinct"], type=pa.int64()),
        "s2": pa.array(out["s2"], type=pa.int64()),
        "yules_k": pa.array(out["yules_k"], type=pa.float64()),
    }))


YULES_K_SQL = r"""
WITH tok AS (SELECT lang,
                    unnest(list_filter(regexp_split_to_array(
                      lower(coalesce(text, '')), '\s+'), x -> x <> ''))
                      AS token
             FROM documents WHERE lang IS NOT NULL),
c AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS n
      FROM tok GROUP BY 1, 2),
a AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS v_distinct,
             CAST(sum(CAST(n AS HUGEINT) * n) AS BIGINT) AS s2
      FROM c GROUP BY 1)
SELECT lang, n_tokens, v_distinct, s2,
       CASE WHEN n_tokens = 0 THEN NULL
            ELSE round(10000.0 * (CAST(s2 - n_tokens AS DOUBLE)
                                  / (CAST(n_tokens AS DOUBLE)
                                     * CAST(n_tokens AS DOUBLE))), 6)
            END AS yules_k
FROM a ORDER BY lang"""


def vocab_richness(sf_dir: str, lower: bool = True):
    """Count-of-counts lexical-richness profile per language — (lang,
    n_tokens, v_distinct, v1_hapax, v2_dis, hapax_ratio, sichel_s):
    the hapax legomena count (tokens seen once), dis legomena (seen
    twice), hapax share V1/V and Sichel's S = V2/V.  The frequency-
    spectrum face of the richness family (Yule's K is its second
    moment; Heaps' law its growth curve): a collapsing hapax share
    under constant corpus size is the classic signature of template
    or duplicated text flooding one language.

    Exactness: V, V1, V2 are exact integer facts of the per-(lang,
    token) count table; the two ratio columns are mirrored single
    float divisions (NULL when V = 0).  NULL lang drops, NULL text ==
    empty.

    Scale shape: the same (lang x vocabulary)-bounded count shuffle as
    yules_k, lang-bounded driver finish.
    """
    import ray.data

    c = _lang_token_counts(sf_dir, lower=lower)
    out = {"lang": [], "n_tokens": [], "v_distinct": [], "v1_hapax": [],
           "v2_dis": [], "hapax_ratio": [], "sichel_s": []}
    if len(c):
        for lang_, grp in c.groupby("lang", sort=True):
            cnts = grp["n"].to_numpy().astype(np.int64)
            n = int(cnts.sum())
            v = len(cnts)
            v1 = int((cnts == 1).sum())
            v2 = int((cnts == 2).sum())
            out["lang"].append(lang_)
            out["n_tokens"].append(n)
            out["v_distinct"].append(v)
            out["v1_hapax"].append(v1)
            out["v2_dis"].append(v2)
            out["hapax_ratio"].append(float(round_half_away(np.float64(
                float(v1) / float(v)))) if v else None)
            out["sichel_s"].append(float(round_half_away(np.float64(
                float(v2) / float(v)))) if v else None)
    return ray.data.from_arrow(pa.table({
        "lang": pa.array(out["lang"], type=pa.string()),
        "n_tokens": pa.array(out["n_tokens"], type=pa.int64()),
        "v_distinct": pa.array(out["v_distinct"], type=pa.int64()),
        "v1_hapax": pa.array(out["v1_hapax"], type=pa.int64()),
        "v2_dis": pa.array(out["v2_dis"], type=pa.int64()),
        "hapax_ratio": pa.array(out["hapax_ratio"], type=pa.float64()),
        "sichel_s": pa.array(out["sichel_s"], type=pa.float64()),
    }))


VOCAB_RICHNESS_SQL = r"""
WITH tok AS (SELECT lang,
                    unnest(list_filter(regexp_split_to_array(
                      lower(coalesce(text, '')), '\s+'), x -> x <> ''))
                      AS token
             FROM documents WHERE lang IS NOT NULL),
c AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS n
      FROM tok GROUP BY 1, 2),
a AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS v_distinct,
             CAST(coalesce(count(*) FILTER (n = 1), 0) AS BIGINT)
               AS v1_hapax,
             CAST(coalesce(count(*) FILTER (n = 2), 0) AS BIGINT)
               AS v2_dis
      FROM c GROUP BY 1)
SELECT lang, n_tokens, v_distinct, v1_hapax, v2_dis,
       CASE WHEN v_distinct = 0 THEN NULL
            ELSE round(CAST(v1_hapax AS DOUBLE)
                       / CAST(v_distinct AS DOUBLE), 6) END
         AS hapax_ratio,
       CASE WHEN v_distinct = 0 THEN NULL
            ELSE round(CAST(v2_dis AS DOUBLE)
                       / CAST(v_distinct AS DOUBLE), 6) END
         AS sichel_s
FROM a ORDER BY lang"""


def skipgram_pairs(sf_dir: str, window: int = 5, k: int = 100,
                   lower: bool = True):
    """Windowed co-occurrence (skip-gram) mining: ordered token pairs
    (w1, w2) with w2 at most ``window`` positions after w1 inside a
    document, counted corpus-wide — the top ``k`` pairs (w1, w2, n) by
    (n DESC, w1, w2).  The word2vec-style context statistic PMI's
    adjacent-bigram view cannot see (collocations at distance 2-5:
    verb-object, determiner-noun, template frames).

    Exactness: counts are exact int64 from ONE windowed-pair
    vocabulary-bounded shuffle (the pmi_collocations budget times the
    window); ranking is an integer sort with the (w1, w2) tie-break.

    Scale shape: per-batch vectorized pair extraction (``window``
    shifted-array comparisons, no Python loop over tokens), the pair
    count shuffle, then the standard two-level top-k cut (the
    basket_pairs shape, join.py:3554): a per-block top-k partial after
    the aggregate and ONE k-bounded final merge — the driver frame is
    <= k rows, never the pair vocabulary (round-4 review fix; pair
    vocabularies grow superlinearly with corpus size).
    """
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        texts = _string_array(batch["text"])
        empty = pa.table({"w1": pa.array([], type=pa.string()),
                          "w2": pa.array([], type=pa.string()),
                          "pn": pa.array([], type=pa.int64())})
        row_idx, codes, uniques, _, _ = _token_codes(texts, lower=lower)
        if len(codes) < 2:
            return empty
        nu = np.int64(len(uniques))
        packs = []
        for d in range(1, window + 1):
            if len(codes) <= d:
                break
            same = row_idx[:-d] == row_idx[d:]
            packs.append(codes[:-d][same] * nu + codes[d:][same])
        if not packs:
            return empty
        u, cnt = np.unique(np.concatenate(packs), return_counts=True)
        return pa.table({
            "w1": pa.array(uniques[(u // nu).astype(np.int64)],
                           type=pa.string()),
            "w2": pa.array(uniques[(u % nu).astype(np.int64)],
                           type=pa.string()),
            "pn": pa.array(cnt.astype(np.int64)),
        })

    def topk_cut(batch: pa.Table) -> pa.Table:
        # each (w1, w2) appears exactly once after the aggregate, so a
        # per-block cut keeps every global top-k candidate
        if not len(batch):
            return batch
        df = batch.to_pandas()
        df = df.sort_values(["n", "w1", "w2"],
                            ascending=[False, True, True],
                            ignore_index=True, kind="stable").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    c = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
         .groupby(["w1", "w2"])
         .aggregate(Sum("pn", alias_name="n"))
         .map_batches(topk_cut, batch_format="pyarrow", batch_size=None)
         .repartition(1)
         .map_batches(topk_cut, batch_format="pyarrow",
                      batch_size=None)).to_pandas()      # <= k rows
    if len(c):
        c = c.sort_values(["n", "w1", "w2"],
                          ascending=[False, True, True],
                          ignore_index=True, kind="stable").head(k)
        c["rank"] = np.arange(1, len(c) + 1, dtype=np.int64)
    return ray.data.from_arrow(pa.table({
        "w1": pa.array(c["w1"] if len(c) else [], type=pa.string()),
        "w2": pa.array(c["w2"] if len(c) else [], type=pa.string()),
        "n": pa.array(c["n"].to_numpy().astype(np.int64)
                      if len(c) else np.empty(0, np.int64)),
        "rank": pa.array(c["rank"].to_numpy().astype(np.int64)
                         if len(c) else np.empty(0, np.int64)),
    }))


def skipgram_pairs_sql(window: int = 5, k: int = 100) -> str:
    """Oracle for :func:`skipgram_pairs` — windowed pair extraction via
    nested list_transform, identical integer ranking."""
    return rf"""
WITH words AS (SELECT list_filter(regexp_split_to_array(
                 lower(coalesce(text, '')), '\s+'), x -> x <> '') AS ws
               FROM documents),
pr AS (SELECT unnest(flatten(list_transform(
         generate_series(1, len(ws) - 1), i ->
         list_transform(generate_series(i + 1, least(i + {window},
                                                     len(ws))), j ->
                        ws[i] || chr(31) || ws[j])))) AS b
       FROM words WHERE coalesce(len(ws), 0) >= 2),
c AS (SELECT string_split(b, chr(31))[1] AS w1,
             string_split(b, chr(31))[2] AS w2,
             CAST(count(*) AS BIGINT) AS n
      FROM pr GROUP BY 1, 2)
SELECT w1, w2, n,
       CAST(row_number() OVER (ORDER BY n DESC, w1, w2) AS BIGINT)
         AS rank
FROM c
QUALIFY row_number() OVER (ORDER BY n DESC, w1, w2) <= {k}
ORDER BY rank"""


def token_dispersion(sf_dir: str, k: int = 20, lower: bool = True):
    """Corpus burstiness of the top-``k`` tokens: the Fano factor
    (variance-to-mean ratio) of each token's PER-DOCUMENT count over
    the whole corpus, zero-count documents included — (token, n_total,
    n_docs_with, fano, rank) by (n_total DESC, token).  Fano ~ 1 is
    Poisson scatter; Fano >> 1 is the classic content-word burstiness
    (a token that floods a few documents), and a frequent token with
    LOW Fano is templating — the signal raw frequency hides.

    Exactness: with D docs, C total count and Q = sum of squared
    per-doc counts, Fano = (D*Q - C^2) / (D*C) — EXACT integer
    numerator/denominator (Python big ints; HUGEINT in the oracle) and
    ONE mirrored division.  NULL text == empty (counts as a
    zero-count document on both engines).

    Scale shape: per-batch packed (token, doc) square-sum partials,
    one vocabulary-bounded shuffle, then the two-level top-k cut (the
    basket_pairs shape): per-block (n_total DESC, token) partials —
    each carrying the "" doc-count sentinel through — and ONE
    k-bounded final merge, so the driver frame is <= k+1 rows, never
    the token vocabulary (round-4 review fix).
    """
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        texts = _string_array(batch["text"])
        n_rows = len(texts)
        rows_t = [""]                 # sentinel: per-batch doc count
        rows_qh = [0]
        rows_ql = [0]
        rows_c = [np.int64(n_rows)]   # rides the pc lane
        rows_d = [0]
        row_idx, codes, uniques, _, _ = _token_codes(texts, lower=lower)
        if len(codes):
            nu = np.int64(len(uniques))
            key = row_idx * nu + codes
            u, cnt = np.unique(key, return_counts=True)
            if int(cnt.max()) ** 2 * len(cnt) >= 1 << 63:
                raise ValueError("token_dispersion: per-batch square "
                                 "sum would overflow int64; lower "
                                 "batch_size")
            tok_code = (u % nu).astype(np.int64)
            per = pd.DataFrame({"t": tok_code,
                                "c": cnt.astype(np.int64)})
            g = per.groupby("t", sort=False).agg(
                q=("c", lambda x: int(np.dot(x, x))),
                s=("c", "sum"), d=("c", "size")).reset_index()
            rows_t += [uniques[int(t_)] for t_ in g["t"]]
            # cross-batch hi/lo lanes (the corr_by_group wrap-free
            # convention): per-token square sums are quadratic in count
            # and the oracle sums HUGEINT, so the Ray Sum must not ride
            # a single int64 lane
            rows_qh += [int(x) >> 31 for x in g["q"]]
            rows_ql += [int(x) & ((1 << 31) - 1) for x in g["q"]]
            rows_c += [int(x) for x in g["s"]]
            rows_d += [int(x) for x in g["d"]]
        return pa.table({
            "token": pa.array(rows_t, type=pa.string()),
            "pq_hi": pa.array(rows_qh, type=pa.int64()),
            "pq_lo": pa.array(rows_ql, type=pa.int64()),
            "pc": pa.array(rows_c, type=pa.int64()),
            "pd_": pa.array(rows_d, type=pa.int64()),
        })

    def disp_cut(batch: pa.Table) -> pa.Table:
        # post-aggregate per-block cut: every token appears once, so
        # top-k by (c DESC, token) keeps all global candidates; the ""
        # doc-count sentinel row (one row globally) always survives
        if not len(batch):
            return batch
        df = batch.to_pandas()
        sent = df[df["token"] == ""]
        rest = df[df["token"] != ""].sort_values(
            ["c", "token"], ascending=[False, True],
            kind="stable").head(k)
        return pa.Table.from_pandas(
            pd.concat([sent, rest], ignore_index=True),
            preserve_index=False)

    m = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
         .groupby("token")
         .aggregate(Sum("pq_hi", alias_name="q_hi"),
                    Sum("pq_lo", alias_name="q_lo"),
                    Sum("pc", alias_name="c"),
                    Sum("pd_", alias_name="d"))
         .map_batches(disp_cut, batch_format="pyarrow", batch_size=None)
         .repartition(1)
         .map_batches(disp_cut, batch_format="pyarrow",
                      batch_size=None)).to_pandas()    # <= k+1 rows
    out = {"token": [], "n_total": [], "n_docs_with": [], "fano": [],
           "rank": []}
    if len(m):
        drow = m[m["token"] == ""]
        big_d = int(drow["c"].iloc[0]) if len(drow) else 0
        m = m[m["token"] != ""]
        m = m.sort_values(["c", "token"], ascending=[False, True],
                          ignore_index=True, kind="stable").head(k)
        for i, r in m.iterrows():
            cc = int(r["c"])
            qq = (int(r["q_hi"]) << 31) + int(r["q_lo"])
            num = big_d * qq - cc * cc
            den = big_d * cc
            out["token"].append(r["token"])
            out["n_total"].append(cc)
            out["n_docs_with"].append(int(r["d"]))
            out["fano"].append(float(round_half_away(np.float64(
                float(num) / float(den)))) if den else None)
            out["rank"].append(i + 1)
    return ray.data.from_arrow(pa.table({
        "token": pa.array(out["token"], type=pa.string()),
        "n_total": pa.array(out["n_total"], type=pa.int64()),
        "n_docs_with": pa.array(out["n_docs_with"], type=pa.int64()),
        "fano": pa.array(out["fano"], type=pa.float64()),
        "rank": pa.array(out["rank"], type=pa.int64()),
    }))


def token_dispersion_sql(k: int = 20) -> str:
    """Oracle for :func:`token_dispersion` — HUGEINT exact moments,
    identical integer ranking and single division."""
    return rf"""
WITH tok AS (SELECT doc_id,
                    unnest(list_filter(regexp_split_to_array(
                      lower(coalesce(text, '')), '\s+'), x -> x <> ''))
                      AS token
             FROM documents),
tf AS (SELECT token, doc_id, CAST(count(*) AS HUGEINT) AS c
       FROM tok GROUP BY 1, 2),
a AS (SELECT token, CAST(sum(c * c) AS HUGEINT) AS q,
             CAST(sum(c) AS HUGEINT) AS c,
             CAST(count(*) AS BIGINT) AS d
      FROM tf GROUP BY 1),
nd AS (SELECT CAST(count(*) AS HUGEINT) AS d FROM documents)
SELECT token, CAST(a.c AS BIGINT) AS n_total, a.d AS n_docs_with,
       CASE WHEN nd.d * a.c = 0 THEN NULL
            ELSE round(CAST(nd.d * a.q - a.c * a.c AS DOUBLE)
                       / CAST(nd.d * a.c AS DOUBLE), 6) END AS fano,
       CAST(row_number() OVER (ORDER BY a.c DESC, token) AS BIGINT)
         AS rank
FROM a CROSS JOIN nd
QUALIFY row_number() OVER (ORDER BY a.c DESC, token) <= {k}
ORDER BY rank"""


def token_entropy_rate(sf_dir: str, lower: bool = True):
    """Bigram entropy rate of the corpus: the conditional entropy
    H(next token | current token) over within-document adjacent pairs
    — ONE row (n_bigrams, n_bigram_types, n_left_types, entropy_nats,
    perplexity).  The text twin of the event chain's
    markov_entropy_rate and the sequencing complement of char_entropy
    (which sees symbols, not transitions): synthetic/templated text
    collapses the perplexity long before unigram statistics move.

    Exactness: bigram and left-marginal counts are exact int64 from
    the pmi_collocations-shaped count shuffle; the fold
    acc += (n_ab/N) * ln(n_ab/n_a) runs ORDER-PINNED ascending
    (w1, w2) with libm math.log, mirrored by the oracle's list_reduce;
    H = -acc and perplexity = exp(-acc) are mirrored op-for-op.  NULL
    text == empty.

    Scale shape: per-batch packed bigram counting, the
    bigram-vocabulary-bounded shuffle, vocabulary-bounded driver fold
    (the documented rare_tokens/pmi budget).  DOCUMENTED BOUND: the
    scalar output requires the GLOBAL order-pinned ln-fold the oracle
    mirrors, so the driver frame here is the distinct-bigram table —
    superlinear in corpus size.  A web-scale variant must relax the
    fold contract (per-bucket exact Fraction partials, the hits_dist
    normalization pattern) and give up bit-parity with the recursive
    SQL mirror; until a caller needs that corpus size, exactness wins.
    """
    import math

    import ray.data
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        texts = _string_array(batch["text"])
        empty = pa.table({"w1": pa.array([], type=pa.string()),
                          "w2": pa.array([], type=pa.string()),
                          "pn": pa.array([], type=pa.int64())})
        row_idx, codes, uniques, _, _ = _token_codes(texts, lower=lower)
        if len(codes) < 2:
            return empty
        same = row_idx[1:] == row_idx[:-1]
        left, right = codes[:-1][same], codes[1:][same]
        if not len(left):
            return empty
        nu = np.int64(len(uniques))
        u, cnt = np.unique(left * nu + right, return_counts=True)
        return pa.table({
            "w1": pa.array(uniques[(u // nu).astype(np.int64)],
                           type=pa.string()),
            "w2": pa.array(uniques[(u % nu).astype(np.int64)],
                           type=pa.string()),
            "pn": pa.array(cnt.astype(np.int64)),
        })

    c = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
         .groupby(["w1", "w2"])
         .aggregate(Sum("pn", alias_name="n"))).to_pandas()
    n_total = int(c["n"].sum()) if len(c) else 0
    n_types = len(c)
    n_left = int(c["w1"].nunique()) if len(c) else 0
    ent = perp = None
    if n_total:
        lm = c.groupby("w1", sort=False)["n"].sum().to_dict()
        c = c.sort_values(["w1", "w2"], ignore_index=True)
        acc = 0.0
        for w1_, _, n_ in zip(c["w1"], c["w2"], c["n"]):
            n_ = int(n_)
            acc = acc + (float(n_) / float(n_total)) \
                * math.log(float(n_) / float(int(lm[w1_])))
        ent = float(round_half_away(np.float64(-acc)))
        perp = float(round_half_away(np.float64(math.exp(-acc))))
    return ray.data.from_arrow(pa.table({
        "n_bigrams": pa.array([n_total], type=pa.int64()),
        "n_bigram_types": pa.array([n_types], type=pa.int64()),
        "n_left_types": pa.array([n_left], type=pa.int64()),
        "entropy_nats": pa.array([ent], type=pa.float64()),
        "perplexity": pa.array([perp], type=pa.float64()),
    }))


TOKEN_ENTROPY_RATE_SQL = r"""
WITH words AS (SELECT list_filter(regexp_split_to_array(
                 lower(coalesce(text, '')), '\s+'), x -> x <> '') AS ws
               FROM documents),
bgr AS (SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
               i -> ws[i] || chr(31) || ws[i+1])) AS b
        FROM words WHERE coalesce(len(ws), 0) >= 2),
cb AS (SELECT string_split(b, chr(31))[1] AS w1,
              string_split(b, chr(31))[2] AS w2,
              CAST(count(*) AS BIGINT) AS n
       FROM bgr GROUP BY 1, 2),
lm AS (SELECT w1, CAST(sum(n) AS BIGINT) AS r FROM cb GROUP BY 1),
nn AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n,
              CAST(count(*) AS BIGINT) AS ty,
              CAST(count(DISTINCT w1) AS BIGINT) AS lt FROM cb),
f AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        list((CAST(cb.n AS DOUBLE) / CAST(nn.n AS DOUBLE))
             * ln(CAST(cb.n AS DOUBLE) / CAST(lm.r AS DOUBLE))
             ORDER BY cb.w1, cb.w2)), (a, x) -> a + x) AS acc
      FROM cb JOIN lm USING (w1) CROSS JOIN nn GROUP BY nn.n)
SELECT nn.n AS n_bigrams, nn.ty AS n_bigram_types,
       nn.lt AS n_left_types,
       CASE WHEN nn.n = 0 THEN NULL
            ELSE (SELECT round(-acc, 6) FROM f) END AS entropy_nats,
       CASE WHEN nn.n = 0 THEN NULL
            ELSE (SELECT round(exp(-acc), 6) FROM f) END AS perplexity
FROM nn"""


def zipf_abbreviation(sf_dir: str, lower: bool = True):
    """Zipf's law of abbreviation: the regression of token LENGTH on
    ln(frequency) over the corpus vocabulary — ONE row (n_types,
    n_tokens, slope, intercept, pearson_r).  Natural language shows a
    robust negative slope (frequent words are short — the
    communicative-efficiency law); machine-generated or identifier-
    heavy text flattens or inverts it, which makes the slope a cheap
    corpus-naturalness probe next to zipf_slope's rank-frequency
    exponent.

    Exactness: type frequencies and codepoint lengths are exact
    integers from the vocabulary shuffle; x = ln(freq) uses libm
    math.log once per type and the five regression moments fold
    ORDER-PINNED ascending token (list_reduce mirror); slope/intercept
    /r are one mirrored float chain, NULL on degenerate variance.

    Scale shape: the vocabulary-bounded count shuffle + a
    vocabulary-bounded driver fold (the rare_tokens budget).
    """
    import math

    import pandas as pd
    import ray.data
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        texts = _string_array(batch["text"])
        empty = pa.table({"token": pa.array([], type=pa.string()),
                          "pn": pa.array([], type=pa.int64())})
        _, codes, uniques, _, _ = _token_codes(texts, lower=lower)
        if not len(codes):
            return empty
        u, cnt = np.unique(codes, return_counts=True)
        return pa.table({
            "token": pa.array(uniques[u].tolist(), type=pa.string()),
            "pn": pa.array(cnt.astype(np.int64)),
        })

    c = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
         .groupby("token")
         .aggregate(Sum("pn", alias_name="n"))).to_pandas()
    if "token" not in c.columns:    # empty input loses the schema
        c = pd.DataFrame({"token": pd.Series(dtype=object),
                          "n": pd.Series(dtype=np.int64)})
    n_types = len(c)
    n_tokens = int(c["n"].sum()) if len(c) else 0
    slope = intercept = r = None
    if n_types >= 2:
        c = c.sort_values("token", ignore_index=True)
        sx = sy = sxx = syy = sxy = 0.0
        for t_, f_ in zip(c["token"], c["n"]):
            x = math.log(float(int(f_)))
            y = float(len(t_))
            sx += x
            sy += y
            sxx += x * x
            syy += y * y
            sxy += x * y
        nf = float(n_types)
        dx = nf * sxx - sx * sx
        dy = nf * syy - sy * sy
        if dx != 0.0:
            sl = (nf * sxy - sx * sy) / dx
            slope = float(round_half_away(np.float64(sl)))
            intercept = float(round_half_away(np.float64(
                (sy - sl * sx) / nf)))
            if dy > 0.0 and dx > 0.0:
                r = float(round_half_away(np.float64(
                    (nf * sxy - sx * sy)
                    / (math.sqrt(dx) * math.sqrt(dy)))))
    return ray.data.from_arrow(pa.table({
        "n_types": pa.array([n_types], type=pa.int64()),
        "n_tokens": pa.array([n_tokens], type=pa.int64()),
        "slope": pa.array([slope], type=pa.float64()),
        "intercept": pa.array([intercept], type=pa.float64()),
        "pearson_r": pa.array([r], type=pa.float64()),
    }))


ZIPF_ABBREVIATION_SQL = r"""
WITH tok AS (SELECT unnest(list_filter(regexp_split_to_array(
               lower(coalesce(text, '')), '\s+'), x -> x <> ''))
               AS token
             FROM documents),
c AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1),
m AS (SELECT CAST(count(*) AS BIGINT) AS v,
             CAST(coalesce(sum(n), 0) AS BIGINT) AS tot,
             CAST(count(*) AS DOUBLE) AS nf,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(ln(CAST(n AS DOUBLE)) ORDER BY token)),
               (a, x) -> a + x) AS sx,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(length(token) AS DOUBLE) ORDER BY token)),
               (a, x) -> a + x) AS sy,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(ln(CAST(n AS DOUBLE)) * ln(CAST(n AS DOUBLE))
                    ORDER BY token)), (a, x) -> a + x) AS sxx,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(length(token) AS DOUBLE)
                    * CAST(length(token) AS DOUBLE) ORDER BY token)),
               (a, x) -> a + x) AS syy,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(ln(CAST(n AS DOUBLE))
                    * CAST(length(token) AS DOUBLE) ORDER BY token)),
               (a, x) -> a + x) AS sxy
      FROM c)
SELECT v AS n_types, tot AS n_tokens,
       CASE WHEN v < 2 OR nf * sxx - sx * sx = 0.0 THEN NULL
            ELSE round((nf * sxy - sx * sy) / (nf * sxx - sx * sx), 6)
            END AS slope,
       CASE WHEN v < 2 OR nf * sxx - sx * sx = 0.0 THEN NULL
            ELSE round((sy - ((nf * sxy - sx * sy)
                              / (nf * sxx - sx * sx)) * sx) / nf, 6)
            END AS intercept,
       CASE WHEN v < 2 OR nf * sxx - sx * sx <= 0.0
                 OR nf * syy - sy * sy <= 0.0 THEN NULL
            ELSE round((nf * sxy - sx * sy)
                       / (sqrt(nf * sxx - sx * sx)
                          * sqrt(nf * syy - sy * sy)), 6) END
         AS pearson_r
FROM m"""
