"""Deterministic corpus sampling: uniform and per-stratum rates.

Training-data pipelines sample by SOURCE quality tier (e.g. wiki at 100%,
crawl at 10%) and need the decision to be a pure function of the row key so
that re-runs, resumes and replicas agree without coordination.  The keep
rule is a splitmix-style multiplicative hash of doc_id reduced to basis
points — expressible in both numpy uint64 arithmetic and DuckDB HUGEINT
arithmetic, so the operator is SQL-oracle-checkable end to end.
"""

from __future__ import annotations

import numpy as np

from ..sources.readers import read_table
import pyarrow as pa

_MIX = 0x9E3779B97F4A7C15   # 2^64 / phi (splitmix64 / Fibonacci hashing)
_SHIFT = 33                 # keep the well-mixed high bits
_BP = 10000                 # basis points


def _hash_bp(ids: np.ndarray) -> np.ndarray:
    """doc_id -> pseudo-uniform value in [0, 10000)."""
    h = ids.astype(np.uint64) * np.uint64(_MIX)     # mod 2^64 wrap
    return ((h >> np.uint64(_SHIFT)) % np.uint64(_BP)).astype(np.int64)


def _mulmix_sql(id_expr: str) -> str:
    """``uint64(id) * MIX mod 2^64`` in DuckDB HUGEINT — including the
    uint64 WRAP of negative ids and a split 32-bit modular multiply so the
    product never exceeds INT128 (a naive ``id * MIX % 2^64`` overflows
    for u >= 2^63 and takes the sign of a negative dividend, diverging
    from numpy's uint64 arithmetic — caught by the negative-id stress
    sweep)."""
    m = 1 << 64
    mh, ml = _MIX >> 32, _MIX & 0xFFFFFFFF
    u = f"(((CAST({id_expr} AS HUGEINT) % {m}) + {m}) % {m})"
    return f"(((({u} * {mh}) % {1 << 32}) * {1 << 32} + {u} * {ml}) % {m})"


def hash_bp_sql(id_expr: str = "doc_id") -> str:
    """The same value in DuckDB HUGEINT arithmetic (see _mulmix_sql)."""
    return (f"CAST(({_mulmix_sql(id_expr)} // {1 << _SHIFT}) % {_BP} "
            f"AS BIGINT)")


def sample_corpus(sf_dir: str, rates_bp: dict[str, int],
                  keep_cols=("doc_id", "source")):
    """Stratified deterministic sample of the documents table: keep a row
    iff hash_bp(doc_id) < rates_bp[source] (missing sources drop to 0).
    Pure per-batch filter — no shuffle, no state, resumable for free."""
    import ray

    cols = sorted(set(keep_cols) | {"doc_id", "source"})
    ds = read_table(sf_dir, "documents", columns=cols)
    keep_list = list(keep_cols)

    def stage(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        src = np.asarray(batch["source"].to_pandas(), dtype=object)
        bp = _hash_bp(ids)
        thresh = np.fromiter((rates_bp.get(s, 0) for s in src),
                             count=len(src), dtype=np.int64)
        return batch.filter(pa.array(bp < thresh)).select(keep_list)

    return ds.map_batches(stage, batch_format="pyarrow", batch_size=None)


def sample_corpus_sql(rates_bp: dict[str, int]) -> str:
    if not rates_bp:   # CASE with no WHEN arm is a parse error
        return "SELECT doc_id, source FROM documents WHERE FALSE"
    cases = " ".join(f"WHEN source = '{s}' THEN {r}"
                     for s, r in sorted(rates_bp.items()))
    return (f"SELECT doc_id, source FROM documents "
            f"WHERE {hash_bp_sql('doc_id')} < (CASE {cases} ELSE 0 END)")


def weighted_sample(sf_dir: str, weight_col: str = "n_chars",
                    bp_per_unit: int = 2, id_col: str = "doc_id"):
    """Probability-proportional-to-size (PPS) Bernoulli sampling: keep a
    doc with probability min(1, weight * bp_per_unit / 10000) — the
    quality/length-weighted subsampling step of a training-data mix
    (longer or higher-scoring docs kept at higher rate), done entirely in
    integer arithmetic so the decision is a pure function of (doc_id,
    weight) that every worker, resume and replica agrees on, and that a
    DuckDB HUGEINT mirror reproduces bit-exactly.

    Unlike ``sample_corpus`` (per-stratum uniform rates keyed on a
    categorical column), the threshold here varies continuously per row
    with a numeric weight.  Pure per-batch filter — no shuffle, no state,
    no driver materialization; NULL weights drop the row (SQL NULL
    comparison parity)."""
    cols = sorted({id_col, weight_col, "source"})
    ds = read_table(sf_dir, "documents", columns=cols)

    def stage(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        w = batch[weight_col].to_numpy(zero_copy_only=False)
        wv = np.nan_to_num(w.astype(np.float64), nan=-1.0)
        thr = np.minimum(np.int64(_BP),
                         (wv * bp_per_unit).astype(np.int64))
        keep = _hash_bp(ids) < thr
        return batch.filter(pa.array(keep)).select(
            [id_col, "source", weight_col])

    return ds.map_batches(stage, batch_format="pyarrow", batch_size=None)


def weighted_sample_sql(weight_col: str = "n_chars",
                        bp_per_unit: int = 2,
                        id_col: str = "doc_id") -> str:
    return (f"SELECT {id_col}, source, {weight_col} FROM documents "
            f"WHERE {hash_bp_sql(id_col)} < "
            f"LEAST({_BP}, CAST({weight_col} AS BIGINT) * {bp_per_unit})")


def sample_n_per_group(sf_dir: str, n: int = 10, group_col: str = "lang",
                       id_col: str = "doc_id"):
    """Deterministic fixed-size per-group sample: the n rows with the
    smallest hash_bp-style mixed hash of the id within each group (a
    reproducible 'take N per language' for eval-set construction).

    Per-batch local top-n per group, then a tiny global merge — the
    shuffle moves at most n rows per (group, batch)."""
    import ray

    ds = read_table(sf_dir, "documents", columns=[id_col, group_col])

    def local_topn(batch: pa.Table) -> pa.Table:
        import pandas as pd

        ids = batch[id_col].to_numpy(zero_copy_only=False)
        grp = np.asarray(batch[group_col].to_pandas(), dtype=object)
        h = (ids.astype(np.uint64) * np.uint64(_MIX)).astype(np.uint64)
        df = pd.DataFrame({id_col: ids, group_col: grp,
                           "_h": h.astype(np.int64) ^ np.int64(-2**63)})
        df = (df.sort_values("_h").groupby(group_col, sort=False)
              .head(n))
        return pa.Table.from_pandas(df, preserve_index=False)

    def merge(df) -> "pd.DataFrame":
        import pandas as pd

        if len(df) == 0:
            return pd.DataFrame({
                id_col: pd.Series(dtype=np.int64),
                group_col: pd.Series(dtype=object),
            })
        df = df.sort_values("_h").head(n)
        return df[[id_col, group_col]]

    return (ds.map_batches(local_topn, batch_format="pyarrow",
                           batch_size=None)
            .groupby(group_col)
            .map_groups(merge, batch_format="pandas"))


def sample_n_per_group_sql(n: int = 10, group_col: str = "lang",
                           id_col: str = "doc_id") -> str:
    # order by the same mixed hash; the sign-flip XOR maps the uint64 mix
    # onto ordered int64 exactly like the engine's `_h`
    h = f"CAST({_mulmix_sql(id_col)} AS UBIGINT)"
    return (f"SELECT {id_col}, {group_col} FROM ("
            f"SELECT {id_col}, {group_col}, row_number() OVER ("
            f"PARTITION BY {group_col} ORDER BY {h}) AS rn "
            f"FROM documents) WHERE rn <= {n}")


def split_corpus(sf_dir: str, val_bp: int = 500, test_bp: int = 500,
                 id_col: str = "doc_id"):
    """Deterministic train/val/test assignment: (doc_id, split) with
    split = 'test' for hash_bp < test_bp, 'val' for the next val_bp basis
    points, 'train' otherwise.  A pure per-row function of the id — every
    worker, re-run and downstream consumer agrees on the split without
    coordination or a membership table; no shuffle, no state.
    """
    import ray

    ds = read_table(sf_dir, "documents", columns=[id_col])
    labels = np.array(["test", "val", "train"], dtype=object)

    def stage(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        bp = _hash_bp(ids)
        sel = np.where(bp < test_bp, 0,
                       np.where(bp < test_bp + val_bp, 1, 2))
        return pa.table({
            id_col: pa.array(ids, type=pa.int64()),
            "split": pa.array(labels[sel].tolist(), type=pa.string()),
        })

    return ds.map_batches(stage, batch_format="pyarrow", batch_size=None)


def split_corpus_sql(val_bp: int = 500, test_bp: int = 500) -> str:
    h = hash_bp_sql("doc_id")
    return (f"SELECT doc_id, CASE WHEN {h} < {test_bp} THEN 'test' "
            f"WHEN {h} < {test_bp + val_bp} THEN 'val' "
            f"ELSE 'train' END AS split FROM documents")


def source_mix(sf_dir: str, target_bp_scale: int = _BP):
    """Temperature-smoothed dataset mixing (alpha = 0.5): per-source keep
    rates proportional to sqrt(source share) — the standard flattening of
    source skew in LLM pre-training mixes — applied with the same
    deterministic hash_bp rule as sample_corpus, reported as a per-source
    audit table (source, n_docs, rate_bp, n_kept).

    Rates are DERIVED FROM THE DATA (unlike sample_corpus's user-given
    rates): pass 1 is a source-cardinality count groupby; the driver
    computes rate_bp = floor(sqrt(n_s / N) * 10000) — n_s / N is one
    float64 division and IEEE-754 sqrt is correctly rounded, so both
    engines floor the identical double — and broadcasts the tiny dict;
    pass 2 is one streaming bincount of kept docs per source.  NULL
    sources form their own group (sentinel shuffle key).
    """
    import ray
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["doc_id", "source"])

    def count_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        src = batch["source"].to_pandas()
        key = src.where(src.notna(), "\x00").astype(str)
        g = key.groupby(key, sort=False).size()
        return pa.table({
            "gk": pa.array(g.index.to_numpy(), type=pa.string()),
            "pn": pa.array(g.to_numpy().astype(np.int64)),
        })

    cnt = (ds.map_batches(count_partial, batch_format="pyarrow",
                          batch_size=None)
           .groupby("gk")
           .aggregate(Sum("pn", alias_name="n"))).to_pandas()
    total = int(cnt["n"].sum())
    rates = {}
    for r in cnt.itertuples():
        share = int(r.n) / total          # one float64 division
        rates[r.gk] = int(np.floor(np.sqrt(share) * target_bp_scale))
    r_ref = ray.put(rates)

    def kept_partial(batch: pa.Table, r_ref=r_ref) -> pa.Table:
        import pandas as pd

        from ..state.bcast import cached_get

        rt = cached_get(r_ref)
        src = batch["source"].to_pandas()
        key = src.where(src.notna(), "\x00").astype(str)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        bp = _hash_bp(ids)
        thr = key.map(rt).to_numpy().astype(np.int64)
        kept = (bp < thr).astype(np.int64)
        df = pd.DataFrame({"gk": key, "pk": kept})
        g = df.groupby("gk", sort=False)["pk"].sum()
        return pa.table({
            "gk": pa.array(g.index.to_numpy(), type=pa.string()),
            "pk": pa.array(g.to_numpy().astype(np.int64)),
        })

    kept = (ds.map_batches(kept_partial, batch_format="pyarrow",
                           batch_size=None)
            .groupby("gk")
            .aggregate(Sum("pk", alias_name="n_kept"))).to_pandas()
    out = cnt.merge(kept, on="gk", how="left")
    out["n_kept"] = out["n_kept"].fillna(0).astype(np.int64)
    import pandas as pd

    return pd.DataFrame({
        "source": out["gk"].where(out["gk"] != "\x00", None),
        "n_docs": out["n"].astype(np.int64),
        "rate_bp": out["gk"].map(rates).astype(np.int64),
        "n_kept": out["n_kept"],
    }).sort_values("source", ignore_index=True)
