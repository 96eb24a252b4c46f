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
