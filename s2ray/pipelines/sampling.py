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
import pyarrow as pa

_MIX = 0x9E3779B97F4A7C15   # 2^64 / phi (splitmix64 / Fibonacci hashing)
_SHIFT = 33                 # keep the well-mixed high bits
_BP = 10000                 # basis points


def _hash_bp(ids: np.ndarray) -> np.ndarray:
    """doc_id -> pseudo-uniform value in [0, 10000)."""
    h = ids.astype(np.uint64) * np.uint64(_MIX)     # mod 2^64 wrap
    return ((h >> np.uint64(_SHIFT)) % np.uint64(_BP)).astype(np.int64)


def hash_bp_sql(id_expr: str = "doc_id") -> str:
    """The same value in DuckDB HUGEINT arithmetic."""
    return (f"CAST((((CAST({id_expr} AS HUGEINT) * {_MIX}) % "
            f"{1 << 64}) // {1 << _SHIFT}) % {_BP} AS BIGINT)")


def sample_corpus(sf_dir: str, rates_bp: dict[str, int],
                  keep_cols=("doc_id", "source")):
    """Stratified deterministic sample of the documents table: keep a row
    iff hash_bp(doc_id) < rates_bp[source] (missing sources drop to 0).
    Pure per-batch filter — no shuffle, no state, resumable for free."""
    import ray

    cols = sorted(set(keep_cols) | {"doc_id", "source"})
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)
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
