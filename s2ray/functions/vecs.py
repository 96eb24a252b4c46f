"""Zero-copy embedding-column helpers.

The embeddings table stores vectors as ``list<float>`` (uniform length).
``np.stack(col.to_pandas().values)`` materializes one Python object per row;
at 100 TB that object round-trip dominates every embedding stage.  These
helpers flatten the Arrow list buffer directly (one contiguous values array,
zero copies until the final dtype cast) and probe the vector dimension from
a single row instead of reading any whole table on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def embedding_matrix(col, dim: int | None = None,
                     dtype=np.float64) -> np.ndarray:
    """(N, dim) ndarray from a ``list<float>`` column — flattens the Arrow
    values buffer (zero-copy) and reshapes; the only copy is the dtype cast.

    Assumes uniform list length and no null vectors (both hold for the
    embeddings table by construction; a ragged column would fail the
    reshape loudly rather than silently mis-slice).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    flat = col.flatten()
    vals = flat.to_numpy(zero_copy_only=False)
    if n == 0:
        return np.empty((0, dim or 0), dtype=dtype)
    if dim is None:
        dim = len(vals) // n
    return np.ascontiguousarray(vals.reshape(n, dim), dtype=dtype)


def normalized_matrix(col, dim: int | None = None) -> np.ndarray:
    """L2-normalized rows of :func:`embedding_matrix`."""
    mat = embedding_matrix(col, dim)
    return mat / np.maximum(1e-300, np.linalg.norm(mat, axis=1, keepdims=True))


def embedding_dim(parquet_path: str, column: str = "embedding") -> int:
    """Vector dimension from ONE row of ONE row group — never a whole-table
    driver read (list<float> schemas don't carry the length, so a 1-row
    probe is the minimal metadata access)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(parquet_path)
    typ = pf.schema_arrow.field(column).type
    if hasattr(typ, "list_size"):          # fixed_size_list carries it
        return int(typ.list_size)
    first = next(pf.iter_batches(batch_size=1, columns=[column]), None)
    if first is None or len(first) == 0:   # empty table: no rows to probe
        return 0
    return len(first[column][0])


def read_query_vectors(parquet_path: str, query_ids,
                       id_col: str = "vec_id",
                       column: str = "embedding"):
    """(ids, normalized matrix) for the given query ids, read with a
    row-group-pruning parquet filter — the driver never loads the table."""
    import pyarrow.parquet as pq

    ids = [int(q) for q in query_ids]
    t = pq.read_table(parquet_path, columns=[id_col, column],
                      filters=[(id_col, "in", ids)])
    # keep caller's query order irrelevant: sort by id for determinism
    t = t.sort_by(id_col)
    q_ids = t[id_col].to_numpy()
    return q_ids, normalized_matrix(t[column])


def synthetic_vectors(ids, dim: int, dtype=np.float32) -> np.ndarray:
    """Deterministic (id, component) -> uniform[-1, 1) matrix via the
    splitmix64 finalizer — a reproducible synthetic embedding corpus for
    benchmarks and tests.  Stateless: any worker can generate any shard
    from ids alone (no RNG object, no seed coordination)."""
    ids = np.asarray(ids).astype(np.uint64)
    # in-place mixing: the naive chained form allocates ~5 (N, dim)
    # temporaries and turns generation memory-bound at high concurrency
    z = ids[:, None] * np.uint64(dim)
    z = z + np.arange(dim, dtype=np.uint64)[None, :]
    z += np.uint64(0x9E3779B97F4A7C15)
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    z >>= np.uint64(11)
    out = z.astype(np.float64)
    out *= 2.0 ** -52
    out -= 1.0
    return out.astype(dtype, copy=False) if dtype == np.float64 \
        else out.astype(dtype)
