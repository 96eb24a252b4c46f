"""Schema-clean parquet reads for the sf test tables.

``ray.data.read_parquet`` hashes fragment schemas to deduplicate read
tasks; the sf parquet files carry pandas metadata (a dict) in their
schema, which is unhashable and makes Ray log ``Failed to hash the
schemas (for deduplication)`` once per read task.  Passing an explicit
metadata-free schema (subset to the requested columns) removes the spam
and pins the block schema at the source.
"""

from __future__ import annotations

import pyarrow as pa


def read_table(sf_dir: str, table: str, columns: list[str] | None = None,
               **kwargs):
    """ray.data.read_parquet of ``{sf_dir}/{table}.parquet`` with a
    metadata-free (and column-pruned) explicit schema."""
    import pyarrow.parquet as pq
    import ray.data

    path = f"{sf_dir}/{table}.parquet"
    full = pq.read_schema(path).remove_metadata()
    if columns is not None:
        schema = pa.schema([full.field(c) for c in columns])
    else:
        schema = full
    return ray.data.read_parquet(path, columns=columns, schema=schema,
                                 **kwargs)


def load_embedding_matrix(sf_dir: str):
    """(vec_ids, L2-normalized matrix) of the FULL embeddings table — the
    one sanctioned whole-table driver read, used only by operators whose
    semantics ARE a broadcast of the full matrix (embedding_near_dup's
    checkable baseline).  Scale paths (LSH/IVF) never call this."""
    import pyarrow.parquet as pq

    from ..functions.vecs import normalized_matrix

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    return t["vec_id"].to_numpy(), normalized_matrix(t["embedding"])
