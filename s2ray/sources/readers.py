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
