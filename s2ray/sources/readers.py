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


def load_doc_langs(sf_dir: str):
    """(doc_ids SORTED ascending, aligned lang object array) — a 2-column
    driver projection used only by broadcast-baseline operators that ship
    the full corpus matrix anyway (cross_lang_nn); the sort makes the
    ids searchsorted-probeable on workers."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "lang"]).sort_by("doc_id")
    return (t["doc_id"].to_numpy(),
            np.asarray(t["lang"].to_pandas(), dtype=object))


def _coerce_to_schema(schema: pa.Schema):
    """map_batches fn casting parsed text-format batches to an arrow
    schema, so JSONL/CSV reads feed operators the SAME types the parquet
    path does (JSON loses timestamp/width information; CSV loses all)."""

    def coerce(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = {}
        for f in schema:
            if f.name in batch.column_names:
                col = batch[f.name]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                if col.type == f.type:
                    cols[f.name] = col
                elif pa.types.is_timestamp(f.type) and (
                        pa.types.is_floating(col.type)
                        or pa.types.is_integer(col.type)):
                    # a numeric timestamp column is epoch SECONDS (how
                    # ray's JSON sink serializes timestamps); NB float
                    # seconds carry ~0.24us quantization — write_jsonl
                    # stringifies timestamps so its round trip is exact
                    us = pc.round(pc.multiply(col.cast(pa.float64()),
                                              1_000_000.0))
                    cols[f.name] = us.cast(pa.int64()).cast(f.type)
                else:
                    cols[f.name] = col.cast(f.type)
            else:
                cols[f.name] = pa.nulls(len(batch), f.type)
        return pa.table(cols)

    return coerce


def read_jsonl(path: str, columns: list[str] | None = None,
               schema: pa.Schema | None = None, **kwargs):
    """ray.data.read_json (newline-delimited) with optional schema
    coercion + column pruning — the JSONL twin of :func:`read_table`."""
    import ray.data

    ds = ray.data.read_json(path, **kwargs)
    if schema is not None:
        ds = ds.map_batches(_coerce_to_schema(schema),
                            batch_format="pyarrow", batch_size=None)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds


def read_csv(path: str, columns: list[str] | None = None,
             schema: pa.Schema | None = None, **kwargs):
    """ray.data.read_csv with optional schema coercion + pruning."""
    import ray.data

    ds = ray.data.read_csv(path, **kwargs)
    if schema is not None:
        ds = ds.map_batches(_coerce_to_schema(schema),
                            batch_format="pyarrow", batch_size=None)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds


def write_jsonl(ds, path: str, **kwargs):
    """Distributed newline-delimited JSON sink (one file per block).

    Timestamp columns are stringified first (ISO, microsecond-exact):
    ray's JSON sink would otherwise emit float epoch seconds, which
    cannot represent microseconds exactly (double ulp ~0.24us there).
    Pass the original parquet schema to :func:`read_jsonl` to get the
    arrow types back losslessly."""

    def stringify_ts(batch: pa.Table) -> pa.Table:
        cols = {}
        for name in batch.column_names:
            col = batch[name]
            if pa.types.is_timestamp(col.type):
                col = col.cast(pa.string())
            cols[name] = col
        return pa.table(cols)

    ds.map_batches(stringify_ts, batch_format="pyarrow",
                   batch_size=None).write_json(path, **kwargs)


def write_csv(ds, path: str, **kwargs):
    """Distributed CSV sink (one file per block)."""
    ds.write_csv(path, **kwargs)


def read_arrow_ipc(path: str, columns: list[str] | None = None,
                   **kwargs):
    """Arrow IPC (Feather v2 / .arrow stream-or-file) source: streams
    one IPC file per read task via ``read_binary_files`` and decodes in
    the task (zero driver materialization; each file becomes one or more
    Arrow blocks).  The IPC twin of :func:`read_table` for hand-offs
    from other Arrow-native tools.
    """
    import ray.data

    raw = ray.data.read_binary_files(path, **kwargs)

    def decode(batch: pa.Table) -> pa.Table:
        tabs = []
        for b in batch["bytes"]:
            buf = pa.py_buffer(b.as_py())
            try:
                t = pa.ipc.open_file(buf).read_all()
            except pa.lib.ArrowInvalid:
                t = pa.ipc.open_stream(buf).read_all()
            tabs.append(t.select(columns) if columns is not None else t)
        return pa.concat_tables(tabs) if tabs else pa.table({})

    return raw.map_batches(decode, batch_format="pyarrow",
                           batch_size=None)


def write_arrow_ipc(ds, out_dir: str) -> int:
    """Distributed Arrow IPC (Feather v2) sink: one ``.arrow`` file per
    block, written inside the map task (the driver never sees a row).
    Returns the number of files written."""
    import os
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        if not len(batch):
            return pa.table({"path": pa.array([], type=pa.string()),
                             "rows": pa.array([], type=pa.int64())})
        p = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.arrow")
        with pa.OSFile(p, "wb") as f, \
                pa.ipc.new_file(f, batch.schema) as w:
            w.write_table(batch)
        return pa.table({"path": pa.array([p], type=pa.string()),
                         "rows": pa.array([len(batch)], type=pa.int64())})

    manifest = ds.map_batches(write_block, batch_format="pyarrow",
                              batch_size=None).take_all()
    return len(manifest)
