"""Tile-assignment pipelines: pages -> S2 cells -> per-tile aggregates.

Flagship chain (SURVEY.md par.3.1 / par.7 step 2):
read pages -> extract_text -> extract_geotag -> drop html -> assign_cells
-> per-batch partial aggregation -> small global groupby (pre-aggregation
pattern: the all-to-all shuffle only moves (tile, partial_count) rows, never
pages).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.extract import drop_html, extract_geotag, extract_text
from ..sources.pages import read_pages
from ..stages.assign import assign_cells


def pages_with_cells(sf_dir: str, repl: int = 1, token_level: int | None = 8,
                     **read_kwargs):
    """Dataset of pages with lat/lng + cell_id (+ level-K ancestor/token)."""
    ds = read_pages(sf_dir, repl=repl, **read_kwargs)
    ds = ds.map_batches(extract_text, batch_format="pyarrow", batch_size=None)
    ds = ds.map_batches(extract_geotag, batch_format="pyarrow", batch_size=None)
    ds = ds.map_batches(drop_html, batch_format="pyarrow", batch_size=None)
    return ds.map_batches(
        assign_cells, fn_kwargs={"token_level": token_level},
        batch_format="pyarrow", batch_size=None,
    )


def _partial_tile_counts(batch: pa.Table, level: int) -> pa.Table:
    """Per-batch partial aggregate, COMPACT form: one row per batch holding
    the sorted (cell_key, count) arrays as list columns.

    np.unique instead of pa.Table.group_by (this pyarrow's hash aggregate is
    ~2000x slower than a sort-based unique on uint64), and list-rows instead
    of one row per tile so the combine step is a log-depth merge of sorted
    arrays rather than a multi-million-row sort shuffle (Ray's sort-based
    Aggregate costs ~84us/row — it dominated the whole pipeline).
    """
    from ..kernel import keys

    col = f"cell_l{level}"
    ids = batch[col].to_numpy(zero_copy_only=False).astype(np.uint64)
    u, c = np.unique(ids, return_counts=True)
    return pa.table({
        "keys": pa.array([keys.to_key(u)], type=pa.list_(pa.int64())),
        "counts": pa.array([c.astype(np.int64)], type=pa.list_(pa.int64())),
    })


def _flat_list_col(batch: pa.Table, name: str) -> np.ndarray:
    col = batch[name]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.asarray(col.flatten())


def _merge_partials(batch: pa.Table) -> pa.Table:
    """Merge compact partial rows: concatenate list values, re-aggregate.

    argsort + reduceat instead of np.unique(return_inverse) + bincount:
    12x faster on 10M-entry merges (no inverse permutation pass).
    """
    all_keys = _flat_list_col(batch, "keys")
    all_counts = _flat_list_col(batch, "counts")
    order = np.argsort(all_keys, kind="stable")
    k = all_keys[order]
    c = all_counts[order]
    if len(k) == 0:
        starts = np.empty(0, dtype=np.int64)
    else:
        starts = np.concatenate([[0], np.flatnonzero(k[1:] != k[:-1]) + 1])
    u = k[starts] if len(k) else k
    sums = np.add.reduceat(c, starts) if len(k) else c
    return pa.table({
        "keys": pa.array([u], type=pa.list_(pa.int64())),
        "counts": pa.array([sums.astype(np.int64)], type=pa.list_(pa.int64())),
    })


def tile_counts(sf_dir: str, level: int = 8, repl: int = 1, **read_kwargs):
    """Pages per level-K S2 tile: (cell_token, n_pages), Hilbert-sorted.

    Pre-aggregated per batch into compact sorted (keys, counts) list-rows,
    then tree-merged (fanout-controlled repartitions) instead of a sort
    shuffle; the final explode is already Hilbert-sorted because the merge
    preserves key order.  Keys travel as the order-preserving biased int64
    (s2ray.kernel.keys) because Ray Data pickles uint64 keys.
    """
    import ray

    ds = pages_with_cells(sf_dir, repl=repl, token_level=level, **read_kwargs)
    ds = ds.map_batches(
        _partial_tile_counts, fn_kwargs={"level": level},
        batch_format="pyarrow", batch_size=None,
    )
    # Tree reduction over compact partials: one intermediate merge level as
    # wide as the cluster, then the final merge.  (A range-bucketed variant
    # that parallelizes the final merge was tried; Ray's sort shuffle
    # handles the large binary payload rows poorly at scale.)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    mid = max(1, ncpu)
    ds = ds.repartition(mid).map_batches(_merge_partials,
                                         batch_format="pyarrow",
                                         batch_size=None)
    ds = ds.repartition(1).map_batches(_merge_partials,
                                       batch_format="pyarrow",
                                       batch_size=None)

    def finalize(batch: pa.Table) -> pa.Table:
        from ..kernel import cellid, keys

        k = _flat_list_col(batch, "keys")
        n = _flat_list_col(batch, "counts")
        ids = keys.from_key(k)
        toks = cellid.to_token(ids)
        return pa.table({
            "cell_id": pa.array(ids, type=pa.uint64()),
            "cell_token": pa.array(toks, type=pa.string()),
            "n_pages": pa.array(n, type=pa.int64()),
        })

    return ds.map_batches(finalize, batch_format="pyarrow", batch_size=None)


def write_tiles_partitioned(sf_dir: str, out_dir: str, level: int = 8,
                            partition_level: int = 2, repl: int = 1):
    """Flagship output as resumable key-range-partitioned parquet: one
    directory per level-`partition_level` ancestor cell token (Hilbert key
    ranges), each with a sidecar manifest (rows, cell range, wall time) so a
    rerun can skip complete partitions (SURVEY.md par.4 resumable-output row).
    """
    import json
    import os
    import time as _time

    import pyarrow.parquet as pq

    from ..kernel import cellid

    t0 = _time.time()
    df = tile_counts(sf_dir, level=level, repl=repl).to_pandas()
    ids = df["cell_id"].to_numpy().astype(np.uint64)
    part = cellid.parent(ids, partition_level)
    toks = cellid.to_token(part)
    df = df.assign(_part=toks)
    os.makedirs(out_dir, exist_ok=True)
    manifest_dir = os.path.join(out_dir, "_manifest")
    os.makedirs(manifest_dir, exist_ok=True)
    written = []
    for tok, grp in df.groupby("_part", sort=True):
        mp = os.path.join(manifest_dir, f"{tok}.json")
        if os.path.exists(mp):
            continue  # resume: partition complete
        pdir = os.path.join(out_dir, f"cell={tok}")
        os.makedirs(pdir, exist_ok=True)
        out_file = os.path.join(pdir, "tiles.parquet")
        tbl = pa.Table.from_pandas(grp.drop(columns=["_part"]),
                                   preserve_index=False)
        pq.write_table(tbl, out_file + ".tmp")
        os.replace(out_file + ".tmp", out_file)
        manifest = {
            "partition": tok,
            "rows": len(grp),
            "n_pages": int(grp["n_pages"].sum()),
            "cell_min": grp["cell_token"].min(),
            "cell_max": grp["cell_token"].max(),
            "wall_s": _time.time() - t0,
        }
        with open(mp + ".tmp", "w") as f:
            json.dump(manifest, f)
        os.replace(mp + ".tmp", mp)
        written.append(tok)
    return {"partitions_written": len(written),
            "partitions_total": int(df["_part"].nunique())}
