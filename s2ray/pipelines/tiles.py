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
    ds = ds.map_batches(extract_text, batch_format="pyarrow")
    ds = ds.map_batches(extract_geotag, batch_format="pyarrow")
    ds = ds.map_batches(drop_html, batch_format="pyarrow")
    return ds.map_batches(
        assign_cells, fn_kwargs={"token_level": token_level},
        batch_format="pyarrow",
    )


def _partial_tile_counts(batch: pa.Table, level: int) -> pa.Table:
    from ..kernel import keys

    col = f"cell_l{level}"
    g = batch.group_by(col).aggregate([(col, "count")])
    ids = g[col].to_numpy(zero_copy_only=False).astype(np.uint64)
    return pa.table({
        "cell_key": pa.array(keys.to_key(ids), type=pa.int64()),
        "partial_n": g[f"{col}_count"],
    })


def tile_counts(sf_dir: str, level: int = 8, repl: int = 1, **read_kwargs):
    """Pages per level-K S2 tile: (cell_token, n_pages), Hilbert-sorted.

    Pre-aggregated per batch, so the shuffle moves (tile, partial_n) rows
    only; the groupby/sort key is the order-preserving biased int64
    (s2ray.kernel.keys) because Ray Data pickles uint64 keys.
    """
    from ray.data.aggregate import Sum

    ds = pages_with_cells(sf_dir, repl=repl, token_level=level, **read_kwargs)
    ds = ds.map_batches(
        _partial_tile_counts, fn_kwargs={"level": level}, batch_format="pyarrow"
    )
    agg = ds.groupby("cell_key").aggregate(Sum("partial_n", alias_name="n_pages"))

    def finalize(batch: pa.Table) -> pa.Table:
        from ..kernel import cellid, keys

        ids = keys.from_key(batch["cell_key"].to_numpy(zero_copy_only=False))
        toks = cellid.to_token(ids)
        return pa.table({
            "cell_key": batch["cell_key"],
            "cell_id": pa.array(ids, type=pa.uint64()),
            "cell_token": pa.array(toks, type=pa.string()),
            "n_pages": batch["n_pages"],
        })

    return (
        agg.map_batches(finalize, batch_format="pyarrow")
        .sort("cell_key")
        .drop_columns(["cell_key"])
    )
