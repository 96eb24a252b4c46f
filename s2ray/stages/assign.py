"""Cell-assignment stage: (lat, lng) -> S2 cell id columns.

The flagship ``map_batches`` operator (SURVEY.md par.2.2 / par.3.1):
stateless, fully vectorized, zero-copy Arrow in/out.  The Hilbert lookup
tables are process-global numpy arrays initialised at import (reference:
S2CellId.php:1012-1017) — no actor state needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernel import cellid


def assign_cells(batch: pa.Table, token_level: int | None = None,
                 lat_col: str = "lat", lng_col: str = "lng",
                 include_token: bool = False) -> pa.Table:
    """Append ``cell_id`` (uint64 leaf id) and, if ``token_level`` is given,
    ``cell_l{K}`` (uint64 ancestor); ``include_token`` additionally emits the
    hex token string (Python-loop cost — keep off in hot paths and tokenize
    the small aggregated output instead)."""
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    lng = batch[lng_col].to_numpy(zero_copy_only=False)
    ok = np.isfinite(lat) & np.isfinite(lng)
    ids = np.zeros(len(lat), dtype=np.uint64)
    if ok.all():
        ids = cellid.from_latlng_degrees(lat, lng)
    elif ok.any():
        ids[ok] = cellid.from_latlng_degrees(lat[ok], lng[ok])
    out = batch
    if "cell_id" in out.column_names:
        out = out.drop_columns(["cell_id"])
    out = out.append_column("cell_id", pa.array(ids, type=pa.uint64()))
    if token_level is not None:
        anc = np.where(ids != 0, cellid.parent(ids, token_level), np.uint64(0))
        col = f"cell_l{token_level}"
        for c in (col, "cell_token"):
            if c in out.column_names:
                out = out.drop_columns([c])
        out = out.append_column(col, pa.array(anc, type=pa.uint64()))
        if include_token:
            out = out.append_column(
                "cell_token", pa.array(cellid.to_token(anc), type=pa.string())
            )
    return out


def cell_centers(batch: pa.Table, id_col: str = "cell_id") -> pa.Table:
    """Append center_lat / center_lng (degrees) decoded from cell ids."""
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
    lat, lng = cellid.to_latlng_degrees(ids)
    out = batch.append_column("center_lat", pa.array(lat, type=pa.float64()))
    return out.append_column("center_lng", pa.array(lng, type=pa.float64()))
