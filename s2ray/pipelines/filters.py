"""Region filter pipelines over pages (rect / cap predicates, vectorized).

Rect semantics follow S2LatLngRect (reference S2LatLngRect.php:26-599):
lat is a closed R1 interval, lng an S1 interval that may wrap across the
antimeridian (lo > hi means wrapping; reference S1Interval.php:89-92).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernel import sphere


def rect_contains(lat_deg, lng_deg, lat_lo, lat_hi, lng_lo, lng_hi):
    """Vectorized point-in-rect (degrees), honouring lng wrap."""
    lat = np.asarray(lat_deg, dtype=np.float64)
    lng = np.asarray(lng_deg, dtype=np.float64)
    in_lat = (lat >= lat_lo) & (lat <= lat_hi)
    if lng_lo <= lng_hi:
        in_lng = (lng >= lng_lo) & (lng <= lng_hi)
    else:  # wrapping interval
        in_lng = (lng >= lng_lo) | (lng <= lng_hi)
    return in_lat & in_lng


def rect_filter_batch(batch: pa.Table, lat_lo, lat_hi, lng_lo, lng_hi) -> pa.Table:
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    lng = batch["lng"].to_numpy(zero_copy_only=False)
    mask = rect_contains(lat, lng, lat_lo, lat_hi, lng_lo, lng_hi)
    return batch.filter(pa.array(mask))


def rect_distance_batch(batch: pa.Table, lat_lo, lat_hi, lng_lo, lng_hi,
                        out_col: str = "dist_m",
                        radius_m: float = 6371000.0) -> pa.Table:
    """Append the min great-circle distance (meters) from each page to the
    rect (degrees, lng may wrap) — LatLngRect.get_distance_latlng applied
    vectorized; 0.0 inside the rect."""
    from ..kernel.region import LatLngRect

    rect = LatLngRect.from_degrees(lat_lo, lng_lo, lat_hi, lng_hi)
    lat = sphere.degrees_to_radians(batch["lat"].to_numpy(zero_copy_only=False))
    lng = sphere.degrees_to_radians(batch["lng"].to_numpy(zero_copy_only=False))
    d = rect.get_distance_latlng(lat, lng) * radius_m
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, pa.array(d, type=pa.float64()))


def haversine_batch(batch: pa.Table, qlat_deg: float, qlng_deg: float,
                    out_col: str = "dist_m") -> pa.Table:
    """Append haversine distance (meters) to a fixed query point."""
    lat = sphere.degrees_to_radians(batch["lat"].to_numpy(zero_copy_only=False))
    lng = sphere.degrees_to_radians(batch["lng"].to_numpy(zero_copy_only=False))
    d = sphere.haversine_distance_m(
        lat, lng,
        sphere.degrees_to_radians(qlat_deg), sphere.degrees_to_radians(qlng_deg),
    )
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, pa.array(d, type=pa.float64()))
