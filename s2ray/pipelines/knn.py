"""k-nearest-pages queries (brute-force vectorized baseline + per-batch top-k).

Scale path (SURVEY.md par.2.8): each batch computes distances vectorized and
keeps only its local top-k, so the global sort+limit runs over
(num_batches x k) rows instead of the whole table.  The cap-covering
pruned variant lives in spatial_join.py (cap pre-filter by covering cells).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .filters import haversine_batch


def _local_topk(batch: pa.Table, k: int, dist_col: str = "dist_m",
                id_col: str | None = "page_id") -> pa.Table:
    d = batch[dist_col].to_numpy(zero_copy_only=False)
    if len(d) <= k:
        return batch
    if id_col and id_col in batch.column_names:
        # deterministic (dist ASC, id ASC): ties at the k boundary must
        # keep the same rows the global sort (and the SQL oracle) keeps
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        idx = np.lexsort((ids, d))[:k]
    else:
        idx = np.argpartition(d, k)[:k]
    return batch.take(pa.array(np.sort(idx)))


def knn_pages(pages_ds, qlat: float, qlng: float, k: int = 10,
              keep_cols=("page_id", "url")):
    """k nearest pages to (qlat, qlng) by haversine distance (meters)."""
    cols = list(keep_cols)

    def stage(batch: pa.Table) -> pa.Table:
        batch = haversine_batch(batch, qlat, qlng)
        batch = batch.select(cols + ["dist_m"])
        return _local_topk(batch, k)

    ds = pages_ds.map_batches(stage, batch_format="pyarrow", batch_size=None)
    tie = "page_id" if "page_id" in cols else None
    return ds.sort(["dist_m", tie] if tie else "dist_m").limit(k)


def knn_pages_pruned(pages_ds, qlat: float, qlng: float, k: int = 10,
                     keep_cols=("page_id", "url"), init_radius_m: float = 50000.0,
                     max_radius_m: float = 2.1e7):
    """Cap-covering-pruned kNN (SURVEY.md par.2.8): candidates are filtered by
    membership of their leaf cell in the covering of a query cap whose radius
    doubles until >= k candidates pass; exact haversine + top-k refine.

    Two-pass design: a cheap distributed count pass per radius (counts only),
    then one exact pass at the chosen radius.  At scale the count pass reads
    only the cell_id column; the exact pass computes distances for the ~k
    candidate rows instead of the whole table.
    """
    import ray

    from ..kernel import cellunion, sphere
    from ..kernel.coverer import covering_of
    from ..kernel.region import Cap

    cols = list(keep_cols)
    # ONE statistics pass: per-batch histogram of exact distances against
    # the whole geometric radius ladder at once (the old design re-scanned
    # the dataset once per radius doubling — up to ~9 full scans).  The
    # pass projects only lat/lng, so on a parquet source only those columns
    # leave storage.
    radii = []
    r = init_radius_m
    while r < max_radius_m:
        radii.append(r)
        r *= 2.0
    radii.append(max_radius_m)
    edges = np.asarray(radii, dtype=np.float64)

    def count_stage(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        d = sphere.haversine_distance_m(np.radians(lat), np.radians(lng),
                                        np.radians(qlat), np.radians(qlng))
        # counts[i] = #points with d <= edges[i]
        idx = np.searchsorted(edges, d, side="left")
        h = np.bincount(idx, minlength=len(edges) + 1)[:len(edges)]
        cum = np.cumsum(h).astype(np.int64)
        return pa.table({f"n{i}": pa.array([int(cum[i])], type=pa.int64())
                         for i in range(len(edges))})

    sums = (pages_ds.select_columns(["lat", "lng"])
            .map_batches(count_stage, batch_format="pyarrow",
                         batch_size=None)
            .sum([f"n{i}" for i in range(len(edges))]))
    radius = float(edges[-1])
    for i, e_ in enumerate(edges):
        if sums[f"sum(n{i})"] >= k:
            radius = float(e_)
            break

    cap = Cap.from_latlng_radius(qlat, qlng, radius)
    cover = cellunion.normalize(covering_of(cap, max_cells=16))
    cover_ref = ray.put(cover)

    def filter_stage(batch: pa.Table, cover_ref=cover_ref) -> pa.Table:
        cov = ray.get(cover_ref)
        leaf = batch["cell_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        mask = cellunion.contains_leaf_ids(cov, leaf)
        batch = batch.filter(pa.array(mask))
        batch = haversine_batch(batch, qlat, qlng)
        batch = batch.select(cols + ["dist_m"])
        return _local_topk(batch, k)

    ds = pages_ds.map_batches(filter_stage, batch_format="pyarrow",
                              batch_size=None)
    tie = "page_id" if "page_id" in cols else None
    return ds.sort(["dist_m", tie] if tie else "dist_m").limit(k)
