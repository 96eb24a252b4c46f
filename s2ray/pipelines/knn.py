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


def _local_topk(batch: pa.Table, k: int, dist_col: str = "dist_m") -> pa.Table:
    d = batch[dist_col].to_numpy(zero_copy_only=False)
    if len(d) <= k:
        return batch
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
    return ds.sort("dist_m").limit(k)
