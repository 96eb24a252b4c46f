"""Order-preserving uint64 <-> int64 key bias for Ray Data shuffles.

Ray Data's sort/groupby path converts uint64 key columns to pickled Python
objects (and mis-aggregates them).  Cell ids therefore travel through any
``groupby``/``sort`` as *biased int64*: ``key = (u ^ 2**63) as int64`` which
maps unsigned order onto signed order bijectively.  Data columns stay uint64.

(The reference PHP fakes unsigned compares the same way, by adding
PHP_INT_MIN — S2CellId.php:907-920; here the bias is confined to shuffle
keys only.)
"""

from __future__ import annotations

import numpy as np

_BIAS = np.uint64(1) << np.uint64(63)


def to_key(cell_ids) -> np.ndarray:
    """uint64 -> order-preserving int64 shuffle key."""
    u = np.asarray(cell_ids, dtype=np.uint64)
    return (u ^ _BIAS).view(np.int64)


def from_key(keys) -> np.ndarray:
    """int64 shuffle key -> uint64 cell id."""
    k = np.asarray(keys, dtype=np.int64)
    return k.view(np.uint64) ^ _BIAS
