"""CellUnion: a region as a normalized set of disjoint cell intervals.

The reference's pivotal join/index representation (S2CellUnion.php:3-9).
Stored as a sorted numpy uint64 array; all set algebra is vectorized
(searchsorted) rather than the reference's per-object loops — same
semantics, columnar execution.

Reference parity:
- normalize (sort, drop contained, merge 4 siblings)  S2CellUnion.php:591-661
- denormalize(minLevel, levelMod)                     S2CellUnion.php:111-135
- contains/intersects(id) via interval binary search  S2CellUnion.php:155-220
  (the port's binarySearch at :668 is buggy array_search on objects; we use
  the indexedBinarySearch semantics at :326-348)
- union/intersection                                  S2CellUnion.php:227-313
- expand(level | angle, maxLevelDiff)                 S2CellUnion.php:354-416
- measures                                            S2CellUnion.php:493-548
"""

from __future__ import annotations

import math

import numpy as np

from . import cellid as ci
from . import sphere

_U = np.uint64


def _contains1(a: np.uint64, b: np.uint64) -> bool:
    lsb = a & (~a + _U(1))
    return a - (lsb - _U(1)) <= b <= a + (lsb - _U(1))


def normalize(ids) -> np.ndarray:
    """Sort, remove contained duplicates, merge complete sibling groups
    (canonical algorithm of S2CellUnion.php:591-661)."""
    ids = np.unique(np.asarray(ids, dtype=np.uint64))  # sorted unique
    out: list = []
    for cid in ids:
        if out and _contains1(out[-1], cid):
            continue
        while out and _contains1(cid, out[-1]):
            out.pop()
        # Merge the last three cells + cid into their parent when they are
        # 4 siblings (XOR trick + same-parent mask + not-a-face guard;
        # S2CellUnion.php:623-636).
        while len(out) >= 3 and _are_siblings(out[-3], out[-2], out[-1], cid):
            cid = ci.parent(np.array([cid]))[0]
            del out[-3:]
        out.append(cid)
    return np.array(out, dtype=np.uint64)


def _are_siblings(a, b, c, d) -> bool:
    if (a ^ b ^ c) != d:
        return False
    lsb = d & (~d + _U(1))
    if lsb == _U(1) << _U(60):  # face cell: no parent
        return False
    mask = lsb << _U(1)
    mask = ~(mask + (mask << _U(1)))
    d_masked = d & mask
    return (a & mask) == d_masked and (b & mask) == d_masked and (c & mask) == d_masked


def denormalize(ids, min_level: int, level_mod: int) -> np.ndarray:
    """Replace cells with their descendants meeting level constraints
    (reference S2CellUnion.php:111-135)."""
    ids = np.asarray(ids, dtype=np.uint64)
    out = []
    for cid in ids:
        arr = np.array([cid])
        lvl = int(ci.level(arr)[0])
        new_level = max(min_level, lvl)
        if level_mod > 1:
            new_level += (ci.MAX_LEVEL - (new_level - min_level)) % level_mod
            new_level = min(ci.MAX_LEVEL, new_level)
        if new_level == lvl:
            out.append(cid)
        else:
            # all children at new_level: iterate the child range
            begin = ci.child_begin(arr, new_level)[0]
            end = ci.child_end(arr, new_level)[0]
            step = ci.lowest_on_bit(np.array([begin]))[0] << _U(1)
            n = int((end - begin) // step)
            out.extend((begin + step * np.arange(n, dtype=np.uint64)).tolist())
    return np.array(out, dtype=np.uint64)


def contains_ids(union_ids: np.ndarray, query: np.ndarray) -> np.ndarray:
    """Vectorized: for each query cell id, is it contained in the union?

    Containment test: the union cell at searchsorted position covers the
    query's range (interval semantics, S2CellUnion.php:155-180).
    """
    u = np.asarray(union_ids, dtype=np.uint64)
    q = np.asarray(query, dtype=np.uint64)
    if len(u) == 0:
        return np.zeros(len(q), dtype=bool)
    qmin = ci.range_min(q)
    qmax = ci.range_max(q)
    # candidate = first union cell with id >= q (its range may start before q)
    pos = np.searchsorted(u, q, side="left")
    ok = np.zeros(len(q), dtype=bool)
    has_right = pos < len(u)
    if has_right.any():
        r = u[np.minimum(pos, len(u) - 1)]
        ok |= has_right & (ci.range_min(r) <= qmin) & (ci.range_max(r) >= qmax)
    has_left = pos > 0
    if has_left.any():
        l = u[np.maximum(pos, 1) - 1]
        ok |= has_left & (ci.range_min(l) <= qmin) & (ci.range_max(l) >= qmax)
    return ok


def intersects_ids(union_ids: np.ndarray, query: np.ndarray) -> np.ndarray:
    """Vectorized: does each query cell intersect the union?"""
    u = np.asarray(union_ids, dtype=np.uint64)
    q = np.asarray(query, dtype=np.uint64)
    if len(u) == 0:
        return np.zeros(len(q), dtype=bool)
    umin = ci.range_min(u)
    umax = ci.range_max(u)
    qmin = ci.range_min(q)
    qmax = ci.range_max(q)
    # first union interval whose max >= qmin
    pos = np.searchsorted(umax, qmin, side="left")
    ok = pos < len(u)
    safe = np.minimum(pos, len(u) - 1)
    return ok & (umin[safe] <= qmax)


def contains_leaf_ids(union_ids: np.ndarray, leaf_ids: np.ndarray) -> np.ndarray:
    """Vectorized membership of leaf cells (point probes): the hot path of
    the broadcast spatial join."""
    u = np.asarray(union_ids, dtype=np.uint64)
    x = np.asarray(leaf_ids, dtype=np.uint64)
    if len(u) == 0:
        return np.zeros(len(x), dtype=bool)
    starts = ci.range_min(u)
    ends = ci.range_max(u)
    pos = np.searchsorted(starts, x, side="right")
    ok = pos > 0
    safe = np.maximum(pos, 1) - 1
    return ok & (x <= ends[safe])


def get_union(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return normalize(np.concatenate([np.asarray(a, dtype=np.uint64),
                                     np.asarray(b, dtype=np.uint64)]))


def get_intersection(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Intersection of two normalized unions (S2CellUnion.php:278-313):
    keep every cell of one side contained in the other."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    keep_a = a[contains_ids(b, a)]
    keep_b = b[contains_ids(a, b)]
    return normalize(np.concatenate([keep_a, keep_b]))


def expand_level(ids, level: int) -> np.ndarray:
    """Coarsen cells finer than `level` to their level ancestor, then add all
    neighbors at `level` (canonical S2CellUnion.php:354-380)."""
    ids = np.asarray(ids, dtype=np.uint64)
    out = []
    level_lsb = ci.lowest_on_bit_for_level(level)
    i = len(ids) - 1
    while i >= 0:
        cid = ids[i]
        if ci.lowest_on_bit(np.array([cid]))[0] < level_lsb:
            cid = ci.parent(np.array([cid]), level)[0]
            while i > 0 and _contains1(cid, ids[i - 1]):
                i -= 1
        out.append(np.array([cid]))
        out.append(ci.get_all_neighbors(int(cid), level))
        i -= 1
    return normalize(np.concatenate(out))


def expand_angle(ids, min_radius_rad: float, max_level_diff: int = 30) -> np.ndarray:
    """Buffer the union by a distance (S2CellUnion.php:389-416)."""
    ids = np.asarray(ids, dtype=np.uint64)
    min_level = int(ci.level(ids).min()) if len(ids) else ci.MAX_LEVEL
    radius_level = sphere.MIN_WIDTH.get_max_level(min_radius_rad)
    if radius_level == 0 and min_radius_rad > sphere.MIN_WIDTH.get_value(0):
        ids = expand_level(ids, 0)
    return expand_level(ids, min(min_level + max_level_diff, radius_level))


def leaf_cells_covered(ids) -> int:
    """Number of leaf cells covered (S2CellUnion.php:493-507)."""
    ids = np.asarray(ids, dtype=np.uint64)
    if len(ids) == 0:
        return 0
    inv = 2 * (ci.MAX_LEVEL - ci.level(ids).astype(np.int64))
    # python-int accumulation: 6 face cells overflow int64 (6 * 2^60)
    return sum(1 << int(v) for v in inv)


def average_based_area(ids) -> float:
    return sphere.AVG_AREA.get_value(ci.MAX_LEVEL) * leaf_cells_covered(ids)


def approx_area(ids) -> float:
    """Sum of per-cell approxArea (S2CellUnion::approxArea,
    S2CellUnion.php:520-531)."""
    from .region import Cell

    return float(sum(Cell(int(c)).approx_area()
                     for c in np.asarray(ids, dtype=np.uint64)))


def exact_area(ids) -> float:
    from .region import Cell

    return float(sum(Cell(int(c)).exact_area() for c in np.asarray(ids, dtype=np.uint64)))


def boolean_covering(region_a, region_b, op: str,
                     max_cells: int = 64) -> np.ndarray:
    """Approximate polygon/region boolean ops as cell unions.

    The reference's exact boolean ops (S2Polygon::initToIntersection/Union/
    Difference) exist only as commented Java (S2Polygon.php:565-780, dead in
    the reference too); per SURVEY.md par.2.5 the v1 approximation is
    covering algebra, sandwiched between interior and exterior coverings:

    - union:        exterior(A) | exterior(B)          (superset guarantee)
    - intersection: exterior(A) & exterior(B)          (superset guarantee)
    - difference:   interior-ish A minus exterior(B):  cells of exterior(A)
                    that do NOT intersect exterior(B)  (subset guarantee on
                    the B side: removed cells may over-remove near the
                    boundary of B)
    """
    from .coverer import covering_of

    a = normalize(covering_of(region_a, max_cells=max_cells))
    b = normalize(covering_of(region_b, max_cells=max_cells))
    if op == "union":
        return get_union(a, b)
    if op == "intersection":
        # cells of each covering that intersect the other covering
        keep_a = a[intersects_ids(b, a)]
        keep_b = b[intersects_ids(a, b)]
        return get_union(keep_a, keep_b) if len(keep_a) + len(keep_b) else \
            np.empty(0, dtype=np.uint64)
    if op == "difference":
        keep = a[~intersects_ids(b, a)]
        return normalize(keep) if len(keep) else np.empty(0, dtype=np.uint64)
    raise ValueError(f"unknown op {op!r}")


class CellUnion:
    """Object wrapper implementing the Region protocol over a normalized
    id array (for use as a coverer input / join build side)."""

    def __init__(self, ids, normalized: bool = False):
        arr = np.asarray(ids, dtype=np.uint64)
        self.ids = arr if normalized else normalize(arr)

    def __len__(self):
        return len(self.ids)

    def contains_cell(self, cell) -> bool:
        return bool(contains_ids(self.ids, np.array([cell.id]))[0])

    def may_intersect_cell(self, cell) -> bool:
        return bool(intersects_ids(self.ids, np.array([cell.id]))[0])

    def get_cap_bound(self):
        from .region import Cap, Cell

        if len(self.ids) == 0:
            return Cap.empty()
        centroid = np.zeros(3)
        levels = ci.level(self.ids).astype(np.int64)
        for cid, lvl in zip(self.ids, levels):
            area = sphere.AVG_AREA.get_value(int(lvl))
            centroid += area * Cell(int(cid)).get_center()
        n = np.linalg.norm(centroid)
        if n == 0:
            centroid = np.array([1.0, 0.0, 0.0])
        else:
            centroid /= n
        cap = Cap(centroid, 0.0)
        for cid in self.ids:
            cap = cap.add_cap(Cell(int(cid)).get_cap_bound())
        return cap

    def get_rect_bound(self):
        from .region import LatLngRect, Cell

        bound = LatLngRect.empty()
        for cid in self.ids:
            bound = bound.union(Cell(int(cid)).get_rect_bound())
        return bound
