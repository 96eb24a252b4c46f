"""Edge predicates: crossings, distances, closest points (vectorized).

From-scratch re-implementation of the reference S2EdgeUtil kernels:
- simpleCrossing            S2EdgeUtil.php:36-57
- robustCrossing            S2EdgeUtil.php:75-110
- vertexCrossing            S2EdgeUtil.php:136-164
- edgeOrVertexCrossing      S2EdgeUtil.php:173-185
- getDistance/getClosestPoint  S2EdgeUtil.php:271-331
- RectBounder (edge-latitude extremum)  S2EdgeUtil.php:461-528

Vectorization layout: one *fixed* edge (C, D) against N points / N edges —
the shape the PIP parity scan and the cell-boundary tests need.
"""

from __future__ import annotations

import math

import numpy as np

from . import sphere
from .interval import R1Interval, S1Interval


def origin() -> np.ndarray:
    """The fixed 'point at infinity' for parity tests (S2::origin,
    S2.php:176-183: (0, 1, 0))."""
    return np.array([0.0, 1.0, 0.0])


# ---------------------------------------------------------------------------
# crossings

def robust_crossing_one_to_many(c: np.ndarray, d: np.ndarray,
                                o: np.ndarray, p: np.ndarray) -> np.ndarray:
    """robustCrossing(edge CD, edges O->P_i) for fixed C, D, O and (N,3) P.

    Returns int array: +1 crossing, -1 no crossing, 0 shared vertex.
    Uses symmetry robustCrossing(a,b,c,d) == robustCrossing(c,d,a,b)
    (S2EdgeUtil.php:66-69) so the C-x-D cross product is hoisted.
    """
    c = np.asarray(c, dtype=np.float64)
    d = np.asarray(d, dtype=np.float64)
    o = np.asarray(o, dtype=np.float64)
    p = np.asarray(p, dtype=np.float64)
    c_cross_d = np.cross(c, d)
    # acb = -robustCCW(c, d, o);  bda = robustCCW(c, d, p_i)
    acb = -sphere.robust_ccw(c, d, o, c_cross_d)
    bda = sphere.robust_ccw(
        np.broadcast_to(c, p.shape), np.broadcast_to(d, p.shape), p,
        a_cross_b=np.broadcast_to(c_cross_d, p.shape))
    out = np.full(len(p), -1, dtype=np.int64)
    degenerate = (bda == 0) | (acb == 0)
    maybe = (bda == acb) & ~degenerate
    if np.any(maybe):
        idx = np.nonzero(maybe)[0]
        o_cross_p = np.cross(np.broadcast_to(o, (len(idx), 3)), p[idx])
        cbd = -sphere.robust_ccw(np.broadcast_to(o, (len(idx), 3)), p[idx],
                                 np.broadcast_to(d, (len(idx), 3)),
                                 a_cross_b=o_cross_p)
        dac = sphere.robust_ccw(np.broadcast_to(o, (len(idx), 3)), p[idx],
                                np.broadcast_to(c, (len(idx), 3)),
                                a_cross_b=o_cross_p)
        good = (cbd == acb) & (dac == acb)
        out[idx[good]] = 1
    out[degenerate] = 0
    return out


def robust_crossing_pairwise(c: np.ndarray, d: np.ndarray,
                             o: np.ndarray, p: np.ndarray) -> np.ndarray:
    """robustCrossing(edge C_i D_i, edge O_i P_i) row-wise over (N,3) inputs.

    Same arithmetic as robust_crossing_one_to_many with per-row C/D/O —
    the fully-batched form the cell-indexed PIP uses to test every
    (point, local-edge) pair in one vectorized pass."""
    c = np.asarray(c, dtype=np.float64)
    d = np.asarray(d, dtype=np.float64)
    o = np.asarray(o, dtype=np.float64)
    p = np.asarray(p, dtype=np.float64)
    c_cross_d = np.cross(c, d)
    acb = -sphere.robust_ccw(c, d, o, a_cross_b=c_cross_d)
    bda = sphere.robust_ccw(c, d, p, a_cross_b=c_cross_d)
    out = np.full(len(p), -1, dtype=np.int64)
    degenerate = (bda == 0) | (acb == 0)
    maybe = (bda == acb) & ~degenerate
    if np.any(maybe):
        idx = np.nonzero(maybe)[0]
        o_cross_p = np.cross(o[idx], p[idx])
        cbd = -sphere.robust_ccw(o[idx], p[idx], d[idx], a_cross_b=o_cross_p)
        dac = sphere.robust_ccw(o[idx], p[idx], c[idx], a_cross_b=o_cross_p)
        good = (cbd == acb[idx]) & (dac == acb[idx])
        out[idx[good]] = 1
    out[degenerate] = 0
    return out


def robust_crossing(a, b, c, d) -> int:
    """Scalar robustCrossing (S2EdgeUtil.php:75-110)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    a_cross_b = np.cross(a, b)
    acb = -sphere.robust_ccw(a, b, c, a_cross_b)
    bda = sphere.robust_ccw(a, b, d, a_cross_b)
    if acb == 0 or bda == 0:
        return 0
    if bda != acb:
        return -1
    c = np.asarray(c, dtype=np.float64)
    d = np.asarray(d, dtype=np.float64)
    c_cross_d = np.cross(c, d)
    cbd = -sphere.robust_ccw(c, d, b, c_cross_d)
    if cbd != acb:
        return -1
    dac = sphere.robust_ccw(c, d, a, c_cross_d)
    return 1 if dac == acb else -1


def vertex_crossing(a, b, c, d) -> bool:
    """Shared-vertex crossing parity rule (S2EdgeUtil.php:136-164)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    c = np.asarray(c, dtype=np.float64)
    d = np.asarray(d, dtype=np.float64)
    if np.array_equal(a, b) or np.array_equal(c, d):
        return False
    if np.array_equal(a, d):
        return bool(sphere.ordered_ccw(sphere.ortho(a), c, b, a))
    if np.array_equal(b, c):
        return bool(sphere.ordered_ccw(sphere.ortho(b), d, a, b))
    if np.array_equal(a, c):
        return bool(sphere.ordered_ccw(sphere.ortho(a), d, b, a))
    if np.array_equal(b, d):
        return bool(sphere.ordered_ccw(sphere.ortho(b), c, a, b))
    return False


def edge_or_vertex_crossing(a, b, c, d) -> bool:
    """Crossing count suitable for parity PIP (S2EdgeUtil.php:173-185)."""
    crossing = robust_crossing(a, b, c, d)
    if crossing < 0:
        return False
    if crossing > 0:
        return True
    return vertex_crossing(a, b, c, d)


# ---------------------------------------------------------------------------
# distances

def distance_point_to_edge(x: np.ndarray, a: np.ndarray, b: np.ndarray,
                           a_cross_b: np.ndarray | None = None) -> np.ndarray:
    """Min angle from points X (N,3) to geodesic segment AB
    (S2EdgeUtil::getDistance, S2EdgeUtil.php:281-309), vectorized over X."""
    x = np.atleast_2d(np.asarray(x, dtype=np.float64))
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if a_cross_b is None:
        a_cross_b = sphere.robust_cross_prod(a, b)
    # wedge test via simpleCCW determinants
    in_wedge = (sphere.simple_ccw_det(np.broadcast_to(a_cross_b, x.shape),
                                      np.broadcast_to(a, x.shape), x) > 0) & \
               (sphere.simple_ccw_det(x, np.broadcast_to(b, x.shape),
                                      np.broadcast_to(a_cross_b, x.shape)) > 0)
    norm_ab = float(np.linalg.norm(a_cross_b))
    sin_dist = np.abs(x @ a_cross_b) / (norm_ab if norm_ab else 1.0)
    d_gc = np.arcsin(np.minimum(1.0, sin_dist))
    da2 = np.einsum("ij,ij->i", x - a, x - a)
    db2 = np.einsum("ij,ij->i", x - b, x - b)
    d_end = 2.0 * np.arcsin(np.minimum(1.0, 0.5 * np.sqrt(np.minimum(da2, db2))))
    return np.where(in_wedge, d_gc, d_end)


def closest_point_on_edge(x: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Closest point on segment AB to x (S2EdgeUtil.php:316-331), scalar."""
    x = np.asarray(x, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    cp = sphere.robust_cross_prod(a, b)
    p = x - cp * (float(np.dot(x, cp)) / float(np.dot(cp, cp)))
    if (sphere.simple_ccw_det(cp, a, p) > 0) and (sphere.simple_ccw_det(p, b, cp) > 0):
        return sphere.normalize(p)
    if float(np.dot(x - a, x - a)) <= float(np.dot(x - b, x - b)):
        return a
    return b


# ---------------------------------------------------------------------------
# intersection point (S2EdgeUtil::getIntersection, S2EdgeUtil.php:199-250)

def get_intersection(a0, a1, b0, b1) -> np.ndarray:
    """Intersection point of two crossing edges (requires robustCrossing > 0).

    Cross-product of the two great-circle normals, sign-fixed to the correct
    hemisphere, with endpoint clipping (CloserResult semantics,
    S2EdgeUtil.php:797-824) when near-parallel circles put x outside a
    segment."""
    a0 = np.asarray(a0, dtype=np.float64)
    a1 = np.asarray(a1, dtype=np.float64)
    b0 = np.asarray(b0, dtype=np.float64)
    b1 = np.asarray(b1, dtype=np.float64)
    a_norm = sphere.normalize(sphere.robust_cross_prod(a0, a1))
    b_norm = sphere.normalize(sphere.robust_cross_prod(b0, b1))
    x = sphere.normalize(sphere.robust_cross_prod(a_norm, b_norm))
    if float(np.dot(x, (a0 + a1) + (b0 + b1))) < 0:
        x = -x
    if sphere.ordered_ccw(a0, x, a1, a_norm) and sphere.ordered_ccw(b0, x, b1, b_norm):
        return x
    # clip to the acceptable endpoint closest to x
    best_d = 10.0
    best = x
    for candidate, ok in (
        (a0, sphere.ordered_ccw(b0, a0, b1, b_norm)),
        (a1, sphere.ordered_ccw(b0, a1, b1, b_norm)),
        (b0, sphere.ordered_ccw(a0, b0, a1, a_norm)),
        (b1, sphere.ordered_ccw(a0, b1, a1, a_norm)),
    ):
        if ok:
            d = float(np.dot(x - candidate, x - candidate))
            if d < best_d:
                best_d = d
                best = candidate
    return best


def get_distance_fraction(x, a0, a1) -> float:
    """AX / (AX + BX) (S2EdgeUtil.php:257-262)."""
    d0 = float(sphere.angle_between(x, a0))
    d1 = float(sphere.angle_between(x, a1))
    return d0 / (d0 + d1)


# ---------------------------------------------------------------------------
# cheap edge-rejection pruners (S2EdgeUtil.php:541-668) — vectorized forms

class XYZPruner:
    """xyz-bbox edge rejection with geodesic deformation slack
    (S2EdgeUtil.php:541-628)."""

    def __init__(self):
        self._bounds = None  # (min3, max3)
        self.max_deformation = 0.0

    def add_edge_to_bounds(self, frm: np.ndarray, to: np.ndarray):
        lo = np.minimum(frm, to)
        hi = np.maximum(frm, to)
        if self._bounds is None:
            self._bounds = (lo.copy(), hi.copy())
        else:
            self._bounds = (np.minimum(self._bounds[0], lo),
                            np.maximum(self._bounds[1], hi))
        approx_arc = float(np.abs(frm - to).sum())
        if approx_arc < 0.025:
            self.max_deformation = max(self.max_deformation, approx_arc * 0.0025)
        elif approx_arc < 1.0:
            self.max_deformation = max(self.max_deformation, approx_arc * 0.11)
        else:
            self.max_deformation = max(self.max_deformation, approx_arc * 0.5)

    def finalize_bounds(self):
        d = self.max_deformation
        self._bounds = (self._bounds[0] - d, self._bounds[1] + d)

    def intersects_edges(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Vectorized over edge arrays (N,3): False => certainly no
        intersection with the bound."""
        lo, hi = self._bounds
        a = np.atleast_2d(a)
        b = np.atleast_2d(b)
        out = np.ones(len(a), dtype=bool)
        for k in range(3):
            both_below = (a[:, k] < lo[k]) & (b[:, k] < lo[k])
            both_above = (a[:, k] > hi[k]) & (b[:, k] > hi[k])
            out &= ~(both_below | both_above)
        return out


class LongitudePruner:
    """lng-interval edge rejection (S2EdgeUtil.php:641-668)."""

    def __init__(self, interval: S1Interval):
        self.interval = interval

    def intersects_edges(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        a = np.atleast_2d(a)
        b = np.atleast_2d(b)
        lng0 = np.arctan2(a[:, 1], a[:, 0])
        lng1 = np.arctan2(b[:, 1], b[:, 0])
        out = np.empty(len(a), dtype=bool)
        for i in range(len(a)):
            out[i] = self.interval.intersects(
                S1Interval.from_point_pair(float(lng0[i]), float(lng1[i])))
        return out


# ---------------------------------------------------------------------------
# wedge relations at a shared vertex (S2EdgeUtil.php:685-794)

def wedge_contains(a0, ab1, a2, b0, b2) -> int:
    """+1 if wedge A contains wedge B, else 0."""
    return int(sphere.ordered_ccw(a2, b2, b0, ab1)
               and sphere.ordered_ccw(b0, a0, a2, ab1))


def wedge_intersects(a0, ab1, a2, b0, b2) -> int:
    """-1 if the wedges intersect, else 0."""
    return 0 if (sphere.ordered_ccw(a0, b2, b0, ab1)
                 and sphere.ordered_ccw(b0, a2, a0, ab1)) else -1


def wedge_contains_or_intersects(a0, ab1, a2, b0, b2) -> int:
    """+1 contains, 0 disjoint, -1 intersects-not-contains."""
    if sphere.ordered_ccw(a0, a2, b2, ab1):
        return 1 if sphere.ordered_ccw(b2, b0, a0, ab1) else -1
    if not sphere.ordered_ccw(a2, b0, b2, ab1):
        return 0
    return 0 if np.array_equal(np.asarray(a2), np.asarray(b0)) else -1


def wedge_contains_or_crosses(a0, ab1, a2, b0, b2) -> int:
    """+1 A contains B, 0 B contains A or disjoint, -1 chains cross."""
    if sphere.ordered_ccw(a0, a2, b2, ab1):
        if sphere.ordered_ccw(b2, b0, a0, ab1):
            return 1
        return 0 if np.array_equal(np.asarray(a2), np.asarray(b2)) else -1
    return 0 if sphere.ordered_ccw(a0, b0, a2, ab1) else -1


# ---------------------------------------------------------------------------
# RectBounder (S2EdgeUtil.php:461-528)

class RectBounder:
    """Bounding lat/lng rect of a vertex chain, accounting for the latitude
    extremum in the interior of geodesic edges."""

    def __init__(self):
        self._a = None
        self._a_latlng = None
        self._lat = R1Interval.empty()
        self._lng = S1Interval.empty()

    def add_point(self, b: np.ndarray):
        b = np.asarray(b, dtype=np.float64)
        b_lat, b_lng = (float(v) for v in sphere.xyz_to_latlng(*b))
        if self._a is None:
            self._lat = self._lat.add_point(b_lat)
            self._lng = self._lng.add_point(b_lng)
        else:
            lat2 = R1Interval.from_point_pair(self._a_latlng[0], b_lat)
            lng2 = S1Interval.from_point_pair(self._a_latlng[1], b_lng)
            self._lat = self._lat.union(lat2)
            self._lng = self._lng.union(lng2)
            a_cross_b = sphere.robust_cross_prod(self._a, b)
            direction = np.cross(a_cross_b, np.array([0.0, 0.0, 1.0]))
            da = float(np.dot(direction, self._a))
            db = float(np.dot(direction, b))
            if da * db < 0:
                abs_lat = math.acos(min(1.0, abs(
                    a_cross_b[2] / float(np.linalg.norm(a_cross_b)))))
                if da < 0:
                    self._lat = R1Interval(self._lat.lo,
                                           max(abs_lat, self._lat.hi))
                else:
                    self._lat = R1Interval(min(-abs_lat, self._lat.lo),
                                           self._lat.hi)
        self._a = b
        self._a_latlng = (b_lat, b_lng)

    def get_bound(self):
        from .region import LatLngRect

        return LatLngRect(self._lat, self._lng)
