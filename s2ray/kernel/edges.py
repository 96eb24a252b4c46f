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
        acb_i = acb if np.isscalar(acb) or np.ndim(acb) == 0 else acb
        good = (cbd == acb_i) & (dac == acb_i)
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
