"""Loop-loop and polygon-polygon relations + edge utilities."""

import math

import numpy as np
import pytest

from s2ray.kernel import edges, sphere
from s2ray.kernel.pip import Loop, Polygon


def _sq(lat0, lng0, size):
    return [(lat0, lng0), (lat0, lng0 + size), (lat0 + size, lng0 + size),
            (lat0 + size, lng0)]


BIG = Loop.from_latlng_degrees(_sq(0, 0, 30))
SMALL = Loop.from_latlng_degrees(_sq(10, 10, 5))
OVERLAP = Loop.from_latlng_degrees(_sq(20, 20, 20))
DISJOINT = Loop.from_latlng_degrees(_sq(-40, -40, 10))


def test_loop_contains_loop():
    assert BIG.contains_loop(SMALL)
    assert not SMALL.contains_loop(BIG)
    assert not BIG.contains_loop(OVERLAP)
    assert not BIG.contains_loop(DISJOINT)


def test_loop_intersects_loop():
    assert BIG.intersects_loop(SMALL)
    assert SMALL.intersects_loop(BIG)
    assert BIG.intersects_loop(OVERLAP)
    assert OVERLAP.intersects_loop(BIG)
    assert not BIG.intersects_loop(DISJOINT)
    assert not DISJOINT.intersects_loop(BIG)


def test_loop_contains_or_crosses():
    assert BIG.contains_or_crosses(SMALL) == 1
    assert BIG.contains_or_crosses(OVERLAP) == -1
    assert BIG.contains_or_crosses(DISJOINT) == 0
    assert SMALL.contains_or_crosses(BIG) == 0  # contained-by -> 0


def test_polygon_relations():
    big = Polygon([BIG])
    small = Polygon([SMALL])
    overlap = Polygon([OVERLAP])
    disjoint = Polygon([DISJOINT])
    assert big.contains_polygon(small)
    assert not small.contains_polygon(big)
    assert not big.contains_polygon(overlap)
    assert big.intersects_polygon(overlap)
    assert not big.intersects_polygon(disjoint)


def test_polygon_with_hole_relations():
    shell = _sq(0, 0, 30)
    hole = list(reversed(_sq(10, 10, 10)))
    holed = Polygon.from_latlng_loops([shell, hole])
    inside_hole = Polygon.from_latlng_loops([_sq(13, 13, 3)])
    in_ring = Polygon.from_latlng_loops([_sq(2, 2, 4)])
    assert holed.has_holes()
    assert not holed.contains_polygon(inside_hole)
    assert holed.contains_polygon(in_ring)
    assert holed.intersects_polygon(in_ring)


def test_get_intersection_on_both_edges():
    # two crossing edges near (0,0)
    a0 = np.array(sphere.latlng_to_xyz(math.radians(-1.0), math.radians(0.0)))
    a1 = np.array(sphere.latlng_to_xyz(math.radians(1.0), math.radians(0.0)))
    b0 = np.array(sphere.latlng_to_xyz(math.radians(0.0), math.radians(-1.0)))
    b1 = np.array(sphere.latlng_to_xyz(math.radians(0.0), math.radians(1.0)))
    x = edges.get_intersection(a0, a1, b0, b1)
    lat, lng = sphere.xyz_to_latlng(*x)
    assert abs(float(lat)) < 1e-9
    assert abs(float(lng)) < 1e-9
    assert edges.get_distance_fraction(x, a0, a1) == pytest.approx(0.5, abs=1e-6)


def test_xyz_pruner():
    pr = edges.XYZPruner()
    a = np.array(sphere.latlng_to_xyz(0.0, 0.0))
    b = np.array(sphere.latlng_to_xyz(0.02, 0.02))
    pr.add_edge_to_bounds(a, b)
    pr.finalize_bounds()
    far_a = np.array(sphere.latlng_to_xyz(1.0, 1.0))
    far_b = np.array(sphere.latlng_to_xyz(1.1, 1.1))
    assert not pr.intersects_edges(far_a, far_b)[0]
    assert pr.intersects_edges(a, b)[0]


def test_longitude_pruner():
    from s2ray.kernel.interval import S1Interval

    pr = edges.LongitudePruner(S1Interval(math.radians(10), math.radians(20)))
    a = np.array(sphere.latlng_to_xyz(0.0, math.radians(15.0)))
    b = np.array(sphere.latlng_to_xyz(0.1, math.radians(17.0)))
    c = np.array(sphere.latlng_to_xyz(0.0, math.radians(-50.0)))
    d = np.array(sphere.latlng_to_xyz(0.1, math.radians(-60.0)))
    assert pr.intersects_edges(a, b)[0]
    assert not pr.intersects_edges(c, d)[0]


def test_wedge_relations_via_shared_vertex_loops():
    # B is a triangle inside square A, sharing only the vertex (0,0).
    def pt(lat, lng):
        return np.array(sphere.latlng_to_xyz(math.radians(lat), math.radians(lng)))

    o = pt(0, 0)
    # A chain through (0,0): prev (30,0), next (0,30) (CCW square interior NE)
    a0, a2 = pt(30, 0), pt(0, 30)
    # B chain through (0,0): prev (10,5), next (5,10) (CCW triangle inside A)
    b0, b2 = pt(10, 5), pt(5, 10)
    assert edges.wedge_contains(a0, o, a2, b0, b2) == 1
    assert edges.wedge_intersects(a0, o, a2, b0, b2) == -1
    assert edges.wedge_contains_or_intersects(a0, o, a2, b0, b2) == 1
    assert edges.wedge_contains_or_crosses(a0, o, a2, b0, b2) == 1
    # reversed roles: B does not contain A
    assert edges.wedge_contains(b0, o, b2, a0, a2) == 0
    # and the loop-level relation agrees
    a_loop = Loop.from_latlng_degrees(_sq(0, 0, 30))
    b_loop = Loop.from_latlng_degrees([(0.0, 0.0), (5.0, 10.0), (10.0, 5.0)])
    assert a_loop.contains_loop(b_loop)
    assert a_loop.intersects_loop(b_loop)
    assert not b_loop.contains_loop(a_loop)