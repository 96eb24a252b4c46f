"""Exact polygon boolean ops (kernel/polygon_ops): area identities, PIP
consistency vs logical combination of inputs, holes, degenerate cases, and
the PolygonBuilder assembler."""

import numpy as np
import pytest

from s2ray.kernel import sphere
from s2ray.kernel.pip import Loop, Polygon
from s2ray.kernel.polygon_ops import (PolygonBuilder, destructive_union,
                                      polygon_difference,
                                      polygon_intersection, polygon_union)


def sq(lat0, lng0, size):
    return [(lat0, lng0), (lat0, lng0 + size), (lat0 + size, lng0 + size),
            (lat0 + size, lng0)]


A = Polygon.from_latlng_loops([sq(0, 0, 30)])
B = Polygon.from_latlng_loops([sq(10, 10, 30)])     # overlaps A
C = Polygon.from_latlng_loops([sq(50, 50, 5)])      # disjoint from A
D = Polygon.from_latlng_loops([sq(5, 5, 10)])       # strictly inside A


def _sample_pts(seed=5, n=3000):
    rng = np.random.RandomState(seed)
    lat = rng.uniform(-10, 60, n)
    lng = rng.uniform(-10, 60, n)
    x, y, z = sphere.latlng_to_xyz(np.radians(lat), np.radians(lng))
    return np.stack([x, y, z], axis=1)


def test_area_identities():
    inter = polygon_intersection(A, B)
    uni = polygon_union(A, B)
    diff = polygon_difference(A, B)
    assert abs(A.area() + B.area() - (inter.area() + uni.area())) < 1e-9
    assert abs(A.area() - (diff.area() + inter.area())) < 1e-9


def test_pip_consistency_overlap():
    pts = _sample_pts()
    in_a = A.contains_points_xyz(pts)
    in_b = B.contains_points_xyz(pts)
    assert (polygon_intersection(A, B).contains_points_xyz(pts)
            == (in_a & in_b)).all()
    assert (polygon_union(A, B).contains_points_xyz(pts)
            == (in_a | in_b)).all()
    assert (polygon_difference(A, B).contains_points_xyz(pts)
            == (in_a & ~in_b)).all()


def test_disjoint_and_nested():
    pts = _sample_pts(seed=9)
    assert polygon_intersection(A, C) is None
    uc = polygon_union(A, C)
    assert abs(uc.area() - (A.area() + C.area())) < 1e-9
    # difference carving a hole
    dd = polygon_difference(A, D)
    assert len(dd.loops) == 2
    in_a = A.contains_points_xyz(pts)
    in_d = D.contains_points_xyz(pts)
    assert (dd.contains_points_xyz(pts) == (in_a & ~in_d)).all()
    # nested: A n D == D, A u D == A
    assert abs(polygon_intersection(A, D).area() - D.area()) < 1e-9
    assert abs(polygon_union(A, D).area() - A.area()) < 1e-9
    # B disjoint from result boundary cases
    assert abs(polygon_difference(C, A).area() - C.area()) < 1e-9


def test_self_ops():
    # A n A == A u A == A; A - A == empty (shared directed edges XOR away)
    assert abs(polygon_intersection(A, A).area() - A.area()) < 1e-12
    assert abs(polygon_union(A, A).area() - A.area()) < 1e-12
    assert polygon_difference(A, A) is None


def test_destructive_union():
    u = destructive_union([A, B, C, D])
    pts = _sample_pts(seed=2)
    expect = (A.contains_points_xyz(pts) | B.contains_points_xyz(pts)
              | C.contains_points_xyz(pts) | D.contains_points_xyz(pts))
    assert (u.contains_points_xyz(pts) == expect).all()


def test_builder_assembles_loop_and_xor():
    b = PolygonBuilder()
    lp = Loop.from_latlng_degrees(sq(0, 0, 10))
    v = lp.vertices
    for i in range(4):
        b.add_edge(v[i], v[(i + 1) % 4])
    # XOR: adding a reversed edge cancels the original
    b.add_edge(v[1], v[0])
    assert b.n_edges() == 3
    b.add_edge(v[0], v[1])
    loops, unused = b.assemble_loops()
    assert len(loops) == 1 and not unused
    assert len(loops[0].vertices) == 4


def test_builder_merges_near_vertices():
    b = PolygonBuilder(merge_radius=1e-10)
    lp = Loop.from_latlng_degrees(sq(0, 0, 10))
    v = lp.vertices
    jitter = v[1] + np.array([0.0, 0.0, 1e-12])
    b.add_edge(v[0], jitter)
    b.add_edge(v[1], v[2])
    b.add_edge(v[2], v[3])
    b.add_edge(v[3], v[0])
    loops, unused = b.assemble_loops()
    assert len(loops) == 1 and not unused


def test_ops_with_holes_on_either_side():
    ring = Polygon.from_latlng_loops(
        [sq(0, 0, 30), list(reversed(sq(10, 10, 8)))])   # square with hole
    solid = Polygon.from_latlng_loops([sq(5, 5, 20)])    # overlaps the hole
    pts = _sample_pts(seed=11)
    in_r = ring.contains_points_xyz(pts)
    in_s = solid.contains_points_xyz(pts)
    inter = polygon_intersection(ring, solid)
    assert (inter.contains_points_xyz(pts) == (in_r & in_s)).all()
    uni = polygon_union(ring, solid)
    assert (uni.contains_points_xyz(pts) == (in_r | in_s)).all()
    diff = polygon_difference(ring, solid)
    assert (diff.contains_points_xyz(pts) == (in_r & ~in_s)).all()
    # hole on the RIGHT side
    diff2 = polygon_difference(solid, ring)
    assert (diff2.contains_points_xyz(pts) == (in_s & ~in_r)).all()
    # area identity still holds
    assert abs(ring.area() + solid.area()
               - (inter.area() + uni.area())) < 1e-9


def test_degenerate_edge_ignored():
    b = PolygonBuilder()
    p = Loop.from_latlng_degrees(sq(0, 0, 10)).vertices[0]
    b.add_edge(p, p)
    assert b.n_edges() == 0


# -- round 2: full S2PolygonBuilder option surface ---------------------------

def test_builder_undirected_xor_reassembles_split_pieces():
    """Lake split by a border: two halves added with ARBITRARY orientations;
    the shared border cancels (undirected XOR) and the union assembles CCW
    (S2PolygonBuilder.php:10-14 situation 1)."""
    left = Loop.from_latlng_degrees([(0, 0), (0, 5), (10, 5), (10, 0)])
    right = Loop.from_latlng_degrees([(0, 5), (0, 10), (10, 10), (10, 5)])
    # the expected union keeps the cut endpoints as vertices: a great-circle
    # arc (10,0)->(10,10) does NOT pass through (10,5)
    whole = Polygon.from_latlng_loops([
        [(0, 0), (0, 5), (0, 10), (10, 10), (10, 5), (10, 0)]])
    b = PolygonBuilder.undirected_xor()
    b.add_loop(left)
    b.add_loop(right.invert(), sign=1)  # deliberately CW piece
    poly, unused = b.assemble_polygon()
    assert poly is not None and not unused
    assert len(poly.loops) == 1
    assert abs(poly.area() - whole.area()) < 1e-9
    pts = _sample_pts()
    assert (poly.contains_points_xyz(pts)
            == whole.contains_points_xyz(pts)).all()


def test_builder_undirected_normalizes_cw_loop():
    """A single clockwise loop under undirected assembly comes out CCW
    (the !isNormalized retry, S2PolygonBuilder.php:305-312)."""
    cw = Loop.from_latlng_degrees(sq(0, 0, 10)).invert()
    b = PolygonBuilder.undirected_union()
    v = cw.vertices
    for i in range(len(v)):
        b.add_edge(v[i], v[(i + 1) % len(v)])
    loops, unused = b.assemble_loops()
    assert len(loops) == 1 and not unused
    assert loops[0].area() <= 2 * np.pi + 1e-12


def test_builder_add_polygon_roundtrip_with_hole():
    shell = sq(0, 0, 30)
    hole = sq(10, 10, 5)
    src = Polygon.from_latlng_loops([shell, hole])
    b = PolygonBuilder.directed_xor()
    b.add_polygon(src)
    poly, unused = b.assemble_polygon()
    assert poly is not None and not unused
    assert len(poly.loops) == 2
    assert abs(poly.area() - src.area()) < 1e-9
    pts = _sample_pts(seed=11)
    assert (poly.contains_points_xyz(pts)
            == src.contains_points_xyz(pts)).all()


def test_builder_validate_rejects_bowtie():
    """Self-crossing 'bowtie' cycle is rejected into unused_edges when
    validate=True (S2PolygonBuilder.php:478-489)."""
    pts = [Loop.from_latlng_degrees([(0, 0), (10, 10), (0, 10), (10, 0)])
           .vertices[i] for i in range(4)]
    b = PolygonBuilder(validate=True)
    for i in range(4):
        b.add_edge(pts[i], pts[(i + 1) % 4])
    loops, unused = b.assemble_loops()
    assert loops == []
    assert len(unused) == 4


def test_builder_large_vertex_merge_bucketed():
    """>512 vertices takes the PointIndex-style bucketed merge path; a
    jittered ring still assembles into a single loop."""
    n = 700
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    lat = 10 * np.cos(ang)
    lng = 10 * np.sin(ang)
    x, y, z = sphere.latlng_to_xyz(np.radians(lat), np.radians(lng))
    ring = np.stack([x, y, z], axis=1)
    rng = np.random.RandomState(7)
    b = PolygonBuilder(merge_radius=1e-9)
    for i in range(n):
        a = ring[i] + rng.uniform(-1e-12, 1e-12, 3)
        c = ring[(i + 1) % n] + rng.uniform(-1e-12, 1e-12, 3)
        b.add_edge(a, c)
    loops, unused = b.assemble_loops()
    assert len(loops) == 1 and not unused
    assert len(loops[0].vertices) == n


def test_builder_undirected_merge_with_jittered_shared_border():
    """Regression: undirected + merge_radius used to double-process each
    stored direction in moveVertices (KeyError or silent XOR-cancellation
    of boundary edges).  Two 'sloppy' pieces whose shared border vertices
    differ within the merge radius must still assemble to the union."""
    left = Loop.from_latlng_degrees([(0, 0), (0, 5), (10, 5), (10, 0)])
    right = Loop.from_latlng_degrees([(0, 5), (0, 10), (10, 10), (10, 5)])
    jit = np.array([1e-13, -1e-13, 1e-13])
    b = PolygonBuilder(merge_radius=1e-10, xor_edges=True,
                       undirected_edges=True)
    v = left.vertices
    for i in range(4):
        b.add_edge(v[i], v[(i + 1) % 4])
    w = right.vertices.copy()
    w[0] = w[0] + jit          # its copy of the shared-border vertex moved
    w[3] = w[3] - jit
    for i in range(4):
        b.add_edge(w[i], w[(i + 1) % 4])
    poly, unused = b.assemble_polygon()
    assert poly is not None and not unused
    assert len(poly.loops) == 1 and len(poly.loops[0].vertices) == 6
    whole = Polygon.from_latlng_loops([
        [(0, 0), (0, 5), (0, 10), (10, 10), (10, 5), (10, 0)]])
    pts = _sample_pts(seed=23)
    assert (poly.contains_points_xyz(pts)
            == whole.contains_points_xyz(pts)).all()


def test_builder_undirected_polygon_never_complement():
    """Regression: a CW loop surviving undirected assembly must be
    normalized by assemble_polygon, never interpreted as its complement."""
    cw = Loop.from_latlng_degrees(sq(0, 0, 10)).invert()
    b = PolygonBuilder.undirected_union()
    v = cw.vertices
    for i in range(len(v)):
        b.add_edge(v[i], v[(i + 1) % len(v)])
    poly, _ = b.assemble_polygon()
    assert poly is not None
    assert poly.area() < 2 * np.pi
    inside = Loop.from_latlng_degrees(sq(0, 0, 10)).vertices.mean(axis=0)
    inside /= np.linalg.norm(inside)
    assert poly.contains_point(inside)
