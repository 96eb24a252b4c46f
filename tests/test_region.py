"""Region layer + coverer tests: postconditions from the reference docs
(S2RegionCoverer.php:149-176 accuracy table, S2CellUnion invariants)."""

import math

import numpy as np
import pytest

from s2ray.kernel import cellid, cellunion, sphere
from s2ray.kernel.coverer import RegionCoverer, covering_of
from s2ray.kernel.interval import R1Interval, S1Interval
from s2ray.kernel.region import Cap, Cell, LatLngRect


def _random_caps(n, rng, max_angle=0.3):
    caps = []
    for _ in range(n):
        lat = rng.uniform(-80, 80)
        lng = rng.uniform(-180, 180)
        ang = rng.uniform(1e-4, max_angle)
        x, y, z = sphere.latlng_to_xyz(math.radians(lat), math.radians(lng))
        caps.append(Cap.from_axis_angle(np.array([x, y, z]), ang))
    return caps


def _points_in_cap(cap, n, rng):
    """Rejection-sample points inside the cap."""
    pts = []
    lat0, lng0 = sphere.xyz_to_latlng(*cap.axis)
    ang = cap.angle()
    while len(pts) < n:
        dlat = rng.uniform(-ang, ang)
        dlng = rng.uniform(-ang, ang) / max(1e-9, math.cos(lat0))
        la, ln = float(lat0) + dlat, float(lng0) + dlng
        if abs(la) > math.pi / 2 - 1e-6:
            continue
        x, y, z = sphere.latlng_to_xyz(la, ln)
        p = np.array([x, y, z], dtype=np.float64)
        if cap.contains_point(p):
            pts.append(p)
    return pts


def test_cell_geometry_roundtrip():
    ids = cellid.parent(cellid.from_latlng_degrees(
        np.array([40.0, -33.0, 55.7]), np.array([-74.0, 151.0, 37.6])), 10)
    for cid in ids:
        cell = Cell(int(cid))
        # center is inside the cell; vertices are inside the bounds
        assert cell.contains_point(cell.get_center())
        rect = cell.get_rect_bound()
        cap = cell.get_cap_bound()
        for k in range(4):
            v = cell.get_vertex(k)
            assert rect.contains_point(v)
            assert cap.contains_point(v)
        assert cell.contains_cell(cell)
        assert cell.may_intersect_cell(cell)


def test_cell_areas():
    cell = Cell(int(cellid.parent(cellid.from_latlng_degrees(
        np.array([10.0]), np.array([10.0])), 12)[0]))
    exact = cell.exact_area()
    # approxArea accuracy <= 3% for all cells, <=0.1% at level>=5
    # (reference S2Cell.php:285-288)
    assert cell.approx_area() == pytest.approx(exact, rel=1e-3)
    # averageArea within factor 1.7 (S2Cell.php:267-270)
    assert cell.average_area() / exact < 1.7
    assert exact / cell.average_area() < 1.7


def test_cap_basic():
    cap = Cap.from_latlng_radius(55.7558, 37.6173, 50000.0)
    assert cap.contains_latlng_degrees(55.7558, 37.6173)
    assert cap.contains_latlng_degrees(55.9, 37.6173)      # ~16 km north
    assert not cap.contains_latlng_degrees(56.3, 37.6173)  # ~60 km north
    rect = cap.get_rect_bound()
    # rect bound contains random points in the cap
    rng = np.random.RandomState(2)
    for p in _points_in_cap(cap, 50, rng):
        assert rect.contains_point(p)
    comp = cap.complement()
    assert not comp.contains_latlng_degrees(55.7558, 37.6173)
    assert comp.contains_latlng_degrees(-55.0, -140.0)


def test_cap_cell_relations():
    cap = Cap.from_latlng_radius(10.0, 20.0, 100000.0)
    leaf = cellid.from_latlng_degrees(np.array([10.0]), np.array([20.0]))
    big = Cell(int(cellid.parent(leaf, 3)[0]))    # ~1000 km cell
    small = Cell(int(cellid.parent(leaf, 14)[0]))  # ~600 m cell
    assert big.may_intersect_cell(big)
    assert cap.may_intersect_cell(big)
    assert not cap.contains_cell(big)
    assert cap.may_intersect_cell(small)
    assert cap.contains_cell(small)


def test_rect_wrap_and_poles():
    rect = LatLngRect.from_degrees(-10, 170, 10, -170)  # wraps antimeridian
    assert rect.lng.is_inverted()
    assert rect.contains_latlng(0.0, math.radians(175.0))
    assert rect.contains_latlng(0.0, math.radians(-175.0))
    assert not rect.contains_latlng(0.0, 0.0)
    cap = rect.get_cap_bound()
    for lngd in (171, 179, -179, -171):
        x, y, z = sphere.latlng_to_xyz(0.05, math.radians(lngd))
        assert cap.contains_point(np.array([x, y, z]))


def test_cellunion_normalize_invariants():
    rng = np.random.RandomState(23)
    lat = rng.uniform(-80, 80, 200)
    lng = rng.uniform(-180, 180, 200)
    ids = cellid.parent(cellid.from_latlng_degrees(lat, lng),  6)
    # add children of some cells: they must be absorbed
    ch = cellid.children(ids[:20]).ravel()
    norm = cellunion.normalize(np.concatenate([ids, ch]))
    assert np.all(norm[:-1] < norm[1:])  # strictly sorted
    rmax = cellid.range_max(norm)[:-1]
    rmin = cellid.range_min(norm)[1:]
    assert np.all(rmax < rmin)           # disjoint
    # idempotent
    assert np.array_equal(cellunion.normalize(norm), norm)
    # children absorbed
    assert np.all(cellunion.contains_ids(norm, ch))


def test_cellunion_sibling_merge():
    parent = cellid.parent(cellid.from_latlng_degrees(
        np.array([42.0]), np.array([8.0])), 9)
    kids = cellid.children(parent).ravel()
    norm = cellunion.normalize(kids)
    assert len(norm) == 1 and norm[0] == parent[0]
    # all six faces stay six faces (no bogus face merge)
    faces = np.array([(f << 61) | (1 << 60) for f in range(6)], dtype=np.uint64)
    assert len(cellunion.normalize(faces)) == 6


def test_cellunion_set_ops():
    a_ids = cellid.parent(cellid.from_latlng_degrees(
        np.array([10.0, 10.1, 10.2]), np.array([20.0, 20.1, 20.2])), 8)
    b_ids = cellid.parent(cellid.from_latlng_degrees(
        np.array([10.2, 50.0]), np.array([20.2, 50.0])), 8)
    a = cellunion.normalize(a_ids)
    b = cellunion.normalize(b_ids)
    u = cellunion.get_union(a, b)
    i = cellunion.get_intersection(a, b)
    for cid in np.concatenate([a, b]):
        assert cellunion.contains_ids(u, np.array([cid]))[0]
    for cid in i:
        assert cellunion.contains_ids(a, np.array([cid]))[0]
        assert cellunion.contains_ids(b, np.array([cid]))[0]
    shared = cellid.parent(cellid.from_latlng_degrees(
        np.array([10.2]), np.array([20.2])), 8)
    assert cellunion.contains_ids(i, shared)[0]


def test_covering_covers_cap():
    rng = np.random.RandomState(31)
    for cap in _random_caps(10, rng, max_angle=0.2):
        cover = covering_of(cap, max_cells=8)
        assert 1 <= len(cover) <= 8
        norm = cellunion.normalize(cover)
        for p in _points_in_cap(cap, 30, rng):
            leaf = cellid.from_xyz(np.array([p[0]]), np.array([p[1]]), np.array([p[2]]))
            assert cellunion.contains_leaf_ids(norm, leaf)[0], \
                f"point not covered, cap angle {cap.angle()}"


def test_interior_covering_is_contained():
    rng = np.random.RandomState(37)
    for cap in _random_caps(5, rng, max_angle=0.3):
        interior = covering_of(cap, max_cells=8, interior=True)
        for cid in interior:
            cell = Cell(int(cid))
            assert cap.contains_cell(cell)


def test_covering_respects_levels():
    cap = Cap.from_latlng_radius(40.0, -74.0, 5000.0)
    cover = covering_of(cap, max_cells=8, min_level=4, max_level=10)
    lv = cellid.level(cover)
    assert np.all((lv >= 4) & (lv <= 10))
    cover2 = covering_of(cap, max_cells=8, min_level=2, max_level=12, level_mod=2)
    lv2 = cellid.level(cover2)
    assert np.all((lv2 - 2) % 2 == 0)


def test_covering_deterministic():
    cap = Cap.from_latlng_radius(55.7558, 37.6173, 75000.0)
    c1 = covering_of(cap, max_cells=8)
    c2 = covering_of(cap, max_cells=8)
    assert np.array_equal(c1, c2)


def test_covering_accuracy_reasonable():
    # median covering/cap area ratio should be near the documented 1.98
    # for maxCells=8 (reference S2RegionCoverer.php:172-176); allow slack.
    rng = np.random.RandomState(41)
    ratios = []
    for cap in _random_caps(40, rng, max_angle=0.5):
        cover = covering_of(cap, max_cells=8)
        ratios.append(cellunion.exact_area(cover) / cap.area())
    med = float(np.median(ratios))
    assert 1.0 <= med <= 3.0, med


def test_rect_covering():
    rect = LatLngRect.from_degrees(30, -10, 60, 45)
    cover = covering_of(rect, max_cells=8)
    assert 1 <= len(cover) <= 8
    rng = np.random.RandomState(43)
    norm = cellunion.normalize(cover)
    for _ in range(50):
        la = rng.uniform(30, 60)
        ln = rng.uniform(-10, 45)
        leaf = cellid.from_latlng_degrees(np.array([la]), np.array([ln]))
        assert cellunion.contains_leaf_ids(norm, leaf)[0]


def test_expand_covers_buffer():
    cap = Cap.from_latlng_radius(10.0, 10.0, 50000.0)
    cover = cellunion.normalize(covering_of(cap, max_cells=8))
    grown = cellunion.expand_angle(cover, 30000.0 / 6371000.0)
    # every point within 25km of the cap boundary must be in grown covering
    rng = np.random.RandomState(47)
    outer = Cap.from_latlng_radius(10.0, 10.0, 74000.0)
    for p in _points_in_cap(outer, 40, rng):
        leaf = cellid.from_xyz(np.array([p[0]]), np.array([p[1]]), np.array([p[2]]))
        assert cellunion.contains_leaf_ids(grown, leaf)[0]


def test_cell_subdivide():
    cid = cellid.parent(cellid.from_latlng_degrees(
        np.array([40.0]), np.array([-74.0])), 10)[0]
    parent = Cell(int(cid))
    kids = parent.subdivide()
    assert len(kids) == 4
    assert all(k.level == 11 for k in kids)
    for k in kids:
        assert parent.contains_cell(k)
        assert parent.contains_point(k.get_center())
    # children tile the parent: centers distinct, ids are the 4 children
    ids = sorted(int(k.id) for k in kids)
    assert ids == sorted(int(c) for c in cellid.children(
        np.array([cid], dtype=np.uint64))[0])


def test_simple_covering_matches_membership():
    from s2ray.kernel.coverer import get_simple_covering

    cap = Cap.from_latlng_radius(40.0, -74.0, 80000.0)
    cov = get_simple_covering(cap, cap.axis, level=9)
    assert len(cov) > 2
    # every returned cell may-intersect; every point in the cap is covered
    for cid in cov:
        assert cap.may_intersect_cell(Cell(int(cid)))
    rng = np.random.RandomState(3)
    pts = _points_in_cap(cap, 40, rng)
    norm = cellunion.normalize(cov)
    for p in pts:
        leaf = cellid.from_xyz(np.array([p[0]]), np.array([p[1]]),
                               np.array([p[2]]))
        assert cellunion.contains_leaf_ids(norm, leaf)[0]


def test_covering_deterministic_across_processes():
    """Cluster-reproducibility requirement: coverings must be identical in a
    fresh interpreter (no Python-hash or dict-order dependence)."""
    import subprocess
    import sys

    code = (
        "import numpy as np;"
        "from s2ray.kernel.region import Cap;"
        "from s2ray.kernel.coverer import covering_of;"
        "from s2ray.kernel import cellid;"
        "cap = Cap.from_latlng_radius(55.7558, 37.6173, 75000.0);"
        "print(','.join(cellid.to_token(covering_of(cap, max_cells=8))))"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd="/root/repo", timeout=120)
    remote_tokens = out.stdout.strip().split(",")
    local = cellid.to_token(covering_of(
        Cap.from_latlng_radius(55.7558, 37.6173, 75000.0), max_cells=8))
    assert remote_tokens == list(local)


def test_boolean_covering_guarantees():
    from s2ray.kernel.cellunion import boolean_covering

    a = Cap.from_latlng_radius(10.0, 10.0, 300000.0)
    b = Cap.from_latlng_radius(11.5, 11.5, 300000.0)  # overlapping
    rng = np.random.RandomState(5)
    union_cov = cellunion.normalize(boolean_covering(a, b, "union"))
    inter_cov = cellunion.normalize(boolean_covering(a, b, "intersection"))
    diff_cov = cellunion.normalize(boolean_covering(a, b, "difference"))
    assert len(inter_cov) > 0

    pts_a = _points_in_cap(a, 40, rng)
    pts_b = _points_in_cap(b, 40, rng)
    for p in pts_a + pts_b:
        leaf = cellid.from_xyz(np.array([p[0]]), np.array([p[1]]),
                               np.array([p[2]]))
        # union covers every point of A and B
        assert cellunion.contains_leaf_ids(union_cov, leaf)[0]
    for p in pts_a:
        if a.contains_point(p) and b.contains_point(p):
            leaf = cellid.from_xyz(np.array([p[0]]), np.array([p[1]]),
                                   np.array([p[2]]))
            # intersection covering is a superset of A∩B
            assert cellunion.contains_leaf_ids(inter_cov, leaf)[0]
    # difference never contains points of B (over-removal is allowed,
    # inclusion of B is not)
    for p in pts_b:
        if b.contains_point(p):
            leaf = cellid.from_xyz(np.array([p[0]]), np.array([p[1]]),
                                   np.array([p[2]]))
            assert not cellunion.contains_leaf_ids(diff_cov, leaf)[0]


# ---------------------------------------------------------------------------
# rect distance kernels (S2LatLngRect::getDistance, S2LatLngRect.php:222-305)

def _rect_boundary_samples(rect, n=600):
    """Dense (lat, lng) samples of a rect's boundary, radians."""
    lats = np.linspace(rect.lat.lo, rect.lat.hi, n)
    if rect.lng.is_inverted():
        span = (rect.lng.hi + 2 * np.pi) - rect.lng.lo
        lngs = rect.lng.lo + np.linspace(0.0, span, n)
        lngs = np.arctan2(np.sin(lngs), np.cos(lngs))
    else:
        lngs = np.linspace(rect.lng.lo, rect.lng.hi, n)
    blat = np.concatenate([lats, lats,
                           np.full(n, lats[0]), np.full(n, lats[-1])])
    blng = np.concatenate([np.full(n, lngs[0]), np.full(n, lngs[-1]),
                           lngs, lngs])
    return blat, blng


def test_rect_point_distance_vs_brute_force():
    from s2ray.kernel import sphere
    from s2ray.kernel.region import LatLngRect

    rng = np.random.RandomState(20260817)
    rects = [
        LatLngRect.from_degrees(40, 0, 50, 20),
        LatLngRect.from_degrees(-30, 100, -10, 140),
        LatLngRect.from_degrees(-10, 170, 10, -170),   # lng wrap
        LatLngRect.from_degrees(60, -120, 80, -60),    # near-polar
    ]
    for rect in rects:
        blat, blng = _rect_boundary_samples(rect)
        plat = np.radians(rng.uniform(-85, 85, 60))
        plng = np.radians(rng.uniform(-179.9, 179.9, 60))
        d = rect.get_distance_latlng(plat, plng)
        inside = rect.contains_points(plat, plng)
        for i in range(len(plat)):
            if inside[i]:
                assert d[i] == 0.0
                continue
            bf = sphere.haversine_distance_m(plat[i], plng[i], blat, blng,
                                             radius_m=1.0).min()
            assert abs(d[i] - bf) < 5e-5, (rect.lat.lo, i, d[i], bf)


def test_rect_rect_distance_properties():
    from s2ray.kernel import sphere
    from s2ray.kernel.region import LatLngRect

    a = LatLngRect.from_degrees(40, 0, 50, 20)
    # intersecting rects -> 0
    assert a.get_distance_rect(LatLngRect.from_degrees(45, 10, 55, 30)) == 0.0
    # pure latitude gap when lng intervals overlap
    b = LatLngRect.from_degrees(55, 10, 60, 30)
    assert abs(a.get_distance_rect(b) - np.radians(5.0)) < 1e-12
    # symmetric
    c = LatLngRect.from_degrees(42, 40, 48, 60)
    assert a.get_distance_rect(c) == c.get_distance_rect(a)
    # matches brute-force min over boundary samples
    blat_a, blng_a = _rect_boundary_samples(a, n=400)
    for other in (b, c, LatLngRect.from_degrees(-20, -60, -10, -30),
                  LatLngRect.from_degrees(35, 160, 45, -160)):
        blat_o, blng_o = _rect_boundary_samples(other, n=400)
        best = np.inf
        for la, ln in zip(blat_o[::7], blng_o[::7]):
            best = min(best, sphere.haversine_distance_m(
                la, ln, blat_a, blng_a, radius_m=1.0).min())
        d = a.get_distance_rect(other)
        assert d <= best + 1e-12
        assert abs(d - best) < 2e-3, (other.lat.lo, d, best)
        # and consistency with the point kernel from the other rect's corners
        for k in range(4):
            vlat, vlng = sphere.xyz_to_latlng(*other.get_vertex(k))
            assert d <= a.get_distance_latlng(
                np.array([float(vlat)]), np.array([float(vlng)]))[0] + 1e-12
