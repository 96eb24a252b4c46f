"""Point-in-polygon parity tests against an independent lat/lng winding
oracle on small polygons + structural invariants."""

import math

import numpy as np
import pytest

from s2ray.kernel import cellid, cellunion, sphere
from s2ray.kernel.coverer import covering_of
from s2ray.kernel.pip import Loop, Polygon
from s2ray.kernel.region import Cell


def _winding_oracle(poly_deg, lat, lng):
    """Planar even-odd ray casting in lat/lng space — valid for small convex
    polygons far from poles/antimeridian when probe points are far from
    edges relative to geodesic/planar deviation."""
    inside = np.zeros(np.shape(lat), dtype=bool)
    arr = np.asarray(poly_deg, dtype=np.float64)
    x = np.asarray(lng, dtype=np.float64)
    y = np.asarray(lat, dtype=np.float64)
    n = len(arr)
    j = n - 1
    for i in range(n):
        yi, xi = arr[i]
        yj, xj = arr[j]
        cond = ((yi > y) != (yj > y)) & (
            x < (xj - xi) * (y - yi) / (yj - yi) + xi)
        inside ^= cond
        j = i
    return inside


SQUARE = [(10.0, 10.0), (10.0, 20.0), (20.0, 20.0), (20.0, 10.0)]  # CCW


def test_loop_orientation_and_origin():
    loop = Loop.from_latlng_degrees(SQUARE)
    assert loop.contains_latlng_degrees(np.array([15.0]), np.array([15.0]))[0]
    assert not loop.contains_latlng_degrees(np.array([25.0]), np.array([15.0]))[0]
    assert not loop.contains_latlng_degrees(np.array([-15.0]), np.array([15.0]))[0]


def test_loop_matches_winding_oracle():
    loop = Loop.from_latlng_degrees(SQUARE)
    rng = np.random.RandomState(7)
    lat = rng.uniform(5, 25, 3000)
    lng = rng.uniform(5, 25, 3000)
    ours = loop.contains_latlng_degrees(lat, lng)
    oracle = _winding_oracle(SQUARE, lat, lng)
    # disagree only within a hair of the boundary (geodesic vs planar edges)
    disagree = ours != oracle
    if disagree.any():
        # all disagreements must be near an edge (within ~0.15 deg of a
        # geodesic sagitta for 10-degree edges)
        d_edge = np.minimum.reduce([
            np.abs(lat - 10), np.abs(lat - 20), np.abs(lng - 10), np.abs(lng - 20)])
        assert d_edge[disagree].max() < 0.2
    assert disagree.mean() < 0.02


def test_cw_loop_is_complement():
    ccw = Loop.from_latlng_degrees(SQUARE)
    cw = Loop.from_latlng_degrees(list(reversed(SQUARE)))
    rng = np.random.RandomState(11)
    lat = rng.uniform(-60, 60, 500)
    lng = rng.uniform(-170, 170, 500)
    a = ccw.contains_latlng_degrees(lat, lng)
    b = cw.contains_latlng_degrees(lat, lng)
    assert np.all(a ^ b)  # complement everywhere (boundary excluded by sampling)


def test_polygon_with_hole():
    shell = [(0.0, 0.0), (0.0, 30.0), (30.0, 30.0), (30.0, 0.0)]
    hole = [(10.0, 10.0), (20.0, 10.0), (20.0, 20.0), (10.0, 20.0)]  # CW
    poly = Polygon.from_latlng_loops([shell, hole])
    assert poly.contains_latlng_degrees(np.array([5.0]), np.array([5.0]))[0]
    assert not poly.contains_latlng_degrees(np.array([15.0]), np.array([15.0]))[0]
    assert not poly.contains_latlng_degrees(np.array([40.0]), np.array([15.0]))[0]
    # scalar path agrees with vectorized
    for la, ln, expect in [(5, 5, True), (15, 15, False), (40, 15, False)]:
        x, y, z = sphere.latlng_to_xyz(math.radians(la), math.radians(ln))
        assert poly.contains_point(np.array([x, y, z])) == expect


def test_loop_area():
    # a "quarter hemisphere" style band has known area; use a big square and
    # check monotonicity + rough value instead
    loop = Loop.from_latlng_degrees(SQUARE)
    a = loop.area()
    # planar estimate: (10 deg)^2 * cos(15 deg) in steradians
    est = (math.radians(10.0) ** 2) * math.cos(math.radians(15.0))
    assert a == pytest.approx(est, rel=0.05)


def test_loop_cell_relations_and_covering():
    loop = Loop.from_latlng_degrees(SQUARE)
    cover = cellunion.normalize(covering_of(loop, max_cells=12))
    assert len(cover) >= 1
    rng = np.random.RandomState(13)
    lat = rng.uniform(10.2, 19.8, 200)
    lng = rng.uniform(10.2, 19.8, 200)
    leaf = cellid.from_latlng_degrees(lat, lng)
    assert np.all(cellunion.contains_leaf_ids(cover, leaf))
    # interior covering cells are contained
    interior = covering_of(loop, max_cells=8, interior=True)
    for cid in interior:
        assert loop.contains_cell(Cell(int(cid)))


def test_polygon_covering_with_hole():
    shell = [(0.0, 0.0), (0.0, 30.0), (30.0, 30.0), (30.0, 0.0)]
    hole = [(10.0, 10.0), (20.0, 10.0), (20.0, 20.0), (10.0, 20.0)]
    poly = Polygon.from_latlng_loops([shell, hole])
    cover = cellunion.normalize(covering_of(poly, max_cells=20))
    rng = np.random.RandomState(17)
    lat = rng.uniform(0.5, 9.5, 100)
    lng = rng.uniform(0.5, 29.5, 100)
    leaf = cellid.from_latlng_degrees(lat, lng)
    assert np.all(cellunion.contains_leaf_ids(cover, leaf))


def test_large_polygon_pip_vs_winding():
    # 300-vertex star-ish ring: exercises the O(E) vectorized parity scan
    rng = np.random.RandomState(9)
    angles = np.sort(rng.uniform(0, 2 * np.pi, 300))
    radius = 5.0 + 1.5 * np.sin(5 * angles)
    lat = 20.0 + radius * np.sin(angles)
    lng = 40.0 + radius * np.cos(angles)
    poly_deg = list(zip(lat, lng))
    loop = Loop.from_latlng_degrees(poly_deg)
    qlat = rng.uniform(12, 28, 2000)
    qlng = rng.uniform(32, 48, 2000)
    ours = loop.contains_latlng_degrees(qlat, qlng)
    oracle = _winding_oracle(poly_deg, qlat, qlng)
    disagree = (ours != oracle).mean()
    assert disagree < 0.01  # only near-boundary geodesic-vs-planar band
    assert 0.2 < ours.mean() < 0.8  # nondegenerate test


def test_indexed_loop_matches_flat():
    from s2ray.kernel.pip import IndexedLoop

    rng = np.random.RandomState(21)
    angles = np.sort(rng.uniform(0, 2 * np.pi, 400))
    radius = 4.0 + 1.0 * np.sin(6 * angles)
    lat = -10.0 + radius * np.sin(angles)
    lng = 100.0 + radius * np.cos(angles)
    loop = Loop.from_latlng_degrees(np.stack([lat, lng], axis=1))
    idx = IndexedLoop(loop, max_cells=128)
    qlat = rng.uniform(-18, -2, 5000)
    qlng = rng.uniform(92, 108, 5000)
    a = loop.contains_latlng_degrees(qlat, qlng)
    b = idx.contains_latlng_degrees(qlat, qlng)
    assert np.array_equal(a, b)
    assert 0.1 < a.mean() < 0.9


def test_region_index_graduated_index_policy():
    """RegionIndex's auto-index crossover (round-4 measured): flat below
    24 edges, 32-cell index for mid-size, full 256-cell index from 64 —
    and every tier stays bit-exact with the flat polygon over a dense
    local point cloud."""
    import numpy as np

    from s2ray.kernel.pip import IndexedPolygon, Polygon
    from s2ray.pipelines.spatial_join import RegionIndex

    def star(nv, cx=50.0, cy=10.0, r0=3.0, r1=5.0):
        t = np.linspace(0, 2 * np.pi, nv, endpoint=False)
        r = np.where(np.arange(nv) % 2 == 0, r1, r0)
        return list(zip((cx + r * np.sin(t)).tolist(),
                        (cy + r * np.cos(t)).tolist()))

    polys = {f"p{nv}": Polygon.from_latlng_loops([star(nv)])
             for nv in (8, 24, 64)}
    idx = RegionIndex(dict(polys))
    assert isinstance(idx.regions["p8"], Polygon)          # flat tier
    assert isinstance(idx.regions["p24"], IndexedPolygon)  # 32-cell tier
    assert isinstance(idx.regions["p64"], IndexedPolygon)  # full tier
    assert len(idx.regions["p24"].indexed[0].cells) <= 32
    assert len(idx.regions["p64"].indexed[0].cells) <= 256

    rng = np.random.RandomState(5)
    lat = rng.uniform(44, 56, 20000)
    lng = rng.uniform(2, 18, 20000)
    for name, poly in polys.items():
        a = poly.contains_latlng_degrees(lat, lng)
        b = idx.regions[name].contains_latlng_degrees(lat, lng)
        assert np.array_equal(a, b), name
