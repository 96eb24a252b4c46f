"""Golden + property tests for the vectorized S2 cell-id kernel.

Golden values come from the reference smoke test
(/root/reference/tests/SmokeTest.php:102-154) and from first-principles
invariants of the S2 cell decomposition.
"""

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from s2ray.kernel import cellid, sphere


# ---------------------------------------------------------------------------
# golden: reference SmokeTest testB (tokens -> lat/lng radians)

def test_token_decode_golden_1():
    cid = cellid.token_to_id("700c7c5346a246ee")
    lat, lng = cellid.to_latlng_radians(np.array([cid], dtype=np.uint64))
    assert lat[0] == pytest.approx(-0.023004811178492, rel=0, abs=1e-13)
    assert lng[0] == pytest.approx(-3.06557268979, rel=0, abs=1e-11)


def test_token_decode_golden_2():
    cid = cellid.token_to_id("414ab9b68fd00000")
    lat, lng = cellid.to_latlng_radians(np.array([cid], dtype=np.uint64))
    assert lat[0] == pytest.approx(0.97053474915648, rel=0, abs=1e-13)
    assert lng[0] == pytest.approx(0.66268771618818, rel=0, abs=1e-13)


def test_smoketest_distance_golden():
    # SmokeTest testB tail: distance between decoded cell center and a point
    cid = cellid.token_to_id("414ab9b68fd00000")
    lat2, lng2 = cellid.to_latlng_radians(np.array([cid], dtype=np.uint64))
    lat1 = sphere.degrees_to_radians(55.605873)
    lng1 = sphere.degrees_to_radians(37.970864)
    d = sphere.haversine_distance_m(lat1, lng1, lat2[0], lng2[0])
    assert d == pytest.approx(212.99711509717, rel=0, abs=1e-8)


def test_smoketest_testa_goldens():
    # SmokeTest testA (tests/SmokeTest.php:102-134)
    from_lat = sphere.degrees_to_radians(55.578201)
    from_lng = sphere.degrees_to_radians(37.912176)
    to_lat = sphere.degrees_to_radians(55.578324)
    to_lng = sphere.degrees_to_radians(37.9109)
    assert from_lat == pytest.approx(0.9700225997852, abs=1e-13)
    assert from_lng == pytest.approx(0.66169229779557, abs=1e-13)
    assert to_lat == pytest.approx(0.97002474654019, abs=1e-13)
    assert to_lng == pytest.approx(0.66167002739432, abs=1e-13)

    dist = sphere.haversine_distance_m(from_lat, from_lng, to_lat, to_lng)
    assert dist == pytest.approx(81.362381188294, abs=1e-8)

    bearing = sphere.great_circle_bearing(from_lat, from_lng, to_lat, to_lng)
    assert bearing == pytest.approx(-1.4018857232359, abs=1e-10)

    lat2, lng2 = sphere.great_circle_destination(from_lat, from_lng, bearing, 40)
    assert lat2 == pytest.approx(0.97002365521829, abs=1e-13)
    assert lng2 == pytest.approx(0.66168134906715, abs=1e-13)

    bearing2 = sphere.great_circle_bearing(lat2, lng2, to_lat, to_lng)
    assert bearing2 == pytest.approx(-1.4018947548004, abs=1e-10)

    lat3, lng3 = sphere.great_circle_destination(lat2, lng2, bearing2, dist - 40)
    assert lat3 == pytest.approx(0.97002474654019, abs=1e-11)
    assert lng3 == pytest.approx(0.66167002739432, abs=1e-11)

    dist3 = sphere.haversine_distance_m(from_lat, from_lng, lat3, lng3)
    assert dist3 == pytest.approx(81.362381188297, abs=1e-7)


def test_e6_codec():
    lat = sphere.e6_to_radians(55608152)
    assert sphere.radians_to_degrees(lat) == pytest.approx(55.608152, abs=1e-12)


# ---------------------------------------------------------------------------
# structural invariants

def test_face_cells():
    # 6 face cells: id = face << 61 | 1 << 60
    for f in range(6):
        cid = np.uint64((f << 61) | (1 << 60))
        assert cellid.is_valid(np.array([cid]))[0]
        assert cellid.level(np.array([cid]))[0] == 0
        assert cellid.face(np.array([cid]))[0] == f
        assert cellid.is_face(np.array([cid]))[0]


def test_lookup_tables_are_inverse():
    for orig in (0, 1, 2, 3):
        for ij in range(256):
            pos_entry = int(cellid.LOOKUP_POS[(ij << 2) + orig])
            pos = pos_entry >> 2
            orient = pos_entry & 3
            back = int(cellid.LOOKUP_IJ[(pos << 2) + orig])
            assert back >> 2 == ij
            assert back & 3 == orient


def test_known_leaf_center_roundtrip_exact():
    # A leaf cell id decodes to its center; re-encoding the center returns
    # the same leaf id (center is interior to the leaf cell).
    rng = np.random.RandomState(7)
    lat = rng.uniform(-85, 85, size=2000)
    lng = rng.uniform(-180, 180, size=2000)
    ids = cellid.from_latlng_degrees(lat, lng)
    clat, clng = cellid.to_latlng_radians(ids)
    ids2 = cellid.from_latlng_radians(clat, clng)
    assert np.array_equal(ids, ids2)


def test_encode_decode_within_half_leaf_cell():
    rng = np.random.RandomState(11)
    lat = rng.uniform(-89.9, 89.9, size=5000)
    lng = rng.uniform(-180, 180, size=5000)
    ids = cellid.from_latlng_degrees(lat, lng)
    assert np.all(cellid.is_leaf(ids))
    assert np.all(cellid.is_valid(ids))
    clat, clng = cellid.to_latlng_degrees(ids)
    # max leaf-cell diagonal ~ MAX_DIAG.get_value(30) radians
    max_diag_rad = sphere.MAX_DIAG.get_value(30)
    d = sphere.haversine_distance_m(
        sphere.degrees_to_radians(lat), sphere.degrees_to_radians(lng),
        sphere.degrees_to_radians(clat), sphere.degrees_to_radians(clng),
        radius_m=1.0,
    )
    assert np.all(d <= max_diag_rad)


def test_parent_child_algebra():
    rng = np.random.RandomState(3)
    lat = rng.uniform(-80, 80, size=1000)
    lng = rng.uniform(-180, 180, size=1000)
    leaf = cellid.from_latlng_degrees(lat, lng)
    for lvl in (0, 5, 12, 20, 29):
        p = cellid.parent(leaf, lvl)
        assert np.all(cellid.level(p) == lvl)
        assert np.all(cellid.contains(p, leaf))
        assert np.all(cellid.range_min(p) <= leaf)
        assert np.all(leaf <= cellid.range_max(p))
        # children of parent at lvl+1 contain the leaf exactly once
        ch = cellid.children(p)
        inside = cellid.contains(ch.ravel(), np.repeat(leaf, 4)).reshape(-1, 4)
        assert np.all(inside.sum(axis=1) == 1)


def test_parent_is_prefix_ordered():
    # Hilbert order: unsigned cell-id order of leaves == order of ancestors
    rng = np.random.RandomState(5)
    lat = rng.uniform(-80, 80, size=3000)
    lng = rng.uniform(-180, 180, size=3000)
    leaf = np.sort(cellid.from_latlng_degrees(lat, lng))
    par = cellid.parent(leaf, 10)
    assert np.all(np.diff(par.astype(np.uint64).view(np.uint64)) >= np.uint64(0) - np.uint64(0))
    assert np.all(par[:-1] <= par[1:])


def test_token_roundtrip():
    rng = np.random.RandomState(13)
    lat = rng.uniform(-80, 80, size=500)
    lng = rng.uniform(-180, 180, size=500)
    ids = cellid.from_latlng_degrees(lat, lng)
    for lvl in (3, 10, 30):
        p = cellid.parent(ids, lvl) if lvl < 30 else ids
        toks = cellid.to_token(p)
        back = cellid.from_token(list(toks))
        assert np.array_equal(back, p)


def test_next_prev_wrap():
    first = cellid.begin(5)
    last = cellid.prev_id(cellid.end(5))
    assert cellid.next_wrap(np.array([last]))[0] == first
    assert cellid.prev_wrap(np.array([first]))[0] == last


def test_edge_neighbors_distinct_and_same_level():
    rng = np.random.RandomState(17)
    lat = rng.uniform(-80, 80, size=200)
    lng = rng.uniform(-180, 180, size=200)
    ids = cellid.parent(cellid.from_latlng_degrees(lat, lng), 10)
    nbrs = cellid.get_edge_neighbors(ids)
    for t in range(len(ids)):
        row = nbrs[t]
        assert len(set(row.tolist())) == 4
        assert np.all(cellid.level(row) == 10)
        assert ids[t] not in row


def test_vertex_neighbors():
    rng = np.random.RandomState(19)
    lat = rng.uniform(-80, 80, size=100)
    lng = rng.uniform(-180, 180, size=100)
    leaf = cellid.from_latlng_degrees(lat, lng)
    ids, counts = cellid.get_vertex_neighbors(leaf, 8)
    assert np.all((counts == 3) | (counts == 4))
    assert np.all(cellid.level(ids) == 8)
    # the parent itself is always among them
    off = 0
    par = cellid.parent(leaf, 8)
    for t, c in enumerate(counts):
        group = ids[off:off + c]
        assert par[t] in group
        off += c


def test_all_neighbors_touch_cell():
    cid = cellid.parent(cellid.from_latlng_degrees(np.array([40.0]), np.array([-75.0])), 12)[0]
    nbrs = cellid.get_all_neighbors(cid)
    assert len(nbrs) == 8
    assert np.all(cellid.level(nbrs) == 12)
    assert cid not in nbrs


# ---------------------------------------------------------------------------
# hypothesis property tests

@settings(max_examples=200, deadline=None)
@given(
    lat=st.floats(min_value=-89.999, max_value=89.999),
    lng=st.floats(min_value=-179.999, max_value=179.999),
)
def test_hyp_encode_valid_and_center_close(lat, lng):
    ids = cellid.from_latlng_degrees(np.array([lat]), np.array([lng]))
    assert cellid.is_valid(ids)[0]
    assert cellid.is_leaf(ids)[0]
    clat, clng = cellid.to_latlng_degrees(ids)
    d = sphere.haversine_distance_m(
        sphere.degrees_to_radians(np.array([lat])), sphere.degrees_to_radians(np.array([lng])),
        sphere.degrees_to_radians(clat), sphere.degrees_to_radians(clng), radius_m=1.0)
    assert d[0] <= sphere.MAX_DIAG.get_value(30)


@settings(max_examples=100, deadline=None)
@given(data=st.data())
def test_hyp_parent_monotone(data):
    lat = data.draw(st.floats(min_value=-80, max_value=80))
    lng = data.draw(st.floats(min_value=-179, max_value=179))
    l1 = data.draw(st.integers(min_value=0, max_value=29))
    l2 = data.draw(st.integers(min_value=l1 + 1, max_value=30))
    leaf = cellid.from_latlng_degrees(np.array([lat]), np.array([lng]))
    p1 = cellid.parent(leaf, l1)
    p2 = cellid.parent(leaf, l2) if l2 < 30 else leaf
    assert cellid.contains(p1, p2)[0]
    assert cellid.intersects(p1, p2)[0]
    assert not cellid.contains(p2, p1)[0] or l1 == l2


def test_metric_level_selection():
    # MIN_WIDTH.get_max_level: max level whose min cell width >= value
    m = sphere.MIN_WIDTH
    for lvl in (0, 4, 10, 17, 25, 30):
        v = m.get_value(lvl)
        assert m.get_max_level(v) == lvl
    assert m.get_max_level(10.0) == 0
    assert m.get_max_level(1e-18) == 30


def test_all_neighbors_same_level_matches_scalar():
    """Vectorized 3x3-stencil neighbors == scalar AppendAllNeighbors
    (sorted), including cube-face corners (7 neighbors) and poles."""
    import numpy as np

    from s2ray.kernel import cellid as ci

    rng = np.random.default_rng(7)
    lat = np.concatenate([rng.uniform(-90, 90, 500), [89.999, -89.999]])
    lng = np.concatenate([rng.uniform(-180, 180, 500), [0.0, 179.999]])
    for lvl in (1, 4, 9, 14):
        cells = np.unique(ci.parent(ci.from_latlng_degrees(lat, lng), lvl))
        flat, counts = ci.all_neighbors_same_level(cells, lvl)
        off = np.concatenate([[0], np.cumsum(counts)])
        assert counts.min() >= 7 and counts.max() <= 8
        for r, c in enumerate(cells):
            ref = np.sort(ci.get_all_neighbors(c, lvl))
            assert np.array_equal(ref, flat[off[r]:off[r + 1]]), (lvl, c)


def test_location_hex_codec_goldens():
    """SmokeTest.php:49-60,103-104: encode(decode(hex)) round-trips, and
    hex08 matches PHP's 64-bit sprintf('%08x') including the 16-char
    two's complement for negative microdegrees."""
    import numpy as np

    lat_e6, lng_e6 = sphere.decode_location_e6(
        np.array(["0351272d,0242b406"], dtype=object))
    assert lat_e6[0] == 55650093 and lng_e6[0] == 37925894
    enc = sphere.encode_location_e6(lat_e6 / 1e6, lng_e6 / 1e6)
    assert enc[0] == "0351272d,0242b406"

    # PHP (int) truncation + 64-bit sprintf two's complement for negatives
    assert sphere.hex08(np.array([-37912176]))[0] == "fffffffffdbd8190"
    assert sphere.hex08(np.array([0]))[0] == "00000000"
    assert sphere.hex08(np.array([2**32 - 1]))[0] == "ffffffff"
    vals = np.array([-90_000_000, -1, 0, 1, 90_000_000, 180_000_000])
    assert np.array_equal(sphere.unhex64(sphere.hex08(vals)), vals)
    # truncation toward zero, not floor
    enc2 = sphere.encode_location_e6(np.array([-0.0000001]),
                                     np.array([0.0000009]))
    assert enc2[0] == "00000000,00000000"
