"""Extended operators: pruned kNN, polyline ops, edge index, validation."""

import math

import numpy as np
import pytest

from s2ray.kernel import cellid, sphere

SF = "/root/testdata/sf0.001"


def test_knn_pruned_matches_brute(ray_session):
    from s2ray.pipelines.knn import knn_pages, knn_pages_pruned
    from s2ray.pipelines.tiles import pages_with_cells

    ds = pages_with_cells(SF, token_level=None)
    a = knn_pages(ds, 55.7558, 37.6173, k=15).to_pandas()
    b = knn_pages_pruned(ds, 55.7558, 37.6173, k=15).to_pandas()
    assert sorted(a.page_id) == sorted(b.page_id)
    assert np.allclose(np.sort(a.dist_m), np.sort(b.dist_m))


def test_knn_pruned_remote_query(ray_session):
    # query point in the middle of the Pacific: radius must double several
    # times before k candidates exist
    from s2ray.pipelines.knn import knn_pages, knn_pages_pruned
    from s2ray.pipelines.tiles import pages_with_cells

    ds = pages_with_cells(SF, token_level=None)
    a = knn_pages(ds, -40.0, -140.0, k=5).to_pandas()
    b = knn_pages_pruned(ds, -40.0, -140.0, k=5).to_pandas()
    assert sorted(a.page_id) == sorted(b.page_id)


def test_polyline_kernels():
    from s2ray.pipelines.polyline import Polyline

    line = Polyline.from_latlng_degrees([(0.0, 0.0), (0.0, 10.0), (10.0, 10.0)])
    # arclength = 10 deg + 10 deg of great circle
    assert line.arclength_radians() == pytest.approx(
        math.radians(20.0), rel=1e-6)
    mid = line.interpolate(0.5)
    lat, lng = sphere.xyz_to_latlng(*mid)
    assert math.degrees(lng) == pytest.approx(10.0, abs=0.01)
    assert math.degrees(lat) == pytest.approx(0.0, abs=0.01)
    # distance of a point 1 deg north of the first segment
    d = line.distance_m(np.array([1.0]), np.array([5.0]))
    assert d[0] == pytest.approx(math.radians(1.0) * 6371000, rel=1e-3)
    # projection lands on the closest segment
    x, y, z = sphere.latlng_to_xyz(math.radians(1.0), math.radians(5.0))
    p, seg = line.project(np.array([x, y, z]))
    assert seg == 0


def test_polyline_join_matches_brute(ray_session):
    import __ray_entry__ as e
    from s2ray.pipelines.polyline import Polyline
    from s2ray.sources.pages import derive_geo_e4, e4_to_degrees

    line = Polyline.from_latlng_degrees(e.POLYLINE_DEG)
    uid = np.arange(500)
    lat_e4, lng_e4 = derive_geo_e4(uid)
    lat, lng = e4_to_degrees(lat_e4, lng_e4)
    d = line.distance_m(lat, lng)
    expect = set(uid[d <= e.POLYLINE_MAX_DIST_M].tolist())
    out = e.queries()["polyline_near"](SF).to_pandas()
    assert set(out.page_id) == expect


def test_edge_index_candidates_superset():
    from s2ray.kernel.edgeindex import EdgeIndex
    from s2ray.kernel.pip import Loop, _crossings_edge_vs_edges

    # 200-vertex jagged ring around a center: forces the indexed path
    rng = np.random.RandomState(5)
    angles = np.sort(rng.uniform(0, 2 * np.pi, 200))
    lat = 40.0 + 3.0 * (1 + 0.3 * rng.rand(200)) * np.sin(angles)
    lng = -70.0 + 3.0 * (1 + 0.3 * rng.rand(200)) * np.cos(angles)
    loop = Loop.from_latlng_degrees(np.stack([lat, lng], axis=1))
    idx = EdgeIndex(loop._edges_a, loop._edges_b)
    assert not idx.use_brute_force
    # every true crossing found by brute force must appear via the index
    for t in range(0, 40, 7):
        qa, qb = loop._edges_a[t], np.array(
            sphere.latlng_to_xyz(np.radians(40.0), np.radians(-70.0)))
        qb = np.asarray(qb, dtype=np.float64)
        brute = np.nonzero(_crossings_edge_vs_edges(
            qa, qb, loop._edges_a, loop._edges_b) > 0)[0]
        via_index = idx.crossing_edges(qa, qb)
        assert set(brute.tolist()) <= set(int(v) for v in via_index) | set(brute.tolist())
        assert set(int(v) for v in via_index) == set(brute.tolist())


def test_polygon_is_valid():
    from s2ray.kernel.pip import Polygon

    good = Polygon.from_latlng_loops(
        [[(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)]])
    assert good.is_valid()
    # bow-tie: self-intersecting
    bow = Polygon.from_latlng_loops(
        [[(0.0, 0.0), (10.0, 10.0), (0.0, 10.0), (10.0, 0.0)]])
    assert not bow.is_valid()


def test_covering_setops_invariants():
    # Same constants as __ray_entry__._setop_intervals; the membership-join
    # query is SQL-oracled, this checks the cell algebra itself.
    from s2ray.kernel import cellunion
    from s2ray.kernel.coverer import covering_of
    from s2ray.kernel.region import Cap

    a = cellunion.normalize(covering_of(
        Cap.from_latlng_radius(55.7558, 37.6173, 8000.0), max_cells=16))
    b = cellunion.normalize(covering_of(
        Cap.from_latlng_radius(55.80, 37.66, 8000.0), max_cells=16))
    u = cellunion.get_union(a, b)
    i = cellunion.get_intersection(a, b)
    ex = cellunion.expand_angle(a, 50000.0 / 6371000.0)
    for cid in a:
        assert cellunion.contains_ids(u, np.array([cid]))[0]
        assert cellunion.contains_ids(ex, np.array([cid]))[0]
    for cid in i:
        assert cellunion.intersects_ids(a, np.array([cid]))[0]
        assert cellunion.intersects_ids(b, np.array([cid]))[0]
    assert len(i) > 0  # the two 8 km caps overlap


def test_polyline_covering(ray_session):
    from s2ray.kernel import cellunion
    from s2ray.kernel.coverer import covering_of
    from s2ray.pipelines.polyline import Polyline

    line = Polyline.from_latlng_degrees(
        [(55.5, 37.0), (55.8, 37.7), (56.0, 38.5), (55.6, 39.5)])
    cov = cellunion.normalize(covering_of(line, max_cells=16))
    assert 1 <= len(cov) <= 20
    # every vertex and several interpolated points must be covered
    for t in np.linspace(0, 1, 25):
        p = line.interpolate(float(t))
        leaf = cellid.from_xyz(np.array([p[0]]), np.array([p[1]]),
                               np.array([p[2]]))
        assert cellunion.contains_leaf_ids(cov, leaf)[0], t


# -- kernel regression cases (review findings) --------------------------------

def _nz(v):
    v = np.asarray(v, dtype=np.float64)
    return v / np.linalg.norm(v)


def test_triangle_area_skinny_uses_girard():
    # Large skinny triangle: l'Huilier cancels to 0; the reference selects
    # Girard (dmin < 1e-2*s^5 and dmin < 0.1*s*area).
    a = np.array([1.0, 0.0, 0.0])
    c = _nz([-1.0, 1e-7, 0.0])
    b = _nz([0.0, 1.0, 1e-7])
    area = float(sphere.triangle_area(a, b, c))
    girard = float(sphere.girard_area(a, b, c))
    assert area > 0
    assert abs(area - girard) <= 1e-6 * girard
    # fat triangles still take l'Huilier (octant = pi/2 exactly)
    oct_area = float(sphere.triangle_area(
        np.array([1.0, 0, 0]), np.array([0, 1.0, 0]), np.array([0, 0, 1.0])))
    assert abs(oct_area - math.pi / 2) < 1e-12


def test_concave_loop_centroid_unbiased():
    # Concave-from-vertex-0 loop: centroid must match the planar shoelace
    # limit (small loop), which requires SIGNED fan accumulation.
    from s2ray.kernel.pip import Loop

    def ll(lng, lat):
        return np.array(sphere.latlng_to_xyz(
            math.radians(lat * 0.01), math.radians(lng * 0.01)))

    loop = Loop(np.array([ll(0, 0), ll(4, 0), ll(1, 1), ll(4, 2), ll(0, 2)]))
    area, cent = loop.get_area_centroid()
    lat, lng = sphere.xyz_to_latlng(*(cent / np.linalg.norm(cent)))
    assert abs(math.degrees(float(lng)) - 0.014000) < 2e-5
    assert abs(math.degrees(float(lat)) - 0.010000) < 2e-5


def test_edge_covering_tiny_edge_contains_endpoints():
    # Sub-centimeter edge straddling the face-0 u-axis: the covering level
    # must clamp to MAX_LEVEL-1 so the 4 vertex neighbors still bracket
    # both endpoint leaves.
    from s2ray.kernel.edgeindex import EdgeIndex

    a = _nz([1.0, 1e-10, 0.0])
    b = _nz([1.0, -1e-10, 0.0])
    cov = np.array(EdgeIndex.edge_covering(a, b), dtype=np.uint64)
    assert (cellid.level(cov) <= cellid.MAX_LEVEL - 1).all()
    rmin, rmax = cellid.range_min(cov), cellid.range_max(cov)
    for p in (a, b):
        leaf = np.uint64(cellid.from_xyz(*[np.array([v]) for v in p])[0])
        assert np.any((rmin <= leaf) & (leaf <= rmax))


def test_full_lng_rect_cap_bound_contains_rect():
    from s2ray.kernel.region import LatLngRect

    r = LatLngRect.from_degrees(-80, -180, 85, 180)
    cap = r.get_cap_bound()
    for lat_d, lng_d in ((-2.5, 180.0), (85.0, 0.0), (-79.9, -90.0)):
        p = np.array(sphere.latlng_to_xyz(
            math.radians(lat_d), math.radians(lng_d)))
        assert cap.contains_point(p), (lat_d, lng_d)


def test_adaptive_tiles_invariants(ray_session):
    """Quadtree contract: output cells are DISJOINT (no output cell is an
    ancestor of another), counts sum to the page total, every non-finest
    cell respects the capacity, and every split was necessary (each
    non-min-level cell's ancestors at coarser chain levels exceed it)."""
    from s2ray.pipelines.tiles import adaptive_tiles, tile_counts

    levels, cap = (4, 6, 8, 10), 8
    df = adaptive_tiles(SF, levels=levels, max_pages=cap).to_pandas()
    total = tile_counts(SF, level=8).to_pandas().n_pages.sum()
    assert df.n_pages.sum() == total
    assert set(df.level.unique()) <= set(levels)
    # capacity respected everywhere except the finest catch-all level
    assert (df.loc[df.level < max(levels), "n_pages"] <= cap).all()
    ids = df.cell_id.to_numpy().astype(np.uint64)
    lvs = df.level.to_numpy()
    id_set = set(ids.tolist())
    for lv in levels[:-1]:
        deeper = ids[lvs > lv]
        if len(deeper):
            anc = cellid.parent(deeper, lv)
            assert not (set(anc.tolist()) & id_set), "overlapping output"
    # minimality: a cell at level L>min exists only because its ancestors
    # at every coarser chain level hold more than cap pages
    counts = dict(zip(ids.tolist(), df.n_pages.tolist()))
    by_level = {lv: {} for lv in levels}
    for i, lv in zip(ids.tolist(), lvs.tolist()):
        by_level[lv][i] = counts[i]
    # rebuild full ancestor counts by summing descendants
    full = {}
    for lv in levels:
        for i, c in by_level[lv].items():
            full[i] = full.get(i, 0) + c
            for up in levels:
                if up < lv:
                    a = int(cellid.parent(np.array([i], np.uint64), up)[0])
                    full[a] = full.get(a, 0) + c
    for i, lv in zip(ids.tolist(), lvs.tolist()):
        for up in levels:
            if up < lv:
                a = int(cellid.parent(np.array([i], np.uint64), up)[0])
                assert full[a] > cap, (i, lv, up)


def test_grid_clusters_antimeridian_chain(ray_session):
    """A chain of occupied 1-degree cells crossing the antimeridian must
    collapse into ONE cluster (gx wrap), and a far-away point must not."""
    import ray.data

    from s2ray.pipelines.cluster import grid_clusters

    pts = [
        # chain: (10, 178), (10, 179), (10, -180), (11, -179) — all
        # 8-adjacent in grid space once gx wraps at the antimeridian
        (10.5, 178.5), (10.2, 179.4), (10.9, -179.6), (11.1, -178.3),
        # isolated singleton
        (-45.0, 30.0),
        # two pages in one cell (counts aggregate)
        (10.6, 178.2),
    ]
    ds = ray.data.from_items(
        [{"lat": la, "lng": ln} for la, ln in pts])
    out = grid_clusters(ds, cell_deg=1.0).to_pandas() \
        .sort_values("cluster_id", ignore_index=True)
    assert len(out) == 2
    chain = out[out.n_cells > 1].iloc[0]
    assert chain.n_cells == 4 and chain.n_pages == 5
    single = out[out.n_cells == 1].iloc[0]
    assert single.n_pages == 1
    # cluster id is the min packed key over the component
    W, offx, offy = 360, 180, 90
    keys = [(int(np.floor(la)) + offy) * W + (int(np.floor(ln)) + offx)
            for la, ln in pts[:4]]
    assert chain.cluster_id == min(keys)


def test_user_rolling_matches_pandas_reference(ray_session):
    """user_rolling vs an independent pandas groupby-rolling reference
    (different window mechanics: pandas .rolling vs the pipeline's
    clamped dual-cumsum)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from s2ray.pipelines.analytics import user_rolling
    from s2ray.pipelines.text import round_half_away

    sf = "/root/testdata/sf0.01"
    got = user_rolling(sf).to_pandas().sort_values("event_id") \
        .reset_index(drop=True)

    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_id", "ts", "user_id", "value"]) \
        .to_pandas().dropna(subset=["ts", "user_id", "value"])
    ev["cents"] = round_half_away(
        ev["value"].to_numpy() * 100.0, 0).astype(np.int64)
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    g = ev.groupby("user_id", sort=False)["cents"]
    ref = pd.DataFrame({
        "event_id": ev["event_id"].to_numpy(),
        "roll_cents": g.rolling(4, min_periods=1).sum()
            .reset_index(level=0, drop=True).astype(np.int64).to_numpy(),
        "roll_n": g.rolling(4, min_periods=1).count()
            .reset_index(level=0, drop=True).astype(np.int64).to_numpy(),
    }).sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(ref)
    assert np.array_equal(got["event_id"].to_numpy(),
                          ref["event_id"].to_numpy())
    assert np.array_equal(got["roll_cents"].to_numpy(),
                          ref["roll_cents"].to_numpy())
    assert np.array_equal(got["roll_n"].to_numpy(), ref["roll_n"].to_numpy())


def test_event_transitions_matches_pandas_reference(ray_session):
    import pyarrow.parquet as pq

    from s2ray.pipelines.analytics import event_transitions

    sf = "/root/testdata/sf0.01"
    got = event_transitions(sf).to_pandas() \
        .sort_values(["from_type", "to_type"]).reset_index(drop=True)

    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_id", "ts", "user_id", "event_type"]) \
        .to_pandas().dropna(subset=["ts", "user_id", "event_type"]) \
        .sort_values(["user_id", "ts", "event_id"])
    prev = ev.groupby("user_id", sort=False)["event_type"].shift(1)
    ref = ev.assign(from_type=prev).dropna(subset=["from_type"]) \
        .groupby(["from_type", "event_type"]).size() \
        .reset_index(name="n").rename(columns={"event_type": "to_type"}) \
        .sort_values(["from_type", "to_type"]).reset_index(drop=True)
    assert got["from_type"].tolist() == ref["from_type"].tolist()
    assert got["to_type"].tolist() == ref["to_type"].tolist()
    assert got["n"].tolist() == ref["n"].tolist()
    # every observed transition count is positive and types are real
    assert (got["n"] > 0).all()


def _lev_full(a: bytes, b: bytes) -> int:
    """Textbook O(len*len) byte-level Levenshtein (independent of the
    pipeline's two-pointer <=1 test)."""
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[lb]


def test_token_edit_pairs_matches_bruteforce(ray_session):
    """FastSS join vs brute-force all-pairs full-DP Levenshtein over the
    sf0.01 vocabulary — pairs AND exact distances must agree."""
    import itertools

    import pyarrow.parquet as pq

    from s2ray.pipelines.text import token_edit_pairs

    sf = "/root/testdata/sf0.01"
    got = token_edit_pairs(sf).to_pandas()
    got_pairs = {(a, b): d for a, b, d in
                 zip(got["tok_a"], got["tok_b"], got["dist"])}

    toks = sorted({t for txt in pq.read_table(
        f"{sf}/documents.parquet", columns=["text"])["text"].to_pylist()
        if txt for t in txt.split() if t})
    want = {}
    for a, b in itertools.combinations(toks, 2):
        d = _lev_full(a.encode(), b.encode())
        if 1 <= d <= 2:
            want[(a, b)] = d
    assert len(want) > 0          # the vocab really exercises the join
    assert got_pairs == want
    assert all(a < b for a, b in got_pairs)
    assert len(got) == len(got_pairs)  # no duplicate pair rows survive


def test_lev_bounded_kernel_vs_full_dp():
    """The pipeline's banded lev<=k verifier agrees with full DP on
    random byte strings including multi-byte UTF-8 fragments, for both
    k=1 and k=2 (returns k+1 beyond the bound)."""
    import random

    from s2ray.pipelines.text import _lev_bounded

    rng = random.Random(7)
    alphabet = b"ab\xc3\xa9"  # includes UTF-8 continuation bytes
    for _ in range(3000):
        a = bytes(rng.choice(alphabet) for _ in range(rng.randint(0, 7)))
        b = bytes(rng.choice(alphabet) for _ in range(rng.randint(0, 7)))
        full = _lev_full(a, b)
        for k in (1, 2):
            assert _lev_bounded(a, b, k) == min(full, k + 1), (a, b, k)


def test_cheapest_supplier_matches_pandas_reference(ray_session):
    """Argmin retrieval join vs an independent pandas transform-min
    reference (different mechanics: broadcast min-probe vs groupby
    transform)."""
    import pyarrow.parquet as pq

    from s2ray.pipelines.join import cheapest_supplier

    sf = "/root/testdata/sf0.01"
    got = cheapest_supplier(sf).to_pandas()
    got = got.astype({"partkey": np.int64, "suppkey": np.int64}) \
        .sort_values(["partkey", "suppkey"]).reset_index(drop=True)

    li = pq.read_table(f"{sf}/lineitem.parquet",
                       columns=["l_partkey", "l_suppkey",
                                "l_extendedprice"]).to_pandas()
    mn = li.groupby("l_partkey")["l_extendedprice"].transform("min")
    ref = li[li["l_extendedprice"] == mn] \
        .drop_duplicates(["l_partkey", "l_suppkey"]) \
        .rename(columns={"l_partkey": "partkey", "l_suppkey": "suppkey",
                         "l_extendedprice": "min_price"})
    sup = pq.read_table(f"{sf}/supplier.parquet",
                        columns=["s_suppkey", "s_name"]).to_pandas()
    ref = ref.merge(sup, left_on="suppkey", right_on="s_suppkey") \
        .drop(columns="s_suppkey") \
        .sort_values(["partkey", "suppkey"]).reset_index(drop=True)
    assert len(got) == len(ref)
    for c in ("partkey", "suppkey"):
        assert np.array_equal(got[c].to_numpy(), ref[c].to_numpy()), c
    assert np.array_equal(got["min_price"].to_numpy(),
                          ref["min_price"].to_numpy())  # bit-exact floats
    assert got["s_name"].tolist() == ref["s_name"].tolist()
    # every part with >= 1 lineitem appears at least once
    assert set(got["partkey"]) == set(li["l_partkey"])


def test_event_followups_matches_bruteforce(ray_session):
    """Range-count join vs a brute-force per-probe O(n_user) count,
    including boundary semantics (> t, <= t + w)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from s2ray.pipelines.analytics import event_followups

    sf = "/root/testdata/sf0.01"
    w_s = 7 * 86400
    got = event_followups(sf, window_s=w_s).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)

    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_id", "ts", "user_id",
                                "event_type"]).to_pandas() \
        .dropna(subset=["ts", "user_id"])
    ts = ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    ev = ev.assign(t=ts)
    probes = ev[ev["event_type"] == "view"]
    rows = []
    fol = ev[ev["event_type"] == "purchase"]
    fol_by_user = {u: g["t"].to_numpy() for u, g in fol.groupby("user_id")}
    w_us = w_s * 1_000_000
    for _, r in probes.iterrows():
        ft = fol_by_user.get(r["user_id"], np.array([], dtype=np.int64))
        n = int(((ft > r["t"]) & (ft <= r["t"] + w_us)).sum())
        rows.append((int(r["event_id"]), int(r["user_id"]), n))
    ref = pd.DataFrame(rows, columns=["event_id", "user_id", "n_follow"]) \
        .sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(ref)
    for c in ("event_id", "user_id", "n_follow"):
        assert np.array_equal(got[c].to_numpy().astype(np.int64),
                              ref[c].to_numpy()), c
    assert (got["n_follow"] >= 0).all() and got["n_follow"].max() > 0


# ---------------------------------------------------------------------------
# skyline kernel (round 4)

def test_skyline_filter_matches_bruteforce():
    """_skyline_filter == O(n^2) dominance check, incl. duplicate points
    (neither dominates the other -> both survive) and max-v ties across
    distinct n (the larger-n point dominates)."""
    import numpy as np

    from s2ray.pipelines.analytics import _skyline_filter

    rng = np.random.RandomState(7)
    for trial in range(25):
        m = rng.randint(1, 60)
        n = rng.randint(0, 8, size=m).astype(np.int64)
        v = rng.randint(0, 8, size=m).astype(np.int64)
        keep = _skyline_filter(n, v)
        brute = np.ones(m, dtype=bool)
        for i in range(m):
            dom = ((n >= n[i]) & (v >= v[i])
                   & ((n > n[i]) | (v > v[i])))
            brute[i] = not dom.any()
        assert np.array_equal(keep, brute), (trial, n.tolist(), v.tolist())
    assert _skyline_filter(np.zeros(0, np.int64),
                           np.zeros(0, np.int64)).shape == (0,)
