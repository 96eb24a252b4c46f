"""Round-2 operators: edge-soup assembly pipeline, exact group quantiles
on adversarial distributions, stratified sampling, interval join edges."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.01"


# -- assembly ----------------------------------------------------------------

def test_assembly_recovers_union_exactly(ray_session):
    from s2ray.kernel.pip import Loop
    from s2ray.pipelines.assembly import (assemble_regions, edge_soup_table,
                                          split_quad_pieces)

    quad = [(10.0, 20.0), (10.0, 30.0), (20.0, 30.0), (20.0, 20.0)]
    pieces, union_deg = split_quad_pieces(quad, frac=0.4)
    tbl = edge_soup_table({"r": pieces})
    polys = assemble_regions(tbl)
    want = Loop.from_latlng_degrees(union_deg)
    got = polys["r"].loops[0]
    # assembled loop must contain exactly the union vertices (cyclic shift ok)
    gv = got.vertices
    wv = want.vertices
    assert len(gv) == len(wv) == 6
    shift = np.nonzero((wv == gv[0]).all(axis=1))[0]
    assert len(shift) == 1
    assert np.array_equal(np.roll(wv, -shift[0], axis=0), gv)


def test_assembly_unused_edges_raise(ray_session):
    from s2ray.kernel.pip import Loop
    from s2ray.pipelines.assembly import assemble_regions

    lp = Loop.from_latlng_degrees([(0, 0), (0, 5), (5, 5), (5, 0)])
    v = lp.vertices
    tbl = pa.table({
        "region_id": pa.array(["r", "r"], type=pa.string()),
        "x0": [v[0][0], v[1][0]], "y0": [v[0][1], v[1][1]],
        "z0": [v[0][2], v[1][2]],
        "x1": [v[1][0], v[2][0]], "y1": [v[1][1], v[2][1]],
        "z1": [v[1][2], v[2][2]],
    })
    with pytest.raises(ValueError, match="could not be assembled"):
        assemble_regions(tbl)


# -- group quantiles ---------------------------------------------------------

def _write_events(tmpdir, groups, values):
    os.makedirs(tmpdir, exist_ok=True)
    n = len(groups)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "ts": pa.array(np.full(n, np.datetime64("2024-01-01", "us"))),
        "user_id": pa.array(np.zeros(n, dtype=np.int64)),
        "event_type": pa.array(groups, type=pa.string()),
        "value": pa.array(values, type=pa.float64()),
    }), f"{tmpdir}/events.parquet")


@pytest.mark.parametrize("case", ["constant", "tiny", "skewed"])
def test_group_quantiles_edge_cases(ray_session, tmp_path, case):
    import duckdb

    from s2ray.pipelines.analytics import group_quantiles

    rng = np.random.RandomState(3)
    if case == "constant":
        groups = ["a"] * 100 + ["b"] * 7
        values = [5.5] * 100 + list(rng.normal(size=7))
    elif case == "tiny":
        groups = ["a", "b", "b"]
        values = [1.0, 2.0, -3.0]
    else:
        groups = (["a"] * 1000) + (["b"] * 3)
        values = list(np.repeat(rng.pareto(0.5, 100) * 1e6, 10)) + [1, 2, 3]
    d = str(tmp_path / case)
    _write_events(d, groups, values)
    qs = (0.25, 0.5, 0.9, 0.99, 1.0)
    got = group_quantiles(d, qs=qs)
    con = duckdb.connect()
    want = con.execute(
        f"SELECT event_type, unnest({list(qs)}) AS q, "
        f"unnest(quantile_disc(value, {list(qs)})) AS value "
        f"FROM read_parquet('{d}/events.parquet') "
        f"GROUP BY event_type ORDER BY event_type, q").df()
    got = got.sort_values(["event_type", "q"]).reset_index(drop=True)
    want = want.sort_values(["event_type", "q"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# -- sampling ----------------------------------------------------------------

def test_sample_corpus_deterministic_and_rates(ray_session):
    from s2ray.pipelines.sampling import sample_corpus

    rates = {f"src{k}": 5000 for k in range(20)}
    a = sample_corpus(SF, rates).to_pandas().sort_values("doc_id")
    b = sample_corpus(SF, rates).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    frac = len(a) / 500
    assert 0.35 < frac < 0.65  # 50% nominal on 500 docs
    zero = sample_corpus(SF, {})
    assert zero.count() == 0


# -- interval join -----------------------------------------------------------

def test_interval_join_boundaries(ray_session, tmp_path):
    from s2ray.pipelines.analytics import interval_join

    base = 1704067200
    d = str(tmp_path / "iv")
    os.makedirs(d, exist_ok=True)
    ts = np.array([base - 1, base, base + 59, base + 60, base + 61],
                  dtype="datetime64[s]").astype("datetime64[us]")
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(5), type=pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array(np.zeros(5, dtype=np.int64)),
        "event_type": pa.array(["x"] * 5, type=pa.string()),
        "value": pa.array(np.zeros(5)),
    }), f"{d}/events.parquet")
    out = interval_join(d, [("w", base, base + 60)]).to_pandas()
    # half-open [start, end): base and base+59 in; base-1, base+60, +61 out
    assert sorted(out["event_id"]) == [1, 2]


def test_assembly_property_random_polygons(ray_session):
    """Random convex-ish polygons split at a random fraction: DIRECTED_XOR
    soup assembly must reproduce the union loop's PIP on random probes."""
    from s2ray.kernel import sphere
    from s2ray.kernel.pip import Loop
    from s2ray.pipelines.assembly import (assemble_regions, edge_soup_table,
                                          split_quad_pieces)

    rng = np.random.RandomState(11)
    for trial in range(12):
        lat0 = rng.uniform(-60, 50)
        lng0 = rng.uniform(-170, 150)
        dlat = rng.uniform(2, 15)
        dlng = rng.uniform(2, 15)
        quad = [(lat0, lng0), (lat0, lng0 + dlng),
                (lat0 + dlat, lng0 + dlng), (lat0 + dlat, lng0)]
        frac = rng.uniform(0.15, 0.85)
        pieces, union_deg = split_quad_pieces(quad, frac=frac)
        polys = assemble_regions(edge_soup_table({"r": pieces}))
        want = Loop.from_latlng_degrees(union_deg)
        got = polys["r"]
        lat = rng.uniform(lat0 - 2, lat0 + dlat + 2, 400)
        lng = rng.uniform(lng0 - 2, lng0 + dlng + 2, 400)
        x, y, z = sphere.latlng_to_xyz(np.radians(lat), np.radians(lng))
        pts = np.stack([x, y, z], axis=1)
        assert (got.contains_points_xyz(pts)
                == want.contains_points_xyz(pts)).all(), (trial, quad, frac)


def test_media_resize_stage(ray_session):
    from s2ray.stages.multimodal import MediaDecodeStage, MediaResizeStage, read_media

    ds = read_media(SF)
    decoded = ds.map_batches(MediaDecodeStage, concurrency=(1, 2),
                             batch_size=128, batch_format="pyarrow")
    thumbs = decoded.map_batches(MediaResizeStage, concurrency=(1, 2),
                                 fn_constructor_kwargs={"max_dim": 128},
                                 batch_size=128, batch_format="pyarrow")
    df = thumbs.to_pandas()
    assert len(df) > 0
    assert (np.maximum(df["out_width"], df["out_height"]) <= 128).all()
    assert (df["out_width"] >= 1).all() and (df["out_height"] >= 1).all()
    # aspect preserved within rounding
    dec = decoded.to_pandas()
    src = dec[dec.media_type == "image"].set_index("media_id")
    for _, row in df.head(50).iterrows():
        w, h = src.loc[row["media_id"], ["width", "height"]]
        if max(w, h) > 128:
            ratio = w / h
            assert abs(row["out_width"] / row["out_height"] - ratio) \
                / ratio < 0.05
    # thumbnails carry the THMB header with matching dims
    b = df["thumb"].iloc[0]
    assert b[:4] == b"THMB"
    assert int.from_bytes(b[4:6], "big") == df["out_width"].iloc[0]


def test_group_quantiles_integer_group_col(ray_session, tmp_path):
    """Regression: pass A used str(group) while passes B/C looked up the
    raw value -> KeyError for any non-string group column."""
    import duckdb

    from s2ray.pipelines.analytics import group_quantiles

    rng = np.random.RandomState(9)
    n = 500
    groups = rng.randint(0, 4, n)
    values = rng.normal(size=n) * 100
    d = str(tmp_path / "ig")
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "ts": pa.array(np.full(n, np.datetime64("2024-01-01", "us"))),
        "user_id": pa.array(groups.astype(np.int64)),
        "event_type": pa.array(["x"] * n, type=pa.string()),
        "value": pa.array(values, type=pa.float64()),
    }), f"{d}/events.parquet")
    got = group_quantiles(d, qs=(0.5, 0.9), group_col="user_id")
    want = duckdb.connect().execute(
        f"SELECT user_id, unnest([0.5, 0.9]) AS q, "
        f"unnest(quantile_disc(value, [0.5, 0.9])) AS value "
        f"FROM read_parquet('{d}/events.parquet') GROUP BY user_id "
        f"ORDER BY user_id, q").df()
    got = got.sort_values(["user_id", "q"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# -- generic equi-joins -------------------------------------------------------

def test_hash_joins_inner_left_and_collision(ray_session, tmp_path):
    import ray

    from s2ray.pipelines.join import broadcast_hash_join, copartition_hash_join

    left = ray.data.from_items([{"k": i, "a": i * 10} for i in range(20)])
    right_tbl = pa.table({"k": pa.array([3, 5, 5, 40], type=pa.int64()),
                          "b": pa.array(["x", "y", "z", "w"])})
    inner = broadcast_hash_join(left, right_tbl, on="k").to_pandas()
    assert sorted(map(tuple, inner[["k", "a", "b"]].itertuples(index=False))) \
        == [(3, 30, "x"), (5, 50, "y"), (5, 50, "z")]
    lj = broadcast_hash_join(left, right_tbl, on="k", how="left").to_pandas()
    assert len(lj) == 21  # 20 left rows + 1 extra for the duplicate k=5
    assert lj["b"].notna().sum() == 3

    right_ds = ray.data.from_items(
        [{"j": i, "b": f"v{i}"} for i in range(0, 40, 2)])
    co = copartition_hash_join(left, right_ds, on="k", right_on="j",
                               n_parts=8).to_pandas()
    assert sorted(co["k"]) == list(range(0, 20, 2))
    assert (co.sort_values("k")["b"].to_numpy()
            == [f"v{i}" for i in range(0, 20, 2)]).all()

    clash = ray.data.from_items([{"j": 1, "a": 9}])
    with pytest.raises(ValueError, match="collision"):
        copartition_hash_join(left, clash, on="k", right_on="j")


def test_heavy_hitters_matches_exact_vocab(ray_session):
    from s2ray.pipelines.text import heavy_hitters, vocab_top_k

    exact = vocab_top_k(SF, k=50).to_pandas()
    hh = heavy_hitters(SF, k=50, width=64).to_pandas()
    pd.testing.assert_frame_equal(
        hh.reset_index(drop=True), exact.reset_index(drop=True))
    # MG superset property holds even at an adversarially small width
    hh8 = heavy_hitters(SF, k=5, width=8).to_pandas()
    assert set(hh8["token"][:5]) == set(exact["token"][:5])


def test_write_partitioned_generic_resume(ray_session, tmp_path):
    import glob

    import ray

    from s2ray.state.sink import write_partitioned

    ds = ray.data.from_items(
        [{"k": i % 4, "v": i} for i in range(100)])
    out = str(tmp_path / "parts")
    r1 = write_partitioned(ds, out, part_col="k")
    assert r1 == {"partitions_written": 4, "partitions_total": 4,
                  "rows": 100}
    files = sorted(glob.glob(f"{out}/k=*/data.parquet"))
    assert len(files) == 4
    # resume: all partitions skip
    r2 = write_partitioned(ds, out, part_col="k")
    assert r2["partitions_written"] == 0 and r2["partitions_total"] == 4
    # damage one manifest -> only that partition rewrites
    os.remove(f"{out}/_manifest/2.json")
    r3 = write_partitioned(ds, out, part_col="k")
    assert r3["partitions_written"] == 1
    # content round-trip
    back = pd.concat([pd.read_parquet(f) for f in files])
    assert sorted(back["v"]) == list(range(100))


def test_copartition_join_salted_hot_key(ray_session):
    import ray

    from s2ray.pipelines.join import copartition_hash_join

    # key 7 is hot on the left; results must equal the unsalted join
    left = ray.data.from_items(
        [{"k": 7 if i % 2 else i, "a": i} for i in range(200)])
    right = ray.data.from_items(
        [{"k": i, "b": i * 100} for i in range(0, 20)])
    plain = copartition_hash_join(left, right, on="k").to_pandas()
    salted = copartition_hash_join(left, right, on="k",
                                   hot_keys=[7], salt=4).to_pandas()
    key = ["k", "a", "b"]
    pd.testing.assert_frame_equal(
        plain[key].sort_values(key).reset_index(drop=True),
        salted[key].sort_values(key).reset_index(drop=True))


def test_semi_anti_joins_both_plans_agree(ray_session):
    import ray

    from s2ray.pipelines.join import (broadcast_semi_anti_join,
                                      copartition_hash_join)

    left = ray.data.from_items([{"k": i, "a": i * 10} for i in range(30)])
    keys = [3, 5, 5, 7, 41]            # dup + out-of-range keys are fine
    sem_b = broadcast_semi_anti_join(left, keys, on="k").to_pandas()
    ant_b = broadcast_semi_anti_join(left, keys, on="k", anti=True) \
        .to_pandas()
    assert sorted(sem_b["k"]) == [3, 5, 7]
    assert sorted(ant_b["k"]) == [i for i in range(30) if i not in (3, 5, 7)]
    assert list(sem_b.columns) == ["k", "a"]       # left columns only

    right = ray.data.from_items([{"j": k, "payload": "zzz"} for k in keys])
    sem_c = copartition_hash_join(left, right, on="k", right_on="j",
                                  n_parts=4, how="semi").to_pandas()
    ant_c = copartition_hash_join(left, right, on="k", right_on="j",
                                  n_parts=4, how="anti").to_pandas()
    # both plans produce identical row sets (payload never collides: the
    # right side is reduced to its key column before the shuffle)
    assert sorted(map(tuple, sem_c[["k", "a"]].itertuples(index=False))) \
        == sorted(map(tuple, sem_b[["k", "a"]].itertuples(index=False)))
    assert sorted(map(tuple, ant_c[["k", "a"]].itertuples(index=False))) \
        == sorted(map(tuple, ant_b[["k", "a"]].itertuples(index=False)))


def test_semi_anti_join_salted_hot_keys(ray_session):
    import numpy as np
    import ray

    from s2ray.pipelines.join import copartition_hash_join

    # hot key 1 appears 200x on the left; salting must not change results
    left = ray.data.from_items(
        [{"k": 1, "a": i} for i in range(200)]
        + [{"k": i, "a": -i} for i in range(2, 20)])
    right = ray.data.from_items([{"k": 1}, {"k": 4}, {"k": 99}])
    plain = copartition_hash_join(left, right, on="k", how="semi",
                                  n_parts=4).to_pandas()
    salted = copartition_hash_join(left, right, on="k", how="semi",
                                   n_parts=4, hot_keys=np.array([1]),
                                   salt=4).to_pandas()
    assert sorted(map(tuple, plain[["k", "a"]].itertuples(index=False))) \
        == sorted(map(tuple, salted[["k", "a"]].itertuples(index=False)))
    assert (plain["k"] == 1).sum() == 200 and (plain["k"] == 4).sum() == 1


def test_copartition_outer_join_matches_duckdb(ray_session):
    import duckdb
    import ray

    from s2ray.pipelines.join import copartition_hash_join

    left = ray.data.from_items([{"k": i, "a": i * 10} for i in range(10)])
    right = ray.data.from_items(
        [{"j": k, "b": f"v{k}"} for k in [2, 2, 5, 30, 31]])
    got = copartition_hash_join(left, right, on="k", right_on="j",
                                n_parts=4, how="outer").to_pandas()
    want = duckdb.connect().execute(
        "SELECT coalesce(l.k, r.j) AS k, l.a AS a, r.b AS b "
        "FROM (SELECT unnest(range(10)) AS k, unnest(range(10)) * 10 AS a) l "
        "FULL OUTER JOIN (SELECT unnest([2, 2, 5, 30, 31]) AS j, "
        "'v' || CAST(unnest([2, 2, 5, 30, 31]) AS VARCHAR) AS b) r "
        "ON l.k = r.j").df()
    key = ["k", "a", "b"]
    gs = sorted(map(tuple, got[key].astype(object).where(got[key].notna(), None)
                    .itertuples(index=False)))
    ws = sorted(map(tuple, want[key].astype(object).where(want[key].notna(), None)
                    .itertuples(index=False)))
    # 10 left rows + 1 extra (k=2 matches twice) + 2 right-only = 13
    assert gs == ws and len(got) == 13


def test_hll_distinct_within_error_and_deterministic(ray_session):
    from s2ray.pipelines.analytics import distinct_users, distinct_users_hll

    exact = distinct_users(SF).to_pandas().set_index("event_type")
    est1 = distinct_users_hll(SF).to_pandas().set_index("event_type")
    est2 = distinct_users_hll(SF).to_pandas().set_index("event_type")
    assert sorted(est1.index) == sorted(exact.index)
    for g in exact.index:
        n, e = int(exact.loc[g, "n_distinct"]), int(est1.loc[g, "n_distinct"])
        assert abs(e - n) <= max(2, 0.05 * n), (g, n, e)
    # deterministic: same input -> identical estimates across runs
    assert est1.sort_index().equals(est2.sort_index())


def test_hll_registers_merge_equals_single_pass():
    import numpy as np

    from s2ray.pipelines.analytics import (_hll_estimate, _hll_registers)

    rng = np.random.RandomState(3)
    ids = rng.randint(0, 10**12, size=40000).astype(np.int64)
    whole = _hll_registers(ids)
    parts = np.maximum.reduce([_hll_registers(c)
                               for c in np.array_split(ids, 7)])
    # register maxima merge exactly, regardless of how the data was split
    assert (whole == parts).all()
    n = len(np.unique(ids))
    e = _hll_estimate(whole)
    assert abs(e - n) <= 0.05 * n


def test_outer_join_rejects_hot_key_salting(ray_session):
    import numpy as np
    import ray

    from s2ray.pipelines.join import copartition_hash_join

    left = ray.data.from_items([{"k": 1, "a": 0}])
    right = ray.data.from_items([{"k": 1}])
    with pytest.raises(ValueError, match="outer"):
        copartition_hash_join(left, right, on="k", how="outer",
                              hot_keys=np.array([1]))


def test_running_totals_exact_for_any_range_size(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from s2ray.pipelines.analytics import running_token_totals

    rng = np.random.RandomState(5)
    n = 200
    # non-contiguous, shuffled doc ids: the scan must order by doc_id,
    # not by file/row order
    ids = rng.permutation(np.arange(0, 4 * n, 4))[:n].astype(np.int64)
    texts = [" ".join("w" for _ in range(rng.randint(0, 30))) for _ in ids]
    pq.write_table(pa.table({"doc_id": pa.array(ids),
                             "text": pa.array(texts)}),
                   str(tmp_path / "documents.parquet"))
    order = np.argsort(ids)
    want_n = np.array([len(t.split()) for t in texts], dtype=np.int64)[order]
    want_cum = np.cumsum(want_n)
    for G in (3, 64, 10_000):
        out = running_token_totals(str(tmp_path), budget=50, range_size=G) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert np.array_equal(out["doc_id"].to_numpy(), ids[order])
        assert np.array_equal(out["n_tokens"].to_numpy(), want_n)
        assert np.array_equal(out["cum_tokens"].to_numpy(), want_cum)
        assert np.array_equal(out["example_id"].to_numpy(),
                              (want_cum - want_n) // 50)


def test_funnel_boundaries_strict_after_and_inclusive_end(ray_session,
                                                          tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from s2ray.pipelines.analytics import funnel_conversions

    base = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    rows = [
        # u1: b exactly at t_a -> NOT converted (strictly after)
        (1, base, "view"), (1, base, "purchase"),
        # u2: b exactly at t_a + T -> converted (inclusive end)
        (2, base, "view"), (2, base + 3600 * s, "purchase"),
        # u3: b one second past the window -> not converted
        (3, base, "view"), (3, base + 3601 * s, "purchase"),
        # u4: b before a -> not converted
        (4, base + 10 * s, "view"), (4, base, "purchase"),
        # u5: two a's, one b converts only the first
        (5, base, "view"), (5, base + 2 * 3600 * s, "view"),
        (5, base + 60 * s, "purchase"),
    ]
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), type=pa.int64()),
        "ts": pa.array([r[1] for r in rows]),
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[2] for r in rows], type=pa.string()),
        "value": pa.array(np.zeros(len(rows))),
    }), str(tmp_path / "events.parquet"))
    out = funnel_conversions(str(tmp_path)).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    assert out["user_id"].tolist() == [1, 2, 3, 4, 5]
    assert out["n_a"].tolist() == [1, 1, 1, 1, 2]
    assert out["n_converted"].tolist() == [0, 1, 0, 0, 1]


def test_funnel_chunked_key_path_matches_duckdb(ray_session, tmp_path):
    """Force the users-per-chunk overflow guard: one hash partition with
    enough distinct users x a year-wide time span that user*span keys
    would not fit int64 in a single pass."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from s2ray.pipelines.analytics import funnel_conversions

    rng = np.random.RandomState(9)
    n_users = 200_000
    uid = (np.arange(n_users, dtype=np.int64) * 64)      # all in part 0
    year_us = 365 * 24 * 3600 * 1_000_000
    ta = rng.randint(0, year_us, size=n_users)
    # half the users get a purchase at a random lag around the 1h window
    has_b = rng.rand(n_users) < 0.5
    lag = rng.randint(1, 2 * 3600 * 1_000_000, size=n_users)
    rows_uid = np.concatenate([uid, uid[has_b]])
    rows_ts = np.concatenate([ta, (ta + lag)[has_b]])
    rows_et = np.array(["view"] * n_users + ["purchase"] * int(has_b.sum()),
                       dtype=object)
    base = np.int64(1704067200) * 1_000_000
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(len(rows_uid)), type=pa.int64()),
        "ts": pa.array((base + rows_ts).astype("datetime64[us]")),
        "user_id": pa.array(rows_uid, type=pa.int64()),
        "event_type": pa.array(rows_et, type=pa.string()),
        "value": pa.array(np.zeros(len(rows_uid))),
    }), str(tmp_path / "events.parquet"))
    out = funnel_conversions(str(tmp_path)).to_pandas()
    got = int(out["n_converted"].sum())
    want = duckdb.connect().execute(
        "SELECT count(*) FROM read_parquet(?) e WHERE e.event_type='view' "
        "AND EXISTS (SELECT 1 FROM read_parquet(?) b WHERE "
        "b.user_id = e.user_id AND b.event_type = 'purchase' AND "
        "epoch_us(b.ts) > epoch_us(e.ts) AND "
        "epoch_us(b.ts) <= epoch_us(e.ts) + 3600000000)",
        [str(tmp_path / "events.parquet")] * 2).fetchone()[0]
    assert len(out) == n_users
    assert got == int(want) > 0


def test_round_half_away_matches_duckdb_on_fuzz_and_ties():
    import duckdb

    from s2ray.pipelines.text import round_half_away

    rng = np.random.RandomState(17)
    vals = np.concatenate([
        rng.uniform(-1, 1, 2000),
        rng.uniform(-1e6, 1e6, 2000),
        # exact dyadic ties at the 6th decimal: k / 2^a scaled
        np.array([10 / 256, 1 / 128, 3 / 8192, -10 / 256, 5 / 64]),
        np.array([0.0, -0.0, 1.0000005, -1.0000005]),
    ])
    got = round_half_away(vals, 6)
    con = duckdb.connect()
    want = con.execute(
        "SELECT round(v, 6) FROM (SELECT unnest(?) AS v)",
        [vals.tolist()]).df().iloc[:, 0].to_numpy()
    assert np.array_equal(got, want), \
        np.argwhere(got != want)[:5]


def test_clz64_matches_bit_length():
    from s2ray.pipelines.analytics import _clz64

    rng = np.random.RandomState(3)
    vals = np.concatenate([
        np.array([1, 2, 3, (1 << 63), (1 << 64) - 1, 5], dtype=np.uint64),
        rng.randint(1, 1 << 62, 5000).astype(np.uint64),
    ])
    got = _clz64(vals)
    want = np.array([64 - int(v).bit_length() for v in vals])
    assert np.array_equal(got, want)


def test_sorted_membership_matches_isin():
    from s2ray.pipelines.join import _sorted_membership

    rng = np.random.RandomState(4)
    keys = np.unique(rng.randint(-10**12, 10**12, 3000).astype(np.int64))
    probe = rng.randint(-10**12, 10**12, 5000).astype(np.int64)
    probe[:500] = keys[rng.randint(0, len(keys), 500)]    # guaranteed hits
    assert np.array_equal(_sorted_membership(keys, probe),
                          np.isin(probe, keys))
    assert not _sorted_membership(np.empty(0, np.int64), probe).any()


def test_png_codec_roundtrip_all_filters():
    from s2ray.stages.codecs import decode_png, encode_png

    rng = np.random.RandomState(1)
    for c in (1, 3, 4):
        px = rng.randint(0, 256, (13, 17, c)).astype(np.uint8)
        arr = px[:, :, 0] if c == 1 else px
        for filters in (None, [k % 5 for k in range(13)]):
            meta, out = decode_png(encode_png(arr, row_filters=filters))
            want = arr[:, :, None] if arr.ndim == 2 else arr
            assert out.shape == want.shape and (out == want).all()
            assert meta["width"] == 17 and meta["height"] == 13


def test_media_thumbnails_are_real_decodable_pngs(ray_session):
    from s2ray.stages.codecs import decode_png, resize_nearest
    from s2ray.stages.multimodal import MediaThumbnailStage, read_media

    ds = read_media(SF)
    thumbs = ds.map_batches(MediaThumbnailStage, concurrency=(1, 2),
                            fn_constructor_kwargs={"max_dim": 24},
                            batch_size=128, batch_format="pyarrow")
    df = thumbs.to_pandas()
    src = {int(r["media_id"]): r["payload"]
           for _, r in ds.to_pandas().iterrows()
           if r["media_type"] == "image"}
    assert len(df) == len(src) > 0       # every image decoded, none lost
    for _, row in df.head(40).iterrows():
        meta, px = decode_png(row["thumb_png"])   # thumbs are REAL PNGs
        assert max(px.shape[:2]) <= 24
        assert (px.shape[1], px.shape[0]) == (row["out_width"],
                                              row["out_height"])
        _, full = decode_png(src[int(row["media_id"])])
        assert (px == resize_nearest(full, 24)).all()   # exact NN resize


def test_audio_stats_real_pcm(ray_session):
    from s2ray.stages.codecs import decode_wav
    from s2ray.stages.multimodal import AudioStatsStage, read_media

    ds = read_media(SF)
    stats = ds.map_batches(AudioStatsStage, concurrency=(1, 2),
                           batch_size=128, batch_format="pyarrow") \
        .to_pandas()
    src = ds.to_pandas()
    n_audio = int((src["media_type"] == "audio").sum())
    assert len(stats) == n_audio > 0         # every audio row decoded
    assert (stats["n_samples"] >= 64).all()
    assert (stats["peak"] <= 2048).all() and (stats["rms"] > 0).all()
    # cross-check one row against a direct decode
    row = stats.iloc[0]
    payload = src[src.media_id == row["media_id"]].iloc[0]["payload"]
    meta, samples = decode_wav(payload)
    assert meta["sample_rate"] == row["sample_rate"]
    assert samples.shape[0] == row["n_samples"]


def test_quantile_sketch_rank_error_bound(ray_session):
    """One-pass sketch quantiles land within the guaranteed <= 1/S
    relative rank error of the true per-group rank, on the real events
    table (skewed groups, duplicate values)."""
    import duckdb

    from s2ray.pipelines.analytics import group_quantiles_sketch

    S = 256  # small summary so the bound is actually exercised
    got = group_quantiles_sketch(SF, qs=(0.5, 0.9, 0.99),
                                 summary_size=S).to_pandas()
    con = duckdb.connect()
    vals = con.execute(
        f"SELECT event_type, value FROM read_parquet('{SF}/events.parquet')"
        " WHERE value IS NOT NULL").df()
    assert len(got) > 0
    for _, row in got.iterrows():
        grp = vals.loc[vals["event_type"] == row["event_type"],
                       "value"].to_numpy()
        grp.sort()
        n = len(grp)
        target = max(0, int(np.ceil(row["q"] * n)) - 1)
        # rank window of the returned value within the true sorted group
        lo = np.searchsorted(grp, row["value"], side="left")
        hi = np.searchsorted(grp, row["value"], side="right") - 1
        err = 0 if lo <= target <= hi else min(abs(lo - target),
                                               abs(hi - target))
        assert err <= n / S + 2, (row["event_type"], row["q"], err, n)


def test_quantile_sketch_exact_when_groups_fit(ray_session, tmp_path):
    """Groups smaller than summary_size are kept verbatim -> the sketch
    IS quantile_disc-exact there (matches the exact operator)."""
    from s2ray.pipelines.analytics import group_quantiles, \
        group_quantiles_sketch

    rng = np.random.RandomState(5)
    df = pd.DataFrame({"event_type": np.repeat(["a", "b", "c"], 200),
                       "value": rng.normal(size=600)})
    p = str(tmp_path / "ev.parquet")
    pq.write_table(pa.Table.from_pandas(df), p)
    import ray.data

    def make_ds():
        return ray.data.read_parquet(p)

    a = group_quantiles(None, qs=(0.5, 0.9), make_ds=make_ds) \
        .sort_values(["event_type", "q"]).reset_index(drop=True)
    b = group_quantiles_sketch(None, qs=(0.5, 0.9), summary_size=1024,
                               make_ds=make_ds).to_pandas() \
        .sort_values(["event_type", "q"]).reset_index(drop=True)
    assert a.equals(b)


def test_props_field_stats_nulls_and_garbage(ray_session, tmp_path):
    """Field extraction over adversarial props: NULL props, garbage JSON,
    missing field, and a type with NO valid k (sum/min/max must be NULL,
    not 0) — engine vs the SQL mirror on the same crafted table."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as e
    from s2ray.pipelines.analytics import props_field_stats

    rows = [
        (0, "click", '{"k": 7}'),
        (1, "click", None),
        (2, "click", "not-json"),
        (3, "view", '{"k": 123}'),
        (4, "view", '{"k": 0}'),
        (5, "error", '{"other": 9}'),   # field missing for every 'error'
        (6, "error", None),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([0] * len(rows), type=pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), type=pa.int64()),
        "event_type": pa.array([r[1] for r in rows], type=pa.string()),
        "value": pa.array([1.0] * len(rows), type=pa.float64()),
        "props": pa.array([r[2] for r in rows], type=pa.string()),
    })
    pq.write_table(t, f"{tmp_path}/events.parquet")
    got = props_field_stats(str(tmp_path)).to_pandas() \
        .sort_values("event_type", ignore_index=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    want = con.execute(e.oracle_sql()["props_field_stats"]).df() \
        .sort_values("event_type", ignore_index=True)
    for c in got.columns:
        assert got[c].astype(str).equals(want[c].astype(str)), c
    err = got[got.event_type == "error"].iloc[0]
    assert err.n_events == 2 and err.n_with_k == 0
    assert pd.isna(err.sum_k) and pd.isna(err.min_k) and pd.isna(err.max_k)


def test_revenue_by_nation_plans_agree(ray_session):
    """The size-picked broadcast plan and the forced co-partition plan
    must produce the identical nation revenue table."""
    from s2ray.pipelines.join import revenue_by_nation

    SF = "/root/testdata/sf0.001"
    a = revenue_by_nation(SF).to_pandas() \
        .sort_values("n_name", ignore_index=True)
    b = revenue_by_nation(SF, broadcast_threshold_bytes=0).to_pandas() \
        .sort_values("n_name", ignore_index=True)
    for c in a.columns:
        assert a[c].astype(str).equals(b[c].astype(str)), c
