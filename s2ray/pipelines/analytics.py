"""Generic analytic operators over the pages/events/embeddings tables:
time-window aggregates, domain rollups, per-label embedding centroids.

All use the partial-then-merge pattern: vectorized in-batch aggregation
first, so the shuffle moves only (key, partial) rows.

Epoch floor-division audit (review follow-up): numpy's ``//`` FLOORS
while DuckDB's integer ``//`` TRUNCATES toward zero, so any shared
``epoch // bucket`` expression diverges for pre-1970 timestamps.  The
sliding-window operators (events_sliding_distinct, peak_window) carry
the double-mod guard ``es - ((es % s) + s) % s`` in their SQL mirrors
(regression: tests/test_pipelines_robustness.py::
test_sliding_distinct_negative_epochs); the day/hour-bucket family
(events_hourly, weekday/dau/retention/cohort/...) documents the
``ts >= 1970`` bound where it appears — the synthetic events table and
any crawl corpus satisfy it, and a pre-1970 use case must add the same
double-mod to BOTH sides.
"""

from __future__ import annotations

import numpy as np

from ..sources.readers import read_table
import pandas as pd
import pyarrow as pa

from .text import round_half_away


def _drop_null_users(batch: pa.Table, col: str = "user_id") -> pa.Table:
    """User-keyed operator contract: events with a NULL user id are
    unattributable and ignored (sessions/funnel oracles mirror it with
    WHERE user_id IS NOT NULL; SQL count(DISTINCT)/equi-joins already
    skip NULL keys).  No-op when the column has no nulls."""
    import pyarrow.compute as pc

    if batch[col].null_count:
        batch = batch.filter(pc.is_valid(batch[col]))
    return batch


def _drop_null_ts(batch: pa.Table, col: str = "ts") -> pa.Table:
    """Time-keyed operator contract: events with a NULL timestamp are
    unattributable to any bucket/window/session and ignored (oracles
    mirror it with WHERE ts IS NOT NULL; comparisons against NULL ts drop
    the row in SQL anyway).  Crucial for the packed int64 group keys:
    NaT -> INT64_MIN would overflow `hour * n_uniques + code` and land
    the row in an arbitrary real group.  No-op when ts has no nulls."""
    import pyarrow.compute as pc

    if batch[col].null_count:
        batch = batch.filter(pc.is_valid(batch[col]))
    return batch


def pages_per_month(pages_ds):
    """(month:timestamp, n_pages) from warc_ts."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["warc_ts"].to_numpy(zero_copy_only=False)
        months = ts.astype("datetime64[M]").astype(np.int64)  # months since epoch
        u, c = np.unique(months, return_counts=True)
        return pa.table({"mkey": pa.array(u), "partial_n": pa.array(c.astype(np.int64))})

    agg = (
        pages_ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("mkey")
        .aggregate(Sum("partial_n", alias_name="n_pages"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        m = batch["mkey"].to_numpy(zero_copy_only=False)
        month = m.astype("datetime64[M]").astype("datetime64[us]")
        return pa.table({"month": pa.array(month), "n_pages": batch["n_pages"]})

    return agg.map_batches(finalize, batch_format="pyarrow")


def url_domain_counts(pages_ds):
    """(domain, n_pages) extracted from the url column."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        dom = pc.struct_field(
            pc.extract_regex(batch["url"], r"https://(?P<d>[^/]+)/"), "d")
        # non-matching urls bucket as '' (DuckDB regexp_extract parity)
        # instead of crashing np.unique on None; null urls land there too
        dom = pc.fill_null(dom, "")
        codes, uniq = _dict_codes(dom)
        c = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table({"domain": pa.array(uniq, type=pa.string()),
                         "partial_n": pa.array(c)})

    return (
        pages_ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("domain")
        .aggregate(Sum("partial_n", alias_name="n_pages"))
    )


def domain_lang_entropy(pages_ds):
    """Language-diversity score per site: (domain, n_pages, n_langs,
    lang_entropy) where lang_entropy is the Shannon entropy (nats) of the
    domain's page-language distribution — the standard "is this site
    monolingual or a translation farm?" crawl-curation signal.

    Exactness: H = ln(T) - (sum_l c_l ln c_l) / T over EXACT integer
    counts; the float fold sum_l c_l ln(c_l) is ORDER-PINNED to ascending
    lang on both engines (a sequential left fold here, list_reduce over
    list(... ORDER BY lang) in the SQL mirror), so the IEEE additions are
    performed in the identical sequence and the rounded result is
    bit-equal — a plain SUM() would leave the oracle's addition order
    unspecified.  Scale shape: per-batch (domain, lang) partial counts
    (bounded by domains x languages per batch), ONE Sum groupby at that
    cardinality, and a per-domain fold over <= n_languages rows.
    """
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .text import round_half_away

    def partial(batch: pa.Table) -> pa.Table:
        dom = pc.struct_field(
            pc.extract_regex(batch["url"], r"https://(?P<d>[^/]+)/"), "d")
        dom = pc.fill_null(dom, "")
        cd, ud = _dict_codes(dom)
        cl, ul = _dict_codes(batch["lang"])
        packed = cd * len(ul) + cl
        u, c = np.unique(packed, return_counts=True)
        return pa.table({
            "domain": pa.array([ud[int(p) // len(ul)] for p in u],
                               type=pa.string()),
            "lang": pa.array([ul[int(p) % len(ul)] for p in u],
                             type=pa.string()),
            "pn": pa.array(c.astype(np.int64)),
        })

    agg = (pages_ds.map_batches(partial, batch_format="pyarrow",
                                batch_size=None)
           .groupby(["domain", "lang"])
           .aggregate(Sum("pn", alias_name="c")))

    def entropy(df: pd.DataFrame) -> pd.DataFrame:
        import math

        df = df.sort_values("lang", kind="stable")
        cs = df["c"].to_numpy().astype(np.int64)
        t = int(cs.sum())
        s = 0.0
        for c in cs.tolist():            # <= n_languages iterations
            s += float(c) * math.log(float(c))
        h = round_half_away(np.float64(math.log(float(t)) - s / float(t)))
        return pd.DataFrame({
            "domain": [df["domain"].iloc[0]],
            "n_pages": np.array([t], dtype=np.int64),
            "n_langs": np.array([len(cs)], dtype=np.int64),
            "lang_entropy": np.array([h], dtype=np.float64),
        })

    return agg.groupby("domain").map_groups(entropy, batch_format="pandas")


def events_hourly(sf_dir: str):
    """Tumbling 1-hour window per event_type over the events stream table:
    (hour, event_type, n_events, sum_value)."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = _drop_null_ts(batch)
        h = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[h]").astype(np.int64)
        codes, uniq = _dict_codes(batch["event_type"])
        v = batch["value"].to_numpy(zero_copy_only=False)
        nu = max(1, len(uniq))
        ukey, inv = np.unique(h * nu + codes, return_inverse=True)
        ok = ~np.isnan(v)                  # SQL count/sum skip NULLs
        return pa.table({
            "h": pa.array(ukey // nu),
            "event_type": pa.array([uniq[c] for c in ukey % nu],
                                   type=pa.string()),
            "partial_n": pa.array(np.bincount(inv, minlength=len(ukey))
                                  .astype(np.int64)),
            "partial_s": pa.array(np.bincount(
                inv, weights=np.where(ok, v, 0.0), minlength=len(ukey))),
            "partial_nv": pa.array(np.bincount(
                inv, weights=ok, minlength=len(ukey)).astype(np.int64)),
        })

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["h", "event_type"])
        .aggregate(Sum("partial_n", alias_name="n_events"),
                   Sum("partial_s", alias_name="sum_value"),
                   Sum("partial_nv", alias_name="n_valid"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        h = batch["h"].to_numpy(zero_copy_only=False)
        hour = h.astype("datetime64[h]").astype("datetime64[us]")
        sv = round_half_away(batch["sum_value"].to_numpy(zero_copy_only=False), 6)
        # SQL sum() over only-NULL values is NULL, not 0 (pandas sum
        # skips NaN and yields 0.0) — null out groups with no valid value
        nv = batch["n_valid"].to_numpy(zero_copy_only=False)
        return pa.table({
            "hour": pa.array(hour),
            "event_type": batch["event_type"],
            "n_events": batch["n_events"],
            "sum_value": pa.array(sv, type=pa.float64(), mask=(nv == 0)),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


def events_sliding(sf_dir: str, window_s: int = 3600, slide_s: int = 1800):
    """Sliding-window count per event_type: each event lands in
    window_s/slide_s overlapping windows (vectorized fan-out inside the
    batch, partial counts, merged by window start)."""
    import ray.data
    from ray.data.aggregate import Sum

    # CEIL, not floor: when window_s is not a multiple of slide_s an
    # event can belong to one more window than window_s // slide_s
    # (review finding); the `t < start + window` mask trims the
    # over-generation, and the SQL mirror uses the same ceil
    n_windows = -(-window_s // slide_s)
    ds = read_table(sf_dir, "events", columns=["ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = _drop_null_ts(batch)
        ts_s = batch["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[s]").astype(np.int64)
        codes, uniq = _dict_codes(batch["event_type"])
        # window starts containing t: floor(t/slide)*slide - k*slide,
        # k = 0..n_windows-1, keeping only starts with t < start + window
        base = (ts_s // slide_s) * slide_s
        starts = base[:, None] - slide_s * np.arange(n_windows)[None, :]
        valid = ts_s[:, None] < starts + window_s
        w = starts[valid]
        c_rep = np.repeat(codes, n_windows).reshape(-1, n_windows)[valid]
        nu = max(1, len(uniq))
        ukey, inv = np.unique(w * nu + c_rep, return_inverse=True)
        return pa.table({
            "w": pa.array(ukey // nu),
            "event_type": pa.array([uniq[c] for c in ukey % nu],
                                   type=pa.string()),
            "partial_n": pa.array(np.bincount(inv, minlength=len(ukey))
                                  .astype(np.int64)),
        })

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["w", "event_type"])
        .aggregate(Sum("partial_n", alias_name="n_events"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        w = batch["w"].to_numpy(zero_copy_only=False)
        start = w.astype("datetime64[s]").astype("datetime64[us]")
        return pa.table({
            "window_start": pa.array(start),
            "event_type": batch["event_type"],
            "n_events": batch["n_events"],
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


def top_k_per_region(pages_ds, regions: dict, k: int = 3):
    """Per-region k nearest pages to the region's cap axis: the grouped
    top-k pattern (join + per-group head after in-group sort)."""
    import math

    import ray

    from ..kernel import sphere
    from .spatial_join import spatial_join_broadcast

    # radian center dicts built ONCE and shipped via ray.put (not rebuilt
    # per batch)
    centers_rad = {}
    for rid, region in regions.items():
        axis = region.get_cap_bound().axis
        lat, lng = sphere.xyz_to_latlng(*axis)
        centers_rad[rid] = (float(lat), float(lng))
    centers_ref = ray.put(centers_rad)

    joined = spatial_join_broadcast(pages_ds, regions,
                                    keep_cols=("page_id", "lat", "lng"))

    def with_dist(batch: pa.Table, centers_ref=centers_ref) -> pa.Table:
        from ..state.bcast import cached_get

        cs = cached_get(centers_ref)   # per-worker memoized fetch
        lat = sphere.degrees_to_radians(batch["lat"].to_numpy(zero_copy_only=False))
        lng = sphere.degrees_to_radians(batch["lng"].to_numpy(zero_copy_only=False))
        codes, uniq = _dict_codes(batch["region_id"])
        # one dict probe per DISTINCT region in the batch (KeyError loudly
        # on an unknown region_id, like per-row dict access would)
        qlat = np.array([cs[r][0] for r in uniq],
                        dtype=np.float64)[codes] if len(uniq) \
            else np.empty(0, dtype=np.float64)
        qlng = np.array([cs[r][1] for r in uniq],
                        dtype=np.float64)[codes] if len(uniq) \
            else np.empty(0, dtype=np.float64)
        d = sphere.haversine_distance_m(lat, lng, qlat, qlng)
        return batch.append_column("dist_m", pa.array(d, type=pa.float64()))

    def head_k(df: pd.DataFrame) -> pd.DataFrame:
        # sort on the UNROUNDED distance (ties broken by page_id) so the
        # ranking matches the SQL oracle's ORDER BY exactly; round after
        df = df.sort_values(["dist_m", "page_id"]).head(k).reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        df["dist_m"] = round_half_away(df["dist_m"].to_numpy(), 3)
        return df[["region_id", "page_id", "rank", "dist_m"]]

    return (
        joined.map_batches(with_dist, batch_format="pyarrow", batch_size=None)
        .groupby("region_id")
        .map_groups(head_k, batch_format="pandas")
    )


def zonal_stats(pages_ds, regions: dict):
    """Zonal statistics: per-region aggregates over the spatially joined
    points — (region_id, n_pages, avg_lat, avg_lng, min_dist_m,
    max_dist_m), distances to the region's cap axis.

    Exactness plan (so the whole thing is SQL-hash-exact despite floats):
    centroids come from INTEGER e4 sums (rint(lat*1e4) is the original
    fixed-point value, summed exactly in int64 — float summation order
    never enters), and the float reductions are min/max (order-free; the
    per-row haversine is bit-identical on both engines).  A float MEAN of
    distances would NOT be oracle-stable and is deliberately absent.

    Shape: broadcast join -> per-batch partial (one row per region per
    batch) -> Ray groupby Sum/Min/Max over #regions rows -> tiny finalize.
    """
    import ray
    import ray.data
    from ray.data.aggregate import Max, Min, Sum

    from ..kernel import sphere
    from .spatial_join import spatial_join_broadcast

    centers_rad = {}
    for rid, region in regions.items():
        axis = region.get_cap_bound().axis
        lat, lng = sphere.xyz_to_latlng(*axis)
        centers_rad[rid] = (float(lat), float(lng))
    centers_ref = ray.put(centers_rad)

    joined = spatial_join_broadcast(pages_ds, regions,
                                    keep_cols=("page_id", "lat", "lng"))

    def partial(batch: pa.Table, centers_ref=centers_ref) -> pa.Table:
        from ..state.bcast import cached_get

        cs = cached_get(centers_ref)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        codes, uniq = _dict_codes(batch["region_id"])
        if not len(uniq):
            return pa.table({
                "region_id": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "sum_lat_e4": pa.array([], type=pa.int64()),
                "sum_lng_e4": pa.array([], type=pa.int64()),
                "min_d": pa.array([], type=pa.float64()),
                "max_d": pa.array([], type=pa.float64()),
            })
        qlat = np.array([cs[r][0] for r in uniq], dtype=np.float64)[codes]
        qlng = np.array([cs[r][1] for r in uniq], dtype=np.float64)[codes]
        d = sphere.haversine_distance_m(
            sphere.degrees_to_radians(lat), sphere.degrees_to_radians(lng),
            qlat, qlng)
        lat_e4 = np.rint(lat * 1e4).astype(np.int64)
        lng_e4 = np.rint(lng * 1e4).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        c, dd = codes[order], d[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(c[1:] != c[:-1]) + 1])
        nuq = len(uniq)
        return pa.table({
            "region_id": pa.array(list(uniq), type=pa.string()),
            "n": pa.array(np.bincount(codes, minlength=nuq)
                          .astype(np.int64)),
            "sum_lat_e4": pa.array(np.bincount(
                codes, weights=lat_e4, minlength=nuq).astype(np.int64)),
            "sum_lng_e4": pa.array(np.bincount(
                codes, weights=lng_e4, minlength=nuq).astype(np.int64)),
            # c[starts] == arange(nuq): every dictionary code appears in
            # the batch, and the sort is ascending — reduceat output is
            # already in code order
            "min_d": pa.array(np.minimum.reduceat(dd, starts),
                              type=pa.float64()),
            "max_d": pa.array(np.maximum.reduceat(dd, starts),
                              type=pa.float64()),
        })

    agg = (joined.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
           .groupby("region_id")
           .aggregate(Sum("n", alias_name="n_pages"),
                      Sum("sum_lat_e4", alias_name="slat"),
                      Sum("sum_lng_e4", alias_name="slng"),
                      Min("min_d", alias_name="mind"),
                      Max("max_d", alias_name="maxd")))

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch["n_pages"].to_numpy(zero_copy_only=False).astype(np.float64)
        slat = batch["slat"].to_numpy(zero_copy_only=False).astype(np.float64)
        slng = batch["slng"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "region_id": batch["region_id"],
            "n_pages": batch["n_pages"],
            "avg_lat": pa.array(round_half_away(
                slat / (n * 1e4), 6), type=pa.float64()),
            "avg_lng": pa.array(round_half_away(
                slng / (n * 1e4), 6), type=pa.float64()),
            "min_dist_m": pa.array(round_half_away(
                batch["mind"].to_numpy(zero_copy_only=False), 3),
                type=pa.float64()),
            "max_dist_m": pa.array(round_half_away(
                batch["maxd"].to_numpy(zero_copy_only=False), 3),
                type=pa.float64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow",
                           batch_size=None)


def user_sessions(sf_dir: str, gap_s: int = 1800, n_parts: int = 64):
    """Sessionization: split each user's event stream at gaps > gap_s.

    Output: (user_id, session_start, n_events, duration_s).  Users are
    hash-co-partitioned (user_id % n_parts) so one map_groups call handles
    many users with a single vectorized pandas pass — never one Python call
    per user (Ray per-group overhead).
    """
    import ray.data

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def add_part(batch: pa.Table) -> pa.Table:
        # drop the parquet 'pandas' schema metadata: Ray's shuffle schema
        # dedup can't hash dict-valued metadata (log spam per reduce task)
        batch = _drop_null_ts(_drop_null_users(
            batch.replace_schema_metadata(None)))
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array((uid % n_parts).astype(np.int32)))

    def sessionize(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            # typed empty frame (Ray probes map_groups with empty blocks;
            # untyped empties emit mixed-schema RefBundle warnings)
            return pd.DataFrame({
                "user_id": pd.Series(dtype=np.int64),
                "session_start": pd.Series(dtype="datetime64[us]"),
                "n_events": pd.Series(dtype=np.int64),
                "duration_s": pd.Series(dtype=np.int64),
            })
        df = df.sort_values(["user_id", "ts"]).reset_index(drop=True)
        ts_s = df["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
        uid = df["user_id"].to_numpy()
        new_user = np.concatenate([[True], uid[1:] != uid[:-1]])
        gap = np.concatenate([[0], ts_s[1:] - ts_s[:-1]])
        is_new = new_user | (gap > gap_s)
        sess = np.cumsum(is_new)
        g = pd.DataFrame({"user_id": uid, "sess": sess, "ts_s": ts_s}).groupby(
            ["user_id", "sess"], sort=False).agg(
            start=("ts_s", "min"), end=("ts_s", "max"),
            n_events=("ts_s", "size")).reset_index()
        return pd.DataFrame({
            "user_id": g["user_id"].astype(np.int64),
            "session_start": g["start"].to_numpy().astype("datetime64[s]")
                              .astype("datetime64[us]"),
            "n_events": g["n_events"].astype(np.int64),
            "duration_s": (g["end"] - g["start"]).astype(np.int64),
        })

    return (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(sessionize, batch_format="pandas")
    )


def event_gaps(sf_dir: str, n_parts: int = 64):
    """Inter-event gap analytics (the distributed LAG window): per user,
    the deltas between consecutive events in timestamp order.

    Output: (user_id, n_events, n_gaps, sum_gap_us, min_gap_us,
    max_gap_us); single-event users report 0 gaps with NULL gap
    aggregates (SQL aggregate-over-empty semantics, like
    props_field_stats).  NULL-ts / NULL-user events are unattributable
    and ignored (the house time-keyed contract).  The gap multiset of a
    sorted timestamp list is invariant to tie order, so no secondary
    sort key is needed for these aggregates — the oracle's
    ``lag() OVER (ORDER BY t)`` agrees for any tie resolution.

    Same custom-operator shape as user_sessions: ONE hash co-partition
    by user_id, then a single vectorized pandas pass per partition —
    gaps never cross partitions because users don't.
    """
    import ray.data

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def add_part(batch: pa.Table) -> pa.Table:
        batch = _drop_null_ts(_drop_null_users(
            batch.replace_schema_metadata(None)))
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array((uid % n_parts).astype(np.int32)))

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "user_id": pd.Series(dtype=np.int64),
                "n_events": pd.Series(dtype=np.int64),
                "n_gaps": pd.Series(dtype=np.int64),
                "sum_gap_us": pd.Series(dtype="Int64"),
                "min_gap_us": pd.Series(dtype="Int64"),
                "max_gap_us": pd.Series(dtype="Int64"),
            })
        df = df.sort_values(["user_id", "ts"]).reset_index(drop=True)
        t = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        uid = df["user_id"].to_numpy()
        users, counts = np.unique(uid, return_counts=True)
        same = np.concatenate([[False], uid[1:] == uid[:-1]])
        d = np.concatenate([[0], t[1:] - t[:-1]])
        gu, gd = uid[same], d[same]
        gsum = np.zeros(len(users), dtype=np.int64)
        gmin = np.zeros(len(users), dtype=np.int64)
        gmax = np.zeros(len(users), dtype=np.int64)
        if len(gu):
            starts = np.concatenate(
                [[0], np.flatnonzero(gu[1:] != gu[:-1]) + 1])
            pos = np.searchsorted(users, gu[starts])
            gsum[pos] = np.add.reduceat(gd, starts)
            gmin[pos] = np.minimum.reduceat(gd, starts)
            gmax[pos] = np.maximum.reduceat(gd, starts)
        has = counts > 1
        return pd.DataFrame({
            "user_id": users.astype(np.int64),
            "n_events": counts.astype(np.int64),
            "n_gaps": (counts - 1).astype(np.int64),
            "sum_gap_us": pd.arrays.IntegerArray(gsum, mask=~has),
            "min_gap_us": pd.arrays.IntegerArray(gmin, mask=~has),
            "max_gap_us": pd.arrays.IntegerArray(gmax, mask=~has),
        })

    def finalize(batch: pa.Table) -> pa.Table:
        # route the nullable Int64 columns through arrow int64-with-nulls
        # so NULL gap aggregates surface exactly like the SQL oracle's
        # (props_field_stats precedent)
        return batch.select(["user_id", "n_events", "n_gaps",
                             "sum_gap_us", "min_gap_us", "max_gap_us"])

    return (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(gaps, batch_format="pandas")
        .map_batches(finalize, batch_format="pyarrow", batch_size=None)
    )


def events_weekday_hour(sf_dir: str):
    """Weekday x hour activity matrix: (dow, hour, n_events,
    n_purchases) — the standard traffic-shape heatmap.  dow/hour come
    from pure integer epoch math ((days + 4) % 7, Sunday = 0; epoch day
    0 is a Thursday), mirrored verbatim in the oracle so both engines
    share bucket semantics exactly; NULL-ts rows are unattributable and
    ignored.  One streaming bincount partial over packed dow*24+hour
    (168 cells) and a 168-row groupby."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "events", columns=["ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = _drop_null_ts(batch.replace_schema_metadata(None))
        t = batch["ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        et = pc.fill_null(batch["event_type"], "")
        is_p = pc.equal(et, "purchase").to_numpy(zero_copy_only=False) \
            .astype(bool)
        days = t // 86400000000
        dow = (days + 4) % 7
        hour = (t // 3600000000) % 24
        cell = (dow * 24 + hour).astype(np.int64)
        n = np.bincount(cell, minlength=168).astype(np.int64)
        npur = np.bincount(cell[is_p], minlength=168).astype(np.int64)
        has = n > 0
        ids = np.flatnonzero(has).astype(np.int64)
        return pa.table({
            "cell": pa.array(ids),
            "pn": pa.array(n[has]),
            "pp": pa.array(npur[has]),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None)
           .groupby("cell")
           .aggregate(Sum("pn", alias_name="n_events"),
                      Sum("pp", alias_name="n_purchases")))

    def finalize(batch: pa.Table) -> pa.Table:
        cell = batch["cell"].to_numpy(zero_copy_only=False)
        return pa.table({
            "dow": pa.array(cell // 24),
            "hour": pa.array(cell % 24),
            "n_events": batch["n_events"],
            "n_purchases": batch["n_purchases"],
        })

    return agg.map_batches(finalize, batch_format="pyarrow",
                           batch_size=None)


def group_sizes_hist(sf_dir: str, table: str = "documents",
                     dims=("lang", "source")):
    """Group-size histogram (the k-anonymity / skew audit): sizes of the
    (lang, source) groups, then how many groups have each size —
    (group_size, n_groups).  NULL dimension values form their own
    groups, like SQL GROUP BY.  Two aggregations, both bounded by group
    cardinality: per-batch pandas partials -> dims-sized Sum groupby ->
    per-batch size-count partials -> size-cardinality groupby."""
    import pandas as pd
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, table, columns=list(dims))

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(list(dims), sort=False, dropna=False) \
            .size().reset_index(name="pn")
        # collision-free group key: per-dim length-prefixed value with
        # an explicit null flag ("N" vs "V<len>:<value>") — no real
        # value can alias NULL or re-align across the dim separator
        # (review finding: the old "\x00" sentinel could)
        key = None
        for d in dims:
            isnull = g[d].isna()
            s = g[d].where(~isnull, "").astype(str)
            part = ("V" + s.str.len().astype(str) + ":" + s) \
                .where(~isnull, "N")
            key = part if key is None else key + "|" + part
        return pa.table({
            "gk": pa.array(key.tolist(), type=pa.string()),
            "pn": pa.array(g["pn"].to_numpy().astype(np.int64)),
        })

    sizes = (ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=None)
             .groupby("gk")
             .aggregate(Sum("pn", alias_name="sz")))

    def size_partial(batch: pa.Table) -> pa.Table:
        sz = batch["sz"].to_numpy(zero_copy_only=False)
        u, c = np.unique(sz, return_counts=True)
        return pa.table({
            "group_size": pa.array(u.astype(np.int64)),
            "pg": pa.array(c.astype(np.int64)),
        })

    return (sizes.map_batches(size_partial, batch_format="pyarrow",
                              batch_size=None)
            .groupby("group_size")
            .aggregate(Sum("pg", alias_name="n_groups")))


_WEEK_US = 7 * 86400 * 10**6


def cohort_retention(sf_dir: str, event_type: str = "purchase",
                     n_parts: int = 64):
    """Cohort retention matrix: users grouped by the ISO week of their
    FIRST ``event_type`` event, activity counted as distinct active
    users per (cohort_week, week) — the standard product-analytics
    retention triangle.  Weeks are Monday-aligned epoch-week indexes
    ((epoch_days + 3) // 7, day 0 = Thursday); NULL-ts / NULL-user rows
    are unattributable and ignored (house contract).

    Shape: one user-hash co-partition (a user's full history decides
    its cohort, so it must be seen whole), per-partition distinct
    (user, week) + min-week cohort computed vectorized, then a
    matrix-cell-sized Sum groupby over packed (cohort, week) keys —
    the second shuffle moves at most #cohorts x #weeks rows per
    partition, never user rows.
    """
    import ray.data
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.replace_schema_metadata(None)
        batch = batch.filter(pc.equal(pc.fill_null(
            batch["event_type"], ""), event_type))
        batch = _drop_null_ts(_drop_null_users(batch))
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        t = batch["ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        w = (t // 86400000000 + 3) // 7
        if len(w) and (int(w.min()) < 0 or int(w.max()) >= 1 << 20):
            # packed (cohort << 20 | week) keys require week in [0, 2^20)
            raise ValueError("cohort_retention: event week index out of "
                             "packable range (pre-1970 or >= year ~21970)")
        return pa.table({
            "user_id": pa.array(uid.astype(np.int64)),
            "w": pa.array(w.astype(np.int64)),
            "part": pa.array((uid % n_parts).astype(np.int32)),
        })

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"ck": pd.Series(dtype=np.int64),
                                 "pn": pd.Series(dtype=np.int64)})
        uid = df["user_id"].to_numpy()
        w = df["w"].to_numpy()
        # distinct (user, week) then per-user min week, all via one lexsort
        order = np.lexsort((w, uid))
        uid, w = uid[order], w[order]
        keep = np.concatenate([[True], (uid[1:] != uid[:-1])
                               | (w[1:] != w[:-1])])
        uid, w = uid[keep], w[keep]
        first = np.concatenate([[True], uid[1:] != uid[:-1]])
        # sorted by (uid, w): the first row of each user is its min week
        cohort = np.repeat(w[first], np.diff(np.concatenate(
            [np.flatnonzero(first), [len(uid)]])))
        ck = cohort * np.int64(1 << 20) + w
        u, cnt = np.unique(ck, return_counts=True)
        return pd.DataFrame({"ck": u, "pn": cnt.astype(np.int64)})

    agg = (ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
           .groupby("part")
           .map_groups(cells, batch_format="pandas")
           .groupby("ck")
           .aggregate(Sum("pn", alias_name="n_users")))

    def finalize(batch: pa.Table) -> pa.Table:
        ck = batch["ck"].to_numpy(zero_copy_only=False)
        return pa.table({
            "cohort_week": pa.array(ck >> 20),
            "week": pa.array(ck & ((1 << 20) - 1)),
            "n_users": batch["n_users"],
        })

    return agg.map_batches(finalize, batch_format="pyarrow",
                           batch_size=None)


def events_asof(sf_dir: str, left_type: str = "purchase",
                right_type: str = "click", n_parts: int = 64):
    """As-of join: each ``left_type`` event matched to the most recent
    ``right_type`` event of the SAME user at or before its timestamp
    (inner: unmatched lefts dropped).

    Partitioning assumption (custom-operator contract): rows are hash-co-
    partitioned by user_id, so every user's full history lands in one
    map_groups call; within a partition the join is pandas merge_asof
    (sorted backward search, C speed).  Output: (event_id, user_id, ts,
    match_event_id, match_ts, gap_us).
    """
    import ray.data

    # read_table strips the unhashable pandas schema metadata at the
    # READ layer (raw read_parquet spams schema-dedup warnings per task)
    ds = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "user_id", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = _drop_null_ts(_drop_null_users(
            batch.replace_schema_metadata(None)))
        keep = pc.is_in(batch["event_type"],
                        value_set=pa.array([left_type, right_type]))
        batch = batch.filter(keep)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array((uid % n_parts).astype(np.int32)))

    def asof(df: pd.DataFrame) -> pd.DataFrame:
        out_cols = {
            "event_id": np.int64, "user_id": np.int64,
            "ts": "datetime64[us]", "match_event_id": np.int64,
            "match_ts": "datetime64[us]", "gap_us": np.int64,
        }
        left = df[df.event_type == left_type].sort_values("ts")
        right = df[df.event_type == right_type].sort_values("ts")
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({c: pd.Series(dtype=t)
                                 for c, t in out_cols.items()})
        right = right.rename(columns={"event_id": "match_event_id"})
        # deterministic tie-break: right rows sharing (user, ts) are
        # equivalent "most recent prior" matches — keep max event_id
        # (mirrored by GROUP BY user_id, ts + max(event_id) in the SQL
        # oracle; bare ASOF JOIN picks an arbitrary tied row)
        right = (right.sort_values(["user_id", "ts", "match_event_id"])
                 .groupby(["user_id", "ts"], sort=False, as_index=False)
                 .tail(1)
                 .sort_values("ts", kind="stable"))   # merge_asof contract
        right["match_ts"] = right["ts"]
        m = pd.merge_asof(
            left[["event_id", "user_id", "ts"]],
            right[["match_event_id", "match_ts", "ts", "user_id"]],
            on="ts", by="user_id", direction="backward")
        m = m.dropna(subset=["match_event_id"])
        ts_us = m["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        mt_us = m["match_ts"].to_numpy().astype(
            "datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "event_id": m["event_id"].astype(np.int64).to_numpy(),
            "user_id": m["user_id"].astype(np.int64).to_numpy(),
            "ts": m["ts"].to_numpy().astype("datetime64[us]"),
            "match_event_id": m["match_event_id"].astype(np.int64).to_numpy(),
            "match_ts": m["match_ts"].to_numpy().astype("datetime64[us]"),
            "gap_us": ts_us - mt_us,
        })

    return (
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(asof, batch_format="pandas")
    )


def embedding_centroids(sf_dir: str, ndigits: int = 4):
    """Per-label per-dimension centroid of the embedding column:
    (label, dim, centroid)."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "embeddings", columns=["label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        from ..functions.vecs import embedding_matrix

        labels = batch["label"].to_numpy(zero_copy_only=False)
        mat = embedding_matrix(batch["embedding"])
        u = np.unique(labels)
        rows_l, rows_d, rows_s, rows_n = [], [], [], []
        for lab in u:
            sel = labels == lab
            s = mat[sel].sum(axis=0)
            n = int(sel.sum())
            dims = np.arange(1, mat.shape[1] + 1, dtype=np.int64)
            rows_l.append(np.full(mat.shape[1], lab, dtype=np.int64))
            rows_d.append(dims)
            rows_s.append(s)
            rows_n.append(np.full(mat.shape[1], n, dtype=np.int64))
        return pa.table({
            "label": pa.array(np.concatenate(rows_l)),
            "dim": pa.array(np.concatenate(rows_d)),
            "partial_s": pa.array(np.concatenate(rows_s)),
            "partial_n": pa.array(np.concatenate(rows_n)),
        })

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["label", "dim"])
        .aggregate(Sum("partial_s", alias_name="s"),
                   Sum("partial_n", alias_name="n"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        c = round_half_away(batch["s"].to_numpy(zero_copy_only=False)
                     / batch["n"].to_numpy(zero_copy_only=False), ndigits)
        return pa.table({
            "label": batch["label"],
            "dim": batch["dim"],
            "centroid": pa.array(c, type=pa.float64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


def funnel_conversions(sf_dir: str, a: str = "view", b: str = "purchase",
                       within_s: int = 3600, n_parts: int = 64):
    """Sequence/funnel analytics (CEP-lite): per user, how many ``a``
    events are followed by at least one ``b`` event STRICTLY after them
    and within ``within_s`` seconds — (user_id, n_a, n_converted) for
    every user with >= 1 ``a`` event.

    Same co-partition shape as sessionization: users hash-bucketed so one
    map_groups call handles many users, then ONE vectorized searchsorted
    over a (dense-user-code, time-offset) composite key answers the
    "exists b in (t_a, t_a + T]" probe for every a-event in the partition
    at once — no per-user Python loop.  Shuffle moves only (user_id, ts,
    is_a/is_b) int rows.
    """
    import ray.data

    T = int(within_s) * 1_000_000          # event ts is timestamp[us]
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def add_part(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        batch = _drop_null_ts(_drop_null_users(
            batch.replace_schema_metadata(None)))
        keep = pc.fill_null(
            pc.is_in(batch["event_type"], value_set=pa.array([a, b])), False)
        batch = batch.filter(keep)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        is_a = pc.equal(batch["event_type"], a)
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": pa.array(batch["ts"].to_numpy(zero_copy_only=False)
                              .astype("datetime64[us]").astype(np.int64)),
            "is_a": is_a,
            "part": pa.array((uid % n_parts).astype(np.int32)),
        })

    def funnel(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "user_id": pd.Series(dtype=np.int64),
                "n_a": pd.Series(dtype=np.int64),
                "n_converted": pd.Series(dtype=np.int64),
            })
        uid = df["user_id"].to_numpy().astype(np.int64)
        ts = df["ts_us"].to_numpy().astype(np.int64)
        is_a = df["is_a"].to_numpy().astype(bool)
        codes, inv = np.unique(uid, return_inverse=True)
        t0 = ts.min()
        off = ts - t0
        # span = off.max() + T + 2 guarantees ta + T <= span - 2, so keys
        # of different users never interleave
        span = int(off.max()) + T + 2
        # user-code * span must stay inside int64; process users in code
        # chunks when a partition's (users x time-span) product would
        # overflow (each chunk re-bases codes at 0)
        users_per_chunk = max(1, ((1 << 62) - 1) // span)
        conv = np.zeros(int(is_a.sum()), dtype=bool)
        ua_all, ta_all = inv[is_a], off[is_a]
        ub_all, tb_all = inv[~is_a], off[~is_a]
        for c0 in range(0, len(codes), users_per_chunk):
            c1 = c0 + users_per_chunk
            am = (ua_all >= c0) & (ua_all < c1)
            bm = (ub_all >= c0) & (ub_all < c1)
            if not am.any() or not bm.any():
                continue
            bkey = np.sort((ub_all[bm] - c0) * span + tb_all[bm])
            base = (ua_all[am] - c0) * span + ta_all[am]
            lo = np.searchsorted(bkey, base + 1)
            hi = np.searchsorted(bkey, base + T, side="right")
            conv[am] = hi > lo
        ua = ua_all
        n_a = np.bincount(ua, minlength=len(codes)).astype(np.int64)
        n_c = np.bincount(ua[conv], minlength=len(codes)).astype(np.int64)
        sel = n_a > 0
        return pd.DataFrame({
            "user_id": codes[sel],
            "n_a": n_a[sel],
            "n_converted": n_c[sel],
        })

    return (ds.map_batches(add_part, batch_format="pyarrow",
                           batch_size=None)
            .groupby("part")
            .map_groups(funnel, batch_format="pandas")
            .select_columns(["user_id", "n_a", "n_converted"]))


def running_token_totals(sf_dir: str, budget: int = 2000,
                         range_size: int = 64,
                         id_col: str = "doc_id", text_col: str = "text"):
    """Distributed window scan: the exact running token total over the
    corpus in doc-id order, and the cross-document context-window packing
    it enables — (doc_id, n_tokens, cum_tokens, example_id) with
    cum_tokens = inclusive prefix sum of whitespace-token counts ordered
    by doc_id and example_id = (cum_tokens - n_tokens) // budget (the
    fixed-token-budget training example each document STARTS in).  The
    SUM() OVER (ORDER BY ...) analytic, built shuffle-native.

    Scale design — a two-level scan with NO ordering assumption on block
    boundaries: pass 1 pre-aggregates token counts per fixed doc-id range
    (range_id = doc_id // range_size) inside map_batches, so the driver
    sees one row per range (set range_size so N/range_size stays driver-
    small; the exclusive scan over range sums is O(ranges)).  The range
    offsets broadcast once; pass 2 co-locates each range with ONE
    groupby(range_id).map_groups — the shuffle moves only (doc_id,
    n_tokens, range_id) int rows, never text — and finishes with a local
    sort + cumsum + offset.  Exact for any batch layout.
    """
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    import pyarrow.compute as pc

    from ..state.bcast import cached_get

    G = int(range_size)
    ds = read_table(sf_dir, "documents", columns=[id_col, text_col])

    def counts(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = pc.count_substring_regex(pc.fill_null(batch[text_col], ""),
                                     r"\S+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            id_col: pa.array(ids),
            "n_tokens": pa.array(n),
            "range_id": pa.array(ids // G),
        })

    # materialize the COMPACT rows (24 B/doc — not the text) so the
    # expensive full-text token-count scan runs exactly once; both the
    # range-partial pass and the final co-partition read this
    compact = ds.map_batches(counts, batch_format="pyarrow",
                             batch_size=None).materialize()

    def range_partial(batch: pa.Table) -> pa.Table:
        r = batch["range_id"].to_numpy(zero_copy_only=False)
        n = batch["n_tokens"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(r, return_inverse=True)
        s = np.bincount(inv, weights=n.astype(np.float64)).astype(np.int64)
        return pa.table({"range_id": pa.array(u), "partial_s": pa.array(s)})

    rng_pd = (compact.map_batches(range_partial, batch_format="pyarrow",
                                  batch_size=None)
              .groupby("range_id")
              .aggregate(Sum("partial_s", alias_name="s"))).to_pandas()
    rng_pd = rng_pd.sort_values("range_id").reset_index(drop=True)
    starts = rng_pd["range_id"].to_numpy().astype(np.int64)
    sums = rng_pd["s"].to_numpy().astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]])  # exclusive
    off_ref = ray.put((starts, offsets))

    def scan_range(df: pd.DataFrame, off_ref=off_ref) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                id_col: pd.Series(dtype=np.int64),
                "n_tokens": pd.Series(dtype=np.int64),
                "cum_tokens": pd.Series(dtype=np.int64),
                "example_id": pd.Series(dtype=np.int64),
            })
        st, off = cached_get(off_ref)
        df = df.sort_values(id_col)
        n = df["n_tokens"].to_numpy().astype(np.int64)
        base = off[np.searchsorted(st, int(df["range_id"].iloc[0]))]
        cum = base + np.cumsum(n)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_tokens": n,
            "cum_tokens": cum,
            "example_id": (cum - n) // np.int64(budget),
        })

    return (compact.groupby("range_id")
            .map_groups(scan_range, batch_format="pandas"))


def _dict_codes(col, gidx=None):
    """Dictionary-encode a (chunked) string column into int64 codes plus
    the per-batch dictionary — replaces per-row Python object conversion
    (``to_pandas`` object arrays) in the hottest group-by partials with an
    Arrow kernel.  Null keys get their own trailing code (SQL GROUP BY
    keeps a NULL group).  With ``gidx`` (global name->int map) the local
    codes are remapped into the global space with ONE dict lookup per
    DISTINCT key in the batch instead of one per row."""
    import pyarrow.compute as pc
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = col.dictionary_encode()
    idx = d.indices
    uniq = d.dictionary.to_pylist()
    if idx.null_count:
        idx = pc.fill_null(idx, len(uniq))
        uniq = uniq + [None]
    codes = idx.to_numpy(zero_copy_only=False).astype(np.int64)
    if gidx is not None:
        lut = np.fromiter((gidx[u] for u in uniq), count=len(uniq),
                          dtype=np.int64)
        return lut[codes], uniq
    return codes, uniq


def _group_runs(sorted_keys: np.ndarray):
    """(starts, ends) of equal-key runs in an already-sorted array."""
    n = len(sorted_keys)
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    starts = np.concatenate(
        [[0], np.flatnonzero(sorted_keys[1:] != sorted_keys[:-1]) + 1])
    ends = np.concatenate([starts[1:], [n]])
    return starts, ends


def _grouped_blob_partial(batch: pa.Table, group_col: str, id_col: str,
                          reducer, blob_col: str) -> pa.Table:
    """Per-batch (group, blob) partial: sort the batch by group, then emit
    ``reducer(ids_of_group)`` bytes per group run — the compact-partial
    scaffolding shared by the exact and HLL distinct-count operators.
    Typed output even for empty batches (mixed-schema RefBundles trip
    Ray's schema unification)."""
    import pyarrow.compute as pc
    gtype = batch[group_col].type
    g, uniq = _dict_codes(batch[group_col])
    # null ids are excluded from the VALUE set (SQL count(DISTINCT) skips
    # NULLs) but their GROUP still emits a partial — a group whose ids are
    # all null must count 0, not vanish from the output
    valid = pc.is_valid(batch[id_col]).to_numpy(zero_copy_only=False) \
        .astype(bool)
    # fill in Arrow BEFORE to_numpy: a null int64 column converts via
    # float64 and would corrupt ids above 2^53
    v = pc.fill_null(batch[id_col], 0).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    if len(g) == 0:
        return pa.table({group_col: pa.array([], type=gtype),
                         blob_col: pa.array([], type=pa.binary())})
    order = np.argsort(g, kind="stable")
    g, v, valid = g[order], v[order], valid[order]
    starts, ends = _group_runs(g)
    return pa.table({
        group_col: pa.array([uniq[c] for c in g[starts]], type=gtype),
        blob_col: pa.array([reducer(v[s:e][valid[s:e]])
                            for s, e in zip(starts, ends)],
                           type=pa.binary()),
    })


def group_quantiles(sf_dir: str, qs=(0.5, 0.9, 0.99),
                    group_col: str = "event_type", value_col: str = "value",
                    n_bins: int = 4096, make_ds=None):
    """EXACT per-group quantiles of a float column with bounded memory:
    (group, q, value), quantile_disc semantics (the element at 0-based rank
    max(0, ceil(q*n) - 1) of the sorted group).

    Three streaming passes, none of which materializes a group's values:
      A. per-group (min, max, count) — compact partials, tiny merge;
      B. per-group fixed-width histogram over [min, max] — per-batch
         bincount blobs tree-merged; locates the bucket holding each
         target rank (a 32 KB blob per group per batch, independent of
         group size);
      C. fetch ONLY the values inside target buckets (~n/n_bins of the
         data), sort those, pick the in-bucket offset.
    At 100 TB a group never needs to fit anywhere; pass C's pull is
    1/4096th of the column, and could recurse if even that were too big.
    """
    import ray

    # make_ds: optional factory recreating the (group, value) Dataset for
    # each pass — lets any deterministic pipeline (not just the events
    # table) feed the quantile machinery
    def read():
        base = make_ds() if make_ds is not None \
            else read_table(sf_dir, "events",
                            columns=[group_col, value_col])

        def drop_null_values(batch: pa.Table) -> pa.Table:
            # quantile_disc ignores NULLs; groups with ONLY null values
            # are omitted (the oracle filters value IS NOT NULL to match)
            if batch[value_col].null_count:
                import pyarrow.compute as pc

                batch = batch.filter(pc.is_valid(batch[value_col]))
            return batch

        return base.map_batches(drop_null_values, batch_format="pyarrow",
                                batch_size=None)

    qs = list(qs)

    # String group columns ride the pass-A shuffle FLAG-PREFIXED
    # ("N" for a NULL key, "V" + value otherwise): Ray's sort-based
    # groupby cannot compare None against str, and NULL group keys form
    # their own group by contract (review finding; regression:
    # test_group_quantiles_null_group_key).
    _sch = read().schema()            # Ray Schema: .names / .types
    gtype0 = dict(zip(_sch.names, _sch.types))[group_col]
    flag_keys = (pa.types.is_string(gtype0)
                 or pa.types.is_large_string(gtype0))

    def _flag(u):
        return "N" if u is None else "V" + str(u)

    def _unflag(k):
        return None if k == "N" else k[1:]

    # -- pass A: per-group stats -------------------------------------------
    def stats(batch: pa.Table) -> pa.Table:
        gtype = pa.string() if flag_keys else batch[group_col].type
        g, uniq = _dict_codes(batch[group_col])
        if flag_keys:
            uniq = [_flag(u) for u in uniq]
        v = batch[value_col].to_numpy(zero_copy_only=False)
        if len(g) == 0:
            return pa.table({
                "g": pa.array([], type=gtype),
                "mn": pa.array([], type=pa.float64()),
                "mx": pa.array([], type=pa.float64()),
                "n": pa.array([], type=pa.int64()),
            })
        order = np.argsort(g, kind="stable")
        g, v = g[order], v[order]
        starts, ends = _group_runs(g)
        return pa.table({
            "g": pa.array([uniq[c] for c in g[starts]], type=gtype),
            "mn": pa.array([float(np.min(v[s:e])) for s, e in zip(starts, ends)]),
            "mx": pa.array([float(np.max(v[s:e])) for s, e in zip(starts, ends)]),
            "n": pa.array([int(e - s) for s, e in zip(starts, ends)],
                          type=pa.int64()),
        })

    from ray.data.aggregate import Max, Min, Sum

    # distributed pre-merge: the driver sees one row per GROUP, not one per
    # (batch x group) — matters when the scan has millions of batches
    st = (read().map_batches(stats, batch_format="pyarrow", batch_size=None)
          .groupby("g")
          .aggregate(Min("mn", alias_name="mn"), Max("mx", alias_name="mx"),
                     Sum("n", alias_name="n"))
          .to_pandas().set_index("g"))
    # None-safe group order: NULL group keys form their own group
    # (the _dict_codes contract) and must not break the sort
    keys = sorted(st.index,
                  key=lambda g: (g is None,
                                 "" if g is None else str(g)))
    # gidx maps ORIGINAL group values (None included) — passes B/C
    # look original _dict_codes uniques up in it
    groups = [_unflag(k) for k in keys] if flag_keys else list(keys)
    gidx = {g: i for i, g in enumerate(groups)}
    mn = st["mn"].reindex(keys).to_numpy()
    mx = st["mx"].reindex(keys).to_numpy()
    cnt = st["n"].reindex(keys).to_numpy()
    # degenerate ranges still need a nonzero width for searchsorted edges
    width = np.where(mx > mn, mx - mn, 1.0)
    ginfo_ref = ray.put((gidx, mn, width, n_bins))

    # Bucketing rule shared by passes B and C (bitwise-identical op order
    # is what makes the exact selection correct): linear bin in [mn, mx],
    # floor, clipped to [0, n_bins-1].

    # -- pass B: per-group histograms --------------------------------------
    def hist(batch: pa.Table) -> pa.Table:
        gi, mn_, width_, nb = _cached_ginfo(ginfo_ref)
        v = batch[value_col].to_numpy(zero_copy_only=False)
        codes, _ = _dict_codes(batch[group_col], gidx=gi)
        lo = mn_[codes]
        w = width_[codes]
        b = np.clip(((v - lo) * (nb / w)).astype(np.int64), 0, nb - 1)
        flat = codes * nb + b
        h = np.bincount(flat, minlength=len(gi) * nb).astype(np.int64)
        return pa.table({"h": pa.array([h.tobytes()], type=pa.binary())})

    def merge_hist(batch: pa.Table) -> pa.Table:
        blobs = batch["h"].to_pylist()
        tot = np.zeros(len(gidx) * n_bins, dtype=np.int64)
        for b in blobs:
            tot += np.frombuffer(b, dtype=np.int64)
        return pa.table({"h": pa.array([tot.tobytes()], type=pa.binary())})

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    hd = (read().map_batches(hist, batch_format="pyarrow", batch_size=None)
          .repartition(max(1, ncpu))
          .map_batches(merge_hist, batch_format="pyarrow", batch_size=None)
          .repartition(1)
          .map_batches(merge_hist, batch_format="pyarrow", batch_size=None)
          .take_all())
    hist_all = np.frombuffer(hd[0]["h"], dtype=np.int64).reshape(
        len(gidx), n_bins)

    # locate (group, q) -> (bucket, offset inside bucket)
    targets = {}  # (g_code, bucket) -> [(q, offset)]
    for g, gi_ in gidx.items():
        cum = np.concatenate([[0], np.cumsum(hist_all[gi_])])
        for q in qs:
            r = max(0, int(np.ceil(q * cnt[gi_])) - 1)
            b = int(np.searchsorted(cum, r, side="right") - 1)
            targets.setdefault((gi_, b), []).append((q, r - int(cum[b])))
    targets_ref = ray.put(targets)

    # -- pass C: candidate values only -------------------------------------
    def select(batch: pa.Table) -> pa.Table:
        gi, mn_, width_, nb = _cached_ginfo(ginfo_ref)
        tg = _cached_ginfo(targets_ref)
        v = batch[value_col].to_numpy(zero_copy_only=False)
        codes, _ = _dict_codes(batch[group_col], gidx=gi)
        lo = mn_[codes]
        w = width_[codes]
        b = np.clip(((v - lo) * (nb / w)).astype(np.int64), 0, nb - 1)
        keep = np.zeros(len(v), dtype=bool)
        for (gc, bk) in tg:
            keep |= (codes == gc) & (b == bk)
        return pa.table({
            "gc": pa.array(codes[keep], type=pa.int64()),
            "bk": pa.array(b[keep], type=pa.int64()),
            "v": pa.array(v[keep], type=pa.float64()),
        })

    cand = (read().map_batches(select, batch_format="pyarrow",
                               batch_size=None).to_pandas())
    rows = []
    inv = {v_: k_ for k_, v_ in gidx.items()}
    for (gc, bk), wants in sorted(targets.items()):
        vals = np.sort(cand.loc[(cand["gc"] == gc) & (cand["bk"] == bk),
                                "v"].to_numpy())
        for q, off in wants:
            rows.append((inv[gc], float(q), float(vals[off])))
    rows.sort(key=lambda r: ((r[0] is None,
                              r[0] if r[0] is not None else ""),
                             r[1], r[2]))
    return pd.DataFrame(rows, columns=[group_col, "q", value_col])


def group_quantiles_sketch(sf_dir: str, qs=(0.5, 0.9, 0.99),
                           group_col: str = "event_type",
                           value_col: str = "value",
                           summary_size: int = 1024, make_ds=None):
    """APPROXIMATE per-group quantiles in ONE streaming pass — the scale
    path next to the exact 3-pass :func:`group_quantiles` when a bounded
    rank error is acceptable (monitoring, sizing, skew detection).

    Per (batch, group) the values are reduced to an equi-depth summary:
    all values if the run has <= summary_size rows, else the
    ``summary_size`` mid-rank order statistics each carrying weight
    n_run/summary_size.  Summaries are weight-concatenated per group and
    the final answer is the weighted quantile_disc pick.  Rank error:
    each summarized run contributes at most n_run/S misplaced ranks, so
    the total is <= n_group/S — a guaranteed <= 1/S RELATIVE rank error
    (0.1 % at the default S=1024), independent of distribution or skew.

    Shuffle volume: one (group, <=8 KiB blob) row per group per batch —
    like the exact path's histogram pass but with no stats pre-pass and
    no candidate re-read: exactly one scan of the input at 100 TB.
    """
    import pandas as pd

    S = int(summary_size)
    qs = list(qs)

    def read():
        base = make_ds() if make_ds is not None \
            else read_table(sf_dir, "events",
                            columns=[group_col, value_col])

        def drop_null_values(batch: pa.Table) -> pa.Table:
            if batch[value_col].null_count:
                import pyarrow.compute as pc

                batch = batch.filter(pc.is_valid(batch[value_col]))
            return batch

        return base.map_batches(drop_null_values, batch_format="pyarrow",
                                batch_size=None)

    def summarize(batch: pa.Table) -> pa.Table:
        gtype = batch[group_col].type
        if len(batch) == 0:
            return pa.table({"g": pa.array([], type=gtype),
                             "vals": pa.array([], type=pa.binary()),
                             "wts": pa.array([], type=pa.binary()),
                             "n": pa.array([], type=pa.int64())})
        g, uniq = _dict_codes(batch[group_col])
        v = batch[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        order = np.lexsort((v, g))
        g, v = g[order], v[order]
        starts, ends = _group_runs(g)
        vals, wts, ns = [], [], []
        for s, e in zip(starts, ends):
            n = e - s
            if n <= S:
                vals.append(v[s:e].tobytes())
                wts.append(np.ones(n).tobytes())
            else:
                ranks = ((np.arange(S) + 0.5) * n / S).astype(np.int64)
                vals.append(v[s + ranks].tobytes())
                wts.append(np.full(S, n / S).tobytes())
            ns.append(int(n))
        return pa.table({
            "g": pa.array([uniq[c] for c in g[starts]], type=gtype),
            "vals": pa.array(vals, type=pa.binary()),
            "wts": pa.array(wts, type=pa.binary()),
            "n": pa.array(ns, type=pa.int64()),
        })

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({group_col: pd.Series(dtype=object),
                              "q": pd.Series(dtype=np.float64),
                              value_col: pd.Series(dtype=np.float64)})
        if len(df) == 0:
            return empty
        v = np.concatenate([np.frombuffer(b) for b in df["vals"]])
        w = np.concatenate([np.frombuffer(b) for b in df["wts"]])
        n = int(df["n"].sum())
        order = np.argsort(v, kind="stable")
        v, cum = v[order], np.cumsum(w[order])
        rows = []
        for q in qs:
            # quantile_disc 1-based target rank, float-weight tolerant
            r = max(1, int(np.ceil(q * n)))
            i = int(np.searchsorted(cum, r - 1e-6, side="left"))
            rows.append((df["g"].iloc[0], float(q),
                         float(v[min(i, len(v) - 1)])))
        return pd.DataFrame(rows, columns=[group_col, "q", value_col])

    return (read()
            .map_batches(summarize, batch_format="pyarrow", batch_size=None)
            .groupby("g")
            .map_groups(merge, batch_format="pandas"))


from ..state.bcast import cached_get as _cached_ginfo  # shared worker cache


def interval_join(sf_dir: str, windows):
    """Events x interval-table join (broadcast small side): one output row
    per (event, containing window), windows may overlap.
    ``windows`` = [(window_id, start_epoch_s, end_epoch_s)), ...); membership
    is start <= ts < end at microsecond precision.

    The window table is a broadcast constant (dozens-to-thousands of rows);
    each batch computes the full membership matrix in one vectorized
    comparison.  For window tables too big to broadcast, decompose into a
    sorted elementary-boundary index first — not needed at this scale.
    """
    import ray

    wid = [w[0] for w in windows]
    ws = np.array([int(w[1]) * 1_000_000 for w in windows], dtype=np.int64)
    we = np.array([int(w[2]) * 1_000_000 for w in windows], dtype=np.int64)

    ds = read_table(sf_dir, "events", columns=["event_id", "ts"])

    def probe(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        hit_e, hit_w = np.nonzero(
            (ts[:, None] >= ws[None, :]) & (ts[:, None] < we[None, :]))
        return pa.table({
            "event_id": pa.array(eid[hit_e], type=pa.int64()),
            "window_id": pa.array([wid[j] for j in hit_w], type=pa.string()),
        })

    return ds.map_batches(probe, batch_format="pyarrow", batch_size=None)


def distinct_users(sf_dir: str, group_col: str = "event_type",
                   id_col: str = "user_id"):
    """EXACT distinct-count per group: (group, n_distinct).

    The shuffle moves per-batch SORTED UNIQUE id blobs (one row per group
    per batch), never raw rows — the same compact-partial pattern as the
    flagship tile counts.  Merge is a sorted-array union inside map_groups.
    At much higher cardinality swap the blob for a fixed-width bitmap or
    sketch; at events-table cardinality the exact blob is smaller than the
    rows by ~the duplication factor.
    """
    import ray

    ds = read_table(sf_dir, "events", columns=[group_col, id_col])

    def partial(batch: pa.Table) -> pa.Table:
        return _grouped_blob_partial(batch, group_col, id_col,
                                     lambda ids: np.unique(ids).tobytes(),
                                     "ids")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                group_col: pd.Series(dtype=object),
                "n_distinct": pd.Series(dtype=np.int64),
            })
        ids = np.unique(np.concatenate(
            [np.frombuffer(b, dtype=np.int64) for b in df["ids"]]))
        return pd.DataFrame({group_col: [df[group_col].iloc[0]],
                             "n_distinct": [np.int64(len(ids))]})

    return (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby(group_col)
            .map_groups(merge, batch_format="pandas"))


_HLL_P = 12                    # 4096 registers -> ~1.6 % standard error
_HLL_M = 1 << _HLL_P


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Full splitmix64 finalizer — every output bit depends on every input
    bit (the multiplicative mix alone leaves low-bit structure, which HLL
    rank counting would see)."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for nonzero uint64 (6 shift passes —
    float log2 is off-by-one near powers of two above 2^53)."""
    lz = np.zeros(len(x), dtype=np.int64)
    y = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = y < (np.uint64(1) << np.uint64(64 - s))
        lz[m] += s
        y[m] <<= np.uint64(s)
    return lz


def _hll_registers(v: np.ndarray) -> np.ndarray:
    """(m,) uint8 HLL register maxima of an int64 id array."""
    h = _splitmix64(v)
    reg = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
    # rank over the remaining 64-P bits; sentinel low bits bound it
    rest = (h << np.uint64(_HLL_P)) | np.uint64((1 << _HLL_P) - 1)
    rank = (_clz64(rest) + 1).astype(np.uint8)
    regs = np.zeros(_HLL_M, dtype=np.uint8)
    np.maximum.at(regs, reg, rank)
    return regs


def _hll_estimate(regs: np.ndarray) -> int:
    """Standard HLL estimator with the linear-counting small-range
    correction (64-bit hash: no large-range correction needed)."""
    m = float(_HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.sum(np.ldexp(1.0, -regs.astype(np.int64)))
    if e <= 2.5 * m:
        v = int(np.count_nonzero(regs == 0))
        if v:
            e = m * np.log(m / v)
    return int(round(e))


def distinct_users_hll(sf_dir: str, group_col: str = "event_type",
                       id_col: str = "user_id"):
    """APPROXIMATE distinct-count per group via HyperLogLog (p=12,
    ~1.6 % SE) — the 100-TB scale path next to :func:`distinct_users`:
    the shuffle moves ONE fixed 4 KiB register blob per (group, batch)
    regardless of cardinality, and the merge is an elementwise max, so
    memory is O(groups x 4 KiB) where the exact blob union is O(distinct
    ids).  Deterministic (splitmix64, no seeds): the same input always
    yields the same estimate.  Output: (group, n_distinct) — estimates,
    verified against the exact operator in pytest (rows-only for the
    driver: approximation has no SQL mirror).
    """
    import ray

    ds = read_table(sf_dir, "events", columns=[group_col, id_col])

    def partial(batch: pa.Table) -> pa.Table:
        return _grouped_blob_partial(batch, group_col, id_col,
                                     lambda ids: _hll_registers(ids)
                                     .tobytes(), "regs")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                group_col: pd.Series(dtype=object),
                "n_distinct": pd.Series(dtype=np.int64),
            })
        regs = np.zeros(_HLL_M, dtype=np.uint8)
        for b in df["regs"]:
            np.maximum(regs, np.frombuffer(b, dtype=np.uint8), out=regs)
        return pd.DataFrame({group_col: [df[group_col].iloc[0]],
                             "n_distinct": [np.int64(_hll_estimate(regs))]})

    return (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby(group_col)
            .map_groups(merge, batch_format="pandas"))


def _int_group_sum(codes: np.ndarray, vals: np.ndarray,
                   n: int) -> np.ndarray:
    """Exact int64 per-group sum (np.add.at) — bincount's float64 weights
    round above 2^53."""
    out = np.zeros(n, dtype=np.int64)
    if len(codes):
        np.add.at(out, codes, vals.astype(np.int64))
    return out


def props_field_stats(sf_dir: str, field: str = "k"):
    """Semi-structured (JSON-string) field extraction + rollup over the
    events ``props`` column: pull integer ``field`` with one vectorized
    RE2 ``extract_regex`` pass (no per-row json.loads) and aggregate per
    event_type — (event_type, n_events, n_with_k, sum_k, min_k, max_k).
    Rows whose props lack the field (or are NULL) count in n_events but
    not in the k aggregates; a group with no valid k yields NULL
    sum/min/max (SQL aggregate semantics, mirrored via valid-count
    partials).

    One streaming partial pass (dict-coded group keys, bincount sums,
    int64 sentinels for empty min/max) + a group-count-sized groupby.
    """
    import ray.data
    from ray.data.aggregate import Max, Min, Sum

    import re as _re

    ds = read_table(sf_dir, "events", columns=["event_type", "props"])
    # escape the field for RE2: a literal key like "k.x" must not match
    # "kQx" through an unescaped metacharacter (review finding); the
    # default field "k" is unchanged, and an oracle for a non-default
    # field must apply the same escaping to its regexp_extract
    pattern = '"%s": (?P<v>[0-9]+)' % _re.escape(field)
    LO, HI = np.iinfo(np.int64).min, np.iinfo(np.int64).max

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        codes, uniq = _dict_codes(batch["event_type"])
        props = batch["props"]
        if isinstance(props, pa.ChunkedArray):
            props = props.combine_chunks()
        ext = pc.extract_regex(pc.fill_null(props, ""), pattern)
        if len(ext):
            # no-match slots surface as "" in the child array; the match
            # group is [0-9]+ so a real match is never "" — one vectorized
            # cast, no per-row int()
            vstr = pc.fill_null(ext.field("v"), "")
            valid = pc.not_equal(vstr, "").to_numpy(zero_copy_only=False) \
                .astype(bool)
            k = pc.cast(pc.if_else(pc.equal(vstr, ""), "0", vstr),
                        pa.int64()).to_numpy(zero_copy_only=False)
        else:
            valid = np.zeros(0, dtype=bool)
            k = np.zeros(0, dtype=np.int64)
        n = len(uniq)
        kmin = np.full(n, HI, dtype=np.int64)
        kmax = np.full(n, LO, dtype=np.int64)
        if valid.any():
            np.minimum.at(kmin, codes[valid], k[valid])
            np.maximum.at(kmax, codes[valid], k[valid])
        return pa.table({
            "event_type": pa.array(list(uniq), type=pa.string()),
            "pn": pa.array(np.bincount(codes, minlength=n)
                           .astype(np.int64)),
            "pnk": pa.array(np.bincount(codes[valid], minlength=n)
                            .astype(np.int64)),
            # int64 accumulation via add.at, NOT float bincount weights:
            # the regex admits values >= 2^53, where float64 sums round
            # while the oracle's BIGINT sum stays exact
            "psum": pa.array(_int_group_sum(codes[valid], k[valid], n)),
            "pmin": pa.array(kmin),
            "pmax": pa.array(kmax),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
           .groupby("event_type")
           .aggregate(Sum("pn", alias_name="n_events"),
                      Sum("pnk", alias_name="n_with_k"),
                      Sum("psum", alias_name="s"),
                      Min("pmin", alias_name="mn"),
                      Max("pmax", alias_name="mx")))

    def finalize(batch: pa.Table) -> pa.Table:
        nk = batch["n_with_k"].to_numpy(zero_copy_only=False)
        has = nk > 0
        s = batch["s"].to_numpy(zero_copy_only=False)
        mn = batch["mn"].to_numpy(zero_copy_only=False)
        mx = batch["mx"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": batch["event_type"],
            "n_events": batch["n_events"],
            "n_with_k": batch["n_with_k"],
            "sum_k": pa.array(
                [int(v) if h else None for v, h in zip(s, has)],
                type=pa.int64()),
            "min_k": pa.array(
                [int(v) if h else None for v, h in zip(mn, has)],
                type=pa.int64()),
            "max_k": pa.array(
                [int(v) if h else None for v, h in zip(mx, has)],
                type=pa.int64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow",
                           batch_size=None)


def doc_token_rank(sf_dir: str, value_bucket: int = 16,
                   id_col: str = "doc_id", text_col: str = "text"):
    """Distributed global window RANK over the corpus: (doc_id, n_tokens,
    row_num, rank) with row_num = row_number() OVER (ORDER BY n_tokens,
    doc_id) and rank = rank() OVER (ORDER BY n_tokens) (ties share the
    smallest position).  Complements running_token_totals' SUM scan — the
    other analytic window family, built shuffle-native.

    Two-level scan keyed by VALUE ranges (vrange = n_tokens //
    value_bucket): pass 1 counts documents per value range, so the driver
    sees one row per range (bounded by max token count / value_bucket,
    never by corpus size); the exclusive doc-count offsets broadcast
    once; pass 2 co-locates each range with one groupby.map_groups —
    moving only (doc_id, n_tokens) int rows — and ranks locally.  Equal
    values live entirely inside one value range, so tie ranks are locally
    computable.  Exact for any block layout.
    """
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    import pyarrow.compute as pc

    from ..state.bcast import cached_get

    VB = int(value_bucket)
    ds = read_table(sf_dir, "documents", columns=[id_col, text_col])

    def counts(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = pc.count_substring_regex(pc.fill_null(batch[text_col], ""),
                                     r"\S+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            id_col: pa.array(ids),
            "n_tokens": pa.array(n),
            "vrange": pa.array(n // VB),
        })

    compact = ds.map_batches(counts, batch_format="pyarrow",
                             batch_size=None).materialize()

    def range_partial(batch: pa.Table) -> pa.Table:
        r = batch["vrange"].to_numpy(zero_copy_only=False)
        u, c = np.unique(r, return_counts=True)
        return pa.table({"vrange": pa.array(u),
                         "partial_n": pa.array(c.astype(np.int64))})

    rng_pd = (compact.map_batches(range_partial, batch_format="pyarrow",
                                  batch_size=None)
              .groupby("vrange")
              .aggregate(Sum("partial_n", alias_name="n"))).to_pandas()
    rng_pd = rng_pd.sort_values("vrange").reset_index(drop=True)
    starts = rng_pd["vrange"].to_numpy().astype(np.int64)
    cnts = rng_pd["n"].to_numpy().astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(cnts)[:-1]])  # exclusive
    off_ref = ray.put((starts, offsets))

    def rank_range(df: pd.DataFrame, off_ref=off_ref) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                id_col: pd.Series(dtype=np.int64),
                "n_tokens": pd.Series(dtype=np.int64),
                "row_num": pd.Series(dtype=np.int64),
                "rank": pd.Series(dtype=np.int64),
            })
        st, off = cached_get(off_ref)
        base = off[np.searchsorted(st, np.int64(df["vrange"].iloc[0]))]
        df = df.sort_values([ "n_tokens", id_col]).reset_index(drop=True)
        n = df["n_tokens"].to_numpy()
        row_num = base + np.arange(1, len(df) + 1, dtype=np.int64)
        # rank of a row = global position of the FIRST row sharing its
        # value; equal values never cross a vrange boundary
        first = np.searchsorted(n, n, side="left")
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_tokens": n,
            "row_num": row_num,
            "rank": base + first + 1,
        })

    return (compact.groupby("vrange")
            .map_groups(rank_range, batch_format="pandas"))


# rolled-up-dim marker in the prefix-flagged shuffle-key space: real
# values ride as "V<value>", null data values as "N", rollups as "A" —
# distinct first bytes, so no real value can alias either marker
# (review finding: the old "\x00ALL" sentinel could)
_ROLLUP_ALL = "A"


def docs_rollup(sf_dir: str):
    """Multi-grouping-set aggregate in ONE corpus pass (SQL GROUPING SETS
    ((lang, source), (lang), (source), ()) shape): document count and
    exact token sum at every grouping level — (lang, source, n_docs,
    sum_tokens), with NULL marking a rolled-up dimension exactly as SQL
    does.

    Each batch emits partials for all four grouping sets at once (the
    rolled dims carried as a shuffle-safe sentinel, since a shuffle key
    cannot be NULL), so the corpus is still read once and the shuffle
    moves ~4x the distinct-group rows — grouping-set cardinality, never
    corpus rows.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents",
                    columns=["lang", "source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        n_tok = pc.count_substring_regex(
            pc.fill_null(batch["text"], ""), r"\S+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        lcodes, luq = _dict_codes(batch["lang"])
        scodes, suq = _dict_codes(batch["source"])
        luq = ["N" if u is None else "V" + str(u) for u in luq] \
            + [_ROLLUP_ALL]
        suq = ["N" if u is None else "V" + str(u) for u in suq] \
            + [_ROLLUP_ALL]
        la, sa = np.int64(len(luq) - 1), np.int64(len(suq) - 1)
        outs = {"lang": [], "source": [], "pn": [], "pt": []}
        for lsel, ssel in ((lcodes, scodes), (lcodes, None),
                           (None, scodes), (None, None)):
            lk = lsel if lsel is not None else np.full(len(batch), la)
            sk = ssel if ssel is not None else np.full(len(batch), sa)
            key = lk * np.int64(len(suq)) + sk
            u, inv = np.unique(key, return_inverse=True)
            outs["lang"].extend(luq[int(k) // len(suq)] for k in u)
            outs["source"].extend(suq[int(k) % len(suq)] for k in u)
            outs["pn"].extend(np.bincount(inv, minlength=len(u))
                              .astype(np.int64).tolist())
            outs["pt"].extend(np.bincount(inv, weights=n_tok,
                                          minlength=len(u))
                              .astype(np.int64).tolist())
        return pa.table({
            "lang": pa.array(outs["lang"], type=pa.string()),
            "source": pa.array(outs["source"], type=pa.string()),
            "pn": pa.array(outs["pn"], type=pa.int64()),
            "pt": pa.array(outs["pt"], type=pa.int64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
           .groupby(["lang", "source"])
           .aggregate(Sum("pn", alias_name="n_docs"),
                      Sum("pt", alias_name="sum_tokens")))

    def finalize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        def unflag(col):
            # "A"/"N" -> NULL, "V<value>" -> value
            real = pc.starts_with(col, "V")
            return pc.if_else(real, pc.utf8_slice_codeunits(
                col, 1, np.iinfo(np.int32).max),
                pa.scalar(None, type=pa.string()))

        lang = unflag(batch["lang"])
        src = unflag(batch["source"])
        return pa.table({
            "lang": lang,
            "source": src,
            "n_docs": batch["n_docs"],
            "sum_tokens": batch["sum_tokens"],
        })

    return agg.map_batches(finalize, batch_format="pyarrow",
                           batch_size=None)


def events_winsorized(sf_dir: str, lo: float = 0.05, hi: float = 0.95):
    """Winsorized per-type value aggregates: clamp each event value to its
    type's exact [p_lo, p_hi] quantiles (quantile_disc semantics — real
    data values, computed by the bounded-memory group_quantiles
    machinery), then aggregate — (event_type, n_events, n_lo, n_hi,
    sum_clamped_cents).  The standard outlier-robust rollup, composed
    from the oracled quantile operator + a broadcast clamp pass.

    Hash-exactness: clamp bounds are actual data values (2-decimal by
    construction), so rint(clamped * 100) lifts every summand into int64
    and the distributed sums are exact.  NULL values are excluded
    everywhere (SQL aggregate semantics); a type with no valid value has
    no quantiles and is absent, mirroring the oracle's inner join.
    """
    import ray
    from ray.data.aggregate import Sum

    from ..state.bcast import cached_get

    qdf = group_quantiles(sf_dir, qs=(lo, hi))
    if not isinstance(qdf, pd.DataFrame):
        qdf = qdf.to_pandas()
    bounds = {}
    for et, grp in qdf.groupby("event_type"):
        g = grp.sort_values("q")
        bounds[et] = (float(g["value"].iloc[0]), float(g["value"].iloc[-1]))
    b_ref = ray.put(bounds)

    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def partial(batch: pa.Table, b_ref=b_ref) -> pa.Table:
        bs = cached_get(b_ref)
        v = batch["value"].to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        codes, uniq = _dict_codes(batch["event_type"])
        # per-DISTINCT-type membership indexed by code — no per-row
        # Python object array, no per-batch key-list rebuild
        has = np.fromiter((u in bs for u in uniq), dtype=bool,
                          count=len(uniq))
        keep = ok & has[codes]
        codes, v = codes[keep], v[keep]
        los = np.array([bs.get(u, (np.nan, np.nan))[0] for u in uniq])
        his = np.array([bs.get(u, (np.nan, np.nan))[1] for u in uniq])
        lo_v, hi_v = los[codes], his[codes]
        clamped = np.minimum(np.maximum(v, lo_v), hi_v)
        n = len(uniq)
        return pa.table({
            "event_type": pa.array(list(uniq), type=pa.string()),
            "pn": pa.array(np.bincount(codes, minlength=n)
                           .astype(np.int64)),
            "plo": pa.array(np.bincount(codes, weights=(v < lo_v),
                                        minlength=n).astype(np.int64)),
            "phi": pa.array(np.bincount(codes, weights=(v > hi_v),
                                        minlength=n).astype(np.int64)),
            "ps": pa.array(np.bincount(
                codes, weights=np.rint(clamped * 100.0),
                minlength=n).astype(np.int64)),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
           .groupby("event_type")
           .aggregate(Sum("pn", alias_name="n_events"),
                      Sum("plo", alias_name="n_lo"),
                      Sum("phi", alias_name="n_hi"),
                      Sum("ps", alias_name="sum_clamped_cents")))

    def drop_empty(batch: pa.Table) -> pa.Table:
        # types whose every row was filtered (no bounds / all NULL) emit a
        # zero partial row; the oracle's join drops them — mirror that
        n = batch["n_events"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(n > 0))

    return agg.map_batches(drop_empty, batch_format="pyarrow",
                           batch_size=None)


def robust_mad_stats(sf_dir: str, group_col: str = "event_type",
                     value_col: str = "value", n_bins: int = 4096):
    """Median + MAD (median absolute deviation) per group — the standard
    robust location/scale pair for outlier detection in telemetry and
    data-quality gates.  Output: (group, median, mad), one row per group
    with at least one non-NULL value.

    Composition of the bounded-memory exact-quantile machinery, twice:
      1. median per group (group_quantiles at q=0.5);
      2. broadcast the median dict, stream |v - median| through the SAME
         machinery via its make_ds hook — the deviation column is never
         materialized, just recomputed per pass (3 streaming scans).
    Hash-exactness: |v - m| is one float64 expression written identically
    in the SQL mirror, and quantile_disc selects an ACTUAL deviation
    value, so both medians are bit-exact.  NULL values are dropped
    everywhere (SQL aggregate semantics); NULL group keys form their own
    group (IS NOT DISTINCT FROM join in the mirror).
    """
    import pyarrow.compute as pc
    import ray

    from ..state.bcast import cached_get

    med_df = group_quantiles(sf_dir, qs=(0.5,), group_col=group_col,
                             value_col=value_col, n_bins=n_bins)
    if not isinstance(med_df, pd.DataFrame):
        med_df = med_df.to_pandas()
    med = dict(zip(med_df[group_col], med_df[value_col]))
    med_ref = ray.put(med)

    def make_ds():
        ds = read_table(sf_dir, "events", columns=[group_col, value_col])

        def dev(batch: pa.Table, med_ref=med_ref) -> pa.Table:
            mm = cached_get(med_ref)
            if batch[value_col].null_count:
                batch = batch.filter(pc.is_valid(batch[value_col]))
            codes, uniq = _dict_codes(batch[group_col])
            # a group absent from the median dict had ONLY null values
            # upstream, so no row of it survives the filter above
            m = np.fromiter((mm[u] for u in uniq), dtype=np.float64,
                            count=len(uniq))
            v = batch[value_col].to_numpy(zero_copy_only=False)
            d = np.abs(v - m[codes])
            return pa.table({group_col: batch[group_col],
                             value_col: pa.array(d, type=pa.float64())})

        return ds.map_batches(dev, batch_format="pyarrow", batch_size=None)

    mad_df = group_quantiles(sf_dir, qs=(0.5,), group_col=group_col,
                             value_col=value_col, n_bins=n_bins,
                             make_ds=make_ds)
    if not isinstance(mad_df, pd.DataFrame):
        mad_df = mad_df.to_pandas()
    out = med_df.rename(columns={value_col: "median"})[[group_col, "median"]] \
        .merge(mad_df.rename(columns={value_col: "mad"})[[group_col, "mad"]],
               on=group_col, how="left")
    return out.sort_values(group_col, ignore_index=True)


def doc_deciles(sf_dir: str, k: int = 10, value_bucket: int = 64,
                group_col: str = "lang", value_col: str = "n_chars",
                id_col: str = "doc_id"):
    """Distributed NTILE(k) per group: (doc_id, lang, n_chars, decile)
    with decile = ntile(k) OVER (PARTITION BY lang ORDER BY n_chars,
    doc_id) — length-stratified bucketing for curriculum sampling or
    per-stratum quota selection.

    Same value-range two-level scan as doc_token_rank: pass 1 counts rows
    per (group, value_bucket) — the driver holds one row per occupied
    range, bounded by value spread not corpus size — then broadcasts
    exclusive offsets + per-group totals; pass 2 co-locates each (group,
    range) with one groupby, sorts locally by (value, id) (a total order,
    so the global position is offset + local index) and applies the exact
    NTILE split (first n%k buckets get one extra row).  NULL values sort
    last (SQL NULLS LAST) via an int64 sentinel; NULL groups form their
    own partition via a sentinel shuffle key (a shuffle key cannot be
    NULL).
    """
    import ray
    from ray.data.aggregate import Sum

    from ..state.bcast import cached_get

    VB = np.int64(value_bucket)
    SENT = np.int64(1) << 62          # NULL value -> sorts after any real
    K = int(k)
    ds = read_table(sf_dir, "documents",
                    columns=[id_col, group_col, value_col])

    def tag(batch: pa.Table) -> pa.Table:
        g = batch[group_col].to_pandas()
        # explicit null flag + length prefix: no real group value can
        # alias NULL or re-align across the "\x1f" separator below
        isnull = g.isna()
        s = g.where(~isnull, "").astype(str)
        gk = ("V" + s.str.len().astype(str) + ":" + s).where(~isnull, "N")
        v = batch[value_col].to_numpy(zero_copy_only=False)
        v = np.where(np.isnan(v.astype(np.float64)), SENT,
                     v).astype(np.int64) if v.dtype.kind == "f" \
            else v.astype(np.int64)
        key = gk + "\x1f" + pd.Series(v // VB).astype(str).to_numpy()
        return pa.table({
            id_col: batch[id_col],
            group_col: batch[group_col],
            value_col: batch[value_col],
            "v": pa.array(v),
            "gr": pa.array(key, type=pa.string()),
            "gk": pa.array(gk, type=pa.string()),
        })

    compact = ds.map_batches(tag, batch_format="pyarrow",
                             batch_size=None).materialize()

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"gr": batch["gr"].to_pandas(),
                           "gk": batch["gk"].to_pandas(),
                           "vr": batch["v"].to_numpy() // VB})
        g = df.groupby(["gr", "gk", "vr"], sort=False).size() \
            .reset_index(name="pn")
        return pa.table({
            "gr": pa.array(g["gr"], type=pa.string()),
            "gk": pa.array(g["gk"], type=pa.string()),
            "vr": pa.array(g["vr"].to_numpy().astype(np.int64)),
            "pn": pa.array(g["pn"].to_numpy().astype(np.int64)),
        })

    rng = (compact.map_batches(partial, batch_format="pyarrow",
                               batch_size=None)
           .groupby("gr")
           .aggregate(Sum("pn", alias_name="n"))).to_pandas()
    # gr carries (gk, vr) — recover them for offset math
    parts = rng["gr"].str.rsplit("\x1f", n=1, expand=True)
    rng["gk"], rng["vr"] = parts[0], parts[1].astype(np.int64)
    rng = rng.sort_values(["gk", "vr"]).reset_index(drop=True)
    offsets, totals = {}, {}
    for gk_, grp in rng.groupby("gk", sort=False):
        c = grp["n"].to_numpy().astype(np.int64)
        off = np.concatenate([[0], np.cumsum(c)[:-1]])
        totals[gk_] = int(c.sum())
        for vr_, o in zip(grp["vr"], off):
            offsets[(gk_, int(vr_))] = int(o)
    bc_ref = ray.put((offsets, totals))

    def ntile_range(df: pd.DataFrame, bc_ref=bc_ref) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                id_col: pd.Series(dtype=np.int64),
                group_col: pd.Series(dtype=object),
                value_col: pd.Series(dtype=np.int64),
                "decile": pd.Series(dtype=np.int64),
            })
        offs, tots = cached_get(bc_ref)
        gk_ = df["gk"].iloc[0]
        vr_ = int(df["v"].iloc[0] // VB)
        base_off = offs[(gk_, vr_)]
        n = tots[gk_]
        df = df.sort_values(["v", id_col]).reset_index(drop=True)
        r = base_off + np.arange(len(df), dtype=np.int64)   # 0-based
        big, rem = n // K, n % K
        cut = rem * (big + 1)
        tile = np.where(r < cut, r // (big + 1),
                        rem + (r - cut) // max(big, 1)) + 1
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            group_col: df[group_col].to_numpy(),
            value_col: df[value_col].to_numpy(),
            "decile": tile.astype(np.int64),
        })

    return (compact.groupby("gr")
            .map_groups(ntile_range, batch_format="pandas"))


def user_streaks(sf_dir: str, n_parts: int = 64):
    """Longest consecutive-active-day streak per user (the SQL
    gaps-and-islands window pattern, distributed): output (user_id,
    n_active_days, max_streak) over distinct UTC activity days.

    Same one-co-partition shape as event_gaps: hash by user, then a
    single vectorized pass per partition — distinct (user, day), the
    island key day - within-user-index, run lengths via reduceat.  Day =
    epoch_us // 86400e6 (integer floor; event timestamps are positive
    epochs, where truncation and floor agree with the oracle's `//`).
    NULL-ts / NULL-user events are unattributable and ignored.
    """
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def add_part(batch: pa.Table) -> pa.Table:
        batch = _drop_null_ts(_drop_null_users(
            batch.replace_schema_metadata(None)))
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        t = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        day = np.floor_divide(t, 86_400_000_000)
        # per-batch distinct (user, day) — the shuffle moves at most one
        # row per user-day per batch, not one per event
        key = np.stack([uid.astype(np.int64), day])
        _, idx = np.unique(key, axis=1, return_index=True)
        uid, day = uid[idx].astype(np.int64), day[idx]
        return pa.table({
            "part": pa.array((uid % n_parts).astype(np.int32)),
            "user_id": pa.array(uid),
            "day": pa.array(day),
        })

    def streaks(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "user_id": pd.Series(dtype=np.int64),
                "n_active_days": pd.Series(dtype=np.int64),
                "max_streak": pd.Series(dtype=np.int64),
            })
        df = df.drop_duplicates(["user_id", "day"]) \
            .sort_values(["user_id", "day"])
        uid = df["user_id"].to_numpy().astype(np.int64)
        day = df["day"].to_numpy().astype(np.int64)
        newu = np.concatenate([[True], uid[1:] != uid[:-1]])
        brk = newu | np.concatenate([[True], (day[1:] - day[:-1]) != 1])
        isl_start = np.flatnonzero(brk)
        isl_len = np.diff(np.append(isl_start, len(day)))
        isl_uid = uid[isl_start]
        # islands are user-ordered: per-user max via reduceat segments
        ustart = np.flatnonzero(np.concatenate(
            [[True], isl_uid[1:] != isl_uid[:-1]]))
        users = isl_uid[ustart]
        max_streak = np.maximum.reduceat(isl_len, ustart)
        n_days = np.add.reduceat(isl_len, ustart)
        return pd.DataFrame({
            "user_id": users,
            "n_active_days": n_days.astype(np.int64),
            "max_streak": max_streak.astype(np.int64),
        })

    return (ds.map_batches(add_part, batch_format="pyarrow",
                           batch_size=None)
            .groupby("part")
            .map_groups(streaks, batch_format="pandas"))


def corr_by_group(sf_dir: str, group_col: str = "lang",
                  x_col: str = "n_chars"):
    """Per-group Pearson correlation between two integer features —
    (group, n_docs, corr) with x = n_chars and y = whitespace-token count
    of text — the feature-diagnostics aggregate (CORR(x, y) GROUP BY g)
    behind data-quality dashboards.

    Exactness contract: both features are integers, so the five moment
    sums (Sx, Sy, Sxx, Syy, Sxy) accumulate exactly: WITHIN a batch in
    int64 (bound: max(x,y)^2 x rows_per_batch < 2^63 — e.g. 10^6-char
    docs at 10^5 rows/batch use 10^17 of the 9.2x10^18 headroom; assert-
    checked below), and ACROSS batches each per-batch partial is split
    into (hi = p // 2^31, lo = p % 2^31) int64 columns that Ray sums
    separately and the driver recombines as Python ints — wrap-free up to
    2^31 batches (~2^94 total moment mass), so the cross-batch sum never
    wraps at any corpus size.  The final float expression
    float(n*Sxy - Sx*Sy) / sqrt(float(n*Sxx - Sx^2) * float(n*Syy - Sy^2))
    is the identical correctly-rounded IEEE sequence DuckDB evaluates on
    its HUGEINT sums, so even the correlation's last bit matches the SQL
    oracle.  Degenerate variance emits NULL in both engines.  Rows with a
    NULL x or NULL text drop (SQL WHERE parity); NULL groups form their
    own group, carried as an explicit is-null flag key (not a sentinel
    value, so no real group value can collide with it).

    One streaming pass of per-batch moment partials, one tiny groupby of
    group-cardinality rows, driver math on the handful of groups — no
    whole-table shuffle, scale-safe at any corpus size."""
    import math

    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents",
                    columns=[group_col, x_col, "text"])

    def moments(batch: pa.Table) -> pa.Table:
        g = batch[group_col].to_pandas()
        x = np.asarray(batch[x_col].to_pandas(), dtype=np.float64)
        txt = batch["text"]
        y = pc.fill_null(pc.add(pc.count_substring(txt, " "), 1), 0) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        tnull = np.asarray(pc.is_null(txt).to_numpy(zero_copy_only=False))
        ok = ~np.isnan(x) & ~tnull
        df = pd.DataFrame({"g": g[ok]})
        xi = x[ok].astype(np.int64)
        yi = y[ok].astype(np.int64)
        if len(xi):
            mx = max(int(np.abs(xi).max()), int(np.abs(yi).max()))
            assert mx * mx * len(xi) < 2**63, (
                "corr_by_group per-batch moment partial would exceed "
                "int64; lower batch_size")
        agg = df.assign(x=xi, y=yi, xx=xi * xi, yy=yi * yi, xy=xi * yi) \
            .groupby("g", sort=False, dropna=False) \
            .agg(sx=("x", "sum"), sy=("y", "sum"), sxx=("xx", "sum"),
                 syy=("yy", "sum"), sxy=("xy", "sum"), pn=("x", "size")) \
            .reset_index()
        gnull = agg["g"].isna().to_numpy()
        key = agg["g"].where(~gnull, "").astype(str)
        cols = {"gk": pa.array(key.tolist(), type=pa.string()),
                "gnull": pa.array(gnull.astype(np.int8))}
        for c in ("sx", "sy", "sxx", "syy", "sxy", "pn"):
            p = agg[c].to_numpy().astype(np.int64)
            cols[c + "_hi"] = pa.array(p // np.int64(2**31))
            cols[c + "_lo"] = pa.array(p % np.int64(2**31))
        return pa.table(cols)

    parts = [f"{c}_{h}" for c in ("sx", "sy", "sxx", "syy", "sxy", "pn")
             for h in ("hi", "lo")]
    m = (ds.map_batches(moments, batch_format="pyarrow", batch_size=None)
         .groupby(["gk", "gnull"])
         .aggregate(*[Sum(p, alias_name=p) for p in parts])).to_pandas()

    def _rec(r, c):
        return int(getattr(r, c + "_hi")) * 2**31 + int(getattr(r, c + "_lo"))

    out_g, out_n, out_c = [], [], []
    for r in m.itertuples():
        n, sx, sy = _rec(r, "pn"), _rec(r, "sx"), _rec(r, "sy")
        sxx, syy, sxy = _rec(r, "sxx"), _rec(r, "syy"), _rec(r, "sxy")
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        corr = (float(n * sxy - sx * sy) / math.sqrt(float(vx) * float(vy))
                if vx > 0 and vy > 0 else None)
        out_g.append(None if r.gnull else r.gk)
        out_n.append(n)
        out_c.append(corr)
    return pd.DataFrame({
        group_col: pd.Series(out_g, dtype=object),
        "n_docs": pd.Series(out_n, dtype=np.int64),
        "corr_chars_tokens": pd.Series(out_c, dtype=np.float64),
    }).sort_values(group_col, ignore_index=True)


def corr_by_group_sql(group_col: str = "lang",
                      x_col: str = "n_chars") -> str:
    toks = "length(text) - length(replace(text, ' ', '')) + 1"
    return (
        f"WITH t AS (SELECT {group_col}, CAST({x_col} AS HUGEINT) AS x, "
        f"CAST({toks} AS HUGEINT) AS y FROM documents "
        f"WHERE {x_col} IS NOT NULL AND text IS NOT NULL), "
        f"m AS (SELECT {group_col}, CAST(count(*) AS HUGEINT) AS n, "
        "sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx, sum(y*y) AS syy, "
        f"sum(x*y) AS sxy FROM t GROUP BY {group_col}) "
        f"SELECT {group_col}, CAST(n AS BIGINT) AS n_docs, "
        "CASE WHEN (n*sxx - sx*sx) > 0 AND (n*syy - sy*sy) > 0 "
        "THEN CAST(n*sxy - sx*sy AS DOUBLE) / "
        "sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * "
        "CAST(n*syy - sy*sy AS DOUBLE)) ELSE NULL END "
        f"AS corr_chars_tokens FROM m"
    )


def events_sliding_distinct(sf_dir: str, window_s: int = 3600,
                            slide_s: int = 1800, n_parts: int = 256):
    """Sliding-window EXACT distinct users — (window_start, n_users) for
    hop-slide_s windows of length window_s: the audience-reach window
    where, unlike events_sliding's counts, the aggregate is not
    partially summable (a user seen twice in one window counts once),
    so the plan ships per-batch-distinct (window, user) PAIRS — never
    raw events — into ONE window-hash co-partition that finishes the
    distinct locally.  NULL users and NULL timestamps drop (COUNT
    (DISTINCT) / NULL-comparison SQL parity).  Shuffle volume is
    bounded by windows x active-users-per-batch, not event count."""
    # CEIL, not floor: when window_s is not a multiple of slide_s an
    # event can belong to one more window than window_s // slide_s
    # (review finding); the `t < start + window` mask trims the
    # over-generation, and the SQL mirror uses the same ceil
    n_windows = -(-window_s // slide_s)
    ds = read_table(sf_dir, "events", columns=["ts", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        # NULL users/ts drop via the shared int-exact helpers: user_id
        # stays int64 end-to-end (a float64 roundtrip would collapse ids
        # above 2^53 and silently diverge from COUNT(DISTINCT)).
        batch = _drop_null_users(_drop_null_ts(batch))
        ts_s = batch["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[s]").astype(np.int64)
        uid = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        base = (ts_s // slide_s) * slide_s
        starts = base[:, None] - slide_s * np.arange(n_windows)[None, :]
        valid = ts_s[:, None] < starts + window_s
        w = starts[valid]
        u = np.repeat(uid, n_windows).reshape(-1, n_windows)[valid]
        pairs = pd.DataFrame({"w": w, "u": u}).drop_duplicates()
        wv = pairs["w"].to_numpy()
        # window starts are all multiples of slide_s: divide before the
        # modulo so consecutive windows hit consecutive partitions
        # (raw wv % n_parts would only reach n_parts/gcd(slide_s,n_parts)
        # of them — an 8x co-partition skew at the defaults).
        return pa.table({
            "part": pa.array(((wv // slide_s) % n_parts).astype(np.int32)),
            "w": pa.array(wv, type=pa.int64()),
            "u": pa.array(pairs["u"].to_numpy(), type=pa.int64()),
        })

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "window_start": pd.Series(dtype="datetime64[us]"),
                "n_users": pd.Series(dtype=np.int64),
            })
        g = df.drop_duplicates(["w", "u"]).groupby("w", sort=True)["u"] \
            .size().reset_index(name="n")
        return pd.DataFrame({
            "window_start": g["w"].to_numpy().astype("datetime64[s]")
                .astype("datetime64[us]"),
            "n_users": g["n"].to_numpy().astype(np.int64),
        })

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
            .groupby("part")
            .map_groups(finish, batch_format="pandas"))


def events_sliding_distinct_sql(window_s: int = 3600,
                                slide_s: int = 1800) -> str:
    # Window base via the double-mod trick (es - ((es % s) + s) % s):
    # pure-integer FLOOR to a multiple of slide_s, matching numpy's
    # floor-dividing `//` for pre-1970 (negative-epoch) timestamps —
    # DuckDB's integer `//` truncates toward zero (-7//2 = -3), which
    # would shift negative-epoch events one window late.
    ks = ", ".join(f"({k})" for k in range(-(-window_s // slide_s)))
    return f"""
SELECT make_timestamp(w * 1000000) AS window_start,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM (
  SELECT es - ((es % {slide_s}) + {slide_s}) % {slide_s}
           - {slide_s} * k.k AS w,
         es, user_id
  FROM (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS es, user_id
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)
  CROSS JOIN (VALUES {ks}) AS k(k)
) WHERE es < w + {window_s}
GROUP BY 1"""


def user_rolling(sf_dir: str, preceding: int = 3, n_parts: int = 64):
    """Per-event ROWS-window aggregate — the distributed
    ``SUM ... OVER (PARTITION BY user ORDER BY ts, event_id ROWS
    BETWEEN k PRECEDING AND CURRENT ROW)``: for every event, the sum
    and row count of the user's trailing (k+1)-event window.

    Money values go through cents (``round_half_away(value*100)`` ==
    DuckDB's ``round``) so the rolling sums are int64-exact — no float
    accumulation order can diverge from the oracle.  (ts, event_id) is
    a total order (event ids are unique), so ties are deterministic.
    NULL user/ts/value rows are unattributable and drop on both engines.

    Shape: ONE user-hash co-partition, then a single vectorized pass
    per partition (cumsum minus a lagged cumsum clamped at each user's
    first row) — windows never cross partitions because users don't.
    Shuffle volume is the event count once; no per-row Python.
    """
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "user_id", "value"])

    def add_part(batch: pa.Table) -> pa.Table:
        batch = _drop_null_users(_drop_null_ts(
            batch.replace_schema_metadata(None)))
        if batch["value"].null_count:
            batch = batch.filter(pc.is_valid(batch["value"]))
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array((uid % n_parts).astype(np.int32)))

    k = int(preceding)

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "event_id": pd.Series(dtype=np.int64),
                "user_id": pd.Series(dtype=np.int64),
                "roll_cents": pd.Series(dtype=np.int64),
                "roll_n": pd.Series(dtype=np.int64),
            })
        df = df.sort_values(["user_id", "ts", "event_id"]) \
            .reset_index(drop=True)
        uid = df["user_id"].to_numpy()
        cents = round_half_away(
            df["value"].to_numpy() * 100.0, 0).astype(np.int64)
        n = len(df)
        idx = np.arange(n, dtype=np.int64)
        # first row index of each user's run, broadcast to every row
        new_user = np.concatenate([[True], uid[1:] != uid[:-1]])
        run_start = idx[new_user]
        start_of = np.repeat(run_start, np.diff(
            np.concatenate([run_start, [n]])))
        lo = np.maximum(idx - k, start_of)
        c = np.concatenate([[0], np.cumsum(cents)])  # c[i+1]=sum(<=i)
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy().astype(np.int64),
            "user_id": uid.astype(np.int64),
            "roll_cents": c[idx + 1] - c[lo],
            "roll_n": idx - lo + 1,
        })

    return (ds.map_batches(add_part, batch_format="pyarrow",
                           batch_size=None)
            .groupby("part")
            .map_groups(roll, batch_format="pandas"))


def user_rolling_sql(preceding: int = 3) -> str:
    return f"""
SELECT event_id, user_id,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w
            AS BIGINT) AS roll_cents,
       CAST(count(*) OVER w AS BIGINT) AS roll_n
FROM events
WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {int(preceding)} PRECEDING AND CURRENT ROW)"""


def event_transitions(sf_dir: str, n_parts: int = 64):
    """Event-type transition (Markov) counts — the distributed
    ``LAG(event_type) OVER (PARTITION BY user ORDER BY ts, event_id)``
    rolled up corpus-wide: (from_type, to_type, n) for every observed
    consecutive pair within a user's timeline.

    NULL user/ts/type rows drop on both engines (an untyped event is
    not a state; a NULL prev — each user's first event — is not a
    transition).  Same co-partition shape as event_gaps: users never
    cross partitions, so LAG is local; the shuffle after the partial
    count moves at most |types|^2 rows per partition.
    """
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "user_id", "event_type"])

    def add_part(batch: pa.Table) -> pa.Table:
        batch = _drop_null_users(_drop_null_ts(
            batch.replace_schema_metadata(None)))
        if batch["event_type"].null_count:
            batch = batch.filter(pc.is_valid(batch["event_type"]))
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array((uid % n_parts).astype(np.int32)))

    def count_local(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"bt": pd.Series(dtype=object),
                                 "n": pd.Series(dtype=np.int64)})
        df = df.sort_values(["user_id", "ts", "event_id"]) \
            .reset_index(drop=True)
        uid = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy()
        same = np.concatenate([[False], uid[1:] == uid[:-1]])
        frm, to = et[np.flatnonzero(same) - 1], et[same]
        if len(frm) == 0:
            return pd.DataFrame({"bt": pd.Series(dtype=object),
                                 "n": pd.Series(dtype=np.int64)})
        g = pd.DataFrame({"bt": np.char.add(np.char.add(
            frm.astype(str), "\x1f"), to.astype(str))}) \
            .groupby("bt", sort=False).size().reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return g

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "from_type": pd.Series(dtype=object),
                "to_type": pd.Series(dtype=object),
                "n": pd.Series(dtype=np.int64)})
        g = df.groupby("bt", sort=False)["n"].sum().reset_index()
        parts = g["bt"].str.split("\x1f", n=1, expand=True)
        return pd.DataFrame({"from_type": parts[0], "to_type": parts[1],
                             "n": g["n"].astype(np.int64)})

    return (ds.map_batches(add_part, batch_format="pyarrow",
                           batch_size=None)
            .groupby("part")
            .map_groups(count_local, batch_format="pandas")
            .groupby("bt")
            .map_groups(finish, batch_format="pandas"))


EVENT_TRANSITIONS_SQL = """
SELECT prev AS from_type, event_type AS to_type,
       CAST(count(*) AS BIGINT) AS n
FROM (SELECT lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev,
             event_type
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_type IS NOT NULL)
WHERE prev IS NOT NULL
GROUP BY 1, 2"""


def event_stationary(sf_dir: str, iters: int = 25,
                     scale: int = 10 ** 12):
    """Stationary distribution of the event-type Markov chain — where
    does a user's session settle in the long run?  Fixed-point INTEGER
    power iteration over the :func:`event_transitions` counts: pi is a
    vector of ints scaled by 1e12, each step

        pi'_j = sum_i (pi_i * c_ij) // r_i        (r_i = row total)

    with floor division, so every engine computes the identical exact
    integers — no float accumulation-order surface at all.  Dangling
    states (observed only as a transition TARGET) get K uniform
    synthetic out-edges (c = 1, r = K), the standard PageRank-style
    patch, applied identically in the SQL mirror.  Output after
    ``iters`` steps: (event_type, pi_scaled, stationary_p); states that
    lose all inflow drop out exactly like the recursive-CTE rows do.

    Scale shape: the chain is |event types|^2-bounded (the transition
    rollup already reduced the corpus), so the iteration runs in one
    bounded task on arbitrary-precision ints — mirrored by a DuckDB
    RECURSIVE CTE with an iteration counter (aggregation in the
    recursive term; verified supported).
    """
    trans = event_transitions(sf_dir)

    def power(batch: pa.Table) -> pa.Table:
        f = batch["from_type"].to_pylist()
        t = batch["to_type"].to_pylist()
        n = batch["n"].to_pylist()
        states = sorted(set(f) | set(t))
        empty = pa.table({
            "event_type": pa.array([], type=pa.string()),
            "pi_scaled": pa.array([], type=pa.int64()),
            "stationary_p": pa.array([], type=pa.float64()),
        })
        if not states:
            return empty
        k = len(states)
        r: dict = {}
        edges: dict = {}
        for a, b, c in zip(f, t, n):
            r[a] = r.get(a, 0) + int(c)
            edges.setdefault(a, []).append((b, int(c)))
        for s in states:
            if s not in r:                     # dangling: uniform jump
                r[s] = k
                edges[s] = [(j, 1) for j in states]
        v = {s: scale // k for s in states}
        for _ in range(iters):
            nv: dict = {}
            for i, vi in v.items():
                ri = r[i]
                for j, c in edges[i]:
                    nv[j] = nv.get(j, 0) + (vi * c) // ri
            v = nv
        out = sorted(v)
        return pa.table({
            "event_type": pa.array(out, type=pa.string()),
            "pi_scaled": pa.array([int(v[s]) for s in out],
                                  type=pa.int64()),
            "stationary_p": pa.array(
                [float(round_half_away(np.float64(
                    float(int(v[s])) / float(scale)))) for s in out],
                type=pa.float64()),
        })

    return trans.repartition(1).map_batches(power, batch_format="pyarrow",
                                            batch_size=None)


EVENT_STATIONARY_SQL = """
WITH RECURSIVE tr AS (
  SELECT prev AS f, event_type AS t, CAST(count(*) AS HUGEINT) AS c
  FROM (SELECT lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev,
               event_type
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
          AND event_type IS NOT NULL)
  WHERE prev IS NOT NULL GROUP BY 1, 2),
st AS (SELECT f AS s FROM tr UNION SELECT t FROM tr),
kk AS (SELECT CAST(count(*) AS HUGEINT) AS k FROM st),
rr AS (SELECT f, CAST(sum(c) AS HUGEINT) AS r FROM tr GROUP BY 1),
ed AS (SELECT tr.f, tr.t, tr.c, rr.r FROM tr JOIN rr USING (f)
       UNION ALL
       SELECT d.s, s2.s, CAST(1 AS HUGEINT), kk.k
       FROM st d CROSS JOIN st s2 CROSS JOIN kk
       WHERE d.s NOT IN (SELECT f FROM tr)),
pi AS (
  SELECT 0 AS it, s,
         (SELECT CAST(1000000000000 AS HUGEINT) // k FROM kk) AS v
  FROM st
  UNION ALL
  SELECT it + 1, e.t, CAST(sum((pi.v * e.c) // e.r) AS HUGEINT)
  FROM pi JOIN ed e ON e.f = pi.s
  WHERE it < 25 GROUP BY 1, 2)
SELECT s AS event_type, CAST(v AS BIGINT) AS pi_scaled,
       round(CAST(v AS DOUBLE) / 1000000000000.0, 6) AS stationary_p
FROM pi WHERE it = 25 ORDER BY 1"""


def event_followups(sf_dir: str, probe_type: str = "view",
                    follow_type: str = "purchase",
                    window_s: int = 7 * 86400, n_parts: int = 64):
    """Temporal range-COUNT join — for every ``probe_type`` event, how
    many same-user ``follow_type`` events land in the FOLLOWING window
    ``(ts, ts + window_s]``.  Output: (event_id, user_id, n_follow),
    n_follow = 0 kept (LEFT-join semantics).  The bounded-window sibling
    of events_asof: as-of retrieves the nearest predecessor; this counts
    successors inside a range — the attribution/conversion-window shape
    (views -> purchases within 7 days).

    Exactness: both bounds are pure int64-microsecond comparisons (no
    arithmetic beyond ts + window, exact in int64), so ties behave
    bit-identically to the SQL ``b.ts > a.ts AND b.ts <= a.ts +
    INTERVAL``.  NULL user/ts rows are unattributable and drop on both
    engines (probe side via WHERE; follow side via the join predicate).

    Scale shape: ONE user-hash co-partition of only the two event types
    involved (the filter runs before the shuffle), then a single merged
    scan per partition: probes contribute two boundary records (t and
    t + window), one lexsort over (user, ts, kind) with follows ordered
    before boundaries at equal ts, and a user-segment-clamped cumulative
    count gives #follows <= X for every boundary — n_follow =
    F(t + window) - F(t).  Fully vectorized; windows never cross
    partitions because users don't.
    """
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "user_id", "event_type"])

    def add_part(batch: pa.Table) -> pa.Table:
        batch = _drop_null_users(_drop_null_ts(
            batch.replace_schema_metadata(None)))
        keep = pc.is_in(batch["event_type"],
                        value_set=pa.array([probe_type, follow_type]))
        batch = batch.filter(pc.fill_null(keep, False))
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array((uid % n_parts).astype(np.int32)))

    win_us = np.int64(window_s) * np.int64(1_000_000)

    def count_follow(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "event_id": pd.Series(dtype=np.int64),
            "user_id": pd.Series(dtype=np.int64),
            "n_follow": pd.Series(dtype=np.int64),
        })
        if len(df) == 0:
            return empty
        et = df["event_type"].to_numpy()
        uid = df["user_id"].to_numpy().astype(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        is_probe = et == probe_type
        is_follow = et == follow_type
        pu, pt = uid[is_probe], ts[is_probe]
        pid = df["event_id"].to_numpy().astype(np.int64)[is_probe]
        if len(pu) == 0:
            return empty
        fu, ft = uid[is_follow], ts[is_follow]
        # merged scan: follows (kind 0) + two boundary records per probe
        # (kind 1); at equal (user, ts) follows sort FIRST, so the
        # cumulative count at a boundary is F(X) = #follows with ts <= X.
        # n = F(t+w) - F(t) then includes ties at t+w (SQL's <=) and
        # excludes ties at t (SQL's b.ts > a.ts).
        n_p = len(pu)
        u = np.concatenate([fu, pu, pu])
        x = np.concatenate([ft, pt, pt + win_us])
        kind = np.concatenate([np.zeros(len(fu), dtype=np.int8),
                               np.ones(2 * n_p, dtype=np.int8)])
        # boundary i < n_p is the probe's lower bound (sign -1),
        # i >= n_p its upper bound (sign +1)
        order = np.lexsort((kind, x, u))
        u_s, kind_s = u[order], kind[order]
        cum = np.cumsum(kind_s == 0)                 # follows so far
        new_u = np.concatenate([[True], u_s[1:] != u_s[:-1]])
        seg_start = np.flatnonzero(new_u)
        base_at_start = np.where(seg_start > 0, cum[seg_start - 1], 0)
        base = np.repeat(base_at_start, np.diff(
            np.concatenate([seg_start, [len(u_s)]])))
        count_le = cum - base                        # per-user F(X)
        # scatter boundary counts back to their probe
        bnd_pos = np.flatnonzero(kind_s == 1)
        bnd_idx = order[bnd_pos] - len(fu)           # 0..2*n_p-1
        f_at = np.zeros(2 * n_p, dtype=np.int64)
        f_at[bnd_idx] = count_le[bnd_pos]
        n_follow = f_at[n_p:] - f_at[:n_p]
        return pd.DataFrame({"event_id": pid, "user_id": pu,
                             "n_follow": n_follow})

    return (ds.map_batches(add_part, batch_format="pyarrow",
                           batch_size=None)
            .groupby("part")
            .map_groups(count_follow, batch_format="pandas"))


def event_followups_sql(probe_type: str = "view",
                        follow_type: str = "purchase",
                        window_s: int = 7 * 86400) -> str:
    return f"""
SELECT a.event_id, a.user_id, CAST(count(b.event_id) AS BIGINT) AS n_follow
FROM events a
LEFT JOIN events b
  ON b.user_id = a.user_id AND b.event_type = '{follow_type}'
 AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL {int(window_s)} SECOND
WHERE a.event_type = '{probe_type}'
  AND a.user_id IS NOT NULL AND a.ts IS NOT NULL
GROUP BY 1, 2"""


def event_cooccurrence(sf_dir: str):
    """Market-basket association mining over users: for every unordered
    pair of event types with at least one common user, the exact
    co-occurrence lift

        lift(a, b) = P(a & b) / (P(a) * P(b))
                   = (n_both * n_users) / (n_a * n_b)

    over the DISTINCT-user sets.  Output: (type_a, type_b, n_a, n_b,
    n_both, lift) with type_a < type_b; NULL user_id / event_type rows
    are unattributable and ignored on both engines.

    Scale shape: the event-type vocabulary (K types) is computed by one
    column-pruned streaming aggregate and broadcast; the corpus then
    reduces through (1) a distinct-(user, type) shuffle (two-column key —
    packing user*K+code would wrap int64 for ids near 2^63/K — with
    per-batch pre-distinct), (2) a user-keyed Sum of type BITS — exact
    OR, because after the distinct each (user, type) contributes its bit
    exactly once — and (3) a mask-histogram Sum groupby bounded by 2^K
    rows.  The lift combine
    runs over that <= 2^K-row table in one task with arbitrary-precision
    ints (n_both * n_users ~ 1e20 at web scale would wrap int64), then
    ONE float division in the oracle's op order per pair.

    The bitmask stage needs every type code to fit an int64 mask, so the
    vocabulary is capped at 62 types (bit 63 would wrap the signed Sum;
    62 leaves headroom for the sign bit and keeps the mask histogram at
    most 2^62 keys in principle, in practice #distinct user baskets).
    Beyond that the distinct-(user, type) table should feed the generic
    pair self-join instead — raising beats silently corrupting masks.
    """
    from ray.data.aggregate import Count, Sum

    from .text import round_half_away

    # vocabulary pass: column-pruned, aggregates to K rows
    vocab_ds = (read_table(sf_dir, "events", columns=["event_type"])
                .map_batches(lambda b: _drop_null_users(b, "event_type"),
                             batch_format="pyarrow", batch_size=None)
                .groupby("event_type").aggregate(Count()))
    vocab = sorted(r["event_type"] for r in vocab_ds.take_all())
    k = len(vocab)
    if k > 62:
        raise ValueError(
            f"event_cooccurrence: {k} distinct event types exceed the "
            "62-bit int64 mask budget (bit 63 would wrap the signed Sum "
            "and silently corrupt per-user masks); route the distinct "
            "(user, type) table through the generic pair self-join "
            "instead")
    varr = np.array(vocab, dtype=object)

    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        batch = _drop_null_users(_drop_null_users(batch), "event_type")
        empty = pa.table({"user_id": pa.array([], type=pa.int64()),
                          "c": pa.array([], type=pa.int64())})
        if not len(batch):
            return empty
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        c = np.searchsorted(varr, t).astype(np.int64)
        # in-batch distinct without packing: lexsort + boundary scan
        order = np.lexsort((c, uid))
        uid, c = uid[order], c[order]
        first = np.concatenate(
            [[True], (uid[1:] != uid[:-1]) | (c[1:] != c[:-1])])
        return pa.table({"user_id": pa.array(uid[first]),
                         "c": pa.array(c[first])})

    distinct = (ds.map_batches(pair_partial, batch_format="pyarrow",
                               batch_size=None)
                .groupby(["user_id", "c"]).aggregate(Count()))

    def to_bits(batch: pa.Table) -> pa.Table:
        c = batch["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "user_id": batch["user_id"],
            "bit": pa.array((np.int64(1) << c).astype(np.int64)),
        })

    masks = (distinct.map_batches(to_bits, batch_format="pyarrow",
                                  batch_size=None)
             .groupby("user_id").aggregate(Sum("bit", alias_name="mask")))

    def mask_hist(batch: pa.Table) -> pa.Table:
        m = batch["mask"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(m, return_counts=True)
        return pa.table({"mask": pa.array(u),
                         "mn": pa.array(c.astype(np.int64))})

    hist = (masks.map_batches(mask_hist, batch_format="pyarrow",
                              batch_size=None)
            .groupby("mask").aggregate(Sum("mn", alias_name="n")))

    def lift(batch: pa.Table) -> pa.Table:
        m = batch["mask"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_users = int(n.sum())
        has = [((m >> a) & 1).astype(bool) for a in range(k)]
        per_type = [int(n[has[a]].sum()) for a in range(k)]
        ta, tb, na, nb, nboth, lf = [], [], [], [], [], []
        for a in range(k):
            for b in range(a + 1, k):
                both = int(n[has[a] & has[b]].sum())
                if both == 0:
                    continue
                ta.append(vocab[a])
                tb.append(vocab[b])
                na.append(per_type[a])
                nb.append(per_type[b])
                nboth.append(both)
                lf.append(float(round_half_away(np.float64(
                    float(both * n_users)
                    / float(per_type[a] * per_type[b])))))
        return pa.table({
            "type_a": pa.array(ta, type=pa.string()),
            "type_b": pa.array(tb, type=pa.string()),
            "n_a": pa.array(na, type=pa.int64()),
            "n_b": pa.array(nb, type=pa.int64()),
            "n_both": pa.array(nboth, type=pa.int64()),
            "lift": pa.array(lf, type=pa.float64()),
        })

    return hist.repartition(1).map_batches(lift, batch_format="pyarrow",
                                           batch_size=None)


def session_entry_exit(sf_dir: str, gap_s: int = 1800, n_parts: int = 64):
    """Entry/exit-page analysis — the bounce-rate primitive of web
    analytics: sessionize each user's stream (same gap rule as
    :func:`user_sessions`), label every session with its FIRST and LAST
    event type (total order (ts_seconds, event_id), so second-level ties
    are deterministic), and aggregate to the K x K entry/exit matrix with
    bounce counts (single-event sessions).  Output: (entry_type,
    exit_type, n_sessions, n_bounce, bounce_rate).

    NULL user/ts/event_type rows are unattributable and ignored (house
    contract).  Scale shape: users hash-co-partition (user % n_parts);
    each partition sessionizes vectorized and emits only its
    <= K*K*2-row partial counts, so the second shuffle is
    vocabulary-bounded; bounce_rate is ONE float division per pair in
    the oracle's CAST-then-divide op order.
    """
    import ray.data

    from .text import round_half_away

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"])

    def add_part(batch: pa.Table) -> pa.Table:
        batch = _drop_null_ts(_drop_null_users(
            batch.replace_schema_metadata(None)))
        batch = _drop_null_users(batch, "event_type")
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array((uid % n_parts).astype(np.int32)))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "entry_type": pd.Series(dtype=object),
            "exit_type": pd.Series(dtype=object),
            "ns": pd.Series(dtype=np.int64),
            "nb": pd.Series(dtype=np.int64),
        })
        if len(df) == 0:
            return empty
        # order by SECOND-truncated ts (+ event_id tiebreak) — the oracle
        # windows order by (es, event_id), so sorting on microsecond ts
        # would diverge for same-second events
        df = df.assign(_es=df["ts"].to_numpy().astype("datetime64[s]")
                       .astype(np.int64))
        df = df.sort_values(["user_id", "_es", "event_id"],
                            kind="stable").reset_index(drop=True)
        ts_s = df["_es"].to_numpy()
        uid = df["user_id"].to_numpy()
        new_user = np.concatenate([[True], uid[1:] != uid[:-1]])
        gap = np.concatenate([[0], ts_s[1:] - ts_s[:-1]])
        is_new = new_user | (gap > gap_s)
        starts = np.flatnonzero(is_new)
        ends = np.concatenate([starts[1:] - 1, [len(df) - 1]])
        et = df["event_type"].to_numpy()
        entry, exit_ = et[starts], et[ends]
        bounce = (ends == starts)
        g = pd.DataFrame({"entry_type": entry, "exit_type": exit_,
                          "b": bounce.astype(np.int64)})
        out = (g.groupby(["entry_type", "exit_type"], sort=False)
               .agg(ns=("b", "size"), nb=("b", "sum")).reset_index())
        out["ns"] = out["ns"].astype(np.int64)
        out["nb"] = out["nb"].astype(np.int64)
        return out

    from ray.data.aggregate import Sum

    agg = (ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
           .groupby("part").map_groups(partial, batch_format="pandas")
           .groupby(["entry_type", "exit_type"])
           .aggregate(Sum("ns", alias_name="n_sessions"),
                      Sum("nb", alias_name="n_bounce")))

    def finish(batch: pa.Table) -> pa.Table:
        ns = batch["n_sessions"].to_numpy(zero_copy_only=False)
        nb = batch["n_bounce"].to_numpy(zero_copy_only=False)
        return pa.table({
            "entry_type": batch["entry_type"],
            "exit_type": batch["exit_type"],
            "n_sessions": pa.array(ns.astype(np.int64)),
            "n_bounce": pa.array(nb.astype(np.int64)),
            "bounce_rate": pa.array(round_half_away(
                nb.astype(np.float64) / ns.astype(np.float64))),
        })

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


SESSION_ENTRY_EXIT_SQL = """
WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
                  event_id, event_type
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
             AND event_type IS NOT NULL),
x AS (SELECT user_id, es, event_id, event_type,
      CASE WHEN lag(es) OVER w IS NULL OR es - lag(es) OVER w > 1800
           THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
s AS (SELECT user_id, event_type, es, event_id,
      sum(is_new) OVER (PARTITION BY user_id ORDER BY es, event_id
                        ROWS UNBOUNDED PRECEDING) AS sess FROM x),
g AS (SELECT user_id, sess,
      first(event_type ORDER BY es, event_id) AS entry_type,
      last(event_type ORDER BY es, event_id) AS exit_type,
      count(*) AS n FROM s GROUP BY 1, 2)
SELECT entry_type, exit_type, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(count(*) FILTER (WHERE n = 1) AS BIGINT) AS n_bounce,
       round(CAST(count(*) FILTER (WHERE n = 1) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS bounce_rate
FROM g GROUP BY 1, 2"""


def profile_table(sf_dir: str, table: str = "documents"):
    """ANALYZE-style per-column data profile — the data-quality audit
    primitive: one row per column with (column, n_rows, n_nulls,
    n_distinct, min_v, max_v), every value profiled through its VARCHAR
    image.  Arrow's int64->string cast renders exactly like SQL's
    CAST(col AS VARCHAR), and python/Arrow codepoint-lexicographic string
    order equals DuckDB's UTF-8 byte order because UTF-8 preserves
    codepoint order — so min/max agree byte-for-byte.

    Scale shape: ONE corpus scan.  Each batch emits its distinct
    (column, value) rows (kind=0) AND one per-column row/null-count row
    (kind=1, val='') into the SAME (kind, column, value) shuffle —
    Sum over the zero-weights dedupes the value rows while the count
    rows sum to the exact totals, so n_rows/n_nulls ride the distinct
    shuffle for free instead of re-reading the table.  Per-block
    partials then collapse to a column-bounded (Sum, Min, Max) groupby
    — post-aggregate keys are globally unique, so summing per-block
    distinct counts is exact.  Profiling a long-text column exactly
    shuffles its distinct values (the same cost the SQL
    count(DISTINCT text) pays); at 100 TB swap that column's path to
    the fingerprint poly-hash or the in-repo HLL.
    Returns a small pandas DataFrame (n_columns rows).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    ds = read_table(sf_dir, table)
    schema = ds.schema()
    cols = list(schema.names)

    def as_str(arr: pa.ChunkedArray) -> pa.Array:
        a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        if pa.types.is_string(a.type) or pa.types.is_large_string(a.type):
            return a
        return pc.cast(a, pa.string())

    def partial(batch: pa.Table) -> pa.Table:
        outs_c, outs_v = [], []
        for c in cols:
            v = as_str(batch[c])
            v = v.filter(pc.is_valid(v))
            u = pc.unique(v)
            outs_c.append(pa.array([c] * len(u), type=pa.string()))
            outs_v.append(u)
        nvals = sum(len(x) for x in outs_v)
        # kind=1 count rows: one per column per batch (val='' cannot
        # collide with a real empty-string value row because kind differs)
        outs_c.append(pa.array(cols, type=pa.string()))
        outs_v.append(pa.array([""] * len(cols), type=pa.string()))
        return pa.table({
            "kind": pa.array([0] * nvals + [1] * len(cols),
                             type=pa.int64()),
            "col": pa.concat_arrays(outs_c),
            "val": pa.concat_arrays([x.cast(pa.string()) for x in outs_v]),
            "nr": pa.array([0] * nvals + [len(batch)] * len(cols),
                           type=pa.int64()),
            "nn": pa.array([0] * nvals + [batch[c].null_count
                                          for c in cols], type=pa.int64()),
        })

    def block_stats(batch: pa.Table) -> pa.Table:
        # post-aggregate (kind, col, val) keys are globally unique ->
        # per-block distinct counts sum exactly; kind=1 rows pass their
        # exact row/null totals through with null min/max (ignored by
        # the final Min/Max aggregates)
        empty = pa.table({
            "col": pa.array([], type=pa.string()),
            "nd": pa.array([], type=pa.int64()),
            "mn": pa.array([], type=pa.string()),
            "mx": pa.array([], type=pa.string()),
            "nr": pa.array([], type=pa.int64()),
            "nn": pa.array([], type=pa.int64()),
        })
        if not len(batch):
            return empty
        kind = batch["kind"].to_numpy(zero_copy_only=False)
        vals = batch.filter(pa.array(kind == 0))
        cnts = batch.filter(pa.array(kind == 1))
        parts = []
        if len(vals):
            c = np.asarray(vals["col"].to_pylist(), dtype=object)
            v = np.asarray(vals["val"].to_pylist(), dtype=object)
            order = np.argsort(c, kind="stable")
            c, v = c[order], v[order]
            starts = np.concatenate(
                [[0], np.flatnonzero(c[1:] != c[:-1]) + 1])
            ends = np.concatenate([starts[1:], [len(c)]])
            parts.append(pa.table({
                "col": pa.array(c[starts], type=pa.string()),
                "nd": pa.array((ends - starts).astype(np.int64)),
                "mn": pa.array([min(v[s:e].tolist()) for s, e in
                                zip(starts, ends)], type=pa.string()),
                "mx": pa.array([max(v[s:e].tolist()) for s, e in
                                zip(starts, ends)], type=pa.string()),
                "nr": pa.array(np.zeros(len(starts), dtype=np.int64)),
                "nn": pa.array(np.zeros(len(starts), dtype=np.int64)),
            }))
        if len(cnts):
            nonefield = pa.array([None] * len(cnts), type=pa.string())
            parts.append(pa.table({
                "col": cnts["col"],
                "nd": pa.array(np.zeros(len(cnts), dtype=np.int64)),
                "mn": nonefield,
                "mx": nonefield,
                "nr": cnts["nr"],
                "nn": cnts["nn"],
            }))
        return pa.concat_tables(parts) if parts else empty

    prof = (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
            .groupby(["kind", "col", "val"])
            .aggregate(Sum("nr", alias_name="nr"),
                       Sum("nn", alias_name="nn"))
            .map_batches(block_stats, batch_format="pyarrow",
                         batch_size=None)
            .groupby("col")
            .aggregate(Sum("nr", alias_name="n_rows"),
                       Sum("nn", alias_name="n_nulls"),
                       Sum("nd", alias_name="n_distinct"),
                       Min("mn", alias_name="min_v"),
                       Max("mx", alias_name="max_v")))

    out = prof.to_pandas().rename(columns={"col": "column"})
    out["n_distinct"] = out["n_distinct"].fillna(0).astype(np.int64)
    out["n_rows"] = out["n_rows"].astype(np.int64)
    out["n_nulls"] = out["n_nulls"].astype(np.int64)
    out = out.sort_values("column", kind="stable").reset_index(drop=True)
    return out[["column", "n_rows", "n_nulls", "n_distinct",
                "min_v", "max_v"]]


def profile_table_sql(table: str = "documents",
                      cols: tuple = ("doc_id", "text", "lang", "source",
                                     "n_chars")) -> str:
    """Oracle: one UNION ALL leg per column over the VARCHAR image."""
    legs = []
    for c in cols:
        legs.append(
            f"SELECT '{c}' AS column, CAST(count(*) AS BIGINT) AS n_rows, "
            f"CAST(count(*) - count({c}) AS BIGINT) AS n_nulls, "
            f"CAST(count(DISTINCT CAST({c} AS VARCHAR)) AS BIGINT) "
            f"AS n_distinct, "
            f"min(CAST({c} AS VARCHAR)) AS min_v, "
            f"max(CAST({c} AS VARCHAR)) AS max_v FROM {table}")
    return " UNION ALL ".join(legs)


def source_drift_psi(sf_dir: str, src_a: str = "src0", src_b: str = "src1",
                     width: int = 50, max_bucket: int = 19):
    """Population Stability Index between two sources' n_chars
    distributions — the standard data-drift monitor for ingest pipelines:
    PSI = sum_b (p_b - q_b) * ln(p_b / q_b) over fixed-width buckets
    b = min(n_chars // width, max_bucket).  Output: ONE row
    (n_common, n_only_a, n_only_b, psi) where psi folds over buckets
    present in BOTH sources (the standard zero-bucket exclusion, with the
    excluded bucket counts reported alongside); proportions use each
    source's full total.  PSI > 0.25 conventionally flags drift.

    Exactness: bucket counts are exact integers (vocabulary-bounded
    shuffle: buckets x 2 per batch); the float fold is ORDER-PINNED to
    ascending bucket with each element evaluated in the oracle's exact
    op order (p and q as CAST/CAST divisions, (p - q) * ln(p / q)).
    NULL n_chars rows are ignored on both engines.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .text import round_half_away

    ds = read_table(sf_dir, "documents", columns=["n_chars", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        valid = pc.and_(pc.is_valid(batch["n_chars"]),
                        pc.is_valid(batch["source"]))
        batch = batch.filter(pc.and_(valid, pc.fill_null(pc.is_in(
            batch["source"], value_set=pa.array([src_a, src_b])), False)))
        if not len(batch):
            return pa.table({"b": pa.array([], type=pa.int64()),
                             "ca": pa.array([], type=pa.int64()),
                             "cb": pa.array([], type=pa.int64())})
        nc = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.minimum(nc // width, max_bucket)
        is_a = pc.equal(batch["source"], src_a).to_numpy(
            zero_copy_only=False)
        u = np.unique(b)
        ca = np.array([int(((b == x) & is_a).sum()) for x in u],
                      dtype=np.int64)
        cb = np.array([int(((b == x) & ~is_a).sum()) for x in u],
                      dtype=np.int64)
        return pa.table({"b": pa.array(u), "ca": pa.array(ca),
                         "cb": pa.array(cb)})

    agg = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
           .groupby("b").aggregate(Sum("ca", alias_name="ca"),
                                   Sum("cb", alias_name="cb")))

    def fold(batch: pa.Table) -> pa.Table:
        import math

        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        ca = batch["ca"].to_numpy(zero_copy_only=False).astype(np.int64)
        cb = batch["cb"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(b)
        ca, cb = ca[order], cb[order]
        ta, tb = int(ca.sum()), int(cb.sum())
        common = (ca > 0) & (cb > 0)
        psi = None
        if ta > 0 and tb > 0 and common.any():
            s = 0.0
            for x, y in zip(ca[common].tolist(), cb[common].tolist()):
                p = float(x) / float(ta)
                q = float(y) / float(tb)
                s += (p - q) * math.log(p / q)
            psi = float(round_half_away(np.float64(s)))
        return pa.table({
            "n_common": pa.array([int(common.sum())], type=pa.int64()),
            "n_only_a": pa.array([int(((ca > 0) & (cb == 0)).sum())],
                                 type=pa.int64()),
            "n_only_b": pa.array([int(((ca == 0) & (cb > 0)).sum())],
                                 type=pa.int64()),
            "psi": pa.array([psi], type=pa.float64()),
        })

    return agg.repartition(1).map_batches(fold, batch_format="pyarrow",
                                          batch_size=None)


def source_drift_psi_sql(src_a: str = "src0", src_b: str = "src1",
                         width: int = 50, max_bucket: int = 19) -> str:
    """Oracle: order-pinned list_reduce fold over common buckets."""
    pa_ = "CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE)"
    pb_ = "CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE)"
    return f"""
WITH d AS (SELECT least(n_chars // {width}, {max_bucket}) AS b, source
           FROM documents WHERE n_chars IS NOT NULL
             AND source IN ('{src_a}', '{src_b}')),
c AS (SELECT b,
      CAST(count(*) FILTER (WHERE source = '{src_a}') AS BIGINT) AS ca,
      CAST(count(*) FILTER (WHERE source = '{src_b}') AS BIGINT) AS cb
      FROM d GROUP BY b),
t AS (SELECT CAST(coalesce(sum(ca), 0) AS BIGINT) AS ta,
             CAST(coalesce(sum(cb), 0) AS BIGINT) AS tb FROM c),
e AS (SELECT b, ca, cb,
      CASE WHEN ca > 0 AND cb > 0
           THEN ({pa_} - {pb_}) * ln(({pa_}) / ({pb_}))
           ELSE NULL END AS el
      FROM c CROSS JOIN t)
SELECT CAST(count(*) FILTER (WHERE ca > 0 AND cb > 0) AS BIGINT)
         AS n_common,
       CAST(count(*) FILTER (WHERE ca > 0 AND cb = 0) AS BIGINT)
         AS n_only_a,
       CAST(count(*) FILTER (WHERE ca = 0 AND cb > 0) AS BIGINT)
         AS n_only_b,
       CASE WHEN count(*) FILTER (WHERE ca > 0 AND cb > 0) = 0 THEN NULL
            ELSE round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(el ORDER BY b) FILTER (WHERE ca > 0 AND cb > 0)),
                 (x, y) -> x + y), 6) END AS psi
FROM e"""


def domain_gini(sf_dir: str):
    """Gini coefficient of page counts across source domains — the
    inequality summary of the crawl ("is the corpus dominated by a few
    sites?").  ONE row (n_groups, total, gini) with the sorted-values
    formula G = (2 * sum_i i*x_(i) - (n+1) * sum_i x_i) / (n * sum_i x_i)
    over ascending counts (1-based ranks; equal values make rank
    assignment irrelevant to the sum, so ties need no tiebreak).

    Exactness: the rank-weighted moments are exact Python big ints over
    the vocabulary-bounded count table (i*x ~ n*corpus would overflow
    int64 at scale), then ONE CAST-to-DOUBLE division like the oracle.
    """
    from ray.data.aggregate import Sum

    from .text import round_half_away

    ds = read_table(sf_dir, "documents", columns=["source"])

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = batch["source"]
        s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        s = s.filter(pc.is_valid(s))   # NULL source rows excluded (oracle
        vc = s.value_counts()          # mirrors with IS NOT NULL)
        return pa.table({
            "source": vc.field("values").cast(pa.string()),
            "x": vc.field("counts").cast(pa.int64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
           .groupby("source").aggregate(Sum("x", alias_name="x")))

    def fold(batch: pa.Table) -> pa.Table:
        x = np.sort(batch["x"].to_numpy(zero_copy_only=False)
                    .astype(np.int64))
        n = len(x)
        s1 = s2 = 0
        for i, v in enumerate(x.tolist(), start=1):
            s1 += v
            s2 += i * v
        den = n * s1
        gini = (None if den == 0 else float(round_half_away(np.float64(
            float(2 * s2 - (n + 1) * s1) / float(den)))))
        return pa.table({
            "n_groups": pa.array([n], type=pa.int64()),
            "total": pa.array([s1], type=pa.int64()),
            "gini": pa.array([gini], type=pa.float64()),
        })

    return agg.repartition(1).map_batches(fold, batch_format="pyarrow",
                                          batch_size=None)


DOMAIN_GINI_SQL = """
WITH c AS (SELECT source, count(*) AS x FROM documents
           WHERE source IS NOT NULL GROUP BY 1),
r AS (SELECT x, row_number() OVER (ORDER BY x) AS i FROM c),
m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(coalesce(sum(x), 0) AS HUGEINT) AS s1,
             CAST(coalesce(sum(CAST(i AS HUGEINT) * x), 0) AS HUGEINT)
               AS s2 FROM r)
SELECT CAST(n AS BIGINT) AS n_groups, CAST(s1 AS BIGINT) AS total,
       CASE WHEN n * s1 = 0 THEN NULL ELSE
         round(CAST(2 * s2 - (n + 1) * s1 AS DOUBLE)
               / CAST(n * s1 AS DOUBLE), 6) END AS gini
FROM m"""


def chi2_lang_source(sf_dir: str):
    """Pearson chi-square test of independence between the lang and
    source columns — "is language mix independent of which site we
    crawled?", the categorical-association audit.  ONE row (n_rows,
    n_cells, dof, chi2) over the FULL lang x source cross product
    (zero-count cells included, per the classic statistic).

    Exactness: each cell's term (O - E)^2 / E is rewritten over exact
    integers as (O*T - R*C)^2 / (T*R*C), computed in Python big ints
    (the numerator ~ T^4 wraps int64 beyond ~55k rows; the HUGEINT
    oracle holds to T < 3.6e9 rows — far above any oracle scale), then
    ONE float division per cell and an ORDER-PINNED fold ascending
    (lang, source).  NULL lang/source rows are excluded on both engines.
    """
    import math

    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .text import round_half_away

    ds = read_table(sf_dir, "documents", columns=["lang", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.is_valid(batch["lang"]),
                                     pc.is_valid(batch["source"])))
        if not len(batch):
            return pa.table({"lang": pa.array([], type=pa.string()),
                             "source": pa.array([], type=pa.string()),
                             "o": pa.array([], type=pa.int64())})
        cl, ul = _dict_codes(batch["lang"])
        cs, us = _dict_codes(batch["source"])
        packed = cl * len(us) + cs
        u, c = np.unique(packed, return_counts=True)
        return pa.table({
            "lang": pa.array([ul[int(p) // len(us)] for p in u],
                             type=pa.string()),
            "source": pa.array([us[int(p) % len(us)] for p in u],
                               type=pa.string()),
            "o": pa.array(c.astype(np.int64)),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
           .groupby(["lang", "source"]).aggregate(Sum("o", alias_name="o")))

    def fold(batch: pa.Table) -> pa.Table:
        lang = batch["lang"].to_pylist()
        src = batch["source"].to_pylist()
        o = batch["o"].to_numpy(zero_copy_only=False).astype(np.int64)
        obs = {(a, b): int(x) for a, b, x in zip(lang, src, o.tolist())}
        langs = sorted(set(lang))
        srcs = sorted(set(src))
        rr = {a: sum(v for (x, _), v in obs.items() if x == a)
              for a in langs}
        cc = {b: sum(v for (_, y), v in obs.items() if y == b)
              for b in srcs}
        t = sum(obs.values())
        chi2 = None
        if t > 0:
            s = 0.0
            for a in langs:                      # ascending (lang, source)
                for b in srcs:
                    oo = obs.get((a, b), 0)
                    num = (oo * t - rr[a] * cc[b]) ** 2
                    den = t * rr[a] * cc[b]
                    s += float(num) / float(den)
            chi2 = float(round_half_away(np.float64(s)))
        return pa.table({
            "n_rows": pa.array([t], type=pa.int64()),
            "n_cells": pa.array([len(langs) * len(srcs)], type=pa.int64()),
            "dof": pa.array([(len(langs) - 1) * (len(srcs) - 1)],
                            type=pa.int64()),
            "chi2": pa.array([chi2], type=pa.float64()),
        })

    return agg.repartition(1).map_batches(fold, batch_format="pyarrow",
                                          batch_size=None)


CHI2_LANG_SOURCE_SQL = """
WITH d AS (SELECT lang, source FROM documents
           WHERE lang IS NOT NULL AND source IS NOT NULL),
o AS (SELECT lang, source, CAST(count(*) AS HUGEINT) AS o
      FROM d GROUP BY 1, 2),
r AS (SELECT lang, CAST(count(*) AS HUGEINT) AS rr FROM d GROUP BY 1),
c AS (SELECT source, CAST(count(*) AS HUGEINT) AS cc FROM d GROUP BY 1),
t AS (SELECT CAST(count(*) AS HUGEINT) AS tt FROM d),
cells AS (SELECT r.lang, c.source,
                 coalesce(o.o, CAST(0 AS HUGEINT)) AS o, r.rr, c.cc, t.tt
          FROM r CROSS JOIN c CROSS JOIN t
          LEFT JOIN o ON o.lang = r.lang AND o.source = c.source),
e AS (SELECT lang, source,
      CAST((o * tt - rr * cc) * (o * tt - rr * cc) AS DOUBLE)
      / CAST(tt * rr * cc AS DOUBLE) AS term FROM cells)
SELECT coalesce((SELECT CAST(tt AS BIGINT) FROM t), 0) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(((SELECT count(*) FROM r) - 1)
            * ((SELECT count(*) FROM c) - 1) AS BIGINT) AS dof,
       CASE WHEN count(*) = 0 THEN NULL ELSE
         round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(term ORDER BY lang, source)), (x, y) -> x + y), 6)
       END AS chi2
FROM e"""


def zipf_slope(sf_dir: str, lower: bool = True):
    """Zipf's-law fit of the corpus vocabulary: least-squares slope (and
    intercept) of ln(frequency) against ln(rank) over the full
    rank-frequency curve — the classic "is this corpus natural text?"
    statistic (natural language slopes sit near -1).  ONE row (n_tokens,
    total_occurrences, slope, intercept).

    Exactness: token counts are exact integers from the vocabulary-sized
    shuffle (same partial as vocab_top_k); ranks are frequency-descending
    (equal-frequency rank assignment provably cancels out of every
    moment); the four regression moments are ORDER-PINNED sequential
    folds ascending rank, and the closed-form slope/intercept mirror the
    oracle's float expression exactly.
    """
    import math

    from ray.data.aggregate import Sum

    from .text import _string_array, _token_codes, round_half_away

    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        texts = _string_array(batch["text"])
        _, codes, uniques, _, _ = _token_codes(texts, lower=lower)
        cnt = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
        return pa.table({
            "token": pa.array(uniques.tolist(), type=pa.string()),
            "partial_n": pa.array(cnt),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
           .groupby("token").aggregate(Sum("partial_n", alias_name="n")))

    def fold(batch: pa.Table) -> pa.Table:
        n = np.sort(batch["n"].to_numpy(zero_copy_only=False)
                    .astype(np.int64))[::-1]           # frequency desc
        v = len(n)
        total = int(n.sum()) if v else 0
        slope = intercept = None
        if v:
            sx = sy = sxx = sxy = 0.0
            for i, f in enumerate(n.tolist(), start=1):  # ascending rank
                x = math.log(float(i))
                y = math.log(float(f))
                sx += x
                sy += y
                sxx += x * x
                sxy += x * y
            nf = float(v)
            den = nf * sxx - sx * sx
            if den != 0.0:
                sl = (nf * sxy - sx * sy) / den
                slope = float(round_half_away(np.float64(sl)))
                intercept = float(round_half_away(np.float64(
                    (sy - sl * sx) / nf)))
        return pa.table({
            "n_tokens": pa.array([v], type=pa.int64()),
            "total_occurrences": pa.array([total], type=pa.int64()),
            "slope": pa.array([slope], type=pa.float64()),
            "intercept": pa.array([intercept], type=pa.float64()),
        })

    return agg.repartition(1).map_batches(fold, batch_format="pyarrow",
                                          batch_size=None)


def zipf_slope_sql(lower: bool = True) -> str:
    """Oracle paired with :func:`zipf_slope` — parameterized on the same
    ``lower`` flag so gating ``zipf_slope(sf, lower=False)`` against it
    cannot silently diverge on a mixed-case corpus."""
    expr = "lower(text)" if lower else "text"
    return ZIPF_SLOPE_SQL.replace("lower(text)", expr)


ZIPF_SLOPE_SQL = r"""
WITH tok AS (SELECT unnest(list_filter(regexp_split_to_array(lower(text),
             '\s+'), x -> x <> '')) AS token FROM documents),
cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1),
r AS (SELECT n, row_number() OVER (ORDER BY n DESC, token) AS i FROM cnt),
m AS (SELECT CAST(count(*) AS BIGINT) AS v,
             CAST(coalesce(sum(n), 0) AS BIGINT) AS total,
             CAST(count(*) AS DOUBLE) AS nf,
  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
    list(ln(CAST(i AS DOUBLE)) ORDER BY i)), (x, y) -> x + y) AS sx,
  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
    list(ln(CAST(n AS DOUBLE)) ORDER BY i)), (x, y) -> x + y) AS sy,
  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
    list(ln(CAST(i AS DOUBLE)) * ln(CAST(i AS DOUBLE)) ORDER BY i)),
    (x, y) -> x + y) AS sxx,
  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
    list(ln(CAST(i AS DOUBLE)) * ln(CAST(n AS DOUBLE)) ORDER BY i)),
    (x, y) -> x + y) AS sxy
  FROM r)
SELECT v AS n_tokens, total AS total_occurrences,
       CASE WHEN v = 0 OR nf * sxx - sx * sx = 0.0 THEN NULL ELSE
         round((nf * sxy - sx * sy) / (nf * sxx - sx * sx), 6) END
         AS slope,
       CASE WHEN v = 0 OR nf * sxx - sx * sx = 0.0 THEN NULL ELSE
         round((sy - ((nf * sxy - sx * sy) / (nf * sxx - sx * sx)) * sx)
               / nf, 6) END AS intercept
FROM m"""


def user_burstiness(sf_dir: str, n_parts: int = 64):
    """Per-user burstiness coefficient of inter-event times — the
    Goh-Barabasi statistic B = (sigma - mu) / (sigma + mu) over a user's
    consecutive event gaps (B -> -1 regular/periodic, ~0 Poisson, -> +1
    bursty), the behavioral-temporal profile next to
    :func:`event_gaps`'s sum/min/max.  Output: (user_id, n_gaps,
    mean_gap_us, burstiness) for users with >= 1 gap; burstiness is NULL
    when sigma + mu == 0 (all gaps zero).

    Exactness: gap moments (n, Sx, Sxx) are exact integers — Sxx runs in
    Python big ints (object-dtype reduceat; gap_us^2 overflows int64 past
    ~3.5 days) mirroring the oracle's HUGEINT — then the float chain is
    evaluated in the oracle's exact op order: mu = CAST(Sx)/CAST(n),
    var = CAST(n*Sxx - Sx^2)/CAST(n^2), sigma = sqrt(var) (IEEE
    correctly-rounded on both engines), B = (sigma - mu)/(sigma + mu).
    The gap multiset of a sorted timestamp list is tie-order invariant
    (event_gaps precedent).  Same ONE-co-partition shape as event_gaps.
    """
    import ray.data

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def add_part(batch: pa.Table) -> pa.Table:
        batch = _drop_null_ts(_drop_null_users(batch))
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array((uid % n_parts).astype(np.int32)))

    def bursts(df: pd.DataFrame) -> pd.DataFrame:
        out_cols = ["user_id", "n_gaps", "mean_gap_us", "burstiness"]
        if len(df) == 0:
            return pd.DataFrame({
                "user_id": pd.Series(dtype=np.int64),
                "n_gaps": pd.Series(dtype=np.int64),
                "mean_gap_us": pd.Series(dtype=np.float64),
                "burstiness": pd.Series(dtype=np.float64),
            })[out_cols]
        df = df.sort_values(["user_id", "ts"]).reset_index(drop=True)
        t = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        uid = df["user_id"].to_numpy()
        same = np.concatenate([[False], uid[1:] == uid[:-1]])
        d = np.concatenate([[0], t[1:] - t[:-1]])
        gu, gd = uid[same], d[same]
        if not len(gu):
            return pd.DataFrame({
                "user_id": pd.Series(dtype=np.int64),
                "n_gaps": pd.Series(dtype=np.int64),
                "mean_gap_us": pd.Series(dtype=np.float64),
                "burstiness": pd.Series(dtype=np.float64),
            })[out_cols]
        starts = np.concatenate(
            [[0], np.flatnonzero(gu[1:] != gu[:-1]) + 1])
        users = gu[starts]
        n = np.diff(np.concatenate([starts, [len(gu)]])).astype(np.int64)
        sx = np.add.reduceat(gd, starts).astype(np.int64)
        # Sxx in Python big ints: gap_us^2 wraps int64 past ~3.5-day gaps
        gd_obj = gd.astype(object)
        sxx = np.add.reduceat(gd_obj * gd_obj, starts)
        mean = np.empty(len(users), dtype=np.float64)
        burst = []
        for i in range(len(users)):
            ni = int(n[i])
            sxi = int(sx[i])
            sxxi = int(sxx[i])
            mu = float(sxi) / float(ni)
            var = float(ni * sxxi - sxi * sxi) / float(ni * ni)
            sd = np.sqrt(var)
            den = sd + mu
            mean[i] = round_half_away(np.float64(mu), 6)
            # a real Arrow NULL, not a non-null NaN (SQL NULL parity)
            burst.append(None if den == 0.0 else float(
                round_half_away(np.float64((sd - mu) / den), 6)))
        return pd.DataFrame({
            "user_id": users.astype(np.int64),
            "n_gaps": n,
            "mean_gap_us": mean,
            "burstiness": pd.array(burst, dtype="Float64"),
        })[out_cols]

    return (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(bursts, batch_format="pandas")
        .map_batches(lambda b: b.select(["user_id", "n_gaps",
                                         "mean_gap_us", "burstiness"]),
                     batch_format="pyarrow", batch_size=None)
    )


USER_BURSTINESS_SQL = """
WITH g AS (SELECT user_id,
  CAST(epoch_us(ts) - lag(epoch_us(ts))
       OVER (PARTITION BY user_id ORDER BY ts) AS HUGEINT) AS d
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
m AS (SELECT user_id,
  CAST(count(d) AS HUGEINT) AS n,
  CAST(sum(d) AS HUGEINT) AS sx,
  CAST(sum(d * d) AS HUGEINT) AS sxx
  FROM g WHERE d IS NOT NULL GROUP BY 1)
SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
  round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_gap_us,
  CASE WHEN sqrt(CAST(n * sxx - sx * sx AS DOUBLE) / CAST(n * n AS DOUBLE))
            + CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) = 0.0 THEN NULL
  ELSE round(
    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE) / CAST(n * n AS DOUBLE))
     - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
    / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE) / CAST(n * n AS DOUBLE))
       + CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6) END AS burstiness
FROM m"""


def event_type_trend(sf_dir: str):
    """Per-event-type daily trend — the OLS slope of daily event counts
    over the corpus's full day range (zero days included), the standard
    'which activity is growing/shrinking' monitor.  Output: one row per
    type (event_type, n_days, n_events, slope) with slope in
    events/day; NULL slope when the range is a single day.

    Exactness: with x = day index over the FULL range [dmin, dmax], the
    x-moments are closed forms (Sx = m(m-1)/2, Sxx = (m-1)m(2m-1)/6) and
    zero-count days contribute nothing to Sy = n or
    Sxy = sum(day*cnt) - dmin*n — so ONE vocabulary-bounded shuffle
    (per-type Sum n / hi-lo-split Sum of the day-weighted moment — the
    corr_by_group wrap-free convention — / Min / Max day) yields every
    moment exactly in Python big ints (HUGEINT in SQL), then one
    CAST-then-divide float per type.  Day = epoch_us // 86400000000
    (the events_weekday_hour convention; assumes ts >= 1970 — numpy
    floor-div vs SQL truncation diverge on negative epochs).  NULL
    ts / NULL type rows drop on both engines.
    """
    from ray.data.aggregate import Max, Min, Sum

    from .text import round_half_away

    ds = read_table(sf_dir, "events", columns=["ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = _drop_null_ts(_drop_null_users(batch, "event_type"))
        empty = pa.table({
            "event_type": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
            "sd": pa.array([], type=pa.int64()),
            "dn": pa.array([], type=pa.int64()),
            "dx": pa.array([], type=pa.int64()),
        })
        if not len(batch):
            return empty
        t = batch["ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        day = t // 86400000000
        et = batch["event_type"].dictionary_encode().combine_chunks()
        codes = np.asarray(et.indices, dtype=np.int64)
        vocab = et.dictionary.to_pylist()
        k = len(vocab)
        n = np.bincount(codes, minlength=k).astype(np.int64)
        sd = np.zeros(k, dtype=np.int64)
        np.add.at(sd, codes, day)
        dmin = np.full(k, np.iinfo(np.int64).max, dtype=np.int64)
        dmax = np.full(k, np.iinfo(np.int64).min, dtype=np.int64)
        np.minimum.at(dmin, codes, day)
        np.maximum.at(dmax, codes, day)
        # cross-batch hi/lo split (corr_by_group convention): the Ray
        # Sum of raw per-batch sd would wrap int64 near 4.6e14 events;
        # split partials stay < 2^31 per batch per lane
        return pa.table({
            "event_type": pa.array(vocab, type=pa.string()),
            "n": pa.array(n),
            "sdh": pa.array(sd // (1 << 31)),
            "sdl": pa.array(sd % (1 << 31)),
            "dn": pa.array(dmin),
            "dx": pa.array(dmax),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None)
           .groupby("event_type")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("sdh", alias_name="sdh"),
                      Sum("sdl", alias_name="sdl"),
                      Min("dn", alias_name="dn"),
                      Max("dx", alias_name="dx")))

    def fold(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "event_type": pa.array([], type=pa.string()),
            "n_days": pa.array([], type=pa.int64()),
            "n_events": pa.array([], type=pa.int64()),
            "slope": pa.array([], type=pa.float64()),
        })
        if not len(batch):
            return empty
        et = batch["event_type"].to_pylist()
        n = [int(x) for x in
             batch["n"].to_numpy(zero_copy_only=False)]
        sd = [(int(h) << 31) + int(l) for h, l in
              zip(batch["sdh"].to_numpy(zero_copy_only=False),
                  batch["sdl"].to_numpy(zero_copy_only=False))]
        dmin = min(int(x) for x in
                   batch["dn"].to_numpy(zero_copy_only=False))
        dmax = max(int(x) for x in
                   batch["dx"].to_numpy(zero_copy_only=False))
        m = dmax - dmin + 1
        sx = m * (m - 1) // 2
        sxx = (m - 1) * m * (2 * m - 1) // 6
        den = m * sxx - sx * sx
        slopes = []
        for ni, sdi in zip(n, sd):
            sxy = sdi - dmin * ni
            slopes.append(None if den == 0 else float(round_half_away(
                np.float64(float(m * sxy - sx * ni) / float(den)), 9)))
        return pa.table({
            "event_type": pa.array(et, type=pa.string()),
            "n_days": pa.array([m] * len(et), type=pa.int64()),
            "n_events": pa.array(n, type=pa.int64()),
            "slope": pa.array(slopes, type=pa.float64()),
        })

    return agg.repartition(1).map_batches(fold, batch_format="pyarrow",
                                          batch_size=None)


EVENT_TYPE_TREND_SQL = """
WITH ev AS (SELECT event_type,
  CAST(epoch_us(ts) // 86400000000 AS HUGEINT) AS d
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
g AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(d) AS HUGEINT) AS sd FROM ev GROUP BY 1),
mm AS (SELECT CAST(min(d) AS HUGEINT) AS dmin,
              CAST(max(d) AS HUGEINT) AS dmax,
              CAST(max(d) - min(d) + 1 AS HUGEINT) AS m FROM ev),
c AS (SELECT m, dmin, m * (m - 1) // 2 AS sx,
             (m - 1) * m * (2 * m - 1) // 6 AS sxx FROM mm)
SELECT g.event_type, CAST(c.m AS BIGINT) AS n_days,
       CAST(g.n AS BIGINT) AS n_events,
       CASE WHEN c.m * c.sxx - c.sx * c.sx = 0 THEN NULL ELSE
         round(CAST(c.m * (g.sd - c.dmin * g.n) - c.sx * g.n AS DOUBLE)
               / CAST(c.m * c.sxx - c.sx * c.sx AS DOUBLE), 9) END
         AS slope
FROM g CROSS JOIN c"""


def value_histogram(sf_dir: str, width: float = 25.0, n_bins: int = 20):
    """Equal-width histogram of the events value column — one row per
    non-empty bin: (bin, n, value_cents).  ``bin`` = floor(value/width)
    clamped to [0, n_bins] (the last id is the overflow bucket); NULL
    values are dropped on both engines.

    The fundamental numeric binning operator: per-batch the bin id is
    ONE float division + floor (identical IEEE op on both engines —
    the division result is floored, never re-rounded), counts and exact
    cent sums come from two bincounts, and the only exchange is a
    (n_bins+1)-cardinality groupby of partials.
    """
    import ray.data
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "events", columns=["value"])

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = batch["value"]
        if v.null_count:
            v = pc.drop_null(v)
        v = v.to_numpy(zero_copy_only=False)
        b = np.clip(np.floor(v / np.float64(width)).astype(np.int64),
                    0, n_bins)
        cents = np.rint(v * 100.0).astype(np.int64)
        return pa.table({
            "bin": pa.array(np.arange(n_bins + 1, dtype=np.int64)),
            "pn": pa.array(np.bincount(b, minlength=n_bins + 1)
                           .astype(np.int64)),
            "pc_": pa.array(np.bincount(b, weights=cents,
                                        minlength=n_bins + 1)
                            .astype(np.int64)),
        })

    out = (ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None)
           .groupby("bin")
           .aggregate(Sum("pn", alias_name="n"),
                      Sum("pc_", alias_name="value_cents"))
           .take_all())  # (n_bins+1)-cardinality
    out = [r for r in out if int(r["n"]) > 0]
    out.sort(key=lambda r: r["bin"])
    import ray.data as _rd
    return _rd.from_arrow(pa.table({
        "bin": pa.array([int(r["bin"]) for r in out], type=pa.int64()),
        "n": pa.array([int(r["n"]) for r in out], type=pa.int64()),
        "value_cents": pa.array([int(r["value_cents"]) for r in out],
                                type=pa.int64()),
    }))


def value_histogram_sql(width: float = 25.0, n_bins: int = 20) -> str:
    """Oracle for :func:`value_histogram` — the same floor-divide bin id
    with LEAST/GREATEST clamping."""
    return f"""
SELECT LEAST(GREATEST(CAST(floor(value / {width}) AS BIGINT), 0),
             {n_bins}) AS bin,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events
WHERE value IS NOT NULL
GROUP BY 1 ORDER BY 1"""


def _skyline_filter(n: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Boolean mask of the maximal (n, v) Pareto frontier (maximize
    both; a point survives unless some other point is >= on both axes
    and > on at least one).  Ties: identical points all survive.
    Vectorized: sort by n DESC, take per-distinct-n max v, survive
    strictly-increasing v going down the n order."""
    if not len(n):
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-v, -n))
    ns, vs = n[order], v[order]
    new_n = np.concatenate([[True], ns[1:] != ns[:-1]])
    # max v per distinct n = first v in each n segment (v sorted desc)
    seg = np.cumsum(new_n) - 1
    vmax = vs[new_n]
    # frontier n-segments: vmax strictly above every vmax of larger n
    best = np.maximum.accumulate(np.concatenate([[np.iinfo(np.int64).min],
                                                 vmax[:-1]]))
    seg_ok = vmax > best
    keep_sorted = seg_ok[seg] & (vs == vmax[seg])
    keep = np.zeros(len(n), dtype=bool)
    keep[order] = keep_sorted
    return keep


def user_skyline(sf_dir: str):
    """Pareto frontier (skyline operator) over per-user activity: users
    whose (n_events, value_micro) is not dominated by any other user —
    (user_id, n_events, value_micro), sorted by user_id.

    Scale plan: the per-user aggregate is ONE user-cardinality groupby
    of in-batch partials; the skyline itself distributes as
    local-frontier-then-merge — each aggregated batch keeps only its own
    Pareto frontier (global frontier is a subset of the union of local
    frontiers, by dominance transitivity), the survivors (typically
    O(sqrt) of a random batch) repartition to one block, and the same
    vectorized filter runs once more.  Value sums ride exact integer
    microunits so dominance comparisons are never float.
    """
    import ray.data
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "events", columns=["user_id", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = _drop_null_users(batch)
        u = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = batch["value"].to_numpy(zero_copy_only=False)
        micro = np.where(np.isnan(v), 0,
                         np.rint(np.nan_to_num(v) * 1e6)).astype(np.int64)
        uu, inv = np.unique(u, return_inverse=True)
        return pa.table({
            "user_id": pa.array(uu),
            "pn": pa.array(np.bincount(inv, minlength=len(uu))
                           .astype(np.int64)),
            "pv": pa.array(np.bincount(inv, weights=micro,
                                       minlength=len(uu))
                           .astype(np.int64)),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None)
           .groupby("user_id")
           .aggregate(Sum("pn", alias_name="n_events"),
                      Sum("pv", alias_name="value_micro")))

    def local_sky(batch: pa.Table) -> pa.Table:
        keep = _skyline_filter(
            batch["n_events"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            batch["value_micro"].to_numpy(zero_copy_only=False)
            .astype(np.int64))
        return batch.filter(pa.array(keep))

    out = (agg.map_batches(local_sky, batch_format="pyarrow",
                           batch_size=None)
           .repartition(1)
           .map_batches(local_sky, batch_format="pyarrow",
                        batch_size=None)
           .take_all())
    out.sort(key=lambda r: r["user_id"])
    import ray.data as _rd
    return _rd.from_arrow(pa.table({
        "user_id": pa.array([int(r["user_id"]) for r in out],
                            type=pa.int64()),
        "n_events": pa.array([int(r["n_events"]) for r in out],
                             type=pa.int64()),
        "value_micro": pa.array([int(r["value_micro"]) for r in out],
                                type=pa.int64()),
    }))


USER_SKYLINE_SQL = """
WITH u AS (
  SELECT user_id, count(*) AS n_events,
         CAST(sum(CASE WHEN value IS NULL THEN 0
                  ELSE CAST(round(value * 1000000, 0) AS BIGINT) END)
              AS BIGINT) AS value_micro
  FROM events WHERE user_id IS NOT NULL GROUP BY 1)
SELECT a.user_id, a.n_events, a.value_micro
FROM u a
WHERE NOT EXISTS (
  SELECT 1 FROM u b
  WHERE b.n_events >= a.n_events AND b.value_micro >= a.value_micro
    AND (b.n_events > a.n_events OR b.value_micro > a.value_micro))
ORDER BY a.user_id"""


def latest_event_state(sf_dir: str, n_parts: int = 64):
    """CDC compaction (keep-last / upsert semantics): one row per
    (user_id, event_type) — the LATEST event by (ts, event_id) — with
    its timestamp, id and value.  The standard changelog->state
    compaction every ingestion pipeline runs.

    Scale plan: keep-last is an associative reduction, so each batch
    first compacts to its own per-key winner (one lexsort, keep the
    segment tail) — the shuffle then moves at most one row per (key,
    batch); a user-hash co-partition re-runs the identical vectorized
    reducer per bucket.  Ties break on event_id (mirrored in the
    oracle's ORDER BY ts DESC, event_id DESC), so the result is
    deterministic under any batch arrival order.
    """
    import ray.data

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "event_type", "ts", "event_id",
                             "value"])

    def keep_last(batch: pa.Table) -> pa.Table:
        batch = _drop_null_ts(_drop_null_users(batch))
        if not len(batch):
            return batch
        u = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        et = batch["event_type"].to_pandas()
        codes, _ = pd.factorize(et, use_na_sentinel=False)
        ts = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = batch["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort((eid, ts, codes, u))
        u_s, c_s = u[order], codes[order]
        last = np.concatenate(
            [(u_s[1:] != u_s[:-1]) | (c_s[1:] != c_s[:-1]), [True]])
        return batch.take(pa.array(order[last]))

    compacted = ds.map_batches(keep_last, batch_format="pyarrow",
                               batch_size=None)

    def bucket_of(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        h = _splitmix64(u.view(np.uint64)) % np.uint64(n_parts)
        return batch.append_column("_b", pa.array(h.astype(np.int64)))

    merged = (compacted.map_batches(bucket_of, batch_format="pyarrow",
                                    batch_size=None)
              .groupby("_b")
              .map_groups(lambda g: keep_last(g.drop_columns(["_b"])),
                          batch_format="pyarrow"))
    return merged.select_columns(["user_id", "event_type", "ts",
                                  "event_id", "value"])


LATEST_EVENT_STATE_SQL = """
SELECT user_id, event_type, ts, event_id, value
FROM events
WHERE user_id IS NOT NULL AND ts IS NOT NULL
QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts DESC, event_id DESC) = 1"""


def user_event_paths(sf_dir: str, sep: str = ",", n_parts: int = 64):
    """Ordered collect (string_agg): per user, the comma-joined sequence
    of event types in (ts, event_id) order plus the event count —
    (user_id, n_events, path).

    Ordered collection is irreducibly ONE exchange of the collected
    column (there is no per-batch partial for a global order) — the
    engine moves only (user_id, ts, event_id, event_type), buckets by
    user hash so each user's rows land in one group, lexsorts once per
    bucket, and joins per-user segments with a vectorized pandas groupby
    apply over already-sorted codes.  Tie order (ts, then event_id) is
    mirrored in the oracle's string_agg ORDER BY.
    """
    import ray.data

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "event_type", "ts", "event_id"])

    def bucket_of(batch: pa.Table) -> pa.Table:
        batch = _drop_null_ts(_drop_null_users(batch))
        u = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        h = _splitmix64(u.view(np.uint64)) % np.uint64(n_parts)
        return batch.append_column("_b", pa.array(h.astype(np.int64)))

    def collect(group: pa.Table) -> pa.Table:
        if not len(group):
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "n_events": pa.array([], type=pa.int64()),
                             "path": pa.array([], type=pa.string())})
        u = group["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = group["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = group["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        et = group["event_type"].to_pandas().to_numpy(dtype=object)
        order = np.lexsort((eid, ts, u))
        u_s, et_s = u[order], et[order]
        df = pd.DataFrame({"u": u_s, "t": et_s})
        g = df.groupby("u", sort=True)["t"] \
            .agg(lambda s: sep.join(x if x is not None else ""
                                    for x in s))
        n = df.groupby("u", sort=True)["t"].size()
        return pa.table({
            "user_id": pa.array(g.index.to_numpy().astype(np.int64)),
            "n_events": pa.array(n.to_numpy().astype(np.int64)),
            "path": pa.array(g.to_numpy(dtype=object), type=pa.string()),
        })

    return (ds.map_batches(bucket_of, batch_format="pyarrow",
                           batch_size=None)
            .groupby("_b")
            .map_groups(collect, batch_format="pyarrow"))


def user_event_paths_sql(sep: str = ",") -> str:
    """Oracle for :func:`user_event_paths` — string_agg with the same
    (ts, event_id) order."""
    return f"""
SELECT user_id, count(*) AS n_events,
       string_agg(coalesce(event_type, ''), '{sep}'
                  ORDER BY ts, event_id) AS path
FROM events
WHERE user_id IS NOT NULL AND ts IS NOT NULL
GROUP BY user_id"""


def doc_percent_rank(sf_dir: str, group_col: str = "lang",
                     value_col: str = "n_chars", id_col: str = "doc_id"):
    """Distributed PERCENT_RANK() OVER (PARTITION BY lang ORDER BY
    n_chars) — (doc_id, lang, n_chars, pct_rank) with RANK tie
    semantics: rows sharing a value share (rank-1)/(n-1).  Completes the
    engine's window-function family (RANK/NTILE/LAG/ROWS-window/
    row_number already exist) with the ties-share-rank percentile.

    Unlike NTILE (which needs a per-ROW global position and the full
    two-level scan of doc_deciles), RANK-with-ties depends only on the
    VALUE: rank(g, v) = 1 + #{rows in g with value < v}.  So pass 1 is
    ONE (group, value)-cardinality count groupby — bounded by the value
    spread, not the corpus (a wide-spread value column would first
    bucket ranges exactly like doc_token_rank) — whose cumsum the
    driver broadcasts as a (group, value) -> rank map; pass 2 streams
    the corpus once, attaching pct_rank by lookup.  The one float
    division mirrors DuckDB's (rank-1)/(n-1) bit-for-bit (n = 1 gives
    0.0 exactly like the SQL window).  NULL values are excluded on both
    engines (the oracle filters; this corpus has none).
    """
    import ray
    from ray.data.aggregate import Sum

    from .text import round_half_away

    ds = read_table(sf_dir, "documents",
                    columns=[id_col, group_col, value_col])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch[group_col].to_pandas().astype(str)
        v = batch[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = pd.DataFrame({"g": g, "v": v}).groupby(
            ["g", "v"], sort=False).size().reset_index(name="pn")
        return pa.table({
            "g": pa.array(d["g"], type=pa.string()),
            "v": pa.array(d["v"].to_numpy().astype(np.int64)),
            "pn": pa.array(d["pn"].to_numpy().astype(np.int64)),
        })

    rng = (ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None)
           .groupby(["g", "v"])
           .aggregate(Sum("pn", alias_name="n"))).to_pandas() \
        .sort_values(["g", "v"], ignore_index=True)

    # per-group sorted (values, rank) arrays — vectorized searchsorted
    # lookup per batch, one Python iteration per GROUP not per row
    tables = {}
    for gk, grp in rng.groupby("g", sort=False):
        c = grp["n"].to_numpy().astype(np.int64)
        rk = np.concatenate([[0], np.cumsum(c)[:-1]]) + 1
        tables[gk] = (grp["v"].to_numpy().astype(np.int64),
                      rk.astype(np.int64), int(c.sum()))
    bc_ref = ray.put(tables)

    def attach(batch: pa.Table) -> pa.Table:
        from ..state.bcast import cached_get

        tbl = cached_get(bc_ref)       # per-worker memoized fetch
        g = np.asarray(batch[group_col].to_pandas().astype(str))
        v = batch[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pr = np.zeros(len(v), dtype=np.float64)
        for gk in np.unique(g) if len(g) else []:
            vs, rk, n = tbl[gk]
            m = g == gk
            if n > 1:
                pr[m] = (rk[np.searchsorted(vs, v[m])] - 1) \
                    / np.float64(n - 1)
        return pa.table({
            id_col: batch[id_col],
            group_col: batch[group_col],
            value_col: batch[value_col],
            "pct_rank": pa.array(round_half_away(pr)),
        })

    return ds.map_batches(attach, batch_format="pyarrow",
                          batch_size=None)


def hourly_anomaly(sf_dir: str):
    """Hour-of-day anomaly z-scores per event type: each type's 24-hour
    activity profile (zero-filled) standardized against its own mean —
    (event_type, hour, n_events, z); |z| > ~2 marks load-anomalous
    hours.  The temporal twin of the Getis-Ord hotspot z.

    Exactness: counts per (type, hour) come from ONE bounded-cardinality
    groupby (types x 24 cells, zero-filled driver-side exactly like the
    oracle's CROSS JOIN legs); with N = 24 and mean = T/N rational,
    multiplying through by N gives the exact-integer pair
    a = N*x - T, b = N*SXX - T^2 (big-int — at 100 TB b ~ 1e24 would
    wrap int64) and ONE float chain
    z = a / sqrt(b * (N / (N-1))) mirrored op-for-op.  NULL ts or type
    drop on both engines; constant profiles yield NULL z like the SQL
    CASE.  Epoch hour arithmetic assumes ts >= 1970 (asserted; the
    corpus is 2024).
    """
    import math

    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table
    from .text import round_half_away

    ds = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        t = batch["event_type"].to_pandas()
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        ok = t.notna().to_numpy() & ~np.isnat(ts)
        t = t[ok]
        tsv = ts[ok].astype("datetime64[us]").astype(np.int64)
        assert len(tsv) == 0 or tsv.min() >= 0, \
            "hourly_anomaly assumes post-1970 timestamps"
        h = (tsv // 3_600_000_000) % 24
        d = pd.DataFrame({"t": t.astype(str), "h": h}).groupby(
            ["t", "h"], sort=False).size().reset_index(name="pn")
        return pa.table({
            "t": pa.array(d["t"], type=pa.string()),
            "h": pa.array(d["h"].to_numpy().astype(np.int64)),
            "pn": pa.array(d["pn"].to_numpy().astype(np.int64)),
        })

    m = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
         .groupby(["t", "h"])
         .aggregate(Sum("pn", alias_name="n"))).to_pandas()

    out = {"event_type": [], "hour": [], "n_events": [], "z": []}
    for t, grp in m.groupby("t", sort=True):
        dense = np.zeros(24, dtype=object)
        for h_, n_ in zip(grp["h"].to_numpy(), grp["n"].to_numpy()):
            dense[int(h_)] = int(n_)
        tot = sum(int(x) for x in dense)
        sxx = sum(int(x) * int(x) for x in dense)
        nn = 24
        b = nn * sxx - tot * tot
        for h_ in range(24):
            a = nn * int(dense[h_]) - tot
            z = (None if b <= 0 else float(round_half_away(np.float64(
                float(a) / math.sqrt(float(b)
                                     * (float(nn) / float(nn - 1)))))))
            out["event_type"].append(t)
            out["hour"].append(h_)
            out["n_events"].append(int(dense[h_]))
            out["z"].append(z)
    return ray.data.from_arrow(pa.table({
        "event_type": pa.array(out["event_type"], type=pa.string()),
        "hour": pa.array(out["hour"], type=pa.int64()),
        "n_events": pa.array(out["n_events"], type=pa.int64()),
        "z": pa.array(out["z"], type=pa.float64()),
    }))


HOURLY_ANOMALY_SQL = """
WITH e AS (SELECT event_type,
                  CAST(extract(hour FROM ts) AS BIGINT) AS h
           FROM events
           WHERE ts IS NOT NULL AND event_type IS NOT NULL),
c AS (SELECT event_type, h, CAST(count(*) AS BIGINT) AS n
      FROM e GROUP BY 1, 2),
ty AS (SELECT DISTINCT event_type FROM e),
hrs AS (SELECT CAST(range AS BIGINT) AS h FROM range(24)),
dense AS (SELECT ty.event_type, hrs.h, coalesce(c.n, 0) AS n
          FROM ty CROSS JOIN hrs
          LEFT JOIN c ON c.event_type = ty.event_type AND c.h = hrs.h),
m AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS nn,
             CAST(sum(n) AS HUGEINT) AS t,
             CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT) AS sxx
      FROM dense GROUP BY 1)
SELECT d.event_type, d.h AS hour, d.n AS n_events,
       CASE WHEN m.nn * m.sxx - m.t * m.t <= 0 THEN NULL ELSE
         round(CAST(m.nn * d.n - m.t AS DOUBLE)
               / sqrt(CAST(m.nn * m.sxx - m.t * m.t AS DOUBLE)
                      * (CAST(m.nn AS DOUBLE)
                         / CAST(m.nn - 1 AS DOUBLE))), 6) END AS z
FROM dense d JOIN m ON m.event_type = d.event_type
ORDER BY 1, 2"""


def daily_autocorr(sf_dir: str):
    """Lag-1 autocorrelation of the zero-filled daily count series per
    event type — (event_type, n_pairs, r); r near +1 marks persistent
    load regimes, near -1 alternating ones.  The temporal-persistence
    twin of hourly_anomaly's profile z (reference has per-cell stats
    only; this is an engine-side series statistic over the same corpus).

    Exactness: per-(type, day) counts come from ONE bounded-cardinality
    groupby (types x calendar days); the dense series is zero-filled
    driver-side over the GLOBAL [min_day, max_day] range exactly like
    the oracle's CROSS JOIN legs.  Lagged pairs (x_i, x_{i+1}) give
    all-integer big-int moments a = m*Sxy - Sx*Sy, bx = m*Sxx - Sx^2,
    by = m*Syy - Sy^2 (HUGEINT in SQL — at 100 TB Sxx ~ 1e20 would wrap
    int64) and ONE mirrored float chain
    r = a / sqrt(bx * by); bx <= 0 or by <= 0 (constant legs) yields
    NULL like the SQL CASE.  Epoch-day floor assumes ts >= 1970
    (asserted; the corpus is 2024) so numpy floor-// == SQL truncate-//.
    """
    import math

    import ray.data
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        t = batch["event_type"].to_pandas()
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        ok = t.notna().to_numpy() & ~np.isnat(ts)
        t = t[ok]
        tsv = ts[ok].astype("datetime64[us]").astype(np.int64)
        assert len(tsv) == 0 or tsv.min() >= 0, \
            "daily_autocorr assumes post-1970 timestamps"
        d = (tsv // 86_400_000_000)
        g = pd.DataFrame({"t": t.astype(str), "d": d}).groupby(
            ["t", "d"], sort=False).size().reset_index(name="pn")
        return pa.table({
            "t": pa.array(g["t"], type=pa.string()),
            "d": pa.array(g["d"].to_numpy().astype(np.int64)),
            "pn": pa.array(g["pn"].to_numpy().astype(np.int64)),
        })

    m = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
         .groupby(["t", "d"])
         .aggregate(Sum("pn", alias_name="n"))).to_pandas()

    out = {"event_type": [], "n_pairs": [], "r": []}
    if len(m):
        d0, d1 = int(m["d"].min()), int(m["d"].max())
        ndays = d1 - d0 + 1
        for t, grp in m.groupby("t", sort=True):
            dense = [0] * ndays
            for d_, n_ in zip(grp["d"].to_numpy(), grp["n"].to_numpy()):
                dense[int(d_) - d0] = int(n_)
            x, y = dense[:-1], dense[1:]
            mm = len(x)
            if mm == 0:  # single-day range: SQL's pairs CTE is empty
                continue
            sx, sy = sum(x), sum(y)
            sxx = sum(v * v for v in x)
            syy = sum(v * v for v in y)
            sxy = sum(a_ * b_ for a_, b_ in zip(x, y))
            a = mm * sxy - sx * sy
            bx = mm * sxx - sx * sx
            by = mm * syy - sy * sy
            r = (None if mm < 2 or bx <= 0 or by <= 0 else float(
                round_half_away(np.float64(
                    float(a) / math.sqrt(float(bx) * float(by))))))
            out["event_type"].append(t)
            out["n_pairs"].append(mm)
            out["r"].append(r)
    return ray.data.from_arrow(pa.table({
        "event_type": pa.array(out["event_type"], type=pa.string()),
        "n_pairs": pa.array(out["n_pairs"], type=pa.int64()),
        "r": pa.array(out["r"], type=pa.float64()),
    }))


DAILY_AUTOCORR_SQL = """
WITH e AS (SELECT event_type,
                  CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d
           FROM events
           WHERE ts IS NOT NULL AND event_type IS NOT NULL),
b AS (SELECT min(d) AS d0, max(d) AS d1 FROM e),
days AS (SELECT CAST(unnest(generate_series(b.d0, b.d1)) AS BIGINT) AS d
         FROM b),
ty AS (SELECT DISTINCT event_type FROM e),
c AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n
      FROM e GROUP BY 1, 2),
dense AS (SELECT ty.event_type, days.d, coalesce(c.n, 0) AS n
          FROM ty CROSS JOIN days
          LEFT JOIN c ON c.event_type = ty.event_type AND c.d = days.d),
pairs AS (SELECT event_type, CAST(n AS HUGEINT) AS x,
                 CAST(lead(n) OVER (PARTITION BY event_type ORDER BY d)
                      AS HUGEINT) AS y
          FROM dense),
p AS (SELECT * FROM pairs WHERE y IS NOT NULL),
m AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS mm,
             sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
             sum(y * y) AS syy, sum(x * y) AS sxy
      FROM p GROUP BY 1)
SELECT event_type, CAST(mm AS BIGINT) AS n_pairs,
       CASE WHEN mm < 2 OR mm * sxx - sx * sx <= 0
                 OR mm * syy - sy * sy <= 0 THEN NULL ELSE
         round(CAST(mm * sxy - sx * sy AS DOUBLE)
               / sqrt(CAST(mm * sxx - sx * sx AS DOUBLE)
                      * CAST(mm * syy - sy * sy AS DOUBLE)), 6) END AS r
FROM m ORDER BY 1"""


def _daily_counts(sf_dir: str):
    """Shared partial for the dense daily-count family: exact (type,
    day) counts from ONE bounded-cardinality groupby plus the global
    [min_day, max_day] range (types x calendar days; the same
    zero-filled CROSS JOIN contract as hourly_anomaly / daily_autocorr).
    Returns the pandas frame of (t, d, n)."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        t = batch["event_type"].to_pandas()
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        ok = t.notna().to_numpy() & ~np.isnat(ts)
        t = t[ok]
        tsv = ts[ok].astype("datetime64[us]").astype(np.int64)
        assert len(tsv) == 0 or tsv.min() >= 0, \
            "daily-count family assumes post-1970 timestamps"
        d = (tsv // 86_400_000_000)
        g = pd.DataFrame({"t": t.astype(str), "d": d}).groupby(
            ["t", "d"], sort=False).size().reset_index(name="pn")
        return pa.table({
            "t": pa.array(g["t"], type=pa.string()),
            "d": pa.array(g["d"].to_numpy().astype(np.int64)),
            "pn": pa.array(g["pn"].to_numpy().astype(np.int64)),
        })

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
            .groupby(["t", "d"])
            .aggregate(Sum("pn", alias_name="n"))).to_pandas()


def daily_cusum(sf_dir: str):
    """CUSUM changepoint excursion per event type: over the zero-filled
    daily count series, the maximum absolute deviation of the running
    sum from its expected ramp — (event_type, peak_day, max_dev) where
    max_dev = max_k |P_k - k*T/N| and peak_day is the EARLIEST day
    attaining it.  A level shift in event volume shows up as a large
    excursion peaking at the change day.

    Exactness: the deviation is maximized in the exact integer domain
    (|N*P_k - k*T|, big-int safe via Python ints) with the earliest-day
    tie-break, and ONE mirrored float division |.|/N reports it; the
    oracle ranks with row_number() over the same integer expression.
    """
    import ray.data

    from .text import round_half_away

    m = _daily_counts(sf_dir)
    out = {"event_type": [], "peak_day": [], "max_dev": []}
    if len(m):
        d0, d1 = int(m["d"].min()), int(m["d"].max())
        ndays = d1 - d0 + 1
        for t, grp in m.groupby("t", sort=True):
            dense = [0] * ndays
            for d_, n_ in zip(grp["d"].to_numpy(), grp["n"].to_numpy()):
                dense[int(d_) - d0] = int(n_)
            tot = sum(dense)
            best_dev, best_k, pref = -1, -1, 0
            for k1, x in enumerate(dense, start=1):
                pref += x
                dev = abs(ndays * pref - k1 * tot)
                if dev > best_dev:
                    best_dev, best_k = dev, k1
            out["event_type"].append(t)
            out["peak_day"].append(d0 + best_k - 1)
            out["max_dev"].append(float(round_half_away(np.float64(
                float(best_dev) / float(ndays)))))
    return ray.data.from_arrow(pa.table({
        "event_type": pa.array(out["event_type"], type=pa.string()),
        "peak_day": pa.array(out["peak_day"], type=pa.int64()),
        "max_dev": pa.array(out["max_dev"], type=pa.float64()),
    }))


DAILY_CUSUM_SQL = """
WITH e AS (SELECT event_type,
                  CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d
           FROM events
           WHERE ts IS NOT NULL AND event_type IS NOT NULL),
b AS (SELECT min(d) AS d0, max(d) AS d1 FROM e),
days AS (SELECT CAST(unnest(generate_series(b.d0, b.d1)) AS BIGINT) AS d
         FROM b),
ty AS (SELECT DISTINCT event_type FROM e),
c AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n
      FROM e GROUP BY 1, 2),
dense AS (SELECT ty.event_type, days.d, coalesce(c.n, 0) AS n
          FROM ty CROSS JOIN days
          LEFT JOIN c ON c.event_type = ty.event_type AND c.d = days.d),
nd AS (SELECT CAST(d1 - d0 + 1 AS HUGEINT) AS ndays FROM b),
run AS (SELECT event_type, d,
               CAST(sum(n) OVER (PARTITION BY event_type ORDER BY d
                                 ROWS UNBOUNDED PRECEDING) AS HUGEINT)
                 AS p,
               CAST(row_number() OVER (PARTITION BY event_type
                                       ORDER BY d) AS HUGEINT) AS k,
               CAST(sum(n) OVER (PARTITION BY event_type) AS HUGEINT)
                 AS tot
        FROM dense),
dev AS (SELECT event_type, d,
               abs(nd.ndays * p - k * tot) AS dv
        FROM run CROSS JOIN nd),
rk AS (SELECT event_type, d, dv,
              row_number() OVER (PARTITION BY event_type
                                 ORDER BY dv DESC, d) AS rn
       FROM dev)
SELECT rk.event_type, rk.d AS peak_day,
       round(CAST(rk.dv AS DOUBLE) / CAST(nd.ndays AS DOUBLE), 6)
         AS max_dev
FROM rk CROSS JOIN nd WHERE rk.rn = 1 ORDER BY 1"""


def daily_ewma(sf_dir: str, alpha: float = 0.25):
    """Exponentially weighted moving average of the zero-filled daily
    count series per event type — (event_type, n_days, ewma); the
    final smoothed level after folding the whole series in day order
    (seeded with day one's count).  The order-pinned streaming
    statistic of the daily family.

    Exactness: the fold acc = (1-alpha)*acc + alpha*x runs as ONE
    sequential float chain in day order, mirrored term-for-term by the
    oracle's list_reduce over the day-ordered dense list (DuckDB seeds
    list_reduce with the first element, exactly like the engine).
    alpha must be an exact binary fraction (0.25 default) so both
    engines multiply by identical doubles.
    """
    import ray.data

    from .text import round_half_away

    m = _daily_counts(sf_dir)
    out = {"event_type": [], "n_days": [], "ewma": []}
    if len(m):
        d0, d1 = int(m["d"].min()), int(m["d"].max())
        ndays = d1 - d0 + 1
        a = np.float64(alpha)
        b = np.float64(1.0) - a
        for t, grp in m.groupby("t", sort=True):
            dense = np.zeros(ndays, dtype=np.float64)
            for d_, n_ in zip(grp["d"].to_numpy(), grp["n"].to_numpy()):
                dense[int(d_) - d0] = np.float64(int(n_))
            acc = dense[0]
            for x in dense[1:]:
                acc = b * acc + a * x
            out["event_type"].append(t)
            out["n_days"].append(ndays)
            out["ewma"].append(float(round_half_away(np.float64(acc))))
    return ray.data.from_arrow(pa.table({
        "event_type": pa.array(out["event_type"], type=pa.string()),
        "n_days": pa.array(out["n_days"], type=pa.int64()),
        "ewma": pa.array(out["ewma"], type=pa.float64()),
    }))


def daily_ewma_sql(alpha: float = 0.25) -> str:
    """Oracle for :func:`daily_ewma` — order-pinned list_reduce fold
    over the day-ordered dense series, identical float op order."""
    return f"""
WITH e AS (SELECT event_type,
                  CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d
           FROM events
           WHERE ts IS NOT NULL AND event_type IS NOT NULL),
b AS (SELECT min(d) AS d0, max(d) AS d1 FROM e),
days AS (SELECT CAST(unnest(generate_series(b.d0, b.d1)) AS BIGINT) AS d
         FROM b),
ty AS (SELECT DISTINCT event_type FROM e),
c AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n
      FROM e GROUP BY 1, 2),
dense AS (SELECT ty.event_type, days.d,
                 CAST(coalesce(c.n, 0) AS DOUBLE) AS x
          FROM ty CROSS JOIN days
          LEFT JOIN c ON c.event_type = ty.event_type AND c.d = days.d)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
       round(list_reduce(list(x ORDER BY d),
                         (a, v) -> {1.0 - alpha!r} * a + {alpha!r} * v),
             6) AS ewma
FROM dense GROUP BY 1 ORDER BY 1"""


def rfm_segments(sf_dir: str, k: int = 4, n_parts: int = 64,
                 day_bucket: int = 64, freq_bucket: int = 4,
                 money_bucket: int = 1 << 20):
    """RFM customer segmentation: NTILE(k) quartile labels on Recency
    (last order day), Frequency (order count) and Monetary (lifetime
    cents), jointly histogrammed — (r_bucket, f_bucket, m_bucket,
    n_customers), k^3 cells.  The classic marketing segmentation, here
    as a THREE-metric exact distributed NTILE (the window SQL writes as
    three ntile() calls over one scan).

    Scale plan: orders reduce to the customer metric table via ONE
    custkey-hashed blob co-partition (per-batch partials, finished
    inside the merge block — never an order-cardinality Ray sort row),
    materialized once (customer-cardinality, the same contract as
    doc_deciles' compact table).  Pass 1 counts customers per (metric,
    value-range) — bounded by value SPREAD, not cardinality — and the
    driver broadcasts exclusive range offsets; pass 2 co-locates each
    (metric, range) with one groupby, local-sorts by (value, custkey)
    so global rank = offset + local index (the doc_deciles argument),
    and applies the exact NTILE split (first n%k buckets one row
    larger); pass 3 co-partitions the three label rows per customer
    back on custkey and only k^3 cell partials reach the final
    groupby.  All arithmetic is integer; labels are 1-based like SQL.
    """
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..state.bcast import cached_get
    from .join import _ipc_bytes, _ipc_table, _part_of

    day_us = np.int64(86_400_000_000)
    VB = {0: np.int64(day_bucket), 1: np.int64(freq_bucket),
          2: np.int64(money_bucket)}
    K = int(k)
    P = np.int64(n_parts)

    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderdate",
                                 "o_totalprice"])

    def tag(batch: pa.Table) -> pa.Table:
        c = batch["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = batch["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) // day_us
        cents = np.rint(batch["o_totalprice"]
                        .to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        order = np.argsort(c, kind="stable")
        c, d, cents = c[order], d[order], cents[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(c[1:] != c[:-1]) + 1]).astype(np.int64) \
            if len(c) else np.empty(0, np.int64)
        cu = c[starts] if len(c) else c
        r = np.maximum.reduceat(d, starts) if len(c) else d
        f = np.diff(np.concatenate([starts, [len(c)]])).astype(np.int64) \
            if len(c) else np.empty(0, np.int64)
        m = np.add.reduceat(cents, starts) if len(c) else cents
        part = _part_of(cu, n_parts).astype(np.int64)
        ordp = np.argsort(part, kind="stable")
        part, cu, r, f, m = (part[ordp], cu[ordp], r[ordp], f[ordp],
                             m[ordp])
        bstarts = np.concatenate(
            [[0], np.flatnonzero(part[1:] != part[:-1]) + 1,
             [len(part)]]) if len(part) else np.array([0, 0])
        rows_p, rows_b = [], []
        for a_, b_ in zip(bstarts[:-1], bstarts[1:]):
            if b_ <= a_:
                continue
            rows_p.append(int(part[a_]))
            rows_b.append(_ipc_bytes(pa.table({
                "c": pa.array(cu[a_:b_]), "r": pa.array(r[a_:b_]),
                "f": pa.array(f[a_:b_]), "m": pa.array(m[a_:b_])})))
        return pa.table({
            "part": pa.array(rows_p, type=pa.int32()),
            "blob": pa.array(rows_b, type=pa.large_binary()),
        })

    def merge_cust(df) -> pa.Table:
        tabs = [_ipc_table(b) for b in df["blob"]]
        t = pa.concat_tables(tabs) if tabs else pa.table(
            {"c": pa.array([], type=pa.int64()),
             "r": pa.array([], type=pa.int64()),
             "f": pa.array([], type=pa.int64()),
             "m": pa.array([], type=pa.int64())})
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = t["r"].to_numpy(zero_copy_only=False).astype(np.int64)
        f = t["f"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = t["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(c, kind="stable")
        c, r, f, m = c[order], r[order], f[order], m[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(c[1:] != c[:-1]) + 1]).astype(np.int64) \
            if len(c) else np.empty(0, np.int64)
        return pa.table({
            "c": pa.array(c[starts] if len(c) else c),
            "r": pa.array(np.maximum.reduceat(r, starts)
                          if len(c) else r),
            "f": pa.array(np.add.reduceat(f, starts) if len(c) else f),
            "m": pa.array(np.add.reduceat(m, starts) if len(c) else m),
        })

    cust = (orders.map_batches(tag, batch_format="pyarrow",
                               batch_size=None)
            .groupby("part")
            .map_groups(merge_cust, batch_format="pandas")) \
        .materialize()

    SHIFT = np.int64(1) << 40         # (metric, vrange) -> one int64 key

    def count_ranges(batch: pa.Table) -> pa.Table:
        keys, cnts = [], []
        for mi, col in ((0, "r"), (1, "f"), (2, "m")):
            v = batch[col].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            assert len(v) == 0 or v.min() >= 0, \
                "rfm_segments assumes non-negative metric values"
            vr = v // VB[mi]
            uk, cnt = np.unique(np.int64(mi) * SHIFT + vr,
                                return_counts=True)
            keys.append(uk)
            cnts.append(cnt.astype(np.int64))
        return pa.table({
            "key": pa.array(np.concatenate(keys)
                            if keys else np.empty(0, np.int64)),
            "pn": pa.array(np.concatenate(cnts)
                           if cnts else np.empty(0, np.int64)),
        })

    rng = (cust.map_batches(count_ranges, batch_format="pyarrow",
                            batch_size=None)
           .groupby("key").aggregate(Sum("pn", alias_name="n"))) \
        .to_pandas().sort_values("key", ignore_index=True)
    offsets = {}
    totals = {0: 0, 1: 0, 2: 0}
    for _, row in rng.iterrows():
        key, n = int(row["key"]), int(row["n"])
        mi = key >> 40
        offsets[key] = totals[mi]
        totals[mi] += n
    n_cust = totals[0]
    off_ref = ray.put(offsets)

    def emit_metric_rows(batch: pa.Table) -> pa.Table:
        c = batch["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_k, out_c, out_v = [], [], []
        for mi, col in ((0, "r"), (1, "f"), (2, "m")):
            v = batch[col].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            out_k.append(np.int64(mi) * SHIFT + v // VB[mi])
            out_c.append(c)
            out_v.append(v)
        return pa.table({
            "key": pa.array(np.concatenate(out_k)),
            "c": pa.array(np.concatenate(out_c)),
            "v": pa.array(np.concatenate(out_v)),
        })

    q, rem = divmod(n_cust, K) if n_cust else (0, 0)
    cut = rem * (q + 1)

    def label_group(g: pa.Table) -> pa.Table:
        if not len(g):
            return pa.table({"c": pa.array([], type=pa.int64()),
                             "metric": pa.array([], type=pa.int64()),
                             "lab": pa.array([], type=pa.int64())})
        off = cached_get(off_ref)
        key = g["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = g["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = g["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((c, v, key))   # ranges co-located per key
        key, c, v = key[order], c[order], v[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(key[1:] != key[:-1]) + 1]) \
            .astype(np.int64)
        local = np.arange(len(key), dtype=np.int64)
        local -= np.repeat(starts, np.diff(
            np.concatenate([starts, [len(key)]])).astype(np.int64))
        base = np.array([off[int(kk)] for kk in key[starts]],
                        dtype=np.int64)
        i = local + np.repeat(base, np.diff(
            np.concatenate([starts, [len(key)]])).astype(np.int64))
        lab = np.where(i < cut, i // (q + 1),
                       rem + (i - cut) // max(q, 1)) + 1
        return pa.table({
            "c": pa.array(c),
            "metric": pa.array((key >> 40).astype(np.int64)),
            "lab": pa.array(lab.astype(np.int64)),
        })

    labels = (cust.map_batches(emit_metric_rows, batch_format="pyarrow",
                               batch_size=None)
              .groupby("key")
              .map_groups(label_group, batch_format="pyarrow"))

    def tag_labels(batch: pa.Table) -> pa.Table:
        c = batch["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        mi = batch["metric"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        lab = batch["lab"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        part = _part_of(c, n_parts).astype(np.int64)
        ordp = np.argsort(part, kind="stable")
        part, c, mi, lab = part[ordp], c[ordp], mi[ordp], lab[ordp]
        bstarts = np.concatenate(
            [[0], np.flatnonzero(part[1:] != part[:-1]) + 1,
             [len(part)]]) if len(part) else np.array([0, 0])
        rows_p, rows_b = [], []
        for a_, b_ in zip(bstarts[:-1], bstarts[1:]):
            if b_ <= a_:
                continue
            rows_p.append(int(part[a_]))
            rows_b.append(_ipc_bytes(pa.table({
                "c": pa.array(c[a_:b_]), "mi": pa.array(mi[a_:b_]),
                "lab": pa.array(lab[a_:b_])})))
        return pa.table({
            "part": pa.array(rows_p, type=pa.int32()),
            "blob": pa.array(rows_b, type=pa.large_binary()),
        })

    def pivot_cells(df) -> pa.Table:
        tabs = [_ipc_table(b) for b in df["blob"]]
        t = pa.concat_tables(tabs) if tabs else pa.table(
            {"c": pa.array([], type=pa.int64()),
             "mi": pa.array([], type=pa.int64()),
             "lab": pa.array([], type=pa.int64())})
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        mi = t["mi"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = t["lab"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(c):
            return pa.table({"cell": pa.array([], type=pa.int64()),
                             "pn": pa.array([], type=pa.int64())})
        order = np.lexsort((mi, c))
        c, mi, lab = c[order], mi[order], lab[order]
        # three rows per customer, metric-ordered: r, f, m
        assert len(c) % 3 == 0 and (mi.reshape(-1, 3)
                                    == [0, 1, 2]).all(), \
            "each customer must carry exactly one label per metric"
        tri = lab.reshape(-1, 3)
        cell = (tri[:, 0] * (K + 1) + tri[:, 1]) * (K + 1) + tri[:, 2]
        uk, cnt = np.unique(cell, return_counts=True)
        return pa.table({"cell": pa.array(uk.astype(np.int64)),
                         "pn": pa.array(cnt.astype(np.int64))})

    cells = (labels.map_batches(tag_labels, batch_format="pyarrow",
                                batch_size=None)
             .groupby("part")
             .map_groups(pivot_cells, batch_format="pandas")
             .groupby("cell")
             .aggregate(Sum("pn", alias_name="n_customers"))) \
        .to_pandas().sort_values("cell", ignore_index=True)
    cell = cells["cell"].to_numpy().astype(np.int64) if len(cells) \
        else np.empty(0, np.int64)
    return ray.data.from_arrow(pa.table({
        "r_bucket": pa.array(cell // ((K + 1) * (K + 1))),
        "f_bucket": pa.array((cell // (K + 1)) % (K + 1)),
        "m_bucket": pa.array(cell % (K + 1)),
        "n_customers": pa.array(
            cells["n_customers"].to_numpy().astype(np.int64)
            if len(cells) else np.empty(0, np.int64)),
    }))


def rfm_segments_sql(k: int = 4) -> str:
    """Oracle for :func:`rfm_segments` — three ntile() windows with the
    (value, custkey) total order, jointly histogrammed."""
    return f"""
WITH base AS (
  SELECT o_custkey AS c,
         max(epoch_us(o_orderdate) // 86400000000) AS r,
         CAST(count(*) AS BIGINT) AS f,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS m
  FROM orders GROUP BY 1),
lab AS (SELECT c,
               ntile({k}) OVER (ORDER BY r, c) AS rb,
               ntile({k}) OVER (ORDER BY f, c) AS fb,
               ntile({k}) OVER (ORDER BY m, c) AS mb
        FROM base)
SELECT CAST(rb AS BIGINT) AS r_bucket, CAST(fb AS BIGINT) AS f_bucket,
       CAST(mb AS BIGINT) AS m_bucket,
       CAST(count(*) AS BIGINT) AS n_customers
FROM lab GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""


def peak_window(sf_dir: str, window_min: int = 10):
    """Peak sliding-window burst per event type: the densest
    ``window_min``-minute window (aligned to minute starts) over each
    type's event stream — (event_type, start_minute, n_events), the
    EARLIEST window on ties.  The stream-burst detector (rate-limit /
    incident forensics), an exact distributed sliding-window max.

    Scale plan: events reduce to (type, minute) counts in ONE
    bounded-cardinality groupby (minutes are calendar-bounded, not
    corpus-bounded); each type's dense series then lives in its OWN
    map_groups task (type co-location, minutes-bounded memory) where
    the sliding sum is one cumsum difference; only one row per type
    reaches the driver.  All-integer; the earliest-argmax tie-break is
    mirrored by the oracle's row_number ORDER BY n DESC, minute.
    """
    import ray.data
    from ray.data.aggregate import Sum

    W = int(window_min)

    ds = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        t = batch["event_type"].to_pandas()
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        ok = t.notna().to_numpy() & ~np.isnat(ts)
        t = t[ok]
        tsv = ts[ok].astype("datetime64[us]").astype(np.int64)
        assert len(tsv) == 0 or tsv.min() >= 0, \
            "peak_window assumes post-1970 timestamps"
        m = tsv // 60_000_000
        g = pd.DataFrame({"t": t.astype(str), "m": m}).groupby(
            ["t", "m"], sort=False).size().reset_index(name="pn")
        return pa.table({
            "t": pa.array(g["t"], type=pa.string()),
            "m": pa.array(g["m"].to_numpy().astype(np.int64)),
            "pn": pa.array(g["pn"].to_numpy().astype(np.int64)),
        })

    counts = (ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=None)
              .groupby(["t", "m"])
              .aggregate(Sum("pn", alias_name="n")))

    def per_type(g: pa.Table) -> pa.Table:
        if not len(g):
            return pa.table({
                "event_type": pa.array([], type=pa.string()),
                "start_minute": pa.array([], type=pa.int64()),
                "n_events": pa.array([], type=pa.int64())})
        t = g["t"].to_pandas().astype(str).to_numpy()
        m = g["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_t, out_s, out_n = [], [], []
        for ty in np.unique(t):
            sel = t == ty
            mm, nn = m[sel], n[sel]
            lo, hi = int(mm.min()), int(mm.max())
            dense = np.zeros(hi - lo + 1, dtype=np.int64)
            dense[mm - lo] = nn
            c = np.concatenate([[0], np.cumsum(dense)])
            # windows starting at every minute in [lo, hi]
            stop = np.minimum(np.arange(len(dense)) + W, len(dense))
            win = c[stop] - c[:-1]
            best = int(np.argmax(win))     # earliest on ties
            out_t.append(ty)
            out_s.append(lo + best)
            out_n.append(int(win[best]))
        return pa.table({
            "event_type": pa.array(out_t, type=pa.string()),
            "start_minute": pa.array(out_s, type=pa.int64()),
            "n_events": pa.array(out_n, type=pa.int64()),
        })

    return counts.groupby("t").map_groups(per_type,
                                          batch_format="pyarrow")


def peak_window_sql(window_min: int = 10) -> str:
    """Oracle for :func:`peak_window` — dense per-type minute series
    with a following-frame window sum and earliest-argmax rank."""
    return f"""
WITH e AS (SELECT event_type,
                  CAST(epoch_us(ts) // 60000000 AS BIGINT) AS m
           FROM events
           WHERE ts IS NOT NULL AND event_type IS NOT NULL),
c AS (SELECT event_type, m, CAST(count(*) AS BIGINT) AS n
      FROM e GROUP BY 1, 2),
b AS (SELECT event_type, min(m) AS m0, max(m) AS m1
      FROM e GROUP BY 1),
dense AS (SELECT b.event_type,
                 CAST(unnest(generate_series(b.m0, b.m1)) AS BIGINT)
                   AS m
          FROM b),
d2 AS (SELECT dense.event_type, dense.m, coalesce(c.n, 0) AS n
       FROM dense LEFT JOIN c ON c.event_type = dense.event_type
                             AND c.m = dense.m),
win AS (SELECT event_type, m,
               CAST(sum(n) OVER (PARTITION BY event_type ORDER BY m
                                 ROWS BETWEEN CURRENT ROW
                                 AND {window_min - 1} FOLLOWING)
                    AS BIGINT) AS w
        FROM d2),
rk AS (SELECT event_type, m, w,
              row_number() OVER (PARTITION BY event_type
                                 ORDER BY w DESC, m) AS rn
       FROM win)
SELECT event_type, m AS start_minute, w AS n_events
FROM rk WHERE rn = 1 ORDER BY 1"""


def group_quantiles_cont(sf_dir: str, qs=(0.25, 0.5, 0.75),
                         group_col: str = "event_type",
                         value_col: str = "value", n_bins: int = 4096):
    """EXACT per-group INTERPOLATED quantiles (quantile_cont semantics:
    value at continuous rank h = q * (n-1), linearly interpolated
    between the flanking order statistics) — (group, q, value).  The
    continuous companion of :func:`group_quantiles`' quantile_disc.

    Same three bounded-memory passes (per-group stats, fixed-width
    histograms, candidate-bucket fetch); each q targets the TWO ranks
    floor(h) and ceil(h) and the driver mirrors DuckDB's interpolation
    chain lower + (h - floor(h)) * (upper - lower) op-for-op, so the
    doubles are bit-equal.  At 100 TB pass C still pulls ~2/4096ths of
    the column at most.
    """
    import ray

    def read():
        base = read_table(sf_dir, "events", columns=[group_col, value_col])

        def drop_null_values(batch: pa.Table) -> pa.Table:
            if batch[value_col].null_count:
                import pyarrow.compute as pc

                batch = batch.filter(pc.is_valid(batch[value_col]))
            return batch

        return base.map_batches(drop_null_values, batch_format="pyarrow",
                                batch_size=None)

    qs = list(qs)

    # flag-prefixed string shuffle keys for NULL group safety — the
    # group_quantiles contract (see its pass-A comment)
    _sch = read().schema()            # Ray Schema: .names / .types
    gtype0 = dict(zip(_sch.names, _sch.types))[group_col]
    flag_keys = (pa.types.is_string(gtype0)
                 or pa.types.is_large_string(gtype0))

    def _flag(u):
        return "N" if u is None else "V" + str(u)

    def _unflag(k):
        return None if k == "N" else k[1:]

    def stats(batch: pa.Table) -> pa.Table:
        gtype = pa.string() if flag_keys else batch[group_col].type
        g, uniq = _dict_codes(batch[group_col])
        if flag_keys:
            uniq = [_flag(u) for u in uniq]
        v = batch[value_col].to_numpy(zero_copy_only=False)
        if len(g) == 0:
            return pa.table({
                "g": pa.array([], type=gtype),
                "mn": pa.array([], type=pa.float64()),
                "mx": pa.array([], type=pa.float64()),
                "n": pa.array([], type=pa.int64()),
            })
        order = np.argsort(g, kind="stable")
        g, v = g[order], v[order]
        starts, ends = _group_runs(g)
        return pa.table({
            "g": pa.array([uniq[c] for c in g[starts]], type=gtype),
            "mn": pa.array([float(np.min(v[s:e]))
                            for s, e in zip(starts, ends)]),
            "mx": pa.array([float(np.max(v[s:e]))
                            for s, e in zip(starts, ends)]),
            "n": pa.array([int(e - s) for s, e in zip(starts, ends)],
                          type=pa.int64()),
        })

    from ray.data.aggregate import Max, Min, Sum

    st = (read().map_batches(stats, batch_format="pyarrow",
                             batch_size=None)
          .groupby("g")
          .aggregate(Min("mn", alias_name="mn"),
                     Max("mx", alias_name="mx"),
                     Sum("n", alias_name="n"))
          .to_pandas().set_index("g"))
    # None-safe group order; gidx maps ORIGINAL group values
    keys = sorted(st.index,
                  key=lambda g: (g is None,
                                 "" if g is None else str(g)))
    groups = [_unflag(k) for k in keys] if flag_keys else list(keys)
    gidx = {g: i for i, g in enumerate(groups)}
    mn = st["mn"].reindex(keys).to_numpy()
    mx = st["mx"].reindex(keys).to_numpy()
    cnt = st["n"].reindex(keys).to_numpy()
    width = np.where(mx > mn, mx - mn, 1.0)
    ginfo_ref = ray.put((gidx, mn, width, n_bins))

    def hist(batch: pa.Table) -> pa.Table:
        gi, mn_, width_, nb = _cached_ginfo(ginfo_ref)
        v = batch[value_col].to_numpy(zero_copy_only=False)
        codes, _ = _dict_codes(batch[group_col], gidx=gi)
        lo = mn_[codes]
        w = width_[codes]
        b = np.clip(((v - lo) * (nb / w)).astype(np.int64), 0, nb - 1)
        flat = codes * nb + b
        h = np.bincount(flat, minlength=len(gi) * nb).astype(np.int64)
        return pa.table({"h": pa.array([h.tobytes()], type=pa.binary())})

    def merge_hist(batch: pa.Table) -> pa.Table:
        blobs = batch["h"].to_pylist()
        tot = np.zeros(len(gidx) * n_bins, dtype=np.int64)
        for b in blobs:
            tot += np.frombuffer(b, dtype=np.int64)
        return pa.table({"h": pa.array([tot.tobytes()], type=pa.binary())})

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    hd = (read().map_batches(hist, batch_format="pyarrow",
                             batch_size=None)
          .repartition(max(1, ncpu))
          .map_batches(merge_hist, batch_format="pyarrow",
                       batch_size=None)
          .repartition(1)
          .map_batches(merge_hist, batch_format="pyarrow",
                       batch_size=None)
          .take_all())
    hist_all = np.frombuffer(hd[0]["h"], dtype=np.int64).reshape(
        len(gidx), n_bins)

    # (group, q) -> continuous rank h; fetch ranks floor(h) and ceil(h)
    targets = {}   # (g_code, bucket) -> [rank, ...]
    wants = []     # (g_code, q, h, r_lo, r_hi)
    for g, gi_ in gidx.items():
        cum = np.concatenate([[0], np.cumsum(hist_all[gi_])])
        for q in qs:
            h = np.float64(q) * np.float64(int(cnt[gi_]) - 1)
            r_lo = int(np.floor(h))
            r_hi = int(np.ceil(h))
            for r in {r_lo, r_hi}:
                b = int(np.searchsorted(cum, r, side="right") - 1)
                targets.setdefault((gi_, b), []).append(r - int(cum[b]))
            wants.append((gi_, q, h, r_lo, r_hi,
                          int(np.searchsorted(cum, r_lo, side="right") - 1),
                          int(np.searchsorted(cum, r_hi, side="right") - 1),
                          cum))
    targets_ref = ray.put(targets)

    def select(batch: pa.Table) -> pa.Table:
        gi, mn_, width_, nb = _cached_ginfo(ginfo_ref)
        tg = _cached_ginfo(targets_ref)
        v = batch[value_col].to_numpy(zero_copy_only=False)
        codes, _ = _dict_codes(batch[group_col], gidx=gi)
        lo = mn_[codes]
        w = width_[codes]
        b = np.clip(((v - lo) * (nb / w)).astype(np.int64), 0, nb - 1)
        keep = np.zeros(len(v), dtype=bool)
        for (gc, bk) in tg:
            keep |= (codes == gc) & (b == bk)
        return pa.table({
            "gc": pa.array(codes[keep], type=pa.int64()),
            "bk": pa.array(b[keep], type=pa.int64()),
            "v": pa.array(v[keep], type=pa.float64()),
        })

    cand = (read().map_batches(select, batch_format="pyarrow",
                               batch_size=None).to_pandas())
    sorted_buckets = {
        key: np.sort(cand.loc[(cand["gc"] == key[0])
                              & (cand["bk"] == key[1]), "v"].to_numpy())
        for key in targets}
    inv = {v_: k_ for k_, v_ in gidx.items()}
    rows = []
    for gi_, q, h, r_lo, r_hi, b_lo, b_hi, cum in wants:
        vlo = np.float64(sorted_buckets[(gi_, b_lo)][r_lo - int(cum[b_lo])])
        vhi = np.float64(sorted_buckets[(gi_, b_hi)][r_hi - int(cum[b_hi])])
        # DuckDB's quantile_cont interpolation: two-sided weighting
        # (CRN - RN) * lo + (RN - FRN) * hi, NOT lo + frac * (hi - lo)
        # (1-ULP divergence caught by the bit-exact gate)
        if r_lo == r_hi:
            val = float(vlo)
        else:
            val = float((np.float64(r_hi) - np.float64(h)) * vlo
                        + (np.float64(h) - np.float64(r_lo)) * vhi)
        rows.append((inv[gi_], float(q), val))
    rows.sort(key=lambda r: ((r[0] is None,
                              r[0] if r[0] is not None else ""),
                             r[1], r[2]))
    return pd.DataFrame(rows, columns=[group_col, "q", value_col])


def user_growth(sf_dir: str, n_parts: int = 64):
    """Cumulative user-acquisition curve: each user's FIRST event day,
    counted per day with a running total — (day, n_new_users,
    cum_users).  The growth chart every event pipeline ships.

    Scale plan: per-batch per-user min-day partials ride ONE user-hashed
    blob co-partition (never a user-cardinality Ray sort row); the
    per-user min finishes inside the merge block, each block emits
    per-day new-user count partials (calendar-bounded), and the driver
    prefix-sums the bounded day series.  NULL user/ts drop on both
    engines; all-integer.
    """
    import ray.data
    from ray.data.aggregate import Sum

    from .join import _ipc_bytes, _ipc_table, _part_of

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def tag(batch: pa.Table) -> pa.Table:
        # Arrow-level null drop BEFORE to_numpy: a null-bearing int64
        # column converts via float64 and collapses ids above 2^53
        # (review finding; the _drop_null_users contract)
        batch = _drop_null_ts(_drop_null_users(batch))
        uu = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        order = np.argsort(uu, kind="stable")
        uu, d = uu[order], d[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(uu[1:] != uu[:-1]) + 1]) \
            .astype(np.int64) if len(uu) else np.empty(0, np.int64)
        uu1 = uu[starts] if len(uu) else uu
        d1 = np.minimum.reduceat(d, starts) if len(uu) else d
        part = _part_of(uu1, n_parts).astype(np.int64)
        ordp = np.argsort(part, kind="stable")
        part, uu1, d1 = part[ordp], uu1[ordp], d1[ordp]
        bstarts = np.concatenate(
            [[0], np.flatnonzero(part[1:] != part[:-1]) + 1,
             [len(part)]]) if len(part) else np.array([0, 0])
        rows_p, rows_b = [], []
        for a_, b_ in zip(bstarts[:-1], bstarts[1:]):
            if b_ <= a_:
                continue
            rows_p.append(int(part[a_]))
            rows_b.append(_ipc_bytes(pa.table({
                "u": pa.array(uu1[a_:b_]), "d": pa.array(d1[a_:b_])})))
        return pa.table({
            "part": pa.array(rows_p, type=pa.int32()),
            "blob": pa.array(rows_b, type=pa.large_binary()),
        })

    def merge(df) -> pa.Table:
        tabs = [_ipc_table(b) for b in df["blob"]]
        t = pa.concat_tables(tabs) if tabs else pa.table(
            {"u": pa.array([], type=pa.int64()),
             "d": pa.array([], type=pa.int64())})
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(u):
            return pa.table({"d": pa.array([], type=pa.int64()),
                             "pn": pa.array([], type=pa.int64())})
        order = np.argsort(u, kind="stable")
        u, d = u[order], d[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(u[1:] != u[:-1]) + 1]).astype(np.int64)
        first = np.minimum.reduceat(d, starts)
        ud, cnt = np.unique(first, return_counts=True)
        return pa.table({"d": pa.array(ud),
                         "pn": pa.array(cnt.astype(np.int64))})

    m = (ds.map_batches(tag, batch_format="pyarrow", batch_size=None)
         .groupby("part")
         .map_groups(merge, batch_format="pandas")
         .groupby("d").aggregate(Sum("pn", alias_name="n_new_users"))) \
        .to_pandas().sort_values("d", ignore_index=True)
    import ray.data as _rd
    new = m["n_new_users"].to_numpy().astype(np.int64) if len(m) \
        else np.empty(0, np.int64)
    return _rd.from_arrow(pa.table({
        "day": pa.array(m["d"].to_numpy().astype(np.int64)
                        if len(m) else np.empty(0, np.int64)),
        "n_new_users": pa.array(new),
        "cum_users": pa.array(np.cumsum(new).astype(np.int64)),
    }))


USER_GROWTH_SQL = """
WITH f AS (SELECT user_id,
                  CAST(min(epoch_us(ts) // 86400000000) AS BIGINT) AS d
           FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1),
c AS (SELECT d, CAST(count(*) AS BIGINT) AS n_new_users
      FROM f GROUP BY 1)
SELECT d AS day, n_new_users,
       CAST(sum(n_new_users) OVER (ORDER BY d
                                   ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_users
FROM c ORDER BY 1"""


def dau_mau(sf_dir: str, n_parts: int = 64):
    """Monthly stickiness (DAU/MAU): per calendar month, the distinct
    monthly actives (MAU), the distinct-user count summed over its
    ACTIVE days (sum_dau over n_days days that saw >= 1 event), and
    stickiness = (sum_dau / n_days) / mau — the engagement-frequency
    KPI next to :func:`user_growth`.  Output: (month, mau, sum_dau,
    n_days, avg_dau, stickiness).  NULL users/ts drop; active-day (not
    calendar-day) averaging is the contract, documented here because a
    trailing partial month would otherwise dilute.

    Scale plan: neither DAU nor MAU is partially summable (a user seen
    twice counts once), so per-batch-DISTINCT (day, user) pairs ride ONE
    user-hashed blob co-partition — each user's pairs co-locate, so the
    partition-local distinct is globally exact for both grains, and
    per-user month sets partition cleanly (MAU = sum of per-partition
    distinct).  Each merge block emits calendar-bounded (day, dau) and
    (month, mau) partials; the final groupby and ratio chain run over
    the bounded calendar table.  Assumes ts >= 1970 (the int64 // day
    bucketing mirrors DuckDB's truncating // only for non-negative
    epochs — same standing assumption as user_growth/activity_curve).
    """
    from ray.data.aggregate import Sum

    from .join import _ipc_bytes, _ipc_table, _part_of
    from .text import round_half_away

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def tag(batch: pa.Table) -> pa.Table:
        batch = _drop_null_users(_drop_null_ts(batch))
        u = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) // 86_400_000_000
        # day index stays well under 1e5 until year 2243; the pack needs
        # user_id < 2^63 / 1e5 ~ 9.2e13 (same class of bound as every
        # other packed-key partial in this file)
        key = u * 100_000 + d
        # ONE argsort serves both the ordering and the dedup mask (the
        # day_user_jaccard.tag shape; the old double np.sort discarded
        # two full sorts per batch)
        order = np.argsort(key, kind="stable")
        ks = key[order]
        keep = np.concatenate([[True], ks[1:] != ks[:-1]]) \
            if len(ks) else np.empty(0, bool)
        u, d = u[order][keep], d[order][keep]
        part = _part_of(u, n_parts).astype(np.int64)
        ordp = np.argsort(part, kind="stable")
        part, u, d = part[ordp], u[ordp], d[ordp]
        bstarts = np.concatenate(
            [[0], np.flatnonzero(part[1:] != part[:-1]) + 1,
             [len(part)]]) if len(part) else np.array([0, 0])
        rows_p, rows_b = [], []
        for a_, b_ in zip(bstarts[:-1], bstarts[1:]):
            if b_ <= a_:
                continue
            rows_p.append(int(part[a_]))
            rows_b.append(_ipc_bytes(pa.table({
                "u": pa.array(u[a_:b_]), "d": pa.array(d[a_:b_])})))
        return pa.table({
            "part": pa.array(rows_p, type=pa.int32()),
            "blob": pa.array(rows_b, type=pa.large_binary()),
        })

    def merge(df) -> pa.Table:
        tabs = [_ipc_table(b) for b in df["blob"]]
        t = pa.concat_tables(tabs) if tabs else pa.table(
            {"u": pa.array([], type=pa.int64()),
             "d": pa.array([], type=pa.int64())})
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table({
            "k": pa.array([], type=pa.int64()),
            "grain": pa.array([], type=pa.int32()),
            "pn": pa.array([], type=pa.int64()),
        })
        if not len(u):
            return empty
        key = u * 100_000 + d
        uniq = np.unique(key)
        uu, dd = uniq // 100_000, uniq % 100_000
        # per-day distinct users in this partition (partials sum exactly:
        # a user lives in exactly one partition)
        du, dc = np.unique(dd, return_counts=True)
        # per-month distinct users: distinct (user, month)
        mm = dd.astype("datetime64[D]").astype("datetime64[M]") \
            .astype(np.int64)
        mk = np.unique(uu * 4096 + (mm % 4096))
        mu_, mc = np.unique(mk % 4096, return_counts=True)
        return pa.table({
            "k": pa.array(np.concatenate([du, mu_]).astype(np.int64)),
            "grain": pa.array(np.concatenate(
                [np.zeros(len(du)), np.ones(len(mu_))]).astype(np.int32)),
            "pn": pa.array(np.concatenate([dc, mc]).astype(np.int64)),
        })

    g = (ds.map_batches(tag, batch_format="pyarrow", batch_size=None)
         .groupby("part").map_groups(merge, batch_format="pandas")
         .groupby(["grain", "k"]).aggregate(Sum("pn", alias_name="n"))) \
        .to_pandas()
    days = g[g["grain"] == 0].sort_values("k", ignore_index=True)
    mons = g[g["grain"] == 1].sort_values("k", ignore_index=True)
    day_month = days["k"].to_numpy().astype("datetime64[D]") \
        .astype("datetime64[M]").astype(np.int64) % 4096 \
        if len(days) else np.empty(0, np.int64)
    out_m, out_mau, out_sd, out_nd, out_avg, out_st = [], [], [], [], [], []
    mau_of = dict(zip(mons["k"].astype(int), mons["n"].astype(int)))
    for m in sorted(mau_of):
        sel = day_month == m
        sd = int(days["n"].to_numpy()[sel].sum())
        nd = int(sel.sum())
        mau = mau_of[m]
        avg = float(sd) / float(nd)
        out_m.append(m)
        out_mau.append(mau)
        out_sd.append(sd)
        out_nd.append(nd)
        out_avg.append(float(round_half_away(np.float64(avg))))
        out_st.append(float(round_half_away(np.float64(
            avg / float(mau)))))
    # m % 4096 == m for the whole supported epoch range (months since
    # 1970 stay < 4096 until year 2311), so k IS the absolute month
    months = np.array(out_m, dtype=np.int64).astype("datetime64[M]") \
        .astype("datetime64[us]") if out_m else \
        np.empty(0, "datetime64[us]")
    import ray.data as _rd
    return _rd.from_arrow(pa.table({
        "month": pa.array(months),
        "mau": pa.array(out_mau, type=pa.int64()),
        "sum_dau": pa.array(out_sd, type=pa.int64()),
        "n_days": pa.array(out_nd, type=pa.int64()),
        "avg_dau": pa.array(out_avg, type=pa.float64()),
        "stickiness": pa.array(out_st, type=pa.float64()),
    }))


DAU_MAU_SQL = """
WITH e AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS d, user_id
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
dd AS (SELECT d, CAST(count(*) AS BIGINT) AS dau FROM e GROUP BY 1),
mm AS (SELECT date_trunc('month', make_timestamp(d * 86400000000))
              AS month, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
       FROM e GROUP BY 1),
md AS (SELECT date_trunc('month', make_timestamp(d * 86400000000))
              AS month, CAST(sum(dau) AS BIGINT) AS sum_dau,
              CAST(count(*) AS BIGINT) AS n_days
       FROM dd GROUP BY 1)
SELECT month, mau, sum_dau, n_days,
       round(CAST(sum_dau AS DOUBLE) / CAST(n_days AS DOUBLE), 6)
         AS avg_dau,
       round(CAST(sum_dau AS DOUBLE) / CAST(n_days AS DOUBLE)
             / CAST(mau AS DOUBLE), 6) AS stickiness
FROM mm JOIN md USING (month) ORDER BY month"""


def day_user_jaccard(sf_dir: str, n_parts: int = 64):
    """Audience-overlap series: the Jaccard similarity between the
    active-user sets of consecutive calendar days — (day, next_day,
    n_a, n_b, n_both, jaccard), one row per adjacent pair of days BOTH
    present in the data.  High churn shows up as a low Jaccard even when
    DAU is flat; the set-overlap companion of :func:`dau_mau` and
    cohort_retention.

    Scale plan: per-batch-DISTINCT (day, user) pairs ride the same
    user-hashed blob co-partition as dau_mau (set membership is not
    partially summable); each user\'s day set is wholly local, so the
    per-partition count of users active on both d and d+1 sums exactly
    across partitions.  Merge blocks emit calendar-bounded (day,
    n_users, n_both_with_next) partials; the driver assembles the
    bounded series.  Assumes ts >= 1970 (same // truncation standing
    assumption as dau_mau).
    """
    from ray.data.aggregate import Sum

    from .join import _ipc_bytes, _ipc_table, _part_of
    from .text import round_half_away

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def tag(batch: pa.Table) -> pa.Table:
        batch = _drop_null_users(_drop_null_ts(batch))
        u = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) // 86_400_000_000
        key = u * 100_000 + d
        order = np.argsort(key, kind="stable")
        ks = key[order]
        first = np.concatenate([[True], ks[1:] != ks[:-1]]) \
            if len(ks) else np.empty(0, bool)
        uu = u[order][first]
        du = d[order][first]
        part = _part_of(uu, n_parts).astype(np.int64)
        ordp = np.argsort(part, kind="stable")
        part, uu, du = part[ordp], uu[ordp], du[ordp]
        bstarts = np.concatenate(
            [[0], np.flatnonzero(part[1:] != part[:-1]) + 1,
             [len(part)]]) if len(part) else np.array([0, 0])
        rows_p, rows_b = [], []
        for a_, b_ in zip(bstarts[:-1], bstarts[1:]):
            if b_ <= a_:
                continue
            rows_p.append(int(part[a_]))
            rows_b.append(_ipc_bytes(pa.table({
                "u": pa.array(uu[a_:b_]), "d": pa.array(du[a_:b_])})))
        return pa.table({
            "part": pa.array(rows_p, type=pa.int32()),
            "blob": pa.array(rows_b, type=pa.large_binary()),
        })

    def merge(df) -> pa.Table:
        tabs = [_ipc_table(b) for b in df["blob"]]
        t = pa.concat_tables(tabs) if tabs else pa.table(
            {"u": pa.array([], type=pa.int64()),
             "d": pa.array([], type=pa.int64())})
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table({
            "d": pa.array([], type=pa.int64()),
            "pn": pa.array([], type=pa.int64()),
            "pb": pa.array([], type=pa.int64()),
        })
        if not len(u):
            return empty
        key = np.unique(u * 100_000 + d)
        uu, dd = key // 100_000, key % 100_000
        day_u, day_c = np.unique(dd, return_counts=True)
        both = (uu[1:] == uu[:-1]) & (dd[1:] == dd[:-1] + 1)
        bd_u, bd_c = np.unique(dd[:-1][both], return_counts=True)
        alld = np.unique(np.concatenate([day_u, bd_u]))
        pn = np.zeros(len(alld), dtype=np.int64)
        pb = np.zeros(len(alld), dtype=np.int64)
        pn[np.searchsorted(alld, day_u)] = day_c
        pb[np.searchsorted(alld, bd_u)] = bd_c
        return pa.table({
            "d": pa.array(alld.astype(np.int64)),
            "pn": pa.array(pn),
            "pb": pa.array(pb),
        })

    g = (ds.map_batches(tag, batch_format="pyarrow", batch_size=None)
         .groupby("part").map_groups(merge, batch_format="pandas")
         .groupby("d").aggregate(Sum("pn"), Sum("pb"))) \
        .to_pandas().sort_values("d", ignore_index=True)
    dd = g["d"].to_numpy().astype(np.int64) if len(g) else \
        np.empty(0, np.int64)
    na = g["sum(pn)"].to_numpy().astype(np.int64) if len(g) else \
        np.empty(0, np.int64)
    nb_ = g["sum(pb)"].to_numpy().astype(np.int64) if len(g) else \
        np.empty(0, np.int64)
    rows = {"day": [], "next_day": [], "n_a": [], "n_b": [],
            "n_both": [], "jaccard": []}
    pos = {int(v): i for i, v in enumerate(dd)}
    for i, d0 in enumerate(dd):
        j = pos.get(int(d0) + 1)
        if j is None:
            continue
        a, b, nb2 = int(na[i]), int(na[j]), int(nb_[i])
        rows["day"].append(int(d0))
        rows["next_day"].append(int(d0) + 1)
        rows["n_a"].append(a)
        rows["n_b"].append(b)
        rows["n_both"].append(nb2)
        rows["jaccard"].append(float(round_half_away(np.float64(
            float(nb2) / float(a + b - nb2)))))
    import ray.data as _rd
    return _rd.from_arrow(pa.table({
        "day": pa.array(rows["day"], type=pa.int64()),
        "next_day": pa.array(rows["next_day"], type=pa.int64()),
        "n_a": pa.array(rows["n_a"], type=pa.int64()),
        "n_b": pa.array(rows["n_b"], type=pa.int64()),
        "n_both": pa.array(rows["n_both"], type=pa.int64()),
        "jaccard": pa.array(rows["jaccard"], type=pa.float64()),
    }))


DAY_USER_JACCARD_SQL = """
WITH du AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS d, user_id
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL),
da AS (SELECT d, CAST(count(*) AS BIGINT) AS n FROM du GROUP BY 1),
bo AS (SELECT a.d AS d, CAST(count(*) AS BIGINT) AS n_both
       FROM du a JOIN du b ON b.user_id = a.user_id AND b.d = a.d + 1
       GROUP BY 1)
SELECT CAST(a.d AS BIGINT) AS day, CAST(b.d AS BIGINT) AS next_day,
       a.n AS n_a, b.n AS n_b,
       CAST(coalesce(bo.n_both, 0) AS BIGINT) AS n_both,
       round(CAST(coalesce(bo.n_both, 0) AS DOUBLE)
             / CAST(a.n + b.n - coalesce(bo.n_both, 0) AS DOUBLE), 6)
         AS jaccard
FROM da a JOIN da b ON b.d = a.d + 1
LEFT JOIN bo ON bo.d = a.d
ORDER BY 1"""


def activity_curve(sf_dir: str, n_parts: int = 64):
    """Cohort-free retention curve: the share of users active k days
    after their OWN first day — (day_offset, n_users, rate); rate is
    against the offset-0 population (every user is active on their
    first day, so n_users(0) == total users).  The standard "does the
    product retain?" curve, user-aligned rather than calendar-aligned
    (cohort_retention is the calendar-aligned variant).

    Scale plan: distinct (user, day) pairs collapse per batch, ride ONE
    user-hashed blob co-partition, and each merge block turns its users
    into per-offset distinct-user count partials (calendar-bounded);
    one tiny groupby sums them and the rate is the mirrored division.
    NULL user/ts drop on both engines.
    """
    import ray.data
    from ray.data.aggregate import Sum

    from .join import _ipc_bytes, _ipc_table, _part_of
    from .text import round_half_away

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def tag(batch: pa.Table) -> pa.Table:
        # Arrow-level null drop first (see user_growth.tag)
        batch = _drop_null_ts(_drop_null_users(batch))
        uu = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        assert len(d) == 0 or (d.min() >= 0 and d.max() < 50000), \
            "activity_curve day packing assumes days in [0, 50000)"
        key = uu * np.int64(50000) + d
        uk = np.unique(key)
        uu, d = uk // 50000, uk % 50000
        part = _part_of(uu, n_parts).astype(np.int64)
        ordp = np.argsort(part, kind="stable")
        part, uu, d = part[ordp], uu[ordp], d[ordp]
        bstarts = np.concatenate(
            [[0], np.flatnonzero(part[1:] != part[:-1]) + 1,
             [len(part)]]) if len(part) else np.array([0, 0])
        rows_p, rows_b = [], []
        for a_, b_ in zip(bstarts[:-1], bstarts[1:]):
            if b_ <= a_:
                continue
            rows_p.append(int(part[a_]))
            rows_b.append(_ipc_bytes(pa.table({
                "u": pa.array(uu[a_:b_]), "d": pa.array(d[a_:b_])})))
        return pa.table({
            "part": pa.array(rows_p, type=pa.int32()),
            "blob": pa.array(rows_b, type=pa.large_binary()),
        })

    def merge(df) -> pa.Table:
        tabs = [_ipc_table(b) for b in df["blob"]]
        t = pa.concat_tables(tabs) if tabs else pa.table(
            {"u": pa.array([], type=pa.int64()),
             "d": pa.array([], type=pa.int64())})
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(u):
            return pa.table({"off": pa.array([], type=pa.int64()),
                             "pn": pa.array([], type=pa.int64())})
        key = np.unique(u * np.int64(50000) + d)   # global distinct
        u, d = key // 50000, key % 50000
        starts = np.concatenate(
            [[0], np.flatnonzero(u[1:] != u[:-1]) + 1]).astype(np.int64)
        first = np.repeat(np.minimum.reduceat(d, starts),
                          np.diff(np.concatenate(
                              [starts, [len(u)]])).astype(np.int64))
        off = d - first
        uo, cnt = np.unique(off, return_counts=True)
        return pa.table({"off": pa.array(uo),
                         "pn": pa.array(cnt.astype(np.int64))})

    m = (ds.map_batches(tag, batch_format="pyarrow", batch_size=None)
         .groupby("part")
         .map_groups(merge, batch_format="pandas")
         .groupby("off").aggregate(Sum("pn", alias_name="n_users"))) \
        .to_pandas().sort_values("off", ignore_index=True)
    import ray.data as _rd
    if not len(m):
        return _rd.from_arrow(pa.table({
            "day_offset": pa.array([], type=pa.int64()),
            "n_users": pa.array([], type=pa.int64()),
            "rate": pa.array([], type=pa.float64())}))
    total = int(m.loc[m["off"] == 0, "n_users"].iloc[0])
    rate = [float(round_half_away(np.float64(
        float(int(n_)) / float(total))))
        for n_ in m["n_users"]]
    return _rd.from_arrow(pa.table({
        "day_offset": pa.array(m["off"].to_numpy().astype(np.int64)),
        "n_users": pa.array(m["n_users"].to_numpy().astype(np.int64)),
        "rate": pa.array(rate, type=pa.float64()),
    }))


ACTIVITY_CURVE_SQL = """
WITH d AS (SELECT DISTINCT user_id,
                  CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
           FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL),
f AS (SELECT user_id, min(day) AS f0 FROM d GROUP BY 1),
c AS (SELECT d.day - f.f0 AS off, CAST(count(*) AS BIGINT) AS n_users
      FROM d JOIN f USING (user_id) GROUP BY 1),
t AS (SELECT n_users AS total FROM c WHERE off = 0)
SELECT c.off AS day_offset, c.n_users,
       round(CAST(c.n_users AS DOUBLE) / CAST(t.total AS DOUBLE), 6)
         AS rate
FROM c CROSS JOIN t ORDER BY 1"""


def event_trigrams(sf_dir: str, n_parts: int = 64):
    """Third-order path mining: counts of CONSECUTIVE event-type
    triples per user in (ts, event_id) order — (trigram, n), trigram
    as "a,b,c".  Extends event_transitions' bigram matrix to the
    three-step funnels ("view,click,purchase") product analytics
    actually asks for; output is type-vocabulary bounded (K^3).

    Scale plan: only (user, ts, event_id, type) rides ONE user-hashed
    blob co-partition; each merge block lexsorts once, detects
    same-user runs vectorized, packs type codes into one int key
    (K^2 factorized per block) and emits (trigram, count) partials;
    the final groupby is K^3-bounded.  NULL user/ts/type drop BEFORE
    sequencing on both engines (adjacency is over the kept rows).
    """
    import ray.data
    from ray.data.aggregate import Sum

    from .join import _ipc_bytes, _ipc_table, _part_of

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"])

    def tag(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # Arrow-level null drop first (see user_growth.tag)
        batch = _drop_null_ts(_drop_null_users(batch))
        if batch["event_type"].null_count:
            batch = batch.filter(pc.is_valid(batch["event_type"]))
        uu = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        tsv = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = batch["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ty = batch["event_type"].to_pandas().astype(str).to_numpy()
        part = _part_of(uu, n_parts).astype(np.int64)
        ordp = np.argsort(part, kind="stable")
        part, uu, tsv, eid, ty = (part[ordp], uu[ordp], tsv[ordp],
                                  eid[ordp], ty[ordp])
        bstarts = np.concatenate(
            [[0], np.flatnonzero(part[1:] != part[:-1]) + 1,
             [len(part)]]) if len(part) else np.array([0, 0])
        rows_p, rows_b = [], []
        for a_, b_ in zip(bstarts[:-1], bstarts[1:]):
            if b_ <= a_:
                continue
            rows_p.append(int(part[a_]))
            rows_b.append(_ipc_bytes(pa.table({
                "u": pa.array(uu[a_:b_]), "ts": pa.array(tsv[a_:b_]),
                "e": pa.array(eid[a_:b_]),
                "t": pa.array(ty[a_:b_], type=pa.string())})))
        return pa.table({
            "part": pa.array(rows_p, type=pa.int32()),
            "blob": pa.array(rows_b, type=pa.large_binary()),
        })

    def merge(df) -> pa.Table:
        tabs = [_ipc_table(b) for b in df["blob"]]
        t = pa.concat_tables(tabs) if tabs else pa.table(
            {"u": pa.array([], type=pa.int64()),
             "ts": pa.array([], type=pa.int64()),
             "e": pa.array([], type=pa.int64()),
             "t": pa.array([], type=pa.string())})
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype(np.int64)
        e = t["e"].to_numpy(zero_copy_only=False).astype(np.int64)
        ty = np.asarray(t["t"].to_pandas(), dtype=object)
        if len(u) < 3:
            return pa.table({"trigram": pa.array([], type=pa.string()),
                             "pn": pa.array([], type=pa.int64())})
        order = np.lexsort((e, ts, u))
        u, ty = u[order], ty[order]
        codes, uniq = pd.factorize(pd.Series(ty))
        K = np.int64(len(uniq))
        same3 = (u[:-2] == u[1:-1]) & (u[1:-1] == u[2:])
        c = codes.astype(np.int64)
        key = (c[:-2] * K + c[1:-1]) * K + c[2:]
        uk, cnt = np.unique(key[same3], return_counts=True)
        tri = [f"{uniq[k // (K * K)]},{uniq[(k // K) % K]},{uniq[k % K]}"
               for k in uk.tolist()]
        return pa.table({"trigram": pa.array(tri, type=pa.string()),
                         "pn": pa.array(cnt.astype(np.int64))})

    return (ds.map_batches(tag, batch_format="pyarrow", batch_size=None)
            .groupby("part")
            .map_groups(merge, batch_format="pandas")
            .groupby("trigram").aggregate(Sum("pn", alias_name="n"))
            .sort("trigram"))


EVENT_TRIGRAMS_SQL = """
WITH s AS (SELECT user_id, event_type,
                  lead(event_type, 1) OVER w AS t2,
                  lead(event_type, 2) OVER w AS t3
           FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL
             AND event_type IS NOT NULL
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT event_type || ',' || t2 || ',' || t3 AS trigram,
       CAST(count(*) AS BIGINT) AS n
FROM s WHERE t2 IS NOT NULL AND t3 IS NOT NULL
GROUP BY 1 ORDER BY 1"""


def weekly_ma(sf_dir: str, window_days: int = 7):
    """Trailing moving average of the dense daily count series per
    event type — (event_type, day, n_events, ma); ma is the
    ``window_days``-day trailing mean (shorter at the series head,
    exactly like the SQL frame).  The smoothed companion of
    daily_cusum's excursions.

    Exactness: counts come from the shared bounded daily-count family;
    the trailing sum is an integer prefix difference and the ONLY float
    op is the mirrored division by the actual (clipped) window length.
    """
    import ray.data

    from .text import round_half_away

    W = int(window_days)
    m = _daily_counts(sf_dir)
    out = {"event_type": [], "day": [], "n_events": [], "ma": []}
    if len(m):
        d0, d1 = int(m["d"].min()), int(m["d"].max())
        ndays = d1 - d0 + 1
        for t, grp in m.groupby("t", sort=True):
            dense = np.zeros(ndays, dtype=np.int64)
            for d_, n_ in zip(grp["d"].to_numpy(), grp["n"].to_numpy()):
                dense[int(d_) - d0] = int(n_)
            pref = np.concatenate([[0], np.cumsum(dense)])
            for i in range(ndays):
                lo = max(0, i - W + 1)
                s = int(pref[i + 1] - pref[lo])
                w = i + 1 - lo
                out["event_type"].append(t)
                out["day"].append(d0 + i)
                out["n_events"].append(int(dense[i]))
                out["ma"].append(float(round_half_away(np.float64(
                    float(s) / float(w)))))
    return ray.data.from_arrow(pa.table({
        "event_type": pa.array(out["event_type"], type=pa.string()),
        "day": pa.array(out["day"], type=pa.int64()),
        "n_events": pa.array(out["n_events"], type=pa.int64()),
        "ma": pa.array(out["ma"], type=pa.float64()),
    }))


def weekly_ma_sql(window_days: int = 7) -> str:
    """Oracle for :func:`weekly_ma` — trailing ROWS frame over the
    zero-filled dense series."""
    return f"""
WITH e AS (SELECT event_type,
                  CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d
           FROM events
           WHERE ts IS NOT NULL AND event_type IS NOT NULL),
b AS (SELECT min(d) AS d0, max(d) AS d1 FROM e),
days AS (SELECT CAST(unnest(generate_series(b.d0, b.d1)) AS BIGINT) AS d
         FROM b),
ty AS (SELECT DISTINCT event_type FROM e),
c AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n
      FROM e GROUP BY 1, 2),
dense AS (SELECT ty.event_type, days.d, coalesce(c.n, 0) AS n
          FROM ty CROSS JOIN days
          LEFT JOIN c ON c.event_type = ty.event_type AND c.d = days.d)
SELECT event_type, d AS day, n AS n_events,
       round(CAST(sum(n) OVER w AS DOUBLE)
             / CAST(count(*) OVER w AS DOUBLE), 6) AS ma
FROM dense
WINDOW w AS (PARTITION BY event_type ORDER BY d
             ROWS BETWEEN {window_days - 1} PRECEDING AND CURRENT ROW)
ORDER BY 1, 2"""


def doc_lang_runs(sf_dir: str, bucket: int = 4096):
    """Runs statistic over the doc_id-ordered language sequence — ONE
    row (n_docs, n_runs, longest_run): how clumped is the corpus by
    language in ingest order (the Wald-Wolfowitz runs shape; a crawl
    that interleaves languages well has many short runs).  A
    distributed ORDERED scan, the one shape hash partitioning cannot
    give you.

    Scale plan: rows range-bucket by doc_id // ``bucket`` so each
    groupby task holds a CONTIGUOUS id range and reduces it to a
    constant-size segment summary (n, runs, longest, prefix/suffix run
    lengths, first/last lang, all-same flag); the driver folds the
    bucket summaries in id order with the classic segment-concat
    algebra (boundary runs merge when adjacent langs agree), so no
    global sort ever materializes.  NULL lang is its own value
    (IS DISTINCT FROM semantics, mirrored).
    """
    import ray.data
    from ray.data.aggregate import Sum  # noqa: F401  (family convention)

    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    B = np.int64(bucket)

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "bk": pa.array(ids // B),
            "doc_id": pa.array(ids),
            "lang": batch["lang"],
        })

    def summarize(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        lang = g["lang"].to_pandas()
        order = np.argsort(ids, kind="stable")
        lang = lang.iloc[order].reset_index(drop=True)
        n = len(lang)
        prev = lang.shift(1)
        neq = ~(lang.eq(prev) | (lang.isna() & prev.isna()))
        neq.iloc[0] = True
        brk = neq.to_numpy()
        runs = int(brk.sum())
        starts = np.flatnonzero(brk).astype(np.int64)
        lens = np.diff(np.concatenate([starts, [n]])).astype(np.int64)
        first = lang.iloc[0]
        last = lang.iloc[n - 1]
        return pa.table({
            "bk": pa.array([int(g["bk"][0].as_py())], type=pa.int64()),
            "n": pa.array([n], type=pa.int64()),
            "runs": pa.array([runs], type=pa.int64()),
            "longest": pa.array([int(lens.max())], type=pa.int64()),
            "pre": pa.array([int(lens[0])], type=pa.int64()),
            "suf": pa.array([int(lens[-1])], type=pa.int64()),
            "first": pa.array([None if pd.isna(first) else str(first)],
                              type=pa.string()),
            "last": pa.array([None if pd.isna(last) else str(last)],
                             type=pa.string()),
        })

    seg = (ds.map_batches(tag, batch_format="pyarrow", batch_size=None)
           .groupby("bk")
           .map_groups(summarize, batch_format="pyarrow")).to_pandas() \
        .sort_values("bk", ignore_index=True)

    if not len(seg):
        return ray.data.from_arrow(pa.table({
            "n_docs": pa.array([0], type=pa.int64()),
            "n_runs": pa.array([0], type=pa.int64()),
            "longest_run": pa.array([0], type=pa.int64())}))

    # segment-concat fold in id order
    n_docs = 0
    runs = 0
    longest = 0
    cur_last = object()          # sentinel: nothing yet
    cur_suf = 0
    for _, r in seg.iterrows():
        sn, sruns = int(r["n"]), int(r["runs"])
        same = (n_docs > 0
                and ((r["first"] is None and cur_last is None)
                     or (r["first"] is not None and cur_last is not None
                         and r["first"] == cur_last)))
        n_docs += sn
        runs += sruns - (1 if same else 0)
        longest = max(longest, int(r["longest"]))
        if same:
            joined = cur_suf + int(r["pre"])
            longest = max(longest, joined)
            # an all-one-run segment extends the joined trailing run
            cur_suf = joined if sruns == 1 else int(r["suf"])
        else:
            cur_suf = int(r["suf"])
        cur_last = r["last"]
    return ray.data.from_arrow(pa.table({
        "n_docs": pa.array([n_docs], type=pa.int64()),
        "n_runs": pa.array([runs], type=pa.int64()),
        "longest_run": pa.array([longest], type=pa.int64()),
    }))


DOC_LANG_RUNS_SQL = """
WITH s AS (SELECT doc_id, lang,
                  CASE WHEN lang IS DISTINCT FROM
                            lag(lang) OVER (ORDER BY doc_id)
                       THEN 1 ELSE 0 END AS brk
           FROM documents),
i AS (SELECT doc_id,
             sum(brk) OVER (ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM s),
r AS (SELECT island, CAST(count(*) AS BIGINT) AS len FROM i GROUP BY 1)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_runs,
       CAST(max(len) AS BIGINT) AS longest_run
FROM r"""


def _source_len_hist(sf_dir: str):
    """Shared (source, n_chars) count histogram: per-batch packed
    counting, one groupby bounded by length-SPREAD x sources, returned
    as a pandas frame (source, v, c).  NULL source / NULL n_chars drop
    (the documented contract of every length-distribution operator
    built on it: mann_whitney_length, ks_test_length,
    lognormal_fit_length)."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch["source"].null_count:
            batch = batch.filter(pc.is_valid(batch["source"]))
        if batch["n_chars"].null_count:
            batch = batch.filter(pc.is_valid(batch["n_chars"]))
        src = batch["source"].to_pandas().astype(str).to_numpy()
        ln = batch["n_chars"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if not len(src):
            return pa.table({"source": pa.array([], type=pa.string()),
                             "v": pa.array([], type=pa.int64()),
                             "pn": pa.array([], type=pa.int64())})
        scodes, suniq = pd.factorize(pd.Series(src))
        # n_chars is a document length < 2^40 by far, so the pack is safe
        key = scodes.astype(np.int64) * np.int64(2**40) + ln
        u, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "source": pa.array(suniq[(u // 2**40).astype(np.int64)],
                               type=pa.string()),
            "v": pa.array((u % 2**40).astype(np.int64)),
            "pn": pa.array(cnt.astype(np.int64)),
        })

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
            .groupby(["source", "v"])
            .aggregate(Sum("pn", alias_name="c"))).to_pandas()


def mann_whitney_length(sf_dir: str):
    """Mann-Whitney U rank test of the document-length distribution of
    each source against the rest of the corpus — (source, n_docs,
    u_stat, z_score), one row per source.  The nonparametric
    "is this provenance feeding us different-length documents?" drift
    test next to source_drift_psi (which needs binning; this one is
    distribution-free).

    Exactness: the test reduces ENTIRELY to the per-(source, n_chars)
    count histogram — global midranks come from cumulative counts
    (doubled to stay integer under ties: rank2 = 2*cum_before + c + 1),
    the per-source rank sum is an exact int64 dot product, and the tie
    correction T = sum(c^3 - c) is exact int64 (c < 2^21 per length at
    any corpus size).  U, mu and the tie-corrected sigma are ONE scalar
    float chain per source from those integers, mirrored op-for-op;
    z_score is NULL when sigma is 0 (all lengths tied) or a side is
    empty.  NULL source / NULL n_chars drop on both engines.

    Scale shape: per-batch (source, len) count partials, one groupby
    bounded by length-SPREAD x sources (never corpus rows), and a
    driver finish over that bounded histogram.
    """
    import math

    import ray.data

    h = _source_len_hist(sf_dir)
    out = {"source": [], "n_docs": [], "u_stat": [], "z_score": []}
    if len(h):
        g = h.groupby("v", sort=True)["c"].sum()
        vals = g.index.to_numpy().astype(np.int64)
        gc = g.to_numpy().astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(gc)[:-1]])
        rank2 = 2 * cum + gc + 1            # 2x the midrank
        big_n = int(gc.sum())
        tie_t = int(np.sum(gc.astype(object) ** 3 - gc))
        pos = {int(v_): i for i, v_ in enumerate(vals)}
        for s_, grp in h.groupby("source", sort=True):
            cs = np.zeros(len(vals), dtype=np.int64)
            for v_, c_ in zip(grp["v"], grp["c"]):
                cs[pos[int(v_)]] = int(c_)
            n1 = int(cs.sum())
            n2 = big_n - n1
            r12 = int(np.dot(cs, rank2))     # 2x the rank sum
            u2 = r12 - n1 * (n1 + 1)         # 2x the U statistic
            out["source"].append(s_)
            out["n_docs"].append(n1)
            out["u_stat"].append(float(u2) / 2.0)
            z = None
            if n1 and n2 and big_n > 1:
                var = float(n1) * float(n2) / 12.0 \
                    * (float(big_n + 1)
                       - float(tie_t) / (float(big_n)
                                         * float(big_n - 1)))
                if var > 0.0:
                    z = float(round_half_away(np.float64(
                        (float(u2) / 2.0
                         - float(n1) * float(n2) / 2.0)
                        / math.sqrt(var))))
            out["z_score"].append(z)
    return ray.data.from_arrow(pa.table({
        "source": pa.array(out["source"], type=pa.string()),
        "n_docs": pa.array(out["n_docs"], type=pa.int64()),
        "u_stat": pa.array(out["u_stat"], type=pa.float64()),
        "z_score": pa.array(out["z_score"], type=pa.float64()),
    }))


MANN_WHITNEY_LENGTH_SQL = """
WITH d AS (SELECT source, n_chars AS v FROM documents
           WHERE source IS NOT NULL AND n_chars IS NOT NULL),
h AS (SELECT source, v, CAST(count(*) AS BIGINT) AS c
      FROM d GROUP BY 1, 2),
g AS (SELECT v, CAST(sum(c) AS BIGINT) AS c FROM h GROUP BY 1),
r AS (SELECT v, 2 * (sum(c) OVER (ORDER BY v
                                  ROWS UNBOUNDED PRECEDING) - c)
             + c + 1 AS rank2
      FROM g),
nt AS (SELECT CAST(sum(c) AS BIGINT) AS n,
              CAST(sum(c * c * c - c) AS BIGINT) AS t FROM g),
s AS (SELECT h.source, CAST(sum(h.c) AS BIGINT) AS n1,
             CAST(sum(h.c * r.rank2) AS BIGINT) AS r12
      FROM h JOIN r USING (v) GROUP BY 1)
SELECT s.source AS source, s.n1 AS n_docs,
       CAST(s.r12 - s.n1 * (s.n1 + 1) AS DOUBLE) / 2.0 AS u_stat,
       CASE WHEN s.n1 = 0 OR nt.n - s.n1 = 0 OR nt.n <= 1
                 OR CAST(s.n1 AS DOUBLE) * CAST(nt.n - s.n1 AS DOUBLE)
                    / 12.0
                    * (CAST(nt.n + 1 AS DOUBLE)
                       - CAST(nt.t AS DOUBLE)
                         / (CAST(nt.n AS DOUBLE)
                            * CAST(nt.n - 1 AS DOUBLE))) <= 0.0
            THEN NULL
            ELSE round(
              (CAST(s.r12 - s.n1 * (s.n1 + 1) AS DOUBLE) / 2.0
               - CAST(s.n1 AS DOUBLE) * CAST(nt.n - s.n1 AS DOUBLE)
                 / 2.0)
              / sqrt(CAST(s.n1 AS DOUBLE) * CAST(nt.n - s.n1 AS DOUBLE)
                     / 12.0
                     * (CAST(nt.n + 1 AS DOUBLE)
                        - CAST(nt.t AS DOUBLE)
                          / (CAST(nt.n AS DOUBLE)
                             * CAST(nt.n - 1 AS DOUBLE)))), 6) END
         AS z_score
FROM s CROSS JOIN nt ORDER BY source"""


def kaplan_meier_gaps(sf_dir: str, n_parts: int = 64,
                      bucket_us: int = 3_600_000_000):
    """Kaplan-Meier survival curve of the per-user inter-event waiting
    time, right-censored at the corpus horizon — (gap_hours, n_risk,
    n_events, n_censored, survival), one row per occupied hour bucket.
    Every consecutive same-user gap is an observed "death" at its
    duration; each user's open interval from their LAST event to the
    global max timestamp is a censored observation (the user had not
    yet returned when the data ends) — dropping it, as a naive gap
    ECDF does, biases return-time estimates short.  The product-limit
    estimator is the standard correction.

    Exactness: bucket counts (d_i deaths, c_i censored per hour) are
    exact int64 from one co-partition pass; n_risk is an exact integer
    running difference; survival is the ORDER-PINNED ascending-bucket
    product of (1.0 - d_i/n_risk_i) seeded at 1.0, mirrored
    term-for-term by the oracle's list_reduce over
    list(... ORDER BY b) with a 1.0 prepend (the daily_ewma fold
    precedent).  NULL user / NULL ts drop (house contract); assumes
    ts >= 1970 (// truncation, the standing dau_mau assumption —
    gaps and horizons are non-negative regardless).

    Scale shape: one tiny global-max scan, ONE user-hash co-partition
    whose merge blocks emit only (hour-bucket, counts) partials, a
    bucket-bounded groupby, and a driver fold over the bounded
    (timespan / 1 hour) table — corpus rows shuffle once, counts
    after that.
    """
    import ray.data
    from ray.data.aggregate import Max, Sum

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def tmax_partial(batch: pa.Table) -> pa.Table:
        batch = _drop_null_ts(_drop_null_users(batch))
        if not len(batch):
            return pa.table({"t": pa.array([], type=pa.int64())})
        t = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        return pa.table({"t": pa.array([int(t.max())])})

    agg = ds.map_batches(tmax_partial, batch_format="pyarrow",
                         batch_size=None).aggregate(Max("t"))
    tmax = agg.get("max(t)") if agg else None
    empty = pa.table({
        "gap_hours": pa.array([], type=pa.int64()),
        "n_risk": pa.array([], type=pa.int64()),
        "n_events": pa.array([], type=pa.int64()),
        "n_censored": pa.array([], type=pa.int64()),
        "survival": pa.array([], type=pa.float64()),
    })
    if tmax is None:
        return ray.data.from_arrow(empty)
    tmax = int(tmax)

    def add_part(batch: pa.Table) -> pa.Table:
        batch = _drop_null_ts(_drop_null_users(
            batch.replace_schema_metadata(None)))
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array((uid % n_parts).astype(np.int32)))

    def km_counts(df: pd.DataFrame) -> pd.DataFrame:
        z = pd.Series(dtype=np.int64)
        if len(df) == 0:
            return pd.DataFrame({"b": z, "pd_": z, "pc_": z})
        df = df.sort_values(["user_id", "ts"]).reset_index(drop=True)
        t = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        uid = df["user_id"].to_numpy()
        same = np.concatenate([[False], uid[1:] == uid[:-1]])
        gaps = np.concatenate([[0], t[1:] - t[:-1]])[same]
        gb = gaps // bucket_us
        last = np.concatenate([uid[1:] != uid[:-1], [True]])
        cb = (tmax - t[last]) // bucket_us
        ub, cnt = np.unique(gb, return_counts=True)
        uc, ccnt = np.unique(cb, return_counts=True)
        allb = np.unique(np.concatenate([ub, uc]))
        d = np.zeros(len(allb), dtype=np.int64)
        c = np.zeros(len(allb), dtype=np.int64)
        d[np.searchsorted(allb, ub)] = cnt
        c[np.searchsorted(allb, uc)] = ccnt
        return pd.DataFrame({"b": allb.astype(np.int64),
                             "pd_": d, "pc_": c})

    h = (ds.map_batches(add_part, batch_format="pyarrow",
                        batch_size=None)
         .groupby("part").map_groups(km_counts, batch_format="pandas")
         .groupby("b").aggregate(Sum("pd_", alias_name="d"),
                                 Sum("pc_", alias_name="c"))) \
        .to_pandas().sort_values("b", ignore_index=True)
    if not len(h):
        return ray.data.from_arrow(empty)
    d = h["d"].to_numpy().astype(np.int64)
    c = h["c"].to_numpy().astype(np.int64)
    big_n = int((d + c).sum())
    consumed = np.concatenate([[0], np.cumsum(d + c)[:-1]])
    n_risk = big_n - consumed
    surv = np.empty(len(h), dtype=np.float64)
    acc = 1.0
    for i in range(len(h)):
        if d[i] > 0:
            acc = acc * (1.0 - float(d[i]) / float(n_risk[i]))
        surv[i] = acc
    return ray.data.from_arrow(pa.table({
        "gap_hours": pa.array(h["b"].to_numpy().astype(np.int64)),
        "n_risk": pa.array(n_risk.astype(np.int64)),
        "n_events": pa.array(d),
        "n_censored": pa.array(c),
        "survival": pa.array(round_half_away(surv, 6)),
    }))


KAPLAN_MEIER_SQL = """
WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL),
mx AS (SELECT max(t) AS tmax FROM e),
g AS (SELECT t - lag(t) OVER (PARTITION BY user_id ORDER BY t) AS gap
      FROM e),
durs AS (SELECT CAST(gap // 3600000000 AS BIGINT) AS b, 0 AS cens
         FROM g WHERE gap IS NOT NULL
         UNION ALL
         SELECT CAST(((SELECT tmax FROM mx) - max(t)) // 3600000000
                     AS BIGINT) AS b, 1 AS cens
         FROM e GROUP BY user_id),
h AS (SELECT b,
             CAST(coalesce(count(*) FILTER (cens = 0), 0) AS BIGINT)
               AS d,
             CAST(coalesce(count(*) FILTER (cens = 1), 0) AS BIGINT)
               AS c
      FROM durs GROUP BY 1),
n AS (SELECT CAST(sum(d + c) AS BIGINT) AS n FROM h),
r AS (SELECT b, d, c,
             (SELECT n FROM n)
             - (sum(d + c) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
                - (d + c)) AS n_risk
      FROM h)
SELECT r.b AS gap_hours, CAST(r.n_risk AS BIGINT) AS n_risk,
       r.d AS n_events, r.c AS n_censored,
       round((SELECT list_reduce(
                list_prepend(CAST(1.0 AS DOUBLE),
                  list(1.0 - CAST(r2.d AS DOUBLE)
                             / CAST(r2.n_risk AS DOUBLE)
                       ORDER BY r2.b)),
                (a, x) -> a * x)
              FROM r r2 WHERE r2.d > 0 AND r2.b <= r.b), 6)
         AS survival
FROM r ORDER BY r.b"""


def ks_test_length(sf_dir: str):
    """Two-sample Kolmogorov-Smirnov statistic of each source's
    document-length distribution against the rest of the corpus —
    (source, n_docs, ks_d, at_length): the max absolute ECDF gap and
    the smallest length where it is attained.  The supremum-norm
    companion of mann_whitney_length (U detects location shift; D
    detects ANY distributional change, including variance-only drift).

    Exactness: D = max_v |F1(v) - F2(v)| over the shared
    (source, n_chars) histogram reduces to EXACT integers —
    |cum1(v) * n2 - cum2(v) * n1| maximized as int64 (bounded by
    n1 * n2 < 2^63 for corpora to ~3e9 docs per side, documented), with
    ONE float division at the end; at_length is the smallest v
    attaining the integer max (identical tie-break both engines).
    NULL source / NULL n_chars drop; D is NULL when either side is
    empty.

    Scale shape: the _source_len_hist shuffle (length-spread bounded)
    plus a driver finish over the bounded histogram.
    """
    import ray.data

    h = _source_len_hist(sf_dir)
    out = {"source": [], "n_docs": [], "ks_d": [], "at_length": []}
    if len(h):
        g = h.groupby("v", sort=True)["c"].sum()
        vals = g.index.to_numpy().astype(np.int64)
        gc = g.to_numpy().astype(np.int64)
        big_n = int(gc.sum())
        pos = {int(v_): i for i, v_ in enumerate(vals)}
        for s_, grp in h.groupby("source", sort=True):
            cs = np.zeros(len(vals), dtype=np.int64)
            for v_, c_ in zip(grp["v"], grp["c"]):
                cs[pos[int(v_)]] = int(c_)
            n1 = int(cs.sum())
            n2 = big_n - n1
            out["source"].append(s_)
            out["n_docs"].append(n1)
            if n1 == 0 or n2 == 0:
                out["ks_d"].append(None)
                out["at_length"].append(None)
                continue
            cum1 = np.cumsum(cs)
            cum2 = np.cumsum(gc - cs)
            gap = np.abs(cum1 * n2 - cum2 * n1)
            best = int(gap.max())
            at = int(vals[int(np.argmax(gap))])
            out["ks_d"].append(float(round_half_away(np.float64(
                float(best) / (float(n1) * float(n2))))))
            out["at_length"].append(at)
    return ray.data.from_arrow(pa.table({
        "source": pa.array(out["source"], type=pa.string()),
        "n_docs": pa.array(out["n_docs"], type=pa.int64()),
        "ks_d": pa.array(out["ks_d"], type=pa.float64()),
        "at_length": pa.array(out["at_length"], type=pa.int64()),
    }))


KS_TEST_LENGTH_SQL = """
WITH d AS (SELECT source, n_chars AS v FROM documents
           WHERE source IS NOT NULL AND n_chars IS NOT NULL),
h AS (SELECT source, v, CAST(count(*) AS BIGINT) AS c
      FROM d GROUP BY 1, 2),
vv AS (SELECT DISTINCT v FROM h),
ss AS (SELECT DISTINCT source FROM h),
f AS (SELECT ss.source, vv.v, CAST(coalesce(h.c, 0) AS BIGINT) AS c
      FROM ss CROSS JOIN vv
      LEFT JOIN h ON h.source = ss.source AND h.v = vv.v),
g AS (SELECT v, CAST(sum(c) AS BIGINT) AS gc FROM f GROUP BY 1),
cum AS (SELECT f.source, f.v,
               sum(f.c) OVER (PARTITION BY f.source ORDER BY f.v
                              ROWS UNBOUNDED PRECEDING) AS cum1,
               sum(g.gc - f.c) OVER (PARTITION BY f.source ORDER BY f.v
                                     ROWS UNBOUNDED PRECEDING) AS cum2
        FROM f JOIN g USING (v)),
n1 AS (SELECT source, CAST(sum(c) AS BIGINT) AS n1 FROM f GROUP BY 1),
nn AS (SELECT CAST(sum(gc) AS BIGINT) AS n FROM g),
gaps AS (SELECT cum.source, cum.v,
                abs(CAST(cum.cum1 AS BIGINT) * (nn.n - n1.n1)
                    - CAST(cum.cum2 AS BIGINT) * n1.n1) AS gap
         FROM cum JOIN n1 USING (source) CROSS JOIN nn),
best AS (SELECT source, max(gap) AS best FROM gaps GROUP BY 1),
at_ AS (SELECT gaps.source, min(gaps.v) AS at_length
        FROM gaps JOIN best ON best.source = gaps.source
                           AND gaps.gap = best.best
        GROUP BY 1)
SELECT n1.source AS source, n1.n1 AS n_docs,
       CASE WHEN n1.n1 = 0 OR nn.n - n1.n1 = 0 THEN NULL
            ELSE round(CAST(best.best AS DOUBLE)
                       / (CAST(n1.n1 AS DOUBLE)
                          * CAST(nn.n - n1.n1 AS DOUBLE)), 6) END
         AS ks_d,
       CASE WHEN n1.n1 = 0 OR nn.n - n1.n1 = 0 THEN NULL
            ELSE at_.at_length END AS at_length
FROM n1 JOIN best USING (source) JOIN at_ USING (source) CROSS JOIN nn
ORDER BY source"""


def lognormal_fit_length(sf_dir: str):
    """Method-of-moments lognormal fit of each source's document-length
    distribution — (source, n_docs, mu, sigma, median_est): the mean
    and standard deviation of ln(n_chars) and the implied median
    exp(mu).  Web-document lengths are canonically lognormal-ish; a
    drifting (mu, sigma) pair is the parametric summary next to the
    nonparametric KS/U tests sharing this histogram.

    Exactness: the fit reduces to the (source, n_chars) histogram, so
    ln runs once per DISTINCT length (libm math.log, the PMI mirror)
    and the float moment folds are ORDER-PINNED ascending length via
    weighted sequential sums — mirrored by the oracle's list_reduce
    over list(c * ln(v) ORDER BY v) with a 0.0 prepend.  Zero-length
    documents are excluded (ln undefined; mirrored WHERE v > 0).
    sigma uses the population form sqrt(m2/n - mu^2), clamped at 0
    before sqrt on both engines (float cancellation guard).

    Scale shape: the _source_len_hist shuffle + a driver fold over the
    bounded histogram.
    """
    import math

    import ray.data

    h = _source_len_hist(sf_dir)
    out = {"source": [], "n_docs": [], "mu": [], "sigma": [],
           "median_est": []}
    if len(h):
        h = h[h["v"] > 0]
        for s_, grp in h.groupby("source", sort=True):
            grp = grp.sort_values("v", ignore_index=True)
            n = int(grp["c"].sum())
            s1 = 0.0
            s2 = 0.0
            for v_, c_ in zip(grp["v"], grp["c"]):
                lv = math.log(float(int(v_)))
                s1 = s1 + float(int(c_)) * lv
                s2 = s2 + float(int(c_)) * (lv * lv)
            out["source"].append(s_)
            out["n_docs"].append(n)
            if n == 0:
                out["mu"].append(None)
                out["sigma"].append(None)
                out["median_est"].append(None)
                continue
            mu = s1 / float(n)
            var = s2 / float(n) - mu * mu
            sig = math.sqrt(var) if var > 0.0 else 0.0
            out["mu"].append(float(round_half_away(np.float64(mu))))
            out["sigma"].append(float(round_half_away(np.float64(sig))))
            out["median_est"].append(float(round_half_away(
                np.float64(math.exp(mu)), 3)))
    return ray.data.from_arrow(pa.table({
        "source": pa.array(out["source"], type=pa.string()),
        "n_docs": pa.array(out["n_docs"], type=pa.int64()),
        "mu": pa.array(out["mu"], type=pa.float64()),
        "sigma": pa.array(out["sigma"], type=pa.float64()),
        "median_est": pa.array(out["median_est"], type=pa.float64()),
    }))


LOGNORMAL_FIT_LENGTH_SQL = """
WITH d AS (SELECT source, n_chars AS v FROM documents
           WHERE source IS NOT NULL AND n_chars IS NOT NULL
             AND n_chars > 0),
h AS (SELECT source, v, CAST(count(*) AS BIGINT) AS c
      FROM d GROUP BY 1, 2),
m AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(c AS DOUBLE) * ln(CAST(v AS DOUBLE))
                    ORDER BY v)), (a, x) -> a + x) AS s1,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(c AS DOUBLE) * (ln(CAST(v AS DOUBLE))
                                         * ln(CAST(v AS DOUBLE)))
                    ORDER BY v)), (a, x) -> a + x) AS s2
      FROM h GROUP BY 1)
SELECT source, n AS n_docs,
       round(s1 / CAST(n AS DOUBLE), 6) AS mu,
       round(CASE WHEN s2 / CAST(n AS DOUBLE)
                       - (s1 / CAST(n AS DOUBLE))
                         * (s1 / CAST(n AS DOUBLE)) > 0.0
                  THEN sqrt(s2 / CAST(n AS DOUBLE)
                            - (s1 / CAST(n AS DOUBLE))
                              * (s1 / CAST(n AS DOUBLE)))
                  ELSE 0.0 END, 6) AS sigma,
       round(exp(s1 / CAST(n AS DOUBLE)), 3) AS median_est
FROM m ORDER BY source"""


def weekday_chi2(sf_dir: str):
    """Weekday-uniformity goodness-of-fit per event type — (event_type,
    n_events, chi2, peak_dow): the chi-square statistic of the 7-cell
    weekday histogram against the uniform null (6 degrees of freedom)
    and the busiest weekday.  The "is this event type seasonal at all?"
    screen in front of the hourly_anomaly / events_weekday_hour drill-
    downs.

    Exactness: with E = n/7 the statistic telescopes to
    chi2 = 7 * S2 / n - n with S2 = sum of squared weekday counts —
    exact int64 moments (S2 < 2^63 for < 3e9 events per (type, day)
    bucket), ONE mirrored float expression; empty weekdays count (the
    7-cell contract).  dow = (epoch_days + 4) % 7, Sunday = 0 — the
    events_weekday_hour convention, integer math identical on both
    engines; peak_dow ties break to the smallest dow.  NULL ts /
    NULL event_type drop.

    Scale shape: per-batch packed (type, dow) bincount partials, a
    (types x 7)-bounded groupby, tiny driver finish.
    """
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "events", columns=["ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = _drop_null_ts(batch.replace_schema_metadata(None))
        if batch["event_type"].null_count:
            batch = batch.filter(pc.is_valid(batch["event_type"]))
        empty = pa.table({"event_type": pa.array([], type=pa.string()),
                          "dow": pa.array([], type=pa.int64()),
                          "pn": pa.array([], type=pa.int64())})
        if not len(batch):
            return empty
        t = batch["ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        dow = ((t // 86400000000 + 4) % 7).astype(np.int64)
        et = batch["event_type"].to_pandas().astype(str).to_numpy()
        ecodes, euniq = pd.factorize(pd.Series(et))
        packed = ecodes.astype(np.int64) * 7 + dow
        u, cnt = np.unique(packed, return_counts=True)
        return pa.table({
            "event_type": pa.array(euniq[(u // 7).astype(np.int64)],
                                   type=pa.string()),
            "dow": pa.array((u % 7).astype(np.int64)),
            "pn": pa.array(cnt.astype(np.int64)),
        })

    h = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
         .groupby(["event_type", "dow"])
         .aggregate(Sum("pn", alias_name="n"))).to_pandas()
    out = {"event_type": [], "n_events": [], "chi2": [], "peak_dow": []}
    if len(h):
        for et_, grp in h.groupby("event_type", sort=True):
            o = np.zeros(7, dtype=np.int64)
            for d_, n_ in zip(grp["dow"], grp["n"]):
                o[int(d_)] = int(n_)
            n = int(o.sum())
            s2 = int(np.dot(o, o))
            out["event_type"].append(et_)
            out["n_events"].append(n)
            out["chi2"].append(float(round_half_away(np.float64(
                7.0 * float(s2) / float(n) - float(n)))) if n else None)
            out["peak_dow"].append(int(np.argmax(o)))
    return ray.data.from_arrow(pa.table({
        "event_type": pa.array(out["event_type"], type=pa.string()),
        "n_events": pa.array(out["n_events"], type=pa.int64()),
        "chi2": pa.array(out["chi2"], type=pa.float64()),
        "peak_dow": pa.array(out["peak_dow"], type=pa.int64()),
    }))


WEEKDAY_CHI2_SQL = """
WITH e AS (SELECT event_type,
                  CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS BIGINT)
                    AS dow
           FROM events
           WHERE ts IS NOT NULL AND event_type IS NOT NULL),
h AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n
      FROM e GROUP BY 1, 2),
a AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n_events,
             CAST(sum(n * n) AS BIGINT) AS s2
      FROM h GROUP BY 1),
pk AS (SELECT event_type, min(dow) AS peak_dow
       FROM h JOIN (SELECT event_type AS et2, max(n) AS mx
                    FROM h GROUP BY 1) m
         ON m.et2 = h.event_type AND h.n = m.mx
       GROUP BY 1)
SELECT a.event_type AS event_type, a.n_events,
       CASE WHEN a.n_events = 0 THEN NULL
            ELSE round(7.0 * CAST(a.s2 AS DOUBLE)
                       / CAST(a.n_events AS DOUBLE)
                       - CAST(a.n_events AS DOUBLE), 6) END AS chi2,
       pk.peak_dow
FROM a JOIN pk USING (event_type) ORDER BY event_type"""


def markov_entropy_rate(sf_dir: str):
    """Empirical entropy rate of the event-type Markov chain — ONE row
    (n_transitions, n_states, entropy_nats, perplexity): the average
    per-step uncertainty H = -sum_(s,d) p(s,d) * ln(p(d|s)) over the
    observed transition counts, and its effective branching factor
    exp(H).  The single-number "how predictable are user sessions?"
    summary sitting above :func:`event_transitions` (counts) and
    :func:`event_stationary` (long-run mix); a falling perplexity
    flags behavioral collapse (e.g. bot loops) corpus-wide.

    Exactness: transition counts are exact int64 from the
    event_transitions co-partition; the float fold
    acc += (n_sd/N) * ln(n_sd/n_s) runs ORDER-PINNED ascending
    (from_type, to_type) with libm ln (the PMI mirror), matching the
    oracle's list_reduce over the same ordered list; H = -acc and
    perplexity = exp(-acc) are mirrored op-for-op.  n_states counts
    distinct observed source states.  Same NULL contract as
    event_transitions.

    Scale shape: everything after the |types|^2-bounded transition
    table is a scalar driver fold.
    """
    import math

    import ray.data

    tr = event_transitions(sf_dir).to_pandas()
    n_tr = int(tr["n"].sum()) if len(tr) else 0
    n_states = int(tr["from_type"].nunique()) if len(tr) else 0
    ent = perp = None
    if n_tr:
        row_tot = tr.groupby("from_type", sort=False)["n"].sum().to_dict()
        tr = tr.sort_values(["from_type", "to_type"], ignore_index=True)
        acc = 0.0
        for s_, d_, n_ in zip(tr["from_type"], tr["to_type"], tr["n"]):
            n_ = int(n_)
            acc = acc + (float(n_) / float(n_tr)) \
                * math.log(float(n_) / float(int(row_tot[s_])))
        ent = float(round_half_away(np.float64(-acc)))
        perp = float(round_half_away(np.float64(math.exp(-acc))))
    return ray.data.from_arrow(pa.table({
        "n_transitions": pa.array([n_tr], type=pa.int64()),
        "n_states": pa.array([n_states], type=pa.int64()),
        "entropy_nats": pa.array([ent], type=pa.float64()),
        "perplexity": pa.array([perp], type=pa.float64()),
    }))


MARKOV_ENTROPY_RATE_SQL = """
WITH tr AS (SELECT prev AS s, event_type AS d,
                   CAST(count(*) AS BIGINT) AS n
            FROM (SELECT lag(event_type) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id)
                         AS prev, event_type
                  FROM events
                  WHERE user_id IS NOT NULL AND ts IS NOT NULL
                    AND event_type IS NOT NULL)
            WHERE prev IS NOT NULL GROUP BY 1, 2),
rt AS (SELECT s, CAST(sum(n) AS BIGINT) AS r FROM tr GROUP BY 1),
nn AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n,
              CAST(count(DISTINCT s) AS BIGINT) AS st FROM tr),
f AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        list((CAST(tr.n AS DOUBLE) / CAST(nn.n AS DOUBLE))
             * ln(CAST(tr.n AS DOUBLE) / CAST(rt.r AS DOUBLE))
             ORDER BY tr.s, tr.d)), (a, x) -> a + x) AS acc
      FROM tr JOIN rt USING (s) CROSS JOIN nn
      GROUP BY nn.n)
SELECT nn.n AS n_transitions, nn.st AS n_states,
       CASE WHEN nn.n = 0 THEN NULL
            ELSE (SELECT round(-acc, 6) FROM f) END AS entropy_nats,
       CASE WHEN nn.n = 0 THEN NULL
            ELSE (SELECT round(exp(-acc), 6) FROM f) END AS perplexity
FROM nn"""


def pettitt_test(sf_dir: str):
    """Pettitt nonparametric changepoint test per event type over the
    zero-filled daily count series — (event_type, n_days, k_stat,
    change_day, p_approx): the rank-based statistic
    K = max_t |U_t|, U_t = sum_{i<=t} sum_{j>t} sgn(x_i - x_j), the
    earliest day attaining it, and the classic significance
    approximation p ~ 2*exp(-6K^2/(n^3+n^2)).  The distribution-free
    partner of :func:`daily_cusum` (CUSUM reacts to mean shifts in
    level units; Pettitt is invariant to any monotone transform of the
    counts, so heavy-tailed days cannot fake a change).

    Exactness: U_t folds entirely in the INTEGER domain via the
    telescoping identity U_t = U_{t-1} + V_t with V_t = (#days below
    x_t) - (#days above x_t), both exact counts over the day-value
    histogram; K and the argmax tie-break (earliest day) are integer
    comparisons; p is ONE mirrored float expression (K^2 < 2^63 for
    series to ~55 M days).  t ranges over 1..n-1 (the full/empty split
    U_n = 0 is excluded on both engines).  NULL ts / NULL type drop;
    the zero-filled dense-calendar contract of the daily family.

    Scale shape: the _daily_counts bounded groupby plus a driver pass
    over (types x calendar days).
    """
    import math

    import ray.data

    m = _daily_counts(sf_dir)
    out = {"event_type": [], "n_days": [], "k_stat": [],
           "change_day": [], "p_approx": []}
    if len(m):
        d0, d1 = int(m["d"].min()), int(m["d"].max())
        ndays = d1 - d0 + 1
        for t, grp in m.groupby("t", sort=True):
            dense = np.zeros(ndays, dtype=np.int64)
            for d_, n_ in zip(grp["d"].to_numpy(), grp["n"].to_numpy()):
                dense[int(d_) - d0] = int(n_)
            sx = np.sort(dense)
            below = np.searchsorted(sx, dense, side="left")
            above = ndays - np.searchsorted(sx, dense, side="right")
            v = below - above
            u = np.cumsum(v)[:-1] if ndays > 1 else np.zeros(0, np.int64)
            out["event_type"].append(t)
            out["n_days"].append(ndays)
            if not len(u):
                out["k_stat"].append(None)
                out["change_day"].append(None)
                out["p_approx"].append(None)
                continue
            k = int(np.abs(u).max())
            at = int(np.argmax(np.abs(u)))
            out["k_stat"].append(k)
            out["change_day"].append(d0 + at)
            nf = float(ndays)
            out["p_approx"].append(float(round_half_away(np.float64(
                2.0 * math.exp((-6.0 * (float(k) * float(k)))
                               / (nf * nf * nf + nf * nf))))))
    return ray.data.from_arrow(pa.table({
        "event_type": pa.array(out["event_type"], type=pa.string()),
        "n_days": pa.array(out["n_days"], type=pa.int64()),
        "k_stat": pa.array(out["k_stat"], type=pa.int64()),
        "change_day": pa.array(out["change_day"], type=pa.int64()),
        "p_approx": pa.array(out["p_approx"], type=pa.float64()),
    }))


PETTITT_TEST_SQL = """
WITH e AS (SELECT event_type,
                  CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d
           FROM events
           WHERE ts IS NOT NULL AND event_type IS NOT NULL),
b AS (SELECT min(d) AS d0, max(d) AS d1,
             CAST(max(d) - min(d) + 1 AS BIGINT) AS ndays FROM e),
days AS (SELECT CAST(unnest(generate_series(b.d0, b.d1)) AS BIGINT) AS d
         FROM b),
ty AS (SELECT DISTINCT event_type FROM e),
c AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n
      FROM e GROUP BY 1, 2),
dense AS (SELECT ty.event_type, days.d,
                 CAST(coalesce(c.n, 0) AS BIGINT) AS x
          FROM ty CROSS JOIN days
          LEFT JOIN c ON c.event_type = ty.event_type AND c.d = days.d),
hist AS (SELECT event_type, x, CAST(count(*) AS BIGINT) AS hc
         FROM dense GROUP BY 1, 2),
cw AS (SELECT event_type, x,
              sum(hc) OVER (PARTITION BY event_type ORDER BY x
                            ROWS UNBOUNDED PRECEDING) - hc AS below,
              sum(hc) OVER (PARTITION BY event_type) -
                sum(hc) OVER (PARTITION BY event_type ORDER BY x
                              ROWS UNBOUNDED PRECEDING) AS above
       FROM hist),
vv AS (SELECT dense.event_type, dense.d,
              CAST(cw.below - cw.above AS BIGINT) AS v
       FROM dense JOIN cw ON cw.event_type = dense.event_type
                         AND cw.x = dense.x),
uu AS (SELECT event_type, d,
              CAST(sum(v) OVER (PARTITION BY event_type ORDER BY d
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
                AS u,
              row_number() OVER (PARTITION BY event_type ORDER BY d)
                AS rn
       FROM vv),
last AS (SELECT event_type, u, d,
                row_number() OVER (PARTITION BY event_type
                                   ORDER BY abs(u) DESC, d) AS rk
         FROM uu CROSS JOIN b WHERE uu.rn < b.ndays),
best AS (SELECT event_type, abs(u) AS k_stat, d AS change_day
         FROM last WHERE rk = 1)
SELECT ty.event_type AS event_type, b.ndays AS n_days,
       CASE WHEN b.ndays <= 1 THEN NULL ELSE best.k_stat END AS k_stat,
       CASE WHEN b.ndays <= 1 THEN NULL ELSE best.change_day END
         AS change_day,
       CASE WHEN b.ndays <= 1 THEN NULL
            ELSE round(2.0 * exp((-6.0 * (CAST(best.k_stat AS DOUBLE)
                                          * CAST(best.k_stat AS DOUBLE)))
                                 / (CAST(b.ndays AS DOUBLE)
                                    * CAST(b.ndays AS DOUBLE)
                                    * CAST(b.ndays AS DOUBLE)
                                    + CAST(b.ndays AS DOUBLE)
                                      * CAST(b.ndays AS DOUBLE))), 6)
            END AS p_approx
FROM ty CROSS JOIN b LEFT JOIN best USING (event_type) ORDER BY 1"""


def cohort_ltv(sf_dir: str, n_parts: int = 64):
    """Revenue-LTV cohort matrix over orders: customers grouped by the
    calendar month of their FIRST order; per (cohort_month, month_idx)
    — active customers and exact revenue cents that many months after
    acquisition.  Output: (cohort_month, month_idx, n_customers,
    revenue_cents).  The money-weighted companion of cohort_retention
    (retention says who came back; this says what they were worth).

    Exactness: prices lift to integer cents via rint (the
    pricing_summary contract); month math is integer epoch-month
    arithmetic (month index via the [M] datetime cast, identical to
    the oracle's date_diff on month-truncated dates); a customer's
    cohort needs their whole history, so orders ride ONE custkey-hash
    co-partition and the merge emits (cohort, idx, n, cents) partials
    — the second shuffle is matrix-cell-sized.  NULL custkey /
    orderdate / totalprice rows drop on both engines.
    """
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "orders",
                    columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def add_part(batch: pa.Table) -> pa.Table:
        batch = batch.replace_schema_metadata(None)
        for c in ("o_custkey", "o_orderdate", "o_totalprice"):
            if batch[c].null_count:
                batch = batch.filter(pc.is_valid(batch[c]))
        uid = batch["o_custkey"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array((uid % n_parts).astype(np.int32)))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        z = pd.Series(dtype=np.int64)
        if len(df) == 0:
            return pd.DataFrame({"cm": z, "mi": z, "pn": z, "pc_": z})
        cust = df["o_custkey"].to_numpy().astype(np.int64)
        mon = df["o_orderdate"].to_numpy().astype("datetime64[M]") \
            .astype(np.int64)
        cents = np.rint(df["o_totalprice"].to_numpy()
                        * 100.0).astype(np.int64)
        first = pd.DataFrame({"u": cust, "m": mon}).groupby("u")["m"] \
            .min()
        cm = first.loc[cust].to_numpy()
        mi = mon - cm
        # distinct active customers per cell + exact cents
        cell = pd.DataFrame({"cm": cm, "mi": mi, "u": cust,
                             "cents": cents})
        g = cell.groupby(["cm", "mi"]).agg(
            pn=("u", "nunique"), pc_=("cents", "sum")).reset_index()
        g["pn"] = g["pn"].astype(np.int64)
        g["pc_"] = g["pc_"].astype(np.int64)
        return g

    m = (ds.map_batches(add_part, batch_format="pyarrow",
                        batch_size=None)
         .groupby("part").map_groups(merge, batch_format="pandas")
         .groupby(["cm", "mi"])
         .aggregate(Sum("pn", alias_name="n_customers"),
                    Sum("pc_", alias_name="revenue_cents"))).to_pandas()
    if "cm" not in m.columns:       # empty input loses the schema
        m = pd.DataFrame({c: pd.Series(dtype=np.int64)
                          for c in ("cm", "mi", "n_customers",
                                    "revenue_cents")})
    m = m.sort_values(["cm", "mi"], ignore_index=True)
    months = m["cm"].to_numpy().astype(np.int64) \
        .astype("datetime64[M]").astype("datetime64[us]") if len(m) \
        else np.empty(0, "datetime64[us]")
    return ray.data.from_arrow(pa.table({
        "cohort_month": pa.array(months),
        "month_idx": pa.array(m["mi"].to_numpy().astype(np.int64)
                              if len(m) else np.empty(0, np.int64)),
        "n_customers": pa.array(m["n_customers"].to_numpy()
                                .astype(np.int64)
                                if len(m) else np.empty(0, np.int64)),
        "revenue_cents": pa.array(m["revenue_cents"].to_numpy()
                                  .astype(np.int64)
                                  if len(m) else np.empty(0, np.int64)),
    }))


COHORT_LTV_SQL = """
WITH o AS (SELECT o_custkey AS u,
                  date_trunc('month', o_orderdate) AS m,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders
           WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
             AND o_totalprice IS NOT NULL),
f AS (SELECT u, min(m) AS cm FROM o GROUP BY 1)
SELECT f.cm AS cohort_month,
       CAST(date_diff('month', f.cm, o.m) AS BIGINT) AS month_idx,
       CAST(count(DISTINCT o.u) AS BIGINT) AS n_customers,
       CAST(sum(o.cents) AS BIGINT) AS revenue_cents
FROM o JOIN f USING (u)
GROUP BY 1, 2 ORDER BY 1, 2"""


def user_activity_gini(sf_dir: str, n_parts: int = 64):
    """Gini coefficient of user activity: how unequally are events
    spread over users — ONE row (n_users, n_events, gini).  The
    power-user concentration dial (bot farms and scraper accounts show
    up as a climbing Gini long before any single account trips a
    threshold); the user-side twin of tile_gini.

    Exactness: per-user event counts ride ONE user-hash co-partition;
    each merge block emits the (events-per-user -> #users)
    COUNT-OF-COUNTS histogram, bounded by activity SPREAD, never user
    cardinality.  Equal counts are permutation-invariant under the
    rank weighting, so the Gini rank moment folds ANALYTICALLY over
    the histogram (S2 = sum v * (m*cum + m*(m+1)/2)) in Python big
    ints (HUGEINT in the oracle), and ONE mirrored division reports
    G = (2*S2 - (N+1)*S1) / (N*S1).  NULL user/ts drop (house
    contract).
    """
    import ray.data
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def add_part(batch: pa.Table) -> pa.Table:
        batch = _drop_null_ts(_drop_null_users(
            batch.replace_schema_metadata(None)))
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array((uid % n_parts).astype(np.int32)))

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        z = pd.Series(dtype=np.int64)
        if len(df) == 0:
            return pd.DataFrame({"v": z, "pm": z})
        cnt = df.groupby("user_id").size().to_numpy()
        v, m = np.unique(cnt, return_counts=True)
        return pd.DataFrame({"v": v.astype(np.int64),
                             "pm": m.astype(np.int64)})

    h = (ds.map_batches(add_part, batch_format="pyarrow",
                        batch_size=None)
         .groupby("part").map_groups(hist, batch_format="pandas")
         .groupby("v").aggregate(Sum("pm", alias_name="m"))).to_pandas()
    if "v" not in h.columns:        # empty input loses the schema
        h = pd.DataFrame({"v": pd.Series(dtype=np.int64),
                          "m": pd.Series(dtype=np.int64)})
    h = h.sort_values("v", ignore_index=True)
    n_users = int(h["m"].sum()) if len(h) else 0
    s1 = s2 = 0
    cum = 0
    for v_, m_ in zip(h["v"], h["m"]):
        v_, m_ = int(v_), int(m_)
        s1 += m_ * v_
        s2 += v_ * (m_ * cum + m_ * (m_ + 1) // 2)
        cum += m_
    gini = (None if n_users * s1 == 0 else float(round_half_away(
        np.float64(float(2 * s2 - (n_users + 1) * s1)
                   / float(n_users * s1)))))
    return ray.data.from_arrow(pa.table({
        "n_users": pa.array([n_users], type=pa.int64()),
        "n_events": pa.array([s1], type=pa.int64()),
        "gini": pa.array([gini], type=pa.float64()),
    }))


USER_ACTIVITY_GINI_SQL = """
WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS v
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1),
h AS (SELECT v, CAST(count(*) AS HUGEINT) AS m FROM u GROUP BY 1),
c AS (SELECT v, m, sum(m) OVER (ORDER BY v
                                ROWS UNBOUNDED PRECEDING) - m AS cum
      FROM h),
a AS (SELECT CAST(coalesce(sum(m), 0) AS HUGEINT) AS n,
             CAST(coalesce(sum(m * v), 0) AS HUGEINT) AS s1,
             CAST(coalesce(sum(v * (m * cum + m * (m + 1) // 2)), 0)
                  AS HUGEINT) AS s2
      FROM c)
SELECT CAST(n AS BIGINT) AS n_users, CAST(s1 AS BIGINT) AS n_events,
       CASE WHEN n * s1 = 0 THEN NULL
            ELSE round(CAST(2 * s2 - (n + 1) * s1 AS DOUBLE)
                       / CAST(n * s1 AS DOUBLE), 6) END AS gini
FROM a"""


def anova_len_by_source(sf_dir: str):
    """One-way ANOVA effect size of document length across sources —
    ONE row (n_docs, n_sources, eta_sq, f_stat): the share of length
    variance explained by provenance and its F statistic.  The
    parametric effect-size companion of mann_whitney_length /
    ks_test_length (those detect per-source drift; eta-squared says
    how much of the corpus-wide spread provenance explains at all).

    Exactness: per-source (n, sum, sum-of-squares) moments are exact
    integers; the PER-SOURCE partials ride int64 (the sum-of-squares
    bound: < 2^63 needs n_docs_per_source * max_len^2 < 9.2e18 —
    ~10^10 docs/source at 3e4-char documents; the DRIVER totals then
    fold in Python ints, HUGEINT in the oracle); the between-group
    fold sum(S_g^2 / n_g) is ORDER-PINNED
    ascending source (list_reduce mirror) and eta/F are one mirrored
    float chain; NULL statistics when sources < 2, N <= k, or zero
    total variance.  NULL source / n_chars drop.

    Scale shape: per-batch per-source moment partials, a
    source-cardinality groupby, scalar driver finish.
    """
    import ray.data
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch["source"].null_count:
            batch = batch.filter(pc.is_valid(batch["source"]))
        if batch["n_chars"].null_count:
            batch = batch.filter(pc.is_valid(batch["n_chars"]))
        empty = pa.table({"source": pa.array([], type=pa.string()),
                          "pn": pa.array([], type=pa.int64()),
                          "ps": pa.array([], type=pa.int64()),
                          "pq": pa.array([], type=pa.int64())})
        if not len(batch):
            return empty
        src = batch["source"].to_pandas().astype(str).to_numpy()
        x = batch["n_chars"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        scodes, suniq = pd.factorize(pd.Series(src))
        k = len(suniq)
        pn = np.bincount(scodes, minlength=k).astype(np.int64)
        ps = np.zeros(k, dtype=np.int64)
        pq = np.zeros(k, dtype=np.int64)
        np.add.at(ps, scodes, x)
        np.add.at(pq, scodes, x * x)
        return pa.table({"source": pa.array(suniq, type=pa.string()),
                         "pn": pa.array(pn), "ps": pa.array(ps),
                         "pq": pa.array(pq)})

    m = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
         .groupby("source")
         .aggregate(Sum("pn", alias_name="n"),
                    Sum("ps", alias_name="s"),
                    Sum("pq", alias_name="q"))).to_pandas()
    if "source" not in m.columns:   # empty input loses the schema
        m = pd.DataFrame({"source": pd.Series(dtype=object),
                          "n": pd.Series(dtype=np.int64),
                          "s": pd.Series(dtype=np.int64),
                          "q": pd.Series(dtype=np.int64)})
    m = m.sort_values("source", ignore_index=True)
    n_docs = int(m["n"].sum()) if len(m) else 0
    k = len(m)
    eta = f_stat = None
    if n_docs > 1 and k > 1 and n_docs > k:
        big_s = sum(int(x) for x in m["s"])
        big_q = sum(int(x) for x in m["q"])
        nf = float(n_docs)
        acc = 0.0
        for _, r in m.iterrows():           # ascending source order
            acc = acc + (float(int(r["s"])) * float(int(r["s"]))) \
                / float(int(r["n"]))
        grand = (float(big_s) * float(big_s)) / nf
        ssb = acc - grand
        sst = float(big_q) - grand
        if sst > 0.0:
            eta = float(round_half_away(np.float64(ssb / sst)))
            ssw = sst - ssb
            if ssw > 0.0:
                f_stat = float(round_half_away(np.float64(
                    (ssb / float(k - 1)) / (ssw / float(n_docs - k)))))
    return ray.data.from_arrow(pa.table({
        "n_docs": pa.array([n_docs], type=pa.int64()),
        "n_sources": pa.array([k], type=pa.int64()),
        "eta_sq": pa.array([eta], type=pa.float64()),
        "f_stat": pa.array([f_stat], type=pa.float64()),
    }))


ANOVA_LEN_BY_SOURCE_SQL = """
WITH d AS (SELECT source, CAST(n_chars AS HUGEINT) AS x FROM documents
           WHERE source IS NOT NULL AND n_chars IS NOT NULL),
g AS (SELECT source, CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS s,
             CAST(sum(x * x) AS HUGEINT) AS q
      FROM d GROUP BY 1),
t AS (SELECT CAST(coalesce(sum(n), 0) AS HUGEINT) AS n,
             CAST(count(*) AS BIGINT) AS k,
             CAST(coalesce(sum(s), 0) AS HUGEINT) AS s,
             CAST(coalesce(sum(q), 0) AS HUGEINT) AS q
      FROM g),
f AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        list((CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / CAST(n AS DOUBLE)
             ORDER BY source)), (a, x) -> a + x) AS acc
      FROM g)
SELECT CAST(t.n AS BIGINT) AS n_docs, t.k AS n_sources,
       CASE WHEN t.n <= 1 OR t.k <= 1 OR t.n <= t.k
                 OR CAST(t.q AS DOUBLE)
                    - (CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE))
                      / CAST(t.n AS DOUBLE) <= 0.0 THEN NULL
            ELSE round((f.acc - (CAST(t.s AS DOUBLE)
                                 * CAST(t.s AS DOUBLE))
                                / CAST(t.n AS DOUBLE))
                       / (CAST(t.q AS DOUBLE)
                          - (CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE))
                            / CAST(t.n AS DOUBLE)), 6) END AS eta_sq,
       CASE WHEN t.n <= 1 OR t.k <= 1 OR t.n <= t.k
                 OR CAST(t.q AS DOUBLE)
                    - (CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE))
                      / CAST(t.n AS DOUBLE) <= 0.0
                 OR (CAST(t.q AS DOUBLE)
                     - (CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE))
                       / CAST(t.n AS DOUBLE))
                    - (f.acc - (CAST(t.s AS DOUBLE)
                                * CAST(t.s AS DOUBLE))
                               / CAST(t.n AS DOUBLE)) <= 0.0 THEN NULL
            ELSE round(((f.acc - (CAST(t.s AS DOUBLE)
                                  * CAST(t.s AS DOUBLE))
                                 / CAST(t.n AS DOUBLE))
                        / CAST(t.k - 1 AS DOUBLE))
                       / (((CAST(t.q AS DOUBLE)
                            - (CAST(t.s AS DOUBLE)
                               * CAST(t.s AS DOUBLE))
                              / CAST(t.n AS DOUBLE))
                           - (f.acc - (CAST(t.s AS DOUBLE)
                                       * CAST(t.s AS DOUBLE))
                                      / CAST(t.n AS DOUBLE)))
                          / (CAST(t.n AS DOUBLE) - CAST(t.k AS DOUBLE))),
                       6) END AS f_stat
FROM t CROSS JOIN f"""


def retention_half_life(sf_dir: str):
    """Exponential-decay fit of the user-aligned retention curve — ONE
    row (n_offsets, total_users, slope, intercept, half_life_days):
    least squares of ln(rate_k) on day offset k over offsets >= 1 with
    active users, plus the implied half-life -ln(2)/slope (NULL when
    retention is not decaying).  The single-number "how fast do users
    evaporate?" summary sitting above :func:`activity_curve`'s full
    curve.

    Exactness: the curve's (offset, n_users) facts are the exact
    activity_curve integers; y = ln(n_k / n_0) uses libm math.log on
    one identical double per offset, and the four regression moments
    fold ORDER-PINNED ascending offset (tile_zipf's list_reduce
    contract).  Offset 0 is excluded (y == 0 by construction — it
    would only dilute the fit and both engines agree by construction
    anyway).
    """
    import math

    import ray.data

    cur = activity_curve(sf_dir).to_pandas() \
        .sort_values("day_offset", ignore_index=True)
    slope = intercept = hl = None
    n_off = 0
    total = 0
    if len(cur):
        total = int(cur.loc[cur["day_offset"] == 0, "n_users"].iloc[0]) \
            if (cur["day_offset"] == 0).any() else 0
        fit = cur[(cur["day_offset"] >= 1) & (cur["n_users"] > 0)]
        n_off = len(fit)
        if n_off >= 2 and total > 0:
            sx = sy = sxx = sxy = 0.0
            for k_, n_ in zip(fit["day_offset"], fit["n_users"]):
                x = float(int(k_))
                y = math.log(float(int(n_)) / float(total))
                sx += x
                sy += y
                sxx += x * x
                sxy += x * y
            nf = float(n_off)
            den = nf * sxx - sx * sx
            if den != 0.0:
                sl = (nf * sxy - sx * sy) / den
                slope = float(round_half_away(np.float64(sl)))
                intercept = float(round_half_away(np.float64(
                    (sy - sl * sx) / nf)))
                if sl < 0.0:
                    hl = float(round_half_away(np.float64(
                        -math.log(2.0) / sl)))
    return ray.data.from_arrow(pa.table({
        "n_offsets": pa.array([n_off], type=pa.int64()),
        "total_users": pa.array([total], type=pa.int64()),
        "slope": pa.array([slope], type=pa.float64()),
        "intercept": pa.array([intercept], type=pa.float64()),
        "half_life_days": pa.array([hl], type=pa.float64()),
    }))


RETENTION_HALF_LIFE_SQL = """
WITH d AS (SELECT DISTINCT user_id,
                  CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
           FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL),
f AS (SELECT user_id, min(day) AS f0 FROM d GROUP BY 1),
c AS (SELECT d.day - f.f0 AS off, CAST(count(*) AS BIGINT) AS n_users
      FROM d JOIN f USING (user_id) GROUP BY 1),
t AS (SELECT CAST(coalesce((SELECT n_users FROM c WHERE off = 0), 0)
             AS BIGINT) AS total),
fit AS (SELECT off, n_users FROM c WHERE off >= 1 AND n_users > 0),
m AS (SELECT CAST(count(*) AS BIGINT) AS v,
             CAST(count(*) AS DOUBLE) AS nf,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(off AS DOUBLE) ORDER BY off)),
               (x, y) -> x + y) AS sx,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(ln(CAST(n_users AS DOUBLE)
                       / (SELECT CAST(total AS DOUBLE) FROM t))
                    ORDER BY off)), (x, y) -> x + y) AS sy,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(off AS DOUBLE) * CAST(off AS DOUBLE)
                    ORDER BY off)), (x, y) -> x + y) AS sxx,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(off AS DOUBLE)
                    * ln(CAST(n_users AS DOUBLE)
                         / (SELECT CAST(total AS DOUBLE) FROM t))
                    ORDER BY off)), (x, y) -> x + y) AS sxy
      FROM fit)
SELECT m.v AS n_offsets, t.total AS total_users,
       CASE WHEN m.v < 2 OR t.total = 0
                 OR m.nf * m.sxx - m.sx * m.sx = 0.0 THEN NULL
            ELSE round((m.nf * m.sxy - m.sx * m.sy)
                       / (m.nf * m.sxx - m.sx * m.sx), 6) END AS slope,
       CASE WHEN m.v < 2 OR t.total = 0
                 OR m.nf * m.sxx - m.sx * m.sx = 0.0 THEN NULL
            ELSE round((m.sy - ((m.nf * m.sxy - m.sx * m.sy)
                                / (m.nf * m.sxx - m.sx * m.sx)) * m.sx)
                       / m.nf, 6) END AS intercept,
       CASE WHEN m.v < 2 OR t.total = 0
                 OR m.nf * m.sxx - m.sx * m.sx = 0.0
                 OR (m.nf * m.sxy - m.sx * m.sy)
                    / (m.nf * m.sxx - m.sx * m.sx) >= 0.0 THEN NULL
            ELSE round(-ln(2.0) / ((m.nf * m.sxy - m.sx * m.sy)
                                   / (m.nf * m.sxx - m.sx * m.sx)), 6)
            END AS half_life_days
FROM m CROSS JOIN t"""


def time_to_convert(sf_dir: str, a: str = "view", b: str = "purchase",
                    n_parts: int = 64):
    """Conversion-latency distribution: per user, the delta from their
    FIRST ``a`` event to their first ``b`` event strictly after it —
    minute-bucketed and summarized as ONE row (n_a_users, n_converted,
    p25_min, p50_min, p75_min): discrete quantiles of the latency in
    whole minutes.  The "how long does the funnel take?" statistic
    funnel_conversions' within-window count cannot answer.

    Exactness: the per-user latency is integer microseconds from ONE
    user-hash co-partition (first-a / first-b-after-a are min scans);
    minute buckets are non-negative integer division; quantiles are
    quantile_disc over the bounded minute histogram — the engine walks
    cumulative counts to the ceil(q*n)-th order statistic, exactly
    SQL's discrete-quantile rule.  NULL user/ts/type drop (house
    contract).

    Scale shape: users co-partition once; merge blocks emit
    minute-bucket count partials (timespan-bounded); driver walks the
    bounded histogram.
    """
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_type"])

    def add_part(batch: pa.Table) -> pa.Table:
        batch = batch.replace_schema_metadata(None)
        et = pc.fill_null(batch["event_type"], "")
        sel = pc.or_(pc.equal(et, a), pc.equal(et, b))
        batch = batch.filter(sel)
        batch = _drop_null_ts(_drop_null_users(batch))
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array((uid % n_parts).astype(np.int32)))

    def lat(df: pd.DataFrame) -> pd.DataFrame:
        z = pd.Series(dtype=np.int64)
        if len(df) == 0:
            return pd.DataFrame({"m": z, "pn": z, "pa_": z})
        # vectorized per-segment scan (no per-user Python loop): sort by
        # (user, is_b, ts) so each user's a-events come first in time
        # order, then b-events in time order; first-a = segment head,
        # first-b-after = first b past it via ONE searchsorted per user
        df = df.sort_values(["user_id", "ts"]).reset_index(drop=True)
        uid = df["user_id"].to_numpy()
        t = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        is_a = (df["event_type"] == a).to_numpy()
        starts = np.concatenate(
            [[0], np.flatnonzero(uid[1:] != uid[:-1]) + 1])
        ends = np.concatenate([starts[1:], [len(uid)]])
        # first a-event index per segment: min index with is_a
        idx = np.arange(len(uid), dtype=np.int64)
        big = np.int64(len(uid))
        a_idx = np.where(is_a, idx, big)
        first_a = np.minimum.reduceat(a_idx, starts)
        has_a = first_a < big
        n_a_users = int(has_a.sum())
        # first b strictly after t[first_a]: one more reduceat over
        # candidate indices (per-row segment broadcast via repeat), so
        # high-user partitions never pay a per-user interpreter loop
        m = np.zeros(0, np.int64)
        c = np.zeros(0, np.int64)
        if has_a.any():
            seg_of = np.repeat(np.arange(len(starts), dtype=np.int64),
                               ends - starts)
            ta_seg = np.where(has_a, t[np.minimum(first_a, big - 1)],
                              np.iinfo(np.int64).max)
            cand = np.where((~is_a) & (t > ta_seg[seg_of]), idx, big)
            first_b = np.minimum.reduceat(cand, starts)
            ok = has_a & (first_b < big)
            if ok.any():
                deltas = (t[first_b[ok]] - t[first_a[ok]]) \
                    // np.int64(60_000_000)
                m, c = np.unique(deltas.astype(np.int64),
                                 return_counts=True)
        out = pd.DataFrame({"m": m.astype(np.int64),
                            "pn": c.astype(np.int64),
                            "pa_": np.zeros(len(m), np.int64)})
        # sentinel row carries the a-user count (m = -1 is unreachable:
        # latencies are non-negative)
        return pd.concat([out, pd.DataFrame(
            {"m": [-1], "pn": [0], "pa_": [n_a_users]})],
            ignore_index=True)

    h = (ds.map_batches(add_part, batch_format="pyarrow",
                        batch_size=None)
         .groupby("part").map_groups(lat, batch_format="pandas")
         .groupby("m").aggregate(Sum("pn", alias_name="n"),
                                 Sum("pa_", alias_name="na"))).to_pandas()
    if "m" not in h.columns:        # empty input loses the schema
        h = pd.DataFrame({c: pd.Series(dtype=np.int64)
                          for c in ("m", "n", "na")})
    h = h.sort_values("m", ignore_index=True)
    n_a_users = int(h["na"].sum()) if len(h) else 0
    hh = h[h["m"] >= 0]
    n_conv = int(hh["n"].sum()) if len(hh) else 0
    qs = {0.25: None, 0.5: None, 0.75: None}
    if n_conv:
        ms = hh["m"].to_numpy().astype(np.int64)
        cs = np.cumsum(hh["n"].to_numpy().astype(np.int64))
        for q in qs:
            k = int(np.ceil(q * n_conv))
            k = max(k, 1)
            qs[q] = int(ms[int(np.searchsorted(cs, k))])
    return ray.data.from_arrow(pa.table({
        "n_a_users": pa.array([n_a_users], type=pa.int64()),
        "n_converted": pa.array([n_conv], type=pa.int64()),
        "p25_min": pa.array([qs[0.25]], type=pa.int64()),
        "p50_min": pa.array([qs[0.5]], type=pa.int64()),
        "p75_min": pa.array([qs[0.75]], type=pa.int64()),
    }))


def time_to_convert_sql(a: str = "view", b: str = "purchase") -> str:
    """Oracle for :func:`time_to_convert` — first-a / first-b-after
    scans and quantile_disc over the minute buckets."""
    return f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL
             AND event_type IN ('{a}', '{b}')),
fa AS (SELECT user_id, min(t) AS ta FROM e
       WHERE event_type = '{a}' GROUP BY 1),
fb AS (SELECT fa.user_id, min(e.t) AS tb
       FROM fa JOIN e ON e.user_id = fa.user_id
                     AND e.event_type = '{b}' AND e.t > fa.ta
       GROUP BY 1),
lt AS (SELECT CAST((fb.tb - fa.ta) // 60000000 AS BIGINT) AS m
       FROM fa JOIN fb USING (user_id))
SELECT (SELECT CAST(count(*) AS BIGINT) FROM fa) AS n_a_users,
       CAST(count(*) AS BIGINT) AS n_converted,
       CAST(quantile_disc(m, 0.25) AS BIGINT) AS p25_min,
       CAST(quantile_disc(m, 0.5) AS BIGINT) AS p50_min,
       CAST(quantile_disc(m, 0.75) AS BIGINT) AS p75_min
FROM lt"""
