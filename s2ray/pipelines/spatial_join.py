"""Point-in-region spatial join: pages x query regions.

Two physical plans (SURVEY.md par.2.8 / par.7 step 5):

1. **Broadcast path** (small build side — the common case of a handful of
   query regions): regions -> coverings on the driver -> a RegionIndex object
   placed ONCE in the object store via ray.put -> stateless map_batches probe
   that (a) candidate-filters each page's leaf cell against each region's
   covering via searchsorted and (b) exact-refines with the region's
   vectorized predicate (cap chord test / rect interval test / PIP parity).
   No shuffle at all: cost O(batch * regions * log covering).

2. **Shuffle path** (large build side or when pages must co-locate): both
   sides keyed by the level-K ancestor cell, groupby(key).map_groups pairs
   and refines inside the group.  Hot keys (dense city cells) are SALTED:
   probe rows of a hot key spread across `salt` sub-keys, build rows
   replicated to every sub-key — skew never lands on one reducer.

Both paths produce identical rows (tested), matching the reference
predicate semantics (cap: S2Cap contains; rect: S2LatLngRect contains;
polygon: crossing-parity PIP incl. vertex-crossing rule).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernel import cellid, cellunion, keys, sphere
from ..kernel.coverer import covering_of


class RegionIndex:
    """Driver-built, broadcast-once index of query regions.

    Holds per-region: the normalized covering (uint64), its
    (range_min, range_max) interval arrays for searchsorted candidate tests,
    and the region object for exact refinement.
    """

    # Polygons with at least this many edges get a cell-indexed PIP
    # (IndexedPolygon) built into the broadcast object — probe cost becomes
    # O(edges near the point's cell) instead of O(all edges).  Crossover
    # measured round 4 (star polygons, 200k local points, bit-parity
    # asserted): the indexed PROBE wins from ~16 edges, but the index
    # BUILD is the coverer's O(candidates x edges) refinement — ~1 s at
    # max_cells=32 vs 7-14 s at 256 — so the policy is graduated: mid-size
    # polygons (>= 24 edges) index with a cheap 32-cell covering (probe
    # ~2x flat at 32 edges), and only large ones (>= 64 edges, the heavy-
    # join regime where probes dwarf any build) pay the full 256-cell
    # build (probe ~4-12x flat).  Below 24 edges flat scanning wins on
    # build+probe economics.
    INDEX_POLYGON_MIN_EDGES = 24
    INDEX_POLYGON_FULL_EDGES = 64

    def __init__(self, regions: dict[str, object], max_cells: int = 16):
        from ..kernel.pip import IndexedPolygon, Polygon

        self.region_ids = list(regions.keys())
        self.regions = {}
        self.coverings = {}
        self.intervals = {}
        for rid, region in regions.items():
            cov = cellunion.normalize(covering_of(region, max_cells=max_cells))
            self.coverings[rid] = cov
            self.intervals[rid] = (cellid.range_min(cov), cellid.range_max(cov))
            if isinstance(region, Polygon):
                n_edges = sum(len(lp.vertices) for lp in region.loops)
                if n_edges >= self.INDEX_POLYGON_FULL_EDGES:
                    region = IndexedPolygon(region)
                elif n_edges >= self.INDEX_POLYGON_MIN_EDGES:
                    region = IndexedPolygon(region, max_cells=32)
            self.regions[rid] = region

    def join_level(self) -> int:
        """Shuffle-join key level: finest common ancestor level that keeps
        every covering cell at-or-below it (cells coarser than the covering
        enumerate children instead)."""
        min_level = cellid.MAX_LEVEL
        for cov in self.coverings.values():
            min_level = min(min_level, int(cellid.level(cov).min()))
        return min_level

    def probe(self, leaf_ids: np.ndarray, lat_deg: np.ndarray,
              lng_deg: np.ndarray):
        """For a batch of pages return (row_idx, region_id) match pairs."""
        out_rows = []
        out_rids = []
        for rid in self.region_ids:
            starts, ends = self.intervals[rid]
            pos = np.searchsorted(starts, leaf_ids, side="right")
            cand = pos > 0
            safe = np.maximum(pos, 1) - 1
            cand &= leaf_ids <= ends[safe]
            if not cand.any():
                continue
            idx = np.nonzero(cand)[0]
            region = self.regions[rid]
            ok = exact_contains(region, lat_deg[idx], lng_deg[idx])
            hits = idx[ok]
            if len(hits):
                out_rows.append(hits)
                out_rids.extend([rid] * len(hits))
        if not out_rows:
            return np.empty(0, dtype=np.int64), []
        return np.concatenate(out_rows), out_rids


def exact_contains(region, lat_deg, lng_deg) -> np.ndarray:
    """Vectorized exact membership for any supported region type."""
    if hasattr(region, "contains_latlng_degrees"):
        return np.asarray(region.contains_latlng_degrees(lat_deg, lng_deg))
    if hasattr(region, "contains_points"):  # LatLngRect
        return np.asarray(region.contains_points(
            sphere.degrees_to_radians(lat_deg), sphere.degrees_to_radians(lng_deg)))
    raise TypeError(f"unsupported region type {type(region)}")


# ---------------------------------------------------------------------------
# broadcast path

def spatial_join_broadcast(pages_ds, regions: dict[str, object],
                           max_cells: int = 16,
                           keep_cols=("page_id", "url", "lat", "lng"),
                           prebuilt_index: "RegionIndex | None" = None):
    """pages x regions -> (keep_cols..., region_id) via broadcast index.

    The index is shipped once per worker through Ray's object store
    (fn_constructor closure over the ray.put handle), not per batch.
    ``prebuilt_index`` skips the driver-side covering build — a deployment
    that runs many joins against the same regions builds (or loads) the
    RegionIndex once and reuses it.
    """
    import ray

    index_ref = ray.put(prebuilt_index if prebuilt_index is not None
                        else RegionIndex(regions, max_cells=max_cells))
    cols = list(keep_cols)

    def probe_batch(batch: pa.Table, index_ref=index_ref) -> pa.Table:
        index = _cached_index(index_ref)
        leaf = batch["cell_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        rows, rids = index.probe(leaf, lat, lng)
        sub = batch.select(cols).take(pa.array(rows))
        return sub.append_column("region_id", pa.array(rids, type=pa.string()))

    # Task pool, NOT an actor pool: tasks fuse with the upstream map in the
    # same worker processes (an actor pool pays ~2 s spin-up per query and
    # breaks operator fusion); the index still deserializes once per worker
    # via the process-level cache below.
    return pages_ds.map_batches(probe_batch, batch_format="pyarrow",
                                batch_size=None)


# worker-process-level cache: ray.get + unpickle the broadcast index once
# per worker, not once per task or per map_groups group
from ..state.bcast import cached_get as _cached_index


# ---------------------------------------------------------------------------
# shuffle path (cell-keyed co-partition with hot-key salting)

def _build_side_rows(index: RegionIndex, level: int, salt: int,
                     hot_keys: np.ndarray | None = None) -> pa.Table:
    """Region covering -> (cell_key, salt_id, region_id) rows at join level.

    hot_keys=None replicates every key `salt` times; otherwise only hot keys
    are replicated (cold keys get a single salt_id=0 row)."""
    out_keys = []
    out_salts = []
    out_rids = []
    for rid, cov in index.coverings.items():
        cells = []
        for cid in cov:
            lv = int(cellid.level(np.array([cid]))[0])
            if lv >= level:
                cells.append(cellid.parent(np.array([cid]), level)[0])
            else:
                # enumerate descendants at the join level
                cells.extend(cellunion.denormalize(
                    np.array([cid], dtype=np.uint64), level, 1).tolist())
        cells = np.unique(np.array(cells, dtype=np.uint64))
        ck = keys.to_key(cells)
        if hot_keys is None:
            hot_mask = np.ones(len(ck), dtype=bool)
        else:
            hot_mask = np.isin(ck, hot_keys)
        for s in range(salt):
            sel = ck if s == 0 else ck[hot_mask]
            out_keys.extend(sel.tolist())
            out_salts.extend([s] * len(sel))
            out_rids.extend([rid] * len(sel))
    return pa.table({
        "cell_key": pa.array(out_keys, type=pa.int64()),
        "salt_id": pa.array(out_salts, type=pa.int8()),
        "region_id": pa.array(out_rids, type=pa.string()),
    })


def detect_hot_keys(pages_ds, level: int, sample_fraction: float = 0.05,
                    hot_threshold_frac: float = 0.02) -> np.ndarray:
    """Sampled key histogram -> cell keys carrying more than
    hot_threshold_frac of the (sampled) probe rows (SURVEY.md par.4 skew
    row: hot-key detection via per-batch key histograms on a sample)."""
    sample = pages_ds.random_sample(sample_fraction, seed=42)

    def partial(batch: pa.Table) -> pa.Table:
        leaf = batch["cell_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        anc = cellid.parent(leaf, level)
        u, c = np.unique(anc, return_counts=True)
        return pa.table({"k": pa.array(keys.to_key(u)),
                         "n": pa.array(c.astype(np.int64))})

    hist = sample.map_batches(partial, batch_format="pyarrow",
                              batch_size=None).to_pandas()
    if len(hist) == 0:
        return np.empty(0, dtype=np.int64)
    agg = hist.groupby("k")["n"].sum()
    total = agg.sum()
    hot = agg[agg > hot_threshold_frac * total].index.to_numpy()
    return np.sort(hot.astype(np.int64))


def spatial_join_shuffle(pages_ds, regions: dict[str, object],
                         max_cells: int = 16, salt: int = 4,
                         auto_salt: bool = False,
                         keep_cols=("page_id", "url", "lat", "lng")):
    """Cell-keyed co-partition join with hot-key salting.

    salt semantics: a hot key's probe rows spread over `salt` sub-keys
    (salt_id = page_id % salt) while its build rows are replicated to every
    sub-key — skew never lands on one reducer.  With auto_salt=True only
    cells detected hot by a sampled histogram are salted (cold keys keep
    salt_id=0 and a single build replica), so build replication cost is
    |hot cells| * salt instead of |covering| * salt.
    """
    import ray
    import ray.data

    index = RegionIndex(regions, max_cells=max_cells)
    level = index.join_level()
    if auto_salt:
        hot_keys = detect_hot_keys(pages_ds, level)
    else:
        hot_keys = None  # salt every key
    build = _build_side_rows(index, level, salt, hot_keys=hot_keys)
    index_ref = ray.put(index)
    cols = list(keep_cols)
    # the exact refinement inside pair_group always needs lat/lng; carry
    # them through the shuffle even when the caller doesn't keep them
    shuffle_cols = cols + [c for c in ("lat", "lng") if c not in cols]
    hot_ref = ray.put(hot_keys)

    # semi-join pushdown: broadcast the (sorted) build key set; probe rows
    # whose ancestor cell has no build row never enter the shuffle at all —
    # at web scale the overwhelming majority of pages are outside every
    # query region.
    build_keys = np.unique(build["cell_key"].to_numpy())
    build_keys_ref = ray.put(build_keys)

    def probe_side(batch: pa.Table) -> pa.Table:
        leaf = batch["cell_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        anc = cellid.parent(leaf, level)
        cell_key = keys.to_key(anc)
        bk = ray.get(build_keys_ref)
        pos = np.searchsorted(bk, cell_key)
        keep = (pos < len(bk)) & (bk[np.minimum(pos, len(bk) - 1)] == cell_key)
        batch = batch.filter(pa.array(keep))
        cell_key = cell_key[keep]
        page_id = batch["page_id"].to_numpy(zero_copy_only=False)
        salt_id = (page_id % salt).astype(np.int8)
        hk = ray.get(hot_ref)
        if hk is not None:
            is_hot = np.isin(cell_key, hk)
            salt_id = np.where(is_hot, salt_id, 0).astype(np.int8)
        out = batch.select(shuffle_cols)
        out = out.append_column("cell_key", pa.array(cell_key, type=pa.int64()))
        out = out.append_column("salt_id", pa.array(salt_id, type=pa.int8()))
        out = out.append_column("side", pa.array(np.ones(len(out), dtype=np.int8),
                                                 type=pa.int8()))
        return out

    probe = pages_ds.map_batches(probe_side, batch_format="pyarrow", batch_size=None)
    build_tbl = build.append_column(
        "side", pa.array(np.zeros(len(build), dtype=np.int8), type=pa.int8()))
    build_ds = ray.data.from_arrow(build_tbl)
    both = probe.union(build_ds)

    # arrow output schema: Arrow blocks carry exact sizes, so Ray's
    # pandas block-size estimator (which np.vectorize-s over empty object
    # columns and logs one error per empty group) never runs, and every
    # block — including empties — has one stable schema.  Types come from
    # the pages contract (input_hint), NOT pages_ds.schema() — calling
    # .schema() on a lazy dataset eagerly executes upstream tasks at
    # plan-construction time.
    _contract = {"page_id": pa.int64(), "doc_id": pa.int64(),
                 "lat": pa.float64(), "lng": pa.float64(),
                 "cell_id": pa.uint64(), "warc_ts": pa.timestamp("us")}
    out_schema = pa.schema([(c, _contract.get(c, pa.string()))
                            for c in cols] + [("region_id", pa.string())])

    def pair_group(df, index_ref=index_ref):
        import pandas as pd

        # worker-process cache: map_groups calls this once per
        # (cell_key, salt) group — thousands per covering — and the index
        # (incl. IndexedPolygon edge indexes) must not re-unpickle each time
        idx = _cached_index(index_ref)
        builds = df[df["side"] == 0]
        probes = df[df["side"] == 1]
        if len(builds) == 0 or len(probes) == 0:
            return out_schema.empty_table()
        outs = []
        lat = probes["lat"].to_numpy()
        lng = probes["lng"].to_numpy()
        for rid in builds["region_id"].unique():
            ok = exact_contains(idx.regions[rid], lat, lng)
            if ok.any():
                hit = probes.iloc[np.nonzero(ok)[0]][cols].copy()
                hit["region_id"] = rid
                outs.append(hit)
        if not outs:
            return out_schema.empty_table()
        out = pd.concat(outs, ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False) \
            .cast(out_schema)

    return (
        both.groupby(["cell_key", "salt_id"])
        .map_groups(pair_group, batch_format="pandas")
        .select_columns(cols + ["region_id"])
    )


# ---------------------------------------------------------------------------
# SQL-oracle generation (driver correctness gate)

def loop_pip_sql(loop, lat_expr: str = "radians(lat)",
                 lng_expr: str = "radians(lng)") -> str:
    """DuckDB boolean expression implementing the EXACT spherical
    crossing-parity containment test for a fixed loop.

    Same predicate as Loop.contains_points_xyz: parity of robustCrossing of
    edge (origin, P) against each loop edge (C_k, D_k), with the per-edge
    constant orientation acb_k = -ccw(C,D,origin) precomputed here.  Signs of
    the determinants are floating-point-stable for probe points farther than
    ~1e-15 rad from an edge plane, so SQL double math reproduces the engine
    bit-for-bit on generic inputs (vertex-crossing cases are measure-zero).
    origin = S2::origin() = (0,1,0), so (origin x P) . Q = pz*qx - px*qz.
    """
    from ..kernel import edges as _edges
    from ..kernel import sphere as _sphere

    o = _edges.origin()
    px = f"(cos({lat_expr})*cos({lng_expr}))"
    py = f"(cos({lat_expr})*sin({lng_expr}))"
    pz = f"(sin({lat_expr}))"
    terms = []
    verts = loop.vertices
    n = len(verts)
    for k in range(n):
        c = verts[k]
        d = verts[(k + 1) % n]
        cxd = np.cross(c, d)
        acb = -_sphere.robust_ccw(c, d, o, cxd)
        if acb == 0:
            continue  # degenerate edge w.r.t. origin: robustCrossing <= 0, no crossing
        cx, cy, cz = (repr(float(v)) for v in c)
        dx, dy, dz = (repr(float(v)) for v in d)
        ex, ey, ez = (repr(float(v)) for v in cxd)
        bda = f"(({ex})*{px} + ({ey})*{py} + ({ez})*{pz})"
        cbd = f"(-({pz}*({dx}) - {px}*({dz})))"
        dac = f"({pz}*({cx}) - {px}*({cz}))"
        op = ">" if acb > 0 else "<"
        cond = f"({bda} {op} 0 AND {cbd} {op} 0 AND {dac} {op} 0)"
        terms.append(f"CASE WHEN {cond} THEN 1 ELSE 0 END")
    crossings = " + ".join(terms) if terms else "0"
    base = "TRUE" if loop.origin_inside else "FALSE"
    return f"({base} <> ((({crossings}) % 2) = 1))"


def distance_join_pairs(pages_ds, d_m: float, max_bucket: int = 200_000,
                        n_parts: int = 64):
    """Spatial distance self-join: every pair of pages within ``d_m``
    meters great-circle distance — (i, j, dist_m) with i < j, dist
    rounded to mm like the kNN contract.

    Bucketing: each point goes to its own cell plus all edge/vertex
    neighbors (8, or 7 at cube-face corners — the ragged case is real and
    stress-tested) at the FINEST level whose minimum cell width is >= d
    (MIN_WIDTH metric,
    S2.php:868-886 via kernel.sphere.Metric) — two points within d are
    then guaranteed to share at least the bucket of the smaller id's home
    cell, and each qualifying pair is emitted EXACTLY once (counted only
    in that bucket, no global dedup shuffle).  The exact predicate is the
    reference haversine (SmokeTest.php:12-21), mirrored in the SQL oracle.

    Scale shape: the one shuffle moves 9 compact (bucket, id, lat, lng,
    home) rows per point — constant per-row volume — co-partitioned by
    bucket HASH into ``n_parts`` reducer groups (one vectorized callable
    per part, never one Python call per micro-bucket: the per-group
    pandas path cost 43 CPU-seconds on 45 k rows before this); per-bucket
    work is a vectorized pairwise haversine bounded by ``max_bucket``
    (oversized buckets raise rather than silently going quadratic: pick
    a smaller d or pre-shard hot cells).
    """
    import pandas as pd

    from ..kernel import cellid as ci
    from ..kernel import keys as _keys
    from ..kernel import sphere as _sphere

    angle = d_m / 6371000.0
    lvl = _sphere.MIN_WIDTH.get_max_level(angle)

    def to_buckets(batch: pa.Table) -> pa.Table:
        ids = batch["page_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        leaf = ci.from_latlng_degrees(lat, lng)
        cell = ci.parent(leaf, lvl)
        uniq, inv = np.unique(cell, return_inverse=True)
        # neighbor lists are RAGGED (7 at cube-face corners, 8 elsewhere):
        # one vectorized 3x3-stencil pass per DISTINCT cell (bit-identical
        # to the scalar AppendAllNeighbors), then per-point expansion
        nb_flat, nb_counts = ci.all_neighbors_same_level(uniq, lvl)
        offs = np.concatenate([[0], np.cumsum(nb_counts[:-1])]) \
            .astype(np.int64)
        cnt = nb_counts[inv]
        total = int(cnt.sum())
        cum = np.concatenate([[0], np.cumsum(cnt[:-1])]).astype(np.int64)
        within = np.arange(total, dtype=np.int64) - np.repeat(cum, cnt)
        ghost_cells = nb_flat[np.repeat(offs[inv], cnt) + within]
        own = _keys.to_key(cell)
        ghost = _keys.to_key(ghost_cells)
        n = len(ids)
        bucket = np.concatenate([own, ghost])
        part = ((bucket.astype(np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15))
                >> np.uint64(40)).astype(np.int64) % n_parts
        return pa.table({
            "part": pa.array(part.astype(np.int32)),
            "bucket": pa.array(bucket),
            "pid": pa.array(np.concatenate([ids, np.repeat(ids, cnt)])),
            "lat": pa.array(np.concatenate([lat, np.repeat(lat, cnt)])),
            "lng": pa.array(np.concatenate([lng, np.repeat(lng, cnt)])),
            "home": pa.array(np.concatenate(
                [np.ones(n, dtype=bool), np.zeros(total, dtype=bool)])),
        })

    def pairs_part(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"i": pd.Series(dtype=np.int64),
                              "j": pd.Series(dtype=np.int64),
                              "dist_m": pd.Series(dtype=np.float64)})
        if len(df) < 2:
            return empty
        bkt = df["bucket"].to_numpy().astype(np.int64)
        ids = df["pid"].to_numpy().astype(np.int64)
        lat = np.radians(df["lat"].to_numpy())
        lng = np.radians(df["lng"].to_numpy())
        home = df["home"].to_numpy().astype(bool)
        # one lexsort for the whole part: bucket-major, pid, home FIRST —
        # a point can reach the same bucket as both home and ghost when a
        # neighbor ring wraps (poles): home wins so the pair rule stays
        # exactly-once
        order = np.lexsort((~home, ids, bkt))
        bkt, ids, lat, lng, home = (x[order] for x in
                                    (bkt, ids, lat, lng, home))
        keep1 = np.concatenate([[True], (bkt[1:] != bkt[:-1])
                                | (ids[1:] != ids[:-1])])
        bkt, ids, lat, lng, home = (x[keep1] for x in
                                    (bkt, ids, lat, lng, home))
        n = len(ids)
        if n < 2:
            return empty
        # bucket segments -> per-element pair fan-out (i pairs with every
        # LATER element of its segment), all flat numpy
        newseg = np.concatenate([[True], bkt[1:] != bkt[:-1]])
        seg_id = np.cumsum(newseg) - 1
        seg_start = np.flatnonzero(newseg)
        seg_len = np.diff(np.append(seg_start, n))
        if int(seg_len.max()) > max_bucket:
            raise ValueError(
                f"distance_join bucket of {int(seg_len.max())} rows "
                f"exceeds max_bucket={max_bucket}; reduce d_m or "
                f"pre-shard")
        seg_end = (seg_start + seg_len)[seg_id]
        c = seg_end - np.arange(n, dtype=np.int64) - 1   # pairs per elem
        total = int(c.sum())
        if total == 0:
            return empty
        a = np.repeat(np.arange(n, dtype=np.int64), c)
        cume = np.concatenate([[0], np.cumsum(c)[:-1]]).astype(np.int64)
        b = a + 1 + (np.arange(total, dtype=np.int64) - np.repeat(cume, c))
        # orient each candidate pair as (smaller id, larger id)
        swap = ids[a] > ids[b]
        lo = np.where(swap, b, a)
        hi = np.where(swap, a, b)
        # exactly-once rule: count the pair only in the home bucket of the
        # SMALLER id (the neighbor emission guarantees co-residence there)
        keep = home[lo] & (ids[lo] != ids[hi])
        lo, hi = lo[keep], hi[keep]
        dist = _sphere.haversine_distance_m(lat[lo], lng[lo],
                                            lat[hi], lng[hi])
        ok = dist <= d_m
        return pd.DataFrame({
            "i": ids[lo[ok]],
            "j": ids[hi[ok]],
            "dist_m": np.round(dist[ok], 3),
        })

    return (pages_ds.map_batches(to_buckets, batch_format="pyarrow",
                                 batch_size=None)
            .groupby("part")
            .map_groups(pairs_part, batch_format="pandas"))


def bearing_sectors(pages_ds, qlat_deg: float, qlng_deg: float,
                    n_sectors: int = 16):
    """Compass-sector rollup: the initial great-circle bearing from a
    query point to every page (reference SmokeTest.php:23-30 formula,
    kernel.sphere.great_circle_bearing), bucketed into ``n_sectors``
    equal sectors — (sector, n_pages, min_dist_m, max_dist_m).

    sector = floor(((degrees(bearing) + 360) % 360) / (360/n)); both
    engines compute the identical doubles, so boundary pages cannot
    flip sectors.  One streaming partial pass (sector bincount + min/max
    of the mm-rounded haversine — order-free reductions only) and an
    n_sectors-sized groupby.
    """
    from ray.data.aggregate import Max, Min, Sum

    from ..kernel import sphere as _sphere

    qlat = np.radians(np.float64(qlat_deg))
    qlng = np.radians(np.float64(qlng_deg))
    width = 360.0 / n_sectors

    def partial(batch: pa.Table) -> pa.Table:
        lat = np.radians(batch["lat"].to_numpy(zero_copy_only=False))
        lng = np.radians(batch["lng"].to_numpy(zero_copy_only=False))
        if len(lat) == 0:
            return pa.table({
                "sector": pa.array([], type=pa.int64()),
                "pn": pa.array([], type=pa.int64()),
                "pmin": pa.array([], type=pa.float64()),
                "pmax": pa.array([], type=pa.float64()),
            })
        deg = np.degrees(_sphere.great_circle_bearing(qlat, qlng, lat, lng))
        sector = np.floor(np.mod(deg + 360.0, 360.0) / width) \
            .astype(np.int64)
        dm = np.round(_sphere.haversine_distance_m(qlat, qlng, lat, lng), 3)
        n = np.bincount(sector, minlength=n_sectors).astype(np.int64)
        dmin = np.full(n_sectors, np.inf)
        dmax = np.full(n_sectors, -np.inf)
        np.minimum.at(dmin, sector, dm)
        np.maximum.at(dmax, sector, dm)
        has = n > 0
        return pa.table({
            "sector": pa.array(np.flatnonzero(has).astype(np.int64)),
            "pn": pa.array(n[has]),
            "pmin": pa.array(dmin[has]),
            "pmax": pa.array(dmax[has]),
        })

    return (pages_ds.map_batches(partial, batch_format="pyarrow",
                                 batch_size=None)
            .groupby("sector")
            .aggregate(Sum("pn", alias_name="n_pages"),
                       Min("pmin", alias_name="min_dist_m"),
                       Max("pmax", alias_name="max_dist_m")))


def nearest_facility_stats(pages_ds, facilities):
    """Voronoi classification rollup: assign every page to its nearest
    facility (argmin reference haversine over a broadcast list) and
    aggregate per facility — (city_id, n_pages, min_dist_m, max_dist_m).

    ``facilities`` is [(lat_deg, lng_deg), ...]; city_id is the list
    index.  One streaming map_batches computes the (batch x K) distance
    matrix vectorized and emits ONE partial row per facility per batch;
    the only shuffle is the K-sized groupby.  Ranking ties break on the
    smaller city_id (same total order as the oracle's row_number); the
    rollup keeps only order-free reductions (count / min / max of the
    mm-rounded distance) so the hash can never see float summation order
    — the zonal_stats contract (a float mean is deliberately absent).
    """
    from ray.data.aggregate import Max, Min, Sum

    from ..kernel import sphere as _sphere

    flat = np.asarray(facilities, dtype=np.float64)
    clat = np.radians(flat[:, 0])
    clng = np.radians(flat[:, 1])
    K = len(flat)

    def partial(batch: pa.Table) -> pa.Table:
        lat = np.radians(batch["lat"].to_numpy(zero_copy_only=False))
        lng = np.radians(batch["lng"].to_numpy(zero_copy_only=False))
        if len(lat) == 0:
            return pa.table({
                "city_id": pa.array([], type=pa.int64()),
                "pn": pa.array([], type=pa.int64()),
                "pmin": pa.array([], type=pa.float64()),
                "pmax": pa.array([], type=pa.float64()),
            })
        d = _sphere.haversine_distance_m(lat[:, None], lng[:, None],
                                         clat[None, :], clng[None, :])
        best = np.argmin(d, axis=1)  # first minimum = smallest city_id
        bd = np.round(d[np.arange(len(lat)), best], 3)
        n = np.bincount(best, minlength=K).astype(np.int64)
        dmin = np.full(K, np.inf)
        dmax = np.full(K, -np.inf)
        np.minimum.at(dmin, best, bd)
        np.maximum.at(dmax, best, bd)
        has = n > 0
        ids = np.flatnonzero(has).astype(np.int64)
        return pa.table({
            "city_id": pa.array(ids),
            "pn": pa.array(n[has]),
            "pmin": pa.array(dmin[has]),
            "pmax": pa.array(dmax[has]),
        })

    return (pages_ds.map_batches(partial, batch_format="pyarrow",
                                 batch_size=None)
            .groupby("city_id")
            .aggregate(Sum("pn", alias_name="n_pages"),
                       Min("pmin", alias_name="min_dist_m"),
                       Max("pmax", alias_name="max_dist_m")))


_NN_PARTS = 64


def nearest_neighbor_map(pages_ds, d_m: float, max_bucket: int = 200_000):
    """Nearest-neighbor graph: each page's closest OTHER page within
    ``d_m`` meters — (page_id, nn_id, dist_m); isolated pages (no
    neighbor within d) are absent (inner semantics, mirrored in SQL).

    Composes the exactly-once :func:`distance_join_pairs` (cell +
    neighbor bucketing, pairwise reference haversine): pairs are
    symmetrized, then the per-point argmin runs in two stages — a
    per-batch local argmin (shrinks to <= one row per point per batch)
    and one point-hash co-partition for the global argmin, so the
    all-to-all moves at most #points rows, never the pair list.  Ranking
    uses the mm-ROUNDED distance with nn_id as the tie-break, the same
    total order as the oracle's row_number() — both engines rank
    identical doubles, so ties cannot diverge.
    """
    import pandas as pd

    pairs = distance_join_pairs(pages_ds, d_m, max_bucket=max_bucket)

    def local_best(batch: pa.Table) -> pa.Table:
        i = batch["i"].to_numpy(zero_copy_only=False)
        j = batch["j"].to_numpy(zero_copy_only=False)
        dm = batch["dist_m"].to_numpy(zero_copy_only=False)
        pid = np.concatenate([i, j])
        nn = np.concatenate([j, i])
        d = np.concatenate([dm, dm])
        if len(pid) == 0:
            return pa.table({
                "part": pa.array([], type=pa.int32()),
                "page_id": pa.array([], type=pa.int64()),
                "nn_id": pa.array([], type=pa.int64()),
                "dist_m": pa.array([], type=pa.float64()),
            })
        order = np.lexsort((nn, d, pid))
        pid, nn, d = pid[order], nn[order], d[order]
        first = np.concatenate([[True], pid[1:] != pid[:-1]])
        pid, nn, d = pid[first], nn[first], d[first]
        return pa.table({
            "part": pa.array((pid % _NN_PARTS).astype(np.int32)),
            "page_id": pa.array(pid.astype(np.int64)),
            "nn_id": pa.array(nn.astype(np.int64)),
            "dist_m": pa.array(d),
        })

    def merge_best(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "page_id": pd.Series(dtype=np.int64),
                "nn_id": pd.Series(dtype=np.int64),
                "dist_m": pd.Series(dtype=np.float64),
            })
        pid = df["page_id"].to_numpy()
        nn = df["nn_id"].to_numpy()
        d = df["dist_m"].to_numpy()
        order = np.lexsort((nn, d, pid))
        pid, nn, d = pid[order], nn[order], d[order]
        first = np.concatenate([[True], pid[1:] != pid[:-1]])
        return pd.DataFrame({
            "page_id": pid[first].astype(np.int64),
            "nn_id": nn[first].astype(np.int64),
            "dist_m": d[first],
        })

    return (pairs.map_batches(local_best, batch_format="pyarrow",
                              batch_size=None)
            .groupby("part")
            .map_groups(merge_best, batch_format="pandas"))


def knn_graph(pages_ds, d_m: float, k: int = 3, max_bucket: int = 200_000):
    """k-nearest-neighbor graph within ``d_m`` meters: for each page, its
    up-to-k closest OTHER pages — (page_id, nn_id, rank, dist_m), rank
    1..k by (mm-rounded distance, nn_id) exactly like the kNN contract;
    pages with no neighbor in range are absent.  Generalizes
    nearest_neighbor_map (k = 1) to the graph used by spatial smoothing
    and label propagation.

    Same two-stage distributed selection: symmetrized pairs -> per-batch
    LOCAL top-k per point (the shuffle moves at most k rows per point per
    batch) -> one point-hash co-partition picks the global top-k and
    assigns ranks.
    """
    import pandas as pd

    pairs = distance_join_pairs(pages_ds, d_m, max_bucket=max_bucket)
    K = int(k)

    def local_topk(batch: pa.Table) -> pa.Table:
        i = batch["i"].to_numpy(zero_copy_only=False)
        j = batch["j"].to_numpy(zero_copy_only=False)
        dm = batch["dist_m"].to_numpy(zero_copy_only=False)
        pid = np.concatenate([i, j]).astype(np.int64)
        nn = np.concatenate([j, i]).astype(np.int64)
        d = np.concatenate([dm, dm])
        if len(pid) == 0:
            return pa.table({
                "part": pa.array([], type=pa.int32()),
                "page_id": pa.array([], type=pa.int64()),
                "nn_id": pa.array([], type=pa.int64()),
                "dist_m": pa.array([], type=pa.float64()),
            })
        order = np.lexsort((nn, d, pid))
        pid, nn, d = pid[order], nn[order], d[order]
        starts = np.concatenate([[0], np.flatnonzero(pid[1:] != pid[:-1])
                                 + 1])
        within = np.arange(len(pid)) - np.repeat(
            starts, np.diff(np.append(starts, len(pid))))
        keep = within < K
        pid, nn, d = pid[keep], nn[keep], d[keep]
        return pa.table({
            "part": pa.array((pid % _NN_PARTS).astype(np.int32)),
            "page_id": pa.array(pid),
            "nn_id": pa.array(nn),
            "dist_m": pa.array(d),
        })

    def merge_topk(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "page_id": pd.Series(dtype=np.int64),
                "nn_id": pd.Series(dtype=np.int64),
                "rank": pd.Series(dtype=np.int64),
                "dist_m": pd.Series(dtype=np.float64),
            })
        pid = df["page_id"].to_numpy().astype(np.int64)
        nn = df["nn_id"].to_numpy().astype(np.int64)
        d = df["dist_m"].to_numpy()
        order = np.lexsort((nn, d, pid))
        pid, nn, d = pid[order], nn[order], d[order]
        starts = np.concatenate([[0], np.flatnonzero(pid[1:] != pid[:-1])
                                 + 1])
        within = np.arange(len(pid)) - np.repeat(
            starts, np.diff(np.append(starts, len(pid))))
        keep = within < K
        return pd.DataFrame({
            "page_id": pid[keep],
            "nn_id": nn[keep],
            "rank": (within[keep] + 1).astype(np.int64),
            "dist_m": d[keep],
        })

    return (pairs.map_batches(local_topk, batch_format="pyarrow",
                              batch_size=None)
            .groupby("part")
            .map_groups(merge_topk, batch_format="pandas"))


def knn_hubness(pages_ds, d_m: float, k: int = 3,
                max_bucket: int = 200_000):
    """Hubness profile of the kNN graph — the histogram of IN-degrees
    (how many points list point p among their k nearest): rows
    (in_degree, n_points), in_degree >= 1.  The classic skew diagnostic
    for neighbor-based methods: a heavy right tail ("hub" points that
    appear in everyone's neighbor list) degrades kNN classification and
    graph-based label propagation; under spatial uniformity in-degree
    concentrates near k.  Points that never appear as anyone's neighbor
    carry in-degree 0 and are absent by contract (representing them
    would need the full point table for no analytic gain).

    Scale shape: composes :func:`knn_graph` (shuffle bounded at k rows
    per point per batch by the two-stage local/global top-k) with two
    count groupbys, each preceded by a per-batch ``np.unique`` partial —
    the first is keyed by nn_id (at most k*N rows in, N out), the second
    by in_degree whose key cardinality is bounded by the max in-degree
    (<< N), so the final table is tiny.
    """
    from ray.data.aggregate import Sum

    edges = knn_graph(pages_ds, d_m, k=k, max_bucket=max_bucket)

    def count_partial(batch: pa.Table) -> pa.Table:
        nn = batch["nn_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(nn, return_counts=True)
        return pa.table({"nn_id": pa.array(u),
                         "pn": pa.array(c.astype(np.int64))})

    indeg = (edges.map_batches(count_partial, batch_format="pyarrow",
                               batch_size=None)
             .groupby("nn_id").aggregate(Sum("pn",
                                             alias_name="in_degree")))

    def hist_partial(batch: pa.Table) -> pa.Table:
        d = batch["in_degree"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        u, c = np.unique(d, return_counts=True)
        return pa.table({"in_degree": pa.array(u),
                         "pn": pa.array(c.astype(np.int64))})

    return (indeg.map_batches(hist_partial, batch_format="pyarrow",
                              batch_size=None)
            .groupby("in_degree").aggregate(Sum("pn",
                                                alias_name="n_points")))


def ripley_k(pages_ds, radii=(5_000.0, 10_000.0, 25_000.0),
             max_bucket: int = 200_000, n_parts: int = 64):
    """Ripley's K function of the page point pattern — the classic
    multi-scale spatial clustering statistic: for each radius r, the
    pair count within r and K(r) = 4*pi*R_km^2 * 2*n_pairs / (n*(n-1))
    (the global spherical estimator, area in km^2; K(r) >> pi*r_km^2
    means clustering at scale r).  Output: one row per radius
    (r_m, n_pairs, k_km2); k_km2 is NULL when n < 2.

    Exactness: pair counts come from ONE distance self-join at
    max(radii) (cell+neighbor buckets, exactly-once pair rule —
    :func:`distance_join_pairs`), thresholded per radius on the SAME
    mm-ROUNDED distance the join emits, so every count is an exact
    integer; n is an exact count; the K expression is ONE
    CAST-then-divide float chain in the oracle's op order.  Scale
    shape: the join's shuffle is the whole cost (constant 9 rows per
    point); the per-radius fold is a 3-int reduction.
    """
    from ray.data.aggregate import Sum

    from .text import round_half_away

    import ray.data

    rs = sorted(float(r) for r in radii)
    # one corpus scan: the extraction pipeline is the dominant cost, so
    # materialize before the count + join double-consumption (the
    # dedup.py pairs.materialize() convention)
    pages_ds = pages_ds.materialize()
    n_pts = int(pages_ds.count())
    pairs = distance_join_pairs(pages_ds, rs[-1], max_bucket=max_bucket,
                                n_parts=n_parts)

    def counts(batch: pa.Table) -> pa.Table:
        dm = batch["dist_m"].to_numpy(zero_copy_only=False)
        return pa.table({
            "r_m": pa.array(rs, type=pa.float64()),
            "np_": pa.array([int((dm <= r).sum()) for r in rs],
                            type=pa.int64()),
        })

    # zero-count seed rows injected AFTER the per-batch counts: an
    # empty/degenerate corpus (zero pair blocks) still yields one row
    # per radius (NULL K), exactly like the oracle's legs
    seed = ray.data.from_arrow(pa.table({
        "r_m": pa.array(rs, type=pa.float64()),
        "np_": pa.array([0] * len(rs), type=pa.int64()),
    }))
    agg = (pairs.map_batches(counts, batch_format="pyarrow",
                             batch_size=None)
           .union(seed)
           .groupby("r_m").aggregate(Sum("np_", alias_name="n_pairs")))

    area_km2 = 4.0 * np.pi * 6371.0 * 6371.0

    def finish(batch: pa.Table) -> pa.Table:
        npair = batch["n_pairs"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        den = n_pts * (n_pts - 1)
        k = [None if den == 0 else float(round_half_away(np.float64(
                 area_km2 * float(2 * int(x)) / float(den)), 6))
             for x in npair]
        return pa.table({
            "r_m": batch["r_m"],
            "n_pairs": batch["n_pairs"],
            "k_km2": pa.array(k, type=pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def clark_evans(pages_ds, d_m: float):
    """Clark-Evans aggregation index of the page point pattern — the
    classic nearest-neighbor CSR test: CE = observed mean NN distance /
    expected mean under complete spatial randomness (1 / (2*sqrt(n/A)),
    A = the full sphere 4*pi*R^2).  CE < 1 = clustered, ~1 = random,
    > 1 = overdispersed.  ONE row (n_points, n_with_nn, mean_nn_m, ce);
    the observed mean runs over pages whose NN lies within ``d_m``
    (the same bounded-search contract as :func:`nearest_neighbor_map`,
    mirrored in the oracle); ce is NULL when no page has a neighbor.

    Exactness: NN distances are the mm-rounded doubles the argmin
    emits (hash-exact vs SQL); their sum is ORDER-PINNED to ascending
    page_id (sequential left fold here, list_reduce over
    list(... ORDER BY page_id) in SQL); n_points is an exact count and
    the mean/expected/ce chain is evaluated in the oracle's exact op
    order (incl. IEEE sqrt).
    """
    from .text import round_half_away

    import ray.data

    # one corpus scan (cf. ripley_k): materialize before count + join
    pages_ds = pages_ds.materialize()
    n_pts = int(pages_ds.count())
    nn = nearest_neighbor_map(pages_ds, d_m)
    # sentinel seed row (page_id = -1, dropped inside the fold): an
    # empty/degenerate corpus must still reach the fold and emit ONE
    # row with NULL stats, like the oracle, instead of collapsing to a
    # zero-block dataset (cf. ripley_k's post-count seed)
    import pandas as _pd

    # pandas block to match nearest_neighbor_map's map_groups output
    # (mixed Arrow/pandas blocks crash Ray's shuffle reduce)
    nn = nn.union(ray.data.from_pandas(_pd.DataFrame({
        "page_id": np.array([-1], dtype=np.int64),
        "nn_id": np.array([-1], dtype=np.int64),
        "dist_m": np.array([0.0], dtype=np.float64),
    })))

    def fold(batch: pa.Table) -> pa.Table:
        pid = batch["page_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        dm = batch["dist_m"].to_numpy(zero_copy_only=False)
        real = pid >= 0                     # drop the sentinel seed row
        pid, dm = pid[real], dm[real]
        order = np.argsort(pid, kind="stable")
        dm = dm[order]
        k = len(dm)
        acc = 0.0
        for v in dm.tolist():          # sequential fold, pinned order
            acc += v
        mean = None
        ce = None
        if k > 0 and n_pts > 0:
            mean_v = acc / float(k)
            area = 4.0 * np.pi * 6371000.0 * 6371000.0
            expected = 1.0 / (2.0 * np.sqrt(float(n_pts) / area))
            ce_v = mean_v / expected
            mean = float(round_half_away(np.float64(mean_v), 6))
            ce = float(round_half_away(np.float64(ce_v), 6))
        return pa.table({
            "n_points": pa.array([n_pts], type=pa.int64()),
            "n_with_nn": pa.array([k], type=pa.int64()),
            "mean_nn_m": pa.array([mean], type=pa.float64()),
            "ce": pa.array([ce], type=pa.float64()),
        })

    return nn.repartition(1).map_batches(fold, batch_format="pyarrow",
                                         batch_size=None)


def destination_points(pages_ds, bearing_mod: int = 360,
                       dist_step_m: float = 1000.0, dist_mod: int = 100):
    """Great-circle destination projection (reference SmokeTest.php:32-47
    greatCircleDestination, kernel sphere.great_circle_destination): every
    page is displaced along a page-keyed deterministic bearing
    (``page_id % bearing_mod`` degrees) and distance
    (``dist_step_m * (1 + page_id % dist_mod)``), returning
    (page_id, dest_lat, dest_lng) in 1e-6-rounded degrees.

    Purely per-row trig -> ONE stateless zero-copy map_batches, no shuffle;
    at 100 TB this is embarrassingly parallel.  The SQL oracle mirrors the
    kernel's op order term by term (asin/atan2 composition), so both
    engines compute identical doubles before the shared round.
    """
    from .text import round_half_away

    def proj(batch: pa.Table) -> pa.Table:
        pid = batch["page_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        lat = np.radians(batch["lat"].to_numpy(zero_copy_only=False))
        lng = np.radians(batch["lng"].to_numpy(zero_copy_only=False))
        brg = np.radians((pid % bearing_mod).astype(np.float64))
        dist = dist_step_m * (1.0 + (pid % dist_mod).astype(np.float64))
        dlat, dlng = sphere.great_circle_destination(lat, lng, brg, dist)
        return pa.table({
            "page_id": pa.array(pid),
            "dest_lat": pa.array(round_half_away(np.degrees(dlat), 6)),
            "dest_lng": pa.array(round_half_away(np.degrees(dlng), 6)),
        })

    return pages_ds.map_batches(proj, batch_format="pyarrow",
                                batch_size=None)


def destination_points_sql(cte: str, bearing_mod: int = 360,
                           dist_step_m: float = 1000.0,
                           dist_mod: int = 100) -> str:
    """DuckDB mirror of :func:`destination_points` — the exact kernel op
    order of great_circle_destination (SmokeTest.php:32-47)."""
    return f"""{cte},
d0 AS (SELECT page_id, radians(lat) AS la, radians(lng) AS lo,
              radians(CAST(page_id % {bearing_mod} AS DOUBLE)) AS br,
              ({dist_step_m!r} * (1 + page_id % {dist_mod})) / 6371000.0
                AS dr
       FROM pages_geo),
d1 AS (SELECT page_id, lo, br, cos(dr) AS cd, sin(dr) AS sd,
              sin(la) AS sl, cos(la) AS cl FROM d0),
d2 AS (SELECT page_id, lo, br, cd, sd, sl, cl,
              asin(sl * cd + cl * sd * cos(br)) AS dlat FROM d1)
SELECT page_id, round(degrees(dlat), 6) AS dest_lat,
       round(degrees(lo + atan2(sin(br) * sd * cl,
                                cd - sl * sin(dlat))), 6) AS dest_lng
FROM d2"""


def location_codec(pages_ds):
    """E6 hex location codec round-trip (reference SmokeTest.php:49-60
    encodeLocation/decodeLocation): per page, the ``'%08x,%08x'`` string of
    the truncated microdegrees plus the DECODED microdegree ints (the
    engine really parses its own hex back — kernel sphere.unhex64 — so a
    codec bug cannot cancel out; the oracle computes the ints directly).

    One stateless map_batches, no shuffle; the hex render and parse are
    both fully vectorized nibble gathers (no per-row python).
    """
    import pyarrow.compute as pc

    def codec(batch: pa.Table) -> pa.Table:
        pid = batch["page_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        la_hex = sphere.hex08(np.trunc(lat * 1e6).astype(np.int64))
        lo_hex = sphere.hex08(np.trunc(lng * 1e6).astype(np.int64))
        loc = pc.binary_join_element_wise(
            pa.array(la_hex, type=pa.string()),
            pa.array(lo_hex, type=pa.string()), ",")
        # decode path: split the joined string again (PHP decodeLocation
        # semantics) and hex-parse both halves
        parts = pc.split_pattern(loc, ",")
        flat = parts.flatten().to_numpy(zero_copy_only=False)
        lat_e6 = sphere.unhex64(flat[0::2])
        lng_e6 = sphere.unhex64(flat[1::2])
        return pa.table({
            "page_id": pa.array(pid),
            "loc_hex": loc,
            "lat_e6": pa.array(lat_e6),
            "lng_e6": pa.array(lng_e6),
        })

    return pages_ds.map_batches(codec, batch_format="pyarrow",
                                batch_size=None)


def location_codec_sql(cte: str) -> str:
    """DuckDB mirror of :func:`location_codec` — printf('%08x', BIGINT)
    reproduces PHP's 64-bit sprintf (16-char two's complement for
    negatives) bit for bit."""
    return f"""{cte},
e6 AS (SELECT page_id,
              CAST(TRUNC(lat * 1e6) AS BIGINT) AS lat_e6,
              CAST(TRUNC(lng * 1e6) AS BIGINT) AS lng_e6
       FROM pages_geo)
SELECT page_id,
       printf('%08x', lat_e6) || ',' || printf('%08x', lng_e6) AS loc_hex,
       lat_e6, lng_e6
FROM e6"""


def pair_dist_hist(pages_ds, d_m: float, band_m: float = 5000.0,
                   max_bucket: int = 200_000, n_parts: int = 64):
    """Radial pair-distance histogram: the :func:`distance_join_pairs`
    pair set binned into ``band_m``-wide great-circle distance bands —
    (band, n_pairs, min_m, max_m), only non-empty bands.

    The point-pattern diagnostic between a raw pair dump and Ripley's K:
    same exactly-once bucketed pair core (constant 9-rows-per-point
    shuffle), then ONE floor-divide on the mm-rounded distance (identical
    IEEE op both engines) and a band-cardinality groupby of count/min/max
    partials — min/max are order-free, no float sums cross batches.
    """
    import ray.data
    from ray.data.aggregate import Max, Min, Sum

    pairs = distance_join_pairs(pages_ds, d_m, max_bucket=max_bucket,
                                n_parts=n_parts)

    def partial(batch: pa.Table) -> pa.Table:
        dm = batch["dist_m"].to_numpy(zero_copy_only=False)
        band = np.floor(dm / np.float64(band_m)).astype(np.int64)
        u, inv = np.unique(band, return_inverse=True)
        mn = np.full(len(u), np.inf)
        mx = np.full(len(u), -np.inf)
        np.minimum.at(mn, inv, dm)
        np.maximum.at(mx, inv, dm)
        return pa.table({
            "band": pa.array(u),
            "pn": pa.array(np.bincount(inv, minlength=len(u))
                           .astype(np.int64)),
            "pmn": pa.array(mn),
            "pmx": pa.array(mx),
        })

    return (pairs.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
            .groupby("band")
            .aggregate(Sum("pn", alias_name="n_pairs"),
                       Min("pmn", alias_name="min_m"),
                       Max("pmx", alias_name="max_m"))
            .sort("band"))


def nn_g_function(pages_ds, radii=(5_000.0, 10_000.0, 25_000.0),
                  max_bucket: int = 200_000):
    """The G-function (nearest-neighbor distance CDF) of the page point
    pattern — per radius r: the count of pages whose nearest-neighbor
    distance is <= r and G(r) = n_le / n — (r_m, n_le, g).  The
    companion statistic to Ripley's K (K looks at ALL pairs per scale, G
    at each point's closest one; together they separate clustering from
    inhibition).

    Exactness: nearest-neighbor distances come from
    :func:`nearest_neighbor_map` at max(radii) (exactly-once bucketed
    pairs, mm-rounded haversine, (dm, nn_id) total order), thresholded
    per radius on the SAME rounded doubles; n is an exact count; the one
    G division is CAST-then-divide in the oracle's op order.  Isolated
    pages (no neighbor within max radius) count in n but in no n_le —
    identical inner semantics on both engines.
    """
    import ray.data
    from ray.data.aggregate import Sum

    from .text import round_half_away

    rs = sorted(float(r) for r in radii)
    # one corpus scan (the ripley_k materialize-then-count convention)
    pages_ds = pages_ds.materialize()
    n_pts = int(pages_ds.count())
    nn = nearest_neighbor_map(pages_ds, rs[-1], max_bucket=max_bucket)

    def counts(batch: pa.Table) -> pa.Table:
        dm = batch["dist_m"].to_numpy(zero_copy_only=False)
        return pa.table({
            "r_m": pa.array(rs, type=pa.float64()),
            "pn": pa.array([int((dm <= r).sum()) for r in rs],
                           type=pa.int64()),
        })

    out = (nn.map_batches(counts, batch_format="pyarrow",
                          batch_size=None)
           .groupby("r_m")
           .aggregate(Sum("pn", alias_name="n_le"))
           .take_all())  # len(radii) rows
    got = {float(r["r_m"]): int(r["n_le"]) for r in out}
    # an all-isolated pattern yields no nn rows at all; the oracle's
    # UNION-ALL legs still emit one zero row per radius — mirror that
    n_le = [got.get(r, 0) for r in rs]
    import ray.data as _rd
    return _rd.from_arrow(pa.table({
        "r_m": pa.array(rs, type=pa.float64()),
        "n_le": pa.array(n_le, type=pa.int64()),
        "g": pa.array([None if n_pts == 0 else float(round_half_away(
            np.float64(c) / np.float64(n_pts), 6)) for c in n_le],
            type=pa.float64()),
    }))


def bipartite_nn(pages_ds, d_m: float, lang_a: str = "zh",
                 lang_b: str = "en", max_bucket: int = 200_000):
    """Bipartite (cross-type) nearest neighbor: for every page of
    ``lang_a``, its closest ``lang_b`` page within ``d_m`` meters —
    (page_id, nn_id, dist_m); lang_a pages with no lang_b neighbor in
    range are absent (inner semantics).  The "nearest competitor of the
    OTHER brand" join of retail/geo-marketing analytics, and the geo
    twin of the embedding-space cross_lang_nn.

    Plan: the corpus filters to the two languages and the lang bit is
    ENCODED into the point id (id*2 + is_b) so the exactly-once
    :func:`distance_join_pairs` core carries it through the bucket
    shuffle for free; pairs are then oriented a -> b only and the same
    two-stage distributed argmin as :func:`nearest_neighbor_map` picks
    the per-source minimum.  The (dm, encoded nn) lexsort ranks
    identically to the oracle's (dm, true nn) row_number because the
    encoding is monotonic in the true id on the fixed is_b bit.
    """
    import pandas as pd

    def prep(batch: pa.Table) -> pa.Table:
        lang = batch["lang"].to_numpy(zero_copy_only=False)
        ids = batch["page_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        is_a = lang == lang_a
        is_b = lang == lang_b
        keep = is_a | is_b
        return pa.table({
            "page_id": pa.array(ids[keep] * 2
                                + is_b[keep].astype(np.int64)),
            "lat": batch["lat"].filter(pa.array(keep)),
            "lng": batch["lng"].filter(pa.array(keep)),
        })

    pairs = distance_join_pairs(
        pages_ds.map_batches(prep, batch_format="pyarrow",
                             batch_size=None),
        d_m, max_bucket=max_bucket)

    def local_best(batch: pa.Table) -> pa.Table:
        i = batch["i"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = batch["j"].to_numpy(zero_copy_only=False).astype(np.int64)
        dm = batch["dist_m"].to_numpy(zero_copy_only=False)
        pid = np.concatenate([i, j])
        nn = np.concatenate([j, i])
        d = np.concatenate([dm, dm])
        keep = (pid % 2 == 0) & (nn % 2 == 1)     # a -> b only
        pid, nn, d = pid[keep], nn[keep], d[keep]
        if len(pid) == 0:
            return pa.table({
                "part": pa.array([], type=pa.int32()),
                "page_id": pa.array([], type=pa.int64()),
                "nn_id": pa.array([], type=pa.int64()),
                "dist_m": pa.array([], type=pa.float64()),
            })
        order = np.lexsort((nn, d, pid))
        pid, nn, d = pid[order], nn[order], d[order]
        first = np.concatenate([[True], pid[1:] != pid[:-1]])
        pid, nn, d = pid[first], nn[first], d[first]
        return pa.table({
            "part": pa.array((pid % _NN_PARTS).astype(np.int32)),
            "page_id": pa.array(pid),
            "nn_id": pa.array(nn),
            "dist_m": pa.array(d),
        })

    def merge_best(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "page_id": pd.Series(dtype=np.int64),
                "nn_id": pd.Series(dtype=np.int64),
                "dist_m": pd.Series(dtype=np.float64),
            })
        pid = df["page_id"].to_numpy()
        nn = df["nn_id"].to_numpy()
        d = df["dist_m"].to_numpy()
        order = np.lexsort((nn, d, pid))
        pid, nn, d = pid[order], nn[order], d[order]
        first = np.concatenate([[True], pid[1:] != pid[:-1]])
        return pd.DataFrame({
            "page_id": (pid[first] // 2).astype(np.int64),
            "nn_id": (nn[first] // 2).astype(np.int64),
            "dist_m": d[first],
        })

    return (pairs.map_batches(local_best, batch_format="pyarrow",
                              batch_size=None)
            .groupby("part")
            .map_groups(merge_best, batch_format="pandas"))


def cross_k(pages_ds, radii=(5_000.0, 10_000.0, 25_000.0),
            lang_a: str = "zh", lang_b: str = "en",
            max_bucket: int = 200_000, n_parts: int = 64):
    """Bivariate (cross-type) Ripley's K between two languages — for
    each radius r: the count of mixed (lang_a, lang_b) pairs within r
    and K_ab(r) = A * n_pairs / (n_a * n_b) (global spherical estimator,
    area in km^2; K_ab >> pi r_km^2 means the two types co-cluster,
    << means segregation).  Output: (r_m, n_pairs, k_km2) per radius;
    k_km2 is NULL when either type is absent.

    Same machinery as :func:`ripley_k` with the :func:`bipartite_nn`
    lang-bit id encoding: the two-language subset streams once through
    the exactly-once pair core at max(radii), mixed pairs filter on the
    parity bits, and every unordered mixed pair has exactly one a-end
    and one b-end — so the undirected exactly-once count IS the
    bivariate double-sum.  All counts exact integers; one
    CAST-then-divide float chain per radius in the oracle's op order.
    """
    from ray.data.aggregate import Sum

    from .text import round_half_away

    import ray.data

    rs = sorted(float(r) for r in radii)

    def prep(batch: pa.Table) -> pa.Table:
        lang = batch["lang"].to_numpy(zero_copy_only=False)
        ids = batch["page_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        is_a = lang == lang_a
        is_b = lang == lang_b
        keep = is_a | is_b
        return pa.table({
            "page_id": pa.array(ids[keep] * 2
                                + is_b[keep].astype(np.int64)),
            "lat": batch["lat"].filter(pa.array(keep)),
            "lng": batch["lng"].filter(pa.array(keep)),
        })

    sub = pages_ds.map_batches(prep, batch_format="pyarrow",
                               batch_size=None).materialize()

    def count_ab(batch: pa.Table) -> pa.Table:
        bit = batch["page_id"].to_numpy(zero_copy_only=False) % 2
        return pa.table({
            "na": pa.array([int((bit == 0).sum())], type=pa.int64()),
            "nb": pa.array([int((bit == 1).sum())], type=pa.int64()),
        })

    cnt = (sub.map_batches(count_ab, batch_format="pyarrow",
                           batch_size=None)
           .aggregate(Sum("na"), Sum("nb")))
    n_a = int(cnt["sum(na)"] or 0)
    n_b = int(cnt["sum(nb)"] or 0)

    pairs = distance_join_pairs(sub, rs[-1], max_bucket=max_bucket,
                                n_parts=n_parts)

    def counts(batch: pa.Table) -> pa.Table:
        i = batch["i"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = batch["j"].to_numpy(zero_copy_only=False).astype(np.int64)
        dm = batch["dist_m"].to_numpy(zero_copy_only=False)
        mixed = (i % 2) != (j % 2)
        dm = dm[mixed]
        return pa.table({
            "r_m": pa.array(rs, type=pa.float64()),
            "np_": pa.array([int((dm <= r).sum()) for r in rs],
                            type=pa.int64()),
        })

    seed = ray.data.from_arrow(pa.table({
        "r_m": pa.array(rs, type=pa.float64()),
        "np_": pa.array([0] * len(rs), type=pa.int64()),
    }))
    agg = (pairs.map_batches(counts, batch_format="pyarrow",
                             batch_size=None)
           .union(seed)
           .groupby("r_m").aggregate(Sum("np_", alias_name="n_pairs")))

    area_km2 = 4.0 * np.pi * 6371.0 * 6371.0

    def finish(batch: pa.Table) -> pa.Table:
        np_ = batch["n_pairs"].to_numpy(zero_copy_only=False)
        k = [None if n_a * n_b == 0 else float(round_half_away(
            np.float64(area_km2 * np.float64(float(p))
                       / np.float64(float(n_a * n_b)))))
            for p in np_.tolist()]
        return pa.table({
            "r_m": batch["r_m"],
            "n_pairs": pa.array(np_, type=pa.int64()),
            "k_km2": pa.array(k, type=pa.float64()),
        })

    return (agg.map_batches(finish, batch_format="pyarrow",
                            batch_size=None).sort("r_m"))


def city_visits_monthly(pages_ds, facilities, radius_m: float = 100_000.0):
    """Geofence x month rollup: for each (facility, month), the count of
    pages inside the facility's ``radius_m`` great-circle fence —
    (city_id, month, n_pages), occupied cells only.  A page inside two
    overlapping fences counts in BOTH (geofence semantics, not Voronoi —
    the space-time companion of :func:`nearest_facility_stats`).

    One streaming pass computes the (batch x K) reference-haversine
    matrix vectorized, thresholds on the raw doubles (identical
    expression both engines — no rounding enters the predicate), and
    emits per-(facility, month) count partials; the only shuffle is the
    (K x months)-cardinality groupby.  All outputs are exact integers.
    """
    from ray.data.aggregate import Sum

    from ..kernel import sphere as _sphere

    flat = np.asarray(facilities, dtype=np.float64)
    clat = np.radians(flat[:, 0])
    clng = np.radians(flat[:, 1])
    K = len(flat)

    def partial(batch: pa.Table) -> pa.Table:
        lat = np.radians(batch["lat"].to_numpy(zero_copy_only=False))
        lng = np.radians(batch["lng"].to_numpy(zero_copy_only=False))
        ts = batch["warc_ts"].to_numpy(zero_copy_only=False)
        if len(lat) == 0:
            return pa.table({
                "k": pa.array([], type=pa.int64()),
                "pn": pa.array([], type=pa.int64()),
            })
        m = ts.astype("datetime64[M]").astype(np.int64)
        d = _sphere.haversine_distance_m(lat[:, None], lng[:, None],
                                         clat[None, :], clng[None, :])
        rows, cols = np.nonzero(d <= radius_m)
        key = cols.astype(np.int64) * np.int64(1 << 32) + m[rows]
        u, c = np.unique(key, return_counts=True)
        return pa.table({"k": pa.array(u),
                         "pn": pa.array(c.astype(np.int64))})

    agg = (pages_ds.map_batches(partial, batch_format="pyarrow",
                                batch_size=None)
           .groupby("k").aggregate(Sum("pn", alias_name="n_pages")))

    def finish(batch: pa.Table) -> pa.Table:
        k = batch["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "city_id": pa.array(k // np.int64(1 << 32)),
            "month": pa.array((k % np.int64(1 << 32))
                              .astype("datetime64[M]")
                              .astype("datetime64[us]")),
            "n_pages": batch["n_pages"],
        })

    return (agg.map_batches(finish, batch_format="pyarrow",
                            batch_size=None)
            .sort(["city_id", "month"]))


def idw_interpolate(sf_dir: str, d_m: float, k: int = 3,
                    n_parts: int = 64, max_bucket: int = 200_000):
    """Inverse-distance-weighted kNN regression (spatial interpolation):
    predict each page's n_chars from its up-to-k nearest neighbors
    within ``d_m`` meters, weighted w = 1 / (1 + d^2) — (page_id,
    n_neighbors, idw_chars).  The kriging-lite smoother of raster GIS,
    run at the sample points themselves (leave-one-out form: a page
    never contributes to its own estimate because knn_graph excludes
    self-pairs); pages with no neighbor in range are absent.

    Plan: :func:`knn_graph` supplies ranked neighbor edges (at most k
    rows per page ever shuffle); neighbor values attach via the generic
    nn_id = doc_id co-partition join (page_id == doc_id for this
    corpus); one page-hash co-partition then folds num/den ORDER-PINNED
    by rank — a k-step vectorized left fold, the identical IEEE addition
    sequence as the oracle's list_reduce over list(... ORDER BY rank) —
    and the single num/den division is mirrored CAST-for-CAST.  Weights
    use the mm-ROUNDED knn distance, so both engines weight identical
    doubles.
    """
    import pandas as pd

    from ..sources.readers import read_table
    from .join import copartition_hash_join
    from .text import round_half_away
    from .tiles import pages_with_cells

    knn = knn_graph(pages_with_cells(sf_dir, token_level=None),
                    d_m, k=k, max_bucket=max_bucket)
    docs = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])
    j = copartition_hash_join(knn, docs, on="nn_id", right_on="doc_id",
                              n_parts=n_parts)
    P = np.int64(n_parts)
    K = int(k)

    def tag(batch: pa.Table) -> pa.Table:
        pid = batch["page_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "part": pa.array((pid % P).astype(np.int32)),
            "pid": pa.array(pid),
            "rank": pa.array(batch["rank"].to_numpy(zero_copy_only=False)
                             .astype(np.int64)),
            "dm": pa.array(batch["dist_m"]
                           .to_numpy(zero_copy_only=False)),
            "v": pa.array(batch["n_chars"].to_numpy(zero_copy_only=False)
                          .astype(np.float64)),
        })

    def fold(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return pa.table({
                "page_id": pa.array([], type=pa.int64()),
                "n_neighbors": pa.array([], type=pa.int64()),
                "idw_chars": pa.array([], type=pa.float64()),
            })
        pid = df["pid"].to_numpy().astype(np.int64)
        rank = df["rank"].to_numpy().astype(np.int64)
        dm = df["dm"].to_numpy()
        v = df["v"].to_numpy()
        w = 1.0 / (1.0 + dm * dm)
        uniq, idx = np.unique(pid, return_inverse=True)
        num = np.zeros(len(uniq), dtype=np.float64)
        den = np.zeros(len(uniq), dtype=np.float64)
        cnt = np.zeros(len(uniq), dtype=np.int64)
        for r in range(1, K + 1):        # order-pinned left fold by rank
            m = rank == r
            num[idx[m]] = num[idx[m]] + w[m] * v[m]
            den[idx[m]] = den[idx[m]] + w[m]
            cnt[idx[m]] += 1
        return pa.table({
            "page_id": pa.array(uniq),
            "n_neighbors": pa.array(cnt),
            "idw_chars": pa.array(round_half_away(num / den)),
        })

    return (j.map_batches(tag, batch_format="pyarrow", batch_size=None)
            .groupby("part")
            .map_groups(fold, batch_format="pandas"))


def colocation_quotient(pages_ds, d_m: float, max_bucket: int = 200_000):
    """Colocation quotient between language point patterns: over the
    pages that HAVE a nearest neighbor within ``d_m`` meters (the NN
    universe; isolated pages drop on both engines), CLQ(a->b) =
    (C_ab / N_a) / (N'_b / (N - 1)) where C_ab counts a-pages whose NN
    is a b-page and N'_b subtracts self when a = b — the directional
    "does a seek b" statistic of colocation analysis (> 1 attraction,
    < 1 avoidance).  Output (lang_a, lang_b, n_ab, clq), lang-sorted.

    Plan: one vocabulary-discovery pass collects the (tiny) lang set so
    each lang gets a stable code; the code is ENCODED into the point id
    (id * n_langs + code, monotonic in the true id, so the (dm, encoded
    nn) lexsort ranks exactly like the oracle's (dm, true nn)
    row_number — the bipartite_nn argument); the exactly-once
    :func:`distance_join_pairs` core then carries both endpoint langs
    through the bucket shuffle for free, the same two-stage distributed
    argmin as :func:`nearest_neighbor_map` picks each page's NN, and
    only (lang_a, lang_b) cell counts (|langs|^2-bounded) leave the
    final pass.  The CLQ float chain is mirrored op-for-op; degenerate
    denominators (single-point lang with a = b) yield NULL like the
    SQL CASE.
    """
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Sum

    from .text import round_half_away

    # vocabulary discovery: one pruned-column pass, bounded output
    lang_rows = (pages_ds.select_columns(["lang"])
                 .map_batches(lambda b: pa.table({
                     "lang": pc.unique(pc.cast(b["lang"], pa.string()))}),
                     batch_format="pyarrow", batch_size=None)
                 .take_all())
    langs = sorted({r["lang"] for r in lang_rows if r["lang"] is not None})
    K = np.int64(max(len(langs), 1))
    code = {lg: i for i, lg in enumerate(langs)}

    def prep(batch: pa.Table) -> pa.Table:
        lang = batch["lang"].to_pandas()
        keep = lang.notna().to_numpy()
        ids = batch["page_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        codes = lang[keep].map(code).to_numpy().astype(np.int64)
        return pa.table({
            "page_id": pa.array(ids * K + codes),
            "lat": batch["lat"].filter(pa.array(keep)),
            "lng": batch["lng"].filter(pa.array(keep)),
        })

    pairs = distance_join_pairs(
        pages_ds.map_batches(prep, batch_format="pyarrow",
                             batch_size=None),
        d_m, max_bucket=max_bucket)

    def local_best(batch: pa.Table) -> pa.Table:
        i = batch["i"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = batch["j"].to_numpy(zero_copy_only=False).astype(np.int64)
        dm = batch["dist_m"].to_numpy(zero_copy_only=False)
        pid = np.concatenate([i, j])
        nn = np.concatenate([j, i])
        d = np.concatenate([dm, dm])
        if len(pid) == 0:
            return pa.table({
                "part": pa.array([], type=pa.int32()),
                "page_id": pa.array([], type=pa.int64()),
                "nn_id": pa.array([], type=pa.int64()),
                "dist_m": pa.array([], type=pa.float64()),
            })
        order = np.lexsort((nn, d, pid))
        pid, nn, d = pid[order], nn[order], d[order]
        first = np.concatenate([[True], pid[1:] != pid[:-1]])
        pid, nn, d = pid[first], nn[first], d[first]
        return pa.table({
            "part": pa.array(((pid // K) % _NN_PARTS).astype(np.int32)),
            "page_id": pa.array(pid),
            "nn_id": pa.array(nn),
            "dist_m": pa.array(d),
        })

    def merge_cells(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return pa.table({
                "a": pa.array([], type=pa.int64()),
                "b": pa.array([], type=pa.int64()),
                "pn": pa.array([], type=pa.int64())})
        pid = df["page_id"].to_numpy()
        nn = df["nn_id"].to_numpy()
        d = df["dist_m"].to_numpy()
        order = np.lexsort((nn, d, pid))
        pid, nn = pid[order], nn[order]
        first = np.concatenate([[True], pid[1:] != pid[:-1]])
        a = (pid[first] % K).astype(np.int64)
        b = (nn[first] % K).astype(np.int64)
        key = a * K + b
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "a": pa.array((uk // K).astype(np.int64)),
            "b": pa.array((uk % K).astype(np.int64)),
            "pn": pa.array(cnt.astype(np.int64)),
        })

    cells = (pairs.map_batches(local_best, batch_format="pyarrow",
                               batch_size=None)
             .groupby("part")
             .map_groups(merge_cells, batch_format="pandas")
             .groupby(["a", "b"])
             .aggregate(Sum("pn", alias_name="n_ab"))).to_pandas()

    na = {}
    for _, r in cells.iterrows():
        na[int(r["a"])] = na.get(int(r["a"]), 0) + int(r["n_ab"])
    n_tot = sum(na.values())
    out = {"lang_a": [], "lang_b": [], "n_ab": [], "clq": []}
    for _, r in cells.sort_values(["a", "b"]).iterrows():
        a, b, c = int(r["a"]), int(r["b"]), int(r["n_ab"])
        nb = na.get(b, 0) - (1 if a == b else 0)
        clq = (None if nb <= 0 or n_tot < 2 else float(
            round_half_away(np.float64(
                (float(c) / float(na[a]))
                / (float(nb) / float(n_tot - 1))))))
        out["lang_a"].append(langs[a])
        out["lang_b"].append(langs[b])
        out["n_ab"].append(c)
        out["clq"].append(clq)
    return ray.data.from_arrow(pa.table({
        "lang_a": pa.array(out["lang_a"], type=pa.string()),
        "lang_b": pa.array(out["lang_b"], type=pa.string()),
        "n_ab": pa.array(out["n_ab"], type=pa.int64()),
        "clq": pa.array(out["clq"], type=pa.float64()),
    }))


def knox_pairs(pages_ds, d_m: float, month_gap: int = 1,
               max_bucket: int = 200_000):
    """Knox space-time interaction over the crawl: among page pairs
    within ``d_m`` meters, the fraction also close in TIME (crawl
    months at most ``month_gap`` apart) — ONE row (n_space_pairs,
    n_spacetime_pairs, ratio).  A ratio far above the unconditional
    close-in-time rate signals space-time clustering (outbreak /
    campaign detection); this is the classic Knox contingency numerator.

    Plan: the month index (months since 1970, < 8192 asserted) is
    ENCODED into the point id (id * 8192 + midx — monotonic, so the
    exactly-once :func:`distance_join_pairs` core carries both
    endpoints' months through the bucket shuffle for free); each pair
    batch reduces to two counter partials and ONE bounded aggregate
    row reaches the driver.  The ratio is the single mirrored float
    division.
    """
    from ray.data.aggregate import Sum

    import ray.data

    from .text import round_half_away

    M = np.int64(8192)

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch["page_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = batch["warc_ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[M]").astype(np.int64)
        assert len(ids) == 0 or (ts.min() >= 0 and ts.max() < 8192
                                 and ids.max() < (1 << 49)), \
            "knox_pairs month encoding assumes 1970-2652 and id < 2^49"
        return pa.table({
            "page_id": pa.array(ids * M + ts),
            "lat": batch["lat"],
            "lng": batch["lng"],
        })

    pairs = distance_join_pairs(
        pages_ds.map_batches(prep, batch_format="pyarrow",
                             batch_size=None),
        d_m, max_bucket=max_bucket)

    def counters(batch: pa.Table) -> pa.Table:
        i = batch["i"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = batch["j"].to_numpy(zero_copy_only=False).astype(np.int64)
        close = np.abs(i % M - j % M) <= month_gap
        return pa.table({
            "ns": pa.array([len(i)], type=pa.int64()),
            "nst": pa.array([int(close.sum())], type=pa.int64()),
        })

    res = (pairs.map_batches(counters, batch_format="pyarrow",
                             batch_size=None)
           .aggregate(Sum("ns"), Sum("nst")))
    ns = int(res["sum(ns)"] or 0)
    nst = int(res["sum(nst)"] or 0)
    ratio = (None if ns == 0 else float(round_half_away(np.float64(
        float(nst) / float(ns)))))
    return ray.data.from_arrow(pa.table({
        "n_space_pairs": pa.array([ns], type=pa.int64()),
        "n_spacetime_pairs": pa.array([nst], type=pa.int64()),
        "ratio": pa.array([ratio], type=pa.float64()),
    }))


def voronoi_monthly(pages_ds, facilities):
    """Voronoi x month rollup: every page assigned to its NEAREST
    facility (argmin, smaller-id tie-break), counted per (city, crawl
    month) — (city_id, month, n_pages).  The exclusive-assignment
    companion of :func:`city_visits_monthly`'s overlapping geofences
    (market-share vs coverage semantics).

    One streaming pass computes the (batch x K) reference-haversine
    matrix vectorized; per-(city, month) integer count partials ride
    the only shuffle, a (K x months)-bounded groupby.
    """
    from ray.data.aggregate import Sum

    from ..kernel import sphere as _sphere

    flat = np.asarray(facilities, dtype=np.float64)
    clat = np.radians(flat[:, 0])
    clng = np.radians(flat[:, 1])
    K = np.int64(len(flat))

    def partial(batch: pa.Table) -> pa.Table:
        lat = np.radians(batch["lat"].to_numpy(zero_copy_only=False))
        lng = np.radians(batch["lng"].to_numpy(zero_copy_only=False))
        if len(lat) == 0:
            return pa.table({"k": pa.array([], type=pa.int64()),
                             "pn": pa.array([], type=pa.int64())})
        d = _sphere.haversine_distance_m(lat[:, None], lng[:, None],
                                         clat[None, :], clng[None, :])
        best = np.argmin(d, axis=1).astype(np.int64)
        ts = batch["warc_ts"].to_numpy(zero_copy_only=False)
        mkey = ts.astype("datetime64[M]").astype(np.int64)
        key = best * np.int64(1 << 32) + (mkey % np.int64(1 << 32))
        u, cnt = np.unique(key, return_counts=True)
        return pa.table({"k": pa.array(u.astype(np.int64)),
                         "pn": pa.array(cnt.astype(np.int64))})

    agg = (pages_ds.map_batches(partial, batch_format="pyarrow",
                                batch_size=None)
           .groupby("k").aggregate(Sum("pn", alias_name="n_pages")))

    def finish(batch: pa.Table) -> pa.Table:
        k = batch["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "city_id": pa.array((k >> 32).astype(np.int64)),
            "month": pa.array((k % np.int64(1 << 32))
                              .astype("datetime64[M]")
                              .astype("datetime64[us]")),
            "n_pages": batch["n_pages"],
        })

    return (agg.map_batches(finish, batch_format="pyarrow",
                            batch_size=None)
            .sort(["city_id", "month"]))


def bearing_circular_monthly(pages_ds, qlat_deg: float, qlng_deg: float):
    """Circular statistics of the initial great-circle bearing from a
    query point to every page, per crawl month — (month, n_pages,
    mean_bearing_deg, resultant_r, circ_var).  The directional-moment
    layer over :func:`bearing_sectors`: the resultant length R measures
    how concentrated the month's pages are around one compass direction
    (circular variance = 1 - R), catching anisotropic crawl drift a
    centroid track can miss.

    Exactness: per-page sin/cos of the bearing are rounded into the
    1e-9 fixed-point integer domain (monthly_centroid's order-free
    vector-sum contract), so the monthly sums are exact int64 and the
    finishing atan2/sqrt chain runs on identical doubles both engines.
    Bound: |sum| <= 1e9 * rows/month, int64-safe to ~9e9 pages/month
    per the shared fixed-point contract (block partials stay far under
    it; the documented monthly_centroid bound).

    Scale shape: per-batch per-month integer partials fused with the
    scan, ONE month-cardinality groupby, tiny finishing map.
    """
    from ray.data.aggregate import Sum

    from ..kernel import sphere as _sphere
    from .text import round_half_away

    qlat = np.radians(np.float64(qlat_deg))
    qlng = np.radians(np.float64(qlng_deg))
    _S = 1_000_000_000.0

    def partial(batch: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if not len(batch):
            return pa.table({"mkey": z, "pn": z, "ps": z, "pc": z})
        ts = batch["warc_ts"].to_numpy(zero_copy_only=False)
        mkey = ts.astype("datetime64[M]").astype(np.int64)
        lat = np.radians(batch["lat"].to_numpy(zero_copy_only=False))
        lng = np.radians(batch["lng"].to_numpy(zero_copy_only=False))
        brg = _sphere.great_circle_bearing(qlat, qlng, lat, lng)
        qs = round_half_away(np.sin(brg) * _S, 0).astype(np.int64)
        qc = round_half_away(np.cos(brg) * _S, 0).astype(np.int64)
        u, inv = np.unique(mkey, return_inverse=True)
        k = len(u)
        ps = np.zeros(k, dtype=np.int64)
        pc_ = np.zeros(k, dtype=np.int64)
        np.add.at(ps, inv, qs)
        np.add.at(pc_, inv, qc)
        return pa.table({
            "mkey": pa.array(u),
            "pn": pa.array(np.bincount(inv, minlength=k)
                           .astype(np.int64)),
            "ps": pa.array(ps), "pc": pa.array(pc_),
        })

    agg = (pages_ds.map_batches(partial, batch_format="pyarrow",
                                batch_size=None)
           .groupby("mkey")
           .aggregate(Sum("ps", alias_name="ss"),
                      Sum("pc", alias_name="sc"),
                      Sum("pn", alias_name="n_pages")))

    def finish(batch: pa.Table) -> pa.Table:
        m = batch["mkey"].to_numpy(zero_copy_only=False)
        ss = batch["ss"].to_numpy(zero_copy_only=False).astype(np.float64)
        sc = batch["sc"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = batch["n_pages"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        mean_deg = np.mod(np.degrees(np.arctan2(ss, sc)) + 360.0, 360.0)
        r = np.sqrt(ss * ss + sc * sc) / (n * _S)
        return pa.table({
            "month": pa.array(m.astype("datetime64[M]")
                              .astype("datetime64[us]")),
            "n_pages": batch["n_pages"],
            "mean_bearing_deg": pa.array(round_half_away(mean_deg, 6)),
            "resultant_r": pa.array(round_half_away(r, 6)),
            "circ_var": pa.array(round_half_away(1.0 - r, 6)),
        })

    return (agg.map_batches(finish, batch_format="pyarrow",
                            batch_size=None)
            .sort("month"))


def distance_decay(pages_ds, qlat_deg: float, qlng_deg: float,
                   ring_m: float = 500_000.0):
    """Distance-decay gradient of page density: semi-log regression of
    ln(ring count) on ring index over concentric ``ring_m``-wide
    great-circle rings around a query point — ONE row (n_rings,
    n_pages, slope, intercept).  The canonical spatial-interaction
    decay exponent (how fast does crawl density fall off with distance
    from the hub?); the radial companion of :func:`bearing_sectors`'
    angular rollup.

    Exactness: ring assignment floors identical haversine doubles on
    both engines (the knn/cap mirror precedent); ring counts are exact
    int64; the four regression moments fold ORDER-PINNED ascending ring
    over occupied rings only (libm ln of exact counts — the tile_zipf
    contract), mirrored by list_reduce in the oracle.  Slope is NULL
    when fewer than two occupied rings (degenerate denominator).

    Scale shape: per-batch ring bincounts (<= ~41 rings at 500 km),
    one ring-bounded groupby, scalar driver fold.
    """
    import math

    import ray.data
    from ray.data.aggregate import Sum

    from ..kernel import sphere as _sphere
    from .text import round_half_away

    qlat = np.radians(np.float64(qlat_deg))
    qlng = np.radians(np.float64(qlng_deg))

    def partial(batch: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if not len(batch):
            return pa.table({"ring": z, "pn": z})
        lat = np.radians(batch["lat"].to_numpy(zero_copy_only=False))
        lng = np.radians(batch["lng"].to_numpy(zero_copy_only=False))
        dm = _sphere.haversine_distance_m(qlat, qlng, lat, lng)
        ring = np.floor(dm / ring_m).astype(np.int64)
        u, cnt = np.unique(ring, return_counts=True)
        return pa.table({"ring": pa.array(u),
                         "pn": pa.array(cnt.astype(np.int64))})

    m = (pages_ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
         .groupby("ring").aggregate(Sum("pn", alias_name="n"))) \
        .to_pandas().sort_values("ring", ignore_index=True)
    v = len(m)
    total = int(m["n"].sum()) if v else 0
    slope = intercept = None
    if v:
        sx = sy = sxx = sxy = 0.0
        for r_, n_ in zip(m["ring"], m["n"]):
            x = float(int(r_))
            y = math.log(float(int(n_)))
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
    return ray.data.from_arrow(pa.table({
        "n_rings": pa.array([v], type=pa.int64()),
        "n_pages": pa.array([total], type=pa.int64()),
        "slope": pa.array([slope], type=pa.float64()),
        "intercept": pa.array([intercept], type=pa.float64()),
    }))
