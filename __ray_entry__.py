"""Driver contract for the s2ray engine (Ray Data target).

The driver initialises Ray BEFORE importing this module; nothing here (or in
the s2ray library) calls ray.init()/ray.shutdown().

- ``entry()``          — flagship tile-assignment pipeline on sf0.001.
- ``queries()``        — one callable per implemented operator (SURVEY.md §2).
- ``oracle_sql()``     — DuckDB-equivalent SQL for the SQL-expressible subset;
  pages are synthesised deterministically from ``documents`` (see
  s2ray/sources/pages.py) so the SQL CTE reproduces every derived value
  bit-exactly.  S2-specific outputs (cell ids/tokens, coverings) have no SQL
  oracle and rely on the pytest golden/property suites instead.
"""

from __future__ import annotations

from s2ray.sources.readers import read_table

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"

# Fixed query-geometry constants shared by queries() and oracle_sql().
RECT = dict(lat_lo=30.0, lat_hi=60.0, lng_lo=-10.0, lng_hi=45.0)
KNN_Q = dict(qlat=55.7558, qlng=37.6173, k=20)  # Moscow center
CAP_RADIUS_M = 150000.0
# rect-distance query rect: western Europe box — city clusters sit on every
# side so both kernel branches (latitude clamp / longitudinal-edge distance)
# are exercised
RECT_DIST = dict(lat_lo=40.0, lat_hi=50.0, lng_lo=0.0, lng_hi=20.0)
RECT_DIST_K = 100

# PIP query polygons: squares over two of the hot city clusters (CCW in
# (lat, lng) degrees) — exercised as geodesic-edge loops in the engine and
# as the exact spherical crossing-parity expression in the SQL oracle.
PIP_POLYS = {
    "moscow_sq": [(55.60, 37.46), (55.60, 37.77), (55.91, 37.77), (55.91, 37.46)],
    "sydney_sq": [(-34.02, 151.05), (-34.02, 151.36), (-33.71, 151.36), (-33.71, 151.05)],
}


def _city_caps():
    from s2ray.kernel.region import Cap
    from s2ray.sources.pages import CITIES_E4

    return {
        f"cap{k}": Cap.from_latlng_radius(la / 1e4, ln / 1e4, CAP_RADIUS_M)
        for k, (la, ln) in enumerate(CITIES_E4)
    }


def entry() -> Any:
    """Flagship pipeline: pages -> extract -> geotag -> S2 cells -> tiles."""
    from s2ray.pipelines.tiles import tile_counts

    return tile_counts(SF_SMOKE, level=8)


def _q_tile_counts(sf_dir: str):
    from s2ray.pipelines.tiles import tile_counts

    return tile_counts(sf_dir, level=8)


PYRAMID_LEVELS = (8, 6, 4, 2)


def _q_tile_pyramid(sf_dir: str):
    from s2ray.pipelines.tiles import tile_pyramid

    return tile_pyramid(sf_dir, levels=PYRAMID_LEVELS)


ADAPTIVE_LEVELS = (4, 6, 8, 10)
ADAPTIVE_MAX_PAGES = 8


def _q_adaptive_tiles(sf_dir: str):
    """Adaptive quadtree tiling: split cells over 8 pages down the
    (4,6,8,10) level chain — one page scan, compact blob partials."""
    from s2ray.pipelines.tiles import adaptive_tiles

    return adaptive_tiles(sf_dir, levels=ADAPTIVE_LEVELS,
                          max_pages=ADAPTIVE_MAX_PAGES)


def _adaptive_tiles_oracle(cte: str) -> str:
    """Per-page mirror of adaptive_tiles: a page's adaptive cell is its
    ancestor at the smallest level whose count <= max_pages, else its
    finest-level cell.  Ancestors by pure cell-id bit algebra on the
    independent SQL encoder's finest-level ids (the tile_pyramid trick);
    tokens by fixed-width printf (levels are even, so the trailing-zero
    strip is a whole nibble count)."""
    from s2ray.functions.sqlgen import s2_cell_select

    fine = max(ADAPTIVE_LEVELS)
    t = ADAPTIVE_MAX_PAGES
    branches = []
    for lv in ADAPTIVE_LEVELS:
        shift = 2 * (30 - lv)
        assert shift % 4 == 0, "token shortcut needs even level"
        nd = (64 - shift) // 4
        if lv == fine:
            pid = "cell_id"
        else:
            lsb = 1 << shift
            pid = (f"(cell_id - (cell_id % CAST('{2 * lsb}' AS UBIGINT)) "
                   f"+ CAST('{lsb}' AS UBIGINT))")
        branches.append(
            f"SELECT page_id, CAST({lv} AS BIGINT) AS level, "
            f"{pid} AS cell_id, "
            f"printf('%0{nd}x', CAST({pid} >> {shift} AS BIGINT)) "
            f"AS cell_token FROM _encf"
        )
    lv_union = " UNION ALL ".join(branches)
    return (
        f"{cte}, _encf AS MATERIALIZED (SELECT page_id, cell_id FROM ("
        + s2_cell_select("SELECT page_id, lat, lng FROM pages_geo",
                         level=fine)
        + f")), _lv AS MATERIALIZED ({lv_union}), "
        "_cnt AS (SELECT level, cell_id, count(*) AS cnt FROM _lv "
        "GROUP BY 1, 2), "
        "_pick AS (SELECT l.page_id, min(l.level) AS clevel FROM _lv l "
        "JOIN _cnt c ON l.level = c.level AND l.cell_id = c.cell_id "
        f"WHERE c.cnt <= {t} GROUP BY 1) "
        "SELECT l.level, l.cell_id, l.cell_token, count(*) AS n_pages "
        "FROM _lv l LEFT JOIN _pick p ON l.page_id = p.page_id "
        f"WHERE l.level = coalesce(p.clevel, {fine}) "
        "GROUP BY 1, 2, 3"
    )


def _q_redact_pii(sf_dir: str):
    """PII / boilerplate scrubbing over page html (emails, URLs, IPv4s,
    long digit runs -> typed placeholders) — streaming Arrow RE2, zero
    shuffle; the oracle rebuilds the html and mirrors the chain."""
    from s2ray.pipelines.text import redact_pii

    return redact_pii(sf_dir)


def _redact_pii_oracle(cte: str) -> str:
    from s2ray.pipelines.text import redact_pii_sql

    html = (
        "SELECT page_id, '<html><head><title>' || url || "
        "'</title><meta name=\"geo.position\" content=\"' || "
        "CAST(lat_e4 AS VARCHAR) || ';' || CAST(lng_e4 AS VARCHAR) || "
        "'\"/></head><body><article>' || text || "
        "'</article></body></html>' AS h FROM pages"
    )
    return f"{cte} {redact_pii_sql(html)}"


INDEX_SHARD_DOCS = 100


def _q_inverted_index(sf_dir: str):
    """Sharded inverted-index build: (token, shard, df, postings) with
    ascending comma-joined doc ids — compact blob partials shuffled by
    (token, shard), never corpus rows; shard size caps every posting."""
    from s2ray.pipelines.text import inverted_index

    return inverted_index(sf_dir, shard_docs=INDEX_SHARD_DOCS)


def _inverted_index_oracle() -> str:
    # shard must be FLOOR division to mirror np.floor_divide on negative
    # ids (DuckDB's // truncates toward zero): subtract the floor-mod
    # first, then the exact truncating divide equals the floor divide
    s = INDEX_SHARD_DOCS
    return (
        "SELECT token, shard, count(*) AS df, "
        "string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) "
        "AS postings FROM ("
        "SELECT DISTINCT doc_id, "
        "(doc_id - ((doc_id % {s}) + {s}) % {s}) // {s} AS shard, "
        "token FROM ("
        "SELECT doc_id, unnest(list_filter(regexp_split_to_array("
        "lower(coalesce(text, '')), '\\s+'), x -> x <> '')) AS token "
        "FROM documents)) GROUP BY 1, 2"
    ).format(s=s)


TOP_LANG_LEVEL = 6


def _q_tile_top_lang(sf_dir: str):
    """Dominant page language per level-6 tile (deterministic argmax:
    max count, then smallest language)."""
    from s2ray.pipelines.tiles import tile_top_lang

    return tile_top_lang(sf_dir, level=TOP_LANG_LEVEL)


def _tile_top_lang_oracle(cte: str) -> str:
    from s2ray.functions.sqlgen import s2_cell_select

    return (
        f"{cte} SELECT cell_id, cell_token, lang AS top_lang, "
        "n AS n_pages FROM ("
        "SELECT cell_id, cell_token, lang, n, row_number() OVER ("
        "PARTITION BY cell_id ORDER BY n DESC, lang) AS rn FROM ("
        "SELECT cell_id, cell_token, lang, count(*) AS n FROM ("
        + s2_cell_select("SELECT lang, lat, lng FROM pages_geo",
                         level=TOP_LANG_LEVEL)
        + ") GROUP BY 1, 2, 3)) WHERE rn = 1"
    )


CENTROID_LEVEL = 6


def _q_tile_centroids(sf_dir: str):
    """Discrete spherical centroid per level-6 tile (trueCentroid
    analogue): order-free 1e-9 fixed-point vector sums, antimeridian- and
    pole-safe unlike a lat/lng mean."""
    from s2ray.pipelines.tiles import tile_centroids

    return tile_centroids(sf_dir, level=CENTROID_LEVEL)


def _tile_centroids_oracle(cte: str) -> str:
    from s2ray.functions.sqlgen import s2_cell_select

    inner = s2_cell_select("SELECT lat, lng FROM pages_geo",
                           level=CENTROID_LEVEL, id_col=None)
    # the engine quantizes each unit vector to 1e-9 fixed point with
    # half-away rounding (= SQL round()), making the per-tile sums exact
    # order-free integers; s2_cell_select already exposes the _x/_y/_z
    # unit-vector working columns computed by the identical formula
    return (
        f"{cte}, q AS (SELECT cell_token, "
        "CAST(round(_x * 1000000000.0) AS BIGINT) AS qx, "
        "CAST(round(_y * 1000000000.0) AS BIGINT) AS qy, "
        "CAST(round(_z * 1000000000.0) AS BIGINT) AS qz "
        f"FROM ({inner})), "
        "agg AS (SELECT cell_token, CAST(sum(qx) AS BIGINT) AS sx, "
        "CAST(sum(qy) AS BIGINT) AS sy, CAST(sum(qz) AS BIGINT) AS sz, "
        "CAST(count(*) AS BIGINT) AS n_pages FROM q GROUP BY 1) "
        "SELECT cell_token, n_pages, "
        "round(degrees(atan2(CAST(sz AS DOUBLE), "
        "sqrt(CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) "
        "+ CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))), 6) AS c_lat, "
        "round(degrees(atan2(CAST(sy AS DOUBLE), CAST(sx AS DOUBLE))), 6) "
        "AS c_lng FROM agg"
    )


WINSOR_LO, WINSOR_HI = 0.05, 0.95


def _q_events_winsorized(sf_dir: str):
    """Outlier-robust per-type rollup: values clamped to exact [p05, p95]
    (quantile_disc), aggregated in the exact integer-cent domain."""
    from s2ray.pipelines.analytics import events_winsorized

    return events_winsorized(sf_dir, lo=WINSOR_LO, hi=WINSOR_HI)


def _events_winsorized_oracle() -> str:
    return f"""WITH q AS (
  SELECT event_type, quantile_disc(value, {WINSOR_LO!r}) AS lo,
         quantile_disc(value, {WINSOR_HI!r}) AS hi
  FROM events WHERE value IS NOT NULL GROUP BY 1)
SELECT e.event_type, count(*) AS n_events,
       CAST(sum(CASE WHEN e.value < q.lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_lo,
       CAST(sum(CASE WHEN e.value > q.hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hi,
       CAST(sum(CAST(round(least(greatest(e.value, q.lo), q.hi) * 100, 0)
         AS BIGINT)) AS BIGINT) AS sum_clamped_cents
FROM events e JOIN q USING (event_type)
WHERE e.value IS NOT NULL GROUP BY 1"""


def _q_media_pixel_dedup(sf_dir: str):
    """Pixel-level image dedup: byte-distinct re-encoded PNG copies
    collapse by decoded-pixel hash (rows-only: the codec has no SQL
    mirror; the group structure + byte-hash contrast are pytest-pinned)."""
    from s2ray.stages.multimodal import media_pixel_dedup

    return media_pixel_dedup(sf_dir)


def _q_rect_filter(sf_dir: str):
    from s2ray.pipelines.filters import rect_filter_batch
    from s2ray.pipelines.tiles import pages_with_cells

    ds = pages_with_cells(sf_dir, token_level=None)
    ds = ds.map_batches(
        rect_filter_batch, fn_kwargs=dict(RECT), batch_format="pyarrow"
    )
    return ds.select_columns(["page_id", "url", "lat", "lng"])


def _q_knn(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc

    from s2ray.pipelines.knn import knn_pages
    from s2ray.pipelines.tiles import pages_with_cells

    ds = pages_with_cells(sf_dir, token_level=None)
    out = knn_pages(ds, KNN_Q["qlat"], KNN_Q["qlng"], k=KNN_Q["k"])

    def round_dist(batch: pa.Table) -> pa.Table:
        d = pc.round(batch["dist_m"], ndigits=3)
        return batch.drop_columns(["dist_m"]).append_column("dist_m", d)

    return out.map_batches(round_dist, batch_format="pyarrow")


def _q_rect_distance_rank(sf_dir: str):
    """Top-K pages nearest to (but outside) a fixed LatLngRect, ranked by
    the reference point->rect getDistance kernel (S2LatLngRect.php:222-243);
    the SQL oracle mirrors the kernel branch-for-branch."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from s2ray.pipelines.filters import rect_distance_batch
    from s2ray.pipelines.knn import _local_topk
    from s2ray.pipelines.tiles import pages_with_cells

    k = RECT_DIST_K

    def stage(batch: pa.Table) -> pa.Table:
        batch = rect_distance_batch(batch, **RECT_DIST)
        batch = batch.filter(pc.greater(batch["dist_m"], 0.0))
        return _local_topk(batch.select(["page_id", "dist_m"]), k)

    ds = pages_with_cells(sf_dir, token_level=None)
    out = (ds.map_batches(stage, batch_format="pyarrow", batch_size=None)
           .sort(["dist_m", "page_id"]).limit(k).repartition(1))

    def add_rank(batch: pa.Table) -> pa.Table:
        return pa.table({
            "page_id": batch["page_id"],
            "rank": pa.array(np.arange(1, len(batch) + 1, dtype=np.int64)),
            "dist_m": pc.round(batch["dist_m"], ndigits=3),
        })

    return out.map_batches(add_rank, batch_format="pyarrow",
                           batch_size=None)


def _q_text_identity(sf_dir: str):
    """Byte-identical extracted text per url (input_hint invariant)."""
    from s2ray.pipelines.tiles import pages_with_cells

    ds = pages_with_cells(sf_dir, token_level=None)
    return ds.select_columns(["page_id", "text"])


def _q_pages_per_lang(sf_dir: str):
    import numpy as np
    import pyarrow as pa

    from s2ray.pipelines.tiles import pages_with_cells

    ds = pages_with_cells(sf_dir, token_level=None)

    def partial(batch: pa.Table) -> pa.Table:
        langs = np.asarray(batch["lang"].to_pandas(), dtype=object)
        u, c = np.unique(langs, return_counts=True)
        return pa.table({"lang": pa.array(u.tolist(), type=pa.string()),
                         "partial_n": pa.array(c.astype(np.int64))})

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("partial_n", alias_name="n_pages"))
    )


def _q_cap_join(sf_dir: str):
    from s2ray.pipelines.spatial_join import spatial_join_broadcast
    from s2ray.pipelines.tiles import pages_with_cells

    ds = pages_with_cells(sf_dir, token_level=None)
    return spatial_join_broadcast(ds, _city_caps(),
                                  keep_cols=("page_id",))


def _q_cap_join_shuffle(sf_dir: str):
    """Same join as cap_join but through the cell-keyed SHUFFLE plan
    (co-partition + auto hot-key salting + semi-join pushdown) — puts the
    skew-handling path itself under the driver's bit-exact oracle gate
    (oracle SQL identical to cap_join)."""
    from s2ray.pipelines.spatial_join import spatial_join_shuffle
    from s2ray.pipelines.tiles import pages_with_cells

    ds = pages_with_cells(sf_dir, token_level=None)
    return spatial_join_shuffle(ds, _city_caps(), auto_salt=True,
                                keep_cols=("page_id",))


def _q_zonal_stats(sf_dir: str):
    """Zonal statistics: per-cap-region point aggregates (count, exact
    integer-e4 centroid, min/max distance to the cap axis)."""
    from s2ray.pipelines.analytics import zonal_stats
    from s2ray.pipelines.tiles import pages_with_cells

    ds = pages_with_cells(sf_dir, token_level=None)
    return zonal_stats(ds, _city_caps())


GRID_MIN_PAGES = 1


def _q_quantize_embeddings(sf_dir: str):
    """SQ8 scalar quantization of the embedding column: per-dim global
    min/max (two-pass, dim-sized broadcast state) -> integer codes;
    hash-exact int reductions per vector."""
    from s2ray.pipelines.ann import quantize_embeddings

    return quantize_embeddings(sf_dir)


def _quantize_embeddings_oracle() -> str:
    n = 256
    return f"""WITH ex AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         unnest(range(1, len(embedding) + 1)) AS dim
  FROM embeddings
),
st AS (
  SELECT dim, min(v) AS dmin, max(v) AS dmax FROM ex GROUP BY dim
),
codes AS (
  SELECT e.vec_id,
         CASE WHEN s.dmax = s.dmin THEN 0
              ELSE least(greatest(CAST(floor(
                (e.v - s.dmin) / (s.dmax - s.dmin) * {n}) AS BIGINT),
                0), {n - 1}) END AS code
  FROM ex e JOIN st s ON e.dim = s.dim
)
SELECT vec_id, CAST(sum(code) AS BIGINT) AS sum_codes,
       min(code) AS min_code, max(code) AS max_code
FROM codes GROUP BY vec_id"""


def _q_grid_clusters(sf_dir: str):
    """Grid-based spatial clustering: occupied 1-degree cells -> 8-neighbor
    connected components (antimeridian-aware), per-cluster cell/page
    counts.  Corpus reduces to grid-sized partial counts; adjacency + CC
    run over the compact occupied-cell table."""
    from s2ray.pipelines.cluster import grid_clusters
    from s2ray.pipelines.tiles import pages_with_cells

    ds = pages_with_cells(sf_dir, token_level=None)
    return grid_clusters(ds, cell_deg=1.0, min_pages=GRID_MIN_PAGES)


def _domain_pagerank_oracle(cte: str) -> str:
    """PageRank as a recursive CTE over the domain link graph.  Zero-weight
    self-edges keep every node alive through each iteration's join (+0.0
    in a nonnegative IEEE sum is an exact identity, so the engine omits
    them); the per-target contribution fold is ORDER-PINNED to ascending
    src via list_reduce over list(... ORDER BY s), and the iteration
    r' = (1.0 - 0.85)/nf + 0.85 * fold uses the engine's exact op order."""
    rec_cte = cte.replace("WITH ", "WITH RECURSIVE ", 1)
    return f"""{rec_cte},
e AS (SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS s,
             'src' || CAST(((page_id * 2654435761 + j.j * 97) % 4294967296)
                           % 20 AS VARCHAR) || '.example.com' AS d
      FROM pages_geo CROSS JOIN (VALUES (0),(1),(2)) AS j(j)
      WHERE j.j < 1 + page_id % 3),
w AS (SELECT s, d, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1, 2),
nodes AS (SELECT DISTINCT s FROM w),
ow AS (SELECT s, sum(n) AS ow FROM w GROUP BY s),
p AS (SELECT w.s, w.d, CAST(w.n AS DOUBLE) / CAST(ow.ow AS DOUBLE) AS t
      FROM w JOIN ow ON w.s = ow.s
      WHERE w.d IN (SELECT s FROM nodes)
      UNION ALL
      SELECT s, s, 0.0 FROM nodes),
nf AS (SELECT CAST(count(*) AS DOUBLE) AS nf FROM nodes),
pr(d, r, k) AS (
  SELECT s, 1.0 / (SELECT nf FROM nf), 0 FROM nodes
  UNION ALL
  SELECT p.d,
         (1.0 - 0.85) / (SELECT nf FROM nf)
         + 0.85 * list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                    list(p.t * pr.r ORDER BY p.s)), (a, b) -> a + b),
         pr.k + 1
  FROM pr JOIN p ON p.s = pr.d
  WHERE pr.k < 20
  GROUP BY p.d, pr.k)
SELECT pr.d AS domain, CAST(ow.ow AS BIGINT) AS out_links,
       round(pr.r, 9) AS pagerank
FROM pr JOIN ow ON ow.s = pr.d WHERE pr.k = 20"""


def _grid_clusters_oracle(cte: str) -> str:
    """Recursive-CTE mirror: occupied cells -> adjacency self-join (incl.
    the gx wrap at the antimeridian) -> transitive closure -> min label."""
    rec_cte = cte.replace("WITH ", "WITH RECURSIVE ", 1)
    return f"""{rec_cte},
occ AS (SELECT CAST(floor(lat) AS BIGINT) AS gy,
               CAST(floor(lng) AS BIGINT) AS gx, count(*) AS n
        FROM pages_geo GROUP BY 1, 2 HAVING count(*) >= {GRID_MIN_PAGES}),
nodes AS (SELECT (gy + 90) * 360 + (gx + 180) AS p, n FROM occ),
edges AS (
  SELECT (a.gy + 90) * 360 + (a.gx + 180) AS u,
         (b.gy + 90) * 360 + (b.gx + 180) AS v
  FROM occ a JOIN occ b
  ON abs(a.gy - b.gy) <= 1
     AND (abs(a.gx - b.gx) <= 1 OR abs(a.gx - b.gx) = 359)
     AND NOT (a.gy = b.gy AND a.gx = b.gx)
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
lbl AS (
  SELECT nd.p AS p, nd.n AS n,
         least(nd.p, coalesce(min(r.v), nd.p)) AS cluster_id
  FROM nodes nd LEFT JOIN reach r ON r.u = nd.p
  GROUP BY nd.p, nd.n
)
SELECT cluster_id, count(*) AS n_cells,
       CAST(sum(n) AS BIGINT) AS n_pages
FROM lbl GROUP BY 1"""


def _q_pip_join(sf_dir: str):
    from s2ray.kernel.pip import Polygon
    from s2ray.pipelines.spatial_join import spatial_join_broadcast
    from s2ray.pipelines.tiles import pages_with_cells

    regions = {name: Polygon.from_latlng_loops([loop])
               for name, loop in PIP_POLYS.items()}
    ds = pages_with_cells(sf_dir, token_level=None)
    return spatial_join_broadcast(ds, regions, keep_cols=("page_id",))


def _q_polygon_covering(sf_dir: str):
    """Raster<->vector tile assignment: covering tiles of the PIP polygons
    (S2-specific; rows-only driver check, deterministic output)."""
    import pandas as pd

    from s2ray.kernel import cellid
    from s2ray.kernel.coverer import covering_of
    from s2ray.kernel.pip import Polygon

    rows = []
    for name, loop in PIP_POLYS.items():
        poly = Polygon.from_latlng_loops([loop])
        cov = covering_of(poly, max_cells=16)
        toks = cellid.to_token(cov)
        lv = cellid.level(cov)
        for t, l in zip(toks, lv):
            rows.append((name, t, int(l)))
    return pd.DataFrame(rows, columns=["region_id", "cell_token", "level"])


NEAR_DUP_TAU = 0.5
COSINE_TAU = (3, 5)   # rational threshold: cosine >= 3/5, evaluated exactly
EMB_TAU = 0.45
ANN_QUERY_IDS = [0, 1, 2, 3, 4]
ANN_BULK_QUERY_IDS = list(range(40))   # bulk path: many queries per scan
ANN_K = 10


def _pages_text_ds(sf_dir: str):
    from s2ray.functions.extract import drop_html, extract_text
    from s2ray.sources.pages import read_pages

    ds = read_pages(sf_dir)
    return ds.map_batches(extract_text, batch_format="pyarrow").map_batches(
        drop_html, batch_format="pyarrow")


def _q_exact_dedup(sf_dir: str):
    from s2ray.pipelines.dedup import exact_dedup

    return exact_dedup(_pages_text_ds(sf_dir))


def _q_near_dup_pairs(sf_dir: str):
    import ray.data

    from s2ray.pipelines.dedup import near_dup_pairs_exact

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return near_dup_pairs_exact(ds, tau=NEAR_DUP_TAU)


def _q_cosine_sim(sf_dir: str):
    from s2ray.pipelines.dedup import cosine_sim_pairs

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return cosine_sim_pairs(ds, tau_num=COSINE_TAU[0], tau_den=COSINE_TAU[1])


def _q_minhash_pairs(sf_dir: str):
    import ray.data

    from s2ray.pipelines.dedup import minhash_lsh_pairs

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return minhash_lsh_pairs(ds, tau=NEAR_DUP_TAU)


def _q_simhash_pairs(sf_dir: str):
    import ray.data

    from s2ray.pipelines.dedup import simhash_pairs

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_pairs(ds, max_hamming=3)


def _q_zipf_abbreviation(sf_dir: str):
    """Zipf's law of abbreviation: token length vs ln(frequency)
    regression over the vocabulary (order-pinned moment folds)."""
    from s2ray.pipelines.text import zipf_abbreviation

    return zipf_abbreviation(sf_dir)


def _q_revenue_seasonality(sf_dir: str):
    """Month-of-year ratio-to-mean seasonal index of order revenue
    (exact cents, 12-cell partials)."""
    from s2ray.pipelines.join import revenue_seasonality

    return revenue_seasonality(sf_dir)


def _q_time_to_convert(sf_dir: str):
    """First-view to first-purchase latency quantiles (minute-bucketed
    histogram, quantile_disc rule, one user co-partition)."""
    from s2ray.pipelines.analytics import time_to_convert

    return time_to_convert(sf_dir)


def _q_token_entropy_rate(sf_dir: str):
    """Bigram conditional entropy (and perplexity) of the corpus token
    stream — order-pinned ln fold over the bigram count shuffle."""
    from s2ray.pipelines.text import token_entropy_rate

    return token_entropy_rate(sf_dir)


def _q_rich_club(sf_dir: str):
    """Rich-club density profile phi(k) of the undirected simple
    domain graph (exact per-threshold subgraph counts)."""
    from s2ray.pipelines.webgraph import rich_club

    return rich_club(sf_dir)


def _q_token_dispersion(sf_dir: str):
    """Fano burstiness of the top-20 tokens' per-document counts
    (exact big-int moments, one mirrored division)."""
    from s2ray.pipelines.text import token_dispersion

    return token_dispersion(sf_dir)


def _q_dup_threshold_curve(sf_dir: str):
    """Connected-component census of the near-dup graph at each
    calibration tau — one pair join, pair-bounded driver sweep."""
    from s2ray.pipelines.dedup import dup_threshold_curve

    return dup_threshold_curve(sf_dir)


def _q_containment_pairs(sf_dir: str):
    """Shingle-containment (overlap-coefficient) pairs >= 9/10 on the
    smaller document — quote/subset detection on the shared
    inverted-index core, exact integer threshold."""
    import ray.data

    from s2ray.pipelines.dedup import containment_pairs

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return containment_pairs(ds)


def _q_near_dup_clusters(sf_dir: str):
    import ray.data

    from s2ray.pipelines.dedup import near_dup_clusters

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return near_dup_clusters(ds, tau=NEAR_DUP_TAU)


def _q_rank_corr_qty_discount(sf_dir: str):
    """Spearman rho + Kendall tau-b between line-item quantity and
    discount from the exact bounded contingency table (big-int
    midrank/concordance moments, mirrored float chains)."""
    from s2ray.pipelines.join import rank_corr_qty_discount

    return rank_corr_qty_discount(sf_dir)


def _q_dup_cluster_purity(sf_dir: str):
    """Language purity by near-dup cluster size — the recursive-closure
    cluster core joined to lang via the broadcast member filter."""
    from s2ray.pipelines.dedup import dup_cluster_purity

    return dup_cluster_purity(sf_dir, tau=NEAR_DUP_TAU)


def _q_events_asof(sf_dir: str):
    from s2ray.pipelines.analytics import events_asof

    return events_asof(sf_dir)


def _q_event_gaps(sf_dir: str):
    from s2ray.pipelines.analytics import event_gaps

    return event_gaps(sf_dir)


def _q_standardize_docs(sf_dir: str):
    """Per-lang z-score standardization of n_chars — exact int64
    moments, identical float expression on both engines."""
    from s2ray.pipelines.text import standardize_by_group

    return standardize_by_group(sf_dir)


def _q_events_mad(sf_dir: str):
    """Median + MAD robust stats per event type — two exact-quantile
    passes composed through group_quantiles' make_ds hook."""
    from s2ray.pipelines.analytics import robust_mad_stats

    return robust_mad_stats(sf_dir)


VOCAB_P = (1, 2)          # nucleus cut p = 1/2 as an exact rational


def _q_vocab_coverage(sf_dir: str):
    """Top-p (nucleus) vocabulary cut via a descending two-level cumsum."""
    from s2ray.pipelines.text import vocab_coverage

    return vocab_coverage(sf_dir, p_num=VOCAB_P[0], p_den=VOCAB_P[1])


KNN_GRAPH_K = 3


def _q_knn_graph(sf_dir: str):
    """k-NN graph within 25 km: per-page top-3 by (mm distance, nn_id)."""
    from s2ray.pipelines.spatial_join import knn_graph
    from s2ray.pipelines.tiles import pages_with_cells

    return knn_graph(pages_with_cells(sf_dir, token_level=None),
                     DIST_JOIN_M, k=KNN_GRAPH_K)


def _q_knn_hubness(sf_dir: str):
    """Hubness (kNN in-degree) histogram of the 25 km top-3 neighbor
    graph — two bounded count groupbys over the knn_graph edge set."""
    from s2ray.pipelines.spatial_join import knn_hubness
    from s2ray.pipelines.tiles import pages_with_cells

    return knn_hubness(pages_with_cells(sf_dir, token_level=None),
                       DIST_JOIN_M, k=KNN_GRAPH_K)


def _q_grid_smooth(sf_dir: str):
    """Moore-neighborhood raster convolution over the occupied 1-degree
    grid (antimeridian-aware), on the aggregated cell table."""
    from s2ray.pipelines.cluster import grid_smooth
    from s2ray.pipelines.tiles import pages_with_cells

    return grid_smooth(pages_with_cells(sf_dir, token_level=None),
                       cell_deg=1.0)


def _q_grid_kde(sf_dir: str):
    """Truncated-Gaussian heatmap splatting at 1-degree cell centers:
    order-free 1e-9 fixed-point contribution sums, haversine/exp op
    order mirrored exactly in the SQL CTE chain."""
    from s2ray.pipelines.cluster import grid_kde
    from s2ray.pipelines.tiles import pages_with_cells

    return grid_kde(pages_with_cells(sf_dir, token_level=None),
                    cell_deg=1.0, bandwidth_m=100_000.0)


def _q_morans_i(sf_dir: str):
    """Global Moran's I of page counts over the occupied 1-degree grid
    with Moore (queen) weights — exact integer moments from the
    grid_smooth stencil, big-int combine in one grid-bounded task."""
    from s2ray.pipelines.cluster import morans_i
    from s2ray.pipelines.tiles import pages_with_cells

    return morans_i(pages_with_cells(sf_dir, token_level=None),
                    cell_deg=1.0)


def _q_morans_i_chars(sf_dir: str):
    """Attribute-valued global Moran's I: spatial autocorrelation of
    per-cell TOTAL text codepoints (the extensive document-length
    surface) over the same Moore-stencil grid — shows the grid-stats
    core is measure-agnostic."""
    from s2ray.pipelines.cluster import morans_i
    from s2ray.pipelines.tiles import pages_with_cells

    return morans_i(pages_with_cells(sf_dir, token_level=None),
                    cell_deg=1.0, value="chars")


def _q_geary_c(sf_dir: str):
    """Global Geary's C of page counts over the occupied 1-degree grid
    with Moore (queen) weights — the pairwise-difference sum reduces to
    the same grid_smooth per-cell facts as Moran's I (GSUM = 2*(DXX-WXX)
    by stencil symmetry), big-int combine in one grid-bounded task."""
    from s2ray.pipelines.cluster import geary_c
    from s2ray.pipelines.tiles import pages_with_cells

    return geary_c(pages_with_cells(sf_dir, token_level=None),
                   cell_deg=1.0)


def _q_getis_ord(sf_dir: str):
    """Getis-Ord Gi* hotspot z-score per occupied 1-degree cell (Moore
    weights incl. self) — exact big-int moments, one grid-bounded task."""
    from s2ray.pipelines.cluster import getis_ord
    from s2ray.pipelines.tiles import pages_with_cells

    return getis_ord(pages_with_cells(sf_dir, token_level=None),
                     cell_deg=1.0)


def _q_local_moran(sf_dir: str):
    """Local Moran's I (LISA) per occupied 1-degree cell with the HH/LL/
    HL/LH Moran-scatterplot quadrant — exact integer deviations and lag
    from the grid_smooth stencil, one grid-bounded combine task."""
    from s2ray.pipelines.cluster import local_moran
    from s2ray.pipelines.tiles import pages_with_cells

    return local_moran(pages_with_cells(sf_dir, token_level=None),
                       cell_deg=1.0)


def _q_join_counts(sf_dir: str):
    """Binary join-count statistic over the occupied 1-degree grid:
    hot = N*x > T integer cross-multiply, undirected Moore link tallies
    (BB/WW/BW) from one grid-bounded 8-offset searchsorted scan."""
    from s2ray.pipelines.cluster import join_counts
    from s2ray.pipelines.tiles import pages_with_cells

    return join_counts(pages_with_cells(sf_dir, token_level=None),
                       cell_deg=1.0)


def _q_order_overlap(sf_dir: str):
    """Per-customer interval-overlap pair count: orderkey co-partition
    span build + custkey co-partition offset-encoded sort-sweep (no
    quadratic pair join); quadratic self-join oracle."""
    from s2ray.pipelines.join import order_overlap

    return order_overlap(sf_dir)


def _q_product_profit(sf_dir: str):
    """TPC-H Q9 shape: part-name-filtered revenue per (supplier nation,
    ship year); two broadcast dimension sides, one packed-key groupby."""
    from s2ray.pipelines.join import product_profit

    return product_profit(sf_dir)


def _q_part_concentration(sf_dir: str):
    """TPC-H Q11 shape: parts holding > 1/10000 of total revenue —
    global-scalar HAVING as an exact integer cross-multiply."""
    from s2ray.pipelines.join import part_concentration

    return part_concentration(sf_dir)


def _q_lexical_simpson(sf_dir: str):
    """Per-language Simpson repeat index over token counts (vocab-sized
    shuffle, hi/lo-split big-int moments, one mirrored division)."""
    from s2ray.pipelines.text import lexical_simpson

    return lexical_simpson(sf_dir)


def _q_anagram_groups(sf_dir: str):
    """Anagram classes of the vocabulary: sorted-codepoint signature
    regroup of the token-count aggregate, classes with >= 2 members."""
    from s2ray.pipelines.text import anagram_groups

    return anagram_groups(sf_dir)


def _q_covered_days(sf_dir: str):
    """Per-customer interval-union coverage (gaps-and-islands): custkey
    blob co-partition, offset-encoded running max, reduceat islands."""
    from s2ray.pipelines.join import covered_days

    return covered_days(sf_dir)


def _q_order_cadence(sf_dir: str):
    """Per-customer reorder cadence (distributed LAG): consecutive-day
    gaps, max dormancy + telescoped average, customers with >= 2
    orders."""
    from s2ray.pipelines.join import order_cadence

    return order_cadence(sf_dir)


def _q_excess_shippers(sf_dir: str):
    """TPC-H Q20 shape: excess-share shippers over name-filtered parts
    (broadcast part keys, partkey blob co-partition, integer
    cross-multiplied share test)."""
    from s2ray.pipelines.join import excess_shippers

    return excess_shippers(sf_dir)


def _q_late_shipments(sf_dir: str):
    """TPC-H Q12 shape: shipping-delay buckets x high/low priority CASE
    counts over one orderkey co-partition join."""
    from s2ray.pipelines.join import late_shipments

    return late_shipments(sf_dir)


def _q_lang_ellipse(sf_dir: str):
    """Standard deviational ellipse per language: exact e4 fixed-point
    integer moments on hi/lo lanes through one lang-cardinality groupby,
    driver eigen/rotation chain mirrored op-for-op in the oracle."""
    from s2ray.pipelines.tiles import lang_ellipse

    return lang_ellipse(sf_dir)


def _q_tile_mann_kendall(sf_dir: str):
    """Mann-Kendall monthly-trend S per occupied 1-degree cell (the
    emerging-hot-spot statistic) — all-integer outputs, one packed
    (cell, month) groupby, 66 vectorized sign comparisons per cell."""
    from s2ray.pipelines.cluster import tile_mann_kendall
    from s2ray.pipelines.tiles import pages_with_cells

    return tile_mann_kendall(pages_with_cells(sf_dir, token_level=None),
                             cell_deg=1.0)


def _q_chi2_lang_source(sf_dir: str):
    """Chi-square independence of lang x source: big-int cell moments,
    order-pinned term fold over the full cross product."""
    from s2ray.pipelines.analytics import chi2_lang_source

    return chi2_lang_source(sf_dir)


def _q_returned_items(sf_dir: str):
    """TPC-H Q10 shape: top-20 customers by integer-exact revenue from
    returned lineitems of Q1-1996 orders; customer/nation attributes
    attached to exactly k rows via a key-filtered read."""
    from s2ray.pipelines.join import returned_items

    return returned_items(sf_dir)


def _q_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape: one-month PROMO-part revenue share with
    hi/lo-split wrap-safe global sums."""
    from s2ray.pipelines.join import promo_revenue

    return promo_revenue(sf_dir)


def _q_top_supplier(sf_dir: str):
    """TPC-H Q15 shape: max-revenue supplier(s) over a quarter, ties
    kept, supplier attributes via key-filtered read."""
    from s2ray.pipelines.join import top_supplier

    return top_supplier(sf_dir)


def _q_large_orders(sf_dir: str):
    """TPC-H Q18 shape: top-100 large-quantity orders with customer
    names attached to exactly k rows."""
    from s2ray.pipelines.join import large_orders

    return large_orders(sf_dir)


def _q_order_priority_count(sf_dir: str):
    """TPC-H Q4 shape: quarter's order count per priority where a
    returned lineitem EXISTS; keys-only semi co-partition join."""
    from s2ray.pipelines.join import order_priority_count

    return order_priority_count(sf_dir)


def _q_cust_order_dist(sf_dir: str):
    """TPC-H Q13 shape: customer histogram by non-urgent order count
    including zero-order customers via keys-only LEFT co-partition."""
    from s2ray.pipelines.join import cust_order_dist

    return cust_order_dist(sf_dir)


def _q_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape: one brand's below-avg-quantity lineitem revenue;
    two-pass stream with broadcast per-part thresholds."""
    from s2ray.pipelines.join import small_qty_revenue

    return small_qty_revenue(sf_dir)


def _q_nation_volume(sf_dir: str):
    """TPC-H Q7 shape: two-nation shipped revenue per (supp, cust, year)
    with pre-filtered dimension sides and one orderkey co-partition."""
    from s2ray.pipelines.join import nation_volume

    return nation_volume(sf_dir)


def _q_supplier_parts_cnt(sf_dir: str):
    """TPC-H Q16 shape: distinct suppliers per part attr triple with a
    broadcast blacklist and lexsort pair pre-dedup."""
    from s2ray.pipelines.join import supplier_parts_cnt

    return supplier_parts_cnt(sf_dir)


def _q_idle_customers(sf_dir: str):
    """TPC-H Q22 shape: above-average-balance customers with no orders
    via integer cross-multiplied mean and keys-only anti join."""
    from s2ray.pipelines.join import idle_customers

    return idle_customers(sf_dir)


def _q_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape: discount-band pruned scan, zero joins, hi/lo
    wrap-safe fold."""
    from s2ray.pipelines.join import forecast_revenue

    return forecast_revenue(sf_dir)


def _q_bracket_revenue(sf_dir: str):
    """TPC-H Q19 shape: OR-of-conjunctions bracket revenue with a
    partkey->bracket broadcast map."""
    from s2ray.pipelines.join import bracket_revenue

    return bracket_revenue(sf_dir)


def _q_market_share(sf_dir: str):
    """TPC-H Q8 shape: one nation's yearly share of a region's revenue;
    two semi-join-filtered passes, years x 2 groupby."""
    from s2ray.pipelines.join import market_share

    return market_share(sf_dir)


def _q_sole_fault_supplier(sf_dir: str):
    """TPC-H Q21 shape: multi-supplier orders where exactly one supplier
    had a return; per-order bucket evaluation."""
    from s2ray.pipelines.join import sole_fault_supplier

    return sole_fault_supplier(sf_dir)


PAIR_DIST_BAND_M = 5000.0


def _q_pair_dist_hist(sf_dir: str):
    """Radial pair-distance histogram over the exactly-once bucketed
    distance-join core."""
    from s2ray.pipelines.spatial_join import pair_dist_hist
    from s2ray.pipelines.tiles import pages_with_cells

    return pair_dist_hist(pages_with_cells(sf_dir, token_level=None),
                          DIST_JOIN_M, band_m=PAIR_DIST_BAND_M)


def _q_dominant_dim_hist(sf_dir: str):
    """Argmax-dimension histogram of the embedding space (collapse
    diagnostic)."""
    from s2ray.pipelines.ann import dominant_dim_hist

    return dominant_dim_hist(sf_dir)


def _q_nn_g_function(sf_dir: str):
    """Nearest-neighbor distance CDF (G-function) at the Ripley radii —
    the companion point-pattern statistic to K."""
    from s2ray.pipelines.spatial_join import nn_g_function
    from s2ray.pipelines.tiles import pages_with_cells

    return nn_g_function(pages_with_cells(sf_dir, token_level=None),
                         radii=RIPLEY_RADII)


def _q_lang_geo_bbox(sf_dir: str):
    """Per-language bbox + spherical centroid profile (fixed-point
    order-free vector sums)."""
    from s2ray.pipelines.tiles import lang_geo_bbox

    return lang_geo_bbox(sf_dir)


def _q_emb_dim_stats(sf_dir: str):
    """Per-dimension embedding moments in the exact 2^40-scaled integer
    domain (feature-whitening stats)."""
    from s2ray.pipelines.ann import emb_dim_stats

    return emb_dim_stats(sf_dir)


def _q_latest_event_state(sf_dir: str):
    """CDC keep-last compaction per (user, type): associative per-batch
    winners, one user-hash co-partition."""
    from s2ray.pipelines.analytics import latest_event_state

    return latest_event_state(sf_dir)


def _q_user_event_paths(sf_dir: str):
    """Ordered collect (string_agg): per-user event-type sequence in
    (ts, event_id) order."""
    from s2ray.pipelines.analytics import user_event_paths

    return user_event_paths(sf_dir)


def _q_value_histogram(sf_dir: str):
    """Equal-width numeric binning: one floor-divide bin id, bincount
    partials, (n_bins+1)-cardinality groupby."""
    from s2ray.pipelines.analytics import value_histogram

    return value_histogram(sf_dir)


def _q_user_skyline(sf_dir: str):
    """Skyline (Pareto frontier) operator: local-frontier-then-merge
    over exact integer per-user aggregates."""
    from s2ray.pipelines.analytics import user_skyline

    return user_skyline(sf_dir)


def _q_source_overlap(sf_dir: str):
    """Distinct-text INTERSECT/EXCEPT between two sources on the
    exact_dedup digest shuffle."""
    from s2ray.pipelines.relational import source_overlap

    return source_overlap(sf_dir)


def _q_pivot_lang_counts(sf_dir: str):
    """Long->wide pivot: per-source doc counts per language column."""
    from s2ray.pipelines.relational import pivot_lang_counts

    return pivot_lang_counts(sf_dir)


def _q_user_type_matrix(sf_dir: str):
    """Per-user event-type count matrix (feature-engineering pivot)."""
    from s2ray.pipelines.relational import user_type_matrix

    return user_type_matrix(sf_dir)


def _q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape: top-10 unshipped BUILDING orders by integer-exact
    revenue; broadcast or double co-partition dimension plan."""
    from s2ray.pipelines.join import shipping_priority

    return shipping_priority(sf_dir)


def _q_source_vocab_jaccard(sf_dir: str):
    """Pairwise source vocabulary Jaccard via per-token source bitmasks."""
    from s2ray.pipelines.text import source_vocab_jaccard

    return source_vocab_jaccard(sf_dir)


def _q_event_type_trend(sf_dir: str):
    """Per-type daily OLS trend slope with closed-form x-moments: one
    vocabulary-bounded moment shuffle."""
    from s2ray.pipelines.analytics import event_type_trend

    return event_type_trend(sf_dir)


def _q_heaps_law(sf_dir: str):
    """Heaps-law vocabulary growth fit at int-math doc_id checkpoints:
    one token-first-occurrence shuffle + 10-row regression fold."""
    from s2ray.pipelines.text import heaps_law

    return heaps_law(sf_dir)


def _q_clark_evans(sf_dir: str):
    """Clark-Evans CSR index: order-pinned fold over the per-page NN
    distances from the exactly-once distance join."""
    from s2ray.pipelines.spatial_join import clark_evans
    from s2ray.pipelines.tiles import pages_with_cells

    return clark_evans(pages_with_cells(sf_dir, token_level=None),
                       DIST_JOIN_M)


def _q_domain_link_jaccard(sf_dir: str):
    """Neighborhood-Jaccard similarity over shared-neighbor domain
    pairs on the undirected simple domain graph, flagged by adjacency
    (non-adjacent high-jaccard rows are the link-prediction
    candidates; the near-complete synthetic graph keeps both)."""
    from s2ray.pipelines.webgraph import domain_link_jaccard

    return domain_link_jaccard(sf_dir)


def _q_domain_cocitation(sf_dir: str):
    """Co-citation pair counts on the domain digraph (shared in-linkers)."""
    from s2ray.pipelines.webgraph import domain_cocitation

    return domain_cocitation(sf_dir)


def _q_domain_coupling(sf_dir: str):
    """Bibliographic-coupling pair counts (shared out-link targets)."""
    from s2ray.pipelines.webgraph import domain_coupling

    return domain_coupling(sf_dir)


RIPLEY_RADII = (5_000.0, 10_000.0, 25_000.0)


def _q_ripley_k(sf_dir: str):
    """Ripley's K point-pattern statistic: one distance self-join at the
    max radius, per-radius exact pair counts, spherical K estimator."""
    from s2ray.pipelines.spatial_join import ripley_k
    from s2ray.pipelines.tiles import pages_with_cells

    return ripley_k(pages_with_cells(sf_dir, token_level=None),
                    radii=RIPLEY_RADII)


def _q_retention_half_life(sf_dir: str):
    """Exponential-decay fit (and half-life) of the user-aligned
    retention curve — order-pinned semi-log regression over the exact
    activity_curve facts."""
    from s2ray.pipelines.analytics import retention_half_life

    return retention_half_life(sf_dir)


def _q_lang_tile_jaccard(sf_dir: str):
    """Pairwise language tile-footprint Jaccard matrix over occupied
    level-8 tiles (bounded distinct grid)."""
    from s2ray.pipelines.tiles import lang_tile_jaccard

    return lang_tile_jaccard(sf_dir)


def _q_user_activity_gini(sf_dir: str):
    """Gini concentration of events over users from the count-of-counts
    histogram (analytic rank moment, big-int exact)."""
    from s2ray.pipelines.analytics import user_activity_gini

    return user_activity_gini(sf_dir)


def _q_anova_len_by_source(sf_dir: str):
    """One-way ANOVA eta-squared + F of doc length across sources from
    exact big-int moments (order-pinned between-group fold)."""
    from s2ray.pipelines.analytics import anova_len_by_source

    return anova_len_by_source(sf_dir)


def _q_skipgram_pairs(sf_dir: str):
    """Top-100 windowed (distance <= 5) token co-occurrence pairs —
    vectorized shifted-array extraction, exact integer ranking."""
    from s2ray.pipelines.text import skipgram_pairs

    return skipgram_pairs(sf_dir)


def _q_cohort_ltv(sf_dir: str):
    """Revenue-LTV cohort matrix over orders: first-order-month cohorts
    x months-since-acquisition with exact integer cents (custkey
    co-partition, matrix-cell-sized second shuffle)."""
    from s2ray.pipelines.analytics import cohort_ltv

    return cohort_ltv(sf_dir)


def _q_tile_month_jaccard(sf_dir: str):
    """Month-over-month Jaccard of the occupied level-8 tile sets
    (bounded distinct grid, strict-previous-month contract)."""
    from s2ray.pipelines.tiles import tile_month_jaccard

    return tile_month_jaccard(sf_dir)


def _q_kruskal_wallis_qty(sf_dir: str):
    """Kruskal-Wallis rank test of line quantity across return flags
    from the exact bounded contingency (order-pinned group fold)."""
    from s2ray.pipelines.join import kruskal_wallis_qty

    return kruskal_wallis_qty(sf_dir)


def _q_monthly_lang_js(sf_dir: str):
    """Month-over-month Jensen-Shannon drift of the language mix
    (order-pinned ascending-lang folds over the global language grid)."""
    from s2ray.pipelines.tiles import monthly_lang_js

    return monthly_lang_js(sf_dir)


def _q_cramers_v_lang_face(sf_dir: str):
    """Cramér's V association between language and S2 cube face from
    the exact zero-filled contingency (order-pinned chi-square fold)."""
    from s2ray.pipelines.tiles import cramers_v_lang_face

    return cramers_v_lang_face(sf_dir)


def _q_theil_decomposition(sf_dir: str):
    """Theil-T inequality of level-8 tile populations decomposed by S2
    cube face (exact tile counts, order-pinned within-face ln folds,
    nibble-derived face on both engines)."""
    from s2ray.pipelines.tiles import theil_decomposition

    return theil_decomposition(sf_dir)


def _q_pettitt_test(sf_dir: str):
    """Pettitt rank changepoint per event type over zero-filled daily
    counts (integer telescoped U_t, earliest-day tie-break, mirrored
    significance approximation)."""
    from s2ray.pipelines.analytics import pettitt_test

    return pettitt_test(sf_dir)


def _q_distance_decay(sf_dir: str):
    """Semi-log distance-decay regression of page density over 500 km
    rings around the Moscow query point (order-pinned moment folds,
    tile_zipf's contract)."""
    from s2ray.pipelines.spatial_join import distance_decay
    from s2ray.pipelines.tiles import pages_with_cells

    return distance_decay(pages_with_cells(sf_dir, token_level=None),
                          KNN_Q["qlat"], KNN_Q["qlng"])


def _q_markov_entropy_rate(sf_dir: str):
    """Entropy rate + perplexity of the event-type Markov chain over
    the event_transitions counts (order-pinned ln fold)."""
    from s2ray.pipelines.analytics import markov_entropy_rate

    return markov_entropy_rate(sf_dir)


def _q_vocab_richness(sf_dir: str):
    """Hapax/dis-legomena frequency-spectrum profile per language
    (exact count-of-count facts of the vocabulary shuffle)."""
    from s2ray.pipelines.text import vocab_richness

    return vocab_richness(sf_dir)


def _q_yules_k(sf_dir: str):
    """Yule's K vocabulary-concentration constant per language (exact
    count-of-count moments, one vocabulary-sized shuffle)."""
    from s2ray.pipelines.text import yules_k

    return yules_k(sf_dir)


def _q_ks_test_length(sf_dir: str):
    """Two-sample KS statistic of each source's doc-length distribution
    vs the rest — exact integer ECDF gaps over the shared length
    histogram."""
    from s2ray.pipelines.analytics import ks_test_length

    return ks_test_length(sf_dir)


def _q_lognormal_fit_length(sf_dir: str):
    """Method-of-moments lognormal fit (mu, sigma, exp(mu)) of each
    source's doc lengths — libm ln once per distinct length,
    order-pinned weighted moment folds."""
    from s2ray.pipelines.analytics import lognormal_fit_length

    return lognormal_fit_length(sf_dir)


def _q_weekday_chi2(sf_dir: str):
    """Weekday-uniformity chi-square per event type (telescoped
    7*S2/n - n from exact integer moments; 7-cell contract)."""
    from s2ray.pipelines.analytics import weekday_chi2

    return weekday_chi2(sf_dir)


def _q_kaplan_meier(sf_dir: str):
    """Kaplan-Meier survival of per-user inter-event waiting times,
    right-censored at the corpus horizon — bucket-bounded count
    shuffle + order-pinned ascending product fold (list_reduce
    mirror)."""
    from s2ray.pipelines.analytics import kaplan_meier_gaps

    return kaplan_meier_gaps(sf_dir)


def _q_mann_whitney_length(sf_dir: str):
    """Mann-Whitney U rank test of each source's document-length
    distribution vs the rest — exact integer midranks + tie correction
    from the (source, n_chars) count histogram, one scalar float chain
    per source."""
    from s2ray.pipelines.analytics import mann_whitney_length

    return mann_whitney_length(sf_dir)


def _q_user_burstiness(sf_dir: str):
    """Goh-Barabasi burstiness of per-user inter-event gaps: exact big-int
    moments in one user-hash co-partition."""
    from s2ray.pipelines.analytics import user_burstiness

    return user_burstiness(sf_dir)


def _q_source_js(sf_dir: str):
    """Jensen-Shannon divergence between src0/src1 token distributions:
    vocab-bounded count shuffle + order-pinned float fold."""
    from s2ray.pipelines.text import source_js_divergence

    return source_js_divergence(sf_dir)


def _q_quadrat_dispersion(sf_dir: str):
    """Quadrat-count variance-to-mean ratio over occupied level-8 tiles:
    exact big-int moments in the grid-bounded final task."""
    from s2ray.pipelines.tiles import quadrat_dispersion

    return quadrat_dispersion(sf_dir, level=8)


def _q_lang_frontier(sf_dir: str):
    """Dominant-language join counts over Moore-adjacent occupied grid
    cells (categorical frontier map, all-integer)."""
    from s2ray.pipelines.cluster import lang_frontier
    from s2ray.pipelines.tiles import pages_with_cells

    return lang_frontier(pages_with_cells(sf_dir, token_level=None))


def _q_lang_radius(sf_dir: str):
    """Per-language dispersion radius from the exact spherical centroid
    (order-free fixed-point sums, broadcast rounded centroids)."""
    from s2ray.pipelines.tiles import lang_radius

    return lang_radius(sf_dir)


def _q_user_growth(sf_dir: str):
    """Cumulative user-acquisition curve (per-user min-day via blob
    co-partition, calendar-bounded day series, driver prefix sum)."""
    from s2ray.pipelines.analytics import user_growth

    return user_growth(sf_dir)


def _q_order_size_hist(sf_dir: str):
    """Basket-size histogram over the orderkey blob co-partition."""
    from s2ray.pipelines.join import order_size_hist

    return order_size_hist(sf_dir)


def _q_token_len_stats(sf_dir: str):
    """Per-language token-length profile (int64-exact length sums,
    mirrored avg division)."""
    from s2ray.pipelines.text import token_len_stats

    return token_len_stats(sf_dir)


def _q_textrank_keywords(sf_dir: str):
    """TextRank keyword extraction: weighted PageRank over the
    top-200-token adjacency graph with the order-pinned contribution
    fold (recursive-CTE oracle, domain_pagerank's mirror)."""
    from s2ray.pipelines.text import textrank_keywords

    return textrank_keywords(sf_dir)


def _q_log_odds_keywords(sf_dir: str):
    """Top-15 distinctive tokens per language by smoothed log-odds
    z-score (Fightin' Words, uniform +1 prior) — one vocabulary-sized
    count shuffle + bounded driver scoring with the libm ln mirror."""
    from s2ray.pipelines.text import log_odds_keywords

    return log_odds_keywords(sf_dir)


def _q_flesch_lang(sf_dir: str):
    """Per-language Flesch reading-ease profile from exact integer
    word/sentence/vowel-cluster corpus sums (regex-count kernels fused
    with the scan; one scalar float chain per language)."""
    from s2ray.pipelines.text import flesch_lang

    return flesch_lang(sf_dir)


def _q_tile_gini(sf_dir: str):
    """Gini inequality of level-8 tile populations (exact big-int rank
    moments over the tile-count core)."""
    from s2ray.pipelines.tiles import tile_gini

    return tile_gini(sf_dir)


def _q_tile_zipf(sf_dir: str):
    """Rank-size regression over occupied level-8 tile populations
    (order-pinned moment fold, tie-rank cancellation)."""
    from s2ray.pipelines.tiles import tile_zipf

    return tile_zipf(sf_dir)


def _q_centroid_drift(sf_dir: str):
    """Month-over-month great-circle drift of the crawl centroid (LAG
    over the bit-agreed rounded monthly centroids)."""
    from s2ray.pipelines.tiles import centroid_drift

    return centroid_drift(sf_dir)


def _q_events_quantiles_cont(sf_dir: str):
    """Interpolated per-type value quantiles (quantile_cont) via the
    3-pass bounded-memory rank machinery, two flanking ranks per q."""
    from s2ray.pipelines.analytics import group_quantiles_cont

    return group_quantiles_cont(sf_dir)


def _q_silhouette_hist(sf_dir: str):
    """Per-label simplified-silhouette histogram (exact-integer
    centroids, dim-ordered float folds, bounded cell counts out)."""
    from s2ray.pipelines.ann import silhouette_hist

    return silhouette_hist(sf_dir)


def _q_supplier_lead_time(sf_dir: str):
    """Per-supplier shipping lead time over the orderkey blob
    co-partition (int64-exact delay sums, mirrored avg chain)."""
    from s2ray.pipelines.join import supplier_lead_time

    return supplier_lead_time(sf_dir)


def _q_char_entropy(sf_dir: str):
    """Per-language codepoint Shannon entropy (alphabet-bounded shuffle,
    order-pinned p*ln(p) fold)."""
    from s2ray.pipelines.text import char_entropy

    return char_entropy(sf_dir)


def _q_peak_window(sf_dir: str):
    """Densest 10-minute window per event type (bounded minute counts,
    per-type dense cumsum, earliest-argmax)."""
    from s2ray.pipelines.analytics import peak_window

    return peak_window(sf_dir)


def _q_peak_open_orders(sf_dir: str):
    """Peak simultaneously-open orders via the +1/-1 delta sweep over
    calendar-bounded boundary days."""
    from s2ray.pipelines.join import peak_open_orders

    return peak_open_orders(sf_dir)


def _q_knox_pairs(sf_dir: str):
    """Knox space-time interaction over the 25 km pair core (month index
    encoded into the point id, one bounded counter row out)."""
    from s2ray.pipelines.spatial_join import knox_pairs
    from s2ray.pipelines.tiles import pages_with_cells

    return knox_pairs(pages_with_cells(sf_dir, token_level=None),
                      DIST_JOIN_M)


def _q_source_cooccurrence(sf_dir: str):
    """Cross-domain shared-text matrix over the crawl (digest blob
    co-partition, |domains|^2-bounded output)."""
    from s2ray.pipelines.dedup import source_cooccurrence
    from s2ray.pipelines.tiles import pages_with_cells

    return source_cooccurrence(pages_with_cells(sf_dir,
                                                token_level=None))


def _q_search_rank(sf_dir: str):
    """Fixed-query TF-IDF retrieval top-20 (ordered term fold, rounded
    rank, two-level local top-k)."""
    from s2ray.pipelines.text import search_rank

    return search_rank(sf_dir)


def _q_voronoi_monthly(sf_dir: str):
    """Voronoi x month market-share rollup (argmin assignment,
    K x months bounded groupby)."""
    from s2ray.pipelines.spatial_join import voronoi_monthly
    from s2ray.pipelines.tiles import pages_with_cells
    from s2ray.sources.pages import CITIES_E4

    return voronoi_monthly(
        pages_with_cells(sf_dir, token_level=None),
        [(la / 1e4, ln / 1e4) for la, ln in CITIES_E4])


def _q_nation_flow(sf_dir: str):
    """Customer-nation x supplier-nation revenue matrix (broadcast dims,
    one orderkey co-partition, hi/lo microcent lanes)."""
    from s2ray.pipelines.join import nation_flow

    return nation_flow(sf_dir)


def _q_doc_lang_runs(sf_dir: str):
    """Runs statistic over the id-ordered language sequence (range
    buckets + segment-concat fold — the distributed ordered scan)."""
    from s2ray.pipelines.analytics import doc_lang_runs

    return doc_lang_runs(sf_dir)


def _q_revenue_growth(sf_dir: str):
    """Month-over-month revenue growth (hi/lo cent lanes, driver LAG
    mirror)."""
    from s2ray.pipelines.join import revenue_growth

    return revenue_growth(sf_dir)


def _q_dau_mau(sf_dir: str):
    """Monthly DAU/MAU stickiness — exact distinct at both grains via
    one user-hashed blob co-partition, calendar-bounded finish."""
    from s2ray.pipelines.analytics import dau_mau

    return dau_mau(sf_dir)


def _q_day_user_jaccard(sf_dir: str):
    """Jaccard overlap of consecutive days' active-user sets — the
    same user-hashed co-partition; per-user day sets stay local."""
    from s2ray.pipelines.analytics import day_user_jaccard

    return day_user_jaccard(sf_dir)


def _q_benford_law(sf_dir: str):
    """First-significant-digit distribution of order totals vs the
    Benford expectation — integer divide-down leading digit, one
    digit-cardinality groupby."""
    from s2ray.pipelines.join import benford_law

    return benford_law(sf_dir)


def _q_new_vs_repeat(sf_dir: str):
    """New-vs-returning revenue split per month (cohort-month rule) —
    custkey-hashed blob co-partition, wrap-safe hi/lo cent lanes."""
    from s2ray.pipelines.join import new_vs_repeat

    return new_vs_repeat(sf_dir)


def _q_tile_entropy(sf_dir: str):
    """Spatial entropy of tile populations (order-pinned p*ln(p) fold
    ascending cell id)."""
    from s2ray.pipelines.tiles import tile_entropy

    return tile_entropy(sf_dir)


def _q_return_rates(sf_dir: str):
    """Per-part return rate with Wilson lower bound (part-dimension
    groupby, mirrored CI chain)."""
    from s2ray.pipelines.join import return_rates

    return return_rates(sf_dir)


def _q_weekly_ma(sf_dir: str):
    """Trailing 7-day moving average over the shared dense daily count
    family (integer prefix difference, one mirrored division)."""
    from s2ray.pipelines.analytics import weekly_ma

    return weekly_ma(sf_dir)


def _q_search_bm25(sf_dir: str):
    """BM25 retrieval top-20 with document-length saturation (ordered
    term fold, mirrored chain)."""
    from s2ray.pipelines.text import search_bm25

    return search_bm25(sf_dir)


def _q_order_quantiles(sf_dir: str):
    """Exact per-priority order-value quantiles: the 3-pass bounded
    rank machinery instantiated on a SECOND table via its make_ds
    hook (orders, o_orderpriority x o_totalprice)."""
    from s2ray.pipelines.analytics import group_quantiles
    from s2ray.sources.readers import read_table

    return group_quantiles(
        sf_dir, qs=(0.5, 0.9, 0.99),
        group_col="o_orderpriority", value_col="o_totalprice",
        make_ds=lambda: read_table(
            sf_dir, "orders",
            columns=["o_orderpriority", "o_totalprice"]))


def _q_customer_concentration(sf_dir: str):
    """Top-1% revenue share via bucket-offset exact rank cut (full
    buckets summed, only the cut bucket fetched)."""
    from s2ray.pipelines.join import customer_concentration

    return customer_concentration(sf_dir)


def _q_event_trigrams(sf_dir: str):
    """Consecutive event-type trigram counts per user order (blob
    co-partition, K^3-bounded output)."""
    from s2ray.pipelines.analytics import event_trigrams

    return event_trigrams(sf_dir)


def _q_activity_curve(sf_dir: str):
    """User-aligned retention curve (distinct user-day blob
    co-partition, calendar-bounded offsets, mirrored rate)."""
    from s2ray.pipelines.analytics import activity_curve

    return activity_curve(sf_dir)


def _q_langid_mismatch(sf_dir: str):
    """Per-source labeled-lang vs LangId mismatch rate (fused scan,
    source-bounded partials)."""
    from s2ray.pipelines.text import langid_mismatch_by_source

    return langid_mismatch_by_source(sf_dir)


def _q_dup_by_length(sf_dir: str):
    """Duplicate rate by length decile: digest blob co-partition flag
    joined to the NTILE(10) decile, bounded cell aggregate."""
    from s2ray.pipelines.dedup import dup_by_length

    return dup_by_length(sf_dir)


def _q_basket_lift(sf_dir: str):
    """Association lift for the top-100 basket pairs (distinct-basket
    counts via sentinel blob co-partition, mirrored lift chain)."""
    from s2ray.pipelines.join import basket_lift

    return basket_lift(sf_dir)


def _q_basket_pairs(sf_dir: str):
    """Top-100 market-basket part pairs via per-order vectorized pair
    enumeration inside an orderkey blob co-partition."""
    from s2ray.pipelines.join import basket_pairs

    return basket_pairs(sf_dir)


def _q_colocation_quotient(sf_dir: str):
    """Lang-pair colocation quotient over the 25 km NN graph (lang code
    encoded through the exactly-once pair core, |langs|^2 cells out)."""
    from s2ray.pipelines.spatial_join import colocation_quotient
    from s2ray.pipelines.tiles import pages_with_cells

    return colocation_quotient(pages_with_cells(sf_dir, token_level=None),
                               DIST_JOIN_M)


def _q_domain_clustering(sf_dir: str):
    """Per-node local clustering coefficient of the undirected domain
    graph (diag(A^3)/2 in the vocabulary-bounded final task)."""
    from s2ray.pipelines.webgraph import domain_clustering

    return domain_clustering(sf_dir)


def _q_domain_reciprocity(sf_dir: str):
    """Edge reciprocity of the domain digraph: exact mutual-edge count
    over the vocabulary-bounded distinct edge set."""
    from s2ray.pipelines.webgraph import domain_reciprocity

    return domain_reciprocity(sf_dir)


def _q_domain_assortativity(sf_dir: str):
    """Newman degree assortativity of the undirected simple domain graph:
    exact big-int moments, one CAST-then-divide float."""
    from s2ray.pipelines.webgraph import domain_assortativity

    return domain_assortativity(sf_dir)


def _q_domain_bfs_depth(sf_dir: str):
    """Directed BFS hop distance from src0.example.com over the domain
    digraph (recursive-CTE oracle)."""
    from s2ray.pipelines.webgraph import domain_bfs_depth

    return domain_bfs_depth(sf_dir)


def _q_domain_components(sf_dir: str):
    """Connected components of the thresholded domain backbone via the
    distributed hash-min label-propagation machinery (recursive
    min-reachability CTE oracle); singleton domains preserved."""
    from s2ray.pipelines.webgraph import domain_components

    return domain_components(sf_dir)


def _q_zipf_slope(sf_dir: str):
    """Zipf rank-frequency regression over the corpus vocabulary:
    order-pinned moment folds ascending rank."""
    from s2ray.pipelines.analytics import zipf_slope

    return zipf_slope(sf_dir)


def _q_source_drift_psi(sf_dir: str):
    """PSI drift monitor between src0 and src1 n_chars distributions:
    exact bucket counts, order-pinned (p-q)ln(p/q) fold."""
    from s2ray.pipelines.analytics import source_drift_psi

    return source_drift_psi(sf_dir)


def _q_domain_gini(sf_dir: str):
    """Gini coefficient of pages per source domain — big-int rank
    moments over the vocabulary-bounded count table."""
    from s2ray.pipelines.analytics import domain_gini

    return domain_gini(sf_dir)


def _q_domain_hits(sf_dir: str):
    """HITS hubs/authorities: unnormalized Jacobi iterations with one
    final L1 normalization, all folds order-pinned."""
    from s2ray.pipelines.webgraph import domain_hits

    return domain_hits(sf_dir)


def _q_profile_table(sf_dir: str):
    """ANALYZE-style per-column profile of documents: exact distinct /
    min / max over VARCHAR images, streaming null partials."""
    from s2ray.pipelines.analytics import profile_table

    return profile_table(sf_dir, "documents")


def _q_session_entry_exit(sf_dir: str):
    """Entry/exit-type session matrix with bounce rates — sessionize on
    co-partitioned users, vocabulary-bounded partial counts."""
    from s2ray.pipelines.analytics import session_entry_exit

    return session_entry_exit(sf_dir)


def _q_phrase_search(sf_dir: str):
    """Positional phrase query 'data line': token-exact adjacency over
    the flat token arrays, shuffle-free streaming scan."""
    from s2ray.pipelines.text import phrase_search

    return phrase_search(sf_dir, "data", "line")


def _q_domain_triangles(sf_dir: str):
    """Triangle census + global clustering coefficient of the undirected
    domain graph (trace(A^3)/6 over the exact adjacency)."""
    from s2ray.pipelines.webgraph import domain_triangles

    return domain_triangles(sf_dir)


def _q_event_cooccurrence(sf_dir: str):
    """Market-basket lift over distinct-user event-type pairs: broadcast
    type vocabulary, bit-mask OR via post-distinct Sum, 2^K-bounded
    histogram combine with big-int lift numerators."""
    from s2ray.pipelines.analytics import event_cooccurrence

    return event_cooccurrence(sf_dir)


def _q_domain_link_graph(sf_dir: str):
    """Domain-level link-graph construction: deterministic outlinks
    (SQL-mirrored like the pages synth), per-batch 400-cell partials."""
    from s2ray.pipelines.webgraph import domain_link_graph

    return domain_link_graph(sf_dir)


def _q_domain_pagerank(sf_dir: str):
    """PageRank power iteration over the domain graph under the SQL gate
    (recursive-CTE oracle, order-pinned contribution folds)."""
    from s2ray.pipelines.webgraph import domain_pagerank

    return domain_pagerank(sf_dir)


def _q_tile_growth(sf_dir: str):
    """Month-over-month page-count delta per level-6 tile (spatial LAG)."""
    from s2ray.pipelines.tiles import tile_growth

    return tile_growth(sf_dir, level=TILE_Q_LEVEL)


def _q_emb_integrity(sf_dir: str):
    """Referential-integrity audit docs <-> embeddings (id co-partition)."""
    from s2ray.pipelines.join import emb_integrity

    return emb_integrity(sf_dir)


def _q_langid_confusion(sf_dir: str):
    """Labeled-lang vs LangId-prediction confusion matrix."""
    from s2ray.pipelines.text import langid_confusion

    return langid_confusion(sf_dir)


def _q_source_mix(sf_dir: str):
    """Temperature-smoothed (alpha=0.5) mixing-rate audit per source."""
    from s2ray.pipelines.sampling import source_mix

    return source_mix(sf_dir)


def _q_user_streaks(sf_dir: str):
    """Gaps-and-islands: longest consecutive-active-day streak/user."""
    from s2ray.pipelines.analytics import user_streaks

    return user_streaks(sf_dir)


def _q_cross_lang_nn(sf_dir: str):
    """Bitext-mining top-1: nearest different-language embedding."""
    from s2ray.pipelines.ann import cross_lang_nn

    return cross_lang_nn(sf_dir)


def _q_cross_lang_nn_bucketed(sf_dir: str):
    """Banded-LSH scale path of cross_lang_nn (approximate; recall
    pytest-bounded vs the exact broadcast baseline)."""
    from s2ray.pipelines.ann import cross_lang_nn_bucketed

    return cross_lang_nn_bucketed(sf_dir)


def _q_doc_deciles(sf_dir: str):
    """Distributed NTILE(10) per lang over (n_chars, doc_id) order."""
    from s2ray.pipelines.analytics import doc_deciles

    return doc_deciles(sf_dir)


def _q_events_weekday_hour(sf_dir: str):
    """Weekday x hour traffic heatmap with purchase overlay."""
    from s2ray.pipelines.analytics import events_weekday_hour

    return events_weekday_hour(sf_dir)


def _q_group_sizes_hist(sf_dir: str):
    """k-anonymity / skew audit: histogram of (lang, source) group
    sizes over the documents table."""
    from s2ray.pipelines.analytics import group_sizes_hist

    return group_sizes_hist(sf_dir)


def _q_cohort_retention(sf_dir: str):
    """Retention triangle: cohort = week of first purchase, distinct
    active purchasers per (cohort_week, week)."""
    from s2ray.pipelines.analytics import cohort_retention

    return cohort_retention(sf_dir, event_type="purchase")


EVENT_QS = (0.5, 0.9, 0.99)


def _q_events_quantiles(sf_dir: str):
    from s2ray.pipelines.analytics import group_quantiles

    return group_quantiles(sf_dir, qs=EVENT_QS)


SESSION_QS = (0.5, 0.9, 0.99)


def _q_session_quantiles(sf_dir: str):
    """Pipeline composition: the oracled sessionization feeds the exact
    bounded-memory quantile machinery — global session-duration
    quantiles (the 'how long do sessions last' product question)."""
    import pyarrow as pa

    from s2ray.pipelines.analytics import group_quantiles, user_sessions

    def make_ds():
        ds = user_sessions(sf_dir)

        def proj(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table({
                "grp": pa.array(["all"] * len(batch), type=pa.string()),
                "value": pc.cast(batch["duration_s"], pa.float64()),
            })

        return ds.map_batches(proj, batch_format="pyarrow",
                              batch_size=None)

    return group_quantiles(sf_dir, qs=SESSION_QS, group_col="grp",
                           value_col="value", make_ds=make_ds)


def _q_tile_diversity(sf_dir: str):
    """Per-tile content diversity: page count + exact distinct-language
    count per level-6 S2 cell."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from s2ray.kernel import cellid, keys
    from s2ray.pipelines.tiles import pages_with_cells

    col = f"cell_l{TILE_Q_LEVEL}"
    ds = pages_with_cells(sf_dir, token_level=TILE_Q_LEVEL)

    def partial(batch: pa.Table) -> pa.Table:
        # pre-aggregate to (cell, lang) within the batch: the shuffle
        # moves at most cells x languages rows per batch, never pages
        ck = keys.to_key(batch[col].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({
            "ck": ck,
            "lang": batch["lang"].to_pandas(),
        })
        g = df.groupby(["ck", "lang"], sort=False, dropna=False) \
            .size().reset_index(name="pn")
        ckv = g["ck"].to_numpy()
        return pa.table({
            "part": pa.array((ckv % 256).astype(np.int32)),
            "ck": pa.array(ckv, type=pa.int64()),
            "lang": pa.array(
                g["lang"].where(g["lang"].notna(), None).tolist(),
                type=pa.string()),
            "pn": pa.array(g["pn"].to_numpy().astype(np.int64)),
        })

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "cell_token": pd.Series(dtype=object),
                "n_pages": pd.Series(dtype=np.int64),
                "n_langs": pd.Series(dtype=np.int64),
            })
        g = df.groupby("ck", sort=True).agg(
            n_pages=("pn", "sum"), n_langs=("lang", "nunique"))
        ids = keys.from_key(g.index.to_numpy().astype(np.int64))
        return pd.DataFrame({
            "cell_token": cellid.to_token(ids),
            "n_pages": g["n_pages"].to_numpy().astype(np.int64),
            "n_langs": g["n_langs"].to_numpy().astype(np.int64),
        })

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
            .groupby("part")
            .map_groups(merge, batch_format="pandas"))


TILE_Q_LEVEL = 6
TILE_QS = (0.5, 0.9)


def _q_tile_quantiles(sf_dir: str):
    """Per-tile text-length quantiles: the exact bounded-memory grouped
    quantile machinery keyed by the level-6 S2 cell — a spatial
    statistics map layer (median page size per tile)."""
    import numpy as np
    import pyarrow.compute as pc

    from s2ray.kernel import cellid, keys
    from s2ray.pipelines.analytics import group_quantiles
    from s2ray.pipelines.tiles import pages_with_cells

    col = f"cell_l{TILE_Q_LEVEL}"

    def make_ds():
        import pyarrow as pa

        ds = pages_with_cells(sf_dir, token_level=TILE_Q_LEVEL)

        def proj(batch):
            # biased int64 shuffle keys: raw uint64 cell ids on faces 4-5
            # exceed int64 and would objectify the shuffle blocks
            ck = keys.to_key(
                batch[col].to_numpy(zero_copy_only=False))
            return pa.table({
                "cell": pa.array(ck, type=pa.int64()),
                "value": pc.cast(pc.utf8_length(batch["text"]),
                                 pa.float64()),
            })

        return ds.map_batches(proj, batch_format="pyarrow",
                              batch_size=None)

    out = group_quantiles(sf_dir, qs=TILE_QS, group_col="cell",
                          value_col="value", n_bins=128, make_ds=make_ds)
    ids = keys.from_key(out["cell"].to_numpy().astype(np.int64))
    out = out.drop(columns=["cell"])
    out.insert(0, "cell_token", cellid.to_token(ids))
    return out.sort_values(["cell_token", "q"], ignore_index=True)


# deterministic overlapping promo windows over the events month
# (2024-01-01 epoch base), lengths 6..101 hours
EVENT_WINDOWS = [
    (f"w{k:02d}", 1704067200 + k * 67 * 3600,
     1704067200 + k * 67 * 3600 + (6 + (17 * k) % 96) * 3600)
    for k in range(10)
]


def _q_event_windows(sf_dir: str):
    from s2ray.pipelines.analytics import interval_join

    return interval_join(sf_dir, EVENT_WINDOWS)


def _q_events_distinct(sf_dir: str):
    from s2ray.pipelines.analytics import distinct_users

    return distinct_users(sf_dir)


# deterministic per-source sampling rates in basis points: src0..src19,
# full rate for src0/src1, decaying tiers after
SAMPLE_RATES_BP = {f"src{k}": r for k, r in enumerate(
    [10000, 10000, 5000, 5000, 2500, 2500, 1000, 1000, 1000, 1000,
     500, 500, 500, 250, 250, 100, 100, 50, 25, 0])}


def _q_sample_corpus(sf_dir: str):
    from s2ray.pipelines.sampling import sample_corpus

    return sample_corpus(sf_dir, SAMPLE_RATES_BP)


def _q_sample_per_lang(sf_dir: str):
    from s2ray.pipelines.sampling import sample_n_per_group

    return sample_n_per_group(sf_dir, n=10)


def _q_weighted_sample(sf_dir: str):
    """Length-weighted PPS Bernoulli sample (integer splitmix threshold)."""
    from s2ray.pipelines.sampling import weighted_sample

    return weighted_sample(sf_dir)


def _q_lang_corr(sf_dir: str):
    """Per-lang Pearson corr(n_chars, token count) via exact int moments."""
    from s2ray.pipelines.analytics import corr_by_group

    return corr_by_group(sf_dir)


def _q_events_sliding_distinct(sf_dir: str):
    """Sliding-window exact distinct users (non-summable window agg)."""
    from s2ray.pipelines.analytics import events_sliding_distinct

    return events_sliding_distinct(sf_dir)


def _q_emb_norm_by_lang(sf_dir: str):
    """Generic co-partition equi-join (documents JOIN embeddings on
    doc_id = vec_id) + rollup: (lang, n, avg_norm)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from s2ray.pipelines.join import copartition_hash_join

    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    embs = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    joined = copartition_hash_join(docs, embs, on="doc_id",
                                   right_on="vec_id")

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        if len(batch) == 0:
            # one-sided copartition buckets emit empty merge output;
            # np.stack needs at least one row
            return pa.table({
                "lang": pa.array([], type=pa.string()),
                "partial_n": pa.array([], type=pa.int64()),
                "partial_s": pa.array([], type=pa.float64()),
            })
        from s2ray.functions.vecs import embedding_matrix

        lang = np.asarray(batch["lang"].to_pandas(), dtype=object)
        emb = embedding_matrix(batch["embedding"])
        norm = np.sqrt((emb * emb).sum(axis=1))
        g = pd.DataFrame({"lang": lang, "norm": norm}).groupby(
            "lang", sort=False).agg(n=("norm", "size"), s=("norm", "sum"))
        return pa.table({
            "lang": pa.array(g.index.tolist(), type=pa.string()),
            "partial_n": pa.array(g["n"].to_numpy().astype(np.int64)),
            "partial_s": pa.array(g["s"].to_numpy()),
        })

    from ray.data.aggregate import Sum

    agg = (joined.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
           .groupby("lang")
           .aggregate(Sum("partial_n", alias_name="n"),
                      Sum("partial_s", alias_name="s")))

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False)
        sm = batch["s"].to_numpy(zero_copy_only=False)
        return pa.table({
            "lang": batch["lang"],
            "n": pa.array(n, type=pa.int64()),
            "avg_norm": pa.array(np.round(sm / n, 6), type=pa.float64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


def _q_audio_stats(sf_dir: str):
    """Real PCM statistics per audio payload (rows-only: binary media has
    no SQL mirror; decode correctness is pytest-verified)."""
    import ray.data

    from s2ray.stages.multimodal import AudioStatsStage, read_media

    return read_media(sf_dir).map_batches(
        AudioStatsStage, concurrency=(1, 4), batch_size=256,
        batch_format="pyarrow")


def _q_media_stats(sf_dir: str):
    """Multimodal plumbing end-to-end (rows-only: synthetic binary payloads
    with real PNG/RIFF-WAVE headers, actor-pool decode, per-type rollup;
    deterministic)."""
    from s2ray.stages.multimodal import media_stats

    return media_stats(sf_dir)


def _q_vocab(sf_dir: str):
    from s2ray.pipelines.text import vocab_top_k

    return vocab_top_k(sf_dir, k=100)


def _q_heavy_hitters(sf_dir: str):
    from s2ray.pipelines.text import heavy_hitters

    return heavy_hitters(sf_dir, k=100)


def _q_token_df(sf_dir: str):
    from s2ray.pipelines.text import token_doc_freq

    return token_doc_freq(sf_dir, k=100)


def _q_tfidf(sf_dir: str):
    """Per-document top-3 TF-IDF terms (DF broadcast + streaming score)."""
    from s2ray.pipelines.text import tfidf_top_terms

    return tfidf_top_terms(sf_dir, top_n=3)


def _q_chunks(sf_dir: str):
    """Context-window packing: fixed-100-token chunks per document."""
    from s2ray.pipelines.text import chunk_documents

    return chunk_documents(sf_dir, chunk_tokens=100)


def _q_repetition(sf_dir: str):
    """Gopher-style repetition signal: top-bigram fraction per document."""
    from s2ray.pipelines.text import repetition_stats

    return repetition_stats(sf_dir)


def _q_decontaminate(sf_dir: str):
    """Eval-set decontamination: training docs sharing shingles with the
    deterministic eval subset (doc_id % 97 == 0); zero-shuffle broadcast
    probe."""
    from s2ray.pipelines.dedup import decontaminate

    return decontaminate(sf_dir, eval_mod=97)


BLOOM_M_BITS = 1 << 20
BLOOM_N_HASHES = 6


def _q_decontaminate_bloom(sf_dir: str):
    """Bloom-filter decontamination scale path: same contract as
    decontaminate, eval shingles compressed to an OR-merged Bloom filter
    (no false negatives; deterministic SQL-mirrored false positives)."""
    from s2ray.pipelines.dedup import decontaminate_bloom

    return decontaminate_bloom(sf_dir, eval_mod=97, m_bits=BLOOM_M_BITS,
                               n_hashes=BLOOM_N_HASHES)


DIST_JOIN_M = 25_000.0


def _q_distance_join(sf_dir: str):
    """Spatial distance self-join: all page pairs within 25 km great-
    circle distance (cell+neighbor bucketing, exactly-once pair rule)."""
    from s2ray.pipelines.spatial_join import distance_join_pairs
    from s2ray.pipelines.tiles import pages_with_cells

    return distance_join_pairs(pages_with_cells(sf_dir, token_level=None),
                               DIST_JOIN_M)


BEARING_SECTORS = 16


def _q_bearing_circular(sf_dir: str):
    """Monthly circular statistics (mean bearing, resultant length,
    circular variance) of the Moscow-bearing field — 1e-9 fixed-point
    sin/cos monthly sums, identical finishing doubles both engines."""
    from s2ray.pipelines.spatial_join import bearing_circular_monthly
    from s2ray.pipelines.tiles import pages_with_cells

    return bearing_circular_monthly(
        pages_with_cells(sf_dir, token_level=None),
        KNN_Q["qlat"], KNN_Q["qlng"])


def _q_bearing_sectors(sf_dir: str):
    """Compass-sector rollup of the initial great-circle bearing from
    the Moscow query point (reference SmokeTest bearing formula)."""
    from s2ray.pipelines.spatial_join import bearing_sectors
    from s2ray.pipelines.tiles import pages_with_cells

    return bearing_sectors(pages_with_cells(sf_dir, token_level=None),
                           KNN_Q["qlat"], KNN_Q["qlng"],
                           n_sectors=BEARING_SECTORS)


def _q_geo_destination(sf_dir: str):
    """Great-circle destination projection (reference SmokeTest.php:32-47):
    every page displaced along a page-keyed bearing/distance."""
    from s2ray.pipelines.spatial_join import destination_points
    from s2ray.pipelines.tiles import pages_with_cells

    return destination_points(pages_with_cells(sf_dir, token_level=None))


def _q_location_codec(sf_dir: str):
    """E6 hex location codec round-trip (reference SmokeTest.php:49-60):
    '%08x,%08x' of truncated microdegrees, decoded back engine-side."""
    from s2ray.pipelines.spatial_join import location_codec
    from s2ray.pipelines.tiles import pages_with_cells

    return location_codec(pages_with_cells(sf_dir, token_level=None))


def _q_nearest_city(sf_dir: str):
    """Voronoi classification rollup: every page assigned to its nearest
    city (argmin haversine over the broadcast city list), per-city
    count + min/max distance."""
    from s2ray.pipelines.spatial_join import nearest_facility_stats
    from s2ray.pipelines.tiles import pages_with_cells
    from s2ray.sources.pages import CITIES_E4

    return nearest_facility_stats(
        pages_with_cells(sf_dir, token_level=None),
        [(la / 1e4, ln / 1e4) for la, ln in CITIES_E4])


def _q_nearest_neighbor(sf_dir: str):
    """Nearest-neighbor graph within 25 km: per-page argmin over the
    exactly-once distance self-join, two-stage distributed argmin."""
    from s2ray.pipelines.spatial_join import nearest_neighbor_map
    from s2ray.pipelines.tiles import pages_with_cells

    return nearest_neighbor_map(pages_with_cells(sf_dir, token_level=None),
                                DIST_JOIN_M)


def _q_rfm_segments(sf_dir: str):
    """RFM segmentation: three-metric exact distributed NTILE(4) over
    the customer metric table, k^3 cell histogram."""
    from s2ray.pipelines.analytics import rfm_segments

    return rfm_segments(sf_dir)


def _q_daily_cusum(sf_dir: str):
    """CUSUM changepoint excursion per event type over zero-filled daily
    counts (exact integer argmax, one mirrored division)."""
    from s2ray.pipelines.analytics import daily_cusum

    return daily_cusum(sf_dir)


def _q_daily_ewma(sf_dir: str):
    """Order-pinned EWMA fold of zero-filled daily counts per event type
    (list_reduce mirror, exact-binary alpha)."""
    from s2ray.pipelines.analytics import daily_ewma

    return daily_ewma(sf_dir)


def _q_daily_autocorr(sf_dir: str):
    """Lag-1 autocorrelation of zero-filled daily counts per event type
    (bounded types x days groupby, exact big-int moments, one mirrored
    float chain)."""
    from s2ray.pipelines.analytics import daily_autocorr

    return daily_autocorr(sf_dir)


def _q_hourly_anomaly(sf_dir: str):
    """Hour-of-day z-score profile per event type (zero-filled 24-hour
    cells, exact big-int moments, one mirrored float chain)."""
    from s2ray.pipelines.analytics import hourly_anomaly

    return hourly_anomaly(sf_dir)


def _q_idw_interpolate(sf_dir: str):
    """IDW kNN regression of n_chars over the 25 km top-3 neighbor
    graph; order-pinned rank fold mirrors list_reduce."""
    from s2ray.pipelines.spatial_join import idw_interpolate

    return idw_interpolate(sf_dir, DIST_JOIN_M, k=KNN_GRAPH_K)


def _q_city_visits_monthly(sf_dir: str):
    """Geofence x month rollup: per (city, month) page count inside the
    100 km fence; one vectorized distance-matrix pass, all-integer."""
    from s2ray.pipelines.spatial_join import city_visits_monthly
    from s2ray.pipelines.tiles import pages_with_cells
    from s2ray.sources.pages import CITIES_E4

    return city_visits_monthly(
        pages_with_cells(sf_dir, token_level=None),
        [(la / 1e4, ln / 1e4) for la, ln in CITIES_E4])


def _q_doc_percent_rank(sf_dir: str):
    """Distributed PERCENT_RANK per lang: value-cardinality count
    groupby -> broadcast rank table -> one vectorized attach pass."""
    from s2ray.pipelines.analytics import doc_percent_rank

    return doc_percent_rank(sf_dir)


def _q_cross_k(sf_dir: str):
    """Bivariate Ripley's K between zh and en pages: exactly-once mixed
    pair counts per radius over the lang-bit-encoded pair core."""
    from s2ray.pipelines.spatial_join import cross_k
    from s2ray.pipelines.tiles import pages_with_cells

    return cross_k(pages_with_cells(sf_dir, token_level=None),
                   radii=RIPLEY_RADII)


def _q_lang_centroid_sim(sf_dir: str):
    """Cross-language embedding-centroid cosine matrix in the exact
    2^40-scaled integer domain with order-pinned float folds."""
    from s2ray.pipelines.ann import lang_centroid_sim

    return lang_centroid_sim(sf_dir)


def _q_monthly_centroid(sf_dir: str):
    """Monthly spherical centroid track of the crawl (1e-9 fixed-point
    order-free vector sums, one month-cardinality groupby)."""
    from s2ray.pipelines.tiles import monthly_centroid

    return monthly_centroid(sf_dir)


def _q_bipartite_nn(sf_dir: str):
    """Bipartite cross-language nearest neighbor within 25 km (zh -> en):
    lang bit encoded into the point id through the exactly-once bucketed
    pair core, two-stage distributed argmin."""
    from s2ray.pipelines.spatial_join import bipartite_nn
    from s2ray.pipelines.tiles import pages_with_cells

    return bipartite_nn(pages_with_cells(sf_dir, token_level=None),
                        DIST_JOIN_M)


def _q_doc_perplexity(sf_dir: str):
    """Bigram LM perplexity per document (corpus-trained, add-alpha
    smoothing) — CCNet-style quality signal; hashing and smoothing
    mirrored exactly in HUGEINT SQL."""
    from s2ray.pipelines.text import doc_perplexity

    return doc_perplexity(sf_dir, alpha=0.5)


def _q_funnel(sf_dir: str):
    """Funnel analytics: per user, view events followed by a purchase
    within 1h (co-partitioned, one searchsorted per partition)."""
    from s2ray.pipelines.analytics import funnel_conversions

    return funnel_conversions(sf_dir, a="view", b="purchase",
                              within_s=3600)


def _q_rare_tokens(sf_dir: str):
    """Corpus-frequency lexicon filter: per-doc count/fraction of token
    occurrences whose corpus frequency is <= the 0.2-quantile of token
    frequencies (rare-vocab broadcast probe)."""
    from s2ray.pipelines.text import rare_token_stats

    return rare_token_stats(sf_dir, q=0.2)


def _q_normalize_text(sf_dir: str):
    """Canonical normalization before dedup (lowercase, strip punct,
    collapse whitespace) — streaming Arrow RE2, no shuffle."""
    from s2ray.pipelines.text import normalize_text

    return normalize_text(sf_dir)


def _q_split_corpus(sf_dir: str):
    """Deterministic train/val/test split (5%/5%/90% by id hash) —
    coordination-free, pure per-row."""
    from s2ray.pipelines.sampling import split_corpus

    return split_corpus(sf_dir)


def _q_pack_examples(sf_dir: str):
    """Distributed window scan: exact running token totals in doc-id order
    + fixed-budget cross-document example packing (SUM OVER (ORDER BY)
    built as a range-bucketed two-level scan)."""
    from s2ray.pipelines.analytics import running_token_totals

    return running_token_totals(sf_dir, budget=2000)


def _q_events_distinct_users_hll(sf_dir: str):
    """HyperLogLog distinct-count per event_type (rows-only: approximate,
    no SQL mirror; <=5 % error vs the exact operator is pytest-asserted).
    Scale path: one 4 KiB register blob per (group, batch) shuffles."""
    from s2ray.pipelines.analytics import distinct_users_hll

    return distinct_users_hll(sf_dir)


def _q_events_quantiles_sketch(sf_dir: str):
    """One-pass approximate per-group quantiles (rows-only: summary
    selection depends on batch layout; the <= 1/summary_size relative
    rank-error guarantee is pytest-asserted vs the exact operator)."""
    from s2ray.pipelines.analytics import group_quantiles_sketch

    return group_quantiles_sketch(sf_dir)


def _q_new_docs(sf_dir: str):
    """Incremental-crawl dedup: documents whose 62-bit content fingerprint
    is absent from the existing pages store — co-partition ANTI join on
    the fingerprint (scale path: only int64 keys shuffle, no broadcast of
    the seen-set)."""
    import ray

    from s2ray.pipelines.join import copartition_hash_join
    from s2ray.pipelines.text import fingerprint
    from s2ray.sources.pages import read_pages

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    dfp = docs.map_batches(fingerprint, batch_format="pyarrow",
                           batch_size=None)
    pfp = (read_pages(sf_dir)
           .map_batches(fingerprint, fn_kwargs={"id_col": "page_id"},
                        batch_format="pyarrow", batch_size=None)
           .select_columns(["fingerprint"]))
    return copartition_hash_join(dfp, pfp, on="fingerprint", how="anti")


def _q_chunk_dedup(sf_dir: str):
    """C4-style duplicated-chunk removal: 50-token chunks occurring in
    >= 2 distinct docs are deleted everywhere, docs rebuilt from the
    survivors; digest-only counting shuffle + broadcast probe."""
    from s2ray.pipelines.dedup import chunk_dedup

    return chunk_dedup(sf_dir, chunk_tokens=50, min_docs=2)


def _q_quality_above_median(sf_dir: str):
    from s2ray.pipelines.text import quality_median_filter

    return quality_median_filter(sf_dir)


def _q_token_counts(sf_dir: str):
    import ray

    from s2ray.pipelines.text import token_counts

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(token_counts, batch_format="pyarrow",
                          batch_size=None)


CORPUS_MIN_QUALITY = 0.5
CORPUS_LANGS = ("en", "de", "fr", "es", "zh")


def _q_revenue_by_nation(sf_dir: str):
    """TPC-H Q5-shape relational pipeline: lineitem pre-aggregated per
    order -> two co-partition hash joins -> broadcast nation dim ->
    nation-sized groupby; revenue in the exact integer domain."""
    from s2ray.pipelines.join import revenue_by_nation

    return revenue_by_nation(sf_dir)


def _revenue_by_nation_oracle() -> str:
    return (
        "SELECT n.n_name AS n_name, "
        "CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) "
        "* CAST(round((1 - l.l_discount) * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS revenue_microcents, count(*) AS n_items "
        "FROM lineitem l "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "GROUP BY 1"
    )


def _q_pricing_summary(sf_dir: str):
    """TPC-H Q1-shape multi-aggregate groupby over lineitem; every sum in
    the exact integer domain (rint-lifted quantities/cents)."""
    from s2ray.pipelines.join import pricing_summary

    return pricing_summary(sf_dir)


def _pricing_summary_oracle() -> str:
    return (
        "SELECT l_returnflag, l_linestatus, "
        "CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) "
        "AS sum_qty, "
        "CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) "
        "AS BIGINT) AS sum_price_cents, "
        "CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) "
        "* CAST(round((1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS sum_disc_microcents, "
        "count(*) AS n_items, "
        "round(sum(CAST(round(l_quantity, 0) AS BIGINT)) * 1.0 "
        "/ count(*), 6) AS avg_qty "
        "FROM lineitem GROUP BY 1, 2"
    )


def _q_props_field_stats(sf_dir: str):
    """Semi-structured field extraction over the events props JSON-string
    column: one vectorized RE2 pull of integer 'k' + per-type rollup."""
    from s2ray.pipelines.analytics import props_field_stats

    return props_field_stats(sf_dir)


def _props_field_stats_oracle() -> str:
    return """SELECT event_type, count(*) AS n_events,
       count(k) AS n_with_k, CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k, max(k) AS max_k
FROM (SELECT event_type,
             CAST(nullif(regexp_extract(coalesce(props, ''),
                  '"k": ([0-9]+)', 1), '') AS BIGINT) AS k
      FROM events)
GROUP BY 1"""


def _q_doc_token_rank(sf_dir: str):
    """Distributed global window RANK + ROW_NUMBER over the corpus by
    token count — value-range two-level scan, exact for any layout."""
    from s2ray.pipelines.analytics import doc_token_rank

    return doc_token_rank(sf_dir)


def _doc_token_rank_oracle() -> str:
    return """WITH t AS (
  SELECT doc_id, CAST(len(regexp_extract_all(coalesce(text, ''),
       '\\S+')) AS BIGINT) AS n_tokens FROM documents)
SELECT doc_id, n_tokens,
       row_number() OVER (ORDER BY n_tokens, doc_id) AS row_num,
       rank() OVER (ORDER BY n_tokens) AS rank
FROM t"""


def _q_docs_rollup(sf_dir: str):
    """GROUPING SETS aggregate in one corpus pass: (lang, source) /
    (lang) / (source) / () doc counts + exact token sums."""
    from s2ray.pipelines.analytics import docs_rollup

    return docs_rollup(sf_dir)


def _docs_rollup_oracle() -> str:
    return """WITH t AS (
  SELECT lang, source, CAST(len(regexp_extract_all(coalesce(text, ''),
       '\\S+')) AS BIGINT) AS n FROM documents)
SELECT lang, source, count(*) AS n_docs,
       CAST(sum(n) AS BIGINT) AS sum_tokens
FROM t GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())"""


def _q_dup_degree_hist(sf_dir: str):
    """Degree distribution of the near-dup graph — pair-scale endpoint
    partials, doc-keyed degree sum, degree histogram."""
    from s2ray.pipelines.dedup import dup_degree_hist

    return dup_degree_hist(sf_dir, tau=NEAR_DUP_TAU)


def _q_dup_span_stats(sf_dir: str):
    """Span-level duplication signal: per doc, the fraction of its
    distinct k-gram shingles that occur in >= 1 other document —
    compact-blob inverted shuffle + document-keyed partial sums."""
    from s2ray.pipelines.dedup import dup_span_stats

    return dup_span_stats(sf_dir)


def _q_ngram_novelty(sf_dir: str):
    """Order-aware novelty: per doc, the fraction of its distinct k-gram
    shingles whose corpus-wide first occurrence (min doc_id) is this doc
    — the same compact-blob inverted shuffle as dup_span_stats plus one
    run-minimum fact per shingle."""
    from s2ray.pipelines.dedup import ngram_novelty

    return ngram_novelty(sf_dir)


def _q_corpus_keep(sf_dir: str):
    from s2ray.pipelines.dedup import corpus_dedup_keep

    return corpus_dedup_keep(sf_dir, tau=NEAR_DUP_TAU,
                             min_quality=CORPUS_MIN_QUALITY,
                             langs=CORPUS_LANGS)


def _q_emb_near_dup(sf_dir: str):
    from s2ray.pipelines.dedup import embedding_near_dup

    return embedding_near_dup(sf_dir, tau=EMB_TAU)


def _q_emb_near_dup_lsh(sf_dir: str):
    from s2ray.pipelines.dedup import embedding_near_dup_lsh

    return embedding_near_dup_lsh(sf_dir, tau=EMB_TAU)


def _q_knn_embeddings(sf_dir: str):
    from s2ray.pipelines.ann import knn_embeddings

    return knn_embeddings(sf_dir, ANN_QUERY_IDS, k=ANN_K)


def _q_knn_bulk(sf_dir: str):
    """Bulk-query brute-force ANN (vectorized multi-query partial top-k,
    ann.py knn_embeddings_bulk) — same contract as knn_embeddings."""
    from s2ray.pipelines.ann import knn_embeddings_bulk

    return knn_embeddings_bulk(sf_dir, ANN_BULK_QUERY_IDS, k=ANN_K)


def _q_bpe_token_counts(sf_dir: str):
    """Byte-level BPE subword counts per document (rows-only: the greedy
    merge training loop is not SQL-expressible; roundtrip/monotonicity/
    split-parity vs the oracled token_counts are pytest-asserted)."""
    from s2ray.pipelines.bpe import bpe_token_counts

    return bpe_token_counts(sf_dir, n_merges=200)


def _q_semantic_dedup(sf_dir: str):
    """SemDeDup-style semantic dedup (rows-only: k-means clustering is not
    SQL-expressible; precision==1 and recall vs the exact global operator
    are pytest-asserted)."""
    from s2ray.pipelines.dedup import semantic_dedup

    return semantic_dedup(sf_dir, tau=EMB_TAU, n_clusters=4)


def _q_ivf_knn(sf_dir: str):
    """IVF coarse-quantized ANN (rows-only: k-means training is not
    SQL-expressible; recall vs knn_embeddings is pytest-asserted)."""
    from s2ray.pipelines.ann import ivf_knn

    return ivf_knn(sf_dir, ANN_QUERY_IDS, k=ANN_K)


def _q_lsh_knn(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc

    from s2ray.pipelines.ann import lsh_knn

    out = lsh_knn(sf_dir, ANN_QUERY_IDS, k=ANN_K)

    def round_sim(batch: pa.Table) -> pa.Table:
        # engine and SQL compute cosine with different op order; round to
        # 6 digits on both sides for the value-hash compare
        s = pc.round(batch["sim"], ndigits=6)
        return batch.drop_columns(["sim"]).append_column("sim", s)

    return out.map_batches(round_sim, batch_format="pyarrow")


def _q_text_stats(sf_dir: str):
    import ray.data

    from s2ray.pipelines.text import text_stats

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(text_stats, batch_format="pyarrow")


def _q_quality(sf_dir: str):
    import ray.data

    from s2ray.pipelines.text import quality_score

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(quality_score, batch_format="pyarrow")


def _q_lang_id(sf_dir: str):
    import ray.data

    from s2ray.pipelines.text import lang_id_batch

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(lang_id_batch,
                          batch_format="pyarrow").select_columns(
        ["doc_id", "lang_pred", "lang_conf"])


PMI_MIN_COUNT = 5


def _q_pmi_collocations(sf_dir: str):
    """Bigram collocation mining by PMI over positional marginals —
    exact int count products, ln of identical doubles on both engines."""
    from s2ray.pipelines.text import pmi_collocations

    return pmi_collocations(sf_dir, min_count=PMI_MIN_COUNT)


def _q_fingerprint(sf_dir: str):
    import ray.data

    from s2ray.pipelines.text import fingerprint

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(fingerprint, batch_format="pyarrow")


WRAP_RECT = dict(lat_lo=-20.0, lat_hi=20.0, lng_lo=160.0, lng_hi=-160.0)
POLYLINE_DEG = [(55.5, 37.0), (55.8, 37.7), (56.0, 38.5), (55.6, 39.5)]
POLYLINE_MAX_DIST_M = 120000.0


def _q_rect_filter_wrap(sf_dir: str):
    from s2ray.pipelines.filters import rect_filter_batch
    from s2ray.pipelines.tiles import pages_with_cells

    ds = pages_with_cells(sf_dir, token_level=None)
    ds = ds.map_batches(rect_filter_batch, fn_kwargs=dict(WRAP_RECT),
                        batch_format="pyarrow")
    return ds.select_columns(["page_id", "lat", "lng"])


def _q_knn_pruned(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc

    from s2ray.pipelines.knn import knn_pages_pruned
    from s2ray.pipelines.tiles import pages_with_cells

    ds = pages_with_cells(sf_dir, token_level=None)
    out = knn_pages_pruned(ds, KNN_Q["qlat"], KNN_Q["qlng"], k=KNN_Q["k"])

    def round_dist(batch: pa.Table) -> pa.Table:
        d = pc.round(batch["dist_m"], ndigits=3)
        return batch.drop_columns(["dist_m"]).append_column("dist_m", d)

    return out.map_batches(round_dist, batch_format="pyarrow")


def _q_pages_per_month(sf_dir: str):
    from s2ray.pipelines.analytics import pages_per_month
    from s2ray.sources.pages import read_pages

    return pages_per_month(read_pages(sf_dir))


def _q_url_domains(sf_dir: str):
    from s2ray.pipelines.analytics import url_domain_counts
    from s2ray.sources.pages import read_pages

    return url_domain_counts(read_pages(sf_dir))


def _q_domain_lang_entropy(sf_dir: str):
    """Per-domain Shannon entropy of the page-language distribution —
    exact integer counts, order-pinned float fold (asc lang) on both
    engines."""
    from s2ray.pipelines.analytics import domain_lang_entropy
    from s2ray.sources.pages import read_pages

    return domain_lang_entropy(read_pages(sf_dir))


def _q_events_hourly(sf_dir: str):
    from s2ray.pipelines.analytics import events_hourly

    return events_hourly(sf_dir)


def _q_emb_centroids(sf_dir: str):
    from s2ray.pipelines.analytics import embedding_centroids

    return embedding_centroids(sf_dir)


def _q_events_sliding(sf_dir: str):
    from s2ray.pipelines.analytics import events_sliding

    return events_sliding(sf_dir)


def _q_user_sessions(sf_dir: str):
    from s2ray.pipelines.analytics import user_sessions

    return user_sessions(sf_dir)


def _q_top3_per_city(sf_dir: str):
    from s2ray.pipelines.analytics import top_k_per_region
    from s2ray.pipelines.tiles import pages_with_cells

    ds = pages_with_cells(sf_dir, token_level=None)
    return top_k_per_region(ds, _city_caps(), k=3)


def _q_polyline_near(sf_dir: str):
    from s2ray.pipelines.polyline import Polyline, polyline_distance_join
    from s2ray.pipelines.tiles import pages_with_cells

    line = Polyline.from_latlng_degrees(POLYLINE_DEG)
    ds = pages_with_cells(sf_dir, token_level=None)
    out = polyline_distance_join(ds, line, POLYLINE_MAX_DIST_M,
                                 keep_cols=("page_id",))
    import pyarrow as pa
    import pyarrow.compute as pc

    def round_dist(batch: pa.Table) -> pa.Table:
        d = pc.round(batch["dist_m"], ndigits=3)
        return batch.drop_columns(["dist_m"]).append_column("dist_m", d)

    return out.map_batches(round_dist, batch_format="pyarrow")


BOOL_B_SQ = [(55.75, 37.30), (55.75, 37.65), (56.10, 37.65), (56.10, 37.30)]

# Edge-soup assembly query: each PIP polygon is split into two pieces along
# a meridian (pieces share the cut edge with identical float vertices) and
# shipped as a shuffled directed-edge Dataset; the engine must reassemble
# the regions (S2PolygonBuilder DIRECTED_XOR) before the join.  The oracle
# is the pip SQL of the known 6-vertex union boundary.
ASSEMBLY_SPLIT_FRAC = {"moscow_sq": 0.5, "sydney_sq": 0.35}


def _assembly_geometry():
    from s2ray.pipelines.assembly import split_quad_pieces

    pieces, unions = {}, {}
    for name, loop_deg in PIP_POLYS.items():
        p, u = split_quad_pieces(loop_deg, frac=ASSEMBLY_SPLIT_FRAC[name])
        pieces[name] = p
        unions[name] = u
    return pieces, unions


def _q_assembled_pip_join(sf_dir: str):
    from s2ray.pipelines.assembly import assembled_pip_join

    pieces, _ = _assembly_geometry()
    return assembled_pip_join(sf_dir, pieces, keep_cols=("page_id",))


def _bool_polygons():
    from s2ray.kernel.pip import Polygon
    from s2ray.kernel.polygon_ops import (polygon_difference,
                                          polygon_intersection, polygon_union)

    a = Polygon.from_latlng_loops([PIP_POLYS["moscow_sq"]])
    b = Polygon.from_latlng_loops([BOOL_B_SQ])
    return {
        "inter": polygon_intersection(a, b),
        "union": polygon_union(a, b),
        "diff": polygon_difference(a, b),
    }


def _q_boolean_pip_join(sf_dir: str):
    """Pages inside the EXACT boolean-op result polygons (A n B, A u B,
    A \\ B assembled by kernel/polygon_ops).  Oracle: logical combinations
    of the two INPUT polygons' independent crossing-parity SQL — a true
    end-to-end check of clip/assemble + PIP."""
    from s2ray.pipelines.spatial_join import spatial_join_broadcast
    from s2ray.pipelines.tiles import pages_with_cells

    ds = pages_with_cells(sf_dir, token_level=None)
    return spatial_join_broadcast(ds, _bool_polygons(),
                                  keep_cols=("page_id",))


COVER_REGIONS_MAX_CELLS = 16


def _cover_regions():
    """Deterministic query regions for the covering-membership join: the two
    PIP polygons plus one cap, each tiled by the RegionCoverer."""
    from s2ray.kernel.pip import Polygon
    from s2ray.kernel.region import Cap

    regions = {name: Polygon.from_latlng_loops([loop])
               for name, loop in PIP_POLYS.items()}
    regions["cap_moscow"] = Cap.from_latlng_radius(55.7558, 37.6173, 200000.0)
    return regions


def _cover_intervals():
    from s2ray.kernel import cellid, cellunion
    from s2ray.kernel.coverer import covering_of

    out = {}
    for name, region in _cover_regions().items():
        cov = cellunion.normalize(
            covering_of(region, max_cells=COVER_REGIONS_MAX_CELLS))
        out[name] = (cellid.range_min(cov), cellid.range_max(cov))
    return out


def _q_covering_member_join(sf_dir: str):
    """Pages whose leaf cell lies in each region's covering cell-union
    (the candidate-generation half of every spatial join, SURVEY par.2.8).
    Oracle: independent SQL leaf-cell encoder + the covering's leaf
    intervals as constants (the covering itself is pytest-verified)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from s2ray.pipelines.tiles import pages_with_cells

    iv_ref = ray.put(_cover_intervals())

    def stage(batch: pa.Table, iv_ref=iv_ref) -> pa.Table:
        ivs = ray.get(iv_ref)
        leaf = batch["cell_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pids = batch["page_id"].to_numpy(zero_copy_only=False)
        out_pid, out_reg = [], []
        for name in sorted(ivs):
            lo, hi = ivs[name]
            # searchsorted over sorted disjoint [lo, hi] leaf intervals
            pos = np.searchsorted(lo, leaf, side="right") - 1
            ok = (pos >= 0) & (leaf <= hi[np.clip(pos, 0, len(hi) - 1)])
            out_pid.append(pids[ok])
            out_reg.extend([name] * int(ok.sum()))
        return pa.table({
            "page_id": pa.array(np.concatenate(out_pid)
                                if out_pid else np.array([], dtype=np.int64)),
            "region_id": pa.array(out_reg, type=pa.string()),
        })

    ds = pages_with_cells(sf_dir, token_level=None)
    return ds.map_batches(stage, batch_format="pyarrow", batch_size=None)


def _q_polyline_covering(sf_dir: str):
    """Covering tiles of the query polyline (raster<->vector for curves;
    S2-specific, rows-only, deterministic)."""
    import pandas as pd

    from s2ray.kernel import cellid, cellunion
    from s2ray.kernel.coverer import covering_of
    from s2ray.pipelines.polyline import Polyline

    line = Polyline.from_latlng_degrees(POLYLINE_DEG)
    cov = cellunion.normalize(covering_of(line, max_cells=16))
    toks = cellid.to_token(cov)
    lv = cellid.level(cov)
    return pd.DataFrame({"cell_token": list(toks),
                         "level": [int(x) for x in lv]})


BOOL_COV_CAP = (55.85, 37.75, 30000.0)  # overlaps moscow_sq's NE corner


def _q_boolean_covering(sf_dir: str):
    """Covering-pruned boolean region join: candidates come from the
    boolean_covering cell algebra (cellunion.py — union/intersection carry
    the superset guarantee), then the exact predicates refine.  End-to-end
    gate: a wrong covering loses candidate rows and the hash-exact SQL
    oracle (logical combination of the exact predicates) catches it.
    Output: (page_id, op) for op in (inter, union)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from s2ray.kernel import cellunion
    from s2ray.kernel.pip import Polygon
    from s2ray.kernel.region import Cap
    from s2ray.pipelines.spatial_join import exact_contains
    from s2ray.pipelines.tiles import pages_with_cells

    a = Polygon.from_latlng_loops([PIP_POLYS["moscow_sq"]])
    b = Cap.from_latlng_radius(*BOOL_COV_CAP)
    covs = {
        op: cellunion.normalize(
            cellunion.boolean_covering(a, b, covop, max_cells=64))
        for op, covop in (("union", "union"), ("inter", "intersection"))}
    st_ref = ray.put((covs, a, b))

    def stage(batch: pa.Table, st_ref=st_ref) -> pa.Table:
        covs, a, b = ray.get(st_ref)
        leaf = batch["cell_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        pids = batch["page_id"].to_numpy(zero_copy_only=False)
        out_pid, out_op = [], []
        for op in sorted(covs):
            idx = np.nonzero(cellunion.contains_leaf_ids(covs[op], leaf))[0]
            if not len(idx):
                continue
            in_a = exact_contains(a, lat[idx], lng[idx])
            in_b = exact_contains(b, lat[idx], lng[idx])
            ok = (in_a | in_b) if op == "union" else (in_a & in_b)
            out_pid.append(pids[idx[ok]])
            out_op.extend([op] * int(ok.sum()))
        return pa.table({
            "page_id": pa.array(np.concatenate(out_pid)
                                if out_pid else np.array([], dtype=np.int64)),
            "op": pa.array(out_op, type=pa.string()),
        })

    ds = pages_with_cells(sf_dir, token_level=None)
    return ds.map_batches(stage, batch_format="pyarrow", batch_size=None)


def _setop_unions():
    """Cell unions for the covering set-algebra membership query: two cap
    coverings (pytest-verified constants, same status as _cover_intervals)
    and their get_union/get_intersection results — membership in the
    derived unions is SQL-expressible as OR/AND of the INPUT interval
    predicates, which verifies the set algebra end-to-end."""
    from s2ray.kernel import cellunion
    from s2ray.kernel.coverer import covering_of
    from s2ray.kernel.region import Cap

    a = cellunion.normalize(covering_of(
        Cap.from_latlng_radius(55.7558, 37.6173, 8000.0), max_cells=16))
    b = cellunion.normalize(covering_of(
        Cap.from_latlng_radius(55.80, 37.66, 8000.0), max_cells=16))
    return {
        "a": a,
        "b": b,
        "union": cellunion.get_union(a, b),
        "intersection": cellunion.get_intersection(a, b),
    }


def _setop_intervals():
    """Leaf intervals of :func:`_setop_unions` (the oracle-SQL form)."""
    from s2ray.kernel import cellid

    return {k: (cellid.range_min(v), cellid.range_max(v))
            for k, v in _setop_unions().items()}


def _q_covering_setops(sf_dir: str):
    """Covering set algebra as a membership join: pages whose leaf cell
    lies in covering A, covering B, get_union(A,B), get_intersection(A,B).
    Oracle: leaf-interval predicates of A and B; union == OR, intersection
    == AND (exact because cell-union set ops are exact on leaf sets)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from s2ray.kernel.cellunion import contains_leaf_ids
    from s2ray.pipelines.tiles import pages_with_cells

    cov_ref = ray.put(_setop_unions())

    def stage(batch: pa.Table, cov_ref=cov_ref) -> pa.Table:
        covs = ray.get(cov_ref)
        leaf = batch["cell_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pids = batch["page_id"].to_numpy(zero_copy_only=False)
        out_pid, out_op = [], []
        for op in sorted(covs):
            ok = contains_leaf_ids(covs[op], leaf)
            out_pid.append(pids[ok])
            out_op.extend([op] * int(ok.sum()))
        return pa.table({
            "page_id": pa.array(np.concatenate(out_pid)
                                if out_pid else np.array([], dtype=np.int64)),
            "op": pa.array(out_op, type=pa.string()),
        })

    ds = pages_with_cells(sf_dir, token_level=None)
    return ds.map_batches(stage, batch_format="pyarrow", batch_size=None)


def _relation_regions():
    from s2ray.kernel.pip import Polygon

    def sq(lat0, lng0, size):
        return [(lat0, lng0), (lat0, lng0 + size), (lat0 + size, lng0 + size),
                (lat0 + size, lng0)]

    return {
        "moscow_sq": Polygon.from_latlng_loops([PIP_POLYS["moscow_sq"]]),
        "sydney_sq": Polygon.from_latlng_loops([PIP_POLYS["sydney_sq"]]),
        "moscow_big": Polygon.from_latlng_loops([sq(55.0, 36.8, 1.5)]),
        "europe": Polygon.from_latlng_loops([sq(35.0, -10.0, 30.0)]),
        "ring": Polygon.from_latlng_loops(
            [sq(50.0, 30.0, 15.0), list(reversed(sq(54.0, 35.0, 5.0)))]),
    }


def _q_region_relations(sf_dir: str):
    """Pairwise polygon-polygon relations (contains/intersects/disjoint)
    over a deterministic region set.  Oracle: first-principles SQL
    (four-determinant crossing rule + XOR-parity PIP of vertices)."""
    import pandas as pd

    regions = _relation_regions()
    rows = []
    names = sorted(regions)
    for a in names:
        for b in names:
            if a == b:
                continue
            pa_, pb = regions[a], regions[b]
            if pa_.contains_polygon(pb):
                rel = "contains"
            elif pa_.intersects_polygon(pb):
                rel = "intersects"
            else:
                rel = "disjoint"
            rows.append((a, b, rel))
    return pd.DataFrame(rows, columns=["a", "b", "relation"])


def _q_user_rolling(sf_dir: str):
    """Per-event trailing ROWS-window sum/count (SUM ... OVER ... ROWS
    BETWEEN 3 PRECEDING AND CURRENT ROW), int64-cents exact."""
    from s2ray.pipelines.analytics import user_rolling

    return user_rolling(sf_dir)


def _q_event_transitions(sf_dir: str):
    """Event-type Markov transition counts (distributed LAG + rollup)."""
    from s2ray.pipelines.analytics import event_transitions

    return event_transitions(sf_dir)


def _q_token_edit_pairs(sf_dir: str):
    """FastSS deletion-neighborhood join: all distinct-token pairs at
    byte-Levenshtein distance 1 or 2, with the exact distance."""
    from s2ray.pipelines.text import token_edit_pairs

    return token_edit_pairs(sf_dir)


def _q_cheapest_supplier(sf_dir: str):
    """Group-argmin retrieval join (TPC-H Q2 shape): per part, the
    supplier row(s) at the minimum lineitem price, ties kept."""
    from s2ray.pipelines.join import cheapest_supplier

    return cheapest_supplier(sf_dir)


def _q_event_followups(sf_dir: str):
    """Temporal range-count join: purchases within 7 days after each
    view, per user (0 kept — LEFT-join semantics)."""
    from s2ray.pipelines.analytics import event_followups

    return event_followups(sf_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    """Ordering contract: the driver's CORRECTNESS window checks the FIRST
    50 entries, so positions 1-50 are exactly SQL-oracled queries (every
    one has an oracle_sql() entry and a green in-suite DuckDB gate),
    prioritizing queries with no prior driver verification.  Round-5
    rotation: per the round-4 verdict (task 2) the window is seated with
    the 50 OLDEST never-driver-verified oracled queries (oldest = first
    commit touching the key in __ray_entry__.py; ties broken by dict
    position) -- the round-4 session-6/7 graph and spatial statistics,
    the TPC-H sweep shapes, the relational/stats ops, and the first of
    the late-r4 additions, domain_reciprocity .. domain_components.
    Everything previously driver-green (r01-r04 cumulative: 132
    oracled keys, plus 5 rows-only driver rows on non-oracled keys)
    yields its slot and stays hash-gated in-suite
    (tests/test_oracle.py, all 278 oracles).  No new operators were
    added this round (the verdict paused additions until cumulative
    driver evidence exceeds ~80%): after this window lands, cumulative
    oracled evidence is 182/278.

    Round-6 rotation candidates (remaining never-driver-verified,
    oldest first): order_overlap, bipartite_nn, monthly_centroid,
    lang_centroid_sim, cross_k, doc_percent_rank, city_visits_monthly,
    idw_interpolate, hourly_anomaly, daily_autocorr, and the rest of
    the 96-key queue in the dict order below (everything between
    domain_components and the driver-verified section) -- these should
    lead the r6 window under the same never-verified-first rule, which
    clears the backlog in two further rounds at zero additions.

    The driver-verified oracled queries follow (kept hash-gated
    in-suite), and the 11 inherently non-SQL queries close the dict;
    their rows/schema driver artifact is NONORACLED_r05.json (refreshed
    per round by tools/run_nonoracled.py).
    """
    return {
        # ---- driver window (50): the 50 oldest never-driver-verified
        # oracled queries (round-4 verdict task 2) ----
        "domain_reciprocity": _q_domain_reciprocity,
        "domain_assortativity": _q_domain_assortativity,
        "domain_bfs_depth": _q_domain_bfs_depth,
        "quadrat_dispersion": _q_quadrat_dispersion,
        "source_js": _q_source_js,
        "user_burstiness": _q_user_burstiness,
        "ripley_k": _q_ripley_k,
        "domain_cocitation": _q_domain_cocitation,
        "domain_coupling": _q_domain_coupling,
        "clark_evans": _q_clark_evans,
        "heaps_law": _q_heaps_law,
        "event_type_trend": _q_event_type_trend,
        "source_vocab_jaccard": _q_source_vocab_jaccard,
        "shipping_priority": _q_shipping_priority,
        "geo_destination": _q_geo_destination,
        "location_codec": _q_location_codec,
        "returned_items": _q_returned_items,
        "promo_revenue": _q_promo_revenue,
        "top_supplier": _q_top_supplier,
        "large_orders": _q_large_orders,
        "order_priority_count": _q_order_priority_count,
        "cust_order_dist": _q_cust_order_dist,
        "small_qty_revenue": _q_small_qty_revenue,
        "nation_volume": _q_nation_volume,
        "supplier_parts_cnt": _q_supplier_parts_cnt,
        "idle_customers": _q_idle_customers,
        "forecast_revenue": _q_forecast_revenue,
        "bracket_revenue": _q_bracket_revenue,
        "market_share": _q_market_share,
        "sole_fault_supplier": _q_sole_fault_supplier,
        "source_overlap": _q_source_overlap,
        "pivot_lang_counts": _q_pivot_lang_counts,
        "user_type_matrix": _q_user_type_matrix,
        "value_histogram": _q_value_histogram,
        "user_skyline": _q_user_skyline,
        "latest_event_state": _q_latest_event_state,
        "user_event_paths": _q_user_event_paths,
        "emb_dim_stats": _q_emb_dim_stats,
        "pair_dist_hist": _q_pair_dist_hist,
        "dominant_dim_hist": _q_dominant_dim_hist,
        "nn_g_function": _q_nn_g_function,
        "lang_geo_bbox": _q_lang_geo_bbox,
        "local_moran": _q_local_moran,
        "join_counts": _q_join_counts,
        "tile_mann_kendall": _q_tile_mann_kendall,
        "lang_ellipse": _q_lang_ellipse,
        "product_profit": _q_product_profit,
        "part_concentration": _q_part_concentration,
        "late_shipments": _q_late_shipments,
        "domain_components": _q_domain_components,
        # ---- remaining never-driver-verified oracled queries (96):
        # queued, oldest first, for the round-6 window ----
        "order_overlap": _q_order_overlap,
        "bipartite_nn": _q_bipartite_nn,
        "monthly_centroid": _q_monthly_centroid,
        "lang_centroid_sim": _q_lang_centroid_sim,
        "cross_k": _q_cross_k,
        "doc_percent_rank": _q_doc_percent_rank,
        "city_visits_monthly": _q_city_visits_monthly,
        "idw_interpolate": _q_idw_interpolate,
        "hourly_anomaly": _q_hourly_anomaly,
        "daily_autocorr": _q_daily_autocorr,
        "excess_shippers": _q_excess_shippers,
        "covered_days": _q_covered_days,
        "order_cadence": _q_order_cadence,
        "lexical_simpson": _q_lexical_simpson,
        "anagram_groups": _q_anagram_groups,
        "domain_clustering": _q_domain_clustering,
        "colocation_quotient": _q_colocation_quotient,
        "daily_cusum": _q_daily_cusum,
        "daily_ewma": _q_daily_ewma,
        "rfm_segments": _q_rfm_segments,
        "knox_pairs": _q_knox_pairs,
        "basket_pairs": _q_basket_pairs,
        "peak_window": _q_peak_window,
        "peak_open_orders": _q_peak_open_orders,
        "supplier_lead_time": _q_supplier_lead_time,
        "char_entropy": _q_char_entropy,
        "silhouette_hist": _q_silhouette_hist,
        "events_quantiles_cont": _q_events_quantiles_cont,
        "tile_zipf": _q_tile_zipf,
        "centroid_drift": _q_centroid_drift,
        "user_growth": _q_user_growth,
        "order_size_hist": _q_order_size_hist,
        "token_len_stats": _q_token_len_stats,
        "lang_radius": _q_lang_radius,
        "lang_frontier": _q_lang_frontier,
        "basket_lift": _q_basket_lift,
        "dup_by_length": _q_dup_by_length,
        "activity_curve": _q_activity_curve,
        "langid_mismatch": _q_langid_mismatch,
        "event_trigrams": _q_event_trigrams,
        "customer_concentration": _q_customer_concentration,
        "source_cooccurrence": _q_source_cooccurrence,
        "tile_gini": _q_tile_gini,
        "order_quantiles": _q_order_quantiles,
        "search_rank": _q_search_rank,
        "search_bm25": _q_search_bm25,
        "weekly_ma": _q_weekly_ma,
        "return_rates": _q_return_rates,
        "revenue_growth": _q_revenue_growth,
        "tile_entropy": _q_tile_entropy,
        "doc_lang_runs": _q_doc_lang_runs,
        "nation_flow": _q_nation_flow,
        "voronoi_monthly": _q_voronoi_monthly,
        "geary_c": _q_geary_c,
        "knn_hubness": _q_knn_hubness,
        "benford_law": _q_benford_law,
        "new_vs_repeat": _q_new_vs_repeat,
        "dau_mau": _q_dau_mau,
        "day_user_jaccard": _q_day_user_jaccard,
        "flesch_lang": _q_flesch_lang,
        "mann_whitney_length": _q_mann_whitney_length,
        "log_odds_keywords": _q_log_odds_keywords,
        "bearing_circular": _q_bearing_circular,
        "kaplan_meier": _q_kaplan_meier,
        "textrank_keywords": _q_textrank_keywords,
        "yules_k": _q_yules_k,
        "ks_test_length": _q_ks_test_length,
        "lognormal_fit_length": _q_lognormal_fit_length,
        "weekday_chi2": _q_weekday_chi2,
        "distance_decay": _q_distance_decay,
        "markov_entropy_rate": _q_markov_entropy_rate,
        "vocab_richness": _q_vocab_richness,
        "theil_decomposition": _q_theil_decomposition,
        "pettitt_test": _q_pettitt_test,
        "dup_cluster_purity": _q_dup_cluster_purity,
        "domain_link_jaccard": _q_domain_link_jaccard,
        "rank_corr_qty_discount": _q_rank_corr_qty_discount,
        "containment_pairs": _q_containment_pairs,
        "monthly_lang_js": _q_monthly_lang_js,
        "cramers_v_lang_face": _q_cramers_v_lang_face,
        "cohort_ltv": _q_cohort_ltv,
        "tile_month_jaccard": _q_tile_month_jaccard,
        "kruskal_wallis_qty": _q_kruskal_wallis_qty,
        "user_activity_gini": _q_user_activity_gini,
        "anova_len_by_source": _q_anova_len_by_source,
        "skipgram_pairs": _q_skipgram_pairs,
        "retention_half_life": _q_retention_half_life,
        "lang_tile_jaccard": _q_lang_tile_jaccard,
        "dup_threshold_curve": _q_dup_threshold_curve,
        "rich_club": _q_rich_club,
        "token_dispersion": _q_token_dispersion,
        "morans_i_chars": _q_morans_i_chars,
        "time_to_convert": _q_time_to_convert,
        "token_entropy_rate": _q_token_entropy_rate,
        "revenue_seasonality": _q_revenue_seasonality,
        "zipf_abbreviation": _q_zipf_abbreviation,
        # ---- driver-verified oracled queries (r01-r04 cumulative;
        # still hash-gated in-suite by tests/test_oracle.py) ----
        "weighted_sample": _q_weighted_sample,
        "lang_corr": _q_lang_corr,
        "events_sliding_distinct": _q_events_sliding_distinct,
        "events_weekday_hour": _q_events_weekday_hour,
        "group_sizes_hist": _q_group_sizes_hist,
        "standardize_docs": _q_standardize_docs,
        "events_mad": _q_events_mad,
        "doc_deciles": _q_doc_deciles,
        "cross_lang_nn": _q_cross_lang_nn,
        "user_streaks": _q_user_streaks,
        "source_mix": _q_source_mix,
        "langid_confusion": _q_langid_confusion,
        "emb_integrity": _q_emb_integrity,
        "tile_growth": _q_tile_growth,
        "grid_smooth": _q_grid_smooth,
        "morans_i": _q_morans_i,
        "grid_kde": _q_grid_kde,
        "getis_ord": _q_getis_ord,
        "domain_link_graph": _q_domain_link_graph,
        "domain_pagerank": _q_domain_pagerank,
        "event_cooccurrence": _q_event_cooccurrence,
        "domain_triangles": _q_domain_triangles,
        "phrase_search": _q_phrase_search,
        "session_entry_exit": _q_session_entry_exit,
        "profile_table": _q_profile_table,
        "domain_hits": _q_domain_hits,
        "source_drift_psi": _q_source_drift_psi,
        "domain_gini": _q_domain_gini,
        "chi2_lang_source": _q_chi2_lang_source,
        "zipf_slope": _q_zipf_slope,
        "knn_graph": _q_knn_graph,
        "vocab_coverage": _q_vocab_coverage,
        "user_rolling": _q_user_rolling,
        "event_transitions": _q_event_transitions,
        "token_edit_pairs": _q_token_edit_pairs,
        "cheapest_supplier": _q_cheapest_supplier,
        "event_followups": _q_event_followups,
        "ngram_novelty": _q_ngram_novelty,
        "domain_lang_entropy": _q_domain_lang_entropy,
        "tile_centroids": _q_tile_centroids,
        "boolean_pip_join": _q_boolean_pip_join,
        "assembled_pip_join": _q_assembled_pip_join,
        "text_stats": _q_text_stats,
        "events_asof": _q_events_asof,
        "near_dup_clusters": _q_near_dup_clusters,
        "events_quantiles": _q_events_quantiles,
        "tile_pyramid": _q_tile_pyramid,
        "region_relations": _q_region_relations,
        "cap_join": _q_cap_join,
        "exact_dedup": _q_exact_dedup,
        "pip_join": _q_pip_join,
        "corpus_keep": _q_corpus_keep,
        "rect_filter": _q_rect_filter,
        "user_sessions": _q_user_sessions,
        "events_distinct_users": _q_events_distinct,
        "vocab_top100": _q_vocab,
        "token_counts": _q_token_counts,
        "polyline_near": _q_polyline_near,
        "minhash_pairs": _q_minhash_pairs,
        "emb_near_dup_lsh": _q_emb_near_dup_lsh,
        "lsh_knn": _q_lsh_knn,
        "knn_embeddings": _q_knn_embeddings,
        "text_identity": _q_text_identity,
        "knn_moscow": _q_knn,
        "covering_member_join": _q_covering_member_join,
        "near_dup_pairs": _q_near_dup_pairs,
        "pages_per_lang": _q_pages_per_lang,
        "events_hourly": _q_events_hourly,
        "emb_norm_by_lang": _q_emb_norm_by_lang,
        "rect_filter_wrap": _q_rect_filter_wrap,
        "cap_join_shuffle": _q_cap_join_shuffle,
        "knn_pruned_moscow": _q_knn_pruned,
        "pages_per_month": _q_pages_per_month,
        "tile_counts_l8": _q_tile_counts,
        "adaptive_tiles": _q_adaptive_tiles,
        "tile_quantiles": _q_tile_quantiles,
        "tile_diversity": _q_tile_diversity,
        "distance_join": _q_distance_join,
        "nearest_neighbor": _q_nearest_neighbor,
        "nearest_city_stats": _q_nearest_city,
        "bearing_sectors": _q_bearing_sectors,
        "rect_distance_rank": _q_rect_distance_rank,
        "fingerprint": _q_fingerprint,
        "zonal_stats": _q_zonal_stats,
        "grid_clusters": _q_grid_clusters,
        "tile_top_lang": _q_tile_top_lang,
        "covering_setops": _q_covering_setops,
        "boolean_covering": _q_boolean_covering,
        "doc_perplexity": _q_doc_perplexity,
        "revenue_by_nation": _q_revenue_by_nation,
        "pricing_summary": _q_pricing_summary,
        "props_field_stats": _q_props_field_stats,
        "event_gaps": _q_event_gaps,
        "cohort_retention": _q_cohort_retention,
        "events_winsorized": _q_events_winsorized,
        "dup_degree_hist": _q_dup_degree_hist,
        "dup_span_stats": _q_dup_span_stats,
        "cosine_sim_pairs": _q_cosine_sim,
        "session_quantiles": _q_session_quantiles,
        "decontaminate_bloom": _q_decontaminate_bloom,
        "quantize_embeddings": _q_quantize_embeddings,
        "knn_bulk": _q_knn_bulk,
        "redact_pii": _q_redact_pii,
        "inverted_index": _q_inverted_index,
        "heavy_hitters_top100": _q_heavy_hitters,
        "token_doc_freq": _q_token_df,
        "tfidf_top3": _q_tfidf,
        "decontaminate": _q_decontaminate,
        "chunk_dedup": _q_chunk_dedup,
        "new_docs": _q_new_docs,
        "pack_examples": _q_pack_examples,
        "doc_token_rank": _q_doc_token_rank,
        "docs_rollup": _q_docs_rollup,
        "split_corpus": _q_split_corpus,
        "normalize_text": _q_normalize_text,
        "rare_tokens": _q_rare_tokens,
        "pmi_collocations": _q_pmi_collocations,
        "funnel_views": _q_funnel,
        "repetition_stats": _q_repetition,
        "chunk_docs": _q_chunks,
        "quality_above_median": _q_quality_above_median,
        "quality_score": _q_quality,
        "lang_id": _q_lang_id,
        "url_domain_counts": _q_url_domains,
        "events_sliding": _q_events_sliding,
        "event_windows": _q_event_windows,
        "top3_per_city": _q_top3_per_city,
        "emb_centroids": _q_emb_centroids,
        "sample_corpus": _q_sample_corpus,
        "sample_per_lang": _q_sample_per_lang,
        "simhash_pairs": _q_simhash_pairs,
        "emb_near_dup": _q_emb_near_dup,
        # ---- inherently non-SQL queries (rows/schema artifact:
        # NONORACLED_r05.json via tools/run_nonoracled.py) ----
        "events_distinct_users_hll": _q_events_distinct_users_hll,
        "events_quantiles_sketch": _q_events_quantiles_sketch,
        "polygon_covering": _q_polygon_covering,
        "polyline_covering": _q_polyline_covering,
        "media_stats": _q_media_stats,
        "media_pixel_dedup": _q_media_pixel_dedup,
        "audio_stats": _q_audio_stats,
        "ivf_knn": _q_ivf_knn,
        "cross_lang_nn_bucketed": _q_cross_lang_nn_bucketed,
        "semantic_dedup": _q_semantic_dedup,
        "bpe_token_counts": _q_bpe_token_counts,
    }


def _source_mix_oracle() -> str:
    # n / total is ONE float64 division and IEEE sqrt is correctly
    # rounded, so both engines floor the identical double; the keep rule
    # is the shared splitmix hash_bp mirror
    from s2ray.pipelines.sampling import hash_bp_sql

    return f"""
WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n
           FROM documents GROUP BY source),
t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
r AS (SELECT source, n,
             CAST(floor(sqrt(n / (SELECT total FROM t)) * 10000)
                  AS BIGINT) AS rate_bp
      FROM c),
k AS (SELECT d.source AS source, CAST(count(*) AS BIGINT) AS n_kept
      FROM documents d JOIN r ON r.source IS NOT DISTINCT FROM d.source
      WHERE {hash_bp_sql('d.doc_id')} < r.rate_bp
      GROUP BY d.source)
SELECT r.source AS source, r.n AS n_docs, r.rate_bp AS rate_bp,
       coalesce(k.n_kept, 0) AS n_kept
FROM r LEFT JOIN k ON k.source IS NOT DISTINCT FROM r.source"""


def _sample_per_lang_oracle() -> str:
    from s2ray.pipelines.sampling import sample_n_per_group_sql

    return sample_n_per_group_sql(10)


def _normalize_text_oracle() -> str:
    from s2ray.pipelines.text import normalize_text_sql

    expr = normalize_text_sql("coalesce(text, '')")
    return ("SELECT doc_id, " + expr
            + " AS norm_text, CAST(length(coalesce(text, '')) AS BIGINT) "
            + "AS n_chars, CAST(length(" + expr
            + ") AS BIGINT) AS n_norm_chars FROM documents")


def _split_corpus_oracle() -> str:
    from s2ray.pipelines.sampling import split_corpus_sql

    return split_corpus_sql()


def _sample_corpus_oracle() -> str:
    from s2ray.pipelines.sampling import sample_corpus_sql

    return sample_corpus_sql(SAMPLE_RATES_BP)


def _weighted_sample_oracle() -> str:
    from s2ray.pipelines.sampling import weighted_sample_sql

    return weighted_sample_sql()


def _lang_corr_oracle() -> str:
    from s2ray.pipelines.analytics import corr_by_group_sql

    return corr_by_group_sql()


def _sliding_distinct_oracle() -> str:
    from s2ray.pipelines.analytics import events_sliding_distinct_sql

    return events_sliding_distinct_sql()


def _token_counts_oracle() -> str:
    from s2ray.pipelines.text import token_counts_sql

    ce = "coalesce(text, '')"
    return f"SELECT doc_id, {token_counts_sql(ce)} FROM documents"


def _pages_cte() -> str:
    from s2ray.sources.pages import pages_sql_cte

    return "WITH " + pages_sql_cte(repl=1)


def oracle_sql() -> dict[str, str]:
    from s2ray.functions.sqlgen import (polygon_relations_select,
                                        polyline_distance_select,
                                        s2_cell_select)
    from s2ray.pipelines.analytics import (CHI2_LANG_SOURCE_SQL,
                                           DAILY_AUTOCORR_SQL,
                                           DAILY_CUSUM_SQL,
                                           daily_ewma_sql,
                                           rfm_segments_sql,
                                           peak_window_sql,
                                           USER_GROWTH_SQL,
                                           DAU_MAU_SQL,
                                           DAY_USER_JACCARD_SQL,
                                           ACTIVITY_CURVE_SQL,
                                           EVENT_TRIGRAMS_SQL,
                                           weekly_ma_sql,
                                           DOC_LANG_RUNS_SQL,
                                           MANN_WHITNEY_LENGTH_SQL,
                                           KAPLAN_MEIER_SQL,
                                           KS_TEST_LENGTH_SQL,
                                           LOGNORMAL_FIT_LENGTH_SQL,
                                           WEEKDAY_CHI2_SQL,
                                           MARKOV_ENTROPY_RATE_SQL,
                                           PETTITT_TEST_SQL,
                                           COHORT_LTV_SQL,
                                           USER_ACTIVITY_GINI_SQL,
                                           RETENTION_HALF_LIFE_SQL,
                                           time_to_convert_sql,
                                           ANOVA_LEN_BY_SOURCE_SQL,
                                           HOURLY_ANOMALY_SQL,
                                           DOMAIN_GINI_SQL,
                                           EVENT_TRANSITIONS_SQL,
                                           EVENT_TYPE_TREND_SQL,
                                           SESSION_ENTRY_EXIT_SQL,
                                           zipf_slope_sql,
                                           event_followups_sql,
                                           profile_table_sql,
                                           source_drift_psi_sql,
                                           LATEST_EVENT_STATE_SQL,
                                           USER_BURSTINESS_SQL,
                                           USER_SKYLINE_SQL,
                                           user_event_paths_sql,
                                           user_rolling_sql,
                                           value_histogram_sql)
    from s2ray.pipelines.join import (CHEAPEST_SUPPLIER_SQL,
                                      RANK_CORR_QTY_DISCOUNT_SQL,
                                      KRUSKAL_WALLIS_QTY_SQL,
                                      REVENUE_SEASONALITY_SQL,
                                       bracket_revenue_sql,
                                       cust_order_dist_sql,
                                       forecast_revenue_sql,
                                       idle_customers_sql,
                                       large_orders_sql,
                                       excess_shippers_sql,
                                       covered_days_sql,
                                       basket_pairs_sql,
                                       basket_lift_sql,
                                       peak_open_orders_sql,
                                       SUPPLIER_LEAD_TIME_SQL,
                                       ORDER_SIZE_HIST_SQL,
                                       customer_concentration_sql,
                                       return_rates_sql,
                                       REVENUE_GROWTH_SQL,
                                       BENFORD_LAW_SQL,
                                       NEW_VS_REPEAT_SQL,
                                       NATION_FLOW_SQL,
                                       ORDER_CADENCE_SQL,
                                       late_shipments_sql,
                                       market_share_sql,
                                       nation_volume_sql,
                                       order_overlap_sql,
                                       order_priority_count_sql,
                                       part_concentration_sql,
                                       product_profit_sql,
                                       promo_revenue_sql,
                                       returned_items_sql,
                                       shipping_priority_sql,
                                       small_qty_revenue_sql,
                                       sole_fault_supplier_sql,
                                       supplier_parts_cnt_sql,
                                       top_supplier_sql)
    from s2ray.pipelines.ann import (DOMINANT_DIM_HIST_SQL,
                                     EMB_DIM_STATS_SQL,
                                     LANG_CENTROID_SIM_SQL,
                                     SILHOUETTE_HIST_SQL)
    from s2ray.pipelines.relational import (pivot_lang_counts_sql,
                                            source_overlap_sql,
                                            user_type_matrix_sql)
    from s2ray.pipelines.spatial_join import (destination_points_sql,
                                              location_codec_sql)
    from s2ray.pipelines.polyline import Polyline
    from s2ray.pipelines.dedup import (DUP_BY_LENGTH_SQL,
                                       source_cooccurrence_sql)
    from s2ray.pipelines.text import (CHAR_ENTROPY_SQL,
                                      FLESCH_LANG_SQL,
                                      YULES_K_SQL,
                                      VOCAB_RICHNESS_SQL,
                                      TOKEN_LEN_STATS_SQL,
                                      LEXICAL_SIMPSON_SQL,
                                      SOURCE_VOCAB_JACCARD_SQL,
                                      TOKEN_EDIT_PAIRS_SQL,
                                      anagram_groups_sql, heaps_law_sql,
                                      log_odds_keywords_sql,
                                      textrank_keywords_sql,
                                      skipgram_pairs_sql,
                                      token_dispersion_sql,
                                      TOKEN_ENTROPY_RATE_SQL,
                                      ZIPF_ABBREVIATION_SQL,
                                      search_rank_sql,
                                      search_bm25_sql,
                                      phrase_search_sql,
                                      source_js_divergence_sql)
    from s2ray.pipelines.webgraph import (domain_assortativity_sql,
                                          domain_clustering_sql,
                                          domain_bfs_depth_sql,
                                          domain_components_sql,
                                          domain_cocitation_sql,
                                          domain_link_jaccard_sql,
                                          rich_club_sql,
                                          domain_coupling_sql,
                                          domain_hits_sql,
                                          domain_reciprocity_sql)

    cte = _pages_cte()
    # flagship: level-8 tile counts, cell id/token from the independent SQL
    # Hilbert encoder (bit-parity with the numpy kernel is itself pytest-
    # checked in tests/test_oracle.py)
    tile_zipf_sql = (
        f"{cte}, tc AS (SELECT cell_token, CAST(count(*) AS BIGINT) AS n "
        "FROM (" + s2_cell_select("SELECT lat, lng FROM pages_geo",
                                  level=8)
        + ") GROUP BY 1), "
        "r AS (SELECT n, row_number() OVER (ORDER BY n DESC, cell_token)"
        " AS i FROM tc), "
        "m AS (SELECT CAST(count(*) AS BIGINT) AS v, "
        "CAST(coalesce(sum(n), 0) AS BIGINT) AS total, "
        "CAST(count(*) AS DOUBLE) AS nf, "
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list(ln(CAST(i AS DOUBLE)) ORDER BY i)), (x, y) -> x + y) AS sx,"
        " list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list(ln(CAST(n AS DOUBLE)) ORDER BY i)), (x, y) -> x + y) AS sy,"
        " list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list(ln(CAST(i AS DOUBLE)) * ln(CAST(i AS DOUBLE)) ORDER BY i)),"
        " (x, y) -> x + y) AS sxx, "
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list(ln(CAST(i AS DOUBLE)) * ln(CAST(n AS DOUBLE)) ORDER BY i)),"
        " (x, y) -> x + y) AS sxy FROM r) "
        "SELECT v AS n_tiles, total AS total_pages, "
        "CASE WHEN v = 0 OR nf * sxx - sx * sx = 0.0 THEN NULL ELSE "
        "round((nf * sxy - sx * sy) / (nf * sxx - sx * sx), 6) END "
        "AS slope, "
        "CASE WHEN v = 0 OR nf * sxx - sx * sx = 0.0 THEN NULL ELSE "
        "round((sy - ((nf * sxy - sx * sy) / (nf * sxx - sx * sx)) * sx)"
        " / nf, 6) END AS intercept FROM m"
    )
    # month-over-month JS drift of the language mix: order-pinned
    # ascending-lang folds over the global language grid (source_js's
    # exact element op order), month from the synthetic warc_ts rule
    _pjs = "(CAST(na AS DOUBLE) / CAST(pt AS DOUBLE))"
    _qjs = "(CAST(nb AS DOUBLE) / CAST(t AS DOUBLE))"
    _mjs = f"(0.5 * ({_pjs} + {_qjs}))"
    _eljs = (f"(CASE WHEN na > 0 THEN 0.5 * ({_pjs} * ln({_pjs} / {_mjs}))"
             f" ELSE 0.0 END + "
             f"CASE WHEN nb > 0 THEN 0.5 * ({_qjs} * ln({_qjs} / {_mjs}))"
             f" ELSE 0.0 END)")
    _face_case = ("CASE substr(cell_token, 1, 1) "
                  + " ".join(f"WHEN '{x:x}' THEN {x >> 1}"
                             for x in range(12))
                  + " END")
    monthly_lang_js_sql = f"""
{cte},
pl AS (SELECT date_trunc('month', make_timestamp(
         (1704067200 + (page_id * 40499) % 31536000) * 1000000))
         AS month, lang
       FROM pages_geo WHERE lang IS NOT NULL),
ml AS (SELECT month, lang, CAST(count(*) AS BIGINT) AS n
       FROM pl GROUP BY 1, 2),
mt AS (SELECT month, CAST(sum(n) AS BIGINT) AS t FROM ml GROUP BY 1),
sq AS (SELECT month, t, lag(month) OVER (ORDER BY month) AS pm,
              lag(t) OVER (ORDER BY month) AS pt FROM mt),
langs AS (SELECT DISTINCT lang FROM ml),
grid AS (SELECT s.month, s.t, s.pt, l.lang,
                CAST(coalesce(b.n, 0) AS BIGINT) AS nb,
                CAST(coalesce(a.n, 0) AS BIGINT) AS na
         FROM sq s CROSS JOIN langs l
         LEFT JOIN ml b ON b.month = s.month AND b.lang = l.lang
         LEFT JOIN ml a ON a.month = s.pm AND a.lang = l.lang
         WHERE s.pm IS NOT NULL),
f AS (SELECT month, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        list({_eljs} ORDER BY lang)), (x, y) -> x + y) AS js
      FROM grid GROUP BY month, t, pt)
SELECT mt.month AS month, mt.t AS n_pages, round(f.js, 6) AS js_prev
FROM mt LEFT JOIN f ON f.month = mt.month ORDER BY month"""
    # Cramer's V of lang x cube face: zero-filled grid fold ordered by
    # (lang, face), theil's nibble face rule, mirrored sqrt chain
    cramers_sql = (
        f"{cte}, tc AS (SELECT lang, {_face_case} AS face, "
        "CAST(count(*) AS BIGINT) AS n FROM ("
        + s2_cell_select("SELECT lat, lng, lang FROM pages_geo "
                         "WHERE lang IS NOT NULL", level=8)
        + ") GROUP BY 1, 2), "
        "langs AS (SELECT DISTINCT lang FROM tc), "
        "faces AS (SELECT DISTINCT face FROM tc), "
        "rt AS (SELECT lang, CAST(sum(n) AS BIGINT) AS rt FROM tc "
        "GROUP BY 1), "
        "ct AS (SELECT face, CAST(sum(n) AS BIGINT) AS ct FROM tc "
        "GROUP BY 1), "
        "nn AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n, "
        "CAST(count(DISTINCT lang) AS BIGINT) AS r, "
        "CAST(count(DISTINCT face) AS BIGINT) AS c FROM tc), "
        "grid AS (SELECT l.lang, fs.face, rt.rt, ct.ct, "
        "CAST(coalesce(tc.n, 0) AS BIGINT) AS o "
        "FROM langs l CROSS JOIN faces fs "
        "JOIN rt ON rt.lang = l.lang JOIN ct ON ct.face = fs.face "
        "LEFT JOIN tc ON tc.lang = l.lang AND tc.face = fs.face), "
        "f AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list((CAST(o AS DOUBLE) "
        "- (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)) "
        "/ (SELECT CAST(n AS DOUBLE) FROM nn)) "
        "* (CAST(o AS DOUBLE) "
        "- (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)) "
        "/ (SELECT CAST(n AS DOUBLE) FROM nn)) "
        "/ ((CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)) "
        "/ (SELECT CAST(n AS DOUBLE) FROM nn)) "
        "ORDER BY lang, face)), (x, y) -> x + y) AS chi2 FROM grid) "
        "SELECT nn.n AS n_pages, nn.r AS n_langs, nn.c AS n_faces, "
        "CASE WHEN nn.n = 0 OR nn.r <= 1 OR nn.c <= 1 THEN NULL "
        "ELSE round(f.chi2, 6) END AS chi2, "
        "CASE WHEN nn.n = 0 OR nn.r <= 1 OR nn.c <= 1 THEN NULL "
        "ELSE round(sqrt(f.chi2 / (CAST(nn.n AS DOUBLE) "
        "* CAST(least(nn.r, nn.c) - 1 AS DOUBLE))), 6) END AS cramers_v "
        "FROM nn CROSS JOIN f"
    )
    # month-over-month occupied-tile Jaccard: distinct (month, token)
    # grid; strict previous-calendar-month comparison (gap -> NULL)
    tile_month_jaccard_sql = (
        f"{cte}, tl AS (SELECT DISTINCT "
        "date_trunc('month', make_timestamp("
        "(1704067200 + (page_id * 40499) % 31536000) * 1000000)) "
        "AS month, "
        "CAST(date_diff('month', TIMESTAMP '1970-01-01', "
        "date_trunc('month', make_timestamp("
        "(1704067200 + (page_id * 40499) % 31536000) * 1000000))) "
        "AS BIGINT) AS mi, cell_token FROM ("
        + s2_cell_select("SELECT lat, lng, page_id FROM pages_geo",
                         level=8)
        + ")), "
        "mt AS (SELECT month, mi, CAST(count(*) AS BIGINT) AS n "
        "FROM tl GROUP BY 1, 2), "
        "iv AS (SELECT a.mi, CAST(count(*) AS BIGINT) AS ni "
        "FROM tl a JOIN tl b ON b.cell_token = a.cell_token "
        "AND b.mi = a.mi - 1 GROUP BY 1) "
        "SELECT t.month AS month, t.n AS n_tiles, "
        "CASE WHEN p.n IS NULL THEN NULL "
        "ELSE coalesce(iv.ni, 0) END AS n_common_prev, "
        "CASE WHEN p.n IS NULL THEN NULL "
        "ELSE round(CAST(coalesce(iv.ni, 0) AS DOUBLE) "
        "/ CAST(t.n + p.n - coalesce(iv.ni, 0) AS DOUBLE), 6) END "
        "AS jaccard_prev "
        "FROM mt t LEFT JOIN mt p ON p.mi = t.mi - 1 "
        "LEFT JOIN iv ON iv.mi = t.mi ORDER BY t.month"
    )
    # pairwise language tile-set Jaccard: distinct (lang, token) grid,
    # all ordered language pairs (zero-overlap rows kept)
    lang_tile_jaccard_sql = (
        f"{cte}, tl AS (SELECT DISTINCT lang, cell_token FROM ("
        + s2_cell_select("SELECT lat, lng, lang FROM pages_geo "
                         "WHERE lang IS NOT NULL", level=8)
        + ")), "
        "deg AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM tl "
        "GROUP BY 1), "
        "cm AS (SELECT a.lang AS l1, b.lang AS l2, "
        "CAST(count(*) AS BIGINT) AS ni "
        "FROM tl a JOIN tl b ON a.cell_token = b.cell_token "
        "AND a.lang < b.lang GROUP BY 1, 2) "
        "SELECT d1.lang AS lang1, d2.lang AS lang2, "
        "d1.n AS n_tiles_1, d2.n AS n_tiles_2, "
        "CAST(coalesce(cm.ni, 0) AS BIGINT) AS n_common, "
        "CASE WHEN d1.n + d2.n - coalesce(cm.ni, 0) = 0 THEN NULL "
        "ELSE round(CAST(coalesce(cm.ni, 0) AS DOUBLE) "
        "/ CAST(d1.n + d2.n - coalesce(cm.ni, 0) AS DOUBLE), 6) END "
        "AS jaccard "
        "FROM deg d1 JOIN deg d2 ON d1.lang < d2.lang "
        "LEFT JOIN cm ON cm.l1 = d1.lang AND cm.l2 = d2.lang "
        "ORDER BY lang1, lang2"
    )
    tile_counts_sql = (
        f"{cte} SELECT cell_id, cell_token, count(*) AS n_pages FROM ("
        + s2_cell_select("SELECT lat, lng FROM pages_geo", level=8)
        + ") GROUP BY cell_id, cell_token"
    )
    # quadrat dispersion: HUGEINT moments over the same l8 encoder counts;
    # vmr = (T*S2 - S^2)/(T*S) exact-int num/den, one CAST-then-divide
    quadrat_dispersion_sql = (
        f"{cte}, tc AS (SELECT CAST(count(*) AS HUGEINT) AS c FROM ("
        + s2_cell_select("SELECT lat, lng FROM pages_geo", level=8)
        + ") GROUP BY cell_id), m AS (SELECT "
        "CAST(count(*) AS HUGEINT) AS t, "
        "CAST(coalesce(sum(c), 0) AS HUGEINT) AS s, "
        "CAST(coalesce(sum(c * c), 0) AS HUGEINT) AS s2 FROM tc) "
        "SELECT CAST(t AS BIGINT) AS n_tiles, CAST(s AS BIGINT) AS n_pages, "
        "CASE WHEN t * s = 0 THEN NULL ELSE "
        "round(CAST(t * s2 - s * s AS DOUBLE) / CAST(t * s AS DOUBLE), 6) "
        "END AS vmr FROM m"
    )
    # per-tile diversity: page count + exact distinct languages per cell
    tile_diversity_sql = (
        f"{cte} SELECT cell_token, CAST(count(*) AS BIGINT) AS n_pages, "
        "CAST(count(DISTINCT lang) AS BIGINT) AS n_langs FROM ("
        + s2_cell_select("SELECT lang, lat, lng FROM pages_geo",
                         level=TILE_Q_LEVEL)
        + ") GROUP BY cell_token"
    )
    # per-tile text-length quantiles: the independent SQL S2 encoder at
    # level 6 + quantile_disc, mirroring the engine's exact 3-pass pick
    tile_quantiles_sql = (
        f"{cte}, enc AS (SELECT cell_token, "
        "CAST(length(text) AS DOUBLE) AS v FROM ("
        + s2_cell_select("SELECT text, lat, lng FROM pages_geo",
                         level=TILE_Q_LEVEL)
        + ")) SELECT cell_token, unnest(["
        + ", ".join(f"{q!r}" for q in TILE_QS)
        + "]) AS q, unnest(quantile_disc(v, ["
        + ", ".join(f"{q!r}" for q in TILE_QS)
        + "])) AS value FROM enc GROUP BY cell_token"
    )
    # pyramid rollup: the l8 SQL encoder output materialized once, coarser
    # levels derived by pure cell-id bit algebra (parent = clear low bits,
    # set new lsb) — independent of the engine's kernel parent()
    fine = max(PYRAMID_LEVELS)
    pyr_selects = [
        f"SELECT CAST({fine} AS BIGINT) AS level, cell_id, cell_token, "
        f"count(*) AS n_pages FROM _enc8 GROUP BY 2, 3"
    ]
    for lv in sorted(PYRAMID_LEVELS, reverse=True):
        if lv == fine:
            continue
        shift = 2 * (30 - lv)
        lsb = 1 << shift
        assert shift % 4 == 0, "token shortcut needs even level"
        nd = (64 - shift) // 4
        pid = (f"(cell_id - (cell_id % CAST('{2 * lsb}' AS UBIGINT)) "
               f"+ CAST('{lsb}' AS UBIGINT))")
        pyr_selects.append(
            f"SELECT CAST({lv} AS BIGINT) AS level, pid AS cell_id, "
            f"printf('%0{nd}x', CAST(pid >> {shift} AS BIGINT)) AS cell_token, "
            f"count(*) AS n_pages FROM (SELECT {pid} AS pid FROM _enc8) "
            f"GROUP BY 2"
        )
    tile_pyramid_sql = (
        f"{cte}, _enc8 AS MATERIALIZED (SELECT cell_id, cell_token FROM ("
        + s2_cell_select("SELECT lat, lng FROM pages_geo", level=fine)
        + ")) " + " UNION ALL ".join(pyr_selects)
    )
    # covering-membership join: SQL leaf encoder + covering leaf intervals
    # (query-geometry constants, like the pip_join plane coefficients)
    member_selects = []
    enc30 = s2_cell_select("SELECT page_id, lat, lng FROM pages_geo",
                           level=30, token_col="_tok", id_col="leaf_id")
    for name, (lo, hi) in sorted(_cover_intervals().items()):
        ranges = " OR ".join(
            f"(leaf_id >= CAST('{int(l)}' AS UBIGINT) AND "
            f"leaf_id <= CAST('{int(h)}' AS UBIGINT))"
            for l, h in zip(lo, hi))
        member_selects.append(
            f"SELECT page_id, '{name}' AS region_id FROM _enc "
            f"WHERE {ranges}")
    covering_member_sql = (
        f"{cte}, _enc AS MATERIALIZED (SELECT page_id, leaf_id FROM "
        f"({enc30})) " + " UNION ALL ".join(member_selects))
    # boolean ops: engine tests membership in the ASSEMBLED polygons; the
    # oracle combines the two INPUT polygons' pip expressions logically
    from s2ray.kernel.pip import Loop
    from s2ray.pipelines.spatial_join import loop_pip_sql

    la = Loop.from_latlng_degrees(PIP_POLYS["moscow_sq"])
    lb = Loop.from_latlng_degrees(BOOL_B_SQ)
    ea = loop_pip_sql(la, lat_expr="radians(lat)", lng_expr="radians(lng)")
    eb = loop_pip_sql(lb, lat_expr="radians(lat)", lng_expr="radians(lng)")
    bool_selects = [
        f"SELECT page_id, 'inter' AS region_id FROM pages_geo "
        f"WHERE ({ea}) AND ({eb})",
        f"SELECT page_id, 'union' AS region_id FROM pages_geo "
        f"WHERE ({ea}) OR ({eb})",
        f"SELECT page_id, 'diff' AS region_id FROM pages_geo "
        f"WHERE ({ea}) AND NOT ({eb})",
    ]
    boolean_pip_sql = f"{cte} " + " UNION ALL ".join(bool_selects)
    # covering set algebra: leaf membership in get_union/get_intersection
    # of two cell unions == OR/AND of the INPUT interval predicates
    setop_iv = _setop_intervals()

    def _iv_pred(name):
        lo, hi = setop_iv[name]
        return " OR ".join(
            f"(leaf_id >= CAST('{int(l)}' AS UBIGINT) AND "
            f"leaf_id <= CAST('{int(h)}' AS UBIGINT))"
            for l, h in zip(lo, hi))

    pa_, pb_ = _iv_pred("a"), _iv_pred("b")
    setop_selects = [
        f"SELECT page_id, 'a' AS op FROM _enc WHERE {pa_}",
        f"SELECT page_id, 'b' AS op FROM _enc WHERE {pb_}",
        f"SELECT page_id, 'union' AS op FROM _enc WHERE ({pa_}) OR ({pb_})",
        f"SELECT page_id, 'intersection' AS op FROM _enc "
        f"WHERE ({pa_}) AND ({pb_})",
    ]
    covering_setops_sql = (
        f"{cte}, _enc AS MATERIALIZED (SELECT page_id, leaf_id FROM "
        f"({enc30})) " + " UNION ALL ".join(setop_selects))
    # boolean covering join: exact predicates (pip + cap chord test, the
    # same float op order as Polygon.contains / Cap.contains_points)
    from s2ray.kernel.region import Cap as _Cap

    bcap = _Cap.from_latlng_radius(*BOOL_COV_CAP)
    axx, axy, axz = (repr(float(t)) for t in bcap.axis)
    cap_pred = (
        f"(({axx} - _px) * ({axx} - _px) + ({axy} - _py) * ({axy} - _py) + "
        f"({axz} - _pz) * ({axz} - _pz)) <= {2 * bcap.height!r}"
    )
    bool_cov_pt = ("SELECT page_id, lat, lng, "
                   "cos(radians(lat)) * cos(radians(lng)) AS _px, "
                   "cos(radians(lat)) * sin(radians(lng)) AS _py, "
                   "sin(radians(lat)) AS _pz FROM pages_geo")
    bool_cov_selects = [
        f"SELECT page_id, 'inter' AS op FROM _bpt "
        f"WHERE ({ea}) AND ({cap_pred})",
        f"SELECT page_id, 'union' AS op FROM _bpt "
        f"WHERE ({ea}) OR ({cap_pred})",
    ]
    boolean_covering_sql = (f"{cte}, _bpt AS MATERIALIZED ({bool_cov_pt}) "
                            + " UNION ALL ".join(bool_cov_selects))
    # polyline distance join: per-segment getDistance mirrored in SQL
    line = Polyline.from_latlng_degrees(POLYLINE_DEG)
    polyline_near_sql = (
        f"{cte} SELECT page_id, round(dist_m, 3) AS dist_m FROM ("
        + polyline_distance_select("SELECT page_id, lat, lng FROM pages_geo",
                                   line)
        + f") WHERE dist_m <= {POLYLINE_MAX_DIST_M!r}"
    )
    rect = (
        f"{cte} SELECT page_id, url, lat, lng FROM pages_geo "
        f"WHERE lat >= {RECT['lat_lo']} AND lat <= {RECT['lat_hi']} "
        f"AND lng >= {RECT['lng_lo']} AND lng <= {RECT['lng_hi']}"
    )
    # haversine with the exact reference op order (SmokeTest.php:12-21)
    dist = (
        "2 * 6371000 * asin(sqrt("
        f"(1 - cos(radians(lat) - radians({KNN_Q['qlat']}))) / 2 "
        f"+ cos(radians(lat)) * cos(radians({KNN_Q['qlat']})) "
        f"* (1 - cos(radians(lng) - radians({KNN_Q['qlng']}))) / 2))"
    )
    knn = (
        f"{cte} SELECT page_id, url, round({dist}, 3) AS dist_m "
        f"FROM pages_geo ORDER BY {dist}, page_id LIMIT {KNN_Q['k']}"
    )
    # compass-sector rollup: the reference SmokeTest bearing formula
    # (sphere.great_circle_bearing) mirrored term by term; identical
    # doubles -> identical floor sectors on both engines
    _bw = 360.0 / BEARING_SECTORS
    bearing_sql = f"""
{cte},
brg AS (SELECT degrees(atan2(
          sin(radians(lng) - radians({KNN_Q['qlng']}))
            * cos(radians(lat)),
          cos(radians({KNN_Q['qlat']})) * sin(radians(lat))
          - sin(radians({KNN_Q['qlat']})) * cos(radians(lat))
            * cos(radians(lng) - radians({KNN_Q['qlng']})))) AS deg,
        {dist} AS dm FROM pages_geo),
sec AS (SELECT CAST(floor(((deg + 360) % 360) / {_bw!r}) AS BIGINT)
          AS sector, dm FROM brg)
SELECT sector, CAST(count(*) AS BIGINT) AS n_pages,
       min(round(dm, 3)) AS min_dist_m, max(round(dm, 3)) AS max_dist_m
FROM sec GROUP BY sector"""
    # monthly circular statistics of the same bearing: per-page sin/cos
    # rounded into the 1e-9 fixed-point domain (monthly_centroid's
    # contract) -> exact BIGINT monthly sums -> identical finishing
    # atan2/sqrt doubles on both engines
    bearing_circ_sql = f"""
{cte},
b AS (SELECT date_trunc('month', make_timestamp(
               (1704067200 + (page_id * 40499) % 31536000) * 1000000))
               AS month,
             atan2(sin(radians(lng) - radians({KNN_Q['qlng']}))
                     * cos(radians(lat)),
                   cos(radians({KNN_Q['qlat']})) * sin(radians(lat))
                   - sin(radians({KNN_Q['qlat']})) * cos(radians(lat))
                     * cos(radians(lng) - radians({KNN_Q['qlng']})))
               AS brg
      FROM pages_geo),
q AS (SELECT month,
             CAST(round(sin(brg) * 1000000000.0) AS BIGINT) AS qs,
             CAST(round(cos(brg) * 1000000000.0) AS BIGINT) AS qc
      FROM b),
a AS (SELECT month, CAST(count(*) AS BIGINT) AS n_pages,
             CAST(sum(qs) AS BIGINT) AS ss,
             CAST(sum(qc) AS BIGINT) AS sc
      FROM q GROUP BY 1)
SELECT month, n_pages,
       round((degrees(atan2(CAST(ss AS DOUBLE), CAST(sc AS DOUBLE)))
              + 360.0) % 360.0, 6) AS mean_bearing_deg,
       round(sqrt(CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
                  + CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
             / (CAST(n_pages AS DOUBLE) * 1000000000.0), 6)
         AS resultant_r,
       round(1.0 - sqrt(CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
                        + CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
                   / (CAST(n_pages AS DOUBLE) * 1000000000.0), 6)
         AS circ_var
FROM a ORDER BY month"""
    # semi-log distance-decay regression over 500 km rings: identical
    # haversine doubles -> identical floor rings; order-pinned moment
    # folds over occupied rings (tile_zipf's list_reduce contract)
    distance_decay_sql = f"""
{cte},
rc AS (SELECT CAST(floor(({dist}) / 500000.0) AS BIGINT) AS ring,
              CAST(count(*) AS BIGINT) AS n
       FROM pages_geo GROUP BY 1),
m AS (SELECT CAST(count(*) AS BIGINT) AS v,
             CAST(coalesce(sum(n), 0) AS BIGINT) AS total,
             CAST(count(*) AS DOUBLE) AS nf,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(ring AS DOUBLE) ORDER BY ring)),
               (x, y) -> x + y) AS sx,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(ln(CAST(n AS DOUBLE)) ORDER BY ring)),
               (x, y) -> x + y) AS sy,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(ring AS DOUBLE) * CAST(ring AS DOUBLE)
                    ORDER BY ring)), (x, y) -> x + y) AS sxx,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(ring AS DOUBLE) * ln(CAST(n AS DOUBLE))
                    ORDER BY ring)), (x, y) -> x + y) AS sxy
      FROM rc)
SELECT v AS n_rings, total AS n_pages,
       CASE WHEN v = 0 OR nf * sxx - sx * sx = 0.0 THEN NULL
            ELSE round((nf * sxy - sx * sy) / (nf * sxx - sx * sx), 6)
            END AS slope,
       CASE WHEN v = 0 OR nf * sxx - sx * sx = 0.0 THEN NULL
            ELSE round((sy - ((nf * sxy - sx * sy)
                              / (nf * sxx - sx * sx)) * sx) / nf, 6)
            END AS intercept
FROM m"""
    # Theil-T by cube face: face = first token nibble >> 1 on both
    # engines; within-face folds order-pinned ascending cell_token
    theil_sql = (
        f"{cte}, tc AS (SELECT cell_token, CAST(count(*) AS BIGINT) AS n "
        "FROM (" + s2_cell_select("SELECT lat, lng FROM pages_geo",
                                  level=8)
        + ") GROUP BY 1), "
        f"fc AS (SELECT {_face_case} AS face, cell_token, n FROM tc), "
        "gm AS (SELECT face, CAST(count(*) AS BIGINT) AS ng, "
        "CAST(sum(n) AS BIGINT) AS xg, "
        "CAST(CAST(sum(n) AS BIGINT) AS DOUBLE) "
        "/ CAST(count(*) AS DOUBLE) AS mg FROM fc GROUP BY 1), "
        "tot AS (SELECT CAST(sum(n) AS BIGINT) AS xx, "
        "CAST(count(*) AS BIGINT) AS nt FROM tc), "
        "w AS (SELECT fc.face AS face, gm.ng AS ng, gm.xg AS xg, "
        "gm.mg AS mg, "
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list((CAST(fc.n AS DOUBLE) / gm.mg) "
        "* ln(CAST(fc.n AS DOUBLE) / gm.mg) ORDER BY fc.cell_token)), "
        "(a, v) -> a + v) AS acc "
        "FROM fc JOIN gm USING (face) GROUP BY 1, 2, 3, 4) "
        "SELECT face, ng AS n_tiles, xg AS n_pages, "
        "round(acc / CAST(ng AS DOUBLE), 6) AS theil_within, "
        "round((CAST(xg AS DOUBLE) / CAST(tot.xx AS DOUBLE)) "
        "* ln(mg / (CAST(tot.xx AS DOUBLE) / CAST(tot.nt AS DOUBLE))), 6)"
        " AS between_term "
        "FROM w CROSS JOIN tot ORDER BY face"
    )
    # rect-distance rank: branch-for-branch kernel mirror (sqlgen)
    from s2ray.functions.sqlgen import rect_distance_select
    from s2ray.kernel.region import LatLngRect

    rd_rect = LatLngRect.from_degrees(RECT_DIST["lat_lo"], RECT_DIST["lng_lo"],
                                      RECT_DIST["lat_hi"], RECT_DIST["lng_hi"])
    # round only in the outermost projection: an ORDER BY dist_m next to
    # a `round(...) AS dist_m` alias binds to the ROUNDED alias in DuckDB,
    # so mm-level ties at the LIMIT boundary could pick different rows
    # than the engine's unrounded sort
    rect_dist_rank = (
        f"{cte} SELECT page_id, rank, round(dm, 3) AS dist_m FROM ("
        f"SELECT page_id, CAST(row_number() OVER "
        f"(ORDER BY dist_m, page_id) AS BIGINT) AS rank, dist_m AS dm FROM ("
        + rect_distance_select("SELECT page_id, lat, lng FROM pages_geo",
                               rd_rect)
        + f") WHERE dist_m > 0 ORDER BY dist_m, page_id "
        f"LIMIT {RECT_DIST_K}) ORDER BY rank"
    )
    text_id = f"{cte} SELECT page_id, text FROM pages_geo"
    per_lang = (
        f"{cte} SELECT lang, count(*) AS n_pages FROM pages_geo GROUP BY lang"
    )
    # cap join: spherical-cap membership == great-circle distance <= radius
    from s2ray.sources.pages import CITIES_E4

    city_values = ", ".join(
        f"('cap{k}', {la / 1e4!r}, {ln / 1e4!r})"
        for k, (la, ln) in enumerate(CITIES_E4)
    )
    cap_dist = (
        "2 * 6371000 * asin(sqrt("
        "(1 - cos(radians(p.lat) - radians(c.clat))) / 2 "
        "+ cos(radians(p.lat)) * cos(radians(c.clat)) "
        "* (1 - cos(radians(p.lng) - radians(c.clng))) / 2))"
    )
    cap_join = (
        f"{cte} SELECT p.page_id AS page_id, c.region_id AS region_id "
        f"FROM pages_geo p CROSS JOIN (VALUES {city_values}) AS c(region_id, clat, clng) "
        f"WHERE {cap_dist} <= {CAP_RADIUS_M!r}"
    )
    # pip join: exact spherical crossing-parity expression per polygon
    from s2ray.kernel.pip import Loop
    from s2ray.pipelines.spatial_join import loop_pip_sql

    pip_selects = []
    for name, loop_deg in PIP_POLYS.items():
        loop = Loop.from_latlng_degrees(loop_deg)
        expr = loop_pip_sql(loop, lat_expr="radians(lat)", lng_expr="radians(lng)")
        pip_selects.append(
            f"SELECT page_id, '{name}' AS region_id FROM pages_geo WHERE {expr}"
        )
    pip_join = f"{cte} " + " UNION ALL ".join(pip_selects)
    # assembled regions: oracle on the KNOWN 6-vertex union boundary the
    # edge-soup assembly must reproduce bit-exactly
    _, union_loops = _assembly_geometry()
    asm_selects = []
    for name, loop_deg in sorted(union_loops.items()):
        expr = loop_pip_sql(Loop.from_latlng_degrees(loop_deg),
                            lat_expr="radians(lat)", lng_expr="radians(lng)")
        asm_selects.append(
            f"SELECT page_id, '{name}' AS region_id FROM pages_geo WHERE {expr}"
        )
    assembled_pip_sql = f"{cte} " + " UNION ALL ".join(asm_selects)
    exact_dedup_sql = (
        f"{cte} SELECT min(page_id) AS page_id, count(*) AS n_copies "
        f"FROM pages_geo GROUP BY text"
    )
    near_dup_ctes = f"""
words AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS ws FROM documents),
sh AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(ws) >= 3 THEN
  list_transform(generate_series(1, len(ws)-2), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
  ELSE [array_to_string(ws, ' ')] END)) AS s FROM words),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
pairs AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS inter FROM sh a JOIN sh b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
dup AS (SELECT i, j, inter * 1.0 / (sa.sz + sb.sz - inter) AS jaccard
        FROM pairs JOIN sizes sa ON sa.doc_id = pairs.i
                   JOIN sizes sb ON sb.doc_id = pairs.j
        WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= {NEAR_DUP_TAU!r})"""
    near_dup = f"WITH {near_dup_ctes} SELECT i, j, jaccard FROM dup"
    # dedup threshold calibration: one recursive closure per tau over
    # the SAME unthresholded pair base (identical-double comparisons)
    from s2ray.pipelines.dedup import DUP_CURVE_TAUS

    _curve_blocks = []
    for _k, _t in enumerate(sorted(DUP_CURVE_TAUS)):
        _curve_blocks.append(f"""
ed{_k} AS (SELECT i, j FROM pairs
           JOIN sizes sa ON sa.doc_id = pairs.i
           JOIN sizes sb ON sb.doc_id = pairs.j
           WHERE inter * 1.0 / (sa.sz + sb.sz - inter)
                 >= CAST({_t!r} AS DOUBLE)),
e{_k} AS (SELECT i AS u, j AS v FROM ed{_k}
          UNION ALL SELECT j, i FROM ed{_k}),
r{_k}(u, v) AS (
  SELECT u, v FROM e{_k}
  UNION
  SELECT r.u, e.v FROM r{_k} r JOIN e{_k} e ON r.v = e.u),
cl{_k} AS (SELECT u, least(u, min(v)) AS cid FROM r{_k} GROUP BY u),
cs{_k} AS (SELECT cid, CAST(count(*) AS BIGINT) AS sz
           FROM cl{_k} GROUP BY 1),
s{_k} AS (SELECT CAST({_t!r} AS DOUBLE) AS tau,
                 (SELECT CAST(count(*) AS BIGINT) FROM ed{_k})
                   AS n_pairs,
                 CAST(count(*) AS BIGINT) AS n_clusters,
                 CAST(coalesce(sum(sz), 0) AS BIGINT) AS n_members,
                 CAST(coalesce(max(sz), 0) AS BIGINT)
                   AS largest_cluster
          FROM cs{_k})""")
    dup_threshold_curve_sql = (
        f"WITH RECURSIVE {near_dup_ctes}," + ",".join(_curve_blocks)
        + " " + " UNION ALL ".join(
            f"SELECT * FROM s{_k}" for _k in range(len(DUP_CURVE_TAUS)))
        + " ORDER BY tau"
    )
    # containment (overlap coefficient): same postings base, integer
    # boundary rule c_den*inter >= c_num*min(si, sj) on both engines
    containment_sql = f"""
WITH {near_dup_ctes},
ct AS (SELECT pairs.i, pairs.j, CAST(pairs.inter AS BIGINT) AS inter,
              CAST(sa.sz AS BIGINT) AS size_i,
              CAST(sb.sz AS BIGINT) AS size_j
       FROM pairs JOIN sizes sa ON sa.doc_id = pairs.i
                  JOIN sizes sb ON sb.doc_id = pairs.j)
SELECT i, j, inter, size_i, size_j,
       round(CAST(inter AS DOUBLE)
             / CAST(least(size_i, size_j) AS DOUBLE), 6) AS containment
FROM ct WHERE 10 * inter >= 9 * least(size_i, size_j)"""
    dup_degree_sql = f"""
WITH {near_dup_ctes},
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS degree
        FROM (SELECT i AS u FROM dup UNION ALL SELECT j FROM dup)
        GROUP BY u)
SELECT degree, count(*) AS n_docs FROM deg GROUP BY 1"""
    # connected components of the pair graph: transitive closure by
    # recursive CTE, label = min reachable node
    near_dup_clusters_sql = f"""
WITH RECURSIVE {near_dup_ctes},
edges AS (SELECT i AS u, j AS v FROM dup UNION ALL SELECT j, i FROM dup),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT u AS doc_id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u"""
    # cluster language purity: the same recursive closure, joined back
    # to documents.lang (NULL lang is its own label per SQL GROUP BY),
    # purity facts exact integers grouped by cluster size
    dup_cluster_purity_sql = f"""
WITH RECURSIVE {near_dup_ctes},
edges AS (SELECT i AS u, j AS v FROM dup UNION ALL SELECT j, i FROM dup),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
cl AS (SELECT u AS doc_id, least(u, min(v)) AS cid FROM reach GROUP BY u),
lc AS (SELECT cl.cid, d.lang, CAST(count(*) AS BIGINT) AS c
       FROM cl JOIN documents d USING (doc_id) GROUP BY 1, 2),
cs AS (SELECT cid, CAST(sum(c) AS BIGINT) AS size,
              CAST(max(c) AS BIGINT) AS mx
       FROM lc GROUP BY 1)
SELECT size AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(coalesce(count(*) FILTER (mx = size), 0) AS BIGINT)
         AS n_pure,
       CAST(sum(mx) AS BIGINT) AS sum_max_lang,
       round(CAST(CAST(sum(mx) AS BIGINT) AS DOUBLE)
             / (CAST(size AS DOUBLE) * CAST(count(*) AS DOUBLE)), 6)
         AS avg_purity,
       round(CAST(coalesce(count(*) FILTER (mx = size), 0) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS pure_rate
FROM cs GROUP BY size ORDER BY size"""
    # sketch oracles: the engine's mod-(2^61-1) hashing is mirrored exactly
    # in HUGEINT arithmetic (token hash -> shingle Horner -> minhash perms
    # -> band keys; simhash bit votes)
    from s2ray.functions.sqlgen import M61, token_hash_sql
    from s2ray.pipelines.dedup import (_BAND_P, _BAND_ROWS, _N_PERM,
                                       _PERM_A, _PERM_B, _SHINGLE_Q)

    th_expr = token_hash_sql("t")
    Q = int(_SHINGLE_Q)
    P = int(_BAND_P)
    perm_rows = ", ".join(f"({i}, {int(a)}, {int(b)})" for i, (a, b)
                          in enumerate(zip(_PERM_A, _PERM_B)))
    tok_cte = ("tk AS (SELECT doc_id, "
               "list_filter(regexp_split_to_array(text, '\\s+'), "
               "x -> x <> '') AS ws FROM documents), "
               "th AS (SELECT doc_id, list_transform(ws, t -> "
               f"{th_expr}) AS hs, len(ws) AS n FROM tk)")
    shingle_cte = f"""
shs AS (
  SELECT doc_id, unnest(list_distinct(CASE WHEN coalesce(n, 0) >= 3 THEN
    list_transform(generate_series(1, n - 2), i ->
      CAST((((CAST(hs[i] AS HUGEINT) * {Q} + hs[i+1]) % {M61}) * {Q}
            + hs[i+2]) % {M61} AS BIGINT))
  WHEN coalesce(n, 0) >= 1 THEN
    [CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
          list_transform(hs, x -> CAST(x AS HUGEINT))),
          (a, b) -> (a * {Q} + b) % {M61}) AS BIGINT)]
  ELSE CAST([] AS BIGINT[]) END)) AS s
  FROM th)"""
    minhash_sql = f"""
WITH {tok_cte}, {shingle_cte},
perms(idx, pa, pb) AS (VALUES {perm_rows}),
sig AS (SELECT doc_id, idx,
               min(CAST((CAST(pa AS HUGEINT) * s + pb) % {M61} AS BIGINT))
                 AS v
        FROM shs CROSS JOIN perms GROUP BY doc_id, idx),
bk AS (SELECT doc_id, band,
              CAST(list_reduce(list_prepend(CAST(band + 1 AS HUGEINT), vs),
                   (a, b) -> (a * {P} + b) % {M61}) AS BIGINT) AS key
       FROM (SELECT doc_id, idx // {_BAND_ROWS} AS band,
                    list(CAST(v AS HUGEINT) ORDER BY idx) AS vs
             FROM sig GROUP BY doc_id, idx // {_BAND_ROWS})),
cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
         FROM bk a JOIN bk b ON a.band = b.band AND a.key = b.key
                             AND a.doc_id < b.doc_id),
est AS (SELECT c.i, c.j,
               sum(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END) / {_N_PERM}.0
                 AS est_jaccard
        FROM cand c JOIN sig sa ON sa.doc_id = c.i
                    JOIN sig sb ON sb.doc_id = c.j AND sb.idx = sa.idx
        GROUP BY c.i, c.j)
SELECT i, j, est_jaccard FROM est WHERE est_jaccard >= {NEAR_DUP_TAU!r}"""
    # PMI collocations: packed-bigram counts + positional marginals; the
    # ln argument is a ratio of exact BIGINT products on both engines
    pmi_sql = f"""
WITH words AS (SELECT list_filter(regexp_split_to_array(text, '\\s+'),
                                  x -> x <> '') AS ws FROM documents),
bgr AS (SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
               i -> ws[i] || chr(31) || ws[i+1])) AS b
        FROM words WHERE coalesce(len(ws), 0) >= 2),
cb AS (SELECT b, CAST(count(*) AS BIGINT) AS n_ab FROM bgr GROUP BY b),
sp AS (SELECT string_split(b, chr(31))[1] AS w1,
              string_split(b, chr(31))[2] AS w2, n_ab FROM cb),
lm AS (SELECT w1, CAST(sum(n_ab) AS BIGINT) AS n_left FROM sp GROUP BY w1),
rm AS (SELECT w2, CAST(sum(n_ab) AS BIGINT) AS n_right FROM sp GROUP BY w2),
nn AS (SELECT CAST(sum(n_ab) AS BIGINT) AS n FROM cb)
SELECT sp.w1, sp.w2, sp.n_ab, lm.n_left, rm.n_right,
       round(ln((sp.n_ab * nn.n) / (lm.n_left * rm.n_right)), 6) AS pmi
FROM sp JOIN lm USING (w1) JOIN rm USING (w2) CROSS JOIN nn
WHERE sp.n_ab >= {PMI_MIN_COUNT}"""
    # sparse TF cosine join: the NON-distinct shingle stream with counts;
    # the threshold is the same exact integer comparison the engine uses
    # (den^2 dot^2 >= num^2 ni nj), so even boundary pairs agree bit-exactly
    _cn, _cd = COSINE_TAU
    cosine_sim_sql = f"""
WITH {tok_cte},
shall AS (
  SELECT doc_id, unnest(CASE WHEN coalesce(n, 0) >= 3 THEN
    list_transform(generate_series(1, n - 2), i ->
      CAST((((CAST(hs[i] AS HUGEINT) * {Q} + hs[i+1]) % {M61}) * {Q}
            + hs[i+2]) % {M61} AS BIGINT))
  WHEN coalesce(n, 0) >= 1 THEN
    [CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
          list_transform(hs, x -> CAST(x AS HUGEINT))),
          (a, b) -> (a * {Q} + b) % {M61}) AS BIGINT)]
  ELSE CAST([] AS BIGINT[]) END) AS s
  FROM th),
tf AS (SELECT doc_id, s, CAST(count(*) AS BIGINT) AS tf
       FROM shall GROUP BY doc_id, s),
nrm AS (SELECT doc_id, CAST(sum(tf*tf) AS BIGINT) AS n2 FROM tf
        GROUP BY doc_id),
dt AS (SELECT a.doc_id AS i, b.doc_id AS j,
              CAST(sum(a.tf*b.tf) AS BIGINT) AS dot
       FROM tf a JOIN tf b ON a.s = b.s AND a.doc_id < b.doc_id
       GROUP BY a.doc_id, b.doc_id)
SELECT d.i AS i, d.j AS j, d.dot AS dot, na.n2 AS norm_i, nb.n2 AS norm_j,
       round(d.dot / sqrt(na.n2 * nb.n2), 6) AS cosine
FROM dt d JOIN nrm na ON na.doc_id = d.i JOIN nrm nb ON nb.doc_id = d.j
WHERE {_cd * _cd} * d.dot * d.dot >= {_cn * _cn} * na.n2 * nb.n2"""
    dup_span_sql = f"""
WITH {tok_cte}, {shingle_cte},
dfc AS (SELECT s, count(*) AS nd FROM shs GROUP BY s),
per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
               CAST(sum(CASE WHEN dfc.nd >= 2 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_dup
        FROM shs JOIN dfc USING (s) GROUP BY doc_id)
SELECT doc_id, n_shingles, n_dup,
       round(n_dup * 1.0 / n_shingles, 6) AS dup_frac FROM per"""
    # n-gram novelty: first-occurrence (min doc_id) rule over the same
    # distinct-shingle stream; mirrors dedup.ngram_novelty's run minima
    ngram_novelty_sql = f"""
WITH {tok_cte}, {shingle_cte},
fo AS (SELECT s, min(doc_id) AS first_doc FROM shs GROUP BY s),
per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
               CAST(sum(CASE WHEN fo.first_doc = shs.doc_id
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
        FROM shs JOIN fo USING (s) GROUP BY doc_id)
SELECT doc_id, n_shingles, n_novel,
       round(n_novel * 1.0 / n_shingles, 6) AS novelty_frac FROM per"""
    simhash_sql = f"""
WITH {tok_cte},
tokh AS (SELECT doc_id, unnest(hs) AS h FROM th),
cnt AS (SELECT doc_id, n AS ntok FROM th),
bits AS (SELECT doc_id, b, sum((h >> b) & 1) AS ones
         FROM tokh CROSS JOIN (SELECT unnest(range(0, 61)) AS b)
         GROUP BY doc_id, b),
sims AS (SELECT c.doc_id,
                CAST(coalesce(sum(CASE WHEN 2 * ones > ntok
                             THEN (CAST(1 AS BIGINT) << b) ELSE 0 END), 0)
                  AS BIGINT) AS sim
         FROM cnt c LEFT JOIN bits USING (doc_id) GROUP BY c.doc_id, ntok),
chunks AS (SELECT doc_id, sim, t.c AS c, (sim >> (16 * t.c)) & 65535 AS val
           FROM sims CROSS JOIN (VALUES (0), (1), (2), (3)) t(c)),
cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j,
                a.sim AS si, b.sim AS sj
         FROM chunks a JOIN chunks b ON a.c = b.c AND a.val = b.val
                                     AND a.doc_id < b.doc_id)
SELECT i, j, CAST(bit_count(xor(si, sj)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(si, sj)) <= 3"""
    # Bloom decontamination: the filter's double-hash positions mirrored
    # in HUGEINT (functions/bloom.py); a probe shingle "hits" iff ALL
    # n_hashes of its positions appear among the eval set's positions —
    # bit-for-bit the engine's filter, false positives included
    from s2ray.functions.bloom import bloom_position_sql
    bloom_pos = bloom_position_sql("s", "i", BLOOM_M_BITS)
    bloom_sql = f"""
WITH {tok_cte}, {shingle_cte},
pos AS (SELECT doc_id, s, i, {bloom_pos} AS p
        FROM shs CROSS JOIN
          (SELECT unnest(generate_series(0, {BLOOM_N_HASHES - 1})) AS i) ii),
evp AS (SELECT DISTINCT p FROM pos WHERE doc_id % 97 = 0),
hits AS (SELECT pos.doc_id, pos.s, count(evp.p) AS nhit
         FROM pos LEFT JOIN evp ON pos.p = evp.p
         WHERE pos.doc_id % 97 <> 0 GROUP BY pos.doc_id, pos.s),
ov AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap FROM hits
       WHERE nhit = {BLOOM_N_HASHES} GROUP BY doc_id),
sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles FROM shs
       WHERE doc_id % 97 <> 0 GROUP BY doc_id)
SELECT ov.doc_id, sz.n_shingles, ov.n_overlap,
       round(ov.n_overlap * 1.0 / sz.n_shingles, 6) AS ratio
FROM ov JOIN sz USING (doc_id)"""
    # distance self-join: reference haversine mirrored pairwise
    dist_pair = (
        "2 * 6371000 * asin(sqrt("
        "(1 - cos(radians(a.lat) - radians(b.lat))) / 2 "
        "+ cos(radians(a.lat)) * cos(radians(b.lat)) "
        "* (1 - cos(radians(a.lng) - radians(b.lng))) / 2))"
    )
    distance_join_sql = (
        f"{cte} SELECT a.page_id AS i, b.page_id AS j, "
        f"round({dist_pair}, 3) AS dist_m "
        f"FROM pages_geo a JOIN pages_geo b ON a.page_id < b.page_id "
        f"WHERE {dist_pair} <= {DIST_JOIN_M!r}"
    )
    # radial pair-distance histogram: same pair set, one floor-divide
    # band on the mm-rounded distance (engine op order mirrored)
    pair_dist_hist_sql = (
        f"{cte}, pr AS (SELECT round({dist_pair}, 3) AS dm "
        f"FROM pages_geo a JOIN pages_geo b ON a.page_id < b.page_id "
        f"WHERE {dist_pair} <= {DIST_JOIN_M!r}) "
        f"SELECT CAST(floor(dm / {PAIR_DIST_BAND_M!r}) AS BIGINT) AS band, "
        "count(*) AS n_pairs, min(dm) AS min_m, max(dm) AS max_m "
        "FROM pr GROUP BY 1 ORDER BY 1"
    )
    # Ripley K: per-radius counts over the SAME mm-rounded pair
    # distances; K = 4*pi*R_km^2 * 2*np/(n*(n-1)) CAST-then-divide
    ripley_sql = (
        f"{cte}, pr AS (SELECT round({dist_pair}, 3) AS dm "
        f"FROM pages_geo a JOIN pages_geo b ON a.page_id < b.page_id "
        f"WHERE {dist_pair} <= {max(RIPLEY_RADII)!r}), "
        f"nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pages_geo), "
        "legs AS (" + " UNION ALL ".join(
            [f"SELECT CAST({r!r} AS DOUBLE) AS r_m, "
             f"(SELECT CAST(count(*) AS BIGINT) FROM pr WHERE dm <= {r!r}) "
             "AS n_pairs" for r in RIPLEY_RADII]) + ") "
        "SELECT r_m, n_pairs, CASE WHEN nn.n * (nn.n - 1) = 0 THEN NULL "
        "ELSE round(4.0 * pi() * 6371.0 * 6371.0 "
        "* CAST(2 * n_pairs AS DOUBLE) "
        "/ CAST(nn.n * (nn.n - 1) AS DOUBLE), 6) END AS k_km2 "
        "FROM legs CROSS JOIN nn"
    )
    cross_k_sql = (
        f"{cte}, pr AS (SELECT round({dist_pair}, 3) AS dm "
        f"FROM pages_geo a JOIN pages_geo b ON b.page_id <> a.page_id "
        f"WHERE a.lang = 'zh' AND b.lang = 'en' "
        f"AND {dist_pair} <= {max(RIPLEY_RADII)!r}), "
        f"nn AS (SELECT "
        "CAST(count(*) FILTER (lang = 'zh') AS BIGINT) AS na, "
        "CAST(count(*) FILTER (lang = 'en') AS BIGINT) AS nb "
        "FROM pages_geo), "
        "legs AS (" + " UNION ALL ".join(
            [f"SELECT CAST({r!r} AS DOUBLE) AS r_m, "
             f"(SELECT CAST(count(*) AS BIGINT) FROM pr WHERE dm <= {r!r}) "
             "AS n_pairs" for r in RIPLEY_RADII]) + ") "
        "SELECT r_m, n_pairs, CASE WHEN nn.na * nn.nb = 0 THEN NULL "
        "ELSE round(4.0 * pi() * 6371.0 * 6371.0 "
        "* CAST(n_pairs AS DOUBLE) "
        "/ CAST(nn.na * nn.nb AS DOUBLE), 6) END AS k_km2 "
        "FROM legs CROSS JOIN nn ORDER BY r_m"
    )
    # G-function: per-page min pair distance (== the argmin row's dm),
    # thresholded per radius; UNION-ALL legs emit zero rows for empty
    # radii exactly like the engine's fill
    nn_g_sql = (
        f"{cte}, pr AS (SELECT a.page_id AS i, b.page_id AS j, "
        f"round({dist_pair}, 3) AS dm "
        f"FROM pages_geo a JOIN pages_geo b ON a.page_id < b.page_id "
        f"WHERE {dist_pair} <= {max(RIPLEY_RADII)!r}), "
        "sym AS (SELECT i AS page_id, dm FROM pr "
        "UNION ALL SELECT j, dm FROM pr), "
        "best AS (SELECT page_id, min(dm) AS nnd FROM sym GROUP BY 1), "
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pages_geo), "
        "legs AS (" + " UNION ALL ".join(
            [f"SELECT CAST({r!r} AS DOUBLE) AS r_m, "
             f"(SELECT CAST(count(*) AS BIGINT) FROM best "
             f"WHERE nnd <= {r!r}) AS n_le" for r in RIPLEY_RADII]) + ") "
        "SELECT r_m, n_le, CASE WHEN nn.n = 0 THEN NULL ELSE "
        "round(CAST(n_le AS DOUBLE) / CAST(nn.n AS DOUBLE), 6) END AS g "
        "FROM legs CROSS JOIN nn"
    )
    # per-lang bbox + spherical centroid: the tile_centroids fixed-point
    # quantization grouped by lang, plus order-free extents
    lang_bbox_sql = (
        f"{cte}, q AS (SELECT lang, lat, lng, "
        "CAST(round(cos(radians(lat)) * cos(radians(lng)) "
        "* 1000000000.0) AS BIGINT) AS qx, "
        "CAST(round(cos(radians(lat)) * sin(radians(lng)) "
        "* 1000000000.0) AS BIGINT) AS qy, "
        "CAST(round(sin(radians(lat)) * 1000000000.0) AS BIGINT) AS qz "
        "FROM pages_geo) "
        "SELECT lang, CAST(count(*) AS BIGINT) AS n_pages, "
        "min(lat) AS min_lat, max(lat) AS max_lat, "
        "min(lng) AS min_lng, max(lng) AS max_lng, "
        "round(degrees(atan2(CAST(CAST(sum(qz) AS BIGINT) AS DOUBLE), "
        "sqrt(CAST(CAST(sum(qx) AS BIGINT) AS DOUBLE) "
        "* CAST(CAST(sum(qx) AS BIGINT) AS DOUBLE) "
        "+ CAST(CAST(sum(qy) AS BIGINT) AS DOUBLE) "
        "* CAST(CAST(sum(qy) AS BIGINT) AS DOUBLE)))), 6) AS c_lat, "
        "round(degrees(atan2(CAST(CAST(sum(qy) AS BIGINT) AS DOUBLE), "
        "CAST(CAST(sum(qx) AS BIGINT) AS DOUBLE))), 6) AS c_lng "
        "FROM q GROUP BY 1 ORDER BY 1"
    )
    # nearest-neighbor graph: per-page argmin over the same pair set;
    # ranking on the mm-ROUNDED distance + nn_id tie-break matches the
    # engine's lexsort exactly (identical doubles on both sides)
    nearest_neighbor_sql = f"""
{cte},
pr AS (SELECT a.page_id AS i, b.page_id AS j, round({dist_pair}, 3) AS dm
       FROM pages_geo a JOIN pages_geo b ON a.page_id < b.page_id
       WHERE {dist_pair} <= {DIST_JOIN_M!r}),
sym AS (SELECT i AS page_id, j AS nn_id, dm FROM pr
        UNION ALL SELECT j, i, dm FROM pr),
rk AS (SELECT page_id, nn_id, dm,
              row_number() OVER (PARTITION BY page_id
                                 ORDER BY dm, nn_id) AS rn FROM sym)
SELECT page_id, nn_id, dm AS dist_m FROM rk WHERE rn = 1"""
    # Knox space-time ratio: month index from the same warc_ts synth as
    # city_visits_monthly; pair predicate identical to distance_join
    knox_sql = f"""
{cte},
pm AS (SELECT page_id, lat, lng,
              (CAST(date_part('year', mk) AS BIGINT) - 1970) * 12
                + CAST(date_part('month', mk) AS BIGINT) - 1 AS m
       FROM (SELECT page_id, lat, lng,
                    make_timestamp((1704067200 + (page_id * 40499)
                                    % 31536000) * 1000000) AS mk
             FROM pages_geo)),
pr AS (SELECT a.m AS ma, b.m AS mb
       FROM pm a JOIN pm b ON a.page_id < b.page_id
       WHERE {dist_pair} <= {DIST_JOIN_M!r})
SELECT CAST(count(*) AS BIGINT) AS n_space_pairs,
       CAST(coalesce(sum(CASE WHEN abs(ma - mb) <= 1 THEN 1 ELSE 0 END),
                     0) AS BIGINT) AS n_spacetime_pairs,
       CASE WHEN count(*) = 0 THEN NULL ELSE
         round(CAST(coalesce(sum(CASE WHEN abs(ma - mb) <= 1
                                      THEN 1 ELSE 0 END), 0) AS DOUBLE)
               / CAST(count(*) AS DOUBLE), 6) END AS ratio
FROM pr"""
    # colocation quotient: lang-pair CLQ over the same per-page argmin
    # (NN universe = pages with a neighbor in range), mirrored float chain
    colocation_sql = f"""
{cte},
pr AS (SELECT a.page_id AS i, b.page_id AS j, round({dist_pair}, 3) AS dm
       FROM pages_geo a JOIN pages_geo b ON a.page_id < b.page_id
       WHERE {dist_pair} <= {DIST_JOIN_M!r}),
sym AS (SELECT i AS page_id, j AS nn_id, dm FROM pr
        UNION ALL SELECT j, i, dm FROM pr),
rk AS (SELECT page_id, nn_id, dm,
              row_number() OVER (PARTITION BY page_id
                                 ORDER BY dm, nn_id) AS rn FROM sym),
nn1 AS (SELECT page_id, nn_id FROM rk WHERE rn = 1),
lp AS (SELECT p1.lang AS lang_a, p2.lang AS lang_b
       FROM nn1 JOIN pages_geo p1 ON p1.page_id = nn1.page_id
       JOIN pages_geo p2 ON p2.page_id = nn1.nn_id),
cab AS (SELECT lang_a, lang_b, CAST(count(*) AS BIGINT) AS n_ab
        FROM lp GROUP BY 1, 2),
na AS (SELECT lang_a AS lang, CAST(count(*) AS BIGINT) AS n
       FROM lp GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM lp)
SELECT cab.lang_a, cab.lang_b, cab.n_ab,
       CASE WHEN bb.n - (CASE WHEN cab.lang_a = cab.lang_b
                              THEN 1 ELSE 0 END) <= 0
                 OR t.nn < 2 THEN NULL ELSE
         round((CAST(cab.n_ab AS DOUBLE) / CAST(aa.n AS DOUBLE))
               / (CAST(bb.n - (CASE WHEN cab.lang_a = cab.lang_b
                                    THEN 1 ELSE 0 END) AS DOUBLE)
                  / CAST(t.nn - 1 AS DOUBLE)), 6) END AS clq
FROM cab JOIN na aa ON aa.lang = cab.lang_a
JOIN na bb ON bb.lang = cab.lang_b
CROSS JOIN tot t
ORDER BY 1, 2"""
    # bipartite cross-lang NN: directed a -> b pair set, same ranking
    bipartite_nn_sql = f"""
{cte},
pr AS (SELECT a.page_id AS page_id, b.page_id AS nn_id,
              round({dist_pair}, 3) AS dm
       FROM pages_geo a JOIN pages_geo b ON b.page_id <> a.page_id
       WHERE a.lang = 'zh' AND b.lang = 'en'
         AND {dist_pair} <= {DIST_JOIN_M!r}),
rk AS (SELECT page_id, nn_id, dm,
              row_number() OVER (PARTITION BY page_id
                                 ORDER BY dm, nn_id) AS rn FROM pr)
SELECT page_id, nn_id, dm AS dist_m FROM rk WHERE rn = 1"""
    # Clark-Evans: order-pinned list_reduce over the same per-page argmin
    # dm values; mean/expected/ce chain in the engine's exact op order
    clark_evans_sql = f"""
{cte},
pr AS (SELECT a.page_id AS i, b.page_id AS j, round({dist_pair}, 3) AS dm
       FROM pages_geo a JOIN pages_geo b ON a.page_id < b.page_id
       WHERE {dist_pair} <= {DIST_JOIN_M!r}),
sym AS (SELECT i AS page_id, j AS nn_id, dm FROM pr
        UNION ALL SELECT j, i, dm FROM pr),
rk AS (SELECT page_id, dm,
              row_number() OVER (PARTITION BY page_id
                                 ORDER BY dm, nn_id) AS rn FROM sym),
nn1 AS (SELECT page_id, dm FROM rk WHERE rn = 1),
np_ AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pages_geo),
f AS (SELECT CAST(count(*) AS BIGINT) AS k,
  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
    list(dm ORDER BY page_id)), (x, y) -> x + y) AS s FROM nn1)
SELECT np_.n AS n_points, f.k AS n_with_nn,
  CASE WHEN f.k = 0 OR np_.n = 0 THEN NULL ELSE
    round(f.s / CAST(f.k AS DOUBLE), 6) END AS mean_nn_m,
  CASE WHEN f.k = 0 OR np_.n = 0 THEN NULL ELSE
    round((f.s / CAST(f.k AS DOUBLE))
          / (1.0 / (2.0 * sqrt(CAST(np_.n AS DOUBLE)
             / (4.0 * pi() * 6371000.0 * 6371000.0)))), 6) END AS ce
FROM f CROSS JOIN np_"""
    knn_graph_sql = nearest_neighbor_sql.replace(
        "SELECT page_id, nn_id, dm AS dist_m FROM rk WHERE rn = 1",
        "SELECT page_id, nn_id, CAST(rn AS BIGINT) AS rank, "
        f"dm AS dist_m FROM rk WHERE rn <= {KNN_GRAPH_K}")
    knn_hubness_sql = nearest_neighbor_sql.replace(
        "SELECT page_id, nn_id, dm AS dist_m FROM rk WHERE rn = 1",
        f""",
knn AS (SELECT page_id, nn_id FROM rk WHERE rn <= {KNN_GRAPH_K}),
indeg AS (SELECT nn_id, CAST(count(*) AS BIGINT) AS in_degree
          FROM knn GROUP BY nn_id)
SELECT in_degree, CAST(count(*) AS BIGINT) AS n_points
FROM indeg GROUP BY 1 ORDER BY 1""")
    idw_sql = nearest_neighbor_sql.replace(
        "SELECT page_id, nn_id, dm AS dist_m FROM rk WHERE rn = 1",
        f""",
knn AS (SELECT page_id, nn_id, dm, rn FROM rk
       WHERE rn <= {KNN_GRAPH_K}),
jv AS (SELECT kk.page_id, kk.rn, 1.0 / (1.0 + kk.dm * kk.dm) AS w,
              CAST(d.n_chars AS DOUBLE) AS v
       FROM knn kk JOIN documents d ON d.doc_id = kk.nn_id),
f AS (SELECT page_id, CAST(count(*) AS BIGINT) AS n_neighbors,
  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
    list(w * v ORDER BY rn)), (x, y) -> x + y) AS num,
  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
    list(w ORDER BY rn)), (x, y) -> x + y) AS den
  FROM jv GROUP BY page_id)
SELECT page_id, n_neighbors, round(num / den, 6) AS idw_chars FROM f""")
    # Voronoi classification rollup: argmin over the city list; only
    # order-free reductions (count / min / max of rounded dist) follow the
    # float math, so distributed partial order can never touch the hash
    from s2ray.sources.pages import CITIES_E4 as _CE4
    city_rows = ", ".join(
        f"({k}, {la / 1e4!r}, {ln / 1e4!r})"
        for k, (la, ln) in enumerate(_CE4))
    facility_dist = (
        "2 * 6371000 * asin(sqrt("
        "(1 - cos(radians(p.lat) - radians(c.clat))) / 2 "
        "+ cos(radians(p.lat)) * cos(radians(c.clat)) "
        "* (1 - cos(radians(p.lng) - radians(c.clng))) / 2))")
    city_visits_sql = f"""
{cte},
cities(city_id, clat, clng) AS (VALUES {city_rows}),
d AS (SELECT c.city_id,
             date_trunc('month', make_timestamp(
               (1704067200 + (p.page_id * 40499) % 31536000) * 1000000))
               AS month,
             {facility_dist} AS dm
      FROM pages_geo p CROSS JOIN cities c)
SELECT CAST(city_id AS BIGINT) AS city_id, month,
       CAST(count(*) AS BIGINT) AS n_pages
FROM d WHERE dm <= 100000.0 GROUP BY 1, 2 ORDER BY 1, 2"""
    voronoi_monthly_sql = f"""
{cte},
cities(city_id, clat, clng) AS (VALUES {city_rows}),
d AS (SELECT p.page_id, c.city_id, {facility_dist} AS dm,
             date_trunc('month', make_timestamp(
               (1704067200 + (p.page_id * 40499) % 31536000) * 1000000))
               AS month
      FROM pages_geo p CROSS JOIN cities c),
rk AS (SELECT page_id, city_id, month,
              row_number() OVER (PARTITION BY page_id
                                 ORDER BY dm, city_id) AS rn FROM d)
SELECT CAST(city_id AS BIGINT) AS city_id, month,
       CAST(count(*) AS BIGINT) AS n_pages
FROM rk WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2"""
    nearest_city_sql = f"""
{cte},
cities(city_id, clat, clng) AS (VALUES {city_rows}),
d AS (SELECT p.page_id, c.city_id, {facility_dist} AS dm
      FROM pages_geo p CROSS JOIN cities c),
rk AS (SELECT page_id, city_id, dm,
              row_number() OVER (PARTITION BY page_id ORDER BY dm, city_id)
                AS rn FROM d)
SELECT city_id, CAST(count(*) AS BIGINT) AS n_pages,
       min(round(dm, 3)) AS min_dist_m, max(round(dm, 3)) AS max_dist_m
FROM rk WHERE rn = 1 GROUP BY city_id"""
    # bigram LM perplexity: token-hash polynomial + Horner bigram fold +
    # add-alpha smoothing mirrored exactly; round(..., 6) on both sides
    ppl_sql = f"""
WITH {tok_cte},
bg AS (SELECT doc_id, unnest(generate_series(1, n - 1)) AS i, hs
       FROM th WHERE coalesce(n, 0) >= 2),
bge AS (SELECT doc_id,
               CAST((CAST(hs[i] AS HUGEINT) * {Q} + hs[i+1]) % {M61}
                    AS BIGINT) AS bh,
               hs[i] AS ah
        FROM bg),
ucn AS (SELECT h, count(*) AS c
        FROM (SELECT unnest(hs) AS h FROM th) GROUP BY h),
vv AS (SELECT count(*) AS v FROM ucn),
bcn AS (SELECT bh, count(*) AS c FROM bge GROUP BY bh)
SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(exp(-avg(ln((bcn.c + 0.5) / (ucn.c + 0.5 * vv.v)))), 6) AS ppl
FROM bge g JOIN bcn USING (bh) JOIN ucn ON ucn.h = g.ah CROSS JOIN vv
GROUP BY g.doc_id"""
    # as-of join: most recent prior click per purchase, same user (inner)
    events_asof_sql = """
WITH l AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase' AND ts IS NOT NULL),
     r AS (SELECT max(event_id) AS match_event_id, user_id,
                  ts AS match_ts
           FROM events
           WHERE event_type = 'click' AND ts IS NOT NULL
           GROUP BY user_id, ts)
SELECT l.event_id, l.user_id, l.ts, r.match_event_id, r.match_ts,
       date_diff('microsecond', r.match_ts, l.ts) AS gap_us
FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.ts >= r.match_ts"""
    # inter-event gaps (LAG window): per-user consecutive deltas; NULL-ts /
    # NULL-user events are unattributable (house contract); single-event
    # users keep SQL's aggregate-over-empty NULLs
    event_gaps_sql = """
WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events
           WHERE ts IS NOT NULL AND user_id IS NOT NULL),
g AS (SELECT user_id,
             t - lag(t) OVER (PARTITION BY user_id ORDER BY t) AS gap
      FROM e)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(gap) AS BIGINT) AS n_gaps,
       CAST(sum(gap) AS BIGINT) AS sum_gap_us,
       CAST(min(gap) AS BIGINT) AS min_gap_us,
       CAST(max(gap) AS BIGINT) AS max_gap_us
FROM g GROUP BY user_id"""
    # cohort retention: first-purchase week cohorts, Monday-aligned epoch
    # week index (epoch day 0 = Thursday -> +3); // floors for the
    # non-negative domain the engine guards
    cohort_sql = """
WITH p AS (SELECT user_id, ((epoch_us(ts) // 86400000000) + 3) // 7 AS w
           FROM events WHERE event_type = 'purchase'
             AND ts IS NOT NULL AND user_id IS NOT NULL),
d AS (SELECT DISTINCT user_id, w FROM p),
c AS (SELECT user_id, min(w) AS cw FROM d GROUP BY user_id)
SELECT c.cw AS cohort_week, d.w AS week,
       CAST(count(*) AS BIGINT) AS n_users
FROM d JOIN c USING (user_id) GROUP BY 1, 2"""
    emb_near_dup_sql = (
        "SELECT a.vec_id AS i, b.vec_id AS j FROM embeddings a "
        "JOIN embeddings b ON a.vec_id < b.vec_id "
        "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
        f"CAST(b.embedding AS DOUBLE[])) >= {EMB_TAU!r}"
    )
    # LSH oracles: deterministic hyperplanes inlined, signature/probe
    # algebra mirrored exactly (multi-probe over 1-bit flips on both sides
    # of a pair == Hamming distance <= 2)
    from s2ray.functions.sqlgen import lsh_signature_expr
    from s2ray.pipelines.ann import _N_PLANES, _lsh_planes

    ann_ids = ", ".join(str(q) for q in ANN_QUERY_IDS)
    sig12 = lsh_signature_expr(_lsh_planes(64, _N_PLANES))
    cos_eq = ("list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
              "CAST(q.embedding AS DOUBLE[]))")
    lsh_knn_sql = f"""
WITH s AS (SELECT vec_id, embedding, {sig12} AS sig FROM embeddings),
q AS (SELECT * FROM s WHERE vec_id IN ({ann_ids}))
SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
       CAST(row_number() OVER (PARTITION BY q.vec_id
            ORDER BY {cos_eq} DESC, e.vec_id) AS BIGINT) AS rank,
       round({cos_eq}, 6) AS sim
FROM s e CROSS JOIN q
WHERE e.vec_id <> q.vec_id AND bit_count(xor(e.sig, q.sig)) <= 3
QUALIFY rank <= {ANN_K}"""
    sig8 = lsh_signature_expr(_lsh_planes(64, 8))
    # explicit bucket materialization (sig xor each 1-bit probe on both
    # sides == hamming<=2) so the engine's max_bucket drop (dedup.py
    # embedding_near_dup_lsh) is mirrored bucket-for-bucket
    from s2ray.pipelines.dedup import EMB_LSH_MAX_BUCKET

    probe_vals = ", ".join(f"({p})" for p in [0] + [1 << b for b in range(8)])
    emb_lsh_sql = f"""
WITH s AS (SELECT vec_id, embedding, {sig8} AS sig FROM embeddings),
probes(p) AS (VALUES {probe_vals}),
m AS (SELECT vec_id, xor(sig, CAST(p AS BIGINT)) AS bucket
      FROM s CROSS JOIN probes),
ok AS (SELECT bucket FROM m GROUP BY bucket
       HAVING count(*) <= {EMB_LSH_MAX_BUCKET}),
cand AS (SELECT DISTINCT a.vec_id AS i, b.vec_id AS j
         FROM m a JOIN m b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         JOIN ok ON ok.bucket = a.bucket)
SELECT c.i, c.j
FROM cand c JOIN s sa ON sa.vec_id = c.i JOIN s sb ON sb.vec_id = c.j
WHERE list_cosine_similarity(CAST(sa.embedding AS DOUBLE[]),
        CAST(sb.embedding AS DOUBLE[])) >= {EMB_TAU!r}"""
    knn_emb_sql = f"""
SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
       CAST(row_number() OVER (
         PARTITION BY q.vec_id
         ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                         CAST(q.embedding AS DOUBLE[])) DESC,
                  e.vec_id) AS BIGINT) AS rank
FROM embeddings e
CROSS JOIN (SELECT * FROM embeddings WHERE vec_id IN ({ann_ids})) q
WHERE e.vec_id <> q.vec_id
QUALIFY rank <= {ANN_K}"""
    bulk_ids = ", ".join(str(q) for q in ANN_BULK_QUERY_IDS)
    knn_bulk_sql = knn_emb_sql.replace(f"IN ({ann_ids})", f"IN ({bulk_ids})")
    text_stats_sql = """
SELECT doc_id,
       length(text) AS n_chars,
       len(toks) AS n_tokens,
       len(list_distinct(toks)) AS n_distinct_tokens,
       coalesce(list_aggregate(list_transform(toks, x -> length(x)), 'sum'),
                0) * 1.0 / greatest(1, len(toks)) AS avg_token_len
FROM (SELECT doc_id, text,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
      FROM (SELECT doc_id, coalesce(text, '') AS text FROM documents))"""
    # text-analysis oracles (semantics defined SQL-mirrorable; see text.py)
    from s2ray.pipelines.text import LangId, fingerprint_sql

    stop_in = ", ".join(f"'{w}'" for w in sorted(
        "the a an and or of to in is are was were for on with as by at "
        "from".split()))
    quality_sql = f"""
WITH q AS (
  SELECT doc_id, len(toks) AS ntok, length(text) AS nchars,
         length(text) - length(regexp_replace(text,
             '[A-Za-z \\t\\n\\r\\x0b\\x0c]', '', 'g')) AS alpha_n,
         len(list_filter(toks, x -> x IN ({stop_in}))) AS stop_n,
         len(list_distinct(toks)) AS ndist,
         list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS tokchars
  FROM (SELECT doc_id, text,
               list_filter(regexp_split_to_array(text, '\\s+'),
                           x -> x <> '') AS toks
        FROM (SELECT doc_id, coalesce(text, '') AS text FROM documents))
), r AS (
  SELECT doc_id,
         CASE WHEN ntok = 0 THEN 0.0 ELSE stop_n / ntok END AS stop_ratio,
         CASE WHEN ntok = 0 THEN 0.0
              ELSE alpha_n / greatest(1, nchars) END AS alpha_ratio,
         CASE WHEN ntok = 0 THEN 0.0 ELSE 1.0 - ndist / ntok END AS rep_ratio,
         CASE WHEN ntok = 0 THEN 0.0 ELSE tokchars / ntok END AS mean_len
  FROM q)
SELECT doc_id, stop_ratio, alpha_ratio, rep_ratio,
       least(greatest(alpha_ratio, 0), 1) * 0.4
       + least(greatest(1.0 - rep_ratio * 2.0, 0), 1) * 0.3
       + least(greatest(1.0 - abs(mean_len - 5.0) / 5.0, 0), 1) * 0.2
       + least(greatest(stop_ratio * 5.0, 0), 1) * 0.1 AS quality
FROM r"""
    lang_cols = []
    for lang in sorted(LangId.MARKERS):
        words = ", ".join(f"'{w}'" for w in sorted(LangId.MARKERS[lang].split()))
        lang_cols.append(f"len(list_filter(toks, x -> x IN ({words}))) "
                         f"AS c_{lang}")
    langid_sql = f"""
WITH s AS (
  SELECT doc_id, len(toks) AS ntok, {', '.join(lang_cols)},
         length(substr(text, 1, 200)) AS hlen,
         length(substr(text, 1, 200)) - length(regexp_replace(
             substr(text, 1, 200), '[\\x{{4e00}}-\\x{{9fff}}]', '', 'g'))
           AS cjk_n
  FROM (SELECT doc_id, text,
               list_filter(regexp_split_to_array(lower(text), '\\s+'),
                           x -> x <> '') AS toks
        FROM (SELECT doc_id, coalesce(text, '') AS text FROM documents))
), r AS (
  SELECT doc_id, ntok, hlen, cjk_n,
         CASE WHEN ntok = 0 THEN 0.0 ELSE c_de / ntok END AS s_de,
         CASE WHEN ntok = 0 THEN 0.0 ELSE c_en / ntok END AS s_en,
         CASE WHEN ntok = 0 THEN 0.0 ELSE c_es / ntok END AS s_es,
         CASE WHEN ntok = 0 THEN 0.0 ELSE c_fr / ntok END AS s_fr
  FROM s
), f AS (
  SELECT *, greatest(s_de, s_en, s_es, s_fr) AS g FROM r)
SELECT doc_id,
       CASE WHEN cjk_n > hlen * 0.2 THEN 'zh'
            WHEN ntok = 0 THEN 'und'
            WHEN g > 0.02 THEN (CASE WHEN s_fr = g THEN 'fr'
                                     WHEN s_es = g THEN 'es'
                                     WHEN s_en = g THEN 'en' ELSE 'de' END)
            ELSE 'und' END AS lang_pred,
       CASE WHEN cjk_n > hlen * 0.2 THEN 1.0
            WHEN ntok = 0 THEN 0.0 ELSE g END AS lang_conf
FROM f"""
    fingerprint_oracle = (f"SELECT doc_id, {fingerprint_sql('text')} "
                          f"AS fingerprint FROM documents")
    # incremental-crawl anti-join: docs whose content fingerprint no page
    # in the existing store carries (pages CTE = the store)
    new_docs_oracle = (
        f"{cte}, dfp AS (SELECT doc_id, {fingerprint_sql('text')} "
        f"AS fingerprint FROM documents), "
        f"pfp AS (SELECT DISTINCT {fingerprint_sql('text')} "
        f"AS fingerprint FROM pages) "
        f"SELECT dfp.doc_id, dfp.fingerprint FROM dfp "
        f"WHERE dfp.fingerprint NOT IN (SELECT fingerprint FROM pfp)")
    # capstone: the composed training-data cleaning pipeline, end-to-end —
    # language allow-list + quality threshold + exact dedup + near-dup
    # cluster dedup, each mirroring its already-oracled stage
    langs_in = ", ".join(f"'{x}'" for x in CORPUS_LANGS)
    corpus_keep_sql = f"""
WITH RECURSIVE
qual AS (SELECT doc_id, quality FROM ({quality_sql}) tq),
lng AS (SELECT doc_id, lang_pred FROM ({langid_sql}) tl),
filt AS (SELECT d.doc_id, d.text FROM documents d
         JOIN qual USING (doc_id) JOIN lng USING (doc_id)
         WHERE qual.quality >= {CORPUS_MIN_QUALITY!r}
           AND lng.lang_pred IN ({langs_in})),
ex AS (SELECT min(doc_id) AS doc_id FROM filt GROUP BY text),
{near_dup_ctes.replace("FROM documents", "FROM filt")},
edges AS (SELECT i AS u, j AS v FROM dup UNION ALL SELECT j, i FROM dup),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
clus AS (SELECT u AS doc_id, least(u, min(v)) AS cluster_id
         FROM reach GROUP BY u)
SELECT doc_id FROM ex
WHERE doc_id NOT IN (SELECT doc_id FROM clus WHERE doc_id <> cluster_id)"""
    rect_wrap = (
        f"{cte} SELECT page_id, lat, lng FROM pages_geo "
        f"WHERE lat >= {WRAP_RECT['lat_lo']} AND lat <= {WRAP_RECT['lat_hi']} "
        f"AND (lng >= {WRAP_RECT['lng_lo']} OR lng <= {WRAP_RECT['lng_hi']})"
    )
    per_month = (
        f"{cte} SELECT date_trunc('month', make_timestamp("
        f"(1704067200 + (page_id * 40499) % 31536000) * 1000000)) AS month, "
        f"count(*) AS n_pages FROM pages_geo GROUP BY 1"
    )
    domains = (
        f"{cte} SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS domain, "
        f"count(*) AS n_pages FROM pages_geo GROUP BY 1"
    )
    # per-domain language entropy: the c*ln(c) fold is ORDER-PINNED to
    # ascending lang (list ORDER BY + sequential list_reduce) so the IEEE
    # addition sequence matches the engine's left fold bit-for-bit
    lang_entropy = (
        f"{cte}, cl AS (SELECT "
        "regexp_extract(url, 'https://([^/]+)/', 1) AS domain, lang, "
        "CAST(count(*) AS BIGINT) AS c FROM pages_geo GROUP BY 1, 2), "
        "agg AS (SELECT domain, CAST(sum(c) AS BIGINT) AS n_pages, "
        "CAST(count(*) AS BIGINT) AS n_langs, "
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) ORDER BY lang)), "
        "(a, b) -> a + b) AS s FROM cl GROUP BY domain) "
        "SELECT domain, n_pages, n_langs, "
        "round(ln(CAST(n_pages AS DOUBLE)) - s / n_pages, 6) "
        "AS lang_entropy FROM agg"
    )
    # time-keyed operator contract: NULL-ts events are unattributable to
    # any bucket/window/session and ignored on both engines
    hourly = (
        "SELECT date_trunc('hour', ts) AS hour, event_type, "
        "count(*) AS n_events, round(sum(value), 6) AS sum_value "
        "FROM events WHERE ts IS NOT NULL GROUP BY 1, 2"
    )
    # sliding windows: 1h window / 30min slide; mirror the engine's
    # floor-to-second timestamps exactly
    # window base via the double-mod FLOOR (es - ((es % s) + s) % s),
    # matching numpy's floor-dividing // for pre-1970 timestamps —
    # DuckDB's integer // truncates toward zero (cf. the
    # events_sliding_distinct oracle, same guard)
    sliding = """
SELECT make_timestamp(w * 1000000) AS window_start, event_type,
       count(*) AS n_events
FROM (
  SELECT es - ((es % 1800) + 1800) % 1800 - 1800 * k.k AS w,
         es, event_type
  FROM (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS es, event_type
        FROM events WHERE ts IS NOT NULL)
  CROSS JOIN (VALUES (0), (1)) AS k(k)
) WHERE es < w + 3600
GROUP BY 1, 2"""
    sessions = """
SELECT user_id, make_timestamp(start * 1000000) AS session_start,
       CAST(n AS BIGINT) AS n_events, CAST(dur AS BIGINT) AS duration_s
FROM (
  SELECT user_id, min(es) AS start, max(es) - min(es) AS dur, count(*) AS n
  FROM (
    SELECT user_id, es,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY es
                             ROWS UNBOUNDED PRECEDING) AS sess
    FROM (
      SELECT user_id, es,
             CASE WHEN lag(es) OVER (PARTITION BY user_id ORDER BY es) IS NULL
                    OR es - lag(es) OVER (PARTITION BY user_id ORDER BY es) > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)
    )
  ) GROUP BY user_id, sess
)"""
    # session-duration quantiles: the sessionization CTE feeding
    # quantile_disc — the engine composes the same two oracled stages
    session_q_sql = (
        "WITH s AS (" + sessions + ") SELECT 'all' AS grp, unnest(["
        + ", ".join(f"{q!r}" for q in SESSION_QS)
        + "]) AS q, unnest(quantile_disc(CAST(duration_s AS DOUBLE), ["
        + ", ".join(f"{q!r}" for q in SESSION_QS)
        + "])) AS value FROM s"
    )
    city_dist = (
        "2 * 6371000 * asin(sqrt("
        "(1 - cos(radians(p.lat) - radians(c.clat))) / 2 "
        "+ cos(radians(p.lat)) * cos(radians(c.clat)) "
        "* (1 - cos(radians(p.lng) - radians(c.clng))) / 2))"
    )
    top3 = f"""{cte} SELECT region_id, page_id,
       CAST(rank AS BIGINT) AS rank, round(d, 3) AS dist_m
FROM (
  SELECT c.region_id AS region_id, p.page_id AS page_id, {city_dist} AS d,
         row_number() OVER (PARTITION BY c.region_id
                            ORDER BY {city_dist}, p.page_id) AS rank
  FROM pages_geo p
  CROSS JOIN (VALUES {{city_values}}) AS c(region_id, clat, clng)
  WHERE {city_dist} <= {CAP_RADIUS_M!r}
) WHERE rank <= 3"""
    top3 = top3.replace("{city_values}", city_values)
    # zonal stats: same join + distance; centroid from exact int e4 sums,
    # float reductions are min/max only (order-free -> hash-stable)
    zonal = f"""{cte} SELECT region_id, count(*) AS n_pages,
       round(sum(CAST(round(lat * 10000, 0) AS BIGINT))
             / (count(*) * 10000.0), 6) AS avg_lat,
       round(sum(CAST(round(lng * 10000, 0) AS BIGINT))
             / (count(*) * 10000.0), 6) AS avg_lng,
       round(min(d), 3) AS min_dist_m, round(max(d), 3) AS max_dist_m
FROM (
  SELECT c.region_id AS region_id, p.lat AS lat, p.lng AS lng,
         {{city_dist}} AS d
  FROM pages_geo p
  CROSS JOIN (VALUES {{city_values}}) AS c(region_id, clat, clng)
  WHERE {{city_dist}} <= {CAP_RADIUS_M!r}
) GROUP BY region_id"""
    zonal = zonal.replace("{city_values}", city_values) \
                 .replace("{city_dist}", city_dist)
    centroids = (
        "SELECT label, CAST(dim AS BIGINT) AS dim, "
        "round(avg(CAST(v AS DOUBLE)), 4) AS centroid FROM ("
        "  SELECT label, unnest(embedding) AS v, "
        "         unnest(range(1, len(embedding) + 1)) AS dim FROM embeddings"
        ") GROUP BY label, dim"
    )
    return {
        "tile_counts_l8": tile_counts_sql,
        "tile_quantiles": tile_quantiles_sql,
        "tile_diversity": tile_diversity_sql,
        # spatio-temporal LAG: a tile's first observed month takes prev=0
        # (all-int64 contract — nullable numerics hash differently across
        # pandas Int64 / float64-NaN canonicalizations, so the operator
        # avoids them by definition); month from page_id like pages_per_month
        "tile_growth": (
            f"{cte}, tm AS (SELECT cell_token, date_trunc('month', "
            "make_timestamp((1704067200 + (page_id * 40499) % 31536000) "
            "* 1000000)) AS month, CAST(count(*) AS BIGINT) AS n_pages "
            "FROM ("
            + s2_cell_select(
                "SELECT page_id, lat, lng FROM pages_geo",
                level=TILE_Q_LEVEL)
            + ") GROUP BY cell_token, month) "
            "SELECT cell_token, month, n_pages, "
            "coalesce(lag(n_pages) OVER w, 0) AS prev_n_pages, "
            "n_pages - coalesce(lag(n_pages) OVER w, 0) AS delta FROM tm "
            "WINDOW w AS (PARTITION BY cell_token ORDER BY month)"
        ),
        "session_quantiles": session_q_sql,
        "tile_pyramid": tile_pyramid_sql,
        "adaptive_tiles": _adaptive_tiles_oracle(cte),
        "redact_pii": _redact_pii_oracle(cte),
        "inverted_index": _inverted_index_oracle(),
        "covering_member_join": covering_member_sql,
        "boolean_pip_join": boolean_pip_sql,
        "region_relations": polygon_relations_select(_relation_regions()),
        "polyline_near": polyline_near_sql,
        "rect_filter": rect,
        "rect_filter_wrap": rect_wrap,
        "knn_moscow": knn,
        "rect_distance_rank": rect_dist_rank,
        "knn_pruned_moscow": knn,
        "pages_per_month": per_month,
        "url_domain_counts": domains,
        "domain_lang_entropy": lang_entropy,
        "events_hourly": hourly,
        "events_sliding": sliding,
        "user_sessions": sessions,
        "emb_centroids": centroids,
        "top3_per_city": top3,
        "zonal_stats": zonal,
        "grid_clusters": _grid_clusters_oracle(cte),
        # Moore stencil as 8-way LEFT self-join on the aggregated grid;
        # the double-mod keeps DuckDB's sign-of-dividend % equal to
        # numpy's floor-mod for the antimeridian wrap
        "grid_smooth": (
            f"{cte}, g AS (SELECT CAST(floor(lat / 1.0) AS BIGINT) AS gy, "
            "CAST(floor(lng / 1.0) AS BIGINT) AS gx, count(*) AS n "
            "FROM pages_geo GROUP BY 1, 2), "
            "d AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),"
            "(0,1),(1,-1),(1,0),(1,1)) AS t(dy, dx)) "
            "SELECT a.gx AS gx, a.gy AS gy, CAST(a.n AS BIGINT) AS n_pages, "
            "CAST(coalesce(sum(b.n), 0) AS BIGINT) AS nb_pages, "
            "CAST(count(b.n) AS BIGINT) AS nb_cells "
            "FROM g a CROSS JOIN d LEFT JOIN g b "
            "ON b.gy = a.gy + d.dy "
            "AND b.gx = ((a.gx + d.dx + 180) % 360 + 360) % 360 - 180 "
            "GROUP BY a.gx, a.gy, a.n"
        ),
        # grid KDE: truncated Gaussian splat; every float intermediate is
        # bound in a CTE with the engine's exact associativity (haversine
        # per SmokeTest.php:12-21, then exp), and each contribution is
        # quantized to 1e-9 fixed point so the per-cell sum is order-free
        "grid_kde": (
            f"{cte}, pg AS (SELECT radians(lat) AS lat_r, "
            "radians(lng) AS lng_r, "
            "CAST(floor(lat / 1.0) AS BIGINT) AS gy, "
            "CAST(floor(lng / 1.0) AS BIGINT) AS gx FROM pages_geo), "
            "d9 AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),"
            "(0,0),(0,1),(1,-1),(1,0),(1,1)) AS t(dy, dx)), "
            "tg AS (SELECT pg.gy + d9.dy AS ty, "
            "((pg.gx + d9.dx + 180) % 360 + 360) % 360 - 180 AS tx, "
            "lat_r, lng_r FROM pg CROSS JOIN d9), "
            "hv AS (SELECT ty, tx, lat_r, lng_r, "
            "radians((CAST(ty AS DOUBLE) + 0.5) * 1.0) AS c_lat, "
            "radians((CAST(tx AS DOUBLE) + 0.5) * 1.0) AS c_lng FROM tg), "
            "dd AS (SELECT ty, tx, 2 * 6371000 * asin(sqrt("
            "(1 - cos(lat_r - c_lat)) / 2 "
            "+ cos(lat_r) * cos(c_lat) * ((1 - cos(lng_r - c_lng)) / 2)"
            ")) AS d FROM hv), "
            "qq AS (SELECT ty, tx, CAST(round("
            "exp(-(d * d) / 20000000000.0) * 1000000000.0) AS BIGINT) "
            "AS q FROM dd) "
            "SELECT tx AS gx, ty AS gy, "
            "round(CAST(sum(q) AS DOUBLE) / 1000000000.0, 6) AS kde "
            "FROM qq GROUP BY 1, 2"
        ),
        # Moran's I: same Moore-stencil self-join; HUGEINT moments keep
        # the scaled-through-by-N^2 numerator exact, and the final
        # CAST-to-DOUBLE-then-divide matches the engine's float(num) /
        # float(den) bit-for-bit
        "morans_i_chars": (
            f"{cte}, g AS (SELECT CAST(floor(lat / 1.0) AS BIGINT) AS gy, "
            "CAST(floor(lng / 1.0) AS BIGINT) AS gx, "
            "CAST(sum(length(coalesce(text, ''))) AS BIGINT) AS n "
            "FROM pages_geo GROUP BY 1, 2), "
            "d AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),"
            "(0,1),(1,-1),(1,0),(1,1)) AS t(dy, dx)), "
            "nb AS (SELECT a.gx, a.gy, a.n, "
            "CAST(coalesce(sum(b.n), 0) AS HUGEINT) AS nbp, "
            "CAST(count(b.n) AS HUGEINT) AS deg "
            "FROM g a CROSS JOIN d LEFT JOIN g b "
            "ON b.gy = a.gy + d.dy "
            "AND b.gx = ((a.gx + d.dx + 180) % 360 + 360) % 360 - 180 "
            "GROUP BY a.gx, a.gy, a.n), "
            "m AS (SELECT CAST(count(*) AS HUGEINT) AS n, "
            "CAST(sum(n) AS HUGEINT) AS t, "
            "CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT) AS sxx, "
            "CAST(coalesce(sum(deg), 0) AS HUGEINT) AS s0, "
            "CAST(coalesce(sum(CAST(n AS HUGEINT) * nbp), 0) AS HUGEINT) "
            "AS wxx, "
            "CAST(coalesce(sum(deg * CAST(n AS HUGEINT) + nbp), 0) "
            "AS HUGEINT) AS wsum FROM nb) "
            "SELECT CAST(n AS BIGINT) AS n_cells, "
            "CAST(s0 AS BIGINT) AS n_links, "
            "CASE WHEN s0 * (n * sxx - t * t) = 0 THEN NULL ELSE "
            "round(CAST(n * n * wxx - n * t * wsum + t * t * s0 AS DOUBLE) "
            "/ CAST(s0 * (n * sxx - t * t) AS DOUBLE), 6) END AS moran_i "
            "FROM m"
        ),
        "morans_i": (
            f"{cte}, g AS (SELECT CAST(floor(lat / 1.0) AS BIGINT) AS gy, "
            "CAST(floor(lng / 1.0) AS BIGINT) AS gx, count(*) AS n "
            "FROM pages_geo GROUP BY 1, 2), "
            "d AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),"
            "(0,1),(1,-1),(1,0),(1,1)) AS t(dy, dx)), "
            "nb AS (SELECT a.gx, a.gy, a.n, "
            "CAST(coalesce(sum(b.n), 0) AS HUGEINT) AS nbp, "
            "CAST(count(b.n) AS HUGEINT) AS deg "
            "FROM g a CROSS JOIN d LEFT JOIN g b "
            "ON b.gy = a.gy + d.dy "
            "AND b.gx = ((a.gx + d.dx + 180) % 360 + 360) % 360 - 180 "
            "GROUP BY a.gx, a.gy, a.n), "
            "m AS (SELECT CAST(count(*) AS HUGEINT) AS n, "
            "CAST(sum(n) AS HUGEINT) AS t, "
            "CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT) AS sxx, "
            "CAST(coalesce(sum(deg), 0) AS HUGEINT) AS s0, "
            "CAST(coalesce(sum(CAST(n AS HUGEINT) * nbp), 0) AS HUGEINT) "
            "AS wxx, "
            "CAST(coalesce(sum(deg * CAST(n AS HUGEINT) + nbp), 0) "
            "AS HUGEINT) AS wsum FROM nb) "
            "SELECT CAST(n AS BIGINT) AS n_cells, "
            "CAST(s0 AS BIGINT) AS n_links, "
            "CASE WHEN s0 * (n * sxx - t * t) = 0 THEN NULL ELSE "
            "round(CAST(n * n * wxx - n * t * wsum + t * t * s0 AS DOUBLE) "
            "/ CAST(s0 * (n * sxx - t * t) AS DOUBLE), 6) END AS moran_i "
            "FROM m"
        ),
        # Geary's C: same Moore-stencil self-join; the pairwise
        # difference sum is 2*(DXX - WXX) by stencil symmetry, and the
        # scaled-through-by-N all-integer form N*(N-1)*(DXX-WXX) /
        # (S0*(N*SXX-T^2)) stays exact in HUGEINT; the final
        # CAST-to-DOUBLE-then-divide matches the engine bit-for-bit
        "geary_c": (
            f"{cte}, g AS (SELECT CAST(floor(lat / 1.0) AS BIGINT) AS gy, "
            "CAST(floor(lng / 1.0) AS BIGINT) AS gx, count(*) AS n "
            "FROM pages_geo GROUP BY 1, 2), "
            "d AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),"
            "(0,1),(1,-1),(1,0),(1,1)) AS t(dy, dx)), "
            "nb AS (SELECT a.gx, a.gy, a.n, "
            "CAST(coalesce(sum(b.n), 0) AS HUGEINT) AS nbp, "
            "CAST(count(b.n) AS HUGEINT) AS deg "
            "FROM g a CROSS JOIN d LEFT JOIN g b "
            "ON b.gy = a.gy + d.dy "
            "AND b.gx = ((a.gx + d.dx + 180) % 360 + 360) % 360 - 180 "
            "GROUP BY a.gx, a.gy, a.n), "
            "m AS (SELECT CAST(count(*) AS HUGEINT) AS n, "
            "CAST(sum(n) AS HUGEINT) AS t, "
            "CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT) AS sxx, "
            "CAST(coalesce(sum(deg), 0) AS HUGEINT) AS s0, "
            "CAST(coalesce(sum(CAST(n AS HUGEINT) * nbp), 0) AS HUGEINT) "
            "AS wxx, "
            "CAST(coalesce(sum(deg * CAST(n AS HUGEINT) * n), 0) "
            "AS HUGEINT) AS dxx FROM nb) "
            "SELECT CAST(n AS BIGINT) AS n_cells, "
            "CAST(s0 AS BIGINT) AS n_links, "
            "CASE WHEN s0 * (n * sxx - t * t) = 0 THEN NULL ELSE "
            "round(CAST(n * (n - 1) * (dxx - wxx) AS DOUBLE) "
            "/ CAST(s0 * (n * sxx - t * t) AS DOUBLE), 6) END AS geary_c "
            "FROM m"
        ),
        # Getis-Ord Gi*: same Moore stencil with self added back (W = deg+1,
        # L = nbp + n); HUGEINT A/B/C moments stay exact at web scale, and
        # the CAST-to-DOUBLE-then-divide/sqrt chain matches the engine's
        # float(a) / (sqrt(float(b)) * sqrt(float(c)/float(d))) bit-for-bit
        # Local Moran (LISA): same Moore-stencil self-join as morans_i;
        # the per-cell deviation/lag scaled through by N stay exact
        # HUGEINTs, and the quadrant label is pure integer signs
        "local_moran": (
            f"{cte}, g AS (SELECT CAST(floor(lat / 1.0) AS BIGINT) AS gy, "
            "CAST(floor(lng / 1.0) AS BIGINT) AS gx, count(*) AS n "
            "FROM pages_geo GROUP BY 1, 2), "
            "d AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),"
            "(0,1),(1,-1),(1,0),(1,1)) AS t(dy, dx)), "
            "nb AS (SELECT a.gx, a.gy, a.n, "
            "CAST(coalesce(sum(b.n), 0) AS HUGEINT) AS nbp, "
            "CAST(count(b.n) AS HUGEINT) AS deg "
            "FROM g a CROSS JOIN d LEFT JOIN g b "
            "ON b.gy = a.gy + d.dy "
            "AND b.gx = ((a.gx + d.dx + 180) % 360 + 360) % 360 - 180 "
            "GROUP BY a.gx, a.gy, a.n), "
            "m AS (SELECT CAST(count(*) AS HUGEINT) AS n, "
            "CAST(sum(n) AS HUGEINT) AS t, "
            "CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT) AS sxx FROM nb) "
            "SELECT nb.gx AS gx, nb.gy AS gy, "
            "CAST(nb.n AS BIGINT) AS n_pages, "
            "CASE WHEN m.n * m.sxx - m.t * m.t = 0 THEN NULL ELSE "
            "round(CAST((m.n * nb.n - m.t) * (m.n * nb.nbp - nb.deg * m.t) "
            "AS DOUBLE) / CAST(m.n * m.sxx - m.t * m.t AS DOUBLE), 6) END "
            "AS lisa, "
            "CASE WHEN m.n * nb.n - m.t > 0 "
            "AND m.n * nb.nbp - nb.deg * m.t > 0 THEN 'HH' "
            "WHEN m.n * nb.n - m.t < 0 "
            "AND m.n * nb.nbp - nb.deg * m.t < 0 THEN 'LL' "
            "WHEN m.n * nb.n - m.t > 0 "
            "AND m.n * nb.nbp - nb.deg * m.t < 0 THEN 'HL' "
            "WHEN m.n * nb.n - m.t < 0 "
            "AND m.n * nb.nbp - nb.deg * m.t > 0 THEN 'LH' "
            "ELSE 'EQ' END AS quadrant "
            "FROM nb CROSS JOIN m"
        ),
        # standard deviational ellipse: HUGEINT e4 fixed-point moments,
        # then the engine's exact eigen/rotation float chain — each CAST,
        # divide, sqrt and atan2 in the identical IEEE op order
        "lang_ellipse": (
            f"{cte}, m AS (SELECT lang, CAST(count(*) AS HUGEINT) AS n, "
            "sum(CAST(lng_e4 AS HUGEINT)) AS sx, "
            "sum(CAST(lat_e4 AS HUGEINT)) AS sy, "
            "sum(CAST(lng_e4 AS HUGEINT) * lng_e4) AS sxx, "
            "sum(CAST(lat_e4 AS HUGEINT) * lat_e4) AS syy, "
            "sum(CAST(lng_e4 AS HUGEINT) * lat_e4) AS sxy "
            "FROM pages GROUP BY lang), "
            "f AS (SELECT lang, n, CAST(n AS DOUBLE) AS dn, "
            "CAST(sx AS DOUBLE) AS dsx, CAST(sy AS DOUBLE) AS dsy, "
            "CAST(n * sxx - sx * sx AS DOUBLE) AS fa, "
            "CAST(n * syy - sy * sy AS DOUBLE) AS fb, "
            "CAST(n * sxy - sx * sy AS DOUBLE) AS fc FROM m), "
            "g AS (SELECT *, sqrt(((fa - fb) / 2.0) * ((fa - fb) / 2.0) "
            "+ fc * fc) AS disc FROM f) "
            "SELECT lang, CAST(n AS BIGINT) AS n_pages, "
            "round(dsy / dn / 10000.0, 6) AS mean_lat, "
            "round(dsx / dn / 10000.0, 6) AS mean_lng, "
            "round(degrees(0.5 * atan2(2.0 * fc, fa - fb)), 6) "
            "AS theta_deg, "
            "round(sqrt((fa + fb) / 2.0 + disc) / dn / 10000.0, 6) "
            "AS sigma_major_deg, "
            "round(sqrt(GREATEST((fa + fb) / 2.0 - disc, 0.0)) "
            "/ dn / 10000.0, 6) AS sigma_minor_deg "
            "FROM g ORDER BY lang"
        ),
        # Mann-Kendall per cell: zero-filled dense (cell x 12 months)
        # counts via cells x months CROSS JOIN + LEFT JOIN, then the
        # C(12,2) sign fold as a month-pair self-join — every output is
        # an integer, no float parity surface
        "tile_mann_kendall": (
            f"{cte}, pg AS (SELECT "
            "CAST(floor(lat / 1.0) AS BIGINT) AS gy, "
            "CAST(floor(lng / 1.0) AS BIGINT) AS gx, "
            "CAST(date_diff('month', DATE '2024-01-01', "
            "date_trunc('month', make_timestamp("
            "(1704067200 + (page_id * 40499) % 31536000) * 1000000))) "
            "AS BIGINT) AS m FROM pages_geo), "
            "g AS (SELECT gx, gy, m, CAST(count(*) AS BIGINT) AS n "
            "FROM pg GROUP BY 1, 2, 3), "
            "cells AS (SELECT DISTINCT gx, gy FROM g), "
            "mon AS (SELECT CAST(range AS BIGINT) AS m FROM range(12)), "
            "dense AS (SELECT c.gx, c.gy, mon.m, "
            "coalesce(g.n, 0) AS n FROM cells c CROSS JOIN mon "
            "LEFT JOIN g ON g.gx = c.gx AND g.gy = c.gy AND g.m = mon.m), "
            "pr AS (SELECT a.gx, a.gy, CASE WHEN b.n > a.n THEN 1 "
            "WHEN b.n < a.n THEN -1 ELSE 0 END AS s "
            "FROM dense a JOIN dense b "
            "ON b.gx = a.gx AND b.gy = a.gy AND b.m > a.m), "
            "agg AS (SELECT gx, gy, CAST(sum(s) AS BIGINT) AS mk_s "
            "FROM pr GROUP BY 1, 2), "
            "tot AS (SELECT gx, gy, CAST(sum(n) AS BIGINT) AS n_pages, "
            "CAST(count(*) FILTER (n > 0) AS BIGINT) AS n_months_active "
            "FROM dense GROUP BY 1, 2) "
            "SELECT tot.gx AS gx, tot.gy AS gy, tot.n_pages AS n_pages, "
            "agg.mk_s AS mk_s, tot.n_months_active AS n_months_active "
            "FROM tot JOIN agg ON agg.gx = tot.gx AND agg.gy = tot.gy"
        ),
        # join counts: hot = N*x > T (HUGEINT cross-multiply); the Moore
        # self-join counts every undirected link exactly twice, halved as
        # exact even integers with // (Moore wrap adjacency is symmetric
        # and irreflexive at W = 360)
        "lang_frontier": (
            f"{cte}, g AS (SELECT CAST(floor(lat / 1.0) AS BIGINT) AS gy, "
            "CAST(floor(lng / 1.0) AS BIGINT) AS gx, lang, "
            "count(*) AS n FROM pages_geo WHERE lang IS NOT NULL "
            "GROUP BY 1, 2, 3), "
            "dom AS (SELECT gy, gx, lang FROM ("
            "SELECT gy, gx, lang, row_number() OVER ("
            "PARTITION BY gy, gx ORDER BY n DESC, lang) AS rn FROM g) "
            "WHERE rn = 1), "
            "d AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),"
            "(0,1),(1,-1),(1,0),(1,1)) AS t(dy, dx)), "
            "l AS (SELECT least(a.lang, b.lang) AS lang_a, "
            "greatest(a.lang, b.lang) AS lang_b "
            "FROM dom a CROSS JOIN d JOIN dom b "
            "ON b.gy = a.gy + d.dy "
            "AND b.gx = ((a.gx + d.dx + 180) % 360 + 360) % 360 - 180) "
            "SELECT lang_a, lang_b, CAST(count(*) // 2 AS BIGINT) "
            "AS n_links FROM l GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "join_counts": (
            f"{cte}, g AS (SELECT CAST(floor(lat / 1.0) AS BIGINT) AS gy, "
            "CAST(floor(lng / 1.0) AS BIGINT) AS gx, count(*) AS n "
            "FROM pages_geo GROUP BY 1, 2), "
            "m AS (SELECT CAST(count(*) AS HUGEINT) AS nc, "
            "CAST(coalesce(sum(n), 0) AS HUGEINT) AS t FROM g), "
            "h AS (SELECT gx, gy, "
            "(m.nc * n > m.t) AS hot FROM g CROSS JOIN m), "
            "d AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),"
            "(0,1),(1,-1),(1,0),(1,1)) AS t(dy, dx)), "
            "l AS (SELECT a.hot AS ah, b.hot AS bh "
            "FROM h a CROSS JOIN d JOIN h b "
            "ON b.gy = a.gy + d.dy "
            "AND b.gx = ((a.gx + d.dx + 180) % 360 + 360) % 360 - 180) "
            "SELECT (SELECT CAST(nc AS BIGINT) FROM m) AS n_cells, "
            "(SELECT CAST(count(*) AS BIGINT) FROM h WHERE hot) AS n_hot, "
            "CAST(count(*) // 2 AS BIGINT) AS n_links, "
            "CAST(coalesce(count(*) FILTER (ah AND bh), 0) // 2 AS BIGINT) "
            "AS bb_links, "
            "CAST(coalesce(count(*) FILTER ((NOT ah) AND (NOT bh)), 0) "
            "// 2 AS BIGINT) AS ww_links, "
            "CAST(coalesce(count(*) FILTER (ah <> bh), 0) // 2 AS BIGINT) "
            "AS bw_links FROM l"
        ),
        "getis_ord": (
            f"{cte}, g AS (SELECT CAST(floor(lat / 1.0) AS BIGINT) AS gy, "
            "CAST(floor(lng / 1.0) AS BIGINT) AS gx, count(*) AS n "
            "FROM pages_geo GROUP BY 1, 2), "
            "d AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),"
            "(0,1),(1,-1),(1,0),(1,1)) AS t(dy, dx)), "
            "nb AS (SELECT a.gx, a.gy, a.n, "
            "CAST(coalesce(sum(b.n), 0) AS HUGEINT) + a.n AS li, "
            "CAST(count(b.n) AS HUGEINT) + 1 AS wi "
            "FROM g a CROSS JOIN d LEFT JOIN g b "
            "ON b.gy = a.gy + d.dy "
            "AND b.gx = ((a.gx + d.dx + 180) % 360 + 360) % 360 - 180 "
            "GROUP BY a.gx, a.gy, a.n), "
            "m AS (SELECT CAST(count(*) AS HUGEINT) AS n, "
            "CAST(sum(n) AS HUGEINT) AS t, "
            "CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT) AS sxx FROM nb) "
            "SELECT nb.gx AS gx, nb.gy AS gy, "
            "CAST(nb.n AS BIGINT) AS n_pages, "
            "CASE WHEN m.n * m.sxx - m.t * m.t <= 0 OR m.n <= 1 "
            "OR m.n * wi - wi * wi <= 0 THEN NULL ELSE "
            "round(CAST(m.n * li - m.t * wi AS DOUBLE) "
            "/ (sqrt(CAST(m.n * m.sxx - m.t * m.t AS DOUBLE)) "
            "* sqrt(CAST(m.n * wi - wi * wi AS DOUBLE) "
            "/ CAST(m.n - 1 AS DOUBLE))), 6) END AS gi_z "
            "FROM nb CROSS JOIN m"
        ),
        # domain link graph: outlink slots j < 1 + page_id % 3, target
        # domain ((page_id * MUL + j * 97) % 2^32) % 20 — the derivation
        # is SQL-mirrored exactly like the pages synth's geo; src domain
        # extracted from the url with the same regex as url_domain_counts
        "domain_link_graph": (
            f"{cte}, e AS (SELECT "
            "regexp_extract(url, 'https://([^/]+)/', 1) AS src_domain, "
            "'src' || CAST(((page_id * 2654435761 + j.j * 97) "
            "% 4294967296) % 20 AS VARCHAR) || '.example.com' "
            "AS dst_domain "
            "FROM pages_geo CROSS JOIN (VALUES (0),(1),(2)) AS j(j) "
            "WHERE j.j < 1 + page_id % 3) "
            "SELECT src_domain, dst_domain, "
            "CAST(count(*) AS BIGINT) AS n_links FROM e GROUP BY 1, 2"
        ),
        "domain_pagerank": _domain_pagerank_oracle(cte),
        "domain_hits": domain_hits_sql(cte),
        "domain_reciprocity": domain_reciprocity_sql(cte),
        "domain_assortativity": domain_assortativity_sql(cte),
        "domain_clustering": domain_clustering_sql(cte),
        "colocation_quotient": colocation_sql,
        "knox_pairs": knox_sql,
        "peak_window": peak_window_sql(),
        "supplier_lead_time": SUPPLIER_LEAD_TIME_SQL,
        "silhouette_hist": SILHOUETTE_HIST_SQL,
        "tile_zipf": tile_zipf_sql,
        "tile_entropy": (
            f"{cte}, tc AS (SELECT cell_id, "
            "CAST(count(*) AS BIGINT) AS x FROM ("
            + s2_cell_select("SELECT lat, lng FROM pages_geo", level=8)
            + ") GROUP BY cell_id), "
            "m AS (SELECT CAST(count(*) AS BIGINT) AS n, "
            "CAST(coalesce(sum(x), 0) AS BIGINT) AS total FROM tc), "
            "f AS (SELECT m.n, m.total, "
            "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            "list((CAST(x AS DOUBLE) / CAST(m.total AS DOUBLE)) "
            "* ln(CAST(x AS DOUBLE) / CAST(m.total AS DOUBLE)) "
            "ORDER BY cell_id)), (a, b) -> a + b) AS acc "
            "FROM tc CROSS JOIN m GROUP BY m.n, m.total) "
            "SELECT n AS n_tiles, total AS total_pages, "
            "CASE WHEN total = 0 THEN NULL ELSE round(-acc, 6) END "
            "AS entropy FROM f"
        ),
        "tile_gini": (
            f"{cte}, tc AS (SELECT CAST(count(*) AS BIGINT) AS x FROM ("
            + s2_cell_select("SELECT lat, lng FROM pages_geo", level=8)
            + ") GROUP BY cell_id), "
            "r AS (SELECT x, row_number() OVER (ORDER BY x) AS i "
            "FROM tc), "
            "m AS (SELECT CAST(count(*) AS HUGEINT) AS n, "
            "CAST(coalesce(sum(x), 0) AS HUGEINT) AS s1, "
            "CAST(coalesce(sum(CAST(i AS HUGEINT) * x), 0) AS HUGEINT) "
            "AS s2 FROM r) "
            "SELECT CAST(n AS BIGINT) AS n_tiles, "
            "CAST(s1 AS BIGINT) AS total_pages, "
            "CASE WHEN n * s1 = 0 THEN NULL ELSE "
            "round(CAST(2 * s2 - (n + 1) * s1 AS DOUBLE) "
            "/ CAST(n * s1 AS DOUBLE), 6) END AS gini FROM m"
        ),
        "user_growth": USER_GROWTH_SQL,
        "lang_radius": (
            f"{cte}, q AS (SELECT lang, "
            "CAST(round(cos(radians(lat)) * cos(radians(lng)) "
            "* 1000000000.0) AS BIGINT) AS qx, "
            "CAST(round(cos(radians(lat)) * sin(radians(lng)) "
            "* 1000000000.0) AS BIGINT) AS qy, "
            "CAST(round(sin(radians(lat)) * 1000000000.0) AS BIGINT) "
            "AS qz FROM pages_geo WHERE lang IS NOT NULL), "
            "cent AS (SELECT lang, "
            "round(degrees(atan2(CAST(CAST(sum(qz) AS BIGINT) AS DOUBLE),"
            " sqrt(CAST(CAST(sum(qx) AS BIGINT) AS DOUBLE) "
            "* CAST(CAST(sum(qx) AS BIGINT) AS DOUBLE) "
            "+ CAST(CAST(sum(qy) AS BIGINT) AS DOUBLE) "
            "* CAST(CAST(sum(qy) AS BIGINT) AS DOUBLE)))), 6) AS c_lat, "
            "round(degrees(atan2(CAST(CAST(sum(qy) AS BIGINT) AS DOUBLE),"
            " CAST(CAST(sum(qx) AS BIGINT) AS DOUBLE))), 6) AS c_lng "
            "FROM q GROUP BY 1), "
            "d AS (SELECT p.lang, round(2 * 6371000 * asin(sqrt("
            "(1 - cos(radians(c.c_lat) - radians(p.lat))) / 2 "
            "+ cos(radians(c.c_lat)) * cos(radians(p.lat)) "
            "* (1 - cos(radians(c.c_lng) - radians(p.lng))) / 2)), 3) "
            "AS dm FROM pages_geo p JOIN cent c ON c.lang = p.lang) "
            "SELECT lang, CAST(count(*) AS BIGINT) AS n_pages, "
            "max(dm) AS max_dist_m, "
            "CAST(coalesce(count(*) FILTER (dm > 1000000.0), 0) "
            "AS BIGINT) AS n_beyond FROM d GROUP BY 1 ORDER BY 1"
        ),
        "order_size_hist": ORDER_SIZE_HIST_SQL,
        "token_len_stats": TOKEN_LEN_STATS_SQL,
        "flesch_lang": FLESCH_LANG_SQL,
        "log_odds_keywords": log_odds_keywords_sql(),
        "textrank_keywords": textrank_keywords_sql(),
        "events_quantiles_cont": (
            "SELECT event_type, unnest([0.25, 0.5, 0.75]) AS q, "
            "unnest(quantile_cont(value, [0.25, 0.5, 0.75])) AS value "
            "FROM events WHERE value IS NOT NULL GROUP BY event_type"),
        "char_entropy": CHAR_ENTROPY_SQL,
        "peak_open_orders": peak_open_orders_sql(),
        "basket_pairs": basket_pairs_sql(),
        "basket_lift": basket_lift_sql(),
        "dup_by_length": DUP_BY_LENGTH_SQL,
        "activity_curve": ACTIVITY_CURVE_SQL,
        "event_trigrams": EVENT_TRIGRAMS_SQL,
        "customer_concentration": customer_concentration_sql(),
        "search_rank": search_rank_sql(),
        "search_bm25": search_bm25_sql(),
        "weekly_ma": weekly_ma_sql(),
        "return_rates": return_rates_sql(),
        "revenue_growth": REVENUE_GROWTH_SQL,
        "benford_law": BENFORD_LAW_SQL,
        "new_vs_repeat": NEW_VS_REPEAT_SQL,
        "dau_mau": DAU_MAU_SQL,
        "day_user_jaccard": DAY_USER_JACCARD_SQL,
        "doc_lang_runs": DOC_LANG_RUNS_SQL,
        "mann_whitney_length": MANN_WHITNEY_LENGTH_SQL,
        "kaplan_meier": KAPLAN_MEIER_SQL,
        "yules_k": YULES_K_SQL,
        "ks_test_length": KS_TEST_LENGTH_SQL,
        "lognormal_fit_length": LOGNORMAL_FIT_LENGTH_SQL,
        "weekday_chi2": WEEKDAY_CHI2_SQL,
        "markov_entropy_rate": MARKOV_ENTROPY_RATE_SQL,
        "pettitt_test": PETTITT_TEST_SQL,
        "cohort_ltv": COHORT_LTV_SQL,
        "kruskal_wallis_qty": KRUSKAL_WALLIS_QTY_SQL,
        "user_activity_gini": USER_ACTIVITY_GINI_SQL,
        "anova_len_by_source": ANOVA_LEN_BY_SOURCE_SQL,
        "retention_half_life": RETENTION_HALF_LIFE_SQL,
        "skipgram_pairs": skipgram_pairs_sql(),
        "token_dispersion": token_dispersion_sql(),
        "time_to_convert": time_to_convert_sql(),
        "revenue_seasonality": REVENUE_SEASONALITY_SQL,
        "token_entropy_rate": TOKEN_ENTROPY_RATE_SQL,
        "zipf_abbreviation": ZIPF_ABBREVIATION_SQL,
        "vocab_richness": VOCAB_RICHNESS_SQL,
        "nation_flow": NATION_FLOW_SQL,
        "voronoi_monthly": voronoi_monthly_sql,
        "order_quantiles": (
            "SELECT o_orderpriority, unnest([0.5, 0.9, 0.99]) AS q, "
            "unnest(quantile_disc(o_totalprice, [0.5, 0.9, 0.99])) "
            "AS o_totalprice FROM orders "
            "WHERE o_totalprice IS NOT NULL GROUP BY o_orderpriority"),
        "source_cooccurrence": source_cooccurrence_sql(cte),
        "domain_bfs_depth": domain_bfs_depth_sql(cte),
        "domain_components": domain_components_sql(cte),
        "quadrat_dispersion": quadrat_dispersion_sql,
        "domain_cocitation": domain_cocitation_sql(cte),
        "domain_link_jaccard": domain_link_jaccard_sql(cte),
        "rich_club": rich_club_sql(cte),
        "domain_coupling": domain_coupling_sql(cte),
        "clark_evans": clark_evans_sql,
        "heaps_law": heaps_law_sql(),
        "event_type_trend": EVENT_TYPE_TREND_SQL,
        "source_vocab_jaccard": SOURCE_VOCAB_JACCARD_SQL,
        "shipping_priority": shipping_priority_sql(),
        "geo_destination": destination_points_sql(cte),
        "location_codec": location_codec_sql(cte),
        "returned_items": returned_items_sql(),
        "promo_revenue": promo_revenue_sql(),
        "top_supplier": top_supplier_sql(),
        "large_orders": large_orders_sql(),
        "order_priority_count": order_priority_count_sql(),
        "cust_order_dist": cust_order_dist_sql(),
        "small_qty_revenue": small_qty_revenue_sql(),
        "nation_volume": nation_volume_sql(),
        "supplier_parts_cnt": supplier_parts_cnt_sql(),
        "idle_customers": idle_customers_sql(),
        "forecast_revenue": forecast_revenue_sql(),
        "bracket_revenue": bracket_revenue_sql(),
        "market_share": market_share_sql(),
        "sole_fault_supplier": sole_fault_supplier_sql(),
        "product_profit": product_profit_sql(),
        "part_concentration": part_concentration_sql(),
        "late_shipments": late_shipments_sql(),
        "excess_shippers": excess_shippers_sql(),
        "covered_days": covered_days_sql(),
        "lexical_simpson": LEXICAL_SIMPSON_SQL,
        "anagram_groups": anagram_groups_sql(),
        "order_cadence": ORDER_CADENCE_SQL,
        "order_overlap": order_overlap_sql(),
        "source_overlap": source_overlap_sql(),
        "pivot_lang_counts": pivot_lang_counts_sql(),
        "user_type_matrix": user_type_matrix_sql(),
        "value_histogram": value_histogram_sql(),
        "user_skyline": USER_SKYLINE_SQL,
        "latest_event_state": LATEST_EVENT_STATE_SQL,
        "user_event_paths": user_event_paths_sql(),
        "emb_dim_stats": EMB_DIM_STATS_SQL,
        "pair_dist_hist": pair_dist_hist_sql,
        "dominant_dim_hist": DOMINANT_DIM_HIST_SQL,
        "nn_g_function": nn_g_sql,
        "lang_geo_bbox": lang_bbox_sql,
        "centroid_drift": (
            f"{cte}, q AS (SELECT "
            "date_trunc('month', make_timestamp("
            "(1704067200 + (page_id * 40499) % 31536000) * 1000000)) "
            "AS month, "
            "CAST(round(cos(radians(lat)) * cos(radians(lng)) "
            "* 1000000000.0) AS BIGINT) AS qx, "
            "CAST(round(cos(radians(lat)) * sin(radians(lng)) "
            "* 1000000000.0) AS BIGINT) AS qy, "
            "CAST(round(sin(radians(lat)) * 1000000000.0) AS BIGINT) "
            "AS qz FROM pages_geo), "
            "base AS (SELECT month, CAST(count(*) AS BIGINT) AS n_pages, "
            "round(degrees(atan2(CAST(CAST(sum(qz) AS BIGINT) AS DOUBLE), "
            "sqrt(CAST(CAST(sum(qx) AS BIGINT) AS DOUBLE) "
            "* CAST(CAST(sum(qx) AS BIGINT) AS DOUBLE) "
            "+ CAST(CAST(sum(qy) AS BIGINT) AS DOUBLE) "
            "* CAST(CAST(sum(qy) AS BIGINT) AS DOUBLE)))), 6) AS c_lat, "
            "round(degrees(atan2(CAST(CAST(sum(qy) AS BIGINT) AS DOUBLE), "
            "CAST(CAST(sum(qx) AS BIGINT) AS DOUBLE))), 6) AS c_lng "
            "FROM q GROUP BY 1), "
            "l AS (SELECT month, n_pages, c_lat, c_lng, "
            "lag(c_lat) OVER (ORDER BY month) AS pla, "
            "lag(c_lng) OVER (ORDER BY month) AS plo FROM base) "
            "SELECT month, n_pages, CASE WHEN pla IS NULL THEN NULL ELSE "
            "round(2 * 6371000 * asin(sqrt("
            "(1 - cos(radians(pla) - radians(c_lat))) / 2 "
            "+ cos(radians(pla)) * cos(radians(c_lat)) "
            "* (1 - cos(radians(plo) - radians(c_lng))) / 2)), 3) END "
            "AS drift_m FROM l ORDER BY month"
        ),
        "monthly_centroid": (
            f"{cte}, q AS (SELECT "
            "date_trunc('month', make_timestamp("
            "(1704067200 + (page_id * 40499) % 31536000) * 1000000)) "
            "AS month, "
            "CAST(round(cos(radians(lat)) * cos(radians(lng)) "
            "* 1000000000.0) AS BIGINT) AS qx, "
            "CAST(round(cos(radians(lat)) * sin(radians(lng)) "
            "* 1000000000.0) AS BIGINT) AS qy, "
            "CAST(round(sin(radians(lat)) * 1000000000.0) AS BIGINT) "
            "AS qz FROM pages_geo) "
            "SELECT month, CAST(count(*) AS BIGINT) AS n_pages, "
            "round(degrees(atan2(CAST(CAST(sum(qz) AS BIGINT) AS DOUBLE), "
            "sqrt(CAST(CAST(sum(qx) AS BIGINT) AS DOUBLE) "
            "* CAST(CAST(sum(qx) AS BIGINT) AS DOUBLE) "
            "+ CAST(CAST(sum(qy) AS BIGINT) AS DOUBLE) "
            "* CAST(CAST(sum(qy) AS BIGINT) AS DOUBLE)))), 6) AS c_lat, "
            "round(degrees(atan2(CAST(CAST(sum(qy) AS BIGINT) AS DOUBLE), "
            "CAST(CAST(sum(qx) AS BIGINT) AS DOUBLE))), 6) AS c_lng "
            "FROM q GROUP BY 1 ORDER BY 1"
        ),
        "source_js": source_js_divergence_sql(),
        "user_burstiness": USER_BURSTINESS_SQL,
        "ripley_k": ripley_sql,
        "cross_k": cross_k_sql,
        "source_drift_psi": source_drift_psi_sql(),
        "domain_gini": DOMAIN_GINI_SQL,
        "chi2_lang_source": CHI2_LANG_SOURCE_SQL,
        "zipf_slope": zipf_slope_sql(),
        # positional phrase query: 1-based list scan, token-exact
        "phrase_search": phrase_search_sql("data", "line"),
        # entry/exit matrix: ordered first()/last() aggregates over the
        # same (es, event_id)-ordered sessionization windows
        "session_entry_exit": SESSION_ENTRY_EXIT_SQL,
        # per-column profile: UNION ALL legs over VARCHAR images (UTF-8
        # byte order == codepoint order, so min/max agree with python)
        "profile_table": profile_table_sql("documents"),
        # triangle census of the undirected simple domain graph: ordered
        # 3-way self-join (x<y<z); wedges = sum(deg*(deg-1)) // 2 exact;
        # clustering = CAST(3T AS DOUBLE)/CAST(W AS DOUBLE) like the engine
        "domain_triangles": (
            f"{cte}, e AS (SELECT "
            "regexp_extract(url, 'https://([^/]+)/', 1) AS s, "
            "'src' || CAST(((page_id * 2654435761 + j.j * 97) "
            "% 4294967296) % 20 AS VARCHAR) || '.example.com' AS d "
            "FROM pages_geo CROSS JOIN (VALUES (0),(1),(2)) AS j(j) "
            "WHERE j.j < 1 + page_id % 3), "
            "und AS (SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v "
            "FROM e WHERE s <> d), "
            "deg AS (SELECT x, CAST(count(*) AS HUGEINT) AS dg FROM "
            "(SELECT u AS x FROM und UNION ALL SELECT v FROM und) "
            "GROUP BY 1), "
            "tri AS (SELECT CAST(count(*) AS HUGEINT) AS t FROM und a "
            "JOIN und b ON b.u = a.u AND b.v > a.v "
            "JOIN und c ON c.u = a.v AND c.v = b.v), "
            "m AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes, "
            "CAST(sum(dg * (dg - 1)) // 2 AS BIGINT) AS n_wedges "
            "FROM deg) "
            "SELECT m.n_nodes, "
            "CAST((SELECT count(*) FROM und) AS BIGINT) AS n_edges, "
            "coalesce(m.n_wedges, 0) AS n_wedges, "
            "CAST(tri.t AS BIGINT) AS n_triangles, "
            "CASE WHEN coalesce(m.n_wedges, 0) = 0 THEN NULL ELSE "
            "round(CAST(3 * tri.t AS DOUBLE) "
            "/ CAST(m.n_wedges AS DOUBLE), 6) END AS clustering "
            "FROM m CROSS JOIN tri"
        ),
        # market-basket lift over exact distinct-user type sets; HUGEINT
        # products keep n_both * n_users / n_a * n_b exact before the one
        # CAST-to-DOUBLE division the engine mirrors
        "event_cooccurrence": (
            "WITH ut AS (SELECT DISTINCT user_id, event_type FROM events "
            "WHERE user_id IS NOT NULL AND event_type IS NOT NULL), "
            "tc AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n "
            "FROM ut GROUP BY 1), "
            "nu AS (SELECT CAST(count(DISTINCT user_id) AS HUGEINT) AS n "
            "FROM ut), "
            "pairs AS (SELECT a.event_type AS type_a, "
            "b.event_type AS type_b, CAST(count(*) AS HUGEINT) AS n_both "
            "FROM ut a JOIN ut b ON a.user_id = b.user_id "
            "AND a.event_type < b.event_type GROUP BY 1, 2) "
            "SELECT type_a, type_b, CAST(ta.n AS BIGINT) AS n_a, "
            "CAST(tb.n AS BIGINT) AS n_b, "
            "CAST(n_both AS BIGINT) AS n_both, "
            "round(CAST(n_both * nu.n AS DOUBLE) "
            "/ CAST(ta.n * tb.n AS DOUBLE), 6) AS lift "
            "FROM pairs JOIN tc ta ON ta.event_type = type_a "
            "JOIN tc tb ON tb.event_type = type_b CROSS JOIN nu"
        ),
        "quantize_embeddings": _quantize_embeddings_oracle(),
        "dup_span_stats": dup_span_sql,
        "ngram_novelty": ngram_novelty_sql,
        "revenue_by_nation": _revenue_by_nation_oracle(),
        "pricing_summary": _pricing_summary_oracle(),
        "props_field_stats": _props_field_stats_oracle(),
        "doc_token_rank": _doc_token_rank_oracle(),
        "docs_rollup": _docs_rollup_oracle(),
        "dup_degree_hist": dup_degree_sql,
        "tile_top_lang": _tile_top_lang_oracle(cte),
        "tile_centroids": _tile_centroids_oracle(cte),
        "events_winsorized": _events_winsorized_oracle(),
        "text_identity": text_id,
        "pages_per_lang": per_lang,
        "cap_join": cap_join,
        "cap_join_shuffle": cap_join,
        "pip_join": pip_join,
        "assembled_pip_join": assembled_pip_sql,
        "exact_dedup": exact_dedup_sql,
        "near_dup_pairs": near_dup,
        "cosine_sim_pairs": cosine_sim_sql,
        "pmi_collocations": pmi_sql,
        "near_dup_clusters": near_dup_clusters_sql,
        "dup_cluster_purity": dup_cluster_purity_sql,
        "rank_corr_qty_discount": RANK_CORR_QTY_DISCOUNT_SQL,
        "containment_pairs": containment_sql,
        "dup_threshold_curve": dup_threshold_curve_sql,
        "minhash_pairs": minhash_sql,
        "simhash_pairs": simhash_sql,
        "events_asof": events_asof_sql,
        "event_gaps": event_gaps_sql,
        "user_rolling": user_rolling_sql(),
        "event_transitions": EVENT_TRANSITIONS_SQL,
        "token_edit_pairs": TOKEN_EDIT_PAIRS_SQL,
        "cheapest_supplier": CHEAPEST_SUPPLIER_SQL,
        "event_followups": event_followups_sql(),
        "cohort_retention": cohort_sql,
        "events_weekday_hour": """
WITH e AS (SELECT epoch_us(ts) AS t, event_type FROM events
           WHERE ts IS NOT NULL),
c AS (SELECT ((t // 86400000000) + 4) % 7 AS dow,
             (t // 3600000000) % 24 AS hour,
             CASE WHEN coalesce(event_type, '') = 'purchase'
                  THEN 1 ELSE 0 END AS isp FROM e)
SELECT dow, hour, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(isp) AS BIGINT) AS n_purchases
FROM c GROUP BY dow, hour""",
        "group_sizes_hist": """
WITH g AS (SELECT count(*) AS group_size FROM documents
           GROUP BY lang, source)
SELECT group_size, CAST(count(*) AS BIGINT) AS n_groups
FROM g GROUP BY group_size""",
        # z-score: exact BIGINT moments; the float expression is written
        # identically to the engine's ((x - s/n) / sqrt(q/n - (s/n)^2));
        # zero-variance groups pinned to 0, NULL values stay NULL
        "standardize_docs": """
WITH m AS (SELECT lang, CAST(sum(n_chars) AS BIGINT) AS s,
                  CAST(sum(n_chars * n_chars) AS BIGINT) AS q,
                  CAST(count(n_chars) AS BIGINT) AS n
           FROM documents GROUP BY lang)
SELECT d.doc_id, d.lang, d.n_chars,
       CASE WHEN d.n_chars IS NULL THEN NULL
            WHEN m.n * m.q = m.s * m.s THEN 0.0
            ELSE round((d.n_chars - m.s / m.n)
                       / sqrt(m.q / m.n - (m.s / m.n) * (m.s / m.n)), 6)
       END AS z
FROM documents d JOIN m ON m.lang IS NOT DISTINCT FROM d.lang""",
        "source_mix": _source_mix_oracle(),
        "emb_integrity": """
SELECT 'documents' AS side, CAST(count(*) AS BIGINT) AS n_total,
       CAST(count(e.vec_id) AS BIGINT) AS n_matched,
       CAST(count(*) - count(e.vec_id) AS BIGINT) AS n_missing
FROM documents d LEFT JOIN embeddings e ON e.vec_id = d.doc_id
UNION ALL
SELECT 'embeddings' AS side, CAST(count(*) AS BIGINT) AS n_total,
       CAST(count(d.doc_id) AS BIGINT) AS n_matched,
       CAST(count(*) - count(d.doc_id) AS BIGINT) AS n_missing
FROM embeddings e LEFT JOIN documents d ON d.doc_id = e.vec_id""",
        # gaps-and-islands: day - row_number is constant within a run of
        # consecutive days; positive epochs make // == floor division
        "user_streaks": """
WITH d AS (SELECT DISTINCT user_id,
                  epoch_us(ts) // 86400000000 AS day
           FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
r AS (SELECT user_id, day,
             day - row_number() OVER (PARTITION BY user_id
                                      ORDER BY day) AS island
      FROM d),
s AS (SELECT user_id, island, count(*) AS streak
      FROM r GROUP BY user_id, island)
SELECT user_id,
       CAST(sum(streak) AS BIGINT) AS n_active_days,
       CAST(max(streak) AS BIGINT) AS max_streak
FROM s GROUP BY user_id""",
        # top-1 by cosine with a different-language constraint; ranks only
        # (no float column), ties broken by nn_id like the kNN contract
        "cross_lang_nn": """
WITH ed AS (SELECT e.vec_id AS vec_id, d.lang AS lang,
                   CAST(e.embedding AS DOUBLE[]) AS emb
            FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
            WHERE d.lang IS NOT NULL)
SELECT vec_id, lang, nn_id, nn_lang FROM (
  SELECT a.vec_id AS vec_id, a.lang AS lang,
         b.vec_id AS nn_id, b.lang AS nn_lang,
         row_number() OVER (PARTITION BY a.vec_id
             ORDER BY list_cosine_similarity(b.emb, a.emb) DESC,
                      b.vec_id) AS rn
  FROM ed a JOIN ed b ON b.lang <> a.lang) WHERE rn = 1""",
        # exact NTILE split: first n%k buckets take one extra row; the
        # (n_chars, doc_id) order is total so the tile is deterministic
        "doc_deciles": """
SELECT doc_id, lang, n_chars,
       CAST(ntile(10) OVER (PARTITION BY lang
                            ORDER BY n_chars, doc_id) AS BIGINT) AS decile
FROM documents""",
        # median + MAD: both are quantile_disc picks of actual data
        # values; |v - median| is the identical float64 expression on
        # both engines, so the second median is bit-exact too
        "events_mad": """
WITH med AS (SELECT event_type, quantile_disc(value, 0.5) AS median
             FROM events WHERE value IS NOT NULL GROUP BY event_type),
dev AS (SELECT e.event_type AS event_type, abs(e.value - m.median) AS d
        FROM events e
        JOIN med m ON m.event_type IS NOT DISTINCT FROM e.event_type
        WHERE e.value IS NOT NULL)
SELECT m.event_type AS event_type, m.median AS median,
       quantile_disc(d.d, 0.5) AS mad
FROM dev d JOIN med m ON m.event_type IS NOT DISTINCT FROM d.event_type
GROUP BY m.event_type, m.median""",
        "events_quantiles": (
            "SELECT event_type, unnest(["
            + ", ".join(f"{q!r}" for q in EVENT_QS)
            + "]) AS q, unnest(quantile_disc(value, ["
            + ", ".join(f"{q!r}" for q in EVENT_QS)
            + "])) AS value FROM events WHERE value IS NOT NULL "
            "GROUP BY event_type"
        ),
        "events_distinct_users": (
            "SELECT event_type, count(DISTINCT user_id) AS n_distinct "
            "FROM events GROUP BY event_type"
        ),
        "event_windows": (
            "SELECT e.event_id AS event_id, w.window_id AS window_id "
            "FROM events e JOIN (VALUES "
            + ", ".join(f"('{w}', {s}, {t})" for w, s, t in EVENT_WINDOWS)
            + ") w(window_id, ws, we) ON epoch(e.ts) >= w.ws "
            "AND epoch(e.ts) < w.we"
        ),
        "token_counts": _token_counts_oracle(),
        "lang_centroid_sim": LANG_CENTROID_SIM_SQL,
        "hourly_anomaly": HOURLY_ANOMALY_SQL,
        "daily_autocorr": DAILY_AUTOCORR_SQL,
        "daily_cusum": DAILY_CUSUM_SQL,
        "rfm_segments": rfm_segments_sql(),
        "daily_ewma": daily_ewma_sql(),
        "doc_percent_rank": (
            "SELECT doc_id, lang, n_chars, "
            "round(percent_rank() OVER (PARTITION BY lang "
            "ORDER BY n_chars), 6) AS pct_rank "
            "FROM documents WHERE n_chars IS NOT NULL"
        ),
        "emb_norm_by_lang": (
            "SELECT d.lang AS lang, count(*) AS n, "
            "round(avg(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), "
            "CAST(e.embedding AS DOUBLE[])))), 6) AS avg_norm "
            "FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id "
            "GROUP BY d.lang"
        ),
        "token_doc_freq": (
            "SELECT token, count(DISTINCT doc_id) AS df FROM ("
            "SELECT doc_id, unnest(list_filter(regexp_split_to_array("
            "lower(text), '\\s+'), x -> x <> '')) AS token FROM documents) "
            "GROUP BY token ORDER BY df DESC, token LIMIT 100"
        ),
        "chunk_docs": (
            "WITH words AS (SELECT doc_id, list_filter("
            "regexp_split_to_array(text, '\\s+'), x -> x <> '') AS ws "
            "FROM documents), "
            "ch AS (SELECT doc_id, unnest(generate_series(0, "
            "CAST(ceil(len(ws) / 100.0) AS BIGINT) - 1)) AS chunk_id, ws "
            "FROM words WHERE len(ws) > 0) "
            "SELECT doc_id, chunk_id, "
            "CAST(least(100, len(ws) - chunk_id * 100) AS BIGINT) "
            "AS n_tokens, "
            "array_to_string(ws[(chunk_id * 100 + 1):"
            "least((chunk_id + 1) * 100, len(ws))], ' ') AS chunk_text "
            "FROM ch"
        ),
        "repetition_stats": (
            "WITH words AS (SELECT doc_id, list_filter("
            "regexp_split_to_array(text, '\\s+'), x -> x <> '') AS ws "
            "FROM documents), "
            "bg AS (SELECT doc_id, unnest(list_transform("
            "generate_series(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1])) "
            "AS b FROM words WHERE len(ws) >= 2), "
            "cnt AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2), "
            "agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams, "
            "CAST(max(c) AS BIGINT) AS top_bigram_n FROM cnt GROUP BY 1) "
            "SELECT w.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams, "
            "coalesce(a.top_bigram_n, 0) AS top_bigram_n, "
            "round(CASE WHEN coalesce(a.n_bigrams, 0) = 0 THEN 0.0 "
            "ELSE a.top_bigram_n * 1.0 / a.n_bigrams END, 6) "
            "AS top_bigram_ratio "
            "FROM words w LEFT JOIN agg a USING (doc_id)"
        ),
        "decontaminate_bloom": bloom_sql,
        "doc_perplexity": ppl_sql,
        "distance_join": distance_join_sql,
        "nearest_neighbor": nearest_neighbor_sql,
        "bipartite_nn": bipartite_nn_sql,
        "knn_graph": knn_graph_sql,
        "knn_hubness": knn_hubness_sql,
        "idw_interpolate": idw_sql,
        "nearest_city_stats": nearest_city_sql,
        "city_visits_monthly": city_visits_sql,
        "bearing_sectors": bearing_sql,
        "bearing_circular": bearing_circ_sql,
        "distance_decay": distance_decay_sql,
        "theil_decomposition": theil_sql,
        "monthly_lang_js": monthly_lang_js_sql,
        "tile_month_jaccard": tile_month_jaccard_sql,
        "lang_tile_jaccard": lang_tile_jaccard_sql,
        "cramers_v_lang_face": cramers_sql,
        "decontaminate": (
            "WITH words AS (SELECT doc_id, list_filter("
            "regexp_split_to_array(text, '\\s+'), x -> x <> '') AS ws "
            "FROM documents), "
            "sh AS (SELECT doc_id, unnest(list_distinct("
            "CASE WHEN len(ws) >= 3 THEN list_transform("
            "generate_series(1, len(ws)-2), "
            "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) "
            "ELSE [array_to_string(ws, ' ')] END)) AS s FROM words), "
            "ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0), "
            "sz AS (SELECT doc_id, count(*) AS n_shingles FROM sh "
            "GROUP BY 1), "
            "ov AS (SELECT sh.doc_id, count(*) AS n_overlap FROM sh "
            "JOIN ev USING (s) WHERE sh.doc_id % 97 <> 0 GROUP BY 1) "
            "SELECT ov.doc_id, sz.n_shingles, ov.n_overlap, "
            "round(ov.n_overlap * 1.0 / sz.n_shingles, 6) AS ratio "
            "FROM ov JOIN sz USING (doc_id)"
        ),
        "funnel_views": (
            "SELECT e.user_id, CAST(count(*) AS BIGINT) AS n_a, "
            "CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM events b "
            "WHERE b.user_id = e.user_id AND b.event_type = 'purchase' "
            "AND epoch_us(b.ts) > epoch_us(e.ts) "
            "AND epoch_us(b.ts) <= epoch_us(e.ts) + 3600000000) "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_converted "
            "FROM events e WHERE e.event_type = 'view' AND e.user_id IS NOT NULL "
            "AND e.ts IS NOT NULL GROUP BY e.user_id"
        ),
        "rare_tokens": (
            "WITH toks AS (SELECT doc_id, unnest(list_filter("
            "regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) "
            "AS token FROM documents), "
            "cnt AS (SELECT token, count(*) AS n FROM toks GROUP BY 1), "
            "thr AS (SELECT quantile_disc(n, 0.2) AS t FROM cnt), "
            "rare AS (SELECT token FROM cnt, thr WHERE cnt.n <= thr.t), "
            "per AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) "
            "AS n_tokens, CAST(sum(CASE WHEN r.token IS NOT NULL THEN 1 "
            "ELSE 0 END) AS BIGINT) AS n_rare FROM toks t "
            "LEFT JOIN rare r USING (token) GROUP BY 1) "
            "SELECT d.doc_id, coalesce(per.n_tokens, 0) AS n_tokens, "
            "coalesce(per.n_rare, 0) AS n_rare, "
            "round(CASE WHEN coalesce(per.n_tokens, 0) = 0 THEN 0.0 "
            "ELSE per.n_rare * 1.0 / per.n_tokens END, 6) AS rare_ratio "
            "FROM documents d LEFT JOIN per USING (doc_id)"
        ),
        "pack_examples": (
            "WITH t AS (SELECT doc_id, CAST(len(regexp_extract_all(coalesce(text, ''), "
            "'\\S+')) AS BIGINT) AS n_tokens FROM documents), "
            "s AS (SELECT doc_id, n_tokens, sum(n_tokens) OVER ("
            "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "CURRENT ROW) AS cum_tokens FROM t) "
            "SELECT doc_id, n_tokens, CAST(cum_tokens AS BIGINT) "
            "AS cum_tokens, CAST((cum_tokens - n_tokens) // 2000 AS BIGINT) "
            "AS example_id FROM s"
        ),
        "chunk_dedup": (
            "WITH words AS (SELECT doc_id, list_filter("
            "regexp_split_to_array(text, '\\s+'), x -> x <> '') AS ws "
            "FROM documents), "
            "ch AS (SELECT doc_id, unnest(generate_series(0, "
            "CAST(ceil(len(ws) / 50.0) AS BIGINT) - 1)) AS chunk_id, ws "
            "FROM words WHERE len(ws) > 0), "
            "chunks AS (SELECT doc_id, chunk_id, "
            "array_to_string(ws[(chunk_id * 50 + 1):"
            "least((chunk_id + 1) * 50, len(ws))], ' ') AS ct FROM ch), "
            "dup AS (SELECT ct FROM chunks GROUP BY ct "
            "HAVING count(DISTINCT doc_id) >= 2), "
            "keep AS (SELECT * FROM chunks WHERE ct NOT IN "
            "(SELECT ct FROM dup)), "
            "tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks "
            "FROM chunks GROUP BY 1), "
            "kp AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept, "
            "string_agg(ct, ' ' ORDER BY chunk_id) AS clean_text "
            "FROM keep GROUP BY 1) "
            "SELECT w.doc_id AS doc_id, "
            "coalesce(kp.clean_text, '') AS clean_text, "
            "coalesce(tot.n_chunks, 0) AS n_chunks, "
            "coalesce(kp.n_kept, 0) AS n_kept "
            "FROM words w LEFT JOIN tot USING (doc_id) "
            "LEFT JOIN kp USING (doc_id)"
        ),
        "tfidf_top3": (
            "WITH words AS (SELECT doc_id, unnest(list_filter("
            "regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) "
            "AS token FROM documents), "
            "tf AS (SELECT doc_id, token, count(*) AS tf FROM words "
            "GROUP BY 1, 2), "
            "df AS (SELECT token, count(DISTINCT doc_id) AS df FROM words "
            "GROUP BY 1), "
            "n AS (SELECT count(*) AS n FROM documents), "
            "scored AS (SELECT tf.doc_id, tf.token, "
            "tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) AS x "
            "FROM tf JOIN df USING (token) CROSS JOIN n), "
            "ranked AS (SELECT doc_id, token, x, CAST(row_number() OVER ("
            "PARTITION BY doc_id ORDER BY x DESC, token) AS BIGINT) AS rank "
            "FROM scored) "
            "SELECT doc_id, token, round(x, 6) AS tfidf, rank FROM ranked "
            "WHERE rank <= 3"
        ),
        "heavy_hitters_top100": (
            "SELECT token, count(*) AS n FROM ("
            "SELECT unnest(list_filter(regexp_split_to_array(lower(text), "
            "'\\s+'), x -> x <> '')) AS token FROM documents) "
            "GROUP BY token ORDER BY n DESC, token LIMIT 100"
        ),
        "vocab_top100": (
            "SELECT token, count(*) AS n FROM ("
            "SELECT unnest(list_filter(regexp_split_to_array(lower(text), "
            "'\\s+'), x -> x <> '')) AS token FROM documents) "
            "GROUP BY token ORDER BY n DESC, token LIMIT 100"
        ),
        # nucleus cut: keep while the PRECEDING cumulative count is under
        # p = num/den of all occurrences — pure-int64 boundary rule
        "vocab_coverage": f"""
WITH tok AS (SELECT unnest(list_filter(regexp_split_to_array(lower(text),
             '\\s+'), x -> x <> '')) AS token FROM documents),
c AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY token),
t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
r AS (SELECT token, n, CAST(coalesce(sum(n) OVER (ORDER BY n DESC, token
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS BIGINT) AS cum_before FROM c)
SELECT token, n, cum_before FROM r, t
WHERE {VOCAB_P[1]} * cum_before < {VOCAB_P[0]} * total""",
        "sample_corpus": _sample_corpus_oracle(),
        "split_corpus": _split_corpus_oracle(),
        "weighted_sample": _weighted_sample_oracle(),
        "lang_corr": _lang_corr_oracle(),
        "events_sliding_distinct": _sliding_distinct_oracle(),
        "normalize_text": _normalize_text_oracle(),
        "sample_per_lang": _sample_per_lang_oracle(),
        "emb_near_dup": emb_near_dup_sql,
        "emb_near_dup_lsh": emb_lsh_sql,
        "knn_embeddings": knn_emb_sql,
        "knn_bulk": knn_bulk_sql,
        "lsh_knn": lsh_knn_sql,
        "text_stats": text_stats_sql,
        "quality_score": quality_sql,
        "quality_above_median": f"""
WITH qq AS (SELECT doc_id, quality FROM ({quality_sql}) tq),
ql AS (SELECT qq.doc_id, d.lang, qq.quality
       FROM qq JOIN documents d USING (doc_id)),
m AS (SELECT lang, quantile_disc(quality, 0.5) AS med
      FROM ql GROUP BY lang)
SELECT ql.doc_id, ql.lang FROM ql JOIN m USING (lang)
WHERE ql.quality >= m.med""",
        "lang_id": langid_sql,
        "langid_mismatch": f"""
SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(coalesce(sum(CASE WHEN d.lang IS DISTINCT FROM p.lang_pred
                               THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_mismatch,
       round(CAST(coalesce(sum(CASE WHEN d.lang IS DISTINCT FROM
                                         p.lang_pred
                                    THEN 1 ELSE 0 END), 0) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS mismatch_rate
FROM documents d JOIN ({langid_sql}) p USING (doc_id)
GROUP BY 1 ORDER BY 1""",
        "langid_confusion": f"""
SELECT d.lang AS lang, p.lang_pred AS lang_pred,
       CAST(count(*) AS BIGINT) AS n
FROM documents d JOIN ({langid_sql}) p USING (doc_id)
GROUP BY d.lang, p.lang_pred""",
        "fingerprint": fingerprint_oracle,
        "new_docs": new_docs_oracle,
        "corpus_keep": corpus_keep_sql,
        "covering_setops": covering_setops_sql,
        "boolean_covering": boolean_covering_sql,
        # rows-only (not SQL-expressible): audio_stats / media_stats (binary
        # media payloads) / polygon_covering / polyline_covering / ivf_knn
        # (RegionCoverer token output + k-means — verified by pytest
        # postcondition/containment/recall suites).
    }
