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

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"

# Fixed query-geometry constants shared by queries() and oracle_sql().
RECT = dict(lat_lo=30.0, lat_hi=60.0, lng_lo=-10.0, lng_hi=45.0)
KNN_Q = dict(qlat=55.7558, qlng=37.6173, k=20)  # Moscow center


def entry() -> Any:
    """Flagship pipeline: pages -> extract -> geotag -> S2 cells -> tiles."""
    from s2ray.pipelines.tiles import tile_counts

    return tile_counts(SF_SMOKE, level=8)


def _q_tile_counts(sf_dir: str):
    from s2ray.pipelines.tiles import tile_counts

    return tile_counts(sf_dir, level=8)


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
        g = batch.group_by("lang").aggregate([("page_id", "count")])
        return pa.table({"lang": g["lang"], "partial_n": g["page_id_count"]})

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("partial_n", alias_name="n_pages"))
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "tile_counts_l8": _q_tile_counts,
        "rect_filter": _q_rect_filter,
        "knn_moscow": _q_knn,
        "text_identity": _q_text_identity,
        "pages_per_lang": _q_pages_per_lang,
    }


def _pages_cte() -> str:
    from s2ray.sources.pages import pages_sql_cte

    return "WITH " + pages_sql_cte(repl=1)


def oracle_sql() -> dict[str, str]:
    cte = _pages_cte()
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
        f"FROM pages_geo ORDER BY {dist} LIMIT {KNN_Q['k']}"
    )
    text_id = f"{cte} SELECT page_id, text FROM pages_geo"
    per_lang = (
        f"{cte} SELECT lang, count(*) AS n_pages FROM pages_geo GROUP BY lang"
    )
    return {
        "rect_filter": rect,
        "knn_moscow": knn,
        "text_identity": text_id,
        "pages_per_lang": per_lang,
        # tile_counts_l8: S2 tiling is not SQL-expressible -> rows-only check;
        # covered by pytest golden/property tests instead.
    }
