"""Deterministic synthetic Common-Crawl-style web-pages source.

``BASELINE.json.input_hint`` fixes the input shape:
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``.
No such table ships in /root/testdata, so we synthesize it *deterministically*
from ``documents.parquet`` (pure integer arithmetic on ``doc_id``) — the same
derivation is emitted as a DuckDB SQL CTE (:func:`pages_sql_cte`) so driver
oracle queries can reproduce every derived value exactly.

Geo coordinates are embedded ONLY inside the html (a ``geo.position`` meta tag
holding integer 1e-4-degree fixed-point values); the geotag stage re-extracts
them.  Integer fixed-point end-to-end means Python and SQL produce bit-equal
float64 lat/lng (``e4 / 10000.0 - offset`` is a correctly-rounded IEEE op in
both runtimes).

Skew by construction: 40 % of pages cluster within ±0.1 deg of 8 fixed city
centers (the "dense URL clusters" of BASELINE.json.north_star) so hot-cell
salting in the join layer has something real to chew on.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# 8 hot-city centers in 1e-4-degree fixed point (lat_e4, lng_e4).
CITIES_E4 = [
    (557558, 376173),     # Moscow
    (407128, -740060),    # New York
    (515074, -1278),      # London
    (356762, 1396503),    # Tokyo
    (-338688, 1512093),   # Sydney
    (-235505, -466333),   # Sao Paulo
    (65244, 33792),       # Lagos
    (399042, 1164074),    # Beijing
]

_MUL_LAT = 2654435761      # Knuth multiplicative hashes
_MUL_LNG = 2246822519
_MOD32 = 4294967296
_CITY_JITTER = 2001        # +- 0.1 deg in e4 units
_HOT_FRACTION_MOD = 10     # uid % 10 < 4  -> 40% of pages are "hot"
_HOT_FRACTION_LT = 4
_WARC_EPOCH_S = 1704067200  # 2024-01-01T00:00:00Z
_YEAR_S = 31536000

# Injected exact-duplicate content: Common-Crawl-style boilerplate pages.
# uid % 17 == 0 -> page text is DUP_TEMPLATES[uid % 3] (byte-identical groups
# for the dedup operators).  Mirrored in pages_sql_cte.
_DUP_MOD = 17
DUP_TEMPLATES = [
    "welcome to our site the best place for deals and news every day",
    "page not found the content you are looking for has moved or expired",
    "sign in to continue enter your email and password to access account",
]


def derive_geo_e4(uid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uid (int64) -> (lat_e4, lng_e4) int64 fixed-point coordinates.

    Pure int64 arithmetic; mirrored 1:1 in :func:`pages_sql_cte`.
    """
    uid = np.asarray(uid, dtype=np.int64)
    h1 = (uid * _MUL_LAT) % _MOD32
    h2 = (uid * _MUL_LNG) % _MOD32
    hot = (uid % _HOT_FRACTION_MOD) < _HOT_FRACTION_LT
    city_idx = uid % len(CITIES_E4)
    city_lat = np.array([c[0] for c in CITIES_E4], dtype=np.int64)[city_idx]
    city_lng = np.array([c[1] for c in CITIES_E4], dtype=np.int64)[city_idx]
    lat_e4 = np.where(hot, city_lat + h1 % _CITY_JITTER - 1000,
                      h1 % 1600001 - 800000)
    lng_e4 = np.where(hot, city_lng + h2 % _CITY_JITTER - 1000,
                      h2 % 3600000 - 1800000)
    return lat_e4.astype(np.int64), lng_e4.astype(np.int64)


def e4_to_degrees(lat_e4, lng_e4):
    """Fixed point -> float64 degrees; identical IEEE ops to the SQL CTE."""
    return (np.asarray(lat_e4, dtype=np.float64) / 10000.0,
            np.asarray(lng_e4, dtype=np.float64) / 10000.0)


def synth_pages_batch(batch: pa.Table, repl: int = 1) -> pa.Table:
    """documents rows -> pages rows (x repl), fully vectorized Arrow/numpy.

    Output schema: page_id:int64, url:string, warc_ts:timestamp[us],
    html:binary, text:string, lang:string.
    """
    if repl > 1:
        idx = np.repeat(np.arange(len(batch), dtype=np.int64), repl)
        batch = batch.take(pa.array(idx))
        r = np.tile(np.arange(repl, dtype=np.int64), len(batch) // repl)
    else:
        r = np.zeros(len(batch), dtype=np.int64)
    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    uid = doc_id * repl + r
    lat_e4, lng_e4 = derive_geo_e4(uid)

    # vectorized string building with Arrow kernels
    uid_str = pc.cast(pa.array(uid), pa.string())
    lat_str = pc.cast(pa.array(lat_e4), pa.string())
    lng_str = pc.cast(pa.array(lng_e4), pa.string())
    source = batch["source"]
    text = batch["text"]
    dup_mask = (uid % _DUP_MOD) == 0
    if dup_mask.any():
        tarr = np.asarray(text.to_pandas(), dtype=object)
        tarr[dup_mask] = np.array(DUP_TEMPLATES, dtype=object)[uid[dup_mask] % 3]
        text = pa.array(tarr.tolist(), type=pa.string())

    url = pc.binary_join_element_wise(
        pa.scalar("https://"), source, pa.scalar(".example.com/doc/"), uid_str,
        pa.scalar(""),
    )
    html = pc.binary_join_element_wise(
        pa.scalar("<html><head><title>"), url,
        pa.scalar('</title><meta name="geo.position" content="'),
        lat_str, pa.scalar(";"), lng_str,
        pa.scalar('"/></head><body><article>'), text,
        pa.scalar("</article></body></html>"),
        pa.scalar(""),
    )
    warc_us = ((_WARC_EPOCH_S + (uid * 40499) % _YEAR_S) * 1_000_000).astype("datetime64[us]")
    return pa.table(
        {
            "page_id": pa.array(uid, type=pa.int64()),
            "url": url,
            "warc_ts": pa.array(warc_us),
            "html": pc.cast(html, pa.binary()),
            "text": text,
            "lang": batch["lang"],
        }
    )


def read_pages(sf_dir: str, repl: int = 1, num_blocks: int | None = None,
               **read_kwargs):
    """documents.parquet -> Dataset of synthetic pages (streaming, zero-copy).

    The sf test tables are single parquet files (one read block), which would
    serialize the whole downstream chain; repartition the small documents
    rows across ~2x the CPUs BEFORE the synth fan-out so every stage runs
    wide.  (On a real multi-file corpus the read itself provides the blocks
    and this repartition is skipped.)
    """
    import ray
    import ray.data

    import os

    import pyarrow.parquet as pq

    path = f"{sf_dir}/documents.parquet"
    cols = ["doc_id", "text", "lang", "source"]
    if num_blocks is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        n_docs = pq.read_metadata(path).num_rows
        # target ~16k pages (~14 MB of html) per block: bounds worker heaps
        # AND gives the streaming executor enough tasks to ramp to full
        # width (measured: 4x fewer/larger blocks ran 2.5x slower)
        num_blocks = max(8, 2 * ncpu, (n_docs * repl) // 16384)
    if os.path.getsize(path) < 256 * 1024 * 1024:
        # Small single-file input: a single ReadParquet task splitting into N
        # blocks is a serial head-of-pipeline bottleneck (~5s measured).
        # Slice on the driver instead — one Arrow table per block, zero read
        # tasks.  Real multi-file corpora take the streaming read path below.
        table = pq.read_table(path, columns=cols)
        n = table.num_rows
        step = max(1, -(-n // num_blocks))
        slices = [table.slice(i, step) for i in range(0, n, step)]
        ds = ray.data.from_arrow(slices)
    else:
        from .readers import read_table

        ds = read_table(sf_dir, "documents", columns=cols,
                        override_num_blocks=num_blocks, **read_kwargs)
    return ds.map_batches(
        synth_pages_batch, fn_kwargs={"repl": repl}, batch_format="pyarrow",
        batch_size=None,
    )


def pages_sql_cte(repl: int = 1) -> str:
    """DuckDB CTE reproducing page_id/url/lat/lng/lang/text bit-exactly.

    Only repl=1 is used by correctness oracles (bench uses repl>1 without
    SQL comparison).
    """
    assert repl == 1, "oracle CTE is defined for repl=1"
    city_lat = "CASE (doc_id % 8) " + " ".join(
        f"WHEN {k} THEN {c[0]}" for k, c in enumerate(CITIES_E4)) + " END"
    city_lng = "CASE (doc_id % 8) " + " ".join(
        f"WHEN {k} THEN {c[1]}" for k, c in enumerate(CITIES_E4)) + " END"
    dup_case = ("CASE (doc_id % 3) "
                + " ".join(f"WHEN {k} THEN '{t}'" for k, t in enumerate(DUP_TEMPLATES))
                + " END")
    return f"""
pages AS (
  SELECT
    doc_id AS page_id,
    'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
    lang,
    CASE WHEN doc_id % {_DUP_MOD} = 0 THEN {dup_case} ELSE text END AS text,
    CASE WHEN doc_id % {_HOT_FRACTION_MOD} < {_HOT_FRACTION_LT}
         THEN ({city_lat}) + (doc_id * {_MUL_LAT}) % {_MOD32} % {_CITY_JITTER} - 1000
         ELSE (doc_id * {_MUL_LAT}) % {_MOD32} % 1600001 - 800000 END AS lat_e4,
    CASE WHEN doc_id % {_HOT_FRACTION_MOD} < {_HOT_FRACTION_LT}
         THEN ({city_lng}) + (doc_id * {_MUL_LNG}) % {_MOD32} % {_CITY_JITTER} - 1000
         ELSE (doc_id * {_MUL_LNG}) % {_MOD32} % 3600000 - 1800000 END AS lng_e4
  FROM documents
),
pages_geo AS (
  SELECT page_id, url, lang, text,
         lat_e4 / 10000.0 AS lat,
         lng_e4 / 10000.0 AS lng
  FROM pages
)"""
