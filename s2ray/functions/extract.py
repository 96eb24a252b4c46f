"""Vectorized html -> text / geotag extraction (Arrow re2 kernels).

These are the first two stages of the flagship pipeline
(SURVEY.md par.3, BASELINE.json.north_star): stateless ``map_batches``
transforms over zero-copy Arrow batches.  ``extract_text`` must be
byte-stable per url (input_hint invariant): it is the exact inverse of the
``<article>...</article>`` framing written by
:mod:`s2ray.sources.pages`, verified row-wise in tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TEXT_RE = r"<article>(?P<t>[\s\S]*)</article>"
_GEO_RE = r'geo\.position" content="(?P<a>-?[0-9]+);(?P<b>-?[0-9]+)"'


def _html_as_string(batch: pa.Table) -> pa.Array:
    html = batch["html"]
    if pa.types.is_binary(html.type) or pa.types.is_large_binary(html.type):
        html = pc.cast(html, pa.string())
    return html


def extract_text(batch: pa.Table) -> pa.Table:
    """html -> text column (byte-identical to the original document text).

    Greedy ``[\\s\\S]*`` anchors on the LAST ``</article>`` so article bodies
    containing the literal closing tag still round-trip byte-identically.
    """
    html = _html_as_string(batch)
    ex = pc.extract_regex(html, _TEXT_RE)
    text = pc.struct_field(ex, "t")
    if "text" in batch.column_names:
        batch = batch.drop_columns(["text"])
    return batch.append_column("text", text)


def extract_geotag(batch: pa.Table) -> pa.Table:
    """html -> lat/lng float64 columns (degrees) + has_geo bool.

    Coordinates travel as integer 1e-4-deg fixed point inside the meta tag;
    the division by 10000.0 is the single float op, bit-equal to the SQL
    oracle's ``lat_e4 / 10000.0``.
    """
    html = _html_as_string(batch)
    ex = pc.extract_regex(html, _GEO_RE)
    lat_e4 = pc.cast(pc.struct_field(ex, "a"), pa.int64())
    lng_e4 = pc.cast(pc.struct_field(ex, "b"), pa.int64())
    lat = pc.divide(pc.cast(lat_e4, pa.float64()), pa.scalar(10000.0))
    lng = pc.divide(pc.cast(lng_e4, pa.float64()), pa.scalar(10000.0))
    has_geo = pc.is_valid(lat_e4)
    for name, col in (("lat_e4", lat_e4), ("lng_e4", lng_e4),
                      ("lat", lat), ("lng", lng), ("has_geo", has_geo)):
        if name in batch.column_names:
            batch = batch.drop_columns([name])
        batch = batch.append_column(name, col)
    return batch


def drop_html(batch: pa.Table) -> pa.Table:
    """Drop the heavy html column as soon as extraction is done
    (memory-pressure control; SURVEY.md par.4)."""
    if "html" in batch.column_names:
        return batch.drop_columns(["html"])
    return batch
