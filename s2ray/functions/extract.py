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


_OPEN = np.frombuffer(b"<article>", dtype=np.uint8)
_CLOSE = np.frombuffer(b"</article>", dtype=np.uint8)
_GEO = np.frombuffer(b'<meta name="geo.position" content="', dtype=np.uint8)


def _verify_literal(data: np.ndarray, cand: np.ndarray,
                    lit: np.ndarray) -> np.ndarray:
    """Filter candidate start positions down to true matches of ``lit`` by
    gathered byte comparisons (candidates are sparse; each step shrinks)."""
    cand = cand[cand <= len(data) - len(lit)]
    for i in range(1, len(lit)):
        if len(cand) == 0:
            break
        cand = cand[data[cand + i] == lit[i]]
    return cand


def _literal_positions(data: np.ndarray, lit: np.ndarray) -> np.ndarray:
    """Byte positions of every occurrence of ``lit``: ONE full equality
    pass for the first byte, then sparse verification."""
    if len(data) < len(lit):
        return np.empty(0, dtype=np.int64)
    return _verify_literal(data, np.flatnonzero(data == lit[0]), lit)


def _first_per_row(pos: np.ndarray, offs: np.ndarray, n: int) -> np.ndarray:
    """First (sorted) position per row, -1 where absent."""
    row = np.searchsorted(offs, pos, side="right") - 1
    out = np.full(n, -1, dtype=np.int64)
    r, first_idx = np.unique(row, return_index=True)
    out[r] = pos[first_idx]
    return out


def _last_per_row(pos: np.ndarray, offs: np.ndarray, n: int) -> np.ndarray:
    row = np.searchsorted(offs, pos, side="right") - 1
    out = np.full(n, -1, dtype=np.int64)
    out[row] = pos  # later (larger) positions overwrite earlier ones
    return out


def _gather_ranges(data: np.ndarray, starts: np.ndarray,
                   lens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(flat_bytes, int32 offsets) of per-row slices data[s:s+len]."""
    offs32 = np.zeros(len(lens) + 1, dtype=np.int32)
    offs32[1:] = np.cumsum(lens)
    total = int(offs32[-1])
    if total == 0:
        return np.empty(0, dtype=np.uint8), offs32
    # ranges -> flat indices via ONE cumsum: delta is 1 inside a row and
    # jumps to the next row's start byte at each output boundary
    nz = lens > 0
    st = starts[nz].astype(np.int64)
    ln = lens[nz].astype(np.int64)
    bounds = offs32[:-1][nz].astype(np.int64)
    delta = np.ones(total, dtype=np.int32)
    jump = np.empty(len(st), dtype=np.int64)
    jump[0] = st[0]
    jump[1:] = st[1:] - (st[:-1] + ln[:-1] - 1)
    delta[bounds] = jump  # int32 is fine: blocks are << 2 GB
    idx = np.cumsum(delta, dtype=np.int32)
    return data[idx], offs32


def _parse_int_fields(data, starts, stop_bytes=(ord(";"), ord('"')),
                      max_len=18):
    """Parse two ';'-separated integers starting at ``starts`` (the first
    terminated by ';', the second by '\"'), fully vectorized over rows via
    a column-wise digit fold on a (N, max_len) byte matrix."""
    n = len(starts)
    cols = np.minimum(np.arange(max_len, dtype=np.int64)[None, :]
                      + starts[:, None], len(data) - 1)
    m = data[cols].astype(np.int64)  # (N, max_len)
    v0 = np.zeros(n, dtype=np.int64)
    v1 = np.zeros(n, dtype=np.int64)
    neg0 = np.zeros(n, dtype=bool)
    neg1 = np.zeros(n, dtype=bool)
    seen0 = np.zeros(n, dtype=bool)  # >=1 digit parsed in the field
    seen1 = np.zeros(n, dtype=bool)
    in1 = np.zeros(n, dtype=bool)    # past the ';'
    done = np.zeros(n, dtype=bool)
    invalid = np.zeros(n, dtype=bool)
    for c in range(max_len):
        b = m[:, c]
        act = ~done & ~invalid
        digit = (b >= 48) & (b <= 57)
        minus = b == 45
        semi = b == stop_bytes[0]
        quote = b == stop_bytes[1]
        in0 = ~in1
        d = b - 48
        v0 = np.where(act & digit & in0, v0 * 10 + d, v0)
        v1 = np.where(act & digit & in1, v1 * 10 + d, v1)
        # Strict ``-?[0-9]+;-?[0-9]+"`` parity with the regex fallback:
        # '-' only as a field's first character, ';' exactly once after
        # >=1 digit, '"' terminates field 2, and ANY other byte (e.g. the
        # '.' of decimal-degree content) voids the row instead of being
        # silently skipped.
        bad = act & minus & ((in0 & (seen0 | neg0)) | (in1 & (seen1 | neg1)))
        bad |= act & semi & (in1 | ~seen0)
        bad |= act & quote & (in0 | ~seen1)
        bad |= act & ~(digit | minus | semi | quote)
        neg0 |= act & minus & in0
        neg1 |= act & minus & in1
        seen0 |= act & digit & in0
        seen1 |= act & digit & in1
        done |= act & quote & in1 & seen1
        in1 |= act & semi & in0 & seen0
        invalid |= bad
    return (np.where(neg0, -v0, v0), np.where(neg1, -v1, v1),
            done & ~invalid)


def extract_text_geo(batch: pa.Table) -> pa.Table:
    """Fused extract_text + extract_geotag + drop_html in ONE byte-level
    vectorized pass (html is the memory-bandwidth hog of the flagship).

    Literal scanning instead of RE2: positions of ``<article>`` (first per
    row), ``</article>`` (last per row) and the geo meta tag are found with
    per-byte equality masks over the raw Arrow buffer (~3-8x the
    throughput of pc.extract_regex, measured), then text slices are
    gathered into a fresh Arrow string column and the fixed-point
    coordinates are parsed with a column-wise digit fold.  Any row that
    deviates from the expected layout sends the whole batch down the
    regex fallback (identical semantics for generic corpora).
    """
    html = batch["html"]
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    n = len(batch)
    if n == 0 or html.null_count:
        return drop_html(extract_geotag(extract_text(batch)))
    # offset width depends on the (large_)string/binary flavor; anything
    # else goes down the regex path
    if pa.types.is_string(html.type) or pa.types.is_binary(html.type):
        off_width = np.int32
    elif (pa.types.is_large_string(html.type)
          or pa.types.is_large_binary(html.type)):
        off_width = np.int64
    else:
        return drop_html(extract_geotag(extract_text(batch)))
    off0 = html.offset
    offs = np.frombuffer(html.buffers()[1], dtype=off_width)[
        off0:off0 + n + 1].astype(np.int64)
    data = np.frombuffer(html.buffers()[2], dtype=np.uint8)[
        offs[0]:offs[-1]]
    offs = offs - offs[0]

    # one full scan for '<'; all three tag literals verify from it
    lt = np.flatnonzero(data == ord("<"))
    open_pos = _first_per_row(_verify_literal(data, lt, _OPEN), offs, n)
    close_pos = _last_per_row(_verify_literal(data, lt, _CLOSE), offs, n)
    geo_pos = _first_per_row(_verify_literal(data, lt, _GEO), offs, n)
    t_start = open_pos + len(_OPEN)
    ok = ((open_pos >= 0) & (close_pos >= 0) & (geo_pos >= 0)
          & (close_pos >= t_start) & (close_pos + len(_CLOSE) <= offs[1:]))
    if not ok.all():
        return drop_html(extract_geotag(extract_text(batch)))

    flat, offs32 = _gather_ranges(data, t_start, close_pos - t_start)
    text = pa.StringArray.from_buffers(      # zero-copy buffer views
        n, pa.py_buffer(offs32), pa.py_buffer(flat))
    lat_e4, lng_e4, parsed = _parse_int_fields(
        data, geo_pos + len(_GEO))
    if not parsed.all():
        return drop_html(extract_geotag(extract_text(batch)))
    lat = lat_e4.astype(np.float64) / 10000.0
    lng = lng_e4.astype(np.float64) / 10000.0

    drop = [c for c in ("html", "text", "lat_e4", "lng_e4", "lat", "lng",
                        "has_geo") if c in batch.column_names]
    out = batch.drop_columns(drop)
    for name, col in (
        ("text", text),
        ("lat_e4", pa.array(lat_e4, type=pa.int64())),
        ("lng_e4", pa.array(lng_e4, type=pa.int64())),
        ("lat", pa.array(lat, type=pa.float64())),
        ("lng", pa.array(lng, type=pa.float64())),
        ("has_geo", pa.array(np.ones(n, dtype=bool))),
    ):
        out = out.append_column(name, col)
    return out


def drop_html(batch: pa.Table) -> pa.Table:
    """Drop the heavy html column as soon as extraction is done
    (memory-pressure control; SURVEY.md par.4)."""
    if "html" in batch.column_names:
        return batch.drop_columns(["html"])
    return batch
