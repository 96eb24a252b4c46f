"""Pure-python media header codecs (PNG / WAV), used by MediaDecodeStage's
``use_real_codec=True`` branch when PIL/soundfile are absent.

These are real, byte-exact parsers of the public container formats (PNG
IHDR per the PNG spec; RIFF/WAVE fmt+data chunks per the WAV spec) — only
the PIXEL/PCM decoding is out of scope in this container.  Builders emit
minimal well-formed files (PNG with CRC-correct chunks) so tests can
round-trip build -> parse byte-exactly.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))


def build_png(width: int, height: int, bit_depth: int = 8,
              color_type: int = 2) -> bytes:
    """Minimal well-formed PNG: signature + IHDR + empty IDAT + IEND."""
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type,
                       0, 0, 0)
    idat = zlib.compress(b"")  # empty pixel stream: header-only fixture
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", idat)
            + _png_chunk(b"IEND", b""))


def parse_png(data: bytes) -> dict | None:
    """Header metadata of a PNG byte string, or None if not a PNG."""
    if len(data) < 33 or data[:8] != _PNG_SIG or data[12:16] != b"IHDR":
        return None
    width, height, bit_depth, color_type = struct.unpack(">IIBB", data[16:26])
    crc = struct.unpack(">I", data[29:33])[0]
    if crc != (zlib.crc32(data[12:29]) & 0xFFFFFFFF):
        return None
    return {"width": width, "height": height, "bit_depth": bit_depth,
            "color_type": color_type, "format": "image/png"}


def build_wav(sample_rate: int, n_samples: int, channels: int = 1,
              bits: int = 16, include_data: bool = False) -> bytes:
    """Minimal RIFF/WAVE: fmt chunk + data chunk header (PCM).  With
    ``include_data`` the (zero) samples are materialized; otherwise only
    the declared size is written (enough for header parsing)."""
    data_len = n_samples * channels * (bits // 8)
    byte_rate = sample_rate * channels * (bits // 8)
    block_align = channels * (bits // 8)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      block_align, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", data_len)
    if include_data:
        body += b"\x00" * data_len
    return b"RIFF" + struct.pack("<I", 4 + len(body) - 4) + body


def parse_wav(data: bytes) -> dict | None:
    """Header metadata of a RIFF/WAVE byte string, or None."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos = 12
    rate = channels = bits = data_len = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        sz = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        if cid == b"fmt " and pos + 8 + 16 <= len(data):
            _fmt_tag, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", data[pos + 8:pos + 24])
        elif cid == b"data":
            data_len = sz
            break  # data payload may be truncated in header-only files
        pos += 8 + sz + (sz & 1)
    if rate is None or data_len is None or not rate or not channels or not bits:
        return None
    n_samples = data_len // (channels * (bits // 8))
    return {"sample_rate": rate, "channels": channels, "bits": bits,
            "n_samples": n_samples,
            "duration_ms": int(n_samples * 1000 // rate),
            "format": "audio/wav"}


# ---------------------------------------------------------------------------
# Full pixel codec (pure python + numpy + stdlib zlib) — REAL image bytes,
# no PIL needed.  Supports 8-bit greyscale (color_type 0), RGB (2) and
# RGBA (6), no interlace; all five PNG row filters are decoded (None/Sub/
# Up vectorized; Average/Paeth scalar per byte — fixture-sized images).

import numpy as np

_BPP = {0: 1, 2: 3, 6: 4}


def encode_png(pixels, row_filters=None) -> bytes:
    """Encode an (h, w) or (h, w, c) uint8 array as a real PNG byte string.

    row_filters: optional per-row PNG filter ids (0..4) — used by tests to
    exercise every decoder path; default all 0 (None filter).
    """
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    bpp = c
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        row = px[y].reshape(-1)
        f = 0 if row_filters is None else int(row_filters[y])
        raw.append(f)
        if f == 0:
            out = row
        elif f == 1:      # Sub
            left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
            out = row - left
        elif f == 2:      # Up
            out = row - prev
        elif f == 3:      # Average
            left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
            out = row - ((left.astype(np.uint16)
                          + prev.astype(np.uint16)) // 2).astype(np.uint8)
        elif f == 4:      # Paeth
            left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]])
            out = row - _paeth(left, prev, ul)
        else:
            raise ValueError(f"bad filter {f}")
        raw.extend(out.tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(bytes(raw), 6)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", idat)
            + _png_chunk(b"IEND", b""))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (a=left, b=up, c=upper-left)."""
    ai, bi, ci = (x.astype(np.int16) for x in (a, b, c))
    p = ai + bi - ci
    pa_, pb, pc_ = np.abs(p - ai), np.abs(p - bi), np.abs(p - ci)
    out = np.where((pa_ <= pb) & (pa_ <= pc_), a,
                   np.where(pb <= pc_, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes):
    """Full pixel decode of an 8-bit non-interlaced PNG.

    Returns (meta dict, (h, w, c) uint8 array) or None if the bytes are
    not a decodable PNG (bad magic/CRC, truncated IDAT, exotic format).
    """
    meta = parse_png(data)
    if meta is None or meta["bit_depth"] != 8 \
            or meta["color_type"] not in _BPP:
        return None
    w, h = meta["width"], meta["height"]
    c = _BPP[meta["color_type"]]
    # walk chunks, concatenating IDAT payloads
    pos = 8
    idat = bytearray()
    while pos + 8 <= len(data):
        sz = struct.unpack(">I", data[pos:pos + 4])[0]
        ctype = data[pos + 4:pos + 8]
        if ctype == b"IDAT":
            idat.extend(data[pos + 8:pos + 8 + sz])
        if ctype == b"IEND":
            break
        pos += 12 + sz
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = w * c
    if len(raw) != h * (stride + 1):
        return None
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = raw[:, 0]
    rows = raw[:, 1:]
    px = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(filters[y])
        r = rows[y]
        if f == 0:
            row = r.copy()
        elif f == 1:      # Sub: per-lane prefix sum mod 256
            row = r.reshape(-1, c).astype(np.uint64).cumsum(axis=0) \
                .astype(np.uint8).reshape(-1)
        elif f == 2:      # Up
            row = r + prev
        elif f in (3, 4):  # Average / Paeth: sequential in x
            row = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                left = row[x - c] if x >= c else np.uint8(0)
                up = prev[x]
                if f == 3:
                    pred = (int(left) + int(up)) // 2
                else:
                    ul = prev[x - c] if x >= c else np.uint8(0)
                    pred = int(_paeth(np.array([left]), np.array([up]),
                                      np.array([ul]))[0])
                row[x] = np.uint8((int(r[x]) + pred) % 256)
        else:
            return None
        px[y] = row
        prev = row
    return meta, px.reshape(h, w, c)


def decode_wav(data: bytes):
    """Returns (meta, int16 sample array (n, channels)) or None."""
    meta = parse_wav(data)
    if meta is None or meta["bits"] != 16:
        return None
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        sz = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        if cid == b"data":
            body = data[pos + 8:pos + 8 + sz]
            n = len(body) // 2 // meta["channels"] * meta["channels"]
            samples = np.frombuffer(body[:n * 2], dtype="<i2") \
                .reshape(-1, meta["channels"])
            return meta, samples
        pos += 8 + sz + (sz & 1)
    return None


def resize_nearest(pixels: np.ndarray, max_dim: int) -> np.ndarray:
    """Aspect-preserving nearest-neighbor downscale to fit max_dim
    (no-op when already within bounds)."""
    h, w = pixels.shape[:2]
    if max(h, w) <= max_dim:
        return pixels
    scale = max_dim / max(h, w)
    nh, nw = max(1, int(round(h * scale))), max(1, int(round(w * scale)))
    yi = np.minimum((np.arange(nh) / scale).astype(np.int64), h - 1)
    xi = np.minimum((np.arange(nw) / scale).astype(np.int64), w - 1)
    return pixels[yi][:, xi]
