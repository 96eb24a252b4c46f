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
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(_filter_rows(px, row_filters), 6)
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
    px = _defilter(raw, h, w, c)
    if px is None:
        return None
    return meta, px


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


# ---------------------------------------------------------------------------
# APNG (Animated PNG) — a REAL public video container (PNG spec 3rd ed. /
# the original Mozilla APNG extension): acTL declares the frame count,
# each frame is an fcTL control chunk plus IDAT (frame 0) or fdAT
# (sequence-numbered IDAT-equivalent) holding zlib-compressed PNG-filtered
# scanlines.  This encoder writes the simple profile every APNG reader
# accepts — full-size frames, zero offsets, dispose_op NONE, blend_op
# SOURCE — which also makes every frame independently decodable, i.e.
# honest frame SAMPLING (no inter-frame state).  The decoder rejects
# payloads outside that profile rather than guessing.

def _filter_rows(px: np.ndarray, row_filters=None) -> bytes:
    """Filter-prefixed PNG scanline serialization of an (h, w, c) uint8
    array (the shared encode core of PNG IDAT and APNG fdAT)."""
    h, w, c = px.shape
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
    return bytes(raw)


def _defilter(raw: bytes, h: int, w: int, c: int):
    """Reconstruct (h, w, c) uint8 pixels from filter-prefixed scanlines
    (the shared decode core of PNG IDAT and APNG fdAT); None on length or
    filter-id corruption."""
    stride = w * c
    if len(raw) != h * (stride + 1):
        return None
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = arr[:, 0]
    rows = arr[:, 1:]
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
    return px.reshape(h, w, c)


def build_apng(frames, delay_ms: int = 40, num_plays: int = 0) -> bytes:
    """Encode a list of same-shape (h, w[, c]) uint8 arrays as a real
    APNG byte string (acTL + per-frame fcTL + IDAT/fdAT, CRC-correct)."""
    if not frames:
        raise ValueError("APNG needs >= 1 frame")
    fr = [np.ascontiguousarray(f, dtype=np.uint8) for f in frames]
    fr = [f[:, :, None] if f.ndim == 2 else f for f in fr]
    h, w, c = fr[0].shape
    if any(f.shape != (h, w, c) for f in fr):
        raise ValueError("APNG frames must share one shape")
    color_type = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    actl = struct.pack(">II", len(fr), num_plays)
    out = bytearray(_PNG_SIG + _png_chunk(b"IHDR", ihdr)
                    + _png_chunk(b"acTL", actl))
    seq = 0
    for k, f in enumerate(fr):
        fctl = struct.pack(">IIIIIHHBB", seq, w, h, 0, 0,
                           int(delay_ms), 1000, 0, 0)   # dispose=0, blend=0
        out += _png_chunk(b"fcTL", fctl)
        seq += 1
        comp = zlib.compress(_filter_rows(f), 6)
        if k == 0:
            out += _png_chunk(b"IDAT", comp)
        else:
            out += _png_chunk(b"fdAT", struct.pack(">I", seq) + comp)
            seq += 1
    out += _png_chunk(b"IEND", b"")
    return bytes(out)


def _apng_chunks(data: bytes):
    """(ctype, payload_start, payload_len) walk, stopping at IEND; CRC is
    verified for control chunks by the callers that need it."""
    pos = 8
    while pos + 8 <= len(data):
        sz = struct.unpack(">I", data[pos:pos + 4])[0]
        ctype = data[pos + 4:pos + 8]
        yield ctype, pos + 8, sz
        if ctype == b"IEND":
            return
        pos += 12 + sz


def parse_apng(data: bytes) -> dict | None:
    """Metadata of an APNG byte string ({width, height, n_frames,
    duration_ms, format}), or None when the bytes are not an APNG (plain
    PNGs have no acTL)."""
    meta = parse_png(data)
    if meta is None:
        return None
    n_frames = duration_ms = None
    total_delay = 0
    seen_frames = 0
    for ctype, off, sz in _apng_chunks(data):
        if ctype == b"acTL" and sz >= 8:
            n_frames = struct.unpack(">I", data[off:off + 4])[0]
        elif ctype == b"fcTL" and sz >= 26:
            num, den = struct.unpack(">HH", data[off + 20:off + 24])
            total_delay += int(num * 1000 / (den or 100))
            seen_frames += 1
    if n_frames is None or seen_frames != n_frames:
        return None
    duration_ms = total_delay
    return {"width": meta["width"], "height": meta["height"],
            "bit_depth": meta["bit_depth"], "color_type": meta["color_type"],
            "n_frames": n_frames, "duration_ms": duration_ms,
            "format": "video/apng"}


def decode_apng_frame(data: bytes, frame_idx: int):
    """Decode ONE frame of an APNG to its (h, w, c) uint8 pixels — frames
    are independently decodable in the encoder's simple profile (full
    size, blend SOURCE), so sampling frame k never touches the others.
    Returns None for out-of-range indices, non-APNG bytes, or frames
    outside the simple profile (offsets / blend OVER)."""
    meta = parse_apng(data)
    if meta is None or meta["bit_depth"] != 8 \
            or meta["color_type"] not in _BPP:
        return None
    if not (0 <= frame_idx < meta["n_frames"]):
        return None
    w, h, c = meta["width"], meta["height"], _BPP[meta["color_type"]]
    k = -1
    want = None        # fcTL-validated: collect this frame's data chunks
    body = bytearray()
    for ctype, off, sz in _apng_chunks(data):
        if ctype == b"fcTL":
            if want is not None:
                break                     # finished collecting our frame
            k += 1
            if k == frame_idx:
                fw, fh, xo, yo = struct.unpack(">IIII", data[off + 4:off + 20])
                blend = data[off + 25]
                if (fw, fh, xo, yo) != (w, h, 0, 0) or blend != 0:
                    return None           # outside the simple profile
                want = k
        elif want is not None and ctype == b"IDAT":
            body += data[off:off + sz]
        elif want is not None and ctype == b"fdAT":
            body += data[off + 4:off + sz]   # strip the sequence number
    if want is None or not body:
        return None
    try:
        raw = zlib.decompress(bytes(body))
    except zlib.error:
        return None
    return _defilter(raw, h, w, c)
