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
