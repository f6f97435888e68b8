"""Pure-Python PNG codec (stdlib zlib only) — the REAL image-decode
kernel behind ``decoder="real"`` in :mod:`multimodal`.

This container has no PIL/ffmpeg, but PNG needs neither: the format is
chunked zlib-compressed scanlines with five per-scanline prediction
filters (RFC 2083).  The decoder here is complete for 8-bit truecolor
/ truecolor+alpha / grayscale images: chunk walk with CRC verification,
IDAT concatenation, zlib inflate, and exact inverse filtering for all
five filter types (None/Sub/Up/Average/Paeth).  The encoder writes the
same subset and can apply any filter type, so the decoder's inverse
filters are testable against real filtered data, not just filter-0.

Scale posture: these kernels are per-payload Python executed inside
Arrow-batched ``mapInPandas`` stages — the standard shape for media
decode on Spark (CPU-heavy, embarrassingly parallel, no shuffle); the
cluster parallelism comes from partitioning, not from the kernel.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_scanline(ftype: int, raw: bytes, prev: bytes, bpp: int) -> bytes:
    """Apply filter ``ftype`` to a raw scanline (encoder side)."""
    out = bytearray(len(raw))
    for i, x in enumerate(raw):
        a = raw[i - bpp] if i >= bpp else 0
        b = prev[i] if prev else 0
        c = prev[i - bpp] if (prev and i >= bpp) else 0
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x - a) & 0xFF
        elif ftype == 2:
            out[i] = (x - b) & 0xFF
        elif ftype == 3:
            out[i] = (x - (a + b) // 2) & 0xFF
        elif ftype == 4:
            out[i] = (x - _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return bytes(out)


def _unfilter_scanline(ftype: int, line: bytearray, prev: bytes, bpp: int) -> None:
    """Invert filter ``ftype`` in place (decoder side)."""
    if ftype == 0:
        return
    for i in range(len(line)):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i] if prev else 0
        c = prev[i - bpp] if (prev and i >= bpp) else 0
        if ftype == 1:
            line[i] = (line[i] + a) & 0xFF
        elif ftype == 2:
            line[i] = (line[i] + b) & 0xFF
        elif ftype == 3:
            line[i] = (line[i] + (a + b) // 2) & 0xFF
        elif ftype == 4:
            line[i] = (line[i] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")


def encode_png(
    width: int, height: int, rgb, filter_type: int = 0, color_type: int = 2
) -> bytes:
    """Encode 8-bit pixels to a complete PNG.  ``rgb(x, y)`` returns the
    pixel's channel tuple (len matching ``color_type``).  Every
    scanline uses ``filter_type`` (0-4), so tests can exercise each
    inverse filter against genuinely filtered data."""
    ch = _CHANNELS[color_type]
    bpp = ch
    raw_lines = []
    for y in range(height):
        line = bytearray()
        for x in range(width):
            px = rgb(x, y)
            if ch == 1:
                px = (px,) if isinstance(px, int) else px
            line.extend(int(v) & 0xFF for v in px)
        raw_lines.append(bytes(line))
    stream = bytearray()
    prev = b""
    for raw in raw_lines:
        stream.append(filter_type)
        stream.extend(_filter_scanline(filter_type, raw, prev, bpp))
        prev = raw
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(stream)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> dict:
    """Decode a PNG: returns ``{width, height, bit_depth, color_type,
    channels, n_pixels, channel_sums}`` where ``channel_sums`` is the
    per-channel sum of all pixel values — the bounded statistic a
    feature-extraction stage emits (full pixel arrays never leave the
    kernel).  Raises ``ValueError`` on a malformed payload (bad
    signature, CRC mismatch, truncated stream, unsupported layout)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if pos + 12 + length > len(data):
            raise ValueError("truncated chunk")
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if crc != (zlib.crc32(tag + body) & 0xFFFFFFFF):
            raise ValueError(f"CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            if len(body) != 13:
                raise ValueError(f"IHDR body must be 13 bytes, got {len(body)}")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    width, height, bit_depth, color_type, comp, filt, interlace = ihdr
    if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG layout: depth={bit_depth} color={color_type} "
            f"interlace={interlace}"
        )
    if not idat:
        raise ValueError("missing IDAT")
    ch = _CHANNELS[color_type]
    stride = width * ch
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"bad IDAT zlib stream: {e}") from e
    if len(raw) != height * (stride + 1):
        raise ValueError("pixel stream length mismatch")
    sums = [0] * ch
    prev = b""
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        _unfilter_scanline(ftype, line, prev, ch)
        for i, v in enumerate(line):
            sums[i % ch] += v
        prev = bytes(line)
    return {
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "color_type": color_type,
        "channels": ch,
        "n_pixels": width * height,
        "channel_sums": sums,
    }
