"""Pure-Python PNG codec (stdlib zlib only) — the REAL image-decode
kernel behind ``decoder="real"`` in :mod:`multimodal`.

This container has no PIL/ffmpeg, but PNG needs neither: the format is
chunked zlib-compressed scanlines with five per-scanline prediction
filters (RFC 2083).  The decoder covers the full spec matrix of legal
layouts: grayscale at 1/2/4/8/16 bits, truecolor and
truecolor+alpha / gray+alpha at 8/16 bits, indexed-palette (PLTE) at
1/2/4/8 bits, and Adam7 interlacing — chunk walk with CRC
verification, IDAT concatenation, zlib inflate, exact inverse
filtering for all five filter types (None/Sub/Up/Average/Paeth) at the
correct filter unit for every depth, sub-byte bit unpacking, and
per-pass scanline geometry for interlaced streams.  The encoder writes
the same subset (any filter type, any legal depth/type combo, optional
Adam7), so every decoder path is testable against real filtered data
it did not produce.

A note on interlaced statistics: Adam7's seven passes PARTITION the
pixel grid, so bounded per-channel sums accumulate pass-by-pass with
no deinterlace buffer — the decode stays O(scanline) in memory at any
resolution.

Scale posture: these kernels are per-payload Python executed inside
Arrow-batched ``mapInPandas`` stages — the standard shape for media
decode on Spark (CPU-heavy, embarrassingly parallel, no shuffle); the
cluster parallelism comes from partitioning, not from the kernel.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel
_SAMPLES = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# legal bit depths per color type (PNG spec §11.2.2)
_LEGAL_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}

# Adam7 pass grid: (x0, y0, dx, dy) per pass
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


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


def _pack_scanline(pixels: list[tuple], depth: int, samples: int) -> bytes:
    """Pack one scanline of per-pixel sample tuples into wire bytes:
    big-endian 16-bit, plain bytes at 8, MSB-first bit packing below."""
    if depth == 16:
        out = bytearray()
        for px in pixels:
            for v in px:
                out += struct.pack(">H", int(v) & 0xFFFF)
        return bytes(out)
    if depth == 8:
        return bytes(int(v) & 0xFF for px in pixels for v in px)
    # sub-byte depths: samples == 1 (gray or palette index)
    out = bytearray()
    acc = 0
    nbits = 0
    mask = (1 << depth) - 1
    for px in pixels:
        acc = (acc << depth) | (int(px[0]) & mask)
        nbits += depth
        if nbits == 8:
            out.append(acc)
            acc = 0
            nbits = 0
    if nbits:
        out.append(acc << (8 - nbits))  # pad the final byte's low bits
    return bytes(out)


def _unpack_scanline(line: bytes, depth: int, samples: int, w: int) -> list[int]:
    """Unpack a scanline's wire bytes into w*samples integer values."""
    n = w * samples
    if depth == 16:
        return list(struct.unpack(f">{n}H", line[: 2 * n]))
    if depth == 8:
        return list(line[:n])
    vals = []
    per_byte = 8 // depth
    mask = (1 << depth) - 1
    for byte in line:
        for k in range(per_byte):
            vals.append((byte >> (8 - depth * (k + 1))) & mask)
            if len(vals) == n:
                return vals
    if len(vals) < n:
        raise ValueError("pixel stream length mismatch")
    return vals


def _pass_dims(width: int, height: int, interlace: int):
    """Sub-image list [(x0, y0, dx, dy, w, h)], skipping empty passes."""
    if interlace == 0:
        return [(0, 0, 1, 1, width, height)]
    out = []
    for x0, y0, dx, dy in _ADAM7:
        w = (width - x0 + dx - 1) // dx
        h = (height - y0 + dy - 1) // dy
        if w > 0 and h > 0:
            out.append((x0, y0, dx, dy, w, h))
    return out


def encode_png(
    width: int,
    height: int,
    rgb,
    filter_type: int = 0,
    color_type: int = 2,
    bit_depth: int = 8,
    interlace: int = 0,
    palette: list[tuple] | None = None,
) -> bytes:
    """Encode pixels to a complete PNG.  ``rgb(x, y)`` returns the
    pixel's channel tuple (len matching ``color_type``; a bare int for
    1-sample types; a palette INDEX for ``color_type=3``).  Every
    scanline uses ``filter_type`` (0-4), so tests can exercise each
    inverse filter against genuinely filtered data; ``interlace=1``
    writes Adam7 passes."""
    if color_type not in _SAMPLES:
        raise ValueError(f"unknown color type {color_type}")
    if bit_depth not in _LEGAL_DEPTHS[color_type]:
        raise ValueError(
            f"illegal depth {bit_depth} for color type {color_type}"
        )
    if color_type == 3 and not palette:
        raise ValueError("palette color type needs a palette")
    samples = _SAMPLES[color_type]
    bpp = max(1, bit_depth * samples // 8)

    def px_at(x, y):
        px = rgb(x, y)
        return (px,) if isinstance(px, int) else tuple(px)

    stream = bytearray()
    for x0, y0, dx, dy, w, h in _pass_dims(width, height, interlace):
        prev = b""
        for yy in range(h):
            pixels = [px_at(x0 + xx * dx, y0 + yy * dy) for xx in range(w)]
            raw = _pack_scanline(pixels, bit_depth, samples)
            stream.append(filter_type)
            stream.extend(_filter_scanline(filter_type, raw, prev, bpp))
            prev = raw
    ihdr = struct.pack(
        ">IIBBBBB", width, height, bit_depth, color_type, 0, 0, interlace
    )
    out = _PNG_SIG + _chunk(b"IHDR", ihdr)
    if color_type == 3:
        out += _chunk(
            b"PLTE",
            bytes(int(v) & 0xFF for entry in palette for v in entry[:3]),
        )
    out += _chunk(b"IDAT", zlib.compress(bytes(stream)))
    out += _chunk(b"IEND", b"")
    return out


def decode_png(data: bytes) -> dict:
    """Decode a PNG: returns ``{width, height, bit_depth, color_type,
    channels, n_pixels, channel_sums}`` where ``channel_sums`` is the
    per-channel sum of all pixel values — the bounded statistic a
    feature-extraction stage emits (full pixel arrays never leave the
    kernel).  Indexed-palette images report 3 RGB channels through the
    PLTE lookup.  Raises ``ValueError`` on a malformed payload (bad
    signature, CRC mismatch, truncated stream, illegal depth/type
    combo, index past the palette)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    plte: list[tuple[int, int, int]] | None = None
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
        elif tag == b"PLTE":
            if len(body) % 3 != 0 or not body:
                raise ValueError("PLTE length must be a positive multiple of 3")
            plte = [
                (body[i], body[i + 1], body[i + 2])
                for i in range(0, len(body), 3)
            ]
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    width, height, bit_depth, color_type, comp, filt, interlace = ihdr
    if (
        color_type not in _SAMPLES
        or bit_depth not in _LEGAL_DEPTHS.get(color_type, ())
        or interlace not in (0, 1)
    ):
        raise ValueError(
            f"unsupported PNG layout: depth={bit_depth} color={color_type} "
            f"interlace={interlace}"
        )
    if color_type == 3 and plte is None:
        raise ValueError("palette image missing PLTE")
    if not idat:
        raise ValueError("missing IDAT")
    if width == 0 or height == 0:
        raise ValueError("zero PNG dimensions")
    samples = _SAMPLES[color_type]
    bpp = max(1, bit_depth * samples // 8)
    passes = _pass_dims(width, height, interlace)
    # decompression-bomb guard: the scanline geometry fixes the exact
    # inflated size, so cap the inflate there instead of trusting a
    # hostile IDAT (a few KB can otherwise inflate to gigabytes)
    expected = sum(
        h * (1 + (w * bit_depth * samples + 7) // 8)
        for _x0, _y0, _dx, _dy, w, h in passes
    )
    try:
        raw = zlib.decompressobj().decompress(bytes(idat), expected + 1)
    except zlib.error as e:
        raise ValueError(f"bad IDAT zlib stream: {e}") from e

    out_channels = 3 if color_type == 3 else samples
    sums = [0] * out_channels
    pos = 0
    for x0, y0, dx, dy, w, h in passes:
        stride = (w * bit_depth * samples + 7) // 8
        prev = b""
        for _yy in range(h):
            if pos + 1 + stride > len(raw):
                raise ValueError("pixel stream length mismatch")
            ftype = raw[pos]
            line = bytearray(raw[pos + 1 : pos + 1 + stride])
            pos += 1 + stride
            _unfilter_scanline(ftype, line, prev, bpp)
            vals = _unpack_scanline(bytes(line), bit_depth, samples, w)
            if color_type == 3:
                for idx in vals:
                    if idx >= len(plte):
                        raise ValueError(
                            f"palette index {idx} past PLTE size {len(plte)}"
                        )
                    r, g, b = plte[idx]
                    sums[0] += r
                    sums[1] += g
                    sums[2] += b
            else:
                for i, v in enumerate(vals):
                    sums[i % samples] += v
            prev = bytes(line)
    if pos != len(raw):
        raise ValueError("pixel stream length mismatch")
    return {
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "color_type": color_type,
        "channels": out_channels,
        "n_pixels": width * height,
        "channel_sums": sums,
    }
