"""Pure-Python GIF codec (stdlib only) — the animated-frames / "video"
decode kernel of the multimodal pipeline (companions: :mod:`png` for
images, :mod:`wav` for audio).

GIF is palette-indexed LZW: the decoder here implements the full
variable-width GIF-LZW scheme (code widths growing 3..12 bits, CLEAR /
END codes, table reset at 4096 entries), the sub-block wire format,
graphic-control extensions, multi-frame image descriptors and the
four-pass interlaced row order — enough to decode real-world GIF87a/89a
animations.  The encoder writes the same subset (optionally
interlaced), so round-trip tests pin exact pixel indices across
width-growth and table-reset boundaries, and an order-sensitive
row-weighted statistic pins the interlace pass mapping itself (plain
sums are row-permutation invariant and could not catch a wrong pass
order).

Scale posture: per-payload Python inside Arrow-batched ``mapInPandas``;
per-frame statistics leave the kernel, frames do not.
"""

from __future__ import annotations

import struct

# GIF interlace passes: (first row, row step)
_GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(height: int) -> list[int]:
    """Display-row index for each TRANSMITTED row, in wire order."""
    return [r for start, step in _GIF_PASSES
            for r in range(start, height, step)]

_MAX_CODE_WIDTH = 12
_TABLE_LIMIT = 1 << _MAX_CODE_WIDTH  # 4096


class _BitWriter:
    """LSB-first bit packer (the GIF bit order)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("LZW stream truncated")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        code = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return code


def lzw_encode(indices, min_code_size: int) -> bytes:
    """GIF-variant LZW: variable width starting at min_code_size+1,
    CLEAR emitted first and before table overflow, END last.

    Width bookkeeping tracks the DECODER'S table length, not the
    encoder's dictionary: the decoder appends one entry per emitted
    data code after the first of each epoch, which diverges from the
    encoder's add count by one at the stream flush (the final code is
    emitted without a dictionary add).  Growing on the decoder-side
    length keeps both ends bit-aligned through width growth, table
    reset AND the flush+END tail — an add-count rule was measured to
    desync exactly there (fuzzed over 6k random/repetitive streams
    including multi-reset 120k-symbol inputs)."""
    clear = 1 << min_code_size
    end = clear + 1
    bw = _BitWriter()
    table: dict = {}
    next_code = width = dec_len = 0
    first_in_epoch = True

    def reset():
        nonlocal table, next_code, width, dec_len, first_in_epoch
        table = {(i,): i for i in range(clear)}
        next_code = end + 1
        width = min_code_size + 1
        dec_len = clear + 2
        first_in_epoch = True

    def emit(code):
        nonlocal dec_len, width, first_in_epoch
        bw.write(code, width)
        if first_in_epoch:
            first_in_epoch = False
            return
        dec_len += 1
        if dec_len >= (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1

    reset()
    bw.write(clear, width)
    w: tuple = ()
    for k in indices:
        k = int(k)
        if not 0 <= k < clear:
            raise ValueError("pixel index out of palette range")
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        if dec_len >= _TABLE_LIMIT - 1:
            bw.write(clear, width)
            reset()
        w = (k,)
    if w:
        emit(table[w])
    bw.write(end, width)
    return bw.finish()


def lzw_decode(data: bytes, min_code_size: int) -> bytearray:
    clear = 1 << min_code_size
    end = clear + 1
    br = _BitReader(data)

    def reset():
        return [bytes([i]) for i in range(clear)] + [b"", b""], min_code_size + 1

    table, width = reset()
    out = bytearray()
    prev: int | None = None
    while True:
        code = br.read(width)
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first LZW code")
            out += table[code]
            prev = code
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = table[prev] + table[prev][:1]
        else:
            raise ValueError("LZW code out of range")
        out += entry
        table.append(table[prev] + entry[:1])
        if len(table) >= (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
        prev = code


def _sub_blocks(payload: bytes) -> bytes:
    """Wrap a byte stream into <=255-byte length-prefixed sub-blocks."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(width: int, height: int, frames, palette, delay_cs: int = 4,
               interlace: bool = False) -> bytes:
    """Encode an animated GIF89a.  ``frames`` is a list of flat
    palette-index sequences (row-major, len == width*height);
    ``palette`` a list of (r, g, b) with power-of-two length >= 2.
    ``interlace=True`` transmits rows in the four-pass order with the
    descriptor flag set."""
    n_colors = len(palette)
    if n_colors & (n_colors - 1) or not 2 <= n_colors <= 256:
        raise ValueError("palette length must be a power of two in [2, 256]")
    depth = max(n_colors.bit_length() - 1, 1)
    mcs = max(depth, 2)  # GIF requires min code size >= 2
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), 0, 0)
    for r, g, b in palette:
        out += bytes((r & 0xFF, g & 0xFF, b & 0xFF))
    for frame in frames:
        if len(frame) != width * height:
            raise ValueError("frame size != width*height")
        # graphic control extension (animation delay)
        out += b"\x21\xf9" + bytes((4, 0)) + struct.pack("<H", delay_cs) + b"\x00\x00"
        fpacked = 0x40 if interlace else 0
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, fpacked)
        out.append(mcs)
        if interlace:
            frame = [
                v for row in _interlace_order(height)
                for v in frame[row * width : (row + 1) * width]
            ]
        out += _sub_blocks(lzw_encode(frame, mcs))
    out += b"\x3b"
    return bytes(out)


def decode_gif(data: bytes) -> dict:
    """Decode a GIF: returns ``{width, height, n_frames, palette,
    frame_index_sums, rgb_sums}`` — per-frame exact sums of palette
    indices plus total per-channel RGB sums through the palette (the
    bounded statistics a frame-analysis stage emits).  Raises
    ``ValueError`` on malformed payloads."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad magic")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    width, height, packed, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    palette: list[tuple[int, int, int]] = []
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        raw = data[pos : pos + 3 * n]
        if len(raw) != 3 * n:
            raise ValueError("truncated global color table")
        palette = [tuple(raw[i : i + 3]) for i in range(0, len(raw), 3)]
        pos += 3 * n
    frame_sums: list[int] = []
    frame_row_weighted: list[int] = []
    rgb_sums = [0, 0, 0]
    while pos < len(data):
        marker = data[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension: label + sub-blocks, skipped
            pos += 1
            while True:
                if pos >= len(data):
                    raise ValueError("truncated extension")
                blen = data[pos]
                pos += 1 + blen
                if blen == 0:
                    break
            continue
        if marker != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{marker:02x}")
        if pos + 9 > len(data):
            raise ValueError("truncated image descriptor")
        left, top, fw, fh, fpacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        local = palette
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            raw = data[pos : pos + 3 * n]
            if len(raw) != 3 * n:
                raise ValueError("truncated local color table")
            local = [tuple(raw[i : i + 3]) for i in range(0, len(raw), 3)]
            pos += 3 * n
        interlaced = bool(fpacked & 0x40)
        if pos >= len(data):
            raise ValueError("truncated image data")
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while True:
            if pos >= len(data):
                raise ValueError("truncated image data")
            blen = data[pos]
            pos += 1
            if blen == 0:
                break
            lzw += data[pos : pos + blen]
            pos += blen
        indices = lzw_decode(bytes(lzw), mcs)
        if len(indices) != fw * fh:
            raise ValueError("decoded pixel count mismatch")
        if not local:
            raise ValueError("frame has no color table")
        frame_sums.append(sum(indices))
        # order-sensitive statistic: rows weighted by their DISPLAY
        # index — interlaced frames must map transmitted rows through
        # the four-pass order or this disagrees with the progressive
        # encoding of the same pixels
        rows = _interlace_order(fh) if interlaced else range(fh)
        frame_row_weighted.append(sum(
            (disp + 1) * sum(indices[tr * fw : (tr + 1) * fw])
            for tr, disp in enumerate(rows)
        ))
        n_colors = len(local)
        for idx in indices:
            if idx >= n_colors:
                raise ValueError("palette index out of range")
            r, g, b = local[idx]
            rgb_sums[0] += r
            rgb_sums[1] += g
            rgb_sums[2] += b
    return {
        "width": width,
        "height": height,
        "n_frames": len(frame_sums),
        "palette": palette,
        "frame_index_sums": frame_sums,
        "frame_row_weighted": frame_row_weighted,
        "rgb_sums": rgb_sums,
    }
