"""PNG spec-matrix coverage (functions/png.py): every legal
depth/color-type combo, all five filters at every filter unit, Adam7
interlacing (pass partition => identical sums), palette lookups, and
the strictness envelope."""

import pytest

from quick_stream_spark.functions.png import (
    _LEGAL_DEPTHS,
    decode_png,
    encode_png,
)


def _val(x, y, lim):
    return (x * 7 + y * 13 + x * y) % lim


def _pixel_fn(color_type, depth):
    lim = 1 << depth
    samples = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    if samples == 1:
        return lambda x, y: _val(x, y, lim)
    return lambda x, y: tuple(
        _val(x + s, y, lim) for s in range(samples)
    )


def _expected_sums(w, h, color_type, depth, palette=None):
    lim = 1 << depth
    samples = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    if color_type == 3:
        sums = [0, 0, 0]
        for y in range(h):
            for x in range(w):
                r, g, b = palette[_val(x, y, lim)]
                sums[0] += r
                sums[1] += g
                sums[2] += b
        return sums
    sums = [0] * samples
    for y in range(h):
        for x in range(w):
            for s in range(samples):
                sums[s] += _val(x + s, y, lim)
    return sums


_COMBOS = [(ct, d) for ct, depths in _LEGAL_DEPTHS.items() for d in depths]


@pytest.mark.parametrize("color_type,depth", _COMBOS)
@pytest.mark.parametrize("interlace", [0, 1])
def test_every_legal_layout_roundtrips_exact(color_type, depth, interlace):
    """All 15 legal (type, depth) combos, plain and Adam7: decoded
    channel sums equal the generative formula exactly.  Dims 13x11 are
    coprime with every Adam7 stride and not byte-aligned at sub-byte
    depths, so pass geometry and bit padding are both exercised."""
    w, h = 13, 11
    palette = None
    if color_type == 3:
        palette = [((3 * i) % 256, (5 * i) % 256, (7 * i) % 256)
                   for i in range(1 << depth)]
    info = decode_png(
        encode_png(w, h, _pixel_fn(color_type, depth),
                   color_type=color_type, bit_depth=depth,
                   interlace=interlace, palette=palette)
    )
    assert (info["width"], info["height"]) == (w, h)
    assert info["bit_depth"] == depth
    assert info["channels"] == (3 if color_type == 3
                                else {0: 1, 2: 3, 4: 2, 6: 4}[color_type])
    assert info["channel_sums"] == _expected_sums(
        w, h, color_type, depth, palette
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("color_type,depth", [(0, 4), (0, 16), (2, 16),
                                              (3, 2), (6, 16)])
def test_all_filters_at_every_filter_unit(ftype, color_type, depth):
    """Each filter type against non-trivial filter units: bpp=1
    (sub-byte), 2 (16-bit gray), 6 (16-bit rgb), 8 (16-bit rgba)."""
    w, h = 9, 7
    palette = None
    if color_type == 3:
        palette = [(i * 60 % 256, i * 30 % 256, i * 90 % 256)
                   for i in range(1 << depth)]
    info = decode_png(
        encode_png(w, h, _pixel_fn(color_type, depth), filter_type=ftype,
                   color_type=color_type, bit_depth=depth, palette=palette)
    )
    assert info["channel_sums"] == _expected_sums(
        w, h, color_type, depth, palette
    )


def test_interlaced_equals_progressive_sums():
    """Adam7's passes partition the grid: the decoded statistics of the
    interlaced and non-interlaced encodings must be identical."""
    fn = _pixel_fn(2, 8)
    a = decode_png(encode_png(20, 17, fn, color_type=2, interlace=0))
    b = decode_png(encode_png(20, 17, fn, color_type=2, interlace=1))
    assert a["channel_sums"] == b["channel_sums"]
    assert a["n_pixels"] == b["n_pixels"] == 20 * 17


def test_16bit_values_above_255_survive():
    """16-bit samples must not be truncated to bytes."""
    info = decode_png(
        encode_png(3, 1, lambda x, y: 40000 + x, color_type=0, bit_depth=16)
    )
    assert info["channel_sums"] == [40000 + 40001 + 40002]


def test_single_pixel_interlaced():
    """1x1 Adam7: six of seven passes are empty."""
    info = decode_png(
        encode_png(1, 1, lambda x, y: 5, color_type=0, bit_depth=8,
                   interlace=1)
    )
    assert info["channel_sums"] == [5]


def test_palette_index_out_of_range_rejected():
    data = encode_png(
        2, 1, lambda x, y: x, color_type=3, bit_depth=8,
        palette=[(1, 2, 3), (4, 5, 6)],
    )
    # shrink PLTE to one entry: index 1 must now be rejected
    import struct
    import zlib as _z

    i = data.find(b"PLTE")
    (length,) = struct.unpack(">I", data[i - 4 : i])
    body = data[i + 4 : i + 4 + 3]  # keep only entry 0
    new = (
        struct.pack(">I", 3) + b"PLTE" + body
        + struct.pack(">I", _z.crc32(b"PLTE" + body) & 0xFFFFFFFF)
    )
    patched = data[: i - 4] + new + data[i + 8 + length :]
    with pytest.raises(ValueError, match="past PLTE"):
        decode_png(patched)


def test_error_envelope():
    with pytest.raises(ValueError, match="illegal depth"):
        encode_png(2, 2, lambda x, y: (0, 0, 0), color_type=2, bit_depth=4)
    with pytest.raises(ValueError, match="needs a palette"):
        encode_png(2, 2, lambda x, y: 0, color_type=3, bit_depth=4)
    # an IHDR claiming truecolor at depth 4 is rejected on decode
    import struct
    import zlib as _z

    data = bytearray(encode_png(2, 2, lambda x, y: (1, 2, 3), color_type=2))
    i = data.find(b"IHDR")
    body = bytearray(data[i + 4 : i + 4 + 13])
    body[8] = 4  # depth byte
    new = (
        struct.pack(">I", 13) + b"IHDR" + bytes(body)
        + struct.pack(">I", _z.crc32(b"IHDR" + bytes(body)) & 0xFFFFFFFF)
    )
    patched = bytes(data[: i - 4]) + new + bytes(data[i + 4 + 13 + 4 :])
    with pytest.raises(ValueError, match="unsupported PNG layout"):
        decode_png(patched)
    # palette image whose PLTE chunk is missing entirely
    pal_png = encode_png(2, 2, lambda x, y: 0, color_type=3, bit_depth=2,
                         palette=[(0, 0, 0)] * 4)
    j = pal_png.find(b"PLTE")
    (plen,) = struct.unpack(">I", pal_png[j - 4 : j])
    stripped = pal_png[: j - 4] + pal_png[j + 8 + plen :]
    with pytest.raises(ValueError, match="missing PLTE"):
        decode_png(stripped)