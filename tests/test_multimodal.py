"""Plumbing tests for the multimodal decode pipeline (stubbed codecs)."""

import pytest
from pyspark.sql import functions as F

from quick_stream_spark.functions.multimodal import (
    DECODED_SCHEMA,
    decode_media,
    documents_as_media,
    sample_frames,
)
from quick_stream_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    return documents_as_media(load_table(spark, SF_SMOKE, "documents"))


def test_decode_schema_and_determinism(spark, media):
    out = decode_media(media, decoder="fake")
    assert out.schema == DECODED_SCHEMA
    a = {r.media_id: (r.sha256, r.width, r.height, r.n_frames) for r in out.collect()}
    b = {r.media_id: (r.sha256, r.width, r.height, r.n_frames) for r in out.collect()}
    assert a == b  # deterministic fake decode
    assert len(a) == media.count()
    assert all(64 <= v[1] < 256 for v in a.values())


def test_decode_byte_counts_match_payload(spark, media):
    out = decode_media(media, decoder="fake")
    joined = out.join(media, "media_id").select(
        "media_id", "n_bytes", F.octet_length("payload").alias("expected")
    )
    assert joined.filter(F.col("n_bytes") != F.col("expected")).count() == 0


def test_real_decoder_raises_at_the_seam(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        decode_media(media.limit(2), decoder="real").collect()


def test_frame_sampling(spark, media):
    decoded = decode_media(media.limit(50), decoder="fake")
    frames = sample_frames(decoded, every_nth=2)
    got = frames.groupBy("media_id").count().join(decoded, "media_id")
    expected = F.floor((F.col("n_frames") - 1) / 2) + 1  # ceil(n/2)
    bad = got.filter(F.col("count") != expected).count()
    assert bad == 0


# ----------------------------------------------------- real PNG codec


def _px(x, y):
    return ((x * 3 + y) % 256, (x + y * 5) % 256, (x * x + y) % 256)


def test_png_roundtrip_every_filter_type():
    """Each of the five PNG scanline predictors must invert exactly:
    encode with filter f, decode, compare exact channel sums against
    the generative formula."""
    from quick_stream_spark.functions.png import decode_png, encode_png

    w, h = 9, 7
    want = [0, 0, 0]
    for y in range(h):
        for x in range(w):
            p = _px(x, y)
            for c in range(3):
                want[c] += p[c]
    for f in range(5):
        data = encode_png(w, h, _px, filter_type=f)
        info = decode_png(data)
        assert (info["width"], info["height"]) == (w, h)
        assert info["channel_sums"] == want, f"filter {f} did not invert"


def test_png_grayscale_and_alpha_layouts():
    from quick_stream_spark.functions.png import decode_png, encode_png

    g = encode_png(5, 4, lambda x, y: ((x * 7 + y) % 256,), color_type=0)
    gi = decode_png(g)
    assert gi["channels"] == 1 and gi["n_pixels"] == 20
    rgba = encode_png(
        5, 4, lambda x, y: (x % 256, y % 256, (x + y) % 256, 255), color_type=6
    )
    ai = decode_png(rgba)
    assert ai["channels"] == 4
    assert ai["channel_sums"][3] == 255 * 20  # opaque alpha plane


def test_png_rejects_corruption():
    import pytest as _pytest

    from quick_stream_spark.functions.png import decode_png, encode_png

    data = bytearray(encode_png(6, 6, _px))
    with _pytest.raises(ValueError, match="signature"):
        decode_png(b"GIF89a" + bytes(data))
    data[40] ^= 0xFF  # flip a byte inside a chunk body -> CRC mismatch
    with _pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_png_rejects_structurally_valid_but_malformed_chunks():
    """Regression (r3 ADVICE): payloads whose chunks carry CORRECT CRCs
    but are semantically broken must still raise ValueError, never leak
    struct.error / zlib.error into a DLQ flow that catches ValueError."""
    import struct
    import zlib

    import pytest as _pytest

    from quick_stream_spark.functions.png import (
        _PNG_SIG,
        _chunk,
        decode_png,
        encode_png,
    )

    # IHDR body that is not 13 bytes (valid CRC) -> used to struct.error
    short_ihdr = _PNG_SIG + _chunk(b"IHDR", b"\x00" * 7) + _chunk(b"IEND", b"")
    with _pytest.raises(ValueError, match="IHDR body"):
        decode_png(short_ihdr)

    ihdr13 = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)

    # no IDAT chunk at all -> used to zlib.error on empty stream
    no_idat = _PNG_SIG + _chunk(b"IHDR", ihdr13) + _chunk(b"IEND", b"")
    with _pytest.raises(ValueError, match="IDAT"):
        decode_png(no_idat)

    # garbage IDAT bytes with a correct chunk CRC -> used to zlib.error
    bad_idat = (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr13)
        + _chunk(b"IDAT", b"not a zlib stream")
        + _chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="zlib"):
        decode_png(bad_idat)

    # sanity: a well-formed payload still decodes after the guards
    assert decode_png(encode_png(6, 6, _px))["n_pixels"] == 36


def test_real_decoder_decodes_png_jpeg_and_keeps_seam_for_rest(spark):
    """decoder='real' genuinely decodes PNG and baseline-JPEG payloads
    through the mapInPandas stage; formats outside the from-scratch
    codecs (e.g. MP4) still raise at the PIL/ffmpeg seam, and a
    malformed JPEG raises the decoder's own ValueError, not the seam."""
    from quick_stream_spark.functions.jpeg import encode_jpeg
    from quick_stream_spark.functions.multimodal import decode_media
    from quick_stream_spark.functions.png import encode_png

    rows = [(1, encode_png(8, 5, _px), "image", "png"),
            (2, encode_png(3, 3, _px), "image", "png"),
            (3, encode_jpeg(10, 6, lambda x, y: (_px(x, y)[0],) * 3),
             "image", "jpeg")]
    media = spark.createDataFrame(
        rows, "media_id long, payload binary, media_type string, format_hint string"
    )
    got = {r.media_id: (r.width, r.height) for r in
           decode_media(media, decoder="real").collect()}
    assert got == {1: (8, 5), 2: (3, 3), 3: (10, 6)}

    from quick_stream_spark.functions.mp4 import encode_mp4

    avc1 = spark.createDataFrame(
        [(4, encode_mp4(16, 16, [b"\x00\x01\x02"] * 2, codec="avc1"),
          "video", "mp4")],
        "media_id long, payload binary, media_type string, format_hint string",
    )
    with pytest.raises(Exception, match="PIL/ffmpeg"):
        decode_media(avc1, decoder="real").collect()

    mjpeg = spark.createDataFrame(
        [(6, encode_mp4(
            10, 6,
            [encode_jpeg(10, 6, lambda x, y: (_px(x, y)[0],) * 3)] * 3,
            codec="jpeg"), "video", "mp4")],
        "media_id long, payload binary, media_type string, format_hint string",
    )
    row = decode_media(mjpeg, decoder="real").collect()[0]
    assert (row.width, row.height, row.n_frames) == (10, 6, 3)

    bad_jpeg = spark.createDataFrame(
        [(5, b"\xff\xd8\xff\xe0fakejpeg", "image", "jpeg")],
        "media_id long, payload binary, media_type string, format_hint string",
    )
    with pytest.raises(Exception, match="truncated|marker"):
        decode_media(bad_jpeg, decoder="real").collect()


# ----------------------------------------------------- real WAV codec


def test_wav_roundtrip_mono_and_stereo():
    from quick_stream_spark.functions.wav import decode_wav, encode_wav

    mono = [((i * 3) % 201) - 100 for i in range(50)]
    info = decode_wav(encode_wav(mono, 8000, 1))
    assert info["channels"] == 1 and info["n_samples"] == 50
    assert info["channel_sums"] == [sum(mono)]
    assert info["channel_sumsq"] == [sum(v * v for v in mono)]
    assert info["duration_ms"] == 50 * 1000 // 8000

    stereo = [(i, -i) for i in range(100)]
    si = decode_wav(encode_wav(stereo, 16000, 2))
    assert si["channels"] == 2
    assert si["channel_sums"] == [sum(range(100)), -sum(range(100))]


def test_wav_tolerates_extra_chunks_and_rejects_corruption():
    import struct

    import pytest as _pytest

    from quick_stream_spark.functions.wav import decode_wav, encode_wav

    data = encode_wav([1, 2, 3], 8000, 1)
    # splice a LIST chunk between fmt and data (real encoders do this)
    fmt_end = data.index(b"data")
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = data[:fmt_end] + extra + data[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert decode_wav(spliced)["n_samples"] == 3

    with _pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + data[4:])
    # truncate mid-PCM
    with _pytest.raises(ValueError, match="truncated"):
        decode_wav(data[:-3])


# ----------------------------------------------------- real GIF codec


def test_gif_lzw_roundtrip_across_width_growth_and_reset():
    """The variable-width LZW stream must round-trip exactly, including
    past the 4096-entry table reset (60k pixels of 4 colors builds far
    more than 4096 dictionary entries)."""
    import random

    from quick_stream_spark.functions.gif import lzw_decode, lzw_encode

    rng = random.Random(7)
    for n, ncolors in [(300, 4), (5000, 16), (60000, 4), (9000, 256)]:
        mcs = max((ncolors - 1).bit_length(), 2)
        seq = [rng.randrange(ncolors) for _ in range(n)]
        assert list(lzw_decode(lzw_encode(seq, mcs), mcs)) == seq, (n, ncolors)
    rep = [1, 2, 3, 4] * 3000 + [0] * 2000  # long dictionary chains
    assert list(lzw_decode(lzw_encode(rep, 3), 3)) == rep


def test_gif_animation_roundtrip_and_corruption():
    import pytest as _pytest

    from quick_stream_spark.functions.gif import decode_gif, encode_gif

    pal = [(i * 16 % 256, i * 7 % 256, i * 11 % 256) for i in range(16)]
    w, h, nf = 13, 9, 4
    frames = [
        [(x + y * 2 + f * 3) % 16 for y in range(h) for x in range(w)]
        for f in range(nf)
    ]
    info = decode_gif(encode_gif(w, h, frames, pal))
    assert (info["width"], info["height"], info["n_frames"]) == (w, h, nf)
    assert info["frame_index_sums"] == [sum(fr) for fr in frames]
    want = [0, 0, 0]
    for fr in frames:
        for idx in fr:
            for c in range(3):
                want[c] += pal[idx][c]
    assert info["rgb_sums"] == want
    with _pytest.raises(ValueError, match="magic"):
        decode_gif(b"BMPxxx")


def test_gif_interlaced_decodes_identically_with_row_mapping():
    """Interlaced GIFs transmit rows in the four-pass order; the
    ORDER-SENSITIVE row-weighted statistic must equal the progressive
    encoding's (plain sums are row-permutation invariant and could not
    catch a wrong pass mapping).  Odd height exercises ragged passes."""
    from quick_stream_spark.functions.gif import decode_gif, encode_gif

    pal = [(i * 16 % 256, i * 7 % 256, i * 11 % 256) for i in range(16)]
    w, h = 11, 13
    frames = [
        [(x * 3 + y * 5 + f) % 16 for y in range(h) for x in range(w)]
        for f in range(2)
    ]
    plain = decode_gif(encode_gif(w, h, frames, pal))
    inter = decode_gif(encode_gif(w, h, frames, pal, interlace=True))
    assert inter["frame_index_sums"] == plain["frame_index_sums"]
    assert inter["rgb_sums"] == plain["rgb_sums"]
    assert inter["frame_row_weighted"] == plain["frame_row_weighted"]
    expect = [
        sum((y + 1) * sum(fr[y * w : (y + 1) * w]) for y in range(h))
        for fr in frames
    ]
    assert plain["frame_row_weighted"] == expect
    # the wire really is interlaced: byte streams must differ
    assert encode_gif(w, h, frames, pal) != encode_gif(
        w, h, frames, pal, interlace=True
    )


def test_real_decoder_reports_gif_frame_count(spark):
    from quick_stream_spark.functions.gif import encode_gif
    from quick_stream_spark.functions.multimodal import decode_media

    pal = [(i, i, i) for i in range(4)]
    g = encode_gif(5, 4, [[0] * 20, [1] * 20, [2] * 20], pal)
    media = spark.createDataFrame(
        [(1, g, "video", "gif")],
        "media_id long, payload binary, media_type string, format_hint string",
    )
    r = decode_media(media, decoder="real").collect()[0]
    assert (r.width, r.height, r.n_frames) == (5, 4, 3)


def test_codecs_raise_valueerror_on_any_malformation():
    """The documented contract is ValueError for malformed payloads —
    never struct.error / IndexError / ZeroDivisionError leaking from
    the kernels (a DLQ catching ValueError must not crash instead)."""
    import struct

    import pytest as _pytest

    from quick_stream_spark.functions.gif import decode_gif, encode_gif
    from quick_stream_spark.functions.png import decode_png, encode_png
    from quick_stream_spark.functions.wav import decode_wav, encode_wav

    png = encode_png(6, 6, _px)
    # truncate INSIDE the IDAT chunk's CRC (IEND's length field starts
    # at rindex-4; the 4 bytes before that are IDAT's CRC)
    with _pytest.raises(ValueError, match="truncated"):
        decode_png(png[: png.rindex(b"IEND") - 6])

    with _pytest.raises(ValueError):
        decode_gif(b"GIF89a\x01\x00")  # truncated header
    gif = bytearray(encode_gif(4, 3, [[0] * 12], [(0, 0, 0), (1, 1, 1)]))
    with _pytest.raises(ValueError):
        decode_gif(bytes(gif[:-8]))  # truncated mid-frame

    wav = bytearray(encode_wav([1, 2, 3], 8000, 1))
    # craft sample_rate = 0 inside the fmt chunk (offset: RIFF(12) +
    # 'fmt '+len(8) + format/channels(4) = 24)
    struct.pack_into("<I", wav, 24, 0)
    with _pytest.raises(ValueError, match="sample rate"):
        decode_wav(bytes(wav))


def test_gray_alpha_stats_use_the_gray_plane(spark):
    """2-channel (gray+alpha) PNGs must map the GRAY plane onto all
    three output channels — not leak the alpha plane into sum_g."""
    from quick_stream_spark.functions.multimodal import decode_image_stats
    from quick_stream_spark.functions.png import encode_png

    la = encode_png(5, 4, lambda x, y: ((x + y) % 7, 255), color_type=4)
    media = spark.createDataFrame([(1, la)], "media_id long, payload binary")
    r = decode_image_stats(media).collect()[0]
    gray = sum((x + y) % 7 for y in range(4) for x in range(5))
    assert (r.sum_r, r.sum_g, r.sum_b) == (gray, gray, gray)
