"""Spec-derived golden vectors: hand-assembled byte fixtures, decoded
outputs pinned to values derived ON PAPER from the public specs.

The codec suites elsewhere verify decoders against payloads produced by
the sibling encoders in the same module plus closed-form oracles — a
shared misreading of a spec could survive both.  These fixtures break
that circularity: every byte below is assembled directly from the spec
section cited next to it (never via ``encode_*``), and every expected
number is computed by hand from the spec's own arithmetic (the PNG
filter recurrences, the GIF LZW code widths, the IMA step table, the
JPEG DC-only IDCT), so agreement here means the DECODER follows the
published format, not merely its own encoder.

Specs: PNG — W3C/ISO 15948 (+ RFC 1950/1951 for the zlib/deflate
stream); GIF — GIF89a specification; WAV — RIFF/WAVE + IMA ADPCM
(RFC 3551 §4.5.1 tables); JPEG — ITU-T T.81; MP4 — ISO/IEC 14496-12.
"""

import struct

import numpy as np

from quick_stream_spark.functions.gif import decode_gif
from quick_stream_spark.functions.jpeg import decode_jpeg, decode_jpeg_pixels
from quick_stream_spark.functions.mp4 import decode_mp4, parse_mp4
from quick_stream_spark.functions.png import decode_png
from quick_stream_spark.functions.wav import decode_wav

# --------------------------------------------------------------- PNG


def _png_chunk(tag: bytes, body: bytes, crc: int) -> bytes:
    """PNG §5.3 chunk layout: length | type | data | CRC-32 of
    type+data (§5.5, the standard zlib polynomial). CRCs below are
    precomputed literals so the fixture is fully byte-determined."""
    return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)


# IHDR (§11.2.2): width=2 height=2 depth=8 color=0(gray) comp=0
# filter=0 interlace=0
_PNG_IHDR = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)


def _png_idat(scanlines: bytes, adler: int) -> bytes:
    """A zlib stream (RFC 1950) holding ONE stored deflate block
    (RFC 1951 §3.2.4: final=1 type=00, LEN/NLEN little-endian) — no
    compressor involved, the scanline bytes appear verbatim."""
    assert len(scanlines) == 6
    return (
        b"\x78\x01"  # CMF/FLG: 32k window, check bits (0x7801 % 31 == 0)
        + b"\x01" + struct.pack("<HH", 6, 0xFFF9)  # stored, LEN=6, ~LEN
        + scanlines
        + struct.pack(">I", adler)  # RFC 1950 §2.2 Adler-32 of the raw data
    )


def test_png_golden_filter0():
    """2x2 gray-8, both rows filter 0 (None): pixels appear verbatim.
    Scanlines = 00|00 10, 00|20 30 -> pixels (0,16,32,48), sum 96.
    Adler-32 by hand: s1=1+0+0+16+0+32+48=97, s2=1+1+17+17+49+97=182
    -> 0x00B60061."""
    data = (
        b"\x89PNG\r\n\x1a\n"  # §5.2 signature
        + _png_chunk(b"IHDR", _PNG_IHDR, 0x57DD52F8)
        + _png_chunk(
            b"IDAT",
            _png_idat(bytes([0, 0x00, 0x10, 0, 0x20, 0x30]), 0x00B60061),
            0xFE0E4629,
        )
        + _png_chunk(b"IEND", b"", 0xAE426082)
    )
    out = decode_png(data)
    assert out == {
        "width": 2, "height": 2, "bit_depth": 8, "color_type": 0,
        "channels": 1, "n_pixels": 4, "channel_sums": [96],
    }


def test_png_golden_sub_and_up_filters():
    """Filter reconstruction by hand (§9.2): row 0 is Sub (type 1):
    raw (10,5) -> recon (10, 5+10=15); row 1 is Up (type 2): raw (1,2)
    -> recon (10+1=11, 15+2=17).  Sum = 10+15+11+17 = 53.
    Adler-32: s1 ends 22, s2 ends 92 -> 0x005C0016."""
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", _PNG_IHDR, 0x57DD52F8)
        + _png_chunk(
            b"IDAT",
            _png_idat(bytes([1, 10, 5, 2, 1, 2]), 0x005C0016),
            0x5A230573,
        )
        + _png_chunk(b"IEND", b"", 0xAE426082)
    )
    assert decode_png(data)["channel_sums"] == [53]


# --------------------------------------------------------------- GIF


def test_gif_golden_hand_packed_lzw():
    """2x2, 4-colour global table, pixels (0,1,2,3).  The LZW stream is
    hand-packed per GIF89a Appendix F: with min-code-size 2, clear=4,
    EOI=5, the encoder emits clear,0,1,2 at width 3; adding table entry
    8 (== 2^3) bumps the width, so 3 and EOI go at width 4.  Codes
    LSB-first: 100 000 001 010 | 0011 0101 -> bytes 0x44 0x34 0x05."""
    data = (
        b"GIF89a"
        # logical screen descriptor: 2x2, GCT present, GCT size field 1
        # (2 << 1 = 4 entries), bg 0, aspect 0
        + struct.pack("<HHBBB", 2, 2, 0x81, 0, 0)
        + bytes([0, 0, 0, 10, 20, 30, 40, 50, 60, 70, 80, 90])  # GCT
        # image descriptor: left 0, top 0, 2x2, no LCT, not interlaced
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
        + bytes([2])  # LZW minimum code size
        + bytes([3, 0x44, 0x34, 0x05, 0])  # one 3-byte sub-block + term
        + b"\x3b"  # trailer
    )
    out = decode_gif(data)
    assert out["width"] == 2 and out["height"] == 2
    assert out["n_frames"] == 1
    assert out["palette"] == [(0, 0, 0), (10, 20, 30), (40, 50, 60),
                              (70, 80, 90)]
    assert out["frame_index_sums"] == [0 + 1 + 2 + 3]
    # display rows weighted (row+1): 1*(0+1) + 2*(2+3)
    assert out["frame_row_weighted"] == [11]
    # palette lookups: r 0+10+40+70, g 0+20+50+80, b 0+30+60+90
    assert out["rgb_sums"] == [120, 150, 180]


# --------------------------------------------------------------- WAV


def test_wav_golden_pcm16():
    """Canonical RIFF/WAVE: fmt(16) PCM mono 8 kHz 16-bit + data with
    the four samples 1000, -1000, 32767, -32768 little-endian.
    Sum = -1; sum of squares = 2*10^6 + 32767^2 + 32768^2
    = 2000000 + 1073676289 + 1073741824 = 2149418113."""
    pcm = b"".join(struct.pack("<h", v) for v in (1000, -1000, 32767, -32768))
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    out = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert out["audio_format"] == 1 and out["bits"] == 16
    assert out["n_samples"] == 4
    assert out["channel_sums"] == [-1]
    assert out["channel_sumsq"] == [2149418113]


def test_wav_golden_ima_adpcm():
    """One IMA-ADPCM block (format 17), hand-decoded from the public
    step/index tables (RFC 3551 §4.5.1): header (predictor=100,
    index=0) then nibbles 1,3,8,15,0,2,4,9 packed low-nibble-first
    (bytes 0x31 0xF8 0x20 0x94).  Hand trace — step[0]=7:
      n=1: diff=0+1      -> 101, idx 0   n=0: step16, diff 2 -> 96, idx 7
      n=3: diff=0+1+3    -> 105, idx 0   n=2: step14, diff 1+7 -> 104, idx 6
      n=8: diff=0 (sign-)-> 105, idx 0   n=4: step13, diff 1+13 -> 118, idx 8
      n=15: diff=0+1+3+7 -> 94,  idx 8   n=9: step16, diff 2+4 (-) -> 112, idx 7
    Samples: 100,101,105,105,94,96,104,118,112 -> sum 935, sumsq 97587."""
    blk = struct.pack("<hBB", 100, 0, 0) + bytes([0x31, 0xF8, 0x20, 0x94])
    fmt = (
        struct.pack("<HHIIHH", 17, 1, 8000, 8000, 8, 4)
        + struct.pack("<HH", 2, 9)  # cbSize=2, samples per block=9
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", 4) + struct.pack("<I", 9)
        + b"data" + struct.pack("<I", len(blk)) + blk
    )
    out = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert out["audio_format"] == 17
    assert out["n_samples"] == 9
    assert out["channel_sums"] == [935]
    assert out["channel_sumsq"] == [97587]


# -------------------------------------------------------------- JPEG


def _jpeg_seg(marker: int, body: bytes) -> bytes:
    """T.81 §B.1.1.4 marker segment: FF xx + 2-byte length incl itself."""
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


# DQT (§B.2.4.1): Pq=0/Tq=0, all 64 entries 1 (identity quantizer)
_DQT = _jpeg_seg(0xDB, b"\x00" + b"\x01" * 64)
# SOF0 (§B.2.2): precision 8, 8x8, 1 component, sampling 1x1, table 0
_SOF = _jpeg_seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
# DHT (§B.2.4.2): one code of length 1 -> canonical code '0' (§C.2)
_DHT_AC_EOB = _jpeg_seg(0xC4, b"\x10" + bytes([1] + [0] * 15) + b"\x00")
# SOS (§B.2.3): 1 component, DC/AC table 0, Ss=0 Se=63 Ah=Al=0
_SOS = _jpeg_seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))


def test_jpeg_golden_flat_128():
    """All-zero coefficients: DC table maps code '0' -> category 0
    (diff 0), AC '0' -> EOB.  Scan bits '0'+'0' padded with 1s
    (§F.1.2.3) = 0x3F.  IDCT of the zero block is 0; the §A.3.1 level
    shift adds 128 -> every pixel exactly 128, sum 64*128 = 8192."""
    dht_dc = _jpeg_seg(0xC4, b"\x00" + bytes([1] + [0] * 15) + b"\x00")
    data = (
        b"\xff\xd8" + _DQT + _SOF + dht_dc + _DHT_AC_EOB + _SOS
        + b"\x3f" + b"\xff\xd9"
    )
    assert decode_jpeg(data) == {
        "width": 8, "height": 8, "channels": 1, "n_pixels": 64,
        "channel_sums": [8192],
    }
    assert (decode_jpeg_pixels(data)["planes"][0] == 128).all()


def test_jpeg_golden_dc_only_plus_one():
    """DC table maps '0' -> category 4; magnitude bits '1000' encode
    diff +8 (§F.1.2.1.1, positive values transmit verbatim).  Scan bits
    0|1000|0 padded = 0x43.  With quantizer 1, F(0,0)=8; the DC-only
    IDCT (§A.3.3) gives (1/4)(1/sqrt2)^2 * 8 = 1 at every pixel, plus
    the 128 level shift -> flat 129, sum 64*129 = 8256."""
    dht_dc = _jpeg_seg(0xC4, b"\x00" + bytes([1] + [0] * 15) + b"\x04")
    data = (
        b"\xff\xd8" + _DQT + _SOF + dht_dc + _DHT_AC_EOB + _SOS
        + b"\x43" + b"\xff\xd9"
    )
    out = decode_jpeg(data)
    assert out["channel_sums"] == [8256]
    assert (decode_jpeg_pixels(data)["planes"][0] == 129).all()


# --------------------------------------------------------------- MP4


def _box(fc: bytes, body: bytes) -> bytes:
    """14496-12 §4.2: 32-bit size incl header, then the fourcc."""
    return struct.pack(">I", len(body) + 8) + fc + body


def _full(fc: bytes, body: bytes) -> bytes:
    """FullBox: version 0, flags 0."""
    return _box(fc, b"\x00\x00\x00\x00" + body)


def test_mp4_golden_sample_table():
    """Hand-built ftyp|mdat|moov whose sample tables (§8.5-8.7) the
    encoder never touched: 2 samples of sizes 2 and 3 in 2 chunks, one
    sample per chunk, duration 100 each at timescale 1000.  The first
    chunk offset is ftyp(20 bytes) + the mdat header(8) = 28; the
    second points at the 'CDE' bytes at 30."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    assert len(ftyp) == 20
    mdat = _box(b"mdat", b"ABCDE")
    # VisualSampleEntry (§12.1.3): 6 reserved + data_ref_index, 16
    # pre_defined/reserved, width=6 height=4, 72dpi, frame_count 1,
    # 32-byte compressorname, depth 24, pre_defined -1
    stsd = _full(b"stsd", struct.pack(">I", 1) + _box(
        b"mjpa",
        b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
        + struct.pack(">HH", 6, 4)
        + struct.pack(">II", 0x480000, 0x480000) + b"\x00" * 4
        + struct.pack(">H", 1)
        + bytes([4]) + b"test" + b"\x00" * 27
        + struct.pack(">Hh", 24, -1),
    ))
    stts = _full(b"stts", struct.pack(">III", 1, 2, 100))
    stsc = _full(b"stsc", struct.pack(">IIII", 1, 1, 2, 1))
    stsz = _full(b"stsz", struct.pack(">II", 0, 2)
                 + struct.pack(">II", 2, 3))
    stco = _full(b"stco", struct.pack(">III", 2, 28, 30))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    mdhd = _full(b"mdhd", struct.pack(">IIII", 0, 0, 1000, 200)
                 + struct.pack(">HH", 0x55C4, 0))
    hdlr = _full(b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12)
    mdia = _box(b"mdia", mdhd + hdlr + _box(b"minf", stbl))
    data = ftyp + mdat + _box(b"moov", _box(b"trak", mdia))

    info = parse_mp4(data)
    assert info["codec"] == "mjpa"
    assert (info["width"], info["height"]) == (6, 4)
    assert info["timescale"] == 1000
    assert info["n_samples"] == 2
    assert info["sample_offsets"] == [28, 30]
    assert info["sample_sizes"] == [2, 3]
    assert info["duration"] == 200
    assert data[28:30] == b"AB" and data[30:33] == b"CDE"


# SOF2 progressive frame header (same geometry as _SOF)
_SOF2 = _jpeg_seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))


def test_jpeg_golden_progressive_two_scan():
    """Spectral selection (T.81 Annex G): a DC-only first scan
    (Ss=Se=0) then the AC scan (Ss=1 Se=63).  Both scans encode nothing
    — DC diff category 0 ('0' + pad = 0x7F) and one EOB ('0' + pad =
    0x7F) — so the progressive pipeline must reconstruct the same flat
    128 frame as the baseline golden vector."""
    dht_dc = _jpeg_seg(0xC4, b"\x00" + bytes([1] + [0] * 15) + b"\x00")
    sos_dc = _jpeg_seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0]))
    sos_ac = _jpeg_seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0]))
    data = (
        b"\xff\xd8" + _DQT + _SOF2 + dht_dc + _DHT_AC_EOB
        + sos_dc + b"\x7f" + sos_ac + b"\x7f" + b"\xff\xd9"
    )
    assert decode_jpeg(data)["channel_sums"] == [8192]
    assert (decode_jpeg_pixels(data)["planes"][0] == 128).all()


def test_jpeg_golden_progressive_successive_approximation():
    """Successive approximation for DC (T.81 §G.1.2.1): the first scan
    at Al=1 sends diff 4 (category 3, code '0' + bits '100' -> 0x4F);
    the refinement scan (Ah=1, Al=0) appends one raw 0 bit per block
    (0x7F), so DC = (4 << 1) | 0 = 8 — the same coefficient as the
    baseline DC+8 vector, hence the same flat-129 frame (sum 8256)."""
    dht_dc = _jpeg_seg(0xC4, b"\x00" + bytes([1] + [0] * 15) + b"\x03")
    sos_dc1 = _jpeg_seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))
    sos_dc2 = _jpeg_seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))
    sos_ac = _jpeg_seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0]))
    data = (
        b"\xff\xd8" + _DQT + _SOF2 + dht_dc + _DHT_AC_EOB
        + sos_dc1 + b"\x4f" + sos_dc2 + b"\x7f" + sos_ac + b"\x7f"
        + b"\xff\xd9"
    )
    out = decode_jpeg(data)
    assert out["channel_sums"] == [8256]
    assert (decode_jpeg_pixels(data)["planes"][0] == 129).all()


def test_png_golden_average_and_paeth_filters():
    """The remaining two filters by hand (§9.2-9.4): row 0 Average
    (type 3): recon = raw + floor((left+up)/2) with up=0 -> (10,
    4+floor(10/2)=9); row 1 Paeth (type 4): px0 predictor = up (p=10,
    pb=0) -> 7+10=17; px1: p=17+9-10=16, pa=1 smallest -> left ->
    3+17=20.  Sum = 10+9+17+20 = 56.  Adler-32: s1 ends 32, s2 ends
    119 -> 0x00770020."""
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", _PNG_IHDR, 0x57DD52F8)
        + _png_chunk(
            b"IDAT",
            _png_idat(bytes([3, 10, 4, 4, 7, 3]), 0x00770020),
            0xE13716DF,
        )
        + _png_chunk(b"IEND", b"", 0xAE426082)
    )
    assert decode_png(data)["channel_sums"] == [56]


def test_png_golden_adam7_interlace():
    """Adam7 (§8.2) on 2x2: only passes 1, 6 and 7 are non-empty —
    pass 1 carries pixel (0,0), pass 6 pixel (1,0), pass 7 the full
    bottom row — so the interlaced pixel stream is THREE one-row
    sub-images: [filter0, 1][filter0, 2][filter0, 3, 4].  Pixels
    1+2+3+4 = 10.  Adler-32 of the 7 raw bytes: s1=11, s2=31 ->
    0x001F000B."""
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)  # interlace=1
    raw = bytes([0, 1, 0, 2, 0, 3, 4])
    idat = (
        b"\x78\x01"
        + b"\x01" + struct.pack("<HH", 7, 0xFFF8)
        + raw
        + struct.pack(">I", 0x001F000B)
    )
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr, 0x20DA626E)
        + _png_chunk(b"IDAT", idat, 0x8980C9C2)
        + _png_chunk(b"IEND", b"", 0xAE426082)
    )
    out = decode_png(data)
    assert out["n_pixels"] == 4
    assert out["channel_sums"] == [10]


def test_gif_golden_interlaced_four_pass():
    """GIF89a interlacing (spec §20) on a 1x5 frame: transmitted row
    order is display rows [0, 4, 2, 1, 3].  Display column of values
    (0,1,2,3,0) top-to-bottom therefore transmits as (0,0,2,1,3),
    hand-LZW'd: clear,0,0,2 at width 3, then 1,3,EOI at width 4 (entry
    8 was added) -> bytes 0x04 0x14 0x53.  The row-weighted statistic
    must map transmitted rows back through the pass order:
    1*0 + 5*0 + 3*2 + 2*1 + 4*3 = 20 (it would be 1*0+2*0+3*2+4*1+5*3
    = 25 if rows were taken as transmitted)."""
    data = (
        b"GIF89a"
        + struct.pack("<HHBBB", 1, 5, 0x81, 0, 0)
        + bytes([0, 0, 0, 10, 20, 30, 40, 50, 60, 70, 80, 90])
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 5, 0x40)  # interlaced
        + bytes([2])
        + bytes([3, 0x04, 0x14, 0x53, 0])
        + b"\x3b"
    )
    out = decode_gif(data)
    assert out["frame_index_sums"] == [6]
    assert out["frame_row_weighted"] == [20]
    assert out["rgb_sums"] == [120, 150, 180]


def test_wav_golden_pcm24():
    """24-bit PCM: two 3-byte little-endian signed samples +-100000
    (past 16-bit range, so a depth bug cannot hide).  Sum 0; sum of
    squares 2e10."""
    pcm = (100000).to_bytes(3, "little", signed=True) + (
        -100000
    ).to_bytes(3, "little", signed=True)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 24000, 3, 24)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    out = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert out["bits"] == 24 and out["n_samples"] == 2
    assert out["channel_sums"] == [0]
    assert out["channel_sumsq"] == [20000000000]


def test_mp4_golden_largesize_mdat():
    """14496-12 §4.2 largesize: size field 1 + 64-bit size after the
    fourcc (header 16 bytes, not 8).  With a 3-byte payload the single
    sample's absolute offset is ftyp(20) + 16 = 36; a demuxer that
    assumes 8-byte headers lands 8 bytes early."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    payload = b"XYZ"
    mdat = (
        struct.pack(">I", 1) + b"mdat"
        + struct.pack(">Q", 16 + len(payload)) + payload
    )
    stsd = _full(b"stsd", struct.pack(">I", 1) + _box(
        b"avc1",
        b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
        + struct.pack(">HH", 3, 2)
        + struct.pack(">II", 0x480000, 0x480000) + b"\x00" * 4
        + struct.pack(">H", 1)
        + bytes([1]) + b"x" + b"\x00" * 30
        + struct.pack(">Hh", 24, -1),
    ))
    stts = _full(b"stts", struct.pack(">III", 1, 1, 40))
    stsc = _full(b"stsc", struct.pack(">IIII", 1, 1, 1, 1))
    stsz = _full(b"stsz", struct.pack(">II", 0, 1) + struct.pack(">I", 3))
    stco = _full(b"stco", struct.pack(">II", 1, 36))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    mdhd = _full(b"mdhd", struct.pack(">IIII", 0, 0, 600, 40)
                 + struct.pack(">HH", 0x55C4, 0))
    hdlr = _full(b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12)
    mdia = _box(b"mdia", mdhd + hdlr + _box(b"minf", stbl))
    data = ftyp + mdat + _box(b"moov", _box(b"trak", mdia))

    info = parse_mp4(data)
    assert info["codec"] == "avc1"
    assert info["sample_offsets"] == [36]
    assert info["sample_sizes"] == [3]
    assert data[36:39] == b"XYZ"


def test_mp4_golden_end_to_end_mjpeg_plus_pcm():
    """Composition of the pinned units with NO sibling encoder: the
    hand-assembled flat-128 baseline JPEG (141 bytes) becomes the one
    video sample of a hand-built two-track MP4, plus a 'sowt' PCM
    track carrying samples +-1000.  decode_mp4 must produce the
    baseline vector's luma sum through the container (8192, tripled
    into RGB channel sums for a grayscale frame) and the hand PCM
    stats (sum 0, sumsq 2e6) — end-to-end demux + pixel decode + audio
    decode, all against on-paper numbers."""
    dht_dc = _jpeg_seg(0xC4, b"\x00" + bytes([1] + [0] * 15) + b"\x00")
    jpg = (
        b"\xff\xd8" + _DQT + _SOF + dht_dc + _DHT_AC_EOB + _SOS
        + b"\x3f" + b"\xff\xd9"
    )
    assert len(jpg) == 141

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    audio = struct.pack("<h", 1000) + struct.pack("<h", -1000)
    mdat = _box(b"mdat", jpg + audio)
    voff, aoff = 28, 28 + len(jpg)

    v_stsd = _full(b"stsd", struct.pack(">I", 1) + _box(
        b"jpeg",
        b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
        + struct.pack(">HH", 8, 8)
        + struct.pack(">II", 0x480000, 0x480000) + b"\x00" * 4
        + struct.pack(">H", 1)
        + bytes([1]) + b"x" + b"\x00" * 30
        + struct.pack(">Hh", 24, -1),
    ))
    v_stbl = _box(b"stbl",
        v_stsd
        + _full(b"stts", struct.pack(">III", 1, 1, 100))
        + _full(b"stsc", struct.pack(">IIII", 1, 1, 1, 1))
        + _full(b"stsz", struct.pack(">II", 0, 1)
                + struct.pack(">I", len(jpg)))
        + _full(b"stco", struct.pack(">II", 1, voff)))
    v_mdhd = _full(b"mdhd", struct.pack(">IIII", 0, 0, 1000, 100)
                   + struct.pack(">HH", 0x55C4, 0))
    v_hdlr = _full(b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12)
    v_trak = _box(b"trak", _box(
        b"mdia", v_mdhd + v_hdlr + _box(b"minf", v_stbl)))

    # AudioSampleEntry (14496-12 section 12.2.3): mono 16-bit 'sowt'
    # (little-endian PCM), 16.16 fixed-point sample rate
    a_stsd = _full(b"stsd", struct.pack(">I", 1) + _box(
        b"sowt",
        b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 8
        + struct.pack(">HHHH", 1, 16, 0, 0)
        + struct.pack(">I", 8000 << 16),
    ))
    a_stbl = _box(b"stbl",
        a_stsd
        + _full(b"stts", struct.pack(">III", 1, 2, 1))
        + _full(b"stsc", struct.pack(">IIII", 1, 1, 2, 1))
        + _full(b"stsz", struct.pack(">II", 2, 2))
        + _full(b"stco", struct.pack(">II", 1, aoff)))
    a_mdhd = _full(b"mdhd", struct.pack(">IIII", 0, 0, 8000, 2)
                   + struct.pack(">HH", 0x55C4, 0))
    a_hdlr = _full(b"hdlr", struct.pack(">I", 0) + b"soun" + b"\x00" * 12)
    a_trak = _box(b"trak", _box(
        b"mdia", a_mdhd + a_hdlr + _box(b"minf", a_stbl)))

    data = ftyp + mdat + _box(b"moov", v_trak + a_trak)
    out = decode_mp4(data)
    assert out["channel_sums"] == [8192, 8192, 8192]
    assert out["frame_luma_sums"] == [8192]
    assert (out["width"], out["height"], out["n_frames"]) == (8, 8, 1)
    assert out["audio_codec"] == "sowt"
    assert out["audio_n_samples"] == 2
    assert out["audio_sum"] == 0
    assert out["audio_sumsq"] == 2000000
