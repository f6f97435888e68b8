"""Decoder totality under hostile input: every media decoder must
either succeed or raise ``ValueError`` / ``NotImplementedError`` — on
ARBITRARY bytes, on valid payloads truncated at any point, and on
valid payloads with flipped bytes.  At 100 TB a corrupt payload is a
data-quality row, not an executor crash: ``IndexError`` or
``struct.error`` escaping a kernel looks like an engine bug and kills
the Arrow batch, so the error envelope is part of the contract."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from quick_stream_spark.functions.gif import decode_gif, encode_gif
from quick_stream_spark.functions.jpeg import decode_jpeg, encode_jpeg
from quick_stream_spark.functions.mp4 import decode_mp4, encode_mp4, parse_mp4
from quick_stream_spark.functions.png import decode_png, encode_png
from quick_stream_spark.functions.wav import (
    decode_wav,
    encode_wav,
    encode_wav_adpcm,
)

_OK = (ValueError, NotImplementedError)

_SETTINGS = dict(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _valid_payloads():
    """One representative valid payload per codec family, covering the
    interesting layout branches."""
    px = lambda x, y: (x * 3 + y * 5) % 60 * 2 + 60  # noqa: E731
    jpeg_base = encode_jpeg(11, 9, px, components=1)
    jpeg_prog = encode_jpeg(
        11, 9, lambda x, y: (px(x, y),) * 3, components=3,
        subsampling="420", progressive=True,
    )
    png_pal = encode_png(
        9, 7, lambda x, y: (x + y) % 8, color_type=3, bit_depth=4,
        interlace=1, palette=[(i, 2 * i, 3 * i) for i in range(16)],
    )
    png16 = encode_png(6, 5, lambda x, y: 300 * x + y, color_type=0,
                       bit_depth=16)
    gif_i = encode_gif(
        8, 9, [[(x + y) % 4 for y in range(9) for x in range(8)]],
        [(0, 0, 0), (10, 10, 10), (20, 20, 20), (30, 30, 30)],
        interlace=True,
    )
    wav24 = encode_wav([(i * 999) % 100000 - 50000 for i in range(40)],
                       8000, 1, bits=24)
    adpcm = encode_wav_adpcm([(i * 173) % 8000 - 4000 for i in range(25)],
                             8000, 1, frames_per_block=9)
    mp4_av = encode_mp4(11, 9, [jpeg_base] * 2,
                        audio_pcm=[(i * 7) % 2000 - 1000 for i in range(50)])
    return {
        "jpeg": (decode_jpeg, jpeg_base),
        "jpeg_prog": (decode_jpeg, jpeg_prog),
        "png_pal": (decode_png, png_pal),
        "png16": (decode_png, png16),
        "gif": (decode_gif, gif_i),
        "wav24": (decode_wav, wav24),
        "adpcm": (decode_wav, adpcm),
        "mp4": (decode_mp4, mp4_av),
    }


_PAYLOADS = _valid_payloads()


@pytest.mark.parametrize("name", sorted(_PAYLOADS))
@settings(**_SETTINGS)
@given(cut=st.integers(0, 10_000), data=st.data())
def test_truncation_never_escapes_the_error_envelope(name, cut, data):
    decoder, payload = _PAYLOADS[name]
    cut = cut % (len(payload) + 1)
    try:
        decoder(payload[:cut])
    except _OK:
        pass


@pytest.mark.parametrize("name", sorted(_PAYLOADS))
@settings(**_SETTINGS)
@given(pos=st.integers(0, 10_000), val=st.integers(0, 255))
def test_byte_flips_never_escape_the_error_envelope(name, pos, val):
    decoder, payload = _PAYLOADS[name]
    pos = pos % len(payload)
    mutated = payload[:pos] + bytes([val]) + payload[pos + 1 :]
    try:
        decoder(mutated)
    except _OK:
        pass


@settings(**_SETTINGS)
@given(data=st.binary(min_size=0, max_size=400))
@pytest.mark.parametrize("name", sorted(_PAYLOADS))
def test_arbitrary_bytes_never_escape_the_error_envelope(name, data):
    decoder, _ = _PAYLOADS[name]
    try:
        decoder(data)
    except _OK:
        pass


@settings(**_SETTINGS)
@given(data=st.binary(min_size=8, max_size=300))
def test_arbitrary_bytes_with_magic_prefixes(data):
    """Adversarial: valid magic + garbage body for every sniffer
    branch, including the MP4 sample-table walker."""
    for prefix, decoder in [
        (b"\x89PNG\r\n\x1a\n", decode_png),
        (b"\xff\xd8", decode_jpeg),
        (b"GIF89a", decode_gif),
        (b"RIFF" + data[:4] + b"WAVE", decode_wav),
        (data[:4] + b"ftyp", parse_mp4),
    ]:
        try:
            decoder(prefix + data)
        except _OK:
            pass


def test_odd_audio_stsz_ending_at_eof_stays_in_envelope():
    """A hostile default-size stsz of 3 (odd) on a 16-bit PCM track,
    with the chunk offset re-pointed so the LAST audio sample ends
    exactly at EOF: the per-sample bounds check (o + s <= len) passes,
    but the 2-byte unpack at the sample's last byte would read one byte
    past EOF — this must surface as ValueError, not struct.error
    (decode_mp4's audio loop runs under the totality envelope)."""
    import struct

    from quick_stream_spark.functions.jpeg import encode_jpeg
    from quick_stream_spark.functions.mp4 import encode_mp4

    frame = encode_jpeg(6, 5, lambda x, y: (x * y) % 200, components=1)
    n_pcm = 8
    data = encode_mp4(6, 5, [frame],
                      audio_pcm=[100 * i for i in range(n_pcm)])

    # audio stsz: default-size full box — body (v0,flags0)+(size=2,count)
    old_stsz = b"stsz" + b"\x00" * 4 + struct.pack(">II", 2, n_pcm)
    new_stsz = b"stsz" + b"\x00" * 4 + struct.pack(">II", 3, n_pcm)
    assert data.count(old_stsz) == 1
    data = data.replace(old_stsz, new_stsz)

    # audio stco: single chunk — re-point so 8 samples x 3 bytes end at EOF
    ftyp_len = data.index(b"mdat") - 4
    video_off = ftyp_len + 8
    old_off = video_off + len(frame)
    old_stco = b"stco" + b"\x00" * 4 + struct.pack(">II", 1, old_off)
    assert data.count(old_stco) == 1
    new_off = len(data) - 3 * n_pcm
    data = data.replace(old_stco,
                        b"stco" + b"\x00" * 4 + struct.pack(">II", 1, new_off))

    with pytest.raises(ValueError):
        decode_mp4(data)
