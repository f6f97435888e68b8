"""WAV codec depth + compression coverage (functions/wav.py): PCM at
8/16/24/32-bit, and the IMA/DVI ADPCM decode verified against an
INDEPENDENT naive reference decoder written straight from the spec
text (separate from the codec's shared encode/decode state class)."""

import struct

import pytest

from quick_stream_spark.functions.wav import (
    IMA_INDEX_TABLE,
    IMA_STEP_TABLE,
    decode_wav,
    encode_wav,
    encode_wav_adpcm,
)

# ------------------------------------------------------------ PCM depths


@pytest.mark.parametrize("bits,lim", [(8, 127), (16, 30000), (24, 8_000_000),
                                      (32, 2_000_000_000)])
def test_pcm_depth_roundtrip_exact(bits, lim):
    vals = [((i * 7919) % (2 * lim)) - lim for i in range(257)]
    info = decode_wav(encode_wav(vals, 8000, 1, bits=bits))
    assert info["bits"] == bits and info["audio_format"] == 1
    assert info["n_samples"] == 257
    assert info["channel_sums"] == [sum(vals)]
    assert info["channel_sumsq"] == [sum(v * v for v in vals)]


def test_pcm_24bit_stereo_channels_do_not_leak():
    left = [100_000 * i for i in range(-5, 6)]
    right = [-7 * v for v in left]
    info = decode_wav(
        encode_wav(list(zip(left, right)), 44100, 2, bits=24)
    )
    assert info["channels"] == 2
    assert info["channel_sums"] == [sum(left), sum(right)]
    assert info["channel_sumsq"] == [
        sum(v * v for v in left), sum(v * v for v in right)
    ]


def test_pcm_8bit_recentred_signed():
    """8-bit PCM is stored unsigned around 128; stats must be on the
    re-centered signed values so depth changes don't shift sums."""
    info = decode_wav(encode_wav([-3, 0, 3], 8000, 1, bits=8))
    assert info["channel_sums"] == [0]
    assert info["channel_sumsq"] == [18]


# --------------------------------------------------- IMA ADPCM reference


def _naive_ima_decode(block: bytes, channels: int):
    """Spec-literal reference decoder for ONE block, written
    independently of the codec's _ImaState (different structure:
    plain locals, explicit clamps)."""
    preds, idxs, out = [], [], []
    for c in range(channels):
        p, i, _ = struct.unpack_from("<hBB", block, 4 * c)
        preds.append(p)
        idxs.append(i)
        out.append([p])
    body = block[4 * channels:]
    for w0 in range(0, len(body), 4 * channels):
        for c in range(channels):
            for byte in body[w0 + 4 * c : w0 + 4 * c + 4]:
                for nib in (byte & 15, byte >> 4):
                    step = IMA_STEP_TABLE[idxs[c]]
                    diff = step >> 3
                    if nib & 1:
                        diff += step >> 2
                    if nib & 2:
                        diff += step >> 1
                    if nib & 4:
                        diff += step
                    p = preds[c] + (-diff if nib & 8 else diff)
                    p = max(-32768, min(32767, p))
                    idx = idxs[c] + IMA_INDEX_TABLE[nib & 7]
                    preds[c], idxs[c] = p, max(0, min(88, idx))
                    out[c].append(p)
    return out


def _chirp(n, seed=0):
    v, out = 0, []
    for i in range(n):
        v = (v * 31 + i * 173 + seed * 71) % 20000 - 10000
        out.append(v)
    return out


@pytest.mark.parametrize("channels", [1, 2])
def test_adpcm_decode_matches_naive_reference(channels):
    """Codec decode == the independent reference on every sample of a
    multi-block stream (no tolerance: both are exact integer machines)."""
    n = 30  # 30 frames with 9/block -> 4 blocks incl. a padded tail
    if channels == 1:
        samples = _chirp(n)
        frames = samples
    else:
        samples = list(zip(_chirp(n), _chirp(n, seed=5)))
        frames = samples
    data = encode_wav_adpcm(frames, 8000, channels, frames_per_block=9)
    info = decode_wav(data)
    assert info["audio_format"] == 17
    assert info["n_samples"] == n

    # re-derive expected stats through the naive reference
    i = data.find(b"data")
    (dlen,) = struct.unpack("<I", data[i + 4 : i + 8])
    pcm = data[i + 8 : i + 8 + dlen]
    block_align = 4 * channels + 4 * channels  # 9 frames/block: 1 word
    ref = [[] for _ in range(channels)]
    for b0 in range(0, len(pcm), block_align):
        dec = _naive_ima_decode(pcm[b0 : b0 + block_align], channels)
        for c in range(channels):
            ref[c].extend(dec[c][:9])
    for c in range(channels):
        ref[c] = ref[c][:n]
    assert info["channel_sums"] == [sum(r) for r in ref]
    assert info["channel_sumsq"] == [sum(v * v for v in r) for r in ref]


def test_adpcm_tracks_signal_within_quantizer_error():
    """ADPCM is lossy but adaptive: after the step size ramps up, the
    reconstruction must track a +-10000 chirp to ~the current step."""
    samples = _chirp(2000)
    info = decode_wav(encode_wav_adpcm(samples, 8000, 1, frames_per_block=505))
    n = info["n_samples"]
    assert n == 2000
    # mean |error| bound via sumsq comparison: reconstruction energy
    # within 25% of the source energy
    src = sum(v * v for v in samples)
    assert abs(info["channel_sumsq"][0] - src) < 0.25 * src


def test_adpcm_constant_signal_is_exact():
    """The block header carries the first sample verbatim, and a zero
    delta quantizes to nibble 0 with diff = step>>3 = 0 at the floor
    step — so a constant signal reconstructs EXACTLY."""
    samples = [12345] * 9
    info = decode_wav(encode_wav_adpcm(samples, 8000, 1, frames_per_block=9))
    assert info["n_samples"] == 9
    assert info["channel_sums"] == [9 * 12345]
    assert info["channel_sumsq"] == [9 * 12345 * 12345]


# ------------------------------------------------------- error envelope


def test_error_envelope():
    with pytest.raises(ValueError, match="depth"):
        encode_wav([1], 8000, 1, bits=12)
    with pytest.raises(ValueError, match="1 mod 8"):
        encode_wav_adpcm([1, 2], 8000, 1, frames_per_block=8)
    with pytest.raises(ValueError, match="at least one"):
        encode_wav_adpcm([], 8000, 1)
    good = encode_wav_adpcm(_chirp(9), 8000, 1, frames_per_block=9)
    bad = bytearray(good)
    i = bad.find(b"data")
    bad[i + 8 + 2] = 120  # step index 120 > 88
    with pytest.raises(ValueError, match="step index"):
        decode_wav(bytes(bad))
    # unsupported codec id still refuses loudly
    ulaw = bytearray(encode_wav([1, 2], 8000, 1))
    struct.pack_into("<H", ulaw, 20, 7)  # format 7 = mu-law
    with pytest.raises(ValueError, match="unsupported WAV layout"):
        decode_wav(bytes(ulaw))
