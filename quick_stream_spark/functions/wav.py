"""Pure-Python WAV (RIFF) codec — the REAL audio-decode kernel for the
multimodal pipeline (the companion of :mod:`png`; this container has no
torchaudio/ffmpeg, but WAV needs only ``struct``).

The decoder walks the RIFF chunk list (tolerating extra chunks like
LIST/fact, as real encoders emit), validates the fmt header, and
returns bounded per-channel statistics — exact integer sample sums and
sum-of-squares — never the raw sample arrays.  Supported layouts:

- **PCM (format 1)** at 8-bit (unsigned, reported re-centered to
  signed), 16-bit, 24-bit and 32-bit (signed little-endian), mono or
  multi-channel interleaved;
- **IMA/DVI ADPCM (format 17)** — a REAL compressed-audio decode from
  the public spec: per-block predictor/step-index headers, the 89-entry
  step table, 4-bit nibble expansion with the standard index
  adaptation, and stereo's 4-byte channel-interleaved words.

The encoder writes the same subset (canonical PCM at every depth, and
an IMA-ADPCM encoder that picks each nibble greedily through the same
quantizer the decoder runs), so round-trip tests pin exact sample
values against an independently written naive reference decoder.

Scale posture: per-payload Python inside Arrow-batched ``mapInPandas``
(CPU-heavy, embarrassingly parallel, no shuffle); only a handful of
scalars per clip leave the kernel.
"""

from __future__ import annotations

import struct

# IMA ADPCM tables (public spec: IMA "Recommended Practices for
# Enhancing Digital Audio Compatibility", also RFC 3551 §4.5.1)
IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]
IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _pack_sample(v: int, bits: int) -> bytes:
    if bits == 8:
        return struct.pack("<B", (int(v) + 128) & 0xFF)
    if bits == 16:
        return struct.pack("<h", int(v))
    if bits == 24:
        return int(v).to_bytes(3, "little", signed=True)
    if bits == 32:
        return struct.pack("<i", int(v))
    raise ValueError(f"unsupported PCM depth {bits}")


def encode_wav(samples, sample_rate: int, channels: int = 1,
               bits: int = 16) -> bytes:
    """Encode PCM at 8/16/24/32-bit depth.  ``samples[frame][channel]``
    (or a flat list for mono) of ints — signed at every depth (8-bit is
    stored unsigned around the 128 midpoint, per the format)."""
    frames = bytearray()
    for frame in samples:
        if isinstance(frame, int):
            frame = (frame,)
        if len(frame) != channels:
            raise ValueError("frame width != channels")
        for v in frame:
            frames += _pack_sample(v, bits)
    bwidth = bits // 8
    byte_rate = sample_rate * channels * bwidth
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      channels * bwidth, bits)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(frames)) + bytes(frames)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


class _ImaState:
    """One channel's IMA quantizer state; encode and decode share it so
    the encoder tracks exactly what the decoder will reconstruct."""

    def __init__(self, predictor: int, index: int) -> None:
        self.predictor = predictor
        self.index = index

    def decode_nibble(self, n: int) -> int:
        step = IMA_STEP_TABLE[self.index]
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        self.predictor = _clamp16(
            self.predictor - diff if n & 8 else self.predictor + diff
        )
        self.index = min(88, max(0, self.index + IMA_INDEX_TABLE[n & 7]))
        return self.predictor

    def encode_sample(self, target: int) -> int:
        """Pick the nibble the standard quantizer produces for the
        delta to ``target``, advancing state like the decoder."""
        step = IMA_STEP_TABLE[self.index]
        delta = target - self.predictor
        n = 0
        if delta < 0:
            n = 8
            delta = -delta
        if delta >= step:
            n |= 4
            delta -= step
        if delta >= step >> 1:
            n |= 2
            delta -= step >> 1
        if delta >= step >> 2:
            n |= 1
        self.decode_nibble(n)
        return n


def encode_wav_adpcm(samples, sample_rate: int, channels: int = 1,
                     frames_per_block: int = 505) -> bytes:
    """Encode IMA/DVI ADPCM (format 17).  ``samples`` as in
    :func:`encode_wav`.  Each block starts with a per-channel
    (predictor, step index) header holding the block's first sample
    verbatim; stereo nibbles interleave in 4-byte words per channel as
    the spec prescribes.  ``frames_per_block`` must be 1 mod 8 so
    nibble words fill exactly."""
    if channels not in (1, 2):
        raise ValueError("IMA ADPCM supports 1 or 2 channels here")
    if frames_per_block % 8 != 1:
        raise ValueError("frames_per_block must be 1 mod 8")
    norm = []
    for frame in samples:
        if isinstance(frame, int):
            frame = (frame,)
        if len(frame) != channels:
            raise ValueError("frame width != channels")
        norm.append(tuple(int(v) for v in frame))
    if not norm:
        raise ValueError("ADPCM needs at least one frame")

    block_align = 4 * channels + (frames_per_block - 1) // 2 * channels
    blocks = bytearray()
    states = [_ImaState(0, 0) for _ in range(channels)]
    n_frames = len(norm)
    bi = 0
    while bi < n_frames:
        chunk = norm[bi : bi + frames_per_block]
        # header: first sample verbatim + current step index per channel
        for c in range(channels):
            states[c].predictor = _clamp16(chunk[0][c])
            blocks += struct.pack("<hBB", states[c].predictor,
                                  states[c].index, 0)
        # remaining frames -> nibbles, grouped 8 per channel word
        nibbles: list[list[int]] = [[] for _ in range(channels)]
        for frame in chunk[1:]:
            for c in range(channels):
                nibbles[c].append(states[c].encode_sample(frame[c]))
        for c in range(channels):
            # pad a short final block to the full declared block_align
            # (decoders trim via the fact chunk's frame count)
            nibbles[c].extend([0] * (frames_per_block - 1 - len(nibbles[c])))
        words = len(nibbles[0]) // 8
        for wi in range(words):
            for c in range(channels):
                grp = nibbles[c][wi * 8 : wi * 8 + 8]
                for k in range(0, 8, 2):
                    blocks.append(grp[k] | (grp[k + 1] << 4))
        bi += frames_per_block

    byte_rate = sample_rate * block_align // max(1, frames_per_block)
    fmt = struct.pack("<HHIIHH", 17, channels, sample_rate, byte_rate,
                      block_align, 4)
    fmt += struct.pack("<HH", 2, frames_per_block)  # cbSize, samples/block
    fact = struct.pack("<I", n_frames)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(blocks)) + bytes(blocks)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_pcm(pcm: bytes, channels: int, bits: int):
    if bits not in (8, 16, 24, 32):
        raise ValueError(
            f"unsupported WAV layout: format=1 bits={bits} "
            "(PCM 8/16/24/32-bit only)"
        )
    bwidth = bits // 8
    if len(pcm) % (channels * bwidth) != 0:
        raise ValueError("PCM stream length mismatch")
    n = len(pcm) // bwidth
    if bits == 8:
        vals = [b - 128 for b in pcm]
    elif bits == 16:
        vals = list(struct.unpack(f"<{n}h", pcm))
    elif bits == 24:
        vals = [
            int.from_bytes(pcm[i : i + 3], "little", signed=True)
            for i in range(0, len(pcm), 3)
        ]
    elif bits == 32:
        vals = list(struct.unpack(f"<{n}i", pcm))
    else:
        raise ValueError(
            f"unsupported WAV layout: format=1 bits={bits} "
            "(PCM 8/16/24/32-bit only)"
        )
    return vals


def _decode_ima(pcm: bytes, channels: int, block_align: int,
                frames_per_block: int, total_frames: int | None):
    if channels not in (1, 2):
        raise ValueError("IMA ADPCM: 1 or 2 channels only")
    if block_align < 4 * channels or len(pcm) % block_align != 0:
        raise ValueError("IMA ADPCM block alignment mismatch")
    vals: list[int] = []  # interleaved frames, channel-major per frame
    for b0 in range(0, len(pcm), block_align):
        block = pcm[b0 : b0 + block_align]
        states = []
        for c in range(channels):
            pred, idx, _r = struct.unpack_from("<hBB", block, 4 * c)
            if idx > 88:
                raise ValueError("IMA ADPCM step index out of range")
            states.append(_ImaState(pred, idx))
        # the header sample IS the block's first frame
        frame_vals = [[states[c].predictor] for c in range(channels)]
        body = block[4 * channels :]
        # 4-byte words alternate channels; each word holds 8 nibbles
        for wi in range(0, len(body), 4 * channels):
            for c in range(channels):
                word = body[wi + 4 * c : wi + 4 * c + 4]
                for byte in word:
                    frame_vals[c].append(states[c].decode_nibble(byte & 0x0F))
                    frame_vals[c].append(states[c].decode_nibble(byte >> 4))
        nf = min(len(fv) for fv in frame_vals)
        if frames_per_block:
            nf = min(nf, frames_per_block)
        for i in range(nf):
            for c in range(channels):
                vals.append(frame_vals[c][i])
    if total_frames is not None and total_frames * channels <= len(vals):
        vals = vals[: total_frames * channels]  # drop final-block padding
    return vals


def decode_wav(data: bytes) -> dict:
    """Decode PCM (8/16/24/32-bit) or IMA-ADPCM WAV: returns
    ``{sample_rate, channels, bits, audio_format, n_samples,
    duration_ms, channel_sums, channel_sumsq}`` where the sums are
    exact integers per channel (ADPCM reconstructs to 16-bit samples)
    and ``duration_ms`` is integer floor milliseconds.  Raises
    ``ValueError`` on malformed payloads (bad magic, missing/invalid
    fmt, truncated data, unsupported codec)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE magic")
    (riff_len,) = struct.unpack("<I", data[4:8])
    if riff_len + 8 > len(data):
        raise ValueError("truncated RIFF payload")
    pos = 12
    fmt = None
    fmt_ext = b""
    pcm = None
    fact_frames = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated chunk {tag!r}")
        if tag == b"fmt ":
            if length < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_ext = body[16:]
        elif tag == b"data":
            pcm = body
        elif tag == b"fact" and length >= 4:
            (fact_frames,) = struct.unpack("<I", body[:4])
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None:
        raise ValueError("missing fmt chunk")
    if pcm is None:
        raise ValueError("missing data chunk")
    audio_format, channels, sample_rate, _byte_rate, block_align, bits = fmt
    if sample_rate <= 0:
        raise ValueError("invalid sample rate")
    if channels < 1:
        raise ValueError("invalid channel count")
    if audio_format == 1:
        vals = _decode_pcm(pcm, channels, bits)
    elif audio_format == 17:
        frames_per_block = 0
        if len(fmt_ext) >= 4:
            _cb, frames_per_block = struct.unpack("<HH", fmt_ext[:4])
        vals = _decode_ima(pcm, channels, block_align, frames_per_block,
                           fact_frames)
    else:
        raise ValueError(
            f"unsupported WAV layout: format={audio_format} bits={bits} "
            "(PCM 8/16/24/32-bit and IMA ADPCM only)"
        )
    if len(vals) % channels != 0:
        raise ValueError("PCM stream length mismatch")
    n_samples = len(vals) // channels
    sums = [0] * channels
    sumsq = [0] * channels
    for i, v in enumerate(vals):
        c = i % channels
        sums[c] += v
        sumsq[c] += v * v
    return {
        "sample_rate": sample_rate,
        "channels": channels,
        "bits": bits,
        "audio_format": audio_format,
        "n_samples": n_samples,
        "duration_ms": n_samples * 1000 // sample_rate,
        "channel_sums": sums,
        "channel_sumsq": sumsq,
    }
