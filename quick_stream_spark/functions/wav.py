"""Pure-Python WAV (RIFF/PCM) codec — the REAL audio-decode kernel for
the multimodal pipeline (the companion of :mod:`png`; this container
has no torchaudio/ffmpeg, but PCM WAV needs only ``struct``).

The decoder walks the RIFF chunk list (tolerating extra chunks like
LIST/fact, as real encoders emit), validates the fmt header (PCM,
16-bit), and returns bounded per-channel statistics — exact integer
sample sums and sum-of-squares — never the raw sample arrays.  The
encoder writes canonical 16-bit PCM, so round-trip tests pin the exact
sample values.

Scale posture: per-payload Python inside Arrow-batched ``mapInPandas``
(CPU-heavy, embarrassingly parallel, no shuffle); only a handful of
scalars per clip leave the kernel.
"""

from __future__ import annotations

import struct


def encode_wav(samples, sample_rate: int, channels: int = 1) -> bytes:
    """Encode 16-bit PCM.  ``samples[frame][channel]`` (or a flat list
    for mono) of ints in [-32768, 32767]."""
    frames = bytearray()
    for frame in samples:
        if isinstance(frame, int):
            frame = (frame,)
        if len(frame) != channels:
            raise ValueError("frame width != channels")
        for v in frame:
            frames += struct.pack("<h", int(v))
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(frames)) + bytes(frames)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> dict:
    """Decode 16-bit PCM WAV: returns ``{sample_rate, channels,
    n_samples, duration_ms, channel_sums, channel_sumsq}`` where the
    sums are exact integers per channel and ``duration_ms`` is integer
    floor milliseconds.  Raises ``ValueError`` on malformed payloads
    (bad magic, missing/invalid fmt, truncated data, non-PCM)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE magic")
    (riff_len,) = struct.unpack("<I", data[4:8])
    if riff_len + 8 > len(data):
        raise ValueError("truncated RIFF payload")
    pos = 12
    fmt = None
    pcm = None
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
        elif tag == b"data":
            pcm = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None:
        raise ValueError("missing fmt chunk")
    if pcm is None:
        raise ValueError("missing data chunk")
    audio_format, channels, sample_rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV layout: format={audio_format} bits={bits} "
            f"(PCM 16-bit only)"
        )
    if sample_rate <= 0:
        raise ValueError("invalid sample rate")
    if channels < 1 or len(pcm) % (channels * 2) != 0:
        raise ValueError("PCM stream length mismatch")
    n_samples = len(pcm) // (channels * 2)
    sums = [0] * channels
    sumsq = [0] * channels
    vals = struct.unpack(f"<{n_samples * channels}h", pcm)
    for i, v in enumerate(vals):
        c = i % channels
        sums[c] += v
        sumsq[c] += v * v
    return {
        "sample_rate": sample_rate,
        "channels": channels,
        "n_samples": n_samples,
        "duration_ms": n_samples * 1000 // sample_rate,
        "channel_sums": sums,
        "channel_sumsq": sumsq,
    }
