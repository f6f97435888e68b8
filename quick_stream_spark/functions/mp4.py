"""Pure-Python ISO BMFF (MP4, ISO/IEC 14496-12) container codec — the
REAL video-container kernel behind ``decoder="real"`` in
:mod:`multimodal`.

This container has no ffmpeg, but the MP4 *container* needs only the
public spec: the size/type box walk (including 64-bit ``largesize``
boxes and unknown-box skipping), the ``moov`` hierarchy
(mvhd/trak/tkhd/mdia/mdhd/hdlr/minf/stbl), and the sample-table
machinery — ``stsd`` (sample description / codec fourcc + dims),
``stts`` (decode timestamps), ``stsc`` (sample-to-chunk runs),
``stsz`` (sample sizes), ``stco``/``co64`` (chunk offsets) — from
which every sample's absolute file offset is derived exactly as a
demuxer must.

Motion-JPEG tracks (sample entry ``jpeg``, one complete baseline or
progressive JPEG payload per sample) decode END-TO-END through
:mod:`quick_stream_spark.functions.jpeg` — container demux AND frame
pixel decode are both from scratch.  Compressed-codec tracks
(``avc1``/``hvc1``/``mp4v``…) demux for real — codec fourcc, dims,
frame count, durations, exact sample byte ranges — and raise
``NotImplementedError`` only at the codec-payload decode step, the
exact seam where ffmpeg would slot in.

The muxer writes the same subset (ftyp | mdat | moov with multi-sample
chunks and run-length stts/stsc compression), so the demuxer is
testable against real multi-chunk sample tables it did not compute the
offsets for.

Scale posture: per-payload kernels executed inside Arrow-batched
``mapInPandas`` stages; sample extraction is offset arithmetic (no
per-frame copies beyond the samples themselves), and frame-stat
kernels emit bounded scalars per video, never pixel arrays.
"""

from __future__ import annotations

import struct

# fourccs whose payload is a plain box container (children at +8)
_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts"}


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + fourcc + body


def _full(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B", version) + struct.pack(">I", flags)[1:] + body)


# ---------------------------------------------------------------- muxer


def _fixed_16_16(v: int) -> int:
    return v << 16


_UNITY_MATRIX = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def encode_mp4(
    width: int,
    height: int,
    samples: list[bytes],
    durations: list[int] | None = None,
    codec: str = "jpeg",
    timescale: int = 1000,
    samples_per_chunk: int = 2,
    audio_pcm: list[int] | None = None,
    audio_rate: int = 8000,
) -> bytes:
    """Mux frame payloads into a minimal valid MP4 (ftyp | mdat |
    moov).  ``codec="jpeg"`` declares a Motion-JPEG video track (each
    sample a complete JPEG payload, decodable end-to-end); other
    fourccs (e.g. ``"avc1"``) produce structurally valid files whose
    samples only a real codec could decode.  Video samples are packed
    ``samples_per_chunk`` per chunk so stsc/stco describe a genuinely
    multi-chunk layout.  ``audio_pcm`` (mono 16-bit sample values)
    adds a second track — little-endian PCM (fourcc ``sowt``), one PCM
    frame per sample with a default-size stsz and media timescale ==
    sample rate, the layout real PCM-in-MP4 files use."""
    if not samples:
        raise ValueError("MP4 track needs at least one sample")
    if len(codec) != 4:
        raise ValueError("codec must be a fourcc")
    if durations is None:
        durations = [timescale // 10] * len(samples)
    if len(durations) != len(samples):
        raise ValueError("durations must match samples")

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    audio_bytes = b""
    if audio_pcm is not None:
        if not audio_pcm:
            raise ValueError("audio track needs at least one PCM sample")
        audio_bytes = b"".join(
            struct.pack("<h", int(v)) for v in audio_pcm
        )
    mdat_payload = b"".join(samples) + audio_bytes
    mdat = _box(b"mdat", mdat_payload)

    # chunk layout: fixed-size chunks (last may be short)
    spc = max(1, samples_per_chunk)
    chunk_sizes = []
    i = 0
    while i < len(samples):
        chunk_sizes.append(min(spc, len(samples) - i))
        i += spc
    chunk_offsets = []
    off = len(ftyp) + 8  # first sample: right after the mdat header
    si = 0
    for csz in chunk_sizes:
        chunk_offsets.append(off)
        for _ in range(csz):
            off += len(samples[si])
            si += 1

    # stsc: run-length over (first_chunk, samples_per_chunk)
    stsc_entries = []
    for ci, csz in enumerate(chunk_sizes, start=1):
        if not stsc_entries or stsc_entries[-1][1] != csz:
            stsc_entries.append((ci, csz))
    stsc = _full(
        b"stsc", 0, 0,
        struct.pack(">I", len(stsc_entries))
        + b"".join(struct.pack(">III", fc, n, 1) for fc, n in stsc_entries),
    )

    # stts: run-length over durations
    stts_entries = []
    for d in durations:
        if stts_entries and stts_entries[-1][1] == d:
            stts_entries[-1][0] += 1
        else:
            stts_entries.append([1, d])
    stts = _full(
        b"stts", 0, 0,
        struct.pack(">I", len(stts_entries))
        + b"".join(struct.pack(">II", c, d) for c, d in stts_entries),
    )

    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, len(samples))
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = _full(
        b"stco", 0, 0,
        struct.pack(">I", len(chunk_offsets))
        + b"".join(struct.pack(">I", o) for o in chunk_offsets),
    )

    # stsd: one VisualSampleEntry (14496-12 §8.5.2 + §12.1.3)
    entry_body = (
        b"\x00" * 6 + struct.pack(">H", 1)  # reserved + data_reference_index
        + b"\x00" * 16  # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4  # reserved
        + struct.pack(">H", 1)  # frame_count per sample
        + bytes([9]) + b"qss-codec" + b"\x00" * 22  # compressorname (32)
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
    )
    if codec == "avc1":
        # structurally valid placeholder decoder-config child box
        entry_body += _box(b"avcC", b"\x01\x64\x00\x1f\xff")
    entry = _box(codec.encode("ascii"), entry_body)
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)

    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    url = _full(b"url ", 0, 1, b"")  # flag 1: data in this file
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)

    duration = sum(durations)
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)

    tkhd = _full(
        b"tkhd", 0, 3,  # enabled + in-movie
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + _UNITY_MATRIX
        + struct.pack(">II", _fixed_16_16(width), _fixed_16_16(height)),
    )
    trak = _box(b"trak", tkhd + mdia)

    atrak = b""
    if audio_pcm is not None:
        n_pcm = len(audio_pcm)
        a_entry = _box(
            b"sowt",  # little-endian PCM AudioSampleEntry (14496-12 §12.2.3)
            b"\x00" * 6 + struct.pack(">H", 1)  # reserved + data_ref_idx
            + b"\x00" * 8  # reserved
            + struct.pack(">HHHH", 1, 16, 0, 0)  # mono, 16-bit
            + struct.pack(">I", audio_rate << 16),  # 16.16 samplerate
        )
        a_stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + a_entry)
        a_stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n_pcm, 1))
        a_stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n_pcm, 1))
        # default-size stsz: every PCM frame is 2 bytes, no entry table
        a_stsz = _full(b"stsz", 0, 0, struct.pack(">II", 2, n_pcm))
        audio_off = len(ftyp) + 8 + sum(len(s) for s in samples)
        a_stco = _full(b"stco", 0, 0, struct.pack(">II", 1, audio_off))
        a_stbl = _box(b"stbl", a_stsd + a_stts + a_stsc + a_stsz + a_stco)
        smhd = _full(b"smhd", 0, 0, struct.pack(">HH", 0, 0))
        a_minf = _box(b"minf", smhd + dinf + a_stbl)
        a_mdhd = _full(
            b"mdhd", 0, 0,
            struct.pack(">IIII", 0, 0, audio_rate, n_pcm)
            + struct.pack(">HH", 0x55C4, 0),
        )
        a_hdlr = _full(
            b"hdlr", 0, 0,
            struct.pack(">I", 0) + b"soun" + b"\x00" * 12 + b"SoundHandler\x00",
        )
        a_mdia = _box(b"mdia", a_mdhd + a_hdlr + a_minf)
        a_tkhd = _full(
            b"tkhd", 0, 3,
            struct.pack(">IIIII", 0, 0, 2, 0,
                        n_pcm * timescale // audio_rate)
            + b"\x00" * 8
            + struct.pack(">hhHh", 0, 0, 0x0100, 0)  # volume 1.0
            + _UNITY_MATRIX
            + struct.pack(">II", 0, 0),
        )
        atrak = _box(b"trak", a_tkhd + a_mdia)

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + _UNITY_MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 3 if atrak else 2),  # next_track_ID
    )
    moov = _box(b"moov", mvhd + trak + atrak)
    return ftyp + mdat + moov


# -------------------------------------------------------------- demuxer


def _walk_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in
    [start, end), honouring largesize (size==1) and to-end (size==0)
    boxes; raises ``ValueError`` on truncation."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated MP4 box header")
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize header")
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"MP4 box {fourcc!r} overruns its container")
        yield fourcc, body, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, fourcc: bytes):
    for fc, b, e in _walk_boxes(data, start, end):
        if fc == fourcc:
            return b, e
    return None


def _fullbox(data: bytes, b: int):
    """(version, flags, payload_start) of a full box body."""
    version = data[b]
    flags = int.from_bytes(data[b + 1 : b + 4], "big")
    return version, flags, b + 4


def _parse_track(data: bytes, trak_b: int, trak_e: int) -> dict | None:
    """Parse one trak's handler + sample tables into a track dict, or
    None when the trak has no mdia/hdlr (not a media track)."""
    mdia = _find(data, trak_b, trak_e, b"mdia")
    if mdia is None:
        return None
    hdlr = _find(data, *mdia, b"hdlr")
    if hdlr is None:
        return None
    handler = data[hdlr[0] + 8 : hdlr[0] + 12]

    mdhd = _find(data, *mdia, b"mdhd")
    if mdhd is None:
        raise ValueError("track missing mdhd")
    v, _, p = _fullbox(data, mdhd[0])
    if v == 1:
        (timescale,) = struct.unpack(">I", data[p + 16 : p + 20])
    else:
        (timescale,) = struct.unpack(">I", data[p + 8 : p + 12])

    minf = _find(data, *mdia, b"minf")
    stbl = _find(data, *minf, b"stbl") if minf else None
    if stbl is None:
        raise ValueError("track missing stbl")

    boxes = {fc: (b, e) for fc, b, e in _walk_boxes(data, *stbl)}
    for need in (b"stsd", b"stts", b"stsc", b"stsz"):
        if need not in boxes:
            raise ValueError(f"sample table missing {need.decode()}")
    if b"stco" not in boxes and b"co64" not in boxes:
        raise ValueError("sample table missing stco/co64")

    # stsd: first sample entry carries the codec fourcc; the entry body
    # layout differs between Visual and Audio sample entries
    _, _, p = _fullbox(data, boxes[b"stsd"][0])
    (entry_count,) = struct.unpack(">I", data[p : p + 4])
    if entry_count < 1:
        raise ValueError("empty stsd")
    entries = list(_walk_boxes(data, p + 4, boxes[b"stsd"][1]))
    codec_fc, eb, _ = entries[0]
    track: dict = {
        "handler": handler.decode("ascii", "replace"),
        "codec": codec_fc.decode("ascii", "replace"),
        "timescale": int(timescale),
    }
    if handler == b"vide":
        width, height = struct.unpack(">HH", data[eb + 24 : eb + 28])
        track["width"], track["height"] = int(width), int(height)
    elif handler == b"soun":
        channels, sample_size = struct.unpack(">HH", data[eb + 16 : eb + 20])
        (rate_fixed,) = struct.unpack(">I", data[eb + 24 : eb + 28])
        track["channels"] = int(channels)
        track["sample_size_bits"] = int(sample_size)
        track["sample_rate"] = int(rate_fixed >> 16)

    # stsz (default-size or per-sample table).  A flipped count byte
    # must not allocate gigabyte lists: every sample needs backing
    # bytes somewhere in the file, so the file length bounds the count.
    _, _, p = _fullbox(data, boxes[b"stsz"][0])
    default_size, n_samples = struct.unpack(">II", data[p : p + 8])
    if n_samples > len(data):
        raise ValueError("stsz sample count exceeds file size")
    if default_size:
        sizes = [default_size] * n_samples
    else:
        sizes = list(
            struct.unpack(f">{n_samples}I", data[p + 8 : p + 8 + 4 * n_samples])
        )

    # stts -> per-sample durations (expansion capped by the stsz count)
    _, _, p = _fullbox(data, boxes[b"stts"][0])
    (nruns,) = struct.unpack(">I", data[p : p + 4])
    durations: list[int] = []
    for i in range(nruns):
        c, d = struct.unpack(">II", data[p + 4 + 8 * i : p + 12 + 8 * i])
        if len(durations) + c > n_samples:
            raise ValueError("stts sample count overruns stsz")
        durations.extend([d] * c)
    if len(durations) != n_samples:
        raise ValueError("stts sample count does not match stsz")

    # stco/co64
    if b"stco" in boxes:
        _, _, p = _fullbox(data, boxes[b"stco"][0])
        (nchunks,) = struct.unpack(">I", data[p : p + 4])
        offsets = list(struct.unpack(f">{nchunks}I", data[p + 4 : p + 4 + 4 * nchunks]))
    else:
        _, _, p = _fullbox(data, boxes[b"co64"][0])
        (nchunks,) = struct.unpack(">I", data[p : p + 4])
        offsets = list(struct.unpack(f">{nchunks}Q", data[p + 4 : p + 4 + 8 * nchunks]))

    # stsc -> samples per chunk, expanded over the chunk list
    _, _, p = _fullbox(data, boxes[b"stsc"][0])
    (nstsc,) = struct.unpack(">I", data[p : p + 4])
    runs = [
        struct.unpack(">III", data[p + 4 + 12 * i : p + 16 + 12 * i])
        for i in range(nstsc)
    ]
    spc_by_chunk = []
    for ci in range(1, nchunks + 1):
        spc = None
        for fc_, n, _sdi in runs:
            if fc_ <= ci:
                spc = n
            else:
                break
        if spc is None:
            raise ValueError("stsc does not cover chunk 1")
        spc_by_chunk.append(spc)

    sample_offsets: list[int] = []
    si = 0
    for ci, chunk_off in enumerate(offsets):
        off = chunk_off
        for _ in range(spc_by_chunk[ci]):
            if si >= n_samples:
                break
            sample_offsets.append(off)
            off += sizes[si]
            si += 1
    if len(sample_offsets) != n_samples:
        raise ValueError("stsc/stco chunk map does not cover all samples")
    for o, s in zip(sample_offsets, sizes):
        if o + s > len(data):
            raise ValueError("sample extends past end of file")

    track.update(
        durations=durations,
        duration=int(sum(durations)),
        sample_offsets=sample_offsets,
        sample_sizes=sizes,
        n_samples=int(n_samples),
    )
    return track


def parse_mp4_tracks(data: bytes) -> list[dict]:
    """Demux every media track (video and audio) into track dicts —
    handler, codec fourcc, per-track timescale, per-sample offsets /
    sizes / durations, and handler-specific metadata (dims for
    ``vide``, channels / bit depth / sample rate for ``soun``).
    TOTALITY: arbitrary hostile bytes can only produce ``ValueError``,
    never an internal exception escaping the kernel
    (tests/test_codec_totality.py)."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an MP4: missing ftyp")
    try:
        moov = _find(data, 0, len(data), b"moov")
        if moov is None:
            raise ValueError("no moov box")
        tracks = []
        for fc, b, e in _walk_boxes(data, *moov):
            if fc == b"trak":
                t = _parse_track(data, b, e)
                if t is not None:
                    tracks.append(t)
        return tracks
    except (IndexError, struct.error, OverflowError, MemoryError,
            ZeroDivisionError) as e:
        raise ValueError(f"malformed MP4: {type(e).__name__}: {e}") from e


def parse_mp4(data: bytes) -> dict:
    """Demux the first video track (flattened, the historical contract)
    plus the first audio track when present under an ``"audio"`` key.
    Sample offsets are absolute file offsets derived from
    stsc/stco/stsz exactly as the spec prescribes — the samples
    themselves are NOT copied here."""
    tracks = parse_mp4_tracks(data)
    video = next((t for t in tracks if t["handler"] == "vide"), None)
    if video is None:
        raise ValueError("no video track")
    audio = next((t for t in tracks if t["handler"] == "soun"), None)
    out = dict(video)
    del out["handler"]
    if audio is not None:
        out["audio"] = audio
    return out


def extract_samples(data: bytes) -> list[bytes]:
    """Demux and return the raw sample payloads (one bytes per frame)."""
    info = parse_mp4(data)
    return [
        data[o : o + s]
        for o, s in zip(info["sample_offsets"], info["sample_sizes"])
    ]


def decode_mp4(data: bytes) -> dict:
    """Demux + decode to bounded statistics.  Motion-JPEG tracks decode
    every frame through the from-scratch JPEG codec and report exact
    per-frame-summed luma/RGB channel sums; compressed codecs raise
    ``NotImplementedError`` at the codec seam (the container metadata
    IS parsed first — the error names the codec it found).  Returns
    ``{width, height, n_frames, duration, timescale, codec,
    channel_sums, frame_luma_sums}``."""
    info = parse_mp4(data)
    if info["codec"] != "jpeg":
        raise NotImplementedError(
            f"MP4 codec {info['codec']!r} needs PIL/ffmpeg, not present in "
            "this environment; Motion-JPEG ('jpeg') tracks decode from "
            "scratch (functions/jpeg.py)"
        )
    from quick_stream_spark.functions import jpeg

    # The decode body runs under the same TOTALITY envelope as
    # parse_mp4_tracks: a hostile stsz (e.g. an odd PCM16 sample size
    # whose last sample ends exactly at EOF) must surface as
    # ValueError, never struct.error. NotImplementedError (the codec
    # seam) is deliberately NOT in the tuple and passes through.
    try:
        channel_sums = [0, 0, 0]
        frame_luma_sums = []
        for o, s in zip(info["sample_offsets"], info["sample_sizes"]):
            st = jpeg.decode_jpeg(data[o : o + s])
            if (st["width"], st["height"]) != (info["width"], info["height"]):
                raise ValueError("frame dims disagree with stsd sample entry")
            if st["channels"] == 1:
                frame_luma_sums.append(st["channel_sums"][0])
                for c in range(3):
                    channel_sums[c] += st["channel_sums"][0]
            else:
                frame_luma_sums.append(None)
                for c in range(3):
                    channel_sums[c] += st["channel_sums"][c]
        out = {
            "width": info["width"],
            "height": info["height"],
            "n_frames": info["n_samples"],
            "duration": info["duration"],
            "timescale": info["timescale"],
            "codec": info["codec"],
            "channel_sums": channel_sums,
            "frame_luma_sums": frame_luma_sums,
        }
        audio = info.get("audio")
        if audio is not None:
            if audio["codec"] not in ("sowt", "twos") or audio.get(
                "sample_size_bits"
            ) != 16:
                raise NotImplementedError(
                    f"MP4 audio codec {audio['codec']!r} needs ffmpeg; only "
                    "16-bit PCM ('sowt'/'twos') decodes from scratch"
                )
            endian = "<h" if audio["codec"] == "sowt" else ">h"
            asum = asumsq = 0
            n_vals = 0
            for o, s in zip(audio["sample_offsets"], audio["sample_sizes"]):
                if s % 2 != 0:
                    raise ValueError(
                        "odd stsz sample size in a 16-bit PCM audio track"
                    )
                for i in range(0, s, 2):
                    (v,) = struct.unpack_from(endian, data, o + i)
                    asum += v
                    asumsq += v * v
                    n_vals += 1
            out.update(
                audio_codec=audio["codec"],
                audio_rate=audio["sample_rate"],
                audio_channels=audio["channels"],
                audio_n_samples=n_vals // max(1, audio["channels"]),
                audio_sum=asum,
                audio_sumsq=asumsq,
            )
        return out
    except (IndexError, struct.error, OverflowError, MemoryError,
            ZeroDivisionError) as e:
        raise ValueError(f"malformed MP4: {type(e).__name__}: {e}") from e
