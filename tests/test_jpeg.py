"""From-scratch baseline JPEG codec (functions/jpeg.py): solid-block
exactness (the closed-form-oracle contract), textured round-trips
against a NAIVE T.81 reference pipeline (quadruple-sum DCT written
independently of the codec's matrix implementation), restart markers,
chroma subsampling, Huffman table validity, and the error envelope."""

import numpy as np
import pytest

from quick_stream_spark.functions.jpeg import (
    HUFF_AC_CHROMA,
    HUFF_AC_LUMA,
    HUFF_DC_CHROMA,
    HUFF_DC_LUMA,
    _canonical_codes,
    decode_jpeg,
    decode_jpeg_pixels,
    encode_jpeg,
)


def _solid_luma(did):
    def px(x, y):
        return 128 + 2 * ((((x // 8) * 5 + (y // 8) * 3 + did) % 60) - 30)

    return px


# ------------------------------------------------ solid-block exactness


@pytest.mark.parametrize("did", [0, 1, 2, 3, 7, 11, 20])
def test_grayscale_solid_blocks_exact(did):
    """Per-block solid luma with even offsets survives the Annex K DC
    quantizer exactly: decoded sums equal the generative formula, for
    dims that are NOT multiples of 8 (partial-MCU padding + crop)."""
    w, h = 5 + did % 21, 5 + did % 17
    px = _solid_luma(did)
    info = decode_jpeg(encode_jpeg(w, h, px, components=1))
    assert (info["width"], info["height"], info["channels"]) == (w, h, 1)
    assert info["n_pixels"] == w * h
    assert info["channel_sums"][0] == sum(
        px(x, y) for x in range(w) for y in range(h)
    )


@pytest.mark.parametrize("did", [1, 3, 5, 9, 15])
def test_color_420_neutral_chroma_exact(did):
    """3-component 4:2:0 with neutral chroma (R=G=B): chroma blocks are
    all-zero, luma is DC-only, so the full pipeline — MCU interleave,
    per-component predictors, chroma upsample, YCbCr->RGB — must
    reproduce the formula exactly on every RGB channel."""
    w, h = 5 + did % 21, 5 + did % 17
    px = _solid_luma(did)
    data = encode_jpeg(
        w,
        h,
        lambda x, y: (px(x, y),) * 3,
        components=3,
        subsampling="420",
        restart_interval=2 if did % 3 == 0 else 0,
    )
    info = decode_jpeg(data)
    expect = sum(px(x, y) for x in range(w) for y in range(h))
    assert info["channels"] == 3
    assert info["channel_sums"] == [expect] * 3


# ------------------------------------------- naive-reference round trip


def _naive_fdct(f):
    """T.81 A.3.3 forward DCT as the literal quadruple sum."""
    s = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = (1 / np.sqrt(2)) if u == 0 else 1.0
            cv = (1 / np.sqrt(2)) if v == 0 else 1.0
            acc = 0.0
            for x in range(8):
                for y in range(8):
                    acc += (
                        f[y, x]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            s[v, u] = 0.25 * cu * cv * acc
    return s


def _naive_idct(s):
    f = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            acc = 0.0
            for u in range(8):
                for v in range(8):
                    cu = (1 / np.sqrt(2)) if u == 0 else 1.0
                    cv = (1 / np.sqrt(2)) if v == 0 else 1.0
                    acc += (
                        cu
                        * cv
                        * s[v, u]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            f[y, x] = 0.25 * acc
    return f


def test_textured_grayscale_matches_naive_reference():
    """Flat quant tables + random pixels: the decoded plane must match
    the naive T.81 pipeline (FDCT -> round -> IDCT -> round/clip)
    within +-1 per sample — the Annex A DCT-precision allowance for
    independent DCT implementations (float tie-breaks differ); >=95%
    of samples must agree exactly."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(16, 24))
    data = encode_jpeg(
        24, 16, lambda x, y: int(img[y, x]), components=1, qtables="flat"
    )
    dec = decode_jpeg_pixels(data)["planes"][0]
    ref = np.zeros((16, 24), dtype=np.int64)
    for by in range(2):
        for bx in range(3):
            blk = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(
                np.float64
            ) - 128
            q = np.round(_naive_fdct(blk))
            ref[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.round(_naive_idct(q)) + 128, 0, 255
            )
    diff = np.abs(dec - ref)
    assert diff.max() <= 1, diff.max()
    assert (diff == 0).mean() >= 0.95


def test_textured_standard_tables_small_error():
    """Standard Annex K quantization on smooth content: decoded plane
    stays within the usual lossy envelope (sanity bound, not a spec
    claim) and dims/crop are exact."""
    img = np.fromfunction(
        lambda y, x: 96 + 8 * np.sin(x / 3) + 6 * np.cos(y / 2), (11, 21)
    ).astype(np.int64)
    data = encode_jpeg(21, 11, lambda x, y: int(img[y, x]), components=1)
    dec = decode_jpeg_pixels(data)["planes"][0]
    assert dec.shape == (11, 21)
    assert np.abs(dec - img).max() <= 12


@pytest.mark.parametrize("sub", ["444", "422", "420"])
def test_color_subsampling_roundtrip(sub):
    """Real varying chroma through every sampling layout: flat tables,
    luma within +-1 of the forward transform's Y plane (chroma is
    genuinely lossy under subsampling, luma must not be)."""
    from quick_stream_spark.functions.jpeg import rgb_to_ycbcr

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(13, 19, 3))
    data = encode_jpeg(
        19,
        13,
        lambda x, y: tuple(int(v) for v in img[y, x]),
        components=3,
        subsampling=sub,
        qtables="flat",
    )
    planes = decode_jpeg_pixels(data)["planes"]
    y, _, _ = rgb_to_ycbcr(
        img[:, :, 0].astype(float),
        img[:, :, 1].astype(float),
        img[:, :, 2].astype(float),
    )
    assert np.abs(planes[0] - y).max() <= 1
    info = decode_jpeg(data)
    assert (info["width"], info["height"], info["channels"]) == (19, 13, 3)


def test_restart_markers_equivalent_and_reset_predictors():
    """DRI n=1 (a restart after every MCU — maximal predictor resets)
    must decode identically to the no-restart encoding."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(24, 40))
    a = encode_jpeg(40, 24, lambda x, y: int(img[y, x]), components=1,
                    qtables="flat")
    b = encode_jpeg(40, 24, lambda x, y: int(img[y, x]), components=1,
                    qtables="flat", restart_interval=1)
    assert b != a  # RST markers actually present
    pa = decode_jpeg_pixels(a)["planes"][0]
    pb = decode_jpeg_pixels(b)["planes"][0]
    assert (pa == pb).all()


# ------------------------------------------------- progressive (SOF2)


@pytest.mark.parametrize("did", [0, 2, 7, 11])
def test_progressive_grayscale_solid_blocks_exact(did):
    """Progressive encode of solid blocks decodes to the exact
    generative formula: DC first pass (Al=1) + DC refinement must
    reconstruct every DC exactly; all AC scans are pure EOB-runs."""
    w, h = 5 + did % 21, 5 + did % 17
    px = _solid_luma(did)
    data = encode_jpeg(w, h, px, components=1, progressive=True)
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data  # really SOF2
    info = decode_jpeg(data)
    assert (info["width"], info["height"], info["channels"]) == (w, h, 1)
    assert info["channel_sums"][0] == sum(
        px(x, y) for x in range(w) for y in range(h)
    )


@pytest.mark.parametrize("did", [1, 5, 9])
def test_progressive_color_420_solid_blocks_exact(did):
    """3-component progressive with 4:2:0 neutral chroma: interleaved DC
    scans + per-component non-interleaved AC scans reproduce the formula
    exactly on every RGB channel."""
    w, h = 5 + did % 21, 5 + did % 17
    px = _solid_luma(did)
    data = encode_jpeg(
        w, h, lambda x, y: (px(x, y),) * 3,
        components=3, subsampling="420", progressive=True,
    )
    info = decode_jpeg(data)
    expect = sum(px(x, y) for x in range(w) for y in range(h))
    assert info["channels"] == 3
    assert info["channel_sums"] == [expect] * 3


@pytest.mark.parametrize("sub", ["444", "422", "420"])
@pytest.mark.parametrize("qt", ["flat", "standard"])
def test_progressive_decodes_identically_to_baseline(sub, qt):
    """The scan script refines every coefficient down to Al=0, so the
    progressive payload carries EXACTLY the same quantized coefficients
    as the baseline payload — decoded planes must be bit-for-bit equal.
    Random content exercises AC-first EOB-runs, ZRL folding and the
    AC-refinement correction-bit path on all three components."""
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(21, 29, 3))
    fn = lambda x, y: tuple(int(v) for v in img[y, x])  # noqa: E731
    base = decode_jpeg_pixels(
        encode_jpeg(29, 21, fn, components=3, subsampling=sub, qtables=qt)
    )
    prog = decode_jpeg_pixels(
        encode_jpeg(29, 21, fn, components=3, subsampling=sub, qtables=qt,
                    progressive=True)
    )
    for pa, pb in zip(base["planes"], prog["planes"]):
        assert (pa == pb).all()


def test_progressive_grayscale_identical_to_baseline():
    rng = np.random.default_rng(29)
    img = rng.integers(0, 256, size=(24, 40))
    fn = lambda x, y: int(img[y, x])  # noqa: E731
    a = decode_jpeg_pixels(encode_jpeg(40, 24, fn, components=1))["planes"][0]
    b = decode_jpeg_pixels(
        encode_jpeg(40, 24, fn, components=1, progressive=True)
    )["planes"][0]
    assert (a == b).all()


def test_progressive_rejects_restart_and_validates_scans():
    with pytest.raises(ValueError, match="restart"):
        encode_jpeg(8, 8, lambda x, y: 0, components=1, progressive=True,
                    restart_interval=2)
    # a refinement jump of more than one bit is rejected by the decoder
    data = bytearray(encode_jpeg(8, 8, _solid_luma(1), components=1,
                                 progressive=True))
    i = data.find(b"\xff\xda")  # first SOS: Ss=0 Se=0 Ah=0 Al=1
    # SOS body: len(2) ns(1) comp(2) Ss Se AhAl -> AhAl at offset 9
    assert data[i + 9] == 0x01
    data[i + 9] = 0x31  # claim Ah=3, Al=1: not a one-bit refinement
    with pytest.raises(ValueError, match="refine one bit"):
        decode_jpeg_pixels(bytes(data))


# ------------------------------------------------------- table validity


@pytest.mark.parametrize(
    "spec",
    [HUFF_DC_LUMA, HUFF_DC_CHROMA, HUFF_AC_LUMA, HUFF_AC_CHROMA],
    ids=["dc_luma", "dc_chroma", "ac_luma", "ac_chroma"],
)
def test_huffman_specs_are_valid_canonical_tables(spec):
    """Encoder tables must be structurally valid: value count matches
    BITS, canonical construction succeeds (prefix-free by
    construction), and every (run,size) symbol the encoder can emit is
    present."""
    bits, vals = spec
    codes = _canonical_codes(bits, vals)
    assert len(codes) == sum(bits)
    if len(vals) > 16:  # AC tables: all emit-able symbols covered
        needed = {0x00, 0xF0} | {
            (r << 4) | s for r in range(16) for s in range(1, 11)
        }
        assert needed <= set(codes)
    else:  # DC tables: categories 0..11
        assert set(range(12)) <= set(codes)


def test_bad_huffman_spec_rejected():
    with pytest.raises(ValueError, match="HUFFVAL length"):
        _canonical_codes([0] * 16, [1])
    with pytest.raises(ValueError, match="overflow"):
        _canonical_codes([3] + [0] * 15, [1, 2, 3])


# -------------------------------------------------------- error paths


def test_error_envelope():
    px = _solid_luma(1)
    good = encode_jpeg(12, 9, px, components=1)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02")
    with pytest.raises(ValueError, match="missing SOF0 or SOS"):
        decode_jpeg(good[:20])
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(good[:-20])
    # SOF3 (lossless) is outside the envelope and must say so
    lossless = bytearray(good)
    idx = lossless.find(b"\xff\xc0")
    lossless[idx + 1] = 0xC3
    with pytest.raises(ValueError, match="baseline|progressive"):
        decode_jpeg(bytes(lossless))
    # a baseline full-band scan under a SOF2 header is an invalid
    # progressive scan, not a silent decode
    mislabeled = bytearray(good)
    mislabeled[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive DC scan"):
        decode_jpeg(bytes(mislabeled))


def test_encoder_rejects_bad_args():
    with pytest.raises(ValueError, match="components"):
        encode_jpeg(4, 4, lambda x, y: 0, components=2)
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(4, 4, lambda x, y: (0, 0, 0), subsampling="411")
    with pytest.raises(ValueError, match="qtables"):
        encode_jpeg(4, 4, lambda x, y: 0, components=1, qtables="nope")


def test_hostile_sof_allocation_bomb_is_rejected_fast():
    """ADVICE r7: a 16-byte hostile SOF declaring 3 components at 4x4
    sampling passes the pixel cap (8192x8192 == MAX_PIXELS) yet would
    allocate ~1.5 GB of int64 coefficient grids before any entropy data
    is validated.  The summed block-grid cap must reject it instantly
    (well under the gigabyte mark and without a scan)."""
    import struct
    import time

    from quick_stream_spark.functions.jpeg import decode_jpeg_pixels

    sof = struct.pack(">BHHB", 8, 8192, 8192, 3) + b"".join(
        struct.pack(">BBB", cid, (4 << 4) | 4, 0) for cid in (1, 2, 3)
    )
    data = (
        b"\xff\xd8"
        + b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    )
    t0 = time.monotonic()
    with pytest.raises(ValueError, match="allocation bound"):
        decode_jpeg_pixels(data)
    assert time.monotonic() - t0 < 1.0


def test_max_size_420_frame_passes_the_allocation_gate():
    """ADVICE r8: the summed block-grid cap must bind only >=3x-
    expansion layouts, not max-size legitimate photographic frames.  A
    67 MP 4:2:0 SOF (8192x8192, the exact MAX_PIXELS limit) allocates
    1.5*2^26 elements — under the 2^27 cap — so it must proceed PAST
    the allocation gate and fail later for the honest reason (no scan
    data), never with "allocation bound"."""
    import struct

    from quick_stream_spark.functions.jpeg import decode_jpeg_pixels

    sof = struct.pack(">BHHB", 8, 8192, 8192, 3) + b"".join(
        struct.pack(">BBB", cid, hv, 0)
        for cid, hv in ((1, (2 << 4) | 2), (2, (1 << 4) | 1), (3, (1 << 4) | 1))
    )
    data = (
        b"\xff\xd8"
        + b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
        + b"\xff\xd9"  # EOI with no SOS: fails AFTER the gate
    )
    with pytest.raises(ValueError) as exc:
        decode_jpeg_pixels(data)
    assert "allocation bound" not in str(exc.value)


def test_allocation_cap_is_session_configurable(monkeypatch):
    """ADVICE r9: the 2^27 default admits a 1 GB worst-case transient
    per hostile header; hardened deployments lower the cap per session
    via QSS_JPEG_MAX_COEF_ELEMENTS without forfeiting it for everyone.
    At 2^26 the same max-size 4:2:0 frame that passes the default gate
    (1.5*2^26 elements) must now be rejected at the gate."""
    import struct

    from quick_stream_spark.functions.jpeg import decode_jpeg_pixels

    sof = struct.pack(">BHHB", 8, 8192, 8192, 3) + b"".join(
        struct.pack(">BBB", cid, hv, 0)
        for cid, hv in ((1, (2 << 4) | 2), (2, (1 << 4) | 1), (3, (1 << 4) | 1))
    )
    data = (
        b"\xff\xd8"
        + b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
        + b"\xff\xd9"
    )
    monkeypatch.setenv("QSS_JPEG_MAX_COEF_ELEMENTS", str(1 << 26))
    with pytest.raises(ValueError, match="allocation bound"):
        decode_jpeg_pixels(data)
    monkeypatch.delenv("QSS_JPEG_MAX_COEF_ELEMENTS")
    with pytest.raises(ValueError) as exc:  # default cap: passes the gate
        decode_jpeg_pixels(data)
    assert "allocation bound" not in str(exc.value)


def test_allocation_cap_env_validated_loudly(monkeypatch):
    """ADVICE r10: '0', a negative value, or garbage in
    QSS_JPEG_MAX_COEF_ELEMENTS is a CONFIGURATION error — it must fail
    with a message naming the variable, not silently reject every JPEG
    ('0' passed the old truthiness check) or surface as a per-row
    'malformed JPEG' ValueError from deep inside the kernel."""
    from quick_stream_spark.functions.jpeg import (
        MAX_COEF_ELEMENTS,
        _coef_element_cap,
    )

    for bad in ("0", "-5", "banana", "1.5"):
        monkeypatch.setenv("QSS_JPEG_MAX_COEF_ELEMENTS", bad)
        with pytest.raises(ValueError, match="QSS_JPEG_MAX_COEF_ELEMENTS"):
            _coef_element_cap()
    # unset and empty fall back to the default cap
    monkeypatch.setenv("QSS_JPEG_MAX_COEF_ELEMENTS", "")
    assert _coef_element_cap() == MAX_COEF_ELEMENTS
    monkeypatch.delenv("QSS_JPEG_MAX_COEF_ELEMENTS")
    assert _coef_element_cap() == MAX_COEF_ELEMENTS
    monkeypatch.setenv("QSS_JPEG_MAX_COEF_ELEMENTS", str(1 << 20))
    assert _coef_element_cap() == 1 << 20
