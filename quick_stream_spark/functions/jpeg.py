"""Pure-Python + numpy JPEG codec (ITU-T T.81) — the REAL JPEG-decode
kernel behind ``decoder="real"`` in :mod:`multimodal`.

This container has no PIL, but Huffman-coded JPEG needs only the public
spec: marker segment walk (SOI/APP0/DQT/SOF/DHT/DRI/SOS/EOI), canonical
Huffman tables built from the file's own DHT segments, entropy decode
with 0xFF00 byte unstuffing and RSTn restart handling, dequantization,
inverse zigzag, a vectorized 8x8 IDCT (orthonormal DCT-II basis, numpy
matmul), chroma upsampling by sample replication, and the JFIF
YCbCr->RGB transform.

Supported frames: 8-bit baseline sequential (SOF0) AND 8-bit
progressive (SOF2, T.81 Annex G): spectral selection, successive
approximation (DC first/refine with arithmetic point transform, AC
first with EOB-run coding, AC refinement with correction bits), 1 or 3
components, sampling factors h,v in {1,2} (4:4:4, 4:2:2, 4:2:0),
restart intervals, multi-scan files with DHT redefinition between
scans.  Lossless/arithmetic/hierarchical/12-bit frames raise
``ValueError`` — the decoder is honest about its envelope.

The encoder writes the same subset — baseline, and a progressive mode
with a libjpeg-style scan script (DC Al=1 -> AC bands -> DC refine ->
AC refines down to Al=0) whose AC Huffman tables are rebuilt per scan
from a symbol-counting pre-pass (fixed-length canonical codes, the
all-ones codeword provably unused) — so the decoder is testable against
real multi-scan entropy-coded data it did not produce the internal
state for.  The decoder builds its Huffman tables from the DHT segments
in the payload — as the spec requires — so decode correctness never
depends on the encoder's table choice.  Because every coefficient is
refined down to Al=0, a progressive encode decodes to EXACTLY the same
pixels as the baseline encode of the same image (same quantized
coefficients) — the cross-mode equality tests/test_jpeg.py pins.

Exactness note for closed-form oracles: a solid-color 8x8 block has a
DC-only DCT (DC = 8*(v-128), all ACs zero); with the Annex K luma
quantizer (DC step 16) the DC survives quantization exactly whenever
v-128 is even, and the IDCT of a DC-only block is the exact constant
DC/8.  Oracle-gated queries therefore use per-block solid colors with
even offsets: the decoded pixels equal the generative formula with NO
float ambiguity, so a SQL oracle that never decodes can pin the whole
pipeline (see plans/text.py ``mm_jpeg_decode`` / ``mm_jpeg_progressive``).

Scale posture: per-payload kernels executed inside Arrow-batched
``mapInPandas`` stages — CPU-heavy, embarrassingly parallel, no
shuffle; cluster parallelism comes from partitioning, not the kernel.
"""

from __future__ import annotations

import os
import struct

import numpy as np

# ---------------------------------------------------------------- tables

# zigzag scan: position k in the scan -> raster index in the 8x8 block
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K example quantization tables (T.81 K.1/K.2), raster order
QTABLE_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

QTABLE_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99]
    + [99] * 32,
    dtype=np.int64,
).reshape(8, 8)

# Annex K example Huffman specs: (BITS[1..16], HUFFVAL).  The decoder
# never relies on these — it builds tables from the payload's DHT — so
# only structural validity matters for the encoder (pinned by tests:
# len(vals) == sum(bits) and canonical construction succeeds).
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_basis() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis A: FDCT is A @ f @ A.T, IDCT is
    A.T @ S @ A.  A DC-only block IDCTs to the exact constant DC/8."""
    a = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(1.0 / 8.0) if u == 0 else np.sqrt(2.0 / 8.0)
        for x in range(8):
            a[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_A = _dct_basis()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 C.2): symbol -> (length, code).
    Raises ``ValueError`` on a malformed spec (wrong counts or code
    overflow), so table validity is checkable."""
    if len(vals) != sum(bits):
        raise ValueError("HUFFVAL length does not match BITS counts")
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError("Huffman code overflow: invalid BITS")
            out[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


def _fixed_length_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """Build a structurally valid (BITS, HUFFVAL) spec assigning every
    symbol the SAME code length L = ceil(log2(n+1)): the Kraft sum is
    n/2^L < 1, and the all-ones codeword (value 2^L - 1 >= n) is never
    assigned — the property T.81 tables maintain so padding bits can
    never form a valid code.  Used by the progressive encoder to emit a
    per-scan AC table covering exactly the symbols the scan needs."""
    n = len(symbols)
    if n == 0:
        symbols = [0x00]  # degenerate scan: table must still be valid
        n = 1
    length = max(1, (n + 1 - 1).bit_length())  # ceil(log2(n+1))
    while (1 << length) <= n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    return bits, sorted(symbols)


def rgb_to_ycbcr(r, g, b):
    """JFIF forward color transform (float -> rounded ints)."""
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return (
        np.clip(np.round(y), 0, 255).astype(np.int64),
        np.clip(np.round(cb), 0, 255).astype(np.int64),
        np.clip(np.round(cr), 0, 255).astype(np.int64),
    )


def ycbcr_to_rgb(y, cb, cr):
    """JFIF inverse color transform (float -> rounded, clamped ints)."""
    yf = y.astype(np.float64)
    cbf = cb.astype(np.float64) - 128.0
    crf = cr.astype(np.float64) - 128.0
    r = yf + 1.402 * crf
    g = yf - 0.344136 * cbf - 0.714136 * crf
    b = yf + 1.772 * cbf
    to8 = lambda p: np.clip(np.round(p), 0, 255).astype(np.int64)  # noqa: E731
    return to8(r), to8(g), to8(b)


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                if self._acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self._acc = 0
                self._n = 0

    def pad_to_byte(self) -> None:
        while self._n:
            self.write(1, 1)  # pad with 1-bits per spec


class _CountEmitter:
    """Pass-1 emitter: records AC Huffman symbol frequencies (the only
    per-scan-optimized table); DC symbols and raw bits are free."""

    def __init__(self) -> None:
        self.ac_syms: dict[int, int] = {}

    def sym_dc(self, slot: int, s: int) -> None:
        pass

    def sym_ac(self, s: int) -> None:
        self.ac_syms[s] = self.ac_syms.get(s, 0) + 1

    def bits(self, v: int, n: int) -> None:
        pass


class _WriteEmitter:
    """Pass-2 emitter: writes Huffman codes + appended bits."""

    def __init__(self, w: _BitWriter, dc_codes: list[dict], ac_codes: dict | None):
        self.w = w
        self.dc_codes = dc_codes
        self.ac_codes = ac_codes

    def sym_dc(self, slot: int, s: int) -> None:
        ln, code = self.dc_codes[slot][s]
        self.w.write(code, ln)

    def sym_ac(self, s: int) -> None:
        ln, code = self.ac_codes[s]
        self.w.write(code, ln)

    def bits(self, v: int, n: int) -> None:
        if n:
            self.w.write(v, n)


def _mag_bits(v: int) -> tuple[int, int]:
    """(category ssss, appended bits) for a DC diff / AC value."""
    if v == 0:
        return 0, 0
    ssss = int(v if v > 0 else -v).bit_length()
    bits = v if v >= 0 else v + (1 << ssss) - 1
    return ssss, bits


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


_SAMPLING = {"444": ((1, 1), (1, 1)), "422": ((2, 1), (1, 1)), "420": ((2, 2), (1, 1))}


def _flush_eobrun(em, state: dict) -> None:
    """Emit the accumulated EOB-run (EOBn symbol + extra bits), then any
    buffered refinement correction bits (T.81 G.1.2.2/G.1.2.3)."""
    e = state["eobrun"]
    if e > 0:
        r = e.bit_length() - 1
        em.sym_ac(r << 4)
        em.bits(e - (1 << r), r)
        state["eobrun"] = 0
    for b in state["pending"]:
        em.bits(b, 1)
    state["pending"] = []


def _enc_block_ac_first(em, zz, ss: int, se: int, al: int, state: dict | None) -> None:
    """AC coding of one block's band [ss..se]: baseline run/size coding
    when ``state`` is None (EOB = 0x00 only), progressive-first-pass
    coding with magnitude point transform and cross-block EOB-runs when
    ``state`` carries the scan's eobrun."""
    band = []
    for k in range(ss, se + 1):
        v = int(zz[k])
        av = (v if v >= 0 else -v) >> al
        band.append(av if v >= 0 else -av)
    last_nz = -1
    for i, v in enumerate(band):
        if v:
            last_nz = i
    if last_nz < 0:
        if state is None:
            em.sym_ac(0x00)
        else:
            state["eobrun"] += 1
            if state["eobrun"] == 0x7FFF:
                _flush_eobrun(em, state)
        return
    if state is not None:
        _flush_eobrun(em, state)
    run = 0
    for i in range(last_nz + 1):
        v = band[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            em.sym_ac(0xF0)  # ZRL
            run -= 16
        ssss, bits = _mag_bits(v)
        em.sym_ac((run << 4) | ssss)
        em.bits(bits, ssss)
        run = 0
    if last_nz < se - ss:
        if state is None:
            em.sym_ac(0x00)
        else:
            state["eobrun"] += 1
            if state["eobrun"] == 0x7FFF:
                _flush_eobrun(em, state)


def _enc_block_ac_refine(em, zz, ss: int, se: int, al: int, state: dict) -> None:
    """AC successive-approximation refinement of one block (T.81
    G.1.2.3, the libjpeg correction-bit discipline): already-significant
    coefficients contribute one buffered correction bit each; newly
    significant ones (|v|>>al == 1) are coded as run/1 + sign, flushing
    the buffered bits; trailing runs fold into the scan-wide EOB-run,
    carrying their correction bits with it."""
    absv = []
    signs = []
    for k in range(ss, se + 1):
        v = int(zz[k])
        absv.append((v if v >= 0 else -v) >> al)
        signs.append(v >= 0)
    run = 0
    br: list[int] = []  # correction bits in the current run
    for i, t in enumerate(absv):
        if t == 0:
            run += 1
            continue
        if t > 1:  # already significant: correction bit, run continues
            br.append(t & 1)
            continue
        # newly significant coefficient
        while run > 15:
            _flush_eobrun(em, state)
            em.sym_ac(0xF0)
            run -= 16
            for b in br:
                em.bits(b, 1)
            br = []
        _flush_eobrun(em, state)
        em.sym_ac((run << 4) | 1)
        em.bits(1 if signs[i] else 0, 1)
        for b in br:
            em.bits(b, 1)
        br = []
        run = 0
    if run > 0 or br:
        state["eobrun"] += 1
        state["pending"].extend(br)
        if state["eobrun"] == 0x7FFF or len(state["pending"]) > 937:
            _flush_eobrun(em, state)


def _emit_scan(em, arrays, units, scan_comps, ss, se, ah, al, baseline: bool) -> None:
    """Drive one scan's entropy coding through an emitter.  ``units`` is
    the block walk: a list of MCUs, each a list of (ci, by, bx)."""
    preds = {ci: 0 for ci in scan_comps}
    state = None if baseline else {"eobrun": 0, "pending": []}
    for unit in units:
        for ci, by, bx in unit:
            zz = arrays[ci][by, bx]
            if ss == 0:
                v = int(zz[0]) >> al  # arithmetic shift: DC point transform
                if ah == 0:
                    ssss, bits = _mag_bits(v - preds[ci])
                    preds[ci] = v
                    em.sym_dc(min(ci, 1), ssss)
                    em.bits(bits, ssss)
                else:
                    em.bits(v & 1, 1)
            if se > 0:
                if ah == 0:
                    _enc_block_ac_first(em, zz, max(1, ss), se, al, state)
                else:
                    _enc_block_ac_refine(em, zz, ss, se, al, state)
    if state is not None:
        _flush_eobrun(em, state)


def _mcu_units(factors, mcus_x, mcus_y):
    """Interleaved MCU walk: one unit per MCU, fh*fv blocks per comp."""
    units = []
    for mi in range(mcus_y * mcus_x):
        my, mx = divmod(mi, mcus_x)
        unit = []
        for ci, (fh, fv) in enumerate(factors):
            for by in range(fv):
                for bx in range(fh):
                    unit.append((ci, my * fv + by, mx * fh + bx))
        units.append(unit)
    return units


def _comp_units(ci, bw, bh):
    """Non-interleaved walk (T.81: ns=1 scans): one block per unit over
    the component's true block grid, row-major."""
    return [[(ci, by, bx)] for by in range(bh) for bx in range(bw)]


def encode_jpeg(
    width: int,
    height: int,
    pixel_fn,
    components: int = 3,
    subsampling: str = "444",
    restart_interval: int = 0,
    qtables: str = "standard",
    progressive: bool = False,
) -> bytes:
    """Encode to a complete JFIF payload — baseline SOF0, or progressive
    SOF2 with a libjpeg-style scan script when ``progressive=True``.
    ``pixel_fn(x, y)`` returns an (r, g, b) tuple (``components=3``) or
    a single luma int (``components=1``).  ``qtables``: ``"standard"``
    (Annex K) or ``"flat"`` (all ones — lossless through quantization,
    for round-trip tests).  Progressive refines every coefficient down
    to Al=0, so it decodes to exactly the same pixels as the baseline
    encoding of the same image."""
    if components not in (1, 3):
        raise ValueError("components must be 1 or 3")
    if subsampling not in _SAMPLING:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if progressive and restart_interval:
        raise ValueError("progressive encoder does not emit restart markers")
    (hy, vy), (hc, vc) = _SAMPLING[subsampling]
    if components == 1:
        hy = vy = 1
    hmax, vmax = hy, vy
    mcu_w, mcu_h = 8 * hmax, 8 * vmax

    xs = np.arange(width)
    ys = np.arange(height)
    if components == 3:
        px = np.array(
            [[pixel_fn(int(x), int(y)) for x in xs] for y in ys], dtype=np.float64
        )
        yp, cbp, crp = rgb_to_ycbcr(px[:, :, 0], px[:, :, 1], px[:, :, 2])
        planes = [yp, cbp, crp]
    else:
        yp = np.array(
            [[int(pixel_fn(int(x), int(y))) & 0xFF for x in xs] for y in ys],
            dtype=np.int64,
        )
        planes = [yp]

    pad_h = (height + mcu_h - 1) // mcu_h * mcu_h
    pad_w = (width + mcu_w - 1) // mcu_w * mcu_w
    mcus_x, mcus_y = pad_w // mcu_w, pad_h // mcu_h

    if qtables == "flat":
        q_luma = np.ones((8, 8), dtype=np.int64)
        q_chroma = np.ones((8, 8), dtype=np.int64)
    elif qtables == "standard":
        q_luma, q_chroma = QTABLE_LUMA, QTABLE_CHROMA
    else:
        raise ValueError(f"unknown qtables {qtables!r}")

    factors = [(hy, vy)] + [(hc, vc)] * (components - 1)
    quants = [q_luma] + [q_chroma] * (components - 1)

    # Quantize every component into a zigzag coefficient array
    # (BH, BW, 64) over the MCU-padded block grid; scans read from it.
    arrays = []
    for ci, plane in enumerate(planes):
        p = np.pad(
            plane,
            ((0, pad_h - height), (0, pad_w - width)),
            mode="edge",
        )
        fh, fv = factors[ci]
        if (fh, fv) != (hmax, vmax):
            # box-average downsample by the factor ratio (JFIF chroma)
            ry, rx = vmax // fv, hmax // fh
            p = p.reshape(p.shape[0] // ry, ry, p.shape[1] // rx, rx)
            p = np.round(p.mean(axis=(1, 3))).astype(np.int64)
        bh, bw = p.shape[0] // 8, p.shape[1] // 8
        blk = p.astype(np.float64).reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        s = np.matmul(np.matmul(_A, blk - 128.0), _A.T)
        qz = np.round(s / quants[ci].astype(np.float64)).astype(np.int64)
        arr = qz.reshape(bh, bw, 64)[:, :, ZIGZAG]  # raster -> zigzag order
        arrays.append(arr)

    dc_specs = [HUFF_DC_LUMA] + [HUFF_DC_CHROMA] * (components - 1)
    dc_codes = [_canonical_codes(*s) for s in dc_specs[:2]]

    # ---- headers common to both modes
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(
        0xFFE0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0)
    )
    zz_luma = q_luma.reshape(64)[ZIGZAG]
    out += _seg(0xFFDB, bytes([0x00]) + bytes(int(v) for v in zz_luma))
    if components == 3:
        zz_chroma = q_chroma.reshape(64)[ZIGZAG]
        out += _seg(0xFFDB, bytes([0x01]) + bytes(int(v) for v in zz_chroma))
    sof_marker = 0xFFC2 if progressive else 0xFFC0
    sof = struct.pack(">BHHB", 8, height, width, components)
    for ci in range(components):
        fh, fv = factors[ci]
        sof += bytes([ci + 1, (fh << 4) | fv, 0 if ci == 0 else 1])
    out += _seg(sof_marker, sof)
    for tclass, tid, (bits, vals) in (
        (0, 0, HUFF_DC_LUMA),
        (0, 1, HUFF_DC_CHROMA),
    )[: min(components, 2)]:
        out += _seg(
            0xFFC4, bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
        )

    def sos_header(scan_comps, ss, se, ah, al):
        body = bytes([len(scan_comps)])
        for ci in scan_comps:
            td = 0 if ci == 0 else 1
            ta = 0 if progressive else td
            if ss > 0:  # AC scan: table redefined per scan as AC id 0
                td, ta = 0, 0
            body += bytes([ci + 1, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return _seg(0xFFDA, body)

    if not progressive:
        ac_specs = [HUFF_AC_LUMA] + [HUFF_AC_CHROMA] * (components - 1)
        ac_codes = [_canonical_codes(*s) for s in ac_specs[:2]]
        for tclass, tid, (bits, vals) in (
            (1, 0, HUFF_AC_LUMA),
            (1, 1, HUFF_AC_CHROMA),
        )[: min(components, 2)]:
            out += _seg(
                0xFFC4, bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
            )
        if restart_interval:
            out += _seg(0xFFDD, struct.pack(">H", restart_interval))
        out += sos_header(list(range(components)), 0, 63, 0, 0)
        # single interleaved scan; restart handling needs the raw writer
        w = _BitWriter()
        units = _mcu_units(factors, mcus_x, mcus_y)
        preds = [0] * components
        state = None
        rst = 0
        for mi, unit in enumerate(units):
            if restart_interval and mi and mi % restart_interval == 0:
                w.pad_to_byte()
                w.out.extend(struct.pack(">H", 0xFFD0 + (rst & 7)))
                rst += 1
                preds = [0] * components
            for ci, by, bx in unit:
                zz = arrays[ci][by, bx]
                em = _WriteEmitter(w, dc_codes, ac_codes[min(ci, 1)])
                ssss, bits = _mag_bits(int(zz[0]) - preds[ci])
                preds[ci] = int(zz[0])
                em.sym_dc(min(ci, 1), ssss)
                em.bits(bits, ssss)
                _enc_block_ac_first(em, zz, 1, 63, 0, state)
        w.pad_to_byte()
        out += w.out
        out += b"\xff\xd9"
        return bytes(out)

    # ---- progressive scan script (all coefficients refined to Al=0)
    if components == 1:
        script = [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 2, 1),
            ([0], 1, 63, 1, 0),
        ]
    else:
        script = [
            ([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([1], 1, 63, 0, 1),
            ([2], 1, 63, 0, 1),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0, 1, 2], 0, 0, 1, 0),
            ([1], 1, 63, 1, 0),
            ([2], 1, 63, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    for scan_comps, ss, se, ah, al in script:
        if len(scan_comps) > 1:
            units = _mcu_units(factors, mcus_x, mcus_y)
        else:
            # true block grid for non-interleaved scans (T.81: ns=1)
            ci = scan_comps[0]
            fh, fv = factors[ci]
            cw = (width * fh + hmax - 1) // hmax
            ch = (height * fv + vmax - 1) // vmax
            units = _comp_units(ci, (cw + 7) // 8, (ch + 7) // 8)
        if ss > 0:  # AC scan: per-scan optimized Huffman table
            counter = _CountEmitter()
            _emit_scan(counter, arrays, units, scan_comps, ss, se, ah, al, False)
            bits, vals = _fixed_length_table(list(counter.ac_syms))
            out += _seg(0xFFC4, bytes([(1 << 4) | 0]) + bytes(bits) + bytes(vals))
            ac_tbl = _canonical_codes(bits, vals)
        else:
            ac_tbl = None
        out += sos_header(scan_comps, ss, se, ah, al)
        w = _BitWriter()
        em = _WriteEmitter(w, dc_codes, ac_tbl)
        _emit_scan(em, arrays, units, scan_comps, ss, se, ah, al, False)
        w.pad_to_byte()
        out += w.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------- decoder


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops cleanly at any non-stuffing marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy stream")
            b = self.data[self.pos]
            if b == 0xFF:
                if self.pos + 1 >= len(self.data):
                    raise ValueError("truncated entropy stream at 0xFF")
                nxt = self.data[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2
                else:
                    raise ValueError(
                        f"unexpected marker 0xFF{nxt:02X} inside entropy data"
                    )
            else:
                self.pos += 1
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_consume_rst(self) -> None:
        """Byte-align and consume one RSTn marker (T.81 E.2.4)."""
        self._n = 0
        if self.pos + 2 > len(self.data):
            raise ValueError("truncated stream at restart marker")
        b0, b1 = self.data[self.pos], self.data[self.pos + 1]
        if b0 != 0xFF or not (0xD0 <= b1 <= 0xD7):
            raise ValueError(
                f"expected restart marker, found {b0:02X}{b1:02X}"
            )
        self.pos += 2


def _decode_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _dec_block_ac_first(br, ac_tbl, zz, ss, se, al, state, progressive) -> None:
    """First-pass AC decode of one block's band (baseline when al=0 and
    EOBn symbols are rejected; progressive G.1.2.2 otherwise)."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _decode_huff(br, ac_tbl)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            if not progressive and r != 0:
                raise ValueError(
                    f"EOBn symbol 0x{rs:02X} is invalid in a baseline scan"
                )
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += br.receive(r)
            return
        k += r
        if k > se:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(br.receive(s), s) << al
        k += 1


def _dec_block_ac_refine(br, ac_tbl, zz, ss, se, al) -> int:
    """AC successive-approximation refinement of one block (T.81 G.2,
    the libjpeg correction-bit discipline).  Returns the scan's new
    EOB-run count (0 unless this block started one)."""
    p1 = 1 << al
    m1 = -1 << al

    def correct(k: int) -> None:
        if br.read_bit():
            c = int(zz[k])
            if (c & p1) == 0:
                zz[k] = c + (p1 if c >= 0 else m1)

    k = ss
    eobrun = 0
    while k <= se:
        rs = _decode_huff(br, ac_tbl)
        r, s = rs >> 4, rs & 15
        newval = 0
        if s == 0:
            if r < 15:  # EOBn
                eobrun = (1 << r) + (br.receive(r) if r else 0)
                break
            # ZRL: advance past 16 zero-history coefficients
        else:
            if s != 1:
                raise ValueError("refinement scan coded a multi-bit coefficient")
            newval = p1 if br.read_bit() else m1
        while k <= se:
            if zz[k] != 0:
                correct(k)
            else:
                if r == 0:
                    break
                r -= 1
            k += 1
        if newval and k <= se:
            zz[k] = newval
        k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _find_next_marker(data: bytes, pos: int) -> int:
    """Skip pad bits / fill bytes after a scan: return the offset of the
    next real marker (0xFF followed by a non-zero, non-RST byte)."""
    i = pos
    while i + 1 < len(data):
        if data[i] == 0xFF and data[i + 1] not in (0x00,) and not (
            0xD0 <= data[i + 1] <= 0xD7
        ):
            return i
        i += 1
    raise ValueError("truncated stream: no marker after scan data")


# decompression-bomb guard: a flipped SOF dimension byte must not make
# a stats kernel allocate terabytes (65535x65535 coefficient arrays)
MAX_PIXELS = 1 << 26
# ...and a pixel cap alone is not enough: a 16-byte hostile SOF
# declaring 3 components at 4x4 sampling stays under MAX_PIXELS yet
# drives ~w*h int64 coefficient elements PER COMPONENT (several GB
# total) before any entropy data is validated.  Cap the SUMMED
# per-component block-grid allocation too: 2^27 int64 elements (1 GB
# worst-case transient per image) across all components.  Frames
# satisfy sum(elements) ~ w*h * sum(fh*fv)/(hmax*vmax) + MCU padding,
# so the EFFECTIVE per-layout ceilings under both caps are:
#
#   greyscale (ratio 1)      ~67 MP — MAX_PIXELS binds
#   4:2:0 colour (ratio 1.5) ~67 MP — MAX_PIXELS binds
#   4:2:2 colour (ratio 2)   ~67 MP — MAX_PIXELS binds (up to MCU
#                            border padding at the exact limit)
#   4:4:4 / any 3x-expansion ~44 MP — this cap binds (2^27/3 pixels);
#                            that includes the hostile 3x(4,4) header,
#                            which is allocation-identical to 4:4:4
#
# i.e. every common photographic layout decodes to the full pixel cap
# and only >=3x-expansion layouts above ~44 MP are rejected here.
#
# The 1 GB worst case is a deliberate envelope choice (it admits every
# photographic layout at the pixel limit), but with several decode
# tasks per executor the AGGREGATE hostile-header exposure is several
# GB — so the cap is CONFIGURABLE: hardened deployments that don't need
# >=22 MP 4:4:4 frames set QSS_JPEG_MAX_COEF_ELEMENTS=67108864 (2^26,
# 512 MB worst case) via spark.executorEnv / the driver environment.
MAX_COEF_ELEMENTS = 1 << 27


def _coef_element_cap() -> int:
    """The effective coefficient-grid allocation cap: the
    ``QSS_JPEG_MAX_COEF_ELEMENTS`` environment variable when set (read
    per decode so executors honor ``spark.executorEnv`` settings),
    else :data:`MAX_COEF_ELEMENTS`.  A malformed or non-positive value
    is a configuration error and fails HERE with the variable named —
    never as a per-row "malformed JPEG" rejection deep inside the
    kernel (ADVICE r10)."""
    raw = os.environ.get("QSS_JPEG_MAX_COEF_ELEMENTS")
    if raw is None or not raw.strip():
        return MAX_COEF_ELEMENTS
    try:
        cap = int(raw)
    except ValueError:
        raise ValueError(
            "QSS_JPEG_MAX_COEF_ELEMENTS must be a positive integer, "
            f"got {raw!r}"
        ) from None
    if cap <= 0:
        raise ValueError(
            "QSS_JPEG_MAX_COEF_ELEMENTS must be a positive integer, "
            f"got {raw!r} (0 or negative would reject every JPEG)"
        )
    return cap


def decode_jpeg_pixels(data: bytes) -> dict:
    """Full baseline OR progressive decode; returns ``{width, height,
    n_components, planes}`` where ``planes`` is a list of numpy int
    arrays at full image resolution (post-upsampling), in frame
    component order (Y/Cb/Cr or [Y]).  Raises ``ValueError`` on
    malformed payloads or frames outside the supported envelope —
    TOTALITY: arbitrary hostile bytes can only produce ``ValueError``,
    never an internal exception escaping the kernel
    (tests/test_codec_totality.py).

    Size envelope (decompression-bomb guards, see ``MAX_PIXELS`` /
    ``MAX_COEF_ELEMENTS``): greyscale, 4:2:0 and 4:2:2 frames decode
    up to ~67 MP; 4:4:4 (and any other 3x-expansion sampling layout)
    up to ~44 MP; worst-case transient allocation is 1 GB per image."""
    try:
        return _decode_jpeg_pixels(data)
    except (IndexError, ZeroDivisionError, OverflowError, MemoryError,
            struct.error) as e:
        raise ValueError(
            f"malformed JPEG: {type(e).__name__}: {e}"
        ) from e


def _decode_jpeg_pixels(data: bytes) -> dict:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    progressive = False
    restart_interval = 0
    arrays: dict[int, np.ndarray] = {}
    geom: dict = {}
    scans_done = 0
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > len(data):
            raise ValueError("truncated segment")
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(body):
                prec, tid = body[off] >> 4, body[off] & 15
                off += 1
                n = 64 * (2 if prec else 1)
                raw = body[off : off + n]
                if len(raw) != n:
                    raise ValueError("truncated DQT")
                if prec:
                    vals = np.frombuffer(raw, dtype=">u2").astype(np.int64)
                else:
                    vals = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = vals  # de-zigzag the stored table
                qt[tid] = tbl.reshape(8, 8)
                off += n
        elif marker == 0xC4:  # DHT (tables may be redefined between scans)
            off = 0
            while off < len(body):
                tclass, tid = body[off] >> 4, body[off] & 15
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                codes = _canonical_codes(bits, vals)
                huff[(tclass, tid)] = {
                    (ln, code): sym for sym, (ln, code) in codes.items()
                }
                off += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            if frame is not None:
                raise ValueError("multiple SOF markers")
            progressive = marker == 0xC2
            if len(body) < 6:
                raise ValueError("truncated SOF header")
            prec, h, w_, nf = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"only 8-bit frames supported, got {prec}")
            if not (1 <= nf <= 3):
                raise ValueError(f"unsupported component count {nf}")
            if len(body) < 6 + 3 * nf:
                raise ValueError("truncated SOF component list")
            if w_ == 0 or h == 0 or w_ * h > MAX_PIXELS:
                raise ValueError(f"frame dimensions {w_}x{h} out of bounds")
            comps = []
            for i in range(nf):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                fh, fv = hv >> 4, hv & 15
                if not (1 <= fh <= 4 and 1 <= fv <= 4):
                    raise ValueError(f"sampling factors {fh}x{fv} out of range")
                comps.append((cid, fh, fv, tq))
            frame = (h, w_, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus_x = (w_ + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
            geom = {"hmax": hmax, "vmax": vmax, "mcus_x": mcus_x, "mcus_y": mcus_y}
            coef_elements = sum(
                mcus_y * fv * mcus_x * fh * 64 for _, fh, fv, _ in comps
            )
            coef_cap = _coef_element_cap()
            if coef_elements > coef_cap:
                raise ValueError(
                    f"coefficient grid of {coef_elements} elements exceeds "
                    f"the allocation bound ({coef_cap})"
                )
            for cid, fh, fv, tq in comps:
                arrays[cid] = np.zeros(
                    (mcus_y * fv, mcus_x * fh, 64), dtype=np.int64
                )
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported SOF marker 0xFF{marker:02X}: only baseline "
                "sequential (SOF0) and progressive (SOF2) are implemented"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — decode one scan, resume marker walk
            if frame is None:
                raise ValueError("missing SOF0 or SOS: SOS before SOF")
            ns = body[0]
            if not (1 <= ns <= 4) or len(body) < 1 + 2 * ns + 3:
                raise ValueError("malformed SOS header")
            scan = []
            for i in range(ns):
                cid, tt = body[1 + 2 * i : 3 + 2 * i]
                scan.append((cid, tt >> 4, tt & 15))
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            pos = _decode_scan(
                data, pos + 2 + seglen, frame, geom, scan, ss, se, ah, al,
                arrays, qt, huff, restart_interval, progressive,
            )
            scans_done += 1
            continue
        # APPn/COM/others: skip
        pos = pos + 2 + seglen
    if frame is None or scans_done == 0:
        raise ValueError("missing SOF0 or SOS")

    height, width, comps = frame
    hmax, vmax = geom["hmax"], geom["vmax"]
    planes = []
    for cid, fh, fv, tq in comps:
        if tq not in qt:
            raise ValueError(f"component {cid} references undefined DQT {tq}")
        arr = arrays[cid]
        bh, bw = arr.shape[0], arr.shape[1]
        raster = np.zeros((bh, bw, 64), dtype=np.float64)
        raster[:, :, ZIGZAG] = arr  # inverse zigzag
        deq = raster.reshape(bh, bw, 8, 8) * qt[tq].astype(np.float64)
        spatial = np.matmul(np.matmul(_A.T, deq), _A) + 128.0
        spatial = np.clip(np.round(spatial), 0, 255).astype(np.int64)
        plane = spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        # crop to the component's true sample dims, replicate up to
        # full resolution, crop to image dims
        cw = (width * fh + hmax - 1) // hmax
        ch = (height * fv + vmax - 1) // vmax
        plane = plane[:ch, :cw]
        ry, rx = vmax // fv, hmax // fh
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:height, :width])

    return {
        "width": width,
        "height": height,
        "n_components": len(comps),
        "planes": planes,
    }


def _decode_scan(
    data, pos, frame, geom, scan, ss, se, ah, al,
    arrays, qt, huff, restart_interval, progressive,
) -> int:
    """Entropy-decode one scan into the coefficient arrays; returns the
    offset of the next marker after the scan's data."""
    height, width, comps = frame
    by_id = {c[0]: c for c in comps}
    order = []
    for cid, td, ta in scan:
        if cid not in by_id:
            raise ValueError(f"SOS references unknown component {cid}")
        _, fh, fv, tq = by_id[cid]
        order.append((cid, fh, fv, td, ta))

    # scan-header validation (T.81 B.2.3 / G.1.1.1.1)
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if ss > 0 and (len(order) != 1 or not (1 <= ss <= se <= 63)):
            raise ValueError("progressive AC scans must be single-component")
        if ah not in (0, al + 1):
            raise ValueError("successive approximation must refine one bit")
    else:
        if (ss, se, ah, al) != (0, 63, 0, 0):
            raise ValueError("baseline scan must cover Ss=0..Se=63, Ah=Al=0")

    hmax, vmax = geom["hmax"], geom["vmax"]
    if len(order) > 1:
        factors = [(fh, fv) for _, fh, fv, _, _ in order]
        units = _mcu_units(factors, geom["mcus_x"], geom["mcus_y"])
        unit_cids = [cid for cid, *_ in order]
        units = [
            [(unit_cids[ci], by, bx) for ci, by, bx in unit] for unit in units
        ]
    else:
        cid, fh, fv, _, _ = order[0]
        cw = (width * fh + hmax - 1) // hmax
        ch = (height * fv + vmax - 1) // vmax
        units = _comp_units(cid, (cw + 7) // 8, (ch + 7) // 8)

    tables = {}
    for cid, fh, fv, td, ta in order:
        dc_tbl = huff.get((0, td))
        ac_tbl = huff.get((1, ta))
        if ss == 0 and ah == 0 and dc_tbl is None:
            raise ValueError("scan references undefined Huffman table")
        if (se > 0 or not progressive) and ac_tbl is None:
            raise ValueError("scan references undefined Huffman table")
        tables[cid] = (dc_tbl, ac_tbl)

    br = _BitReader(data, pos)
    preds = {cid: 0 for cid, *_ in order}
    state = {"eobrun": 0}
    for ui, unit in enumerate(units):
        if restart_interval and ui and ui % restart_interval == 0:
            br.align_consume_rst()
            preds = {cid: 0 for cid, *_ in order}
            state["eobrun"] = 0
        for cid, by, bx in unit:
            zz = arrays[cid][by, bx]
            dc_tbl, ac_tbl = tables[cid]
            if ss == 0:
                if ah == 0:
                    t = _decode_huff(br, dc_tbl)
                    preds[cid] += _extend(br.receive(t), t)
                    zz[0] = preds[cid] << al
                else:
                    if br.read_bit():
                        zz[0] = int(zz[0]) | (1 << al)
            if se > 0:
                if ah == 0:
                    _dec_block_ac_first(
                        br, ac_tbl, zz, max(1, ss), se, al, state, progressive
                    )
                else:
                    if state["eobrun"] > 0:
                        state["eobrun"] -= 1
                        p1, m1 = 1 << al, -1 << al
                        for k in range(ss, se + 1):
                            if zz[k] != 0 and br.read_bit():
                                c = int(zz[k])
                                if (c & p1) == 0:
                                    zz[k] = c + (p1 if c >= 0 else m1)
                    else:
                        state["eobrun"] = _dec_block_ac_refine(
                            br, ac_tbl, zz, ss, se, al
                        )
    return _find_next_marker(data, br.pos)


def decode_jpeg(data: bytes) -> dict:
    """Decode a baseline or progressive JPEG to bounded statistics, same
    shape as :func:`quick_stream_spark.functions.png.decode_png`:
    ``{width, height, channels, n_pixels, channel_sums}``.  3-component
    payloads convert to RGB (JFIF transform) and report per-RGB-channel
    sums; grayscale reports the single luma sum.  Full pixel arrays
    never leave the kernel boundary."""
    info = decode_jpeg_pixels(data)
    planes = info["planes"]
    if info["n_components"] == 1:
        sums = [int(planes[0].sum())]
        channels = 1
    else:
        r, g, b = ycbcr_to_rgb(planes[0], planes[1], planes[2])
        sums = [int(r.sum()), int(g.sum()), int(b.sum())]
        channels = 3
    return {
        "width": info["width"],
        "height": info["height"],
        "channels": channels,
        "n_pixels": info["width"] * info["height"],
        "channel_sums": sums,
    }
