"""Pure-Python + numpy baseline JPEG codec (ITU-T T.81) — the REAL
JPEG-decode kernel behind ``decoder="real"`` in :mod:`multimodal`.

This container has no PIL, but baseline sequential JPEG needs only the
public spec: marker segment walk (SOI/APP0/DQT/SOF0/DHT/DRI/SOS/EOI),
canonical Huffman tables built from the file's own DHT segments,
entropy decode with 0xFF00 byte unstuffing and RSTn restart handling,
dequantization, inverse zigzag, a vectorized 8x8 IDCT (orthonormal
DCT-II basis, numpy matmul), chroma upsampling by sample replication,
and the JFIF YCbCr->RGB transform.  Supported: 8-bit baseline (SOF0),
1 or 3 components, any sampling factors h,v in {1,2} (4:4:4, 4:2:2,
4:2:0), restart intervals.  Progressive (SOF2) and 12-bit raise
``ValueError`` — the decoder is honest about its envelope.

The encoder writes the same subset (levels shift -> FDCT -> quantize ->
zigzag -> Huffman, with edge-replicate padding to MCU multiples and
2x2 box-average chroma downsampling for 4:2:0), so the decoder is
testable against real entropy-coded data it did not produce the
internal state for.  The decoder builds its Huffman tables from the
DHT segments in the payload — as the spec requires — so decode
correctness never depends on the encoder's table choice.

Exactness note for closed-form oracles: a solid-color 8x8 block has a
DC-only DCT (DC = 8*(v-128), all ACs zero); with the Annex K luma
quantizer (DC step 16) the DC survives quantization exactly whenever
v-128 is even, and the IDCT of a DC-only block is the exact constant
DC/8.  Oracle-gated queries therefore use per-block solid colors with
even offsets: the decoded pixels equal the generative formula with NO
float ambiguity, so a SQL oracle that never decodes can pin the whole
pipeline (see plans/text.py ``mm_jpeg_decode``).

Scale posture: per-payload kernels executed inside Arrow-batched
``mapInPandas`` stages — CPU-heavy, embarrassingly parallel, no
shuffle; cluster parallelism comes from partitioning, not the kernel.
"""

from __future__ import annotations

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


def _mag_bits(v: int) -> tuple[int, int]:
    """(category ssss, appended bits) for a DC diff / AC value."""
    if v == 0:
        return 0, 0
    ssss = int(v if v > 0 else -v).bit_length()
    bits = v if v >= 0 else v + (1 << ssss) - 1
    return ssss, bits


def _encode_block(
    w: _BitWriter,
    coefs: np.ndarray,
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    """Huffman-encode one quantized 8x8 block; returns the new DC
    predictor."""
    zz = coefs.reshape(64)[ZIGZAG]
    dc = int(zz[0])
    ssss, bits = _mag_bits(dc - pred)
    ln, code = dc_codes[ssss]
    w.write(code, ln)
    if ssss:
        w.write(bits, ssss)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if zz[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        ssss, bits = _mag_bits(v)
        ln, code = ac_codes[(run << 4) | ssss]
        w.write(code, ln)
        w.write(bits, ssss)
        run = 0
    if last_nz < 63:
        ln, code = ac_codes[0x00]  # EOB
        w.write(code, ln)
    return dc


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


_SAMPLING = {"444": ((1, 1), (1, 1)), "422": ((2, 1), (1, 1)), "420": ((2, 2), (1, 1))}


def encode_jpeg(
    width: int,
    height: int,
    pixel_fn,
    components: int = 3,
    subsampling: str = "444",
    restart_interval: int = 0,
    qtables: str = "standard",
) -> bytes:
    """Encode to a complete baseline JFIF payload.  ``pixel_fn(x, y)``
    returns an (r, g, b) tuple (``components=3``) or a single luma int
    (``components=1``).  ``qtables``: ``"standard"`` (Annex K) or
    ``"flat"`` (all ones — lossless through quantization, for
    round-trip tests)."""
    if components not in (1, 3):
        raise ValueError("components must be 1 or 3")
    if subsampling not in _SAMPLING:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
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

    comp_planes = []
    factors = [(hy, vy)] + [(hc, vc)] * (components - 1)
    quants = [q_luma] + [q_chroma] * (components - 1)
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
        comp_planes.append(p)

    dc_specs = [HUFF_DC_LUMA] + [HUFF_DC_CHROMA] * (components - 1)
    ac_specs = [HUFF_AC_LUMA] + [HUFF_AC_CHROMA] * (components - 1)
    dc_codes = [_canonical_codes(*s) for s in dc_specs[:2]]
    ac_codes = [_canonical_codes(*s) for s in ac_specs[:2]]

    w = _BitWriter()
    preds = [0] * components
    rst = 0
    for mi in range(mcus_y * mcus_x):
        if restart_interval and mi and mi % restart_interval == 0:
            w.pad_to_byte()
            w.out.extend(struct.pack(">H", 0xFFD0 + (rst & 7)))
            rst += 1
            preds = [0] * components
        my, mx = divmod(mi, mcus_x)
        for ci in range(components):
            fh, fv = factors[ci]
            for by in range(fv):
                for bx in range(fh):
                    r0 = (my * fv + by) * 8
                    c0 = (mx * fh + bx) * 8
                    block = comp_planes[ci][r0 : r0 + 8, c0 : c0 + 8].astype(
                        np.float64
                    )
                    s = _A @ (block - 128.0) @ _A.T
                    qz = np.round(s / quants[ci]).astype(np.int64)
                    preds[ci] = _encode_block(
                        w,
                        qz,
                        preds[ci],
                        dc_codes[min(ci, 1)],
                        ac_codes[min(ci, 1)],
                    )
    w.pad_to_byte()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(
        0xFFE0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0)
    )
    zz_luma = q_luma.reshape(64)[ZIGZAG]
    out += _seg(0xFFDB, bytes([0x00]) + bytes(int(v) for v in zz_luma))
    if components == 3:
        zz_chroma = q_chroma.reshape(64)[ZIGZAG]
        out += _seg(0xFFDB, bytes([0x01]) + bytes(int(v) for v in zz_chroma))
    sof = struct.pack(">BHHB", 8, height, width, components)
    for ci in range(components):
        fh, fv = factors[ci]
        sof += bytes([ci + 1, (fh << 4) | fv, 0 if ci == 0 else 1])
    out += _seg(0xFFC0, sof)
    for tclass, tid, (bits, vals) in (
        (0, 0, HUFF_DC_LUMA),
        (1, 0, HUFF_AC_LUMA),
        (0, 1, HUFF_DC_CHROMA),
        (1, 1, HUFF_AC_CHROMA),
    )[: 2 * min(components, 2)]:
        out += _seg(
            0xFFC4, bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
        )
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([components])
    for ci in range(components):
        tid = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += _seg(0xFFDA, sos)
    out += w.out
    out += b"\xff\xd9"  # EOI
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


def decode_jpeg_pixels(data: bytes) -> dict:
    """Full baseline decode; returns ``{width, height, n_components,
    planes}`` where ``planes`` is a list of numpy int arrays at full
    image resolution (post-upsampling), in Y/Cb/Cr order (or [Y]).
    Raises ``ValueError`` on malformed or non-baseline payloads."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    scan = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
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
        elif marker == 0xC4:  # DHT
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
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w_, nf = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"only 8-bit baseline supported, got {prec}")
            comps = []
            for i in range(nf):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w_, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported SOF marker 0xFF{marker:02X}: only baseline "
                "sequential (SOF0) is implemented"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for i in range(ns):
                cid, tt = body[1 + 2 * i : 3 + 2 * i]
                scan.append((cid, tt >> 4, tt & 15))
            pos = pos + 2 + seglen
            break
        # APPn/COM/others: skip
        pos = pos + 2 + seglen
    if frame is None or scan is None:
        raise ValueError("missing SOF0 or SOS")

    height, width, comps = frame
    if not (1 <= len(comps) <= 3):
        raise ValueError(f"unsupported component count {len(comps)}")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)

    by_id = {c[0]: c for c in comps}
    order = []
    for cid, td, ta in scan:
        if cid not in by_id:
            raise ValueError(f"SOS references unknown component {cid}")
        _, fh, fv, tq = by_id[cid]
        order.append((cid, fh, fv, tq, td, ta))

    br = _BitReader(data, pos)
    blocks: dict[int, list[np.ndarray]] = {cid: [] for cid, *_ in order}
    preds: dict[int, int] = {cid: 0 for cid, *_ in order}
    for mi in range(mcus_y * mcus_x):
        if restart_interval and mi and mi % restart_interval == 0:
            br.align_consume_rst()
            preds = {cid: 0 for cid, *_ in order}
        for cid, fh, fv, tq, td, ta in order:
            dc_tbl = huff.get((0, td))
            ac_tbl = huff.get((1, ta))
            if dc_tbl is None or ac_tbl is None:
                raise ValueError("scan references undefined Huffman table")
            for _ in range(fh * fv):
                zz = np.zeros(64, dtype=np.int64)
                t = _decode_huff(br, dc_tbl)
                preds[cid] += _extend(br.receive(t), t)
                zz[0] = preds[cid]
                k = 1
                while k <= 63:
                    rs = _decode_huff(br, ac_tbl)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("AC run past end of block")
                    zz[k] = _extend(br.receive(s), s)
                    k += 1
                raster = np.zeros(64, dtype=np.int64)
                raster[ZIGZAG] = zz
                blocks[cid].append(raster.reshape(8, 8))

    planes = []
    for cid, fh, fv, tq, td, ta in order:
        if tq not in qt:
            raise ValueError(f"component {cid} references undefined DQT {tq}")
        arr = np.stack(blocks[cid]).astype(np.float64) * qt[tq].astype(
            np.float64
        )
        spatial = np.matmul(np.matmul(_A.T, arr), _A) + 128.0
        spatial = np.clip(np.round(spatial), 0, 255).astype(np.int64)
        bw, bh = mcus_x * fh, mcus_y * fv  # plane size in blocks
        plane = np.zeros((bh * 8, bw * 8), dtype=np.int64)
        i = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for by in range(fv):
                    for bx in range(fh):
                        r0 = (my * fv + by) * 8
                        c0 = (mx * fh + bx) * 8
                        plane[r0 : r0 + 8, c0 : c0 + 8] = spatial[i]
                        i += 1
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
        "n_components": len(order),
        "planes": planes,
    }


def decode_jpeg(data: bytes) -> dict:
    """Decode a baseline JPEG to bounded statistics, same shape as
    :func:`quick_stream_spark.functions.png.decode_png`: ``{width,
    height, channels, n_pixels, channel_sums}``.  3-component payloads
    convert to RGB (JFIF transform) and report per-RGB-channel sums;
    grayscale reports the single luma sum.  Full pixel arrays never
    leave the kernel boundary."""
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
