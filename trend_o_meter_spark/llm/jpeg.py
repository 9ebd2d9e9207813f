"""Dependency-free baseline JPEG (JFIF) codec — the last real-image gap
in the multimodal pipeline (a real corpus is majority-JPEG; the other
shipped codecs — BMP/PPM/PNG/WAV/AVI in :mod:`.codecs` — already decode
for real).

Everything here is the public specification:

* **ITU-T T.81 / ISO-IEC 10918-1** — baseline sequential DCT process:
  marker segments (§B), Huffman entropy coding (§C/§F), the EXTEND sign
  recovery (F.2.2.1), byte stuffing (F.1.2.3), restart intervals
  (F.2.2.5), and the Annex-K example quantization + Huffman tables
  (K.1/K.3) that every mainstream encoder ships.
* **T.81 Annex G** — the progressive DCT process (SOF2): spectral
  selection, successive approximation (point transforms, refinement
  correction bits), EOB runs, and non-interleaved per-component scan
  geometry (§A.2.2).  A scrape-derived corpus is typically 10-30%
  progressive, so this is decode-critical, not optional.
* **JFIF 1.02** (ITU-T T.871) — the APP0 wrapper, YCbCr <-> RGB
  matrices (BT.601 full-range), and centered chroma subsampling.

Scope (mirrors the repo's codec discipline — do the real formats for
real, fail LOUDLY on the rest): baseline sequential (SOF0; SOF1 decodes
the same way; interleaved or per-component multi-scan) and progressive
(SOF2), 8-bit samples, 1 or 3 components, sampling factors 1-2 per axis
(4:4:4 / 4:2:2 / 4:2:0), restart markers.  Arithmetic coding,
hierarchical, lossless, and 12-bit precision raise
``NotImplementedError`` rather than decode wrongly.

Every scan accumulates quantized coefficients; dequantization and the
inverse DCT run once after all scans, so the baseline path's output is
bit-identical to the single-pass decoder this architecture replaced.
The progressive encoder (:func:`encode_jpeg_progressive`) shares the
baseline's DCT/quantization front half and the libjpeg standard scan
script shape, which makes ``decode(progressive) == decode(baseline)``
an EXACT pixel equality (both entropy processes are lossless over the
same coefficients) — the round-trip test contract.

The 2-D DCT-II/III pair is computed as exact orthonormal matrix
products (``M @ B @ M.T``) in float64 — deterministic on a given
platform, no fixed-point approximation to drift between encoder and
decoder.  The decoder is validated two independent ways in
``tests/test_multimodal.py``: encoder round-trips (tolerance-bounded,
exact for flat blocks) and a HAND-ASSEMBLED spec test vector (unit
quant table, explicit Huffman codes) whose expected pixels follow
analytically from the DC-only inverse DCT.

Reference parity note: the reference engine (trend-o-meter) has no
media path at all; this module exists so the repo's own multimodal
operators (:mod:`.multimodal`) run real decode at 100 TB corpus scale,
where payloads are opaque ``binary`` columns and decode runs inside
Arrow-batched ``mapInPandas``.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "encode_jpeg_progressive", "decode_jpeg"]

# ---------------------------------------------------------------- tables --

# Zig-zag scan order (T.81 Figure 5): ZIGZAG[k] = row-major index of the
# k-th coefficient in scan order.
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1 example quantization tables (row-major).
_Q_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_Q_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 example Huffman tables: (BITS[1..16], HUFFVAL).
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
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
_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
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

# Orthonormal 8x8 DCT-II basis: M[u, x] = c(u)/2 * cos((2x+1) u pi / 16),
# c(0) = 1/sqrt(2), else 1.  Forward DCT = M @ B @ M.T, inverse = M.T @ C @ M.
_DCT_M = np.zeros((8, 8), dtype=np.float64)
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _DCT_M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
del _u, _x, _c


def _build_huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """T.81 §C.2: canonical code assignment.  Returns
    ``{symbol: (code, length)}``."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_LUT_MEMO: dict[tuple, tuple[list[int], list[int]]] = {}
# the four Annex-K example tables: always memo-admitted (see below)
_K_TABLE_KEYS = {
    (tuple(b), tuple(v)) for b, v in (_DC_LUM, _DC_CHROM, _AC_LUM, _AC_CHROM)
}


def _build_huffman_decoder(bits: list[int], vals: list[int]) -> tuple[list[int], list[int]]:
    """Flat 16-bit lookup: ``(lengths, symbols)`` lists of 65,536
    entries — every 16-bit window whose prefix is a code maps to that
    code's (length, symbol); length 0 marks an invalid prefix.  One
    list probe per symbol replaces the old bit-serial walk (plain
    Python lists: scalar indexing beats numpy here, the measured
    codec-family rule)."""
    key = (tuple(bits), tuple(vals))
    hit = _LUT_MEMO.get(key)
    if hit is not None:
        return hit
    lengths = np.zeros(1 << 16, dtype=np.uint8)
    symbols = np.zeros(1 << 16, dtype=np.uint8)
    for sym, (code, ln) in _build_huffman_codes(bits, vals).items():
        lo = code << (16 - ln)
        hi = lo + (1 << (16 - ln))
        lengths[lo:hi] = ln
        symbols[lo:hi] = sym
    lut = (lengths.tolist(), symbols.tolist())
    # memoized: the fixed Annex-K tables arrive on essentially every
    # non-optimize_coding file, and corpus decode pays the 2x64K build
    # per image otherwise.  CAPPED at 8 (ADVICE r09: each entry is two
    # 65,536-long Python lists, ~1 MB — the old cap of 64 set a
    # non-obvious ~64 MB memory floor per executor Python worker on
    # optimized-coding corpora; worst case 8 capped + 4 always-admitted K tables = ~12 MB): mozjpeg/
    # jpegtran per-image tables past the cap build uncached, while the
    # four K tables are ALWAYS admitted so a memo pre-filled by an
    # optimized-coding prefix can't evict the hot path.
    if key in _K_TABLE_KEYS or len(_LUT_MEMO) < 8:
        _LUT_MEMO[key] = lut
    return lut


def _scaled_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 5000/q below 50, 200-2q above, clamped to
    [1, 255] (8-bit table entries)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (base * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int64)


# --------------------------------------------------------------- encoder --


class _BitWriter:
    """MSB-first bit accumulator with T.81 F.1.2.3 byte stuffing
    (a 0x00 after every emitted 0xFF)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self._n -= 8
            self._acc &= (1 << self._n) - 1

    def pad_to_byte(self) -> None:
        if self._n:
            self.write(0x7F, 8 - self._n)  # 1-fill (F.1.2.3)


def _magnitude(v: int) -> tuple[int, int]:
    """(category ssss, appended-bits value) for a DC diff / AC coeff —
    negative values use the one's-complement encoding (F.1.4.1)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    ssss = a.bit_length()
    bits = v if v > 0 else v + (1 << ssss) - 1
    return ssss, bits


def _encode_blocks(
    bw: _BitWriter,
    blocks: np.ndarray,
    qtab: np.ndarray,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    pred: int,
) -> int:
    """Quantize + entropy-code a stack of (n, 8, 8) spatial blocks;
    returns the updated DC predictor."""
    for blk in blocks:
        coef = _DCT_M @ (blk - 128.0) @ _DCT_M.T
        qz = np.rint(coef.reshape(64) / qtab).astype(np.int64)[ZIGZAG]
        diff = int(qz[0]) - pred
        pred = int(qz[0])
        ssss, bits = _magnitude(diff)
        code, ln = dc_codes[ssss]
        bw.write(code, ln)
        if ssss:
            bw.write(bits, ssss)
        run = 0
        nz = np.nonzero(qz[1:])[0]
        last = int(nz[-1]) + 1 if nz.size else 0
        for k in range(1, last + 1):
            v = int(qz[k])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, ln = ac_codes[0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
            ssss, bits = _magnitude(v)
            code, ln = ac_codes[(run << 4) | ssss]
            bw.write(code, ln)
            bw.write(bits, ssss)
            run = 0
        if last < 63:
            code, ln = ac_codes[0x00]  # EOB
            bw.write(code, ln)
    return pred


def _plane_blocks(plane: np.ndarray, by: int, bx: int) -> np.ndarray:
    """8x8 block at block coordinates (by, bx) of an edge-padded plane."""
    return plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]


def _pad_edge(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mh
    pw = (-w) % mw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


_SUBSAMPLING = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}


def _subsample_planes(
    yy: np.ndarray, cb: np.ndarray, cr: np.ndarray, subh: int, subv: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Box-average chroma by (subh, subv), MCU-pad all three planes —
    shared front half of both entropy processes."""

    def box(p: np.ndarray) -> np.ndarray:
        p = _pad_edge(p, subv, subh)
        if subh == 2 and subv == 2:
            p = (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
        elif subh == 2:
            p = (p[:, 0::2] + p[:, 1::2]) / 2.0
        return _pad_edge(p, 8, 8)

    return _pad_edge(yy, 8 * subv, 8 * subh), box(cb), box(cr)


def _encode_front(
    arr: np.ndarray, quality: int, subsampling: str
) -> tuple[int, int, int, int, np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Shared encoder front half: validation, BT.601 full-range color
    transform, chroma subsampling, quality-scaled Annex-K tables —
    BOTH entropy processes must take exactly this path or the
    decode(progressive) == decode(baseline) exactness contract drifts.
    Returns ``(h, w, subh, subv, qy, qc, ypl, cbs, crs)``."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got shape {arr.shape}")
    h, w, _ = arr.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if subsampling not in _SUBSAMPLING:
        raise ValueError(
            f"subsampling {subsampling!r} unsupported ('444'/'422'/'420')"
        )
    subh, subv = _SUBSAMPLING[subsampling]
    rgb = arr.astype(np.float64)
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    yy = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    qy = _scaled_qtable(_Q_LUM, quality)
    qc = _scaled_qtable(_Q_CHROM, quality)
    ypl, cbs, crs = _subsample_planes(yy, cb, cr, subh, subv)
    return h, w, subh, subv, qy, qc, ypl, cbs, crs


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def _dht_body(tc: int, th: int, table: tuple[list[int], list[int]]) -> bytes:
    bits, vals = table
    return bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)


def _header_segments(
    h: int, w: int, subh: int, subv: int, qy: np.ndarray, qc: np.ndarray, sof_marker: int
) -> bytearray:
    """SOI + APP0 + DQTs + SOF + the four Annex-K DHTs — identical
    for both entropy processes except the SOF marker."""
    out = bytearray()
    out += struct.pack(">H", 0xFFD8)  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, b"\x00" + bytes(qy[ZIGZAG].tolist()))
    out += _seg(0xFFDB, b"\x01" + bytes(qc[ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, (subh << 4) | subv, 0])  # Y
    sof += bytes([2, 0x11, 1])  # Cb
    sof += bytes([3, 0x11, 1])  # Cr
    out += _seg(sof_marker, sof)
    out += _seg(0xFFC4, _dht_body(0, 0, _DC_LUM))
    out += _seg(0xFFC4, _dht_body(1, 0, _AC_LUM))
    out += _seg(0xFFC4, _dht_body(0, 1, _DC_CHROM))
    out += _seg(0xFFC4, _dht_body(1, 1, _AC_CHROM))
    return out


def encode_jpeg(
    arr: np.ndarray,
    *,
    quality: int = 85,
    subsampling: str = "420",
    restart_interval: int = 0,
) -> bytes:
    """RGB (h, w, 3) uint8 -> baseline JFIF bytes.

    Deterministic: Annex-K tables at the given IJG quality scaling,
    fixed Huffman tables, one interleaved scan, no optional markers
    beyond APP0.  ``subsampling``: ``'444'`` (no chroma subsampling),
    ``'422'`` (2x1 horizontally box-averaged chroma), or ``'420'``
    (2x2, the ubiquitous choice).  ``restart_interval`` > 0 emits a DRI
    segment and RSTn markers every that many MCUs (T.81 F.2.2.5) — the
    decode path a chunked/parallel producer exercises.
    """
    h, w, subh, subv, qy, qc, ypl, cbs, crs = _encode_front(
        arr, quality, subsampling
    )

    dc_l = _build_huffman_codes(*_DC_LUM)
    ac_l = _build_huffman_codes(*_AC_LUM)
    dc_c = _build_huffman_codes(*_DC_CHROM)
    ac_c = _build_huffman_codes(*_AC_CHROM)

    bw = _BitWriter()
    pred_y = pred_cb = pred_cr = 0
    mcus_y = ypl.shape[0] // (8 * subv)
    mcus_x = ypl.shape[1] // (8 * subh)
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.pad_to_byte()
                bw.out += struct.pack(">H", 0xFFD0 + rst)
                rst = (rst + 1) % 8
                pred_y = pred_cb = pred_cr = 0
            mcu_count += 1
            yblocks = [
                _plane_blocks(ypl, my * subv + dy, mx * subh + dx)
                for dy in range(subv)
                for dx in range(subh)
            ]
            pred_y = _encode_blocks(bw, np.stack(yblocks), qy, dc_l, ac_l, pred_y)
            pred_cb = _encode_blocks(
                bw, _plane_blocks(cbs, my, mx)[None], qc, dc_c, ac_c, pred_cb
            )
            pred_cr = _encode_blocks(
                bw, _plane_blocks(crs, my, mx)[None], qc, dc_c, ac_c, pred_cr
            )
    bw.pad_to_byte()

    out = _header_segments(h, w, subh, subv, qy, qc, 0xFFC0)
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += _seg(0xFFDA, sos)
    out += bw.out
    out += struct.pack(">H", 0xFFD9)  # EOI
    return bytes(out)


# -------------------------------------------------- progressive encoder --


def _blockify(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """Forward DCT + quantize an edge-padded plane into an
    (nby, nbx, 64) array of zig-zag-ordered quantized coefficients —
    the shared front half of both entropy processes."""
    nby, nbx = plane.shape[0] // 8, plane.shape[1] // 8
    out = np.zeros((nby, nbx, 64), dtype=np.int64)
    for by in range(nby):
        for bx in range(nbx):
            blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coef = _DCT_M @ (blk - 128.0) @ _DCT_M.T
            out[by, bx] = np.rint(coef.reshape(64) / qtab).astype(np.int64)[ZIGZAG]
    return out


class _RestartEmitter:
    """Per-scan RSTn cadence (F.2.2.5): pad to the byte boundary and
    emit the cycling restart marker every ``ri`` data units; the caller
    resets its predictors when ``tick`` returns True."""

    def __init__(self, bw: _BitWriter, ri: int) -> None:
        self.bw = bw
        self.ri = ri
        self.count = 0
        self.rst = 0

    def tick(self) -> bool:
        fire = bool(self.ri) and self.count > 0 and self.count % self.ri == 0
        if fire:
            self.bw.pad_to_byte()
            self.bw.out += struct.pack(">H", 0xFFD0 + self.rst)
            self.rst = (self.rst + 1) % 8
        self.count += 1
        return fire


def _enc_dc_scan(
    bw: _BitWriter,
    scan_comps: list[dict],
    mcus_y: int,
    mcus_x: int,
    ah: int,
    al: int,
    dc_codes: dict[int, dict[int, tuple[int, int]]],
    restart_interval: int = 0,
) -> None:
    """Progressive DC scan (G.1.2.1): first pass Huffman-codes diffs of
    the arithmetic-shifted DC; a refinement pass emits one raw bit (bit
    Al of the two's-complement DC) per block.  Interleaved when the
    scan has several components (MCU order over the padded grid);
    single-component scans walk the component's own block grid."""
    preds = {c["id"]: 0 for c in scan_comps}
    rst = _RestartEmitter(bw, restart_interval)

    def one(c: dict, by: int, bx: int) -> None:
        dc = int(c["coef"][by, bx, 0])
        if ah == 0:
            t = dc >> al  # arithmetic shift: floor, matches G.1.2.1
            diff = t - preds[c["id"]]
            preds[c["id"]] = t
            ssss, bits = _magnitude(diff)
            code, ln = dc_codes[c["id"]][ssss]
            bw.write(code, ln)
            if ssss:
                bw.write(bits, ssss)
        else:
            bw.write((dc >> al) & 1, 1)

    def unit_start() -> None:
        if rst.tick():
            for cid in preds:
                preds[cid] = 0

    if len(scan_comps) == 1:
        c = scan_comps[0]
        for by in range(c["bh"]):
            for bx in range(c["bw"]):
                unit_start()
                one(c, by, bx)
    else:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                unit_start()
                for c in scan_comps:
                    for dy in range(c["v"]):
                        for dx in range(c["h"]):
                            one(c, my * c["v"] + dy, mx * c["h"] + dx)


def _enc_ac_first_scan(
    bw: _BitWriter,
    c: dict,
    ss: int,
    se: int,
    al: int,
    ac_codes: dict[int, tuple[int, int]],
    restart_interval: int = 0,
) -> None:
    """Progressive AC first scan (G.1.2.2) over one component's band,
    point transform = magnitude shift toward zero.  EOB runs are capped
    at one block (symbol 0x00) so the Annex-K tables — which lack the
    EOBn composites — suffice; the decoder's longer-run path is pinned
    by a hand-assembled vector with a custom table instead."""
    rst = _RestartEmitter(bw, restart_interval)
    for by in range(c["bh"]):
        for bx in range(c["bw"]):
            rst.tick()
            band = c["coef"][by, bx, ss : se + 1]
            run = 0
            for v in band:
                a = int(abs(v)) >> al
                if a == 0:
                    run += 1
                    continue
                while run >= 16:
                    code, ln = ac_codes[0xF0]
                    bw.write(code, ln)
                    run -= 16
                v2 = a if v > 0 else -a
                ssss, bits = _magnitude(v2)
                code, ln = ac_codes[(run << 4) | ssss]
                bw.write(code, ln)
                bw.write(bits, ssss)
                run = 0
            if run > 0:
                code, ln = ac_codes[0x00]  # EOB (run of exactly 1 block)
                bw.write(code, ln)


def _enc_ac_refine_scan(
    bw: _BitWriter,
    c: dict,
    ss: int,
    se: int,
    al: int,
    ac_codes: dict[int, tuple[int, int]],
    restart_interval: int = 0,
) -> None:
    """Progressive AC refinement (G.1.2.3) over one component's band.
    Correction bits for already-nonzero coefficients are BUFFERED and
    flushed after the next emitted symbol, exactly mirroring where the
    decoder's advance loop consumes them; the ZRL check runs at EVERY
    nonzero coefficient (not just newly significant ones) — folding it
    into the significant-only path desyncs the correction-bit order.
    EOB runs capped at one block, as in the first pass."""
    rst = _RestartEmitter(bw, restart_interval)
    for by in range(c["bh"]):
        for bx in range(c["bw"]):
            rst.tick()
            band = c["coef"][by, bx, ss : se + 1]
            absvals = [int(abs(v)) >> al for v in band]
            eob = 0  # index AFTER the last newly-significant coefficient
            for i, a in enumerate(absvals):
                if a == 1:
                    eob = i + 1
            run = 0
            pending: list[int] = []
            for i in range(eob):
                a = absvals[i]
                if a == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]
                    bw.write(code, ln)
                    run -= 16
                    for bit in pending:
                        bw.write(bit, 1)
                    pending = []
                if a > 1:  # history coefficient: buffer its correction bit
                    pending.append(a & 1)
                    continue
                code, ln = ac_codes[(run << 4) | 1]
                bw.write(code, ln)
                bw.write(1 if band[i] > 0 else 0, 1)
                for bit in pending:
                    bw.write(bit, 1)
                pending = []
                run = 0
            if eob < len(band):
                for i in range(eob, len(band)):
                    if absvals[i]:
                        pending.append(absvals[i] & 1)
                code, ln = ac_codes[0x00]  # EOB: decoder reads the tail bits
                bw.write(code, ln)
                for bit in pending:
                    bw.write(bit, 1)


def encode_jpeg_progressive(
    arr: np.ndarray,
    *,
    quality: int = 85,
    subsampling: str = "420",
    restart_interval: int = 0,
) -> bytes:
    """RGB (h, w, 3) uint8 -> PROGRESSIVE (SOF2) JFIF bytes.

    Identical color transform, subsampling, DCT, and quantization as
    :func:`encode_jpeg` — only the entropy process differs — so
    ``decode_jpeg(encode_jpeg_progressive(img))`` must equal
    ``decode_jpeg(encode_jpeg(img))`` EXACTLY (both streams carry the
    same quantized coefficients losslessly; test-pinned).  The scan
    script is the libjpeg standard shape: shifted DC, Y band splits,
    full-band chroma, then one-bit successive-approximation refinements
    (DC raw-bit scan included), exercising every progressive decode
    path except multi-block EOB runs (hand-vector-pinned separately).
    ``subsampling``: '444'/'422'/'420'; ``restart_interval`` > 0 emits
    DRI + per-scan RSTn markers every that many data units (blocks for
    non-interleaved scans, MCUs for the interleaved DC scan).
    """
    h, w, subh, subv, qy, qc, ypl, cbs, crs = _encode_front(
        arr, quality, subsampling
    )
    mcus_y = ypl.shape[0] // (8 * subv)
    mcus_x = ypl.shape[1] // (8 * subh)
    # per-component data-unit grids for non-interleaved scans (A.2.2)
    comps = [
        {
            "id": 1, "h": subh, "v": subv, "tq": 0, "coef": _blockify(ypl, qy),
            "bh": -(-h // 8), "bw": -(-w // 8),
        },
        {
            "id": 2, "h": 1, "v": 1, "tq": 1, "coef": _blockify(cbs, qc),
            "bh": -(-(-(-h // subv)) // 8), "bw": -(-(-(-w // subh)) // 8),
        },
        {
            "id": 3, "h": 1, "v": 1, "tq": 1, "coef": _blockify(crs, qc),
            "bh": -(-(-(-h // subv)) // 8), "bw": -(-(-(-w // subh)) // 8),
        },
    ]
    dc_codes = {
        1: _build_huffman_codes(*_DC_LUM),
        2: _build_huffman_codes(*_DC_CHROM),
        3: _build_huffman_codes(*_DC_CHROM),
    }
    ac_codes = {
        1: _build_huffman_codes(*_AC_LUM),
        2: _build_huffman_codes(*_AC_CHROM),
        3: _build_huffman_codes(*_AC_CHROM),
    }
    dc_tno = {1: 0, 2: 1, 3: 1}
    ac_tno = {1: 0, 2: 1, 3: 1}

    out = _header_segments(h, w, subh, subv, qy, qc, 0xFFC2)  # SOF2
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))

    # libjpeg's standard script shape: (comp ids, Ss, Se, Ah, Al)
    script = [
        ((1, 2, 3), 0, 0, 0, 1),   # DC, one bit held back
        ((1,), 1, 5, 0, 2),        # Y low band
        ((3,), 1, 63, 0, 1),       # Cr full band
        ((2,), 1, 63, 0, 1),       # Cb full band
        ((1,), 6, 63, 0, 2),       # Y high band
        ((1,), 1, 63, 2, 1),       # Y refine bit 1
        ((1, 2, 3), 0, 0, 1, 0),   # DC refine (raw bits)
        ((3,), 1, 63, 1, 0),       # Cr refine bit 0
        ((2,), 1, 63, 1, 0),       # Cb refine bit 0
        ((1,), 1, 63, 1, 0),       # Y refine bit 0
    ]
    by_id = {c["id"]: c for c in comps}
    for ids, ss, se, ah, al in script:
        scan_comps = [by_id[i] for i in ids]
        sos = bytes([len(ids)])
        for i in ids:
            td = dc_tno[i] if ss == 0 and ah == 0 else 0
            ta = ac_tno[i] if ss > 0 else 0
            sos += bytes([i, (td << 4) | ta])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xFFDA, sos)
        bw = _BitWriter()
        if ss == 0:
            _enc_dc_scan(
                bw, scan_comps, mcus_y, mcus_x, ah, al, dc_codes,
                restart_interval=restart_interval,
            )
        elif ah == 0:
            _enc_ac_first_scan(
                bw, scan_comps[0], ss, se, al, ac_codes[ids[0]],
                restart_interval=restart_interval,
            )
        else:
            _enc_ac_refine_scan(
                bw, scan_comps[0], ss, se, al, ac_codes[ids[0]],
                restart_interval=restart_interval,
            )
        bw.pad_to_byte()
        out += bw.out
    out += struct.pack(">H", 0xFFD9)
    return bytes(out)


# --------------------------------------------------------------- decoder --


class _BitReader:
    """MSB-first bit reader over entropy-coded data with byte
    unstuffing; stops at any non-RST marker (F.2.2.5).

    Keeps a <=32-bit look-ahead window so the Huffman decode is one
    table probe on the next 16 bits instead of up-to-16 bit-serial dict
    probes (the ADVICE r08 table-driven upgrade; ~4x measured on the
    whole decode).  Refill stops AT a marker, so a symbol requested
    past the scan's data surfaces as 'truncated' — never a silent read
    into marker bytes."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        acc = self._acc & ((1 << self._n) - 1)  # drop consumed high bits
        n = self.pos
        data = self.data
        ln = len(data)
        bits = self._n
        while bits <= 24 and n < ln:
            byte = data[n]
            if byte == 0xFF:
                nxt = data[n + 1] if n + 1 < ln else None
                if nxt == 0x00:
                    n += 2  # stuffed literal 0xFF
                else:
                    break  # marker: scan data ends here
            else:
                n += 1
            acc = (acc << 8) | byte
            bits += 8
        self.pos = n
        self._acc = acc
        self._n = bits

    def read_bit(self) -> int:
        if self._n == 0:
            self._fill()
            if self._n == 0:
                raise ValueError("JPEG entropy data truncated")
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self._n < n:
            self._fill()
            if self._n < n:
                raise ValueError("JPEG entropy data truncated")
        self._n -= n
        return (self._acc >> self._n) & ((1 << n) - 1)

    def peek16(self) -> int:
        """Next 16 bits MSB-first, zero-padded past the scan's end (the
        padding can only be reached by an invalid stream — consume()
        still guards the real bit count)."""
        if self._n < 16:
            self._fill()
            if self._n < 16:
                return (self._acc << (16 - self._n)) & 0xFFFF
        return (self._acc >> (self._n - 16)) & 0xFFFF

    def consume(self, n: int) -> None:
        if self._n < n:
            raise ValueError("JPEG entropy data truncated")
        self._n -= n

    def align_restart(self) -> None:
        """Byte-align and consume one RSTn marker (F.2.2.5)."""
        self._acc = 0
        self._n = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise ValueError("JPEG restart marker expected and missing")


def _extend(v: int, t: int) -> int:
    """EXTEND (T.81 F.2.2.1): recover the signed value from t appended
    bits."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _decode_huffman(br: _BitReader, table: tuple[list[int], list[int]]) -> int:
    idx = br.peek16()
    ln = table[0][idx]
    if ln == 0:
        # ADVICE r09: after peek16's fill, fewer than 16 buffered bits
        # means the scan data is exhausted and the window is zero-padded
        # — report truncation, not a (misleading) invalid code
        if br._n < 16:
            raise ValueError("JPEG entropy data truncated")
        raise ValueError("invalid JPEG Huffman code")
    br.consume(ln)
    return table[1][idx]


def _decode_block_coefs(
    br: _BitReader,
    dc_tab: tuple[list[int], list[int]],
    ac_tab: tuple[list[int], list[int]],
    blk: np.ndarray,
    pred: int,
) -> int:
    """One baseline 8x8 block into ``blk`` (len-64 zig-zag quantized
    coefficients); returns the new DC predictor."""
    t = _decode_huffman(br, dc_tab)
    diff = _extend(br.read_bits(t), t) if t else 0
    pred += diff
    blk[0] = pred
    k = 1
    while k < 64:
        rs = _decode_huffman(br, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC run overflows the block")
        blk[k] = _extend(br.read_bits(s), s)
        k += 1
    return pred


def _decode_dc_prog(
    br: _BitReader,
    dc_tab: tuple[list[int], list[int]] | None,
    blk: np.ndarray,
    pred: int,
    ah: int,
    al: int,
) -> int:
    """Progressive DC data unit (T.81 G.2): first scan (Ah=0) decodes a
    point-transformed diff and stores it shifted; a refinement scan
    (Ah>0) reads one raw bit and ORs it into bit Al (two's-complement OR
    recovers negative magnitudes exactly — e.g. -4 | 1 == -3)."""
    if ah == 0:
        t = _decode_huffman(br, dc_tab)
        diff = _extend(br.read_bits(t), t) if t else 0
        pred += diff
        blk[0] = pred << al
    elif br.read_bit():
        blk[0] |= 1 << al
    return pred

def _decode_ac_first(
    br: _BitReader,
    ac_tab: tuple[list[int], list[int]],
    blk: np.ndarray,
    ss: int,
    se: int,
    al: int,
    state: dict,
) -> None:
    """Progressive AC first scan for one block's band (T.81 G.1.2.2):
    run/size coding with EOBRUN block skipping; new coefficients land
    shifted left by the point transform Al."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _decode_huffman(br, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zero coefficients
                k += 16
                continue
            # EOBn: this block's band is done plus 2^r - 1 + bits more
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += br.read_bits(r)
            return
        k += r
        if k > se:
            raise ValueError("JPEG AC run overflows the spectral band")
        blk[k] = _extend(br.read_bits(s), s) << al
        k += 1

def _decode_ac_refine(
    br: _BitReader,
    ac_tab: tuple[list[int], list[int]],
    blk: np.ndarray,
    ss: int,
    se: int,
    al: int,
    state: dict,
) -> None:
    """Progressive AC refinement for one block's band (T.81 G.1.2.3):
    newly significant coefficients arrive as ±2^Al; every already-
    nonzero coefficient passed over (including the post-EOB tail)
    consumes one correction bit that may strengthen its magnitude by
    2^Al.  The bit-Al test (``blk[k] & p1``) is two's-complement-exact
    for negatives because history magnitudes entering this pass are
    multiples of 2^(Al+1)."""
    p1 = 1 << al
    m1 = -p1
    # the advance loops touch every band position — plain-int list ops
    # beat numpy scalar indexing ~7x (the measured codec-family rule)
    vals = blk[ss : se + 1].tolist()
    n = len(vals)
    k = 0
    if state["eobrun"] == 0:
        while k < n:
            rs = _decode_huffman(br, ac_tab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:  # EOBn: tail handled below, then run blocks
                    state["eobrun"] = (1 << r)
                    if r:
                        state["eobrun"] += br.read_bits(r)
                    break
                # r == 15 (ZRL): skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("JPEG refinement magnitude must be 1")
                val = p1 if br.read_bit() else m1
            while k < n:
                v = vals[k]
                if v != 0:
                    if br.read_bit() and (v & p1) == 0:
                        vals[k] = v + (p1 if v > 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k < n:
                vals[k] = val
            k += 1
    if state["eobrun"] > 0:
        # post-EOB tail of THIS block (and entire bands of the blocks
        # the run subsequently skips): correction bits only
        while k < n:
            v = vals[k]
            if v != 0 and br.read_bit() and (v & p1) == 0:
                vals[k] = v + (p1 if v > 0 else m1)
            k += 1
        state["eobrun"] -= 1
    blk[ss : se + 1] = vals

def _read_u16(data: bytes, pos: int) -> int:
    return struct.unpack_from(">H", data, pos)[0]


def decode_jpeg(data: bytes) -> np.ndarray:
    """JFIF bytes -> RGB (h, w, 3) uint8.

    Accepts baseline sequential (SOF0; SOF1 decodes the same way) —
    interleaved or per-component multi-scan — and PROGRESSIVE (SOF2)
    with spectral selection, successive approximation, and EOB runs
    (T.81 Annex G).  8-bit, 1 or 3 components, per-axis sampling
    factors 1-2, restart intervals.  Every scan accumulates quantized
    coefficients; dequantization + inverse DCT run once at the end, so
    baseline output is bit-identical to the single-pass decoder this
    replaced.  Chroma upsampling is sample replication (nearest), the
    deterministic dependency-free kernel used across this codec family.
    Arithmetic coding / hierarchical / lossless / 12-bit fail loudly."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], tuple[list[int], list[int]]] = {}
    frame: dict | None = None
    coefs: dict[int, np.ndarray] = {}
    restart_interval = 0
    n_scans = 0
    used_tq: set[int] = set()
    scanned: set[int] = set()
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        # any marker may be preceded by any number of 0xFF fill bytes
        # (T.81 B.1.1.2) — skip them or the walk reads a fill byte as
        # the marker code and desyncs
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        ln = _read_u16(data, pos + 2)
        body = data[pos + 4 : pos + 2 + ln]
        if ln < 2 or len(body) != ln - 2:
            raise ValueError("JPEG marker segment truncated")
        pos += 2 + ln
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq == 0:
                    tab = np.frombuffer(body[i : i + 64], dtype=np.uint8).astype(np.int64)
                    i += 64
                else:
                    tab = np.frombuffer(body[i : i + 128], dtype=">u2").astype(np.int64)
                    i += 128
                # DQT bodies arrive in zig-zag (scan) order, which is
                # exactly the order _finalize multiplies against zz.
                # Dequantization is deferred to _finalize, so a DQT that
                # REDEFINES a slot already used by a decoded scan would
                # silently dequantize that scan's coefficients with the
                # wrong table — fail loudly instead (T.81 permits the
                # redefinition; this decoder's deferred architecture
                # does not, and says so)
                if (
                    tq in used_tq
                    and tq in qtabs
                    and not np.array_equal(qtabs[tq], tab)
                ):
                    raise NotImplementedError(
                        f"JPEG DQT redefines table {tq} after a scan used it "
                        "(unsupported with deferred dequantization)"
                    )
                qtabs[tq] = tab
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                if len(bits) < 16 or i + 17 + n > len(body):
                    raise ValueError("JPEG DHT segment truncated")
                vals = list(body[i + 17 : i + 17 + n])
                htabs[(tc, th)] = _build_huffman_decoder(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0 / SOF1 / SOF2
            if frame is not None:
                raise ValueError("JPEG second SOF")
            if len(body) < 6:
                raise ValueError("JPEG SOF segment truncated")
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} unsupported (8 only)")
            h = _read_u16(body, 1)
            w = _read_u16(body, 3)
            ncomp = body[5]
            if ncomp not in (1, 3):
                # 4-component (Adobe CMYK/YCCK) would convert as if
                # YCbCr and silently drop K — fail loudly instead
                raise NotImplementedError(
                    f"JPEG component count {ncomp} unsupported (1 or 3 only)"
                )
            if len(body) < 6 + 3 * ncomp:
                raise ValueError("JPEG SOF segment truncated")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + ci * 3 : 9 + ci * 3]
                ch, cv = hv >> 4, hv & 0x0F
                if not (1 <= ch <= 2 and 1 <= cv <= 2):
                    raise NotImplementedError(
                        f"JPEG sampling factor {ch}x{cv} unsupported (1-2 only)"
                    )
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            frame = {
                "h": h,
                "w": w,
                "comps": comps,
                "progressive": marker == 0xC2,
            }
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            frame["mcus_x"], frame["mcus_y"] = mcus_x, mcus_y
            for c in comps:
                # interleaved addressing is MCU-padded; non-interleaved
                # scans cover only the component's true data units
                # (T.81 A.2.2): ceil(ceil(dim * sampling / max) / 8)
                c["bw_full"] = mcus_x * c["h"]
                c["bh_full"] = mcus_y * c["v"]
                c["bw"] = -(-(-(-w * c["h"] // hmax)) // 8)
                c["bh"] = -(-(-(-h * c["v"] // vmax)) // 8)
                coefs[c["id"]] = np.zeros(
                    (c["bh_full"], c["bw_full"], 64), dtype=np.int32
                )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0xFF{marker:02X} unsupported (baseline "
                "sequential and progressive Huffman only — arithmetic/"
                "hierarchical/lossless fail loudly)"
            )
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("JPEG DRI segment truncated")
            restart_interval = _read_u16(body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            if not body:
                raise ValueError("JPEG SOS segment truncated")
            ns = body[0]
            if len(body) < 4 + 2 * ns:
                raise ValueError("JPEG SOS segment truncated")
            scan = []
            for si in range(ns):
                cs, tdta = body[1 + si * 2], body[2 + si * 2]
                comp = next(
                    (c for c in frame["comps"] if c["id"] == cs), None
                )
                if comp is None:
                    raise ValueError(
                        f"JPEG scan references undeclared component {cs}"
                    )
                scan.append((comp, tdta >> 4, tdta & 0x0F))
            ss, se = body[1 + ns * 2], body[2 + ns * 2]
            a = body[3 + ns * 2]
            ah, al = a >> 4, a & 0x0F
            if ss > 63 or se > 63 or ss > se:
                raise ValueError(
                    f"JPEG scan header has invalid spectral band {ss}..{se}"
                )
            if not frame["progressive"] and (ss, se, ah, al) != (0, 63, 0, 0):
                raise ValueError(
                    f"baseline JPEG scan with progressive parameters "
                    f"Ss={ss} Se={se} Ah={ah} Al={al}"
                )
            pos = _decode_scan_into(
                data, pos, frame, scan, coefs, htabs, restart_interval,
                ss, se, ah, al,
            )
            n_scans += 1
            for comp, _, _ in scan:
                used_tq.add(comp["tq"])
                scanned.add(comp["id"])
        # APPn / COM / anything else: skipped
    if frame is None or n_scans == 0:
        raise ValueError("JPEG missing SOS scan")
    if not frame["progressive"]:
        missing = [c["id"] for c in frame["comps"] if c["id"] not in scanned]
        if missing:
            # a truncated per-component baseline stream would finalize
            # unscanned planes as all-zero coefficients — neutral-gray
            # garbage, exactly what the old single-scan guard blocked.
            # (A partial PROGRESSIVE stream is legitimately renderable
            # and stays accepted.)
            raise ValueError(
                f"baseline JPEG scan coverage incomplete: components "
                f"{missing} never scanned"
            )
    return _finalize(frame, coefs, qtabs)


def _decode_scan_into(
    data: bytes,
    pos: int,
    frame: dict,
    scan: list[tuple[dict, int, int]],
    coefs: dict[int, np.ndarray],
    htabs: dict[tuple[int, int], tuple[list[int], list[int]]],
    restart_interval: int,
    ss: int,
    se: int,
    ah: int,
    al: int,
) -> int:
    """Entropy-decode one scan, accumulating quantized coefficients into
    ``coefs``; returns the byte position after the scan's data.  Handles
    interleaved (ns > 1, MCU order over the full frame grid) and
    non-interleaved (ns == 1, raster order over the component's own
    data units — T.81 A.2.2) geometry, restart intervals (predictors
    and EOB run reset), and the four progressive scan kinds."""
    progressive = frame["progressive"]
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if ss > 0 and len(scan) != 1:
            raise ValueError("progressive AC scan must cover one component")
        if ss > 0 and ah > 0 and ah != al + 1:
            raise ValueError("successive approximation must refine one bit")
    for comp, td, ta in scan:
        needs_dc = (not progressive) or (ss == 0 and ah == 0)
        needs_ac = (not progressive) or ss > 0
        if needs_dc and (0, td) not in htabs:
            raise ValueError(f"JPEG scan references undefined DC table {td}")
        if needs_ac and (1, ta) not in htabs:
            raise ValueError(f"JPEG scan references undefined AC table {ta}")
    br = _BitReader(data, pos)
    preds = {comp["id"]: 0 for comp, _, _ in scan}
    state = {"eobrun": 0}
    unit_count = 0

    def maybe_restart() -> None:
        nonlocal unit_count
        if restart_interval and unit_count and unit_count % restart_interval == 0:
            br.align_restart()
            for cid in preds:
                preds[cid] = 0
            state["eobrun"] = 0

    def decode_unit(comp: dict, td: int, ta: int, by: int, bx: int) -> None:
        cid = comp["id"]
        blk = coefs[cid][by, bx]
        if not progressive:
            preds[cid] = _decode_block_coefs(
                br, htabs[(0, td)], htabs[(1, ta)], blk, preds[cid]
            )
        elif ss == 0:
            # refinement (Ah>0) reads raw bits only — no DC table needed
            preds[cid] = _decode_dc_prog(
                br, htabs[(0, td)] if ah == 0 else None, blk, preds[cid], ah, al
            )
        elif ah == 0:
            _decode_ac_first(br, htabs[(1, ta)], blk, ss, se, al, state)
        else:
            _decode_ac_refine(br, htabs[(1, ta)], blk, ss, se, al, state)

    if len(scan) == 1:
        # non-interleaved: one data unit per MCU, the component's own
        # (unpadded) block grid in raster order
        comp, td, ta = scan[0]
        for by in range(comp["bh"]):
            for bx in range(comp["bw"]):
                maybe_restart()
                decode_unit(comp, td, ta, by, bx)
                unit_count += 1
    else:
        for my in range(frame["mcus_y"]):
            for mx in range(frame["mcus_x"]):
                maybe_restart()
                for comp, td, ta in scan:
                    for dy in range(comp["v"]):
                        for dx in range(comp["h"]):
                            decode_unit(
                                comp, td, ta, my * comp["v"] + dy, mx * comp["h"] + dx
                            )
                unit_count += 1
    return br.pos


def _finalize(
    frame: dict, coefs: dict[int, np.ndarray], qtabs: dict[int, np.ndarray]
) -> np.ndarray:
    """Dequantize + inverse DCT every block, upsample, color-convert —
    one pass after all scans have accumulated their coefficients."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for c in comps:
        qt = qtabs.get(c["tq"])
        if qt is None:
            raise ValueError(
                f"JPEG quantization table {c['tq']} never defined"
            )
        nby, nbx = c["bh_full"], c["bw_full"]
        zz_all = coefs[c["id"]].astype(np.int64)
        # batched dequantize + IDCT: one matmul pair over all blocks —
        # bit-identical to the per-block loop (same 8-term reductions;
        # equality asserted at dev time), ~10x fewer Python iterations
        nat = np.zeros((nby, nbx, 64), dtype=np.float64)
        nat[..., ZIGZAG] = zz_all * qt
        spatial = (
            np.matmul(np.matmul(_DCT_M.T, nat.reshape(nby, nbx, 8, 8)), _DCT_M)
            + 128.0
        )
        plane = spatial.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        full.append(plane[:h, :w])

    if len(full) == 1:
        gray = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(gray[:, :, None], 3, axis=2)
    yy, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = yy + 1.402 * cr
    g = yy - 0.344136286 * cb - 0.714136286 * cr
    b = yy + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
