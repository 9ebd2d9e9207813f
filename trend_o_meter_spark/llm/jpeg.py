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
* **JFIF 1.02** (ITU-T T.871) — the APP0 wrapper, YCbCr <-> RGB
  matrices (BT.601 full-range), and centered chroma subsampling.

Scope (mirrors the repo's codec discipline — do the baseline for real,
fail LOUDLY on the rest): baseline sequential (SOF0; SOF1 decodes the
same way), 8-bit samples, 1- or 3-component scans, sampling factors 1-2
per axis (4:4:4 / 4:2:2 / 4:2:0), restart markers.  Progressive (SOF2),
arithmetic coding, hierarchical, and 12-bit precision raise
``NotImplementedError`` rather than decode wrongly.

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

__all__ = ["encode_jpeg", "decode_jpeg"]

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


def _build_huffman_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Inverse mapping ``{(length, code): symbol}`` for the bit-serial
    decoder (<= 16 probes per symbol)."""
    return {
        (length, code): sym
        for sym, (code, length) in _build_huffman_codes(bits, vals).items()
    }


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
    beyond APP0.  ``subsampling``: ``'444'`` (no chroma subsampling) or
    ``'420'`` (2x2 box-averaged chroma, the ubiquitous choice).
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (T.81 F.2.2.5) — the decode path a chunked/parallel
    producer exercises.
    """
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got shape {arr.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling {subsampling!r} unsupported ('444'/'420')")
    h, w, _ = arr.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")

    # JFIF / BT.601 full-range color transform.
    rgb = arr.astype(np.float64)
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    yy = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b

    sub = 2 if subsampling == "420" else 1
    qy = _scaled_qtable(_Q_LUM, quality)
    qc = _scaled_qtable(_Q_CHROM, quality)

    if sub == 2:
        cb_e = _pad_edge(cb, 2, 2)  # chroma box averages need even dims
        cr_e = _pad_edge(cr, 2, 2)
        cbs = (cb_e[0::2, 0::2] + cb_e[0::2, 1::2] + cb_e[1::2, 0::2] + cb_e[1::2, 1::2]) / 4.0
        crs = (cr_e[0::2, 0::2] + cr_e[0::2, 1::2] + cr_e[1::2, 0::2] + cr_e[1::2, 1::2]) / 4.0
        ypl = _pad_edge(yy, 16, 16)
        cbs = _pad_edge(cbs, 8, 8)
        crs = _pad_edge(crs, 8, 8)
    else:
        ypl = _pad_edge(yy, 8, 8)
        cbs = _pad_edge(cb, 8, 8)
        crs = _pad_edge(cr, 8, 8)

    dc_l = _build_huffman_codes(*_DC_LUM)
    ac_l = _build_huffman_codes(*_AC_LUM)
    dc_c = _build_huffman_codes(*_DC_CHROM)
    ac_c = _build_huffman_codes(*_AC_CHROM)

    bw = _BitWriter()
    pred_y = pred_cb = pred_cr = 0
    mcus_y = ypl.shape[0] // (8 * sub)
    mcus_x = ypl.shape[1] // (8 * sub)
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
                _plane_blocks(ypl, my * sub + dy, mx * sub + dx)
                for dy in range(sub)
                for dx in range(sub)
            ]
            pred_y = _encode_blocks(bw, np.stack(yblocks), qy, dc_l, ac_l, pred_y)
            pred_cb = _encode_blocks(
                bw, _plane_blocks(cbs, my, mx)[None], qc, dc_c, ac_c, pred_cb
            )
            pred_cr = _encode_blocks(
                bw, _plane_blocks(crs, my, mx)[None], qc, dc_c, ac_c, pred_cr
            )
    bw.pad_to_byte()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dht(tc: int, th: int, table: tuple[list[int], list[int]]) -> bytes:
        bits, vals = table
        return bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)

    out = bytearray()
    out += struct.pack(">H", 0xFFD8)  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(qy[ZIGZAG].tolist()))
    out += seg(0xFFDB, b"\x01" + bytes(qc[ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, (sub << 4) | sub, 0])  # Y
    sof += bytes([2, 0x11, 1])  # Cb
    sof += bytes([3, 0x11, 1])  # Cr
    out += seg(0xFFC0, sof)
    out += seg(0xFFC4, dht(0, 0, _DC_LUM))
    out += seg(0xFFC4, dht(1, 0, _AC_LUM))
    out += seg(0xFFC4, dht(0, 1, _DC_CHROM))
    out += seg(0xFFC4, dht(1, 1, _AC_CHROM))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xFFDA, sos)
    out += bw.out
    out += struct.pack(">H", 0xFFD9)  # EOI
    return bytes(out)


# --------------------------------------------------------------- decoder --


class _BitReader:
    """MSB-first bit reader over entropy-coded data with byte
    unstuffing; stops at any non-RST marker (F.2.2.5)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data truncated")
            byte = self.data[self.pos]
            if byte == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 2  # stuffed literal 0xFF
                else:
                    raise ValueError("JPEG hit a marker inside entropy data")
            else:
                self.pos += 1
            self._acc = byte
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self) -> None:
        """Byte-align and consume one RSTn marker (F.2.2.5)."""
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


def _decode_huffman(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _decode_block(
    br: _BitReader,
    dc_tab: dict[tuple[int, int], int],
    ac_tab: dict[tuple[int, int], int],
    qtab: np.ndarray,
    pred: int,
) -> tuple[np.ndarray, int]:
    """One 8x8 block: entropy-decode, dequantize, inverse DCT.  Returns
    (spatial block float64, new DC predictor)."""
    zz = np.zeros(64, dtype=np.int64)
    t = _decode_huffman(br, dc_tab)
    diff = _extend(br.read_bits(t), t) if t else 0
    pred += diff
    zz[0] = pred
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
        zz[k] = _extend(br.read_bits(s), s)
        k += 1
    coef = np.zeros(64, dtype=np.float64)
    coef[ZIGZAG] = zz * qtab
    blk = _DCT_M.T @ coef.reshape(8, 8) @ _DCT_M + 128.0
    return blk, pred


def _read_u16(data: bytes, pos: int) -> int:
    return struct.unpack_from(">H", data, pos)[0]


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> RGB (h, w, 3) uint8.

    Accepts SOF0 (and SOF1 — identical decoding), 8-bit, 1 or 3
    components, per-axis sampling factors 1-2, restart intervals.
    Chroma upsampling is sample replication (nearest), the deterministic
    dependency-free kernel used across this codec family.  Progressive
    / arithmetic / hierarchical / 12-bit streams fail loudly."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame: dict | None = None
    restart_interval = 0
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
                # exactly the order _decode_block multiplies against zz
                qtabs[tq] = tab
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                htabs[(tc, th)] = _build_huffman_decoder(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1
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
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + ci * 3 : 9 + ci * 3]
                ch, cv = hv >> 4, hv & 0x0F
                if not (1 <= ch <= 2 and 1 <= cv <= 2):
                    raise NotImplementedError(
                        f"JPEG sampling factor {ch}x{cv} unsupported (1-2 only)"
                    )
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0xFF{marker:02X} unsupported (baseline "
                "sequential SOF0/SOF1 only — progressive/arithmetic/"
                "hierarchical fail loudly)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = _read_u16(body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            if ns != len(frame["comps"]):
                # T.81 baseline permits per-component (non-interleaved)
                # scans; decoding only the first would leave the other
                # planes zero — fail loudly rather than emit garbage
                raise NotImplementedError(
                    "JPEG multi-scan (non-interleaved) stream unsupported — "
                    f"scan covers {ns} of {len(frame['comps'])} components"
                )
            scan = []
            for si in range(ns):
                cs, tdta = body[1 + si * 2], body[2 + si * 2]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 0x0F))
            return _decode_scan(data, pos, frame, scan, qtabs, htabs, restart_interval)
        # APPn / COM / anything else: skipped
    raise ValueError("JPEG missing SOS scan")


def _decode_scan(
    data: bytes,
    pos: int,
    frame: dict,
    scan: list[tuple[dict, int, int]],
    qtabs: dict[int, np.ndarray],
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]],
    restart_interval: int,
) -> np.ndarray:
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    planes = {
        c["id"]: np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        for c in comps
    }
    preds = {c["id"]: 0 for c in comps}
    br = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align_restart()
                for cid in preds:
                    preds[cid] = 0
            for comp, td, ta in scan:
                cid = comp["id"]
                qt = qtabs[comp["tq"]]
                for dy in range(comp["v"]):
                    for dx in range(comp["h"]):
                        blk, preds[cid] = _decode_block(
                            br, htabs[(0, td)], htabs[(1, ta)], qt, preds[cid]
                        )
                        y0 = (my * comp["v"] + dy) * 8
                        x0 = (mx * comp["h"] + dx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = blk
            mcu_count += 1

    # Upsample each component to full resolution by replication, crop.
    full = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1:
            p = np.repeat(p, ry, axis=0)
        if rx > 1:
            p = np.repeat(p, rx, axis=1)
        full.append(p[:h, :w])

    if len(full) == 1:
        gray = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(gray[:, :, None], 3, axis=2)
    yy, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = yy + 1.402 * cr
    g = yy - 0.344136286 * cb - 0.714136286 * cr
    b = yy + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
