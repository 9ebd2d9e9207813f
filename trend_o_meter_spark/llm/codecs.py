"""Pure-Python image codecs: uncompressed 24-bit BMP and binary PPM (P6).

The container ships no PIL/libav, so the multimodal pipeline's *real*
decode path (:func:`.multimodal.decode_media` with ``real=True``) uses
these dependency-free codecs — enough to run the full
decode -> feature-extract -> resize -> re-encode loop on actual pixel
data and pin it with tests, while exotic formats still fail loudly.

Both formats are trivially simple and fully specified publicly:

* **PPM P6** (Netpbm): ASCII header ``P6\\n<w> <h>\\n255\\n`` followed by
  ``h*w*3`` raw RGB bytes, row-major, top-down.
* **BMP** (Windows V3, ``BI_RGB``): 14-byte file header + 40-byte
  BITMAPINFOHEADER, 24 bpp, no compression; pixel rows are stored
  BOTTOM-UP in BGR order, each row padded to a 4-byte boundary.

Images are numpy ``uint8`` arrays of shape ``(height, width, 3)`` (RGB).
Everything is deterministic — no dithering, no color management.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- PPM --


def encode_ppm(arr: np.ndarray) -> bytes:
    """RGB (h, w, 3) uint8 -> binary PPM (P6) bytes."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got shape {arr.shape}")
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) bytes -> RGB (h, w, 3) uint8.

    Accepts the common header variants: whitespace runs and ``#``
    comments between tokens, single whitespace byte after maxval.
    """
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # tokenize the header: magic, width, height, maxval
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        # skip whitespace and comments
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        tokens.append(int(data[start:pos]))
    # exactly ONE whitespace byte separates maxval from the pixel data
    # (the P6 spec; a lone '\r' is legal).  A '\r\n' PAIR means a
    # CRLF-writing encoder: we cannot tell whether the '\n' is the
    # separator's second byte or the first pixel, so fail loudly rather
    # than decode garbage off-by-one (the exotic-formats contract).
    if data[pos : pos + 2] == b"\r\n":
        raise ValueError("CRLF after maxval is ambiguous in P6; rewrite with \\n")
    pos += 1
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    need = h * w * 3
    px = np.frombuffer(data, dtype=np.uint8, count=need, offset=pos)
    return px.reshape(h, w, 3).copy()


# ---------------------------------------------------------------- BMP --

_BMP_HDR = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, data offset
_BMP_INFO = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER


def encode_bmp(arr: np.ndarray) -> bytes:
    """RGB (h, w, 3) uint8 -> 24-bit uncompressed BMP bytes."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got shape {arr.shape}")
    h, w, _ = arr.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # bottom-up rows, BGR channel order, 4-byte-padded rows
    bgr = arr[::-1, :, ::-1]
    if pad:
        rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
        rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
        body = rows.tobytes()
    else:
        body = bgr.tobytes()
    offset = _BMP_HDR.size + _BMP_INFO.size
    header = _BMP_HDR.pack(b"BM", offset + len(body), 0, 0, offset)
    info = _BMP_INFO.pack(_BMP_INFO.size, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + body


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> RGB (h, w, 3) uint8.

    Supports the BITMAPINFOHEADER (and longer V4/V5) layout, positive
    (bottom-up) or negative (top-down) heights, BI_RGB only.
    """
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _, _, _, _, offset = _BMP_HDR.unpack_from(data, 0)
    hdr_size = struct.unpack_from("<I", data, _BMP_HDR.size)[0]
    if hdr_size < _BMP_INFO.size:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    _, w, h_signed, planes, bpp, compression, *_ = _BMP_INFO.unpack_from(
        data, _BMP_HDR.size
    )
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={compression})")
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    px = np.frombuffer(data, dtype=np.uint8, count=h * stride, offset=offset)
    rows = px.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


# ------------------------------------------------------------ dispatch --


def sniff(data: bytes) -> str | None:
    """Identify a payload by magic bytes: 'bmp', 'ppm', or None."""
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] == b"P6":
        return "ppm"
    return None


def decode_image(data: bytes) -> np.ndarray:
    """Decode any supported payload to RGB (h, w, 3) uint8."""
    fmt = sniff(data)
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt == "ppm":
        return decode_ppm(data)
    raise NotImplementedError(
        "no shipped codec for this payload (magic %r); real decode supports "
        "uncompressed 24-bit BMP and binary PPM — PNG/JPEG need PIL, absent "
        "from this environment" % data[:2]
    )


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    if fmt == "bmp":
        return encode_bmp(arr)
    if fmt == "ppm":
        return encode_ppm(arr)
    raise NotImplementedError(f"no shipped encoder for format {fmt!r}")


def resize_nearest(arr: np.ndarray, *, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (the deterministic, dependency-free kernel):
    destination pixel (x, y) samples source pixel
    ``(floor((x + 0.5) * sw / dw), floor((y + 0.5) * sh / dh))`` — the
    standard pixel-center mapping."""
    sh, sw = arr.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * sh / height).astype(np.int64), sh - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * sw / width).astype(np.int64), sw - 1)
    return arr[ys][:, xs]
