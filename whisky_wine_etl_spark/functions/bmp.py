"""Pure-Python/numpy 24-bit BMP codec + nearest-neighbor resize.

The container ships no image libraries, but BMP (BITMAPINFOHEADER,
BI_RGB, 24 bpp, bottom-up) is simple enough to implement exactly from
the public format spec — which makes the multimodal pipeline's
"real codec" branch real: decode parses actual image bytes (header
validation, 4-byte row padding, bottom-up row order, BGR channel
order) and encode produces files any external viewer can open.

Everything is deterministic, so pipeline outputs are md5-pinnable in
tests and closed-form checkable by the DuckDB oracle (see
plans/multimodal.py mm_resize_real).

Used by operators/multimodal.py for the real_codec path; the fake
truncation path remains the lightweight plumbing-only twin.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HEADER = struct.Struct("<2sIHHI")  # magic, file size, res, res, data offset
_INFO_HEADER = struct.Struct("<IiiHHIIiiII")
_HEADER_BYTES = 14 + 40


def row_stride(width: int) -> int:
    """Bytes per stored row: 3 bytes/pixel padded up to 4-byte alignment."""
    return (width * 3 + 3) & ~3


def bmp_size(width: int, height: int) -> int:
    """Total encoded file size for a width×height 24-bit BMP."""
    return _HEADER_BYTES + height * row_stride(width)


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit BI_RGB BMP.

    Rows are stored bottom-up and pixels as BGR, per the format; each
    row is zero-padded to a 4-byte boundary."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_bmp expects an (h, w, 3) uint8 array")
    h, w, _ = pixels.shape
    stride = row_stride(w)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    size = bmp_size(w, h)
    file_header = _FILE_HEADER.pack(b"BM", size, 0, 0, _HEADER_BYTES)
    info_header = _INFO_HEADER.pack(40, w, h, 1, 24, 0, h * stride, 2835, 2835, 0, 0)
    return file_header + info_header + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP into an (h, w, 3) uint8 RGB
    array. Validates magic, bpp, compression, and declared sizes —
    malformed payloads raise ValueError rather than yielding garbage."""
    if len(payload) < _HEADER_BYTES:
        raise ValueError("truncated BMP: missing header")
    magic, _fsize, _r1, _r2, offset = _FILE_HEADER.unpack_from(payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    (hsize, w, h, planes, bpp, compression, *_rest) = _INFO_HEADER.unpack_from(
        payload, 14
    )
    if hsize < 40 or planes != 1:
        raise ValueError("unsupported BMP header")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (got bpp={bpp}, comp={compression})")
    if h <= 0 or w <= 0:
        raise ValueError("top-down or empty BMP not supported")
    stride = row_stride(w)
    end = offset + h * stride
    if len(payload) < end:
        raise ValueError("truncated BMP: missing pixel data")
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=offset)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    return rows[::-1, :, ::-1].copy()  # back to top-down RGB


def resize_nearest(pixels: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resample to exactly (target_h, target_w):
    output pixel (x, y) reads source (floor(x·w/tw), floor(y·h/th)) —
    the same index arithmetic the oracle SQL reproduces closed-form."""
    h, w, _ = pixels.shape
    idx_x = (np.arange(target_w, dtype=np.int64) * w) // target_w
    idx_y = (np.arange(target_h, dtype=np.int64) * h) // target_h
    return pixels[idx_y][:, idx_x]


def synth_pixels(doc_id: int, width: int, height: int) -> np.ndarray:
    """Deterministic synthetic image: channel values are closed-form
    functions of (doc_id, x, y), so any downstream pixel statistic is
    reproducible in pure SQL by the oracle."""
    x = np.arange(width, dtype=np.int64)[None, :]
    y = np.arange(height, dtype=np.int64)[:, None]
    r = (doc_id * 7 + x * 3 + y * 5) % 256
    g = (doc_id * 11 + x * 13 + y) % 256
    b = (doc_id * 3 + x + y * 17) % 256
    return np.stack(
        [np.broadcast_to(c, (height, width)) for c in (r, g, b)], axis=2
    ).astype(np.uint8)
