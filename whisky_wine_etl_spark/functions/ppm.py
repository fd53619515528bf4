"""Pure-Python/numpy binary PPM (P6) codec.

Second REAL image format next to BMP (functions/bmp.py), implemented
exactly from the public Netpbm format spec: `P6`, whitespace/comment
-separated width, height and maxval tokens, a single whitespace byte,
then raw RGB triples top-down with no row padding. Having two real
codecs exercises the format-dispatch path in
operators/multimodal.py: the resize pipeline sniffs the payload magic
and re-encodes in the SAME format it decoded.

Deterministic, so outputs are md5-pinnable in tests and closed-form
checkable by the DuckDB oracle (pixels via bmp.synth_pixels — the
synthetic image is format-independent).
"""

from __future__ import annotations

import numpy as np


def ppm_size(width: int, height: int) -> int:
    """Encoded size for encode_ppm's canonical header layout:
    b"P6\\n<w> <h>\\n255\\n" + 3·w·h payload bytes."""
    return len(f"P6\n{width} {height}\n255\n") + 3 * width * height


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as binary PPM (P6),
    maxval 255. Rows are stored top-down, RGB order, unpadded."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_ppm expects an (h, w, 3) uint8 array")
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode("ascii") + pixels.tobytes()


def _tokens(payload: bytes, start: int, n: int) -> tuple[list[int], int]:
    """Read `n` whitespace-separated ASCII integer tokens beginning at
    `start`, honoring `#`-to-end-of-line comments (the spec allows
    comments anywhere in the header). Returns (values, next_offset)."""
    vals: list[int] = []
    i = start
    while len(vals) < n:
        if i >= len(payload):
            raise ValueError("truncated PPM: header ended early")
        c = payload[i]
        if c in b"#":
            while i < len(payload) and payload[i] not in b"\r\n":
                i += 1
        elif c in b" \t\r\n\v\f":
            i += 1
        elif c in b"0123456789":
            j = i
            while j < len(payload) and payload[j] in b"0123456789":
                j += 1
            vals.append(int(payload[i:j]))
            i = j
        else:
            raise ValueError(f"malformed PPM header byte {c!r}")
    return vals, i


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode a binary PPM (P6) into an (h, w, 3) uint8 RGB array.
    Validates magic, maxval and payload size — malformed payloads
    raise ValueError rather than yielding garbage."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    (w, h, maxval), i = _tokens(payload, 2, 3)
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported (got {maxval})")
    if w <= 0 or h <= 0:
        raise ValueError("empty PPM not supported")
    # exactly ONE whitespace byte separates the header from the raster
    if i >= len(payload) or payload[i] not in b" \t\r\n\v\f":
        raise ValueError("malformed PPM: missing raster separator")
    i += 1
    need = 3 * w * h
    if len(payload) - i < need:
        raise ValueError("truncated PPM: missing pixel data")
    return (
        np.frombuffer(payload, dtype=np.uint8, count=need, offset=i)
        .reshape(h, w, 3)
        .copy()
    )
