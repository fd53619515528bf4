"""Pure-Python/numpy PCM WAV codec.

Third REAL multimodal format next to BMP (functions/bmp.py) and PPM
(functions/ppm.py), and the first AUDIO one — implemented from the
public RIFF/WAVE spec: a "RIFF" container whose payload is a "WAVE"
form holding a 16-byte PCM "fmt " chunk and a "data" chunk of
little-endian samples. The decoder WALKS chunks (length-skipping
unknown ones like LIST/INFO) instead of assuming the canonical 44-byte
layout, which is what real files require.

Scope: PCM (format tag 1), mono, 16-bit — the deterministic synthetic
corpus shape; anything else raises honestly rather than mis-decoding.
Deterministic closed-form samples make every derived feature
integer-exact for the DuckDB oracle.
"""

from __future__ import annotations

import struct

import numpy as np

CANONICAL_HEADER_BYTES = 44  # RIFF(12) + fmt(8+16) + data header(8)


def synth_samples(doc_id: int, n: int) -> np.ndarray:
    """Closed-form int16 waveform: s_i = ((doc_id·31 + i·7) mod 2003)
    − 1001, reproducible in SQL with the same integer arithmetic."""
    i = np.arange(n, dtype=np.int64)
    return (((doc_id * 31 + i * 7) % 2003) - 1001).astype(np.int16)


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Encode mono int16 PCM at `rate` Hz into the canonical RIFF
    layout (44-byte header + data)."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("encode_wav expects a 1-D int16 array")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM WAV: returns (sample_rate, int16 samples). Walks
    the chunk list, skipping unknown chunks (and their odd-length pad
    bytes, per spec) until fmt and data are found."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate: int | None = None
    data: bytes | None = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            tag, channels, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if (tag, channels, bits) != (1, 1, 16):
                raise NotImplementedError(
                    f"only PCM mono 16-bit supported, got tag={tag} "
                    f"channels={channels} bits={bits}"
                )
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    return rate, np.frombuffer(data, dtype="<i2").astype(np.int16)
