"""Z-order (Morton) curve encoding as a pure JVM-side expression.

The bit-spreading primitive behind operators/layout.py's clustered
rewrite: interleaves several integer columns' low bits with plain
shiftleft/or chains, so the whole computation stays inside whole-stage
codegen (no UDF). Bucketing/normalization policy lives with the
layout operator; this module is only the curve.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _spread_bits(x: Column, ndims: int, bits: int) -> Column:
    """Spread the low `bits` bits of x so consecutive bits are `ndims`
    positions apart (bit i of x lands at position i*ndims)."""
    out = F.lit(0).cast("long")
    for i in range(bits):
        bit = F.shiftright(x, i).bitwiseAND(F.lit(1))
        out = out.bitwiseOR(F.shiftleft(bit, i * ndims))
    return out


def zvalue(*cols: Column, bits: int = 16) -> Column:
    """Morton z-value of 2+ integer columns, each first masked to
    [0, 2^bits). Callers normalize raw values into that range (rank,
    bucket, or min-max scale) — the curve only needs ORDER, not the
    original magnitudes."""
    ndims = len(cols)
    assert ndims * bits <= 64, "z-value packs ndims*bits <= 64 bits"
    mask = F.lit((1 << bits) - 1)
    z = F.lit(0).cast("long")
    for d, c in enumerate(cols):
        clamped = c.cast("long").bitwiseAND(mask)
        z = z.bitwiseOR(F.shiftleft(_spread_bits(clamped, ndims, bits), d))
    return z
