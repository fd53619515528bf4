"""Z-order (Morton) curve encoding as a pure JVM-side expression.

Multi-dimensional clustering for data skipping: rows sorted by the
interleaved bits of several normalized column values land in files
whose per-file min/max ranges are tight in EVERY dimension at once, so
a predicate on any participating column prunes files/row-groups —
the layout trick behind Delta/Iceberg OPTIMIZE ZORDER, expressed here
with nothing but built-in integer arithmetic (shiftleft/or), so the
whole computation stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _spread_bits_16(x: Column, ndims: int) -> Column:
    """Spread the low 16 bits of x so consecutive bits are `ndims`
    positions apart (bit i of x lands at position i*ndims). Plain
    shift/mask chain — no UDF, fully codegen'd."""
    out = F.lit(0).cast("long")
    for i in range(16):
        bit = F.shiftright(x, i).bitwiseAND(F.lit(1))
        out = out.bitwiseOR(F.shiftleft(bit, i * ndims))
    return out


def zvalue(*cols: Column, bits: int = 16) -> Column:
    """Morton z-value of 2+ integer columns, each first clamped to
    [0, 2^bits). Callers normalize raw values into that range (rank,
    bucket, or min-max scale) — the curve only needs ORDER, not the
    original magnitudes."""
    assert bits <= 16, "z-value packs ndims*bits <= 64 bits"
    ndims = len(cols)
    mask = F.lit((1 << bits) - 1)
    z = F.lit(0).cast("long")
    for d, c in enumerate(cols):
        clamped = c.cast("long").bitwiseAND(mask)
        z = z.bitwiseOR(F.shiftleft(_spread_bits_16(clamped, ndims), d))
    return z


def zorder_layout(
    df: DataFrame, cols: list[str], n_files: int, bits: int = 10
) -> DataFrame:
    """Return df with a __zval column, range-partitioned into n_files
    partitions by z-value — writing this produces the multi-dim
    clustered layout. Each column is min-max normalized into the
    bits-wide grid with a two-row stats aggregate (broadcast scalar,
    no window over the data)."""
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__mx_{c}") for c in cols],
    )
    joined = df.crossJoin(F.broadcast(stats))
    grid = F.lit((1 << bits) - 1)
    normed = [
        F.when(
            F.col(f"__mx_{c}") > F.col(f"__mn_{c}"),
            F.floor(
                (F.col(c).cast("double") - F.col(f"__mn_{c}"))
                / (F.col(f"__mx_{c}") - F.col(f"__mn_{c}"))
                * grid
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        for c in cols
    ]
    with_z = joined.select(
        *df.columns, zvalue(*normed, bits=bits).alias("__zval")
    )
    return with_z.repartitionByRange(n_files, "__zval")
