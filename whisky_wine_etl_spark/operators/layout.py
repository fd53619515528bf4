"""Physical-layout operators: Z-order clustering for data skipping.

Parquet scans skip row groups / files whose min-max column statistics
exclude the predicate. A linear sort gives perfect skipping on the
leading column and none on the others; interleaving the BITS of
several columns' bucket numbers (a Z-order / Morton curve) makes every
indexed column's values locally clustered, so multi-dimensional
point/range filters skip most files on any of the dimensions.

At 100 TB this is a maintenance job, not a query: run it like
compaction (rewrite cold partitions, `repartitionByRange` on the
Z-key so files tile the curve). The reference has no layout management
at all (its sink is row-wise INSERTs, dags/wine_etl_kaggle.py:196-202).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8
) -> Column:
    """Morton key interleaving `bits` bucket-bits per column.

    Buckets are equi-width over each column's observed [min, max]
    (one tiny agg collected to the driver — at scale compute on a
    sample or reuse table stats; boundaries need only be approximate
    for skipping to work). Pure integer arithmetic → whole-stage
    codegen, no UDF."""
    from whisky_wine_etl_spark.functions.zorder import zvalue

    stats = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    n_b = 1 << bits
    buckets = []
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        width = (mx - mn) or 1.0
        buckets.append(
            F.least(
                F.lit(n_b - 1),
                F.floor(
                    (F.col(c).cast("double") - F.lit(mn)) / F.lit(width) * n_b
                ).cast("long"),
            )
        )
    return zvalue(*buckets, bits=bits).alias("zkey")


def zorder_write(
    df: DataFrame, cols: list[str], path: str, n_files: int, bits: int = 8
) -> None:
    """Rewrite `df` Z-ordered on `cols` into `n_files` parquet files:
    range-partition on the Morton key (files tile the curve) and sort
    within each file (row groups tile it too)."""
    keyed = df.withColumn("zkey", zorder_key(df, cols, bits))
    (
        keyed.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
