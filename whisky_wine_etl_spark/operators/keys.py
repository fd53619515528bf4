"""Surrogate-key assignment: global contiguous sequence numbers
without a global single-partition sort.

The naive `row_number() OVER (ORDER BY ...)` (no PARTITION BY) pulls
every row through ONE task — the canonical scale trap. The standard
two-pass pattern instead:

1. range-partition by the ordering key (each partition holds a
   contiguous key range, partitions are ordered);
2. count rows per partition (tiny aggregate), prefix-sum the counts on
   the driver → each partition's starting offset;
3. row_number within each partition (parallel) + broadcast offset.

Total cost: one range shuffle + one count — same as a sort — with all
numbering work fully parallel. Deterministic when the ordering columns
are a total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def add_surrogate_key(
    df: DataFrame,
    order_cols: list[str],
    key_col: str = "sk",
    num_partitions: int | None = None,
) -> DataFrame:
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # Materialize the range partitioning ONCE: RangePartitioner picks
    # boundaries by sampling, and a re-execution may pick different
    # ones — the counts and the numbering below must see the same
    # boundaries or offsets land on the wrong partitions.
    ranged = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = (
        ranged.groupBy("__pid").count().orderBy("__pid").collect()
    )  # ≤ num_partitions rows — driver-side prefix sum is O(partitions)
    offsets, acc = {}, 0
    for r in counts:
        offsets[r["__pid"]] = acc
        acc += r["count"]
    off_df = df.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "__pid int, __off long"
    )
    w = W.partitionBy("__pid").orderBy(*order_cols)
    return (
        ranged.join(F.broadcast(off_df), "__pid")
        .withColumn(key_col, (F.row_number().over(w) + F.col("__off")).cast("long"))
        .drop("__pid", "__off")
    )


def add_running_total(
    df: DataFrame,
    order_cols: list[str],
    sum_col: str,
    out_col: str = "running_total",
    inclusive: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Global cumulative sum of `sum_col` in `order_cols` order with
    the same two-pass shape as add_surrogate_key: range shuffle,
    per-partition running sums (parallel), O(partitions) driver
    prefix of the partition totals. `inclusive=False` gives the
    exclusive prefix (total strictly BEFORE each row) — the form
    rank/ECDF reconstructions need."""
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = (
        ranged.groupBy("__pid").agg(F.sum(sum_col).alias("__t")).orderBy("__pid").collect()
    )
    offsets, acc = [], 0
    for r in totals:
        offsets.append((r["__pid"], acc))
        acc += r["__t"]
    off_df = df.sparkSession.createDataFrame(offsets, "__pid int, __off long")
    upper = 0 if inclusive else -1
    w = (
        W.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, upper)
    )
    return (
        ranged.join(F.broadcast(off_df), "__pid")
        .withColumn(
            out_col,
            F.col("__off") + F.coalesce(F.sum(sum_col).over(w), F.lit(0)),
        )
        .drop("__pid", "__off")
    )
