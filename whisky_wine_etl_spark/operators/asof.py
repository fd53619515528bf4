"""As-of (nearest-key temporal) join.

Spark SQL has no native ASOF join (DuckDB/Pandas do). The scalable
formulation is the tagged-union trick: stamp each side, union on a
common shape, and carry the most recent right-side payload forward
with ``last(..., ignorenulls=True)`` over a (key, time)-ordered
window. Cost = ONE shuffle on the join key + an in-partition sort —
identical shape to a sort-merge join, with no range-explosion, no
per-row subquery, and no driver loop; at 100 TB it scales exactly
like any keyed window (skewed keys → AQE / salting, same as a join).

Semantics (direction='backward', the common case): for each left row
L, attach the payload of the right row R with the greatest
``right_time <= left_time`` among R sharing L's key; ties on time
break by the last ``value_cols`` ordering column. 'forward' mirrors
it (smallest right_time >= left_time). ``tolerance`` nulls out
matches farther than the given interval (pandas merge_asof parity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by_left: str,
    by_right: str,
    right_time: str | None = None,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: Column | None = None,
) -> DataFrame:
    """As-of join `left` with `right`.

    on: left event-time column; right_time: right event-time column
    (defaults to `on`); by_*: equality key on each side; value_cols:
    right columns to attach (null when no match).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    rt = right_time or on
    value_cols = value_cols or [c for c in right.columns if c not in (by_right, rt)]

    l_tagged = left.select(
        F.col(by_left).alias("__key"),
        F.col(on).alias("__t"),
        F.lit(1).alias("__src"),
        F.lit(None).cast(
            right.select(F.struct(F.col(rt).alias("__rt"), *value_cols).alias("s"))
            .schema["s"].dataType
        ).alias("__payload"),
        *[F.col(c) for c in left.columns],
    )
    r_tagged = right.select(
        F.col(by_right).alias("__key"),
        F.col(rt).alias("__t"),
        F.lit(0).alias("__src"),
        F.struct(F.col(rt).alias("__rt"), *value_cols).alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    # Equal timestamps must resolve as a match (<= / >=): right rows
    # sort before left rows at the same instant in both directions.
    if direction == "backward":
        order = [F.col("__t").asc(), F.col("__src").asc(), F.col("__payload").asc()]
    else:
        order = [F.col("__t").desc(), F.col("__src").asc(), F.col("__payload").desc()]
    w = (
        W.partitionBy("__key")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__src") == 1)
    )
    if tolerance is not None:
        gap = (
            F.col("__t") - F.col("__match.__rt")
            if direction == "backward"
            else F.col("__match.__rt") - F.col("__t")
        )
        matched = matched.withColumn(
            "__match",
            F.when(F.col("__match.__rt").isNotNull() & (gap <= tolerance), F.col("__match")),
        )
    return matched.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(c) for c in value_cols],
    )
