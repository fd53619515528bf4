"""Time-series regularization operators: gap-filled resampling with
forward fill — the "hypertable" shaping step that turns an irregular
event stream into a regular per-entity grid for feature windows,
charting, and downstream joins on aligned timestamps.

Same engine rules as everywhere else: pure DataFrame ops, the grid is
generated with `sequence` + `explode` (no driver loops, no Python),
every decision is a deterministic function of the data so a SQL
oracle can replay it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def resample_ffill(
    events: DataFrame,
    step_sec: int = 3600,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
) -> DataFrame:
    """Regularize an event stream onto a fixed `step_sec` grid per
    key: each bucket reports how many raw events landed in it and the
    last observed value carried forward across empty buckets
    (buckets before a key's first observation stay NULL).

    Per bucket, "last observed" is max-by (epoch second, `order_col`)
    — the tie-break makes the carried value deterministic when two
    events share a timestamp.

    Shape: one groupBy on (key, bucket) collapses the raw stream
    (partial+final agg, max_by carries the winner), a per-key min/max
    agg generates the grid via `sequence`+`explode` (narrow — one row
    per key in, bounded rows out), a left join aligns grid↔buckets on
    the same (key, bucket) hash, and one window per key does the
    forward fill. The window partition is a key's bucket COUNT (time
    span / step), not its event count — bounded by retention, not
    traffic; a key with a billion events still windows over the same
    few thousand buckets."""
    sec = F.col(ts_col).cast("long")
    bucket = (sec - (sec % step_sec)).alias("bucket_ts")
    per_bucket = (
        events.select(key_col, bucket, F.col(value_col), sec.alias("__sec"), order_col)
        .groupBy(key_col, "bucket_ts")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max_by(value_col, F.struct("__sec", order_col)).alias("__last_v"),
        )
    )
    grid = (
        events.select(key_col, bucket)
        .groupBy(key_col)
        .agg(F.min("bucket_ts").alias("__mn"), F.max("bucket_ts").alias("__mx"))
        .select(
            key_col,
            F.explode(
                F.sequence("__mn", "__mx", F.lit(step_sec).cast("long"))
            ).alias("bucket_ts"),
        )
    )
    w = (
        W.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(per_bucket, [key_col, "bucket_ts"], "left")
        .select(
            key_col,
            "bucket_ts",
            F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
            F.last("__last_v", ignorenulls=True).over(w).alias("__ffill"),
        )
        .withColumnRenamed("__ffill", "value_ffill")
    )


def resample_interpolate(
    events: DataFrame,
    step_sec: int = 3600,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
) -> DataFrame:
    """Regularize onto a fixed grid with LINEAR interpolation between
    observations — the gap-fill a charting/feature pipeline wants when
    carrying the last value forward (resample_ffill) would bias flat.

    Knots: per (key, bucket) the last observed value (max-by epoch
    second then `order_col`, same deterministic tie-break as
    resample_ffill), positioned AT the bucket timestamp. Grid buckets
    between two knots get pv + (nv - pv) * (t - pt) / (nt - pt); at a
    knot the knot value itself; before the first / after the last knot
    NULL (interpolation never extrapolates).

    Shape: identical to resample_ffill — one (key, bucket) groupBy,
    a sequence+explode grid, one left join, then TWO passes over the
    same (key, bucket-ordered) window partition (last-non-null looking
    back, first-non-null looking forward): one shuffle total, window
    sized by time span not traffic."""
    sec = F.col(ts_col).cast("long")
    bucket = (sec - (sec % step_sec)).alias("bucket_ts")
    knots = (
        events.select(key_col, bucket, F.col(value_col), sec.alias("__sec"), order_col)
        .groupBy(key_col, "bucket_ts")
        .agg(F.max_by(value_col, F.struct("__sec", order_col)).alias("__kv"))
    )
    grid = (
        events.select(key_col, bucket)
        .groupBy(key_col)
        .agg(F.min("bucket_ts").alias("__mn"), F.max("bucket_ts").alias("__mx"))
        .select(
            key_col,
            F.explode(
                F.sequence("__mn", "__mx", F.lit(step_sec).cast("long"))
            ).alias("bucket_ts"),
        )
    )
    back = (
        W.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = (
        W.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    joined = grid.join(knots, [key_col, "bucket_ts"], "left")
    kt = F.when(F.col("__kv").isNotNull(), F.col("bucket_ts"))
    pv = F.last("__kv", ignorenulls=True).over(back)
    pt = F.last(kt, ignorenulls=True).over(back)
    nv = F.first("__kv", ignorenulls=True).over(fwd)
    nt = F.first(kt, ignorenulls=True).over(fwd)
    interp = F.when(pt == nt, pv).otherwise(
        pv + (nv - pv) * (F.col("bucket_ts") - pt) / (nt - pt)
    )
    return joined.select(
        key_col,
        "bucket_ts",
        interp.alias("value_interp"),
    )
