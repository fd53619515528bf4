"""Structured Streaming pipelines over the `events` table.

Source: the file stream source (`readStream.parquet`) pointed at the
testdata dir with a glob for `events.parquet` — on a cluster this is
the standard landing-directory pattern (new files appear, each
becomes a micro-batch; `maxFilesPerTrigger` bounds batch size).
`events.ts` is TIMESTAMP(NANOS) in the footer, which Spark's reader
rejects — the caller must set `spark.sql.legacy.parquet.nanosAsLong`
(run_to_memory does) and the pipeline converts int64 nanos →
microsecond timestamps exactly, matching the batch-side catalog.

Pipelines (each has a batch twin in plans/streaming_twins.py that the
DuckDB oracle verifies; the streaming runs themselves execute with
trigger(availableNow=True) into a memory sink):

- tumbling_counts:  1 h tumbling window × event_type, count + sum
- sliding_counts:   1 h window sliding every 30 min
- session_stats:    30-min-gap session windows per user
- distinct_user_event: streaming dedup via dropDuplicatesWithinWatermark

State & scale: windowed aggs keep per-window state bounded by the
watermark (10 min lateness); session windows merge in-state; dedup
state is keyed and watermark-expired. All state is in the state
store, partitioned by key — no driver accumulation.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Raw schema as read with nanosAsLong=true (ts arrives as int64 nanos).
EVENTS_RAW_DDL = (
    "event_id long, ts long, user_id long, event_type string, value double, props string"
)

_sink_counter = itertools.count()


def events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(EVENTS_RAW_DDL).option(
        "pathGlobFilter", "events.parquet"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.parquet(sf_dir)
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def file_events_stream(
    spark: SparkSession, directory: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Stream micro-batch-style from a landing directory of parquet
    files with ordinary µs timestamps (used by the late-data tests)."""
    reader = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(directory)


def tumbling_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("window.start").alias("wstart"),
            F.col("window.end").alias("wend"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("window.start").alias("wstart"),
            F.col("window.end").alias("wend"),
            "n",
            "sum_value",
        )
    )


def session_stats(events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def distinct_user_event(events: DataFrame, watermark: str = "90 days") -> DataFrame:
    """Streaming dedup: first occurrence of each (user_id, event_type).
    Key-only projection keeps the output deterministic regardless of
    arrival order; the generous watermark bounds state while covering
    the whole test window."""
    return (
        events.select("user_id", "event_type", "ts")
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )


def run_to_memory(
    spark: SparkSession,
    stream_df: DataFrame,
    output_mode: str,
    name: str | None = None,
) -> DataFrame:
    """Execute a streaming DataFrame to completion (availableNow) into
    a memory sink and return the sink as a batch DataFrame."""
    sink = name or f"stream_sink_{next(_sink_counter)}"
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(sink)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    return spark.table(sink)
