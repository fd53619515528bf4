"""Unit + end-to-end tests for the custom Python Data Source
(sources/pyds.py): pushdown narrows the planned row range, partitions
split it evenly, reads are deterministic and Arrow-batched."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThanOrEqual,
    IsNotNull,
    LessThan,
)

from whisky_wine_etl_spark.sources.pyds import RangeEventsDataSource, RangeEventsReader


def test_push_filters_narrow_planned_range():
    r = RangeEventsReader({"n_rows": "1000", "n_partitions": "4"})
    unsupported = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("row_id",), 100),
                LessThan(("row_id",), 900),
                IsNotNull(("user_id",)),  # not ours → handed back
            ]
        )
    )
    assert r.lo == 100 and r.hi == 900
    assert len(unsupported) == 1 and isinstance(unsupported[0], IsNotNull)
    parts = r.partitions()
    assert len(parts) == 4
    assert parts[0].start == 100 and parts[-1].end == 900
    # contiguous, non-overlapping
    for a, b in zip(parts, parts[1:]):
        assert a.end == b.start


def test_push_filters_equal_to_pinpoints_one_row():
    r = RangeEventsReader({"n_rows": "1000", "n_partitions": "4"})
    list(r.pushFilters([EqualTo(("row_id",), 42)]))
    assert (r.lo, r.hi) == (42, 43)
    parts = r.partitions()
    assert len(parts) == 1 and (parts[0].start, parts[0].end) == (42, 43)


def test_read_partition_is_closed_form_arrow():
    import pyarrow as pa

    r = RangeEventsReader({"n_rows": "100", "n_partitions": "1"})
    (batch,) = list(r.read(r.partitions()[0]))
    assert isinstance(batch, pa.RecordBatch)
    assert batch.num_rows == 100
    i = 7
    h = (i * 2654435761) % 2_147_483_648
    assert batch.column("user_id")[i].as_py() == h % 1000
    assert batch.column("event_type")[i].as_py() == f"type_{h % 5}"
    assert batch.column("value")[i].as_py() == (h % 10_000) / 100.0


def test_source_end_to_end_parallel_and_deterministic(spark):
    spark.dataSource.register(RangeEventsDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    df = (
        spark.read.format("range_events")
        .option("n_rows", 5000)
        .option("n_partitions", 6)
        .load()
        .filter(F.col("row_id") < 3000)
    )
    assert df.rdd.getNumPartitions() == 6
    first = df.agg(F.count(F.lit(1)), F.sum("user_id"), F.sum("value")).collect()[0]
    second = df.agg(F.count(F.lit(1)), F.sum("user_id"), F.sum("value")).collect()[0]
    assert first == second
    assert first[0] == 3000


def test_stream_source_offsets_persist_across_runs(spark, tmp_path):
    """Three availableNow runs over ONE checkpoint each drain exactly
    the next batch_size slice — committed offsets carry across
    restarts, the exactly-once contract a streaming source must
    honor."""
    spark.dataSource.register(RangeEventsDataSource)
    chk = str(tmp_path / "chk")
    out_dir = str(tmp_path / "out")
    for run in range(3):
        sdf = (
            spark.readStream.format("range_events")
            .option("n_rows", 12000)
            .option("batch_size", 4000)
            .load()
        )
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        got = spark.read.parquet(out_dir)
        assert got.count() == 4000 * (run + 1)
        assert got.agg(F.max("row_id")).collect()[0][0] == 4000 * (run + 1) - 1
    # all 12000 distinct — no replays leaked into the sink
    assert spark.read.parquet(out_dir).select("row_id").distinct().count() == 12000


def test_manifest_sink_commit_abort_and_orphans(spark, tmp_path):
    """The transactional contract: abort() removes a task's part file;
    files outside _MANIFEST (stragglers from crashed tasks) are
    invisible to the reader; append merges manifests."""
    import json
    import os

    from pyspark.sql import Row

    from whisky_wine_etl_spark.sources.pyds import (
        ManifestJsonlDataSource,
        ManifestJsonlWriter,
    )

    spark.dataSource.register(ManifestJsonlDataSource)
    path = str(tmp_path / "mj")
    df = spark.createDataFrame([Row(a=1, b="x"), Row(a=2, b="y")])
    df.write.format("manifest_jsonl").mode("append").save(path)

    # orphan straggler: on disk, not in the manifest → not in the table
    orphan = os.path.join(path, "data", "part-orphan.jsonl")
    with open(orphan, "w") as f:
        f.write('{"a": 99, "b": "ghost"}\n')
    back = spark.read.format("manifest_jsonl").schema(df.schema).option("path", path).load()
    assert back.count() == 2
    assert back.filter("a = 99").count() == 0

    # append merges manifests
    df.write.format("manifest_jsonl").mode("append").save(path)
    back2 = spark.read.format("manifest_jsonl").schema(df.schema).option("path", path).load()
    assert back2.count() == 4

    # abort removes the task's uncommitted file and leaves no manifest
    w = ManifestJsonlWriter({"path": str(tmp_path / "aborted")}, overwrite=False)
    msg = w.write(iter([Row(a=5, b="z")]))
    assert os.path.exists(msg.path)
    w.abort([msg])
    assert not os.path.exists(msg.path)
    assert not os.path.exists(str(tmp_path / "aborted" / "_MANIFEST"))

    # overwrite publishes a FRESH manifest (old files become invisible)
    df.limit(1).write.format("manifest_jsonl").mode("overwrite").save(path)
    back3 = spark.read.format("manifest_jsonl").schema(df.schema).option("path", path).load()
    assert back3.count() == 1
    manifest = json.load(open(os.path.join(path, "_MANIFEST")))
    assert len(manifest["files"]) == 1
