"""Behavior tests for round-4w: checkpoint restart/resume stream."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from whisky_wine_etl_spark import plans

SF = "/root/testdata/sf0.001"

plans.load_all()


def test_checkpoint_resume_no_duplicates_and_complete(spark):
    """After the two-phase run the sink must hold every qualifying
    event exactly once — duplicate event_ids would mean the restart
    re-processed phase-1 files; missing ones would mean the resume
    skipped the late file."""
    import whisky_wine_etl_spark.plans.round4w as r4w

    out = plans.QUERIES["stream_checkpoint_resume"](spark, SF)
    total = out.agg(F.sum("n")).collect()[0][0]

    root = r4w._root(spark, SF)
    sink = spark.read.parquet(os.path.join(root, "sink"))
    assert sink.count() == total
    assert sink.select("event_id").distinct().count() == sink.count()

    from whisky_wine_etl_spark.catalog import load_table

    expected = load_table(spark, SF, "events").filter(F.col("value") > 25).count()
    assert sink.count() == expected

    # the landing dir really saw a staged arrival: 3 files, and the
    # checkpoint recorded both runs (two offset log entries)
    assert len(glob.glob(os.path.join(root, "landing", "part-*.parquet"))) == 3
    offsets = glob.glob(os.path.join(root, "ck", "offsets", "*"))
    assert len([p for p in offsets if not p.endswith(".crc")]) >= 2
