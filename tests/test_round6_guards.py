"""Round-6 ADVICE fixes: loud ewma horizon guard, kmeans null-vector
tolerance (ADVICE r5 items 2 and 3)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from whisky_wine_etl_spark import plans

plans.load_all()


def test_ewma_time_decay_horizon_guard_raises(spark, tmp_path):
    """A >=1023-day span must FAIL LOUDLY (raise_error in-plan), not
    emit Inf rows that hash-verify green on both engines."""
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1, "view", 1.0, "{}"),
            (2, "2027-06-01 00:00:00", 1, "view", 2.0, "{}"),  # day 1247
        ],
        "event_id bigint, ts string, user_id bigint, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    sf_dir = str(tmp_path)
    ev.write.parquet(os.path.join(sf_dir, "events.parquet"))
    with pytest.raises(Exception, match="(?i)horizon|raise_error|1023"):
        plans.QUERIES["ts_ewma_time_decay"](spark, sf_dir).collect()


def test_ewma_time_decay_guard_passthrough_unchanged(spark, sf_small):
    """In-horizon data is untouched by the guard: score equals the
    closed-form prefix identity on a spot user (same identity the
    round-5 property test pinned)."""
    out = (
        plans.QUERIES["ts_ewma_time_decay"](spark, sf_small)
        .filter(F.col("user_id") == 1)
        .orderBy("day")
        .collect()
    )
    assert len(out) > 0
    prev_day, prev_score = None, 0.0
    for r in out:
        expect = r["day_value"] + (
            prev_score * 2.0 ** (prev_day - r["day"]) if prev_day is not None else 0.0
        )
        assert abs(r["decayed_score"] - expect) < 1e-4
        prev_day, prev_score = r["day"], r["decayed_score"]


def test_kmeans_fit_assign_tolerates_null_vectors(spark):
    """A NULL embedding row must not crash the centroid update
    (driver-side new_c[cluster] indexing, ADVICE r5); it comes back
    with NULL cluster while dense rows cluster normally."""
    from whisky_wine_etl_spark.operators.clustering import kmeans_fit_assign

    rows = [(i, [float(i % 3), float((i * 7) % 5)]) for i in range(20)]
    rows.append((99, None))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = kmeans_fit_assign(df, "vec_id", "embedding", k=3, n_iter=2).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert len(out) == 21
    assert by_id[99]["cluster"] is None
    assert all(by_id[i]["cluster"] is not None for i in range(20))
