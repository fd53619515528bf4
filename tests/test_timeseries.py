"""Time-series resampling semantics: gap buckets, forward fill,
leading-NULL behavior, deterministic same-timestamp tie-break."""

from __future__ import annotations

from whisky_wine_etl_spark.operators.timeseries import resample_ffill


def test_resample_fills_gaps_and_carries_last_value(spark):
    ev = spark.createDataFrame(
        [
            # user 1: events in hour 0 and hour 3 → hours 1,2 are gaps
            (1, 1, 10, 1.5),     # hour 0
            (2, 1, 50, 2.5),     # hour 0, later → wins the bucket
            (3, 1, 3 * 3600 + 5, 9.0),  # hour 3
            # user 2: single event
            (4, 2, 7200 + 1, 4.0),      # hour 2
        ],
        "event_id long, user_id long, sec long, value double",
    ).selectExpr("event_id", "user_id", "timestamp_seconds(sec) AS ts", "value")
    rows = {
        (r.user_id, r.bucket_ts): r
        for r in resample_ffill(ev, step_sec=3600).collect()
    }
    # user 1: 4 buckets (hours 0..3), user 2: 1 bucket
    assert len(rows) == 5
    assert rows[(1, 0)].n_events == 2
    assert rows[(1, 0)].value_ffill == 2.5       # later event wins the bucket
    assert rows[(1, 3600)].n_events == 0          # gap bucket exists
    assert rows[(1, 3600)].value_ffill == 2.5     # carried forward
    assert rows[(1, 2 * 3600)].value_ffill == 2.5
    assert rows[(1, 3 * 3600)].value_ffill == 9.0
    assert rows[(2, 7200)].n_events == 1


def test_resample_tie_break_on_same_timestamp(spark):
    ev = spark.createDataFrame(
        [(1, 1, 100, 5.0), (2, 1, 100, 7.0)],  # same second; higher event_id wins
        "event_id long, user_id long, sec long, value double",
    ).selectExpr("event_id", "user_id", "timestamp_seconds(sec) AS ts", "value")
    out = resample_ffill(ev, step_sec=3600).collect()
    assert len(out) == 1
    assert out[0].value_ffill == 7.0


def test_resample_interpolate_line_and_edges(spark):
    """Linear fill between knots; knots keep their own value; buckets
    before the first knot stay NULL (no extrapolation)."""
    from whisky_wine_etl_spark.operators.timeseries import resample_interpolate

    # knots at buckets 0 and 3 (values 10 -> 40): buckets 1,2 must be
    # 20, 30; a second user with one knot gets a single exact row
    ev = spark.createDataFrame(
        [
            (1, 1, 0, 10.0),
            (2, 1, 3 * 3600, 40.0),
            (3, 2, 7200, 5.0),
        ],
        "event_id long, user_id long, sec long, value double",
    ).selectExpr("event_id", "user_id", "timestamp_seconds(sec) AS ts", "value")
    out = {
        (r.user_id, r.bucket_ts): r.value_interp
        for r in resample_interpolate(ev, step_sec=3600).collect()
    }
    assert out[(1, 0)] == 10.0
    assert out[(1, 3600)] == 20.0
    assert out[(1, 7200)] == 30.0
    assert out[(1, 10800)] == 40.0
    assert out[(2, 7200)] == 5.0


def test_resample_interpolate_tie_break_last_event_wins(spark):
    """Two events in one bucket: the (sec, event_id)-max one is the
    knot, same deterministic rule as resample_ffill."""
    from whisky_wine_etl_spark.operators.timeseries import resample_interpolate

    ev = spark.createDataFrame(
        [(1, 1, 100, 1.0), (2, 1, 100, 9.0), (3, 1, 3700, 3.0)],
        "event_id long, user_id long, sec long, value double",
    ).selectExpr("event_id", "user_id", "timestamp_seconds(sec) AS ts", "value")
    out = {
        (r.user_id, r.bucket_ts): r.value_interp
        for r in resample_interpolate(ev, step_sec=3600).collect()
    }
    assert out[(1, 0)] == 9.0  # event_id 2 wins the tie at sec=100
    assert out[(1, 3600)] == 3.0
