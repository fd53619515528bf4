"""Unit semantics for the as-of join operator (backward/forward,
ties, tolerance, no-match nulls) on a handcrafted fixture."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from whisky_wine_etl_spark.operators.asof import asof_join


def _t(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [(1, "a", _t(10)), (2, "a", _t(20)), (3, "b", _t(15)), (4, "c", _t(5))],
        "lid int, key string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", _t(8), 100),
            ("a", _t(20), 200),   # equal-timestamp: counts for backward AND forward
            ("a", _t(31), 300),
            ("b", _t(40), 400),   # only after left's b row
        ],
        "key string, rts timestamp, rv int",
    )
    return left, right


def _collect(df):
    return {r.lid: (r.rv,) for r in df.collect()}


def test_backward(spark, sides):
    left, right = sides
    out = asof_join(left, right, on="ts", by_left="key", by_right="key",
                    right_time="rts", value_cols=["rv"])
    got = _collect(out)
    assert got[1] == (100,)   # latest right <= 10s is 8s
    assert got[2] == (200,)   # tie at 20s matches (<=)
    assert got[3] == (None,)  # b has no right row before 15s
    assert got[4] == (None,)  # c never appears on the right


def test_forward(spark, sides):
    left, right = sides
    out = asof_join(left, right, on="ts", by_left="key", by_right="key",
                    right_time="rts", value_cols=["rv"], direction="forward")
    got = _collect(out)
    assert got[1] == (200,)   # earliest right >= 10s is 20s
    assert got[2] == (200,)   # tie matches
    assert got[3] == (400,)
    assert got[4] == (None,)


def test_backward_tolerance(spark, sides):
    left, right = sides
    out = asof_join(left, right, on="ts", by_left="key", by_right="key",
                    right_time="rts", value_cols=["rv"],
                    tolerance=F.expr("INTERVAL 2 SECONDS"))
    got = _collect(out)
    assert got[1] == (100,)   # gap 2s ≤ 2s → kept
    assert got[2] == (200,)   # gap 0
    assert got[3] == (None,)
    assert got[4] == (None,)


def test_forward_tolerance(spark, sides):
    left, right = sides
    out = asof_join(left, right, on="ts", by_left="key", by_right="key",
                    right_time="rts", value_cols=["rv"], direction="forward",
                    tolerance=F.expr("INTERVAL 5 SECONDS"))
    got = _collect(out)
    assert got[1] == (None,)  # nearest forward is 20s, gap 10s > 5s
    assert got[2] == (200,)
    assert got[3] == (None,)  # gap 25s
    assert got[4] == (None,)


def test_keeps_all_left_rows_and_columns(spark, sides):
    left, right = sides
    out = asof_join(left, right, on="ts", by_left="key", by_right="key",
                    right_time="rts", value_cols=["rv"])
    assert out.count() == left.count()
    assert set(out.columns) == {"lid", "key", "ts", "rv"}
