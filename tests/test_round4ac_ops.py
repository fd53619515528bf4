"""Behavior tests for round-4ac: DAU/WAU/MAU ladder, GROUP BY ALL."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from whisky_wine_etl_spark import plans

SF = "/root/testdata/sf0.001"

plans.load_all()


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            Row(event_id=i, ts=ts, user_id=u, event_type="click",
                value=1.0, props="{}")
            for i, (u, ts) in enumerate(rows)
        ]
    )


def test_dau_wau_mau_trailing_windows(spark, monkeypatch):
    """User 1 active day 1 only; user 2 active days 1 and 5.
    Day 5: DAU=1 (user 2), WAU=2 (both within 7), stickiness=1/2."""
    import whisky_wine_etl_spark.plans.round4ac as r4ac

    d = lambda day: dt.datetime(2024, 1, day, 12)
    rows = [(1, d(1)), (2, d(1)), (2, d(5))]
    monkeypatch.setattr(
        r4ac, "load_table", lambda s, sf, n: _ev(spark, rows)
    )
    out = {r.d.isoformat(): r for r in plans.QUERIES["events_dau_wau_mau"](spark, SF).collect()}
    day1, day5 = out["2024-01-01"], out["2024-01-05"]
    assert (day1.dau, day1.wau, day1.mau) == (2, 2, 2)
    assert (day5.dau, day5.wau, day5.mau) == (1, 2, 2)
    assert day5.stickiness == pytest.approx(0.5)
    # multiple activity days for one user never double-count
    assert day1.stickiness == pytest.approx(1.0)


def test_dau_wau_mau_invariants(spark):
    rows = plans.QUERIES["events_dau_wau_mau"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.dau <= r.wau <= r.mau
        assert 0 < r.stickiness <= 1.0


def test_group_by_all_matches_explicit(spark):
    a = plans.QUERIES["sql_group_by_all"](spark, SF).collect()
    from whisky_wine_etl_spark.catalog import load_table
    import pyspark.sql.functions as F

    b = (
        load_table(spark, SF, "orders")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderpriority", "o_orderstatus")
        .collect()
    )
    assert list(map(tuple, a)) == list(map(tuple, b))
