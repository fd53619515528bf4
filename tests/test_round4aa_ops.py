"""Behavior tests for round-4aa: time-weighted average, rolling
slope, Wilson CI, two-pass weighted median."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from whisky_wine_etl_spark import plans

SF = "/root/testdata/sf0.001"

plans.load_all()


def _patch(monkeypatch, tables: dict):
    import whisky_wine_etl_spark.plans.round4aa as r4aa

    monkeypatch.setattr(r4aa, "load_table", lambda s, sf, name: tables[name])


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            Row(event_id=i, ts=ts, user_id=u, event_type="click",
                value=float(v), props="{}")
            for i, (u, ts, v) in enumerate(rows)
        ]
    )


def test_twa_weights_by_holding_time(spark, monkeypatch):
    """value 10 held 9 s then value 0 held 1 s: TWA = 9, naive = 5.
    (The final observation has no duration and drops out.)"""
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 10.0),
        (1, t0 + dt.timedelta(seconds=9), 0.0),
        (1, t0 + dt.timedelta(seconds=10), 99.0),
    ]
    _patch(monkeypatch, {"events": _ev(spark, rows)})
    out = plans.QUERIES["ts_time_weighted_avg"](spark, SF).collect()[0]
    assert out.n_segments == 2
    assert out.span_us == 10_000_000
    assert out.twa_value == pytest.approx(9.0)
    assert out.naive_avg == pytest.approx(5.0)


def test_rolling_slope_linear_series_is_one(spark, monkeypatch):
    """Daily count grows by exactly 1/day: every ≥3-day frame fits
    slope 1."""
    rows = []
    for day in range(8):
        for k in range(day + 1):
            rows.append((1, dt.datetime(2024, 1, 1 + day, 6, 0, k), 1.0))
    _patch(monkeypatch, {"events": _ev(spark, rows)})
    out = plans.QUERIES["window_rolling_slope"](spark, SF).collect()
    assert len(out) == 6  # days 3..8 have ≥3-day frames
    assert all(r.slope7 == pytest.approx(1.0) for r in out)
    # the range frame caps at 7 calendar days
    assert max(r.n_days for r in out) == 7


def test_rolling_slope_range_frame_respects_gaps(spark, monkeypatch):
    """Days 1,2 then a 10-day gap then 13,14: the later frames must
    NOT include the pre-gap days (calendar range, not row count)."""
    days = [1, 2, 13, 14]
    rows = [(1, dt.datetime(2024, 1, d, 6), 1.0) for d in days]
    _patch(monkeypatch, {"events": _ev(spark, rows)})
    # every frame has n_days == 2 → below the ≥3 cutoff → empty result
    assert plans.QUERIES["window_rolling_slope"](spark, SF).count() == 0


def test_wilson_ci_brackets_p_hat_and_stays_in_unit(spark):
    rows = plans.QUERIES["stat_wilson_ci"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.wilson_lo <= r.p_hat <= r.wilson_hi <= 1.0


def test_weighted_median_hand_case(spark, monkeypatch):
    """Prices 100 (w=1), 200 (w=1), 300 (w=8): midpoint of 10 units
    of weight falls in the 300 block."""
    orders = spark.createDataFrame(
        [
            Row(o_orderkey=1, o_totalprice=100.0),
            Row(o_orderkey=2, o_totalprice=200.0),
            Row(o_orderkey=3, o_totalprice=300.0),
        ]
    )
    li = spark.createDataFrame(
        [Row(l_orderkey=1)] + [Row(l_orderkey=2)] + [Row(l_orderkey=3)] * 8
    )
    _patch(monkeypatch, {"orders": orders, "lineitem": li})
    out = plans.QUERIES["agg_weighted_median_2pass"](spark, SF).collect()[0]
    assert out.total_weight == 10
    assert out.weighted_median == pytest.approx(300.0)
