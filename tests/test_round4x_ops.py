"""Behavior tests for round-4x: per-key OLS trend, k-fold ridge CV,
monotone-stack next-greater."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from whisky_wine_etl_spark import plans

SF = "/root/testdata/sf0.001"

plans.load_all()


def _patch(monkeypatch, tables: dict):
    import whisky_wine_etl_spark.plans.round4x as r4x

    monkeypatch.setattr(r4x, "load_table", lambda s, sf, name: tables[name])


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=ts,
                user_id=u,
                event_type="click",
                value=float(v),
                props="{}",
            )
            for i, (u, ts, v) in enumerate(rows)
        ]
    )


def test_trend_exact_linear_series(spark, monkeypatch):
    """User 1 produces i+1 events on day i for 6 days: slope exactly 1,
    r² exactly 1."""
    rows = []
    for day in range(6):
        for k in range(day + 1):
            rows.append(
                (1, dt.datetime(2024, 1, 1 + day, 10, 0, k), 1.0)
            )
    _patch(monkeypatch, {"events": _ev(spark, rows)})
    out = plans.QUERIES["ts_trend_per_key"](spark, SF).collect()
    assert len(out) == 1
    assert out[0].user_id == 1
    assert out[0].slope == pytest.approx(1.0)
    assert out[0].r2 == pytest.approx(1.0)


def test_trend_requires_five_days_and_variance(spark, monkeypatch):
    """4 active days → excluded; constant daily count → excluded."""
    rows = [(1, dt.datetime(2024, 1, 1 + d, 8), 1.0) for d in range(4)]
    rows += [(2, dt.datetime(2024, 1, 1 + d, 9), 1.0) for d in range(6)]  # y≡1
    _patch(monkeypatch, {"events": _ev(spark, rows)})
    assert plans.QUERIES["ts_trend_per_key"](spark, SF).count() == 0


def test_ridge_cv_five_folds_and_disjoint_counts(spark):
    rows = plans.QUERIES["ml_ridge_kfold_cv"](spark, SF).collect()
    assert [r.fold for r in rows] == [0, 1, 2, 3, 4]
    total = rows[0].n_train + rows[0].n_test
    for r in rows:
        # every fold partitions the same dataset
        assert r.n_train + r.n_test == total
        assert r.rmse >= 0
    # leave-one-fold-out models share 4/5 of their data: the fold
    # models must agree closely with each other
    slopes = [r.slope for r in rows]
    assert max(slopes) - min(slopes) < 0.05


def test_next_higher_ascending_and_descending(spark, monkeypatch):
    """Ascending values: every event but the last has a next-higher
    one second later. Descending: none do."""
    asc = [(1, dt.datetime(2024, 1, 1, 0, 0, s), s) for s in range(5)]
    desc = [(2, dt.datetime(2024, 1, 1, 0, 0, s), 10 - s) for s in range(5)]
    _patch(monkeypatch, {"events": _ev(spark, asc + desc)})
    out = {r.user_id: r for r in plans.QUERIES["ts_next_higher_value"](spark, SF).collect()}
    assert out[1].n_events == 5
    assert out[1].n_with_next == 4
    assert out[1].avg_wait_s == pytest.approx(1.0)
    assert out[2].n_with_next == 0
    assert out[2].avg_wait_s is None


def test_next_higher_skips_equal_values(spark, monkeypatch):
    """Strictly greater: a later equal value does not count, a later
    higher one further away does."""
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), 5),
        (1, dt.datetime(2024, 1, 1, 0, 0, 1), 5),
        (1, dt.datetime(2024, 1, 1, 0, 0, 4), 6),
    ]
    _patch(monkeypatch, {"events": _ev(spark, rows)})
    out = plans.QUERIES["ts_next_higher_value"](spark, SF).collect()[0]
    assert out.n_with_next == 2
    # waits: event0 → +4s, event1 → +3s
    assert out.avg_wait_s == pytest.approx(3.5)
