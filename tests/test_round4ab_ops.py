"""Behavior tests for round-4ab: chi² residuals, skew profile,
retention decay fit."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import Row

from whisky_wine_etl_spark import plans

SF = "/root/testdata/sf0.001"

plans.load_all()


def _patch(monkeypatch, tables: dict):
    import whisky_wine_etl_spark.plans.round4ab as r4ab

    monkeypatch.setattr(r4ab, "load_table", lambda s, sf, name: tables[name])


def test_chi2_residuals_independent_table_near_zero(spark, monkeypatch):
    """A perfectly independent 2×2 table has zero residual in every
    cell (expected == observed exactly)."""
    rows = []
    key = 0
    for prio, status, n in [("H", "F", 40), ("H", "O", 60), ("L", "F", 20), ("L", "O", 30)]:
        for _ in range(n):
            key += 1
            rows.append(Row(o_orderkey=key, o_orderpriority=prio, o_orderstatus=status))
    _patch(monkeypatch, {"orders": spark.createDataFrame(rows)})
    out = plans.QUERIES["stat_chi2_residuals"](spark, SF).collect()
    assert len(out) == 4
    for r in out:
        assert r.std_residual == pytest.approx(0.0, abs=1e-9)
        assert r.expected == pytest.approx(r.observed)


def test_chi2_residuals_signs(spark):
    """Residuals sum ~0 per row/column family and expected > 0."""
    out = plans.QUERIES["stat_chi2_residuals"](spark, SF).collect()
    assert out
    for r in out:
        assert r.expected > 0


def test_skew_profile_uniform_keys_gini_zero(spark, monkeypatch):
    """Every key with the same count → Gini exactly 0, max == p50."""
    rows = [
        Row(o_orderkey=i, o_custkey=i % 10, o_orderpriority="X", o_orderstatus="O")
        for i in range(50)
    ]
    _patch(monkeypatch, {"orders": spark.createDataFrame(rows)})
    out = plans.QUERIES["diag_key_skew_profile"](spark, SF).collect()[0]
    assert out.n_keys == 10 and out.n_rows == 50
    gini = out.two_rank_sum / (out.n_keys * out.n_rows) - (out.n_keys + 1) / out.n_keys
    assert gini == pytest.approx(0.0, abs=1e-9)
    assert out.p50 == out.max_rows == 5
    assert out.max_rows / out.n_rows == pytest.approx(0.1)


def test_skew_profile_hot_key(spark, monkeypatch):
    """One key with 91 rows among 10 keys of 1: gini high, top share
    dominant."""
    rows = [Row(o_orderkey=i, o_custkey=0, o_orderpriority="X", o_orderstatus="O") for i in range(91)]
    rows += [Row(o_orderkey=100 + k, o_custkey=k, o_orderpriority="X", o_orderstatus="O") for k in range(1, 10)]
    _patch(monkeypatch, {"orders": spark.createDataFrame(rows)})
    out = plans.QUERIES["diag_key_skew_profile"](spark, SF).collect()[0]
    assert out.max_rows == 91
    assert out.max_rows / out.n_rows == pytest.approx(0.91)
    gini = out.two_rank_sum / (out.n_keys * out.n_rows) - (out.n_keys + 1) / out.n_keys
    assert gini > 0.7


def test_retention_decay_exact_halving(spark, monkeypatch):
    """100 users sign up day 0; 40 return day 1, 20 day 2, 10 day 3:
    rate halves per day → slope = -ln 2, half-life = 1 day."""
    t0 = dt.date(2024, 1, 1)
    rows = []
    eid = 0

    def ev(u, day):
        nonlocal eid
        eid += 1
        return Row(
            event_id=eid,
            ts=dt.datetime(t0.year, t0.month, t0.day, 12) + dt.timedelta(days=day),
            user_id=u,
            event_type="click",
            value=1.0,
            props="{}",
        )

    for u in range(100):
        rows.append(ev(u, 0))
    for u in range(40):
        rows.append(ev(u, 1))
    for u in range(20):
        rows.append(ev(u, 2))
    for u in range(10):
        rows.append(ev(u, 3))
    _patch(monkeypatch, {"events": spark.createDataFrame(rows)})
    out = plans.QUERIES["events_retention_decay_fit"](spark, SF).collect()[0]
    assert out.n_points == 3
    assert out.decay_slope == pytest.approx(-math.log(2), abs=1e-6)
    assert out.half_life_days == pytest.approx(1.0, abs=1e-6)
