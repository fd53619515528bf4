"""Behavior tests for round-4k: OLS normal equations, capped
sessionization, dynamic pivot."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from whisky_wine_etl_spark import plans
from whisky_wine_etl_spark.catalog import load_table

SF = "/root/testdata/sf0.001"

plans.load_all()


def test_ols_recovers_planted_coefficients(spark, monkeypatch):
    """y = 5 + 2·x1 − 3·x2 exactly → OLS must recover (5, 2, −3) with
    R² = 1."""
    import whisky_wine_etl_spark.plans.round4k as r4k

    rows = [
        Row(
            l_quantity=float(i % 7),
            l_discount=float((i * 3) % 5),
            l_extendedprice=5.0 + 2.0 * (i % 7) - 3.0 * ((i * 3) % 5),
        )
        for i in range(200)
    ]
    li = spark.createDataFrame(rows)
    monkeypatch.setattr(r4k, "load_table", lambda spark, sf, name: li)
    [res] = plans.QUERIES["ml_ols_normal_eq"](spark, SF).collect()
    assert res.n == 200
    assert res.b1 == pytest.approx(2.0, abs=1e-5)
    assert res.b2 == pytest.approx(-3.0, abs=1e-5)
    assert res.b0 == pytest.approx(5.0, abs=1e-3)
    assert res.r2 == pytest.approx(1.0, abs=1e-6)


def test_ols_matches_numpy_lstsq(spark):
    import numpy as np

    [res] = plans.QUERIES["ml_ols_normal_eq"](spark, SF).collect()
    rows = (
        load_table(spark, SF, "lineitem")
        .select("l_quantity", "l_discount", "l_extendedprice")
        .collect()
    )
    X = np.array([[1.0, r.l_quantity, r.l_discount] for r in rows])
    y = np.array([r.l_extendedprice for r in rows])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert res.b0 == pytest.approx(beta[0], rel=1e-4)
    assert res.b1 == pytest.approx(beta[1], rel=1e-4)
    assert res.b2 == pytest.approx(beta[2], rel=1e-4)
    pred = X @ beta
    r2 = 1 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()
    assert res.r2 == pytest.approx(r2, abs=1e-4)


def test_capped_sessions_split_long_session(spark, monkeypatch):
    """Events every 20 min for 10 h: one gap session (no 30-min gap),
    but the 4 h cap splits it into chunks 0,1,2."""
    import whisky_wine_etl_spark.plans.round4k as r4k

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        Row(ts=t0 + datetime.timedelta(minutes=20 * i), user_id=1, event_id=i)
        for i in range(31)  # 0..600 min
    ]
    ev = spark.createDataFrame(rows)
    monkeypatch.setattr(r4k, "load_table", lambda spark, sf, name: ev)
    out = sorted(
        plans.QUERIES["events_sessionize_capped"](spark, SF).collect(),
        key=lambda r: r.cap_chunk,
    )
    assert [r.gap_session for r in out] == [1, 1, 1]
    assert [r.cap_chunk for r in out] == [0, 1, 2]
    # chunk 0 covers minutes 0..220 (12 events), chunk 1 240..460, chunk 2 480..600
    assert [r.n_events for r in out] == [12, 12, 7]


def test_capped_sessions_refine_uncapped(spark):
    """Summing capped chunks per (user, gap_session) reproduces the
    plain sessionization's event counts."""
    capped = plans.QUERIES["events_sessionize_capped"](spark, SF)
    agg = {
        (r.user_id, r.gap_session): r.n
        for r in capped.groupBy("user_id", "gap_session")
        .agg(F.sum("n_events").alias("n"))
        .collect()
    }
    plain = {
        (r.user_id, r.session_no): r.n_events
        for r in plans.QUERIES["events_sessionize"](spark, SF).collect()
    }
    assert agg == plain


def test_dynamic_pivot_discovers_all_priorities(spark):
    df = plans.QUERIES["pivot_dynamic_priority"](spark, SF)
    cols = set(df.columns)
    assert cols == {
        "o_orderstatus",
        "1-URGENT",
        "2-HIGH",
        "3-MEDIUM",
        "4-NOT SPECIFIED",
        "5-LOW",
    }
    # pivoted cells reconcile with the plain group-by
    rows = {r.o_orderstatus: r for r in df.collect()}
    plain = {
        (r.o_orderstatus, r.o_orderpriority): r.s
        for r in load_table(spark, SF, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("s"))
        .collect()
    }
    for (st, pr), v in plain.items():
        assert rows[st][pr] == v
