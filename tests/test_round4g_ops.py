"""Behavior tests for round-4g: MAD outliers, CUSUM rate drift,
time-decay scoring, k-anonymity ladder."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from whisky_wine_etl_spark import plans
from whisky_wine_etl_spark.catalog import load_table

SF = "/root/testdata/sf0.001"

plans.load_all()


def test_mad_outliers_planted(spark, monkeypatch):
    """A tight cluster plus two planted extremes: MAD ignores the
    extremes (robustness), the modified z-score flags exactly them."""
    import whisky_wine_etl_spark.plans.round4g as r4g

    base = [float(v) for v in (10, 11, 12, 13, 14, 10, 11, 12, 13)]
    rows = [Row(event_type="click", value=v) for v in base + [1000.0, -500.0]]
    ev = spark.createDataFrame(rows)
    monkeypatch.setattr(r4g, "load_table", lambda spark, sf, name: ev)
    [res] = plans.QUERIES["stat_mad_outliers"](spark, SF).collect()
    assert res.n == 11
    assert res.med == 12.0  # unmoved by the planted extremes
    assert res.mad == 1.0
    assert res.n_outliers == 2


def test_mad_outliers_groups_are_independent(spark):
    out = {r.event_type: r for r in plans.QUERIES["stat_mad_outliers"](spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    counts = {
        r.event_type: r.c
        for r in ev.groupBy("event_type").agg(F.count("*").alias("c")).collect()
    }
    assert set(out) == set(counts)
    for et, r in out.items():
        assert r.n == counts[et]
        assert 0 <= r.n_outliers <= r.n
        assert r.mad > 0


def test_cusum_uniform_rate_never_flags(spark, monkeypatch):
    """A perfectly uniform hourly rate has zero deviation everywhere."""
    import datetime

    import whisky_wine_etl_spark.plans.round4g as r4g

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        Row(ts=t0 + datetime.timedelta(hours=h, minutes=m), user_id=1)
        for h in range(24)
        for m in (0, 20, 40)
    ]
    ev = spark.createDataFrame(rows)
    monkeypatch.setattr(r4g, "load_table", lambda spark, sf, name: ev)
    out = plans.QUERIES["ts_cusum_rate_drift"](spark, SF).collect()
    assert len(out) == 24
    # round-6 all-integer shape: exact BIGINT numerator, no division
    assert all(r.cusum_num == 0 and not r.drift_flag for r in out)


def test_cusum_burst_flags_and_recovers(spark, monkeypatch):
    """A front-loaded burst drives the cumulative count above the 2%
    band; the final hour always closes at deviation 0."""
    import datetime

    import whisky_wine_etl_spark.plans.round4g as r4g

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        Row(ts=t0 + datetime.timedelta(hours=h, seconds=i), user_id=1)
        for h in range(10)
        for i in range(100 if h == 0 else 10)
    ]
    ev = spark.createDataFrame(rows)
    monkeypatch.setattr(r4g, "load_table", lambda spark, sf, name: ev)
    out = sorted(
        plans.QUERIES["ts_cusum_rate_drift"](spark, SF).collect(),
        key=lambda r: r.hour_us,
    )
    assert out[0].drift_flag  # burst hour way above uniform expectation
    assert out[-1].cusum_num == 0 and not out[-1].drift_flag


def test_decay_score_closed_form(spark, monkeypatch):
    """Two events 7 days apart: the older one contributes value·e^-1."""
    import datetime

    import whisky_wine_etl_spark.plans.round4g as r4g

    t0 = datetime.datetime(2024, 1, 8)
    rows = [
        Row(ts=t0, user_id=1, value=2.0),
        Row(ts=t0 - datetime.timedelta(days=7), user_id=1, value=3.0),
    ]
    ev = spark.createDataFrame(rows)
    monkeypatch.setattr(r4g, "load_table", lambda spark, sf, name: ev)
    [res] = plans.QUERIES["events_decay_score"](spark, SF).collect()
    assert res.n_events == 2
    assert res.decay_score == pytest.approx(2.0 + 3.0 * math.exp(-1.0), abs=1e-4)


def test_decay_score_bounded_by_plain_sum(spark):
    """Decay weights are in (0,1]: every score is ≤ the undecayed sum
    and > 0 for users whose values are all positive."""
    out = {r.user_id: r.decay_score for r in plans.QUERIES["events_decay_score"](spark, SF).collect()}
    plain = {
        r.user_id: r.s
        for r in load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.sum(F.abs("value")).alias("s"))
        .collect()
    }
    assert set(out) == set(plain)
    for uid, score in out.items():
        assert abs(score) <= plain[uid] + 1e-6


def test_k_anonymity_ladder_monotone(spark):
    """Generalizing can only merge classes: rows at risk shrink (or
    hold) as the QI coarsens, and the fully-generalized level has one
    class with nothing at risk (table is bigger than k)."""
    out = {r.level: r for r in plans.QUERIES["privacy_k_anonymity"](spark, SF).collect()}
    assert set(out) == {0, 1, 3}
    assert out[3].n_groups == 1 and out[3].rows_at_risk == 0
    assert out[1].n_groups <= out[0].n_groups
    assert out[1].rows_at_risk <= out[0].rows_at_risk
    n_rows = load_table(spark, SF, "customer").count()
    for r in out.values():
        assert r.n_small_groups <= r.n_groups
        assert r.rows_at_risk <= n_rows


def test_k_anonymity_known_fixture(spark, monkeypatch):
    import whisky_wine_etl_spark.plans.round4g as r4g

    rows = (
        [Row(c_nationkey=1, c_mktsegment="A")] * 6
        + [Row(c_nationkey=1, c_mktsegment="B")] * 2
        + [Row(c_nationkey=2, c_mktsegment="A")] * 3
    )
    cust = spark.createDataFrame(rows)
    monkeypatch.setattr(r4g, "load_table", lambda spark, sf, name: cust)
    out = {r.level: r for r in plans.QUERIES["privacy_k_anonymity"](spark, SF).collect()}
    # level 0: classes (1,A)=6 ok, (1,B)=2 small, (2,A)=3 small
    assert out[0].n_groups == 3 and out[0].n_small_groups == 2
    assert out[0].rows_at_risk == 5
    # level 1: nation 1 has 8 rows (ok), nation 2 has 3 (small)
    assert out[1].n_groups == 2 and out[1].rows_at_risk == 3
    assert out[3].n_groups == 1 and out[3].rows_at_risk == 0
