"""Behavior tests for round-4l: one-way ANOVA, CUPED."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row

from whisky_wine_etl_spark import plans

SF = "/root/testdata/sf0.001"

plans.load_all()


def test_anova_identical_groups_f_zero(spark, monkeypatch):
    """Groups with identical value sets: SSB = 0, F = 0."""
    import whisky_wine_etl_spark.plans.round4l as r4l

    rows = [
        Row(event_type=t, value=float(v))
        for t in ("a", "b", "c")
        for v in (1, 2, 3, 4, 5)
    ]
    ev = spark.createDataFrame(rows)
    monkeypatch.setattr(r4l, "load_table", lambda spark, sf, name: ev)
    [res] = plans.QUERIES["stat_anova_oneway"](spark, SF).collect()
    assert res.k == 3 and res.n == 15
    assert res.ss_between == 0.0 and res.f_stat == 0.0 and res.eta_sq == 0.0


def test_anova_matches_scipy_formula(spark, monkeypatch):
    """Planted separated groups vs the textbook formula computed in
    python."""
    import whisky_wine_etl_spark.plans.round4l as r4l

    groups = {"a": [1.0, 2.0, 3.0], "b": [4.0, 5.0, 6.0], "c": [10.0, 11.0, 12.0]}
    rows = [Row(event_type=t, value=v) for t, vs in groups.items() for v in vs]
    ev = spark.createDataFrame(rows)
    monkeypatch.setattr(r4l, "load_table", lambda spark, sf, name: ev)
    [res] = plans.QUERIES["stat_anova_oneway"](spark, SF).collect()
    all_v = [v for vs in groups.values() for v in vs]
    grand = sum(all_v) / len(all_v)
    ssb = sum(len(vs) * (sum(vs) / len(vs) - grand) ** 2 for vs in groups.values())
    ssw = sum(
        (v - sum(vs) / len(vs)) ** 2 for vs in groups.values() for v in vs
    )
    f = (ssb / 2) / (ssw / 6)
    assert res.ss_between == pytest.approx(ssb, abs=1e-3)
    assert res.ss_within == pytest.approx(ssw, abs=1e-3)
    assert res.f_stat == pytest.approx(f, abs=1e-4)
    assert res.eta_sq == pytest.approx(ssb / (ssb + ssw), abs=1e-5)


def test_anova_real_corpus_sane(spark):
    [res] = plans.QUERIES["stat_anova_oneway"](spark, SF).collect()
    assert res.k == 5
    assert res.f_stat >= 0
    assert 0 <= res.eta_sq <= 1


def test_cuped_reduces_variance_when_correlated(spark, monkeypatch):
    """Users with a persistent level effect (pre and post strongly
    correlated): CUPED must cut the variance (var_ratio < 1) while
    leaving the arm means' DIFFERENCE essentially unbiased."""
    import whisky_wine_etl_spark.plans.round4l as r4l

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for uid in range(1, 101):
        # level balanced ACROSS arms (uid//2) so it's noise, not a
        # confound; arm 1 gets a true +0.5/event post-period effect
        level = float((uid // 2) % 10)
        lift = 0.5 if uid % 2 == 1 else 0.0
        for h in (0, 1):  # pre period
            rows.append(Row(ts=t0 + datetime.timedelta(hours=h), user_id=uid,
                            value=level + 0.1 * ((uid * 7 + h) % 3)))
        for h in (10, 11):  # post period
            rows.append(Row(ts=t0 + datetime.timedelta(hours=h), user_id=uid,
                            value=level + lift + 0.1 * ((uid * 5 + h) % 3)))
    ev = spark.createDataFrame(rows)
    monkeypatch.setattr(r4l, "load_table", lambda spark, sf, name: ev)
    out = {r.arm: r for r in plans.QUERIES["stat_ab_cuped"](spark, SF).collect()}
    assert set(out) == {0, 1}
    for r in out.values():
        assert r.var_ratio < 0.2  # strong pre/post correlation → big reduction
    raw_diff = out[1].mean_post - out[0].mean_post
    adj_diff = out[1].mean_adj - out[0].mean_adj
    # the planted +0.5/event (2 events) treatment effect survives CUPED
    assert raw_diff == pytest.approx(1.0, abs=0.3)
    assert adj_diff == pytest.approx(raw_diff, abs=0.2)


def test_cuped_real_corpus_shape(spark):
    out = {r.arm: r for r in plans.QUERIES["stat_ab_cuped"](spark, SF).collect()}
    assert set(out) == {0, 1}
    for r in out.values():
        assert r.n_users > 0
        assert r.var_ratio > 0
