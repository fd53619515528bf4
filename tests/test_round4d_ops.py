"""Behavior/invariant tests for the round-4d operators: OHLC
resampling, Mann-Whitney U, Gini, mutual information,
autocorrelation, seasonal-naive backtest, blocked fuzzy ER, rolling
distinct, geometric/harmonic means."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from whisky_wine_etl_spark import plans
from whisky_wine_etl_spark.catalog import load_table

SF = "/root/testdata/sf0.001"

plans.load_all()


def _with_events(monkeypatch, df):
    """Point round4d's table loader at a synthetic events frame."""
    import whisky_wine_etl_spark.plans.round4d as r4d

    monkeypatch.setattr(r4d, "load_table", lambda spark, sf, name: df)


# ---------------------------------------------------------------------------
# OHLC
# ---------------------------------------------------------------------------


def test_ohlc_invariants(spark):
    bars = plans.QUERIES["ts_resample_ohlc"](spark, SF).collect()
    ev_n = load_table(spark, SF, "events").count()
    assert sum(b.volume for b in bars) == ev_n
    for b in bars:
        assert b.low <= b.open <= b.high, b
        assert b.low <= b.close <= b.high, b


def test_ohlc_tie_break_is_event_id(spark, monkeypatch):
    """Two rows on the SAME timestamp: open/close pick by event_id."""
    t = dt.datetime(2024, 1, 1, 10, 30, 0)
    df = spark.createDataFrame(
        [
            Row(event_id=2, ts=t, user_id=1, event_type="click", value=99.0, props="{}"),
            Row(event_id=1, ts=t, user_id=1, event_type="click", value=11.0, props="{}"),
            Row(event_id=3, ts=t, user_id=1, event_type="click", value=55.0, props="{}"),
        ]
    )
    _with_events(monkeypatch, df)
    [bar] = plans.QUERIES["ts_resample_ohlc"](spark, SF).collect()
    assert bar.open == 11.0 and bar.close == 55.0
    assert bar.high == 99.0 and bar.low == 11.0


# ---------------------------------------------------------------------------
# Mann-Whitney U
# ---------------------------------------------------------------------------


def test_mann_whitney_matches_bruteforce(spark):
    """Recompute U from raw rows with literal average ranks."""
    [res] = plans.QUERIES["stat_mann_whitney_u"](spark, SF).collect()
    rows = (
        load_table(spark, SF, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("event_type", "value")
        .collect()
    )
    vals = sorted((r.value, r.event_type) for r in rows)
    # average rank per value
    from collections import defaultdict

    pos = defaultdict(list)
    for i, (v, g) in enumerate(vals, start=1):
        pos[v].append(i)
    avg_rank = {v: sum(ix) / len(ix) for v, ix in pos.items()}
    r1 = sum(avg_rank[v] for v, g in vals if g == "click")
    n1 = sum(1 for _, g in vals if g == "click")
    n2 = len(vals) - n1
    u1 = r1 - n1 * (n1 + 1) / 2.0
    assert res.n1 == n1 and res.n2 == n2
    assert res.u1 == pytest.approx(u1, abs=1e-3)


def test_mann_whitney_tied_values(spark, monkeypatch):
    """All-tied data: U = n1·n2/2 exactly and z is 0/NaN-safe."""
    t = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            Row(event_id=i, ts=t, user_id=1,
                event_type="click" if i % 2 else "purchase", value=5.0, props="{}")
            for i in range(8)
        ]
    )
    _with_events(monkeypatch, df)
    [res] = plans.QUERIES["stat_mann_whitney_u"](spark, SF).collect()
    assert res.u1 == pytest.approx(res.n1 * res.n2 / 2.0)


# ---------------------------------------------------------------------------
# Gini
# ---------------------------------------------------------------------------


def test_gini_bounds(spark):
    [res] = plans.QUERIES["stat_gini_revenue"](spark, SF).collect()
    assert 0.0 <= res.gini < 1.0
    assert res.n_customers > 0


def test_gini_equal_distribution_is_zero(spark, monkeypatch):
    d = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            Row(o_orderkey=i, o_custkey=i, o_orderstatus="F",
                o_totalprice=100.0, o_orderdate=d, o_orderpriority="1-URGENT")
            for i in range(10)
        ]
    )
    _with_events(monkeypatch, df)
    [res] = plans.QUERIES["stat_gini_revenue"](spark, SF).collect()
    assert res.gini == pytest.approx(0.0, abs=1e-9)


# ---------------------------------------------------------------------------
# Mutual information
# ---------------------------------------------------------------------------


def test_mi_nonnegative_and_nmi_bounded(spark):
    [res] = plans.QUERIES["stat_mutual_information"](spark, SF).collect()
    assert res.mi_nats >= 0.0
    assert 0.0 <= res.nmi <= 1.0


def test_mi_independent_columns_is_zero(spark, monkeypatch):
    """A perfectly balanced product distribution has MI exactly 0."""
    d = dt.datetime(2024, 1, 1)
    rows = []
    k = 0
    for s in ["A", "B"]:
        for p in ["X", "Y"]:
            for _ in range(5):
                rows.append(
                    Row(o_orderkey=k, o_custkey=k, o_orderstatus=s,
                        o_totalprice=1.0, o_orderdate=d, o_orderpriority=p)
                )
                k += 1
    _with_events(monkeypatch, spark.createDataFrame(rows))
    [res] = plans.QUERIES["stat_mutual_information"](spark, SF).collect()
    assert res.mi_nats == pytest.approx(0.0, abs=1e-9)


# ---------------------------------------------------------------------------
# Autocorrelation / seasonal naive
# ---------------------------------------------------------------------------


def _hourly_events(spark, values_by_hour):
    rows = [
        Row(event_id=i, ts=dt.datetime(2024, 1, 1) + dt.timedelta(hours=h),
            user_id=1, event_type="click", value=float(v), props="{}")
        for i, (h, v) in enumerate(values_by_hour)
    ]
    return spark.createDataFrame(rows)


def test_acf_perfect_daily_period(spark, monkeypatch):
    """A 24h-periodic series with within-day variance: acf_24 = 1."""
    vals = [(h, 10.0 + (h % 24)) for h in range(96)]
    _with_events(monkeypatch, _hourly_events(spark, vals))
    [res] = plans.QUERIES["ts_autocorr_hourly"](spark, SF).collect()
    assert res.acf_24 == pytest.approx(1.0, abs=1e-6)


def test_acf_gap_breaks_pairs(spark, monkeypatch):
    """A missing hour must remove its lag-1 pair, not slide over it."""
    vals = [(h, 1.0 + h) for h in [0, 1, 2, 5, 6]]  # gap at 3-4
    _with_events(monkeypatch, _hourly_events(spark, vals))
    [res] = plans.QUERIES["ts_autocorr_hourly"](spark, SF).collect()
    # pairs: (1,0) (2,1) (6,5) — NOT (5,2)
    assert res.n_pairs_1 == 3


def test_seasonal_naive_perfect_period_zero_error(spark, monkeypatch):
    vals = [(h, 10.0 + (h % 24)) for h in range(72)]
    _with_events(monkeypatch, _hourly_events(spark, vals))
    [res] = plans.QUERIES["ts_forecast_seasonal_naive"](spark, SF).collect()
    assert res.mae == pytest.approx(0.0, abs=1e-6)
    assert res.n_scored == 48


# ---------------------------------------------------------------------------
# Blocked fuzzy ER
# ---------------------------------------------------------------------------


def _lev(a: str, b: str) -> int:
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_er_blocking_full_recall_vs_bruteforce(spark):
    """The blocked plan finds EVERY lev<=1 pair the O(n²) scan finds."""
    got = {
        (r.custkey_a, r.custkey_b)
        for r in plans.QUERIES["er_blocked_fuzzy_pairs"](spark, SF).collect()
    }
    names = (
        load_table(spark, SF, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name")
        .collect()
    )
    want = {
        (a.c_custkey, b.c_custkey)
        for i, a in enumerate(names)
        for b in names[i + 1:]
        if _lev(a.c_name, b.c_name) <= 1
    }
    # normalize pair order
    want = {(min(x, y), max(x, y)) for x, y in want}
    assert got == want and want  # non-empty on this data


def test_er_catches_mid_string_edit(spark, monkeypatch):
    """An edit in the FIRST block half is caught by the last-half
    pass (the recall case single-key blocking misses)."""
    df = spark.createDataFrame(
        [
            Row(c_custkey=1, c_name="Customer#000100002", c_nationkey=1,
                c_acctbal=0.0, c_mktsegment="BUILDING"),
            Row(c_custkey=2, c_name="Customer#000200002", c_nationkey=1,
                c_acctbal=0.0, c_mktsegment="BUILDING"),
        ]
    )
    _with_events(monkeypatch, df)
    rows = plans.QUERIES["er_blocked_fuzzy_pairs"](spark, SF).collect()
    assert [(r.custkey_a, r.custkey_b, r.dist) for r in rows] == [(1, 2, 1)]


# ---------------------------------------------------------------------------
# Rolling distinct
# ---------------------------------------------------------------------------


def test_rolling_distinct_matches_bruteforce(spark):
    got = {
        r.event_id: r.n_types_24h
        for r in plans.QUERIES["window_rolling_distinct"](spark, SF).collect()
    }
    ev = load_table(spark, SF, "events").select(
        "event_id", "user_id", "ts", "event_type"
    ).collect()
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    for r in ev:
        lo = r.ts - dt.timedelta(hours=24)
        want = len(
            {x.event_type for x in by_user[r.user_id] if lo <= x.ts <= r.ts}
        )
        assert got[r.event_id] == want, r


# ---------------------------------------------------------------------------
# Means inequality
# ---------------------------------------------------------------------------


def test_am_gm_hm_ordering(spark):
    rows = plans.QUERIES["agg_geo_harmonic_means"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.mean_arith >= r.mean_geo >= r.mean_harm > 0, r
