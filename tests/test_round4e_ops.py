"""Behavior tests for round-4e: KS cohort drift, cumulative unique
users, Pareto decile shares."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whisky_wine_etl_spark import plans
from whisky_wine_etl_spark.catalog import load_table

SF = "/root/testdata/sf0.001"

plans.load_all()


def test_ks_matches_bruteforce_ecdf(spark):
    [res] = plans.QUERIES["stat_ks_cohort_drift"](spark, SF).collect()
    rows = load_table(spark, SF, "events").select("user_id", "value").collect()
    a = sorted(r.value for r in rows if r.user_id % 2 == 0)
    b = sorted(r.value for r in rows if r.user_id % 2 == 1)
    grid = sorted(set(a) | set(b))
    import bisect

    d = max(
        abs(bisect.bisect_right(a, v) / len(a) - bisect.bisect_right(b, v) / len(b))
        for v in grid
    )
    assert res.n1 == len(a) and res.n2 == len(b)
    assert res.d_stat == pytest.approx(d, abs=1e-5)


def test_ks_identical_cohorts_zero(spark):
    """KS of a distribution against itself is exactly 0 — run the
    packed-counter path with c1 = c2 on every distinct value."""
    from unittest import mock

    import whisky_wine_etl_spark.plans.round4e as r4e

    ev = load_table(spark, SF, "events")
    # duplicate every event into both cohorts (even & odd user)
    dup = ev.withColumn("user_id", F.lit(0)).union(
        ev.withColumn("user_id", F.lit(1))
    )
    with mock.patch.object(r4e, "load_table", lambda spark, sf, name: dup):
        [res] = plans.QUERIES["stat_ks_cohort_drift"](spark, SF).collect()
    assert res.d_stat == 0.0
    assert res.n1 == res.n2


def test_cumulative_uniques_totals(spark):
    rows = sorted(
        plans.QUERIES["events_cumulative_uniques"](spark, SF).collect(),
        key=lambda r: r.day,
    )
    ev = load_table(spark, SF, "events")
    total_users = ev.select("user_id").distinct().count()
    assert rows[-1].cum_users == total_users
    assert sum(r.n_new_users for r in rows) == total_users
    # running total is consistent and strictly increasing
    acc = 0
    for r in rows:
        acc += r.n_new_users
        assert r.cum_users == acc
        assert r.n_new_users >= 1


def test_pareto_shares_sum_to_one_and_concentrate(spark):
    rows = sorted(
        plans.QUERIES["events_pareto_share"](spark, SF).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    assert sum(r.share for r in rows) == pytest.approx(1.0, abs=1e-4)
    ev_total = load_table(spark, SF, "events").count()
    assert sum(r.n_events for r in rows) == ev_total
    # decile 1 holds the most-active users: its per-user average must
    # be the max across deciles, and average activity must be
    # non-increasing down the deciles
    per_user = [r.n_events / r.n_users for r in rows]
    assert per_user == sorted(per_user, reverse=True)
