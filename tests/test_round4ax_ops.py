"""Behavior/invariant tests for the round-4ax..4az families:
t-closeness, weighted SSSP, Holt smoothing, Mann-Kendall, Poisson
GLM, absorbing-Markov conversion. Exactness is pinned by the DuckDB
oracles (tests/test_oracle_parity.py sweeps every registered query);
these tests pin the mathematical invariants the oracles can't
express."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from whisky_wine_etl_spark import plans
from whisky_wine_etl_spark.catalog import load_table

SF = "/root/testdata/sf0.001"

plans.load_all()


def test_t_closeness_is_a_bounded_distance(spark):
    """TVD lies in [0, 1]; group sizes sum to the join cardinality;
    and the single-category degenerate check: a group whose priority
    distribution equals the global one would score ~0 (no group can
    score below 0 even with FP noise)."""
    rows = plans.QUERIES["privacy_t_closeness"](spark, SF).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r.t_closeness <= 1.0
        assert r.group_n >= 1
    c = load_table(spark, SF, "customer")
    o = load_table(spark, SF, "orders")
    n_join = c.join(o, c.c_custkey == o.o_custkey).count()
    assert sum(r.group_n for r in rows) == n_join


def test_sssp_weighted_bounded_by_hops(spark):
    """Edge weights are 1/basket-count ≤ 1, so the ≤4-round weighted
    distance can never exceed the ≤4-hop unweighted distance; the
    source scores exactly 0; all distances are positive-finite."""
    d = {
        r.node: r.dist
        for r in plans.QUERIES["graph_sssp_weighted"](spark, SF).collect()
    }
    bfs = {
        r.node: r.dist
        for r in plans.QUERIES["graph_bfs_distance"](spark, SF).collect()
    }
    assert d
    src = min(bfs, key=lambda n: (bfs[n], n))
    assert bfs[src] == 0 and d[src] == 0.0
    for node, w in d.items():
        assert w >= 0.0
        assert node in bfs  # same reachable set within 4 rounds
        assert w <= bfs[node] + 1e-9


def test_holt_linear_reduces_to_level_series(spark):
    """Sanity against an independent pandas fold: recompute one
    user's series from the raw parquet and match level/trend to the
    engine output (the oracle pins ALL users; this pins the engine
    against a third implementation)."""
    out = (
        plans.QUERIES["ts_holt_linear"](spark, SF)
        .filter(F.col("user_id") == 6)
        .orderBy("i")
        .collect()
    )
    assert out and out[0].i == 1 and out[0].trend == 0.0
    e = (
        load_table(spark, SF, "events")
        .filter(F.col("user_id") == 6)
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.round(F.sum("value"), 6).alias("v"))
        .orderBy("day")
        .collect()
    )
    v = [r.v for r in e][:64]
    l, b = v[0], 0.0
    levels = [l]
    for t in range(1, len(v)):
        ln = 0.5 * v[t] + 0.5 * (l + b)
        b = 0.3 * (ln - l) + 0.7 * b
        l = ln
        levels.append(l)
    assert len(out) == len(levels)
    for row, lv in zip(out, levels):
        assert abs(row.level - lv) < 1e-6


def test_mann_kendall_consistent_with_theil_sen_sign(spark):
    """The MK S statistic and the Theil-Sen median slope must agree
    in sign for a clearly-trending series (both are built from the
    same pairwise comparisons); variance is positive and z is finite."""
    mk = plans.QUERIES["stat_mann_kendall"](spark, SF).collect()[0]
    ts = plans.QUERIES["stat_theil_sen_daily"](spark, SF).collect()[0]
    assert mk.var_s > 0
    assert math.isfinite(mk.z_score)
    if abs(mk.s_stat) > 10:
        assert (mk.s_stat > 0) == (ts.ts_slope > 0)


def test_poisson_glm_stationarity(spark):
    """At the fitted betas the score must be ~0: Σ(μ−y) ≈ 0 and
    Σ(μ−y)x ≈ 0 (the Poisson normal equations), evaluated by an
    independent numpy pass over the raw data."""
    out = plans.QUERIES["ml_poisson_glm"](spark, SF).collect()[0]
    li = (
        load_table(spark, SF, "lineitem")
        .select("l_quantity", "l_extendedprice")
        .collect()
    )
    y = np.array([r.l_quantity for r in li])
    x = np.array([r.l_extendedprice / 10000.0 for r in li])
    mu = np.exp(out.beta0 + out.beta1 * x)
    n = len(y)
    assert abs((mu - y).sum()) / n < 1e-3
    assert abs(((mu - y) * x).sum()) / n < 1e-2


def test_absorbing_markov_probabilities_and_dominance(spark):
    """Absorption probabilities are proper probabilities, and each
    state's value must be at least its direct purchase-transition
    probability (one more sweep can only add mass)."""
    rows = {
        r.state: r.p_convert
        for r in plans.QUERIES["events_absorbing_markov"](spark, SF).collect()
    }
    assert set(rows) == {"click", "error", "signup", "view"}
    e = load_table(spark, SF, "events")
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("f"),
        F.coalesce(F.lead("event_type").over(w), F.lit("end")).alias("t"),
    ).filter(F.col("f") != "purchase")
    direct = {
        r.f: r.p
        for r in seq.groupBy("f")
        .agg(
            (
                F.sum(F.when(F.col("t") == "purchase", 1).otherwise(0))
                / F.count(F.lit(1))
            ).alias("p")
        )
        .collect()
    }
    for s, p in rows.items():
        assert 0.0 <= p <= 1.0
        assert p >= direct[s] - 1e-9
