"""UDTF, HLL sketch rollup, and binned range join semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from whisky_wine_etl_spark import plans
from whisky_wine_etl_spark.catalog import load_table

plans.load_all()

SF = "/root/testdata/sf0.01"


def test_hll_estimate_within_5pct_of_exact(spark):
    approx = {
        (r["day"], r["event_type"]): r["approx_users"]
        for r in plans.QUERIES["agg_hll_partial_union"](spark, SF).collect()
    }
    e = load_table(spark, SF, "events")
    exact = {
        (r["day"], r["event_type"]): r["n"]
        for r in e.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, est in approx.items():
        assert abs(est - exact[k]) / exact[k] < 0.05, (k, est, exact[k])


def test_binned_range_join_is_equi_hash_join(spark):
    """The whole point of binning: the interval join must plan as a
    hash equi-join, never a nested-loop/cartesian product."""
    df = plans.QUERIES["join_range_binned_attribution"](spark, SF)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan


def test_udtf_runs_match_manual_scan(spark):
    rows = plans.QUERIES["udtf_token_runs"](spark, SF).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF, "documents").filter(F.col("doc_id") < 100).collect()
    }
    expected = []
    for doc_id, text in docs.items():
        toks = text.split(" ")
        i = 0
        while i < len(toks):
            j = i
            while j < len(toks) and toks[j] == toks[i]:
                j += 1
            if j - i >= 2:
                expected.append((doc_id, i, toks[i], j - i))
            i = j
    got = sorted((r["doc_id"], r["start"], r["token"], r["run_len"]) for r in rows)
    assert got == sorted(expected)


def test_approx_percentile_close_to_exact(spark):
    approx = {
        r["l_returnflag"]: (r["p50_approx"], r["p99_approx"])
        for r in plans.QUERIES["agg_approx_percentile"](spark, SF).collect()
    }
    li = load_table(spark, SF, "lineitem")
    exact = {
        r["l_returnflag"]: (r["p50"], r["p99"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
        )
        .collect()
    }
    for k, (a50, a99) in approx.items():
        e50, e99 = exact[k]
        assert abs(a50 - e50) / e50 < 0.02, (k, a50, e50)
        assert abs(a99 - e99) / e99 < 0.02, (k, a99, e99)


def test_hll_exact_anchor_matches_direct_distinct(spark):
    """The anchor's two-phase form (pre-dedup to the
    (day, event_type, user_id) grain, then count) must equal the
    direct countDistinct — the property that makes it a trustworthy
    hash-exact cross-check for the sketch's merge path."""
    anchor = {
        (r["day"], r["event_type"]): r["exact_users"]
        for r in plans.QUERIES["agg_hll_exact_anchor"](spark, SF).collect()
    }
    e = load_table(spark, SF, "events")
    direct = {
        (r["day"], r["event_type"]): r["n"]
        for r in e.groupBy(F.col("ts").cast("date").alias("day"), "event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert anchor == direct


def test_hll_merge_path_within_5pct_of_anchor(spark):
    """Cross-check the ESTIMATOR'S MERGE PATH (hourly sketches →
    hll_union_agg → day) against the hash-exact anchor at the same
    grain — the driver-verifiable half of the sketch family's
    correctness story (VERDICT r10 item 4)."""
    approx = {
        (r["day"].date(), r["event_type"]): r["approx_users"]
        for r in plans.QUERIES["agg_hll_partial_union"](spark, SF).collect()
    }
    anchor = {
        (r["day"], r["event_type"]): r["exact_users"]
        for r in plans.QUERIES["agg_hll_exact_anchor"](spark, SF).collect()
    }
    assert set(approx) == set(anchor)
    for k, est in approx.items():
        assert abs(est - anchor[k]) / anchor[k] < 0.05, (k, est, anchor[k])
