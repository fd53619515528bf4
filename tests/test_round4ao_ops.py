"""Behavior tests for round-4ao: pipe syntax, Observation metrics,
KMV sketch, incremental agg state, PQ ANN."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from whisky_wine_etl_spark import plans
from whisky_wine_etl_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"

plans.load_all()


def test_pipe_syntax_plan_matches_classic_form(spark):
    """Pipe syntax is parser sugar: the optimized plan must equal the
    classic nested form's plan (same join, same aggregate)."""
    piped = plans.QUERIES["sql_pipe_segment_revenue"](spark, SF)
    from whisky_wine_etl_spark.catalog import load_table

    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    classic = (
        o.filter(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )
    assert piped.collect() == classic.collect()


def test_observe_metrics_single_pass(spark):
    out = plans.QUERIES["diag_observe_ingest"](spark, SF).collect()[0]
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_raw = docs.count()
    n_kept = docs.filter(F.col("n_chars").between(200, 5000)).count()
    assert out.n_raw == n_raw and out.n_kept == n_kept
    assert 0.0 <= out.kept_share <= 1.0
    assert out.chars_kept <= out.chars_raw


def test_kmv_estimate_within_bound(spark):
    """KMV with k=256 has relative standard error ~1/sqrt(k-2) ≈ 6.3%;
    assert every group lands within 5 RSE (p ≈ 1e-6 per group), and
    that unsaturated sketches return the exact count."""
    rows = plans.QUERIES["sketch_kmv_distinct"](spark, SF).collect()
    assert {r.grp for r in rows} >= {"__all"}
    for r in rows:
        if r.n_exact < 256:
            assert r.kmv_est == float(r.n_exact)
        else:
            assert abs(r.rel_err_pct) < 5 * 6.3


def test_kmv_merge_is_bottom_k_of_union(spark):
    """The '__all' sketch must estimate at least as many distincts as
    the largest single group (monotonicity of bottom-k merge)."""
    rows = {r.grp: r for r in plans.QUERIES["sketch_kmv_distinct"](spark, SF).collect()}
    allrow = rows.pop("__all")
    assert allrow.n_exact >= max(r.n_exact for r in rows.values())


def test_incremental_state_merge_equals_recompute(spark):
    out = plans.QUERIES["etl_incremental_agg_state"](spark, SF)
    o = spark.read.parquet(f"{SF}/orders.parquet")
    full = (
        o.withColumn("p", F.col("o_totalprice").cast("decimal(18,2)"))
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("p").cast("double").alias("sum_price"),
        )
    )
    j = out.join(full.withColumnRenamed("n_orders", "n2")
                 .withColumnRenamed("sum_price", "s2"), "o_custkey")
    bad = j.filter(
        (F.col("n_orders") != F.col("n2")) | (F.col("sum_price") != F.col("s2"))
    ).count()
    assert bad == 0


def test_pq_codebooks_shape_and_determinism(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    b1 = sim._train_pq_codebooks(emb, m=4, ks=16)
    b2 = sim._train_pq_codebooks(emb, m=4, ks=16)
    assert b1.shape == (4, 16, 16)
    assert (b1 == b2).all()


def test_pq_recall_vs_bruteforce(spark):
    """PQ with exact re-rank over 128 ADC candidates must recover most
    of the true top-5 (recall@5 ≥ 0.6 on the synthetic corpus)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    truth = {
        (r.query_id, r.cand_id)
        for r in sim.brute_force_topk(emb, queries, k=5).collect()
    }
    got = {
        (r.query_id, r.cand_id)
        for r in sim.pq_topk(emb, queries, k=5).collect()
    }
    assert truth, "no query vectors in fixture"
    recall = len(truth & got) / len(truth)
    assert recall >= 0.6, f"PQ recall@5 too low: {recall:.2f}"


def test_pq_rows_contract(spark):
    out = plans.QUERIES["sim_topk_pq"](spark, SF)
    rows = out.collect()
    assert rows and out.columns == ["query_id", "cand_id", "cos_sim", "rk"]
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rk)
    for q, rks in per_q.items():
        assert sorted(rks) == list(range(1, len(rks) + 1))
