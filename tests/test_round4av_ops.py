"""Behavior tests for round-4av: KMV intersection, tokenization
vault."""

from __future__ import annotations

from pyspark.sql import functions as F

from whisky_wine_etl_spark import plans

SF = "/root/testdata/sf0.001"

plans.load_all()


def test_kmv_intersection_bound_or_exact(spark):
    r = plans.QUERIES["sketch_kmv_intersection"](spark, SF).collect()[0]
    assert r.n_exact <= min(r.n_a, r.n_b)
    if r.n_a + r.n_b <= 256:  # union under k -> sketch is exact
        assert r.kmv_est == float(r.n_exact)
    else:
        # k_both/k estimator: RSE ~ 1/sqrt(k·jaccard); allow a wide
        # but non-vacuous band
        assert abs(r.rel_err_pct) < 40.0


def test_kmv_intersection_exact_cross_check(spark):
    r = plans.QUERIES["sketch_kmv_intersection"](spark, SF).collect()[0]
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    a = set(
        x.l_partkey
        for x in li.filter(F.col("l_returnflag") == "A").select("l_partkey").distinct().collect()
    )
    b = set(
        x.l_partkey
        for x in li.filter(F.col("l_returnflag") == "N").select("l_partkey").distinct().collect()
    )
    assert r.n_a == len(a) and r.n_b == len(b)
    assert r.n_exact == len(a & b)


def test_vault_reidentifies_every_customer_with_orders(spark):
    out = plans.QUERIES["privacy_tokenization_vault"](spark, SF)
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    expected = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name")
        .agg(F.count("o_orderkey").alias("n"))
    )
    j = out.join(expected, "c_name")
    assert j.count() == expected.count()
    assert j.filter(F.col("n_orders") != F.col("n")).count() == 0


def test_vault_tokens_are_opaque_and_deterministic(spark):
    import whisky_wine_etl_spark.plans.round4av as r4av  # noqa: F401

    c = spark.read.parquet(f"{SF}/customer.parquet")
    token = F.concat(
        F.lit("tok_"),
        F.substring(F.md5(F.concat(F.col("c_name"), F.lit("sg1"))), 1, 16),
    )
    toks = c.select(token.alias("t"), "c_name")
    # no collisions between distinct names, stable across evaluations
    assert (
        toks.select("t").distinct().count()
        == toks.select("c_name").distinct().count()
    )
    assert toks.filter(F.col("t").contains("Customer")).count() == 0
