"""Unit checks for the salted aggregation and regex tokenizer."""

from __future__ import annotations

from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.operators.agg import salted_agg
from whisky_wine_etl_spark.operators.text import regex_tokens

SF = "/root/testdata/sf0.001"


def test_salted_agg_matches_plain_groupby(spark):
    li = load_table(spark, SF, "lineitem")
    plain = {
        r.l_returnflag: (round(r.s, 2), r.n, round(r.a, 6), r.m)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.sum("l_extendedprice").alias("s"),
            F.count(F.lit(1)).alias("n"),
            F.avg("l_quantity").alias("a"),
            F.max("l_discount").alias("m"),
        )
        .collect()
    }
    salted = {
        r.l_returnflag: (round(r.sum_price, 2), r.n, round(r.avg_qty, 6), r.max_disc)
        for r in salted_agg(
            li,
            ["l_returnflag"],
            {
                "sum_price": ("sum", "l_extendedprice"),
                "n": ("count", "*"),
                "avg_qty": ("avg", "l_quantity"),
                "max_disc": ("max", "l_discount"),
            },
            salt_buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_two_stage_plan(spark):
    li = load_table(spark, SF, "lineitem")
    out = salted_agg(li, ["l_returnflag"], {"n": ("count", "*")}, salt_buckets=4)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # two distinct aggregates in the optimized plan (partial-by-salt + final)
    assert plan.count("Aggregate") == 2


def test_regex_tokens_mixed_content(spark):
    df = spark.createDataFrame(
        [(1, "hello world42 !?"), (2, ""), (3, "a1b2")],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in regex_tokens(df).collect()}
    # 'hello', 'world', '42', '!', '?'
    assert rows[1].n_bpe_tokens == 5
    assert rows[1].n_alpha_tokens == 2
    assert rows[1].n_numeric_tokens == 1
    assert rows[2].n_bpe_tokens == 0
    # 'a','1','b','2'
    assert rows[3].n_bpe_tokens == 4
    assert rows[3].n_unique_bpe_tokens == 4


def test_salted_agg_avg_ignores_nulls_like_plain_avg(spark):
    """ADVICE fix: avg decomposition must use the NON-NULL count as its
    denominator — count(1) would dilute the average on nullable cols."""
    df = spark.createDataFrame(
        [("a", 10.0), ("a", None), ("a", 20.0), ("b", None), ("b", 5.0)],
        "k string, v double",
    )
    plain = {r.k: r.a for r in df.groupBy("k").agg(F.avg("v").alias("a")).collect()}
    salted = {
        r.k: r.avg_v
        for r in salted_agg(df, ["k"], {"avg_v": ("avg", "v")}, salt_buckets=4).collect()
    }
    assert salted == plain == {"a": 15.0, "b": 5.0}
