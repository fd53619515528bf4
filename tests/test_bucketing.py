"""Bucketed co-located joins: the 100 TB lever for repeated fact-fact
joins — both sides pre-hashed into the same bucket layout on the join
key, so the join compiles to a zero-Exchange sort-merge."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", str(base / "orders")).saveAsTable("b_orders")
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", str(base / "lineitem")).saveAsTable("b_lineitem")
    )
    yield spark.table("b_orders"), spark.table("b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    o, li = bucketed
    # disable auto-broadcast so the join would otherwise shuffle both sides
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_totalprice"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle on either side
        # correctness unchanged vs the unbucketed join
        plain = (
            load_table(spark, SF, "lineitem")
            .join(load_table(spark, SF, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
            .count()
        )
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucket_pruning_on_key_filter(spark, bucketed):
    _, li = bucketed
    # autoBucketedScan turns bucketed reading off for shuffle-free
    # plans; force it so the point filter can prune buckets
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        one_key = li.filter(F.col("l_orderkey") == 42)
        plan = one_key._sc._jvm.PythonSQLUtils.explainString(
            one_key._jdf.queryExecution(), "formatted"
        )
        # a point filter on the bucket key scans 1 of 8 buckets
        assert "SelectedBucketsCount: 1 out of 8" in plan
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
