"""Round-7a queries: exact-quota stratified sampling and the
registered RocksDB state-store determinism twin."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from whisky_wine_etl_spark import plans
from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.round7a import _QUOTA_BUDGET

plans.load_all()

SF = "/root/testdata/sf0.001"


def test_quota_sample_exact_total_and_per_stratum(spark):
    rows = plans.QUERIES["sample_stratified_quota"](spark, SF).collect()
    assert len(rows) == _QUOTA_BUDGET  # the budget is EXACT, always
    got = Counter(r["o_orderpriority"] for r in rows)
    quotas = {r["o_orderpriority"]: r["quota"] for r in rows}
    for g, q in quotas.items():
        assert got[g] == q  # each stratum contributes exactly its quota
    assert sum(quotas.values()) == _QUOTA_BUDGET


def test_quota_matches_largest_remainder_formula(spark):
    """Recompute Hamilton apportionment in plain Python from the
    stratum counts and compare quota-for-quota."""
    o = load_table(spark, SF, "orders")
    counts = {
        r["o_orderpriority"]: r["n"]
        for r in o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    t = sum(counts.values())
    base = {g: (n * _QUOTA_BUDGET) // t for g, n in counts.items()}
    rem = {g: (n * _QUOTA_BUDGET) % t for g, n in counts.items()}
    leftover = _QUOTA_BUDGET - sum(base.values())
    order = sorted(counts, key=lambda g: (-rem[g], g))
    want = {
        g: base[g] + (1 if i < leftover else 0) for i, g in enumerate(order)
    }
    rows = plans.QUERIES["sample_stratified_quota"](spark, SF).collect()
    quotas = {r["o_orderpriority"]: r["quota"] for r in rows}
    assert quotas == want


def test_quota_sample_is_rerun_and_partitioning_stable(spark):
    """The pick is a pure function of the data: a different scan
    partitioning (phase-1 prune sees different local groups) must
    select the IDENTICAL keys with identical ranks."""
    q = plans.QUERIES["sample_stratified_quota"]
    a = sorted(tuple(r) for r in q(spark, SF).collect())
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
    try:
        b = sorted(tuple(r) for r in q(spark, SF).collect())
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    assert a == b


def test_rocksdb_twin_matches_default_provider_and_restores_conf(spark):
    conf = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(conf, None)
    rocks = sorted(
        tuple(r)
        for r in plans.QUERIES["stream_rocksdb_tumbling"](spark, SF).collect()
    )
    assert spark.conf.get(conf, None) == before  # conf restored
    default = sorted(
        tuple(r)
        for r in plans.QUERIES["stream_tumbling_1h"](spark, SF).collect()
    )
    assert rocks == default
    assert len(rocks) > 0
