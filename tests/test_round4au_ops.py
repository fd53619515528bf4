"""Behavior tests for round-4au: global-sort contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from whisky_wine_etl_spark import plans

SF = "/root/testdata/sf0.001"

plans.load_all()


def test_sort_contract_holds(spark):
    r = plans.QUERIES["sort_global_contract"](spark, SF).collect()[0]
    o = spark.read.parquet(f"{SF}/orders.parquet")
    assert r.n_rows == o.count()
    assert r.range_overlaps == 0 and r.intra_violations == 0
    mm = o.agg(F.min("o_totalprice"), F.max("o_totalprice")).collect()[0]
    assert r.head_key == mm[0] and r.tail_key == mm[1]


def test_execute_immediate_matches_static(spark):
    out = plans.QUERIES["sql_execute_immediate"](spark, SF)
    o = spark.read.parquet(f"{SF}/orders.parquet")
    manual = (
        o.filter(F.col("o_totalprice") > 150000.0)
        .groupBy("o_orderstatus")
        .count()
        .collect()
    )
    got = {r.o_orderstatus: r.n_orders for r in out.collect()}
    assert got == {r.o_orderstatus: r["count"] for r in manual}


def test_timezone_pack_totals_and_offsets(spark):
    rows = plans.QUERIES["func_timezone_pack"](spark, SF).collect()
    ev_n = spark.read.parquet(f"{SF}/events.parquet").count()
    assert sum(r.n_events for r in rows) == ev_n
    # every event is either EDT or EST in America/New_York
    assert all(r.n_edt + r.n_est == r.n_events for r in rows)
