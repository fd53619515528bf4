"""Behavior tests for round-4at: changepoint binseg, golden record."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from whisky_wine_etl_spark import plans

SF = "/root/testdata/sf0.001"

plans.load_all()


def test_binseg_finds_planted_level_shift(spark, monkeypatch):
    """A series that jumps from level 10 to level 50 at day 30 must
    split exactly there (split = last day of the left segment)."""
    import whisky_wine_etl_spark.plans.round4at as r4at

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    oid = 0
    for day in range(60):
        level = 10 if day < 30 else 50
        for _ in range(level):
            oid += 1
            rows.append(Row(o_orderkey=oid, o_custkey=1, o_orderstatus="O",
                            o_totalprice=1.0, o_orderdate=t0 + dt.timedelta(days=day),
                            o_orderpriority="1-URGENT"))
    orders = spark.createDataFrame(rows)
    monkeypatch.setattr(r4at, "load_table", lambda s, sf, n: orders)
    r = plans.QUERIES["ts_changepoint_binseg"](spark, SF).collect()[0]
    assert r.split_date == dt.date(2024, 1, 30)
    assert r.mean_left == 10.0 and r.mean_right == 50.0


def test_binseg_score_positive_on_real_data(spark):
    r = plans.QUERIES["ts_changepoint_binseg"](spark, SF).collect()
    assert len(r) == 1 and r[0].score >= 0


def test_golden_record_one_row_per_true_link(spark):
    g = plans.QUERIES["er_golden_record"](spark, SF)
    rows = g.collect()
    assert rows
    keys = [r.custkey for r in rows]
    assert len(keys) == len(set(keys))
    # survivorship: no golden segment may be 'UNKNOWN' when the clean
    # side had a real one
    assert all(r.g_seg != "UNKNOWN" for r in rows)


def test_golden_record_survivorship_rules(spark):
    c = spark.read.parquet(f"{SF}/customer.parquet")
    g = plans.QUERIES["er_golden_record"](spark, SF)
    j = g.join(c, g.custkey == c.c_custkey).collect()
    for r in j:
        # name: never shorter than the clean side's name minus the
        # 1-char perturbation; balance: >= the clean balance
        assert len(r.g_name) >= len(r.c_name) - 1
        assert r.g_bal >= round(r.c_acctbal, 2) - 1e-9
