"""Behavior tests for round-4z: stream fan-in union,
percent-of-parent rollup, Huber IRLS."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from whisky_wine_etl_spark import plans

SF = "/root/testdata/sf0.001"

plans.load_all()


def test_stream_union_equals_single_source_twin(spark):
    """The fan-in union must produce exactly the single-source
    stream's result (same oracle, so compare the frames directly)."""
    a = plans.QUERIES["stream_union_two_sources"](spark, SF)
    b = plans.QUERIES["stream_tumbling_1h"](spark, SF)
    sa = sorted(map(tuple, a.collect()))
    sb = sorted(map(tuple, b.collect()))
    assert sa == sb


def test_pct_of_parent_shares_sum_to_one(spark):
    rows = plans.QUERIES["agg_pct_of_parent"](spark, SF).collect()
    by_region: dict = {}
    region_pct: dict = {}
    for r in rows:
        by_region.setdefault(r.region, []).append(r.pct_of_region)
        region_pct[r.region] = r.region_pct_of_total
    for region, shares in by_region.items():
        assert sum(shares) == pytest.approx(1.0, abs=1e-4)
    assert sum(region_pct.values()) == pytest.approx(1.0, abs=1e-4)


def test_huber_downweights_outlier_toward_true_line(spark, monkeypatch):
    """Clean points on y = x plus one gross outlier: OLS (iter 0) is
    pulled away; two IRLS refits must land closer to slope 1 and
    report the outlier as downweighted."""
    import whisky_wine_etl_spark.plans.round4z as r4z

    # orders: o_totalprice in K$ = y*1000; lineitem count = x
    orders, lineitems = [], []
    ok = 0
    for x in range(1, 9):
        ok += 1
        orders.append(Row(o_orderkey=ok, o_totalprice=float(x) * 1000))
        for i in range(x):
            lineitems.append(Row(l_orderkey=ok))
    ok += 1
    orders.append(Row(o_orderkey=ok, o_totalprice=100_000.0))  # y=100 at x=1
    lineitems.append(Row(l_orderkey=ok))
    tables = {
        "orders": spark.createDataFrame(orders),
        "lineitem": spark.createDataFrame(lineitems),
    }
    monkeypatch.setattr(r4z, "load_table", lambda s, sf, name: tables[name])
    rows = {r.iter: r for r in plans.QUERIES["ml_huber_irls2"](spark, SF).collect()}
    assert rows[0].n_downweighted == 0
    assert rows[2].n_downweighted >= 1
    err0 = abs(rows[0].slope - 1.0)
    err2 = abs(rows[2].slope - 1.0)
    # two refits must at least halve the OLS slope error; full
    # convergence would need more iterations against a 50σ outlier
    assert err2 < err0 / 2
