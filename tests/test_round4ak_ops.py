"""Behavior tests for round-4ak: parameterized SQL, VALUES dims."""

from __future__ import annotations

import pytest

from whisky_wine_etl_spark import plans

SF = "/root/testdata/sf0.001"

plans.load_all()


def test_parameterized_binds_do_not_interpolate(spark):
    """A hostile string bind stays a VALUE — the quote can't escape
    into the SQL text (no injection)."""
    from whisky_wine_etl_spark.catalog import load_table

    load_table(spark, SF, "orders").createOrReplaceTempView("orders_param")
    out = spark.sql(
        "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders_param "
        "WHERE o_orderstatus = :status",
        args={"status": "O' OR '1'='1"},
    ).collect()
    assert out[0].n == 0  # matched as a literal string, found nothing


def test_values_dim_weights_applied(spark):
    rows = {r.tier_name: r for r in plans.QUERIES["sql_values_inline_dim"](spark, SF).collect()}
    assert set(rows) <= {"open", "finished", "pending"}
    # weighted total <= plain total for weights <= 1
    from whisky_wine_etl_spark.catalog import load_table
    import pyspark.sql.functions as F

    o = load_table(spark, SF, "orders")
    plain = {
        r.o_orderstatus: r.total
        for r in o.groupBy("o_orderstatus").agg(F.sum("o_totalprice").alias("total")).collect()
    }
    mapping = {"open": ("O", 1.0), "finished": ("F", 0.5), "pending": ("P", 0.75)}
    for tier, r in rows.items():
        status, w = mapping[tier]
        assert r.weighted_total == pytest.approx(plain[status] * w, rel=1e-9)
