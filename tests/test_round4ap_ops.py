"""Behavior tests for round-4ap: session variables, SQL scripting,
temperature mixture."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from whisky_wine_etl_spark import plans

SF = "/root/testdata/sf0.001"

plans.load_all()


def test_session_variables_filter_matches_manual(spark):
    out = plans.QUERIES["sql_session_variables"](spark, SF)
    c = spark.read.parquet(f"{SF}/customer.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    seg = c.orderBy("c_mktsegment").select("c_mktsegment").first()[0]
    manual = (
        o.join(c, o.o_custkey == c.c_custkey)
        .filter((F.col("c_mktsegment") == seg) & (F.col("o_totalprice") > 150000.0))
        .count()
    )
    assert sum(r.n_orders for r in out.collect()) == manual


def test_session_variable_survives_for_session(spark):
    """DECLARE + SET leave the variable readable by later statements
    in the same session (session-scoped state)."""
    plans.QUERIES["sql_session_variables"](spark, SF).collect()
    v = spark.sql("SELECT sg_price_floor AS v").collect()[0].v
    assert v == 150000.0


def test_scripting_block_cumulative_is_monotone(spark):
    rows = plans.QUERIES["sql_scripting_block"](spark, SF).collect()
    assert [r.yr for r in rows] == [1995, 1996, 1997]
    cums = [r.cum_orders for r in rows]
    assert cums == sorted(cums)
    assert cums[-1] == sum(r.n_orders for r in rows)


def test_temperature_mixture_flattens_distribution(spark):
    rows = plans.QUERIES["corpus_mixture_temperature"](spark, SF).collect()
    # probabilities sum to ~1 on both scales
    assert abs(sum(r.p_raw for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.p_temp for r in rows) - 1.0) < 1e-4
    # temperature flattening: the largest language loses share, the
    # smallest gains (alpha < 1)
    big = max(rows, key=lambda r: r.n_docs)
    small = min(rows, key=lambda r: r.n_docs)
    assert big.p_temp < big.p_raw
    assert small.p_temp > small.p_raw
    # sample_factor realizes the mixture at constant corpus size
    assert big.sample_factor < 1.0 < small.sample_factor


def test_temperature_alpha_math(spark, monkeypatch):
    import whisky_wine_etl_spark.plans.round4ap as r4ap

    docs = spark.createDataFrame(
        [Row(doc_id=i, text="x", lang=("a" if i < 8 else "b"), source="s",
             n_chars=1) for i in range(10)]
    )
    monkeypatch.setattr(r4ap, "load_table", lambda s, sf, n: docs)
    rows = {r.lang: r for r in
            plans.QUERIES["corpus_mixture_temperature"](spark, SF).collect()}
    z = 8**0.3 + 2**0.3
    assert math.isclose(rows["a"].p_temp, round(8**0.3 / z, 6), abs_tol=1e-6)
    assert math.isclose(rows["b"].p_temp, round(2**0.3 / z, 6), abs_tol=1e-6)
