"""Property test: the round-5 double-explode pair emission is
set/multiset-equivalent to the original nested-HOF formulation on
arbitrary baskets (hypothesis-generated), in all flag combinations."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from whisky_wine_etl_spark.operators.graph import copurchase_edges


def _hof_edges(baskets_df, both_directions: bool, distinct: bool):
    """The pre-round-5 formulation, kept verbatim as the reference."""
    e1 = (
        baskets_df.groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("parts"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(parts,"
                    " x -> transform(filter(parts, y -> y > x),"
                    " y -> named_struct('pa', x, 'pb', y))))"
                )
            ).alias("e")
        )
        .select("e.pa", "e.pb")
    )
    if distinct:
        e1 = e1.distinct()
    if not both_directions:
        return e1
    return e1.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst")
    ).unionAll(e1.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 9)),  # (order, part)
        min_size=0,
        max_size=60,
    ),
    both=st.booleans(),
    dedup=st.booleans(),
)
def test_double_explode_matches_hof_reference(spark, rows, both, dedup):
    df = spark.createDataFrame(
        rows or [(99, 1)], "l_orderkey long, l_partkey long"
    )
    got = copurchase_edges(df, both_directions=both, distinct=dedup).collect()
    want = _hof_edges(df, both, dedup).collect()
    key = (lambda r: (r.src, r.dst)) if both else (lambda r: (r.pa, r.pb))
    assert sorted(map(key, got)) == sorted(map(key, want))
