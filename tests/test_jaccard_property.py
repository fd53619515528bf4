"""Property tests for the round-6 capped-jaccard machinery: the Spark
operator chain (basket edges → degrees → cap-filtered inverted index →
common counts → integer jaccard pieces) must equal a brute-force
pure-Python oracle on arbitrary hypothesis-generated baskets, with a
cap small enough (C=3) to actually bite on tiny graphs; and the
hub-injection remap must equal its Python formula row-for-row."""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from whisky_wine_etl_spark.operators.graph import copurchase_edges
from whisky_wine_etl_spark.plans.round6a import skewed_copurchase_lineitem

CAP = 3


def _python_capped_jaccard(rows: list[tuple[int, int]], cap: int):
    baskets: dict[int, set[int]] = defaultdict(set)
    for o, p in rows:
        baskets[o].add(p)
    nbrs: dict[int, set[int]] = defaultdict(set)
    for parts in baskets.values():
        for a in parts:
            for b in parts:
                if a != b:
                    nbrs[a].add(b)
    deg = {n: len(s) for n, s in nbrs.items()}
    out = {}
    nodes = sorted(nbrs)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1 :]:
            c = sum(
                1 for n in nbrs[u] & nbrs[v] if deg[n] <= cap
            )
            if c > 0:
                out[(u, v)] = (c, deg[u] + deg[v] - c)
    return out


def _spark_capped_jaccard(spark, rows: list[tuple[int, int]], cap: int):
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    edges = copurchase_edges(df, both_directions=True)
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    idx = edges.join(
        F.broadcast(
            deg.filter(F.col("d") <= cap).select(F.col("node").alias("dst"))
        ),
        "dst",
    )
    a, b = idx.alias("a"), idx.alias("b")
    common = (
        a.join(b, (F.col("a.dst") == F.col("b.dst")) & (F.col("a.src") < F.col("b.src")))
        .groupBy(F.col("a.src").alias("u"), F.col("b.src").alias("v"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    j = common.join(du, "u").join(dv, "v")
    return {
        (r["u"], r["v"]): (r["c"], r["du"] + r["dv"] - r["c"])
        for r in j.collect()
    }


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 11)),  # (order, part)
        min_size=0,
        max_size=50,
    )
)
def test_capped_jaccard_chain_matches_python_bruteforce(spark, rows):
    rows = rows or [(0, 1)]
    assert _spark_capped_jaccard(spark, rows, CAP) == _python_capped_jaccard(
        rows, CAP
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 40), st.integers(1, 400)),
        min_size=0,
        max_size=60,
    )
)
def test_skew_remap_matches_python_formula(spark, rows):
    df = spark.createDataFrame(
        rows or [(4, 10)], "l_orderkey long, l_partkey long"
    )
    got = sorted(
        (r["l_orderkey"], r["l_partkey"])
        for r in skewed_copurchase_lineitem(df).collect()
    )
    want = sorted(
        (o, -1 - ((p // 10) % 20) if p % 10 == 0 else p)
        for o, p in (rows or [(4, 10)])
        if o % 4 == 0
    )
    assert got == want
