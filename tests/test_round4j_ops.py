"""Behavior tests for round-4j: frontier BFS, Zipf fit."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from whisky_wine_etl_spark import plans

SF = "/root/testdata/sf0.001"

plans.load_all()


def test_bfs_path_graph_fixture(spark, monkeypatch):
    """Path 1-2-3-4-5 plus isolated clique {8,9}: distances follow the
    chain from node 1; the disconnected clique never appears."""
    import whisky_wine_etl_spark.plans.round4j as r4j

    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)]
    rows = []
    for i, (u, v) in enumerate(edges):
        rows += [Row(l_orderkey=i, l_partkey=u), Row(l_orderkey=i, l_partkey=v)]
    li = spark.createDataFrame(rows)
    monkeypatch.setattr(r4j, "load_table", lambda spark, sf, name: li)
    out = {r.node: r.dist for r in plans.QUERIES["graph_bfs_distance"](spark, SF).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_bfs_distances_consistent_with_edges(spark):
    """Triangle inequality on the real graph: every non-source node at
    dist d has a neighbor at dist d−1; the source is min(node)."""
    out = plans.QUERIES["graph_bfs_distance"](spark, SF)
    rows = out.collect()
    spark.catalog.clearCache()
    dist = {r.node: r.dist for r in rows}
    src = [n for n, d in dist.items() if d == 0]
    assert src == [min(dist)]
    # rebuild edges cheaply at sf0.001
    from whisky_wine_etl_spark.catalog import load_table

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .distinct()
        .collect()
    )
    adj: dict = {}
    for r in edges:
        adj.setdefault(r.pa, set()).add(r.pb)
        adj.setdefault(r.pb, set()).add(r.pa)
    for n, d in dist.items():
        if d > 0:
            assert any(dist.get(m) == d - 1 for m in adj[n]), (n, d)


def test_zipf_fit_on_exact_power_law(spark, monkeypatch):
    """A corpus whose bigram counts are exactly c = 1000·rank⁻¹ must
    fit slope −1 with R² = 1."""
    import whisky_wine_etl_spark.plans.round4j as r4j

    # build docs where bigram "w{i} w{i}" appears round(1000/i) times
    rows = []
    doc = 0
    for i in range(1, 21):
        c = round(1000 / i)
        for _ in range(c):
            rows.append(Row(doc_id=doc, text=f"w{i} w{i}"))
            doc += 1
    docs = spark.createDataFrame(rows)
    monkeypatch.setattr(r4j, "load_table", lambda spark, sf, name: docs)
    [res] = plans.QUERIES["text_zipf_fit"](spark, SF).collect()
    assert res.vocab == 20
    assert res.zipf_exponent == pytest.approx(-1.0, abs=0.02)
    assert res.r2 > 0.999
    assert res.log_intercept == pytest.approx(math.log(1000), abs=0.05)


def test_zipf_fit_real_corpus_sane(spark):
    [res] = plans.QUERIES["text_zipf_fit"](spark, SF).collect()
    assert res.vocab > 100
    assert res.zipf_exponent < 0  # frequencies decrease with rank
    assert 0 <= res.r2 <= 1
