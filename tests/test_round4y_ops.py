"""Behavior tests for round-4y: FastSS deletion-neighborhood join,
brand modularity, equi-depth histogram."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from whisky_wine_etl_spark import plans

SF = "/root/testdata/sf0.001"

plans.load_all()


def _patch(monkeypatch, tables: dict):
    import whisky_wine_etl_spark.plans.round4y as r4y

    monkeypatch.setattr(r4y, "load_table", lambda s, sf, name: tables[name])


def _cust(spark, names):
    return spark.createDataFrame(
        [
            Row(c_custkey=i, c_name=n, c_mktsegment="MACHINERY", c_acctbal=0.0,
                c_nationkey=0)
            for i, n in enumerate(names)
        ]
    )


def test_fastss_catches_sub_insert_delete(spark, monkeypatch):
    """Substitution, insertion AND deletion variants are all ED 1 and
    must be found; an ED-2 name must not."""
    names = ["martha", "marsha", "marthas", "artha", "xxxxxx"]
    _patch(monkeypatch, {"customer": _cust(spark, names)})
    out = plans.QUERIES["er_deletion_neighborhood_join"](spark, SF).collect()
    pairs = {(r.custkey_a, r.custkey_b) for r in out}
    assert (0, 1) in pairs  # substitution
    assert (0, 2) in pairs  # insertion
    assert (0, 3) in pairs  # deletion
    assert all(4 not in p for p in pairs)
    for r in out:
        assert r.dist <= 1


def test_fastss_identical_names_distance_zero(spark, monkeypatch):
    names = ["same", "same"]
    _patch(monkeypatch, {"customer": _cust(spark, names)})
    out = plans.QUERIES["er_deletion_neighborhood_join"](spark, SF).collect()
    assert len(out) == 1 and out[0].dist == 0


def test_modularity_contributions_sum_property(spark):
    """Σ_c d_c = 2m and each q_contrib ∈ [-1, 1]; the intra-edge total
    can never exceed m."""
    rows = plans.QUERIES["graph_modularity_brand"](spark, SF).collect()
    assert rows
    total_deg = sum(r.degree_sum for r in rows)
    total_intra = sum(r.intra_edges for r in rows)
    assert total_deg % 2 == 0
    m = total_deg // 2
    assert 0 <= total_intra <= m
    for r in rows:
        assert -1.0 <= r.q_contrib <= 1.0


def test_modularity_perfect_communities(spark, monkeypatch):
    """Two disjoint cliques with brand == clique → all edges intra;
    Q = Σ (e_c/m − (d_c/2m)²) = 1 − 2·(1/2)² = 0.5 for equal halves."""
    li = spark.createDataFrame(
        [Row(l_orderkey=1, l_partkey=p) for p in (1, 2)]
        + [Row(l_orderkey=2, l_partkey=p) for p in (3, 4)]
    )
    part = spark.createDataFrame(
        [
            Row(p_partkey=1, p_brand="A"), Row(p_partkey=2, p_brand="A"),
            Row(p_partkey=3, p_brand="B"), Row(p_partkey=4, p_brand="B"),
        ]
    )
    _patch(monkeypatch, {"lineitem": li, "part": part})
    rows = plans.QUERIES["graph_modularity_brand"](spark, SF).collect()
    q = sum(r.q_contrib for r in rows)
    assert q == pytest.approx(0.5, abs=1e-6)


def test_equidepth_buckets_cover_and_order(spark):
    rows = plans.QUERIES["sketch_equidepth_hist"](spark, SF).collect()
    assert [r.bucket for r in rows] == list(range(10))
    total = sum(r.n for r in rows)
    # roughly equal masses: no bucket over 2x the ideal depth
    assert all(r.n <= 2 * total / 10 + 1 for r in rows)
    # buckets tile the value range in order
    for lo_r, hi_r in zip(rows, rows[1:]):
        assert lo_r.hi <= hi_r.lo
