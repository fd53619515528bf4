"""Behavior tests for round-4h: clustering coefficient, centroid
affinity, funnel latency."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from whisky_wine_etl_spark import plans
from whisky_wine_etl_spark.catalog import load_table

SF = "/root/testdata/sf0.001"

plans.load_all()


def test_clustering_coeff_triangle_plus_tail(spark, monkeypatch):
    """Graph: triangle {1,2,3} plus a pendant 3-4. Nodes 1,2 have
    coeff 1; node 3 sees 1 triangle over 3 possible pairs (deg 3);
    node 4 (deg 1) is excluded."""
    import whisky_wine_etl_spark.plans.round4h as r4h

    # orders encode edges: each order's part-pair is one edge
    rows = [
        Row(l_orderkey=10, l_partkey=1), Row(l_orderkey=10, l_partkey=2),
        Row(l_orderkey=11, l_partkey=2), Row(l_orderkey=11, l_partkey=3),
        Row(l_orderkey=12, l_partkey=1), Row(l_orderkey=12, l_partkey=3),
        Row(l_orderkey=13, l_partkey=3), Row(l_orderkey=13, l_partkey=4),
    ]
    li = spark.createDataFrame(rows)
    monkeypatch.setattr(r4h, "load_table", lambda spark, sf, name: li)
    out = {r.node: r for r in plans.QUERIES["graph_clustering_coeff"](spark, SF).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].coeff == 1.0 and out[1].degree == 2 and out[1].n_tri == 1
    assert out[2].coeff == 1.0
    assert out[3].degree == 3 and out[3].n_tri == 1
    # coeff is emitted rounded to 6 dp (oracle-parity contract)
    assert out[3].coeff == pytest.approx(round(2 * 1 / (3 * 2), 6), abs=1e-9)


def test_clustering_coeff_consistent_with_triangle_census(spark):
    """Σ n_tri over nodes = 3 × global triangle count; coeff ∈ [0,1]."""
    out = plans.QUERIES["graph_clustering_coeff"](spark, SF).collect()
    spark.catalog.clearCache()
    [tri] = plans.QUERIES["graph_triangle_count"](spark, SF).collect()
    spark.catalog.clearCache()
    assert sum(r.n_tri for r in out) == 3 * tri.n_triangles
    assert all(0.0 <= r.coeff <= 1.0 for r in out)


def test_centroid_affinity_shape_and_self_similarity(spark):
    out = plans.QUERIES["sim_centroid_affinity"](spark, SF).collect()
    spark.catalog.clearCache()
    labels = {r.label_a for r in out} | {r.label_b for r in out}
    k = len(labels)
    assert len(out) == k * (k - 1) // 2
    assert all(r.label_a < r.label_b for r in out)
    assert all(-1.0 - 1e-9 <= r.cosine <= 1.0 + 1e-9 for r in out)


def test_centroid_affinity_orthogonal_fixture(spark, monkeypatch):
    import whisky_wine_etl_spark.plans.round4h as r4h

    rows = [
        Row(vec_id=1, embedding=[1.0, 0.0], label=0),
        Row(vec_id=2, embedding=[1.0, 0.0], label=0),
        Row(vec_id=3, embedding=[0.0, 2.0], label=1),
        Row(vec_id=4, embedding=[3.0, 3.0], label=2),
    ]
    emb = spark.createDataFrame(rows)
    monkeypatch.setattr(r4h, "load_table", lambda spark, sf, name: emb)
    out = {(r.label_a, r.label_b): r.cosine for r in plans.QUERIES["sim_centroid_affinity"](spark, SF).collect()}
    spark.catalog.clearCache()
    assert out[(0, 1)] == 0.0
    assert out[(0, 2)] == pytest.approx(math.cos(math.pi / 4), abs=1e-4)
    assert out[(1, 2)] == pytest.approx(math.cos(math.pi / 4), abs=1e-4)


def test_funnel_latency_closed_form(spark, monkeypatch):
    """Three viewers; two convert with 1h and 3h latencies; a purchase
    BEFORE the first view must not count."""
    import datetime

    import whisky_wine_etl_spark.plans.round4h as r4h

    t0 = datetime.datetime(2024, 1, 1)

    def at(h):
        return t0 + datetime.timedelta(hours=h)

    rows = [
        Row(ts=at(0), user_id=1, event_type="view"),
        Row(ts=at(1), user_id=1, event_type="purchase"),
        Row(ts=at(5), user_id=1, event_type="purchase"),  # later one ignored
        Row(ts=at(0), user_id=2, event_type="view"),
        Row(ts=at(3), user_id=2, event_type="purchase"),
        Row(ts=at(2), user_id=3, event_type="purchase"),  # purchase pre-view
        Row(ts=at(4), user_id=3, event_type="view"),
    ]
    ev = spark.createDataFrame(rows)
    monkeypatch.setattr(r4h, "load_table", lambda spark, sf, name: ev)
    [res] = plans.QUERIES["events_funnel_latency"](spark, SF).collect()
    assert res.n_viewers == 3
    assert res.n_converted == 2
    assert res.median_hours == pytest.approx(2.0, abs=1e-6)  # interp of 1h,3h
    assert res.p90_hours == pytest.approx(2.8, abs=1e-6)


def test_funnel_latency_bounds_on_corpus(spark):
    [res] = plans.QUERIES["events_funnel_latency"](spark, SF).collect()
    n_view_users = (
        load_table(spark, SF, "events")
        .filter(F.col("event_type") == "view")
        .select("user_id")
        .distinct()
        .count()
    )
    assert res.n_viewers == n_view_users
    assert 0 < res.n_converted <= res.n_viewers
    assert 0 <= res.median_hours <= res.p90_hours
