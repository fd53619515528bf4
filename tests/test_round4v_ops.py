"""Behavior tests for round-4v: bloom prefilter, CMS, histogram
quantiles, HITS, largest-remainder allocation, item-item cosine,
ROC-AUC, calibration, inverted index."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from whisky_wine_etl_spark import plans

SF = "/root/testdata/sf0.001"

plans.load_all()


def _patch(monkeypatch, tables: dict):
    import whisky_wine_etl_spark.plans.round4v as r4v

    monkeypatch.setattr(
        r4v, "load_table", lambda s, sf, name: tables[name]
    )


def test_bloom_prefilter_equals_plain_semijoin(spark, monkeypatch):
    """The bloom is an optimization: result must equal the exact
    semi-join — customers with a qualifying order, nobody else."""
    cust = spark.createDataFrame(
        [Row(c_custkey=i, c_mktsegment="SEG", c_acctbal=10.0) for i in range(20)]
    )
    orders = spark.createDataFrame(
        [Row(o_custkey=i, o_totalprice=400000.0) for i in (3, 7, 11)]
        + [Row(o_custkey=5, o_totalprice=10.0)]  # below threshold
    )
    _patch(monkeypatch, {"customer": cust, "orders": orders})
    out = plans.QUERIES["join_bloom_prefilter"](spark, SF).collect()
    assert len(out) == 1
    assert out[0].n_customers == 3
    assert out[0].bal_sum == pytest.approx(30.0)


def test_cms_never_undercounts(spark):
    """Count-Min's defining guarantee: estimate >= exact, always."""
    rows = plans.QUERIES["sketch_cms_topk_err"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.overcount >= 0
        assert r.cms_n >= r.exact_n


def test_hist_quantiles_known_distribution(spark, monkeypatch):
    """100 orders priced 500, 1500, ..., one per bin: p50 must land in
    bin 49 (est 50000), p99 in bin 98 (est 99000)."""
    orders = spark.createDataFrame(
        [Row(o_totalprice=float(i * 1000 + 500)) for i in range(100)]
    )
    _patch(monkeypatch, {"orders": orders})
    out = {
        r.q: r for r in plans.QUERIES["sketch_quantile_hist"](spark, SF).collect()
    }
    assert out[0.5].est_value == pytest.approx(50000.0)
    assert out[0.99].est_value == pytest.approx(99000.0)
    assert out[0.5].total_n == 100


def test_hits_star_graph(spark, monkeypatch):
    """Every customer buys part 1; only customer 0 buys part 2.
    Part 1 must dominate with authority exactly 1.0."""
    orders = spark.createDataFrame(
        [Row(o_orderkey=i, o_custkey=i) for i in range(5)]
    )
    li = spark.createDataFrame(
        [Row(l_orderkey=i, l_partkey=1) for i in range(5)]
        + [Row(l_orderkey=0, l_partkey=2)]
    )
    _patch(monkeypatch, {"orders": orders, "lineitem": li})
    rows = plans.QUERIES["graph_hits_authorities"](spark, SF).collect()
    assert rows[0].l_partkey == 1
    assert rows[0].authority == pytest.approx(1.0)
    assert rows[1].authority < 0.5


def test_allocation_sums_to_exactly_1000(spark):
    rows = plans.QUERIES["alloc_largest_remainder"](spark, SF).collect()
    assert sum(r.seats for r in rows) == 1000
    # proportionality sanity: every nation with revenue gets >= floor share
    assert all(r.seats >= 0 for r in rows)


def test_item_item_cosine_perfect_pair(spark, monkeypatch):
    """Two parts in every one of 4 baskets → cosine exactly 1 both
    directions; a third part present once is below support."""
    li = spark.createDataFrame(
        [Row(l_orderkey=o, l_partkey=p) for o in range(4) for p in (10, 20)]
        + [Row(l_orderkey=0, l_partkey=30)]
    )
    _patch(monkeypatch, {"lineitem": li})
    rows = plans.QUERIES["rec_item_item_cosine"](spark, SF).collect()
    got = {(r.item, r.other): r.cosine for r in rows}
    assert got[(10, 20)] == pytest.approx(1.0)
    assert got[(20, 10)] == pytest.approx(1.0)
    assert not any(30 in k for k in got)


def test_roc_auc_perfect_separation(spark, monkeypatch):
    """All positives score above all negatives → AUC = 1."""
    orders = spark.createDataFrame(
        [Row(o_totalprice=float(100 + i), o_orderstatus="F") for i in range(10)]
        + [Row(o_totalprice=float(i), o_orderstatus="O") for i in range(10)]
    )
    _patch(monkeypatch, {"orders": orders})
    r = plans.QUERIES["ml_roc_auc"](spark, SF).collect()[0]
    assert r.auc == pytest.approx(1.0)
    assert r.gini == pytest.approx(1.0)
    assert (r.n_pos, r.n_neg) == (10, 10)


def test_roc_auc_all_ties_is_half(spark, monkeypatch):
    """A constant score can't rank anything: AUC = 0.5 by the tie
    correction."""
    orders = spark.createDataFrame(
        [Row(o_totalprice=42.0, o_orderstatus="F") for _ in range(5)]
        + [Row(o_totalprice=42.0, o_orderstatus="O") for _ in range(5)]
    )
    _patch(monkeypatch, {"orders": orders})
    r = plans.QUERIES["ml_roc_auc"](spark, SF).collect()[0]
    assert r.auc == pytest.approx(0.5)


def test_calibration_bins_monotone_bins(spark):
    rows = plans.QUERIES["ml_calibration_bins"](spark, SF).collect()
    bins = [r.bin for r in rows]
    assert bins == sorted(bins)
    assert all(0 <= r.bin <= 9 for r in rows)
    for r in rows:
        assert 0.0 <= r.mean_score <= 1.0
        assert 0.0 <= r.pos_rate <= 1.0


def test_inverted_index_postings_sorted_and_df_consistent(spark, monkeypatch):
    docs = spark.createDataFrame(
        [
            Row(doc_id=3, text="apple banana", lang="en", source="s", n_chars=12),
            Row(doc_id=1, text="apple apple", lang="en", source="s", n_chars=11),
            Row(doc_id=2, text="banana", lang="en", source="s", n_chars=6),
        ]
    )
    _patch(monkeypatch, {"documents": docs})
    rows = {r.term: r for r in plans.QUERIES["text_inverted_index"](spark, SF).collect()}
    assert rows["apple"].doc_freq == 2
    assert rows["apple"].tf_total == 3  # doc 1 has it twice
    assert rows["apple"].postings_head == "1,3"  # sorted by doc_id
    assert rows["banana"].postings_head == "2,3"
