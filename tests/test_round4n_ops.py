"""Behavior tests for round-4n: sparse cosine join, interval-overlap
join, multi-touch attribution, k-core, Naive Bayes."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from whisky_wine_etl_spark import plans

SF = "/root/testdata/sf0.001"

plans.load_all()


def _docs(spark, texts, langs=None):
    langs = langs or ["en"] * len(texts)
    return spark.createDataFrame(
        [
            Row(doc_id=i, text=t, lang=lg, source="s", n_chars=len(t))
            for i, (t, lg) in enumerate(zip(texts, langs))
        ]
    )


def test_sparse_cosine_identical_docs_similarity_one(spark, monkeypatch):
    """Two identical docs → cosine exactly 1; padding docs with unique
    vocab keep the shared terms under the df <= n/5 stop-term cap and
    must produce no other pair."""
    import whisky_wine_etl_spark.plans.round4n as r4n

    texts = ["alpha beta gamma", "alpha beta gamma"] + [
        f"pad{i}x pad{i}y pad{i}z" for i in range(8)
    ]
    docs = _docs(spark, texts)
    monkeypatch.setattr(r4n, "load_table", lambda s, sf, n: docs)
    out = plans.QUERIES["sim_sparse_cosine_join"](spark, SF).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_a, r.doc_b) == (0, 1)
    assert r.sim == pytest.approx(1.0, abs=1e-6)


def test_sparse_cosine_stop_terms_drop_ubiquitous(spark, monkeypatch):
    """A term present in >20% of docs is dropped before weighting: two
    docs sharing ONLY such a term get no pair."""
    import whisky_wine_etl_spark.plans.round4n as r4n

    # 'common' appears in 4/10 docs (> 20%); each doc has a unique term too
    texts = [f"common u{i}" for i in range(4)] + [f"solo{i} v{i}" for i in range(6)]
    docs = _docs(spark, texts)
    monkeypatch.setattr(r4n, "load_table", lambda s, sf, n: docs)
    assert plans.QUERIES["sim_sparse_cosine_join"](spark, SF).count() == 0


def _events(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=ts,
                user_id=u,
                event_type=et,
                value=float(v),
                props="{}",
            )
            for i, (ts, u, et, v) in enumerate(rows)
        ]
    )


def test_interval_overlap_exact_pair_and_length(spark, monkeypatch):
    """click [t, t+del) and view [t+100s, ...) overlap; a view 2 h away
    does not. Durations: |value| mod 3600 + 300."""
    import whisky_wine_etl_spark.plans.round4n as r4n

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    ev = _events(
        spark,
        [
            (t0, 1, "click", 0.0),  # [0, 300)
            (t0 + dt.timedelta(seconds=100), 1, "view", 0.0),  # [100, 400)
            (t0 + dt.timedelta(hours=2), 1, "view", 0.0),  # far away
            (t0, 2, "view", 0.0),  # other user: no pair
        ],
    )
    monkeypatch.setattr(r4n, "load_table", lambda s, sf, n: ev)
    out = plans.QUERIES["join_interval_overlap"](spark, SF).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.user_id, r.click_id, r.view_id) == (1, 0, 1)
    assert r.overlap_s == 200  # [100, 300)


def test_interval_overlap_bucket_straddle_dedups(spark, monkeypatch):
    """A pair overlapping across an hour boundary meets in two buckets
    but must emit exactly one row."""
    import whisky_wine_etl_spark.plans.round4n as r4n

    t0 = dt.datetime(2024, 1, 1, 0, 55, 0)
    ev = _events(
        spark,
        [
            (t0, 1, "click", 3300.0),  # dur 3300%3600+300=3600s: 00:55-01:55
            (t0 + dt.timedelta(minutes=2), 1, "view", 3300.0),  # 00:57-01:57
        ],
    )
    monkeypatch.setattr(r4n, "load_table", lambda s, sf, n: ev)
    out = plans.QUERIES["join_interval_overlap"](spark, SF).collect()
    assert len(out) == 1
    assert out[0].overlap_s == 3480  # 00:57 → 01:55


def test_multitouch_u_shaped_credits(spark, monkeypatch):
    """3-touch path: first 0.4, middle 0.2, last 0.4. Channels: the
    first+last are clicks, middle is a view."""
    import whisky_wine_etl_spark.plans.round4n as r4n

    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    ev = _events(
        spark,
        [
            (t0 - dt.timedelta(days=1), 1, "click", 0.0),
            (t0 - dt.timedelta(hours=12), 1, "view", 0.0),
            (t0 - dt.timedelta(hours=1), 1, "click", 0.0),
            (t0, 1, "purchase", 10.0),
            (t0 - dt.timedelta(days=8), 1, "click", 0.0),  # outside 7d
        ],
    )
    monkeypatch.setattr(r4n, "load_table", lambda s, sf, n: ev)
    out = {r.channel: r for r in plans.QUERIES["events_multitouch_attribution"](spark, SF).collect()}
    assert out["click"].credit == pytest.approx(0.8, abs=1e-6)
    assert out["click"].n_touches == 2
    assert out["view"].credit == pytest.approx(0.2, abs=1e-6)


def test_multitouch_single_and_double_touch(spark, monkeypatch):
    """1-touch path gets 1.0; 2-touch path splits 0.5/0.5."""
    import whisky_wine_etl_spark.plans.round4n as r4n

    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    ev = _events(
        spark,
        [
            (t0 - dt.timedelta(hours=1), 1, "view", 0.0),
            (t0, 1, "purchase", 1.0),
            (t0 - dt.timedelta(hours=2), 2, "click", 0.0),
            (t0 - dt.timedelta(hours=1), 2, "view", 0.0),
            (t0, 2, "purchase", 1.0),
        ],
    )
    monkeypatch.setattr(r4n, "load_table", lambda s, sf, n: ev)
    out = {r.channel: r for r in plans.QUERIES["events_multitouch_attribution"](spark, SF).collect()}
    assert out["view"].credit == pytest.approx(1.0 + 0.5, abs=1e-6)
    assert out["click"].credit == pytest.approx(0.5, abs=1e-6)


def test_kcore_peels_pendant_keeps_triangle(spark, monkeypatch):
    """Triangle {1,2,3} + pendant 4: degrees [2,2,3,1], k = P10 = 1.3;
    round 1 peels node 4, the triangle (all deg 2 afterwards) is
    stable through rounds 2-3."""
    import whisky_wine_etl_spark.plans.round4n as r4n

    rows = [
        Row(l_orderkey=10, l_partkey=1), Row(l_orderkey=10, l_partkey=2),
        Row(l_orderkey=11, l_partkey=2), Row(l_orderkey=11, l_partkey=3),
        Row(l_orderkey=12, l_partkey=1), Row(l_orderkey=12, l_partkey=3),
        Row(l_orderkey=13, l_partkey=3), Row(l_orderkey=13, l_partkey=4),
    ]
    li = spark.createDataFrame(rows)
    monkeypatch.setattr(r4n, "load_table", lambda s, sf, n: li)
    out = {r.node: r.deg for r in plans.QUERIES["graph_kcore"](spark, SF).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_naive_bayes_separable_vocab_perfect(spark, monkeypatch):
    """Disjoint per-language vocabularies → in-sample predictions must
    equal the labels."""
    import whisky_wine_etl_spark.plans.round4n as r4n

    texts = ["aa ab aa", "ab aa aa", "aa aa ab", "bb bc bb", "bc bb bb", "bb bb bc"]
    langs = ["en", "en", "en", "zh", "zh", "zh"]
    docs = _docs(spark, texts, langs)
    monkeypatch.setattr(r4n, "load_table", lambda s, sf, n: docs)
    out = plans.QUERIES["ml_naive_bayes_lang"](spark, SF).collect()
    assert len(out) == 6
    for r in out:
        assert r.pred_lang == r.lang
        assert r.score < 0


def test_naive_bayes_real_corpus_shape(spark):
    """One prediction per document; classes drawn from the label set."""
    docs_langs = {"de", "en", "es", "fr", "zh"}
    out = plans.QUERIES["ml_naive_bayes_lang"](spark, SF).collect()
    assert len(out) == 500
    assert {r.pred_lang for r in out} <= docs_langs
