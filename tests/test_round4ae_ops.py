"""Behavior tests for round-4ae: deterministic negative sampling."""

from __future__ import annotations

from pyspark.sql import Row

from whisky_wine_etl_spark import plans

SF = "/root/testdata/sf0.001"

plans.load_all()


def test_negatives_never_self_and_exactly_k(spark, monkeypatch):
    import whisky_wine_etl_spark.plans.round4ae as r4ae

    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text="t", lang="en" if i % 2 else "fr", source="s",
                n_chars=1)
            for i in range(10, 30)
        ]
    )
    monkeypatch.setattr(r4ae, "load_table", lambda s, sf, n: docs)
    rows = plans.QUERIES["corpus_negative_samples"](spark, SF).collect()
    assert len(rows) == 20 * 4
    per_anchor: dict = {}
    for r in rows:
        assert r.negative_id != r.anchor_id  # cyclic offset can't self-hit
        per_anchor.setdefault(r.anchor_id, []).append(r.j)
    assert all(sorted(js) == [1, 2, 3, 4] for js in per_anchor.values())


def test_negatives_rerun_stable(spark):
    a = [tuple(r) for r in plans.QUERIES["corpus_negative_samples"](spark, SF).collect()]
    b = [tuple(r) for r in plans.QUERIES["corpus_negative_samples"](spark, SF).collect()]
    assert a == b
