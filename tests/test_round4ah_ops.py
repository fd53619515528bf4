"""Behavior tests for round-4ah: BPE encode."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from whisky_wine_etl_spark import plans

SF = "/root/testdata/sf0.001"

plans.load_all()


def test_bpe_apply_compresses_repeated_bigrams(spark, monkeypatch):
    """A corpus dominated by 'abab': the first merges glue a+b (and
    ab+ab), so tokens per word drop below chars per word; singleton
    noise words stay fully split."""
    import whisky_wine_etl_spark.plans.round4ah as r4ah

    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text="abab abab abab", lang="en", source="s", n_chars=14)
            for i in range(5)
        ]
        + [Row(doc_id=99, text="xyz", lang="fr", source="s", n_chars=3)]
    )
    monkeypatch.setattr(r4ah, "load_table", lambda s, sf, n: docs)
    out = {r.lang: r for r in plans.QUERIES["corpus_bpe_apply"](spark, SF).collect()}
    en = out["en"]
    assert en.n_word_instances == 15
    assert en.n_chars == 60  # 15 × 'abab'
    # 3 merges on this corpus: a+b → ab, ab+ab → abab ⇒ 1 token/word
    assert en.n_tokens <= 15 * 2
    assert en.chars_per_token >= 2.0
    fr = out["fr"]
    # 'xyz' never benefits: one merge could apply at most; chars≈tokens
    assert fr.n_chars == 3
    assert fr.n_tokens >= 1


def test_bpe_apply_token_counts_bounded(spark):
    rows = plans.QUERIES["corpus_bpe_apply"](spark, SF).collect()
    assert rows
    for r in rows:
        # each token holds >= 1 char; merges only shrink counts
        assert r.n_tokens <= r.n_chars
        assert r.chars_per_token >= 1.0
