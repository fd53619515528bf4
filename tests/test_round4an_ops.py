"""Behavior tests for round-4an: XML round-trip, effect sizes,
running arg-max, RAKE keywords."""

from __future__ import annotations

import math

from pyspark.sql import Row

from whisky_wine_etl_spark import plans

SF = "/root/testdata/sf0.001"

plans.load_all()


def test_xml_roundtrip_preserves_types_and_values(spark):
    out = plans.QUERIES["source_xml_roundtrip"](spark, SF)
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint", "string", "string", "bigint",
    ]
    orig = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "source", "n_chars"
    )
    assert out.exceptAll(orig).count() == 0 and orig.exceptAll(out).count() == 0


def test_effect_sizes_bounds_and_consistency(spark):
    r = plans.QUERIES["stat_effect_sizes"](spark, SF).collect()[0]
    # all three are [0, 1) and mutually consistent with chi2/n
    assert 0 <= r.cramers_v <= r.phi  # V = phi / sqrt(min(k)-1) <= phi
    assert 0 <= r.contingency_c < 1
    assert abs(r.phi - math.sqrt(r.chi2 / r.n)) < 1e-5


def test_running_argmax_tracks_best_so_far(spark, monkeypatch):
    import datetime as dt

    import whisky_wine_etl_spark.plans.round4an as r4an

    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            Row(event_id=1, ts=t0, user_id=1, event_type="a", value=5.0),
            Row(event_id=2, ts=t0 + dt.timedelta(seconds=1), user_id=1,
                event_type="b", value=3.0),
            Row(event_id=3, ts=t0 + dt.timedelta(seconds=2), user_id=1,
                event_type="c", value=9.0),
            # tie on value: higher event_id wins per composite key
            Row(event_id=4, ts=t0 + dt.timedelta(seconds=3), user_id=1,
                event_type="d", value=9.0),
        ]
    )
    monkeypatch.setattr(r4an, "load_table", lambda s, sf, n: ev)
    out = plans.QUERIES["window_running_argmax"](spark, SF).collect()
    assert [r.best_type for r in out] == ["a", "a", "c", "d"]
    assert [r.best_val for r in out] == [5.0, 5.0, 9.0, 9.0]


def test_rake_scores_crafted_corpus(spark, monkeypatch):
    """Two docs; phrase 'fast join' contains high-degree words, the
    singleton 'scan' scores 1.0 (degree=freq)."""
    import whisky_wine_etl_spark.plans.round4an as r4an

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="fast join the scan", lang="en",
                source="s", n_chars=18),
            Row(doc_id=2, text="fast join", lang="en", source="s", n_chars=9),
        ]
    )
    monkeypatch.setattr(r4an, "load_table", lambda s, sf, n: docs)
    out = {r.phrase: r for r in plans.QUERIES["text_keyword_rake"](spark, SF).collect()}
    # 'fast'/'join' each: freq 2, degree 2+2=4 -> score 2; phrase = 4
    assert out["fast join"].rake_score == 4.0 and out["fast join"].n_occ == 2
    # 'scan': freq 1, degree 1 -> 1.0
    assert out["scan"].rake_score == 1.0


def test_rake_caps_phrase_length(spark, monkeypatch):
    import whisky_wine_etl_spark.plans.round4an as r4an

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="w1 w2 w3 w4 w5 the w6", lang="en",
             source="s", n_chars=10)]
    )
    monkeypatch.setattr(r4an, "load_table", lambda s, sf, n: docs)
    phrases = {r.phrase for r in plans.QUERIES["text_keyword_rake"](spark, SF).collect()}
    assert phrases == {"w6"}  # the 5-word run is dropped by the cap
