"""Behavior tests for round-4aq: pandas-API twins, corrupt-JSONL
ingestion, approx_top_k exact regime."""

from __future__ import annotations

from pyspark.sql import functions as F

from whisky_wine_etl_spark import plans

SF = "/root/testdata/sf0.001"

plans.load_all()


def test_pandas_api_wine_matches_native_twin(spark):
    """The pandas-dialect cleaning must equal the native-DataFrame
    T-1..T-4 chain row for row."""
    ps_out = plans.QUERIES["pandas_api_wine_clean"](spark, SF)
    native = (
        plans.QUERIES["wine_t1_t2_cast_dropna"](spark, SF)
        .join(
            plans.QUERIES["wine_t3_t4_fill_strip"](spark, SF), "id"
        )
        .select("id", "points", "taster_twitter_handle")
    )
    assert ps_out.exceptAll(native).count() == 0
    assert native.exceptAll(ps_out).count() == 0


def test_pandas_api_report_no_sequence_index_window(spark):
    """The merge/groupby chain must not smuggle in the single-
    partition sequence-index window."""
    df = plans.QUERIES["pandas_api_orders_report"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "row_number" not in plan.lower()
    assert "BatchEvalPython" not in plan


def test_corrupt_jsonl_quarantines_every_bad_line(spark):
    out = plans.QUERIES["source_json_corrupt_roundtrip"](spark, SF).collect()[0]
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert out.n_good == docs.count()
    assert out.n_corrupt == 7
    assert out.id_sum == docs.agg(F.sum("doc_id")).collect()[0][0]


def test_approx_top_k_exact_regime_counts(spark):
    rows = plans.QUERIES["agg_approx_top_k"](spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {r.event_type: r.n for r in rows} == exact
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)
