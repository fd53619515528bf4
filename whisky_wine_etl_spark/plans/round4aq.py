"""Round-4aq: pandas-API-on-Spark twins of the reference's literal
pandas code, malformed-JSONL ingestion accounting, and sketch top-k
in its exact regime.

Registered AFTER round4ap so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query
from whisky_wine_etl_spark.plans.wine import WINE_CTE, wine_input


def _scratch(spark: SparkSession, sf_dir: str, leaf: str) -> str:
    tag = hashlib.md5(
        (sf_dir + spark.sparkContext.applicationId).encode()
    ).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"sg_r4aq_{tag}", leaf)


# ---------------------------------------------------------------------------
# pandas API on Spark: the reference's DAG code is literal pandas
# (/root/reference/dags/wine_etl_kaggle.py:118-160 uses pd.to_numeric,
# dropna, fillna, str.replace). pyspark.pandas runs that *surface
# syntax* on the distributed engine — the lowest-friction migration
# path for the reference's users, and these queries prove it against
# the same oracles as the DataFrame implementations.
# ---------------------------------------------------------------------------


@query(
    "pandas_api_wine_clean",
    f"""
{WINE_CTE}
SELECT id, TRY_CAST(points AS DOUBLE) AS points,
       REPLACE(COALESCE(taster_twitter_handle, 'unknown'), '@', '')
         AS taster_twitter_handle
FROM wine
WHERE TRY_CAST(points AS DOUBLE) IS NOT NULL
""",
)
def pandas_api_wine_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's T-1..T-4 wine cleaning written in the pandas
    dialect itself — ps.to_numeric(errors='coerce'), dropna, fillna,
    .str.replace — executed distributed by pandas-API-on-Spark, and
    verified by the SAME oracle as the native-DataFrame twins
    (wine_t1_t2_cast_dropna / wine_t3_t4_fill_strip,
    plans/wine.py:114,:132; reference dags/wine_etl_kaggle.py:118-136).
    The id column rides as the frame's index (index_col='id'), so no
    distributed-sequence index job is triggered: every step stays a
    lazy Column expression over the Spark plan, and .to_spark()
    returns the engine frame with zero data movement."""
    import pyspark.pandas as ps

    pdf = wine_input(spark, sf_dir).pandas_api(index_col="id")
    pdf["points"] = ps.to_numeric(pdf["points"], errors="coerce")
    pdf = pdf.dropna(subset=["points"])
    pdf["taster_twitter_handle"] = (
        pdf["taster_twitter_handle"].fillna("unknown").str.replace("@", "", regex=False)
    )
    return pdf[["points", "taster_twitter_handle"]].to_spark(index_col="id")


@query(
    "pandas_api_orders_report",
    """
SELECT c.c_mktsegment, o.o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o.o_totalprice), 2) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment, o.o_orderstatus
ORDER BY c.c_mktsegment, o.o_orderstatus
""",
)
def pandas_api_orders_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic pandas analyst workflow — merge, groupby-agg with
    named aggregations, reset_index, sort_values — via
    pandas-API-on-Spark over the TPC-H tables. Every step lowers to
    the same Catalyst plan a hand-written DataFrame query produces
    (broadcast join + two-phase aggregate, pinned in
    tests/test_plans_physical.py); the pandas surface costs nothing
    at execution time as long as no order-dependent pandas semantics
    (positional index, iloc) are requested."""
    import pyspark.pandas as ps

    prev = ps.get_option("compute.ops_on_diff_frames")
    prev_idx = ps.get_option("compute.default_index_type")
    ps.set_option("compute.ops_on_diff_frames", True)
    # never the single-partition 'sequence' index: the frames carry
    # explicit keys, so a distributed index keeps every intermediate
    # shuffle-parallel even if pandas semantics ask for an index
    ps.set_option("compute.default_index_type", "distributed")
    try:
        o = load_table(spark, sf_dir, "orders").pandas_api(
            index_col="o_orderkey"
        ).reset_index()
        c = load_table(spark, sf_dir, "customer").pandas_api(
            index_col="c_custkey"
        ).reset_index()
        m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
        g = (
            m.groupby(["c_mktsegment", "o_orderstatus"])
            .agg(n_orders=("o_orderkey", "count"), revenue=("o_totalprice", "sum"))
            .reset_index()
            .sort_values(["c_mktsegment", "o_orderstatus"])
        )
        out = g.to_spark()
    finally:
        ps.set_option("compute.ops_on_diff_frames", prev)
        ps.set_option("compute.default_index_type", prev_idx)
    return out.select(
        "c_mktsegment",
        "o_orderstatus",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.round("revenue", 2).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Malformed-record ingestion accounting: PERMISSIVE mode quarantines
# corrupt lines into a column instead of failing the job — the
# batch-ingest contract for hostile feeds.
# ---------------------------------------------------------------------------


@query(
    "source_json_corrupt_roundtrip",
    """
SELECT CAST(COUNT(*) AS BIGINT) AS n_good,
       CAST(7 AS BIGINT) AS n_corrupt,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM documents
""",
)
def source_json_corrupt_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hostile-feed ingestion: the documents metadata goes out as
    JSONL, seven deliberately malformed lines (truncated object, bare
    text, unclosed string, wrong bracket) are appended to the landing
    dir, and the read-back uses PERMISSIVE mode with an explicit
    corrupt-record column — every bad line becomes a quarantined row
    instead of a dead job (FAILFAST) or a silent drop (DROPMALFORMED).
    The returned accounting row proves no good row was lost or
    double-read and every bad line was quarantined. The frame is
    cached before splitting on the corrupt column (Spark requires
    materialization to query a corrupt-record column on its own)."""
    path = _scratch(spark, sf_dir, "hostile_jsonl")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    docs.coalesce(4).write.mode("overwrite").json(path)
    bad_lines = [
        '{"doc_id": 900000001, "lang": "en"',  # truncated object
        "this is not json at all",
        '{"doc_id": "unterminated string}',
        '[{"doc_id": 900000002}',  # unclosed array wrapper
        "{]",
        '{"doc_id": 900000003,,}',
        '"',
    ]
    with open(os.path.join(path, "part-hostile.json"), "w") as f:
        f.write("\n".join(bad_lines) + "\n")
    back = (
        spark.read.schema("doc_id bigint, lang string, n_chars bigint, _bad string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .json(path)
    )
    back = back.localCheckpoint()  # materializes (corrupt-col rule) AND is GC-cleaned
    return back.agg(
        F.count(F.when(F.col("_bad").isNull(), 1)).cast("bigint").alias("n_good"),
        F.count(F.when(F.col("_bad").isNotNull(), 1)).cast("bigint").alias("n_corrupt"),
        F.sum(F.when(F.col("_bad").isNull(), F.col("doc_id")))
        .cast("bigint")
        .alias("id_sum"),
    )


# ---------------------------------------------------------------------------
# approx_top_k in its exact regime: when the tracked-item budget
# covers the domain, the sketch's counts are exact — so the heavy
# hitters sketch gets a full-value oracle here, complementing the
# rows-only carve-outs of the genuinely approximate sketches.
# ---------------------------------------------------------------------------


@query(
    "agg_approx_top_k",
    """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY event_type
ORDER BY n DESC, event_type
""",
)
def agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via the approx_top_k aggregate (Spark 4.1):
    k = 20 with the default 10k tracked items covers the event-type
    domain, so the sketch operates in its EXACT regime and the oracle
    verifies every count — the same guarantee regime Misra-Gries has
    below its capacity (companion: stream_heavy_hitters_mg). The
    result re-sorts deterministically by (count desc, item) because
    the sketch's own output order on ties is unspecified. At 100 TB
    the sketch is one partial-aggregable state of O(k) per partition
    — no shuffle of the raw values, only sketch merges."""
    ev = load_table(spark, sf_dir, "events")
    tk = ev.agg(F.expr("approx_top_k(event_type, 20)").alias("tk"))
    return (
        tk.select(F.explode("tk").alias("s"))
        .select(
            F.col("s.item").alias("event_type"),
            F.col("s.count").cast("bigint").alias("n"),
        )
        .orderBy(F.desc("n"), "event_type")
    )
