"""Round-4an: native XML source round-trip, association effect sizes,
running arg-max window, and RAKE keyword extraction.

Registered AFTER round4am so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query


def _scratch(spark: SparkSession, sf_dir: str, leaf: str) -> str:
    tag = hashlib.md5(
        (sf_dir + spark.sparkContext.applicationId).encode()
    ).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"sg_r4an_{tag}", leaf)


@query(
    "source_xml_roundtrip",
    "SELECT doc_id, lang, source, n_chars FROM documents",
)
def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native XML sink/source round-trip (Spark 4 built-in `xml`
    format — no external package): documents metadata goes out as
    row-tagged XML and comes back value-identical, with integer
    columns re-inferred as BIGINT. XML is the interchange format
    enterprise feeds still speak; the round-trip pins both the writer
    escaping and the reader's schema inference. The text column stays
    out: whitespace-only content is XML-normalized by design, which
    is a format property, not fidelity loss we want graded in."""
    path = _scratch(spark, sf_dir, "xml_docs")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    (
        docs.write.format("xml")
        .option("rootTag", "documents")
        .option("rowTag", "doc")
        .mode("overwrite")
        .save(path)
    )
    back = spark.read.format("xml").option("rowTag", "doc").load(path)
    return back.select("doc_id", "lang", "source", "n_chars")


@query(
    "stat_effect_sizes",
    """
WITH c AS (
  SELECT o_orderstatus AS a, o_orderpriority AS b, COUNT(*) AS n
  FROM orders GROUP BY 1, 2
),
ra AS (SELECT a, SUM(n) AS na FROM c GROUP BY a),
rb AS (SELECT b, SUM(n) AS nb FROM c GROUP BY b),
t AS (SELECT SUM(n) AS total FROM c),
chi AS (
  SELECT t.total AS n,
         COUNT(DISTINCT c.a) AS ka, COUNT(DISTINCT c.b) AS kb,
         SUM(POWER(c.n - CAST(ra.na AS DOUBLE) * rb.nb / t.total, 2)
             / (CAST(ra.na AS DOUBLE) * rb.nb / t.total)) AS chi2
  FROM c JOIN ra USING (a) JOIN rb USING (b) CROSS JOIN t
  GROUP BY t.total
)
SELECT CAST(n AS BIGINT) AS n,
       ROUND(chi2, 6) AS chi2,
       ROUND(SQRT(chi2 / (n * LEAST(ka - 1, kb - 1))), 6) AS cramers_v,
       ROUND(SQRT(chi2 / n), 6) AS phi,
       ROUND(SQRT(chi2 / (chi2 + n)), 6) AS contingency_c
FROM chi
""",
)
def stat_effect_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association effect sizes over the status × priority
    contingency table: Cramér's V, phi, and Pearson's contingency
    coefficient — the "is this chi-square LARGE?" companions to
    stat_chi2_independence (plans/round4c.py). Identical scale shape:
    the fact scan partial-aggregates to the tiny cell table; every
    downstream number derives from exact integer cells, so 6-dp
    rounding is bit-stable across engines."""
    o = load_table(spark, sf_dir, "orders")
    c = o.groupBy(
        F.col("o_orderstatus").alias("a"), F.col("o_orderpriority").alias("b")
    ).agg(F.count(F.lit(1)).alias("n"))
    ra = c.groupBy("a").agg(F.sum("n").alias("na"))
    rb = c.groupBy("b").agg(F.sum("n").alias("nb"))
    t = c.agg(F.sum("n").alias("total"))
    j = (
        c.join(F.broadcast(ra), "a")
        .join(F.broadcast(rb), "b")
        .crossJoin(F.broadcast(t))
    )
    exp = F.col("na") * F.col("nb") / F.col("total")
    chi = j.groupBy("total").agg(
        F.countDistinct("a").alias("ka"),
        F.countDistinct("b").alias("kb"),
        F.sum(F.pow(F.col("n") - exp, 2) / exp).alias("chi2"),
    )
    n = F.col("total")
    return chi.select(
        n.cast("long").alias("n"),
        F.round("chi2", 6).alias("chi2"),
        F.round(
            F.sqrt(F.col("chi2") / (n * F.least(F.col("ka") - 1, F.col("kb") - 1))), 6
        ).alias("cramers_v"),
        F.round(F.sqrt(F.col("chi2") / n), 6).alias("phi"),
        F.round(F.sqrt(F.col("chi2") / (F.col("chi2") + n)), 6).alias("contingency_c"),
    )


@query(
    "window_running_argmax",
    """
SELECT user_id, event_id,
       (max({'v': value, 'i': event_id, 't': event_type}) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)).t AS best_type,
       ROUND(max(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS best_val
FROM events
ORDER BY user_id, event_id
""",
)
def window_running_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running arg-max: at each event, WHICH event type has carried
    the user's highest value so far — `max_by` as a window function,
    with (value, event_id) as the composite ordering key so ties
    break deterministically on both engines. One user-partitioned
    window, running frame, no self-join — the leaderboard-over-time
    shape."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            F.expr("max_by(event_type, struct(value, event_id))")
            .over(w)
            .alias("best_type"),
            F.round(F.max("value").over(w), 2).alias("best_val"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "text_keyword_rake",
    r"""
WITH phr AS (
  SELECT trim(p) AS phrase
  FROM documents, unnest(regexp_split_to_array(lower(text), '\b(?:the|a)\b')) AS t(p)
  WHERE trim(p) <> ''
    AND len(regexp_split_to_array(trim(p), ' +')) <= 4
),
pw AS (
  SELECT phrase, w, len(regexp_split_to_array(phrase, ' +')) AS plen
  FROM phr, unnest(regexp_split_to_array(phrase, ' +')) AS t(w)
),
ws AS (
  SELECT w, CAST(SUM(plen) AS DOUBLE) / COUNT(*) AS score FROM pw GROUP BY w
),
dphr AS (SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occ FROM phr GROUP BY phrase),
pscore AS (
  SELECT d.phrase, d.n_occ, ROUND(SUM(ws.score), 3) AS rake_score
  FROM dphr d,
       unnest(regexp_split_to_array(d.phrase, ' +')) AS t(w)
       JOIN ws USING (w)
  GROUP BY d.phrase, d.n_occ
)
SELECT phrase, n_occ, rake_score
FROM pscore
ORDER BY rake_score DESC, phrase
LIMIT 15
""",
)
def text_keyword_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-delimited runs (capped at 4 words, the
    standard maxWords guard), each word scores degree/frequency over
    the candidate corpus, and a phrase scores the sum of its word
    scores. Two corpus-wide aggregations (word stats, distinct
    phrases) plus one broadcast-size join from phrase words to word
    scores — no per-document Python, no quadratic step; the top-15 is
    a TakeOrdered, not a global sort. Word stats are computed over
    the CAPPED candidates, per reference RAKE implementations."""
    docs = load_table(spark, sf_dir, "documents")
    phr = (
        docs.select(
            F.explode(F.split(F.lower("text"), r"\b(?:the|a)\b")).alias("p")
        )
        .select(F.trim("p").alias("phrase"))
        .filter(
            (F.col("phrase") != "")
            & (F.size(F.split("phrase", " +")) <= 4)
        )
    )
    pw = phr.select(
        "phrase",
        F.size(F.split("phrase", " +")).alias("plen"),
        F.explode(F.split("phrase", " +")).alias("w"),
    )
    ws = pw.groupBy("w").agg(
        (F.sum("plen") * F.lit(1.0) / F.count(F.lit(1))).alias("score")
    )
    dphr = phr.groupBy("phrase").agg(F.count(F.lit(1)).cast("bigint").alias("n_occ"))
    pscore = (
        dphr.select("phrase", "n_occ", F.explode(F.split("phrase", " +")).alias("w"))
        .join(F.broadcast(ws), "w")
        .groupBy("phrase", "n_occ")
        .agg(F.round(F.sum("score"), 3).alias("rake_score"))
    )
    return pscore.orderBy(F.desc("rake_score"), "phrase").limit(15)
