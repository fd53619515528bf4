"""Round-4u additions: source/sink round-trips registered as
verified queries — JDBC write + partitioned read-back, CSV with
hostile quoting, JSON-lines, and dynamic partition overwrite. Each
round-trip happens entirely inside the Spark query; the oracle reads
only the original parquet, so the comparison proves the sink+source
pair loses nothing.

Registered AFTER round4t so the driver's unverified-first ordering
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


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _tmpdir(spark: SparkSession, sf_dir: str, kind: str) -> str:
    """Per-(sf_dir, application) scratch path under /tmp — a fresh
    session never collides with a previous session's leftovers."""
    tag = (
        hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        + "_"
        + hashlib.md5(spark.sparkContext.applicationId.encode()).hexdigest()[:8]
    )
    return os.path.join(tempfile.gettempdir(), f"sg_{kind}_{tag}")


# ---------------------------------------------------------------------------
# JDBC write + partition-parallel read-back — the live-connection
# side of S-5 (reference wine_etl_kaggle.py:167-204): append customer
# to an embedded Derby table, read it back with range-partitioned
# parallel JDBC, aggregate. The oracle aggregates the original
# parquet — equality proves type mapping, null binding, batching and
# the partitioned reader's range predicates lose no rows.
# ---------------------------------------------------------------------------


@query(
    "source_jdbc_roundtrip",
    """
SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(c_acctbal), 2) AS bal_sum,
       CAST(SUM(c_nationkey) AS BIGINT) AS nation_checksum
FROM customer GROUP BY c_mktsegment
""",
)
def source_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer -> Derby (batched partition-parallel INSERTs, the
    Spark replacement for the reference's row-at-a-time to_sql) ->
    partition-parallel JDBC read (4 range partitions on c_custkey)
    -> aggregate. At 100 TB the same shape fans both directions
    across executors — one connection per task. Postgres dialect
    rendering is pinned separately in tests/test_sources.py; Derby
    is the in-container stand-in."""
    from whisky_wine_etl_spark.sources.io import read_jdbc, write_jdbc_append

    db = _tmpdir(spark, sf_dir, "jdbcdb")
    url = f"jdbc:derby:{db};create=true"
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    c = _t(spark, sf_dir, "customer")
    marker = db + ".written"
    if not os.path.exists(marker):
        write_jdbc_append(
            c, url, "customer_rt", driver=driver, num_partitions=4
        )
        with open(marker, "w") as f:
            f.write("ok")
    lo, hi = 0, c.agg(F.max("c_custkey")).collect()[0][0] + 1
    back = read_jdbc(
        spark,
        url,
        "customer_rt",
        driver=driver,
        partition_column="c_custkey",
        lower_bound=lo,
        upper_bound=hi,
        num_partitions=4,
    )
    return back.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.sum("c_acctbal"), 2).alias("bal_sum"),
        F.sum("c_nationkey").cast("bigint").alias("nation_checksum"),
    )


# ---------------------------------------------------------------------------
# CSV round-trip under hostile quoting — embed commas, quotes and
# newline-ish content into the values BEFORE writing, so the CSV
# writer must quote/escape and the reader must undo it exactly.
# ---------------------------------------------------------------------------


@query(
    "source_csv_quoting_roundtrip",
    """
WITH d AS (
  SELECT doc_id,
         '"' || lang || '",' || substr(text, 1, 40) AS hostile,
         n_chars
  FROM documents
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(length(hostile)) AS BIGINT) AS len_sum,
       CAST(SUM(n_chars) AS BIGINT) AS chars_sum,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM d
""",
)
def source_csv_quoting_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a column that STARTS with a double quote and contains
    commas (worst-case CSV content), write it with Spark's CSV sink
    (header, default quoting/escaping), read it back with an explicit
    schema, and checksum. The oracle computes the same checksums from
    the original parquet — equality means the writer's quoting and
    the reader's unescaping are exact inverses, the property the
    reference's CSV handoffs (wine_etl_kaggle.py:93-96) silently
    rely on."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit('"'), F.col("lang"), F.lit('",'), F.substring("text", 1, 40)
        ).alias("hostile"),
        "n_chars",
    )
    path = _tmpdir(spark, sf_dir, "csvrt")
    if not os.path.isdir(path):
        (
            d.write.mode("overwrite")
            .option("header", True)
            # univocity trims unprotected whitespace on write by
            # default; the round-trip must preserve trailing spaces
            # from the 40-char text cut
            .option("ignoreLeadingWhiteSpace", False)
            .option("ignoreTrailingWhiteSpace", False)
            .csv(path)
        )
    back = (
        spark.read.option("header", True)
        .schema("doc_id bigint, hostile string, n_chars bigint")
        .csv(path)
    )
    return back.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.length("hostile")).cast("bigint").alias("len_sum"),
        F.sum("n_chars").cast("bigint").alias("chars_sum"),
        F.sum("doc_id").cast("bigint").alias("id_checksum"),
    )


# ---------------------------------------------------------------------------
# JSON-lines round-trip — nested struct out, schema-inferred read
# back, checksum. The nested envelope exercises struct flattening on
# re-read, not just scalar columns.
# ---------------------------------------------------------------------------


@query(
    "source_jsonl_roundtrip",
    """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 2) AS value_sum,
       CAST(SUM(user_id) AS BIGINT) AS user_checksum
FROM events GROUP BY event_type
""",
)
def source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events nested into {meta: {user, type}, payload: {value}}
    structs, written as JSON lines, read back with schema inference,
    flattened, aggregated. The oracle aggregates the original
    parquet — proving the JSON writer/reader pair (the reference's
    actual interchange format, wine_etl_kaggle.py:46-69) round-trips
    nested structure and numerics exactly."""
    ev = _t(spark, sf_dir, "events").select(
        F.struct(
            F.col("user_id").alias("user"), F.col("event_type").alias("type")
        ).alias("meta"),
        F.struct(F.col("value").alias("value")).alias("payload"),
    )
    path = _tmpdir(spark, sf_dir, "jsonrt")
    if not os.path.isdir(path):
        ev.write.mode("overwrite").json(path)
    back = spark.read.json(path)
    return back.groupBy(F.col("meta.type").alias("event_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.sum("payload.value"), 2).alias("value_sum"),
        F.sum("meta.user").cast("bigint").alias("user_checksum"),
    )


# ---------------------------------------------------------------------------
# Dynamic partition overwrite — the idempotent-backfill primitive:
# write events partitioned by type, then re-run ONE partition's load
# with INSERT OVERWRITE in dynamic mode; untouched partitions must
# survive byte-for-byte. The final state equals the original data, so
# the parquet oracle catches both failure modes (clobbered siblings,
# stale target).
# ---------------------------------------------------------------------------


@query(
    "source_dynamic_partition_overwrite",
    """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(event_id) AS BIGINT) AS id_checksum
FROM events GROUP BY event_type
""",
)
def source_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned write (partitionBy event_type) followed by a
    dynamic-mode overwrite of ONLY the 'purchase' partition (the
    daily-backfill idiom: re-running one day must not clobber the
    others — static overwrite mode would truncate the whole table).
    Reading the final layout must reproduce the source exactly:
    sibling partitions untouched, target partition replaced not
    duplicated."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    path = _tmpdir(spark, sf_dir, "dpo")
    if not os.path.isdir(path):
        ev.write.mode("overwrite").partitionBy("event_type").parquet(path)
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            ev.where(F.col("event_type") == "purchase").write.mode(
                "overwrite"
            ).partitionBy("event_type").parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    back = spark.read.parquet(path)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("event_id").cast("bigint").alias("id_checksum"),
    )
