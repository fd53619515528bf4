"""Round-4am: higher-order lambda functions, IDENTIFIER-clause table
parameterization, collation-aware grouping, and adjacent-duplicate
event compaction.

Registered AFTER round4al so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query


@query(
    "func_lambda_pack",
    """
SELECT vec_id,
       CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
       len(list_filter(embedding, x -> abs(x) > 2.0)) > 0 AS has_big,
       len(list_filter(embedding, x -> NOT (abs(x) < 1e6))) = 0 AS all_finite,
       ROUND(list_sum(list_transform(list_zip(embedding, list_reverse(embedding)),
             p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), 3) AS dot_rev
FROM embeddings
ORDER BY vec_id
""",
)
def func_lambda_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order lambda functions the array pack doesn't cover:
    `filter`, `exists`, `forall`, `zip_with` — all Catalyst
    expressions (no Python UDF), so they stay inside whole-stage
    codegen and scale as a pure map over the vector column. Elements
    are cast to double BEFORE the multiply so the fold matches the
    oracle bit-for-bit at round(3)."""
    e = load_table(spark, sf_dir, "embeddings")
    prod = F.zip_with(
        "embedding",
        F.reverse(F.col("embedding")),
        lambda a, b: a.cast("double") * b.cast("double"),
    )
    return (
        e.select(
            "vec_id",
            F.size(F.filter("embedding", lambda x: x > F.lit(0))).cast("bigint").alias("n_pos"),
            F.exists("embedding", lambda x: F.abs(x) > F.lit(2.0)).alias("has_big"),
            F.forall("embedding", lambda x: F.abs(x) < F.lit(1e6)).alias("all_finite"),
            F.round(F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x), 3).alias("dot_rev"),
        )
        .orderBy("vec_id")
    )


@query(
    "sql_identifier_clause",
    """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(l_extendedprice), 2) AS total
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def sql_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-name parameterization via the IDENTIFIER clause: the
    table reference is a named bind (`IDENTIFIER(:tbl)`), not a
    string splice — the safe form of dynamic-table dispatch a
    multi-tenant job uses to route one plan over per-tenant tables.
    Pairs with sql_parameterized_query (value binds)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_ident")
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(l_extendedprice), 2) AS total
        FROM IDENTIFIER(:tbl)
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """,
        args={"tbl": "li_ident"},
    )


@query(
    "func_collation_group",
    """
SELECT lower(mixed) AS etype_ci,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 2) AS total
FROM (SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
             ELSE event_type END AS mixed, value
      FROM events)
GROUP BY 1
ORDER BY 1
""",
)
def func_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping via a UTF8_LCASE collated key (Spark
    4 collations): the mixed-case key groups without a lower() copy
    of the column — collation is metadata on the comparison, not a
    rewrite, so the same column can drive a collated group-by AND a
    case-sensitive join. The deterministic mixed-case derivation
    (event_id parity) makes the case-folding observable: without the
    collation the group count doubles. Output is lower()ed so both
    engines emit one canonical key."""
    ev = load_table(spark, sf_dir, "events").select(
        F.when(F.col("event_id") % 2 == 0, F.upper("event_type"))
        .otherwise(F.col("event_type"))
        .alias("mixed"),
        "value",
    )
    return (
        ev.groupBy(F.collate(F.col("mixed"), "UTF8_LCASE").alias("k"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .select(
            F.lower(F.col("k")).cast("string").alias("etype_ci"), "n", "total"
        )
        .orderBy("etype_ci")
    )


@query(
    "events_collapse_adjacent",
    """
WITH ordered AS (
  SELECT user_id, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT user_id, event_id, event_type
FROM ordered
WHERE prev_type IS NULL OR event_type <> prev_type
ORDER BY user_id, event_id
""",
)
def events_collapse_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-duplicate compaction: drop an event when it repeats
    the user's immediately-previous event type — the stream-compaction
    pass that precedes funnel/path analysis so self-loops don't count
    as transitions. One window (partition user, order ts with
    event_id tie-break), one lag, one filter: a single shuffle on
    user_id, no self-join. At 100 TB this is the same plan — state is
    one row per partition-order position."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
        .select("user_id", "event_id", "event_type")
        .orderBy("user_id", "event_id")
    )
