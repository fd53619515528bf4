"""Round-4au: the distributed global-sort contract.

Registered AFTER round4at so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query


@query(
    "sort_global_contract",
    """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(0 AS BIGINT) AS range_overlaps,
       CAST(0 AS BIGINT) AS intra_violations,
       CAST(MIN(o_totalprice) AS DOUBLE) AS head_key,
       CAST(MAX(o_totalprice) AS DOUBLE) AS tail_key
FROM orders
""",
)
def sort_global_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed total-order contract, self-verified: orders is
    range-partitioned on (o_totalprice, o_orderkey) and sorted within
    partitions — the exact two-stage shape a global orderBy plans
    (sampled range bounds, no single-task sort) — and the query then
    PROVES the total order it claims: per-partition (min, max, count,
    intra-partition lag violations) aggregates are collected
    (O(partitions) driver rows) and adjacent partition ranges are
    checked for overlap. A green oracle row certifies zero overlap
    and zero intra-partition inversions — the property TeraSort-style
    pipelines rely on when they write range-partitioned output and
    later binary-search it. The violation counters are computed from
    the data, never assumed; the oracle pins them to the constant 0
    the contract demands."""
    o = load_table(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    n_parts = max(spark.sparkContext.defaultParallelism, 2)
    ranged = o.repartitionByRange(
        n_parts, "o_totalprice", "o_orderkey"
    ).sortWithinPartitions("o_totalprice", "o_orderkey")

    from pyspark.sql.window import Window

    part = ranged.withColumn("__pid", F.spark_partition_id())
    w = Window.partitionBy("__pid").orderBy("o_totalprice", "o_orderkey")
    lagged = part.withColumn(
        "__viol",
        F.when(
            (F.lag("o_totalprice").over(w) > F.col("o_totalprice"))
            | (
                (F.lag("o_totalprice").over(w) == F.col("o_totalprice"))
                & (F.lag("o_orderkey").over(w) > F.col("o_orderkey"))
            ),
            1,
        ).otherwise(0),
    )
    stats = (
        lagged.groupBy("__pid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            F.sum("__viol").alias("viol"),
        )
        .orderBy("__pid")
        .collect()  # O(partitions) rows — the contract audit
    )
    n_rows = sum(r.n for r in stats)
    intra = sum(r.viol for r in stats)
    overlaps = sum(
        1
        for a, b in zip(stats, stats[1:])
        if a.hi is not None and b.lo is not None and a.hi > b.lo
    )
    nonempty = [r for r in stats if r.n > 0]
    head = min(r.lo for r in nonempty)
    tail = max(r.hi for r in nonempty)
    return spark.createDataFrame(
        [(n_rows, overlaps, intra, float(head), float(tail))],
        "n_rows bigint, range_overlaps bigint, intra_violations bigint, "
        "head_key double, tail_key double",
    )


@query(
    "sql_execute_immediate",
    """
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders WHERE o_totalprice > 150000.0
GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
)
def sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic SQL the safe way: the statement text lives in a session
    variable with a parameter marker, and EXECUTE IMMEDIATE ... USING
    binds the threshold at execution — the generated-report pattern
    (statement assembled by tooling, values never concatenated into
    the string, no injection surface). Completes the dynamic-SQL
    trio: sql_parameterized_query (spark.sql binds),
    sql_identifier_clause (IDENTIFIER table refs), and this
    (statement-in-a-variable)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("sg_ei_orders")
    spark.sql("DECLARE OR REPLACE VARIABLE sg_ei_stmt STRING")
    spark.sql(
        """SET VAR sg_ei_stmt =
           'SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM sg_ei_orders WHERE o_totalprice > ?
            GROUP BY o_orderstatus ORDER BY o_orderstatus'"""
    )
    return spark.sql("EXECUTE IMMEDIATE sg_ei_stmt USING 150000.0")


@query(
    "func_timezone_pack",
    """
WITH loc AS (
  SELECT CAST(ts AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York'
              AS TIMESTAMP) AS ny, ts
  FROM events
)
SELECT CAST(EXTRACT(hour FROM ny) AS INT) AS ny_hour,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(*) FILTER (WHERE date_diff('hour', ny, ts) = 4) AS BIGINT)
         AS n_edt,
       CAST(COUNT(*) FILTER (WHERE date_diff('hour', ny, ts) = 5) AS BIGINT)
         AS n_est
FROM loc
GROUP BY 1
ORDER BY ny_hour
""",
)
def func_timezone_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone semantics under DST: event timestamps (stored naive,
    UTC by convention) convert to America/New_York wall time with
    from_utc_timestamp, bucket by LOCAL hour, and each bucket splits
    into EDT (UTC-4) vs EST (UTC-5) rows via the wall-clock offset —
    the computation every local-business-hours report does, and the
    one that silently shifts results when an engine's tz database
    disagrees. The oracle runs DuckDB's AT TIME ZONE chain over the
    same rows, so both engines' IANA rules (including the DST
    transitions inside the data's range) are pinned against each
    other."""
    ev = load_table(spark, sf_dir, "events")
    ny = F.from_utc_timestamp("ts", "America/New_York")
    off = F.expr(
        "timestampdiff(HOUR, from_utc_timestamp(ts, 'America/New_York'), ts)"
    )
    return (
        ev.select(ny.alias("ny"), off.alias("off"))
        .groupBy(F.hour("ny").cast("int").alias("ny_hour"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.count(F.when(F.col("off") == 4, 1)).cast("bigint").alias("n_edt"),
            F.count(F.when(F.col("off") == 5, 1)).cast("bigint").alias("n_est"),
        )
        .orderBy("ny_hour")
    )
