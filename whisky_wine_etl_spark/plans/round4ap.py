"""Round-4ap: session variables, SQL scripting control flow, and
temperature-scaled multilingual mixture weights.

Registered AFTER round4ao so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query

# ---------------------------------------------------------------------------
# Session variables (Spark 4: DECLARE VARIABLE / SET VAR): typed,
# session-scoped scalars that parameterize SQL without string
# interpolation — the "run the daily report for the segment picked by
# this control query" pattern.
# ---------------------------------------------------------------------------


@query(
    "sql_session_variables",
    """
WITH seg AS (
  SELECT c_mktsegment AS s FROM customer ORDER BY c_mktsegment LIMIT 1
)
SELECT o.o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
CROSS JOIN seg
WHERE c.c_mktsegment = seg.s AND o.o_totalprice > 150000.0
GROUP BY o.o_orderstatus
ORDER BY o.o_orderstatus
""",
)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session variables end-to-end: DECLARE a typed threshold with a
    DEFAULT, SET a second variable from a scalar subquery over the
    data (the lexicographically first segment — deterministic), then
    run the report referencing both variables. Values never enter the
    SQL text (no injection, plan cache keyed on variable refs), and
    the variables are session-scoped state — the SQL-native
    equivalent of the bind-parameter pattern in
    sql_parameterized_query. Catalyst folds variable references to
    literals at analysis time, so the price predicate still pushes
    down to the parquet scan (plan-pinned)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    spark.sql(
        "DECLARE OR REPLACE VARIABLE sg_price_floor DOUBLE DEFAULT 150000.0"
    )
    spark.sql("DECLARE OR REPLACE VARIABLE sg_segment STRING DEFAULT ''")
    spark.sql(
        "SET VAR sg_segment = "
        "(SELECT c_mktsegment FROM {c} ORDER BY c_mktsegment LIMIT 1)",
        c=c,
    )
    return spark.sql(
        """
        SELECT o.o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM {o} o
        JOIN {c} c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = sg_segment
          AND o.o_totalprice > sg_price_floor
        GROUP BY o.o_orderstatus
        ORDER BY o.o_orderstatus
        """,
        o=o,
        c=c,
    )


# ---------------------------------------------------------------------------
# SQL scripting (Spark 4.x: BEGIN..END, DECLARE, WHILE/IF): procedural
# control flow executed ON the engine — the stored-procedure migration
# surface. The loop here is driver-trivial (3 iterations); the data
# work inside stays one declarative aggregate per statement.
# ---------------------------------------------------------------------------


@query(
    "sql_scripting_block",
    """
WITH years AS (SELECT unnest([1995, 1996, 1997]) AS yr),
per_year AS (
  SELECT y.yr,
         CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM years y
  LEFT JOIN orders o ON EXTRACT(year FROM o.o_orderdate) = y.yr
  GROUP BY y.yr
)
SELECT yr, n_orders, revenue,
       CAST(SUM(n_orders) OVER (ORDER BY yr) AS BIGINT) AS cum_orders
FROM per_year
ORDER BY yr
""",
)
def sql_scripting_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting: a BEGIN..END block DECLAREs a loop counter and
    an ARRAY<STRUCT> accumulator variable, WHILE-loops over report
    years 1995-97 appending one aggregate row per iteration (each SET
    runs a scalar subquery whose data work is a single declarative,
    scan-pruned aggregate), and ends with the SELECT that becomes the
    script's result set — the shape of a migrated stored procedure:
    procedural orchestration around set-based statements, never
    row-at-a-time logic. The oracle is the set-based equivalent
    (years spine LEFT JOIN yearly rollup + running total)."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("sg_script_orders")
    return spark.sql(
        """
        BEGIN
          DECLARE yr INT DEFAULT 1995;
          DECLARE acc ARRAY<STRUCT<yr: INT, n_orders: BIGINT,
                                   revenue: DOUBLE>> DEFAULT ARRAY();
          WHILE yr <= 1997 DO
            SET acc = array_append(acc, (
              SELECT named_struct(
                       'yr', yr,
                       'n_orders', CAST(COUNT(o_orderkey) AS BIGINT),
                       'revenue', CAST(SUM(CAST(o_totalprice
                                              AS DECIMAL(18,2)))
                                       AS DOUBLE))
              FROM sg_script_orders
              WHERE EXTRACT(YEAR FROM o_orderdate) = yr));
            SET yr = yr + 1;
          END WHILE;
          SELECT s.yr, s.n_orders, s.revenue,
                 CAST(SUM(s.n_orders) OVER (ORDER BY s.yr) AS BIGINT)
                   AS cum_orders
          FROM (SELECT explode(acc) AS s) ORDER BY yr;
        END
        """
    )


# ---------------------------------------------------------------------------
# Temperature-scaled multilingual mixture (the mC4 / XLM-R sampling
# recipe): p_l ∝ (n_l/N)^alpha flattens the language distribution so
# low-resource languages are upsampled.
# ---------------------------------------------------------------------------


@query(
    "corpus_mixture_temperature",
    """
WITH c AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
),
t AS (
  SELECT SUM(n_docs) AS total,
         SUM(POWER(n_docs, 0.3)) AS z
  FROM c
)
SELECT c.lang, c.n_docs,
       ROUND(CAST(c.n_docs AS DOUBLE) / t.total, 6) AS p_raw,
       ROUND(POWER(c.n_docs, 0.3) / t.z, 6) AS p_temp,
       ROUND(POWER(c.n_docs, 0.3) / t.z * t.total / c.n_docs, 4)
         AS sample_factor
FROM c CROSS JOIN t
ORDER BY c.lang
""",
)
def corpus_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature sampling weights for a multilingual corpus
    (alpha = 0.3, the XLM-R / mC4 setting): per-language share is
    flattened by p_l ∝ (n_l)^alpha, and sample_factor is the per-doc
    up/downsampling rate that realizes the mixture at constant corpus
    size — >1 means the language is repeated (low-resource), <1 means
    it is subsampled. Companion to corpus_mixture_sample (fixed
    quotas) and corpus_repeat_upsample (applying repeat factors):
    this computes the POLICY from corpus statistics in one tiny
    aggregate over group counts — the fact scan aggregates once;
    everything else is arithmetic on ~5 rows."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    t = c.agg(
        F.sum("n_docs").alias("total"),
        F.sum(F.pow("n_docs", 0.3)).alias("z"),
    )
    w = F.pow("n_docs", 0.3)
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "lang",
            "n_docs",
            F.round(F.col("n_docs") * 1.0 / F.col("total"), 6).alias("p_raw"),
            F.round(w / F.col("z"), 6).alias("p_temp"),
            F.round(
                w / F.col("z") * F.col("total") / F.col("n_docs"), 4
            ).alias("sample_factor"),
        )
        .orderBy("lang")
    )
