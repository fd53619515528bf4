"""Round-4at: binary-segmentation changepoint detection and ER
golden-record survivorship.

Registered AFTER round4as so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query
from whisky_wine_etl_spark.plans.round4as import _FS_B_SQL, _FS_THRESHOLD, _fs_score_sql

# ---------------------------------------------------------------------------
# Changepoint detection by binary segmentation (first split): the
# split that maximizes the between-segment variance reduction
# n_l*n_r/N * (mean_l - mean_r)^2 — the building block CUSUM/PELT
# pipelines apply recursively. One aggregation to day grain, prefix
# sums over the (bounded, ~day-count-sized) series, windowed argmax.
# ---------------------------------------------------------------------------


@query(
    "ts_changepoint_binseg",
    """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1
),
seq AS (
  SELECT d, c,
         CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS i,
         SUM(c) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS s
  FROM daily
),
tot AS (SELECT MAX(i) AS n, MAX(s) AS grand FROM seq),
scored AS (
  SELECT seq.d, seq.i,
         (CAST(seq.i * (tot.n - seq.i) AS DOUBLE) / tot.n)
           * POWER(CAST(seq.s AS DOUBLE) / seq.i
                   - CAST(tot.grand - seq.s AS DOUBLE) / (tot.n - seq.i), 2) AS score,
         CAST(seq.s AS DOUBLE) / seq.i AS mean_left,
         CAST(tot.grand - seq.s AS DOUBLE) / (tot.n - seq.i) AS mean_right
  FROM seq CROSS JOIN tot
  WHERE seq.i < tot.n
)
SELECT d AS split_date,
       ROUND(score, 6) AS score,
       ROUND(mean_left, 4) AS mean_left,
       ROUND(mean_right, 4) AS mean_right
FROM scored
ORDER BY score DESC, d
LIMIT 1
""",
)
def ts_changepoint_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-split binary segmentation over the daily order-count
    series: every candidate split point is scored with the
    between-segment variance reduction, computed from one running sum
    over the day-grain series (exact integers, so both engines derive
    identical doubles), and the argmax is a TakeOrdered with a (score
    desc, date) tie-break. Scale: the fact scan collapses to ≤ a few
    thousand daily rows before any window runs — the windows are over
    the SERIES, never the facts; recursive segmentation would re-run
    this operator per segment (PELT-style pruning noted as the
    production path for many changepoints)."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w = Window.orderBy("d")
    seq = daily.select(
        "d",
        "c",
        F.row_number().over(w).cast("bigint").alias("i"),
        F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("s"),
    )
    tot = seq.agg(F.max("i").alias("n"), F.max("s").alias("grand"))
    j = seq.crossJoin(F.broadcast(tot)).filter(F.col("i") < F.col("n"))
    # CAST AS DOUBLE (not "* 1.0") on BOTH engines: a bare decimal
    # literal is DECIMAL in DuckDB and its promotion/division scale
    # rules are version-dependent (r8 oracle-fragility audit).
    mean_l = F.col("s").cast("double") / F.col("i")
    mean_r = (F.col("grand") - F.col("s")).cast("double") / (F.col("n") - F.col("i"))
    score = (
        (F.col("i") * (F.col("n") - F.col("i"))).cast("double") / F.col("n")
    ) * F.pow(mean_l - mean_r, 2)
    return (
        j.select(
            F.col("d").alias("split_date"),
            F.round(score, 6).alias("score"),
            F.round(mean_l, 4).alias("mean_left"),
            F.round(mean_r, 4).alias("mean_right"),
        )
        .orderBy(F.desc("score"), "split_date")
        .limit(1)
    )


# ---------------------------------------------------------------------------
# Golden record: after blocking (er_*) and scoring (er_fellegi_sunter)
# comes survivorship — one merged record per linked pair with
# per-field rules. Completes the block → score → link → merge ER
# pipeline with every stage under an exact oracle.
# ---------------------------------------------------------------------------


@query(
    "er_golden_record",
    f"""
WITH b AS ({_FS_B_SQL}),
links AS (
  SELECT a.c_custkey AS k, a.c_name AS a_name, b.b_name,
         a.c_mktsegment AS a_seg, b.b_seg,
         a.c_acctbal AS a_bal, b.b_bal
  FROM customer a JOIN b ON a.c_nationkey = b.b_nat
  WHERE a.c_custkey = b.b_key
    AND {_fs_score_sql('a', 'b')} > {_FS_THRESHOLD}
)
SELECT k AS custkey,
       CASE WHEN length(b_name) > length(a_name) THEN b_name
            WHEN length(b_name) < length(a_name) THEN a_name
            WHEN b_name < a_name THEN b_name ELSE a_name END AS g_name,
       CASE WHEN b_seg = 'UNKNOWN' THEN a_seg
            WHEN a_seg = 'UNKNOWN' THEN b_seg
            WHEN b_seg < a_seg THEN b_seg ELSE a_seg END AS g_seg,
       ROUND(GREATEST(a_bal, b_bal), 2) AS g_bal
FROM links
""",
)
def er_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship merge over the true links the Fellegi-Sunter
    scorer confirms (same blocked join, same inlined weights): per
    field, a deterministic rule picks the surviving value — longest
    name (lexicographic tie-break), any non-'UNKNOWN' segment,
    greatest balance — producing ONE golden record per entity, the
    output a downstream warehouse actually loads. Each rule is a pure
    expression; the merge adds no shuffle beyond the blocked join
    that produced the links."""
    c = load_table(spark, sf_dir, "customer")
    a = c.alias("a")
    b = spark.sql(
        f"SELECT * FROM ({_FS_B_SQL.replace('customer', '{c}')})", c=c
    ).alias("b")
    score = F.expr(_fs_score_sql("a", "b"))
    links = (
        a.join(b, F.col("a.c_nationkey") == F.col("b.b_nat"))
        .filter(
            (F.col("a.c_custkey") == F.col("b.b_key")) & (score > _FS_THRESHOLD)
        )
        .select(
            F.col("a.c_custkey").alias("k"),
            F.col("a.c_name").alias("a_name"),
            "b.b_name",
            F.col("a.c_mktsegment").alias("a_seg"),
            "b.b_seg",
            F.col("a.c_acctbal").alias("a_bal"),
            "b.b_bal",
        )
    )
    ln_a, ln_b = F.length("a_name"), F.length("b_name")
    return links.select(
        F.col("k").alias("custkey"),
        F.when(ln_b > ln_a, F.col("b_name"))
        .when(ln_b < ln_a, F.col("a_name"))
        .otherwise(F.least("a_name", "b_name"))
        .alias("g_name"),
        F.when(F.col("b_seg") == "UNKNOWN", F.col("a_seg"))
        .when(F.col("a_seg") == "UNKNOWN", F.col("b_seg"))
        .otherwise(F.least("a_seg", "b_seg"))
        .alias("g_seg"),
        F.round(F.greatest("a_bal", "b_bal"), 2).alias("g_bal"),
    )
