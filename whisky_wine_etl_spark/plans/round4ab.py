"""Round-4ab: chi-square cell residuals, operational key-skew
diagnostics, and a retention-decay log-linear fit.

Registered AFTER round4aa so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Standardized residuals per contingency cell — the drill-down that
# tells you WHICH cells drive a significant chi-square (the global
# statistic is stat_chi2_independence). Marginals are windows over
# the CELL frame (|priorities| × |statuses| rows), never the data.
# ---------------------------------------------------------------------------


@query(
    "stat_chi2_residuals",
    """
WITH cells AS (
  SELECT o_orderpriority AS prio, o_orderstatus AS status,
         CAST(COUNT(*) AS DOUBLE) AS o
  FROM orders GROUP BY 1, 2
),
m AS (
  SELECT prio, status, o,
         SUM(o) OVER (PARTITION BY prio) AS row_tot,
         SUM(o) OVER (PARTITION BY status) AS col_tot,
         SUM(o) OVER () AS n
  FROM cells
)
SELECT prio, status, CAST(o AS BIGINT) AS observed,
       ROUND(row_tot * col_tot / n, 6) AS expected,
       ROUND((o - row_tot * col_tot / n) / SQRT(row_tot * col_tot / n), 6)
         AS std_residual
FROM m ORDER BY prio, status
""",
)
def stat_chi2_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell standardized residuals (o−e)/√e for priority×status.
    One partial-agg'd groupBy to the cell frame; three marginal
    windows over ≤15 rows. Counts are exact — engines agree before
    the rounded division."""
    o = _t(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderstatus").alias("status"),
    ).agg(F.count(F.lit(1)).cast("double").alias("o"))
    m = cells.select(
        "prio",
        "status",
        "o",
        F.sum("o").over(Window.partitionBy("prio")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("status")).alias("col_tot"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    e = F.col("row_tot") * F.col("col_tot") / F.col("n")
    return m.select(
        "prio",
        "status",
        F.col("o").cast("bigint").alias("observed"),
        F.round(e, 6).alias("expected"),
        F.round((F.col("o") - e) / F.sqrt(e), 6).alias("std_residual"),
    ).orderBy("prio", "status")


# ---------------------------------------------------------------------------
# Key-skew profile: the operational question before every join/agg —
# how hot is the hottest key? Percentiles of per-key row counts, the
# exact Gini of the count distribution (computed from the
# count-of-counts frame in pure integers), and the top key's share.
# ---------------------------------------------------------------------------


@query(
    "diag_key_skew_profile",
    """
WITH k AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS c FROM orders GROUP BY o_custkey
),
cc AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS f FROM k GROUP BY c),
g AS (
  SELECT c, f,
         SUM(f) OVER (ORDER BY c) - f AS below,
         SUM(f) OVER () AS n, SUM(c * f) OVER () AS tot
  FROM cc
)
SELECT CAST(MIN(n) AS BIGINT) AS n_keys,
       CAST(MIN(tot) AS BIGINT) AS n_rows,
       CAST(MIN(CASE WHEN 2 * (below + f) >= n THEN c END) AS BIGINT) AS p50,
       CAST(MIN(CASE WHEN 100 * (below + f) >= 99 * n THEN c END) AS BIGINT) AS p99,
       CAST(MAX(c) AS BIGINT) AS max_rows,
       CAST(SUM(f * c * (2 * below + f + 1)) AS BIGINT) AS two_rank_sum
FROM g
""",
)
def diag_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew report for orders-per-customer: count percentiles, the exact
    Gini numerator, hottest-key count. ALL-INTEGER OUTPUT by design
    (r8 fix for the r7 driver red): no division, no ROUND, no decimal
    literal, no version-dependent quantile builtin on either engine.
    gini = two_rank_sum/(n_keys*n_rows) - (n_keys+1)/n_keys and
    top_key_share = max_rows/n_rows are one consumer-side division away.

    Everything runs on the count-of-counts frame (distinct count
    values — tiny however large the table): the Gini numerator via the
    consecutive-rank identity 2Σrᵢxᵢ = Σ f·c·(2·below+f+1), and the
    discrete percentiles via pure-integer rank comparisons
    (cum ≥ ceil(p·n) ⇔ q·cum ≥ p_num·n), which equal
    percentile_disc(p) by definition. This is the profile that decides
    between a plain shuffle, salting, or AQE skew handling BEFORE
    running the real job."""
    o = _t(spark, sf_dir, "orders")
    k = o.groupBy("o_custkey").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    cc = k.groupBy("c").agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    worder = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    g = cc.select(
        "c",
        "f",
        (F.sum("f").over(worder) - F.col("f")).alias("below"),
        F.sum("f").over(wall).alias("n"),
        F.sum(F.col("c") * F.col("f")).over(wall).alias("tot"),
    )
    cum = F.col("below") + F.col("f")
    return g.agg(
        F.min("n").cast("bigint").alias("n_keys"),
        F.min("tot").cast("bigint").alias("n_rows"),
        F.min(F.when(2 * cum >= F.col("n"), F.col("c")))
        .cast("bigint")
        .alias("p50"),
        F.min(F.when(100 * cum >= 99 * F.col("n"), F.col("c")))
        .cast("bigint")
        .alias("p99"),
        F.max("c").cast("bigint").alias("max_rows"),
        F.sum(F.col("f") * F.col("c") * (2 * F.col("below") + F.col("f") + 1))
        .cast("bigint")
        .alias("two_rank_sum"),
    )


# ---------------------------------------------------------------------------
# Retention decay: pooled day-k retention rates across signup
# cohorts, then a closed-form log-linear fit ln(rate) = a + b·k —
# the one-number "how fast do users fall away" summary. The fit runs
# over ≤7 aggregate points; the half-life is -ln(2)/b.
# ---------------------------------------------------------------------------


@query(
    "events_retention_decay_fit",
    """
WITH first_day AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
),
cohort_n AS (SELECT d0, CAST(COUNT(*) AS BIGINT) AS n0 FROM first_day GROUP BY d0),
activity AS (
  SELECT DISTINCT e.user_id, CAST(e.ts AS DATE) - f.d0 AS k
  FROM events e JOIN first_day f ON f.user_id = e.user_id
),
ret AS (
  SELECT a.k, CAST(COUNT(*) AS BIGINT) AS returned
  FROM activity a WHERE a.k BETWEEN 1 AND 7
  GROUP BY a.k
),
pooled AS (SELECT CAST(SUM(n0) AS BIGINT) AS pool FROM cohort_n),
pts AS (
  SELECT CAST(ret.k AS DOUBLE) AS x, LN(CAST(ret.returned AS DOUBLE) / pooled.pool) AS y,
         ret.k AS k, ret.returned, pooled.pool
  FROM ret, pooled
),
fit AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM pts
)
SELECT CAST(n AS BIGINT) AS n_points,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS decay_slope,
       ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
         AS log_intercept,
       ROUND(-LN(2) / ((n * sxy - sx * sy) / (n * sxx - sx * sx)), 6)
         AS half_life_days
FROM fit
""",
)
def events_retention_decay_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential retention decay: pooled day-1..7 return rates →
    ln-rate OLS. Heavy work is two groupBys (first-seen, distinct
    activity offsets); the regression sees ≤7 rows. Returns slope,
    intercept, and implied half-life. Pooling cohorts keeps the rate
    denominators large so the log never sees zero; a day with no
    returners at all would drop from the fit rather than emit -inf."""
    ev = _t(spark, sf_dir, "events")
    d = ev.select("user_id", F.col("ts").cast("date").alias("d"))
    first_day = d.groupBy("user_id").agg(F.min("d").alias("d0"))
    pool = first_day.agg(F.count(F.lit(1)).cast("bigint").alias("pool"))
    activity = (
        d.join(first_day, "user_id")
        .select("user_id", F.datediff("d", "d0").alias("k"))
        .filter((F.col("k") >= 1) & (F.col("k") <= 7))
        .distinct()
    )
    ret = activity.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("returned")
    )
    pts = ret.crossJoin(F.broadcast(pool)).select(
        F.col("k").cast("double").alias("x"),
        F.log(F.col("returned") / F.col("pool")).alias("y"),
    )
    fit = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    b = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return fit.select(
        F.col("n").cast("bigint").alias("n_points"),
        F.round(b, 6).alias("decay_slope"),
        F.round((F.col("sy") - b * F.col("sx")) / F.col("n"), 6).alias(
            "log_intercept"
        ),
        F.round(-F.log(F.lit(2.0)) / b, 6).alias("half_life_days"),
    )
