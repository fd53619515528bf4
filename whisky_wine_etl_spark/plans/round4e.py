"""Round-4e additions: Kolmogorov-Smirnov cohort drift, cumulative
unique users, and Pareto decile concentration.

Registered AFTER round4d (plans.load_all imports this module last) so
the driver's unverified-first ordering keeps the earlier backlog in
the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.operators.keys import add_running_total, add_surrogate_key
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Kolmogorov-Smirnov two-sample test — the distribution-level drift
# check (max ECDF gap) next to stat_psi_value_drift's binned one:
# PSI tells you "how much", KS tells you "is the whole shape off".
# ---------------------------------------------------------------------------


@query(
    "stat_ks_cohort_drift",
    """
WITH s AS (
  SELECT value AS v, CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS g
  FROM events
),
d AS (
  SELECT v, SUM(g) AS c1, SUM(1 - g) AS c2 FROM s GROUP BY v
),
c AS (
  SELECT SUM(c1) OVER (ORDER BY v) AS cum1,
         SUM(c2) OVER (ORDER BY v) AS cum2
  FROM d
),
t AS (
  SELECT CAST(SUM(g) AS BIGINT) AS n1,
         CAST(SUM(1 - g) AS BIGINT) AS n2
  FROM s
)
SELECT n1, n2,
       ROUND(MAX(ABS(cum1 / CAST(n1 AS DOUBLE) - cum2 / CAST(n2 AS DOUBLE))), 6)
         AS d_stat,
       ROUND(MAX(ABS(cum1 / CAST(n1 AS DOUBLE) - cum2 / CAST(n2 AS DOUBLE)))
             * sqrt(n1 * n2 / (n1 + CAST(n2 AS DOUBLE))), 4) AS ks_scaled
FROM c, t
GROUP BY n1, n2
""",
)
def stat_ks_cohort_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS statistic between even- and odd-user event
    values: D = max over observed values of |ECDF₁ − ECDF₂|, plus the
    sample-size-scaled form sqrt(n1·n2/(n1+n2))·D.

    Scale plan: the oracle's ECDF is a global cumulative window (fine
    as ground truth, single-task at scale). The engine aggregates to
    the distinct-value frame first (one partial-agg shuffle), then
    computes BOTH cumulative counts with ONE two-pass range-partition
    running total (operators/keys.add_running_total over a packed
    c1·2³¹ + c2 column, so one prefix sum carries two ECDFs), and
    takes a scalar max. The fact table is never globally sorted.
    Packing contract: each cohort must stay under 2³¹ rows (the low
    field is the FULL cumulative c2); past that, drop the packing and
    run add_running_total once per cohort — two shuffles instead of
    one, same asymptotics."""
    ev = _t(spark, sf_dir, "events")
    s = ev.select(
        F.col("value").alias("v"),
        F.when(F.col("user_id") % 2 == 0, 1).otherwise(0).alias("g"),
    )
    d = s.groupBy("v").agg(
        F.sum("g").alias("c1"), F.sum(F.lit(1) - F.col("g")).alias("c2")
    )
    # pack both counters into one long so a single running total
    # yields both cumulative ECDF numerators: c2 per distinct value
    # is < 2^31 by construction (it's a count of rows sharing one
    # double value in one cohort)
    packed = d.withColumn("__cc", F.col("c1") * F.lit(1 << 31) + F.col("c2"))
    cum = add_running_total(packed, ["v"], "__cc", out_col="__cum")
    cum = cum.select(
        F.shiftright("__cum", 31).alias("cum1"),
        F.col("__cum").bitwiseAND(F.lit((1 << 31) - 1)).alias("cum2"),
    )
    tot = d.agg(
        F.sum("c1").cast("bigint").alias("n1"), F.sum("c2").cast("bigint").alias("n2")
    )
    gap = F.abs(
        F.col("cum1") / F.col("n1") - F.col("cum2") / F.col("n2").cast("double")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(
            F.round(F.max(gap), 6).alias("d_stat"),
            F.round(
                F.max(gap)
                * F.sqrt(
                    F.col("n1") * F.col("n2") / (F.col("n1") + F.col("n2").cast("double"))
                ),
                4,
            ).alias("ks_scaled"),
        )
    )


# ---------------------------------------------------------------------------
# Cumulative unique users — the growth-dashboard staple: per day,
# how many users were seen for the FIRST time, and how many distinct
# users have been seen to date.
# ---------------------------------------------------------------------------


@query(
    "events_cumulative_uniques",
    """
WITH first_day AS (
  SELECT user_id, CAST(MIN(date_trunc('day', ts)) AS DATE) AS day
  FROM events GROUP BY user_id
),
daily AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS n_new_users
  FROM first_day GROUP BY day
)
SELECT day, n_new_users,
       CAST(SUM(n_new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
FROM daily
""",
)
def events_cumulative_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-user counts and the running total of distinct users
    ever seen.

    Scale plan: "cumulative distinct" does NOT need distinct-over-
    growing-prefix — a user contributes exactly once, on their first
    day, so min(day) per user (one partial-agg shuffle) turns the
    problem into a plain running SUM over the |days| aggregate. The
    final window's input is calendar-bounded (rows = days), so the
    single-task window is over a frame that CANNOT grow with data
    volume — that bound, not the data size, is the scale contract."""
    ev = _t(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).cast("date").alias("day")
    )
    daily = first_day.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        "n_new_users",
        F.sum("n_new_users").over(w).cast("bigint").alias("cum_users"),
    )


# ---------------------------------------------------------------------------
# Pareto decile concentration — "what share of all events do the top
# 10% most active users generate": per-user volume ranked into exact
# deciles, share and cumulative share per decile.
# ---------------------------------------------------------------------------


@query(
    "events_pareto_share",
    """
WITH pu AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
),
rk AS (
  SELECT n_events,
         row_number() OVER (ORDER BY n_events DESC, user_id) AS i,
         (SELECT COUNT(*) FROM pu) AS n_users,
         (SELECT SUM(n_events) FROM pu) AS total
  FROM pu
),
dec AS (
  SELECT CAST(CEIL(CAST(i AS DOUBLE) * 10 / n_users) AS INT) AS decile,
         n_events, total
  FROM rk
)
SELECT decile,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       ROUND(SUM(n_events) / CAST(MAX(total) AS DOUBLE), 6) AS share
FROM dec GROUP BY decile
""",
)
def events_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact activity deciles (1 = most active tenth of users, ties
    broken by user_id) with each decile's share of total events.

    Scale plan: per-user counts are one partial-agg shuffle; the
    global activity rank uses add_surrogate_key's two-pass range
    partitioning (descending via negated count — no single-task
    row_number). Decile assignment is pure arithmetic on the rank,
    so no ntile window exists anywhere; the final rollup is a 10-row
    aggregate."""
    ev = _t(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    # rank descending by activity: negate the count so the ascending
    # range-partition order of add_surrogate_key yields rank 1 = max
    ranked = add_surrogate_key(
        pu.withColumn("__neg", -F.col("n_events")), ["__neg", "user_id"], key_col="i"
    ).drop("__neg")
    tot = pu.agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("n_events").alias("total")
    )
    dec = ranked.crossJoin(F.broadcast(tot)).withColumn(
        "decile", F.ceil(F.col("i") * 10.0 / F.col("n_users")).cast("int")
    )
    return dec.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.round(F.sum("n_events") / F.max("total").cast("double"), 6).alias("share"),
    )
