"""Round-4l additions: one-way ANOVA and CUPED-adjusted A/B readout.

Registered AFTER round4k (plans.load_all imports this module last) so
the driver's unverified-first ordering keeps the earlier backlog in
the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# One-way ANOVA — does event value differ BY TYPE at all? The k-group
# generalization of the Welch t-test already registered
# (stat_ab_welch_ttest); classic equal-variance F decomposition.
# ---------------------------------------------------------------------------


@query(
    "stat_anova_oneway",
    """
WITH g AS (
  SELECT event_type, AVG(value) AS m, CAST(COUNT(*) AS BIGINT) AS n_g
  FROM events GROUP BY event_type
),
gm AS (
  SELECT SUM(m * n_g) / SUM(n_g) AS grand, CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM g
),
w AS (
  SELECT SUM((e.value - g.m) * (e.value - g.m)) AS ssw
  FROM events e JOIN g USING (event_type)
),
b AS (
  SELECT SUM(n_g * (m - grand) * (m - grand)) AS ssb
  FROM g CROSS JOIN gm
)
SELECT k, n,
       ROUND(ssb, 4) AS ss_between,
       ROUND(ssw, 4) AS ss_within,
       ROUND((ssb / (k - 1)) / (ssw / (n - k)), 6) AS f_stat,
       ROUND(ssb / (ssb + ssw), 6) AS eta_sq
FROM b CROSS JOIN w CROSS JOIN gm
""",
)
def stat_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of event value across event types: F statistic
    and effect size η². Two passes — group means (one partial-agg
    shuffle to 5 rows), then within-group squared deviations with the
    5-row mean map broadcast back into the fact scan. Computing SSW
    against the actual group means (not the raw-moment
    Σx² − n·m² shortcut) keeps the subtraction cancellation-free, the
    same discipline as ml_ols_normal_eq's centered moments."""
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    # 5-row mean map, materialized once — gm/ssw/ssb all reuse it
    # instead of re-scanning the fact per consumer
    g = (
        ev.groupBy("event_type")
        .agg(F.avg("value").alias("m"), F.count(F.lit(1)).cast("bigint").alias("n_g"))
        .localCheckpoint(eager=True)
    )
    gm = g.agg(
        (F.sum(F.col("m") * F.col("n_g")) / F.sum("n_g")).alias("grand"),
        F.sum("n_g").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    w = (
        ev.join(F.broadcast(g), "event_type")
        .agg(F.sum((F.col("value") - F.col("m")) * (F.col("value") - F.col("m"))).alias("ssw"))
    )
    b = g.crossJoin(F.broadcast(gm)).agg(
        F.sum(F.col("n_g") * (F.col("m") - F.col("grand")) * (F.col("m") - F.col("grand"))).alias("ssb"),
        F.any_value("k").alias("k"),
        F.any_value("n").alias("n"),
    )
    return b.crossJoin(F.broadcast(w)).select(
        "k",
        "n",
        F.round("ssb", 4).alias("ss_between"),
        F.round("ssw", 4).alias("ss_within"),
        F.round(
            (F.col("ssb") / (F.col("k") - 1)) / (F.col("ssw") / (F.col("n") - F.col("k"))), 6
        ).alias("f_stat"),
        F.round(F.col("ssb") / (F.col("ssb") + F.col("ssw")), 6).alias("eta_sq"),
    )


# ---------------------------------------------------------------------------
# CUPED — the variance-reduction standard for online experiments:
# adjust each user's experiment-period metric by their pre-period
# baseline (θ = cov/var), shrinking the readout's variance without
# biasing the treatment difference.
# ---------------------------------------------------------------------------


@query(
    "stat_ab_cuped",
    """
WITH bounds AS (
  SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid FROM events
),
u AS (
  SELECT user_id, user_id % 2 AS arm,
         SUM(CASE WHEN epoch_us(ts) <  mid THEN value ELSE 0 END) AS pre,
         SUM(CASE WHEN epoch_us(ts) >= mid THEN value ELSE 0 END) AS post
  FROM events CROSS JOIN bounds
  GROUP BY user_id
),
st AS (
  SELECT covar_samp(pre, post) / var_samp(pre) AS theta, AVG(pre) AS mean_pre
  FROM u
),
a AS (
  SELECT arm, user_id, post,
         post - theta * (pre - mean_pre) AS adj
  FROM u CROSS JOIN st
)
SELECT CAST(arm AS INT) AS arm,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(AVG(post), 4) AS mean_post,
       ROUND(AVG(adj), 4) AS mean_adj,
       ROUND(var_samp(adj) / var_samp(post), 4) AS var_ratio
FROM a GROUP BY arm
""",
)
def stat_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted A/B readout: users hashed into two arms, the
    event window split at its midpoint into pre/post periods, each
    user's post-period value sum adjusted by θ·(pre − mean_pre) with
    θ = cov(pre,post)/var(pre). Reports per-arm raw and adjusted
    means plus the achieved variance ratio (CUPED's whole point:
    var_ratio = 1 − ρ² < 1).

    Scale plan: one keyed aggregate builds the per-user frame (the
    midpoint scalar arrives by 1-row broadcast), θ/mean_pre are one
    more algebraic aggregate broadcast back, and the per-arm readout
    is a 2-group aggregate — three shuffles total, all partial-agg
    combinable, no window, no driver data."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "value", F.unix_micros("ts").alias("us")
    )
    bounds = ev.agg(
        ((F.min("us") + F.max("us")) / F.lit(2)).cast("bigint").alias("mid")
    )
    u = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("us") < F.col("mid"), F.col("value")).otherwise(0.0)).alias("pre"),
            F.sum(F.when(F.col("us") >= F.col("mid"), F.col("value")).otherwise(0.0)).alias("post"),
        )
        .withColumn("arm", F.col("user_id") % 2)
        # per-user frame feeds BOTH the θ aggregate and the arm
        # readout: materialize once (distributed checkpoint — at scale
        # this is the standard intermediate-table write) instead of
        # re-running the fact shuffle per consumer
        .localCheckpoint(eager=True)
    )
    st = u.agg(
        (F.covar_samp("pre", "post") / F.var_samp("pre")).alias("theta"),
        F.avg("pre").alias("mean_pre"),
    )
    a = u.crossJoin(F.broadcast(st)).withColumn(
        "adj", F.col("post") - F.col("theta") * (F.col("pre") - F.col("mean_pre"))
    )
    return a.groupBy(F.col("arm").cast("int").alias("arm")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.round(F.avg("post"), 4).alias("mean_post"),
        F.round(F.avg("adj"), 4).alias("mean_adj"),
        F.round(F.var_samp("adj") / F.var_samp("post"), 4).alias("var_ratio"),
    )
