"""Round-4g additions: MAD outlier detection, integer-exact CUSUM rate
drift, exponential time-decay engagement scoring, and a k-anonymity
generalization ladder.

Registered AFTER round4f (plans.load_all imports this module last) so
the driver's unverified-first ordering keeps the earlier backlog in
the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.operators.keys import add_running_total
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# MAD outlier detection — the robust complement to events_anomaly_zscore:
# median/MAD are unmoved by the very outliers they are hunting, so the
# modified z-score stays calibrated on heavy-tailed value columns where
# mean/stddev would be dragged by the tail.
# ---------------------------------------------------------------------------


@query(
    "stat_mad_outliers",
    """
WITH med AS (
  SELECT event_type, median(value) AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS absdev
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, median(absdev) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(ANY_VALUE(d.med), 6) AS med,
       ROUND(ANY_VALUE(a.mad), 6) AS mad,
       CAST(SUM(CASE WHEN ABS(0.6745 * (d.value - d.med) / a.mad) > 3.5
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad a USING (event_type)
GROUP BY d.event_type
""",
)
def stat_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type modified z-score outlier counts: median absolute
    deviation, |0.6745·(x−med)/MAD| > 3.5 (Iglewicz–Hoaglin cutoff).

    Scale plan: two passes over the fact — exact `percentile` per
    group for the median, broadcast the 5-row map back, second
    `percentile` for the MAD, broadcast again, one final counting
    aggregate (algebraic, map-side combinable). Exact per-group
    percentile holds a group's values in executor memory, which is
    the oracle-matched twin; the 100 TB profile swaps both medians to
    `approx_percentile(col, 0.5, 10000)` (same plan shape, bounded
    sketch state — the accuracy/memory trade already demonstrated by
    agg_approx_percentile)."""
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "absdev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("absdev", F.lit(0.5)).alias("mad")
    )
    out = dev.join(F.broadcast(mad), "event_type")
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.any_value("med"), 6).alias("med"),
        F.round(F.any_value("mad"), 6).alias("mad"),
        F.sum(
            F.when(
                F.abs(0.6745 * (F.col("value") - F.col("med")) / F.col("mad")) > 3.5, 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_outliers"),
    )


# ---------------------------------------------------------------------------
# CUSUM rate drift — change-point signal on the event arrival rate:
# cumulative observed count vs the uniform-rate expectation. Kept
# integer-exact (numerators only) so the engine and oracle agree to
# the bit regardless of float summation order.
# ---------------------------------------------------------------------------


@query(
    "ts_cusum_rate_drift",
    """
WITH h AS (
  SELECT date_trunc('hour', ts) AS hour, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
c AS (
  SELECT hour, cnt,
         CAST(SUM(cnt) OVER (ORDER BY hour) AS BIGINT) AS cum_cnt,
         CAST(ROW_NUMBER() OVER (ORDER BY hour) AS BIGINT) AS t
  FROM h
),
tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS n_hours
  FROM h
)
SELECT epoch_us(hour) AS hour_us, cnt, cum_cnt,
       CAST(n_hours * cum_cnt - t * total AS BIGINT) AS cusum_num,
       (100 * ABS(n_hours * cum_cnt - t * total) > 2 * total * n_hours)
         AS drift_flag
FROM c CROSS JOIN tot
""",
)
def ts_cusum_rate_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift detector on hourly event counts: for each hour t,
    the deviation of the cumulative count from the uniform-rate
    expectation t·total/n_hours, flagged when it exceeds 2% of total.

    The r5 driver red row traced to the one non-integer output
    (`cusum_dev`, a bare 6-dp ROUND on DOUBLE) and the raw TIMESTAMP
    hour column, so the query is now ALL-INTEGER: the hour is emitted
    as epoch microseconds (BIGINT, the repo's unix_micros/epoch_us
    twin discipline) and the deviation as its exact BIGINT numerator
    n_hours·cum − t·total — no division, no float, nothing for the
    two hashers to disagree on. Scale plan: the hourly pre-aggregate
    is map-side combinable and collapses the fact to ≤ #hours rows;
    the running total uses the range-partition two-pass
    (operators/keys) instead of a single-task global window; totals
    arrive via a 1-row broadcast cross join."""
    h = (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    c = add_running_total(h, ["hour"], "cnt", out_col="cum_cnt")
    c = add_running_total(
        c.withColumn("__one", F.lit(1)), ["hour"], "__one", out_col="t"
    ).drop("__one")
    tot = h.agg(
        F.sum("cnt").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
    )
    num = F.col("n_hours") * F.col("cum_cnt") - F.col("t") * F.col("total")
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            F.unix_micros("hour").alias("hour_us"),
            "cnt",
            F.col("cum_cnt").cast("bigint").alias("cum_cnt"),
            num.cast("bigint").alias("cusum_num"),
            (100 * F.abs(num) > 2 * F.col("total") * F.col("n_hours")).alias(
                "drift_flag"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Exponential time-decay engagement score — the recency-weighted user
# activity metric every ranking/retention system keeps: recent events
# count fully, a 7-day-old event counts e^-1.
# ---------------------------------------------------------------------------


@query(
    "events_decay_score",
    """
WITH mx AS (SELECT MAX(epoch_us(ts)) AS t_max FROM events)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value * EXP(-(CAST(t_max - epoch_us(ts) AS DOUBLE)
                               / 604800000000.0))), 4) AS decay_score
FROM events CROSS JOIN mx
GROUP BY user_id
""",
)
def events_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponential time-decay engagement score with a 7-day
    half-life-style constant: Σ value·exp(−Δt/7d), Δt measured in
    exact integer microseconds from the corpus max timestamp.

    Scale plan: the max-timestamp scalar is a 1-row broadcast cross
    join (no collect), the weighted sum is a single algebraic
    aggregate — one shuffle keyed by user, map-side partials, no
    window. The Δt is integer-exact and converted to double by ONE
    correctly-rounded division before exp(), keeping engine/oracle
    drift to the final-sum rounding."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "value", F.unix_micros("ts").alias("us")
    )
    mx = ev.agg(F.max("us").alias("t_max"))
    return (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(
                F.sum(
                    F.col("value")
                    * F.exp(
                        -(
                            (F.col("t_max") - F.col("us")).cast("double")
                            / F.lit(604800000000.0)
                        )
                    )
                ),
                4,
            ).alias("decay_score"),
        )
    )


# ---------------------------------------------------------------------------
# k-anonymity generalization ladder — the privacy gate a training-data
# pipeline runs before releasing tabular slices: at each level of
# quasi-identifier generalization, how many equivalence classes are
# below k and how many rows they expose.
# ---------------------------------------------------------------------------


@query(
    "privacy_k_anonymity",
    """
WITH g AS (
  SELECT c_nationkey, c_mktsegment,
         GROUPING(c_nationkey, c_mktsegment) AS level,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM customer
  GROUP BY ROLLUP (c_nationkey, c_mktsegment)
)
SELECT CAST(level AS INT) AS level,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_small_groups,
       CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS rows_at_risk
FROM g
GROUP BY level
""",
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (k=5) over the (nation, market-segment)
    quasi-identifier with a ROLLUP generalization ladder: level 0 =
    full QI, level 1 = nation only, level 3 = fully generalized.
    Reports, per level, the equivalence-class count, classes below k,
    and rows those classes expose.

    Scale plan: one ROLLUP aggregate over the table (Spark expands
    grouping sets with partial aggregation per set — map-side
    combinable), then a second aggregate over the tiny per-class
    frame. All-integer outputs, no float parity surface."""
    cust = _t(spark, sf_dir, "customer")
    g = cust.rollup("c_nationkey", "c_mktsegment").agg(
        F.grouping_id().alias("level"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return (
        g.groupBy(F.col("level").cast("int").alias("level"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum(F.when(F.col("n") < 5, 1).otherwise(0))
            .cast("bigint")
            .alias("n_small_groups"),
            F.sum(F.when(F.col("n") < 5, F.col("n")).otherwise(0))
            .cast("bigint")
            .alias("rows_at_risk"),
        )
    )
