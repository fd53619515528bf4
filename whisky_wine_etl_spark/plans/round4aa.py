"""Round-4aa: time-weighted averages, rolling per-key regression,
Wilson confidence intervals, and an exact weighted median by
two-pass distributed selection.

Registered AFTER round4z so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.functions.rounding import pinned
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Time-weighted average: each observation holds until the next one,
# so its weight is that duration — the correct mean for irregularly
# sampled series (plain AVG over-counts bursts). Durations are exact
# integer microseconds.
# ---------------------------------------------------------------------------


@query(
    "ts_time_weighted_avg",
    """
WITH seg AS (
  SELECT user_id, value,
         LEAD(epoch_us(ts)) OVER w - epoch_us(ts) AS dur_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       CAST(COUNT(dur_us) AS BIGINT) AS n_segments,
       CAST(SUM(dur_us) AS BIGINT) AS span_us,
       FLOOR(SUM(value * dur_us) / SUM(dur_us) * 1000000 + 0.5)
         / 1000000 AS twa_value,
       FLOOR(AVG(value) * 1000000 + 0.5) / 1000000 AS naive_avg
FROM seg WHERE dur_us IS NOT NULL
GROUP BY user_id ORDER BY user_id
""",
)
def ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted mean value next to the naive mean (the
    difference is the burst bias). One window keyed by user (ordered
    within partition), one groupBy — weights are integer µs, so both
    engines agree exactly before the rounded division."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    seg = ev.select(
        "user_id",
        "value",
        (F.lead(us).over(w) - us).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    return (
        seg.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
            F.sum("dur_us").cast("bigint").alias("span_us"),
            pinned(
                F.sum(F.col("value") * F.col("dur_us")) / F.sum("dur_us"), 6
            ).alias("twa_value"),
            pinned(F.avg("value"), 6).alias("naive_avg"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Rolling regression: the 7-day trailing activity slope per user AT
# EVERY DAY — windowed sufficient statistics over a RANGE frame, so
# the regression itself is a projection; no refit loop.
# ---------------------------------------------------------------------------


@query(
    "window_rolling_slope",
    """
WITH daily AS (
  SELECT user_id,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
         CAST(COUNT(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
),
roll AS (
  SELECT user_id, x,
         COUNT(*) OVER w AS n, SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
         SUM(x * x) OVER w AS sxx, SUM(x * y) OVER w AS sxy
  FROM daily
  WINDOW w AS (PARTITION BY user_id ORDER BY x
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT user_id, x AS day_no,
       CAST(n AS BIGINT) AS n_days,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope7
FROM roll WHERE n >= 3 AND (n * sxx - sx * sx) > 0
ORDER BY user_id, day_no
""",
)
def window_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day activity slope per user per day. The RANGE
    frame (calendar days, not row counts — gaps matter) accumulates
    the five OLS moments; all inputs are exact integers so the slope
    is engine-deterministic before rounding. Frames needing ≥3 days
    and non-degenerate x-variance emit; the rest are skipped, not
    NULL-filled."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("x"),
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    w = Window.partitionBy("user_id").orderBy("x").rangeBetween(-6, 0)
    roll = daily.select(
        "user_id",
        "x",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        roll.filter((F.col("n") >= 3) & (den > 0))
        .select(
            "user_id",
            F.col("x").alias("day_no"),
            F.col("n").cast("bigint").alias("n_days"),
            F.round(num / den, 6).alias("slope7"),
        )
        .orderBy("user_id", "day_no")
    )


# ---------------------------------------------------------------------------
# Wilson score interval per segment: the right binomial CI for small
# n / extreme p (never leaves [0,1], unlike Wald). Closed form from
# (n, k) — one partial-agg'd groupBy, the algebra is a projection.
# ---------------------------------------------------------------------------


@query(
    "stat_wilson_ci",
    """
WITH s AS (
  SELECT o_orderpriority AS segment,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS k
  FROM orders GROUP BY o_orderpriority
)
SELECT segment, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS successes,
       ROUND(k / n, 6) AS p_hat,
       ROUND((k / n + 1.96 * 1.96 / (2 * n)
              - 1.96 * SQRT((k / n) * (1 - k / n) / n + 1.96 * 1.96 / (4 * n * n)))
             / (1 + 1.96 * 1.96 / n), 6) AS wilson_lo,
       ROUND((k / n + 1.96 * 1.96 / (2 * n)
              + 1.96 * SQRT((k / n) * (1 - k / n) / n + 1.96 * 1.96 / (4 * n * n)))
             / (1 + 1.96 * 1.96 / n), 6) AS wilson_hi
FROM s ORDER BY segment
""",
)
def stat_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% Wilson score interval for the finished-order rate per
    priority segment. Counts are exact; every engine computes the
    same closed form on the same (n, k)."""
    o = _t(spark, sf_dir, "orders")
    s = o.groupBy(F.col("o_orderpriority").alias("segment")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1))
        .cast("double")
        .alias("k"),
    )
    p = F.col("k") / F.col("n")
    z2 = 1.96 * 1.96
    center = p + z2 / (2 * F.col("n"))
    margin = 1.96 * F.sqrt(
        p * (1 - p) / F.col("n") + z2 / (4 * F.col("n") * F.col("n"))
    )
    denom = 1 + z2 / F.col("n")
    return s.select(
        "segment",
        F.col("n").cast("bigint").alias("n"),
        F.col("k").cast("bigint").alias("successes"),
        F.round(p, 6).alias("p_hat"),
        F.round((center - margin) / denom, 6).alias("wilson_lo"),
        F.round((center + margin) / denom, 6).alias("wilson_hi"),
    ).orderBy("segment")


# ---------------------------------------------------------------------------
# Exact weighted median by two-pass distributed selection: a coarse
# histogram finds the bin holding the weighted midpoint, then only
# THAT bin's rows (a ~1/bins fraction) are ordered exactly. The
# global-sort-free form of weighted quantiles — the sort touches a
# provably small slice.
# ---------------------------------------------------------------------------


@query(
    "agg_weighted_median_2pass",
    """
WITH d AS (
  SELECT o.o_totalprice AS price, CAST(COUNT(*) AS BIGINT) AS w
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_totalprice
),
tot AS (SELECT SUM(w) AS tw FROM d),
c AS (
  SELECT price, w, SUM(w) OVER (ORDER BY price, w) AS cw, tot.tw
  FROM d, tot
)
SELECT CAST(MIN(tw) AS BIGINT) AS total_weight,
       MIN(CASE WHEN cw * 2 >= tw THEN price END) AS weighted_median
FROM c
""",
)
def agg_weighted_median_2pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median of order price, weight = item count.

    Pass 1: 1000-wide price-bin histogram of weights (partial-agg'd,
    ~600 bins) + cumulative over BINS locates the midpoint bin.
    Pass 2: exact cumulative ordering over only that bin's rows.
    The oracle does the naive full cumulative — equality proves the
    selection logic. At 100 TB pass 2 touches ~1/600th of the data;
    recursing once more would bound it further. The (price, w)
    midpoint tie rule is pinned by ordering on both columns."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    d = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        .select(F.col("o_totalprice").alias("price"), "w")
    )
    hist = (
        d.groupBy(F.floor(F.col("price") / 1000).cast("bigint").alias("bin"))
        .agg(F.sum("w").alias("bw"))
    )
    wbin = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "bin",
        (F.sum("bw").over(wbin) - F.col("bw")).alias("below"),
        F.sum("bw").over(wbin).alias("through"),
        F.sum("bw").over(wall).alias("tw"),
    )
    target_bin = cum.filter(
        (F.col("through") * 2 >= F.col("tw")) & (F.col("below") * 2 < F.col("tw"))
    ).select("bin", "below", "tw")
    # pass 2: exact cumulative inside the midpoint bin only
    in_bin = d.join(
        F.broadcast(target_bin),
        F.floor(F.col("price") / 1000).cast("bigint") == F.col("bin"),
    )
    word = Window.orderBy("price", "w").rowsBetween(Window.unboundedPreceding, 0)
    ranked = in_bin.select(
        "price",
        "tw",
        (F.col("below") + F.sum("w").over(word)).alias("cw"),
    )
    return ranked.filter(F.col("cw") * 2 >= F.col("tw")).agg(
        F.min("tw").cast("bigint").alias("total_weight"),
        F.min("price").alias("weighted_median"),
    )
