"""Round-4d additions: time-series resampling/diagnostics (OHLC bars,
autocorrelation, seasonal-naive backtest), distribution statistics
(Mann-Whitney U, Gini concentration, mutual information), blocked
fuzzy entity resolution, rolling distinct counts, and
geometric/harmonic means.

Registered AFTER round4c (plans.load_all imports this module last) so
the driver's unverified-first ordering keeps the earlier backlog in
the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.operators.keys import add_surrogate_key
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# OHLC resampling — the canonical downsample for any metered series
# (first/last/extreme value per bucket). One pass, fully
# partial-aggregatable: open/close are min_by/max_by over the
# (ts, event_id) total order, so no window sort ever happens.
# ---------------------------------------------------------------------------


@query(
    "ts_resample_ohlc",
    """
WITH e AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket, ts, event_id, value,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type, bucket,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       CAST(COUNT(*) AS BIGINT) AS volume,
       ROUND(SUM(value), 4) AS total_value
FROM e GROUP BY event_type, bucket
""",
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type: open/close = first/last value
    by the (ts, event_id) total order, high/low = extremes, volume =
    row count.

    Scale plan: min_by/max_by over a struct ordering key makes the
    whole bar ONE partial-aggregatable groupBy — map-side combine
    shrinks each input partition to |types × hours| rows before the
    shuffle, and no per-bucket window sort exists anywhere (the
    oracle's row_number formulation is the ground-truth spelling,
    not the plan). (ts, event_id) is a total order, so first/last
    are deterministic even with duplicate timestamps."""
    ev = _t(spark, sf_dir, "events")
    ord_key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.select(
            "event_type",
            F.date_trunc("hour", "ts").alias("bucket"),
            ord_key.alias("__k"),
            "value",
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.min_by("value", F.col("__k")).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", F.col("__k")).alias("close"),
            F.count(F.lit(1)).alias("volume"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U — the nonparametric two-sample test (no normality
# assumption, unlike stat_ab_welch_ttest's t): are click values
# stochastically larger than purchase values?
# ---------------------------------------------------------------------------


@query(
    "stat_mann_whitney_u",
    """
WITH s AS (
  SELECT value, CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g
  FROM events WHERE event_type IN ('click', 'purchase')
),
r AS (
  SELECT value, g,
         rank() OVER (ORDER BY value) AS mr,
         COUNT(*) OVER (PARTITION BY value) AS t
  FROM s
),
agg AS (
  SELECT CAST(SUM(g) AS BIGINT) AS n1,
         CAST(SUM(1 - g) AS BIGINT) AS n2,
         SUM(CASE WHEN g = 1 THEN mr + (CAST(t AS DOUBLE) - 1) / 2 END) AS r1
  FROM r
),
ties AS (
  SELECT SUM(CAST(t AS DOUBLE) * t * t - t) AS tie3
  FROM (SELECT value, COUNT(*) AS t FROM s GROUP BY value)
)
SELECT n1, n2,
       ROUND(r1 - CAST(n1 * (n1 + 1) AS DOUBLE) / 2, 4) AS u1,
       ROUND((r1 - CAST(n1 * (n1 + 1) AS DOUBLE) / 2
              - CAST(n1 * n2 AS DOUBLE) / 2)
             / sqrt(CAST(n1 * n2 AS DOUBLE) / 12
                    * ((n1 + n2 + 1)
                       - tie3 / (CAST(n1 + n2 AS DOUBLE)
                                 * (n1 + n2 - 1)))), 4) AS z
FROM agg, ties
""",
)
def stat_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (tie-corrected normal approximation) comparing
    click vs purchase event values.

    Scale plan: the naive spelling ranks every row through one
    global window (the oracle does exactly that — fine for ground
    truth, single-task at scale). The engine instead aggregates to
    the DISTINCT-VALUE frame first (|distinct values| rows with
    per-group counts), computes cumulative counts with the two-pass
    range-partition prefix-sum pattern (operators/keys.py: range
    shuffle, per-partition partials, O(partitions) driver offsets),
    and reconstructs the rank-sum as sum(c1 · avg_rank). All
    per-row work is partial-aggregatable; nothing global ever sorts
    the fact table."""
    ev = _t(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "value", F.when(F.col("event_type") == "click", 1).otherwise(0).alias("g")
    )
    # distinct-value frame: one partial-agg shuffle down to |values|
    vals = s.groupBy("value").agg(
        F.sum("g").alias("c1"), F.sum(F.lit(1) - F.col("g")).alias("c2")
    )
    # global cumulative count BEFORE each value: range-partition by
    # value, per-partition running sums, driver prefix of partition
    # totals (O(partitions) rows collected)
    n_parts = spark.sparkContext.defaultParallelism
    ranged = (
        vals.withColumn("t", F.col("c1") + F.col("c2"))
        .repartitionByRange(n_parts, "value")
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    part_tot = ranged.groupBy("__pid").agg(F.sum("t").alias("pt")).orderBy("__pid").collect()
    offsets, acc = [], 0
    for r in part_tot:
        offsets.append((r["__pid"], acc))
        acc += r["pt"]
    off = spark.createDataFrame(offsets, "__pid int, __off long")
    w = Window.partitionBy("__pid").orderBy("value")
    cum = (
        ranged.join(F.broadcast(off), "__pid")
        .withColumn(
            "cum_before",
            F.col("__off")
            + F.coalesce(F.sum("t").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)),
        )
        # min-rank of value v = cum_before + 1; average rank over its
        # tie run = min_rank + (t-1)/2
        .withColumn("avg_rank", F.col("cum_before") + 1 + (F.col("t") - 1) / 2.0)
    )
    agg = cum.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
        F.sum(F.col("c1") * F.col("avg_rank")).alias("r1"),
        F.sum(F.col("t").cast("double") * F.col("t") * F.col("t") - F.col("t")).alias("tie3"),
    )
    n1, n2, r1, tie3 = F.col("n1"), F.col("n2"), F.col("r1"), F.col("tie3")
    u1 = r1 - n1 * (n1 + 1) / 2.0
    n = n1 + n2
    sigma = F.sqrt(n1 * n2 / 12.0 * ((n + 1) - tie3 / (n * (n - F.lit(1.0)))))
    return agg.select(
        "n1",
        "n2",
        F.round(u1, 4).alias("u1"),
        # try_divide: an all-tied sample has zero rank variance — the
        # statistic is undefined, NULL is the honest answer (ANSI mode
        # would otherwise abort the job)
        F.round(F.try_divide(u1 - n1 * n2 / 2.0, sigma), 4).alias("z"),
    )


# ---------------------------------------------------------------------------
# Gini coefficient — revenue concentration across customers, the
# inequality summary behind "top 1% of accounts" dashboards.
# ---------------------------------------------------------------------------


@query(
    "stat_gini_revenue",
    """
WITH rev AS (
  SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS rev
  FROM orders GROUP BY o_custkey
),
rk AS (
  SELECT rev, row_number() OVER (ORDER BY rev, o_custkey) AS i FROM rev
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(SUM(rev), 2) AS total_revenue,
       ROUND(2.0 * SUM(i * rev) / (COUNT(*) * SUM(rev))
             - (CAST(COUNT(*) AS DOUBLE) + 1.0) / COUNT(*), 6) AS gini
FROM rk
""",
)
def stat_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer order revenue via the exact
    rank formula G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n over ascending
    (rev, custkey).

    Scale plan: revenue per customer is one partial-agg shuffle; the
    global ascending rank does NOT use a single-task
    row_number-over-everything — operators/keys.add_surrogate_key
    range-partitions by (rev, custkey) and numbers each partition in
    parallel against O(partitions) driver-prefix offsets. Revenue is
    rounded to 2 dp BEFORE ranking on both sides so a 1-ulp sum
    difference cannot reorder two near-tied customers."""
    orders = _t(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    ranked = add_surrogate_key(rev, ["rev", "o_custkey"], key_col="i")
    nc = F.count(F.lit(1))
    return ranked.agg(
        nc.cast("bigint").alias("n_customers"),
        F.round(F.sum("rev"), 2).alias("total_revenue"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("rev")) / (nc * F.sum("rev"))
            - (nc + F.lit(1.0)) / nc,
            6,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Mutual information — how much does order status tell you about
# priority? The feature-selection statistic (entropy-based, unlike
# stat_chi2_independence's frequency test).
# ---------------------------------------------------------------------------


@query(
    "stat_mutual_information",
    """
WITH j AS (
  SELECT o_orderstatus AS a, o_orderpriority AS b, CAST(COUNT(*) AS DOUBLE) AS nij
  FROM orders GROUP BY 1, 2
),
tot AS (SELECT SUM(nij) AS n FROM j),
ma AS (SELECT a, SUM(nij) AS na FROM j GROUP BY a),
mb AS (SELECT b, SUM(nij) AS nb FROM j GROUP BY b)
SELECT CAST(n AS BIGINT) AS n_orders,
       ROUND(SUM((nij / n) * ln(nij * n / (na * nb))), 6) AS mi_nats,
       ROUND(SUM((nij / n) * ln(nij * n / (na * nb)))
             / sqrt((SELECT -SUM((na / n) * ln(na / n)) FROM ma, tot)
                    * (SELECT -SUM((nb / n) * ln(nb / n)) FROM mb, tot)), 6)
         AS nmi
FROM j JOIN ma USING (a) JOIN mb USING (b), tot
GROUP BY n
""",
)
def stat_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) between order status and priority,
    plus the sqrt-entropy-normalized NMI.

    Scale plan: the only fact-table work is ONE partial-aggregated
    groupBy down to the |status|×|priority| contingency table (≤ 15
    rows here; bounded by category cardinalities, never row count).
    Marginals, entropies, and the MI sum are all computed on that
    broadcast-sized frame — re-derived from the joint counts, so no
    second scan of orders."""
    orders = _t(spark, sf_dir, "orders")
    j = (
        orders.groupBy(
            F.col("o_orderstatus").alias("a"), F.col("o_orderpriority").alias("b")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("nij"))
    )
    j = j.localCheckpoint(eager=True)  # tiny; reused four times below
    tot = j.agg(F.sum("nij").alias("n"))
    ma = j.groupBy("a").agg(F.sum("nij").alias("na"))
    mb = j.groupBy("b").agg(F.sum("nij").alias("nb"))
    ha = ma.crossJoin(F.broadcast(tot)).agg(
        (-F.sum((F.col("na") / F.col("n")) * F.log(F.col("na") / F.col("n")))).alias("ha")
    )
    hb = mb.crossJoin(F.broadcast(tot)).agg(
        (-F.sum((F.col("nb") / F.col("n")) * F.log(F.col("nb") / F.col("n")))).alias("hb")
    )
    mi = (
        j.join(F.broadcast(ma), "a")
        .join(F.broadcast(mb), "b")
        .crossJoin(F.broadcast(tot))
        .groupBy("n")
        .agg(
            F.sum(
                (F.col("nij") / F.col("n"))
                * F.log(F.col("nij") * F.col("n") / (F.col("na") * F.col("nb")))
            ).alias("mi")
        )
    )
    return (
        mi.crossJoin(F.broadcast(ha))
        .crossJoin(F.broadcast(hb))
        .select(
            F.col("n").cast("bigint").alias("n_orders"),
            F.round("mi", 6).alias("mi_nats"),
            F.round(F.col("mi") / F.sqrt(F.col("ha") * F.col("hb")), 6).alias("nmi"),
        )
    )


# ---------------------------------------------------------------------------
# Autocorrelation — lag-1 and lag-24 ACF of the hourly value series
# per event type: the seasonality diagnostic you run before choosing
# a forecasting model.
# ---------------------------------------------------------------------------


@query(
    "ts_autocorr_hourly",
    """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         ROUND(SUM(value), 6) AS v
  FROM events GROUP BY 1, 2
),
l1 AS (
  SELECT h.event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs_1,
         ROUND(corr(h.v, p.v), 4) AS acf_1
  FROM h JOIN h p ON p.event_type = h.event_type
                 AND p.bucket = h.bucket - INTERVAL 1 HOUR
  GROUP BY h.event_type
),
l24 AS (
  SELECT h.event_type, ROUND(corr(h.v, p.v), 4) AS acf_24
  FROM h JOIN h p ON p.event_type = h.event_type
                 AND p.bucket = h.bucket - INTERVAL 24 HOUR
  GROUP BY h.event_type
)
SELECT event_type, n_pairs_1, acf_1, acf_24
FROM l1 LEFT JOIN l24 USING (event_type)
""",
)
def ts_autocorr_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 and lag-24 autocorrelation of each event type's hourly
    value total, computed over TIME-shifted pairs (self-join on
    bucket − lag), not row-shifted ones — a missing hour must break
    the pair, not silently pair across the gap like lag(k) would.

    Scale plan: the fact table collapses to |types × hours| rows in
    one partial-agg pass; both lag joins are equi-joins on
    (event_type, bucket) over that aggregate, co-partitioned by the
    same keys, and corr is partial-aggregatable. Hourly sums are
    rounded to 6 dp before correlating so both engines correlate
    identical inputs."""
    ev = _t(spark, sf_dir, "events")
    h = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(F.round(F.sum("value"), 6).alias("v"))
        .localCheckpoint(eager=True)  # small; scanned by both lag joins
    )

    def lagged(lag_hours: int, out: str) -> DataFrame:
        shifted = h.select(
            "event_type",
            (F.col("bucket") + F.expr(f"INTERVAL {lag_hours} HOURS")).alias("bucket"),
            F.col("v").alias("__vl"),
        )
        return (
            h.join(shifted, ["event_type", "bucket"])
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias(f"n_pairs_{lag_hours}"),
                F.round(F.corr("v", "__vl"), 4).alias(out),
            )
        )

    # left join: a series shorter than 24 h has a defined acf_1 but
    # no lag-24 pairs — keep the row, NULL the seasonal column
    return (
        lagged(1, "acf_1")
        .join(lagged(24, "acf_24").drop("n_pairs_24"), "event_type", "left")
        .select("event_type", F.col("n_pairs_1"), "acf_1", "acf_24")
    )


# ---------------------------------------------------------------------------
# Seasonal-naive backtest — forecast every hour with the value 24 h
# earlier and score it: the baseline any real forecasting model must
# beat, and the shape of every backtesting pipeline.
# ---------------------------------------------------------------------------


@query(
    "ts_forecast_seasonal_naive",
    """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         ROUND(SUM(value), 6) AS v
  FROM events GROUP BY 1, 2
)
SELECT a.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_scored,
       ROUND(AVG(abs(a.v - f.v)) + 1e-9, 4) AS mae,
       ROUND(AVG(2 * abs(a.v - f.v) / (abs(a.v) + abs(f.v))) + 1e-9, 4) AS smape
FROM h a JOIN h f ON f.event_type = a.event_type
                 AND f.bucket = a.bucket - INTERVAL 24 HOUR
GROUP BY a.event_type
""",
)
def ts_forecast_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive (same hour yesterday) forecast error per event
    type: MAE and sMAPE over every hour that has a 24h-earlier
    observation.

    Scale plan: identical shape to ts_autocorr_hourly — one
    partial-agg collapse to the hourly grid, one co-partitioned
    equi-join against its own 24h shift, one partial-aggregatable
    scoring pass. sMAPE (not MAPE) so near-zero actuals can't blow
    up the division; hourly sums pre-rounded so both engines score
    identical series, and the error averages carry the shared 1e-9
    nudge before 4-dp rounding — means of 6-dp-rounded inputs land
    exactly on 4-dp halves, where the engines' rounding modes
    (HALF_UP vs half-even) disagree."""
    ev = _t(spark, sf_dir, "events")
    h = ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket")).agg(
        F.round(F.sum("value"), 6).alias("v")
    )
    fc = h.select(
        "event_type",
        (F.col("bucket") + F.expr("INTERVAL 24 HOURS")).alias("bucket"),
        F.col("v").alias("__f"),
    )
    err = F.abs(F.col("v") - F.col("__f"))
    return (
        h.join(fc, ["event_type", "bucket"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_scored"),
            F.round(F.avg(err) + F.lit(1e-9), 4).alias("mae"),
            F.round(
                F.avg(2 * err / (F.abs(F.col("v")) + F.abs(F.col("__f")))) + F.lit(1e-9), 4
            ).alias("smape"),
        )
    )


# ---------------------------------------------------------------------------
# Blocked fuzzy entity resolution — near-duplicate customer names by
# edit distance, found through blocking instead of an n² cross join.
# For equal-length names, levenshtein ≤ 1 means at most one
# substitution, so the pair agrees on the first half OR the last half
# of the string — two blocking passes give PROVABLY full recall, and
# the all-pairs oracle verifies that claim, not just the plan.
# ---------------------------------------------------------------------------


@query(
    "er_blocked_fuzzy_pairs",
    """
SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
FROM customer a JOIN customer b
  ON a.c_custkey < b.c_custkey
 AND a.c_mktsegment = 'BUILDING' AND b.c_mktsegment = 'BUILDING'
 AND levenshtein(a.c_name, b.c_name) <= 1
""",
)
def er_blocked_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-name pairs (BUILDING segment) with edit distance ≤ 1,
    via two-pass blocking: key pass 1 on the first 12 chars, pass 2
    on the last 6. Names are fixed-length (``Customer#`` + 9
    digits), so distance ≤ 1 forces equality everywhere but one
    position — that position is in exactly one of the two block
    halves, hence the union of both passes has full recall (the
    O(n²) oracle proves it on every run, for every SF).

    Scale plan: each blocking pass is an equi-join on the block key —
    candidate count is Σ|block|², never n². Verification
    (levenshtein) runs only on co-blocked candidates; the two passes
    union + distinct on the key pair. This is the standard record-
    linkage shape (block → match) that survives a billion-row
    customer table, where the oracle's cross join does not."""
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name")
    )

    def pass_pairs(block_key) -> DataFrame:
        blocked = cust.withColumn("__blk", block_key)
        a, b = blocked.alias("a"), blocked.alias("b")
        return (
            a.join(
                b,
                (F.col("a.__blk") == F.col("b.__blk"))
                & (F.col("a.c_custkey") < F.col("b.c_custkey")),
            )
            .filter(F.levenshtein(F.col("a.c_name"), F.col("b.c_name")) <= 1)
            .select(
                F.col("a.c_custkey").alias("custkey_a"),
                F.col("b.c_custkey").alias("custkey_b"),
                F.levenshtein(F.col("a.c_name"), F.col("b.c_name"))
                .cast("int")
                .alias("dist"),
            )
        )

    first_half = pass_pairs(F.substring("c_name", 1, 12))
    last_half = pass_pairs(F.substring("c_name", -6, 6))
    return first_half.union(last_half).distinct()


# ---------------------------------------------------------------------------
# Rolling distinct count — "how many distinct event types did this
# user touch in the last 24 h", evaluated AT EVERY EVENT. Distinct
# over a moving frame has no algebraic partial, so the frame is
# materialized per row — bounded by the user's 24 h event volume.
# ---------------------------------------------------------------------------


@query(
    "window_rolling_distinct",
    """
SELECT e.event_id, e.user_id,
       (SELECT CAST(COUNT(DISTINCT e2.event_type) AS INT) FROM events e2
        WHERE e2.user_id = e.user_id
          AND e2.ts >= e.ts - INTERVAL 24 HOUR AND e2.ts <= e.ts)
         AS n_types_24h
FROM events e
""",
)
def window_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: distinct event types by the same user in the
    trailing 24 h (inclusive both ends), via collect_set over a
    microsecond RANGE frame.

    Scale plan: one shuffle, partitioned by user_id — each frame is
    bounded by a single user's 24 h activity (state ∝ per-user rate,
    not corpus size). The frame bound uses unix_micros, not
    unix_timestamp, because ts carries microseconds and a
    second-truncated bound would disagree with the oracle's INTERVAL
    arithmetic at the window edge. Rolling DISTINCT has no
    partial-merge form (unlike sum/min), so set materialization per
    frame is the honest cost; the HLL-sketch variant
    (agg_hll_partial_union) is the approximate escape hatch when
    per-user frames get hot."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-24 * 3600 * 1_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w)).alias("n_types_24h"),
    )


# ---------------------------------------------------------------------------
# Geometric and harmonic means — the log-domain and rate-domain
# means (growth factors, price-per-unit averages) next to the plain
# arithmetic mean.
# ---------------------------------------------------------------------------


@query(
    "agg_geo_harmonic_means",
    """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND(AVG(l_extendedprice), 4) AS mean_arith,
       ROUND(exp(AVG(ln(l_extendedprice))), 4) AS mean_geo,
       ROUND(COUNT(*) / SUM(1.0 / l_extendedprice), 4) AS mean_harm
FROM lineitem WHERE l_extendedprice > 0
GROUP BY l_returnflag
""",
)
def agg_geo_harmonic_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic / geometric / harmonic means of extended price per
    return flag (positive values only; AM ≥ GM ≥ HM).

    Scale plan: all three are algebraic aggregates — geometric mean
    as exp(avg(ln x)), harmonic as n/Σ(1/x) — so the whole query is
    one partial-aggregatable scan with map-side combine; nothing is
    materialized beyond |groups| rows."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") > 0)
    x = F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.round(F.avg(x), 4).alias("mean_arith"),
        F.round(F.exp(F.avg(F.log(x))), 4).alias("mean_geo"),
        F.round(F.count(F.lit(1)) / F.sum(1.0 / x), 4).alias("mean_harm"),
    )
