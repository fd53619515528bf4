"""Round-4o additions: distributed logistic regression (unrolled
Newton-Raphson), delete-one-bucket jackknife for ratio metrics, a
deterministic Poisson bootstrap, Kendall tau-b and Theil-Sen trend
over a pre-aggregated daily series, log-space cumulative products,
an l-diversity privacy audit, and a broadcast haversine
nearest-station join.

Registered AFTER round4n so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Logistic regression by unrolled Newton-Raphson — the iterative
# sibling of ml_ols_normal_eq: each Newton step is ONE algebraic
# aggregation over the data (gradient + 2x2 Hessian of the
# log-likelihood), the closed-form 2x2 solve happens inside the plan
# (Cramer's rule on the 1-row aggregate), and the updated betas flow
# into the next pass via a 1-row broadcast cross join — no driver-side
# data movement at any step. Three steps are unrolled; from beta=0 on
# a centered feature, Newton is quadratically convergent and three
# steps land within 1e-9 of the optimum here, so a 6-dp rounding is
# stable across engines. The oracle unrolls the identical three steps
# as chained CTEs.
# ---------------------------------------------------------------------------

_LOGIT_STEP = """
  SELECT
    SUM(1.0 / (1.0 + exp(-(b0 + b1 * x))) - y)            AS g0,
    SUM((1.0 / (1.0 + exp(-(b0 + b1 * x))) - y) * x)      AS g1,
    SUM(1.0 / (1.0 + exp(-(b0 + b1 * x)))
        * (1.0 - 1.0 / (1.0 + exp(-(b0 + b1 * x)))))      AS h00,
    SUM(1.0 / (1.0 + exp(-(b0 + b1 * x)))
        * (1.0 - 1.0 / (1.0 + exp(-(b0 + b1 * x)))) * x)  AS h01,
    SUM(1.0 / (1.0 + exp(-(b0 + b1 * x)))
        * (1.0 - 1.0 / (1.0 + exp(-(b0 + b1 * x)))) * x * x) AS h11,
    ANY_VALUE(b0) AS pb0, ANY_VALUE(b1) AS pb1
  FROM d CROSS JOIN {prev}
"""

_LOGIT_SOLVE = """
  SELECT pb0 - (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01) AS b0,
         pb1 - (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01) AS b1
  FROM {step}
"""


@query(
    "ml_logistic_newton",
    f"""
WITH raw AS (
  SELECT CAST(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS DOUBLE) AS y,
         l_quantity AS xr
  FROM lineitem
),
mx AS (SELECT AVG(xr) AS mx FROM raw),
d AS (SELECT y, xr - (SELECT mx FROM mx) AS x FROM raw),
b_init AS (SELECT CAST(0 AS DOUBLE) AS b0, CAST(0 AS DOUBLE) AS b1),
s1 AS ({_LOGIT_STEP.format(prev="b_init")}),
b1_ AS ({_LOGIT_SOLVE.format(step="s1")}),
s2 AS ({_LOGIT_STEP.format(prev="b1_")}),
b2_ AS ({_LOGIT_SOLVE.format(step="s2")}),
s3 AS ({_LOGIT_STEP.format(prev="b2_")}),
b3_ AS ({_LOGIT_SOLVE.format(step="s3")})
SELECT ROUND(b0, 6) AS beta0_centered, ROUND(b1, 6) AS beta1,
       ROUND(b0 - b1 * (SELECT mx FROM mx), 6) AS beta0,
       ROUND(1.0 / (1.0 + exp(-b0)), 6) AS p_at_mean
FROM b3_
""",
)
def ml_logistic_newton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit P(l_returnflag='R') = sigmoid(b0 + b1*l_quantity) by three
    unrolled Newton-Raphson steps. Each step aggregates the exact
    gradient and 2x2 Hessian of the Bernoulli log-likelihood in one
    distributed pass (algebraic sums -> map-side combinable), solves
    the 2x2 system with Cramer's rule inside the same 1-row plan, and
    broadcasts the new betas into the next pass. The feature is
    mean-centered first so the Hessian is well-conditioned and
    beta=0 is a good start. At 100 TB each step is one scan + one
    scalar broadcast; the per-step cache below keeps the projection
    from being re-read three times on one machine, while on a cluster
    the scan is the irreducible cost. Mirrors the reference's
    delegation of modeling to post-load SQL (pandas has no modeling
    op; see /root/reference/dags/wine_etl_kaggle.py:66-96)."""
    raw = _t(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0).alias("y"),
        F.col("l_quantity").alias("xr"),
    )
    mx = raw.agg(F.avg("xr").alias("mx"))
    d = raw.crossJoin(F.broadcast(mx)).select(
        "y", (F.col("xr") - F.col("mx")).alias("x"), "mx"
    )
    d = d.localCheckpoint()  # GC-cleaned, unlike persist (ADVICE r4)
    betas = spark.range(1).select(F.lit(0.0).alias("b0"), F.lit(0.0).alias("b1"))
    p = 1.0 / (1.0 + F.exp(-(F.col("b0") + F.col("b1") * F.col("x"))))
    for _ in range(3):
        step = d.crossJoin(F.broadcast(betas)).agg(
            F.sum(p - F.col("y")).alias("g0"),
            F.sum((p - F.col("y")) * F.col("x")).alias("g1"),
            F.sum(p * (1.0 - p)).alias("h00"),
            F.sum(p * (1.0 - p) * F.col("x")).alias("h01"),
            F.sum(p * (1.0 - p) * F.col("x") * F.col("x")).alias("h11"),
            F.any_value("b0").alias("pb0"),
            F.any_value("b1").alias("pb1"),
        )
        det = F.col("h00") * F.col("h11") - F.col("h01") * F.col("h01")
        betas = step.select(
            (F.col("pb0") - (F.col("h11") * F.col("g0") - F.col("h01") * F.col("g1")) / det).alias("b0"),
            (F.col("pb1") - (F.col("h00") * F.col("g1") - F.col("h01") * F.col("g0")) / det).alias("b1"),
        )
    out = betas.crossJoin(F.broadcast(mx)).select(
        F.round("b0", 6).alias("beta0_centered"),
        F.round("b1", 6).alias("beta1"),
        F.round(F.col("b0") - F.col("b1") * F.col("mx"), 6).alias("beta0"),
        F.round(1.0 / (1.0 + F.exp(-F.col("b0"))), 6).alias("p_at_mean"),
    )
    return out


# ---------------------------------------------------------------------------
# Delete-one-bucket jackknife for a ratio metric — how large A/B
# systems get a variance for revenue-per-event without per-row
# resampling: hash users into B buckets, keep only per-bucket sums,
# and every leave-one-out replicate is totals-minus-bucket arithmetic
# (O(B), not O(n*B)).
# ---------------------------------------------------------------------------


@query(
    "stat_jackknife_ratio",
    """
WITH b AS (
  SELECT user_id % 32 AS bucket,
         SUM(value) AS s, CAST(COUNT(*) AS DOUBLE) AS n
  FROM events GROUP BY user_id % 32
),
tot AS (SELECT SUM(s) AS st, SUM(n) AS nt, COUNT(*) AS nb FROM b),
loo AS (
  SELECT (st - s) / (nt - n) AS theta_i, st, nt, nb
  FROM b CROSS JOIN tot
),
j AS (
  SELECT ANY_VALUE(st / nt) AS theta,
         ANY_VALUE(nb) AS nb,
         AVG(theta_i) AS mloo,
         SUM(theta_i * theta_i) AS ss,
         COUNT(*) AS cnt
  FROM loo
)
SELECT ROUND(theta, 6) AS theta,
       nb AS n_buckets,
       ROUND(sqrt((CAST(nb AS DOUBLE) - 1) / nb * (ss - cnt * mloo * mloo)), 6)
         AS se_jack
FROM j
""",
)
def stat_jackknife_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jackknife standard error for the ratio metric
    sum(value)/count(*) over events: users hashed into 32 buckets,
    one sufficient-statistic row per bucket, leave-one-out replicate
    theta_i = (S - s_i)/(N - n_i) computed from totals broadcast back
    over the 32-row frame. The data-sized work is exactly one
    groupBy; everything after is O(buckets). At 100 TB the bucket
    frame is still 32 rows — this is the delta-method-free variance
    estimate production experimentation systems use."""
    ev = _t(spark, sf_dir, "events")
    b = ev.groupBy((F.col("user_id") % 32).alias("bucket")).agg(
        F.sum("value").alias("s"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    tot = b.agg(
        F.sum("s").alias("st"), F.sum("n").alias("nt"), F.count(F.lit(1)).alias("nb")
    )
    loo = b.crossJoin(F.broadcast(tot)).select(
        ((F.col("st") - F.col("s")) / (F.col("nt") - F.col("n"))).alias("theta_i"),
        "st", "nt", "nb",
    )
    j = loo.agg(
        F.any_value(F.col("st") / F.col("nt")).alias("theta"),
        F.any_value("nb").alias("nb"),
        F.avg("theta_i").alias("mloo"),
        F.sum(F.col("theta_i") * F.col("theta_i")).alias("ss"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return j.select(
        F.round("theta", 6).alias("theta"),
        F.col("nb").alias("n_buckets"),
        F.round(
            F.sqrt(
                (F.col("nb") - 1.0)
                / F.col("nb")
                * (F.col("ss") - F.col("cnt") * F.col("mloo") * F.col("mloo"))
            ),
            6,
        ).alias("se_jack"),
    )


# ---------------------------------------------------------------------------
# Deterministic Poisson bootstrap — per-row replicate weights drawn
# from Poisson(1) via an explicit MINSTD LCG on (event_id, replicate),
# so both engines produce bit-identical resamples with zero data
# movement: the "resample" is explode(64 replicates) + weighted
# aggregation, the classic shared-nothing bootstrap (Poisson
# approximation to multinomial resampling; cf. bag of little
# bootstraps). No engine-native rand() anywhere — reproducibility is
# part of the operator contract.
# ---------------------------------------------------------------------------

# cumulative Poisson(1) pmf thresholds for the inverse-CDF draw
_POIS = [
    (0.36787944117144233, 0),
    (0.7357588823428847, 1),
    (0.9196986029286058, 2),
    (0.9810118431238462, 3),
    (0.9963401531726563, 4),
    (0.9994058151824183, 5),
]


def _pois_case_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {t!r} THEN {k}" for t, k in _POIS
    )
    return f"CASE {branches} ELSE 6 END"


@query(
    "stat_bootstrap_poisson",
    f"""
WITH rep AS (SELECT unnest(range(64)) AS r),
w AS (
  SELECT r,
         value,
         {_pois_case_sql("CAST((48271 * ((event_id * 64 + r) % 44488) % 2147483647) AS DOUBLE) / 2147483647.0")} AS wt
  FROM events CROSS JOIN rep
),
m AS (
  SELECT r, SUM(wt * value) / SUM(wt) AS mean_r
  FROM w GROUP BY r HAVING SUM(wt) > 0
)
SELECT ROUND(AVG(mean_r), 6) AS boot_mean,
       ROUND(STDDEV_SAMP(mean_r), 6) AS boot_se,
       ROUND(quantile_cont(mean_r, 0.025), 6) AS ci_lo,
       ROUND(quantile_cont(mean_r, 0.975), 6) AS ci_hi,
       COUNT(*) AS n_reps
FROM m
""",
)
def stat_bootstrap_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap CI for mean(events.value) with 64 Poisson(1)
    replicates: each (row, replicate) weight comes from an explicit
    MINSTD LCG (seed = event_id*64 + r, pre-reduced mod 44488 so
    48271*seed stays in int64) inverse-CDF'd through the Poisson(1)
    cumulative pmf — an exactly-representable integer/2147483647
    ratio, so Spark and DuckDB draw identical weights. The plan is
    explode(64) + one weighted groupBy over 64 keys: embarrassingly
    parallel, no shuffle of the raw data beyond the 64-way partial
    aggregation, and at 100 TB the replicate frame is still 64 rows.
    percentile() here matches DuckDB quantile_cont (both linear
    interpolation)."""
    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    rep = F.explode(F.sequence(F.lit(0), F.lit(63))).alias("r")
    w = ev.select("event_id", "value", rep).select(
        "r",
        "value",
        F.expr(
            _pois_case_sql(
                "CAST((48271 * ((event_id * 64 + r) % 44488) % 2147483647) AS DOUBLE)"
                " / 2147483647.0"
            )
        ).alias("wt"),
    )
    m = (
        w.groupBy("r")
        .agg((F.sum(F.col("wt") * F.col("value")) / F.sum("wt")).alias("mean_r"),
             F.sum("wt").alias("tw"))
        .where(F.col("tw") > 0)
    )
    return m.agg(
        F.round(F.avg("mean_r"), 6).alias("boot_mean"),
        F.round(F.stddev_samp("mean_r"), 6).alias("boot_se"),
        F.round(F.expr("percentile(mean_r, 0.025)"), 6).alias("ci_lo"),
        F.round(F.expr("percentile(mean_r, 0.975)"), 6).alias("ci_hi"),
        F.count(F.lit(1)).alias("n_reps"),
    )


# ---------------------------------------------------------------------------
# Kendall tau-b and Theil-Sen trend over the PRE-AGGREGATED daily
# order series — the scale discipline is the point: the quadratic
# pair enumeration runs on the ~2.4k-row daily aggregate (bounded by
# the calendar, not the data), never on the raw fact table. The raw
# work is one groupBy(day).
# ---------------------------------------------------------------------------


@query(
    "stat_kendall_tau_daily",
    """
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(COUNT(*) AS DOUBLE) AS n_orders,
         AVG(o_totalprice) AS avg_price
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
),
p AS (
  SELECT SIGN(a.n_orders - b.n_orders) AS sx,
         SIGN(a.avg_price - b.avg_price) AS sy
  FROM d a JOIN d b ON a.day < b.day
),
c AS (
  SELECT SUM(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END) AS nc,
         SUM(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END) AS nd,
         SUM(CASE WHEN sx = 0 AND sy <> 0 THEN 1 ELSE 0 END) AS tx,
         SUM(CASE WHEN sy = 0 AND sx <> 0 THEN 1 ELSE 0 END) AS ty,
         COUNT(*) AS np
  FROM p
)
SELECT CAST(nc AS BIGINT) AS concordant,
       CAST(nd AS BIGINT) AS discordant,
       ROUND(CAST(nc - nd AS DOUBLE)
             / sqrt(CAST((nc + nd + tx) * (nc + nd + ty) AS DOUBLE)), 6)
         AS tau_b
FROM c
""",
)
def stat_kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between daily order count and daily average
    price. Pass 1 collapses orders to one row per calendar day (the
    only data-sized work); pass 2 enumerates day pairs with a
    range self-join on the ~2.4k-row aggregate (~3M pairs — constant
    in SF, because the calendar doesn't grow with row count) and
    counts concordant/discordant/tied pairs. Tau-b's tie correction
    uses only pairs tied in exactly one variable, matching the
    pairwise definition on both engines."""
    d = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_orders"),
            F.avg("o_totalprice").alias("avg_price"),
        )
    )
    a, b = d.alias("a"), d.alias("b")
    p = a.join(b, F.col("a.day") < F.col("b.day")).select(
        F.signum(F.col("a.n_orders") - F.col("b.n_orders")).alias("sx"),
        F.signum(F.col("a.avg_price") - F.col("b.avg_price")).alias("sy"),
    )
    c = p.agg(
        F.sum(F.when(F.col("sx") * F.col("sy") > 0, 1.0).otherwise(0.0)).alias("nc"),
        F.sum(F.when(F.col("sx") * F.col("sy") < 0, 1.0).otherwise(0.0)).alias("nd"),
        F.sum(
            F.when((F.col("sx") == 0) & (F.col("sy") != 0), 1.0).otherwise(0.0)
        ).alias("tx"),
        F.sum(
            F.when((F.col("sy") == 0) & (F.col("sx") != 0), 1.0).otherwise(0.0)
        ).alias("ty"),
    )
    return c.select(
        F.col("nc").cast("bigint").alias("concordant"),
        F.col("nd").cast("bigint").alias("discordant"),
        F.round(
            (F.col("nc") - F.col("nd"))
            / F.sqrt(
                (F.col("nc") + F.col("nd") + F.col("tx"))
                * (F.col("nc") + F.col("nd") + F.col("ty"))
            ),
            6,
        ).alias("tau_b"),
    )


@query(
    "stat_theil_sen_daily",
    """
WITH d AS (
  SELECT epoch(CAST(o_orderdate AS DATE)) / 86400 AS day_idx,
         SUM(o_totalprice) AS revenue
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
),
s AS (
  SELECT (b.revenue - a.revenue) / (b.day_idx - a.day_idx) AS slope
  FROM d a JOIN d b ON a.day_idx < b.day_idx
)
SELECT ROUND(quantile_cont(slope, 0.5), 6) AS ts_slope,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM s
""",
)
def stat_theil_sen_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily revenue: median of all
    pairwise slopes over the daily aggregate. Same scale shape as
    stat_kendall_tau_daily — the quadratic is calendar-bounded
    (~3M slope pairs regardless of SF), the raw table contributes
    one groupBy. The median uses percentile() / quantile_cont
    (linear interpolation on both engines)."""
    d = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("revenue"))
        .select(
            (F.unix_timestamp(F.col("day").cast("timestamp")) / 86400).alias(
                "day_idx"
            ),
            "revenue",
        )
    )
    a, b = d.alias("a"), d.alias("b")
    s = a.join(b, F.col("a.day_idx") < F.col("b.day_idx")).select(
        (
            (F.col("b.revenue") - F.col("a.revenue"))
            / (F.col("b.day_idx") - F.col("a.day_idx"))
        ).alias("slope")
    )
    return s.agg(
        F.round(F.expr("percentile(slope, 0.5)"), 6).alias("ts_slope"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )


# ---------------------------------------------------------------------------
# Log-space cumulative product — running compound index per user
# (think cumulative return): product via exp(sum(ln)), the only
# shuffle-stable way to run a product window at scale (multiplying
# doubles in frame order overflows/underflows and isn't map-side
# combinable; summing logs is).
# ---------------------------------------------------------------------------


@query(
    "window_cumulative_product",
    """
WITH g AS (
  SELECT user_id, event_id, ts, 1.0 + value / 1000.0 AS factor
  FROM events
)
SELECT user_id, event_id,
       ROUND(exp(SUM(ln(factor)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6) AS cum_index
FROM g
""",
)
def window_cumulative_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running product of growth factors (1 + value/1000)
    over events in time order, computed as exp of a running log-sum.
    events.value > 0 in this corpus so ln is total; a production
    variant guards factor <= 0 into NULL. The log-sum keeps the
    window an ordinary additive frame — partial-aggregable, no
    overflow at any prefix length — which a literal product window
    is not."""
    g = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", (1.0 + F.col("value") / 1000.0).alias("factor")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return g.select(
        "user_id",
        "event_id",
        F.round(F.exp(F.sum(F.log("factor")).over(w)), 6).alias("cum_index"),
    )


# ---------------------------------------------------------------------------
# l-diversity audit — the step after k-anonymity (already registered
# as privacy_k_anonymity): a quasi-identifier group can be k-large
# yet still leak if every member shares one sensitive value. Report
# each (segment, nation) group's size, distinct-sensitive count, and
# whether it meets l>=3 distinct order priorities.
# ---------------------------------------------------------------------------


@query(
    "privacy_l_diversity",
    """
SELECT c.c_mktsegment AS segment,
       c.c_nationkey AS nationkey,
       CAST(COUNT(*) AS BIGINT) AS group_k,
       CAST(COUNT(DISTINCT o.o_orderpriority) AS BIGINT) AS l_distinct,
       CAST(COUNT(DISTINCT o.o_orderpriority) >= 3 AS BOOLEAN) AS meets_l3
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment, c.c_nationkey
""",
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-l-diversity over quasi-identifier (mktsegment,
    nationkey) with o_orderpriority as the sensitive attribute: one
    fact-dim join (customer side is the smaller table; AQE picks the
    strategy) and one groupBy with a distinct-count — the same
    shuffle shape as any segmented count, so it scales like a plain
    rollup. Complements privacy_k_anonymity: k bounds re-identification,
    l bounds attribute disclosure."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("c_nationkey").alias("nationkey"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("group_k"),
            F.count_distinct("o_orderpriority").cast("bigint").alias("l_distinct"),
            (F.count_distinct("o_orderpriority") >= 3).alias("meets_l3"),
        )
    )


# ---------------------------------------------------------------------------
# Haversine nearest-station join — geo enrichment as a broadcast
# nearest-neighbor: 25 synthetic "stations" derived from nation keys,
# each customer (coords derived deterministically from its key) is
# assigned its nearest station by great-circle distance. The station
# side is broadcast; with a large station set the same query runs as
# a geohash-binned equi-join (bin both sides to cells, join cell +
# neighbors) — the docstring's scale path.
# ---------------------------------------------------------------------------


@query(
    "geo_haversine_nearest",
    """
WITH st AS (
  SELECT n_nationkey AS station_id,
         CAST((n_nationkey * 37) % 120 AS DOUBLE) - 60 AS slat,
         CAST((n_nationkey * 73) % 360 AS DOUBLE) - 180 AS slon
  FROM nation
),
cu AS (
  SELECT c_custkey,
         CAST((c_custkey * 13) % 120 AS DOUBLE) - 60 AS clat,
         CAST((c_custkey * 29) % 360 AS DOUBLE) - 180 AS clon
  FROM customer
),
d AS (
  SELECT c_custkey, station_id,
         ROUND(2.0 * 6371.0 * asin(sqrt(
           pow(sin(radians(slat - clat) / 2), 2)
           + cos(radians(clat)) * cos(radians(slat))
             * pow(sin(radians(slon - clon) / 2), 2))), 3) AS dist_km
  FROM cu CROSS JOIN st
),
r AS (
  SELECT c_custkey, station_id, dist_km,
         ROW_NUMBER() OVER (PARTITION BY c_custkey
                            ORDER BY dist_km, station_id) AS rn
  FROM d
)
SELECT c_custkey, station_id AS nearest_station, dist_km
FROM r WHERE rn = 1
""",
)
def geo_haversine_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest of 25 stations per customer by haversine distance,
    coordinates derived deterministically from the keys (integer
    modular arithmetic — identical in both engines). The 25-row
    station frame is broadcast under a cross join, distances are
    rounded to 3 dp (meters) BEFORE the argmin so a sub-ulp trig
    difference between engines can't flip the winner, and the
    (dist, station_id) row_number tiebreak is total. Scale path for
    a big station set: geohash-bin both sides and equi-join on cell
    + 8 neighbors instead of the cross join."""
    st = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("station_id"),
        (((F.col("n_nationkey") * 37) % 120) - 60.0).alias("slat"),
        (((F.col("n_nationkey") * 73) % 360) - 180.0).alias("slon"),
    )
    cu = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        (((F.col("c_custkey") * 13) % 120) - 60.0).alias("clat"),
        (((F.col("c_custkey") * 29) % 360) - 180.0).alias("clon"),
    )
    hav = 2.0 * 6371.0 * F.asin(
        F.sqrt(
            F.pow(F.sin(F.radians(F.col("slat") - F.col("clat")) / 2), 2)
            + F.cos(F.radians("clat"))
            * F.cos(F.radians("slat"))
            * F.pow(F.sin(F.radians(F.col("slon") - F.col("clon")) / 2), 2)
        )
    )
    d = cu.crossJoin(F.broadcast(st)).select(
        "c_custkey", "station_id", F.round(hav, 3).alias("dist_km")
    )
    w = W.partitionBy("c_custkey").orderBy("dist_km", "station_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "c_custkey",
            F.col("station_id").alias("nearest_station"),
            "dist_km",
        )
    )
