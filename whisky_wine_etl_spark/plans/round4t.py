"""Round-4t additions: Benjamini-Hochberg multiple-testing control
with an engine-shared erf approximation, a sequential SPRT monitor,
and a bucketed co-located join round-trip.

Registered AFTER round4s so the driver's unverified-first ordering
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
# Benjamini-Hochberg FDR control over 25 per-nation z-tests. Neither
# engine ships erf/Phi, so BOTH sides evaluate the SAME
# Abramowitz-Stegun 7.1.26 polynomial for the normal tail — identical
# elementary-op expression trees produce identical doubles, which is
# what makes exact p-value parity possible at all. The BH step-up is
# two windows over the 25-row test table.
# ---------------------------------------------------------------------------

# erfc(x) via A&S 7.1.26 (abs err < 1.5e-7, far below the 6-dp
# comparison grain); {z} receives x = |z|/sqrt(2), giving the
# two-sided p-value erfc(|z|/sqrt(2))
_PHI_TAIL = (
    "(0.254829592 * (1.0 / (1.0 + 0.3275911 * ({z})))"
    " - 0.284496736 * pow(1.0 / (1.0 + 0.3275911 * ({z})), 2)"
    " + 1.421413741 * pow(1.0 / (1.0 + 0.3275911 * ({z})), 3)"
    " - 1.453152027 * pow(1.0 / (1.0 + 0.3275911 * ({z})), 4)"
    " + 1.061405429 * pow(1.0 / (1.0 + 0.3275911 * ({z})), 5))"
    " * exp(-(({z}) * ({z})))"
)


@query(
    "stat_multiple_testing_bh",
    f"""
WITH g AS (
  SELECT n_nationkey AS nation, AVG(o_totalprice) AS mu,
         VAR_SAMP(o_totalprice) AS v, CAST(COUNT(*) AS DOUBLE) AS n
  FROM orders
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY n_nationkey
),
tot AS (SELECT AVG(o_totalprice) AS mu0 FROM orders),
z AS (
  SELECT nation, abs(mu - mu0) / sqrt(v / n) AS az
  FROM g CROSS JOIN tot
),
p AS (
  SELECT nation, {_PHI_TAIL.format(z="az / sqrt(2.0)")} AS pval
  FROM z
),
r AS (
  SELECT nation, pval,
         ROW_NUMBER() OVER (ORDER BY pval, nation) AS rk,
         COUNT(*) OVER () AS m
  FROM p
),
h AS (
  SELECT nation, pval, rk, m,
         MAX(CASE WHEN pval * m <= 0.05 * CAST(rk AS DOUBLE) THEN rk ELSE 0 END)
           OVER () AS kmax
  FROM r
)
SELECT nation, ROUND(pval, 6) AS p_value, CAST(rk AS INT) AS p_rank,
       CAST(rk <= kmax AS BOOLEAN) AS rejected
FROM h
""",
)
def stat_multiple_testing_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """25 simultaneous z-tests (per-nation mean order value vs the
    global mean) corrected with the Benjamini-Hochberg step-up at
    FDR 0.05. The two-sided p-value is the A&S 7.1.26 erfc
    polynomial evaluated with the SAME expression tree in both
    engines (neither ships erf; an engine-native one would diverge
    in the last ulp and is unavailable anyway). The data-sized work
    is the grouped moment pass; ranking and the step-up
    (max k: p_(k) <= k/m * alpha, reject ranks <= k) are windows over
    the 25-row test table. The per-test variance is the group's own
    sample variance — a Welch-style z, fine at these group sizes."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    g = (
        o.join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy(F.col("n_nationkey").alias("nation"))
        .agg(
            F.avg("o_totalprice").alias("mu"),
            F.var_samp("o_totalprice").alias("v"),
            F.count(F.lit(1)).cast("double").alias("n"),
        )
    )
    tot = o.agg(F.avg("o_totalprice").alias("mu0"))
    z = g.crossJoin(F.broadcast(tot)).select(
        "nation",
        (F.abs(F.col("mu") - F.col("mu0")) / F.sqrt(F.col("v") / F.col("n"))).alias(
            "az"
        ),
    )
    p = z.select(
        "nation",
        F.expr(_PHI_TAIL.format(z="az / sqrt(2.0)")).alias("pval"),
    )
    wr = W.orderBy("pval", "nation")
    wa = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    r = p.select(
        "nation",
        "pval",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wa).alias("m"),
    )
    h = r.select(
        "nation",
        "pval",
        "rk",
        F.max(
            F.when(F.col("pval") * F.col("m") <= 0.05 * F.col("rk"), F.col("rk"))
            .otherwise(0)
        )
        .over(wa)
        .alias("kmax"),
    )
    return h.select(
        "nation",
        F.round("pval", 6).alias("p_value"),
        F.col("rk").cast("int").alias("p_rank"),
        (F.col("rk") <= F.col("kmax")).alias("rejected"),
    )


# ---------------------------------------------------------------------------
# Sequential probability ratio test — the always-on monitor: walk
# each arm's purchase/no-purchase sequence in time order accumulating
# the Bernoulli log-likelihood ratio (H0 p=0.18 vs H1 p=0.22) and
# report the first boundary crossing (Wald thresholds ln(19),
# -ln(19) ~ alpha=beta=0.05). Pure keyed window cumsum + argmin.
# ---------------------------------------------------------------------------


@query(
    "stat_sprt_sequential",
    """
WITH s AS (
  SELECT user_id % 2 AS arm, ts, event_id,
         CASE WHEN event_type = 'purchase'
              THEN ln(0.22 / 0.18) ELSE ln(0.78 / 0.82) END AS llr_step
  FROM events
),
c AS (
  SELECT arm, ts, event_id,
         SUM(llr_step) OVER (PARTITION BY arm ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS llr,
         ROW_NUMBER() OVER (PARTITION BY arm ORDER BY ts, event_id) AS n_obs
  FROM s
),
x AS (
  SELECT arm, n_obs, llr,
         CASE WHEN llr >= ln(19.0) THEN 'accept_h1'
              WHEN llr <= -ln(19.0) THEN 'accept_h0' END AS verdict,
         ROW_NUMBER() OVER (PARTITION BY arm ORDER BY n_obs) AS cross_rank
  FROM c
  WHERE llr >= ln(19.0) OR llr <= -ln(19.0)
)
SELECT arm, CAST(n_obs AS BIGINT) AS first_crossing_obs,
       ROUND(llr, 6) AS llr_at_crossing, verdict
FROM x WHERE cross_rank = 1
""",
)
def stat_sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT per experiment arm: cumulative Bernoulli LLR over
    the time-ordered event stream, stopping at the first crossing of
    +-ln(19). One keyed window pass computes the walk; the crossing
    extraction is a filter + per-arm rank. The LLR increments are two
    ln literals (constant-folded identically in both engines), the
    cumulative sum is frame-ordered the same way on both sides, and
    the 6-dp rounding happens only at output. This is the sequential
    complement of the fixed-horizon readouts
    (stat_ab_welch_ttest / stat_ab_power_mde)."""
    ev = _t(spark, sf_dir, "events")
    s = ev.select(
        (F.col("user_id") % 2).alias("arm"),
        "ts",
        "event_id",
        F.when(
            F.col("event_type") == "purchase",
            F.log(F.lit(0.22) / F.lit(0.18)),
        )
        .otherwise(F.log(F.lit(0.78) / F.lit(0.82)))
        .alias("llr_step"),
    )
    wo = (
        W.partitionBy("arm")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wr = W.partitionBy("arm").orderBy("ts", "event_id")
    c = s.select(
        "arm",
        F.sum("llr_step").over(wo).alias("llr"),
        F.row_number().over(wr).alias("n_obs"),
    )
    bound = F.log(F.lit(19.0))
    x = c.where((F.col("llr") >= bound) | (F.col("llr") <= -bound)).select(
        "arm",
        "n_obs",
        "llr",
        F.when(F.col("llr") >= bound, "accept_h1")
        .when(F.col("llr") <= -bound, "accept_h0")
        .alias("verdict"),
        F.row_number().over(W.partitionBy("arm").orderBy("n_obs")).alias(
            "cross_rank"
        ),
    )
    return x.where(F.col("cross_rank") == 1).select(
        "arm",
        F.col("n_obs").cast("bigint").alias("first_crossing_obs"),
        F.round("llr", 6).alias("llr_at_crossing"),
        "verdict",
    )


# ---------------------------------------------------------------------------
# Bucketed co-located join — the storage-layout lever that removes
# the shuffle from a repeated fact-dim join entirely: write both
# sides bucketed by the join key into a /tmp-located database, join
# the bucketed tables, return the aggregated result. The zero-
# Exchange property is pinned in tests/test_plans_physical.py; the
# oracle verifies the VALUES round-trip (bucketed write + read +
# join + agg loses nothing).
# ---------------------------------------------------------------------------


@query(
    "layout_bucketed_join_roundtrip",
    """
SELECT c.c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o.o_totalprice), 2) AS revenue
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment
""",
)
def layout_bucketed_join_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write customer and orders bucketed 8 ways by the join key
    (sorted within buckets) into a database anchored under /tmp,
    then join the bucketed tables WITHOUT any exchange — both sides'
    bucket layout already satisfies the join's distribution
    requirement, which is exactly how a 100 TB warehouse avoids
    re-shuffling its biggest fact table for every query. The values
    must round-trip bit-exactly through the bucketed layout; the
    oracle joins the original parquet."""
    import hashlib

    # key the location by (sf_dir, application id): a NEW session has
    # a fresh in-memory catalog, so reusing a previous session's
    # on-disk location would fail managed-table creation
    tag = (
        hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        + "_"
        + hashlib.md5(
            spark.sparkContext.applicationId.encode()
        ).hexdigest()[:8]
    )
    db = f"sg_bucket_{tag}"
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '/tmp/sg_bucket_db_{tag}'"
    )
    cust_t, ord_t = f"{db}.customer_b", f"{db}.orders_b"
    if not spark.catalog.tableExists(cust_t):
        _t(spark, sf_dir, "customer").write.bucketBy(8, "c_custkey").sortBy(
            "c_custkey"
        ).mode("overwrite").saveAsTable(cust_t)
    if not spark.catalog.tableExists(ord_t):
        _t(spark, sf_dir, "orders").write.bucketBy(8, "o_custkey").sortBy(
            "o_custkey"
        ).mode("overwrite").saveAsTable(ord_t)
    c = spark.table(cust_t)
    o = spark.table(ord_t)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )
