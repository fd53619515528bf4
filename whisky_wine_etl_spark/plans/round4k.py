"""Round-4k additions: distributed OLS via centered normal equations,
duration-capped sessionization, and a dynamic (values-inferred) pivot.

Registered AFTER round4j (plans.load_all imports this module last) so
the driver's unverified-first ordering keeps the earlier backlog in
the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Two-feature OLS by centered normal equations — the distributed
# "model fit as an aggregate" pattern: two algebraic passes (means,
# then centered cross-moments), a closed-form 2×2 solve, zero
# driver-side data movement. regr_slope (already registered) is the
# 1-feature case; this is the multi-feature generalization a feature
# pipeline actually runs.
# ---------------------------------------------------------------------------


@query(
    "ml_ols_normal_eq",
    """
WITH d AS (
  SELECT l_quantity AS x1, l_discount AS x2, l_extendedprice AS y
  FROM lineitem
),
m AS (
  SELECT AVG(x1) AS m1, AVG(x2) AS m2, AVG(y) AS my,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM d
),
s AS (
  SELECT ANY_VALUE(n) AS n, ANY_VALUE(m1) AS m1, ANY_VALUE(m2) AS m2,
         ANY_VALUE(my) AS my,
         SUM((x1 - m1) * (x1 - m1)) AS s11,
         SUM((x1 - m1) * (x2 - m2)) AS s12,
         SUM((x2 - m2) * (x2 - m2)) AS s22,
         SUM((x1 - m1) * (y - my)) AS s1y,
         SUM((x2 - m2) * (y - my)) AS s2y,
         SUM((y - my) * (y - my)) AS syy
  FROM d CROSS JOIN m
)
SELECT n,
       ROUND((s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12), 6) AS b1,
       ROUND((s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12), 6) AS b2,
       ROUND(my - (s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12) * m1
                - (s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12) * m2, 4)
         AS b0,
       ROUND(((s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12) * s1y
            + (s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12) * s2y) / syy, 6)
         AS r2
FROM s
""",
)
def ml_ols_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS fit y = b0 + b1·x1 + b2·x2 (extended price from quantity
    and discount) solved in closed form from centered cross-moments:
    pass 1 computes the three means, pass 2 the five centered sums
    (both algebraic, map-side combinable; the means arrive via a
    1-row broadcast cross join), then Cramer's rule on the 2×2 normal
    system plus R² = (b1·S1y + b2·S2y)/Syy. Centering first keeps the
    determinant cancellation-free (raw-moment normal equations lose
    ~8 digits here), which is what lets a 6-dp rounding agree across
    engines despite float summation order."""
    d = _t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("x1"),
        F.col("l_discount").alias("x2"),
        F.col("l_extendedprice").alias("y"),
    )
    m = d.agg(
        F.avg("x1").alias("m1"),
        F.avg("x2").alias("m2"),
        F.avg("y").alias("my"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    c = d.crossJoin(F.broadcast(m))
    dx1, dx2, dy = (
        F.col("x1") - F.col("m1"),
        F.col("x2") - F.col("m2"),
        F.col("y") - F.col("my"),
    )
    s = c.agg(
        F.any_value("n").alias("n"),
        F.any_value("m1").alias("m1"),
        F.any_value("m2").alias("m2"),
        F.any_value("my").alias("my"),
        F.sum(dx1 * dx1).alias("s11"),
        F.sum(dx1 * dx2).alias("s12"),
        F.sum(dx2 * dx2).alias("s22"),
        F.sum(dx1 * dy).alias("s1y"),
        F.sum(dx2 * dy).alias("s2y"),
        F.sum(dy * dy).alias("syy"),
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    b1 = (F.col("s22") * F.col("s1y") - F.col("s12") * F.col("s2y")) / det
    b2 = (F.col("s11") * F.col("s2y") - F.col("s12") * F.col("s1y")) / det
    return s.select(
        "n",
        F.round(b1, 6).alias("b1"),
        F.round(b2, 6).alias("b2"),
        F.round(F.col("my") - b1 * F.col("m1") - b2 * F.col("m2"), 4).alias("b0"),
        F.round((b1 * F.col("s1y") + b2 * F.col("s2y")) / F.col("syy"), 6).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Duration-capped sessionization — the production variant of
# events_sessionize: a session ends after 30 min of inactivity OR
# when it reaches the 4 h duration cap (billing/abuse systems cap
# sessions so a lingering heartbeat can't make one span days).
# ---------------------------------------------------------------------------


@query(
    "events_sessionize_capped",
    """
WITH o AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                OR lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, event_id, us,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY us, event_id
                             ROWS UNBOUNDED PRECEDING) AS gap_no
  FROM o
),
c AS (
  SELECT user_id, gap_no, us,
         (us - MIN(us) OVER (PARTITION BY user_id, gap_no))
           // 14400000000 AS chunk
  FROM s
)
SELECT user_id,
       CAST(gap_no AS INT) AS gap_session,
       CAST(chunk AS INT) AS cap_chunk,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST((MAX(us) - MIN(us)) // 1000000 AS BIGINT) AS duration_sec
FROM c
GROUP BY user_id, gap_no, chunk
""",
)
def events_sessionize_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (30 min inactivity, exact-µs comparison)
    split further into 4 h duration chunks measured from each gap
    session's first event. Three window passes — lag, running start
    count, per-session min — all over the SAME (user_id) hash
    exchange (the later windows only refine the partition key, so
    Spark reuses the shuffle), then one aggregate. All arithmetic is
    integer microseconds: no float parity surface."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    prev = F.lag("us").over(w)
    is_start = F.when(prev.isNull() | ((F.col("us") - prev) > 1_800_000_000), 1).otherwise(0)
    s = e.withColumn(
        "gap_no", F.sum(is_start).over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    ws = W.partitionBy("user_id", "gap_no")
    c = s.withColumn(
        "chunk",
        ((F.col("us") - F.min("us").over(ws)) / F.lit(14_400_000_000)).cast("bigint"),
    )
    return c.groupBy(
        "user_id",
        F.col("gap_no").cast("int").alias("gap_session"),
        F.col("chunk").cast("int").alias("cap_chunk"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        ((F.max("us") - F.min("us")) / F.lit(1_000_000))
        .cast("bigint")
        .alias("duration_sec"),
    )


# ---------------------------------------------------------------------------
# Dynamic pivot — pivot() WITHOUT a hard-coded value list: Spark runs
# the distinct-values job first, then plans the pivot aggregate over
# the discovered columns. The static-values form is already
# registered (pivot_status_by_flag); this exercises the
# schema-inferred path real BI layers use.
# ---------------------------------------------------------------------------


@query(
    "pivot_dynamic_priority",
    """
SELECT o_orderstatus,
       ROUND(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END), 2)
         AS "1-URGENT",
       ROUND(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END), 2)
         AS "2-HIGH",
       ROUND(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice END), 2)
         AS "3-MEDIUM",
       ROUND(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_totalprice END), 2)
         AS "4-NOT SPECIFIED",
       ROUND(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END), 2)
         AS "5-LOW"
FROM orders
GROUP BY o_orderstatus
""",
)
def pivot_dynamic_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue pivoted to one column per order priority with the
    value list INFERRED (pivot() with no values argument): Spark
    first runs a distinct job on the pivot column (bounded by
    spark.sql.pivotMaxValues), then compiles the same single-pass
    conditional aggregation the static form uses — two jobs, still
    one shuffle over the fact. The oracle hard-codes the CASE
    columns, pinning both the discovered column set and the values."""
    o = _t(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority")
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    return p
