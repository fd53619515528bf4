"""Round-4z: union of two independent file streams under one
windowed aggregation, percent-of-parent reporting rollup, and
two-step Huber IRLS robust regression.

Registered AFTER round4y so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.
"""

from __future__ import annotations

import glob
import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query
from whisky_wine_etl_spark.streaming import pipelines as sp


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Two independent landing zones (split by event family) → two file
# streams → ONE union → one watermarked tumbling aggregation. The
# union of streams must behave exactly like a single source: shared
# watermark (the MIN across inputs), shared state, one result. This
# is the fan-in topology of every multi-region ingest.
# ---------------------------------------------------------------------------


@query(
    "stream_union_two_sources",
    """
SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS wend,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 4) AS sum_value
FROM events
GROUP BY 1, 2, 3
""",
)
def stream_union_two_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split events into transactional (signup/purchase) and
    behavioral (everything else) landing dirs, stream each, union,
    and run the SAME tumbling aggregation stream_tumbling_1h runs on
    the single source. Equality with that oracle proves the fan-in
    preserved every row and the unioned watermark semantics dropped
    nothing. Complete output mode — every window emitted."""
    tag = (
        hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        + "_"
        + hashlib.md5(spark.sparkContext.applicationId.encode()).hexdigest()[:8]
    )
    root = os.path.join(tempfile.gettempdir(), f"sg_union2_{tag}")
    a_dir, b_dir = os.path.join(root, "a"), os.path.join(root, "b")
    if not (os.path.isdir(a_dir) and os.path.isdir(b_dir)):
        shutil.rmtree(root, ignore_errors=True)
        ev = _t(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        is_txn = F.col("event_type").isin("signup", "purchase")
        ev.filter(is_txn).write.mode("overwrite").parquet(a_dir)
        ev.filter(~is_txn).write.mode("overwrite").parquet(b_dir)
    sa = sp.file_events_stream(spark, a_dir)
    sb = sp.file_events_stream(spark, b_dir)
    agg = sp.tumbling_counts(sa.unionByName(sb))
    return sp.run_to_memory(spark, agg, "complete")


# ---------------------------------------------------------------------------
# Percent-of-parent rollup: revenue by nation with each nation's
# share of its region and each region's share of the total — the
# standard drill-down report. One fact shuffle builds the leaf level;
# the two parent levels are windows over the 25-row result.
# ---------------------------------------------------------------------------


@query(
    "agg_pct_of_parent",
    """
WITH leaf AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY r.r_name, n.n_name
)
SELECT region, nation, revenue,
       ROUND(revenue / SUM(revenue) OVER (PARTITION BY region), 6) AS pct_of_region,
       ROUND(SUM(revenue) OVER (PARTITION BY region)
             / SUM(revenue) OVER (), 6) AS region_pct_of_total
FROM leaf ORDER BY region, nation
""",
)
def agg_pct_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drill-down shares at two hierarchy levels from ONE leaf
    aggregate — the parent totals are windows over the nation frame
    (25 rows), never a second pass over the fact table. Leaf revenue
    is rounded once before the ratios so both engines divide
    identical numerators."""
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    leaf = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.round(F.sum("rev"), 2).alias("revenue"))
    )
    wreg = Window.partitionBy("region")
    wall = Window.partitionBy()
    return leaf.select(
        "region",
        "nation",
        "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(wreg), 6).alias(
            "pct_of_region"
        ),
        F.round(
            F.sum("revenue").over(wreg) / F.sum("revenue").over(wall), 6
        ).alias("region_pct_of_total"),
    ).orderBy("region", "nation")


# ---------------------------------------------------------------------------
# Huber-loss robust regression, two IRLS refits unrolled. Iteration 0
# is plain OLS; each refit reweights rows by w = min(1, δ/|resid|)
# and solves the weighted normal equations. Every pass is one
# partial-agg'd scan + a 1-row broadcast of the previous model —
# k refits cost k scans, no driver-side data.
# ---------------------------------------------------------------------------

_DELTA = 2.0


def _huber_sql() -> str:
    # data: x = items per order, y = order price (k$)
    return f"""
WITH d AS (
  SELECT o.o_totalprice / 1000 AS y, CAST(COUNT(*) AS DOUBLE) AS x
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_totalprice
),
s0 AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM d
),
m0 AS (
  SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
         (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS a
  FROM s0
),
w1 AS (
  SELECT d.x, d.y,
         LEAST(1.0, {_DELTA} / GREATEST(ABS(d.y - (m0.a + m0.b * d.x)), 1e-12)) AS w
  FROM d, m0
),
s1 AS (
  SELECT SUM(w) AS n, SUM(w * x) AS sx, SUM(w * y) AS sy,
         SUM(w * x * x) AS sxx, SUM(w * x * y) AS sxy,
         CAST(SUM(CASE WHEN w < 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_down
  FROM w1
),
m1 AS (
  SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
         (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS a,
         n_down
  FROM s1
),
w2 AS (
  SELECT d.x, d.y,
         LEAST(1.0, {_DELTA} / GREATEST(ABS(d.y - (m1.a + m1.b * d.x)), 1e-12)) AS w
  FROM d, m1
),
s2 AS (
  SELECT SUM(w) AS n, SUM(w * x) AS sx, SUM(w * y) AS sy,
         SUM(w * x * x) AS sxx, SUM(w * x * y) AS sxy,
         CAST(SUM(CASE WHEN w < 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_down
  FROM w2
),
m2 AS (
  SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
         (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS a,
         n_down
  FROM s2
)
SELECT 0 AS iter, ROUND((SELECT b FROM m0), 6) AS slope,
       ROUND((SELECT a FROM m0), 6) AS intercept,
       CAST(0 AS BIGINT) AS n_downweighted
UNION ALL
SELECT 1, ROUND(b, 6), ROUND(a, 6), n_down FROM m1
UNION ALL
SELECT 2, ROUND(b, 6), ROUND(a, 6), n_down FROM m2
ORDER BY iter
"""


@query("ml_huber_irls2", _huber_sql())
def ml_huber_irls2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huber robust line fit (δ=2 k$), two unrolled IRLS refits.

    Per refit: broadcast the 1-row model, recompute weights in the
    scan projection, partial-agg the five weighted moments. Nothing
    iterative on the driver, nothing cached — at 100 TB each refit
    is a single map+reduce over the fact join, and k refits are an
    embarrassingly sequential k-stage pipeline."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    d = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
        .select((F.col("o_totalprice") / 1000).alias("y"), "x")
    )

    def ols_stats(df: DataFrame, w=None) -> DataFrame:
        wcol = F.lit(1.0) if w is None else F.col(w)
        aggs = [
            F.sum(wcol).alias("n"),
            F.sum(wcol * F.col("x")).alias("sx"),
            F.sum(wcol * F.col("y")).alias("sy"),
            F.sum(wcol * F.col("x") * F.col("x")).alias("sxx"),
            F.sum(wcol * F.col("x") * F.col("y")).alias("sxy"),
        ]
        if w is not None:
            aggs.append(
                F.sum(F.when(wcol < 1.0, 1).otherwise(0))
                .cast("bigint")
                .alias("n_down")
            )
        return df.agg(*aggs)

    def model(stats: DataFrame) -> DataFrame:
        b = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
            F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
        )
        cols = [b.alias("b"), ((F.col("sy") - b * F.col("sx")) / F.col("n")).alias("a")]
        if "n_down" in stats.columns:
            cols.append(F.col("n_down"))
        return stats.select(*cols)

    def reweight(m: DataFrame) -> DataFrame:
        resid = F.abs(F.col("y") - (F.col("a") + F.col("b") * F.col("x")))
        return d.crossJoin(F.broadcast(m.select("a", "b"))).select(
            "x",
            "y",
            F.least(F.lit(1.0), _DELTA / F.greatest(resid, F.lit(1e-12))).alias("w"),
        )

    m0 = model(ols_stats(d))
    m1 = model(ols_stats(reweight(m0), "w"))
    m2 = model(ols_stats(reweight(m1), "w"))

    def row(m: DataFrame, it: int, with_down: bool) -> DataFrame:
        return m.select(
            F.lit(it).alias("iter"),
            F.round("b", 6).alias("slope"),
            F.round("a", 6).alias("intercept"),
            (F.col("n_down") if with_down else F.lit(0))
            .cast("bigint")
            .alias("n_downweighted"),
        )

    return (
        row(m0, 0, False)
        .unionByName(row(m1, 1, True))
        .unionByName(row(m2, 2, True))
        .orderBy("iter")
    )
