"""Round-4ad: period-over-period reporting deltas.

Registered AFTER round4ac so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "window_period_over_period",
    """
WITH m AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         ROUND(SUM(o_totalprice), 2) AS rev,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
),
l AS (
  SELECT month, rev, n_orders,
         LAG(rev) OVER (ORDER BY month) AS prev_rev,
         LAG(rev, 12) OVER (ORDER BY month) AS yoy_rev
  FROM m
)
SELECT month, rev, n_orders,
       ROUND((rev - prev_rev) / prev_rev, 6) AS mom_pct,
       ROUND((rev - yoy_rev) / yoy_rev, 6) AS yoy_pct
FROM l ORDER BY month
""",
)
def window_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with month-over-month and year-over-year
    deltas — the standard BI report. The fact table folds to one row
    per month first (partial-agg'd), so the lag windows run over the
    month frame only; revenue is rounded once before the ratios so
    both engines divide identical numerators. Missing comparison
    periods yield NULL, not 0."""
    o = _t(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
    ).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )
    w = Window.orderBy("month")
    l = m.select(
        "month",
        "rev",
        "n_orders",
        F.lag("rev").over(w).alias("prev_rev"),
        F.lag("rev", 12).over(w).alias("yoy_rev"),
    )
    return l.select(
        "month",
        "rev",
        "n_orders",
        F.round((F.col("rev") - F.col("prev_rev")) / F.col("prev_rev"), 6).alias(
            "mom_pct"
        ),
        F.round((F.col("rev") - F.col("yoy_rev")) / F.col("yoy_rev"), 6).alias(
            "yoy_pct"
        ),
    ).orderBy("month")
