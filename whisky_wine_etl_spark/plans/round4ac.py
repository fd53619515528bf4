"""Round-4ac: DAU/WAU/MAU engagement ladder and the GROUP BY ALL
SQL-surface item.

Registered AFTER round4ab so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.materialize import materialize
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# DAU / WAU / MAU + stickiness per day, computed EXACTLY without a
# rolling-distinct window: the deduped (user, day) frame explodes
# each activity day into the k future days it keeps the user "active"
# for (7 for WAU, 30 for MAU), then one distinct+groupBy per horizon.
# Linear blowup (7× / 30× of user-DAYS, already tiny vs events),
# everything partial-agg'd — the scalable form of trailing distinct
# counts.
# ---------------------------------------------------------------------------


@query(
    "events_dau_wau_mau",
    """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
grid AS (SELECT DISTINCT d FROM ud),
wau_pairs AS (
  SELECT DISTINCT ud.user_id, ud.d + CAST(k.k AS INTEGER) AS d
  FROM ud, (SELECT unnest(range(0, 7)) AS k) k(k)
),
mau_pairs AS (
  SELECT DISTINCT ud.user_id, ud.d + CAST(k.k AS INTEGER) AS d
  FROM ud, (SELECT unnest(range(0, 30)) AS k) k(k)
),
dau AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY d),
wau AS (
  SELECT g.d, CAST(COUNT(*) AS BIGINT) AS wau
  FROM wau_pairs w JOIN grid g ON g.d = w.d GROUP BY g.d
),
mau AS (
  SELECT g.d, CAST(COUNT(*) AS BIGINT) AS mau
  FROM mau_pairs m JOIN grid g ON g.d = m.d GROUP BY g.d
)
SELECT dau.d, dau.dau, wau.wau, mau.mau,
       ROUND(CAST(dau.dau AS DOUBLE) / mau.mau, 6) AS stickiness
FROM dau JOIN wau ON wau.d = dau.d JOIN mau ON mau.d = dau.d
ORDER BY dau.d
""",
)
def events_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engagement ladder: daily actives, trailing-7 and
    trailing-30 actives, DAU/MAU stickiness — per activity day.

    No per-day rolling COUNT(DISTINCT) (unsupported as a window, and
    a set-union per row at scale); instead each (user, day) emits
    its k-day activity shadow and each horizon is ONE distinct + ONE
    groupBy. Exact, partial-agg'd, and the blowup is bounded by
    horizon × user-days. Edge days (shadows past the last observed
    day) are clipped by the grid join so every reported day has a
    complete window."""
    ev = _t(spark, sf_dir, "events")
    # r12: ud feeds the grid, the DAU aggregate and both trailing
    # shadows — materialize the (user, day) distinct once instead of
    # once per consumer (guide §2.4)
    ud = (
        ev.select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
        # r13: eager=False + policy tier ((user, day) frame is
        # fact-scale); the final collect materializes it
        .transform(lambda d: materialize(d, fact_scale=True))
    )
    grid = ud.select("d").distinct()

    def trailing(horizon: int, name: str) -> DataFrame:
        pairs = (
            ud.select(
                "user_id",
                F.explode(
                    F.expr(f"transform(sequence(0, {horizon - 1}), k -> date_add(d, k))")
                ).alias("d"),
            )
            .distinct()
        )
        return (
            pairs.join(grid, "d")
            .groupBy("d")
            .agg(F.count(F.lit(1)).cast("bigint").alias(name))
        )

    dau = ud.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
    wau = trailing(7, "wau")
    mau = trailing(30, "mau")
    return (
        dau.join(wau, "d")
        .join(mau, "d")
        .select(
            "d",
            "dau",
            "wau",
            "mau",
            F.round(F.col("dau") / F.col("mau"), 6).alias("stickiness"),
        )
        .orderBy("d")
    )


# ---------------------------------------------------------------------------
# GROUP BY ALL — group by every non-aggregate select item. Both
# engines support the clause; the query pins that Spark's resolution
# picks exactly the two dimension columns.
# ---------------------------------------------------------------------------


@query(
    "sql_group_by_all",
    """
SELECT o_orderpriority, o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders
GROUP BY ALL
ORDER BY o_orderpriority, o_orderstatus
""",
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (Spark 3.4+/DuckDB): the grouping key list is
    inferred from the non-aggregate select items — same plan as the
    explicit GROUP BY, pinned by the oracle equality."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gba")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders_gba
        GROUP BY ALL
        ORDER BY o_orderpriority, o_orderstatus
        """
    )
