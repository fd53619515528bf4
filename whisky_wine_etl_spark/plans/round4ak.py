"""Round-4ak: SQL-surface items — parameterized queries and inline
VALUES dimension tables.

Registered AFTER round4aj so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query


@query(
    "sql_parameterized_query",
    """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders
WHERE o_totalprice > 250000 AND o_orderstatus = 'O'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def sql_parameterized_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (spark.sql(..., args=...)): the bind
    values never touch the SQL string — no injection surface, plans
    cacheable by shape. The oracle inlines the same constants."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_param")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders_param
        WHERE o_totalprice > :min_price AND o_orderstatus = :status
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        args={"min_price": 250000, "status": "O"},
    )


@query(
    "sql_values_inline_dim",
    """
WITH tier(status, tier_name, weight) AS (
  VALUES ('O', 'open', 1.0), ('F', 'finished', 0.5), ('P', 'pending', 0.75)
)
SELECT t.tier_name,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(o.o_totalprice * t.weight), 2) AS weighted_total
FROM orders o JOIN tier t ON t.status = o.o_orderstatus
GROUP BY t.tier_name ORDER BY t.tier_name
""",
)
def sql_values_inline_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES dimension joined to the fact table — the ad-hoc
    enrichment pattern (tier tables, feature flags, manual
    overrides) without materializing anything. The literal table is
    a LocalRelation: Catalyst broadcast-joins it for free."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_vals")
    return spark.sql(
        """
        WITH tier AS (
          SELECT * FROM VALUES ('O', 'open', 1.0), ('F', 'finished', 0.5),
                               ('P', 'pending', 0.75) AS t(status, tier_name, weight)
        )
        SELECT t.tier_name,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(o.o_totalprice * t.weight), 2) AS weighted_total
        FROM orders_vals o JOIN tier t ON t.status = o.o_orderstatus
        GROUP BY t.tier_name ORDER BY t.tier_name
        """
    )
