"""Part-B relational operator suite (SURVEY.md §2 Part B).

Each query exercises one operator category over the driver's TPC-H-ish
tables, written DataFrame-first so Catalyst handles pushdown, pruning,
join selection and AQE. The paired DuckDB oracle SQL is the
correctness twin the driver runs at sf0.01.

Scale notes applied throughout:
- dimension tables (region 5, nation 25, supplier ~100) are broadcast —
  no shuffle for their joins even at 100 TB of fact data;
- aggregates are expressed as groupBy().agg() so Spark plans
  partial (map-side) + final aggregation automatically;
- double-typed outputs are rounded in-query on BOTH sides so the
  order-insensitive value hash is stable across engines;
- top-k-per-group uses a rank window, which AQE executes as a
  partial top-k per partition before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Flagship: TPC-H-Q5-shaped revenue rollup
# region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem, filter, groupBy, sort.
# ---------------------------------------------------------------------------

FLAGSHIP_ORACLE = """
SELECT n.n_name AS nation,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       COUNT(*) AS n_items
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE r.r_name IN ('ASIA', 'EUROPE')
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '2000-01-01'
GROUP BY n.n_name
"""


@query("flagship_q5_revenue_by_nation", FLAGSHIP_ORACLE)
def flagship_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    nation = _t(spark, sf_dir, "nation")
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("2000-01-01"))
    )
    lineitem = _t(spark, sf_dir, "lineitem")
    # dims broadcast: region/nation are tiny at every scale factor;
    # customer⋈orders⋈lineitem shuffle on their join keys with AQE.
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H-Q1-shaped pricing summary: wide aggregate, partial+final agg.
# ---------------------------------------------------------------------------

Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("2000-09-02"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        # 2dp, not 4/6: these sums reach ~4e9 at sf0.1 where a double
        # ulp (~5e-7) straddles a finer rounding grid — summation-order
        # ulps must stay far below the rounding grain
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "join_inner_equi",
    """
SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_totalprice > 400000
""",
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    c = _t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "join_left_outer",
    """
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
FROM customer c LEFT JOIN orders o
  ON o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
WHERE c.c_acctbal < 0
""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0)
    o = _t(spark, sf_dir, "orders")
    cond = (o.o_custkey == c.c_custkey) & (o.o_orderstatus == "F")
    return c.join(o, cond, "left").select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@query(
    "join_full_outer",
    """
SELECT n.n_nationkey, n.n_name, s.s_suppkey, s.s_name
FROM nation n FULL OUTER JOIN supplier s ON s.s_nationkey = n.n_nationkey
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    return n.join(s, s.s_nationkey == n.n_nationkey, "full").select(
        "n_nationkey", "n_name", "s_suppkey", "s_name"
    )


@query(
    "join_left_semi",
    """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
""",
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_left_anti",
    """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
""",
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_non_equi_range",
    """
SELECT p.p_partkey, p.p_name, b.bucket_name
FROM part p
JOIN (SELECT 'small' AS bucket_name, 0 AS lo, 15 AS hi
      UNION ALL SELECT 'medium', 15, 35
      UNION ALL SELECT 'large', 35, 100) b
  ON p.p_size > b.lo AND p.p_size <= b.hi
WHERE p.p_retailprice > 910
""",
)
def join_non_equi_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_retailprice") > 910)
    buckets = spark.createDataFrame(
        [("small", 0, 15), ("medium", 15, 35), ("large", 35, 100)],
        "bucket_name string, lo int, hi int",
    )
    # non-equi join against a tiny broadcast side → BNLJ, no shuffle.
    cond = (p.p_size > buckets.lo) & (p.p_size <= buckets.hi)
    return p.join(F.broadcast(buckets), cond).select("p_partkey", "p_name", "bucket_name")


@query(
    "join_asof_last_purchase",
    """
WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
     r AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase')
SELECT l.event_id, l.user_id, l.ts,
       r.event_id AS purchase_event_id,
       r.ts AS purchase_ts,
       r.value AS purchase_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
""",
)
def join_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (SURVEY.md §2 Part B 'Join — as-of'): for each error
    event, the same user's most recent purchase at or before it.
    DuckDB's native ASOF LEFT JOIN is the oracle; the Spark side is the
    tagged-union + keyed-window operator (operators/asof.py)."""
    from whisky_wine_etl_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_event_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return asof_join(
        left,
        right,
        on="ts",
        by_left="user_id",
        by_right="user_id",
        value_cols=["purchase_event_id", "purchase_ts", "purchase_value"],
    )


@query(
    "join_cross_dims",
    """
SELECT r.r_name, s.status
FROM region r
CROSS JOIN (SELECT DISTINCT o_orderstatus AS status FROM orders) s
""",
)
def join_cross_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").select("r_name")
    s = _t(spark, sf_dir, "orders").select(F.col("o_orderstatus").alias("status")).distinct()
    return r.crossJoin(s)


# ---------------------------------------------------------------------------
# Aggregation surface
# ---------------------------------------------------------------------------


@query(
    "agg_multi_key_stats",
    """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total,
       ROUND(AVG(o_totalprice), 4) AS avg_price,
       ROUND(MIN(o_totalprice), 2) AS min_price,
       ROUND(MAX(o_totalprice), 2) AS max_price,
       ROUND(STDDEV_SAMP(o_totalprice), 4) AS sd_price
FROM orders
GROUP BY o_orderstatus, o_orderpriority
""",
)
def agg_multi_key_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_price"),
    )


@query(
    "agg_count_distinct",
    """
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       COUNT(DISTINCT l_suppkey) AS n_suppliers
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    )


@query("agg_approx_count_distinct")  # HLL++ sketch — no exact oracle; rows-only check
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )


@query(
    "agg_rollup",
    """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@query(
    "agg_cube",
    """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("qty"),
    )


@query(
    "agg_grouping_sets",
    """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@query(
    "agg_median_percentile",
    """
SELECT o_orderstatus,
       ROUND(MEDIAN(o_totalprice), 4) AS median_price,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
FROM orders
GROUP BY o_orderstatus
""",
)
def agg_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact median per group (full sort within group — documented
    # 100 TB escape hatch is percentile_approx; exact kept here for
    # reference parity with pandas .median()).
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.median("o_totalprice"), 4).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@query(
    "window_ranking",
    """
SELECT c_custkey, c_nationkey, c_acctbal,
       ROW_NUMBER() OVER w AS rn,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk,
       NTILE(4) OVER w AS quartile
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
""",
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "window_lag_lead",
    """
SELECT o_custkey, o_orderkey, o_orderdate,
       LAG(o_orderkey) OVER w AS prev_order,
       LEAD(o_orderkey) OVER w AS next_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
    )


@query(
    "window_running_sum",
    """
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS running_total,
       ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
         AS moving_avg3
FROM orders
""",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 2).alias(
            "running_total"
        ),
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias("moving_avg3"),
    )


@query(
    "topk_per_group",
    """
SELECT * FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
) WHERE rn <= 3
""",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.select("c_nationkey", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "sort_limit_topk",
    """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # global top-k: Spark runs TakeOrderedAndProject — per-partition
    # top-k then a k-row merge on the driver; no full sort shuffle.
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@query(
    "setop_union_distinct",
    """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
""",
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "setop_intersect",
    """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
""",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "setop_except",
    """
SELECT n_nationkey AS nationkey FROM nation
EXCEPT
SELECT s_nationkey FROM supplier
""",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return n.exceptAll(s).distinct()


# ---------------------------------------------------------------------------
# Scalar function packs
# ---------------------------------------------------------------------------


@query(
    "func_string_pack",
    """
SELECT p_partkey,
       LOWER(p_name) AS lower_name,
       UPPER(p_brand) AS upper_brand,
       LENGTH(p_name) AS name_len,
       SUBSTRING(p_type, 1, 5) AS type_prefix,
       CONCAT(p_brand, ':', p_type) AS brand_type,
       REPLACE(p_name, ' ', '_') AS snake_name,
       TRIM(p_name) AS trimmed
FROM part
WHERE p_size <= 10
""",
)
def func_string_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lower_name"),
        F.upper("p_brand").alias("upper_brand"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake_name"),
        F.trim("p_name").alias("trimmed"),
    )


@query(
    "func_date_pack",
    """
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders
WHERE year(o_orderdate) = 1997
GROUP BY 1
""",
)
def func_date_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1997)
    return o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@query(
    "func_math_pack",
    """
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice * (1 - l_discount), 4) AS net,
       ABS(l_discount - 0.05) AS disc_dev,
       CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
       CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
       ROUND(SQRT(l_extendedprice), 4) AS price_sqrt,
       CAST(l_quantity AS INT) % 7 AS qty_mod7
FROM lineitem
WHERE l_orderkey % 100 = 0
""",
)
def func_math_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        (F.col("l_quantity").cast("int") % 7).alias("qty_mod7"),
    )


@query(
    "func_json_pack",
    """
SELECT event_id, event_type,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k_value
FROM events
WHERE event_type IN ('purchase', 'signup')
""",
)
def func_json_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type").isin("purchase", "signup"))
    return ev.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
    )


@query(
    "func_case_conditional",
    """
SELECT o_orderkey,
       CASE WHEN o_totalprice > 400000 THEN 'high'
            WHEN o_totalprice > 150000 THEN 'mid'
            ELSE 'low' END AS price_band,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_norm
FROM orders
WHERE o_orderkey % 10 = 0
""",
)
def func_case_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 400000, "high")
        .when(F.col("o_totalprice") > 150000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
    )


@query(
    "pivot_status_by_flag",
    """
SELECT l_returnflag,
       ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O,
       ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F
FROM lineitem
GROUP BY l_returnflag
""",
)
def pivot_status_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return pv.select("l_returnflag", F.col("O"), F.col("F"))


@query(
    "agg_salted_skew",
    """
SELECT l_returnflag,
       ROUND(SUM(l_extendedprice), 2) AS sum_price,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(MAX(l_discount), 2) AS max_disc
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation (operators/agg.py): 3 group keys
    over 600 k rows is exactly the value-skew shape where one reducer
    owns a third of the table; salting spreads each hot key across 16
    sub-keys, then merges 48 partial rows. Results are identical to
    the plain groupBy — the oracle proves it."""
    from whisky_wine_etl_spark.operators.agg import salted_agg

    li = _t(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        ["l_returnflag"],
        {
            "sum_price": ("sum", "l_extendedprice"),
            "n": ("count", "*"),
            "avg_qty": ("avg", "l_quantity"),
            "max_disc": ("max", "l_discount"),
        },
        salt_buckets=16,
    )
    return out.select(
        "l_returnflag",
        F.round("sum_price", 2).alias("sum_price"),
        "n",
        F.round("avg_qty", 6).alias("avg_qty"),
        F.round("max_disc", 2).alias("max_disc"),
    )


_CORRELATED_SQL = """
SELECT c.c_custkey, c.c_nationkey, ROUND(c.c_acctbal, 2) AS acctbal
FROM customer c
WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal)
                     FROM customer c2
                     WHERE c2.c_nationkey = c.c_nationkey)
"""


@query("sql_correlated_subquery", _CORRELATED_SQL)
def sql_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql() surface with a correlated scalar subquery —
    Catalyst decorrelates it into an aggregate + join (no per-row
    re-execution; the same text runs on DuckDB as the oracle)."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_CORRELATED_SQL)


@query(
    "func_array_pack",
    """
SELECT vec_id,
       CAST(len(embedding) AS INT) AS dim,
       ROUND(SQRT(list_aggregate(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 4) AS l2_norm,
       ROUND(CAST(list_max(embedding) AS DOUBLE), 4) AS max_val,
       ROUND(CAST(list_min(embedding) AS DOUBLE), 4) AS min_val,
       ROUND(list_aggregate(list_transform(embedding[1:8],
             x -> CAST(x AS DOUBLE)), 'sum'), 4) AS head8_sum
FROM embeddings
""",
)
def func_array_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function pack over the embedding column: size, aggregate
    (fold), transform, array_min/max, slice — the building blocks the
    similarity operators compose."""
    e = _t(spark, sf_dir, "embeddings")
    v = F.expr("transform(embedding, x -> cast(x as double))")
    sq = F.aggregate(
        F.expr("transform(embedding, x -> cast(x as double) * cast(x as double))"),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.round(F.sqrt(sq), 4).alias("l2_norm"),
        F.round(F.array_max(v), 4).alias("max_val"),
        F.round(F.array_min(v), 4).alias("min_val"),
        F.round(
            F.aggregate(F.slice(v, 1, 8), F.lit(0.0), lambda a, x: a + x), 4
        ).alias("head8_sum"),
    )


@query(
    "func_map_pack",
    """
SELECT event_id,
       json_keys(props)[1] AS first_key,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
       CAST(len(json_keys(props)) AS INT) AS n_keys,
       json_extract(props, '$.k') IS NOT NULL AS has_k
FROM events
""",
)
def func_map_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-function pack: parse events.props into map<string,int>,
    then map_keys / element_at / size / map_contains_key."""
    ev = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.map_keys(m).getItem(0).alias("first_key"),
        m.getItem("k").alias("k_value"),
        F.size(F.map_keys(m)).cast("int").alias("n_keys"),
        F.map_contains_key(m, "k").alias("has_k"),
    )


@query(
    "setop_union_all",
    """
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 450000
UNION ALL
SELECT c_custkey FROM customer WHERE c_acctbal < -900
""",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000).select(
        F.col("o_custkey").alias("custkey")
    )
    b = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") < -900).select(
        F.col("c_custkey").alias("custkey")
    )
    return a.unionAll(b)


@query(
    "setop_except_all",
    """
SELECT l_orderkey AS okey FROM lineitem WHERE l_quantity > 49
EXCEPT ALL
SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 49
""",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference — keeps duplicate multiplicity, unlike
    EXCEPT (distinct); Spark's exceptAll ≡ SQL EXCEPT ALL."""
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 49).select(F.col("l_orderkey").alias("okey"))
    b = (
        li.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 49))
        .select(F.col("l_orderkey").alias("okey"))
    )
    return a.exceptAll(b)


@query(
    "setop_intersect_all",
    """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_totalprice > 200000
""",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_totalprice") > 200000).select(F.col("o_custkey").alias("custkey"))
    return a.intersectAll(b)


@query(
    "unpivot_order_measures",
    """
SELECT o_orderkey, measure, ROUND(val, 2) AS val
FROM (SELECT o_orderkey, ROUND(o_totalprice, 2) AS total_price,
             CAST(o_custkey AS DOUBLE) AS cust_key
      FROM orders WHERE o_totalprice > 450000)
UNPIVOT (val FOR measure IN (total_price, cust_key))
""",
)
def unpivot_order_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt): one row per (orderkey, measure)."""
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            F.col("o_custkey").cast("double").alias("cust_key"),
        )
    )
    return o.unpivot(
        ids=["o_orderkey"],
        values=["total_price", "cust_key"],
        variableColumnName="measure",
        valueColumnName="val",
    ).select("o_orderkey", "measure", F.round("val", 2).alias("val"))


@query(
    "agg_mode_percentile_cont",
    """
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
       ROUND(quantile_cont(l_extendedprice, 0.75)
             - quantile_cont(l_extendedprice, 0.25), 4) AS iqr,
       CAST(min(l_linenumber) AS INT) AS min_line
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_mode_percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (interpolated) per group — Spark's
    percentile() is the exact sort-based aggregate; percentile_approx
    is the documented 100 TB escape hatch (rows-only checkable)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("l_extendedprice", F.lit(0.75)), 4).alias("p75"),
        F.round(
            F.percentile("l_extendedprice", F.lit(0.75))
            - F.percentile("l_extendedprice", F.lit(0.25)),
            4,
        ).alias("iqr"),
        F.min("l_linenumber").cast("int").alias("min_line"),
    )


@query(
    "window_range_frame_1h",
    """
WITH e AS (SELECT user_id, value, ts,
                  CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
           FROM events)
SELECT user_id, ts_sec, ROUND(value, 2) AS value,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
       ROUND(SUM(value) OVER w, 4) AS sum_last_hour
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
""",
)
def window_range_frame_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame keyed on event-time seconds: per user, the rolling
    1-hour count/sum ending at each event — a range (value-based)
    frame, not a rows frame; both engines order on integer epoch
    seconds so the frame contents match exactly."""
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "value", F.col("ts").cast("long").alias("ts_sec")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-3600, W.currentRow)
    )
    return e.select(
        "user_id",
        "ts_sec",
        F.round("value", 2).alias("value"),
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.round(F.sum("value").over(w), 4).alias("sum_last_hour"),
    )


@query(
    "window_first_nth_value",
    """
SELECT event_id, user_id,
       ROUND(FIRST_VALUE(value) OVER w, 2) AS first_val,
       ROUND(NTH_VALUE(value, 3) OVER w, 2) AS third_val,
       ROUND(LAST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS last_val
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def window_first_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/nth/last_value navigation with explicit ROWS frames and a
    unique (ts, event_id) ordering so both engines agree exactly."""
    ev = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_full = (
        W.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.first("value").over(w), 2).alias("first_val"),
        F.round(F.nth_value("value", 3).over(w), 2).alias("third_val"),
        F.round(F.last("value").over(w_full), 2).alias("last_val"),
    )


@query(
    "func_explode_pos",
    """
SELECT e.vec_id, CAST(i.i - 1 AS INT) AS pos,
       ROUND(CAST(e.embedding[i.i] AS DOUBLE), 4) AS val
FROM embeddings e,
     LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) i(i)
WHERE e.vec_id < 50 AND CAST(e.embedding[i.i] AS DOUBLE) > 0.2
""",
)
def func_explode_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-generating explode with position (lateral-view / UDTF
    shape): one output row per array element, filtered post-explode."""
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    return (
        e.select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .withColumn("val", F.col("val").cast("double"))
        .filter(F.col("val") > 0.2)
        .select("vec_id", F.col("pos").cast("int").alias("pos"), F.round("val", 4).alias("val"))
    )


@query(
    "window_pct_rank_cume",
    """
SELECT o_orderkey, o_orderpriority,
       ROUND(percent_rank() OVER w, 6) AS pct_rank,
       ROUND(cume_dist() OVER w, 6) AS cume,
       CAST(ntile(10) OVER w AS INT) AS decile
FROM orders
WHERE o_orderkey < 2000
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
""",
)
def window_pct_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position window functions (percent_rank, cume_dist,
    ntile) — one shuffle on the partition key, sort within."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(10).over(w).cast("int").alias("decile"),
    )


@query(
    "agg_conditional_bool_bits",
    """
SELECT l_returnflag,
       CAST(count_if(l_quantity > 25) AS BIGINT) AS n_bulk,
       bool_and(l_extendedprice > 0) AS all_positive,
       bool_or(l_discount > 0.09) AS any_deep_discount,
       CAST(bit_and(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS lines_bit_and,
       CAST(bit_or(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS lines_bit_or,
       CAST(bit_xor(CAST(l_orderkey AS BIGINT)) AS BIGINT) AS keys_bit_xor,
       string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_conditional_bool_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional / boolean / bitwise aggregates + ordered string_agg
    (expressed as sort-then-join over collect_set so the result is
    deterministic under any partitioning)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_quantity") > 25).alias("n_bulk"),
        F.bool_and(F.col("l_extendedprice") > 0).alias("all_positive"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        F.bit_and(F.col("l_linenumber").cast("bigint")).alias("lines_bit_and"),
        F.bit_or(F.col("l_linenumber").cast("bigint")).alias("lines_bit_or"),
        F.bit_xor(F.col("l_orderkey").cast("bigint")).alias("keys_bit_xor"),
        F.array_join(F.array_sort(F.collect_set("l_linestatus")), ",").alias("statuses"),
    )


@query(
    "stat_crosstab_priority_status",
    """
SELECT o_orderpriority AS o_orderpriority_o_orderstatus,
       CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS F,
       CAST(count_if(o_orderstatus = 'O') AS BIGINT) AS O,
       CAST(count_if(o_orderstatus = 'P') AS BIGINT) AS P
FROM orders
GROUP BY o_orderpriority
""",
)
def stat_crosstab_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame stat API surface: contingency table via
    df.stat.crosstab (one shuffle; column per distinct value —
    bounded-cardinality dimension required, as with any pivot)."""
    return _t(spark, sf_dir, "orders").stat.crosstab("o_orderpriority", "o_orderstatus")


@query("agg_approx_percentile")  # sketch-based → rows-only driver check
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (KLL-style sketch, single pass, mergeable
    partials) — the 100 TB path for quantiles; exact percentile needs
    a per-group sort. Accuracy vs exact is pinned in tests (the
    `accuracy` argument bounds rank error, here 1/10000)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.expr("approx_percentile(l_extendedprice, 0.5, 10000)"), 4
        ).alias("p50_approx"),
        F.round(
            F.expr("approx_percentile(l_extendedprice, 0.99, 10000)"), 4
        ).alias("p99_approx"),
    )


@query(
    "agg_stats_corr_regr",
    """
SELECT l_returnflag,
       ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS covar_s,
       ROUND(covar_pop(l_quantity, l_extendedprice), 4) AS covar_p,
       ROUND(stddev_samp(l_extendedprice), 4) AS sd_price,
       ROUND(var_samp(l_quantity), 6) AS var_qty,
       ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
       ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_stats_corr_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: correlation, covariance, variance, and
    the SQL:2003 linear-regression family — all single-pass
    partial+final aggregates (each is a handful of running moments),
    so they cost the same one shuffle as a SUM at any scale."""
    li = _t(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr(q, p), 6).alias("corr_qty_price"),
        F.round(F.covar_samp(q, p), 4).alias("covar_s"),
        F.round(F.covar_pop(q, p), 4).alias("covar_p"),
        F.round(F.stddev_samp(p), 4).alias("sd_price"),
        F.round(F.var_samp(q), 6).alias("var_qty"),
        F.round(F.regr_slope(p, q), 6).alias("slope"),
        F.round(F.regr_intercept(p, q), 4).alias("intercept"),
        F.round(F.regr_r2(p, q), 6).alias("r2"),
        F.regr_count(p, q).alias("n_pairs"),
    )


@query(
    "q3_shipping_priority",
    """
SELECT l.l_orderkey,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND l.l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3 shape: selective dim filter → two fact joins → groupBy
    → global top-k. The ORDER BY + LIMIT plans as TakeOrderedAndProject
    (per-partition top-k, then a k-row driver merge — never a full
    sort of the aggregate)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1997-01-01"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1997-01-01"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q7_nation_volume",
    """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS l_year,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS volume,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM supplier s
JOIN lineitem l ON l.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE n1.n_name IN ('NATION_1', 'NATION_2') AND n2.n_name IN ('NATION_1', 'NATION_2')
  AND n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
""",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7 shape: bidirectional nation-pair trade volume — two
    broadcast dim joins against the same (filtered) nation table under
    different aliases, plus the 3-fact join chain."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    nations = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    n1 = nations.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = nations.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("volume"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
