"""TPC-H-shaped analytical queries beyond Q1/Q3/Q5/Q7 (which live in
plans/relational.py): the remaining classic plan shapes — EXISTS /
NOT-EXISTS semi-antis, pure-pushdown scans, conditional aggregation,
scalar-subquery joins, HAVING join-backs. The testdata lacks partsupp
and a few columns (l_shipmode, c_phone), so each query keeps the
REFERENCE SHAPE on the columns that exist; parameters were picked so
every query returns a non-trivial result at sf0.01.

Scale notes per query are in the docstrings; the shared posture:
explicit broadcast hints ONLY on constant-size frames — nation (25
rows), region (5 rows), and 1-row scalar aggregates. part, customer
and supplier scale linearly with SF in this corpus (part = 200k·sf,
customer = 150k·sf, supplier = 10k·sf — verified in /root/testdata),
so hinting them would ship billions of rows to every executor at the
100 TB target; they carry NO hint and AQE broadcasts them while they
measure small, shuffling once they don't (the flagship-q5 pattern in
plans/relational.py). Fact-fact joins shuffle on their keys under
AQE; every filter lands on the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.functions.rounding import pinned
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "q4_priority_exists",
    """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
""",
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS over the fact table → LEFT SEMI join with a
    non-equi residual (l_shipdate > o_orderdate). The semi join
    shuffles both sides on orderkey once; the date filter prunes the
    orders scan before the exchange."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    shipped_late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return shipped_late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "q6_revenue_forecast",
    """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: the pure filter-scan-aggregate. Everything pushes to
    the parquet scan (date + discount + quantity predicates), one
    partial+final agg, zero joins — the query whose whole cost is I/O
    at 100 TB, and the canonical pushdown check."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q12_priority_by_returnflag",
    """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate AND l_shipdate < TIMESTAMP '1999-01-01'
GROUP BY l_returnflag
""",
)
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: fact-fact join + two-way conditional aggregation
    (CASE inside SUM). One orderkey shuffle, map-side partial aggs;
    the priority split never materializes separate branches."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") < F.lit("1999-01-01"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, (li.l_orderkey == o.o_orderkey) & (li.l_shipdate >= o.o_orderdate))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@query(
    "q14_promo_revenue_share",
    """
SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
""",
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: fact⋈dim with a conditional-revenue ratio. `part`
    scales with SF (200k·sf rows), so it carries NO broadcast hint —
    AQE broadcasts it while small and shuffles the partkey join once
    it isn't; the ratio is one partial+final agg either way."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-07-01"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 6).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q15_top_supplier",
    """
WITH rev AS (
  -- pinned rounding (r8 audit rule 3): revenue sums of 4-dp products
  -- land EXACTLY on 2-dp halves (measured at sf0.01), where engine
  -- round rules split — and here the value also feeds the =MAX gate
  SELECT l_suppkey,
         FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100 + 0.5)
           / 100 AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: aggregate view + scalar-subquery equality (the max
    joins back as a broadcast 1-row frame — the ONE hint here, safe
    because a scalar aggregate is 1 row at every SF; supplier itself
    scales with SF and is unhinted). The equality invariant: each
    engine compares its OWN round(sum,2) values against the max of
    those same values, so no cross-engine double comparison happens —
    but that is only sound if both sides of the equality read ONE
    materialized aggregation. persist() is not a guarantee (an evicted
    cache recomputes, and two independent float-sum orders can differ
    by an ulp and straddle a rounding boundary), so rev is
    localCheckpoint'ed: both the max and the filter scan the same
    materialized rows, making the equality exact by construction at
    any scale. max_by was considered and rejected — it returns one
    winner, while Q15's contract (and the oracle) keeps ALL tied
    top suppliers. Checkpoint size is one row per active supplier."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-07-01"))
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            pinned(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
        .localCheckpoint(eager=True)
    )
    top = rev.agg(F.max("total_revenue").alias("__top"))
    s = _t(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("__top"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q16_supplier_variety",
    """
SELECT p_brand, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
""",
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: NOT IN exclusion (→ LEFT ANTI against the
    excluded-supplier frame) + count-distinct per dim group. Both
    `bad` (supplier-derived, 10k·sf rows) and `part` (200k·sf) scale
    with SF, so neither is hinted — AQE broadcasts them while small.
    lineitem shuffles once for the distinct agg."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q18_large_orders",
    """
SELECT c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       ROUND(big.sum_qty, 2) AS sum_qty
FROM orders o
JOIN customer ON c_custkey = o_custkey
JOIN (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 150) big ON big.l_orderkey = o.o_orderkey
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: HAVING-filtered fact aggregate joined back to its
    parents. Quantities are whole numbers, so the HAVING threshold
    compares exact sums (no rounding ambiguity); the big-orders frame
    shrinks to a small fraction of orders, and AQE broadcasts it into
    the join-back."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round("sum_qty", 2).alias("sum_qty"),
        )
    )


@query(
    "q22_idle_customers",
    """
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM customer, (SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0) cut
WHERE c_acctbal > cut.ab
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_mktsegment
""",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: scalar aggregate threshold (broadcast 1-row cross
    join) + NOT EXISTS (→ LEFT ANTI on custkey) + final rollup.
    The anti join is the only shuffle; the average-balance cutoff
    never leaves the executors as more than one row."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= F.lit("1999-01-01"))
    cut = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    return (
        c.crossJoin(F.broadcast(cut))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "q8_market_share",
    """
SELECT o_year,
       ROUND(SUM(CASE WHEN nation = 'NATION_2' THEN volume ELSE 0 END)
             / SUM(volume), 6) AS mkt_share
FROM (SELECT YEAR(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part, lineitem, supplier, orders, customer,
           nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
        AND p_type = 'PROMO') all_nations
GROUP BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: the deepest dim snowflake in TPC-H — fact lineitem
    joined to part, supplier, orders, customer, two nation roles and
    region, then a conditional-share ratio per year. Hints ONLY on
    the constant-size tables (nation = 25 rows, region = 5, as two
    independent broadcasts of nation — never a self-join shuffle).
    part/customer/supplier scale linearly with SF in this corpus, so
    they are unhinted: AQE broadcasts them while they measure small
    and shuffles their key joins once they don't. The
    lineitem⋈orders edge always shuffles on orderkey."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n_cust = _t(spark, sf_dir, "nation").alias("n1")
    n_supp = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_nationkey"), F.col("n_name").alias("supp_nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_cust), c.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(r), F.col("n1.n_regionkey") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_supp), s.s_nationkey == F.col("sn_nationkey"))
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "supp_nation")
    )
    return joined.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_2", F.col("volume")).otherwise(0.0))
            / F.sum("volume"),
            6,
        ).alias("mkt_share")
    )


@query(
    "q10_returned_items",
    """
SELECT c_custkey, c_name, revenue, c_acctbal, n_name
FROM (SELECT c_custkey, c_name,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
             c_acctbal, n_name
      FROM customer, orders, lineitem, nation
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1997-04-01'
        AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      GROUP BY c_custkey, c_name, c_acctbal, n_name) t
ORDER BY revenue DESC, c_custkey LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: fact-fact join (orders⋈lineitem on orderkey) rolled
    up to the customer grain, nation (25 rows, constant) hinted
    broadcast, customer (150k·sf, SF-scaled) unhinted, then global top-20
    by lost revenue. The sort-limit compiles to TakeOrderedAndProject
    (per-partition heap + driver merge of 20 rows — never a global
    sort). Revenue is rounded before ranking with custkey as the tie
    break, so the top-20 set is deterministic across engines."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-04-01"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q13_customer_distribution",
    """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) c_orders
GROUP BY c_count
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: LEFT OUTER join with an extra join-side predicate
    (reference filters o_comment; this corpus has no comment column,
    so the same shape filters o_orderpriority), then a double
    aggregation — orders-per-customer, then the histogram of those
    counts. Customers with zero orders survive the outer join and
    land in the c_count=0 bucket; the second agg is over a
    customer-cardinality frame, so its shuffle is tiny."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q17_small_quantity_revenue",
    """
SELECT ROUND(SUM(l_extendedprice) / 7.0, 4) AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem, part
WHERE p_partkey = l_partkey AND p_brand = 'Brand#3'
  AND l_quantity < (SELECT 0.5 * AVG(l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated scalar subquery (per-part average
    quantity) decorrelated into an aggregate join-back. The fact side
    is pruned to the brand's parts FIRST (left-semi against the
    filtered part table), so the per-part average aggregates only
    ~1/n_brands of lineitem and the join-back frame is
    brand-selectivity-sized. The correlated avg is over ALL lineitem
    rows of each part, and the semi-join only drops whole part groups
    the outer query never reads, so the per-part values are
    unchanged. No broadcast hint anywhere — part and the aggregate
    both scale with SF; AQE broadcasts them while small. The two uses
    of the pruned frame are identical subplans, deduped by
    ReuseExchange. Quantities are small integers stored as doubles:
    integer sums are exact in float64, so sum/count and the 0.5×
    threshold are bit-identical across engines and the `<` comparison
    is deterministic."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    branded = li.join(p, li.l_partkey == p.p_partkey, "left_semi")
    per_part = branded.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        branded.join(per_part, F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q19_disjunctive_predicates",
    """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        AND l_quantity >= 1 AND l_quantity <= 20)
    OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
        AND l_quantity >= 5 AND l_quantity <= 30)
    OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
        AND l_quantity >= 10 AND l_quantity <= 40))
""",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: OR-of-AND predicate groups spanning both join sides
    (reference uses brand/container/size/shipmode; this corpus keeps
    brand/size/quantity). Catalyst extracts the common `p_partkey =
    l_partkey` conjunct so the join stays an equi-join (AQE picks
    broadcast while part measures small — no hint, part scales with
    SF) with the disjunction as a post-join residual, and infers the
    single-side OR fragments (brand IN, size ranges, quantity bounds)
    as pushable scan filters on each input."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    g1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    g2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(5, 30)
    )
    g3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(10, 40)
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(g1 | g2 | g3)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q21_waiting_suppliers",
    """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3, orders o3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND o3.o_orderkey = l3.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
""",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: the hardest TPC-H plan — EXISTS + NOT EXISTS both
    correlated to the same fact row with a <> residual. Lateness is
    l_shipdate > o_orderdate + 60 days (the corpus has no
    receipt/commit dates). Decorrelation: build the distinct
    (orderkey, suppkey) pairs once for each side, then LEFT SEMI
    (another supplier shipped on the order) and LEFT ANTI (no OTHER
    supplier was late on it) with non-equi suppkey residuals — three
    orderkey-keyed shuffles total, no correlated re-scan per row. The
    late-pairs frame is reused for both the candidates and the anti
    side via persist. supplier scales with SF (10k·sf rows) so the
    final name join is unhinted — AQE broadcasts it while small."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAY"))
        .select("l_orderkey", "l_suppkey")
    ).localCheckpoint()
    all_pairs = li.select(
        F.col("l_orderkey").alias("p_orderkey"), F.col("l_suppkey").alias("p_suppkey")
    ).distinct()
    late_pairs = late.select(
        F.col("l_orderkey").alias("lp_orderkey"), F.col("l_suppkey").alias("lp_suppkey")
    ).distinct()
    cand = late.join(
        all_pairs,
        (F.col("l_orderkey") == F.col("p_orderkey"))
        & (F.col("l_suppkey") != F.col("p_suppkey")),
        "left_semi",
    )
    waiting = cand.join(
        late_pairs,
        (F.col("l_orderkey") == F.col("lp_orderkey"))
        & (F.col("l_suppkey") != F.col("lp_suppkey")),
        "left_anti",
    )
    return (
        waiting.join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Derived partsupp: the corpus ships no partsupp table, so the four
# queries that need one (Q2/Q9/Q11/Q20) derive it deterministically
# from lineitem's distinct (partkey, suppkey) pairs. Cost and
# quantity are INTEGER-valued functions of the keys — every product
# and sum below stays exact in float64, so cross-engine threshold
# comparisons (Q2's min, Q11's HAVING, Q20's 0.5×sum) can never flip
# on a rounding ulp.

_PARTSUPP_SQL = """
partsupp AS (
  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         CAST((l_partkey * 31 + l_suppkey * 17) % 1000 + 1 AS DOUBLE) AS ps_supplycost,
         CAST((l_partkey * 7 + l_suppkey * 13) % 9999 + 1 AS BIGINT) AS ps_availqty
  FROM lineitem
)
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
        ((F.col("l_partkey") * 31 + F.col("l_suppkey") * 17) % 1000 + 1)
        .cast("double")
        .alias("ps_supplycost"),
        ((F.col("l_partkey") * 7 + F.col("l_suppkey") * 13) % 9999 + 1)
        .cast("bigint")
        .alias("ps_availqty"),
    ).distinct()


@query(
    "q2_min_cost_supplier",
    f"""
WITH {_PARTSUPP_SQL},
eu AS (
  SELECT ps_partkey, ps_suppkey, ps_supplycost
  FROM partsupp, supplier, nation, region
  WHERE s_suppkey = ps_suppkey AND s_nationkey = n_nationkey
    AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
),
cheapest AS (SELECT ps_partkey, MIN(ps_supplycost) AS min_cost FROM eu GROUP BY 1)
SELECT s_acctbal, s_name, n_name, p_partkey, p_type, ps_supplycost
FROM part, eu, cheapest, supplier, nation
WHERE p_partkey = eu.ps_partkey AND eu.ps_partkey = cheapest.ps_partkey
  AND eu.ps_supplycost = cheapest.min_cost
  AND s_suppkey = eu.ps_suppkey AND s_nationkey = n_nationkey
  AND p_size = 15
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: correlated MIN subquery over a region-restricted
    supply table, decorrelated into a per-part min aggregate joined
    back on (part, cost) equality. The regional partsupp frame is
    computed once and persisted for both its aggregate and the
    join-back; cost ties keep every minimal supplier, identically in
    both engines because costs are integer-valued. Hints only on
    nation/region (constant size); supplier and part scale with SF
    and are unhinted — AQE broadcasts them while small. The only
    shuffles are partsupp's distinct and the per-part min."""
    ps = _partsupp(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    eu = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("ps_partkey", "ps_suppkey", "ps_supplycost")
        .localCheckpoint()
    )
    cheapest = (
        eu.groupBy("ps_partkey")
        .agg(F.min("ps_supplycost").alias("min_cost"))
        .withColumnRenamed("ps_partkey", "ch_partkey")  # break self-join lineage
    )
    return (
        eu.join(
            cheapest,
            (eu.ps_partkey == F.col("ch_partkey"))
            & (eu.ps_supplycost == F.col("min_cost")),
        )
        .drop("ch_partkey")
        .join(p, eu.ps_partkey == p.p_partkey)
        # fresh supplier/nation copies: the originals are already in
        # eu's lineage and re-joining them is ambiguous
        .join(
            _t(spark, sf_dir, "supplier").alias("s2"),
            eu.ps_suppkey == F.col("s2.s_suppkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "nation").alias("n2")),
            F.col("s2.s_nationkey") == F.col("n2.n_nationkey"),
        )
        .select(
            F.col("s2.s_acctbal").alias("s_acctbal"),
            F.col("s2.s_name").alias("s_name"),
            F.col("n2.n_name").alias("n_name"),
            "p_partkey",
            "p_type",
            "ps_supplycost",
        )
    )


@query(
    "q9_product_profit",
    f"""
WITH {_PARTSUPP_SQL}
SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)
                 - ps_supplycost * l_quantity), 4) AS sum_profit
FROM part, supplier, lineitem, partsupp, orders, nation
WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
  AND ps_partkey = l_partkey AND p_partkey = l_partkey
  AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
  AND p_type = 'STANDARD'
GROUP BY 1, 2
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: the profit rollup — lineitem joined to part,
    supplier, orders, nation AND the supply table on the composite
    (partkey, suppkey) key. partsupp carries NO broadcast hint on
    purpose: it scales linearly with part (4×part rows in real TPC-H
    — a fact table at 100 TB), so AQE decides — broadcast while it
    measures small, shuffle on the composite key once it doesn't.
    part and supplier scale with SF too, so they are equally
    unhinted; only nation (25 rows, constant) keeps its hint.
    Profit terms are price products minus exact integer cost×qty."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    ps = _partsupp(spark, sf_dir)
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "ps_supplycost"
    ) * F.col("l_quantity")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        # 4dp, deliberately: summands are 4dp-quantized decimals, so sums
        # sit ON the 4dp grid — a coarser grain (2dp) can land exactly on a
        # .xx50 half where double-vs-decimal rounding splits engines, while
        # per-(nation,year) magnitudes (~1e7-1e8) keep ulp noise far below
        # the 4dp grain
        .agg(F.round(F.sum(profit), 4).alias("sum_profit"))
    )


@query(
    "q11_important_stock",
    f"""
WITH {_PARTSUPP_SQL},
asia AS (
  SELECT ps_partkey, ps_supplycost * ps_availqty AS v
  FROM partsupp, supplier, nation, region
  WHERE s_suppkey = ps_suppkey AND s_nationkey = n_nationkey
    AND n_regionkey = r_regionkey AND r_name = 'ASIA'
),
tot AS (SELECT SUM(v) AS total_v FROM asia)
SELECT ps_partkey, ROUND(SUM(v), 2) AS stock_value
FROM asia, tot
GROUP BY ps_partkey, total_v
HAVING SUM(v) > total_v * 0.002
""",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: grouped sum filtered by a share-of-global-total
    HAVING — the scalar total rides in as a broadcast 1-row frame.
    Stock values are exact integers in float64 and the 0.002
    multiplier is a power-of-2-free constant applied identically in
    both engines, so the strict > can't flip on summation order. The
    regional frame is persisted: its global total and per-part sums
    are two consumers of one computation."""
    ps = _partsupp(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "ps_partkey", (F.col("ps_supplycost") * F.col("ps_availqty")).alias("v")
        )
        .localCheckpoint()
    )
    tot = asia.agg(F.sum("v").alias("total_v"))
    return (
        asia.groupBy("ps_partkey")
        .agg(F.sum("v").alias("__sum_v"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("__sum_v") > F.col("total_v") * 0.002)
        .select("ps_partkey", F.round("__sum_v", 2).alias("stock_value"))
    )


@query(
    "q20_promotion_suppliers",
    f"""
WITH {_PARTSUPP_SQL},
promo_parts AS (SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
shipped AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY 1, 2
),
excess AS (
  SELECT ps_suppkey
  FROM partsupp
  JOIN promo_parts ON ps_partkey = p_partkey
  JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
  WHERE ps_availqty > 0.5 * qty
)
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (SELECT ps_suppkey FROM excess)
""",
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: nested IN chains — suppliers holding excess stock
    (availqty > half the year's shipments) of promo parts. The
    correlated shipment sum decorrelates into a (part, supplier)
    aggregate joined to the supply table; both IN levels become semi
    joins. Quantity sums are integer-exact, so the 0.5× threshold is
    deterministic."""
    ps = _partsupp(spark, sf_dir)
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("qty"))
    excess = (
        ps.join(p, ps.ps_partkey == F.col("p_partkey"), "left_semi")
        .join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey) & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("qty"))
        .select("ps_suppkey")
    )
    return s.join(excess, s.s_suppkey == excess.ps_suppkey, "left_semi").select(
        "s_suppkey", "s_name", "s_acctbal"
    )
