"""Round-4q additions: xpath extraction functions, SQL PIVOT and
named-WINDOW syntax, a table-health contract (freshness + volume),
differentially-private group counts with portable deterministic
noise, and int8-quantized embedding top-k.

Registered AFTER round4p so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# xpath_* extraction — Spark ships Hive's xpath function family as
# JVM built-ins (no UDF): embed each order in a small XML envelope,
# extract scalar fields back out with xpath_string/double/int, and
# aggregate. The oracle recovers the same fields with regexes (DuckDB
# has no XML support — the point of the test is that Spark's
# extraction agrees with a from-first-principles parse).
# ---------------------------------------------------------------------------


@query(
    "func_xpath_pack",
    """
WITH x AS (
  SELECT '<order priority="' || o_orderpriority || '"><total>'
         || CAST(ROUND(o_totalprice, 2) AS VARCHAR)
         || '</total><key>' || CAST(o_orderkey AS VARCHAR)
         || '</key></order>' AS doc
  FROM orders
),
p AS (
  SELECT regexp_extract(doc, 'priority="([^"]*)"', 1) AS pri,
         CAST(regexp_extract(doc, '<total>([^<]*)</total>', 1) AS DOUBLE) AS total,
         CAST(regexp_extract(doc, '<key>([^<]*)</key>', 1) AS BIGINT) AS okey
  FROM x
)
SELECT pri AS priority,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(total), 2) AS sum_total,
       CAST(SUM(okey) AS BIGINT) AS key_checksum
FROM p GROUP BY pri
""",
)
def func_xpath_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip orders through an XML envelope and back via the
    xpath built-ins: xpath_string for the attribute, xpath_double /
    xpath_long for element text, then a group-aggregate so every
    extracted value participates in the hash. All JVM-side codegen
    (Hive xpath UDFs are builtin expressions, not Python); the
    rounded total string keeps the double -> text -> double
    round-trip exact on both engines."""
    o = _t(spark, sf_dir, "orders")
    x = o.select(
        F.concat(
            F.lit('<order priority="'),
            F.col("o_orderpriority"),
            F.lit('"><total>'),
            F.round("o_totalprice", 2).cast("string"),
            F.lit("</total><key>"),
            F.col("o_orderkey").cast("string"),
            F.lit("</key></order>"),
        ).alias("doc")
    )
    p = x.select(
        F.expr("xpath_string(doc, '/order/@priority')").alias("pri"),
        F.expr("xpath_double(doc, '/order/total')").alias("total"),
        F.expr("xpath_long(doc, '/order/key')").alias("okey"),
    )
    return p.groupBy(F.col("pri").alias("priority")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.sum("total"), 2).alias("sum_total"),
        F.sum("okey").cast("bigint").alias("key_checksum"),
    )


# ---------------------------------------------------------------------------
# SQL PIVOT syntax — the DF-API pivots are already registered
# (pivot_status_by_flag, pivot_dynamic_priority); this exercises the
# SQL-surface PIVOT clause itself through spark.sql, matching
# DuckDB's PIVOT ... USING form.
# ---------------------------------------------------------------------------

_PIVOT_SQL = """
SELECT * FROM (
  SELECT o_orderstatus AS status, o_orderpriority AS pri FROM orders
)
PIVOT (
  COUNT(*) FOR pri IN (
    '1-URGENT' AS p_urgent, '2-HIGH' AS p_high, '3-MEDIUM' AS p_medium,
    '4-NOT SPECIFIED' AS p_notspec, '5-LOW' AS p_low
  )
)
"""


@query(
    "sql_pivot_status_priority",
    """
SELECT o_orderstatus AS status,
       COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p_urgent,
       COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p_high,
       COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p_medium,
       COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p_notspec,
       COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p_low
FROM orders GROUP BY o_orderstatus
""",
)
def sql_pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL PIVOT clause (orders: status x priority counts),
    planned by Catalyst into the same single groupBy with conditional
    aggregates the oracle writes explicitly with FILTER — a pivot
    with a fixed IN-list never shuffles more than once and never
    carries the two-pass distinct-discovery cost of the dynamic
    variant (pivot_dynamic_priority)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    df = spark.sql(_PIVOT_SQL)
    return df.select(
        F.col("status"),
        *[F.col(c).cast("bigint").alias(c) for c in df.columns if c != "status"],
    )


# ---------------------------------------------------------------------------
# Named WINDOW clause — one window definition shared by several
# functions; verifies the SQL surface (and that the shared definition
# plans as ONE sort, not three).
# ---------------------------------------------------------------------------

_NAMED_WINDOW_SQL = """
SELECT user_id, event_id,
       ROW_NUMBER() OVER w AS rn,
       LAG(event_type) OVER w AS prev_type,
       ROUND(SUM(value) OVER wf, 2) AS run_total
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
       wf AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@query(
    "sql_named_window",
    """
SELECT user_id, event_id,
       ROW_NUMBER() OVER w AS rn,
       LAG(event_type) OVER w AS prev_type,
       ROUND(SUM(value) OVER wf, 2) AS run_total
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
       wf AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def sql_named_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WINDOW clause: two named definitions over the same
    (user, time) ordering — w for ranking/lag, wf adding the running
    frame (Spark's parser doesn't allow inline frame extension of a
    named window, so the frame lives in its own definition). All
    three functions still land in ONE Window physical operator over
    one sort because the partitioning+ordering agree. The running sum is rounded to
    cents before hashing, the same float-tolerance contract as
    window_running_sum."""
    ev = _t(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events")
    return spark.sql(_NAMED_WINDOW_SQL)


# ---------------------------------------------------------------------------
# Table-health contract — freshness + volume expectations as one
# query over three tables: the monitoring face of the pandera-style
# row contracts (contract_check_orders) at TABLE grain, the check a
# scheduler would run before letting downstream jobs start.
# ---------------------------------------------------------------------------


@query(
    "contract_freshness_volume",
    """
WITH o AS (
  SELECT 'orders' AS table_name, CAST(COUNT(*) AS BIGINT) AS row_count,
         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS distinct_keys,
         MAX(o_orderdate) AS max_ts FROM orders
),
l AS (
  SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(DISTINCT l_orderkey) AS BIGINT), MAX(l_shipdate)
  FROM lineitem
),
e AS (
  SELECT 'events', CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(DISTINCT event_id) AS BIGINT), MAX(ts) FROM events
),
u AS (SELECT * FROM o UNION ALL SELECT * FROM l UNION ALL SELECT * FROM e)
SELECT table_name, row_count, distinct_keys, max_ts,
       CAST(row_count >= 500 AS BOOLEAN) AS volume_ok,
       CAST(max_ts >= TIMESTAMP '2024-01-01' AS BOOLEAN) AS fresh_ok,
       CAST(CASE WHEN table_name = 'lineitem' THEN TRUE
                 ELSE distinct_keys = row_count END AS BOOLEAN) AS keys_unique_ok
FROM u
""",
)
def contract_freshness_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass-per-table health contract: row volume, key
    cardinality, and freshness (max timestamp) for orders, lineitem
    and events, each reduced to a 1-row aggregate then unioned — the
    scan cost is the three table scans and nothing else, and each
    check lands as a boolean the scheduler can gate on. lineitem's
    key-uniqueness check is waived (orderkey repeats by design);
    the other two assert primary-key uniqueness from the same
    distinct-count the volume check already paid for."""
    o = _t(spark, sf_dir, "orders").agg(
        F.lit("orders").alias("table_name"),
        F.count(F.lit(1)).cast("bigint").alias("row_count"),
        F.count_distinct("o_orderkey").cast("bigint").alias("distinct_keys"),
        F.max("o_orderdate").alias("max_ts"),
    )
    li = _t(spark, sf_dir, "lineitem").agg(
        F.lit("lineitem").alias("table_name"),
        F.count(F.lit(1)).cast("bigint").alias("row_count"),
        F.count_distinct("l_orderkey").cast("bigint").alias("distinct_keys"),
        F.max("l_shipdate").alias("max_ts"),
    )
    e = _t(spark, sf_dir, "events").agg(
        F.lit("events").alias("table_name"),
        F.count(F.lit(1)).cast("bigint").alias("row_count"),
        F.count_distinct("event_id").cast("bigint").alias("distinct_keys"),
        F.max("ts").alias("max_ts"),
    )
    u = o.unionAll(li).unionAll(e)
    return u.select(
        "table_name",
        "row_count",
        "distinct_keys",
        "max_ts",
        (F.col("row_count") >= 500).alias("volume_ok"),
        (F.col("max_ts") >= F.lit("2024-01-01").cast("timestamp")).alias("fresh_ok"),
        F.when(F.col("table_name") == "lineitem", F.lit(True))
        .otherwise(F.col("distinct_keys") == F.col("row_count"))
        .alias("keys_unique_ok"),
    )


# ---------------------------------------------------------------------------
# Differentially-private group counts — Laplace(1/eps) noise drawn
# from the SAME portable MINSTD LCG discipline as
# stat_bootstrap_poisson: u is an exactly-representable
# integer/2147483647 ratio seeded by the group key, inverse-CDF'd
# into Laplace noise, so both engines release identical noisy counts.
# Determinism here is a TEST harness property (the oracle must
# reproduce the draw); a production release would use a real RNG —
# the privacy accounting (sensitivity 1 / eps=1 per count) is
# unchanged.
# ---------------------------------------------------------------------------

_LAP_U = "CAST((48271 * ((nationkey + 1) % 44488) % 2147483647) AS DOUBLE) / 2147483647.0"


@query(
    "privacy_dp_group_counts",
    f"""
WITH g AS (
  SELECT c_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS true_count
  FROM customer GROUP BY c_nationkey
),
n AS (
  SELECT nationkey, true_count,
         {_LAP_U} AS u
  FROM g
)
SELECT nationkey,
       ROUND(true_count + (CASE WHEN u < 0.5 THEN 1.0 ELSE -1.0 END)
             * ln(CASE WHEN u < 0.5 THEN 2.0 * u ELSE 2.0 * (1.0 - u) END), 6)
         AS noisy_count
FROM n
""",
)
def privacy_dp_group_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer counts per nation with eps=1 Laplace noise via the
    portable LCG inverse-CDF (u < .5 -> +ln(2u), else -> -ln(2(1-u));
    scale b = sensitivity/eps = 1). The true count never leaves the
    plan — only the noisy release is returned — and the noise phase
    is O(groups). Note the deliberate contrast with
    privacy_k_anonymity / privacy_l_diversity: those SUPPRESS risky
    groups, DP perturbs every group and releases all of them."""
    g = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_count"))
    )
    n = g.withColumn("u", F.expr(_LAP_U))
    noise = F.when(F.col("u") < 0.5, F.log(2.0 * F.col("u"))).otherwise(
        -F.log(2.0 * (1.0 - F.col("u")))
    )
    return n.select(
        "nationkey",
        F.round(F.col("true_count") + noise, 6).alias("noisy_count"),
    )


# ---------------------------------------------------------------------------
# Int8-quantized embedding top-k — the storage/bandwidth face of ANN:
# per-vector symmetric quantization to int8 (scale = max|x|/127),
# then cosine computed ENTIRELY in integer arithmetic on the
# quantized codes (the per-vector scales cancel in the cosine), so
# the 4x-smaller vectors are also bit-deterministic across engines.
# ---------------------------------------------------------------------------


@query(
    "sim_topk_int8",
    """
WITH q8 AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 127.0
                / CAST(list_max(list_transform(embedding, y -> abs(y))) AS DOUBLE))
                AS BIGINT)) AS qv
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, qv AS a FROM q8 WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.query_id, c.vec_id AS cand_id,
         ROUND(CAST(SUM(q.a[t.i] * c.qv[t.i]) AS DOUBLE)
           / (SQRT(CAST(SUM(q.a[t.i] * q.a[t.i]) AS DOUBLE))
              * SQRT(CAST(SUM(c.qv[t.i] * c.qv[t.i]) AS DOUBLE))), 6) AS cos8
  FROM q
  JOIN q8 c ON c.vec_id <> q.query_id,
       LATERAL (SELECT unnest(range(1, 65)) AS i) t(i)
  GROUP BY q.query_id, c.vec_id
),
ranked AS (
  SELECT query_id, cand_id, cos8,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos8 DESC, cand_id) AS INT) AS rk
  FROM scored
)
SELECT query_id, cand_id, cos8, rk FROM ranked WHERE rk <= 5
""",
)
def sim_topk_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 neighbors per probe over int8-quantized embeddings:
    quantize each vector once (scale = max|x|/127, floor to integer
    codes), score candidates with an integer dot product and integer
    norms — scales cancel in cosine, and because every sum is exact
    int64 arithmetic the scores are bit-identical across engines
    BEFORE the single final division. zip_with + aggregate keep the
    whole scoring JVM-side; at 100 TB the quantized corpus is 4x
    smaller on the wire, which is the actual point of int8 ANN. The
    exact-float twin is sim_topk_bruteforce; IVF/LSH remain the
    candidate-pruning scale paths."""
    emb = _t(spark, sf_dir, "embeddings")
    q8 = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0"
            " / CAST(array_max(transform(embedding, y -> abs(y))) AS DOUBLE))"
            " AS BIGINT))"
        ).alias("qv"),
    )
    q = q8.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("a")
    )
    c = q8.select(F.col("vec_id").alias("cand_id"), F.col("qv").alias("b"))
    dot = F.expr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS BIGINT), (s, v) -> s + v)"
    )
    na = F.expr(
        "aggregate(transform(a, x -> x * x), CAST(0 AS BIGINT), (s, v) -> s + v)"
    )
    nb = F.expr(
        "aggregate(transform(b, x -> x * x), CAST(0 AS BIGINT), (s, v) -> s + v)"
    )
    scored = (
        q.crossJoin(c)
        .where(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(
                dot.cast("double")
                / (F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double"))),
                6,
            ).alias("cos8"),
        )
    )
    from pyspark.sql import Window as W

    rk = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.desc("cos8"), "cand_id")
    )
    return (
        scored.withColumn("rk", rk.cast("int")).where(F.col("rk") <= 5)
    )
