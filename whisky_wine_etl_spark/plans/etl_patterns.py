"""ETL-pattern query plans: merge/upsert, SCD2, deterministic
sampling, token chunking, incremental rollup.

These are the load/maintenance patterns the reference's blind JDBC
append (dags/wine_etl_kaggle.py:170-202) sidesteps, plus the
training-data shaping steps (reproducible splits, chunking) that a
100 TB corpus pipeline needs. Every query has a DuckDB oracle — the
hash used for sampling is pure 64-bit arithmetic precisely so both
engines compute the identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.operators import merge as mg
from whisky_wine_etl_spark.operators import sampling as smp
from whisky_wine_etl_spark.operators import text as tx
from whisky_wine_etl_spark.plans.registry import query

# ---------------------------------------------------------------------------
# Merge / upsert (SCD1)
# ---------------------------------------------------------------------------

# Deterministic "updates feed" derived from customer itself: every
# 10th key arrives with a new balance and segment; every 97th key is
# brand-new (key offset by 1e6).
_UPSERT_SRC_SQL = """
SELECT c_custkey, UPPER(c_name) AS c_name,
       ROUND(c_acctbal + 100, 2) AS c_acctbal,
       'WHOLESALE' AS c_mktsegment
FROM customer WHERE c_custkey % 10 = 0
UNION ALL
SELECT c_custkey + 1000000 AS c_custkey, 'NEW ' || c_name AS c_name,
       0.0 AS c_acctbal, 'ONLINE' AS c_mktsegment
FROM customer WHERE c_custkey % 97 = 0
"""


def _upsert_source(cust: DataFrame) -> DataFrame:
    updates = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.upper("c_name").alias("c_name"),
        F.round(F.col("c_acctbal") + 100, 2).alias("c_acctbal"),
        F.lit("WHOLESALE").alias("c_mktsegment"),
    )
    inserts = cust.filter(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("NEW "), F.col("c_name")).alias("c_name"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("ONLINE").alias("c_mktsegment"),
    )
    return updates.unionByName(inserts)


@query(
    "merge_upsert_customer",
    f"""
WITH tgt AS (
  SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS c_acctbal, c_mktsegment
  FROM customer
),
src AS ({_UPSERT_SRC_SQL})
SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
       COALESCE(s.c_name, t.c_name) AS c_name,
       COALESCE(s.c_acctbal, t.c_acctbal) AS c_acctbal,
       COALESCE(s.c_mktsegment, t.c_mktsegment) AS c_mktsegment
FROM tgt t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey
""",
)
def merge_upsert_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD1 merge (MERGE INTO ... UPDATE/INSERT) as one full-outer
    join + coalesce — the upsert the reference's `if_exists='append'`
    (wine_etl_kaggle.py:170) cannot express."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal"), "c_mktsegment"
    )
    return mg.upsert(cust, _upsert_source(cust), keys=["c_custkey"])


# ---------------------------------------------------------------------------
# SCD Type-2
# ---------------------------------------------------------------------------

# Dimension state: every key current since 2024-01-01; every 13th key
# additionally carries a closed LEGACY row (history that must pass
# through untouched). Snapshot at 2024-06-01: every 7th key changes
# segment, every 11th key is deleted, every 101st key (offset 2e6) is
# new.
_SCD2_DIM_SQL = """
SELECT c_custkey, c_mktsegment AS segment,
       DATE '2024-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
FROM customer
UNION ALL
SELECT c_custkey, 'LEGACY' AS segment,
       DATE '2023-01-01' AS valid_from, DATE '2024-01-01' AS valid_to
FROM customer WHERE c_custkey % 13 = 0
"""

_SCD2_SNAP_SQL = """
SELECT c_custkey,
       CASE WHEN c_custkey % 7 = 0 THEN 'WHOLESALE' ELSE c_mktsegment END AS segment
FROM customer WHERE c_custkey % 11 <> 0
UNION ALL
SELECT c_custkey + 2000000 AS c_custkey, 'ONLINE' AS segment
FROM customer WHERE c_custkey % 101 = 0
"""


def _scd2_dim(cust: DataFrame) -> DataFrame:
    cur = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("2024-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    hist = cust.filter(F.col("c_custkey") % 13 == 0).select(
        "c_custkey",
        F.lit("LEGACY").alias("segment"),
        F.lit("2023-01-01").cast("date").alias("valid_from"),
        F.lit("2024-01-01").cast("date").alias("valid_to"),
    )
    return cur.unionByName(hist)


def _scd2_snapshot(cust: DataFrame) -> DataFrame:
    changed = cust.filter(F.col("c_custkey") % 11 != 0).select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, "WHOLESALE")
        .otherwise(F.col("c_mktsegment"))
        .alias("segment"),
    )
    new = cust.filter(F.col("c_custkey") % 101 == 0).select(
        (F.col("c_custkey") + 2000000).alias("c_custkey"),
        F.lit("ONLINE").alias("segment"),
    )
    return changed.unionByName(new)


@query(
    "merge_scd2_segment",
    f"""
WITH dim AS ({_SCD2_DIM_SQL}),
snap AS ({_SCD2_SNAP_SQL}),
hist AS (SELECT * FROM dim WHERE valid_to IS NOT NULL),
cur AS (SELECT * FROM dim WHERE valid_to IS NULL),
j AS (
  SELECT COALESCE(c.c_custkey, n.c_custkey) AS c_custkey,
         c.segment AS c_seg, c.valid_from AS c_from,
         n.segment AS n_seg,
         c.c_custkey IS NOT NULL AS in_cur,
         n.c_custkey IS NOT NULL AS in_snap
  FROM cur c FULL OUTER JOIN snap n ON c.c_custkey = n.c_custkey
),
flagged AS (
  SELECT *, in_cur AND (NOT in_snap OR c_seg IS DISTINCT FROM n_seg) AS changed
  FROM j
)
SELECT * FROM hist
UNION ALL
SELECT c_custkey, c_seg AS segment, c_from AS valid_from, CAST(NULL AS DATE) AS valid_to
FROM flagged WHERE in_cur AND NOT changed
UNION ALL
SELECT c_custkey, c_seg AS segment, c_from AS valid_from, DATE '2024-06-01' AS valid_to
FROM flagged WHERE changed
UNION ALL
SELECT c_custkey, n_seg AS segment, DATE '2024-06-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
FROM flagged WHERE in_snap AND (NOT in_cur OR changed)
""",
)
def merge_scd2_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension maintenance: history preserved, changed rows
    closed at the effective date and re-opened with new values,
    deletes closed, new keys opened."""
    cust = load_table(spark, sf_dir, "customer")
    return mg.scd2_apply(
        _scd2_dim(cust),
        _scd2_snapshot(cust),
        keys=["c_custkey"],
        tracked=["segment"],
        effective_date="2024-06-01",
    )


# ---------------------------------------------------------------------------
# Deterministic sampling
# ---------------------------------------------------------------------------


@query(
    "sample_hash_pct",
    f"""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(o_totalprice), 2) AS sum_price
FROM orders
WHERE {smp.hash_bucket_sql("o_orderkey", 100)} < 10
GROUP BY o_orderpriority
""",
)
def sample_hash_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% rerun-stable sample by multiplicative key hash; the
    predicate is pure arithmetic so it stays inside codegen and both
    engines pick the identical rows."""
    o = load_table(spark, sf_dir, "orders")
    return (
        smp.hash_sample(o, "o_orderkey", pct=10)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "sample_stratified_first_n",
    f"""
WITH ranked AS (
  SELECT o_orderpriority, o_orderkey,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY o_orderpriority
           ORDER BY {smp.hash_bucket_sql("o_orderkey", 1000000007)}, o_orderkey
         ) AS INT) AS rk
  FROM orders
)
SELECT o_orderpriority, o_orderkey, rk FROM ranked WHERE rk <= 20
""",
)
def sample_stratified_first_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-n per-stratum deterministic sample: hash-ordered
    row_number inside each group."""
    o = load_table(spark, sf_dir, "orders")
    return smp.stratified_first_n(o, "o_orderpriority", "o_orderkey", n=20).select(
        "o_orderpriority", "o_orderkey", "rk"
    )


@query(
    "sample_train_eval_split",
    f"""
SELECT CASE WHEN {smp.hash_bucket_sql("doc_id", 100)} < 10
            THEN 'eval' ELSE 'train' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1
""",
)
def sample_train_eval_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable train/eval holdout by document-id hash: a document never
    migrates between splits across reruns or corpus growth."""
    d = load_table(spark, sf_dir, "documents")
    return (
        smp.train_eval_split(d, "doc_id", eval_pct=10)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Token chunking (training-corpus shaping)
# ---------------------------------------------------------------------------


@query(
    "text_chunk_overlap",
    """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n
  FROM documents
),
s AS (
  SELECT doc_id, toks, n,
         unnest(range(0, CAST(floor((n - 1) / 40) AS BIGINT) + 1)) AS i
  FROM t
)
SELECT doc_id, CAST(i AS INT) AS chunk_id, CAST(i * 40 AS INT) AS start,
       CAST(len(list_slice(toks, i * 40 + 1, i * 40 + 50)) AS INT) AS n_tokens,
       md5(array_to_string(list_slice(toks, i * 40 + 1, i * 40 + 50), ' ')) AS chunk_md5
FROM s
""",
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window token chunking (window 50, stride 40) with
    md5-pinned chunk content."""
    d = load_table(spark, sf_dir, "documents")
    return tx.chunk_tokens(d, window=50, stride=40)


# ---------------------------------------------------------------------------
# Incremental rollup (hypertable-style partial re-aggregation)
# ---------------------------------------------------------------------------


@query(
    "rollup_incremental_day",
    """
SELECT time_bucket(INTERVAL '1 day', ts) AS day,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 4) AS sum_value,
       ROUND(MIN(value), 4) AS min_value,
       ROUND(MAX(value), 4) AS max_value,
       ROUND(SUM(value), 4) / COUNT(*) AS avg_value
FROM events
GROUP BY 1, 2
""",
)
def rollup_incremental_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: maintain HOURLY partials
    (count/sum/min/max — all algebraic, so partials merge), then serve
    the DAILY view by re-aggregating 24 partial rows per day instead
    of re-scanning raw events. The oracle aggregates raw events
    directly, proving the two-level rollup is lossless.

    At 100 TB the hourly partial table is ~5-6 orders of magnitude
    smaller than the fact table; day/week/month views all derive from
    it with negligible cost, and appends only touch the current hour's
    partials."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("p_n"),
        F.sum("value").alias("p_sum"),
        F.min("value").alias("p_min"),
        F.max("value").alias("p_max"),
    )
    return (
        hourly.groupBy(
            F.date_trunc("day", F.col("hour")).alias("day"),
            "event_type",
        )
        .agg(
            F.sum("p_n").alias("n"),
            F.round(F.sum("p_sum"), 4).alias("sum_value"),
            F.round(F.min("p_min"), 4).alias("min_value"),
            F.round(F.max("p_max"), 4).alias("max_value"),
            # avg = (4dp-rounded sum) / n, NOT re-rounded: partial
            # re-aggregation associates FP adds differently than the
            # oracle's single-pass sum, so round the sum first (both
            # engines land on the same double), then rely on IEEE
            # division being deterministic — re-rounding the quotient
            # would sit exactly on half-way edges (4dp value / small n)
            # where Spark (HALF_UP) and DuckDB disagree.
            (F.round(F.sum("p_sum"), 4) / F.sum("p_n")).alias("avg_value"),
        )
    )


# ---------------------------------------------------------------------------
# Surrogate keys (scalable global sequence)
# ---------------------------------------------------------------------------


@query(
    "etl_surrogate_keys",
    """
SELECT c_custkey, CAST(ROW_NUMBER() OVER (ORDER BY c_custkey) AS BIGINT) AS sk
FROM customer
""",
)
def etl_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global contiguous sequence via the two-pass range-partition +
    offset pattern (operators/keys.py) — the oracle's naive global
    ROW_NUMBER() is exactly what this avoids at scale (one-task
    sort); the result is identical because within-partition ranks plus
    range-ordered offsets reconstruct the global rank."""
    from whisky_wine_etl_spark.operators.keys import add_surrogate_key

    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    return add_surrogate_key(c, ["c_custkey"]).select("c_custkey", "sk")


# ---------------------------------------------------------------------------
# Time-series regularization
# ---------------------------------------------------------------------------


@query(
    "ts_resample_ffill_1h",
    """
WITH e AS (
  SELECT user_id, event_id, value,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         CAST(floor(epoch(ts)) AS BIGINT)
           - CAST(floor(epoch(ts)) AS BIGINT) % 3600 AS bucket_ts
  FROM events
),
ranked AS (
  SELECT user_id, bucket_ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, bucket_ts
                            ORDER BY sec DESC, event_id DESC) AS rn
  FROM e
),
counts AS (
  SELECT user_id, bucket_ts, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM e GROUP BY 1, 2
),
per_bucket AS (
  SELECT c.user_id, c.bucket_ts, c.n_events, r.value AS last_v
  FROM counts c JOIN ranked r
    ON c.user_id = r.user_id AND c.bucket_ts = r.bucket_ts AND r.rn = 1
),
rng AS (SELECT user_id, MIN(bucket_ts) AS mn, MAX(bucket_ts) AS mx FROM e GROUP BY 1),
grid AS (
  SELECT user_id, CAST(g.b AS BIGINT) AS bucket_ts
  FROM rng, LATERAL (SELECT unnest(range(mn, mx + 3600, 3600)) AS b) g(b)
)
SELECT g.user_id, g.bucket_ts,
       COALESCE(p.n_events, 0) AS n_events,
       ROUND(LAST_VALUE(p.last_v IGNORE NULLS)
               OVER (PARTITION BY g.user_id ORDER BY g.bucket_ts
                     ROWS UNBOUNDED PRECEDING), 2) AS value_ffill
FROM grid g LEFT JOIN per_bucket p
  ON g.user_id = p.user_id AND g.bucket_ts = p.bucket_ts
""",
)
def ts_resample_ffill_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style regularization: the irregular event stream
    becomes a gap-free per-user hourly grid — bucket event counts
    (0 where nothing happened) and the last observed value carried
    forward. Grid rows are generated distributed (sequence+explode
    per user); the fill window is sized by time span, not traffic."""
    from whisky_wine_etl_spark.operators.timeseries import resample_ffill

    ev = load_table(spark, sf_dir, "events")
    out = resample_ffill(ev, step_sec=3600)
    return out.select(
        "user_id",
        "bucket_ts",
        "n_events",
        F.round("value_ffill", 2).alias("value_ffill"),
    )


@query(
    "join_scd2_point_in_time",
    """
WITH dim AS (
  SELECT c_custkey, 'OLD_' || c_mktsegment AS segment,
         DATE '1995-01-01' AS valid_from, DATE '1998-07-01' AS valid_to
  FROM customer
  UNION ALL
  SELECT c_custkey, c_mktsegment AS segment,
         DATE '1998-07-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
  FROM customer
)
SELECT segment, CAST(YEAR(o_orderdate) AS INT) AS o_year,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS sum_price
FROM orders JOIN dim
  ON o_custkey = c_custkey
 AND o_orderdate >= valid_from
 AND (valid_to IS NULL OR o_orderdate < valid_to)
GROUP BY 1, 2
""",
)
def join_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join: each fact row picks the SCD2
    dimension version valid AT its event date — the as-of-history
    pattern every warehouse query against a versioned dimension
    needs. The versioned dim is derived from customer (pre-1998.5
    rows carry an 'OLD_' segment). Shape: an equi join on the key
    with the validity range as a residual predicate — per-key version
    counts are small, so this stays a plain hash join (broadcast here;
    shuffled-with-AQE at scale), never an interval cross join."""
    c = load_table(spark, sf_dir, "customer")
    v1 = c.select(
        "c_custkey",
        F.concat(F.lit("OLD_"), F.col("c_mktsegment")).alias("segment"),
        F.lit("1995-01-01").cast("date").alias("valid_from"),
        F.lit("1998-07-01").cast("date").alias("valid_to"),
    )
    v2 = c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("1998-07-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    dim = v1.unionByName(v2)
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(
            F.broadcast(dim),
            (o.o_custkey == dim.c_custkey)
            & (o.o_orderdate >= dim.valid_from)
            & (dim.valid_to.isNull() | (o.o_orderdate < dim.valid_to)),
        )
        .groupBy("segment", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )
