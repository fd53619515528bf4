"""Round-4 additions: per-row validation failure frame, capped
(scale-profile) exact shingle-pair dedup, as-of join with tolerance,
and linear-interpolation resampling.

Registered AFTER every earlier module (plans.load_all imports round4
last) so the still-unverified round-3 backlog keeps the driver's first
slots — __spark_entry__.queries() orders unverified-first with ties in
registration order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# V-1 per-row failure cases (reference dags/wine_etl_kaggle.py:162)
# ---------------------------------------------------------------------------

# the transformed-pipeline CTE is shared with wine_v1_validation_report
from whisky_wine_etl_spark.plans.wine import _PIPELINE_SQL, wine_input  # noqa: E402

_FAILURE_UNION = " UNION ALL ".join(
    f"""
SELECT id AS row_id, '{col}' AS column_name, '{check}' AS check_name,
       CAST({col} AS VARCHAR) AS failure_case
FROM pipe WHERE {pred}"""
    for check, col, pred in [
        ("points_null", "points", "points IS NULL"),
        ("points_out_of_range", "points", "points IS NOT NULL AND (points < 50 OR points > 100)"),
        ("title_bad_length", "title", "title IS NOT NULL AND (LENGTH(title) < 3 OR LENGTH(title) > 200)"),
        ("description_too_short", "description", "description IS NOT NULL AND LENGTH(description) < 10"),
        ("price_negative", "price", "price IS NOT NULL AND price < 0"),
        ("country_null", "country", "country IS NULL"),
        (
            "country_not_allowed",
            "country",
            "country IS NOT NULL AND country NOT IN "
            "('US','France','Italy','Spain','Argentina','Chile','Australia','Germany')",
        ),
        ("title_length_negative", "title_length", "title_length < 0"),
        ("description_length_negative", "description_length", "description_length < 0"),
        ("price_category_null", "price_category", "price_category IS NULL"),
        ("region_null", "region", "region IS NULL"),
        ("country_code_null", "country_code", "country_code IS NULL"),
    ]
)


@query(
    "wine_v2_failure_cases",
    f"WITH pipe AS ({_PIPELINE_SQL}) {_FAILURE_UNION}",
)
def wine_v2_failure_cases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row pandera failure_cases parity (reference
    dags/wine_etl_kaggle.py:162): one row per offending (row, check)
    with the offending value, alongside wine_v1's aggregate counters.
    Spark side is a single map-only scan (array of optional structs →
    filter → explode, no shuffle); the oracle is the literal UNION ALL
    of the twelve per-check selects over the same transformed CTE."""
    from whisky_wine_etl_spark.operators import wine as wops
    from whisky_wine_etl_spark.operators.validate import failure_cases

    return failure_cases(wops.wine_transform(wine_input(spark, sf_dir)))


# ---------------------------------------------------------------------------
# Capped (scale-profile) exact shingle-pair dedup. The uncapped
# dedup_ngram_jaccard / dedup_containment stay registered as oracle
# ground truth; these are the plans you RUN on a Zipfian 100 TB corpus,
# where a hot shingle's posting list makes the inverted-index self-join
# quadratic in its length. The cap drops postings longer than
# _SHINGLE_CAP before pair generation, bounding per-shingle join work
# at cap² while the recall cost is only pairs whose EVERY common
# shingle is ultra-frequent (recall vs the uncapped twin is asserted in
# tests/test_dedup_similarity.py). Both oracles mirror the cap exactly,
# so these verify hash-exact, not rows-only.
# ---------------------------------------------------------------------------

_SHINGLE_CAP = 5  # ≈ p99 shingle frequency on the synthetic corpus; at
# real scale set it as a document-frequency quantile, not an absolute

_CAPPED_SHINGLES = """
tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh0 AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i.i:i.i+2], ' ') AS shingle
  FROM tk, LATERAL (SELECT unnest(range(1, greatest(len(toks) - 2, 1) + 1)) AS i) i(i)
),
keep AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) <= {cap}),
sh AS (SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN keep USING (shingle))
"""


@query(
    "dedup_ngram_capped",
    f"""
WITH {_CAPPED_SHINGLES.format(cap=_SHINGLE_CAP)},
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
jac AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         ROUND(CAST(COUNT(*) AS DOUBLE) / (sa.n_sh + sb.n_sh - COUNT(*)), 6) AS jaccard
  FROM sh a
  JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN sizes sa ON sa.doc_id = a.doc_id
  JOIN sizes sb ON sb.doc_id = b.doc_id
  GROUP BY a.doc_id, b.doc_id, sa.n_sh, sb.n_sh
)
SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.5
""",
)
def dedup_ngram_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard with the stop-shingle cap ON (the scale
    profile — see module comment). Jaccard denominators use the PRUNED
    shingle sets, mirrored exactly by the oracle."""
    from whisky_wine_etl_spark.operators import dedup as dd

    docs = _t(spark, sf_dir, "documents")
    return dd.jaccard_pairs(docs, threshold=0.5, max_shingle_freq=_SHINGLE_CAP)


@query(
    "dedup_containment_capped",
    f"""
WITH {_CAPPED_SHINGLES.format(cap=_SHINGLE_CAP)},
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh0 GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(CAST(n_common AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh), 6) AS containment
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh) >= 0.8
""",
)
def dedup_containment_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact containment with the stop-shingle cap ON. Unlike the
    Jaccard profile, sizes (denominators) are computed BEFORE pruning
    — the true shingle-set size — so only the INTERSECTION loses the
    ultra-frequent shingles; the oracle mirrors that asymmetry."""
    from whisky_wine_etl_spark.operators import dedup as dd

    docs = _t(spark, sf_dir, "documents")
    return dd.containment_pairs(docs, threshold=0.8, max_shingle_freq=_SHINGLE_CAP)


# ---------------------------------------------------------------------------
# As-of join with tolerance (pandas merge_asof parity)
# ---------------------------------------------------------------------------


@query(
    "join_asof_tolerance",
    """
WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
     r AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase')
SELECT l.event_id, l.user_id, l.ts,
       CASE WHEN r.ts >= l.ts - INTERVAL 1 HOUR THEN r.event_id END AS purchase_event_id,
       CASE WHEN r.ts >= l.ts - INTERVAL 1 HOUR THEN r.ts END AS purchase_ts,
       CASE WHEN r.ts >= l.ts - INTERVAL 1 HOUR THEN r.value END AS purchase_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
""",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """join_asof_last_purchase with a 1-hour tolerance: a match older
    than the tolerance is nulled out, exactly pandas merge_asof's
    `tolerance=` contract. The operator applies the tolerance INSIDE
    the same keyed window pass (operators/asof.py) — no second join;
    the oracle is DuckDB's native ASOF LEFT JOIN with the gap filter
    applied to the matched payload."""
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
        tolerance=F.expr("INTERVAL 1 HOUR"),
    )


# ---------------------------------------------------------------------------
# Linear-interpolation resample (gap fill without forward-fill bias)
# ---------------------------------------------------------------------------


@query(
    "ts_interpolate_linear",
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
knots AS (
  SELECT user_id, bucket_ts, value AS kv FROM ranked WHERE rn = 1
),
rng AS (SELECT user_id, MIN(bucket_ts) AS mn, MAX(bucket_ts) AS mx FROM e GROUP BY 1),
grid AS (
  SELECT user_id, CAST(g.b AS BIGINT) AS bucket_ts
  FROM rng, LATERAL (SELECT unnest(range(mn, mx + 3600, 3600)) AS b) g(b)
),
j AS (
  SELECT g.user_id, g.bucket_ts, k.kv,
         CASE WHEN k.kv IS NOT NULL THEN g.bucket_ts END AS kt
  FROM grid g LEFT JOIN knots k
    ON g.user_id = k.user_id AND g.bucket_ts = k.bucket_ts
),
f AS (
  SELECT user_id, bucket_ts,
         LAST_VALUE(kv IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket_ts
           ROWS UNBOUNDED PRECEDING) AS pv,
         LAST_VALUE(kt IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket_ts
           ROWS UNBOUNDED PRECEDING) AS pt,
         FIRST_VALUE(kv IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket_ts
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         FIRST_VALUE(kt IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket_ts
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM j
)
SELECT user_id, bucket_ts,
       ROUND(CASE WHEN pt = nt THEN pv
                  ELSE pv + (nv - pv) * (bucket_ts - pt) / (nt - pt) END
             + 1e-9, 4)
         AS value_interp
FROM f
""",
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable gap fill by LINEAR interpolation: per-user hourly
    grid where empty buckets take the straight line between the
    surrounding observations (resample_ffill's twin for signals where
    carrying the last value flat would bias downstream features).
    Edges never extrapolate — buckets before the first / after the
    last observation stay NULL. Same distributed shape as the ffill
    plan: one (key,bucket) groupBy, sequence+explode grid, two passes
    over one keyed window partition (one shuffle total).

    Rounding: source values carry 4 decimals, so interpolated
    midpoints frequently land EXACTLY on a round-half boundary, where
    a 1-ulp cross-engine difference (e.g. FMA contraction) flips the
    4th decimal. Both sides add a deterministic 1e-9 nudge before
    rounding: exact interpolants are small-denominator rationals, so
    they can sit ON a boundary but never within 1e-12 of
    boundary − 1e-9 — the nudge resolves every tie identically."""
    from whisky_wine_etl_spark.operators.timeseries import resample_interpolate

    ev = _t(spark, sf_dir, "events")
    out = resample_interpolate(ev, step_sec=3600)
    return out.select(
        "user_id",
        "bucket_ts",
        F.round(F.col("value_interp") + F.lit(1e-9), 4).alias("value_interp"),
    )


# ---------------------------------------------------------------------------
# Per-row contract failures over a scaled fact table (the generic
# counterpart of wine_v2_failure_cases — debugging detail for bad
# batches). The driver's orders table is clean, so both engines apply
# the SAME deterministic corruption expressions first (the WINE_EXPRS
# pattern): every rule then has real offenders to report.
# ---------------------------------------------------------------------------

_CORRUPT_ORDERS = """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 97 = 0 THEN -o_totalprice ELSE o_totalprice END AS o_totalprice,
       CASE WHEN o_orderkey % 89 = 0 THEN 'X-BOGUS' ELSE o_orderpriority END AS o_orderpriority,
       CASE WHEN o_orderkey % 101 = 0 THEN -o_custkey ELSE o_custkey END AS o_custkey,
       CASE WHEN o_orderkey % 103 = 0 THEN TIMESTAMP '1970-01-01' ELSE o_orderdate END AS o_orderdate
FROM orders
"""

_CONTRACT_PREDS = [
    ("totalprice_nonneg", "o_totalprice", "o_totalprice < 0"),
    (
        "orderdate_in_range",
        "o_orderdate",
        "o_orderdate IS NULL OR o_orderdate < TIMESTAMP '1992-01-01'"
        " OR o_orderdate >= TIMESTAMP '2000-01-01'",
    ),
    (
        "priority_in_domain",
        "o_orderpriority",
        "o_orderpriority NOT IN "
        "('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')",
    ),
]

_CONTRACT_UNION = " UNION ALL ".join(
    f"""
SELECT o_orderkey AS row_id, '{col}' AS column_name, '{check}' AS check_name,
       CAST({col} AS VARCHAR) AS failure_case
FROM o2 WHERE {pred}"""
    for check, col, pred in _CONTRACT_PREDS
)


@query(
    "contract_failures_orders",
    f"""
WITH o2 AS ({_CORRUPT_ORDERS})
{_CONTRACT_UNION}
UNION ALL
SELECT o_orderkey AS row_id, 'o_custkey' AS column_name, 'custkey_fk' AS check_name,
       CAST(o_custkey AS VARCHAR) AS failure_case
FROM o2 WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o2.o_custkey)
""",
)
def contract_failures_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row contract violations over orders (contract_check_orders
    reports the same rules as aggregate counters): row-local rules run
    in ONE map-only array-filter-explode pass (operators/validate.py
    row_failures — output ∝ violations, zero shuffles), and the
    referential rule contributes its offenders via one left-anti join
    on the key. Both engines corrupt the clean input with the same
    deterministic CASE expressions so every rule has real rows to
    report."""
    from whisky_wine_etl_spark.operators.validate import row_failures

    o2 = _t(spark, sf_dir, "orders").selectExpr(
        "o_orderkey",
        "CASE WHEN o_orderkey % 97 = 0 THEN -o_totalprice ELSE o_totalprice END AS o_totalprice",
        "CASE WHEN o_orderkey % 89 = 0 THEN 'X-BOGUS' ELSE o_orderpriority END AS o_orderpriority",
        "CASE WHEN o_orderkey % 101 = 0 THEN -o_custkey ELSE o_custkey END AS o_custkey",
        "CASE WHEN o_orderkey % 103 = 0 THEN TIMESTAMP '1970-01-01' ELSE o_orderdate END AS o_orderdate",
    )
    checks = [
        ("totalprice_nonneg", "o_totalprice", F.col("o_totalprice") < 0),
        (
            "orderdate_in_range",
            "o_orderdate",
            F.col("o_orderdate").isNull()
            | (F.col("o_orderdate") < F.lit("1992-01-01").cast("timestamp"))
            | (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")),
        ),
        (
            "priority_in_domain",
            "o_orderpriority",
            ~F.col("o_orderpriority").isin(
                "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"
            ),
        ),
    ]
    local = row_failures(o2, checks, id_col="o_orderkey")
    c = _t(spark, sf_dir, "customer")
    fk = (
        o2.join(c, o2.o_custkey == c.c_custkey, "left_anti")
        .select(
            F.col("o_orderkey").alias("row_id"),
            F.lit("o_custkey").alias("column_name"),
            F.lit("custkey_fk").alias("check_name"),
            F.col("o_custkey").cast("string").alias("failure_case"),
        )
    )
    return local.unionByName(fk)


# ---------------------------------------------------------------------------
# Incremental NEAR-dup: fuzzy counterpart of dedup_incremental — the
# realistic 100 TB ingestion gate (exact-hash ledgers miss re-crawled
# pages with one edited sentence). Same corpus/batch split as the
# exact ledger query so the two can be read side by side.
# ---------------------------------------------------------------------------


@query(
    "dedup_incremental_neardup",
    """
WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 0),
inc AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0),
tkc AS (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus),
tki AS (SELECT doc_id, string_split(text, ' ') AS toks FROM inc),
shc AS (
  SELECT DISTINCT doc_id AS cid, array_to_string(toks[i.i:i.i+2], ' ') AS shingle
  FROM tkc, LATERAL (SELECT unnest(range(1, greatest(len(toks) - 2, 1) + 1)) AS i) i(i)
),
shi AS (
  SELECT DISTINCT doc_id AS iid, array_to_string(toks[i.i:i.i+2], ' ') AS shingle
  FROM tki, LATERAL (SELECT unnest(range(1, greatest(len(toks) - 2, 1) + 1)) AS i) i(i)
),
sc AS (SELECT cid, COUNT(*) AS nc FROM shc GROUP BY cid),
si AS (SELECT iid, COUNT(*) AS ni FROM shi GROUP BY iid),
inter AS (
  SELECT i.iid, c.cid, COUNT(*) AS n_common
  FROM shi i JOIN shc c ON i.shingle = c.shingle
  GROUP BY i.iid, c.cid
),
scored AS (
  SELECT iid, cid,
         ROUND(CAST(n_common AS DOUBLE) / (si.ni + sc.nc - n_common), 6) AS jaccard
  FROM inter JOIN si USING (iid) JOIN sc USING (cid)
),
best AS (
  SELECT iid, cid, jaccard,
         ROW_NUMBER() OVER (PARTITION BY iid ORDER BY jaccard DESC, cid ASC) AS rn
  FROM scored WHERE jaccard >= 0.5
)
SELECT iid AS doc_id, cid AS matched_corpus_id, jaccard
FROM best WHERE rn = 1
""",
)
def dedup_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incoming-batch docs (doc_id % 4 = 0) near-duplicate (3-gram
    Jaccard >= 0.5) to SOME corpus doc, with the best match attached —
    the fuzzy ingestion gate beside dedup_incremental's exact-hash
    ledger. One inverted-index join between batch postings and the
    corpus shingle ledger (operators/dedup.py neardup_against_corpus);
    history work is the ledger lookup, never corpus×corpus pairing.
    Best-match ties break to the smallest corpus id so both engines
    pick identical rows."""
    from whisky_wine_etl_spark.operators import dedup as dd

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 4 != 0)
    incoming = docs.filter(F.col("doc_id") % 4 == 0)
    return dd.neardup_against_corpus(corpus, incoming, threshold=0.5)


# ---------------------------------------------------------------------------
# Null-safe equi-join (<=> / IS NOT DISTINCT FROM) — the join semantic
# CDC/merge pipelines rely on (operators/merge.py joins with
# eqNullSafe). Registered standalone so the surface is driver-verified
# directly, not only through the merge operator.
# ---------------------------------------------------------------------------


@query(
    "join_null_safe_eq",
    """
WITH ca AS (
  SELECT c_custkey, CASE WHEN c_custkey % 997 = 0 THEN NULL ELSE c_custkey END AS k
  FROM customer
),
ob AS (
  SELECT o_orderkey, CASE WHEN o_custkey % 997 = 0 THEN NULL ELSE o_custkey END AS k
  FROM orders
)
SELECT ca.c_custkey, CAST(COUNT(ob.o_orderkey) AS BIGINT) AS n_orders
FROM ca JOIN ob ON ca.k IS NOT DISTINCT FROM ob.k
GROUP BY ca.c_custkey
""",
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join: both sides null a sliver of their keys
    (custkey % 997) and join with <=>, so NULL matches NULL instead of
    dropping — every null-keyed customer picks up every null-keyed
    order, the exact semantic an SCD/CDC merge needs for nullable
    business keys. Spark plans EqualNullSafe as an ordinary HASH join
    key (asserted in tests/test_plans_physical.py) — no fallback to a
    nested-loop — so the null-safe form scales identically to `=`."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 997 == 0, F.lit(None))
        .otherwise(F.col("c_custkey"))
        .alias("k"),
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_custkey") % 997 == 0, F.lit(None))
        .otherwise(F.col("o_custkey"))
        .alias("ck"),
    )
    return (
        c.join(o, F.col("k").eqNullSafe(F.col("ck")))
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# C4-style span-level dedup: duplicated fixed-length token spans are
# removed corpus-wide (first occurrence wins), documents report what
# survived — the preprocessing step that catches boilerplate repeated
# ACROSS documents that document-level dedup can't touch.
# ---------------------------------------------------------------------------


@query(
    "corpus_line_dedup",
    """
WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
ln AS (
  SELECT doc_id, CAST(i.i AS BIGINT) AS line_idx,
         array_to_string(toks[(i.i*10+1):(i.i*10+10)], ' ') AS line_text,
         LEAST(len(toks) - i.i*10, 10) AS n_toks
  FROM tk, LATERAL (SELECT unnest(range(0, CAST(ceil(CAST(len(toks) AS DOUBLE) / 10) AS BIGINT))) AS i) i(i)
),
r AS (
  SELECT doc_id, n_toks,
         ROW_NUMBER() OVER (PARTITION BY line_text
                            ORDER BY doc_id, line_idx) AS rn
  FROM ln
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_lines_kept,
       CAST(SUM(n_toks) AS BIGINT) AS n_tokens_kept
FROM r WHERE rn = 1
GROUP BY doc_id
""",
)
def corpus_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide span dedup (the C4 "discard repeated spans" step):
    each document is cut into 10-token lines, every duplicated line
    keeps only its FIRST occurrence ((doc_id, line_idx) order — the
    same deterministic winner rule as exact_dedup), and each doc
    reports how many lines/tokens survived. ~5% of this corpus's
    lines are cross-document duplicates (shared spans of the near-dup
    pairs), so the numbers move.

    Shape: line generation is one narrow transform+explode (the token
    array is materialized once per row, same discipline as shingles);
    the global first-occurrence pick is one window over line_text —
    the same shuffle a groupBy(line_text) would cost, keyed by
    content hash at 100 TB with no skew beyond genuine boilerplate
    (a cap like max_shingle_freq applies if one span dominates);
    the per-doc rollup is a partial-agg'd groupBy."""
    docs = _t(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    lines = (
        docs.select(F.col("doc_id"), F.split("text", " ").alias("__toks"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, CAST(ceil(size(__toks)/10.0) AS INT) - 1),"
                    " i -> named_struct("
                    "'line_idx', CAST(i AS BIGINT),"
                    " 'line_text', array_join(slice(__toks, i*10+1, 10), ' '),"
                    " 'n_toks', least(size(__toks) - i*10, 10)))"
                )
            ).alias("l"),
        )
        .select("doc_id", "l.line_idx", "l.line_text", "l.n_toks")
    )
    w = W.partitionBy("line_text").orderBy("doc_id", "line_idx")
    return (
        lines.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines_kept"),
            F.sum("n_toks").cast("bigint").alias("n_tokens_kept"),
        )
    )


# ---------------------------------------------------------------------------
# Exact rolling median over a moving row frame — the robust smoothing
# baseline (anomaly detection, monitoring) that mean-based rolling
# stats can't give. Also pins that Spark evaluates a full AGGREGATE
# (percentile) as a window function over a bounded frame.
# ---------------------------------------------------------------------------


@query(
    "window_rolling_median",
    """
SELECT event_id, user_id,
       ROUND(quantile_cont(value, 0.5) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) + 1e-9, 4)
         AS rolling_median_24
FROM events
""",
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median of each user's trailing 24 events:
    Spark's `percentile` aggregate evaluated as a window over a
    bounded ROWS frame — one shuffle on user_id, per-row work bounded
    by the frame length, state never exceeds 24 values per row. The
    oracle is DuckDB's quantile_cont over the identical frame; both
    interpolate the even-count middle the same way, and the shared
    1e-9 nudge before 4-dp rounding resolves the exact decimal-half
    midpoints 4-decimal source values produce (same hazard as
    ts_interpolate_linear). (event_id breaks ts ties so both engines
    see identical frames.)"""
    from pyspark.sql import Window as W

    e = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-23, W.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.expr("percentile(value, 0.5)").over(w) + F.lit(1e-9), 4).alias(
            "rolling_median_24"
        ),
    )
