"""Round-4av: KMV intersection estimation and a PII tokenization
vault round-trip.

Registered AFTER round4au so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query
from whisky_wine_etl_spark.plans.round4ao import _HEX12, _KMV_K, _KMV_SCALE, bottom_k

# ---------------------------------------------------------------------------
# KMV set-operation estimation: with ONE bottom-k sketch of the union
# plus membership bits per side, |A ∩ B| ≈ (k_both / k) · Û  — the
# audience-overlap estimator (DataSketches theta a∩b). Every number
# is engine-portable (md5 + 48-bit integer read), so unlike classic
# theta sketches this one carries a full-value oracle.
# ---------------------------------------------------------------------------

_KMV_I_SQL = f"""
WITH a AS (
  SELECT DISTINCT md5(CAST(l_partkey AS VARCHAR)) AS hx
  FROM lineitem WHERE l_returnflag = 'A'
),
n AS (
  SELECT DISTINCT md5(CAST(l_partkey AS VARCHAR)) AS hx
  FROM lineitem WHERE l_returnflag = 'N'
),
u AS (SELECT hx FROM a UNION SELECT hx FROM n),
s AS (
  SELECT hx, ROW_NUMBER() OVER (ORDER BY hx) AS rk FROM u
),
sk AS (
  SELECT hx FROM s WHERE rk <= {_KMV_K}
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_in_sketch,
         MAX(hx) AS kth_hex,
         CAST(COUNT(*) FILTER (WHERE hx IN (SELECT hx FROM a)
                                 AND hx IN (SELECT hx FROM n)) AS BIGINT)
           AS k_both
  FROM sk
),
ex AS (
  SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS n_a,
         CAST((SELECT COUNT(*) FROM n) AS BIGINT) AS n_b,
         CAST((SELECT COUNT(*) FROM a WHERE hx IN (SELECT hx FROM n))
              AS BIGINT) AS n_exact
)
SELECT ex.n_a, ex.n_b, ex.n_exact,
       ROUND(CASE WHEN m.n_in_sketch < {_KMV_K}
                  THEN CAST(m.k_both AS DOUBLE)
                  ELSE m.k_both * (CAST({_KMV_SCALE} AS DOUBLE)
                       / CAST(({_HEX12}) AS DOUBLE)) / {_KMV_K}
             END, 3) AS kmv_est,
       ROUND((CASE WHEN m.n_in_sketch < {_KMV_K}
                   THEN CAST(m.k_both AS DOUBLE)
                   ELSE m.k_both * (CAST({_KMV_SCALE} AS DOUBLE)
                        / CAST(({_HEX12}) AS DOUBLE)) / {_KMV_K}
              END - ex.n_exact) * 100.0 / ex.n_exact, 2) AS rel_err_pct
FROM m CROSS JOIN ex
"""


@query("sketch_kmv_intersection", _KMV_I_SQL)
def sketch_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intersection-cardinality estimate for two part populations
    (returned vs no-issue lineitems) from ONE bottom-k sketch of
    their union: the k smallest union hashes are a uniform sample of
    the union, so the fraction also present in both sides times the
    union estimate is |A∩B| — sub-linear set intersection without
    co-shuffling the raw sets, and (because the hash is md5 and the
    estimator reads exact 48-bit integers) under a FULL-value DuckDB
    oracle, which theta-sketch libraries can never offer. When the
    union fits inside k the sketch degrades to the exact answer, and
    the emitted rel_err_pct audits the estimate against the exact
    intersection computed alongside."""
    li = load_table(spark, sf_dir, "lineitem")
    hx = F.md5(F.col("l_partkey").cast("string")).alias("hx")
    # r12: each side feeds the union sketch, the membership flags AND
    # the exact-intersection audit — materialize the filtered distinct
    # once per side instead of once per consumer (guide §2.4)
    a = (
        li.filter(F.col("l_returnflag") == "A")
        .select(hx)
        .distinct()
        .localCheckpoint(eager=True)
    )
    b = (
        li.filter(F.col("l_returnflag") == "N")
        .select(hx)
        .distinct()
        .localCheckpoint(eager=True)
    )
    u = (
        a.unionByName(b)
        .distinct()
        .select(F.lit("__u").alias("grp"), "hx")
    )
    sk = bottom_k(u).select("hx")
    flagged = (
        sk.join(a.withColumn("in_a", F.lit(1)), "hx", "left")
        .join(b.withColumn("in_b", F.lit(1)), "hx", "left")
    )
    m = flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_in_sketch"),
        F.max("hx").alias("kth_hex"),
        F.count(F.when(F.col("in_a").isNotNull() & F.col("in_b").isNotNull(), 1))
        .cast("bigint")
        .alias("k_both"),
    )
    ex = (
        a.withColumn("in_a", F.lit(1))
        .join(b, "hx", "left_semi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
        .crossJoin(a.agg(F.count(F.lit(1)).cast("bigint").alias("n_a")))
        .crossJoin(b.agg(F.count(F.lit(1)).cast("bigint").alias("n_b")))
    )
    v48 = F.conv(F.substring("kth_hex", 1, 12), 16, 10).cast("bigint")
    u_est = F.lit(float(_KMV_SCALE)) / v48.cast("double")
    est = F.when(
        F.col("n_in_sketch") < _KMV_K, F.col("k_both").cast("double")
    ).otherwise(F.col("k_both") * u_est / F.lit(_KMV_K))
    return (
        m.crossJoin(F.broadcast(ex))
        .select(
            "n_a",
            "n_b",
            "n_exact",
            F.round(est, 3).alias("kmv_est"),
            F.round(
                (est - F.col("n_exact")) * 100.0 / F.col("n_exact"), 2
            ).alias("rel_err_pct"),
        )
    )


# ---------------------------------------------------------------------------
# Tokenization vault: PII leaves the analytical path as opaque tokens;
# a separate vault table is the ONLY way back to the identity — the
# pseudonymization architecture GDPR pipelines deploy (complementing
# corpus_pii_redact, which destroys, and etl_cascade_delete, which
# erases).
# ---------------------------------------------------------------------------


@query(
    "privacy_tokenization_vault",
    """
SELECT c.c_name,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_name
""",
)
def privacy_tokenization_vault(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudonymization round-trip: customer names are replaced by
    salted deterministic tokens, the order rollup is computed over
    the TOKENIZED frame (PII never enters the aggregate path), and
    identities return only through the vault join at the very end.
    The oracle aggregates directly by name — a green row proves the
    tokenize → aggregate → re-identify path loses nothing and
    collides nowhere. Deterministic tokens keep the aggregation
    groupable and idempotent across runs; rotating the salt literal
    re-keys the whole vault (the crypto-shredding lever)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    token = F.concat(
        F.lit("tok_"), F.substring(F.md5(F.concat(F.col("c_name"), F.lit("sg1"))), 1, 16)
    )
    tokenized = c.select(F.col("c_custkey"), token.alias("tok"))
    vault = c.select(token.alias("tok"), F.col("c_name")).distinct()
    agg = (
        o.join(tokenized, o.o_custkey == tokenized.c_custkey)
        .groupBy("tok")
        .agg(
            F.count("o_orderkey").cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )
    return agg.join(vault, "tok").select("c_name", "n_orders", "revenue")
