"""Round-3 registrations: skew-safe fact-fact join variant + second
real multimodal codec (binary PPM).

Registered LAST in plans.load_all() so these sort behind every
previously-registered query still awaiting a driver CORRECTNESS row —
the driver's budget-capped run must verify the backlog first
(__spark_entry__.queries() orders unverified-first, ties by
registration order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.operators import multimodal as mm
from whisky_wine_etl_spark.operators.agg import salted_join
from whisky_wine_etl_spark.plans.registry import ORACLES, query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query("q8_market_share_skew_safe", ORACLES["q8_market_share"])
def q8_market_share_skew_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 with its one fact-fact edge (lineitem⋈orders on orderkey)
    executed as an EXPLICIT salted join (operators/agg.py salted_join):
    lineitem rows get a uniform random salt, orders replicates across
    the salt range via one explode, and the join key becomes
    (orderkey, salt) — a hot orderkey's rows spread over salt_buckets
    reducers instead of one straggler. Same oracle as q8_market_share:
    salting an inner equi-join is result-invariant, which the driver's
    value-hash pins. The dim edges are identical to q8 (nation/region
    hinted, SF-scaled tables left to AQE). This is the manual fallback
    for plans AQE's skew-join split can't reach; the AQE path itself
    is plan-tested in test_aqe_splits_skewed_join_partitions."""
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
    fact = salted_join(li, o, "l_orderkey", "o_orderkey")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        fact.join(p, F.col("l_partkey") == p.p_partkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n_cust), c.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(r), F.col("n1.n_regionkey") == r.r_regionkey)
        .join(s, F.col("l_suppkey") == s.s_suppkey)
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
    "mm_resize_ppm",
    """
WITH dims AS (
  SELECT doc_id, CAST(8 + doc_id % 9 AS BIGINT) AS w,
         CAST(8 + (doc_id * 3) % 7 AS BIGINT) AS h
  FROM documents
),
grid AS (
  SELECT gx.x AS xt, gy.y AS yt
  FROM generate_series(0, 9) gx(x), generate_series(0, 9) gy(y)
),
px AS (
  SELECT d.doc_id,
         (d.doc_id*7  + ((xt*d.w)//10)*3  + ((yt*d.h)//10)*5) % 256
       + (d.doc_id*11 + ((xt*d.w)//10)*13 + ((yt*d.h)//10))   % 256
       + (d.doc_id*3  + ((xt*d.w)//10)    + ((yt*d.h)//10)*17) % 256 AS s
  FROM dims d CROSS JOIN grid
)
SELECT doc_id, CAST(10 AS INT) AS width, CAST(10 AS INT) AS height,
       CAST(313 AS INT) AS n_bytes, CAST(SUM(s) AS BIGINT) AS pixel_sum
FROM px GROUP BY doc_id
""",
)
def mm_resize_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-codec resize over binary PPM (P6): same pipeline as
    mm_resize_real but the corpus is encoded with the second codec
    (functions/ppm.py) and resize_payload_real's magic sniffing picks
    it per row — decode → nearest-resample to 10×10 → re-encode as
    PPM → decode again. The oracle's closed-form pixel grid is shared
    with the BMP query (the synthetic image is format-independent);
    only n_bytes differs: 13-byte "P6\\n10 10\\n255\\n" header + 300
    unpadded RGB bytes = 313, vs BMP's 374 (54-byte header + 4-byte
    row padding). A header, ordering, or truncation bug in the PPM
    codec shifts pixel_sum or n_bytes off the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    resized = mm.resize_payload_real(mm.synthesize_ppm_corpus(docs))
    return resized.select("doc_id", "width", "height", "n_bytes", "pixel_sum")
