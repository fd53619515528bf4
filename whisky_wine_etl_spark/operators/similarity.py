"""Similarity search over embedding columns (array<float>).

Two paths:
- brute_force_topk: exact cosine top-k per query vector — quadratic,
  JVM-side array math, the correctness baseline and oracle target.
- lsh_topk: random-hyperplane LSH (fixed seed) — signature bucket
  join, exact re-rank within buckets, multiprobe via Hamming-1
  neighbors. The 100 TB path: candidate set ∝ bucket size, never the
  full corpus per query.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from whisky_wine_etl_spark.functions.vector import cosine


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: corpus × queries, rank window per query.
    Rank orders by (rounded cosine desc, candidate id) so results are
    deterministic across engines and partitionings."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    c = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cand_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("query_vec"), F.col("cand_vec")), 6).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id", F.round("cos_sim", 4).alias("cos_sim"), "rk")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_signature(vec_col: F.Column, planes: list[list[float]]) -> F.Column:
    """Sign-of-projection bit signature as a long (n_planes ≤ 63)."""
    sig = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        proj = F.aggregate(
            F.zip_with(vec_col.cast("array<double>"), lit_plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: multi-table hyperplane LSH.

    L independent signature tables of b bits each; a query's candidate
    set is the union over tables of (own bucket + Hamming-1 probes),
    re-ranked by exact cosine. Recall ≈ 1-(1-p_bucket)^L — the standard
    amplification that single-table probing can't reach. At 100 TB the
    candidate set stays ∝ L × bucket size (never the corpus), the
    corpus side is shuffled once on (table, bucket), and the probe side
    is broadcast."""
    c_sigs, q_probe_arrays = [], []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        sig = lsh_signature(F.col(vec_col), planes)
        # disjoint bucket spaces per table: bucket = table * 2^b + sig
        base = F.lit(t * (1 << n_planes)).cast("long")
        c_sigs.append(base + sig)
        q_probe_arrays.extend(
            [base + sig] + [base + sig.bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)]
        )
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cand_vec"),
        F.explode(F.array(*c_sigs)).alias("bucket"),
    )
    probes = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        F.explode(F.array(*q_probe_arrays)).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(probes), "bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("query_vec"), F.col("cand_vec")), 6).alias("cos_sim"),
        )
        .distinct()
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id", F.round("cos_sim", 4).alias("cos_sim"), "rk")
    )
