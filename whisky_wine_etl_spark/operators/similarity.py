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


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    kmeans_iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k via an IVF (inverted-file) index, all DataFrame ops.

    Build: n_lists centroids trained with `kmeans_iters` Lloyd
    iterations (deterministic init = lowest-id vectors; assignment is
    a broadcast cross-join argmin; the centroid update is an exploded
    per-dimension mean). Search: each query probes its `n_probe`
    nearest centroids and re-ranks exactly within those lists only.

    Scale shape: centroids are O(n_lists·dim) — always broadcast; the
    corpus is scanned once per Lloyd iteration and once to build the
    final assignment (at 100 TB: train on a sample instead, same
    code); a query touches ~n_probe/n_lists of the corpus. No
    quadratic stage anywhere."""
    spark = corpus.sparkSession
    c = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cand_vec"))

    def as_centroid_df(rows: list[tuple[int, list[float]]]) -> DataFrame:
        return spark.createDataFrame(rows, "list_id int, centroid array<double>")

    # deterministic init: the n_lists lowest-id vectors. Collecting
    # centroids to the driver each iteration is k·dim values (bounded
    # by the index config, never data-sized) — the same driver loop
    # MLlib's KMeans runs; it keeps every iteration a single flat job
    # instead of a growing lineage.
    init = (
        corpus.orderBy(id_col)
        .limit(n_lists)
        .select(F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"))
        .collect()
    )
    centroids = as_centroid_df([(i + 1, list(r.v)) for i, r in enumerate(init)])

    def nearest(df: DataFrame, vec: str, cents: DataFrame, rank: int) -> DataFrame:
        """rows × centroids → the `rank` nearest list_ids per row."""
        scored = df.crossJoin(F.broadcast(cents)).withColumn(
            "__sim", cosine(F.col(vec), F.col("centroid"))
        )
        w = W.partitionBy(df.columns[0]).orderBy(F.col("__sim").desc(), F.col("list_id"))
        return (
            scored.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= rank)
            .drop("__sim", "__rk", "centroid")
        )

    for _ in range(kmeans_iters):
        assigned = nearest(c, "cand_vec", centroids, 1)
        updated = (
            assigned.select("list_id", F.posexplode("cand_vec").alias("pos", "val"))
            .groupBy("list_id", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("list_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("list_id", F.expr("transform(pm, s -> s.m)").alias("centroid"))
            .collect()
        )
        centroids = as_centroid_df([(r.list_id, list(r.centroid)) for r in updated])

    inverted = nearest(c, "cand_vec", centroids, 1)  # corpus → its list
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec"))
    probes = nearest(q, "query_vec", centroids, n_probe)
    scored = (
        inverted.join(F.broadcast(probes), "list_id")
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
