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
    deterministic across engines and partitionings.

    Each side's L2 norm is precomputed ONCE per row before the cross
    join — computing cosine() per pair would fold both norms again for
    every pair (3 array folds instead of 1 on the quadratic path)."""
    from whisky_wine_etl_spark.functions.vector import dot, norm

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cand_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(
                dot(F.col("query_vec"), F.col("cand_vec"))
                / (F.col("q_norm") * F.col("c_norm")),
                6,
            ).alias("cos_sim"),
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
    c = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cand_vec"))

    # Centroids live on the driver between iterations — k·dim values,
    # bounded by the index config, never data-sized (MLlib's KMeans
    # keeps the same driver loop). Embedding them as LITERAL arrays
    # makes both assignment and probing pure narrow expressions: each
    # Lloyd iteration is one scan + one tiny (n_lists×dim)-row
    # aggregate, with no crossJoin, no per-row window, no shuffle of
    # the corpus — the shape that survives a 100 TB corpus (where
    # training would run on a sample through this same code).
    init = (
        corpus.orderBy(id_col)
        .limit(n_lists)
        .select(F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"))
        .collect()
    )
    centroids: list[tuple[int, list[float]]] = [
        (i + 1, list(r.v)) for i, r in enumerate(init)
    ]

    def with_sims(df: DataFrame, vec: str) -> DataFrame:
        """Attach __sims: array<struct<sim,list_id>> of the row's cosine
        to every centroid. Built as ONE parsed SQL string — composing
        n_lists×dim literals through the Python Column API would cost a
        py4j round-trip per literal and dominate planning time. The
        centroid norms are plain Python constants folded into the text."""
        import math

        df2 = df.withColumn(
            "__vd", F.expr(f"transform({vec}, x -> cast(x as double))")
        ).withColumn(
            "__vnorm",
            F.expr("sqrt(aggregate(transform(__vd, x -> x*x), 0.0D, (a, x) -> a+x))"),
        )
        parts = []
        for lid, cv in centroids:
            arr = ",".join(repr(x) + "D" for x in cv)
            cnorm = math.sqrt(sum(x * x for x in cv)) or 1.0
            parts.append(
                f"named_struct('sim', aggregate(zip_with(__vd, array({arr}),"
                f" (x, y) -> x*y), 0.0D, (a, x) -> a+x) / (__vnorm * {cnorm!r}D),"
                f" 'list_id', {lid})"
            )
        return df2.withColumn("__sims", F.expr("array(" + ",".join(parts) + ")"))

    # struct max is lexicographic on (sim, list_id): argmax cosine,
    # deterministic tie-break on the higher list id
    nearest_one = "array_max(__sims).list_id"

    for _ in range(kmeans_iters):
        updated = (
            with_sims(c, "cand_vec")
            .select(F.expr(nearest_one).alias("list_id"), "cand_vec")
            .select("list_id", F.posexplode("cand_vec").alias("pos", "val"))
            .groupBy("list_id", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("list_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("list_id", F.expr("transform(pm, s -> s.m)").alias("centroid"))
            .collect()
        )
        centroids = [(r.list_id, list(r.centroid)) for r in updated]

    inverted = with_sims(c, "cand_vec").select(
        "cand_id", "cand_vec", F.expr(nearest_one).alias("list_id")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec"))
    probes = with_sims(q, "query_vec").select(
        "query_id",
        "query_vec",
        F.explode(
            F.expr(
                f"transform(slice(reverse(array_sort(__sims)), 1, {n_probe}), s -> s.list_id)"
            )
        ).alias("list_id"),
    )
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


def lsh_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs (cosine ≥ threshold) via multi-table
    hyperplane LSH: bucket-join candidates (a.id < b.id), exact cosine
    verify. The all-pairs brute force (operators/dedup.py
    embedding_near_dup_pairs) is the oracle twin; this is the path
    whose work scales with bucket collisions instead of n²."""
    sigs = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        base = F.lit(t * (1 << n_planes)).cast("long")
        sigs.append(base + lsh_signature(F.col(vec_col), planes))
    bucketed = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.explode(F.array(*sigs)).alias("bucket"),
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("vec_a"),
            F.col("b.id").alias("vec_b"),
            F.round(cosine(F.col("a.vec"), F.col("b.vec")), 4).alias("cos_sim"),
        )
        .distinct()
        .filter(F.col("cos_sim") >= threshold)
    )
