"""Round-4ai: maximum inner-product search (MIPS) by the augmented-
vector reduction to cosine ANN.

Inner product is not a metric (no triangle inequality), so cosine/
Euclidean ANN indexes can't serve it directly. The classic reduction
(Bachrach et al. 2014): scale the corpus into the unit ball by the
max norm M and append sqrt(1 − ‖x/M‖²) as an extra coordinate —
augmented vectors are unit-norm and cos(q⁺, x⁺) ∝ ⟨q, x⟩ for any
fixed query, so the EXISTING hyperplane-LSH top-k machinery answers
MIPS with zero new index code.

Registered AFTER round4ah; rows-only driver check (LSH recall is
probabilistic) with recall pinned against the exact IP scorer in
tests/test_round4ai_ops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.functions.vector import dot, norm
from whisky_wine_etl_spark.operators.similarity import lsh_topk
from whisky_wine_etl_spark.plans.registry import query


@query("sim_topk_mips")  # LSH recall probabilistic → rows-only driver check
def sim_topk_mips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 inner-product neighbors for the 5 lowest vec_ids via the
    MIPS→cosine augmentation over the shared LSH index path.

    The augmentation is pure JVM array math (transform + one sqrt)
    and adds ONE dimension; M is a 1-row broadcast. Ranking happens
    on augmented cosine (order-equivalent to inner product); the
    emitted `ip` column is the exact inner product of the ORIGINAL
    vectors, recomputed on the winners only."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    m = emb.agg(F.max(norm(F.col("embedding"))).alias("m"))

    def augment(df: DataFrame, is_query: bool) -> DataFrame:
        scaled = F.expr("transform(embedding, e -> CAST(e AS DOUBLE) / m)")
        tail = (
            F.lit(0.0)
            if is_query
            else F.sqrt(
                F.greatest(
                    F.lit(0.0),
                    1 - dot(F.col("embedding"), F.col("embedding")) / (F.col("m") * F.col("m")),
                )
            )
        )
        return df.crossJoin(F.broadcast(m)).select(
            "vec_id",
            F.concat(scaled, F.array(tail)).cast("array<float>").alias("embedding"),
        )

    queries = emb.orderBy("vec_id").limit(5)
    corpus_aug = augment(emb, is_query=False)
    queries_aug = augment(queries, is_query=True)
    hits = lsh_topk(corpus_aug, queries_aug, k=5, dim=65).select(
        "query_id", "cand_id", "rk"
    )
    qv = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    cv = emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cv"))
    return (
        hits.join(F.broadcast(qv), "query_id")
        .join(cv, "cand_id")
        .select(
            "query_id",
            "cand_id",
            F.round(dot(F.col("qv"), F.col("cv")), 6).alias("ip"),
            "rk",
        )
        .orderBy("query_id", "rk")
    )
