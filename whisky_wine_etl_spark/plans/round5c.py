"""Round-5c: DBSCAN — the density-based clustering family the engine
lacked (kmeans = centroid-based, semantic_dedup = threshold merge;
DBSCAN finds arbitrary-shape dense regions AND labels noise, with no
k). One registration (backlog 140 + 1 = 141 ≤ 150).

Exactness is the unusual part: DBSCAN is normally order-dependent in
its border assignment, but (a) core/noise status is a pure density
predicate, (b) cluster ids are min-reachable-core-id (deterministic),
and (c) borders attach to the MINIMUM cluster id among their core
neighbors — so the whole output is engine-independent and gets a full
recursive-CTE DuckDB oracle (the dedup_clusters precedent applied to
spatial density).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.materialize import materialize
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_DBSCAN_MINPTS = 10  # neighbors within eps, self excluded
_DBSCAN_C = 1.07  # eps² = C / n — keeps expected neighbor count ~17 at every SF


@query(
    "sim_dbscan_embedding",
    f"""
WITH RECURSIVE p AS (
  SELECT vec_id AS pid,
         CAST(embedding[1] AS DOUBLE) AS x,
         CAST(embedding[2] AS DOUBLE) AS y
  FROM embeddings
),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM p),
nb AS (
  SELECT a.pid AS pa, b.pid AS pb
  FROM p a, p b, nn
  WHERE a.pid <> b.pid
    AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)
        <= CAST({_DBSCAN_C} AS DOUBLE) / nn.n
),
core AS (
  SELECT pa AS pid FROM nb GROUP BY pa HAVING COUNT(*) >= {_DBSCAN_MINPTS}
),
ce1 AS (
  SELECT nb.pa, nb.pb FROM nb
  JOIN core ca ON ca.pid = nb.pa
  JOIN core cb ON cb.pid = nb.pb
  WHERE nb.pa < nb.pb
),
cedges AS (SELECT pa AS src, pb AS dst FROM ce1
           UNION SELECT pb, pa FROM ce1),
reach(a, b) AS (
  SELECT pid, pid FROM core
  UNION
  SELECT r.a, e.dst FROM reach r JOIN cedges e ON r.b = e.src
),
cc AS (SELECT a AS pid, MIN(b) AS cluster_id FROM reach GROUP BY a),
border AS (
  SELECT nb.pa AS pid, MIN(cc.cluster_id) AS cluster_id
  FROM nb JOIN cc ON cc.pid = nb.pb
  WHERE nb.pa NOT IN (SELECT pid FROM core)
  GROUP BY nb.pa
)
SELECT p.pid AS vec_id,
       CASE WHEN cc.pid IS NOT NULL THEN 'core'
            WHEN border.pid IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role,
       CAST(COALESCE(cc.cluster_id, border.cluster_id) AS BIGINT)
         AS cluster_id
FROM p
LEFT JOIN cc ON cc.pid = p.pid
LEFT JOIN border ON border.pid = p.pid
""",
)
def sim_dbscan_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN over the embedding cloud's first two dimensions:
    eps² = 1.07/n (self-normalizing — expected eps-ball occupancy is
    constant at every SF), minPts = 10 neighbors. Output per vector:
    role ∈ {core, border, noise} and the cluster id (min reachable
    core id; border points take the MIN cluster among their core
    neighbors; noise gets NULL). On this radially-dense synthetic
    cloud that yields one dominant dense cluster, a few satellite
    micro-clusters, and a ~25% noise/border fringe — stable across
    SFs by construction of eps².

    Scale shape: neighbor pairs come from the eps-sized GRID (each
    point probes its 3×3 neighbor cells — candidates ∝ occupancy of
    9 cells, never n²; the all-pairs form exists only in the oracle),
    the density predicate is one groupBy over the candidate pairs,
    and components run on the CORE-CORE subgraph via alternating
    large-star/small-star (O(log diameter) rounds — plain label
    propagation needs diameter rounds and this blob's core graph is
    ~35 hops across at sf0.1). Exactness: coordinates are float→double
    casts of stored values (bit-identical both engines), the eps²
    comparison is pure IEEE arithmetic on them, and every cluster
    label is an integer min."""
    from whisky_wine_etl_spark.operators.dedup import connected_components_star

    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("pid"),
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    )
    nn = emb.agg(F.count(F.lit(1)).cast("double").alias("n"))
    # eps and grid cells materialized once: the 3×3 probe side, the
    # cell side, and the final left joins all read this frame
    pts = (
        emb.crossJoin(F.broadcast(nn))
        .withColumn("eps2", F.lit(_DBSCAN_C) / F.col("n"))
        .withColumn("eps", F.sqrt("eps2"))
        .withColumn("cx", F.floor(F.col("x") / F.col("eps")).cast("long"))
        .withColumn("cy", F.floor(F.col("y") / F.col("eps")).cast("long"))
        .drop("n")
        # eager=False (r13): materialized by the first downstream job
        # (the CC convergence checksum via nb/core, ultimately) —
        # persist-once semantics unchanged, eager setup jobs folded;
        # policy tier: the point frame is fact-scale
        .transform(lambda d: materialize(d, fact_scale=True))
    )
    offsets = F.expr(
        "explode(flatten(transform(sequence(-1, 1),"
        " dx -> transform(sequence(-1, 1),"
        " dy -> named_struct('dx', dx, 'dy', dy)))))"
    )
    probe = pts.select(
        F.col("pid").alias("pa"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        "eps2",
        "cx",
        "cy",
        offsets.alias("o"),
    ).select(
        "pa",
        "xa",
        "ya",
        "eps2",
        (F.col("cx") + F.col("o.dx")).alias("cx"),
        (F.col("cy") + F.col("o.dy")).alias("cy"),
    )
    cand = probe.join(
        pts.select(
            F.col("pid").alias("pb"),
            F.col("x").alias("xb"),
            F.col("y").alias("yb"),
            "cx",
            "cy",
        ),
        ["cx", "cy"],
    )
    nb = cand.filter(
        (F.col("pa") != F.col("pb"))
        & (
            (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
            + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
            <= F.col("eps2")
        )
    ).select("pa", "pb")
    # the pair frame feeds the density count, the core-edge build and
    # the border attachment — materialize once (eager=False: the CC
    # edge checksum is the first action and pins the whole chain)
    nb = materialize(nb, fact_scale=True)
    core = (
        nb.groupBy("pa")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= _DBSCAN_MINPTS)
        .select(F.col("pa").alias("pid"))
    ).localCheckpoint(eager=False)
    ca = core.select(F.col("pid").alias("pa"))
    cb = core.select(F.col("pid").alias("pb"))
    core_edges = (
        nb.join(ca, "pa").join(cb, "pb").filter(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("p_a"), F.col("pb").alias("p_b"))
    )
    cc = connected_components_star(
        core_edges, nodes=core, id_a="p_a", id_b="p_b"
    )
    cc_lbl = cc.select(F.col("p_id").alias("pid"), "cluster_id")
    border = (
        nb.join(cc_lbl.select(F.col("pid").alias("pb"), "cluster_id"), "pb")
        .join(core.select(F.col("pid").alias("pa")), "pa", "left_anti")
        .groupBy("pa")
        .agg(F.min("cluster_id").alias("b_cluster"))
        .select(F.col("pa").alias("pid"), "b_cluster")
    )
    return (
        pts.select(F.col("pid"))
        .join(cc_lbl, "pid", "left")
        .join(border, "pid", "left")
        .select(
            F.col("pid").alias("vec_id"),
            F.when(F.col("cluster_id").isNotNull(), F.lit("core"))
            .when(F.col("b_cluster").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.coalesce("cluster_id", "b_cluster").cast("bigint").alias(
                "cluster_id"
            ),
        )
    )
