"""Round-4h additions: per-node clustering coefficient, label-centroid
cosine affinity, and funnel conversion latency percentiles.

Registered AFTER round4g (plans.load_all imports this module last) so
the driver's unverified-first ordering keeps the earlier backlog in
the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Local clustering coefficient — the per-node refinement of
# graph_triangle_count: how close each part's co-purchase
# neighborhood is to a clique. The standard community-structure
# signal next to the global triangle census.
# ---------------------------------------------------------------------------


@query(
    "graph_clustering_coeff",
    """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
    SELECT pa AS node FROM e UNION ALL SELECT pb AS node FROM e
  ) GROUP BY node
),
tri AS (
  SELECT ab.pa AS a, ab.pb AS b, bc.pb AS c
  FROM e ab JOIN e bc ON ab.pb = bc.pa
            JOIN e ac ON ac.pa = ab.pa AND ac.pb = bc.pb
),
tv AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b AS node FROM tri
    UNION ALL SELECT c AS node FROM tri
  ) GROUP BY node
)
SELECT d.node, d.degree, COALESCE(t.n_tri, 0) AS n_tri,
       ROUND(CAST(2 * COALESCE(t.n_tri, 0) AS DOUBLE)
             / (d.degree * (d.degree - 1)), 6) AS coeff
FROM deg d LEFT JOIN tv t USING (node)
WHERE d.degree >= 2
""",
)
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient over the part
    co-purchase graph: 2·T(v) / (d(v)·(d(v)−1)) for nodes with
    degree ≥ 2, where T(v) counts triangles through v.

    Scale plan: the id-ordered edge list is built once and reused by
    all three frames (degrees = one explode + count, triangles = the
    same two hash joins as graph_triangle_count, per-node counts =
    explode each triangle into its 3 vertices + count). The coeff is
    a single correctly-rounded division of exact integers, so there
    is no float-parity surface. For hub-skewed graphs the middle
    join's Σd(v)² cost is bounded by degree orientation (point edges
    low→high degree) — id order suffices on this corpus and keeps
    the oracle textually identical."""
    from whisky_wine_etl_spark.operators.graph import copurchase_edges

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # ONE orderkey shuffle (basket emission, operators/graph.py)
    e = copurchase_edges(li).localCheckpoint()  # GC-cleaned (ADVICE r4)
    deg = (
        e.select(F.col("pa").alias("node"))
        .unionAll(e.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    ab, bc, ac = e.alias("ab"), e.alias("bc"), e.alias("ac")
    tri = (
        ab.join(bc, F.col("ab.pb") == F.col("bc.pa"))
        .join(
            ac,
            (F.col("ac.pa") == F.col("ab.pa")) & (F.col("ac.pb") == F.col("bc.pb")),
        )
        .select(
            F.col("ab.pa").alias("a"), F.col("ab.pb").alias("b"), F.col("bc.pb").alias("c")
        )
    )
    tv = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tri"))
    )
    return (
        deg.join(tv, "node", "left")
        .filter(F.col("degree") >= 2)
        .select(
            "node",
            "degree",
            F.coalesce("n_tri", F.lit(0)).cast("bigint").alias("n_tri"),
            F.round(
                (2 * F.coalesce("n_tri", F.lit(0))).cast("double")
                / (F.col("degree") * (F.col("degree") - 1)),
                6,
            ).alias("coeff"),
        )
    )


# ---------------------------------------------------------------------------
# Label-centroid cosine affinity — the class-confusability map over
# the embedding space: which label clusters sit close enough that a
# nearest-centroid classifier (sim_kmeans/sim_knn) would blur them.
# ---------------------------------------------------------------------------


@query(
    "sim_centroid_affinity",
    """
WITH v AS (
  SELECT label, generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
),
c AS (
  SELECT label, dim, AVG(val) AS cv FROM v GROUP BY label, dim
),
n AS (
  SELECT label, SQRT(SUM(cv * cv)) AS nrm FROM c GROUP BY label
),
d AS (
  SELECT x.label AS label_a, y.label AS label_b, SUM(x.cv * y.cv) AS dot
  FROM c x JOIN c y ON x.dim = y.dim AND x.label < y.label
  GROUP BY x.label, y.label
)
SELECT label_a, label_b,
       ROUND(d.dot / (na.nrm * nb.nrm), 4) AS cosine
FROM d JOIN n na ON na.label = d.label_a
       JOIN n nb ON nb.label = d.label_b
""",
)
def sim_centroid_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between per-label embedding
    centroids (k=10 labels → 45 pairs).

    Scale plan: posexplode collapses the corpus to a (label, dim)
    aggregate in one map-side-combinable shuffle of k·d = 640 rows;
    everything downstream (norms, the dim-keyed pair join) runs on
    that tiny frame and broadcasts. The corpus-proportional work is
    exactly one pass, independent of k²."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "label", F.posexplode("embedding").alias("pos", "val")
    )
    c = (
        emb.select("label", (F.col("pos") + 1).alias("dim"), F.col("val").cast("double").alias("val"))
        .groupBy("label", "dim")
        .agg(F.avg("val").alias("cv"))
        .localCheckpoint()
    )
    n = c.groupBy("label").agg(F.sqrt(F.sum(F.col("cv") * F.col("cv"))).alias("nrm"))
    x, y = c.alias("x"), c.alias("y")
    d = (
        x.join(y, (F.col("x.dim") == F.col("y.dim")) & (F.col("x.label") < F.col("y.label")))
        .groupBy(F.col("x.label").alias("label_a"), F.col("y.label").alias("label_b"))
        .agg(F.sum(F.col("x.cv") * F.col("y.cv")).alias("dot"))
    )
    na, nb = n.alias("na"), n.alias("nb")
    return (
        d.join(F.broadcast(na), F.col("na.label") == F.col("label_a"))
        .join(F.broadcast(nb), F.col("nb.label") == F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            F.round(F.col("dot") / (F.col("na.nrm") * F.col("nb.nrm")), 4).alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# Funnel conversion latency — events_funnel_conversion counts who
# converts; this measures HOW FAST: time from first view to the first
# purchase after it, with the percentile spread growth teams track.
# ---------------------------------------------------------------------------


@query(
    "events_funnel_latency",
    """
WITH fv AS (
  SELECT user_id, MIN(epoch_us(ts)) AS mv
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
conv AS (
  SELECT fv.user_id, MIN(epoch_us(e.ts)) - fv.mv AS lat_us
  FROM fv JOIN events e
    ON e.user_id = fv.user_id
   AND e.event_type = 'purchase' AND epoch_us(e.ts) >= fv.mv
  GROUP BY fv.user_id, fv.mv
)
SELECT CAST((SELECT COUNT(*) FROM fv) AS BIGINT) AS n_viewers,
       CAST(COUNT(*) AS BIGINT) AS n_converted,
       ROUND(quantile_cont(CAST(lat_us AS DOUBLE) / 3600000000, 0.5), 4)
         AS median_hours,
       ROUND(quantile_cont(CAST(lat_us AS DOUBLE) / 3600000000, 0.9), 4)
         AS p90_hours
FROM conv
""",
)
def events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→purchase conversion latency: per user, the gap from their
    first view to the first purchase at-or-after it, summarized as
    converted-user count plus exact median/p90 latency in hours.

    Scale plan: first-view is one keyed aggregate; the purchase pass
    joins on user_id (hash join on the same key — a co-partitioned
    shuffle, no broadcast of a SF-scaled side) with the time predicate
    evaluated post-join; latencies are exact integer microseconds
    divided once, so the only float op before the percentile is
    correctly rounded. The final exact percentile aggregates one row
    per converted user (ObjectHashAggregate with partials); the 100 TB
    profile swaps it for approx_percentile unchanged in shape."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("mv"))
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("us").alias("pus")
    )
    conv = (
        fv.join(pur, "user_id")
        .filter(F.col("pus") >= F.col("mv"))
        .groupBy("user_id", "mv")
        .agg((F.min("pus") - F.col("mv")).alias("lat_us"))
        .select((F.col("lat_us") / F.lit(3600000000.0)).alias("lat_h"))
    )
    n_viewers = fv.agg(F.count(F.lit(1)).cast("bigint").alias("n_viewers"))
    return conv.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.round(F.percentile("lat_h", F.lit(0.5)), 4).alias("median_hours"),
        F.round(F.percentile("lat_h", F.lit(0.9)), 4).alias("p90_hours"),
    ).crossJoin(F.broadcast(n_viewers)).select(
        "n_viewers", "n_converted", "median_hours", "p90_hours"
    )
