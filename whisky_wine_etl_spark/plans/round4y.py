"""Round-4y: a deletion-neighborhood (FastSS) edit-distance join,
graph modularity of an attribute partition, and an equi-depth
histogram from exact discrete percentiles.

Registered AFTER round4x so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.operators.graph import copurchase_edges
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# FastSS deletion-neighborhood join: every string emits itself plus
# each single-character-deletion variant as join keys; two strings
# within edit distance 1 (substitution, insertion or deletion)
# PROVABLY share a key, so candidate generation is an equi-join on
# short keys — no blocking heuristic, no recall loss, no n² — and a
# final levenshtein confirms. Complements er_blocked_fuzzy_pairs
# (round4d), whose half-string blocking is only complete for
# equal-length strings; deletion neighborhoods cover insert/delete
# too, which is what you want on messy real-world names.
# ---------------------------------------------------------------------------


@query(
    "er_deletion_neighborhood_join",
    """
SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
FROM customer a JOIN customer b
  ON a.c_custkey < b.c_custkey
 AND a.c_mktsegment = 'MACHINERY' AND b.c_mktsegment = 'MACHINERY'
 AND levenshtein(a.c_name, b.c_name) <= 1
""",
)
def er_deletion_neighborhood_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact edit-distance-≤1 pairs via FastSS (k=1) keys.

    Each name of length L yields L+1 keys (itself + L deletions) —
    linear blowup, each key joins within its tiny bucket, so the
    candidate count is Σ|bucket|² over near-duplicate buckets only.
    The oracle is the O(n²) cross join; equality proves the
    neighborhood generation loses nothing. Scale: key generation is
    a codegen'd transform/explode, the join is a plain string
    equi-join — at 100 TB this is the shape dedup services actually
    run (e.g. spell-checker FastSS, Symspell)."""
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "MACHINERY")
        .select("c_custkey", "c_name")
    )
    keys = cust.select(
        "c_custkey",
        "c_name",
        F.explode(
            F.expr(
                "array_union(array(c_name), "
                "transform(sequence(1, length(c_name)), "
                "i -> concat(substring(c_name, 1, i - 1), "
                "substring(c_name, i + 1, length(c_name) - i))))"
            )
        ).alias("k"),
    )
    a, b = keys.alias("a"), keys.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("custkey_a"),
            F.col("a.c_name").alias("name_a"),
            F.col("b.c_custkey").alias("custkey_b"),
            F.col("b.c_name").alias("name_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "dist", F.levenshtein(F.col("name_a"), F.col("name_b")).cast("int")
        )
        .filter(F.col("dist") <= 1)
        .select("custkey_a", "custkey_b", "dist")
    )


# ---------------------------------------------------------------------------
# Modularity of an attribute-induced partition: do parts of the same
# brand get co-purchased more than chance? Q_c = e_c/m − (d_c/2m)²
# per community; every input is an exact integer (edge counts,
# degree sums), so the only float work is the final division.
# ---------------------------------------------------------------------------


@query(
    "graph_modularity_brand",
    """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT x.l_partkey AS pa, y.l_partkey AS pb
  FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  GROUP BY x.l_partkey, y.l_partkey
),
m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM e),
deg AS (
  SELECT p, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT pa AS p FROM e UNION ALL SELECT pb AS p FROM e
  ) GROUP BY p
),
comm_deg AS (
  SELECT pt.p_brand AS brand, SUM(deg.d) AS d_c
  FROM deg JOIN part pt ON pt.p_partkey = deg.p
  GROUP BY pt.p_brand
),
intra AS (
  SELECT pa.p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS e_c
  FROM e JOIN part pa ON pa.p_partkey = e.pa
         JOIN part pb ON pb.p_partkey = e.pb
  WHERE pa.p_brand = pb.p_brand
  GROUP BY pa.p_brand
)
SELECT cd.brand, CAST(COALESCE(i.e_c, 0) AS BIGINT) AS intra_edges,
       CAST(cd.d_c AS BIGINT) AS degree_sum,
       ROUND(COALESCE(i.e_c, 0) / m.m - (cd.d_c / (2 * m.m)) * (cd.d_c / (2 * m.m)), 6) AS q_contrib
FROM comm_deg cd LEFT JOIN intra i ON i.brand = cd.brand, m
ORDER BY cd.brand
""",
)
def graph_modularity_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity contribution per brand over the co-purchase
    graph. Edges come from the shared basket builder (one orderkey
    shuffle); intra-community counting is two broadcast joins against
    the part dim; degree sums are one union+groupBy. All counts are
    exact integers — engines agree bit-for-bit before the rounded
    division. A positive q_contrib means the brand's parts co-occur
    beyond what their popularity predicts."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # r12: e feeds three consumers (the m scalar, deg's union, the
    # intra count) — materialize the basket build + distinct once
    # instead of once per consumer (guide §2.4, same fix as
    # graph_jaccard_brand's measured 2x)
    e = copurchase_edges(li).localCheckpoint(eager=True)
    m = e.agg(F.count(F.lit(1)).cast("double").alias("m"))
    deg = (
        e.select(F.col("pa").alias("p"))
        .unionAll(e.select(F.col("pb").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    comm_deg = (
        deg.join(F.broadcast(part), deg["p"] == part["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.sum("d").alias("d_c"))
    )
    pa = part.select(
        F.col("p_partkey").alias("pa"), F.col("p_brand").alias("brand_a")
    )
    pb = part.select(
        F.col("p_partkey").alias("pb"), F.col("p_brand").alias("brand_b")
    )
    intra = (
        e.join(F.broadcast(pa), "pa")
        .join(F.broadcast(pb), "pb")
        .filter(F.col("brand_a") == F.col("brand_b"))
        .groupBy(F.col("brand_a").alias("brand"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_c"))
    )
    out = (
        comm_deg.join(intra, "brand", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "brand",
            F.coalesce(F.col("e_c"), F.lit(0)).cast("bigint").alias("intra_edges"),
            F.col("d_c").cast("bigint").alias("degree_sum"),
            F.round(
                F.coalesce(F.col("e_c"), F.lit(0)) / F.col("m")
                - (F.col("d_c") / (2 * F.col("m"))) ** 2,
                6,
            ).alias("q_contrib"),
        )
    )
    return out.orderBy("brand")


# ---------------------------------------------------------------------------
# Equi-depth histogram: bucket boundaries are exact discrete deciles
# (percentile_disc — actual data values, so both engines pick the
# identical boundary rows), then one broadcast pass bins every order.
# The fixed-width twin is sketch_quantile_hist; this is the
# equal-mass layout optimizers want for selectivity estimation.
# ---------------------------------------------------------------------------


@query(
    "sketch_equidepth_hist",
    """
WITH rk AS (
  -- explicit rank selection, NOT quantile_disc (its index rule has
  -- varied across DuckDB versions — r8 oracle-fragility audit):
  -- percentile_disc(k/10) = value at 1-based rank ceil(k*n/10),
  -- and ceil(k*n/10) = (k*n+9)//10 in pure integers. Matches the
  -- Spark side's coarse-histogram + in-bin exact ranking.
  -- PRECONDITION n >= 10: with fewer rows the decile ranks collide,
  -- this rn IN (...) dedups the colliding bounds while the Spark
  -- side keeps all 9 (possibly duplicate) bounds, and bucket
  -- numbering would diverge. Unreachable on real orders (n >= 1500
  -- at sf0.001) — do NOT reuse this pattern on tiny fixtures.
  SELECT o_totalprice AS v,
         ROW_NUMBER() OVER (ORDER BY o_totalprice) AS rn,
         COUNT(*) OVER () AS n
  FROM orders
),
bounds AS (
  SELECT list(v ORDER BY v) AS bs
  FROM rk
  WHERE rn IN ((1*n+9)//10, (2*n+9)//10, (3*n+9)//10, (4*n+9)//10,
               (5*n+9)//10, (6*n+9)//10, (7*n+9)//10, (8*n+9)//10,
               (9*n+9)//10)
),
binned AS (
  SELECT CAST(len(list_filter(bounds.bs, b -> b < o.o_totalprice)) AS BIGINT) AS bucket,
         o.o_totalprice AS v
  FROM orders o, bounds
)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MIN(v), 2) AS lo, ROUND(MAX(v), 2) AS hi,
       ROUND(SUM(v), 2) AS mass
FROM binned GROUP BY bucket ORDER BY bucket
""",
)
def sketch_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-mass decile histogram of o_totalprice.

    percentile_disc returns actual data values (no interpolation), so
    the 9 boundaries are deterministic across engines; they travel as
    ONE broadcast row and binning is a codegen'd array filter —
    bucket k = # boundaries strictly below the value. Two passes
    total; no global sort. Bucket populations differ from n/10 only
    by boundary ties, which the lo/hi columns expose."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    # Exact decile boundaries WITHOUT nine sort-aggregates (each
    # percentile_disc is its own full-column sort — measured 9x cost):
    # one coarse histogram locates each target rank's bin, then only
    # those bins' rows (≤ 9/600ths of the data) are ranked exactly.
    # percentile_disc(p) = value at 1-based sorted rank ceil(p·n).
    d = o.select(F.col("o_totalprice").alias("v"))
    hist = (
        d.groupBy(F.floor(F.col("v") / 1000).cast("bigint").alias("bin"))
        .agg(F.count(F.lit(1)).alias("bn"))
    )
    wbin = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "bin",
        (F.sum("bn").over(wbin) - F.col("bn")).alias("below"),
        F.sum("bn").over(wbin).alias("through"),
        F.sum("bn").over(wall).alias("n"),
    )
    qs = spark.range(1, 10).select(F.col("id").alias("q"))
    targets = qs.join(F.broadcast(cum.select("n").limit(1)), how="cross").select(
        "q", F.ceil(F.col("q") * F.col("n") / 10).alias("r")
    )
    tbins = targets.join(
        F.broadcast(cum),
        (F.col("below") < F.col("r")) & (F.col("r") <= F.col("through")),
    ).select("q", "r", "bin", "below")
    in_bins = d.join(
        F.broadcast(tbins.select("bin", "below").distinct()),
        F.floor(F.col("v") / 1000).cast("bigint") == F.col("bin"),
    )
    wrank = Window.partitionBy("bin").orderBy("v")
    ranked = in_bins.select(
        "bin", "v", (F.col("below") + F.row_number().over(wrank)).alias("grank")
    )
    picked = (
        tbins.join(ranked, (tbins["bin"] == ranked["bin"]) & (F.col("grank") == F.col("r")))
        .select("q", "v")
    )
    bounds = picked.groupBy().agg(
        F.array_sort(F.collect_list("v")).alias("bs")
    )
    binned = o.crossJoin(F.broadcast(bounds)).select(
        F.size(F.filter(F.col("bs"), lambda b: b < F.col("o_totalprice")))
        .cast("bigint")
        .alias("bucket"),
        F.col("o_totalprice").alias("v"),
    )
    return (
        binned.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.min("v"), 2).alias("lo"),
            F.round(F.max("v"), 2).alias("hi"),
            F.round(F.sum("v"), 2).alias("mass"),
        )
        .orderBy("bucket")
    )
