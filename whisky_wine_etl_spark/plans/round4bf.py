"""Round-4bf: farthest-first k-center seeding and IPv4 functions.

Registered AFTER round4be so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.

- ``sim_kcenter_greedy`` is the deterministic cousin of k-means++
  initialization: Gonzalez' farthest-first traversal, the 2-approx
  k-center seeding used to spread codebook/curriculum anchors across
  an embedding corpus. Every round is one distributed pass (corpus ×
  ≤k broadcast centers → min-distance → TakeOrdered argmax); rounded
  distances + id tie-breaks make the trajectory engine-exact.
- ``func_inet_pack`` adds the network-functions surface (inet_aton /
  subnet aggregation / CIDR membership) that Spark has no builtin
  for — pure integer string algebra, exact on any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query

_KC = 5


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_KC_STEP = """
dm{k} AS MATERIALIZED (
  SELECT vec_id, MIN(cd) AS dnear FROM (
    SELECT e.vec_id,
           ROUND(1 - (
             SUM(CAST(e.embedding[t.i] AS DOUBLE)
                 * CAST(c.embedding[t.i] AS DOUBLE))
             / (SQRT(SUM(CAST(e.embedding[t.i] AS DOUBLE)
                         * CAST(e.embedding[t.i] AS DOUBLE)))
                * SQRT(SUM(CAST(c.embedding[t.i] AS DOUBLE)
                           * CAST(c.embedding[t.i] AS DOUBLE))))
           ), 6) AS cd
    FROM embeddings e
    JOIN sel{p} s ON e.vec_id <> s.vec_id
    JOIN embeddings c ON c.vec_id = s.vec_id,
         LATERAL (SELECT unnest(range(1, 65)) AS i) t(i)
    WHERE e.vec_id NOT IN (SELECT vec_id FROM sel{p})
    GROUP BY e.vec_id, s.vec_id
  ) z GROUP BY vec_id
),
far{k} AS MATERIALIZED (
  SELECT vec_id, dnear FROM dm{k}
  ORDER BY dnear DESC, vec_id LIMIT 1
),
sel{k} AS MATERIALIZED (
  SELECT vec_id, rnk, dnear FROM sel{p}
  UNION ALL SELECT vec_id, {k}, dnear FROM far{k}
)
"""


@query(
    "sim_kcenter_greedy",
    """
WITH sel1 AS MATERIALIZED (
  SELECT MIN(vec_id) AS vec_id, 1 AS rnk, CAST(0 AS DOUBLE) AS dnear
  FROM embeddings
),
"""
    + ",".join(_KC_STEP.format(k=k, p=k - 1) for k in range(2, _KC + 1))
    + f"""
SELECT rnk, vec_id, ROUND(dnear, 6) AS dist_to_nearest
FROM sel{_KC}
""",
)
def sim_kcenter_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Farthest-first traversal (Gonzalez k-center, the
    deterministic k-means++ seeding): start from the min-id vector,
    then 4× pick the point maximizing its cosine distance to the
    nearest already-chosen center (ties → lower id).

    Per round the engine runs corpus ⋈ broadcast(centers) (≤k rows),
    a groupBy-min per point, and a TakeOrderedAndProject argmax — no
    quadratic pair materialization, no driver-side distance math;
    the selected-set state is k rows. Distances are rounded to 6 dp
    before the min/argmax so the greedy trajectory is identical
    across engines; the oracle replays it as unrolled materialized
    CTE levels (each level joins the corpus against the ≤k chosen
    ids only)."""
    from whisky_wine_etl_spark.functions.vector import dot, norm

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("nn")
    )
    # eager=False checkpoints (r13): each greedy step's checkpoint is
    # materialized by the next step's broadcast build (and ultimately
    # the final collect) — same persist-once semantics and identical
    # per-step plans, but the 4 per-step eager jobs fold away.
    emb = emb.localCheckpoint(eager=False)  # GC-cleaned, unlike persist
    first = emb.agg(F.min("vec_id").alias("vec_id")).select(
        "vec_id", F.lit(1).alias("rnk"), F.lit(0.0).alias("dnear")
    )
    sel = first.localCheckpoint(eager=False)
    for k in range(2, _KC + 1):
        centers = sel.join(emb, "vec_id").select(
            F.col("vec_id").alias("c_id"),
            F.col("embedding").alias("ce"),
            F.col("nn").alias("cn"),
        )
        dm = (
            emb.crossJoin(F.broadcast(centers))
            .filter(F.col("vec_id") != F.col("c_id"))
            .join(
                F.broadcast(sel.select(F.col("vec_id").alias("x_id"))),
                F.col("vec_id") == F.col("x_id"),
                "left_anti",
            )
            .select(
                "vec_id",
                F.round(
                    1
                    - dot(F.col("embedding"), F.col("ce"))
                    / (F.col("nn") * F.col("cn")),
                    6,
                ).alias("d"),
            )
            .groupBy("vec_id")
            .agg(F.min("d").alias("dnear"))
        )
        far = (
            dm.orderBy(F.col("dnear").desc(), "vec_id")
            .limit(1)
            .select("vec_id", F.lit(k).alias("rnk"), "dnear")
        )
        sel = sel.unionAll(far).localCheckpoint(eager=False)
    return sel.select(
        "rnk", "vec_id", F.round("dnear", 6).alias("dist_to_nearest")
    )


@query(
    "func_inet_pack",
    """
WITH ips AS (
  SELECT '10.' || CAST(user_id % 200 AS VARCHAR)
         || '.' || CAST(CAST(props::JSON ->> 'k' AS BIGINT) % 250 AS VARCHAR)
         || '.' || CAST(event_id % 254 + 1 AS VARCHAR) AS ip,
         user_id
  FROM events
),
parsed AS (
  SELECT ip, user_id,
         CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
       + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
       + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
       + CAST(string_split(ip, '.')[4] AS BIGINT) AS ip_int
  FROM ips
),
tagged AS (
  SELECT ip_int, user_id,
         ip_int // 65536 AS subnet16,
         CASE WHEN ip_int >= 167772160 AND ip_int < 184549376
              THEN 1 ELSE 0 END AS in_10_slash_8,
         CASE WHEN ip_int % 256 < 128 THEN 0 ELSE 1 END AS lower_half
  FROM parsed
)
SELECT CAST(subnet16 AS BIGINT) AS subnet16,
       CAST(subnet16 // 256 AS BIGINT) || '.'
         || CAST(subnet16 % 256 AS BIGINT) || '.0.0/16' AS cidr,
       CAST(COUNT(*) AS BIGINT) AS n_hits,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(in_10_slash_8) AS BIGINT) AS n_in_10_8,
       CAST(SUM(lower_half) AS BIGINT) AS n_upper_host
FROM tagged GROUP BY subnet16
""",
)
def func_inet_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 toolbox Spark doesn't ship: inet_aton (dotted-quad →
    uint32), /16 subnet rollup, CIDR membership (10.0.0.0/8 as an
    integer range check — how IP-range joins should be planned at
    scale: band predicates on the integer form, never string
    prefixes), and host-byte bucketing. Addresses are built
    deterministically from event fields, parsed back with
    split + integer algebra — all-integer, bit-exact everywhere.
    One map-only projection then a hash groupBy on the subnet."""
    e = _t(spark, sf_dir, "events")
    ips = e.select(
        F.concat(
            F.lit("10."),
            (F.col("user_id") % 200).cast("string"),
            F.lit("."),
            (F.get_json_object("props", "$.k").cast("bigint") % 250).cast(
                "string"
            ),
            F.lit("."),
            (F.col("event_id") % 254 + 1).cast("string"),
        ).alias("ip"),
        "user_id",
    )
    sp = F.split("ip", "\\.")
    parsed = ips.select(
        "user_id",
        (
            sp.getItem(0).cast("bigint") * 16777216
            + sp.getItem(1).cast("bigint") * 65536
            + sp.getItem(2).cast("bigint") * 256
            + sp.getItem(3).cast("bigint")
        ).alias("ip_int"),
    )
    tagged = parsed.select(
        "user_id",
        "ip_int",
        F.expr("ip_int div 65536").alias("subnet16"),
        F.when(
            (F.col("ip_int") >= 167772160) & (F.col("ip_int") < 184549376), 1
        )
        .otherwise(0)
        .alias("in_10_slash_8"),
        F.when(F.col("ip_int") % 256 < 128, 0).otherwise(1).alias(
            "lower_half"
        ),
    )
    return (
        tagged.groupBy("subnet16")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hits"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.sum("in_10_slash_8").cast("bigint").alias("n_in_10_8"),
            F.sum("lower_half").cast("bigint").alias("n_upper_host"),
        )
        .select(
            "subnet16",
            F.concat(
                F.expr("subnet16 div 256").cast("string"),
                F.lit("."),
                (F.col("subnet16") % 256).cast("string"),
                F.lit(".0.0/16"),
            ).alias("cidr"),
            "n_hits",
            "n_users",
            "n_in_10_8",
            "n_upper_host",
        )
    )
