"""Round-4r additions: additive seasonal decomposition, PMI
collocations, bitwise and URL function packs, A/B power analysis,
and a four-rule attribution model comparison.

Registered AFTER round4q so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Additive seasonal decomposition — value = trend + seasonal +
# residual over the hourly revenue series: trend is a centered 24-h
# moving average, the seasonal component is the hour-of-day mean of
# the detrended series (re-centered to sum to zero), residual is the
# remainder. Classic STL-lite that is 100% windows + one bounded
# (24-row) aggregate — no iterative loess, so it is exactly
# SQL-expressible on both engines.
# ---------------------------------------------------------------------------


@query(
    "ts_decompose_additive",
    """
WITH h AS (
  SELECT date_trunc('hour', ts) AS hr, SUM(value) AS y
  FROM events GROUP BY date_trunc('hour', ts)
),
t AS (
  SELECT hr, y,
         AVG(y) OVER (ORDER BY hr ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
           AS trend,
         COUNT(*) OVER (ORDER BY hr ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
           AS wn
  FROM h
),
d AS (
  SELECT hr, y, trend, y - trend AS detr,
         CAST(EXTRACT(hour FROM hr) AS INT) AS hod
  FROM t WHERE wn = 25
),
s AS (
  SELECT hod, AVG(detr) AS s_raw FROM d GROUP BY hod
),
s0 AS (
  SELECT hod, s_raw - AVG(s_raw) OVER () AS seasonal FROM s
)
SELECT d.hr, ROUND(d.y, 4) AS y, ROUND(d.trend, 4) AS trend,
       ROUND(s0.seasonal, 4) AS seasonal,
       ROUND(d.y - d.trend - s0.seasonal, 4) AS residual
FROM d JOIN s0 ON s0.hod = CAST(EXTRACT(hour FROM d.hr) AS INT)
""",
)
def ts_decompose_additive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly revenue decomposed into trend (centered 25-point moving
    average, emitted only where the window is complete so the edges
    carry no half-window bias), hour-of-day seasonal indices
    (zero-centered means of the detrended series — a 24-row
    aggregate), and residual. The hourly collapse is the only
    data-sized shuffle; the trend window is a single bounded frame
    over the calendar-sized hourly series, and the seasonal join is
    a 24-row broadcast. The moving average is order-fixed in both
    engines so 4-dp rounding is stable."""
    h = (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.sum("value").alias("y"))
    )
    wt = W.orderBy("hr").rowsBetween(-12, 12)
    t = h.select(
        "hr",
        "y",
        F.avg("y").over(wt).alias("trend"),
        F.count(F.lit(1)).over(wt).alias("wn"),
    )
    d = t.where(F.col("wn") == 25).select(
        "hr",
        "y",
        "trend",
        (F.col("y") - F.col("trend")).alias("detr"),
        F.hour("hr").cast("int").alias("hod"),
    )
    s = d.groupBy("hod").agg(F.avg("detr").alias("s_raw"))
    s0 = s.select(
        "hod",
        (F.col("s_raw") - F.avg("s_raw").over(W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))).alias("seasonal"),
    )
    return (
        d.join(F.broadcast(s0), "hod")
        .select(
            "hr",
            F.round("y", 4).alias("y"),
            F.round("trend", 4).alias("trend"),
            F.round("seasonal", 4).alias("seasonal"),
            F.round(F.col("y") - F.col("trend") - F.col("seasonal"), 4).alias(
                "residual"
            ),
        )
    )


# ---------------------------------------------------------------------------
# PMI collocations — pointwise mutual information of adjacent token
# pairs: log(p(ab) / (p(a)p(b))), the lexical-association complement
# of text_bpe_merge_pairs (raw pair frequency) — PMI surfaces RARE
# but strongly-bound pairs, frequency surfaces common ones.
# ---------------------------------------------------------------------------


@query(
    "text_collocations_pmi",
    """
WITH tk AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
bi AS (
  SELECT w[i] AS a, w[i + 1] AS b
  FROM tk, LATERAL (SELECT unnest(range(1, len(w))) AS i) t(i)
  WHERE w[i] <> '' AND w[i + 1] <> ''
),
pc AS (SELECT a, b, CAST(COUNT(*) AS DOUBLE) AS nab FROM bi GROUP BY a, b),
tot AS (SELECT SUM(nab) AS n FROM pc),
ua0 AS (SELECT a AS tok, SUM(nab) AS na FROM pc GROUP BY a),
ub0 AS (SELECT b AS tok, SUM(nab) AS nb FROM pc GROUP BY b),
j AS (
  SELECT pc.a, pc.b, pc.nab,
         ln((pc.nab / t.n) / ((ua0.na / t.n) * (ub0.nb / t.n))) AS pmi
  FROM pc
  JOIN ua0 ON ua0.tok = pc.a
  JOIN ub0 ON ub0.tok = pc.b
  CROSS JOIN tot t
  WHERE pc.nab >= 5
),
r AS (
  SELECT a, b, CAST(nab AS BIGINT) AS n_pair, ROUND(pmi, 6) AS pmi,
         ROW_NUMBER() OVER (ORDER BY ROUND(pmi, 6) DESC, a, b) AS rk
  FROM j
)
SELECT a, b, n_pair, pmi FROM r WHERE rk <= 25
""",
)
def text_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 adjacent-pair collocations by PMI (min support 5).
    Bigrams come from a per-document array transform (no positional
    self-join), unigram marginals are the bigram table re-aggregated
    by each side (left-position and right-position counts — the
    standard bigram-model marginals, so p(a)p(b) and p(ab) share one
    denominator), and the total is a 1-row broadcast. The min-support
    gate runs BEFORE the joins, bounding the scored set; ranking cuts
    on the 6-dp-rounded PMI so a sub-ulp ln() divergence between
    engines can't reorder the cut, with (a, b) as the total
    tiebreak."""
    docs = _t(spark, sf_dir, "documents")
    arr = docs.select(F.split("text", " ").alias("w")).filter(F.size("w") >= 2)
    bi = (
        arr.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1),"
                    " i -> named_struct('a', element_at(w, i),"
                    " 'b', element_at(w, i + 1)))"
                )
            ).alias("p")
        )
        .filter((F.col("p.a") != "") & (F.col("p.b") != ""))
        .select("p.a", "p.b")
    )
    pc_all = bi.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("double").alias("nab")
    ).localCheckpoint()
    pc = pc_all.where(F.col("nab") >= 5)
    # totals and marginals over the FULL bigram table, not the
    # supported subset — p(ab) and p(a)p(b) must share one denominator
    tot = pc_all.agg(F.sum("nab").alias("n"))
    ua = pc_all.groupBy(F.col("a").alias("tok")).agg(F.sum("nab").alias("na"))
    ub = pc_all.groupBy(F.col("b").alias("tok")).agg(F.sum("nab").alias("nb"))
    j = (
        pc.join(ua, pc.a == ua.tok)
        .join(ub, pc.b == ub.tok)
        .crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            "nab",
            F.log(
                (F.col("nab") / F.col("n"))
                / ((F.col("na") / F.col("n")) * (F.col("nb") / F.col("n")))
            ).alias("pmi"),
        )
    )
    return (
        j.select(
            "a",
            "b",
            F.col("nab").cast("bigint").alias("n_pair"),
            F.round("pmi", 6).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "a", "b")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Bitwise function pack — shifts, and/or/xor, bit_count, exercised as
# a key-mixing checksum so every function's output lands in the hash.
# ---------------------------------------------------------------------------


@query(
    "func_bitwise_pack",
    """
SELECT o_orderkey % 16 AS bucket,
       CAST(SUM(xor(o_orderkey, o_custkey)) AS BIGINT) AS x_xor,
       CAST(SUM(o_orderkey & 255) AS BIGINT) AS x_and,
       CAST(SUM(o_orderkey | 4096) AS BIGINT) AS x_or,
       CAST(SUM(o_orderkey << 3) AS BIGINT) AS x_shl,
       CAST(SUM(o_orderkey >> 2) AS BIGINT) AS x_shr,
       CAST(SUM(bit_count(o_orderkey)) AS BIGINT) AS x_pop
FROM orders GROUP BY o_orderkey % 16
""",
)
def func_bitwise_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise builtin coverage (xor, and, or, shifts, popcount) as
    per-bucket checksums over exact int64 arithmetic — every value
    participates in the hash, everything whole-stage codegen."""
    o = _t(spark, sf_dir, "orders")
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    return o.groupBy((k % 16).alias("bucket")).agg(
        F.sum(k.bitwiseXOR(c)).cast("bigint").alias("x_xor"),
        F.sum(k.bitwiseAND(F.lit(255))).cast("bigint").alias("x_and"),
        F.sum(k.bitwiseOR(F.lit(4096))).cast("bigint").alias("x_or"),
        F.sum(F.shiftleft(k, 3)).cast("bigint").alias("x_shl"),
        F.sum(F.shiftright(k, 2)).cast("bigint").alias("x_shr"),
        F.sum(F.bit_count(k)).cast("bigint").alias("x_pop"),
    )


# ---------------------------------------------------------------------------
# URL function pack — parse_url over deterministic synthetic URLs
# (host from the user bucket, path from the event type, query from
# props.k): Spark's parse_url is a JVM builtin; DuckDB has no URL
# parser, so the oracle is a from-first-principles regex parse.
# ---------------------------------------------------------------------------


@query(
    "func_url_pack",
    """
WITH u AS (
  SELECT 'https://shard' || CAST(user_id % 8 AS VARCHAR)
         || '.example.com/app/' || event_type
         || '?k=' || CAST(CAST(props::JSON ->> 'k' AS BIGINT) AS VARCHAR)
         || '&e=' || CAST(event_id AS VARCHAR) AS url
  FROM events
),
p AS (
  SELECT regexp_extract(url, '^https://([^/]+)/', 1) AS host,
         regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
         CAST(regexp_extract(url, '[?&]k=([0-9]+)', 1) AS BIGINT) AS k
  FROM u
)
SELECT host, path, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(k) AS BIGINT) AS k_sum
FROM p GROUP BY host, path
""",
)
def func_url_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_url(HOST/PATH/QUERY:key) round-trip: build a
    deterministic URL per event, parse it back with the JVM builtin,
    and aggregate per (host, path) with the query-parameter sum in
    the hash. The oracle parses the same URLs with regexes —
    independent implementations agreeing on every row."""
    ev = _t(spark, sf_dir, "events")
    u = ev.select(
        F.concat(
            F.lit("https://shard"),
            (F.col("user_id") % 8).cast("string"),
            F.lit(".example.com/app/"),
            F.col("event_type"),
            F.lit("?k="),
            F.get_json_object("props", "$.k").cast("bigint").cast("string"),
            F.lit("&e="),
            F.col("event_id").cast("string"),
        ).alias("url")
    )
    p = u.select(
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("k")).cast("bigint").alias("k"),
    )
    return p.groupBy("host", "path").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("k").cast("bigint").alias("k_sum"),
    )


# ---------------------------------------------------------------------------
# A/B power analysis — the planning face of the testing family
# (stat_ab_welch_ttest reads out an experiment; THIS sizes the next
# one): from each arm's observed variance and traffic, the minimal
# detectable effect at alpha=.05 / power=.80, and the per-arm n
# needed to detect a 1% lift.
# ---------------------------------------------------------------------------


@query(
    "stat_ab_power_mde",
    """
WITH a AS (
  SELECT user_id % 2 AS arm, AVG(value) AS mu,
         VAR_SAMP(value) AS v, CAST(COUNT(*) AS DOUBLE) AS n
  FROM events GROUP BY user_id % 2
),
w AS (
  SELECT SUM(v / n) AS var_term,
         MIN(mu) AS mu0, SUM(v) / 2 AS v_avg, MIN(n) AS n_min
  FROM a
)
SELECT ROUND(sqrt(var_term) * (1.959964 + 0.841621), 6) AS mde_abs,
       ROUND(sqrt(var_term) * (1.959964 + 0.841621) / mu0, 6) AS mde_rel,
       CAST(ceil(2 * v_avg * pow((1.959964 + 0.841621) / (0.01 * mu0), 2))
            AS BIGINT) AS n_per_arm_for_1pct
FROM w
""",
)
def stat_ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment sizing from observed moments: MDE =
    (z_{.975} + z_{.80})·SE at current traffic, and the per-arm n for
    a 1% relative lift (2σ²(z_a+z_b)²/Δ²). One pass over events for
    the two arms' sufficient statistics; the z quantiles are literals
    (closed-form constants, identical in both engines). Complements
    stat_ab_welch_ttest / stat_ab_cuped: readout, variance reduction,
    and sizing are the three legs of an experimentation platform."""
    ev = _t(spark, sf_dir, "events")
    a = ev.groupBy((F.col("user_id") % 2).alias("arm")).agg(
        F.avg("value").alias("mu"),
        F.var_samp("value").alias("v"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    w = a.agg(
        F.sum(F.col("v") / F.col("n")).alias("var_term"),
        F.min("mu").alias("mu0"),
        (F.sum("v") / 2).alias("v_avg"),
        F.min("n").alias("n_min"),
    )
    z = 1.959964 + 0.841621
    return w.select(
        F.round(F.sqrt("var_term") * z, 6).alias("mde_abs"),
        F.round(F.sqrt("var_term") * z / F.col("mu0"), 6).alias("mde_rel"),
        F.ceil(2 * F.col("v_avg") * F.pow(F.lit(z) / (0.01 * F.col("mu0")), 2))
        .cast("bigint")
        .alias("n_per_arm_for_1pct"),
    )


# ---------------------------------------------------------------------------
# Attribution model comparison — first-touch, last-touch, linear and
# U-shaped credit computed side by side from ONE binned lookback
# join, so marketing can see how channel credit shifts with the rule
# (the single-model U-shaped form is events_multitouch_attribution).
# ---------------------------------------------------------------------------


@query(
    "events_attribution_models",
    """
WITH clicks AS (
  SELECT user_id, event_id AS cid, ts AS cts, event_type AS channel
  FROM events WHERE event_type IN ('click', 'view')
),
purch AS (
  SELECT user_id, event_id AS pid, ts AS pts
  FROM events WHERE event_type = 'purchase'
),
touch AS (
  SELECT p.pid, c.cid, c.channel, c.cts,
         ROW_NUMBER() OVER (PARTITION BY p.pid ORDER BY c.cts, c.cid) AS pos,
         COUNT(*) OVER (PARTITION BY p.pid) AS n_touch
  FROM purch p JOIN clicks c
    ON c.user_id = p.user_id
   AND c.cts < p.pts AND c.cts >= p.pts - INTERVAL 1 HOUR
),
credit AS (
  SELECT channel,
         CASE WHEN pos = 1 THEN CAST(1.0 AS DOUBLE)
              ELSE CAST(0.0 AS DOUBLE) END AS w_first,
         CASE WHEN pos = n_touch THEN CAST(1.0 AS DOUBLE)
              ELSE CAST(0.0 AS DOUBLE) END AS w_last,
         CAST(1.0 AS DOUBLE) / n_touch AS w_linear,
         CASE WHEN n_touch = 1 THEN CAST(1.0 AS DOUBLE)
              WHEN n_touch = 2 THEN CAST(0.5 AS DOUBLE)
              WHEN pos = 1 OR pos = n_touch THEN CAST(0.4 AS DOUBLE)
              ELSE CAST(0.2 AS DOUBLE) / (n_touch - 2) END AS w_ushape
  FROM touch
)
SELECT channel,
       ROUND(SUM(w_first), 4) AS first_touch,
       ROUND(SUM(w_last), 4) AS last_touch,
       ROUND(SUM(w_linear), 4) AS linear,
       ROUND(SUM(w_ushape), 4) AS u_shape
FROM credit GROUP BY channel
""",
)
def events_attribution_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four attribution rules over the same 1-hour lookback
    touchpoints, in one plan: the touch table (purchase x preceding
    click/view within the horizon) is built once, positions come
    from one keyed window, and each rule is just a different weight
    expression summed per channel. The n_touch=1/2 edge cases
    route U-shape credit to the endpoints (1.0 and 0.5+0.5) so every
    purchase distributes exactly 1.0 under every rule. The
    user_id+time join is the same binned-lookback shape as
    events_multitouch_attribution; at 100 TB both sides bucket by
    (user, hour) so the join never degenerates."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("event_id").alias("cid"),
        F.col("ts").alias("cts"),
        F.col("event_type").alias("channel"),
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pid"), F.col("ts").alias("pts")
    )
    touch = purch.join(clicks, "user_id").where(
        (F.col("cts") < F.col("pts"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR"))
    )
    wp = W.partitionBy("pid").orderBy("cts", "cid")
    wc = W.partitionBy("pid")
    t = touch.select(
        "pid",
        "channel",
        F.row_number().over(wp).alias("pos"),
        F.count(F.lit(1)).over(wc).alias("n_touch"),
    )
    credit = t.select(
        "channel",
        F.when(F.col("pos") == 1, 1.0).otherwise(0.0).alias("w_first"),
        F.when(F.col("pos") == F.col("n_touch"), 1.0).otherwise(0.0).alias("w_last"),
        (1.0 / F.col("n_touch")).alias("w_linear"),
        F.when(F.col("n_touch") == 1, 1.0)
        .when(F.col("n_touch") == 2, 0.5)
        .when((F.col("pos") == 1) | (F.col("pos") == F.col("n_touch")), 0.4)
        .otherwise(0.2 / (F.col("n_touch") - 2))
        .alias("w_ushape"),
    )
    return credit.groupBy("channel").agg(
        F.round(F.sum("w_first"), 4).alias("first_touch"),
        F.round(F.sum("w_last"), 4).alias("last_touch"),
        F.round(F.sum("w_linear"), 4).alias("linear"),
        F.round(F.sum("w_ushape"), 4).alias("u_shape"),
    )
