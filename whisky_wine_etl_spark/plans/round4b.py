"""Round-4b additions: Gopher repetition gate, Markov transition
matrix, gaps-and-islands, rolling z-score anomalies, schema-evolution
and partition-pruned reads, and watermark-bounded streaming dedup.

Registered AFTER round4 (plans.load_all imports round4b last) so the
driver's unverified-first ordering keeps the existing backlog in the
front slots.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _scratch_dir(spark: SparkSession, sf_dir: str, leaf: str) -> str:
    tag = hashlib.md5(
        (sf_dir + spark.sparkContext.applicationId).encode()
    ).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"sg_r4b_{tag}", leaf)


# ---------------------------------------------------------------------------
# Gopher-style repetition gate — the canonical FIRST filter of an LLM
# data pipeline (cheapest per byte, runs before anything that
# shuffles). All signals are array-local; the plan is one map-only
# parquet scan.
# ---------------------------------------------------------------------------


@query(
    "text_repetition_signals",
    """
WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
bg AS (
  SELECT doc_id, toks[i.i] || ' ' || toks[i.i + 1] AS b
  FROM tk, LATERAL (SELECT unnest(range(1, len(toks))) AS i) i(i)
  WHERE len(toks) >= 2
),
bc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b),
bm AS (SELECT doc_id, MAX(c) AS best, SUM(c) AS total FROM bc GROUP BY doc_id),
ln AS (
  SELECT doc_id, array_to_string(toks[(i.i * 10 + 1):(i.i * 10 + 10)], ' ') AS line_text
  FROM tk, LATERAL (
    SELECT unnest(range(0, CAST(ceil(CAST(len(toks) AS DOUBLE) / 10) AS BIGINT))) AS i) i(i)
),
lm AS (
  SELECT doc_id, COUNT(*) AS n_lines, COUNT(DISTINCT line_text) AS n_uniq_lines
  FROM ln GROUP BY doc_id
),
sig AS (
  SELECT tk.doc_id,
         ROUND(CASE WHEN len(toks) > 0
                    THEN 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
                               / len(toks)
                    ELSE 0.0 END, 6) AS dup_token_frac,
         ROUND(COALESCE(CAST(bm.best AS DOUBLE) / bm.total, 0.0), 6)
           AS top_bigram_frac,
         ROUND(CASE WHEN lm.n_lines > 0
                    THEN 1.0 - CAST(lm.n_uniq_lines AS DOUBLE) / lm.n_lines
                    ELSE 0.0 END, 6) AS dup_line_frac
  FROM tk
  LEFT JOIN bm ON bm.doc_id = tk.doc_id
  LEFT JOIN lm ON lm.doc_id = tk.doc_id
)
SELECT doc_id, dup_token_frac, top_bigram_frac, dup_line_frac,
       (dup_token_frac <= 0.6 AND top_bigram_frac <= 0.18
        AND dup_line_frac <= 0.3) AS keep
FROM sig
""",
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition filters (dup-token fraction, most-frequent-
    bigram fraction, within-doc duplicate-line fraction) + composite
    keep gate. Spark side is ZERO-shuffle — the bigram mode is a
    sort+run-length `aggregate` over the per-row array, not an
    exploded groupBy (operators/text.py repetition_signals; the oracle
    uses the explode formulation, same semantics). The fractions are
    exact small-integer ratios → bit-identical doubles both engines."""
    from whisky_wine_etl_spark.operators.text import repetition_signals

    return repetition_signals(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Event-type transition matrix (first-order Markov estimate) — the
# sequence-mining summary behind session modeling / bot detection.
# ---------------------------------------------------------------------------


@query(
    "events_markov_transitions",
    """
WITH s AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
),
t AS (
  SELECT event_type AS from_type, nxt AS to_type, COUNT(*) AS n
  FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, CAST(n AS BIGINT) AS n_transitions,
       ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type), 6) AS prob
FROM t
""",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix over per-user event streams:
    lead() pairs consecutive events inside one keyed window (one
    shuffle on user_id), the (from, to) rollup partial-aggregates
    map-side into a TYPE²-sized table, and the row-normalization
    window runs over that tiny aggregate — never over the raw events.
    Counts are exact ints; prob is a ratio of exact ints (stable 6-dp
    round)."""
    from pyspark.sql import Window as W

    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        e.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    wf = W.partitionBy("from_type")
    return trans.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(wf), 6
        ).alias("prob"),
    )


# ---------------------------------------------------------------------------
# Gaps and islands — runs of consecutive active calendar days per
# user, via the classic date-minus-rank grouping trick.
# ---------------------------------------------------------------------------


@query(
    "window_gaps_islands",
    """
WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
r AS (
  SELECT user_id, d,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS rn
  FROM d
)
SELECT user_id, MIN(d) AS island_start, MAX(d) AS island_end,
       CAST(COUNT(*) AS BIGINT) AS n_days
FROM (SELECT user_id, d, d - CAST(rn AS INTEGER) AS grp FROM r) g
GROUP BY user_id, grp
""",
)
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal runs of consecutive active days per user (engagement
    streaks): distinct (user, day), rank within user, group by
    day − rank — consecutive days share the group. Two shuffles total
    (verified in tests/test_plans_physical.py): the distinct reduces
    raw events to user-days FIRST, then one user_id exchange serves
    BOTH the window and the island rollup — hash partitioning on
    user_id already clusters the (user_id, grp) grouping keys, so no
    third exchange. Date arithmetic only — no floats anywhere."""
    from pyspark.sql import Window as W

    e = _t(spark, sf_dir, "events")
    d = e.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = W.partitionBy("user_id").orderBy("d")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .withColumn("grp", F.date_sub(F.col("d"), F.col("rn")))
        .groupBy("user_id", "grp")
        .agg(
            F.min("d").alias("island_start"),
            F.max("d").alias("island_end"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .drop("grp")
        .select("user_id", "island_start", "island_end", "n_days")
    )


# ---------------------------------------------------------------------------
# Rolling z-score anomaly flags — the mean/σ monitor beside
# window_rolling_median's robust twin. Filtering happens on the
# ROUNDED score so both engines face the identical boundary.
# ---------------------------------------------------------------------------


@query(
    "events_anomaly_zscore",
    """
WITH w AS (
  SELECT event_id, user_id, value,
         AVG(value) OVER win AS mu,
         STDDEV_SAMP(value) OVER win AS sd,
         COUNT(*) OVER win AS n
  FROM events
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 23 PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, value,
       ROUND((value - mu) / sd + 1e-9, 4) AS zscore
FROM w
WHERE n >= 12 AND sd > 1e-9
  AND ABS(ROUND((value - mu) / sd + 1e-9, 4)) > 2.5
""",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling z-score outliers: each event scored against
    the mean/σ of its user's 23 PRIOR events (frame excludes the
    current row so an anomaly can't mask itself), flagged when
    |z| > 2.5 with ≥12 prior observations. One shuffle on user_id,
    state bounded by the frame. The 2.5 cut and the hashed value both
    use the same 4-dp-rounded score (shared 1e-9 nudge), so a 1-ulp
    cross-engine σ difference can't flip membership separately from
    the value."""
    from pyspark.sql import Window as W

    e = _t(spark, sf_dir, "events")
    win = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-23, -1)
    scored = e.select(
        "event_id",
        "user_id",
        "value",
        F.avg("value").over(win).alias("mu"),
        F.stddev_samp("value").over(win).alias("sd"),
        F.count(F.lit(1)).over(win).alias("n"),
    ).withColumn(
        "zscore", F.round((F.col("value") - F.col("mu")) / F.col("sd") + F.lit(1e-9), 4)
    )
    return scored.filter(
        (F.col("n") >= 12) & (F.col("sd") > 1e-9) & (F.abs(F.col("zscore")) > 2.5)
    ).select("event_id", "user_id", "value", "zscore")


# ---------------------------------------------------------------------------
# Schema evolution: old-schema and new-schema parquet under one table
# root, read back with mergeSchema — the warehouse reality where a
# column was added mid-history and old files must still scan.
# ---------------------------------------------------------------------------


@query(
    "source_schema_evolution",
    """
SELECT doc_id, source, CAST(NULL AS BIGINT) AS n_chars, 1 AS v
FROM documents WHERE doc_id % 2 = 0
UNION ALL
SELECT doc_id, source, n_chars, 2 AS v
FROM documents WHERE doc_id % 2 = 1
""",
)
def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Writes generation v=1 WITHOUT n_chars and v=2 WITH it under one
    partitioned root, then reads the union with mergeSchema=true: old
    files surface the added column as NULL, the partition directory
    becomes the INT column v. This is the append-only schema-widening
    path every long-lived warehouse table hits; merge cost is
    footer-only (per-file schemas union at planning, no data rewrite).
    """
    root = _scratch_dir(spark, sf_dir, "schema_evo")
    docs = _t(spark, sf_dir, "documents")
    v1 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "source")
    v2 = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "source", "n_chars")
    v1.write.mode("overwrite").parquet(os.path.join(root, "v=1"))
    v2.write.mode("overwrite").parquet(os.path.join(root, "v=2"))
    out = spark.read.option("mergeSchema", "true").parquet(root)
    return out.select(
        "doc_id", "source", F.col("n_chars").cast("bigint").alias("n_chars"), "v"
    )


# ---------------------------------------------------------------------------
# Partition-pruned scan: hive-partitioned write + a query whose filter
# prunes to one directory (asserted at the plan level in
# tests/test_plans_physical.py). Result columns are exact ints so the
# oracle is float-free.
# ---------------------------------------------------------------------------


@query(
    "source_partition_prune",
    """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(event_id) AS min_event_id,
       MAX(event_id) AS max_event_id
FROM events WHERE event_type = 'purchase'
GROUP BY user_id
""",
)
def source_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-layout write of events partitioned by event_type, then an
    aggregate over ONE partition: the event_type predicate resolves at
    PLANNING time against directory names (PartitionFilters, zero I/O
    on the other types) — the layout choice that turns a 100 TB scan
    into a per-type one. The per-user rollup partial-aggregates
    map-side."""
    root = _scratch_dir(spark, sf_dir, "events_by_type")
    marker = os.path.join(root, "_SUCCESS")
    ev = _t(spark, sf_dir, "events")
    if not os.path.exists(marker):
        ev.write.mode("overwrite").partitionBy("event_type").parquet(root)
    part = spark.read.parquet(root).filter(F.col("event_type") == "purchase")
    return part.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
    )


# ---------------------------------------------------------------------------
# Watermark-bounded streaming dedup: dropDuplicatesWithinWatermark
# keys state eviction to event time, the only dedup that survives an
# unbounded stream (plain dropDuplicates state grows forever).
# ---------------------------------------------------------------------------


@query(
    "stream_dedup_watermark",
    "SELECT event_id, user_id, event_type FROM events",
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup on event_id with dropDuplicatesWithinWatermark:
    duplicate suppression only has to hold within the 1-hour watermark
    horizon, so the state store retains ≈ one horizon of keys instead
    of the whole stream's history — the contract that makes exactly-
    once dedup feasible at 100 TB/day ingest. event_ids are unique in
    the fixture, so the batch oracle is the full projection; the
    duplicate-collapse behavior itself is pinned in
    tests/test_streaming.py with an injected duplicate batch."""
    from whisky_wine_etl_spark.streaming import pipelines as sp

    s = sp.events_stream(spark, sf_dir)
    deduped = (
        s.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type")
    )
    return sp.run_to_memory(spark, deduped, "append")


# ---------------------------------------------------------------------------
# Sequence pattern matching (MATCH_RECOGNIZE-lite): each user's event
# history becomes an ordered initial-string; a fixed funnel pattern is
# counted with non-overlapping literal matching (replace-based, so
# both engines count identically — no regex-engine semantics in play).
# ---------------------------------------------------------------------------


@query(
    "events_pattern_match",
    """
WITH s AS (
  SELECT user_id,
         string_agg(substring(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(length(seq) AS INT) AS seq_len,
       CAST((length(seq) - length(replace(seq, 'vcp', ''))) / 3 AS BIGINT)
         AS n_funnels
FROM s
""",
)
def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counts completed view→click→purchase funnels as CONTIGUOUS
    triples in each user's event-type sequence (the MATCH_RECOGNIZE
    pattern-count shape). The sequence is built with the standard
    Spark ordered-aggregation idiom — collect_list of (ts, event_id,
    initial) structs, array_sort (struct ordering = field order), then
    a transform+concat — one shuffle on user_id, per-user state ∝ that
    user's history exactly like sessionization. Occurrences are
    counted non-overlapping left-to-right via length-delta after
    replace, which is engine-exact (no regex dialect involved)."""
    e = _t(spark, sf_dir, "events")
    seq = (
        e.groupBy("user_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("ts"),
                                F.col("event_id"),
                                F.substring("event_type", 1, 1).alias("c"),
                            )
                        )
                    ),
                    lambda x: x["c"],
                ),
            ).alias("seq")
        )
    )
    return seq.select(
        "user_id",
        F.length("seq").cast("int").alias("seq_len"),
        ((F.length("seq") - F.length(F.replace(F.col("seq"), F.lit("vcp")))) / 3)
        .cast("bigint")
        .alias("n_funnels"),
    )


# ---------------------------------------------------------------------------
# kNN classification over the labeled embeddings — composes the exact
# brute-force top-k with a majority vote; the quality harness for any
# ANN index swap (IVF/LSH give the same votes at high recall).
# ---------------------------------------------------------------------------


@query(
    "sim_knn_classify",
    """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS true_label
           FROM embeddings WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.query_id, c.vec_id AS cand_id, c.label AS cand_label,
         ROUND(
           SUM(CAST(q.qv[t.i] AS DOUBLE) * CAST(c.embedding[t.i] AS DOUBLE))
           / (SQRT(SUM(CAST(q.qv[t.i] AS DOUBLE) * CAST(q.qv[t.i] AS DOUBLE)))
              * SQRT(SUM(CAST(c.embedding[t.i] AS DOUBLE) * CAST(c.embedding[t.i] AS DOUBLE)))),
           6) AS cos6
  FROM q
  JOIN embeddings c ON c.vec_id <> q.query_id,
       LATERAL (SELECT unnest(range(1, 65)) AS i) t(i)
  GROUP BY q.query_id, c.vec_id, c.label
),
knn AS (
  SELECT query_id, cand_label,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos6 DESC, cand_id) AS rk
  FROM scored
),
votes AS (
  SELECT query_id, cand_label AS pred_label, COUNT(*) AS n_votes
  FROM knn WHERE rk <= 5 GROUP BY query_id, cand_label
),
best AS (
  SELECT query_id, pred_label, CAST(n_votes AS BIGINT) AS n_votes,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY n_votes DESC, pred_label) AS vr
  FROM votes
)
SELECT b.query_id, b.pred_label, b.n_votes, q.true_label,
       b.pred_label = q.true_label AS correct
FROM best b JOIN q ON q.query_id = b.query_id
WHERE vr = 1
""",
)
def sim_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-NN majority-vote classification of every 50th embedding
    against the rest: composes sim_topk_bruteforce's exact scorer with
    a label join and a per-query vote (ties → smallest label, mirrored
    in the oracle). The vote runs over k·|queries| rows — negligible
    next to scoring — and scoring reuses the broadcast-queries shape,
    so the corpus is scanned once with no shuffle of the corpus side.
    At 100 TB the scorer swaps for sim_topk_ivf (same output contract);
    this exact form stays as the recall/accuracy oracle."""
    from whisky_wine_etl_spark.operators import similarity as sim
    from pyspark.sql import Window as W

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    topk = sim.brute_force_topk(emb, queries, k=5)
    labels = emb.select(F.col("vec_id").alias("cand_id"), F.col("label").alias("cand_label"))
    votes = (
        topk.join(labels, "cand_id")
        .groupBy("query_id", "cand_label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    wv = W.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("cand_label")
    )
    best = (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select("query_id", F.col("cand_label").alias("pred_label"), "n_votes")
    )
    truth = queries.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    return best.join(truth, "query_id").select(
        "query_id",
        "pred_label",
        "n_votes",
        "true_label",
        (F.col("pred_label") == F.col("true_label")).alias("correct"),
    )


# ---------------------------------------------------------------------------
# Z-order clustered layout: multi-dimensional file clustering so
# min/max stats prune on EVERY laid-out column (Delta/Iceberg
# OPTIMIZE ZORDER, built from shiftleft/or — no UDF). Content is
# layout-invariant, so the oracle hashes the projection; the skipping
# benefit itself (per-file range tightness in both dimensions) is
# asserted in tests/test_round4b_ops.py.
# ---------------------------------------------------------------------------


@query(
    "layout_zorder_roundtrip",
    "SELECT event_id, user_id, value FROM events",
)
def layout_zorder_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events re-clustered on the (user_id, value) Morton curve into 8
    range-partitioned files and read back: a predicate on EITHER
    column now prunes most files by footer min/max, where a
    single-column sort only serves its own column. The z-value is a
    pure shift/or expression inside whole-stage codegen
    (functions/zorder.py, applied by operators/layout.py zorder_write
    — range-partition on the key, sort within files so row groups
    tile the curve too); the only shuffle is the range partitioner
    itself — exactly the one a layout rewrite must pay."""
    from whisky_wine_etl_spark.operators.layout import zorder_write

    out_dir = _scratch_dir(spark, sf_dir, "zorder_events")
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    zorder_write(ev, ["user_id", "value"], out_dir, n_files=8)
    return spark.read.parquet(out_dir)


# ---------------------------------------------------------------------------
# Snapshot diff (change data feed): the incremental-consumer contract
# — "what changed between version N and M" — over the same
# copy-on-write snapshot tables as table_time_travel/merge_publish.
# ---------------------------------------------------------------------------


@query(
    "table_snapshot_diff",
    """
WITH v1 AS (SELECT doc_id, source, n_chars FROM documents),
v2 AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 10 = 0 THEN n_chars + 1000 ELSE n_chars END AS n_chars
  FROM documents WHERE doc_id % 7 <> 3
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, source, n_chars
  FROM documents WHERE doc_id % 100 = 0
)
SELECT COALESCE(v2.doc_id, v1.doc_id) AS doc_id,
       CASE WHEN v1.doc_id IS NULL THEN 'insert'
            WHEN v2.doc_id IS NULL THEN 'delete'
            ELSE 'update' END AS change_type,
       COALESCE(v2.source, v1.source) AS source,
       COALESCE(v2.n_chars, v1.n_chars) AS n_chars
FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
WHERE v1.doc_id IS NULL OR v2.doc_id IS NULL
   OR v1.n_chars <> v2.n_chars OR v1.source <> v2.source
""",
)
def table_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change data feed between two snapshot versions: v1 = base
    documents, v2 = a merge that updates every 10th doc, deletes
    doc_id % 7 = 3, and inserts every 100th under a shifted key. Both
    versions are read back BY VERSION from the copy-on-write lineage
    (sources/snapshots.py) and diffed with ONE full-outer join on the
    key — insert/delete from one-sided presence, update from payload
    inequality; unchanged rows drop out. Emits the post-image (pre-
    image for deletes). This is what an incremental downstream
    consumer reads instead of re-scanning the table — at 100 TB the
    diff cost is one co-partitioned join of two versions, and with a
    key-bucketed layout it is shuffle-free. The oracle recomputes
    both versions' logical content from the base table."""
    from whisky_wine_etl_spark.sources import snapshots as snap

    table = _scratch_dir(spark, sf_dir, "cdf_table")
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    if snap.current_version(table) is None:
        v2 = (
            docs.filter(F.col("doc_id") % 7 != 3)
            .withColumn(
                "n_chars",
                F.when(F.col("doc_id") % 10 == 0, F.col("n_chars") + 1000).otherwise(
                    F.col("n_chars")
                ),
            )
            .unionByName(
                docs.filter(F.col("doc_id") % 100 == 0).withColumn(
                    "doc_id", F.col("doc_id") + 1000000
                )
            )
        )
        snap.write_snapshot(docs, table, mode="append")     # v1
        snap.write_snapshot(v2, table, mode="overwrite")    # v2
    old = snap.read_snapshot(spark, table, version=1).alias("a")
    new = snap.read_snapshot(spark, table, version=2).alias("b")
    j = old.join(new, F.col("a.doc_id") == F.col("b.doc_id"), "full_outer")
    changed = j.filter(
        F.col("a.doc_id").isNull()
        | F.col("b.doc_id").isNull()
        | (F.col("a.n_chars") != F.col("b.n_chars"))
        | (F.col("a.source") != F.col("b.source"))
    )
    return changed.select(
        F.coalesce(F.col("b.doc_id"), F.col("a.doc_id")).alias("doc_id"),
        F.when(F.col("a.doc_id").isNull(), "insert")
        .when(F.col("b.doc_id").isNull(), "delete")
        .otherwise("update")
        .alias("change_type"),
        F.coalesce(F.col("b.source"), F.col("a.source")).alias("source"),
        F.coalesce(F.col("b.n_chars"), F.col("a.n_chars")).alias("n_chars"),
    )
