"""Round-4n additions: sparse tf-idf cosine similarity join, binned
interval-overlap join, U-shaped multi-touch attribution, k-core
decomposition, and a multinomial Naive Bayes language classifier.

Registered AFTER round4m (plans.load_all imports this module last) so
the driver's unverified-first ordering keeps the earlier backlog in
the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.operators.text import tokens
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Sparse cosine similarity join — the AllPairs-family complement of the
# dense-embedding ANN ops (operators/similarity.py): pairs of documents
# whose tf-idf vectors have cosine >= threshold, found through an
# inverted-index join instead of an all-pairs scan. Ubiquitous terms
# (df > 20% of the corpus) are dropped BEFORE weighting — that is the
# stop-term rule that bounds every posting list, the same lever the
# capped shingle ops carry, here part of the operator's semantics (the
# idf weight of such terms is near zero anyway, so they contribute
# noise, not signal).
# ---------------------------------------------------------------------------


@query(
    "sim_sparse_cosine_join",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM tok WHERE term <> '' GROUP BY doc_id, term
),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
kept AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * ln(CAST((SELECT n_docs FROM n) AS DOUBLE) / df.df) AS w
  FROM tf JOIN df USING (term)
  WHERE df.df * 5 <= (SELECT n_docs FROM n)
),
nrm AS (SELECT doc_id, sqrt(SUM(w * w)) AS nz FROM kept GROUP BY doc_id),
u AS (
  SELECT k.doc_id, k.term, k.w / m.nz AS u
  FROM kept k JOIN nrm m USING (doc_id) WHERE m.nz > 0
),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.u * b.u) AS sim
  FROM u a JOIN u b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, ROUND(sim, 6) AS sim
FROM p WHERE ROUND(sim, 6) >= 0.5
""",
)
def sim_sparse_cosine_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All documents pairs with stop-term-filtered tf-idf cosine
    >= 0.5, via an inverted-index join: explode to (doc, term, unit
    weight), self-join postings on term with id order, sum the
    products per pair. Candidate work is Σ posting_len² over KEPT
    terms only — the df <= n/5 stop-term rule (applied before
    weighting, so norms are well-defined) caps every posting list at
    20% of the corpus and in practice at the near-dup cluster size;
    no all-pairs scan exists anywhere in the plan. The df side is
    vocabulary-sized and therefore joined WITHOUT a broadcast hint
    (AQE may still elect one at small SF); only the 1-row n_docs
    scalar is hint-broadcast. The oracle recomputes the identical
    algebra; both sides round to 6 dp before the threshold compare so
    a 1-ulp summation-order difference cannot flip membership."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("term")).filter(
        F.col("term") != ""
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).cast("double").alias("tf"))
    n_docs = docs.agg(F.countDistinct("doc_id").alias("n_docs"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    kept = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") * 5 <= F.col("n_docs"))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("w"),
        )
    )
    nrm = kept.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nz"))
    # localCheckpointed: both sides of the posting self-join read this
    # materialized frame (else Catalyst recomputes the tokenize+tf+df
    # subtree twice); blocks are GC-cleaned, no cross-call leak
    unit = (
        kept.join(nrm, "doc_id")
        .filter(F.col("nz") > 0)
        .select("doc_id", "term", (F.col("w") / F.col("nz")).alias("u"))
        .localCheckpoint()
    )
    a = unit.select(
        F.col("doc_id").alias("doc_a"), F.col("term").alias("term"), F.col("u").alias("ua")
    )
    b = unit.select(
        F.col("doc_id").alias("doc_b"), F.col("term").alias("term"), F.col("u").alias("ub")
    )
    pairs = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.round(F.sum(F.col("ua") * F.col("ub")), 6).alias("sim"))
        .filter(F.col("sim") >= 0.5)
    )
    return pairs


# ---------------------------------------------------------------------------
# Interval-overlap join — both sides carry intervals (not the
# point-in-interval shape of join_range_binned_attribution): click
# activity windows × view activity windows of the same user. The
# binned formulation turns the per-user quadratic theta join into an
# equi-join on (user, hour bucket); every interval spans at most 2
# buckets here, so the fan-out is bounded by construction.
# ---------------------------------------------------------------------------

_IVL = """
  SELECT event_id, user_id,
         epoch_us(ts) // 1000000 AS s,
         epoch_us(ts) // 1000000
           + CAST(FLOOR(ABS(value)) AS BIGINT) % 3600 + 300 AS e
  FROM events WHERE event_type = '{etype}'
"""


@query(
    "join_interval_overlap",
    f"""
WITH c AS ({_IVL.format(etype="click")}),
v AS ({_IVL.format(etype="view")})
SELECT c.user_id AS user_id, c.event_id AS click_id, v.event_id AS view_id,
       CAST(least(c.e, v.e) - greatest(c.s, v.s) AS BIGINT) AS overlap_s
FROM c JOIN v ON c.user_id = v.user_id AND c.s < v.e AND v.s < c.e
""",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping (click-window, view-window) pairs per user, where
    each event spawns the half-open activity interval
    [ts, ts + |value| mod 3600 + 300 s). Executed as a BINNED
    equi-join: each interval explodes to the hour buckets it covers
    (<= 2 here, bounded by max duration), the join key is
    (user_id, bucket), and the exact overlap predicate filters the
    bucket-coarse candidates; a pair meeting in k shared buckets is
    deduped once at the end. This is the standard rewrite that keeps
    interval joins shuffle-partitionable at 100 TB — the oracle runs
    the direct theta join as ground truth. Overlap length is exact
    integer seconds (half-open: end - start)."""
    ev = _t(spark, sf_dir, "events")

    def side(etype: str, eid: str) -> DataFrame:
        start = F.expr("unix_micros(ts) div 1000000")
        dur = (F.floor(F.abs(F.col("value"))).cast("long") % 3600) + 300
        return ev.filter(F.col("event_type") == etype).select(
            F.col("event_id").alias(eid),
            "user_id",
            start.alias(f"{eid}_s"),
            (start + dur).alias(f"{eid}_e"),
        )

    c = side("click", "click_id").withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.expr("click_id_s div 3600"), F.expr("(click_id_e - 1) div 3600")
            )
        ),
    )
    v = side("view", "view_id").withColumn(
        "bucket",
        F.explode(
            F.sequence(F.expr("view_id_s div 3600"), F.expr("(view_id_e - 1) div 3600"))
        ),
    )
    joined = (
        c.join(v, ["user_id", "bucket"])
        .filter(
            (F.col("click_id_s") < F.col("view_id_e"))
            & (F.col("view_id_s") < F.col("click_id_e"))
        )
        .select(
            "user_id",
            "click_id",
            "view_id",
            (
                F.least("click_id_e", "view_id_e") - F.greatest("click_id_s", "view_id_s")
            ).alias("overlap_s"),
        )
        .distinct()
    )
    return joined


# ---------------------------------------------------------------------------
# Multi-touch attribution — the position-based (U-shaped) credit model
# marketers run over clickstreams: each purchase distributes 40% of
# credit to the first touch in its 7-day lookback, 40% to the last,
# and 20% evenly across the middle; 1-touch paths get 100%, 2-touch
# paths 50/50.
# ---------------------------------------------------------------------------


@query(
    "events_multitouch_attribution",
    """
WITH p AS (
  SELECT event_id AS pid, user_id, epoch_us(ts) AS pus
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT event_id AS tid, user_id, event_type AS channel, epoch_us(ts) AS tus
  FROM events WHERE event_type IN ('click', 'view')
),
m AS (
  SELECT p.pid, t.channel, t.tus, t.tid
  FROM p JOIN t ON p.user_id = t.user_id
   AND t.tus < p.pus AND t.tus >= p.pus - 604800000000
),
r AS (
  SELECT pid, channel,
         ROW_NUMBER() OVER (PARTITION BY pid ORDER BY tus, tid) AS pos,
         COUNT(*) OVER (PARTITION BY pid) AS n
  FROM m
),
c AS (
  SELECT channel,
         CASE WHEN n = 1 THEN CAST(1 AS DOUBLE)
              WHEN n = 2 THEN 0.5
              WHEN pos = 1 OR pos = n THEN 0.4
              ELSE 0.2 / CAST(n - 2 AS DOUBLE) END AS credit
  FROM r
)
SELECT channel, ROUND(SUM(credit), 6) AS credit,
       CAST(COUNT(*) AS BIGINT) AS n_touches
FROM c GROUP BY channel
""",
)
def events_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel U-shaped attribution credit over every purchase's
    7-day touch path. The purchase↔touch range join is binned: each
    purchase explodes to the 8 day-buckets its lookback covers and
    joins touches on (user_id, day bucket) — each touch lives in
    exactly ONE bucket, so no dedup pass is needed and the shuffle is
    keyed fine-grained enough to survive hot users. Positions come
    from one keyed window per purchase (ties broken by event id, so
    same-microsecond touches rank identically in both engines);
    credits are exact small rationals summed then rounded at 6 dp."""
    ev = _t(spark, sf_dir, "events")
    day_us = 86400 * 1000000
    week_us = 7 * day_us
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", F.unix_micros("ts").alias("pus")
    )
    t = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("tid"),
        "user_id",
        F.col("event_type").alias("channel"),
        F.unix_micros("ts").alias("tus"),
    )
    p_b = p.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.expr(f"(pus - {week_us}) div {day_us}"), F.expr(f"pus div {day_us}")
            )
        ),
    )
    t_b = t.withColumn("bucket", F.expr(f"tus div {day_us}"))
    m = p_b.join(t_b, ["user_id", "bucket"]).filter(
        (F.col("tus") < F.col("pus")) & (F.col("tus") >= F.col("pus") - week_us)
    )
    w = W.partitionBy("pid")
    r = m.select(
        "pid",
        "channel",
        F.row_number().over(w.orderBy("tus", "tid")).alias("pos"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    credit = F.when(F.col("n") == 1, F.lit(1.0)).when(F.col("n") == 2, F.lit(0.5)).when(
        (F.col("pos") == 1) | (F.col("pos") == F.col("n")), F.lit(0.4)
    ).otherwise(F.lit(0.2) / (F.col("n") - 2))
    return (
        r.select("channel", credit.alias("credit"))
        .groupBy("channel")
        .agg(
            F.round(F.sum("credit"), 6).alias("credit"),
            F.count(F.lit(1)).cast("long").alias("n_touches"),
        )
    )


# ---------------------------------------------------------------------------
# k-core decomposition (fixed peel rounds) — the density filter that
# complements the package's other graph ops: repeatedly drop nodes
# whose degree falls below k and re-induce the subgraph. k is the
# MEDIAN initial degree (computed from the data, so the query stays
# meaningful at every SF); three peel rounds are unrolled so the exact
# semantics stay SQL-expressible — production iterates to fixpoint
# with the same per-round plan.
# ---------------------------------------------------------------------------

_KCORE_DEG = """
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM (SELECT pa AS node FROM {e} UNION ALL SELECT pb AS node FROM {e})
  GROUP BY node
"""
_KCORE_INDUCE = """
  SELECT pa, pb FROM {e}
  WHERE pa IN (SELECT node FROM {k}) AND pb IN (SELECT node FROM {k})
"""


@query(
    "graph_kcore",
    f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e0 AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
d0 AS MATERIALIZED ({_KCORE_DEG.format(e="e0")}),
kq AS (SELECT quantile_cont(deg, 0.1) AS k FROM d0),
s1 AS (SELECT node FROM d0, kq WHERE deg >= k),
e1 AS MATERIALIZED ({_KCORE_INDUCE.format(e="e0", k="s1")}),
d1 AS MATERIALIZED ({_KCORE_DEG.format(e="e1")}),
s2 AS (SELECT node FROM d1, kq WHERE deg >= k),
e2 AS MATERIALIZED ({_KCORE_INDUCE.format(e="e1", k="s2")}),
d2 AS MATERIALIZED ({_KCORE_DEG.format(e="e2")}),
s3 AS (SELECT node FROM d2, kq WHERE deg >= k),
e3 AS ({_KCORE_INDUCE.format(e="e2", k="s3")}),
d3 AS ({_KCORE_DEG.format(e="e3")})
SELECT node, deg FROM d3
""",
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nodes (and their induced degrees) surviving 3 rounds of
    k-core peeling of the part co-purchase graph, k = 10th-percentile
    initial degree (the co-purchase graph is degree-homogeneous, so a
    median threshold collapses it — P10 peels the sparse fringe and
    leaves a stable core, at every SF). Each round is one degree aggregation plus two LEFT SEMI
    joins re-inducing the edge list — O(|E|) per round, the textbook
    distributed peel. The edge list is localCheckpointed per round to
    truncate lineage (same discipline as the BFS/pagerank ops); k is
    a 1-row broadcast scalar, never a driver-side constant baked into
    the plan. The oracle unrolls the identical 3 rounds as nested
    CTEs; degrees are exact integers so parity is bit-exact."""
    from whisky_wine_etl_spark.operators.graph import copurchase_edges

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # ONE orderkey shuffle (basket combination emission) instead of a
    # fact-table self-join — see operators/graph.py.
    # eager=False checkpoints throughout (r13): each round already has
    # an unavoidable action (keep.count gating the broadcast; the final
    # collect) — that action materializes the persist-backed
    # checkpoint chain, replacing 3 eager jobs per round with 1.
    e = copurchase_edges(li).localCheckpoint(eager=False)

    def degrees(edges: DataFrame) -> DataFrame:
        ends = edges.select(F.col("pa").alias("node")).unionAll(
            edges.select(F.col("pb").alias("node"))
        )
        return ends.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))

    # 1-row scalar, materialized ONCE — a lazy kq would re-derive the
    # full degree aggregation inside every peel round's plan
    d0 = degrees(e).localCheckpoint(eager=False)
    kq = d0.agg(F.expr("percentile(deg, 0.1)").alias("k")).localCheckpoint(eager=False)
    edges = e
    deg_frame = d0  # round 1 reuses the percentile pass's degrees
    for _ in range(3):
        # checkpoint keep: it feeds BOTH semi joins (lazy, the degree
        # agg would run twice per round) and its exact count gates the
        # broadcast — node sets are orders smaller than edge lists, so
        # while they fit, both re-inductions are map-side joins and
        # the edge table is never re-shuffled
        keep = (
            deg_frame.crossJoin(F.broadcast(kq))
            .filter(F.col("deg") >= F.col("k"))
            .select("node")
            .localCheckpoint(eager=False)  # materialized by the count
        )
        kb = F.broadcast(keep) if keep.count() <= 2_000_000 else keep
        edges = (
            edges.join(kb, edges.pa == kb.node, "left_semi")
            .join(kb, F.col("pb") == kb.node, "left_semi")
            # eager=False: next round's keep.count (or the final
            # collect) materializes it
            .localCheckpoint(eager=False)
        )
        deg_frame = degrees(edges)
    return deg_frame.select("node", F.col("deg").cast("long").alias("deg"))


# ---------------------------------------------------------------------------
# Multinomial Naive Bayes — the classic bag-of-words classifier,
# trained and scored entirely as aggregations (no per-row Python):
# class priors + Laplace-smoothed token likelihoods. The absent
# (term, class) grid is never materialized — ln(0 + 1) = 0 lets the
# score decompose into a per-class constant plus an inner join over
# OBSERVED (term, class) counts only.
# ---------------------------------------------------------------------------


@query(
    "ml_naive_bayes_lang",
    """
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM tok WHERE term <> '' GROUP BY doc_id, term
),
ct AS (
  SELECT lang AS cls, term, CAST(COUNT(*) AS DOUBLE) AS ctc
  FROM tok WHERE term <> '' GROUP BY lang, term
),
v AS (SELECT CAST(COUNT(DISTINCT term) AS DOUBLE) AS vocab
      FROM tok WHERE term <> ''),
cls AS (
  SELECT d.lang AS cls,
         ln(CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM documents)) AS prior,
         (SELECT ln(SUM(ctc) + (SELECT vocab FROM v)) FROM ct
          WHERE ct.cls = d.lang) AS denom
  FROM documents d GROUP BY d.lang
),
ntok AS (SELECT doc_id, SUM(tf) AS n_tok FROM tf GROUP BY doc_id),
hits AS (
  SELECT tf.doc_id, ct.cls, SUM(tf.tf * ln(ct.ctc + 1)) AS hit
  FROM tf JOIN ct ON tf.term = ct.term
  GROUP BY tf.doc_id, ct.cls
),
scores AS (
  SELECT d.doc_id, d.lang, c.cls,
         ROUND(c.prior - n.n_tok * c.denom + COALESCE(h.hit, 0), 4) AS score
  FROM documents d
  JOIN ntok n USING (doc_id)
  CROSS JOIN cls c
  LEFT JOIN hits h ON h.doc_id = d.doc_id AND h.cls = c.cls
),
ranked AS (
  SELECT doc_id, lang, cls, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, cls) AS rk
  FROM scores
)
SELECT doc_id, lang, cls AS pred_lang, score FROM ranked WHERE rk = 1
""",
)
def ml_naive_bayes_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-sample multinomial Naive Bayes language prediction for every
    document: argmax over classes of
    prior(c) − n_tok(doc)·ln(tokens(c)+V) + Σ_t tf·ln(count(t,c)+1)
    (the Laplace-smoothed log-likelihood, algebraically rearranged so
    missing (term, class) cells contribute exactly 0 and the plan is
    an inner join over observed counts — no vocab × classes grid).
    All model state is tiny aggregates: priors/denominators are a
    classes-sized broadcast, the (term, class) count table is
    vocabulary-sized and shuffle-joined unhinted. Scores are rounded
    to 4 dp BEFORE the argmax window so a summation-order ulp cannot
    reorder classes differently from the oracle; exact ties break by
    class name in both engines."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", "lang", F.explode(tokens("text")).alias("term")).filter(
        F.col("term") != ""
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).cast("double").alias("tf"))
    ct = tok.groupBy(F.col("lang").alias("cls"), F.col("term")).agg(
        F.count(F.lit(1)).cast("double").alias("ctc")
    )
    vocab = tok.agg(F.countDistinct("term").cast("double").alias("vocab"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    cls = (
        docs.groupBy(F.col("lang").alias("cls"))
        .agg(F.count(F.lit(1)).alias("docs_c"))
        .join(ct.groupBy("cls").agg(F.sum("ctc").alias("tokens_c")), "cls")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "cls",
            F.log(F.col("docs_c") / F.col("n_docs")).alias("prior"),
            F.log(F.col("tokens_c") + F.col("vocab")).alias("denom"),
        )
    )
    ntok = tf.groupBy("doc_id").agg(F.sum("tf").alias("n_tok"))
    hits = (
        tf.join(ct, "term")
        .groupBy("doc_id", "cls")
        .agg(F.sum(F.col("tf") * F.log(F.col("ctc") + 1)).alias("hit"))
    )
    scores = (
        docs.select("doc_id", "lang")
        .join(ntok, "doc_id")
        .crossJoin(F.broadcast(cls))
        .join(hits, ["doc_id", "cls"], "left")
        .select(
            "doc_id",
            "lang",
            "cls",
            F.round(
                F.col("prior")
                - F.col("n_tok") * F.col("denom")
                + F.coalesce(F.col("hit"), F.lit(0.0)),
                4,
            ).alias("score"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("cls"))
    return (
        scores.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", "lang", F.col("cls").alias("pred_lang"), "score")
    )
