"""Round-4ar: content-defined chunking (CDC), chunk-level duplicate
detection, and target-size output sharding.

Registered AFTER round4aq so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

import pandas as pd  # top-level so pandas_udf type hints resolve
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.materialize import materialize
from whisky_wine_etl_spark.functions.rounding import pinned
from whisky_wine_etl_spark.plans.registry import query


def _scratch(spark: SparkSession, sf_dir: str, leaf: str) -> str:
    tag = hashlib.md5(
        (sf_dir + spark.sparkContext.applicationId).encode()
    ).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"sg_r4ar_{tag}", leaf)


# ---------------------------------------------------------------------------
# Content-defined chunking: boundaries fall where a rolling window's
# hash hits a pattern, so an insertion early in a document shifts only
# the ONE chunk it lands in — the property that makes CDC the dedup
# granularity for storage systems (rsync, restic, FastCDC) and for
# LLM-corpus near-dup at sub-document level. The window hash here is
# md5 of each 8-char window with a 1/16 boundary probability (first
# hex nibble '0'), chosen because BOTH engines evaluate it
# bit-identically — the whole chunker is one Catalyst expression.
# ---------------------------------------------------------------------------

_SPARK_BPOS = """
CASE WHEN length(text) >= 9 THEN
  filter(sequence(2, length(text) - 7),
         i -> substring(md5(substring(text, i, 8)), 1, 1) = '0')
ELSE array() END
"""
_SPARK_CUTS = f"concat(array(1), ({_SPARK_BPOS}), array(length(text) + 1))"
_SPARK_CHUNKS = f"""
CASE WHEN length(text) = 0 THEN array()
ELSE transform(sequence(1, size({_SPARK_CUTS}) - 1),
     j -> substring(text, element_at({_SPARK_CUTS}, j),
                    element_at({_SPARK_CUTS}, j + 1)
                    - element_at({_SPARK_CUTS}, j)))
END
"""

_DUCK_BPOS = """
CASE WHEN length(text) >= 9 THEN
  list_filter(range(2, length(text) - 6),
              i -> substr(md5(substr(text, i, 8)), 1, 1) = '0')
ELSE [] END
"""
_DUCK_CUTS = f"list_concat(list_concat([1], ({_DUCK_BPOS})), [length(text) + 1])"
_DUCK_CHUNKS = f"""
CASE WHEN length(text) = 0 THEN []
ELSE list_transform(range(1, len({_DUCK_CUTS})),
     j -> substr(text, ({_DUCK_CUTS})[j],
                 ({_DUCK_CUTS})[j + 1] - ({_DUCK_CUTS})[j]))
END
"""


def cdc_chunk_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, chunk_idx, chunk) — one row per content-defined
    chunk. The window-hash scan runs in the Arrow-vectorized Python
    tier, NOT as the equivalent Catalyst higher-order-function
    expression (kept above as _SPARK_CHUNKS for reference): HOF
    lambdas evaluate INTERPRETED per element on the JVM, and at one
    md5 per character position that measured 189 s for 1.5 M chars at
    sf0.1 vs ~2 s for the same rule as a batched Python loop — the
    exact carve-out the pandas-UDF policy exists for (compare
    operators/similarity.py ivf_topk). The boundary rule is
    IDENTICAL to the DuckDB oracle's SQL (md5 of each 8-char window,
    first hex nibble '0'), so chunk boundaries still verify
    bit-for-bit; Python str slicing is codepoint-based exactly like
    substr() in both engines."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def chunks_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if not t:
                out.append([])
                continue
            ln = len(t)
            cuts = [1]
            if ln >= 9:
                enc = t.encode("utf-8", "surrogatepass")
                # byte==char positions only for ASCII; fall back to
                # per-codepoint slicing when multibyte chars exist
                if len(enc) == ln:
                    cuts += [
                        i
                        for i in range(2, ln - 6)
                        if hashlib.md5(enc[i - 1 : i + 7]).hexdigest()[0] == "0"
                    ]
                else:
                    cuts += [
                        i
                        for i in range(2, ln - 6)
                        if hashlib.md5(
                            t[i - 1 : i + 7].encode("utf-8", "surrogatepass")
                        ).hexdigest()[0]
                        == "0"
                    ]
            cuts.append(ln + 1)
            out.append([t[a - 1 : b - 1] for a, b in zip(cuts, cuts[1:])])
        return pd.Series(out)

    # the testdata corpus is one small parquet file -> one input
    # partition; spread the scan so the window-hash loop uses every
    # core (at real corpus scale the source already has partitions
    # and this repartition is a cheap rebalance of text bytes)
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    return docs.repartition(n_parts).select(
        "doc_id", F.posexplode(chunks_udf("text")).alias("chunk_idx", "chunk")
    )


@query(
    "text_cdc_chunks",
    f"""
WITH ch AS (
  SELECT doc_id, unnest({_DUCK_CHUNKS}) AS chunk FROM documents
)
SELECT d.doc_id,
       CAST(COUNT(ch.chunk) AS BIGINT) AS n_chunks,
       CAST(COALESCE(MAX(length(ch.chunk)), 0) AS BIGINT) AS max_chunk_len,
       -- pinned rounding (r8 audit rule 3): mean of integer lengths
       -- is a small-denominator rational that can sit on 3-dp halves
       FLOOR(COALESCE(AVG(length(ch.chunk)), 0) * 1000 + 0.5)
         / 1000 AS mean_chunk_len
FROM documents d LEFT JOIN ch ON ch.doc_id = d.doc_id
GROUP BY d.doc_id
""",
)
def text_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document chunk statistics under content-defined chunking:
    how many chunks, the largest, and the mean length (expected ≈ 16
    chars at the 1/16 boundary rate). The chunker runs in the
    Arrow-vectorized tier (see cdc_chunk_frame: the Catalyst HOF form
    is interpreted per element and ~100× slower at corpus scale), and
    the oracle evaluates the IDENTICAL windowed-md5 rule in DuckDB,
    so chunk boundaries are verified bit-for-bit across engines.
    Scale: embarrassingly parallel per document; no join, no shuffle
    beyond the final per-doc aggregate."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ch = cdc_chunk_frame(docs)
    stats = ch.groupBy("doc_id").agg(
        F.count("chunk").cast("bigint").alias("n_chunks"),
        F.max(F.length("chunk")).cast("bigint").alias("max_chunk_len"),
        pinned(F.avg(F.length("chunk")), 3).alias("mean_chunk_len"),
    )
    return (
        docs.select("doc_id")
        .join(stats, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
            F.coalesce("max_chunk_len", F.lit(0)).alias("max_chunk_len"),
            F.coalesce("mean_chunk_len", F.lit(0.0)).alias("mean_chunk_len"),
        )
    )


@query(
    "dedup_chunk_overlap",
    f"""
WITH ch AS (
  SELECT doc_id, unnest({_DUCK_CHUNKS}) AS chunk FROM documents
),
h AS (
  SELECT DISTINCT doc_id, md5(chunk) AS ch_md5
  FROM ch WHERE length(chunk) >= 8
),
ok AS (
  SELECT ch_md5 FROM h GROUP BY ch_md5
  HAVING COUNT(*) BETWEEN 2 AND 50
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM h a JOIN h b ON a.ch_md5 = b.ch_md5 AND a.doc_id < b.doc_id
  JOIN ok ON ok.ch_md5 = a.ch_md5
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, n_shared FROM pairs WHERE n_shared >= 2
""",
)
def dedup_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level near-duplicate detection: documents sharing ≥ 2
    content-defined chunks (each ≥ 8 chars, hashed) — the sub-document
    dedup that catches copied paragraphs exact shingle dedup misses
    when surrounding text differs. The join is an inverted index on
    chunk hash; hashes shared by more than 50 documents are dropped
    before pairing (the same stop-list lever as the capped shingle
    ops: boilerplate chunks would otherwise make the posting-list
    self-join quadratic at corpus scale, and a 50-doc-hot chunk is
    boilerplate, not plagiarism evidence). All thresholds appear
    verbatim in the oracle, so the pruning is verified, not waved
    at."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # r12: h feeds the document-frequency pass AND (via hh) both sides
    # of the posting-list self-join — left lazy, the Arrow CDC chunker
    # re-ran once per consumer. Materializing h (and the pruned hh the
    # self-join reads twice) measured 8.2 -> 2.5 s median at sf0.1
    # (guide §2.4; blocks freed on GC).
    h = (
        cdc_chunk_frame(docs)
        .filter(F.length("chunk") >= 8)
        .select("doc_id", F.md5("chunk").alias("ch_md5"))
        .distinct()
        # r13: eager=False + policy tier (chunk-hash frame is
        # fact-scale); the final collect materializes the chain
        .transform(lambda d: materialize(d, fact_scale=True))
    )
    ok = (
        h.groupBy("ch_md5")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df").between(2, 50))
        .select("ch_md5")
    )
    hh = materialize(h.join(ok, "ch_md5"), fact_scale=True)
    a = hh.select(F.col("doc_id").alias("doc_a"), "ch_md5")
    b = hh.select(F.col("doc_id").alias("doc_b"), "ch_md5")
    return (
        a.join(b, "ch_md5")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )


# ---------------------------------------------------------------------------
# Target-size output sharding: the "write ~N-MB files" production
# contract, assigned deterministically from a byte-estimate prefix sum
# so both engines can verify shard membership exactly.
# ---------------------------------------------------------------------------

_SHARD_TARGET = 64_000  # bytes per output shard (scaled-down stand-in)


@query(
    "layout_sized_shards",
    f"""
WITH est AS (
  SELECT doc_id, n_chars + 64 AS est_bytes FROM documents
),
pre AS (
  SELECT doc_id, est_bytes,
         COALESCE(SUM(est_bytes) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS prefix
  FROM est
)
SELECT CAST(prefix // {_SHARD_TARGET} AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(est_bytes) AS BIGINT) AS est_bytes,
       CAST(1 AS BIGINT) AS n_files
FROM pre
GROUP BY 1
ORDER BY shard
""",
)
def layout_sized_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic target-size output sharding: every document gets
    a byte estimate, the EXCLUSIVE prefix sum over doc_id order
    assigns it to shard floor(prefix/target), and the table is
    written hive-partitioned by shard with one task per shard — so
    each shard directory holds exactly ONE file of ≈ target size (the
    64 KB target is the scaled-down stand-in for the production
    256-512 MB). The prefix sum is the two-pass range-partition form
    (operators/keys.add_running_total): per-partition window sums in
    parallel plus an O(partitions) driver prefix — no single-task
    global window at any scale. The read-back audits the actual
    layout via the _metadata hidden column and the oracle recomputes
    shard membership exactly — n_files == 1 per shard is a VERIFIED
    claim, not a hope."""
    from whisky_wine_etl_spark.operators.keys import add_running_total

    path = _scratch(spark, sf_dir, "sized_shards")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("n_chars") + 64).alias("est_bytes")
    )
    sharded = add_running_total(
        docs, ["doc_id"], "est_bytes", out_col="prefix", inclusive=False
    ).withColumn(
        "shard", (F.col("prefix") / F.lit(_SHARD_TARGET)).cast("bigint")
    )
    (
        sharded.repartition("shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    back = spark.read.parquet(path).select(
        "shard", "est_bytes", F.col("_metadata.file_path").alias("fp")
    )
    return (
        back.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("est_bytes").cast("bigint").alias("est_bytes"),
            F.countDistinct("fp").cast("bigint").alias("n_files"),
        )
        .orderBy("shard")
    )
