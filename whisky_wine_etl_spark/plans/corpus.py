"""Corpus-shaping query plans: the training-data pipeline steps
between deduped documents and training shards — decontamination,
quality gating, PII redaction, mixture sampling, sequence packing,
global shuffle. Every entry has an exact DuckDB oracle (all the
operators are deterministic by design — see operators/corpus.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.operators import corpus as cp
from whisky_wine_etl_spark.operators.sampling import hash_bucket_sql
from whisky_wine_etl_spark.plans.registry import query


@query(
    "corpus_decontaminate",
    """
WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i.i:i.i+4], ' ') AS shingle
  FROM tk, LATERAL (SELECT unnest(range(1, greatest(len(toks) - 4, 1) + 1)) AS i) i(i)
),
bad AS (
  SELECT DISTINCT t.doc_id
  FROM sh t
  JOIN (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 0) e USING (shingle)
  WHERE t.doc_id % 10 <> 0
)
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d
WHERE d.doc_id % 10 <> 0 AND d.doc_id NOT IN (SELECT doc_id FROM bad)
""",
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every 10th document plays the eval
    set; training documents sharing any word 5-gram with it are
    dropped. Semi-join on shingle (AQE broadcasts the benchmark-sized
    eval side), anti-join back — never an all-pairs comparison."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 10 != 0)
    eval_set = docs.filter(F.col("doc_id") % 10 == 0)
    return cp.decontaminate(train, eval_set, n=5).select(
        "doc_id", "lang", "source", "n_chars"
    )


@query(
    "corpus_quality_gate",
    """
WITH terms AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
uni AS (
  SELECT doc_id,
         CAST(SUM(tf) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_unique,
         CAST(MAX(tf) AS BIGINT) AS top_tf,
         CAST(SUM(len(term) * tf) AS BIGINT) AS sum_len
  FROM tf GROUP BY doc_id
),
tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
bigrams AS (
  SELECT doc_id, array_to_string(toks[i.i:i.i+1], ' ') AS bigram
  FROM tk, LATERAL (SELECT unnest(range(1, greatest(len(toks) - 1, 1) + 1)) AS i) i(i)
),
btf AS (SELECT doc_id, bigram, COUNT(*) AS tf FROM bigrams GROUP BY 1, 2),
bi AS (
  SELECT doc_id,
         CAST(SUM(tf) AS BIGINT) AS n_bigrams,
         CAST(SUM(CASE WHEN tf > 1 THEN tf ELSE 0 END) AS BIGINT) AS dup_bigram_mass
  FROM btf GROUP BY doc_id
)
SELECT u.doc_id, u.n_tokens, u.n_unique, u.top_tf, u.sum_len,
       b.n_bigrams, b.dup_bigram_mass,
       (u.n_tokens >= 10 AND u.sum_len >= 3 * u.n_tokens
        AND u.sum_len <= 10 * u.n_tokens AND 5 * u.top_tf <= u.n_tokens
        AND 2 * b.dup_bigram_mass <= b.n_bigrams) AS passes_gate
FROM uni u JOIN bi b USING (doc_id)
""",
)
def corpus_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style repetition gate. All verdict arithmetic is
    integer cross-multiplication — no rounded quotient anywhere, so
    the comparison is exact by construction."""
    return cp.quality_gate(load_table(spark, sf_dir, "documents"))


_PII_TEXT_SQL = (
    "text || ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com or 555-' "
    "|| lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


@query(
    "corpus_pii_redact",
    f"""
WITH p AS (SELECT doc_id, {_PII_TEXT_SQL} AS t FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{cp.EMAIL_RE}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{cp.PHONE_RE}')) AS INT) AS n_phones,
       md5(regexp_replace(regexp_replace(t, '{cp.EMAIL_RE}', '<EMAIL>', 'g'),
                          '{cp.PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
FROM p
""",
)
def corpus_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over text with deterministically injected email +
    phone tokens (the corpus itself is synthetic and PII-free — the
    injection makes the redaction path observable). Patterns live in
    the Java-regex ∩ RE2 common subset; the md5 pins the exact
    redacted bytes against the oracle's identical replacement."""
    docs = load_table(spark, sf_dir, "documents")
    with_pii = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" reach user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return cp.redact_pii(with_pii)


_MIX_RATES = {"de": 100, "en": 40, "fr": 75, "zh": 50}  # es → default 25


@query(
    "corpus_mixture_sample",
    f"""
SELECT doc_id, lang, source
FROM documents
WHERE {hash_bucket_sql("doc_id", 100)} <
      CASE lang WHEN 'de' THEN 100 WHEN 'en' THEN 40
                WHEN 'fr' THEN 75 WHEN 'zh' THEN 50 ELSE 25 END
""",
)
def corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixture weighting: keep all German, 40% of English, 75%
    French, 50% Chinese, 25% anything else — per-document fate is a
    pure hash function, so the mixture is rerun-stable and the filter
    is scan-level codegen arithmetic (no shuffle, no RNG)."""
    docs = load_table(spark, sf_dir, "documents")
    return cp.mixture_sample(docs, _MIX_RATES, default_pct=25).select(
        "doc_id", "lang", "source"
    )


@query(
    "corpus_pack_sequences",
    """
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens AS start
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(start // 256 AS BIGINT) AS seq_id,
       CAST(start % 256 AS BIGINT) AS seq_offset
FROM c
""",
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing into 256-token training sequences.
    The oracle is the naive global window; the Spark plan is the
    scalable two-pass range-partition prefix sum (operators/corpus.py
    pack_sequences) — same numbers, no single-task sort."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    return cp.pack_sequences(docs, budget=256, count_col="n_tokens")


@query(
    "corpus_global_shuffle",
    f"""
WITH h AS (
  SELECT doc_id, {hash_bucket_sql("doc_id", 1_000_000_007)} AS hh FROM documents
)
SELECT doc_id, CAST(hh % 8 AS INT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY hh % 8 ORDER BY hh, doc_id) AS BIGINT)
         AS shard_pos
FROM h
""",
)
def corpus_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into 8 training shards: one hash
    exchange + in-partition sort (Spark's native shape), position
    reproducible across engines via the multiplicative hash."""
    docs = load_table(spark, sf_dir, "documents")
    return cp.global_shuffle(docs, n_shards=8).select("doc_id", "shard", "shard_pos")


@query(
    "corpus_token_budget",
    f"""
WITH t AS (
  SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         {hash_bucket_sql("doc_id", 1_000_000_007)} AS hh
  FROM documents
),
c AS (
  SELECT doc_id, lang, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY lang ORDER BY hh, doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS tape_start
  FROM t
)
SELECT doc_id, lang, n_tokens, CAST(tape_start AS BIGINT) AS tape_start
FROM c WHERE tape_start < 2500
""",
)
def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap every language at 2500 training tokens, taken in
    deterministic hash order. The oracle is the naive per-domain
    global window; the Spark plan is the bucketed two-level prefix sum
    (operators/corpus.py token_budget_sample) whose largest window
    partition is 1/64th of a domain — same numbers, no
    domain-sized window task."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    return cp.token_budget_sample(docs, budget=2500).select(
        "doc_id", "lang", "n_tokens", "tape_start"
    )


@query(
    "corpus_repeat_upsample",
    """
SELECT doc_id, lang, CAST(g.i AS INT) AS copy_idx
FROM documents, LATERAL (
  SELECT unnest(range(1, CASE lang WHEN 'es' THEN 3 WHEN 'zh' THEN 2 ELSE 1 END + 1)) AS i
) g(i)
""",
)
def corpus_repeat_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch upsampling for low-resource languages: Spanish ×3,
    Chinese ×2, everything else ×1 — the counterweight to the
    token-budget cap. Narrow generated-sequence explode; the copy
    index rides along so downstream shuffling interleaves epochs
    deterministically."""
    docs = load_table(spark, sf_dir, "documents")
    return cp.repeat_upsample(docs, {"es": 3, "zh": 2}).select(
        "doc_id", "lang", "copy_idx"
    )


@query(
    "corpus_bigram_lm",
    """
WITH tk AS (SELECT lang, string_split(text, ' ') AS toks FROM documents),
bg AS (
  SELECT lang, array_to_string(toks[i.i:i.i+1], ' ') AS bigram
  FROM tk, LATERAL (SELECT unnest(range(1, greatest(len(toks) - 1, 1) + 1)) AS i) i(i)
),
ct AS (SELECT lang, bigram, CAST(COUNT(*) AS BIGINT) AS cnt FROM bg GROUP BY 1, 2),
rk AS (SELECT lang, bigram, cnt,
              CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, bigram) AS INT)
                AS rnk
       FROM ct)
SELECT lang, bigram, cnt, rnk FROM rk WHERE rnk <= 20
""",
)
def corpus_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top-20 bigram count table (count-based LM /
    domain-signature features). Counts stay integers across the
    engine boundary; lexicographic tie-break pins the top-k set."""
    return cp.bigram_lm_topk(load_table(spark, sf_dir, "documents"), k=20).select(
        "lang", "bigram", "cnt", "rnk"
    )


@query(
    "corpus_source_drift",
    """
WITH terms AS (
  SELECT source AS domain, unnest(string_split(text, ' ')) AS term FROM documents
),
dt AS (SELECT domain, term, CAST(COUNT(*) AS BIGINT) AS c_dt FROM terms GROUP BY 1, 2),
dtot AS (SELECT domain, SUM(c_dt) AS n_d FROM dt GROUP BY 1),
tt AS (SELECT term, SUM(c_dt) AS c_t FROM dt GROUP BY 1),
na AS (SELECT SUM(c_dt) AS n_all FROM dt)
SELECT domain,
       ROUND((SUM(ABS(CAST(c_dt AS DOUBLE) / n_d
                      - CAST(c_t AS DOUBLE) / n_all))
              + (1.0 - SUM(CAST(c_t AS DOUBLE) / n_all))) / 2, 6)
         AS tv_distance
FROM dt JOIN tt USING (term) JOIN dtot USING (domain) CROSS JOIN na
GROUP BY domain
""",
)
def corpus_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture drift monitor: total-variation distance between each
    source's token distribution and the corpus-wide one. TV over KL on
    purpose — ratios of integer counts and absolute differences only,
    no logarithms, so there is no libm variance between engines and
    the 6-dp rounded values match exactly."""
    docs = load_table(spark, sf_dir, "documents")
    out = cp.source_drift_tv(docs, domain_col="source")
    return out.select("domain", F.round("tv_distance", 6).alias("tv_distance"))


@query(
    "corpus_pipeline",
    f"""
WITH train AS (SELECT * FROM documents WHERE doc_id % 10 <> 0),
eval_docs AS (SELECT * FROM documents WHERE doc_id % 10 = 0),
terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM train),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
uni AS (SELECT doc_id, SUM(tf) AS n_tokens, MAX(tf) AS top_tf,
               SUM(len(term) * tf) AS sum_len
        FROM tf GROUP BY doc_id),
tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM train),
bigrams AS (
  SELECT doc_id, array_to_string(toks[i.i:i.i+1], ' ') AS bigram
  FROM tk, LATERAL (SELECT unnest(range(1, greatest(len(toks) - 1, 1) + 1)) AS i) i(i)
),
btf AS (SELECT doc_id, bigram, COUNT(*) AS tf FROM bigrams GROUP BY 1, 2),
bi AS (SELECT doc_id, SUM(tf) AS n_bigrams,
              SUM(CASE WHEN tf > 1 THEN tf ELSE 0 END) AS dup_mass
       FROM btf GROUP BY doc_id),
gated AS (
  SELECT t.* FROM train t JOIN uni u USING (doc_id) JOIN bi b USING (doc_id)
  WHERE u.n_tokens >= 10 AND u.sum_len >= 3 * u.n_tokens
    AND u.sum_len <= 10 * u.n_tokens AND 5 * u.top_tf <= u.n_tokens
    AND 2 * b.dup_mass <= b.n_bigrams
),
winners AS (
  SELECT MIN(doc_id) AS doc_id FROM gated
  GROUP BY md5(lower(trim(regexp_replace(text, ' +', ' ', 'g'))))
),
dd AS (SELECT g.* FROM gated g JOIN winners w USING (doc_id)),
tk2 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM dd),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i.i:i.i+4], ' ') AS shingle
  FROM tk2, LATERAL (SELECT unnest(range(1, greatest(len(toks) - 4, 1) + 1)) AS i) i(i)
),
etk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM eval_docs),
esh AS (
  SELECT DISTINCT array_to_string(toks[i.i:i.i+4], ' ') AS shingle
  FROM etk, LATERAL (SELECT unnest(range(1, greatest(len(toks) - 4, 1) + 1)) AS i) i(i)
),
bad AS (SELECT DISTINCT s.doc_id FROM sh s JOIN esh USING (shingle)),
clean AS (SELECT * FROM dd WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
mixed AS (
  SELECT * FROM clean
  WHERE {hash_bucket_sql("doc_id", 100)} <
        CASE lang WHEN 'de' THEN 100 WHEN 'en' THEN 40
                  WHEN 'fr' THEN 75 WHEN 'zh' THEN 50 ELSE 25 END
),
cnt AS (SELECT doc_id, lang, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM mixed),
packed AS (
  SELECT doc_id, lang, source, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens
           AS start
  FROM cnt
)
SELECT doc_id, lang, source, n_tokens,
       CAST(start // 256 AS BIGINT) AS seq_id,
       CAST(start % 256 AS BIGINT) AS seq_offset
FROM packed
""",
)
def corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole corpus-shaping flow as ONE lazy Catalyst plan —
    quality gate → exact dedup (min-id winners) → benchmark
    decontamination (5-gram) → domain mixture sampling → 256-token
    sequence packing. Every stage is the already-oracle-verified
    operator; composing them declaratively means Catalyst sees one
    tree: the gate's semi join, the dedup semi join, and the
    decontamination anti join all reuse the same scan, filters reach
    parquet once, and nothing materializes between stages except the
    packing pass's O(partitions) offsets."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 10 != 0)
    eval_set = docs.filter(F.col("doc_id") % 10 == 0)
    gate = cp.quality_gate(train).filter(F.col("passes_gate")).select("doc_id")
    gated = train.join(gate, "doc_id", "left_semi")
    from whisky_wine_etl_spark.operators.dedup import exact_dedup

    winners = exact_dedup(gated).select("doc_id")
    deduped = gated.join(winners, "doc_id", "left_semi")
    clean = cp.decontaminate(deduped, eval_set, n=5)
    mixed = cp.mixture_sample(clean, _MIX_RATES, default_pct=25)
    cnt = mixed.select(
        "doc_id", "lang", "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    packed = cp.pack_sequences(
        cnt.select("doc_id", "n_tokens"), budget=256, count_col="n_tokens"
    )
    return cnt.select("doc_id", "lang", "source").join(packed, "doc_id").select(
        "doc_id", "lang", "source", "n_tokens", "seq_id", "seq_offset"
    )
