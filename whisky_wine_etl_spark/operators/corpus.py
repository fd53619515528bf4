"""Corpus-shaping operators for a large-scale training-data pipeline:
decontamination, heuristic quality gates, PII redaction, domain
mixture sampling, sequence packing, and deterministic global shuffle.

These are the steps between "raw deduped documents" and "training
shards". Design rules, same as the rest of the engine:

- every decision is a pure function of the data (no RNG, no driver
  state), so reruns and backfills are stable and a SQL oracle can
  verify the exact output;
- everything stays JVM-side in built-in expressions; the only
  shuffles are the ones the semantics require (one hash-join for
  decontamination, one tf-shuffle for the quality gate, one range /
  hash shuffle for packing and shuffling);
- nothing is collected to the driver except O(num_partitions)
  bookkeeping (the packing prefix sums — same two-pass pattern as
  operators/keys.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whisky_wine_etl_spark.operators.sampling import hash_bucket

# ---------------------------------------------------------------------------
# decontamination


def ngram_shingles(
    df: DataFrame, n: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word n-gram shingles per document (one row per
    (doc, shingle)): tokenize once, slide with `sequence` + `slice`.
    Narrow until the explode; no Python."""
    toks = F.split(F.col(text_col), " ")
    return (
        df.select(F.col(id_col), toks.alias("__toks"))
        .select(
            id_col,
            F.explode(
                F.expr(
                    f"array_distinct(transform("
                    f"sequence(1, greatest(size(__toks) - {n - 1}, 1)),"
                    f" i -> array_join(slice(__toks, i, {n}), ' ')))"
                )
            ).alias("shingle"),
        )
    )


def decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove from `train` every document sharing at least one word
    n-gram with `eval_set` — the standard benchmark-decontamination
    step (the published recipes use 8–13-gram overlap; `n` is the
    knob).

    Shape: shingle both sides, LEFT SEMI join train-shingles against
    distinct eval-shingles to find contaminated ids, LEFT ANTI join
    back. Two hash shuffles on `shingle`/`id`; the eval side is
    usually benchmark-sized, so AQE broadcasts it and the train side
    never shuffles for the probe. At 100 TB, map shingles to 64-bit
    hashes (xxhash64) before the join to cut shuffle width — kept as
    raw strings here so the oracle's equality is byte-exact."""
    train_sh = ngram_shingles(train, n, text_col, id_col)
    eval_sh = ngram_shingles(eval_set, n, text_col, id_col).select("shingle").distinct()
    contaminated = train_sh.join(eval_sh, "shingle", "left_semi").select(id_col).distinct()
    return train.join(contaminated, id_col, "left_anti")


# ---------------------------------------------------------------------------
# quality gate (Gopher/C4-style repetition & shape heuristics)


def quality_gate(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Repetition/shape heuristics in the Gopher & C4 family: token
    count bounds, mean word length bounds, top-single-token mass,
    duplicate-bigram mass. Emits the raw integer features plus the
    gate verdict.

    All comparisons are integer cross-multiplications (mean length in
    [3, 10] ⇔ 3·n ≤ sum_len ≤ 10·n), so the output carries no rounded
    quotient anywhere — exact across engines by construction.

    Shape: one explode→groupBy per feature family (unigram tf,
    bigram tf), joined on doc id — two shuffles, fully partial-agg'd.
    The all-array alternative (no shuffle) is O(tokens²) per doc via
    nested `filter`, which dies on 10k-token documents; explode keeps
    per-row work linear at any document length."""
    toks = F.split(F.col(text_col), " ")
    uni = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_unique"),
            F.max("tf").alias("top_tf"),
            F.sum(F.length("term") * F.col("tf")).alias("sum_len"),
        )
    )
    bi = (
        df.select(
            F.col(id_col),
            F.explode(
                F.expr(
                    f"transform(sequence(1, greatest(size(split({text_col}, ' ')) - 1, 1)),"
                    f" i -> array_join(slice(split({text_col}, ' '), i, 2), ' '))"
                )
            ).alias("bigram"),
        )
        .groupBy(id_col, "bigram")
        .agg(F.count(F.lit(1)).alias("tf"))
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.sum(F.when(F.col("tf") > 1, F.col("tf")).otherwise(0)).alias("dup_bigram_mass"),
        )
    )
    out = uni.join(bi, id_col)
    passes = (
        (F.col("n_tokens") >= 10)
        & (F.col("sum_len") >= 3 * F.col("n_tokens"))
        & (F.col("sum_len") <= 10 * F.col("n_tokens"))
        & (5 * F.col("top_tf") <= F.col("n_tokens"))  # top token < 20% of mass
        & (2 * F.col("dup_bigram_mass") <= F.col("n_bigrams"))  # dup bigrams < 50%
    )
    return out.select(
        id_col,
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_unique").cast("bigint").alias("n_unique"),
        F.col("top_tf").cast("bigint").alias("top_tf"),
        F.col("sum_len").cast("bigint").alias("sum_len"),
        F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
        F.col("dup_bigram_mass").cast("bigint").alias("dup_bigram_mass"),
        passes.alias("passes_gate"),
    )


# ---------------------------------------------------------------------------
# PII redaction

# [.] instead of \\. : literal-dot via character class needs no escape
# processing, so the pattern is byte-identical as a Python string, a
# Spark SQL literal, and a DuckDB literal
EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z][a-zA-Z]+"
PHONE_RE = "[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]"


def redact_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Scrub email addresses and phone-shaped numbers, reporting match
    counts and an md5 of the redacted text (pins the exact bytes
    without shipping the text through the compare).

    The patterns stay in the Java-regex ∩ RE2 common subset (explicit
    classes, no backrefs/lookaround) so the DuckDB oracle computes the
    identical redaction. Narrow projection — regexp_replace/extract_all
    run inside codegen, no shuffle, no Python."""
    t = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return df.select(
        id_col,
        F.size(F.expr(f"regexp_extract_all({text_col}, '{EMAIL_RE}', 0)"))
        .cast("int")
        .alias("n_emails"),
        F.size(F.expr(f"regexp_extract_all({text_col}, '{PHONE_RE}', 0)"))
        .cast("int")
        .alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


# ---------------------------------------------------------------------------
# domain mixture sampling


def mixture_sample(
    df: DataFrame,
    rates_pct: dict[str, int],
    domain_col: str = "lang",
    key_col: str = "doc_id",
    default_pct: int = 0,
) -> DataFrame:
    """Per-domain deterministic downsampling — the mixture-weighting
    step that balances a corpus (e.g. cap English at 40%, keep all
    low-resource languages). A document's fate is a pure function of
    (key hash, its domain's rate): rerun-stable, engine-independent,
    and the filter is plain codegen arithmetic on the scan — no
    shuffle, no RNG, no driver state."""
    rate = F.lit(default_pct)
    for dom, pct in sorted(rates_pct.items()):
        rate = F.when(F.col(domain_col) == dom, F.lit(pct)).otherwise(rate)
    return df.filter(hash_bucket(key_col, 100) < rate)


# ---------------------------------------------------------------------------
# sequence packing


def pack_sequences(
    df: DataFrame,
    budget: int,
    count_col: str,
    order_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents in `order_col`
    order are laid head-to-tail on one global token tape; training
    sequence k owns tape positions [k·budget, (k+1)·budget). Each doc
    reports the sequence its FIRST token lands in and its offset
    there — the standard "pack to fixed context length" shaping step.

    The naive formulation is a global running sum
    (`sum() OVER (ORDER BY ...)` with no partition) — one task sees
    every row. This uses the same two-pass range-partition pattern as
    operators/keys.py: range-shuffle by order key, per-partition
    partial sums (parallel), O(partitions) driver prefix-sum of the
    partition totals, broadcast the offsets back. localCheckpoint pins
    the sampled range boundaries so both passes see identical
    partitioning."""
    from pyspark.sql import Window as W

    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n_parts, order_col)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = (
        ranged.groupBy("__pid")
        .agg(F.sum(count_col).alias("__t"))
        .orderBy("__pid")
        .collect()
    )
    offsets, acc = [], 0
    for r in totals:
        offsets.append((r["__pid"], acc))
        acc += r["__t"]
    off_df = df.sparkSession.createDataFrame(offsets, "__pid int, __off long")
    w = (
        W.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    start = (F.sum(count_col).over(w) - F.col(count_col) + F.col("__off")).cast("long")
    return (
        ranged.join(F.broadcast(off_df), "__pid")
        .withColumn("__start", start)
        .select(
            order_col,
            F.col(count_col).cast("bigint").alias(count_col),
            # integer div, not float-divide-and-floor: exact at any tape length
            F.expr(f"__start div {budget}").cast("bigint").alias("seq_id"),
            (F.col("__start") % budget).cast("bigint").alias("seq_offset"),
        )
    )


# ---------------------------------------------------------------------------
# deterministic global shuffle


def global_shuffle(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic pseudorandom permutation into training shards:
    shard = hash(key) mod n_shards, position = rank by (hash, key)
    within the shard. Exactly Spark's native shape — one hash shuffle
    on shard + sortWithinPartitions — so it scales as a single
    exchange; no global sort, no driver involvement. The multiplicative
    hash makes the permutation rerun-stable and oracle-checkable (the
    same hash is pure int64 arithmetic in any engine)."""
    from pyspark.sql import Window as W

    h = hash_bucket(key_col, 1_000_000_007)
    w = W.partitionBy("shard").orderBy("__h", key_col)
    return (
        df.withColumn("__h", h)
        .withColumn("shard", (F.col("__h") % n_shards).cast("int"))
        .withColumn("shard_pos", F.row_number().over(w).cast("long"))
        .drop("__h")
    )


# ---------------------------------------------------------------------------
# per-domain token-budget sampling


def token_budget_sample(
    df: DataFrame,
    budget: int,
    domain_col: str = "lang",
    key_col: str = "doc_id",
    count_col: str = "n_tokens",
    n_buckets: int = 64,
) -> DataFrame:
    """Greedy per-domain token-budget cap: documents are laid on a
    per-domain tape in deterministic hash order, and a document is
    kept iff its first token lands under `budget` (so the doc that
    crosses the line is kept whole — epoch semantics, not truncation).
    This is the "cap every domain at N tokens" step of mixture
    building, expressed as a pure function of the data.

    Shape (the 100 TB part): the naive form is a running sum
    partitioned only by domain — a handful of giant window partitions.
    Instead the hash space is cut into `n_buckets` contiguous ranges
    (bucket = hash div width, monotone in the hash, so per-bucket
    order concatenates to the global per-domain order): per-(domain,
    bucket) token masses — a domains × n_buckets frame — get a tiny
    window prefix-sum, broadcast back as offsets, and the per-row
    running sum is windowed by (domain, bucket). No partition ever
    exceeds 1/n_buckets of a domain; same two-pass pattern as
    pack_sequences but with zero driver involvement."""
    from pyspark.sql import Window as W

    m = 1_000_000_007
    width = (m + n_buckets - 1) // n_buckets
    d = df.withColumn("__h", hash_bucket(key_col, m)).withColumn(
        "__b", F.expr(f"__h div {width}").cast("int")
    )
    parts = d.groupBy(domain_col, "__b").agg(F.sum(count_col).alias("__t"))
    w0 = (
        W.partitionBy(domain_col)
        .orderBy("__b")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    off = parts.select(
        domain_col,
        "__b",
        (F.sum("__t").over(w0) - F.col("__t")).cast("long").alias("__off"),
    )
    w1 = (
        W.partitionBy(domain_col, "__b")
        .orderBy("__h", key_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    start = (F.sum(count_col).over(w1) - F.col(count_col) + F.col("__off")).cast("long")
    return (
        d.join(F.broadcast(off), [domain_col, "__b"])
        .withColumn("tape_start", start)
        .filter(F.col("tape_start") < budget)
        .drop("__h", "__b", "__off")
    )


# ---------------------------------------------------------------------------
# low-resource upsampling (epoch repetition)


def repeat_upsample(
    df: DataFrame,
    epochs: dict[str, int],
    domain_col: str = "lang",
    default_epochs: int = 1,
) -> DataFrame:
    """Repeat low-resource domains for multiple training epochs (the
    standard counterweight to capping high-resource ones): each row is
    emitted `epochs[domain]` times with a 1-based `copy_idx`. Pure
    narrow explode over a generated sequence — no shuffle, no RNG, and
    the multiplicity is visible in the output so shard writers can
    interleave copies deterministically."""
    e = F.lit(default_epochs)
    for dom, n in sorted(epochs.items()):
        e = F.when(F.col(domain_col) == dom, F.lit(n)).otherwise(e)
    return df.withColumn("copy_idx", F.explode(F.sequence(F.lit(1), e)))


# ---------------------------------------------------------------------------
# count-based bigram LM table


def bigram_lm_topk(
    df: DataFrame,
    k: int = 20,
    domain_col: str = "lang",
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Top-k bigram count table per domain — the aggregation behind
    count-based LM scoring / domain-signature features. Integer counts
    only (consumers divide; no rounded quotient crosses the engine
    boundary), ties broken lexicographically so the top-k set is
    deterministic.

    Shape: explode bigrams → one (domain, bigram) hash agg (partial +
    final), then a per-domain rank window. The window frame is
    vocabulary-sized, not corpus-sized; at 100 TB raise `min_count` so
    the HAVING-style prefilter bounds the ranked frame before the
    window's sort."""
    from pyspark.sql import Window as W

    bigrams = df.select(
        F.col(domain_col),
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(size(split({text_col}, ' ')) - 1, 1)),"
                f" i -> array_join(slice(split({text_col}, ' '), i, 2), ' '))"
            )
        ).alias("bigram"),
    )
    counts = (
        bigrams.groupBy(domain_col, "bigram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    w = W.partitionBy(domain_col).orderBy(F.col("cnt").desc(), "bigram")
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
    )


# ---------------------------------------------------------------------------
# mixture drift monitoring


def source_drift_tv(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Total-variation distance between each domain's token
    distribution and the corpus-wide distribution — the drift metric a
    mixture pipeline watches to catch a source changing under it
    (TV = ½ Σ|p(term|domain) − p(term|corpus)|, in [0,1]).

    TV is chosen over KL deliberately: every number here is a ratio of
    integer counts and an absolute difference — no logarithms, so
    there is no libm variance across engines and the oracle comparison
    is stable to the last rounded digit.

    Shape: one explode→(domain, term) count, a term-marginal rollup of
    those partials (second small shuffle), a join on term, one final
    agg per domain. Frames after the first agg are vocabulary-sized,
    not corpus-sized. A term absent from a domain contributes
    p(term|corpus)/2 — accounted exactly via the complement-of-mass
    term (Σ_present q) rather than a full domain×vocab dense join."""
    terms = df.select(
        F.col(domain_col).alias("domain"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    # three consumers below — materialize or the corpus-wide explode+agg
    # recomputes once per branch (the union-of-selects trap);
    # localCheckpoint so the blocks free on GC instead of leaking
    dom_term = (
        terms.groupBy("domain", "term")
        .agg(F.count(F.lit(1)).alias("c_dt"))
        .localCheckpoint()
    )
    dom_tot = dom_term.groupBy("domain").agg(F.sum("c_dt").alias("n_d"))
    term_tot = dom_term.groupBy("term").agg(F.sum("c_dt").alias("c_t"))
    # corpus total re-aggregated from the domain totals (domain-count
    # rows), never from the vocab frame a third time
    n_all = dom_tot.agg(F.sum("n_d").alias("n_all"))
    p = F.col("c_dt") / F.col("n_d")  # p(term | domain)
    q = F.col("c_t") / F.col("n_all")  # p(term | corpus)
    # Σ over terms present in the domain: |p−q| and q-mass; terms the
    # domain lacks add q each, i.e. (1 − Σ_present q) in total.
    per_dom = (
        dom_term.join(term_tot, "term")
        .join(F.broadcast(dom_tot), "domain")
        .crossJoin(F.broadcast(n_all))
        .groupBy("domain")
        .agg(
            F.sum(F.abs(p - q)).alias("__present_abs"),
            F.sum(q).alias("__present_q"),
        )
    )
    return per_dom.select(
        "domain",
        ((F.col("__present_abs") + (F.lit(1.0) - F.col("__present_q"))) / 2).alias(
            "tv_distance"
        ),
    )
