"""Text-analysis operators for a training-data pipeline, over the
`documents` table — all built-in expressions, no Python in the path.

Operators: tokenization + token stats, quality scoring (length /
punctuation / stopword ratios), n-gram language-ID heuristic,
document fingerprinting (normalized-text hash + rolling word-window
fingerprints), TF-IDF top terms.

Scale: every operator is a narrow projection or one groupBy — at
100 TB each runs as scan→project(+partial agg) with no driver
involvement. The explode-based ones (TF-IDF) shuffle once on the
group key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

# tiny per-language stopword lists for the heuristic language ID.
LANG_STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "en": ["the", "a", "of", "and", "is", "to"],
    "es": ["el", "la", "de", "y", "es", "que"],
    "fr": ["le", "la", "de", "et", "est", "que"],
    "zh": ["的", "是", "在", "了", "我", "不"],
}

ENGLISH_STOPWORDS = LANG_STOPWORDS["en"]


def tokens(col: Column | str) -> Column:
    return F.split(col, " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("int")


def _pin4(col: Column) -> Column:
    """Pinned rounding at 4 dp (functions/rounding.pinned): token and
    stopword ratios are small-denominator rationals that land EXACTLY
    on 4-dp halves (e.g. p/32 → x.xxx5), where Spark HALF_UP and
    DuckDB's rounding have split across versions."""
    from whisky_wine_etl_spark.functions.rounding import pinned

    return pinned(col, 4)


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    t = tokens(text_col)
    return df.select(
        id_col,
        token_count(text_col).alias("n_tokens"),
        F.length(text_col).cast("int").alias("n_chars_actual"),
        F.size(F.array_distinct(t)).cast("int").alias("n_unique_tokens"),
        _pin4(
            F.aggregate(
                F.transform(t, lambda w: F.length(w).cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.size(t)
        ).alias("avg_token_len"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic quality features + composite score in [0, 1]:
    length credit, unique-token ratio, stopword presence — the usual
    cheap pre-filters before expensive LLM-data processing."""
    t = tokens(text_col)
    n_tok = F.size(t)
    stop_list = ", ".join(f"'{w}'" for w in ENGLISH_STOPWORDS)
    n_stop = F.size(F.expr(f"filter(split({text_col}, ' '), w -> w IN ({stop_list}))"))
    uniq_ratio = F.size(F.array_distinct(t)) / n_tok
    stop_ratio = n_stop / n_tok
    length_credit = F.least(F.length(text_col) / F.lit(500.0), F.lit(1.0))
    score = _pin4(
        0.4 * length_credit + 0.4 * uniq_ratio + 0.2 * F.least(stop_ratio * 5, F.lit(1.0))
    )
    return df.select(
        id_col,
        n_tok.cast("int").alias("n_tokens"),
        _pin4(uniq_ratio).alias("unique_ratio"),
        _pin4(stop_ratio).alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: count stopword hits per language, pick
    the first language (alphabetical) with the max positive count,
    else 'und'. Deterministic — the DuckDB oracle applies the same rule."""
    cols = []
    for lang, words in sorted(LANG_STOPWORDS.items()):
        quoted = ", ".join(f"'{w}'" for w in words)
        cols.append(
            F.size(F.expr(f"filter(split({text_col}, ' '), w -> w IN ({quoted}))"))
            .cast("int")
            .alias(f"hits_{lang}")
        )
    scored = df.select(id_col, *cols)
    langs = sorted(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):
        pred = F.when((F.col(f"hits_{lang}") == best) & (best > 0), lang).otherwise(pred)
    return scored.select(id_col, *[f"hits_{lang}" for lang in langs], pred.alias("pred_lang"))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase
    text, plus a coarse rolling fingerprint (min md5 over 8-token
    windows — a winnowing-style representative for near-dup blocking).
    Normalized text + token array are materialized once per row so the
    window transform doesn't re-normalize per position."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), " +", " ")))
    windows = F.expr(
        "transform(sequence(1, greatest(size(__toks) - 7, 1)), "
        "i -> md5(array_join(slice(__toks, i, 8), ' ')))"
    )
    return df.select(
        id_col, norm.alias("__norm"), F.split(norm, " ").alias("__toks")
    ).select(
        id_col,
        F.md5("__norm").alias("doc_md5"),
        F.array_min(windows).alias("rolling_min_fp"),
    )


BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def regex_tokens(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """BPE-ish regex token counting: alpha runs, digit runs, and
    single non-alnum marks each count as one token (the classic
    pre-tokenizer shape). Pattern kept in the RE2∩Java-regex common
    subset so the DuckDB oracle computes the identical split."""
    toks = F.expr(f"regexp_extract_all({text_col}, '{BPE_ISH_PATTERN}', 0)")
    return df.select(
        id_col,
        F.size(toks).cast("int").alias("n_bpe_tokens"),
        F.size(F.expr(f"regexp_extract_all({text_col}, '[a-zA-Z]+', 0)"))
        .cast("int")
        .alias("n_alpha_tokens"),
        F.size(F.expr(f"regexp_extract_all({text_col}, '[0-9]+', 0)"))
        .cast("int")
        .alias("n_numeric_tokens"),
        F.size(F.array_distinct(toks)).cast("int").alias("n_unique_bpe_tokens"),
    )


def chunk_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 50,
    stride: int = 40,
) -> DataFrame:
    """Fixed-window token chunking with overlap — the standard
    pre-training-corpus shaping step (window=50, stride=40 → 10-token
    overlap between consecutive chunks).

    Pure array ops: tokenize once, generate chunk starts with
    `sequence`, `posexplode`, then `slice` the shared token array —
    the text is never re-split per chunk. Emits per chunk its index,
    start offset, token count, and an md5 of the joined chunk text,
    which pins the full chunk content for the oracle without shipping
    megabytes of text through the compare.

    At 100 TB this is a narrow map (scan → project → generate): no
    shuffle, no state, embarrassingly parallel over documents.
    """
    toks = F.split(F.col(text_col), " ")
    base = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.size(toks).alias("__n"),
    ).withColumn(
        "__starts",
        F.expr(f"transform(sequence(0, cast(floor((__n - 1) / {stride}) as int)), i -> i * {stride})"),
    )
    chunk = F.expr(f"slice(__toks, start + 1, {window})")
    return base.select(
        id_col,
        "__toks",
        "__n",
        F.posexplode("__starts").alias("chunk_id", "start"),
    ).select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("start").cast("int").alias("start"),
        F.size(chunk).cast("int").alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


def tfidf_top_terms(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Top-k TF-IDF terms per document. tf = in-doc count,
    idf = ln(N / df). One explode + two shuffles (term df, then the
    per-doc top-k window) — the classic scalable formulation.

    Scale note: `doc_freq` is vocabulary-sized (one row per distinct
    term in the corpus) — unbounded at 100 TB, so it must NOT carry a
    broadcast hint; the tf↔df join is a plain shuffle join on `term`
    (both sides already hash-partitioned by term from their groupBys)
    and AQE will still broadcast it at small SF when it measures under
    the threshold. Only the 1-row `n_docs` scalar is broadcast."""
    tok = df.select(id_col, F.explode(tokens(text_col)).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    doc_freq = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    scored = (
        tf.join(doc_freq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6))
    )
    w = W.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "term", "tf", "df", "tfidf", "rk")
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1
    "repetitious text" filters), computed per document with ZERO
    shuffles — every signal is an array-local expression over the
    token array, so the plan is one map-only scan no matter the corpus
    size (the reason these run as the FIRST gate in a 100 TB pipeline,
    before anything that shuffles):

    - dup_token_frac: fraction of token positions occupied by a repeat
      of an earlier token (1 - distinct/total).
    - top_bigram_frac: occurrences of the single most frequent bigram
      over total bigram count. Computed without a groupBy: sort the
      bigram array, then one `aggregate` pass tracks the longest equal
      run — O(n log n) per row, no shuffle (an exploded groupBy would
      shuffle the whole corpus's bigrams on content).
    - dup_line_frac: fraction of 10-token lines that duplicate another
      line of the SAME document (corpus_line_dedup handles the
      cross-document case — that one genuinely needs the shuffle).
    - keep: the composite gate (thresholds from the Gopher appendix,
      adapted to the 10-token line grain).

    All fractions are exact small-integer ratios, so both engines
    compute bit-identical doubles and the 6-dp round is stable.
    """
    t = F.split(F.col(text_col), " ")
    out = df.select(id_col, t.alias("__toks"))
    n_tok = F.size(F.col("__toks"))
    dup_tok = F.when(n_tok > 0, 1.0 - F.size(F.array_distinct("__toks")) / n_tok).otherwise(
        F.lit(0.0)
    )
    # sequence(0, stop) DESCENDS when stop < 0, so the <2-token case is
    # guarded to an empty array instead of relying on greatest(.., -1)
    _bg = (
        "IF(size(__toks) < 2, array(),"
        " array_sort(transform(sequence(0, size(__toks) - 2),"
        " i -> concat(__toks[i], ' ', __toks[i + 1]))))"
    )
    best_run = F.expr(
        f"aggregate({_bg}, named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0),"
        " (s, x) -> named_struct("
        "   'prev', x,"
        "   'run', IF(s.prev <=> x, s.run + 1, 1),"
        "   'best', greatest(s.best, IF(s.prev <=> x, s.run + 1, 1))),"
        " s -> s.best)"
    )
    n_bg = n_tok - 1
    top_bigram = F.when(n_bg > 0, best_run / n_bg).otherwise(F.lit(0.0))
    lines = F.expr(
        "IF(size(__toks) < 1, array(),"
        " transform(sequence(0, CAST(ceil(size(__toks) / 10.0) AS INT) - 1),"
        " i -> array_join(slice(__toks, i * 10 + 1, 10), ' ')))"
    )
    n_lines = F.size(lines)
    dup_line = F.when(n_lines > 0, 1.0 - F.size(F.array_distinct(lines)) / n_lines).otherwise(
        F.lit(0.0)
    )
    sig = out.select(
        id_col,
        F.round(dup_tok, 6).alias("dup_token_frac"),
        F.round(top_bigram, 6).alias("top_bigram_frac"),
        F.round(dup_line, 6).alias("dup_line_frac"),
    )
    return sig.withColumn(
        "keep",
        (F.col("dup_token_frac") <= 0.6)
        & (F.col("top_bigram_frac") <= 0.18)
        & (F.col("dup_line_frac") <= 0.3),
    )
