"""Round-4s additions: a three-round BPE tokenizer trainer (merge
learning as weighted aggregation over the word vocabulary), a regexp
function pack, and a string-distance pack.

Registered AFTER round4r so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# BPE tokenizer training, three merge rounds — the trainer behind
# text_bpe_merge_pairs (which ranks ONE round's pair counts): learn
# the top merge, apply it to the symbolized vocabulary, recount,
# three times. The scale property BPE trainers rely on: after one
# corpus-sized word count, every round operates on the WORD
# VOCABULARY weighted by frequency — vocabulary-bounded work no
# matter how large the corpus — and the learned merge is a 1-row
# broadcast applied with a plain (non-regex) replace. The oracle
# unrolls the identical three rounds as chained CTEs.
# ---------------------------------------------------------------------------

# one round of pair counting + argmax over a symbolized vocab CTE
_BPE_COUNT = """
  SELECT p.a || ' ' || p.b AS pair, SUM(freq) AS cnt
  FROM (
    SELECT freq, s[i] AS a, s[i + 1] AS b
    FROM (SELECT freq, string_split(sym, ' ') AS s FROM {vocab}) v,
         LATERAL (SELECT unnest(range(1, len(s))) AS i) t(i)
  ) p
  GROUP BY p.a || ' ' || p.b
"""

_BPE_BEST = """
  SELECT pair, cnt FROM {counts}
  ORDER BY cnt DESC, pair LIMIT 1
"""

_BPE_MERGE = """
  SELECT freq, replace(sym, (SELECT pair FROM {best}),
                       replace((SELECT pair FROM {best}), ' ', '')) AS sym
  FROM {vocab}
"""


@query(
    "corpus_bpe_train_rounds",
    f"""
WITH words AS (
  SELECT t.w AS word, CAST(COUNT(*) AS BIGINT) AS freq
  FROM documents, LATERAL (SELECT unnest(string_split(text, ' ')) AS w) t
  WHERE t.w <> '' GROUP BY t.w
),
v0 AS (
  SELECT freq, trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS sym FROM words
),
c1 AS ({_BPE_COUNT.format(vocab="v0")}),
b1 AS ({_BPE_BEST.format(counts="c1")}),
v1 AS ({_BPE_MERGE.format(best="b1", vocab="v0")}),
c2 AS ({_BPE_COUNT.format(vocab="v1")}),
b2 AS ({_BPE_BEST.format(counts="c2")}),
v2 AS ({_BPE_MERGE.format(best="b2", vocab="v1")}),
c3 AS ({_BPE_COUNT.format(vocab="v2")}),
b3 AS ({_BPE_BEST.format(counts="c3")})
SELECT 1 AS round, pair AS merge_pair, CAST(cnt AS BIGINT) AS pair_count FROM b1
UNION ALL
SELECT 2, pair, CAST(cnt AS BIGINT) FROM b2
UNION ALL
SELECT 3, pair, CAST(cnt AS BIGINT) FROM b3
""",
)
def corpus_bpe_train_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first three BPE merges over the document corpus:
    symbolize each vocabulary word to space-separated characters,
    then per round (1) count adjacent symbol pairs weighted by word
    frequency, (2) take the (count DESC, pair ASC) argmax, (3) apply
    the merge with a literal left-to-right replace — identical
    non-overlapping semantics in both engines. The corpus-sized work
    is exactly ONE word-frequency groupBy; all three training rounds
    run over the frequency-weighted vocabulary (bounded by distinct
    words, not corpus rows), and each learned merge reaches the next
    round as a 1-row broadcast. This is the real scaling shape of
    BPE training at 100 TB: count words once, train on the
    vocabulary."""
    docs = _t(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    # eager=False checkpoints throughout (r13): the final collect
    # materializes the 3-round chain of persist-backed checkpoints in
    # one job — 7 eager setup jobs folded away, identical plans/rows.
    vocab = words.select(
        "freq",
        F.trim(F.regexp_replace("w", "(.)", "$1 ")).alias("sym"),
    ).localCheckpoint(eager=False)

    out_rows = []
    for rnd in range(1, 4):
        pairs = (
            vocab.where(F.size(F.split("sym", " ")) >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(split(sym, ' ')) - 1),"
                        " i -> named_struct("
                        "'a', element_at(split(sym, ' '), i),"
                        " 'b', element_at(split(sym, ' '), i + 1)))"
                    )
                ).alias("p"),
            )
            .select(F.concat_ws(" ", "p.a", "p.b").alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), "pair").limit(1).localCheckpoint(
            eager=False
        )
        out_rows.append(
            best.select(
                F.lit(rnd).alias("round"),
                F.col("pair").alias("merge_pair"),
                F.col("cnt").cast("bigint").alias("pair_count"),
            )
        )
        vocab = (
            vocab.crossJoin(F.broadcast(best.select("pair")))
            .select(
                "freq",
                F.replace(
                    F.col("sym"),
                    F.col("pair"),
                    F.replace(F.col("pair"), F.lit(" "), F.lit("")),
                ).alias("sym"),
            )
            .localCheckpoint(eager=False)
        )
    res = out_rows[0]
    for r in out_rows[1:]:
        res = res.unionAll(r)
    return res


# ---------------------------------------------------------------------------
# Regexp function pack — extract_all, count, instr, substr, and a
# global replace, aggregated so every value lands in the hash.
# ---------------------------------------------------------------------------


@query(
    "func_regexp_pack",
    """
SELECT lang,
       CAST(SUM(len(regexp_extract_all(text, '[a-z]+[0-9]+'))) AS BIGINT)
         AS n_alnum_runs,
       CAST(SUM(len(regexp_extract_all(text, '\\b[a-z]{7,}\\b'))) AS BIGINT)
         AS n_long_words,
       CAST(SUM(CASE WHEN regexp_matches(text, '[0-9]{3,}') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_docs_with_numrun,
       CAST(SUM(length(regexp_replace(text, '[aeiou]', '', 'g'))) AS BIGINT)
         AS n_chars_no_vowels
FROM documents GROUP BY lang
""",
)
def func_regexp_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp builtin coverage per language: regexp_extract_all run
    counts (two patterns), a regexp-match indicator, and the length
    after a global vowel strip — all JVM regex evaluation, exact
    integer aggregates. DuckDB phrases the same operations with its
    RE2 functions; counts agree because both patterns avoid
    engine-specific syntax (no lookaround, POSIX classes only)."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.sum(F.size(F.regexp_extract_all("text", F.lit("([a-z]+[0-9]+)"))))
        .cast("bigint")
        .alias("n_alnum_runs"),
        F.sum(F.size(F.regexp_extract_all("text", F.lit(r"(\b[a-z]{7,}\b)"))))
        .cast("bigint")
        .alias("n_long_words"),
        F.sum(F.when(F.col("text").rlike("[0-9]{3,}"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_docs_with_numrun"),
        F.sum(F.length(F.regexp_replace("text", "[aeiou]", "")))
        .cast("bigint")
        .alias("n_chars_no_vowels"),
    )


# ---------------------------------------------------------------------------
# String-distance pack — levenshtein (the edit-distance builtin both
# engines ship) plus translate/initcap round-trips, as per-segment
# checksums. levenshtein(name, digit->letter translated name) counts
# exactly the digit substitutions, which pins both implementations
# against a closed-form expectation, not just against each other.
# ---------------------------------------------------------------------------


@query(
    "func_string_distance_pack",
    """
SELECT c_mktsegment AS segment,
       CAST(SUM(levenshtein(c_name,
                 translate(c_name, '0123456789', 'OIZEASGTBQ'))) AS BIGINT)
         AS lev_digits,
       CAST(SUM(levenshtein(c_name, upper(c_name))) AS BIGINT) AS lev_case,
       CAST(SUM(length(c_name) - length(replace(c_name, '0', ''))) AS BIGINT)
         AS n_zeros
FROM customer GROUP BY c_mktsegment
""",
)
def func_string_distance_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance checksums per market segment: levenshtein
    against the digit->letter translate (equals the number of digit
    chars — a closed-form cross-check), levenshtein against the
    uppercased name (counts lowercase letters), and a replace-based
    zero count. Exact integers, whole-stage codegen, one shuffle."""
    c = _t(spark, sf_dir, "customer")
    return c.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.sum(
            F.levenshtein(
                "c_name",
                F.translate("c_name", "0123456789", "OIZEASGTBQ"),
            )
        )
        .cast("bigint")
        .alias("lev_digits"),
        F.sum(F.levenshtein("c_name", F.upper("c_name")))
        .cast("bigint")
        .alias("lev_case"),
        F.sum(
            F.length("c_name") - F.length(F.replace("c_name", F.lit("0"), F.lit("")))
        )
        .cast("bigint")
        .alias("n_zeros"),
    )
