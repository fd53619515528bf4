"""Round-4ah: BPE encode — apply the trained merges to the corpus.

The other half of corpus_bpe_train_rounds (round4s): learn the same
three merges, then ENCODE every document by joining its words to the
merge-applied vocabulary — the production-tokenizer trick of encoding
the vocabulary once and amortizing it over every occurrence.

Registered AFTER round4ag so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query

_COUNT = """
  SELECT p.a || ' ' || p.b AS pair, SUM(freq) AS cnt
  FROM (
    SELECT freq, s[i] AS a, s[i + 1] AS b
    FROM (SELECT freq, string_split(sym, ' ') AS s FROM {vocab}) v,
         LATERAL (SELECT unnest(range(1, len(s))) AS i) t(i)
  ) p
  GROUP BY p.a || ' ' || p.b
"""

_BEST = "SELECT pair FROM {counts} ORDER BY cnt DESC, pair LIMIT 1"

_MERGE = """
  SELECT word, freq, replace(sym, (SELECT pair FROM {best}),
                             replace((SELECT pair FROM {best}), ' ', '')) AS sym
  FROM {vocab}
"""


@query(
    "corpus_bpe_apply",
    f"""
WITH words AS (
  SELECT t.w AS word, CAST(COUNT(*) AS BIGINT) AS freq
  FROM documents, LATERAL (SELECT unnest(string_split(text, ' ')) AS w) t
  WHERE t.w <> '' GROUP BY t.w
),
v0 AS (SELECT word, freq, trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS sym
       FROM words),
c1 AS ({_COUNT.format(vocab="v0")}), b1 AS ({_BEST.format(counts="c1")}),
v1 AS ({_MERGE.format(best="b1", vocab="v0")}),
c2 AS ({_COUNT.format(vocab="v1")}), b2 AS ({_BEST.format(counts="c2")}),
v2 AS ({_MERGE.format(best="b2", vocab="v1")}),
c3 AS ({_COUNT.format(vocab="v2")}), b3 AS ({_BEST.format(counts="c3")}),
v3 AS ({_MERGE.format(best="b3", vocab="v2")}),
enc AS (SELECT word, len(string_split(sym, ' ')) AS n_tok FROM v3),
occ AS (
  SELECT d.lang, t.w AS word
  FROM documents d, LATERAL (SELECT unnest(string_split(d.text, ' ')) AS w) t
  WHERE t.w <> ''
)
SELECT o.lang,
       CAST(COUNT(*) AS BIGINT) AS n_word_instances,
       CAST(SUM(length(o.word)) AS BIGINT) AS n_chars,
       CAST(SUM(e.n_tok) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(length(o.word)) AS DOUBLE) / SUM(e.n_tok), 6) AS chars_per_token
FROM occ o JOIN enc e ON e.word = o.word
GROUP BY o.lang ORDER BY o.lang
""",
)
def corpus_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode the corpus with the 3 trained BPE merges and report
    per-language token statistics (chars-per-token is the
    compression the merges bought).

    Scale shape: the merges are learned on the frequency-weighted
    VOCABULARY (one corpus word-count, then vocabulary-bounded
    rounds, each merge a 1-row broadcast); encoding never re-runs
    merges per occurrence — the encoded vocabulary joins back to the
    word-occurrence stream as a hash join on the word. At 100 TB
    that's one explode + one join per document scan, with the
    trained tokenizer table reusable across every downstream job."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    vocab = words.select(
        F.col("w").alias("word"),
        "freq",
        F.trim(F.regexp_replace("w", "(.)", "$1 ")).alias("sym"),
    ).localCheckpoint(eager=True)
    for _ in range(3):
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
        best = pairs.orderBy(F.desc("cnt"), "pair").limit(1)
        vocab = (
            vocab.crossJoin(F.broadcast(best.select("pair")))
            .select(
                "word",
                "freq",
                F.replace(
                    F.col("sym"),
                    F.col("pair"),
                    F.replace(F.col("pair"), F.lit(" "), F.lit("")),
                ).alias("sym"),
            )
            .localCheckpoint(eager=True)
        )
    enc = vocab.select(
        "word", F.size(F.split("sym", " ")).alias("n_tok")
    )
    occ = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("word")
    ).where(F.col("word") != "")
    return (
        occ.join(enc, "word")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_word_instances"),
            F.sum(F.length("word")).cast("bigint").alias("n_chars"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.round(F.sum(F.length("word")) / F.sum("n_tok"), 6).alias(
                "chars_per_token"
            ),
        )
        .orderBy("lang")
    )
