"""Round-4ae: deterministic negative sampling for contrastive
training pairs.

Registered AFTER round4ad so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.operators.keys import add_surrogate_key
from whisky_wine_etl_spark.plans.registry import query

_P = 2147483647
_MULTS = (1000003, 1000033, 1000099, 1000117)
_K = 4


@query(
    "corpus_negative_samples",
    f"""
WITH idx AS (
  SELECT doc_id, lang, ROW_NUMBER() OVER (ORDER BY doc_id) AS sk,
         COUNT(*) OVER () AS n
  FROM documents
),
negs AS (
  SELECT a.doc_id AS anchor_id, j.j,
         1 + ((a.sk - 1 + 1 +
               (((a.sk % {_P}) * (CASE j.j WHEN 1 THEN {_MULTS[0]}
                                           WHEN 2 THEN {_MULTS[1]}
                                           WHEN 3 THEN {_MULTS[2]}
                                           ELSE {_MULTS[3]} END)) % {_P})
               % (a.n - 1)) % a.n) AS neg_sk
  FROM idx a, (SELECT CAST(unnest(range(1, {_K + 1})) AS INTEGER) AS j) j(j)
)
SELECT n.anchor_id, CAST(n.j AS INT) AS j, b.doc_id AS negative_id,
       CAST(a.lang = b.lang AS BOOLEAN) AS same_lang
FROM negs n
JOIN idx a ON a.doc_id = n.anchor_id
JOIN idx b ON b.sk = n.neg_sk
ORDER BY n.anchor_id, n.j
""",
)
def corpus_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=4 deterministic negatives per anchor document for
    contrastive training. Documents get contiguous global indices
    via the TWO-PASS surrogate-key assignment (operators/keys.py —
    range shuffle + parallel per-partition numbering, never a
    single-task row_number; the oracle's naive global ROW_NUMBER is
    the semantic twin). Each (anchor, j) maps to a cyclic offset
    1..n−1 from the anchor by the portable multiplicative hash, so
    a draw can never hit its own anchor, reruns are stable, and the
    negative join is a plain int equi-join. same_lang flags the
    hard-vs-easy negative split downstream losses care about."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    idx = add_surrogate_key(docs, ["doc_id"], key_col="sk")
    n = idx.agg(F.count(F.lit(1)).alias("n"))
    a = idx.crossJoin(F.broadcast(n))
    js = spark.createDataFrame([(j,) for j in range(1, _K + 1)], "j int")
    mult = (
        F.when(F.col("j") == 1, _MULTS[0])
        .when(F.col("j") == 2, _MULTS[1])
        .when(F.col("j") == 3, _MULTS[2])
        .otherwise(_MULTS[3])
    )
    h = ((F.col("sk") % _P) * mult) % _P
    neg_sk = 1 + (F.col("sk") - 1 + 1 + (h % (F.col("n") - 1))) % F.col("n")
    negs = a.crossJoin(F.broadcast(js)).select(
        F.col("doc_id").alias("anchor_id"),
        F.col("lang").alias("anchor_lang"),
        "j",
        neg_sk.alias("neg_sk"),
    )
    b = idx.select(
        F.col("sk").alias("neg_sk"),
        F.col("doc_id").alias("negative_id"),
        F.col("lang").alias("neg_lang"),
    )
    return (
        negs.join(b, "neg_sk")
        .select(
            "anchor_id",
            F.col("j").cast("int").alias("j"),
            "negative_id",
            (F.col("anchor_lang") == F.col("neg_lang")).alias("same_lang"),
        )
        .orderBy("anchor_id", "j")
    )
