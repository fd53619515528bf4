"""Round-4af: train/evaluate split modeling — a first-order Markov
next-event predictor trained on 80% of users and scored on the rest.

Registered AFTER round4ae so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query

_P = 2147483647
_MULT = 1000003


@query(
    "ml_markov_next_event_eval",
    f"""
WITH pairs AS (
  SELECT user_id, event_type AS prev,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt,
         ((user_id % {_P}) * {_MULT}) % {_P} % 10 AS bucket
  FROM events
),
p AS (SELECT * FROM pairs WHERE nxt IS NOT NULL),
train AS (SELECT prev, nxt, CAST(COUNT(*) AS BIGINT) AS c
          FROM p WHERE bucket < 8 GROUP BY prev, nxt),
pred AS (
  SELECT prev, nxt AS predicted FROM (
    SELECT prev, nxt, ROW_NUMBER() OVER (PARTITION BY prev
                                         ORDER BY c DESC, nxt) AS rn
    FROM train
  ) WHERE rn = 1
),
eval_pairs AS (SELECT prev, nxt FROM p WHERE bucket >= 8)
SELECT e.prev,
       CAST(COUNT(*) AS BIGINT) AS n_eval,
       CAST(COUNT(*) FILTER (WHERE e.nxt = pr.predicted) AS BIGINT) AS n_correct,
       ROUND(CAST(COUNT(*) FILTER (WHERE e.nxt = pr.predicted) AS DOUBLE) / COUNT(*), 6)
         AS accuracy,
       MIN(pr.predicted) AS predicted
FROM eval_pairs e JOIN pred pr ON pr.prev = e.prev
GROUP BY e.prev ORDER BY e.prev
""",
)
def ml_markov_next_event_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov next-event model with an honest held-out
    evaluation: users hash-split 80/20 (split by USER, so no
    sequence leaks across the boundary), argmax transition per
    antecedent trained on one partial-agg'd bigram count, and
    per-antecedent accuracy on the held-out users.

    Scale: bigram extraction is one user-partitioned window; the
    model is |event_types|² rows and joins back broadcast. This is
    the standard train→predict→score loop expressed entirely as a
    lazy plan — nothing materializes between stages."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        "user_id",
        F.col("event_type").alias("prev"),
        F.lead("event_type").over(w).alias("nxt"),
        (((F.col("user_id") % _P) * _MULT) % _P % 10).alias("bucket"),
    ).filter(F.col("nxt").isNotNull())
    train = (
        pairs.filter(F.col("bucket") < 8)
        .groupBy("prev", "nxt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    wr = Window.partitionBy("prev").orderBy(F.desc("c"), "nxt")
    pred = (
        train.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select("prev", F.col("nxt").alias("predicted"))
    )
    eval_pairs = pairs.filter(F.col("bucket") >= 8).select("prev", "nxt")
    hit = F.when(F.col("nxt") == F.col("predicted"), 1)
    return (
        eval_pairs.join(F.broadcast(pred), "prev")
        .groupBy("prev")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_eval"),
            F.count(hit).cast("bigint").alias("n_correct"),
            F.round(F.count(hit) / F.count(F.lit(1)), 6).alias("accuracy"),
            F.min("predicted").alias("predicted"),
        )
        .orderBy("prev")
    )
