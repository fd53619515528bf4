"""Deterministic sampling operators.

At 100 TB you cannot re-`collect` a random sample and hope it is the
same one tomorrow: sampling must be a pure function of the data so
reruns, backfills, and train/eval splits stay stable across engines,
partitionings, and cluster sizes. `df.sample()` (per-partition RNG)
gives none of that. These operators sample by hashing the business
key with plain 64-bit arithmetic — a Knuth multiplicative hash —
which every engine evaluates identically, so the DuckDB oracle can
verify the exact same rows.

The hash is evaluated inside whole-stage codegen (pure arithmetic on
the key column), the filter lands directly on the scan, and nothing
shuffles until a downstream op asks for it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

# Knuth's 2^32 / phi multiplier; reduced mod a large prime. The key is
# first folded mod 1_000_003 so the product stays far below 2^63 —
# identical (and overflow-free) in any engine with 64-bit integers.
_MULT = 2654435761
_FOLD = 1_000_003
_PRIME = 1_000_000_007


def hash_bucket(key: Column | str, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) from an integer key."""
    k = F.col(key) if isinstance(key, str) else key
    return ((k % _FOLD) * F.lit(_MULT)) % F.lit(_PRIME) % F.lit(buckets)


def hash_bucket_sql(key: str, buckets: int = 100) -> str:
    """The identical expression as ANSI SQL (for oracles / pushdown)."""
    return f"((({key} % {_FOLD}) * {_MULT}) % {_PRIME}) % {buckets}"


def hash_sample(df: DataFrame, key: str, pct: int, buckets: int = 100) -> DataFrame:
    """Keep rows whose key hashes into the first `pct` of `buckets`.

    Rerun-stable percentage sample: the same key is always in or
    always out, independent of partitioning, ordering, or engine.
    """
    return df.filter(hash_bucket(key, buckets) < pct)


def stratified_first_n(df: DataFrame, group: str, key: str, n: int) -> DataFrame:
    """Deterministic fixed-size per-group sample: rank rows inside each
    group by (hash, key) and keep the first n.

    The hash ordering makes the pick pseudo-random but reproducible;
    the key tiebreak makes it total. One shuffle on the group column
    (the ranking window); at scale prefer `hash_sample` when a
    percentage is acceptable — it needs no shuffle at all.
    """
    w = W.partitionBy(group).orderBy(hash_bucket(key, _PRIME), F.col(key))
    return (
        df.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= n)
    )


def train_eval_split(df: DataFrame, key: str, eval_pct: int = 10) -> DataFrame:
    """Tag each row 'train' / 'eval' by key hash — the stable way to
    hold out an eval set in a training-data pipeline (a document never
    migrates between splits across reruns or data growth)."""
    return df.withColumn(
        "split",
        F.when(hash_bucket(key, 100) < eval_pct, F.lit("eval")).otherwise(F.lit("train")),
    )


def weighted_systematic_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    order_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic weighted sampling, integer-exact: lay rows on a
    cumulative-weight tape in `order_col` order, drop k markers at
    positions m·W/k (m = 1..k), and pick each row once per marker
    inside its [start, start+w) span:

        n_picks = floor((start+w)·k / W) − floor(start·k / W)

    Expected picks are exactly proportional to weight; rows heavier
    than W/k are picked multiple times (the upweighting a mixture
    builder wants); everything is integer arithmetic so the SQL oracle
    reproduces the selection bit-for-bit — no pow/log tie hazards of
    exponential-keys weighted reservoirs.

    The prefix sum uses the same two-pass range-partition pattern as
    corpus.pack_sequences (range shuffle → per-partition partials →
    O(partitions) driver offsets → broadcast back): no single-task
    global window at any scale."""
    from pyspark.sql import Window as W

    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        df.select(order_col, F.col(weight_col).cast("bigint").alias("__w"))
        .repartitionByRange(n_parts, order_col)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = (
        ranged.groupBy("__pid")
        .agg(F.sum("__w").alias("__t"), F.min("__w").alias("__mn"))
        .orderBy("__pid")
        .collect()
    )
    offsets, acc = [], 0
    for r in totals:
        if r["__mn"] is not None and r["__mn"] < 0:
            raise ValueError(
                "weighted_systematic_sample: negative weight "
                f"{r['__mn']} — weights must be non-negative"
            )
        offsets.append((r["__pid"], acc))
        acc += r["__t"] or 0
    total_w = acc
    if total_w <= 0:
        raise ValueError(
            "weighted_systematic_sample: total weight must be positive, got "
            f"{total_w} (empty input or all-zero weights)"
        )
    off_df = spark.createDataFrame(offsets, "__pid int, __off long")
    w = (
        W.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    start = (F.sum("__w").over(w) - F.col("__w") + F.col("__off")).cast("long")
    picks = F.expr(f"((__start + __w) * {k}) div {total_w}") - F.expr(
        f"(__start * {k}) div {total_w}"
    )
    return (
        ranged.join(F.broadcast(off_df), "__pid")
        .withColumn("__start", start)
        .withColumn("n_picks", picks.cast("bigint"))
        .filter(F.col("n_picks") > 0)
        .select(order_col, F.col("__w").alias(weight_col), "n_picks")
    )
