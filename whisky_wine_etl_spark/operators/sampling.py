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
