"""Skew-resistant aggregation: explicit two-stage salted groupBy.

Spark's partial (map-side) aggregation already handles most skew for
algebraic aggregates; AQE's skew-join handling covers joins. The
residual case is HIGH-CARDINALITY-VALUE skew inside a reduce: one
group key owning a large share of all rows makes its reduce partition
the straggler. Salting splits each hot key into `salt_buckets`
synthetic sub-keys, aggregates partially per sub-key (stage 1 spreads
the hot key over `salt_buckets` reducers), then re-aggregates the
per-bucket partials into the final per-key result (stage 2's input is
only |keys| × salt_buckets rows).

Works for any ALGEBRAIC aggregate with a merge function: sum/count/
min/max directly; avg via (sum, count) decomposition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: merge rule per supported aggregate: how stage-2 combines partials
_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """groupBy(keys).agg(...) with salted two-stage execution.

    aggs: {output_name: (fn, column)} with fn ∈ sum|count|min|max|avg.
    Example: salted_agg(li, ["l_returnflag"],
                        {"sum_price": ("sum", "l_extendedprice"),
                         "n": ("count", "*"),
                         "avg_qty": ("avg", "l_quantity")})
    """
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("__salt")

    stage1_exprs: list[Column] = []
    stage2_exprs: list[Column] = []
    for name, (fn, col) in aggs.items():
        if fn == "avg":
            # Denominator must be the NON-NULL count of the aggregated
            # column (F.count(col)), matching Spark/ANSI avg semantics:
            # avg ignores nulls, so count(1) would dilute the result
            # whenever the value column is nullable.
            stage1_exprs.append(F.sum(col).alias(f"__{name}_sum"))
            stage1_exprs.append(F.count(F.col(col)).alias(f"__{name}_cnt"))
            stage2_exprs.append(
                (F.sum(f"__{name}_sum") / F.sum(f"__{name}_cnt")).alias(name)
            )
        elif fn == "count":
            src = F.lit(1) if col == "*" else F.col(col)
            stage1_exprs.append(F.count(src).alias(f"__{name}_p"))
            stage2_exprs.append(F.sum(f"__{name}_p").alias(name))
        elif fn in _MERGE:
            stage1_exprs.append(getattr(F, fn)(col).alias(f"__{name}_p"))
            stage2_exprs.append(_MERGE[fn](f"__{name}_p").alias(name))
        else:
            raise ValueError(f"unsupported aggregate {fn!r} for salting")

    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*stage1_exprs)
    return partial.groupBy(*keys).agg(*stage2_exprs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-safe inner equi-join: spread each hot LEFT key over
    `salt_buckets` shuffle partitions.

    The left (skewed, usually larger) side gets a uniform random salt;
    the right side is replicated once per salt value via a single
    explode — so the join key becomes (key, salt) and a hot key's rows
    land on `salt_buckets` different reducers instead of one straggler.
    Exact for inner equi-joins: every (l, r) key match meets in exactly
    one salt bucket (l's salt), and the right replication adds no
    matches because salt values are join-conditioned, not emitted.

    Cost model: right side is scanned once and replicated
    `salt_buckets`× through the shuffle — use when the left side's
    skew dominates right·salt_buckets, i.e. hot-key row count ≫
    |right| · salt_buckets / parallelism. AQE's skew-join split
    (spark.sql.adaptive.skewJoin) is the zero-code alternative for
    sort-merge joins; this operator is the explicit fallback for
    plans AQE can't split (e.g. when the skewed side is already
    co-partitioned by an upstream stage, or a broadcast-excluded
    strategy is pinned by hint).
    """
    salt = (F.rand(seed=42) * salt_buckets).cast("int")
    l_s = left.withColumn("__lsalt", salt)
    r_s = right.withColumn(
        "__rsalt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    joined = l_s.join(
        r_s,
        (l_s[left_key] == r_s[right_key]) & (l_s["__lsalt"] == r_s["__rsalt"]),
    )
    return joined.drop(l_s["__lsalt"]).drop(r_s["__rsalt"])
