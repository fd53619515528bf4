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


def heavy_hitters_exact(
    df: DataFrame,
    col: str,
    threshold_den: int,
    mg_counters: int | None = None,
) -> DataFrame:
    """Exact frequent items with count > n/threshold_den, found with
    bounded memory via the two-pass Misra–Gries pattern:

    Pass 1 (map-only, NO shuffle): each partition runs a Misra–Gries
    summary with `mg_counters` counters over its local rows and emits
    its surviving candidates. MG guarantees any item with local count
    > local_n/(k+1) survives locally; since an item with GLOBAL count
    > n/threshold_den must exceed that local density in at least one
    partition (pigeonhole), the union of per-partition candidates is
    a SUPERSET of the true heavy hitters whenever
    k + 1 >= threshold_den.

    Pass 2: exact recount of candidates only — broadcast the (tiny,
    ≤ k·partitions rows) candidate set into the fact scan as a semi
    join, one partial-aggregated groupBy over surviving rows, filter
    by the exact global threshold. Result is EXACT and deterministic;
    memory is O(k) per task in pass 1 and O(candidates) thereafter,
    never O(distinct items) — the property that matters when the
    vocabulary itself doesn't fit anywhere.

    Returns (item, cnt, n_total) with cnt > n_total/threshold_den.
    """
    import pandas as pd

    k = mg_counters or 2 * threshold_den
    if k + 1 < threshold_den:
        raise ValueError(
            f"mg_counters={k} too small for threshold 1/{threshold_den}: "
            "the superset guarantee needs k+1 >= threshold_den"
        )

    def mg_partition(batches):
        # Batch-merge form (Agarwal et al., "Mergeable Summaries"):
        # fold each Arrow batch's exact value_counts into the summary,
        # then trim back to ≤ k entries by subtracting the (k+1)-th
        # largest weight from all and dropping non-positives — the
        # merge preserves the n/(k+1) undercount bound, so the
        # superset guarantee holds exactly as for row-at-a-time MG,
        # while the per-row work stays vectorized in C.
        counters: dict = {}
        for pdf in batches:
            for v, c in pdf[col].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                kth = sorted(counters.values(), reverse=True)[k]
                counters = {v: c - kth for v, c in counters.items() if c > kth}
        yield pd.DataFrame({"item": list(counters.keys())})

    vals = df.select(F.col(col).alias(col))
    cands = (
        vals.mapInPandas(mg_partition, schema="item string")
        .distinct()
    )
    tot = vals.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    counted = (
        vals.join(F.broadcast(cands), vals[col] == cands["item"], "inner")
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    return (
        counted.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") * threshold_den > F.col("n_total"))
        .select("item", "cnt", "n_total")
    )
