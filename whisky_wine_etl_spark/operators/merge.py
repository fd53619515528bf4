"""Merge / upsert / slowly-changing-dimension operators.

The reference's load stage is a blind JDBC append
(dags/wine_etl_kaggle.py:170-202 — `if_exists='append'`), which at any
real scale immediately raises the questions it never answers: what
happens when a key re-arrives (upsert) and how history is kept (SCD).
These operators answer both Spark-first.

Scale posture (100 TB): both operators are single-shuffle joins on the
business key. The dimension side of a merge is usually orders of
magnitude smaller than the fact side — broadcast when it fits,
otherwise a sort-merge join on the key is the right plan and AQE picks
it. No driver-side loops, no per-row Python: everything is
`join` + `coalesce` / `union`, fully codegen-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    reject_null_updates: bool = False,
) -> DataFrame:
    """SCD Type-1 merge: source rows win on key collision, target rows
    survive when no update arrived, brand-new source keys are inserted.

    Equivalent to `MERGE INTO ... WHEN MATCHED UPDATE WHEN NOT MATCHED
    INSERT` over every non-key column. Implemented as ONE full-outer
    join on the key with per-column `coalesce(source, target)` — a
    single shuffle, no table rewrite machinery needed.

    Note the null caveat: `coalesce` cannot represent "update a column
    TO null" — a source row that legitimately nulls a value keeps the
    stale target value. For tables where that matters, carry an
    explicit presence flag, or pass reject_null_updates=True (strict
    mode): any matched source row with a null in a value column whose
    target value is non-null fails the job loudly instead of silently
    keeping stale data. The reference's pipeline (nulls already imputed
    upstream, T-3/T-5) never needs either.
    """
    value_cols = [c for c in target.columns if c not in keys]
    if set(target.columns) != set(source.columns):
        raise ValueError("upsert requires identical target/source schemas")
    # Alias-qualified F.col references (not DataFrame[col]) so a source
    # derived from the target itself (self-merge) resolves unambiguously.
    # Literal presence flags — NOT key nullness — detect a matched row:
    # the join uses eqNullSafe, so a row can match through a NULL key,
    # where both sides' keys[0] are null and a nullness test would
    # silently bypass the strict guard. A flag is null exactly when the
    # full-outer join left that side unmatched.
    t = target.withColumn("__t_present", F.lit(True)).alias("__t")
    s = source.withColumn("__s_present", F.lit(True)).alias("__s")
    cond = [F.col(f"__t.{k}").eqNullSafe(F.col(f"__s.{k}")) for k in keys]
    joined = t.join(s, cond, "full_outer")

    def merged(c: str) -> F.Column:
        out = F.coalesce(F.col(f"__s.{c}"), F.col(f"__t.{c}"))
        if reject_null_updates:
            # the guard lives INSIDE the output expression (a separate
            # assert column would be pruned away unevaluated): a matched
            # row where the source nulls a non-null target value raises
            # on first occurrence, in the same shuffle — no extra pass
            matched = (
                F.col("__s.__s_present").isNotNull() & F.col("__t.__t_present").isNotNull()
            )
            bad = matched & F.col(f"__s.{c}").isNull() & F.col(f"__t.{c}").isNotNull()
            out = F.when(
                bad,
                F.raise_error(
                    F.lit(
                        f"upsert strict mode: source nulls column {c!r} for an "
                        "existing key — coalesce would silently keep the stale "
                        "target value"
                    )
                ),
            ).otherwise(out)
        return out.alias(c)

    return joined.select(
        *[F.coalesce(F.col(f"__s.{k}"), F.col(f"__t.{k}")).alias(k) for k in keys],
        *[merged(c) for c in value_cols],
    )


def scd2_apply(
    dim: DataFrame,
    snapshot: DataFrame,
    keys: list[str],
    tracked: list[str],
    effective_date: str,
) -> DataFrame:
    """SCD Type-2 merge: close changed rows, open new versions, keep
    history immutable.

    `dim` carries `valid_from`/`valid_to` (null valid_to = current
    row); `snapshot` is the new full state of the dimension keyed by
    `keys` with the `tracked` attribute columns. Produces the updated
    dimension:

    - historical rows (valid_to not null): passed through untouched
    - current rows whose tracked values match the snapshot: untouched
    - current rows that changed: emitted CLOSED (valid_to=effective)
      AND a fresh open row with the snapshot values
    - keys new to the dimension: opened at effective_date

    One join dim⋈snapshot on the key decides changed/unchanged/new;
    the output is a union of three projections of that single joined
    relation, so Spark runs it as one shuffle + three narrow maps.
    Deletes (key absent from snapshot) close the current row too.
    """
    eff = F.lit(effective_date).cast("date")
    hist = dim.filter(F.col("valid_to").isNotNull())
    cur = dim.filter(F.col("valid_to").isNull()).withColumn("__in_cur", F.lit(True)).alias("c")
    snap = snapshot.withColumn("__in_snap", F.lit(True)).alias("n")

    j = cur.join(snap, on=keys, how="full_outer")
    in_cur = F.col("c.__in_cur").isNotNull()
    in_snap = F.col("n.__in_snap").isNotNull()
    changed = in_cur & (
        ~in_snap  # deleted key → close, no reopen
        | ~F.struct(*[F.col("c." + t) for t in tracked]).eqNullSafe(
            F.struct(*[F.col("n." + t) for t in tracked])
        )
    )

    untouched = j.filter(in_cur & ~changed).select(
        *keys,
        *[F.col("c." + t).alias(t) for t in tracked],
        F.col("c.valid_from").alias("valid_from"),
        F.col("c.valid_to").alias("valid_to"),
    )
    closed = j.filter(changed).select(
        *keys,
        *[F.col("c." + t).alias(t) for t in tracked],
        F.col("c.valid_from").alias("valid_from"),
        eff.alias("valid_to"),
    )
    opened = j.filter(in_snap & (~in_cur | changed)).select(
        *keys,
        *[F.col("n." + t).alias(t) for t in tracked],
        eff.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    return hist.unionByName(untouched).unionByName(closed).unionByName(opened)
