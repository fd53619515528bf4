"""Declarative validation-as-a-report (SURVEY.md §2 V-1).

Reproduces the reference's pandera DataFrameSchema checks
(reference: dags/wine_etl_kaggle.py:104-155) as ONE aggregate pass
producing violation counts — non-fatal, mirroring the reference's
"validate but load anyway" policy (ref :100, :160-163).

pandera parity notes:
- checks on nullable columns skip nulls (pandera ignore_na=True
  default) → violation predicates require IS NOT NULL;
- `nullable=False` columns get an explicit null-count check;
- one scan, all checks as conditional sums — at 100 TB this is a
  single map-side-combinable aggregate, not one scan per check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whisky_wine_etl_spark.operators.wine import ALLOWED_COUNTRIES


def _viol(cond) -> F.Column:
    return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")


def validation_checks() -> list[tuple[str, F.Column]]:
    """(name, aggregate-Column) pairs — consumable by .agg() for a
    standalone report or by .observe() to piggyback on a sink action.
    Built lazily: Column construction needs an active SparkContext.
    Derived from row_checks() so the aggregate report and the per-row
    failure frame can never disagree on a predicate."""
    return [(name, _viol(cond)) for name, _col, cond in row_checks()]


def validation_report(df: DataFrame) -> DataFrame:
    """Violation counts for every pandera check in the reference schema.

    Input: the transformed wine DataFrame (post wine_transform).
    Output: a single row of counters, 0 = check passed everywhere.
    """
    return df.agg(*[expr.alias(name) for name, expr in validation_checks()])


def row_checks() -> list[tuple[str, str, F.Column]]:
    """(check_name, column_name, row-level violation predicate) for
    every pandera check in the reference schema (reference
    dags/wine_etl_kaggle.py:104-155: points in_range(50,100)
    nullable=False :106-111, title str_length(3,200) :112-117,
    description str_length(min=10) :118-122, price ge(0) :130-135,
    country isin(8) nullable=False :141-145, derived ge(0)/non-null
    :147-151). Nullable columns' checks skip nulls (pandera
    ignore_na=True default) via IS NOT NULL in the predicate."""
    c = F.col
    return [
        ("points_null", "points", c("points").isNull()),
        ("points_out_of_range", "points", c("points").isNotNull() & ~c("points").between(50, 100)),
        ("title_bad_length", "title", c("title").isNotNull() & ~F.length("title").between(3, 200)),
        ("description_too_short", "description", c("description").isNotNull() & (F.length("description") < 10)),
        ("price_negative", "price", c("price").isNotNull() & (c("price") < 0)),
        ("country_null", "country", c("country").isNull()),
        ("country_not_allowed", "country", c("country").isNotNull() & ~c("country").isin(ALLOWED_COUNTRIES)),
        ("title_length_negative", "title_length", c("title_length") < 0),
        ("description_length_negative", "description_length", c("description_length") < 0),
        ("price_category_null", "price_category", c("price_category").isNull()),
        ("region_null", "region", c("region").isNull()),
        ("country_code_null", "country_code", c("country_code").isNull()),
    ]


def row_failures(
    df: DataFrame,
    checks: list[tuple[str, str, F.Column]],
    id_col: str,
) -> DataFrame:
    """Generic per-row violation frame: for every (check_name,
    column_name, predicate), emit one row per offending input row with
    the offending value rendered as a string.

    Shape: ONE narrow pass — every check is evaluated into an array of
    optional structs per row, nulls filtered out, and the survivors
    exploded. No shuffle at all: at 100 TB this is a map-only scan
    whose output is proportional to violations, not rows × checks."""
    entries = [
        F.when(
            cond,
            F.struct(
                F.lit(col_name).alias("column_name"),
                F.lit(check_name).alias("check_name"),
                F.col(col_name).cast("string").alias("failure_case"),
            ),
        )
        for check_name, col_name, cond in checks
    ]
    return (
        df.select(
            F.col(id_col).alias("row_id"),
            F.explode(
                F.filter(F.array(*entries), lambda x: x.isNotNull())
            ).alias("__v"),
        )
        .select(
            "row_id",
            F.col("__v.column_name").alias("column_name"),
            F.col("__v.check_name").alias("check_name"),
            F.col("__v.failure_case").alias("failure_case"),
        )
    )


def failure_cases(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Per-row pandera-style `failure_cases` frame (reference
    dags/wine_etl_kaggle.py:162: the schema error's frame with one row
    per offending (row, check), carrying the offending value) — the
    row-level detail validation_report's aggregate counters drop.

    Output: (row_id, column_name, check_name, failure_case) with
    failure_case the offending value rendered as a string (NULL for
    nullability checks, exactly as pandera reports them)."""
    return row_failures(df, row_checks(), id_col)
