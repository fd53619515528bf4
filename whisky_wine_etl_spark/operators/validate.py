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
    Built lazily: Column construction needs an active SparkContext."""
    c = F.col
    return [
        # points: Int, in_range(50, 100), nullable=False (ref :106-111)
        ("points_null", _viol(c("points").isNull())),
        ("points_out_of_range", _viol(c("points").isNotNull() & ~c("points").between(50, 100))),
        # title: str_length(3, 200), nullable=True (ref :112-117)
        ("title_bad_length", _viol(c("title").isNotNull() & ~F.length("title").between(3, 200))),
        # description: str_length(min=10), nullable=True (ref :118-122)
        ("description_too_short", _viol(c("description").isNotNull() & (F.length("description") < 10))),
        # price: ge(0), nullable=True (ref :130-135)
        ("price_negative", _viol(c("price").isNotNull() & (c("price") < 0))),
        # country: isin(8 countries), nullable=False (ref :141-145)
        ("country_null", _viol(c("country").isNull())),
        ("country_not_allowed", _viol(c("country").isNotNull() & ~c("country").isin(ALLOWED_COUNTRIES))),
        # derived columns: ge(0) / nullable=False (ref :147-151)
        ("title_length_negative", _viol(c("title_length") < 0)),
        ("description_length_negative", _viol(c("description_length") < 0)),
        ("price_category_null", _viol(c("price_category").isNull())),
        ("region_null", _viol(c("region").isNull())),
        ("country_code_null", _viol(c("country_code").isNull())),
    ]


def validation_report(df: DataFrame) -> DataFrame:
    """Violation counts for every pandera check in the reference schema.

    Input: the transformed wine DataFrame (post wine_transform).
    Output: a single row of counters, 0 = check passed everywhere.
    """
    return df.agg(*[expr.alias(name) for name, expr in validation_checks()])
