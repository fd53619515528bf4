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


def validation_report(df: DataFrame) -> DataFrame:
    """Violation counts for every pandera check in the reference schema.

    Input: the transformed wine DataFrame (post wine_transform).
    Output: a single row of counters, 0 = check passed everywhere.
    """
    c = F.col
    return df.agg(
        # points: Int, in_range(50, 100), nullable=False (ref :106-111)
        _viol(c("points").isNull()).alias("points_null"),
        _viol(c("points").isNotNull() & ~c("points").between(50, 100)).alias(
            "points_out_of_range"
        ),
        # title: str_length(3, 200), nullable=True (ref :112-117)
        _viol(
            c("title").isNotNull() & ~F.length("title").between(3, 200)
        ).alias("title_bad_length"),
        # description: str_length(min=10), nullable=True (ref :118-122)
        _viol(c("description").isNotNull() & (F.length("description") < 10)).alias(
            "description_too_short"
        ),
        # price: ge(0), nullable=True (ref :130-135)
        _viol(c("price").isNotNull() & (c("price") < 0)).alias("price_negative"),
        # country: isin(8 countries), nullable=False (ref :141-145)
        _viol(c("country").isNull()).alias("country_null"),
        _viol(c("country").isNotNull() & ~c("country").isin(ALLOWED_COUNTRIES)).alias(
            "country_not_allowed"
        ),
        # derived columns: ge(0) / nullable=False (ref :147-151)
        _viol(c("title_length") < 0).alias("title_length_negative"),
        _viol(c("description_length") < 0).alias("description_length_negative"),
        _viol(c("price_category").isNull()).alias("price_category_null"),
        _viol(c("region").isNull()).alias("region_null"),
        _viol(c("country_code").isNull()).alias("country_code_null"),
    )
