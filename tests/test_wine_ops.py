"""Pandas-parity spot checks for the reference wine transforms —
the exact semantic edges SURVEY.md §2 pins (right-closed bins, exact
median interpolation, cat.codes ordering, len(str(x)) nulls)."""

from __future__ import annotations

import pandas as pd

from whisky_wine_etl_spark.operators import wine as wops


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_price_bins_right_closed(spark):
    # pd.cut(bins=[0,20,50,100,500,inf]) edges: (0,20],(20,50],...
    rows = [(0.0,), (0.01,), (20.0,), (20.01,), (50.0,), (100.0,), (500.0,), (500.01,), (None,)]
    out = wops.add_price_category(_df(spark, rows, "price double")).collect()
    got = [r.price_category for r in out]
    assert got == [None, "cheap", "cheap", "affordable", "affordable",
                   "midrange", "premium", "luxury", None]
    # cross-check against pandas itself
    import numpy as np
    prices = pd.Series([r[0] for r in rows], dtype="float64")
    expect = pd.cut(prices, bins=[0, 20, 50, 100, 500, np.inf],
                    labels=wops.PRICE_LABELS).astype(object)
    assert [None if pd.isna(e) else e for e in expect] == got


def test_median_interpolates_even_count(spark):
    # pandas median of [1, 2, 10, None] = 2.0; of [1, 2, 10, 20] = 6.0
    df = _df(spark, [(1.0,), (2.0,), (10.0,), (20.0,), (None,)], "price double")
    out = wops.impute_price_median(df).filter("price IS NOT NULL").collect()
    imputed = sorted(r.price for r in out)
    pd_median = pd.Series([1.0, 2.0, 10.0, 20.0, None]).median()
    assert pd_median in imputed
    assert imputed.count(pd_median) == 1  # exactly the null row got it


def test_country_codes_lexicographic_null_minus_one(spark):
    df = _df(spark, [("US",), ("France",), (None,), ("France",), ("Argentina",)],
             "country string")
    out = {r.country: r.country_code for r in wops.add_country_code(df).collect()}
    # pandas: sorted distinct = [Argentina, France, US] -> 0,1,2; null -> -1
    pd_codes = pd.Series(["US", "France", None, "France", "Argentina"]).astype("category").cat.codes
    assert out == {"Argentina": 0, "France": 1, "US": 2, None: -1}
    assert sorted(pd_codes.unique()) == [-1, 0, 1, 2]


def test_length_of_null_is_zero(spark):
    df = _df(spark, [("abc", None), (None, "hello world")], "title string, description string")
    out = wops.add_length_columns(df).collect()
    assert [(r.title_length, r.description_length) for r in out] == [(3, 0), (0, 11)]


def test_strip_all_at_signs_after_fill(spark):
    df = _df(spark, [("@user@x",), (None,)], "taster_twitter_handle string")
    out = [r.taster_twitter_handle for r in wops.clean_twitter_handle(df).collect()]
    assert out == ["userx", "unknown"]


def test_try_cast_junk_to_null(spark):
    df = _df(spark, [("88",), ("N/A",), ("",), (None,), ("91.5",)], "points string")
    out = [r.points for r in wops.clean_points(df).collect()]
    assert out == [88.0, None, None, None, 91.5]


def test_failure_cases_rows_match_report_counts(spark):
    """The per-row failure frame must reconcile exactly with the
    aggregate report: per-check row counts equal the counters, and
    every row carries the offending value (NULL only for nullability
    checks)."""
    from pyspark.sql import functions as F

    from whisky_wine_etl_spark.operators.validate import failure_cases, validation_report
    from whisky_wine_etl_spark.plans.wine import wine_input

    sf = "/root/testdata/sf0.001"
    transformed = wops.wine_transform(wine_input(spark, sf))
    report = validation_report(transformed).collect()[0].asDict()
    fc = failure_cases(transformed)
    by_check = {r.check_name: r.cnt for r in
                fc.groupBy("check_name").count().withColumnRenamed("count", "cnt").collect()}
    for name, n in report.items():
        assert by_check.get(name, 0) == n, name
    # null failure_case only on *_null checks
    bad = fc.filter(
        F.col("failure_case").isNull() & ~F.col("check_name").endswith("_null")
    ).count()
    assert bad == 0
