"""Reference-parity against REAL pandas: the reference's transform
semantics (dags/wine_etl_kaggle.py:73-90) executed by pandas itself on
a shared fixture, compared cell-for-cell with the Spark operators.
This pins the semantic edges SURVEY.md §2 calls out: to_numeric
coerce, median interpolation, right-closed pd.cut bins, len(str(x))
null handling, combine_first, and cat.codes lexicographic null→-1."""

from __future__ import annotations

import numpy as np
import pandas as pd

from whisky_wine_etl_spark.operators import wine as wops


def _fixture_pdf() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "id": range(12),
            "points": ["91", "N/A", "87", None, "102", "55", "88", "90", "61", "73", "95", "80"],
            "title": ["t" * 5, None, "ok", "x", "t" * 250, "abc", None, "ttt", "q", "w", "e", "r"],
            "description": ["d" * 20, "x", "short", None, "d" * 12, "dd", "ddd", None, "a", "b", "c", "d"],
            "taster_twitter_handle": ["@a@b", None, "@x", "plain", None, "@@", "@z", None, "@m", None, "@n", "@o"],
            "price": [25.0, 10.0, None, 0.0, 700.0, 20.0, 50.0, None, 100.0, 500.0, 501.0, None],
            "designation": [None, "d1", None, "d2", None, "d3", None, "d4", None, "d5", None, "d6"],
            "winery": ["w1", None, "w2", None, "w3", None, "w4", None, "w5", None, "w6", None],
            "region_1": ["r1", None, None, "r4", None, "r6", None, "r8", None, "r10", None, "r12"],
            "region_2": [None, "s2", None, "s4", "s5", None, "s7", None, "s9", None, "s11", None],
            "country": ["US", "France", None, "Italy", "Portugal", "US", None, "Chile", "Spain", "US", "Argentina", "Germany"],
        }
    )


def _reference_pandas(df: pd.DataFrame) -> pd.DataFrame:
    """The reference's exact pandas steps (cited per line in SURVEY §2)."""
    df = df.copy()
    df["points"] = pd.to_numeric(df["points"], errors="coerce")          # T-1 (:73)
    df = df.dropna(subset=["points"])                                     # T-2 (:74)
    df["taster_twitter_handle"] = (
        df["taster_twitter_handle"].fillna("unknown").str.replace("@", "", regex=False)
    )                                                                     # T-3/T-4 (:75-76)
    df["price"] = df["price"].fillna(df["price"].median())                # T-5 (:77)
    df["designation"] = df["designation"].fillna("unknown")               # T-3 (:78)
    df["winery"] = df["winery"].fillna("unknown")                         # T-3 (:79)
    df["title_length"] = df["title"].apply(lambda x: len(str(x)) if pd.notnull(x) else 0)
    df["description_length"] = df["description"].apply(
        lambda x: len(str(x)) if pd.notnull(x) else 0
    )                                                                     # T-6 (:81-82)
    df["price_category"] = pd.cut(
        df["price"],
        bins=[0, 20, 50, 100, 500, np.inf],
        labels=["cheap", "affordable", "midrange", "premium", "luxury"],
    )                                                                     # T-7 (:84-86)
    df["region"] = df["region_1"].combine_first(df["region_2"]).fillna("unknown")  # T-8/9 (:88-89)
    df["country_code"] = df["country"].astype("category").cat.codes       # T-10 (:90)
    df["points"] = df["points"].astype(int)                               # pandera coerce (:107,:154)
    return df


def test_spark_transform_matches_reference_pandas(spark):
    pdf = _fixture_pdf()
    expected = _reference_pandas(pdf)

    sdf = spark.createDataFrame(
        pdf.astype(object).where(pd.notnull(pdf), None),
        "id long, points string, title string, description string,"
        " taster_twitter_handle string, price double, designation string,"
        " winery string, region_1 string, region_2 string, country string",
    )
    got = {r["id"]: r for r in wops.wine_transform(sdf).collect()}

    assert set(got) == set(expected["id"])
    for _, e in expected.iterrows():
        g = got[e["id"]]
        assert g["points"] == e["points"], e["id"]
        assert g["taster_twitter_handle"] == e["taster_twitter_handle"], e["id"]
        assert g["price"] == e["price"], e["id"]
        assert g["designation"] == e["designation"], e["id"]
        assert g["winery"] == e["winery"], e["id"]
        assert g["title_length"] == e["title_length"], e["id"]
        assert g["description_length"] == e["description_length"], e["id"]
        cat = e["price_category"]
        assert g["price_category"] == (None if pd.isna(cat) else str(cat)), e["id"]
        assert g["region"] == e["region"], e["id"]
        assert g["country_code"] == e["country_code"], e["id"]


def test_price_bin_edges_match_pd_cut(spark):
    """Exact edge prices land in the pandas (right-closed) bins, and
    price ≤ 0 gets a null category exactly as pd.cut does."""
    prices = [0.0, 0.01, 20.0, 20.01, 50.0, 100.0, 500.0, 500.01, -5.0]
    pdf = pd.DataFrame({"id": range(len(prices)), "price": prices})
    expected = pd.cut(
        pdf["price"],
        bins=[0, 20, 50, 100, 500, np.inf],
        labels=["cheap", "affordable", "midrange", "premium", "luxury"],
    )
    sdf = spark.createDataFrame(pdf, "id long, price double")
    got = {r["id"]: r["price_category"] for r in wops.add_price_category(sdf).collect()}
    for i, cat in enumerate(expected):
        assert got[i] == (None if pd.isna(cat) else str(cat)), prices[i]
