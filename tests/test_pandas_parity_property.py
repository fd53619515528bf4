"""Hypothesis extension of test_pandas_parity: the wine T-1..T-10
chain must match LITERAL pandas (the reference's own engine,
wine_etl_kaggle.py:73-90) on adversarial generated frames — nasty
numerics in `points`, bin-edge and all-null `price` columns, unicode
and '@'-riddled strings, null-heavy categoricals. Any mismatch here
is a real Part-A fidelity bug, not a flaky test."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_pandas_parity import _reference_pandas
from whisky_wine_etl_spark.operators import wine as wops

_POINTS = st.sampled_from(
    ["91", "87.5", " 88 ", "-3", "102", "N/A", "", "abc", "1e2", None, "0", "55"]
)
_TEXT = st.sampled_from(
    [None, "", "x", "word word", "@handle@x", "üñïçødé", "@", "a" * 40, "tt"]
)
_PRICE = st.sampled_from(
    [None, 0.0, -5.0, 0.01, 19.99, 20.0, 50.0, 100.0, 500.0, 500.01, 750.25, 3.5]
)
_COUNTRY = st.sampled_from(
    [None, "US", "France", "Italy", "Ürüguay", "chile", "Chile", "DE", ""]
)


@st.composite
def wine_frames(draw):
    n = draw(st.integers(min_value=1, max_value=10))
    return pd.DataFrame(
        {
            "id": range(n),
            "points": [draw(_POINTS) for _ in range(n)],
            "title": [draw(_TEXT) for _ in range(n)],
            "description": [draw(_TEXT) for _ in range(n)],
            "taster_twitter_handle": [draw(_TEXT) for _ in range(n)],
            "price": [draw(_PRICE) for _ in range(n)],
            "designation": [draw(_TEXT) for _ in range(n)],
            "winery": [draw(_TEXT) for _ in range(n)],
            "region_1": [draw(_TEXT) for _ in range(n)],
            "region_2": [draw(_TEXT) for _ in range(n)],
            "country": [draw(_COUNTRY) for _ in range(n)],
        }
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(pdf=wine_frames())
def test_wine_chain_matches_pandas_on_adversarial_frames(spark, pdf):
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
        assert g["points"] == e["points"], ("points", e["id"])
        assert g["taster_twitter_handle"] == e["taster_twitter_handle"], e["id"]
        if pd.isna(e["price"]):
            assert g["price"] is None, ("price", e["id"])
        else:
            assert g["price"] == e["price"], ("price", e["id"])
        assert g["designation"] == e["designation"], e["id"]
        assert g["winery"] == e["winery"], e["id"]
        assert g["title_length"] == e["title_length"], e["id"]
        assert g["description_length"] == e["description_length"], e["id"]
        cat = e["price_category"]
        assert g["price_category"] == (None if pd.isna(cat) else str(cat)), (
            "price_category",
            e["id"],
        )
        assert g["region"] == e["region"], e["id"]
        assert g["country_code"] == e["country_code"], ("country_code", e["id"])
