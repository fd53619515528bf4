"""Wine-pipeline query plan: reference-parity ops with DuckDB oracles.

The reference's real input is the Kaggle wine-reviews dataset, which
isn't available here; FIXTURES.md §2 specifies a wine-shaped fixture
instead. We derive it DETERMINISTICALLY from the driver's `orders`
table using a single set of SQL expressions evaluated by BOTH engines
(Spark via selectExpr, DuckDB via a CTE over the registered `orders`
view), restricted to a dialect subset where the two agree exactly
(CASE, %, repeat, ||, CAST AS STRING/DOUBLE/INT). Every null-rate /
edge case demanded by FIXTURES.md §2 is exercised: junk points,
exact-edge prices (0/20/50/100/500), null countries, 'Portugal'
outside the allowed set, both-null regions, >200-char titles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.operators import wine as wops
from whisky_wine_etl_spark.operators.validate import validation_report
from whisky_wine_etl_spark.plans.registry import query

# One expression set, two engines. Keys are output column names.
WINE_EXPRS: dict[str, str] = {
    "id": "o_orderkey",
    "points": (
        "CASE WHEN o_orderkey % 19 = 0 THEN 'N/A' "
        "WHEN o_orderkey % 23 = 0 THEN NULL "
        "ELSE CAST(45 + o_orderkey % 60 AS STRING) END"
    ),
    "title": (
        "CASE WHEN o_orderkey % 37 = 0 THEN NULL "
        "ELSE repeat('t', CAST(1 + o_orderkey % 250 AS INT)) END"
    ),
    "description": (
        "CASE WHEN o_orderkey % 41 = 0 THEN NULL "
        "ELSE repeat('d', CAST(5 + o_orderkey % 30 AS INT)) END"
    ),
    "taster_name": (
        "CASE WHEN o_orderkey % 6 = 0 THEN NULL "
        "ELSE 'Taster ' || CAST(o_orderkey % 12 AS STRING) END"
    ),
    "taster_twitter_handle": (
        "CASE WHEN o_orderkey % 5 = 0 THEN NULL "
        "ELSE '@h' || CAST(o_orderkey % 7 AS STRING) || '@x' END"
    ),
    "price": (
        "CASE WHEN o_orderkey % 11 = 0 THEN NULL "
        "ELSE CAST((o_orderkey * 13) % 600 AS DOUBLE) END"
    ),
    "designation": (
        "CASE WHEN o_orderkey % 3 = 0 THEN NULL "
        "ELSE 'desig' || CAST(o_orderkey % 5 AS STRING) END"
    ),
    "variety": "'variety' || CAST(o_orderkey % 4 AS STRING)",
    "region_1": (
        "CASE WHEN o_orderkey % 4 = 0 THEN NULL "
        "ELSE 'r1_' || CAST(o_orderkey % 6 AS STRING) END"
    ),
    "region_2": (
        "CASE WHEN o_orderkey % 2 = 0 THEN NULL "
        "ELSE 'r2_' || CAST(o_orderkey % 3 AS STRING) END"
    ),
    "province": (
        "CASE WHEN o_orderkey % 8 = 0 THEN NULL "
        "ELSE 'prov' || CAST(o_orderkey % 5 AS STRING) END"
    ),
    "country": (
        "CASE WHEN o_orderkey % 50 = 0 THEN NULL "
        "WHEN o_orderkey % 9 = 0 THEN 'Portugal' "
        "ELSE CASE o_orderkey % 8 "
        "WHEN 0 THEN 'US' WHEN 1 THEN 'France' WHEN 2 THEN 'Italy' "
        "WHEN 3 THEN 'Spain' WHEN 4 THEN 'Argentina' WHEN 5 THEN 'Chile' "
        "WHEN 6 THEN 'Australia' ELSE 'Germany' END END"
    ),
    "winery": (
        "CASE WHEN o_orderkey % 20 = 0 THEN NULL "
        "ELSE 'winery' || CAST(o_orderkey % 10 AS STRING) END"
    ),
}

WINE_CTE = "WITH wine AS (SELECT {} FROM orders)".format(
    ", ".join(f"{expr} AS {name}" for name, expr in WINE_EXPRS.items())
)


def wine_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.selectExpr(*[f"{expr} AS {name}" for name, expr in WINE_EXPRS.items()])


# --- fixture parity: both engines must derive the identical input ------------


@query("wine_fixture", f"{WINE_CTE} SELECT * FROM wine")
def wine_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wine_input(spark, sf_dir)


# --- T-1 + T-2: null-on-error cast, drop null keys ---------------------------


@query(
    "wine_t1_t2_cast_dropna",
    f"""
{WINE_CTE}
SELECT id, TRY_CAST(points AS DOUBLE) AS points
FROM wine
WHERE TRY_CAST(points AS DOUBLE) IS NOT NULL
""",
)
def wine_t1_t2(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = wops.drop_null_points(wops.clean_points(wine_input(spark, sf_dir)))
    return df.select("id", "points")


# --- T-3 + T-4: fill handle, strip all '@' -----------------------------------


@query(
    "wine_t3_t4_fill_strip",
    f"""
{WINE_CTE}
SELECT id,
       REPLACE(COALESCE(taster_twitter_handle, 'unknown'), '@', '')
         AS taster_twitter_handle
FROM wine
""",
)
def wine_t3_t4(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wops.clean_twitter_handle(wine_input(spark, sf_dir)).select(
        "id", "taster_twitter_handle"
    )


# --- T-5: exact-median imputation --------------------------------------------


@query(
    "wine_t5_median_impute",
    f"""
{WINE_CTE}
SELECT id, COALESCE(price, (SELECT MEDIAN(price) FROM wine)) AS price
FROM wine
""",
)
def wine_t5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wops.impute_price_median(wine_input(spark, sf_dir)).select("id", "price")


# --- T-6: length columns, null→0 ----------------------------------------------


@query(
    "wine_t6_lengths",
    f"""
{WINE_CTE}
SELECT id,
       CAST(CASE WHEN title IS NULL THEN 0 ELSE LENGTH(title) END AS INT)
         AS title_length,
       CAST(CASE WHEN description IS NULL THEN 0 ELSE LENGTH(description) END AS INT)
         AS description_length
FROM wine
""",
)
def wine_t6(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wops.add_length_columns(wine_input(spark, sf_dir)).select(
        "id", "title_length", "description_length"
    )


# --- T-7: right-closed binning -------------------------------------------------

_BIN_CASE = """
CASE WHEN price IS NULL THEN NULL
     WHEN price > 0   AND price <= 20  THEN 'cheap'
     WHEN price > 20  AND price <= 50  THEN 'affordable'
     WHEN price > 50  AND price <= 100 THEN 'midrange'
     WHEN price > 100 AND price <= 500 THEN 'premium'
     WHEN price > 500                  THEN 'luxury'
END
"""


@query(
    "wine_t7_price_bins",
    f"""
{WINE_CTE}
SELECT id, price, {_BIN_CASE} AS price_category
FROM wine
""",
)
def wine_t7(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wops.add_price_category(wine_input(spark, sf_dir)).select(
        "id", "price", "price_category"
    )


# --- T-8 + T-9: coalesce regions -----------------------------------------------


@query(
    "wine_t8_t9_region",
    f"""
{WINE_CTE}
SELECT id, COALESCE(region_1, region_2, 'unknown') AS region
FROM wine
""",
)
def wine_t8_t9(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wops.add_region(wine_input(spark, sf_dir)).select("id", "region")


# --- T-10: lexicographic category codes, null→-1 --------------------------------


@query(
    "wine_t10_country_codes",
    f"""
{WINE_CTE},
codes AS (
  SELECT country AS code_country,
         CAST(ROW_NUMBER() OVER (ORDER BY country) - 1 AS INT) AS country_code
  FROM (SELECT DISTINCT country FROM wine WHERE country IS NOT NULL)
)
SELECT w.id, w.country, COALESCE(c.country_code, -1) AS country_code
FROM wine w LEFT JOIN codes c ON w.country = c.code_country
""",
)
def wine_t10(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wops.add_country_code(wine_input(spark, sf_dir)).select(
        "id", "country", "country_code"
    )


# --- full pipeline (T-1…T-10 chained in reference order) -------------------------

_PIPELINE_SQL = f"""
{WINE_CTE},
w1 AS (
  SELECT id, TRY_CAST(points AS DOUBLE) AS points, title, description,
         taster_name, taster_twitter_handle, price, designation, variety,
         region_1, region_2, province, country, winery
  FROM wine
),
w2 AS (SELECT * FROM w1 WHERE points IS NOT NULL),
med AS (SELECT MEDIAN(price) AS median_price FROM w2),
codes AS (
  SELECT country AS code_country,
         CAST(ROW_NUMBER() OVER (ORDER BY country) - 1 AS INT) AS code
  FROM (SELECT DISTINCT country FROM w2 WHERE country IS NOT NULL)
),
w3 AS (
  SELECT w2.id,
         CAST(w2.points AS INT) AS points,
         w2.title,
         w2.description,
         w2.taster_name,
         REPLACE(COALESCE(w2.taster_twitter_handle, 'unknown'), '@', '')
           AS taster_twitter_handle,
         COALESCE(w2.price, med.median_price) AS price,
         COALESCE(w2.designation, 'unknown') AS designation,
         w2.variety, w2.region_1, w2.region_2, w2.province, w2.country,
         COALESCE(w2.winery, 'unknown') AS winery,
         CAST(CASE WHEN w2.title IS NULL THEN 0 ELSE LENGTH(w2.title) END AS INT)
           AS title_length,
         CAST(CASE WHEN w2.description IS NULL THEN 0 ELSE LENGTH(w2.description) END AS INT)
           AS description_length,
         COALESCE(w2.region_1, w2.region_2, 'unknown') AS region
  FROM w2 CROSS JOIN med
)
SELECT w3.*,
       {_BIN_CASE.replace("price", "w3.price")} AS price_category,
       COALESCE(c.code, -1) AS country_code
FROM w3 LEFT JOIN codes c ON w3.country = c.code_country
"""

_PIPELINE_COLS = [
    "id",
    "points",
    "title",
    "description",
    "taster_name",
    "taster_twitter_handle",
    "price",
    "designation",
    "variety",
    "region_1",
    "region_2",
    "province",
    "country",
    "winery",
    "title_length",
    "description_length",
    "region",
    "price_category",
    "country_code",
]


@query("wine_pipeline", _PIPELINE_SQL)
def wine_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wops.wine_transform(wine_input(spark, sf_dir)).select(*_PIPELINE_COLS)


# --- V-1: pandera-parity validation report ---------------------------------------


@query(
    "wine_v1_validation_report",
    f"""
WITH pipe AS ({_PIPELINE_SQL})
SELECT
  CAST(SUM(CASE WHEN points IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS points_null,
  CAST(SUM(CASE WHEN points IS NOT NULL AND (points < 50 OR points > 100) THEN 1 ELSE 0 END) AS BIGINT) AS points_out_of_range,
  CAST(SUM(CASE WHEN title IS NOT NULL AND (LENGTH(title) < 3 OR LENGTH(title) > 200) THEN 1 ELSE 0 END) AS BIGINT) AS title_bad_length,
  CAST(SUM(CASE WHEN description IS NOT NULL AND LENGTH(description) < 10 THEN 1 ELSE 0 END) AS BIGINT) AS description_too_short,
  CAST(SUM(CASE WHEN price IS NOT NULL AND price < 0 THEN 1 ELSE 0 END) AS BIGINT) AS price_negative,
  CAST(SUM(CASE WHEN country IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS country_null,
  CAST(SUM(CASE WHEN country IS NOT NULL AND country NOT IN ('US','France','Italy','Spain','Argentina','Chile','Australia','Germany') THEN 1 ELSE 0 END) AS BIGINT) AS country_not_allowed,
  CAST(SUM(CASE WHEN title_length < 0 THEN 1 ELSE 0 END) AS BIGINT) AS title_length_negative,
  CAST(SUM(CASE WHEN description_length < 0 THEN 1 ELSE 0 END) AS BIGINT) AS description_length_negative,
  CAST(SUM(CASE WHEN price_category IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS price_category_null,
  CAST(SUM(CASE WHEN region IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS region_null,
  CAST(SUM(CASE WHEN country_code IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS country_code_null
FROM pipe
""",
)
def wine_v1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return validation_report(wops.wine_transform(wine_input(spark, sf_dir)))
