"""Reference-parity wine transforms (SURVEY.md §2 Part A, T-1…T-10).

Each function reproduces one pandas operation from the reference's
`process_data` task (reference: dags/wine_etl_kaggle.py:73-90) with
the exact semantics pinned in SURVEY.md §2:

- T-1  to_numeric(errors='coerce')  → try_cast (null on junk)
- T-2  dropna(subset=['points'])    → isNotNull filter
- T-3  fillna('unknown') ×3         → coalesce with literal
- T-4  str.replace('@','')          → replace ALL occurrences
- T-5  price.fillna(price.median()) → exact median (interpolated for
       even n, nulls skipped), computed AFTER the T-2 drop, broadcast
       back via a 1-row crossJoin (plan stays re-runnable; no collect)
- T-6  len(str(x)) if notnull else 0 → when/length, no Python UDF
- T-7  pd.cut right-closed bins (0,20],(20,50],(50,100],(100,500],(500,∞)
       — price ≤ 0 or null → null category (NOT ml.Bucketizer, which
       is left-closed)
- T-8/9 combine_first + fillna      → coalesce(region_1, region_2, 'unknown')
- T-10 astype('category').cat.codes → lexicographic sorted-distinct
       rank - 1, null → -1 (NOT StringIndexer, which is frequency-
       ordered and null-hostile)

Scale notes: the whole chain is one narrow projection + filter — no
shuffle except T-5's 1-row global aggregate and T-10's tiny distinct,
both of which broadcast back. At 100 TB the chain stays a single
scan→project pipeline under whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

ALLOWED_COUNTRIES = [
    "US",
    "France",
    "Italy",
    "Spain",
    "Argentina",
    "Chile",
    "Australia",
    "Germany",
]

PRICE_BINS = [0.0, 20.0, 50.0, 100.0, 500.0]
PRICE_LABELS = ["cheap", "affordable", "midrange", "premium", "luxury"]


# --- T-1: cast with null-on-error (ref :73) ---------------------------------
def clean_points(df: DataFrame) -> DataFrame:
    return df.withColumn("points", F.col("points").try_cast("double"))


# --- T-2: drop rows with null key (ref :74) ---------------------------------
def drop_null_points(df: DataFrame) -> DataFrame:
    return df.na.drop(subset=["points"])


# --- T-3 + T-4: fill handle then strip ALL '@' (ref :75-76, order matters) --
def clean_twitter_handle(df: DataFrame) -> DataFrame:
    filled = F.coalesce(F.col("taster_twitter_handle"), F.lit("unknown"))
    return df.withColumn("taster_twitter_handle", F.replace(filled, F.lit("@"), F.lit("")))


# --- T-5: median imputation (ref :77) ----------------------------------------
def impute_price_median(df: DataFrame) -> DataFrame:
    # exact interpolated median, nulls skipped — matches pandas
    # Series.median(); percentile_approx would NOT be parity.
    med = df.agg(F.median("price").alias("_median_price"))
    return (
        df.crossJoin(F.broadcast(med))
        .withColumn("price", F.coalesce(F.col("price"), F.col("_median_price")))
        .drop("_median_price")
    )


# --- T-3: fill designation / winery (ref :78-79) -----------------------------
def fill_designation_winery(df: DataFrame) -> DataFrame:
    return df.na.fill({"designation": "unknown", "winery": "unknown"})


# --- T-6: length columns, null → 0 (ref :81-82) ------------------------------
def add_length_columns(df: DataFrame) -> DataFrame:
    def safe_len(c: str):
        return (
            F.when(F.col(c).isNull(), F.lit(0))
            .otherwise(F.length(F.col(c).cast("string")))
            .cast("int")
        )

    return df.withColumn("title_length", safe_len("title")).withColumn(
        "description_length", safe_len("description")
    )


# --- T-7: right-closed binning (ref :84-86) -----------------------------------
def add_price_category(df: DataFrame, price_col: str = "price") -> DataFrame:
    p = F.col(price_col)
    expr = F.when(p.isNull(), F.lit(None).cast("string"))
    lo = PRICE_BINS[0]
    for hi, label in zip(PRICE_BINS[1:], PRICE_LABELS[:-1]):
        expr = expr.when((p > lo) & (p <= hi), F.lit(label))
        lo = hi
    expr = expr.when(p > PRICE_BINS[-1], F.lit(PRICE_LABELS[-1]))
    # price ≤ 0 falls through every branch → null, matching pd.cut's
    # left-open first bin.
    return df.withColumn("price_category", expr)


# --- T-8 + T-9: coalesce regions then fill (ref :88-89) -----------------------
def add_region(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "region", F.coalesce(F.col("region_1"), F.col("region_2"), F.lit("unknown"))
    )


# --- T-10: pandas cat.codes parity (ref :90) ----------------------------------
def add_country_code(df: DataFrame, col: str = "country") -> DataFrame:
    # codes = rank of the value in the LEXICOGRAPHICALLY sorted
    # distinct set, null → -1. The distinct set is tiny (dictionary),
    # so the single-partition row_number and the broadcast join-back
    # are fine at any fact-table scale.
    codes = (
        df.select(F.col(col).alias("_cc_key"))
        .filter(F.col("_cc_key").isNotNull())
        .distinct()
        .withColumn(
            "country_code", (F.row_number().over(W.orderBy("_cc_key")) - 1).cast("int")
        )
    )
    return (
        df.join(F.broadcast(codes), df[col] == codes._cc_key, "left")
        .withColumn("country_code", F.coalesce(F.col("country_code"), F.lit(-1)).cast("int"))
        .drop("_cc_key")
    )


def wine_transform(df: DataFrame) -> DataFrame:
    """The full T-1…T-10 chain in reference order (ref :73-90), ending
    with the pandera-driven int coercion of points (ref :107, :154)."""
    df = clean_points(df)
    df = drop_null_points(df)
    df = clean_twitter_handle(df)
    df = impute_price_median(df)
    df = fill_designation_winery(df)
    df = add_length_columns(df)
    df = add_price_category(df)
    df = add_region(df)
    df = add_country_code(df)
    return df.withColumn("points", F.col("points").cast("int"))
