"""EP-1 end-to-end: the reference's whole wine DAG as ONE lazy plan.

Reference lifecycle (SURVEY.md §3): five Airflow tasks crossing a
process boundary each, with a CSV materialization between every pair
(extract → transform → validate → load → cleanup,
dags/wine_etl_kaggle.py:226-244). Here the same dataflow is a single
Spark job: JSON scan → T-1…T-10 projection chain → validation
aggregates piggybacked via ``df.observe`` (no second scan) → sinks.
Catalyst fuses the transform chain into one whole-stage-codegen'd
scan→project→filter pipeline; the three file round-trips and the
row-at-a-time INSERT loop disappear structurally.

Validation mirrors the reference's non-fatal contract
(wine_etl_kaggle.py:100 'Data will fail validations, but we will load
into DB anyway'): violations are REPORTED, never block the load.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession

from whisky_wine_etl_spark.operators.validate import validation_checks
from whisky_wine_etl_spark.operators.wine import wine_transform
from whisky_wine_etl_spark.sources import io as sio

WINE_INPUT_SCHEMA = (
    "points string, title string, description string, taster_name string,"
    " taster_twitter_handle string, price double, designation string,"
    " variety string, region_1 string, region_2 string, province string,"
    " country string, winery string"
)


@dataclass
class WineEtlResult:
    transformed: DataFrame
    validation: dict[str, int] = field(default_factory=dict)


def run_wine_etl(
    spark: SparkSession,
    json_path: str,
    csv_out: str | None = None,
    jdbc_url: str | None = None,
    jdbc_table: str = "wine_data",
    jdbc_driver: str | None = None,
    jdbc_column_types: dict[str, str] | None = None,
    multi_line: bool = True,
) -> WineEtlResult:
    """Extract → transform → validate → load, one action per sink.

    The validation counters ride on the sink action via ``observe`` —
    a zero-extra-pass replacement for the reference's re-read-and-
    validate task."""
    raw = sio.read_json(spark, json_path, schema=WINE_INPUT_SCHEMA, multi_line=multi_line)
    transformed = wine_transform(raw)

    obs = Observation("wine_validation")
    observed = transformed.observe(
        obs, *[expr.alias(name) for name, expr in validation_checks()]
    )

    if csv_out is not None:
        sio.write_csv(observed, csv_out)
    if jdbc_url is not None:
        sio.write_jdbc_append(
            observed if csv_out is None else transformed,
            jdbc_url,
            jdbc_table,
            driver=jdbc_driver,
            column_types=(
                jdbc_column_types if jdbc_column_types is not None
                else sio.WINE_JDBC_COLUMN_TYPES
            ),
        )
    if csv_out is None and jdbc_url is None:
        # no sink requested: still run the validation pass (noop sink
        # executes the plan without materializing anything)
        observed.write.format("noop").mode("overwrite").save()

    return WineEtlResult(transformed=transformed, validation=dict(obs.get))
