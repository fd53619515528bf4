"""whisky_wine_etl_spark — a PySpark-native analytics engine.

Re-expresses every data operation of the reference ETL pipeline
(RaGe359/whisky-wine-etl, surveyed in SURVEY.md) as Spark-first
DataFrame plans, plus the full relational / streaming / LLM-data-
pipeline operator surface the reference delegates to external engines.

Layout:
  session.py     SparkSession factory (AQE on, UTC, Arrow)
  catalog.py     testdata parquet loaders + temp-view registration
  operators/     reference-parity wine ops, validation, dedup,
                 similarity, text analysis, multimodal plumbing
  functions/     reusable column expressions (vector math, json, text)
  plans/         the query suite: registry of (spark_fn, oracle_sql)
  sources/       readers/writers (csv, json, jdbc, parquet)
  streaming/     Structured Streaming pipelines + batch twins
"""

__version__ = "0.1.0"
