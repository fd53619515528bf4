"""Vector math over array<float> embedding columns — pure built-ins.

All expressions stay JVM-side (zip_with/aggregate fold inside
whole-stage codegen); no Python UDF crosses the hot path. Elements are
cast to double BEFORE multiplication so accumulation is double-precise
and matches the DuckDB oracle's unnest+SUM formulation to ~1e-15.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(a: Column) -> Column:
    return a.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
