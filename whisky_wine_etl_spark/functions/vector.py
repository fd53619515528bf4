"""Vector math over array<float> embedding columns — pure built-ins.

All expressions stay JVM-side (zip_with/aggregate fold inside
whole-stage codegen); no Python UDF crosses the hot path. Elements are
cast to double BEFORE multiplication so accumulation is double-precise
and matches the DuckDB oracle's unnest+SUM formulation to ~1e-15.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def cosine_pandas_udf():
    """Arrow-vectorized cosine as a @pandas_udf — the alternative path
    when an expression genuinely can't stay JVM-side (here it can; this
    exists to pin the Arrow batch shape and prove numeric parity with
    the built-in formulation — the same DuckDB oracle checks both).
    NumPy evaluates per Arrow batch (~10k rows), never per row."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        am = np.stack(a.to_numpy()).astype(np.float64)
        bm = np.stack(b.to_numpy()).astype(np.float64)
        num = (am * bm).sum(axis=1)
        den = np.sqrt((am * am).sum(axis=1)) * np.sqrt((bm * bm).sum(axis=1))
        return pd.Series(num / den)

    return cos

def centroid_pandas_udf():
    """Grouped-aggregation pandas UDF (the Spark UDAF surface):
    element-wise mean of an embedding column per group, one Arrow
    batch per group. Sums run in float64 sequentially over rows (axis
    0), matching the oracle's per-dimension AVG to well under the 6-dp
    rounding the caller applies. This is the UDAF carve-out companion
    to cosine_pandas_udf's scalar form."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def centroid(v: pd.Series) -> list:
        x = np.stack(v.to_numpy()).astype(np.float64)
        return [float(t) for t in x.mean(axis=0)]

    return centroid
