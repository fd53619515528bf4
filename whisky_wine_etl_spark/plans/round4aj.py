"""Round-4aj: geospatial radius join by grid-cell equi-join — the
implemented form of the scale path geo_haversine_nearest's docstring
names.

Registered AFTER round4ai so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query

_R_KM = 200.0
_CELL_DEG = 4  # 4° ≥ 222 km at |lat| ≤ 60 → ±1 neighbor is COMPLETE
_LON_CELLS = 90  # 360 / 4


def _hav_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return (
        f"ROUND(2.0 * 6371.0 * asin(sqrt("
        f"pow(sin(radians({lat1} - {lat2}) / 2), 2)"
        f" + cos(radians({lat2})) * cos(radians({lat1}))"
        f" * pow(sin(radians({lon1} - {lon2}) / 2), 2))), 3)"
    )


@query(
    "geo_grid_radius_join",
    f"""
WITH st AS (
  SELECT s_suppkey AS station_id,
         CAST((s_suppkey * 41) % 840 AS DOUBLE) / 7 - 60.0 AS slat,
         CAST((s_suppkey * 97) % 2520 AS DOUBLE) / 7 - 180.0 AS slon
  FROM supplier
),
cu AS (
  SELECT c_custkey,
         CAST((c_custkey * 13) % 840 AS DOUBLE) / 7 - 60.0 AS clat,
         CAST((c_custkey * 29) % 2520 AS DOUBLE) / 7 - 180.0 AS clon
  FROM customer
)
SELECT c_custkey, station_id,
       {_hav_sql('slat', 'slon', 'clat', 'clon')} AS dist_km
FROM cu CROSS JOIN st
WHERE {_hav_sql('slat', 'slon', 'clat', 'clon')} <= {_R_KM}
""",
)
def geo_grid_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All (customer, station) pairs within 200 km — via a grid-cell
    EQUI-join, not the oracle's cross join.

    Cells are 4°×4°. With |lat| ≤ 60 (the derived 1/7-degree-lattice range),
    a 4° lon cell spans ≥ 222 km > R, so candidates within R always
    sit in the same or an adjacent cell — each station explodes into
    its 3×3 neighborhood (9 rows, lon wrapped mod 90 so antimeridian
    pairs are not lost) and candidates come from ONE hash equi-join
    on (latcell, loncell). The exact rounded haversine then filters.
    Completeness is proven by the O(n·m) oracle on every run. At
    100 TB both sides shuffle once on the cell key and candidate
    volume is density-bounded — the cross join is gone."""
    st = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("station_id"),
        ((((F.col("s_suppkey") * 41) % 840) / 7.0) - 60.0).alias("slat"),
        ((((F.col("s_suppkey") * 97) % 2520) / 7.0) - 180.0).alias("slon"),
    )
    cu = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((((F.col("c_custkey") * 13) % 840) / 7.0) - 60.0).alias("clat"),
        ((((F.col("c_custkey") * 29) % 2520) / 7.0) - 180.0).alias("clon"),
    )

    def latcell(c):
        return F.floor((c + 60.0) / _CELL_DEG).cast("int")

    def loncell(c):
        return F.floor((c + 180.0) / _CELL_DEG).cast("int")

    offsets = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    st_cells = st.select(
        "station_id",
        "slat",
        "slon",
        F.explode(
            F.array(
                *[
                    F.struct(
                        (latcell(F.col("slat")) + dy).alias("ly"),
                        (
                            (loncell(F.col("slon")) + dx + _LON_CELLS) % _LON_CELLS
                        ).alias("lx"),
                    )
                    for dy, dx in offsets
                ]
            )
        ).alias("cell"),
    ).select("station_id", "slat", "slon", "cell.ly", "cell.lx")
    cu_cells = cu.select(
        "c_custkey",
        "clat",
        "clon",
        latcell(F.col("clat")).alias("ly"),
        loncell(F.col("clon")).alias("lx"),
    )
    hav = F.round(
        2.0
        * 6371.0
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(F.col("slat") - F.col("clat")) / 2), 2)
                + F.cos(F.radians("clat"))
                * F.cos(F.radians("slat"))
                * F.pow(F.sin(F.radians(F.col("slon") - F.col("clon")) / 2), 2)
            )
        ),
        3,
    )
    return (
        cu_cells.join(st_cells, ["ly", "lx"])
        .withColumn("dist_km", hav)
        .filter(F.col("dist_km") <= _R_KM)
        .select("c_custkey", "station_id", "dist_km")
    )
