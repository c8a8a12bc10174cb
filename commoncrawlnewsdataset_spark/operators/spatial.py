"""Spatial operators: point-in-region join, best-match selection, NUTS prefixes.

Reference: 07_geocode_news.py:82-97 (shapely point-in-polygon, best = max
LEVL_CODE) and populate_nuts.py:34-67 (NUTS0..3 prefix slices, coalesce).

The region dimension here is the rectangle stub from FIXTURES.md §7 (no
geo libs in this container), so containment is pure column arithmetic —
a broadcast range-join.  With real polygons the same plan holds with a
shapely pandas UDF replacing the BETWEEN predicate (the geomap is tiny after
the count>100 gate, so it is always the broadcast side)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def point_in_region_join(points: DataFrame, regions: DataFrame) -> DataFrame:
    """X15: broadcast theta-join on rectangle containment, keep the max
    LEVL_CODE match per point (row_number over desc level, deterministic
    NUTS_ID tiebreak — ref sort_values('LEVL_CODE', ascending=False).iloc[0])."""
    joined = points.join(
        F.broadcast(regions),
        (F.col("longitude") >= F.col("min_lon"))
        & (F.col("longitude") <= F.col("max_lon"))
        & (F.col("latitude") >= F.col("min_lat"))
        & (F.col("latitude") <= F.col("max_lat")),
        "left",
    )
    w = Window.partitionBy("loc_normal").orderBy(F.desc("LEVL_CODE"), F.col("NUTS_ID"))
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "min_lon", "min_lat", "max_lon", "max_lat", "LEVL_CODE")
        .withColumnRenamed("NUTS_ID", "NUTS")
        .withColumnRenamed("NUTS_NAME", "GEN")
    )


def with_nuts_prefixes(df: DataFrame, nuts_col: str = "NUTS") -> DataFrame:
    """populate_nuts.py:56-63: NUTS0..3 = id[:2], id[:3], id[:4], id[:5]."""
    c = F.col(nuts_col)
    return (
        df.withColumn("NUTS0", F.substring(c, 1, 2))
        .withColumn("NUTS1", F.substring(c, 1, 3))
        .withColumn("NUTS2", F.substring(c, 1, 4))
        .withColumn("NUTS3", F.substring(c, 1, 5))
    )


def coalesce_nuts(df: DataFrame) -> DataFrame:
    """X16 (populate_nuts.py:84-87): NUTS = coalesce(NUTS3, NUTS2)."""
    return df.withColumn("NUTS", F.coalesce(F.col("NUTS3"), F.col("NUTS2")))
