"""GeoJSON region source — pure JSON parsing, no geo libraries.

The reference loads NUTS regions from GeoJSON via geopandas/shapely
(07_geocode_news.py:76-80) only to (a) read polygons and (b) test point
containment.  (a) is plain JSON — ``from_json`` with an explicit schema —
and (b) is ``operators.spatial.point_in_polygon`` (ray casting as JVM
column math), so the whole path runs without shapely:

GeoJSON FeatureCollection -> one row per polygon RING with ``ring_x`` /
``ring_y`` vertex arrays -> broadcast dim for ``point_in_region_join``
(a point is in a MultiPolygon iff it is in one of its outer rings; the
max-LEVL window already dedups multi-ring matches per point).

Holes (interior rings) are not modeled — NUTS regions at the levels the
reference uses are hole-free; a hole-aware variant subtracts interior-ring
containment with the same fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Polygon coordinates: [ring][vertex][xy]; MultiPolygon: [poly][ring][vertex][xy]
_FEATURE_SCHEMA = """
    array<struct<
        properties: struct<NUTS_ID: string, NUTS_NAME: string, LEVL_CODE: int>,
        geometry: struct<
            type: string,
            coordinates: string
        >
    >>
"""


def read_geojson_regions(spark: SparkSession, path: str) -> DataFrame:
    """(NUTS_ID, NUTS_NAME, LEVL_CODE, ring_x, ring_y) — one row per OUTER
    ring of every Polygon/MultiPolygon feature."""
    raw = spark.read.text(path, wholetext=True)
    # geometry.coordinates has type-dependent nesting, so it is kept as a
    # raw JSON string first and re-parsed per geometry type
    feats = raw.select(
        F.explode(
            F.from_json(
                F.get_json_object("value", "$.features"), _FEATURE_SCHEMA
            )
        ).alias("f")
    ).select(
        F.col("f.properties.NUTS_ID").alias("NUTS_ID"),
        F.col("f.properties.NUTS_NAME").alias("NUTS_NAME"),
        F.col("f.properties.LEVL_CODE").alias("LEVL_CODE"),
        F.col("f.geometry.type").alias("gtype"),
        F.col("f.geometry.coordinates").alias("coords"),
    )
    poly = feats.filter(F.col("gtype") == "Polygon").withColumn(
        "ring",
        F.element_at(F.from_json("coords", "array<array<array<double>>>"), 1),
    )
    multi = feats.filter(F.col("gtype") == "MultiPolygon").withColumn(
        "ring",
        F.explode(
            F.transform(
                F.from_json("coords", "array<array<array<array<double>>>>"),
                lambda p: F.element_at(p, 1),  # outer ring of each polygon
            )
        ),
    )
    rings = poly.unionByName(multi)
    return rings.select(
        "NUTS_ID",
        "NUTS_NAME",
        "LEVL_CODE",
        F.transform("ring", lambda v: F.element_at(v, 1)).alias("ring_x"),
        F.transform("ring", lambda v: F.element_at(v, 2)).alias("ring_y"),
    )
