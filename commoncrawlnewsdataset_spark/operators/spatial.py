"""Spatial operators: point-in-region join, best-match selection, NUTS prefixes.

Reference: 07_geocode_news.py:82-97 (shapely point-in-polygon, best = max
LEVL_CODE) and populate_nuts.py:34-67 (NUTS0..3 prefix slices, coalesce).

Two containment predicates, same broadcast-join plan:

- real POLYGONS (``ring_x``/``ring_y`` vertex-array columns): ray-casting
  crossing count as pure Column arithmetic (F.aggregate over the edge list)
  — fully JVM-side, no shapely, no Python UDF, works on non-convex rings.
  A bounding-box pre-filter short-circuits the edge walk for far-away points.
- RECTANGLES (``min_lon``.. columns, the FIXTURES.md §7 fast path for tests):
  plain BETWEEN predicates.

The geomap side is tiny after the count>100 gate, so it is always the
broadcast side; the containment predicate never forces a shuffle."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def point_in_polygon(px: Column, py: Column, xs: Column, ys: Column) -> Column:
    """Ray-casting containment (even-odd rule) as a single JVM-side fold over
    the polygon's edges — the from-scratch equivalent of shapely's
    ``polygon.contains(point)`` used by the reference (07_geocode_news.py:89).

    xs/ys are the ring's vertex arrays (closing vertex optional — the fold
    wraps edge n->1).  Boundary points follow the crossing parity (half-open
    edges), the standard even-odd convention."""
    n = F.size(xs)

    def _crossed(acc: Column, i: Column) -> Column:
        j = F.when(i == 1, n).otherwise(i - 1)
        xi, yi = F.element_at(xs, i), F.element_at(ys, i)
        xj, yj = F.element_at(xs, j), F.element_at(ys, j)
        # when() guards the division: yi != yj whenever the edge straddles py
        # (and under ANSI mode an eager x/0 would throw, not NULL)
        crosses = F.when(
            (yi > py) != (yj > py),
            px < (xj - xi) * (py - yi) / (yj - yi) + xi,
        ).otherwise(F.lit(False))
        return acc + F.when(crosses, 1).otherwise(0)

    crossings = F.aggregate(F.sequence(F.lit(1), n), F.lit(0), _crossed)
    return crossings % 2 == 1


def point_in_region_join(points: DataFrame, regions: DataFrame) -> DataFrame:
    """X15: broadcast theta-join on containment, keep the max LEVL_CODE match
    per point (row_number over desc level, deterministic NUTS_ID tiebreak —
    ref sort_values('LEVL_CODE', ascending=False).iloc[0]).

    Polygon dims (ring_x/ring_y columns) get ray-casting containment with a
    bbox pre-filter; rectangle dims keep the BETWEEN fast path."""
    bbox = (
        (F.col("longitude") >= F.col("min_lon"))
        & (F.col("longitude") <= F.col("max_lon"))
        & (F.col("latitude") >= F.col("min_lat"))
        & (F.col("latitude") <= F.col("max_lat"))
    )
    if "ring_x" in regions.columns:
        dim = regions
        if "min_lon" not in regions.columns:
            dim = (
                regions.withColumn("min_lon", F.array_min("ring_x"))
                .withColumn("max_lon", F.array_max("ring_x"))
                .withColumn("min_lat", F.array_min("ring_y"))
                .withColumn("max_lat", F.array_max("ring_y"))
            )
        # The edge-walk fold cannot live in the join CONDITION (Catalyst
        # can't bind a lambda referencing both sides there); instead the join
        # matches on the cheap bbox and the ray cast runs as a post-join
        # projection that NULLs out non-contained matches — the max-LEVL
        # window then treats them exactly like bbox misses.
        joined = points.join(F.broadcast(dim), bbox, "left")
        inside = F.col("ring_x").isNotNull() & point_in_polygon(
            F.col("longitude"), F.col("latitude"), F.col("ring_x"), F.col("ring_y")
        )
        joined = joined.select(
            *[F.col(c) for c in points.columns],
            *[
                F.when(inside, F.col(c)).alias(c)
                for c in ("NUTS_ID", "NUTS_NAME", "LEVL_CODE")
            ],
        )
    else:
        joined = points.join(F.broadcast(regions), bbox, "left")
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
