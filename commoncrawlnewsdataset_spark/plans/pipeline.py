"""The full reference pipeline (stages 03→08) as one lazy DataFrame graph.

Reference execution: one bash-orchestrated python process per stage with
Feather files between them (process_all_months.sh:124-196).  Here every stage
is a transformation on the previous stage's DataFrame, so Catalyst fuses
F2→X4→P2→D1 into single stages and the only materialization points are the
sinks the caller chooses.

Hand-placed operator orderings that are SEMANTIC and must be preserved
(SURVEY §4): the TLD anti-join runs before the extraction UDF
(03_extract_text.py:45-53 — Catalyst will not reorder around an opaque
Python UDF, so code order is the contract), and the count>100 gate runs
before geocoding (07_geocode_news.py:142-163 — it changes geomap contents,
not just cost)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from commoncrawlnewsdataset_spark.functions.extract import extract_articles
from commoncrawlnewsdataset_spark.functions.textmetrics import with_quality_metrics
from commoncrawlnewsdataset_spark.functions.urls import extract_top_level_domain
from commoncrawlnewsdataset_spark.functions.normalize import normalize_loc_geocode
from commoncrawlnewsdataset_spark.ner import with_ner
from commoncrawlnewsdataset_spark.operators.filters import (
    anti_join_tld_exclusions,
    filter_quality,
)
from commoncrawlnewsdataset_spark.operators.spatial import point_in_region_join
from commoncrawlnewsdataset_spark.plans.star import (
    build_article_locations,
    build_article_vectors,
    build_articles,
    build_locations,
)


@dataclass
class PipelineResult:
    articles_extracted: DataFrame  # S2 (post 03)
    articles_scored: DataFrame     # S3 (post 04)
    articles_filtered: DataFrame   # S4 (post 05)
    articles_ner: DataFrame        # S5 (post 06)
    geomap: DataFrame              # S6 (post 07)
    articles: DataFrame            # star schema (08)
    locations: DataFrame
    article_locations: DataFrame
    article_vectors: DataFrame


def build_geomap(
    ner_df: DataFrame,
    gazetteer: DataFrame,
    nuts_regions: DataFrame,
    min_count: int = 100,
) -> DataFrame:
    """Stage 07: explode locs (E1) → X10 normalize → F5 empty drop →
    A1+F6 count>min gate → gazetteer broadcast join (X14 stub for Nominatim)
    → NUTS containment join (X15) keeping max LEVL_CODE."""
    exploded = ner_df.select(F.explode("loc").alias("loc"))
    normed = exploded.select(normalize_loc_geocode(F.col("loc")).alias("loc_normal"))
    counted = (
        normed.filter(F.col("loc_normal") != "")
        .groupBy("loc_normal")
        .count()
        .filter(F.col("count") > min_count)
    )
    geocoded = counted.join(F.broadcast(gazetteer), "loc_normal", "left")
    return point_in_region_join(geocoded, nuts_regions).select(
        "loc_normal", "count", "latitude", "longitude", "NUTS", "GEN"
    )


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    tld_exclusions: DataFrame,
    gazetteer: DataFrame,
    nuts_regions: DataFrame,
    geomap_min_count: int = 100,
) -> PipelineResult:
    """pages (input_hint shape) -> every stage of the reference as lazy plans."""
    with_tld = pages.withColumn("tld", extract_top_level_domain(F.col("url")))
    gated = anti_join_tld_exclusions(with_tld, tld_exclusions)  # F2 BEFORE X4
    extracted = extract_articles(gated).withColumn(
        "id", F.concat(F.lit("<urn:uuid:"), F.md5("url"), F.lit(">"))
    )
    scored = with_quality_metrics(extracted)
    filtered = filter_quality(scored)
    ner_df = with_ner(filtered)

    geomap = build_geomap(ner_df, gazetteer, nuts_regions, geomap_min_count)
    locations = build_locations(geomap)
    return PipelineResult(
        articles_extracted=extracted,
        articles_scored=scored,
        articles_filtered=filtered,
        articles_ner=ner_df,
        geomap=geomap,
        articles=build_articles(ner_df),
        locations=locations,
        article_locations=build_article_locations(ner_df, locations),
        article_vectors=build_article_vectors(ner_df),
    )
