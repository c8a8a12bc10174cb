"""Canonical StructTypes for every table in the engine.

The reference keeps schemas implicit (pandas-inferred feather files with
ad-hoc required-column checks, Project_Scripts/08_sqlite_setup.py:79-81,
106-111).  Here every table has one explicit contract.

``PAGES_SCHEMA`` is the mandated input shape from BASELINE.json input_hint:
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string).
Reference metadata columns from stage 02 (Project_Scripts/
02_extract_newscrawl.py:27-33) ride along as optional extras where needed.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# S1/input — Common-Crawl-style web pages (input_hint shape).
PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

# Extended raw-record shape mirroring stage 02's projection
# (Project_Scripts/02_extract_newscrawl.py:27-33): ID, URL, Date,
# Content-Length, MIME-Type, Content.
WARC_RECORDS_SCHEMA = StructType(
    [
        StructField("id", StringType()),  # WARC-Record-ID "<urn:uuid:...>"
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("content_length", LongType()),
        StructField("mime_type", StringType()),
        StructField("content", BinaryType()),
    ]
)

# S2 — extracted articles (Project_Scripts/03_extract_text.py:64-75).
ARTICLES_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("text", StringType()),
        StructField("url", StringType()),
        StructField("excerpt", StringType()),
        StructField("date", StringType()),
        StructField("tags", StringType()),
        StructField("categories", StringType()),
        StructField("title", StringType()),
        StructField("date_crawled", StringType()),
        StructField("hostname", StringType()),
    ]
)

# S3 — quality metrics appended (Project_Scripts/04_compute_quality_metrics.py:31-39).
QUALITY_METRICS_SCHEMA = StructType(
    [
        StructField("fraction_ellipsis", DoubleType()),
        StructField("fraction_non_alpha_words", DoubleType()),
        StructField("mean_word_length", DoubleType()),
        StructField("javascript_count", LongType()),
        StructField("words_per_line", DoubleType()),
        StructField("bullet_point_starts", LongType()),
        StructField("sentences_count", LongType()),
        StructField("word_count", LongType()),
    ]
)

# Frontier scheduler state (new table; semantics from the reference's
# filesystem-as-state behaviors, Project_Scripts/01_download_newscrawl.py:88-96).
FRONTIER_SCHEMA = StructType(
    [
        StructField("url", StringType()),  # canonicalized
        StructField("url_hash", LongType()),  # murmur3 via F.hash(canonical url)
        StructField("host", StringType()),
        StructField("status", StringType()),  # pending / fetched / failed
        StructField("priority", DoubleType()),
        StructField("wave", IntegerType()),
        StructField("attempts", IntegerType()),
        StructField("discovered_ts", TimestampType()),
    ]
)

SEEDS_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("priority", DoubleType()),
        StructField("discovered_ts", TimestampType()),
    ]
)

# robots.txt gating dimension (north_rule requirement; absent in the reference).
ROBOTS_RULES_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("path_prefix", StringType()),
        StructField("allowed", BooleanType()),
        StructField("crawl_delay_s", DoubleType()),
    ]
)

# TLD exclusion dimension (tlds_exclusion.xlsx, Project_Scripts/03_extract_text.py:99).
TLD_EXCLUSIONS_SCHEMA = StructType([StructField("country_code", StringType())])

# Geomap dimension — output of stage 07 (Project_Scripts/07_geocode_news.py:142-185).
GEOMAP_SCHEMA = StructType(
    [
        StructField("loc_normal", StringType()),
        StructField("count", LongType()),
        StructField("latitude", DoubleType()),
        StructField("longitude", DoubleType()),
        StructField("NUTS", StringType()),
        StructField("GEN", StringType()),
    ]
)

# Deterministic geocoder stub (replaces Nominatim, 07_geocode_news.py:146-176).
GAZETTEER_SCHEMA = StructType(
    [
        StructField("loc_normal", StringType()),
        StructField("latitude", DoubleType()),
        StructField("longitude", DoubleType()),
    ]
)

# NUTS polygon stub: axis-aligned rectangles instead of real geometries
# (07_geocode_news.py:82-97 point-in-polygon, populate_nuts.py:34-67).
NUTS_REGIONS_SCHEMA = StructType(
    [
        StructField("NUTS_ID", StringType()),
        StructField("LEVL_CODE", IntegerType()),
        StructField("NUTS_NAME", StringType()),
        StructField("min_lon", DoubleType()),
        StructField("min_lat", DoubleType()),
        StructField("max_lon", DoubleType()),
        StructField("max_lat", DoubleType()),
    ]
)

# S8 — embeddings (Project_Scripts/09_embedding_transformation.py:23-27).
EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("embeddings", ArrayType(FloatType())),
        StructField("int8_embeddings", ArrayType(IntegerType())),
        StructField("binary_embeddings", ArrayType(IntegerType())),
    ]
)
