"""Star-schema build + upsert semantics (reference stage 08).

Reference: SQLite DDL 08_sqlite_setup.py:35-72 —
Articles / Locations / Article_Locations / Article_Vectors, loaded with
INSERT OR REPLACE / INSERT OR IGNORE (08:140-153).

Spark mapping: each table is a DataFrame plan; upserts are expressed with
``merge_upsert`` (latest-wins window) — on an Iceberg catalog the same
call sites become `MERGE INTO ... WHEN MATCHED UPDATE / WHEN NOT MATCHED
INSERT` (OR REPLACE) and `WHEN NOT MATCHED INSERT` only (OR IGNORE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from commoncrawlnewsdataset_spark.functions.hashes import hashed_id_sql, location_id_udf
from commoncrawlnewsdataset_spark.functions.normalize import normalize_loc_sqlite
from commoncrawlnewsdataset_spark.functions.urls import strip_uuid


def build_locations(geomap: DataFrame) -> DataFrame:
    """Locations dim: geomap + location_id = sha1(loc_normal) % 1e8
    (08_sqlite_setup.py:82; bit-exact pandas UDF)."""
    return geomap.select(
        location_id_udf(F.col("loc_normal")).alias("location_id"),
        "loc_normal", "latitude", "longitude", "NUTS", "GEN",
    )


def build_articles(ner_df: DataFrame) -> DataFrame:
    """Articles fact: uuid stripped (X6), the 10 reference columns
    (08_sqlite_setup.py:124-129)."""
    return ner_df.select(
        strip_uuid(F.col("id")).alias("id"),
        "url", "excerpt", "title", "text", "tags", "categories",
        "hostname", "date", "date_crawled",
    )


def build_article_locations(ner_df: DataFrame, locations: DataFrame) -> DataFrame:
    """M:N bridge: X10b re-normalization then broadcast inner join —
    replaces the reference's dict lookup that silently drops non-matches
    (08_sqlite_setup.py:131-133; inner-join semantics preserved).  Also
    mirrors its falsy-check quirk: location_id 0 would be dropped there;
    sha1 % 1e8 == 0 is ~1e-8 so we keep pure join semantics and note the
    divergence."""
    normed = ner_df.select(
        strip_uuid(F.col("id")).alias("article_id"),
        normalize_loc_sqlite(F.coalesce(F.col("loc_normal"), F.lit(""))).alias("loc_normal"),
    )
    dim = F.broadcast(locations.select("location_id", "loc_normal"))
    return normed.join(dim, "loc_normal", "inner").select("article_id", "location_id").distinct()


def build_article_vectors(ner_df: DataFrame) -> DataFrame:
    """id <-> 63-bit hashed id (X7, 08_sqlite_setup.py:135-137) — pure-SQL
    sha256 fold, bit-exact with the reference's Python bigint mod."""
    sid = strip_uuid(F.col("id"))
    return ner_df.select(sid.alias("id"), hashed_id_sql(sid).alias("hashed_id")).distinct()


def merge_upsert(
    existing: DataFrame, updates: DataFrame, key_cols: list[str], replace: bool = True
) -> DataFrame:
    """INSERT OR REPLACE (replace=True) / INSERT OR IGNORE (replace=False)
    as a latest-wins window over the union.  `_src` ranks updates above
    existing for REPLACE and below for IGNORE; one shuffle on the key."""
    e = existing.withColumn("_src", F.lit(0 if replace else 1))
    u = updates.withColumn("_src", F.lit(1 if replace else 0))
    w = Window.partitionBy(*key_cols).orderBy(F.desc("_src"))
    return (
        e.unionByName(u)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
