"""The reference's ad-hoc analytics (ner_content.py, populate_nuts.py tails)
re-expressed as declarative plans over the pipeline outputs.

- TLD distribution head(15)            (ner_content.py:30-32, A2)
- hostname -> top-3 locations          (ner_content.py:36-53, A7/O5)
- ambiguous locations (> 2 TLDs)       (ner_content.py:56-73, F8)
- NUTS3 top-10                         (populate_nuts.py:120-123, A2)

The reference builds nested Counter dicts in driver memory; these are one
hash-aggregate + (where needed) one window each — the same answers with no
driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from commoncrawlnewsdataset_spark.functions.normalize import normalize_loc_geocode
from commoncrawlnewsdataset_spark.functions.urls import extract_tld_two_level
from commoncrawlnewsdataset_spark.operators.topk import group_topk, value_counts_topk


def tld_distribution(ner_df: DataFrame, k: int = 15) -> DataFrame:
    """A2: articles per (two-level-aware) TLD, head(k)."""
    return value_counts_topk(
        ner_df.select(extract_tld_two_level(F.col("hostname")).alias("tld")), "tld", k
    )


def _exploded_locs(ner_df: DataFrame) -> DataFrame:
    """E1 + X10 over the NER output (ner_content.py:42,62 uses the geocode
    normalization variant)."""
    return (
        ner_df.select("hostname", F.explode("loc").alias("loc_raw"))
        .select("hostname", normalize_loc_geocode(F.col("loc_raw")).alias("loc"))
        .filter(F.col("loc") != "")
    )


def top_locations_per_hostname(ner_df: DataFrame, k: int = 3) -> DataFrame:
    """A7/O5: Counter.most_common(3) per hostname (ner_content.py:36-53) —
    one agg + one window, deterministic tie-break on loc."""
    counts = _exploded_locs(ner_df).groupBy("hostname", "loc").agg(
        F.count("*").alias("n")
    )
    return group_topk(counts, ["hostname"], "n", k, "loc")


def ambiguous_locations(ner_df: DataFrame, min_tlds: int = 2) -> DataFrame:
    """F8: locations mentioned on more than `min_tlds` distinct TLDs
    (ner_content.py:56-73)."""
    locs = _exploded_locs(ner_df).withColumn(
        "tld", extract_tld_two_level(F.col("hostname"))
    )
    return (
        locs.groupBy("loc")
        .agg(F.countDistinct("tld").alias("n_tlds"), F.count("*").alias("mentions"))
        .filter(F.col("n_tlds") > min_tlds)
    )


def nuts3_top10(geomap: DataFrame) -> DataFrame:
    """A2 over the geomap: top-10 NUTS3 regions by located mentions
    (populate_nuts.py:120-123)."""
    return (
        geomap.filter(F.col("NUTS").isNotNull() & (F.length("NUTS") == 5))
        .groupBy("NUTS", "GEN")
        .agg(F.sum("count").alias("mentions"))
        .orderBy(F.desc("mentions"), "NUTS")
        .limit(10)
    )
