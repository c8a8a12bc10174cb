"""Seed discovery from sitemap XML (S1 extension).

CC-NEWS-style crawls bootstrap their frontier from news sitemaps; the
reference consumes Common Crawl's pre-built seed lists instead
(01_download_newscrawl.py), so this is the production-side completion of
S1: sitemap bodies arrive through the same fetch machinery as pages
(WaveRunner page sink), and this module turns them into seed rows for
``WaveRunner.load_seeds`` / the URL-seen gate.

Everything is column expressions (regexp over the XML subset sitemaps
actually use — ``<url><loc/><lastmod/></url>`` blocks): no XML library, no
Python in the row path, and the parse is cross-engine checkable (the
``sitemap_seeds`` oracle query value-checks a synthesize→parse round trip
against ground truth computed relationally)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sitemap_seed_urls(
    sitemaps: DataFrame,
    default_priority: float = 0.5,
    body_col: str = "body",
    host_col: str = "host",
) -> DataFrame:
    """(host, body) sitemap XMLs -> (host, url, priority, discovered_ts).

    ``discovered_ts`` comes from ``<lastmod>`` when present (news crawlers
    prioritize fresh urls), else NULL for the caller to default.  Entries
    without a ``<loc>`` are dropped.  One explode per <url> block; all
    string work stays in codegen."""
    blocks = F.regexp_extract_all(
        F.col(body_col), F.lit(r"(?s)<url>(.*?)</url>"), 1
    )
    exploded = sitemaps.select(
        F.col(host_col).alias("host"), F.explode(blocks).alias("b")
    )
    loc = F.regexp_extract(F.col("b"), r"(?s)<loc>\s*([^<]+?)\s*</loc>", 1)
    lastmod = F.regexp_extract(F.col("b"), r"(?s)<lastmod>\s*([^<]+?)\s*</lastmod>", 1)
    return (
        exploded.select(
            "host",
            loc.alias("url"),
            F.lit(float(default_priority)).alias("priority"),
            # try_to_timestamp, not to_timestamp: ANSI raises on a malformed
            # <lastmod> and one garbage date in one sitemap would kill the
            # whole seed-ingest job — NULL lets the caller default instead
            F.try_to_timestamp(F.nullif(lastmod, F.lit(""))).alias("discovered_ts"),
        )
        .filter(F.col("url") != "")
    )
