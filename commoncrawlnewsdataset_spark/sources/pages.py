"""The `pages` table: WARC ingestion + month-partitioned storage.

Reference: stage 02 parses WARC shards with warcio into per-file feathers
(02_extract_newscrawl.py:18-60) and *deletes* the WARC afterwards (02:58-60).
Here:

- ``read_warc`` — `binaryFile` scan + mapInPandas warcio parse (S4).  warcio
  is not installed in this container, so the parser is gated behind an
  import-try; the plumbing (schema, batching, response-only filter F1) is
  real and the fallback raises a clear error.
- ``write_pages`` / ``read_pages`` — parquet partitioned by month(warc_ts)
  + bucketed-by-host layout hint, mirroring the reference's YYYY-MM dirs
  (01_download_newscrawl.py:41-43).  Month partition pruning makes
  `WHERE warc_ts >= ...` skip whole directories; in production the same
  writer targets an Iceberg table with `months(warc_ts)` partition transform.
- nothing is ever deleted (S6 divergence: snapshot lineage replaces
  destructive consume).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from commoncrawlnewsdataset_spark.schemas import WARC_RECORDS_SCHEMA

try:  # pragma: no cover - not installed in the sandbox
    from warcio.archiveiterator import ArchiveIterator  # type: ignore

    HAVE_WARCIO = True
except ImportError:
    ArchiveIterator = None
    HAVE_WARCIO = False


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """S4 WARC record scan: one task per WARC shard, response records only
    (F1, 02_extract_newscrawl.py:26), header projection P1 (02:27-33)."""
    if not HAVE_WARCIO:
        raise ImportError(
            "warcio is required for WARC ingestion; install it or ingest "
            "pre-parsed pages parquet (sources.pages.read_pages)."
        )
    binaries = spark.read.format("binaryFile").load(path_glob)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip
        import io

        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                stream = io.BytesIO(content)
                wrapped = gzip.open(stream) if content[:2] == b"\x1f\x8b" else stream
                for rec in ArchiveIterator(wrapped):
                    if rec.rec_type != "response":
                        continue
                    rows.append(
                        {
                            "id": rec.rec_headers.get_header("WARC-Record-ID"),
                            "url": rec.rec_headers.get_header("WARC-Target-URI"),
                            "warc_ts": pd.to_datetime(
                                rec.rec_headers.get_header("WARC-Date")
                            ).tz_localize(None),
                            "content_length": int(
                                rec.rec_headers.get_header("Content-Length") or 0
                            ),
                            "mime_type": rec.http_headers.get_header("Content-Type")
                            if rec.http_headers
                            else None,
                            "content": rec.content_stream().read(),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in WARC_RECORDS_SCHEMA.fields])

    return binaries.select("content").mapInPandas(parse, WARC_RECORDS_SCHEMA)


def warc_records_to_pages(records: DataFrame) -> DataFrame:
    """P1 projection to the input_hint pages shape; html := raw payload."""
    return records.select(
        "url",
        "warc_ts",
        F.col("content").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def write_pages(pages: DataFrame, path: str, mode: str = "append") -> None:
    """Month-partitioned pages sink (partition pruning on warc_ts filters)."""
    (
        pages.withColumn("month", F.date_format("warc_ts", "yyyy-MM"))
        .repartition("month")
        .write.mode(mode)
        .partitionBy("month")
        .parquet(path)
    )


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("month")
