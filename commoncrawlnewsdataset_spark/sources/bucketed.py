"""Bucketed (co-located) storage for repeat-join tables.

At 100 TB the biggest recurring shuffle is the join between the frontier /
pages fact table and per-url or per-host state (URL-seen exact backstop,
page metadata attach, host statistics).  Spark's bucketing removes it:
both sides are written pre-hash-partitioned AND pre-sorted on the join key
(`bucketBy(n, key).sortBy(key).saveAsTable`), the catalog remembers the
layout, and a join of two tables bucketed the same way compiles to a
SortMergeJoin with NO Exchange and NO Sort on either side — the shuffle is
paid once at write time and amortized over every subsequent join, which is
exactly the economics a crawl frontier wants (state written once per wave,
joined many times).

The bucket count is a layout contract: pick it for the TARGET scale (e.g.
4096 buckets ≈ 25 GB/bucket at 100 TB) — both tables MUST use the same
count for the exchange-free plan.  Verified by a physical-plan lock in
tests/test_plans.py::test_bucketed_join_avoids_shuffle.

Citations: replaces the reference's SQLite-side merges (08_sqlite_setup.py
INSERT OR REPLACE loops) for the scale path; pure public Spark API
(DataFrameWriter.bucketBy, SPARK-12538).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed+sorted parquet table registered in the
    session catalog.  Joins between tables bucketed on the same column with
    the same ``n_buckets`` need no shuffle and no sort."""
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucketing metadata rides along, so downstream joins
    and aggregations on the bucket column reuse the stored distribution."""
    return spark.table(table)
