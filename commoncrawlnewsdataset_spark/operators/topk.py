"""Sorts / limits / top-k (SURVEY §2.9) and group-wise top-k (O5/A7).

orderBy + limit compiles to TakeOrderedAndProject (per-partition k-heap, no
global sort); group top-k is the canonical window row_number pattern."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk(df: DataFrame, order_col: str, k: int, *tiebreak: str) -> DataFrame:
    """O1: ORDER BY col DESC (ties broken deterministically) LIMIT k."""
    return df.orderBy(F.desc(order_col), *[F.col(c) for c in tiebreak]).limit(k)


def group_topk(
    df: DataFrame, group_cols: list[str], order_col: str, k: int, *tiebreak: str
) -> DataFrame:
    """O5/A7 (ner_content.py:50,72 most_common(3)): row_number over a window
    partitioned by the group — one shuffle on the group key; deterministic
    tie-breaks are mandatory (the reference inherits Counter insertion order)."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc(order_col), *[F.col(c) for c in tiebreak]
    )
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def value_counts_topk(df: DataFrame, col: str, k: int) -> DataFrame:
    """A2 (ner_content.py:30-32): value_counts().head(k) with deterministic ties."""
    return (
        df.groupBy(col)
        .agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"), F.col(col))
        .limit(k)
    )
