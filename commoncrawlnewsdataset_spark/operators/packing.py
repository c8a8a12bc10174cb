"""Sequence packing for training-data prep: concat-and-chunk token layout.

Pretraining pipelines concatenate the token stream of the (ordered) corpus
and cut it into fixed-size chunks; each document therefore owns a token
interval [tok_start, tok_end) and spans chunks first_chunk..last_chunk.
Computing that layout needs a GLOBAL prefix sum — the naive Spark form is a
window with no partitionBy, which executes on a single partition and dies at
scale.  ``global_cumsum`` is the scale-safe two-phase form:

1. range-partition by the order key (RangePartitioner guarantees partition i
   holds strictly smaller keys than partition i+1);
2. local cumulative sums within each partition (parallel windows);
3. per-partition totals (one tiny row per partition) get their own running
   offset and broadcast-join back.

Only step 3 is serial, over ~numPartitions rows — the classic distributed
prefix-sum shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_cumsum(
    df: DataFrame, order_col: str, value_col: str, out_col: str = "cumsum"
) -> DataFrame:
    """Inclusive global running sum of ``value_col`` in ``order_col`` order,
    without ever shuffling the data to one partition."""
    part = df.repartitionByRange(F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("_pid").orderBy(order_col)
    local = part.withColumn("_local", F.sum(value_col).over(w_local))
    # one row per partition; the offsets window is serial but tiny
    totals = local.groupBy("_pid").agg(F.sum(value_col).alias("_total"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_total").over(w_off), F.lit(0))
    ).select("_pid", "_off")
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_local") + F.col("_off")).cast("long"))
        .drop("_pid", "_local")
    )


def pack_chunks(
    docs: DataFrame,
    chunk_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    counter=None,
) -> DataFrame:
    """Concat-and-chunk layout: token interval and chunk span per document
    (corpus ordered by ``id_col``).  ``counter`` is the Column->Column
    token-count expression — whitespace words by default; pass
    ``textmetrics.token_estimate`` to budget in subword tokens the way a
    production pretraining layout does.  Zero-token documents own an empty
    interval and span no chunks (chunk ids -1)."""
    from commoncrawlnewsdataset_spark.functions.quality import token_count_ws

    if counter is None:
        counter = token_count_ws
    with_n = docs.select(
        F.col(id_col).alias("doc_id"),
        counter(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    cum = global_cumsum(with_n, "doc_id", "n_tokens", out_col="tok_end")
    return cum.select(
        "doc_id",
        "n_tokens",
        (F.col("tok_end") - F.col("n_tokens")).alias("tok_start"),
        "tok_end",
        F.when(F.col("n_tokens") > 0, F.floor((F.col("tok_end") - F.col("n_tokens")) / chunk_tokens))
        .otherwise(F.lit(-1)).cast("long").alias("first_chunk"),
        F.when(F.col("n_tokens") > 0, F.floor((F.col("tok_end") - 1) / chunk_tokens))
        .otherwise(F.lit(-1)).cast("long").alias("last_chunk"),
    )
