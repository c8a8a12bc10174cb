"""Skew-handling primitives (north_rule: 'partitioning / shuffle / skew
handled explicitly').

Two layers of defense in this engine:
1. AQE runtime mitigation (skew-join split + partition coalescing) — enabled
   globally in session.py; no code changes per query.
2. Structural salting for operations AQE cannot fix: per-key aggregations
   and windows over a hot key (the politeness window in
   frontier/politeness.py is the specialized form; these are the generic
   ones).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, str],
    nsalt: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase aggregation: partial agg on (key, salt), final agg on key.

    Identical results to a plain groupBy for decomposable aggregates
    (count/sum/min/max), but a hot key's rows spread over `nsalt` reducers
    in phase 1 — no single task ever sees the full hot key.  `aggs` maps
    column -> one of count/sum/min/max."""
    salt = F.pmod(F.hash(salt_source or F.monotonically_increasing_id().cast("string")), F.lit(nsalt))
    salted = df.withColumn("_salt", salt)

    partial_exprs, final_exprs = [], []
    for col, how in aggs.items():
        part = f"__{how}_{col}"
        if how == "count":
            partial_exprs.append(F.count("*").alias(part))
            final_exprs.append(F.sum(part).alias(f"{how}_{col}" if col != "*" else "count"))
        elif how == "sum":
            partial_exprs.append(F.sum(col).alias(part))
            final_exprs.append(F.sum(part).alias(f"sum_{col}"))
        elif how == "min":
            partial_exprs.append(F.min(col).alias(part))
            final_exprs.append(F.min(part).alias(f"min_{col}"))
        elif how == "max":
            partial_exprs.append(F.max(col).alias(part))
            final_exprs.append(F.max(part).alias(f"max_{col}"))
        else:
            raise ValueError(f"non-decomposable aggregate: {how}")

    partial = salted.groupBy(*key_cols, "_salt").agg(*partial_exprs)
    return partial.groupBy(*key_cols).agg(*final_exprs)


def salted_hot_key_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    nsalt: int = 16,
) -> DataFrame:
    """Salted replicate join for a skewed fact⋈dim equi-join when the dim is
    too large to broadcast: facts get a random salt, the dim is replicated
    nsalt× with every salt value, and the join key becomes (key, salt) — a
    hot fact key spreads over nsalt reducers."""
    salted_facts = facts.withColumn(
        "_salt", F.pmod(F.hash(F.monotonically_increasing_id().cast("string")), F.lit(nsalt))
    )
    replicated_dim = dim.crossJoin(
        facts.sparkSession.range(nsalt).select(F.col("id").cast("int").alias("_salt"))
    )
    return salted_facts.join(replicated_dim, [key, "_salt"]).drop("_salt")
