"""Deterministic sampling for training-data pipelines.

`df.sample()` is seed-and-partitioning dependent — re-running after a
repartition (or on a different cluster size) yields a different subset,
which breaks resumable corpus builds and ablation reproducibility.  These
samplers key the decision on a HASH OF THE ROW KEY instead: the same row is
always in or out, on any engine (the md5 arithmetic mirrors 1:1 into the
DuckDB oracle), at any parallelism, across incremental runs.

- ``hash_sample``            keep rows where md5-fold(key) < rate * 2^32
- ``stratified_hash_sample`` per-stratum rates (e.g. downsample by language
                             or source domain — the standard corpus-mix knob)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPACE = 1 << 32


def hash_bucket(key: Column, seed: int = 0) -> Column:
    """Uniform value in [0, 2^32): first 8 hex chars of md5(seed ':' key)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


def hash_sample(
    df: DataFrame, rate: float, key_col: str, seed: int = 0
) -> DataFrame:
    """Keep ~rate of rows, decided per row key — deterministic, partition-
    independent, incremental-safe (a row's verdict never changes)."""
    return df.filter(hash_bucket(F.col(key_col), seed) < int(rate * _SPACE))


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    key_col: str,
    default_rate: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum keep rates (corpus-mix control): rows in strata not listed
    keep with ``default_rate``.  The rate lookup is a literal CASE chain —
    no join, fully codegen; strata counts stay proportional at any scale."""
    threshold = F.lit(int(default_rate * _SPACE))
    expr = None
    for value, rate in sorted(rates.items()):
        cond = F.col(strata_col) == value
        thr = F.lit(int(rate * _SPACE))
        expr = F.when(cond, thr) if expr is None else expr.when(cond, thr)
    threshold = expr.otherwise(threshold) if expr is not None else threshold
    return df.filter(hash_bucket(F.col(key_col), seed) < threshold)
