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


def cap_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    cap: int,
    nsalt: int = 8,
    seed: int = 0,
) -> DataFrame:
    """Per-group document cap (the RefinedWeb-style per-DOMAIN cap that stops
    a handful of template-heavy hosts from dominating the training mix):
    keep at most ``cap`` rows per group, chosen by a deterministic uniform
    hash rank over ``key_col`` — a seeded random sample that is reproducible
    across engines and runs, unlike an arbitrary LIMIT.

    Skew-safe two-phase rank (same construction and proof as
    frontier.politeness_rank): phase 1 ranks within (group, salt) partitions
    and keeps <= cap each, bounding any one group's survivors at cap * nsalt
    regardless of how many documents the hottest domain has; phase 2 ranks
    the survivors exactly.  Adds ``rk`` (1-based, per group)."""
    from pyspark.sql import Window

    order = [hash_bucket(F.col(key_col), seed), F.col(key_col)]
    salted = df.withColumn("_salt", F.pmod(F.hash(F.col(key_col)), F.lit(nsalt)))
    w1 = Window.partitionBy(group_col, "_salt").orderBy(*order)
    survivors = (
        salted.repartition(F.col(group_col), F.col("_salt"))
        .withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= cap)
        .drop("_rn", "_salt")
    )
    w2 = Window.partitionBy(group_col).orderBy(*order)
    return (
        survivors.withColumn("rk", F.row_number().over(w2).cast("long"))
        .filter(F.col("rk") <= cap)
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row's split is a pure
    function of its key (md5-fold bucket against cumulative fraction
    ranges, split names in sorted order), so the partition is disjoint,
    complete, stable under repartitioning / incremental re-runs, and
    engine-portable (the DuckDB oracle replays it bit-for-bit).  The
    standard corpus-split op — `randomSplit` re-deals every run and with
    every parallelism change.

    ``fractions`` must sum to ~1; the last range is closed at 2^32 so
    float dust never leaves a row unassigned."""
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = hash_bucket(F.col(key_col), seed)
    expr = None
    acc = 0.0
    names = sorted(fractions)
    for i, name in enumerate(names):
        acc += fractions[name]
        hi = _SPACE if i == len(names) - 1 else int(acc * _SPACE)
        cond = bucket < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(split_col, expr)


def mixture_rates(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    budget: int,
    size_col: str | None = None,
) -> dict[str, float]:
    """Per-stratum keep rates that realize a target training MIXTURE: given
    target weights w_s and a total budget B (rows, or ``size_col`` units
    such as tokens), rate_s = min(1, w_s * B / available_s).  One aggregate
    over the corpus (strata are low-cardinality sources/languages — the
    collect is dim-row by design); strata with weight 0 or absent from
    ``weights`` get rate 0.  Feed the result to stratified_hash_sample —
    together they are the data-mixing knob every LLM corpus build has
    (e.g. '60% web, 30% code, 10% wiki within a 10T-token budget')."""
    agg = F.count("*") if size_col is None else F.sum(size_col)
    avail = {
        r["s"]: int(r["n"])
        for r in df.groupBy(F.col(strata_col).alias("s"))
        .agg(agg.alias("n"))
        .collect()
    }
    rates = {}
    for s, w in weights.items():
        a = avail.get(s, 0)
        rates[s] = 0.0 if a == 0 else min(1.0, (w * budget) / a)
    return rates


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    weights: dict[str, float],
    budget: int,
    size_col: str | None = None,
    seed: int = 0,
) -> DataFrame:
    """mixture_rates + stratified_hash_sample in one call: a deterministic
    subsample whose per-stratum mass approximates ``weights`` * ``budget``
    (exactly capped at availability).  Rows in strata without a weight are
    dropped (rate 0)."""
    rates = mixture_rates(df, strata_col, weights, budget, size_col)
    return stratified_hash_sample(
        df, rates, strata_col, key_col, default_rate=0.0, seed=seed
    )
