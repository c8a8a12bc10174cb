"""Count-min sketch + heavy hitters: sublinear frequency estimation.

Completes the sketch family (minhash/simhash for similarity, bloom for
membership — this one for FREQUENCY): a (depth x width) counter grid where
key k increments cell (j, h_j(k) % width) for each of `depth` seeded
hashes; an estimate is the MIN over the key's depth cells, which can only
OVER-count (collisions add, never subtract).  At 10^10 urls/tokens the
grid is a few MB regardless of cardinality — the standard way to track
host/token frequencies without a full groupBy over the key space.

Spark-first shape: the sketch build is ONE exploded groupBy (depth cells
per input row fused into a single shuffle on ~8-byte (row, col) keys);
estimation broadcast-joins the tiny grid back.  All hashing is xxhash64
column expressions.  Deterministic for a given (width, depth, seed) but
NOT cross-engine (DuckDB lacks xxhash64): driver checks are rows-only and
the ε-guarantee is property-tested instead (tests/test_operators.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cells(key, width: int, depth: int, seed: int):
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                F.pmod(F.xxhash64(F.lit(seed + j), key), F.lit(width)).cast("int").alias("col"),
            )
            for j in range(depth)
        ]
    )


def count_min_build(
    df: DataFrame, key_col: str, width: int = 1024, depth: int = 4, seed: int = 0
) -> DataFrame:
    """(row, col, c) grid cells — at most width*depth rows, one shuffle."""
    cells = df.select(F.explode(_cells(F.col(key_col), width, depth, seed)).alias("s"))
    return cells.groupBy("s.row", "s.col").agg(F.count("*").alias("c"))


def count_min_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    seed: int = 0,
) -> DataFrame:
    """Adds ``est`` = min over the key's depth cells (never under-counts).
    The grid broadcasts; per key this is a broadcast join + one min-agg."""
    exploded = keys.select(
        F.col(key_col).alias("key"),
        F.explode(_cells(F.col(key_col), width, depth, seed)).alias("s"),
    ).select("key", "s.row", "s.col")
    return (
        exploded.join(F.broadcast(sketch), ["row", "col"])
        .groupBy("key")
        .agg(F.min("c").cast("long").alias("est"))
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 20,
    width: int = 1024,
    depth: int = 4,
    seed: int = 0,
) -> DataFrame:
    """Keys whose count-min estimate is >= N/k.  GUARANTEE (the property the
    tests pin): every TRUE heavy hitter (exact count >= N/k) is returned,
    because estimates never under-count; collisions can add false positives,
    bounded by the ε = e/width over-count.  Returns (key, est, threshold)."""
    sketch = count_min_build(df, key_col, width, depth, seed)
    n = df.count()
    thr = max(1, n // k)
    cand = count_min_estimate(
        df.select(key_col).distinct(), sketch, key_col, width, depth, seed
    ).filter(F.col("est") >= thr)
    return cand.select("key", "est", F.lit(thr).cast("long").alias("threshold"))
