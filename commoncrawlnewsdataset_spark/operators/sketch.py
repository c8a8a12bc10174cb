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
estimation broadcast-joins the tiny grid back.

Hashing is dual-family like minhash_lsh_pairs: ``hasher="xxhash64"``
(default) is the production fast path — native 64-bit, not cross-engine;
``hasher="md5"`` maps cells via the first 8 md5 hex chars of
``"<seed+j>:<key>"`` which DuckDB reproduces exactly
(('0x'||substr(md5(...),1,8))::BIGINT % width), so the md5 variant is
fully DuckDB-oracle-checkable while the ε-guarantee itself is
property-tested for both (tests/test_operators.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cells(key, width: int, depth: int, seed: int, hasher: str = "xxhash64"):
    if hasher == "md5":
        def col_for(j: int):
            h = F.md5(F.concat(F.lit(str(seed + j) + ":"), key.cast("string")))
            return F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(width))
    else:
        def col_for(j: int):
            return F.pmod(F.xxhash64(F.lit(seed + j), key), F.lit(width))
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                col_for(j).cast("int").alias("col"),
            )
            for j in range(depth)
        ]
    )


def count_min_build(
    df: DataFrame, key_col: str, width: int = 1024, depth: int = 4, seed: int = 0,
    hasher: str = "xxhash64",
) -> DataFrame:
    """(row, col, c) grid cells — at most width*depth rows, one shuffle."""
    cells = df.select(F.explode(_cells(F.col(key_col), width, depth, seed, hasher)).alias("s"))
    return cells.groupBy("s.row", "s.col").agg(F.count("*").alias("c"))


def count_min_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    seed: int = 0,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Adds ``est`` = min over the key's depth cells (never under-counts).
    The grid broadcasts; per key this is a broadcast join + one min-agg.

    The join is LEFT with absent (never-incremented) cells coalesced to 0:
    an inner join would *exclude* a key's zero cells from the min (turning
    "this key was never seen" into an over-estimate from its other,
    colliding cells) and would drop keys whose cells are ALL absent from
    the output entirely — the CM contract says those estimate exactly 0."""
    exploded = keys.select(
        F.col(key_col).alias("key"),
        F.explode(_cells(F.col(key_col), width, depth, seed, hasher)).alias("s"),
    ).select("key", "s.row", "s.col")
    return (
        exploded.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("est"))
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 20,
    width: int = 1024,
    depth: int = 4,
    seed: int = 0,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Keys whose count-min estimate is >= N/k.  GUARANTEE (the property the
    tests pin): every TRUE heavy hitter (exact count >= N/k) is returned,
    because estimates never under-count; collisions can add false positives,
    bounded by the ε = e/width over-count.  Returns (key, est, threshold).

    Candidate generation is MAP-SIDE (no full-cardinality shuffle) and
    BOUNDED-SPACE: a per-partition mapInPandas runs a Misra-Gries summary
    (capacity max(1024, 32k) entries, weighted batch inserts, decrement
    mass D tracked exactly) and emits keys whose lower-bound count plus D
    reaches thr//P.  Superset proof in two steps: (1) pigeonhole — a key
    with global count >= thr has local count >= ceil(thr/P) in some
    partition (else total <= P*(ceil(thr/P)-1) < thr; floor(thr/P) is used
    for slack against planned-vs-executed partition drift); (2) Misra-Gries
    under-counts by at most the tracked D, so `mg_count + D >= local_thr`
    can never exclude such a key.  False positives pass downstream, where
    the est >= thr filter screens them.  Memory is O(capacity) per
    partition regardless of key cardinality, and the only shuffle after
    the scan is a distinct over <= capacity*P candidates — the full
    df.distinct() this replaces would cost the same as an exact groupBy
    and defeat the sketch's sublinear purpose."""
    import pandas as pd

    sketch = count_min_build(df, key_col, width, depth, seed, hasher)
    n = df.count()
    thr = max(1, n // k)
    nparts = max(1, df.select(key_col).rdd.getNumPartitions())
    local_thr = max(1, thr // nparts)
    ktype = df.schema[key_col].dataType.simpleString()
    cap = max(1024, 32 * k)

    def _local_cands(batches):
        counts: dict = {}
        decrement = 0  # total MG decrement: true - count <= decrement, always
        for pdf in batches:
            for key, c in pdf[key_col].value_counts().items():
                counts[key] = counts.get(key, 0) + int(c)
            if len(counts) > cap:
                # Misra-Gries batch step: subtract the m-th smallest count
                # (m = overflow) from every entry, drop the non-positive —
                # at least m entries go, table is back under capacity
                delta = sorted(counts.values())[len(counts) - cap - 1]
                decrement += delta
                counts = {k_: c - delta for k_, c in counts.items() if c > delta}
        if decrement >= local_thr:
            # decrement <= partition_mass/cap, so reaching the local bar
            # means this partition holds >= cap/k times the mean mass — the
            # no-missed-heavy-hitter guarantee would silently void; fail
            # loud with the fix instead of returning a maybe-incomplete set
            raise RuntimeError(
                f"heavy_hitters: Misra-Gries decrement {decrement} reached "
                f"local_thr {local_thr} (pathological partition imbalance); "
                "repartition the input or raise the candidate capacity"
            )
        yield pd.DataFrame(
            {key_col: [k_ for k_, c in counts.items() if c + decrement >= local_thr]}
        )

    cand_keys = (
        df.select(key_col)
        .mapInPandas(_local_cands, schema=f"{key_col} {ktype}")
        .distinct()
    )
    cand = count_min_estimate(
        cand_keys, sketch, key_col, width, depth, seed, hasher
    ).filter(F.col("est") >= thr)
    return cand.select("key", "est", F.lit(thr).cast("long").alias("threshold"))
