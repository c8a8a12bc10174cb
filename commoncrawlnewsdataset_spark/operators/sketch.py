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
    confirm: str = "sketch",
    debug_plan: bool = False,
) -> DataFrame:
    """Keys whose count-min estimate is >= N/k.  GUARANTEE (the property the
    tests pin): every TRUE heavy hitter (exact count >= N/k) is returned,
    because estimates never under-count; collisions can add false positives,
    bounded by the ε = e/width over-count.  Returns (key, est, threshold).

    Candidate generation is MAP-SIDE (no full-cardinality shuffle) and
    BOUNDED-SPACE: a per-partition mapInPandas runs a Misra-Gries summary
    (capacity max(1024, 32k) entries, weighted batch inserts, decrement
    mass D tracked exactly) and emits keys whose lower-bound count plus D
    reaches thr//(2P).  Superset proof in two steps: (1) pigeonhole — a key
    with global count >= thr has local count >= ceil(thr/P) in some
    partition (else total <= P*(ceil(thr/P)-1) < thr; thr//(2P) buys slack
    for planned-vs-executed partition drift up to 2x, since P here is the
    PLANNED count — pyspark's TaskContext doesn't expose the executed one);
    (2) Misra-Gries under-counts by at most the tracked D, so `mg_count +
    D >= local_thr` can never exclude such a key.  NULL keys are counted
    (value_counts(dropna=False)) — a frequent NULL is a heavy hitter like
    any other (note the md5 hasher family estimates NULL as 0 by
    construction: its cells are NULL, so md5-family callers should
    pre-filter NULL keys or use confirm='exact').  False positives pass
    downstream, where the est >= thr filter screens them.  Memory is
    O(capacity) per partition regardless of key cardinality, and the only
    shuffle after the scan is a distinct over <= capacity*P candidates —
    the full df.distinct() this replaces would cost the same as an exact
    groupBy and defeat the sketch's sublinear purpose.  Pathological
    partition imbalance (MG decrement reaching the local bar, which would
    void the superset guarantee) triggers ONE automatic round-robin
    repartition retry — balanced mass by construction — before failing
    loud.

    ``confirm='exact'`` adds a second pass that exact-counts the candidate
    set (broadcast semi-join + groupBy over candidate rows only) and gates
    on the EXACT count, returning (key, est, cnt, threshold): the output
    key set is then deterministic — precisely the true heavy hitters,
    independent of partitioning — which is what makes the md5 config fully
    DuckDB-oracle-checkable (sketch-gated output varies in which false
    positives each partitioning's candidate set lets through).  Cost: one
    extra map-side scan; still no full-cardinality shuffle anywhere."""
    import pandas as pd

    sketch = count_min_build(df, key_col, width, depth, seed, hasher)
    n = df.count()
    thr = max(1, n // k)
    nparts = max(1, df.select(key_col).rdd.getNumPartitions())
    # 2x safety factor (ADVICE r4): nparts is the PLANNED partition count —
    # pyspark's TaskContext does not expose the executed one, and AQE can
    # execute with more partitions than planned, in which case floor(thr/P)
    # alone could miss a heavy key spread perfectly evenly.  The factor buys
    # drift slack up to 2x for the price of a (still capped) larger
    # candidate set.
    local_thr = max(1, thr // (2 * nparts))
    ktype = df.schema[key_col].dataType.simpleString()
    cap = max(1024, 32 * k)

    def _local_cands(batches):
        counts: dict = {}
        decrement = 0  # total MG decrement: true - count <= decrement, always
        for pdf in batches:
            # dropna=False: a NULL key with count >= N/k is a heavy hitter
            # like any other (ADVICE r4 — plain value_counts silently
            # excluded it from the candidate superset)
            for key, c in pdf[key_col].value_counts(dropna=False).items():
                if key is None or key != key:  # NaN / None -> one NULL bucket
                    key = None
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
            # loud (the caller auto-retries ONCE on balanced partitions)
            raise RuntimeError(
                f"heavy_hitters: Misra-Gries decrement {decrement} reached "
                f"local_thr {local_thr} (pathological partition imbalance); "
                "repartition the input or raise the candidate capacity"
            )
        yield pd.DataFrame(
            {key_col: [k_ for k_, c in counts.items() if c + decrement >= local_thr]}
        )

    candidate_plan = ""

    def _candidates(keys_df: DataFrame) -> DataFrame:
        # eager localCheckpoint: (a) surfaces the imbalance RuntimeError
        # HERE rather than at the caller's downstream action, so the retry
        # below can catch it; (b) the candidate scan runs once, not once
        # per downstream branch (est join + exact confirm both read it).
        # Result is <= cap*P rows — driver-safe.
        nonlocal candidate_plan
        lazy = keys_df.mapInPandas(
            _local_cands, schema=f"{key_col} {ktype}"
        ).distinct()
        if debug_plan:
            # the checkpoint hides the candidate plan from the caller's
            # explain(); capture it for the map-side plan-regression lock
            # (debug only — a full Catalyst compile per production call is
            # pure overhead, r5 review finding)
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                lazy.explain("formatted")
            candidate_plan = buf.getvalue()
        return lazy.localCheckpoint(eager=True)

    keys_only = df.select(key_col)
    try:
        cand_keys = _candidates(keys_only)
    except Exception as e:  # executor RuntimeError arrives Py4J-wrapped
        if "Misra-Gries decrement" not in str(e):
            raise
        # VERDICT r4 #8: one automatic balanced retry before failing loud.
        # Round-robin repartition spreads mass evenly regardless of key
        # skew, so the per-partition MG decrement bound (mass/cap) drops to
        # the mean — the imbalance cure by construction.  Same partition
        # count, so local_thr stays valid.
        import warnings

        warnings.warn(
            "heavy_hitters: pathological partition imbalance — retrying "
            "candidate generation once on round-robin balanced partitions",
            RuntimeWarning,
            stacklevel=2,
        )
        cand_keys = _candidates(keys_only.repartition(nparts))
    cand = count_min_estimate(cand_keys, sketch, key_col, width, depth, seed, hasher)
    if confirm == "exact":
        # Deterministic variant: exact-count the candidates (broadcast
        # semi-join + groupBy over candidate rows only — map-side filter,
        # no full-cardinality shuffle) and gate on the EXACT count.  Output
        # key set == the true heavy hitters, independent of partitioning,
        # which is what makes the md5 config fully DuckDB-oracle-checkable;
        # `est` (the sketch's view) rides along for the value oracle.
        # null-safe equality throughout: a NULL candidate key must survive
        # the confirm joins (plain `=` would drop it before the count)
        exact = (
            df.select(F.col(key_col).alias("k2"))
            .join(
                F.broadcast(cand_keys.select(F.col(key_col).alias("key"))),
                F.col("k2").eqNullSafe(F.col("key")),
            )
            .groupBy("key")
            .agg(F.count("*").alias("cnt"))
        )
        out = (
            cand.alias("c")
            .join(exact.alias("e"), F.col("c.key").eqNullSafe(F.col("e.key")))
            .filter(F.col("cnt") >= thr)
            .select(
                F.col("c.key").alias("key"),
                "est",
                F.col("cnt").cast("long").alias("cnt"),
                F.lit(thr).cast("long").alias("threshold"),
            )
        )
        out._hh_candidate_plan = candidate_plan  # for the plan-lock test
        return out
    out = cand.filter(F.col("est") >= thr).select(
        "key", "est", F.lit(thr).cast("long").alias("threshold")
    )
    out._hh_candidate_plan = candidate_plan  # for the plan-lock test
    return out
