"""Frontier core: canonical URL keys and the URL-seen filter.

URL-seen at 10^10 scale (north_star): a partitioned Bloom pre-filter plus an
exact anti-join backstop.

- Keys: murmur3 (Spark's built-in ``hash``) over the canonical URL
  (functions.urls.canonicalize_url).  All bloom bit positions are derived
  JVM-side as columns (seeded re-hashes), so the Python side only ever sees
  integer positions — no Python hashing of URLs.
- Build: fetched keys -> `num_shards` shards by pmod(url_hash) -> one bitset
  per shard built with applyInPandas (numpy bitwise, Arrow-batched).  Shard
  bitsets are small (m_bits/8 bytes each) and independent, so at 10^10 URLs
  you scale shards out instead of one giant filter; the shard table is
  broadcast to probe.
- Probe: candidate urls compute the same positions, join their shard's bitset
  (broadcast hash join), test bits vectorized.  Possibly-seen survivors go to
  the EXACT anti-join against the fetched set — bloom false positives can
  therefore never drop a URL; the bloom only shrinks the anti-join's left
  side (typically by ~99% for revisit-heavy frontiers).

The reference's equivalent is `os.path.exists` per file
(01_download_newscrawl.py:88-90).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, LongType, StructField, StructType

from commoncrawlnewsdataset_spark.functions.urls import canonicalize_url, host_of, url_hash

BLOOM_K = 5  # hash functions per key


def with_frontier_keys(df: DataFrame, url_col: str = "url") -> DataFrame:
    """canonical url, murmur3 key, host — the frontier's identity columns."""
    canon = canonicalize_url(F.col(url_col))
    return (
        df.withColumn("url", canon)
        .withColumn("url_hash", url_hash(F.col("url")))
        .withColumn("host", host_of(F.col("url")))
    )


def _bit_positions(url_col: str, m_bits: int) -> list:
    """k seeded murmur3 positions per url, computed as JVM columns."""
    return [
        F.pmod(F.hash(F.concat(F.lit(f"bloom{i}:"), F.col(url_col))), F.lit(m_bits))
        for i in range(BLOOM_K)
    ]


def bloom_num_bits(expected: int, fpp: float = 0.01) -> int:
    if expected <= 0:
        return 64
    m = -expected * math.log(fpp) / (math.log(2) ** 2)
    return max(64, int(m))


BLOOM_SHARD_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("words", ArrayType(LongType())),
    ]
)


def build_bloom_shards(
    fetched: DataFrame,
    url_col: str = "url",
    num_shards: int = 16,
    m_bits_per_shard: int | None = None,
    expected_per_shard: int = 1_000_000,
) -> DataFrame:
    """Partitioned bloom build: one bitset per shard via applyInPandas.

    The bitset is an ``array<long>`` of 64-bit words, NOT a binary blob: the
    probe's bit test is then ``getbit(element_at(words, pos/64), pos%64)`` —
    two integer codegen ops — where a binary blob needs a
    substring→hex→conv→pow chain PER TEST (string work that measured ~40 s
    per 10^6 candidates; the word form is ~20x cheaper and cut the wave
    loop's dominant phase)."""
    m = m_bits_per_shard or bloom_num_bits(expected_per_shard)
    n_words = (m + 63) // 64
    pos = F.array(*_bit_positions(url_col, m))
    by_shard = fetched.select(
        F.pmod(F.hash(F.col(url_col)), F.lit(num_shards)).alias("shard"),
        pos.alias("pos"),
    )

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        words = np.zeros(n_words, dtype=np.uint64)
        if len(pdf):
            all_pos = np.concatenate(pdf["pos"].values).astype(np.int64)
            np.bitwise_or.at(
                words, all_pos // 64, np.uint64(1) << (all_pos % 64).astype(np.uint64)
            )
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "words": [words.view(np.int64).tolist()],
            }
        )

    return by_shard.groupBy("shard").applyInPandas(_build, BLOOM_SHARD_SCHEMA)


def _bit_is_set(words: Column, pos: Column) -> Column:
    """Bit test on the word-array bitset: one element_at + one getbit —
    pure integer JVM expressions inside whole-stage codegen."""
    word = F.element_at(words, F.floor(pos / 64).cast("int") + 1)
    return F.getbit(word, (pos % 64).cast("int")) == 1


def bloom_probe(
    candidates: DataFrame,
    bloom_shards: DataFrame,
    url_col: str = "url",
    num_shards: int = 16,
    m_bits_per_shard: int | None = None,
    expected_per_shard: int = 1_000_000,
) -> DataFrame:
    """Adds ``maybe_seen: boolean``.  False => definitely-new (bloom has no
    false negatives); True => must be confirmed by the exact anti-join.

    The bit tests run as JVM column expressions on the broadcast-joined
    bitset — inside whole-stage codegen the joined `bits` value is a
    REFERENCE into the broadcast relation.  (The original pandas-UDF probe
    serialized the full shard bitset through Arrow for EVERY candidate row:
    at 1 MB/shard x 10^6 rows that is terabytes through the Python channel —
    it spilled 59 GB and hung at a 10^6-url frontier.  Scale rule: never
    project a broadcast-joined wide value into a Python stage.)"""
    m = m_bits_per_shard or bloom_num_bits(expected_per_shard)
    probed = candidates.withColumn(
        "_shard", F.pmod(F.hash(F.col(url_col)), F.lit(num_shards)).cast("int")
    )
    joined = probed.join(
        F.broadcast(
            bloom_shards.withColumnsRenamed({"shard": "_shard", "words": "_words"})
        ),
        "_shard",
        "left",
    )
    tests = [_bit_is_set(F.col("_words"), p) for p in _bit_positions(url_col, m)]
    all_set = tests[0]
    for t in tests[1:]:
        all_set = all_set & t
    return joined.withColumn(
        "maybe_seen",
        F.when(F.col("_words").isNull(), F.lit(False)).otherwise(all_set),
    ).drop("_shard", "_words")


def filter_unseen(
    candidates: DataFrame,
    fetched: DataFrame,
    url_col: str = "url",
    use_bloom: bool = True,
    num_shards: int = 16,
) -> DataFrame:
    """D2 at scale: definitely-new rows skip the anti-join entirely; only
    bloom-positive rows are checked exactly.  Output is provably identical to
    a plain anti-join (bloom has no false negatives; positives are verified)."""
    fetched_urls = fetched.select(url_col).distinct()
    if not use_bloom or fetched_urls.isEmpty():
        # first wave / empty seen-set: nothing to probe (anti-join on an
        # empty right side is a no-op and the bloom build would be pure cost)
        return candidates.join(fetched_urls, url_col, "left_anti")
    shards = build_bloom_shards(fetched_urls, url_col, num_shards)
    probed = bloom_probe(candidates, shards, url_col, num_shards)
    definitely_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    needs_check = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    confirmed_new = needs_check.join(fetched_urls, url_col, "left_anti")
    return definitely_new.unionByName(confirmed_new)


def merge_bloom_shards(a: DataFrame, b: DataFrame) -> DataFrame:
    """Bitwise-OR two shard sets built with the SAME (num_shards, m_bits):
    bloom membership is monotone, so OR-ing word arrays is exact set union.
    Both inputs are <= num_shards rows — the join is trivial; this is what
    makes the seen-set bloom INCREMENTAL (checkpoint shards built once at
    compaction + per-wave delta shards), instead of re-shuffling the full
    fetched set every wave."""
    aa = a.withColumnsRenamed({"words": "_wa"})
    bb = b.withColumnsRenamed({"words": "_wb"})
    # Fail LOUD on a (num_shards, m_bits) mismatch (ADVICE r5): zip_with
    # null-pads different-length word arrays, which would OR in nulls and
    # silently produce false NEGATIVES — re-selecting already-fetched urls.
    # A stale persisted shard set (e.g. bloom_meta from an older layout) is
    # a config bug and must surface as an error, not degraded dedup.
    mismatch = F.raise_error(
        F.concat(
            F.lit("merge_bloom_shards: words-length mismatch on shard "),
            F.col("shard").cast("string"),
            F.lit(" ("),
            F.size("_wa").cast("string"),
            F.lit(" vs "),
            F.size("_wb").cast("string"),
            F.lit(" words) — shard sets built with different (num_shards, m_bits)"),
        )
    )
    return aa.join(bb, "shard", "full").select(
        "shard",
        F.when(F.col("_wa").isNull(), F.col("_wb"))
        .when(F.col("_wb").isNull(), F.col("_wa"))
        .when(F.size("_wa") != F.size("_wb"), mismatch)
        .otherwise(F.zip_with("_wa", "_wb", lambda x, y: x.bitwiseOR(y)))
        .alias("words"),
    )


def filter_unseen_split(
    candidates: DataFrame,
    big_seen: DataFrame,
    small_seen: DataFrame | None,
    url_col: str = "url",
    use_bloom: bool = True,
    num_shards: int = 16,
    big_shards: DataFrame | None = None,
    m_bits_per_shard: int | None = None,
) -> DataFrame:
    """The URL-seen gate with the seen set SPLIT into a big component (the
    compacted frontier checkpoint — ideally a table bucketed on url) and a
    small recent component (deltas since compaction, wave-bounded).

    Scale shape vs plain filter_unseen(candidates, big ∪ small):

    - the anti-join against the small component broadcasts it — no shuffle;
    - the anti-join against the big component puts the ONLY Exchange on the
      candidate side: when ``big_seen`` scans a bucketed+sorted table the
      SortMergeJoin's right side needs no Exchange and no Sort (a plain
      union-then-anti re-shuffles the FULL seen set — O(frontier) shuffle
      bytes per wave, the 100-TB killer);
    - with ``big_shards`` (bloom shards persisted at compaction) the bloom
      build shuffles only the small component each wave, then ORs the two
      shard sets (merge_bloom_shards) — the full-set bloom rebuild was the
      other per-wave O(frontier) shuffle.

    Output is provably identical to filter_unseen over the union: bloom has
    no false negatives and positives are exactly re-checked; X ANTI (A ∪ B)
    == (X ANTI A) ANTI B."""
    big_urls = big_seen.select(url_col)
    small_urls = small_seen.select(url_col).distinct() if small_seen is not None else None

    def _backstop(cands: DataFrame) -> DataFrame:
        out = cands
        if small_urls is not None:
            out = out.join(F.broadcast(small_urls), url_col, "left_anti")
        return out.join(big_urls, url_col, "left_anti")

    if not use_bloom:
        return _backstop(candidates)
    shards = big_shards if big_shards is not None else build_bloom_shards(
        big_urls, url_col, num_shards, m_bits_per_shard
    )
    if small_urls is not None:
        shards = merge_bloom_shards(
            shards,
            build_bloom_shards(small_urls, url_col, num_shards, m_bits_per_shard),
        )
    probed = bloom_probe(candidates, shards, url_col, num_shards, m_bits_per_shard)
    definitely_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    needs_check = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    return definitely_new.unionByName(_backstop(needs_check))
