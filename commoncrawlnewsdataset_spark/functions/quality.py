"""Training-data text analysis: token counting, quality scoring, fingerprints.

Beyond-reference operators a 100 TB training-data pipeline needs (driver
brief); all native Column expressions (JVM-side, codegen) so they survive a
1000-executor scale-up with zero Python in the hot path.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol.
# \p{L}/\p{N} are identical in Java regex (Spark) and RE2 (DuckDB oracle).
BPE_TOKEN_PATTERN = r"\p{L}+|\p{N}+|[^\p{L}\p{N}\s]"


def token_count_ws(text: Column) -> Column:
    """Whitespace token count (≡ Python str.split())."""
    return F.size(F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")).cast("long")


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count via regexp_count — a cheap LLM-token proxy."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_PATTERN)).cast("long")


def punct_ratio(text: Column) -> Column:
    punct = F.length(text) - F.length(F.regexp_replace(text, r"[^\p{L}\p{N}\s]", ""))
    return F.when(F.length(text) > 0, punct / F.length(text)).otherwise(F.lit(0.0))


def alpha_ratio(text: Column) -> Column:
    alpha = F.length(F.regexp_replace(text, r"[^\p{L}]", ""))
    return F.when(F.length(text) > 0, alpha / F.length(text)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score: length band + alpha ratio − punct excess.

    Deterministic arithmetic only, so the DuckDB oracle reproduces it exactly
    (after rounding); thresholds chosen to mirror the reference's F4 bands
    (05_filter_news.py:34-41: word_count 50..10000, mean_word_length 3..12).
    """
    wc = token_count_ws(text).cast("double")
    len_band = F.when((wc >= 50) & (wc <= 10000), F.lit(1.0)).otherwise(
        F.least(wc / 50.0, F.lit(1.0)) * 0.5
    )
    score = len_band * 0.5 + alpha_ratio(text) * 0.4 - punct_ratio(text) * 0.2
    return F.round(F.greatest(F.least(score, F.lit(1.0)), F.lit(0.0)), 4)


def normalize_for_fingerprint(text: Column) -> Column:
    """Lowercase, collapse whitespace, strip — canonical form for dup keys."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint_md5(text: Column) -> Column:
    """Content fingerprint: md5 of the normalized text (md5 is identical in
    Spark and DuckDB, so exact-dedup results are oracle-checkable)."""
    return F.md5(normalize_for_fingerprint(text))


def fingerprint_rolling(text: Column, modulus: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash over the normalized text's characters:
    h = fold(h * 31 + ascii(c)) mod m — an order-sensitive fingerprint that
    stays pure-SQL (aggregate over split chars)."""
    chars = F.split(normalize_for_fingerprint(text), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: F.pmod(acc * 31 + F.ascii(c), F.lit(modulus)),
    )


def repetition_stats(df, id_col: str, text_col: str):
    """Gopher-style intra-document repetition signals (Rae et al. 2021 §A1.1
    use duplicate-line/-ngram fractions as quality gates; this corpus is
    single-line so the token/bigram forms carry the signal):

    - ``dup_token_frac``  = 1 - distinct_tokens / total_tokens
    - ``top_bigram_frac`` = occurrences of the most frequent bigram / total
      bigrams (0.0 when < 2 tokens)

    Scale shape: token stats are pure column expressions; the bigram mode
    needs a per-doc argmax, computed by exploding (doc, xxhash64(bigram))
    rows into ONE groupBy — only 8-byte hashes shuffle, never bigram text
    (counts are what flow; an 8-byte collision would need ~2^32 distinct
    bigrams per doc).  Returns (doc_id, n_tokens, dup_token_frac,
    top_bigram_frac)."""
    from pyspark.sql import functions as F

    # r8: the token array materializes ONCE as a column (_t) — the old
    # inline form re-evaluated the split+filter per reference (~5x per
    # row), and the base subtree additionally feeds both join branches.
    staged = df.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
        ).alias("_t"),
    )
    toks = F.col("_t")
    n = F.size(toks)
    # bigrams via zip_with(head, tail): the lambda touches only its element
    # args, so the token pipeline is NOT re-inlined per element (indexing
    # with element_at(toks, i) inside a transform would recompute the whole
    # split per position — Catalyst projection collapse, O(n^2) per doc)
    base = staged.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.when(
            n >= 2,
            F.zip_with(
                F.slice(toks, 1, n - 1),
                F.slice(toks, 2, n - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
        ).alias("bg"),
    )
    top = (
        base.select("doc_id", F.explode("bg").alias("b"))
        .groupBy("doc_id", F.xxhash64("b").alias("bh"))
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").cast("long").alias("top_bg"))
    )
    return (
        base.join(top, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.when(
                F.col("n_tokens") > 0,
                F.round(1.0 - F.col("n_distinct") / F.col("n_tokens"), 4),
            ).otherwise(F.lit(0.0)).alias("dup_token_frac"),
            F.when(
                F.col("n_tokens") >= 2,
                F.round(F.col("top_bg") / (F.col("n_tokens") - 1), 4),
            ).otherwise(F.lit(0.0)).alias("top_bigram_frac"),
        )
    )


def with_compression_ratio(df, text_col: str = "text", out_col: str = "compression_ratio"):
    """zlib-compressibility quality signal: template/boilerplate text
    compresses far below natural prose, so a low ratio flags machine-
    generated or highly repetitive documents (complements the Gopher-style
    repetition gates with one global signal; production filters threshold
    around ~0.3-0.4 on web text).

    ratio = len(zlib.compress(utf8, level=6)) / len(utf8); 1.0 for empty.
    Arrow-batched iterator UDF (zlib is C-speed; the batch loop is the only
    Python).  Deliberately NOT SQL-expressible — DuckDB has no zlib scalar —
    so the driver check is rows-only and correctness is pytest-bounded."""
    import zlib

    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def _ratio(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        def one(t):
            if not t:
                return 1.0
            raw = t.encode("utf-8")
            return round(len(zlib.compress(raw, 6)) / len(raw), 4)

        for s in batches:
            yield s.map(one)

    return df.withColumn(out_col, _ratio(F.col(text_col)))
