"""Training-data text analysis: token counting, quality scoring, fingerprints.

Beyond-reference operators a 100 TB training-data pipeline needs (driver
brief); all native Column expressions (JVM-side, codegen) so they survive a
1000-executor scale-up with zero Python in the hot path.
"""

from __future__ import annotations

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
