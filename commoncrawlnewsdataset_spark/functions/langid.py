"""X18 — heuristic language identification as native Column expressions.

The reference has no explicit lang-id (it targets German implicitly:
", Germany" geocode suffix 07_geocode_news.py:165, German-charset regexes
07:137 / 08:118); the input_hint mandates a ``lang`` column, so this fills it.

Pure stopword-ratio heuristic over whitespace tokens — fully SQL-expressible
(array lambdas, JVM-side) and therefore DuckDB-oracle checkable.  A model-based
identifier would slot in as an iterator pandas UDF with the same signature.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small, fixed stopword inventories — part of the function's contract
DE_STOPWORDS = [
    "der", "die", "das", "und", "ist", "nicht", "von", "mit", "auf", "für",
    "den", "sich", "ein", "eine", "hat", "sind", "werden", "auch", "noch", "bei",
]
EN_STOPWORDS = [
    "the", "and", "is", "not", "of", "with", "on", "for", "to", "in",
    "a", "are", "was", "be", "by", "this", "that", "it", "as", "at",
]


def _clean_tokens(text: Column) -> Column:
    toks = F.split(F.lower(text), r"\s+")
    cleaned = F.transform(toks, lambda t: F.regexp_replace(t, r"[^a-zäöüß]", ""))
    return F.filter(cleaned, lambda t: t != "")


def stopword_hits(text: Column, stopwords: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in stopwords])
    return F.size(F.filter(_clean_tokens(text), lambda t: F.array_contains(arr, t)))


def lang_id(text: Column) -> Column:
    """'de' / 'en' / 'und' (undetermined) by stopword-hit majority."""
    de = stopword_hits(text, DE_STOPWORDS)
    en = stopword_hits(text, EN_STOPWORDS)
    return (
        F.when(de > en, F.lit("de"))
        .when(en > de, F.lit("en"))
        .otherwise(F.lit("und"))
    )
