"""Location-string normalizations — three deliberately distinct variants.

The reference uses three different regexes at three stages (SURVEY §2 X9/X10);
they are part of the semantics and must not be merged:

- X9  NER stage     (06_named_entity_recognition.py:54-59):
      strip ``[^\\w\\s'\\-]`` (UNICODE), lower, strip, collapse whitespace.
- X10 geocode stage (07_geocode_news.py:136-138):
      lower FIRST, then strip ``[^a-zA-Zäöüß'\\- ]``, strip.
- X10b sqlite load  (08_sqlite_setup.py:117-118):
      lower, strip ``[^a-zäöüß ']``, strip.

All are native Column expressions (Java regex == Python ``re`` for these
character classes); Python twins exist for oracle generation and unit tests.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_loc_ner(col: Column) -> Column:
    """X9: unicode word chars / space / ' / - kept; lowered; collapsed."""
    # (?U) = Java UNICODE_CHARACTER_CLASS, matching Python re.UNICODE \w/\s
    stripped = F.regexp_replace(col, r"(?U)[^\w\s'\-]", "")
    return F.regexp_replace(F.trim(F.lower(stripped)), r"\s+", " ")


def normalize_loc_ner_py(s: str) -> str:
    normalized = re.sub(r"[^\w\s'\-]", "", s, flags=re.UNICODE).lower().strip()
    return re.sub(r"\s+", " ", normalized)


def normalize_loc_geocode(col: Column) -> Column:
    """X10: lower first, keep a-zA-Zäöüß'- and space, strip."""
    return F.trim(F.regexp_replace(F.lower(col), r"[^a-zA-Zäöüß'\- ]", ""))


def normalize_loc_geocode_py(s: str) -> str:
    return re.sub(r"[^a-zA-Zäöüß'\- ]", "", str(s).lower()).strip()


def normalize_loc_sqlite(col: Column) -> Column:
    """X10b: lower, keep a-zäöüß space ', strip."""
    return F.trim(F.regexp_replace(F.lower(col), r"[^a-zäöüß ']", ""))


def normalize_loc_sqlite_py(s: str) -> str:
    return re.sub(r"[^a-zäöüß ']", "", str(s).lower()).strip()
