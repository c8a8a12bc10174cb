"""X4 — HTML → article extraction as an Arrow-batched pandas UDF.

Reference: trafilatura.extract(content, include_comments=False,
deduplicate=True, output_format="json", with_metadata=True)
(Project_Scripts/03_extract_text.py:54-61), projected to
(text, excerpt, date, tags, categories, title, date_crawled, hostname)
(03_extract_text.py:63-75).

trafilatura is not installed in this container, so extraction is pluggable:

- When ``trafilatura`` imports, ``extract_one`` calls it with the exact
  reference kwargs — this is the byte-identical-text surface; pin the same
  trafilatura version as the reference for production parity.
- Otherwise a deterministic pure-Python fallback parses <title>, <p> bodies
  and <meta name="date"> — stable output for tests and benchmarks.

The per-row invariant tested in tests/test_extract.py: the vectorized UDF's
``text`` is byte-identical per url to ``extract_one`` applied row-at-a-time
in the reference's loop style (03_extract_text.py:52-75).
"""

from __future__ import annotations

import json
import re
from typing import Iterator
from urllib.parse import urlparse

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

try:  # pragma: no cover - not present in the sandbox
    import trafilatura  # type: ignore

    HAVE_TRAFILATURA = True
except ImportError:
    trafilatura = None
    HAVE_TRAFILATURA = False

EXTRACT_STRUCT = StructType(
    [
        StructField("text", StringType()),
        StructField("excerpt", StringType()),
        StructField("date", StringType()),
        StructField("tags", StringType()),
        StructField("categories", StringType()),
        StructField("title", StringType()),
        StructField("date_crawled", StringType()),
        StructField("hostname", StringType()),
    ]
)

_TITLE_RE = re.compile(rb"<title[^>]*>(.*?)</title>", re.S | re.I)
_META_DATE_RE = re.compile(
    rb"<meta\s+name=[\"']date[\"']\s+content=[\"']([^\"']+)[\"']", re.I
)
_P_RE = re.compile(rb"<p[^>]*>(.*?)</p>", re.S | re.I)
_TAG_RE = re.compile(rb"<[^>]+>")


def _fallback_extract(html: bytes, url: str | None) -> dict | None:
    """Deterministic minimal extractor (sandbox stand-in for trafilatura)."""
    if not html:
        return None
    paras = [
        _TAG_RE.sub(b"", p).decode("utf-8", "replace").strip()
        for p in _P_RE.findall(html)
    ]
    paras = [p for p in paras if p]
    if not paras:
        return None  # mirrors trafilatura returning None on empty bodies
    text = "\n".join(paras)
    m = _TITLE_RE.search(html)
    title = m.group(1).decode("utf-8", "replace").strip() if m else None
    m = _META_DATE_RE.search(html)
    date = m.group(1).decode("utf-8", "replace") if m else None
    hostname = urlparse(url).netloc if url else None
    return {
        "text": text,
        "excerpt": text[:200],
        "date": date,
        "tags": None,
        "categories": None,
        "title": title,
        "date_crawled": date,
        "hostname": hostname,
    }


def extract_one(html: bytes | None, url: str | None) -> dict | None:
    """Extract one document; reference kwargs when trafilatura is present
    (03_extract_text.py:54-75 field mapping: raw_text->text, filedate->date_crawled)."""
    if html is None:
        return None
    if HAVE_TRAFILATURA:
        extracted = trafilatura.extract(
            html,
            include_comments=False,
            deduplicate=True,
            output_format="json",
            with_metadata=True,
        )
        if not extracted:
            return None
        root = json.loads(extracted)
        return {
            "text": root.get("raw_text"),
            "excerpt": root.get("excerpt"),
            "date": root.get("date"),
            "tags": root.get("tags"),
            "categories": root.get("categories"),
            "title": root.get("title"),
            "date_crawled": root.get("filedate"),
            "hostname": root.get("hostname"),
        }
    return _fallback_extract(html, url)


_FIELDS = [f.name for f in EXTRACT_STRUCT.fields]
_NULL_ROW = {k: None for k in _FIELDS}


@F.pandas_udf(EXTRACT_STRUCT)
def extract_udf(
    batches: Iterator[tuple[pd.Series, pd.Series]],
) -> Iterator[pd.DataFrame]:
    """Iterator-of-batches form so any heavyweight extractor state is built
    once per python worker, not per batch (V1/V5 pattern, SURVEY §2.11)."""
    for html_s, url_s in batches:
        rows = []
        for html, url in zip(html_s, url_s):
            out = extract_one(html, url)
            rows.append(out if out is not None else _NULL_ROW)
        yield pd.DataFrame(rows, columns=_FIELDS)


def extract_articles(pages: DataFrame) -> DataFrame:
    """The E2E extraction spine (reference path 03_extract_text.py:37-91):

    pages -> extract UDF -> projection (P2) -> null-text drop (F3)
          -> dedup on (text, hostname) (D1).

    Column pruning matters at scale: only (url, html) feed the UDF; `html`
    (the wide binary column) is dropped before any shuffle — the dedup
    shuffles (text, hostname, ...) but never the raw bytes.
    """
    from pyspark.sql import Window

    flat = pages.select(
        "url", extract_udf(F.col("html"), F.col("url")).alias("_e")
    ).select("url", "_e.*")
    # D1 with a deterministic survivor: the reference's 'keep first' depends
    # on file order (03:80); under parallelism the contract is min(url) per
    # (text, hostname) — same dedup set, reproducible representative
    # (SURVEY §7 'determinism under parallelism').
    w = Window.partitionBy("text", "hostname").orderBy("url")
    return (
        flat.filter(F.col("text").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
