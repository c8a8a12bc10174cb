"""X4 extraction: the per-row invariant — byte-identical extracted text per
url between the vectorized UDF and the row-at-a-time reference loop style
(03_extract_text.py:52-75)."""

from __future__ import annotations

from pyspark.sql import functions as F

from commoncrawlnewsdataset_spark.functions.extract import extract_articles, extract_one
from commoncrawlnewsdataset_spark.schemas import PAGES_SCHEMA
from commoncrawlnewsdataset_spark.synth import make_pages_pdf


def test_extract_byte_identical_per_url(spark):
    pdf = make_pages_pdf(300, seed=42)
    pages = spark.createDataFrame(pdf, PAGES_SCHEMA)

    got = {
        r["url"]: r["text"]
        for r in extract_articles(pages).select("url", "text").collect()
    }

    # reference loop style: row-at-a-time extract + dropna + dedup(text, hostname)
    expected = {}
    seen = set()
    for _, row in pdf.iterrows():
        out = extract_one(row["html"], row["url"])
        if out is None or out["text"] is None:
            continue
        key = (out["text"], out["hostname"])
        if key in seen:
            continue
        seen.add(key)
        expected[row["url"]] = out["text"]

    assert set(got) == set(expected)
    for url, text in expected.items():
        assert got[url] == text, url  # byte-identical (str equality is exact)


def test_extract_rejects_empty_bodies(spark):
    pdf = make_pages_pdf(300, seed=42)
    pages = spark.createDataFrame(pdf, PAGES_SCHEMA)
    empties = {row["url"] for _, row in pdf.iterrows() if not (row["text"] or "")}
    assert empties  # fixture guarantees some
    urls = {r["url"] for r in extract_articles(pages).select("url").collect()}
    assert not (urls & empties)


def test_extract_dedup_is_on_text_and_hostname(spark):
    """D1 (03:80): same body on the SAME host collapses; same body on a
    different host survives."""
    rows = [
        ("https://a.example.de/1", None, b"<html><p>same body</p></html>", None, "de"),
        ("https://a.example.de/2", None, b"<html><p>same body</p></html>", None, "de"),
        ("https://b.example.de/1", None, b"<html><p>same body</p></html>", None, "de"),
    ]
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    out = extract_articles(pages).select("hostname").collect()
    hosts = sorted(r["hostname"] for r in out)
    assert hosts == ["a.example.de", "b.example.de"]
