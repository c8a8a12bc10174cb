"""From-scratch WARC/1.0 reader (sources/warc.py) + the S4 ingestion spine.

Reference semantics under test: 02_extract_newscrawl.py:18-39 — response-only
filter (F1), header projection (P1), content bytes intact.
"""

from __future__ import annotations

import gzip

import pandas as pd
from pyspark.sql import functions as F

from commoncrawlnewsdataset_spark.sources.pages import read_warc, warc_records_to_pages
from commoncrawlnewsdataset_spark.sources.warc import (
    build_request_record,
    build_response_record,
    build_warcinfo,
    iter_warc_records,
)

DATE = "2024-03-05T12:00:07Z"


def _shard(gz: bool) -> bytes:
    return (
        build_warcinfo(DATE, gzip_member=gz)
        + build_request_record("https://a.example/1", DATE, "<urn:uuid:rq1>", gzip_member=gz)
        + build_response_record(
            "https://a.example/1", DATE, "<urn:uuid:a1>",
            "<html><p>ümlaut körper</p></html>".encode("utf-8"), gzip_member=gz,
        )
        + build_response_record(
            "https://a.example/2", DATE, "<urn:uuid:a2>",
            b"\x00\x01\xffraw bytes", mime="application/octet-stream", gzip_member=gz,
        )
    )


def test_parser_roundtrip_plain_and_gzip():
    for gz in (False, True):
        recs = list(iter_warc_records(_shard(gz)))
        assert [r.rec_type for r in recs] == ["warcinfo", "request", "response", "response"]
        resp = [r for r in recs if r.rec_type == "response"]
        assert resp[0].content == "<html><p>ümlaut körper</p></html>".encode("utf-8")
        assert resp[1].content == b"\x00\x01\xffraw bytes"
        assert resp[0].http_header("Content-Type") == "text/html"
        assert resp[1].http_header("content-type") == "application/octet-stream"
        assert resp[0].header("WARC-Target-URI") == "https://a.example/1"
        assert resp[0].header("warc-date") == DATE


def test_parser_whole_file_gzip():
    """A single gzip stream over many records (the other .warc.gz layout)."""
    blob = gzip.compress(_shard(False))
    recs = list(iter_warc_records(blob))
    assert sum(r.rec_type == "response" for r in recs) == 2


def test_parser_tolerates_trailing_garbage():
    blob = _shard(False) + b"NOT A WARC RECORD"
    assert sum(r.rec_type == "response" for r in iter_warc_records(blob)) == 2


def test_read_warc_spark_scan(spark, tmp_path):
    """S4 end-to-end: binaryFile scan -> mapInPandas parse -> P1 projection ->
    pages shape; request/warcinfo records never surface (F1)."""
    for i, gz in enumerate((True, False)):
        name = f"shard{i}.warc.gz" if gz else f"shard{i}.warc"
        (tmp_path / name).write_bytes(_shard(gz))
    records = read_warc(spark, str(tmp_path / "shard*"))
    rows = records.orderBy("id", "url").collect()
    assert len(rows) == 4  # 2 responses x 2 shards
    by_url = {(r["id"], r["url"]): r for r in rows}
    r1 = by_url[("<urn:uuid:a1>", "https://a.example/1")]
    assert bytes(r1["content"]) == "<html><p>ümlaut körper</p></html>".encode("utf-8")
    assert r1["mime_type"] == "text/html"
    assert r1["warc_ts"] == pd.Timestamp("2024-03-05T12:00:07").to_pydatetime()
    # P5 projection to the input_hint pages shape
    pages = warc_records_to_pages(records)
    assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]
    assert pages.filter(F.col("html").isNotNull()).count() == 4


def test_content_length_header_is_full_http_payload():
    """Content-Length covers the whole HTTP message (headers + body), as in
    real CC WARCs — the parser must consume exactly that many bytes."""
    body = b"x" * 100
    rec = build_response_record("https://a.example/cl", DATE, "<urn:uuid:cl>", body)
    parsed = next(iter(iter_warc_records(rec)))
    clen = int(parsed.header("Content-Length"))
    assert clen > 100  # includes the HTTP header block
    assert parsed.content == body


def test_warc_salvage_corrupt_members_and_garbage():
    """Damaged shards are routine at corpus scale: a truncated gzip member
    salvages every record decompressed before it, and garbage bytes between
    records resync to the next WARC magic instead of dropping the rest of
    the shard."""
    from commoncrawlnewsdataset_spark.sources.warc import (
        build_response_record,
        iter_warc_records,
    )

    recs = [
        build_response_record(
            f"https://s.example/{i}", "2024-01-01T00:00:00Z",
            f"<urn:uuid:{i}>", f"body {i}".encode(), gzip_member=True,
        )
        for i in range(4)
    ]
    # truncated final member: first three records survive
    blob = b"".join(recs[:3]) + recs[3][: len(recs[3]) // 2]
    got = [r.header("WARC-Record-ID") for r in iter_warc_records(blob)]
    assert got == ["<urn:uuid:0>", "<urn:uuid:1>", "<urn:uuid:2>"]

    # garbage between plain-text records: resync recovers the tail
    plain = [
        build_response_record(
            f"https://s.example/{i}", "2024-01-01T00:00:00Z",
            f"<urn:uuid:p{i}>", f"body {i}".encode(),
        )
        for i in range(3)
    ]
    dirty = plain[0] + b"\x00\xffgarbage without crlf structure" + plain[1] + plain[2]
    got = [r.header("WARC-Record-ID") for r in iter_warc_records(dirty)]
    assert got == ["<urn:uuid:p0>", "<urn:uuid:p1>", "<urn:uuid:p2>"]


def test_warc_mixed_plain_and_gzip_members():
    """Mixed shards (concatenation tools interleave plain records and gzip
    members) parse completely in BOTH directions, and a false gzip magic
    inside a garbage region resyncs past instead of truncating the tail."""
    from commoncrawlnewsdataset_spark.sources.warc import (
        build_response_record,
        iter_warc_records,
    )

    def rec(i, gz):
        return build_response_record(
            f"https://m.example/{i}", "2024-01-01T00:00:00Z",
            f"<urn:uuid:m{i}>", f"body {i}".encode(), gzip_member=gz,
        )

    # plain -> gzip -> plain -> gzip
    blob = rec(0, False) + rec(1, True) + rec(2, False) + rec(3, True)
    got = [r.header("WARC-Record-ID") for r in iter_warc_records(blob)]
    assert got == [f"<urn:uuid:m{i}>" for i in range(4)]

    # garbage containing a false gzip magic, then a valid plain record
    dirty = rec(0, False) + b"junk\x1f\x8bnot-really-gzip" + rec(1, False)
    got = [r.header("WARC-Record-ID") for r in iter_warc_records(dirty)]
    assert got == ["<urn:uuid:m0>", "<urn:uuid:m1>"]


def test_warc_pages_survive_hostile_headers():
    """Malformed WARC-Date / garbage headers in a (salvaged) record must
    not escape the scan UDF: the row surfaces with a NULL timestamp
    instead of failing the task (and, 4 retries later, the job)."""
    from commoncrawlnewsdataset_spark.sources.pages import _records_from_bytes
    from commoncrawlnewsdataset_spark.sources.warc import build_response_record

    good = build_response_record(
        "https://h.example/ok", "2024-05-01T00:00:00Z", "<urn:uuid:ok>", b"fine",
    )
    bad_date = build_response_record(
        "https://h.example/bad", "yesterday-ish", "<urn:uuid:bad>", b"still here",
    )
    rows = {r["id"]: r for r in _records_from_bytes(good + bad_date)}
    assert rows["<urn:uuid:ok>"]["warc_ts"] is not None
    assert rows["<urn:uuid:bad>"]["warc_ts"] is None  # coerced, not crashed
    assert rows["<urn:uuid:bad>"]["content"] == b"still here"


def test_warc_interleaved_members_parse_linearly():
    """ADVICE r4 (low): heavily interleaved plain/gzip member shards must
    parse in O(n) — the segment-stack parser never re-splices the tail.
    20k alternating members (~8 MB) finish in well under a second; the old
    per-member buffer splice was quadratic here (minutes)."""
    import time

    from commoncrawlnewsdataset_spark.sources.warc import (
        build_response_record,
        iter_warc_records,
    )

    blob = b"".join(
        build_response_record(
            f"https://x.example/{i}", "2024-01-01T00:00:00Z",
            f"<urn:uuid:{i}>", b"b" * 300, gzip_member=(i % 2 == 0),
        )
        for i in range(20000)
    )
    t0 = time.time()
    n = sum(1 for _ in iter_warc_records(blob))
    took = time.time() - t0
    assert n == 20000
    # generous 30x headroom over the measured 0.15 s: catches a quadratic
    # regression (minutes) without flaking on a loaded box
    assert took < 5.0, f"interleaved parse took {took:.1f}s - quadratic again?"


def test_warc_empty_gzip_member_no_duplicates():
    """r5 review regression: an EMPTY gzip member at a record boundary must
    not cause the remaining tail to parse twice (once in place, once via
    the pending queue) — each following record yields exactly once."""
    import gzip

    from commoncrawlnewsdataset_spark.sources.warc import (
        build_response_record,
        iter_warc_records,
    )

    recs = [
        build_response_record(
            f"https://e.example/{i}", "2024-01-01T00:00:00Z",
            f"<urn:uuid:e{i}>", b"body", gzip_member=(i == 2),
        )
        for i in range(4)
    ]
    for where in range(5):  # empty member at every boundary incl. ends
        blob = b"".join(recs[:where]) + gzip.compress(b"") + b"".join(recs[where:])
        got = [r.header("WARC-Record-ID") for r in iter_warc_records(blob)]
        assert got == [f"<urn:uuid:e{i}>" for i in range(4)], (where, got)
