"""From-scratch WARC/1.0 reader + writer (no warcio dependency).

WARC (ISO 28500) is a public plain-text record format: each record is a
version line ``WARC/1.0``, CRLF-separated named headers, a blank line, then
exactly ``Content-Length`` payload bytes, then ``CRLF CRLF``.  A ``.warc.gz``
is a sequence of independently-gzipped records (or one gzip stream) — Python's
zlib handles concatenated members.

Parity target: the subset of warcio behavior the reference uses
(02_extract_newscrawl.py:18-39):

- ``rec_type`` == the ``WARC-Type`` header (F1 filters to ``response``),
- header projection ``WARC-Record-ID`` / ``WARC-Target-URI`` / ``WARC-Date``
  / ``Content-Length`` (P1),
- ``http_headers.get_header('Content-Type')`` == the HTTP Content-Type when
  the record's WARC Content-Type is ``application/http``,
- ``content_stream().read()`` == the HTTP body (headers stripped) for http
  records, the raw payload otherwise.

The writer exists for fixtures and the oracle-checked ``warc_scan`` query:
WARC bytes synthesized from the documents table round-trip through this
parser, so payload integrity is value-checked against DuckDB.
"""

from __future__ import annotations

import gzip
import io
from dataclasses import dataclass, field


@dataclass
class WarcRecord:
    rec_type: str
    headers: dict[str, str]  # WARC headers, lowercased names
    http_headers: dict[str, str] = field(default_factory=dict)  # lowercased
    content: bytes = b""  # HTTP body for http records, raw payload otherwise

    def header(self, name: str) -> str | None:
        return self.headers.get(name.lower())

    def http_header(self, name: str) -> str | None:
        return self.http_headers.get(name.lower())


def _parse_header_block(block: bytes) -> tuple[str, dict[str, str]]:
    """First line + name->value dict (names lowercased; WARC headers are
    case-insensitive per spec)."""
    text = block.decode("utf-8", "replace")
    lines = text.split("\r\n")
    headers: dict[str, str] = {}
    for line in lines[1:]:
        if not line:
            continue
        name, sep, value = line.partition(":")
        if sep:
            headers[name.strip().lower()] = value.strip()
    return lines[0], headers


def _split_http_payload(payload: bytes) -> tuple[dict[str, str], bytes]:
    """HTTP message -> (headers, body).  Tolerates a missing header block the
    way warcio does (returns the raw payload as body)."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return {}, payload
    _status, headers = _parse_header_block(payload[:sep])
    return headers, payload[sep + 4 :]


def _gunzip_members_at(data: bytes, pos: int) -> tuple[bytes, int, bool]:
    """Inflate consecutive gzip members starting at ``pos`` (CC-style
    .warc.gz is one member per record).  Returns ``(decompressed,
    next_pos, drop_tail)``: ``next_pos`` is the absolute offset of the
    first byte after the last whole member (the plain tail is NOT copied —
    the caller keeps parsing the original buffer there, so mixed shards
    with plain records between gzip members work); ``drop_tail=True``
    marks a corrupt or truncated member — everything decompressed so far
    is SALVAGED and the unusable remainder dropped: at corpus scale a
    handful of damaged shards is routine, and an exception here would
    escape the Arrow UDF and fail the whole task (4 retries, then the job)
    for one bad member.

    The decompressor is fed 64 KiB memoryview chunks, so no copy of the
    remaining stream is ever made: the previous shape (slice data[pos:],
    re-splice decompressed bytes into the parent buffer per member) was
    O(n^2) byte copying on shards where plain and gzip members interleave
    heavily (ADVICE r4)."""
    import zlib

    mv = memoryview(data)
    out = io.BytesIO()
    n = len(data)
    chunk_sz = 1 << 16
    while pos + 2 <= n and data[pos] == 0x1F and data[pos + 1] == 0x8B:
        d = zlib.decompressobj(wbits=31)  # one gzip member
        p = pos
        while True:
            end = min(p + chunk_sz, n)
            try:
                out.write(d.decompress(mv[p:end]))
            except zlib.error:
                return out.getvalue(), n, True  # corrupt: keep what we have
            p = end
            if d.eof:
                break
            if p >= n:
                return out.getvalue(), n, True  # truncated final member
        pos = p - len(d.unused_data)
    return out.getvalue(), pos, False


def iter_warc_records(raw: bytes):
    """Yield WarcRecord for every record in a WARC (or .warc.gz) byte string.

    Malformed regions RESYNC to the next ``WARC/`` magic instead of
    abandoning the rest of the shard (the reference's per-record try/except
    posture, 02_extract_newscrawl.py:33-35, extended with salvage: at CC
    scale a few damaged records per shard is routine and dropping the
    remaining thousands for one of them is a real data loss).

    The parse state is a SEGMENT STACK, not one spliced buffer: a gzip
    member at a record boundary inflates into a new current segment and the
    untouched remainder of the old buffer is pushed as ``(bytes, offset)``
    — zero copies of the tail, so heavily interleaved plain/gzip shards
    parse in O(n) instead of the O(n^2) re-splice this replaces (ADVICE
    r4).  Adjacent segments are merged only when a record genuinely spans a
    segment boundary (hostile input; never happens for well-formed
    shards)."""

    def _resync(buf: bytes, start: int) -> int:
        # jump to the next plausible record start: WARC magic, or a gzip
        # member (only reachable from a garbage region — valid payload
        # bytes are consumed by content-length, never scanned, so embedded
        # 1f8b inside a record body can't trigger a false split)
        cands = [i for i in (buf.find(b"WARC/", start), buf.find(b"\x1f\x8b", start)) if i >= 0]
        return min(cands) if cands else len(buf)

    pending: list[tuple[bytes, int]] = []  # segments still to parse, in order

    def _merge_next(buf: bytes, start: int) -> bytes:
        # a record spans the current segment's end: prepend its remainder to
        # the next segment (the only copying path, taken on hostile input)
        nbuf, npos = pending.pop(0)
        return buf[start:] + (nbuf[npos:] if npos else nbuf)

    pos, n = 0, len(raw)
    while True:
        if pos >= n:
            if not pending:
                break
            raw, pos = pending.pop(0)
            n = len(raw)
            continue
        if raw.startswith(b"\r\n", pos):
            pos += 2
            continue
        if n - pos < 4 and pending:
            # too few bytes left for any structure (split CRLF CRLF, split
            # gzip magic, ...): join with the next segment and re-parse
            raw = _merge_next(raw, pos)
            pos, n = 0, len(raw)
            continue
        if raw[pos : pos + 2] == b"\x1f\x8b":
            # gzip member(s) at a record boundary: inflate into a NEW
            # current segment, keep the plain tail where it is — handles
            # .warc.gz wholesale AND mixed shards where plain and gzip
            # members interleave
            dec, next_pos, drop_tail = _gunzip_members_at(raw, pos)
            if not dec and drop_tail:
                # nothing inflatable here: a FALSE magic inside a garbage
                # region (or a corrupt member with no salvageable prefix) —
                # resync past it instead of truncating what follows
                pos = _resync(raw, pos + 2)
                continue
            if drop_tail:
                # corrupt member mid-stream: salvage what inflated, drop
                # the unusable remainder (and everything queued after it)
                pending.clear()
                raw, pos, n = dec, 0, len(dec)
                continue
            if dec:
                # the tail is parsed LATER via pending — never both queued
                # and stepped into (that double-parse yielded every
                # post-empty-member record twice, r5 review finding)
                if next_pos < n:
                    pending.insert(0, (raw, next_pos))
                raw, pos, n = dec, 0, len(dec)
            else:  # empty member(s): just step past them, tail stays current
                pos = next_pos
            continue
        end_hdr = raw.find(b"\r\n\r\n", pos)
        if end_hdr < 0:
            if pending:  # header may continue in the next segment
                raw = _merge_next(raw, pos)
                pos, n = 0, len(raw)
                continue
            break
        version, headers = _parse_header_block(raw[pos:end_hdr])
        if not version.startswith("WARC/"):
            pos = _resync(raw, pos + 1)  # strictly advances: no infinite loop
            continue
        try:
            clen = int(headers.get("content-length", "0"))
        except ValueError:
            pos = _resync(raw, pos + 1)
            continue
        body_start = end_hdr + 4
        payload = raw[body_start : body_start + clen]
        if len(payload) < clen:
            if pending:  # payload may continue in the next segment
                raw = _merge_next(raw, pos)
                pos, n = 0, len(raw)
                continue
            break  # truncated tail record: don't yield a mangled body
        pos = body_start + clen
        rec_type = headers.get("warc-type", "")
        content_type = headers.get("content-type", "")
        if content_type.startswith("application/http"):
            http_headers, body = _split_http_payload(payload)
        else:
            http_headers, body = {}, payload
        yield WarcRecord(rec_type, headers, http_headers, body)


# ---------------------------------------------------------------------------
# writer (fixtures + oracle-checked round trip)
# ---------------------------------------------------------------------------

def build_record(
    rec_type: str,
    headers: dict[str, str],
    payload: bytes,
    gzip_member: bool = False,
) -> bytes:
    lines = [f"WARC/1.0", f"WARC-Type: {rec_type}"]
    lines += [f"{k}: {v}" for k, v in headers.items()]
    lines.append(f"Content-Length: {len(payload)}")
    raw = ("\r\n".join(lines) + "\r\n\r\n").encode("utf-8") + payload + b"\r\n\r\n"
    return gzip.compress(raw) if gzip_member else raw


def build_response_record(
    url: str,
    date: str,
    record_id: str,
    body: bytes,
    mime: str = "text/html",
    gzip_member: bool = False,
) -> bytes:
    http = (
        f"HTTP/1.1 200 OK\r\nContent-Type: {mime}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("utf-8") + body
    return build_record(
        "response",
        {
            "WARC-Record-ID": record_id,
            "WARC-Target-URI": url,
            "WARC-Date": date,
            "Content-Type": "application/http; msgtype=response",
        },
        http,
        gzip_member,
    )


def build_request_record(
    url: str, date: str, record_id: str, gzip_member: bool = False
) -> bytes:
    http = f"GET {url} HTTP/1.1\r\nHost: x\r\n\r\n".encode("utf-8")
    return build_record(
        "request",
        {
            "WARC-Record-ID": record_id,
            "WARC-Target-URI": url,
            "WARC-Date": date,
            "Content-Type": "application/http; msgtype=request",
        },
        http,
        gzip_member,
    )


def build_warcinfo(date: str, gzip_member: bool = False) -> bytes:
    payload = b"software: commoncrawlnewsdataset-spark-synth\r\n"
    return build_record(
        "warcinfo",
        {"WARC-Date": date, "Content-Type": "application/warc-fields"},
        payload,
        gzip_member,
    )
