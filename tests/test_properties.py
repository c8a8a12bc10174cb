"""Property-based parity tests (hypothesis): the reference's scalar functions
run in-process as oracles against our implementations over generated inputs —
much stronger coverage of edge cases (unicode, whitespace runs, boundary
punctuation) than fixture rows."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from hypothesis import given, settings, strategies as st

from commoncrawlnewsdataset_spark.functions.hashes import hash_uuid_py, location_id_py
from commoncrawlnewsdataset_spark.functions.normalize import (
    normalize_loc_geocode_py,
    normalize_loc_ner_py,
    normalize_loc_sqlite_py,
)
from commoncrawlnewsdataset_spark.functions.textmetrics import compute_metrics_py
from tests.conftest import load_reference_module

TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("L", "N", "P", "Z", "S"), include_characters="\n…•–"
    ),
    max_size=400,
)


@settings(max_examples=150, deadline=None)
@given(TEXT)
def test_quality_metrics_property_parity(text):
    ref = load_reference_module(
        "Project_Scripts/04_compute_quality_metrics.py", "ref_quality_prop"
    )
    assert compute_metrics_py(text) == ref.compute_metrics(text)


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=100))
def test_hash_property_parity(s):
    ref = load_reference_module("Project_Scripts/08_sqlite_setup.py", "ref_sqlite_prop")
    assert hash_uuid_py(s) == ref.hash_uuid(s)
    assert location_id_py(s) == int(hashlib.sha1(s.encode()).hexdigest(), 16) % 10**8
    assert ref.strip_uuid(s) == (
        s[10:-1] if s.startswith("<urn:uuid:") and s.endswith(">") and len(s) > 10 else s
    )


@settings(max_examples=150, deadline=None)
@given(TEXT)
def test_normalization_output_invariants(text):
    """Shape invariants of the reference regexes.  (True idempotence does NOT
    hold — e.g. 'İ'.lower() introduces a combining mark the X9 class would
    strip on a second pass; the reference applies each normalization once.)"""
    ner = normalize_loc_ner_py(text)
    assert ner == ner.strip() and "  " not in ner  # collapsed + trimmed
    geo = normalize_loc_geocode_py(text)
    allowed_geo = set("abcdefghijklmnopqrstuvwxyzäöüß'- ")
    assert set(geo) <= allowed_geo and geo == geo.strip()
    sql = normalize_loc_sqlite_py(text)
    allowed_sql = set("abcdefghijklmnopqrstuvwxyzäöüß' ")
    assert set(sql) <= allowed_sql and sql == sql.strip()


def test_spark_metrics_property_batch(spark, ref_quality):
    """One Spark round-trip over a hypothesis-shaped corpus: the vectorized
    UDF equals the reference function on every generated row."""
    import random

    rng = random.Random(99)
    alphabet = "aä bö.!?\n…•–123  JavaScript\tx"
    corpus = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 200)))
        for _ in range(200)
    ]
    from commoncrawlnewsdataset_spark.functions.textmetrics import (
        METRIC_COLS,
        with_quality_metrics,
    )

    df = spark.createDataFrame([(t,) for t in corpus], ["text"])
    for r in with_quality_metrics(df).collect():
        expected = ref_quality.compute_metrics(r["text"])
        for c in METRIC_COLS:
            assert r[c] == expected[c], (c, repr(r["text"]))


@given(
    st.lists(
        st.tuples(
            st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=40),
            st.binary(max_size=500),
            st.booleans(),
        ),
        min_size=0,
        max_size=6,
    ),
    st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_warc_roundtrip_property(records, gz):
    """Any payload bytes (including CRLFs, fake record headers, gzip magic)
    survive a write->parse round trip byte-identically; non-response records
    never surface as responses."""
    from commoncrawlnewsdataset_spark.sources.warc import (
        build_request_record,
        build_response_record,
        iter_warc_records,
    )

    date = "2024-01-01T00:00:00Z"
    blob = b""
    expected = []
    for i, (path, body, is_response) in enumerate(records):
        url = f"https://prop.example/{path}/{i}"
        if is_response:
            blob += build_response_record(url, date, f"<urn:uuid:{i}>", body, gzip_member=gz)
            expected.append((url, body))
        else:
            blob += build_request_record(url, date, f"<urn:uuid:r{i}>", gzip_member=gz)
    got = [
        (r.header("WARC-Target-URI"), r.content)
        for r in iter_warc_records(blob)
        if r.rec_type == "response"
    ]
    assert got == expected


def test_canonicalize_url_idempotent_batch(spark):
    """canonicalize(canonicalize(u)) == canonicalize(u) for a fuzzed batch of
    url shapes — required for the URL-seen key to stay stable when discovered
    urls re-enter the frontier already canonicalized."""
    import random

    from pyspark.sql import functions as F

    from commoncrawlnewsdataset_spark.functions.urls import canonicalize_url

    rng = random.Random(17)
    chars = "abcXYZ09._~%-/"
    urls = []
    for i in range(300):
        scheme = rng.choice(["http", "https", "HTTP", "Https", "ftp"])
        host = "".join(rng.choice("abcXYZ09.-") for _ in range(rng.randint(1, 15))).strip(".") or "h"
        port = rng.choice(["", ":80", ":443", ":8080"])
        path = "".join(rng.choice(chars) for _ in range(rng.randint(0, 25)))
        frag = rng.choice(["", "#frag", "#a#b"])
        urls.append(f"{scheme}://{host}{port}/{path}{frag}")
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    once = df.select("url", canonicalize_url(F.col("url")).alias("c1"))
    twice = once.select("url", "c1", canonicalize_url(F.col("c1")).alias("c2"))
    rows = twice.collect()
    for r in rows:
        assert r["c1"] == r["c2"], (r["url"], r["c1"], r["c2"])
        assert "#" not in r["c1"]
        netloc = r["c1"].split("/")[2] if "://" in r["c1"] else ""
        scheme = r["url"].split(":")[0].lower()
        if r["url"].split("#")[0].split("/")[2].endswith(":8080"):
            assert netloc.endswith(":8080"), r
        if scheme == "http" and ":80" in r["url"].split("#")[0].split("/")[2]:
            assert not netloc.endswith(":80"), r


@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=2000))
@settings(max_examples=200, deadline=None)
def test_robots_parser_never_crashes(body):
    """parse_robots_txt over arbitrary text: never raises, and every emitted
    rule row is well-formed (host echoed, boolean verdict, delay None or
    float) — a crawler parses millions of hostile robots.txt files."""
    from commoncrawlnewsdataset_spark.frontier.robots import parse_robots_txt

    rows = parse_robots_txt("h.example", body, agent="ccbot")
    for r in rows:
        assert r["host"] == "h.example"
        assert isinstance(r["allowed"], bool)
        assert r["crawl_delay_s"] is None or isinstance(r["crawl_delay_s"], float)
        assert isinstance(r["path_prefix"], str)


def test_pack_sign_words_matches_numpy(spark):
    """pack_sign_words/hamming_words vs an independent numpy packing:
    random vectors (incl. zeros and negatives), words = 32-bit MSB-first
    groups of the sign bits; Hamming distance between any two vectors
    equals the numpy XOR popcount."""
    import numpy as np

    from commoncrawlnewsdataset_spark.operators.similarity import (
        hamming_words,
        pack_sign_words,
        sign_words_of,
    )

    rng = np.random.default_rng(23)
    vecs = rng.normal(size=(40, 64))
    vecs[0] = 0.0                      # all-zero edge: every sign bit 0
    vecs[1, ::2] = 0.0                 # mixed zeros
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )

    def np_words(v):
        bits = (v > 0).astype(np.uint8)
        out = []
        for w in range(0, len(bits), 32):
            acc = 0
            for b in bits[w:w + 32]:
                acc = acc * 2 + int(b)
            out.append(acc)
        return out

    got = {r["vec_id"]: r["w"] for r in
           df.select("vec_id", pack_sign_words(F.col("embedding")).alias("w")).collect()}
    for i, v in enumerate(vecs):
        assert got[i] == np_words(v), i
        assert sign_words_of([float(x) for x in v]) == np_words(v), i

    # hamming_words == numpy xor popcount, for the query vs every vector
    q = [float(x) for x in vecs[2]]
    qw = F.array(*[F.lit(w) for w in sign_words_of(q)])
    hams = {r["vec_id"]: r["h"] for r in df.select(
        "vec_id", hamming_words(pack_sign_words(F.col("embedding")), qw).alias("h")
    ).collect()}
    qb = (vecs[2] > 0).astype(np.uint8)
    for i, v in enumerate(vecs):
        assert hams[i] == int(((v > 0).astype(np.uint8) ^ qb).sum()), i


def test_pack_sign_words_partial_final_word(spark):
    """ADVICE r4 (medium): dim % 32 != 0 — pack_sign_words must zero-pad the
    final partial word (left-aligned, like sign_words_of), not truncate it
    into the low bits; otherwise stored vs query words are bit-misaligned
    and Hamming distances are silently wrong."""
    import numpy as np

    from commoncrawlnewsdataset_spark.operators.similarity import (
        hamming_words,
        pack_sign_words,
        sign_words_of,
    )

    rng = np.random.default_rng(7)
    for dim in (1, 31, 33, 50, 63):
        vecs = rng.normal(size=(12, dim))
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        )
        got = {r["vec_id"]: r["w"] for r in df.select(
            "vec_id", pack_sign_words(F.col("embedding")).alias("w")).collect()}
        for i, v in enumerate(vecs):
            assert got[i] == sign_words_of([float(x) for x in v]), (dim, i)
        # hamming over the packed words == true sign-bit hamming
        q = [float(x) for x in vecs[0]]
        qw = F.array(*[F.lit(w) for w in sign_words_of(q)])
        hams = {r["vec_id"]: r["h"] for r in df.select(
            "vec_id",
            hamming_words(pack_sign_words(F.col("embedding")), qw).alias("h"),
        ).collect()}
        qb = (vecs[0] > 0).astype(np.uint8)
        for i, v in enumerate(vecs):
            assert hams[i] == int(((v > 0).astype(np.uint8) ^ qb).sum()), (dim, i)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(st.booleans(), st.binary(min_size=0, max_size=40)),
        min_size=1, max_size=5,
    ),
    st.binary(min_size=0, max_size=60),
    st.integers(min_value=0, max_value=2),
)
def test_warc_parser_salvage_never_loses_clean_prefix(records_spec, noise, where):
    """Fuzz the from-scratch WARC reader's salvage contract: for ANY mix of
    gzip/plain members with ANY junk bytes injected after the first record
    (or appended), parsing (a) never raises, (b) recovers at least every
    record before the first corruption, and (c) never invents records."""
    from commoncrawlnewsdataset_spark.sources.warc import (
        build_response_record,
        iter_warc_records,
    )

    recs = [
        build_response_record(
            f"https://f.example/{i}", "2024-01-01T00:00:00Z",
            f"<urn:uuid:f{i}>", body or b"x", gzip_member=gz,
        )
        for i, (gz, body) in enumerate(records_spec)
    ]
    # inject noise at a record boundary (never inside record 0, so the
    # clean-prefix guarantee is exactly "record 0 always survives")
    cut = min(1 + where, len(recs))
    blob = b"".join(recs[:cut]) + noise + b"".join(recs[cut:])
    got = [r.header("WARC-Record-ID") for r in iter_warc_records(blob)]
    expected_ids = [f"<urn:uuid:f{i}>" for i in range(len(recs))]
    assert set(got) <= set(expected_ids)          # no invented records
    assert got[:cut] == expected_ids[:cut]        # clean prefix survives
    assert got == sorted(got, key=expected_ids.index)  # order preserved
