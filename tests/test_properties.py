"""Property-based parity tests (hypothesis): the reference's scalar functions
run in-process as oracles against our implementations over generated inputs —
much stronger coverage of edge cases (unicode, whitespace runs, boundary
punctuation) than fixture rows."""

from __future__ import annotations

import hashlib

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
