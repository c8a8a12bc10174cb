"""Unit parity tests: our column exprs / UDFs vs the reference's importable
scalar functions run in-process (SURVEY §5 strategy)."""

from __future__ import annotations

import re
from urllib.parse import urlparse

import pandas as pd
import pytest
from pyspark.sql import functions as F

from commoncrawlnewsdataset_spark.functions import urls as U
from commoncrawlnewsdataset_spark.functions import normalize as N
from commoncrawlnewsdataset_spark.functions.hashes import (
    hash_uuid_py,
    hashed_id_sql,
    hashed_id_udf,
    location_id_udf,
    location_id_py,
)
from commoncrawlnewsdataset_spark.functions.textmetrics import (
    METRIC_COLS,
    compute_metrics_py,
    with_quality_metrics,
)

URLS = [
    "https://www.zeit.de/politik/artikel-1",
    "http://news7.example.de/crawl/00042",
    "https://single-label/path",
    "https://sub.domain.co.uk/x?q=1",
    "https://PRESSE3.Example.COM:443/Artikel/9#frag",
]

TEXTS = [
    "Ein kurzer Satz. Noch einer! Und ein dritter?\nZweite Zeile mit mehr Worten hier.",
    "",
    "javascript JavaScript JAVASCRIPT\nzeile...\n• bullet line\n– dash bullet",
    "wort " * 100,
    "123 456 !!! abc\nmehr text…",
    "Ümlaut wörter größe straße\nSecond line ends with ellipsis...",
]


def test_tld_x1_parity(spark):
    """X1 vs reference extract_top_level_domain (03_extract_text.py:25-35)."""

    def ref_x1(url):
        parsed = urlparse(url)
        parts = parsed.netloc.split(".")
        if len(parts) > 1:
            return "." + parts[-1]
        return parts[0]

    # ports and casing differ between urlparse-netloc and parse_url(HOST);
    # parity asserted on the port-free lowercase urls (engine contract).
    plain = [u for u in URLS if ":443" not in u]
    df = spark.createDataFrame([(u,) for u in plain], ["url"])
    got = {
        r["url"]: r["tld"]
        for r in df.select("url", U.extract_top_level_domain(F.col("url")).alias("tld")).collect()
    }
    for u in plain:
        assert got[u] == ref_x1(u), u


def test_tld_x2_x3(spark, ref_sqlite):
    hosts = ["www.zeit.de", "bbc.co.uk", "abc.net.au", "plain"]
    df = spark.createDataFrame([(h,) for h in hosts], ["hostname"])
    rows = df.select(
        "hostname",
        U.extract_tld(F.col("hostname")).alias("x2"),
        U.extract_tld_two_level(F.col("hostname")).alias("x3"),
    ).collect()
    for r in rows:
        assert r["x2"] == ref_sqlite.extract_tld(r["hostname"])
    by_host = {r["hostname"]: r["x3"] for r in rows}
    assert by_host["bbc.co.uk"] == "co.uk"
    assert by_host["abc.net.au"] == "net.au"
    assert by_host["www.zeit.de"] == "de"


def test_strip_uuid_parity(spark, ref_sqlite):
    ids = ["<urn:uuid:abc-123>", "plain-id", "<urn:uuid:>"]
    df = spark.createDataFrame([(i,) for i in ids], ["id"])
    got = {r["id"]: r["s"] for r in df.select("id", U.strip_uuid(F.col("id")).alias("s")).collect()}
    for i in ids:
        assert got[i] == ref_sqlite.strip_uuid(i), i


def test_hashes_bit_exact(spark, ref_sqlite):
    """X7/X8 vs reference hash_uuid / location_id lambda (08_sqlite_setup.py:28-30,82)."""
    vals = ["abc", "4cf0-aaaa", "berlin", "münchen", ""]
    for v in vals:
        assert hash_uuid_py(v) == ref_sqlite.hash_uuid(v)
    import hashlib

    for v in vals:
        assert location_id_py(v) == int(hashlib.sha1(v.encode()).hexdigest(), 16) % (10**8)

    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    rows = df.select(
        "s",
        hashed_id_udf(F.col("s")).alias("h_udf"),
        hashed_id_sql(F.col("s")).alias("h_sql"),
        location_id_udf(F.col("s")).alias("loc"),
    ).collect()
    for r in rows:
        assert r["h_udf"] == ref_sqlite.hash_uuid(r["s"])
        assert r["h_sql"] == ref_sqlite.hash_uuid(r["s"])  # pure-SQL fold matches
        assert r["loc"] == location_id_py(r["s"])


def test_quality_metrics_bit_exact(spark, ref_quality):
    """X5: vectorized UDF == reference compute_metrics, all 8 fields."""
    for t in TEXTS:
        ours = compute_metrics_py(t)
        ref = ref_quality.compute_metrics(t)
        assert ours == ref, t

    df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    rows = with_quality_metrics(df).collect()
    for r in rows:
        ref = ref_quality.compute_metrics(r["text"])
        for c in METRIC_COLS:
            assert r[c] == pytest.approx(ref[c], abs=0), (c, r["text"])


def test_normalizations_distinct_variants(spark):
    samples = ["Frankfurt am Main!", "München?", "St. Pauli-Nord", "BER LIN  2024", "Łódź"]
    df = spark.createDataFrame([(s,) for s in samples], ["loc"])
    rows = df.select(
        "loc",
        N.normalize_loc_ner(F.col("loc")).alias("x9"),
        N.normalize_loc_geocode(F.col("loc")).alias("x10"),
        N.normalize_loc_sqlite(F.col("loc")).alias("x10b"),
    ).collect()
    for r in rows:
        assert r["x9"] == N.normalize_loc_ner_py(r["loc"])
        assert r["x10"] == N.normalize_loc_geocode_py(r["loc"])
        assert r["x10b"] == N.normalize_loc_sqlite_py(r["loc"])
    by = {r["loc"]: r for r in rows}
    # the variants genuinely differ (digits: kept by X9 \w, dropped by X10)
    assert by["BER LIN  2024"]["x9"] != by["BER LIN  2024"]["x10"]


def test_canonicalize_url(spark):
    df = spark.createDataFrame([(u,) for u in URLS], ["url"])
    got = {
        r["url"]: r["c"]
        for r in df.select("url", U.canonicalize_url(F.col("url")).alias("c")).collect()
    }
    assert got["https://PRESSE3.Example.COM:443/Artikel/9#frag"] == (
        "https://presse3.example.com/Artikel/9"
    )
    assert got["https://www.zeit.de/politik/artikel-1"] == "https://www.zeit.de/politik/artikel-1"


def test_compression_ratio_signal(spark):
    """Repetitive/templated text compresses far below natural-ish prose;
    empty text gets the neutral 1.0."""
    from commoncrawlnewsdataset_spark.functions.quality import with_compression_ratio

    docs = spark.createDataFrame(
        [
            (1, "spam " * 400),
            (2, " ".join(f"word{i} distinct token {i * 7 % 13}" for i in range(200))),
            (3, ""),
            (4, None),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["compression_ratio"]
           for r in with_compression_ratio(docs).collect()}
    assert got[1] < 0.05          # pure template collapses
    assert got[2] > 3 * got[1]    # varied text compresses far less
    assert got[3] == 1.0 and got[4] == 1.0


def test_trafilatura_adapter_contract(monkeypatch):
    """X4 real branch: when trafilatura is importable, extract_one must call
    it with the reference's EXACT kwargs (03_extract_text.py:54-58) and map
    fields raw_text->text / filedate->date_crawled (03:63-75); falsy
    extraction -> None row.  Verified against a mock module since the
    package is absent in this container."""
    import importlib
    import json as js
    import sys
    import types

    calls = {}
    fake = types.ModuleType("trafilatura")

    def fake_extract(html, **kwargs):
        calls["kwargs"] = dict(kwargs)
        return js.dumps({
            "raw_text": "body text", "excerpt": "ex", "date": "2024-01-01",
            "tags": "t1", "categories": "c1", "title": "T",
            "filedate": "2024-01-02", "hostname": "h.example",
        })

    fake.extract = fake_extract
    import commoncrawlnewsdataset_spark.functions.extract as ex
    monkeypatch.setitem(sys.modules, "trafilatura", fake)
    importlib.reload(ex)
    try:
        assert ex.HAVE_TRAFILATURA
        out = ex.extract_one(b"<html><p>x</p></html>", "https://h.example/p")
        assert calls["kwargs"] == {
            "include_comments": False, "deduplicate": True,
            "output_format": "json", "with_metadata": True,
        }
        assert out == {
            "text": "body text", "excerpt": "ex", "date": "2024-01-01",
            "tags": "t1", "categories": "c1", "title": "T",
            "date_crawled": "2024-01-02", "hostname": "h.example",
        }
        fake.extract = lambda html, **k: None
        assert ex.extract_one(b"<html></html>", "u") is None
    finally:
        del sys.modules["trafilatura"]
        importlib.reload(ex)
    assert not ex.HAVE_TRAFILATURA  # fallback restored for the other tests


def test_spacy_ner_adapter_contract(spark, tmp_path):
    """V5 real branch: make_spacy_ner_udf must spacy.load(model_path) and
    keep exactly the ents with label_ == 'city_names'
    (06_named_entity_recognition.py:49-51,96).  A fake spacy module is
    shipped to the python workers via addPyFile; the fake encodes the
    loaded path into its entity text so the assertion proves the argument
    arrived."""
    from pyspark.sql import functions as F2

    from commoncrawlnewsdataset_spark.ner import make_spacy_ner_udf

    (tmp_path / "spacy.py").write_text(
        "class _Ent:\n"
        "    def __init__(self, text, label): self.text, self.label_ = text, label\n"
        "class _Doc:\n"
        "    def __init__(self, ents): self.ents = ents\n"
        "class _Nlp:\n"
        "    def __init__(self, path): self.path = path\n"
        "    def __call__(self, text):\n"
        "        return _Doc([_Ent(self.path + '::' + text[:6], 'city_names'),\n"
        "                     _Ent('dropped', 'org_names')])\n"
        "def load(path): return _Nlp(path)\n"
    )
    spark.sparkContext.addPyFile(str(tmp_path / "spacy.py"))
    udf = make_spacy_ner_udf("/models/city_v2")
    df = spark.createDataFrame([("Berlin calling",), (None,)], ["text"])
    rows = df.select(udf(F2.col("text")).alias("loc")).collect()
    assert rows[0]["loc"] == ["/models/city_v2::Berlin"]  # load(path) + label filter
    assert rows[1]["loc"] == []                           # null text -> []


def test_st_encoder_adapter_contract(spark, tmp_path):
    """V1 real branch: make_st_encoder_udf must construct
    SentenceTransformer(<reference model id>, device=..., model_kwargs=...)
    and call encode(normalize_embeddings=True, prompt='passage: ')
    (09_embedding_transformation.py:11-13).  The fake model encodes every
    received argument into the output vector so the collected values prove
    each kwarg arrived on the worker."""
    from pyspark.sql import functions as F2

    from commoncrawlnewsdataset_spark.plans.embed import make_st_encoder_udf

    (tmp_path / "sentence_transformers.py").write_text(
        "import numpy as np\n"
        "class SentenceTransformer:\n"
        "    def __init__(self, name, device=None, model_kwargs=None):\n"
        "        self.name, self.device, self.mk = name, device, model_kwargs\n"
        "    def encode(self, texts, normalize_embeddings=False, prompt=''):\n"
        "        return np.array([[float(len(self.name)),\n"
        "                          1.0 if normalize_embeddings else 0.0,\n"
        "                          float(len(prompt)),\n"
        "                          1.0 if self.device == 'cuda' else 0.0,\n"
        "                          1.0 if self.mk == {'torch_dtype': 'float16'} else 0.0,\n"
        "                          float(len(t))] for t in texts], dtype=np.float32)\n"
    )
    spark.sparkContext.addPyFile(str(tmp_path / "sentence_transformers.py"))
    udf = make_st_encoder_udf(device="cuda", model_kwargs={"torch_dtype": "float16"})
    df = spark.createDataFrame([("hello",)], ["text"])
    vec = df.select(udf(F2.col("text")).alias("e")).first()["e"]
    ref_model = "mixedbread-ai/deepset-mxbai-embed-de-large-v1"
    assert vec == [float(len(ref_model)), 1.0, float(len("passage: ")), 1.0, 1.0, 5.0]


def test_pil_resize_adapter_contract(spark, tmp_path):
    """Multimodal resize real branch: make_pil_resize_udf must decode with
    PIL.Image.open, thumbnail((max_w, max_h), Resampling[resample]) and
    re-encode PNG — proven against a mock PIL shipped to the workers whose
    fake image encodes every received argument into the output bytes."""
    from pyspark.sql import functions as F2

    from commoncrawlnewsdataset_spark.operators.multimodal import (
        PIL_RESIZE_SCHEMA,
        make_pil_resize_udf,
    )

    (tmp_path / "PIL.py").write_text(
        "class _Resampling:\n"
        "    LANCZOS = 'LANCZOS-MARKER'\n"
        "class _Img:\n"
        "    def __init__(self, data): self.data, self.size = data, (999, 999)\n"
        "    def thumbnail(self, box, rs):\n"
        "        self.box, self.rs, self.size = box, rs, box\n"
        "    def save(self, buf, format=None):\n"
        "        buf.write(self.data + ('|' + str(format) + '|' + str(self.box)\n"
        "                  + '|' + str(self.rs)).encode())\n"
        "class Image:\n"
        "    Resampling = _Resampling\n"
        "    @staticmethod\n"
        "    def open(bio): return _Img(bio.read())\n"
    )
    spark.sparkContext.addPyFile(str(tmp_path / "PIL.py"))
    media = spark.createDataFrame(
        [("m1", b"RAWBYTES")], "media_id string, payload binary"
    )
    gen = make_pil_resize_udf(max_w=48, max_h=32)
    row = media.mapInPandas(gen, PIL_RESIZE_SCHEMA).first()
    assert (row["out_w"], row["out_h"]) == (48, 32)
    assert bytes(row["resized"]) == b"RAWBYTES|PNG|(48, 32)|LANCZOS-MARKER"


def test_token_estimate_subword_budget(spark):
    """token_estimate (VERDICT r5 #3): letter runs ceil(len/4), digit runs
    ceil(len/3), 1 per other symbol; null/empty -> 0; unicode letters count
    as letter runs (CJK ~1 token/char via short runs)."""
    from commoncrawlnewsdataset_spark.functions.textmetrics import token_estimate

    rows = [
        (1, "hello"),            # ceil(5/4) = 2
        (2, "hi"),               # 1
        (3, "12345"),            # ceil(5/3) = 2
        (4, "a.b,c"),            # 1+1+1+1+1 = 5
        (5, ""),                 # 0
        (6, None),               # 0
        (7, "héllo wörld"),      # 2 + 2 (unicode letters in runs)
        (8, "internationalization"),  # ceil(20/4) = 5
    ]
    df = spark.createDataFrame(rows, ["i", "text"])
    got = {r["i"]: r["t"] for r in df.select("i", token_estimate(F.col("text")).alias("t")).collect()}
    assert got == {1: 2, 2: 1, 3: 2, 4: 5, 5: 0, 6: 0, 7: 4, 8: 5}
