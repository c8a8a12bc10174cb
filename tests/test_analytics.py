"""Reference ad-hoc analytics (ner_content.py shapes) + http fetcher retry
semantics (injected fakes; no network)."""

from __future__ import annotations

from pyspark.sql import functions as F

from commoncrawlnewsdataset_spark.plans.analytics import (
    ambiguous_locations,
    nuts3_top10,
    tld_distribution,
    top_locations_per_hostname,
)


def _ner_fixture(spark):
    rows = [
        ("a.zeit.de", ["Berlin", "München"]),
        ("a.zeit.de", ["Berlin"]),
        ("b.bbc.co.uk", ["Berlin!"]),
        ("b.bbc.co.uk", ["Hamburg"]),
        ("c.abc.net.au", ["Berlin"]),
        ("c.abc.net.au", ["Köln", "Köln?"]),
    ]
    return spark.createDataFrame(rows, ["hostname", "loc"])


def test_tld_distribution_two_level(spark):
    out = {r["tld"]: r["count"] for r in tld_distribution(_ner_fixture(spark)).collect()}
    assert out == {"de": 2, "co.uk": 2, "net.au": 2}


def test_top_locations_per_hostname(spark):
    out = top_locations_per_hostname(_ner_fixture(spark), k=1).collect()
    best = {r["hostname"]: (r["loc"], r["n"]) for r in out}
    assert best["a.zeit.de"] == ("berlin", 2)
    assert best["c.abc.net.au"] == ("köln", 2)  # 'Köln?' normalizes into 'köln'


def test_ambiguous_locations(spark):
    out = {r["loc"]: r["n_tlds"] for r in ambiguous_locations(_ner_fixture(spark), 2).collect()}
    assert out == {"berlin": 3}  # berlin appears on all three TLDs


def test_nuts3_top10(spark):
    geomap = spark.createDataFrame(
        [("berlin", 500, "DE300", "Berlin"), ("kreuzberg", 200, "DE300", "Berlin"),
         ("münchen", 300, "DE212", "München"), ("nowhere", 50, None, None),
         ("country-only", 80, "DE", "Deutschland")],
        ["loc_normal", "count", "NUTS", "GEN"],
    )
    out = [(r["NUTS"], r["mentions"]) for r in nuts3_top10(geomap).collect()]
    assert out == [("DE300", 700), ("DE212", 300)]  # level-3 codes only


def test_http_fetcher_retry_backoff_semantics():
    """Reference semantics (01_download_newscrawl.py:51-69): N attempts,
    exponential backoff x2, only RequestException retried, backoff sleep runs
    after EVERY failed attempt including the last — with injected fakes."""
    import requests

    from commoncrawlnewsdataset_spark.frontier.waves import make_http_fetcher

    calls = {"n": 0}
    sleeps: list[float] = []

    class FakeResp:
        def raise_for_status(self):
            if calls["n"] < 3:
                raise requests.exceptions.HTTPError("boom")

        def iter_content(self, chunk_size):
            yield b"x" * 100

    class FakeSession:
        def get(self, url, stream, timeout):
            calls["n"] += 1
            return FakeResp()

    fetch = make_http_fetcher(
        backoff_s=10.0, session_factory=FakeSession, sleeper=sleeps.append
    )
    ok, attempts, n, body = fetch("https://x.example/1", 5)
    assert ok and attempts == 3 and n == 100 and body is None
    assert sleeps == [10.0, 20.0]  # exponential x2 from 10s, stops on success

    calls["n"] = -100  # always failing
    sleeps.clear()
    ok, attempts, n, body = fetch("https://x.example/2", 4)
    assert not ok and attempts == 4 and n == 0 and body is None
    # the reference sleeps after the final failed attempt too (01:66-68)
    assert sleeps == [10.0, 20.0, 40.0, 80.0]

    # keep_content=True returns the body for the pages sink
    calls["n"] = 100  # always succeeding
    fetch_c = make_http_fetcher(
        backoff_s=10.0, session_factory=FakeSession, sleeper=sleeps.append,
        keep_content=True,
    )
    ok, attempts, n, body = fetch_c("https://x.example/3", 5)
    assert ok and body == b"x" * 100 and n == 100

    # non-RequestException errors are bugs and propagate (reference catches
    # only requests.exceptions.RequestException)
    class BoomResp:
        def raise_for_status(self):
            raise RuntimeError("not a network error")

    class BoomSession:
        def get(self, url, stream, timeout):
            return BoomResp()

    fetch_b = make_http_fetcher(session_factory=BoomSession, sleeper=sleeps.append)
    try:
        fetch_b("https://x.example/4", 2)
        raise AssertionError("RuntimeError should propagate")
    except RuntimeError:
        pass


def test_geocode_rate_limited_injectable(spark):
    """X14 production shape with an injected offline geocoder: suffix
    appended, failures -> nulls, single-partition stage."""
    from commoncrawlnewsdataset_spark.geocode import geocode_rate_limited

    table = {"berlin, Germany": (52.52, 13.405), "münchen, Germany": (48.14, 11.58)}

    def fake(q):
        if q == "fails, Germany":
            raise RuntimeError("api down")
        return table.get(q)

    locs = spark.createDataFrame(
        [("berlin",), ("münchen",), ("unknown",), ("fails",)], ["loc_normal"]
    )
    out = geocode_rate_limited(locs, geocoder=fake, min_delay_s=0.0)
    assert out.rdd.getNumPartitions() == 1  # sequential API -> one partition
    got = {r["loc_normal"]: (r["latitude"], r["longitude"]) for r in out.collect()}
    assert got["berlin"] == (52.52, 13.405)
    assert got["unknown"] == (None, None)
    assert got["fails"] == (None, None)
