"""Deterministic synthetic data generators (pure functions of seed + scale).

No external data: these fabricate Common-Crawl-style fixtures per FIXTURES.md —
`pages` rows in the BASELINE.json input_hint shape, frontier seed lists,
robots rules, a gazetteer stub.  Host draw is Zipf-skewed (one hot host far
larger than the rest) so the politeness window and skew handling are actually
exercised, mirroring the reference's month-sharded CC-NEWS layout
(Project_Scripts/01_download_newscrawl.py:41-43).
"""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd

# Deterministic stand-ins for the external services the reference calls.
CITY_GAZETTEER = [
    ("Berlin", 52.52, 13.405),
    ("München", 48.1375, 11.575),
    ("Hamburg", 53.5503, 9.9937),
    ("Köln", 50.9375, 6.9603),
    ("Frankfurt am Main", 50.1106, 8.6822),
    ("Stuttgart", 48.7758, 9.1829),
    ("Düsseldorf", 51.2254, 6.7763),
    ("Leipzig", 51.3397, 12.3731),
    ("Dresden", 51.0504, 13.7373),
    ("Nürnberg", 49.4539, 11.0773),
]

GERMAN_FILLER = (
    "Die Regierung hat heute neue Maßnahmen angekündigt. "
    "Viele Bürger sind von der Entscheidung betroffen. "
    "Experten erwarten weitere Entwicklungen in den kommenden Wochen. "
    "Die Wirtschaft reagierte zunächst verhalten auf die Nachricht. "
)

ENGLISH_FILLER = (
    "The council announced new measures today. "
    "Many residents are affected by the decision. "
    "Experts expect further developments in the coming weeks. "
    "Markets reacted cautiously to the news. "
)

MONTHS = ["2024-01", "2024-02", "2024-03"]


def _host(rng: random.Random, n_hosts: int, zipf_s: float = 1.3) -> str:
    """Zipf-skewed host draw: host0 is the hot host."""
    weights = [1.0 / (i + 1) ** zipf_s for i in range(n_hosts)]
    idx = rng.choices(range(n_hosts), weights=weights, k=1)[0]
    return f"news{idx}.example.de" if idx % 3 else f"presse{idx}.example.com"


def make_pages_pdf(n: int = 1000, seed: int = 42, n_hosts: int = 20) -> pd.DataFrame:
    """Deterministic `pages` rows (url, warc_ts, html, text, lang).

    Includes: Zipf-skewed hosts, 3 months of warc_ts, HTML with title/body/meta,
    rows whose body is empty (extractor must reject), exact near-duplicate
    bodies on different hosts (dedup fixture, ref 03_extract_text.py:80), and
    embedded gazetteer city names (NER fixture, ref 06:48-50).
    """
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        host = _host(rng, n_hosts)
        month = MONTHS[i % len(MONTHS)]
        day = 1 + (i % 27)
        ts = dt.datetime.fromisoformat(f"{month}-{day:02d}T{(i * 7) % 24:02d}:00:00")
        url = f"https://{host}/artikel/{i:06d}"
        lang = "de" if i % 5 else "en"
        filler = GERMAN_FILLER if lang == "de" else ENGLISH_FILLER
        city = CITY_GAZETTEER[i % len(CITY_GAZETTEER)][0]
        title = f"Nachricht {i} aus {city}"
        # every 41st row: empty body -> extractor must yield null text
        if i % 41 == 17:
            body = ""
        # every 23rd row: duplicate the body of row i-1 (near-dup fixture)
        elif i % 23 == 11 and rows:
            body = rows[-1]["_body"]
        else:
            nsent = 2 + (i % 6)
            body = f"In {city} gab es neue Entwicklungen. " + filler * nsent
        html = (
            "<html><head>"
            f"<title>{title}</title>"
            f'<meta name="date" content="{month}-{day:02d}">'
            "</head><body>"
            + ("" if not body else f"<p>{body}</p>")
            + "</body></html>"
        ).encode("utf-8")
        rows.append(
            {
                "url": url,
                "warc_ts": ts,
                "html": html,
                "text": body or None,
                "lang": lang,
                "_body": body,
            }
        )
    pdf = pd.DataFrame(rows).drop(columns=["_body"])
    return pdf


def make_seeds_pdf(n: int = 500, seed: int = 7, n_hosts: int = 12) -> pd.DataFrame:
    """Frontier seed list: urls with host contention, duplicate urls, priority ties."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        host = _host(rng, n_hosts)
        url = f"https://{host}/crawl/{i % (n * 3 // 4):05d}"  # ~25% duplicate urls
        rows.append(
            {
                "url": url,
                "priority": float(rng.choice([0.1, 0.5, 0.5, 0.9])),  # ties on purpose
                "discovered_ts": dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i),
            }
        )
    return pd.DataFrame(rows)


def make_robots_pdf(n_hosts: int = 12, seed: int = 11) -> pd.DataFrame:
    """Per-host robots rules: every 4th host disallows /crawl/0*, varying crawl delays."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_hosts):
        host = f"news{i}.example.de" if i % 3 else f"presse{i}.example.com"
        rows.append(
            {
                "host": host,
                "path_prefix": "/crawl/0" if i % 4 == 1 else "/private/",
                "allowed": False,
                "crawl_delay_s": float(rng.choice([0.5, 1.0, 2.0])),
            }
        )
    return pd.DataFrame(rows)


def make_gazetteer_pdf() -> pd.DataFrame:
    from commoncrawlnewsdataset_spark.functions.normalize import normalize_loc_geocode_py

    return pd.DataFrame(
        [
            {"loc_normal": normalize_loc_geocode_py(name), "latitude": lat, "longitude": lon}
            for name, lat, lon in CITY_GAZETTEER
        ]
    )


def make_nuts_pdf() -> pd.DataFrame:
    """Rectangle 'polygons' covering the gazetteer coords, with nested levels
    so the max-LEVL_CODE rule is exercised (ref 07_geocode_news.py:85-92)."""
    rows = [
        # country-level rectangle covering all of Germany-ish
        {"NUTS_ID": "DE", "LEVL_CODE": 0, "NUTS_NAME": "Deutschland",
         "min_lon": 5.0, "min_lat": 47.0, "max_lon": 15.5, "max_lat": 55.5},
    ]
    for i, (name, lat, lon) in enumerate(CITY_GAZETTEER):
        rows.append(
            {
                "NUTS_ID": f"DE{i:01d}{i % 10}{i % 10}",
                "LEVL_CODE": 3,
                "NUTS_NAME": name,
                "min_lon": lon - 0.2,
                "min_lat": lat - 0.2,
                "max_lon": lon + 0.2,
                "max_lat": lat + 0.2,
            }
        )
    return pd.DataFrame(rows)
