"""X14 — geocoding enrichment with the reference's rate-limit semantics.

Reference: Nominatim via geopy RateLimiter — 1 req/s, 3 retries, 2 s error
wait, query = loc_normal + ", Germany" (07_geocode_news.py:146-176).

Two paths:

- tests/offline: the gazetteer stub broadcast join
  (plans/pipeline.py::build_geomap) — deterministic, no network.
- production: ``geocode_rate_limited`` — a mapInPandas stage over a
  SINGLE-partition repartition.  An external API capped at 1 req/s is
  inherently sequential, so the correct Spark shape is coalesce-to-one for
  THIS stage only (the count>100 gate before it keeps the input tiny — the
  same work-bound the reference relies on, 07:142-143); everything upstream
  and downstream stays parallel.  The geocoder callable is injectable (geopy
  import happens per worker, gated), and the rate limit is enforced by
  budget arithmetic on call timestamps, not sleeps between Spark tasks.
"""

from __future__ import annotations

import time
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

GEOCODED_SCHEMA = StructType(
    [
        StructField("loc_normal", StringType()),
        StructField("latitude", DoubleType()),
        StructField("longitude", DoubleType()),
    ]
)


def make_nominatim_geocoder(user_agent: str):  # pragma: no cover - needs geopy+network
    """Per-worker geopy construction (reference kwargs, 07:146-155)."""
    from geopy.extra.rate_limiter import RateLimiter
    from geopy.geocoders import Nominatim

    geolocator = Nominatim(user_agent=user_agent, timeout=10)
    geocode = RateLimiter(
        geolocator.geocode,
        min_delay_seconds=1,
        max_retries=3,
        error_wait_seconds=2.0,
        swallow_exceptions=False,
    )

    def lookup(q: str):
        loc = geocode(q)
        return (loc.latitude, loc.longitude) if loc else None

    return lookup


def geocode_rate_limited(
    locations: DataFrame,
    geocoder: Callable[[str], tuple[float, float] | None] | None = None,
    suffix: str = ", Germany",
    min_delay_s: float = 1.0,
    sleeper: Callable[[float], None] = time.sleep,
) -> DataFrame:
    """locations(loc_normal, ...) -> (loc_normal, latitude, longitude).

    Failed lookups yield nulls (reference sets None and continues,
    07:171-176).  `geocoder`/`sleeper` injectable for offline tests."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lookup = geocoder or make_nominatim_geocoder("ccnews-spark")
        last_call = 0.0
        for pdf in batches:
            lats, lons = [], []
            for loc in pdf["loc_normal"]:
                wait = min_delay_s - (time.monotonic() - last_call)
                if wait > 0:
                    sleeper(wait)
                last_call = time.monotonic()
                try:
                    hit = lookup(loc + suffix)
                except Exception:
                    hit = None
                lats.append(hit[0] if hit else None)
                lons.append(hit[1] if hit else None)
            yield pd.DataFrame(
                {"loc_normal": pdf["loc_normal"], "latitude": lats, "longitude": lons}
            )

    # inherently-sequential external API: one partition for THIS stage only
    return locations.select("loc_normal").repartition(1).mapInPandas(gen, GEOCODED_SCHEMA)
