"""robots.txt gating (north_rule requirement; the reference has none — it
downloads from Common Crawl's own bucket, so zero robots handling exists in
/root/reference; kept behind a flag so reference-parity mode disables it).

Rules live in a small dimension table (host, path_prefix, allowed,
crawl_delay_s) and gate the frontier via a broadcast prefix-match anti-join.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_robots_txt(host: str, body: str, agent: str = "*") -> list[dict]:
    """Minimal robots.txt parser -> rule rows for the dimension table.
    Only Disallow/Allow/Crawl-delay of the matching agent group."""
    rules: list[dict] = []
    active = False
    delay = None
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            active = val == agent or val == "*"
        elif active and key in ("disallow", "allow") and val:
            rules.append(
                {"host": host, "path_prefix": val, "allowed": key == "allow",
                 "crawl_delay_s": None}
            )
        elif active and key == "crawl-delay":
            try:
                delay = float(val)
            except ValueError:
                pass
    if delay is not None:
        for r in rules:
            r["crawl_delay_s"] = delay
        if not rules:
            rules.append({"host": host, "path_prefix": "", "allowed": True,
                          "crawl_delay_s": delay})
    return rules


def gate_by_robots(frontier: DataFrame, rules: DataFrame) -> DataFrame:
    """Drop URLs whose path matches a disallow prefix for their host.
    Broadcast anti-join: the rules dim is per-host-tiny by construction."""
    disallow = rules.filter(~F.col("allowed")).select(
        F.col("host").alias("_r_host"), F.col("path_prefix").alias("_r_prefix")
    )
    path = F.regexp_replace(F.col("url"), r"^[a-zA-Z]+://[^/]+", "")
    return (
        frontier.withColumn("_path", path)
        .join(
            F.broadcast(disallow),
            (F.col("host") == F.col("_r_host"))
            & F.col("_path").startswith(F.col("_r_prefix")),
            "left_anti",
        )
        .drop("_path")
    )


def host_crawl_delays(rules: DataFrame) -> DataFrame:
    """Per-host max crawl delay -> feeds the per-host budget arithmetic
    (budget = wave_seconds / crawl_delay, analog of the reference's 1 rps
    geocode RateLimiter, 07_geocode_news.py:149-155)."""
    return rules.groupBy("host").agg(F.max("crawl_delay_s").alias("crawl_delay_s"))
