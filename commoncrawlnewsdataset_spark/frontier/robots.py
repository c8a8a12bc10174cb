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
    """robots.txt parser (RFC 9309 group semantics) -> rule rows for the
    dimension table.

    - consecutive User-agent lines share one group;
    - groups matching the SPECIFIC agent override the ``*`` groups (specific
      vs ``*`` are never merged — RFC 9309 §2.2.1 picks the most specific
      match), but ALL groups matching the SAME agent are COMBINED (§2.2.1:
      "combine the rules of every group that matches"), so a second
      ``User-agent: ccbot`` group later in the file still applies;
    - Allow/Disallow collected across the combined groups; Crawl-delay is
      the max across them (the conservative politeness choice — it is a
      non-RFC extension with no defined merge rule); precedence between
      overlapping Allow/Disallow prefixes is resolved at gate time by
      longest-match (gate_by_robots)."""
    groups: list[dict] = []  # {agents: set, rules: [(prefix, allowed)], delay}
    cur: dict | None = None
    in_agent_run = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not in_agent_run:
                cur = {"agents": set(), "rules": [], "delay": None}
                groups.append(cur)
            cur["agents"].add(val.lower())
            in_agent_run = True
            continue
        in_agent_run = False
        if cur is None:
            continue
        if key in ("disallow", "allow") and val:
            cur["rules"].append((val, key == "allow"))
        elif key == "crawl-delay":
            try:
                d = float(val)
            except ValueError:
                continue
            # hostile/broken values: float() happily parses 'nan'/'inf'/1e308,
            # and nan poisons every max()/comparison downstream while inf
            # starves the host forever — accept only sane finite delays
            # (clamped to a day, the same ceiling a polite crawler would use)
            import math

            if math.isfinite(d) and d >= 0:
                cur["delay"] = min(d, 86400.0)

    matching: list[dict] = []
    if agent != "*":
        matching = [g for g in groups if agent.lower() in g["agents"]]
    if not matching:
        matching = [g for g in groups if "*" in g["agents"]]
    if not matching:
        return []
    merged_rules = [(p, a) for g in matching for p, a in g["rules"]]
    delays = [g["delay"] for g in matching if g["delay"] is not None]
    delay = max(delays) if delays else None
    rules = [
        {"host": host, "path_prefix": p, "allowed": a, "crawl_delay_s": delay}
        for p, a in merged_rules
    ]
    if not rules and delay is not None:
        rules.append({"host": host, "path_prefix": "", "allowed": True,
                      "crawl_delay_s": delay})
    return rules


def rules_from_robots_pages(
    robots_pages: DataFrame, agent: str = "*"
) -> DataFrame:
    """Build the rules dimension from CRAWLED robots.txt bodies — the
    production path: fetch ``https://<host>/robots.txt`` through the same
    WaveRunner fetch machinery (page_sink_dir), then parse per host inside
    Arrow batches.  Input: (host string, body string); output: the
    (host, path_prefix, allowed, crawl_delay_s) dimension ``gate_by_robots``
    consumes.  Parsing is pure-Python string work over one tiny row per
    host, so mapInPandas is the right tool (no column-expression parser
    could express RFC 9309 group semantics); the result is a broadcast-size
    dimension regardless of corpus size."""
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("host", StringType()),
            StructField("path_prefix", StringType()),
            StructField("allowed", BooleanType()),
            StructField("crawl_delay_s", DoubleType()),
        ]
    )
    cols = ["host", "path_prefix", "allowed", "crawl_delay_s"]

    def gen(batches):
        for pdf in batches:
            rows = []
            for host, body in zip(pdf["host"], pdf["body"]):
                rows.extend(parse_robots_txt(host, body or "", agent))
            yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(
                {c: [] for c in cols}
            )

    return robots_pages.select("host", "body").mapInPandas(gen, out_schema)


def gate_by_robots(frontier: DataFrame, rules: DataFrame) -> DataFrame:
    """Drop URLs whose robots verdict is Disallow, by RFC 9309 longest-match
    precedence: among all Allow/Disallow prefixes matching a url's path, the
    LONGEST wins (ties -> Allow); no match -> allowed.

    Fast path (no Allow prefixes — the overwhelmingly common case): a single
    broadcast prefix anti-join, zero shuffles.  With Allow rules present the
    verdict needs a per-url argmax over its matching rules: an inner
    broadcast join (output bounded by rules-per-host) + one window keyed on
    the url."""
    from pyspark.sql import Window

    path = F.regexp_replace(F.col("url"), r"^[a-zA-Z]+://[^/]+", "")
    has_allow = (
        rules.filter(F.col("allowed") & (F.col("path_prefix") != "")).limit(1).count()
        > 0
    )  # tiny dim — one cheap job
    if not has_allow:
        disallow = rules.filter(~F.col("allowed")).select(
            F.col("host").alias("_r_host"), F.col("path_prefix").alias("_r_prefix")
        )
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
    dim = rules.filter(F.col("path_prefix") != "").select(
        F.col("host").alias("_r_host"),
        F.col("path_prefix").alias("_r_prefix"),
        F.col("allowed").alias("_r_allowed"),
    )
    matches = frontier.select("url", "host").withColumn("_path", path).join(
        F.broadcast(dim),
        (F.col("host") == F.col("_r_host"))
        & F.col("_path").startswith(F.col("_r_prefix")),
        "inner",
    )
    w = Window.partitionBy("url").orderBy(
        F.length("_r_prefix").desc(), F.col("_r_allowed").desc()
    )
    dropped = (
        matches.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & ~F.col("_r_allowed"))
        .select("url")
    )
    return frontier.join(dropped, "url", "left_anti")


def host_crawl_delays(rules: DataFrame) -> DataFrame:
    """Per-host max crawl delay -> feeds the per-host budget arithmetic
    (budget = wave_seconds / crawl_delay, analog of the reference's 1 rps
    geocode RateLimiter, 07_geocode_news.py:149-155)."""
    return rules.groupBy("host").agg(F.max("crawl_delay_s").alias("crawl_delay_s"))
