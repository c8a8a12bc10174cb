"""Capstone crawl->corpus throughput (VERDICT r3 #10): run the north-star
dataflow — REAL WaveRunner (politeness window, URL-seen gate, page sink,
snapshot commits) draining an sf0.1-derived frontier, then the extraction
spine (Arrow extract UDF -> quality gate -> D1 dedup inside
extract_articles -> chunk packing) — and record its tracked throughput:
waves, urls fetched, pages/s, articles and training chunks out.

This is the same dataflow the oracle-checked `crawl_corpus_pipeline` query
certifies for CORRECTNESS at 2 waves; here it runs to FRONTIER DRAIN with a
realistic per-host budget so the north-star number is throughput, not just
a green row.  Appends a section to BENCH/E2E.md.

Usage: python tools/capstone_bench.py [sf_dir] [budget] [max_waves]
"""

from __future__ import annotations

import re
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    max_waves = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    from pyspark.sql import functions as F

    from commoncrawlnewsdataset_spark.frontier.waves import WaveRunner
    from commoncrawlnewsdataset_spark.functions.extract import extract_articles
    from commoncrawlnewsdataset_spark.functions.quality import token_count_ws
    from commoncrawlnewsdataset_spark.operators.packing import pack_chunks
    from commoncrawlnewsdataset_spark.plans.queries import (
        CRAWL_CORPUS_CHUNK,
        _seed_frontier,
        md5_fetch_with_payload,
    )
    from commoncrawlnewsdataset_spark.session import get_spark

    spark = get_spark("capstone-bench")
    spark.sparkContext.setLogLevel("ERROR")

    seeds = _seed_frontier(spark, sf_dir).select(
        "url",
        "priority",
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("discovered_ts"),
    )
    n_seeds = seeds.count()
    state_dir = tempfile.mkdtemp(prefix="capstone-state-")
    pages_dir = tempfile.mkdtemp(prefix="capstone-pages-")
    # plain (non-bucketed) config, tracked since r3 for round-over-round
    # comparability.  This toy frontier (150k urls, drains in ~7 waves)
    # cannot amortize a bucketed compaction, but the measured difference is
    # inside the box's drift anyway (r7 adjacent runs: plain 51.4s and
    # 64.0s, bucketed+head 66.0s).  The production bucketed+head config
    # wins from ~10^6 pending upward (BENCH/HEAD.md's controlled A/B).
    runner = WaveRunner(
        spark, state_dir, per_host_budget=budget, nsalt=8,
        use_robots=False, fetcher=md5_fetch_with_payload,
        detailed_metrics=False, page_sink_dir=pages_dir,
    )
    t0 = time.time()
    runner.load_seeds(seeds)
    seed_s = time.time() - t0

    t0 = time.time()
    manifests = runner.run(max_waves=max_waves, compact_every=5)
    crawl_s = time.time() - t0
    waves = [m for m in manifests if m.get("n_selected", 0) > 0]
    n_attempted = sum(m["n_selected"] for m in waves)
    n_fetched = sum(m.get("n_fetched", 0) for m in waves)

    t0 = time.time()
    arts = extract_articles(runner.pages())
    gated = arts.filter(token_count_ws(F.col("text")).between(50, 10000))
    packed = pack_chunks(
        gated, CRAWL_CORPUS_CHUNK, id_col="url", text_col="text"
    ).localCheckpoint()
    n_chunks = packed.count()
    n_articles = packed.select("doc_id").distinct().count()
    corpus_s = time.time() - t0

    total_s = crawl_s + corpus_s
    section = f"""
## Capstone crawl->corpus at {sf_dir} (north-star dataflow, tracked)

The oracle-checked `crawl_corpus_pipeline` dataflow run to frontier DRAIN
(budget {budget}/host/wave, nsalt=8, md5-deterministic fetcher with
payloads, page sink + snapshot commit per wave, compact_every=5), then the
corpus stages over the sink.

| stage | value |
|---|---|
| seed frontier | {n_seeds:,} urls ({seed_s:.1f}s load) |
| crawl | {len(waves)} waves, {n_attempted:,} urls attempted / {n_fetched:,} fetched, {crawl_s:.1f}s ({n_attempted / crawl_s:,.0f} urls/s) |
| corpus (extract -> quality gate -> dedup -> pack) | {n_articles:,} surviving docs -> {n_chunks:,} chunks of {CRAWL_CORPUS_CHUNK} tokens, {corpus_s:.1f}s |
| end-to-end | {n_attempted:,} pages -> corpus in {total_s:.1f}s ({n_attempted / total_s:,.0f} pages/s, local[32]) |

Reproduce: `python tools/capstone_bench.py {sf_dir} {budget}`
"""
    md = Path("BENCH/E2E.md")
    text = md.read_text()
    # replace any prior capstone section (idempotent re-runs)
    text = re.split(r"\n## Capstone crawl->corpus", text)[0].rstrip() + "\n" + section
    md.write_text(text)
    print(
        f"waves={len(waves)} fetched={n_fetched:,} crawl={crawl_s:.1f}s "
        f"corpus={corpus_s:.1f}s chunks={n_chunks:,} -> BENCH/E2E.md"
    )


if __name__ == "__main__":
    main()
