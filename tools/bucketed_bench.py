"""Bucketed frontier-state evidence (VERDICT r4 #4).

Measures the SHUFFLE BYTES of one post-compaction crawl wave (selection
gate + discovery gate + state resolution) on a large frontier, with and
without ``bucket_state``:

- plain checkpoint: the URL-seen exact backstop and the discovery gate
  anti-join against the full frontier — the frontier side re-shuffles
  every wave, and the seen-set bloom rebuilds from the full fetched set.
- bucket_state: the checkpoint is a parquet table bucketed+sorted on url,
  so those joins compile with NO Exchange on the frontier side (plan lock:
  tests/test_frontier.py::test_bucketed_state_gate_joins_exchange_free),
  and the bloom is incremental (checkpoint shards persisted at compaction,
  per-wave build over deltas only).

The scale-honest column is shuffled bytes from the Spark stage metrics:
on one box a multi-GB shuffle hides in the page cache, but on a
1000-executor cluster every shuffled byte crosses the network.

Writes BENCH/BUCKETED.md.  Usage: python tools/bucketed_bench.py [n_urls]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000

    from pyspark.sql import functions as F

    from commoncrawlnewsdataset_spark.benchlib import synth_frontier_seeds
    from commoncrawlnewsdataset_spark.frontier.waves import WaveRunner, simulated_fetch
    from commoncrawlnewsdataset_spark.session import get_spark

    spark = get_spark(
        "bucketed-bench", master="local[32]", shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl

    def shuffle_write_bytes() -> int:
        app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]
        stages = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages?status=COMPLETE"
            )
        )
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)

    def expander(fetched):
        # 1 child per fetched url: keeps discovery (and its gate) active
        return fetched.select(
            F.concat(F.col("url"), F.lit("/c")).alias("url"),
            F.lit(0.5).alias("priority"),
            F.col("discovered_ts"),
        )

    rows = []
    for label, bucket_state in (("plain checkpoint", None), ("bucket_state=32", 32)):
        tmp = tempfile.mkdtemp(prefix=f"bucketed-{bucket_state or 'plain'}-")
        runner = WaveRunner(
            spark, tmp, per_host_budget=200, nsalt=8, use_bloom=True,
            use_robots=False, detailed_metrics=False, fetcher=simulated_fetch,
            link_expander=expander, bucket_state=bucket_state,
        )
        runner.load_seeds(synth_frontier_seeds(spark, n_urls))
        runner.run_wave()
        runner.run_wave()
        runner.compact()
        # measured wave: first wave AFTER compaction — the steady-state shape
        b0, t0 = shuffle_write_bytes(), time.time()
        m = runner.run_wave()
        wall, bytes_wave = time.time() - t0, shuffle_write_bytes() - b0
        rows.append((label, m["n_selected"], m.get("n_discovered", 0), wall, bytes_wave))
        print(label, rows[-1])

    ratio = rows[0][4] / max(rows[1][4], 1)
    wall_ratio = rows[0][3] / max(rows[1][3], 1e-9)
    lines = [
        "# BENCH — bucketed frontier state (per-wave shuffle)",
        "",
        f"One post-compaction wave over a {n_urls:,}-url frontier with link",
        "discovery (local[32]).  bucket_state writes the checkpoint bucketed+",
        "sorted on url and persists bloom shards at compaction, so the wave's",
        "recurring joins put ZERO Exchange on the frontier side and the bloom",
        "build covers only the post-compaction deltas (plan lock:",
        "tests/test_frontier.py::test_bucketed_state_gate_joins_exchange_free).",
        "",
        "| checkpoint layout | selected | discovered | wave wall (s) | shuffle written |",
        "|---|---|---|---|---|",
    ]
    for label, nsel, ndisc, wall, b in rows:
        lines.append(
            f"| {label} | {nsel:,} | {ndisc:,} | {wall:.2f} | {b / 1e6:,.1f} MB |"
        )
    lines += [
        "",
        f"**Wave wall time drops {wall_ratio:,.1f}x; shuffled bytes drop",
        f"{ratio:,.1f}x.**  The structural point is WHICH shuffles remain:",
        "in bucket_state mode every surviving Exchange is wave-bounded",
        "(candidate side of the SMJ, O(delta) latest-record window,",
        "politeness host aggregation, delta-only bloom build) — nothing",
        "scales with the frontier.  The plain path's frontier-side",
        "anti-join exchanges and full-fetched-set bloom rebuild grow with",
        "the frontier: at 10^10 urls each is a multi-TB network shuffle",
        "per wave, while the bucketed layout's per-wave bytes stay flat.",
        "",
        f"Reproduce: `python tools/bucketed_bench.py {n_urls}`",
        "",
    ]
    (REPO / "BENCH" / "BUCKETED.md").write_text("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
