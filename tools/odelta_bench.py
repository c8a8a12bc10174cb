"""O(delta) snapshot-resolution evidence (VERDICT r1 #4).

Measures the cost of WaveRunner.state() on a large frontier:

- WITHOUT a checkpoint: the latest-record window shuffles+sorts the ENTIRE
  log (O(frontier) per wave — the round-1 scale hazard).
- WITH a checkpoint: the window runs over the post-checkpoint deltas only and
  the checkpoint merges via a broadcast anti-join (no Exchange over the big
  scan) — cost tracks the delta, not the frontier.

Writes BENCH/ODELTA.md.  Usage: python tools/odelta_bench.py [n_urls]
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    # default large enough that the full-log window costs real shuffle time
    # at local[32] (at 1M rows both paths hide under ~0.7s of fixed job cost)
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000

    from commoncrawlnewsdataset_spark.benchlib import synth_frontier_seeds
    from commoncrawlnewsdataset_spark.frontier.waves import WaveRunner, simulated_fetch
    from commoncrawlnewsdataset_spark.session import get_spark

    spark = get_spark(
        "odelta-bench", master="local[32]", shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "true"},  # shuffle metrics via REST
    )
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="odelta-")
    runner = WaveRunner(
        spark, tmp, per_host_budget=10, nsalt=8, use_bloom=True,
        use_robots=False, detailed_metrics=False, fetcher=simulated_fetch,
    )
    runner.load_seeds(synth_frontier_seeds(spark, n_urls))
    for _ in range(2):
        runner.run_wave()

    import json as _json
    import urllib.request

    ui = spark.sparkContext.uiWebUrl

    def shuffle_write_bytes() -> int:
        app = _json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]
        stages = _json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=COMPLETE")
        )
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)

    def t_state() -> tuple[float, int]:
        b0 = shuffle_write_bytes()
        t0 = time.time()
        runner.state().count()
        return time.time() - t0, shuffle_write_bytes() - b0

    # warm the page cache, then best-of-3 each way
    t_state()
    runs = [t_state() for _ in range(3)]
    no_ckpt = min(r[0] for r in runs)
    no_ckpt_bytes = max(r[1] for r in runs)
    n_rows = runner.state().count()

    runner.compact()
    runner.run_wave()  # one delta after the checkpoint
    t_state()
    runs = [t_state() for _ in range(3)]
    with_ckpt = min(r[0] for r in runs)
    with_ckpt_bytes = max(r[1] for r in runs)
    delta_rows = spark.read.parquet(f"{tmp}/wave=00003/delta.parquet").count()

    ratio = no_ckpt_bytes / max(with_ckpt_bytes, 1)
    lines = [
        "# BENCH — O(delta) snapshot resolution",
        "",
        "WaveRunner.state() on a large frontier (local[32], best of 3, page",
        "cache warm).  Without a checkpoint the latest-record window SHUFFLES",
        "the whole log; with one, the window covers only the post-checkpoint",
        "delta and the checkpoint scan joins broadcast-anti — Exchange-free",
        "(plan-asserted in",
        "tests/test_frontier.py::test_state_resolution_is_o_delta_after_checkpoint).",
        "",
        "The scale-honest column is SHUFFLED BYTES (measured from the Spark",
        "stage metrics): on one box a multi-GB shuffle hides in the page cache,",
        "but on a 1000-executor cluster every shuffled byte crosses the network.",
        "",
        "| frontier rows | delta rows | path | wall (s) | shuffle written |",
        "|---|---|---|---|---|",
        f"| {n_rows:,} | {delta_rows:,} | window over full log | {no_ckpt:.2f} "
        f"| {no_ckpt_bytes / 1e6:,.1f} MB |",
        f"| {n_rows:,} | {delta_rows:,} | checkpoint + O(delta) window | {with_ckpt:.2f} "
        f"| {with_ckpt_bytes / 1e6:,.1f} MB |",
        "",
        f"**Shuffle volume per snapshot read drops {ratio:,.0f}x** — from",
        "O(frontier) to O(delta).  At 10^10 urls the no-checkpoint window is a",
        "full-frontier network shuffle per wave; with `run(compact_every=N)`",
        "the per-wave shuffle stays bounded by the wave delta (politeness",
        "budget x hosts + link fan-out).",
        "",
        f"Reproduce: `python tools/odelta_bench.py {n_urls}`",
        "",
    ]
    out = REPO / "BENCH" / "ODELTA.md"
    out.write_text("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
