"""One-number box-noise probe: time the warc_scan bench query (untouched
since r5 — the interleaved-A/B control) after a warmup rep and print JSON.
Compare against the r5 reference (1.65 s): a reading well above it means
external neighbor load (invisible to guest loadavg) and full-bench numbers
from that window are not comparable round-over-round (NOTES_r6 protocol).

Usage: python tools/quiet_probe.py [reps]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    import __spark_entry__ as E  # noqa: F401  (registers repo on sys.path)
    from commoncrawlnewsdataset_spark.plans.queries import spark_queries
    from commoncrawlnewsdataset_spark.session import get_spark

    spark = get_spark("quiet-probe")
    spark.sparkContext.setLogLevel("ERROR")
    q = dict(spark_queries())["warc_scan"]
    sf = "/root/testdata/sf0.1"
    samples = []
    for i in range(reps + 1):
        t0 = time.time()
        q(spark, sf).count()
        dt = time.time() - t0
        if i > 0:  # rep 0 is codegen/python-worker warmup
            samples.append(round(dt, 3))
    best = min(samples)
    print(json.dumps({
        "warc_scan_best_s": best,
        "samples": samples,
        "r5_reference_s": 1.65,
        "quiet": best <= 1.85,
        "loadavg": open("/proc/loadavg").read().split()[:3],
    }))


if __name__ == "__main__":
    main()
