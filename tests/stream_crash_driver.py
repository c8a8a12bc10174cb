"""Subprocess driver for the mid-batch kill test (NOT a pytest file).

Runs stream_dedup_corpus_to over a file-source directory with availableNow
semantics.  With CRASH_EPOCH set, the process HARD-EXITS (os._exit) inside
the crash window the effectively-once protocol is built for: after the
epoch's sink parquet (incl. _SUCCESS) is written but BEFORE its
fingerprints are appended — injected by wrapping append_fingerprints, which
stream_dedup_corpus_to binds at call time.

Usage: python tests/stream_crash_driver.py <src> <store> <sink> <ck>
Env:   CRASH_EPOCH=<n> to kill the process before epoch n's fingerprint
       append; unset for a normal (recovery) run.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    src, store, sink, ck = sys.argv[1:5]
    crash_epoch = os.environ.get("CRASH_EPOCH")

    import commoncrawlnewsdataset_spark.operators.dedup as dedup
    from commoncrawlnewsdataset_spark.session import get_spark
    from commoncrawlnewsdataset_spark.streaming.ingest import (
        stream_dedup_corpus_to,
        stream_pages,
    )

    if crash_epoch is not None:
        target = int(crash_epoch)
        orig = dedup.append_fingerprints

        def crashing(kept, store_dir, epoch):
            if int(epoch) == target:
                # the sink write for this epoch has fully committed
                # (_SUCCESS on disk); dying HERE leaves fingerprints
                # missing for a sink-committed epoch — the exact window
                sys.stdout.flush()
                os._exit(42)
            return orig(kept, store_dir, epoch)

        dedup.append_fingerprints = crashing

    spark = get_spark("stream-crash", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    q = stream_dedup_corpus_to(
        stream_pages(spark, src, max_files_per_trigger=1), store, sink, ck
    )
    q.awaitTermination(180)
    print("DRIVER_DONE")
    spark.stop()


if __name__ == "__main__":
    main()
