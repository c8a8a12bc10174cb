"""Crawl-wave loop: snapshot checkpoints, fetch stage, lineage metrics, resume.

Storage model (sandbox): an append-only log of per-wave delta parquet dirs +
a JSON manifest per wave —

    state_dir/
      wave=00000/delta.parquet   seed load (status=pending)
      wave=00001/delta.parquet   wave-1 outcomes + newly discovered urls
      wave=00001/manifest.json   counts, per-partition lineage, per-host stats
      ...

Current frontier state = latest record per url across deltas (window by
wave desc).  This is exactly Iceberg's snapshot/append model expressed on
plain parquet because no Iceberg runtime jars ship in this container; in
production the same class points at an Iceberg catalog: delta append ->
`writeTo(...).append()`, latest-record resolution -> `MERGE INTO`, manifest
-> Iceberg snapshot summary + a wave_metrics table.  Nothing is ever
rewritten or deleted (the reference *deletes* consumed inputs,
02_extract_newscrawl.py:58-60 — non-resumable by design; we keep lineage).

Resume = construct WaveRunner on the same state_dir: it continues from the
max committed wave (north_rule: "resumes mid-crawl from any snapshot").
An interrupted wave leaves no manifest, so its partial delta is ignored and
the wave re-runs idempotently.

The fetch stage is a mapInPandas batch with retry/backoff semantics inside
the Arrow UDF (S2: 5 retries, exponential backoff from 10s,
01_download_newscrawl.py:51-69); failures become status='failed' rows, never
exceptions.  The default fetcher simulates the network deterministically.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from commoncrawlnewsdataset_spark.frontier.core import filter_unseen, with_frontier_keys
from commoncrawlnewsdataset_spark.frontier.politeness import politeness_rank
from commoncrawlnewsdataset_spark.frontier.robots import gate_by_robots

from pyspark.sql.types import BinaryType, BooleanType, DoubleType, TimestampType

FETCH_RESULT_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("url_hash", LongType()),
        StructField("host", StringType()),
        StructField("priority", DoubleType()),
        StructField("discovered_ts", TimestampType()),
        StructField("ok", BooleanType()),
        StructField("attempts", IntegerType()),
        StructField("content_length", LongType()),
    ]
)

# fetch schema when a pages sink is attached: payload rides along as binary
FETCH_PAGE_SCHEMA = StructType(
    FETCH_RESULT_SCHEMA.fields + [StructField("html", BinaryType())]
)


def make_http_fetcher(
    backoff_s: float = 10.0,
    timeout_s: float = 30.0,
    session_factory=None,
    sleeper=None,
    keep_content: bool = False,
):
    """Production fetcher with the reference's retry semantics
    (01_download_newscrawl.py:51-69): `max_retries` attempts, exponential
    backoff ×2, only ``requests.RequestException`` retried (anything else is
    a bug and propagates), and — as in the reference — the backoff sleep runs
    after EVERY failed attempt, including the last.

    Returns ``(ok, attempts, nbytes, content)``; ``content`` is the response
    body when ``keep_content`` (it feeds the pages sink / extraction spine
    instead of being discarded) and None otherwise.

    Built per python worker (construct INSIDE the UDF closure or pass as
    WaveRunner.fetcher); `session_factory`/`sleeper` are injectable for
    tests — no network exists in this sandbox."""
    import time as _time

    sleep = sleeper or _time.sleep

    def fetch(url: str, max_retries: int = 5) -> tuple[bool, int, int, bytes | None]:
        import requests  # per-worker import; gated at call time

        session = session_factory() if session_factory else requests.Session()
        wait = backoff_s
        for attempt in range(1, max_retries + 1):
            try:
                resp = session.get(url, stream=True, timeout=timeout_s)
                resp.raise_for_status()
                n = 0
                chunks: list[bytes] = []
                for chunk in resp.iter_content(chunk_size=8192):
                    n += len(chunk)
                    if keep_content:
                        chunks.append(chunk)
                return True, attempt, n, (b"".join(chunks) if keep_content else None)
            except requests.exceptions.RequestException:
                sleep(wait)
                wait *= 2
        return False, max_retries, 0, None

    return fetch


def simulated_fetch(url: str, max_retries: int = 5) -> tuple[bool, int, int]:
    """Deterministic stand-in for the HTTP fetch (no network in sandbox):
    ~1/13 of urls hard-fail after max_retries; ~1/7 succeed on attempt 2.
    Returns (ok, attempts, content_length).  crc32, not hash(): Python string
    hashing is process-salted and would differ across executors."""
    import zlib

    h = zlib.crc32(url.encode()) & 0x7FFFFFFF
    if h % 13 == 0:
        return False, max_retries, 0
    if h % 7 == 0:
        return True, 2, 1000 + h % 50_000
    return True, 1, 1000 + h % 50_000


def simulated_fetch_with_payload(
    url: str, max_retries: int = 5
) -> tuple[bool, int, int, bytes | None]:
    """simulated_fetch + a deterministic HTML body for the pages sink, so the
    crawl → pages → extract spine is exercisable end-to-end offline."""
    import zlib

    ok, attempts, _n = simulated_fetch(url, max_retries)
    if not ok:
        return False, attempts, 0, None
    # article-shaped body that passes the F4 quality gate (>=50 words, >=3
    # sentences, >5 words/line, mean word length 3-12) so the crawl -> pages
    # -> extract -> filter spine is exercisable end-to-end offline; the url
    # in the text keeps every page distinct under D1 dedup
    h = zlib.crc32(url.encode()) & 0x7FFFFFFF
    filler = " ".join(
        "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()[
            (h + i) % 10
        ]
        for i in range(12)
    )
    paras = "".join(
        f"<p>The {filler} report number {h % 997} covers section {i} in detail "
        f"and explains the findings clearly for every reader involved.</p>"
        for i in range(4)
    )
    body = (
        f"<html><head><title>Page {url}</title></head>"
        f"<body>{paras}<p>Deterministic body for {url}.</p></body></html>"
    ).encode("utf-8")
    return True, attempts, len(body), body


@dataclass
class WaveRunner:
    spark: SparkSession
    state_dir: str
    per_host_budget: int = 10
    nsalt: int = 8
    use_bloom: bool = True
    use_robots: bool = True
    max_retries: int = 5
    fetcher: Callable[[str, int], tuple[bool, int, int]] | None = None
    robots_rules: DataFrame | None = None
    detailed_metrics: bool = True
    # link discovery: fetched outcomes -> new seed rows (url, priority,
    # discovered_ts); discovered urls enter the frontier as pending after the
    # URL-seen gate.  None = closed frontier (reference behavior: the seed
    # list is the whole universe, 01_download_newscrawl.py:80-81).
    link_expander: Callable[[DataFrame], DataFrame] | None = None
    # when set (seconds per wave) and robots rules carry crawl_delay_s, the
    # per-host budget becomes floor(wave_seconds / crawl_delay) — budget
    # arithmetic instead of sleeping (reference analog: 1 rps RateLimiter,
    # 07_geocode_news.py:149-155)
    wave_seconds: float | None = None
    # fetch tasks per core: fine-grained tasks pack the tail of the stage
    # (a single-round schedule of coarse tasks leaves cores idle at the
    # end).  r8: default 8 -> 2 — an interleaved A/B at 343k urls read the
    # 2/core fan-out ~25% faster than 8/core (fewer python-worker task
    # rounds; min 3.3s vs 4.2s over 3 reps), and 2/core still packs a
    # straggler tail; raise it for real-network fetchers whose per-url
    # latency variance dwarfs the per-task overhead.
    fetch_tasks_per_core: int = 2
    # AIMD politeness: shrink a host's next-wave budget in proportion to its
    # last-wave failure rate (politeness.adaptive_host_budgets); combined
    # with crawl-delay budgets by LEAST when both apply
    adaptive_budgets: bool = False
    # when set, fetched payloads are persisted per wave as parquet under this
    # dir (input_hint pages shape via .pages()); the wave's delta/metrics are
    # then derived by RE-READING the sink (payload column pruned) so the
    # fetch runs exactly once — content feeds the extraction spine instead of
    # being discarded.  Use a payload-returning fetcher
    # (make_http_fetcher(keep_content=True) / simulated_fetch_with_payload).
    page_sink_dir: str | None = None
    # VERDICT r4 #4 — scale-state mode: when set, compact() writes the
    # checkpoint as a parquet table BUCKETED+SORTED on url (this many
    # buckets; pick for the TARGET scale, e.g. 4096 ≈ 25 GB/bucket at
    # 100 TB) and persists the seen-set bloom shards next to it.  Every
    # recurring per-wave join against the frontier then compiles with NO
    # Exchange on the frontier side: the URL-seen exact backstop and the
    # discovery gate SortMergeJoin against the bucketed scan (only the
    # wave-bounded candidate side shuffles), and the bloom build touches
    # only the post-compaction deltas (merge_bloom_shards) instead of
    # re-shuffling the full fetched set each wave.  The checkpoint files
    # stay plain parquet at the same protocol path — non-bucketed readers
    # and resume are unaffected (the catalog entry is re-registered on
    # demand after a restart).
    bucket_state: int | None = None
    # VERDICT r7 #1 — size gate for the post-compaction delta broadcast
    # hints (_compose_state url anti-join; head-path delta anti-join): the
    # hint is applied only while the manifest-derived upper bound on delta
    # rows stays at or below this.  Above it (a stretched compact_every, a
    # link-discovery burst) the hint is DROPPED and AQE picks the join —
    # degrading to a shuffle join instead of failing on an oversized
    # broadcast.  4M url rows ≈ low-hundreds-MB broadcast (the 300M-soak
    # operating point, proven safe); the bound costs no job — it is summed
    # from the per-wave manifests at snapshot-read time.
    broadcast_delta_max: int = 4_000_000
    # VERDICT r6 #3 — wave-selection pruning: at each compaction, persist a
    # per-host candidate HEAD (the top head_factor×budget pending rows by
    # the total order) next to the checkpoint.  Wave selection then ranks
    # O(active-hosts × head) candidate rows (head ∪ post-compaction deltas)
    # instead of re-scanning and re-ranking the FULL pending set — the
    # dominant O(pending) term at 10^10 urls.  Selection falls back to the
    # full scan whenever the head cannot PROVE equivalence (a truncated
    # host with fewer un-superseded head survivors than its budget, a
    # reprioritize touching everything, adaptive budgets).  Semantics are
    # provably identical when the head is used: surviving un-superseded
    # head rows keep their compaction-time total order, which dominates
    # every non-candidate row (property-tested head-vs-full).  0 disables.
    head_factor: int = 8

    # ---- snapshot log -----------------------------------------------------

    def _wave_dir(self, wave: int) -> str:
        return os.path.join(self.state_dir, f"wave={wave:05d}")

    def committed_waves(self) -> list[int]:
        if not os.path.isdir(self.state_dir):
            return []
        waves = []
        for d in sorted(os.listdir(self.state_dir)):
            if d.startswith("wave="):
                w = int(d.split("=")[1])
                # Every wave — including the wave-0 seed load — commits via
                # manifest.json, so an interrupted load_seeds leaves a partial
                # delta that resume correctly ignores (atomic-commit protocol).
                if os.path.exists(os.path.join(self.state_dir, d, "manifest.json")):
                    waves.append(w)
        return waves

    def last_wave(self) -> int:
        waves = self.committed_waves()
        return max(waves) if waves else -1

    def _write_delta(self, df: DataFrame, wave: int) -> None:
        df.write.mode("overwrite").parquet(os.path.join(self._wave_dir(wave), "delta.parquet"))

    def _commit(self, wave: int, manifest: dict) -> None:
        path = os.path.join(self._wave_dir(wave), "manifest.json")
        with open(path, "w") as f:
            json.dump(manifest, f, indent=2, default=str)

    def read_manifest(self, wave: int) -> dict:
        with open(os.path.join(self._wave_dir(wave), "manifest.json")) as f:
            return json.load(f)

    def _checkpoint_dir(self, upto: int) -> str:
        return os.path.join(self.state_dir, f"checkpoint={upto:05d}")

    def committed_checkpoints(self) -> list[int]:
        if not os.path.isdir(self.state_dir):
            return []
        return sorted(
            int(d.split("=")[1])
            for d in os.listdir(self.state_dir)
            if d.startswith("checkpoint=")
            and os.path.exists(os.path.join(self.state_dir, d, "_COMMITTED"))
        )

    def state(self, upto_wave: int | None = None) -> DataFrame:
        """Latest record per url (snapshot read), resolved in O(delta).

        Reads the newest usable COMPACTED checkpoint plus only the deltas
        after it.  The latest-record window runs over the DELTAS ONLY (every
        delta wave > checkpoint wave, so a delta row always beats a checkpoint
        row for the same url); checkpoint rows survive via a broadcast
        anti-join against the delta urls — the big checkpoint scan is never
        shuffled, so per-wave cost tracks delta volume, not frontier size.
        Iceberg analog: MERGE INTO target USING delta.  `upto_wave` gives
        time travel to any snapshot (resume semantics).  Time travel below
        the newest checkpoint stays valid only until ``expire_snapshots``
        removes the covered deltas; expiration clamps its horizon to a
        committed checkpoint, so every SURVIVING wave always resolves from a
        checkpoint at-or-below it plus intact deltas."""
        ckpt_df, resolved_deltas, _ = self._snapshot_parts(upto_wave)
        return self._compose_state(ckpt_df, resolved_deltas)

    def _compose_state(
        self, ckpt_df: DataFrame | None, resolved_deltas: DataFrame | None
    ) -> DataFrame:
        if ckpt_df is None:
            if resolved_deltas is None:
                raise ValueError(f"no committed waves in {self.state_dir}")
            return resolved_deltas
        if resolved_deltas is None:
            return ckpt_df
        # A wave's delta is bounded by the politeness budget + link fan-out —
        # orders of magnitude smaller than a 10^10-url frontier — so the url
        # set broadcasts and the checkpoint side stays Exchange-free.  The
        # hint is SIZE-GATED (VERDICT r7 #1): _snapshot_parts records a
        # manifest-derived upper bound on delta rows; past
        # broadcast_delta_max (or when no bound is provable, e.g. a fork
        # delta) the hint is dropped and AQE chooses — a stretched
        # compact_every or link burst degrades to a shuffled anti-join
        # instead of an oversized-broadcast failure.
        untouched = ckpt_df.join(
            self._maybe_broadcast(resolved_deltas.select("url")), "url", "left_anti"
        )
        return untouched.unionByName(resolved_deltas.select(*untouched.columns))

    def _maybe_broadcast(self, df: DataFrame) -> DataFrame:
        """Apply the broadcast hint iff the newest snapshot read proved the
        post-checkpoint delta row bound ≤ broadcast_delta_max."""
        bound = getattr(self, "_last_delta_bound", None)
        if bound is not None and bound <= self.broadcast_delta_max:
            return F.broadcast(df)
        return df

    def _delta_rows_bound(self, waves: list[int]) -> int | None:
        """Upper bound on resolved-delta rows computed from manifests ALONE
        (no Spark job): a crawl wave's delta holds n_selected outcomes +
        n_discovered fresh urls; maintenance waves record seeded /
        requeued / reprioritized exactly.  Returns None (no provable
        bound) for fork deltas — a fork's wave-0 delta is the full
        resolved source state and its manifest records no row count."""
        total = 0
        for w in waves:
            try:
                m = self.read_manifest(w)
            except OSError:
                return None
            if "forked_from" in m:
                return None
            n = None
            for k in ("seeded", "requeued", "reprioritized"):
                if k in m:
                    n = m[k]
                    break
            if n is None and "n_selected" in m:
                n = m.get("n_selected", 0) + m.get("n_discovered", 0)
            if n is None:
                return None
            total += int(n)
        return total

    def _snapshot_parts(
        self, upto_wave: int | None = None
    ) -> tuple[DataFrame | None, DataFrame | None, int | None]:
        """(checkpoint_df, resolved_deltas, ckpt_wave) — the components
        state() composes.  Exposed separately because the per-wave gates
        want them SPLIT: the checkpoint side is huge (and, in bucket_state
        mode, a bucketed scan that joins Exchange-free) while the delta
        side is wave-bounded and broadcastable (filter_unseen_split)."""
        waves = self.committed_waves()
        if upto_wave is not None:
            waves = [w for w in waves if w <= upto_wave]
        base = [c for c in self.committed_checkpoints() if not waves or c <= max(waves, default=-1)]
        ckpt_df = None
        ckpt = None
        if base and (upto_wave is None or base[-1] <= upto_wave):
            ckpt = base[-1]
            ckpt_df = self._read_checkpoint(ckpt)
            waves = [w for w in waves if w > ckpt]
        delta_paths = [os.path.join(self._wave_dir(w), "delta.parquet") for w in waves]
        # manifest-derived delta row bound for the broadcast gate
        # (_maybe_broadcast); None = no provable bound -> no hint
        self._last_delta_bound = self._delta_rows_bound(waves) if waves else 0

        resolved_deltas = None
        if delta_paths:
            deltas = self.spark.read.parquet(*delta_paths)
            if len(delta_paths) == 1:
                # r8 fast path: EVERY delta is unique-per-url by
                # construction (load_seeds dedups; fork writes resolved
                # state; run_wave writes outcome ⊎ unseen-gated distinct
                # discoveries; requeue/reprioritize project the resolved
                # state) — so with exactly one delta the latest-record
                # window is the identity and its full-delta shuffle is
                # pure cost.  This makes the common first-wave-after-
                # seed/compaction snapshot read shuffle-free.
                # (test_snapshot_single_delta_no_window pins equivalence.)
                resolved_deltas = deltas
            else:
                w = Window.partitionBy("url").orderBy(F.desc("wave"), F.desc("status"))
                resolved_deltas = (
                    deltas.withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1)
                    .drop("_rn")
                )
        return ckpt_df, resolved_deltas, ckpt

    def _ckpt_table_name(self, upto: int, n_buckets: int) -> str:
        import zlib

        tag = zlib.crc32(os.path.abspath(self.state_dir).encode()) & 0xFFFFFFFF
        # the bucket count is part of the name: a re-register after a config
        # change can never collide with a stale catalog entry made under a
        # different layout
        return f"ccn_state_{tag:08x}_{upto:05d}_b{n_buckets}"

    def _ckpt_bucket_count(self, upto: int) -> int | None:
        """The bucket count the checkpoint FILES were actually written with
        (bucket_meta.json, recorded at compact time) — never assume the
        current self.bucket_state: registering files under a different
        count would make the Exchange-free SortMergeJoin silently join on
        a distribution the files don't have (r5 review finding).  None =
        plain (non-bucketed) checkpoint."""
        meta_path = os.path.join(self._checkpoint_dir(upto), "bucket_meta.json")
        if not os.path.exists(meta_path):
            return None
        with open(meta_path) as f:
            return int(json.load(f)["n_buckets"])

    def _recover_checkpoint_swap(self, upto: int) -> None:
        """Recover a checkpoint whose in-place layout conversion crashed
        mid-swap (ADVICE r7): if state.parquet is missing but the staged
        `.old` copy survives, rename it back; a surviving `.rewrite` next
        to an intact state.parquet is an incomplete conversion and is
        discarded.  Idempotent; no-op on healthy checkpoints."""
        import shutil

        out = self._checkpoint_dir(upto)
        state_path = os.path.join(out, "state.parquet")
        old_path = state_path + ".old"
        if not os.path.isdir(state_path) and os.path.isdir(old_path):
            os.rename(old_path, state_path)
        if os.path.isdir(state_path):
            if os.path.isdir(old_path):
                shutil.rmtree(old_path)  # swap completed; cleanup died
            rw = state_path + ".rewrite"
            if os.path.isdir(rw):
                shutil.rmtree(rw)  # conversion never reached the swap

    def _read_checkpoint(self, upto: int) -> DataFrame:
        """Checkpoint scan: plain parquet normally; in bucket_state mode the
        catalog table (re-registered after a restart via CREATE TABLE ...
        CLUSTERED BY ... LOCATION — the files are the same parquet, only the
        layout metadata lives in the catalog), so downstream joins on url
        see the bucketed distribution and skip their Exchange+Sort.  The
        registration always uses the count stored at write time; a plain
        checkpoint (e.g. bucket_state enabled over an old state dir) reads
        as plain parquet until the next compact() rewrites it bucketed."""
        self._recover_checkpoint_swap(upto)
        path = os.path.join(self._checkpoint_dir(upto), "state.parquet")
        n_buckets = self._ckpt_bucket_count(upto) if self.bucket_state else None
        if not n_buckets:
            return self.spark.read.parquet(path)
        tbl = self._ckpt_table_name(upto, n_buckets)
        if not self.spark.catalog.tableExists(tbl):
            if "'" in path:  # interpolated into the LOCATION literal below
                raise ValueError(
                    f"state_dir path {path!r} contains a single quote — "
                    "unsupported in the checkpoint table LOCATION"
                )
            schema = self.spark.read.parquet(path).schema
            cols = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
            )
            self.spark.sql(
                f"CREATE TABLE {tbl} ({cols}) USING PARQUET "
                f"CLUSTERED BY (url) SORTED BY (url) "
                f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
            )
        return self.spark.table(tbl)

    def _drop_stale_ckpt_tables(self, keep_upto: int) -> None:
        """Unregister catalog entries for this state dir's SUPERSEDED
        checkpoints (ADVICE r5: long-lived sessions otherwise accumulate one
        external table per compaction forever).  Metadata-only — the DROP of
        an external-LOCATION table never touches the parquet files, which
        remain readable by wave-log protocol; only tables below
        ``keep_upto`` go, so concurrent readers of the newest checkpoint
        are unaffected."""
        import zlib

        tag = zlib.crc32(os.path.abspath(self.state_dir).encode()) & 0xFFFFFFFF
        prefix = f"ccn_state_{tag:08x}_"
        for t in self.spark.catalog.listTables():
            if t.name.startswith(prefix):
                try:
                    upto = int(t.name[len(prefix):].split("_")[0])
                except ValueError:
                    continue
                if upto < keep_upto:
                    self.spark.sql(f"DROP TABLE IF EXISTS {t.name}")

    def fork(self, new_state_dir: str, upto_wave: int | None = None) -> "WaveRunner":
        """Resume mid-crawl from ANY snapshot (north_rule): materialize the
        resolved state as-of `upto_wave` into a fresh state dir and return a
        runner over it.  The fork keeps every url's status (fetched urls are
        not re-crawled) while discarding all waves after the chosen snapshot —
        Iceberg analog: branch from an old snapshot id."""
        import dataclasses

        snap = self.state(upto_wave=upto_wave)
        forked = dataclasses.replace(self, state_dir=new_state_dir)
        forked._write_delta(snap.withColumn("wave", F.lit(0)), 0)
        forked._commit(0, {"wave": 0, "forked_from": self.state_dir,
                           "upto_wave": upto_wave, "done": False,
                           "n_selected": 0, "n_fetched": 0, "n_failed": 0})
        return forked

    def reprioritize(self, scorer: Callable[[DataFrame], Column]) -> int:
        """Frontier re-prioritization at a wave barrier (north_star: per-wave
        global barriers are exactly where re-ranking happens).  `scorer` maps
        the pending state to a new priority Column; updated rows are appended
        as a delta (latest-wins), so re-scoring is itself snapshotted,
        resumable, and time-travelable like any wave."""
        wave = self.last_wave() + 1
        state = self.state()
        pending = state.filter(F.col("status") == "pending")
        rescored = pending.select(
            "url", "url_hash", "host", "status",
            scorer(pending).cast("double").alias("priority"),
            F.lit(wave).alias("wave"),
            "attempts",
            "discovered_ts",
        )
        self._write_delta(rescored, wave)
        n = rescored.count()
        self._commit(wave, {"wave": wave, "reprioritized": n, "done": False,
                            "n_selected": 0, "n_fetched": 0, "n_failed": 0})
        return n

    def requeue_failed(self, max_attempts: int = 10) -> int:
        """Second-chance scheduling: move failed urls whose CUMULATIVE fetch
        attempts are below ``max_attempts`` back to pending as a new delta
        (latest-wins) — the next wave's politeness selection retries them.
        Attempts accumulate across waves (the fetch stage adds each wave's
        attempts to the prior count), so repeated requeue calls converge:
        a persistently dead url exhausts its budget and stays failed.  The
        reference never retries across runs (backoff only inside one
        download loop, 01_download_newscrawl.py:51-69); production crawls
        re-queue transient failures at wave granularity.  Snapshotted like
        any wave: resumable, time-travelable, expirable."""
        wave = self.last_wave() + 1
        retry = self.state().filter(
            (F.col("status") == "failed") & (F.col("attempts") < max_attempts)
        )
        delta = retry.select(
            "url", "url_hash", "host",
            F.lit("pending").alias("status"),
            F.col("priority").cast("double"),
            F.lit(wave).alias("wave"),
            "attempts",
            F.col("discovered_ts").cast("timestamp"),
        )
        self._write_delta(delta, wave)
        n = self.spark.read.parquet(
            os.path.join(self._wave_dir(wave), "delta.parquet")
        ).count()
        self._commit(wave, {"wave": wave, "requeued": n, "done": False,
                            "n_selected": 0, "n_fetched": 0, "n_failed": 0})
        return n

    def compact(self, upto_wave: int | None = None) -> int:
        """Materialize the resolved state through `upto_wave` (default: last
        committed) as a checkpoint.  Iceberg analog: snapshot expiration +
        rewrite_data_files, except nothing is deleted here — the checkpoint
        is a read optimization, raw deltas remain the source of truth.

        Re-compacting a wave that is ALREADY checkpointed is (a) a no-op
        when the target layout matches (the resolved state at a fixed wave
        is a pure function — cron-style `maintain` stays cheap), and (b) a
        layout CONVERSION otherwise, staged through a sibling dir and
        swapped in — never an in-place overwrite of the parquet the
        conversion job is reading (r7 fix: plain->bucketed maintain used to
        FAILED_READ_FILE on its own source)."""
        import shutil

        upto = self.last_wave() if upto_wave is None else upto_wave
        out = self._checkpoint_dir(upto)
        state_path = os.path.join(out, "state.parquet")
        rewrite_in_place = upto in self.committed_checkpoints()
        old_buckets = self._ckpt_bucket_count(upto) if rewrite_in_place else None
        if rewrite_in_place:
            if (old_buckets or 0) == (self.bucket_state or 0):
                return upto  # identical content + layout: idempotent no-op
        target = state_path + ".rewrite" if rewrite_in_place else state_path
        snap = self.state(upto_wave=upto)
        if self.bucket_state:
            # bucketed+sorted on url (VERDICT r4 #4): the shuffle is paid
            # once here and every later per-wave join against the frontier
            # side compiles Exchange-free.  Files are plain parquet at the
            # protocol path; only the layout metadata lives in the catalog.
            tbl = self._ckpt_table_name(upto, self.bucket_state)
            self.spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            (
                snap.write.mode("overwrite")
                .format("parquet")
                .bucketBy(self.bucket_state, "url")
                .sortBy("url")
                .option("path", target)
                .saveAsTable(tbl)
            )
        else:
            snap.write.mode("overwrite").parquet(target)
        if rewrite_in_place:
            # Crash-safe swap (ADVICE r7): the old layout is RENAMED aside
            # before the new one moves in, so no instant exists at which a
            # _COMMITTED checkpoint has no state.parquet — a crash between
            # the two renames leaves `.old` (recovered by
            # _recover_checkpoint_swap on the next read) instead of
            # unrecoverable loss once covered deltas were expired.
            old_path = state_path + ".old"
            if os.path.isdir(old_path):
                shutil.rmtree(old_path)
            os.rename(state_path, old_path)
            os.rename(target, state_path)
            shutil.rmtree(old_path)
            bm = os.path.join(out, "bucket_meta.json")
            if os.path.exists(bm):
                os.remove(bm)
            if self.bucket_state:
                # the catalog entry points at the staging path — drop it;
                # _read_checkpoint re-registers against the final path
                self.spark.sql(
                    f"DROP TABLE IF EXISTS "
                    f"{self._ckpt_table_name(upto, self.bucket_state)}"
                )
            if old_buckets:
                # the superseded layout's entry now describes a bucket
                # distribution the rewritten files no longer have
                self.spark.sql(
                    f"DROP TABLE IF EXISTS "
                    f"{self._ckpt_table_name(upto, old_buckets)}"
                )
        if self.bucket_state:
            # record the layout the FILES have — reads must never assume
            # the current config matches (r5 review finding)
            with open(os.path.join(out, "bucket_meta.json"), "w") as f:
                json.dump({"n_buckets": self.bucket_state}, f)
            if self.use_bloom:
                self._write_ckpt_bloom(upto, state_path)
            if self.head_factor:
                self._write_ckpt_head(upto, state_path)
            # metadata hygiene: older checkpoints' catalog entries are now
            # superseded (their files stay on disk per the wave-log protocol)
            self._drop_stale_ckpt_tables(upto)
        with open(os.path.join(out, "_COMMITTED"), "w") as f:
            f.write(str(upto))
        return upto

    def _write_ckpt_head(self, upto: int, state_path: str) -> None:
        """Persist the per-host candidate head next to the checkpoint
        (VERDICT r6 #3): the exact top-``head_factor × budget`` pending
        rows per host by the selection total order (the same salted
        two-phase rank the wave uses), plus per-host pending totals so
        selection can detect truncation.  One politeness-rank-shaped job
        over the pending set — O(pending), paid at compaction cadence, so
        the PER-WAVE selection no longer is.

        r8 (VERDICT r7 #5): the per-host depth is ``head_factor ×
        max(per_host_budget, crawl-delay override)`` — a host whose robots
        crawl-delay budget exceeds the uniform depth would otherwise fail
        head validity on EVERY truncated wave and force the partial
        fallback (soaked: 6/6 post-compaction waves partial at override
        600 > H 400).  The per-host depth rides head_counts.parquet as
        ``head_h`` so the truncation test stays per-host; older persisted
        heads without the column fall back to the uniform meta H."""
        out = self._checkpoint_dir(upto)
        snap = self.spark.read.parquet(state_path)
        pending = snap.filter(F.col("status") == "pending")
        H = int(self.head_factor) * int(self.per_host_budget)
        head_budgets = None
        counts = pending.groupBy("host").agg(F.count("*").alias("n_pending"))
        if self.use_robots and self.robots_rules is not None and self.wave_seconds is not None:
            from commoncrawlnewsdataset_spark.frontier.robots import host_crawl_delays

            overrides = host_crawl_delays(self.robots_rules).select(
                "host",
                F.greatest(
                    F.lit(1),
                    F.floor(F.lit(self.wave_seconds) / F.col("crawl_delay_s")),
                ).cast("int").alias("_ovr"),
            )
            head_budgets = overrides.select(
                "host",
                (
                    F.lit(int(self.head_factor))
                    * F.greatest(F.col("_ovr"), F.lit(int(self.per_host_budget)))
                ).cast("int").alias("budget"),
            )
            counts = counts.join(
                F.broadcast(head_budgets.withColumnRenamed("budget", "head_h")),
                "host",
                "left",
            ).select(
                "host", "n_pending",
                F.coalesce(F.col("head_h"), F.lit(H)).alias("head_h"),
            )
        else:
            counts = counts.withColumn("head_h", F.lit(H))
        counts.write.mode("overwrite").parquet(
            os.path.join(out, "head_counts.parquet")
        )
        politeness_rank(pending, H, self.nsalt, head_budgets).drop("rank").write.mode(
            "overwrite"
        ).parquet(os.path.join(out, "head.parquet"))
        with open(os.path.join(out, "head_meta.json"), "w") as f:
            json.dump({"H": H, "base_wave": upto}, f)

    def _read_head(self, upto: int | None):
        """(head_df, counts_df, meta) for a committed checkpoint's persisted
        candidate head, or None when absent/disabled."""
        if upto is None or not self.head_factor:
            return None
        out = self._checkpoint_dir(upto)
        meta_path = os.path.join(out, "head_meta.json")
        if not os.path.exists(meta_path):
            return None
        with open(meta_path) as f:
            meta = json.load(f)
        return (
            self.spark.read.parquet(os.path.join(out, "head.parquet")),
            self.spark.read.parquet(os.path.join(out, "head_counts.parquet")),
            meta,
        )

    def _write_ckpt_bloom(self, upto: int, state_path: str) -> None:
        """Persist the seen-set bloom shards next to the checkpoint, sized
        to the fetched count (2x headroom for post-compaction growth): the
        per-wave gate then builds shards over the DELTAS only and ORs them
        in (merge_bloom_shards) — without this, every wave re-shuffles the
        full fetched set just to rebuild an identical bloom."""
        from commoncrawlnewsdataset_spark.frontier.core import (
            bloom_num_bits,
            build_bloom_shards,
        )

        out = self._checkpoint_dir(upto)
        fetched = (
            self.spark.read.parquet(state_path)
            .filter(F.col("status") == "fetched")
            .select("url")
        )
        n = fetched.count()
        num_shards = 16
        m = bloom_num_bits(max(1024, (2 * n) // num_shards + 1))
        build_bloom_shards(
            fetched, "url", num_shards, m_bits_per_shard=m
        ).write.mode("overwrite").parquet(os.path.join(out, "bloom.parquet"))
        with open(os.path.join(out, "bloom_meta.json"), "w") as f:
            json.dump({"num_shards": num_shards, "m_bits_per_shard": m}, f)

    def _ckpt_bloom(self, upto: int | None):
        """(shards_df, meta) for a committed checkpoint's persisted bloom,
        or None when absent/not in bucket_state mode."""
        if upto is None or not self.use_bloom:
            return None
        out = self._checkpoint_dir(upto)
        meta_path = os.path.join(out, "bloom_meta.json")
        if not os.path.exists(meta_path):
            return None
        with open(meta_path) as f:
            meta = json.load(f)
        return self.spark.read.parquet(os.path.join(out, "bloom.parquet")), meta

    def expire_snapshots(self, keep_waves_after: int | None = None) -> list[int]:
        """Iceberg ``expire_snapshots`` analog: drop raw wave deltas covered
        by a committed checkpoint.  The horizon is the newest checkpoint
        <= ``keep_waves_after`` (default: the newest checkpoint overall) —
        NOT ``keep_waves_after`` itself: a wave W between a checkpoint C and
        the requested cutoff would otherwise lose deltas (C, W] that
        ``state(upto_wave=W)`` still needs, since W resolves from C plus
        every delta after it.  Clamping to a checkpoint guarantees every
        surviving wave resolves from a checkpoint at-or-below it plus intact
        deltas.  Manifests are KEPT (lineage metrics survive expiration).
        Returns the expired wave numbers."""
        import shutil

        ckpts = self.committed_checkpoints()
        if not ckpts:
            return []
        if keep_waves_after is None:
            horizon = ckpts[-1]
        else:
            covered = [c for c in ckpts if c <= keep_waves_after]
            if not covered:
                return []  # no checkpoint covers the requested range yet
            horizon = covered[-1]
        expired = []
        for w in self.committed_waves():
            if w <= horizon:
                delta = os.path.join(self._wave_dir(w), "delta.parquet")
                if os.path.isdir(delta):
                    shutil.rmtree(delta)
                    expired.append(w)
        return expired

    # ---- seed load (wave 0) ----------------------------------------------

    def load_seeds(self, seeds: DataFrame) -> None:
        """S1 frontier bootstrap: canonicalize, key, dedup (first discovery
        wins by priority desc then url), status=pending, wave=0.

        A bare url list is a valid seed set (the reference's seed files are
        one url per line): ``priority`` defaults to 0.0 and
        ``discovered_ts`` to the epoch — deterministic constants, so the
        dedup window and the wave ORDER CONTRACT stay reproducible."""
        if "priority" not in seeds.columns:
            seeds = seeds.withColumn("priority", F.lit(0.0))
        if "discovered_ts" not in seeds.columns:
            seeds = seeds.withColumn(
                "discovered_ts", F.lit("1970-01-01 00:00:00").cast("timestamp")
            )
        keyed = with_frontier_keys(seeds)
        w = Window.partitionBy("url").orderBy(F.desc("priority"), F.asc("discovered_ts"))
        deduped = keyed.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
        delta = deduped.select(
            "url", "url_hash", "host",
            F.lit("pending").alias("status"),
            F.col("priority").cast("double"),
            F.lit(0).alias("wave"),
            F.lit(0).alias("attempts"),
            F.col("discovered_ts").cast("timestamp"),
        )
        self._write_delta(delta, 0)
        n = self.spark.read.parquet(
            os.path.join(self._wave_dir(0), "delta.parquet")
        ).count()  # count the committed bytes, not a recompute of the plan
        self._commit(0, {"wave": 0, "seeded": n, "done": False,
                         "n_selected": 0, "n_fetched": 0, "n_failed": 0})

    # ---- one wave ----------------------------------------------------------

    def select_wave(
        self, state: DataFrame, parts=None, only_hosts=None,
        assume_no_fetched: bool = False,
    ) -> DataFrame:
        """Politeness-budgeted, robots-gated, dedup-guarded wave selection.

        No global ordering here: a total wave_seq would be a single-partition
        window (wave_order is display-only); the deterministic ORDER CONTRACT
        (priority desc, discovered_ts, url) is what parity relies on.

        ``parts`` (from _snapshot_parts) switches the URL-seen gate to the
        SPLIT form in bucket_state mode: checkpoint side joined as a
        bucketed scan with zero Exchange, delta side broadcast, bloom built
        incrementally from the persisted checkpoint shards.

        ``only_hosts`` (a small (host) DataFrame) restricts selection to
        those hosts — the partial-fallback leg of the candidate-head path.
        Per-host independence of the politeness rank (Window.partitionBy
        host) makes the restricted selection EXACTLY the full selection's
        rows for those hosts.

        ``assume_no_fetched`` (r8): the caller PROVED from wave metadata
        that the state holds no fetched rows (the only committed wave is a
        load_seeds wave, whose rows are all status=pending) — the URL-seen
        gate is the identity on such a state, so skip it, including its
        emptiness-probe job.  filter_unseen(pending, ∅) ≡ pending, so the
        selection is provably unchanged."""
        pending = state.filter(F.col("status") == "pending")
        if only_hosts is not None:
            pending = pending.join(F.broadcast(only_hosts), "host", "semi")
        host_budgets = None
        if self.use_robots and self.robots_rules is not None:
            pending = gate_by_robots(pending, self.robots_rules)
            if self.wave_seconds is not None:
                from commoncrawlnewsdataset_spark.frontier.robots import host_crawl_delays

                host_budgets = host_crawl_delays(self.robots_rules).select(
                    "host",
                    F.greatest(
                        F.lit(1),
                        F.floor(F.lit(self.wave_seconds) / F.col("crawl_delay_s")),
                    ).cast("int").alias("budget"),
                )
        if self.adaptive_budgets and self.last_wave() >= 1:
            from commoncrawlnewsdataset_spark.frontier.politeness import (
                adaptive_host_budgets,
            )

            ab = adaptive_host_budgets(state, self.last_wave(), self.per_host_budget)
            if host_budgets is None:
                host_budgets = ab
            else:  # both constraints apply: the stricter one wins per host
                host_budgets = (
                    host_budgets.withColumnRenamed("budget", "_b1")
                    .join(ab.withColumnRenamed("budget", "_b2"), "host", "outer")
                    .select(
                        "host",
                        F.least(
                            F.coalesce("_b1", "_b2"), F.coalesce("_b2", "_b1")
                        ).alias("budget"),
                    )
                )
        ckpt_df = parts[0] if parts is not None else None
        if self.bucket_state and ckpt_df is not None:
            from commoncrawlnewsdataset_spark.frontier.core import (
                filter_unseen_split,
            )

            _, deltas, ckpt_wave = parts
            big_seen = ckpt_df.filter(F.col("status") == "fetched").select("url")
            small_seen = (
                deltas.filter(F.col("status") == "fetched").select("url")
                if deltas is not None
                else None
            )
            # 'fetched' is terminal (requeue moves failed->pending only), so
            # ckpt_fetched ∪ delta_fetched IS the resolved fetched set — no
            # subtraction of superseded checkpoint rows needed
            bloom = self._ckpt_bloom(ckpt_wave)
            unseen = filter_unseen_split(
                pending,
                big_seen,
                small_seen,
                use_bloom=self.use_bloom,
                num_shards=bloom[1]["num_shards"] if bloom else 16,
                big_shards=bloom[0] if bloom else None,
                m_bits_per_shard=bloom[1]["m_bits_per_shard"] if bloom else None,
            )
        elif assume_no_fetched:
            unseen = pending
        else:
            fetched = state.filter(F.col("status") == "fetched").select("url")
            unseen = filter_unseen(pending, fetched, use_bloom=self.use_bloom)
        return politeness_rank(unseen, self.per_host_budget, self.nsalt, host_budgets)

    # partial-fallback bounds: more invalid hosts than BOTH of these and
    # the whole wave takes the full path (the invalid-host list must stay
    # broadcastable and the candidate leg must still be the common case)
    HEAD_PARTIAL_MAX_HOSTS = 100_000
    HEAD_PARTIAL_MAX_FRACTION = 0.10

    def _select_wave_head(self, head, parts):
        """Candidate-head wave selection (VERDICT r6 #3): rank only
        head ∪ post-compaction deltas instead of the full pending set.

        Returns ``(selected, invalid_hosts)``:

        - ``(df, None)`` — every truncated host PROVABLY selects
          identically from the candidates: a host whose pending set was
          cut at H needs >= budget un-superseded head rows surviving the
          gates — those rows keep their compaction-time total order, which
          dominates every pending row the head excluded (the excluded rows
          are unchanged since compaction, or their change rides in the
          deltas and therefore IS a candidate).  Hosts first seen after
          compaction and un-truncated hosts are complete in the candidate
          set by construction.
        - ``(df, invalid_df)`` — PARTIAL (r7.2): ``df`` covers the valid
          hosts from candidates; the caller runs the full-scan selection
          restricted to ``invalid_df``'s hosts and unions.  Per-host rank
          independence makes the union exactly the full selection, so one
          drained host no longer forces the O(pending) rank SHUFFLE for
          every host (the full leg still scans pending once, but its
          shuffle carries only the invalid hosts' rows).
        - ``(None, None)`` — head not usable (too shallow, adaptive
          budgets, or invalid hosts beyond the partial bounds — e.g. a
          reprioritize superseding everything): full path.
        """
        from commoncrawlnewsdataset_spark.frontier.core import filter_unseen_split

        head_df, counts, meta = head
        ckpt_df, deltas, ckpt_wave = parts
        H = int(meta["H"])
        if H < 2 * self.per_host_budget:
            return None, None  # a head this shallow drains immediately
        head_tag = head_df.withColumn("_h", F.lit(True))
        if deltas is not None:
            # same size gate as _compose_state (VERDICT r7 #1): past the
            # bound the hint drops and AQE chooses the join
            cand = head_tag.join(
                self._maybe_broadcast(deltas.select("url")), "url", "left_anti"
            ).unionByName(
                deltas.select(*head_df.columns).withColumn("_h", F.lit(False))
            )
        else:
            cand = head_tag
        pending = cand.filter(F.col("status") == "pending")
        host_budgets = None
        if self.use_robots and self.robots_rules is not None:
            pending = gate_by_robots(pending, self.robots_rules)
            if self.wave_seconds is not None:
                from commoncrawlnewsdataset_spark.frontier.robots import (
                    host_crawl_delays,
                )

                host_budgets = host_crawl_delays(self.robots_rules).select(
                    "host",
                    F.greatest(
                        F.lit(1),
                        F.floor(F.lit(self.wave_seconds) / F.col("crawl_delay_s")),
                    ).cast("int").alias("budget"),
                )
        big_seen = ckpt_df.filter(F.col("status") == "fetched").select("url")
        small_seen = (
            deltas.filter(F.col("status") == "fetched").select("url")
            if deltas is not None
            else None
        )
        bloom = self._ckpt_bloom(ckpt_wave)
        unseen = filter_unseen_split(
            pending,
            big_seen,
            small_seen,
            use_bloom=self.use_bloom,
            num_shards=bloom[1]["num_shards"] if bloom else 16,
            big_shards=bloom[0] if bloom else None,
            m_bits_per_shard=bloom[1]["m_bits_per_shard"] if bloom else None,
        ).cache()
        # validity: every TRUNCATED host must still hold >= budget gated,
        # un-superseded head survivors (their compaction order dominates
        # all excluded rows, so the true top-budget is inside the
        # candidate set).  r8: truncation is tested against the PER-HOST
        # persisted depth (head_h — head_factor × max(budget, crawl-delay
        # override)); heads persisted before r8 lack the column and use
        # the uniform meta H.
        depth = F.col("head_h") if "head_h" in counts.columns else F.lit(H)
        truncated = counts.filter(F.col("n_pending") > depth).select("host")
        surv = (
            unseen.filter(F.col("_h"))
            .groupBy("host")
            .agg(F.count("*").alias("_n_surv"))
        )
        check = truncated.join(surv, "host", "left")
        if host_budgets is not None:
            check = check.join(F.broadcast(host_budgets), "host", "left")
            need = F.coalesce(F.col("budget"), F.lit(self.per_host_budget))
        else:
            need = F.lit(self.per_host_budget)
        invalid = check.filter(
            F.coalesce(F.col("_n_surv"), F.lit(0)) < need
        ).select("host")
        invalid_hosts = [r["host"] for r in invalid.limit(
            self.HEAD_PARTIAL_MAX_HOSTS + 1
        ).collect()]
        if invalid_hosts:
            n_hosts = counts.count()
            if (
                len(invalid_hosts) > self.HEAD_PARTIAL_MAX_HOSTS
                or len(invalid_hosts) > self.HEAD_PARTIAL_MAX_FRACTION * max(1, n_hosts)
            ):
                unseen.unpersist()
                return None, None  # beyond the partial bounds: full path
            invalid_df = self.spark.createDataFrame(
                [(h,) for h in invalid_hosts], "host string"
            )
            cand_pending = unseen.join(F.broadcast(invalid_df), "host", "left_anti")
        else:
            invalid_df = None
            cand_pending = unseen
        self._head_unseen_cache = unseen  # run_wave unpersists post-fetch
        return (
            politeness_rank(
                cand_pending.drop("_h"), self.per_host_budget, self.nsalt,
                host_budgets,
            ),
            invalid_df,
        )

    def _delta_file_rows(self, delta_path: str) -> dict[int, int]:
        """Per-file row counts of a written delta, read from the parquet
        FOOTERS on the driver — the per-partition lineage of the committed
        bytes at zero Spark jobs (a file is the persisted partition)."""
        try:
            import pyarrow.parquet as pq

            files = sorted(
                f for f in os.listdir(delta_path)
                if f.endswith(".parquet") or f.startswith("part-")
            )
            return {
                i: pq.ParquetFile(os.path.join(delta_path, f)).metadata.num_rows
                for i, f in enumerate(files)
            }
        except Exception:
            return {}

    def _fetch(self, selected: DataFrame) -> DataFrame:
        """Fetch stage: frontier columns pass straight THROUGH the Arrow UDF,
        so outcomes need no join back to the selection (one shuffle fewer;
        the wide `selected` plan is computed exactly once)."""
        keep_payload = self.page_sink_dir is not None
        fetcher = self.fetcher or (
            simulated_fetch_with_payload if keep_payload else simulated_fetch
        )
        max_retries = self.max_retries

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ok, att, clen, bodies = [], [], [], []
                for u in pdf["url"]:
                    res = fetcher(u, max_retries)
                    ok.append(res[0])
                    att.append(res[1])
                    clen.append(res[2])
                    if keep_payload:
                        if len(res) < 4:
                            raise ValueError(
                                "page_sink_dir is set but the fetcher returned "
                                f"{len(res)} elements (no payload) — the sink "
                                "would silently fill html=None for every page. "
                                "Use a payload-returning fetcher: "
                                "make_http_fetcher(keep_content=True) or "
                                "simulated_fetch_with_payload."
                            )
                        bodies.append(res[3])
                out = pdf[["url", "url_hash", "host", "priority", "discovered_ts"]].copy()
                out["ok"] = ok
                # CUMULATIVE attempts: prior attempts (non-zero only for
                # re-queued failures) ride through the UDF, so requeue_failed
                # can bound total retries across waves
                out["attempts"] = pdf["attempts"].to_numpy() + att
                out["content_length"] = clen
                if keep_payload:
                    out["html"] = bodies
                yield out

        # Explicit fan-out: AQE sizes partitions by BYTES, and a wave of URLs
        # is tiny on disk but expensive per row (network/parse) — without this
        # repartition AQE coalesces the wave to ~1 partition and the fetch
        # runs single-threaded.  Fetch parallelism must track cores, not MB.
        # r8: partition by url_hash instead of round-robin — a deterministic
        # key survives map-stage retries without the round-robin path's
        # local sort-before-repartition (guide §2.5 / SPARK-38388: rr +
        # recomputed input can duplicate or lose rows; Spark guards that
        # with a per-partition sort, which hash keys don't need).  url_hash
        # is murmur3 of the url — already on every row, uniformly spread.
        parallelism = self.spark.sparkContext.defaultParallelism * self.fetch_tasks_per_core
        schema = FETCH_PAGE_SCHEMA if keep_payload else FETCH_RESULT_SCHEMA
        return (
            selected.select(
                "url", "url_hash", "host", "priority", "discovered_ts",
                F.col("attempts").cast("int").alias("attempts"),
            )
            .repartition(parallelism, F.col("url_hash"))
            .mapInPandas(gen, schema)
        )

    def _page_sink_path(self, wave: int) -> str:
        return os.path.join(self.page_sink_dir, f"wave={wave:05d}.parquet")

    def pages(self) -> DataFrame:
        """Fetched pages in the input_hint shape (url, warc_ts, html, text,
        lang) across all sink waves — the source the extraction spine
        (sources.pages / functions.extract) reads.  warc_ts is the frontier
        discovery time; text/lang are filled downstream by extract + langid."""
        if self.page_sink_dir is None:
            raise ValueError("WaveRunner has no page_sink_dir")
        df = self.spark.read.parquet(os.path.join(self.page_sink_dir, "wave=*.parquet"))
        return df.filter(F.col("ok")).select(
            "url",
            F.col("discovered_ts").alias("warc_ts"),
            "html",
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("string").alias("lang"),
        )

    def run_wave(self) -> dict:
        """Execute the next wave; returns its manifest (committed atomically:
        delta parquet first, manifest last).

        Driver-job budget per wave (matters at high wave cadence): one
        isEmpty probe on the seen-set, ONE combined metrics collect
        (per-partition lineage × status — ~2·numPartitions tiny rows), the
        delta write, and optionally the top-host stats job.  There is no
        separate pre-count: emptiness is detected from the metrics."""
        wave = self.last_wave() + 1
        t0 = time.time()
        # ONE snapshot resolution per wave: in bucket_state mode the parts
        # feed the gates directly and the composed state is built FROM them
        # (a separate self.state() call would re-resolve; the delta window
        # additionally caches because the gates reference it ~3x per wave —
        # r5 review finding)
        parts = self._snapshot_parts() if self.bucket_state else None
        state = None
        selected = None
        head_used = False
        self._head_unseen_cache = None
        if parts is not None:
            ckpt_df, deltas, ckpt_wave = parts
            if deltas is not None:
                deltas = deltas.cache()
                parts = (ckpt_df, deltas, ckpt_wave)
            if ckpt_df is not None and not self.adaptive_budgets:
                head = self._read_head(ckpt_wave)
                if head is not None:
                    # candidate-head selection (VERDICT r6 #3): rank only
                    # head ∪ deltas; the FULL pending set is neither
                    # resolved nor scanned this wave unless validity fails
                    selected, _invalid = self._select_wave_head(head, parts)
                    head_used = selected is not None
                    if selected is not None and _invalid is not None:
                        # partial fallback (r7.2): full-scan selection for
                        # the drained hosts only; per-host rank
                        # independence makes the union exact
                        head_used = "partial"
                        state = self._compose_state(ckpt_df, deltas).cache()
                        selected = selected.unionByName(
                            self.select_wave(state, parts, only_hosts=_invalid)
                        )
            if selected is None:
                state = self._compose_state(ckpt_df, deltas).cache()
        else:
            state = self.state().cache()
        if selected is None:
            # r8: on the first wave after a seed load (the only committed
            # wave is a load_seeds wave), every row is status=pending by
            # construction — the URL-seen gate is the identity and its
            # emptiness-probe job is pure cost.  PROVEN from the wave-0
            # manifest ("seeded" is written only by load_seeds; fork
            # manifests, which can carry fetched rows, say "forked_from").
            seed_only = False
            if parts is None:
                waves = self.committed_waves()
                if waves == [0]:
                    try:
                        seed_only = "seeded" in self.read_manifest(0)
                    except OSError:
                        seed_only = False
            selected = self.select_wave(state, parts, assume_no_fetched=seed_only)

        results = self._fetch(selected)
        if self.page_sink_dir is not None:
            # One fetch pass: persist payloads immediately, then derive the
            # delta/metrics by re-reading the sink — parquet column pruning
            # keeps the binary html out of every downstream scan.
            results.write.mode("overwrite").parquet(self._page_sink_path(wave))
            results = self.spark.read.parquet(self._page_sink_path(wave))
        outcome_cols = [
            F.col("url"), F.col("url_hash"), F.col("host"),
            F.when(F.col("ok"), "fetched").otherwise("failed").alias("status"),
            F.col("priority").cast("double"),
            F.lit(wave).alias("wave"),
            F.col("attempts"),
            F.col("discovered_ts").cast("timestamp"),
        ]
        if self.page_sink_dir is None and self.link_expander is None:
            # r8 WRITE-FIRST path (the common crawl-simulation shape): the
            # delta WRITE is the fetch's one materialization — the sink
            # variant of "fetch exactly once" without the ~wave-sized
            # .cache() the old path paid (cache build + eviction pressure
            # measured ~1.5 s/wave at 400k urls).  Metrics then derive
            # from the committed bytes: status counts from a column-pruned
            # re-read (status+attempts only), per-file lineage from the
            # parquet footers driver-side (no job at all).  With a page
            # sink the sink write already plays this role; with a link
            # expander the outcomes feed discovery and stay on the cached
            # path below.
            outcome = results.select(*outcome_cols)
            t_select_built = time.time()
            self._write_delta(
                outcome.coalesce(self.spark.sparkContext.defaultParallelism), wave
            )
            t_written = time.time()
            if self._head_unseen_cache is not None:
                self._head_unseen_cache.unpersist()
                self._head_unseen_cache = None
            delta_path = os.path.join(self._wave_dir(wave), "delta.parquet")
            written = self.spark.read.parquet(delta_path)
            status_rows = (
                written.groupBy("status").agg(F.count("*").alias("rows")).collect()
            )
            t_metrics = time.time()
            status_counts = {r["status"]: r["rows"] for r in status_rows}
            n_selected = sum(status_counts.values())
            part_rows = self._delta_file_rows(delta_path)
            if not part_rows and n_selected:
                part_rows = {0: n_selected}  # footer read unavailable
            if state is not None:
                state.unpersist()
            if parts is not None and parts[1] is not None:
                parts[1].unpersist()
            if n_selected == 0:
                manifest = {"wave": wave, "n_selected": 0, "done": True,
                            "head_used": head_used,
                            "elapsed_s": time.time() - t0}
                self._commit(wave, manifest)
                return manifest
            host_stats = []
            if self.detailed_metrics:
                host_stats = [
                    r.asDict()
                    for r in written.groupBy("host")
                    .agg(F.count("*").alias("n"), F.sum("attempts").alias("attempts"))
                    .orderBy(F.desc("n"), "host")
                    .limit(20)
                    .collect()
                ]
            elapsed = time.time() - t0
            manifest = {
                "wave": wave,
                "phase_s": {
                    "plan": round(t_select_built - t0, 3),
                    "fetch_write": round(t_written - t_select_built, 3),
                    "metrics": round(t_metrics - t_written, 3),
                    "host_stats": round(time.time() - t_metrics, 3),
                },
                "n_selected": n_selected,
                "n_fetched": status_counts.get("fetched", 0),
                "n_failed": status_counts.get("failed", 0),
                "n_discovered": 0,
                "head_used": head_used,
                "per_partition_rows": [
                    {"partition": p, "rows": n} for p, n in sorted(part_rows.items())
                ],
                "top_hosts": host_stats,
                "elapsed_s": elapsed,
                "urls_per_sec": n_selected / elapsed if elapsed > 0 else None,
                "done": False,
            }
            self._commit(wave, manifest)
            return manifest
        outcome = results.select(*outcome_cols).cache()

        # per-partition lineage + status counts in ONE pass (north_rule:
        # "checkpoints each crawl wave ... with per-partition lineage and
        # fetch/dedup metrics")
        t_select_built = time.time()
        lineage = (
            outcome.groupBy(F.spark_partition_id().alias("partition"), "status")
            .agg(F.count("*").alias("rows"), F.sum("attempts").alias("attempts"))
            .collect()
        )
        t_fetched = time.time()
        if self._head_unseen_cache is not None:
            self._head_unseen_cache.unpersist()
            self._head_unseen_cache = None
        n_selected = sum(r["rows"] for r in lineage)
        if n_selected == 0:
            manifest = {"wave": wave, "n_selected": 0, "done": True,
                        "head_used": head_used,
                        "elapsed_s": time.time() - t0}
            self._write_delta(outcome.coalesce(1), wave)
            self._commit(wave, manifest)
            outcome.unpersist()
            if state is not None:
                state.unpersist()
            if parts is not None and parts[1] is not None:
                parts[1].unpersist()
            return manifest

        status_counts: dict[str, int] = {}
        part_rows: dict[int, int] = {}
        for r in lineage:
            status_counts[r["status"]] = status_counts.get(r["status"], 0) + r["rows"]
            part_rows[r["partition"]] = part_rows.get(r["partition"], 0) + r["rows"]
        host_stats = []
        if self.detailed_metrics:
            host_stats = [
                r.asDict()
                for r in outcome.groupBy("host")
                .agg(F.count("*").alias("n"), F.sum("attempts").alias("attempts"))
                .orderBy(F.desc("n"), "host")
                .limit(20)
                .collect()
            ]

        t_stats = time.time()
        n_discovered = 0
        delta = outcome
        if self.link_expander is not None:
            # with a page sink the expander sees the sink-backed rows WITH
            # html, enabling real link discovery from page content
            # (frontier.links.make_html_link_expander); without one it sees
            # the plain outcomes (url/priority/ts), as before
            if self.page_sink_dir is not None:
                src_rows = results.filter(F.col("ok")).withColumn(
                    "status", F.lit("fetched")
                )
            else:
                src_rows = outcome.filter(F.col("status") == "fetched")
            discovered = self.link_expander(src_rows)
            keyed = with_frontier_keys(discovered)
            # Deterministic representative per discovered url (NOT
            # dropDuplicates, which picks an arbitrary row under parallelism):
            # priority feeds politeness ranking, so crawl order / resume
            # reproducibility requires the same tie-break as load_seeds.
            dw = Window.partitionBy("url").orderBy(
                F.desc("priority"), F.asc("discovered_ts"), F.asc("url")
            )
            if self.bucket_state and parts is not None and parts[0] is not None:
                # split gate: the frontier-sized component joins as the
                # bucketed checkpoint scan (no Exchange); only the
                # wave-bounded component (deltas + this wave's outcomes)
                # broadcasts
                from commoncrawlnewsdataset_spark.frontier.core import (
                    filter_unseen_split,
                )

                ckpt_df, deltas, _ = parts
                known_small = outcome.select("url")
                if deltas is not None:
                    known_small = known_small.unionByName(deltas.select("url"))
                gated = filter_unseen_split(
                    keyed, ckpt_df.select("url"), known_small, use_bloom=False
                )
            else:
                known = state.select("url").unionByName(outcome.select("url"))
                gated = filter_unseen(keyed, known, use_bloom=False)
            fresh = (
                gated
                .withColumn("_rn", F.row_number().over(dw))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
            new_pending = fresh.select(
                "url", "url_hash", "host",
                F.lit("pending").alias("status"),
                F.col("priority").cast("double"),
                F.lit(wave).alias("wave"),
                F.lit(0).alias("attempts"),
                F.col("discovered_ts").cast("timestamp"),
            ).cache()
            n_discovered = new_pending.count()
            delta = outcome.unionByName(new_pending)
        # outcome is cached by the metrics collect above, so this coalesce
        # reads the cache with `cores` tasks instead of writing cores×8 tiny
        # parquet files from the fetch fan-out (it can NOT collapse the fetch
        # stage's parallelism — that stage already ran)
        delta = delta.coalesce(self.spark.sparkContext.defaultParallelism)
        self._write_delta(delta, wave)
        elapsed = time.time() - t0
        manifest = {
            "wave": wave,
            "phase_s": {
                "plan": round(t_select_built - t0, 3),
                "select_fetch_metrics": round(t_fetched - t_select_built, 3),
                "host_stats": round(t_stats - t_fetched, 3),
                "write": round(time.time() - t_stats, 3),
            },
            "n_selected": n_selected,
            "n_fetched": status_counts.get("fetched", 0),
            "n_failed": status_counts.get("failed", 0),
            "n_discovered": n_discovered,
            "head_used": head_used,
            "per_partition_rows": [
                {"partition": p, "rows": n} for p, n in sorted(part_rows.items())
            ],
            "top_hosts": host_stats,
            "elapsed_s": elapsed,
            "urls_per_sec": n_selected / elapsed if elapsed > 0 else None,
            "done": False,
        }
        self._commit(wave, manifest)
        if state is not None:
            state.unpersist()
        if parts is not None and parts[1] is not None:
            parts[1].unpersist()
        outcome.unpersist()
        return manifest

    def run(
        self,
        max_waves: int = 100,
        compact_every: int | None = None,
        expire: bool = False,
    ) -> list[dict]:
        """Wave loop until the frontier drains (or max_waves).
        `compact_every`: checkpoint the resolved state every N waves so the
        per-wave snapshot read stays O(delta), not O(log) — and, in
        bucket_state mode, so the Exchange-free gate path engages at all.
        `expire`: after each compaction, delete the delta files the new
        checkpoint covers (the documented S6 divergence: append-only log +
        compact/expire; resume keeps working from the checkpoint)."""
        manifests = []
        for _ in range(max_waves):
            m = self.run_wave()
            manifests.append(m)
            if (
                compact_every
                and not m.get("done")
                and m["wave"] % compact_every == 0
            ):
                self.compact(m["wave"])
                if expire:
                    m["expired_waves"] = self.expire_snapshots()
            if m.get("done"):
                break
        return manifests

    def crawl_order(self) -> DataFrame:
        """Total fetch order across committed waves as an ORDERED DataFrame
        (wave, then the deterministic ordering contract: priority DESC,
        discovered_ts, url) with a global ``seq`` rank.  Returns a DataFrame
        — never a driver-side list — because at 10^10 urls the order is a
        dataset, not a value; consumers limit/write it themselves.  ``seq``
        is the exact global row_number (the sort key is unique per url),
        computed by the range-partitioned two-phase ranged_row_number
        (VERDICT r4 #3): a bare no-partition window rank would move every
        fetched url through a single task — the same funnel class as a
        collect()."""
        from commoncrawlnewsdataset_spark.frontier.politeness import (
            ranged_row_number,
        )

        keys = [
            F.asc("wave"), F.desc("priority"), F.asc("discovered_ts"), F.asc("url")
        ]
        return ranged_row_number(
            self.state()
            .filter(F.col("status").isin("fetched", "failed"))
            .select("wave", "priority", "discovered_ts", "url", "status"),
            keys,
            "seq",
        )
