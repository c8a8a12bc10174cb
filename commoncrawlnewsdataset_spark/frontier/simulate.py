"""In-process model of the reference's download scheduler, used as the parity
oracle for the frontier (SURVEY §5 'crawl-ordering/URL-seen parity').

Reference behavior (01_download_newscrawl.py:84-96):
- seed list processed in FIFO order (ThreadPoolExecutor.map preserves
  submission order; max_workers=10 is a global concurrency budget),
- a url is skipped iff its local file already exists (the URL-seen set),
- every non-skipped url is fetched exactly once (retries internal).

The model exposes the fetched set and the deterministic start order, chunked
into budget-sized waves — exactly what WaveRunner must reproduce in
reference-parity mode (single virtual host, priority constant, discovered_ts
encoding seed order, politeness budget = the reference's global budget).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class ReferenceSchedulerModel:
    budget: int = 10
    already_fetched: set[str] = field(default_factory=set)

    def run(self, seed_urls: list[str]) -> tuple[list[str], list[list[str]]]:
        """Returns (total start order, wave chunks).  Duplicate seeds collapse
        to their first occurrence (file-exists check, 01:88-90)."""
        order: list[str] = []
        seen = set(self.already_fetched)
        for url in seed_urls:
            if url in seen:
                continue
            seen.add(url)
            order.append(url)
        waves = [order[i : i + self.budget] for i in range(0, len(order), self.budget)]
        return order, waves
