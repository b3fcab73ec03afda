"""Per-host politeness walk — the sequential core of the scheduler.

THE crawl-semantics contract, shared verbatim by the single-threaded
reference simulator and the Spark engine's per-host ``applyInPandas``
groups, exactly as the canonicalizer is shared: the distributed engine is
then tested for everything distribution can break (ordering, dedup races,
scope, seen-set maintenance, resume), while the per-host timing rule has a
single definition.

Semantics (cited from the studied reference):
- queue order per host: (hop asc, url_canon asc) — BFS per host like
  ``wget --mirror`` recursion levels (bitextor_wget.py:45-82), with a
  total lexicographic tiebreak for reproducibility (the reference sorts
  its host lists for the same reason, Snakefile:335-339).
- wait after each fetch: max(clamp(delay_factor × duration, min, max),
  robots Crawl-delay capped at 300 s) — crawler-beans.cxml:362-368 +
  bitextor_wget.py:148-155.
- per-epoch budget: ``replenish_per_epoch`` units; a success costs 1, a
  failure costs ``error_penalty`` (balanceReplenishAmount /
  errorPenaltyAmount, crawler-beans.cxml:399-428).
- retry: status ≥ 500 ⇒ re-queue with not_before += retry_delay until
  max_retries (crawler-beans.cxml:410-411).

The walk is sequential *by definition* (each fetch's start time depends on
the previous fetch's duration); it runs inside Arrow-batched per-host
groups of at most a few hundred rows, never as a row-at-a-time UDF.
"""

from __future__ import annotations

from typing import NamedTuple

from bitextor_spark.config import CrawlConfig

OUTCOME_FETCHED = "FETCHED"
OUTCOME_RETRY = "RETRY"
OUTCOME_FAILED = "FAILED"


class QueueEntry(NamedTuple):
    url_canon: str
    hop: int
    seed_id: int
    retry_count: int
    not_before_ms: int
    status: int  # resolved page status (404 if unknown URL)
    fetch_ms: int


class FetchEvent(NamedTuple):
    url_canon: str
    hop: int
    seed_id: int
    retry_count: int
    fetch_start_ms: int
    fetch_ms: int
    status: int
    outcome: str


def schedule_host(
    entries: list[QueueEntry],
    next_allowed_ms: int,
    crawl_delay_s: int,
    epoch_start_ms: int,
    epoch_end_ms: int,
    cfg: CrawlConfig,
) -> tuple[list[FetchEvent], int]:
    """Replay one host's fetches inside one epoch window.

    Returns (events in fetch order, new next_allowed_ms). Entries that do
    not fit the window (or are blocked by not_before) are simply not
    emitted — they stay queued.
    """
    events: list[FetchEvent] = []
    cursor = max(next_allowed_ms, epoch_start_ms)
    budget_spent = 0
    for e in sorted(entries, key=lambda x: (x.hop, x.url_canon)):
        if budget_spent >= cfg.replenish_per_epoch:
            break
        if cursor >= epoch_end_ms:
            break
        start = max(cursor, e.not_before_ms)
        if start >= epoch_end_ms:
            continue  # blocked by not_before; later entries may still fit
        success = e.status < 500
        if success:
            outcome = OUTCOME_FETCHED
            budget_spent += 1
        else:
            outcome = (
                OUTCOME_FAILED if e.retry_count + 1 > cfg.max_retries else OUTCOME_RETRY
            )
            budget_spent += cfg.error_penalty
        events.append(
            FetchEvent(
                e.url_canon, e.hop, e.seed_id, e.retry_count,
                start, e.fetch_ms, e.status, outcome,
            )
        )
        cursor = start + e.fetch_ms + cfg.effective_delay_ms(e.fetch_ms, crawl_delay_s)
    return events, cursor
