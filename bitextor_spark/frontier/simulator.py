"""Single-threaded reference crawl simulator — the golden oracle.

Implements the complete crawl contract (SURVEY.md §2.2, C1-C16) in plain
Python over a ``World``: canonicalization + seen-set (C5/C6), scope rules
(C7/C8), per-host BFS order with politeness and budgets (C1/C3/C9/C10),
retries (C11), crawl limits (C12), outlink extraction caps (C13), metrics
(C17). The Spark engine must reproduce this EXACTLY — same fetch sequence,
same final URL-seen set — at any parallelism level (the analog of the
reference's golden-output md5 comparison, tests/common.sh:27-60).

Determinism rules (the contract the engine must match):
- virtual clock; epoch e covers [e·W, (e+1)·W).
- per-host queue order: (hop asc, url_canon asc); walk via
  ``politeness.schedule_host``.
- global fetch order: events sorted by (epoch, fetch_start_ms, host,
  url_canon) — a total order because two events on one host can't share a
  start time.
- discoveries in epoch e join the frontier for epoch e+1 (wave barrier).
- when several pages discover one URL in the same epoch, the discoverer
  that is first in global fetch order wins (assigns hop/seed lineage).
- candidates are scope-checked, then seen-checked; every admitted URL
  enters the seen set exactly once.
- global fetch budget is enforced at epoch granularity.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from bitextor_spark.config import CrawlConfig
from bitextor_spark.frontier.politeness import (
    OUTCOME_FETCHED,
    OUTCOME_RETRY,
    FetchEvent,
    QueueEntry,
    schedule_host,
)
from bitextor_spark.frontier.world import World, server_crawl_delay
from bitextor_spark.functions.urls import (
    canonicalize_url,
    host_of,
    max_segment_repetitions,
    path_depth,
    registered_domain,
    resolve_outlink,
)


@dataclass
class LogRow:
    seq: int
    epoch: int
    url_canon: str
    host: str
    hop: int
    seed_id: int
    retry_count: int
    fetch_start_ms: int
    fetch_ms: int
    status: int
    outcome: str


@dataclass
class SimResult:
    fetch_log: list[LogRow]
    seen: set[str]
    frontier: dict[str, dict]
    metrics: dict[str, dict]  # host -> counters
    epochs_run: int = 0


@dataclass
class _Entry:
    hop: int
    seed_id: int
    retry_count: int = 0
    not_before_ms: int = 0
    state: str = "QUEUED"
    trans_hops: int = 0  # trailing embed-hop count (transclusion chain)
    priority: float = 1.0  # OPIC cash (C10)


def _is_embed(canon: str, cfg: CrawlConfig) -> bool:
    """Embed-kind link ('E' hop): resource extension on the path."""
    from urllib.parse import urlsplit

    path = (urlsplit(canon).path or "").lower()
    return path.endswith(tuple(cfg.embed_extensions))


def _in_scope(
    canon: str | None,
    host: str,
    hop: int,
    trans_hops: int,
    seed_domains: set[str],
    robots: dict[str, tuple[int, list[str]]],
    cfg: CrawlConfig,
) -> bool:
    """Full decide-rule chain (last-match-wins, crawler-beans.cxml:131-186).

    Same ordered semantics as plans/scope.py::apply_scope — the two are
    kept in lockstep by the engine↔simulator parity tests."""
    if canon is None:
        return False
    import re
    from urllib.parse import urlsplit

    path = urlsplit(canon).path or "/"
    if path in cfg.prerequisite_paths:
        return True  # ACCEPT prerequisite (last rule) overrides all rejects
    if path_depth(canon) > cfg.max_path_depth:
        return False
    if max_segment_repetitions(canon) > cfg.max_repetitions:
        return False
    if any(b in host for b in cfg.blacklist_hosts):
        return False
    if any(re.search(p, canon) for p in cfg.reject_url_regexes):
        return False
    _, disallow = robots.get(host, (0, []))
    if disallow and any(path.startswith(p) for p in disallow):
        return False
    if 1 <= trans_hops <= cfg.max_trans_hops:
        return True  # ACCEPT transclusion: fetchable outside seed scope
    return registered_domain(host) in seed_domains and hop <= cfg.max_hops


def simulate(world: World, cfg: CrawlConfig | None = None) -> SimResult:
    cfg = cfg or CrawlConfig()
    frontier: dict[str, _Entry] = {}
    seen: set[str] = set()
    next_allowed: dict[str, int] = {}
    metrics: dict[str, dict] = {}
    log: list[LogRow] = []

    # robots freshness (robotsValidityDurationSeconds semantics): per-host
    # cached Crawl-delay + fetch timestamp; refreshed at epoch_start for
    # any host with schedulable work whose cache is missing or older than
    # the TTL. Static mode (robots_ttl_ms=None) reads world.robots direct.
    robots_fetched_ms: dict[str, int] = {}
    cached_delay: dict[str, int] = {}

    def crawl_delay(host: str, epoch_start: int) -> int:
        if cfg.robots_ttl_ms is None:
            return world.robots.get(host, (0, []))[0]
        fetched = robots_fetched_ms.get(host)
        if fetched is None or epoch_start - fetched >= cfg.robots_ttl_ms:
            robots_fetched_ms[host] = epoch_start
            cached_delay[host] = server_crawl_delay(world, host, epoch_start)
        return cached_delay[host]

    def m(host: str) -> dict:
        return metrics.setdefault(
            host,
            {"fetched": 0, "errors": 0, "skipped_seen": 0, "skipped_scope": 0,
             "queued": 0},
        )

    # --- seeds (epoch 0 frontier) ---
    seed_domains: set[str] = set()
    seed_canons: list[tuple[str, int]] = []
    for sid, s in enumerate(world.seeds):
        canon = canonicalize_url(s)
        if canon is None:
            continue
        seed_domains.add(registered_domain(host_of(canon)))
        seed_canons.append((canon, sid))
    # NOTE: metrics cover fetch epochs only (the engine writes no metrics
    # for the bootstrap commit); seed admission is not counted.
    for canon, sid in seed_canons:
        # C2 https fallback (utils/common.py:155-181 semantics): a dead
        # http seed whose https twin exists bootstraps as https
        if (
            canon.startswith("http://")
            and canon not in world.pages
            and ("https://" + canon[len("http://"):]) in world.pages
        ):
            canon = "https://" + canon[len("http://"):]
        host = host_of(canon)
        if not _in_scope(canon, host, 0, 0, seed_domains, world.robots, cfg):
            continue
        if canon in seen:
            continue
        seen.add(canon)
        frontier[canon] = _Entry(hop=0, seed_id=sid)  # seed cash 1.0

    total_fetched = 0
    epoch = 0
    while epoch < cfg.max_epochs and total_fetched < cfg.max_fetches:
        epoch_start = epoch * cfg.epoch_window_ms
        epoch_end = epoch_start + cfg.epoch_window_ms

        # group queued entries by host
        by_host: dict[str, list[QueueEntry]] = {}
        for canon, e in frontier.items():
            if e.state != "QUEUED" or e.not_before_ms >= epoch_end:
                continue
            if cfg.queue_order == "priority" and e.priority < cfg.priority_floor:
                continue  # precedence floor: below-floor entries never run
            host = host_of(canon)
            page = world.pages.get(canon)
            status = page.status if page else 404
            fetch_ms = page.fetch_ms if page else cfg.default_fetch_ms
            by_host.setdefault(host, []).append(
                QueueEntry(canon, e.hop, e.seed_id, e.retry_count,
                           e.not_before_ms, status, fetch_ms, e.priority)
            )
        if not by_host:
            if not any(e.state == "QUEUED" for e in frontier.values()):
                break  # crawl exhausted
            epoch += 1  # everything blocked by not_before; let time pass
            continue

        # per-host politeness walk
        all_events: list[tuple[str, FetchEvent]] = []
        for host in sorted(by_host):
            delay_s = crawl_delay(host, epoch_start)
            events, cursor = schedule_host(
                by_host[host], next_allowed.get(host, 0), delay_s,
                epoch_start, epoch_end, cfg,
                politeness=cfg.politeness_for(host),
            )
            if events:
                next_allowed[host] = cursor
            for ev in events:
                all_events.append((host, ev))
        if not all_events:
            # nothing schedulable this window (all blocked by not_before)
            epoch += 1
            continue

        # global deterministic order
        all_events.sort(key=lambda he: (he[1].fetch_start_ms, he[0], he[1].url_canon))

        discovered: dict[str, tuple[int, int, int, float]] = {}  # canon -> (hop, seed_id, trans_hops, priority)
        for host, ev in all_events:
            log.append(
                LogRow(
                    seq=len(log), epoch=epoch, url_canon=ev.url_canon, host=host,
                    hop=ev.hop, seed_id=ev.seed_id, retry_count=ev.retry_count,
                    fetch_start_ms=ev.fetch_start_ms, fetch_ms=ev.fetch_ms,
                    status=ev.status, outcome=ev.outcome,
                )
            )
            entry = frontier[ev.url_canon]
            if ev.outcome == OUTCOME_FETCHED:
                entry.state = "FETCHED"
                total_fetched += 1
                m(host)["fetched"] += 1
            elif ev.outcome == OUTCOME_RETRY:
                entry.retry_count += 1
                entry.not_before_ms = ev.fetch_start_ms + cfg.retry_delay_ms
                m(host)["errors"] += 1
            else:  # FAILED
                entry.state = "FAILED"
                m(host)["errors"] += 1

            # outlink discovery (only successful 2xx pages yield content)
            if ev.outcome == OUTCOME_FETCHED and 200 <= ev.status < 300:
                page = world.pages.get(ev.url_canon)
                if page is None:
                    continue
                parent = frontier[ev.url_canon]
                parent_trans = parent.trans_hops
                # resolved unique outlinks first: the OPIC cash split is
                # parent.priority / n over ALL resolved unique links
                page_seen: set[str] = set()
                uniq: list[str] = []
                for link in page.outlinks[: cfg.max_outlinks]:
                    canon = resolve_outlink(ev.url_canon, link)
                    if canon is None or canon in page_seen:
                        continue
                    page_seen.add(canon)
                    uniq.append(canon)
                cash = parent.priority / len(uniq) if uniq else 0.0
                for canon in uniq:
                    lhost = host_of(canon)
                    trans = parent_trans + 1 if _is_embed(canon, cfg) else 0
                    if not _in_scope(canon, lhost, ev.hop + 1, trans,
                                     seed_domains, world.robots, cfg):
                        m(lhost or host)["skipped_scope"] += 1
                        continue
                    if canon in seen or canon in discovered:
                        m(lhost)["skipped_seen"] += 1
                        continue
                    discovered[canon] = (ev.hop + 1, ev.seed_id, trans, cash)

        # wave barrier: admit discoveries for epoch e+1
        for canon, (hop, sid, trans, prio) in discovered.items():
            seen.add(canon)
            frontier[canon] = _Entry(hop=hop, seed_id=sid, trans_hops=trans,
                                     priority=prio)
            m(host_of(canon))["queued"] += 1

        epoch += 1

    return SimResult(
        fetch_log=log,
        seen=seen,
        frontier={k: vars(v) for k, v in frontier.items()},
        metrics=metrics,
        epochs_run=epoch,
    )
