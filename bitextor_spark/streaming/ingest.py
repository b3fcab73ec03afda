"""Streaming ingest operators (SURVEY.md §2.10).

The reference's crawl loop is batch-incremental (epoch waves over Iceberg
snapshots — the north-rule design), but a production front-end also wants a
*streaming* intake path: URL discoveries arriving continuously, deduped and
canonicalized before they hit the frontier, and fetch-log analytics over
event time. These are the Structured Streaming twins of the batch
operators:

- ``streaming_url_intake``: canonicalize (Arrow UDF) → xxhash64 →
  ``dropDuplicates`` on url_hash bounded by a watermark — Spark's built-in
  stateful dedup store standing in for the URL-seen structure on the
  streaming path (C5/C6).
- ``streaming_fetch_metrics``: tumbling event-time windows with a watermark
  for late fetch events (C17 as a live dashboard feed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bitextor_spark.functions.urls import canonicalize_udf


def streaming_url_intake(
    raw_urls: DataFrame,  # streaming DF: (url string, discovered_at timestamp)
    watermark: str = "10 minutes",
) -> DataFrame:
    """Canonicalize + watermark-bounded exact dedup of a URL stream."""
    return (
        raw_urls.withColumn("url_canon", canonicalize_udf("url"))
        .filter(F.col("url_canon").isNotNull())
        .withColumn("url_hash", F.xxhash64("url_canon"))
        .withWatermark("discovered_at", watermark)
        .dropDuplicates(["url_hash"])
        .select("url_hash", "url_canon", "discovered_at")
    )


def streaming_fetch_metrics(
    fetch_events: DataFrame,  # streaming DF: (host, status, fetched_at ts)
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Per-host windowed fetch counters over event time (late-data-safe)."""
    return (
        fetch_events.withWatermark("fetched_at", watermark)
        .groupBy(F.window("fetched_at", window).alias("w"), "host")
        .agg(
            F.count(F.lit(1)).alias("fetched"),
            F.sum(F.when(F.col("status") >= 500, 1).otherwise(0)).alias("errors"),
        )
        .select(
            F.col("w.start").alias("window_start"), "host", "fetched", "errors"
        )
    )


def streaming_politeness_gate(
    fetch_requests: DataFrame,  # streaming: (host, url_canon, req_ts, fetch_ms, crawl_delay_s)
    cfg=None,
):
    """Custom stateful operator (``applyInPandasWithState``): a per-host
    politeness gate over a continuous fetch-request stream.

    State per host = the virtual next-allowed timestamp (ms), carried
    ACROSS micro-batches — the streaming twin of the batch engine's
    host_state table. Each micro-batch walks its host group in
    (req_ts, url_canon) order with the batch scheduler's exact snooze rule
    (config.effective_delay_ms: clamp(delay_factor x duration) raised to
    the robots Crawl-delay): requests whose slot fits emit FETCH with the
    scheduled start; requests arriving before the host is allowed emit
    DEFER. Nothing here is wall-clock: the stream's own event time drives
    the virtual clock, so replays are deterministic.
    """
    import pandas as pd

    from bitextor_spark.config import CrawlConfig

    cfg = cfg or CrawlConfig()

    def gate(key, pdfs, state):
        (host,) = key
        next_allowed = state.get[0] if state.exists else 0
        rows = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["req_ts", "url_canon"])
        for _, r in batch.iterrows():
            req_ms = int(r["req_ts"].timestamp() * 1000)
            if req_ms >= next_allowed:
                start = req_ms
                delay = cfg.effective_delay_ms(
                    int(r["fetch_ms"]), int(r["crawl_delay_s"])
                )
                next_allowed = start + int(r["fetch_ms"]) + delay
                rows.append((host, r["url_canon"], "FETCH", start))
            else:
                rows.append((host, r["url_canon"], "DEFER", next_allowed))
        state.update((next_allowed,))
        yield pd.DataFrame(
            rows, columns=["host", "url_canon", "decision", "scheduled_ms"]
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return fetch_requests.groupBy("host").applyInPandasWithState(
        gate,
        outputStructType=(
            "host string, url_canon string, decision string, scheduled_ms long"
        ),
        stateStructType="next_allowed_ms long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
