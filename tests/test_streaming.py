"""Structured Streaming intake operators: dedup + windowed metrics."""

from __future__ import annotations

import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from bitextor_spark.streaming.ingest import (
    streaming_fetch_metrics,
    streaming_url_intake,
)


def _stream_from_dir(spark, path, schema):
    return spark.readStream.schema(schema).parquet(path)


def test_streaming_url_intake_dedups(spark):
    src = tempfile.mkdtemp(prefix="stream_src_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    try:
        rows = [
            ("HTTP://WWW.E.com/a?PHPSESSID=1", "2024-01-01 00:00:01"),
            ("http://e.com/a", "2024-01-01 00:00:02"),  # same canon
            ("http://e.com/b", "2024-01-01 00:00:03"),
            ("mailto:x@y", "2024-01-01 00:00:04"),  # dropped
        ]
        spark.createDataFrame(rows, "url string, ts string").withColumn(
            "discovered_at", F.col("ts").cast("timestamp")
        ).drop("ts").write.parquet(src + "/batch1")
        stream = _stream_from_dir(
            spark, src + "/*", "url string, discovered_at timestamp"
        )
        out = streaming_url_intake(stream)
        name = "intake_" + uuid.uuid4().hex[:8]
        q = (
            out.writeStream.format("memory").queryName(name)
            .option("checkpointLocation", ckpt).outputMode("append").start()
        )
        q.processAllAvailable()
        got = {r.url_canon for r in spark.sql(f"select * from {name}").collect()}
        q.stop()
        assert got == {"http://e.com/a", "http://e.com/b"}
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_streaming_fetch_metrics_windows(spark):
    src = tempfile.mkdtemp(prefix="stream_src_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    try:
        rows = [
            ("h1", 200, "2024-01-01 00:00:10"),
            ("h1", 500, "2024-01-01 00:00:20"),
            ("h1", 200, "2024-01-01 00:01:10"),
            ("h2", 200, "2024-01-01 00:00:30"),
        ]
        spark.createDataFrame(rows, "host string, status int, ts string").withColumn(
            "fetched_at", F.col("ts").cast("timestamp")
        ).drop("ts").write.parquet(src + "/b1")
        stream = _stream_from_dir(
            spark, src + "/*", "host string, status int, fetched_at timestamp"
        )
        out = streaming_fetch_metrics(stream)
        name = "metrics_" + uuid.uuid4().hex[:8]
        q = (
            out.writeStream.format("memory").queryName(name)
            .option("checkpointLocation", ckpt).outputMode("complete").start()
        )
        q.processAllAvailable()
        got = {
            (str(r.window_start), r.host): (r.fetched, r.errors)
            for r in spark.sql(f"select * from {name}").collect()
        }
        q.stop()
        assert got[("2024-01-01 00:00:00", "h1")] == (2, 1)
        assert got[("2024-01-01 00:01:00", "h1")] == (1, 0)
        assert got[("2024-01-01 00:00:00", "h2")] == (1, 0)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_streaming_politeness_gate_state_across_batches(spark):
    """applyInPandasWithState politeness gate: per-host next-allowed state
    survives micro-batch boundaries (maxFilesPerTrigger=1 forces two
    batches), FETCH advances the virtual cursor by the snooze rule, DEFER
    fires for requests inside the politeness window."""
    from bitextor_spark.config import CrawlConfig
    from bitextor_spark.streaming.ingest import streaming_politeness_gate

    src = tempfile.mkdtemp(prefix="stream_src_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    try:
        schema = ("host string, url_canon string, req_ts timestamp, "
                  "fetch_ms int, crawl_delay_s int")
        # batch 1: first request fetches at t=0ms; cursor advances to
        # 1000 + max(clamp(5*1000=5000),0) = 6000ms
        import datetime as dt

        def ts(sec):
            return dt.datetime(2024, 1, 1, 0, 0, sec)

        spark.createDataFrame(
            [("h1", "http://h1/a", ts(0), 1000, 0)],
            schema,
        ).coalesce(1).write.parquet(src + "/b1")
        # batch 2: t=2s is inside the window -> DEFER; t=10s -> FETCH
        spark.createDataFrame(
            [("h1", "http://h1/b", ts(2), 1000, 0),
             ("h1", "http://h1/c", ts(10), 1000, 0)],
            schema,
        ).coalesce(1).write.parquet(src + "/b2")

        # the file source orders micro-batches by file mtime; same-second
        # writes tie and flip batch order — pin distinct mtimes explicitly
        import glob as _glob
        import os as _os

        for age, d in ((200, "/b1"), (100, "/b2")):
            for f in _glob.glob(src + d + "/*.parquet"):
                t = _os.path.getmtime(f) - age
                _os.utime(f, (t, t))

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/*")
        )
        out = streaming_politeness_gate(stream, CrawlConfig())
        name = "gate_" + uuid.uuid4().hex[:8]
        q = (
            out.writeStream.format("memory").queryName(name)
            .option("checkpointLocation", ckpt).outputMode("append").start()
        )
        q.processAllAvailable()
        rows = {r.url_canon: (r.decision, r.scheduled_ms)
                for r in spark.sql(f"select * from {name}").collect()}
        q.stop()
        base = rows["http://h1/a"][1]  # epoch ms of 2024-01-01T00:00:00
        assert rows["http://h1/a"][0] == "FETCH"
        # b arrives 2s later — still inside the 6s snooze -> DEFER at cursor
        assert rows["http://h1/b"] == ("DEFER", base + 6000)
        # c arrives 10s later — past the cursor -> FETCH at its own ts
        assert rows["http://h1/c"] == ("FETCH", base + 10_000)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
