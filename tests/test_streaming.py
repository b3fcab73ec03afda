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
