"""WARC source/sink (S1/S2) — real ISO 28500 records, stdlib only.

The reference's entire input path is WARC: wget writes request/response
records per fetched page (bitextor/bitextor_wget.py:84-104) and the
preprocessor iterates them with warcio's ArchiveIterator
(bitextor/bitextor_warc2preprocess.py). This module re-expresses both
sides Spark-first:

- **sink**: one ``.warc.gz`` per partition via ``mapInPandas`` — the shard
  layout real crawlers use (a WARC file is an append-only stream, so the
  natural parallel unit is one file per task, never record-level shuffle).
- **source**: ``spark.read.format("binaryFile")`` over the ``.warc.gz``
  shards + an Arrow-batched ``mapInPandas`` record parser. WARC files are
  not splittable mid-stream (gzip members + length-framed records), so one
  file = one parse task; parallelism comes from file count, exactly how a
  100 TB WARC corpus is laid out (CommonCrawl: ~100k files/crawl).

Record framing: ``WARC/1.0`` header block, CRLF-terminated headers,
``Content-Length``-framed payload, blank-line record separator. Response
payloads are full HTTP responses (status line + headers + body).
"""

from __future__ import annotations

import gzip
import io
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_CRLF = "\r\n"
_FIXED_DATE = "2024-01-01T00:00:00Z"  # deterministic fixtures (no wall clock)

READ_SCHEMA = (
    "warc_file string, record_id string, warc_type string, target_uri string, "
    "http_status int, content_type string, payload binary, payload_len long"
)


# --------------------------------------------------------------------------
# record building / writing
# --------------------------------------------------------------------------

def build_response_record(
    record_id: str, target_uri: str, status: int, content_type: str,
    body: bytes,
) -> bytes:
    """One WARC/1.0 response record wrapping an HTTP/1.1 response."""
    reason = {200: "OK", 404: "Not Found"}.get(status, "Status")
    http = (
        f"HTTP/1.1 {status} {reason}{_CRLF}"
        f"Content-Type: {content_type}{_CRLF}"
        f"Content-Length: {len(body)}{_CRLF}{_CRLF}"
    ).encode("utf-8") + body
    head = (
        f"WARC/1.0{_CRLF}"
        f"WARC-Type: response{_CRLF}"
        f"WARC-Record-ID: <urn:uuid:{record_id}>{_CRLF}"
        f"WARC-Date: {_FIXED_DATE}{_CRLF}"
        f"WARC-Target-URI: {target_uri}{_CRLF}"
        f"Content-Type: application/http; msgtype=response{_CRLF}"
        f"Content-Length: {len(http)}{_CRLF}{_CRLF}"
    ).encode("utf-8")  # UTF-8 (warcio-style): URIs may carry raw unicode paths
    return head + http + (_CRLF + _CRLF).encode("ascii")


def build_request_record(record_id: str, target_uri: str) -> bytes:
    req = (
        f"GET / HTTP/1.1{_CRLF}Host: fixture{_CRLF}{_CRLF}"
    ).encode("ascii")
    head = (  # UTF-8: target_uri may carry raw unicode path characters
        f"WARC/1.0{_CRLF}"
        f"WARC-Type: request{_CRLF}"
        f"WARC-Record-ID: <urn:uuid:{record_id}-req>{_CRLF}"
        f"WARC-Date: {_FIXED_DATE}{_CRLF}"
        f"WARC-Target-URI: {target_uri}{_CRLF}"
        f"Content-Type: application/http; msgtype=request{_CRLF}"
        f"Content-Length: {len(req)}{_CRLF}{_CRLF}"
    ).encode("utf-8")
    return head + req + (_CRLF + _CRLF).encode("ascii")


def write_warc_shards(
    df: DataFrame, out_dir: str, with_requests: bool = True
) -> None:
    """Sink: one ``part-<pid>.warc.gz`` per partition (executor-side IO).

    Expects columns (record_id string, target_uri string, status int,
    content_type string, body binary). ``out_dir`` must be a filesystem
    visible to the executors (local dir in local mode, shared FS/object
    store mount on a cluster).
    """
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.warc.gz")
        n = 0
        with gzip.open(path, "wb") as fh:
            for pdf in batches:
                for rid, uri, st, ct, body in zip(
                    pdf["record_id"], pdf["target_uri"], pdf["status"],
                    pdf["content_type"], pdf["body"],
                ):
                    if with_requests:
                        fh.write(build_request_record(rid, uri))
                    fh.write(
                        build_response_record(rid, uri, int(st), ct, bytes(body))
                    )
                    n += 1
        yield pd.DataFrame({"path": [path], "n_records": [n]})

    # noop-materialize: the yielded manifest row forces execution
    df.mapInPandas(write_partition, "path string, n_records long").write.format(
        "noop"
    ).mode("overwrite").save()


# --------------------------------------------------------------------------
# parsing / reading
# --------------------------------------------------------------------------

def parse_warc_bytes(data: bytes) -> Iterable[dict]:
    """Iterate records of one WARC file (gzip or plain), stdlib only."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    buf = io.BytesIO(data)
    while True:
        line = buf.readline()
        if not line:
            return
        if line.strip() == b"":
            continue
        if not line.startswith(b"WARC/"):
            return  # framing lost — stop rather than guess
        headers: dict[str, str] = {}
        while True:
            h = buf.readline()
            if h in (b"\r\n", b"\n", b""):
                break
            k, _, v = h.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            return  # malformed framing — stop like the other guards
        payload = buf.read(length)
        if len(payload) < length or not headers.get("warc-type"):
            return  # truncated tail — yield only fully-framed records
        rec = {
            "record_id": headers.get("warc-record-id", ""),
            "warc_type": headers.get("warc-type", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "http_status": None,
            "content_type": None,
            "payload": b"",
        }
        if rec["warc_type"] == "response" and payload[:5] == b"HTTP/":
            head, sep, body = payload.partition(b"\r\n\r\n")
            rec["payload"] = body if sep else b""
            for i, hl in enumerate(head.split(b"\r\n")):
                if i == 0:
                    parts = hl.split()
                    if len(parts) >= 2 and parts[1].isdigit():
                        rec["http_status"] = int(parts[1])
                elif hl.lower().startswith(b"content-type:"):
                    rec["content_type"] = (
                        hl.split(b":", 1)[1].strip().decode("ascii", "replace")
                    )
        yield rec


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Source: WARC shards → DataFrame of parsed records.

    ``binaryFile`` hands each file's bytes to one task; the parser runs in
    Arrow batches. Column pruning/pushdown happen above this source; at
    100 TB the parallel unit is the file, matching the corpus layout.
    """
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, data in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_bytes(bytes(data)):
                    rows.append(
                        (
                            fpath, rec["record_id"], rec["warc_type"],
                            rec["target_uri"], rec["http_status"],
                            rec["content_type"], rec["payload"],
                            len(rec["payload"]),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_file", "record_id", "warc_type", "target_uri",
                    "http_status", "content_type", "payload", "payload_len",
                ],
            )

    return files.select("path", "content").mapInPandas(parse, READ_SCHEMA)
