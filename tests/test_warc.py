"""WARC source/sink unit tests (S1/S2): framing round trip, gzip and plain
encodings, request-record filtering, HTTP status/content-type parsing.
The end-to-end aggregate parity vs DuckDB runs in test_oracle_parity
(warc_roundtrip_stats)."""

from __future__ import annotations

import gzip

from bitextor_spark.sources.warc import (
    build_request_record,
    build_response_record,
    parse_warc_bytes,
)


def _fixture_bytes() -> bytes:
    out = b""
    out += build_request_record("1", "http://a.test/x")
    out += build_response_record(
        "1", "http://a.test/x", 200, "text/html", b"<html>hi</html>"
    )
    out += build_response_record(
        "2", "http://b.test/y", 404, "text/plain", b"nope"
    )
    out += build_response_record(
        "3", "http://c.test/z", 200, "application/pdf", b"%PDF-1.4 etc"
    )
    return out


def test_roundtrip_plain_and_gzip():
    raw = _fixture_bytes()
    for blob in (raw, gzip.compress(raw)):
        recs = list(parse_warc_bytes(blob))
        assert [r["warc_type"] for r in recs] == [
            "request", "response", "response", "response",
        ]
        responses = [r for r in recs if r["warc_type"] == "response"]
        assert [r["http_status"] for r in responses] == [200, 404, 200]
        assert responses[0]["payload"] == b"<html>hi</html>"
        assert responses[0]["content_type"] == "text/html"
        assert responses[2]["content_type"] == "application/pdf"
        assert responses[1]["target_uri"] == "http://b.test/y"
        # request records carry no HTTP response fields
        assert recs[0]["http_status"] is None


def test_binary_body_survives():
    body = bytes(range(256)) * 3
    rec = build_response_record("9", "http://bin.test/b", 200,
                                "application/octet-stream", body)
    out = list(parse_warc_bytes(rec))
    assert out[0]["payload"] == body
    assert out[0]["record_id"] == "<urn:uuid:9>"


def test_truncated_stream_stops_cleanly():
    raw = _fixture_bytes()
    recs = list(parse_warc_bytes(raw[: len(raw) // 2]))
    # parser yields only fully-framed records, never raises
    assert all(r["warc_type"] in ("request", "response") for r in recs)
