"""Continuous crawl ingestion: the raw-crawl path (WARC scan →
HTML→text extraction) runs UNCHANGED under Structured Streaming.

`wet_records`/`warc_records` are pure projections over the
sentinel-split text rows, so the SAME functions run on
`spark.readStream.option("lineSep", WARC_SENTINEL).text(inbox)` —
each arriving crawl shard becomes a micro-batch, and the streamed
result must equal the batch scan of the same files row for row.
This is the 100 TB ingestion shape: crawl shards land in object
storage and flow straight into the documents table without a separate
batch re-scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lsd2_spark.operators.html_text import html_to_text
from lsd2_spark.sources.webtext import (
    WARC_SENTINEL,
    read_warc,
    read_wet,
    warc_records,
    wet_records,
)
from lsd2_spark.streaming.events import run_to_memory_sink

CRLF = "\r\n"


def _response(i: int) -> str:
    body = (
        f"<html><head><title>Page {i}</title></head>"
        f"<body><p>Crawl body number {i} with words.</p></body></html>"
    )
    http = f"HTTP/1.1 200 OK{CRLF}Content-Type: text/html{CRLF}{CRLF}{body}"
    hdr = CRLF.join(
        [
            "WARC-Type: response",
            f"WARC-Target-URI: https://s.com/{i}",
            "WARC-Date: 2026-08-01T00:00:00Z",
            f"WARC-Record-ID: <urn:uuid:{i}>",
            f"Content-Length: {len(http)}",
        ]
    )
    return "WARC/1.0" + CRLF + hdr + CRLF + CRLF + http + CRLF + CRLF


def _conversion(i: int) -> str:
    body = f"wet text {i} alpha beta"
    hdr = CRLF.join(
        [
            "WARC-Type: conversion",
            f"WARC-Target-URI: https://s.com/{i}",
            "WARC-Date: 2026-08-01T00:00:00Z",
            f"WARC-Record-ID: <urn:uuid:{i}>",
            f"Content-Length: {len(body)}",
        ]
    )
    return "WARC/1.0" + CRLF + hdr + CRLF + CRLF + body + CRLF + CRLF


def _stream_source(spark, glob: str):
    return (
        spark.readStream.option("lineSep", WARC_SENTINEL)
        .option("maxFilesPerTrigger", 1)
        .text(glob)
    )


def test_warc_scan_streams(spark, tmp_path):
    """readStream inbox == batch read_warc of the same files, through
    the full extraction projection."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    for shard in range(3):
        recs = "".join(_response(shard * 10 + j) for j in range(4))
        (inbox / f"s{shard}.warc").write_bytes(recs.encode())

    def pipeline(df):
        return html_to_text(
            df.select(F.col("url").alias("doc_id"), "body"), "body"
        )

    batch = pipeline(read_warc(spark, str(inbox / "*.warc")))
    streamed = pipeline(
        warc_records(_stream_source(spark, str(inbox / "*.warc"))).filter(
            F.col("content_type").contains("text/html")
        )
    )
    run_to_memory_sink(streamed, "warc_stream", mode="append")
    got = {
        (r["doc_id"], r["text"])
        for r in spark.sql("SELECT * FROM warc_stream").collect()
    }
    want = {(r["doc_id"], r["text"]) for r in batch.collect()}
    assert got == want and len(want) == 12
    # the extraction actually ran: titles became their own lines
    assert all(t.startswith("Page ") for _, t in got)


def test_wet_scan_streams(spark, tmp_path):
    inbox = tmp_path / "winbox"
    inbox.mkdir()
    for shard in range(2):
        recs = "".join(_conversion(shard * 5 + j) for j in range(5))
        (inbox / f"w{shard}.wet").write_bytes(recs.encode())

    batch = {
        (r["url"], r["text"])
        for r in read_wet(spark, str(inbox / "*.wet")).collect()
    }
    streamed = wet_records(_stream_source(spark, str(inbox / "*.wet")))
    run_to_memory_sink(streamed, "wet_stream", mode="append")
    got = {
        (r["url"], r["text"])
        for r in spark.sql("SELECT * FROM wet_stream").collect()
    }
    assert got == batch and len(batch) == 10
