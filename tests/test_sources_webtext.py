"""WET/WARC and JSONL corpus sources (lsd2_spark/sources/webtext.py).

A synthetic spec-conformant WET file (CRLF framing, warcinfo preamble,
conversion records, one non-conversion record, one empty record, one
record whose TEXT quotes the "WARC/1.0" version string) is written
bytewise, read back through the native lineSep scan, and compared to
the known record set.  Gzip transparency and the multi-file glob are
covered because that's the actual CC layout (~64k .wet.gz per crawl).
"""

import gzip

import pytest

from lsd2_spark.sources.webtext import read_jsonl, read_wet, write_jsonl

CRLF = "\r\n"


def _record(headers: dict, payload: str) -> str:
    head = CRLF.join(f"{k}: {v}" for k, v in headers.items())
    return (
        "WARC/1.0" + CRLF + head + CRLF + CRLF + payload + CRLF + CRLF
    )


def _wet_bytes(records) -> bytes:
    return "".join(records).encode("utf-8")


RECORDS = [
    _record(
        {
            "WARC-Type": "warcinfo",
            "WARC-Date": "2026-08-01T00:00:00Z",
            "Content-Length": "10",
        },
        "isPartOf: CC-MAIN-TEST",
    ),
    _record(
        {
            "WARC-Type": "conversion",
            "WARC-Target-URI": "https://example.com/a",
            "WARC-Date": "2026-08-01T01:02:03Z",
            "WARC-Record-ID": "<urn:uuid:aaaa-1>",
            "Content-Length": "17",
        },
        "Hello web text A.",
    ),
    _record(
        {
            "WARC-Type": "metadata",
            "WARC-Target-URI": "https://example.com/meta",
            "WARC-Date": "2026-08-01T01:02:04Z",
            "WARC-Record-ID": "<urn:uuid:meta-1>",
            "Content-Length": "6",
        },
        "meta=1",
    ),
    _record(
        {
            "WARC-Type": "conversion",
            "WARC-Target-URI": "https://example.com/b",
            "WARC-Date": "2026-08-01T02:02:03Z",
            "WARC-Record-ID": "<urn:uuid:bbbb-2>",
            "Content-Length": "64",
        },
        "Multi line body.\nSecond line mentions WARC/1.0 inline.\nThird.",
    ),
    _record(
        {
            "WARC-Type": "conversion",
            "WARC-Target-URI": "https://example.com/empty",
            "WARC-Date": "2026-08-01T03:02:03Z",
            "WARC-Record-ID": "<urn:uuid:cccc-3>",
            "Content-Length": "0",
        },
        "",
    ),
]

WANT = {
    "https://example.com/a": "Hello web text A.",
    "https://example.com/b": (
        "Multi line body.\nSecond line mentions WARC/1.0 inline.\nThird."
    ),
    "https://example.com/empty": "",
}


def test_read_wet_plain(spark, tmp_path):
    p = tmp_path / "f.wet"
    p.write_bytes(_wet_bytes(RECORDS))
    rows = read_wet(spark, str(p), min_length=1).collect()
    got = {r["url"]: r["text"] for r in rows}
    # min_length=1 drops the empty conversion record
    assert got == {k: v for k, v in WANT.items() if v}
    by_url = {r["url"]: r for r in rows}
    a = by_url["https://example.com/a"]
    assert a["ts"] == "2026-08-01T01:02:03Z"
    assert a["record_id"] == "<urn:uuid:aaaa-1>"
    assert a["content_length"] == 17
    # the warcinfo and metadata records never surface
    assert "https://example.com/meta" not in got


def test_read_wet_gz_glob_and_empty_payload(spark, tmp_path):
    """Two gz shards through one glob; min_length=0 semantics keep the
    empty conversion record."""
    (tmp_path / "w").mkdir()
    with gzip.open(tmp_path / "w" / "s1.wet.gz", "wb") as f:
        f.write(_wet_bytes(RECORDS[:2]))
    with gzip.open(tmp_path / "w" / "s2.wet.gz", "wb") as f:
        f.write(_wet_bytes([RECORDS[0]] + RECORDS[2:]))
    df = read_wet(spark, str(tmp_path / "w" / "*.wet.gz"), min_length=1)
    got = {r["url"]: r["text"] for r in df.collect()}
    assert got == {k: v for k, v in WANT.items() if v}
    all_rows = read_wet(spark, str(tmp_path / "w" / "*.wet.gz")).collect()
    assert {r["url"] for r in all_rows} == set(WANT)


def test_read_wet_native_plan(spark, tmp_path):
    """The whole parse stays JVM-side: no Python eval node in the plan."""
    p = tmp_path / "f.wet"
    p.write_bytes(_wet_bytes(RECORDS))
    plan = (
        read_wet(spark, str(p))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, plan


def test_read_wet_min_length_gate(spark, tmp_path):
    p = tmp_path / "f.wet"
    p.write_bytes(_wet_bytes(RECORDS))
    got = {
        r["url"]
        for r in read_wet(spark, str(p), min_length=30).collect()
    }
    assert got == {"https://example.com/b"}


def test_jsonl_roundtrip_and_corrupt_line(spark, tmp_path):
    src = spark.createDataFrame(
        [("d1", "alpha text", 3), ("d2", "beta text", 5)],
        "doc_id string, text string, n int",
    )
    out = tmp_path / "corpus"
    write_jsonl(src, str(out), compression="gzip")
    back = read_jsonl(
        spark, f"{out}/*.gz", schema="doc_id string, text string, n int"
    )
    assert {
        (r["doc_id"], r["text"], r["n"]) for r in back.collect()
    } == {("d1", "alpha text", 3), ("d2", "beta text", 5)}

    # corrupt line lands in _corrupt_json and is dropped by the
    # require_text gate instead of failing the scan
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "x.jsonl").write_text(
        '{"doc_id": "ok", "text": "fine"}\n{"doc_id": "broken", "text": \n'
    )
    df = read_jsonl(
        spark, str(bad / "x.jsonl"), schema="doc_id string, text string"
    )
    assert [r["doc_id"] for r in df.collect()] == ["ok"]
    kept = read_jsonl(
        spark,
        str(bad / "x.jsonl"),
        schema="doc_id string, text string",
        require_text=False,
    )
    assert kept.count() == 2


def test_wet_to_pipeline_composes(spark, tmp_path):
    """WET scan output drives the text operators directly (the point
    of emitting url/text columns)."""
    from pyspark.sql import functions as F

    from lsd2_spark.operators.text_analysis import token_stats

    p = tmp_path / "f.wet"
    p.write_bytes(_wet_bytes(RECORDS))
    docs = read_wet(spark, str(p)).select(
        F.col("url").alias("doc_id"), "text"
    )
    stats = {
        r["doc_id"]: r["n_tokens"]
        for r in token_stats(docs, "text", "doc_id").collect()
    }
    assert stats["https://example.com/a"] == 4


def test_write_jsonl_deterministic_shards(spark, tmp_path):
    """shard_key sharding is reproducible: two writes of the same frame
    put every doc in the same shard file index both times; and
    target_shard_bytes picks a sensible shard count from a sample."""
    import glob
    import json as _json

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(f"d{i}", "text " * 20) for i in range(400)],
        "doc_id string, text string",
    )

    def shard_map(path):
        m = {}
        files = sorted(glob.glob(f"{path}/part-*"))
        for idx, f in enumerate(files):
            import gzip

            with gzip.open(f, "rt") as fh:
                for line in fh:
                    m[_json.loads(line)["doc_id"]] = idx
        return len(files), m

    write_jsonl(df, str(tmp_path / "a"), shard_key="doc_id", n_shards=8)
    write_jsonl(df, str(tmp_path / "b"), shard_key="doc_id", n_shards=8)
    na, ma = shard_map(tmp_path / "a")
    nb, mb = shard_map(tmp_path / "b")
    assert na == nb == 8
    assert ma == mb  # same doc -> same shard index, both runs
    assert len(ma) == 400

    # size-targeted: ~400 rows x ~130 serialized bytes / 5000 target -> ~10 shards
    write_jsonl(
        df,
        str(tmp_path / "c"),
        shard_key="doc_id",
        target_shard_bytes=5000,
        size_sample_frac=0.5,
    )
    nc, mc = shard_map(tmp_path / "c")
    assert len(mc) == 400
    assert 5 <= nc <= 20, nc

    # misuse fails fast
    with pytest.raises(ValueError):
        write_jsonl(df, str(tmp_path / "d"), shard_key="doc_id")


def test_read_jsonl_require_text_missing_column_raises(spark, tmp_path):
    """require_text=True with a text_col absent from the schema must
    fail loudly (typo'd column / schema that omits it), not silently
    skip the null filter."""
    p = tmp_path / "c.jsonl"
    p.write_text('{"doc_id": "a", "body": "hi"}\n')
    with pytest.raises(ValueError, match="require_text"):
        read_jsonl(spark, str(p), schema="doc_id string, body string")
    # explicit opt-out still works
    assert read_jsonl(
        spark, str(p), schema="doc_id string, body string", require_text=False
    ).count() == 1
