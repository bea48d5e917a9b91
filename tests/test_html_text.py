"""read_warc (sources/webtext.py) and html_to_text (operators/html_text.py).

A synthetic spec-conformant WARC response file (HTTP headers inside the
payload, one non-HTML response, one request record) drives the full
raw-crawl path: read_warc → html_to_text → token_stats.  The extractor
is probed on the structures that break naive strippers: script/style
contents, comments, entity round-trips (&amp;lt; must NOT become <),
block-boundary newlines, attribute values containing '>', null/empty.
"""

import pytest
from pyspark.sql import functions as F

from lsd2_spark.operators.html_text import html_to_text, html_text_column
from lsd2_spark.sources.webtext import read_warc

CRLF = "\r\n"


def _response(url: str, ctype: str, body: str, status: int = 200) -> str:
    http = (
        f"HTTP/1.1 {status} OK" + CRLF
        + f"Content-Type: {ctype}" + CRLF
        + f"Content-Length: {len(body)}" + CRLF + CRLF
        + body
    )
    head = CRLF.join(
        [
            "WARC-Type: response",
            f"WARC-Target-URI: {url}",
            "WARC-Date: 2026-08-01T00:00:00Z",
            f"WARC-Record-ID: <urn:uuid:{url[-1]}>",
            f"Content-Length: {len(http)}",
        ]
    )
    return "WARC/1.0" + CRLF + head + CRLF + CRLF + http + CRLF + CRLF


REQUEST_REC = (
    "WARC/1.0" + CRLF
    + "WARC-Type: request" + CRLF
    + "WARC-Target-URI: https://x.com/a" + CRLF
    + "Content-Length: 20" + CRLF + CRLF
    + "GET /a HTTP/1.1" + CRLF + CRLF
)

HTML_A = "<html><head><title>T</title></head><body><p>Hello crawl.</p></body></html>"
HTML_B = "<html><body><p>Second &amp; page.</p></body></html>"


def _warc_file(tmp_path):
    p = tmp_path / "f.warc"
    p.write_bytes(
        (
            _response("https://x.com/a", "text/html; charset=utf-8", HTML_A)
            + REQUEST_REC
            + _response("https://x.com/img", "image/png", "PNGBYTES")
            + _response("https://x.com/b", "text/html", HTML_B, status=301)
        ).encode()
    )
    return str(p)


def test_read_warc_http_split_and_filter(spark, tmp_path):
    rows = {r["url"]: r for r in read_warc(spark, _warc_file(tmp_path)).collect()}
    # request + image records filtered; both html responses kept
    assert set(rows) == {"https://x.com/a", "https://x.com/b"}
    a = rows["https://x.com/a"]
    assert a["http_status"] == 200
    assert a["content_type"].startswith("text/html")
    assert a["body"] == HTML_A
    assert rows["https://x.com/b"]["http_status"] == 301


def test_read_warc_no_filter(spark, tmp_path):
    rows = read_warc(
        spark, _warc_file(tmp_path), content_type_filter=None
    ).collect()
    assert {r["url"] for r in rows} == {
        "https://x.com/a",
        "https://x.com/img",
        "https://x.com/b",
    }


def _extract(spark, html):
    df = spark.createDataFrame([("d", html)], "doc_id string, html string")
    return html_to_text(df, "html").collect()[0]["text"]


def test_extractor_structures(spark):
    page = (
        "<!DOCTYPE html><html><head>"
        "<title>My Title</title>"
        "<style>body { color: red; }</style>"
        "<script>var hidden = 'SCRIPTTEXT';</script>"
        "</head><body>"
        "<!-- COMMENTTEXT -->"
        "<h1>Heading</h1>"
        "<p>Para one with <a href='/x?a=1&amp;b=2'>a link</a>.</p>"
        "<p>Entities: &lt;tag&gt; &quot;q&quot; &apos;a&apos; &amp;lt; 3&nbsp;4</p>"
        '<img alt="5 > 4" src="i.png">'
        "<ul><li>one</li><li>two</li></ul>"
        "</body></html>"
    )
    text = _extract(spark, page)
    assert "SCRIPTTEXT" not in text and "COMMENTTEXT" not in text
    assert "color: red" not in text
    assert "My Title" in text and "Heading" in text
    assert "Para one with a link ." in text or "Para one with a link." in text.replace(
        " .", "."
    )
    # entity round-trips: displayed forms, and &amp;lt; -> literal "&lt;"
    assert '<tag> "q" \'a\' &lt; 3 4' in text
    # block closers became newlines: title/heading/paras/li on own lines
    lines = text.split("\n")
    assert "My Title" in lines and "Heading" in lines
    assert "one" in lines and "two" in lines
    assert "href" not in text and "i.png" not in text


def test_extractor_null_empty_and_min_length(spark):
    df = spark.createDataFrame(
        [("n", None), ("e", ""), ("s", "<p>keep me here</p>")],
        "doc_id string, html string",
    )
    out = {r["doc_id"]: r["text"] for r in html_to_text(df, "html").collect()}
    assert out == {"n": "", "e": "", "s": "keep me here"}
    kept = html_to_text(df, "html", min_length=5).collect()
    assert [r["doc_id"] for r in kept] == ["s"]


def test_extractor_plan_native(spark):
    df = spark.createDataFrame([("d", "<p>x</p>")], "doc_id string, html string")
    plan = (
        html_to_text(df, "html")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, plan


def test_warc_to_documents_pipeline(spark, tmp_path):
    """The full raw-crawl path: read_warc → html_to_text → token_stats."""
    from lsd2_spark.operators.text_analysis import token_stats

    docs = html_to_text(
        read_warc(spark, _warc_file(tmp_path)).select(
            F.col("url").alias("doc_id"), "body"
        ),
        "body",
    )
    got = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert got["https://x.com/a"] == "T\nHello crawl."
    assert got["https://x.com/b"] == "Second & page."
    stats = {
        r["doc_id"]: r["n_tokens"]
        for r in token_stats(docs, "text", "doc_id").collect()
    }
    assert stats["https://x.com/b"] == 3


def test_unclosed_script_not_closed_by_other_element(spark):
    """An unclosed <script> must not be 'closed' by a later </style>,
    deleting the legitimate content between them (review finding:
    closer pinned to the opener via backreference)."""
    page = (
        '<p>before</p><script src="x.js"><p>REAL CONTENT HERE</p>'
        "<style>b{}</style><p>after</p>"
    )
    text = _extract(spark, page)
    assert "REAL CONTENT HERE" in text
    assert "before" in text and "after" in text
    # matched pairs still drop their contents
    paired = _extract(
        spark, "<p>a</p><script>var x='HIDden';</script><style>c{}</style><p>b</p>"
    )
    assert "HIDden" not in paired and "c{}" not in paired


def test_read_warc_case_insensitive_content_type(spark, tmp_path):
    """Review finding: servers emit TEXT/HTML / Text/Html; the filter
    must be case-insensitive."""
    p = tmp_path / "u.warc"
    p.write_bytes(
        (
            _response("https://x.com/u", "TEXT/HTML; charset=UTF-8", HTML_A)
            + _response("https://x.com/m", "Text/Html", HTML_B)
        ).encode()
    )
    rows = read_warc(spark, str(p)).collect()
    assert {r["url"] for r in rows} == {"https://x.com/u", "https://x.com/m"}


def test_read_warc_gates_non_identity_bodies(spark, tmp_path):
    """Review finding: chunked bodies carry hex framing lines and
    gzip bodies are binary — identity_body_only (default) drops them,
    and the flag surfaces them when kept."""
    chunked_http = (
        "HTTP/1.1 200 OK" + CRLF
        + "Content-Type: text/html" + CRLF
        + "Transfer-Encoding: chunked" + CRLF + CRLF
        + "1f4" + CRLF + "<html>part</html>" + CRLF + "0" + CRLF
    )
    hdr = CRLF.join(
        [
            "WARC-Type: response",
            "WARC-Target-URI: https://x.com/chunked",
            "WARC-Date: 2026-08-01T00:00:00Z",
            "WARC-Record-ID: <urn:uuid:ch>",
            f"Content-Length: {len(chunked_http)}",
        ]
    )
    rec = "WARC/1.0" + CRLF + hdr + CRLF + CRLF + chunked_http + CRLF + CRLF
    gz_http = (
        "HTTP/1.1 200 OK" + CRLF
        + "Content-Type: text/html" + CRLF
        + "Content-Encoding: gzip" + CRLF + CRLF
        + "\x1f\x8b_binarygarbage"
    )
    hdr2 = CRLF.join(
        [
            "WARC-Type: response",
            "WARC-Target-URI: https://x.com/gz",
            "WARC-Date: 2026-08-01T00:00:00Z",
            "WARC-Record-ID: <urn:uuid:gz>",
            f"Content-Length: {len(gz_http)}",
        ]
    )
    rec2 = "WARC/1.0" + CRLF + hdr2 + CRLF + CRLF + gz_http + CRLF + CRLF
    p = tmp_path / "c.warc"
    p.write_bytes(
        (rec + rec2 + _response("https://x.com/ok", "text/html", HTML_A)).encode()
    )
    kept = read_warc(spark, str(p)).collect()
    assert {r["url"] for r in kept} == {"https://x.com/ok"}
    allr = {
        r["url"]: r["identity_body"]
        for r in read_warc(spark, str(p), identity_body_only=False).collect()
    }
    assert allr == {
        "https://x.com/chunked": False,
        "https://x.com/gz": False,
        "https://x.com/ok": True,
    }


def _chunked_response(url: str, body: str, chunk_sizes=(7, 5)) -> str:
    """Spec-correct chunked framing of ``body`` (byte counts honored)."""
    raw = body.encode()
    parts, pos = [], 0
    sizes = list(chunk_sizes)
    while pos < len(raw):
        n = sizes.pop(0) if sizes else len(raw) - pos
        n = min(n, len(raw) - pos)
        parts.append(f"{n:x}".encode() + b"\r\n" + raw[pos : pos + n] + b"\r\n")
        pos += n
    chunked_body = b"".join(parts) + b"0\r\n\r\n"
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n" + chunked_body
    )
    hdr = CRLF.join(
        [
            "WARC-Type: response",
            f"WARC-Target-URI: {url}",
            "WARC-Date: 2026-08-01T00:00:00Z",
            f"WARC-Record-ID: <urn:uuid:{url[-1]}>",
            f"Content-Length: {len(http)}",
        ]
    )
    return (
        "WARC/1.0" + CRLF + hdr + CRLF + CRLF + http.decode() + CRLF + CRLF
    )


def test_read_warc_dechunks_to_identity_twin(spark, tmp_path):
    """A well-formed chunked response decodes to the IDENTICAL body as
    its identity-encoded twin, and survives the default identity gate;
    chunk sizes are byte counts, so multi-byte UTF-8 must not split."""
    body = "<html><p>café & crawl</p></html>"
    p = tmp_path / "chunked.warc"
    p.write_bytes(
        (
            # sizes align with codepoint boundaries (é is 2 bytes; a
            # mid-codepoint chunk split is unrecoverable from Spark's
            # string-typed scan and stays gated — see _dechunk_str)
            _chunked_response("https://x.com/c", body, chunk_sizes=(9, 5, 11))
            + _response("https://x.com/i", "text/html", body)
        ).encode()
    )
    rows = {r["url"]: r for r in read_warc(spark, str(p)).collect()}
    assert set(rows) == {"https://x.com/c", "https://x.com/i"}
    assert rows["https://x.com/c"]["body"] == rows["https://x.com/i"]["body"] == body
    assert rows["https://x.com/c"]["identity_body"] is True


def test_read_warc_malformed_chunking_stays_gated(spark, tmp_path):
    """Framing that lies about its sizes keeps the raw body and the
    false flag (the pre-dechunk contract) instead of crashing."""
    from lsd2_spark.sources.webtext import _dechunk_str

    assert _dechunk_str("1f4\r\nshort\r\n0\r\n") is None  # size > data
    assert _dechunk_str("zz\r\nx\r\n0\r\n") is None  # non-hex size
    assert _dechunk_str(None) is None
    # bare-LF framing inside the body is tolerated (some proxies)
    assert _dechunk_str("3\nabc\n0\n") == "abc"
    # chunk extensions after ';' are dropped per RFC 9112
    assert _dechunk_str("3;name=v\r\nabc\r\n0\r\n") == "abc"


def test_read_warc_11_and_bare_lf_framing(spark, tmp_path):
    """detect_warc_framing picks WARC/1.1 version lines and bare-LF
    mirror rewrites; a hard-pinned 1.0+CRLF sentinel would silently
    parse both files as one record each."""
    from lsd2_spark.sources.webtext import detect_warc_framing

    rec = _response("https://x.com/a", "text/html", HTML_A) + _response(
        "https://x.com/b", "text/html", HTML_B
    )
    p11 = tmp_path / "v11.warc"
    p11.write_bytes(rec.replace("WARC/1.0", "WARC/1.1").encode())
    assert detect_warc_framing(str(p11)) == "\r\nWARC/1.1\r\n"
    rows = read_warc(spark, str(p11)).collect()
    assert {r["url"] for r in rows} == {"https://x.com/a", "https://x.com/b"}

    plf = tmp_path / "lf.warc"
    plf.write_bytes(rec.replace(CRLF, "\n").encode())
    assert detect_warc_framing(str(plf)) == "\nWARC/1.0\n"
    rows = read_warc(spark, str(plf)).collect()
    assert {r["url"] for r in rows} == {"https://x.com/a", "https://x.com/b"}


def test_detect_warc_framing_fails_loudly(spark, tmp_path):
    import gzip

    import pytest as _pytest

    from lsd2_spark.sources.webtext import detect_warc_framing

    bad = tmp_path / "not.warc"
    bad.write_bytes(b"PK\x03\x04 definitely a zip\n")
    with _pytest.raises(ValueError, match="WARC version line"):
        detect_warc_framing(str(bad))
    with _pytest.raises(FileNotFoundError):
        detect_warc_framing(str(tmp_path / "missing-*.warc"))
    # gzip-aware: probe inflates the head of .warc.gz members
    gz = tmp_path / "ok.warc.gz"
    with gzip.open(gz, "wb") as f:
        f.write(_response("https://x.com/a", "text/html", HTML_A).encode())
    assert detect_warc_framing(str(gz)) == "\r\nWARC/1.0\r\n"


def test_detect_warc_framing_mixed_corpus_raises(spark, tmp_path):
    """A directory mixing WARC/1.0 with WARC/1.1 (or CRLF with bare
    LF) cannot be split by one literal lineSep — the probe samples
    several files and raises instead of trusting files[0], which would
    silently parse every other-framing file as one giant record
    (ADVICE r9)."""
    import pytest as _pytest

    from lsd2_spark.sources.webtext import detect_warc_framing

    rec = _response("https://x.com/a", "text/html", HTML_A)
    d = tmp_path / "mixed"
    d.mkdir()
    (d / "a.warc").write_bytes(rec.encode())
    (d / "b.warc").write_bytes(rec.replace("WARC/1.0", "WARC/1.1").encode())
    with _pytest.raises(ValueError, match="mixed WARC framings"):
        detect_warc_framing(str(d))
    # CRLF vs bare-LF disagreement is caught the same way
    (d / "b.warc").write_bytes(rec.replace(CRLF, "\n").encode())
    with _pytest.raises(ValueError, match="mixed WARC framings"):
        detect_warc_framing(str(d))
    # a consistent directory still resolves (and samples, not scans:
    # first+last+spread of a many-file corpus)
    (d / "b.warc").unlink()
    for i in range(12):
        (d / f"c{i:02d}.warc").write_bytes(rec.encode())
    assert detect_warc_framing(str(d)) == "\r\nWARC/1.0\r\n"
    # name-level sampling: only `sample` heads are READ, not every
    # file's (a remote crawl dir must cost `sample` round-trips), and
    # sample=1 is a legal degenerate probe (first file only)
    from lsd2_spark.sources import webtext as _wt

    assert len(_wt._probe_heads_local(str(d), 5)) == 5
    assert detect_warc_framing(str(d), sample=1) == "\r\nWARC/1.0\r\n"
    files = list(range(100))
    picked = _wt._sample_paths(files, 5)
    assert picked[0] == 0 and picked[-1] == 99 and len(picked) == 5
    assert _wt._sample_paths(files, 1) == [0]


def test_detect_warc_framing_scheme_paths(spark, tmp_path):
    """Scheme'd paths (hdfs://, s3a://, file://) probe through the
    Hadoop FileSystem via the JVM gateway when spark is given — the
    default-args read_warc/read_wet path keeps working for remote
    corpora (ADVICE r9).  Without a session the probe can't reach a
    scheme'd path and says so instead of a confusing glob miss."""
    import pytest as _pytest

    from lsd2_spark.sources.webtext import detect_warc_framing, read_warc

    rec = _response("https://x.com/a", "text/html", HTML_A) + _response(
        "https://x.com/b", "text/html", HTML_B
    )
    p = tmp_path / "v11.warc"
    p.write_bytes(rec.replace("WARC/1.0", "WARC/1.1").encode())
    uri = f"file://{p}"
    assert detect_warc_framing(uri, spark) == "\r\nWARC/1.1\r\n"
    # directory form through the same FS route
    assert detect_warc_framing(f"file://{tmp_path}", spark) == "\r\nWARC/1.1\r\n"
    with _pytest.raises(ValueError, match="spark="):
        detect_warc_framing(uri)
    # end-to-end: default record_sep=None on a scheme'd path
    rows = read_warc(spark, uri).collect()
    assert {r["url"] for r in rows} == {"https://x.com/a", "https://x.com/b"}


def test_dechunk_is_idempotent(spark, tmp_path):
    """Successfully dechunked rows come back transfer_encoding=
    'identity', so running dechunk_chunked_bodies twice is a no-op and
    downstream raw-encoding gates see the body's actual state; a
    malformed row keeps 'chunked' + the false flag (ADVICE r9)."""
    from lsd2_spark.sources.webtext import dechunk_chunked_bodies, read_warc

    body = "<html><p>café & crawl</p></html>"
    bad_http = (
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        "Transfer-Encoding: chunked\r\n\r\nzz\r\nnothex\r\n0\r\n"
    )
    hdr = CRLF.join(
        [
            "WARC-Type: response",
            "WARC-Target-URI: https://x.com/bad",
            "WARC-Date: 2026-08-01T00:00:00Z",
            "WARC-Record-ID: <urn:uuid:b>",
            f"Content-Length: {len(bad_http)}",
        ]
    )
    p = tmp_path / "idem.warc"
    p.write_bytes(
        (
            _chunked_response("https://x.com/c", body, chunk_sizes=(9, 5, 11))
            + "WARC/1.0" + CRLF + hdr + CRLF + CRLF + bad_http + CRLF + CRLF
        ).encode()
    )
    once = read_warc(spark, str(p), identity_body_only=False)
    rows = {r["url"]: r for r in once.collect()}
    assert rows["https://x.com/c"]["transfer_encoding"] == "identity"
    assert rows["https://x.com/c"]["identity_body"] is True
    assert rows["https://x.com/c"]["body"] == body
    assert rows["https://x.com/bad"]["transfer_encoding"] == "chunked"
    assert rows["https://x.com/bad"]["identity_body"] is False
    # second application: bit-identical frame (the decoded body can
    # never re-enter the chunk parser)
    twice = {
        r["url"]: r for r in dechunk_chunked_bodies(once).collect()
    }
    assert twice == rows


def test_hex_and_typographic_entities(spark):
    """Round-9 entity coverage: hex numeric forms (&#xNN;, any case,
    leading zeros) and the high-frequency typographic named set decode;
    &amp;/&#x26; stay strictly last so &amp;lt; still renders &lt;."""
    page = (
        "<p>q1 &#x22;dq&#X22; q2 &#034;dq2&#34;</p>"
        "<p>br &#x3c;tag&#x3E; sp&#xa0;nb &#160;nb2</p>"
        "<p>ty &mdash; &ndash; &lsquo;a&rsquo; &ldquo;b&rdquo; c&hellip;</p>"
        "<p>tyn &#8212; &#x2014; &#x2019;s</p>"
        "<p>amp &amp;lt; &#x26;gt; &amp;#34;</p>"
    )
    text = _extract(spark, page)
    assert '"dq" q2 "dq2"' in text.replace("q1 ", "")
    assert "<tag>" in text
    assert "sp nb  nb2" in text or "sp nb" in text  # nbsp forms -> space
    assert "— – ‘a’ “b” c…" in text
    assert "— — ’s" in text
    # double-escaped forms stay escaped-once (amp last)
    assert "&lt;" in text and "&gt;" in text and "&#34;" in text


def test_read_warc_binary_decodes_compressed_bodies(spark, tmp_path):
    """The byte-exact reader recovers what the text scan cannot:
    gzip/deflate content encodings, per-record gzip members (the
    Common Crawl file layout), and chunked framing honored in bytes —
    including a chunk boundary splitting a multi-byte codepoint."""
    import gzip
    import zlib

    from lsd2_spark.sources.webtext import read_warc_binary

    body = "<html><p>café & crawl — gz</p></html>"

    def rec(url, http: bytes) -> bytes:
        hdr = CRLF.join(
            [
                "WARC-Type: response",
                f"WARC-Target-URI: {url}",
                "WARC-Date: 2026-08-01T00:00:00Z",
                f"WARC-Record-ID: <urn:uuid:{url[-1]}>",
                f"Content-Length: {len(http)}",
            ]
        )
        return ("WARC/1.0" + CRLF + hdr + CRLF + CRLF).encode() + http + b"\r\n\r\n"

    gz_http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + gzip.compress(body.encode())
    )
    defl_http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: deflate\r\n\r\n"
        + zlib.compress(body.encode())
    )
    # chunked with a boundary INSIDE é's two UTF-8 bytes (byte-exact
    # readers don't care; the text scan provably cannot recover this)
    raw = body.encode()
    cut = raw.index("é".encode()) + 1
    chunked = (
        f"{cut:x}".encode() + b"\r\n" + raw[:cut] + b"\r\n"
        + f"{len(raw)-cut:x}".encode() + b"\r\n" + raw[cut:] + b"\r\n0\r\n\r\n"
    )
    ch_http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n" + chunked
    )
    id_http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + raw
    )
    bad_http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip\r\n\r\nNOTGZIP"
    )

    # plain concatenated file
    p1 = tmp_path / "a.warc"
    p1.write_bytes(
        rec("https://x.com/g", gz_http)
        + rec("https://x.com/d", defl_http)
        + rec("https://x.com/c", ch_http)
        + rec("https://x.com/i", id_http)
        + rec("https://x.com/x", bad_http)
    )
    rows = {r["url"]: r for r in read_warc_binary(spark, str(p1)).collect()}
    assert set(rows) == {
        "https://x.com/g", "https://x.com/d", "https://x.com/c", "https://x.com/i"
    }  # the undecodable body is gated
    for u in rows:
        assert rows[u]["body"] == body, u
        assert rows[u]["identity_body"] is True

    # Common-Crawl layout: one gzip member PER RECORD, .warc.gz suffix
    p2 = tmp_path / "b.warc.gz"
    p2.write_bytes(
        gzip.compress(rec("https://x.com/g", gz_http))
        + gzip.compress(rec("https://x.com/i", id_http))
    )
    rows2 = {r["url"]: r["body"] for r in read_warc_binary(spark, str(p2)).collect()}
    assert rows2 == {"https://x.com/g": body, "https://x.com/i": body}
