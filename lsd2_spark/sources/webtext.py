"""Web-corpus text sources: WARC/WET record scan and JSONL corpora.

Common Crawl publishes the extracted-text form of every crawl as WET
files — concatenated WARC records where each record is a small
``key: value`` header block, a blank line, and the plain-text payload.
They are the canonical raw input of the public LLM-pretraining
pipelines (C4, CCNet, RefinedWeb, Dolma all start from WET/WARC), so a
training-data engine needs a first-class scan for them.  (The
reference engine has no web-text source — its scans stop at
CSV/parquet/FITS, hipscat/dask_utils.py:43-61; this module is part of
the training-pipeline extension surface.)

Spark-first design — the whole parse is JVM-side:

- ``spark.read.text(..., lineSep=WARC_SENTINEL)`` splits each file
  into one row per record at the CRLF-anchored version-line sentinel.
  No custom InputFormat,
  no Python in the scan path; ``.wet.gz`` decompresses through the
  Hadoop codec exactly like ``.csv.gz`` (one task per gz member — at
  100 TB the parallelism is the ~64k files of a monthly crawl, the
  same sharding the public pipelines use).
- Header fields are pulled with ``regexp_extract`` Column expressions
  (whole-stage codegen), never a row-at-a-time UDF.
- The text payload is everything after the first blank line, found
  with ``instr`` + ``substring`` on the JVM.

``read_wet`` returns one row per *conversion* record (the text
records; ``warcinfo`` preamble records are dropped) with the columns
a downstream pipeline keys on: ``url``, ``ts`` (capture time),
``record_id``, ``content_length`` (the header's byte claim) and
``text``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: record split sentinel: the version line of the NEXT record together
#: with the CRLF that closes the current record's content block (WARC
#: records are framed ``content CRLF CRLF`` before the next version
#: line).  Anchoring on the surrounding CRLFs means a payload that
#: merely *contains* the substring ``WARC/1.0`` (a page quoting the
#: spec) does not split a record unless it reproduces the full
#: blank-line + version-line framing — the same ambiguity any
#: non-Content-Length parser has, vanishingly rare in extracted text.
WARC_SENTINEL = "\r\nWARC/1.0\r\n"


def _sentinel_from_head(head: bytes, fname: str) -> str:
    """Parse one archive head (first ≤4 KiB) into a record sentinel."""
    import zlib as _zlib

    if head[:2] == b"\x1f\x8b":  # gzip member: inflate just the head;
        # decompressobj(wbits=47) auto-detects the gzip wrapper and
        # yields whatever the truncated stream holds (no EOF error)
        head = _zlib.decompressobj(47).decompress(head, 256)
    nl = head.find(b"\n")
    line = head[: nl if nl >= 0 else len(head)]
    crlf = line.endswith(b"\r")
    version = line.rstrip(b"\r").decode("ascii", "replace")
    if not version.startswith("WARC/") or len(version) > 16:
        raise ValueError(
            f"{fname!r} does not start with a WARC version line "
            f"(got {line[:32]!r}); not a WARC/WET archive?"
        )
    eol = "\r\n" if crlf else "\n"
    return f"{eol}{version}{eol}"


def _sample_paths(files: list, sample: int) -> list:
    """First + last + evenly spaced between (``sample <= 1`` → first
    only).  Selection happens on NAMES, before any head is read — the
    probe must cost ``sample`` reads, not one round-trip per object in
    a hundred-thousand-file crawl directory."""
    if len(files) <= sample:
        return files
    if sample <= 1:
        return [files[0]]
    idx = sorted(
        {round(i * (len(files) - 1) / (sample - 1)) for i in range(sample)}
    )
    return [files[i] for i in idx]


def _probe_heads_local(path: str, sample: int) -> list[tuple[str, bytes]]:
    import glob as _glob
    import os as _os

    cand = path
    if _os.path.isdir(path):
        cand = _os.path.join(path, "*")
    files = sorted(f for f in _glob.glob(cand) if _os.path.isfile(f))
    heads = []
    for f in _sample_paths(files, sample):
        with open(f, "rb") as fh:
            heads.append((f, fh.read(4096)))
    return heads


def _probe_heads_hadoop(path: str, spark, sample: int) -> list[tuple[str, bytes]]:
    """Head-probe through the Hadoop FileSystem (JVM gateway) — the
    remote-scheme twin of the local glob/open probe, so ``hdfs://`` /
    ``s3a://`` / ``abfss://`` / ``file://`` corpora get the same
    framing detection instead of a driver-side FileNotFoundError.
    One listing RPC, then ``sample`` bounded head reads."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(conf)
    if fs.isDirectory(jpath):
        jpath = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "/*")
    statuses = fs.globStatus(jpath)
    files = sorted(
        (s for s in (statuses or []) if s.isFile()),
        key=lambda s: s.getPath().getName(),
    )
    heads = []
    for s in _sample_paths(files, sample):
        stream = fs.open(s.getPath())
        try:
            bounded = jvm.org.apache.commons.io.input.BoundedInputStream(
                stream, 4096
            )
            head = bytes(
                jvm.org.apache.commons.io.IOUtils.toByteArray(bounded)
            )
        finally:
            stream.close()
        heads.append((str(s.getPath()), head))
    return heads


#: any ``scheme://`` path — routed through the Hadoop probe, which is
#: what Spark's own text reader will resolve it with
_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://"


def detect_warc_framing(path: str, spark=None, sample: int = 5) -> str:
    """Probe the heads of a SAMPLE of archive files for the WARC
    version line and return the record-split sentinel for this corpus.

    WARC archives are permitted to carry ``WARC/1.1`` version lines
    (warc-specifications 1.1 §4; wget ≥1.20 and some mirrors emit
    them), and some mirrors rewrite CRLF framing to bare LF.  A
    hard-pinned ``WARC/1.0`` + CRLF sentinel silently parses such a
    file as ONE record — so the default scan probes instead of
    assuming.  The probe reads ≤4 KiB from up to ``sample`` files
    (first, last, and evenly spaced between — gzip-aware via the magic
    bytes) and RAISES when the sampled files disagree: a directory
    mixing WARC/1.0 with WARC/1.1 (or CRLF with bare-LF) cannot be
    split by one literal ``lineSep``, and parsing the other framing's
    files as one giant record each is exactly the silent failure this
    probe exists to prevent.  Pass ``record_sep`` explicitly and scan
    each framing's files separately in that case.

    With ``spark`` given (``read_wet``/``read_warc`` always pass it),
    the probe goes through the Hadoop FileSystem via the JVM gateway
    for EVERY path — scheme'd (``hdfs://``, ``s3a://``, ``abfss://``,
    ``file://``) or scheme-less, which Hadoop resolves against
    ``fs.defaultFS`` exactly like the ``spark.read.text`` scan will.
    Without a session the local glob/open probe only understands plain
    local paths and a scheme'd path raises with that guidance.

    Raises ``ValueError`` when a head is not a WARC version line —
    failing loudly beats a silent one-record parse.
    """
    import re as _re

    if spark is not None:
        # ALWAYS probe through the Hadoop FileSystem when a session is
        # available: it resolves scheme-less paths against
        # fs.defaultFS exactly like spark.read.text will — a driver
        # local glob would probe the wrong filesystem on a cluster
        # whose defaultFS is HDFS (FileNotFoundError on valid data,
        # or a stale same-named local file returning the wrong
        # sentinel)
        heads = _probe_heads_hadoop(path, spark, sample)
    elif _re.match(_SCHEME_RE, path):
        raise ValueError(
            f"detect_warc_framing({path!r}) needs spark= to probe a "
            "scheme'd path through the Hadoop FileSystem; pass "
            "spark= or an explicit record_sep (e.g. WARC_SENTINEL)"
        )
    else:
        heads = _probe_heads_local(path, sample)
    if not heads:
        raise FileNotFoundError(f"no archive files match {path!r}")
    sentinels = {f: _sentinel_from_head(h, f) for f, h in heads}
    distinct = sorted(set(sentinels.values()))
    if len(distinct) > 1:
        detail = ", ".join(f"{f!r}: {s!r}" for f, s in sentinels.items())
        raise ValueError(
            f"mixed WARC framings under {path!r} ({detail}); a single "
            "lineSep cannot split both — pass record_sep explicitly and "
            "scan each framing's files separately"
        )
    return distinct[0]

# header values run to end-of-line; WET headers are \r\n-terminated but
# tolerate bare-\n writers (some mirrors re-terminate).  NOTE [ \t] not
# \s after the colon: Java-regex-only surface, but keep the portable
# discipline used everywhere else in the repo.
_HDR = "(?m)^{name}:[ \\t]*([^\\r\\n]+)"


def _header(col, name: str):
    return F.regexp_extract(col, _HDR.format(name=name), 1)


def read_wet(
    spark: SparkSession,
    path: str,
    min_length: int = 0,
    record_sep: str | None = None,
) -> DataFrame:
    """Scan WET (WARC extracted-text) files into a documents frame.

    One output row per ``WARC-Type: conversion`` record::

        url string, ts string, record_id string,
        content_length long, text string

    ``min_length`` drops records whose payload is shorter (after the
    trailing record-separator blank lines are stripped) — the standard
    first gate of every CC pipeline.

    The scan is a native text scan split on the record sentinel; all
    field extraction is Column expressions, so Catalyst prunes and
    pushes as usual and nothing leaves the JVM.  ``record_sep=None``
    (default) probes the first file's head via
    :func:`detect_warc_framing` — one ≤4 KiB driver-side read that
    picks the version (``WARC/1.0`` vs ``WARC/1.1``) AND the line
    framing (spec CRLF vs bare-LF mirrors) and fails loudly on
    non-WARC input, instead of silently parsing a mismatched archive
    as one record.  Pass an explicit sentinel (e.g. ``WARC_SENTINEL``)
    to skip the probe or to scan mixed-framing corpora one framing at
    a time.

    The projection half is :func:`wet_records` — call it directly on
    ``spark.readStream.option("lineSep", WARC_SENTINEL).text(inbox)``
    for continuous crawl ingestion (pure projection, streams
    unchanged; parity-tested).
    """
    if record_sep is None:
        record_sep = detect_warc_framing(path, spark)
    out = wet_records(spark.read.text(path, lineSep=record_sep))
    if min_length > 0:
        out = out.filter(F.length("text") >= min_length)
    return out


def wet_records(raw: DataFrame) -> DataFrame:
    """The WET record projection over an already-split frame (one row
    per record chunk in ``value``) — shared by the batch scan and any
    ``readStream`` twin."""
    # each row: "WARC-Type: ...\r\n...\r\n\r\n<payload>\r\n\r\n"
    # (the sentinel itself is consumed by the split); the chunk before
    # the first sentinel is the file preamble -> filtered by type below
    rec = raw.select(F.col("value").alias("_rec"))
    # header block = up to the first blank line; payload = after it
    sep_rn = F.instr(F.col("_rec"), "\r\n\r\n")
    sep_n = F.instr(F.col("_rec"), "\n\n")
    # whichever blank-line form appears first (0 = absent)
    use_rn = (sep_rn > 0) & ((sep_n == 0) | (sep_rn <= sep_n))
    sep_pos = F.when(use_rn, sep_rn).otherwise(sep_n)
    sep_len = F.when(use_rn, F.lit(4)).otherwise(F.lit(2))
    hdr = F.when(sep_pos > 0, F.substring(F.col("_rec"), 1, sep_pos - 1)).otherwise(
        F.col("_rec")
    )
    body = F.when(
        sep_pos > 0,
        F.expr("substring(_rec, sep_pos + sep_len)"),
    ).otherwise(F.lit(""))
    out = (
        rec.withColumn("sep_pos", sep_pos.cast("int"))
        .withColumn("sep_len", sep_len.cast("int"))
        .select(
            _header(hdr, "WARC-Target-URI").alias("url"),
            _header(hdr, "WARC-Date").alias("ts"),
            _header(hdr, "WARC-Record-ID").alias("record_id"),
            _header(hdr, "Content-Length").cast("long").alias("content_length"),
            _header(hdr, "WARC-Type").alias("_type"),
            # records are separated by \r\n\r\n which the NEXT record's
            # sentinel split leaves at the tail of THIS payload
            F.regexp_replace(body, "[\\r\\n]+$", "").alias("text"),
        )
        .filter(F.col("_type") == "conversion")
        .drop("_type")
    )
    return out


def read_warc(
    spark: SparkSession,
    path: str,
    record_sep: str | None = None,
    content_type_filter: str | None = "text/html",
    identity_body_only: bool = True,
    dechunk: bool = True,
) -> DataFrame:
    """Scan full WARC crawl files (``WARC-Type: response`` records —
    the raw-HTML form of Common Crawl, one step upstream of WET).

    A response record's payload is itself an HTTP message: status
    line, response headers, blank line, body.  Both splits (WARC
    header / payload, then HTTP header / body) are native ``instr`` +
    ``substring``; the HTTP status and Content-Type come from
    ``regexp_extract``.  Output::

        url string, ts string, record_id string, http_status int,
        content_type string, identity_body boolean, body string

    ``content_type_filter`` keeps only responses whose Content-Type
    contains the substring, case-insensitively (default ``text/html``
    — the pretraining path); pass ``None`` to keep everything.
    ``dechunk=True`` (default) removes ``Transfer-Encoding: chunked``
    hex size-line framing — a large fraction of real crawl responses
    — in one Arrow pass over ONLY the chunked rows (clean rows never
    leave the JVM; see :func:`dechunk_chunked_bodies`), honoring the
    byte counts rather than pattern-matching size lines, so a content
    line that happens to look like a hex token survives.  Successfully
    dechunked rows get ``identity_body=True``; malformed chunk framing
    leaves the row flagged false.  After that, ``identity_body_only``
    (default) drops the responses whose body is still not verbatim
    text: ``Content-Encoding: gzip/br/deflate`` bodies are binary — a
    native inflate does not belong in the scan path, so those
    records are surfaced via the ``identity_body`` flag and gated.
    ``record_sep=None`` probes version + framing like :func:`read_wet`.
    Remaining non-text payloads (images served as text/html, torn
    truncations) come out as mojibake strings for the downstream
    quality gates to drop — binary-exact handling belongs to the
    media path, not the text path.

    Feed the result through
    :func:`lsd2_spark.operators.html_text.html_to_text` to get the
    documents-table shape.  The projection half is
    :func:`warc_records` — call it on a ``readStream`` text source for
    continuous crawl ingestion (pure projection, streams unchanged;
    parity-tested).
    """
    if record_sep is None:
        record_sep = detect_warc_framing(path, spark)
    out = warc_records(spark.read.text(path, lineSep=record_sep))
    if content_type_filter is not None:
        # servers emit TEXT/HTML / Text/Html in real crawls
        out = out.filter(
            F.lower(F.col("content_type")).contains(content_type_filter.lower())
        )
    if dechunk:
        out = dechunk_chunked_bodies(out)
    if identity_body_only:
        out = out.filter(F.col("identity_body"))
    return out


def warc_records(raw: DataFrame) -> DataFrame:
    """The WARC response-record projection over an already-split frame
    — shared by the batch scan and any ``readStream`` twin."""
    # head|tail at the FIRST blank line in either CRLF framing or the
    # bare-LF rewrite some mirrors apply: one regex split with limit 2.
    # (A CASE tree comparing instr() positions per framing re-expands
    # at every consumer when Catalyst collapses the projections and
    # blows Janino's method-size limit — codegen then silently falls
    # back to interpreted rows.  The split is a single small expression;
    # whole-stage codegen's subexpression elimination evaluates it once
    # per row even though head and tail both reference it.)
    def _split(df: DataFrame, src: str, head: str, tail: str) -> DataFrame:
        parts = F.split(F.col(src), "\\r?\\n\\r?\\n", 2)
        return df.select(
            "*",
            parts.getItem(0).alias(head),
            F.when(F.size(parts) > 1, parts.getItem(1))
            .otherwise(F.lit(""))
            .alias(tail),
        ).drop(src)

    # WARC header | HTTP payload
    rec = _split(raw.select(F.col("value").alias("_rec")), "_rec", "_hdr", "_http")
    hdr = F.col("_hdr")
    out = (
        rec.select(
            _header(hdr, "WARC-Target-URI").alias("url"),
            _header(hdr, "WARC-Date").alias("ts"),
            _header(hdr, "WARC-Record-ID").alias("record_id"),
            _header(hdr, "WARC-Type").alias("_type"),
            F.col("_http"),
        )
        .filter(F.col("_type") == "response")
        .drop("_type")
    )
    # HTTP header block | body
    out = _split(out, "_http", "_hh", "_body")
    http_hdr = F.col("_hh")
    body = F.col("_body")
    te = F.lower(
        F.regexp_extract(
            http_hdr, "(?mi)^Transfer-Encoding:[ \\t]*([^\\r\\n]+)", 1
        )
    )
    ce = F.lower(
        F.regexp_extract(
            http_hdr, "(?mi)^Content-Encoding:[ \\t]*([^\\r\\n]+)", 1
        )
    )
    out = (
        out.withColumn("transfer_encoding", te)
        .withColumn("content_encoding", ce)
        .select(
            "url",
            "ts",
            "record_id",
            F.regexp_extract(http_hdr, r"^HTTP/[0-9.]+ ([0-9]{3})", 1)
            .cast("int")
            .alias("http_status"),
            F.regexp_extract(
                http_hdr, "(?mi)^Content-Type:[ \\t]*([^\\r\\n]+)", 1
            ).alias("content_type"),
            # a chunked body is interleaved with hex chunk-size framing
            # lines and a gzip/br/deflate body is binary — neither is
            # usable text verbatim; surface the fact so callers (and
            # read_warc's identity_body_only default) can gate on it;
            # the raw encodings are exposed so dechunk_chunked_bodies
            # can route exactly the chunked-but-uncompressed rows
            "transfer_encoding",
            "content_encoding",
            (
                F.col("transfer_encoding").isin("", "identity")
                & F.col("content_encoding").isin("", "identity")
            ).alias("identity_body"),
            F.regexp_replace(body, "[\\r\\n]+$", "").alias("body"),
        )
    )
    return out


def _dechunk_str(s: str | None) -> str | None:
    """Decode one HTTP/1.1 chunked body (RFC 9112 §7.1): size lines are
    hex byte counts (optional ``;ext``), honored on the UTF-8 byte
    re-encoding of the scanned string; trailers after the 0-chunk are
    dropped.  Returns None on malformed framing (caller keeps the raw
    body and leaves ``identity_body`` false).  A chunk boundary that
    splits a multi-byte codepoint is unrecoverable here — the text
    scan already replaced the torn bytes with U+FFFD, the re-encoded
    byte counts stop matching, and the row stays gated false (binary-
    exact recovery belongs to a bytes-typed media scan, not the text
    path)."""
    if s is None:
        return None
    data = s.encode("utf-8")
    pos, parts = 0, []
    while True:
        nl = data.find(b"\n", pos)
        if nl < 0:
            # the record-sentinel split strips trailing [\r\n]+, so the
            # terminal "0" size line legitimately has no newline left
            nl = len(data)
        tok = data[pos:nl].strip(b"\r").split(b";", 1)[0].strip()
        try:
            size = int(tok, 16)
        except ValueError:
            return None
        pos = nl + 1
        if size == 0:
            break  # trailers (if any) are dropped
        chunk = data[pos : pos + size]
        if len(chunk) < size:
            return None
        parts.append(chunk)
        pos += size
        if data[pos : pos + 2] == b"\r\n":
            pos += 2
        elif data[pos : pos + 1] == b"\n":
            pos += 1
        else:
            return None
    return b"".join(parts).decode("utf-8", "replace")


def dechunk_chunked_bodies(df: DataFrame, body_col: str = "body") -> DataFrame:
    """Remove HTTP chunked transfer framing from a :func:`warc_records`
    frame.

    Only rows with ``transfer_encoding='chunked'`` and no content
    compression enter the Arrow kernel — every other row passes through
    untouched on the JVM (the text_normalize prefilter pattern), so at
    100 TB the Python cost is proportional to the chunked fraction of
    the crawl, not the crawl.  Successfully decoded rows come back with
    the framing stripped, ``identity_body=True`` AND
    ``transfer_encoding='identity'`` — the operator is idempotent:
    running it twice cannot re-dechunk an already-decoded body, and
    downstream consumers gating on the raw encoding column (as this
    function itself does) see the body's actual state.  Malformed
    framing keeps the raw body, the false flag and the ``'chunked'``
    label.  The split-and-union keeps both branches pure projections,
    so the batch and foreachBatch streaming paths share it.
    """
    @F.pandas_udf("string")
    def _dechunk(col: pd.Series) -> pd.Series:
        return col.map(_dechunk_str, na_action="ignore")

    is_chunked = (F.col("transfer_encoding") == "chunked") & F.col(
        "content_encoding"
    ).isin("", "identity")
    rest = df.filter(~is_chunked)
    fixed = (
        df.filter(is_chunked)
        .withColumn("_dechunked", _dechunk(F.col(body_col)))
        .withColumn(
            "identity_body",
            F.col("_dechunked").isNotNull(),
        )
        .withColumn(
            "transfer_encoding",
            F.when(F.col("_dechunked").isNotNull(), F.lit("identity"))
            .otherwise(F.col("transfer_encoding")),
        )
        .withColumn(body_col, F.coalesce("_dechunked", F.col(body_col)))
        .drop("_dechunked")
    )
    return rest.unionByName(fixed)


_WARC_BIN_SCHEMA = (
    "url string, ts string, record_id string, http_status int, "
    "content_type string, transfer_encoding string, "
    "content_encoding string, identity_body boolean, body string"
)


def _dechunk_bytes(data: bytes) -> bytes | None:
    """Byte-exact chunked-framing removal (the bytes twin of
    :func:`_dechunk_str` — no re-encoding, so mid-codepoint chunk
    splits are fine here)."""
    pos, parts = 0, []
    while True:
        nl = data.find(b"\n", pos)
        if nl < 0:
            nl = len(data)
        tok = data[pos:nl].strip(b"\r").split(b";", 1)[0].strip()
        try:
            size = int(tok, 16)
        except ValueError:
            return None
        pos = nl + 1
        if size == 0:
            break
        chunk = data[pos : pos + size]
        if len(chunk) < size:
            return None
        parts.append(chunk)
        pos += size
        if data[pos : pos + 2] == b"\r\n":
            pos += 2
        elif data[pos : pos + 1] == b"\n":
            pos += 1
        else:
            return None
    return b"".join(parts)


def _parse_warc_bytes(data: bytes) -> list[tuple]:
    """Parse one WARC file's raw bytes into response-record tuples
    matching ``_WARC_BIN_SCHEMA`` — the byte-exact worker behind
    :func:`read_warc_binary`.  Handles multi-member gzip (Common Crawl
    writes one gzip member per record), chunked transfer framing, and
    gzip/deflate content encodings; the decoded body is UTF-8 text
    (replacement chars for genuinely non-text payloads)."""
    import re as _re
    import zlib as _zlib

    if data[:2] == b"\x1f\x8b":
        # concatenated gzip members: inflate them all back-to-back
        out, pos = [], 0
        while pos < len(data) and data[pos : pos + 2] == b"\x1f\x8b":
            d = _zlib.decompressobj(47)
            out.append(d.decompress(data[pos:]))
            consumed = len(data) - pos - len(d.unused_data)
            if consumed <= 0:
                break
            pos += consumed
        data = b"".join(out)

    rows = []
    # record frames: a version line at a record boundary
    recs = _re.split(rb"(?:\r?\n)?WARC/1\.[01]\r?\n", data)
    for rec in recs:
        if not rec.strip():
            continue
        m = _re.search(rb"\r?\n\r?\n", rec)
        hdr = rec[: m.start()] if m else rec
        payload = rec[m.end() :] if m else b""

        def h(name: bytes, src: bytes = hdr) -> str:
            mm = _re.search(
                rb"(?mi)^" + name + rb":[ \t]*([^\r\n]+)", src
            )
            return mm.group(1).decode("utf-8", "replace") if mm else ""

        if h(b"WARC-Type").lower() != "response":
            continue
        hm = _re.search(rb"\r?\n\r?\n", payload)
        http_hdr = payload[: hm.start()] if hm else payload
        body = payload[hm.end() :] if hm else b""
        body = body.rstrip(b"\r\n")
        sm = _re.match(rb"HTTP/[0-9.]+ ([0-9]{3})", http_hdr)
        status = int(sm.group(1)) if sm else None
        te = h(b"Transfer-Encoding", http_hdr).lower()
        ce = h(b"Content-Encoding", http_hdr).lower()
        ok = True
        if te == "chunked":
            dechunked = _dechunk_bytes(body)
            if dechunked is None:
                ok = False
            else:
                body = dechunked
                # report the body's actual state (idempotency contract,
                # same as dechunk_chunked_bodies): framing is gone
                te = "identity"
        if ok and ce in ("gzip", "x-gzip", "deflate"):
            try:
                wbits = 47 if ce != "deflate" else 15
                body = _zlib.decompressobj(wbits).decompress(body)
            except _zlib.error:
                try:  # raw-deflate servers mislabel; second chance
                    body = _zlib.decompressobj(-15).decompress(body)
                except _zlib.error:
                    ok = False
        elif ok and ce == "br":
            # brotli is not in this environment's baked-in set; decode
            # when the library exists, otherwise the row stays flagged
            # (identical to the text scan's gating for br)
            try:
                import brotli  # type: ignore

                body = brotli.decompress(body)
            except ImportError:
                ok = False
            except Exception:
                ok = False
        rows.append(
            (
                h(b"WARC-Target-URI"),
                h(b"WARC-Date"),
                h(b"WARC-Record-ID"),
                status,
                h(b"Content-Type", http_hdr),
                te,
                ce,
                ok,
                body.decode("utf-8", "replace"),
            )
        )
    return rows


def read_warc_binary(
    spark: SparkSession,
    path: str,
    content_type_filter: str | None = "text/html",
    identity_body_only: bool = True,
) -> DataFrame:
    """Byte-exact WARC response scan — the compressed-body companion to
    :func:`read_warc`.

    The text scan cannot recover ``Content-Encoding: gzip/deflate``
    bodies (and chunked bodies torn mid-codepoint): the UTF-8 text
    reader has already replaced the compressed bytes.  This reader goes
    through ``binaryFile`` + one ``mapInPandas`` kernel per file, so it
    sees raw bytes: multi-member gzip files (Common Crawl writes one
    member per record), chunked framing honored byte-exactly, and
    gzip/x-gzip/deflate content encodings inflated before the single
    UTF-8 decode.  ``identity_body`` is True when the body decoded to
    usable text (possibly after dechunk/inflate) — with the default
    gate only undecodable bodies drop.

    Scale shape: parallelism = files (the ~64k files of a monthly
    crawl, same as the text scan); each task holds one file's bytes
    plus the record being inflated, so executor memory must cover the
    crawl's file size (~1 GB for CC) — the price of byte exactness.
    Prefer :func:`read_warc` when the corpus is identity-encoded.
    """
    files = spark.read.format("binaryFile").load(path)

    def kernel(batches):
        for pdf in batches:
            for blob in pdf["content"]:
                rows = _parse_warc_bytes(bytes(blob))
                if rows:
                    yield pd.DataFrame(
                        rows,
                        columns=[
                            "url",
                            "ts",
                            "record_id",
                            "http_status",
                            "content_type",
                            "transfer_encoding",
                            "content_encoding",
                            "identity_body",
                            "body",
                        ],
                    )

    out = files.select("content").mapInPandas(kernel, _WARC_BIN_SCHEMA)
    if content_type_filter is not None:
        out = out.filter(
            F.lower(F.col("content_type")).contains(content_type_filter.lower())
        )
    if identity_body_only:
        out = out.filter(F.col("identity_body"))
    return out


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    text_col: str = "text",
    require_text: bool = True,
) -> DataFrame:
    """Scan JSONL corpora (the interchange format of the public
    LLM-data releases — Dolma, RedPajama, FineWeb all ship
    ``*.jsonl.gz``).

    Thin, convention-pinning wrapper over the native JSON source:

    - ``schema`` (DDL string) pins the shape so a 100 TB scan never
      pays the sample-the-world inference pass and never drifts when
      one shard adds a field; unset, inference is left to Spark
      (fine for exploration, logged cost at scale).
    - malformed lines land in ``_corrupt_json`` instead of killing the
      job (PERMISSIVE), so one torn shard of a million-file corpus
      costs rows, not the run;
    - ``require_text=True`` drops rows whose ``text_col`` is NULL —
      including the corrupt-line rows — which is what every consumer
      in :mod:`lsd2_spark.operators` assumes.
    """
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_json"
    )
    if schema is not None:
        sch = schema if "_corrupt_json" in schema else schema + ", _corrupt_json string"
        reader = reader.schema(sch)
    df = reader.json(path)
    if require_text:
        if text_col not in df.columns:
            raise ValueError(
                f"require_text=True but column {text_col!r} is not in the "
                f"schema {df.columns}; pass text_col= or require_text=False"
            )
        df = df.filter(F.col(text_col).isNotNull())
    return df


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str = "gzip",
    shard_key: str | None = None,
    n_shards: int | None = None,
    target_shard_bytes: int | None = None,
    size_sample_frac: float = 0.01,
) -> None:
    """Write a corpus frame as ``*.jsonl(.gz)`` shards — one JSON
    object per line, the shape every external tokenizer/trainer
    ingests.

    Sharding, in order of preference:

    - ``shard_key`` + (``n_shards`` or ``target_shard_bytes``):
      DETERMINISTIC shards — rows are hash-partitioned on the key
      (murmur3 with Spark's fixed seed), so re-running the write on
      the same input produces the same shard membership (reproducible
      corpus builds; round-robin ``repartition(n)`` does not).
      ``target_shard_bytes`` sizes ``n`` from a ``size_sample_frac``
      sample of the serialized rows — one cheap sampled pass, never a
      full pre-scan (CC-scale convention: ~150-300 MB compressed per
      shard, so pass ~5x that uncompressed).
    - neither: shard count = the frame's existing partitioning.
    """
    if shard_key is not None:
        if n_shards is None:
            if target_shard_bytes is None:
                raise ValueError(
                    "shard_key needs n_shards or target_shard_bytes"
                )
            est = (
                df.sample(fraction=size_sample_frac, seed=7)
                .select(
                    F.sum(
                        F.octet_length(F.to_json(F.struct(*df.columns)))
                    ).alias("b"),
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()[0]
            )
            if not est["n"]:
                n_shards = 1
            else:
                # total bytes ~= sampled bytes / fraction — sizes the
                # shard count from the SAME sampled pass; a separate
                # df.count() would re-execute the whole upstream
                # pipeline just to count it
                total_bytes = est["b"] / size_sample_frac
                n_shards = max(1, int(total_bytes / target_shard_bytes + 0.5))
        df = df.repartition(int(n_shards), F.col(shard_key))
    df.write.mode("overwrite").option("compression", compression).json(path)
