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
    record_sep: str = WARC_SENTINEL,
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
    pushes as usual and nothing leaves the JVM.  ``record_sep`` is the
    spec-mandated CRLF framing; a mirror that rewrote the files to
    bare-LF line endings needs ``record_sep="\\nWARC/1.0\\n"``.

    The projection half is :func:`wet_records` — call it directly on
    ``spark.readStream.option("lineSep", WARC_SENTINEL).text(inbox)``
    for continuous crawl ingestion (pure projection, streams
    unchanged; parity-tested).
    """
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
    record_sep: str = WARC_SENTINEL,
    content_type_filter: str | None = "text/html",
    identity_body_only: bool = True,
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
    ``identity_body_only`` (default) additionally drops responses
    whose body is not verbatim text: ``Transfer-Encoding: chunked``
    interleaves hex chunk-size framing into the body and
    ``Content-Encoding: gzip/br/deflate`` bodies are binary — a
    native dechunk/inflate does not belong in the scan path, so those
    records are surfaced via the ``identity_body`` flag and gated.
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
    out = warc_records(spark.read.text(path, lineSep=record_sep))
    if content_type_filter is not None:
        # servers emit TEXT/HTML / Text/Html in real crawls
        out = out.filter(
            F.lower(F.col("content_type")).contains(content_type_filter.lower())
        )
    if identity_body_only:
        out = out.filter(F.col("identity_body"))
    return out


def warc_records(raw: DataFrame) -> DataFrame:
    """The WARC response-record projection over an already-split frame
    — shared by the batch scan and any ``readStream`` twin."""
    rec = raw.select(F.col("value").alias("_rec"))
    # WARC header | HTTP payload
    wsep = F.instr(F.col("_rec"), "\r\n\r\n")
    hdr = F.when(wsep > 0, F.substring(F.col("_rec"), 1, wsep - 1)).otherwise(
        F.col("_rec")
    )
    payload = F.when(wsep > 0, F.expr("substring(_rec, wsep + 4)")).otherwise(
        F.lit("")
    )
    out = (
        rec.withColumn("wsep", wsep.cast("int"))
        .select(
            _header(hdr, "WARC-Target-URI").alias("url"),
            _header(hdr, "WARC-Date").alias("ts"),
            _header(hdr, "WARC-Record-ID").alias("record_id"),
            _header(hdr, "WARC-Type").alias("_type"),
            payload.alias("_http"),
        )
        .filter(F.col("_type") == "response")
        .drop("_type")
    )
    # HTTP header block | body
    hsep = F.instr(F.col("_http"), "\r\n\r\n")
    http_hdr = F.when(hsep > 0, F.substring(F.col("_http"), 1, hsep - 1)).otherwise(
        F.col("_http")
    )
    body = F.when(hsep > 0, F.expr("substring(_http, hsep + 4)")).otherwise(
        F.lit("")
    )
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
        out.withColumn("hsep", hsep.cast("int"))
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
            # read_warc's identity_body_only default) can gate on it
            (te.isin("", "identity") & ce.isin("", "identity")).alias(
                "identity_body"
            ),
            F.regexp_replace(body, "[\\r\\n]+$", "").alias("body"),
        )
    )
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
    if require_text and text_col in df.columns:
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
