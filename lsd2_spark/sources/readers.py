"""Ingest-side sources (reference SURVEY §2.1 S1-S6, S11).

- CSV / CSV.GZ with header or **positional column keys** (the
  reference's PS1 path uses integer keywords ra_kw=5, dec_kw=6,
  id_kw=0 on headerless files — hipscat/examples/hipscat_tests.py:48-55,
  hipscat/dask_utils.py:59-61).
- FITS binary tables via :mod:`lsd2_spark.sources.fits` (astropy is
  not available here, so the public FITS format is decoded directly)
  distributed through Spark's ``binaryFile`` source + ``mapInPandas``
  (reference S4, dask_utils.py:43-45).
- HTTP directory listing (reference S5, util.py:374-395) with stdlib
  parsing only.
- Cloud FS access (reference S11, lsd2_io.py:14-66) is configuration,
  not code, on Spark: ``cloud_fs_conf`` returns the conf pairs for
  abfss:// or s3a:// so callers can pass them to the session builder.
"""

from __future__ import annotations

import html.parser
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    skiprows: int = 0,
    column_keys: dict[str, int] | None = None,
    schema: str | None = None,
) -> DataFrame:
    """CSV/CSV.GZ scan (gz decompression is native).

    ``column_keys`` maps semantic names to **positional** indices for
    headerless files: ``{"id": 0, "ra": 5, "dec": 6}`` renames _c0/_c5/
    _c6 accordingly (reference integer-keyword fallback).

    ``skiprows`` drops leading metadata lines per file (reference
    partitioner.py:32) with **no shuffle and no global ordering**: the
    preamble always lives in the file block starting at byte 0, and
    within a scan partition that block's lines arrive contiguous and in
    order, so a stateful ``mapInPandas`` pass drops the first N lines of
    each file's first block and the cleaned lines feed the native CSV
    parser.  (The previous form — a row_number window over
    ``monotonically_increasing_id`` with no partitionBy — funneled the
    whole input through one task: a hang at 100 TB.)

    Schema contract on the ``skiprows`` path: the schema is inferred
    from the first 1024 cleaned lines ONLY (a full-scan inference would
    read the source twice).  Rows past the sample that don't fit the
    inferred types FAIL the read loudly (``FAILFAST``) instead of being
    silently nulled — when types may widen past the sample (ints then
    floats, ``N/A`` sentinels...), pass an explicit DDL ``schema``
    (e.g. ``"a INT, b STRING"``), which skips inference entirely.
    """
    if not skiprows:
        df = spark.read.csv(
            path, header=header, schema=schema, inferSchema=schema is None
        )
    else:
        txt = spark.read.text(path).select(
            "value",
            F.col("_metadata.file_path").alias("_fp"),
            F.col("_metadata.file_block_start").alias("_bs"),
        )

        def drop_preamble(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            dropped: dict[str, int] = {}  # per-file count, this partition
            for pdf in batches:
                keep = pd.Series(True, index=pdf.index)
                first = pdf["_bs"] == 0
                for fp in pdf.loc[first, "_fp"].unique():
                    done = dropped.get(fp, 0)
                    if done >= skiprows:
                        continue
                    idx = pdf.index[first & (pdf["_fp"] == fp)][: skiprows - done]
                    keep[idx] = False
                    dropped[fp] = done + len(idx)
                yield pdf.loc[keep, ["value"]]

        clean = txt.mapInPandas(drop_preamble, "value string")
        # Single-pass parse: infer the schema ONCE from a driver-side
        # sample (limit() reads only the leading block, not the whole
        # source), then parse the cleaned lines JVM-side with from_csv —
        # no RDD hop and no second inference scan over the input (the
        # previous form ran the strip+text scan twice: once for
        # inferSchema, once for the real read).
        if header or schema is None:
            sample = [r["value"] for r in clean.limit(1024).collect()]
        else:
            sample = []
        if schema is not None:
            ddl = schema
        else:
            tiny = spark.read.csv(
                spark.sparkContext.parallelize(sample or [""]),
                header=header,
                inferSchema=True,
            )
            ddl = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}" for f in tiny.schema.fields
            )
        body = clean
        if header and sample:
            # drop every line equal to the header — covers per-file
            # header repeats in multi-file globs, matching the native
            # parser's header handling
            body = clean.filter(F.col("value") != F.lit(sample[0]))
        # FAILFAST: a row that doesn't fit the (sampled or explicit)
        # schema must abort the read, not silently become nulls
        parsed = body.select(
            F.from_csv(F.col("value"), ddl, {"mode": "FAILFAST"}).alias("_r")
        )
        df = parsed.select("_r.*")
    if column_keys:
        for name, idx in column_keys.items():
            df = df.withColumnRenamed(f"_c{idx}", name)
    return df


def read_fits_tables(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed FITS binary-table scan: ``binaryFile`` source →
    per-file pure-NumPy decode in ``mapInPandas``.  One Arrow batch per
    file; schema inferred from the first file on the driver."""
    from lsd2_spark.sources.fits import fits_table_to_pandas, fits_schema

    files = spark.read.format("binaryFile").load(path_glob)
    first = files.select("path", "content").limit(1).collect()
    if not first:
        raise FileNotFoundError(f"no FITS files match {path_glob}")
    schema = fits_schema(bytes(first[0]["content"]))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                yield fits_table_to_pandas(bytes(blob))

    return files.select("content").mapInPandas(decode, schema)


class _HrefParser(html.parser.HTMLParser):
    def __init__(self) -> None:
        super().__init__()
        self.hrefs: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag.lower() == "a":
            for k, v in attrs:
                if k.lower() == "href" and v:
                    self.hrefs.append(v)


def list_url_files(html_text: str, base_url: str, fmt: str) -> list[str]:
    """Scrape ``<a href>`` links ending in ``fmt`` from a directory
    listing page (reference S5, util.py:374-395).  Pure stdlib; the
    caller fetches the page (driver-side urllib) — separated so it is
    testable without network access."""
    p = _HrefParser()
    p.feed(html_text)
    base = base_url.rstrip("/")
    return [
        h if h.startswith(("http://", "https://")) else f"{base}/{h.lstrip('/')}"
        for h in p.hrefs
        if h.endswith(fmt)
    ]


def fetch_url_listing(url: str, fmt: str) -> list[str]:
    """Driver-side fetch + scrape (needs outbound network)."""
    import urllib.request

    with urllib.request.urlopen(url) as r:  # noqa: S310 — driver helper
        return list_url_files(r.read().decode("utf-8", "ignore"), url, fmt)


def cache_inputs(df: DataFrame, path: str) -> DataFrame:
    """Ingest staging sink (reference S6, dask_utils.py:31-53): persist
    the raw input as Parquet once so re-runs skip the slow source."""
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def cloud_fs_conf(scheme: str, account: str | None = None) -> dict[str, str]:
    """Hadoop connector configuration for cloud filesystems (reference
    S11 — lsd2_io.py's local/abfs switch is pure configuration here)."""
    if scheme == "abfss":
        assert account, "abfss requires a storage account"
        return {
            f"spark.hadoop.fs.azure.account.auth.type.{account}.dfs.core.windows.net": "OAuth",
        }
    if scheme == "s3a":
        return {
            "spark.hadoop.fs.s3a.aws.credentials.provider": (
                "com.amazonaws.auth.DefaultAWSCredentialsProviderChain"
            ),
        }
    raise ValueError(f"unknown scheme {scheme}")


def read_media_files(spark: SparkSession, path_glob: str, media_type: str) -> DataFrame:
    """Distributed media ingest: ``binaryFile`` source → blob table
    (media_id from a stable hash of the file path, payload bytes,
    length, md5).  Feed the result to the multimodal operators
    (``extract_features`` / ``extract_audio_features`` /
    ``resize_images`` / ``sample_frames``).

    At scale the binaryFile source splits the listing across the
    cluster and payloads stay distributed — no driver bytes."""
    files = spark.read.format("binaryFile").load(path_glob)
    payload = F.col("content")
    return files.select(
        F.xxhash64(F.col("path")).alias("media_id"),
        F.col("path").alias("media_path"),
        payload.alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.length(payload).alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
    )
