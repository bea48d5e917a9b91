"""PII redaction (deterministic string transform, handcrafted
fixtures) and corpus quantiles (native GK sketch, rank-error bound
vs exact quantiles)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from lsd2_spark.operators import sketches, text_analysis

SF_DIR = "/root/testdata/sf0.001"


def test_redact_pii_all_classes(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+spam@example.co.uk today"),
            (2, "server 192.168.1.254 went down at 10.0.0.1"),
            (3, "ssn 123-45-6789 leaked"),
            (4, "call (555) 123-4567 or +1 555-123-4567"),
            (5, "nothing sensitive here, just 12345 and 1.5"),
        ],
        "doc_id long, text string",
    )
    got = (
        text_analysis.redact_pii(df, "text")
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert got.loc[1, "text"] == "mail me at <EMAIL> today"
    assert got.loc[1, "n_pii_email"] == 1 and got.loc[1, "n_pii_redacted"] == 1
    assert got.loc[2, "text"] == "server <IP> went down at <IP>"
    assert got.loc[2, "n_pii_ipv4"] == 2
    assert got.loc[3, "text"] == "ssn <SSN> leaked"
    assert got.loc[3, "n_pii_ssn"] == 1
    assert got.loc[4, "text"] == "call <PHONE> or <PHONE>"
    assert got.loc[4, "n_pii_phone"] == 2
    assert got.loc[5, "text"] == "nothing sensitive here, just 12345 and 1.5"
    assert got.loc[5, "n_pii_redacted"] == 0


def test_redact_pii_stabilizes_fingerprints(spark):
    """Two documents differing only in PII must dedup identically
    after the scrub — the reason redaction runs before fingerprints."""
    df = spark.createDataFrame(
        [
            (1, "contact alice@a.com for details"),
            (2, "contact bob@b.org for details"),
        ],
        "doc_id long, text string",
    )
    scrubbed = text_analysis.redact_pii(df, "text")
    fp = text_analysis.content_fingerprint(scrubbed, "text", "doc_id").toPandas()
    assert fp.fingerprint.nunique() == 1


def test_corpus_quantiles_rank_error_bound(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumn(
        "n_chars", F.length("text")
    )
    probs = [0.5, 0.9, 0.99]
    got = sketches.corpus_quantiles(
        docs, "n_chars", ["source"], probs=probs, accuracy=10_000
    ).toPandas()
    assert set(got.columns) == {"source", "n", "p50", "p90", "p99"}
    exact = docs.select("source", "n_chars").toPandas()
    for _, row in got.iterrows():
        vals = np.sort(exact[exact.source == row.source].n_chars.to_numpy())
        n = len(vals)
        assert row.n == n
        for p, cname in zip(probs, ["p50", "p90", "p99"]):
            # rank error <= 1/accuracy (+1 slack for discrete ties)
            got_rank = np.searchsorted(vals, row[cname], side="right")
            target = p * n
            assert abs(got_rank - target) <= max(2.0, n / 10_000 + 1), (
                f"{row.source} {cname}: value {row[cname]} at rank "
                f"{got_rank}, expected ~{target}"
            )


def test_corpus_quantiles_global_group(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 1001)], "x double")
    got = sketches.corpus_quantiles(df, "x", None, probs=[0.5]).toPandas()
    assert len(got) == 1
    assert got.loc[0, "n"] == 1000
    assert abs(got.loc[0, "p50"] - 500.0) <= 1.0


def test_redact_pii_counts_match_inserted_tags_for_nested_matches(spark):
    """A digit-dot run inside an email must not be double-counted as an
    IP: counts follow the replacement progression, so n_pii_redacted
    equals the number of tags actually inserted."""
    from lsd2_spark.operators.text_analysis import redact_pii

    df = spark.createDataFrame(
        [(1, "mail 1.2.3.4@example.com for details")],
        "doc_id long, text string",
    )
    row = redact_pii(df, "text").collect()[0]
    assert row["n_pii_email"] == 1 and row["n_pii_ipv4"] == 0
    assert row["n_pii_redacted"] == 1
    assert row["text"].count("<EMAIL>") == 1 and "<IP>" not in row["text"]
