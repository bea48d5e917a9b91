"""URL/domain curation: parsing, canonicalization (vs a Python
urllib reference), registered domains, per-domain stats and caps."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lsd2_spark.operators.web_curation import (
    cap_per_domain,
    canonicalize_url,
    domain_stats,
    parse_url,
    url_profile,
)

URLS = [
    (1, "https://www.Example.co.uk:443/a/b/?utm_source=x&q=1#frag"),
    (2, "https://www.example.co.uk/a/b?q=1"),
    (3, "http://user:pw@Blog.Example.com:8080/post/"),
    (4, "https://example.com"),
    (5, "not a url at all"),
    (6, None),
    (7, "https://other.org/path?b=2&a=1&fbclid=zzz"),
]


def test_parse_url_fields(spark):
    df = spark.createDataFrame(URLS, "doc_id long, url string")
    got = {
        r["doc_id"]: r
        for r in df.select("doc_id", parse_url(F.col("url")).alias("p"))
        .select("doc_id", "p.*")
        .collect()
    }
    assert got[1]["scheme"] == "https"
    assert got[1]["host"] == "www.example.co.uk"
    assert got[1]["registered_domain"] == "example.co.uk"
    assert got[1]["path"] == "/a/b/"
    assert got[3]["host"] == "blog.example.com"  # userinfo + port stripped
    assert got[3]["registered_domain"] == "example.com"
    assert got[4]["path"] is None  # no path component
    assert got[5]["scheme"] is None and got[5]["host"] is None
    assert got[6]["scheme"] is None


def test_canonicalize_dedups_trivial_variants(spark):
    df = spark.createDataFrame(URLS, "doc_id long, url string")
    got = {
        r["doc_id"]: r["c"]
        for r in df.select("doc_id", canonicalize_url(F.col("url")).alias("c")).collect()
    }
    # 1 and 2 differ only by case, default port, tracking param,
    # trailing slash, and fragment -> identical canonical form
    assert got[1] == got[2] == "https://www.example.co.uk/a/b?q=1"
    # params sorted, fbclid stripped
    assert got[7] == "https://other.org/path?a=1&b=2"
    # malformed inputs pass through (total)
    assert got[5] == "not a url at all"
    assert got[6] is None
    # bare host gets the root path
    assert got[4] == "https://example.com/"


def test_url_profile_and_domain_stats(spark):
    rows = [
        (i, f"https://site{i % 3}.com/p/{i}", "some words here")
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    prof = url_profile(df, "url", "doc_id")
    assert prof.count() == 12
    stats = {
        r["registered_domain"]: r
        for r in domain_stats(df, "url", "doc_id", text_col="text").collect()
    }
    assert set(stats) == {"site0.com", "site1.com", "site2.com"}
    assert stats["site0.com"]["n_pages"] == 4
    assert stats["site0.com"]["n_tokens"] == 12  # 4 pages x 3 tokens
    assert stats["site0.com"]["n_canonical_urls"] == 4


def test_cap_per_domain_is_deterministic(spark):
    rows = [(i, f"https://big.com/{i}") for i in range(20)] + [
        (100, "https://small.org/x")
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    a = sorted(r["doc_id"] for r in cap_per_domain(df, "url", "doc_id", cap=5).collect())
    b = sorted(r["doc_id"] for r in cap_per_domain(df, "url", "doc_id", cap=5).collect())
    assert a == b
    assert len(a) == 6  # 5 of big.com + the 1 small.org page
    assert 100 in a


def test_fragment_question_mark_does_not_leak_into_query(spark):
    """A '?' inside the fragment must not be parsed as a query string."""
    rows = [(1, "https://example.com/page#sec?x=1"),
            (2, "https://example.com/page")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r["doc_id"]: r["c"]
        for r in df.select("doc_id", canonicalize_url(F.col("url")).alias("c")).collect()
    }
    assert got[1] == got[2] == "https://example.com/page"
    p = {
        r["doc_id"]: r
        for r in df.select("doc_id", parse_url(F.col("url")).alias("p"))
        .select("doc_id", "p.*").collect()
    }
    assert p[1]["query"] is None


def test_non_default_ports_survive_canonicalization(spark):
    """Only the scheme's default port is dropped — :8080 is a different
    origin and must stay distinct."""
    rows = [
        (1, "http://example.com:8080/app"),
        (2, "http://example.com/app"),
        (3, "http://example.com:80/app"),
        (4, "https://example.com:443/app"),
        (5, "https://example.com:8443/app"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r["doc_id"]: r["c"]
        for r in df.select("doc_id", canonicalize_url(F.col("url")).alias("c")).collect()
    }
    assert got[1] == "http://example.com:8080/app"
    assert got[2] == got[3] == "http://example.com/app"
    assert got[4] == "https://example.com/app"
    assert got[5] == "https://example.com:8443/app"
