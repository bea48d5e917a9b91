"""URL / domain curation for web-scale corpora.

Web corpus pipelines key most curation decisions on the URL: exact
re-crawl dedup wants a CANONICAL url (tracking params, fragments, and
default ports stripped), per-domain quotas and blocklists want the
REGISTERED domain (example.co.uk, not www.example.co.uk), and mixture
analysis wants per-domain mass.  All of it is pure Column work —
regexp extraction and higher-order array filtering, JVM-side,
zero shuffle except the aggregations that are the point.

The registered-domain extraction uses a small built-in multi-label
suffix table (the common ccTLD second-level suffixes) rather than the
full Public Suffix List — documented approximation; swap
``MULTI_SUFFIXES`` for a PSL snapshot when exactness matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lsd2_spark.functions.portable_hash import WS

__all__ = [
    "parse_url",
    "canonicalize_url",
    "url_profile",
    "domain_stats",
    "cap_per_domain",
]

# common multi-label public suffixes (approximation of the PSL)
MULTI_SUFFIXES = [
    "co.uk", "org.uk", "gov.uk", "ac.uk", "me.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gov.in", "ac.in",
    "co.nz", "net.nz", "org.nz", "govt.nz",
    "co.za", "org.za", "gov.za",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "org.mx", "gob.mx",
]

# tracking params dropped during canonicalization
TRACKING_PARAMS = [
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "msclkid", "mc_cid", "mc_eid", "ref", "igshid",
]


def _host_of(url: Column) -> Column:
    # authority without userinfo or port, lower-cased
    auth = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)", 1)
    no_user = F.regexp_replace(auth, r"^.*@", "")
    return F.lower(F.regexp_replace(no_user, r":\d+$", ""))


def registered_domain(host: Column) -> Column:
    """eTLD+1 under the built-in suffix table: for a host ending in a
    known multi-label suffix, the last THREE labels; otherwise the last
    two.  A bare single-label host maps to itself."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    return F.when(n <= 1, host).when(
        last2.isin(MULTI_SUFFIXES) & (n >= 3), last3
    ).otherwise(last2)


def parse_url(url: Column) -> Column:
    """Struct column: scheme, host, registered_domain, path, query —
    pure regexp extraction, NULL-safe (malformed urls yield NULL
    fields, never errors)."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    host = _host_of(url)
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+([^?#]*)", 1)
    # anchor the query before any '#': a '?' inside the fragment must
    # not leak fragment content into the query field
    query = F.regexp_extract(url, r"^[^#]*?\?([^#]*)", 1)
    blank_null = lambda c: F.when(c != "", c)  # noqa: E731
    return F.struct(
        blank_null(scheme).alias("scheme"),
        blank_null(host).alias("host"),
        blank_null(registered_domain(host)).alias("registered_domain"),
        blank_null(path).alias("path"),
        blank_null(query).alias("query"),
    )


def canonicalize_url(url: Column) -> Column:
    """Canonical form for exact URL dedup: lower-cased scheme+host,
    default ports and userinfo stripped, fragment dropped, tracking
    params removed, remaining query params SORTED, trailing slash
    normalized away (except the bare root path).  Malformed inputs
    (no scheme) pass through unchanged — canonicalization must be
    total."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    host = _host_of(url)
    # non-default ports are part of the origin and must survive
    # canonicalization; only the scheme's default port is dropped
    auth = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)", 1)
    port = F.regexp_extract(F.regexp_replace(auth, r"^.*@", ""), r":(\d+)$", 1)
    default_port = F.when(scheme == "http", "80").when(
        scheme == "https", "443"
    ).otherwise("")
    host_port = F.when(
        (port != "") & (port != default_port),
        F.concat(host, F.lit(":"), port),
    ).otherwise(host)
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+([^?#]*)", 1)
    # same fragment-safe anchoring as parse_url
    query = F.regexp_extract(url, r"^[^#]*?\?([^#]*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda kv: (kv != "")
            & ~F.lower(F.split(kv, "=").getItem(0)).isin(TRACKING_PARAMS),
        )
    )
    qstr = F.concat_ws("&", kept)
    npath = F.when(path == "", "/").otherwise(
        F.when(
            (F.length(path) > 1) & path.endswith("/"),
            F.substring(path, 1, F.length(path) - 1),
        ).otherwise(path)
    )
    canon = F.concat(
        scheme, F.lit("://"), host_port, npath,
        F.when(qstr != "", F.concat(F.lit("?"), qstr)).otherwise(F.lit("")),
    )
    return F.when(scheme != "", canon).otherwise(url)


def url_profile(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """Per-row parsed + canonicalized view: id, the parse_url struct
    fields flattened, and canonical_url.  One projection."""
    u = F.col(url_col)
    p = parse_url(u)
    return df.select(
        F.col(id_col),
        p.getField("scheme").alias("scheme"),
        p.getField("host").alias("host"),
        p.getField("registered_domain").alias("registered_domain"),
        p.getField("path").alias("path"),
        canonicalize_url(u).alias("canonical_url"),
    )


def domain_stats(
    df: DataFrame, url_col: str, id_col: str, text_col: str | None = None
) -> DataFrame:
    """Per-registered-domain curation stats: page count, distinct
    canonical urls (re-crawl pressure), and — when ``text_col`` is
    given — token mass.  One groupBy on the domain key (partial-agg
    combinable); this is the table a mixture planner or a domain
    blocklist review reads."""
    u = F.col(url_col)
    base = df.select(
        F.col(id_col),
        registered_domain(_host_of(u)).alias("registered_domain"),
        canonicalize_url(u).alias("_canon"),
        *(
            [F.size(F.split(F.col(text_col), WS)).alias("_tok")]
            if text_col
            else []
        ),
    )
    aggs = [
        F.count(F.lit(1)).alias("n_pages"),
        F.approx_count_distinct("_canon").alias("n_canonical_urls"),
    ]
    if text_col:
        aggs.append(F.sum("_tok").alias("n_tokens"))
    return base.groupBy("registered_domain").agg(*aggs)


def cap_per_domain(
    df: DataFrame, url_col: str, id_col: str, cap: int, salt: str = ""
) -> DataFrame:
    """Per-domain page quota: at most ``cap`` pages per registered
    domain, selected by the deterministic hash (reproducible across
    engines/re-runs) — the standard over-crawled-domain guard.
    Delegates to sampling.cap_per_stratum (one shuffle on the domain
    key, rank-limit pushdown)."""
    from lsd2_spark.operators.sampling import cap_per_stratum

    tagged = df.withColumn(
        "_rdomain", registered_domain(_host_of(F.col(url_col)))
    )
    return cap_per_stratum(tagged, id_col, "_rdomain", cap, salt=salt).drop(
        "_rdomain"
    )
