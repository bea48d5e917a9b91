"""HTML → text extraction, JVM-side only.

The stage between a raw crawl (``sources.webtext.read_warc``) and the
documents table every text operator consumes — what WET files contain
pre-extracted, for pipelines that start from raw WARC instead.

A full DOM parse doesn't belong in the scan path at 100 TB (and no
HTML library is assumed present); the public pipelines' extractors
(jusText, trafilatura, resiliparse) are driver-installed native code.
This operator is the *portable* regex-pipeline form — the same family
of extraction C4 used (its cleaning is line-based over tag-stripped
text) — expressed as a chain of ``regexp_replace`` Column
expressions: zero Python, zero shuffle, whole-stage codegen.

Stages, in order (order is load-bearing and tested):

1. drop ``<script>``/``<style>``/``<noscript>``/``<template>``
   elements *with their contents* (non-greedy, case-insensitive,
   dotall);
2. drop HTML comments ``<!-- ... -->`` (dotall);
3. convert block-element boundaries (``</p>``, ``<br>``, ``</div>``,
   ``</h1-6>``, ``</li>``, ``</tr>``, ``</title>``) to newlines so
   paragraph structure survives tag stripping (the line-dedup and
   Gopher line rules depend on it);
4. strip every remaining tag;
5. decode the named entities that dominate real pages (amp, lt, gt,
   quot, apos/#39, nbsp) plus decimal ``&#NNN;`` escapes for the
   ASCII range — rarer named entities are left verbatim for the
   quality gates to judge;
6. collapse runs of spaces/tabs, trim line edges, collapse 3+
   newlines to 2 (paragraph break), trim the document.

``&amp;`` is decoded LAST so markup like ``&amp;lt;`` round-trips to
the literal ``&lt;`` a page displayed, never to a phantom ``<``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["html_to_text", "html_text_column"]

_DROP_ELEMENTS = "script|style|noscript|template"
_BLOCK_CLOSERS = (
    "p|div|h[1-6]|li|tr|title|blockquote|pre|section|article|header|footer"
)


def html_text_column(col: Column) -> Column:
    """The extraction as a Column expression (for use inside other
    projections); ``html_to_text`` is the DataFrame wrapper."""
    x = F.coalesce(col, F.lit(""))
    # 1. container elements, contents and all
    # the closer is pinned to the OPENING tag via backreference: with a
    # plain alternation an unclosed <script> would be "closed" by the
    # next </style>, deleting the legitimate content between them
    x = F.regexp_replace(
        x,
        f"(?is)<({_DROP_ELEMENTS})\\b(?:[^>\"']|\"[^\"]*\"|'[^']*')*>"
        ".*?</\\1[ \\t\\r\\n\\f]*>",
        " ",
    )
    # 2. comments
    x = F.regexp_replace(x, "(?s)<!--.*?-->", " ")
    # 3. block boundaries -> newline (openers for void/br, closers for blocks)
    x = F.regexp_replace(x, "(?i)<br[ \\t\\r\\n\\f]*/?>", "\n")
    x = F.regexp_replace(x, f"(?i)</(?:{_BLOCK_CLOSERS})[ \\t\\r\\n\\f]*>", "\n")
    # 4. every remaining tag (incl. doctype / xml prolog) — a '>'
    # inside a quoted attribute value (alt="5 > 4") must not end the
    # tag, so the body alternates unquoted chars with quoted spans
    x = F.regexp_replace(x, "(?s)<(?:[^>\"']|\"[^\"]*\"|'[^']*')*>", " ")
    # 5. entities — &amp; strictly last
    x = F.regexp_replace(x, "&nbsp;", " ")
    x = F.regexp_replace(x, "&lt;", "<")
    x = F.regexp_replace(x, "&gt;", ">")
    x = F.regexp_replace(x, "&quot;", '"')
    x = F.regexp_replace(x, "&(?:apos|#39|#[xX]0*27);", "'")
    x = _decode_named_entities(x)
    x = _decode_numeric_entities(x)
    x = F.regexp_replace(x, "&(?:amp|#38|#[xX]0*26);", "&")
    # 6. whitespace normalization
    x = F.regexp_replace(x, "[ \\t\\f]+", " ")
    x = F.regexp_replace(x, "(?m)^ | $", "")
    x = F.regexp_replace(x, "\\n{3,}", "\n\n")
    return F.btrim(x, F.lit(" \t\n\r\f"))


#: high-frequency typographic entities — after nbsp/lt/gt/quot/apos/amp
#: these dominate what real pages actually escape (smart quotes,
#: dashes, ellipsis); name -> codepoint
_TYPOGRAPHIC = {
    "ndash": 0x2013,
    "mdash": 0x2014,
    "lsquo": 0x2018,
    "rsquo": 0x2019,
    "ldquo": 0x201C,
    "rdquo": 0x201D,
    "hellip": 0x2026,
}


def _decode_named_entities(x: Column) -> Column:
    for name, code in _TYPOGRAPHIC.items():
        x = F.regexp_replace(x, f"&{name};", chr(code))
    return x


def _decode_numeric_entities(x: Column) -> Column:
    """Decode the ``&#NNN;`` / ``&#xHH;`` escapes that occur in real
    text: the quote/bracket family, nbsp, and the typographic set.
    Both decimal and hex numeric forms (case-insensitive, leading
    zeros tolerated) map to the same character.  A full printable
    decode would be a 95-branch replace chain for codepoints that
    essentially never appear escaped; residual escapes are noise for
    the quality gates to judge.  ``&#38;``/``&#x26;`` (ampersand) are
    deliberately NOT decoded here — they fold into the ``&amp;`` rule
    that runs last, so ``&amp;lt;`` still round-trips to the displayed
    ``&lt;``."""
    codes = [(34, '"'), (60, "<"), (62, ">"), (160, " ")] + [
        (c, chr(c)) for c in _TYPOGRAPHIC.values()
    ]
    for code, ch in codes:
        x = F.regexp_replace(x, f"&#0*{code};|&#[xX]0*(?i:{code:x});", ch)
    return x


def html_to_text(
    df: DataFrame,
    html_col: str,
    out_col: str = "text",
    min_length: int = 0,
) -> DataFrame:
    """Replace ``html_col`` with extracted plain text in ``out_col``
    (other columns pass through).  ``min_length`` drops rows whose
    extracted text is shorter — the "no visible text" gate."""
    out = df.withColumn(out_col, html_text_column(F.col(html_col)))
    if html_col != out_col:
        out = out.drop(html_col)
    if min_length > 0:
        out = out.filter(F.length(out_col) >= min_length)
    return out
