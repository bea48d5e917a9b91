"""Differential test: html_to_text (regexp chain, JVM) vs an
independent Python reference extractor built on stdlib
``html.parser.HTMLParser``.

The two implementations share no code and no parsing strategy (state
machine vs regex chain), so agreement on the *visible token sequence*
over a few hundred generated pages is strong evidence neither drops
or invents text.  Whitespace policy legitimately differs (the regex
chain preserves block structure, the reference just concatenates
data), so the comparison is over whitespace-normalized token lists,
and entity handling is pinned by both sides using the same displayed
form.
"""

from __future__ import annotations

import random
from html.parser import HTMLParser

import pytest
from pyspark.sql import functions as F

from lsd2_spark.operators.html_text import html_to_text


class _RefExtractor(HTMLParser):
    """Reference visible-text extractor: stdlib parser, skipping
    script/style/noscript/template contents and comments."""

    _SKIP = {"script", "style", "noscript", "template"}

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in self._SKIP:
            self._skip_depth += 1

    def handle_endtag(self, tag):
        if tag in self._SKIP and self._skip_depth:
            self._skip_depth -= 1

    def handle_data(self, data):
        if not self._skip_depth:
            self.parts.append(data)


def _ref_tokens(html: str) -> list[str]:
    p = _RefExtractor()
    p.feed(html)
    p.close()
    return " ".join(p.parts).split()


# ---- constrained page generator: realistic structures, no pathological
# unparseable fragments (both sides define those differently) ----

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
).split()
# displayed forms the two sides agree on byte-for-byte
ENTITIES = ["&lt;", "&gt;", "&quot;", "&amp;", "&#34;", "&#60;", "&#62;"]
INLINE_TAGS = ["b", "i", "em", "strong", "span", "a", "code"]
BLOCK_TAGS = ["p", "div", "h1", "h2", "li", "blockquote", "section"]


def _gen_text(rng, n):
    toks = []
    for _ in range(n):
        if rng.random() < 0.1:
            toks.append(rng.choice(ENTITIES))
        else:
            toks.append(rng.choice(WORDS))
    return " ".join(toks)


def _gen_element(rng, depth):
    r = rng.random()
    if depth > 3 or r < 0.35:
        return _gen_text(rng, rng.randint(1, 8))
    if r < 0.45:
        return f"<!-- {_gen_text(rng, 3)} -->"
    if r < 0.55:
        skip = rng.choice(["script", "style"])
        return f"<{skip}>var x = '{_gen_text(rng, 4)}';</{skip}>"
    if r < 0.75:
        t = rng.choice(INLINE_TAGS)
        attr = ""
        if rng.random() < 0.5:
            # attribute values incl. the '>' trap
            attr = f' class="c{rng.randint(0, 9)}"'
            if rng.random() < 0.3:
                attr += f' title="a > b {rng.randint(0, 9)}"'
        inner = "".join(_gen_element(rng, depth + 1) for _ in range(rng.randint(1, 2)))
        return f"<{t}{attr}>{inner}</{t}>"
    t = rng.choice(BLOCK_TAGS)
    inner = "".join(_gen_element(rng, depth + 1) for _ in range(rng.randint(1, 3)))
    return f"<{t}>{inner}</{t}>"


def _gen_page(rng):
    body = "".join(_gen_element(rng, 0) for _ in range(rng.randint(2, 6)))
    return (
        "<!DOCTYPE html><html><head><title>"
        + _gen_text(rng, 3)
        + "</title></head><body>"
        + body
        + "</body></html>"
    )


def test_differential_vs_stdlib_parser(spark):
    rng = random.Random(20260815)
    pages = [(str(i), _gen_page(rng)) for i in range(300)]
    df = spark.createDataFrame(pages, "doc_id string, html string")
    got = {
        r["doc_id"]: r["text"].split()
        for r in html_to_text(df, "html").collect()
    }
    mismatches = []
    for doc_id, html in pages:
        want = _ref_tokens(html)
        if got[doc_id] != want:
            mismatches.append((doc_id, got[doc_id], want, html))
    assert not mismatches, mismatches[:2]
