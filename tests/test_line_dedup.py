"""CCNet-style corpus-level line dedup: brute-force Python oracle,
real-corpus boilerplate planting, and plan shape."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from lsd2_spark.operators.line_dedup import (
    frequent_lines,
    line_doc_counts,
    remove_frequent_lines,
)

from tests.conftest import SF_DIR

TRIM = " \t\r\f"  # portable WS minus the newline split consumed


def _key(line: str) -> str:
    return line.strip(TRIM).lower()


def _oracle(docs: dict, min_docs: int, sep: str = "\n") -> dict:
    """Reference implementation over a {doc_id: text} dict."""
    per_key_docs: dict = collections.defaultdict(set)
    for d, text in docs.items():
        for line in (text or "").split(sep):
            k = _key(line)
            if k:
                per_key_docs[k].add(d)
    freq = {k for k, ds in per_key_docs.items() if len(ds) >= min_docs}
    out = {}
    for d, text in docs.items():
        orig = text or ""
        lines = orig.split(sep)
        kept = [ln for ln in lines if _key(ln) == "" or _key(ln) not in freq]
        clean = sep.join(kept)
        nonblank = [ln for ln in lines if _key(ln) != ""]
        out[d] = {
            "clean": clean,
            "n_lines": len(nonblank),
            "n_removed": sum(1 for ln in nonblank if _key(ln) in freq),
            "n_chars_removed": len(orig) - len(clean),
        }
    return out


CORPUS = {
    1: "Cookie notice\nUnique opening line\nShared footer text\n",
    2: "cookie notice  \nAnother body sentence\nShared footer text",
    3: "\tCOOKIE NOTICE\nThird doc body\n\nShared footer text\n",
    4: "Completely unrelated\nNo boilerplate here",
    5: "Cookie notice",  # all-boilerplate doc -> empty clean text
    6: "",  # empty doc
    7: None,  # null doc
    8: "Shared footer text\nShared footer text\nmiddle",  # dup line in one doc
}


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(
        [(k, v) for k, v in CORPUS.items()], "doc_id long, text string"
    )


def test_doc_counts_distinct_per_doc(spark, corpus_df):
    """A line repeated inside ONE doc counts once (doc 8's double
    footer), and normalization pools case/whitespace variants."""
    counts = {
        r["line_key"]: r["n_docs"]
        for r in line_doc_counts(corpus_df, "text", "doc_id").collect()
    }
    assert counts["cookie notice"] == 4  # docs 1,2,3,5
    assert counts["shared footer text"] == 4  # docs 1,2,3,8 (8 counted once)
    assert counts["unique opening line"] == 1
    assert "" not in counts


def test_remove_matches_oracle(spark, corpus_df):
    for min_docs in (2, 3, 4, 5):
        want = _oracle(CORPUS, min_docs)
        got = {
            r["doc_id"]: r
            for r in remove_frequent_lines(
                corpus_df, "text", "doc_id", min_docs
            ).collect()
        }
        assert set(got) == set(want)
        for d, w in want.items():
            g = got[d]
            assert g["clean_text"] == w["clean"], (min_docs, d)
            assert g["n_lines"] == w["n_lines"], (min_docs, d)
            assert g["n_lines_removed"] == w["n_removed"], (min_docs, d)
            assert g["n_chars_removed"] == w["n_chars_removed"], (min_docs, d)


def test_order_and_blank_structure_preserved(spark):
    """Kept lines come back in original order with blank lines intact,
    whatever the shuffle plan did."""
    text = "keep A\nboiler\n\nkeep B\nboiler\nkeep C"
    df = spark.createDataFrame(
        [(1, text), (2, "boiler"), (3, "boiler")], "doc_id long, text string"
    )
    row = (
        remove_frequent_lines(df, "text", "doc_id", 2)
        .filter("doc_id = 1")
        .collect()[0]
    )
    assert row["clean_text"] == "keep A\n\nkeep B\nkeep C"


def test_paragraph_mode(spark):
    df = spark.createDataFrame(
        [(1, "common para\n\nunique one"), (2, "common para\n\nother")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["clean_text"]
        for r in remove_frequent_lines(df, "text", "doc_id", 2, sep="\n\n").collect()
    }
    assert out == {1: "unique one", 2: "other"}


def test_min_docs_validated(spark, corpus_df):
    with pytest.raises(ValueError):
        frequent_lines(corpus_df, "text", "doc_id", 1)


def test_real_corpus_planted_footer(spark):
    """Plant a footer on half the real documents table; the pass must
    strip exactly it and leave original text intact."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    footer = "SUBSCRIBE TO OUR NEWSLETTER"
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.col("text"), F.lit("\n" + footer)),
        ).otherwise(F.col("text")),
    )
    out = remove_frequent_lines(planted, "text", "doc_id", 5)
    assert out.count() == docs.count()
    bad = out.filter(F.col("clean_text").contains(footer)).count()
    assert bad == 0
    # docs that never had the footer and share no other frequent line
    # with >=5 docs should be byte-identical
    joined = out.alias("o").join(
        docs.select("doc_id", F.col("text").alias("orig")).alias("d"), "doc_id"
    )
    untouched = joined.filter(
        (F.col("doc_id") % 2 == 1) & (F.col("clean_text") == F.col("orig"))
    ).count()
    total_odd = docs.filter(F.col("doc_id") % 2 == 1).count()
    # Real corpus may legitimately share lines; require the vast majority
    # untouched and spot-check one equality.
    assert untouched >= int(0.9 * total_odd)


def test_plan_no_cartesian(spark, corpus_df):
    plan = remove_frequent_lines(
        corpus_df, "text", "doc_id", 2
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_counts_plan_is_two_phase_distinct_aggregate(spark, corpus_df):
    """Pin the scale-right shape: map-side (key, doc) dedup before the
    first exchange (the deduped-pair exchange), plus the plan-sized
    per-key partial-count exchange — exactly two, no raw-row shuffle
    of undeduped lines."""
    import re

    plan = line_doc_counts(
        corpus_df, "text", "doc_id"
    )._jdf.queryExecution().executedPlan().toString()
    keys = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert len(keys) == 2, keys
    assert any("_doc" in k for k in keys)  # deduped-pair exchange
    assert any("_doc" not in k for k in keys)  # partial-count exchange
    # map-side partial dedup precedes the pair exchange
    pair_ex = plan.index("_doc", plan.index("Exchange"))
    assert "HashAggregate" in plan[pair_ex:], plan
