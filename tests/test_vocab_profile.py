"""Token-frequency profile + vocab coverage, against hand-computed
counts and a plan-shape guard (TakeOrdered, not a global sort)."""

from __future__ import annotations

import collections

import pytest

from lsd2_spark.operators.text_analysis import (
    token_frequency_profile,
    vocab_coverage,
)

ROWS = [
    (1, "the cat sat on the mat"),
    (2, "the dog ate the cat food"),
    (3, "a cat and a dog and a bird"),
    (4, None),
]


def test_profile_matches_exact_counts(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = token_frequency_profile(df, "text", "doc_id", top_k=5).collect()

    counts = collections.Counter()
    docs = collections.defaultdict(set)
    for i, t in ROWS:
        for tok in (t or "").split():
            counts[tok] += 1
            docs[tok].add(i)
    total = sum(counts.values())
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]

    assert [(r["token"], r["n_occurrences"]) for r in got] == want
    cum = 0.0
    for r in got:
        assert r["share"] == pytest.approx(r["n_occurrences"] / total)
        cum += r["n_occurrences"] / total
        assert r["cum_share"] == pytest.approx(cum)
        # approx distinct on tiny cardinalities is exact
        assert r["n_docs_approx"] == len(docs[r["token"]])


def test_profile_uses_takeordered_not_global_sort(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    out = token_frequency_profile(df, "text", "doc_id", top_k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_vocab_coverage(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in vocab_coverage(df, "text", "doc_id", ["the", "cat", "dog"]).collect()
    }
    assert got[1]["n_tokens"] == 6 and got[1]["n_covered"] == 3
    assert got[1]["coverage"] == pytest.approx(0.5)
    assert got[3]["n_covered"] == 2  # cat + dog (of 8 tokens)
    assert got[4]["coverage"] is None and got[4]["n_tokens"] is None
    assert set(got) == {1, 2, 3, 4}

    with pytest.raises(ValueError):
        vocab_coverage(df, "text", "doc_id", [])
