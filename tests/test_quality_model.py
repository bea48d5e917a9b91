"""Model-based quality filter: separability, determinism, totality,
persistence roundtrip, and a no-shuffle scoring plan."""

from __future__ import annotations

import random

import pytest

from lsd2_spark.operators.quality_model import (
    load_quality_model,
    save_quality_model,
    score_quality,
    train_quality_model,
)

_WORDS_GOOD = (
    "the history of science shows that careful observation and patient "
    "reasoning about evidence gradually build reliable knowledge of the "
    "natural world through experiment theory and revision"
).split()
_WORDS_SPAM = (
    "click here buy now free offer winner casino bonus cheap pills "
    "limited deal subscribe urgent prize claim lottery discount money"
).split()


def _docs(words, n, seed):
    rng = random.Random(seed)
    return [" ".join(rng.choices(words, k=30)) for _ in range(n)]


@pytest.fixture(scope="module")
def model(spark):
    pos = spark.createDataFrame(
        [(t,) for t in _docs(_WORDS_GOOD, 60, 1)], "text string"
    )
    neg = spark.createDataFrame(
        [(t,) for t in _docs(_WORDS_SPAM, 60, 2)], "text string"
    )
    return train_quality_model(pos, neg)


def test_separates_reference_from_spam(spark, model):
    rows = (
        [(i, t) for i, t in enumerate(_docs(_WORDS_GOOD, 10, 3))]
        + [(100 + i, t) for i, t in enumerate(_docs(_WORDS_SPAM, 10, 4))]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["quality_prob"] for r in score_quality(df, model).collect()}
    good = [got[i] for i in range(10)]
    spam = [got[100 + i] for i in range(10)]
    assert min(good) > 0.9
    assert max(spam) < 0.1


def test_scoring_is_total_and_deterministic(spark, model):
    df = spark.createDataFrame(
        [(1, "careful observation of the natural world"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    a = {r["doc_id"]: r["quality_prob"] for r in score_quality(df, model).collect()}
    b = {r["doc_id"]: r["quality_prob"] for r in score_quality(df, model).collect()}
    assert a == b
    assert set(a) == {1, 2, 3}
    assert a[2] is None          # NULL text -> NULL prob, row kept
    assert a[3] is not None      # empty text still scores


def test_model_persistence_roundtrip(spark, model, tmp_path):
    path = str(tmp_path / "qm")
    save_quality_model(model, path)
    loaded = load_quality_model(spark, path)
    df = spark.createDataFrame(
        [(1, "patient reasoning about experimental evidence")],
        "doc_id long, text string",
    )
    assert (
        score_quality(df, model).collect()
        == score_quality(df, loaded).collect()
    )


def test_scoring_plan_has_no_shuffle(spark, model):
    df = spark.createDataFrame(
        [(1, "some text to score")], "doc_id long, text string"
    )
    out = score_quality(df, model)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # scoring must be a pure projection chain: no join, no exchange
    assert "Join" not in plan
    assert "Exchange" not in plan
