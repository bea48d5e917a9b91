"""Char-trigram LM scoring: in-domain text must outscore gibberish and
shuffled-alphabet text; the model table is reusable and deterministic."""

from __future__ import annotations

import pyspark.sql.functions as F

from lsd2_spark.operators.lm_score import lm_score, train_char_lm


def test_lm_separates_reference_like_text_from_gibberish(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    train = docs.filter("doc_id % 2 = 0")
    model = train_char_lm(train, "text").cache()
    assert model.count() > 100

    held_out = docs.filter("doc_id % 2 = 1").limit(50).select("doc_id", "text")
    gibberish = spark.createDataFrame(
        [
            (900001, "xq zvq jkx wqzv kjxq zzvk qjx wvz kqx jzx qwv zkj"),
            (900002, "zzzz qqqq xxxx jjjj vvvv kkkk wwww qqqq zzzz xxxx"),
        ],
        "doc_id long, text string",
    )
    both = held_out.unionByName(gibberish)
    scores = {r["doc_id"]: r["avg_logp"] for r in lm_score(both, model, "text", "doc_id").collect()}

    real = [v for k, v in scores.items() if k < 900000]
    fake = [v for k, v in scores.items() if k >= 900000]
    assert min(real) > max(fake), (min(real), max(fake))

    # deterministic: retraining yields the same scores
    model2 = train_char_lm(train, "text")
    scores2 = {r["doc_id"]: r["avg_logp"] for r in lm_score(both, model2, "text", "doc_id").collect()}
    assert scores == scores2


def test_lm_score_total_over_short_docs(spark):
    model = train_char_lm(
        spark.createDataFrame([(1, "the cat sat on the mat")], "doc_id long, text string"),
        "text",
    )
    df = spark.createDataFrame([(1, "a"), (2, ""), (3, "the cat")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in lm_score(df, model, "text", "doc_id").collect()}
    # "a" padded to " a" -> one trigram short of n... doc 1 has " a" (len 2 < 3): no grams -> absent
    assert 3 in out and out[3]["n_grams"] > 0
    assert out[3]["avg_logp"] > -12.0
