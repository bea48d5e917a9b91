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


# ---------------------------------------------------------------------------
# word-bigram LM with interpolated backoff
# ---------------------------------------------------------------------------


def test_word_lm_matches_python_reference(spark):
    """Exact formula agreement with an independent Python
    implementation on a toy corpus."""
    import math

    from lsd2_spark.operators.lm_score import train_word_lm, word_lm_score

    ref_rows = ["the cat sat", "the dog sat", "the cat ran"]
    corpus = spark.createDataFrame([(t,) for t in ref_rows], "text string")
    model = train_word_lm(corpus, "text", lam=0.7)

    # python reference
    import collections
    uni = collections.Counter()
    big = collections.Counter()
    for t in ref_rows:
        ws = ["<s>"] + t.split()
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    T, V = sum(uni.values()), len(uni)
    w1c = collections.Counter()
    for (a, b), c in big.items():
        w1c[a] += c

    def p(w1, w2):
        p_ml = big.get((w1, w2), 0) / w1c[w1] if w1c.get(w1) else 0.0
        p_u = (uni.get(w2, 0) + 1) / (T + V) if w2 in uni else 1.0 / (T + V)
        return 0.7 * p_ml + 0.3 * p_u

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the zebra sat"), (3, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in word_lm_score(docs, model, "text", "doc_id").collect()}

    for did, text in [(1, "the cat sat"), (2, "the zebra sat")]:
        ws = ["<s>"] + text.split()
        want = sum(math.log(p(a, b)) for a, b in zip(ws, ws[1:])) / (len(ws) - 1)
        # round6 on the Spark side
        import math as _m
        assert abs(got[did]["avg_logp"] - want) < 1e-5, (did, got[did], want)
        assert got[did]["n_bigrams"] == len(ws) - 1
    assert got[3]["n_bigrams"] == 0 and got[3]["avg_logp"] is None


def test_word_lm_empty_and_padded_docs(spark):
    """Empty / all-whitespace docs keep their row with n_bigrams = 0
    and NULL score (the documented total contract), and surrounding
    whitespace cannot mint phantom empty-token bigrams."""
    from lsd2_spark.operators.lm_score import train_word_lm, word_lm_score

    corpus = spark.createDataFrame([("the cat sat",)], "text string")
    model = train_word_lm(corpus, "text")
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, " \t\n "), (4, "  the cat  "), (5, "the cat")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in word_lm_score(docs, model, "text", "doc_id").collect()}
    for did in (1, 2, 3):
        assert out[did]["n_bigrams"] == 0 and out[did]["avg_logp"] is None, out[did]
    # padding is invisible: same bigrams, same score as the clean doc
    assert out[4]["n_bigrams"] == 2 and out[5]["n_bigrams"] == 2
    assert out[4]["avg_logp"] == out[5]["avg_logp"]


def test_word_lm_separates_reference_from_shuffled(spark):
    """In-domain word order scores above the same words shuffled —
    the signal the char model cannot see."""
    import random

    from lsd2_spark.operators.lm_score import train_word_lm, word_lm_score

    sents = [
        "the quick brown fox jumps over the lazy dog",
        "the lazy dog sleeps under the old tree",
        "a quick fox runs over the green hill",
        "the old tree stands on the green hill",
    ] * 5
    corpus = spark.createDataFrame([(t,) for t in sents], "text string")
    model = train_word_lm(corpus, "text")

    rng = random.Random(5)
    nat = "the quick fox runs over the lazy dog"
    shuf = nat.split()
    rng.shuffle(shuf)
    docs = spark.createDataFrame(
        [(1, nat), (2, " ".join(shuf))], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["avg_logp"]
        for r in word_lm_score(docs, model, "text", "doc_id").collect()
    }
    assert got[1] > got[2] + 0.5  # clear margin, not a coin flip


def test_word_lm_caps_bound_tables_and_back_off(spark):
    """max_vocab/max_bigrams truncate the broadcast tables
    deterministically; a truncated bigram scores through the unigram
    backoff (same path as an unseen bigram), never a crash or a zero."""
    from lsd2_spark.operators.lm_score import train_word_lm, word_lm_score

    corpus = spark.createDataFrame(
        [("the cat sat",), ("the cat ran",), ("the dog sat",)], "text string"
    )
    capped = train_word_lm(corpus, "text", max_vocab=2, max_bigrams=2)
    assert capped["bigram"].count() == 2
    assert capped["unigram"].count() == 2
    full = train_word_lm(corpus, "text", max_vocab=None, max_bigrams=None)
    assert capped["bounded_unigram"] and capped["bounded_bigram"]
    assert not full["bounded_unigram"] and not full["bounded_bigram"]
    # capping only ONE table still earns THAT table its broadcast hint
    half = train_word_lm(corpus, "text", max_vocab=None, max_bigrams=2)
    assert half["bounded_bigram"] and not half["bounded_unigram"]
    docs_h = spark.createDataFrame([(1, "the cat sat")], "doc_id long, text string")
    from lsd2_spark.operators.lm_score import word_lm_score as _wls

    plan = _wls(docs_h, half, "text", "doc_id")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan

    docs = spark.createDataFrame([(1, "the cat sat"), (2, "zz qq")], "doc_id long, text string")
    out_c = {r["doc_id"]: r for r in word_lm_score(docs, capped, "text", "doc_id").collect()}
    out_f = {r["doc_id"]: r for r in word_lm_score(docs, full, "text", "doc_id").collect()}
    # all scores finite; capped <= full (truncation only removes mass)
    for d in (1, 2):
        assert out_c[d]["avg_logp"] is not None
        assert out_c[d]["avg_logp"] <= out_f[d]["avg_logp"] + 1e-12
    # determinism: same caps -> identical tables
    again = train_word_lm(corpus, "text", max_vocab=2, max_bigrams=2)
    assert sorted(map(tuple, capped["bigram"].collect())) == sorted(
        map(tuple, again["bigram"].collect())
    )


# ---------------------------------------------------------------------------
# fused char+word scoring (the q73 single-aggregation path)
# ---------------------------------------------------------------------------


def test_lm_score_combined_equals_split_pipelines(spark, sf_dir):
    """lm_score_combined must return exactly what lm_score +
    word_lm_score + a doc_id join return — including NULL text, empty
    docs, and docs too short for one of the two gram kinds."""
    from lsd2_spark.operators.lm_score import (
        lm_score_combined,
        train_word_lm,
        word_lm_score,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
        .unionByName(
            spark.createDataFrame(
                [
                    (900001, None),       # NULL text
                    (900002, ""),         # empty
                    (900003, "a"),        # word-bigram only (no trigram)
                    (900004, "   "),      # whitespace only
                    (900005, "the cat sat on the mat"),
                ],
                "doc_id long, text string",
            )
        )
    )
    train = docs.filter("doc_id % 5 = 0")
    cm = train_char_lm(train, "text").cache()
    wm = train_word_lm(train, "text")

    split = (
        lm_score(docs, cm, "text", "doc_id")
        .join(
            word_lm_score(docs, wm, "text", "doc_id").select(
                "doc_id", "n_bigrams", F.col("avg_logp").alias("word_avg_logp")
            ),
            "doc_id",
        )
    )
    fused = lm_score_combined(docs, cm, wm, "text", "doc_id")
    assert fused.columns == split.columns

    srows = {r["doc_id"]: tuple(r) for r in split.collect()}
    frows = {r["doc_id"]: tuple(r) for r in fused.collect()}
    assert srows == frows
    # totality: every input row came back exactly once
    assert len(frows) == docs.count()
    # the adversarial rows really hit the asymmetric paths
    assert frows[900003][1] == 0 and frows[900003][3] > 0
    assert frows[900001][1] == 0 and frows[900001][3] == 0
