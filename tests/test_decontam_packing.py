"""Unit tests for benchmark decontamination and sequence packing —
hand-built corpora with known answers, plus plan-shape asserts (the
eval side of decontamination must broadcast; packing must not sort
globally)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_exact_ngram_overlap(spark):
    from lsd2_spark.operators.decontam import decontaminate

    eval_df = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    train = _docs(
        spark,
        [
            # contains "the quick brown fox jumps" (and one more shifted 5-gram)
            (1, "see the quick brown fox jumps over a fence"),
            # same words, different order: no shared 5-gram
            (2, "fox brown quick the jumps dog lazy the over"),
            # too short for any 5-gram
            (3, "tiny doc"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in decontaminate(train, eval_df, "text", "doc_id", n=5).collect()
    }
    assert out[1]["contaminated"] and out[1]["n_eval_ngram_hits"] == 2
    assert not out[2]["contaminated"] and out[2]["n_eval_ngram_hits"] == 0
    assert not out[3]["contaminated"]
    assert out[1]["worst_ngram"] == "the quick brown fox jumps"


def test_decontaminate_is_case_insensitive_and_counts_distinct(spark):
    from lsd2_spark.operators.decontam import decontaminate

    eval_df = _docs(spark, [(9, "A B C D E")])
    # the eval 5-gram appears twice in the train doc — counted once
    train = _docs(spark, [(1, "a b c d e and a b c d e")])
    row = decontaminate(train, eval_df, "text", "doc_id", n=5).collect()[0]
    assert row["n_eval_ngram_hits"] == 1


def test_decontaminate_broadcasts_the_eval_side(spark):
    from lsd2_spark.operators.decontam import decontaminate

    eval_df = _docs(spark, [(9, "a b c d e")])
    train = _docs(spark, [(1, "a b c d e f")])
    plan = decontaminate(train, eval_df, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_pack_sequences_manifest(spark):
    from lsd2_spark.operators.packing import pack_sequences

    rows = [
        # shard s: 3 + 4 + 5 tokens, seq_len 8 -> docs 1,2 start in seq 0
        # (offsets 0 and 3), doc 3 starts at offset 7 -> still seq 0
        ("s", 1, "a b c"),
        ("s", 2, "a b c d"),
        ("s", 3, "a b c d e"),
        # shard t: 10 tokens then 2: doc 5 starts at offset 10 -> seq 1
        ("t", 4, "a b c d e f g h i j"),
        ("t", 5, "a b"),
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    out = {
        (r["source"], r["seq_id"]): r
        for r in pack_sequences(
            df, "doc_id", F.size(F.split(F.col("text"), r"\s+")), 8, "source"
        ).collect()
    }
    assert out[("s", 0)]["n_docs"] == 3
    assert out[("s", 0)]["n_tokens"] == 12
    assert out[("s", 0)]["fill_frac"] == pytest.approx(1.5)
    assert out[("s", 0)]["first_doc"] == 1 and out[("s", 0)]["last_doc"] == 3
    assert out[("t", 0)]["n_docs"] == 1 and out[("t", 0)]["n_tokens"] == 10
    assert out[("t", 1)]["n_docs"] == 1 and out[("t", 1)]["first_doc"] == 5
    assert len(out) == 3


def test_pack_sequences_has_no_global_sort(spark):
    """Packing orders WITHIN shards (window partitionBy) — a global
    Sort with no partitioning would serialize the corpus on one
    partition at 100 TB."""
    from lsd2_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [("s", 1, "a b"), ("t", 2, "c d")], "source string, doc_id long, text string"
    )
    out = pack_sequences(
        df, "doc_id", F.size(F.split(F.col("text"), r"\s+")), 8, "source"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the only Sort allowed is the window's per-partition (local) sort
    for line in plan.splitlines():
        if "Sort " in line and "global=true" in line:
            raise AssertionError(f"global sort in packing plan: {line}")


def test_doc_profile_matches_standalone_operators(spark):
    from lsd2_spark.operators.text_analysis import doc_profile, lang_id, quality_score

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and the dog is here now then"),
            (2, "el la de que es el la de que es"),
            (3, "x"),
        ],
        "doc_id long, text string",
    )
    prof = {r["doc_id"]: r for r in doc_profile(df, "text", "doc_id").collect()}
    q = {r["doc_id"]: r for r in quality_score(df, "text", "doc_id").collect()}
    l = {r["doc_id"]: r for r in lang_id(df, "text", "doc_id").collect()}
    for i in (1, 2, 3):
        assert prof[i]["quality"] == q[i]["quality"]
        assert prof[i]["bucket"] == q[i]["bucket"]
        assert prof[i]["lang_pred"] == l[i]["lang_pred"]
    assert prof[2]["lang_pred"] == "es"


def test_stratified_keep_flag_agrees_with_filter(spark):
    from lsd2_spark.operators.sampling import stratified_keep, stratified_sample

    df = spark.createDataFrame(
        [(i, "src0" if i % 2 else "src1") for i in range(200)],
        "doc_id long, source string",
    )
    fr = {"src0": 0.5, "src1": 0.25}
    kept = {
        r["doc_id"]
        for r in stratified_sample(df, "doc_id", fr, strata_col="source").collect()
    }
    flagged = {
        r["doc_id"]
        for r in df.select(
            "doc_id", stratified_keep("doc_id", fr, strata_col="source").alias("k")
        ).collect()
        if r["k"]
    }
    assert kept == flagged and 0 < len(kept) < 200


def test_decontaminate_hashed_and_shuffle_modes_agree(spark, sf_dir):
    """The hashed-join and let-catalyst-choose variants must flag the
    same documents as the exact broadcast-string form (hash collisions
    at 2^-60 are unobservable here)."""
    from lsd2_spark.operators.decontam import decontaminate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 20 == 0)
    tr = docs.filter(F.col("doc_id") % 20 != 0)

    def flags(**kw):
        return {
            r["doc_id"]: r["n_eval_ngram_hits"]
            for r in decontaminate(tr, ev, "text", "doc_id", **kw).collect()
        }

    exact = flags()
    hashed = flags(hashed=True)
    shuffled = flags(hashed=True, force_broadcast=False)
    assert exact == hashed == shuffled
    assert any(v > 0 for v in exact.values())


def test_decontaminate_hashed_has_null_worst_ngram(spark):
    from lsd2_spark.operators.decontam import decontaminate

    ev = _docs(spark, [(9, "a b c d e")])
    tr = _docs(spark, [(1, "x a b c d e y")])
    row = decontaminate(tr, ev, "text", "doc_id", hashed=True).collect()[0]
    assert row["contaminated"] and row["worst_ngram"] is None


def test_split_passages_disjoint_and_overlapping(spark):
    from lsd2_spark.operators.packing import split_passages

    text = " ".join(f"w{i}" for i in range(10))
    df = _docs(spark, [(1, text), (2, "solo")])

    # disjoint windows of 4: [w0..w3] [w4..w7] [w8..w9]
    got = sorted(
        (r["doc_id"], r["passage_idx"], r["tok_start"], r["tok_end"], r["passage"])
        for r in split_passages(df, "text", "doc_id", max_tokens=4).collect()
    )
    assert got == [
        (1, 0, 1, 4, "w0 w1 w2 w3"),
        (1, 1, 5, 8, "w4 w5 w6 w7"),
        (1, 2, 9, 10, "w8 w9"),
        (2, 0, 1, 1, "solo"),
    ]

    # stride 2 < max_tokens 4: overlapping windows
    over = [
        r["passage"]
        for r in split_passages(
            df.filter("doc_id = 1"), "text", "doc_id", max_tokens=4, stride=2
        ).collect()
    ]
    assert over[0] == "w0 w1 w2 w3" and over[1] == "w2 w3 w4 w5"
    assert len(over) == 5

    with pytest.raises(ValueError):
        split_passages(df, "text", "doc_id", max_tokens=0)


def test_write_packed_corpus_roundtrip(spark, tmp_path, sf_dir):
    from lsd2_spark.operators.packing import pack_sequences, write_packed_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        "source in ('src1', 'src2')"
    )
    out = str(tmp_path / "packed")
    write_packed_corpus(docs, out, "doc_id", "text", 512, "source")
    back = spark.read.parquet(out)

    # manifest agreement: same (shard, seq) grain and token accounting
    manifest = pack_sequences(
        docs, "doc_id", F.size(F.split(F.col("text"), r"\s+")), 512, "source"
    ).toPandas().set_index(["source", "seq_id"]).sort_index()
    got = back.toPandas().set_index(["source", "seq_id"]).sort_index()
    assert got.index.tolist() == manifest.index.tolist()
    assert got["n_tokens"].tolist() == manifest["n_tokens"].tolist()

    # each written example is exactly the id-ordered doc concatenation
    pdf = docs.toPandas().sort_values("doc_id")
    for (src, _seq), row in got.iterrows():
        sub = pdf[pdf["source"] == src]
        # rebuild this sequence's membership from the prefix sums
        ntok = sub["text"].str.split().str.len().to_numpy()
        seqs = (ntok.cumsum() - ntok) // 512
        members = sub[seqs == _seq]
        assert row["text"] == "\n\n".join(members["text"].tolist())
        assert row["n_docs"] == len(members)


def test_decontaminate_bloom_agrees_with_exact(spark, sf_dir):
    """Bloom-prefiltered decontamination must flag exactly the same
    documents with the same hit counts (no false negatives by
    construction; the confirm join kills false positives), and the
    prefilter must actually screen most of the stream."""
    from lsd2_spark.operators.decontam import (
        build_ngram_bloom, decontaminate, decontaminate_bloom, word_ngrams,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 20 == 0)
    tr = docs.filter(F.col("doc_id") % 20 != 0)

    exact = {
        r["doc_id"]: r["n_eval_ngram_hits"]
        for r in decontaminate(tr, ev, "text", "doc_id").collect()
    }
    bloomed = {
        r["doc_id"]: r["n_eval_ngram_hits"]
        for r in decontaminate_bloom(tr, ev, "text", "doc_id").collect()
    }
    assert exact == bloomed
    assert any(v > 0 for v in exact.values())

    # the reusable-filter form gives the same answer
    bloom = build_ngram_bloom(ev, "text")
    again = {
        r["doc_id"]: r["n_eval_ngram_hits"]
        for r in decontaminate_bloom(tr, ev, "text", "doc_id", bloom=bloom).collect()
    }
    assert again == exact

    # selectivity: far fewer bloom-positive rows than exploded n-grams
    from lsd2_spark.functions.portable_hash import hash64
    total = tr.select(F.explode(word_ngrams(F.col("text"), 5))).count()
    n_eval = ev.select(F.explode(word_ngrams(F.col("text"), 5)).alias("g")).distinct().count()
    # with 8M bits and ~n_eval elements the fpr is tiny; positives ~= true hits
    true_hits = sum(exact.values())
    assert true_hits < total * 0.2  # the prefilter screens >80% here
