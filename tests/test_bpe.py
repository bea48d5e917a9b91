"""BPE training/encoding: the classic Sennrich example, compression
monotonicity, determinism, and corpus-scale smoke."""

from __future__ import annotations

import pytest

from lsd2_spark.operators.bpe import bpe_encode, train_bpe, word_histogram


def test_bpe_learns_the_classic_merges(spark):
    # Sennrich et al. toy corpus: {low:5, lower:2, newest:6, widest:3}
    rows = []
    rows += [(i, "low") for i in range(5)]
    rows += [(100 + i, "lower") for i in range(2)]
    rows += [(200 + i, "newest") for i in range(6)]
    rows += [(300 + i, "widest") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    merges = train_bpe(df, "text", n_merges=12)
    # every pair inside the frequent words has freq >= 2, so after a
    # dozen merges each whole word collapses to a single symbol (the
    # exact merge ORDER depends only on the deterministic tie-break)
    enc = {r["doc_id"]: r["tokens"] for r in bpe_encode(df, "text", "doc_id", merges).collect()}
    assert enc[200] == ["newest</w>"]
    assert enc[0] == ["low</w>"]
    # an unseen word falls back to smaller learned units, never crashes
    unseen = spark.createDataFrame([(1, "lowest")], "doc_id long, text string")
    u = bpe_encode(unseen, "text", "doc_id", merges).collect()[0]["tokens"]
    assert 1 <= len(u) <= 7 and "".join(u).replace("</w>", "") == "lowest"

    # determinism
    assert train_bpe(df, "text", n_merges=12) == merges


def test_bpe_more_merges_compress_better(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    few = train_bpe(docs, "text", n_merges=20)
    many = train_bpe(docs, "text", n_merges=150)
    assert len(many) > len(few)

    import pyspark.sql.functions as F

    def total(merges):
        return (
            bpe_encode(docs, "text", "doc_id", merges)
            .agg(F.sum("n_bpe_tokens").alias("s"))
            .collect()[0]["s"]
        )

    t_few, t_many = total(few), total(many)
    assert t_many < t_few  # more merges, fewer tokens

    hist = word_histogram(docs, "text")
    assert hist.filter("word = ''").count() == 0
    assert hist.count() > 10


def test_bpe_encode_total_over_empty_and_null(spark):
    merges = [("a", "b")]
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    df = spark.createDataFrame(
        [(1, "ab ab"), (2, ""), (3, None)],
        StructType([StructField("doc_id", LongType()), StructField("text", StringType())]),
    )
    out = {r["doc_id"]: r for r in bpe_encode(df, "text", "doc_id", merges).collect()}
    assert out[1]["n_bpe_tokens"] == 4  # 'ab' + '</w>' twice
    assert out[1]["tokens"][0] == "ab"
    assert out[2]["n_bpe_tokens"] == 0 and out[3]["n_bpe_tokens"] == 0
