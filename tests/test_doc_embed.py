"""Deterministic hashed document embeddings and the text→vector
composition with the similarity stack (semantic dedup from raw text).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lsd2_spark.operators.doc_embed import doc_embeddings

ROWS = [
    (1, "spark catalyst optimizer pushes filters into the parquet scan"),
    (2, "spark catalyst optimizer pushes filters into the parquet scans"),
    (3, "the cat sat on the warm windowsill all afternoon long today"),
    (4, None),
    (5, ""),
]


def test_shape_normalization_and_totality(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = {r["doc_id"]: r["embedding"] for r in doc_embeddings(df, "text", "doc_id").collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[4] is None and got[5] is None
    for i in (1, 2, 3):
        v = np.asarray(got[i])
        assert v.shape == (64,)
        assert np.linalg.norm(v) == pytest.approx(1.0)


def test_deterministic_and_partitioning_invariant(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    a = {r["doc_id"]: r["embedding"] for r in doc_embeddings(df, "text", "doc_id").collect()}
    b = {
        r["doc_id"]: r["embedding"]
        for r in doc_embeddings(df.repartition(7), "text", "doc_id").collect()
    }
    for i in (1, 2, 3):
        assert a[i] == b[i]


def test_cosine_reflects_text_overlap(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = {r["doc_id"]: np.asarray(r["embedding"]) for r in
           doc_embeddings(df, "text", "doc_id").collect() if r["embedding"]}
    near = float(got[1] @ got[2])   # one token differs
    far = float(got[1] @ got[3])    # disjoint topics
    assert near > 0.8
    assert far < 0.5
    assert near > far + 0.3


def test_idf_downweights_ubiquitous_tokens(spark):
    # "common" appears in every doc; the distinguishing token only in one
    rows = [(i, f"common filler words plus token{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    no_idf = {r["doc_id"]: np.asarray(r["embedding"]) for r in
              doc_embeddings(df, "text", "doc_id").collect()}
    with_idf = {r["doc_id"]: np.asarray(r["embedding"]) for r in
                doc_embeddings(df, "text", "doc_id", idf=True).collect()}
    # under IDF, two docs sharing only ubiquitous tokens are LESS similar
    assert float(with_idf[0] @ with_idf[1]) < float(no_idf[0] @ no_idf[1])


def test_text_to_semantic_neardup_composition(spark):
    """The point of the operator: raw text → embeddings →
    embedding_neardup_pairs recovers planted near-duplicate documents,
    no external model anywhere."""
    from lsd2_spark.operators.similarity import embedding_neardup_pairs

    base = [
        (i, f"document number {i} about topic{i} with unique content "
            f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}")
        for i in range(30)
    ]
    # planted near-dups: copies of docs 0..4 with one token changed
    planted = [
        (100 + i,
         base[i][1].replace(f"zeta{i}", "omega"))
        for i in range(5)
    ]
    df = spark.createDataFrame(base + planted, "doc_id long, text string")
    emb = doc_embeddings(df, "text", "doc_id", dim=64)
    pairs = embedding_neardup_pairs(
        emb, "embedding", "vec_id" if "vec_id" in emb.columns else "doc_id",
        threshold=0.8,
    )
    got = {(r["id1"], r["id2"]) for r in pairs.collect()}
    for i in range(5):
        assert (i, 100 + i) in got, (i, sorted(got))
    # no cross-topic false pairs among the planted set
    for (a, b) in got:
        assert b - a == 100 or abs(a - b) < 100, (a, b)
