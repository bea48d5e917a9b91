"""Product quantization: encode geometry, recall@k vs the exact scan
on clustered vectors, IVF-PQ composition, persistence, totality, and
plan-shape guards."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lsd2_spark.operators.pq import (
    ivf_pq_topk,
    load_pq_codebooks,
    pq_encode,
    pq_topk,
    save_pq_codebooks,
    train_pq,
)

DIM, M, CODES = 32, 8, 16
RNG = np.random.default_rng(11)


# 100 small clusters of 4: a query's true top-3 are its 3 cluster
# siblings, separated from everything else by the inter-cluster gap —
# the structure PQ is built to resolve (codes cannot rank points
# WITHIN a tight cluster, where all ADC distances collapse)
N_CLUSTERS, CLUSTER_SIZE = 100, 4


def _clustered(n=N_CLUSTERS * CLUSTER_SIZE):
    cents = RNG.normal(0, 5.0, (N_CLUSTERS, DIM))
    rows = []
    for i in range(n):
        c = i % N_CLUSTERS
        rows.append((i, (cents[c] + RNG.normal(0, 0.15, DIM)).tolist()))
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    rows = _clustered()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    df.cache().count()
    return rows, df


@pytest.fixture(scope="module")
def books(corpus):
    _, df = corpus
    return train_pq(df, "embedding", "vec_id", m=M, n_codes=CODES, n_iters=2)


def test_train_geometry_and_determinism(corpus, books):
    assert books.shape == (M, CODES, DIM // M)
    _, df = corpus
    again = train_pq(df, "embedding", "vec_id", m=M, n_codes=CODES, n_iters=2)
    assert np.array_equal(books, again)


def test_fused_training_matches_per_space_kmeans(corpus, books):
    """The fused one-kernel trainer must be bit-identical to running
    the deterministic kmeans_centroids independently on each sliced
    subspace (no zero-norm subvectors in this corpus)."""
    from lsd2_spark.operators.similarity import kmeans_centroids

    _, df = corpus
    sub = DIM // M
    for j in range(M):
        sliced = df.select(
            F.col("vec_id"),
            F.slice(F.col("embedding"), j * sub + 1, sub).alias("_sub"),
        )
        ref = kmeans_centroids(
            sliced, "_sub", "vec_id", n_lists=CODES, n_iters=2, dim=sub
        )
        assert np.array_equal(books[j], ref), f"subspace {j}"


def test_encode_codes_and_totality(spark, corpus, books):
    _, df = corpus
    bad = spark.createDataFrame(
        [(9000, None), (9001, [1.0] * 5)], "vec_id long, embedding array<double>"
    )
    enc = pq_encode(df.unionByName(bad), "embedding", "vec_id", books)
    rows = {r["vec_id"]: r["codes"] for r in enc.collect()}
    assert len(rows) == df.count() + 2
    assert rows[9000] is None and rows[9001] is None  # total, not dropped
    for i in range(5):
        assert len(rows[i]) == M
        assert all(0 <= c < CODES for c in rows[i])


def _exact_topk(rows, qid, k):
    vecs = {i: np.asarray(v) for i, v in rows}
    q = vecs[qid]
    d = sorted(
        (float(((q - v) ** 2).sum()), i) for i, v in vecs.items() if i != qid
    )
    return [i for _, i in d[:k]]


@pytest.mark.parametrize("path", ["flat", "ivf"])
def test_recall_at_10_vs_exact(spark, corpus, books, path):
    rows, df = corpus
    k = CLUSTER_SIZE - 1
    qids = [0, 7, 33, 150, 266, 381]
    queries = df.filter(F.col("vec_id").isin(qids))
    if path == "flat":
        enc = pq_encode(df, "embedding", "vec_id", books)
        got_df = pq_topk(enc, queries, "embedding", "vec_id", books, k=k)
    else:
        from lsd2_spark.operators.similarity import kmeans_centroids

        coarse = kmeans_centroids(df, "embedding", "vec_id", n_lists=8, n_iters=2)
        got_df = ivf_pq_topk(
            df, queries, "embedding", "vec_id", books, coarse, k=k, nprobe=6
        )
    got = {}
    for r in got_df.collect():
        got.setdefault(r["query_id"], []).append(r["cand_id"])
    recalls = []
    for q in qids:
        want = set(_exact_topk(rows, q, k))
        recalls.append(len(want & set(got[q])) / k)
    # the true top-3 are cluster siblings across the inter-cluster gap:
    # PQ reconstruction error (16 codes / 4-dim subspace) is far below
    # that gap, so sibling recall should be near-perfect
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_rank_one_is_a_same_cluster_neighbor(corpus, books, spark):
    """The nearest reported neighbor must share the query's planted
    cluster (cluster = id % N_CLUSTERS) — a basic sanity floor under
    ADC."""
    rows, df = corpus
    enc = pq_encode(df, "embedding", "vec_id", books)
    queries = df.filter(F.col("vec_id") == 42)
    top = (
        pq_topk(enc, queries, "embedding", "vec_id", books, k=5)
        .filter("rnk = 1")
        .collect()[0]
    )
    assert top["cand_id"] % N_CLUSTERS == 42 % N_CLUSTERS


def test_codebook_persistence_roundtrip(tmp_path, books):
    p = str(tmp_path / "books.parquet")
    save_pq_codebooks(books, p)
    loaded = load_pq_codebooks(p)
    assert np.array_equal(books, loaded)


def test_plan_shapes(spark, corpus, books):
    rows, df = corpus
    enc = pq_encode(df, "embedding", "vec_id", books)
    queries = df.filter(F.col("vec_id") < 3)
    out = pq_topk(enc, queries, "embedding", "vec_id", books, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # flat PQ: scan + kernel + one window exchange; never a join
    assert "CartesianProduct" not in plan and "Join" not in plan

    from lsd2_spark.operators.similarity import kmeans_centroids

    coarse = kmeans_centroids(df, "embedding", "vec_id", n_lists=8, n_iters=2)
    out2 = ivf_pq_topk(df, queries, "embedding", "vec_id", books, coarse, k=5)
    plan2 = out2._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan2
    assert "BroadcastNestedLoopJoin" not in plan2


def test_query_bound_enforced(spark, corpus, books):
    _, df = corpus
    enc = pq_encode(df, "embedding", "vec_id", books)
    big = spark.range(5000).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(1.0)] * DIM).alias("embedding"),
    )
    with pytest.raises(ValueError, match="bounded"):
        pq_topk(enc, big, "embedding", "vec_id", books, k=5)


def test_compression_ratio(corpus, books, spark, tmp_path):
    """The point of PQ: the code table must be far smaller on disk than
    the raw vectors."""
    import os

    _, df = corpus
    raw_p = str(tmp_path / "raw")
    enc_p = str(tmp_path / "enc")
    # coalesce(1): at 400 rows, per-file parquet footers would dwarf
    # the data and mask the ratio
    df.coalesce(1).write.parquet(raw_p)
    pq_encode(df, "embedding", "vec_id", books).coalesce(1).write.parquet(enc_p)

    def size(d):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    assert size(enc_p) < size(raw_p) / 4


def test_self_search_keeps_other_queries_as_candidates(spark, corpus, books):
    """Vectors 0 and 100 are cluster-0 siblings and BOTH queries; each
    must still appear in the other's top-k (only the self-pair is
    excluded, not every query id globally)."""
    _, df = corpus
    enc = pq_encode(df, "embedding", "vec_id", books)
    queries = df.filter(F.col("vec_id").isin([0, 100]))
    got = {}
    for r in pq_topk(enc, queries, "embedding", "vec_id", books, k=3).collect():
        got.setdefault(r["query_id"], set()).add(r["cand_id"])
    assert 100 in got[0]
    assert 0 in got[100]
    assert 0 not in got[0] and 100 not in got[100]  # self excluded


def test_string_ids_end_to_end(spark, corpus, books):
    """String document ids flow through encode, pq_topk, AND ivf_pq_topk
    — the output id schemas derive from the input's id type instead of
    the old hard-coded long (which crashed at Arrow conversion).  The
    neighbor sets must match the long-id run exactly."""
    from lsd2_spark.operators.similarity import kmeans_centroids

    rows, df = corpus
    sdf = df.select(
        F.concat(F.lit("doc-"), F.col("vec_id")).alias("vec_id"), "embedding"
    )
    queries = sdf.limit(6)
    enc = pq_encode(sdf, "embedding", "vec_id", books)
    assert dict(enc.dtypes)["vec_id"] == "string"
    out = pq_topk(enc, queries, "embedding", "vec_id", books, k=3).collect()
    assert out and all(isinstance(r["cand_id"], str) for r in out)

    # parity vs the long-id run on identical vectors
    enc_l = pq_encode(df, "embedding", "vec_id", books)
    out_l = pq_topk(enc_l, df.limit(6), "embedding", "vec_id", books, k=3).collect()
    got = {(r["query_id"], r["rnk"]): r["cand_id"] for r in out}
    want = {
        (f"doc-{r['query_id']}", r["rnk"]): f"doc-{r['cand_id']}" for r in out_l
    }
    assert got == want

    coarse = kmeans_centroids(df, "embedding", "vec_id", n_lists=8, n_iters=2)
    out2 = ivf_pq_topk(
        sdf, queries, "embedding", "vec_id", books, coarse, k=3, nprobe=6
    ).collect()
    assert out2 and all(isinstance(r["cand_id"], str) for r in out2)

    # empty query set keeps the derived schema too
    empty = pq_topk(
        enc, sdf.limit(0), "embedding", "vec_id", books, k=3
    )
    assert dict(empty.dtypes)["cand_id"] == "string"
    assert empty.count() == 0
