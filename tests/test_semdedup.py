"""SemDeDup-style semantic dedup: greedy-invariant checks against a
collected brute force, determinism, invalid-vector totality, real
embeddings e2e, and plan shape."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lsd2_spark.operators.semdedup import semantic_dedup, semantic_dedup_with_index

from tests.conftest import SF_DIR

EPS = 0.95


def _cos(a, b):
    na, nb = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(x * x for x in b))
    return sum(x * y for x, y in zip(a, b)) / (na * nb)


@pytest.fixture(scope="module")
def planted(spark):
    """Two well-separated directions, each with planted near-dups
    (scaled copies and small-angle jitter) plus genuinely distinct
    members and invalid rows."""
    rng = np.random.default_rng(42)
    rows = []
    base_a = np.array([1.0, 0.0, 0.0, 0.0])
    base_b = np.array([0.0, 1.0, 0.0, 0.0])
    for i, base in ((0, base_a), (100, base_b)):
        rows.append((i, [float(x) for x in base]))
        rows.append((i + 1, [float(x) for x in base * 3.0]))  # cos = 1
        jit = base + rng.normal(0, 0.01, 4)  # cos ~ 0.9999
        rows.append((i + 2, [float(x) for x in jit]))
        # distinct within the same half-space: ~45 degrees away
        far = base + np.roll(base, 2)
        rows.append((i + 3, [float(x) for x in far]))
    rows.append((900, None))  # null vector
    rows.append((901, [1.0, 2.0]))  # ragged
    rows.append((902, [0.0, 0.0, 0.0, 0.0]))  # zero-norm
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_greedy_invariants(spark, planted):
    out = semantic_dedup(planted, "embedding", "vec_id", n_clusters=2, eps=EPS)
    rows = {r["vec_id"]: r for r in out.collect()}
    vecs = {r["vec_id"]: r["embedding"] for r in planted.collect()}
    assert set(rows) == set(vecs)  # total: one verdict per input row

    # Planted exact/jitter copies die; the 45-degree member survives.
    for i in (0, 100):
        assert rows[i]["keep"] == 1
        assert rows[i + 1]["keep"] == 0 and rows[i + 1]["dup_of"] == i
        assert rows[i + 2]["keep"] == 0 and rows[i + 2]["dup_of"] == i
        assert rows[i + 3]["keep"] == 1

    # Invariant 1: every dropped doc is >= eps-cosine to its dup_of,
    # which is itself kept and in the same cluster.
    for vid, r in rows.items():
        if r["keep"] == 0:
            d = r["dup_of"]
            assert rows[d]["keep"] == 1
            assert rows[d]["cluster_id"] == r["cluster_id"]
            assert _cos(vecs[vid], vecs[d]) >= EPS
            assert abs(r["max_sim"] - _cos(vecs[vid], vecs[d])) < 1e-9

    # Invariant 2: no two kept members of one cluster are eps-close.
    kept = [
        (vid, r["cluster_id"])
        for vid, r in rows.items()
        if r["keep"] == 1 and r["cluster_id"] is not None and vid < 900
    ]
    for vid, c in kept:
        for wid, c2 in kept:
            if vid < wid and c == c2:
                assert _cos(vecs[vid], vecs[wid]) < EPS

    # Invalid rows kept and flagged.
    assert rows[900]["keep"] == 1 and rows[900]["cluster_id"] is None
    assert rows[901]["keep"] == 1 and rows[901]["cluster_id"] is None
    assert rows[902]["keep"] == 1 and rows[902]["max_sim"] is None


def test_deterministic_and_centroid_reuse(spark, planted):
    out1, cents = semantic_dedup_with_index(
        planted, "embedding", "vec_id", n_clusters=2, eps=EPS
    )
    r1 = sorted(map(tuple, out1.collect()))
    r2 = sorted(
        map(
            tuple,
            semantic_dedup(
                planted, "embedding", "vec_id", n_clusters=2, eps=EPS
            ).collect(),
        )
    )
    r3 = sorted(
        map(
            tuple,
            semantic_dedup(
                planted,
                "embedding",
                "vec_id",
                n_clusters=2,
                eps=EPS,
                centroids=cents,
            ).collect(),
        )
    )
    assert r1 == r2 == r3


def test_string_ids(spark):
    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [2.0, 0.0]), ("c", [0.0, 1.0])],
        "doc string, embedding array<double>",
    )
    rows = {
        r["doc"]: r
        for r in semantic_dedup(df, "embedding", "doc", n_clusters=1).collect()
    }
    assert rows["a"]["keep"] == 1
    assert rows["b"]["keep"] == 0 and rows["b"]["dup_of"] == "a"
    assert rows["c"]["keep"] == 1


def test_project_dim_clustering(spark):
    """JL-projected clustering: planted scaled/jittered copies still
    die (verdicts are computed on true vectors; the projection only
    partitions the space), invariants hold, and the verdict quality
    matches the unprojected run on the real embeddings table."""
    import pyspark.sql.functions as SF

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", SF.col("embedding").cast("array<double>").alias("embedding")
    )
    copies = emb.limit(20).select(
        (SF.col("vec_id") + 1_000_000).alias("vec_id"),
        SF.transform("embedding", lambda x: x * 2.0).alias("embedding"),
    )
    df = emb.unionByName(copies)
    out = semantic_dedup(
        df, "embedding", "vec_id", n_clusters=8, eps=0.999, project_dim=8
    )
    dead = out.filter(
        (SF.col("vec_id") >= 1_000_000) & (SF.col("keep") == 0)
    ).count()
    assert dead == 20  # exact copies land in the same cluster even projected
    # kept members of one cluster are still verified in TRUE space
    vecs = {r["vec_id"]: r["embedding"] for r in df.collect()}
    rows = {r["vec_id"]: r for r in out.collect()}
    for vid, r in rows.items():
        if r["keep"] == 0:
            assert _cos(vecs[vid], vecs[r["dup_of"]]) >= 0.999
    with pytest.raises(ValueError):
        semantic_dedup(df, "embedding", "vec_id", n_clusters=8, project_dim=0)
    # an index built in one clustering space must not silently
    # NULL-cluster everything when reused in another
    _, native_cents = semantic_dedup_with_index(
        emb, "embedding", "vec_id", n_clusters=4
    )
    with pytest.raises(ValueError, match="project_dim"):
        semantic_dedup(
            emb, "embedding", "vec_id", n_clusters=4,
            centroids=native_cents, project_dim=8,
        )


def test_all_invalid_corpus_total(spark):
    """A batch whose every vector is null/ragged/zero-norm must keep
    and flag every row — not crash k-means — and must hand a
    caller-supplied index back untouched."""
    df = spark.createDataFrame(
        [(1, None), (2, [0.0, 0.0]), (3, [0.0])],
        "vec_id long, embedding array<double>",
    )
    out = semantic_dedup(df, "embedding", "vec_id", n_clusters=2)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert all(r["keep"] == 1 and r["cluster_id"] is None for r in rows.values())
    given = np.eye(2)
    _, back = semantic_dedup_with_index(
        df.filter("vec_id = 2"), "embedding", "vec_id",
        n_clusters=2, centroids=given,
    )
    assert back is given


def test_validation(spark, planted):
    with pytest.raises(ValueError):
        semantic_dedup(planted, "embedding", "vec_id", n_clusters=2, eps=0.0)
    with pytest.raises(ValueError):
        semantic_dedup(planted, "embedding", "vec_id", n_clusters=0)


def test_real_embeddings_e2e(spark):
    """Plant scaled copies into the real embeddings table: each copy
    must die against its source (or a transitive kept equivalent)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    n = emb.count()
    copies = emb.limit(20).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 2.0).alias("embedding"),
    )
    df = emb.unionByName(copies)
    out = semantic_dedup(df, "embedding", "vec_id", n_clusters=8, eps=0.999)
    assert out.count() == n + 20
    dead_copies = out.filter(
        (F.col("vec_id") >= 1_000_000) & (F.col("keep") == 0)
    ).count()
    assert dead_copies == 20
    # every original stays unless it is itself a near-dup of a smaller id
    kept_share = out.filter(
        (F.col("vec_id") < 1_000_000) & (F.col("keep") == 1)
    ).count()
    assert kept_share >= int(0.5 * n)


def test_plan_no_cartesian(spark, planted):
    plan = (
        semantic_dedup(planted, "embedding", "vec_id", n_clusters=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
