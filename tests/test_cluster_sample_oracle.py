"""DuckDB replay of cluster-balanced sampling (VERDICT r10 item 5),
mirroring q73's train+score pattern: the k-means trainer (deterministic
farthest-point seeding over the hash-ordered subsample + decimal-exact
Lloyd's iterations) runs ONCE in Spark, its trained centroids are
passed to DuckDB as a literal table, and the whole downstream half —
the rounded-L2 ties-to-smaller-list assignment and the
deterministic-uniform per-cluster quota window — is replayed in SQL and
compared row-exactly.  (The seed is a deterministic function of the
subsample, so training twice in Spark yields identical centroids; the
SQL half certifies everything that touches the corpus.)"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

_K = 8
_CAP = 20
_ITERS = 2
_DIM = 64


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def test_assignment_and_quota_replay_in_duckdb(spark, sf_dir, emb):
    from lsd2_spark.operators.sampling import (
        cluster_balanced_sample,
        deterministic_uniform_sql,
    )
    from lsd2_spark.operators.similarity import kmeans_centroids

    got = sorted(
        map(
            tuple,
            cluster_balanced_sample(
                emb, "vec_id", vec_col="embedding",
                n_clusters=_K, cap=_CAP, n_iters=_ITERS,
            )
            .select("vec_id", "cluster_id", "kept_rank")
            .collect(),
        )
    )

    # train the same centroids the operator trains (same params,
    # deterministic end-to-end) and hand them to DuckDB as literals
    cents = kmeans_centroids(
        emb, "embedding", "vec_id",
        n_lists=_K, n_iters=_ITERS, sample_stride=1, init_order="spread",
    )
    assert cents.shape == (_K, _DIM)
    cent_rows = ", ".join(
        f"({cid}, {j}, {w!r})"
        for cid in range(cents.shape[0])
        for j, w in enumerate(cents[cid])
    )
    u = deterministic_uniform_sql("vec_id")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    sql = f"""
    WITH comp_r AS (
      SELECT vec_id, CAST(i AS BIGINT) - 1 AS j,
             FLOOR((CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS x
      FROM embeddings, unnest(range(1, {_DIM + 1})) t(i)
    ), cent(cid, j, w) AS (VALUES {cent_rows}),
    dist AS (
      SELECT c.vec_id, p.cid, SUM((c.x - p.w) * (c.x - p.w)) AS d2
      FROM comp_r c JOIN cent p ON c.j = p.j
      GROUP BY c.vec_id, p.cid
    ), asn AS (
      SELECT vec_id, cid AS cluster_id FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY FLOOR((d2) * 1000000.0 + 0.5) / 1000000.0 ASC, cid ASC) AS r
        FROM dist) WHERE r = 1
    ), ranked AS (
      SELECT vec_id, cluster_id,
             ROW_NUMBER() OVER (PARTITION BY cluster_id
                                ORDER BY {u} ASC, vec_id ASC) AS kept_rank
      FROM asn
    )
    SELECT vec_id, CAST(cluster_id AS INTEGER) AS cluster_id,
           CAST(kept_rank AS INTEGER) AS kept_rank
    FROM ranked WHERE kept_rank <= {_CAP}
    """
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    con.close()
    assert got == want
    # the quota actually bit: every cluster is at or under cap, and at
    # least one cluster is exactly at it (500 rows / 8 clusters >> 20)
    per_cluster: dict[int, int] = {}
    for _, cid, _ in got:
        per_cluster[cid] = per_cluster.get(cid, 0) + 1
    assert max(per_cluster.values()) == _CAP
    assert len(per_cluster) == _K


def test_null_vectors_form_their_own_capped_stratum(spark, emb):
    from lsd2_spark.operators.sampling import cluster_balanced_sample

    with_nulls = emb.unionByName(
        emb.limit(30).select(
            (F.col("vec_id") + 10_000).alias("vec_id"),
            F.lit(None).cast("array<double>").alias("embedding"),
        )
    )
    kept = cluster_balanced_sample(
        with_nulls, "vec_id", vec_col="embedding",
        n_clusters=_K, cap=_CAP, n_iters=_ITERS,
    )
    nulls = kept.filter(F.col("cluster_id").isNull()).count()
    assert 0 < nulls <= _CAP
