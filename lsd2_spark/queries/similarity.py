"""Similarity-search queries over the ``embeddings`` table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lsd2_spark.operators import similarity
from lsd2_spark.queries import load_table, register

KNN_K = 5
QUERY_STRIDE = 50  # vec_id % STRIDE == 0 → query set
DIM = 64


def q40_embedding_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0)
    return similarity.cosine_topk(emb, queries, "embedding", "vec_id", k=KNN_K)


register(
    "q40_embedding_knn",
    q40_embedding_knn,
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      WHERE vec_id % {QUERY_STRIDE} = 0
    ), pairs AS (
      SELECT q.query_id, e.vec_id AS cand_id, q.qv, e.embedding AS cv
      FROM q, embeddings e WHERE e.vec_id <> q.query_id
    ), sims AS (
      SELECT query_id, cand_id,
             SUM(CAST(qv[CAST(i AS INTEGER)] AS DOUBLE) * CAST(cv[CAST(i AS INTEGER)] AS DOUBLE)) /
             (SQRT(SUM(CAST(qv[CAST(i AS INTEGER)] AS DOUBLE) * CAST(qv[CAST(i AS INTEGER)] AS DOUBLE))) *
              SQRT(SUM(CAST(cv[CAST(i AS INTEGER)] AS DOUBLE) * CAST(cv[CAST(i AS INTEGER)] AS DOUBLE)))) AS s
      FROM pairs, UNNEST(range(1, {DIM + 1})) AS t(i)
      GROUP BY query_id, cand_id
    ), ranked AS (
      SELECT query_id, cand_id, ROUND(s, 6) AS sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY ROUND(s, 6) DESC, cand_id ASC) AS INTEGER) AS rnk
      FROM sims
    )
    SELECT query_id, cand_id, sim, rnk FROM ranked WHERE rnk <= {KNN_K}
    """,
)


def q41_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0)
    return similarity.ivf_topk(
        emb, queries, "embedding", "vec_id", k=KNN_K, n_lists=16, nprobe=4
    )


# approximate by design → rows-only driver check; recall vs exact is
# asserted in tests/test_llm_ops.py
register("q41_ivf_topk", q41_ivf_topk, oracle=None)


def q44_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0)
    return similarity.hyperplane_lsh_topk(
        emb, queries, "embedding", "vec_id", k=KNN_K, n_bits=4, n_tables=16
    )


register("q44_lsh_ann", q44_lsh_ann, oracle=None)
