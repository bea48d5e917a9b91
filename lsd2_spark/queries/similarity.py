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
      SELECT query_id, cand_id, FLOOR((s) * 1000000.0 + 0.5) / 1000000.0 AS sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY FLOOR((s) * 1000000.0 + 0.5) / 1000000.0 DESC, cand_id ASC) AS INTEGER) AS rnk
      FROM sims
    )
    SELECT query_id, cand_id, sim, rnk FROM ranked WHERE rnk <= {KNN_K}
    """,
)


IVF_LISTS, IVF_PROBE, IVF_ITERS = 16, 4, 2


def q41_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0)
    return similarity.ivf_topk(
        emb, queries, "embedding", "vec_id",
        k=KNN_K, n_lists=IVF_LISTS, nprobe=IVF_PROBE, n_iters=IVF_ITERS,
    )


def _ivf_oracle_sql(n_lists: int, nprobe: int, n_iters: int) -> str:
    """Full-fidelity oracle for IVF: replays the deterministic k-means
    (operators.similarity.kmeans_centroids) by unrolling each Lloyd's
    iteration as a CTE pair (assign by FLOOR(L2²·1e6+0.5)/1e6 — deterministic half-up — with list-id
    tie-break, update via exact DECIMAL(28,6) means over 6dp-rounded
    components), then the final assignment, nprobe probing, cosine
    scoring, and ranking.  Clustering uses rounded components so the
    decimal casts snap to an unambiguous grid point in any engine
    (DuckDB's double→DECIMAL cast scales in floating point — observed
    to snap boundary values differently); scoring uses raw vectors."""
    iter_ctes = []
    prev = "cent0"
    for n in range(1, n_iters + 1):
        iter_ctes.append(f"""
    dist{n} AS (
      SELECT c.vec_id, p.cid, SUM((c.x - p.w) * (c.x - p.w)) AS d2
      FROM comp_r c JOIN {prev} p ON c.j = p.j
      GROUP BY c.vec_id, p.cid
    ), asn{n} AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY FLOOR((d2) * 1000000.0 + 0.5) / 1000000.0 ASC, cid ASC) AS r
        FROM dist{n}) WHERE r = 1
    ), cent{n} AS (
      SELECT p.cid, p.j, COALESCE(m.w, p.w) AS w
      FROM {prev} p LEFT JOIN (
        SELECT a.cid, c.j,
               CAST(SUM(CAST(c.x AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS w
        FROM asn{n} a JOIN comp_r c ON c.vec_id = a.vec_id
        GROUP BY a.cid, c.j) m ON m.cid = p.cid AND m.j = p.j
    )""")
        prev = f"cent{n}"
    return f"""
    WITH comp_r AS (
      SELECT vec_id, CAST(i AS BIGINT) - 1 AS j,
             FLOOR((CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS x
      FROM embeddings, unnest(range(1, {DIM + 1})) t(i)
    ), init_ids AS (
      SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid
      FROM embeddings QUALIFY cid < {n_lists}
    ), cent0 AS (
      SELECT i.cid, c.j, c.x AS w FROM init_ids i JOIN comp_r c ON c.vec_id = i.vec_id
    ),{','.join(iter_ctes)},
    fdist AS (
      SELECT c.vec_id, p.cid, SUM((c.x - p.w) * (c.x - p.w)) AS d2
      FROM comp_r c JOIN {prev} p ON c.j = p.j
      GROUP BY c.vec_id, p.cid
    ), cand_asn AS (
      SELECT vec_id AS cand_id, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY FLOOR((d2) * 1000000.0 + 0.5) / 1000000.0 ASC, cid ASC) AS r
        FROM fdist) WHERE r = 1
    ), probes AS (
      SELECT vec_id AS query_id, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY FLOOR((d2) * 1000000.0 + 0.5) / 1000000.0 ASC, cid ASC) AS r
        FROM fdist WHERE vec_id % {QUERY_STRIDE} = 0) WHERE r <= {nprobe}
    ), cand_pairs AS (
      SELECT p.query_id, a.cand_id
      FROM probes p JOIN cand_asn a ON a.cid = p.cid
      WHERE a.cand_id <> p.query_id
    ), pairs AS (
      SELECT cp.query_id, cp.cand_id, eq.embedding AS qv, ec.embedding AS cv
      FROM cand_pairs cp
      JOIN embeddings eq ON eq.vec_id = cp.query_id
      JOIN embeddings ec ON ec.vec_id = cp.cand_id
    ), sims AS (
      SELECT query_id, cand_id,
             SUM(CAST(qv[CAST(i AS INTEGER)] AS DOUBLE) * CAST(cv[CAST(i AS INTEGER)] AS DOUBLE)) /
             (SQRT(SUM(CAST(qv[CAST(i AS INTEGER)] AS DOUBLE) * CAST(qv[CAST(i AS INTEGER)] AS DOUBLE))) *
              SQRT(SUM(CAST(cv[CAST(i AS INTEGER)] AS DOUBLE) * CAST(cv[CAST(i AS INTEGER)] AS DOUBLE)))) AS s
      FROM pairs, UNNEST(range(1, {DIM + 1})) AS t(i)
      GROUP BY query_id, cand_id
    ), ranked AS (
      SELECT query_id, cand_id, FLOOR((s) * 1000000.0 + 0.5) / 1000000.0 AS sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY FLOOR((s) * 1000000.0 + 0.5) / 1000000.0 DESC, cand_id ASC) AS INTEGER) AS rnk
      FROM sims
    )
    SELECT query_id, cand_id, sim, rnk FROM ranked WHERE rnk <= {KNN_K}
    """


register(
    "q41_ivf_topk",
    q41_ivf_topk,
    oracle=_ivf_oracle_sql(n_lists=IVF_LISTS, nprobe=IVF_PROBE, n_iters=IVF_ITERS),
)


def q44_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0)
    return similarity.hyperplane_lsh_topk(
        emb, queries, "embedding", "vec_id", k=KNN_K, n_bits=4, n_tables=16
    )


def _lsh_oracle_sql(n_bits: int, n_tables: int) -> str:
    """Full-fidelity oracle for hyperplane LSH: the hyperplanes are a
    deterministic integer lattice (similarity._hyperplanes), so DuckDB
    re-derives them from the same formula and replays bucketing, the
    bucket join, cosine scoring, and ranking.  Normalizing the planes
    never changes the sign of a dot product, so the SQL uses the raw
    integer lattice while the Spark kernel uses normalized rows."""
    n_planes = n_tables * n_bits
    return f"""
    WITH planes AS (
      SELECT pp.p, jj.j,
             CAST((((pp.p // {n_bits}) * 131 + (pp.p % {n_bits}) * 37 + jj.j * 101
                    + ((pp.p % {n_bits}) * jj.j + (pp.p // {n_bits}) * jj.j) % 29) % 17) - 8
                  AS DOUBLE) AS w
      FROM (SELECT CAST(x AS BIGINT) AS p FROM unnest(range(0, {n_planes})) t(x)) pp,
           (SELECT CAST(x AS BIGINT) AS j FROM unnest(range(0, {DIM})) t(x)) jj
    ), comp AS (
      SELECT vec_id, CAST(i AS BIGINT) - 1 AS j,
             CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS x
      FROM embeddings, unnest(range(1, {DIM + 1})) t(i)
    ), dots AS (
      SELECT c.vec_id, p.p, SUM(c.x * p.w) AS d
      FROM comp c JOIN planes p ON c.j = p.j
      GROUP BY c.vec_id, p.p
    ), buckets AS (
      SELECT vec_id,
             CAST(SUM(CASE WHEN d > 0 THEN (1 << (p % {n_bits})) ELSE 0 END)
                  + (p // {n_bits}) * {1 << n_bits} AS INTEGER) AS bucket
      FROM dots GROUP BY vec_id, p // {n_bits}
    ), cand_pairs AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cand_id
      FROM (SELECT * FROM buckets WHERE vec_id % {QUERY_STRIDE} = 0) q
      JOIN buckets c ON q.bucket = c.bucket
      WHERE c.vec_id <> q.vec_id
    ), pairs AS (
      SELECT cp.query_id, cp.cand_id, eq.embedding AS qv, ec.embedding AS cv
      FROM cand_pairs cp
      JOIN embeddings eq ON eq.vec_id = cp.query_id
      JOIN embeddings ec ON ec.vec_id = cp.cand_id
    ), sims AS (
      SELECT query_id, cand_id,
             SUM(CAST(qv[CAST(i AS INTEGER)] AS DOUBLE) * CAST(cv[CAST(i AS INTEGER)] AS DOUBLE)) /
             (SQRT(SUM(CAST(qv[CAST(i AS INTEGER)] AS DOUBLE) * CAST(qv[CAST(i AS INTEGER)] AS DOUBLE))) *
              SQRT(SUM(CAST(cv[CAST(i AS INTEGER)] AS DOUBLE) * CAST(cv[CAST(i AS INTEGER)] AS DOUBLE)))) AS s
      FROM pairs, UNNEST(range(1, {DIM + 1})) AS t(i)
      GROUP BY query_id, cand_id
    ), ranked AS (
      SELECT query_id, cand_id, FLOOR((s) * 1000000.0 + 0.5) / 1000000.0 AS sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY FLOOR((s) * 1000000.0 + 0.5) / 1000000.0 DESC, cand_id ASC) AS INTEGER) AS rnk
      FROM sims
    )
    SELECT query_id, cand_id, sim, rnk FROM ranked WHERE rnk <= {KNN_K}
    """


register("q44_lsh_ann", q44_lsh_ann, oracle=_lsh_oracle_sql(n_bits=4, n_tables=16))


NEARDUP_THRESHOLD = 0.4


def q45_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_neardup_pairs(
        emb, "embedding", "vec_id", threshold=NEARDUP_THRESHOLD, n_bits=4, n_tables=16
    )


def _neardup_oracle_sql(n_bits: int, n_tables: int, threshold: float) -> str:
    """Replays the near-dup pipeline: same integer-lattice hyperplanes
    (see _lsh_oracle_sql), bucketed self-join with id1 < id2, distinct
    pairs, exact cosine at 6 dp, threshold filter."""
    n_planes = n_tables * n_bits
    return f"""
    WITH planes AS (
      SELECT pp.p, jj.j,
             CAST((((pp.p // {n_bits}) * 131 + (pp.p % {n_bits}) * 37 + jj.j * 101
                    + ((pp.p % {n_bits}) * jj.j + (pp.p // {n_bits}) * jj.j) % 29) % 17) - 8
                  AS DOUBLE) AS w
      FROM (SELECT CAST(x AS BIGINT) AS p FROM unnest(range(0, {n_planes})) t(x)) pp,
           (SELECT CAST(x AS BIGINT) AS j FROM unnest(range(0, {DIM})) t(x)) jj
    ), comp AS (
      SELECT vec_id, CAST(i AS BIGINT) - 1 AS j,
             CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS x
      FROM embeddings, unnest(range(1, {DIM + 1})) t(i)
    ), dots AS (
      SELECT c.vec_id, p.p, SUM(c.x * p.w) AS d
      FROM comp c JOIN planes p ON c.j = p.j
      GROUP BY c.vec_id, p.p
    ), buckets AS (
      SELECT vec_id,
             CAST(SUM(CASE WHEN d > 0 THEN (1 << (p % {n_bits})) ELSE 0 END)
                  + (p // {n_bits}) * {1 << n_bits} AS INTEGER) AS bucket
      FROM dots GROUP BY vec_id, p // {n_bits}
    ), cand_pairs AS (
      SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
      FROM buckets a JOIN buckets b ON a.bucket = b.bucket
      WHERE a.vec_id < b.vec_id
    ), pairs AS (
      SELECT cp.id1, cp.id2, ea.embedding AS qv, eb.embedding AS cv
      FROM cand_pairs cp
      JOIN embeddings ea ON ea.vec_id = cp.id1
      JOIN embeddings eb ON eb.vec_id = cp.id2
    ), sims AS (
      SELECT id1, id2,
             FLOOR((
               SUM(CAST(qv[CAST(i AS INTEGER)] AS DOUBLE) * CAST(cv[CAST(i AS INTEGER)] AS DOUBLE)) /
               (SQRT(SUM(CAST(qv[CAST(i AS INTEGER)] AS DOUBLE) * CAST(qv[CAST(i AS INTEGER)] AS DOUBLE))) *
                SQRT(SUM(CAST(cv[CAST(i AS INTEGER)] AS DOUBLE) * CAST(cv[CAST(i AS INTEGER)] AS DOUBLE))))
             ) * 1000000.0 + 0.5) / 1000000.0 AS sim
      FROM pairs, UNNEST(range(1, {DIM + 1})) AS t(i)
      GROUP BY id1, id2
    )
    SELECT id1, id2, sim FROM sims WHERE sim >= {threshold}
    """


register(
    "q45_embedding_neardup",
    q45_embedding_neardup,
    oracle=_neardup_oracle_sql(n_bits=4, n_tables=16, threshold=NEARDUP_THRESHOLD),
)
