"""Semantic deduplication over document embeddings (SemDeDup-style).

Document-level near-dup (MinHash/SimHash, dedup.py) catches *textual*
duplicates; paraphrases and template rewrites survive it.  SemDeDup
(Abbas et al., 2023, arXiv:2303.09540) removes *semantic* duplicates:
cluster the embedding space with k-means, then within each cluster
drop every document whose cosine similarity to an already-kept cluster
member exceeds ``eps``.

Spark-first shape, 100 TB lens:

1. Centroids come from :func:`lsd2_spark.operators.similarity.
   kmeans_centroids` (deterministic Lloyd's; each iteration moves only
   n_partitions x n_clusters partial rows).
2. Assignment is one shuffle-free Arrow pass
   (:func:`~lsd2_spark.operators.similarity.kmeans_assign`).
3. The quadratic part is confined *inside* each cluster: one shuffle
   on ``cluster_id``, then a grouped Arrow kernel runs the greedy scan
   per cluster.  Cluster population is ~n/n_clusters by construction —
   size ``n_clusters`` so clusters hold ~1-10k members (SemDeDup used
   50k clusters for LAION-440M) and the per-group cost stays bounded
   no matter the corpus size.  No all-pairs join ever materializes.

Determinism: members are scanned in ascending id order, so the kept
set is a pure function of the input — no RNG, no partition-order
dependence.  Invalid vectors (null / ragged / zero-norm) are KEPT and
flagged, never silently dropped: a dedup pass must be total over real
corpora.

Composition note: the grouped kernel puts Python exec nodes in the
output's lineage; when composing MANY further stages on top on Spark
4.1, cut the plan after this operator with
:func:`lsd2_spark.operators.common.cut_lineage` (see its docstring
for the AQE canonicalization NPE it avoids).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lsd2_spark.operators.similarity import (
    _probe_dim,
    _valid_vectors,
    kmeans_assign,
    kmeans_centroids,
)

__all__ = ["semantic_dedup", "semantic_dedup_with_index"]


def semantic_dedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_clusters: int,
    eps: float = 0.95,
    n_iters: int = 2,
    sample_stride: int = 1,
    centroids: np.ndarray | None = None,
    project_dim: int | None = None,
) -> DataFrame:
    """Per-document semantic-dedup verdicts.

    Returns ``(id_col, cluster_id, keep, dup_of, max_sim)`` — one row
    per input row:

    - ``keep = 1``: the document survives the dedup pass;
    - ``keep = 0``: a kept member of the same cluster is within
      ``eps`` cosine; ``dup_of`` names it (the most similar kept
      member) and ``max_sim`` carries the similarity;
    - invalid vectors (null, ragged, or zero-norm — anything that has
      no unit direction): ``keep = 1`` with NULL ``cluster_id`` —
      flagged, not dropped.  (``max_sim`` is NULL both for these and
      for each cluster's first kept member.)

    ``filter(keep = 1)`` joined back to the corpus is the deduplicated
    set.  Pass precomputed ``centroids`` (e.g. from a saved IVF index)
    to skip the k-means build on repeated runs.
    """
    return semantic_dedup_with_index(
        df,
        vec_col,
        id_col,
        n_clusters=n_clusters,
        eps=eps,
        n_iters=n_iters,
        sample_stride=sample_stride,
        centroids=centroids,
        project_dim=project_dim,
    )[0]


def semantic_dedup_with_index(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_clusters: int,
    eps: float = 0.95,
    n_iters: int = 2,
    sample_stride: int = 1,
    centroids: np.ndarray | None = None,
    project_dim: int | None = None,
) -> tuple[DataFrame, np.ndarray]:
    """:func:`semantic_dedup` plus the centroid matrix it used, so a
    caller can persist it (``save_ivf_index``) and feed later batches
    through the same partition of embedding space.

    ``project_dim``: cluster in a Johnson-Lindenstrauss projection of
    that dimension instead of the native space.  Clustering is only a
    partition heuristic here — the eps-cosine verdicts are ALWAYS
    computed on the true unit vectors — so projecting trades a small
    probability of splitting a near-dup pair across a cluster boundary
    (the same risk any space partition takes) for an
    ``native_dim/project_dim``-fold cut in the O(n x n_clusters x dim)
    assignment flops, the dominant cost when clusters scale with the
    corpus.  The returned centroids live in the projected space; reuse
    them only with the same ``project_dim``."""
    if not 0.0 < eps <= 1.0:
        raise ValueError(f"eps must be in (0, 1], got {eps}")
    if n_clusters < 1:
        raise ValueError(f"n_clusters must be >= 1, got {n_clusters}")
    if project_dim is not None and project_dim < 1:
        # validated up front: input validation must not depend on
        # whether the batch happens to contain a valid vector
        raise ValueError(f"project_dim must be >= 1, got {project_dim}")
    id_type = df.schema[id_col].dataType.simpleString()

    # SemDeDup clusters DIRECTIONS, not magnitudes: k-means on raw
    # vectors separates by norm and can strand a scaled duplicate in a
    # different cluster from its source.  Normalize to unit length
    # first (zero-norm vectors become NULL and ride the invalid path).
    dv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(dv, F.lit(0.0), lambda a, x: a + x * x))
    base = df.select(
        id_col,
        F.when(norm > 0.0, F.transform(dv, lambda x: x / norm)).alias("_unit"),
    )
    vec_col = "_unit"
    # probe the NORMALIZED column: a corpus whose every vector is
    # null/ragged/zero-norm must take the everything-kept path, not
    # feed an empty sample to k-means
    dim = _probe_dim(base, vec_col)
    if dim is None:
        # No valid vector anywhere: everything is kept-and-flagged.
        # A caller-supplied index passes through untouched.
        out = base.select(
            F.col(id_col),
            F.lit(None).cast("int").alias("cluster_id"),
            F.lit(1).alias("keep"),
            F.lit(None).cast(id_type).alias("dup_of"),
            F.lit(None).cast("double").alias("max_sim"),
        )
        if centroids is None:
            centroids = np.zeros((0, 0), dtype=np.float64)
        return out, centroids

    # optional JL projection for the clustering side only — the greedy
    # eps verdicts below always use the true unit vectors
    cluster_col, cluster_dim = vec_col, dim
    if project_dim is not None and project_dim < dim:
        from lsd2_spark.operators.similarity import random_project

        base = random_project(
            base, vec_col, int(project_dim), out_col="_proj", dim=dim
        )
        cluster_col, cluster_dim = "_proj", int(project_dim)

    if centroids is not None and centroids.shape[1] != cluster_dim:
        # a silently mismatched index would NULL-cluster every row and
        # turn the whole pass into a keep-everything no-op
        raise ValueError(
            f"supplied centroids have dim {centroids.shape[1]} but the "
            f"clustering space has dim {cluster_dim} — was the index built "
            f"with a different project_dim?"
        )
    if centroids is None:
        valid = _valid_vectors(base, cluster_col, cluster_dim)
        centroids = kmeans_centroids(
            valid,
            cluster_col,
            id_col,
            n_lists=n_clusters,
            n_iters=n_iters,
            sample_stride=sample_stride,
            dim=cluster_dim,
        )
    assigned = base.join(
        kmeans_assign(base, cluster_col, id_col, centroids), on=id_col, how="left"
    )
    if cluster_col != vec_col:
        assigned = assigned.drop(cluster_col)
    invalid = assigned.filter(F.col("cluster_id").isNull()).select(
        F.col(id_col),
        F.col("cluster_id"),
        F.lit(1).alias("keep"),
        F.lit(None).cast(id_type).alias("dup_of"),
        F.lit(None).cast("double").alias("max_sim"),
    )

    out_schema = (
        f"{id_col} {id_type}, cluster_id int, keep int, "
        f"dup_of {id_type}, max_sim double"
    )
    eps_f = float(eps)
    dim_i = int(dim)

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        # rows reaching the kernel are already unit vectors (zero-norm
        # never survives the normalization projection)
        unit = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
        ).reshape(n, dim_i)

        keep = np.ones(n, dtype=np.int32)
        dup_of = np.full(n, None, dtype=object)
        max_sim = np.full(n, np.nan)
        kept_rows: list[int] = []
        for i in range(n):
            if kept_rows:
                sims = unit[kept_rows] @ unit[i]
                j = int(np.argmax(sims))
                max_sim[i] = float(sims[j])
                if sims[j] >= eps_f:
                    keep[i] = 0
                    dup_of[i] = pdf[id_col].iloc[kept_rows[j]]
                    continue
            kept_rows.append(i)
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "cluster_id": pdf["cluster_id"].astype("int32"),
                "keep": keep,
                "dup_of": dup_of,
                "max_sim": [None if np.isnan(s) else s for s in max_sim],
            }
        )

    verdicts = (
        assigned.filter(F.col("cluster_id").isNotNull())
        .groupBy("cluster_id")
        .applyInPandas(_greedy, out_schema)
    )
    return verdicts.unionByName(invalid), centroids
