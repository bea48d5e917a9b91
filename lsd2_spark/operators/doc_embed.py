"""Deterministic document embeddings via feature hashing.

The similarity stack (cosine top-k, LSH ANN, IVF/PQ, embedding
near-dup) consumes an ``array<double>`` column; real pipelines fill it
with neural embeddings, but a large class of jobs — semantic-ish
dedup, clustering, mixture analysis — works well with the classic
model-free construction: hashed bag-of-words with signed buckets
(Weinberger et al. 2009, "Feature Hashing for Large Scale Multitask
Learning"), optionally IDF-weighted, L2-normalized.

This module turns raw text into that column deterministically (md5-
derived bucket and sign, no RNG state), so text flows straight into
every vector operator:

    docs → doc_embeddings → embedding_neardup_pairs   (semantic dedup)
    docs → doc_embeddings → ivf_pq_topk               (corpus search)

Scale shape: the no-IDF path is ONE shuffle-free Arrow pass (hash,
sign, accumulate, normalize per row).  ``idf=True`` adds the standard
one groupBy document-frequency pass whose result broadcasts (capped at
``max_idf_vocab`` most-frequent tokens; rarer tokens take IDF of the
cap boundary — conservative, and the cap bounds the broadcast).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lsd2_spark.functions.portable_hash import WS

__all__ = ["doc_embeddings"]


def _token_hash64(tok: str) -> int:
    return int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")


def doc_embeddings(
    df: DataFrame,
    text_col: str,
    id_col: str,
    dim: int = 64,
    idf: bool = False,
    max_idf_vocab: int = 65536,
    out_col: str = "embedding",
) -> DataFrame:
    """(id, embedding array<double> of length ``dim``): signed hashed
    bag-of-words, token weight ``log(1+tf)`` (× IDF when ``idf=True``),
    L2-normalized.  Total: NULL/empty docs get a NULL embedding.

    Deterministic: bucket = md5(token) mod dim, sign from the next
    hash bit — identical across engines, partitionings, and re-runs.
    """
    if dim < 1:
        raise ValueError("dim must be >= 1")
    spark = df.sparkSession

    idf_map: dict | None = None
    default_idf = 1.0
    if idf:
        n_docs = df.filter(F.col(text_col).isNotNull()).count()
        rows = (
            df.select(
                F.col(id_col),
                F.explode(
                    F.array_distinct(F.split(F.col(text_col), WS))
                ).alias("tok"),
            )
            .filter(F.col("tok") != "")
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("df"))
            .orderBy(F.desc("df"), F.asc("tok"))
            .limit(max_idf_vocab)
            .collect()
        )
        idf_map = {
            r["tok"]: float(np.log((1.0 + n_docs) / (1.0 + r["df"])) + 1.0)
            for r in rows
        }
        # tokens beyond the vocab cap are all RARER than every kept
        # token, so their true IDF exceeds every kept value — give them
        # the largest kept IDF as a floor (bounded under-weighting,
        # bounded broadcast)
        default_idf = max(idf_map.values()) if idf_map else 1.0
    bc_idf = spark.sparkContext.broadcast((idf_map, default_idf))

    def embed(batches):
        imap, dflt = bc_idf.value
        for pdf in batches:
            out = []
            for t in pdf["_t"]:
                if t is None:
                    out.append(None)
                    continue
                toks = [x for x in t.split() if x]
                if not toks:
                    out.append(None)
                    continue
                v = np.zeros(dim, dtype=np.float64)
                counts: dict = {}
                for tok in toks:
                    counts[tok] = counts.get(tok, 0) + 1
                for tok, tf in counts.items():
                    h = _token_hash64(tok)
                    b = h % dim
                    sign = 1.0 if (h >> 63) & 1 else -1.0
                    w = np.log1p(tf)
                    if imap is not None:
                        w *= imap.get(tok, dflt)
                    v[b] += sign * w
                n = np.linalg.norm(v)
                out.append((v / n).tolist() if n > 0 else None)
            yield pd.DataFrame({"_id": pdf["_id"], out_col: out})

    from lsd2_spark.operators.common import spread_partitions

    # the embed pass is deliberately shuffle-free, which also means a
    # single-file input would run the whole Arrow kernel in ONE task
    src = spread_partitions(
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    )
    return src.mapInPandas(
        embed, f"_id {df.schema[id_col].dataType.simpleString()}, {out_col} array<double>"
    ).select(F.col("_id").alias(id_col), out_col)
