"""Corpus retrieval: BM25 scoring for targeted data selection.

Training-data pipelines use lexical retrieval to SELECT data, not just
serve queries — e.g. pulling the corpus slice most similar to a target
domain before fine-tuning, or scoring documents against a benchmark
description for curriculum mixing.  BM25 (Robertson et al., TREC-3) is
the standard scorer.

Scale shape: the query term set is tiny, so everything heavy happens
AFTER filtering the exploded token stream down to query terms — the
document-frequency aggregation and the per-doc score aggregation move
only matched rows.  Corpus statistics (N, avgdl) are one partial-agg
scalar pass; the final top-k is TakeOrdered (no global sort).  At
100 TB this is two filtered aggregations and a broadcast of a
query-terms-sized idf table.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lsd2_spark.functions.portable_hash import WS

from lsd2_spark.functions.numeric import round6

__all__ = ["bm25_score", "bm25_topk"]


def _query_terms(query: str) -> list[str]:
    terms = [t for t in re.split(WS, query.lower().strip()) if t]
    # dedup, keep first-seen order (scoring sums per distinct term)
    seen: dict[str, None] = {}
    for t in terms:
        seen.setdefault(t)
    return list(seen)


def bm25_score(
    docs: DataFrame,
    query: str,
    text_col: str,
    id_col: str,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every document containing at least one query term:
    ``sum_t idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))``
    with the standard BM25+ idf ``ln(1 + (N - df + 0.5)/(df + 0.5))``.

    Tokenization is lower-cased whitespace splitting (consistent with
    the rest of the text stack).  Scores are rounded to 6 dp so they
    are engine-portable.  Returns (id, score, n_query_terms_matched).
    """
    terms = _query_terms(query)
    if not terms:
        raise ValueError("empty query")

    toks = F.split(F.lower(F.col(text_col)), WS)
    base = docs.select(
        F.col(id_col),
        toks.alias("_t"),
        F.size(toks).cast("double").alias("_dl"),
    )

    # corpus stats: ONE scalar partial-agg pass, broadcast via crossJoin
    # of a single row (plan-sized; same pattern as the q06 oracle).
    # avgdl is SUM/COUNT, not F.avg: the lengths are integer-valued
    # doubles, so the sum is exact at any accumulation order (≤ 2^53)
    # and the single division is engine-portable — F.avg's streaming
    # accumulation drifts from DuckDB's by ulps
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("_n_docs"),
        (F.sum("_dl") / F.count(F.lit(1))).alias("_avgdl"),
    )

    # per-(doc, query-term) term frequency — the filter runs INSIDE the
    # projection (array intersection), so only matched tokens explode
    matched = (
        base.select(
            F.col(id_col),
            "_dl",
            F.explode(
                F.filter(F.col("_t"), lambda x: x.isin(terms))
            ).alias("_term"),
        )
        .groupBy(id_col, "_dl", "_term")
        .agg(F.count(F.lit(1)).cast("double").alias("_tf"))
    )

    # document frequency per query term — aggregates only matched rows
    df_tbl = matched.groupBy("_term").agg(
        F.count(F.lit(1)).cast("double").alias("_df")
    )

    scored = (
        matched.join(F.broadcast(df_tbl), "_term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log(
                F.lit(1.0)
                + (F.col("_n_docs") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
            ),
        )
        .withColumn(
            "_s",
            F.col("_idf")
            * F.col("_tf")
            * (k1 + 1.0)
            / (
                F.col("_tf")
                + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
            ),
        )
        .groupBy(id_col)
        .agg(
            round6(F.sum("_s")).alias("score"),
            F.count(F.lit(1)).alias("n_query_terms_matched"),
        )
    )
    return scored


def bm25_topk(
    docs: DataFrame,
    query: str,
    text_col: str,
    id_col: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents by BM25 score (ties broken by id for
    determinism).  ``orderBy().limit()`` plans as TakeOrderedAndProject
    — per-partition top-k then a driver merge, never a global sort."""
    return (
        bm25_score(docs, query, text_col, id_col, k1=k1, b=b)
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )
