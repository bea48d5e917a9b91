"""Benchmark decontamination: flag training documents that share long
word n-grams with an evaluation/benchmark set.

The standard pre-training hygiene pass (GPT-3 appendix C / PaLM §7
style): any training document containing an exact n-gram that also
appears in a held-out benchmark is marked contaminated so it can be
dropped or audited before training.

Scale shape: benchmark sets are tiny relative to the corpus (thousands
of documents vs billions), so the distinct eval n-gram set is
broadcast; the train side is a map-only explode feeding a broadcast
hash join — the only shuffle is the final per-document count
aggregation, which is partial-aggregable.  Nothing here is O(train ×
eval).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_ngrams(text: Column, n: int) -> Column:
    """Lower-cased whitespace-token word ``n``-grams as an array of
    space-joined strings; empty array when the document has fewer than
    ``n`` tokens (guards ``sequence``'s descending-range behavior)."""
    t = F.split(F.lower(text), r"\s+")
    m = F.size(t) - F.lit(n - 1)
    return F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(1), m),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
) -> DataFrame:
    """Per-training-document contamination report against ``eval_df``.

    Returns one row per train document: ``n_eval_ngram_hits`` (distinct
    eval n-grams found in the document), ``worst_ngram`` (lexicographic
    max hit, for auditability), and ``contaminated`` (any hit).
    """
    ev = (
        eval_df.select(F.explode(word_ngrams(F.col(text_col), n)).alias("ngram"))
        .distinct()
    )
    tr = train.select(
        F.col(id_col),
        F.explode(word_ngrams(F.col(text_col), n)).alias("ngram"),
    )
    # broadcast-join FIRST: the join filters the exploded stream down to
    # actual hits (a sliver of the corpus) before anything shuffles, so
    # the per-document distinct-count aggregation moves only hit rows.
    hits = (
        tr.join(F.broadcast(ev), "ngram")
        .groupBy(id_col)
        .agg(
            F.count_distinct(F.col("ngram")).alias("n_eval_ngram_hits"),
            F.max("ngram").alias("worst_ngram"),
        )
    )
    return (
        train.select(F.col(id_col))
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_eval_ngram_hits"), F.lit(0)).alias(
                "n_eval_ngram_hits"
            ),
            F.col("worst_ngram"),
            (F.coalesce(F.col("n_eval_ngram_hits"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )
