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
    hashed: bool = False,
    force_broadcast: bool = True,
) -> DataFrame:
    """Per-training-document contamination report against ``eval_df``.

    Returns one row per train document: ``n_eval_ngram_hits`` (distinct
    eval n-grams found in the document), ``worst_ngram`` (lexicographic
    max hit, for auditability — null in hashed mode), and
    ``contaminated`` (any hit).

    Scale knobs:
    - ``hashed=True`` joins on a 60-bit portable hash of each n-gram
      instead of the string — ~8 bytes/row instead of tens, shrinking
      the broadcast (or shuffle) by an order of magnitude.  Collisions
      can only ADD false contamination flags (never miss one), at
      ~(pairs)/2^60 probability — the conservative direction for
      decontamination.
    - ``force_broadcast=False`` leaves the join strategy to Catalyst —
      the right call when the eval set is too large to broadcast
      (AQE picks a shuffle join, and the per-doc aggregation is
      unchanged).
    """
    from lsd2_spark.functions.portable_hash import hash64

    join_col = "_ngh" if hashed else "ngram"
    ev = eval_df.select(
        F.explode(word_ngrams(F.col(text_col), n)).alias("ngram")
    )
    tr = train.select(
        F.col(id_col),
        F.explode(word_ngrams(F.col(text_col), n)).alias("ngram"),
    )
    if hashed:
        ev = ev.select(hash64(F.col("ngram")).alias(join_col))
        tr = tr.select(id_col, hash64(F.col("ngram")).alias(join_col))
    ev = ev.distinct()
    if force_broadcast:
        ev = F.broadcast(ev)
    # join FIRST: it filters the exploded stream down to actual hits (a
    # sliver of the corpus) before anything shuffles, so the
    # per-document distinct-count aggregation moves only hit rows.
    hits = (
        tr.join(ev, join_col)
        .groupBy(id_col)
        .agg(
            F.count_distinct(F.col(join_col)).alias("n_eval_ngram_hits"),
            F.max(
                F.lit(None).cast("string") if hashed else F.col("ngram")
            ).alias("worst_ngram"),
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
