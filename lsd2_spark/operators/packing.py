"""Sequence packing: the concatenate-and-chunk step that turns a
filtered document corpus into fixed-length training examples.

The classic pre-training layout (GPT-2/3 style): documents in a shard
are concatenated in a deterministic order and the token stream is cut
into ``seq_len``-token windows.  A document is assigned to the window
in which it STARTS, so the assignment is a pure prefix-sum — exactly
expressible as a window cumulative sum, no Python, no driver state.

Scale shape: packing is per-shard (``strata_col``), matching how real
pipelines pack per input shard/source so no global order is required —
one shuffle on the stratum key, then a per-partition ordered cumsum.
A single global ordering (strata_col=None) would serialize on one
partition and is deliberately not offered.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count: Column,
    seq_len: int,
    strata_col: str,
) -> DataFrame:
    """Assign each document to a training sequence: documents are laid
    out in ``id_col`` order within each ``strata_col`` shard and cut
    into ``seq_len``-token chunks; a document belongs to the chunk
    where its first token lands.

    Returns one row per (shard, sequence): document count, token count,
    fill fraction vs ``seq_len``, and the first/last document ids —
    the manifest a downstream tokenizer-writer consumes.
    """
    w = (
        Window.partitionBy(strata_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = token_count.cast("long")
    assigned = df.select(
        F.col(strata_col),
        F.col(id_col),
        toks.alias("_n_tok"),
        F.floor((F.sum(toks).over(w) - toks) / F.lit(seq_len)).alias("seq_id"),
    )
    return (
        assigned.groupBy(strata_col, "seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_n_tok").alias("n_tokens"),
            F.min(id_col).alias("first_doc"),
            F.max(id_col).alias("last_doc"),
        )
        .select(
            F.col(strata_col),
            F.col("seq_id"),
            F.col("n_docs"),
            F.col("n_tokens"),
            F.round(F.col("n_tokens") / F.lit(float(seq_len)), 6).alias("fill_frac"),
            F.col("first_doc"),
            F.col("last_doc"),
        )
    )
