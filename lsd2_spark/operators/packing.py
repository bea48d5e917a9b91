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

from lsd2_spark.functions.portable_hash import WS


def _assign_seq_ids(
    df: DataFrame,
    id_col: str,
    token_count: Column,
    seq_len: int,
    strata_col: str,
    extra_cols: list[str] | None = None,
    tiebreak: Column | None = None,
) -> DataFrame:
    """The shared prefix-sum assignment: each doc joins the sequence
    where its first token lands (per-shard window cumsum).

    The window orders by ``(id_col, token_count)`` — the token count
    tiebreak makes the running SUM engine-independent even with
    duplicate ids (rows tying on both keys are interchangeable for
    every cumulative sum).  Sequence MEMBERSHIP of such tied rows is
    still arbitrary; callers that materialize per-sequence content
    (not just sums) pass a content-derived ``tiebreak`` column to pin
    it — the gate aggregates deliberately do not, keeping the oracle
    window two-key.
    """
    toks = token_count.cast("long")
    order = [F.col(id_col), toks] + ([tiebreak] if tiebreak is not None else [])
    w = (
        Window.partitionBy(strata_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.select(
        F.col(strata_col),
        F.col(id_col),
        *[F.col(c) for c in (extra_cols or [])],
        toks.alias("_n_tok"),
        F.floor((F.sum(toks).over(w) - toks) / F.lit(seq_len)).alias("seq_id"),
    )


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
    assigned = _assign_seq_ids(df, id_col, token_count, seq_len, strata_col)
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
            # Unrounded on purpose: seq_len is a power of two in every
            # gated use, so n_tokens/seq_len is an exact binary double —
            # bit-identical across engines.  ROUND(…, 6) here put 2/60
            # sf0.01 rows on a decimal half-tie that half-up (Spark) vs
            # half-even DuckDB builds snap differently.
            (F.col("n_tokens") / F.lit(float(seq_len))).alias("fill_frac"),
            F.col("first_doc"),
            F.col("last_doc"),
        )
    )


def split_passages(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_tokens: int = 128,
    stride: int | None = None,
) -> DataFrame:
    """Explode documents into token-windowed passages — the RAG/index
    preparation step: each passage carries its parent id, ordinal, the
    token span it covers, and the passage text.

    ``stride`` (default ``max_tokens``, i.e. disjoint windows) < 
    ``max_tokens`` yields overlapping windows.  Pure Column work:
    tokenize once, slice per window via ``transform`` over a computed
    window-start sequence — one projection + explode, no shuffle, no
    Python.
    """
    stride = stride or max_tokens
    if stride <= 0 or max_tokens <= 0:
        raise ValueError("max_tokens and stride must be positive")
    toks = F.split(F.col(text_col), WS)
    n = F.size(toks)
    # window starts: 1, 1+stride, ... while start <= n (empty doc -> one
    # empty passage is NOT emitted: sequence(1, 0) would descend, guard)
    starts = F.when(
        n >= 1, F.sequence(F.lit(1), n, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    passages = F.transform(
        starts,
        lambda s, i: F.struct(
            i.alias("passage_idx"),
            s.alias("tok_start"),
            F.least(s + max_tokens - 1, n).alias("tok_end"),
            F.concat_ws(" ", F.slice(toks, s, max_tokens)).alias("passage"),
        ),
    )
    return df.select(
        F.col(id_col), F.explode(passages).alias("_p")
    ).select(
        F.col(id_col),
        F.col("_p.passage_idx").cast("int").alias("passage_idx"),
        F.col("_p.tok_start").cast("int").alias("tok_start"),
        F.col("_p.tok_end").cast("int").alias("tok_end"),
        F.col("_p.passage").alias("passage"),
    )


def write_packed_corpus(
    df: DataFrame,
    path: str,
    id_col: str,
    text_col: str,
    seq_len: int,
    strata_col: str,
) -> DataFrame:
    """Materialize the packed corpus: concatenate each sequence's
    documents (in ``id_col`` order) into one training-example text row
    and write parquet partitioned by the shard column.

    Same prefix-sum assignment as :func:`pack_sequences`, plus an
    md5(text) window tiebreak: rows tying on (id, token_count) with
    DIFFERENT text are interchangeable for the gate's sums but not for
    the materialized text, so membership is pinned by content here;
    the concatenation is ``array_sort(collect_list(struct(id, text)))``
    so in-sequence order is deterministic inside the one per-shard
    shuffle.  Returns the written DataFrame (source, seq_id, n_docs,
    n_tokens, text).
    """
    assigned = _assign_seq_ids(
        df,
        id_col,
        F.size(F.split(F.col(text_col), WS)),
        seq_len,
        strata_col,
        extra_cols=[text_col],
        tiebreak=F.md5(F.col(text_col).cast("string")),
    )
    packed = (
        assigned.groupBy(strata_col, "seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_n_tok").alias("n_tokens"),
            F.array_sort(
                F.collect_list(F.struct(F.col(id_col).alias("i"), F.col(text_col).alias("t")))
            ).alias("_docs"),
        )
        .select(
            F.col(strata_col),
            "seq_id",
            "n_docs",
            "n_tokens",
            F.concat_ws(
                "\n\n", F.transform(F.col("_docs"), lambda d: d["t"])
            ).alias("text"),
        )
    )
    packed.write.mode("overwrite").partitionBy(strata_col).parquet(path)
    return packed
