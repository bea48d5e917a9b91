"""Corpus-level line/paragraph deduplication (CCNet-style boilerplate
removal).

Web corpora repeat the same navigation strings, cookie banners, and
footer lines across millions of pages.  Removing every *line* that
appears in at least ``min_docs`` distinct documents (after a light
normalization) is the classic CCNet cleanup pass — it runs *before*
document-level dedup, because the shared boilerplate otherwise makes
unrelated pages look like near-duplicates.

Reference scope note: the reference engine (astronomy catalogs) has no
text operators; this module is part of the training-data-pipeline
extension surface, same as dedup.py / text_analysis.py.

Spark-first design, 100 TB shape:

1. ``split`` + ``posexplode`` the documents into ``(doc, pos, line)``
   rows — zero shuffle, whole-stage codegen.
2. ``count(DISTINCT doc)`` per normalized line (duplicate lines
   inside one doc count once, so a single spammy page cannot promote
   its own refrain to "frequent").  Spark's distinct rewrite plans
   the shape you want at 100 TB: map-side (key, doc) dedup BEFORE the
   first exchange (so repeated boilerplate collapses locally), then a
   second, plan-sized exchange of per-key partial counts.  A
   single-exchange alternative (repartition then dedup in place)
   would shuffle the raw exploded rows undeduped — strictly more
   bytes.
3. The frequent set (``n_docs >= min_docs``) is the boilerplate — by
   construction a tiny fraction of distinct lines (Zipf head), so the
   join back to the exploded lines is broadcast-able; we leave the
   hint to AQE rather than forcing it, because ``min_docs = 2`` on a
   pathological corpus could exceed the broadcast cap.
4. Reassembly: one ``groupBy(doc)`` with
   ``array_join(transform(array_sort(collect_list(struct(pos, line)))))``
   — order restored from the recorded position, never from partition
   order, so the output is deterministic under any shuffle plan.

Total: three data-bearing exchanges (deduped pairs, the line-join,
reassembly) plus two plan-sized ones (per-key partial counts, the
small frequent-set side of the join).
No Python in the hot path; every expression is a JVM built-in.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lsd2_spark.functions.portable_hash import WS_CHARS

__all__ = [
    "line_doc_counts",
    "frequent_lines",
    "remove_frequent_lines",
]

#: Characters stripped from line ends before hashing.  The portable
#: whitespace set (see functions/portable_hash.WS) minus newline,
#: which the split already consumed.
_TRIM = WS_CHARS


def _line_key(line: Column) -> Column:
    """Normalized grouping key for a line: trimmed of portable
    whitespace and lowercased, so ``"  Home | About  "`` and
    ``"home | about"`` pool their counts (CCNet normalizes harder —
    digits and punctuation too — but trim+lower is the deterministic,
    locale-free core; callers wanting more can pre-normalize the
    column)."""
    return F.lower(F.btrim(line, F.lit(_TRIM)))


def _exploded(df: DataFrame, text_col: str, id_col: str, sep: str) -> DataFrame:
    from lsd2_spark.operators.common import spread_partitions

    df = spread_partitions(df)
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), F.lit(sep), -1)
    return df.select(
        F.col(id_col).alias("_doc"),
        F.posexplode(lines).alias("_pos", "_line"),
    ).withColumn("_key", _line_key(F.col("_line")))


def line_doc_counts(
    df: DataFrame, text_col: str, id_col: str, sep: str = "\n"
) -> DataFrame:
    """Per normalized line: how many *distinct documents* contain it.

    Returns ``(line_key, n_docs)``.  ``count(DISTINCT doc)`` plans as
    the two-phase distinct aggregate: map-side (key, doc) dedup, an
    exchange on (key, doc) moving only the deduped pairs, then a
    plan-sized exchange of per-key partial counts — see the module
    docstring for why this beats a single raw-row exchange.  Blank
    lines are excluded — they are structure, not boilerplate.
    ``id_col`` must be non-null (``count(DISTINCT doc)`` ignores NULL
    ids, same contract as :func:`remove_frequent_lines`)."""
    ex = _exploded(df, text_col, id_col, sep)
    return (
        ex.filter(F.col("_key") != "")
        .select(F.col("_key").alias("line_key"), "_doc")
        .groupBy("line_key")
        .agg(F.count_distinct(F.col("_doc")).alias("n_docs"))
    )


def frequent_lines(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_docs: int,
    sep: str = "\n",
) -> DataFrame:
    """The boilerplate set: normalized lines appearing in at least
    ``min_docs`` distinct documents, with their document counts."""
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    return line_doc_counts(df, text_col, id_col, sep).filter(
        F.col("n_docs") >= int(min_docs)
    )


def remove_frequent_lines(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_docs: int,
    sep: str = "\n",
    out_col: str = "clean_text",
) -> DataFrame:
    """CCNet-style boilerplate removal: drop every line that occurs in
    ``min_docs`` or more distinct documents; keep everything else in
    original order.

    Returns one row per input document (docs whose every line was
    boilerplate survive with an empty ``out_col``), carrying all
    original columns plus::

        out_col           text with frequent lines removed
        n_lines           non-blank lines in the original
        n_lines_removed   of those, how many were frequent
        n_chars_removed   characters dropped (original minus clean)

    Use ``sep="\\n\\n"`` (with documents normalized to blank-line
    paragraph breaks) for paragraph-level removal.  ``sep`` is used
    both as a Java regex (splitting) and as a literal (rejoining), so
    pass only separators where the two coincide — ``"\\n"`` and
    ``"\\n\\n"`` do; regex metacharacters do not.  ``id_col`` must be
    a non-null unique key (the convention across every dedup
    operator here).

    100 TB: shuffle #1 builds the frequency table (Zipf head — small),
    shuffle #2 joins it to the exploded lines on ``line_key`` (AQE
    broadcasts when it fits), shuffle #3 reassembles per document.
    Order within a document is restored from the recorded position,
    never from arrival order.
    """
    freq = frequent_lines(df, text_col, id_col, min_docs, sep).select(
        "line_key", F.lit(True).alias("_boiler")
    )
    ex = _exploded(df, text_col, id_col, sep)
    marked = ex.join(freq, ex["_key"] == freq["line_key"], "left").select(
        "_doc",
        "_pos",
        "_line",
        F.coalesce(F.col("_boiler"), F.lit(False)).alias("_boiler"),
        (F.col("_key") != "").cast("int").alias("_nonblank"),
    )
    rebuilt = marked.groupBy("_doc").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("_boiler"),
                            F.struct(F.col("_pos"), F.col("_line")),
                        )
                    )
                ),
                lambda s: s["_line"],
            ),
            sep,
        ).alias(out_col),
        F.sum(F.col("_nonblank")).alias("n_lines"),
        F.sum((F.col("_boiler") & (F.col("_nonblank") == 1)).cast("bigint")).alias(
            "n_lines_removed"
        ),
    )
    out = df.join(rebuilt, df[id_col] == rebuilt["_doc"], "left").drop("_doc")
    orig_len = F.length(F.coalesce(F.col(text_col), F.lit("")))
    return (
        out.withColumn(out_col, F.coalesce(F.col(out_col), F.lit("")))
        .withColumn("n_lines", F.coalesce(F.col("n_lines"), F.lit(0)).cast("bigint"))
        .withColumn(
            "n_lines_removed",
            F.coalesce(F.col("n_lines_removed"), F.lit(0)).cast("bigint"),
        )
        .withColumn(
            "n_chars_removed", (orig_len - F.length(F.col(out_col))).cast("bigint")
        )
    )
