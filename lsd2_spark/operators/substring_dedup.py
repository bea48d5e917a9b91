"""Repeated-substring (ExactSubstr-style) deduplication.

Document-level dedup (exact / minhash / simhash) misses the dominant
duplication mode in web corpora: long spans repeated VERBATIM inside
otherwise-distinct documents (boilerplate, quotes, licenses, mirrored
paragraphs).  The public result motivating this operator is Lee et
al. 2022, "Deduplicating Training Data Makes Language Models Better"
(ExactSubstr: remove every duplicated substring of >= 50 tokens,
keeping one occurrence).

Suffix arrays do not distribute well; the Spark-first equivalent is a
rolling token-window pass:

1. every document emits its length-``min_tokens`` token windows with a
   window key (one projection + explode — no Python);
2. ONE groupBy on the window key finds duplicated windows and elects a
   global owner occurrence — min (doc_id, position) — per key;
3. joining back tags every non-owner occurrence of a duplicated window
   as removable; per-document interval-merging of removable windows
   (pure window functions: lag + cumulative span ids) yields maximal
   token spans;
4. span removal rebuilds the text keeping tokens outside the spans
   (higher-order array functions, zero extra shuffle).

Exactness: a repeated substring of >= min_tokens tokens makes ALL of
its length-``min_tokens`` windows repeated, so every repeated region
is fully covered by duplicated windows and the merged spans contain
it — the same coverage guarantee ExactSubstr gets from suffix arrays,
at n-gram key granularity.

At 100 TB: step 2's shuffle moves one row per token occurrence (the
same order as any tokenizing aggregation — no quadratic pair space,
nothing driver-side); step 3 shuffles once per document id; hot keys
(a license repeated 10^6 times) are a single grouped count plus one
owner row, and the join back is AQE-skew-splittable.  ``keep='first'``
keeps the globally-first occurrence; ``keep='none'`` removes every
occurrence (decontamination-style scrubbing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lsd2_spark.functions.portable_hash import WS

__all__ = ["repeated_spans", "remove_repeated_spans"]


def _windows(df: DataFrame, text_col: str, id_col: str, L: int) -> DataFrame:
    """(id, start, wkey) for every length-L token window; 1-based
    ``start``.  Documents with fewer than L tokens emit nothing."""
    toks = F.split(F.col(text_col), WS)
    n = F.size(toks)
    starts = F.when(n >= L, F.sequence(F.lit(1), n - L + 1))
    win = df.select(
        F.col(id_col),
        toks.alias("_t"),
        F.explode(starts).alias("start"),
    )
    # space-joined: tokens are whitespace-split so " " provably cannot
    # occur inside one — ["ab","c"] and ["a","bc"] stay distinct keys
    gram = F.concat_ws(" ", F.slice(F.col("_t"), F.col("start"), L))
    # xxhash64 keys the shuffle; collisions only over-merge windows, and
    # the span semantics tolerate that (a colliding window is "repeated"
    # spuriously with probability ~2^-64 per pair)
    return win.select(
        F.col(id_col), F.col("start"), F.xxhash64(gram).alias("wkey")
    )


def repeated_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_tokens: int = 8,
    keep: str = "first",
) -> DataFrame:
    """Maximal repeated token spans per document.

    Returns (id, span_start, span_end) with 1-based token positions,
    ``span_end`` exclusive: the maximal merged unions of duplicated
    length-``min_tokens`` windows — every token inside a span is
    covered by at least one window that occurs elsewhere in the corpus
    (or earlier in the same document).  ``keep='first'`` exempts the globally-first
    occurrence of each window — min (doc_id, start) — so one copy of
    every repeated region survives; ``keep='none'`` marks all of them.
    """
    if keep not in ("first", "none"):
        raise ValueError(f"keep={keep!r}: expected 'first' or 'none'")
    if min_tokens < 1:
        raise ValueError("min_tokens must be >= 1")
    win = _windows(df, text_col, id_col, min_tokens)

    # one shuffle: occurrences per window key + the owner occurrence
    stats = win.groupBy("wkey").agg(
        F.count(F.lit(1)).alias("_n"),
        F.min(F.struct(F.col(id_col), F.col("start"))).alias("_owner"),
    )
    tagged = win.join(stats.filter(F.col("_n") > 1), "wkey")
    if keep == "first":
        tagged = tagged.filter(
            ~(
                (F.col(f"_owner.{id_col}") == F.col(id_col))
                & (F.col("_owner.start") == F.col("start"))
            )
        )
    removable = tagged.select(F.col(id_col), F.col("start"))

    # interval-merge the length-L windows per document: windows at
    # starts s, s' overlap-or-touch iff s' <= s + L, so a new span
    # begins exactly where the gap exceeds L
    w = Window.partitionBy(id_col).orderBy("start")
    spans = (
        removable.withColumn("_prev", F.lag("start").over(w))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev").isNull()
                | (F.col("start") - F.col("_prev") > min_tokens),
                1,
            ).otherwise(0),
        )
        .withColumn("_sid", F.sum("_new").over(w))
        .groupBy(id_col, "_sid")
        .agg(
            F.min("start").alias("span_start"),
            (F.max("start") + min_tokens).alias("span_end"),
        )
        .select(id_col, "span_start", "span_end")
    )
    return spans


def remove_repeated_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_tokens: int = 8,
    keep: str = "first",
) -> DataFrame:
    """Scrub repeated spans out of the corpus: every input row comes
    back (total — NULL/short docs untouched) with ``clean_text`` (the
    tokens outside repeated spans re-joined with single spaces),
    ``n_tokens_removed``, and ``n_spans``.

    One extra broadcast-or-shuffle join of the span table (span rows
    per doc are bounded by doc length / min_tokens) against the corpus;
    the rebuild is higher-order array functions, no Python."""
    spans = (
        repeated_spans(df, text_col, id_col, min_tokens, keep)
        .groupBy(id_col)
        .agg(
            F.collect_list(
                F.struct(F.col("span_start").alias("s"), F.col("span_end").alias("e"))
            ).alias("_spans")
        )
    )
    toks = F.split(F.col(text_col), WS)
    joined = df.join(spans, id_col, "left")
    in_span = lambda pos: F.exists(  # noqa: E731
        F.col("_spans"), lambda sp: (pos >= sp["s"]) & (pos < sp["e"])
    )
    kept = F.filter(
        F.zip_with(
            toks,
            F.sequence(F.lit(1), F.size(toks)),
            lambda t, i: F.struct(t.alias("t"), in_span(i).alias("drop")),
        ),
        lambda x: ~x["drop"],
    )
    n_removed = F.aggregate(
        F.coalesce(F.col("_spans"), F.array()),
        F.lit(0),
        lambda acc, sp: acc + (sp["e"] - sp["s"]),
    )
    return joined.select(
        F.col(id_col),
        F.col(text_col),
        F.when(F.col(text_col).isNotNull() & F.col("_spans").isNotNull(),
               F.concat_ws(" ", F.transform(kept, lambda x: x["t"])))
        .otherwise(F.col(text_col))
        .alias("clean_text"),
        F.coalesce(n_removed, F.lit(0)).alias("n_tokens_removed"),
        F.coalesce(F.size("_spans"), F.lit(0)).alias("n_spans"),
    )
