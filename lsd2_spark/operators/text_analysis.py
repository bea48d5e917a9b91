"""Text-analysis operators: token stats, quality scoring, language ID,
document fingerprinting.

All hot paths are built-in Column expressions (JVM-side, codegen);
the only Python is the winnowing fingerprint, which is an Arrow-batched
pandas UDF over NumPy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from lsd2_spark.functions.portable_hash import WS

from lsd2_spark.functions.numeric import round6

__all__ = [
    "token_stats",
    "quality_score",
    "lang_id",
    "doc_profile",
    "content_fingerprint",
    "winnow_fingerprint",
    "repetition_stats",
    "redact_pii",
    "blocklist_filter",
    "token_frequency_profile",
    "vocab_coverage",
    "PII_PATTERNS",
    "LANG_MARKERS",
]

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# tiny marker lexicons for the n-gram/stopword language heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "es": ["el", "la", "de", "que", "es"],
    "fr": ["le", "la", "de", "et", "est"],
    "de": ["der", "die", "das", "und", "ist"],
}


def _tokens(text: Column) -> Column:
    return F.split(text, WS)


# GPT-2-style pre-tokenizer segmentation, restricted to constructs both
# Java regex (Spark) and RE2 (DuckDB) evaluate identically: contraction
# suffixes, space-prefixed letter runs, digit runs, punctuation runs.
BPE_TOKEN_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \t\n\r\f]+"


def token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document token accounting: whitespace counts, distinct
    counts, average token length, and a BPE-ish pre-tokenizer count
    (the LLM-pipeline "how many tokens is this corpus" estimator)."""
    t = _tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars_obs"),
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_uniq_tokens"),
        round6(
            F.length(F.regexp_replace(F.col(text_col), WS, "")).cast("double")
            / F.size(t)
        ).alias("avg_token_len"),
        F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_RE)).alias("n_bpe_tokens"),
    )


def _quality_cols(text_col: str) -> list[Column]:
    t = _tokens(F.col(text_col))
    n_tok = F.size(t)
    n_uniq = F.size(F.array_distinct(t))
    stop_share = F.size(
        F.filter(t, lambda x: x.isin(STOPWORDS))
    ).cast("double") / n_tok
    diversity = n_uniq.cast("double") / n_tok
    length_ok = F.when((n_tok >= 10) & (n_tok <= 100_000), 1.0).otherwise(0.0)
    score = round6(40.0 * diversity + 30.0 * stop_share + 30.0 * length_ok)
    return [
        round6(stop_share).alias("stopword_share"),
        round6(diversity).alias("lexical_diversity"),
        score.alias("quality"),
        F.when(score >= 60, "good").when(score >= 30, "ok").otherwise("spam").alias("bucket"),
    ]


def _lang_cols(text_col: str) -> list[Column]:
    t = _tokens(F.lower(F.col(text_col)))

    def contains(markers: list[str]):
        return lambda x: x.isin(markers)

    hits = {
        lang: F.size(F.filter(t, contains(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.greatest(*hits.values())
    label = F.lit("und")
    # reverse order so earlier languages win ties
    for lang in reversed(list(LANG_MARKERS)):
        label = F.when((hits[lang] == best) & (best > 0), lang).otherwise(label)
    return [*[h.alias(f"hits_{l}") for l, h in hits.items()], label.alias("lang_pred")]


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic document quality: length band, stopword share, lexical
    diversity; combined into a deterministic 0-100 score + bucket."""
    return df.select(F.col(id_col), *_quality_cols(text_col))


def lang_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Marker-token language heuristic: count marker hits per language,
    argmax with a fixed preference order for ties."""
    return df.select(F.col(id_col), *_lang_cols(text_col))


def doc_profile(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Quality score + language ID in ONE projection over one scan —
    the pipeline form: both are pure Column expressions over the same
    tokenization, so fusing them costs nothing and halves the reads
    (one map-only pass at 100 TB, no shuffle, no join)."""
    return df.select(
        F.col(id_col), *_quality_cols(text_col), *_lang_cols(text_col)
    )


# PII scrub patterns, applied in order (email first — it contains
# digit/dot runs the later patterns would otherwise partially match).
# Plain Java-regex constructs only; replacement is a typed tag so
# downstream dedup/fingerprints stay stable across redacted variants.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (
        "phone",
        r"(?:\+?\d{1,2}[-. ])?(?:\(\d{3}\)[-. ]?|\d{3}[-. ])\d{3}[-. ]\d{4}\b",
        "<PHONE>",
    ),
]


def redact_pii(df: DataFrame, text_col: str) -> DataFrame:
    """Scrub emails / IPv4s / SSN-shaped ids / US-style phone numbers
    from ``text_col`` in place, adding per-class hit counts and a total
    ``n_pii_redacted`` column — the standard pre-training privacy pass.

    Pure Column ``regexp_count`` + ``regexp_replace`` chain: JVM-side,
    whole-stage codegen, zero shuffle — the 100 TB plan is a map-only
    scan.

    Each class is counted on the text AFTER the previous classes'
    replacements (the same progression the scrub itself follows), so
    ``n_pii_redacted`` equals the number of tags actually inserted —
    a digit run inside an already-redacted email is not double-counted
    as an IP."""
    out = df
    total = F.lit(0)
    current = F.col(text_col)
    for name, pat, tag in PII_PATTERNS:
        cnt = F.regexp_count(current, F.lit(pat))
        out = out.withColumn(f"n_pii_{name}", cnt)
        total = total + F.col(f"n_pii_{name}")
        current = F.regexp_replace(current, pat, tag)
    return out.withColumn(text_col, current).withColumn("n_pii_redacted", total)


def repetition_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, §A1.1 quality
    filters): per-document duplicate-line fraction, duplicate-line
    character fraction, and the character share of the most frequent
    word 2-gram — the standard "is this page boilerplate/spam" gates in
    an LLM pretraining pipeline.

    Definitions (deterministic, oracle-replayable):
      - ``dup_line_frac``       = (n_lines - n_distinct_lines) / n_lines
      - ``dup_line_char_frac``  = chars in line occurrences beyond the
        first / total chars across all lines
      - ``top_bigram_char_frac`` = top_bigram_n * len(top_bigram)
        / len(text); ties broken toward the lexicographically greatest
        bigram.

    Scale shape: the line statistics are pure Column expressions — the
    duplicate char mass comes from pairwise-comparing a sorted line
    array (duplicates are adjacent), linear per row, zero shuffle.  The
    top-bigram pass is explode → count groupBy → max(struct) — both
    aggregations partial-aggregable (map-side combine), never O(n²)
    per document, and the final join is on the document key.
    """
    text = F.col(text_col)
    lines = F.split(text, "\n")
    n_lines = F.size(lines)
    s = F.array_sort(lines)
    # char mass of occurrences beyond the first: sort makes duplicates
    # adjacent, so zip s[0:n-1] with s[1:n] and sum lengths where equal
    pair_dup = F.zip_with(
        F.slice(s, 1, n_lines - 1),
        F.slice(s, 2, n_lines - 1),
        lambda a, b: F.when(a == b, F.length(b)).otherwise(F.lit(0)),
    )
    dup_chars = F.aggregate(pair_dup, F.lit(0), lambda acc, x: acc + x)
    line_chars = F.aggregate(lines, F.lit(0), lambda acc, l: acc + F.length(l))

    toks = _tokens(text)
    n_t = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n_t - 1),
        F.slice(toks, 2, n_t - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )

    base = df.select(
        F.col(id_col),
        n_lines.alias("n_lines"),
        round6((n_lines - F.size(F.array_distinct(lines))).cast("double") / n_lines).alias(
            "dup_line_frac"
        ),
        round6(
            F.when(line_chars > 0, dup_chars.cast("double") / line_chars)
            .when(text.isNotNull(), 0.0)
        ).alias("dup_line_char_frac"),
        F.length(text).alias("_n_chars"),
    )
    top = (
        df.select(F.col(id_col), F.explode(bigrams).alias("bigram"))
        .groupBy(id_col, "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(F.max(F.struct(F.col("c").alias("c"), F.col("bigram").alias("bigram"))).alias("m"))
        .select(
            F.col(id_col),
            F.col("m.bigram").alias("top_bigram"),
            F.col("m.c").alias("top_bigram_n"),
        )
    )
    return base.join(top, id_col, "left").select(
        F.col(id_col),
        F.col("n_lines"),
        F.col("dup_line_frac"),
        F.col("dup_line_char_frac"),
        F.col("top_bigram"),
        F.when(F.col("n_lines").isNotNull(), F.coalesce(F.col("top_bigram_n"), F.lit(0))).alias(
            "top_bigram_n"
        ),
        F.when(
            F.col("n_lines").isNotNull(),
            round6(
                F.coalesce(
                    F.col("top_bigram_n") * F.length(F.col("top_bigram"))
                    / F.nullif(F.col("_n_chars"), F.lit(0)),
                    F.lit(0.0),
                )
            ),
        ).alias("top_bigram_char_frac"),
    )


def content_fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Normalization-invariant content fingerprint: md5 of the
    lowercased text with whitespace stripped."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), WS, "")
    return df.select(F.col(id_col), F.md5(norm).alias("fingerprint"))


_WINNOW_B = 257
_WINNOW_P = 2_147_483_647  # 2^31-1: keeps b·B^i mod P products in int64


@F.pandas_udf(LongType())
def _winnow_kernel(text: pd.Series) -> pd.Series:
    """Winnowing (Schleimer et al. 2003): min rolling k-gram hash over a
    sliding window — a robust near-duplicate document sketch.  The
    k-gram hashes are computed as a vectorized matrix product mod P."""
    from numpy.lib.stride_tricks import sliding_window_view

    k, w = 8, 16
    powvec = np.array(
        [pow(_WINNOW_B, k - 1 - i, _WINNOW_P) for i in range(k)], dtype=np.int64
    )
    out = np.zeros(len(text), dtype=np.int64)
    for i, s in enumerate(text):
        if s is None or len(s) < k:
            out[i] = 0
            continue
        # Codepoints, not utf-8 bytes: the SQL twin walks characters
        # (substr/ord are character-based in every ANSI engine), so the
        # kernel must too or non-ASCII text forks the two.  utf-32-le is
        # a fixed-width codepoint dump — as vectorizable as frombuffer.
        b = np.frombuffer(s.encode("utf-32-le", "ignore"), dtype=np.uint32).astype(np.int64)
        grams = sliding_window_view(b, k)  # (n, k), values < 0x110000
        h = (grams * powvec[None, :] % _WINNOW_P).sum(axis=1) % _WINNOW_P
        if len(h) <= w:
            out[i] = int(h.min())
        else:
            out[i] = int(sliding_window_view(h, w).min(axis=1).min())
    return pd.Series(out)


def winnow_fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(F.col(id_col), _winnow_kernel(F.col(text_col)).alias("winnow_min"))


def fingerprints(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Content md5 + winnowing sketch in ONE pass over the text column
    (single scan, zero shuffle — both are per-row expressions)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), WS, "")
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fingerprint"),
        _winnow_kernel(F.col(text_col)).alias("winnow_min"),
    )


def blocklist_filter(
    df: DataFrame,
    text_col: str,
    id_col: str,
    terms: list[str],
    max_hits: int = 0,
) -> DataFrame:
    """Token-level blocklist gate (the NSFW/bad-words filter of corpus
    curation): count exact lower-cased token matches against ``terms``
    and keep documents with at most ``max_hits``.  Adds
    ``n_blocked_hits``.  Pure Column expression (array intersection
    over one tokenization) — map-only scan, no shuffle, no regex
    pathologies from user-supplied terms."""
    if not terms:
        raise ValueError("empty blocklist")
    t = _tokens(F.lower(F.col(text_col)))
    lowered = [x.lower() for x in terms]
    # coalesce: NULL text yields F.size(NULL) = NULL, and NULL <= max_hits
    # would silently drop the row — total like lm_score/bpe_encode/
    # decontaminate, a NULL-text doc has zero blocked hits and is kept
    hits = F.coalesce(F.size(F.filter(t, lambda x: x.isin(lowered))), F.lit(0))
    return df.withColumn("n_blocked_hits", hits).filter(
        F.col("n_blocked_hits") <= max_hits
    )


def token_frequency_profile(
    df: DataFrame,
    text_col: str,
    id_col: str,
    top_k: int = 100,
) -> DataFrame:
    """Corpus vocabulary report: the exact ``top_k`` tokens by
    occurrence count with document frequency and cumulative corpus
    share — the "what does my tokenizer need to cover" profile.

    Plan shape: one explode + groupBy(token) (Catalyst's partial
    map-side combine absorbs the heavy hitters before the shuffle —
    that is exactly what makes the skewed-token distribution cheap),
    ``approx_count_distinct`` for doc frequency (one pass, no second
    shuffle), and a TakeOrdered top-k instead of a full sort.  The
    corpus-share denominator is a plan-sized 1-row broadcast.
    Columns: token, n_occurrences, n_docs_approx, share, cum_share.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), WS)).alias("token"),
    ).filter(F.col("token") != "")
    counts = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.approx_count_distinct(id_col).alias("n_docs_approx"),
    )
    total = toks.agg(F.count(F.lit(1)).alias("_total"))
    top = counts.orderBy(
        F.desc("n_occurrences"), F.asc("token")
    ).limit(top_k)
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("n_occurrences"), F.asc("token")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            "token",
            "n_occurrences",
            "n_docs_approx",
            (F.col("n_occurrences") / F.col("_total")).alias("share"),
            (F.sum("n_occurrences").over(w) / F.col("_total")).alias("cum_share"),
        )
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str,
    id_col: str,
    vocab: "list[str]",
) -> DataFrame:
    """Per-document coverage of a fixed vocabulary: what fraction of a
    doc's token occurrences a tokenizer with exactly ``vocab`` as its
    word list would cover (the OOV-rate report, per doc so outlier
    sources are visible).  Pure Column work over one tokenization —
    the vocab ships as an array literal inside the plan (fine to ~100k
    entries; beyond that, broadcast-join a vocab table instead).
    Columns: id, n_tokens, n_covered, coverage (NULL text -> NULL
    coverage, row kept)."""
    if not vocab:
        raise ValueError("empty vocab")
    vs = sorted(set(vocab))
    t = F.split(F.col(text_col), WS)
    covered = F.size(F.filter(t, lambda x: x.isin(vs)))
    n = F.size(t)
    return df.select(
        F.col(id_col),
        F.when(F.col(text_col).isNotNull(), n).alias("n_tokens"),
        F.when(F.col(text_col).isNotNull(), covered).alias("n_covered"),
        F.when(
            F.col(text_col).isNotNull() & (n > 0),
            covered.cast("double") / n,
        ).alias("coverage"),
    )
