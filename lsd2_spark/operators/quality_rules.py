"""Gopher rule-based document quality filtering (Rae et al. 2021,
arXiv:2112.11446, appendix A1.1) — the canonical rule set most web
pipelines (MassiveText, RefinedWeb, FineWeb) start from.

Complements the two existing quality components: ``quality_score``
(heuristic 0-100) and ``quality_model`` (trained classifier).  This
one is the exact, citable rule battery: each rule is emitted as its
own metric + boolean column so pipelines can loosen or drop individual
rules, plus an overall ``gopher_pass``.

Rules (paper defaults, all parameters overridable):

1. word count in [50, 100,000]
2. mean word length in [3, 10] characters
3. symbol-to-word ratio <= 0.1 for EACH of ``#`` and ellipsis
   (tested separately, as the paper specifies)
4. <= 90% of lines starting with a bullet
5. <= 30% of lines ending with an ellipsis
6. >= 80% of words containing an alphabetic character
7. at least 2 distinct English stop words present
   (the paper's list: the, be, to, of, and, that, have, with)

The paper's repetition rules (duplicate-line fraction, top-n-gram
share) live in :func:`lsd2_spark.operators.text_analysis.
repetition_stats` — join the two outputs for the complete battery.

100 TB shape: every rule is a pure Column expression over the
portable-whitespace tokenization — one projection, zero shuffle, zero
Python, whole-stage codegen end to end.  Total over null/empty
documents (metrics NULL, every flag false).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lsd2_spark.functions.numeric import round6
from lsd2_spark.functions.portable_hash import WS, WS_CHARS

__all__ = ["gopher_quality_flags", "GOPHER_STOPWORDS"]

#: The paper's stop-word list (A1.1 "stop word filter"), verbatim.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

_BULLETS = ("-", "*", "•")  # -, *, •


def gopher_quality_flags(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_words: int = 2,
    keep: list[str] | None = None,
) -> DataFrame:
    """Per-document Gopher rule metrics and flags.

    Returns ``(id_col, n_words, mean_word_len, hash_word_ratio,
    ellipsis_word_ratio, bullet_line_frac, ellipsis_line_frac,
    alpha_word_frac,
    n_stop_words, words_ok, word_len_ok, symbol_ok, bullet_ok,
    ellipsis_ok, alpha_ok, stop_ok, gopher_pass)`` — one row per input
    row.  ``filter(gopher_pass)`` is the paper's filter; the
    per-rule booleans support tuning individual thresholds.

    Fraction metrics are rounded with the engine-portable ``round6``
    (same convention as the rest of the text gate surface); flags are
    computed from the UNROUNDED values so a threshold can never flip
    on the rounding grid.

    ``keep`` appends passthrough input columns to the projection so a
    caller composing further row-local stages (see operators/curate.py)
    stays in ONE fused pass instead of re-joining on ``id_col``.
    """
    text = F.col(text_col)
    toks = F.filter(F.split(F.coalesce(text, F.lit("")), WS, -1), lambda t: t != "")
    n_words = F.size(toks)
    has_words = text.isNotNull() & (n_words > 0)

    word_chars = F.length(F.regexp_replace(text, WS, ""))
    mean_word_len = F.try_divide(word_chars.cast("double"), n_words)

    # A1.1 tests each symbol's ratio SEPARATELY ("symbol-to-word ratio
    # greater than 0.1 for either the hash symbol or the ellipsis") —
    # pooling them would wrongly reject a doc at 0.07 hash + 0.07
    # ellipsis
    n_hash = F.regexp_count(text, F.lit(r"#"))
    n_ellipsis = F.regexp_count(text, F.lit(r"\.\.\.")) + F.regexp_count(
        text, F.lit("…")
    )
    hash_ratio = F.try_divide(n_hash.cast("double"), n_words)
    ellipsis_ratio = F.try_divide(n_ellipsis.cast("double"), n_words)

    lines = F.filter(
        F.split(F.coalesce(text, F.lit("")), "\n", -1),
        lambda l: F.btrim(l, F.lit(WS_CHARS)) != "",
    )
    n_lines = F.size(lines)
    has_lines = n_lines > 0

    def _trimmed(l: Column) -> Column:
        return F.btrim(l, F.lit(WS_CHARS))

    bullet_lines = F.size(
        F.filter(lines, lambda l: F.substring(_trimmed(l), 1, 1).isin(*_BULLETS))
    )
    ellipsis_lines = F.size(
        F.filter(
            lines,
            lambda l: _trimmed(l).endswith("...") | _trimmed(l).endswith("…"),
        )
    )
    bullet_frac = F.try_divide(bullet_lines.cast("double"), n_lines)
    ellipsis_frac = F.try_divide(ellipsis_lines.cast("double"), n_lines)

    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    alpha_frac = F.try_divide(alpha_words.cast("double"), n_words)

    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(toks, F.lower)),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )

    def _flag(cond: Column) -> Column:
        return F.when(has_words & cond, True).otherwise(False)

    words_ok = _flag((n_words >= min_words) & (n_words <= max_words))
    word_len_ok = _flag(
        (mean_word_len >= min_mean_word_len) & (mean_word_len <= max_mean_word_len)
    )
    symbol_ok = _flag(
        (hash_ratio <= max_symbol_word_ratio)
        & (ellipsis_ratio <= max_symbol_word_ratio)
    )
    # a doc with words but no non-blank lines cannot exist (words imply
    # a non-blank line), so the line rules share the has_words gate
    bullet_ok = _flag(has_lines & (bullet_frac <= max_bullet_line_frac))
    ellipsis_ok = _flag(has_lines & (ellipsis_frac <= max_ellipsis_line_frac))
    alpha_ok = _flag(alpha_frac >= min_alpha_word_frac)
    stop_ok = _flag(n_stop >= min_stop_words)

    def _metric(c: Column) -> Column:
        return F.when(has_words, round6(c))

    return df.select(
        F.col(id_col),
        F.when(text.isNotNull(), n_words).cast("bigint").alias("n_words"),
        _metric(mean_word_len).alias("mean_word_len"),
        _metric(hash_ratio).alias("hash_word_ratio"),
        _metric(ellipsis_ratio).alias("ellipsis_word_ratio"),
        F.when(has_words & has_lines, round6(bullet_frac)).alias("bullet_line_frac"),
        F.when(has_words & has_lines, round6(ellipsis_frac)).alias(
            "ellipsis_line_frac"
        ),
        _metric(alpha_frac).alias("alpha_word_frac"),
        F.when(text.isNotNull(), n_stop).cast("int").alias("n_stop_words"),
        words_ok.alias("words_ok"),
        word_len_ok.alias("word_len_ok"),
        symbol_ok.alias("symbol_ok"),
        bullet_ok.alias("bullet_ok"),
        ellipsis_ok.alias("ellipsis_ok"),
        alpha_ok.alias("alpha_ok"),
        stop_ok.alias("stop_ok"),
        (
            words_ok
            & word_len_ok
            & symbol_ok
            & bullet_ok
            & ellipsis_ok
            & alpha_ok
            & stop_ok
        ).alias("gopher_pass"),
        *[F.col(c) for c in (keep or [])],
    )
