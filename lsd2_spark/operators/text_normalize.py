"""Unicode normalization and mojibake repair for text corpora.

Real web corpora arrive with inconsistent Unicode composition (the
same visible string as NFC or NFD byte sequences) and with encoding
damage — UTF-8 bytes decoded as cp1252/latin-1 somewhere upstream
("café" shipped as "cafÃ©").  Both defeat every downstream hash-based
stage: NFC and NFD spellings of one word hash apart in exact/minhash
dedup, and damaged text poisons token stats, LM scores, and n-gram
decontamination.  CCNet/ftfy-class cleanup runs before dedup for
exactly this reason; this module is that stage.

Scale shape — every operator here is a single shuffle-free pass over
the corpus:

- :func:`unicode_normalize` is one Arrow-batched pandas pass
  (``Series.str.normalize``, C-speed codec work, no Python loop).
- :func:`fix_mojibake` pre-filters with a vectorized marker scan (a
  mis-decoded UTF-8 multi-byte sequence must contain a char in
  U+00C2..U+00F4 — the lead-byte range), so the per-row
  strict-roundtrip repair touches only suspicious rows: ~zero on
  clean corpora, and the repair itself is two C codecs per round.
- :func:`strip_control_chars` is a pure Column regexp with an exact
  SQL twin (JVM codegen, no Python at all).

Repair is deliberately conservative: a string is rewritten only when
the WHOLE string re-encodes (cp1252, falling back to latin-1) and
strictly re-decodes as UTF-8 — legitimate accented text fails that
roundtrip at the first non-continuation byte and is kept verbatim
(the ftfy criterion).  Rewrites are flagged so callers can audit.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "unicode_normalize",
    "fix_mojibake",
    "strip_control_chars",
    "strip_control_chars_sql",
    "clean_text",
]

_FORMS = ("NFC", "NFKC", "NFD", "NFKD")

# chars a cp1252/latin-1 mis-decode of any UTF-8 multi-byte sequence
# MUST contain (the decoded image of lead bytes 0xC2-0xF4); legit
# accented text also lands here, but then the strict roundtrip below
# rejects it — the prefilter only bounds how many rows attempt it
_MOJIBAKE_MARKER = re.compile("[Â-ô]")

# C0 controls minus \t\n\r\f, DEL, C1 controls — the class every
# tokenizer/regex stage downstream assumes absent; spelled with
# explicit \xNN escapes so the Java-regex (Spark) and RE2 (DuckDB)
# twins match the identical set
_CONTROL_CLASS = r"[\x00-\x08\x0b\x0e-\x1f\x7f-\x9f]"


def unicode_normalize(
    df: DataFrame, text_col: str, form: str = "NFC", out_col: str | None = None
) -> DataFrame:
    """Replace ``text_col`` (or add ``out_col``) with its Unicode
    ``form`` normalization.  NULL rows stay NULL; all other columns
    pass through untouched.  One shuffle-free Arrow pass."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")

    @F.pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.str.normalize(form)

    return df.withColumn(out_col or text_col, _norm(F.col(text_col)))


def _repair_one(s: str, max_rounds: int) -> tuple[str, bool]:
    fixed = False
    for _ in range(max_rounds):
        if not _MOJIBAKE_MARKER.search(s):
            break
        cand = None
        for enc in ("cp1252", "latin-1"):
            try:
                cand = s.encode(enc).decode("utf-8")
                break
            except (UnicodeEncodeError, UnicodeDecodeError):
                continue
        if cand is None or cand == s:
            break
        s, fixed = cand, True
    return s, fixed


def fix_mojibake(
    df: DataFrame,
    text_col: str,
    out_col: str | None = None,
    flag_col: str = "mojibake_fixed",
    max_rounds: int = 3,
    normalize_form: str | None = None,
) -> DataFrame:
    """Undo UTF-8-decoded-as-cp1252/latin-1 damage ("cafÃ©" → "café"),
    including doubly-encoded text (one extra round per layer, capped at
    ``max_rounds``).  Only whole-string strict roundtrips rewrite;
    everything else — legit accented text, CJK, NULLs — passes through
    byte-identical with ``flag_col`` false.  One shuffle-free Arrow
    pass; the marker scan keeps the per-row repair off clean rows.

    ``normalize_form`` additionally Unicode-normalizes the repaired
    series inside the SAME Arrow pass (``Series.str.normalize``, C
    codec work) — ``clean_text`` uses this so repair + normalization
    cost one JVM↔Python round-trip, not two."""
    if max_rounds < 1:
        raise ValueError("max_rounds must be >= 1")
    if normalize_form is not None and normalize_form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {normalize_form!r}")

    @F.pandas_udf("struct<t:string,f:boolean>")
    def _fix(s: pd.Series) -> pd.DataFrame:
        texts, flags = [], []
        # vectorized prefilter: rows without a marker char can't be a
        # cp1252/latin-1 mis-decode — skip the per-row roundtrip
        suspect = s.str.contains(_MOJIBAKE_MARKER, regex=True, na=False)
        for t, sus in zip(s, suspect):
            if t is None or not sus:
                texts.append(t)
                flags.append(None if t is None else False)
                continue
            r, f = _repair_one(t, max_rounds)
            texts.append(r)
            flags.append(f)
        out = pd.Series(texts, dtype="object")
        if normalize_form is not None:
            out = out.str.normalize(normalize_form)
        return pd.DataFrame({"t": out, "f": flags})

    return (
        df.withColumn("_tn_st", _fix(F.col(text_col)))
        .withColumn(out_col or text_col, F.col("_tn_st.t"))
        .withColumn(flag_col, F.col("_tn_st.f"))
        .drop("_tn_st")
    )


def strip_control_chars(text: Column) -> Column:
    """Drop C0/C1 control characters and DEL, keeping ``\\t \\n \\r
    \\f``.  Pure Column expression (whole-stage codegen, zero Python);
    the class is spelled byte-explicitly so the Spark and DuckDB sides
    agree character-for-character."""
    return F.regexp_replace(text, _CONTROL_CLASS, "")


def strip_control_chars_sql(expr: str) -> str:
    """Exact DuckDB twin of :func:`strip_control_chars`."""
    return f"regexp_replace({expr}, '{_CONTROL_CLASS}', '', 'g')"


def clean_text(
    df: DataFrame,
    text_col: str,
    form: str = "NFC",
    fix_encoding: bool = True,
    flag_col: str = "mojibake_fixed",
) -> DataFrame:
    """The standard pre-dedup cleanup pipeline, in the only order that
    is correct: mojibake repair FIRST (normalization can destroy the
    byte patterns repair needs), then Unicode normalization, then
    control-char stripping.  In-place on ``text_col``; adds
    ``flag_col`` when ``fix_encoding``.  Still one shuffle-free pass —
    all three stages fuse into a single projection, and repair +
    normalization share ONE Arrow round-trip (the normalize runs on the
    repaired series inside the same pandas UDF)."""
    if fix_encoding:
        out = fix_mojibake(df, text_col, flag_col=flag_col, normalize_form=form)
    else:
        out = unicode_normalize(df, text_col, form=form)
    return out.withColumn(text_col, strip_control_chars(F.col(text_col)))
