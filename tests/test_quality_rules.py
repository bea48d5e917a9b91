"""Gopher rule battery: exact parity vs a Python reference on docs
violating each rule individually, totality, plan shape, real corpus."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from lsd2_spark.functions.numeric import round6_np
from lsd2_spark.operators.quality_rules import GOPHER_STOPWORDS, gopher_quality_flags

from tests.conftest import SF_DIR

WS = r"[ \t\n\r\f]+"
WS_CHARS = " \t\n\r\f"

P = dict(
    min_words=50, max_words=100_000, min_mean_word_len=3.0,
    max_mean_word_len=10.0, max_symbol_word_ratio=0.1,
    max_bullet_line_frac=0.9, max_ellipsis_line_frac=0.3,
    min_alpha_word_frac=0.8, min_stop_words=2,
)


def _ref(text: str | None) -> dict:
    out = dict.fromkeys(
        ["n_words", "mean_word_len", "hash_word_ratio", "ellipsis_word_ratio",
         "bullet_line_frac", "ellipsis_line_frac", "alpha_word_frac",
         "n_stop_words"], None)
    flags = dict.fromkeys(
        ["words_ok", "word_len_ok", "symbol_ok", "bullet_ok", "ellipsis_ok",
         "alpha_ok", "stop_ok"], False)
    if text is None:
        return {**out, **flags, "gopher_pass": False}
    toks = [t for t in re.split(WS, text) if t]
    stops = len({t.lower() for t in toks} & set(GOPHER_STOPWORDS))
    out["n_words"], out["n_stop_words"] = len(toks), stops
    if not toks:
        return {**out, **flags, "gopher_pass": False}
    n = len(toks)
    mean = len(re.sub(WS, "", text)) / n
    hashr = len(re.findall(r"#", text)) / n
    ellr = (len(re.findall(r"\.\.\.", text)) + len(re.findall("…", text))) / n
    lines = [l for l in text.split("\n") if l.strip(WS_CHARS)]
    bullet = (sum(1 for l in lines if l.strip(WS_CHARS)[0] in "-*•") / len(lines)
              if lines else None)
    ell = (sum(1 for l in lines
               if l.strip(WS_CHARS).endswith(("...", "…"))) / len(lines)
           if lines else None)
    alpha = sum(1 for t in toks if re.search("[A-Za-z]", t)) / n
    flags = {
        "words_ok": P["min_words"] <= n <= P["max_words"],
        "word_len_ok": P["min_mean_word_len"] <= mean <= P["max_mean_word_len"],
        "symbol_ok": (hashr <= P["max_symbol_word_ratio"]
                      and ellr <= P["max_symbol_word_ratio"]),
        "bullet_ok": bullet is not None and bullet <= P["max_bullet_line_frac"],
        "ellipsis_ok": ell is not None and ell <= P["max_ellipsis_line_frac"],
        "alpha_ok": alpha >= P["min_alpha_word_frac"],
        "stop_ok": stops >= P["min_stop_words"],
    }
    r6 = lambda x: None if x is None else float(round6_np(x))
    return {
        "n_words": n, "mean_word_len": r6(mean), "hash_word_ratio": r6(hashr),
        "ellipsis_word_ratio": r6(ellr),
        "bullet_line_frac": r6(bullet), "ellipsis_line_frac": r6(ell),
        "alpha_word_frac": r6(alpha), "n_stop_words": stops,
        **flags, "gopher_pass": all(flags.values()),
    }


_GOOD = ("the quick brown fox jumps over that lazy dog and runs off to find "
         "some food with great energy because it must have been hungry for "
         "hours while waiting near the old barn door watching birds of many "
         "colors fly past the open field toward distant hills beyond town today")

DOCS = {
    1: _GOOD,                                     # passes everything
    2: "the of and that short",                   # too few words
    3: " ".join(["extraordinarily"] * 60) + " the of",   # words too long
    4: " ".join(["of", "to"] * 30),               # words too short (len 2)
    5: _GOOD + " " + "# " * 20,                   # symbol-heavy
    6: "\n".join(["- " + _GOOD[:40]] * 10) + "\nthe of and that have with "
       + _GOOD,                                   # mostly bullet lines
    7: "\n".join([_GOOD[:40] + " ..."] * 10) + "\n" + _GOOD,  # ellipsis lines
    8: " ".join(["1234"] * 60) + " the of",       # non-alphabetic words
    9: " ".join(["giraffe"] * 60),                # no stop words
    10: "",                                       # empty
    11: "   \t  \n ",                             # whitespace only
    12: None,                                     # null
    13: "…" + _GOOD + " … okay…",                 # unicode ellipsis counted
    # 0.07 hash + 0.07 ellipsis: passes the paper's PER-SYMBOL rule,
    # would fail a pooled 0.1 cutoff — guards against re-pooling
    14: _GOOD + " " + "... " * 4 + "# " * 4,
}


@pytest.fixture(scope="module")
def flags_df(spark):
    df = spark.createDataFrame(
        [(k, v) for k, v in DOCS.items()], "doc_id long, text string"
    )
    return gopher_quality_flags(df, "text", "doc_id")


def test_matches_reference(flags_df):
    rows = {r["doc_id"]: r.asDict() for r in flags_df.collect()}
    assert set(rows) == set(DOCS)
    for d, text in DOCS.items():
        want = _ref(text)
        got = rows[d]
        for k, v in want.items():
            g = got[k]
            if isinstance(v, float):
                assert g is not None and abs(g - v) < 1e-12, (d, k, g, v)
            else:
                assert g == v, (d, k, g, v)


def test_each_planted_doc_fails_its_rule(flags_df):
    rows = {r["doc_id"]: r for r in flags_df.collect()}
    assert rows[1]["gopher_pass"] is True
    fail_rule = {2: "words_ok", 3: "word_len_ok", 4: "word_len_ok",
                 5: "symbol_ok", 6: "bullet_ok", 7: "ellipsis_ok",
                 8: "alpha_ok", 9: "stop_ok"}
    for d, rule in fail_rule.items():
        assert rows[d][rule] is False, (d, rule)
        assert rows[d]["gopher_pass"] is False, d
    for d in (10, 11, 12):  # degenerate docs: all flags false, total
        assert rows[d]["gopher_pass"] is False
        assert rows[d]["mean_word_len"] is None
    # per-symbol rule: 0.07 hash + 0.07 ellipsis passes (pooled would fail)
    assert rows[14]["symbol_ok"] is True and rows[14]["gopher_pass"] is True


def test_plan_is_projection_only(spark):
    df = spark.createDataFrame([(1, _GOOD)], "doc_id long, text string")
    plan = gopher_quality_flags(df, "text", "doc_id")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffle


def test_real_corpus(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = gopher_quality_flags(docs, "text", "doc_id")
    assert out.count() == docs.count()
    agg = out.agg(
        F.sum(F.col("gopher_pass").cast("int")).alias("n_pass"),
        F.sum(F.col("stop_ok").cast("int")).alias("n_stop_ok"),
    ).collect()[0]
    # synthetic corpus: rule battery runs and evaluates real text
    assert agg["n_stop_ok"] >= 0 and agg["n_pass"] >= 0
