"""End-to-end batch curation funnel (operators/curate.py): planted
corpus where every stage has a known victim, verdicts checked
row-by-row, the funnel report checked against first-failure
attribution, and the stage-A plan checked exchange-free."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from lsd2_spark.operators.curate import (
    FUNNEL_STAGES,
    curate_corpus,
    curation_report,
)

# a solid English paragraph: >10 words, several gopher stopwords,
# alphabetic, mean word length in band
GOOD = (
    "the quick brown fox likes to run with the lazy dog and "
    "that habit seems to have made both of them quite happy together"
)
# near-duplicate of GOOD (one word changed) — fuzzy victim
NEAR = GOOD.replace("quite happy", "very happy")
# a lower-quality near-duplicate should LOSE keep-best to GOOD's doc

DOCS = [
    # (doc_id, text, expected drop_stage or None)
    (1, GOOD, None),
    (2, GOOD, "exact_dup"),  # exact copy, higher id loses
    (3, NEAR, "fuzzy_dup"),  # near-dup, same quality tier, higher id loses
    (4, "the cat is small", "quality"),  # English but < min_words
    (
        5,
        "el perro grande de la casa es que la vida de todos es muy "
        "buena y el tiempo de la manana es mejor que el de la noche",
        "lang",
    ),
    (
        6,
        "the secret eval answer is to mix copper and tin into bronze "
        "alloys that have been known to work with ancient forges well",
        "contaminated",
    ),
]

EVAL = ["the secret eval answer is to mix copper and tin"]


@pytest.fixture(scope="module")
def tagged(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in DOCS], "doc_id long, text string"
    )
    ev = spark.createDataFrame([(t,) for t in EVAL], "text string")
    out = curate_corpus(docs, eval_df=ev, min_words=10, fuzzy_min_jaccard=0.5)
    out.persist().count()
    yield out
    out.unpersist()


def test_verdicts_row_by_row(tagged):
    got = {r["doc_id"]: r["drop_stage"] for r in tagged.collect()}
    assert got == {i: s for i, _, s in DOCS}


def test_kept_is_drop_stage_null(tagged):
    rows = tagged.collect()
    for r in rows:
        assert r["kept"] == (r["drop_stage"] is None)
    assert {r["doc_id"] for r in rows if r["kept"]} == {1}


def test_later_stage_flags_null_for_earlier_victims(tagged):
    by_id = {r["doc_id"]: r for r in tagged.collect()}
    # the quality victim never reaches dedup or decontam
    assert by_id[4]["exact_canonical"] is None
    assert by_id[4]["fuzzy_canonical"] is None
    assert by_id[4]["decontam_pass"] is None
    # the exact-dup loser never reaches fuzzy
    assert by_id[2]["exact_canonical"] is False
    assert by_id[2]["fuzzy_canonical"] is None


def test_funnel_report_first_failure_attribution(tagged):
    rep = {r["stage"]: r["docs"] for r in curation_report(tagged).collect()}
    assert rep == {
        "lang": 1,
        "quality": 1,
        "exact_dup": 1,
        "fuzzy_dup": 1,
        "contaminated": 1,
        "kept": 1,
    }
    assert sum(rep.values()) == len(DOCS)
    # report rows come back in funnel order
    order = [r["stage"] for r in curation_report(tagged).collect()]
    assert order == FUNNEL_STAGES + ["kept"]


def test_keep_best_quality_wins_fuzzy_cluster(spark):
    """With score_col wired, the higher-quality member survives even
    when it has the HIGHER id (min-id would pick the other)."""
    # doc 8 repeats a word (lower lexical diversity -> lower quality)
    degraded = GOOD + " fox fox fox fox fox fox fox fox fox fox"
    docs = spark.createDataFrame(
        [(7, degraded), (8, GOOD)], "doc_id long, text string"
    )
    stats: dict = {}
    out = curate_corpus(
        docs, min_words=10, fuzzy_min_jaccard=0.5, stats=stats
    )
    got = {r["doc_id"]: r["drop_stage"] for r in out.collect()}
    assert got == {7: "fuzzy_dup", 8: None}
    # the observability passthrough reaches the fuzzy CC fixpoint
    assert stats["cc_converged"] and stats["cc_rounds"] >= 1


def test_no_eval_df_disables_decontam(spark):
    docs = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    out = curate_corpus(docs, min_words=10)
    row = out.collect()[0]
    assert row["kept"] and row["decontam_pass"] is None


def test_languages_empty_disables_lang_gate(spark):
    """With the gate off, the Spanish doc is no longer attributed to
    ``lang`` — it falls through to the (English-specific) Gopher
    stopword rule, the documented behavior of disabling lang-ID
    without retuning the quality battery."""
    docs = spark.createDataFrame(
        [(5, DOCS[4][1])], "doc_id long, text string"
    )
    out = curate_corpus(docs, languages=(), min_words=10)
    row = out.collect()[0]
    assert row["lang_pass"] is True
    assert row["drop_stage"] == "quality"
    assert row["stop_ok"] is False  # the rule that actually fired


def test_stage_a_is_one_exchange_free_projection(spark):
    """Every row-local verdict (clean + gopher + quality + lang) must
    fuse into a single shuffle-free pass: filtering the tagged columns
    before any dedup join plans with zero Exchange and one
    ArrowEvalPython (clean_text's fused repair+normalize)."""
    from lsd2_spark.operators.quality_rules import gopher_quality_flags
    from lsd2_spark.operators.text_analysis import _lang_cols, _quality_cols
    from lsd2_spark.operators.text_normalize import clean_text

    docs = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    cleaned = clean_text(docs, "text")
    stage_a = gopher_quality_flags(
        cleaned, "text", "doc_id", min_words=10, keep=["text", "mojibake_fixed"]
    ).select("*", *_quality_cols("text"), *_lang_cols("text"))
    plan = stage_a._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan


def test_curated_plan_has_no_cartesian(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in DOCS], "doc_id long, text string"
    )
    ev = spark.createDataFrame([(t,) for t in EVAL], "text string")
    out = curate_corpus(docs, eval_df=ev, min_words=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_gopher_keep_passthrough_matches_default(spark):
    """keep= must only APPEND columns — the flag battery itself is
    byte-identical to the default projection."""
    from lsd2_spark.operators.quality_rules import gopher_quality_flags

    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in DOCS], "doc_id long, text string"
    )
    base = gopher_quality_flags(docs, "text", "doc_id")
    kept = gopher_quality_flags(docs, "text", "doc_id", keep=["text"])
    assert kept.columns == base.columns + ["text"]
    assert (
        kept.select(base.columns).exceptAll(base).count() == 0
        and base.exceptAll(kept.select(base.columns)).count() == 0
    )
