"""Physical-plan assertions for the relational query surface: the
declarative forms must actually reach the optimizations they were
written for — predicate/projection pushdown into the parquet scan,
broadcast joins for dims, whole-stage codegen on the hot path.  (The
catalog-side plan assertions live in test_catalog.py.)"""

from __future__ import annotations

from lsd2_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = all_queries()[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q01_pushes_date_filter_and_prunes_columns(spark):
    plan = _plan(spark, "q01_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # projection pruning: the scan's ReadSchema must not include columns
    # q01 never touches
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_partkey" not in read and "l_suppkey" not in read


def test_q05_broadcasts_dimension_tables(spark):
    plan = _plan(spark, "q05_supplier_volume")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan or plan.count("BroadcastHashJoin") >= 2


def test_q09_plans_anti_and_semi_join(spark):
    # the merged row must still execute BOTH native join strategies —
    # a rewrite to boolean-exists aggregation would pass the oracle but
    # stop exercising the operators the row certifies
    plan = _plan(spark, "q09_semi_anti")
    assert "LeftAnti" in plan
    assert "LeftSemi" in plan


def test_q01_runs_in_whole_stage_codegen(spark):
    df = all_queries()["q01_pricing_summary"](spark, SF_DIR)
    df.collect()  # AQE finalizes THIS plan only on its own execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # "*(n)" marks a WholeStageCodegen stage in the final-plan rendering
    assert "*(" in plan


def test_media_queries_prune_scan_to_needed_columns(spark):
    """The blob builders must not drag unused document columns through
    the decode kernels: the parquet scan reads only doc_id + text."""
    for name in ("q53_ppm_pixel_features", "q54_wav_audio_features",
                 "q56_frame_sample"):
        plan = _plan(spark, name)
        read = plan.split("ReadSchema:")[1].splitlines()[0]
        assert "text" in read and "doc_id" in read, (name, read)
        assert "source" not in read and "lang" not in read, (name, read)


def test_sketch_and_sample_queries_prune_scans(spark):
    """q57 reads only (event_type, user_id) from events; q58 reads only
    (doc_id, source, text) from documents."""
    plan = _plan(spark, "q57_kmv_distinct")
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "event_type" in read and "user_id" in read
    # the merged row (former q13 half) also needs `value` for min/max;
    # everything else stays pruned
    assert "props" not in read and "ts" not in read, read

    plan = _plan(spark, "q58_weighted_sample")
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read and "text" in read and "source" in read
    assert "lang" not in read, read


def test_per_stratum_topk_gets_window_group_limit(spark):
    """cap_per_stratum and stratified weighted_sample depend on Spark's
    rank-limit pushdown (WindowGroupLimit) to avoid fully sorting a
    mega-stratum — the exact skew corpus quotas exist for.  Assert the
    rewrite actually fires, with a map-side (Partial) phase, on a
    hot-stratum fixture where ONE source holds 50% of all rows."""
    import numpy as np
    import pandas as pd

    from lsd2_spark.operators.sampling import cap_per_stratum, weighted_sample

    n = 20_000
    src = np.where(
        np.arange(n) % 2 == 0, "hot", np.char.add("s", (np.arange(n) % 7).astype(str))
    )
    pdf = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": src,
        "w": np.linspace(0.1, 1.0, n),
    })
    df = spark.createDataFrame(pdf)

    capped = cap_per_stratum(df, "doc_id", "source", 100)
    out = capped.groupBy("source").count().toPandas()
    assert (out["count"] <= 100).all()
    assert out.loc[out["source"] == "hot", "count"].iloc[0] == 100
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    # the Partial phase is the map-side top-k that keeps the hot
    # stratum from funneling 10k rows into one sort
    assert "Partial" in plan.split("WindowGroupLimit", 1)[1] or plan.count(
        "WindowGroupLimit"
    ) >= 2

    ws = weighted_sample(df, "doc_id", "w", 50, strata_col="source")
    got = ws.groupBy("source").count().toPandas()
    assert (got["count"] <= 50).all()
    plan = ws._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert plan.count("WindowGroupLimit") >= 2  # Partial + Final


def test_curation_queries_prune_scans(spark):
    """q30 (dedup variants) reads only (doc_id, text); q58's cap half
    (the merged former q60) still never reads text for its quota scan
    — the union's two branches prune independently."""
    plan = _plan(spark, "q30_dedup_variants")
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read and "text" in read
    assert "source" not in read and "lang" not in read, read

    plan = _plan(spark, "q58_weighted_sample")
    reads = [
        part.splitlines()[0] for part in plan.split("ReadSchema:")[1:]
    ]
    # one branch (A-Res) needs text for the weight; the cap branch
    # must scan only (doc_id, source)
    assert any(
        "doc_id" in r and "source" in r and "text" not in r for r in reads
    ), reads


def test_round9_gate_query_plan_shapes(spark):
    """The q67-q70 plans must keep their audited shapes: no cartesian
    or nested-loop joins anywhere; q70 is ONE Arrow projection with
    zero exchanges (clean_text is a fused shuffle-free pass); q68's
    ratio table joins broadcast (the model is plan-sized by
    construction)."""
    from lsd2_spark.queries import all_queries

    qs = all_queries()
    sf = "/root/testdata/sf0.001"
    plans = {}
    for name in (
        "q67_line_dedup",
        "q68_dsir_score",
        "q69_fuzzy_decontam",
        "q70_clean_text",
    ):
        df = qs[name](spark, sf)
        df.collect()
        plans[name] = df._jdf.queryExecution().executedPlan().toString()
    for name, plan in plans.items():
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    assert "Exchange" not in plans["q70_clean_text"]
    assert plans["q70_clean_text"].count("ArrowEvalPython") == 1
    assert "BroadcastHashJoin" in plans["q68_dsir_score"]
    assert "BroadcastHashJoin" in plans["q69_fuzzy_decontam"]


def test_q32_headline_has_no_unrestricted_shared_gram_join(spark):
    """The certified near-dup composition must be LSH-proposes /
    exact-verifies: the exact half's shared counts come from a
    candidate-driven array_intersect, never from the shared-gram
    self-join (whose within-group volume is quadratic at scale).  Any
    join keyed on the gram column without an id in its keys is the
    banned shape."""
    df = all_queries()["q32_neardup_pairs"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Join" in line and "ng#" in line:
            assert "id1#" in line or "id2#" in line or "doc_id#" in line, line
    assert "array_intersect" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_round10_gate_query_plan_shapes(spark):
    """q71-q73 keep their audited shapes: q71 is a pure JVM
    regexp/concat projection (zero Python, zero exchanges); q72's
    corpus stats attach via a 1-row broadcast and top-k plans as
    TakeOrdered (never a global sort); q73's model tables join
    broadcast.  No cartesian products anywhere."""
    qs = all_queries()
    plans = {}
    for name in ("q71_html_text", "q72_bm25_topk", "q73_lm_score"):
        df = qs[name](spark, SF_DIR)
        df.collect()
        plans[name] = df._jdf.queryExecution().executedPlan().toString()
    for name, plan in plans.items():
        assert "CartesianProduct" not in plan, name
    # q71: html build + extraction is one codegen'd projection
    assert "Exchange" not in plans["q71_html_text"]
    assert "ArrowEvalPython" not in plans["q71_html_text"]
    assert "BatchEvalPython" not in plans["q71_html_text"]
    # q72: broadcast joins only; the single nested-loop join is the
    # 1-row stats attachment; top-k is TakeOrdered
    assert "TakeOrderedAndProject" in plans["q72_bm25_topk"]
    assert "SortMergeJoin" not in plans["q72_bm25_topk"]
    assert "BroadcastHashJoin" in plans["q72_bm25_topk"]
    # q73: both LM model tables reach the scorer as broadcasts (the
    # trainers' 1-row scalar attachments are the only nested-loop joins
    # and are broadcast-side, never a CartesianProduct)
    assert plans["q73_lm_score"].count("BroadcastHashJoin") >= 2


def test_q74_funnel_plan_shape(spark):
    """The funnel gate keeps the composition's audited scale shape: no
    cartesian products or nested-loop joins anywhere (the fuzzy stage
    is the banded LSH equi-join, decontam is a broadcast-able n-gram
    equi-join), and no row-at-a-time Python (the only Python is
    clean_text's single fused Arrow pass per branch)."""
    df = all_queries()["q74_curation_funnel"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
