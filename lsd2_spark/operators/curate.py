"""Batch corpus curation: the end-to-end training-data funnel, composed
from the package's stage operators with the minimal shuffle count.

This is the batch twin of :mod:`lsd2_spark.streaming.corpus` and the
pipeline shape of the public curation recipes (Gopher/MassiveWeb rule
battery, RefinedWeb/FineWeb funnels, Dolma): clean -> row-local quality
and language gates -> exact dedup -> fuzzy dedup -> decontamination.

The composition, not the stages, is the point — the stages all exist as
standalone operators; what a 100 TB run needs is the FUNNEL ordering and
a verdict layout that keeps the expensive work off the rows cheap checks
already killed:

1. **All row-local verdicts fuse into one projection.** clean_text's
   single Arrow pass, the Gopher flag battery (via its ``keep=``
   passthrough), the quality score, and marker lang-ID are each pure
   column expressions over the cleaned text, so stage A is ONE
   exchange-free pass (plan-asserted in tests/test_curate.py).
2. **Shuffle stages see survivors only.** Exact dedup (one shuffle on
   the content hash), fuzzy dedup (banded LSH shuffles + CC fixpoint),
   and decontamination (broadcast eval n-grams, no extra shuffle) run
   over rows that passed the row-local gates — on a raw crawl the cheap
   gates drop 30-60% of rows before anything is exchanged.
3. **First-failure attribution.** Every document gets ONE ``drop_stage``
   label (the first stage of ``lang quality exact_dup fuzzy_dup
   contaminated`` that killed it, null if kept), so the funnel report is
   a single aggregation over the tagged frame — no per-stage count jobs.

``curate_corpus`` returns the TAGGED frame (every input row, its cleaned
text, per-stage verdict columns, ``drop_stage``, ``kept``); callers
``filter("kept")`` for the curated corpus and feed the same frame to
:func:`curation_report` for the funnel.  Keeping rejects tagged rather
than dropped is deliberate: real curation runs audit their rejects.

Duplicate policy: exact dedup keeps the minimum id per content hash;
fuzzy dedup keeps the HIGHEST-quality cluster member (ties -> smaller
id) via ``dedup_clusters(score_col=...)`` — the keep-best policy, using
the quality score the funnel already computed.  A document that fails a
LATER stage still counts as the exact/fuzzy canonical for its duplicate
group (duplicates of a contaminated canonical are dropped as
duplicates, their canonical as contaminated — matching the streaming
twin's reject-everything-matched semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["curate_corpus", "curation_report", "FUNNEL_STAGES"]

FUNNEL_STAGES = ["lang", "quality", "exact_dup", "fuzzy_dup", "contaminated"]


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    eval_df: DataFrame | None = None,
    languages: tuple[str, ...] = ("en",),
    min_words: int = 10,
    fuzzy_min_jaccard: float = 0.9,
    bands: int = 4,
    decontam_n: int = 5,
    decontam_hashed: bool = False,
    fix_encoding: bool = True,
    lineage_cut: str | None = None,
    stats: dict | None = None,
    **gopher_kwargs,
) -> DataFrame:
    """Tag every document with the full curation funnel's verdicts.

    Returns one row per input row: ``id_col``, the cleaned ``text_col``,
    ``mojibake_fixed``, the Gopher metrics/flags, ``quality`` (+ its
    components), ``lang_pred``, per-stage booleans (``quality_pass``,
    ``lang_pass``, ``exact_canonical``, ``fuzzy_canonical``,
    ``decontam_pass`` — null where an earlier stage already dropped the
    row), ``drop_stage`` (first failing stage, null if kept) and
    ``kept``.

    ``languages`` gates on the marker lang-ID (``()`` disables it);
    ``eval_df`` enables decontamination (word n-gram hits against its
    ``text_col``); ``min_words`` overrides the Gopher word floor (the
    paper's 50 suits web pages, too harsh for short-form corpora), and
    any other :func:`gopher_quality_flags` threshold passes through as
    a keyword (e.g. ``min_stop_words=1`` for corpora whose register
    rarely uses the full stopword battery).

    Scale: one fused projection for every row-local verdict, then one
    content-hash shuffle + the banded LSH shuffles + a broadcast
    decontam join, all over row-local survivors only.  Nothing is
    collected on the driver.

    ``lineage_cut`` picks how the survivor slice (and the fuzzy CC
    fixpoint) materialize: the ``"auto"`` default resolves to
    ``"reliable"`` whenever the session has a checkpoint dir and
    ``"local"`` otherwise; ``"local"`` (localCheckpoint,
    fastest, executor-loss-FATAL on preemptible clusters),
    ``"reliable"`` (``.checkpoint()`` into the job's checkpoint dir —
    survives executor loss; call ``setCheckpointDir`` first), or
    ``"persist"`` (MEMORY_AND_DISK cache for the survivor slice —
    keeps lineage so lost blocks recompute; the CC fixpoint still
    needs a true cut and runs its rounds on localCheckpoint).  Or set
    the session conf (:data:`~lsd2_spark.operators.common.
    CONF_LINEAGE_CUT`) once per job.

    ``stats``, if given, receives the fuzzy-dedup fixpoint's
    ``cc_rounds``/``cc_converged`` — log it in production so an
    approaching round cap is visible before it warns.
    """
    from lsd2_spark.operators.common import spread_partitions
    from lsd2_spark.operators.dedup import dedup_clusters
    from lsd2_spark.operators.quality_rules import gopher_quality_flags
    from lsd2_spark.operators.text_analysis import _lang_cols, _quality_cols
    from lsd2_spark.operators.text_normalize import clean_text

    # --- stage A: every row-local verdict in one fused projection ----
    # spread first: a small single-file corpus arrives as ONE partition
    # and the whole fused Arrow battery would run single-threaded
    # (measured 19.4 -> 12.9 s warm at sf0.1); a no-op at scale, where
    # the input already has many partitions
    cleaned = clean_text(
        spread_partitions(docs), text_col, fix_encoding=fix_encoding
    )
    if not fix_encoding:
        cleaned = cleaned.withColumn("mojibake_fixed", F.lit(False))
    tagged = gopher_quality_flags(
        cleaned,
        text_col,
        id_col,
        min_words=min_words,
        keep=[text_col, "mojibake_fixed"],
        **gopher_kwargs,
    ).select("*", *_quality_cols(text_col), *_lang_cols(text_col))
    tagged = tagged.withColumn(
        "lang_pass",
        F.col("lang_pred").isin(*languages) if languages else F.lit(True),
    ).withColumn("quality_pass", F.col("gopher_pass"))

    # Materialize the TAGGED frame once.  The funnel's stages assemble
    # as four independent join branches PLUS the final assembly, and
    # Spark does not dedupe common subplans across branches —
    # unmaterialized, the whole stage-A Arrow pass re-executes per
    # consumer (round 12 cut only the survivor slice, which still left
    # the final assembly re-running the battery over every row —
    # observed as a second clean_text+rules pass in the q74 plan).  At
    # scale this is the standard iterative-pipeline trade: storage for
    # the tagged corpus vs recomputing the row-local battery per
    # branch — and the STORAGE KIND is the cluster-robustness knob:
    # lineage_cut="persist" keeps lineage (lost executors recompute)
    # and "reliable" checkpoints to the job store, either one removing
    # the localCheckpoint executor-loss hazard on preemptible clusters
    # (ADVICE r10).
    from lsd2_spark.operators.common import cut_lineage

    tagged = cut_lineage(
        tagged, mode=lineage_cut, eager=False, allow_persist=True
    )
    # the survivor slice is now a cheap filter+project over the
    # materialized frame — no second materialization needed
    survivors = tagged.filter(
        F.col("quality_pass") & F.col("lang_pass")
    ).select(id_col, text_col, "quality")

    # --- stage B: exact dedup — ONE shuffle on the content hash ------
    # The annotation is consumed by the final assembly AND by the
    # exact-survivor slice that stages C/D re-derive several times;
    # cut the (id, flag) frame so the content-hash window runs once.
    from lsd2_spark.operators.dedup import exact_dedup

    exact_flag = cut_lineage(
        exact_dedup(survivors, text_col, id_col).select(
            id_col, (F.col("is_canonical") == 1).alias("exact_canonical")
        ),
        mode=lineage_cut,
        eager=False,
        allow_persist=True,
    )

    # --- stage C: fuzzy dedup over exact survivors, keep-best-quality
    exact_survivors = survivors.join(
        exact_flag.filter("exact_canonical").select(id_col), id_col
    )
    cc_stats: dict = {}
    fuzzy = dedup_clusters(
        exact_survivors,
        text_col,
        id_col,
        min_jaccard=fuzzy_min_jaccard,
        bands=bands,
        score_col="quality",
        # the CC fixpoint needs a TRUE plan cut; persist isn't one
        lineage_cut=None if lineage_cut == "persist" else lineage_cut,
        stats=cc_stats,
    ).select(id_col, (F.col("is_canonical") == 1).alias("fuzzy_canonical"))
    if stats is not None:
        stats["cc_rounds"] = cc_stats.get("rounds")
        stats["cc_converged"] = cc_stats.get("converged")

    # --- stage D: decontamination over fuzzy survivors (broadcast) ---
    if eval_df is not None:
        from lsd2_spark.operators.decontam import decontaminate

        fuzzy_survivors = exact_survivors.join(
            fuzzy.filter("fuzzy_canonical").select(id_col), id_col
        )
        dec = decontaminate(
            fuzzy_survivors,
            eval_df,
            text_col,
            id_col,
            n=decontam_n,
            hashed=decontam_hashed,
        ).select(id_col, (~F.col("contaminated")).alias("decontam_pass"))
    else:
        dec = None

    # --- assemble: left joins keep every input row tagged -------------
    out = tagged.join(exact_flag, id_col, "left").join(fuzzy, id_col, "left")
    if dec is not None:
        out = out.join(dec, id_col, "left")
    else:
        out = out.withColumn("decontam_pass", F.lit(None).cast("boolean"))

    # lang gates BEFORE quality: the Gopher stopword/alpha rules are
    # English-specific, so attributing a non-English doc to "quality"
    # would misread the funnel (RefinedWeb/FineWeb run lang-ID first)
    drop_stage = (
        F.when(~F.col("lang_pass"), "lang")
        .when(~F.col("quality_pass"), "quality")
        .when(~F.col("exact_canonical"), "exact_dup")
        .when(~F.col("fuzzy_canonical"), "fuzzy_dup")
        .when(~F.coalesce(F.col("decontam_pass"), F.lit(True)), "contaminated")
    )
    return out.withColumn("drop_stage", drop_stage).withColumn(
        "kept", drop_stage.isNull()
    )


def curation_report(tagged: DataFrame) -> DataFrame:
    """Funnel report from a :func:`curate_corpus` frame in ONE
    aggregation: per stage (funnel order) the documents dropped there,
    plus a ``kept`` row — first-failure attribution, so ``sum(docs)``
    equals the input row count.  Stages that dropped nothing appear
    with ``docs = 0`` (the six-row shape is stable, so downstream
    monitoring can diff reports across runs)."""
    counts = tagged.groupBy(
        F.coalesce(F.col("drop_stage"), F.lit("kept")).alias("stage")
    ).agg(F.count("*").alias("docs"))
    stages = tagged.sparkSession.createDataFrame(
        [(s, i) for i, s in enumerate(FUNNEL_STAGES + ["kept"])],
        "stage string, _ord int",
    )
    return (
        stages.join(counts, "stage", "left")
        .select("stage", F.coalesce("docs", F.lit(0)).alias("docs"), "_ord")
        .orderBy("_ord")
        .drop("_ord")
    )
