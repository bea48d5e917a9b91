"""End-to-end training-data pipeline over the ``documents`` table —
the LLM-ops operators composed the way a real corpus build would chain
them.  Run directly (``python examples/training_pipeline.py [sf_dir]``)
or through the test suite.

Stages (each one scan/shuffle-bounded; no driver row materialization):

0. boilerplate strip — optional CCNet-style corpus-level line dedup
                       (line_dedup): lines occurring in >= N distinct
                       docs removed BEFORE any scoring, so shared
                       banners/footers neither deflate quality scores
                       nor glue unrelated pages into near-dup clusters
1. PII scrub         — email/IP/SSN/phone redaction (before dedup, so
                       documents differing only in PII dedup together);
                       optional token blocklist gate
1b. LM gate          — optional char-trigram LM score vs a reference
                       corpus (perplexity-proxy threshold)
2. quality gate      — heuristic score ≥ cutoff AND Gopher repetition
                       caps (dup-line / top-bigram fractions); the
                       score also picks each near-dup cluster's
                       canonical survivor (keep-best, not min-id);
                       optional FULL Gopher rule battery
                       (quality_rules.gopher_quality_flags)
3. language filter   — n-gram language ID (text_analysis)
4. exact dedup       — md5 canonical rows (dedup)
5. fuzzy dedup       — LSH pairs → connected components → survivors
5b. substring scrub  — optional ExactSubstr-style repeated-span
                       removal (substring_dedup; one window shuffle)
5c. model gate       — optional CCNet-style linear quality classifier
                       (quality_model; pyspark.ml, projection-only
                       scoring)
5d. semantic dedup   — optional SemDeDup pass (semdedup): hashed doc
                       embeddings → k-means space partition → greedy
                       eps-cosine scan inside each cluster; catches
                       paraphrases textual dedup misses
6. decontamination   — drop docs sharing word-5-grams with the
                       held-out eval set (decontam; broadcast join);
                       optionally ALSO fuzzy (shingle-minhash) matches
                       that exact n-grams miss
6b. DSIR selection   — optional importance resampling toward a target
                       corpus (dsir): hashed-ngram log ratios,
                       Gumbel-top-k without replacement
7. source mixing     — deterministic stratified sampling, a
                       p∝n^alpha temperature mixture, or an
                       epoch-capped TOKEN-budget water-fill
                       (plan_token_mixture; docs replicated per epoch)
8. splits            — reproducible train/val/test assignment
9. packing           — concat-and-chunk sequence manifest per source
                       shard (packing; prefix-sum window, no global sort)
10. accounting       — token totals per split (token_stats) +
                       p50/p90/p99 document-length quantiles (sketches)

A multimodal side-branch (``media_features``) shows the image/audio
path: blob table → real decode (PNG/PPM/WAV, pure-NumPy codecs) →
pixel/signal features + thumbnails, all shuffle-free ``mapInPandas``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lsd2_spark.operators import (
    decontam,
    dedup,
    multimodal,
    packing,
    sampling,
    sketches,
    text_analysis,
)


def build_training_corpus(
    spark: SparkSession,
    docs: DataFrame,
    quality_cutoff: int = 40,
    languages: tuple[str, ...] = ("en",),
    min_jaccard: float = 0.9,
    source_fractions: "dict[str, float] | float | str" = 1.0,
    max_dup_line_frac: float = 0.3,
    max_top_bigram_frac: float = 0.2,
    eval_docs: DataFrame | None = None,
    blocklist: "list[str] | None" = None,
    lm_reference: DataFrame | None = None,
    min_avg_logp: float = -6.0,
    scrub_repeated_spans: bool = False,
    min_span_tokens: int = 8,
    quality_model=None,
    min_quality_prob: float = 0.5,
    token_budget: int | None = None,
    mixture_alpha: float = 0.7,
    max_epochs: float = 4.0,
    boilerplate_min_docs: int | None = None,
    semantic_eps: float | None = None,
    semantic_clusters: int = 64,
    dsir_target: DataFrame | None = None,
    dsir_n: int | None = None,
    gopher_rules: bool = False,
    fuzzy_decontam_jaccard: float | None = None,
) -> DataFrame:
    """documents(text, doc_id, source) → (doc_id, text, source, split).

    With ``token_budget`` set, sources are epoch-replicated by the
    water-fill plan: a doc_id can appear multiple times, one row per
    epoch, with an extra ``epoch`` column making (doc_id, epoch)
    unique — by design: that is the training mixture."""
    if boilerplate_min_docs is not None:
        from lsd2_spark.operators import line_dedup

        stripped = line_dedup.remove_frequent_lines(
            docs, "text", "doc_id", min_docs=boilerplate_min_docs
        )
        docs = stripped.drop("text").withColumnRenamed(
            "clean_text", "text"
        ).select(*docs.columns)
    docs = text_analysis.redact_pii(docs, "text").select(*docs.columns)
    if blocklist:
        docs = text_analysis.blocklist_filter(
            docs, "text", "doc_id", blocklist
        ).select(*docs.columns)
    quality = text_analysis.quality_score(docs, "text", "doc_id").select(
        "doc_id", "quality"
    )
    rep = text_analysis.repetition_stats(docs, "text", "doc_id").select(
        "doc_id", "dup_line_frac", "top_bigram_char_frac"
    )
    lang = text_analysis.lang_id(docs, "text", "doc_id").select("doc_id", "lang_pred")
    kept = (
        docs.join(quality, "doc_id")
        .join(rep, "doc_id")
        .join(lang, "doc_id")
        .filter(
            (F.col("quality") >= quality_cutoff)
            & (F.col("dup_line_frac") <= max_dup_line_frac)
            & (F.col("top_bigram_char_frac") <= max_top_bigram_frac)
            & F.col("lang_pred").isin(*languages)
        )
        .select(*docs.columns)
    )
    if gopher_rules:
        from lsd2_spark.operators import quality_rules

        flags = quality_rules.gopher_quality_flags(kept, "text", "doc_id")
        kept = kept.join(
            flags.filter("gopher_pass").select("doc_id"), "doc_id", "left_semi"
        )
    exact = dedup.exact_dedup(kept, "text", "doc_id").filter("is_canonical = 1")
    kept = kept.join(exact.select("doc_id"), "doc_id", "left_semi")
    # fuzzy dedup keeps the HIGHEST-quality member of each near-dup
    # cluster (not the smallest id): join the quality score back in
    scored = kept.join(quality, "doc_id")
    fuzzy = dedup.dedup_clusters(
        scored, "text", "doc_id", min_jaccard=min_jaccard, score_col="quality"
    )
    kept = kept.join(
        fuzzy.filter("is_canonical = 1").select("doc_id"), "doc_id", "left_semi"
    )
    if lm_reference is not None:
        from lsd2_spark.operators import lm_score as lm

        model = lm.train_char_lm(lm_reference, "text")
        ok = lm.lm_score(kept, model, "text", "doc_id").filter(
            F.col("avg_logp") >= min_avg_logp
        )
        kept = kept.join(ok.select("doc_id"), "doc_id", "left_semi")
    if scrub_repeated_spans:
        from lsd2_spark.operators import substring_dedup

        cleaned = substring_dedup.remove_repeated_spans(
            kept, "text", "doc_id", min_tokens=min_span_tokens
        ).select("doc_id", F.col("clean_text").alias("text"))
        kept = kept.drop("text").join(cleaned, "doc_id").select(*docs.columns)
    if quality_model is not None:
        from lsd2_spark.operators import quality_model as qm

        probs = qm.score_quality(kept, quality_model, "text", "doc_id")
        kept = kept.join(
            probs.filter(F.col("quality_prob") >= min_quality_prob).select("doc_id"),
            "doc_id",
            "left_semi",
        )
    if semantic_eps is not None:
        from lsd2_spark.operators import doc_embed, semdedup

        emb = doc_embed.doc_embeddings(kept, "text", "doc_id", dim=64)
        verdicts = semdedup.semantic_dedup(
            emb, "embedding", "doc_id",
            n_clusters=semantic_clusters, eps=semantic_eps,
        )
        kept = kept.join(
            verdicts.filter("keep = 1").select("doc_id"), "doc_id", "left_semi"
        )
        # Cut lineage after the Python-exec stage (see cut_lineage's
        # docstring for the Spark 4.1 AQE NPE this avoids, and why a
        # checkpoint between macro-stages is the production shape)
        from lsd2_spark.operators.common import cut_lineage

        kept = cut_lineage(kept)
    if eval_docs is not None:
        contam = decontam.decontaminate(kept, eval_docs, "text", "doc_id")
        kept = kept.join(
            contam.filter("NOT contaminated").select("doc_id"), "doc_id", "left_semi"
        )
        if fuzzy_decontam_jaccard is not None:
            fz = decontam.fuzzy_decontaminate(
                kept, eval_docs, "text", "doc_id",
                min_jaccard=fuzzy_decontam_jaccard,
            )
            kept = kept.join(
                fz.filter("NOT fuzzy_contaminated").select("doc_id"),
                "doc_id",
                "left_semi",
            )
    if dsir_target is not None:
        from lsd2_spark.operators import dsir

        model = dsir.train_dsir(dsir_target, kept, "text")
        n_pick = dsir_n if dsir_n is not None else max(1, kept.count() // 2)
        kept = dsir.dsir_resample(
            kept, "text", "doc_id", model, n=n_pick, normalize="mean"
        ).select(*docs.columns)
    if token_budget is not None:
        # epoch-capped water-fill over TOKENS: small sources up-sampled
        # (docs replicated per epoch, epoch column kept for packing)
        tok = F.size(F.split(F.col("text"), r"\s+"))
        plan = sampling.plan_token_mixture(
            kept, "source", tok, token_budget,
            alpha=mixture_alpha, max_epochs=max_epochs,
        )
        # epoch kept: replicated docs are distinguishable downstream
        # ((doc_id, epoch) is unique) and packing can interleave epochs
        mixed = sampling.apply_token_mixture(kept, "doc_id", "source", plan)
    elif source_fractions == "temperature":
        # p ∝ n^0.7 tempered mixture computed from the surviving corpus
        mixed, _fractions = sampling.temperature_mixture(
            kept, "doc_id", "source", alpha=0.7
        )
    else:
        mixed = sampling.stratified_sample(
            kept, "doc_id", source_fractions,
            strata_col="source" if isinstance(source_fractions, dict) else None,
        )
    return sampling.assign_splits(mixed, "doc_id")


def media_features(media: DataFrame, payload_col: str, id_col: str) -> DataFrame:
    """Multimodal branch: decode-aware features + 64x64 thumbnails for
    image payloads (PNG/PPM), joined on media_id.  Audio payloads go
    through ``extract_audio_features`` the same way."""
    blobs = multimodal.to_blob_table(media, payload_col, id_col, "image/any")
    feats = multimodal.extract_features(blobs)
    thumbs = multimodal.resize_images(blobs, width=64, height=64).select(
        "media_id", F.col("payload").alias("thumbnail")
    )
    return feats.join(thumbs, "media_id", "left")


def token_accounting(corpus: DataFrame) -> DataFrame:
    """Per-split document and BPE-ish token totals.  Epoch-replicated
    corpora (duplicate doc_ids) are handled: stats are computed once
    per distinct doc and joined back, so each corpus ROW counts its
    tokens exactly once (a stats row per corpus row would square the
    totals for replicated docs)."""
    stats = text_analysis.token_stats(
        corpus.dropDuplicates(["doc_id"]), "text", "doc_id"
    ).select("doc_id", "n_bpe_tokens")
    return (
        corpus.join(stats, "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bpe_tokens").alias("n_bpe_tokens"),
        )
        .orderBy("split")
    )


if __name__ == "__main__":
    from lsd2_spark import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="training_pipeline")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = build_training_corpus(
        spark,
        docs,
        quality_cutoff=30,
        eval_docs=docs.filter(F.col("doc_id") % 20 == 0),
    )
    corpus.cache()
    print(f"corpus rows: {corpus.count()} (from {docs.count()})")
    token_accounting(corpus).show()
    sketches.corpus_quantiles(
        corpus.withColumn("n_chars", F.length("text")), "n_chars", ["split"]
    ).orderBy("split").show()
    packing.pack_sequences(
        corpus.filter("split = 'train'"),
        "doc_id",
        F.size(F.split(F.col("text"), r"\s+")),
        512,
        "source",
    ).orderBy("source", "seq_id").show(8)
    spark.stop()
