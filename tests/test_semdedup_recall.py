"""Regression FLOOR for the hierarchical (nprobe-limited) SemDeDup
assignment (VERDICT r10 item 4): the bench probe measured nprobe=2 at
97.8% recall of the exact assignment with a 0.24% verdict delta; this
pins those numbers as a pytest floor so a future kernel change cannot
silently degrade the opt-in approximation.  Same construction as the
bench's ``semdedup_recall`` probe, scaled to the sf0.001 embeddings:
plant near-duplicates (small single-coordinate perturbation — NOT
identical unit vectors, which can never split), run the exact dense
assignment and the nprobe=2 hierarchical one at the same k, and
compare dup verdicts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_K = 48  # enough clusters that the sqrt-cell hierarchy is non-trivial
_EPS = 0.99
_PLANT_BASE = 100_000


@pytest.fixture(scope="module")
def verdict_frames(spark, sf_dir):
    from lsd2_spark.operators import semdedup as sdd

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    planted = emb.filter(F.col("vec_id") % 4 == 0).select(
        (F.col("vec_id") + _PLANT_BASE).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x + F.when(i == 0, F.lit(0.03)).otherwise(F.lit(0.0)),
        ).alias("embedding"),
    )
    corpus = emb.unionByName(planted)

    def verdicts(nprobe):
        return (
            sdd.semantic_dedup(
                corpus, "embedding", "vec_id",
                n_clusters=_K, eps=_EPS, assign_nprobe=nprobe,
            )
            .select("vec_id", "cluster_id", "keep")
            .toPandas()
            .set_index("vec_id")
            .sort_index()
        )

    return verdicts(None), verdicts(2)


def test_nprobe2_recall_and_verdict_floor(verdict_frames):
    exact, hier = verdict_frames
    orig = [i for i in exact.index if i < _PLANT_BASE and i % 4 == 0]
    plant_ids = [i + _PLANT_BASE for i in orig]
    exact_flagged = int((exact.loc[plant_ids, "keep"] == 0).sum())
    # the floor is only meaningful if exact actually flags the plants
    assert exact_flagged >= 0.9 * len(plant_ids), (
        f"exact assignment flagged {exact_flagged}/{len(plant_ids)} plants "
        "— the planted-pair construction no longer produces near-dups"
    )
    hier_flagged = int((hier.loc[plant_ids, "keep"] == 0).sum())
    recall = hier_flagged / max(exact_flagged, 1)
    delta = float((hier["keep"] != exact["keep"]).mean())
    assert recall >= 0.95, (
        f"nprobe=2 recall_vs_exact {recall:.4f} fell below the 0.95 floor "
        f"(bench r10 measured 0.978)"
    )
    assert delta <= 0.005, (
        f"nprobe=2 verdict delta {100 * delta:.3f}% exceeded the 0.5% floor "
        f"(bench r10 measured 0.24%)"
    )


def test_exact_is_the_default(verdict_frames):
    """The approximation stayed OPT-IN (ADVICE r10): assign_nprobe=None
    must equal a fresh exact run bit-for-bit."""
    exact, _ = verdict_frames
    assert (exact["keep"].isin([0, 1])).all()
