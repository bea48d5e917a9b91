"""Lineage-cut modes (operators/common.cut_lineage): the reliable
checkpoint path for preemptible clusters (VERDICT r10 "What's wrong"
#1), the persist mode for the curation funnel's survivor slice, the
guard rails (reliable without a checkpoint dir; persist at a true-cut
site), and result equality across modes end-to-end through the two
compositions that consume the knob (curate_corpus, dedup_clusters)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lsd2_spark.operators.common import (
    CONF_LINEAGE_CUT,
    cut_lineage,
    resolve_cut_mode,
)
from lsd2_spark.operators.curate import curate_corpus
from lsd2_spark.operators.dedup import connected_components, dedup_clusters


@pytest.fixture()
def checkpoint_dir(spark, tmp_path):
    """Point the context at a temp reliable-checkpoint dir; restore
    after (other tests assume no dir is set)."""
    prev = spark.sparkContext.getCheckpointDir()
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    yield str(tmp_path / "ckpt")
    # restore EXACTLY: under the "auto" conf default a lingering
    # checkpoint dir would flip every later test's cuts to reliable
    # (setCheckpointDir(None) unsets — Option(null) is None scalaside)
    spark.sparkContext.setCheckpointDir(prev)


def _docs(spark):
    rows = [
        (1, "the quick brown fox likes to run with the lazy dog and that "
            "habit seems to have made both of them quite happy together"),
        (2, "the quick brown fox likes to run with the lazy dog and that "
            "habit seems to have made both of them quite happy together"),
        (3, "the quick brown fox likes to run with the lazy dog and that "
            "habit seems to have made both of them very happy together"),
        (4, "the cat is small"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_reliable_without_checkpoint_dir_fails_loud(spark):
    if spark.sparkContext.getCheckpointDir() is not None:
        pytest.skip("a checkpoint dir leaked from another test")
    df = spark.range(3)
    with pytest.raises(ValueError, match="setCheckpointDir"):
        cut_lineage(df, mode="reliable")


def test_reliable_cut_writes_checkpoint_and_preserves_rows(
    spark, checkpoint_dir
):
    df = spark.range(100).withColumn("x", F.col("id") * 2)
    out = cut_lineage(df, mode="reliable")
    assert sorted(r["x"] for r in out.collect()) == [2 * i for i in range(100)]
    # blocks actually landed in the RELIABLE dir (the point: they
    # survive executor loss, unlike localCheckpoint's executor blocks)
    found = [
        os.path.join(d, f)
        for d, _, fs in os.walk(checkpoint_dir)
        for f in fs
    ]
    assert found, "reliable checkpoint wrote nothing under the checkpoint dir"


def test_persist_rejected_at_true_cut_sites(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="true plan cut"):
        cut_lineage(df, mode="persist")  # allow_persist defaults False


def test_session_conf_persist_downgrades_at_true_cut_sites(spark):
    """A session-wide persist default must not break fixpoint sites —
    they silently take the local cut instead."""
    spark.conf.set(CONF_LINEAGE_CUT, "persist")
    try:
        out = cut_lineage(spark.range(5), mode=None)  # conf-driven
        assert out.count() == 5
    finally:
        spark.conf.unset(CONF_LINEAGE_CUT)


def test_bad_mode_rejected(spark):
    with pytest.raises(ValueError, match="lineage-cut mode"):
        cut_lineage(spark.range(1), mode="banana")


def test_auto_resolves_local_without_checkpoint_dir(spark):
    if spark.sparkContext.getCheckpointDir() is not None:
        pytest.skip("a checkpoint dir leaked from another test")
    assert resolve_cut_mode(spark, "auto") == "local"
    assert resolve_cut_mode(spark, None) == "local"  # conf default IS auto


def test_auto_resolves_reliable_with_checkpoint_dir(spark, checkpoint_dir):
    assert resolve_cut_mode(spark, "auto") == "reliable"
    assert resolve_cut_mode(spark, None) == "reliable"
    # and a conf-default cut actually lands files in the reliable dir
    out = cut_lineage(spark.range(20), mode=None)
    assert out.count() == 20
    found = [f for _, _, fs in os.walk(checkpoint_dir) for f in fs]
    assert found, "auto+checkpoint-dir cut did not write reliable files"


def test_session_persist_downgrades_to_reliable_with_dir(
    spark, checkpoint_dir, caplog
):
    """ADVICE r11: a session-wide persist (chosen FOR executor-loss
    robustness) must downgrade to the executor-loss-SAFE real cut when
    one is available, and must say so."""
    spark.conf.set(CONF_LINEAGE_CUT, "persist")
    try:
        import logging

        with caplog.at_level(logging.WARNING, "lsd2_spark.operators.common"):
            assert resolve_cut_mode(spark, None) == "reliable"
        assert any("downgrading" in r.message for r in caplog.records)
    finally:
        spark.conf.unset(CONF_LINEAGE_CUT)


def test_session_persist_downgrade_to_local_warns(spark, caplog):
    if spark.sparkContext.getCheckpointDir() is not None:
        pytest.skip("a checkpoint dir leaked from another test")
    spark.conf.set(CONF_LINEAGE_CUT, "persist")
    try:
        import logging

        from lsd2_spark.operators import common as C

        # the downgrade warning is once-per-session (ADVICE r12 #3: a
        # stream calling cut_lineage per micro-batch must not emit the
        # identical line for the query's lifetime) — reset the
        # registry so this test observes the first firing
        C._warned_once.clear()
        with caplog.at_level(logging.WARNING, "lsd2_spark.operators.common"):
            assert resolve_cut_mode(spark, None) == "local"
            n_first = sum(
                "executor-loss FATAL" in r.message for r in caplog.records
            )
            # second resolve under the same conf: no repeat warning
            assert resolve_cut_mode(spark, None) == "local"
        assert n_first == 1
        assert (
            sum("executor-loss FATAL" in r.message for r in caplog.records)
            == 1
        )
    finally:
        spark.conf.unset(CONF_LINEAGE_CUT)


def test_cc_fixpoint_checkpoint_files_stay_bounded(spark, checkpoint_dir):
    """VERDICT r11 #2: the CC fixpoint deletes round N-1's reliable
    checkpoint as soon as round N materializes — a long fixpoint must
    hold <= 2 rounds of files in the job store, not one corpus-scale
    snapshot per round."""
    n = 9  # a chain 0-1-...-8: diameter forces ~n rounds
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id1 long, id2 long"
    )
    stats: dict = {}
    out = connected_components(
        verts, edges, "id", lineage_cut="reliable", stats=stats
    )
    labels = sorted(map(tuple, out.collect()))
    assert labels == [(i, 0) for i in range(n)]  # one component, min label
    assert stats["converged"] and stats["rounds"] >= 4, stats
    rdd_dirs = [
        d
        for root, dirs, _ in os.walk(checkpoint_dir)
        for d in dirs
        if d.startswith("rdd-")
    ]
    assert len(rdd_dirs) <= 2, (
        f"{stats['rounds']} fixpoint rounds left {len(rdd_dirs)} checkpoint "
        f"dirs on disk — per-round cleanup is not happening: {rdd_dirs}"
    )


def test_connected_components_reliable_equals_local(spark, checkpoint_dir):
    verts = spark.createDataFrame([(i,) for i in range(8)], "id long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5), (6, 7), (5, 6)], "id1 long, id2 long"
    )
    local = sorted(
        map(tuple, connected_components(verts, edges, "id").collect())
    )
    rel = sorted(
        map(
            tuple,
            connected_components(
                verts, edges, "id", lineage_cut="reliable"
            ).collect(),
        )
    )
    assert rel == local
    assert local == [
        (0, 0), (1, 0), (2, 0), (3, 3), (4, 4), (5, 4), (6, 4), (7, 4)
    ]


@pytest.mark.parametrize("mode", ["reliable", "persist"])
def test_curate_corpus_modes_equal_local(spark, checkpoint_dir, mode):
    docs = _docs(spark)
    ev = spark.createDataFrame([("the cat is small",)], "text string")

    def run(m):
        out = curate_corpus(
            docs, eval_df=ev, min_words=10, fuzzy_min_jaccard=0.5,
            lineage_cut=m,
        ).select("doc_id", "drop_stage", "kept")
        return sorted(map(tuple, out.collect()))

    assert run(mode) == run("local")


def test_dedup_clusters_reliable_equals_local(spark, checkpoint_dir):
    docs = _docs(spark)
    base = sorted(
        map(tuple, dedup_clusters(docs, "text", "doc_id", min_jaccard=0.5).collect())
    )
    stats: dict = {}
    rel = sorted(
        map(
            tuple,
            dedup_clusters(
                docs, "text", "doc_id", min_jaccard=0.5,
                lineage_cut="reliable", stats=stats,
            ).collect(),
        )
    )
    assert rel == base
    # the observability passthrough reaches the fixpoint
    assert stats["converged"] and stats["rounds"] >= 1


def test_checkpoint_helpers_degrade_gracefully(spark):
    """The lifecycle helpers are best-effort by contract: a frame that
    is not reliably checkpointed yields None (callers skip file
    management), and deleting a nonexistent URI returns False instead
    of raising — cleanup must never fail a job."""
    from lsd2_spark.operators.common import (
        checkpoint_file_of,
        remove_checkpoint_file,
    )

    plain = spark.range(5)
    assert checkpoint_file_of(plain) is None
    local = plain.localCheckpoint(eager=True)
    assert checkpoint_file_of(local) is None  # local cut: blocks, no files
    assert remove_checkpoint_file(spark, "file:///nonexistent/ckpt/rdd-999") is False


def test_checkpoint_file_unresolvable_warns_once(spark, caplog):
    """ADVICE r12 #1: when a caller EXPECTED a reliable checkpoint but
    the internal plan walk yields None, every reclamation path in the
    package is silently off — the degradation stays best-effort but
    must announce itself, once per session, so the resumed job-store
    growth is diagnosable."""
    import logging

    from lsd2_spark.operators import common as C

    C._warned_once.clear()
    plain = spark.range(5)  # not checkpointed: the walk yields None
    with caplog.at_level(logging.WARNING, "lsd2_spark.operators.common"):
        assert C.checkpoint_file_of(plain, expect_reliable=True) is None
        assert C.checkpoint_file_of(plain, expect_reliable=True) is None
    warned = [
        r for r in caplog.records if "reclamation is DISABLED" in r.message
    ]
    assert len(warned) == 1
    # the silent form (expect_reliable unset) stays silent
    caplog.clear()
    C._warned_once.clear()
    with caplog.at_level(logging.WARNING, "lsd2_spark.operators.common"):
        assert C.checkpoint_file_of(plain) is None
    assert not caplog.records
