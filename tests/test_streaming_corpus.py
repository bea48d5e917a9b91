"""Streaming dedup against the persistent DedupIndex: cross-batch
rejection, within-batch exact/fuzzy screening, exactly-once replay
(including the crash-between-update-and-commit window), and the
probe-side exclude_ids mask."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lsd2_spark.operators.dedup_index import DedupIndex
from lsd2_spark.streaming.corpus import stream_dedup_into_index

BASE = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "machine learning models require large clean training corpora today",
    "completely unrelated sentence about cooking pasta with fresh basil",
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _near(text: str) -> str:
    toks = text.split()
    toks[3] = "EDITED"
    return " ".join(toks)


@pytest.fixture(params=["local", "hadoop"])
def seeded(spark, tmp_path, request):
    """The whole fence battery runs under BOTH LifecycleFS
    implementations (VERDICT r10 item 7): every marker in this module —
    high-water commit, two-phase inflight fence — routes through the
    index's injected FS, and HadoopFS (driven against file:) is where
    exactly-once meets non-POSIX semantics."""
    fs = None
    if request.param == "hadoop":
        from lsd2_spark.sources.fs import HadoopFS

        fs = HadoopFS(spark)
    idx = DedupIndex.build(
        _docs(spark, [(1, BASE[0]), (2, BASE[1])]), "text", "doc_id",
        str(tmp_path / "idx"), fs=fs,
    )
    return idx, str(tmp_path / "accept")


def test_batch_screen_rejects_index_and_within_batch_dups(spark, seeded):
    idx, accept = seeded
    w = stream_dedup_into_index(None, idx, accept, threshold=0.5)
    batch = _docs(
        spark,
        [
            (10, BASE[0]),        # exact dup of indexed 1 -> reject
            (11, _near(BASE[1])), # near dup of indexed 2 -> reject
            (12, BASE[2]),        # fresh -> accept
            (13, BASE[2]),        # within-batch exact dup of 12 -> reject
        ],
    )
    w._apply(batch, batch_id=0)
    got = spark.read.parquet(os.path.join(accept, "batch_id=0"))
    assert sorted(r["doc_id"] for r in got.collect()) == [12]
    assert w.stats == [(0, 4, 1)]
    # the survivor is indexed: an identical doc in the NEXT batch rejects
    w._apply(_docs(spark, [(20, BASE[2])]), batch_id=1)
    got1 = spark.read.parquet(os.path.join(accept, "batch_id=1"))
    assert got1.count() == 0


def test_within_batch_fuzzy_collapses_same_batch_near_dups(spark, seeded):
    idx, accept = seeded
    fresh, edited = BASE[2], _near(BASE[2])
    exact_w = stream_dedup_into_index(None, idx, accept + "_e", threshold=0.5)
    exact_w._apply(_docs(spark, [(30, fresh), (31, edited)]), batch_id=0)
    # exact screening lets a SAME-BATCH near-dup pair both through
    assert (
        spark.read.parquet(os.path.join(accept + "_e", "batch_id=0")).count() == 2
    )

    idx2 = DedupIndex.build(
        _docs(spark, [(1, BASE[0])]), "text", "doc_id",
        os.path.join(os.path.dirname(idx.path), "idx2"),
    )
    fuzzy_w = stream_dedup_into_index(
        None, idx2, accept + "_f", threshold=0.5,
        within_batch="fuzzy", min_jaccard=0.3,
    )
    fuzzy_w._apply(_docs(spark, [(30, fresh), (31, edited)]), batch_id=0)
    got = spark.read.parquet(os.path.join(accept + "_f", "batch_id=0"))
    assert sorted(r["doc_id"] for r in got.collect()) == [30]  # min id wins


def test_replay_is_exactly_once(spark, seeded):
    idx, accept = seeded
    w = stream_dedup_into_index(None, idx, accept, threshold=0.5)
    batch = _docs(spark, [(12, BASE[2]), (13, BASE[2] + " with a suffix")])
    w._apply(batch, batch_id=0)
    first = sorted(
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(accept, "batch_id=0")).collect()
    )
    n_bands = spark.read.parquet(os.path.join(idx.path, "bands")).count()
    # committed replay: full no-op
    w._apply(batch, batch_id=0)
    assert (
        spark.read.parquet(os.path.join(idx.path, "bands")).count() == n_bands
    )
    assert w.stats == [(0, 2, 2)]

    # crash window: index updated + sink written, but the high-water
    # marker was never committed.  A real crash there leaves the
    # INFLIGHT fence behind (published before the index update, removed
    # only at commit) — recreate exactly that state.  The re-run must
    # accept EXACTLY the original survivors (its own already-indexed
    # rows are masked out of the probe), not reject them as dups of
    # themselves.
    os.remove(os.path.join(idx.path, "_stream_hwm.json"))
    idx._fs.publish(
        os.path.join(idx.path, "_stream_inflight.json"), '{"batch_id": 0, "accepted": true}'
    )
    w._apply(batch, batch_id=0)
    again = sorted(
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(accept, "batch_id=0")).collect()
    )
    assert again == first == [12, 13]
    # the commit clears the fence: no stale marker to misfire later
    assert not os.path.exists(os.path.join(idx.path, "_stream_inflight.json"))


def test_replay_never_rewrites_a_complete_accept_dir(spark, seeded):
    """A fenced replay whose mask came from the complete accept dir
    must NOT overwrite that dir: it is the only record of the crashed
    attempt's acceptances, and a second crash mid-overwrite would
    strand the batch's documents (indexed signatures, no corpus rows —
    all future copies silently rejected)."""
    idx, accept = seeded
    w = stream_dedup_into_index(None, idx, accept, threshold=0.5)
    batch = _docs(spark, [(12, BASE[2])])
    w._apply(batch, batch_id=0)
    adir = os.path.join(accept, "batch_id=0")
    before = {
        f: os.path.getmtime(os.path.join(adir, f)) for f in os.listdir(adir)
    }
    # crash window: hwm lost, inflight fence present
    os.remove(os.path.join(idx.path, "_stream_hwm.json"))
    idx._fs.publish(
        os.path.join(idx.path, "_stream_inflight.json"), '{"batch_id": 0, "accepted": true}'
    )
    w._apply(batch, batch_id=0)
    after = {
        f: os.path.getmtime(os.path.join(adir, f)) for f in os.listdir(adir)
    }
    assert after == before  # same files, untouched bytes
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(adir).collect()
    ) == [12]


def test_replay_before_accept_completion_probes_unmasked(spark, seeded):
    """accepted=false on the fence means the crash hit before the
    accept write finished — the index was never touched (the update
    runs strictly after the accepted flip), so the replay probes
    unmasked, rewrites the (possibly torn) accept dir, and converges to
    the same outcome as a clean first run."""
    idx, accept = seeded
    w = stream_dedup_into_index(None, idx, accept, threshold=0.5)
    batch = _docs(spark, [(12, BASE[2])])
    # simulate: fence published accepted=false, torn accept dir,
    # index untouched
    idx._fs.publish(
        os.path.join(idx.path, "_stream_inflight.json"),
        '{"batch_id": 0, "accepted": false}',
    )
    adir = os.path.join(accept, "batch_id=0")
    os.makedirs(adir)
    with open(os.path.join(adir, "part-torn.parquet"), "wb") as f:
        f.write(b"torn")
    w._apply(batch, batch_id=0)
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(adir).collect()
    ) == [12]
    assert not os.path.exists(os.path.join(idx.path, "_stream_inflight.json"))
    # and the accepted doc is really indexed now
    hit = idx.probe(_docs(spark, [(99, BASE[2])]), threshold=0.5).collect()[0]
    assert hit["exact_dup_of"] == 12


def test_fresh_batch_reusing_indexed_ids_is_screened(spark, seeded):
    """A NEW batch that re-delivers an (id, text) row the index already
    holds — a re-crawl emitting the same doc_id — must be rejected as a
    duplicate.  An unfenced replay mask would hide indexed row 12 from
    its own probe and self-approve the copy (the bug the inflight fence
    exists to prevent)."""
    idx, accept = seeded
    w = stream_dedup_into_index(None, idx, accept, threshold=0.5)
    w._apply(_docs(spark, [(12, BASE[2])]), batch_id=0)
    w._apply(
        _docs(
            spark,
            [
                (12, BASE[2]),  # same id AND same text as indexed row
                (14, "an entirely novel paragraph about spark shuffle tuning"),
            ],
        ),
        batch_id=1,
    )
    got = spark.read.parquet(os.path.join(accept, "batch_id=1"))
    assert sorted(r["doc_id"] for r in got.collect()) == [14]
    assert w.stats == [(0, 1, 1), (1, 2, 1)]


def test_probe_exclude_ids_masks_index_view(spark, seeded):
    idx, _ = seeded
    probe = _docs(spark, [(10, BASE[0])])
    hit = idx.probe(probe, threshold=0.5).collect()[0]
    assert hit["exact_dup_of"] == 1
    masked = idx.probe(
        probe, threshold=0.5,
        exclude_ids=spark.createDataFrame([(1,)], "doc_id long"),
    ).collect()[0]
    assert masked["exact_dup_of"] is None and masked["near_dup_of"] is None


def test_streaming_end_to_end(spark, seeded, tmp_path):
    """Drive the real readStream -> foreachBatch path."""
    idx, accept = seeded
    inbox = str(tmp_path / "inbox")
    _docs(spark, [(10, BASE[0]), (12, BASE[2])]).coalesce(1).write.parquet(
        inbox
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{inbox}/*.parquet")
    )
    w = stream_dedup_into_index(stream, idx, accept, threshold=0.5)
    w.run_available(str(tmp_path / "ckpt"))
    got = spark.read.parquet(os.path.join(accept, "batch_id=0"))
    assert sorted(r["doc_id"] for r in got.collect()) == [12]


class _CrashOnPublish:
    """LifecycleFS wrapper that raises BEFORE the n-th publish reaches
    the inner FS — the legal crash state of an atomic publish is
    'previous content intact', and this injects exactly that at every
    marker write in turn."""

    def __init__(self, inner, crash_on: int):
        self._inner = inner
        self._n = 0
        self.crash_on = crash_on

    def publish(self, path: str, text: str) -> None:
        self._n += 1
        if self._n == self.crash_on:
            raise RuntimeError(f"injected crash before publish #{self._n}")
        self._inner.publish(path, text)

    def __getattr__(self, attr):
        return getattr(self._inner, attr)


@pytest.mark.parametrize("crash_on", [1, 2, 3])
def test_fence_crash_at_every_marker_write_converges(spark, seeded, crash_on):
    """Crash injection at EACH of the three marker publishes of a fresh
    batch — inflight(accepted=false), the accepted=true flip, and the
    high-water commit — under both FS implementations (the seeded
    fixture's param).  After the crash, a plain re-run of the same
    batch must converge to exactly the no-crash outcome: same accept
    dir, same exactly-once semantics for the following batch."""
    idx, accept = seeded
    batch = _docs(spark, [(12, BASE[2]), (13, BASE[2] + " with a suffix")])

    w = stream_dedup_into_index(None, idx, accept, threshold=0.5)
    real_fs = idx._fs
    idx._fs = _CrashOnPublish(real_fs, crash_on)
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            w._apply(batch, batch_id=0)
    finally:
        idx._fs = real_fs

    # recovery: the replay of the same batch converges
    w2 = stream_dedup_into_index(None, idx, accept, threshold=0.5)
    w2._apply(batch, batch_id=0)
    got = sorted(
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(accept, "batch_id=0")).collect()
    )
    assert got == [12, 13]
    # marker state is clean: committed hwm, no stale fence
    assert w2._last_committed() == 0
    assert not idx._fs.exists(os.path.join(idx.path, "_stream_inflight.json"))
    # exactly-once holds for the next batch: an identical doc rejects,
    # and the batch-0 signatures exist exactly once in the index
    w2._apply(_docs(spark, [(20, BASE[2])]), batch_id=1)
    assert spark.read.parquet(os.path.join(accept, "batch_id=1")).count() == 0
    flags = idx.probe(_docs(spark, [(99, BASE[2])]), threshold=0.5).collect()[0]
    assert flags["exact_dup_of"] == 12


def test_streaming_reliable_cuts_are_reclaimed_after_commit(spark, tmp_path):
    """Round-12: under the "auto" lineage-cut default, a session with a
    checkpoint dir makes every per-batch survivor cut a RELIABLE
    checkpoint — and since the cut is batch-scoped, the writer must
    delete it after the batch commits.  Without reclamation a long
    stream writes one corpus-scale snapshot per micro-batch into the
    job store and never frees any."""
    idx = DedupIndex.build(
        _docs(spark, [(1, BASE[0]), (2, BASE[1])]), "text", "doc_id",
        str(tmp_path / "idx"),
    )
    accept = str(tmp_path / "accept")
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    _docs(spark, [(10, BASE[2])]).coalesce(1).write.parquet(
        str(inbox / "f0.parquet")
    )
    _docs(spark, [(11, BASE[2] + " extra tail tokens here")]).coalesce(
        1
    ).write.parquet(str(inbox / "f1.parquet"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{inbox}/*.parquet")
    )
    job_ckpt = str(tmp_path / "jobstore")
    prev = spark.sparkContext.getCheckpointDir()
    spark.sparkContext.setCheckpointDir(job_ckpt)
    try:
        w = stream_dedup_into_index(stream, idx, accept, threshold=0.5)
        w.run_available(str(tmp_path / "squery_ckpt"))
    finally:
        spark.sparkContext.setCheckpointDir(prev)
    # both batches committed; doc 10 accepted in batch 0
    got = spark.read.parquet(os.path.join(accept, "batch_id=0"))
    assert [r["doc_id"] for r in got.collect()] == [10]
    # every batch-scoped reliable checkpoint was reclaimed
    leftovers = [
        d
        for _, dirs, _ in os.walk(job_ckpt)
        for d in dirs
        if d.startswith("rdd-")
    ]
    assert leftovers == [], (
        f"committed batches left reliable checkpoints behind: {leftovers}"
    )
