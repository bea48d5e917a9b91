"""Incremental dedup against a persistent index (DedupIndex):
build → probe → update → probe across batches, exact + near paths,
NULL totality, band-partition pruning, and foreachBatch streaming
composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lsd2_spark.operators.dedup_index import DedupIndex

_BASE = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "pack my box with five dozen liquor jugs before the long voyage"),
    (3, "how vexingly quick daft zebras jump across the frozen meadow today"),
    (4, "sphinx of black quartz judge my vow under the ancient moonlight"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def index(spark, tmp_path):
    return DedupIndex.build(
        _df(spark, _BASE), "text", "doc_id", str(tmp_path / "idx")
    )


def test_probe_flags_exact_and_near_dups(spark, index):
    batch = [
        # exact copy of doc 1
        (10, "the quick brown fox jumps over the lazy dog near the river bank"),
        # near copy of doc 2 (one word changed)
        (11, "pack my box with five dozen liquor jugs before the long journey"),
        # genuinely fresh
        (12, "completely unrelated sentence about distributed query planning engines"),
    ]
    got = {
        r["doc_id"]: r
        for r in index.probe(_df(spark, batch), threshold=0.5).collect()
    }
    assert got[10]["exact_dup_of"] == 1
    assert got[11]["exact_dup_of"] is None
    assert got[11]["near_dup_of"] == 2
    assert got[11]["est_jaccard"] >= 0.5
    assert got[12]["exact_dup_of"] is None
    assert got[12]["near_dup_of"] is None
    # exact dups are also near dups (identical signatures)
    assert got[10]["near_dup_of"] == 1
    assert got[10]["est_jaccard"] == 1.0


def test_update_extends_the_corpus(spark, index):
    """After accepting a batch, later batches dedup against it too —
    the whole point of the incremental index."""
    fresh = [(20, "a brand new document about sequence packing and token budgets")]
    index.update(_df(spark, fresh))

    batch2 = [
        # exact copy of the batch-1 doc (NOT in the original corpus)
        (30, "a brand new document about sequence packing and token budgets"),
        # near copy of it
        (31, "a brand new document about sequence packing and token limits"),
    ]
    got = {
        r["doc_id"]: r
        for r in index.probe(_df(spark, batch2), threshold=0.5).collect()
    }
    assert got[30]["exact_dup_of"] == 20
    assert got[31]["exact_dup_of"] is None
    assert got[31]["near_dup_of"] == 20


def test_repeated_update_same_hash_keeps_min_canonical(spark, index):
    """Re-appending content that is already indexed must not change
    which id is canonical (min wins at read time)."""
    dup_of_1 = [(40, "the quick brown fox jumps over the lazy dog near the river bank")]
    index.update(_df(spark, dup_of_1))  # same hash as doc 1, larger id
    got = {
        r["doc_id"]: r["exact_dup_of"]
        for r in index.probe(
            _df(spark, [(50, "the quick brown fox jumps over the lazy dog near the river bank")])
        ).collect()
    }
    assert got[50] == 1  # min(1, 40)


def test_probe_is_total_over_null_text(spark, index):
    rows = [(60, None), (61, "sphinx of black quartz judge my vow under the ancient moonlight")]
    got = {r["doc_id"]: r for r in index.probe(_df(spark, rows)).collect()}
    assert set(got) == {60, 61}
    assert got[60]["exact_dup_of"] is None
    assert got[60]["near_dup_of"] is None
    assert got[61]["exact_dup_of"] == 4


def test_probe_matches_self_dedup_semantics(spark, tmp_path):
    """Index-probe must agree with the batch operator it factors:
    probing corpus B against index(A) flags exactly the cross-corpus
    pairs lsh_candidate_pairs finds in A ∪ B (restricted to A×B, at the
    same signature-agreement threshold)."""
    from lsd2_spark.operators.dedup import lsh_candidate_pairs

    a = _BASE
    b = [
        (101, "the quick brown fox jumps over the lazy dog near the river bend"),
        (102, "pack my box with five dozen liquor jugs before the long voyage"),
        (103, "an entirely different text about adaptive query execution in spark"),
    ]
    idx = DedupIndex.build(_df(spark, a), "text", "doc_id", str(tmp_path / "idx2"))
    got = {
        r["doc_id"]: r["near_dup_of"]
        for r in idx.probe(_df(spark, b), threshold=0.5).collect()
    }

    both = lsh_candidate_pairs(_df(spark, a + b), "text", "doc_id")
    cross = {
        (r["id1"], r["id2"]): r["jaccard_est"]
        for r in both.collect()
        if r["id1"] <= 4 < r["id2"] and r["jaccard_est"] >= 0.5
    }
    want = {}
    for (i, j), sim in cross.items():
        if j not in want or sim > want[j][1] or (sim == want[j][1] and i < want[j][0]):
            want[j] = (i, sim)
    assert {j: w[0] for j, w in want.items()} == {
        j: g for j, g in got.items() if g is not None
    }


def test_band_join_never_shuffles_the_index(spark, index):
    """Scale guard: the (band, bucket) probe join must be a broadcast
    hash join with the PROBE side built — the bands/ index streams
    through it columnar and unshuffled.  A SortMergeJoin on
    (band, bucket) would shuffle + sort the full index (at 10^10 docs,
    ~1.5 TB moved per probe batch) and fails here."""
    batch = [(70, "the quick brown fox jumps over the lazy dog near the river bank")]
    out = index.probe(_df(spark, batch))
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin [band" in plan
    assert "SortMergeJoin [band" not in plan


def test_streaming_foreachbatch_composition(spark, index, tmp_path):
    """The canonical continuous-ingest loop: probe each micro-batch,
    accept survivors, update the index — later batches dedup against
    earlier ones' accepted docs."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    b1 = [(200, "streaming batch one document about watermark semantics")]
    b2 = [
        (201, "streaming batch one document about watermark semantics"),  # dup of 200
        (202, "a second-batch document that is genuinely novel content here"),
    ]
    _df(spark, b1).write.parquet(str(inbox / "f1"))
    _df(spark, b2).write.parquet(str(inbox / "f2"))

    accepted = []

    def handle(batch_df, _bid):
        flags = index.probe(batch_df)
        fresh = batch_df.join(
            flags.filter("exact_dup_of IS NULL AND near_dup_of IS NULL"),
            "doc_id",
            "left_semi",
        )
        rows = fresh.collect()
        if rows:
            index.update(batch_df.sparkSession.createDataFrame(rows, batch_df.schema))
            accepted.extend(r["doc_id"] for r in rows)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{inbox}/*")
    )
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(accepted) == [200, 202]  # 201 deduped against batch 1


def test_empty_corpus_start(spark, tmp_path):
    """An index built from an EMPTY corpus (the natural start of
    streaming ingest) must answer probes (all-fresh), accept updates,
    and tolerate compact — partitionBy on zero rows writes no parquet
    data files, so the readers need the typed-empty fallback."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    idx = DedupIndex.build(empty, "text", "doc_id", str(tmp_path / "eidx"))
    idx.compact()  # no-op, must not raise
    got = {r["doc_id"]: r for r in idx.probe(_df(spark, _BASE)).collect()}
    assert len(got) == len(_BASE)
    assert all(
        r["exact_dup_of"] is None and r["near_dup_of"] is None
        for r in got.values()
    )
    idx.update(_df(spark, _BASE))  # first real write sets the schema
    again = {r["doc_id"]: r for r in idx.probe(_df(spark, [(9, _BASE[0][1])])).collect()}
    assert again[9]["exact_dup_of"] == 1 and again[9]["near_dup_of"] == 1


def test_missing_table_dir_is_corruption_not_empty(spark, index):
    """The typed-empty fallback exists for 'table dir present but no
    data files yet' (empty-corpus build); a MISSING table dir is
    corruption and must raise, not silently report every document as
    fresh."""
    import shutil

    shutil.rmtree(f"{index.path}/bands")
    with pytest.raises(Exception, match="PATH_NOT_FOUND|bands"):
        index.probe(_df(spark, _BASE[:1])).collect()


def test_build_rejects_bad_band_count(spark, tmp_path):
    with pytest.raises(ValueError):
        DedupIndex.build(_df(spark, _BASE), "text", "doc_id", str(tmp_path / "x"), bands=5)


def test_reopen_from_disk(spark, index):
    """A fresh DedupIndex(path) serves identical probes (engine-neutral
    on-disk state, no in-memory dependence)."""
    reopened = DedupIndex(spark, index.path)
    batch = [(80, "the quick brown fox jumps over the lazy dog near the river bank")]
    a = index.probe(_df(spark, batch)).collect()
    b = reopened.probe(_df(spark, batch)).collect()
    assert a == b


def test_compact_preserves_probe_results(spark, index):
    """compact() collapses re-appended rows without changing any probe
    answer."""
    dup = [(90, "the quick brown fox jumps over the lazy dog near the river bank")]
    index.update(_df(spark, dup))
    index.update(_df(spark, dup))  # same content appended twice
    batch = _df(spark, [(91, "the quick brown fox jumps over the lazy dog near the river bank")])
    before = sorted(map(tuple, index.probe(batch).collect()))
    n_exact_before = spark.read.parquet(index.exact_dir).count()
    index.compact()
    after = sorted(map(tuple, index.probe(batch).collect()))
    n_exact_after = spark.read.parquet(index.exact_dir).count()
    assert before == after
    assert n_exact_after < n_exact_before  # duplicate hash rows collapsed


def test_string_ids_are_supported(spark, tmp_path):
    """near-dup tie-breaking must not assume numeric ids (a negated-id
    max(struct) would crash or null out for strings)."""
    rows = [
        ("a", "the quick brown fox jumps over the lazy dog near the river"),
        ("b", "pack my box with five dozen liquor jugs before the voyage"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    idx = DedupIndex.build(df, "text", "doc_id", str(tmp_path / "sidx"))
    probe = spark.createDataFrame(
        [("z", "the quick brown fox jumps over the lazy dog near the creek")],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r for r in idx.probe(probe, threshold=0.5).collect()}
    assert got["z"]["near_dup_of"] == "a"


def test_compact_crash_before_pointer_flip_serves_old_epoch(spark, index):
    """A compact that crashed BEFORE the meta pointer flip leaves
    (possibly torn) next-epoch staging dirs that nothing references:
    reopening serves the old epoch unchanged, a PLAIN open is read-only
    (it must not sweep — it could be racing another process's live
    compact), and fsck(repair=True) sweeps the debris."""
    import os

    batch = _df(spark, [(97, "the quick brown fox jumps over the lazy dog near the river bank")])
    before = sorted(map(tuple, index.probe(batch).collect()))
    os.makedirs(f"{index.path}/exact.e1")
    with open(f"{index.path}/exact.e1/part-torn.parquet", "wb") as f:
        f.write(b"half a parquet file")
    os.makedirs(f"{index.path}/bands.e1")
    reopened = DedupIndex(spark, index.path)
    assert reopened.epoch == 0
    after = sorted(map(tuple, reopened.probe(batch).collect()))
    assert after == before
    # plain open left the (possibly another writer's) staging alone
    assert os.path.exists(f"{index.path}/exact.e1")
    assert os.path.exists(f"{index.path}/bands.e1")
    reopened.fsck(repair=True)
    assert not os.path.exists(f"{index.path}/exact.e1")
    assert not os.path.exists(f"{index.path}/bands.e1")


def test_compact_crash_after_pointer_flip_serves_new_epoch(spark, index):
    """A compact that crashed AFTER the flip but before sweeping the
    old dirs serves the new epoch (the flip is the commit point) and
    the stale previous-epoch dirs are swept on reopen."""
    import os

    dup = [(95, "the quick brown fox jumps over the lazy dog near the river bank")]
    index.update(_df(spark, dup))
    batch = _df(spark, [(96, "the quick brown fox jumps over the lazy dog near the river bank")])
    before = sorted(map(tuple, index.probe(batch).collect()))

    class CrashAfterFlip(RuntimeError):
        pass

    orig_rmtree = index._fs.rmtree

    def exploding_rmtree(p):
        raise CrashAfterFlip(p)

    index._fs.rmtree = exploding_rmtree
    try:
        with pytest.raises(CrashAfterFlip):
            index.compact()
    finally:
        index._fs.rmtree = orig_rmtree
    # the flip happened; old-epoch dirs are stale debris
    assert os.path.isdir(f"{index.path}/exact")
    assert os.path.isdir(f"{index.path}/exact.e1")

    reopened = DedupIndex(spark, index.path, gc_on_open=True)
    assert reopened.epoch == 1
    after = sorted(map(tuple, reopened.probe(batch).collect()))
    assert after == before
    # gc_on_open (the single-process deployment's opt-in) swept them
    assert not os.path.exists(f"{index.path}/exact")
    assert not os.path.exists(f"{index.path}/bands")
    # the compact completed: duplicate hash rows collapsed
    per_hash = (
        spark.read.parquet(reopened.exact_dir)
        .groupBy("text_hash").count().agg(F.max("count")).collect()[0][0]
    )
    assert per_hash == 1


def test_index_lifecycle_through_hadoop_fs(spark, index, tmp_path):
    """The whole DedupIndex lifecycle (build → update → compact →
    reopen) through the Hadoop FileSystem implementation — the
    object-store control-plane path, driven against file:."""
    from lsd2_spark.sources.fs import HadoopFS

    fs = HadoopFS(spark)
    idx = DedupIndex.build(
        _df(spark, _BASE), "text", "doc_id", str(tmp_path / "hidx"), fs=fs
    )
    dup = [(95, "the quick brown fox jumps over the lazy dog near the river bank")]
    idx.update(_df(spark, dup))
    idx.update(_df(spark, dup))
    batch = _df(spark, [(96, "the quick brown fox jumps over the lazy dog near the river bank")])
    before = sorted(map(tuple, idx.probe(batch).collect()))
    idx.compact()
    after = sorted(map(tuple, idx.probe(batch).collect()))
    assert before == after
    reopened = DedupIndex(spark, idx.path, fs=fs)
    assert reopened._fs is fs
    assert sorted(map(tuple, reopened.probe(batch).collect())) == before


def test_probe_scan_carries_band_partition_filter(spark, index):
    """Scale guard #2: the bands/ scan must prune at the PARTITION level
    — its PartitionFilters must carry the band predicate (spelled as a
    static isin over the probed bands), so a probe reads exactly the
    probed band directories rather than the whole index footprint and
    never depends on dynamic partition pruning firing."""
    batch = [(71, "the quick brown fox jumps over the lazy dog near the river bank")]
    out = index.probe(_df(spark, batch))
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    # the bands/ table is the only partitioned scan in the probe, so a
    # static band IN-list in any PartitionFilters belongs to it
    assert re.search(r"PartitionFilters: \[band#\d+ IN \(0,", plan), (
        "bands/ scan has no static band PartitionFilter"
    )


def test_fsck_reports_backlog_orphans_and_health(spark, index):
    """fsck: duplicate-hash backlog appears after re-appends and clears
    after compact; an orphan epoch dir (crashed-compact debris created
    AFTER open, so the open-time sweep missed it) flags unhealthy until
    repair=True removes it; an empty index is structurally healthy."""
    import os

    dup = [(95, "the quick brown fox jumps over the lazy dog near the river bank")]
    index.update(_df(spark, dup))
    index.update(_df(spark, dup))
    rep = index.fsck()
    assert rep["healthy"] and rep["epoch"] == 0
    assert rep["duplicate_hash_backlog"] >= 1
    index.compact()
    rep2 = index.fsck()
    assert rep2["epoch"] == 1 and rep2["duplicate_hash_backlog"] == 0
    # the appended dup shares doc 1's hash: compact collapses to one
    # row per DISTINCT hash
    assert rep2["exact_rows"] == len(_BASE)

    os.makedirs(f"{index.path}/exact.e7")  # debris landing post-open
    rep3 = index.fsck()
    assert not rep3["healthy"] and rep3["orphan_dirs"] == ["exact.e7"]
    rep4 = index.fsck(repair=True)
    assert rep4["repaired"] and not os.path.exists(f"{index.path}/exact.e7")
    assert index.fsck()["healthy"]

    empty = DedupIndex.build(
        spark.createDataFrame([], "doc_id long, text string"),
        "text", "doc_id", f"{index.path}_empty",
    )
    erep = empty.fsck()
    assert erep["healthy"] and erep["exact_rows"] == 0 and erep["bands_rows"] == 0
