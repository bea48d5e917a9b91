"""Catalog.rebalance: in-place splitting of over-threshold cells —
row preservation, rank integrity, query parity (cone + boundary-correct
cross-match), margin superset for the new children, idempotence, and
two-phase crash recovery (rollback AND roll-forward)."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest

from lsd2_spark.catalog import Catalog, partition_catalog

RNG = np.random.default_rng(31)


def _pdf(n=6000):
    ra = RNG.uniform(0, 360, n)
    dec = np.degrees(np.arcsin(RNG.uniform(-1, 1, n)))
    hot = int(n * 0.5)  # dense hotspot: the cells rebalance will split
    ra[:hot] = RNG.normal(45, 0.8, hot) % 360
    dec[:hot] = np.clip(RNG.normal(10, 0.8, hot), -89, 89)
    return pd.DataFrame(
        {
            "source_id": np.arange(n, dtype=np.int64),
            "ra": ra,
            "dec": dec,
            "mag": RNG.uniform(10, 22, n),
        }
    )


def _build_over(spark, tmp_path, name, margins=True):
    """Catalog ingested at a coarse threshold, then rebalance-tested at
    a lower one (equivalent to appends having pushed cells over)."""
    return partition_catalog(
        spark.createDataFrame(_pdf()), str(tmp_path / name), name,
        ra_col="ra", dec_col="dec", id_col="source_id",
        threshold=3000, order_k=4, write_margins=margins,
    )


def _cells(cat):
    return {
        (r["Norder"], r["Npix"]): r["count"]
        for r in cat.df().groupBy("Norder", "Npix").count().collect()
    }


def test_rebalance_splits_and_preserves_everything(spark, tmp_path):
    cat = _build_over(spark, tmp_path, "rb")
    thr = 700
    before_cells = _cells(cat)
    assert any(c > thr for c in before_cells.values())
    before_rows = {
        r["source_id"]: (r["ra"], r["dec"], r["mag"])
        for r in cat.df().collect()
    }
    cone_before = sorted(
        r["source_id"] for r in cat.cone_search(45.0, 10.0, 3.0).collect()
    )

    cat2 = cat.rebalance(threshold=thr)

    after_cells = _cells(cat2)
    assert all(c <= thr for c in after_cells.values()), after_cells
    # untouched cells keep their identity
    for cell, c in before_cells.items():
        if c <= thr:
            assert after_cells.get(cell) == c
    # rows are exactly preserved
    after_rows = {
        r["source_id"]: (r["ra"], r["dec"], r["mag"])
        for r in cat2.df().collect()
    }
    assert after_rows == before_rows
    assert cat2.meta.n_sources == cat.meta.n_sources
    # coverage map matches disk, ranks contiguous, no stale markers
    rep = cat2.fsck()
    assert rep["consistent"], rep
    # cone search parity
    cone_after = sorted(
        r["source_id"] for r in cat2.cone_search(45.0, 10.0, 3.0).collect()
    )
    assert cone_after == cone_before
    # idempotent
    cat3 = cat2.rebalance(threshold=thr)
    assert _cells(cat3) == after_cells
    # reload from disk sees the committed state
    rl = Catalog.load(spark, cat.path, "rb")
    assert _cells(rl) == after_cells


def test_rebalance_preserves_crossmatch_and_margins(spark, tmp_path):
    """The margin rebuild for child cells must keep kNN cross-match
    boundary-correct: pair sets identical before and after the split."""
    cat = _build_over(spark, tmp_path, "rbx")
    other_pdf = _pdf(1200)
    other_pdf["source_id"] += 1_000_000
    other = partition_catalog(
        spark.createDataFrame(other_pdf), str(tmp_path / "other"), "other",
        ra_col="ra", dec_col="dec", id_col="source_id",
        threshold=3000, order_k=4, write_margins=True,
    )
    before = sorted(
        (r[0], r[1])
        for r in cat.cross_match(other, n_neighbors=2, dthresh=0.5)
        .select("rbx_source_id", "other_source_id")
        .collect()
    )
    cat2 = cat.rebalance(threshold=700)
    after = sorted(
        (r[0], r[1])
        for r in cat2.cross_match(other, n_neighbors=2, dthresh=0.5)
        .select("rbx_source_id", "other_source_id")
        .collect()
    )
    assert after == before
    # every split-parent halo dir is gone; children have halo dirs
    m = cat2.margin_df()
    assert m is not None
    halo_cells = {
        (r["Norder"], r["Npix"])
        for r in m.select("Norder", "Npix").distinct().collect()
    }
    data_cells = set(_cells(cat2))
    assert halo_cells <= data_cells  # halos only for live cells


class _Boom(RuntimeError):
    pass


def test_crash_before_done_marker_rolls_back(spark, tmp_path):
    """Kill during the child rewrite (pre marker on disk, child dirs
    possibly partial): the next rebalance rolls back and then completes
    cleanly from the original state."""
    cat = _build_over(spark, tmp_path, "rbc1", margins=False)
    thr = 700
    before_rows = cat.df().count()

    # simulate the torn window: run the planning by hand — write a pre
    # marker and a PARTIAL child dir, as if the write died mid-job
    over = [(o, p, c) for (o, p), c in _cells(cat).items() if c > thr]
    o, p, _ = over[0]
    o2 = o + 2
    lo, _hi = cat._rebalance_children_of(o, p, o2)
    with open(cat._rebalance_intent_path(), "w") as f:
        json.dump(
            {"phase": "pre", "splits": [[o, p]], "child_cells": [[o2, lo]]}, f
        )
    fake = f"{cat.path}/catalog/Norder={o2}/Dir=0/Npix={lo}"
    os.makedirs(fake, exist_ok=True)
    # a torn parquet fragment
    spark.createDataFrame(
        [(99_999_999, 1.0, 1.0, 11.0)], "source_id long, ra double, dec double, mag double"
    ).coalesce(1).write.mode("overwrite").parquet(fake)

    healed = cat.rebalance(threshold=thr)
    assert healed.df().count() == before_rows  # the fake fragment is gone
    assert healed.df().filter("source_id = 99999999").count() == 0
    assert all(c <= thr for c in _cells(healed).values())
    assert healed.fsck()["consistent"]


def test_crash_after_done_marker_rolls_forward(spark, tmp_path):
    """Kill after the child rewrite committed (done marker) but before
    parent removal/metadata: fsck(repair=True) rolls forward to the
    fully-split state with no duplicate rows."""
    cat = _build_over(spark, tmp_path, "rbc2", margins=False)
    thr = 700
    n0 = cat.df().count()

    orig = Catalog._rebalance_finish

    def boom(self, *a, **k):
        raise _Boom("crash before finish")

    Catalog._rebalance_finish = boom
    try:
        with pytest.raises(_Boom):
            cat.rebalance(threshold=thr)
    finally:
        Catalog._rebalance_finish = orig

    # torn state: children AND parents both on disk -> duplicates
    stale = Catalog.load(spark, cat.path, "rbc2")
    assert stale.df().count() > n0
    rep = stale.fsck()
    assert not rep["consistent"] and rep["stale_rebalance_intent"]

    rep2 = stale.fsck(repair=True)
    assert rep2["repaired"]
    healed = Catalog.load(spark, cat.path, "rbc2")
    assert healed.df().count() == n0
    assert all(c <= thr for c in _cells(healed).values())
    assert healed.fsck()["consistent"]


def test_delete_reconciles_a_crashed_rebalance_first(spark, tmp_path):
    """A delete on a catalog with a stale rebalance marker must NOT
    operate on the row-duplicated torn state (parents + children both
    on disk): it reconciles the rebalance first, so match counts and
    n_sources stay exact."""
    cat = _build_over(spark, tmp_path, "xmark", margins=False)
    thr = 700
    n0 = cat.meta.n_sources

    orig = Catalog._rebalance_finish

    def boom(self, *a, **k):
        raise _Boom("crash before finish")

    Catalog._rebalance_finish = boom
    try:
        with pytest.raises(_Boom):
            cat.rebalance(threshold=thr)
    finally:
        Catalog._rebalance_finish = orig

    stale = Catalog.load(spark, cat.path, "xmark")
    assert stale.df().count() > n0  # duplicated torn state
    n_victims_true = int(
        stale.df().dropDuplicates(["source_id"]).filter("mag > 21.5").count()
    )

    cat2 = stale.delete("mag > 21.5")
    assert cat2.meta.n_sources == n0 - n_victims_true
    assert cat2.df().count() == n0 - n_victims_true
    assert cat2.df().filter("mag > 21.5").count() == 0
    assert cat2.fsck()["consistent"]


def test_append_after_rebalance_respects_fine_leaves(spark, tmp_path):
    """After a rebalance leaves cells FINER than order_k, an append
    must (a) assign new rows into those fine leaves (the probe must
    shift down from the finest coverage order — a negative shift was
    silently masked into garbage), and (b) never open an order_k leaf
    spatially containing existing finer leaves (a later rebalance's
    dynamic overwrite would clobber them).  Four append+rebalance
    rounds onto one hotspot must preserve every row with no duplicate
    ids and consistent metadata."""
    import pandas as pd

    rng = np.random.default_rng(17)

    def batch(n, offset):
        return pd.DataFrame(
            {
                "source_id": np.arange(offset, offset + n, dtype=np.int64),
                "ra": rng.normal(200.0, 0.3, n) % 360,
                "dec": np.clip(rng.normal(5.0, 0.3, n), -89, 89),
                "mag": rng.uniform(10, 22, n),
            }
        )

    cat = partition_catalog(
        spark.createDataFrame(batch(300, 0)), str(tmp_path / "ar"), "ar",
        ra_col="ra", dec_col="dec", id_col="source_id",
        threshold=400, order_k=3, write_margins=False,
    )
    for b in range(4):
        cat = cat.append(
            spark.createDataFrame(batch(300, 1000 + b * 300)), batch_id=b
        )
        cat = cat.rebalance()
        n = 300 + (b + 1) * 300
        assert cat.df().count() == n
        assert cat.meta.n_sources == n
        assert cat.df().groupBy("source_id").count().filter("count > 1").count() == 0
        assert cat.fsck()["consistent"]
    # coverage stayed disjoint: no leaf is an ancestor of another
    leaves = [(o, p) for o, ps in cat.meta.hips.items() for p in ps]
    for o1, p1 in leaves:
        for o2, p2 in leaves:
            if o1 < o2:
                assert (p2 >> (2 * (o2 - o1))) != p1, ((o1, p1), (o2, p2))


def test_append_reconciles_a_crashed_rebalance_first(spark, tmp_path):
    """The round-8 advisory bug: in the crash window after rebalance
    commits its 'done' marker but before the metadata commit, a
    restarted stream replays its batch through append() FIRST.  An
    append planned against the stale committed coverage (parents still
    listed) writes the batch into parent directories that the next
    reconciliation rolls forward and removes — permanent row loss plus
    n_sources overcount.  append() must converge the marker at entry,
    exactly as delete() and rebalance() do."""
    cat = _build_over(spark, tmp_path, "apx", margins=False)
    thr = 700
    n0 = cat.df().count()

    orig = Catalog._rebalance_finish

    def boom(self, *a, **k):
        raise _Boom("crash after done marker, before finish")

    Catalog._rebalance_finish = boom
    try:
        with pytest.raises(_Boom):
            cat.rebalance(threshold=thr)
    finally:
        Catalog._rebalance_finish = orig

    stale = Catalog.load(spark, cat.path, "apx")
    assert os.path.exists(stale._rebalance_intent_path())
    assert stale.df().count() > n0  # torn: parents + children both on disk

    # the replayed batch lands squarely in the split hotspot — exactly
    # the rows the stale parent directories would have swallowed
    batch = pd.DataFrame(
        {
            "source_id": np.arange(10_000, 10_200, dtype=np.int64),
            "ra": RNG.normal(45, 0.5, 200) % 360,
            "dec": np.clip(RNG.normal(10, 0.5, 200), -89, 89),
            "mag": RNG.uniform(10, 22, 200),
        }
    )
    cat2 = stale.append(spark.createDataFrame(batch), batch_id=7)

    assert not os.path.exists(cat2._rebalance_intent_path())
    assert cat2.df().count() == n0 + 200
    assert cat2.meta.n_sources == n0 + 200
    # every appended row survived (none written into removed parents)
    assert cat2.df().filter("source_id >= 10000").count() == 200
    assert cat2.fsck()["consistent"]

    # ...and survives a SUBSEQUENT rebalance (the window where the old
    # behavior silently destroyed the rows)
    cat3 = cat2.rebalance(threshold=thr)
    assert cat3.df().count() == n0 + 200
    assert cat3.meta.n_sources == n0 + 200
    assert cat3.df().filter("source_id >= 10000").count() == 200
    assert (
        cat3.df().groupBy("source_id").count().filter("count > 1").count() == 0
    )
    assert cat3.fsck()["consistent"]


def test_rebalance_threshold_zero_raises(spark, tmp_path):
    """threshold=0 must raise, not silently fall back to the ingest
    threshold (the old `threshold or meta.pix_threshold` coercion)."""
    cat = _build_over(spark, tmp_path, "thr0", margins=False)
    with pytest.raises(ValueError, match="threshold"):
        cat.rebalance(threshold=0)
    with pytest.raises(ValueError, match="threshold"):
        cat.rebalance(threshold=-5)


def test_rebalance_reliable_cuts_are_reclaimed(spark, tmp_path):
    """Round-12: under the "auto" lineage-cut default a session with a
    checkpoint dir makes the halo-rebuild cut a RELIABLE checkpoint;
    it is consumed entirely by the rewrite, so rebalance must delete
    it — an auto_rebalance stream would otherwise leave one snapshot
    per rebalance in the job store."""
    import os as _os

    cat = _build_over(spark, tmp_path, "rbrc")
    job_ckpt = str(tmp_path / "jobstore")
    prev = spark.sparkContext.getCheckpointDir()
    spark.sparkContext.setCheckpointDir(job_ckpt)
    try:
        cat2 = cat.rebalance(threshold=700)
    finally:
        spark.sparkContext.setCheckpointDir(prev)
    assert cat2.fsck()["consistent"]
    assert cat2.df().count() == cat.meta.n_sources
    leftovers = [
        d
        for _, dirs, _ in _os.walk(job_ckpt)
        for d in dirs
        if d.startswith("rdd-")
    ]
    assert leftovers == [], (
        f"rebalance left reliable checkpoints behind: {leftovers}"
    )
