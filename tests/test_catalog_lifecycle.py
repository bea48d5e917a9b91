"""Randomized lifecycle interleaving (VERDICT r7 item 6): both real
catalog-corruption bugs found to date (delete-vs-rebalance cross-marker
blindness; append-over-fine-leaves) were INTERACTION defects between
append/delete/rebalance/crash/fsck — states no single-operation test
visits.  This property test runs a seeded random ~30-op sequence over
{append, delete, rebalance, crash-injected variants of each, fsck} and
asserts, after every converged state: exact row-SET equality against a
plain-dict oracle, n_sources accounting, no duplicate ids, and
fsck-consistency.

Crash semantics mirrored in the oracle:
- a crashed delete is APPLIED (its intent marker records the victims;
  every reconciliation path rolls it forward);
- a crashed rebalance is row-preserving either way (pre -> rollback,
  done -> roll-forward; the row set never changes);
- a crashed append is applied by REPLAYING the same batch_id to
  completion (the streaming contract), so the oracle applies it once.

A crash leaves the catalog torn until the NEXT operation (or fsck)
converges it — exactly the cross-marker window the round-8 append fix
closed — so assertions run on every post-convergence state, not on the
torn intermediate.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from lsd2_spark.catalog import Catalog, partition_catalog


class _Boom(RuntimeError):
    pass


def _boom(*a, **k):
    raise _Boom("injected crash")


def _mkrows(rng, ids):
    n = len(ids)
    return pd.DataFrame(
        {
            "source_id": np.asarray(ids, dtype=np.int64),
            # clustered hotspot keeps rebalance busy; tail keeps
            # coverage growing so append opens new leaves too
            "ra": np.where(
                rng.uniform(size=n) < 0.7,
                rng.normal(45.0, 0.6, n) % 360,
                rng.uniform(0, 360, n),
            ),
            "dec": np.where(
                rng.uniform(size=n) < 0.7,
                np.clip(rng.normal(10.0, 0.6, n), -89, 89),
                np.degrees(np.arcsin(rng.uniform(-1, 1, n))),
            ),
            "mag": rng.uniform(10, 22, n),
        }
    )


N_STEPS = 30


def _fragment_cells_on_disk(path: str, k: int = 2) -> list:
    """Split the first k cell files in two content-identical halves
    (ranks intact) — the external-bulk-loader fragmentation compact
    exists for, so the compact/compact_crash ops have real work."""
    import glob

    import pyarrow.parquet as pq

    done = []
    cells = sorted(
        {
            os.path.dirname(f)
            for f in glob.glob(f"{path}/catalog/Norder=*/Dir=*/Npix=*/*.parquet")
        }
    )
    for cell in cells[:k]:
        files = sorted(f for f in os.listdir(cell) if f.endswith(".parquet"))
        if len(files) != 1:
            continue
        t = pq.read_table(os.path.join(cell, files[0]))
        if t.num_rows < 2:
            continue
        half = t.num_rows // 2
        pq.write_table(t.slice(0, half), os.path.join(cell, "part-ext-a.parquet"))
        pq.write_table(t.slice(half), os.path.join(cell, "part-ext-b.parquet"))
        os.remove(os.path.join(cell, files[0]))
        done.append(cell)
    return done


@pytest.fixture(params=["local", "hadoop"])
def lifecycle_fs(request, spark):
    """Run the battery through BOTH LifecycleFS implementations: the
    POSIX default and the Hadoop FileSystem (JVM gateway) against
    file:// — Hadoop's local FS faithfully exhibits the non-POSIX
    listing/rename semantics the lifecycle contract guards."""
    if request.param == "local":
        from lsd2_spark.sources.fs import LOCAL_FS

        return LOCAL_FS
    from lsd2_spark.sources.fs import HadoopFS

    return HadoopFS(spark)


def test_randomized_lifecycle_interleaving(spark, tmp_path, lifecycle_fs):
    fs = lifecycle_fs
    rng = np.random.default_rng(93)
    name = "life"
    path = str(tmp_path / name)

    init = _mkrows(rng, range(2500))
    oracle = {int(r.source_id): round(float(r.mag), 9) for r in init.itertuples()}
    cat = partition_catalog(
        spark.createDataFrame(init), path, name,
        ra_col="ra", dec_col="dec", id_col="source_id",
        threshold=1200, order_k=3, write_margins=False, fs=fs,
    )
    next_id = 10_000
    batch_id = 0
    mag_cuts = [21.0, 20.0, 19.0, 18.5]  # progressively deeper deletes

    def check(c):
        rows = {
            int(r["source_id"]): round(float(r["mag"]), 9)
            for r in c.df().select("source_id", "mag").collect()
        }
        assert len(rows) == c.df().count(), "duplicate source_id on disk"
        assert rows == oracle
        assert c.meta.n_sources == len(oracle)
        assert c.fsck()["consistent"]
        # coverage disjointness: no leaf is an ancestor of another
        leaves = [(o, p) for o, ps in c.meta.hips.items() for p in ps]
        for o1, p1 in leaves:
            for o2, p2 in leaves:
                if o1 < o2:
                    assert (p2 >> (2 * (o2 - o1))) != p1

    ops = [
        "append", "append", "delete", "rebalance", "compact",
        "append_crash", "delete_crash", "rebalance_crash",
        "compact_crash", "fsck",
    ]
    torn = False
    for step in range(N_STEPS):
        op = ops[int(rng.integers(len(ops)))]
        if torn and op.endswith("_crash"):
            # converge first: injecting a crash into an already-torn
            # catalog fires the boom inside the ENTRY reconciliation
            # (itself a _commit_meta caller), before the op's own
            # intent marker exists — a state whose oracle semantics
            # differ from "op crashed mid-flight"
            Catalog.load(spark, path, name, fs=fs).fsck(repair=True)
            torn = False
        cat = Catalog.load(spark, path, name, fs=fs)

        if op in ("append", "append_crash"):
            ids = list(range(next_id, next_id + int(rng.integers(100, 300))))
            next_id = ids[-1] + 1
            pdf = _mkrows(rng, ids)
            batch_id += 1
            if op == "append_crash":
                orig = Catalog._commit_meta
                Catalog._commit_meta = _boom
                try:
                    with pytest.raises(_Boom):
                        cat.append(spark.createDataFrame(pdf), batch_id=batch_id)
                finally:
                    Catalog._commit_meta = orig
                # streaming replay: same batch_id, runs to completion
                cat = Catalog.load(spark, path, name, fs=fs).append(
                    spark.createDataFrame(pdf), batch_id=batch_id
                )
            else:
                cat = cat.append(spark.createDataFrame(pdf), batch_id=batch_id)
            for r in pdf.itertuples():
                oracle[int(r.source_id)] = round(float(r.mag), 9)
            torn = False

        elif op in ("delete", "delete_crash"):
            cut = mag_cuts[int(rng.integers(len(mag_cuts)))]
            pred = f"mag > {cut}"
            victims = [k for k, m in oracle.items() if m > cut]
            if op == "delete_crash" and victims:
                orig = Catalog._commit_meta
                Catalog._commit_meta = _boom
                try:
                    with pytest.raises(_Boom):
                        cat.delete(pred)
                finally:
                    Catalog._commit_meta = orig
                torn = True  # converges on the next op / fsck
            else:
                cat = cat.delete(pred)
                torn = False
            # a crashed delete's marker is rolled FORWARD everywhere
            for k in victims:
                del oracle[k]

        elif op in ("rebalance", "rebalance_crash"):
            if op == "rebalance_crash":
                orig = Catalog._rebalance_finish
                Catalog._rebalance_finish = _boom
                try:
                    try:
                        cat.rebalance(threshold=600)
                    except _Boom:
                        torn = True
                    else:
                        torn = False  # nothing was over threshold
                finally:
                    Catalog._rebalance_finish = orig
            else:
                cat = cat.rebalance(threshold=600)
                torn = False

        elif op in ("compact", "compact_crash"):
            # content-identical by contract: the oracle doesn't move.
            # The engine's own writers are one-file-per-cell and this
            # fixture has no margins, so compaction would be a no-op
            # (and the crash seam unreachable): fragment a couple of
            # cells first, as an external bulk loader would
            _fragment_cells_on_disk(path, k=2)
            if op == "compact_crash":
                # alternate which phase the crash hits: 'staged'
                # exercises rollback, 'done' exercises roll-forward
                phase = ("staged", "done")[int(rng.integers(2))]

                def _boom_at(self, p, _phase=phase):
                    if p == _phase:
                        raise _Boom(p)

                orig = Catalog._compact_checkpoint
                Catalog._compact_checkpoint = _boom_at
                try:
                    try:
                        cat.compact()
                    except _Boom:
                        torn = True
                    else:
                        torn = False  # nothing was fragmented
                finally:
                    Catalog._compact_checkpoint = orig
            else:
                cat = cat.compact()
                torn = False

        elif op == "fsck":
            cat.fsck(repair=True)
            cat = Catalog.load(spark, path, name, fs=fs)
            torn = False

        if not torn:
            check(Catalog.load(spark, path, name, fs=fs))

    # converge whatever the sequence ended on and do the final audit
    Catalog.load(spark, path, name, fs=fs).fsck(repair=True)
    final = Catalog.load(spark, path, name, fs=fs)
    check(final)
    assert not os.path.exists(final._delete_intent_path())
    assert not os.path.exists(final._rebalance_intent_path())
    assert not os.path.exists(final._compact_intent_path())
