"""Catalog.compact: small-file coalescing after repeated appends —
byte-level file counts, row/_ID/metadata preservation, partition-pruned
reads, neighbor-halo compaction, idempotence, query parity, and stale
lifecycle-marker convergence at entry."""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lsd2_spark.catalog import Catalog, partition_catalog

RNG = np.random.default_rng(47)


def _pdf(n, start=0):
    ra = RNG.uniform(0, 360, n)
    dec = np.degrees(np.arcsin(RNG.uniform(-1, 1, n)))
    return pd.DataFrame(
        {
            "source_id": np.arange(start, start + n, dtype=np.int64),
            "ra": ra,
            "dec": dec,
            "mag": RNG.uniform(10, 22, n),
        }
    )


def _build_appended(spark, tmp_path, name, batches=3, margins=True):
    cat = partition_catalog(
        spark.createDataFrame(_pdf(1500)), str(tmp_path / name), name,
        ra_col="ra", dec_col="dec", id_col="source_id",
        threshold=100_000, order_k=2, write_margins=margins,
    )
    for b in range(batches):
        cat = cat.append(
            spark.createDataFrame(_pdf(600, start=10_000 + 600 * b))
        )
    return cat


def _cell_files(cat, root="catalog"):
    out = {}
    for f in glob.glob(f"{cat.path}/{root}/Norder=*/Dir=*/Npix=*/*.parquet"):
        cell = os.path.dirname(f)
        out.setdefault(cell, []).append(os.path.basename(f))
    return out


def _fragment_cells(cat, k=3):
    """Simulate an external bulk loader: split some cell files in two
    (content-identical, ranks intact) — the engine's own writers keep
    the main table one-file-per-cell, so main-table fragmentation can
    only arrive from outside."""
    import pyarrow.parquet as pq

    done = []
    for cell in sorted(_cell_files(cat))[:k]:
        files = sorted(
            f for f in os.listdir(cell) if f.endswith(".parquet")
        )
        t = pq.read_table(os.path.join(cell, files[0]))
        if t.num_rows < 2:
            continue
        half = t.num_rows // 2
        pq.write_table(t.slice(0, half), os.path.join(cell, "part-ext-a.parquet"))
        pq.write_table(t.slice(half), os.path.join(cell, "part-ext-b.parquet"))
        os.remove(os.path.join(cell, files[0]))
        done.append(cell)
    return done


def test_compact_coalesces_preserves_and_is_idempotent(spark, tmp_path):
    cat = _build_appended(spark, tmp_path, "cp")
    fragged = _fragment_cells(cat)
    assert fragged, "fixture should have fragmented some cells"
    files_before = _cell_files(cat)
    multi = {c for c, fs in files_before.items() if len(fs) > 1}
    assert multi
    before = sorted(
        (r["source_id"], r["_ID"], r["Norder"], r["Npix"], r["mag"])
        for r in cat.df().collect()
    )
    meta_before = json.dumps(cat.meta.to_json(), sort_keys=True)

    cat2 = cat.compact()
    files_after = _cell_files(cat2)
    assert all(len(fs) == 1 for fs in files_after.values())
    # rows, ranks, placement, payload, metadata: all byte-identical
    after = sorted(
        (r["source_id"], r["_ID"], r["Norder"], r["Npix"], r["mag"])
        for r in cat2.df().collect()
    )
    assert after == before
    assert json.dumps(cat2.meta.to_json(), sort_keys=True) == meta_before
    assert cat2.fsck()["consistent"]

    # storage-order contract: each compacted file is _ID-sorted
    for cell in sorted(files_after):
        pdf = pd.read_parquet(cell)
        ids = pdf["_ID"].to_numpy()
        assert (ids[1:] >= ids[:-1]).all(), cell

    # idempotent: nothing left to do, no file churn
    names2 = {c: fs for c, fs in files_after.items()}
    cat3 = cat2.compact()
    assert _cell_files(cat3) == names2


def test_compact_untouched_cells_keep_their_files(spark, tmp_path):
    cat = _build_appended(spark, tmp_path, "cpu")
    _fragment_cells(cat, k=2)
    files_before = _cell_files(cat)
    single = {c: fs for c, fs in files_before.items() if len(fs) == 1}
    assert single, "need some single-file cells to prove pruning"
    cat2 = cat.compact()
    files_after = _cell_files(cat2)
    for cell, fs in single.items():
        assert files_after[cell] == fs, "single-file cell was rewritten"


def test_compact_prunes_the_read_to_target_cells(spark, tmp_path):
    cat = _build_appended(spark, tmp_path, "cpp")
    _fragment_cells(cat, k=2)
    cells = cat._multifile_cells("catalog", 1)
    assert cells
    cell_key = F.col("Norder").cast("long") * F.lit(1 << 40) + F.col(
        "Npix"
    ).cast("long")
    pred = cell_key.isin([(o << 40) + p for o, p in cells])
    plan = (
        cat.df().filter(pred)._jdf.queryExecution().executedPlan().toString()
    )
    # the cell predicate must reach the scan as a partition filter,
    # not a post-scan row filter over the whole catalog
    assert "PartitionFilters: [" in plan
    head = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "Npix" in head


def test_compact_covers_neighbor_halos(spark, tmp_path):
    cat = _build_appended(spark, tmp_path, "cpn", margins=True)
    halo_before = sorted(
        tuple(r) for r in cat.margin_df().select("source_id", "Npix").collect()
    )
    multi = {
        c for c, fs in _cell_files(cat, "neighbor").items() if len(fs) > 1
    }
    if not multi:
        pytest.skip("appends did not fragment the neighbor table")
    cat2 = cat.compact()
    assert all(len(fs) == 1 for fs in _cell_files(cat2, "neighbor").values())
    halo_after = sorted(
        tuple(r) for r in cat2.margin_df().select("source_id", "Npix").collect()
    )
    assert halo_after == halo_before


def test_compact_query_parity_and_validation(spark, tmp_path):
    cat = _build_appended(spark, tmp_path, "cpq")
    cone_before = sorted(
        r["source_id"] for r in cat.cone_search(45.0, 10.0, 5.0).collect()
    )
    cat2 = cat.compact()
    cone_after = sorted(
        r["source_id"] for r in cat2.cone_search(45.0, 10.0, 5.0).collect()
    )
    assert cone_after == cone_before
    with pytest.raises(ValueError):
        cat2.compact(max_files=0)


def test_compact_converges_stale_rebalance_marker_first(spark, tmp_path):
    cat = _build_appended(spark, tmp_path, "cpm", margins=False)
    # plant a pre-phase marker with no partial state: rollback is a
    # no-op, but compact must still converge it before touching disk
    with open(cat._rebalance_intent_path(), "w") as f:
        json.dump({"phase": "pre", "splits": [], "child_cells": []}, f)
    cat2 = cat.compact()
    assert not os.path.exists(cat2._rebalance_intent_path())
    assert all(len(fs) == 1 for fs in _cell_files(cat2).values())
    assert cat2.fsck()["consistent"]
