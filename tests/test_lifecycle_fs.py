"""Lifecycle filesystem abstraction (sources/fs.py) — VERDICT r8 item 4.

The compact/delete/rebalance/fsck layer must hold its crash contract
through an injected filesystem whose ``rename`` is NOT atomic (the
object-store copy-then-delete reality), including a crash that tears
the destination mid-copy.  "Config-only cloud" is only true of the
lifecycle ops once these pass."""

from __future__ import annotations

import os

from tests.test_catalog_compact import _build_appended, _cell_files, _fragment_cells

from lsd2_spark.catalog import Catalog
from lsd2_spark.sources.fs import LOCAL_FS, LocalFS


class CopyDeleteFS(LocalFS):
    """Object-store-shaped rename: copy bytes, then delete the source —
    never atomic, torn destination possible on crash."""

    def __init__(self):
        self.renames = 0

    def rename(self, src: str, dst: str) -> None:
        self.renames += 1
        with open(src, "rb") as f:
            data = f.read()
        with open(dst, "wb") as f:
            f.write(data)
        os.remove(src)


class TornRenameFS(CopyDeleteFS):
    """Crashes mid-copy on the ``crash_on``-th rename: leaves HALF the
    source bytes at the destination and the source intact — the worst
    legal state of a non-atomic rename."""

    def __init__(self, crash_on: int):
        super().__init__()
        self.crash_on = crash_on

    def rename(self, src: str, dst: str) -> None:
        self.renames += 1
        if self.renames == self.crash_on:
            with open(src, "rb") as f:
                data = f.read()
            with open(dst, "wb") as f:
                f.write(data[: max(1, len(data) // 2)])
            raise RuntimeError("injected crash mid-copy")
        with open(src, "rb") as f:
            data = f.read()
        with open(dst, "wb") as f:
            f.write(data)
        os.remove(src)


def _rows(cat):
    return sorted(
        (r["source_id"], r["_ID"], r["Norder"], r["Npix"], r["mag"])
        for r in cat.df().collect()
    )


def test_compact_through_copy_delete_fs(spark, tmp_path):
    """Whole compact lifecycle over a non-atomic (but crash-free)
    rename: identical guarantees to the POSIX run."""
    cat = _build_appended(spark, tmp_path, "cdfs")
    _fragment_cells(cat)
    before = _rows(cat)
    fs = CopyDeleteFS()
    cat = Catalog(spark, cat.path, cat.meta, fs=fs)
    cat2 = cat.compact()
    assert fs.renames > 0, "roll-forward must route through the injected fs"
    assert all(len(f) == 1 for f in _cell_files(cat2).values())
    assert _rows(cat2) == before
    assert cat2.fsck()["consistent"]


def test_compact_crash_mid_copy_recovers(spark, tmp_path):
    """A rename that dies halfway through writing the destination
    leaves (intact src + torn dst); the recorded intent marker replays
    the roll-forward on the next lifecycle entry, which overwrites the
    torn file — rows byte-identical, no duplicate, no loss."""
    cat = _build_appended(spark, tmp_path, "torn")
    _fragment_cells(cat)
    before = _rows(cat)
    path, meta = cat.path, cat.meta

    crashed = False
    try:
        Catalog(spark, path, meta, fs=TornRenameFS(crash_on=2)).compact()
    except RuntimeError as e:
        assert "injected crash" in str(e)
        crashed = True
    assert crashed, "fixture must actually crash mid-roll-forward"

    # recovery: a fresh session entering via ANY lifecycle op, still on
    # a non-atomic-rename filesystem
    cat2 = Catalog.load(spark, path, fs=CopyDeleteFS())
    report = cat2.fsck(repair=True)
    assert report["repaired"] or report["consistent"]
    cat3 = Catalog.load(spark, path, fs=CopyDeleteFS())
    assert _rows(cat3) == before
    assert all(len(f) == 1 for f in _cell_files(cat3).values())
    assert cat3.fsck()["consistent"]


def test_publish_is_atomic_and_readable(tmp_path):
    p = str(tmp_path / "marker.json")
    LOCAL_FS.publish(p, '{"phase": "pre"}')
    assert LOCAL_FS.read_text(p) == '{"phase": "pre"}'
    LOCAL_FS.publish(p, '{"phase": "done"}')
    assert LOCAL_FS.read_text(p) == '{"phase": "done"}'
    assert not LOCAL_FS.exists(p + ".tmp")
