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


def test_compact_through_hadoop_fs(spark, tmp_path):
    """The whole compact lifecycle through the Hadoop FileSystem
    implementation (JVM gateway) against file:// — the executable form
    of the 'cloud lifecycle is config-only' claim.  Same guarantees as
    the POSIX run, and no checksum-file strays in any census."""
    from lsd2_spark.sources.fs import HadoopFS

    cat = _build_appended(spark, tmp_path, "hdfs_c")
    _fragment_cells(cat)
    before = _rows(cat)
    fs = HadoopFS(spark)
    cat = Catalog(spark, cat.path, cat.meta, fs=fs)
    cat2 = cat.compact()
    assert cat2._fs is fs, "compact must hand back the injected fs"
    assert all(len(f) == 1 for f in _cell_files(cat2).values())
    assert _rows(cat2) == before
    assert cat2.fsck()["consistent"]


def test_delete_and_reload_through_hadoop_fs(spark, tmp_path):
    """delete()'s intent-marker protocol (publish/read_text/remove)
    through HadoopFS, then a fresh load() through it too."""
    from lsd2_spark.sources.fs import HadoopFS

    fs = HadoopFS(spark)
    cat = _build_appended(spark, tmp_path, "hdfs_d", margins=False)
    cat = Catalog(spark, cat.path, cat.meta, fs=fs)
    keep = sorted(
        r["source_id"] for r in cat.df().filter("mag <= 18").collect()
    )
    cat2 = cat.delete("mag > 18")
    assert cat2._fs is fs
    assert sorted(r["source_id"] for r in cat2.df().collect()) == keep
    again = Catalog.load(spark, cat.path, "hdfs_d", fs=fs)
    assert again.meta.n_sources == len(keep)
    assert again.fsck()["consistent"]


def test_reconciled_compact_keeps_injected_fs(spark, tmp_path):
    """A crashed compact reconciled on the next entry must hand back a
    Catalog still carrying the injected fs — dropping it would silently
    fall back to POSIX I/O for the chained retry (ADVICE r9)."""
    import pytest

    class _Boom(RuntimeError):
        pass

    class BoomFS(CopyDeleteFS):
        def __init__(self, crash_on):
            super().__init__()
            self.crash_on = crash_on

        def rename(self, src, dst):
            if self.renames + 1 == self.crash_on:
                self.renames += 1
                raise _Boom("injected")
            super().rename(src, dst)

    cat = _build_appended(spark, tmp_path, "keepfs")
    _fragment_cells(cat)
    fs = BoomFS(crash_on=1)
    cat = Catalog(spark, cat.path, cat.meta, fs=fs)
    with pytest.raises(_Boom):
        cat.compact()
    fs.crash_on = -1
    recovered = Catalog(spark, cat.path, cat.meta, fs=fs)._reconcile_compact_intent()
    assert recovered._fs is fs
