"""Round-7 delete hardening:

1. Predicate-pushed halo purge — a delete predicate over source data
   columns filters ``neighbor/`` directly (predicate-pushed scan, no
   join against the full catalog id set); structural-column predicates
   (Norder/Npix mean the HALO cell there, not the home cell) fall back
   to the live-id anti-join.  At 100 TB the fast path turns every
   routine delete from a full-catalog scan + catalog-sized shuffle
   join into a pruned halo scan.
2. Crash-safe delete — a write-ahead intent marker (append's pattern)
   makes ``n_sources``, the coverage map, emptied directories, and
   halo orphans converge via the next ``delete`` call or
   ``fsck(repair=True)``, in every crash window.
3. NULL-predicate totality — rows where the predicate evaluates NULL
   are KEPT and never silently dropped from the count.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest

from lsd2_spark.catalog import Catalog, partition_catalog

RNG = np.random.default_rng(77)


def _pdf(n=4000):
    ra = RNG.uniform(0, 360, n)
    dec = np.degrees(np.arcsin(RNG.uniform(-1, 1, n)))
    hot = int(n * 0.35)
    ra[:hot] = RNG.normal(45, 0.4, hot) % 360
    dec[:hot] = np.clip(RNG.normal(10, 0.4, hot), -89, 89)
    return pd.DataFrame(
        {
            "source_id": np.arange(n, dtype=np.int64),
            "ra": ra,
            "dec": dec,
            "mag": RNG.uniform(10, 22, n),
        }
    )


def _build(spark, tmp_path, name, n=4000):
    return partition_catalog(
        spark.createDataFrame(_pdf(n)), str(tmp_path / name), name,
        ra_col="ra", dec_col="dec", id_col="source_id",
        threshold=800, order_k=4, write_margins=True,
    )


# ---------------------------------------------------------------------------
# 1. predicate-pushed halo purge
# ---------------------------------------------------------------------------


def test_halo_purge_pushes_down_source_column_predicate(spark, tmp_path):
    """For a predicate on halo-present source columns the halo purge
    must not join against the catalog id set: assert the executed halo
    plans contain no Join at all, and the results match the fallback
    semantics (no halo row of a deleted source survives)."""
    cat = _build(spark, tmp_path, "push")
    assert os.path.exists(f"{cat.path}/neighbor")

    # capture every executed halo-side plan during the delete by
    # wrapping the halo write helper
    plans = []
    orig = Catalog._overwrite_halo_cells

    def spy(self, halo_keep, halo_touched):
        plans.append(halo_keep._jdf.queryExecution().analyzed().toString())
        return orig(self, halo_keep, halo_touched)

    Catalog._overwrite_halo_cells = spy
    try:
        cat2 = cat.delete("source_id < 700")
    finally:
        Catalog._overwrite_halo_cells = orig

    # fast path taken: the kept-halo plan is a pure filter over the
    # neighbor scan — no Join operator anywhere
    assert plans, "halo purge did not run"
    for plan in plans:
        assert "Join" not in plan, plan

    # semantics identical to the fallback: no deleted id in the halo
    m = cat2.margin_df()
    assert m is not None
    assert m.filter("source_id < 700").count() == 0
    assert cat2.df().filter("source_id < 700").count() == 0
    # and surviving halo rows are intact (superset margin property)
    assert m.count() > 0


def test_halo_purge_falls_back_for_structural_predicate(spark, tmp_path):
    """Norder/Npix in neighbor/ are the halo cell's coordinates, not
    the source's home cell — a predicate over them must use the
    live-id anti-join fallback, and halo rows of deleted sources must
    still disappear while halo rows merely LOCATED in the deleted cell
    but belonging to live sources survive."""
    cat = _build(spark, tmp_path, "fallback")
    cells = sorted(
        (r["Norder"], r["Npix"])
        for r in cat.df().select("Norder", "Npix").distinct().collect()
    )
    o, p = cells[0]
    victim_ids = {
        r["source_id"]
        for r in cat.df().filter(f"Norder = {o} AND Npix = {p}").collect()
    }
    assert victim_ids

    cat2 = cat.delete(f"Norder = {o} AND Npix = {p}")
    m = cat2.margin_df()
    assert m is not None
    halo_ids = {r["source_id"] for r in m.select("source_id").collect()}
    # no deleted source survives in the halo...
    assert not (halo_ids & victim_ids)
    # ...but live sources' halo rows in OTHER cells are untouched, and
    # any live-source halo row that happened to sit in cell (o,p)
    # was not nuked by a naive structural pushdown
    live = {r["source_id"] for r in cat2.df().select("source_id").collect()}
    assert halo_ids <= live
    assert cat2.meta.n_sources == cat.meta.n_sources - len(victim_ids)


# ---------------------------------------------------------------------------
# 2. crash-injection e2e
# ---------------------------------------------------------------------------


class _Boom(RuntimeError):
    pass


def _crash_delete(cat, predicate, crash_point):
    """Run delete but raise at a chosen point: 'after_data' = after the
    catalog dynamic overwrite, before halo purge and metadata commit;
    'after_halo' = after the halo purge, before metadata commit."""
    orig_halo = Catalog._overwrite_halo_cells
    orig_commit = Catalog._commit_meta

    def halo_boom(self, *a, **k):
        raise _Boom("crash before halo purge")

    def commit_boom(self, *a, **k):
        raise _Boom("crash before metadata commit")

    if crash_point == "after_data":
        Catalog._overwrite_halo_cells = halo_boom
    Catalog._commit_meta = commit_boom
    try:
        with pytest.raises(_Boom):
            cat.delete(predicate)
    finally:
        Catalog._overwrite_halo_cells = orig_halo
        Catalog._commit_meta = orig_commit


@pytest.mark.parametrize("crash_point", ["after_data", "after_halo"])
def test_crashed_delete_converges_via_fsck_repair(spark, tmp_path, crash_point):
    cat = _build(spark, tmp_path, f"crashf_{crash_point}")
    n0 = cat.meta.n_sources
    n_victims = cat.df().filter("source_id < 600").count()

    _crash_delete(cat, "source_id < 600", crash_point)

    # torn state: data rewritten, metadata stale, marker present
    stale = Catalog.load(spark, cat.path, cat.meta.cat_name)
    assert stale.meta.n_sources == n0  # overcounted
    rep = stale.fsck()
    assert not rep["consistent"]
    assert rep["stale_delete_intent"]

    rep2 = stale.fsck(repair=True)
    assert rep2["repaired"]
    healed = Catalog.load(spark, cat.path, cat.meta.cat_name)
    final = healed.fsck()
    assert final["consistent"], final
    assert healed.meta.n_sources == n0 - n_victims
    assert healed.df().filter("source_id < 600").count() == 0
    m = healed.margin_df()
    if m is not None:
        assert m.filter("source_id < 600").count() == 0


def test_crashed_delete_converges_via_next_delete(spark, tmp_path):
    """The next delete call replays the intent marker first, so a
    crashed delete + a later unrelated delete ends fully consistent."""
    cat = _build(spark, tmp_path, "crashd")
    n0 = cat.meta.n_sources
    n_a = cat.df().filter("source_id < 600").count()

    _crash_delete(cat, "source_id < 600", "after_data")

    stale = Catalog.load(spark, cat.path, cat.meta.cat_name)
    n_b = stale.df().filter("mag > 21.5").count()
    cat2 = stale.delete("mag > 21.5")

    assert cat2.meta.n_sources == n0 - n_a - n_b
    assert cat2.df().count() == n0 - n_a - n_b
    assert cat2.fsck()["consistent"]
    assert not os.path.exists(cat2._delete_intent_path())


def test_delete_replay_is_idempotent_after_partial_metadata(spark, tmp_path):
    """Crash AFTER metadata commit but before marker removal: the
    marker replay must be a no-op (same accounting twice)."""
    cat = _build(spark, tmp_path, "partial")
    n0 = cat.meta.n_sources
    n_victims = cat.df().filter("source_id < 600").count()

    # snapshot the marker's accounting BEFORE the delete (the real
    # marker is written pre-mutation; df() is lazy over live disk, so
    # these must be materialized now)
    touched_cells = sorted(
        (int(r["Norder"]), int(r["Npix"]))
        for r in cat.df()
        .filter("source_id < 600")
        .select("Norder", "Npix")
        .distinct()
        .collect()
    )
    pre_touched = int(
        cat.df()
        .join(
            cat.df()
            .filter("source_id < 600")
            .select("Norder", "Npix")
            .distinct(),
            ["Norder", "Npix"],
            "left_semi",
        )
        .count()
    )
    cat2 = cat.delete("source_id < 600")
    # simulate the torn window: crash AFTER metadata commit but before
    # marker removal — re-create the marker the delete wrote
    marker = {
        "touched": touched_cells,
        "pre_touched": pre_touched,
        "committed_n_sources": n0,
    }
    with open(cat2._delete_intent_path(), "w") as f:
        json.dump(marker, f)

    healed = cat2._reconcile_delete_intent()
    assert healed.meta.n_sources == n0 - n_victims
    assert healed.fsck()["consistent"]


# ---------------------------------------------------------------------------
# 3. NULL-predicate totality
# ---------------------------------------------------------------------------


def test_delete_keeps_null_predicate_rows(spark, tmp_path):
    """A predicate that evaluates NULL on a row must KEEP that row —
    and n_sources must account exactly for the pred=TRUE rows."""
    pdf = _pdf(2000)
    pdf["flag"] = np.where(pdf["source_id"] % 3 == 0, "del", None)
    pdf.loc[pdf["source_id"] % 3 == 1, "flag"] = "keep"
    cat = partition_catalog(
        spark.createDataFrame(pdf), str(tmp_path / "nulls"), "nulls",
        ra_col="ra", dec_col="dec", id_col="source_id",
        threshold=800, order_k=4, write_margins=False,
    )
    n0 = cat.meta.n_sources
    n_del = cat.df().filter("flag = 'del'").count()
    n_null = cat.df().filter("flag IS NULL").count()
    assert n_null > 0

    cat2 = cat.delete("flag = 'del'")
    assert cat2.meta.n_sources == n0 - n_del
    assert cat2.df().count() == n0 - n_del
    assert cat2.df().filter("flag IS NULL").count() == n_null
    assert cat2.fsck()["consistent"]
