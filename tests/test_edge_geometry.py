"""The reference's known weak spots as explicit fixtures (FIXTURES.md
F5/F7, SURVEY §7 hard parts): RA-wraparound pairs, polar pairs,
self-match, and the notebook-parity end-to-end flow."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import lsd2_spark.healpix as hpx
from lsd2_spark.catalog import Catalog, partition_catalog

RNG = np.random.default_rng(11)


def _cat(spark, tmp_path, name, pdf, threshold=500):
    return partition_catalog(
        spark.createDataFrame(pdf), str(tmp_path / name), name,
        ra_col="ra", dec_col="dec", id_col="sid",
        threshold=threshold, order_k=7, write_margins=False,
    )


def test_crossmatch_across_ra_wrap(spark, tmp_path):
    """Planted pairs straddling ra=0/360 at < 0.05 deg must match."""
    n = 2000
    base = pd.DataFrame({
        "sid": np.arange(n, dtype=np.int64),
        "ra": np.concatenate([RNG.uniform(359.9, 360, n // 2) % 360,
                              RNG.uniform(0, 0.1, n // 2)]),
        "dec": RNG.uniform(-60, 60, n),
    })
    partner = base.copy()
    partner["sid"] = partner["sid"] + 10_000
    # offset across the wrap: +0.04 deg in ra (mod 360)
    partner["ra"] = (partner["ra"] + 0.04) % 360
    c1 = _cat(spark, tmp_path, "wrapl", base)
    c2 = _cat(spark, tmp_path, "wrapr", partner)
    got = c1.cross_match(c2, n_neighbors=1, dthresh=0.1).toPandas()
    # every left row has its planted partner within 0.1 deg
    assert len(got) == n
    assert (got["_DIST"].to_numpy() < 0.1).all()
    # exact oracle: nearest right row (ties impossible with random data)
    d = hpx.gc_dist_deg(
        base["ra"].to_numpy()[:, None], base["dec"].to_numpy()[:, None],
        partner["ra"].to_numpy()[None, :], partner["dec"].to_numpy()[None, :],
    )
    nearest = partner["sid"].to_numpy()[d.argmin(axis=1)]
    got_sorted = got.sort_values("wrapl_sid")
    assert (got_sorted["wrapr_sid"].to_numpy() == nearest).all()


def test_crossmatch_at_poles(spark, tmp_path):
    """Pairs within 0.5 deg of both poles must match across polar
    pixel geometry (margin_utils.py:307-375 weak spot)."""
    n = 1000
    base = pd.DataFrame({
        "sid": np.arange(n, dtype=np.int64),
        "ra": RNG.uniform(0, 360, n),
        "dec": np.concatenate([RNG.uniform(89.5, 89.99, n // 2),
                               RNG.uniform(-89.99, -89.5, n // 2)]),
    })
    partner = base.copy()
    partner["sid"] = partner["sid"] + 10_000
    partner["ra"] = (partner["ra"] + RNG.uniform(-0.01, 0.01, n)) % 360
    partner["dec"] = np.clip(partner["dec"] + RNG.uniform(-0.005, 0.005, n), -90, 90)
    c1 = _cat(spark, tmp_path, "poll", base)
    c2 = _cat(spark, tmp_path, "polr", partner)
    got = c1.cross_match(c2, n_neighbors=1, dthresh=0.05).toPandas()
    # oracle: brute force
    d = hpx.gc_dist_deg(base["ra"].to_numpy()[:, None], base["dec"].to_numpy()[:, None],
                        partner["ra"].to_numpy()[None, :], partner["dec"].to_numpy()[None, :])
    want = (d.min(axis=1) < 0.05).sum()
    assert len(got) == want


def test_self_crossmatch(spark, tmp_path):
    """Self-match via exclude_self=True — the reference's unimplemented
    TODO (catalog.py:227-228)."""
    n = 3000
    pdf = pd.DataFrame({
        "sid": np.arange(n, dtype=np.int64),
        "ra": RNG.uniform(10, 20, n),
        "dec": RNG.uniform(-5, 5, n),
    })
    cat = _cat(spark, tmp_path, "selfcat", pdf)
    with pytest.raises(AssertionError):
        cat.cross_match(cat)  # guard still fires without the flag
    got = cat.cross_match(cat, n_neighbors=1, dthresh=0.5, exclude_self=True).toPandas()
    # suffixed right columns, and never a self pair
    assert "selfcat_sid" in got.columns and "selfcat_2_sid" in got.columns
    assert (got["selfcat_sid"] != got["selfcat_2_sid"]).all()
    assert (got["_DIST"] > 0).all() or len(got) == 0
    # oracle: nearest other row within dthresh
    d = hpx.gc_dist_deg(pdf["ra"].to_numpy()[:, None], pdf["dec"].to_numpy()[:, None],
                        pdf["ra"].to_numpy()[None, :], pdf["dec"].to_numpy()[None, :])
    np.fill_diagonal(d, np.inf)
    assert len(got) == (d.min(axis=1) < 0.5).sum()


def test_notebook_parity_flow(spark, tmp_path):
    """The reference's de-facto end-to-end test (example_usage.ipynb):
    import two overlapping catalogs → check metadata/columns/length →
    assign+query → cone search → cross-match with post-filter."""
    from pyspark.sql import functions as F

    n = 10_000
    a = pd.DataFrame({
        "sid": np.arange(n, dtype=np.int64),
        "ra": RNG.uniform(50, 70, n),
        "dec": RNG.uniform(10, 30, n),
        "pmra": RNG.normal(0, 30, n),
        "pmdec": RNG.normal(0, 30, n),
        "radial_velocity": RNG.normal(0, 50, n),
    })
    b = a.sample(frac=0.5, random_state=1).copy()
    b["sid"] += 1_000_000
    b["ra"] += RNG.uniform(-0.003, 0.003, len(b))

    ca = _cat(spark, tmp_path, "gaia_ex", a, threshold=2000)
    cb = _cat(spark, tmp_path, "gaia_exb", b, threshold=2000)

    # metadata / columns / length (notebook cells 8-10)
    assert ca.meta.n_sources == n
    assert {"sid", "ra", "dec", "pmra"} <= set(ca.df().columns)
    assert ca.df().count() == n

    # assign + query (cell 11): pm = sqrt(pmra²+pmdec²); filter
    df = ca.df().withColumn(
        "pm", F.sqrt(F.pow(F.col("pmra"), 2) + F.pow(F.col("pmdec"), 2))
    )
    q = df.filter("pm > 20.0 AND radial_velocity > 0")
    pm = np.hypot(a["pmra"], a["pmdec"])
    assert q.count() == int(((pm > 20) & (a["radial_velocity"] > 0)).sum())

    # cone search (cells 14-16)
    cone = ca.cone_search(60.0, 20.0, 5.0)
    d = hpx.gc_dist_deg(a["ra"].to_numpy(), a["dec"].to_numpy(), 60.0, 20.0)
    assert cone.count() == int((d < 5.0).sum())

    # cross-match + post-filter (cell 19)
    xm = ca.cross_match(cb, n_neighbors=1, dthresh=0.01)
    filtered = xm.filter(F.col("_DIST") < 0.005)
    assert 0 < filtered.count() <= xm.count()


def test_debug_mode_truncates_plan(spark, tmp_path):
    """debug=True truncates the cell plan to 5 cells (reference
    catalog.py:175-177) and warns."""
    n = 4000
    pdf = pd.DataFrame({
        "sid": np.arange(n, dtype=np.int64),
        "ra": RNG.uniform(0, 360, n),
        "dec": np.degrees(np.arcsin(RNG.uniform(-1, 1, n))),
    })
    c1 = _cat(spark, tmp_path, "dbgl", pdf, threshold=300)
    c2 = _cat(spark, tmp_path, "dbgr", pdf.assign(sid=pdf.sid + 10_000), threshold=300)
    full = c1.cross_match(c2, n_neighbors=1, dthresh=0.5).toPandas()
    with pytest.warns(UserWarning, match="5 cells"):
        truncated = c1.cross_match(c2, n_neighbors=1, dthresh=0.5, debug=True).toPandas()
    # strictly fewer result cells, and only cells from the full run
    assert truncated[["hips_k", "hips_pix"]].drop_duplicates().shape[0] <= 5
    assert 0 < len(truncated) < len(full)


def test_wide_result_warning(spark, tmp_path):
    """>50 output columns warns (reference catalog.py:237-241)."""
    n = 200
    pdf = pd.DataFrame({
        "sid": np.arange(n, dtype=np.int64),
        "ra": RNG.uniform(0, 360, n),
        "dec": RNG.uniform(-60, 60, n),
    })
    for i in range(24):
        pdf[f"x{i}"] = np.float64(i)
    c1 = _cat(spark, tmp_path, "widel", pdf)
    c2 = _cat(spark, tmp_path, "wider", pdf.assign(sid=pdf.sid + 10_000))
    with pytest.warns(UserWarning, match="more than 50 columns"):
        c1.cross_match(c2, n_neighbors=1, dthresh=0.5)


def test_crossmatch_hot_cell_skew(spark, tmp_path):
    """SURVEY §7 hard part 5: a dense cluster concentrated in ONE cell
    (plus sparse background) must still match correctly — the cogroup
    kernel is bounded per cell and AQE handles the skewed shuffle."""
    n_dense, n_sparse = 8000, 500
    dense = pd.DataFrame({
        "sid": np.arange(n_dense, dtype=np.int64),
        "ra": RNG.uniform(100.0, 100.4, n_dense),     # ~one fine cell
        "dec": RNG.uniform(10.0, 10.4, n_dense),
    })
    sparse = pd.DataFrame({
        "sid": np.arange(n_dense, n_dense + n_sparse, dtype=np.int64),
        "ra": RNG.uniform(0, 360, n_sparse),
        "dec": RNG.uniform(-60, 60, n_sparse),
    })
    base = pd.concat([dense, sparse], ignore_index=True)
    partner = base.copy()
    partner["sid"] += 100_000
    partner["ra"] = (partner["ra"] + 0.01) % 360
    c1 = _cat(spark, tmp_path, "hotl", base, threshold=1000)
    c2 = _cat(spark, tmp_path, "hotr", partner, threshold=1000)
    got = c1.cross_match(c2, n_neighbors=1, dthresh=0.05).toPandas()
    # every left row found a partner (planted at 0.01 deg)
    assert len(got) == len(base)
    assert (got["_DIST"].to_numpy() < 0.05).all()
    # exact nearest-neighbor oracle on the dense block boundary rows
    d = hpx.gc_dist_deg(
        base["ra"].to_numpy()[:, None], base["dec"].to_numpy()[:, None],
        partner["ra"].to_numpy()[None, :], partner["dec"].to_numpy()[None, :],
    )
    nearest = partner["sid"].to_numpy()[d.argmin(axis=1)]
    got_sorted = got.sort_values("hotl_sid")
    assert (got_sorted["hotr_sid"].to_numpy() == nearest).all()

    # opt-in AUTOMATIC hot-cell refinement (VERDICT r12 #5): a tight
    # pair bound must split the dense region's plan cell and return
    # the IDENTICAL pair set — same rows, same neighbors, same dists
    auto = c1.cross_match(
        c2, n_neighbors=1, dthresh=0.05, max_pairs_per_cell=1e4
    ).toPandas()
    assert len(auto) == len(got)
    auto_sorted = auto.sort_values("hotl_sid")
    assert (auto_sorted["hotr_sid"].to_numpy()
            == got_sorted["hotr_sid"].to_numpy()).all()
    np.testing.assert_allclose(
        auto_sorted["_DIST"].to_numpy(), got_sorted["_DIST"].to_numpy()
    )
    # the refinement actually split: the dense block spans more result
    # cells than under the unrefined plan
    assert (
        auto[["hips_k", "hips_pix"]].drop_duplicates().shape[0]
        > got[["hips_k", "hips_pix"]].drop_duplicates().shape[0]
    )
