"""Cross-match — k-nearest-neighbor spatial join (the reference's
flagship operator, hipscat/catalog.py:144-253 + dask_utils.py:367-483).

Semantics: for each LEFT row, find up to ``n_neighbors`` nearest RIGHT
rows within ``dthresh`` degrees, correct across partition boundaries.
Ties and the |right| < k case follow the *fixed* semantics (the
reference mis-aligns output when a cell has fewer right rows than k,
dask_utils.py:448-458 — documented in SURVEY §4): matches are ordered
by (distance, right id) and truncated at min(k, candidates).

Spark-first plan (replaces the reference's driver-built file-pair plan,
catalog.py:181-191):

1. **Join cells** (driver): the sky overlap of both catalogs, each cell
   the finer of the two covering partitions (util.py:87-183 semantics),
   clamped so no cell is narrower than the match radius — this keeps
   boundary handling to a single neighbor ring.
2. **Left assignment**: rows equi-join a broadcast (pixel → cell)
   table on their pixel at the cell's order.  Left rows are never
   duplicated — each is matched exactly once (reference
   dask_utils.py:407: margins are drawn from the right side only).
3. **Right assignment + halo duplication**: the broadcast table for the
   right side also contains each cell's neighbor pixels, so right rows
   within ``dthresh`` of a cell boundary are *duplicated* into that
   cell (conservative center-distance prefilter).  This replaces the
   materialized ``neighbor/`` union (dask_utils.py:404-428) with
   query-time halos — no second dataset needs to exist, and the halo
   width always matches the query's ``dthresh``.
4. **Cogrouped kNN kernel**: ``left.groupBy(cell) cogroup right.groupBy
   (cell) → applyInPandas``: gnomonic-project around the cell center
   (util.py:353-371), grid-bucket the right side at the match radius,
   gather 3×3 candidates per left row, exact great-circle distance,
   keep k smallest per left row under ``dthresh``.

Scale notes (100 TB): the broadcast tables are plan-sized (≤ 9 entries
per cell).  The only shuffle is the cogroup's hash partition on the
cell key; cells are bounded by the catalogs' ``threshold`` plus halo,
and AQE skew-join splitting handles hot cells.  The kernel is pure
vectorized NumPy over Arrow batches.
"""

from __future__ import annotations

import warnings
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from lsd2_spark import healpix as hpx
from lsd2_spark.functions.healpix_cols import ang2pix_udf
from lsd2_spark.functions.spherical import gc_dist, gnomonic_xy_np
from lsd2_spark.plans.partition_map import align_join_cells, complete_left_cover

__all__ = ["crossmatch_catalogs", "crossmatch_dataframes", "max_cell_order_for"]

_CELL_O = "_cell_order"
_CELL_P = "_cell_pix"


def max_cell_order_for(dthresh: float) -> int:
    """Finest cell order whose pixels are wider than the match radius —
    guarantees all matches live in a cell or its immediate neighbors."""
    o = 0
    while o < hpx.MAX_ORDER and hpx.min_pixwidth(o + 1) >= dthresh:
        o += 1
    return o


def _cell_tables(cells: list[tuple[int, int]], dthresh: float, with_halo: bool):
    """Per-order assignment tables, built with ONE vectorized
    neighbors/pix2ang call per order (plan-time cost stays sub-second
    even at 10⁵ cells).

    Primary entry: (pixel == cell pixel) → cell, no distance filter.
    Halo entry (right side only): (neighbor pixel → cell) with the
    cell's center + conservative radius for the distance prefilter.
    """
    by_order: dict[int, list[tuple[int, int, int, float, float, float, int]]] = {}
    cells_by_order: dict[int, list[int]] = {}
    for o, p in cells:
        cells_by_order.setdefault(o, []).append(p)
    for o, ps in sorted(cells_by_order.items()):
        parr = np.array(sorted(ps), dtype=np.int64)
        cra, cdec = hpx.pix2ang(o, parr)
        rad = hpx.max_pixrad(o) + dthresh
        rows = by_order.setdefault(o, [])
        for p, a, d in zip(parr.tolist(), cra.tolist(), cdec.tolist()):
            rows.append((p, o, p, a, d, rad, 1))
        if with_halo:
            nbs = hpx.neighbors(o, parr)
            for p, a, d, nb in zip(parr.tolist(), cra.tolist(), cdec.tolist(), nbs):
                rows.extend((int(n), o, p, a, d, rad, 0) for n in nb.tolist())
    return by_order


def _assign(df: DataFrame, ra_col: str, dec_col: str, tables, dthresh: float) -> DataFrame:
    """Assign rows to plan cells in ONE pass over the input.

    Pixelize once at the finest plan order (one Arrow UDF pass), derive
    each coarser order's pixel with ``shiftright`` (nested-scheme
    hierarchy), and probe a single combined broadcast table keyed on
    (cell order, pixel).  The per-order explode multiplies rows only
    transiently inside the broadcast-hash-join stage (pipelined, no
    shuffle); the previous form re-scanned and re-pixelized the whole
    input once per distinct order — ~5 scans on adaptive catalogs.
    """
    spark = df.sparkSession
    orders = sorted(tables)
    kmax = orders[-1]
    tbl = F.broadcast(
        spark.createDataFrame(
            [r for o in orders for r in tables[o]],
            f"pix long, {_CELL_O} int, {_CELL_P} long, _c_ra double, "
            "_c_dec double, _c_rad double, _primary int",
        )
    )
    # deterministic=False: the pixel feeds the broadcast-join key, and
    # the inferred IsNotNull(pix) constraint would otherwise be pushed
    # below this projection, running the Arrow pixelization twice per
    # row on every assign side (observed in the q21 plan)
    pixk = ang2pix_udf(kmax, F.col(ra_col), F.col(dec_col), deterministic=False)
    if len(orders) == 1:
        # single-order plan: no probe explode, and the order column can
        # stay out of the join key (it is constant; the broadcast table
        # supplies it) — measured ~30% cheaper than the general path on
        # the q21 bench
        withpix = df.withColumn("pix", pixk)
        j = withpix.join(tbl, "pix").filter(
            (F.col("_primary") == 1)
            | (
                gc_dist(F.col(ra_col), F.col(dec_col), F.col("_c_ra"), F.col("_c_dec"))
                <= F.col("_c_rad")
            )
        )
        return j.drop("pix", "_c_ra", "_c_dec", "_c_rad", "_primary")
    else:
        probes = F.array(
            *[
                F.struct(
                    F.lit(o).cast("int").alias("o"),
                    F.shiftright(F.col("_pixk"), 2 * (kmax - o)).alias("pix"),
                )
                for o in orders
            ]
        )
        withpix = (
            df.withColumn("_pixk", pixk)
            .withColumn("_probe", F.explode(probes))
            .withColumn("pix", F.col("_probe.pix"))
            .withColumn(_CELL_O, F.col("_probe.o"))
            .drop("_pixk", "_probe")
        )
    j = withpix.join(tbl, ["pix", _CELL_O]).filter(
        (F.col("_primary") == 1)
        | (
            gc_dist(F.col(ra_col), F.col(dec_col), F.col("_c_ra"), F.col("_c_dec"))
            <= F.col("_c_rad")
        )
    )
    return j.drop("pix", "_c_ra", "_c_dec", "_c_rad", "_primary")


def _knn_kernel_factory(
    lcols: list[str],
    rcols: list[str],
    l_ra: str,
    l_dec: str,
    r_ra: str,
    r_dec: str,
    r_id: str,
    n_neighbors: int,
    dthresh: float,
    out_schema: StructType,
    l_id: str | None = None,
    exclude_same_id: bool = False,
):
    lpref = [f for f in out_schema.fieldNames() if f not in ("hips_k", "hips_pix", "_DIST")][
        : len(lcols)
    ]
    rpref = [f for f in out_schema.fieldNames() if f not in ("hips_k", "hips_pix", "_DIST")][
        len(lcols):
    ]

    def empty() -> pd.DataFrame:
        return pd.DataFrame({f.name: pd.Series(dtype="object") for f in out_schema.fields})

    def kernel(key, ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        if len(ldf) == 0 or len(rdf) == 0:
            return empty()
        cell_order, cell_pix = int(key[0]), int(key[1])
        cra, cdec = hpx.pix2ang(cell_order, np.array([cell_pix]))
        lx, ly = gnomonic_xy_np(ldf[l_ra].to_numpy(), ldf[l_dec].to_numpy(), cra[0], cdec[0])
        rx, ry = gnomonic_xy_np(rdf[r_ra].to_numpy(), rdf[r_dec].to_numpy(), cra[0], cdec[0])

        # gnomonic stretches local distances by up to 1/cos²(θ) at angle θ
        # from the tangent point; size the grid pitch so a 3×3 probe is a
        # guaranteed superset of all true-distance matches.
        max_theta = min(np.radians(hpx.max_pixrad(cell_order) + dthresh), np.radians(80.0))
        h = dthresh / (np.cos(max_theta) ** 2)
        gx_r = np.floor(rx / h).astype(np.int64)
        gy_r = np.floor(ry / h).astype(np.int64)
        # composite grid key; sort right side once
        span = np.int64(1) << np.int64(32)
        rkey = gx_r * span + gy_r
        order_r = np.argsort(rkey, kind="stable")
        rkey_s = rkey[order_r]

        gx_l = np.floor(lx / h).astype(np.int64)
        gy_l = np.floor(ly / h).astype(np.int64)

        li_all = []
        ri_all = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                probe = (gx_l + dx) * span + (gy_l + dy)
                i0 = np.searchsorted(rkey_s, probe, side="left")
                i1 = np.searchsorted(rkey_s, probe, side="right")
                cnt = i1 - i0
                nz = np.nonzero(cnt)[0]
                if nz.size == 0:
                    continue
                lengths = cnt[nz]
                li_all.append(np.repeat(nz, lengths))
                # ranges i0..i1 per left row, flattened without Python loops
                cum = np.cumsum(lengths)
                offs = np.arange(cum[-1]) - np.repeat(cum - lengths, lengths)
                ri_all.append(order_r[np.repeat(i0[nz], lengths) + offs])
        if not li_all:
            return empty()
        li = np.concatenate(li_all)
        ri = np.concatenate(ri_all)

        d = hpx.gc_dist_deg(
            ldf[l_ra].to_numpy()[li],
            ldf[l_dec].to_numpy()[li],
            rdf[r_ra].to_numpy()[ri],
            rdf[r_dec].to_numpy()[ri],
        )
        keep = d < dthresh
        if exclude_same_id and l_id is not None:
            keep &= ldf[l_id].to_numpy()[li] != rdf[r_id].to_numpy()[ri]
        li, ri, d = li[keep], ri[keep], d[keep]
        if li.size == 0:
            return empty()

        # deterministic top-k per left row: (left, dist, right_id)
        rid = rdf[r_id].to_numpy()[ri]
        sel = np.lexsort((rid, d, li))
        li, ri, d = li[sel], ri[sel], d[sel]
        first = np.zeros(len(li), dtype=bool)
        first[0] = True
        first[1:] = li[1:] != li[:-1]
        group_start = np.maximum.accumulate(np.where(first, np.arange(len(li)), 0))
        rank = np.arange(len(li)) - group_start
        keep = rank < n_neighbors
        li, ri, d = li[keep], ri[keep], d[keep]

        out = {}
        for src, dst in zip(lcols, lpref):
            out[dst] = ldf[src].to_numpy()[li]
        for src, dst in zip(rcols, rpref):
            out[dst] = rdf[src].to_numpy()[ri]
        out["hips_k"] = np.full(len(li), cell_order, dtype=np.int32)
        out["hips_pix"] = np.full(len(li), cell_pix, dtype=np.int64)
        out["_DIST"] = d
        return pd.DataFrame(out)

    return kernel


def _prefixed_schema(
    ldf: DataFrame, rdf: DataFrame, lcols: list[str], rcols: list[str], lname: str, rname: str
) -> StructType:
    fields = []
    lmap = {f.name: f for f in ldf.schema.fields}
    rmap = {f.name: f for f in rdf.schema.fields}
    for c in lcols:
        fields.append(StructField(f"{lname}_{c}", lmap[c].dataType, True))
    for c in rcols:
        fields.append(StructField(f"{rname}_{c}", rmap[c].dataType, True))
    fields += [
        StructField("hips_k", IntegerType(), False),
        StructField("hips_pix", LongType(), False),
        StructField("_DIST", DoubleType(), False),
    ]
    return StructType(fields)


def _ensure_cols(cols: list[str] | None, df: DataFrame, required: Iterable[str]) -> list[str]:
    out = list(cols) if cols is not None else [c for c in df.columns]
    for c in required:
        if c not in out:
            out.append(c)
    return out


def crossmatch_cells_plan(
    hips1: dict[int, list[int]], hips2: dict[int, list[int]], dthresh: float
) -> list[tuple[int, int]]:
    kj = max_cell_order_for(dthresh)
    aligned = align_join_cells(hips1, hips2, max_cell_order=kj)
    # every left row must land in a cell, even where the right catalog
    # has no partitions (matches may still arrive via halos)
    return complete_left_cover(aligned, hips1, kj)


def crossmatch_dataframes(
    left: DataFrame,
    right: DataFrame,
    hips_left: dict[int, list[int]],
    hips_right: dict[int, list[int]],
    l_ra: str,
    l_dec: str,
    l_id: str,
    r_ra: str,
    r_dec: str,
    r_id: str,
    n_neighbors: int = 1,
    dthresh: float = 0.01,
    left_name: str = "left",
    right_name: str = "right",
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    evaluate_margins: bool = True,
    exclude_same_id: bool = False,
    max_pairs_per_cell: float | None = None,
    debug: bool = False,
) -> DataFrame:
    """kNN spatial join of two DataFrames with known sky coverage maps.

    ``exclude_same_id`` drops candidate pairs whose left and right ids
    are equal (self-match mode).  ``debug=True`` truncates the cell
    plan to its first 5 cells for a fast smoke run (reference
    catalog.py:175-177).

    Cell skew: the cogroup emits ONE Arrow kernel task per join cell,
    and AQE cannot split it (FlatMapCoGroupsInPandas is not a join
    exchange, so skew-join rewriting does not apply) — a globular-
    cluster-density cell serializes on one task.  The structural lever
    is the COVERAGE MAP: pass ``hips_left``/``hips_right`` that cover
    dense regions at a finer order (the density-adaptive ingest
    partition map produces exactly such maps), and
    :func:`align_join_cells` plans at the finer of the two sides —
    capped at :func:`max_cell_order_for`, so halos stay valid —
    splitting the hot cell into ``4^Δorder`` kernel tasks with
    identical results (bench ``crossmatch_skew`` pins the speedup and
    the pair-set equality).

    ``max_pairs_per_cell`` opts into AUTOMATIC hot-cell refinement
    when the coverage maps themselves are coarse: the planner measures
    both sides' density at the plan cap order (one histogram pass per
    side — the opt-in's cost) and splits any plan cell whose projected
    kernel work (rows_left x rows_right) exceeds the bound, via
    :func:`~lsd2_spark.plans.partition_map.refine_hot_cells`.  Results
    are pair-set identical (bench ``crossmatch_skew`` ``auto_*``
    fields); splits never exceed ``max_cell_order_for(dthresh)``, so
    halos stay valid by the same argument as above."""
    assert n_neighbors >= 1 and 0 < dthresh <= hpx.min_pixwidth(0), (
        "dthresh must be positive and below the base-pixel width"
    )
    left_cols = _ensure_cols(left_cols, left, [l_ra, l_dec, l_id])
    right_cols = _ensure_cols(right_cols, right, [r_ra, r_dec, r_id])
    left = left.select(*left_cols)
    right = right.select(*right_cols)

    # reference catalog.py:237-241: wide results are usually a mistake
    if len(left_cols) + len(right_cols) + 3 > 50:
        warnings.warn(
            "The cross-match result has more than 50 columns; consider "
            "limiting the returned columns with left_cols=[...] / "
            "right_cols=[...]",
            stacklevel=2,
        )

    cells = crossmatch_cells_plan(hips_left, hips_right, dthresh)
    if max_pairs_per_cell is not None and cells:
        from lsd2_spark.operators.histogram import sky_histogram
        from lsd2_spark.plans.partition_map import refine_hot_cells

        kj = max_cell_order_for(dthresh)

        def _hist(df, ra, dec):
            rows = sky_histogram(df, ra, dec, kj).collect()
            return (
                np.array([r["pix"] for r in rows], dtype=np.int64),
                np.array([r["cnt"] for r in rows], dtype=np.int64),
            )

        (kl, cl), (kr, cr) = _hist(left, l_ra, l_dec), _hist(right, r_ra, r_dec)
        hips_cells: dict[int, list[int]] = {}
        for o, p in cells:
            hips_cells.setdefault(o, []).append(p)
        refined = refine_hot_cells(
            hips_cells, kl, cl, kr, cr,
            order_k=kj,
            max_pairs_per_cell=max_pairs_per_cell,
            max_cell_order=kj,
        )
        cells = sorted((o, p) for o in refined for p in refined[o])
    if debug and len(cells) > 5:
        warnings.warn("debug=True: truncating the plan to 5 cells", stacklevel=2)
        cells = cells[:5]
    if not cells:
        schema = _prefixed_schema(left, right, left_cols, right_cols, left_name, right_name)
        return left.sparkSession.createDataFrame([], schema)

    l_assigned = _assign(left, l_ra, l_dec, _cell_tables(cells, dthresh, False), dthresh)
    r_assigned = _assign(
        right, r_ra, r_dec, _cell_tables(cells, dthresh, evaluate_margins), dthresh
    )

    schema = _prefixed_schema(left, right, left_cols, right_cols, left_name, right_name)
    kernel = _knn_kernel_factory(
        left_cols, right_cols, l_ra, l_dec, r_ra, r_dec, r_id, n_neighbors, dthresh,
        schema, l_id=l_id, exclude_same_id=exclude_same_id,
    )
    return (
        l_assigned.groupBy(_CELL_O, _CELL_P)
        .cogroup(r_assigned.groupBy(_CELL_O, _CELL_P))
        .applyInPandas(kernel, schema)
    )


def crossmatch_catalogs(
    cat1,
    cat2,
    n_neighbors: int = 1,
    dthresh: float = 0.01,
    columns: list[str] | None = None,
    other_columns: list[str] | None = None,
    evaluate_margins: bool = True,
    exclude_self: bool = False,
    max_pairs_per_cell: float | None = None,
    debug: bool = False,
) -> DataFrame:
    """Catalog-level cross-match (reference catalog.py:144-253).

    ``exclude_self=True`` supports matching a catalog against itself
    (the reference's unimplemented ``_2``-suffix TODO,
    catalog.py:227-228): identical ids are excluded from the
    neighbor lists and the right side gets a ``_2`` name suffix.
    ``max_pairs_per_cell`` opts into automatic hot-cell plan
    refinement (see :func:`crossmatch_dataframes`).
    """
    m1, m2 = cat1.meta, cat2.meta
    drop = ["Norder", "Dir", "Npix", "_ID"]
    left = cat1.df(columns).drop(*drop)
    right = cat2.df(other_columns).drop(*drop)
    rname = m2.cat_name if m2.cat_name != m1.cat_name else f"{m2.cat_name}_2"
    return crossmatch_dataframes(
        left,
        right,
        m1.hips,
        m2.hips,
        l_ra=m1.ra_kw,
        l_dec=m1.dec_kw,
        l_id=m1.id_kw,
        r_ra=m2.ra_kw,
        r_dec=m2.dec_kw,
        r_id=m2.id_kw,
        n_neighbors=n_neighbors,
        dthresh=dthresh,
        left_name=m1.cat_name,
        right_name=rname,
        evaluate_margins=evaluate_margins,
        exclude_same_id=exclude_self,
        max_pairs_per_cell=max_pairs_per_cell,
        debug=debug,
    )
