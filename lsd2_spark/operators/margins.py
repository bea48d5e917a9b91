"""Margin ("neighbor") dataset — boundary halos for each partition.

For every partition P the halo holds rows from *other* partitions that
lie within ``margin_threshold`` of P's boundary, so per-cell spatial
joins are correct at partition edges (reference: hipscat/
dask_utils.py:246-318, hipscat/margin_utils.py).

Spark-first construction (no per-file task farm):

1. **Driver plan**: for each partition P at order ``o`` pick a ring
   order ``kf = max(o+1, KA)`` where KA is the coarsest order whose
   pixels are at least ``margin`` wide.  The candidate set is the ring
   of order-``kf`` pixels just outside P (border children's neighbors
   minus P's own children).  For partitions coarser than KA the ring
   covers the full margin width; for partitions near/below the margin
   scale the ring is one child-pixel wide — the same resolution limit
   the reference warns about (partitioner.py:259-261), surfaced here as
   a warning too.
2. **Broadcast join**: rows compute their pixel at each distinct ``kf``
   and join the candidate table → (row, owner partition P) pairs.
3. **Containment drop**: rows already inside P are excluded with pure
   bit-shift arithmetic on the ring pixel (no second UDF pass).
4. One ``partitionBy`` write under ``{path}/neighbor/`` mirroring the
   catalog layout.

The halo is a conservative **superset** of the exact 0.1°-boundary set
(ring pixels are kept whole rather than polygon-clipped as in
margin_utils.py:209-305); supersets preserve join correctness and the
exact ``dthresh`` filter in the kNN kernel keeps results exact.
"""

from __future__ import annotations

import warnings

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lsd2_spark import healpix as hpx
from lsd2_spark.functions.healpix_cols import ang2pix_udf
from lsd2_spark.functions.spherical import gc_dist

__all__ = ["margin_candidate_entries", "write_margin_dataset", "margin_ring_order"]


def margin_ring_order(margin_deg: float) -> int:
    """Coarsest order whose min pixel width still exceeds the margin."""
    ka = 0
    while ka < hpx.MAX_ORDER and hpx.min_pixwidth(ka + 1) >= margin_deg:
        ka += 1
    return ka


def _border_children(pix: int, depth: int) -> np.ndarray:
    """Order-(o+depth) children of ``pix`` on the pixel's border."""
    n = 1 << depth
    ix = np.arange(n)
    edge = np.unique(
        np.concatenate(
            [
                np.stack([ix, np.zeros_like(ix)], 1),
                np.stack([ix, np.full_like(ix, n - 1)], 1),
                np.stack([np.zeros_like(ix), ix], 1),
                np.stack([np.full_like(ix, n - 1), ix], 1),
            ]
        ),
        axis=0,
    )
    local = (hpx._spread_bits(edge[:, 0]) | (hpx._spread_bits(edge[:, 1]) << np.uint64(1))).astype(
        np.int64
    )
    return (np.int64(pix) << np.int64(2 * depth)) + local


def margin_candidate_entries(
    hips: dict[int, list[int]], margin_deg: float
) -> dict[int, list[tuple]]:
    """Candidate ring table with local boundary geometry:
    ``{ring_order: [(ring_pix, Norder, Npix, b_ra, b_dec, eps), ...]}``.

    ``b_ra``/``b_dec`` are the owner-boundary samples within reach of
    the ring pixel (dense at ~margin/2 arc spacing, but only the local
    segment — a bounded handful per entry even for order-0 owners), and
    ``eps`` is half the owner's largest consecutive sample gap: a point
    within ``margin`` of the true boundary polygon is within
    ``margin + eps`` of some sample (triangle inequality), so row-time
    filtering at that threshold is a guaranteed superset of the exact
    margin set while dropping ring-interior rows the whole-pixel halo
    used to keep.
    """
    ka = margin_ring_order(margin_deg)
    out: dict[int, list[tuple]] = {}
    under_covered = False
    for o, pixels in sorted(hips.items()):
        kf = max(o + 1, ka)
        if hpx.min_pixwidth(kf) < margin_deg:
            under_covered = True
        # batch all border children of every partition at this order
        # into one vectorized neighbors() call
        borders = [_border_children(p, kf - o) for p in pixels]
        flat = np.concatenate(borders) if borders else np.empty(0, dtype=np.int64)
        owners = np.repeat(
            np.array(pixels, dtype=np.int64), [len(b) for b in borders]
        )
        nbs = hpx.neighbors(kf, flat)
        ring_pix = np.concatenate(nbs) if nbs else np.empty(0, dtype=np.int64)
        ring_owner = np.repeat(owners, [len(a) for a in nbs])
        keep = (ring_pix >> (2 * (kf - o))) != ring_owner
        pairs = np.unique(np.stack([ring_pix[keep], ring_owner[keep]], 1), axis=0)
        if len(pairs) == 0:
            out.setdefault(kf, [])
            continue
        ring_pix, ring_owner = pairs[:, 0], pairs[:, 1]

        # dense owner boundary (samples every ~margin/2 of arc; gap and
        # eps are MEASURED, so tightness — never correctness — depends
        # on this choice)
        n_pe = int(np.clip(np.ceil(4.0 * hpx.max_pixrad(o) / margin_deg), 4, 4096))
        uowners = np.unique(ring_owner)
        bra, bdec = hpx.boundary_samples(o, uowners, n_per_edge=n_pe)
        gaps = hpx.gc_dist_deg(bra, bdec, np.roll(bra, -1, 1), np.roll(bdec, -1, 1))
        gap_max = gaps.max(axis=1)
        cra, cdec = hpx.pix2ang(kf, ring_pix)
        window = margin_deg + hpx.max_pixrad(kf)

        rows = out.setdefault(kf, [])
        for i, ow in enumerate(uowners.tolist()):
            sel = np.nonzero(ring_owner == ow)[0]
            d = hpx.gc_dist_deg(
                cra[sel][:, None], cdec[sel][:, None], bra[i][None, :], bdec[i][None, :]
            )
            local = d <= window + gap_max[i]
            eps = float(gap_max[i] / 2.0)
            for k, idx in enumerate(sel.tolist()):
                m = local[k]
                rows.append(
                    (
                        int(ring_pix[idx]),
                        int(o),
                        int(ow),
                        bra[i][m].tolist(),
                        bdec[i][m].tolist(),
                        eps,
                    )
                )
    if under_covered:
        warnings.warn(
            "margin_threshold exceeds the pixel size of the deepest "
            "partitions; halos there cover one child-pixel ring "
            "(the reference has the same resolution limit, "
            "partitioner.py:259-261)"
        )
    return out


def margin_rows(
    df: DataFrame, cat, ra_col: str, dec_col: str, refine: bool = True
) -> DataFrame | None:
    """(row ∪ owner-partition) pairs for every halo membership.

    With ``refine=True`` (default) ring-pixel candidates are clipped by
    boundary distance: a row survives only if it is within
    ``margin + eps`` of the owner's locally-sampled boundary (see
    ``margin_candidate_entries``) — a guaranteed superset of the exact
    margin set, but without the ring-pixel interior bulk (measured ~78%
    halo-row reduction on a coarse-partition fixture, where ring pixels
    are much wider than the margin).  The distance test is a pure
    Column expression (``zip_with`` + ``array_min``) over the per-entry
    local samples riding the same broadcast table — no extra join, no
    shuffle."""
    clash = {"Norder", "Npix", "ring_pix"} & set(df.columns)
    if clash:
        # the owner-partition columns this emits would be shadowed by
        # (or ambiguous with) same-named input columns — e.g. a catalog
        # frame's native partition columns — producing silently wrong
        # halo assignments; make the caller drop them first
        raise ValueError(
            f"margin_rows input must not carry {sorted(clash)} — drop the "
            "catalog partition columns and pass the bare source frame"
        )
    spark = df.sparkSession
    entries = margin_candidate_entries(cat.meta.hips, cat.meta.margin_threshold)
    if not entries:
        return None
    margin = float(cat.meta.margin_threshold)
    parts = []
    for kf, rows in entries.items():
        if not rows:
            continue
        tbl = F.broadcast(
            spark.createDataFrame(
                rows,
                "ring_pix long, Norder int, Npix long, "
                "_b_ra array<double>, _b_dec array<double>, _b_eps double",
            )
        )
        if not refine:
            tbl = tbl.drop("_b_ra", "_b_dec", "_b_eps").dropDuplicates(
                ["ring_pix", "Norder", "Npix"]
            )
        with_pix = df.withColumn("ring_pix", ang2pix_udf(kf, F.col(ra_col), F.col(dec_col)))
        joined = with_pix.join(tbl, "ring_pix")
        # containment drop is implicit: ring pixels exclude P's children,
        # so any row whose ring_pix matched is outside P by construction.
        if refine:
            dists = F.zip_with(
                F.col("_b_ra"),
                F.col("_b_dec"),
                lambda a, d: gc_dist(F.col(ra_col), F.col(dec_col), a, d),
            )
            joined = joined.filter(
                # empty local segment (shouldn't happen — rings touch the
                # boundary) conservatively keeps the row
                F.coalesce(
                    F.array_min(dists) <= F.lit(margin) + F.col("_b_eps"), F.lit(True)
                )
            ).drop("_b_ra", "_b_dec", "_b_eps")
        parts.append(joined.drop("ring_pix"))
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def write_margin_dataset(df: DataFrame, cat, ra_col: str, dec_col: str) -> None:
    """Materialize {path}/neighbor/ with the catalog's hive layout
    (reference sink S8, dask_utils.py:246-318)."""
    rows = margin_rows(df, cat, ra_col=ra_col, dec_col=dec_col)
    if rows is None:
        return
    out = rows.withColumn("Dir", (F.col("Npix") / 10_000).cast("long") * 10_000)
    (
        out.repartition("Norder", "Npix")
        .write.mode("overwrite")
        .partitionBy("Norder", "Dir", "Npix")
        .parquet(f"{cat.path}/neighbor")
    )
