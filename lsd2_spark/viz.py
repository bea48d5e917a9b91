"""Sky visualizations — SVG Mollweide renderings of HEALPix maps.

Reference parity: ``Catalog.visualize_sources`` / ``visualize_partitions``
/ ``visualize_cone_search`` / ``visualize_cross_match``
(/root/reference/hipscat/catalog.py:256-346) render ``hp.mollview``
figures in a notebook.  Neither matplotlib nor healpy exists in this
environment, so the same four entry points are provided as
self-contained SVG renderers over the engine's own data surfaces
(``Catalog.sky_map`` per-pixel counts, the metadata coverage map, and
``healpix.cone_cover``) — viewable in any browser/notebook with zero
dependencies.  ``visualize_cross_match`` renders the coverage overlap
of the two catalogs (the reference raises NotImplementedError there,
catalog.py:346).

Rendering cost is driver-side and plan-sized: one polygon per HEALPix
cell of a *coarse* map (counts are aggregated in Spark first; only the
≤ 12·4^order histogram rows reach the driver — same bound as the
reference's FITS-map reads).
"""

from __future__ import annotations

import numpy as np

from lsd2_spark import healpix as hpx

__all__ = [
    "mollweide_svg",
    "visualize_sources",
    "visualize_partitions",
    "visualize_cone_search",
    "visualize_cross_match",
]


def _mollweide_xy(ra_deg: np.ndarray, dec_deg: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized Mollweide projection.  lon 180→-180 maps left→right
    (astronomy convention, matching ``hp.mollview``): x ∈ [-2√2, 2√2],
    y ∈ [-√2, √2]."""
    lon = np.radians(((np.asarray(ra_deg, dtype=np.float64) + 180.0) % 360.0) - 180.0)
    lat = np.radians(np.asarray(dec_deg, dtype=np.float64))
    theta = lat.copy()
    # Newton iterations for 2θ + sin 2θ = π sin φ (exact at the poles)
    ok = np.abs(lat) < np.pi / 2 - 1e-9
    for _ in range(12):
        t = theta[ok]
        f = 2.0 * t + np.sin(2.0 * t) - np.pi * np.sin(lat[ok])
        theta[ok] = t - f / (2.0 + 2.0 * np.cos(2.0 * t) + 1e-15)
    x = -(2.0 * np.sqrt(2.0) / np.pi) * lon * np.cos(theta)
    y = np.sqrt(2.0) * np.sin(theta)
    return x, y


# a compact viridis-like ramp (anchor colors, linear interpolation)
_RAMP = np.array(
    [
        (68, 1, 84),
        (59, 82, 139),
        (33, 145, 140),
        (94, 201, 98),
        (253, 231, 37),
    ],
    dtype=np.float64,
)


def _colors(vals: np.ndarray) -> list[str]:
    v = np.asarray(vals, dtype=np.float64)
    lo, hi = np.nanmin(v), np.nanmax(v)
    t = np.zeros_like(v) if hi <= lo else (v - lo) / (hi - lo)
    pos = t * (len(_RAMP) - 1)
    i = np.clip(pos.astype(int), 0, len(_RAMP) - 2)
    frac = pos - i
    rgb = _RAMP[i] * (1 - frac[:, None]) + _RAMP[i + 1] * frac[:, None]
    return ["#%02x%02x%02x" % tuple(c) for c in rgb.astype(int)]


def mollweide_svg(
    orders: np.ndarray,
    pixels: np.ndarray,
    values: np.ndarray,
    title: str = "",
    width: int = 800,
    highlight: np.ndarray | None = None,
) -> str:
    """Render HEALPix cells (per-cell ``orders``/``pixels``) colored by
    ``values`` as a Mollweide SVG.  ``highlight`` marks a boolean subset
    with a contrasting stroke (cone searches).  Pure NumPy + string
    assembly; one polygon per cell."""
    orders = np.asarray(orders, dtype=np.int64)
    pixels = np.asarray(pixels, dtype=np.int64)
    values = np.asarray(values, dtype=np.float64)
    height = int(width * 0.55)
    sx, sy = width / (4 * np.sqrt(2) * 1.02), (height - 24) / (2 * np.sqrt(2) * 1.02)
    cx, cy = width / 2.0, (height + 24) / 2.0

    fills = _colors(values)
    polys: list[str] = []
    for o in np.unique(orders):
        sel = np.nonzero(orders == o)[0]
        bra, bdec = hpx.boundary_samples(int(o), pixels[sel], n_per_edge=3)
        cra, _ = hpx.pix2ang(int(o), pixels[sel])
        # unwrap corner lons around each cell's center so seam-crossing
        # cells project as one compact polygon (slight overflow past
        # ±180° is clipped by the viewBox)
        delta = ((bra - cra[:, None] + 180.0) % 360.0) - 180.0
        px, py = _mollweide_xy(cra[:, None] + delta, bdec)
        X = (cx + sx * px).round(2)
        Y = (cy - sy * py).round(2)
        for k, idx in enumerate(sel):
            pts = " ".join(f"{X[k, m]},{Y[k, m]}" for m in range(X.shape[1]))
            hl = highlight is not None and bool(highlight[idx])
            stroke = ' stroke="#ff3333" stroke-width="1.2"' if hl else ' stroke="none"'
            polys.append(f'<polygon points="{pts}" fill="{fills[idx]}"{stroke}/>')

    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        f'viewBox="0 0 {width} {height}">'
        f'<rect width="{width}" height="{height}" fill="white"/>'
        f'<text x="{cx}" y="16" text-anchor="middle" font-family="sans-serif" '
        f'font-size="14">{title}</text>' + "".join(polys) + "</svg>"
    )


def visualize_sources(catalog, order: int = 5, width: int = 800) -> str:
    """log10(count+1) source-density map (reference
    catalog.py:256-269).  Counts aggregate in Spark via
    ``Catalog.sky_map``; only the coarse histogram reaches the driver."""
    pdf = catalog.sky_map(order).toPandas()
    total = int(pdf["cnt"].sum())
    return mollweide_svg(
        np.full(len(pdf), order),
        pdf["pix"].to_numpy(),
        np.log10(pdf["cnt"].to_numpy() + 1.0),
        title=f"{catalog.meta.cat_name}: {total:,} sources",
        width=width,
    )


def visualize_partitions(catalog, width: int = 800) -> str:
    """Partition-structure map: one polygon per leaf cell, colored by
    its order (reference catalog.py:271-299 renders the same
    information rasterized to the max order)."""
    orders, pixels = [], []
    for o, ps in sorted(catalog.meta.hips.items()):
        orders.extend([o] * len(ps))
        pixels.extend(ps)
    return mollweide_svg(
        np.array(orders),
        np.array(pixels),
        np.array(orders, dtype=float),
        title=f"{catalog.meta.cat_name} partitions",
        width=width,
    )


def visualize_cone_search(
    catalog, ra: float, dec: float, radius: float, order: int = 5, width: int = 800
) -> str:
    """Source map with the cone's pixels highlighted (reference
    catalog.py:302-334 paints the queried pixels over the density
    map)."""
    pdf = catalog.sky_map(order).toPandas()
    cone = set(hpx.cone_cover(order, float(ra), float(dec), float(radius)).tolist())
    hl = pdf["pix"].isin(cone).to_numpy()
    return mollweide_svg(
        np.full(len(pdf), order),
        pdf["pix"].to_numpy(),
        np.log10(pdf["cnt"].to_numpy() + 1.0),
        title=f"Cone search of {catalog.meta.cat_name}",
        width=width,
        highlight=hl,
    )


def visualize_cross_match(catalog, other, width: int = 800) -> str:
    """Coverage-overlap map for a cross-match: each cell of the finer
    aligned coverage colored 2 where both catalogs have sources, 1
    where only one does.  (The reference's entry point raises
    NotImplementedError, catalog.py:346.)"""
    def flat(hips: dict[int, list[int]], k: int) -> np.ndarray:
        out = np.zeros(hpx.npix(k), dtype=bool)
        for o, ps in hips.items():
            ps = np.asarray(ps, dtype=np.int64)
            if o <= k:  # expand each cell into its 4^(k-o) children
                n = 1 << (2 * (k - o))
                out[(ps[:, None] * n + np.arange(n)[None, :]).ravel()] = True
            else:  # finer than the render order → mark the parents
                out[ps >> (2 * (o - k))] = True
        return out

    k = min(6, max(max(catalog.meta.hips), max(other.meta.hips)))
    a, b = flat(catalog.meta.hips, k), flat(other.meta.hips, k)
    any_cov = a | b
    pixels = np.nonzero(any_cov)[0]
    vals = a[pixels].astype(float) + b[pixels].astype(float)
    return mollweide_svg(
        np.full(len(pixels), k),
        pixels,
        vals,
        title=f"{catalog.meta.cat_name} × {other.meta.cat_name} coverage overlap",
        width=width,
    )
