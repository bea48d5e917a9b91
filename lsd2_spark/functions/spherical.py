"""Spherical geometry as pure Spark Column expressions.

The reference computes great-circle distances and gnomonic projections
with NumPy ufuncs inside Dask kernels (reference: hipscat/util.py:197-223).
Here the distance is a **Column expression** — it stays inside
whole-stage codegen, needs no Python round-trip, and Catalyst can fold
constants into it.  The gnomonic projection is provided as NumPy for
use inside the kNN pandas kernel (it never needs to be a Column).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["gc_dist", "gc_dist_sql", "gnomonic_xy_np"]


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.lit(float(x))


def gc_dist(lon1, lat1, lon2, lat2) -> Column:
    """Great-circle separation in **degrees** (haversine form).

    Column-native equivalent of the reference's ``gc_dist``
    (hipscat/util.py:211-223).  Arguments are Columns or scalars in
    degrees.
    """
    lon1, lat1, lon2, lat2 = (_c(v) for v in (lon1, lat1, lon2, lat2))
    rlon1, rlat1 = F.radians(lon1), F.radians(lat1)
    rlon2, rlat2 = F.radians(lon2), F.radians(lat2)
    a = F.pow(F.sin((rlat1 - rlat2) / 2.0), 2) + F.cos(rlat1) * F.cos(rlat2) * F.pow(
        F.sin((rlon1 - rlon2) / 2.0), 2
    )
    # clamp for FP safety at antipodes
    a = F.least(F.greatest(a, F.lit(0.0)), F.lit(1.0))
    return F.degrees(2.0 * F.asin(F.sqrt(a)))


def gc_dist_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """The same haversine distance as an ANSI-SQL string — used to build
    DuckDB oracle queries that must match the Spark expression exactly
    (same operation order, so FP results agree to the ULP level)."""
    return (
        "degrees(2*asin(sqrt(least(greatest("
        f"pow(sin((radians({lat1})-radians({lat2}))/2),2)"
        f"+cos(radians({lat1}))*cos(radians({lat2}))"
        f"*pow(sin((radians({lon1})-radians({lon2}))/2),2)"
        ",0.0),1.0))))"
    )


def gnomonic_xy_np(
    ra: np.ndarray, dec: np.ndarray, center_ra: float, center_dec: float
) -> tuple[np.ndarray, np.ndarray]:
    """Gnomonic (tangent-plane) projection around a center, in degrees.

    NumPy version for the kNN kernel (reference semantics:
    hipscat/util.py:197-208, applied at hipscat/dask_utils.py:433-442).
    """
    lon = np.radians(np.asarray(ra, dtype=np.float64))
    lat = np.radians(np.asarray(dec, dtype=np.float64))
    clon = np.radians(center_ra)
    clat = np.radians(center_dec)
    cosc = np.sin(clat) * np.sin(lat) + np.cos(clat) * np.cos(lat) * np.cos(lon - clon)
    cosc = np.where(np.abs(cosc) < 1e-12, 1e-12, cosc)
    x = np.cos(lat) * np.sin(lon - clon) / cosc
    y = (np.cos(clat) * np.sin(lat) - np.sin(clat) * np.cos(lat) * np.cos(lon - clon)) / cosc
    return np.degrees(x), np.degrees(y)
