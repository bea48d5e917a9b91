"""HEALPix as Spark columns — vectorized pandas UDFs over the pure-NumPy
core (lsd2_spark.healpix).

The reference calls healpy inside every Dask kernel (e.g.
hipscat/dask_utils.py:67, 96, 122).  Here pixelization is a single
Arrow-batched pandas UDF: one NumPy call per batch, no per-row Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from lsd2_spark import healpix as hpx

__all__ = ["ang2pix_udf", "ang2pix_col"]


@F.pandas_udf(LongType())
def _ang2pix_kernel(order: pd.Series, ra: pd.Series, dec: pd.Series) -> pd.Series:
    if len(order) == 0:
        return pd.Series([], dtype="Int64")
    k = int(order.iloc[0])  # constant within a call (passed as lit)
    valid = ra.notna() & dec.notna()
    out = pd.Series([pd.NA] * len(ra), dtype="Int64")
    if valid.any():
        out[valid] = hpx.ang2pix(
            k, ra[valid].to_numpy(dtype="float64"), dec[valid].to_numpy(dtype="float64")
        )
    return out


def ang2pix_udf(order: int, ra: Column, dec: Column) -> Column:
    """(ra, dec) degrees → nested HEALPix pixel at ``order``, as a Column."""
    return _ang2pix_kernel(F.lit(int(order)), ra, dec)


def ang2pix_col(order: int, ra, dec) -> Column:
    if not isinstance(ra, Column):
        ra = F.col(ra)
    if not isinstance(dec, Column):
        dec = F.col(dec)
    return ang2pix_udf(order, ra, dec)
