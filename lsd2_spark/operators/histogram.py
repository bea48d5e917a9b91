"""Sky histogram + spatial rollup operators (reference SURVEY §2.4
A1-A3: per-pixel counts, tree reduction, rebinning rollup).

Spark-first: the histogram is one partial+final ``groupBy().count()``
(Catalyst's HashAggregate replaces the reference's hand-built dask-bag
tree reduction, partitioner.py:114-124).  The rollup to coarser orders
is pure bit-shift Column arithmetic — ``pix >> 2Δ`` — so it runs as a
second partial aggregation with no extra scan when chained.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lsd2_spark.functions.healpix_cols import ang2pix_udf

__all__ = ["sky_histogram", "rollup_histogram", "rollup_histogram_np"]


def sky_histogram(df: DataFrame, ra_col: str, dec_col: str, order: int) -> DataFrame:
    """(pix, cnt) at ``order`` — reference A1 (dask_utils.py:29-71)."""
    return (
        df.select(ang2pix_udf(order, F.col(ra_col), F.col(dec_col)).alias("pix"))
        .groupBy("pix")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def rollup_histogram(hist: DataFrame, delta_order: int) -> DataFrame:
    """Sum child pixels into parents ``delta_order`` levels up —
    reference A3 (partitioner.py:177-194) as distributed bit-shift
    aggregation."""
    return (
        hist.groupBy(F.shiftright(F.col("pix"), 2 * delta_order).alias("pix"))
        .agg(F.sum("cnt").alias("cnt"))
    )


def rollup_histogram_np(pix: np.ndarray, cnt: np.ndarray, delta_order: int) -> pd.DataFrame:
    """Driver-side sparse rollup (plan-sized histograms)."""
    parent = np.asarray(pix, dtype=np.int64) >> (2 * delta_order)
    s = pd.Series(np.asarray(cnt, dtype=np.int64)).groupby(parent).sum()
    return pd.DataFrame({"pix": s.index.to_numpy(), "cnt": s.to_numpy()})
