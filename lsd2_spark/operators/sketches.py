"""Distinct-count sketches for 100 TB-scale cardinality estimation.

KMV (k-minimum-values, "bottom-k") sketch: hash every value with the
portable 60-bit md5 hash, keep the k smallest DISTINCT hashes per
group, and estimate the cardinality from the k-th smallest normalized
hash as ``(k-1) / u_k``.  Groups with fewer than k distinct hashes are
EXACT (the estimate is just the count).

Why KMV and not HyperLogLog here: Spark's native
``approx_count_distinct`` (HLL++) is the right call when engine
portability doesn't matter, but its estimate is implementation-
specific and cannot be replayed by another engine.  KMV with a
portable hash is fully deterministic — the DuckDB oracle reproduces
the exact same sketch and estimate, so the gate hash-matches —
while keeping the properties that matter at scale: bounded size (k
values per group), mergeable (bottom-k of bottom-ks is the global
bottom-k), one-pass.

Distributed shape: a shuffle-free ``mapInPandas`` partial pass keeps
at most k distinct hashes per (group, input partition), so the only
shuffle moves ≤ k rows per group per partition — never the raw value
stream.  The partial step is lossless for the final sketch.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lsd2_spark.functions.portable_hash import hash64

__all__ = ["kmv_distinct", "corpus_quantiles"]

_TWO60 = float(1 << 60)


def kmv_distinct(
    df: DataFrame, col: str, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Per-group distinct-count estimate via a deterministic KMV
    sketch over ``col``.  Returns ``group_cols + (n_kept, est_distinct)``
    where ``n_kept`` is the sketch occupancy (= exact distinct count
    when below k) and ``est_distinct`` the cardinality estimate."""
    assert k >= 2
    proj = df.select(*group_cols, hash64(F.col(col)).alias("_h")).filter(
        F.col("_h").isNotNull()
    )
    schema = proj.schema

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-input-partition bottom-k of DISTINCT hashes per group —
        # state across Arrow batches, emitted once at iterator end
        acc: dict[tuple, np.ndarray] = {}
        for pdf in batches:
            for key, grp in pdf.groupby(group_cols, dropna=False, sort=False):
                key = key if isinstance(key, tuple) else (key,)
                hs = grp["_h"].to_numpy(dtype=np.int64)
                prev = acc.get(key)
                merged = np.unique(hs if prev is None else np.concatenate([prev, hs]))
                acc[key] = merged[:k]  # np.unique sorts ascending
        if acc:
            keys = list(acc.keys())
            counts = [len(acc[kk]) for kk in keys]
            out = {
                c: np.repeat([kk[i] for kk in keys], counts)
                for i, c in enumerate(group_cols)
            }
            out["_h"] = np.concatenate([acc[kk] for kk in keys])
            yield pd.DataFrame(out)

    partials = proj.mapInPandas(partial, schema)
    # global merge: bottom-k of the per-partition bottom-ks (≤ k rows
    # per group per partition enter this shuffle)
    w = Window.partitionBy(*group_cols).orderBy(F.col("_h").asc())
    kept = (
        partials.dropDuplicates([*group_cols, "_h"])
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
    )
    agg = kept.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("_h").alias("_hk")
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(_TWO60) / F.col("_hk").cast("double")
    )
    return agg.select(*group_cols, "n_kept", est.alias("est_distinct"))


def corpus_quantiles(
    df: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    probs: list[float] = (0.5, 0.9, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group approximate quantiles of a numeric column — the
    "what's the p50/p99 document length of this corpus slice" statistic
    an LLM-data pipeline computes before setting filter thresholds.

    Deliberately NOT a hand-rolled sketch: Spark's native
    ``percentile_approx`` is a JVM-side Greenwald-Khanna sketch with
    map-side partial aggregation and a rank-error bound of
    ``1/accuracy`` — at 100 TB the shuffle moves one bounded sketch
    per group per partition, never the value stream.  (Contrast KMV
    above, which is hand-rolled only because the estimate must be
    engine-portable for the oracle gate; quantile estimates are
    checked by rank-error bound instead.)
    """
    group_cols = list(group_cols or [])
    agg = df.groupBy(*group_cols) if group_cols else df.groupBy()
    out = agg.agg(
        F.count(F.col(col)).alias("n"),
        F.percentile_approx(
            F.col(col), F.array(*[F.lit(p) for p in probs]), accuracy
        ).alias("_q"),
    )
    return out.select(
        *group_cols,
        "n",
        *[
            F.col("_q")[i].alias("p" + format(p * 100, "g").replace(".", "_"))
            for i, p in enumerate(probs)
        ],
    )
