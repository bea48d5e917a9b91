"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_partitions(df: DataFrame) -> DataFrame:
    """Ensure enough input partitions to parallelize downstream
    broadcast joins and scoring.

    A small single-file read arrives as ONE partition, and broadcast
    joins preserve partitioning — so every post-join stage runs in one
    task (measured 25s single-threaded vs ~1s spread for the near-dup
    scorer).  Repartition to default parallelism when the input has too
    few partitions; a no-op for well-partitioned inputs at scale."""
    want = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, want // 2):
        return df.repartition(want)
    return df


def cut_lineage(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and return a DataFrame whose plan starts
    fresh (``localCheckpoint(eager=True)``).

    Use between macro-stages of a deep composed pipeline when the
    upstream contains Python exec nodes (``mapInPandas`` /
    ``applyInPandas`` — the kNN/semdedup/media kernels): Spark 4.1's
    AQE exchange-reuse canonicalization rebuilds ``MapInPandasExec``
    with a null session and NPEs once such a node sits under a
    deep-enough plan (observed: a nine-stage corpus build died 9.5 min
    into analysis; with the cut it runs in 96 s).  Also simply the
    production shape for corpus builds — each macro-stage's result is
    computed once instead of re-derived by every downstream action."""
    return df.localCheckpoint(eager=True)
