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
