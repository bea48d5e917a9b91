"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Session-level default for :func:`cut_lineage` — set
#: ``spark.conf.set(CONF_LINEAGE_CUT, "reliable")`` once per job to move
#: every lineage cut in the package (curation funnel, CC fixpoint,
#: streaming corpus, catalog rebalance) onto reliable checkpoints
#: without threading a parameter through each call site.
CONF_LINEAGE_CUT = "spark.lsd2.lineageCut"

_CUT_MODES = ("local", "reliable", "persist")


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


def cut_lineage(
    df: DataFrame,
    mode: str | None = None,
    eager: bool = True,
    allow_persist: bool = False,
) -> DataFrame:
    """Materialize ``df`` so downstream stages neither recompute it nor
    grow its plan.  Three modes, picked per call or once per session
    via ``spark.conf.set(CONF_LINEAGE_CUT, ...)`` (``mode=None`` reads
    the conf; the conf's default is ``"local"``):

    - ``"local"`` — ``localCheckpoint``: truncates lineage, stores
      blocks on EXECUTOR storage only.  Fastest, and the right default
      on static clusters/local mode — but NOT executor-loss-safe: on a
      preemptible/dynamic-allocation cluster, losing one executor after
      the cut fails the job unrecoverable (no lineage to recompute, no
      replica to read).
    - ``"reliable"`` — ``df.checkpoint()``: truncates lineage and
      writes the blocks to the job's checkpoint directory (any
      Hadoop-resolvable URI — HDFS/``s3a://``/``abfss://``), so lost
      executors re-read instead of killing the job.  Requires
      ``spark.sparkContext.setCheckpointDir(...)`` first; point it at
      the same object store the catalog's LifecycleFS targets.  Costs
      one distributed write+read per cut (measured ~7% on the sf0.1
      curation funnel — bench ``curation_funnel_reliable``).
      Lifecycle note: Spark does NOT delete checkpoint files when the
      DataFrame is garbage-collected unless
      ``spark.cleaner.referenceTracking.cleanCheckpoints=true``; for
      iterative cuts (the CC fixpoint writes one checkpoint per round)
      either enable that cleaner or point the dir at a per-job path
      removed when the job ends / TTL'd by the store.
    - ``"persist"`` — ``MEMORY_AND_DISK`` cache: KEEPS lineage (lost
      blocks recompute — safest on preemptible clusters, zero extra
      I/O when nothing fails) but is NOT a plan cut, so it is invalid
      where the cut exists to bound plan depth (iterative fixpoints)
      or to break a read-path/write-path cycle, and callers with those
      constraints pass ``allow_persist=False`` (the default) to reject
      it loudly.

    Why the cut exists at all: Spark 4.1's AQE exchange-reuse
    canonicalization rebuilds ``MapInPandasExec`` with a null session
    and NPEs once such a node sits under a deep-enough plan (observed:
    a nine-stage corpus build died 9.5 min into analysis; with the cut
    it runs in 96 s) — and composed pipelines want each macro-stage
    computed once, not re-derived by every downstream action."""
    explicit = mode is not None
    if mode is None:
        mode = df.sparkSession.conf.get(CONF_LINEAGE_CUT, "local")
    if mode not in _CUT_MODES:
        raise ValueError(f"lineage-cut mode must be one of {_CUT_MODES}, got {mode!r}")
    if mode == "persist" and not allow_persist:
        if explicit:
            raise ValueError(
                "this call site requires a true plan cut (iterative "
                "fixpoint or self-overwrite); use mode='local' or "
                "'reliable'"
            )
        mode = "local"  # session-wide persist default: downgrade to a real cut
    if mode == "persist":
        from pyspark.storagelevel import StorageLevel

        return df.persist(StorageLevel.MEMORY_AND_DISK)
    if mode == "reliable":
        if df.sparkSession.sparkContext.getCheckpointDir() is None:
            raise ValueError(
                "lineage_cut='reliable' needs a checkpoint directory: "
                "call spark.sparkContext.setCheckpointDir(<job store "
                "URI>) first (use the same object store the catalog "
                "lifecycle targets)"
            )
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
