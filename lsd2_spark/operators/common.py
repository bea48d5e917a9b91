"""Shared operator utilities."""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession

log = logging.getLogger(__name__)

#: Session-level default for :func:`cut_lineage` — set
#: ``spark.conf.set(CONF_LINEAGE_CUT, "reliable")`` once per job to move
#: every lineage cut in the package (curation funnel, CC fixpoint,
#: streaming corpus, catalog rebalance) onto reliable checkpoints
#: without threading a parameter through each call site.  The default
#: is ``"auto"``: reliable whenever the session has a checkpoint
#: directory, local otherwise — so on a real cluster the one line
#: ``spark.sparkContext.setCheckpointDir(<job store>)`` makes the
#: executor-loss-safe flavor the zero-config choice everywhere.
CONF_LINEAGE_CUT = "spark.lsd2.lineageCut"

_CUT_MODES = ("auto", "local", "reliable", "persist")

# once-per-session warning registry: both warnings below fire on paths
# that recur per micro-batch / per fixpoint round, and a long-lived
# stream would otherwise emit the identical line for every batch for
# the query's lifetime
_warned_once: set[str] = set()


def _warn_once(key: str, msg: str, *args) -> None:
    if key not in _warned_once:
        _warned_once.add(key)
        log.warning(msg, *args)


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


def resolve_cut_mode(
    spark: SparkSession,
    mode: str | None = None,
    allow_persist: bool = False,
) -> str:
    """Resolve the lineage-cut mode :func:`cut_lineage` will use —
    ``"local"``, ``"reliable"``, or ``"persist"`` — applying the
    session conf default, the ``"auto"`` rule (reliable iff a
    checkpoint directory is set), and the true-cut downgrade of a
    session-wide ``"persist"``.  Exposed so iterative callers that
    manage checkpoint-file lifecycle (:func:`~lsd2_spark.operators.
    dedup.connected_components`) can learn the resolved flavor up
    front and pass it back explicitly."""
    explicit = mode is not None
    if mode is None:
        mode = spark.conf.get(CONF_LINEAGE_CUT, "auto")
        if mode not in _CUT_MODES:
            raise ValueError(
                f"{CONF_LINEAGE_CUT}={mode!r}: expected one of {_CUT_MODES}"
            )
    if mode not in _CUT_MODES:
        raise ValueError(f"lineage-cut mode must be one of {_CUT_MODES}, got {mode!r}")
    has_dir = spark.sparkContext.getCheckpointDir() is not None
    if mode == "persist" and not allow_persist:
        if explicit:
            raise ValueError(
                "this call site requires a true plan cut (iterative "
                "fixpoint or self-overwrite); use mode='local' or "
                "'reliable'"
            )
        # session-wide persist was chosen FOR executor-loss robustness;
        # downgrade to the executor-loss-safe real cut when the session
        # can take one, and say so either way — a silent downgrade to
        # 'local' would defeat the user's stated safety intent
        fallback = "reliable" if has_dir else "local"
        _warn_once(
            f"persist-downgrade-{fallback}",
            "%s='persist' is not a plan cut at this call site; "
            "downgrading to %r%s (warning once per session — applies "
            "to every subsequent cut under this conf)",
            CONF_LINEAGE_CUT,
            fallback,
            (
                ""
                if has_dir
                else " (executor-loss FATAL — set a checkpoint dir to "
                "get the 'reliable' downgrade instead)"
            ),
        )
        mode = fallback
    if mode == "auto":
        mode = "reliable" if has_dir else "local"
    return mode


def cut_lineage(
    df: DataFrame,
    mode: str | None = None,
    eager: bool = True,
    allow_persist: bool = False,
) -> DataFrame:
    """Materialize ``df`` so downstream stages neither recompute it nor
    grow its plan.  Modes, picked per call or once per session
    via ``spark.conf.set(CONF_LINEAGE_CUT, ...)`` (``mode=None`` reads
    the conf; the conf's default is ``"auto"``):

    - ``"auto"`` (conf default) — ``"reliable"`` when the session has a
      checkpoint directory (``spark.sparkContext.setCheckpointDir``),
      ``"local"`` otherwise: the safe flavor is the zero-config choice
      on clusters that configured a job store, and local mode keeps
      the fast path.
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
      Lifecycle: Spark does NOT delete checkpoint files when the
      DataFrame is garbage-collected unless
      ``spark.cleaner.referenceTracking.cleanCheckpoints=true``.
      Iterative callers in this package MANAGE the files themselves —
      the CC fixpoint deletes round N−1's checkpoint via
      :func:`remove_checkpoint_file` as soon as round N materializes,
      so the dir holds at most two rounds at any instant (pytest-
      pinned in tests/test_lineage_cut.py) — but the FINAL cut of any
      operator stays on disk for as long as its DataFrame may be read;
      point the dir at a per-job path removed when the job ends, or
      enable the cleaner conf, to reclaim those.
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
    mode = resolve_cut_mode(df.sparkSession, mode, allow_persist=allow_persist)
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


def checkpoint_file_of(df: DataFrame, expect_reliable: bool = False) -> str | None:
    """The reliable-checkpoint directory backing ``df`` (a DataFrame
    returned by ``df.checkpoint()`` / ``cut_lineage(mode='reliable')``),
    or None when the frame is not reliably checkpointed.  Reads the
    checkpointed RDD off the ``LogicalRDD`` plan node — internal API,
    so any shape surprise degrades to None (callers then simply skip
    file management; nothing breaks).

    Callers that just took a RELIABLE cut pass ``expect_reliable=True``:
    a None then means the internal plan walk broke (Spark Connect, a
    plan-shape change in a version bump) and every checkpoint-file
    reclamation in the package is silently off — the job store grows by
    one corpus-scale snapshot per round/batch.  That degradation is
    best-effort by design, but it must be DIAGNOSABLE, so it logs a
    once-per-session warning instead of staying silent."""
    try:
        opt = df._jdf.queryExecution().analyzed().rdd().getCheckpointFile()
        got = opt.get() if opt.isDefined() else None
    except Exception:
        got = None
    if got is None and expect_reliable:
        _warn_once(
            "checkpoint-file-unresolvable",
            "could not resolve the checkpoint file of a reliably-"
            "checkpointed DataFrame (internal plan walk failed — Spark "
            "Connect or a plan-shape change?); per-round/per-batch "
            "checkpoint reclamation is DISABLED for this session and "
            "the checkpoint directory will grow until the job ends",
        )
    return got


def remove_checkpoint_file(spark: SparkSession, uri: str) -> bool:
    """Recursively delete one checkpoint directory through the Hadoop
    FileSystem API (works on any URI the checkpoint dir can point at —
    ``file://``/HDFS/``s3a://``/``abfss://``).  Iterative operators
    call this on round N−1's files as soon as round N materializes:
    the old blocks are unreferenced (min-label monotonicity — nothing
    re-reads a superseded round), and without deletion a long fixpoint
    writes one corpus-scale checkpoint per round into the job store.
    Best-effort: failure logs and returns False rather than failing
    the job over cleanup."""
    try:
        jvm = spark.sparkContext._jvm
        path = jvm.org.apache.hadoop.fs.Path(uri)
        fs = path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        return bool(fs.delete(path, True))
    except Exception as e:
        log.warning("could not delete checkpoint files at %s: %s", uri, e)
        return False
