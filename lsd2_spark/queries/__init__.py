"""Query registry — the engine's declared operator surface.

Each entry pairs a Spark implementation with an ANSI-SQL oracle that
DuckDB runs on the same parquet tables.  This is the shape the driver's
correctness harness consumes via ``__spark_entry__``.

Registration:  modules call ``register(name, fn, oracle=None)``.
``fn(spark, sf_dir) -> DataFrame``; ``oracle`` is a SQL string or None
for non-SQL-expressible operators (driver then records a weaker
rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


# Per-path memo of the events.ts storage strategy — the footer probe
# runs ONCE per distinct path, driver-side, with no Spark job.
# Strategies: 'native' (timestamp-typed, plain cast), 'micros_long'
# (int64 epoch micros), 'nanos_long' (int64 epoch nanos), and
# 'nanos_legacy' (parquet TIMESTAMP(NANOS), which Spark can only read
# with the legacy nanos-as-long conversion on).
_EVENTS_TS_STRATEGY: dict[str, str] = {}


def _probe_events_ts(path: str) -> str:
    """Inspect the parquet footer (pyarrow, driver-side, no Spark job)
    to classify how the driver's generator stored events.ts — the
    format has changed across testdata generations."""
    import glob as _glob
    import os as _os

    import pyarrow as pa
    import pyarrow.parquet as pq

    f = path
    if _os.path.isdir(path):
        parts = sorted(_glob.glob(_os.path.join(path, "*.parquet")))
        if not parts:
            raise FileNotFoundError(f"no parquet files under {path}")
        f = parts[0]
    t = pq.read_schema(f).field("ts").type
    if pa.types.is_timestamp(t):
        return "nanos_legacy" if t.unit == "ns" else "native"
    if pa.types.is_integer(t):
        # epoch NANOS sit at ~1.7e18 for the current era, MICROS at
        # ~1.7e15; 2^57 ≈ 1.4e17 separates them.  Read ONE value.
        pf = pq.ParquetFile(f)
        for batch in pf.iter_batches(batch_size=1, columns=["ts"]):
            if batch.num_rows:
                v = batch.column(0)[0].as_py()
                if v is not None:
                    return "micros_long" if abs(v) < (1 << 57) else "nanos_long"
        return "micros_long"  # empty/all-null: either works
    return "native"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name != "events":
        return spark.read.parquet(path)

    # Normalize ts to session-tz TimestampType regardless of how the
    # generator wrote it.  The probe is memoized per path and touches
    # only the footer (plus at most one value for bare int64), so
    # repeated query builds cost nothing and — crucially — the shared
    # session's conf is NOT mutated unless the data is genuinely
    # TIMESTAMP(NANOS), a legacy format Spark can only scan with
    # spark.sql.legacy.parquet.nanosAsLong on.  That conf must stay on
    # for the lifetime of the (lazy) DataFrame, so it cannot be scoped
    # tighter; every other storage era leaves the session untouched.
    strat = _EVENTS_TS_STRATEGY.get(path)
    if strat is None:
        strat = _probe_events_ts(path)
        _EVENTS_TS_STRATEGY[path] = strat

    from pyspark.sql import functions as F

    if strat == "nanos_legacy":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        # micro-precision values: integer `div 1000` is lossless (double
        # division rounds at ~1.7e18 and shifts ~1.5% of timestamps 1us)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    df = spark.read.parquet(path)
    if strat == "micros_long":
        return df.withColumn("ts", F.timestamp_micros(F.col("ts")))
    if strat == "nanos_long":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)


_loaded = False


def _ensure_loaded() -> None:
    global _loaded
    if _loaded:
        return
    # Import for registration side effects.  ORDER MATTERS: the driver's
    # correctness harness runs queries in registration order and has
    # historically truncated its artifact at 50 entries (round 5 dropped
    # the last two registered queries).  The surface is now exactly 50
    # queries (see tests/test_registry.py), and similarity — the block
    # that fell off in round 5 — registers first as extra insurance.
    from lsd2_spark.queries import similarity, spatial, relational, text  # noqa: F401

    _loaded = True
