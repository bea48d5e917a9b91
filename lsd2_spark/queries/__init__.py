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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # Historical testdata stored events.ts as TIMESTAMP(NANOS), which
        # Spark only reads with the legacy nanos-as-long conversion on.
        # Set it here (runtime-settable, idempotent) so load_table works in
        # ANY session — the correctness harness builds its own SparkSession
        # that never saw session.py.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events":
        # Normalize ts to session-tz TimestampType regardless of how the
        # generator wrote it (the testdata format has changed across rounds):
        #   * TIMESTAMP(NANOS)  -> read as long via nanosAsLong; values are
        #     micro-precision, so integer `div 1000` is lossless (double
        #     division rounds at ~1.7e18 and shifts ~1.5% of timestamps 1us)
        #   * timestamp[us] NTZ -> plain cast; session tz is UTC so the
        #     instant matches DuckDB's naive reading bit-for-bit
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            # long ts can be epoch NANOS (legacy TIMESTAMP(NANOS) under
            # nanosAsLong, ~1.7e18 for the 2024 era) or plain epoch
            # MICROS (~1.7e15); a one-row probe disambiguates by
            # magnitude (2^57 ≈ 1.4e17 sits between the eras)
            probe = df.select("ts").filter(F.col("ts").isNotNull()).limit(1).collect()
            if probe and abs(probe[0]["ts"]) < (1 << 57):
                df = df.withColumn("ts", F.timestamp_micros(F.col("ts")))
            else:
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


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
