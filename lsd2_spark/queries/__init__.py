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
        # events.ts is TIMESTAMP(NANOS) parquet; Spark refuses it unless the
        # legacy nanos-as-long conversion is on.  Set it here (runtime-settable,
        # idempotent) so load_table works in ANY session — the correctness
        # harness builds its own SparkSession that never saw session.py.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events":
        # Values are micro-precision (verified), so nanos→micros is lossless —
        # but only with integer division: double division rounds at ~1.7e18
        # and shifts ~1.5% of microsecond timestamps by 1us.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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
    # import for registration side effects
    from lsd2_spark.queries import relational, spatial, text, similarity  # noqa: F401

    _loaded = True
