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
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) parquet, read as long nanos via
        # spark.sql.legacy.parquet.nanosAsLong; values are micro-precision
        # (verified), so the nanos→micros conversion is lossless.
        from pyspark.sql import functions as F

        df = df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
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
