"""SparkSession factory for lsd2_spark.

One place to set the configs that matter for both local testing and a
large cluster:

- AQE on (runtime coalescing, skew-join splitting) — the reference
  hand-sizes tasks per file (catalog.py:120, 183-191); AQE is the
  Spark-native replacement.
- Arrow enabled for every pandas-UDF boundary (the kNN kernel and the
  HEALPix vectorized functions cross it).
- ``spark.sql.session.timeZone=UTC`` so timestamp semantics match the
  ANSI/DuckDB oracle used by the correctness harness.
- Shuffle partitions default to the local core count; on a real
  cluster the caller overrides via ``extra_conf`` or spark-submit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "stop_spark"]

DEFAULT_APP_NAME = "lsd2_spark"


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with lsd2_spark defaults.

    Defaults are tuned for local[N] testing; every knob can be
    overridden for cluster deployment via ``extra_conf``.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # larger Arrow batches amortize the Python-worker round-trip for
        # the vectorized UDFs (measured ~10% on the crossmatch bench)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.filterPushdown", "true")
        # driver testdata stores TIMESTAMP(NANOS) parquet; read as long + convert
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Python-side call-site capture (DataFrame debugging) costs two
        # extra py4j round-trips plus a stack inspection on EVERY
        # DataFrame/Column API call — measured 40-60% of driver-side
        # plan-construction wall on expression-heavy operators (16-way
        # minhash tags, unrolled folds).  The feature only enriches
        # error messages with Python line numbers; plans, results and
        # JVM-side error handling are unchanged at any scale.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.driver.memory", os.environ.get("LSD2_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
