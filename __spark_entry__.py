"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship spatial query (cone search with the
engine's distance predicate) at sf0.001.  ``queries()``/``oracle_sql()``
expose the full registered operator surface of lsd2_spark (SURVEY.md §2
inventory + LLM-pipeline extensions); the driver cross-checks each
against DuckDB at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from lsd2_spark.queries import all_queries

    # the engine's flagship operator: boundary-correct kNN cross-match
    return all_queries()["q21_crossmatch_knn"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from lsd2_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-expressible query."""
    from lsd2_spark.queries import all_oracles

    return all_oracles()
