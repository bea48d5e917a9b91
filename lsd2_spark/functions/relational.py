"""Small relational helpers mirroring reference utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prefix_columns(df: DataFrame, prefix: str, sep: str = "_") -> DataFrame:
    """Prefix every column for join disambiguation (reference P3,
    hipscat/util.py:299-324 — which uses ``catname.col``; Spark
    prefers ``catname_col`` since dots require backticks)."""
    return df.select([F.col(c).alias(f"{prefix}{sep}{c}") for c in df.columns])


def with_required_columns(columns: list[str], required: list[str]) -> list[str]:
    """Reference P2 (util.py:276-296): user projections always include
    the positional/id columns the engine needs downstream."""
    out = list(columns)
    for c in required:
        if c not in out:
            out.append(c)
    return out
