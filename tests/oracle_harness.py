"""Local replica of the driver's DuckDB-oracle comparison: run a Spark
query and its oracle SQL on the same parquet, compare row count, column
names, and order-insensitive values (columns sorted by name, rows
sorted by all columns)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from lsd2_spark.queries import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif pd.api.types.is_extension_array_dtype(df[c]):
            df[c] = df[c].astype(object).where(df[c].notna(), None)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "") -> None:
    got = spark_df.toPandas()
    want = con.execute(sql).df()
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    g, w = _normalize(got), _normalize(want)
    for c in g.columns:
        gv, wv = g[c].to_numpy(), w[c].to_numpy()
        if np.issubdtype(gv.dtype, np.floating) or np.issubdtype(np.asarray(wv).dtype, np.floating):
            gv = np.asarray(gv, dtype=np.float64)
            wv = np.asarray(wv, dtype=np.float64)
            both_nan = np.isnan(gv) & np.isnan(wv)
            exact = gv == wv
            assert bool(np.all(both_nan | exact)), (
                f"{name}.{c}: float mismatch; max abs delta "
                f"{np.nanmax(np.abs(gv - wv))}, n_mismatch={(~(both_nan|exact)).sum()}"
            )
        else:
            assert list(gv) == list(wv), f"{name}.{c}: value mismatch"
