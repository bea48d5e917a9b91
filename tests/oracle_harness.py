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


def canonical_hash(df: pd.DataFrame) -> str:
    """md5 of the canonical CSV: columns sorted by name, rows sorted by
    all columns, floats rendered at 17 significant digits (round-trip
    exact for doubles), None/NaN as empty.  When a driver gate row reds
    while local is green, comparing this hash per side tells WHICH side
    moved instead of re-deriving the whole row."""
    import hashlib

    d = _normalize(df)
    cells = []
    # itertuples, NOT iterrows: iterrows materializes each row as a
    # Series, upcasting mixed numeric rows to float64 — an int id next
    # to a float score would render as '522.0' and defeat the hash's
    # whole purpose of catching textual int/float forks
    for row in d.itertuples(index=False, name=None):
        parts = []
        for v in row:
            if v is None or (isinstance(v, float) and np.isnan(v)):
                parts.append("")
            elif isinstance(v, (float, np.floating)):
                parts.append(repr(float(v)))
            elif isinstance(v, (list, np.ndarray)):
                parts.append(
                    "["
                    + ",".join(
                        repr(float(x)) if isinstance(x, (float, np.floating)) else str(x)
                        for x in v
                    )
                    + "]"
                )
            else:
                parts.append(str(v))
        cells.append("\x1f".join(parts))
    blob = "\x1e".join([",".join(d.columns)] + cells)
    return hashlib.md5(blob.encode("utf-8")).hexdigest()


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "") -> None:
    compare_frames(spark_df.toPandas(), con.execute(sql).df(), name)


def compare_frames(got: pd.DataFrame, want: pd.DataFrame, name: str = "") -> None:
    """compare() over already-materialized frames — callers that also
    hash the results pass the SAME execution's frames here, instead of
    re-running the query and validating a different execution."""
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    g, w = _normalize(got), _normalize(want)
    for c in g.columns:
        gv, wv = g[c].to_numpy(), w[c].to_numpy()
        # An int column on one side and float on the other is a RED gate
        # row even when the values compare equal after casting: the
        # driver hashes a textual canonical form, where 522 != 522.0.
        # The classic cause is a DuckDB SUM(BIGINT) -> HUGEINT -> pandas
        # float64 when the oracle forgot CAST(... AS BIGINT).
        g_int = np.issubdtype(gv.dtype, np.integer)
        w_int = np.issubdtype(np.asarray(wv).dtype, np.integer)
        g_flt = np.issubdtype(gv.dtype, np.floating)
        w_flt = np.issubdtype(np.asarray(wv).dtype, np.floating)
        assert not (g_int and w_flt) and not (g_flt and w_int), (
            f"{name}.{c}: integer/float dtype fork (spark={gv.dtype}, "
            f"oracle={np.asarray(wv).dtype}) — formatted hashes will "
            f"mismatch; CAST the oracle aggregate"
        )
        if g_flt or w_flt:
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
