"""Sinks beyond the core catalog writer (reference SURVEY §2.1 S9,
S12, S13)."""

from __future__ import annotations

import glob
import os

import pandas as pd
from pyspark.sql import DataFrame


def write_parquet_metadata_sidecar(catalog_root: str) -> None:
    """Write ``_metadata`` / ``_common_metadata`` sidecars aggregating
    every footer under a catalog (reference S9, partitioner.py:373-388).
    Spark doesn't need them (it lists + reads footers itself); they're
    for ecosystem compatibility with pyarrow/dask-style readers."""
    import pyarrow.parquet as pq

    files = sorted(glob.glob(f"{catalog_root}/**/*.parquet", recursive=True))
    if not files:
        raise FileNotFoundError(f"no parquet files under {catalog_root}")
    schema = pq.ParquetFile(files[0]).schema_arrow
    metas = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        md.set_file_path(os.path.relpath(f, catalog_root))
        metas.append(md)
    pq.write_metadata(schema, f"{catalog_root}/_common_metadata")
    pq.write_metadata(schema, f"{catalog_root}/_metadata", metadata_collector=metas)


def write_sky_map(hist_pdf: pd.DataFrame, path: str, fmt: str = "parquet") -> None:
    """Persist a sky histogram (pix, count).  Parquet by default;
    ``fmt='fits'`` writes a BINTABLE via the pure-NumPy codec for
    compatibility with the reference's FITS maps (S12,
    lsd2_io.py:163-194)."""
    if fmt == "parquet":
        hist_pdf.to_parquet(path)
    elif fmt == "fits":
        from lsd2_spark.sources.fits import write_fits_table

        write_fits_table(hist_pdf, path)
    else:
        raise ValueError(f"unknown sky map format {fmt}")


def to_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Result sink (reference S13, README.md:227-233) — kept as an
    explicit API for parity; it is exactly ``df.write.parquet``."""
    df.write.mode(mode).parquet(path)
