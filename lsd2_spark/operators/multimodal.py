"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode/feature-extract stage is STUBBED (no image/audio libraries
in this container — marked clearly below); everything Spark-side is
real: binary schema, Arrow batch shape through ``mapInPandas``,
partition-preserving transforms, and deterministic fake features so
the plumbing is testable end-to-end.

At 100 TB: binary payloads ride the normal columnar path (Parquet
BYTE_ARRAY); feature extraction is an embarrassingly parallel
``mapInPandas`` over Arrow batches; metadata-only queries never touch
payload bytes thanks to Parquet column pruning.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["to_blob_table", "extract_features", "decode_image_stub"]


def to_blob_table(df: DataFrame, payload_col: str, id_col: str, media_type: str) -> DataFrame:
    """Wrap a column as an opaque binary payload with typed metadata."""
    blob = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).alias("media_id"),
        blob.alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.length(blob).alias("n_bytes"),
        F.md5(blob).alias("payload_md5"),
    )


def decode_image_stub(payload: bytes) -> "np.ndarray":
    """STUB — image decoding requires a codec library not present in
    this environment.  Raises by design; ``extract_features`` uses the
    deterministic fake featurizer instead."""
    raise NotImplementedError(
        "image decode requires an image codec (PIL/opencv) — not available; "
        "wire a real decoder here when the library is present"
    )


_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("feat_mean", DoubleType(), False),
        StructField("feat_entropy", DoubleType(), False),
        StructField("sketch", StringType(), False),
    ]
)


def extract_features(blobs: DataFrame) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas``.

    The per-batch kernel is where a real decoder would run (frame
    sampling, resize, spectrogram...).  Here it computes deterministic
    byte-level features — REAL plumbing, FAKE decode (see
    ``decode_image_stub``)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n = len(pdf)
            mean = np.zeros(n)
            ent = np.zeros(n)
            sk = []
            for i, p in enumerate(payloads):
                b = np.frombuffer(p or b"", dtype=np.uint8)
                if b.size:
                    mean[i] = float(b.mean())
                    cnt = np.bincount(b, minlength=256) / b.size
                    nz = cnt[cnt > 0]
                    ent[i] = float(-(nz * np.log2(nz)).sum())
                sk.append(hashlib.md5(p or b"").hexdigest()[:16])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["n_bytes"],
                    "feat_mean": np.round(mean, 6),
                    "feat_entropy": np.round(ent, 6),
                    "sketch": sk,
                }
            )

    return blobs.select("media_id", "n_bytes", "payload").mapInPandas(
        kernel, _FEATURE_SCHEMA
    )
