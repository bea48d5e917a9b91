"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Image decode is REAL for PNG and PPM/PGM payloads via the pure-NumPy
codec (:mod:`lsd2_spark.sources.imagecodec` — no PIL/opencv in this
container, so the public formats are decoded directly): the feature
kernel dispatches on magic bytes and computes statistics on decoded
PIXELS.  Payloads in other formats (JPEG etc. — codec out of scope)
fall back to deterministic byte-level features, so the operator is
total over arbitrary binary columns.

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

from lsd2_spark.functions.numeric import round6_np

__all__ = [
    "to_blob_table",
    "extract_features",
    "extract_audio_features",
    "decode_image",
    "resize_images",
    "sample_frames",
    "image_dhash",
    "image_neardup_pairs",
    "audio_fingerprint",
    "audio_neardup_pairs",
    "video_neardup_pairs",
]


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


def decode_image(payload: bytes) -> "np.ndarray":
    """Decode a PNG or PPM/PGM payload to a (h, w, channels) uint8
    pixel array (pure-NumPy codec — see sources/imagecodec.py).
    Raises ValueError on unsupported formats; ``extract_features``
    catches that and falls back to byte-level features."""
    from lsd2_spark.sources.imagecodec import decode_image as _decode

    return _decode(payload)


_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        # nullable: a NULL payload has NULL n_bytes (length(NULL)) and
        # must flow through, not crash the Arrow conversion
        StructField("n_bytes", IntegerType(), True),
        StructField("feat_mean", DoubleType(), False),
        StructField("feat_entropy", DoubleType(), False),
        StructField("sketch", StringType(), False),
    ]
)


def extract_features(blobs: DataFrame, decode: bool = True) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas``.

    When ``decode`` is on, payloads whose magic bytes identify a
    supported image format (PNG, PPM/PGM) are DECODED and the features
    (mean, Shannon entropy) are computed over the pixel samples; all
    other payloads get the same statistics over their raw bytes, so
    the operator is total.  ``sketch`` is always the md5 prefix of the
    payload bytes (content identity, not pixel identity)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from lsd2_spark.sources.imagecodec import decode_image as _decode

        for pdf in batches:
            payloads = pdf["payload"]
            n = len(pdf)
            mean = np.zeros(n)
            ent = np.zeros(n)
            sk = []
            for i, p in enumerate(payloads):
                b = np.frombuffer(p or b"", dtype=np.uint8)
                if decode and b.size:
                    try:
                        b = _decode(bytes(p)).ravel()
                    except ValueError:
                        pass  # unsupported format → byte-level features
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
                    # UNROUNDED: byte/pixel sums are exact integers and
                    # the division is a single IEEE op, so the double is
                    # bit-identical in any engine — rounding would ADD
                    # divergence (np.round is half-even, SQL ROUND is
                    # half-away; simple rationals land exactly on
                    # .5e-6 boundaries and snap differently)
                    "feat_mean": mean,
                    "feat_entropy": round6_np(ent),
                    "sketch": sk,
                }
            )

    from lsd2_spark.operators.common import spread_partitions

    return spread_partitions(
        blobs.select("media_id", "n_bytes", "payload")
    ).mapInPandas(kernel, _FEATURE_SCHEMA)


_AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_frames", LongType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("amp_mean", DoubleType(), True),
        StructField("amp_rms", DoubleType(), True),
        StructField("zcr", DoubleType(), True),
        StructField("spectral_centroid", DoubleType(), True),
    ]
)


def extract_audio_features(blobs: DataFrame) -> DataFrame:
    """Audio feature extraction over WAV payloads via ``mapInPandas``.

    Decodes RIFF/PCM WAV (pure-NumPy codec, sources/audiocodec.py) and
    computes per-payload signal statistics on the channel-averaged
    signal: frame count, mean amplitude, RMS, zero-crossing rate, and
    FFT spectral centroid (Hz).  Non-WAV payloads yield null features
    (the byte-level path is ``extract_features``) — the operator is
    total over arbitrary binary columns.

    At 100 TB this is the same embarrassingly parallel Arrow-batch
    shape as image feature extraction: no shuffle, no driver data.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from lsd2_spark.sources.audiocodec import decode_wav

        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "n_frames": pd.array([None] * len(pdf), dtype="Int64"),
                "sample_rate": pd.array([None] * len(pdf), dtype="Int32"),
                "amp_mean": np.full(len(pdf), np.nan),
                "amp_rms": np.full(len(pdf), np.nan),
                "zcr": np.full(len(pdf), np.nan),
                "spectral_centroid": np.full(len(pdf), np.nan),
            }
            for i, p in enumerate(pdf["payload"]):
                try:
                    samples, rate = decode_wav(bytes(p or b""))
                except ValueError:
                    continue
                sig = samples.mean(axis=1)
                n = sig.size
                out["n_frames"][i] = n
                out["sample_rate"][i] = rate
                if n == 0:
                    continue
                # UNROUNDED on purpose: PCM samples are exact binary
                # fractions (k/128 or k/32768), so every partial sum is
                # exactly representable and mean/rms are bit-identical
                # across engines — the q54 oracle replays them exactly
                # (rounding would ADD boundary divergence, not remove it)
                out["amp_mean"][i] = float(sig.mean())
                out["amp_rms"][i] = float(np.sqrt((sig**2).mean()))
                if n > 1:
                    pos = sig >= 0
                    out["zcr"][i] = float((pos[1:] != pos[:-1]).sum() / (n - 1))
                mag = np.abs(np.fft.rfft(sig))
                tot = mag.sum()
                if tot > 0:
                    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
                    out["spectral_centroid"][i] = float(
                        round6_np(float((freqs * mag).sum() / tot))
                    )
            yield pd.DataFrame(out)

    from lsd2_spark.operators.common import spread_partitions

    return spread_partitions(blobs.select("media_id", "payload")).mapInPandas(
        kernel, _AUDIO_SCHEMA
    )


_RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def resize_images(
    blobs: DataFrame, width: int, height: int, out_format: str = "png"
) -> DataFrame:
    """Thumbnail/resize stage: decode each supported image payload
    (PNG/PPM/PGM), nearest-neighbor resize to (width, height), and
    re-encode as ``out_format`` ('png' or 'ppm').  Undecodable payloads
    yield a null payload (the row is kept so downstream joins see every
    media_id).  Same embarrassingly parallel ``mapInPandas`` shape as
    feature extraction — no shuffle, no driver data."""
    assert out_format in ("png", "ppm")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from lsd2_spark.sources.imagecodec import (
            decode_image as _decode,
            encode_png,
            encode_ppm,
            resize_nearest,
        )

        enc = encode_png if out_format == "png" else encode_ppm
        for pdf in batches:
            out_payload: list[bytes | None] = []
            for p in pdf["payload"]:
                try:
                    small = resize_nearest(_decode(bytes(p or b"")), width, height)
                except ValueError:
                    out_payload.append(None)
                    continue
                out_payload.append(enc(small))
            ok = [p is not None for p in out_payload]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out_payload,
                    "width": pd.array(
                        [width if o else None for o in ok], dtype="Int32"
                    ),
                    "height": pd.array(
                        [height if o else None for o in ok], dtype="Int32"
                    ),
                }
            )

    from lsd2_spark.operators.common import spread_partitions

    return spread_partitions(blobs.select("media_id", "payload")).mapInPandas(
        kernel, _RESIZE_SCHEMA
    )


_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("frame_mean", DoubleType(), False),
        StructField("payload", BinaryType(), False),
    ]
)


def sample_frames(blobs: DataFrame, every_n: int = 1) -> DataFrame:
    """Video frame sampling over concatenated-PPM streams (the public
    ffmpeg ``image2pipe`` ppm-pipe format: complete P6/P5 files
    back-to-back).  Emits every ``every_n``-th frame as its own row
    with the frame re-encoded as a standalone PPM, plus the frame's
    pixel mean.  Row-exploding ``mapInPandas`` — one input payload can
    yield many frame rows, still shuffle-free.  Undecodable payloads
    yield no rows."""
    assert every_n >= 1

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from lsd2_spark.sources.imagecodec import decode_ppm_stream, encode_ppm

        for pdf in batches:
            ids, idxs, ws, hs, means, payloads = [], [], [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    frames = decode_ppm_stream(bytes(p or b""))
                except ValueError:
                    continue
                for fi in range(0, len(frames), every_n):
                    fr = frames[fi]
                    ids.append(mid)
                    idxs.append(fi)
                    hs.append(fr.shape[0])
                    ws.append(fr.shape[1])
                    means.append(float(fr.astype(np.float64).mean()))
                    payloads.append(encode_ppm(fr))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "width": ws,
                    "height": hs,
                    "frame_mean": means,
                    "payload": payloads,
                }
            )

    from lsd2_spark.operators.common import spread_partitions

    return spread_partitions(blobs.select("media_id", "payload")).mapInPandas(
        kernel, _FRAME_SCHEMA
    )


def image_dhash(blobs: DataFrame, hash_w: int = 8, hash_h: int = 8) -> DataFrame:
    """64-bit difference hash (dHash) per image payload: decode,
    grayscale, nearest-resize to (hash_w+1)×hash_h, then one bit per
    horizontal gradient sign — the standard perceptual fingerprint for
    image near-dup detection (small distortions flip few bits).

    Total over arbitrary payloads: undecodable blobs get a NULL hash
    (row kept).  One ``mapInPandas`` pass, shuffle-free."""

    if hash_w * hash_h > 64:
        raise ValueError(
            f"dHash geometry {hash_w}x{hash_h} exceeds the 64-bit hash"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from lsd2_spark.sources.imagecodec import decode_image as _decode
        from lsd2_spark.sources.imagecodec import resize_nearest

        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                try:
                    a = _decode(bytes(p or b""))
                except ValueError:
                    out.append(None)
                    continue
                if a.ndim == 3:
                    a = a.astype(np.float64).mean(axis=2)
                g = resize_nearest(a.astype(np.float64), hash_w + 1, hash_h)
                bits = (g[:, 1:] > g[:, :-1]).ravel()
                weights = 1 << np.arange(bits.size, dtype=np.uint64)
                v = np.uint64(bits.astype(np.uint64) @ weights)
                # reinterpret as signed so bit 63 survives the LongType cast
                out.append(int(v.astype(np.int64)))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "dhash": pd.Series(out, dtype="object")}
            )

    id_type = blobs.schema["media_id"].dataType.simpleString()
    return blobs.mapInPandas(kernel, f"media_id {id_type}, dhash long")


def image_neardup_pairs(
    blobs: DataFrame,
    max_hamming: int = 6,
    hash_w: int = 8,
    hash_h: int = 8,
) -> DataFrame:
    """Image near-duplicate pairs by dHash hamming distance ≤
    ``max_hamming`` — the pigeonhole-banded join from
    :func:`lsd2_spark.operators.dedup.hamming_neardup_pairs`, never
    all-pairs."""
    from lsd2_spark.operators.dedup import hamming_neardup_pairs

    return hamming_neardup_pairs(
        image_dhash(blobs, hash_w, hash_h),
        "media_id",
        "dhash",
        bits=hash_w * hash_h,
        max_hamming=max_hamming,
    )


def audio_fingerprint(
    blobs: DataFrame, n_frames: int = 9, n_bands: int = 9
) -> DataFrame:
    """64-bit spectral fingerprint per WAV payload (chromaprint-style):
    split the signal into ``n_frames`` windows, compute ``n_bands``
    FFT band energies per window, and emit one bit per
    frame-over-frame band-energy-difference sign —
    ``(n_frames-1) × (n_bands-1)`` bits (default 8×8 = 64).  Robust to
    gain changes (energy RATIOS drive the signs, and differences of
    differences cancel level shifts).

    Total over arbitrary payloads (undecodable → NULL hash); one
    shuffle-free ``mapInPandas`` pass, like :func:`image_dhash`."""

    if (n_frames - 1) * (n_bands - 1) > 64:
        raise ValueError(
            f"fingerprint geometry ({n_frames}-1)x({n_bands}-1) exceeds 64 bits"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from lsd2_spark.sources.audiocodec import decode_wav

        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                try:
                    samples, _sr = decode_wav(bytes(p or b""))
                except ValueError:
                    out.append(None)
                    continue
                mono = samples.mean(axis=1) if samples.ndim == 2 else samples
                if mono.size < n_frames * 2 * n_bands:
                    out.append(None)  # too short for a stable spectrum
                    continue
                frame_len = mono.size // n_frames
                frames = mono[: frame_len * n_frames].reshape(n_frames, frame_len)
                spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
                # log-ish band pooling over the positive spectrum
                edges = np.linspace(1, spec.shape[1], n_bands + 1).astype(int)
                e = np.stack(
                    [spec[:, a:b].sum(axis=1) for a, b in zip(edges[:-1], edges[1:])],
                    axis=1,
                )  # (n_frames, n_bands)
                # plain log (not log1p): a gain change scales every band
                # energy by the same factor, which becomes an additive
                # constant in log domain and cancels exactly in the band
                # difference — true gain invariance up to PCM quantization
                d = np.diff(np.log(e + 1e-12), axis=1)  # band gradients
                bits = (np.diff(d, axis=0) > 0).ravel()  # frame deltas
                weights = 1 << np.arange(bits.size, dtype=np.uint64)
                v = np.uint64(bits.astype(np.uint64) @ weights)
                out.append(int(v.astype(np.int64)))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "afp": pd.Series(out, dtype="object")}
            )

    return blobs.mapInPandas(kernel, "media_id long, afp long")


def audio_neardup_pairs(
    blobs: DataFrame,
    max_hamming: int = 6,
    n_frames: int = 9,
    n_bands: int = 9,
) -> DataFrame:
    """Audio near-duplicate pairs by fingerprint hamming distance —
    the same pigeonhole-banded join as the image path."""
    from lsd2_spark.operators.dedup import hamming_neardup_pairs

    return hamming_neardup_pairs(
        audio_fingerprint(blobs, n_frames, n_bands),
        "media_id",
        "afp",
        bits=(n_frames - 1) * (n_bands - 1),
        max_hamming=max_hamming,
    )


def video_neardup_pairs(
    blobs: DataFrame,
    every_n: int = 1,
    max_hamming: int = 6,
    min_shared_frames: int = 2,
) -> DataFrame:
    """Video near-duplicate pairs over concatenated-PPM streams:
    sample every ``every_n``-th frame, dHash each frame, find
    near-identical frame pairs across videos with the banded hamming
    join, and report video pairs sharing at least
    ``min_shared_frames`` distinct near-identical frames — the
    composition that makes re-encoded / brightness-shifted copies of
    the same footage collide while unrelated clips don't.

    Scale shape: frame explode + per-frame hash are shuffle-free; the
    only joins are the banded frame-hash equi-join and the final
    per-video-pair count — never all-pairs over videos OR frames.
    """
    from lsd2_spark.operators.dedup import hamming_neardup_pairs

    frames = sample_frames(blobs, every_n=every_n).select(
        "media_id", "frame_idx", "payload"
    )
    # per-frame hashes keyed by a (video, frame) STRUCT — no bit
    # packing, so no video-id or frame-count limit can corrupt identity
    # (struct ordering is lexicographic, which is all the banded join's
    # id1 < id2 tie-break needs)
    keyed = frames.select(
        F.struct(
            F.col("media_id").alias("vid"), F.col("frame_idx").alias("fidx")
        ).alias("media_id"),
        "payload",
    )
    fpairs = hamming_neardup_pairs(
        image_dhash(keyed), "media_id", "dhash", bits=64, max_hamming=max_hamming
    )
    v1, v2 = F.col("id1.vid"), F.col("id2.vid")
    return (
        fpairs.filter(v1 != v2)
        .select(
            F.least(v1, v2).alias("vid1"),
            F.greatest(v1, v2).alias("vid2"),
            "id1",
        )
        .groupBy("vid1", "vid2")
        .agg(F.count_distinct("id1").alias("n_shared_frames"))
        .filter(F.col("n_shared_frames") >= min_shared_frames)
    )
