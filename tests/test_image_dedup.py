"""Image perceptual-hash dedup: dHash stability under small
distortions, banded near-dup pair recovery, totality over junk."""

from __future__ import annotations

import numpy as np

from lsd2_spark.sources.imagecodec import encode_ppm


def _img(seed: int, h: int = 32, w: int = 32) -> np.ndarray:
    rng = np.random.default_rng(seed)
    # block-structured random content: distinct seeds give uncorrelated
    # gradient signs (a plain ramp would hash to all-ones)
    img = rng.integers(30, 225, (h, w, 3))
    return img.astype(np.uint8)


def _blobs(spark, items):
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )

    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in items],
        StructType(
            [
                StructField("media_id", LongType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )


def test_dhash_identical_and_perturbed(spark):
    from lsd2_spark.operators.multimodal import image_dhash

    a = _img(1)
    bright = np.clip(a.astype(np.int16) + 8, 0, 255).astype(np.uint8)  # global shift
    other = _img(99)
    df = _blobs(
        spark,
        [
            (1, encode_ppm(a)),
            (2, encode_ppm(a)),        # exact duplicate
            (3, encode_ppm(bright)),   # brightness shift: gradients preserved
            (4, encode_ppm(other)),    # unrelated
            (5, b"not an image"),      # junk -> NULL hash, row kept
        ],
    )
    got = {r["media_id"]: r["dhash"] for r in image_dhash(df).collect()}
    assert got[1] == got[2]
    assert got[5] is None

    def ham(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    assert ham(got[1], got[3]) <= 6          # perturbed copy stays close
    assert ham(got[1], got[4]) > 10          # unrelated is far


def test_image_neardup_pairs_banded(spark):
    from lsd2_spark.operators.multimodal import image_neardup_pairs

    a = _img(2)
    bright = np.clip(a.astype(np.int16) + 8, 0, 255).astype(np.uint8)
    df = _blobs(
        spark,
        [
            (1, encode_ppm(a)),
            (2, encode_ppm(a)),
            (3, encode_ppm(bright)),
            (4, encode_ppm(_img(123))),
            (5, encode_ppm(_img(456))),
        ],
    )
    pairs = {
        (r["id1"], r["id2"]): r["hamming"]
        for r in image_neardup_pairs(df, max_hamming=6).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 6
    assert (1, 4) not in pairs and (1, 5) not in pairs

    # pigeonhole guarantee: every reported pair's hamming is within budget
    assert all(v <= 6 for v in pairs.values())


def test_image_neardup_never_all_pairs(spark):
    """The candidate join must be a banded equi-join, not a cartesian
    product."""
    from lsd2_spark.operators.multimodal import image_neardup_pairs

    df = _blobs(spark, [(i, encode_ppm(_img(i))) for i in range(6)])
    plan = (
        image_neardup_pairs(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_audio_fingerprint_gain_invariant_and_discriminative(spark):
    from lsd2_spark.operators.multimodal import audio_fingerprint
    from lsd2_spark.sources.audiocodec import encode_wav

    rng = np.random.default_rng(3)
    noise = rng.normal(0, 0.2, 4000)
    sweep = np.sin(2 * np.pi * np.cumsum(np.linspace(50, 900, 4000)) / 8000)
    df = _blobs(
        spark,
        [
            (1, encode_wav(sweep, 8000)),
            (2, encode_wav(sweep, 8000)),            # exact duplicate
            (3, encode_wav(0.5 * sweep, 8000)),      # gain change
            (4, encode_wav(noise, 8000)),            # unrelated
            (5, b"not audio"),                        # junk -> NULL
        ],
    )
    got = {r["media_id"]: r["afp"] for r in audio_fingerprint(df).collect()}
    assert got[1] == got[2]
    assert got[5] is None

    def ham(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    assert ham(got[1], got[3]) <= 8    # gain shift barely moves the signs
    assert ham(got[1], got[4]) > 12    # noise is far from the sweep


def test_audio_neardup_pairs(spark):
    from lsd2_spark.operators.multimodal import audio_neardup_pairs
    from lsd2_spark.sources.audiocodec import encode_wav

    rng = np.random.default_rng(4)
    sweep = np.sin(2 * np.pi * np.cumsum(np.linspace(80, 1200, 4000)) / 8000)
    df = _blobs(
        spark,
        [
            (1, encode_wav(sweep, 8000)),
            (2, encode_wav(0.6 * sweep, 8000)),
            (3, encode_wav(rng.normal(0, 0.2, 4000), 8000)),
        ],
    )
    pairs = {
        (r["id1"], r["id2"]): r["hamming"]
        for r in audio_neardup_pairs(df, max_hamming=8).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 8
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_video_neardup_pairs(spark):
    """Two videos sharing brightness-shifted copies of the same frames
    must pair; an unrelated clip must not."""
    from lsd2_spark.operators.multimodal import video_neardup_pairs

    def stream(frames):
        return b"".join(encode_ppm(f) for f in frames)

    base = [_img(s) for s in (10, 11, 12, 13)]
    shifted = [
        np.clip(f.astype(np.int16) + 8, 0, 255).astype(np.uint8) for f in base
    ]
    other = [_img(s) for s in (90, 91, 92, 93)]
    df = _blobs(
        spark,
        [(1, stream(base)), (2, stream(shifted)), (3, stream(other))],
    )
    pairs = {
        (r["vid1"], r["vid2"]): r["n_shared_frames"]
        for r in video_neardup_pairs(df, min_shared_frames=2).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 3
    assert (1, 3) not in pairs and (2, 3) not in pairs
