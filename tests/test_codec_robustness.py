"""Adversarial-payload robustness for the pure-NumPy codecs.

Contract: ``decode_image`` and ``decode_wav`` raise ValueError — and
ONLY ValueError — on every malformed payload, because the Spark-side
feature kernels (operators/multimodal.py) catch exactly ValueError to
fall back.  Any other exception type fails the whole Spark task, so a
single corrupt blob would kill a 100 TB job.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lsd2_spark.sources.audiocodec import decode_wav, encode_wav
from lsd2_spark.sources.imagecodec import (
    PNG_SIGNATURE,
    decode_image,
    decode_ppm_stream,
    encode_png,
    encode_ppm,
)


def _wav(fmt_body: bytes, data_body: bytes = b"\x00" * 8) -> bytes:
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + b"data" + struct.pack("<I", len(data_body)) + data_body
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


MALFORMED_WAVS = {
    # the ADVICE case: fmt chunk shorter than 16 bytes → struct.error
    # before the fix
    "truncated_fmt": _wav(struct.pack("<HH", 1, 1)),
    "empty_fmt": _wav(b""),
    "24_bit": _wav(struct.pack("<HHIIHH", 1, 1, 16000, 48000, 3, 24)),
    "zero_channels": _wav(struct.pack("<HHIIHH", 1, 0, 16000, 32000, 2, 16)),
    "non_pcm": _wav(struct.pack("<HHIIHH", 3, 1, 16000, 64000, 4, 32)),
    "no_data_chunk": b"RIFF" + struct.pack("<I", 20) + b"WAVE"
    + b"fmt " + struct.pack("<I", 16)
    + struct.pack("<HHIIHH", 1, 1, 16000, 16000, 1, 8),
    "bare_riff": b"RIFF",
    "riff_no_wave": b"RIFF\x10\x00\x00\x00JUNK" + b"\x00" * 16,
    "chunk_size_past_end": b"RIFF" + struct.pack("<I", 100) + b"WAVE"
    + b"fmt " + struct.pack("<I", 0xFFFFFF) + b"\x00" * 4,
    "empty": b"",
}


@pytest.mark.parametrize("name", sorted(MALFORMED_WAVS))
def test_malformed_wav_raises_valueerror_only(name):
    with pytest.raises(ValueError):
        decode_wav(MALFORMED_WAVS[name])


def _png_with_patched_ihdr(offset_in_ihdr: int, value: int) -> bytes:
    png = bytearray(encode_png(np.zeros((4, 4, 3), dtype=np.uint8)))
    # layout: 8 sig + 4 len + 4 type + 13 IHDR body
    png[16 + offset_in_ihdr] = value
    return bytes(png)


MALFORMED_IMAGES = {
    "interlaced_png": _png_with_patched_ihdr(12, 1),  # interlace flag
    "png_16bit": _png_with_patched_ihdr(8, 16),  # bit depth
    "png_bad_color_type": _png_with_patched_ihdr(9, 7),
    "png_truncated_ihdr": PNG_SIGNATURE + struct.pack(">I", 13) + b"IHDR" + b"\x00" * 4,
    "png_sig_only": PNG_SIGNATURE,
    "png_bad_zlib": PNG_SIGNATURE
    + struct.pack(">I", 13) + b"IHDR" + struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    + b"\x00" * 4
    + struct.pack(">I", 5) + b"IDAT" + b"junk!" + b"\x00" * 4
    + struct.pack(">I", 0) + b"IEND" + b"\x00" * 4,
    "png_idat_size_mismatch": PNG_SIGNATURE
    + struct.pack(">I", 13) + b"IHDR" + struct.pack(">IIBBBBB", 9, 9, 8, 2, 0, 0, 0)
    + b"\x00" * 4
    + struct.pack(">I", 11) + b"IDAT" + zlib.compress(b"\x00" * 3) + b"\x00" * 4
    + struct.pack(">I", 0) + b"IEND" + b"\x00" * 4,
    "ppm_header_only": b"P6",
    "ppm_truncated_fields": b"P6\n12 34",
    "ppm_comment_to_eof": b"P6\n#never ends",
    "ppm_negative_dims": b"P6\n-2 -2\n255\n" + b"\x00" * 12,
    "ppm_huge_dims": b"P6\n999999 999999\n255\n" + b"\x00" * 10,
    "ppm_16bit": b"P6\n2 2\n65535\n" + b"\x00" * 24,
    "ppm_short_pixels": b"P6\n4 4\n255\n" + b"\x00" * 5,
    "ppm_nonnumeric_field": b"P6\nab cd\n255\n" + b"\x00" * 12,
    "text": b"hello world, definitely not an image",
    "empty": b"",
}


@pytest.mark.parametrize("name", sorted(MALFORMED_IMAGES))
def test_malformed_image_raises_valueerror_only(name):
    with pytest.raises(ValueError):
        decode_image(MALFORMED_IMAGES[name])


@pytest.mark.parametrize(
    "payload",
    [b"P6\n0 0\n255\n" + b"junk", b"P6\n2 2\n255\n" + b"\x00" * 11],
    ids=["zero_dims_then_junk", "stream_with_torn_tail"],
)
def test_malformed_ppm_stream_terminates_with_valueerror(payload):
    with pytest.raises(ValueError):
        decode_ppm_stream(payload)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=256))
def test_decoders_total_on_random_bytes(payload):
    for dec in (decode_image, decode_wav):
        try:
            dec(payload)
        except ValueError:
            pass  # the one allowed failure mode


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=128))
def test_decoders_total_on_magic_prefixed_junk(junk):
    """Payloads that pass the magic-byte sniff but are garbage after —
    the case that reaches deep into each parser."""
    for prefix in (PNG_SIGNATURE, b"P6", b"P5", b"RIFF\x24\x00\x00\x00WAVE"):
        for dec in (decode_image, decode_wav):
            try:
                dec(prefix + junk)
            except ValueError:
                pass


def test_feature_extractors_total_over_adversarial_blob_table(spark):
    """One corrupt payload must never fail the Spark job: every feature
    kernel falls back (byte-level features / null row) instead."""
    from lsd2_spark.operators.multimodal import (
        extract_audio_features,
        extract_features,
        resize_images,
        sample_frames,
        to_blob_table,
    )

    payloads = (
        list(MALFORMED_WAVS.values())
        + list(MALFORMED_IMAGES.values())
        + [
            None,
            encode_png(np.arange(48, dtype=np.uint8).reshape(4, 4, 3)),
            encode_ppm(np.arange(48, dtype=np.uint8).reshape(4, 4, 3)),
            encode_wav(np.linspace(-0.5, 0.5, 64), 16_000, bits=16),
        ]
    )
    pdf = pd.DataFrame(
        {
            "media_id": np.arange(len(payloads), dtype=np.int64),
            "payload": payloads,
        }
    )
    blobs = to_blob_table(
        spark.createDataFrame(pdf), payload_col="payload",
        id_col="media_id", media_type="mixed",
    )

    feats = extract_features(blobs).toPandas()
    assert len(feats) == len(payloads)

    audio = extract_audio_features(blobs).toPandas()
    assert len(audio) == len(payloads)
    decoded = audio[audio["n_frames"].notna() & (audio["n_frames"] > 0)]
    assert len(decoded) == 1  # exactly the one valid WAV

    thumbs = resize_images(blobs, width=2, height=2).toPandas()
    # only the two valid images produce thumbnails
    assert thumbs["payload"].notna().sum() == 2

    frames = sample_frames(blobs, every_n=1).toPandas()
    # the valid single-frame PPM payload yields exactly one frame row
    assert len(frames) == 1
