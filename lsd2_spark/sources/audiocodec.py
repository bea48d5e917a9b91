"""Pure-NumPy WAV (RIFF PCM) codec — the audio twin of
:mod:`lsd2_spark.sources.imagecodec`.

Scope: canonical RIFF/WAVE files with an uncompressed PCM ``fmt ``
chunk, 8-bit unsigned or 16-bit signed little-endian samples, any
channel count.  That is the universal interchange subset; compressed
codecs (mp3/aac/flac) are out of scope for this environment and fall
back to byte-level features in the pipeline.

Decoded samples are returned as float64 in [-1, 1) with shape
(n_frames, n_channels), the conventional DSP layout.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_wav", "encode_wav"]


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV payload → (samples, sample_rate).

    ``samples`` is float64 in [-1, 1), shape (n_frames, n_channels):
    8-bit PCM is unsigned (offset 128), 16-bit is signed LE, per the
    public RIFF/WAVE spec.

    Raises ValueError for EVERY malformed payload (truncated chunks,
    zero channels, short buffers...), never struct.error/ZeroDivision —
    a single fallback trigger, mirroring
    :func:`lsd2_spark.sources.imagecodec.decode_image`.
    """
    try:
        return _decode_wav_impl(data)
    except ValueError:
        raise
    except Exception as e:  # truncated chunk, short buffer, bad header...
        raise ValueError(f"malformed WAV payload: {e}") from e


def _decode_wav_impl(data: bytes) -> tuple[np.ndarray, int]:
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated WAV fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1:
        raise ValueError(f"unsupported WAV format code {audio_format} (PCM only)")
    if n_channels < 1:
        raise ValueError("WAV channel count must be >= 1")
    if bits == 8:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif bits == 16:
        usable = len(raw) - (len(raw) % 2)
        samples = (
            np.frombuffer(raw[:usable], dtype="<i2").astype(np.float64) / 32768.0
        )
    else:
        raise ValueError(f"unsupported WAV bit depth {bits} (8/16 only)")
    n_frames = samples.size // n_channels
    return samples[: n_frames * n_channels].reshape(n_frames, n_channels), sample_rate


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16_000, bits: int = 16
) -> bytes:
    """Encode float samples in [-1, 1) (1-D mono or (frames, channels))
    as a canonical PCM WAV payload."""
    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 1:
        a = a[:, None]
    n_frames, n_channels = a.shape
    if bits == 8:
        pcm = np.clip(np.round(a * 128.0 + 128.0), 0, 255).astype(np.uint8).tobytes()
    elif bits == 16:
        pcm = (
            np.clip(np.round(a * 32768.0), -32768, 32767).astype("<i2").tobytes()
        )
    else:
        raise ValueError("bits must be 8 or 16")
    block_align = n_channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, sample_rate * block_align,
        block_align, bits,
    )
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks
