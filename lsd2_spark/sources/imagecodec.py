"""Pure-NumPy image codecs (PNG + PPM/PGM) — no PIL/opencv in this
environment, so the public formats are decoded directly, in the same
spirit as the pure-NumPy FITS codec (:mod:`lsd2_spark.sources.fits`).

Scope: 8-bit PNG (color types 0 gray, 2 RGB, 4 gray+alpha, 6 RGBA),
non-interlaced, all five PNG row filters; binary PPM (P6) and PGM (P5)
with maxval ≤ 255.  That covers the multimodal pipeline's decode stage
(:mod:`lsd2_spark.operators.multimodal`): the per-batch kernel calls
:func:`decode_image` and computes features on REAL pixels; payloads in
formats outside this scope fall back to byte-level features.

At 100 TB the decode runs inside ``mapInPandas`` Arrow batches —
embarrassingly parallel, no driver involvement.  The row-defilter loop
is per-scanline NumPy (vectorized across the row for filters 0-2;
per-byte only for Average/Paeth, which our own encoder never emits).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "PNG_SIGNATURE",
    "decode_image",
    "decode_png",
    "decode_ppm",
    "decode_ppm_stream",
    "encode_png",
    "encode_ppm",
    "resize_nearest",
]

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to a (h, w, channels) uint8
    array.  Implements the public PNG spec: chunk stream → zlib inflate
    → per-scanline defilter (None/Sub/Up/Average/Paeth)."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth} (8 only)")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.size != height * (stride + 1):
        raise ValueError("PNG IDAT size mismatch")
    raw = raw.reshape(height, stride + 1)
    filters = raw[:, 0]
    rows = raw[:, 1:].astype(np.int32)
    recon = np.zeros((height, stride), dtype=np.int32)
    for y in range(height):
        f = int(filters[y])
        row = rows[y]
        prev = recon[y - 1] if y else np.zeros(stride, dtype=np.int32)
        if f == 0:  # None
            recon[y] = row
        elif f == 1:  # Sub — prefix sum per byte-lane mod bpp
            r = row.copy()
            for j in range(ch):
                r[j::ch] = np.cumsum(r[j::ch]) & 0xFF
            recon[y] = r
        elif f == 2:  # Up
            recon[y] = (row + prev) & 0xFF
        elif f == 3:  # Average — sequential in x
            r = recon[y]
            for i in range(stride):
                left = r[i - ch] if i >= ch else 0
                r[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth — sequential in x
            r = recon[y]
            for i in range(stride):
                a = r[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                r[i] = (row[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
    return recon.astype(np.uint8).reshape(height, width, ch)


def encode_png(arr: np.ndarray, compress_level: int = 6) -> bytes:
    """Encode a (h, w) or (h, w, channels) uint8 array as a PNG
    (filter 0 on every scanline — simple and deterministic)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    scan = np.zeros((h, w * ch + 1), dtype=np.uint8)
    scan[:, 1:] = a.reshape(h, w * ch)
    idat = zlib.compress(scan.tobytes(), compress_level)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _decode_ppm_at(data: bytes, pos: int) -> tuple[np.ndarray, int]:
    """Decode one binary PPM/PGM frame starting at ``pos``; returns
    (pixels, end_offset).  The end offset is exact, which is what makes
    CONCATENATED frames parseable (see :func:`decode_ppm_stream`)."""
    if data[pos : pos + 2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM")
    ch = 3 if data[pos : pos + 2] == b"P6" else 1
    pos += 2
    fields: list[int] = []
    while len(fields) < 3:
        # skip whitespace and comments
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    n = w * h * ch
    pix = np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
    return pix.reshape(h, w, ch).copy(), pos + n


def decode_ppm(data: bytes) -> np.ndarray:
    """Decode binary PPM (P6 → (h, w, 3)) or PGM (P5 → (h, w, 1)),
    maxval ≤ 255.  Header: magic, whitespace/comment-separated width,
    height, maxval, one whitespace byte, then raw samples."""
    arr, _end = _decode_ppm_at(data, 0)
    return arr


def decode_ppm_stream(data: bytes) -> list[np.ndarray]:
    """Decode a CONCATENATED sequence of binary PPM/PGM frames — the
    public ffmpeg ``image2pipe``/ppm-pipe interchange format (each
    frame is a complete P6/P5 file; frames are simply back-to-back).
    This is the engine's raw-video container: frame extraction with no
    compressed codec in scope."""
    frames: list[np.ndarray] = []
    pos = 0
    while pos < len(data):
        arr, pos = _decode_ppm_at(data, pos)
        frames.append(arr)
    if not frames:
        raise ValueError("empty PPM stream")
    return frames


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 as binary P6 (or (h, w)/(h, w, 1) as
    P5) — the uncompressed, byte-exact interchange form."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if ch == 3:
        magic = b"P6"
    elif ch == 1:
        magic = b"P5"
    else:
        raise ValueError("PPM/PGM requires 1 or 3 channels")
    return magic + f"\n{w} {h}\n255\n".encode("ascii") + a.tobytes()


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize with the floor mapping
    ``src = floor(dst * src_size / dst_size)`` — deterministic, pure
    indexing, and exactly replayable in SQL for the thumbnail oracle."""
    a = np.asarray(arr)
    h, w = a.shape[:2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return a[rows][:, cols]


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes; raises ValueError both for formats
    outside the supported set AND for malformed payloads that merely
    share a magic prefix (e.g. text starting with "P6 ..."), so callers
    have a single fallback trigger."""
    try:
        if payload[:8] == PNG_SIGNATURE:
            return decode_png(payload)
        if payload[:2] in (b"P6", b"P5"):
            return decode_ppm(payload)
    except ValueError:
        raise
    except Exception as e:  # truncated stream, bad zlib, short buffer...
        raise ValueError(f"malformed image payload: {e}") from e
    raise ValueError("unsupported image format")
