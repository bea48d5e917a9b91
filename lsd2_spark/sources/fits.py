"""Minimal pure-NumPy FITS binary-table codec.

The reference reads FITS catalogs via astropy (S4, hipscat/
dask_utils.py:43-45) and writes HEALPix sky maps via healpy (S12,
hipscat/lsd2_io.py:163-194).  Neither library exists in this
environment, so this module implements the relevant slice of the
*public FITS 4.0 standard* directly: 2880-byte header blocks of
80-char ASCII cards, followed by big-endian BINTABLE payloads.

Supported: scalar numeric columns (L/B/I/J/K/E/D) and fixed-width
strings (rA) — the shapes astronomical catalogs use.  Vector columns
raise with a clear message.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

BLOCK = 2880
CARD = 80

_TFORM_DTYPES = {
    "L": ">i1",
    "B": ">u1",
    "I": ">i2",
    "J": ">i4",
    "K": ">i8",
    "E": ">f4",
    "D": ">f8",
}

_PANDAS_TO_TFORM = {
    "int16": ("I", ">i2"),
    "int32": ("J", ">i4"),
    "int64": ("K", ">i8"),
    "float32": ("E", ">f4"),
    "float64": ("D", ">f8"),
    "bool": ("L", ">i1"),
}


def _parse_header(buf: bytes, off: int) -> tuple[dict[str, str], int]:
    """One header unit starting at ``off`` → (cards, next offset)."""
    cards: dict[str, str] = {}
    pos = off
    while True:
        block = buf[pos : pos + BLOCK]
        if len(block) < BLOCK:
            raise ValueError("truncated FITS header")
        for i in range(0, BLOCK, CARD):
            card = block[i : i + CARD].decode("ascii", "replace")
            key = card[:8].strip()
            if key == "END":
                return cards, pos + BLOCK
            if "=" in card[8:10]:
                val = card[10:].split("/")[0].strip()
                if val.startswith("'"):
                    val = val[1:].split("'")[0].strip()
                cards[key] = val
        pos += BLOCK


def _data_size(cards: dict[str, str]) -> int:
    naxis = int(cards.get("NAXIS", "0"))
    if naxis == 0:
        return 0
    size = 1
    for i in range(1, naxis + 1):
        size *= int(cards[f"NAXIS{i}"])
    size *= abs(int(cards.get("BITPIX", "8"))) // 8
    return (size + BLOCK - 1) // BLOCK * BLOCK


def _find_bintable(buf: bytes) -> tuple[dict[str, str], int]:
    cards, off = _parse_header(buf, 0)
    off += _data_size(cards)
    while off < len(buf):
        cards, off = _parse_header(buf, off)
        if cards.get("XTENSION", "").startswith("BINTABLE"):
            return cards, off
        off += _data_size(cards)
    raise ValueError("no BINTABLE extension found")


def _np_dtype(cards: dict[str, str]) -> np.dtype:
    n = int(cards["TFIELDS"])
    fields = []
    for i in range(1, n + 1):
        name = cards.get(f"TTYPE{i}", f"col{i}").strip()
        tform = cards[f"TFORM{i}"].strip()
        repeat = int(tform[:-1]) if tform[:-1] else 1
        code = tform[-1]
        if code == "A":
            fields.append((name, f"S{repeat}"))
        elif code in _TFORM_DTYPES:
            if repeat != 1:
                raise ValueError(f"vector column {name} ({tform}) unsupported")
            fields.append((name, _TFORM_DTYPES[code]))
        else:
            raise ValueError(f"unsupported TFORM {tform} for column {name}")
    return np.dtype(fields)


def fits_table_to_pandas(buf: bytes) -> pd.DataFrame:
    """Decode the first BINTABLE extension into a pandas DataFrame."""
    cards, off = _find_bintable(buf)
    dt = _np_dtype(cards)
    nrows = int(cards["NAXIS2"])
    rec = np.frombuffer(buf, dtype=dt, count=nrows, offset=off)
    out = {}
    for name in dt.names:
        col = rec[name]
        if col.dtype.kind == "S":
            out[name] = pd.Series([v.decode("ascii", "replace").rstrip() for v in col])
        else:
            # native-endian copy for Arrow
            out[name] = pd.Series(col.astype(col.dtype.newbyteorder("=")))
    return pd.DataFrame(out)


def fits_schema(buf: bytes):
    """Spark StructType for the first BINTABLE (driver-side sniff)."""
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
        StructField,
        StructType,
    )

    cards, _ = _find_bintable(buf)
    dt = _np_dtype(cards)
    m = {
        "i1": BooleanType(),
        "u1": ShortType(),
        "i2": ShortType(),
        "i4": IntegerType(),
        "i8": LongType(),
        "f4": FloatType(),
        "f8": DoubleType(),
    }
    fields = []
    for name in dt.names:
        sub = dt[name]
        if sub.kind == "S":
            fields.append(StructField(name, StringType(), True))
        else:
            fields.append(StructField(name, m[f"{sub.kind}{sub.itemsize}"], True))
    return StructType(fields)


def _pad(b: bytes) -> bytes:
    return b + b"\x00" * ((BLOCK - len(b) % BLOCK) % BLOCK)


def _card(key: str, value: str, comment: str = "") -> bytes:
    if value.startswith("'"):
        body = f"{key:<8}= {value:<20}"
    else:
        body = f"{key:<8}= {value:>20}"
    if comment:
        body += f" / {comment}"
    return body[:CARD].ljust(CARD).encode("ascii")


def write_fits_table(pdf: pd.DataFrame, path: str) -> None:
    """Write a DataFrame as (primary HDU + one BINTABLE) — enough for
    sky-map persistence and roundtrip tests."""
    cols = []
    tforms = []
    for name in pdf.columns:
        s = pdf[name]
        if s.dtype == object or str(s.dtype).startswith("string"):
            width = max(1, int(s.astype(str).str.len().max() or 1))
            cols.append(np.array([x.encode("ascii", "replace") for x in s.astype(str)], dtype=f"S{width}"))
            tforms.append(f"{width}A")
        else:
            key = str(s.dtype)
            if key not in _PANDAS_TO_TFORM:
                raise ValueError(f"unsupported dtype {key} for column {name}")
            tf, be = _PANDAS_TO_TFORM[key]
            cols.append(s.to_numpy().astype(be))
            tforms.append(tf)
    rec = np.rec.fromarrays(cols, names=list(pdf.columns))

    primary = b"".join(
        [
            _card("SIMPLE", "T", "pure-numpy FITS writer"),
            _card("BITPIX", "8"),
            _card("NAXIS", "0"),
            _card("EXTEND", "T"),
            b"END".ljust(CARD),
        ]
    )
    header = [
        _card("XTENSION", "'BINTABLE'"),
        _card("BITPIX", "8"),
        _card("NAXIS", "2"),
        _card("NAXIS1", str(rec.dtype.itemsize)),
        _card("NAXIS2", str(len(rec))),
        _card("PCOUNT", "0"),
        _card("GCOUNT", "1"),
        _card("TFIELDS", str(len(pdf.columns))),
    ]
    for i, (name, tf) in enumerate(zip(pdf.columns, tforms), start=1):
        header.append(_card(f"TTYPE{i}", f"'{name}'"))
        header.append(_card(f"TFORM{i}", f"'{tf}'"))
    header.append(b"END".ljust(CARD))

    with open(path, "wb") as f:
        f.write(_pad(primary))
        f.write(_pad(b"".join(header)))
        f.write(_pad(rec.tobytes()))
