"""Band pixel codecs: RaQuet binary blobs <-> numeric arrays.

Per the spec (/root/reference/format-specs/raquet.md:40-57), band data is
a little-endian, row-major packed binary array, optionally gzip
compressed, one blob per tile per band. This is the one place the engine
drops to Python: decode/encode are Arrow-batched Pandas UDFs (vectorized
numpy per tile, never per pixel, never row-at-a-time serde).

Everything downstream of decode (stats, algebra, histograms) operates on
Spark ``array<double>`` columns with built-in higher-order functions, or
on numpy inside ``applyInPandas`` for mosaic-shaped work.
"""

from __future__ import annotations

import gzip
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, DoubleType

# Spec band types (format-specs/raquet.md:337) -> numpy little-endian dtypes
DTYPES = {
    "uint8": "<u1",
    "int8": "<i1",
    "uint16": "<u2",
    "int16": "<i2",
    "uint32": "<u4",
    "int32": "<i4",
    "uint64": "<u8",
    "int64": "<i8",
    "float16": "<f2",
    "float32": "<f4",
    "float64": "<f8",
}

_GZIP_MAGIC = b"\x1f\x8b"


def _maybe_decompress(buf: bytes) -> bytes:
    if buf[:2] == _GZIP_MAGIC:
        return gzip.decompress(buf)
    return buf


def decode_block(buf: bytes, band_type: str) -> np.ndarray:
    """Decode one blob to a 1-D numpy array (row-major pixel values)."""
    return np.frombuffer(_maybe_decompress(bytes(buf)), dtype=DTYPES[band_type])


def encode_block(values: np.ndarray, band_type: str, compression: str | None = "gzip") -> bytes:
    """Encode a numpy array to a RaQuet blob (little-endian + optional gzip)."""
    raw = np.ascontiguousarray(values, dtype=DTYPES[band_type]).tobytes()
    if compression == "gzip":
        # zlib with gzip container, fixed mtime-free header for determinism
        co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
        return co.compress(raw) + co.flush()
    if compression in (None, "none"):
        return raw
    raise NotImplementedError(
        f"compression {compression!r} requires an image codec (PIL) not present "
        "in this container; plumbing is in operators/layout.py"
    )


def band_decode(col: str | Column, band_type: str) -> Column:
    """Column: binary blob -> array<double> of pixel values.

    The UDF is pure but marked nondeterministic: ``explode`` over the
    decoded array plants a ``size(..) > 0`` filter that the optimizer
    otherwise pushes below a SECOND evaluation of the UDF, gunzipping
    every tile twice (guide §4.4; two ArrowEvalPython nodes in the r17
    raster_histogram before-plan). Call sites that explode must
    project the array first (a Generate may not hold a
    nondeterministic child) — use :func:`band_pixels`."""

    @F.pandas_udf(ArrayType(DoubleType()))
    def _decode(s: pd.Series) -> pd.Series:
        return s.map(
            lambda b: None if b is None else decode_block(b, band_type).astype("f8")
        )

    return _decode.asNondeterministic()(F.col(col) if isinstance(col, str) else col)


def band_pixels(
    df, col: str, band_type: str, alias: str = "v", keep: tuple = ("block",)
):
    """``keep`` columns + one row per pixel value of ``col``, decoding
    each blob exactly once (Project the array, then explode the
    attribute — see :func:`band_decode`)."""
    return df.select(
        *keep, band_decode(col, band_type).alias("_vals")
    ).select(*keep, F.explode("_vals").alias(alias))


def band_encode(col: str | Column, band_type: str, compression: str | None = "gzip") -> Column:
    """Column: array<double> -> binary RaQuet blob."""

    @F.pandas_udf(BinaryType())
    def _encode(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None if v is None else encode_block(np.asarray(v), band_type, compression)
        )

    return _encode(F.col(col) if isinstance(col, str) else col)
