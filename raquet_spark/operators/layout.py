"""Band layout conversion: sequential (one column per band) <->
interleaved (single BIP ``pixels`` column), per spec
/root/reference/format-specs/raquet.md:40-57 and :265-268.

Lossy JPEG/WebP codecs for the interleaved layout require an image
library (PIL) that is not present in this container — the codec hook is
stubbed with NotImplementedError while all Spark-side plumbing (schema,
metadata, batching) is real and tested with gzip/none compression.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from raquet_spark.functions.bands import decode_block, encode_block

LOSSY = ("jpeg", "webp")


def _check_compression(compression: str | None, band_types: list[str]) -> None:
    if compression in LOSSY:
        if any(t != "uint8" for t in band_types):
            raise ValueError(f"{compression} requires uint8 bands (spec raquet.md:274)")
        raise NotImplementedError(
            f"{compression} codec needs PIL, not available in this container; "
            "use 'gzip' or None"
        )


def to_interleaved(df: DataFrame, metadata: dict, compression: str | None = "gzip") -> tuple[DataFrame, dict]:
    """Sequential band columns -> single BIP ``pixels`` column."""
    from raquet_spark.session import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    bands = [(b["name"], b["type"]) for b in metadata["bands"]]
    _check_compression(compression, [t for _, t in bands])
    btype = bands[0][1]
    if any(t != btype for _, t in bands):
        raise ValueError("interleaved layout requires uniform band type")

    def conv(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels = []
            for _, row in pdf.iterrows():
                arrs = [decode_block(row[name], t) for name, t in bands]
                # BIP: [b1_0, b2_0, ..., b1_1, b2_1, ...]
                inter = np.stack(arrs, axis=1).reshape(-1)
                pixels.append(encode_block(inter, btype, compression))
            yield pd.DataFrame({"block": pdf["block"], "pixels": pixels})

    out = df.mapInPandas(conv, schema="block bigint, pixels binary")
    meta = dict(metadata, band_layout="interleaved", compression=compression)
    return out, meta


def to_sequential(df: DataFrame, metadata: dict, compression: str | None = "gzip") -> tuple[DataFrame, dict]:
    """Interleaved ``pixels`` column -> one column per band."""
    from raquet_spark.session import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    if metadata.get("compression") in LOSSY:
        raise NotImplementedError("lossy decode needs PIL; see module docstring")
    bands = [(b["name"], b["type"]) for b in metadata["bands"]]
    btype = bands[0][1]
    n = len(bands)

    def conv(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {name: [] for name, _ in bands}
            for _, row in pdf.iterrows():
                inter = decode_block(row["pixels"], btype).reshape(-1, n)
                for i, (name, _) in enumerate(bands):
                    cols[name].append(encode_block(inter[:, i], btype, compression))
            out = {"block": pdf["block"]}
            out.update(cols)
            yield pd.DataFrame(out)

    schema = "block bigint, " + ", ".join(f"{name} binary" for name, _ in bands)
    out = df.mapInPandas(conv, schema=schema)
    meta = dict(metadata, band_layout="sequential", compression=compression)
    return out, meta
