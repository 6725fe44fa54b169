"""Raster algebra: per-pixel map operations over band blobs.

The reference applies scale/offset at read time (DN → physical:
``physical = DN * scale + offset``, format-specs/raquet.md:344-345) and
leaves band math to the warehouse. Here both are first-class operators:
an arbitrary numpy expression over one or more bands of the same tile,
vectorized per tile inside one Arrow batch pass. Used for NDVI-style
two-band indices, clipping, and DN→physical conversion.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raquet_spark.core.metadata import parse_nodata
from raquet_spark.functions.bands import decode_block, encode_block


def map_bands(
    df: DataFrame,
    metadata: dict,
    fn: Callable[[dict[str, np.ndarray]], np.ndarray],
    out_band: str = "band_out",
    out_type: str = "float64",
    out_nodata: float | None = None,
    keep_bands: bool = False,
) -> DataFrame:
    """Apply ``fn({band_name: values}) -> values`` per tile.

    nodata pixels of any input band propagate to ``out_nodata`` (or NaN
    for float outputs when unset). Output is an encoded RaQuet blob
    column, so results compose with every other operator (stats,
    pyramid, write).
    """
    from raquet_spark.session import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    bands = [(b["name"], b["type"], parse_nodata(b.get("nodata"))) for b in metadata["bands"]]
    compression = metadata.get("compression", "gzip")
    fill = out_nodata if out_nodata is not None else np.nan

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_col = []
            for row in pdf.to_dict("records"):
                arrs: dict[str, np.ndarray] = {}
                bad = None
                for name, btype, nodata in bands:
                    v = decode_block(row[name], btype).astype("f8")
                    mask = ~np.isfinite(v)
                    if nodata is not None and not (
                        isinstance(nodata, float) and np.isnan(nodata)
                    ):
                        mask |= v == nodata
                    bad = mask if bad is None else (bad | mask)
                    arrs[name] = v
                res = fn(arrs).astype("f8")
                if bad is not None and bad.any():
                    res = np.where(bad, fill, res)
                out_col.append(encode_block(res, out_type, compression))
            cols = {"block": pdf["block"]}
            if keep_bands:
                for name, _, _ in bands:
                    cols[name] = pdf[name]
            cols[out_band] = out_col
            yield pd.DataFrame(cols)

    fields = ["block bigint"]
    if keep_bands:
        fields += [f"{name} binary" for name, _, _ in bands]
    fields.append(f"{out_band} binary")
    return df.mapInPandas(compute, schema=", ".join(fields))


def join_rasters(
    a: DataFrame,
    b: DataFrame,
    metadata_a: dict,
    metadata_b: dict,
    fn: Callable[[dict[str, np.ndarray]], np.ndarray],
    band_a: str = "band_1",
    band_b: str = "band_1",
    out_band: str = "band_out",
    out_type: str = "float64",
) -> DataFrame:
    """Cross-dataset raster algebra: equi-join two RaQuet tables on
    ``block`` and apply ``fn`` to the co-located tile pair — the
    warehouse join the RaQuet layout exists for (e.g. slope × landcover
    suitability). Both sides share the quadbin key, so with the
    partitioned/bucketed layout the join is co-located (zero or one
    shuffle); decode happens once per matched tile inside an Arrow pass.
    ``fn`` receives {"a": pixels_a, "b": pixels_b}."""
    from collections.abc import Iterator as _Iter

    from raquet_spark.session import ensure_package_shipped

    ensure_package_shipped(a.sparkSession)
    ta = next(x["type"] for x in metadata_a["bands"] if x["name"] == band_a)
    tb = next(x["type"] for x in metadata_b["bands"] if x["name"] == band_b)

    joined = (
        a.select("block", F.col(band_a).alias("_ba"))
        .join(b.select("block", F.col(band_b).alias("_bb")), "block")
    )

    def compute(batches: _Iter[pd.DataFrame]) -> _Iter[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for ba, bb in zip(pdf["_ba"], pdf["_bb"]):
                va = decode_block(ba, ta).astype("f8")
                vb = decode_block(bb, tb).astype("f8")
                blobs.append(encode_block(fn({"a": va, "b": vb}), out_type, "gzip"))
            yield pd.DataFrame({"block": pdf["block"], out_band: blobs})

    return joined.mapInPandas(compute, schema=f"block bigint, {out_band} binary")


def apply_scale_offset(df: DataFrame, metadata: dict, band: str) -> DataFrame:
    """DN → physical values for one band using metadata scale/offset."""
    bm = next(b for b in metadata["bands"] if b["name"] == band)
    scale = bm.get("scale") or 1.0
    offset = bm.get("offset") or 0.0
    meta_one = dict(metadata, bands=[bm])
    return map_bands(
        df.select("block", band), meta_one,
        lambda a: a[band] * scale + offset,
        out_band=f"{band}_physical",
    )


def clip_values(df: DataFrame, metadata: dict, band: str, lo: float, hi: float) -> DataFrame:
    bm = next(b for b in metadata["bands"] if b["name"] == band)
    meta_one = dict(metadata, bands=[bm])
    return map_bands(
        df.select("block", band), meta_one,
        lambda a: np.clip(a[band], lo, hi),
        out_band=f"{band}_clipped",
    )


def normalized_difference(df: DataFrame, metadata: dict, band_a: str, band_b: str) -> DataFrame:
    """(a - b) / (a + b) — the NDVI shape; zero-sum pixels → NaN."""
    bms = [b for b in metadata["bands"] if b["name"] in (band_a, band_b)]
    meta_two = dict(metadata, bands=bms)

    def nd(a: dict[str, np.ndarray]) -> np.ndarray:
        # upcast before arithmetic: the index must be computed in f8 even
        # for narrow storage dtypes (f4 division would differ in the ulps)
        va, vb = a[band_a].astype("f8"), a[band_b].astype("f8")
        s = va + vb
        return np.divide(va - vb, s, out=np.full(s.shape, np.nan), where=s != 0)

    return map_bands(df.select("block", band_a, band_b), meta_two, nd, out_band="ndiff")
