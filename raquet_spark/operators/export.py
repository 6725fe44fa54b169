"""Export raster tiles back to dense pixel form — the GDAL-free
equivalent of the reference raquet2geotiff
(/root/reference/raquet/raquet2geotiff.py:84-277, which mosaics tiles
into a GeoTIFF buffer on one node).

Spark-first: the export is a *pixel table* — one row per (block, py,
px, value...) or per global pixel coordinate — which downstream tools
can reshape, window, or write as any format. Fully distributed; a
driver-side ``to_numpy_mosaic`` is provided for small rasters/tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raquet_spark.core.metadata import parse_nodata
from raquet_spark.functions import quadbin as qb
from raquet_spark.functions.bands import decode_block


def to_pixel_table(df: DataFrame, metadata: dict, bands: list[str] | None = None) -> DataFrame:
    """(gx, gy, <band>...) rows at native zoom; gx/gy are global pixel
    coordinates (tile_x * block_w + px)."""
    from raquet_spark.session import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    bw = metadata["tiling"]["block_width"]
    bh = metadata["tiling"]["block_height"]
    binfo = [
        (b["name"], b["type"], parse_nodata(b.get("nodata")))
        for b in metadata["bands"]
        if bands is None or b["name"] in bands
    ]

    src = qb.with_tile(df, "block")

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one concatenated frame per Arrow batch (not per tile): the
        # per-tile work is pure numpy; python touches each TILE once
        px = np.tile(np.arange(bw, dtype=np.int64), bh)
        py = np.repeat(np.arange(bh, dtype=np.int64), bw)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            qx = pdf["qb_x"].to_numpy(dtype=np.int64)
            qy = pdf["qb_y"].to_numpy(dtype=np.int64)
            out = {
                "gx": (qx[:, None] * bw + px[None, :]).ravel(),
                "gy": (qy[:, None] * bh + py[None, :]).ravel(),
            }
            for name, btype, _ in binfo:
                out[name] = np.concatenate(
                    [decode_block(b, btype).astype("f8") for b in pdf[name]]
                )
            yield pd.DataFrame(out)

    fields = "gx bigint, gy bigint, " + ", ".join(f"{n} double" for n, _, _ in binfo)
    return src.mapInPandas(expand, schema=fields)


def to_numpy_mosaic(df: DataFrame, metadata: dict, band: str) -> tuple[np.ndarray, tuple[int, int]]:
    """Collect one band into a dense 2-D numpy mosaic (driver-side;
    small rasters / tests only). Returns (array, (gx0, gy0)) with nodata
    fill for missing tiles."""
    bm = next(b for b in metadata["bands"] if b["name"] == band)
    nodata = parse_nodata(bm.get("nodata"))
    bw = metadata["tiling"]["block_width"]
    bh = metadata["tiling"]["block_height"]

    rows = qb.with_tile(df.select("block", band), "block").collect()
    if not rows:
        return np.empty((0, 0)), (0, 0)
    xs = [r["qb_x"] for r in rows]
    ys = [r["qb_y"] for r in rows]
    x0, y0 = min(xs), min(ys)
    W = (max(xs) - x0 + 1) * bw
    H = (max(ys) - y0 + 1) * bh
    fill = nodata if nodata is not None else np.nan
    mosaic = np.full((H, W), fill, dtype="f8")
    for r in rows:
        tile = decode_block(r[band], bm["type"]).reshape(bh, bw)
        oy, ox = (r["qb_y"] - y0) * bh, (r["qb_x"] - x0) * bw
        mosaic[oy : oy + bh, ox : ox + bw] = tile
    return mosaic, (x0 * bw, y0 * bh)


def pixel_table_with_lonlat(pixel_df: DataFrame, metadata: dict) -> DataFrame:
    """Attach WGS84 lon/lat of each pixel center (pure Column math)."""
    z = metadata["tiling"]["max_zoom"]
    bw = metadata["tiling"]["block_width"]
    world = f"(CAST({1 << z} AS DOUBLE) * {bw})"
    lon = f"((gx + 0.5) / {world} * 360.0 - 180.0)"
    t = f"(pi() * (1.0 - 2.0 * (gy + 0.5) / {world}))"
    lat = f"(atan((exp({t}) - exp(-{t})) / 2.0) * 180.0 / pi())"
    return pixel_df.withColumn("lon", F.expr(lon)).withColumn("lat", F.expr(lat))
