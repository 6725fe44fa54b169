"""Point queries: pixel value at lon/lat (reference ST_RasterValue
semantics, format-specs/raquet.md:304-309).

Spark-first: the lookup is a *join*, not a per-point loop — a DataFrame
of points is mapped to its containing block cell (pure quadbin Column
math, usable for millions of points), equi-joined against the tile table
on ``block`` (broadcast when the point side is small), and only the
matched tiles are decoded. Zoom clamping follows the spec: requests
outside [min_zoom, max_zoom] clamp to the nearest available level.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raquet_spark.core.metadata import parse_nodata
from raquet_spark.functions import quadbin as qb
from raquet_spark.functions.bands import decode_block


def raster_value(
    tiles: DataFrame,
    points: DataFrame,
    metadata: dict,
    lon_col: str = "lon",
    lat_col: str = "lat",
    zoom: int | None = None,
    band: str | None = None,
) -> DataFrame:
    """Append ``value`` (double) for each point row; NULL when no tile
    covers the point (sparse dataset) or the pixel is nodata."""
    from raquet_spark.session import ensure_package_shipped

    ensure_package_shipped(tiles.sparkSession)
    t = metadata["tiling"]
    z = t["max_zoom"] if zoom is None else max(min(zoom, t["max_zoom"]), t["min_zoom"])
    bw, bh = t["block_width"], t["block_height"]
    band_meta = metadata["bands"][0] if band is None else next(
        b for b in metadata["bands"] if b["name"] == band
    )
    bname, btype = band_meta["name"], band_meta["type"]
    nodata = parse_nodata(band_meta.get("nodata"))

    # pixel zoom relative to the block grid: 2^z tiles × bw pixels each
    pts = points.withColumn("_pt_block", F.expr(qb.point_to_cell_sql(lon_col, lat_col, z, "spark")))

    # global pixel coordinates (floor of mercator fraction × world pixels)
    m = f"CAST({1 << z} AS DOUBLE)"
    clat = f"greatest(least(CAST({lat_col} AS DOUBLE), {qb.MAX_LAT}), {-qb.MAX_LAT})"
    sinlat = f"sin({clat} * pi() / 180.0)"
    xf = f"(CAST({lon_col} AS DOUBLE) / 360.0 + 0.5)"
    yf = f"(0.5 - 0.25 * ln((1.0 + {sinlat}) / (1.0 - {sinlat})) / pi())"
    pts = pts.withColumn(
        "_px", F.expr(f"CAST(floor({xf} * {m} * {bw}) AS BIGINT) % {bw}")
    ).withColumn("_py", F.expr(f"CAST(floor({yf} * {m} * {bh}) AS BIGINT) % {bh}"))

    lv = (
        tiles.where(F.expr(qb.cell_to_zoom_sql("block", "spark")) == z)
        .select(F.col("block").alias("_pt_block"), F.col(bname).alias("_blob"))
    )
    joined = pts.join(lv, "_pt_block", "left")

    @F.pandas_udf("double")
    def pixel_at(
        block: pd.Series, blob: pd.Series, px: pd.Series, py: pd.Series
    ) -> pd.Series:
        # decode each tile ONCE per Arrow batch (cache keyed by block id):
        # join output is clustered by the join key, so N points in one
        # tile cost one decode + N gathers, not N decodes. At 100 TB,
        # sampling millions of points against the same tiles stays
        # decode-bound by distinct tiles, not by points.
        cache: dict[int, object] = {}
        out = []
        for blk, b, x, y in zip(block, blob, px, py):
            if b is None or x is None:
                out.append(None)
                continue
            arr = cache.get(blk)
            if arr is None:
                arr = decode_block(b, btype)
                cache[blk] = arr
            v = float(arr[int(y) * bw + int(x)])
            if nodata is not None and (v == nodata or (math.isnan(v) and math.isnan(nodata if isinstance(nodata, float) else math.nan))):
                out.append(None)
            elif math.isnan(v):
                out.append(None)
            else:
                out.append(v)
        return pd.Series(out, dtype="float64")

    return joined.withColumn(
        "value", pixel_at("_pt_block", "_blob", "_px", "_py")
    ).drop("_pt_block", "_px", "_py", "_blob")
