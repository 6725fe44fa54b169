"""Tiling: dense pixel rows → RaQuet tile rows — the core conversion
the reference does single-node with GDAL windowed reads
(/root/reference/raquet/raster2raquet.py: read_raster → tile loop →
encode). Spark-first: the pixel table is shuffled ONCE keyed by the
target quadbin block, and each tile is assembled and encoded inside an
Arrow-batched applyInPandas — 1000 executors tile 1000 blocks at a time,
no driver involvement.

Input contract: (gx, gy, <band>...) global pixel coordinates at the
native zoom's pixel grid (what operators/export.to_pixel_table emits) —
any raster source that can be read as a distributed pixel table
(parquet, JDBC, CSV of samples) becomes a RaQuet dataset this way.
Missing pixels of a partially-covered tile become nodata.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raquet_spark.core.metadata import parse_nodata
from raquet_spark.functions import quadbin as qb
from raquet_spark.functions.bands import DTYPES, encode_block


def from_pixel_table(
    pixels: DataFrame,
    metadata: dict,
    compression: str | None = "gzip",
    extra_keys: tuple[tuple[str, str], ...] = (),
) -> DataFrame:
    """(gx, gy, band...) rows → (block, band...) tile rows.

    The block key is computed as a pure Column expression (gx / block
    size → tile x/y → Morton cell), so the single shuffle is an ordinary
    hash partition on ``block`` with map-side batching.

    ``extra_keys`` — extra ``(column, sql_type)`` group keys carried
    through (e.g. ``(("time_cf", "double"),)`` for time-dimension
    rasters): ONE shuffle assembles every (tile, step) pair."""
    from raquet_spark.session import ensure_package_shipped

    ensure_package_shipped(pixels.sparkSession)
    t = metadata["tiling"]
    z, bw, bh = t["max_zoom"], t["block_width"], t["block_height"]
    bands = [
        (b["name"], b["type"], parse_nodata(b.get("nodata")))
        for b in metadata["bands"]
    ]

    tx = f"CAST(gx DIV {bw} AS BIGINT)"
    ty = f"CAST(gy DIV {bh} AS BIGINT)"
    keyed = pixels.withColumn("block", F.expr(qb.tile_to_cell_sql(tx, ty, z, "spark")))

    extra_names = [n for n, _ in extra_keys]

    def assemble(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        block = key[0]
        x0 = int(pdf["gx"].min()) // bw * bw
        y0 = int(pdf["gy"].min()) // bh * bh
        ix = pdf["gx"].to_numpy(dtype=np.int64) - x0
        iy = pdf["gy"].to_numpy(dtype=np.int64) - y0
        out = {"block": [block]}
        for name, kv in zip(extra_names, key[1:]):
            out[name] = [kv]
        for name, btype, nodata in bands:
            fill = 0 if nodata is None else nodata
            arr = np.full(bh * bw, fill, dtype=DTYPES[btype])
            vals = pdf[name].to_numpy()
            arr[iy * bw + ix] = vals.astype(DTYPES[btype])
            out[name] = [encode_block(arr, btype, compression)]
        return pd.DataFrame(out)

    schema = "block bigint, " + ", ".join(
        [f"{n} {t}" for n, t in extra_keys]
        + [f"{name} binary" for name, _, _ in bands]
    )
    return keyed.groupBy("block", *extra_names).applyInPandas(assemble, schema=schema)


def rasterize_polygon(
    spark,
    polygon_lonlat: list[tuple[float, float]],
    zoom: int,
    block_size: int = 256,
    burn_value: float = 1.0,
    band_type: str = "uint8",
    nodata: float = 0.0,
    compression: str | None = "gzip",
):
    """Burn a polygon into a new RaQuet tile table (the GDAL
    ``rasterize`` direction of raster↔vector interop; ``clip_to_polygon``
    is the other). A pixel takes ``burn_value`` when its CENTER falls
    inside the polygon (even-odd rule — the same vectorized test
    region_stats/clip use), else ``nodata``; tiles with no interior
    pixel are dropped.

    Scale shape: the candidate tile grid comes from the polygon's bbox
    (never the world), is generated distributed with ``spark.range``,
    and each task rasterizes its tiles in one vectorized numpy pass —
    map-only, no shuffle, output already keyed by block. Returns
    ``(tiles_df, metadata)``.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from raquet_spark.core.metadata import BandMeta, build_metadata
    from raquet_spark.functions import geom
    from raquet_spark.functions.bands import encode_block
    from raquet_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)
    verts = geom.poly_to_fractions(polygon_lonlat)
    fx = [v[0] for v in verts]
    fy = [v[1] for v in verts]
    n = 1 << zoom
    x0, x1 = int(min(fx) * n), min(int(max(fx) * n), n - 1)
    y0, y1 = int(min(fy) * n), min(int(max(fy) * n), n - 1)
    nx = x1 - x0 + 1

    cand = spark.range((x1 - x0 + 1) * (y1 - y0 + 1)).selectExpr(
        f"{x0} + id % {nx} AS tx", f"{y0} + id DIV {nx} AS ty"
    )
    bs = block_size
    npix = n * bs  # global pixel grid width at this zoom

    def burn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        px_local = (np.arange(bs) + 0.5) / npix
        for pdf in batches:
            blocks, blobs = [], []
            for row in pdf.to_dict("records"):
                tx, ty = int(row["tx"]), int(row["ty"])
                cx = tx * bs / npix + px_local  # pixel-center fractions
                cy = ty * bs / npix + px_local
                gx, gy = np.meshgrid(cx, cy)
                inside = geom.point_in_poly_np(gx, gy, verts)
                if not inside.any():
                    continue
                arr = np.where(inside, burn_value, nodata)
                blocks.append(qb.py_tile_to_cell(tx, ty, zoom))
                blobs.append(
                    encode_block(arr.reshape(-1), band_type, compression)
                )
            yield pd.DataFrame({"block": blocks, "band_1": blobs})

    tiles = cand.mapInPandas(burn, schema="block bigint, band_1 binary")
    meta = build_metadata(
        bands=[BandMeta(name="band_1", type=band_type, nodata=nodata)],
        bounds=geom.poly_bbox_lonlat(polygon_lonlat),
        width=(x1 - x0 + 1) * bs,
        height=(y1 - y0 + 1) * bs,
        block_width=bs,
        block_height=bs,
        min_zoom=zoom,
        max_zoom=zoom,
        compression=compression,
    )
    return tiles, meta
