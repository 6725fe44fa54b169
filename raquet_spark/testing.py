"""Deterministic synthetic raster generation for tests and benchmarks.

GDAL is not available in this container, so instead of converting the
reference's GeoTIFF fixtures we generate rasters whose pixel values are
an analytic function of global pixel coordinates — closed-form, seedable
and identical on every executor. This mirrors the role of the reference
test fixtures (/root/reference/tests/*.tif) for round-trip and stats
tests.

Pixel function: value = ((gx * 31 + gy * 17 + seed) % modulo), with a
deterministic nodata hole where (gx + gy) % nodata_every == 0 (if
requested). Fully distributed: tiles are generated with mapInPandas from
a spark.range over the tile grid.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raquet_spark.core.metadata import BandMeta, build_metadata
from raquet_spark.functions import quadbin as qb
from raquet_spark.functions.bands import DTYPES, encode_block


def synthetic_tile_array(
    tx: int,
    ty: int,
    zoom: int,
    block_size: int,
    band_index: int,
    seed: int,
    dtype: str,
    modulo: int = 251,
    nodata: float | None = None,
    nodata_every: int = 0,
) -> np.ndarray:
    """Closed-form pixel block for tile (tx, ty) — same on driver & executors."""
    bs = block_size
    gx = np.arange(tx * bs, (tx + 1) * bs, dtype=np.int64)
    gy = np.arange(ty * bs, (ty + 1) * bs, dtype=np.int64)
    xx, yy = np.meshgrid(gx, gy)  # row-major: yy varies by row
    vals = ((xx * 31 + yy * 17 + seed + band_index * 7) % modulo).astype(DTYPES[dtype])
    if nodata is not None and nodata_every:
        mask = ((xx + yy) % nodata_every) == 0
        vals = vals.copy()
        vals[mask] = nodata
    return vals.reshape(-1)


def make_synthetic_raster(
    spark: SparkSession,
    *,
    zoom: int = 6,
    tiles_x: int = 4,
    tiles_y: int = 4,
    origin_x: int = 16,
    origin_y: int = 20,
    block_size: int = 32,
    num_bands: int = 1,
    dtype: str = "float32",
    seed: int = 42,
    modulo: int = 251,
    nodata: float | None = None,
    nodata_every: int = 0,
    compression: str | None = "gzip",
) -> tuple[DataFrame, dict]:
    """Generate a (tiles_x × tiles_y) tile grid at ``zoom`` with
    ``num_bands`` band columns, plus matching RaQuet metadata."""
    from raquet_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)
    band_names = [f"band_{i + 1}" for i in range(num_bands)]

    n_tiles = tiles_x * tiles_y
    n_parts = max(1, min(n_tiles, spark.sparkContext.defaultParallelism))
    grid = (
        spark.range(n_tiles, numPartitions=n_parts)
        .select(
            (F.lit(origin_x) + F.col("id") % tiles_x).alias("tx"),
            (F.lit(origin_y) + (F.col("id") / tiles_x).cast("long")).alias("ty"),
        )
        .withColumn("block", F.expr(qb.tile_to_cell_sql("tx", "ty", zoom, "spark")))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"block": pdf["block"].astype("int64")}
            for bi, name in enumerate(band_names):
                out[name] = [
                    encode_block(
                        synthetic_tile_array(
                            tx, ty, zoom, block_size, bi, seed, dtype,
                            modulo=modulo, nodata=nodata,
                            nodata_every=nodata_every,
                        ),
                        dtype,
                        compression,
                    )
                    for tx, ty in zip(pdf["tx"], pdf["ty"])
                ]
            yield pd.DataFrame(out)

    schema = "block bigint, " + ", ".join(f"{b} binary" for b in band_names)
    tiles = grid.mapInPandas(gen, schema=schema)

    w, s0, _, _ = qb.py_cell_to_bounds(qb.py_tile_to_cell(origin_x, origin_y + tiles_y - 1, zoom))
    _, _, e, n = qb.py_cell_to_bounds(qb.py_tile_to_cell(origin_x + tiles_x - 1, origin_y, zoom))
    meta = build_metadata(
        bands=[BandMeta(name=b, type=dtype, nodata=nodata) for b in band_names],
        bounds=(w, s0, e, n),
        width=tiles_x * block_size,
        height=tiles_y * block_size,
        block_width=block_size,
        block_height=block_size,
        min_zoom=zoom,
        max_zoom=zoom,
        num_blocks=tiles_x * tiles_y,
        compression=compression,
        tile_statistics=False,
    )
    meta["tiling"]["pixel_zoom"] = zoom + int(math.log2(block_size))
    return tiles, meta
