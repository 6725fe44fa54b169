"""Cross-zoom raster alignment.

The reference aligns rasters of different resolutions by re-warping
with GDAL at conversion time (`/root/reference/raquet/raster2raquet.py`
tiling loop); once two datasets are in RaQuet at different native
zooms, warehouse joins on ``block`` can't match them. This operator
closes that gap Spark-first:

- **Upsample** (finer target zoom): map-only — every tile at zoom z
  emits its 4^dz descendants at the target zoom with pixel replication
  (nearest). No shuffle: the child blocks are derived from the parent
  key, so the output inherits the input's Morton locality and a
  subsequent ``join_rasters`` on ``block`` stays co-located.
- **Downsample** (coarser target zoom): the pyramid path —
  ``groupBy(parent)`` + 2×2 mosaic per level (one shuffle per level,
  each level ¼ the data), with the full GDAL-style kernel set.

Together they make cross-resolution raster joins a pure equi-join:
``align_to_zoom`` the coarser side up (or the finer side down), then
``join_rasters`` on ``block``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from raquet_spark.core.metadata import parse_nodata
from raquet_spark.functions.bands import decode_block, encode_block
from raquet_spark.functions.quadbin import py_cell_to_tile, py_tile_to_cell


def align_to_zoom(
    df: DataFrame,
    metadata: dict,
    target_zoom: int,
    resampling: str = "average",
) -> tuple[DataFrame, dict]:
    """Re-grid a RaQuet table to ``target_zoom``.

    Upsampling replicates pixels (nearest — the only kernel that needs
    no halo); downsampling reuses the pyramid kernels (``resampling``).
    Returns (tiles, updated metadata).
    """
    native = metadata["tiling"]["max_zoom"]
    if target_zoom == native:
        return df, metadata
    if target_zoom < native:
        from raquet_spark.operators.pyramid import build_level

        current = df
        for z in range(native, target_zoom, -1):
            current = build_level(current, metadata, z, resampling)
        meta = dict(metadata)
        meta["tiling"] = dict(
            metadata["tiling"], max_zoom=target_zoom, min_zoom=target_zoom
        )
        return current, meta
    return _upsample(df, metadata, target_zoom)


def _upsample(
    df: DataFrame, metadata: dict, target_zoom: int
) -> tuple[DataFrame, dict]:
    from raquet_spark.session import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    native = metadata["tiling"]["max_zoom"]
    dz = target_zoom - native
    n = 1 << dz
    bands = [(b["name"], b["type"]) for b in metadata["bands"]]
    bw = metadata["tiling"]["block_width"]
    bh = metadata["tiling"]["block_height"]
    if bw % n or bh % n:
        raise ValueError(
            f"cannot upsample {dz} zoom levels: block {bw}x{bh} not divisible by {n}"
        )
    sw, sh = bw // n, bh // n  # source window per child tile
    compression = metadata.get("compression", "gzip")

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"block": []}
            for name, _ in bands:
                out[name] = []
            for row in pdf.to_dict("records"):
                px, py, _ = py_cell_to_tile(int(row["block"]))
                arrs = {
                    name: decode_block(row[name], btype).reshape(bh, bw)
                    for name, btype in bands
                }
                for dy in range(n):
                    for dx in range(n):
                        out["block"].append(
                            py_tile_to_cell(px * n + dx, py * n + dy, target_zoom)
                        )
                        for name, btype in bands:
                            sub = arrs[name][
                                dy * sh : (dy + 1) * sh, dx * sw : (dx + 1) * sw
                            ]
                            up = np.repeat(np.repeat(sub, n, axis=0), n, axis=1)
                            out[name].append(
                                encode_block(up.reshape(-1), btype, compression)
                            )
            yield pd.DataFrame(out)

    schema = "block bigint, " + ", ".join(f"{name} binary" for name, _ in bands)
    cols = ["block"] + [name for name, _ in bands]
    aligned = df.select(*cols).mapInPandas(expand, schema=schema)
    meta = dict(metadata)
    meta["tiling"] = dict(
        metadata["tiling"],
        max_zoom=target_zoom,
        min_zoom=target_zoom,
        num_blocks=metadata["tiling"].get("num_blocks", 0) * n * n,
    )
    return aligned, meta
