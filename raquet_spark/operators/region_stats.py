"""Region analytics: aggregate statistics over a bbox at a resolution
(reference ST_RegionStats semantics, format-specs/raquet.md:310-316).

Runs entirely on per-tile statistics columns — zero pixel decode. The
bbox becomes a handful of contiguous Morton ``block`` ranges computed on
the driver, so the predicate pushes down to parquet row-group pruning on
the block-sorted files. Resolution accepts int / 'auto' / 'min' / 'max'
with spec clamping.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

from raquet_spark.operators.tile_stats import aggregate_band_stats
from raquet_spark.sources.raquet import filter_blocks_bbox


def resolve_resolution(
    resolution: int | str, metadata: dict, bbox: tuple[float, float, float, float] | None = None
) -> int:
    t = metadata["tiling"]
    lo, hi = t["min_zoom"], t["max_zoom"]
    if resolution == "min":
        return lo
    if resolution == "max":
        return hi
    if resolution == "auto":
        if not bbox:
            return hi
        # pick the zoom where the bbox spans ~O(100) tiles
        west, south, east, north = bbox
        span = max(east - west, north - south, 1e-9)
        z = int(math.log2(360.0 / span)) + 4
        return max(lo, min(hi, z))
    return max(lo, min(hi, int(resolution)))


def region_stats(
    tiles_with_stats: DataFrame,
    metadata: dict,
    bbox: tuple[float, float, float, float],
    band: str = "band_1",
    resolution: int | str = "max",
) -> DataFrame:
    """One-row DataFrame: count/min/max/sum/mean/stddev over tiles
    intersecting ``bbox`` at the resolved zoom."""
    z = resolve_resolution(resolution, metadata, bbox)
    west, south, east, north = bbox
    sel = filter_blocks_bbox(tiles_with_stats, west, south, east, north, z)
    return aggregate_band_stats(sel, band)
