"""RaQuet metadata model (format-specs/raquet.md:193-373).

The metadata is a JSON object stored as a string in the reserved
``block = 0`` row. This module builds/parses it and derives the global
per-band statistics from the per-tile statistics columns with a single
distributed aggregation (no pixel decode), mirroring the semantics of
reference combine_stats (/root/reference/raquet/raster2raquet.py:473-499)
and numpy stats (:525-574): population stddev, nodata/NaN excluded.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass, field
from typing import Any

SPEC_VERSION = "0.5.0"
TILE_STAT_NAMES = ["count", "min", "max", "sum", "mean", "stddev"]


@dataclass
class BandMeta:
    name: str
    type: str = "float64"
    nodata: float | int | str | None = None
    description: str | None = None
    unit: str | None = None
    scale: float | None = None
    offset: float | None = None
    colorinterp: str = "undefined"
    colortable: dict | None = None
    stats: dict[str, float] = field(default_factory=dict)

    def to_json(self) -> dict[str, Any]:
        out: dict[str, Any] = {
            "name": self.name,
            "type": self.type,
            "nodata": _sanitize_nodata(self.nodata),
            "colorinterp": self.colorinterp,
        }
        for k in ("description", "unit", "scale", "offset", "colortable"):
            v = getattr(self, k)
            if v is not None:
                out[k] = v
        out.update(self.stats)
        return out


def _sanitize_nodata(nodata):
    """Zarr-v3 style special float encoding (format-specs/raquet.md:338-342)."""
    if isinstance(nodata, float):
        if math.isnan(nodata):
            return "NaN"
        if nodata == math.inf:
            return "Infinity"
        if nodata == -math.inf:
            return "-Infinity"
    return nodata


def parse_nodata(nodata):
    if nodata == "NaN":
        return math.nan
    if nodata == "Infinity":
        return math.inf
    if nodata == "-Infinity":
        return -math.inf
    return nodata


def build_metadata(
    *,
    bands: list[BandMeta],
    bounds: tuple[float, float, float, float],
    width: int,
    height: int,
    block_width: int = 256,
    block_height: int = 256,
    min_zoom: int = 0,
    max_zoom: int = 0,
    num_blocks: int = 0,
    compression: str | None = "gzip",
    band_layout: str = "sequential",
    tile_statistics: bool = False,
    time: dict | None = None,
    custom: dict | None = None,
) -> dict:
    pixel_zoom = max_zoom + int(math.log2(block_width) / 2 + math.log2(block_height) / 2)
    meta: dict[str, Any] = {
        "file_format": "raquet",
        "version": SPEC_VERSION,
        "width": width,
        "height": height,
        "crs": "EPSG:3857",
        "bounds": list(bounds),
        "bounds_crs": "EPSG:4326",
        "band_layout": band_layout,
        "compression": compression,
        "tiling": {
            "scheme": "quadbin",
            "block_width": block_width,
            "block_height": block_height,
            "min_zoom": min_zoom,
            "max_zoom": max_zoom,
            "pixel_zoom": pixel_zoom,
            "num_blocks": num_blocks,
        },
        "bands": [b.to_json() for b in bands],
    }
    if tile_statistics:
        meta["tile_statistics"] = True
        meta["tile_statistics_columns"] = TILE_STAT_NAMES
    if time:
        meta["time"] = time
    if custom:
        meta["custom"] = custom
    return meta


def find_minzoom(
    bounds: tuple[float, float, float, float],
    native_zoom: int,
    block_size: int = 256,
    target_min_size: int = 128,
) -> int:
    """Minimum overview zoom for a ~``target_min_size``px rendering of
    the whole raster — parity with the reference's ``find_minzoom``
    (/root/reference/raquet/raster2raquet.py:689-697, golden-tested in
    its test_find_minzoom): measure the raster's diagonal in z32 tile
    units, then back off to the zoom where that diagonal is about
    ``hypot(target, target)`` pixels."""
    west, south, east, north = bounds
    big_zoom = 32
    m = 1 << big_zoom

    def tx(lon: float) -> int:
        return min(max(int((lon / 360.0 + 0.5) * m), 0), m - 1)

    def ty(lat: float) -> int:
        s = math.sin(math.radians(min(max(lat, -85.051128779806), 85.051128779806)))
        yf = 0.5 - 0.25 * math.log((1.0 + s) / (1.0 - s)) / math.pi
        return min(max(int(yf * m), 0), m - 1)

    high_hypot = math.hypot(tx(east) - tx(west), ty(south) - ty(north))
    target_hypot = math.hypot(target_min_size, target_min_size)
    block_zoom = int(math.log2(block_size))
    min_zoom = big_zoom - math.log2(high_hypot / target_hypot) - block_zoom
    return max(0, min(native_zoom, int(round(min_zoom))))


def metadata_to_json(meta: dict) -> str:
    return json.dumps(meta, separators=(",", ":"), sort_keys=False)


def parse_metadata(s: str) -> dict:
    meta = json.loads(s)
    if meta.get("file_format") != "raquet":
        raise ValueError("not a raquet metadata row")
    return meta


def global_band_stats(tile_stats_rows: list[dict], band: str) -> dict[str, float]:
    """Combine per-tile stats dicts into GDAL-style global band statistics.

    Welford-free exact combination: global stddev from pooled sum and
    sum-of-squares is avoided in the reference (it keeps a weighted
    average of tile stddevs, raster2raquet.py:493); we do the
    *mathematically exact* pooled version since tile sum/sum_squares are
    available: var = E[x^2] - E[x]^2.
    """
    count = sum(r[f"{band}_count"] for r in tile_stats_rows)
    if count == 0:
        return {}
    total = sum(r[f"{band}_sum"] for r in tile_stats_rows)
    ssq = sum(r.get(f"{band}_sum_squares", 0.0) for r in tile_stats_rows)
    mean = total / count
    var = max(ssq / count - mean * mean, 0.0)
    total_pixels = sum(r.get(f"{band}_total_pixels", 0) for r in tile_stats_rows)
    return {
        "STATISTICS_MINIMUM": min(r[f"{band}_min"] for r in tile_stats_rows),
        "STATISTICS_MAXIMUM": max(r[f"{band}_max"] for r in tile_stats_rows),
        "STATISTICS_MEAN": mean,
        "STATISTICS_STDDEV": math.sqrt(var),
        "STATISTICS_VALID_PERCENT": (count / total_pixels * 100.0) if total_pixels else 100.0,
    }
