"""Same-zoom focal (neighborhood) raster operators: DEM derivatives
(slope / aspect / hillshade, Horn's method — the standard GDALDEM
kernel set) and focal statistics (mean/min/max/range/stddev/sum over a
(2r+1)² window).

Scale shape — strip-based halo exchange: every tile needs a ``radius``-
pixel ring from its 8 neighbors, so each tile emits its full payload to
its OWN group (as the original encoded blob — no dtype expansion) plus
only the narrow edge/corner strips (r rows/columns, float64 raw bytes)
to the neighbors — one groupBy shuffle whose volume is ~input plus the
strips (a few percent for r=1 at 256px), never the 9× of whole-tile
replication. Window semantics: an output pixel
whose window touches nodata or leaves the raster is nodata (NaN) — no
silent edge replication, so the distributed result equals the same
kernel run on the full global mosaic (pytest-pinned).

Reference scope note: the RaQuet reference stores/queries rasters and
delegates analysis of this kind to GDAL (`gdaldem`); this module is the
Spark-native equivalent of that companion tooling, built on the same
halo-exchange machinery as the wide-kernel pyramid levels
(operators/pyramid.py:184).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raquet_spark.core.metadata import parse_nodata
from raquet_spark.functions import quadbin as qb
from raquet_spark.functions.bands import DTYPES, decode_block, encode_block
from raquet_spark.plans.shape import pin_group_width

_EARTH_R = 6378137.0
_ORIGIN_SHIFT = math.pi * _EARTH_R

STAT_OPS = ("mean", "min", "max", "range", "stddev", "sum")
DERIVATIVE_OPS = ("slope", "aspect", "hillshade")


def _windows(padded: np.ndarray, r: int) -> np.ndarray:
    """((2r+1)², bh, bw) stack of shifted views over the padded array."""
    bh = padded.shape[0] - 2 * r
    bw = padded.shape[1] - 2 * r
    return np.stack(
        [
            padded[dy : dy + bh, dx : dx + bw]
            for dy in range(2 * r + 1)
            for dx in range(2 * r + 1)
        ]
    )


def _horn_derivatives(
    padded: np.ndarray, cellsize: float, z_factor: float
) -> tuple[np.ndarray, np.ndarray]:
    """(dz/dx, dz/dy) by Horn's method (3×3; the gdaldem default).
    NaN anywhere in a window propagates to that output pixel."""
    w = _windows(padded, 1)
    nw, n_, ne, w_, _c, e_, sw, s_, se = (w[i] for i in range(9))
    dzdx = ((ne + 2 * e_ + se) - (nw + 2 * w_ + sw)) / (8.0 * cellsize)
    dzdy = ((sw + 2 * s_ + se) - (nw + 2 * n_ + ne)) / (8.0 * cellsize)
    return dzdx * z_factor, dzdy * z_factor


def _apply_op(
    padded: np.ndarray,
    op: str,
    r: int,
    cellsize: float,
    z_factor: float,
    azimuth: float,
    altitude: float,
) -> np.ndarray:
    if op in STAT_OPS:
        w = _windows(padded, r)
        if op == "mean":
            return w.mean(axis=0)
        if op == "min":
            return w.min(axis=0)
        if op == "max":
            return w.max(axis=0)
        if op == "range":
            return w.max(axis=0) - w.min(axis=0)
        if op == "stddev":
            return w.std(axis=0)
        return w.sum(axis=0)
    dzdx, dzdy = _horn_derivatives(padded, cellsize, z_factor)
    if op == "slope":
        return np.degrees(np.arctan(np.hypot(dzdx, dzdy)))
    if op == "aspect":
        # gdaldem convention: degrees clockwise from north, flat -> 0
        asp = np.degrees(np.arctan2(dzdy, -dzdx))
        asp = np.where(asp < 0, 90.0 - asp, np.where(asp > 90.0, 360.0 - asp + 90.0, 90.0 - asp))
        flat = (dzdx == 0) & (dzdy == 0)
        return np.where(flat, 0.0, asp)
    if op == "hillshade":
        zen = math.radians(90.0 - altitude)
        az = math.radians(360.0 - azimuth + 90.0)
        slope = np.arctan(np.hypot(dzdx, dzdy))
        aspect = np.arctan2(dzdy, -dzdx)
        shade = math.cos(zen) * np.cos(slope) + math.sin(zen) * np.sin(
            slope
        ) * np.cos(az - aspect)
        return np.clip(255.0 * shade, 0.0, 255.0)
    raise ValueError(f"unknown focal op {op!r}")


def focal_map(
    df: DataFrame,
    metadata: dict,
    op: str,
    band: str | list[str] = "band_1",
    radius: int = 1,
    cellsize: float | None = None,
    z_factor: float = 1.0,
    azimuth: float = 315.0,
    altitude: float = 45.0,
) -> DataFrame:
    """Apply a focal operator to one band or a LIST of bands → tiles
    ``(block, <band>, ...)`` of float64 with NaN where the window
    leaves valid data.

    Multi-band calls ride the SAME single halo-exchange shuffle as one
    band — each tile row carries every requested band's core blob and
    per-band edge strips, so n bands cost one groupBy, not n
    (byte-identical to n sequential single-band calls, pytest-pinned).

    ``cellsize`` defaults to the Web-Mercator ground resolution at the
    dataset zoom (meters/pixel at the equator); pass 1.0 to work in
    pixel units (and for closed-form oracles). Derivative ops fix
    ``radius=1`` (Horn is a 3×3 kernel)."""
    from raquet_spark.session import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    if op in DERIVATIVE_OPS:
        radius = 1
    elif op not in STAT_OPS:
        raise ValueError(f"unknown focal op {op!r}")
    bands = [band] if isinstance(band, str) else list(band)
    t = metadata["tiling"]
    z, bw, bh = t["max_zoom"], t["block_width"], t["block_height"]
    if radius > min(bw, bh):
        raise ValueError(f"radius {radius} exceeds block size {bw}x{bh}")
    binfo = {b["name"]: b for b in metadata["bands"]}
    btypes = {b: binfo[b]["type"] for b in bands}
    nodatas = {b: parse_nodata(binfo[b].get("nodata")) for b in bands}
    # band payloads ride the strip rows NEXT TO the routing columns, so
    # a band named like one of them would silently clobber the plumbing
    _reserved = {"gx", "gy", "ox", "oy", "kind", "group",
                 "qb_x", "qb_y", "qb_z", "block"}
    clash = _reserved & set(bands)
    if clash:
        raise ValueError(
            f"band name(s) {sorted(clash)} collide with focal_map's "
            "routing columns — rename the bands before the focal pass"
        )
    if cellsize is None:
        cellsize = 2.0 * _ORIGIN_SHIFT / ((1 << z) * bw)
    m = 1 << z
    r = radius
    # output is float64 — keep a byte codec even when the source tiles
    # are lossy-compressed (jpeg/webp are uint8-only)
    compression = metadata.get("compression", "gzip")
    if compression not in (None, "none", "gzip"):
        compression = "gzip"

    src = qb.with_tile(
        df.where(F.col("block") != 0).select("block", *bands), "block"
    ).where(F.col("qb_z") == z)

    def _to_f8(tile: np.ndarray, nodata) -> np.ndarray:
        arr = tile.astype("f8")
        if nodata is not None and not (
            isinstance(nodata, float) and np.isnan(nodata)
        ):
            arr = np.where(tile == nodata, np.nan, arr)
        return arr

    def strips(batches):
        """9 rows per tile: the core payloads + 8 narrow halo strips,
        every band riding the same row."""
        for pdf in batches:
            cols: dict[str, list] = {
                "gx": [], "gy": [], "ox": [], "oy": [], "kind": [],
                **{b: [] for b in bands},
            }
            for row in pdf.to_dict("records"):
                tx, ty = int(row["qb_x"]), int(row["qb_y"])
                arrs = {
                    b: _to_f8(
                        decode_block(row[b], btypes[b]).reshape(bh, bw),
                        nodatas[b],
                    )
                    for b in bands
                }
                cols["gx"].append(tx)
                cols["gy"].append(ty)
                cols["ox"].append(0)
                cols["oy"].append(0)
                cols["kind"].append(0)
                for b in bands:
                    # ship the ORIGINAL encoded blob (gzip'd source
                    # dtype), not the 8-byte-per-pixel f8 expansion —
                    # the shuffle carries ~input volume + narrow strips
                    cols[b].append(bytes(row[b]))
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        if dx == 0 and dy == 0:
                            continue
                        ngx, ngy = tx - dx, ty - dy  # group this strip feeds
                        if not (0 <= ngx < m and 0 <= ngy < m):
                            continue
                        xs = slice(bw - r, bw) if dx == -1 else (
                            slice(0, r) if dx == 1 else slice(0, bw)
                        )
                        ys = slice(bh - r, bh) if dy == -1 else (
                            slice(0, r) if dy == 1 else slice(0, bh)
                        )
                        cols["gx"].append(ngx)
                        cols["gy"].append(ngy)
                        cols["ox"].append(dx)
                        cols["oy"].append(dy)
                        cols["kind"].append(1)
                        for b in bands:
                            cols[b].append(
                                np.ascontiguousarray(arrs[b][ys, xs]).tobytes()
                            )
            yield pd.DataFrame(cols)

    strip_schema = "gx bigint, gy bigint, ox int, oy int, kind int, " + ", ".join(
        f"{b} binary" for b in bands
    )
    routed = src.mapInPandas(strips, schema=strip_schema).withColumn(
        "group", F.expr(qb.tile_to_cell_sql("gx", "gy", z, "spark"))
    )

    def assemble(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        if not (pdf["kind"] == 0).any():
            # halo-only group: the tile itself is absent from the dataset
            return pd.DataFrame(
                {"block": pd.Series([], dtype="int64"),
                 **{b: pd.Series([], dtype=object) for b in bands}}
            )
        out_row: dict[str, list] = {"block": [int(key[0])]}
        records = pdf.to_dict("records")
        for b in bands:
            padded = np.full((bh + 2 * r, bw + 2 * r), np.nan)
            for row in records:
                dx, dy = int(row["ox"]), int(row["oy"])
                if row["kind"] == 0:
                    tile = decode_block(row[b], btypes[b]).reshape(bh, bw)
                    padded[r : r + bh, r : r + bw] = _to_f8(tile, nodatas[b])
                    continue
                buf = np.frombuffer(row[b], dtype="f8")
                # contributor sits at (dx, dy) relative to this tile
                xs = slice(0, r) if dx == -1 else (
                    slice(r + bw, r + bw + r) if dx == 1 else slice(r, r + bw)
                )
                ys = slice(0, r) if dy == -1 else (
                    slice(r + bh, r + bh + r) if dy == 1 else slice(r, r + bh)
                )
                w = (xs.stop - xs.start)
                h = (ys.stop - ys.start)
                padded[ys, xs] = buf.reshape(h, w)
            out = _apply_op(padded, op, r, cellsize, z_factor, azimuth, altitude)
            out_row[b] = [encode_block(out.reshape(-1), "float64", compression)]
        return pd.DataFrame(out_row)

    routed = pin_group_width(
        routed, "group",
        approx_pixels=metadata["width"] * metadata["height"] * len(bands),
    )
    out_schema = "block bigint, " + ", ".join(f"{b} binary" for b in bands)
    return routed.groupBy("group").applyInPandas(assemble, schema=out_schema)


def focal_metadata(metadata: dict, band: str | list[str] = "band_1") -> dict:
    """Metadata for a focal_map output table: float64 bands, the spec
    spelling "NaN" for the nodata (what parse_nodata recognizes), and
    the same gzip fallback focal_map applies when the source carried a
    lossy (uint8-only) codec."""
    bands = [band] if isinstance(band, str) else list(band)
    meta = dict(metadata)
    comp = metadata.get("compression", "gzip")
    if comp not in (None, "none", "gzip"):
        comp = "gzip"
    meta["compression"] = comp
    meta["bands"] = [
        {**b, "type": "float64", "nodata": "NaN"}
        for b in metadata["bands"]
        if b["name"] in bands
    ]
    return meta
