"""Focal operators: distributed halo-exchange results must equal the
same kernel run over the full global mosaic (the hard part — strip
routing across tile borders), and the DEM kernels must match closed
forms on analytic surfaces."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from raquet_spark.functions.bands import decode_block
from raquet_spark.functions.quadbin import py_cell_to_tile
from raquet_spark.operators.export import to_numpy_mosaic
from raquet_spark.operators.focal import _apply_op, focal_map
from raquet_spark.testing import make_synthetic_raster

BS = 16


@pytest.fixture(scope="module")
def raster(spark):
    return make_synthetic_raster(
        spark, zoom=6, tiles_x=3, tiles_y=2, origin_x=16, origin_y=20,
        block_size=BS, dtype="float32", nodata=-1.0, nodata_every=7,
    )


def _global(tiles, meta, op, r=1, **kw):
    """Reference: run the kernel once over the full mosaic."""
    mosaic, origin = to_numpy_mosaic(tiles, meta, "band_1")
    arr = np.where(mosaic == -1.0, np.nan, mosaic.astype("f8"))
    padded = np.pad(arr, r, constant_values=np.nan)
    out = _apply_op(
        padded, op, r,
        kw.get("cellsize", 1.0), kw.get("z_factor", 1.0),
        kw.get("azimuth", 315.0), kw.get("altitude", 45.0),
    )
    return out, origin


@pytest.mark.parametrize("op", ["slope", "hillshade", "aspect", "mean", "range"])
def test_focal_equals_global_mosaic(spark, raster, op):
    tiles, meta = raster
    got = focal_map(tiles, meta, op, cellsize=1.0).collect()
    want, (ox0, oy0) = _global(tiles, meta, op)
    assert len(got) == 6
    for row in got:
        x, y, _ = py_cell_to_tile(row["block"])
        sub = want[
            (y - 20) * BS : (y - 20 + 1) * BS, (x - 16) * BS : (x - 16 + 1) * BS
        ]
        np.testing.assert_array_equal(
            decode_block(row["band_1"], "float64").reshape(BS, BS), sub
        )


def test_focal_stats_radius2(spark, raster):
    tiles, meta = raster
    got = focal_map(tiles, meta, "mean", radius=2).collect()
    want, _ = _global(tiles, meta, "mean", r=2)
    for row in got:
        x, y, _ = py_cell_to_tile(row["block"])
        sub = want[(y - 20) * BS : (y - 19) * BS, (x - 16) * BS : (x - 15) * BS]
        np.testing.assert_array_equal(
            decode_block(row["band_1"], "float64").reshape(BS, BS), sub
        )


def test_slope_closed_form_on_ramp(spark):
    """Horn derivatives of a linear ramp are exact: slope is the
    constant degrees(atan(hypot(a, b))) everywhere the window is
    inside the raster; outside-window pixels are NaN."""
    from raquet_spark.core.metadata import BandMeta, build_metadata
    from raquet_spark.operators.tiling import from_pixel_table

    npx = 2 * BS
    pix = spark.range(npx * npx).selectExpr(
        f"{16 * BS} + id % {npx} AS gx",
        f"{20 * BS} + id DIV {npx} AS gy",
        f"CAST(3 * (id % {npx}) + 4 * (id DIV {npx}) AS DOUBLE) AS band_1",
    )
    meta = build_metadata(
        bands=[BandMeta(name="band_1", type="float64")],
        bounds=(0, 0, 0, 0), width=npx, height=npx,
        block_width=BS, block_height=BS, min_zoom=6, max_zoom=6,
        compression=None,
    )
    tiles = from_pixel_table(pix, meta, compression=None)
    out = focal_map(tiles, meta, "slope", cellsize=1.0)
    const = float(np.degrees(np.arctan(5.0)))
    vals = np.concatenate(
        [decode_block(r["band_1"], "float64") for r in out.collect()]
    )
    valid = vals[~np.isnan(vals)]
    # interior of the 32x32 raster: 30*30 pixels keep a full window
    assert len(valid) == (npx - 2) * (npx - 2)
    np.testing.assert_allclose(valid, const, rtol=0, atol=1e-12)


def test_hillshade_flat_surface(spark):
    """A flat surface shades at 255*cos(zenith) regardless of azimuth."""
    from raquet_spark.core.metadata import BandMeta, build_metadata
    from raquet_spark.operators.tiling import from_pixel_table

    npx = BS
    pix = spark.range(npx * npx).selectExpr(
        f"{16 * BS} + id % {npx} AS gx",
        f"{20 * BS} + id DIV {npx} AS gy",
        "CAST(100 AS DOUBLE) AS band_1",
    )
    meta = build_metadata(
        bands=[BandMeta(name="band_1", type="float64")],
        bounds=(0, 0, 0, 0), width=npx, height=npx,
        block_width=BS, block_height=BS, min_zoom=6, max_zoom=6,
        compression=None,
    )
    tiles = from_pixel_table(pix, meta, compression=None)
    out = focal_map(tiles, meta, "hillshade", cellsize=1.0, altitude=60.0)
    vals = np.concatenate(
        [decode_block(r["band_1"], "float64") for r in out.collect()]
    )
    valid = vals[~np.isnan(vals)]
    assert len(valid) == (npx - 2) * (npx - 2)
    np.testing.assert_allclose(valid, 255.0 * np.cos(np.radians(30.0)), atol=1e-9)


def test_focal_single_shuffle(spark, raster):
    tiles, meta = raster
    from raquet_spark.plans.inspect import count_exchanges

    out = focal_map(tiles, meta, "slope")
    assert count_exchanges(out) == count_exchanges(tiles) + 1


def test_focal_with_missing_tile_matches_global(spark, raster):
    """A tile absent from the dataset behaves like a nodata region:
    neighbors get NaN halos there and the missing tile emits nothing —
    identical to running the kernel over the partial global mosaic."""
    tiles, meta = raster
    from raquet_spark.functions.quadbin import py_tile_to_cell

    dropped = py_tile_to_cell(17, 21, 6)
    kept = tiles.where(F.col("block") != dropped)
    got = focal_map(kept, meta, "slope", cellsize=1.0).collect()
    want, _ = _global(kept, meta, "slope")
    assert len(got) == 5
    assert dropped not in {r["block"] for r in got}
    for row in got:
        x, y, _ = py_cell_to_tile(row["block"])
        sub = want[(y - 20) * BS : (y - 19) * BS, (x - 16) * BS : (x - 15) * BS]
        np.testing.assert_array_equal(
            decode_block(row["band_1"], "float64").reshape(BS, BS), sub
        )


def test_focal_multiband_matches_per_band_single_shuffle(spark):
    """A multi-band focal call is byte-identical to n sequential
    single-band calls and still costs exactly ONE extra Exchange — the
    per-band strips ride the same halo-exchange rows."""
    from raquet_spark.plans.inspect import count_exchanges

    tiles, meta = make_synthetic_raster(
        spark, zoom=6, tiles_x=2, tiles_y=2, origin_x=16, origin_y=20,
        block_size=BS, num_bands=3, dtype="float32", nodata=-1.0,
        nodata_every=7,
    )
    bands = ["band_1", "band_2", "band_3"]
    multi = focal_map(tiles, meta, "mean", band=bands, radius=2)
    assert count_exchanges(multi) == count_exchanges(tiles) + 1
    got = {r["block"]: r for r in multi.collect()}
    for b in bands:
        single = {
            r["block"]: r
            for r in focal_map(tiles, meta, "mean", band=b, radius=2).collect()
        }
        assert single.keys() == got.keys()
        for blk in single:
            assert bytes(single[blk][b]) == bytes(got[blk][b]), (b, blk)
