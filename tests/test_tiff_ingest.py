"""Real GeoTIFF ingestion against the reference's own test rasters
(/root/reference/tests/*.tif — read-only inputs): structure parse,
distributed strip/tile decode (deflate + palette + multiband), and the
forward-map nearest-neighbor warp onto the RaQuet mercator grid."""

from __future__ import annotations

import os

import numpy as np
import pytest

from pyspark.sql import functions as F

from raquet_spark.sources.tiff_reader import (
    geotiff_to_raquet,
    read_tiff_structure,
    tiff_pixel_table,
)

REF = "/root/reference/tests"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference test rasters not available"
)


def test_structure_all_reference_tiffs():
    expected = {
        "Milton_2024-excerpt.tiff": (118, 75, "float64", 1, 4326),
        "big-world.tif": (1356, 668, "uint8", 4, 4326),
        "civ.tif": (720, 360, "float32", 1, 4326),
        "colored.tif": (512, 768, "uint8", 1, 3857),
        "geotiff-discreteloss_2023.tif": (728, 565, "uint8", 1, 4326),
        "n37_w123_1arc_v2.tif": (329, 354, "int16", 1, 4326),
    }
    for name, (w, h, dt, nb, epsg) in expected.items():
        i = read_tiff_structure(f"{REF}/{name}")
        assert (i["width"], i["height"]) == (w, h), name
        assert np.dtype(i["dtype"]) == np.dtype(dt), name
        assert i["n_bands"] == nb and i["epsg"] == epsg, name


def test_decode_deflate_strips(spark):
    # civ.tif: zlib-compressed float32 strips, full global 0.5deg grid
    info = read_tiff_structure(f"{REF}/civ.tif")
    px = tiff_pixel_table(spark, info)
    assert px.count() == 720 * 360
    valid = px.where(f"band_1 != {info['nodata']}")
    row = valid.agg(
        F.min("band_1"), F.max("band_1"), F.count("band_1")
    ).first()
    assert row[2] > 0 and np.isfinite(row[0]) and np.isfinite(row[1])


def test_decode_tiled_palette(spark):
    # colored.tif: tiled layout + 256-entry palette, EPSG:3857
    info = read_tiff_structure(f"{REF}/colored.tif")
    assert info["tiled"] and info["palette"] is not None
    px = tiff_pixel_table(spark, info)
    assert px.count() == 512 * 768
    # palette indices stay raw
    mx = px.agg(F.max("band_1")).first()[0]
    assert 0 <= mx <= 255


def test_decode_multiband_and_float64(spark):
    info = read_tiff_structure(f"{REF}/big-world.tif")
    px = tiff_pixel_table(spark, info)
    assert set(px.columns) == {"sx", "sy", "band_1", "band_2", "band_3", "band_4"}
    assert px.count() == 1356 * 668

    info2 = read_tiff_structure(f"{REF}/Milton_2024-excerpt.tiff")
    assert tiff_pixel_table(spark, info2).count() == 118 * 75


def test_unsupported_crs_raises(spark):
    # NLCD is Albers (user-defined EPSG) — decode works, warp refuses
    info = read_tiff_structure(f"{REF}/Annual_NLCD_LndCov_2023_CU_C1V0.tif")
    assert tiff_pixel_table(spark, info).count() == 470 * 672
    with pytest.raises(NotImplementedError, match="CRS"):
        geotiff_to_raquet(spark, f"{REF}/Annual_NLCD_LndCov_2023_CU_C1V0.tif")


def test_warp_n37_dem_to_raquet(spark, tmp_path):
    """The reference's own DEM excerpt through the full convert path:
    warp → tile → stats → write → validate."""
    from raquet_spark.sources.raquet import write_raquet
    from raquet_spark.sources.validate import validate_raquet

    path = f"{REF}/n37_w123_1arc_v2.tif"
    tiles, meta = geotiff_to_raquet(spark, path, block_size=128)
    out = str(tmp_path / "n37.parquet")
    write_raquet(tiles, out, meta)
    res = validate_raquet(spark, out, check_band_data=True)
    assert res.is_valid, res.errors

    # value-level parity: the nearest-neighbor warp only copies source
    # samples, so warped stats must track the source distribution
    info = read_tiff_structure(path)
    src = tiff_pixel_table(spark, info).where(f"band_1 != {info['nodata']}")
    s = src.agg(
        F.min("band_1"), F.max("band_1"), F.avg("band_1"), F.count("band_1")
    ).first()

    stats_cols = [c for c in tiles.columns if c.startswith("band_1_")]
    assert stats_cols, "tile stats missing"
    g = tiles.agg(
        F.min("band_1_min"), F.max("band_1_max"),
        (F.sum("band_1_sum") / F.sum("band_1_count")).alias("mean"),
        F.sum("band_1_count"),
    ).first()
    assert g[0] >= s[0] and g[1] <= s[1]  # warped values ⊆ source range
    assert g[3] >= s[3] * 0.95  # target at least as fine → no mass lost
    assert abs(g[2] - s[2]) / abs(s[2]) < 0.05

    # bounds recorded in WGS84, around the Golden Gate excerpt
    w, s_, e, n = meta["bounds"]
    assert -123 < w < e < -122 and 37.5 < s_ < n < 38.0


def test_warp_discreteloss_uint8(spark):
    tiles, meta = geotiff_to_raquet(
        spark, f"{REF}/geotiff-discreteloss_2023.tif", block_size=256
    )
    n_tiles = tiles.where("block != 0").count()
    assert n_tiles > 0
    # uint8 with nodata 0: every stored pixel in range
    g = tiles.agg(F.min("band_1_min"), F.max("band_1_max")).first()
    assert 0 <= g[0] <= g[1] <= 255
    assert meta["bands"][0]["type"] == "uint8"
