"""Raster core: IO round-trip, tile stats vs numpy, pyramid, point query,
region stats. Mirrors the reference test strategy
(/root/reference/tests/test_geotiff2raquet.py) with synthetic rasters."""

from __future__ import annotations

import json
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from raquet_spark.core.metadata import parse_metadata
from raquet_spark.functions import quadbin as qb
from raquet_spark.functions.bands import decode_block, encode_block
from raquet_spark.operators.pyramid import build_pyramid
from raquet_spark.operators.point_query import raster_value
from raquet_spark.operators.region_stats import region_stats
from raquet_spark.operators.tile_stats import aggregate_band_stats, with_tile_stats
from raquet_spark.sources.raquet import (
    filter_blocks_bbox,
    read_raquet,
    read_raquet_metadata,
    write_raquet,
)
from raquet_spark.testing import make_synthetic_raster, synthetic_tile_array

ZOOM, TX, TY, NX, NY, BS = 6, 16, 20, 4, 4, 32


@pytest.fixture(scope="module")
def raster(spark):
    tiles, meta = make_synthetic_raster(
        spark, zoom=ZOOM, tiles_x=NX, tiles_y=NY, origin_x=TX, origin_y=TY,
        block_size=BS, num_bands=2, dtype="float32", nodata=-1.0, nodata_every=7,
    )
    return tiles.cache(), meta


def test_codec_roundtrip():
    for dtype in ["uint8", "int16", "uint16", "int32", "float32", "float64"]:
        arr = synthetic_tile_array(3, 5, 8, 16, 0, 42, dtype)
        for comp in ["gzip", None]:
            blob = encode_block(arr, dtype, comp)
            back = decode_block(blob, dtype)
            np.testing.assert_array_equal(arr, back)


def test_write_read_roundtrip(spark, raster, tmp_path):
    tiles, meta = raster
    path = str(tmp_path / "raster.parquet")
    write_raquet(tiles, path, meta)

    back_meta = read_raquet_metadata(spark, path)
    assert back_meta["file_format"] == "raquet"
    assert back_meta["tiling"]["num_blocks"] == NX * NY
    assert [b["name"] for b in back_meta["bands"]] == ["band_1", "band_2"]

    back = read_raquet(spark, path)
    assert back.count() == NX * NY
    # data identical after round trip
    row = back.where(
        F.col("block") == qb.py_tile_to_cell(TX, TY, ZOOM)
    ).collect()[0]
    expected = synthetic_tile_array(TX, TY, ZOOM, BS, 0, 42, "float32",
                                    nodata=-1.0, nodata_every=7)
    np.testing.assert_array_equal(decode_block(row["band_1"], "float32"), expected)


def test_tile_stats_match_numpy(spark, raster):
    tiles, meta = raster
    stats = with_tile_stats(tiles, meta)
    row = stats.where(F.col("block") == qb.py_tile_to_cell(TX + 1, TY + 2, ZOOM)).collect()[0]
    vals = synthetic_tile_array(TX + 1, TY + 2, ZOOM, BS, 0, 42, "float32",
                                nodata=-1.0, nodata_every=7)
    valid = vals[vals != -1.0].astype("f8")
    assert row["band_1_count"] == valid.size
    assert row["band_1_min"] == pytest.approx(valid.min())
    assert row["band_1_max"] == pytest.approx(valid.max())
    assert row["band_1_mean"] == pytest.approx(valid.mean())
    assert row["band_1_stddev"] == pytest.approx(valid.std())


def test_global_stats_exact(spark, raster):
    tiles, meta = raster
    stats = with_tile_stats(tiles, meta)
    g = aggregate_band_stats(stats, "band_1").collect()[0]
    # numpy oracle over the full raster
    all_vals = np.concatenate([
        synthetic_tile_array(TX + i, TY + j, ZOOM, BS, 0, 42, "float32",
                             nodata=-1.0, nodata_every=7)
        for i in range(NX) for j in range(NY)
    ])
    valid = all_vals[all_vals != -1.0].astype("f8")
    assert g["count"] == valid.size
    assert g["mean"] == pytest.approx(valid.mean())
    assert g["stddev"] == pytest.approx(valid.std(), rel=1e-9)


def test_pyramid_average(spark, raster):
    tiles, meta = raster
    pyr, meta2 = build_pyramid(tiles, meta, min_zoom=ZOOM - 2, resampling="average")
    by_zoom = {
        r["z"]: r["n"]
        for r in pyr.groupBy(F.expr(qb.cell_to_zoom_sql("block", "spark")).alias("z"))
        .agg(F.count("*").alias("n")).collect()
    }
    assert by_zoom == {ZOOM: 16, ZOOM - 1: 4, ZOOM - 2: 1}
    assert meta2["tiling"]["min_zoom"] == ZOOM - 2

    # verify one overview tile against a numpy oracle
    parent = qb.py_tile_to_cell(TX // 2, TY // 2, ZOOM - 1)
    row = pyr.where(F.col("block") == parent).collect()[0]
    got = decode_block(row["band_1"], "float32").reshape(BS, BS)
    mosaic = np.full((BS * 2, BS * 2), -1.0, dtype="f4")
    for dx in range(2):
        for dy in range(2):
            t = synthetic_tile_array(TX + dx, TY + dy, ZOOM, BS, 0, 42, "float32",
                                     nodata=-1.0, nodata_every=7).reshape(BS, BS)
            mosaic[dy * BS:(dy + 1) * BS, dx * BS:(dx + 1) * BS] = t
    q = mosaic.reshape(BS, 2, BS, 2).swapaxes(1, 2).reshape(BS, BS, 4).astype("f8")
    good = q != -1.0
    cnt = good.sum(axis=2)
    s = np.where(good, q, 0).sum(axis=2)
    want = np.where(cnt > 0, s / np.maximum(cnt, 1), -1.0).astype("f4")
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_point_query(spark, raster):
    tiles, meta = raster
    # center of tile (TX+1, TY+1): derive lon/lat from tile bounds
    w, s, e, n = qb.py_cell_to_bounds(qb.py_tile_to_cell(TX + 1, TY + 1, ZOOM))
    lon, lat = (w + e) / 2, (s + n) / 2
    pts = spark.createDataFrame([(1, lon, lat)], "id long, lon double, lat double")
    out = raster_value(tiles, pts, meta).collect()[0]
    # oracle: global pixel coords
    m = (1 << ZOOM) * BS
    xf = lon / 360.0 + 0.5
    sinlat = math.sin(math.radians(lat))
    yf = 0.5 - 0.25 * math.log((1 + sinlat) / (1 - sinlat)) / math.pi
    gx, gy = int(xf * m), int(yf * m)
    vals = synthetic_tile_array(TX + 1, TY + 1, ZOOM, BS, 0, 42, "float32",
                                nodata=-1.0, nodata_every=7).reshape(BS, BS)
    want = vals[gy % BS, gx % BS]
    if want == -1.0:
        assert out["value"] is None
    else:
        assert out["value"] == pytest.approx(float(want))


def test_region_stats_and_bbox_filter(spark, raster):
    tiles, meta = raster
    stats = with_tile_stats(tiles, meta)
    # bbox covering the single tile (TX, TY) (shrunk to interior)
    w, s, e, n = qb.py_cell_to_bounds(qb.py_tile_to_cell(TX, TY, ZOOM))
    dx, dy = (e - w) * 0.25, (n - s) * 0.25
    bbox = (w + dx, s + dy, e - dx, n - dy)
    sel = filter_blocks_bbox(stats, *bbox, ZOOM)
    assert sel.count() == 1
    g = region_stats(stats, meta, bbox, band="band_1").collect()[0]
    vals = synthetic_tile_array(TX, TY, ZOOM, BS, 0, 42, "float32",
                                nodata=-1.0, nodata_every=7)
    valid = vals[vals != -1.0].astype("f8")
    assert g["count"] == valid.size
    assert g["mean"] == pytest.approx(valid.mean())


def test_metadata_json_shape(raster):
    _, meta = raster
    s = json.dumps(meta)
    again = parse_metadata(s)
    assert again["tiling"]["block_width"] == BS
    assert again["bands"][0]["nodata"] == -1.0
    assert again["crs"] == "EPSG:3857"


def test_filter_blocks_bbox_coarse_refine(spark):
    """The bounded-driver-work path (coarse Morton ranges + codegen'd
    tile-coord refine) must select exactly the cells the exhaustive
    enumeration selects — at any max_cover_cells."""
    import pandas as pd

    from raquet_spark.functions import quadbin as qb
    from raquet_spark.sources.raquet import filter_blocks_bbox

    z = 10
    cells = [
        qb.py_tile_to_cell(x, y, z)
        for x in range(250, 300) for y in range(300, 340)
    ]
    df = spark.createDataFrame(pd.DataFrame({"block": cells}))
    # bbox spanning the interior of the tile patch (derived from tile
    # coords: lon is linear in x; lat is inverse-Mercator in y)
    import math

    def lon(x):
        return x / (1 << z) * 360.0 - 180.0

    def lat(y):
        return math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * y / (1 << z)))))

    bbox = (lon(255.5), lat(334.5), lon(294.5), lat(305.5))
    want = set(qb.py_bbox_to_cells(*bbox, z)) & set(cells)
    assert len(want) > 100
    for cap in (1, 16, 256, 10**6):
        got = {
            r["block"]
            for r in filter_blocks_bbox(df, *bbox, z, max_cover_cells=cap).collect()
        }
        assert got == want, cap


@pytest.mark.slow
def test_read_raquet_spatial_filters(spark, tmp_path):
    from raquet_spark.functions import quadbin as qb
    from raquet_spark.sources.raquet import read_raquet, write_raquet
    from raquet_spark.testing import make_synthetic_raster

    tiles, meta = make_synthetic_raster(
        spark, zoom=6, tiles_x=4, tiles_y=4, origin_x=16, origin_y=20,
        block_size=8,
    )
    path = str(tmp_path / "spatial.parquet")
    write_raquet(tiles, path, meta)

    blocks = {r["block"] for r in tiles.select("block").collect()}
    # point: exactly the covering tile
    w, s, e, n = qb.py_cell_to_bounds(qb.py_tile_to_cell(17, 21, 6))
    lon, lat = (w + e) / 2, (s + n) / 2
    got = read_raquet(spark, path, point=(lon, lat)).select("block").collect()
    assert {r["block"] for r in got} == {qb.py_tile_to_cell(17, 21, 6)}
    # bbox covering everything: all tiles
    got = read_raquet(spark, path, bbox=(-180, -80, 180, 80)).count()
    assert got == len(blocks)
    # polygon: subset via its bbox prune
    poly = [(lon, lat), (lon + 1e-6, lat), (lon, lat + 1e-6)]
    got = {r["block"] for r in
           read_raquet(spark, path, polygon=poly).select("block").collect()}
    assert qb.py_tile_to_cell(17, 21, 6) in got and got <= blocks


def test_golden_stats_vectors_reference_parity(spark):
    """Mirror of the reference's statistics golden vectors
    (/root/reference/tests/test_geotiff2raquet.py:23-66): pixels
    0..99 with nodata=0 -> count 99, min 1, max 99, mean 50, sum 4950,
    population stddev 28.577380332; NaNs excluded the same way."""
    import math

    import numpy as np
    import pandas as pd

    from raquet_spark.core.metadata import BandMeta, build_metadata
    from raquet_spark.functions.bands import encode_block
    from raquet_spark.operators.tile_stats import with_tile_stats

    meta = build_metadata(
        bands=[BandMeta(name="band_1", type="float64", nodata=0.0)],
        bounds=(0.0, 0.0, 1.0, 1.0), width=10, height=10,
        block_width=10, block_height=10, max_zoom=5,
    )
    vals = np.arange(100, dtype="f8")
    df = spark.createDataFrame(
        pd.DataFrame({"block": [33], "band_1": [encode_block(vals, "float64")]})
    )
    r = with_tile_stats(df, meta).collect()[0]
    assert r["band_1_count"] == 99
    assert r["band_1_min"] == 1 and r["band_1_max"] == 99
    assert r["band_1_mean"] == 50 and r["band_1_sum"] == 4950
    assert abs(r["band_1_stddev"] - 28.577380332) < 1e-6

    # NaN joins nodata in the excluded set (reference nan vector)
    vals2 = vals.copy()
    vals2[42] = math.nan
    df2 = spark.createDataFrame(
        pd.DataFrame({"block": [34], "band_1": [encode_block(vals2, "float64")]})
    )
    r2 = with_tile_stats(df2, meta).collect()[0]
    keep = vals2[(vals2 != 0) & np.isfinite(vals2)]
    assert r2["band_1_count"] == len(keep) == 98
    assert r2["band_1_mean"] == keep.mean()
    assert abs(r2["band_1_stddev"] - keep.std()) < 1e-9


def test_find_minzoom_reference_parity():
    """Golden vectors from the reference's test_find_minzoom
    (/root/reference/tests/test_geotiff2raquet.py:15-21): whole-world
    bounds at native zoom 8 with block zoom 6/7/8 -> 1/0/0."""
    from raquet_spark.core.metadata import find_minzoom

    world = (-180.0, -85.0511287798066, 180.0, 85.0511287798066)
    assert find_minzoom(world, 8, block_size=64) == 1
    assert find_minzoom(world, 8, block_size=128) == 0
    assert find_minzoom(world, 8, block_size=256) == 0


def test_read_raquet_over_http(spark, raster, tmp_path):
    """http(s) paths localize once per app (the reference's DuckDB-httpfs
    demo-file convenience); data and metadata match the local read."""
    import functools
    import http.server
    import threading

    from raquet_spark.sources.raquet import (
        read_raquet,
        read_raquet_metadata,
        write_raquet,
    )

    tiles, meta = raster
    path = str(tmp_path / "served.parquet")
    write_raquet(tiles, path, meta)
    # spark writes a part-file directory; published demo files are single
    # parquet files — merge to one for serving
    import pyarrow.parquet as pq

    single = str(tmp_path / "single.parquet")
    pq.write_table(pq.read_table(path), single)

    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=str(tmp_path)
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/single.parquet"
        remote_meta = read_raquet_metadata(spark, url)
        assert remote_meta["tiling"]["max_zoom"] == meta["tiling"]["max_zoom"]
        local = {r["block"] for r in read_raquet(spark, path).select("block").collect()}
        remote = {r["block"] for r in read_raquet(spark, url).select("block").collect()}
        assert remote == local
    finally:
        srv.shutdown()


def test_object_store_paths_pass_through_untouched(spark):
    """Contract pin for the 100 TB read path: s3a/gs/abfss/hdfs URIs go
    straight to spark.read.parquet (parallel, connector-managed) — the
    driver-localization convenience is for http(s) demo files ONLY. A
    cloud path must never be downloaded through urllib on the driver."""
    import pytest

    from raquet_spark.sources.raquet import _localize, read_raquet

    for scheme in ("s3a", "s3", "gs", "abfss", "wasbs", "hdfs"):
        uri = f"{scheme}://bucket/some/raster.parquet"
        assert _localize(spark, uri) == uri
    # end-to-end: the failure (no connector in-container) must come from
    # Spark's Hadoop FS layer resolving the scheme, not from an attempt
    # to localize or reinterpret the URI
    with pytest.raises(Exception) as exc:
        read_raquet(spark, "s3a://no-such-bucket/x.parquet").count()
    msg = str(exc.value)
    assert "s3a" in msg or "S3A" in msg or "FileSystem" in msg, msg[:400]
