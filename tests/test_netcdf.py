"""Classic-format NetCDF ingestion: header parse, record/fixed layout
decode, scale/offset/_FillValue, CF time through warp + tiling
(reference converts .nc via GDAL with CF time, cli.py:92)."""

from __future__ import annotations

import numpy as np
import pytest

from raquet_spark.sources.netcdf import (
    netcdf_pixel_table,
    netcdf_to_raquet,
    read_coord_var,
    read_netcdf_structure,
)
from raquet_spark.testing import write_netcdf_classic


def _grid(nt=3, nlat=40, nlon=60):
    lats = 37.9875 - 0.025 * np.arange(nlat)
    lons = -122.9875 + 0.025 * np.arange(nlon)
    gy, gx = np.mgrid[0:nlat, 0:nlon]
    data = np.stack(
        [((gx * 7 + gy * 11 + t * 13) % 199 - 50) for t in range(nt)]
    ).astype("<i2")
    data[(gx[None] + gy[None] + np.arange(nt)[:, None, None]) % 17 == 0] = -999
    return lats, lons, data


@pytest.mark.parametrize("record_time", [True, False])
def test_netcdf_structure_and_decode(spark, tmp_path, record_time):
    """Record-interleaved and fixed-dim time layouts decode to the same
    values, with scale/offset applied and fill masked in raw space."""
    lats, lons, data = _grid()
    path = str(tmp_path / f"t_{record_time}.nc")
    write_netcdf_classic(
        path, lats, lons, data, times=np.arange(3, dtype="f8"),
        nc_type=3, scale_factor=0.5, add_offset=100.0, fill_value=-999,
        record_time=record_time,
    )
    nc = read_netcdf_structure(path)
    assert nc["dims"]["lat"] == 40 and nc["dims"]["lon"] == 60
    assert nc["variables"]["value"]["record"] is record_time
    np.testing.assert_allclose(read_coord_var(nc, "time"), [0, 1, 2])
    np.testing.assert_allclose(read_coord_var(nc, "lat")[:2], lats[:2])

    pdf = netcdf_pixel_table(spark, nc, "value", rows_per_chunk=16).toPandas()
    assert len(pdf) == 3 * 40 * 60
    want = np.where(data == -999, -999, data).astype("f8") * 0.5 + 100.0
    got = (
        pdf.sort_values(["time_cf", "sy", "sx"])["band_1"]
        .to_numpy()
        .reshape(3, 40, 60)
    )
    np.testing.assert_array_equal(got, want)


def test_netcdf_to_raquet_time_tiles(spark, tmp_path):
    """Full conversion: (block, time_cf) keyed tiles, derived time_ts,
    cf: metadata, per-step stats tracking the source distribution."""
    from pyspark.sql import functions as F

    from raquet_spark.operators.time_dim import per_step_stats

    lats, lons, data = _grid()
    path = str(tmp_path / "t.nc")
    write_netcdf_classic(
        path, lats, lons, data, times=np.arange(3, dtype="f8"),
        time_units="hours since 1980-01-01 00:00:00",
        nc_type=3, scale_factor=0.5, add_offset=100.0, fill_value=-999,
    )
    tiles, meta = netcdf_to_raquet(spark, path, block_size=64)
    assert meta["time"]["cf:units"].startswith("hours since 1980-01-01")
    assert meta["time"]["count"] == 3
    assert meta["bands"][0]["nodata"] == -999 * 0.5 + 100.0

    rows = tiles.select("block", "time_cf", "time_ts").collect()
    per_block = {}
    for r in rows:
        per_block.setdefault(r["block"], set()).add(
            (r["time_cf"], str(r["time_ts"]))
        )
    # every tile carries all three steps with the CF-derived timestamps
    for steps in per_block.values():
        assert steps == {
            (0.0, "1980-01-01 00:00:00"),
            (1.0, "1980-01-01 01:00:00"),
            (2.0, "1980-01-01 02:00:00"),
        }

    # warped per-step means track the source (nearest warp only copies)
    src_means = {
        t: float(np.mean(np.where(data[t] == -999, np.nan, data[t] * 0.5 + 100.0)[
            ~np.isnan(np.where(data[t] == -999, np.nan, data[t]))
        ]))
        for t in range(3)
    }
    g = {r["time_cf"]: r for r in per_step_stats(tiles, "band_1").collect()}
    for t in range(3):
        assert g[float(t)]["count"] > 0
        assert abs(g[float(t)]["mean"] - src_means[t]) / src_means[t] < 0.02


def test_netcdf_no_time(spark, tmp_path):
    """2-D variable (no time dim) converts to plain (block, bands) tiles."""
    lats, lons, data = _grid(nt=1)
    path = str(tmp_path / "static.nc")
    write_netcdf_classic(
        path, lats, lons, data[0], nc_type=3,
        scale_factor=0.5, add_offset=100.0, fill_value=-999,
    )
    tiles, meta = netcdf_to_raquet(spark, path, block_size=64)
    assert "time" not in meta
    assert "time_cf" not in tiles.columns
    assert tiles.count() > 0


def test_netcdf_float_var_no_scaling(spark, tmp_path):
    """float32 variable without scale/offset keeps its native dtype."""
    lats, lons, _ = _grid(nt=1)
    gy, gx = np.mgrid[0:40, 0:60]
    data = (np.sin(gx / 10.0) + np.cos(gy / 10.0)).astype("<f4")
    path = str(tmp_path / "f.nc")
    write_netcdf_classic(path, lats, lons, data, nc_type=5)
    nc = read_netcdf_structure(path)
    pdf = netcdf_pixel_table(spark, nc, "value").toPandas()
    got = pdf.sort_values(["sy", "sx"])["band_1"].to_numpy().reshape(40, 60)
    np.testing.assert_allclose(got, data.astype("f8"), rtol=1e-6)
    _, meta = netcdf_to_raquet(spark, path, block_size=64, stats=False)
    assert meta["bands"][0]["type"] == "float32"


def test_netcdf_bilinear_time(spark, tmp_path):
    """Bilinear NetCDF import with a time dimension: every step blends
    through the same gather join (time_cf is a blend group key), and
    per-step means track the source per-step means."""
    from pyspark.sql import functions as F

    from raquet_spark.operators.time_dim import per_step_stats

    lats, lons, data = _grid()
    path = str(tmp_path / "bl.nc")
    write_netcdf_classic(
        path, lats, lons, data, times=np.arange(3, dtype="f8"),
        nc_type=3, scale_factor=0.5, add_offset=100.0, fill_value=-999,
    )
    tiles, meta = netcdf_to_raquet(
        spark, path, block_size=64, resampling="bilinear"
    )
    g = {r["time_cf"]: r for r in per_step_stats(tiles, "band_1").collect()}
    assert set(g) == {0.0, 1.0, 2.0}
    for t in range(3):
        vals = np.where(data[t] == -999, np.nan, data[t] * 0.5 + 100.0)
        src_mean = float(np.nanmean(vals))
        assert g[float(t)]["count"] > 0
        assert abs(g[float(t)]["mean"] - src_mean) / src_mean < 0.02


def test_netcdf_cdf5_wide_format(spark, tmp_path):
    """CDF-5 (pnetcdf 64-bit data): 64-bit NON_NEG sizes/offsets parse
    and decode identically to CDF-1, including a CDF-5-only unsigned
    dtype (NC_USHORT) with scale/offset and fill."""
    lats, lons, _ = _grid()
    gy, gx = np.mgrid[0:40, 0:60]
    data = np.stack(
        [((gx * 7 + gy * 11 + t * 13) % 199).astype(">u2") for t in range(3)]
    )
    data[(gx[None] + gy[None] + np.arange(3)[:, None, None]) % 17 == 0] = 999
    path = str(tmp_path / "wide.nc")
    write_netcdf_classic(
        path, lats, lons, data, times=np.arange(3, dtype="f8"),
        nc_type=8, scale_factor=0.25, add_offset=10.0, fill_value=999,
        version=5,
    )
    with open(path, "rb") as f:
        assert f.read(4) == b"CDF\x05"
    nc = read_netcdf_structure(path)
    assert nc["version"] == 5 and nc["dims"]["lat"] == 40
    assert nc["variables"]["value"]["dtype"] == ">u2"
    pdf = netcdf_pixel_table(spark, nc, "value").toPandas()
    assert len(pdf) == 3 * 40 * 60
    want = data.astype("f8") * 0.25 + 10.0
    got = (
        pdf.sort_values(["time_cf", "sy", "sx"])["band_1"]
        .to_numpy()
        .reshape(3, 40, 60)
    )
    np.testing.assert_array_equal(got, want)


def test_netcdf_cdf5_fixed_time_to_raquet(spark, tmp_path):
    """CDF-5 with a fixed (non-record) time dim runs the whole
    netcdf_to_raquet conversion."""
    lats, lons, data = _grid()
    path = str(tmp_path / "wide2.nc")
    write_netcdf_classic(
        path, lats, lons, data, times=np.arange(3, dtype="f8"),
        nc_type=3, scale_factor=0.5, add_offset=100.0, fill_value=-999,
        record_time=False, version=5,
    )
    tiles, meta = netcdf_to_raquet(spark, path, block_size=64, stats=False)
    assert meta["time"]["count"] == 3
    assert tiles.count() > 0
