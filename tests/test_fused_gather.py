"""Fused separable gather (r18): the join-free nearest-warp import
(`tiff_reader._fused_gather_tiles`) must be BYTE-IDENTICAL to the
`_resampled_pixels(near) → from_pixel_table(aligned=True)` join path it
replaces for the separable broadcast class — same JVM-floored source
indices (the index job runs the same expressions in the same engine),
same verbatim value copies, same fill/astype/encode semantics. Each
case runs the importer twice: once as shipped (fused) and once with the
eligibility gate monkeypatched off (join path), then compares every
row's bytes."""

from __future__ import annotations

import numpy as np
import pytest

import raquet_spark.sources.tiff_reader as tr


def _rows(df, sort_cols):
    pdf = df.toPandas().sort_values(sort_cols).reset_index(drop=True)
    out = []
    for rec in pdf.to_dict("records"):
        out.append(
            tuple(
                bytes(v) if isinstance(v, (bytes, bytearray)) else v
                for v in rec.values()
            )
        )
    return list(pdf.columns), out


def _assert_identical(mk, sort_cols, monkeypatch):
    # spy: the "new" leg must actually take the fused path (a silently
    # disabled gate would compare the join path against itself)
    calls = []
    real_fused = tr._fused_gather_tiles

    def spy(*a, **k):
        calls.append(1)
        return real_fused(*a, **k)

    monkeypatch.setattr(tr, "_fused_gather_tiles", spy)
    new_df, _ = mk()
    cols_new, rows_new = _rows(new_df, sort_cols)
    assert calls, "fused gather did not engage for this case"
    monkeypatch.setattr(tr, "_fused_gather_eligible", lambda *a, **k: False)
    old_df, _ = mk()
    cols_old, rows_old = _rows(old_df, sort_cols)
    monkeypatch.undo()
    assert cols_new == cols_old
    assert len(rows_new) == len(rows_old)
    for rn, ro in zip(rows_new, rows_old):
        assert rn == ro


def test_fused_gather_matches_join_path_netcdf(spark, tmp_path, monkeypatch):
    """Scaled int16 NetCDF with 3 time steps (the bench's
    netcdf_import_3step shape at 1/4 size): float32 tiles, time_cf
    extra key."""
    from raquet_spark.sources.netcdf import netcdf_to_raquet
    from raquet_spark.testing import write_netcdf_classic

    nlat, nlon, nt = 150, 200, 3
    gy, gx = np.mgrid[0:nlat, 0:nlon]
    data = np.stack(
        [((gx * 7 + gy * 11 + t * 13) % 199 - 50) for t in range(nt)]
    ).astype("<i2")
    path = str(tmp_path / "fused.nc")
    write_netcdf_classic(
        path,
        37.9875 - 0.01 * np.arange(nlat),
        -123.0 + 0.01 * np.arange(nlon),
        data,
        times=np.arange(nt, dtype="f8"),
        nc_type=3, scale_factor=0.5, add_offset=100.0, fill_value=-999,
    )
    _assert_identical(
        lambda: netcdf_to_raquet(spark, path, block_size=64, stats=True),
        ["block", "time_cf"],
        monkeypatch,
    )


def test_fused_gather_matches_join_path_n37(spark, monkeypatch):
    """Real GeoTIFF (int16, EPSG 4326, bottom-up transform) through the
    dense+stats defaults — the geotiff_import_n37 bench line."""
    import os

    n37 = "/root/reference/tests/n37_w123_1arc_v2.tif"
    if not os.path.exists(n37):
        pytest.skip("reference GeoTIFF not present")
    _assert_identical(
        lambda: tr.geotiff_to_raquet(spark, n37, block_size=128),
        ["block"],
        monkeypatch,
    )


def test_fused_gather_matches_join_path_grib2(spark, tmp_path, monkeypatch):
    """Regular lat/lon GRIB2, 2 forecast steps, bitmap-missing points
    (absent source rows must read as nodata fill both ways)."""
    from raquet_spark.sources.grib2 import grib2_to_raquet
    from raquet_spark.testing_grib2 import write_grib2

    nj, ni = 24, 36
    gy, gx = np.mgrid[0:nj, 0:ni]
    fields = []
    for t in range(2):
        data = ((gx * 7 + gy * 11 + t * 13) % 199 - 50).astype("f8")
        mask = (gx + gy + t) % 17 == 0
        fields.append({
            "data": np.where(mask, np.nan, data),
            "forecast_time": t * 3,
            "param": (0, 0),
        })
    path = str(tmp_path / "fused.grib2")
    write_grib2(path, fields, lat1=52.0, lon1=4.0, di=0.25, dj=0.25)
    _assert_identical(
        lambda: grib2_to_raquet(spark, path, block_size=64),
        ["block", "time_cf"],
        monkeypatch,
    )


def test_fused_gather_matches_join_path_gaussian(spark, tmp_path, monkeypatch):
    """Gaussian (irregular-lat) grid: the fused syn vector comes from
    the shared driver-side interp, the join path from the broadcast
    rowmap — same doubles, same floors."""
    from raquet_spark.sources.grib2 import grib2_to_raquet
    from raquet_spark.testing_grib2 import write_grib2

    n_par, ni = 12, 48
    nj = 2 * n_par
    gy, gx = np.mgrid[0:nj, 0:ni]
    data = (gy * 100 + gx).astype("f8")
    path = str(tmp_path / "fused_gauss.grib2")
    write_grib2(
        path, [{"data": data, "forecast_time": 0}],
        lon1=0.0, di=360.0 / ni,
        grid={"type": "gauss", "n": n_par},
    )
    _assert_identical(
        lambda: grib2_to_raquet(spark, path, block_size=64, zoom=3),
        ["block"],
        monkeypatch,
    )


def test_fused_kernel_matches_join_path_n37_bilinear(spark, monkeypatch):
    """Bilinear on the real int16 GeoTIFF (the geotiff_import_n37_bilinear
    bench line): the fused numpy blend must be byte-identical to the
    join path's SQL blend — same JVM fs doubles, same (kx, ky)
    accumulation order with invalid terms skipped, same HALF_UP
    round() for the integer band, same dense fill."""
    import os

    n37 = "/root/reference/tests/n37_w123_1arc_v2.tif"
    if not os.path.exists(n37):
        pytest.skip("reference GeoTIFF not present")
    _assert_identical(
        lambda: tr.geotiff_to_raquet(
            spark, n37, block_size=128, resampling="bilinear"
        ),
        ["block"],
        monkeypatch,
    )


def test_fused_kernel_matches_join_path_n37_cubic(spark, monkeypatch):
    """Cubic (4×4 neighborhood, negative lobes) on the real int16
    GeoTIFF — the piecewise kernel polynomial must match _kernel_sql
    op-for-op."""
    import os

    n37 = "/root/reference/tests/n37_w123_1arc_v2.tif"
    if not os.path.exists(n37):
        pytest.skip("reference GeoTIFF not present")
    _assert_identical(
        lambda: tr.geotiff_to_raquet(
            spark, n37, block_size=128, resampling="cubic"
        ),
        ["block"],
        monkeypatch,
    )


def test_fused_kernel_matches_join_path_netcdf_bilinear(
    spark, tmp_path, monkeypatch
):
    """Scaled int16 NetCDF, 3 time steps, bilinear: float64 unpacked
    values blend per step (grids keep the px-table dtype — the blend
    sees the pre-narrowing doubles, exactly like the join path)."""
    from raquet_spark.sources.netcdf import netcdf_to_raquet
    from raquet_spark.testing import write_netcdf_classic

    nlat, nlon, nt = 150, 200, 3
    gy, gx = np.mgrid[0:nlat, 0:nlon]
    data = np.stack(
        [((gx * 7 + gy * 11 + t * 13) % 199 - 50) for t in range(nt)]
    ).astype("<i2")
    path = str(tmp_path / "kfused.nc")
    write_netcdf_classic(
        path,
        37.9875 - 0.01 * np.arange(nlat),
        -123.0 + 0.01 * np.arange(nlon),
        data,
        times=np.arange(nt, dtype="f8"),
        nc_type=3, scale_factor=0.5, add_offset=100.0, fill_value=-999,
    )
    _assert_identical(
        lambda: netcdf_to_raquet(
            spark, path, block_size=64, stats=True, resampling="bilinear"
        ),
        ["block", "time_cf"],
        monkeypatch,
    )


def test_fused_kernel_matches_join_path_grib2_cubic(
    spark, tmp_path, monkeypatch
):
    """GRIB2 with bitmap-missing points, 2 steps, cubic: nodata-valued
    cells drop out of the blend with renormalization both ways, and a
    (tile, step) with zero valid pixels is absent both ways."""
    from raquet_spark.sources.grib2 import grib2_to_raquet
    from raquet_spark.testing_grib2 import write_grib2

    nj, ni = 24, 36
    gy, gx = np.mgrid[0:nj, 0:ni]
    fields = []
    for t in range(2):
        data = ((gx * 7 + gy * 11 + t * 13) % 199 - 50).astype("f8")
        mask = (gx + gy + t) % 17 == 0
        fields.append({
            "data": np.where(mask, np.nan, data),
            "forecast_time": t * 3,
            "param": (0, 0),
        })
    path = str(tmp_path / "kfused.grib2")
    write_grib2(path, fields, lat1=52.0, lon1=4.0, di=0.25, dj=0.25)
    _assert_identical(
        lambda: grib2_to_raquet(spark, path, block_size=64,
                                resampling="cubic"),
        ["block", "time_cf"],
        monkeypatch,
    )


def test_fused_kernel_matches_join_path_gaussian_bilinear(
    spark, tmp_path, monkeypatch
):
    """Gaussian (irregular-lat) grid, bilinear: the fused fsy comes
    from the shared driver-side interp — same doubles the join path's
    rowmap floors and weights."""
    from raquet_spark.sources.grib2 import grib2_to_raquet
    from raquet_spark.testing_grib2 import write_grib2

    n_par, ni = 12, 48
    nj = 2 * n_par
    gy, gx = np.mgrid[0:nj, 0:ni]
    data = (gy * 100 + gx).astype("f8")
    path = str(tmp_path / "kfused_gauss.grib2")
    write_grib2(
        path, [{"data": data, "forecast_time": 0}],
        lon1=0.0, di=360.0 / ni,
        grid={"type": "gauss", "n": n_par},
    )
    _assert_identical(
        lambda: grib2_to_raquet(spark, path, block_size=64, zoom=3,
                                resampling="bilinear"),
        ["block"],
        monkeypatch,
    )


def test_round_half_up_matches_spark_round(spark):
    """_round_half_up_spark vs the engine's round(double): exact ties,
    negatives, near-tie doubles on both sides, zeros, large magnitudes,
    NaN/inf — the battery the integer-band blend feeds through it."""
    vals = [
        0.5, 1.5, 2.5, -0.5, -1.5, -2.5, 0.49999999999999994,
        -0.49999999999999994, 1.4999999999999998, 1.5000000000000002,
        123.49999999999999, -123.49999999999999, 0.0, -0.0,
        32766.5, -32766.5, 2.675, -2.675, 1e15 + 0.5, -(1e15 + 0.5),
        4503599627370495.5, 0.1 + 0.2 + 0.2, 7.0, -7.0,
        float("nan"), float("inf"), float("-inf"),
    ]
    sdf = spark.createDataFrame([(v,) for v in vals], "v double")
    got_spark = [
        r["r"] for r in sdf.selectExpr("round(v) AS r").collect()
    ]
    got_np = tr._round_half_up_spark(np.array(vals, dtype="float64"))
    for v, s, n in zip(vals, got_spark, got_np):
        if s != s:  # NaN
            assert n != n, v
        else:
            assert s == n, (v, s, n)


def test_fused_gate_excludes_non_separable():
    """Rotated transforms, staggered rows, ragged rows, projected CRS
    and SHJ-class sources must keep the join path. near/bilinear/cubic
    are the separable resamplings (r18 session 4); aggregation kernels
    keep their own forward path."""
    base = {
        "transform": (-120.0, 0.01, 0.0, 40.0, 0.0, -0.01),
        "width": 100, "height": 100, "n_bands": 1, "dtype": "int16",
        "epsg": 4326,
    }
    assert tr._fused_gather_eligible(base, "near")
    assert tr._fused_gather_eligible(base, "bilinear")
    assert tr._fused_gather_eligible(base, "cubic")
    assert not tr._fused_gather_eligible(base, "average")
    assert not tr._fused_gather_eligible(base, "mode")
    assert not tr._fused_gather_eligible(
        {**base, "transform": (-120.0, 0.01, 1e-5, 40.0, 0.0, -0.01)},
        "near",
    )
    assert not tr._fused_gather_eligible(
        {**base, "transform": (-120.0, 0.01, 1e-5, 40.0, 0.0, -0.01)},
        "bilinear",
    )
    assert not tr._fused_gather_eligible({**base, "epsg": 32610}, "near")
    assert not tr._fused_gather_eligible(
        {**base, "stagger_x": (0.5, 0.0)}, "near"
    )
    assert not tr._fused_gather_eligible(
        {**base, "row_ni": [10] * 100}, "near"
    )
    # past the broadcast class (raw bytes × steps > ~100 MB): join path
    big = {**base, "width": 12000, "height": 12000, "dtype": "float64"}
    assert not tr._fused_gather_eligible(big, "near")
    assert not tr._fused_gather_eligible(base, "near", n_steps=10_000)
