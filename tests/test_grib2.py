"""GRIB2 ingestion (sources/grib2.py) against the fixture writer
(testing_grib2.py — spec-conformant edition-2 messages): simple
packing exactness, bitmap missing points, scan directions, signed
scale factors, multi-message time steps, typed gates, and the
to-raquet conversion path."""

from __future__ import annotations

import numpy as np
import pytest

from raquet_spark.sources.grib2 import (
    decode_message,
    grib2_pixel_table,
    grib2_to_raquet,
    read_grib2_structure,
)
from raquet_spark.testing_grib2 import write_grib2


def _field(nt, nj, ni, t):
    gy, gx = np.mgrid[0:nj, 0:ni]
    return ((gx * 7 + gy * 11 + t * 13) % 199 - 50).astype("f8")


def test_structure_and_exact_values(tmp_path):
    nj, ni = 20, 30
    fields = [
        {"data": _field(1, nj, ni, t), "forecast_time": t * 6,
         "param": (0, 0)}
        for t in range(3)
    ]
    path = str(tmp_path / "t.grib2")
    write_grib2(path, fields, lat1=49.0, lon1=0.0, di=0.5, dj=0.5)
    g = read_grib2_structure(path)
    assert len(g["messages"]) == 3
    m = g["messages"][0]
    assert (m["ni"], m["nj"]) == (ni, nj)
    assert m["lat1"] == pytest.approx(49.0) and m["di"] == pytest.approx(0.5)
    assert m["E"] == 0 and m["D"] == 0
    # integer data at E=D=0 round-trips EXACTLY (R = min, X = offsets)
    from raquet_spark.sources.io import range_reader

    rd = range_reader(path)
    for t, msg in enumerate(g["messages"]):
        got = decode_message(
            rd(msg["data_off"], msg["data_len"]), msg, None
        )
        np.testing.assert_array_equal(got, _field(1, nj, ni, t))


def test_bitmap_missing_and_j_positive(tmp_path):
    nj, ni = 16, 16
    data = _field(1, nj, ni, 0)
    data[(np.mgrid[0:nj, 0:ni][0] + np.mgrid[0:nj, 0:ni][1]) % 7 == 0] = (
        np.nan
    )
    for jp in (False, True):
        path = str(tmp_path / f"bm_{jp}.grib2")
        write_grib2(
            path, [{"data": data, "forecast_time": 0, "param": (0, 2)}],
            j_positive=jp,
        )
        g = read_grib2_structure(path)
        m = g["messages"][0]
        assert m["bitmap_off"] is not None
        assert m["j_positive"] is jp
        from raquet_spark.sources.io import range_reader

        rd = range_reader(path)
        got = decode_message(
            rd(m["data_off"], m["data_len"]), m,
            rd(m["bitmap_off"], m["bitmap_len"]),
        )
        np.testing.assert_array_equal(
            np.isnan(got), np.isnan(data)
        )
        np.testing.assert_array_equal(
            got[~np.isnan(data)], data[~np.isnan(data)]
        )


def test_scale_factors(tmp_path):
    """Non-zero D and E: Y = (R + X*2^E)/10^D reproduces tenths-valued
    data exactly with D=1."""
    nj, ni = 8, 8
    data = (_field(1, nj, ni, 0) / 10.0)  # tenths
    path = str(tmp_path / "scale.grib2")
    write_grib2(
        path, [{"data": data, "forecast_time": 0, "param": (0, 0),
                "D": 1, "E": 0}],
    )
    g = read_grib2_structure(path)
    m = g["messages"][0]
    assert m["D"] == 1
    from raquet_spark.sources.io import range_reader

    rd = range_reader(path)
    got = decode_message(rd(m["data_off"], m["data_len"]), m, None)
    np.testing.assert_allclose(got, data, atol=1e-9)


def test_pixel_table_and_param_filter(spark, tmp_path):
    nj, ni = 12, 18
    fields = [
        {"data": _field(1, nj, ni, t), "forecast_time": t, "param": (0, 0)}
        for t in range(2)
    ] + [
        {"data": _field(1, nj, ni, 9), "forecast_time": 0, "param": (2, 5)}
    ]
    path = str(tmp_path / "multi.grib2")
    write_grib2(path, fields)
    g = read_grib2_structure(path)
    pdf = grib2_pixel_table(spark, g).toPandas()
    assert len(pdf) == 2 * nj * ni  # default param = first message's
    got = (
        pdf.sort_values(["time_cf", "sy", "sx"])["band_1"]
        .to_numpy().reshape(2, nj, ni)
    )
    np.testing.assert_array_equal(got[0], _field(1, nj, ni, 0))
    np.testing.assert_array_equal(got[1], _field(1, nj, ni, 1))
    other = grib2_pixel_table(spark, g, param=(2, 5)).toPandas()
    assert len(other) == nj * ni


def test_typed_gates(tmp_path):
    import struct

    nj, ni = 4, 4
    path = str(tmp_path / "g.grib2")
    write_grib2(
        path, [{"data": _field(1, nj, ni, 0), "forecast_time": 0}]
    )
    raw = bytearray(open(path, "rb").read())

    def patched(mutate):
        b = bytearray(raw)
        mutate(b)
        p2 = str(tmp_path / "mut.grib2")
        open(p2, "wb").write(bytes(b))
        return p2

    # edition
    with pytest.raises(NotImplementedError, match="edition"):
        read_grib2_structure(patched(lambda b: b.__setitem__(7, 1)))

    # find section offsets in the original
    g = read_grib2_structure(path)

    def sec_off(num):
        p = 16
        while True:
            (ln,) = struct.unpack_from(">I", raw, p)
            if raw[p + 4] == num:
                return p
            p += ln

    s3, s5 = sec_off(3), sec_off(5)
    with pytest.raises(NotImplementedError, match="grid definition"):
        read_grib2_structure(
            patched(lambda b: b.__setitem__(slice(s3 + 12, s3 + 14),
                                            struct.pack(">H", 90)))
        )
    with pytest.raises(NotImplementedError, match="JPEG2000"):
        read_grib2_structure(
            patched(lambda b: b.__setitem__(slice(s5 + 9, s5 + 11),
                                            struct.pack(">H", 40)))
        )
    with pytest.raises(NotImplementedError, match="5.1"):
        read_grib2_structure(
            patched(lambda b: b.__setitem__(slice(s5 + 9, s5 + 11),
                                            struct.pack(">H", 1)))
        )
    with pytest.raises(NotImplementedError, match="boustrophedon"):
        read_grib2_structure(
            patched(lambda b: b.__setitem__(s3 + 14 + 57,
                                            raw[s3 + 14 + 57] | 0b00010000))
        )


def test_grib2_to_raquet(spark, tmp_path):
    """Conversion path: tiles land on the mercator grid with per-step
    stats; per-step pixel means match the source (nearest warp)."""
    nj, ni = 24, 36
    fields = [
        {"data": _field(1, nj, ni, t), "forecast_time": t * 3,
         "param": (0, 0)}
        for t in range(2)
    ]
    path = str(tmp_path / "conv.grib2")
    write_grib2(path, fields, lat1=52.0, lon1=4.0, di=0.25, dj=0.25)
    tiles, meta = grib2_to_raquet(
        spark, path, block_size=64, compression=None
    )
    assert meta["time"]["count"] == 2
    rows = tiles.where("block > 0").collect()
    assert rows
    steps = {r["time_cf"] for r in rows}
    assert steps == {0.0, 3.0}
    # nearest-resampled means stay close to the source mean per step
    from raquet_spark.operators.time_dim import per_step_stats

    g = {r["time_cf"]: r for r in per_step_stats(tiles, "band_1").collect()}
    for t in range(2):
        src = _field(1, nj, ni, t)
        src_mean = float(src.mean())
        assert abs(g[float(t * 3)]["mean"] - src_mean) < max(
            2.0, abs(src_mean) * 0.1
        )


def test_grib2_over_http(spark, tmp_path):
    """The GRIB2 importer rides the byte-range seam: remote == local."""
    import http.server
    import threading

    from tests.test_remote_io import _RangeHandler

    nj, ni = 10, 10
    path = str(tmp_path / "h.grib2")
    write_grib2(
        path, [{"data": _field(1, nj, ni, 0), "forecast_time": 0}]
    )
    handler = type(
        "H", (_RangeHandler,),
        {"stats": {"requests": 0, "ranged": 0, "bytes": 0}},
    )

    def factory(*a, **kw):
        return handler(*a, directory=str(tmp_path), **kw)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), factory)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/h.grib2"
        want = grib2_pixel_table(
            spark, read_grib2_structure(path)
        ).toPandas().sort_values(["sy", "sx"]).reset_index(drop=True)
        got = grib2_pixel_table(
            spark, read_grib2_structure(url)
        ).toPandas().sort_values(["sy", "sx"]).reset_index(drop=True)
        assert (got["band_1"] == want["band_1"]).all()
    finally:
        srv.shutdown()


@pytest.mark.parametrize(
    "packing,order", [("complex", 0), ("complex_diff", 1), ("complex_diff", 2)]
)
def test_complex_packing_exact(tmp_path, packing, order):
    """Templates 5.2/5.3 (what real GFS archives use): group-split
    values (+ first/second-order spatial differencing) reconstruct the
    integer field exactly, including width-0 constant groups and a
    ragged last group."""
    nj, ni = 20, 30
    data = _field(1, nj, ni, 0)
    data[5:8, :] = 42.0  # constant run -> width-0 groups
    path = str(tmp_path / f"cx_{packing}_{order}.grib2")
    write_grib2(
        path,
        [{"data": data, "forecast_time": 0, "param": (0, 0),
          "packing": packing, "sd_order": order, "group_len": 17}],
    )
    g = read_grib2_structure(path)
    m = g["messages"][0]
    assert m["drt"] == (3 if packing == "complex_diff" else 2)
    if packing == "complex_diff":
        assert m["sd_order"] == order
    from raquet_spark.sources.io import range_reader

    rd = range_reader(path)
    got = decode_message(rd(m["data_off"], m["data_len"]), m, None)
    np.testing.assert_array_equal(got, data)


def test_complex_packing_with_bitmap(tmp_path):
    nj, ni = 16, 16
    data = _field(1, nj, ni, 3)
    gy, gx = np.mgrid[0:nj, 0:ni]
    data[(gx + gy) % 5 == 0] = np.nan
    path = str(tmp_path / "cxbm.grib2")
    write_grib2(
        path,
        [{"data": data, "forecast_time": 0, "packing": "complex_diff",
          "sd_order": 2, "group_len": 10}],
    )
    g = read_grib2_structure(path)
    m = g["messages"][0]
    from raquet_spark.sources.io import range_reader

    rd = range_reader(path)
    got = decode_message(
        rd(m["data_off"], m["data_len"]), m,
        rd(m["bitmap_off"], m["bitmap_len"]),
    )
    np.testing.assert_array_equal(np.isnan(got), np.isnan(data))
    np.testing.assert_array_equal(
        got[~np.isnan(data)], data[~np.isnan(data)]
    )


def test_complex_packing_pixel_table(spark, tmp_path):
    """The distributed decode handles a mixed archive: simple + 5.2 +
    5.3 messages of one parameter across forecast steps."""
    nj, ni = 12, 18
    fields = [
        {"data": _field(1, nj, ni, 0), "forecast_time": 0,
         "packing": "simple"},
        {"data": _field(1, nj, ni, 1), "forecast_time": 6,
         "packing": "complex", "group_len": 20},
        {"data": _field(1, nj, ni, 2), "forecast_time": 12,
         "packing": "complex_diff", "sd_order": 2, "group_len": 13},
    ]
    path = str(tmp_path / "mixed.grib2")
    write_grib2(path, fields)
    g = read_grib2_structure(path)
    pdf = grib2_pixel_table(spark, g).toPandas()
    got = (
        pdf.sort_values(["time_cf", "sy", "sx"])["band_1"]
        .to_numpy().reshape(3, nj, ni)
    )
    for t in range(3):
        np.testing.assert_array_equal(got[t], _field(1, nj, ni, t))


def test_missing_value_management_gate(tmp_path):
    import struct

    nj, ni = 4, 4
    path = str(tmp_path / "mvm.grib2")
    write_grib2(
        path,
        [{"data": _field(1, nj, ni, 0), "forecast_time": 0,
          "packing": "complex", "group_len": 8}],
    )
    raw = bytearray(open(path, "rb").read())
    p = 16
    while raw[p + 4] != 5:
        (ln,) = struct.unpack_from(">I", raw, p)
        p += ln
    raw[p + 22] = 1  # missing-value management = primary
    p2 = str(tmp_path / "mvm2.grib2")
    open(p2, "wb").write(bytes(raw))
    with pytest.raises(NotImplementedError, match="missing-value"):
        read_grib2_structure(p2)


@pytest.mark.parametrize("spread", [100, 40000, 3_000_000])
def test_png_packing_exact(tmp_path, spread):
    """Template 5.41 (PNG packing, NCEP radar products): values ride
    the PNG channels big-endian — 8/16-bit grayscale and 24-bit RGB
    depths all reconstruct exactly through the repo's own PNG codec."""
    nj, ni = 12, 16
    gy, gx = np.mgrid[0:nj, 0:ni]
    data = ((gx * 7 + gy * 11) % 199) * (spread // 199 + 1)
    data = data.astype("f8")
    path = str(tmp_path / f"png_{spread}.grib2")
    write_grib2(
        path, [{"data": data, "forecast_time": 0, "packing": "png"}]
    )
    g = read_grib2_structure(path)
    m = g["messages"][0]
    assert m["drt"] == 41
    from raquet_spark.sources.io import range_reader

    rd = range_reader(path)
    got = decode_message(rd(m["data_off"], m["data_len"]), m, None)
    np.testing.assert_array_equal(got, data)


def test_png_packing_with_bitmap(tmp_path):
    """Bitmap + PNG: only present points are encoded (a 1-row image)."""
    nj, ni = 10, 10
    data = _field(1, nj, ni, 1)
    gy, gx = np.mgrid[0:nj, 0:ni]
    data[(gx + gy) % 4 == 0] = np.nan
    path = str(tmp_path / "pngbm.grib2")
    write_grib2(
        path, [{"data": data, "forecast_time": 0, "packing": "png"}]
    )
    g = read_grib2_structure(path)
    m = g["messages"][0]
    from raquet_spark.sources.io import range_reader

    rd = range_reader(path)
    got = decode_message(
        rd(m["data_off"], m["data_len"]), m,
        rd(m["bitmap_off"], m["bitmap_len"]),
    )
    np.testing.assert_array_equal(np.isnan(got), np.isnan(data))
    np.testing.assert_array_equal(
        got[~np.isnan(data)], data[~np.isnan(data)]
    )


def test_lambert_grid(spark, tmp_path):
    """Template 3.30 (Lambert conformal — the HRRR/NAM grid family):
    the grid parses to closed-form LCC params, the first-grid-point
    anchor round-trips through forward/inverse projection, and the
    conversion warps through the same Snyder LCC expressions the
    GeoTIFF path uses."""
    from raquet_spark.sources.grib2 import lcc_forward
    from raquet_spark.sources.tiff_reader import lcc_inverse

    p = {"type": "lcc", "sp1": 38.5, "sp2": 38.5, "lat0": 38.5,
         "lon0": -97.5, "fe": 0.0, "fn": 0.0, "a": 6371229.0,
         "inv_f": float("inf")}
    nj, ni, dx = 20, 24, 3000.0
    # first grid point = SOUTH-west corner (HRRR scans +i, +j)
    x1, y1 = -30000.0, -30000.0
    lo1, la1 = lcc_inverse(p, x1, y1)
    data = _field(1, nj, ni, 2)
    path = str(tmp_path / "lcc.grib2")
    write_grib2(
        path,
        [{"data": data, "forecast_time": 0, "param": (0, 0)}],
        j_positive=True,
        grid={"type": "lambert", "la1": la1, "lo1": lo1, "dx": dx,
              "dy": dx, "lad": 38.5, "lov": -97.5, "latin1": 38.5,
              "latin2": 38.5, "shape": 6},
    )
    g = read_grib2_structure(path)
    m = g["messages"][0]
    assert m["grid"] == "lambert" and m["j_positive"]
    assert m["proj"]["sp1"] == pytest.approx(38.5)
    assert m["proj"]["lon0"] == pytest.approx(-97.5)
    assert m["proj"]["a"] == 6371229.0
    fx, fy = lcc_forward(m["proj"], m["lo1"], m["la1"])
    assert abs(fx - x1) < 1.0 and abs(fy - y1) < 1.0  # µdeg quantization

    # values decode exactly (grid template is orthogonal to packing)
    from raquet_spark.sources.io import range_reader

    rd = range_reader(path)
    got = decode_message(rd(m["data_off"], m["data_len"]), m, None)
    np.testing.assert_array_equal(got, data)

    # full conversion through the LCC warp (single step: no time col)
    from pyspark.sql import functions as F

    from raquet_spark.functions.bands import band_decode

    tiles, meta = grib2_to_raquet(spark, path, block_size=64,
                                  compression=None)
    px = (
        tiles.where("block > 0")
        .select(F.explode(band_decode("band_1", "float64")).alias("v"))
        .where("v != -9999.0")
    )
    got_mean = px.agg(F.avg("v")).first()[0]
    src_mean = float(data.mean())
    assert abs(got_mean - src_mean) < max(2.0, abs(src_mean) * 0.15)


def test_shape_of_earth_gate(tmp_path):
    import struct

    data = _field(1, 8, 8, 0)
    path = str(tmp_path / "so.grib2")
    write_grib2(
        path,
        [{"data": data, "forecast_time": 0}],
        grid={"type": "lambert", "la1": 35.0, "lo1": -100.0, "dx": 3000,
              "dy": 3000, "lad": 38.5, "lov": -97.5, "latin1": 38.5,
              "latin2": 38.5, "shape": 6},
    )
    raw = bytearray(open(path, "rb").read())
    p = 16
    while raw[p + 4] != 3:
        (ln,) = struct.unpack_from(">I", raw, p)
        p += ln
    raw[p + 14] = 7  # unsupported shape code
    p2 = str(tmp_path / "so2.grib2")
    open(p2, "wb").write(bytes(raw))
    with pytest.raises(NotImplementedError, match="shape-of-earth"):
        read_grib2_structure(p2)


@pytest.mark.parametrize("south", [False, True])
def test_polar_stereographic_grid(spark, tmp_path, south):
    """Template 3.20 (polar stereographic, arctic/antarctic products):
    both aspects parse to the warp's ps params and the first-grid-point
    anchor round-trips through forward/inverse."""
    from raquet_spark.sources.grib2 import ps_forward
    from raquet_spark.sources.tiff_reader import ps_inverse

    lat_ts = -60.0 if south else 60.0
    p = {"type": "ps", "lat_ts": lat_ts, "lon0": -45.0, "fe": 0.0,
         "fn": 0.0, "a": 6371229.0, "inv_f": float("inf")}
    nj, ni, dx = 14, 18, 5000.0
    x1, y1 = -40000.0, -3_200_000.0 if not south else 3_200_000.0
    lo1, la1 = ps_inverse(p, x1, y1)
    data = _field(1, nj, ni, 4)
    path = str(tmp_path / f"ps_{south}.grib2")
    write_grib2(
        path,
        [{"data": data, "forecast_time": 0}],
        grid={"type": "ps", "la1": la1, "lo1": lo1, "dx": dx, "dy": dx,
              "lad": lat_ts, "lov": -45.0, "shape": 6},
    )
    g = read_grib2_structure(path)
    m = g["messages"][0]
    assert m["grid"] == "ps"
    assert m["proj"]["lat_ts"] == pytest.approx(lat_ts)
    fx, fy = ps_forward(m["proj"], m["lo1"], m["la1"])
    assert abs(fx - x1) < 2.0 and abs(fy - y1) < 2.0

    from raquet_spark.sources.io import range_reader

    rd = range_reader(path)
    got = decode_message(rd(m["data_off"], m["data_len"]), m, None)
    np.testing.assert_array_equal(got, data)

    # conversion through the ps warp
    from pyspark.sql import functions as F

    from raquet_spark.functions.bands import band_decode
    from raquet_spark.sources.grib2 import grib2_to_raquet as g2r

    tiles, _meta = g2r(spark, path, block_size=64, compression=None)
    px = (
        tiles.where("block > 0")
        .select(F.explode(band_decode("band_1", "float64")).alias("v"))
        .where("v != -9999.0")
    )
    got_mean = px.agg(F.avg("v")).first()[0]
    src_mean = float(data.mean())
    assert abs(got_mean - src_mean) < max(2.5, abs(src_mean) * 0.2)
