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

    # edition (1 parses for real since r11 — use a future edition)
    with pytest.raises(NotImplementedError, match="edition"):
        read_grib2_structure(patched(lambda b: b.__setitem__(7, 3)))

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
    # bits 1-4 decode since r11, stagger bits 5-7 since r12, bit 8
    # (alternating-Ni rows) since r14 — what stays gated is bit 8
    # combined with -i scanning (the pad column's anchor flips) and
    # any offset bit combined with j-consecutive/boustrophedon
    # (row parity is ambiguous)
    with pytest.raises(NotImplementedError, match="-i scanning"):
        read_grib2_structure(
            patched(lambda b: b.__setitem__(s3 + 14 + 57,
                                            raw[s3 + 14 + 57] | 0b10000001))
        )
    with pytest.raises(NotImplementedError, match="parity is ambiguous"):
        read_grib2_structure(
            patched(lambda b: b.__setitem__(s3 + 14 + 57,
                                            raw[s3 + 14 + 57] | 0b00100001))
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


def test_missing_value_management_unknown_mode_gate(tmp_path):
    """mvm 1/2 decode for real now (r11); unknown/reserved modes stay
    a typed gate."""
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
    raw[p + 22] = 3  # reserved missing-value-management code
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
        .select(band_decode("band_1", "float64").alias("_vals"))
        .select(F.explode("_vals").alias("v"))
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
        .select(band_decode("band_1", "float64").alias("_vals"))
        .select(F.explode("_vals").alias("v"))
        .where("v != -9999.0")
    )
    got_mean = px.agg(F.avg("v")).first()[0]
    src_mean = float(data.mean())
    assert abs(got_mean - src_mean) < max(2.5, abs(src_mean) * 0.2)


def test_corrupt_section_length_raises(tmp_path):
    """ADVICE r10 grib2.py:86: a zero/short section length must raise,
    not loop forever on the driver."""
    nj, ni = 4, 4
    path = str(tmp_path / "corrupt.grib2")
    write_grib2(path, [{"data": _field(1, nj, ni, 0)}])
    raw = bytearray(open(path, "rb").read())
    # zero out the length word of section 1 (starts right after the
    # 16-byte indicator section)
    raw[16:20] = b"\x00\x00\x00\x00"
    bad = str(tmp_path / "bad.grib2")
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="corrupt section length"):
        read_grib2_structure(bad)


def test_time_unit_conversion(spark, tmp_path):
    """ADVICE r10 grib2.py:224: code-table 4.4 units convert to hours
    (time_cf is documented as forecast hours); unknown units raise."""
    nj, ni = 6, 8
    fields = [
        {"data": _field(1, nj, ni, 0), "forecast_time": 90, "time_unit": 0},
        {"data": _field(1, nj, ni, 1), "forecast_time": 2, "time_unit": 2},
        {"data": _field(1, nj, ni, 2), "forecast_time": 4, "time_unit": 10},
    ]
    path = str(tmp_path / "units.grib2")
    write_grib2(path, fields)
    g = read_grib2_structure(path)
    assert [m["forecast_hours"] for m in g["messages"]] == [1.5, 48.0, 12.0]
    pdf = grib2_pixel_table(spark, g).toPandas()
    assert sorted(pdf["time_cf"].unique().tolist()) == [1.5, 12.0, 48.0]

    # month (3) is not exactly convertible — typed gate, never silent
    bad = str(tmp_path / "months.grib2")
    write_grib2(bad, [{"data": _field(1, nj, ni, 0), "forecast_time": 1,
                       "time_unit": 3}])
    with pytest.raises(NotImplementedError, match="time-range unit"):
        read_grib2_structure(bad)


def test_level_in_selection_key(spark, tmp_path):
    """ADVICE r10 grib2.py:503: the fixed surface is part of the
    message key — a pressure-level file (one parameter, many levels,
    same grid and forecast time) selects ONE level, not interleaved
    duplicates."""
    nj, ni = 10, 12
    # two pressure levels (type 100, Pa) at the same forecast hour
    fields = [
        {"data": _field(1, nj, ni, 0), "forecast_time": 6,
         "level": (100, -4, 5)},    # 5/10^-4 = 50000 Pa
        {"data": _field(1, nj, ni, 7), "forecast_time": 6,
         "level": (100, -4, 85)},   # 850 hPa
    ]
    path = str(tmp_path / "levels.grib2")
    write_grib2(path, fields)
    g = read_grib2_structure(path)
    assert g["messages"][0]["level_value"] == pytest.approx(50000.0)
    assert g["messages"][1]["level_value"] == pytest.approx(850000.0)

    # default surface = first message's -> only the 500 hPa field
    pdf = grib2_pixel_table(spark, g).toPandas()
    assert len(pdf) == nj * ni
    got = pdf.sort_values(["sy", "sx"])["band_1"].to_numpy().reshape(nj, ni)
    np.testing.assert_array_equal(got, _field(1, nj, ni, 0))

    # explicit level selects the other surface
    pdf850 = grib2_pixel_table(
        spark, g, level=(100, 850000.0)
    ).toPandas()
    got850 = (
        pdf850.sort_values(["sy", "sx"])["band_1"].to_numpy().reshape(nj, ni)
    )
    np.testing.assert_array_equal(got850, _field(1, nj, ni, 7))


def test_duplicate_time_same_surface_raises(spark, tmp_path):
    """Two ensemble members (PDT 4.1) share (param, surface, forecast
    hour): selection must raise, not silently interleave tiles."""
    nj, ni = 5, 6
    fields = [
        {"data": _field(1, nj, ni, m), "forecast_time": 3, "pdt": 1,
         "ens_member": m, "ens_count": 2}
        for m in range(2)
    ]
    path = str(tmp_path / "ens.grib2")
    write_grib2(path, fields)
    g = read_grib2_structure(path)
    assert [m["pdt"] for m in g["messages"]] == [1, 1]
    assert [m["ens_member"] for m in g["messages"]] == [0, 1]
    with pytest.raises(ValueError, match="share parameter"):
        grib2_pixel_table(spark, g)


def test_pdt_4_2_derived_forecast(spark, tmp_path):
    """PDT 4.2 (derived forecast — e.g. the ensemble mean): time and
    parameter keys read from the shared 4.0 prefix; single message per
    step ingests normally."""
    nj, ni = 6, 6
    fields = [
        {"data": _field(1, nj, ni, t), "forecast_time": t * 6, "pdt": 2,
         "ens_derived": 0, "ens_count": 20}
        for t in range(2)
    ]
    path = str(tmp_path / "derived.grib2")
    write_grib2(path, fields)
    g = read_grib2_structure(path)
    assert [m["pdt"] for m in g["messages"]] == [2, 2]
    assert g["messages"][0]["ens_count"] == 20
    pdf = grib2_pixel_table(spark, g).toPandas()
    assert len(pdf) == 2 * nj * ni
    assert sorted(pdf["time_cf"].unique().tolist()) == [0.0, 6.0]


def test_mvm_embedded_missing_matrix(tmp_path):
    """Missing-value management (templates 5.2/5.3 octet 23 = 1/2 —
    NCEP precip/radar fields embed missing points instead of a
    bitmap): primary-only and primary+secondary, both packings, with
    whole-group-missing runs (width-0 all-ones references) and
    scattered in-group markers; decode must NaN exactly the missing
    set and reproduce every present value bit-exactly."""
    nj, ni = 24, 32
    gy, gx = np.mgrid[0:nj, 0:ni]
    base = ((gx * 7 + gy * 11) % 199 - 50).astype("f8")

    for packing in ("complex", "complex_diff"):
        for mvm in (1, 2):
            data = base.copy()
            # scattered singles + a whole-group-sized run of missing
            data[(gx + gy) % 13 == 0] = np.nan
            data[5, :] = np.nan  # full row -> several all-missing groups
            sec = np.zeros_like(data, dtype=bool)
            if mvm == 2:
                sec[(gx + gy) % 26 == 0] = True  # half the scattered
            path = str(tmp_path / f"mvm_{packing}_{mvm}.grib2")
            write_grib2(
                path,
                [{"data": data, "forecast_time": 0, "packing": packing,
                  "mvm": mvm, "secondary": sec, "group_len": 16,
                  "sd_order": 2}],
            )
            g = read_grib2_structure(path)
            m = g["messages"][0]
            assert m["mvm"] == mvm
            assert m["bitmap_off"] is None
            assert m["primary_sub"] == pytest.approx(9.999e20, rel=1e-4)
            from raquet_spark.sources.io import range_reader

            rd = range_reader(path)
            got = decode_message(rd(m["data_off"], m["data_len"]), m, None)
            np.testing.assert_array_equal(
                np.isnan(got), np.isnan(data),
                err_msg=f"{packing} mvm={mvm} missing set",
            )
            ok = ~np.isnan(data)
            np.testing.assert_array_equal(got[ok], data[ok])


def test_mvm_first_order_diff_and_constant_groups(tmp_path):
    """5.3 order-1 with mvm: differencing runs over the NON-missing
    sequence; constant groups (width 0) with and without missing."""
    nj, ni = 8, 16
    data = np.cumsum(np.ones(nj * ni)).reshape(nj, ni)  # strictly rising
    data[:, 3] = np.nan          # a missing column
    data[2, :] = 7.0             # constant run -> width-0 groups
    data[2, 3] = np.nan
    path = str(tmp_path / "mvm_o1.grib2")
    write_grib2(
        path,
        [{"data": data, "forecast_time": 0, "packing": "complex_diff",
          "mvm": 1, "sd_order": 1, "group_len": 8}],
    )
    g = read_grib2_structure(path)
    m = g["messages"][0]
    from raquet_spark.sources.io import range_reader

    rd = range_reader(path)
    got = decode_message(rd(m["data_off"], m["data_len"]), m, None)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(data))
    ok = ~np.isnan(data)
    np.testing.assert_array_equal(got[ok], data[ok])


def test_mvm_plus_bitmap_corrupt_length(tmp_path):
    """mvm + bitmap COMBINE since r12 (see
    test_mvm_combined_with_bitmap); a section 6 that CLAIMS a bitmap
    but carries too few bits for the grid is a typed decode error, not
    a silent wrong missing set."""
    import struct as _struct

    from raquet_spark.sources.io import range_reader

    nj, ni = 4, 8
    data = _field(1, nj, ni, 0)
    data[0, 0] = np.nan
    path = str(tmp_path / "mvm_bm.grib2")
    write_grib2(
        path,
        [{"data": data, "forecast_time": 0, "packing": "complex",
          "mvm": 1}],
    )
    raw = bytearray(open(path, "rb").read())
    # walk sections to find section 6 (indicator 255 — absent bitmap)
    p = 16
    while True:
        (ln,) = _struct.unpack_from(">I", raw, p)
        num = raw[p + 4]
        if num == 6:
            raw[p + 5] = 0  # claim "bitmap present" with ZERO bytes
            break
        p += ln
    bad = str(tmp_path / "mvm_bm_bad.grib2")
    open(bad, "wb").write(bytes(raw))
    m = read_grib2_structure(bad)["messages"][0]
    rd = range_reader(bad)
    with pytest.raises(ValueError, match="bitmap carries"):
        decode_message(
            rd(m["data_off"], m["data_len"]), m,
            rd(m["bitmap_off"], m["bitmap_len"]),
        )


def test_rotll_convention_pin_and_roundtrip():
    """Rotation convention pinned against the public COSMO example:
    rotated pole at (40N, 170W) maps rotated (0, 0) to true (10E,
    50N); forward/inverse are mutual inverses over a grid of points."""
    from raquet_spark.sources.tiff_reader import rotll_inverse

    p = {"type": "rotll", "pole_lat": 40.0, "pole_lon": -170.0,
         "units": "deg"}
    lon, lat = rotll_inverse(p, 0.0, 0.0)
    assert lon == pytest.approx(10.0, abs=1e-9)
    assert lat == pytest.approx(50.0, abs=1e-9)

    # forward (python mirror of the SQL steps) → inverse round trip
    import math

    def fwd(lon_t, lat_t):
        zsinpol = math.sin(math.radians(p["pole_lat"]))
        zcospol = math.cos(math.radians(p["pole_lat"]))
        zlampol = math.radians(p["pole_lon"])
        zphi = math.radians(lat_t)
        zrla = math.radians(lon_t) - zlampol
        cp, sp = math.cos(zphi), math.sin(zphi)
        rlon = math.degrees(math.atan2(
            -math.sin(zrla) * cp,
            zcospol * sp - zsinpol * cp * math.cos(zrla),
        ))
        rlat = math.degrees(math.asin(
            zsinpol * sp + zcospol * cp * math.cos(zrla)
        ))
        return rlon, rlat

    for lon_t in (-20.0, 0.0, 10.0, 25.0):
        for lat_t in (35.0, 50.0, 62.0):
            rlon, rlat = fwd(lon_t, lat_t)
            back = rotll_inverse(p, rlon, rlat)
            assert back[0] == pytest.approx(lon_t, abs=1e-9)
            assert back[1] == pytest.approx(lat_t, abs=1e-9)


def test_rotll_sql_forward_matches_python(spark):
    """The warp's Column-expression forward (tiff_reader._forward_steps
    'rotll') agrees with the python inverse: project a lattice of true
    lon/lats through SQL, invert in python, recover the inputs."""
    from pyspark.sql import functions as F

    from raquet_spark.sources.tiff_reader import (
        _forward_steps,
        rotll_inverse,
    )

    proj = {"type": "rotll", "pole_lat": 40.0, "pole_lon": -170.0,
            "units": "deg"}
    info = {"projection": proj, "epsg": 32767}
    pts = [(float(lo), float(la)) for lo in range(-15, 30, 7)
           for la in range(38, 60, 5)]
    df = spark.createDataFrame(pts, "_lon double, _lat double")
    steps, x_e, y_e = _forward_steps(info)
    for name, expr in steps:
        df = df.withColumn(name, F.expr(expr))
    rows = df.select(
        "_lon", "_lat",
        F.expr(x_e).alias("rx"), F.expr(y_e).alias("ry"),
    ).collect()
    for r in rows:
        lon, lat = rotll_inverse(proj, r["rx"], r["ry"])
        assert lon == pytest.approx(r["_lon"], abs=1e-9)
        assert lat == pytest.approx(r["_lat"], abs=1e-9)


def test_rotated_latlon_grib(spark, tmp_path):
    """Template 3.1 end-to-end: parse (south pole → rotated north
    pole), exact decode, and conversion through the rotll warp
    preserves the field mean."""
    nj, ni = 20, 28
    data = _field(1, nj, ni, 2)
    path = str(tmp_path / "rot.grib2")
    # a COSMO-like domain: rotated coords centered near (0, 0)
    write_grib2(
        path, [{"data": data, "forecast_time": 0}],
        lat1=5.0, lon1=-7.0, di=0.5, dj=0.5,
        grid={"type": "rotated", "lat_sp": -40.0, "lon_sp": 10.0},
    )
    g = read_grib2_structure(path)
    m = g["messages"][0]
    assert m["grid"] == "rotll"
    assert m["proj"]["pole_lat"] == pytest.approx(40.0)
    assert m["proj"]["pole_lon"] == pytest.approx(-170.0)
    from raquet_spark.sources.io import range_reader

    rd = range_reader(path)
    got = decode_message(rd(m["data_off"], m["data_len"]), m, None)
    np.testing.assert_array_equal(got, data)

    from pyspark.sql import functions as F

    from raquet_spark.functions.bands import band_decode

    tiles, meta = grib2_to_raquet(spark, path, block_size=64,
                                  compression=None)
    px = (
        tiles.where("block > 0")
        .select(band_decode("band_1", "float64").alias("_vals"))
        .select(F.explode("_vals").alias("v"))
        .where("v != -9999.0")
    )
    got_mean = px.agg(F.avg("v")).first()[0]
    src_mean = float(data.mean())
    assert abs(got_mean - src_mean) < max(2.5, abs(src_mean) * 0.2)

    # nonzero rotation angle parses since r12 (see
    # test_rotated_nonzero_angle for the convention pins)
    ang = str(tmp_path / "rot_a.grib2")
    write_grib2(
        ang, [{"data": data, "forecast_time": 0}],
        lat1=5.0, lon1=-7.0, di=0.5, dj=0.5,
        grid={"type": "rotated", "lat_sp": -40.0, "lon_sp": 10.0,
              "angle": 15.0},
    )
    ma = read_grib2_structure(ang)["messages"][0]
    assert ma["proj"]["pole_gam"] == pytest.approx(15.0)


def test_gaussian_latitudes_abscissa_pin():
    """Gaussian latitudes = arcsin of the P_2N roots: pinned against
    the published ECMWF N80 grid (first latitude 89.1416) and the
    closed-form N=1 pair (arcsin(1/sqrt(3)) = 35.2644)."""
    from raquet_spark.sources.grib2 import gaussian_latitudes

    l1 = gaussian_latitudes(1)
    assert len(l1) == 2
    assert l1[0] == pytest.approx(35.264389683, abs=1e-6)
    assert l1[1] == pytest.approx(-35.264389683, abs=1e-6)

    l80 = gaussian_latitudes(80)
    assert len(l80) == 160
    assert l80[0] == pytest.approx(89.1416, abs=1e-3)
    assert np.all(np.diff(l80) < 0)  # strictly north → south
    np.testing.assert_allclose(l80, -l80[::-1], atol=1e-12)  # symmetric


def test_gaussian_grib_parse_decode_and_subset(spark, tmp_path):
    """Template 3.40: full-pole-to-pole and regional-slice grids parse
    (lat_centers = the named slice of the 2N abscissae), decode
    exactly; a la1 that matches no Gaussian latitude raises; a reduced
    grid (points-per-row list) is a typed gate."""
    import struct as _struct

    from raquet_spark.sources.grib2 import gaussian_latitudes

    n_par, ni = 16, 24
    full_nj = 2 * n_par
    data = _field(1, full_nj, ni, 3)
    path = str(tmp_path / "gau.grib2")
    write_grib2(
        path, [{"data": data, "forecast_time": 0}],
        lon1=0.0, di=360.0 / ni,
        grid={"type": "gauss", "n": n_par},
    )
    g = read_grib2_structure(path)
    m = g["messages"][0]
    assert m["grid"] == "gauss" and m["n_parallels"] == n_par
    lats = gaussian_latitudes(n_par)
    np.testing.assert_allclose(m["lat_centers"], lats, atol=2e-6)
    from raquet_spark.sources.io import range_reader

    rd = range_reader(path)
    got = decode_message(rd(m["data_off"], m["data_len"]), m, None)
    np.testing.assert_array_equal(got, data)

    # a regional slice (rows 5..20)
    row0, nj = 5, 16
    sub = str(tmp_path / "gau_sub.grib2")
    write_grib2(
        sub, [{"data": data[row0 : row0 + nj], "forecast_time": 0}],
        lon1=0.0, di=360.0 / ni,
        grid={"type": "gauss", "n": n_par, "row0": row0},
    )
    ms = read_grib2_structure(sub)["messages"][0]
    np.testing.assert_allclose(
        ms["lat_centers"], lats[row0 : row0 + nj], atol=2e-6
    )

    # corrupt la1 → no matching abscissa
    raw = bytearray(open(sub, "rb").read())
    p = 16
    while raw[p + 4] != 3:
        (ln,) = _struct.unpack_from(">I", raw, p)
        p += ln
    _struct.pack_into(">I", raw, p + 14 + 32, int(45.0 * 1e6))
    badla = str(tmp_path / "gau_badla.grib2")
    open(badla, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="Gaussian latitudes"):
        read_grib2_structure(badla)

    # reduced grids DECODE since r11; a claimed points-per-row list
    # whose bytes aren't actually there fails the sum check, and a
    # non-standard list interpretation is a typed gate
    raw = bytearray(open(sub, "rb").read())
    raw[p + 10], raw[p + 11] = 2, 1
    badred = str(tmp_path / "gau_red.grib2")
    open(badred, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="points-per-row sum"):
        read_grib2_structure(badred)
    raw[p + 11] = 3
    badint = str(tmp_path / "gau_int.grib2")
    open(badint, "wb").write(bytes(raw))
    with pytest.raises(NotImplementedError, match="interpretation"):
        read_grib2_structure(badint)


def test_gaussian_warp_nearest_exact(spark, tmp_path):
    """Gaussian → mercator 'near' warp: every output pixel must carry
    the value of the source cell CONTAINING its center, with the row
    boundaries at midpoints between Gaussian latitudes — checked
    against an independent numpy searchsorted oracle."""
    import math

    from pyspark.sql import functions as F

    from raquet_spark.functions.bands import band_decode
    from raquet_spark.sources.grib2 import gaussian_latitudes

    n_par, ni = 12, 48
    nj = 2 * n_par
    gy, gx = np.mgrid[0:nj, 0:ni]
    data = (gy * 100 + gx).astype("f8")  # row/col-identifying values
    path = str(tmp_path / "gauw.grib2")
    write_grib2(
        path, [{"data": data, "forecast_time": 0}],
        lon1=0.0, di=360.0 / ni,
        grid={"type": "gauss", "n": n_par},
    )
    tiles, meta = grib2_to_raquet(spark, path, block_size=64,
                                  compression=None, zoom=3)
    lc = gaussian_latitudes(n_par)
    edges = (lc[:-1] + lc[1:]) / 2.0  # descending inner boundaries
    bs, z = 64, 3
    world = (1 << z) * bs
    rows = tiles.where("block > 0").select(
        "block", band_decode("band_1", "float64").alias("vals")
    ).collect()
    checked = mismatched = 0
    for r in rows:
        block = r["block"]
        # quadbin-style block id → tile x/y/z
        from raquet_spark.functions.quadbin import py_cell_to_tile

        txx, tyy, tz = py_cell_to_tile(block)
        assert tz == z
        vals = np.asarray(r["vals"]).reshape(bs, bs)
        for py in range(0, bs, 7):
            for pxx in range(3, bs, 11):
                v = vals[py, pxx]
                if v == -9999.0:
                    continue
                gxp = txx * bs + pxx
                gyp = tyy * bs + py
                lon_t = (gxp + 0.5) / world * 360.0 - 180.0
                merc_y = (0.5 - (gyp + 0.5) / world) * 2 * math.pi * 6378137.0
                lat_t = math.degrees(
                    2 * math.atan(math.exp(merc_y / 6378137.0)) - math.pi / 2
                )
                # containing source cell, independent oracle
                col = int(math.floor((lon_t - 0.0 + (360.0 / ni) / 2)
                                     / (360.0 / ni)))
                row = int(np.searchsorted(-edges, -lat_t))
                if not (0 <= col < ni and 0 <= row < nj):
                    continue
                # skip half-pixel boundary ambiguity in the column
                frac = ((lon_t + (360.0 / ni) / 2) % (360.0 / ni)) / (360.0 / ni)
                near_row_edge = np.min(np.abs(edges - lat_t)) < 1e-6
                if frac < 1e-6 or frac > 1 - 1e-6 or near_row_edge:
                    continue
                checked += 1
                if v != data[row, col]:
                    mismatched += 1
    assert checked > 200
    assert mismatched == 0, f"{mismatched}/{checked} wrong"


def test_bitmap_254_reuse_previous(spark, tmp_path):
    """Bitmap indicator 254: later messages reuse the last
    indicator-0 bitmap (NCEP repeated-mask multi-field files); a 254
    with no prior bitmap raises."""
    nj, ni = 12, 16
    gy, gx = np.mgrid[0:nj, 0:ni]
    missing = (gx + gy) % 5 == 0
    fields = []
    for t in range(3):
        data = _field(1, nj, ni, t)
        data[missing] = np.nan
        fields.append({"data": data, "forecast_time": t,
                       "bitmap_reuse": t > 0})
    path = str(tmp_path / "bm254.grib2")
    write_grib2(path, fields)
    g = read_grib2_structure(path)
    ms = g["messages"]
    assert ms[0]["bitmap_off"] is not None
    assert ms[1]["bitmap_off"] == ms[0]["bitmap_off"]
    assert ms[2]["bitmap_off"] == ms[0]["bitmap_off"]
    from raquet_spark.sources.io import range_reader

    rd = range_reader(path)
    for t, m in enumerate(ms):
        want = _field(1, nj, ni, t)
        want[missing] = np.nan
        got = decode_message(
            rd(m["data_off"], m["data_len"]), m,
            rd(m["bitmap_off"], m["bitmap_len"]),
        )
        np.testing.assert_array_equal(np.isnan(got), missing)
        np.testing.assert_array_equal(got[~missing], want[~missing])
    # the pixel table carries the reused mask through all steps
    pdf = grib2_pixel_table(spark, g).toPandas()
    assert len(pdf) == 3 * int((~missing).sum())

    # 254 with NO prior bitmap in the file
    bad_fields = [{"data": _field(1, nj, ni, 0), "forecast_time": 0,
                   "bitmap_reuse": True}]
    bad = str(tmp_path / "bm254_first.grib2")
    write_grib2(bad, bad_fields)
    with pytest.raises(ValueError, match="no previously defined"):
        read_grib2_structure(bad)


def test_lambert_south_pole_aspect(spark, tmp_path):
    """Template 3.30 with the projection centre on the SOUTH pole
    (negative standard parallels, flag bit set): the Snyder negative-n
    cone round-trips through forward/inverse and the warp preserves
    the field mean — the r10 typed gate is gone."""
    from raquet_spark.sources.grib2 import lcc_forward
    from raquet_spark.sources.tiff_reader import lcc_inverse

    proj = {"type": "lcc", "sp1": -35.0, "sp2": -55.0, "lat0": -45.0,
            "lon0": 170.0, "fe": 0.0, "fn": 0.0, "a": 6371229.0,
            "inv_f": float("inf")}
    # pick a first grid point from a chosen projected anchor
    lo1, la1 = lcc_inverse(proj, -250_000.0, -180_000.0)
    nj, ni, dx = 18, 22, 4000.0
    data = _field(1, nj, ni, 6)
    path = str(tmp_path / "lcc_south.grib2")
    write_grib2(
        path, [{"data": data, "forecast_time": 0}],
        grid={"type": "lambert", "la1": la1, "lo1": lo1,
              "dx": dx, "dy": dx, "lad": -45.0, "lov": 170.0,
              "latin1": -35.0, "latin2": -55.0, "shape": 6},
    )
    g = read_grib2_structure(path)
    m = g["messages"][0]
    assert m["grid"] == "lambert"
    assert m["proj"]["sp1"] == pytest.approx(-35.0)
    fx, fy = lcc_forward(m["proj"], m["lo1"], m["la1"])
    assert abs(fx - (-250_000.0)) < 2.0 and abs(fy - (-180_000.0)) < 2.0

    from pyspark.sql import functions as F

    from raquet_spark.functions.bands import band_decode

    tiles, _meta = grib2_to_raquet(spark, path, block_size=64,
                                   compression=None)
    px = (
        tiles.where("block > 0")
        .select(band_decode("band_1", "float64").alias("_vals"))
        .select(F.explode("_vals").alias("v"))
        .where("v != -9999.0")
    )
    got_mean = px.agg(F.avg("v")).first()[0]
    src_mean = float(data.mean())
    assert abs(got_mean - src_mean) < max(2.5, abs(src_mean) * 0.2)


@pytest.mark.parametrize("i_neg", [False, True])
@pytest.mark.parametrize("j_pos", [False, True])
@pytest.mark.parametrize("col_major", [False, True])
@pytest.mark.parametrize("boustro", [False, True])
def test_scanning_mode_matrix(tmp_path, i_neg, j_pos, col_major, boustro):
    """ALL 16 combinations of flag-table 3.4 bits 1-4 (±i, ±j, i/j-
    consecutive lines, boustrophedon) normalize to the same
    row-0-north, col-0-west grid — closed in r11 (bits 1/4 and the
    j-consecutive orientation were typed gates before). Asymmetric
    grid + asymmetric values so every mis-orientation changes the
    result; a bitmap rides along (its bits follow the same scan
    order)."""
    nj, ni = 6, 9
    gy, gx = np.mgrid[0:nj, 0:ni]
    data = (gy * 100 + gx).astype("f8")
    data[2, 3] = np.nan
    data[5, 0] = np.nan
    path = str(tmp_path / f"scan_{i_neg}{j_pos}{col_major}{boustro}.grib2")
    write_grib2(
        path, [{"data": data, "forecast_time": 0}],
        lat1=50.0, lon1=10.0, di=0.5, dj=0.5,
        j_positive=j_pos, i_negative=i_neg, col_major=col_major,
        boustro=boustro,
    )
    g = read_grib2_structure(path)
    m = g["messages"][0]
    assert m["i_negative"] is i_neg and m["col_major"] is col_major
    assert m["boustro"] is boustro and m["j_positive"] is j_pos
    from raquet_spark.sources.io import range_reader

    rd = range_reader(path)
    got = decode_message(
        rd(m["data_off"], m["data_len"]), m,
        rd(m["bitmap_off"], m["bitmap_len"]),
    )
    np.testing.assert_array_equal(np.isnan(got), np.isnan(data))
    ok = ~np.isnan(data)
    np.testing.assert_array_equal(got[ok], data[ok])


def test_i_negative_conversion_anchor(spark, tmp_path):
    """-i scanning: the first grid point is the EAST end, so the
    raquet transform must anchor at the west edge — pixel means and
    the metadata bounds both line up with the +i twin."""
    nj, ni = 16, 24
    data = _field(1, nj, ni, 5)
    paths = {}
    for i_neg in (False, True):
        p = str(tmp_path / f"conv_{i_neg}.grib2")
        write_grib2(
            p, [{"data": data, "forecast_time": 0}],
            lat1=47.0, lon1=2.0, di=0.25, dj=0.25, i_negative=i_neg,
        )
        paths[i_neg] = p
    outs = {}
    for i_neg, p in paths.items():
        tiles, meta = grib2_to_raquet(spark, p, block_size=64,
                                      compression=None)
        rows = sorted(
            (r["block"], bytes(r["band_1"]) if r["band_1"] else None)
            for r in tiles.where("block > 0").collect()
        )
        outs[i_neg] = (meta["bounds"], rows)
    assert outs[False][0] == outs[True][0]
    assert outs[False][1] == outs[True][1]  # byte-identical tiles


def test_mercator_grid(spark, tmp_path):
    """Template 3.10 (Mercator at lat_ts — NOAA coastal/marine grids,
    spherical shapes): forward/inverse round-trip, exact decode, and
    conversion through the merc warp preserves the field mean; the
    ellipsoidal form is a typed gate."""
    import struct as _struct

    from raquet_spark.sources.grib2 import merc_forward
    from raquet_spark.sources.tiff_reader import merc_inverse

    proj = {"type": "merc", "lat_ts": 20.0, "fe": 0.0, "fn": 0.0,
            "a": 6371229.0, "inv_f": float("inf")}
    x1, y1 = -8_200_000.0, 2_300_000.0
    lo1, la1 = merc_inverse(proj, x1, y1)
    fx, fy = merc_forward(proj, lo1, la1)
    assert abs(fx - x1) < 1e-3 and abs(fy - y1) < 1e-3

    nj, ni, dx = 18, 26, 8000.0
    data = _field(1, nj, ni, 8)
    path = str(tmp_path / "merc.grib2")
    write_grib2(
        path, [{"data": data, "forecast_time": 0}],
        grid={"type": "mercator", "la1": la1, "lo1": lo1,
              "lad": 20.0, "dx": dx, "dy": dx, "shape": 6},
    )
    g = read_grib2_structure(path)
    m = g["messages"][0]
    assert m["grid"] == "merc"
    assert m["proj"]["lat_ts"] == pytest.approx(20.0)
    gx, gy2 = merc_forward(m["proj"], m["lo1"], m["la1"])
    assert abs(gx - x1) < 10.0 and abs(gy2 - y1) < 10.0
    from raquet_spark.sources.io import range_reader

    rd = range_reader(path)
    got = decode_message(rd(m["data_off"], m["data_len"]), m, None)
    np.testing.assert_array_equal(got, data)

    from pyspark.sql import functions as F

    from raquet_spark.functions.bands import band_decode

    tiles, _meta = grib2_to_raquet(spark, path, block_size=64,
                                   compression=None)
    px = (
        tiles.where("block > 0")
        .select(band_decode("band_1", "float64").alias("_vals"))
        .select(F.explode("_vals").alias("v"))
        .where("v != -9999.0")
    )
    got_mean = px.agg(F.avg("v")).first()[0]
    src_mean = float(data.mean())
    assert abs(got_mean - src_mean) < max(2.5, abs(src_mean) * 0.2)

    # ellipsoidal Mercator (WGS84 shape code 5): same chi-series
    # machinery as polar stereographic — forward/inverse round-trip
    # and a decoded ellipsoidal file
    proj_e = {"type": "merc", "lat_ts": 20.0, "fe": 0.0, "fn": 0.0,
              "a": 6378137.0, "inv_f": 298.257223563}
    for lon_t, lat_t in ((-80.0, 25.0), (10.0, -35.0), (151.0, 60.0)):
        ex, ey = merc_forward(proj_e, lon_t, lat_t)
        blon, blat = merc_inverse(proj_e, ex, ey)
        assert blon == pytest.approx(lon_t, abs=1e-9)
        assert blat == pytest.approx(lat_t, abs=1e-8)
    raw = bytearray(open(path, "rb").read())
    p = 16
    while raw[p + 4] != 3:
        (ln,) = _struct.unpack_from(">I", raw, p)
        p += ln
    raw[p + 14] = 5  # shape-of-earth -> WGS84
    ell = str(tmp_path / "merc_ell.grib2")
    open(ell, "wb").write(bytes(raw))
    me = read_grib2_structure(ell)["messages"][0]
    assert me["proj"]["inv_f"] == pytest.approx(298.257223563)
    rd_e = range_reader(ell)
    got_e = decode_message(rd_e(me["data_off"], me["data_len"]), me, None)
    np.testing.assert_array_equal(got_e, data)


def test_pdt_statistical_ensemble_twins(spark, tmp_path):
    """PDT 4.11/4.12 (statistical ensemble member / derived): the
    shared 4.0-prefix keys parse; two 4.11 members at the same hour
    still raise the duplicate-key error."""
    nj, ni = 5, 7
    path = str(tmp_path / "pdt11.grib2")
    write_grib2(
        path,
        [{"data": _field(1, nj, ni, t), "forecast_time": t * 6,
          "pdt": 11, "ens_member": 3, "ens_count": 20}
         for t in range(2)],
    )
    g = read_grib2_structure(path)
    assert [m["pdt"] for m in g["messages"]] == [11, 11]
    assert g["messages"][0]["ens_member"] == 3
    pdf = grib2_pixel_table(spark, g).toPandas()
    assert sorted(pdf["time_cf"].unique().tolist()) == [0.0, 6.0]

    dup = str(tmp_path / "pdt11dup.grib2")
    write_grib2(
        dup,
        [{"data": _field(1, nj, ni, m), "forecast_time": 0,
          "pdt": 11, "ens_member": m, "ens_count": 2} for m in range(2)],
    )
    with pytest.raises(ValueError, match="share parameter"):
        grib2_pixel_table(spark, read_grib2_structure(dup))


def _octa_pl(n_par):
    """Octahedral-style points-per-row for 2N rows: 20 + 4*min(j,
    2N-1-j) — symmetric, ragged, ECMWF O-grid shaped."""
    nj = 2 * n_par
    return [20 + 4 * min(j, nj - 1 - j) for j in range(nj)]


def test_reduced_gaussian_parse_and_decode(spark, tmp_path):
    """Reduced (quasi-regular) Gaussian — the ECMWF operational O-grid
    family: Ni missing + points-per-row list; ragged rows decode into
    the NaN-padded rectangle (column k of row j = lon k*360/pl[j]),
    with a bitmap riding the concatenated point stream; pl-sum
    mismatch is a typed error."""
    import struct as _struct

    n_par = 8
    nj = 2 * n_par
    pl = _octa_pl(n_par)
    ni = max(pl)
    rect = np.full((nj, ni), np.nan)
    for j in range(nj):
        for k in range(pl[j]):
            rect[j, k] = (k * 7 + j * 11) % 199 - 50
    rect[3, 5] = np.nan  # an in-row hole -> bitmap
    path = str(tmp_path / "red.grib2")
    write_grib2(
        path, [{"data": rect, "forecast_time": 0}],
        lon1=0.0, di=360.0 / ni,
        grid={"type": "gauss_reduced", "n": n_par, "pl": pl},
    )
    g = read_grib2_structure(path)
    m = g["messages"][0]
    assert m["grid"] == "gauss" and m["row_ni"] == pl
    assert m["ni"] == ni and m["lon_global"]
    assert m["bitmap_off"] is not None  # the hole
    from raquet_spark.sources.io import range_reader

    rd = range_reader(path)
    got = decode_message(
        rd(m["data_off"], m["data_len"]), m,
        rd(m["bitmap_off"], m["bitmap_len"]),
    )
    np.testing.assert_array_equal(np.isnan(got), np.isnan(rect))
    ok = ~np.isnan(rect)
    np.testing.assert_array_equal(got[ok], rect[ok])

    # pixel table row counts follow pl (minus the hole)
    pdf = grib2_pixel_table(spark, g).toPandas()
    assert len(pdf) == sum(pl) - 1
    per_row = pdf.groupby("sy").size()
    assert per_row[0] == pl[0] and per_row[3] == pl[3] - 1

    # corrupt the pl sum -> typed error
    raw = bytearray(open(path, "rb").read())
    p = 16
    while raw[p + 4] != 3:
        (ln,) = _struct.unpack_from(">I", raw, p)
        p += ln
    _struct.pack_into(">H", raw, p + 14 + 58, pl[0] + 1)
    bad = str(tmp_path / "red_bad.grib2")
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="points-per-row sum"):
        read_grib2_structure(bad)


def test_reduced_gaussian_warp_nearest_exact(spark, tmp_path):
    """Reduced Gaussian → mercator 'near' warp: every output pixel
    must carry the value of the CONTAINING source cell, with per-row
    longitude spacing 360/pl[j] and global wraparound — checked
    against an independent numpy oracle; bilinear is a typed gate."""
    import math

    from pyspark.sql import functions as F

    from raquet_spark.functions.bands import band_decode
    from raquet_spark.functions.quadbin import py_cell_to_tile
    from raquet_spark.sources.grib2 import gaussian_latitudes

    n_par = 10
    nj = 2 * n_par
    pl = _octa_pl(n_par)
    ni = max(pl)
    rect = np.full((nj, ni), np.nan)
    for j in range(nj):
        rect[j, : pl[j]] = j * 1000 + np.arange(pl[j])
    path = str(tmp_path / "redw.grib2")
    write_grib2(
        path, [{"data": rect, "forecast_time": 0}],
        lon1=0.0, di=360.0 / ni,
        grid={"type": "gauss_reduced", "n": n_par, "pl": pl},
    )
    # bilinear on ragged rows works since r12, cubic since r14 (see
    # test_reduced_grid_bilinear_warp / test_reduced_grid_cubic_warp);
    # wider kernels (lanczos etc.) remain gated
    with pytest.raises(NotImplementedError, match="nearest, bilinear"):
        grib2_to_raquet(spark, path, block_size=64, compression=None,
                        zoom=2, resampling="lanczos")
    tiles, meta = grib2_to_raquet(spark, path, block_size=64,
                                  compression=None, zoom=2)
    lc = gaussian_latitudes(n_par)
    edges = (lc[:-1] + lc[1:]) / 2.0
    bs, z = 64, 2
    world = (1 << z) * bs
    rows = tiles.where("block > 0").select(
        "block", band_decode("band_1", "float64").alias("vals")
    ).collect()
    checked = mismatched = 0
    for r in rows:
        txx, tyy, tz = py_cell_to_tile(r["block"])
        assert tz == z
        vals = np.asarray(r["vals"]).reshape(bs, bs)
        for py in range(0, bs, 5):
            for pxx in range(2, bs, 7):
                v = vals[py, pxx]
                if v == -9999.0:
                    continue
                gxp, gyp = txx * bs + pxx, tyy * bs + py
                lon_t = (gxp + 0.5) / world * 360.0 - 180.0
                merc_y = (0.5 - (gyp + 0.5) / world) * 2 * math.pi * 6378137.0
                lat_t = math.degrees(
                    2 * math.atan(math.exp(merc_y / 6378137.0)) - math.pi / 2
                )
                row = int(np.searchsorted(-edges, -lat_t))
                if not 0 <= row < nj:
                    continue
                rn = pl[row]
                k = int(math.floor((lon_t - 0.0) * rn / 360.0 + 0.5)) % rn
                # skip boundary-ambiguous samples
                frac = ((lon_t * rn / 360.0 + 0.5) % 1.0)
                if frac < 1e-6 or frac > 1 - 1e-6:
                    continue
                if np.min(np.abs(edges - lat_t)) < 1e-6:
                    continue
                checked += 1
                if v != rect[row, k]:
                    mismatched += 1
    assert checked > 300
    assert mismatched == 0, f"{mismatched}/{checked} wrong"


def test_ibm_float_pins_and_roundtrip():
    """GRIB1's reference value is an IBM370 float: pinned against the
    textbook examples (1.0 = 0x41100000, -118.625 = 0xC276A000) and
    exact for 24-bit integers through the encode/decode pair."""
    from raquet_spark.sources.grib2 import float_to_ibm32, ibm32_to_float

    assert ibm32_to_float(0x41100000) == 1.0
    assert ibm32_to_float(0xC276A000) == -118.625
    assert float_to_ibm32(1.0) == 0x41100000
    assert float_to_ibm32(-118.625) == 0xC276A000
    assert ibm32_to_float(0) == 0.0 and float_to_ibm32(0.0) == 0
    for v in (-50.0, -1.0, 0.125, 3.0, 77.0, 4095.0, 1048575.0):
        assert ibm32_to_float(float_to_ibm32(v)) == v


def test_grib1_latlon_decode(spark, tmp_path):
    """GRIB edition 1 (legacy archives): lat/lon grid, IBM-float
    reference, millidegree coords, BMS bitmap, ±j scans — normalized
    into the same message dict and decoded exactly by the shared
    machinery."""
    nj, ni = 14, 22
    for jp in (False, True):
        data = _field(1, nj, ni, 2)
        data[(np.mgrid[0:nj, 0:ni][0] * 3) % 5 == 0] = np.nan
        path = str(tmp_path / f"g1_{jp}.grib1")
        from raquet_spark.testing_grib2 import write_grib1

        write_grib1(
            path,
            [{"data": data, "forecast_time": t * 6, "param": 2}
             for t, data in enumerate([data, data + 1.0])],
            lat1=48.0, lon1=-5.0, di=0.5, dj=0.5, j_positive=jp,
        )
        g = read_grib2_structure(path)
        assert len(g["messages"]) == 2
        m = g["messages"][0]
        assert m["edition"] == 1 and m["grid"] == "latlon"
        assert m["lat1"] == pytest.approx(48.0 if not jp else 41.5)
        assert m["forecast_hours"] == 0.0
        assert g["messages"][1]["forecast_hours"] == 6.0
        from raquet_spark.sources.io import range_reader

        rd = range_reader(path)
        got = decode_message(
            rd(m["data_off"], m["data_len"]), m,
            rd(m["bitmap_off"], m["bitmap_len"]),
        )
        np.testing.assert_array_equal(np.isnan(got), np.isnan(data))
        ok = ~np.isnan(data)
        np.testing.assert_array_equal(got[ok], data[ok])

    # pixel table + conversion ride the shared path
    pdf = grib2_pixel_table(spark, g).toPandas()
    assert sorted(pdf["time_cf"].unique().tolist()) == [0.0, 6.0]
    tiles, meta = grib2_to_raquet(spark, path, block_size=64,
                                  compression=None)
    assert meta["time"]["count"] == 2


def test_grib1_gaussian_regular_and_reduced(tmp_path):
    """GRIB1 data representation type 4: the Dj slot carries N; a
    0xFFFF Ni plus the PL list at octet PV gives the reduced form —
    both decode exactly via the shared Gaussian machinery."""
    from raquet_spark.testing_grib2 import write_grib1

    n_par = 8
    nj = 2 * n_par
    data = _field(1, nj, 24, 1)
    path = str(tmp_path / "g1_gau.grib1")
    write_grib1(
        path, [{"data": data, "forecast_time": 3}],
        lon1=0.0, di=15.0, grid={"type": "gauss", "n": n_par},
    )
    g = read_grib2_structure(path)
    m = g["messages"][0]
    assert m["grid"] == "gauss" and m["n_parallels"] == n_par
    from raquet_spark.sources.grib2 import gaussian_latitudes
    from raquet_spark.sources.io import range_reader

    np.testing.assert_allclose(
        m["lat_centers"], gaussian_latitudes(n_par), atol=2e-3
    )
    rd = range_reader(path)
    got = decode_message(rd(m["data_off"], m["data_len"]), m, None)
    np.testing.assert_array_equal(got, data)

    pl = _octa_pl(n_par)
    ni = max(pl)
    rect = np.full((nj, ni), np.nan)
    for j in range(nj):
        rect[j, : pl[j]] = (np.arange(pl[j]) * 3 + j * 5) % 97
    red = str(tmp_path / "g1_red.grib1")
    write_grib1(
        red, [{"data": rect, "forecast_time": 0}],
        lon1=0.0, di=360.0 / ni,
        grid={"type": "gauss_reduced", "n": n_par, "pl": pl},
    )
    gr = read_grib2_structure(red)
    mr = gr["messages"][0]
    assert mr["row_ni"] == pl and mr["lon_global"]
    rdr = range_reader(red)
    got_r = decode_message(rdr(mr["data_off"], mr["data_len"]), mr, None)
    np.testing.assert_array_equal(np.isnan(got_r), np.isnan(rect))
    ok = ~np.isnan(rect)
    np.testing.assert_array_equal(got_r[ok], rect[ok])


def test_grib1_decimal_scale_factor(tmp_path):
    """PDS octets 27-28 carry D (caught in r11 self-review: an
    off-by-one read survived the D=0 fixtures): tenths-valued data
    with D=1 round-trips exactly, pinning the octet position."""
    from raquet_spark.sources.io import range_reader
    from raquet_spark.testing_grib2 import write_grib1

    nj, ni = 6, 9
    data = _field(1, nj, ni, 0) / 10.0
    path = str(tmp_path / "g1_d.grib1")
    write_grib1(path, [{"data": data, "forecast_time": 0, "D": 1}])
    m = read_grib2_structure(path)["messages"][0]
    assert m["D"] == 1
    rd = range_reader(path)
    got = decode_message(rd(m["data_off"], m["data_len"]), m, None)
    np.testing.assert_allclose(got, data, atol=1e-9)


def test_grib1_reduced_pl_after_vertical_coords(tmp_path):
    """ADVICE r11 (medium): ECMWF model-level reduced-Gaussian GRIB1
    carries NV vertical-coordinate parameters BEFORE the PL list —
    PV points at the VC floats, the row counts start at PV + 4*NV.
    Pre-fix the reader decoded IBM-float bytes as row counts."""
    from raquet_spark.sources.io import range_reader
    from raquet_spark.testing_grib2 import write_grib1

    n_par = 8
    nj = 2 * n_par
    pl = _octa_pl(n_par)
    ni = max(pl)
    rect = np.full((nj, ni), np.nan)
    for j in range(nj):
        rect[j, : pl[j]] = (np.arange(pl[j]) * 5 + j * 7) % 83
    path = str(tmp_path / "g1_nv.grib1")
    write_grib1(
        path, [{"data": rect, "forecast_time": 0}],
        lon1=0.0, di=360.0 / ni,
        grid={"type": "gauss_reduced", "n": n_par, "pl": pl},
        # a hybrid-level A/B coefficient list, IBM370-encoded
        nv_params=[0.0, 2000.0, 0.5, 0.998],
    )
    m = read_grib2_structure(path)["messages"][0]
    assert m["row_ni"] == pl and m["npoints"] == sum(pl)
    rd = range_reader(path)
    got = decode_message(rd(m["data_off"], m["data_len"]), m, None)
    ok = ~np.isnan(rect)
    np.testing.assert_array_equal(got[ok], rect[ok])


def test_grib1_increments_not_given(tmp_path):
    """ADVICE r11: resolution flag bit 1 clear stores 0xFFFF in the
    Di/Dj slots ('direction increments not given') — the increments
    must be derived from the corner coordinates, not decoded as
    65.535 degrees."""
    from raquet_spark.sources.io import range_reader
    from raquet_spark.testing_grib2 import write_grib1

    nj, ni = 12, 18
    data = _field(1, nj, ni, 3)
    path = str(tmp_path / "g1_noincr.grib1")
    write_grib1(path, [{"data": data, "forecast_time": 0}],
                lat1=52.0, lon1=-8.0, di=0.25, dj=0.5,
                incr_given=False)
    m = read_grib2_structure(path)["messages"][0]
    assert m["di"] == pytest.approx(0.25, abs=1e-4)
    assert m["dj"] == pytest.approx(0.5, abs=1e-4)
    rd = range_reader(path)
    got = decode_message(rd(m["data_off"], m["data_len"]), m, None)
    np.testing.assert_array_equal(got, data)


def test_grib2_negative_forecast_time(tmp_path):
    """ADVICE r11: template 4.x forecast time (octets 19-22) is
    SIGNED sign-magnitude — a reanalysis pre-initialization offset of
    -6 h must not decode as a ~4-billion hour count."""
    nj, ni = 6, 9
    path = str(tmp_path / "neg_ft.grib2")
    write_grib2(
        path,
        [{"data": _field(1, nj, ni, 0), "forecast_time": -6,
          "param": (0, 0)}],
    )
    m = read_grib2_structure(path)["messages"][0]
    assert m["forecast_time"] == -6
    assert m["forecast_hours"] == -6.0


def test_lambert_parallels_straddling_equator(spark, tmp_path):
    """ADVICE r11: standard parallels straddling the equator (e.g.
    -10/30) form a valid north-aspect cone (n > 0); the centre-flag
    sanity check must only reject when BOTH parallels contradict the
    flag."""
    from raquet_spark.sources.grib2 import lcc_forward
    from raquet_spark.sources.tiff_reader import lcc_inverse

    proj = {"type": "lcc", "sp1": -10.0, "sp2": 30.0, "lat0": 10.0,
            "lon0": -60.0, "fe": 0.0, "fn": 0.0, "a": 6371229.0,
            "inv_f": float("inf")}
    lo1, la1 = lcc_inverse(proj, -120_000.0, -90_000.0)
    nj, ni, dx = 10, 14, 5000.0
    data = _field(1, nj, ni, 4)
    path = str(tmp_path / "lcc_straddle.grib2")
    write_grib2(
        path, [{"data": data, "forecast_time": 0}],
        grid={"type": "lambert", "la1": la1, "lo1": lo1,
              "dx": dx, "dy": dx, "lad": 10.0, "lov": -60.0,
              "latin1": -10.0, "latin2": 30.0, "shape": 6,
              "south": False},
    )
    m = read_grib2_structure(path)["messages"][0]
    assert m["proj"]["sp1"] == pytest.approx(-10.0)
    assert m["proj"]["sp2"] == pytest.approx(30.0)
    fx, fy = lcc_forward(m["proj"], m["lo1"], m["la1"])
    assert abs(fx - (-120_000.0)) < 2.0 and abs(fy - (-90_000.0)) < 2.0

    # a genuinely contradictory cone (both parallels south, flag
    # claiming north) still raises
    bad = str(tmp_path / "lcc_bad.grib2")
    write_grib2(
        bad, [{"data": data, "forecast_time": 0}],
        grid={"type": "lambert", "la1": la1, "lo1": lo1,
              "dx": dx, "dy": dx, "lad": -45.0, "lov": -60.0,
              "latin1": -30.0, "latin2": -50.0, "shape": 6,
              "south": False},
    )
    with pytest.raises(ValueError, match="centre flag contradicts"):
        read_grib2_structure(bad)


def test_rotated_nonzero_angle(spark, tmp_path):
    """Template 3.1 with a NONZERO angle of rotation (the r11 typed
    gate): the published COSMO phirot2phi/rlarot2rla polgam terms are
    the angle-sum identity — polgam shifts the ROTATED longitude by
    +gam before the pole rotation. Pinned two ways: (1) rotll_inverse
    matches a literal transcription of the published polgam formula;
    (2) an angle=g file converts to BYTE-IDENTICAL tiles as an angle=0
    file whose rotated longitudes are shifted by +g."""
    import math

    from raquet_spark.sources.tiff_reader import rotll_inverse

    def published(polphi, pollam, polgam, rlarot, phirot):
        zsinpol = math.sin(math.radians(polphi))
        zcospol = math.cos(math.radians(polphi))
        zlampol = math.radians(pollam)
        zphis, zrlas = math.radians(phirot), math.radians(rlarot)
        zgam = math.radians(polgam)
        crg = math.cos(zrlas) * math.cos(zgam) - math.sin(zrlas) * math.sin(zgam)
        srg = math.sin(zrlas) * math.cos(zgam) + math.cos(zrlas) * math.sin(zgam)
        ct = math.cos(zphis)
        t = -zsinpol * crg * ct + zcospol * math.sin(zphis)
        phi = math.asin(zsinpol * math.sin(zphis) + zcospol * ct * crg)
        zarg1 = math.sin(zlampol) * t - math.cos(zlampol) * srg * ct
        zarg2 = math.cos(zlampol) * t + math.sin(zlampol) * srg * ct
        return math.degrees(math.atan2(zarg1, zarg2)), math.degrees(phi)

    p = {"pole_lat": 40.0, "pole_lon": -170.0, "pole_gam": 25.0}
    for rlon, rlat in [(0.0, 0.0), (-12.5, 7.0), (20.0, -15.0), (3.3, 33.0)]:
        lon_r, lat_r = rotll_inverse(p, rlon, rlat)
        lon_p, lat_p = published(40.0, -170.0, 25.0, rlon, rlat)
        assert lon_r == pytest.approx(lon_p, abs=1e-9)
        assert lat_r == pytest.approx(lat_p, abs=1e-9)
    # gam=0 regression: the pinned COSMO example still holds
    p0 = {"pole_lat": 40.0, "pole_lon": -170.0}
    lon0, lat0 = rotll_inverse(p0, 0.0, 0.0)
    assert lon0 == pytest.approx(10.0, abs=1e-9)
    assert lat0 == pytest.approx(50.0, abs=1e-9)

    gam = 25.0
    nj, ni = 14, 20
    data = _field(1, nj, ni, 5)

    def tiles_of(path):
        tiles, _m = grib2_to_raquet(spark, path, block_size=64,
                                    compression=None)
        return sorted(
            (r["block"], bytes(r["band_1"]))
            for r in tiles.where("block > 0").collect()
        )

    a = str(tmp_path / "gam.grib2")
    write_grib2(
        a, [{"data": data, "forecast_time": 0}],
        lat1=6.5, lon1=-8.0, di=0.5, dj=0.5,
        grid={"type": "rotated", "lat_sp": -40.0, "lon_sp": 10.0,
              "angle": gam},
    )
    b = str(tmp_path / "nogam.grib2")
    write_grib2(
        b, [{"data": data, "forecast_time": 0}],
        lat1=6.5, lon1=-8.0 + gam, di=0.5, dj=0.5,
        grid={"type": "rotated", "lat_sp": -40.0, "lon_sp": 10.0},
    )
    ta, tb = tiles_of(a), tiles_of(b)
    assert ta and ta == tb


def test_mvm_combined_with_bitmap(tmp_path):
    """Missing-value management COMBINED with a section-6 bitmap (the
    r11 typed gate; legal per the spec): the packed stream covers
    bitmap-present points, embedded markers flag further missing among
    them, and decode composes the two. Also covers bitmap-254 reuse
    under mvm."""
    from raquet_spark.sources.io import range_reader

    nj, ni = 12, 18
    gy, gx = np.mgrid[0:nj, 0:ni]
    data = ((gx * 7 + gy * 11) % 97 - 20).astype("f8")
    bitmap_miss = (gx + 3 * gy) % 7 == 0
    emb_miss = ((gx * 2 + gy) % 9 == 0) & ~bitmap_miss
    data2 = data + 1.0
    d1 = data.copy()
    d1[bitmap_miss | emb_miss] = np.nan
    d2 = data2.copy()
    d2[bitmap_miss | emb_miss] = np.nan

    path = str(tmp_path / "mvm_bm.grib2")
    write_grib2(
        path,
        [
            {"data": d1, "forecast_time": 0, "param": (0, 0),
             "packing": "complex_diff", "sd_order": 2, "group_len": 13,
             "mvm": 1, "bitmap_miss": bitmap_miss},
            # second field reuses the first bitmap (indicator 254)
            {"data": d2, "forecast_time": 6, "param": (0, 0),
             "packing": "complex", "group_len": 11, "mvm": 1,
             "bitmap_miss": bitmap_miss, "bitmap_reuse": True},
        ],
        lat1=49.0, lon1=0.0, di=0.5, dj=0.5,
    )
    g = read_grib2_structure(path)
    assert len(g["messages"]) == 2
    rd = range_reader(path)
    for m, want in zip(g["messages"], (d1, d2)):
        assert m["mvm"] == 1 and m["bitmap_off"] is not None
        bm = rd(m["bitmap_off"], m["bitmap_len"])
        got = decode_message(rd(m["data_off"], m["data_len"]), m, bm)
        np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
        ok = ~np.isnan(want)
        np.testing.assert_array_equal(got[ok], want[ok])


def test_staggered_scan_bits(spark, tmp_path):
    """Flag-table 3.4 bits 5-7 (the r11 typed gate): half-cell
    geolocation offsets on lat/lon grids. Pinned via closed-form
    equivalences — (a) bit 7 (all points offset Dj/2 in scan +j) ==
    the plain grid shifted half a cell; (b) bits 5+6 together (every
    row offset Di/2 in scan +i) == the plain grid shifted in lon;
    (c) the odd/even parity bookkeeping for each (j_positive, nj
    parity) combination against a direct transcription of the WMO
    1-based row numbering. Bit 8 (alternating Ni) and stagger with
    kernel resampling stay typed gates."""
    from raquet_spark.sources.grib2 import _grib2_info

    nj, ni = 12, 16
    data = _field(1, nj, ni, 2)

    def tiles_of(path):
        tiles, _m = grib2_to_raquet(spark, path, block_size=64,
                                    compression=None)
        return sorted(
            (r["block"], bytes(r["band_1"]))
            for r in tiles.where("block > 0").collect()
        )

    # (a) bit 7: scan is north->south (j_positive False), +j = south
    a1 = str(tmp_path / "stj.grib2")
    write_grib2(a1, [{"data": data, "forecast_time": 0}],
                lat1=49.0, lon1=0.0, di=0.5, dj=0.5, stagger=0x02)
    a2 = str(tmp_path / "stj_plain.grib2")
    write_grib2(a2, [{"data": data, "forecast_time": 0}],
                lat1=48.75, lon1=0.0, di=0.5, dj=0.5)
    assert tiles_of(a1) == tiles_of(a2)

    # (b) bits 5+6: every row staggered east by Di/2
    b1 = str(tmp_path / "stie.grib2")
    write_grib2(b1, [{"data": data, "forecast_time": 0}],
                lat1=49.0, lon1=0.0, di=0.5, dj=0.5, stagger=0x0C)
    b2 = str(tmp_path / "stie_plain.grib2")
    write_grib2(b2, [{"data": data, "forecast_time": 0}],
                lat1=49.0, lon1=0.25, di=0.5, dj=0.5)
    t1 = tiles_of(b1)
    assert t1 and t1 == tiles_of(b2)

    # (c) parity bookkeeping: stagger_x per north-row parity vs the
    # WMO numbering (scan row 1 = 0-based scan index 0 = "odd")
    for jp in (False, True):
        for njj in (6, 7):
            for bits, which in ((0x08, "odd"), (0x04, "even")):
                p = str(tmp_path / f"st_{jp}_{njj}_{which}.grib2")
                write_grib2(
                    p, [{"data": _field(1, njj, ni, 1),
                         "forecast_time": 0}],
                    lat1=49.0, lon1=0.0, di=0.5, dj=0.5,
                    j_positive=jp, stagger=bits,
                )
                g = read_grib2_structure(p)
                info = _grib2_info(g["messages"][0])
                st = info["stagger_x"]
                for j in (0, 1):
                    scan_idx = (njj - 1 - j) if jp else j
                    is_odd_row = scan_idx % 2 == 0
                    expect = 0.5 if (
                        (which == "odd") == is_odd_row
                    ) else 0.0
                    assert st[j] == expect, (jp, njj, which, j)

    # bit 8 with NO offset bits is vacuous per the WMO text (every row
    # keeps Ni points): decodes identically to the plain grid
    c1 = str(tmp_path / "altni_vacuous.grib2")
    write_grib2(c1, [{"data": data, "forecast_time": 0}],
                lat1=49.0, lon1=0.0, di=0.5, dj=0.5, stagger=0x01)
    c2 = str(tmp_path / "altni_plain.grib2")
    write_grib2(c2, [{"data": data, "forecast_time": 0}],
                lat1=49.0, lon1=0.0, di=0.5, dj=0.5)
    assert tiles_of(c1) == tiles_of(c2)


def test_stagger_projected_and_gaussian(spark, tmp_path):
    """Stagger bits 5-7 on projected and Gaussian templates (carried
    from the r12 verdict as legal-but-rare): the per-row-parity Di/2
    shift lives in source INDEX space, so it composes unchanged with
    the projected affine; bit 7 folds into the projected y anchor.
    Pinned by closed-form equivalences — a staggered grid equals the
    plain grid whose first point is moved half a cell along the
    corresponding projected axis. Bit 7 on Gaussian grids (rows not
    equally spaced — no Dj to halve) and any stagger on reduced
    Gaussian rows stay typed gates."""
    from raquet_spark.sources.tiff_reader import lcc_inverse

    def tiles_of(path):
        tiles, _m = grib2_to_raquet(spark, path, block_size=64,
                                    compression=None)
        return {
            r["block"]: bytes(r["band_1"])
            for r in tiles.where("block > 0").collect()
        }

    def assert_equiv(a: dict, b: dict) -> None:
        # the staggered file declares the PARENT corners while the
        # shifted-plain comparator declares the shifted ones, so (1)
        # the tile-ALIGNED coverage can differ by one boundary tile and
        # (2) the writer's µ-degree anchor quantization (~0.05 m) can
        # flip the floor() of a razor-edge target pixel sitting within
        # ~1e-5 cells of a source boundary. The pin is equality on the
        # common tiles with a ≤0.05% razor budget: a real half-cell
        # misregistration flips a large fraction of pixels, not ≤2.
        common = sorted(set(a) & set(b))
        data_bearing = total = mismatched = 0
        for k in common:
            pa = np.frombuffer(a[k], dtype="<f8")
            pb = np.frombuffer(b[k], dtype="<f8")
            total += pa.size
            mismatched += int((pa != pb).sum())
            if not np.all(pa == -9999.0):
                data_bearing += 1
        assert data_bearing >= 1, (len(common), data_bearing)
        assert mismatched <= max(2, total // 2000), (mismatched, total)
        assert len(set(a) ^ set(b)) <= 2, "coverage differs beyond edges"

    nj, ni, dx = 40, 48, 3000.0
    data = _field(1, nj, ni, 2)
    proj = {"type": "lcc", "sp1": 38.5, "sp2": 38.5, "lat0": 38.5,
            "lon0": -97.5, "fe": 0.0, "fn": 0.0,
            "a": 6371229.0, "inv_f": float("inf")}
    x1, y1 = -30000.0, -30000.0
    lcc = dict(dx=dx, dy=dx, lad=38.5, lov=-97.5, latin1=38.5,
               latin2=38.5, shape=6)

    def lambert_file(name, x, y, stagger):
        lo, la = lcc_inverse(proj, x, y)
        p = str(tmp_path / name)
        write_grib2(
            p, [{"data": data, "forecast_time": 0, "param": (0, 0)}],
            j_positive=True, stagger=stagger,
            grid={"type": "lambert", "la1": la, "lo1": lo, **lcc},
        )
        return p

    # (a) bits 5+6 on Lambert: every row shifted +Dx/2 along projected
    # x == the plain grid anchored half a cell east
    assert_equiv(
        tiles_of(lambert_file("lcc_st56.grib2", x1, y1, 0x0C)),
        tiles_of(lambert_file("lcc_plain_e.grib2", x1 + dx / 2.0, y1, 0)),
    )

    # (b) bit 7 on Lambert (j_positive: +j = +y): all points +Dy/2
    assert_equiv(
        tiles_of(lambert_file("lcc_st7.grib2", x1, y1, 0x02)),
        tiles_of(lambert_file("lcc_plain_n.grib2", x1, y1 + dx / 2.0, 0)),
    )

    # (c) parity bookkeeping survives the projected branch: odd scan
    # rows only (bit 5), j_positive — scan row 0 is the SOUTH row
    from raquet_spark.sources.grib2 import _grib2_info

    g = read_grib2_structure(lambert_file("lcc_odd.grib2", x1, y1, 0x08))
    st = _grib2_info(g["messages"][0])["stagger_x"]
    for j in (0, 1):
        scan_idx = nj - 1 - j  # j_positive
        assert st[j] == (0.5 if scan_idx % 2 == 0 else 0.0)

    # (d) bits 5+6 on a regular (full) Gaussian grid == the plain
    # Gaussian grid shifted Di/2 east (x is affine; y rides the
    # lat_centers row map either way)
    n_par = 16
    gni = 24
    gdi = 360.0 / gni
    gdata = _field(1, 2 * n_par, gni, 3)
    g1 = str(tmp_path / "gau_st.grib2")
    write_grib2(g1, [{"data": gdata, "forecast_time": 0}],
                lon1=0.0, di=gdi, stagger=0x0C,
                grid={"type": "gauss", "n": n_par})
    g2 = str(tmp_path / "gau_plain.grib2")
    write_grib2(g2, [{"data": gdata, "forecast_time": 0}],
                lon1=gdi / 2.0, di=gdi,
                grid={"type": "gauss", "n": n_par})
    assert_equiv(tiles_of(g1), tiles_of(g2))

    # (e) rotated lat/lon (template 3.1): the stagger shift applies in
    # ROTATED coordinates upstream of the pole rotation, so bits 5+6
    # == the plain rotated grid anchored Di/2 east in rotated lon
    rot = {"type": "rotated", "lat_sp": -40.0, "lon_sp": 10.0}
    r1 = str(tmp_path / "rot_st.grib2")
    write_grib2(r1, [{"data": data, "forecast_time": 0}],
                lat1=5.0, lon1=-3.0, di=0.5, dj=0.5, stagger=0x0C,
                grid=dict(rot))
    r2 = str(tmp_path / "rot_plain.grib2")
    write_grib2(r2, [{"data": data, "forecast_time": 0}],
                lat1=5.0, lon1=-2.75, di=0.5, dj=0.5, grid=dict(rot))
    assert_equiv(tiles_of(r1), tiles_of(r2))

    # gates: bit 7 on Gaussian; any stagger on reduced Gaussian rows
    g3 = str(tmp_path / "gau_st7.grib2")
    write_grib2(g3, [{"data": gdata, "forecast_time": 0}],
                lon1=0.0, di=gdi, stagger=0x02,
                grid={"type": "gauss", "n": n_par})
    with pytest.raises(NotImplementedError, match="Gaussian grid"):
        read_grib2_structure(g3)
    # reduced O-grid rows: 4 points at the poles growing equatorward
    pl = [4 + 4 * min(j, 2 * n_par - 1 - j) for j in range(2 * n_par)]
    rdata = np.full((2 * n_par, max(pl)), np.nan)
    for j, n in enumerate(pl):
        rdata[j, :n] = (np.arange(n) * 3 + j) % 97
    g4 = str(tmp_path / "gau_red_st.grib2")
    write_grib2(g4, [{"data": rdata, "forecast_time": 0}],
                stagger=0x08,
                grid={"type": "gauss_reduced", "n": n_par, "pl": pl})
    with pytest.raises(NotImplementedError, match="reduced Gaussian"):
        read_grib2_structure(g4)


def test_alternating_ni_rows(spark, tmp_path):
    """Flag-table 3.4 bit 8 (the last conformance-testable GRIB2
    decode gap, r12/r13 verdicts): rows offset by Di/2 carry Ni-1
    points, and with bit 7 the offset columns carry Nj-1 points.
    Pinned three ways: (a) a decode roundtrip parity matrix over
    (offset parity bit, j_positive, nj parity) — the NaN-padded
    normalized rectangle written is the rectangle read back; (b) the
    full-pipeline closed-form equivalence bits 5+6+8 (EVERY row offset
    and short) == a plain (nj, ni-1) grid at lon1 + Di/2; (c) bits
    7+8 (all points offset Dj/2, Nj-1 rows) == a plain (nj-1, ni)
    grid at lat1 - Dj/2. Reference reads these via GDAL's GRIB driver
    (reference cli.py:283)."""
    from raquet_spark.sources.grib2 import decode_message
    from raquet_spark.sources.io import open_bytes

    ni = 16

    def decode_first(path):
        g = read_grib2_structure(path)
        m = g["messages"][0]
        b = open_bytes(path)
        raw7 = bytes(b[m["data_off"] : m["data_off"] + m["data_len"]])
        bm = (
            bytes(b[m["bitmap_off"] : m["bitmap_off"] + m["bitmap_len"]])
            if m.get("bitmap_off") is not None else None
        )
        return m, decode_message(raw7, m, bm)

    # (a) roundtrip parity matrix: offset scan rows written short must
    # come back short (NaN pad east), full rows full — for both parity
    # bits, both j scan directions, odd and even row counts
    for bits, which in ((0x09, "odd"), (0x05, "even")):
        for jp in (False, True):
            for njj in (6, 7):
                rect = _field(1, njj, ni, 3).copy()
                for j in range(njj):
                    scan_idx = (njj - 1 - j) if jp else j
                    is_odd = scan_idx % 2 == 0  # WMO 1-based odd
                    if (which == "odd") == is_odd:
                        rect[j, ni - 1] = np.nan  # short row pad
                p = str(tmp_path / f"alt_{bits}_{jp}_{njj}.grib2")
                write_grib2(p, [{"data": rect, "forecast_time": 0}],
                            lat1=49.0, lon1=0.0, di=0.5, dj=0.5,
                            j_positive=jp, stagger=bits)
                m, grid = decode_first(p)
                assert m["alt_ni_rows"] is not None
                # the only NaNs written are the short-row pads, so the
                # ragged point count equals the finite count
                assert sum(m["alt_ni_rows"]) == int(
                    np.isfinite(rect).sum()
                )
                np.testing.assert_array_equal(
                    np.isnan(grid), np.isnan(rect), err_msg=f"{bits} {jp} {njj}"
                )
                np.testing.assert_allclose(
                    grid[np.isfinite(rect)], rect[np.isfinite(rect)],
                    err_msg=f"{bits} {jp} {njj}",
                )

    def tiles_of(path):
        tiles, _m = grib2_to_raquet(spark, path, block_size=64,
                                    compression=None)
        return sorted(
            (r["block"], bytes(r["band_1"]))
            for r in tiles.where("block > 0").collect()
        )

    # (b) bits 5+6+8: every row short by one, shifted east Di/2
    nj = 12
    data = _field(1, nj, ni, 2)
    short = data.copy()
    short[:, ni - 1] = np.nan
    b1 = str(tmp_path / "alt_all.grib2")
    write_grib2(b1, [{"data": short, "forecast_time": 0}],
                lat1=49.0, lon1=0.0, di=0.5, dj=0.5, stagger=0x0D)
    b2 = str(tmp_path / "alt_all_plain.grib2")
    write_grib2(b2, [{"data": data[:, : ni - 1], "forecast_time": 0}],
                lat1=49.0, lon1=0.25, di=0.5, dj=0.5)
    t1 = tiles_of(b1)
    assert t1 and t1 == tiles_of(b2)

    # (c) bits 7+8: Nj-1 rows interleaving the parent, north - Dj/2 —
    # for both j scan directions
    for jp in (False, True):
        c1 = str(tmp_path / f"alt_j_{jp}.grib2")
        write_grib2(c1, [{"data": data, "forecast_time": 0}],
                    lat1=49.0, lon1=0.0, di=0.5, dj=0.5,
                    j_positive=jp, stagger=0x03)
        g = read_grib2_structure(c1)
        assert g["messages"][0]["nj"] == nj  # data rows (declared nj+1)
        c2 = str(tmp_path / f"alt_j_{jp}_plain.grib2")
        write_grib2(c2, [{"data": data, "forecast_time": 0}],
                    lat1=48.75, lon1=0.0, di=0.5, dj=0.5)
        t1 = tiles_of(c1)
        assert t1 and t1 == tiles_of(c2)

    # gates: -i scanning flips the pad side — typed, not guessed
    d = str(tmp_path / "alt_ineg.grib2")
    write_grib2(d, [{"data": data, "forecast_time": 0}],
                lat1=49.0, lon1=0.0, di=0.5, dj=0.5, i_negative=True,
                stagger=0x01)
    with pytest.raises(NotImplementedError, match="-i scanning"):
        read_grib2_structure(d)


def test_grib1_predefined_gates(tmp_path):
    """The two GRIB1 off-file geolocation gates (r14 decision, the
    5.40/szip class — C36's last undecided item): (a) a GDS-less
    message geolocates via a PDS-octet-7 predefined grid number whose
    parameters live only in WMO Manual-on-Codes tables, and (b) a
    'numeric' bitmap references centre-agreed bits that are NOT in the
    file. Neither has an in-sandbox authority to conformance-pin a
    transcription against, so both stay typed errors naming the
    re-encode remedies. This test pins the gates fire on the exact
    byte patterns (GDS flag clear / BMS numeric table reference)."""
    import struct as _struct

    from raquet_spark.testing_grib2 import write_grib1

    nj, ni = 6, 8
    path = str(tmp_path / "g1.grib1")
    write_grib1(path, [{"data": _field(1, nj, ni, 0),
                        "forecast_time": 0, "param": 11}])
    raw = bytearray(open(path, "rb").read())
    # read_grib2_structure parses edition 1 through the same walker
    assert read_grib2_structure(path)["messages"][0]["edition"] == 1

    # (a) clear the PDS GDS-present flag (octet 8 of the PDS, byte
    # index 8 + 7 from the message start)
    noGDS = bytearray(raw)
    noGDS[8 + 7] &= ~0x80
    p1 = str(tmp_path / "nogds.grib1")
    open(p1, "wb").write(bytes(noGDS))
    with pytest.raises(NotImplementedError, match="predefined grid"):
        read_grib2_structure(p1)

    # (b) a file WITH a bitmap whose BMS carries a nonzero numeric
    # table reference (octets 5-6) instead of inline bits
    rect = _field(1, nj, ni, 0).copy()
    rect[2, 3] = np.nan  # forces a BMS
    path_bm = str(tmp_path / "g1bm.grib1")
    write_grib1(path_bm, [{"data": rect, "forecast_time": 0,
                           "param": 11}])
    raw_bm = bytearray(open(path_bm, "rb").read())
    pds_len = int.from_bytes(raw_bm[8 : 8 + 3], "big")
    gds_off = 8 + pds_len
    gds_len = int.from_bytes(raw_bm[gds_off : gds_off + 3], "big")
    bms_off = gds_off + gds_len
    _struct.pack_into(">H", raw_bm, bms_off + 4, 3)  # numeric ref
    p2 = str(tmp_path / "numbm.grib1")
    open(p2, "wb").write(bytes(raw_bm))
    with pytest.raises(NotImplementedError, match="centre-defined"):
        read_grib2_structure(p2)


def test_grib1_quasi_regular_latlon(spark, tmp_path):
    """GRIB1 quasi-regular (thinned) lat/lon (the r11 typed gate —
    old ECMWF/DWD archives): row j holds pl[j] points spanning
    lon1..lon2 INCLUSIVE, latitudes affine. Exact decode of the ragged
    rows, and the conversion warp picks each row's own
    span/(pl-1)-spaced nearest point — pinned by converting a
    CONSTANT-per-row field and checking every output pixel matches its
    row's value (geolocation errors would bleed neighbor rows)."""
    from pyspark.sql import functions as F

    from raquet_spark.sources.io import range_reader
    from raquet_spark.testing_grib2 import write_grib1

    nj = 8
    pl = [9, 13, 17, 25, 25, 17, 13, 9]
    ni = max(pl)
    rect = np.full((nj, ni), np.nan)
    for j in range(nj):
        rect[j, : pl[j]] = (np.arange(pl[j]) * 3 + j * 7) % 53
    path = str(tmp_path / "g1_qll.grib1")
    write_grib1(
        path, [{"data": rect, "forecast_time": 0}],
        lat1=52.0, lon1=-10.0, di=20.0 / (ni - 1), dj=0.5,
        grid={"type": "latlon_reduced", "pl": pl},
    )
    g = read_grib2_structure(path)
    m = g["messages"][0]
    assert m["grid"] == "latlon" and m["row_ni"] == pl
    assert m["lon_span"] == pytest.approx(20.0)
    assert m["lat_centers"][0] == pytest.approx(52.0)
    assert m["lat_centers"][-1] == pytest.approx(52.0 - 0.5 * (nj - 1))
    rd = range_reader(path)
    got = decode_message(rd(m["data_off"], m["data_len"]), m, None)
    ok = ~np.isnan(rect)
    np.testing.assert_array_equal(got[ok], rect[ok])

    # warp geolocation: constant-per-row field -> every output pixel
    # must equal its row's constant
    row_const = np.full((nj, ni), np.nan)
    for j in range(nj):
        row_const[j, : pl[j]] = float(100 + 10 * j)
    p2 = str(tmp_path / "g1_qll_rows.grib1")
    write_grib1(
        p2, [{"data": row_const, "forecast_time": 0}],
        lat1=52.0, lon1=-10.0, di=20.0 / (ni - 1), dj=0.5,
        grid={"type": "latlon_reduced", "pl": pl},
    )
    tiles, meta = grib2_to_raquet(spark, p2, block_size=64,
                                  compression=None)
    from raquet_spark.functions.bands import band_decode

    vals = (
        tiles.where("block > 0")
        .select(band_decode("band_1", "float64").alias("_vals"))
        .select(F.explode("_vals").alias("v"))
        .where("v != -9999.0")
        .groupBy("v").count().collect()
    )
    got_set = {r["v"] for r in vals}
    assert got_set and got_set <= {float(100 + 10 * j) for j in range(nj)}
    # middle rows must actually appear (not just the outer ones)
    assert {120.0, 130.0, 140.0} <= got_set

    # NV vertical-coordinate list rides in front of the PL here too
    p3 = str(tmp_path / "g1_qll_nv.grib1")
    write_grib1(
        p3, [{"data": rect, "forecast_time": 0}],
        lat1=52.0, lon1=-10.0, di=20.0 / (ni - 1), dj=0.5,
        grid={"type": "latlon_reduced", "pl": pl},
        nv_params=[0.0, 1013.25],
    )
    m3 = read_grib2_structure(p3)["messages"][0]
    assert m3["row_ni"] == pl


def test_reduced_grid_bilinear_warp(spark, tmp_path):
    """Reduced-grid BILINEAR resampling (the r11 gate was
    nearest-only): the 2 candidate rows come from the piecewise row
    map and each row interpolates at its OWN spacing (360/pl[j] on the
    global O-grid circle, wrapping at the seam). Pinned against an
    independent numpy reference over every interior output pixel."""
    import math as _math

    from raquet_spark.operators.export import to_pixel_table
    from raquet_spark.sources.grib2 import gaussian_latitudes
    from raquet_spark.sources.tiff_reader import _EARTH_R, _ORIGIN_SHIFT

    n_par = 8
    nj = 2 * n_par
    pl = _octa_pl(n_par)
    ni = max(pl)
    rect = np.full((nj, ni), np.nan)
    for j in range(nj):
        rect[j, : pl[j]] = 5.0 * j + 0.25 * np.arange(pl[j])
    path = str(tmp_path / "red_bl.grib2")
    # D=2: the 0.25-step values scale to exact ints (D=0 would
    # quantize them and the numpy reference would diverge)
    write_grib2(
        path, [{"data": rect, "forecast_time": 0, "D": 2}],
        lon1=0.0, di=360.0 / ni,
        grid={"type": "gauss_reduced", "n": n_par, "pl": pl},
    )
    tiles, meta = grib2_to_raquet(
        spark, path, block_size=64, compression=None,
        resampling="bilinear", stats=False,
    )
    rows = to_pixel_table(tiles, meta).collect()
    assert rows
    z = meta["tiling"]["min_zoom"]
    world = float((1 << z) * 64)
    lats = gaussian_latitudes(n_par)  # north -> south, row j center
    lf = 0.0
    checked = 0
    for r in rows:
        v = r["band_1"]
        if v == -9999.0:
            continue
        lon = (r["gx"] + 0.5) / world * 360.0 - 180.0
        my = _ORIGIN_SHIFT - (r["gy"] + 0.5) / world * 2.0 * _ORIGIN_SHIFT
        lat = _math.degrees(
            2.0 * _math.atan(_math.exp(my / _EARTH_R)) - _math.pi / 2.0
        )
        # interior only: both candidate rows inside the grid (the warp
        # extrapolates the row map beyond the outer centers)
        fsy = np.interp(lat, lats[::-1], (np.arange(nj) + 0.5)[::-1])
        fy = fsy - 0.5
        j0 = int(np.floor(fy))
        if j0 < 0 or j0 + 1 >= nj or lat > lats[0] or lat < lats[-1]:
            continue
        ty = fy - j0
        exp_v = 0.0
        for jj, wy in ((j0, 1.0 - ty), (j0 + 1, ty)):
            rn = pl[jj]
            u = (lon - lf) * rn / 360.0
            k0 = int(np.floor(u))
            tx = u - k0
            for kk, wx in ((k0, 1.0 - tx), (k0 + 1, tx)):
                exp_v += wy * wx * rect[jj, ((kk % rn) + rn) % rn]
        assert v == pytest.approx(exp_v, abs=1e-6), (r["gx"], r["gy"])
        checked += 1
    assert checked > 500


def test_reduced_grid_cubic_warp(spark, tmp_path):
    """Reduced-grid CUBIC resampling (carried from the r12 verdict as
    the last kernel gap on ragged rows): 4 candidate rows from the
    piecewise row map, each convolved at its OWN spacing with the
    a=-0.5 cubic kernel (wrapping at the seam on global circles).
    Pinned against an independent numpy reference over every interior
    output pixel, same method as the bilinear twin above."""
    import math as _math

    from raquet_spark.operators.export import to_pixel_table
    from raquet_spark.sources.grib2 import gaussian_latitudes
    from raquet_spark.sources.tiff_reader import _EARTH_R, _ORIGIN_SHIFT

    def cub(t):
        t = abs(t)
        if t <= 1.0:
            return (1.5 * t - 2.5) * t * t + 1.0
        if t < 2.0:
            return ((-0.5 * t + 2.5) * t - 4.0) * t + 2.0
        return 0.0

    n_par = 8
    nj = 2 * n_par
    pl = _octa_pl(n_par)
    ni = max(pl)
    rect = np.full((nj, ni), np.nan)
    for j in range(nj):
        rect[j, : pl[j]] = 5.0 * j + 0.25 * np.arange(pl[j])
    path = str(tmp_path / "red_cu.grib2")
    write_grib2(
        path, [{"data": rect, "forecast_time": 0, "D": 2}],
        lon1=0.0, di=360.0 / ni,
        grid={"type": "gauss_reduced", "n": n_par, "pl": pl},
    )
    tiles, meta = grib2_to_raquet(
        spark, path, block_size=64, compression=None,
        resampling="cubic", stats=False,
    )
    rows = to_pixel_table(tiles, meta).collect()
    assert rows
    z = meta["tiling"]["min_zoom"]
    world = float((1 << z) * 64)
    lats = gaussian_latitudes(n_par)  # north -> south, row j center
    lf = 0.0
    checked = 0
    for r in rows:
        v = r["band_1"]
        if v == -9999.0:
            continue
        lon = (r["gx"] + 0.5) / world * 360.0 - 180.0
        my = _ORIGIN_SHIFT - (r["gy"] + 0.5) / world * 2.0 * _ORIGIN_SHIFT
        lat = _math.degrees(
            2.0 * _math.atan(_math.exp(my / _EARTH_R)) - _math.pi / 2.0
        )
        # interior only: all 4 candidate rows inside the grid (the
        # warp extrapolates the row map beyond the outer centers and
        # renormalizes truncated stencils — not mirrored here)
        fsy = np.interp(lat, lats[::-1], (np.arange(nj) + 0.5)[::-1])
        fy = fsy - 0.5
        j0 = int(np.floor(fy))
        if j0 - 1 < 0 or j0 + 2 >= nj or lat > lats[0] or lat < lats[-1]:
            continue
        num = den = 0.0
        for jj in range(j0 - 1, j0 + 3):
            wy = cub(fy - jj)
            rn = pl[jj]
            u = (lon - lf) * rn / 360.0
            k0 = int(np.floor(u))
            for kk in range(k0 - 1, k0 + 3):
                w = wy * cub(u - kk)
                num += w * rect[jj, ((kk % rn) + rn) % rn]
                den += w
        assert v == pytest.approx(num / den, abs=1e-6), (r["gx"], r["gy"])
        checked += 1
    assert checked > 500


def test_pdt_probability_and_spatial(tmp_path):
    """PDT 4.5/4.9 (probability forecasts — NBM/SREF exceedance
    products) and 4.15 (spatially-processed values): the extra octets
    parse into the message keys, thresholds carry their scale factors,
    and two thresholds of one parameter at the same hour refuse to
    collapse into one stack."""
    from raquet_spark.sources.grib2 import select_messages

    nj, ni = 6, 9
    data = _field(1, nj, ni, 0)
    path = str(tmp_path / "prob.grib2")
    write_grib2(
        path,
        [
            {"data": data, "forecast_time": 0, "pdt": 9,
             "prob_number": 0, "prob_total": 2, "prob_type": 1,
             "prob_lower_scale": 1, "prob_lower": 254,  # 25.4 mm
             "prob_upper_scale": 0, "prob_upper": 0},
            {"data": data + 1.0, "forecast_time": 0, "pdt": 9,
             "prob_number": 1, "prob_total": 2, "prob_type": 1,
             "prob_lower_scale": 1, "prob_lower": 508,
             "prob_upper_scale": 0, "prob_upper": 0},
            {"data": data, "forecast_time": 6, "pdt": 5,
             "prob_type": 3},
            {"data": data, "forecast_time": 12, "pdt": 15,
             "spatial_stat": 0, "spatial_type": 0,
             "spatial_npoints": 25},
        ],
    )
    g = read_grib2_structure(path)
    ms = g["messages"]
    assert [m["pdt"] for m in ms] == [9, 9, 5, 15]
    assert ms[0]["prob_lower"] == pytest.approx(25.4)
    assert ms[1]["prob_lower"] == pytest.approx(50.8)
    assert ms[0]["prob_type"] == 1 and ms[2]["prob_type"] == 3
    assert ms[3]["spatial_npoints"] == 25
    # two thresholds at the same (param, level, hour) must raise with
    # a threshold-naming detail, not interleave silently
    with pytest.raises(ValueError, match="probability threshold"):
        select_messages(ms)
    # values decode exactly (PDT is orthogonal to packing)
    from raquet_spark.sources.io import range_reader

    rd = range_reader(path)
    got = decode_message(rd(ms[2]["data_off"], ms[2]["data_len"]),
                         ms[2], None)
    np.testing.assert_array_equal(got, data)


def test_grib2_quasi_regular_latlon(spark, tmp_path):
    """GRIB2 quasi-regular (thinned) lat/lon — template 3.0 with a
    points-per-row list (the edition-2 form of the WAFS-style thinned
    grids; previously a typed gate): ragged decode + the per-row
    endpoint-inclusive warp, sharing the GRIB1 quasi-regular
    machinery. A constant-per-row field converts with every output
    pixel equal to its row's value."""
    from pyspark.sql import functions as F

    from raquet_spark.functions.bands import band_decode
    from raquet_spark.sources.io import range_reader

    nj = 8
    pl = [9, 13, 17, 25, 25, 17, 13, 9]
    ni = max(pl)
    rect = np.full((nj, ni), np.nan)
    for j in range(nj):
        rect[j, : pl[j]] = (np.arange(pl[j]) * 3 + j * 7) % 53
    path = str(tmp_path / "g2_qll.grib2")
    write_grib2(
        path, [{"data": rect, "forecast_time": 0,
                "packing": "complex", "group_len": 11}],
        lat1=52.0, lon1=-10.0, di=20.0 / (ni - 1), dj=0.5,
        grid={"type": "latlon_reduced", "pl": pl},
    )
    m = read_grib2_structure(path)["messages"][0]
    assert m["grid"] == "latlon" and m["row_ni"] == pl
    assert m["lon_span"] == pytest.approx(20.0)
    rd = range_reader(path)
    got = decode_message(rd(m["data_off"], m["data_len"]), m, None)
    ok = ~np.isnan(rect)
    np.testing.assert_array_equal(got[ok], rect[ok])

    row_const = np.full((nj, ni), np.nan)
    for j in range(nj):
        row_const[j, : pl[j]] = float(100 + 10 * j)
    p2 = str(tmp_path / "g2_qll_rows.grib2")
    write_grib2(
        p2, [{"data": row_const, "forecast_time": 0}],
        lat1=52.0, lon1=-10.0, di=20.0 / (ni - 1), dj=0.5,
        grid={"type": "latlon_reduced", "pl": pl},
    )
    tiles, _meta = grib2_to_raquet(spark, p2, block_size=64,
                                   compression=None)
    vals = (
        tiles.where("block > 0")
        .select(band_decode("band_1", "float64").alias("_vals"))
        .select(F.explode("_vals").alias("v"))
        .where("v != -9999.0")
        .groupBy("v").count().collect()
    )
    got_set = {r["v"] for r in vals}
    assert got_set and got_set <= {float(100 + 10 * j) for j in range(nj)}
    assert {120.0, 130.0, 140.0} <= got_set


def test_select_member_and_threshold(spark, tmp_path):
    """Multi-member / multi-threshold archives are ingestable WITHOUT
    upstream splitting: select_messages takes ``member`` (PDT
    4.1/4.11) and ``threshold`` (probability lower limit, 4.5/4.9);
    the conversion and CLI expose both."""
    from raquet_spark.sources.grib2 import (
        grib2_pixel_table,
        select_messages,
    )

    nj, ni = 6, 9
    base = _field(1, nj, ni, 0)
    fields = []
    for t in (0, 6):
        for mem in (0, 1, 2):
            fields.append({"data": base + mem * 100.0,
                           "forecast_time": t, "pdt": 1,
                           "ens_member": mem, "ens_count": 3})
    path = str(tmp_path / "ens.grib2")
    write_grib2(path, fields)
    g = read_grib2_structure(path)
    with pytest.raises(ValueError, match="member"):
        select_messages(g["messages"])  # collapses without a selector
    sel = select_messages(g["messages"], member=1)
    assert len(sel) == 2 and all(m["ens_member"] == 1 for m in sel)
    px = grib2_pixel_table(spark, g, member=2).toPandas()
    assert px["band_1"].min() >= 200.0 - 50.0  # member-2 values only
    assert sorted(px["time_cf"].unique()) == [0.0, 6.0]
    with pytest.raises(ValueError, match="ensemble member 7"):
        select_messages(g["messages"], member=7)

    # probability thresholds
    pfields = []
    for t in (0, 6):
        for k, thr in enumerate((254, 508)):
            pfields.append({"data": base + k, "forecast_time": t,
                            "pdt": 9, "prob_number": k, "prob_total": 2,
                            "prob_lower_scale": 1, "prob_lower": thr})
    p2 = str(tmp_path / "prob.grib2")
    write_grib2(p2, pfields)
    g2 = read_grib2_structure(p2)
    sel2 = select_messages(g2["messages"], threshold=50.8)
    assert len(sel2) == 2
    assert all(m["prob_lower"] == pytest.approx(50.8) for m in sel2)
    with pytest.raises(ValueError, match="probability lower limit"):
        select_messages(g2["messages"], threshold=99.0)

    # below-upper-limit products (probability type 4): the lower limit
    # is encoded missing, so threshold= falls back to matching the
    # UPPER limit — a multi-threshold below-limit archive must stay
    # selectable (ADVICE r12)
    bfields = []
    for t in (0, 6):
        for k, thr in enumerate((254, 508)):
            bfields.append({"data": base + k, "forecast_time": t,
                            "pdt": 9, "prob_number": k, "prob_total": 2,
                            "prob_type": 4, "prob_lower": None,
                            "prob_upper_scale": 1, "prob_upper": thr})
    p3 = str(tmp_path / "below.grib2")
    write_grib2(p3, bfields)
    g3 = read_grib2_structure(p3)
    assert all(m["prob_lower"] is None for m in g3["messages"])
    sel3 = select_messages(g3["messages"], threshold=50.8)
    assert len(sel3) == 2
    assert all(m["prob_upper"] == pytest.approx(50.8) for m in sel3)
    with pytest.raises(ValueError, match="nor upper limit"):
        select_messages(g3["messages"], threshold=99.0)


def test_select_percentile_and_error_pdts(spark, tmp_path):
    """PDT 4.6/4.10 percentile forecasts (NBM-style products) read
    octet 35 for the message KEY and select via ``percentile=``; the
    unselected collision raises NAMED, listing the percentiles. PDT
    4.7 (analysis/forecast error) shares 4.0's layout and parses
    through. (r13 verdict stretch item.)"""
    from raquet_spark.sources.grib2 import (
        grib2_pixel_table,
        select_messages,
    )

    nj, ni = 6, 9
    base = _field(1, nj, ni, 0)
    fields = []
    for t in (0, 6):
        for pdt, pc in ((6, 10), (6, 90)):
            fields.append({"data": base + pc, "forecast_time": t,
                           "pdt": pdt, "percentile": pc})
    path = str(tmp_path / "pct.grib2")
    write_grib2(path, fields)
    g = read_grib2_structure(path)
    assert [m["percentile"] for m in g["messages"]] == [10, 90, 10, 90]
    assert all(m["pdt"] == 6 for m in g["messages"])
    with pytest.raises(ValueError, match="percentile 10/percentile 90"):
        select_messages(g["messages"])
    sel = select_messages(g["messages"], percentile=90)
    assert len(sel) == 2 and all(m["percentile"] == 90 for m in sel)
    px = grib2_pixel_table(spark, g, percentile=10).toPandas()
    assert px["band_1"].min() >= 10.0 - 50.0
    assert px["band_1"].max() <= 10.0 + 148.0
    assert sorted(px["time_cf"].unique()) == [0.0, 6.0]
    with pytest.raises(ValueError, match="percentile 55"):
        select_messages(g["messages"], percentile=55)

    # 4.10 carries the same key octet (the 4.8-style tail is ignored
    # for keying); 4.7 has no extra octets at all
    p2 = str(tmp_path / "pct10.grib2")
    write_grib2(p2, [
        {"data": base, "forecast_time": 0, "pdt": 10, "percentile": 25},
        {"data": base, "forecast_time": 0, "pdt": 7},
    ])
    msgs = read_grib2_structure(p2)["messages"]
    assert msgs[0]["pdt"] == 10 and msgs[0]["percentile"] == 25
    assert msgs[1]["pdt"] == 7 and msgs[1].get("percentile") is None
    sel10 = select_messages(msgs, percentile=25)
    assert len(sel10) == 1 and sel10[0]["pdt"] == 10


def test_grib2_increments_not_given(tmp_path):
    """Edition-2 'direction increments not given' (flag-table 3.3
    bits clear, 0xFFFFFFFF sentinels — the same class as the GRIB1
    ADVICE fix): Di/Dj derive from the corner coordinates instead of
    decoding the sentinel as 4294.97 degrees."""
    nj, ni = 10, 16
    data = _field(1, nj, ni, 1)
    path = str(tmp_path / "noincr.grib2")
    write_grib2(path, [{"data": data, "forecast_time": 0}],
                lat1=48.0, lon1=-5.0, di=0.5, dj=0.25,
                incr_given=False)
    m = read_grib2_structure(path)["messages"][0]
    assert m["di"] == pytest.approx(0.5, abs=1e-6)
    assert m["dj"] == pytest.approx(0.25, abs=1e-6)
    from raquet_spark.sources.io import range_reader

    rd = range_reader(path)
    got = decode_message(rd(m["data_off"], m["data_len"]), m, None)
    np.testing.assert_array_equal(got, data)


def test_grib1_quasi_regular_antimeridian_gate(tmp_path):
    """Regional ragged-row grids straddling the antimeridian: the
    tiling machinery anchors ONE contiguous [west, east] extent, so a
    region crossing 180 would silently clip its eastern half to
    nodata tiles — a typed gate with split-the-archive remediation
    fires at parse time instead (the warp's per-row lon lookup itself
    wraps mod 360, so a future two-extent tiler only has to lift the
    gate)."""
    from raquet_spark.testing_grib2 import write_grib1

    nj = 6
    pl = [9, 13, 17, 17, 13, 9]
    ni = max(pl)
    rect = np.full((nj, ni), np.nan)
    for j in range(nj):
        rect[j, : pl[j]] = np.arange(pl[j], dtype="f8")
    path = str(tmp_path / "g1_am.grib1")
    write_grib1(
        path, [{"data": rect, "forecast_time": 0}],
        lat1=8.0, lon1=170.0, di=24.0 / (ni - 1), dj=0.5,
        grid={"type": "latlon_reduced", "pl": pl},
    )
    with pytest.raises(NotImplementedError, match="antimeridian"):
        read_grib2_structure(path)
