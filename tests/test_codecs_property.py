"""Property-based robustness for the from-spec codecs (hypothesis):
LZW/PackBits byte-level roundtrips over adversarial inputs, JPEG codec
structural invariants, and NetCDF writer/reader roundtrips over random
grids. No Spark session needed — these pin the pure-python kernels the
executors run."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from raquet_spark.sources.lzw import (
    lzw_decode,
    lzw_encode,
    packbits_decode,
    packbits_encode,
)

_bytes = st.binary(min_size=0, max_size=5000)
_runs = st.lists(
    st.tuples(st.integers(0, 255), st.integers(1, 300)), min_size=0, max_size=50
).map(lambda rs: b"".join(bytes([v]) * n for v, n in rs))


@settings(max_examples=150, deadline=None)
@given(st.one_of(_bytes, _runs))
def test_lzw_roundtrip(data):
    assert lzw_decode(lzw_encode(data)) == data


@settings(max_examples=150, deadline=None)
@given(st.one_of(_bytes, _runs))
def test_packbits_roundtrip(data):
    assert packbits_decode(packbits_encode(data)) == data


@settings(max_examples=25, deadline=None)
@given(
    st.integers(8, 40),
    st.integers(8, 40),
    st.integers(1, 100),
    st.integers(0, 2**32 - 1),
)
def test_jpeg_decodes_own_output(h, w, quality, seed):
    """Any uint8 image encodes to parseable JFIF whose decode has the
    right shape and dtype; quality 100 on 8x8-constant content is
    lossless."""
    from raquet_spark.functions.jpeg import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    out = jpeg_decode(jpeg_encode(img, quality))
    assert out.shape == (h, w) and out.dtype == np.uint8

    blocks = rng.integers(0, 256, (-(-h // 8), -(-w // 8)), dtype=np.uint8)
    flat = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))[:h, :w]
    assert np.array_equal(jpeg_decode(jpeg_encode(flat, 100)), flat)


@settings(max_examples=20, deadline=None)
@given(
    st.integers(2, 30),
    st.integers(2, 30),
    st.integers(1, 4),
    st.sampled_from([3, 4, 5, 6]),
    st.booleans(),
    st.integers(0, 2**32 - 1),
)
def test_netcdf_roundtrip(nlat, nlon, nt, nc_type, record_time, seed):
    """Classic-NetCDF writer/parser roundtrip: dims, coord vars, and the
    raw data slab survive for every supported dtype and both time
    layouts (padding rules included — odd nlon exercises the 4-byte
    record padding)."""
    import tempfile

    from raquet_spark.sources.netcdf import read_coord_var, read_netcdf_structure
    from raquet_spark.testing import write_netcdf_classic

    rng = np.random.default_rng(seed)
    dt = {3: "<i2", 4: "<i4", 5: "<f4", 6: "<f8"}[nc_type]
    if nc_type >= 5:
        data = rng.random((nt, nlat, nlon)).astype(dt)
    else:
        data = rng.integers(-100, 100, (nt, nlat, nlon)).astype(dt)
    lats = 50.0 - 0.5 * np.arange(nlat)
    lons = -10.0 + 0.5 * np.arange(nlon)
    with tempfile.NamedTemporaryFile(suffix=".nc") as f:
        write_netcdf_classic(
            f.name, lats, lons, data,
            times=np.arange(nt, dtype="f8"), nc_type=nc_type,
            record_time=record_time,
        )
        nc = read_netcdf_structure(f.name)
        assert nc["dims"] == {"time": 0 if record_time else nt,
                              "lat": nlat, "lon": nlon}
        np.testing.assert_allclose(read_coord_var(nc, "lat"), lats)
        np.testing.assert_allclose(read_coord_var(nc, "lon"), lons)
        np.testing.assert_allclose(read_coord_var(nc, "time"), np.arange(nt))
        v = nc["variables"]["value"]
        assert v["record"] is record_time
        # raw slab readback (per step for record layout)
        with open(f.name, "rb") as fh:
            raw = fh.read()
        slab = nlat * nlon * np.dtype(dt).itemsize
        for s in range(nt):
            off = v["begin"] + s * (nc["recsize"] if record_time else slab)
            got = np.frombuffer(
                raw[off : off + slab], dtype=dt.replace("<", ">")
            ).reshape(nlat, nlon)
            np.testing.assert_array_equal(got.astype(dt), data[s])


# ----------------------------------------------------------- VP8L --

_img = st.tuples(
    st.integers(1, 24),  # height
    st.integers(1, 24),  # width
    st.integers(1, 4),  # bands
    st.integers(0, 2**32 - 1),  # seed
    st.booleans(),  # low-cardinality values (exercises runs + palettes)
)


@settings(max_examples=60, deadline=None)
@given(_img, st.sampled_from(["plain", "nosg", "pred1", "pred2", "color", "cache", "nolz"]))
def test_vp8l_roundtrip_property(spec, mode):
    from raquet_spark.functions.webp import vp8l_encode, webp_decode_bands

    h, w, c, seed, low_card = spec
    rng = np.random.RandomState(seed)
    if low_card:
        arr = rng.choice([0, 7, 128, 255], size=(h, w, c)).astype(np.uint8)
    else:
        arr = rng.randint(0, 256, (h, w, c), dtype=np.uint8)
    kw = {
        "plain": {},
        "nosg": {"subtract_green": False},
        "pred1": {"predictor_mode": 1},
        "pred2": {"predictor_mode": 2},
        "color": {"color_elements": (200, 17, 250)},
        "cache": {"cache_bits": 5},
        "nolz": {"use_lz77": False},
    }[mode]
    buf = vp8l_encode(arr, **kw)
    np.testing.assert_array_equal(webp_decode_bands(buf, c), arr)


@settings(max_examples=40, deadline=None)
@given(_img)
def test_vp8l_palette_roundtrip_property(spec):
    from raquet_spark.functions.webp import vp8l_encode, webp_decode_bands

    h, w, c, seed, _ = spec
    rng = np.random.RandomState(seed)
    ncolors = rng.randint(1, 40)
    vals = rng.randint(0, 256, size=ncolors, dtype=np.uint8)
    arr = vals[rng.randint(0, ncolors, (h, w))][:, :, None].repeat(c, axis=2)
    buf = vp8l_encode(arr, palette=True)
    np.testing.assert_array_equal(webp_decode_bands(buf, c), arr)
