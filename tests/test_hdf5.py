"""NetCDF-4 (HDF5 container) ingestion: from-scratch structure parse,
chunked/contiguous/compact decode, shuffle+deflate+fletcher32 filters,
dense (fractal heap + v2 B-tree) groups and attributes, fill-value
semantics for never-written chunks, and the full .nc → RaQuet tile
conversion through the same dispatch the classic-CDF path uses
(reference converts NetCDF via GDAL, cli.py:283,438)."""

from __future__ import annotations

import numpy as np
import pytest

from raquet_spark.sources.netcdf import (
    netcdf_pixel_table,
    netcdf_to_raquet,
    read_coord_var,
    read_netcdf_structure,
)
from raquet_spark.testing_hdf5 import write_hdf5, write_netcdf4


def _grid(nt=3, nlat=40, nlon=60):
    lats = 37.9875 - 0.025 * np.arange(nlat)
    lons = -122.9875 + 0.025 * np.arange(nlon)
    gy, gx = np.mgrid[0:nlat, 0:nlon]
    data = np.stack(
        [((gx * 7 + gy * 11 + t * 13) % 199 - 50) for t in range(nt)]
    ).astype("<i2")
    data[(gx[None] + gy[None] + np.arange(nt)[:, None, None]) % 17 == 0] = -999
    return lats, lons, data


@pytest.mark.parametrize(
    "style,dense",
    [("v0", False), ("latest", False), ("v0", True), ("latest", True)],
)
def test_nc4_structure_and_decode(spark, tmp_path, style, dense):
    """All four container layouts netcdf-c can produce — old-style
    (superblock v0, v1 headers, SNOD groups), 1.8-style (superblock
    v2, OHDR, compact link messages), and both with DENSE links+attrs
    (fractal heap + v2 B-tree) — parse to the same structure and
    decode to identical scaled values."""
    lats, lons, data = _grid()
    path = str(tmp_path / f"t_{style}_{dense}.nc")
    write_netcdf4(
        path, lats, lons, data, times=np.arange(3, dtype="f8"),
        nc_type=3, scale_factor=0.5, add_offset=100.0, fill_value=-999,
        style=style, dense_links=dense, dense_attrs=dense,
    )
    nc = read_netcdf_structure(path)
    assert nc["format"] == "hdf5"
    assert nc["dims"]["lat"] == 40 and nc["dims"]["lon"] == 60
    assert nc["variables"]["value"]["dims"] == ["time", "lat", "lon"]
    assert nc["gatts"]["Conventions"] == "CF-1.6"
    np.testing.assert_allclose(read_coord_var(nc, "time"), [0, 1, 2])
    np.testing.assert_allclose(read_coord_var(nc, "lat")[:2], lats[:2])

    pdf = netcdf_pixel_table(spark, nc, "value").toPandas()
    assert len(pdf) == 3 * 40 * 60
    want = np.where(data == -999, -999, data).astype("f8") * 0.5 + 100.0
    got = (
        pdf.sort_values(["time_cf", "sy", "sx"])["band_1"]
        .to_numpy()
        .reshape(3, 40, 60)
    )
    np.testing.assert_array_equal(got, want)


def test_nc4_missing_chunks_fill(spark, tmp_path):
    """Never-written chunks decode as the fill value — the HDF5
    semantics a partially-written variable relies on."""
    lats, lons, data = _grid(nt=2, nlat=16, nlon=16)
    path = str(tmp_path / "holes.nc")
    write_netcdf4(
        path, lats, lons, data, times=np.arange(2, dtype="f8"),
        nc_type=3, scale_factor=0.5, add_offset=100.0, fill_value=-999,
        chunks=(1, 8, 8), skip_chunks={(1, 1, 1)},
    )
    nc = read_netcdf_structure(path)
    pdf = netcdf_pixel_table(spark, nc, "value").toPandas()
    assert len(pdf) == 2 * 16 * 16
    got = (
        pdf.sort_values(["time_cf", "sy", "sx"])["band_1"]
        .to_numpy()
        .reshape(2, 16, 16)
    )
    want = np.where(data == -999, -999, data).astype("f8") * 0.5 + 100.0
    want[1, 8:, 8:] = -999 * 0.5 + 100.0  # the skipped chunk
    np.testing.assert_array_equal(got, want)


def test_nc4_contiguous_and_compact(spark, tmp_path):
    """Contiguous data variables fan out as row-range slabs; compact
    layouts (data inline in the header) decode from the closure."""
    gy, gx = np.mgrid[0:12, 0:10]
    data = (gx + 100 * gy).astype("<f4")
    for layout in ("contiguous", "compact"):
        path = str(tmp_path / f"{layout}.nc")
        spec = {
            "lat": {"data": np.linspace(10, 11, 12),
                    "attrs": {"CLASS": "DIMENSION_SCALE",
                              "units": "degrees_north"}},
            "lon": {"data": np.linspace(20, 21, 10),
                    "attrs": {"CLASS": "DIMENSION_SCALE",
                              "units": "degrees_east"}},
            "value": {
                "data": data,
                "compact": layout == "compact",
                "dimension_list": ["lat", "lon"],
                "attrs": {},
            },
        }
        write_hdf5(path, spec)
        nc = read_netcdf_structure(path)
        assert nc["variables"]["value"]["h5"]["layout"] == layout
        pdf = netcdf_pixel_table(spark, nc, "value").toPandas()
        got = (
            pdf.sort_values(["sy", "sx"])["band_1"].to_numpy().reshape(12, 10)
        )
        np.testing.assert_allclose(got, data.astype("f8"), rtol=1e-6)


def test_nc4_fletcher32_and_unfiltered(spark, tmp_path):
    """fletcher32 checksums strip cleanly; an unfiltered chunked
    variable decodes straight from the raw chunk bytes."""
    lats, lons, data = _grid(nt=1, nlat=16, nlon=16)
    for filters in ((), (("fletcher32",),),
                    (("shuffle",), ("deflate", 6), ("fletcher32",))):
        path = str(tmp_path / f"f{len(filters)}.nc")
        write_netcdf4(
            path, lats, lons, data[0], nc_type=3, fill_value=-999,
            filters=filters, chunks=(8, 16),
        )
        nc = read_netcdf_structure(path)
        pdf = netcdf_pixel_table(spark, nc, "value").toPandas()
        got = pdf.sort_values(["sy", "sx"])["band_1"].to_numpy().reshape(16, 16)
        np.testing.assert_array_equal(got, data[0].astype("f8"))


def test_nc4_size_match_fallback(tmp_path):
    """Files without DIMENSION_LIST fall back to unique size matching;
    ambiguous sizes fail with a typed error, not a wrong grid."""
    lats, lons, data = _grid(nt=1, nlat=20, nlon=30)
    path = str(tmp_path / "nodl.nc")
    write_netcdf4(path, lats, lons, data[0], nc_type=3,
                  dimension_list=False)
    nc = read_netcdf_structure(path)
    assert nc["variables"]["value"]["dims"] == ["lat", "lon"]

    sq = str(tmp_path / "square.nc")
    write_netcdf4(sq, lats, lons[:20], data[0][:, :20], nc_type=3,
                  dimension_list=False)
    with pytest.raises(ValueError, match="ambiguous"):
        read_netcdf_structure(sq)


def test_nc4_to_raquet_time_tiles(spark, tmp_path):
    """Full conversion parity with the classic path: (block, time_cf)
    keyed tiles, CF time metadata, per-step stats tracking the
    source distribution — via the same netcdf_to_raquet entry."""
    from raquet_spark.operators.time_dim import per_step_stats

    lats, lons, data = _grid()
    path = str(tmp_path / "t4.nc")
    write_netcdf4(
        path, lats, lons, data, times=np.arange(3, dtype="f8"),
        time_units="hours since 1980-01-01 00:00:00",
        nc_type=3, scale_factor=0.5, add_offset=100.0, fill_value=-999,
    )
    tiles, meta = netcdf_to_raquet(spark, path, block_size=64)
    assert meta["time"]["cf:units"].startswith("hours since 1980-01-01")
    assert meta["time"]["count"] == 3
    assert meta["bands"][0]["nodata"] == -999 * 0.5 + 100.0
    g = {r["time_cf"]: r for r in per_step_stats(tiles, "band_1").collect()}
    assert set(g) == {0.0, 1.0, 2.0}
    for t in range(3):
        vals = np.where(data[t] == -999, np.nan, data[t] * 0.5 + 100.0)
        src_mean = float(np.nanmean(vals))
        assert g[float(t)]["count"] > 0
        assert abs(g[float(t)]["mean"] - src_mean) / src_mean < 0.02


@pytest.mark.parametrize(
    "v4,filters,skip",
    [
        ("implicit", (), set()),
        ("fixed_array", (), set()),
        ("fixed_array", (("shuffle",), ("deflate", 4)), {(1, 1, 1)}),
        ("fixed_array_paged", (("deflate", 6),), {(0, 1, 0)}),
        ("extensible", (), set()),
        ("extensible", (("shuffle",), ("deflate", 4)), {(1, 1, 1)}),
        ("extensible_paged", (("deflate", 6),), {(0, 1, 0)}),
        ("btree2", (), set()),
        ("btree2", (("shuffle",), ("deflate", 4)), {(1, 1, 1)}),
        ("btree2_deep", (("deflate", 6),), {(0, 1, 0)}),
    ],
)
def test_nc4_v4_chunk_indexes(spark, tmp_path, v4, filters, skip):
    """HDF5 1.10+ data-layout v4 fixed-shape chunk indexes — implicit
    (dense contiguous chunk array) and fixed array (unpaged, filtered,
    paged) — decode to the same scaled values as the 1.8 B-tree v1
    path, including never-written chunks falling to fill."""
    lats, lons, data = _grid(nt=2, nlat=16, nlon=16)
    path = str(tmp_path / f"v4_{v4}_{len(filters)}.nc")
    write_netcdf4(
        path, lats, lons, data, times=np.arange(2, dtype="f8"),
        nc_type=3, scale_factor=0.5, add_offset=100.0, fill_value=-999,
        chunks=(1, 8, 8), filters=filters, skip_chunks=skip,
        v4_index=v4,
    )
    nc = read_netcdf_structure(path)
    assert nc["variables"]["value"]["h5"]["layout"] == "chunked"
    pdf = netcdf_pixel_table(spark, nc, "value").toPandas()
    assert len(pdf) == 2 * 16 * 16
    got = (
        pdf.sort_values(["time_cf", "sy", "sx"])["band_1"]
        .to_numpy()
        .reshape(2, 16, 16)
    )
    want = np.where(data == -999, -999, data).astype("f8") * 0.5 + 100.0
    for t, cy, cx in skip:  # skipped chunks read back as fill
        want[t, cy * 8:(cy + 1) * 8, cx * 8:(cx + 1) * 8] = (
            -999 * 0.5 + 100.0
        )
    np.testing.assert_array_equal(got, want)


def test_nc4_v4_single_chunk_and_dead_page(spark, tmp_path):
    """Single-chunk index (whole variable in one chunk, filtered and
    not) and a PAGED fixed array with an uninitialized page (bitmap 0
    → every chunk of that page reads as fill)."""
    lats, lons, data = _grid(nt=1, nlat=8, nlon=8)
    for filters in ((), (("shuffle",), ("deflate", 4))):
        path = str(tmp_path / f"single_{len(filters)}.nc")
        write_netcdf4(
            path, lats, lons, data[0], nc_type=3, scale_factor=0.5,
            add_offset=100.0, fill_value=-999, chunks=(8, 8),
            filters=filters, v4_index="single",
        )
        nc = read_netcdf_structure(path)
        pdf = netcdf_pixel_table(spark, nc, "value").toPandas()
        got = pdf.sort_values(["sy", "sx"])["band_1"].to_numpy().reshape(8, 8)
        want = np.where(data[0] == -999, -999, data[0]).astype("f8") * 0.5 + 100.0
        np.testing.assert_array_equal(got, want)

    # paged fixed array, 16 chunks at page_bits=2 → 4 pages; page 2 dead
    lats, lons, data = _grid(nt=1, nlat=16, nlon=16)
    path = str(tmp_path / "deadpage.nc")
    write_netcdf4(
        path, lats, lons, data[0], nc_type=3, scale_factor=0.5,
        add_offset=100.0, fill_value=-999, chunks=(4, 4),
        v4_index="fixed_array_paged", dead_pages={2},
    )
    nc = read_netcdf_structure(path)
    pdf = netcdf_pixel_table(spark, nc, "value").toPandas()
    got = pdf.sort_values(["sy", "sx"])["band_1"].to_numpy().reshape(16, 16)
    want = np.where(data[0] == -999, -999, data[0]).astype("f8") * 0.5 + 100.0
    # linear chunk order on the 4x4 grid: page 2 = chunks 8..11 =
    # grid rows (2,0)..(2,3) → source rows 8..11, all columns
    want[8:12, :] = -999 * 0.5 + 100.0
    np.testing.assert_array_equal(got, want)


def test_nc4_v4_unlimited_gates(tmp_path):
    """Both unlimited-dim chunk indexes are implemented now: the
    layout message parses the extensible array's five creation
    parameters (itype 4) and the v2 B-tree's node size/split/merge
    (itype 5); unknown future index types still fail typed."""
    import struct

    from raquet_spark.sources.hdf5 import _layout

    def v4_body(itype, tail=16):
        return (
            struct.pack("<BBBBB", 4, 2, 0, 3, 4)
            + struct.pack("<III", 8, 8, 2)
            + bytes([itype]) + b"\x00" * tail
        )

    lay = _layout(v4_body(4))
    assert lay["index"] == 4 and "ea_max_bits" in lay
    lay = _layout(v4_body(5))
    assert lay["index"] == 5 and "bt2_node_size" in lay
    with pytest.raises(NotImplementedError, match="indexing type 6"):
        _layout(v4_body(6))


def test_nc4_extensible_array_deep(spark, tmp_path):
    """Extensible-array index past the direct-block range: 48 chunks
    at tiny EA geometry (1 inline element, min 2 elements/block, page
    size 4) span the index block, both direct data blocks, real super
    blocks, and PAGED data blocks. Covers: a dead page (bitmap 0 →
    those chunks read as fill), never-written chunks inside live
    blocks, and a tail super block that was never materialized."""
    nt, nlat, nlon = 12, 16, 16
    lats, lons, data = _grid(nt=nt, nlat=nlat, nlon=nlon)
    path = str(tmp_path / "ea_deep.nc")
    # chunk grid: (12,2,2) -> 48 linear chunks
    # dead page: global dblk ordinal 4 = sblk3's first block (elements
    # 15..22 -> chunks 15..18 in page 0), kill page 0 -> chunks 15..18
    write_netcdf4(
        path, lats, lons, data, times=np.arange(nt, dtype="f8"),
        nc_type=3, scale_factor=0.5, add_offset=100.0, fill_value=-999,
        chunks=(1, 8, 8), filters=(("shuffle",), ("deflate", 4)),
        v4_index="extensible_paged", skip_chunks={(2, 0, 1)},
        dead_pages={(4, 0)},
    )
    nc = read_netcdf_structure(path)
    pdf = netcdf_pixel_table(spark, nc, "value").toPandas()
    assert len(pdf) == nt * nlat * nlon
    got = (
        pdf.sort_values(["time_cf", "sy", "sx"])["band_1"]
        .to_numpy()
        .reshape(nt, nlat, nlon)
    )
    want = np.where(data == -999, -999, data).astype("f8") * 0.5 + 100.0
    fill = -999 * 0.5 + 100.0
    # skipped chunk (2,0,1): time 2, rows 0..7, cols 8..15
    want[2, 0:8, 8:16] = fill
    # dead page kills linear chunks 15..18 on the (12,2,2) grid:
    # chunk 15=(3,1,1), 16=(4,0,0), 17=(4,0,1), 18=(4,1,0)
    want[3, 8:16, 8:16] = fill
    want[4, 0:8, 0:8] = fill
    want[4, 0:8, 8:16] = fill
    want[4, 8:16, 0:8] = fill
    np.testing.assert_array_equal(got, want)


def test_nc4_btree2_chunk_index_deep(spark, tmp_path):
    """v2 B-tree chunk index past a single leaf: 48 filtered chunk
    records at node_size=256 force a depth-1 tree (BTIN root over
    several BTLF leaves with separator records) — the index HDF5 1.10+
    writes when MORE THAN ONE dimension is unlimited. Skipped chunks
    have no record and read back as fill."""
    nt, nlat, nlon = 12, 16, 16
    lats, lons, data = _grid(nt=nt, nlat=nlat, nlon=nlon)
    path = str(tmp_path / "bt2_deep.nc")
    write_netcdf4(
        path, lats, lons, data, times=np.arange(nt, dtype="f8"),
        nc_type=3, scale_factor=0.5, add_offset=100.0, fill_value=-999,
        chunks=(1, 8, 8), filters=(("shuffle",), ("deflate", 4)),
        v4_index="btree2_deep", skip_chunks={(2, 0, 1), (7, 1, 0)},
    )
    nc = read_netcdf_structure(path)
    pdf = netcdf_pixel_table(spark, nc, "value").toPandas()
    assert len(pdf) == nt * nlat * nlon
    got = (
        pdf.sort_values(["time_cf", "sy", "sx"])["band_1"]
        .to_numpy()
        .reshape(nt, nlat, nlon)
    )
    want = np.where(data == -999, -999, data).astype("f8") * 0.5 + 100.0
    fill = -999 * 0.5 + 100.0
    want[2, 0:8, 8:16] = fill
    want[7, 8:16, 0:8] = fill
    np.testing.assert_array_equal(got, want)


def test_btree2_depth3_chunk_index(tmp_path):
    """v2 B-tree DEEPER than the r10 depth-2 bound: a tiny node size
    over a long unlimited-x dataset forces depth >= 3 (BTIN over BTIN
    over BTIN over leaves, with the cumulative-total pointer fields
    that only exist at depth >= 2); every chunk must decode and holes
    fall to fill — the r10 '>depth-2' typed gate is gone."""
    import struct as _struct

    from raquet_spark.sources.hdf5 import (
        read_h5_dataset,
        read_hdf5_structure,
    )
    from raquet_spark.testing_hdf5 import write_hdf5

    n_chunks = 700  # rec_size 24 at node 64 -> caps [2,1,1,..]: deep
    data = np.arange(n_chunks * 4, dtype="<i4").reshape(1, n_chunks * 4)
    path = str(tmp_path / "bt2_d3.h5")
    write_hdf5(
        path,
        {"v": {"data": data, "chunks": (1, 4), "v4_index": "btree2",
               "btree2_node_size": 64, "fill": -5,
               "maxdims": [-1, -1],
               "skip_chunks": {(0, 13), (0, 500)}}},
    )
    # verify the written tree really is depth >= 3
    raw = open(path, "rb").read()
    i = raw.find(b"BTHD")
    depth = _struct.unpack_from("<H", raw, i + 12)[0]
    assert depth >= 3, depth
    got = read_h5_dataset(read_hdf5_structure(path), "v")
    want = data.copy()
    want[0, 13 * 4 : 14 * 4] = -5
    want[0, 500 * 4 : 501 * 4] = -5
    np.testing.assert_array_equal(got, want)


def test_nc4_extensible_array_swizzled(tmp_path):
    """An EA index whose unlimited dimension is NOT dim 0 linearizes
    chunks in SWIZZLED order (the unlimited dim moves to slot 0,
    H5VM_swizzle_coords) — closed in r11: values decode identically to
    the unswizzled layout, with asymmetric chunk grids, filters, and a
    hole so any coordinate mix-up changes the result."""
    from raquet_spark.sources.hdf5 import (
        read_h5_dataset,
        read_hdf5_structure,
    )
    from raquet_spark.testing_hdf5 import write_hdf5

    # 2-d, unlim at slot 1: 2x4 chunk grid (asymmetric on purpose)
    data = np.arange(8 * 16, dtype="<i2").reshape(8, 16)
    path = str(tmp_path / "swizzled.h5")
    write_hdf5(
        path,
        {"v": {"data": data, "chunks": (4, 4),
               "v4_index": "extensible", "filters": (),
               "maxdims": [8, -1]}},
    )
    h5 = read_hdf5_structure(path)
    np.testing.assert_array_equal(read_h5_dataset(h5, "v"), data)

    # 3-d, unlim in the MIDDLE slot, filtered, with a skipped chunk
    d3 = np.arange(4 * 6 * 8, dtype="<i4").reshape(4, 6, 8)
    p3 = str(tmp_path / "swizzled3.h5")
    write_hdf5(
        p3,
        {"v": {"data": d3, "chunks": (2, 2, 4),
               "v4_index": "extensible",
               "filters": (("shuffle",), ("deflate", 4)),
               "maxdims": [4, -1, 8], "fill": -7,
               "skip_chunks": {(1, 2, 0)}}},
    )
    h53 = read_hdf5_structure(p3)
    got = read_h5_dataset(h53, "v")
    want = d3.copy()
    want[2:4, 4:6, 0:4] = -7  # the hole falls to fill
    np.testing.assert_array_equal(got, want)

    # the same content through the UNSWIZZLED layout decodes equal
    # (sanity: the permutation really is the only difference)
    p0 = str(tmp_path / "plain3.h5")
    write_hdf5(
        p0,
        {"v": {"data": d3, "chunks": (2, 2, 4),
               "v4_index": "extensible",
               "filters": (("shuffle",), ("deflate", 4)),
               "maxdims": [-1, 6, 8], "fill": -7,
               "skip_chunks": {(1, 2, 0)}}},
    )
    np.testing.assert_array_equal(
        read_h5_dataset(read_hdf5_structure(p0), "v"), got
    )


def test_nc4_v4_dont_filter_partial_gate(tmp_path):
    """v4 flag bit 0 (DONT_FILTER_PARTIAL_BOUND_CHUNKS) + a filter
    pipeline stores edge chunks raw while interior chunks are
    filtered; decoding both through the pipeline would silently
    corrupt the boundary — typed gate instead."""
    lats, lons, data = _grid(nt=1, nlat=16, nlon=16)
    path = str(tmp_path / "dfp.nc")
    write_netcdf4(
        path, lats, lons, data[0], nc_type=3, fill_value=-999,
        chunks=(8, 8), v4_index="fixed_array",
    )
    # flip flag bit 0 on the layout message in place: find the v4
    # chunked layout header (version 4, class 2, flags 0)
    with open(path, "rb") as f:
        raw = bytearray(f.read())
    sig = bytes([4, 2, 0, 3, 4])  # ver, class, flags, ndims+1, enc
    i = raw.find(sig)
    assert i >= 0
    raw[i + 2] = 0x01
    with open(path, "wb") as f:
        f.write(raw)
    with pytest.raises(
        NotImplementedError, match="DONT_FILTER_PARTIAL_BOUND_CHUNKS"
    ):
        read_netcdf_structure(path)


def test_nc4_reference_list_compound(tmp_path):
    """Real netcdf-c files attach a REFERENCE_LIST attribute (compound
    {dataset: object ref, dimension: int}, written by H5DSattach_scale)
    to every dimension scale. It must DECODE (compound datatype class
    6), carry the right back-references, and stay hidden from user
    attrs — in both the v1 (padded-name) and v3 (packed-name) compound
    layouts and through dense attribute storage."""
    from raquet_spark.sources.hdf5 import read_hdf5_structure

    lats, lons, data = _grid(nt=2, nlat=12, nlon=10)
    for style, dense in [("v0", False), ("latest", False),
                         ("v0", True), ("latest", True)]:
        path = str(tmp_path / f"rl_{style}_{dense}.nc")
        write_netcdf4(
            path, lats, lons, data, times=np.arange(2, dtype="f8"),
            nc_type=3, fill_value=-999,
            style=style, dense_links=dense, dense_attrs=dense,
        )
        h5 = read_hdf5_structure(path)
        var_addr = h5["datasets"]["value"]["header_addr"]
        for i, dim in enumerate(["time", "lat", "lon"]):
            rl = h5["datasets"][dim]["attrs"]["REFERENCE_LIST"]
            assert rl == {"dataset": var_addr, "dimension": i}, (
                style, dense, dim, rl)
            assert h5["datasets"][dim]["attrs"]["_Netcdf4Dimid"] == i
        assert h5["gatts"]["_NCProperties"].startswith("version=2")
        # the NetCDF layer still parses and hides the internals
        nc = read_netcdf_structure(path)
        assert "REFERENCE_LIST" not in nc["variables"]["lat"]["attrs"]
        assert "_Netcdf4Dimid" not in nc["variables"]["lat"]["attrs"]
        assert "_NCProperties" not in nc["gatts"]
        assert nc["variables"]["value"]["dims"] == ["time", "lat", "lon"]


def test_nc4_unsupported_attr_datatype_degrades(tmp_path):
    """An attribute with a datatype class the reader does not decode
    (enum, class 8) must come back as name→None — never fail the whole
    ingest. The data variable still decodes exactly."""
    import struct

    from raquet_spark.testing_hdf5 import (
        RawAttr,
        _dt_int,
        _m_dataspace,
        write_hdf5,
    )

    # enum datatype message: class 8, base i4, one member "ok"=0
    enum_dt = (
        struct.pack("<BBBBI", 0x18, 1, 0, 0, 4)
        + _dt_int(4)
        + b"ok\x00" + b"\x00" * 5  # name padded to 8
        + struct.pack("<i", 0)
    )
    gy, gx = np.mgrid[0:8, 0:6]
    data = (gx + 10 * gy).astype("<f4")
    path = str(tmp_path / "enumattr.nc")
    spec = {
        "lat": {"data": np.linspace(10, 11, 8),
                "attrs": {"CLASS": "DIMENSION_SCALE",
                          "units": "degrees_north"}},
        "lon": {"data": np.linspace(20, 21, 6),
                "attrs": {"CLASS": "DIMENSION_SCALE",
                          "units": "degrees_east"}},
        "value": {
            "data": data,
            "dimension_list": ["lat", "lon"],
            "attrs": {
                "flag": RawAttr(enum_dt, _m_dataspace([]),
                                struct.pack("<i", 0)),
                "units": "K",
            },
        },
    }
    write_hdf5(path, spec)
    nc = read_netcdf_structure(path)
    assert nc["variables"]["value"]["attrs"]["flag"] is None
    assert nc["variables"]["value"]["attrs"]["units"] == "K"
    pdf_vals = read_coord_var(nc, "lat")
    assert len(pdf_vals) == 8


def test_nc4_plain_1d_variable_is_not_a_dimension(tmp_path):
    """When the file HAS dimension scales, a plain 1-D dataset without
    CLASS must not become a dimension candidate — previously its size
    could silently capture another variable's axis in the size-match
    fallback."""
    gy, gx = np.mgrid[0:8, 0:6]
    path = str(tmp_path / "plain1d.nc")
    spec = {
        "lat": {"data": np.linspace(10, 11, 8),
                "attrs": {"CLASS": "DIMENSION_SCALE",
                          "units": "degrees_north"}},
        "lon": {"data": np.linspace(20, 21, 6),
                "attrs": {"CLASS": "DIMENSION_SCALE",
                          "units": "degrees_east"}},
        # a 1-D DATA variable (no CLASS) whose size collides with lon's
        "profile": {"data": np.arange(6, dtype="<f4"), "attrs": {}},
        "value": {
            "data": (gx + 10 * gy).astype("<f4"),
            "dimension_list": ["lat", "lon"],
            "attrs": {},
        },
    }
    write_hdf5(path, spec)
    nc = read_netcdf_structure(path)
    assert "profile" not in nc["dims"]
    assert nc["variables"]["value"]["dims"] == ["lat", "lon"]
    # the plain 1-D variable binds to the size-matched REAL dim (lon,
    # size 6) — not to itself
    assert nc["variables"]["profile"]["dims"] == ["lon"]


@pytest.mark.parametrize("style", ["v0", "latest"])
def test_nc4_grouped_variable(spark, tmp_path, style):
    """NetCDF-4 hierarchical groups (e.g. Sentinel-5P PRODUCT/...):
    a data variable inside a child group binds to root dimension
    scales through DIMENSION_LIST, coordinate discovery handles the
    group-qualified key, and the distributed decode is identical."""
    gy, gx = np.mgrid[0:12, 0:10]
    data = (gx + 100 * gy).astype("<f4")
    path = str(tmp_path / f"grp_{style}.nc")
    spec = {
        "lat": {"data": np.linspace(10, 11, 12),
                "attrs": {"CLASS": "DIMENSION_SCALE", "NAME": "lat",
                          "units": "degrees_north"}},
        "lon": {"data": np.linspace(20, 21, 10),
                "attrs": {"CLASS": "DIMENSION_SCALE", "NAME": "lon",
                          "units": "degrees_east"}},
        "PRODUCT/value": {
            "data": data,
            "chunks": (6, 10),
            "filters": (("shuffle",), ("deflate", 4)),
            "dimension_list": ["lat", "lon"],
            "attrs": {"units": "K"},
        },
    }
    write_hdf5(path, spec, style=style)
    nc = read_netcdf_structure(path)
    assert "PRODUCT/value" in nc["variables"]
    assert nc["variables"]["PRODUCT/value"]["dims"] == ["lat", "lon"]
    from raquet_spark.sources.netcdf import _find_coords, _pick_data_var

    t, la, lo = _find_coords(nc)
    assert (t, la, lo) == (None, "lat", "lon")
    assert _pick_data_var(nc, la, lo, None) == "PRODUCT/value"
    pdf = netcdf_pixel_table(spark, nc, "PRODUCT/value").toPandas()
    got = pdf.sort_values(["sy", "sx"])["band_1"].to_numpy().reshape(12, 10)
    np.testing.assert_allclose(got, data.astype("f8"), rtol=1e-6)


def test_hdf5_typed_gates(tmp_path):
    """Unsupported constructs fail fast with typed errors naming the
    feature: layout v4 chunk indexes, unknown filters, non-HDF5
    bytes."""
    from raquet_spark.sources.hdf5 import _layout, defilter

    with pytest.raises(NotImplementedError, match="version 5"):
        _layout(bytes([5, 2]) + b"\x00" * 30)
    with pytest.raises(NotImplementedError, match="filter id 307"):
        defilter(b"xx", [(307, [])], 2)
    bad = str(tmp_path / "bad.nc")
    with open(bad, "wb") as f:
        f.write(b"not an hdf5 file at all......")
    with pytest.raises(ValueError, match="NetCDF"):
        read_netcdf_structure(bad)


def test_nc4_plan_no_python_udf_rowcount(spark, tmp_path):
    """The decode is mapInPandas over a small task table (the Arrow
    escape hatch for binary payloads); everything downstream of the
    pixel table stays JVM-side, and every chunk appears exactly once
    (no double-emitted edge chunks)."""
    lats, lons, data = _grid(nt=2, nlat=24, nlon=36)
    path = str(tmp_path / "edges.nc")
    # chunks that do NOT divide the shape: edge chunks are stored
    # full-size and must be cropped, not double-counted
    write_netcdf4(
        path, lats, lons, data, times=np.arange(2, dtype="f8"),
        nc_type=3, fill_value=-999, chunks=(2, 10, 16),
    )
    nc = read_netcdf_structure(path)
    pdf = netcdf_pixel_table(spark, nc, "value").toPandas()
    assert len(pdf) == 2 * 24 * 36
    assert pdf.groupby(["time_cf", "sy", "sx"]).size().max() == 1


@pytest.mark.parametrize(
    "heap_opts,kind",
    [
        ({"huge_threshold": 120}, "huge-indirect"),  # id_len 8 < 17
        ({"huge_threshold": 120, "id_len_extra": 17}, "huge-direct"),
        ({"tiny": True, "id_len_extra": 57}, "tiny-extended"),
    ],
)
def test_dense_attrs_huge_and_tiny_heap_objects(tmp_path, heap_opts, kind):
    """Fractal-heap HUGE objects (standalone payloads: address+length
    inline in wide heap ids, or an 8-byte id resolved through the
    record-type-1 v2 B-tree) and TINY objects (data inside the heap id,
    extended 2-byte-prefix form) — the r09 typed gate, now decoded.
    A long string attribute exceeds the huge threshold; a short one
    fits a tiny id when the id is wide enough."""
    from raquet_spark.sources.hdf5 import read_hdf5_structure
    from raquet_spark.testing_hdf5 import write_hdf5

    big = "H" * 300
    attrs = {"units": "K", "long_name": big, "x": np.int32(7)}
    write_hdf5(
        str(tmp_path / "heap.h5"),
        {"v": {"data": np.arange(12, dtype="<i2").reshape(3, 4),
               "attrs": attrs}},
        dense_attrs=True,
        heap_opts=heap_opts,
    )
    h = read_hdf5_structure(str(tmp_path / "heap.h5"))
    got = h["datasets"]["v"]["attrs"]
    assert got["units"] == "K"
    assert got["long_name"] == big
    assert got["x"] == 7


def test_fractal_heap_sub_root_indirect():
    """Managed fractal heap grown past the direct-row span: root rows
    whose block size exceeds max_direct hold CHILD indirect blocks
    (the doubling table recurses self-similarly) — closed in r11.
    40 objects overflow rows 0-2 (direct) into row 3 (2048-byte
    entries > max_direct=1024 → sub-root FHIBs of 4x512 blocks);
    every object must read back bit-exactly through the heap ids."""
    from raquet_spark.sources.hdf5 import _FractalHeap
    from raquet_spark.testing_hdf5 import _W, _fractal_heap_tree

    objects = [
        bytes([(i * 7 + j) % 251 for j in range(200 + (i * 37) % 300)])
        for i in range(40)
    ]
    w = _W()
    w.emit(b"\x00" * 16)
    hdr, ids = _fractal_heap_tree(
        w, objects, width=4, start_size=512, max_direct=1024
    )
    buf = bytes(w.b)
    heap = _FractalHeap(buf, hdr)
    assert heap.cur_rows >= 4, heap.cur_rows  # row 3 IS past the span
    for o, hid in zip(objects, ids):
        assert heap.get(hid) == o
