"""Object-store-style byte-range IO (sources/io.py): the binary
importers (GeoTIFF, NetCDF classic, NetCDF-4/HDF5) read http(s) URLs
through HTTP Range requests — the reference gets this via GDAL
/vsicurl/ (raster2raquet.py:267); here a stdlib Range-capable server
stands in for the object store. Driver-side header parsing must fetch
only a bounded prefix of the file (block-granular ranged reads), and
executors fetch one range per segment/chunk."""

from __future__ import annotations

import http.server
import os
import shutil
import threading

import numpy as np
import pytest

REF = "/root/reference/tests"


class _RangeHandler(http.server.SimpleHTTPRequestHandler):
    """SimpleHTTPRequestHandler + single-range GET support + counters."""

    stats = {"requests": 0, "ranged": 0, "bytes": 0}

    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        type(self).stats["requests"] += 1
        path = self.translate_path(self.path)
        try:
            size = os.path.getsize(path)
        except OSError:
            self.send_error(404)
            return
        rng = self.headers.get("Range")
        if rng and rng.startswith("bytes="):
            type(self).stats["ranged"] += 1
            lo_s, hi_s = rng[6:].split("-", 1)
            lo = int(lo_s)
            hi = min(int(hi_s) if hi_s else size - 1, size - 1)
            if lo >= size:
                self.send_error(416)
                return
            n = hi - lo + 1
            type(self).stats["bytes"] += n
            self.send_response(206)
            self.send_header("Content-Range", f"bytes {lo}-{hi}/{size}")
            self.send_header("Content-Length", str(n))
            self.end_headers()
            with open(path, "rb") as f:
                f.seek(lo)
                self.wfile.write(f.read(n))
            return
        type(self).stats["bytes"] += size
        self.send_response(200)
        self.send_header("Content-Length", str(size))
        self.end_headers()
        with open(path, "rb") as f:
            shutil.copyfileobj(f, self.wfile)


@pytest.fixture()
def http_root(tmp_path):
    handler = type(
        "H", (_RangeHandler,),
        {"stats": {"requests": 0, "ranged": 0, "bytes": 0},
         "directory": str(tmp_path)},
    )

    def factory(*a, **kw):
        return handler(*a, directory=str(tmp_path), **kw)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), factory)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield tmp_path, f"http://127.0.0.1:{srv.server_address[1]}", handler
    finally:
        srv.shutdown()


def test_range_buffer_primitives(http_root):
    tmp, base, handler = http_root
    blob = bytes(range(256)) * 1000  # 256 000 bytes
    (tmp / "blob.bin").write_bytes(blob)
    from raquet_spark.sources.io import RangeBuffer, http_range, range_reader

    assert http_range(f"{base}/blob.bin", 10, 5) == blob[10:15]
    rb = RangeBuffer(f"{base}/blob.bin")
    assert len(rb) == len(blob)
    assert rb[0] == blob[0] and rb[-1] == blob[-1]
    assert rb[1000:1010] == blob[1000:1010]
    # spans a block boundary (64 KiB)
    assert rb[65530:65550] == blob[65530:65550]
    # cached: re-reading costs no new request
    before = handler.stats["requests"]
    assert rb[1000:1010] == blob[1000:1010]
    assert handler.stats["requests"] == before
    rd = range_reader(f"{base}/blob.bin")
    assert rd(255990, 100) == blob[255990:256000]  # short at EOF


def test_netcdf4_over_http(spark, http_root):
    """NetCDF-4 (HDF5, extensible-array index, shuffle+deflate) read
    end-to-end over HTTP: structure parse + distributed pixel decode
    match the local read byte-for-byte, and the header parse fetches
    only a bounded prefix (ranged, not the whole file)."""
    from raquet_spark.sources.netcdf import (
        netcdf_pixel_table,
        read_netcdf_structure,
    )
    from raquet_spark.testing_hdf5 import write_netcdf4

    tmp, base, handler = http_root
    nt, nlat, nlon = 4, 32, 32
    rng = np.random.RandomState(7)
    data = rng.randint(-500, 500, size=(nt, nlat, nlon)).astype("i2")
    path = str(tmp / "fix.nc")
    write_netcdf4(
        path, np.linspace(50, 35, nlat), np.linspace(-10, 5, nlon),
        data, times=np.arange(nt, dtype="f8"), nc_type=3,
        scale_factor=0.5, add_offset=100.0, fill_value=-999,
        chunks=(1, 16, 16), v4_index="extensible",
    )
    local = read_netcdf_structure(path)
    want = (
        netcdf_pixel_table(spark, local, "value")
        .toPandas().sort_values(["time_cf", "sy", "sx"])
        .reset_index(drop=True)
    )

    handler.stats.update(requests=0, ranged=0, bytes=0)
    remote = read_netcdf_structure(f"{base}/fix.nc")
    assert handler.stats["ranged"] == handler.stats["requests"] > 0
    # header+index parse reads block-granular ranges, NOT the file
    assert handler.stats["bytes"] < os.path.getsize(path) + 2 * 65536
    got = (
        netcdf_pixel_table(spark, remote, "value")
        .toPandas().sort_values(["time_cf", "sy", "sx"])
        .reset_index(drop=True)
    )
    assert (got["band_1"] == want["band_1"]).all()
    assert len(got) == nt * nlat * nlon


def test_netcdf_classic_over_http(spark, http_root):
    from raquet_spark.sources.netcdf import (
        netcdf_pixel_table,
        read_netcdf_structure,
    )
    from raquet_spark.testing import write_netcdf_classic

    tmp, base, handler = http_root
    nt, nlat, nlon = 3, 20, 30
    rng = np.random.RandomState(3)
    data = rng.randint(-500, 500, size=(nt, nlat, nlon)).astype("i2")
    path = str(tmp / "classic.nc")
    write_netcdf_classic(
        path, np.linspace(50, 35, nlat), np.linspace(-10, 5, nlon),
        data, times=np.arange(nt, dtype="f8"), nc_type=3,
        scale_factor=0.5, add_offset=100.0, fill_value=-999,
    )
    local = read_netcdf_structure(path)
    want = (
        netcdf_pixel_table(spark, local, "value")
        .toPandas().sort_values(["time_cf", "sy", "sx"])
        .reset_index(drop=True)
    )
    remote = read_netcdf_structure(f"{base}/classic.nc")
    got = (
        netcdf_pixel_table(spark, remote, "value")
        .toPandas().sort_values(["time_cf", "sy", "sx"])
        .reset_index(drop=True)
    )
    assert (got["band_1"] == want["band_1"]).all()


@pytest.mark.skipif(
    not os.path.exists(f"{REF}/civ.tif"), reason="reference rasters absent"
)
def test_geotiff_over_http(spark, http_root):
    """A real reference GeoTIFF ingested over HTTP matches the local
    ingest; the IFD parse stays ranged."""
    from raquet_spark.sources.tiff_reader import (
        read_tiff_structure,
        tiff_pixel_table,
    )

    tmp, base, handler = http_root
    shutil.copy(f"{REF}/civ.tif", tmp / "civ.tif")
    local = read_tiff_structure(str(tmp / "civ.tif"))
    want = (
        tiff_pixel_table(spark, local).toPandas()
        .sort_values(["sy", "sx"]).reset_index(drop=True)
    )
    handler.stats.update(requests=0, ranged=0, bytes=0)
    remote = read_tiff_structure(f"{base}/civ.tif")
    assert handler.stats["ranged"] == handler.stats["requests"] > 0
    assert remote["width"] == local["width"]
    got = (
        tiff_pixel_table(spark, remote).toPandas()
        .sort_values(["sy", "sx"]).reset_index(drop=True)
    )
    cols = [c for c in want.columns if c.startswith("band_")]
    for c in cols:
        a, b = want[c].to_numpy(), got[c].to_numpy()
        assert ((a == b) | (np.isnan(a) & np.isnan(b))).all()


def test_no_range_support_degrades(http_root, tmp_path):
    """A server that ignores Range (status 200) degrades to one
    whole-body fetch instead of failing."""
    import http.server as hs

    tmp, base, handler = http_root
    blob = b"x" * 100_000
    (tmp / "plain.bin").write_bytes(blob)

    class NoRange(hs.SimpleHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            self.headers.replace_header or None  # noqa: B018
            self.send_response(200)
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

    srv = hs.ThreadingHTTPServer(("127.0.0.1", 0), NoRange)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        from raquet_spark.sources.io import RangeBuffer, http_range

        url = f"http://127.0.0.1:{srv.server_address[1]}/plain.bin"
        assert http_range(url, 5, 10) == blob[5:15]
        rb = RangeBuffer(url)
        assert len(rb) == len(blob)
        assert rb[99_990:100_000] == blob[-10:]
    finally:
        srv.shutdown()
