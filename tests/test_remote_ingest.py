"""Remote tile ingestion: fake-transport fetch, retry/backoff, partial
coverage, request builders, and the TIFF response decoder."""

from __future__ import annotations

import numpy as np
import pytest

from raquet_spark.core.metadata import BandMeta, build_metadata
from raquet_spark.functions.bands import decode_block
from raquet_spark.sources.remote import (
    cells_for_bounds,
    fetch_tiles,
    imageserver_request,
    raw_decoder,
    tiff_decoder,
    tile_bounds_3857,
    xyz_request,
)

SIZE = 8
ZOOM = 4


def _meta():
    return build_metadata(
        bands=[BandMeta(name="band_1", type="float32")],
        bounds=(-180.0, -85.0, 180.0, 85.0),
        width=SIZE * 4,
        height=SIZE * 4,
        block_width=SIZE,
        block_height=SIZE,
        max_zoom=ZOOM,
    )


def _expected(x: int, y: int, z: int) -> np.ndarray:
    return (np.arange(SIZE * SIZE, dtype="<f4") % 7 + x * 100 + y * 10 + z).astype("<f4")


def _make_fake_transport():
    size = SIZE

    def fake_transport(url: str, params: dict) -> bytes:
        # url is "fake://{z}/{x}/{y}"
        z, x, y = (int(p) for p in url.split("://")[1].split("/"))
        if x == 5 and y == 6:
            raise IOError("permanently down tile")
        return (
            (np.arange(size * size, dtype="<f4") % 7 + x * 100 + y * 10 + z)
            .astype("<f4")
            .tobytes()
        )

    return fake_transport


def _make_flaky_transport():
    fake = _make_fake_transport()
    calls: dict[str, int] = {}

    def flaky_transport(url: str, params: dict) -> bytes:
        n = calls.get(url, 0) + 1
        calls[url] = n
        if n < 3:
            raise IOError(f"transient failure {n}")
        return fake(url, params)

    return flaky_transport


def test_fetch_tiles_fake_transport(spark):
    meta = _meta()
    cells = cells_for_bounds(spark, (-90.0, 0.0, 0.0, 60.0), ZOOM)
    out = fetch_tiles(
        cells,
        meta,
        xyz_request("fake://{z}/{x}/{y}"),
        transport=_make_fake_transport(),
        decoder=raw_decoder("float32", 1, SIZE),
        max_retries=2,
        retry_delay=0.0,
    ).collect()

    n_cells = cells.count()
    from raquet_spark.functions import quadbin as qb

    tiles = {
        (r["qb_x"], r["qb_y"]): r
        for r in qb.with_tile(
            spark.createDataFrame([(r["block"], r["band_1"]) for r in out],
                                  "block bigint, band_1 binary"),
            "block",
        ).collect()
    }
    # the permanently-failing tile is dropped, everything else present
    assert (5, 6) not in tiles
    assert len(tiles) == n_cells - 1
    for (x, y), r in tiles.items():
        np.testing.assert_array_equal(
            decode_block(r["band_1"], "float32"), _expected(x, y, ZOOM)
        )


def test_fetch_tiles_retries_transients(spark):
    meta = _meta()
    cells = cells_for_bounds(spark, (-90.0, 45.0, -46.0, 60.0), ZOOM)
    n_cells = cells.count()
    out = fetch_tiles(
        cells.coalesce(1),  # single python worker so the per-process call
        meta,               # counter sees every retry of a given url
        xyz_request("fake://{z}/{x}/{y}"),
        transport=_make_flaky_transport(),
        decoder=raw_decoder("float32", 1, SIZE),
        max_retries=4,
        retry_delay=0.0,
    ).collect()
    # every transient failure is retried to success inside the task
    assert len(out) == n_cells


def test_fetch_tiles_all_decode_failures_raise(spark):
    """One undecodable tile is partial coverage; EVERY tile failing to
    decode (wrong dtype/size config) must surface, not yield an empty
    dataset."""
    meta = _meta()
    cells = cells_for_bounds(spark, (-90.0, 0.0, 0.0, 60.0), ZOOM)
    assert cells.count() >= 4

    def bad_decoder(raw: bytes):
        raise ValueError("decoder misconfigured")

    with pytest.raises(Exception, match="failed to decode"):
        fetch_tiles(
            cells.coalesce(1),  # one partition so the rate check sees all
            meta,
            xyz_request("fake://{z}/{x}/{y}"),
            transport=_make_fake_transport(),
            decoder=bad_decoder,
            max_retries=2,
            retry_delay=0.0,
        ).collect()


def test_imageserver_request_params():
    build = imageserver_request("https://example/ImageServer", 256, bands=[1, 3], token="T")
    url, params = build(2, 1, 2)
    assert url.endswith("/exportImage")
    assert params["bboxSR"] == params["imageSR"] == "3857"
    assert params["size"] == "256,256"
    assert params["format"] == "tiff"
    assert params["bandIds"] == "1,3"
    assert params["token"] == "T"
    xmin, ymin, xmax, ymax = (float(v) for v in params["bbox"].split(","))
    assert xmax > xmin and ymax > ymin
    b = tile_bounds_3857(2, 1, 2)
    assert (xmin, ymin, xmax, ymax) == pytest.approx(b)


def test_tile_bounds_quadrants():
    # z=1: tile (0,0) is the north-west quadrant
    xmin, ymin, xmax, ymax = tile_bounds_3857(0, 0, 1)
    assert xmin == pytest.approx(-20037508.342789244)
    assert xmax == pytest.approx(0.0)
    assert ymin == pytest.approx(0.0)
    assert ymax == pytest.approx(20037508.342789244)


def test_cells_for_bounds_count(spark):
    df = cells_for_bounds(spark, (-10.0, 35.0, 5.0, 45.0), 6)
    rows = df.count()
    # x and y spans derived independently
    import math as m

    def tx(lon):
        return min(max(int((lon / 360.0 + 0.5) * 64), 0), 63)

    def ty(lat):
        s = m.sin(m.radians(lat))
        yf = 0.5 - 0.25 * m.log((1.0 + s) / (1.0 - s)) / m.pi
        return min(max(int(yf * 64), 0), 63)

    assert rows == (tx(5.0) - tx(-10.0) + 1) * (ty(35.0) - ty(45.0) + 1)


def test_tiff_decoder_roundtrip(spark, tmp_path):
    from raquet_spark.sources.geotiff import write_geotiff
    from raquet_spark.testing import make_synthetic_raster

    tiles, meta = make_synthetic_raster(
        spark, zoom=5, tiles_x=1, tiles_y=1, origin_x=4, origin_y=6,
        block_size=8, num_bands=2, dtype="int32",
    )
    path = str(tmp_path / "tile.tif")
    write_geotiff(tiles, meta, path)
    with open(path, "rb") as f:
        raw = f.read()
    arr = tiff_decoder(raw)
    assert arr.shape == (2, 8, 8)
    row = tiles.where("block != 0").first()
    for bi, band in enumerate(["band_1", "band_2"]):
        np.testing.assert_array_equal(
            arr[bi].ravel().astype("f8"),
            decode_block(row[band], "int32").astype("f8"),
        )


def test_stream_fetch_tiles(spark, tmp_path):
    """Streaming remote ingestion: cell work-queue files arriving in a
    directory are fetched per micro-batch (fake transport) and appended
    Morton-sorted; a second drop of cells extends the dataset without
    re-fetching the first batch."""
    import os

    from raquet_spark.streaming.ingest import stream_fetch_tiles

    meta = _meta()
    cells_dir = str(tmp_path / "cells")
    target = str(tmp_path / "out.parquet")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(cells_dir)

    all_cells = cells_for_bounds(spark, (-90.0, 45.0, -46.0, 60.0), ZOOM)
    ids = [r["block"] for r in all_cells.collect()]
    first, second = ids[: len(ids) // 2], ids[len(ids) // 2 :]

    def run(batch_ids):
        spark.createDataFrame([(b,) for b in batch_ids], "block bigint") \
            .write.mode("append").parquet(cells_dir)
        q = stream_fetch_tiles(
            spark, cells_dir, target, ckpt, meta,
            xyz_request("fake://{z}/{x}/{y}"),
            transport=_make_fake_transport(),
            decoder=raw_decoder("float32", 1, SIZE),
            retry_delay=0.0,
        )
        q.awaitTermination(120)

    run(first)
    n1 = spark.read.parquet(target).count()
    assert n1 == len(first)
    run(second)
    out = spark.read.parquet(target)
    assert out.count() == len(ids)
    # all fetched tiles decode to the deterministic payloads
    from raquet_spark.functions import quadbin as qb

    rows = qb.with_tile(out, "block").collect()
    for r in rows:
        np.testing.assert_array_equal(
            decode_block(r["band_1"], "float32"),
            _expected(r["qb_x"], r["qb_y"], ZOOM),
        )


# ------------------------------------------- ImageServer negotiation --


def _fake_imageserver(bs=16, zoom=6):
    """Transport faking an ArcGIS ImageServer: `f=json` serves service
    metadata (wkid 102100 web-mercator, 2×2 tiles at `zoom`), and
    exportImage serves raw float32 blobs derived from the request bbox."""
    import json
    import math

    O = math.pi * 6378137.0
    tile_m = 2 * O / (1 << zoom)
    tx0, ty0, nx, ny = 16, 20, 2, 2
    xmin = -O + tx0 * tile_m
    ymax = O - ty0 * tile_m
    res = tile_m / bs

    def transport(url, params):
        if params.get("f") == "json":
            return json.dumps({
                "name": "fake_service",
                "extent": {
                    "xmin": xmin, "ymin": ymax - ny * tile_m,
                    "xmax": xmin + nx * tile_m, "ymax": ymax,
                },
                "spatialReference": {"wkid": 102100},
                "pixelType": "F32",
                "bandCount": 1,
                "noDataValues": [-9.0],
                "pixelSizeX": res, "pixelSizeY": res,
                "rows": ny * bs, "columns": nx * bs,
            }).encode()
        # exportImage: recover the tile from the bbox
        bx = [float(v) for v in params["bbox"].split(",")]
        x = round((bx[0] + O) / tile_m)
        y = round((O - bx[3]) / tile_m)
        return (
            (np.arange(bs * bs, dtype="<f4") % 5 + x * 100 + y * 10)
            .astype("<f4").tobytes()
        )

    return transport


def test_imageserver_metadata_negotiation(spark):
    """End-to-end ImageServer conversion with NO caller-supplied zoom or
    bounds: the service JSON drives CRS, dtype, nodata, extent and the
    auto-derived zoom (reference imageserver.py:131,268)."""
    from raquet_spark.sources.remote import (
        get_imageserver_metadata,
        imageserver_to_raquet,
        imageserver_zoom,
        raw_decoder,
    )

    bs, zoom = 16, 6
    t = _fake_imageserver(bs=bs, zoom=zoom)
    svc = get_imageserver_metadata("fake://svc/ImageServer", transport=t)
    assert svc["epsg"] == 3857
    assert svc["pixel_type"] == "float32"
    assert svc["nodata"] == -9.0
    assert imageserver_zoom(svc, block_size=bs) == zoom

    tiles, meta = imageserver_to_raquet(
        spark, "fake://svc/ImageServer", block_size=bs,
        transport=t, decoder=raw_decoder("float32", 1, bs),
        retry_delay=0.0, compression=None,
    )
    assert meta["tiling"]["max_zoom"] == zoom
    assert meta["bands"][0]["nodata"] == -9.0
    rows = {r["block"]: r for r in tiles.collect()}
    assert len(rows) == 4  # 2×2 covering tiles

    from raquet_spark.functions import quadbin as qb
    from raquet_spark.functions.bands import decode_block

    cell = qb.py_tile_to_cell(16, 20, zoom)
    got = decode_block(rows[cell]["band_1"], "float32")
    want = (np.arange(bs * bs, dtype="<f4") % 5 + 16 * 100 + 20 * 10)
    np.testing.assert_array_equal(got, want.astype("f8"))
    # negotiated stats came along
    assert rows[cell]["band_1_count"] == bs * bs


def test_cli_fetch_imageserver_negotiated(monkeypatch, spark, tmp_path, capsys):
    """`fetch --service imageserver` with NO --bbox/--zoom negotiates
    everything from the service JSON (the reference convert-imageserver
    default, r14) and decodes the service's TIFF responses with the
    default decoder; --no-compression stores raw blocks."""
    import raquet_spark.sources.remote as remote
    from raquet_spark.cli import main
    from raquet_spark.sources.raquet import read_raquet, read_raquet_metadata

    raw_t = _fake_imageserver(bs=16, zoom=6)

    def t(url, params):
        # minimal little-endian classic TIFF (one float32 band, one
        # uncompressed strip) — what format=tiff emits and what the
        # CLI's default tiff_decoder parses; built inline so the
        # closure ships to executors self-contained
        import struct

        out = raw_t(url, params)
        if params.get("f") == "json":
            return out
        data = np.frombuffer(out, dtype="<f4").astype("<f4").tobytes()
        h = w = 16
        entries = [
            (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 32),
            (259, 3, 1, 1), (262, 3, 1, 1), (273, 4, 1, 0),
            (277, 3, 1, 1), (278, 3, 1, h), (279, 4, 1, len(data)),
            (339, 3, 1, 3),
        ]
        data_off = 8 + 2 + 12 * len(entries) + 4
        buf = struct.pack("<2sHI", b"II", 42, 8)
        buf += struct.pack("<H", len(entries))
        for tag, typ, cnt, val in entries:
            if tag == 273:
                val = data_off
            buf += struct.pack("<HHII", tag, typ, cnt, val)
        buf += struct.pack("<I", 0)
        return buf + data

    monkeypatch.setattr(remote, "http_transport", lambda timeout=30.0: t)
    out = str(tmp_path / "neg.parquet")
    assert main(["fetch", "https://example/ImageServer", out,
                 "--service", "imageserver", "--block-size", "16",
                 "--no-compression"]) == 0
    capsys.readouterr()
    meta = read_raquet_metadata(spark, out)
    assert meta["compression"] is None
    assert meta["bands"][0]["type"] == "float32"
    rows = read_raquet(spark, out).collect()
    assert len(rows) == 4  # the fake service's 2x2 extent
    # raw (uncompressed) block: exactly bs*bs float32 bytes
    assert len(bytes(rows[0]["band_1"])) == 16 * 16 * 4

    # xyz without --bbox/--zoom is an error, not a crash
    assert main(["fetch", "fake://{z}/{x}/{y}",
                 str(tmp_path / "x.parquet")]) == 1
    assert "required for xyz" in capsys.readouterr().out


def test_imageserver_bbox_filter(spark):
    """--bbox WITHOUT --zoom on the imageserver path restricts the
    negotiated fetch to the intersection with the service extent
    (ADVICE r14 — previously the bbox was silently ignored and the
    full extent fetched): a bbox interior to one tile of the fake
    2x2 service fetches exactly that tile, and a disjoint bbox is a
    named error, not a silent widening."""
    import math

    from raquet_spark.functions import quadbin as qb
    from raquet_spark.sources.remote import imageserver_to_raquet, raw_decoder

    bs, zoom = 16, 6
    t = _fake_imageserver(bs=bs, zoom=zoom)
    O = math.pi * 6378137.0
    tile_m = 2 * O / (1 << zoom)
    cx = -O + 16.5 * tile_m  # center of tile (16, 20)
    cy = O - 20.5 * tile_m

    def lon(x):
        return x / O * 180.0

    def lat(y):
        return math.degrees(2 * math.atan(math.exp(y / 6378137.0)) - math.pi / 2)

    bounds = (lon(cx - 0.1 * tile_m), lat(cy - 0.1 * tile_m),
              lon(cx + 0.1 * tile_m), lat(cy + 0.1 * tile_m))
    tiles, meta = imageserver_to_raquet(
        spark, "fake://svc/ImageServer", block_size=bs, transport=t,
        decoder=raw_decoder("float32", 1, bs), retry_delay=0.0,
        compression=None, bounds=bounds,
    )
    rows = tiles.collect()
    assert len(rows) == 1
    assert rows[0]["block"] == qb.py_tile_to_cell(16, 20, zoom)
    # the recorded extent shrinks to the covered tile, not the service
    assert meta["width"] == bs and meta["height"] == bs

    with pytest.raises(ValueError, match="does not intersect"):
        imageserver_to_raquet(
            spark, "fake://svc/ImageServer", block_size=bs, transport=t,
            decoder=raw_decoder("float32", 1, bs), retry_delay=0.0,
            compression=None, bounds=(10.0, 10.0, 11.0, 11.0),
        )


def test_cli_fetch_xyz_no_compression_metadata(monkeypatch, spark, tmp_path, capsys):
    """On the manual xyz path, --no-compression must be recorded in the
    written metadata (ADVICE r14: blocks were stored raw while the
    metadata claimed gzip, so spec-conformant readers misdecoded)."""
    import raquet_spark.sources.remote as remote
    from raquet_spark.cli import main
    from raquet_spark.sources.raquet import read_raquet, read_raquet_metadata

    t = _make_fake_transport()
    monkeypatch.setattr(remote, "http_transport", lambda timeout=30.0: t)
    out = str(tmp_path / "xyz_raw.parquet")
    assert main(["fetch", "fake://{z}/{x}/{y}", out,
                 "--bbox=-130,20,-60,55", "--zoom", str(ZOOM),
                 "--block-size", str(SIZE), "--no-compression"]) == 0
    capsys.readouterr()
    meta = read_raquet_metadata(spark, out)
    assert meta["compression"] is None
    rows = read_raquet(spark, out).limit(1).collect()
    # raw block: exactly SIZE*SIZE float32 bytes, no gzip header
    blk = bytes(rows[0]["band_1"])
    assert len(blk) == SIZE * SIZE * 4
    assert blk[:2] != b"\x1f\x8b"
