"""Tile-server example: serve a RaQuet table over HTTP and fetch tiles
back, decoding the WebP responses to the exact source pixels (mirrors
reference examples/server_viewer.py, which serves PNG via FastAPI)."""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from raquet_spark.functions.bands import decode_block
from raquet_spark.functions.quadbin import py_cell_to_tile
from raquet_spark.functions.webp import webp_decode_bands
from raquet_spark.sources.raquet import write_raquet
from raquet_spark.testing import make_synthetic_raster


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    import sys
    from pathlib import Path

    sys.path.insert(
        0, str(Path(__file__).resolve().parents[1] / "examples")
    )
    import server_viewer

    tiles, meta = make_synthetic_raster(
        spark, zoom=5, tiles_x=2, tiles_y=2, origin_x=4, origin_y=6,
        block_size=16, num_bands=1, dtype="uint8",
    )
    path = str(tmp_path_factory.mktemp("srv") / "raster.parquet")
    write_raquet(tiles, path, meta)

    srv = server_viewer.make_server(port=0, default_file=path)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    rows = {r["block"]: r for r in tiles.collect()}
    yield base, path, rows
    srv.shutdown()


def _get(url: str) -> bytes:
    with urllib.request.urlopen(url, timeout=10) as resp:
        return resp.read()


def test_metadata_endpoint(served):
    base, path, _rows = served
    meta = json.loads(_get(f"{base}/metadata"))
    assert meta["tiling"]["block_width"] == 16
    assert [b["name"] for b in meta["bands"]] == ["band_1"]


def test_tile_fetch_roundtrip_two_tiles(served):
    base, path, rows = served
    blocks = sorted(b for b in rows if b != 0)[:2]
    for block in blocks:
        x, y, z = py_cell_to_tile(block)
        body = _get(f"{base}/tile/{z}/{x}/{y}")
        assert body[:4] == b"RIFF" and body[8:12] == b"WEBP"
        img = webp_decode_bands(body, 1)
        want = decode_block(rows[block]["band_1"], "uint8").reshape(16, 16)
        np.testing.assert_array_equal(img[:, :, 0], want)


def test_viewer_page_and_missing_tile(served):
    base, _path, _rows = served
    html = _get(f"{base}/").decode()
    assert "TileLayer" in html
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(f"{base}/tile/5/0/0")
    assert exc.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(f"{base}/tile/5/0/0?bands=nope")
    assert exc.value.code == 400
