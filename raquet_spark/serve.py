"""HTTP tile serving for RaQuet tables — stdlib only.

The server core behind ``examples/server_viewer.py`` and the
``python -m raquet_spark serve`` subcommand. Mirrors the reference
example server (reference examples/server_viewer.py: FastAPI + DuckDB
+ Pillow) with this repo's own pieces: ``http.server``, pyarrow
row-group-pruned ``block`` lookups, and the pure-python VP8L codec
(browsers decode lossless WebP natively).

Endpoints: ``/`` (deck.gl viewer page), ``/metadata?file=PATH``,
``/tile/{z}/{x}/{y}?file=PATH[&bands=a,b,c]`` → ``image/webp``.
"""

from __future__ import annotations

import json
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from raquet_spark.functions.bands import decode_block
from raquet_spark.functions.quadbin import py_tile_to_cell
from raquet_spark.functions.webp import vp8l_encode

_metadata_cache: dict[str, dict] = {}


def get_metadata(path: str) -> dict:
    """Metadata JSON from the reserved ``block = 0`` row."""
    if path not in _metadata_cache:
        import pyarrow.parquet as pq

        t = pq.read_table(path, filters=[("block", "==", 0)], columns=["metadata"])
        if t.num_rows == 0:
            raise FileNotFoundError(f"no metadata row in {path}")
        _metadata_cache[path] = json.loads(t.column("metadata")[0].as_py())
    return _metadata_cache[path]


def fetch_tile(path: str, block: int, bands: list[str]) -> dict | None:
    """One tile row via parquet predicate pushdown (row-group pruning +
    page filtering on the sorted ``block`` column)."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, filters=[("block", "==", block)], columns=bands)
    if t.num_rows == 0:
        return None
    return {b: t.column(b)[0].as_py() for b in bands}


def band_to_uint8(buf: bytes, dtype: str, nodata) -> np.ndarray:
    """Decode one band blob and normalize to display uint8. ``nodata``
    may be the raw metadata value (incl. spec strings "NaN"/"Infinity"
    — parsed here) or an already-parsed float."""
    from raquet_spark.core.metadata import parse_nodata

    nodata = parse_nodata(nodata)
    arr = decode_block(buf, dtype).astype("f8")
    if nodata is not None:
        if isinstance(nodata, float) and np.isnan(nodata):
            arr = np.where(np.isfinite(arr), arr, np.nan)
        else:
            arr = np.where(arr == nodata, np.nan, arr)
    if dtype == "uint8":
        out = arr
    else:
        lo = np.nanmin(arr) if np.isfinite(np.nanmin(arr)) else 0.0
        hi = np.nanmax(arr) if np.isfinite(np.nanmax(arr)) else 1.0
        out = (arr - lo) / (hi - lo) * 255.0 if hi > lo else np.zeros_like(arr)
    return np.nan_to_num(out, nan=0.0).clip(0, 255).astype(np.uint8)


def render_tile(path: str, z: int, x: int, y: int, bands: list[str] | None) -> bytes | None:
    """Tile (z, x, y) → lossless WebP bytes, or None when absent."""
    meta = get_metadata(path)
    band_info = {b["name"]: b for b in meta["bands"]}
    if not bands:
        bands = [b["name"] for b in meta["bands"]][:3]
    missing = [b for b in bands if b not in band_info]
    if missing:
        raise KeyError(f"unknown bands {missing}; have {sorted(band_info)}")
    block = py_tile_to_cell(x, y, z)
    row = fetch_tile(path, block, bands)
    if row is None:
        return None
    tiling = meta.get("tiling", meta)  # repo nests under "tiling";
    w = tiling.get("block_width", 256)  # reference keeps it flat
    h = tiling.get("block_height", 256)
    planes = [
        band_to_uint8(
            row[b], band_info[b]["type"], band_info[b].get("nodata")
        ).reshape(h, w)
        for b in bands
    ]
    if len(planes) == 2:  # gray + alpha-ish second band → keep gray
        planes = planes[:1]
    img = planes[0][:, :, None] if len(planes) == 1 else np.stack(planes[:3], axis=2)
    return vp8l_encode(img)


_VIEWER_HTML = """<!DOCTYPE html>
<html>
<head>
  <title>raquet_spark tile viewer</title>
  <script src="https://unpkg.com/deck.gl@9.0.16/dist.min.js"></script>
  <style>
    body { margin: 0; font-family: sans-serif; }
    #map { width: 100vw; height: 100vh; }
    #controls { position: absolute; top: 10px; left: 10px;
                background: white; padding: 12px; border-radius: 8px; }
    input { width: 300px; padding: 6px; }
  </style>
</head>
<body>
  <div id="map"></div>
  <div id="controls">
    <h3>raquet_spark viewer</h3>
    <input id="fileUrl" placeholder="RaQuet parquet path">
    <button onclick="load()">Load</button>
    <div id="status"></div>
  </div>
  <script>
    let deckgl;
    async function load() {
      const file = document.getElementById('fileUrl').value;
      const meta = await (await fetch('/metadata?file=' + encodeURIComponent(file))).json();
      const t = meta.tiling || meta;  // repo nests under "tiling"; reference keeps it flat
      const minZ = t.min_zoom ?? meta.minresolution;
      const maxZ = t.max_zoom ?? meta.maxresolution;
      document.getElementById('status').textContent = 'tiles: ' + (t.num_blocks ?? meta.num_blocks ?? '?');
      const b = meta.bounds || [-180, -85, 180, 85];
      const layer = new deck.TileLayer({
        minZoom: minZ, maxZoom: maxZ,
        tileSize: t.block_width || meta.block_width || 256, extent: b,
        getTileData: ({index: {x, y, z}}) =>
          fetch(`/tile/${z}/${x}/${y}?file=${encodeURIComponent(file)}`)
            .then(r => r.ok ? r.blob() : null)
            .then(blob => blob ? createImageBitmap(blob) : null),
        renderSubLayers: p => p.data && new deck.BitmapLayer({
          ...p, image: p.data,
          bounds: [p.tile.bbox.west, p.tile.bbox.south, p.tile.bbox.east, p.tile.bbox.north]
        })
      });
      const view = { longitude: (b[0]+b[2])/2, latitude: (b[1]+b[3])/2, zoom: minZ };
      if (deckgl) deckgl.setProps({layers: [layer]});
      else deckgl = new deck.DeckGL({container: 'map', initialViewState: view, controller: true, layers: [layer]});
    }
  </script>
</body>
</html>"""


class TileHandler(BaseHTTPRequestHandler):
    default_file: str | None = None

    def log_message(self, *args) -> None:  # quiet for tests
        pass

    def _send(self, code: int, body: bytes, ctype: str) -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.send_header("Access-Control-Allow-Origin", "*")
        self.end_headers()
        self.wfile.write(body)

    def _error(self, code: int, msg: str) -> None:
        self._send(code, json.dumps({"detail": msg}).encode(), "application/json")

    def do_GET(self) -> None:  # noqa: N802 (stdlib handler API)
        try:
            parsed = urllib.parse.urlparse(self.path)
            qs = urllib.parse.parse_qs(parsed.query)
            file = qs.get("file", [self.default_file])[0]
            if parsed.path == "/":
                self._send(200, _VIEWER_HTML.encode(), "text/html")
            elif parsed.path == "/metadata":
                if not file:
                    return self._error(400, "file parameter required")
                self._send(200, json.dumps(get_metadata(file)).encode(), "application/json")
            elif parsed.path.startswith("/tile/"):
                if not file:
                    return self._error(400, "file parameter required")
                parts = parsed.path.split("/")
                if len(parts) != 5:
                    return self._error(400, "use /tile/{z}/{x}/{y}")
                z, x, y = (int(p) for p in parts[2:5])
                bands = qs.get("bands", [None])[0]
                band_list = bands.split(",") if bands else None
                body = render_tile(file, z, x, y, band_list)
                if body is None:
                    return self._error(404, "tile not found")
                self._send(200, body, "image/webp")
            else:
                self._error(404, "unknown endpoint")
        except FileNotFoundError as e:
            self._error(404, str(e))
        except (KeyError, ValueError) as e:
            self._error(400, str(e))
        except Exception as e:  # pragma: no cover - defensive 500
            self._error(500, f"{type(e).__name__}: {e}")


def make_server(port: int = 0, default_file: str | None = None) -> ThreadingHTTPServer:
    handler = type("Handler", (TileHandler,), {"default_file": default_file})
    return ThreadingHTTPServer(("127.0.0.1", port), handler)


