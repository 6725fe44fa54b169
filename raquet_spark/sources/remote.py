"""Distributed remote tile ingestion: HTTP tile fetch over a cell
DataFrame.

Reference parity: /root/reference/raquet/imageserver.py (ESRI
ImageServer ``exportImage`` poll loop, linear-backoff retries at
imageserver.py:64-114, per-tile TIFF responses at :399-420) and the
earthengine.py export flow. Both reference converters loop tiles on one
node; here the tile-cell DataFrame is the work queue and every executor
fetches its partition's tiles concurrently — 1000 executors ingest 1000
tiles at a time, with per-partition rate limiting so the fleet doesn't
stampede the server.

Shape: cells (one ``block`` per target tile) → ``mapInPandas`` fetch
(pluggable transport; urllib default; linear backoff like the
reference) → decode (TIFF via our own parser, or raw little-endian
blobs) → RaQuet tile rows. Compose with ``sources.raquet.write_raquet``
for batch, or drop fetched micro-batches into the ``stream_tiles``
watch directory for continuous ingestion."""

from __future__ import annotations

import math
import time
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raquet_spark.functions import quadbin as qb
from raquet_spark.functions.bands import encode_block

_EARTH_R = 6378137.0
_ORIGIN_SHIFT = math.pi * _EARTH_R


def cells_for_bounds(
    spark: SparkSession,
    bounds: tuple[float, float, float, float],
    zoom: int,
) -> DataFrame:
    """WGS84 bbox → DataFrame of covering tile cells at ``zoom`` (the
    work queue for ``fetch_tiles``). Driver work is four scalar Mercator
    conversions; the cell enumeration itself is a distributed
    sequence-explode, so a continent-sized bbox at z15 (~10^8 cells)
    never materializes on the driver."""
    west, south, east, north = bounds
    m = 1 << zoom

    def tx(lon: float) -> int:
        return min(max(int((lon / 360.0 + 0.5) * m), 0), m - 1)

    def ty(lat: float) -> int:
        # Mercator is undefined at the poles; clamp like mercantile and
        # find_minzoom (core/metadata.py) so bboxes touching ±90 work.
        lat = min(max(lat, -85.051128779806), 85.051128779806)
        s = math.sin(math.radians(lat))
        yf = 0.5 - 0.25 * math.log((1.0 + s) / (1.0 - s)) / math.pi
        return min(max(int(yf * m), 0), m - 1)

    x0, x1 = tx(west), tx(east)
    y0, y1 = ty(north), ty(south)
    cell = qb.tile_to_cell_sql("x", "y", zoom, "spark")
    return spark.sql(
        f"""
        SELECT {cell} AS block
        FROM (SELECT explode(sequence({x0}, {x1})) AS x)
        CROSS JOIN (SELECT explode(sequence({y0}, {y1})) AS y)
        """
    )


def tile_bounds_3857(x: int, y: int, z: int) -> tuple[float, float, float, float]:
    """(xmin, ymin, xmax, ymax) of a web-mercator tile in EPSG:3857
    meters (the reference's mercantile.xy_bounds)."""
    tile_m = 2.0 * _ORIGIN_SHIFT / (1 << z)
    xmin = -_ORIGIN_SHIFT + x * tile_m
    ymax = _ORIGIN_SHIFT - y * tile_m
    return (xmin, ymax - tile_m, xmin + tile_m, ymax)


def imageserver_request(
    service_url: str,
    size: int,
    bands: list[int] | None = None,
    token: str | None = None,
) -> Callable[[int, int, int], tuple[str, dict]]:
    """Request builder for ESRI ImageServer ``exportImage`` — same
    parameter set as the reference (imageserver.py:399-414): EPSG:3857
    bbox in/out, fixed pixel size, TIFF payload, nearest-neighbor."""

    def build(x: int, y: int, z: int) -> tuple[str, dict]:
        b = tile_bounds_3857(x, y, z)
        params = {
            "bbox": f"{b[0]},{b[1]},{b[2]},{b[3]}",
            "bboxSR": "3857",
            "imageSR": "3857",
            "size": f"{size},{size}",
            "format": "tiff",
            "f": "image",
            "interpolation": "RSP_NearestNeighbor",
        }
        if bands:
            params["bandIds"] = ",".join(str(i) for i in bands)
        if token:
            params["token"] = token
        return f"{service_url}/exportImage", params

    return build


def xyz_request(url_template: str) -> Callable[[int, int, int], tuple[str, dict]]:
    """Request builder for standard ``{z}/{x}/{y}`` tile endpoints."""

    def build(x: int, y: int, z: int) -> tuple[str, dict]:
        return url_template.format(x=x, y=y, z=z), {}

    return build


def http_transport(timeout: float = 30.0) -> Callable[[str, dict], bytes]:
    """Default transport: stdlib urllib GET returning raw bytes. Raises
    on HTTP errors; retry policy lives in ``fetch_tiles`` so injected
    test transports get the same treatment."""

    def get(url: str, params: dict) -> bytes:
        import urllib.parse
        import urllib.request

        full = url + ("?" + urllib.parse.urlencode(params) if params else "")
        with urllib.request.urlopen(full, timeout=timeout) as resp:
            return resp.read()

    return get


def tiff_decoder(raw: bytes) -> np.ndarray:
    """Decode a TIFF tile response to ``(nbands, h, w)`` with our own
    parser (uncompressed striped TIFF — the format our exporter writes
    and ImageServer emits for ``format=tiff`` when uncompressed).
    Compressed/lossy TIFF payloads raise (no image codec in this
    environment; see operators/layout.py for the honest stub)."""
    from raquet_spark.sources.geotiff import parse_tiff

    arr, _ = parse_tiff(raw)
    return np.moveaxis(arr, 2, 0)


def raw_decoder(band_type: str, nbands: int, size: int) -> Callable[[bytes], np.ndarray]:
    """Decoder for raw little-endian pixel blobs (band-sequential)."""
    from raquet_spark.functions.bands import DTYPES

    def decode(raw: bytes) -> np.ndarray:
        return np.frombuffer(raw, dtype=DTYPES[band_type]).reshape(nbands, size, size)

    return decode


def fetch_tiles(
    cells: DataFrame,
    metadata: dict,
    request_builder: Callable[[int, int, int], tuple[str, dict]],
    transport: Callable[[str, dict], bytes] | None = None,
    decoder: Callable[[bytes], np.ndarray] | None = None,
    *,
    max_retries: int = 5,
    retry_delay: float = 0.5,
    requests_per_second: float | None = None,
    compression: str | None = "gzip",
) -> DataFrame:
    """Fetch every cell's tile and return RaQuet rows ``(block,
    band_1..band_n binary)``.

    Per tile: build request → transport with ``max_retries`` attempts
    and linear backoff (``retry_delay * attempt``, the reference's
    schedule, imageserver.py:95-114) → decode → per-band encode. A tile
    whose fetch ultimately fails or returns empty is dropped (partial
    coverage, reference behavior for empty exports). State is
    partition-local; the only shuffle is whatever produced ``cells``."""
    from raquet_spark.session import ensure_package_shipped

    ensure_package_shipped(cells.sparkSession)
    transport = transport or http_transport()
    decoder = decoder or tiff_decoder
    band_meta = [(b["name"], b["type"]) for b in metadata["bands"]]
    min_interval = 1.0 / requests_per_second if requests_per_second else 0.0

    src = qb.with_tile(cells.select("block"), "block")

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        last_req = 0.0
        for pdf in batches:
            out: dict[str, list] = {"block": []}
            for name, _ in band_meta:
                out[name] = []
            for _, row in pdf.iterrows():
                x, y, z = int(row["qb_x"]), int(row["qb_y"]), int(row["qb_z"])
                url, params = request_builder(x, y, z)
                raw = None
                for attempt in range(1, max_retries + 1):
                    if min_interval:
                        wait = min_interval - (time.monotonic() - last_req)
                        if wait > 0:
                            time.sleep(wait)
                        last_req = time.monotonic()
                    try:
                        raw = transport(url, params)
                        break
                    except Exception:
                        if attempt == max_retries:
                            raw = None
                        else:
                            time.sleep(retry_delay * attempt)
                if not raw or len(raw) < 8:
                    continue  # unfetchable/empty tile -> partial coverage
                try:
                    pixels = decoder(raw)
                except Exception:
                    # Truncated body or an HTTP-200 HTML/JSON error page
                    # (common for ImageServer): drop the one tile, keep
                    # the documented partial-coverage contract.
                    continue
                out["block"].append(int(row["block"]))
                for bi, (name, btype) in enumerate(band_meta):
                    out[name].append(encode_block(pixels[bi].ravel(), btype, compression))
            yield pd.DataFrame(out)

    schema = "block bigint, " + ", ".join(f"{n} binary" for n, _ in band_meta)
    return src.mapInPandas(fetch, schema=schema)
