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

    # east/south shrink by mercantile's LL_EPSILON so a bbox whose edge
    # sits exactly on a tile boundary doesn't pull in an empty row/column
    # (mercantile.tiles() behavior, which the reference iterates)
    eps = 1e-11
    x0, x1 = tx(west), max(tx(east - eps), tx(west))
    y0, y1 = ty(north), max(ty(south + eps), ty(north))
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


# ArcGIS pixelType → numpy dtype (imageserver.py:163-176)
_PIXEL_TYPES = {
    "U1": "uint8", "U2": "uint8", "U4": "uint8", "U8": "uint8",
    "S8": "int8", "U16": "uint16", "S16": "int16",
    "U32": "uint32", "S32": "int32", "F32": "float32", "F64": "float64",
}
# ESRI web-mercator wkid variants (imageserver.py:259)
_WKID_TO_EPSG = {102100: 3857, 102113: 3785}


def get_imageserver_metadata(
    service_url: str,
    transport: Callable[[str, dict], bytes] | None = None,
    token: str | None = None,
) -> dict:
    """Fetch and parse an ArcGIS ImageServer's service JSON — extent,
    CRS, pixel type, band count, nodata, pixel size, dimensions — so
    conversion needs no caller-supplied zoom/bounds. Mirrors the
    reference's ``get_imageserver_metadata``
    (/root/reference/raquet/imageserver.py:131-226)."""
    import json

    transport = transport or http_transport()
    service_url = service_url.rstrip("/")
    params = {"f": "json"}
    if token:
        params["token"] = token
    data = json.loads(transport(service_url, params).decode("utf-8"))
    if "error" in data:
        err = data["error"]
        raise ValueError(f"ImageServer error: {err.get('message', 'unknown')}")

    extent = data.get("extent", {})
    spatial_ref = data.get("spatialReference", extent.get("spatialReference", {}))
    wkid = spatial_ref.get("wkid") or spatial_ref.get("latestWkid")
    epsg = _WKID_TO_EPSG.get(wkid, wkid) if wkid else 4326

    px_x = float(data.get("pixelSizeX", 1.0))
    px_y = float(data.get("pixelSizeY", 1.0))
    rows, columns = data.get("rows"), data.get("columns")
    if not rows or not columns:
        # derive from extent and pixel size, like the reference
        if px_x > 0 and px_y > 0:
            columns = int((extent.get("xmax", 0) - extent.get("xmin", 0)) / px_x)
            rows = int((extent.get("ymax", 0) - extent.get("ymin", 0)) / px_y)
        else:
            rows = columns = 0
    nodata_values = data.get("noDataValues") or []
    return {
        "name": data.get("name", "Unknown"),
        "extent": extent,
        "epsg": epsg,
        "pixel_type": _PIXEL_TYPES.get(data.get("pixelType", "U8"), "float32"),
        "band_count": int(data.get("bandCount", 1)),
        "nodata": nodata_values[0] if nodata_values else None,
        "pixel_size_x": px_x,
        "pixel_size_y": px_y,
        "rows": int(rows),
        "columns": int(columns),
    }


def _extent_to_mercator(svc: dict) -> tuple[float, float, float, float]:
    """Service extent → (xmin, ymin, xmax, ymax) EPSG:3857 meters.
    Closed-form for geographic / web-mercator services (no proj
    database in this environment; the reference reaches for pyproj,
    imageserver.py:240)."""
    e = svc["extent"]
    xmin, ymin = e["xmin"], e["ymin"]
    xmax, ymax = e["xmax"], e["ymax"]
    if svc["epsg"] in (3857, 3785, 900913):
        return (xmin, ymin, xmax, ymax)
    if svc["epsg"] == 4326:
        def mx(lon: float) -> float:
            return lon / 180.0 * _ORIGIN_SHIFT

        def my(lat: float) -> float:
            lat = min(max(lat, -85.051128779806), 85.051128779806)
            return _EARTH_R * math.log(math.tan(math.pi / 4 + math.radians(lat) / 2))

        return (mx(xmin), my(ymin), mx(xmax), my(ymax))
    raise NotImplementedError(
        f"ImageServer CRS EPSG:{svc['epsg']} (closed-form 4326/3857 only)"
    )


def imageserver_zoom(svc: dict, block_size: int = 256) -> int:
    """Auto tile zoom from the service's native resolution — the
    reference's ``_calculate_target_resolution``
    (imageserver.py:268-303): mean mercator meters/pixel → the zoom
    whose ``block_size`` tiles match it, clamped to quadbin range."""
    xmin, ymin, xmax, ymax = _extent_to_mercator(svc)
    if svc["columns"] <= 0 or svc["rows"] <= 0:
        raise ValueError("service reports no raster dimensions")
    res_m = ((xmax - xmin) / svc["columns"] + (ymax - ymin) / svc["rows"]) / 2.0
    block_zoom = int(math.log2(block_size))
    raw_zoom = math.log2(2.0 * _ORIGIN_SHIFT / (res_m * block_size))
    return max(0, min(26 - block_zoom, round(raw_zoom)))


def imageserver_to_raquet(
    spark: SparkSession,
    service_url: str,
    block_size: int = 256,
    zoom: int | None = None,
    bands: list[int] | None = None,
    token: str | None = None,
    transport: Callable[[str, dict], bytes] | None = None,
    compression: str | None = "gzip",
    stats: bool = True,
    bounds: tuple[float, float, float, float] | None = None,
    **fetch_kwargs,
) -> tuple[DataFrame, dict]:
    """ImageServer → RaQuet with metadata negotiation: one service-JSON
    request derives CRS, extent, dtype, nodata and the target zoom; the
    covering cells become the distributed fetch queue. Parity:
    reference ``convert_imageserver_to_raquet`` (imageserver.py:438+,
    cli.py) — but the tile loop is the executors', not one node's.
    ``bounds`` (WGS84 west,south,east,north) restricts the fetch to the
    intersection with the negotiated service extent, matching the
    reference's optional bbox filter alongside negotiation."""
    from raquet_spark.core.metadata import BandMeta, build_metadata

    svc = get_imageserver_metadata(service_url, transport=transport, token=token)
    z = zoom if zoom is not None else imageserver_zoom(svc, block_size)
    xmin, ymin, xmax, ymax = _extent_to_mercator(svc)

    def lon(x: float) -> float:
        return x / _ORIGIN_SHIFT * 180.0

    def lat(y: float) -> float:
        return math.degrees(2.0 * math.atan(math.exp(y / _EARTH_R)) - math.pi / 2)

    if bounds is not None:
        bw, bs, be, bn = (float(v) for v in bounds)

        def mx(v: float) -> float:
            return v / 180.0 * _ORIGIN_SHIFT

        def my(v: float) -> float:
            v = min(max(v, -85.051128779806), 85.051128779806)
            return _EARTH_R * math.log(math.tan(math.pi / 4 + math.radians(v) / 2))

        xmin, ymin = max(xmin, mx(bw)), max(ymin, my(bs))
        xmax, ymax = min(xmax, mx(be)), min(ymax, my(bn))
        if xmin >= xmax or ymin >= ymax:
            raise ValueError(
                f"bbox {bounds} does not intersect the service extent"
            )

    wgs = (lon(xmin), lat(ymin), lon(xmax), lat(ymax))
    cells = cells_for_bounds(spark, wgs, z)

    n_bands = len(bands) if bands else svc["band_count"]
    band_meta = [
        BandMeta(
            name=f"band_{i + 1}",
            type=svc["pixel_type"],
            nodata=svc["nodata"],
            colorinterp="gray" if n_bands == 1 else "undefined",
        )
        for i in range(n_bands)
    ]
    # tile-aligned covering extent drives the recorded dims/bounds
    m = 1 << z

    def txi(x: float) -> int:
        return min(max(int((x + _ORIGIN_SHIFT) / (2 * _ORIGIN_SHIFT) * m), 0), m - 1)

    def tyi(y: float) -> int:
        return min(max(int((_ORIGIN_SHIFT - y) / (2 * _ORIGIN_SHIFT) * m), 0), m - 1)

    # same boundary-exclusive epsilon as cells_for_bounds (here in meters)
    tx0, tx1 = txi(xmin), max(txi(xmax - 1e-6), txi(xmin))
    ty0, ty1 = tyi(ymax), max(tyi(ymin + 1e-6), tyi(ymax))
    tile_m = 2.0 * _ORIGIN_SHIFT / m
    meta = build_metadata(
        bands=band_meta,
        bounds=(
            lon(-_ORIGIN_SHIFT + tx0 * tile_m),
            lat(_ORIGIN_SHIFT - (ty1 + 1) * tile_m),
            lon(-_ORIGIN_SHIFT + (tx1 + 1) * tile_m),
            lat(_ORIGIN_SHIFT - ty0 * tile_m),
        ),
        width=(tx1 - tx0 + 1) * block_size,
        height=(ty1 - ty0 + 1) * block_size,
        block_width=block_size,
        block_height=block_size,
        min_zoom=z,
        max_zoom=z,
        compression=compression,
        tile_statistics=stats,
    )
    tiles = fetch_tiles(
        cells,
        meta,
        imageserver_request(service_url, block_size, bands=bands, token=token),
        transport=transport,
        compression=compression,
        **fetch_kwargs,
    )
    if stats:
        from raquet_spark.operators.tile_stats import with_tile_stats

        tiles = with_tile_stats(tiles, meta)
    return tiles, meta


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
        decode_tried = 0
        decode_failed = 0
        for pdf in batches:
            out: dict[str, list] = {"block": []}
            for name, _ in band_meta:
                out[name] = []
            for row in pdf.to_dict("records"):
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
                decode_tried += 1
                try:
                    pixels = decoder(raw)
                except Exception:
                    # Truncated body or an HTTP-200 HTML/JSON error page
                    # (common for ImageServer): drop the one tile, keep
                    # the documented partial-coverage contract.
                    decode_failed += 1
                    continue
                out["block"].append(int(row["block"]))
                for bi, (name, btype) in enumerate(band_meta):
                    out[name].append(encode_block(pixels[bi].ravel(), btype, compression))
            yield pd.DataFrame(out)
        # a stray bad tile is partial coverage, but EVERY fetched tile
        # failing to decode is a systematic misconfiguration (wrong
        # dtype/block size/band count in the decoder) — surface it
        # instead of yielding a silently empty dataset
        if decode_tried >= 4 and decode_failed == decode_tried:
            raise RuntimeError(
                f"all {decode_tried} fetched tiles in this partition failed to "
                "decode — decoder configuration (dtype/block size/bands) "
                "likely does not match the service response"
            )

    schema = "block bigint, " + ", ".join(f"{n} binary" for n, _ in band_meta)
    return src.mapInPandas(fetch, schema=schema)
