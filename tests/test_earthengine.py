"""Earth Engine conversion flow against a local fake backend: config,
tile-aligned export transform, poll semantics, end-to-end conversion
(reference earthengine.py — the SDK/auth parts are environment-gated
exactly as the reference gates them)."""

from __future__ import annotations

import numpy as np
import pytest

from raquet_spark.sources.earthengine import (
    EarthEngineAuthError,
    EarthEngineConfig,
    EarthEngineTaskError,
    earthengine_to_raquet,
    poll_task,
    web_mercator_transform,
)


def test_config_gcs_path_autogen():
    c = EarthEngineConfig(image_spec="A/B", gcs_bucket="b", output_path="o")
    p = c.get_gcs_path()
    assert p.startswith("raquet-temp/export-") and p.endswith(".tif")
    assert c.get_gcs_path() == p  # stable once generated
    c2 = EarthEngineConfig(
        image_spec="A/B", gcs_bucket="b", output_path="o", gcs_path="x/y.tif"
    )
    assert c2.get_gcs_path() == "x/y.tif"


def test_web_mercator_transform_reference_values():
    """Same constants as the reference (earthengine.py:185-205)."""
    t, region = web_mercator_transform(9)
    assert t[0] == pytest.approx(156543.03392804097 / 512)
    assert t == [t[0], 0, -20037508.342789244, 0, -t[0], 20037508.342789244]
    assert region["coordinates"][0][0] == [-20037508.342789244, -20037508.342789244]


def test_poll_task_semantics():
    seq = iter([{"state": "READY"}, {"state": "RUNNING"}, {"state": "COMPLETED"}])
    states = []
    out = poll_task(
        lambda: next(seq), poll_interval=0.0,
        progress_callback=lambda s, e: states.append(s),
    )
    assert out["state"] == "COMPLETED"
    assert states == ["READY", "RUNNING", "COMPLETED"]

    with pytest.raises(EarthEngineTaskError, match="failed"):
        poll_task(lambda: {"state": "FAILED", "error_message": "boom"},
                  poll_interval=0.0)
    with pytest.raises(TimeoutError):
        poll_task(lambda: {"state": "RUNNING"}, poll_interval=0.0, timeout=-1.0)


def test_real_backend_is_auth_gated():
    from raquet_spark.sources.earthengine import EEBackend

    with pytest.raises(EarthEngineAuthError, match="earthengine-api"):
        EEBackend()


class _FakeBackend:
    """Fakes the EE export: two RUNNING polls, then the 'exported'
    GeoTIFF materializes (written from synthetic tiles)."""

    def __init__(self, spark, tmp_path, zoom, bs):
        self.spark, self.tmp_path = spark, tmp_path
        self.zoom, self.bs = zoom, bs
        self.polls = 0
        self.cleaned = False
        self.submitted = None

    def submit(self, config):
        self.submitted = config.get_gcs_path()
        return "task-1"

    def status(self, task_id):
        assert task_id == "task-1"
        self.polls += 1
        return {"state": "RUNNING" if self.polls < 3 else "COMPLETED"}

    def fetch(self, config):
        from raquet_spark.sources.geotiff import write_geotiff
        from raquet_spark.testing import make_synthetic_raster

        tiles, meta = make_synthetic_raster(
            self.spark, zoom=self.zoom, tiles_x=2, tiles_y=2,
            origin_x=16, origin_y=20, block_size=self.bs,
            dtype="float32", nodata=-1.0, nodata_every=7,
        )
        self._tiles, self._meta = tiles, meta
        path = str(self.tmp_path / "export.tif")
        write_geotiff(tiles, meta, path)
        return path

    def cleanup(self, config):
        self.cleaned = True


def test_earthengine_to_raquet_fake_backend(spark, tmp_path):
    """End-to-end: submit → poll → fetch → distributed conversion with
    tile_zoom alignment (lossless re-tile) → temp cleanup."""
    from raquet_spark.functions.bands import decode_block

    zoom, bs = 6, 16
    backend = _FakeBackend(spark, tmp_path, zoom, bs)
    config = EarthEngineConfig(
        image_spec="FAKE/ASSET", gcs_bucket="b", output_path="o",
        tile_zoom=zoom, block_size=bs,
    )
    tiles, meta = earthengine_to_raquet(
        spark, config, backend=backend, poll_interval=0.0,
    )
    assert backend.polls == 3 and backend.cleaned
    assert config.crs == "EPSG:3857" and config.scale is None
    assert config.crs_transform is not None
    assert meta["tiling"]["max_zoom"] == zoom

    # tile-aligned export re-tiles losslessly: pixel-identical blocks
    src = {
        r["block"]: decode_block(r["band_1"], "float32")
        for r in backend._tiles.where("block != 0").collect()
    }
    got = {
        r["block"]: decode_block(r["band_1"], "float32")
        for r in tiles.where("block != 0").collect()
        if r["block"] in src
    }
    assert set(src) == set(got)
    for k in src:
        np.testing.assert_array_equal(src[k], got[k])


def test_cli_flag_mapping(monkeypatch, tmp_path, capsys):
    """import-earthengine maps the full reference flag set (gcs-path /
    region / crs / keep-temp / timeout / overviews) into
    EarthEngineConfig without touching the auth-gated backend."""
    import json

    import raquet_spark.sources.earthengine as ee_mod
    from raquet_spark.cli import main

    seen = {}

    def fake_run(spark, config, backend=None, poll_interval=10.0,
                 timeout=None, progress_callback=None):
        seen["config"] = config
        seen["timeout"] = timeout
        raise SystemExit(0)  # stop before write_raquet

    monkeypatch.setattr(ee_mod, "earthengine_to_raquet", fake_run)
    gj = str(tmp_path / "r.geojson")
    open(gj, "w").write(json.dumps(
        {"type": "Polygon", "coordinates": [[[0, 0], [1, 0], [1, 1],
                                             [0, 0]]]}
    ))
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["import-earthengine", "USGS/SRTMGL1_003",
              str(tmp_path / "out.parquet"), "--gcs-bucket", "b",
              "--gcs-path", "tmp/x.tif", "--region", gj,
              "--crs", "EPSG:32633", "--keep-temp",
              "--timeout", "120", "--bands", "B4,B3", "--streaming"])
    c = seen["config"]
    assert c.gcs_path == "tmp/x.tif"
    assert c.region["type"] == "Polygon"
    assert c.crs == "EPSG:32633"
    assert c.delete_temp is False
    assert c.bands == ["B4", "B3"]
    assert seen["timeout"] == 120.0
