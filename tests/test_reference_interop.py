"""Cross-implementation interop: RaQuet files WRITTEN BY THIS REPO must
validate under the REFERENCE implementation's own validator
(/root/reference/raquet/validate.py:342 ``validate_raquet`` — pure
pyarrow + stdlib + a ``quadbin`` import). This is the one direction of
cross-implementation interop that is feasible in-sandbox (the
reference's converters need GDAL; its validator does not), and it is
the strongest spec-conformance gate available: the reference code
itself, executed unmodified, judging our writer's output (VERDICT r15
item 7).

The reference's ``quadbin`` dependency (PyPI, absent in this container,
used only as ``cell_to_tile``) is satisfied with this repo's
``py_cell_to_tile`` — itself pinned against the quadbin SQL semantics
in test_quadbin.py, so the shim does not let our own bugs vouch for
themselves on anything except tile-coordinate decoding.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import types

import pytest

REF_VALIDATE = "/root/reference/raquet/validate.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_VALIDATE), reason="reference validator absent"
)


@pytest.fixture(scope="module")
def ref_validate():
    """Load the reference validator unmodified, shimming only its
    ``quadbin`` import (see module docstring)."""
    from raquet_spark.functions.quadbin import py_cell_to_tile

    shim = types.ModuleType("quadbin")
    shim.cell_to_tile = py_cell_to_tile
    had = "quadbin" in sys.modules
    if not had:
        sys.modules["quadbin"] = shim
    try:
        spec = importlib.util.spec_from_file_location(
            "reference_validate", REF_VALIDATE
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        if not had:
            del sys.modules["quadbin"]
    return mod


@pytest.fixture(scope="module")
def raster(spark):
    from raquet_spark.testing import make_synthetic_raster

    tiles, meta = make_synthetic_raster(
        spark, zoom=6, tiles_x=4, tiles_y=4, origin_x=16, origin_y=20,
        block_size=32, num_bands=2, dtype="float32", nodata=-1.0,
        nodata_every=7,
    )
    return tiles.cache(), meta


def _attach_global_stats(tiles, meta) -> dict:
    """GDAL-style STATISTICS_* on each band (what the reference's own
    converter embeds; its validator warns when absent)."""
    from raquet_spark.operators.tile_stats import (
        aggregate_band_stats,
        with_tile_stats,
    )

    stats = with_tile_stats(tiles, meta)
    out = json.loads(json.dumps(meta))  # deep copy
    for band in out["bands"]:
        g = aggregate_band_stats(stats, band["name"]).collect()[0]
        band.update({
            "STATISTICS_MINIMUM": g["min"],
            "STATISTICS_MAXIMUM": g["max"],
            "STATISTICS_MEAN": g["mean"],
            "STATISTICS_STDDEV": g["stddev"],
        })
    return out


def test_written_file_is_reference_valid(spark, raster, tmp_path, ref_validate):
    """Base (single-zoom) write → reference-validator green: zero
    errors, and zero warnings once band statistics are embedded."""
    from raquet_spark.sources.raquet import write_raquet

    tiles, meta = raster
    path = str(tmp_path / "interop.parquet")
    write_raquet(tiles, path, _attach_global_stats(tiles, meta))

    # write_raquet writes a directory dataset (metadata row and tiles
    # may land in different Morton-ranged part files); the reference
    # validator's pyarrow.parquet.read_table reads a directory dataset
    # as one table, so pass the dataset root — the same object a
    # reference user would hand to a parquet reader
    result = ref_validate.validate_raquet(path)
    assert result.errors == []
    assert result.is_valid
    assert result.warnings == []
    assert result.stats["num_bands"] == 2


def test_pyramid_file_is_reference_valid(spark, raster, tmp_path, ref_validate):
    """Pyramided write → the reference's per-zoom coverage check (every
    zoom in [min_zoom, max_zoom] populated, 100% valid tiles)."""
    from raquet_spark.operators.pyramid import build_pyramid
    from raquet_spark.sources.raquet import write_raquet

    tiles, meta = raster
    pyr, meta2 = build_pyramid(tiles, meta, min_zoom=4, resampling="average")
    path = str(tmp_path / "interop_pyr.parquet")
    write_raquet(pyr, path, _attach_global_stats(tiles, meta2))

    result = ref_validate.validate_raquet(path)
    assert result.errors == []
    assert result.is_valid
    zl = result.stats["zoom_levels"]
    assert sorted(zl) == [4, 5, 6]
    assert all(z["valid_percent"] == 100.0 for z in zl.values())


@pytest.mark.skipif(
    not os.path.exists("/root/reference/tests/n37_w123_1arc_v2.tif"),
    reason="reference DEM absent",
)
def test_real_conversion_is_reference_valid(spark, tmp_path, ref_validate):
    """The REAL conversion path (GeoTIFF → warp → tiles → metadata →
    write), not a synthetic fixture: import the reference repo's own
    n37 DEM and validate our written output with the reference's
    validator — CRS/bounds/band metadata from the production pipeline
    under the reference's rules."""
    from raquet_spark.sources.raquet import write_raquet
    from raquet_spark.sources.tiff_reader import geotiff_to_raquet

    tiles, meta = geotiff_to_raquet(
        spark, "/root/reference/tests/n37_w123_1arc_v2.tif",
        block_size=256,
    )
    path = str(tmp_path / "n37_interop.parquet")
    write_raquet(tiles, path, meta)
    result = ref_validate.validate_raquet(path)
    assert result.errors == []
    assert result.is_valid


def test_partitioned_directories_are_reference_valid(
    spark, raster, tmp_path, ref_validate
):
    """Spec §Partitioned Datasets rule: every hive partition directory
    is a standalone RaQuet dataset — each must pass the reference
    validator on its own."""
    from raquet_spark.sources.raquet import write_raquet_partitioned

    tiles, meta = raster
    root = str(tmp_path / "interop_parts.parquet")
    write_raquet_partitioned(tiles, root, meta, partition_zoom=5)
    parts = [d for d in os.listdir(root) if d.startswith("part_cell=")]
    assert len(parts) >= 2
    for d in parts:
        result = ref_validate.validate_raquet(os.path.join(root, d))
        assert result.errors == [], (d, result.errors)
        assert result.is_valid


def test_reference_validator_rejects_broken_file(tmp_path, ref_validate):
    """Negative control: the gate actually bites. A parquet file with
    no metadata row and a non-binary band column must come back
    invalid with both defects named."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({
        "block": pa.array([5], type=pa.int64()),
        "metadata": pa.array([None], type=pa.string()),
        "band_1": pa.array([1.5], type=pa.float64()),
    })
    p = str(tmp_path / "broken.parquet")
    pq.write_table(t, p)
    result = ref_validate.validate_raquet(p)
    assert not result.is_valid
    assert any("block=0" in e or "metadata" in e.lower() for e in result.errors)
