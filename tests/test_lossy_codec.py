"""Lossy-compression spec rules (format-specs/raquet.md:272-275):
metadata validation accepts/rejects correctly, and the PIL-probed codec
stubs raise typed errors in this PIL-less container while constraint
checks still fire."""

from __future__ import annotations

import pytest

from raquet_spark.operators.layout import (
    check_lossy_constraints,
    to_interleaved,
)
from raquet_spark.sources.raquet import write_raquet
from raquet_spark.sources.validate import validate_raquet
from raquet_spark.testing import make_synthetic_raster


@pytest.fixture(scope="module")
def rgb(spark):
    return make_synthetic_raster(
        spark, zoom=5, tiles_x=2, tiles_y=2, origin_x=4, origin_y=6,
        block_size=16, num_bands=3, dtype="uint8",
    )


def _interleaved(spark, rgb):
    tiles, meta = rgb
    out, meta_i = to_interleaved(tiles, meta, compression="gzip")
    return out, meta_i


def _write(tmp_path, name, df, meta):
    path = str(tmp_path / name)
    write_raquet(df, path, meta)
    return path


def test_valid_webp_metadata(spark, rgb, tmp_path):
    out, meta_i = _interleaved(spark, rgb)
    # blobs stay gzip (PIL absent) but the metadata contract is webp:
    # validation is metadata-level, mirroring reference validate.py
    meta = dict(meta_i, compression="webp", compression_quality=80)
    path = _write(tmp_path, "webp.parquet", out, meta)
    res = validate_raquet(spark, path)
    assert not [e for e in res.errors if "compression" in e or "webp" in e], res.errors


def test_jpeg_requires_interleaved(spark, rgb, tmp_path):
    tiles, meta = rgb
    bad = dict(meta, compression="jpeg")  # band_layout stays sequential
    path = _write(tmp_path, "seq_jpeg.parquet", tiles, bad)
    res = validate_raquet(spark, path)
    assert any("interleaved" in e for e in res.errors), res.errors


def test_jpeg_band_count(spark, rgb, tmp_path):
    out, meta_i = _interleaved(spark, rgb)
    two = dict(meta_i, compression="jpeg", bands=meta_i["bands"][:2])
    path = _write(tmp_path, "jpeg2.parquet", out, two)
    res = validate_raquet(spark, path)
    assert any("jpeg supports 1" in e for e in res.errors), res.errors


def test_webp_requires_uint8(spark, tmp_path):
    tiles, meta = make_synthetic_raster(
        spark, zoom=5, tiles_x=1, tiles_y=1, origin_x=4, origin_y=6,
        block_size=16, num_bands=3, dtype="float32",
    )
    out, meta_i = to_interleaved(tiles, meta, compression="gzip")
    bad = dict(meta_i, compression="webp")
    path = _write(tmp_path, "webp_f32.parquet", out, bad)
    res = validate_raquet(spark, path)
    assert any("uint8" in e for e in res.errors), res.errors


def test_quality_range_and_ignored_warning(spark, rgb, tmp_path):
    out, meta_i = _interleaved(spark, rgb)
    bad_q = dict(meta_i, compression="webp", compression_quality=150)
    path = _write(tmp_path, "q150.parquet", out, bad_q)
    res = validate_raquet(spark, path)
    assert any("compression_quality" in e for e in res.errors), res.errors

    gz_q = dict(meta_i, compression_quality=50)  # compression stays gzip
    path2 = _write(tmp_path, "gzq.parquet", out, gz_q)
    res2 = validate_raquet(spark, path2)
    assert not any("compression_quality" in e for e in res2.errors)
    assert any("ignored" in w for w in res2.warnings), res2.warnings


def test_unknown_compression_rejected(spark, rgb, tmp_path):
    tiles, meta = rgb
    bad = dict(meta, compression="lz4")
    path = _write(tmp_path, "lz4.parquet", tiles, bad)
    res = validate_raquet(spark, path)
    assert any("unknown compression" in e for e in res.errors), res.errors


def test_codec_stub_and_constraints(spark, rgb):
    tiles, meta = rgb
    # PIL absent in this container → typed NotImplementedError after the
    # spec constraint checks pass
    with pytest.raises(NotImplementedError, match="PIL"):
        to_interleaved(tiles, meta, compression="webp")
    # constraint failures fire before the PIL probe
    with pytest.raises(ValueError, match="uint8"):
        check_lossy_constraints("jpeg", ["float32"])
    with pytest.raises(ValueError, match="1 or 3"):
        check_lossy_constraints("jpeg", ["uint8", "uint8"])
    with pytest.raises(ValueError, match="1-4"):
        check_lossy_constraints("webp", ["uint8"] * 5)
