"""Halo-exchange pyramid kernels (cubic / cubicspline / lanczos): the
distributed per-parent build with 4x corner replication must equal a
single global-mosaic convolution — proving the halo assembly gives every
border pixel its true cross-tile neighborhood."""

from __future__ import annotations

import numpy as np
import pytest

from raquet_spark.functions import quadbin as qb
from raquet_spark.functions.bands import decode_block
from raquet_spark.operators.export import to_numpy_mosaic
from raquet_spark.operators.pyramid import (
    _convolve_masked,
    _weight_matrix,
    build_level,
    build_pyramid,
    halo_pad,
)
from raquet_spark.testing import make_synthetic_raster

Z, BS, NT = 6, 16, 4
NODATA = -1.0


@pytest.fixture(scope="module")
def raster(spark):
    return make_synthetic_raster(
        spark, zoom=Z, tiles_x=NT, tiles_y=NT, origin_x=16, origin_y=20,
        block_size=BS, dtype="float32", nodata=NODATA, nodata_every=9,
    )


def _global_reference(tiles, meta, kernel):
    """Convolve the full mosaic in one numpy pass (no tiling)."""
    mosaic, _ = to_numpy_mosaic(tiles, meta, "band_1")
    pad = halo_pad(kernel)
    h, w = mosaic.shape
    pm = np.full((h + 2 * pad, w + 2 * pad), NODATA, dtype="f8")
    pm[pad:-pad, pad:-pad] = mosaic
    valid = pm != NODATA
    wv = _weight_matrix(h // 2, pad, kernel)
    wh = _weight_matrix(w // 2, pad, kernel)
    vals, covered = _convolve_masked(pm, valid, wv, wh)
    return np.where(covered, vals, NODATA).astype("<f4")


@pytest.mark.parametrize("kernel", ["cubic", "cubicspline", "lanczos"])
def test_halo_level_matches_global_convolution(spark, raster, kernel):
    tiles, meta = raster
    parents = build_level(tiles, meta, Z, kernel)
    rows = qb.with_tile(parents, "block").collect()
    assert len(rows) == (NT // 2) ** 2

    ref = _global_reference(tiles, meta, kernel)
    for r in rows:
        px, py = r["qb_x"] - 8, r["qb_y"] - 10  # parent grid origin 16/2, 20/2
        got = decode_block(r["band_1"], "float32").reshape(BS, BS)
        want = ref[py * BS : (py + 1) * BS, px * BS : (px + 1) * BS]
        nod_got = got == NODATA
        np.testing.assert_array_equal(nod_got, want == NODATA)
        np.testing.assert_allclose(
            got[~nod_got], want[~(want == NODATA)], rtol=1e-6, atol=1e-6
        )


def test_kernel_properties():
    # row-normalized weights preserve a constant field exactly
    for kernel in ("cubic", "cubicspline", "lanczos"):
        w = _weight_matrix(8, halo_pad(kernel), kernel)
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-12)
        const = np.full(w.shape[1], 7.5)
        np.testing.assert_allclose(w @ const, 7.5, atol=1e-9)
    # Catmull-Rom reproduces a linear ramp away from edges
    w = _weight_matrix(8, halo_pad("cubic"), "cubic")
    src = np.arange(w.shape[1], dtype="f8")
    out = w @ src
    # output o center sits at padded-source coord 2o+1+pad-0.5... check
    # successive differences are exactly the 2px step
    d = np.diff(out[2:-2])
    np.testing.assert_allclose(d, 2.0, atol=1e-9)


def test_halo_pyramid_multilevel(spark, raster):
    tiles, meta = raster
    pyr, meta_p = build_pyramid(tiles, meta, min_zoom=Z - 2, resampling="lanczos")
    from pyspark.sql import functions as F

    zooms = dict(
        pyr.where("block != 0")
        .groupBy(F.expr(qb.cell_to_zoom_sql("block", "spark")).alias("z"))
        .count()
        .collect()
    )
    assert zooms == {Z: 16, Z - 1: 4, Z - 2: 1}
    assert meta_p["tiling"]["min_zoom"] == Z - 2


def test_halo_partial_coverage(spark, raster):
    tiles, meta = raster
    # remove one child tile: its parent still builds from the other 3,
    # and no parent appears that has no children of its own
    kept = qb.with_tile(tiles, "block").where(
        "NOT (qb_x = 16 AND qb_y = 20)"
    ).drop("qb_x", "qb_y", "qb_z")
    parents = build_level(kept, meta, Z, "cubic")
    assert parents.count() == (NT // 2) ** 2
    row = qb.with_tile(parents, "block").where("qb_x = 8 AND qb_y = 10").first()
    arr = decode_block(row["band_1"], "float32").reshape(BS, BS)
    # the quadrant of the dropped child is mostly nodata (only kernel
    # bleed from neighbors near the seam), the rest is populated
    assert (arr[: BS // 2 - 2, : BS // 2 - 2] == NODATA).all()
    assert (arr[BS // 2 :, BS // 2 :] != NODATA).any()
