"""Quadbin function tests: public vectors, python<->Spark<->DuckDB parity,
hypothesis round-trips. Mirrors reference behavior (quadbin-py, used at
/root/reference/raquet/raster2raquet.py:2116)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from raquet_spark.functions import quadbin as qb

# Public quadbin-py / CARTO docs vectors
VECTORS = [
    ((9, 8, 4), 5209574053332910079),
    ((0, 0, 0), qb.HEADER | qb.FOOTER_MAX),
]


def test_known_vectors():
    assert qb.py_tile_to_cell(9, 8, 4) == 5209574053332910079
    assert qb.py_cell_to_tile(5209574053332910079) == (9, 8, 4)
    # CARTO docs: QUADBIN_FROMLONGLAT(-3.7038, 40.4168, 10)
    assert qb.py_point_to_cell(-3.7038, 40.4168, 10) == 5234261499580514303


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 26).flatmap(
    lambda z: st.tuples(st.integers(0, 2**z - 1), st.integers(0, 2**z - 1), st.just(z))
))
def test_py_roundtrip(txyz):
    x, y, z = txyz
    cell = qb.py_tile_to_cell(x, y, z)
    assert 0 < cell < 2**63
    assert qb.py_cell_to_tile(cell) == (x, y, z)
    assert qb.py_cell_to_zoom(cell) == z
    if z > 0:
        px, py, pz = qb.py_cell_to_tile(qb.py_cell_to_parent(cell, z - 1))
        assert (px, py, pz) == (x >> 1, y >> 1, z - 1)


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 20).flatmap(
    lambda z: st.tuples(st.integers(0, 2**z - 1), st.integers(0, 2**z - 1), st.just(z))
))
def test_cell_range_contains_descendants(txyz):
    x, y, z = txyz
    cell = qb.py_tile_to_cell(x, y, z)
    dz = min(z + 3, 26)
    lo, hi = qb.py_cell_range(cell, dz)
    # corners of the descendant square are inside [lo, hi]
    for cx, cy in [(x << (dz - z), y << (dz - z)),
                   (((x + 1) << (dz - z)) - 1, ((y + 1) << (dz - z)) - 1)]:
        c = qb.py_tile_to_cell(cx, cy, dz)
        assert lo <= c <= hi


def _duck_rows(sql: str):
    return duckdb.sql(sql).fetchall()


def _spark_rows(spark, sql: str):
    return [tuple(r) for r in spark.sql(sql).collect()]


TILES = [(0, 0, 0), (1, 0, 1), (9, 8, 4), (581, 783, 11), (1205, 1539, 12),
         (2**20 - 1, 7, 20), (123456, 654321, 26)]


@pytest.mark.slow
def test_sql_parity_tile_roundtrip(spark):
    """Same SQL template on Spark and DuckDB == python mirror."""
    values = ", ".join(f"({x}, {y}, {z})" for x, y, z in TILES)
    for dialect, runner in [("duckdb", _duck_rows), ("spark", lambda s: _spark_rows(spark, s))]:
        cell = qb.tile_to_cell_sql("x", "y", "z", dialect)
        sql = (
            f"SELECT {cell} AS cell, {qb.cell_to_x_sql(cell, dialect)} AS rx, "
            f"{qb.cell_to_y_sql(cell, dialect)} AS ry, {qb.cell_to_zoom_sql(cell, dialect)} AS rz "
            f"FROM (VALUES {values}) AS t(x, y, z)"
        )
        rows = runner(sql)
        for (x, y, z), (c, rx, ry, rz) in zip(TILES, rows):
            assert c == qb.py_tile_to_cell(x, y, z), (dialect, x, y, z)
            assert (rx, ry, rz) == (x, y, z), dialect


@pytest.mark.slow
def test_sql_parity_point_parent_bounds(spark):
    pts = [(-3.7038, 40.4168, 10), (0.1, 0.2, 5), (-179.9, -84.0, 8),
           (179.9, 84.0, 3), (12.5, -33.3, 15)]
    values = ", ".join(f"({lon}, {lat}, {z})" for lon, lat, z in pts)
    for dialect, runner in [("duckdb", _duck_rows), ("spark", lambda s: _spark_rows(spark, s))]:
        cell = qb.point_to_cell_sql("lon", "lat", "z", dialect)
        parent = qb.cell_to_parent_sql(cell, "greatest(z - 3, 0)", dialect)
        valid = qb.is_valid_cell_sql(cell, dialect)
        sql = (
            f"SELECT {cell} AS cell, {parent} AS parent, {valid} AS ok "
            f"FROM (VALUES {values}) AS t(lon, lat, z)"
        )
        rows = runner(sql)
        for (lon, lat, z), (c, p, ok) in zip(pts, rows):
            assert c == qb.py_point_to_cell(lon, lat, z), (dialect, lon, lat)
            assert p == qb.py_cell_to_parent(c, max(z - 3, 0)), dialect
            assert bool(ok) is True, dialect


def test_bounds_and_center(spark):
    cell = qb.py_tile_to_cell(9, 8, 4)
    row = spark.sql(
        f"SELECT {qb.cell_to_bounds_sql(str(cell), 'spark')} AS b, "
        f"{qb.cell_to_center_sql(str(cell), 'spark')} AS c"
    ).collect()[0]
    w, s, e, n = qb.py_cell_to_bounds(cell)
    assert row.b.west == pytest.approx(w)
    assert row.b.south == pytest.approx(s)
    assert row.b.east == pytest.approx(e)
    assert row.b.north == pytest.approx(n)
    assert w < row.c.lon < e and s < row.c.lat < n


def test_children_and_kring(spark):
    # composite ops take pre-computed tile coords (two-layer select)
    inner = "SELECT 9 AS x, 8 AS y, 4 AS z"

    def sel(d: str) -> str:
        return (
            f"SELECT {qb.children_from_tile_sql('x', 'y', 'z', d)} AS ch, "
            f"{qb.kring_from_tile_sql('x', 'y', 'z', 1, d)} AS kr, "
            f"{qb.sibling_from_tile_sql('x', 'y', 'z', 'right', d)} AS sib "
            f"FROM ({inner})"
        )

    row = spark.sql(sel("spark")).collect()[0]
    assert sorted(row.ch) == sorted(
        qb.py_tile_to_cell(9 * 2 + dx, 8 * 2 + dy, 5) for dx in (0, 1) for dy in (0, 1)
    )
    assert len(row.kr) == 9  # interior cell: full 3x3 ring
    assert qb.py_cell_to_tile(row.sib) == (10, 8, 4)
    # duckdb parity
    d_row = duckdb.sql(sel("duckdb")).fetchone()
    assert sorted(d_row[0]) == sorted(row.ch)
    assert sorted(d_row[1]) == sorted(row.kr)
    assert d_row[2] == row.sib


def test_invalid_cells(spark):
    bad = [0, 123, qb.py_tile_to_cell(1, 1, 1) & ~qb.HEADER]
    for b in bad:
        ok = duckdb.sql(f"SELECT {qb.is_valid_cell_sql(str(b), 'duckdb')}").fetchone()[0]
        assert not ok


def test_bbox_cover():
    cells = qb.py_bbox_to_cells(-10.0, 35.0, 5.0, 45.0, 6)
    assert cells
    for c in cells:
        w, s, e, n = qb.py_cell_to_bounds(c)
        assert e > -10.0 and w < 5.0 and n > 35.0 and s < 45.0


# ---------------------------------------------------------------------------
# geom: polygon containment property tests
# ---------------------------------------------------------------------------

def _winding_inside(px: float, py: float, verts) -> bool:
    """Independent oracle: nonzero winding number (angle sum)."""
    import math

    total = 0.0
    n = len(verts)
    for i in range(n):
        x1, y1 = verts[i][0] - px, verts[i][1] - py
        x2, y2 = verts[(i + 1) % n][0] - px, verts[(i + 1) % n][1] - py
        total += math.atan2(x1 * y2 - y1 * x2, x1 * x2 + y1 * y2)
    return abs(total) > math.pi  # ~2π inside, ~0 outside


@given(
    cx=st.floats(0.2, 0.8), cy=st.floats(0.2, 0.8),
    r=st.floats(0.05, 0.15),
    nv=st.integers(3, 8),
    px=st.floats(0.01, 0.99), py=st.floats(0.01, 0.99),
    phase=st.floats(0.0, 6.0),
)
@settings(max_examples=300, deadline=None)
def test_point_in_poly_matches_winding(cx, cy, r, nv, px, py, phase):
    import math

    from raquet_spark.functions import geom

    verts = [
        (cx + r * math.cos(phase + 2 * math.pi * k / nv),
         cy + r * math.sin(phase + 2 * math.pi * k / nv))
        for k in range(nv)
    ]
    import numpy as np

    # skip degenerate cases where the point is within an ulp of an edge
    d_edge = min(
        abs((x2 - x1) * (y1 - py) - (x1 - px) * (y2 - y1))
        / max(math.hypot(x2 - x1, y2 - y1), 1e-12)
        for (x1, y1), (x2, y2) in zip(verts, verts[1:] + verts[:1])
    )
    if d_edge < 1e-9:
        return
    got = bool(geom.point_in_poly_np(np.array([px]), np.array([py]), verts)[0])
    assert got == _winding_inside(px, py, verts)


def test_point_in_poly_sql_matches_np():
    import numpy as np

    from raquet_spark.functions import geom

    verts = geom.poly_to_fractions(
        [(-10.3, 35.2), (4.7, 36.1), (6.2, 44.9), (-2.5, 47.3), (-11.0, 41.0)]
    )
    rng = np.random.RandomState(3)
    px, py = rng.uniform(0.4, 0.6, 200), rng.uniform(0.3, 0.5, 200)
    want = geom.point_in_poly_np(px, py, verts)
    expr = geom.point_in_poly_sql("px", "py", verts)
    rows = ", ".join(f"({x!r}, {y!r})" for x, y in zip(px, py))
    got = [
        r[0]
        for r in duckdb.sql(
            f"SELECT {expr} FROM (VALUES {rows}) t(px, py)"
        ).fetchall()
    ]
    assert got == list(want)


def test_quadbin_doc_worked_examples():
    """The reference's worked examples (docs/quadbin.md:152-185).

    Example 1 (whole world) matches exactly. Example 2's printed
    decimal (5196930832277643263) contradicts the doc's OWN hex
    annotation (0x48039FFFFFFFFFFF = 5189561497543507967) — a doc bug
    in the reference; the layout validated by the authoritative
    quadbin-py vector (9,8,4) → 5209574053332910079 (header 0x4,
    5-bit resolution at bits 52-56, Morton index left-aligned below,
    unused bits ones) yields 0x48327FFFFFFFFFFF for tile (1,2,3)."""
    assert qb.py_tile_to_cell(0, 0, 0) == 5192650370358181887
    # authoritative layout check: known vector decomposes as documented
    v = qb.py_tile_to_cell(9, 8, 4)
    assert v == 5209574053332910079 and hex(v) == "0x484c1fffffffffff"
    assert (v >> 52) & 0x1F == 4  # resolution field
    # tile (1,2,3) under the SAME layout: morton(1,2) = 0b001001,
    # left-aligned in the 52-bit index, low bits ones
    v123 = qb.py_tile_to_cell(1, 2, 3)
    expected = (0x4 << 60) | (1 << 59) | (3 << 52) | (0b001001 << 46) | ((1 << 46) - 1)
    assert v123 == expected == 0x48327FFFFFFFFFFF
    assert qb.py_cell_to_tile(v123) == (1, 2, 3)


def test_np_cells_to_tiles_matches_scalar():
    """Vectorized Morton decode == py_cell_to_tile across zooms and
    corner tiles (the region_stats_polygon classify fast path)."""
    import numpy as np

    from raquet_spark.functions.quadbin import (
        np_cells_to_tiles,
        py_cell_to_tile,
        py_tile_to_cell,
    )

    cells = []
    for z in (0, 1, 5, 12, 20, 26):
        m = (1 << z) - 1
        for x, y in {(0, 0), (m, m), (m // 2, m // 3), (1 % (m + 1), m)}:
            cells.append(py_tile_to_cell(x, y, z))
    arr = np.array(cells, dtype=np.int64)
    tx, ty, zz = np_cells_to_tiles(arr)
    for i, c in enumerate(cells):
        ex, ey, ez = py_cell_to_tile(c)
        assert (tx[i], ty[i], zz[i]) == (ex, ey, ez)
