"""Quadbin spatial-index functions as pure SQL expressions.

Quadbin is the 64-bit Web-Mercator Morton cell id used by the RaQuet
spec (reference: /root/reference/format-specs/raquet.md:128-147; the
reference delegates to the public quadbin-py package, e.g.
/root/reference/raquet/raster2raquet.py:2116).

Design (Spark-first): every function here is generated as a plain SQL
expression string in one of two dialects — ``"spark"`` or ``"duckdb"``.
The Spark rendering compiles to Catalyst expressions that live entirely
inside WholeStageCodegen (no UDF, usable as join/groupBy keys and in
pushed-down parquet filters on ``block``); the DuckDB rendering is used
for oracle SQL so both engines evaluate the *same* logic from a single
source template.

Bit-math discipline: quadbin cells have header bit 62 set and bit 63
clear, so they are always positive in a signed BIGINT. Every
intermediate below is masked *before* shifting so no value ever touches
bit 63 — this keeps Spark's arithmetic ``shiftright`` equal to a logical
shift and avoids DuckDB's left-shift overflow error.

A plain-Python mirror (``py_*``) is provided for driver-side planning
(partition ranges, bbox covers) and for unit tests against the public
quadbin-py vectors, e.g. tile (9,8,4) <-> 5209574053332910079.
"""

from __future__ import annotations

import math

# ---------------------------------------------------------------------------
# Constants (decimal so both SQL dialects parse them identically)
# ---------------------------------------------------------------------------

HEADER = 0x4800000000000000  # header bit + mode=1 (5188146770730811392)
FOOTER_MAX = 0xFFFFFFFFFFFFF  # 52 low bits (4503599627370495)
ZOOM_MASK_CLEAR = ~(0x1F << 52)  # -139611588448485377 (signed 64-bit view)
MAX_ZOOM = 26
MAX_LAT = 85.051128779806604  # Web-Mercator latitude clamp

_M1 = 0x5555555555555555
_M2 = 0x3333333333333333
_M4 = 0x0F0F0F0F0F0F0F0F
_M8 = 0x00FF00FF00FF00FF
_M16 = 0x0000FFFF0000FFFF
_M32 = 0x00000000FFFFFFFF


def _shl(a: str, n, dialect: str) -> str:
    if dialect == "spark":
        return f"shiftleft({a}, {n})"
    return f"(({a}) << ({n}))"


def _shr(a: str, n, dialect: str) -> str:
    # operands are non-negative by construction → arithmetic == logical
    if dialect == "spark":
        return f"shiftright({a}, {n})"
    return f"(({a}) >> ({n}))"


def _spread(v: str, d: str) -> str:
    """Interleave: spread the low 32 bits of ``v`` onto even bit positions."""
    v = f"(({v} | {_shl(v, 16, d)}) & {_M16})"
    v = f"(({v} | {_shl(v, 8, d)}) & {_M8})"
    v = f"(({v} | {_shl(v, 4, d)}) & {_M4})"
    v = f"(({v} | {_shl(v, 2, d)}) & {_M2})"
    v = f"(({v} | {_shl(v, 1, d)}) & {_M1})"
    return v


def _squash(v: str, d: str) -> str:
    """De-interleave: collect even bit positions of ``v`` into the low 32."""
    v = f"(({v}) & {_M1})"
    v = f"(({v} | {_shr(v, 1, d)}) & {_M2})"
    v = f"(({v} | {_shr(v, 2, d)}) & {_M4})"
    v = f"(({v} | {_shr(v, 4, d)}) & {_M8})"
    v = f"(({v} | {_shr(v, 8, d)}) & {_M16})"
    v = f"(({v} | {_shr(v, 16, d)}) & {_M32})"
    return v


# ---------------------------------------------------------------------------
# SQL expression generators (dialect in {"spark", "duckdb"})
# ---------------------------------------------------------------------------

def tile_to_cell_sql(x: str, y: str, z, dialect: str = "spark") -> str:
    """Quadbin cell id for Web-Mercator tile (x, y, z)."""
    d = dialect
    xs = _spread(f"CAST({_shl(f'CAST({x} AS BIGINT)', f'32 - ({z})', d)} AS BIGINT)", d)
    ys = _spread(f"CAST({_shl(f'CAST({y} AS BIGINT)', f'32 - ({z})', d)} AS BIGINT)", d)
    return (
        f"({HEADER} | {_shl(f'CAST({z} AS BIGINT)', 52, d)}"
        f" | {_shr(xs, 12, d)} | {_shr(ys, 11, d)}"
        f" | {_shr(str(FOOTER_MAX), f'({z}) * 2', d)})"
    )


def cell_to_zoom_sql(cell: str, dialect: str = "spark") -> str:
    return f"({_shr(f'({cell})', 52, dialect)} & 31)"


def _footer(cell: str) -> str:
    return f"(({cell}) & {FOOTER_MAX})"


def cell_to_x_sql(cell: str, dialect: str = "spark") -> str:
    d = dialect
    ix = f"({_shl(f'({_footer(cell)} & {0x7FFFFFFFFFFFF})', 12, d)} & {_M1})"
    return f"{_shr(_squash(ix, d), f'32 - {cell_to_zoom_sql(cell, d)}', d)}"


def cell_to_y_sql(cell: str, dialect: str = "spark") -> str:
    d = dialect
    iy = f"({_shl(_footer(cell), 11, d)} & {_M1})"
    return f"{_shr(_squash(iy, d), f'32 - {cell_to_zoom_sql(cell, d)}', d)}"


def cell_to_tile_sql(cell: str, dialect: str = "spark") -> str:
    """Struct (z, x, y) of the tile for a cell."""
    d = dialect
    z, x, y = cell_to_zoom_sql(cell, d), cell_to_x_sql(cell, d), cell_to_y_sql(cell, d)
    if d == "spark":
        return f"named_struct('z', {z}, 'x', {x}, 'y', {y})"
    return f"{{'z': {z}, 'x': {x}, 'y': {y}}}"


def cell_to_parent_sql(cell: str, parent_zoom, dialect: str = "spark") -> str:
    """Ancestor cell at ``parent_zoom`` (must be <= the cell's zoom)."""
    d = dialect
    return (
        f"((({cell}) & {ZOOM_MASK_CLEAR})"
        f" | {_shl(f'CAST({parent_zoom} AS BIGINT)', 52, d)}"
        f" | {_shr(str(FOOTER_MAX), f'({parent_zoom}) * 2', d)})"
    )


def children_from_tile_sql(x: str, y: str, z: str, dialect: str = "spark") -> str:
    """Array of the 4 child cells at zoom+1 (child = tile 2x+dx, 2y+dy).

    Takes pre-computed tile coords (see ``with_tile``) — composing the
    full cell->tile derivation inline would blow up the expression tree
    exponentially (each Morton stage duplicates its operand).
    """
    d = dialect
    z1 = f"(({z}) + 1)"
    out = []
    for dx in (0, 1):
        for dy in (0, 1):
            cx = f"({_shl(f'({x})', 1, d)} + {dx})"
            cy = f"({_shl(f'({y})', 1, d)} + {dy})"
            out.append(tile_to_cell_sql(cx, cy, z1, d))
    if d == "spark":
        return f"array({', '.join(out)})"
    return f"[{', '.join(out)}]"


def cell_to_children_sql(cell: str, dialect: str = "spark") -> str:
    """Array of the 4 child cells at zoom+1 via the direct bit formula
    (public quadbin-py ``cell_to_children`` shape): bump the zoom field,
    clear the two new Morton bits, enumerate 00/01/10/11. O(1)-size
    expression — no tile round-trip, so safe to inline on any operand
    (unlike ``children_from_tile_sql`` which needs pre-computed coords).
    """
    d = dialect
    z1 = f"({cell_to_zoom_sql(cell, d)} + 1)"
    shift = f"(52 - ({z1}) * 2)"
    base = (
        f"((((({cell}) & {ZOOM_MASK_CLEAR}) | {_shl(f'CAST({z1} AS BIGINT)', 52, d)})"
        f" & ~{_shl('CAST(3 AS BIGINT)', shift, d)}))"
    )
    kids = [f"({base} | {_shl(f'CAST({i} AS BIGINT)', shift, d)})" for i in range(4)]
    if d == "spark":
        return f"array({', '.join(kids)})"
    return f"[{', '.join(kids)}]"


def point_to_tile_x_sql(lon: str, z, dialect: str = "spark") -> str:
    """Web-Mercator tile x (clamped) of a WGS84 longitude at zoom ``z``."""
    d = dialect
    xf = f"(CAST({lon} AS DOUBLE) / 360.0 + 0.5)"
    m = f"CAST({_shl('CAST(1 AS BIGINT)', z, d)} AS BIGINT)"
    return f"least(greatest(CAST(floor({xf} * {m}) AS BIGINT), 0), {m} - 1)"


def point_to_tile_y_sql(lat: str, z, dialect: str = "spark") -> str:
    """Web-Mercator tile y (clamped) of a WGS84 latitude at zoom ``z``."""
    d = dialect
    clat = f"greatest(least(CAST({lat} AS DOUBLE), {MAX_LAT}), {-MAX_LAT})"
    sinlat = f"sin({clat} * pi() / 180.0)"
    yf = f"(0.5 - 0.25 * ln((1.0 + {sinlat}) / (1.0 - {sinlat})) / pi())"
    m = f"CAST({_shl('CAST(1 AS BIGINT)', z, d)} AS BIGINT)"
    return f"least(greatest(CAST(floor({yf} * {m}) AS BIGINT), 0), {m} - 1)"


def point_to_cell_sql(lon: str, lat: str, z, dialect: str = "spark") -> str:
    """Cell containing a WGS84 lon/lat point at zoom ``z``."""
    d = dialect
    xt = point_to_tile_x_sql(lon, z, d)
    yt = point_to_tile_y_sql(lat, z, d)
    return tile_to_cell_sql(xt, yt, z, d)


def _tile_lon(x: str, m: str) -> str:
    return f"(CAST({x} AS DOUBLE) / {m} * 360.0 - 180.0)"


def _tile_lat(y: str, m: str) -> str:
    # atan(sinh(pi * (1 - 2*y/m))) in degrees; sinh spelled out for DuckDB
    t = f"(pi() * (1.0 - 2.0 * CAST({y} AS DOUBLE) / {m}))"
    return f"(atan((exp({t}) - exp(-{t})) / 2.0) * 180.0 / pi())"


def bounds_from_tile_sql(x: str, y: str, z: str, dialect: str = "spark") -> str:
    """Struct (west, south, east, north) WGS84 bounds of tile (x, y, z)."""
    d = dialect
    m = f"CAST({_shl('CAST(1 AS BIGINT)', f'({z})', d)} AS DOUBLE)"
    w, e = _tile_lon(f"({x})", m), _tile_lon(f"(({x}) + 1)", m)
    n, s = _tile_lat(f"({y})", m), _tile_lat(f"(({y}) + 1)", m)
    if d == "spark":
        return f"named_struct('west', {w}, 'south', {s}, 'east', {e}, 'north', {n})"
    return f"{{'west': {w}, 'south': {s}, 'east': {e}, 'north': {n}}}"


def cell_to_bounds_sql(cell: str, dialect: str = "spark") -> str:
    """Struct (west, south, east, north) WGS84 bounds of a cell.

    Prefer ``bounds_from_tile_sql`` over pre-computed tile coords when
    ``cell`` is itself a large expression.
    """
    d = dialect
    return bounds_from_tile_sql(
        cell_to_x_sql(cell, d), cell_to_y_sql(cell, d), cell_to_zoom_sql(cell, d), d
    )


def center_from_tile_sql(x: str, y: str, z: str, dialect: str = "spark") -> str:
    """Struct (lon, lat) of the center of tile (x, y, z)."""
    d = dialect
    m = f"CAST({_shl('CAST(1 AS BIGINT)', f'({z})', d)} AS DOUBLE)"
    lon = _tile_lon(f"(({x}) + 0.5)", m)
    lat = _tile_lat(f"(({y}) + 0.5)", m)
    if d == "spark":
        return f"named_struct('lon', {lon}, 'lat', {lat})"
    return f"{{'lon': {lon}, 'lat': {lat}}}"


def cell_to_center_sql(cell: str, dialect: str = "spark") -> str:
    """Struct (lon, lat) of the cell center."""
    d = dialect
    return center_from_tile_sql(
        cell_to_x_sql(cell, d), cell_to_y_sql(cell, d), cell_to_zoom_sql(cell, d), d
    )


def is_valid_cell_sql(cell: str, dialect: str = "spark") -> str:
    """Header bits == 01, mode == 1, zoom <= 26, footer bits all set."""
    d = dialect
    z = cell_to_zoom_sql(cell, d)
    footer = _shr(str(FOOTER_MAX), f"({z}) * 2", d)
    return (
        f"((({cell}) >= 0) AND ({_shr(f'({cell})', 62, d)} = 1)"
        f" AND (({_shr(f'({cell})', 59, d)} & 7) = 1)"
        f" AND ({z} <= {MAX_ZOOM})"
        f" AND ((({cell}) & {footer}) = {footer}))"
    )


def sibling_from_tile_sql(x: str, y: str, z: str, direction: str, dialect: str = "spark") -> str:
    """Neighbor cell in direction up/down/left/right (x wraps, y clamps→NULL)."""
    d = dialect
    m = f"CAST({_shl('CAST(1 AS BIGINT)', f'({z})', d)} AS BIGINT)"
    dx, dy = {"left": (-1, 0), "right": (1, 0), "up": (0, -1), "down": (0, 1)}[direction]
    nx = f"(((({x}) + {dx}) % {m} + {m}) % {m})"
    ny = f"(({y}) + {dy})"
    cell_out = tile_to_cell_sql(nx, ny, f"({z})", d)
    return f"(CASE WHEN {ny} >= 0 AND {ny} < {m} THEN {cell_out} ELSE NULL END)"


def kring_from_tile_sql(x: str, y: str, z: str, k: int, dialect: str = "spark") -> str:
    """Array of cells within Chebyshev distance k (x wraps, y clamps).

    Takes pre-computed tile coords (see ``with_tile``) to keep the
    generated expression tree linear in k^2 rather than exponential.
    """
    d = dialect
    m = f"CAST({_shl('CAST(1 AS BIGINT)', f'({z})', d)} AS BIGINT)"
    cells = []
    for dy in range(-k, k + 1):
        for dx in range(-k, k + 1):
            nx = f"(((({x}) + {dx}) % {m} + {m}) % {m})"
            ny = f"(({y}) + {dy})"
            c = tile_to_cell_sql(nx, ny, f"({z})", d)
            cells.append(f"(CASE WHEN {ny} >= 0 AND {ny} < {m} THEN {c} ELSE NULL END)")
    arr = f"array({', '.join(cells)})" if d == "spark" else f"[{', '.join(cells)}]"
    if d == "spark":
        return f"filter({arr}, _c -> _c IS NOT NULL)"
    return f"list_filter({arr}, _c -> _c IS NOT NULL)"


# ---------------------------------------------------------------------------
# Staged query builders — linear-size plans for hot paths
# ---------------------------------------------------------------------------
# The single-expression generators above duplicate their operand at each
# Morton stage (2^5 textual copies), which is fine for short column names
# but costs seconds of Catalyst/codegen compile when the operand is a
# long expression. These builders emit nested SELECT stages with named
# intermediates instead: each stage's outputs are referenced twice by the
# next stage, so CollapseProject keeps the projections separate and the
# tree stays linear. Works identically in DuckDB.

_SPREAD_STAGES = [(16, _M16), (8, _M8), (4, _M4), (2, _M2), (1, _M1)]


def staged_tile_to_cell_query(
    x_expr: str,
    y_expr: str,
    z: int,
    from_sql: str,
    carry: list[str],
    dialect: str = "spark",
    cell_name: str = "cell",
) -> str:
    """Subquery string computing ``cell_name`` = tile_to_cell(x, y, z)
    via staged projections. ``from_sql`` is a FROM-able source (table or
    parenthesized subquery) providing the inputs and carried columns."""
    d = dialect
    carry_str = (", " + ", ".join(carry)) if carry else ""
    cur = (
        f"SELECT CAST({_shl(f'CAST({x_expr} AS BIGINT)', 32 - z, d)} AS BIGINT) AS _qx, "
        f"CAST({_shl(f'CAST({y_expr} AS BIGINT)', 32 - z, d)} AS BIGINT) AS _qy"
        f"{carry_str} FROM {from_sql}"
    )
    for shift, mask in _SPREAD_STAGES:
        sel = ", ".join(
            f"((({n}) | {_shl(n, shift, d)}) & {mask}) AS {n}" for n in ("_qx", "_qy")
        )
        cur = f"SELECT {sel}{carry_str} FROM ({cur})"
    cell = (
        f"({HEADER} | {z << 52} | {_shr('_qx', 12, d)} | {_shr('_qy', 11, d)}"
        f" | {FOOTER_MAX >> (z * 2)})"
    )
    return f"(SELECT {cell} AS {cell_name}{carry_str} FROM ({cur}))"


def staged_point_to_cell_query(
    lon_expr: str,
    lat_expr: str,
    z: int,
    from_sql: str,
    carry: list[str],
    dialect: str = "spark",
    cell_name: str = "cell",
) -> str:
    """Subquery string computing the quadbin cell of a lon/lat point via
    staged projections (see staged_tile_to_cell_query)."""
    d = dialect
    carry_str = (", " + ", ".join(carry)) if carry else ""
    m = 1 << z
    clat = f"greatest(least(CAST({lat_expr} AS DOUBLE), {MAX_LAT}), {-MAX_LAT})"
    sinlat = f"sin({clat} * pi() / 180.0)"
    xf = f"(CAST({lon_expr} AS DOUBLE) / 360.0 + 0.5)"
    yf = f"(0.5 - 0.25 * ln((1.0 + {sinlat}) / (1.0 - {sinlat})) / pi())"
    stage0 = (
        f"(SELECT least(greatest(CAST(floor({xf} * {m}) AS BIGINT), 0), {m - 1}) AS _xt, "
        f"least(greatest(CAST(floor({yf} * {m}) AS BIGINT), 0), {m - 1}) AS _yt"
        f"{carry_str} FROM {from_sql})"
    )
    return staged_tile_to_cell_query("_xt", "_yt", z, stage0, carry, d, cell_name)


# ---------------------------------------------------------------------------
# Spark Column convenience wrappers
# ---------------------------------------------------------------------------

def _col(sql: str):
    from pyspark.sql import functions as F

    return F.expr(sql)


def qb_tile_to_cell(x: str, y: str, z):
    return _col(tile_to_cell_sql(x, y, z, "spark"))


def qb_cell_to_tile(cell: str):
    return _col(cell_to_tile_sql(cell, "spark"))


def qb_cell_to_zoom(cell: str):
    return _col(cell_to_zoom_sql(cell, "spark"))


def qb_cell_to_parent(cell: str, parent_zoom):
    return _col(cell_to_parent_sql(cell, parent_zoom, "spark"))


def qb_point_to_cell(lon: str, lat: str, z):
    return _col(point_to_cell_sql(lon, lat, z, "spark"))


def qb_cell_to_bounds(cell: str):
    return _col(cell_to_bounds_sql(cell, "spark"))


def qb_cell_to_center(cell: str):
    return _col(cell_to_center_sql(cell, "spark"))


def qb_is_valid_cell(cell: str):
    return _col(is_valid_cell_sql(cell, "spark"))


def with_tile(df, cell_col: str = "block", prefix: str = "qb_"):
    """Add ``{prefix}x/y/z`` tile-coordinate columns for ``cell_col``.

    Composite ops (children, kring, sibling) take these pre-computed
    coords so the Catalyst tree stays small; Catalyst collapses the
    extra projection, so there is no runtime cost.
    """
    return (
        df.withColumn(f"{prefix}x", _col(cell_to_x_sql(cell_col, "spark")))
        .withColumn(f"{prefix}y", _col(cell_to_y_sql(cell_col, "spark")))
        .withColumn(f"{prefix}z", _col(cell_to_zoom_sql(cell_col, "spark")))
    )


def qb_children_from_tile(x: str, y: str, z: str):
    return _col(children_from_tile_sql(x, y, z, "spark"))


def qb_sibling_from_tile(x: str, y: str, z: str, direction: str):
    return _col(sibling_from_tile_sql(x, y, z, direction, "spark"))


def qb_kring_from_tile(x: str, y: str, z: str, k: int):
    return _col(kring_from_tile_sql(x, y, z, k, "spark"))


# ---------------------------------------------------------------------------
# Plain-Python mirror (driver-side planning + unit-test oracle)
# ---------------------------------------------------------------------------

def _py_spread(v: int) -> int:
    v = (v | (v << 16)) & _M16
    v = (v | (v << 8)) & _M8
    v = (v | (v << 4)) & _M4
    v = (v | (v << 2)) & _M2
    v = (v | (v << 1)) & _M1
    return v


def _py_squash(v: int) -> int:
    v &= _M1
    v = (v | (v >> 1)) & _M2
    v = (v | (v >> 2)) & _M4
    v = (v | (v >> 4)) & _M8
    v = (v | (v >> 8)) & _M16
    v = (v | (v >> 16)) & _M32
    return v


def py_tile_to_cell(x: int, y: int, z: int) -> int:
    xs, ys = _py_spread(x << (32 - z)), _py_spread(y << (32 - z))
    return HEADER | (z << 52) | (xs >> 12) | (ys >> 11) | (FOOTER_MAX >> (z * 2))


def py_cell_to_tile(cell: int) -> tuple[int, int, int]:
    z = (cell >> 52) & 0x1F
    footer = cell & FOOTER_MAX
    ix = ((footer & 0x7FFFFFFFFFFFF) << 12) & _M1
    iy = (footer << 11) & _M1
    return (_py_squash(ix) >> (32 - z), _py_squash(iy) >> (32 - z), z)


def np_cells_to_tiles(cells):
    """Vectorized :func:`py_cell_to_tile` over a numpy array of cells —
    one pass of uint64 bit ops for a whole Arrow batch instead of a
    per-row Python call (the region_stats_polygon classify hot path).
    Returns ``(tx, ty, z)`` int64 arrays."""
    import numpy as np

    c = np.asarray(cells).astype(np.uint64)
    z = (c >> np.uint64(52)) & np.uint64(0x1F)
    footer = c & np.uint64(FOOTER_MAX)
    ix = (
        (footer & np.uint64(0x7FFFFFFFFFFFF)) << np.uint64(12)
    ) & np.uint64(_M1)
    iy = (footer << np.uint64(11)) & np.uint64(_M1)

    def squash(v):
        v = v & np.uint64(_M1)
        v = (v | (v >> np.uint64(1))) & np.uint64(_M2)
        v = (v | (v >> np.uint64(2))) & np.uint64(_M4)
        v = (v | (v >> np.uint64(4))) & np.uint64(_M8)
        v = (v | (v >> np.uint64(8))) & np.uint64(_M16)
        v = (v | (v >> np.uint64(16))) & np.uint64(_M32)
        return v

    shift = np.uint64(32) - z
    tx = (squash(ix) >> shift).astype(np.int64)
    ty = (squash(iy) >> shift).astype(np.int64)
    return tx, ty, z.astype(np.int64)


def py_cell_to_zoom(cell: int) -> int:
    return (cell >> 52) & 0x1F


def py_cell_to_parent(cell: int, parent_zoom: int) -> int:
    return (cell & ZOOM_MASK_CLEAR & ((1 << 64) - 1)) | (parent_zoom << 52) | (
        FOOTER_MAX >> (parent_zoom * 2)
    )


def py_cell_to_children(cell: int) -> list[int]:
    """Direct bit-formula children (mirror of ``cell_to_children_sql``)."""
    z1 = py_cell_to_zoom(cell) + 1
    shift = 52 - z1 * 2
    base = (cell & ZOOM_MASK_CLEAR & ((1 << 64) - 1)) | (z1 << 52)
    base &= ~(3 << shift) & ((1 << 64) - 1)
    return [base | (i << shift) for i in range(4)]


def py_point_to_cell(lon: float, lat: float, z: int) -> int:
    lat = max(min(lat, MAX_LAT), -MAX_LAT)
    sinlat = math.sin(lat * math.pi / 180.0)
    xf = lon / 360.0 + 0.5
    yf = 0.5 - 0.25 * math.log((1.0 + sinlat) / (1.0 - sinlat)) / math.pi
    m = 1 << z
    x = min(max(int(math.floor(xf * m)), 0), m - 1)
    y = min(max(int(math.floor(yf * m)), 0), m - 1)
    return py_tile_to_cell(x, y, z)


def py_cell_to_bounds(cell: int) -> tuple[float, float, float, float]:
    x, y, z = py_cell_to_tile(cell)
    m = float(1 << z)

    def lon(xx: float) -> float:
        return xx / m * 360.0 - 180.0

    def lat(yy: float) -> float:
        t = math.pi * (1.0 - 2.0 * yy / m)
        return math.degrees(math.atan(math.sinh(t)))

    return (lon(x), lat(y + 1), lon(x + 1), lat(y))


def py_cell_range(parent: int, zoom: int) -> tuple[int, int]:
    """Contiguous [lo, hi] cell-id range of ``parent``'s descendants at
    ``zoom`` (Morton order ⇒ a quadtree subtree is one contiguous range;
    used for block-range predicate pushdown)."""
    x, y, pz = py_cell_to_tile(parent)
    dz = zoom - pz
    lo = py_tile_to_cell(x << dz, y << dz, zoom)
    hi = py_tile_to_cell(((x + 1) << dz) - 1, ((y + 1) << dz) - 1, zoom)
    return lo, hi


def py_bbox_to_cells(west: float, south: float, east: float, north: float, z: int) -> list[int]:
    """All cells at zoom ``z`` intersecting a WGS84 bbox (driver-side)."""
    c_nw = py_cell_to_tile(py_point_to_cell(west, north, z))
    c_se = py_cell_to_tile(py_point_to_cell(east, south, z))
    x0, y0, _ = c_nw
    x1, y1, _ = c_se
    return [
        py_tile_to_cell(x, y, z)
        for y in range(min(y0, y1), max(y0, y1) + 1)
        for x in range(min(x0, x1), max(x0, x1) + 1)
    ]


def distance_sql(a: str, b: str, dialect: str = "spark") -> str:
    """Chebyshev (king-move) distance between two cells at the same
    zoom (CARTO QUADBIN_DISTANCE parity; no antimeridian wrap, like the
    reference toolbox)."""
    ax, ay = cell_to_x_sql(a, dialect), cell_to_y_sql(a, dialect)
    bx, by = cell_to_x_sql(b, dialect), cell_to_y_sql(b, dialect)
    return f"greatest(abs(({ax}) - ({bx})), abs(({ay}) - ({by})))"


def kring_distances_from_tile_sql(
    x: str, y: str, z: str, k: int, dialect: str = "spark"
) -> str:
    """Array of (cell, dist) structs within Chebyshev distance k —
    CARTO QUADBIN_KRING_DISTANCES parity (x wraps, y clamps; each
    offset's distance is a compile-time constant)."""
    from raquet_spark.functions import dialect as dl

    d = dialect
    m = f"CAST({_shl('CAST(1 AS BIGINT)', f'({z})', d)} AS BIGINT)"
    items = []
    for dy in range(-k, k + 1):
        for dx in range(-k, k + 1):
            nx = f"(((({x}) + {dx}) % {m} + {m}) % {m})"
            ny = f"(({y}) + {dy})"
            c = tile_to_cell_sql(nx, ny, f"({z})", d)
            s = dl.struct2("cell", c, "dist", str(max(abs(dx), abs(dy))), d)
            items.append(
                f"(CASE WHEN {ny} >= 0 AND {ny} < {m} THEN {s} ELSE NULL END)"
            )
    arr = f"array({', '.join(items)})" if d == "spark" else f"[{', '.join(items)}]"
    fn = "filter" if d == "spark" else "list_filter"
    return f"{fn}({arr}, _c -> _c IS NOT NULL)"
