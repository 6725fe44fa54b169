"""Polygon containment in Web-Mercator fraction space — shared by the
Spark pixel-mask path (numpy), the Catalyst tile-classification path
(SQL expression), and the DuckDB oracle (same SQL text).

Reference parity: ST_RegionStats(band, block, polygon, metadata)
(scripts/benchmark.py:114-131) masks pixels by a query polygon. Here the
polygon's WGS84 vertices are converted ONCE on the driver to Mercator
fractions (x = lon/360 + 0.5, y Mercator-projected to [0, 1]); every
per-pixel / per-corner test is then pure rational arithmetic on those
constants — no trig in the data path, and the identical IEEE op sequence
in numpy, Spark codegen, and DuckDB means the three agree bit-for-bit.
"""

from __future__ import annotations

import math

import numpy as np

Vert = tuple[float, float]


def merc_fraction(lon: float, lat: float) -> Vert:
    """WGS84 → Web-Mercator unit-square fraction (x right, y down)."""
    x = lon / 360.0 + 0.5
    s = math.sin(math.radians(lat))
    y = 0.5 - 0.25 * math.log((1.0 + s) / (1.0 - s)) / math.pi
    return (x, y)


def inv_merc_fraction(fx: float, fy: float) -> Vert:
    """Web-Mercator unit-square fraction → WGS84 (exact inverse of
    :func:`merc_fraction`: lat = asin(tanh(2π(0.5 − y))))."""
    lon = (fx - 0.5) * 360.0
    lat = math.degrees(math.asin(math.tanh(2.0 * math.pi * (0.5 - fy))))
    return (lon, lat)


def poly_to_fractions(poly_lonlat: list[Vert]) -> list[Vert]:
    verts = [merc_fraction(lon, lat) for lon, lat in poly_lonlat]
    if verts[0] == verts[-1]:
        verts = verts[:-1]
    return verts


def poly_bbox_lonlat(poly_lonlat: list[Vert]) -> tuple[float, float, float, float]:
    lons = [p[0] for p in poly_lonlat]
    lats = [p[1] for p in poly_lonlat]
    return (min(lons), min(lats), max(lons), max(lats))


def _edges(verts: list[Vert]) -> list[tuple[Vert, Vert]]:
    return [(verts[i], verts[(i + 1) % len(verts)]) for i in range(len(verts))]


def point_in_poly_sql(px: str, py: str, verts: list[Vert]) -> str:
    """Even-odd ray-casting as a boolean SQL expression (identical text
    for Spark SQL and DuckDB: arithmetic + CASE only). ``px``/``py`` are
    expressions in Mercator fraction space."""
    terms = []
    for (x1, y1), (x2, y2) in _edges(verts):
        crosses = f"(({y1!r} > {py}) != ({y2!r} > {py}))"
        xhit = (
            f"({px} < ({x2!r} - {x1!r}) * ({py} - {y1!r})"
            f" / ({y2!r} - {y1!r}) + {x1!r})"
        )
        terms.append(f"(CASE WHEN {crosses} AND {xhit} THEN 1 ELSE 0 END)")
    return f"(({' + '.join(terms)}) % 2 = 1)"


def point_in_poly_np(px: np.ndarray, py: np.ndarray, verts: list[Vert]) -> np.ndarray:
    """Vectorized even-odd test, same formula/op-order as the SQL."""
    inside = np.zeros(px.shape, dtype=np.int64)
    for (x1, y1), (x2, y2) in _edges(verts):
        crosses = (y1 > py) != (y2 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xhit = px < (x2 - x1) * (py - y1) / (y2 - y1) + x1
        inside += (crosses & xhit).astype(np.int64)
    return (inside % 2) == 1


def parse_wkt_polygon(wkt: str) -> list[Vert]:
    """Driver-side strict WKT parse: a single-ring ``POLYGON ((x y,
    ...))`` → [(lon, lat)] with the closing vertex dropped. Holes and
    MULTIPOLYGON raise (the raster mask operators take one outer
    ring); use one call per outer ring for multi-part shapes."""
    s = wkt.strip()
    up = s.upper()
    if up.startswith("MULTIPOLYGON"):
        raise ValueError(
            "MULTIPOLYGON is not a single ring — rasterize each part's "
            "outer ring separately"
        )
    if not up.startswith("POLYGON"):
        raise ValueError(f"not a WKT POLYGON: {s[:40]!r}")
    body = s[s.index("(") :]
    rings = body.count("(") - 1
    if rings != 1:
        raise ValueError(
            f"POLYGON with {rings} rings (holes unsupported — the mask "
            "operators take the outer ring only)"
        )
    inner = body[body.index("((") + 2 : body.index(")")]
    verts: list[Vert] = []
    for pair in inner.split(","):
        xy = pair.split()
        if len(xy) != 2:
            raise ValueError(f"bad WKT coordinate pair {pair!r}")
        verts.append((float(xy[0]), float(xy[1])))
    if len(verts) >= 2 and verts[0] == verts[-1]:
        verts = verts[:-1]
    if len(verts) < 3:
        raise ValueError("polygon needs at least 3 distinct vertices")
    return verts


def wkt_ring_expr(wkt_col: str) -> str:
    """Column-EXPRESSION WKT outer-ring parse (no UDF): a ``wkt``
    string column → ``array<struct<lon double, lat double>>`` with the
    closing vertex kept (the containment kernels treat first==last as a
    degenerate edge and ignore it). Takes the FIRST ring — feed
    single-ring polygons (the strict driver-side
    :func:`parse_wkt_polygon` is the validating variant). Feeds
    ``rasterize_features`` so a WKT feature table rasterizes without
    leaving codegen."""
    ring = (
        f"regexp_extract({wkt_col}, "
        "'\\\\(\\\\(([^()]*)\\\\)', 1)"
    )
    return (
        f"transform(split({ring}, ','), p -> struct("
        "CAST(element_at(split(trim(p), ' +'), 1) AS DOUBLE) AS lon, "
        "CAST(element_at(split(trim(p), ' +'), 2) AS DOUBLE) AS lat))"
    )


def coerce_polygon(poly) -> list[Vert]:
    """Accept a polygon as [(lon, lat)], [{'lon','lat'}], or a WKT
    POLYGON string — the convenience entry the polygon-taking raster
    operators route through (region_stats_polygon, clip_to_polygon,
    rasterize_polygon)."""
    if isinstance(poly, str):
        return parse_wkt_polygon(poly)
    out: list[Vert] = []
    for v in poly:
        if isinstance(v, dict):
            out.append((float(v["lon"]), float(v["lat"])))
        else:
            out.append((float(v[0]), float(v[1])))
    return out
