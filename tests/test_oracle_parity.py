"""Mini-driver: run every queries() entry on Spark and its oracle_sql()
on DuckDB at sf0.001 and compare row-count, column names, and
order-insensitive values — the same gate the real driver applies at
sf0.01."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def _duck_conn():
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _rowset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def _canon_type(t):
    """Canonical result-type class. The real driver's value hash is
    type-sensitive (it flagged DuckDB HUGEINT vs Spark BIGINT for two
    rounds while this gate's value coercion passed), so parity here
    must also fail on type skews: int(<=64) vs int128/decimal, NTZ vs
    TZ timestamps, float32 vs float64. Ints of width <= 64 are pooled —
    both engines surface them as exact python ints."""
    import pyarrow as pa

    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int<=64"
    if pa.types.is_decimal(t):
        return "decimal/int128"
    if pa.types.is_float32(t):
        return "float32"
    if pa.types.is_float64(t):
        return "float64"
    if pa.types.is_timestamp(t):
        return "timestamp_tz" if t.tz else "timestamp_ntz"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_canon_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{_canon_type(f.type)}" for f in t)
        return f"struct<{inner}>"
    return str(t)


def _typemap(arrow_schema):
    return {
        name.lower(): _canon_type(t)
        for name, t in zip(arrow_schema.names, arrow_schema.types)
    }


QUERY_NAMES = sorted(set(entry_mod.queries()) & set(entry_mod.oracle_sql()))

# slow tier (r18, conftest RAQUET_SLOW_TESTS): parity params whose
# single check runs >15 s at sf0.001 — heavyweight training/geometry
# pipelines the external driver ALSO oracle-checks at sf0.01 (they
# lead the r18 rotation window) and the committed full-registry drive
# artifacts cover. Everything else stays in the default tier.
_SLOW_PARITY = {
    "quality_classifier_filter",
    "rasterize_polygon_stats",
    "qb_kring_distances",
    "raster_join_diff",
}
_PARITY_PARAMS = [
    pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_PARITY else n
    for n in QUERY_NAMES
]


@pytest.fixture(scope="module")
def duck():
    return _duck_conn()


@pytest.mark.parametrize("name", _PARITY_PARAMS)
def test_parity(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    s_tab = sdf.toArrow()
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    d_tab = duck.execute(entry_mod.oracle_sql()[name]).arrow()
    res = duck.execute(entry_mod.oracle_sql()[name])
    d_cols = [c[0].lower() for c in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column mismatch"
    s_types, d_types = _typemap(s_tab.schema), _typemap(d_tab.schema)
    assert s_types == d_types, (
        f"{name}: result-type skew (driver hash would differ): "
        f"spark={s_types} duckdb={d_types}"
    )
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    assert _rowset(s_rows, s_cols) == _rowset(d_rows, d_cols), f"{name}: value mismatch"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert "parent" in df.columns
