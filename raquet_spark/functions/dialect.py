"""Tiny Spark-SQL / DuckDB-SQL dialect shim.

Every driver-checked query in this engine is authored ONCE as a
dialect-parameterized SQL template; the Spark rendering is executed by
``spark.sql`` (full Catalyst optimization) and the DuckDB rendering is
the oracle. This file holds the handful of spellings the two dialects
disagree on. Determinism rules used throughout the query registry:

- money/metric SUMs aggregate DECIMAL (exact, order-independent), then
  cast to DOUBLE — identical bits on both engines;
- transcendental-derived values are ``round(x, 6..9)``;
- every ranking uses a deterministic tiebreak key.
"""

from __future__ import annotations

SPARK = "spark"
DUCKDB = "duckdb"


def seq(lo, hi, d: str) -> str:
    """Inclusive integer sequence [lo, hi] as an array."""
    if d == SPARK:
        return f"sequence({lo}, {hi})"
    return f"range({lo}, ({hi}) + 1)"


def arr_size(a: str, d: str) -> str:
    return f"size({a})" if d == SPARK else f"len({a})"


def arr_el(a: str, i, d: str) -> str:
    """1-based element access."""
    return f"element_at({a}, {i})" if d == SPARK else f"({a})[{i}]"


def arr_transform(a: str, var: str, body: str, d: str) -> str:
    fn = "transform" if d == SPARK else "list_transform"
    return f"{fn}({a}, {var} -> {body})"


def arr_filter(a: str, var: str, body: str, d: str) -> str:
    fn = "filter" if d == SPARK else "list_filter"
    return f"{fn}({a}, {var} -> {body})"


def split_re(s: str, pattern: str, d: str) -> str:
    """Split on a regex in BOTH dialects. Spark's ``split`` is always
    regex; DuckDB's ``split``/``string_split`` is literal, so the regex
    variant must be named explicitly there."""
    fn = "split" if d == SPARK else "string_split_regex"
    return f"{fn}({s}, '{pattern}')"


def re_replace(s: str, pattern: str, rep: str, d: str) -> str:
    """GLOBAL regex replace. Spark's ``regexp_replace`` always replaces
    every match; DuckDB replaces only the first unless passed the 'g'
    flag."""
    if d == SPARK:
        return f"regexp_replace({s}, '{pattern}', '{rep}')"
    return f"regexp_replace({s}, '{pattern}', '{rep}', 'g')"


def arr_join(a: str, sep: str, d: str) -> str:
    """Join array elements into a string."""
    if d == SPARK:
        return f"array_join({a}, '{sep}')"
    return f"array_to_string({a}, '{sep}')"


def arr_min(a: str, d: str) -> str:
    return f"array_min({a})" if d == SPARK else f"list_min({a})"


def arr_distinct(a: str, d: str) -> str:
    return f"array_distinct({a})" if d == SPARK else f"list_distinct({a})"


def arr_intersect(a: str, b: str, d: str) -> str:
    return f"array_intersect({a}, {b})" if d == SPARK else f"list_intersect({a}, {b})"


def arr_slice(a: str, start, length, d: str) -> str:
    """1-based slice of ``length`` elements."""
    if d == SPARK:
        return f"slice({a}, {start}, {length})"
    return f"list_slice({a}, {start}, ({start}) + ({length}) - 1)"


def arr_lit(items: list[str], d: str) -> str:
    """Array literal from element expressions."""
    body = ", ".join(items)
    return f"array({body})" if d == SPARK else f"[{body}]"


def explode(a: str, alias: str, d: str) -> str:
    """SELECT-position explode/unnest of an array."""
    fn = "explode" if d == SPARK else "unnest"
    return f"{fn}({a}) AS {alias}"


def md5_int(expr: str, d: str, hex_chars: int = 7) -> str:
    """Deterministic non-negative integer hash (< 16^hex_chars) shared by
    both engines: leading hex of md5."""
    if d == SPARK:
        return f"CAST(conv(substr(md5({expr}), 1, {hex_chars}), 16, 10) AS BIGINT)"
    return f"(('0x' || substr(md5({expr}), 1, {hex_chars}))::BIGINT)"


def shl(a: str, n, d: str) -> str:
    """Left shift (operands masked by caller to stay below bit 63)."""
    return f"shiftleft({a}, {n})" if d == SPARK else f"(({a}) << ({n}))"


def shr(a: str, n, d: str) -> str:
    """Right shift of a non-negative value."""
    return f"shiftright({a}, {n})" if d == SPARK else f"(({a}) >> ({n}))"


def epoch_seconds(ts: str, d: str) -> str:
    """Epoch seconds with sub-second fraction as DOUBLE (identical on
    both engines: exact microsecond int / 1e6). The Spark spelling
    casts through TIMESTAMP first because parquet files written without
    timezone metadata are read as TIMESTAMP_NTZ (Spark 4 default
    ``spark.sql.parquet.inferTimestampNTZ.enabled=true``) and NTZ has
    no direct cast to DOUBLE. The NTZ→TIMESTAMP cast interprets the
    wall clock in the *session* timezone, so absolute values (and
    differences spanning a DST transition in a non-UTC session zone)
    can skew vs DuckDB ``epoch()``; sessions built by this engine pin
    ``spark.sql.session.timeZone=UTC`` (session.py), which makes the
    mapping exact. Under a foreign non-UTC session, differences remain
    correct away from DST boundaries."""
    if d == SPARK:
        return f"CAST(CAST({ts} AS TIMESTAMP) AS DOUBLE)"
    return f"epoch({ts})"


def bxor(a: str, b: str, d: str) -> str:
    return f"({a} ^ {b})" if d == SPARK else f"xor({a}, {b})"


def bit_count(a: str, d: str) -> str:
    return f"bit_count({a})"


def dot64(a: str, b: str, d: str, dim: int = 64) -> str:
    """Dot product of two fixed-dim float arrays, accumulated in DOUBLE
    in strict element order (identical IEEE op sequence on both engines).

    (Measured at sf0.1: the fold beats a fully unrolled
    ``element_at``-sum ~2.5× — the 2·dim-term expression exceeds
    codegen method limits and falls back to interpreted eval, while
    the fold's per-element lambda stays tight.)"""
    if d == SPARK:
        prods = f"zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE))"
        return f"aggregate({prods}, CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    body = f"CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)"
    return f"list_sum(list_transform(range(1, {dim} + 1), i -> {body}))"


def arr_sum_over(a: str, var: str, body: str, d: str) -> str:
    """Sum of ``body(var)`` over array elements (0 for empty on Spark;
    guard empty arrays on the caller side for DuckDB NULL parity)."""
    if d == SPARK:
        return f"aggregate({a}, CAST(0 AS BIGINT), (acc, {var}) -> acc + CAST({body} AS BIGINT))"
    return f"coalesce(list_sum(list_transform({a}, {var} -> CAST({body} AS BIGINT))), 0)"


def days_between(end_ts: str, start_ts: str, d: str) -> str:
    """Whole-day difference ``date(end) - date(start)`` for timestamps.
    Spark's two-arg ``datediff`` truncates to DATE first; DuckDB's
    ``date_diff('day', ...)`` counts day-boundary crossings — identical
    results for any timestamp inputs."""
    if d == SPARK:
        return f"datediff({end_ts}, {start_ts})"
    return f"date_diff('day', {start_ts}, {end_ts})"


def isum(expr: str, d: str) -> str:
    """Integer SUM with a pinned 64-bit result type. DuckDB's bare
    ``SUM(INTEGER)`` returns HUGEINT (int128) while Spark returns
    BIGINT; the driver's value hash is type-sensitive, so every integer
    SUM that reaches a result column must be cast. Values are identical
    — only the physical type differs."""
    return f"CAST(SUM({expr}) AS BIGINT)"


def dsum(expr: str, d: str, scale: int = 6) -> str:
    """Order-independent SUM: aggregate exact DECIMAL, return DOUBLE."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28, {scale}))) AS DOUBLE)"


def davg(expr: str, d: str, scale: int = 6) -> str:
    """Order-independent AVG via exact decimal sum / count."""
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(28, {scale}))) AS DOUBLE)"
        f" / COUNT({expr}) AS DOUBLE)"
    )


def struct2(k1: str, v1: str, k2: str, v2: str, d: str) -> str:
    """Two-field struct literal."""
    if d == SPARK:
        return f"named_struct('{k1}', {v1}, '{k2}', {v2})"
    return f"{{'{k1}': {v1}, '{k2}': {v2}}}"
