"""Time dimension support (spec §time_cf/time_ts columns,
/root/reference/format-specs/raquet.md:67-88; CF parsing mirrors
/root/reference/raquet/raster2raquet.py:267-368).

``time_cf`` is the authoritative CF numeric offset; ``time_ts`` is the
derived timestamp (NULL for non-Gregorian calendars). With time, the
primary key is (block, time_cf) and statistics are per-tile-per-step.
"""

from __future__ import annotations

import datetime
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNIT_SECONDS = {
    "seconds": 1,
    "minutes": 60,
    "hours": 3600,
    "days": 86400,
}

GREGORIAN = ("standard", "gregorian", "proleptic_gregorian")


@dataclass
class CFTime:
    units: str
    reference: datetime.datetime
    calendar: str = "standard"

    @property
    def gregorian_compatible(self) -> bool:
        return self.calendar.lower() in GREGORIAN

    def to_metadata(self, values: list[float], resolution: str | None = None) -> dict:
        out = {
            "cf:units": f"{self.units} since {self.reference:%Y-%m-%d %H:%M:%S}",
            "cf:calendar": self.calendar,
            "interpretation": "period_start",
            "count": len(set(values)),
            "range": [min(values), max(values)] if values else [0, 0],
        }
        if resolution:
            out["resolution"] = resolution
        return out


def parse_cf_units(units_string: str, calendar: str = "standard") -> CFTime:
    m = re.match(r"^(\w+)\s+since\s+(.+)$", units_string.strip(), re.IGNORECASE)
    if not m:
        raise ValueError(f"unparseable CF units: {units_string!r}")
    unit = m.group(1).lower().rstrip("s") + "s"
    date_str = m.group(2).strip()
    for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d %H:%M", "%Y-%m-%dT%H:%M:%S", "%Y-%m-%d"):
        try:
            ref = datetime.datetime.strptime(date_str, fmt)
            break
        except ValueError:
            continue
    else:
        raise ValueError(f"unparseable CF reference date: {date_str!r}")
    return CFTime(units=unit, reference=ref, calendar=calendar)


def with_time_ts(df: DataFrame, cf: CFTime, time_cf_col: str = "time_cf") -> DataFrame:
    """Derive ``time_ts`` from ``time_cf`` declaratively.

    Seconds/minutes/hours/days: pure Column arithmetic on epoch micros.
    Non-Gregorian calendars: NULL (spec raquet.md:77)."""
    if not cf.gregorian_compatible:
        return df.withColumn("time_ts", F.lit(None).cast("timestamp"))
    if cf.units in _UNIT_SECONDS:
        base_us = int(cf.reference.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
        unit_us = _UNIT_SECONDS[cf.units] * 1_000_000
        return df.withColumn(
            "time_ts",
            F.expr(f"timestamp_micros(CAST({base_us} + {time_cf_col} * {unit_us} AS BIGINT))"),
        )
    if cf.units == "months":
        ref = cf.reference.strftime("%Y-%m-%d %H:%M:%S")
        return df.withColumn(
            "time_ts",
            F.expr(
                f"CAST(add_months(TIMESTAMP '{ref}', CAST({time_cf_col} AS INT)) AS TIMESTAMP)"
            ),
        )
    if cf.units == "years":
        ref = cf.reference.strftime("%Y-%m-%d %H:%M:%S")
        return df.withColumn(
            "time_ts",
            F.expr(
                f"CAST(add_months(TIMESTAMP '{ref}', CAST({time_cf_col} AS INT) * 12) AS TIMESTAMP)"
            ),
        )
    raise ValueError(f"unsupported CF unit {cf.units!r}")


def temporal_slice(df: DataFrame, time_cf_lo: float, time_cf_hi: float) -> DataFrame:
    """Filter tiles to a CF time range (pushes down on time_cf)."""
    return df.where(F.col("time_cf").between(time_cf_lo, time_cf_hi))


def per_step_stats(df_with_stats: DataFrame, band: str) -> DataFrame:
    """Aggregate per-tile stats per time step — exact pooled combine
    (same math as operators/tile_stats.aggregate_band_stats, grouped)."""
    c = F.col(f"{band}_count")
    ssq = (F.col(f"{band}_stddev") ** 2 + F.col(f"{band}_mean") ** 2) * c
    g = df_with_stats.groupBy("time_cf").agg(
        F.sum(c).alias("count"),
        F.min(f"{band}_min").alias("min"),
        F.max(f"{band}_max").alias("max"),
        F.sum(f"{band}_sum").alias("sum"),
        F.sum(ssq).alias("ssq"),
    )
    return g.select(
        "time_cf", "count", "min", "max", "sum",
        (F.col("sum") / F.col("count")).alias("mean"),
        F.sqrt(F.greatest(F.col("ssq") / F.col("count") - (F.col("sum") / F.col("count")) ** 2,
                          F.lit(0.0))).alias("stddev"),
    )
