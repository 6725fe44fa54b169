"""RaQuet dataset validation — Spark-native re-expression of the
reference validator (/root/reference/raquet/validate.py:67-413: schema,
metadata, pyramid and band-data checks).

All checks are distributed aggregations; nothing is collected except
per-check scalars, so validation runs on datasets of any size.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raquet_spark.core.metadata import parse_metadata
from raquet_spark.functions import quadbin as qb


@dataclass
class ValidationResult:
    errors: list[str] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)
    info: dict = field(default_factory=dict)

    @property
    def is_valid(self) -> bool:
        return not self.errors


def validate_raquet(spark: SparkSession, path: str, check_band_data: bool = False) -> ValidationResult:
    res = ValidationResult()
    raw = spark.read.parquet(path)

    # --- schema checks (reference validate.py:67-108)
    names = {f.name: f.dataType.simpleString() for f in raw.schema.fields}
    if "block" not in names:
        res.errors.append("missing required column 'block'")
        return res
    if names["block"] != "bigint":
        res.errors.append(f"'block' must be INT64, got {names['block']}")
    if "metadata" not in names:
        res.errors.append("missing required column 'metadata'")
        return res
    if names["metadata"] != "string":
        res.errors.append(f"'metadata' must be STRING, got {names['metadata']}")
    band_cols = [n for n, t in names.items() if t == "binary"]
    if not band_cols:
        res.errors.append("no BINARY band columns found")

    # --- metadata row (reference validate.py:109-175)
    meta_rows = raw.where(F.col("block") == 0).select("metadata").collect()
    if not meta_rows:
        res.errors.append("no metadata row (block = 0)")
        return res
    try:
        meta = parse_metadata(meta_rows[0][0])
    except Exception as e:  # noqa: BLE001
        res.errors.append(f"metadata JSON invalid: {e}")
        return res
    if len(meta_rows) > 1:
        res.warnings.append(f"{len(meta_rows)} metadata rows (partitioned dataset?)")
    res.info["metadata"] = meta

    for key in ("width", "height", "tiling", "bands"):
        if key not in meta:
            res.errors.append(f"metadata missing required field '{key}'")
    if meta.get("crs") != "EPSG:3857":
        res.errors.append(f"crs must be EPSG:3857, got {meta.get('crs')}")
    tiling = meta.get("tiling", {})
    bw, bh = tiling.get("block_width", 0), tiling.get("block_height", 0)
    if bw % 16 or bh % 16:
        res.errors.append(f"block size {bw}x{bh} not divisible by 16 (spec §Data Organization)")

    layout = meta.get("band_layout", "sequential")
    meta_band_names = [b["name"] for b in meta.get("bands", [])]
    if layout == "sequential":
        missing = [b for b in meta_band_names if b not in band_cols]
        if missing:
            res.errors.append(f"band columns missing for metadata bands: {missing}")
    elif "pixels" not in band_cols:
        res.errors.append("interleaved layout requires a 'pixels' column")

    # --- compression rules (spec raquet.md:272-275)
    comp = meta.get("compression")
    if comp not in (None, "gzip", "jpeg", "webp"):
        res.errors.append(f"unknown compression {comp!r} (spec: gzip/jpeg/webp/null)")
    band_types = [b.get("type") for b in meta.get("bands", [])]
    if comp in ("jpeg", "webp"):
        if layout != "interleaved":
            res.errors.append(
                f"{comp} compression requires band_layout 'interleaved', got {layout!r}"
            )
        bad_types = sorted({t for t in band_types if t != "uint8"})
        if bad_types:
            res.errors.append(f"{comp} compression requires uint8 bands, got {bad_types}")
        nb = len(band_types)
        if comp == "jpeg" and nb not in (1, 3):
            res.errors.append(f"jpeg supports 1 (gray) or 3 (RGB) bands, got {nb}")
        if comp == "webp" and not 1 <= nb <= 4:
            res.errors.append(f"webp supports 1-4 bands, got {nb}")
    quality = meta.get("compression_quality")
    if quality is not None:
        if not isinstance(quality, int) or not 1 <= quality <= 100:
            res.errors.append(f"compression_quality must be an int in [1,100], got {quality!r}")
        elif comp not in ("jpeg", "webp"):
            res.warnings.append("compression_quality is ignored for gzip/null compression")

    data = raw.where(F.col("block") != 0)

    # metadata must be NULL outside block=0; stats columns NULL at block=0
    bad_meta = data.where(F.col("metadata").isNotNull()).count()
    if bad_meta:
        res.errors.append(f"{bad_meta} non-metadata rows have non-NULL metadata")

    # --- block / pyramid checks (reference validate.py:176-292)
    agg = data.select(
        F.count("*").alias("n"),
        F.sum((~F.expr(qb.is_valid_cell_sql("block", "spark"))).cast("int")).alias("invalid"),
        F.countDistinct("block").alias("distinct_blocks"),
        F.min(F.expr(qb.cell_to_zoom_sql("block", "spark"))).alias("zmin"),
        F.max(F.expr(qb.cell_to_zoom_sql("block", "spark"))).alias("zmax"),
    ).collect()[0]
    res.info["num_blocks"] = agg["n"]
    if agg["invalid"]:
        res.errors.append(f"{agg['invalid']} rows have invalid quadbin block ids")
    has_time = "time_cf" in names
    if not has_time and agg["distinct_blocks"] != agg["n"]:
        res.errors.append(
            f"duplicate block ids: {agg['n']} rows, {agg['distinct_blocks']} distinct "
            "(block must be unique without time_cf)"
        )
    if has_time:
        dup = data.groupBy("block", "time_cf").count().where("count > 1").count()
        if dup:
            res.errors.append(f"{dup} duplicate (block, time_cf) pairs")

    if "min_zoom" in tiling and agg["zmin"] is not None:
        if agg["zmin"] < tiling["min_zoom"] or agg["zmax"] > tiling["max_zoom"]:
            res.errors.append(
                f"zoom range [{agg['zmin']},{agg['zmax']}] outside metadata "
                f"[{tiling['min_zoom']},{tiling['max_zoom']}]"
            )
        if agg["zmax"] != tiling["max_zoom"]:
            res.errors.append(
                f"no native-resolution tiles: metadata max_zoom={tiling['max_zoom']} "
                f"but finest data zoom is {agg['zmax']}"
            )
        if agg["zmin"] != tiling["min_zoom"]:
            res.warnings.append(
                f"metadata min_zoom={tiling['min_zoom']} but coarsest data zoom "
                f"is {agg['zmin']}"
            )
    declared = tiling.get("num_blocks")
    if declared is not None and declared != agg["n"]:
        res.warnings.append(f"metadata num_blocks={declared} but found {agg['n']}")

    # every overview tile must have ≥1 child at the next finer zoom
    if agg["zmin"] is not None and agg["zmin"] < agg["zmax"]:
        zooms = sorted(
            r[0] for r in data.select(
                F.expr(qb.cell_to_zoom_sql("block", "spark")).alias("z")
            ).distinct().collect()
        )
        expected = list(range(agg["zmin"], agg["zmax"] + 1))
        if zooms != expected:
            res.warnings.append(f"sparse pyramid: zoom levels {zooms}")
        blocks = data.select("block")
        for z_over, z_fine in zip(expected, expected[1:]):
            over = blocks.where(F.expr(qb.cell_to_zoom_sql("block", "spark")) == z_over)
            fine_parents = (
                blocks.where(F.expr(qb.cell_to_zoom_sql("block", "spark")) == z_fine)
                .select(F.expr(qb.cell_to_parent_sql("block", z_over, "spark")).alias("block"))
                .distinct()
            )
            orphans = over.join(fine_parents, "block", "left_anti").count()
            if orphans:
                res.errors.append(
                    f"{orphans} overview tiles at z{z_over} have no children at z{z_fine}"
                )

    # --- band blob size check (reference validate.py:293-341)
    if check_band_data and band_cols and layout == "sequential":
        type_sizes = {"uint8": 1, "int8": 1, "uint16": 2, "int16": 2, "uint32": 4,
                      "int32": 4, "uint64": 8, "int64": 8, "float16": 2,
                      "float32": 4, "float64": 8}
        compressed = meta.get("compression") == "gzip"
        for b in meta.get("bands", []):
            expected_len = bw * bh * type_sizes.get(b["type"], 8)
            col = F.length(F.col(b["name"]))
            if compressed:
                bad = data.where(F.col(b["name"]).isNotNull() & (col > expected_len * 2)).count()
                if bad:
                    res.warnings.append(f"{bad} '{b['name']}' blobs larger than raw size")
            else:
                bad = data.where(F.col(b["name"]).isNotNull() & (col != expected_len)).count()
                if bad:
                    res.errors.append(
                        f"{bad} '{b['name']}' blobs are not {expected_len} bytes"
                    )

    # bounds sanity
    bounds = meta.get("bounds")
    if bounds and (
        len(bounds) != 4
        or not all(isinstance(v, (int, float)) and math.isfinite(v) for v in bounds)
        or bounds[0] > bounds[2] or bounds[1] > bounds[3]
    ):
        res.errors.append(f"invalid bounds {bounds}")

    return res
