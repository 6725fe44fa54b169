"""RaQuet reader/writer on Spark DataFrames.

Data model per spec (/root/reference/format-specs/raquet.md:20-127):
``block BIGINT`` quadbin cell (0 = reserved metadata row), band columns
``BINARY``, ``metadata STRING`` JSON populated only at block=0, optional
``time_cf``/``time_ts`` and per-tile statistics columns.

Reader splits data rows from metadata row(s) declaratively, so the
``block != 0`` filter and any block-range predicates push down to the
parquet scan. Writer sorts by quadbin id (spec §Row Ordering — Morton
order ⇒ row-group pruning for spatial queries) and appends the metadata
row with matching schema.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raquet_spark.core.metadata import metadata_to_json, parse_metadata
from raquet_spark.functions import quadbin as qb

METADATA_BLOCK = 0

# http(s) sources localized once per (application, url) — see _localize
_LOCALIZED: dict[tuple[str, str], str] = {}


def _localize(spark: SparkSession, path: str) -> str:
    """Download an ``http(s)://`` RaQuet file to driver-local storage so
    ``spark.read.parquet`` can open it — the convenience the reference
    gets from DuckDB httpfs (docs/engines.md reads demo datasets
    straight off storage.googleapis.com).

    Driver-single-file by design: right for docs-style demo files and
    notebooks, NOT the 100 TB path. Cluster deployments should address
    object stores through their Hadoop connectors (s3a://, gs://, abfss://
    — schemes Spark reads natively and in parallel), which this helper
    deliberately leaves untouched."""
    if not path.startswith(("http://", "https://")):
        return path
    key = (spark.sparkContext.applicationId, path)
    local = _LOCALIZED.get(key)
    if local is None:
        import tempfile
        import urllib.request

        fd, local = tempfile.mkstemp(suffix=".parquet", prefix="raquet_http_")
        os.close(fd)  # mkstemp (not the race-prone mktemp): path is ours
        urllib.request.urlretrieve(path, local)
        _LOCALIZED[key] = local
    return local


def read_raquet(
    spark: SparkSession,
    path: str,
    bbox: tuple[float, float, float, float] | None = None,
    polygon: list[tuple[float, float]] | None = None,
    point: tuple[float, float] | None = None,
    zoom: int | None = None,
) -> DataFrame:
    """Tile rows of a RaQuet dataset (metadata row(s) excluded).

    Spatial-filter conveniences mirroring the reference's DuckDB surface
    (`read_raquet(file, polygon)` / `read_raquet_at(file, lon, lat)`,
    docs/engines.md): ``bbox``/``polygon`` prune to tiles intersecting
    the region's bbox via Morton block ranges (conservative tile-level
    superset — exact pixel masking is ``clip_to_polygon`` /
    ``region_stats_polygon``); ``point`` selects the single covering
    tile. ``zoom`` defaults to the dataset's native zoom (one metadata
    read). ``http(s)://`` paths are localized once per app (demo-file
    convenience; see :func:`_localize` for the 100 TB guidance)."""
    path = _localize(spark, path)
    df = spark.read.parquet(path).where(F.col("block") != METADATA_BLOCK)
    if bbox is None and polygon is None and point is None:
        return df
    z = zoom if zoom is not None else (
        read_raquet_metadata(spark, path)["tiling"]["max_zoom"]
    )
    if point is not None:
        cell = qb.py_point_to_cell(point[0], point[1], z)
        return df.where(F.col("block") == cell)
    if polygon is not None:
        from raquet_spark.functions.geom import poly_bbox_lonlat

        bbox = poly_bbox_lonlat(polygon)
    return filter_blocks_bbox(df, *bbox, z)


def read_raquet_metadata(spark: SparkSession, path: str) -> dict:
    """Parse the JSON metadata row. Partitioned datasets contribute one
    metadata row per file (spec §Partitioned Datasets rule 5) — they are
    identical except ``tiling.num_blocks``, which we sum."""
    path = _localize(spark, path)
    rows = (
        spark.read.parquet(path)
        .where(F.col("block") == METADATA_BLOCK)
        .select("metadata")
        .collect()
    )
    if not rows:
        raise ValueError(f"no metadata row (block=0) in {path}")
    meta = parse_metadata(rows[0][0])
    if len(rows) > 1:
        meta["tiling"]["num_blocks"] = sum(
            parse_metadata(r[0])["tiling"]["num_blocks"] for r in rows
        )
    return meta


def write_raquet(
    df: DataFrame,
    path: str,
    metadata: dict,
    mode: str = "overwrite",
    target_row_group_bytes: int | None = None,
    target_file_bytes: int | None = None,
    persist_input: bool = True,
) -> None:
    """Write tiles + metadata row as a RaQuet parquet dataset.

    Tiles are range-partitioned and sorted by ``block`` within files so
    Morton-adjacent tiles share row groups (spec §Row Ordering
    Recommendation). ``metadata.tiling.num_blocks`` is refreshed from the
    actual tile count.

    ``target_file_bytes`` budgets the part-file size (the reference
    CLI's ``--target-size``, raster2raquet.py:1918): the Morton range
    is split into ~total_bytes/target files. Per-tile bytes are
    estimated from a bounded 64-row sample of the binary columns, so
    the split is approximate — parts track the budget, they are not
    capped at it (same contract as the reference's greedy splitter).
    The estimate measures in-memory block bytes and ignores parquet
    encoding/compression, so on compressible data parts land BELOW the
    budget (never above it) by roughly the parquet compression ratio.

    ``persist_input=False`` opts out of the compute-once cache below
    (ADVICE r17): a write larger than the cluster's aggregate local
    storage cannot hold the full tile set in MEMORY_AND_DISK — the
    opt-out trades one extra local write of the dataset for up to two
    recomputes of the upstream lineage (count + range sampling).
    """
    spark = df.sparkSession
    # cache before the count: EVERY write path runs the upstream
    # pipeline at least three times otherwise — the num_blocks count,
    # repartitionByRange's range-bound sampling pass, and the write
    # itself each re-execute the full decode/warp/encode lineage
    # (ADVICE r14 found this for the limit(64) sizing sample; r17 §1.2
    # extends it to the unconditional count+range-sample+write trio).
    # MEMORY_AND_DISK: tile batches spill rather than evict, so the
    # 100 TB path pays one extra local write, never a third compute.
    # (r18 A/B at 32 cores, interleaved min-of-3: persisted 1.56 s vs
    # unpersisted 2.47 s on clean legs — the driver's r17 5.46 s c32
    # reading was box contention, not this cache.)
    from pyspark import StorageLevel

    persisted = None
    if persist_input:
        persisted = df = df.persist(StorageLevel.MEMORY_AND_DISK)
    # the try covers everything from the first job on the persisted df
    # through the write, so an exception in the count/sampling path
    # can't leak the cache (r15 review finding)
    try:
        num_blocks = df.count()
        metadata = dict(metadata)
        metadata["tiling"] = dict(
            metadata.get("tiling", {}), num_blocks=num_blocks
        )

        df = ensure_metadata_column(df)
        meta_row = _metadata_row(spark, df, metadata)
        parts = None
        if target_file_bytes and num_blocks:
            bin_cols = [
                f.name for f in df.schema.fields
                if f.dataType.simpleString() == "binary"
            ]
            if bin_cols:
                row = df.limit(64).select(
                    *[F.sum(F.octet_length(c)).alias(c) for c in bin_cols],
                    F.count(F.lit(1)).alias("_n"),
                ).collect()[0]
                n = row["_n"] or 1
                avg = sum(row[c] or 0 for c in bin_cols) / n + 256
                parts = max(
                    1, int(math.ceil(avg * num_blocks / target_file_bytes))
                )
        out = (
            df.repartitionByRange(parts, "block") if parts
            else df.repartitionByRange("block")
        ).sortWithinPartitions("block").unionByName(meta_row)

        writer = out.write.mode(mode)
        if target_row_group_bytes:
            writer = writer.option(
                "parquet.block.size", str(target_row_group_bytes)
            )
        writer.parquet(path)
    finally:
        if persisted is not None:
            persisted.unpersist()


def _metadata_row(spark: SparkSession, df: DataFrame, metadata: dict) -> DataFrame:
    cols = [F.lit(METADATA_BLOCK).cast("bigint").alias("block")]
    for f_ in df.schema.fields:
        if f_.name == "block":
            continue
        if f_.name == "metadata":
            cols.append(F.lit(metadata_to_json(metadata)).alias("metadata"))
        else:
            cols.append(F.lit(None).cast(f_.dataType).alias(f_.name))
    if "metadata" not in df.columns:
        cols.append(F.lit(metadata_to_json(metadata)).alias("metadata"))
    return spark.range(1).select(*cols)


def ensure_metadata_column(df: DataFrame) -> DataFrame:
    if "metadata" in df.columns:
        return df
    return df.withColumn("metadata", F.lit(None).cast("string"))


# ---------------------------------------------------------------------------
# Spatial partitioning (spec §Partitioned Datasets) and split-by-zoom
# ---------------------------------------------------------------------------

def auto_partition_zoom(
    native_zoom: int, target_file_bytes: int = 150 * 1024 * 1024, avg_tile_bytes: int = 60_000
) -> int:
    """spec formula: partition_zoom = native_zoom - round(log4(target/avg))."""
    return max(0, native_zoom - round(math.log(target_file_bytes / avg_tile_bytes, 4)))


def write_raquet_partitioned(
    df: DataFrame,
    path: str,
    metadata: dict,
    partition_zoom: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Partition tiles by quadbin ancestor cell at ``partition_zoom``.

    One hive-style directory per ancestor (`part_cell=...`); within each
    partition, rows stay Morton-sorted. Every partition gets its own
    metadata row so each directory is a valid standalone RaQuet dataset
    (spec §Partitioned Datasets rules 1-3). At 100 TB this is the layout
    that makes spatial joins co-located and bbox scans touch only a few
    directories.
    """
    spark = df.sparkSession
    native_zoom = metadata["tiling"]["max_zoom"]
    if partition_zoom is None:
        partition_zoom = auto_partition_zoom(native_zoom)

    metadata = dict(metadata)
    metadata["tiling"] = dict(metadata.get("tiling", {}), num_blocks=df.count())

    df = ensure_metadata_column(df)
    part = df.withColumn(
        "part_cell", F.expr(qb.cell_to_parent_sql("block", partition_zoom, "spark"))
    )
    parents = [r[0] for r in part.select("part_cell").distinct().collect()]
    meta_rows = None
    for p in parents:
        row = _metadata_row(spark, df, metadata).withColumn("part_cell", F.lit(p))
        meta_rows = row if meta_rows is None else meta_rows.unionByName(row)
    out = part.unionByName(meta_rows) if meta_rows is not None else part
    (
        out.repartition("part_cell")
        .sortWithinPartitions("block")
        .write.mode(mode)
        .partitionBy("part_cell")
        .parquet(path)
    )


def split_zoom(
    df: DataFrame,
    path: str,
    metadata: dict,
    mode: str = "overwrite",
    target_row_group_bytes: int | None = None,
) -> None:
    """Write one partition directory per zoom level (reference CLI
    ``split-zoom``, /root/reference/raquet/cli.py:942). The reference's
    ``--row-group-size`` (rows per group, for remote pruning) maps to a
    byte budget here — Spark's parquet writer sizes row groups by
    bytes (``parquet.block.size``), not rows."""
    out = ensure_metadata_column(df).withColumn(
        "zoom", F.expr(qb.cell_to_zoom_sql("block", "spark"))
    )
    meta_df = None
    spark = df.sparkSession
    zooms = [r[0] for r in out.select("zoom").distinct().collect()]
    for z in zooms:
        m = dict(metadata)
        m["tiling"] = dict(metadata["tiling"], min_zoom=z, max_zoom=z)
        row = _metadata_row(spark, ensure_metadata_column(df), m).withColumn("zoom", F.lit(z))
        meta_df = row if meta_df is None else meta_df.unionByName(row)
    if meta_df is not None:
        out = out.unionByName(meta_df)
    writer = (
        out.repartition("zoom")
        .sortWithinPartitions("block")
        .write.mode(mode)
        .partitionBy("zoom")
    )
    if target_row_group_bytes:
        writer = writer.option(
            "parquet.block.size", str(target_row_group_bytes)
        )
    writer.parquet(path)


def filter_blocks_bbox(
    df: DataFrame,
    west: float,
    south: float,
    east: float,
    north: float,
    zoom: int,
    max_cover_cells: int = 4096,
) -> DataFrame:
    """Filter tiles intersecting a WGS84 bbox at ``zoom``.

    Small covers: driver-side Morton enumeration grouped into contiguous
    cell-id ranges, so the predicate is a small OR of BETWEENs — pushed
    to parquet row-group pruning (min/max on the sorted ``block``
    column) rather than decoding or scanning everything.

    Large covers (continent-scale bbox at high zoom): enumerating the
    exact cover is O(cells) on the driver, so instead the Morton ranges
    are built at a coarser ancestor zoom (every coarse cell's zoom-z
    descendants share its Morton prefix ⇒ one contiguous block range
    each, still pushdown-compatible) and the exact bbox test becomes a
    codegen'd tile-coordinate BETWEEN applied after the pruned scan —
    driver work bounded by ``max_cover_cells`` at EVERY query scale.
    """
    x0, y0, _ = qb.py_cell_to_tile(qb.py_point_to_cell(west, north, zoom))
    x1, y1, _ = qb.py_cell_to_tile(qb.py_point_to_cell(east, south, zoom))
    x0, x1 = min(x0, x1), max(x0, x1)
    y0, y1 = min(y0, y1), max(y0, y1)
    dz = 0
    while ((x1 >> dz) - (x0 >> dz) + 1) * ((y1 >> dz) - (y0 >> dz) + 1) > max_cover_cells:
        dz += 1
    spans = sorted(
        (
            qb.py_tile_to_cell(cx << dz, cy << dz, zoom),
            qb.py_tile_to_cell(((cx + 1) << dz) - 1, ((cy + 1) << dz) - 1, zoom),
        )
        for cy in range(y0 >> dz, (y1 >> dz) + 1)
        for cx in range(x0 >> dz, (x1 >> dz) + 1)
    )
    ranges: list[tuple[int, int]] = []
    for lo, hi in spans:
        if ranges and lo == ranges[-1][1] + 1:
            ranges[-1] = (ranges[-1][0], hi)
        else:
            ranges.append((lo, hi))
    clauses = [F.col("block").between(lo, hi) for lo, hi in ranges]
    if not clauses:
        return df.where(F.lit(False))
    # balanced OR tree: a left-nested chain of thousands of ranges
    # overflows the Catalyst converter's stack
    while len(clauses) > 1:
        clauses = [
            clauses[i] | clauses[i + 1] if i + 1 < len(clauses) else clauses[i]
            for i in range(0, len(clauses), 2)
        ]
    cond = clauses[0]
    if dz:
        # coarse ranges over-cover: exact rectangle refine on the
        # decoded tile coords, fully inside WholeStageCodegen
        tx = F.expr(qb.cell_to_x_sql("block", "spark"))
        ty = F.expr(qb.cell_to_y_sql("block", "spark"))
        cond = cond & tx.between(x0, x1) & ty.between(y0, y1)
    return df.where(cond)


def merge_tiles(
    spark: SparkSession,
    path: str,
    new_tiles: DataFrame,
    out_path: str | None = None,
) -> dict:
    """Upsert new/updated tiles into a RaQuet dataset: rows in
    ``new_tiles`` replace existing rows with the same ``block``; the
    metadata row's num_blocks and bounds are refreshed.

    Plan: anti-join existing against the (typically small, broadcast)
    new-tile keys, union, re-sort, rewrite. At 100 TB pair this with the
    partitioned layout so only the ancestor partitions touched by
    ``new_tiles`` are rewritten — the unioned write is range-partitioned
    by ``block`` either way. Returns the refreshed metadata."""
    from raquet_spark.core.metadata import parse_metadata  # noqa: F401

    meta = read_raquet_metadata(spark, path)
    existing = read_raquet(spark, path)
    keys = new_tiles.select("block").distinct()
    kept = existing.join(F.broadcast(keys), "block", "left_anti")
    merged = kept.unionByName(
        ensure_metadata_column(new_tiles).select(*[c for c in kept.columns]),
        allowMissingColumns=False,
    )
    target = out_path or path
    # overwrite of the source requires materializing first
    if target == path:
        merged = merged.localCheckpoint(eager=True)
    write_raquet(merged.drop("metadata"), target, meta)
    return read_raquet_metadata(spark, target)


def compact_raquet(
    spark: SparkSession,
    path: str,
    out_path: str | None = None,
    target_row_group_bytes: int = 128 * 1024 * 1024,
) -> None:
    """Rewrite a dataset Morton-sorted with a target row-group size —
    the periodic maintenance pass after many streaming/merge appends
    (small row groups destroy block-range pruning selectivity)."""
    meta = read_raquet_metadata(spark, path)
    tiles = read_raquet(spark, path)
    target = out_path or path
    if target == path:
        tiles = tiles.localCheckpoint(eager=True)
    write_raquet(
        tiles.drop("metadata"), target, meta,
        target_row_group_bytes=target_row_group_bytes,
    )


def add_version_hint(local_parquet_file: str, version: str = "0.5.0") -> None:
    """Stamp ``raquet:version`` into parquet file key-value metadata
    (spec §File Identification). Driver-side pyarrow rewrite — intended
    for single-file exports, not distributed datasets."""
    import pyarrow.parquet as pq

    table = pq.read_table(local_parquet_file)
    existing = table.schema.metadata or {}
    meta = {**existing, b"raquet:version": json.dumps(version).encode()}
    pq.write_table(table.replace_schema_metadata(meta), local_parquet_file)
