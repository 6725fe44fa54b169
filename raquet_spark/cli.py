"""raquet_spark CLI — Spark-backed equivalents of the reference CLI
surface (reference: raquet/cli.py — inspect / convert / export /
split-zoom / partition / validate), minus GDAL inputs (not available):
``generate`` creates a deterministic synthetic raster instead, which is
what the tests convert.

Usage: python -m raquet_spark <command> [args]
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark():
    from raquet_spark.session import get_spark

    spark = get_spark("raquet_spark_cli")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def cmd_inspect(args) -> int:
    from raquet_spark.sources.raquet import read_raquet, read_raquet_metadata

    spark = _spark()
    meta = read_raquet_metadata(spark, args.file)
    tiles = read_raquet(spark, args.file)
    print(json.dumps({
        "version": meta.get("version"),
        "bands": meta.get("bands"),
        "tiling": meta.get("tiling"),
        "bounds": meta.get("bounds"),
        "num_tiles": tiles.count(),
    }, indent=2, default=str))
    if args.verbose:
        tiles.select("block").orderBy("block").show(20, truncate=False)
    return 0


def cmd_validate(args) -> int:
    from raquet_spark.sources.validate import validate_raquet

    result = validate_raquet(_spark(), args.file, check_band_data=args.bands)
    for issue in result.errors:
        print(f"ERROR: {issue}")
    for issue in result.warnings:
        print(f"WARNING: {issue}")
    print("VALID" if result.is_valid else "INVALID")
    return 0 if result.is_valid else 1


def cmd_generate(args) -> int:
    from raquet_spark.operators.tile_stats import with_tile_stats
    from raquet_spark.sources.raquet import write_raquet
    from raquet_spark.testing import make_synthetic_raster

    spark = _spark()
    tiles, meta = make_synthetic_raster(
        spark, zoom=args.zoom, tiles_x=args.tiles, tiles_y=args.tiles,
        block_size=args.block_size, num_bands=args.bands, seed=args.seed,
    )
    if args.stats:
        tiles = with_tile_stats(tiles, meta)
    write_raquet(tiles, args.output, meta)
    print(f"wrote {args.tiles * args.tiles} tiles to {args.output}")
    return 0


def cmd_convert(args) -> int:
    """Pixel-table parquet (gx, gy, band columns) → RaQuet dataset —
    the distributed counterpart of the reference `convert raster`
    (GDAL inputs are not available in this environment; any raster
    readable as a pixel table converts through this path)."""
    from raquet_spark.core.metadata import BandMeta, build_metadata
    from raquet_spark.operators.tiling import from_pixel_table
    from raquet_spark.sources.raquet import write_raquet

    spark = _spark()
    px = spark.read.parquet(args.input)
    band_cols = [c for c in px.columns if c not in ("gx", "gy")]
    if not band_cols:
        print("ERROR: input needs gx, gy plus at least one band column")
        return 1
    gmax = px.selectExpr(
        "max(gx) AS x", "max(gy) AS y", "min(gx) AS x0", "min(gy) AS y0"
    ).collect()[0]
    bs = args.block_size
    z = args.zoom
    from raquet_spark.functions import quadbin as qb

    w, s, _, _ = qb.py_cell_to_bounds(
        qb.py_tile_to_cell(gmax["x0"] // bs, gmax["y"] // bs, z)
    )
    _, _, e, n = qb.py_cell_to_bounds(
        qb.py_tile_to_cell(gmax["x"] // bs, gmax["y0"] // bs, z)
    )
    meta = build_metadata(
        bands=[BandMeta(name=b, type=args.dtype, nodata=args.nodata)
               for b in band_cols],
        bounds=(w, s, e, n),
        width=int(gmax["x"] - gmax["x0"] + 1),
        height=int(gmax["y"] - gmax["y0"] + 1),
        block_width=bs,
        block_height=bs,
        min_zoom=z,
        max_zoom=z,
        num_blocks=0,
        compression="gzip",
        tile_statistics=False,
    )
    tiles = from_pixel_table(px, meta)
    if args.stats:
        from raquet_spark.operators.tile_stats import with_tile_stats

        tiles = with_tile_stats(tiles, meta)
    write_raquet(tiles, args.output, meta)
    print(f"converted {args.input} -> {args.output}")
    return 0


def cmd_export(args) -> int:
    from raquet_spark.operators.export import pixel_table_with_lonlat, to_pixel_table
    from raquet_spark.sources.raquet import read_raquet, read_raquet_metadata

    spark = _spark()
    meta = read_raquet_metadata(spark, args.file)
    tiles = read_raquet(spark, args.file)
    if args.output.endswith((".tif", ".tiff")):
        from raquet_spark.sources.geotiff import write_geotiff

        info = write_geotiff(tiles, meta, args.output)
        print(
            f"exported GeoTIFF {args.output} "
            f"({info['width']}x{info['height']}, {info['nbands']} band(s))"
        )
        return 0
    px = to_pixel_table(tiles, meta)
    if args.lonlat:
        px = pixel_table_with_lonlat(px, meta)
    px.write.mode("overwrite").parquet(args.output)
    print(f"exported pixel table to {args.output}")
    return 0


def cmd_split_zoom(args) -> int:
    from raquet_spark.sources.raquet import read_raquet, read_raquet_metadata, split_zoom

    spark = _spark()
    meta = read_raquet_metadata(spark, args.file)
    split_zoom(read_raquet(spark, args.file), args.output, meta)
    print(f"split {args.file} by zoom into {args.output}")
    return 0


def cmd_partition(args) -> int:
    from raquet_spark.sources.raquet import (
        read_raquet, read_raquet_metadata, write_raquet_partitioned,
    )

    spark = _spark()
    meta = read_raquet_metadata(spark, args.file)
    pz = None if args.partition_zoom == "auto" else int(args.partition_zoom)
    write_raquet_partitioned(
        read_raquet(spark, args.file), args.output, meta, partition_zoom=pz
    )
    print(f"partitioned {args.file} into {args.output}")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="raquet_spark", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("inspect", help="print metadata + tile count")
    s.add_argument("file")
    s.add_argument("-v", "--verbose", action="store_true")
    s.set_defaults(fn=cmd_inspect)

    s = sub.add_parser("validate", help="spec validation checks")
    s.add_argument("file")
    s.add_argument("--bands", action="store_true", help="also decode band data")
    s.set_defaults(fn=cmd_validate)

    s = sub.add_parser("generate", help="synthetic raster → raquet")
    s.add_argument("output")
    s.add_argument("--zoom", type=int, default=6)
    s.add_argument("--tiles", type=int, default=4)
    s.add_argument("--block-size", type=int, default=64)
    s.add_argument("--bands", type=int, default=1)
    s.add_argument("--seed", type=int, default=42)
    s.add_argument("--stats", action="store_true")
    s.set_defaults(fn=cmd_generate)

    s = sub.add_parser("convert", help="pixel-table parquet → raquet")
    s.add_argument("input")
    s.add_argument("output")
    s.add_argument("--zoom", type=int, required=True)
    s.add_argument("--block-size", type=int, default=256)
    s.add_argument("--dtype", default="float32")
    s.add_argument("--nodata", type=float, default=None)
    s.add_argument("--stats", action="store_true")
    s.set_defaults(fn=cmd_convert)

    s = sub.add_parser("export", help="raquet → pixel parquet, or GeoTIFF if output ends in .tif")
    s.add_argument("file")
    s.add_argument("output")
    s.add_argument("--lonlat", action="store_true")
    s.set_defaults(fn=cmd_export)

    s = sub.add_parser("split-zoom", help="one directory per zoom level")
    s.add_argument("file")
    s.add_argument("output")
    s.set_defaults(fn=cmd_split_zoom)

    s = sub.add_parser("partition", help="partition by quadbin ancestor")
    s.add_argument("file")
    s.add_argument("output")
    s.add_argument("--partition-zoom", default="auto")
    s.set_defaults(fn=cmd_partition)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
