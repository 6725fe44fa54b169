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
    from pyspark.sql import functions as F

    from raquet_spark.functions import quadbin as qb
    from raquet_spark.sources.raquet import read_raquet, read_raquet_metadata

    spark = _spark()
    meta = read_raquet_metadata(spark, args.file)
    tiles = read_raquet(spark, args.file)
    out = {
        "version": meta.get("version"),
        "bands": meta.get("bands"),
        "tiling": meta.get("tiling"),
        "bounds": meta.get("bounds"),
        "compression": meta.get("compression"),
        "band_layout": meta.get("band_layout", "sequential"),
        "num_tiles": tiles.count(),
    }
    # per-zoom tile counts (reference inspect shows overview structure)
    out["tiles_per_zoom"] = {
        str(r["z"]): r["n"]
        for r in tiles.groupBy(
            F.expr(qb.cell_to_zoom_sql("block", "spark")).alias("z")
        ).agg(F.count("*").alias("n")).orderBy("z").collect()
    }
    if args.stats:
        stat_cols = [
            c for c in tiles.columns
            if any(c.endswith(s) for s in ("_min", "_max", "_count", "_sum"))
        ]
        if stat_cols:
            aggs = []
            for b in meta.get("bands", []):
                n = b["name"]
                if f"{n}_min" in tiles.columns:
                    aggs += [
                        F.min(f"{n}_min").alias(f"{n}_min"),
                        F.max(f"{n}_max").alias(f"{n}_max"),
                        F.sum(f"{n}_count").alias(f"{n}_count"),
                    ]
            if aggs:
                out["global_stats"] = tiles.agg(*aggs).collect()[0].asDict()
        else:
            out["global_stats"] = "no per-tile stats columns (write with --stats)"
    print(json.dumps(out, indent=2, default=str))
    if args.verbose:
        tiles.select("block").orderBy("block").show(20, truncate=False)
    return 0


def cmd_validate(args) -> int:
    from raquet_spark.sources.validate import validate_raquet

    result = validate_raquet(_spark(), args.file, check_band_data=args.bands)
    if args.json:
        print(json.dumps({
            "valid": result.is_valid,
            "errors": result.errors,
            "warnings": result.warnings,
            "num_blocks": result.info.get("num_blocks"),
        }, indent=2, default=str))
        return 0 if result.is_valid else 1
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
        dtype=args.dtype, nodata=args.nodata,
    )
    if args.min_zoom is not None and args.min_zoom < args.zoom:
        from raquet_spark.operators.pyramid import build_pyramid

        tiles, meta = build_pyramid(
            tiles, meta, args.min_zoom, resampling=args.resampling
        )
    if args.stats:
        tiles = with_tile_stats(tiles, meta)
    write_raquet(tiles, args.output, meta)
    print(f"wrote {args.tiles * args.tiles} tiles to {args.output}")
    return 0


def cmd_pyramid(args) -> int:
    """Add overview levels to an existing dataset (the reference's
    overview control on convert, as a standalone step)."""
    from raquet_spark.operators.pyramid import build_pyramid
    from raquet_spark.sources.raquet import (
        read_raquet, read_raquet_metadata, write_raquet,
    )

    spark = _spark()
    meta = read_raquet_metadata(spark, args.file)
    tiles = read_raquet(spark, args.file)
    pyr, meta_p = build_pyramid(
        tiles, meta, args.min_zoom, resampling=args.resampling
    )
    write_raquet(pyr, args.output, meta_p)
    print(
        f"built overviews z{args.min_zoom}..z{meta['tiling']['max_zoom']} "
        f"({args.resampling}) -> {args.output}"
    )
    return 0


def cmd_fetch(args) -> int:
    """Remote tile ingestion: bbox → cell queue → distributed HTTP fetch
    → raquet (reference imageserver.py/earthengine.py flows)."""
    from raquet_spark.core.metadata import BandMeta, build_metadata
    from raquet_spark.sources.remote import (
        cells_for_bounds, fetch_tiles, imageserver_request, raw_decoder,
        tiff_decoder, xyz_request,
    )
    from raquet_spark.sources.raquet import write_raquet

    spark = _spark()
    comp = None if getattr(args, "no_compression", False) else "gzip"
    if args.service == "imageserver" and (args.bbox is None or args.zoom is None):
        # reference convert-imageserver default: everything negotiated
        # from the service JSON (CRS, extent, dtype, nodata, zoom)
        from raquet_spark.sources.remote import imageserver_to_raquet

        user_bounds = (
            tuple(float(v) for v in args.bbox.split(","))
            if args.bbox is not None else None
        )
        tiles, meta = imageserver_to_raquet(
            spark, args.url, block_size=args.block_size, zoom=args.zoom,
            token=args.token, compression=comp, bounds=user_bounds,
            requests_per_second=args.rps,
        )
        write_raquet(tiles, args.output, meta)
        print(f"fetched {args.url} -> {args.output}")
        return 0
    if args.bbox is None or args.zoom is None:
        print("ERROR: --bbox and --zoom are required for xyz fetches")
        return 1
    bounds = tuple(float(v) for v in args.bbox.split(","))
    meta = build_metadata(
        bands=[BandMeta(name=f"band_{i + 1}", type=args.dtype, nodata=args.nodata)
               for i in range(args.bands)],
        bounds=bounds,
        width=0, height=0,
        block_width=args.block_size, block_height=args.block_size,
        min_zoom=args.zoom, max_zoom=args.zoom,
        compression=comp,
    )
    if args.service == "imageserver":
        builder = imageserver_request(args.url, args.block_size, token=args.token)
        decoder = tiff_decoder
    else:
        builder = xyz_request(args.url)
        decoder = raw_decoder(args.dtype, args.bands, args.block_size)
    cells = cells_for_bounds(spark, bounds, args.zoom)
    tiles = fetch_tiles(
        cells, meta, builder, decoder=decoder,
        requests_per_second=args.rps, compression=comp,
    )
    write_raquet(tiles, args.output, meta)
    print(f"fetched {args.url} -> {args.output}")
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


def cmd_import_geotiff(args) -> int:
    """Real GeoTIFF → raquet (the reference `convert raster` path):
    distributed segment decode, forward-map nearest warp to the
    mercator grid, tile assembly, optional stats."""
    from raquet_spark.sources.raquet import write_raquet
    from raquet_spark.sources.tiff_reader import geotiff_to_raquet

    spark = _spark()
    if getattr(args, "workers", None):
        print(
            f"note: --workers {args.workers} accepted for compatibility; "
            "parallelism comes from the Spark session"
        )
    strategy = {"auto": "round"}.get(
        getattr(args, "zoom_strategy", "auto"), getattr(args, "zoom_strategy", "auto")
    )
    comp = getattr(args, "compression", "gzip")
    layout = getattr(args, "band_layout", "sequential")
    lossy = comp in ("jpeg", "webp")
    # lossy codecs are interleaved-only (spec raquet.md:272-275): the
    # warp/assembly runs on sequential bands (uncompressed intermediate
    # — the interleave step re-encodes anyway), then converts
    seq_comp = None if (lossy or comp == "none"
                        or layout == "interleaved") else comp
    tiles, meta = geotiff_to_raquet(
        spark, args.input, zoom=args.zoom, block_size=args.block_size,
        stats=args.stats, resampling=getattr(args, "warp_resampling", "near"),
        zoom_strategy=strategy, compression=seq_comp,
    )
    min_zoom = args.min_zoom
    if getattr(args, "overviews", "none") == "auto" and min_zoom is None:
        from raquet_spark.core.metadata import find_minzoom

        min_zoom = find_minzoom(
            tuple(meta["bounds"]),
            meta["tiling"]["max_zoom"],
            meta["tiling"]["block_width"],
        )
    if min_zoom is not None and min_zoom < meta["tiling"]["max_zoom"]:
        from raquet_spark.operators.pyramid import build_pyramid

        tiles, meta = build_pyramid(
            tiles, meta, min_zoom, resampling=args.resampling
        )
    persisted = None
    if lossy or layout == "interleaved":
        from raquet_spark.operators.layout import to_interleaved

        # the interleave consumes `tiles` twice (pixel re-encode + the
        # stats-column re-join): persist so the import pipeline's
        # decode/warp/encode map work runs once, not per consumer;
        # released after write_raquet materializes (ADVICE r14)
        tiles = persisted = tiles.persist()
    # try covers the interleave plan-building too, so an exception
    # before the write can't leak the cache (r15 review finding)
    try:
        if lossy or layout == "interleaved":
            meta_l = dict(meta)
            if lossy:
                meta_l["compression_quality"] = int(
                    getattr(args, "compression_quality", 85)
                )
                if comp == "webp":
                    meta_l["webp_lossless"] = not getattr(
                        args, "webp_lossy", False
                    )
            inter, meta = to_interleaved(
                tiles, meta_l,
                compression=comp if comp != "none" else None,
            )
            # to_interleaved keeps only (block, pixels): re-attach the
            # per-tile stats columns computed on the sequential bands
            extra = [c for c in tiles.columns
                     if c not in ("block", "metadata")
                     and not any(c == b["name"] for b in meta["bands"])]
            tiles = (
                inter.join(tiles.select("block", *extra), "block", "left")
                if extra else inter
            )
        rg = getattr(args, "row_group_mb", None)
        write_raquet(
            tiles, args.output, meta,
            target_row_group_bytes=rg * 1024 * 1024 if rg else None,
            target_file_bytes=getattr(args, "target_size", None),
        )
    finally:
        if persisted is not None:
            persisted.unpersist()
    print(
        f"imported {args.input} -> {args.output} "
        f"(z{meta['tiling']['max_zoom']}, {len(meta['bands'])} band(s))"
    )
    return 0


def cmd_import_earthengine(args) -> int:
    """Earth Engine asset → raquet (reference cli.py:723
    convert_earthengine): submit GeoTIFF export, poll, convert
    distributed. Needs the `ee` SDK + credentials (auth-gated)."""
    from raquet_spark.sources.earthengine import (
        EarthEngineConfig,
        earthengine_to_raquet,
    )
    from raquet_spark.sources.raquet import write_raquet

    spark = _spark()
    region = getattr(args, "region", None)
    if region:
        import json as _json
        import os as _os

        # GeoJSON string, or a path to a .geojson file (reference
        # cli.py --region contract). Anything that does not look like
        # inline JSON is treated as a PATH so a typo'd filename raises
        # FileNotFoundError naming it, not an opaque JSONDecodeError.
        if region.lstrip().startswith(("{", "[")):
            region = _json.loads(region)
        else:
            if not _os.path.exists(region):
                raise FileNotFoundError(
                    f"--region file not found: {region}"
                )
            with open(region) as fh:
                region = _json.load(fh)
    config = EarthEngineConfig(
        image_spec=args.image, gcs_bucket=args.gcs_bucket,
        output_path=args.output, bands=args.bands.split(",") if args.bands else None,
        scale=args.scale, tile_zoom=args.tile_zoom,
        block_size=args.block_size, resampling=args.resampling,
        project=args.project,
        gcs_path=getattr(args, "gcs_path", None),
        region=region,
        crs=getattr(args, "crs", None) or "EPSG:4326",
        delete_temp=not getattr(args, "keep_temp", False),
    )
    tiles, meta = earthengine_to_raquet(
        spark, config, timeout=getattr(args, "timeout", None)
    )
    min_zoom = getattr(args, "min_zoom", None)
    if getattr(args, "overviews", "none") == "auto" and min_zoom is None:
        from raquet_spark.core.metadata import find_minzoom

        min_zoom = find_minzoom(
            tuple(meta["bounds"]), meta["tiling"]["max_zoom"],
            meta["tiling"]["block_width"],
        )
    if min_zoom is not None and min_zoom < meta["tiling"]["max_zoom"]:
        from raquet_spark.operators.pyramid import build_pyramid

        tiles, meta = build_pyramid(
            tiles, meta, min_zoom,
            resampling=getattr(args, "overview_resampling", "average"),
        )
    write_raquet(tiles, args.output, meta)
    print(f"imported {args.image} -> {args.output}")
    return 0


def cmd_import_netcdf(args) -> int:
    """Classic NetCDF → raquet (reference `convert file.nc`, cli.py:92):
    distributed slab decode, CF time → (block, time_cf) tiles."""
    from raquet_spark.sources.netcdf import netcdf_to_raquet
    from raquet_spark.sources.raquet import write_raquet

    spark = _spark()
    tiles, meta = netcdf_to_raquet(
        spark, args.input, var=args.var, zoom=args.zoom,
        block_size=args.block_size, stats=args.stats,
        resampling=getattr(args, "resampling", "near"),
    )
    write_raquet(tiles, args.output, meta)
    steps = meta.get("time", {}).get("count", 0)
    print(
        f"imported {args.input} -> {args.output} "
        f"(z{meta['tiling']['max_zoom']}, {steps or 'no'} time step(s))"
    )
    return 0


def cmd_grib_info(args) -> int:
    """Inventory of a GRIB archive (the `wgrib2 -s` role): one line
    per message with the selection keys — parameter, surface, forecast
    hour, grid/packing, ensemble member / probability threshold —
    so a user knows what to pass to import-grib's --param/--level/
    --member/--threshold. Pure header walk (byte-ranged), no Spark
    session."""
    from raquet_spark.sources.grib2 import read_grib2_structure

    # tolerant: mixed archives (some messages on unsupported templates)
    # still list — the unsupported ones as "unsupported: <reason>"
    # lines — since an inventory is exactly what a user needs BEFORE
    # picking --param/--member/--threshold (ADVICE r12)
    g = read_grib2_structure(args.input, tolerant=True)
    msgs = g["messages"]
    if args.json:
        # offset/length on every row so an unsupported message in a
        # large mixed archive is locatable by byte range, not just by
        # list position (ADVICE r13)
        keys = ["offset", "length", "edition", "param_category",
                "param_number", "level_type", "level_value",
                "forecast_hours", "pdt", "grid", "ni", "nj", "drt",
                "ens_member", "ens_count", "prob_lower", "prob_upper",
                "percentile", "spatial_stat", "unsupported"]
        print(json.dumps(
            [{k: m.get(k) for k in keys if m.get(k) is not None}
             for m in msgs],
            indent=1, default=str,
        ))
        return 0
    for i, m in enumerate(msgs):
        if m.get("unsupported") is not None:
            print(
                f"{i}: ed{m.get('edition') or '?'} "
                f"@{m['offset']}+{m['length']} "
                f"unsupported: {m['unsupported']}"
            )
            continue
        sel = ""
        if m.get("ens_member") is not None:
            sel = f" member={m['ens_member']}/{m.get('ens_count', '?')}"
        elif m.get("prob_lower") is not None or m.get("prob_upper") is not None:
            sel = f" threshold={m.get('prob_lower')}..{m.get('prob_upper')}"
        elif m.get("percentile") is not None:
            sel = f" percentile={m['percentile']}"
        print(
            f"{i}: ed{m.get('edition', 2)} "
            f"param={m['param_category']},{m['param_number']} "
            f"level={m['level_type']},{m['level_value']} "
            f"t+{m['forecast_hours']}h "
            f"grid={m.get('grid', '?')} {m['ni']}x{m['nj']} "
            f"pdt=4.{m.get('pdt', 0)} drt=5.{m.get('drt', 0)}{sel}"
        )
    print(f"{len(msgs)} message(s)")
    return 0


def cmd_import_grib(args) -> int:
    """GRIB2 → raquet (reference `convert` accepts GRIB through GDAL's
    driver): per-message distributed decode, forecast steps as
    time_cf."""
    from raquet_spark.sources.grib2 import grib2_to_raquet
    from raquet_spark.sources.raquet import write_raquet

    spark = _spark()
    param = None
    if args.param:
        cat, num = args.param.split(",")
        param = (int(cat), int(num))
    level = None
    if getattr(args, "level", None):
        lt, lv = args.level.split(",")
        level = (int(lt), float(lv))
    tiles, meta = grib2_to_raquet(
        spark, args.input, param=param, level=level, zoom=args.zoom,
        block_size=args.block_size, stats=args.stats,
        resampling=getattr(args, "resampling", "near"),
        member=getattr(args, "member", None),
        threshold=getattr(args, "threshold", None),
        percentile=getattr(args, "percentile", None),
    )
    write_raquet(tiles, args.output, meta)
    steps = meta.get("time", {}).get("count", 0)
    print(
        f"imported {args.input} -> {args.output} "
        f"(z{meta['tiling']['max_zoom']}, {steps or 'no'} time step(s))"
    )
    return 0


def cmd_export(args) -> int:
    from raquet_spark.operators.export import pixel_table_with_lonlat, to_pixel_table
    from raquet_spark.sources.raquet import read_raquet, read_raquet_metadata

    from pyspark.sql import functions as F

    from raquet_spark.functions import quadbin as qb

    spark = _spark()
    meta = read_raquet_metadata(spark, args.file)
    tiles = read_raquet(spark, args.file)
    bands = args.select_bands.split(",") if args.select_bands else None
    zoom = args.zoom if args.zoom is not None else meta["tiling"]["max_zoom"]
    tiles = tiles.where(F.expr(qb.cell_to_zoom_sql("block", "spark")) == zoom)
    if zoom != meta["tiling"]["max_zoom"]:
        meta = dict(meta, tiling=dict(meta["tiling"], max_zoom=zoom))
    if args.output.endswith((".tif", ".tiff")):
        from raquet_spark.sources.geotiff import write_geotiff, write_geotiff_cog

        if getattr(args, "cog", False):
            tiles_all = read_raquet(spark, args.file).where(
                F.expr(qb.cell_to_zoom_sql("block", "spark")) <= zoom
            )
            info = write_geotiff_cog(
                tiles_all, meta, args.output, bands=bands,
                compression=getattr(args, "compression", None) or "deflate",
            )
            print(
                f"exported COG {args.output} ({info['width']}x{info['height']}, "
                f"levels {info['levels']})"
            )
            return 0
        if getattr(args, "overviews", False):
            # overview levels come from the stored pyramid: keep every
            # zoom <= the export zoom in the frame
            tiles = read_raquet(spark, args.file).where(
                F.expr(qb.cell_to_zoom_sql("block", "spark")) <= zoom
            )
        info = write_geotiff(
            tiles, meta, args.output, bands=bands,
            compression=getattr(args, "compression", None),
            include_overviews=getattr(args, "overviews", False),
        )
        print(
            f"exported GeoTIFF {args.output} "
            f"({info['width']}x{info['height']}, {info['nbands']} band(s))"
        )
        return 0
    px = to_pixel_table(tiles, meta, bands=bands)
    if args.lonlat:
        px = pixel_table_with_lonlat(px, meta)
    px.write.mode("overwrite").parquet(args.output)
    print(f"exported pixel table to {args.output}")
    return 0


def cmd_split_zoom(args) -> int:
    from raquet_spark.sources.raquet import read_raquet, read_raquet_metadata, split_zoom

    spark = _spark()
    meta = read_raquet_metadata(spark, args.file)
    rg = getattr(args, "row_group_mb", None)
    split_zoom(
        read_raquet(spark, args.file), args.output, meta,
        target_row_group_bytes=rg * 1024 * 1024 if rg else None,
    )
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


def cmd_dem(args) -> int:
    """DEM focal analysis (the gdaldem-shaped companion step): slope /
    aspect / hillshade or window statistics over one band, written as a
    new float64 RaQuet dataset."""
    from raquet_spark.operators.focal import focal_map, focal_metadata
    from raquet_spark.sources.raquet import (
        read_raquet, read_raquet_metadata, write_raquet,
    )

    spark = _spark()
    meta = read_raquet_metadata(spark, args.file)
    tiles = read_raquet(spark, args.file)
    out = focal_map(
        tiles, meta, args.op, band=args.band, radius=args.radius,
        cellsize=args.cellsize, z_factor=args.z_factor,
        azimuth=args.azimuth, altitude=args.altitude,
    )
    write_raquet(out, args.output, focal_metadata(meta, args.band))
    print(f"{args.op}({args.band}) -> {args.output}")
    return 0


def cmd_dedup(args) -> int:
    """Corpus deduplication over a documents parquet (doc_id, text):
    exact (content-hash, keep min id), substring (Lee et al. span
    prune — duplicated ≥window-token runs cut, first occurrence kept),
    or minhash (near-dup clusters via banded LSH + connected
    components, keep each cluster's min id)."""
    from pyspark.sql import functions as F

    spark = _spark()
    df = spark.read.parquet(args.file).select("doc_id", "text")
    n_in = df.count()
    if args.method == "exact":
        from raquet_spark.operators.dedup import exact_dedup

        out = exact_dedup(df)
    elif args.method == "substring":
        from raquet_spark.operators.textops import substring_dedup_prune

        out = substring_dedup_prune(
            df, window=args.window, auto_width=True
        ).select(
            "doc_id", F.col("clean_text").alias("text")
        ).where(F.length("text") > 0)
    else:  # minhash
        from raquet_spark.operators.dedup import (
            banded_signatures,
            keep_cluster_min,
            minhash_dedup_pairs,
            minhash_signatures,
        )

        # auto_width: the CLI is the production funnel — size the LSH
        # shuffles from the corpus itself (n_in is already counted).
        # collapse_identical: the pairs feed components/keep-min only,
        # so exact copies collapse to rep + star edges (linear, not
        # quadratic, in duplication) with an identical kept set.
        cap = getattr(args, "max_bucket_rows", None)
        out = keep_cluster_min(
            df,
            minhash_dedup_pairs(
                df, auto_width=True, n_docs=n_in, collapse_identical=True,
                max_bucket_rows=cap,
            ),
            auto_width=True,
        )
        # observability (r17, VERDICT r16 #7): the funnel opts into the
        # collapse/cap silently — print what the bounds acted on (the
        # probe's k·n−m star-edge count, and the over-cap bucket count
        # the chain cap rewired) so operators SEE the bound working.
        # One extra signature pass; cheap next to the pair join it
        # reports on.
        sigs = minhash_signatures(df)
        sig_cols = [c for c in sigs.columns if c != "doc_id"]
        groups = sigs.groupBy(*sig_cols).count().persist()
        # one aggregate over the persisted groups yields every number
        # (sum(count) == signature-row count) — no second signature
        # pass (review r17)
        stats = groups.agg(
            F.sum("count").alias("n_sigs"),
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(F.when(F.col("count") > 1, 1).otherwise(0)).alias(
                "n_dup_groups"
            ),
        ).collect()[0]
        n_sigs, n_groups = stats["n_sigs"], stats["n_groups"]
        n_dup_groups = stats["n_dup_groups"]
        print(
            f"dedup[minhash]: collapse folded {n_dup_groups} "
            f"duplicate-signature groups ({n_sigs - n_groups} star "
            f"edges replace the quadratic within-group listing)"
        )
        if cap is not None:
            reps = groups.select(
                *sig_cols, F.lit(0).alias("doc_id")
            ).withColumn(
                "doc_id", F.monotonically_increasing_id()
            )
            n_over = (
                banded_signatures(reps, "doc_id")
                .groupBy("band", "key").count()
                .where(F.col("count") > cap).count()
            )
            print(
                f"dedup[minhash]: chain cap ({cap}) rewired {n_over} "
                f"over-cap band buckets to adjacent chains"
            )
        groups.unpersist()
    out.write.mode("overwrite").parquet(args.output)
    n_out = spark.read.parquet(args.output).count()
    print(f"dedup[{args.method}]: {n_in} -> {n_out} docs ({args.output})")
    return 0


def cmd_pack(args) -> int:
    """Sequence packing: assign (shard, bin) training-batch ids to a
    documents parquet (linear packing, no global sort — see
    textops.sequence_pack)."""
    spark = _spark()
    from raquet_spark.operators.textops import sequence_pack

    df = spark.read.parquet(args.file).select("doc_id", "text")
    packed = sequence_pack(df, max_len=args.max_len, shards=args.shards)
    packed.write.mode("overwrite").parquet(args.output)
    out = spark.read.parquet(args.output)
    n_docs = out.count()  # count the written output, not a re-scan of the input
    n_bins = out.select("shard", "bin").distinct().count()
    print(f"pack: {n_docs} docs -> {n_bins} bins of ~{args.max_len} tokens")
    return 0


def cmd_quality(args) -> int:
    """Model-based quality filter: train the linear scorer on a labeled
    parquet (doc_id, text, y) and score/filter a corpus parquet — the
    classifier-filter step of the training-data pipeline (see
    textops.train_quality_classifier)."""
    spark = _spark()
    from raquet_spark.operators.textops import (
        hashed_embeddings,
        score_quality_classifier,
        train_quality_classifier,
    )

    labeled = spark.read.parquet(args.labels)
    lf = hashed_embeddings(
        labeled.select("doc_id", "text"), dim=args.dim
    )
    w = train_quality_classifier(
        lf, labeled.select("doc_id", "y"), dim=args.dim,
        n_iter=args.iters, lr=args.lr,
    )
    corpus = spark.read.parquet(args.file).select("doc_id", "text")
    scored = score_quality_classifier(
        hashed_embeddings(corpus, dim=args.dim), w
    )
    if args.keep_only:
        scored = scored.where("label_pred = 1")
    scored.write.mode("overwrite").parquet(args.output)
    out = spark.read.parquet(args.output)
    n = out.count()
    n_pos = out.where("label_pred = 1").count()
    print(f"quality: scored {n} docs, {n_pos} predicted-keep "
          f"({'kept only' if args.keep_only else 'all written'})")
    return 0


def cmd_serve(args) -> int:
    from raquet_spark.serve import make_server

    srv = make_server(args.port, args.file)
    print(
        f"raquet_spark tile server at http://127.0.0.1:{srv.server_address[1]}"
    )
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="raquet_spark", description=__doc__)
    try:
        from importlib.metadata import version as _pkg_version

        _v = _pkg_version("raquet-spark")
    except Exception:
        # source checkout without installed metadata: single source of
        # truth is pyproject.toml
        import pathlib
        import re

        try:
            _v = re.search(
                r'^version = "([^"]+)"',
                (pathlib.Path(__file__).resolve().parent.parent
                 / "pyproject.toml").read_text(),
                re.M,
            ).group(1)
        except Exception:
            _v = "unknown"
    p.add_argument("--version", action="version",
                   version=f"%(prog)s {_v}")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("inspect", help="print metadata + tile counts as JSON")
    s.add_argument("file")
    s.add_argument("-v", "--verbose", action="store_true")
    s.add_argument("--stats", action="store_true",
                   help="include global per-band stats from tile-stats columns")
    s.set_defaults(fn=cmd_inspect)

    s = sub.add_parser("validate", help="spec validation checks")
    s.add_argument("file")
    s.add_argument("--bands", action="store_true", help="also decode band data")
    s.add_argument("--json", action="store_true", help="machine-readable output")
    s.set_defaults(fn=cmd_validate)

    s = sub.add_parser("generate", help="synthetic raster → raquet")
    s.add_argument("output")
    s.add_argument("--zoom", type=int, default=6)
    s.add_argument("--tiles", type=int, default=4)
    s.add_argument("--block-size", type=int, default=64)
    s.add_argument("--bands", type=int, default=1)
    s.add_argument("--seed", type=int, default=42)
    s.add_argument("--dtype", default="float32")
    s.add_argument("--nodata", type=float, default=None)
    s.add_argument("--min-zoom", type=int, default=None,
                   help="also build overview levels down to this zoom")
    s.add_argument("--resampling", default="average")
    s.add_argument("--stats", action="store_true")
    s.set_defaults(fn=cmd_generate)

    s = sub.add_parser("pyramid", help="add overview levels to a dataset")
    s.add_argument("file")
    s.add_argument("output")
    s.add_argument("--min-zoom", type=int, required=True)
    s.add_argument("--resampling", default="average",
                   help="near/average/mode/max/min/med/q1/q3/bilinear/"
                        "cubic/cubicspline/lanczos")
    s.set_defaults(fn=cmd_pyramid)

    s = sub.add_parser("fetch", help="remote tiles (xyz/imageserver) → raquet")
    s.add_argument("url", help="{z}/{x}/{y} template or ImageServer base URL")
    s.add_argument("output")
    s.add_argument("--bbox", default=None,
                   help="west,south,east,north (WGS84); optional for "
                        "imageserver (defaults to the negotiated "
                        "service extent), required for xyz")
    s.add_argument("--zoom", type=int, default=None,
                   help="tile zoom; optional for imageserver (auto "
                        "from native resolution — the reference "
                        "--resolution role), required for xyz")
    s.add_argument("--no-compression", action="store_true", default=False,
                   help="store blocks uncompressed (reference "
                        "--no-compression)")
    s.add_argument("--service", choices=["xyz", "imageserver"], default="xyz")
    s.add_argument("--block-size", type=int, default=256)
    s.add_argument("--bands", type=int, default=1)
    s.add_argument("--dtype", default="float32")
    s.add_argument("--nodata", type=float, default=None)
    s.add_argument("--token", default=None)
    s.add_argument("--rps", type=float, default=None,
                   help="per-partition requests-per-second cap")
    s.set_defaults(fn=cmd_fetch)

    s = sub.add_parser("import-geotiff", help="real GeoTIFF → raquet (no GDAL)")
    s.add_argument("input")
    s.add_argument("output")
    s.add_argument("--zoom", type=int, default=None, help="target zoom (default: auto from resolution)")
    s.add_argument("--block-size", type=int, default=256)
    s.add_argument("--min-zoom", type=int, default=None,
                   help="minimum overview zoom (with --overviews auto, overrides the derived value)")
    s.add_argument("--overviews", default="none", choices=["auto", "none"],
                   help="auto = build the full pyramid down to the derived (or --min-zoom) level")
    s.add_argument("--resampling", default="average",
                   help="overview build kernel (average/mode/...)")
    s.add_argument("--warp-resampling", default="near",
                   choices=["near", "bilinear", "cubic", "average", "mode",
                            "max", "min", "med", "q1", "q3"],
                   help="import warp kernel (reference --resampling)")
    s.add_argument("--zoom-strategy", default="auto",
                   choices=["auto", "lower", "upper"],
                   help="zoom pick from source resolution (auto = round)")
    s.add_argument("--row-group-mb", type=int, default=None,
                   help="parquet row-group size in MB (smaller = better remote pruning)")
    s.add_argument("--target-size", type=int, default=None,
                   help="approximate bytes per output part file (the "
                        "reference --target-size): the Morton range is "
                        "split into ~total/target files")
    s.add_argument("--compression", default="gzip",
                   choices=["gzip", "none", "jpeg", "webp"],
                   help="tile codec; jpeg/webp imply interleaved layout "
                        "(spec: lossy is interleaved-only, uint8 bands)")
    s.add_argument("--compression-quality", type=int, default=85,
                   help="quality for jpeg / lossy webp (1-100)")
    s.add_argument("--webp-lossy", action="store_true", default=False,
                   help="write lossy VP8 instead of the default lossless "
                        "VP8L (the repo default keeps webp tiles readable "
                        "without native codecs; the reference's Pillow "
                        "path writes lossy)")
    s.add_argument("--band-layout", default="sequential",
                   choices=["sequential", "interleaved"],
                   help="band data organization (reference --band-layout)")
    s.add_argument("--streaming", action="store_true", default=False,
                   help="accepted for reference-CLI compatibility; Spark "
                        "executes the conversion distributed and "
                        "memory-bounded either way (no-op)")
    s.add_argument("--workers", type=int, default=None,
                   help="accepted for reference-CLI compatibility; "
                        "parallelism comes from the Spark session "
                        "(SPARK_GRAFT_CPUS / cluster config)")
    s.add_argument("--stats", action="store_true", default=True)
    s.set_defaults(fn=cmd_import_geotiff)

    s = sub.add_parser("import-earthengine",
                       help="Earth Engine asset → raquet (needs ee SDK + credentials)")
    s.add_argument("image", help="asset ID or expr:... expression")
    s.add_argument("output")
    s.add_argument("--gcs-bucket", required=True)
    s.add_argument("--bands", default=None)
    s.add_argument("--scale", type=float, default=10.0)
    s.add_argument("--tile-zoom", type=int, default=None)
    s.add_argument("--block-size", type=int, default=256)
    s.add_argument("--resampling", default="near",
                   choices=["near", "bilinear", "cubic"])
    s.add_argument("--project", default=None)
    s.add_argument("--gcs-path", default=None,
                   help="path within the bucket for the temp export "
                        "(default: auto-generated)")
    s.add_argument("--region", default=None,
                   help="export region: GeoJSON string or path to a "
                        ".geojson file")
    s.add_argument("--crs", default=None,
                   help="output CRS (default EPSG:4326; ignored when "
                        "--tile-zoom pins the web-mercator grid)")
    s.add_argument("--keep-temp", action="store_true", default=False,
                   help="keep the temporary GCS export object")
    s.add_argument("--timeout", type=float, default=None,
                   help="seconds to wait for the EE export task")
    s.add_argument("--overviews", default="none", choices=["auto", "none"])
    s.add_argument("--min-zoom", type=int, default=None)
    s.add_argument("--overview-resampling", default="average",
                   help="overview build kernel (average/mode/...; "
                        "--resampling stays the WARP kernel, matching "
                        "import-geotiff's --resampling/--warp-resampling "
                        "split)")
    s.add_argument("--streaming", action="store_true", default=False,
                   help="accepted for reference-CLI compatibility (no-op: "
                        "Spark converts distributed and memory-bounded)")
    s.set_defaults(fn=cmd_import_earthengine)

    s = sub.add_parser("import-netcdf", help="NetCDF (.nc: classic CDF-1/2 or NetCDF-4/HDF5) → raquet, CF time preserved")
    s.add_argument("input")
    s.add_argument("output")
    s.add_argument("--var", default=None, help="data variable (default: auto-detect)")
    s.add_argument("--zoom", type=int, default=None)
    s.add_argument("--block-size", type=int, default=256)
    s.add_argument("--resampling", default="near",
                   choices=["near", "bilinear", "cubic"])
    s.add_argument("--stats", action="store_true", default=True)
    s.set_defaults(fn=cmd_import_netcdf)

    s = sub.add_parser("grib-info", help="list a GRIB archive's messages and selection keys (no Spark session)")
    s.add_argument("input")
    s.add_argument("--json", action="store_true")
    s.set_defaults(fn=cmd_grib_info)

    s = sub.add_parser("import-grib", help="GRIB2 weather archive → raquet, forecast steps preserved")
    s.add_argument("input")
    s.add_argument("output")
    s.add_argument("--param", default=None,
                   help="parameter as 'category,number' (default: first message's)")
    s.add_argument("--level", default=None,
                   help="fixed surface as 'type,value' (e.g. '100,50000'"
                        " = 500 hPa; default: first matching message's)")
    s.add_argument("--zoom", type=int, default=None)
    s.add_argument("--block-size", type=int, default=256)
    s.add_argument("--resampling", default="near",
                   choices=["near", "bilinear", "cubic"])
    s.add_argument("--member", type=int, default=None,
                   help="select one ensemble member (PDT 4.1/4.11)")
    s.add_argument("--threshold", type=float, default=None,
                   help="select one probability threshold (PDT 4.5/4.9"
                        " archives): matches the lower limit, or the "
                        "upper limit for below-limit products whose "
                        "lower limit is encoded missing")
    s.add_argument("--percentile", type=int, default=None,
                   help="select one percentile value (PDT 4.6/4.10 "
                        "archives, e.g. NBM percentile products)")
    s.add_argument("--stats", action="store_true", default=True)
    s.set_defaults(fn=cmd_import_grib)

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
    s.add_argument("--select-bands", default=None,
                   help="comma-separated band names (default: all)")
    s.add_argument("--zoom", type=int, default=None,
                   help="export this zoom level (default: native max_zoom)")
    s.add_argument("--compression", default=None, choices=["lzw", "deflate"],
                   help="GeoTIFF strip compression (default: none)")
    s.add_argument("--overviews", action="store_true",
                   help="write lower zooms as GeoTIFF overview IFDs")
    s.add_argument("--cog", action="store_true",
                   help="Cloud-Optimized GeoTIFF: tiled layout, IFDs at "
                        "the head, pyramid levels as overviews")
    s.set_defaults(fn=cmd_export)

    s = sub.add_parser("split-zoom", help="one directory per zoom level")
    s.add_argument("file")
    s.add_argument("output")
    s.add_argument("--row-group-mb", type=int, default=None,
                   help="parquet row-group size in MB (smaller = better "
                        "remote pruning; the reference --row-group-size "
                        "role)")
    s.set_defaults(fn=cmd_split_zoom)

    s = sub.add_parser("dem", help="slope/aspect/hillshade or focal stats -> raquet")
    s.add_argument("file")
    s.add_argument("output")
    s.add_argument("--op", required=True,
                   choices=["slope", "aspect", "hillshade", "mean", "min",
                            "max", "range", "stddev", "sum"])
    s.add_argument("--band", default="band_1")
    s.add_argument("--radius", type=int, default=1,
                   help="window radius for the stat ops (derivatives are 3x3)")
    s.add_argument("--cellsize", type=float, default=None,
                   help="meters/pixel (default: mercator resolution at the zoom)")
    s.add_argument("--z-factor", type=float, default=1.0)
    s.add_argument("--azimuth", type=float, default=315.0)
    s.add_argument("--altitude", type=float, default=45.0)
    s.set_defaults(fn=cmd_dem)

    s = sub.add_parser("serve", help="HTTP tile server (/tile/{z}/{x}/{y} as WebP)")
    s.add_argument("--port", type=int, default=8000)
    s.add_argument("--file", default=None, help="default RaQuet parquet path")
    s.set_defaults(fn=cmd_serve)

    s = sub.add_parser("dedup", help="corpus dedup (exact/substring/minhash)")
    s.add_argument("file")
    s.add_argument("output")
    s.add_argument("--method", choices=["exact", "substring", "minhash"],
                   default="exact")
    s.add_argument("--window", type=int, default=20,
                   help="substring dedup token window")
    s.add_argument("--max-bucket-rows", type=int, default=None,
                   help="minhash: chain LSH buckets larger than this "
                        "(k-1 id-adjacent pairs instead of k(k-1)/2; "
                        "connectivity-preserving bound for "
                        "near-identical mega-clusters)")
    s.set_defaults(fn=cmd_dedup)

    s = sub.add_parser("pack", help="sequence packing (shard, bin per doc)")
    s.add_argument("file")
    s.add_argument("output")
    s.add_argument("--max-len", type=int, default=2048)
    s.add_argument("--shards", type=int, default=64)
    s.set_defaults(fn=cmd_pack)

    s = sub.add_parser(
        "quality", help="train + apply the model-based quality filter"
    )
    s.add_argument("file", help="corpus parquet (doc_id, text)")
    s.add_argument("output")
    s.add_argument("--labels", required=True,
                   help="labeled parquet (doc_id, text, y in {0,1})")
    s.add_argument("--dim", type=int, default=64)
    s.add_argument("--iters", type=int, default=8)
    s.add_argument("--lr", type=float, default=4.0)
    s.add_argument("--keep-only", action="store_true",
                   help="write only predicted-keep docs")
    s.set_defaults(fn=cmd_quality)

    s = sub.add_parser("partition", help="partition by quadbin ancestor")
    s.add_argument("file")
    s.add_argument("output")
    s.add_argument("--partition-zoom", default="auto")
    s.set_defaults(fn=cmd_partition)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
