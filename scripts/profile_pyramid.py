#!/usr/bin/env python3
"""Standalone repro of the bench raster pyramid/lanczos timings.

Runs ONLY the raster fixture + pyramid/lanczos queries in a fresh
session, mirroring bench.py's raster section, to separate code-path
regressions from bench-process context (earlier queries' memory/worker
state)."""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from raquet_spark.operators.pyramid import build_level, build_pyramid
    from raquet_spark.session import get_spark
    from raquet_spark.sources.raquet import read_raquet, write_raquet
    from raquet_spark.testing import make_synthetic_raster

    spark = get_spark("pyramid_profile")
    spark.sparkContext.setLogLevel("ERROR")
    # same worker warmup as bench.py
    spark.range(spark.sparkContext.defaultParallelism * 2).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).count()

    tiles, meta = make_synthetic_raster(
        spark, zoom=8, tiles_x=8, tiles_y=8, origin_x=64, origin_y=80,
        block_size=256, num_bands=1, dtype="float32", nodata=-1.0, nodata_every=11,
    )
    raster_path = tempfile.mkdtemp(prefix="prof_raster_") + "/raster.parquet"
    write_raquet(tiles, raster_path, meta)
    scan = read_raquet(spark, raster_path)

    for name, fn in [
        ("pyramid_avg", lambda: build_pyramid(scan, meta, min_zoom=5, resampling="average")[0].count()),
        ("lanczos_level", lambda: build_level(scan, meta, 8, "lanczos").count()),
    ]:
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn()
            ts.append(round(time.perf_counter() - t0, 3))
        print(name, "min", min(ts), "all", ts)


if __name__ == "__main__":
    main()
