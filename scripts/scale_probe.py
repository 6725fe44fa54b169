#!/usr/bin/env python3
"""Scale probe: run the heaviest operators at ~8-10x the bench input to
confirm runtime grows with shuffle volume (near-linearly), not with some
driver-side bottleneck — the round-4 "would the plan survive a scale-up"
check (VERDICT r03 item 10). No sf>0.1 testdata exists, so inputs are
scaled synthetically:

- documents: the sf0.1 table unioned 8x with re-keyed doc ids
- embeddings: the sf0.1 table unioned 8x with re-keyed vec ids
- raster: 16x16 tiles x 256px (16 Mpx, 4x the bench raster)

Prints one JSON line {"probe": {...}, "ratios_vs_bench": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from raquet_spark.session import get_spark

    spark = get_spark("raquet_spark_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    from raquet_spark.queries import load_table

    mult = 8
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    big_docs = docs
    for i in range(1, mult):
        big_docs = big_docs.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        )
    big_docs = big_docs.localCheckpoint(eager=True)

    emb = load_table(spark, sf_dir, "embeddings")
    big_emb = emb
    for i in range(1, mult):
        big_emb = big_emb.unionByName(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
        )
    big_emb = big_emb.localCheckpoint(eager=True)

    timings: dict[str, float] = {}

    def bench(name: str, fn) -> None:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    from raquet_spark.operators.dedup import (
        connected_components,
        minhash_dedup_pairs,
    )
    from raquet_spark.operators.similarity import ann_lsh

    bench(f"dedup_minhash_x{mult}", lambda: minhash_dedup_pairs(big_docs).count())
    bench(
        f"dedup_components_x{mult}",
        lambda: connected_components(
            minhash_dedup_pairs(big_docs), "id_a", "id_b"
        ).count(),
    )
    queries_df = big_emb.where("vec_id % 25 = 0")
    # bench settings (n_bits=4 → 16 buckets/table): per-bucket work grows
    # quadratically when corpus AND query side both scale — the knob a
    # user turns at scale is n_bits, which bounds bucket size
    bench(
        f"ann_lsh_x{mult}",
        lambda: ann_lsh(big_emb, queries_df, k=5, n_bits=4, n_tables=12, dim=64).count(),
    )
    bench(
        f"ann_lsh_x{mult}_nbits7",
        lambda: ann_lsh(big_emb, queries_df, k=5, n_bits=7, n_tables=12, dim=64).count(),
    )
    # round-5: n_bits omitted — derive_lsh_bits sizes from the corpus,
    # so the DEFAULT should now track the hand-tuned nbits7 line, not
    # the quadratic nbits4 one
    bench(
        f"ann_lsh_x{mult}_auto",
        lambda: ann_lsh(big_emb, queries_df, k=5, n_tables=12, dim=64).count(),
    )

    # round-5 additions: the newest operator families carry a measured
    # scale story too (VERDICT r04 item 9)

    # semantic dedup at 8x: auto-sized LSH (n_bits derived from corpus),
    # planted copies of every 10th vector, full LSH → components → keep
    from raquet_spark.operators.dedup import embedding_dedup_pairs_lsh

    def semantic_keep() -> int:
        planted = big_emb.where("vec_id % 10 = 0").withColumn(
            "vec_id", F.col("vec_id") + F.lit(100_000_000)
        )
        corpus = big_emb.unionByName(planted).localCheckpoint(eager=True)
        pairs = embedding_dedup_pairs_lsh(
            corpus, threshold=0.95, n_tables=16, dim=64
        ).where(F.col("id_b") == F.col("id_a") + F.lit(100_000_000))
        comp = connected_components(pairs, "id_a", "id_b")
        pruned = comp.where("node != component").selectExpr("node AS vec_id")
        return corpus.select("vec_id").join(pruned, "vec_id", "left_anti").count()

    bench(f"semantic_dedup_x{mult}", semantic_keep)

    # pHash dedup on an 8x media table (960 images + copies): DCT
    # signatures, pigeonhole-banded hamming join
    from raquet_spark.operators.multimodal import (
        make_media_table,
        phash_dedup_pairs,
        phash_table,
    )

    def phash() -> int:
        media = make_media_table(spark, n=120 * mult).select(
            "media_id", "payload"
        )
        copies = media.where("media_id % 5 = 0").withColumn(
            "media_id", F.col("media_id") + F.lit(10_000_000)
        )
        hashes = phash_table(media.unionByName(copies))
        return phash_dedup_pairs(hashes, max_distance=0).count()

    bench(f"phash_dedup_x{mult}", phash)

    # batched BPE on the 8x corpus: driver rounds << merges now
    from raquet_spark.operators.textops import bpe_train

    def bpe() -> int:
        stats: dict = {}
        merges = bpe_train(big_docs, n_merges=32, batch_size=8, stats=stats)
        timings["bpe_rounds_x%d" % mult] = stats.get("rounds", -1)
        return len(merges)

    bench(f"bpe_train32_x{mult}", bpe)

    # DSIR weights on the 8x corpus: two 1024-bucket aggs + one
    # broadcast scoring join — should track corpus size linearly
    from raquet_spark.queries import _SQL_QUERIES, register_views

    register_views(spark, sf_dir)
    big_docs.createOrReplaceTempView("documents")
    dsir_sql = _SQL_QUERIES["dsir_weights"]("spark")
    bench(f"dsir_weights_x{mult}", lambda: spark.sql(dsir_sql).count())
    # register_views memoizes per (app, sf_dir): restore explicitly
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")

    # raster: 16 Mpx (4x bench's 4 Mpx)
    import tempfile

    from raquet_spark.operators.pyramid import build_pyramid
    from raquet_spark.operators.tile_stats import with_tile_stats
    from raquet_spark.sources.geotiff import write_geotiff_sharded
    from raquet_spark.sources.raquet import read_raquet, write_raquet
    from raquet_spark.testing import make_synthetic_raster

    t0 = time.perf_counter()
    tiles, meta = make_synthetic_raster(
        spark, zoom=9, tiles_x=16, tiles_y=16, origin_x=128, origin_y=160,
        block_size=256, num_bands=1, dtype="float32", nodata=-1.0,
        nodata_every=11,
    )
    raster_path = tempfile.mkdtemp(prefix="probe_raster_") + "/raster.parquet"
    write_raquet(tiles, raster_path, meta)
    timings["raster_write_16mpx"] = round(time.perf_counter() - t0, 3)

    scan = read_raquet(spark, raster_path)
    bench("raster_tile_stats_16mpx", lambda: with_tile_stats(scan, meta).count())
    bench(
        "raster_pyramid_16mpx",
        lambda: build_pyramid(scan, meta, min_zoom=6, resampling="average")[0].count(),
    )
    bench(
        "geotiff_export_sharded_16mpx",
        lambda: write_geotiff_sharded(
            scan, meta, tempfile.mkdtemp(prefix="probe_shards_"), rows_per_shard=2
        ),
    )

    # focal slope over the 16 Mpx raster: strip halo exchange, one
    # shuffle; volume ~= input + 3% strips
    from raquet_spark.operators.focal import focal_map

    bench(
        "focal_slope_16mpx",
        lambda: focal_map(scan, meta, "slope").count(),
    )

    out = {"probe": timings, "n_docs_base": n_docs, "multiplier": mult}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
