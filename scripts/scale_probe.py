#!/usr/bin/env python3
"""Scale probe: run the heaviest operators at 8x AND 64x the bench input
to confirm runtime grows with shuffle volume (near-linearly), not with a
driver-side bottleneck or a hidden quadratic term — the round-4 "would
the plan survive a scale-up" check (VERDICT r03 item 10), deepened to
x64 in round 7 (VERDICT r06 item 7: "components/BPE/minhash
superlinearity shows later"). No sf>0.1 testdata exists, so inputs are
scaled synthetically:

- documents: the sf0.1 table unioned Nx with re-keyed doc ids
- embeddings: the sf0.1 table unioned Nx with re-keyed vec ids
- raster: 16x16 tiles x 256px (16 Mpx, 4x the bench raster)

Prints one JSON line {"probe": {...}, ...}. Override the multiplier list
with SPARK_GRAFT_PROBE_MULTS=8,64 (comma-separated).
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
    mults = [
        int(m)
        for m in os.environ.get("SPARK_GRAFT_PROBE_MULTS", "8,64").split(",")
    ]
    from raquet_spark.session import get_spark

    spark = get_spark("raquet_spark_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    from raquet_spark.queries import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    emb = load_table(spark, sf_dir, "embeddings")

    def scale_up(df, key: str, mult: int):
        """Replicate the table mult times with re-keyed ids (copy i
        shifts the key by i*10M — identical rows to the r04-r12 union
        loop, as one crossJoin branch so a x256 plan stays shallow),
        materialized so each probe line times the operator, not the
        synthesis."""
        big = (
            df.crossJoin(
                spark.range(mult).withColumnRenamed("id", "_copy")
            )
            .withColumn(key, F.col(key) + F.col("_copy") * 10_000_000)
            .drop("_copy")
            # the crossJoin keeps the BASE table's partition count (the
            # sf0.1 parquet is ~1 partition), which would strangle the
            # first post-checkpoint stage to 1 task; the old union loop
            # yielded ~mult partitions — match that, capped at 4x the
            # core count so x256 doesn't fragment into 256 tiny tasks
            .repartition(
                min(mult, 4 * spark.sparkContext.defaultParallelism)
            )
        )
        return big.localCheckpoint(eager=True)

    timings: dict[str, float] = {}
    # SPARK_GRAFT_PROBE_ONLY=substr1,substr2 restricts to matching
    # lines — the r14 x256 minhash/ann_lsh deep probe runs in minutes
    # instead of re-running every family at 4x the x64 volume
    only = [
        t for t in os.environ.get("SPARK_GRAFT_PROBE_ONLY", "").split(",")
        if t
    ]

    def bench(name: str, fn, runs: int = 2) -> None:
        if only and not any(t in name for t in only):
            return
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]}s", file=sys.stderr, flush=True)

    from raquet_spark.operators.dedup import (
        connected_components,
        embedding_dedup_pairs_lsh,
        keep_cluster_min,
        minhash_dedup_pairs,
    )
    from raquet_spark.operators.similarity import (
        ann_ivf,
        ann_ivf_pq,
        ann_lsh,
        cosine_topk,
    )
    from raquet_spark.operators.textops import (
        bpe_train,
        hashed_embeddings,
        train_quality_classifier,
    )
    from raquet_spark.queries import register_views

    register_views(spark, sf_dir)

    class _Lazy:
        """Defers scale_up (an eager localCheckpoint materialization)
        until a selected bench line first touches the table — under
        SPARK_GRAFT_PROBE_ONLY a deep x256 arm no longer builds the
        table no selected line reads (review r14)."""

        def __init__(self, thunk):
            self._thunk = thunk
            self._df = None

        def __getattr__(self, name):
            if self._df is None:
                self._df = self._thunk()
            return getattr(self._df, name)

    for mult in mults:
        # x64 lines run once (superlinearity shows in the exponent, not
        # the min-of-2); x8 keeps min-of-2 for continuity with r04/r05.
        runs = 2 if mult <= 8 else 1
        big_docs = _Lazy(lambda m=mult: scale_up(docs, "doc_id", m))
        big_emb = _Lazy(lambda m=mult: scale_up(emb, "vec_id", m))

        # materialize each table OUTSIDE the timed region when any
        # selected line will touch it (x64+ lines run once, so a lazy
        # first-touch inside bench would fold the synthesis into the
        # exact timing the probe exists to isolate — review r14); the
        # attribute access triggers _Lazy's thunk
        def _selected(*names):
            return not only or any(t in n for n in names for t in only)

        if _selected(f"dedup_minhash_x{mult}", f"dedup_components_x{mult}",
                     f"dedup_minhash_collapse_x{mult}",
                     f"dedup_components_collapse_x{mult}",
                     f"dedup_minhash_chaincap_x{mult}",
                     f"quality_classifier4_x{mult}",
                     f"substring_dedup_x{mult}", f"bpe_train32_x{mult}",
                     f"dsir_weights_x{mult}"):
            big_docs.columns
        if _selected(f"ann_lsh_x{mult}_auto", f"ann_ivf_x{mult}_auto",
                     f"ann_ivf_pq_x{mult}", f"cosine_topk_x{mult}",
                     f"semantic_dedup_x{mult}",
                     f"semantic_perturbed_x{mult}",
                     f"embedding_dedup_collapse_x{mult}"):
            big_emb.columns

        # auto_width=True: the r15 production path — each operator
        # derives its own shuffle width from the corpus instead of the
        # probe exporting SPARK_GRAFT_SHUFFLE_PARTITIONS (the r14 x256
        # components arm OOMed at the default 32-wide session)
        def minhash_full(m=mult) -> None:
            n = minhash_dedup_pairs(big_docs, auto_width=True).count()
            timings[f"dedup_minhash_pairs_x{m}"] = n

        bench(f"dedup_minhash_x{mult}", minhash_full, runs)

        # collapse_identical: the production keep-min funnel's pair
        # shape (r16). The scaled corpus is ALL exact duplicates (each
        # copy re-keyed, text unchanged), so the recorded pair volume
        # must grow ~linearly with mult where the full listing grows
        # quadratically — the VERDICT r15 #1 "done" check.
        def minhash_collapse(m=mult) -> None:
            n = minhash_dedup_pairs(
                big_docs, auto_width=True, collapse_identical=True
            ).count()
            timings[f"dedup_minhash_collapse_pairs_x{m}"] = n

        bench(f"dedup_minhash_collapse_x{mult}", minhash_collapse, runs)
        bench(
            f"dedup_components_x{mult}",
            lambda: connected_components(
                minhash_dedup_pairs(big_docs, auto_width=True), "id_a", "id_b",
                auto_width=True,
            ).count(),
            runs,
        )
        bench(
            f"dedup_components_collapse_x{mult}",
            lambda: connected_components(
                minhash_dedup_pairs(
                    big_docs, auto_width=True, collapse_identical=True
                ),
                "id_a", "id_b", auto_width=True,
            ).count(),
            runs,
        )

        # NEAR-identical mega-cluster residual (r16): each scaled copy
        # gets a copy-specific suffix token, so signatures are DISTINCT
        # (collapse can't touch them) but most bands still collide —
        # the 10^7-doc boilerplate near-clique shape. max_bucket_rows
        # chains over-cap buckets; recorded pair volume must grow
        # ~linearly where the uncapped listing grows quadratically.
        def minhash_chaincap(m=mult) -> None:
            near = big_docs.selectExpr(
                "doc_id",
                "concat(text, ' copytoken', CAST(doc_id DIV 10000000"
                " AS STRING)) AS text",
            )
            n = minhash_dedup_pairs(
                near, auto_width=True, collapse_identical=True,
                max_bucket_rows=32,
            ).count()
            timings[f"dedup_minhash_chaincap_pairs_x{m}"] = n

        bench(f"dedup_minhash_chaincap_x{mult}", minhash_chaincap, runs)

        # Streaming twin of the flood bound (r17, VERDICT r16 #1): k
        # identical docs ingested over 8 micro-batches. With
        # collapse_identical the persisted band index keeps ONE row-set
        # per distinct signature, so cumulative emitted pairs must be
        # exactly k−1 (linear); the _full twin (same corpus, no
        # collapse) is the O(k²) cumulative listing the r16 batch fix
        # left open on the streaming side.
        def run_streaming_flood(m, metric, row_builder, process) -> None:
            """Shared F11/F12 flood harness (review r17): k identical
            rows over 8 micro-batches, cumulative pair count recorded
            under ``metric`` — the two families differ only in the row
            builder and the per-batch processor."""
            import shutil
            import tempfile

            k, n_batches = 16 * m, 8
            per = k // n_batches
            base_dir = tempfile.mkdtemp(prefix="probe_flood_")
            try:
                for bi in range(n_batches):
                    rows = row_builder(per, bi * per + 100000)
                    process(
                        rows, bi, f"{base_dir}/idx", f"{base_dir}/pairs"
                    )
                n = spark.read.parquet(f"{base_dir}/pairs").count()
                timings[f"{metric}_pairs_x{m}"] = n
            finally:
                shutil.rmtree(base_dir, ignore_errors=True)

        def streaming_flood(m=mult, collapse=True) -> None:
            from raquet_spark.streaming.ingest import (
                minhash_dedup_process_batch,
            )

            seed_text = docs.limit(1).collect()[0]["text"]
            run_streaming_flood(
                m,
                "streaming_flood" if collapse else "streaming_flood_full",
                lambda per, off: spark.range(per).selectExpr(
                    f"id + {off} AS doc_id"
                ).withColumn("text", F.lit(seed_text)),
                lambda rows, bi, idx, pairs: minhash_dedup_process_batch(
                    rows, bi, idx, pairs,
                    collapse_identical=collapse,
                    max_bucket_rows=64 if collapse else None,
                ),
            )

        bench(f"streaming_flood_x{mult}", streaming_flood, runs)
        bench(
            f"streaming_flood_full_x{mult}",
            lambda m=mult: streaming_flood(m, collapse=False),
            runs,
        )

        # embedding-family streaming twin (F12, r17): same flood shape
        # with byte-identical VECTORS — cumulative pairs must be k−1
        def streaming_emb_flood(m=mult) -> None:
            from raquet_spark.streaming.ingest import (
                embedding_dedup_process_batch,
            )

            seed_vec = emb.limit(1).collect()[0]["embedding"]
            run_streaming_flood(
                m,
                "streaming_emb_flood",
                lambda per, off: spark.range(per).selectExpr(
                    f"id + {off} AS vec_id"
                ).withColumn(
                    "embedding", F.lit(seed_vec).cast("array<double>")
                ),
                lambda rows, bi, idx, pairs: embedding_dedup_process_batch(
                    rows, bi, idx, pairs,
                    collapse_identical=True, max_bucket_rows=64,
                    threshold=0.95, n_bits=6, n_tables=16, dim=64,
                ),
            )

        bench(f"streaming_emb_flood_x{mult}", streaming_emb_flood, runs)

        # ANN families. Query side scales with the corpus (every 25th /
        # 100th vector) so the probe measures corpus AND query growth;
        # query-side .where derivations live inside the lambdas so an
        # unselected family never touches (= materializes) the table
        # auto-sized LSH: derive_lsh_bits pins ~1k expected bucket
        # occupancy, so per-bucket work stays bounded as N grows
        bench(
            f"ann_lsh_x{mult}_auto",
            lambda: ann_lsh(
                big_emb, big_emb.where("vec_id % 25 = 0"),
                k=5, n_tables=12, dim=64
            ).count(),
            runs,
        )
        # auto-sized IVF: ~sqrt(N) clusters, n_probe=3 lists per query
        # -> scored pairs grow as Q*sqrt(N) by design (document, don't
        # hide); PQ rides the same probe with byte codes + rerank.
        bench(
            f"ann_ivf_x{mult}_auto",
            lambda: ann_ivf(
                big_emb, big_emb.where("vec_id % 100 = 0"), k=5
            ).count(),
            runs,
        )
        bench(
            f"ann_ivf_pq_x{mult}",
            lambda: ann_ivf_pq(
                big_emb, big_emb.where("vec_id % 100 = 0"), k=5
            ).count(),
            runs,
        )
        # exact brute-force baseline, r10 Arrow-batched partial-top-k
        # rework: FIXED query count (every 400*mult-th) so the probe
        # isolates corpus growth — the matmul is O(N*Q*dim) flops by
        # construction; the line must grow ~linearly in N, and the
        # emitted partial rows stay partitions*k*Q regardless of N
        bench(
            f"cosine_topk_x{mult}",
            lambda: cosine_topk(
                big_emb, big_emb.where(f"vec_id % {400 * mult} = 0"), k=5
            ).count(),
            runs,
        )
        # r10 trainer rework: one map-only matmul job per iteration —
        # per-iteration cost must grow linearly with the corpus
        def classifier() -> int:
            feats = hashed_embeddings(
                big_docs.selectExpr(
                    "doc_id", "text",
                    "CAST(doc_id % 2 AS DOUBLE) AS y",
                ),
                dim=64,
            )
            w = train_quality_classifier(
                feats,
                big_docs.selectExpr(
                    "doc_id", "CAST(doc_id % 2 AS DOUBLE) AS y"
                ),
                dim=64, n_iter=4, lr=2.0,
            )
            return len(w)

        bench(f"quality_classifier4_x{mult}", classifier, runs)

        # semantic dedup: auto-sized LSH, planted copies of every 10th
        # vector, full LSH -> components -> keep chain
        def semantic_keep() -> int:
            planted = big_emb.where("vec_id % 10 = 0").withColumn(
                "vec_id", F.col("vec_id") + F.lit(100_000_000)
            )
            corpus = big_emb.unionByName(planted).localCheckpoint(eager=True)
            # deliberately LAZY (auto_width=False end to end): Catalyst
            # fuses the planted-pair filter INTO the LSH self-join and
            # verify, pruning ~50x of the pair work — measured 14-16s
            # lazy vs 232s when auto_width materialized the COMPLETE
            # verified pair set before the filter (r15). This arm
            # measures the declarative chain; the full-pair-set shape
            # is what dedup_components_x256 measures.
            pairs = embedding_dedup_pairs_lsh(
                corpus, threshold=0.95, n_tables=16, dim=64
            ).where(F.col("id_b") == F.col("id_a") + F.lit(100_000_000))
            return keep_cluster_min(
                corpus.select("vec_id"), pairs, id_col="vec_id",
                auto_width=False,
            ).count()

        bench(f"semantic_dedup_x{mult}", semantic_keep, runs)

        # semantic dedup with REALISTIC (perturbed, not byte-identical)
        # near-duplicates, measured recall (VERDICT r15 #6). Corpus
        # realism requires DISTINCT vectors: scale_up replicates the
        # base table byte-identically, so each copy is circular-shifted
        # by its copy index (rotations of quasi-random vectors are
        # ~uncorrelated) — without this the corpus is one giant 64-way
        # exact-dup cluster and the complete listing is quadratic by
        # construction (first r16 attempt: 431 s at x64, recall metric
        # contaminated by copy-gap id coincidences). Every 10th vector
        # then gets a deterministic ±3% element-wise perturbed twin
        # (cosine stays >= threshold but signatures can differ); the
        # COMPLETE verified pair set materializes via auto_width=True
        # (the cluster-then-keep production shape — no planted-filter
        # pushdown shortcut), and recall = found planted pairs /
        # planted pairs whose TRUE cosine clears the threshold. The
        # plant offset (1e10) exceeds every corpus id, so an id gap of
        # exactly `off` identifies planted pairs unambiguously.
        def semantic_perturbed(m=mult) -> int:
            off = 10_000_000_000
            c = "CAST((vec_id DIV 10000000) % 64 AS INT)"
            base_emb = big_emb.selectExpr(
                "vec_id",
                f"concat(slice(embedding, {c} + 1, 64 - {c}),"
                f" slice(embedding, 1, {c})) AS embedding",
            )
            pert = base_emb.where("vec_id % 10 = 0").selectExpr(
                f"vec_id + {off} AS vec_id",
                "transform(embedding, (x, i) -> CAST(x * (1.0 + 0.03 *"
                " sin(CAST(vec_id AS DOUBLE) * (i + 1))) AS FLOAT))"
                " AS embedding",
            )
            corpus = base_emb.unionByName(pert).localCheckpoint(eager=True)
            a = base_emb.where("vec_id % 10 = 0").selectExpr(
                "vec_id", "embedding AS ea"
            )
            b = pert.selectExpr(f"vec_id - {off} AS vec_id",
                                "embedding AS eb")
            dot = ("aggregate(zip_with(ea, eb, (x, y) -> CAST(x AS DOUBLE)"
                   " * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
            nrm = ("SQRT(aggregate({0}, CAST(0.0 AS DOUBLE), (acc, v) ->"
                   " acc + CAST(v AS DOUBLE) * v))")
            gt = (
                a.join(b, "vec_id")
                .selectExpr(
                    f"({dot}) / ({nrm.format('ea')}) / ({nrm.format('eb')})"
                    " AS cos_sim"
                )
                .where("cos_sim >= 0.95")
                .count()
            )
            pairs = embedding_dedup_pairs_lsh(
                corpus, threshold=0.95, n_tables=16, dim=64, auto_width=True
            )
            found = pairs.where(
                F.col("id_b") == F.col("id_a") + F.lit(off)
            ).count()
            timings[f"semantic_perturbed_recall_x{m}"] = round(
                found / gt, 4
            ) if gt else None
            return keep_cluster_min(
                corpus.select("vec_id"), pairs, id_col="vec_id",
                auto_width=True,
            ).count()

        bench(f"semantic_perturbed_x{mult}", semantic_perturbed, runs)

        # the duplicate-heavy embedding shape (r16): the scaled corpus
        # IS 64-way byte-identical, so the complete verified listing is
        # quadratic in duplication — collapse_identical turns it into
        # star edges + a distinct-vector listing (same closure, linear
        # volume; the embedding analogue of dedup_minhash_collapse)
        def embedding_collapse(m=mult) -> None:
            n = embedding_dedup_pairs_lsh(
                big_emb.select("vec_id", "embedding"), threshold=0.95,
                n_tables=8, dim=64, auto_width=True,
                collapse_identical=True,
            ).count()
            timings[f"embedding_dedup_collapse_pairs_x{m}"] = n

        bench(f"embedding_dedup_collapse_x{mult}", embedding_collapse, runs)

        # exact-substring dedup: shingle-hash shuffle carries tokens x
        # 8 bytes; window merge shuffles each doc's duplicate starts
        from raquet_spark.operators.textops import substring_dedup_spans

        bench(
            f"substring_dedup_x{mult}",
            lambda: substring_dedup_spans(
                big_docs, window=12, auto_width=True
            ).count(),
            runs,
        )

        # batched BPE: driver rounds must stay << merges as the corpus
        # grows (adaptive width, round-7 change)
        def bpe() -> int:
            stats: dict = {}
            merges = bpe_train(big_docs, n_merges=32, batch_size=8, stats=stats)
            timings[f"bpe_rounds_x{mult}"] = stats.get("rounds", -1)
            return len(merges)

        bench(f"bpe_train32_x{mult}", bpe, runs)

        # DSIR weights: two 1024-bucket aggs + one broadcast scoring join
        # (r17: the single-pass Spark fork — same plan the registered
        # query runs)
        from raquet_spark.queries import dsir_weights_df

        def dsir() -> int:
            return dsir_weights_df(
                big_docs.select("doc_id", "lang", "text")
            ).count()

        bench(f"dsir_weights_x{mult}", dsir, runs)


    # pHash dedup stays at x8: make_media_table synthesis is the cost at
    # larger mults, not the banded hamming join being probed
    from raquet_spark.operators.multimodal import (
        make_media_table,
        phash_dedup_pairs,
        phash_table,
    )

    def phash() -> int:
        media = make_media_table(spark, n=120 * 8).select("media_id", "payload")
        copies = media.where("media_id % 5 = 0").withColumn(
            "media_id", F.col("media_id") + F.lit(10_000_000)
        )
        hashes = phash_table(media.unionByName(copies))
        return phash_dedup_pairs(hashes, max_distance=0).count()

    bench("phash_dedup_x8", phash)

    # raster: 16 Mpx (4x bench's 4 Mpx). The whole family keys on
    # "raster"/"geotiff"/"focal": under PROBE_ONLY the synthesis+write
    # (which is itself the raster_write line) is skipped when no
    # raster line is selected
    import tempfile

    # SPARK_GRAFT_PROBE_RASTER_SIDE scales the raster family grid; the
    # candidate names carry the resulting Mpx suffix so recorded labels
    # (raster_write_16mpx / raster_write_67mpx) keep matching PROBE_ONLY
    raster_side = int(os.environ.get("SPARK_GRAFT_PROBE_RASTER_SIDE", "16"))
    raster_mpx = f"{raster_side * raster_side * 256 * 256 // 1_000_000}mpx"
    run_raster = not only or any(
        t in n for t in only
        for n in (f"raster_write_{raster_mpx}",
                  f"raster_tile_stats_{raster_mpx}",
                  f"raster_pyramid_{raster_mpx}",
                  f"geotiff_export_sharded_{raster_mpx}",
                  f"focal_slope_{raster_mpx}")
    )
    run_netcdf = not only or any(
        t in n for t in only
        for n in ("netcdf4_decode_x1", "netcdf4_decode_x8")
    )
    run_import = not only or any(
        t in n for t in only
        for n in ("netcdf_import_x1", "netcdf_import_x4",
                  "netcdf_import_x16", "netcdf_import_flip",
                  "geotiff_import_1mpx", "geotiff_import_4mpx",
                  "geotiff_import_16mpx", "geotiff_import_36mpx",
                  "grib2_import_x1", "grib2_import_x16")
    )
    if not run_raster and not run_netcdf and not run_import:
        print(json.dumps({
            "probe": timings, "n_docs_base": n_docs, "multipliers": mults,
        }))
        return

    if run_raster:
        from raquet_spark.operators.focal import focal_map
        from raquet_spark.operators.pyramid import build_pyramid
        from raquet_spark.operators.tile_stats import with_tile_stats
        from raquet_spark.sources.geotiff import write_geotiff_sharded
        from raquet_spark.sources.raquet import read_raquet, write_raquet
        from raquet_spark.testing import make_synthetic_raster

        # SPARK_GRAFT_PROBE_RASTER_SIDE=32 scales the raster family to
        # a 32x32-tile (67 Mpx) grid — 16x the bench raster — keeping
        # the historical 16 Mpx labels at the default
        side, mpx = raster_side, raster_mpx
        zoom_r = 9 if side <= 16 else 10
        t0 = time.perf_counter()
        tiles, meta = make_synthetic_raster(
            spark, zoom=zoom_r, tiles_x=side, tiles_y=side,
            origin_x=128, origin_y=160,
            block_size=256, num_bands=1, dtype="float32", nodata=-1.0,
            nodata_every=11,
        )
        raster_path = tempfile.mkdtemp(prefix="probe_raster_") + "/raster.parquet"
        write_raquet(tiles, raster_path, meta)
        timings[f"raster_write_{mpx}"] = round(time.perf_counter() - t0, 3)

        scan = read_raquet(spark, raster_path)
        bench(f"raster_tile_stats_{mpx}", lambda: with_tile_stats(scan, meta).count())
        bench(
            f"raster_pyramid_{mpx}",
            lambda: build_pyramid(scan, meta, min_zoom=zoom_r - 3, resampling="average")[0].count(),
        )
        bench(
            f"geotiff_export_sharded_{mpx}",
            lambda: write_geotiff_sharded(
                scan, meta, tempfile.mkdtemp(prefix="probe_shards_"), rows_per_shard=2
            ),
        )
        bench(f"focal_slope_{mpx}", lambda: focal_map(scan, meta, "slope").count())

    if run_netcdf:
        # NetCDF-4/HDF5 distributed chunk decode: one task per stored chunk
        # (shuffle-free mapInPandas) — runtime must track chunk count
        import numpy as np

        from raquet_spark.sources.netcdf import (
            netcdf_pixel_table,
            read_netcdf_structure,
        )
        from raquet_spark.testing_hdf5 import write_netcdf4

        for mult in (1, 8):
            nlat, nlon, nt = 320 * mult, 480, 3
            lats = 80.0 - 0.01 * np.arange(nlat)
            lons = -170.0 + 0.01 * np.arange(nlon)
            gy, gx = np.mgrid[0:nlat, 0:nlon]
            data = np.stack(
                [((gx * 7 + gy * 11 + t * 13) % 199 - 50) for t in range(nt)]
            ).astype("<i2")
            p = tempfile.mkdtemp(prefix="probe_nc4_") + "/probe.nc"
            write_netcdf4(
                p, lats, lons, data, times=np.arange(nt, dtype="f8"),
                nc_type=3, scale_factor=0.5, add_offset=100.0,
                fill_value=-999, chunks=(1, 64, 240),
                filters=(("shuffle",), ("deflate", 4)),
            )
            nc = read_netcdf_structure(p)
            bench(
                f"netcdf4_decode_x{mult}",
                lambda: netcdf_pixel_table(spark, nc, "value").count(),
            )

    if run_import:
        # import-family growth (r15, VERDICT r14 #4): the dedup/ANN
        # probes cover the text side; these replicate the CONVERSION
        # pipelines past bench scale and record the import-warp
        # gather-join strategy (tiff_reader's known-source-size
        # decision: broadcast <=100 MB source bytes x steps, shuffled
        # hash above) actually flipping at runtime, not just in the
        # plan tests.
        import tempfile

        import numpy as np

        strategies: dict[str, str] = {}

        def join_strategy(df) -> str:
            plan = df._jdf.queryExecution().executedPlan().toString()
            if "ShuffledHashJoin" in plan:
                return "shuffle_hash"
            if "BroadcastHashJoin" in plan:
                return "broadcast"
            return "other"

        # --- classic NetCDF 3-step import: grid grows x1/x4/x16 at 3
        # steps (growth arms, all broadcast-side), then a flip arm
        # whose source bytes x steps crosses the 100 MB bound
        from raquet_spark.sources.netcdf import netcdf_to_raquet
        from raquet_spark.testing import write_netcdf_classic

        def make_nc(nlat: int, nlon: int, nt: int) -> str:
            gy, gx = np.mgrid[0:nlat, 0:nlon]
            data = np.stack(
                [((gx * 7 + gy * 11 + t * 13) % 199 - 50) for t in range(nt)]
            ).astype("<i2")
            p = tempfile.mktemp(suffix=".nc")
            write_netcdf_classic(
                p,
                37.9875 - 0.0025 * np.arange(nlat),
                -123.0 + 0.0025 * np.arange(nlon),
                data,
                times=np.arange(nt, dtype="f8"),
                nc_type=3, scale_factor=0.5, add_offset=100.0,
                fill_value=-999,
            )
            return p

        for tag, (nlat, nlon, nt) in {
            "x1": (600, 800, 3),       # the bench shape, 1.4 Mpx
            "x4": (1200, 1600, 3),     # 5.8 Mpx
            "x16": (2400, 3200, 3),    # 23 Mpx, 46 MB src: broadcast
            "flip": (2400, 3200, 8),   # 61 Mpx, 123 MB src: SHJ
        }.items():
            if only and not any(
                t in f"netcdf_import_{tag}" for t in only
            ):
                continue
            p = make_nc(nlat, nlon, nt)
            t0 = time.perf_counter()
            nc_tiles, _m = netcdf_to_raquet(
                spark, p, block_size=128, stats=False
            )
            nc_tiles.count()
            timings[f"netcdf_import_{tag}"] = round(
                time.perf_counter() - t0, 3
            )
            strategies[f"netcdf_import_{tag}"] = join_strategy(nc_tiles)
            os.unlink(p)
            print(
                f"  netcdf_import_{tag}: {timings[f'netcdf_import_{tag}']}s "
                f"({strategies[f'netcdf_import_{tag}']})",
                file=sys.stderr, flush=True,
            )

        # --- GeoTIFF bilinear re-import at 1/4/16/36 Mpx (float32:
        # 36 Mpx = 147 MB source, past the broadcast bound)
        from raquet_spark.sources.geotiff import write_geotiff
        from raquet_spark.sources.raquet import write_raquet as _wr
        from raquet_spark.sources.tiff_reader import geotiff_to_raquet
        from raquet_spark.testing import make_synthetic_raster

        for tag, tiles_side in {"1mpx": 4, "4mpx": 8, "16mpx": 16,
                                "36mpx": 24}.items():
            if only and not any(
                t in f"geotiff_import_{tag}" for t in only
            ):
                continue
            tiles, meta = make_synthetic_raster(
                spark, zoom=9, tiles_x=tiles_side, tiles_y=tiles_side,
                origin_x=128, origin_y=160, block_size=256, num_bands=1,
                dtype="float32", nodata=-1.0, nodata_every=11,
            )
            tif = tempfile.mktemp(suffix=".tif")
            write_geotiff(tiles, meta, tif)
            t0 = time.perf_counter()
            imp, _m = geotiff_to_raquet(
                spark, tif, block_size=256, resampling="bilinear"
            )
            imp.count()
            timings[f"geotiff_import_{tag}"] = round(
                time.perf_counter() - t0, 3
            )
            strategies[f"geotiff_import_{tag}"] = join_strategy(imp)
            os.unlink(tif)
            print(
                f"  geotiff_import_{tag}: "
                f"{timings[f'geotiff_import_{tag}']}s "
                f"({strategies[f'geotiff_import_{tag}']})",
                file=sys.stderr, flush=True,
            )

        # --- GRIB2 archive: message count x1 -> x16 (4 -> 64 fields,
        # one time_cf layer per message through the shared warp)
        from raquet_spark.sources.grib2 import grib2_to_raquet
        from raquet_spark.testing_grib2 import write_grib2

        def make_grib(n_msgs: int) -> str:
            nj, ni = 240, 360
            gy, gx = np.mgrid[0:nj, 0:ni]
            fields = [
                {"data": ((gx * 5 + gy * 3 + t) % 97).astype("f8"),
                 "forecast_time": t, "param": (0, 0), "E": 0, "D": 0}
                for t in range(n_msgs)
            ]
            p = tempfile.mktemp(suffix=".grib2")
            write_grib2(p, fields, lat1=49.0, lon1=0.0, di=0.25, dj=0.25)
            return p

        for tag, n_msgs in {"x1": 4, "x16": 64}.items():
            if only and not any(
                t in f"grib2_import_{tag}" for t in only
            ):
                continue
            p = make_grib(n_msgs)
            t0 = time.perf_counter()
            gt, _m = grib2_to_raquet(spark, p, block_size=128, stats=False)
            gt.count()
            timings[f"grib2_import_{tag}"] = round(
                time.perf_counter() - t0, 3
            )
            strategies[f"grib2_import_{tag}"] = join_strategy(gt)
            os.unlink(p)
            print(
                f"  grib2_import_{tag}: {timings[f'grib2_import_{tag}']}s "
                f"({strategies[f'grib2_import_{tag}']})",
                file=sys.stderr, flush=True,
            )

        out = {"probe": timings, "warp_join_strategies": strategies,
               "n_docs_base": n_docs, "multipliers": mults}
        print(json.dumps(out))
        return

    out = {"probe": timings, "n_docs_base": n_docs, "multipliers": mults}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
