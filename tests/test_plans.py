"""Physical-plan assertions — the scale regressions that matter at
100 TB fail here fast, on sf0.001 data:

- filters and column pruning must reach the parquet scan,
- small dimension joins must broadcast (no shuffle of the big side),
- Morton block-range predicates must push down for raster reads,
- hot expressions must stay inside WholeStageCodegen (no Python UDFs
  in non-pixel paths).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from raquet_spark.plans import (
    has_broadcast_join,
    no_python_udfs,
    pushed_filter_columns,
    read_schema_columns,
)
from raquet_spark.plans.inspect import executed_plan as _plan
from raquet_spark.plans.inspect import no_nested_loops

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return entry_mod.queries()


def test_q6_filter_pushdown(spark, qs):
    cols = pushed_filter_columns(qs["q6_forecast"](spark, SF_DIR))
    assert "l_shipdate" in cols or "l_discount" in cols or "l_quantity" in cols


def test_q1_column_pruning(spark, qs):
    cols = read_schema_columns(qs["q1_pricing_summary"](spark, SF_DIR))
    # the 8-aggregate query needs only 7 of lineitem's 11 columns
    assert "l_orderkey" not in cols and "l_partkey" not in cols
    assert "l_quantity" in cols


def test_q5_broadcasts_dimensions(spark, qs):
    plan = _plan(qs["q5_supplier_volume"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    # the 6-way join must not sort-merge the small dims
    assert plan.count("BroadcastHashJoin") >= 3


def test_minhash_no_python_udf(spark, qs):
    for name in ("dedup_minhash", "dedup_simhash", "ann_topk", "qb_point_cells",
                 "qb_parent_rollup", "token_counts", "doc_quality"):
        assert no_python_udfs(qs[name](spark, SF_DIR)), \
            f"{name} fell out of the JVM"


def test_raster_block_range_pushdown(spark):
    from raquet_spark.operators.tile_stats import with_tile_stats
    from raquet_spark.sources.raquet import filter_blocks_bbox, read_raquet
    from raquet_spark.testing import make_synthetic_raster

    tiles, meta = make_synthetic_raster(spark, zoom=6, tiles_x=2, tiles_y=2,
                                        block_size=16)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        from raquet_spark.sources.raquet import write_raquet

        path = f"{td}/r.parquet"
        write_raquet(with_tile_stats(tiles, meta), path, meta)
        df = read_raquet(spark, path)
        w, s, e, n = meta["bounds"]
        sel = filter_blocks_bbox(df, w, s, (w + e) / 2, (s + n) / 2, 6)
        plan = _plan(sel)
        assert "PushedFilters" in plan
        assert "block" in plan.split("PushedFilters: ")[1].splitlines()[0]


def test_ann_topk_plan_shape(spark, qs):
    """r10 shape: the exact baseline is no longer a crossJoin — the
    query matrix is closure-captured and candidates stream through ONE
    Arrow-batched scan emitting per-batch partial top-k, merged by a
    single window. The plan must have no join of any kind and exactly
    one Python stage."""
    plan = _plan(qs["ann_topk"](spark, SF_DIR))
    assert "Join" not in plan  # matmul replaced the crossJoin
    assert plan.count("MapInPandas") == 1
    assert "Window" in plan


def test_salted_join_matches_plain(spark):
    from raquet_spark.operators.joins import salted_join
    from raquet_spark.queries import load_table

    o = load_table(spark, SF_DIR, "orders").withColumnRenamed("o_custkey", "custkey")
    c = load_table(spark, SF_DIR, "customer").withColumnRenamed("c_custkey", "custkey")
    got = salted_join(o, c, "custkey", n_salts=8).count()
    want = o.join(c, "custkey").count()
    assert got == want


def test_bucketed_join_no_shuffle(spark, tmp_path):
    from raquet_spark.operators.joins import bucketed_join, write_bucketed
    from raquet_spark.queries import load_table

    orders = load_table(spark, SF_DIR, "orders").withColumnRenamed(
        "o_custkey", "custkey"
    )
    customer = load_table(spark, SF_DIR, "customer").withColumnRenamed(
        "c_custkey", "custkey"
    )
    write_bucketed(orders, "orders_b", "custkey", n_buckets=8,
                   path=str(tmp_path / "orders_b"))
    write_bucketed(customer, "customer_b", "custkey", n_buckets=8,
                   path=str(tmp_path / "customer_b"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "orders_b", "customer_b", "custkey")
        plan = _plan(joined)
        # co-located bucketed scan: sort-merge join with NO shuffle
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() == orders.join(customer, "custkey").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.mark.slow
def test_asof_join_matches_naive(spark):
    from pyspark.sql import functions as F

    from raquet_spark.operators.joins import asof_join
    from raquet_spark.queries import load_table

    orders = (
        load_table(spark, SF_DIR, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(F.max("o_totalprice").alias("o_total"))
    )
    events = load_table(spark, SF_DIR, "events")
    got = (
        asof_join(events, orders, "user_id", "ts", "o_orderdate")
        .select("event_id", F.col("asof.o_orderdate").alias("d"),
                F.col("asof.o_total").alias("t"))
    )
    # naive oracle: inequality join + keep the max matching date
    naive = (
        events.join(orders, ["user_id"], "left")
        .where(F.col("o_orderdate") <= F.col("ts"))
        .groupBy("event_id")
        .agg(F.max(F.struct("o_orderdate", "o_total")).alias("m"))
        .select("event_id", F.col("m.o_orderdate").alias("d"),
                F.col("m.o_total").alias("t"))
    )
    n_matched = naive.count()
    assert sorted(map(tuple, got.where("d IS NOT NULL").collect())) == sorted(
        map(tuple, naive.collect())
    )
    assert got.count() == events.count()  # left semantics
    assert n_matched > 0


def test_range_join_matches_naive_and_avoids_bnlj(spark):
    from pyspark.sql import functions as F

    from raquet_spark.operators.joins import range_join
    from raquet_spark.queries import load_table

    events = load_table(spark, SF_DIR, "events")
    bands = events.groupBy(F.col("event_type").alias("band_type")).agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    got = range_join(events, bands, "value", "lo", "hi", bucket_width=10.0)
    want = events.join(
        bands, (F.col("value") >= F.col("lo")) & (F.col("value") <= F.col("hi"))
    )
    assert got.count() == want.count()
    # the whole point: an equi-join plan, not BroadcastNestedLoop
    plan = _plan(got)
    assert "BroadcastNestedLoop" not in plan, plan


def test_zonal_stats_broadcasts_zone_map(spark, qs):
    # the zone-cell dimension map must broadcast; the tile scan must not
    # shuffle before the final per-zone agg
    assert has_broadcast_join(qs["zonal_stats"](spark, SF_DIR))


def test_asof_join_single_shuffle_no_bnlj(spark, qs):
    plan = _plan(qs["asof_join_events_orders"](spark, SF_DIR))
    assert "BroadcastNestedLoop" not in plan, plan
    # union+window shape: the merged stream shuffles ONCE on the key
    # (plus the right side's pre-aggregation exchange)
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_raster_scan_prunes_blocks(spark, qs):
    # region_stats now reads the written raquet parquet: the Morton
    # range predicate must reach the scan as pushed filters on block
    df = qs["region_stats"](spark, SF_DIR)
    plan = _plan(df)
    assert "PushedFilters: [" in plan, plan
    assert "block" in plan.split("PushedFilters: ")[1].splitlines()[0], plan


def test_semi_anti_join_plans(spark, qs):
    # EXISTS compiles to a semi join, NOT EXISTS to an anti join —
    # never a duplicating inner join or a nested loop over the probe
    semi = _plan(qs["q4_order_priority"](spark, SF_DIR))
    assert "LeftSemi" in semi, semi
    anti = _plan(qs["q22_idle_customers"](spark, SF_DIR))
    assert "LeftAnti" in anti, anti


def test_disjunctive_join_stays_hash(spark, qs):
    # OR-of-conjuncts with a shared equi-key must keep a hash join
    assert no_nested_loops(qs["q19_disjunctive"](spark, SF_DIR))


def test_correlated_subquery_decorrelated(spark, qs):
    # the per-part avg subquery must become an aggregate + join, not a
    # re-executed subquery (no nested loop / cartesian anywhere)
    assert no_nested_loops(qs["q17_small_qty_revenue"](spark, SF_DIR))


def test_geotiff_strip_assembly_single_shuffle(spark):
    """Strip assembly is one groupBy(qb_y) shuffle — nothing else."""
    from raquet_spark.plans.inspect import count_exchanges
    from raquet_spark.sources.geotiff import strip_table
    from raquet_spark.testing import make_synthetic_raster

    tiles, meta = make_synthetic_raster(
        spark, zoom=5, tiles_x=2, tiles_y=2, origin_x=4, origin_y=6,
        block_size=8,
    )
    strips, _ = strip_table(tiles, meta, extent=(4, 6, 5, 7))
    assert count_exchanges(strips) == 1


def test_remote_fetch_map_only(spark):
    """fetch_tiles is map-only over the cell queue: zero shuffles; the
    only Python stage is the fetch/decode mapInPandas itself."""
    from raquet_spark.core.metadata import BandMeta, build_metadata
    from raquet_spark.plans.inspect import count_exchanges
    from raquet_spark.sources.remote import (
        cells_for_bounds, fetch_tiles, raw_decoder, xyz_request,
    )

    meta = build_metadata(
        bands=[BandMeta(name="band_1", type="float32")],
        bounds=(-90.0, 0.0, 0.0, 60.0), width=0, height=0,
        block_width=8, block_height=8, max_zoom=4,
    )
    cells = cells_for_bounds(spark, (-90.0, 0.0, 0.0, 60.0), 4)
    fetched = fetch_tiles(
        cells, meta, xyz_request("fake://{z}/{x}/{y}"),
        transport=lambda u, p: b"\x00" * (8 * 8 * 4),
        decoder=raw_decoder("float32", 1, 8),
    )
    assert count_exchanges(fetched) == 0


def test_halo_level_single_shuffle(spark):
    """The halo exchange is folded into the ONE parent groupBy: the 4x
    corner replication is a map-side explode, not an extra shuffle."""
    from raquet_spark.operators.pyramid import build_level_halo
    from raquet_spark.plans.inspect import count_exchanges
    from raquet_spark.testing import make_synthetic_raster

    tiles, meta = make_synthetic_raster(
        spark, zoom=5, tiles_x=2, tiles_y=2, origin_x=4, origin_y=6,
        block_size=8,
    )
    parents = build_level_halo(tiles, meta, 5, "lanczos")
    assert count_exchanges(parents) == 1


def test_geotiff_import_shuffle_budget(spark):
    """The real-GeoTIFF import (target-driven dense nearest for
    4326/3857 sources) is MAP-ONLY when the source side broadcasts (as
    here): the block-major target grid keeps pixels tile-contiguous
    through the broadcast gather, so the tile assembly runs aligned
    with NO exchange (r17; was 1 — the tiling groupBy). At scale the
    gather degrades to a shuffled join and the assembly to the grouped
    path: at most 3 exchanges. Projection math and segment decode stay
    map-side; never a nested-loop join."""
    import os

    import pytest as _pytest

    path = "/root/reference/tests/n37_w123_1arc_v2.tif"
    if not os.path.exists(path):
        _pytest.skip("reference raster not available")
    from raquet_spark.plans.inspect import count_exchanges, no_nested_loops
    from raquet_spark.sources.tiff_reader import geotiff_to_raquet

    tiles, _ = geotiff_to_raquet(
        spark, path, block_size=128, dense=False, stats=False
    )
    assert no_nested_loops(tiles)
    assert count_exchanges(tiles) == 0

    # projected CRS route through the Snyder forward projections into
    # the same target-driven join — same shuffle budget, no BNLJ
    nlcd = "/root/reference/tests/Annual_NLCD_LndCov_2023_CU_C1V0.tif"
    tiles2, _ = geotiff_to_raquet(
        spark, nlcd, block_size=256, dense=False, stats=False
    )
    assert no_nested_loops(tiles2)
    assert count_exchanges(tiles2) == 0

    # the reducing kernels keep the forward-map shape: ONE aggregation
    # exchange + tiling
    tiles3, _ = geotiff_to_raquet(
        spark, path, block_size=128, dense=False, stats=False,
        resampling="average",
    )
    assert count_exchanges(tiles3) == 2


def test_bilinear_import_fused_exchange_free(spark):
    """The broadcast-class bilinear import takes the fused separable
    kernel gather (r18 session 4): NO exchange, NO join — one
    MapInPandas over tile ids (the near import's plan shape)."""
    import os

    import pytest as _pytest

    path = "/root/reference/tests/n37_w123_1arc_v2.tif"
    if not os.path.exists(path):
        _pytest.skip("reference raster not available")
    from raquet_spark.plans.inspect import (
        count_exchanges,
        no_nested_loops,
        no_python_udfs,
    )
    from raquet_spark.sources.tiff_reader import geotiff_to_raquet

    tiles, _ = geotiff_to_raquet(
        spark, path, block_size=128, dense=False, stats=False,
        resampling="bilinear",
    )
    assert no_nested_loops(tiles)
    assert no_python_udfs(tiles)
    assert count_exchanges(tiles) == 0


def test_bilinear_import_join_path_three_shuffles_no_bnlj(spark, monkeypatch):
    """The JOIN-path resampled import (what non-separable / SHJ-class
    sources still run) is exactly three exchanges — the (sx, sy)
    neighborhood gather join, the blend groupBy(target pixel), and the
    tiling groupBy(block) — with NO nested-loop join anywhere (the
    4x-contribution explode is map-side) and no Python row UDFs."""
    import os

    import pytest as _pytest

    path = "/root/reference/tests/n37_w123_1arc_v2.tif"
    if not os.path.exists(path):
        _pytest.skip("reference raster not available")
    import raquet_spark.sources.tiff_reader as tr
    from raquet_spark.plans.inspect import (
        count_exchanges,
        no_nested_loops,
        no_python_udfs,
    )

    monkeypatch.setattr(tr, "_fused_gather_eligible", lambda *a, **k: False)
    tiles, _ = tr.geotiff_to_raquet(
        spark, path, block_size=128, dense=False, stats=False,
        resampling="bilinear",
    )
    assert no_nested_loops(tiles)
    assert no_python_udfs(tiles)
    assert count_exchanges(tiles) <= 3
    # the ~25 MB n37 source fits the explicit warp broadcast bound —
    # the gather must be a BroadcastHashJoin regardless of the session
    # autoBroadcastJoinThreshold (VERDICT r11 #2)
    from raquet_spark.plans import has_broadcast_join

    assert has_broadcast_join(tiles)


def test_netcdf_import_two_shuffles(spark, tmp_path):
    """NetCDF conversion keeps the GeoTIFF import's plan shape — with
    a broadcast-sized source the near import is MAP-ONLY (r17: aligned
    tile assembly, no exchange) and ALL time steps ride the same
    broadcast gather (time_cf is a join output, not a driver loop)."""
    import numpy as np

    from raquet_spark.plans.inspect import count_exchanges, no_nested_loops
    from raquet_spark.sources.netcdf import netcdf_to_raquet
    from raquet_spark.testing import write_netcdf_classic

    nlat, nlon, nt = 40, 60, 3
    gy, gx = np.mgrid[0:nlat, 0:nlon]
    data = np.stack(
        [((gx * 7 + gy * 11 + t * 13) % 199 - 50) for t in range(nt)]
    ).astype("<i2")
    path = str(tmp_path / "p.nc")
    write_netcdf_classic(
        path, 37.9875 - 0.025 * np.arange(nlat),
        -122.9875 + 0.025 * np.arange(nlon), data,
        times=np.arange(nt, dtype="f8"), nc_type=3,
        scale_factor=0.5, add_offset=100.0, fill_value=-999,
    )
    tiles, _ = netcdf_to_raquet(spark, path, block_size=64, stats=False)
    assert no_nested_loops(tiles)
    assert count_exchanges(tiles) == 0


def test_sharded_export_strip_plan_single_shuffle(spark):
    """The sharded export's pixel plan is one exchange (strip assembly)
    followed by the shard groupBy — the file writes happen inside the
    shard tasks, so there is no driver-side pixel collection at all."""
    from raquet_spark.operators.tiling import from_pixel_table  # noqa: F401
    from raquet_spark.plans.inspect import count_exchanges
    from raquet_spark.sources.geotiff import strip_table
    from raquet_spark.testing import make_synthetic_raster

    tiles, meta = make_synthetic_raster(
        spark, zoom=6, tiles_x=2, tiles_y=2, origin_x=16, origin_y=20,
        block_size=16, dtype="float32",
    )
    strips, _ = strip_table(tiles, meta, tiff_compression="deflate")
    assert count_exchanges(strips) == 1


def test_webp_layout_chain_single_shuffle(spark):
    """Interleave→webp→de-interleave is map-only after the one tiling
    shuffle: codec work rides mapInPandas passes on existing partitions
    — no exchange per layout conversion."""
    from raquet_spark.operators.layout import to_interleaved, to_sequential
    from raquet_spark.plans.inspect import count_exchanges
    from raquet_spark.testing import make_synthetic_raster

    tiles, meta = make_synthetic_raster(
        spark, zoom=6, tiles_x=2, tiles_y=2, origin_x=16, origin_y=20,
        block_size=16, num_bands=3, dtype="uint8",
    )
    base = count_exchanges(tiles)
    inter, meta_w = to_interleaved(tiles, meta, compression="webp")
    back, _ = to_sequential(inter, meta_w, compression=None)
    assert count_exchanges(back) == base  # zero added exchanges


def test_bpe_gram_count_single_shuffle(spark):
    """One batched-BPE round = one explode + one groupBy over the
    distinct-word table: exactly one exchange beyond the word-table
    collapse, and no Python UDFs (grams are higher-order SQL)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from raquet_spark.operators.textops import bpe_word_table
    from raquet_spark.plans.inspect import count_exchanges, no_python_udfs

    df = spark.createDataFrame(
        pd.DataFrame({"text": ["low lower", "new newer", "wide wider"] * 4})
    )
    words = bpe_word_table(df)
    seqs = words.select(
        F.expr("filter(split(word, '(?!^)'), x -> x != '')").alias("syms"),
        "freq",
    )
    grams = (
        seqs.select(
            F.explode(
                F.expr(
                    "transform(slice(syms, 1, size(syms) - 1), "
                    "(s, i) -> struct(s AS a, syms[i + 1] AS b,"
                    " CAST(NULL AS STRING) AS c))"
                )
            ).alias("g"),
            "freq",
        )
        .groupBy("g.a", "g.b", "g.c")
        .agg(F.sum("freq").alias("n"))
    )
    assert count_exchanges(grams) == count_exchanges(words) + 1
    assert no_python_udfs(grams)


def test_ann_lsh_auto_same_plan_as_explicit(spark):
    """Auto-sizing must not change the join shape: the derived-width
    plan is structurally identical to the explicit-width plan (one
    bucket equi-join; the sizing count() is a separate job, not a plan
    node)."""
    import re

    from raquet_spark.operators.similarity import ann_lsh
    from raquet_spark.plans.inspect import executed_plan
    from raquet_spark.queries import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.where("vec_id % 25 = 0")
    auto = ann_lsh(emb, q, k=5, n_tables=4, dim=64)
    explicit = ann_lsh(emb, q, k=5, n_bits=4, n_tables=4, dim=64)

    def shape(df):
        plan = executed_plan(df)
        nodes = []
        for ln in plan.splitlines():
            m = re.match(r"^[\s+:*-]*([A-Za-z][A-Za-z0-9]*)", ln)
            if m:
                nodes.append(m.group(1))
        return nodes

    assert shape(auto) == shape(explicit)


def test_semantic_dedup_keeps_planted_filter_pushed(spark):
    """r15 counter-lesson made typed (VERDICT r15 #5): the semantic
    dedup chain relies on embedding_dedup_pairs_lsh staying LAZY by
    default so Catalyst can push a downstream pair filter INTO the
    LSH bucket self-join — measured 15-20x on the probe's planted
    filter; the regression (someone defaulting auto_width=True, which
    localCheckpoints the complete verified pair set first) is silent
    and shows up only as runtime. Gate both halves on the physical
    plan of the exact queries.py chain:

    1. no ExistingRDD scan — an eager checkpoint inside the lazy
       chain materializes the full pair set before the filter;
    2. the planted +offset predicate is fused into a hash-join —
       Catalyst rewrites `id_b = id_a + C` into an equi-join KEY
       `(vec_id + C, _t, _sig)`, so the join emits ONLY planted
       pairs instead of every candidate pair."""
    from pyspark.sql import functions as F

    from raquet_spark.operators.dedup import embedding_dedup_pairs_lsh
    from raquet_spark.plans.inspect import executed_plan
    from raquet_spark.queries import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    planted = emb.where(F.col("vec_id") % 10 == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1_000_000)
    )
    corpus = emb.unionByName(planted)
    pairs = embedding_dedup_pairs_lsh(
        corpus, threshold=0.95, n_bits=6, n_tables=16, dim=64
    ).where(F.col("id_b") == F.col("id_a") + F.lit(1_000_000))
    plan = executed_plan(pairs)
    assert "ExistingRDD" not in plan
    assert any(
        "Join" in ln and "+ 1000000)" in ln for ln in plan.splitlines()
    ), "planted filter no longer fused into the LSH bucket join"


def test_exact_dedup_plan_skew_safe(spark):
    """exact_dedup (r16) must not plan a Window over the content hash —
    a window pins every copy of a hot hash into one task's sort; the
    skew-safe shape is groupBy (map-side partial) + semi-join."""
    from raquet_spark.operators.dedup import exact_dedup
    from raquet_spark.plans.inspect import executed_plan
    from raquet_spark.queries import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = executed_plan(exact_dedup(docs))
    assert "Window" not in plan
    assert "HashAggregate" in plan  # the min-id winner agg
    assert "LeftSemi" in plan


def test_minhash_collapse_plan_no_window(spark):
    """The signature collapse (r16) must stay agg+join shaped: no
    Window anywhere in the collapsed pair plan (the chain cap is the
    ONLY deliberate window user, and only over the buckets it names)."""
    from raquet_spark.operators.dedup import minhash_dedup_pairs
    from raquet_spark.plans.inspect import executed_plan
    from raquet_spark.queries import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = executed_plan(
        minhash_dedup_pairs(docs.limit(50), collapse_identical=True)
    )
    assert "Window" not in plan


def test_dsir_bucket_join_broadcasts(spark, qs):
    """The 1024-bucket log-ratio table must broadcast into the
    per-token scoring join — a shuffle there would move the whole
    exploded token stream twice."""
    from raquet_spark.plans.inspect import executed_plan

    plan = executed_plan(qs["dsir_weights"](spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin [bucket" in plan


def test_import_warp_gather_broadcasts_by_source_size(spark):
    """VERDICT r11 #2: the warp gather join must not inherit the
    session autoBroadcastJoinThreshold (the 10 MB TPC-H tuning
    silently de-broadcast it) — the importer knows the exact source
    size at plan time and passes F.broadcast(src) under ~100 MB,
    keeping the shuffle path above it."""
    from raquet_spark.sources.tiff_reader import _resampled_pixels

    def plan_for(width, height):
        px = spark.range(16).selectExpr(
            "CAST(id % 4 AS BIGINT) AS sx",
            "CAST(id DIV 4 AS BIGINT) AS sy",
            "CAST(id AS DOUBLE) AS band_1",
        )
        info = {
            "transform": (0.0, 10.0, 0.0, 0.0, 0.0, -10.0),
            "epsg": 3857, "n_bands": 1, "width": width,
            "height": height, "nodata": None, "dtype": "float64",
        }
        df = _resampled_pixels(
            spark, px, info, z=2, block_size=16, resampling="bilinear",
            tile_ext=(0, 0, 0, 0),
        )
        # the hint is the contract: the physical join of this tiny
        # fixture broadcasts either way via the session threshold
        return df._jdf.queryExecution().optimizedPlan().toString()

    small = plan_for(4, 4)  # 4x4 source: always broadcast
    assert "strategy=broadcast" in small
    # an ~800 MB source must NOT be hash-built on the driver — and
    # Catalyst's own estimate of the decode output is garbage-small,
    # so the shuffle path must be pinned, not merely un-hinted
    big = plan_for(20_000, 20_000 // 4)
    assert "strategy=broadcast" not in big
    assert "strategy=shuffle_hash" in big


def test_import_warp_gather_sizes_by_time_steps(spark):
    """ADVICE r12: the px table carries one full grid PER TIME STEP
    (GRIB/NetCDF time_cf), so a per-step-small grid with many steps
    must count steps in the broadcast decision — an 8 MB/step global
    grid with 100+ forecast steps is ~1 GB, not 8 MB."""
    from raquet_spark.sources.tiff_reader import _resampled_pixels

    def plan_for(n_steps):
        px = spark.range(16).selectExpr(
            "CAST(id % 4 AS BIGINT) AS sx",
            "CAST(id DIV 4 AS BIGINT) AS sy",
            "CAST(0.0 AS DOUBLE) AS time_cf",
            "CAST(id AS DOUBLE) AS band_1",
        )
        info = {
            "transform": (0.0, 10.0, 0.0, 0.0, 0.0, -10.0),
            "epsg": 3857, "n_bands": 1, "width": 1440,
            "height": 721, "nodata": None, "dtype": "float64",
        }  # ~8 MB per step (0.25-deg global)
        df = _resampled_pixels(
            spark, px, info, z=2, block_size=16, resampling="bilinear",
            tile_ext=(0, 0, 0, 0), extra_cols=("time_cf",),
            n_steps=n_steps,
        )
        return df._jdf.queryExecution().optimizedPlan().toString()

    assert "strategy=broadcast" in plan_for(3)       # ~25 MB total
    many = plan_for(120)                             # ~1 GB total
    assert "strategy=broadcast" not in many
    assert "strategy=shuffle_hash" in many


def test_ann_lsh_oversized_list_broadcast_guard(spark, monkeypatch):
    """ADVICE r12: a degenerate mass-duplicate corpus can make the
    oversized-bucket heavy-hitter list scale as n_rows/cap — past the
    broadcast-safe bound the cap filter must join shuffled, not
    hash-build on the driver."""
    from raquet_spark.operators import similarity

    emb = spark.range(64).selectExpr(
        "id AS vec_id",
        # all-identical embeddings: every bucket is one mega-bucket
        "transform(sequence(1, 64), x -> CAST(x AS DOUBLE)) AS embedding",
    )
    q = emb.limit(2)

    def plan_for():
        df = similarity.ann_lsh(
            emb, q, k=3, n_bits=4, n_tables=4, dim=64,
            n_rows=64, max_bucket_rows=4,
        )
        return df._jdf.queryExecution().optimizedPlan().toString()

    # hash-like skew: the tiny heavy-hitter list broadcasts
    assert "strategy=broadcast" in plan_for()
    # degenerate corpus past the bound: shuffled join, no driver build
    monkeypatch.setattr(similarity, "OVERSIZED_BC_SAFE_ROWS", 2)
    guarded = plan_for()
    assert "strategy=broadcast" not in guarded
    assert "strategy=shuffle_hash" in guarded


# ---------------------------------------------------------------------------
# Operator-derived shuffle width (r15: AQE never RAISES the initial
# width, so heavy operators size their own shuffles — SCALE_PROBE_r14's
# x256 components OOM at the default session is the motivating failure)
# ---------------------------------------------------------------------------

def test_derive_shuffle_width_math(spark):
    from raquet_spark.session import AUTO_WIDTH_CAP, derive_shuffle_width

    base = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # small volumes never drop below the session default
    assert derive_shuffle_width(spark, 0) == base
    assert derive_shuffle_width(spark, 1) == base
    # width = ceil(rows / target), once past the base
    assert derive_shuffle_width(
        spark, 10_000_000, target_rows_per_task=1_000_000
    ) == max(base, 10)
    assert derive_shuffle_width(
        spark, 10_000_001, target_rows_per_task=1_000_000
    ) == max(base, 11)
    # capped: a mis-estimated count can't fragment the job
    assert derive_shuffle_width(spark, 10**15) == AUTO_WIDTH_CAP


def test_scoped_shuffle_width_restores(spark):
    from raquet_spark.session import scoped_shuffle_width

    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    with scoped_shuffle_width(spark, 777):
        assert spark.conf.get(key) == "777"
    assert spark.conf.get(key) == prev
    with pytest.raises(RuntimeError):
        with scoped_shuffle_width(spark, 778):
            raise RuntimeError("boom")
    assert spark.conf.get(key) == prev


def test_scoped_shuffle_width_overlapping_scopes(spark):
    """Interleaved (non-nested) scope lifetimes — the concurrent-thread
    shape ADVICE r15 flagged: A enters, B enters, A exits, B exits. The
    conf must hold the max of the active widths while any scope lives
    and restore the ORIGINAL session values at the last exit, not A's
    width (the stale-restore bug left the session permanently wide)."""
    from raquet_spark.session import scoped_shuffle_width

    key = "spark.sql.shuffle.partitions"
    adv = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    prev = spark.conf.get(key)
    prev_adv = spark.conf.get(adv, None)
    a = scoped_shuffle_width(spark, 600)
    b = scoped_shuffle_width(spark, 900)
    a.__enter__()
    assert spark.conf.get(key) == "600"
    b.__enter__()
    assert spark.conf.get(key) == "900"  # max of active scopes
    a.__exit__(None, None, None)
    # B still live: its width (the max of what remains) stays in force
    assert spark.conf.get(key) == "900"
    assert spark.conf.get(adv) == "16m"
    b.__exit__(None, None, None)
    assert spark.conf.get(key) == prev
    assert spark.conf.get(adv, None) == prev_adv
    # nested (LIFO) ordering also restores cleanly, inner width wins
    # only while the inner scope lives when it is the larger one
    with scoped_shuffle_width(spark, 500):
        with scoped_shuffle_width(spark, 700):
            assert spark.conf.get(key) == "700"
        assert spark.conf.get(key) == "500"
    assert spark.conf.get(key) == prev


def test_connected_components_derives_width_from_edges(spark, monkeypatch):
    """connected_components sizes its shuffles from the MEASURED raw
    edge count (both orientations): with target_rows_per_task=1 a
    40-edge chain graph must run its loop at width 80, and the session
    default must be restored afterwards."""
    import raquet_spark.session as sess
    from raquet_spark.operators.dedup import connected_components

    seen = []
    real = sess.scoped_shuffle_width

    class recording(real):
        def __init__(self, spark_, width):
            seen.append(width)
            super().__init__(spark_, width)

    monkeypatch.setattr(sess, "scoped_shuffle_width", recording)

    # NOTE: CLI tests may have re-applied get_spark()'s default conf
    # onto the shared session (getOrCreate applies builder options to
    # an existing session), so read the CURRENT base instead of
    # assuming conftest's 4
    base = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = spark.range(40).selectExpr("id AS id_a", "id + 1 AS id_b")
    labels = connected_components(edges, auto_width=True, target_rows_per_task=1)
    # 40 edges x 2 orientations at 1 row/task -> width 80; when the
    # shared-session base already exceeds that, the operator correctly
    # skips the scope (nothing to widen) and records no width
    assert seen == ([80] if base < 80 else [])
    rows = {r["node"]: r["component"] for r in labels.collect()}
    assert len(rows) == 41 and set(rows.values()) == {0}  # one chain
    # width scope closed: session default back in force
    assert spark.conf.get("spark.sql.shuffle.partitions") == str(base)


@pytest.mark.slow
def test_minhash_auto_width_parity(spark):
    """auto_width=True returns the same candidate pairs as the lazy
    default (width changes plans, never results) and restores the
    session width."""
    from raquet_spark.operators.dedup import minhash_dedup_pairs

    docs = spark.range(30).selectExpr(
        "id AS doc_id",
        "concat('alpha beta gamma delta epsilon zeta ', "
        "CAST(id % 5 AS STRING)) AS text",
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    plain = {(r["id_a"], r["id_b"])
             for r in minhash_dedup_pairs(docs).collect()}
    auto = {(r["id_a"], r["id_b"])
            for r in minhash_dedup_pairs(docs, auto_width=True).collect()}
    assert auto == plain and plain  # non-empty: the %5 groups collide
    # force the wide branch (numbered repartition + DISK_ONLY) at
    # unit scale
    wide = {(r["id_a"], r["id_b"])
            for r in minhash_dedup_pairs(
                docs, auto_width=True, target_rows_per_task=1).collect()}
    assert wide == plain
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev


def test_substring_auto_width_parity(spark):
    from raquet_spark.operators.textops import substring_dedup_spans

    docs = spark.range(8).selectExpr(
        "id AS doc_id",
        "concat_ws(' ', transform(sequence(1, 30), "
        "x -> CAST(x AS STRING))) AS text",
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    plain = {(r["doc_id"], r["span_start"], r["span_end"])
             for r in substring_dedup_spans(docs, window=12).collect()}
    auto = {(r["doc_id"], r["span_start"], r["span_end"])
            for r in substring_dedup_spans(
                docs, window=12, auto_width=True).collect()}
    assert auto == plain and plain
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev


@pytest.mark.slow
def test_embedding_lsh_auto_width_parity(spark):
    """auto_width returns exactly the plain path's verified pairs and
    restores the session width (the E5 scale path's r15 sizing)."""
    from raquet_spark.operators.dedup import embedding_dedup_pairs_lsh

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    emb = spark.range(60).selectExpr(
        "id AS vec_id",
        # 6 planted clusters of 10 near-identical vectors
        "transform(sequence(1, 16), x -> CAST(x AS DOUBLE) + "
        "CAST(id % 6 AS DOUBLE) * 40.0 + CAST(id AS DOUBLE) * 1e-6) "
        "AS embedding",
    )
    kw = dict(threshold=0.99, n_tables=8, dim=16, n_bits=4)
    plain = {(r["id_a"], r["id_b"])
             for r in embedding_dedup_pairs_lsh(emb, **kw).collect()}
    auto = {(r["id_a"], r["id_b"])
            for r in embedding_dedup_pairs_lsh(
                emb, auto_width=True, **kw).collect()}
    assert auto == plain and plain
    # target_rows_per_task=1 forces the WIDE branch (numbered
    # repartition + DISK_ONLY checkpoint) at unit scale — without it
    # that code path only runs inside hour-long scale probes
    wide = {(r["id_a"], r["id_b"])
            for r in embedding_dedup_pairs_lsh(
                emb, auto_width=True, target_rows_per_task=1,
                **kw).collect()}
    assert wide == plain
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev


def test_chain_cap_occupancy_count_no_full_table_window(spark):
    """VERDICT r16 #4 (r17): chain_capped_buckets' occupancy count must
    be a map-side-combinable groupBy + semi/anti join, not
    count().over(Window.partitionBy(bucket)) — the window shuffled
    every banded row (the 99% in under-cap buckets included) and
    landed the hot bucket's full row set in one task before the cap
    engaged. The row_number window survives ONLY on the over-cap
    slice (intrinsic to chaining)."""
    from raquet_spark.operators.dedup import chain_capped_buckets
    from raquet_spark.plans.inspect import executed_plan

    ex = spark.range(200).selectExpr(
        "id AS doc_id", "id % 5 AS band", "CAST(id % 3 AS STRING) AS key"
    )
    under, chain = chain_capped_buckets(ex, ["band", "key"], "doc_id", 10)
    up = executed_plan(under)
    # under-cap rows reach the pair join with NO window and NO extra
    # shuffle of the exploded table — just an anti join against the
    # tiny over-cap key list
    assert "Window" not in up
    assert "LeftAnti" in up
    cp = executed_plan(chain)
    # the only Window nodes are row_number over the semi-joined
    # over-cap slice — no count() window anywhere
    win_lines = [ln for ln in cp.splitlines() if "Window [" in ln]
    assert win_lines and all("row_number()" in ln for ln in win_lines)
    assert "LeftSemi" in cp


def test_hashed_embeddings_carry_keeps_hash_aggregate(spark):
    """r18 regression pin: carrying doc-constant columns (including
    STRINGS) through the featurize groupBy must not demote the wide
    aggregation to SortAggregate. first(string) puts a StringType
    field in the agg buffer, which UnsafeRow cannot mutate — the whole
    64-column agg then falls back to SortAggregate plus a full sort of
    the exploded token stream on both sides of the exchange (the r17
    quality_classifier_filter regression). Carries ride as GROUP BY
    keys instead; keys are never mutated, so strings are fine."""
    from pyspark.sql import functions as F

    from raquet_spark.operators.textops import hashed_embeddings

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i}", f"src{i % 3}", float(i % 2))
         for i in range(20)],
        "doc_id bigint, text string, source string, y double",
    )
    feats = hashed_embeddings(
        docs, dim=16, hash_fn="xxhash64", carry_cols=("y", "source")
    )
    plan = _plan(feats)
    assert "SortAggregate" not in plan, plan
    assert "HashAggregate" in plan, plan
    # carried columns present next to the vector, one row per doc
    rows = feats.select("doc_id", "y", "source").collect()
    assert len(rows) == 20
    assert {r["source"] for r in rows} == {"src0", "src1", "src2"}
