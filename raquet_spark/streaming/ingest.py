"""Structured Streaming operators.

Two production shapes:

- ``stream_tiles``: file-source stream of raw tile rows → per-batch
  validation + Morton-sorted append into a RaQuet dataset. This is the
  streaming ingestion path the reference covers with one-shot
  converters (imageserver.py/earthengine.py poll-and-write loops);
  readStream makes it continuous and restartable (checkpointed).
- ``windowed_event_stats``: watermarked sliding-window aggregation over
  an event stream — late data handled by the watermark, counts/sums per
  (window, key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType, TimestampNTZType


def _as_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP (instant semantics); parquet written
    without timezone metadata reads as TIMESTAMP_NTZ under Spark 4's
    ``inferTimestampNTZ`` default and ``withWatermark`` rejects it
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). Cast once at the operator
    boundary — sessions are pinned to UTC (session.py) so the wall
    clock maps to the same instant everywhere."""
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def stream_tiles(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    schema: StructType,
):
    """Continuously append incoming tile parquet files to a RaQuet
    dataset, Morton-sorted within each micro-batch."""
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.where(F.col("block") != 0)
            .repartitionByRange("block")
            .sortWithinPartitions("block")
            .write.mode("append")
            .parquet(target_dir)
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_fetch_tiles(
    spark: SparkSession,
    cells_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    metadata: dict,
    request_builder,
    transport=None,
    decoder=None,
    available_now: bool = True,
    **fetch_kwargs,
):
    """Continuous remote tile ingestion: a stream of cell work-queue
    files (``block BIGINT`` parquet dropped into ``cells_dir``) is
    fetched through ``sources.remote.fetch_tiles`` per micro-batch and
    appended Morton-sorted to a RaQuet dataset — the reference's
    imageserver/earthengine poll-and-write loops
    (/root/reference/raquet/imageserver.py) as a restartable
    (checkpointed) Structured Streaming flow. Retries and rate limits
    apply inside each batch's tasks; a crashed run resumes from the
    checkpoint without re-fetching completed batches."""
    from raquet_spark.sources.remote import fetch_tiles

    stream = spark.readStream.schema("block bigint").parquet(cells_dir)

    def fetch_batch(batch_df: DataFrame, batch_id: int) -> None:
        fetched = fetch_tiles(
            batch_df, metadata, request_builder,
            transport=transport, decoder=decoder, **fetch_kwargs,
        )
        (
            fetched.repartitionByRange("block")
            .sortWithinPartitions("block")
            .write.mode("append")
            .parquet(target_dir)
        )

    writer = (
        stream.writeStream.foreachBatch(fetch_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_rasterize(
    spark: SparkSession,
    features_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    schema: StructType,
    zoom: int,
    block_size: int = 16,
    band_type: str = "float32",
    nodata: float = 0.0,
    available_now: bool = True,
):
    """Continuous vector→raster ingestion: a file-source stream of
    polygon-feature parquet (``feature_id bigint, polygon
    array<struct<lon double, lat double>>, value double``) is burned to
    tiles per micro-batch with the SAME painter's-order kernel as batch
    (``operators/tiling.rasterize_features``) and appended Morton-sorted
    to a RaQuet dataset — the streaming shape of the GDAL ``rasterize``
    workload: features arrive continuously (telemetry footprints, field
    boundaries), tiles accumulate, a crashed run resumes from the
    checkpoint without re-burning completed batches. Tiles from
    different batches may share a ``block``; the painter's-order merge
    across batches is the reader's compaction policy (same contract as
    the upsert path in sources/raquet.py), and feeds that partition
    batches by disjoint regions get exactly-once tiles with no merge."""
    from raquet_spark.operators.tiling import rasterize_features

    stream = spark.readStream.schema(schema).parquet(features_dir)

    def burn_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        tiles, _meta = rasterize_features(
            batch_df, zoom, block_size=block_size,
            band_type=band_type, nodata=nodata,
        )
        (
            tiles.repartitionByRange("block")
            .sortWithinPartitions("block")
            .write.mode("append")
            .parquet(target_dir)
        )

    writer = (
        stream.writeStream.foreachBatch(burn_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact-dedup: drop repeats of ``keys`` arriving within
    the watermark window (``dropDuplicatesWithinWatermark``) — the
    ingest-time guard of a training-data pipeline. State is bounded by
    the watermark horizon; keys older than it are forgotten, so the
    operator runs forever at constant memory per key-partition."""
    df = _as_event_time(df, ts_col)
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def minhash_dedup_process_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    pairs_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    rows_per_band: int = 2,
    hash_fn: str = "md5",
    collapse_identical: bool = False,
    max_bucket_rows: int | None = None,
) -> None:
    """One micro-batch of :func:`streaming_minhash_dedup`, IDEMPOTENT
    per ``batch_id`` — foreachBatch is at-least-once, so a batch
    replayed after a failure must produce byte-identical state, not
    duplicates:

    - both sinks are laid out as ``<dir>/batch=<id>`` partition
      directories and each batch OVERWRITES its own partition, so a
      replay rewrites the same rows instead of appending them twice;
    - the index probe filters to ``batch < batch_id`` (a partition
      prune), so a replay never sees its OWN already-written bands —
      without this, the probe would re-emit the batch's within-pairs
      as spurious cross-batch duplicates with the wrong
      ``is_dup_of_seen`` flag. Collapse-mode decisions (which
      signatures are novel, which buckets are over cap) read only that
      pruned index, so a replay recomputes them identically.

    ``collapse_identical`` / ``max_bucket_rows`` are the streaming
    twins of the batch generator's r16 bounds (VERDICT r16 #1 — the
    persisted index used to keep EVERY identical-signature copy, so a
    continuously-ingested boilerplate flood emitted O(k) probe pairs
    per arrival, O(k²) cumulative):

    - ``collapse_identical=True`` stores band rows only for NOVEL
      distinct signatures (each row carries a full-signature
      fingerprint ``sig``). A batch collapses to per-signature
      representatives first (star edges to in-batch copies,
      ``is_dup_of_seen=False``); a rep whose signature is already
      indexed emits ONE (index-rep, batch-rep) edge
      (``is_dup_of_seen=True``) and is NOT indexed again — a k-copy
      flood costs k−1 edges total and the index stays one row-set per
      distinct signature, the same closure argument pytest pins on the
      batch side (``collapse_identical_signatures``). Member counts
      are not stored: they are derivable from the pairs sink.
    - ``max_bucket_rows`` chain-caps NEAR-identical floods (distinct
      signatures sharing a band key): the within-batch self-join
      reuses :func:`~raquet_spark.operators.dedup.chain_capped_buckets`
      verbatim, the index probe joins an over-cap bucket to its MIN
      indexed id only (one edge per arrival instead of k), and novel
      band rows are not appended to buckets already at the cap — those
      rows would never be probe targets, so skipping them bounds
      per-bucket index size at ~cap + one batch's increment.
      Connectivity is preserved exactly as on the batch side: every
      arrival keeps an edge into each of its buckets.

    Both options are baked into the index layout (like ``hash_fn``):
    pick them per index directory and keep them for its lifetime — a
    collapse-mode index carries the ``sig`` column, a full-mode one
    does not.
    """
    from raquet_spark.operators.dedup import (
        banded_signatures,
        chain_capped_buckets,
        collapse_identical_signatures,
        minhash_signatures,
    )

    spark = batch_df.sparkSession
    sigs = minhash_signatures(batch_df, text_col, id_col, hash_fn=hash_fn)

    def read_index():
        # "no index yet" is an EXISTENCE check, not a swallowed read
        # error (review r17): collapse-mode novelty and over-cap
        # decisions depend on the index, so a transient FS failure
        # must fail the batch (foreachBatch retries it) rather than
        # silently re-index seen signatures with wrong flags. Hadoop
        # FS API so the check is correct on cluster paths too.
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(index_dir)
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(p):
            return None
        return spark.read.parquet(index_dir).where(
            F.col("batch") < int(batch_id)
        )

    def write_pairs(pairs: DataFrame) -> None:
        (
            pairs.groupBy("id_a", "id_b")
            .agg(F.max("is_dup_of_seen").alias("is_dup_of_seen"))
            .write.mode("overwrite")
            .parquet(f"{pairs_dir}/batch={int(batch_id)}")
        )

    if not collapse_identical and max_bucket_rows is None:
        banded = banded_signatures(sigs, id_col, rows_per_band).persist()
        try:
            a, b = banded.alias("a"), banded.alias("b")
            within = (
                a.join(b, ["band", "key"])
                .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
                .select(
                    F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    F.lit(False).alias("is_dup_of_seen"),
                )
            )
            idx = read_index()
            pairs = within
            if idx is not None:
                cross = (
                    banded.alias("n")
                    .join(idx.alias("i"), ["band", "key"])
                    .where(F.col(f"n.{id_col}") != F.col(f"i.{id_col}"))
                    .select(
                        F.least(f"n.{id_col}", f"i.{id_col}").alias("id_a"),
                        F.greatest(f"n.{id_col}", f"i.{id_col}").alias("id_b"),
                        F.lit(True).alias("is_dup_of_seen"),
                    )
                )
                pairs = within.unionByName(cross)
            write_pairs(pairs)
            banded.write.mode("overwrite").parquet(
                f"{index_dir}/batch={int(batch_id)}"
            )
        finally:
            banded.unpersist()
        return

    # ---- bounded path (collapse and/or chain cap) ----
    sig_cols = [c for c in sigs.columns if c != id_col]
    fingerprint = F.md5(
        F.concat_ws(":", *[F.col(c).cast("string") for c in sig_cols])
    )
    if collapse_identical:
        # persist the signature subtree: star (sigs ⋈ rep_map) and the
        # reps branch both consume it — without this the whole
        # tokenize/shingle/hash pipeline runs twice per micro-batch
        # (the batch-side API persists for the same reason; review r17)
        sigs = sigs.persist()
        rep_map, reps, star = collapse_identical_signatures(sigs, id_col)
    else:
        reps, star = sigs, None
    reps_s = reps.withColumn("sig", fingerprint).persist()
    banded = None
    try:
        idx = read_index()
        pairs = None
        if collapse_identical:
            if idx is not None:
                idx_sigs = (
                    idx.groupBy("sig").agg(F.min(id_col).alias("_i"))
                )
                seen = reps_s.join(idx_sigs, "sig")
                exact_edges = seen.where(
                    F.col(id_col) != F.col("_i")
                ).select(
                    F.least(id_col, "_i").alias("id_a"),
                    F.greatest(id_col, "_i").alias("id_b"),
                    F.lit(True).alias("is_dup_of_seen"),
                )
                # star members of a group whose signature is ALREADY
                # indexed are dups of seen content even though their
                # rep arrived this batch — the full-listing mode gave
                # them a direct True edge to the indexed copy, so the
                # collapsed star edge must carry the same greedy
                # keep/drop signal (the rep routes it transitively,
                # but a per-edge consumer reads the flag, not the
                # closure)
                seen_reps = seen.select(
                    F.col(id_col).alias("id_a")
                ).withColumn("_seen", F.lit(True))
                star = (
                    star.join(seen_reps, "id_a", "left")
                    .withColumn(
                        "is_dup_of_seen",
                        F.coalesce(F.col("_seen"), F.lit(False)),
                    )
                    .drop("_seen")
                )
                pairs = star.unionByName(exact_edges)
                # exact-matched reps route all connectivity through the
                # already-indexed rep: only NOVEL signatures band-probe
                # and enter the index
                novel = reps_s.join(
                    idx_sigs.select("sig"), "sig", "left_anti"
                )
            else:
                pairs = star.withColumn("is_dup_of_seen", F.lit(False))
                novel = reps_s
        else:
            novel = reps_s
        banded = (
            banded_signatures(novel.drop("sig"), id_col, rows_per_band)
            .join(novel.select(id_col, "sig"), id_col)
            .persist()
        )
        # within-batch pairs over the novel reps, chain-capped like the
        # batch generator
        under, chain = banded, None
        if max_bucket_rows is not None:
            under, chain = chain_capped_buckets(
                banded, ["band", "key"], id_col, max_bucket_rows
            )
        a, b = under.alias("a"), under.alias("b")
        within = (
            a.join(b, ["band", "key"])
            .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
            )
        )
        if chain is not None:
            within = within.unionByName(chain.select("id_a", "id_b"))
        within = within.withColumn("is_dup_of_seen", F.lit(False))
        pairs = within if pairs is None else pairs.unionByName(within)

        idx_keep = banded
        if idx is not None:
            if max_bucket_rows is not None:
                stats = idx.groupBy("band", "key").agg(
                    F.count(F.lit(1)).alias("_bn"),
                    F.min(id_col).alias("_imin"),
                )
                over_b = stats.where(F.col("_bn") >= max_bucket_rows)
                # under-cap buckets: full probe
                cross_u = (
                    banded.alias("n")
                    .join(over_b.select("band", "key"),
                          ["band", "key"], "left_anti")
                    .join(idx.alias("i"), ["band", "key"])
                    .where(F.col(f"n.{id_col}") != F.col(f"i.{id_col}"))
                    .select(
                        F.least(f"n.{id_col}", f"i.{id_col}").alias("id_a"),
                        F.greatest(f"n.{id_col}", f"i.{id_col}").alias("id_b"),
                    )
                )
                # over-cap buckets: ONE edge per arrival, to the
                # bucket's min indexed id
                cross_o = (
                    banded.alias("n")
                    .join(over_b, ["band", "key"])
                    .where(F.col(f"n.{id_col}") != F.col("_imin"))
                    .select(
                        F.least(f"n.{id_col}", "_imin").alias("id_a"),
                        F.greatest(f"n.{id_col}", "_imin").alias("id_b"),
                    )
                )
                cross = cross_u.unionByName(cross_o)
                # over-cap buckets take no new index rows
                idx_keep = banded.join(
                    over_b.select("band", "key"), ["band", "key"],
                    "left_anti",
                )
            else:
                cross = (
                    banded.alias("n")
                    .join(idx.alias("i"), ["band", "key"])
                    .where(F.col(f"n.{id_col}") != F.col(f"i.{id_col}"))
                    .select(
                        F.least(f"n.{id_col}", f"i.{id_col}").alias("id_a"),
                        F.greatest(f"n.{id_col}", f"i.{id_col}").alias("id_b"),
                    )
                )
            pairs = pairs.unionByName(
                cross.withColumn("is_dup_of_seen", F.lit(True))
            )
        write_pairs(pairs)
        idx_keep.write.mode("overwrite").parquet(
            f"{index_dir}/batch={int(batch_id)}"
        )
    finally:
        # unpersist in finally (review r17): a transient write failure
        # retried by foreachBatch must not leak one cached plan per
        # attempt on a 24/7 stream
        reps_s.unpersist()
        if banded is not None:
            banded.unpersist()
        if collapse_identical:
            sigs.unpersist()


def compact_minhash_index(
    spark, index_dir: str, keep_last: int = 1
) -> int:
    """Fold old ``batch=<id>`` partitions of a streaming-dedup band
    index into ONE partition, bounding the file-listing and small-file
    cost a 24/7 ingest guard otherwise accrues (one parquet dir per
    micro-batch, ALL of them read by every probe join).

    Folds every batch partition except the newest ``keep_last``
    (default 1: only the most recent batch can be replayed by
    foreachBatch's at-least-once delivery, and a replay overwrites its
    OWN partition — folding it would let that overwrite clobber the
    compacted rows). The folded rows keep the LARGEST folded batch id
    as their partition value, so the probe's ``batch < batch_id``
    replay filter sees exactly the same rows before and after
    (pytest-pinned).

    Safe against a CONCURRENT probe (the scheduled-job deployment this
    is for) in two layers: (a) compacted part files are moved INTO the
    live target partition BEFORE anything else, so an index read at
    any instant sees every band row at least once — transient
    duplicates are collapsed by the probe's pairs ``groupBy`` — and
    never a missing-row window; (b) the superseded files/partitions
    are NOT deleted by the fold that replaced them: they are recorded
    in a prune list executed at the START of the NEXT compaction call,
    a vacuum-style grace period of one full compaction interval, so an
    in-flight probe that listed the old files before the fold reads
    them untouched (deleting them immediately would fail such a job
    with FileNotFoundException — Spark resolves file lists at plan
    time). The fold-state marker and prune list are written atomically
    (temp + rename) and an interrupted run is finished by the next
    call. Returns the number of partitions folded (0 = nothing new).

    100 TB note: this is the maintenance pass of the
    offline-index/online-probe split (same shape as the E45 ANN index)
    — run it from a scheduled job, not inside foreachBatch, so ingest
    latency never pays for it."""
    import os
    import re
    import shutil
    import uuid

    tmp = os.path.join(index_dir, "_compact_tmp")
    marker = os.path.join(index_dir, "_COMPACT_STATE")
    prune_file = os.path.join(index_dir, "_COMPACT_PRUNE")

    def batch_dirs():
        out = []
        for name in os.listdir(index_dir):
            mm = re.fullmatch(r"batch=(\d+)", name)
            if mm:
                out.append((int(mm.group(1)), os.path.join(index_dir, name)))
        return sorted(out)

    def atomic_write(path: str, text: str) -> None:
        with open(path + ".w", "w") as fh:
            fh.write(text)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(path + ".w", path)

    def move_in(target: int, prefix: str) -> list[str]:
        """Move compacted files into the live partition; RETURN the
        superseded paths (relative) for deferred pruning. Idempotent —
        a crash anywhere re-enters via the marker on the next call."""
        dest = os.path.join(index_dir, f"batch={target}")
        if os.path.isdir(tmp):
            for name in sorted(os.listdir(tmp)):
                if name.endswith(".parquet"):
                    os.replace(os.path.join(tmp, name),
                               os.path.join(dest, prefix + name))
            shutil.rmtree(tmp)
        superseded = [
            os.path.join(f"batch={target}", name)
            for name in sorted(os.listdir(dest))
            if not name.startswith(prefix)
            and os.path.isfile(os.path.join(dest, name))
        ]
        superseded += [
            f"batch={bid}" for bid, _ in batch_dirs() if bid < target
        ]
        return superseded

    def record_prune(rels: list[str]) -> None:
        if rels:
            atomic_write(prune_file, "\n".join(rels))

    # 1. read the PREVIOUS cycle's prune list before anything new
    old_prune: list[str] = []
    if os.path.exists(prune_file):
        with open(prune_file) as fh:
            old_prune = [ln for ln in fh.read().splitlines() if ln]

    # 2. finish an interrupted fold (its prune entries join the NEXT
    #    cycle, keeping their grace period). The marker is removed only
    #    AFTER the entries are safely in the prune list (below) — a
    #    crash in between re-enters move_in, which is idempotent and
    #    recomputes the same superseded set.
    pending: list[str] = []
    recovered_marker = False
    if os.path.exists(marker):
        with open(marker) as fh:
            content = fh.read().split()
        pending = move_in(int(content[0]), content[1])
        recovered_marker = True
    elif os.path.isdir(tmp):
        if os.path.exists(os.path.join(tmp, "_COMPACT_TARGET")):
            raise RuntimeError(
                "legacy _compact_tmp with _COMPACT_TARGET found — "
                "finish it with the code that wrote it (its source "
                "partitions may already be gone; this temp dir can "
                "hold the only copy of the folded rows)"
            )
        shutil.rmtree(tmp)  # interrupted before the marker: garbage

    # 3. execute the previous cycle's prune (grace period over: any
    #    reader that listed these files has long finished; their rows
    #    have lived in the compacted files since that cycle)
    for rel in old_prune:
        path = os.path.join(index_dir, rel)
        if os.path.isdir(path):
            shutil.rmtree(path)
        elif os.path.isfile(path):
            os.remove(path)
    if old_prune:
        os.remove(prune_file)

    # 4. settle the recovered fold's prune entries, then release its
    #    marker (order matters: entries first, marker second). A
    #    recovering call does NOT fold again: the superseded dirs are
    #    still on disk awaiting their grace period, and re-folding
    #    them would duplicate their rows permanently.
    if recovered_marker:
        record_prune(pending)
        os.remove(marker)
        return 0

    # 5. fold
    parts = batch_dirs()
    if len(parts) <= keep_last + 1:
        return 0  # already compact (a single folded dir counts)
    fold = parts[: len(parts) - keep_last]
    target = fold[-1][0]
    folded = spark.read.parquet(*[p for _, p in fold])
    if "batch" in folded.columns:  # partition-col inference guard:
        folded = folded.drop("batch")  # the dir name carries the value
    folded.write.mode("overwrite").parquet(tmp)
    prefix = f"compact-{uuid.uuid4().hex[:12]}-"
    atomic_write(marker, f"{target} {prefix}")
    pending += move_in(target, prefix)
    record_prune(pending)
    os.remove(marker)
    return len(fold)


def streaming_minhash_dedup(
    stream: DataFrame,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    rows_per_band: int = 2,
    available_now: bool = True,
    hash_fn: str = "md5",
    collapse_identical: bool = False,
    max_bucket_rows: int | None = None,
):
    """NEAR-duplicate dedup on a document STREAM (extends F4, which is
    exact-only): each micro-batch computes MinHash signatures, splits
    them into LSH bands, and equi-joins the band keys against a
    PERSISTED band index (parquet — the same offline-index/online-probe
    split as the E45 ANN index persistence) plus itself, emitting
    candidate near-dup pairs incrementally; the batch's own bands are
    then appended to the index.

    Guarantees (pytest-pinned): the union of emitted pairs across
    batches equals the batch ``minhash_dedup_pairs`` of the full corpus
    — every pair (a, b) surfaces exactly once, in the batch where its
    LATER document arrives (within-batch pairs via the self-join,
    cross-batch pairs via the index probe). Each pair carries
    ``is_dup_of_seen`` = the partner was already indexed when the doc
    arrived — the greedy keep/drop signal an ingest guard acts on.

    Scale shape: the per-batch work is one signature projection + two
    bucketed equi-joins on (band, key) — no all-pairs anywhere. The
    index grows with the kept corpus (that is its job — it IS the dedup
    state); at 100 TB it would be date-partitioned so a retention
    horizon can drop old partitions, and the probe join benefits from
    partition pruning on the band column.

    Replay safety (pytest-pinned): foreachBatch is AT-LEAST-ONCE, so
    every batch's writes are idempotent — see
    :func:`minhash_dedup_process_batch`.

    ``hash_fn`` mirrors the batch operator's option (md5 default,
    xxhash64 production). The hash is BAKED INTO the persisted band
    keys: pick one per index directory and keep it for the index's
    lifetime — probing an md5-built index with xxhash64 signatures
    silently finds nothing.

    ``collapse_identical`` / ``max_bucket_rows`` (r17) bound a
    boilerplate FLOOD exactly like the batch generator's r16 options:
    without them, k identical docs streamed over time cost O(k²)
    cumulative probe pairs (every arrival matches every indexed copy);
    with collapse, the index keeps one row-set per distinct signature
    and the flood costs k−1 edges — linear — with the same transitive
    closure (components / keep-min see identical clusters,
    pytest-pinned against ``minhash_dedup_pairs(collapse_identical=
    True)``). Like ``hash_fn``, both are baked into the index layout:
    keep them constant for an index directory's lifetime. Default
    False preserves the complete pairwise listing."""

    def process(batch_df, batch_id):
        minhash_dedup_process_batch(
            batch_df, batch_id, index_dir, pairs_dir,
            text_col=text_col, id_col=id_col, rows_per_band=rows_per_band,
            hash_fn=hash_fn, collapse_identical=collapse_identical,
            max_bucket_rows=max_bucket_rows,
        )

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def embedding_dedup_process_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    pairs_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_bits: int = 6,
    n_tables: int = 16,
    seed: int = 7,
    dim: int = 64,
    collapse_identical: bool = False,
    max_bucket_rows: int | None = None,
) -> None:
    """One micro-batch of :func:`streaming_embedding_dedup`, IDEMPOTENT
    per ``batch_id`` (same contract as the minhash twin: both sinks
    and both index tables are ``batch=<id>`` partition dirs that each
    batch overwrites, and every decision reads only the
    ``batch < batch_id`` index slice, so an at-least-once replay
    rewrites identical state).

    The embedding analogue of :func:`minhash_dedup_process_batch`,
    with one structural addition: the index persists the VECTORS
    (``vectors/batch=<id>``: id, vfp, _v, _norm — the E45 ANN-index
    shape) alongside the LSH band rows (``bands/batch=<id>``: id, _t,
    _sig), because cross-batch candidates need the historical vector
    for the exact cosine verify — the zero-false-positive contract the
    batch operator keeps.

    ``collapse_identical``: byte-identical vectors (fingerprint
    ``vfp`` = md5 of the exact element strings) collapse to one
    representative; an already-indexed fingerprint emits ONE
    (index-rep, batch-rep, cos 1.0) edge and is not re-indexed — a
    k-copy flood costs k−1 cumulative edges. Star/exact edges carry
    cosine exactly 1.0 without a verify join (byte-identical by
    construction). ``max_bucket_rows``: the within-batch bucket join
    chain-caps via :func:`~raquet_spark.operators.dedup.
    chain_capped_buckets`; an over-cap INDEX bucket probes against
    its min indexed id only and takes no new band rows — every edge
    still passes the exact cosine verify, so a projection-coincidence
    bucket correctly fragments at the threshold.

    ``n_bits``/``n_tables``/``seed``/``dim`` are baked into the
    persisted signatures (like the minhash twin's ``hash_fn``): keep
    them constant for an index directory's lifetime. Unlike the batch
    operator there is no corpus-count self-sizing — a stream has no
    final corpus; size for the retention horizon's expected volume."""
    from raquet_spark.operators.dedup import chain_capped_buckets
    from raquet_spark.operators.similarity import (
        _all_signatures,
        _dot,
        with_norm,
    )

    spark = batch_df.sparkSession
    bands_dir = f"{index_dir}/bands"
    vectors_dir = f"{index_dir}/vectors"

    def read_part(path: str):
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(p):
            return None
        return spark.read.parquet(path).where(F.col("batch") < int(batch_id))

    # vfp: NULL-distinguishing fingerprint (review r17 — concat_ws
    # silently drops null elements, which would collide [1,null,2]
    # with [1,2] and fabricate cos 1.0 edges; to_json preserves
    # nulls, empties, and element positions exactly, matching the
    # batch collapse's raw-array groupBy semantics)
    v = with_norm(
        batch_df.select(F.col(id_col), F.col(vec_col).alias("_v")), "_v"
    ).withColumn("vfp", F.md5(F.to_json(F.struct(F.col("_v")))))
    if collapse_identical:
        # the collapse subtree (rep_map / star / reps / seen) scans v
        # from several consumers — persist it for the batch scope, the
        # same rule the minhash twin applies to sigs (review r17)
        v = v.persist()

    pairs = None
    if collapse_identical:
        from raquet_spark.operators.dedup import (
            collapse_identical_signatures,
        )

        # one shared collapse implementation (dedup.py): vfp is the
        # "signature"; reps come back as (id, vfp) and re-join v for
        # the vector/norm columns
        rep_map, reps_fp, star = collapse_identical_signatures(
            v.select(id_col, "vfp"), id_col
        )
        star = star.withColumn("cos_sim", F.lit(1.0))
        reps = v.join(reps_fp, ["vfp", id_col], "left_semi")
    else:
        reps, star = v, None

    idx_vectors = read_part(vectors_dir)
    if collapse_identical and idx_vectors is not None:
        seen_fp = idx_vectors.groupBy("vfp").agg(F.min(id_col).alias("_i"))
        seen = reps.join(seen_fp, "vfp")
        exact_edges = seen.where(F.col(id_col) != F.col("_i")).select(
            F.least(id_col, "_i").alias("id_a"),
            F.greatest(id_col, "_i").alias("id_b"),
            F.lit(1.0).alias("cos_sim"),
            F.lit(True).alias("is_dup_of_seen"),
        )
        seen_reps = seen.select(F.col(id_col).alias("id_a")).withColumn(
            "_seen", F.lit(True)
        )
        star = (
            star.join(seen_reps, "id_a", "left")
            .withColumn(
                "is_dup_of_seen", F.coalesce(F.col("_seen"), F.lit(False))
            )
            .drop("_seen")
        )
        pairs = star.unionByName(exact_edges)
        novel = reps.join(seen_fp.select("vfp"), "vfp", "left_anti")
    else:
        if star is not None:
            pairs = star.withColumn("is_dup_of_seen", F.lit(False))
        novel = reps

    novel = novel.persist()
    banded = None
    try:
        # Project-then-explode: _all_signatures is
        # nondeterministic-marked (single evaluation, guide §4.4) and
        # a Generate may not hold a nondeterministic child
        banded = novel.select(
            F.col(id_col),
            F.col("vfp"),
            _all_signatures("_v", n_bits, n_tables, seed, dim).alias("_sigs"),
        ).select(
            id_col, "vfp", F.posexplode("_sigs").alias("_t", "_sig")
        ).persist()
        va = novel.select(
            F.col(id_col).alias("id_a"),
            F.col("_v").alias("_va"),
            F.col("_norm").alias("_na"),
        )
        vb = novel.select(
            F.col(id_col).alias("id_b"),
            F.col("_v").alias("_vb"),
            F.col("_norm").alias("_nb"),
        )

        def verify(cand, right_vec):
            """Exact cosine on candidate (id_a, id_b) rows; the right
            side's vectors come from ``right_vec``."""
            return (
                cand.join(va, "id_a")
                .join(right_vec, "id_b")
                .withColumn(
                    "cos_sim",
                    _dot("_va", "_vb") / F.col("_na") / F.col("_nb"),
                )
                .where(F.col("cos_sim") >= threshold)
                .select("id_a", "id_b", "cos_sim")
            )

        # within-batch: bucket self-join over novel reps, chain-capped
        under, chain = banded, None
        if max_bucket_rows is not None:
            under, chain = chain_capped_buckets(
                banded.drop("vfp"), ["_t", "_sig"], id_col, max_bucket_rows
            )
        a, b = under.alias("a"), under.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a._t") == F.col("b._t"))
                & (F.col("a._sig") == F.col("b._sig"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
            )
        )
        if chain is not None:
            cand = cand.unionByName(chain.select("id_a", "id_b"))
        within = verify(cand.distinct(), vb).withColumn(
            "is_dup_of_seen", F.lit(False)
        )
        pairs = within if pairs is None else pairs.unionByName(within)

        idx_bands = read_part(bands_dir)
        band_keep = banded.drop("vfp")
        if idx_bands is not None and idx_vectors is not None:
            iv = idx_vectors.select(
                F.col(id_col).alias("id_b"),
                F.col("_v").alias("_vb"),
                F.col("_norm").alias("_nb"),
            )
            nb = banded.drop("vfp")
            if max_bucket_rows is not None:
                stats = idx_bands.groupBy("_t", "_sig").agg(
                    F.count(F.lit(1)).alias("_bn"),
                    F.min(id_col).alias("_imin"),
                )
                over_b = stats.where(F.col("_bn") >= max_bucket_rows)
                cross_u = (
                    nb.alias("n")
                    .join(over_b.select("_t", "_sig"),
                          ["_t", "_sig"], "left_anti")
                    .join(idx_bands.alias("i"), ["_t", "_sig"])
                    .where(F.col(f"n.{id_col}") != F.col(f"i.{id_col}"))
                    .select(
                        F.col(f"n.{id_col}").alias("id_a"),
                        F.col(f"i.{id_col}").alias("id_b"),
                    )
                )
                cross_o = (
                    nb.alias("n")
                    .join(over_b, ["_t", "_sig"])
                    .where(F.col(f"n.{id_col}") != F.col("_imin"))
                    .select(
                        F.col(f"n.{id_col}").alias("id_a"),
                        F.col("_imin").alias("id_b"),
                    )
                )
                cross_cand = cross_u.unionByName(cross_o)
                band_keep = nb.join(
                    over_b.select("_t", "_sig"), ["_t", "_sig"], "left_anti"
                )
            else:
                cross_cand = (
                    nb.alias("n")
                    .join(idx_bands.alias("i"), ["_t", "_sig"])
                    .where(F.col(f"n.{id_col}") != F.col(f"i.{id_col}"))
                    .select(
                        F.col(f"n.{id_col}").alias("id_a"),
                        F.col(f"i.{id_col}").alias("id_b"),
                    )
                )
            # emitted ordering is (earlier, later): the index side is
            # older, and for the verify join id_a must be the BATCH
            # side (va) — swap after the verify
            cross = verify(cross_cand.distinct(), iv).select(
                F.least("id_a", "id_b").alias("id_a"),
                F.greatest("id_a", "id_b").alias("id_b"),
                "cos_sim",
            ).withColumn("is_dup_of_seen", F.lit(True))
            pairs = pairs.unionByName(cross)

        (
            pairs.groupBy("id_a", "id_b")
            .agg(
                F.max("cos_sim").alias("cos_sim"),
                F.max("is_dup_of_seen").alias("is_dup_of_seen"),
            )
            .write.mode("overwrite")
            .parquet(f"{pairs_dir}/batch={int(batch_id)}")
        )
        band_keep.write.mode("overwrite").parquet(
            f"{bands_dir}/batch={int(batch_id)}"
        )
        # vectors persist for EVERY novel rep (even if all its band
        # rows hit capped buckets): the vfp row is what lets a future
        # exact copy match without re-probing
        novel.select(id_col, "vfp", "_v", "_norm").write.mode(
            "overwrite"
        ).parquet(f"{vectors_dir}/batch={int(batch_id)}")
    finally:
        # unpersist in finally (review r17): a transient write failure
        # retried by foreachBatch must not leak one cached plan per
        # attempt on a 24/7 stream
        novel.unpersist()
        if banded is not None:
            banded.unpersist()
        if collapse_identical:
            v.unpersist()


def compact_embedding_index(
    spark, index_dir: str, keep_last: int = 1
) -> int:
    """Fold a :func:`streaming_embedding_dedup` index's batch
    partitions — both its tables (``bands/`` and ``vectors/``) ride
    the same ``batch=<id>`` layout and replay contract as the minhash
    band index, so each gets the proven crash-safe vacuum-style fold
    (:func:`compact_minhash_index`). Returns the total partitions
    folded across the two tables."""
    import os

    total = 0
    for sub in ("bands", "vectors"):
        path = os.path.join(index_dir, sub)
        if os.path.isdir(path):
            total += compact_minhash_index(spark, path, keep_last)
    return total


def streaming_embedding_dedup(
    stream: DataFrame,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_bits: int = 6,
    n_tables: int = 16,
    seed: int = 7,
    dim: int = 64,
    available_now: bool = True,
    collapse_identical: bool = False,
    max_bucket_rows: int | None = None,
):
    """Embedding near-duplicate dedup on a vector STREAM — the
    embedding-family twin of :func:`streaming_minhash_dedup` (F11),
    completing the streaming guard for multimodal pipelines whose
    dedup key is an embedding rather than text shingles: each
    micro-batch signs its vectors with the same signed-random-
    projection LSH as the batch operator, self-joins its buckets,
    probes a PERSISTED band index, EXACT-COSINE-VERIFIES every
    candidate against persisted vectors (zero false positives — the
    batch operator's contract), and appends its novel signatures +
    vectors to the index.

    Guarantees (pytest-pinned): with the same (n_bits, n_tables, seed,
    dim, threshold) the union of streamed pairs across batches equals
    the batch ``embedding_dedup_pairs_lsh`` of the full corpus —
    identical signatures make bucket co-membership identical, so every
    candidate surfaces in the batch where its later vector arrives and
    passes the same cosine gate. ``is_dup_of_seen`` marks pairs whose
    partner was already indexed. ``collapse_identical`` /
    ``max_bucket_rows`` bound byte-identical and near-identical floods
    exactly like the minhash twin (k−1 cumulative edges; closure
    preserved; replay-idempotent); all sizing parameters are baked
    into the index directory for its lifetime."""

    def process(batch_df, batch_id):
        embedding_dedup_process_batch(
            batch_df, batch_id, index_dir, pairs_dir,
            vec_col=vec_col, id_col=id_col, threshold=threshold,
            n_bits=n_bits, n_tables=n_tables, seed=seed, dim=dim,
            collapse_identical=collapse_identical,
            max_bucket_rows=max_bucket_rows,
        )

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_clean_docs(
    df: DataFrame,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """The C4-style cleaning funnel as a CONTINUOUS ingest guard:
    language-ID + Gopher-quality projections (map-only, streaming-safe)
    followed by exact content dedup within the watermark horizon
    (``dropDuplicatesWithinWatermark`` on the md5 hash — bounded state,
    runs forever). Batch equivalence is pytest-pinned against the same
    flags + dropDuplicates; this is the streaming face of
    queries.pipeline_clean_counts."""
    from raquet_spark.operators.textops import with_clean_flags

    df = _as_event_time(df, ts_col)
    kept = with_clean_flags(df).where("is_en = 1 AND passes_quality = 1")
    return kept.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )


def streaming_quality_score(
    df: DataFrame,
    weights: list[float],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Model-based quality filtering on a document STREAM (F10): the
    trained linear scorer (textops.train_quality_classifier) applied as
    a PER-ROW projection. The hashed bag-of-words folds to a dense
    count vector inside one array ``aggregate`` (token → md5 bucket →
    scatter into a dim-length array), then L2-normalizes and takes the
    margin against the weight literal — no groupBy, no state, safe in
    any streaming output mode, and bit-identical to the batch
    ``hashed_embeddings`` → ``score_quality_classifier`` chain
    (pytest-pinned): identical counts, the same float32 cast, the same
    index-ordered dot product. Token-less documents (empty or
    non-alphanumeric text) are FILTERED, matching the batch chain where
    the token explode yields no rows for them — row-set parity holds on
    any input."""
    dim = len(weights)
    toks = f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
    bucket = "CAST(conv(substr(md5(t), 1, 7), 16, 10) AS BIGINT)" \
        f" % {dim}"
    counts = (
        f"aggregate({toks}, array_repeat(0.0D, {dim}), "
        f"(acc, t) -> transform(acc, (v, i) -> v + IF(i = {bucket}, "
        "1.0D, 0.0D)))"
    )
    # Evaluate the margin ONCE and derive label_pred from the score
    # column (r18): the old shape inlined the dim-element fold twice
    # (score + predicate). The score alias survives CollapseProject
    # because it is referenced twice (non-cheap multi-use aliases keep
    # their own Project); scores stay bit-identical (the batch parity
    # test pins this). The norm hoist below is best-effort only — a
    # SINGLE-use alias like _n gets re-inlined into the transform
    # lambda by CollapseProject, so don't count on it.
    norm = "sqrt(aggregate(c, 0.0D, (acc, x) -> acc + x * x))"
    from raquet_spark.operators.textops import _margin_expr

    m = _margin_expr(weights, "v")
    return (
        df.where(f"size({toks}) > 0")
        .selectExpr("*", f"{counts} AS c")
        .selectExpr(id_col, "c", f"greatest({norm}, 1e-12) AS _n")
        .selectExpr(
            id_col, "transform(c, x -> CAST(x / _n AS FLOAT)) AS v"
        )
        .selectExpr(id_col, f"{m} AS score")
        .selectExpr(
            id_col,
            "score",
            "CAST(score > 0.0D AS INT) AS label_pred",
        )
    )


def stateful_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str = "1 hour",
):
    """Custom stateful operator: per-user session assembly with
    ``applyInPandasWithState`` — the arbitrary-state path the built-in
    window aggregation can't express (session extent depends on the
    data, not the clock grid).

    State per user: (session_start, last_ts, n_events, total_value).
    An event later than ``gap_seconds`` after the previous one closes
    the open session (emitted) and starts a new one; state for users
    idle past the watermark is closed via timeout. Grouping shuffles by
    user, so state is partition-local and the operator scales with
    executors × users, never total history."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType, TimestampType,
    )

    out_schema = StructType([
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ])
    state_schema = StructType([
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ])
    gap_us = gap_seconds * 1_000_000

    def update(key, pdfs, state: GroupState):
        (user,) = key
        closed: list[tuple] = []
        if state.hasTimedOut:
            start_us, last_us, n, total = state.get
            closed.append((user, start_us, last_us, n, total))
            state.remove()
        else:
            rows = pd.concat(list(pdfs)).sort_values(ts_col)
            ts_us = pd.to_datetime(rows[ts_col]).astype("int64") // 1000
            vals = rows["value"].astype("f8")
            if state.exists:
                start_us, last_us, n, total = state.get
            else:
                start_us, last_us, n, total = None, None, 0, 0.0
            for t, v in zip(ts_us, vals):
                t = int(t)
                if start_us is None:
                    start_us, last_us, n, total = t, t, 1, float(v)
                elif t - last_us > gap_us:
                    closed.append((user, start_us, last_us, n, total))
                    start_us, last_us, n, total = t, t, 1, float(v)
                else:
                    last_us, n, total = t, n + 1, total + float(v)
            state.update((start_us, last_us, n, total))
            state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        if closed:
            out = pd.DataFrame(
                closed,
                columns=["user_id", "start_us", "last_us", "n_events", "total_value"],
            )
            yield pd.DataFrame({
                "user_id": out["user_id"],
                "session_start": pd.to_datetime(out["start_us"], unit="us"),
                "session_end": pd.to_datetime(out["last_us"], unit="us"),
                "n_events": out["n_events"],
                "total_value": out["total_value"],
            })

    return (
        _as_event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def windowed_event_stats(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
):
    """Watermarked windowed aggregation (streaming DataFrame in/out)."""
    w = F.window(F.col(ts_col), window, slide or window)
    events = _as_event_time(events, ts_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(w.alias("win"), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
            "total_value",
            "approx_users",
        )
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    watermark: str = "1 hour",
    max_delay: str = "30 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join: each left event matches
    right events with the same ``key`` arriving within ``[left_ts,
    left_ts + max_delay]`` (the click→conversion attribution shape).

    Both sides carry a watermark and the join condition bounds the
    event-time distance, so Spark can evict join state once a row's
    match window passes the watermark — constant state per key-rate,
    which is what lets the join run indefinitely at scale. Column names
    (``left_ts`` vs ``right_ts``) must differ between the sides."""
    l = _as_event_time(left, left_ts).withWatermark(left_ts, watermark)
    r = _as_event_time(right, right_ts).withWatermark(right_ts, watermark)
    cond = (
        (l[key] == r[key])
        & (r[right_ts] >= l[left_ts])
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond).drop(r[key])


def streaming_topk_trending(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
    k: int = 3,
):
    """Per-window top-k keys by event count — the trending-items shape.

    Streaming aggregation emits (window, key, n) in append mode once the
    watermark closes a window; ranking *within* a closed window is not a
    streaming-expressible op (it needs the window complete), so this
    returns the windowed counts stream plus a ``rank_topk`` helper the
    sink applies per closed window (foreachBatch / downstream batch) —
    the standard split between unbounded agg state and per-window
    finalization."""
    w = F.window(F.col(ts_col), window)
    events = _as_event_time(events, ts_col)
    counts = (
        events.withWatermark(ts_col, watermark)
        .groupBy(w.alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col(key_col),
            F.col("n"),
        )
    )

    def rank_topk(batch: DataFrame) -> DataFrame:
        from pyspark.sql.window import Window as W

        rw = W.partitionBy("window_start").orderBy(
            F.desc("n"), F.asc(key_col)
        )
        return (
            batch.withColumn("rnk", F.row_number().over(rw))
            .where(F.col("rnk") <= k)
        )

    return counts, rank_topk
