#!/usr/bin/env python3
"""End-to-end LLM training-data pipeline on the raquet_spark operators:

    raw documents
      → C4-style cleaning flags        (textops.with_clean_flags)
      → exact-substring dedup + prune  (textops.substring_dedup_prune)
      → MinHash near-dup clustering    (dedup.minhash_dedup_pairs →
                                        dedup.connected_components,
                                        keep each cluster's min doc)
      → quality gate                   (textops.with_quality_score)
      → sequence packing               (textops.sequence_pack)
      → deterministic shuffle + split  (xxhash64 order / modulo split)

Every stage is a declarative DataFrame plan (no Python UDFs in any hot
path; the shingle/minhash shuffles are banded equi-joins) — the same
operators the driver checks one-by-one against DuckDB oracles, composed
the way a production corpus build would run them. Prints one JSON line
of per-stage survivor counts.

Usage: python examples/pipeline_demo.py [sf_dir] (default
/root/testdata/sf0.001).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def run_pipeline(spark, sf_dir: str, max_len: int = 512) -> dict:
    from raquet_spark.operators.dedup import (
        keep_cluster_min,
        minhash_dedup_pairs,
    )
    from raquet_spark.operators.textops import (
        sequence_pack,
        substring_dedup_prune,
        with_clean_flags,
        with_quality_score,
    )
    from raquet_spark.queries import load_table

    counts: dict[str, int] = {}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    counts["raw"] = docs.count()

    # 1. C4-style cleaning: keep docs passing the language + quality
    # signals (same flags the streaming ingest guard applies)
    clean = (
        with_clean_flags(docs)
        .where((F.col("is_en") == 1) & (F.col("passes_quality") == 1))
        .select("doc_id", "text")
    )
    counts["after_clean"] = clean.count()

    # 2. exact-substring dedup: cut duplicated >=20-token runs, keep
    # docs that still have content
    pruned = substring_dedup_prune(clean, window=20).select(
        "doc_id", F.col("clean_text").alias("text")
    ).where(F.length("text") > 0)
    pruned = pruned.localCheckpoint(eager=False)
    counts["after_substring_dedup"] = pruned.count()

    # 3. MinHash near-dup clusters: keep each cluster's smallest doc_id
    # auto_width: the demo mirrors the production funnel — the pairs
    # come back materialized, so the components sizing count is cheap
    uniq = keep_cluster_min(
        pruned,
        minhash_dedup_pairs(pruned, auto_width=True, collapse_identical=True),
        auto_width=True,
    )
    counts["after_minhash_dedup"] = uniq.count()
    # observability (r17): surface what the duplicate collapse acted
    # on — the star-edge count (docs − distinct signatures) is the
    # linear replacement for the quadratic within-group pair listing
    from raquet_spark.operators.dedup import minhash_signatures

    sigs = minhash_signatures(pruned)
    sig_cols = [c for c in sigs.columns if c != "doc_id"]
    # one signature pass: docs − distinct signatures from a single
    # groupBy chain (the CLI funnel's pattern; review r17)
    g = sigs.groupBy(*sig_cols).agg(F.count(F.lit(1)).alias("c"))
    row = g.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("m")
    ).collect()[0]
    counts["minhash_collapsed_star_edges"] = int(row["n"] - row["m"])

    # 4. quality gate
    scored = with_quality_score(uniq)
    kept = scored.where(F.col("quality_score") >= 0.5).select("doc_id", "text")
    counts["after_quality"] = kept.count()

    # 5. pack into training sequences
    packed = sequence_pack(kept, max_len=max_len, shards=16)
    counts["bins"] = packed.select("shard", "bin").distinct().count()

    # 6. deterministic shuffle + split (stable across runs/cluster sizes)
    final = (
        kept.join(packed.select("doc_id", "shard", "bin"), "doc_id")
        .withColumn("_h", F.expr("xxhash64(doc_id)"))
        .withColumn(
            "split",
            F.when(F.expr("pmod(_h, 100)") < 90, "train").otherwise("val"),
        )
        .orderBy("_h")
        .drop("_h")
    )
    splits = {r["split"]: r["n"] for r in
              final.groupBy("split").agg(F.count("*").alias("n")).collect()}
    counts["train"] = int(splits.get("train", 0))
    counts["val"] = int(splits.get("val", 0))
    return counts


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from raquet_spark.session import get_spark

    spark = get_spark("pipeline_demo")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(run_pipeline(spark, sf_dir)))


if __name__ == "__main__":
    main()
