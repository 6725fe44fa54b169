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
from pyspark.sql.types import StructType


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
