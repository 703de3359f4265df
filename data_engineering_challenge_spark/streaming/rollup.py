"""Incrementally-maintained rollup (continuous aggregate): the
"hypertable rollup" pattern — a streaming aggregation that keeps a
queryable parquet aggregate table up to date as events arrive, so
dashboards read |buckets| rows instead of re-scanning raw events.

Mechanics: an update-mode streaming agg emits each hourly bucket's
*current* totals whenever a micro-batch touches it; `foreachBatch`
upserts those rows into the rollup table with
:func:`operators.merge.merge_upsert` (keyed full-outer, source wins).
Restart safety comes from the checkpoint: foreachBatch re-delivers a
batch only after failure, and the upsert is idempotent per key
(replaying the same totals writes the same rows).

Scale notes (100 TB posture):
- The rollup table is O(buckets × event types) — tiny — so the
  per-batch merge joins a small delta against a small table no matter
  how large the raw stream is. Raw events are never re-read.
- Watermarked state bounds the streaming agg's memory; buckets stop
  receiving updates once the watermark passes, after which their
  rollup rows are final.
- The swap is write-temp-then-replace: readers of the rollup path
  never observe a half-written table.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import merge_upsert
from .pipelines import WATERMARK, _read_events_stream

_KEYS = ["window_start", "event_type"]


def _hourly_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _read_events_stream(spark, sf_dir)
    return (
        e.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_incremental_rollup(
    spark: SparkSession, sf_dir: str, rollup_path: str, checkpoint: str
) -> None:
    """Drive the stream to completion, maintaining `rollup_path`."""

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark_b = batch_df.sparkSession
        if os.path.isdir(rollup_path):
            current = spark_b.read.parquet(rollup_path)
            merged = merge_upsert(current, batch_df, _KEYS)
        else:
            merged = batch_df
        tmp = rollup_path + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(rollup_path):
            shutil.rmtree(rollup_path)
        os.replace(tmp, rollup_path)

    q = (
        _hourly_updates(spark, sf_dir)
        .writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(upsert_batch)
        .start()
    )
    q.processAllAvailable()
    q.stop()
