"""Streaming surface over the ``events`` table (SURVEY.md §2.2: absent in
the reference; built on Structured Streaming).

The windowing transformations are written once and used twice:
- **batch mode** (DataFrame in, DataFrame out) — oracle-checkable;
- **stream mode** via ``readStream`` + ``withWatermark`` + ``foreachBatch``
  with an ``availableNow`` trigger — the true streaming path, same logical
  plan, checkpointed and incremental.

At scale the stateful aggs shuffle on (window, key); the watermark bounds
state size — without it a 100 TB replay would accumulate unbounded window
state.
"""

from __future__ import annotations

import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tumbling_window_counts(events: DataFrame, width: str = "10 minutes") -> DataFrame:
    """Per-event-type counts/sums over tumbling windows."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_window_counts(events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes") -> DataFrame:
    """Overlapping (sliding) windows: each event lands in width/slide windows."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def sessionized(events: DataFrame, gap: str = "30 seconds") -> DataFrame:
    """Per-user session windows: a session extends while events arrive
    within ``gap`` of the previous one."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.min("event_id").alias("first_event_id"))
        .select(F.col("w.start").alias("session_start"), "user_id", "n_events", "first_event_id")
    )


def run_streaming_window_pipeline(
    spark: SparkSession,
    events: DataFrame,
    scratch_dir: str | None = None,
    width: str = "10 minutes",
    watermark: str = "15 minutes",
) -> DataFrame:
    """True Structured Streaming run of the tumbling-window aggregation.

    Stages the batch events as parquet, replays them with ``readStream``
    (bounded by ``availableNow``), applies a watermark so late rows beyond
    15 minutes would be dropped and state is reclaimable, and lands each
    micro-batch via ``foreachBatch`` append — the pattern that would feed
    the reference's JDBC sinks (`/root/reference/ClickHouseDatabase.py:102-109`)
    incrementally instead of full-table reloads. Returns the final result
    read back from the sink.
    """
    scratch = scratch_dir or f"/tmp/diaps_stream_{uuid.uuid4().hex[:8]}"
    src, sink, ckpt = f"{scratch}/src", f"{scratch}/sink", f"{scratch}/ckpt"
    shutil.rmtree(scratch, ignore_errors=True)
    events.write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .parquet(src)
        .withWatermark("ts", watermark)
    )
    windowed = tumbling_window_counts(stream, width)

    def land(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(sink)

    (
        windowed.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(land)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(300)
    )
    return spark.read.parquet(sink)
