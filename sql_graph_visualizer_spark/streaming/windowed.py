"""Watermarked event-time windowed aggregation over the CDC stream.

SURVEY §2.9's late-data row: the reference has no late-data story (its
poll loop is delete-then-create idempotent), so the graft supplies the
Spark-native one — ``withWatermark`` bounds aggregation state and
defines when a window is final; events arriving later than the
watermark for an already-finalized window are dropped, not double
counted. Reference analogue for the metric itself: QPS per interval
(``realtime_performance_monitor.go:406-419``), here per event-time
window instead of per poll tick.

Semantics to know when testing (they are Structured Streaming's, not
ours):

- append mode emits a window only once, AFTER the watermark passes its
  end — state for that window is then evicted;
- the watermark is computed from the max event time of PREVIOUS
  batches, so a bounded ``availableNow`` run leaves the tail windows
  (those within the watermark delay of the max seen ts) un-emitted
  until a later run advances the watermark past them;
- a resumed run (same checkpoint) continues from the stored watermark —
  which makes emission across runs deterministic even though the file
  source's intra-run batch order is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_graph_visualizer_spark.sources.cdc_gen import read_cdc_stream


def windowed_event_counts(
    spark: SparkSession,
    log_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
    watermark: str = "20 minutes",
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drain the log (availableNow) through a watermarked tumbling-window
    count into an append-only parquet sink; returns the sink contents
    (finalized windows only). Resumable: re-running with the same
    checkpoint continues the watermark and emits newly-final windows."""
    stream = read_cdc_stream(spark, log_dir, max_files_per_trigger, fmt=fmt)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)
