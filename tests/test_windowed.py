"""Watermarked windowed aggregation: finalized windows match the batch
oracle; a too-late event for an evicted window is DROPPED (§2.9)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_graph_visualizer_spark.sources.cdc_gen import gen_cdc_log, write_cdc_log_dir
from sql_graph_visualizer_spark.streaming.windowed import windowed_event_counts


def _expected(df, upto_end=None):
    agg = (
        df.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("s"), F.col("w.end").alias("e"), "n_events")
    )
    if upto_end is not None:
        agg = agg.filter(F.col("e") <= upto_end)
    return sorted((r.s, r.e, r.n_events) for r in agg.collect())


def test_watermarked_windows_finalize_and_drop_late(spark, tmp_path):
    # 5000 events = ~83 minutes of event time at 1 event/second
    log = gen_cdc_log(spark, 5000, num_convs=10, turns_per_conv=5)
    log_dir, out, ckpt = (str(tmp_path / d) for d in ("log", "out", "ckpt"))
    write_cdc_log_dir(log, log_dir, num_files=5)

    # run 1: drain the log in ONE batch (the file source's batch order is
    # nondeterministic — split batches would let an early watermark drop
    # earlier files' events); tail windows within the 20-minute delay of
    # max ts are not yet final
    got1 = windowed_event_counts(spark, log_dir, out, ckpt)
    max_ts = log.agg(F.max("ts")).collect()[0][0]
    rows1 = sorted((r.window_start, r.window_end, r.n_events) for r in got1.collect())
    exp_all = _expected(log)
    assert set(rows1) <= set(exp_all)  # only true finalized windows, correct counts
    assert all(r.n_events > 0 for r in got1.collect())

    # run 2 (same checkpoint): a heartbeat far in the future finalizes
    # everything; a LATE event aimed at the first (already-final) window
    # must be dropped, not re-counted
    heartbeat = log.limit(2).withColumn("ts", F.timestamp_add("HOUR", F.lit(6), F.col("ts")))
    late = log.limit(1).withColumn("seq", F.col("seq") + 1_000_000)  # ts stays in window 0
    heartbeat.unionByName(late).coalesce(1).write.mode("append").parquet(log_dir)
    got2 = windowed_event_counts(spark, log_dir, out, ckpt, max_files_per_trigger=2)
    rows2 = {(r.window_start, r.window_end): r.n_events for r in got2.collect()}
    # every original window is now final with the exact batch-oracle count
    for s, e, n in exp_all:
        assert rows2[(s, e)] == n, f"window {s} expected {n}, got {rows2[(s, e)]}"
    # the late event changed NO finalized count (window 0 unchanged)
    first = exp_all[0]
    assert rows2[(first[0], first[1])] == first[2]
