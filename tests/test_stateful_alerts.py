"""Cross-batch stateful alerting (applyInPandasWithState)."""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from sql_graph_visualizer_spark.streaming.stateful_alerts import consecutive_breach_alerts


def _write_epoch_files(src: str, rows: list[tuple[str, int, float]]) -> None:
    """One parquet file per epoch with ascending mtimes so the file
    source replays them in epoch order, one per trigger."""
    os.makedirs(src, exist_ok=True)
    t0 = time.time() - len(rows) - 10
    for i, (q, e, v) in enumerate(rows):
        path = os.path.join(src, f"{i:04d}.parquet")
        pq.write_table(
            pa.table({"query_id": [q], "epoch_id": [e], "rows_in": [v]}), path
        )
        os.utime(path, (t0 + i, t0 + i))


def test_breach_streak_spans_micro_batches(spark, tmp_path):
    """The K-consecutive debounce needs state that survives micro-batch
    boundaries: with one epoch per trigger, the streak (epochs 1-3) spans
    three batches — a stateless per-batch filter can never fire it."""
    rows = [
        ("q", 0, 50.0),   # quiet
        ("q", 1, 150.0),  # breach 1
        ("q", 2, 160.0),  # breach 2
        ("q", 3, 170.0),  # breach 3 -> alert
        ("q", 4, 10.0),   # quiet -> resolved
        ("q", 5, 200.0),  # breach 1 only -> silent
    ]
    src = str(tmp_path / "metrics")
    _write_epoch_files(src, rows)
    stream = (
        spark.readStream.schema("query_id string, epoch_id bigint, rows_in double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    alerts = consecutive_breach_alerts(stream, "rows_in", threshold=100.0, k=3)
    q = (
        alerts.writeStream.format("memory")
        .queryName("stateful_alerts_t1")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = [
        (r.event, int(r.epoch_id), int(r.streak))
        for r in spark.sql(
            "SELECT * FROM stateful_alerts_t1 ORDER BY epoch_id"
        ).collect()
    ]
    assert got == [("alert", 3, 3), ("resolved", 4, 3)]


def test_streak_resumes_from_checkpoint(spark, tmp_path):
    """Restarting the query with the same checkpoint restores the streak
    from the state store: 2 breaches before the stop + 1 after = alert."""
    src = str(tmp_path / "metrics")
    ckpt = str(tmp_path / "ckpt")
    collected: list = []

    def run():
        stream = (
            spark.readStream.schema("query_id string, epoch_id bigint, rows_in double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        alerts = consecutive_breach_alerts(stream, "rows_in", threshold=100.0, k=3)
        q = (
            alerts.writeStream.foreachBatch(lambda df, _: collected.extend(df.collect()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _write_epoch_files(src, [("q", 0, 150.0), ("q", 1, 160.0)])
    run()
    assert collected == []
    # third consecutive breach arrives after a restart
    path = os.path.join(src, "9999.parquet")
    pq.write_table(pa.table({"query_id": ["q"], "epoch_id": [2], "rows_in": [170.0]}), path)
    run()
    assert [(r.event, int(r.epoch_id)) for r in collected] == [("alert", 2)]
