"""Hard-kill chaos test: SIGKILL the replay driver inside the
exactly-once race window, restart from checkpoint, prove convergence.

The reference has no recovery story at all (cmd/main.go:165-177 wipes
and rebuilds per run); exactly-once crash recovery is this graft's
flagship differentiator, so the evidence is made brutal: the child
process kills itself with SIGKILL *after* epoch 1's MERGE committed to
the table but *before* Structured Streaming committed the epoch to the
checkpoint — the exact window where a naive sink double-applies. The
restarted driver must re-deliver epoch 1, the manifest fence must skip
it, and the final state must equal the batch oracle with exactly one
committed lineage row per epoch.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import textwrap

from pyspark.sql import functions as F

from sql_graph_visualizer_spark.lake.snapshot_table import SnapshotTable
from sql_graph_visualizer_spark.operators.compaction import final_state
from sql_graph_visualizer_spark.sources.cdc_gen import gen_cdc_log
from sql_graph_visualizer_spark.streaming.metrics import LineageRecorder

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = textwrap.dedent(
    """
    import json, os, signal, sys
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession
    from sql_graph_visualizer_spark.lake.snapshot_table import SnapshotTable
    from sql_graph_visualizer_spark.sources.cdc_gen import gen_cdc_log, write_cdc_log_dir
    from sql_graph_visualizer_spark.sources.events_cdc import TRANSCRIPT_SCHEMA
    from sql_graph_visualizer_spark.streaming.metrics import LineageRecorder
    from sql_graph_visualizer_spark.streaming.replay import replay_stream

    base = {base!r}
    kill_at_epoch = {kill_at_epoch}
    merge_mode = {merge_mode!r}
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    log_dir = os.path.join(base, "log")
    if not os.path.isdir(log_dir):
        log = gen_cdc_log(spark, 2400, num_convs=10, turns_per_conv=8)
        write_cdc_log_dir(log, log_dir, num_files=6)
    tpath = os.path.join(base, "table")
    if SnapshotTable.exists(tpath):
        table = SnapshotTable(spark, tpath)
    else:
        table = SnapshotTable.create(
            spark, tpath, TRANSCRIPT_SCHEMA,
            key_cols=["conv_id", "turn_idx"], num_buckets=8,
        )
    lineage = LineageRecorder(spark, os.path.join(base, "lineage"))

    def on_batch(batch, epoch_id, st):
        # fires AFTER merge_upsert committed (and after lineage.record in
        # apply_batch? no: on_batch runs after lineage) — SIGKILL here is
        # inside the sink-committed / checkpoint-uncommitted window
        if epoch_id == kill_at_epoch:
            os.kill(os.getpid(), signal.SIGKILL)

    stats = replay_stream(
        spark, log_dir, table, os.path.join(base, "ckpt"),
        max_files_per_trigger=1, lineage=lineage, on_batch=on_batch,
        merge_mode=merge_mode,
    )
    out = [
        {{"epoch": s.epoch_id, "rows_in": s.rows_in, "skipped": s.skipped}}
        for s in stats
    ]
    with open(os.path.join(base, "stats_{tag}.json"), "w") as f:
        json.dump(out, f)
    """
)


def _run_child(
    base: str, kill_at_epoch: int, tag: str, merge_mode: str = "cow"
) -> subprocess.CompletedProcess:
    script = os.path.join(base, f"child_{tag}.py")
    with open(script, "w") as f:
        f.write(
            CHILD.format(
                repo=REPO, base=base, kill_at_epoch=kill_at_epoch, tag=tag,
                merge_mode=merge_mode,
            )
        )
    env = dict(os.environ)
    env.pop("PYSPARK_GATEWAY_PORT", None)
    env.pop("PYSPARK_GATEWAY_SECRET", None)
    return subprocess.run(
        [sys.executable, script], env=env, capture_output=True, text=True, timeout=420
    )


import pytest


@pytest.mark.parametrize("merge_mode", ["cow", "mor"])
def test_sigkill_mid_epoch_restart_is_exactly_once(spark, tmp_path, merge_mode):
    """Both merge arms must be exactly-once under the kill: CoW fences a
    re-delivered bucket rewrite; MoR must NOT append the same epoch's
    delta segment twice (a double delta would double-mask or duplicate
    rows only detectable by the oracle comparison below)."""
    base = str(tmp_path)
    # run 1: child SIGKILLs itself right after epoch 1's merge commit
    p1 = _run_child(base, kill_at_epoch=1, tag="run1", merge_mode=merge_mode)
    assert p1.returncode == -signal.SIGKILL, p1.stderr[-2000:]
    t = SnapshotTable(spark, os.path.join(base, "table"))
    assert t.last_committed_epoch("cdc-replay") == 1  # epoch 1 DID commit

    # run 2: restart from the same checkpoint, no kill — must re-deliver
    # epoch 1 (its checkpoint commit never happened), fence it, and drain
    p2 = _run_child(base, kill_at_epoch=-1, tag="run2", merge_mode=merge_mode)
    assert p2.returncode == 0, p2.stderr[-2000:]
    with open(os.path.join(base, "stats_run2.json")) as f:
        stats2 = json.load(f)
    by_epoch = {s["epoch"]: s for s in stats2}
    assert by_epoch[1]["skipped"] is True  # the fence caught the replay
    assert [e for e in sorted(by_epoch) if not by_epoch[e]["skipped"]] == [2, 3, 4, 5]

    # final state equals the batch oracle (same deterministic generator)
    log = gen_cdc_log(spark, 2400, num_convs=10, turns_per_conv=8)
    expected = sorted(
        map(tuple, final_state(log, payload_cols=("text",)).collect())
    )
    got = sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in t.read().select("conv_id", "turn_idx", "text").collect()
    )
    assert got == expected

    # lineage: exactly ONE committed (non-skipped) row per epoch — the
    # replayed epoch was re-recorded as a fenced no-op, never double-counted
    lin = LineageRecorder(spark, os.path.join(base, "lineage")).read()
    rows = lin.filter("query_id = 'cdc-replay'").collect()
    committed = sorted(int(r.epoch_id) for r in rows if not r.skipped and r.rows_in > 0)
    assert committed == [0, 1, 2, 3, 4, 5]
    per_epoch = (
        lin.filter("query_id = 'cdc-replay' AND NOT skipped")
        .groupBy("epoch_id").agg(F.count("*").alias("n")).collect()
    )
    assert all(r.n == 1 for r in per_epoch)
