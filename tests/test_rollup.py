"""Continuous aggregate: incremental retraction-delta rollup equals a
full recompute, is epoch-fenced, and recovers the crash window where the
data epoch committed but the rollup didn't."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from sql_graph_visualizer_spark.lake.snapshot_table import SnapshotTable
from sql_graph_visualizer_spark.sources.cdc_gen import gen_cdc_log
from sql_graph_visualizer_spark.streaming.replay import replay_batch
from sql_graph_visualizer_spark.streaming.rollup import RollupSync

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
KEYS = ["conv_id", "turn_idx"]


def _full_recompute(state, bucket="hour"):
    return sorted(
        (r.bucket_start, r.n_turns)
        for r in state.filter(F.col("ts").isNotNull())
        .groupBy(F.date_trunc(bucket, "ts").alias("bucket_start"))
        .agg(F.count("*").cast("long").alias("n_turns"))
        .collect()
    )


def _rollup_rows(rs):
    return sorted((r.bucket_start, r.n_turns) for r in rs.read().collect())


def test_incremental_rollup_equals_full_recompute(spark, tmp_path):
    # ~2000 events over ~33 minutes of event time -> use minute buckets?
    # 1 event/second: spread into hours via turns: keep hour buckets but
    # generate enough events to span several hours
    log = gen_cdc_log(spark, 9000, num_convs=12, turns_per_conv=6)
    t = SnapshotTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, num_buckets=8)
    rs = RollupSync(spark, str(tmp_path / "r"), t, bucket="minute")
    bounds = (0, 8999)
    span = 9000 // 3
    for e in range(3):
        chunk = log.filter((F.col("seq") >= e * span) & (F.col("seq") < (e + 1) * span))
        st = t.merge_upsert(chunk, epoch_id=e, query_id="q")
        rs.sync(chunk, e, st)
        # invariant holds after EVERY epoch, not just the last
        assert _rollup_rows(rs) == _full_recompute(t.read(), "minute")
    assert len(_rollup_rows(rs)) >= 2  # spans multiple minute buckets


def test_rollup_fenced_and_crash_recovery(spark, tmp_path):
    log = gen_cdc_log(spark, 2000, num_convs=8, turns_per_conv=5)
    t = SnapshotTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, num_buckets=4)
    # source_query_id pins recovery lookups to THIS writer's commits
    # (manifest summaries record (query_id, epoch); an epoch number alone
    # is ambiguous on a multi-writer table — ADVICE r3)
    rs = RollupSync(spark, str(tmp_path / "r"), t, bucket="hour", source_query_id="q")
    half = log.filter(F.col("seq") < 1000)
    st0 = t.merge_upsert(half, epoch_id=0, query_id="q")
    rs.sync(half, 0, st0)
    expect0 = _rollup_rows(rs)
    # duplicate delivery of epoch 0: fenced no-op
    st0b = t.merge_upsert(half, epoch_id=0, query_id="q")
    assert st0b.skipped
    rs.sync(half, 0, st0b)
    assert _rollup_rows(rs) == expect0

    # crash window: epoch 1's DATA commits, rollup does not; replay
    # re-delivers epoch 1 -> data merge is fenced-skip, rollup must
    # recover the original snapshot pair by epoch id and apply the delta
    rest = log.filter(F.col("seq") >= 1000)
    t.merge_upsert(rest, epoch_id=1, query_id="q")  # rollup "crashes" here
    # a SECOND writer commits the same epoch number before recovery runs
    # (state-preserving: it re-delivers already-applied events, LWW no-op)
    # — newest-first epoch lookup would pick ITS commit and diff the
    # wrong snapshot pair without (query_id, epoch) matching
    t.merge_upsert(rest.limit(50), epoch_id=1, query_id="other-writer")
    found = rs._find_epoch_version(1)
    assert t.manifest(found)["summary"]["query_id"] == "q"
    st1b = t.merge_upsert(rest, epoch_id=1, query_id="q")
    assert st1b.skipped
    rs.sync(rest, 1, st1b)
    assert _rollup_rows(rs) == _full_recompute(t.read())


def test_rollup_with_pipelined_replay_driver(spark, tmp_path):
    """on_batch wiring through replay_batch-style loop with deletes:
    buckets whose count hits zero are tombstoned away."""
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows,
        "seq long, op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp",
    )
    from datetime import datetime

    t = SnapshotTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, num_buckets=4)
    rs = RollupSync(spark, str(tmp_path / "r"), t, bucket="hour")
    h1, h2 = datetime(2024, 1, 1, 10, 30), datetime(2024, 1, 1, 11, 15)
    b0 = mk(
        [
            (1, "insert", "c", 0, "user", "x", None, h1),
            (2, "insert", "c", 1, "user", "y", None, h2),
        ]
    )
    st = t.merge_upsert(b0, epoch_id=0, query_id="q")
    rs.sync(b0, 0, st)
    assert [r.n_turns for r in rs.read().orderBy("bucket_start").collect()] == [1, 1]
    # delete the only turn in hour 1 -> that bucket disappears entirely
    b1 = mk([(3, "delete", "c", 0, None, None, None, None)])
    st1 = t.merge_upsert(b1, epoch_id=1, query_id="q")
    rs.sync(b1, 1, st1)
    rows = rs.read().collect()
    assert len(rows) == 1 and rows[0].bucket_start == datetime(2024, 1, 1, 11)
    assert _rollup_rows(rs) == _full_recompute(t.read())
