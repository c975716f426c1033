"""AS-OF and range joins: semantics (ties, no-match NULLs, tolerance),
bin-width invariance, and the one-shuffle plan contract."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from sql_graph_visualizer_spark.operators.temporal import asof_join, range_join_binned


def ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "a", ts("2024-01-01T00:00:00")),  # before any right row -> NULLs
            (2, "a", ts("2024-01-02T00:00:00")),  # exact tie with v1 -> matches v1
            (3, "a", ts("2024-01-05T12:00:00")),  # between v1 and v2 -> v1
            (4, "a", ts("2024-01-09T00:00:00")),  # after v2 -> v2
            (5, "b", ts("2024-01-03T00:00:00")),  # other key -> its own v1
        ],
        "event_id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", ts("2024-01-02T00:00:00"), 10),
            ("a", ts("2024-01-06T00:00:00"), 20),
            ("b", ts("2024-01-01T00:00:00"), 99),
        ],
        "k string, ts timestamp, rate int",
    )
    return left, right


def test_asof_semantics(spark):
    left, right = _frames(spark)
    got = {r.event_id: (r.ts_right, r.rate) for r in asof_join(left, right, on="k").collect()}
    assert got[1] == (None, None)  # no prior version
    assert got[2] == (ts("2024-01-02T00:00:00"), 10)  # tie is inclusive
    assert got[3] == (ts("2024-01-02T00:00:00"), 10)
    assert got[4] == (ts("2024-01-06T00:00:00"), 20)
    assert got[5] == (ts("2024-01-01T00:00:00"), 99)


def test_asof_tolerance_nulls_stale_matches(spark):
    left, right = _frames(spark)
    got = {
        r.event_id: r.rate
        for r in asof_join(left, right, on="k", tolerance="3 DAYS").collect()
    }
    # event 3 is 3.5 days after v1 -> stale under a 3-day tolerance;
    # event 4 is exactly 3 days after v2 -> boundary is inclusive
    assert got[3] is None
    assert got[2] == 10 and got[4] == 20


def test_asof_single_shuffle_plan(spark):
    left, right = _frames(spark)
    plan = asof_join(left, right, on="k")._jdf.queryExecution().executedPlan().toString()
    # one key-partitioned exchange feeds the running-last window; no
    # nested loop, no cartesian, no broadcast of the event side
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_range_join_binned_matches_naive_and_is_bin_invariant(spark):
    events = spark.createDataFrame(
        [(i, "k0" if i % 2 else "k1", ts("2024-01-01T00:00:00").replace(day=1 + i % 9, hour=i % 24))
         for i in range(60)],
        "event_id long, k string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            ("k0", ts("2024-01-02T00:00:00"), ts("2024-01-04T00:00:00"), 1),
            ("k0", ts("2024-01-06T12:00:00"), ts("2024-01-07T06:00:00"), 2),
            ("k1", ts("2024-01-01T00:00:00"), ts("2024-01-09T00:00:00"), 3),
        ],
        "k string, start_ts timestamp, end_ts timestamp, iv int",
    )
    naive = events.join(intervals, on="k").filter(
        (F.col("ts") >= F.col("start_ts")) & (F.col("ts") < F.col("end_ts"))
    )
    expect = sorted((r.event_id, r.iv) for r in naive.collect())
    for width in (3600, 86_400, 7 * 86_400):
        got = range_join_binned(events, intervals, on="k", bin_width_seconds=width)
        assert sorted((r.event_id, r.iv) for r in got.collect()) == expect
    assert len(expect) > 0
