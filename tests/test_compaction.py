"""LWW compaction semantics (reference: AddNode overwrite,
graph_aggregate.go:46-59; oracle per FIXTURES.md §5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_graph_visualizer_spark.operators.compaction import compact_lww, final_state
from sql_graph_visualizer_spark.operators.skew import compact_lww_salted
from sql_graph_visualizer_spark.sources.cdc_gen import gen_cdc_log

COLS = ["seq", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts", "schema_ver"]


def _mk(spark, rows):
    return spark.createDataFrame(
        [tuple(r) for r in rows],
        "seq long, op string, conv_id string, turn_idx int, role string, text string",
    )


def test_last_writer_wins(spark):
    df = _mk(
        spark,
        [
            (1, "insert", "c1", 0, "user", "v1"),
            (3, "update", "c1", 0, "user", "v3"),
            (2, "update", "c1", 0, "user", "v2"),
            (5, "insert", "c2", 0, "user", "other"),
        ],
    )
    out = {(r.conv_id, r.turn_idx): r.text for r in compact_lww(df).collect()}
    assert out == {("c1", 0): "v3", ("c2", 0): "other"}


def test_delete_then_reinsert_within_batch(spark):
    df = _mk(
        spark,
        [
            (1, "insert", "c1", 0, "user", "v1"),
            (2, "delete", "c1", 0, None, None),
            (3, "insert", "c1", 0, "user", "v3"),
            (4, "insert", "c1", 1, "user", "x"),
            (5, "delete", "c1", 1, None, None),
        ],
    )
    fin = final_state(df, payload_cols=("role", "text"))
    rows = {(r.conv_id, r.turn_idx): r.text for r in fin.collect()}
    # key (c1,0): delete superseded by later insert; key (c1,1): deleted
    assert rows == {("c1", 0): "v3"}


def test_compaction_is_one_row_per_key(spark):
    log = gen_cdc_log(spark, 5000, num_convs=20, turns_per_conv=10)
    c = compact_lww(log)
    assert c.count() == c.select("conv_id", "turn_idx").distinct().count()


def test_salted_compaction_equals_plain(spark):
    log = gen_cdc_log(spark, 5000, num_convs=10, turns_per_conv=5, skew_exponent=4.0)
    plain = compact_lww(log).orderBy("conv_id", "turn_idx")
    salted = compact_lww_salted(log, hot_threshold=50, salt_factor=8).orderBy(
        "conv_id", "turn_idx"
    )
    assert plain.collect() == salted.collect()


def test_final_state_matches_pandas_oracle(spark):
    log = gen_cdc_log(spark, 3000, num_convs=15, turns_per_conv=8)
    pdf = log.toPandas().sort_values("seq")
    last = pdf.groupby(["conv_id", "turn_idx"]).tail(1)
    expected = {
        (r.conv_id, r.turn_idx): r.text for r in last.itertuples() if r.op != "delete"
    }
    got = {
        (r.conv_id, r.turn_idx): r.text
        for r in final_state(log, payload_cols=("text",)).collect()
    }
    assert got == expected


def test_generator_is_deterministic_across_partitionings(spark):
    a = gen_cdc_log(spark, 2000, num_convs=10, num_partitions=2)
    b = gen_cdc_log(spark, 2000, num_convs=10, num_partitions=7)
    assert a.orderBy("seq").collect() == b.orderBy("seq").collect()
    # skew exists: hottest conversation dominates
    top = (
        a.groupBy("conv_id").count().orderBy(F.desc("count")).limit(1).collect()[0]["count"]
    )
    assert top > 2000 / 10  # above uniform share
