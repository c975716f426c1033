"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "cdc_events_per_sec": ...}

The flagship is the north-star metric: sustained change-events/sec for
CDC replay → snapshot-table MERGE (BASELINE.json). Scaling-efficiency
evidence across two parallelism levels lives in bench_scaling.py (it
must fork per level — the JVM is a per-process singleton).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

import __spark_entry__ as E
from sql_graph_visualizer_spark.lake.snapshot_table import SnapshotTable
from sql_graph_visualizer_spark.operators.dedup import minhash_lsh_pairs
from sql_graph_visualizer_spark.plans.graph_builder import build_conv_edges_arrow
from sql_graph_visualizer_spark.session import get_spark
from sql_graph_visualizer_spark.sources.cdc_gen import gen_cdc_log, read_cdc_log
from sql_graph_visualizer_spark.sources.events_cdc import TRANSCRIPT_SCHEMA, derive_cdc_log
from sql_graph_visualizer_spark.streaming.replay import replay_batch

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# synthetic CDC volume for the throughput headline (events)
GEN_EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "8000000"))
# scratch on tmpfs when available: the flagship measures engine throughput,
# not this sandbox's single virtual disk (which serializes 32 writers)
SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else None


def main() -> None:
    import atexit
    import shutil

    scratch = tempfile.mkdtemp(prefix="bench_scratch_", dir=SCRATCH)
    atexit.register(lambda: shutil.rmtree(scratch, ignore_errors=True))
    spark = get_spark(
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.local.dir": os.path.join(scratch, "spark-local")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 3)

    # --- flagship: sustained CDC replay throughput (engine MERGE path).
    # The change log is MATERIALIZED first (untimed) as gzip JSON lines —
    # the Debezium/Maxwell binlog-tail shape bench_scaling.py also uses —
    # so the timed replay measures the engine (parse → winner agg →
    # MERGE), not the synthetic generator's arithmetic. Warm first
    # (codegen/JIT compile is not sustained throughput), then measure a
    # 4-epoch replay of the full log.
    def cdc_throughput() -> None:
        base = tempfile.mkdtemp(prefix="bench_cdc_", dir=scratch)
        log_dir = os.path.join(base, "log")
        gen_cdc_log(
            spark, GEN_EVENTS, num_convs=max(1000, GEN_EVENTS // 1000), num_partitions=64
        ).write.mode("overwrite").option("compression", "gzip").json(log_dir)
        log = read_cdc_log(spark, log_dir, fmt="json")
        warm = SnapshotTable.create(
            spark, os.path.join(base, "w"), TRANSCRIPT_SCHEMA,
            key_cols=["conv_id", "turn_idx"], num_buckets=CPUS,
        )
        replay_batch(
            log.filter(f"seq < {GEN_EVENTS // 8}"), warm, epochs=2,
            bounds=(0, GEN_EVENTS // 8 - 1),
        )
        table = SnapshotTable.create(
            spark,
            os.path.join(base, "t"),
            TRANSCRIPT_SCHEMA,
            key_cols=["conv_id", "turn_idx"],
            num_buckets=CPUS,
        )
        t0 = time.perf_counter()
        # the log's LSN range is known — same as a binlog tail
        replay_batch(log, table, epochs=4, bounds=(0, GEN_EVENTS - 1))
        dt = time.perf_counter() - t0
        extra["cdc_events_per_sec"] = round(GEN_EVENTS / dt, 1)

    timed("cdc_replay_throughput", cdc_throughput)

    # --- events-derived replay (the correctness-gate path) at this sf
    def cdc_events_replay() -> None:
        base = tempfile.mkdtemp(prefix="bench_cdc_ev_", dir=scratch)
        log = derive_cdc_log(spark, SF_DIR)
        table = SnapshotTable.create(
            spark,
            os.path.join(base, "t"),
            TRANSCRIPT_SCHEMA,
            key_cols=["conv_id", "turn_idx"],
            num_buckets=16,
        )
        replay_batch(log, table, epochs=4)
        table.read().count()

    timed("cdc_events_replay", cdc_events_replay)

    # --- derived graph via grouped-map Arrow UDF over the final state
    def graph_edges() -> None:
        state = E.q_cdc_final_state(spark, SF_DIR)
        build_conv_edges_arrow(state).count()

    timed("graph_edges_arrow", graph_edges)

    # --- relational headliners
    timed("tpch_q1_pricing", lambda: E.q_tpch_q1_pricing(spark, SF_DIR).collect())
    timed("tpch_q3_top10", lambda: E.q_tpch_q3_top10(spark, SF_DIR).collect())
    timed("window_top3_orders", lambda: E.q_window_top3_orders(spark, SF_DIR).count())

    # --- training-data pipeline ops
    timed(
        "dedup_minhash_lsh",
        lambda: minhash_lsh_pairs(
            spark.read.parquet(f"{SF_DIR}/documents.parquet"), threshold=0.5
        ).count(),
    )
    timed("text_profile", lambda: E.q_text_profile(spark, SF_DIR).count())
    timed("sim_cosine_topk", lambda: E.q_sim_cosine_topk(spark, SF_DIR).count())

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline suite wall time (flagship: CDC replay -> MERGE)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                **extra,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
