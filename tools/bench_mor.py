"""Merge-on-read vs copy-on-write write-amplification evidence.

The 100 TB failure mode (round-3 verdict, top item): once an epoch's
keys spread across every bucket, copy-on-write rewrites the whole table
per epoch. This harness builds a base table, then applies epochs of
small all-bucket-scattered updates under each mode and reports per-epoch
wall time + data bytes written, plus the MoR read-overhead before/after
background compaction. Run: ``python tools/bench_mor.py [base_events]``.
Prints one JSON line; results are curated into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sql_graph_visualizer_spark.lake.snapshot_table import SnapshotTable
from sql_graph_visualizer_spark.session import get_spark
from sql_graph_visualizer_spark.sources.cdc_gen import gen_cdc_log
from sql_graph_visualizer_spark.sources.events_cdc import TRANSCRIPT_SCHEMA

BASE_EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
NUM_CONVS = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
# updated conversations per epoch — FIXED while the table grows, so the
# write-amplification ratio scales with table size (the 100 TB shape)
UPDATE_KEYS = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
EPOCHS = 4
SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else None


def main() -> None:
    scratch = tempfile.mkdtemp(prefix="bench_mor_", dir=SCRATCH)
    spark = get_spark(
        master="local[32]", shuffle_partitions=32,
        extra_conf={"spark.local.dir": os.path.join(scratch, "sl")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # incompressible wide payloads so bytes measure data, not parquet floors
    base = gen_cdc_log(spark, BASE_EVENTS, num_convs=NUM_CONVS, turns_per_conv=10).withColumn(
        "text",
        F.concat(*[F.md5(F.concat_ws(":", "conv_id", "turn_idx", "seq", F.lit(str(i))))
                   for i in range(8)]),
    )
    base.write.mode("overwrite").parquet(os.path.join(scratch, "base"))
    base = spark.read.parquet(os.path.join(scratch, "base"))
    # one small update per sampled conversation -> every bucket touched
    # per epoch (deterministic sample; fixed size as the table grows)
    updates = (
        base.groupBy("conv_id")
        .agg(F.max("seq").alias("seq0"), F.first("turn_idx").alias("turn_idx"))
        .orderBy("conv_id")
        .limit(UPDATE_KEYS)
        .withColumn("role", F.lit("user"))
        .withColumn("tool", F.lit(None).cast("string"))
        .withColumn("ts", F.lit(None).cast("timestamp"))
    )
    updates.write.mode("overwrite").parquet(os.path.join(scratch, "upd"))
    updates = spark.read.parquet(os.path.join(scratch, "upd"))

    out: dict = {
        "base_events": BASE_EVENTS,
        "num_convs": NUM_CONVS,
        "update_keys": UPDATE_KEYS,
        "epochs": EPOCHS,
    }
    for mode in ("cow", "mor"):
        t = SnapshotTable.create(
            spark, os.path.join(scratch, f"t_{mode}"), TRANSCRIPT_SCHEMA,
            key_cols=["conv_id", "turn_idx"], num_buckets=64,
        )
        st0 = t.merge_upsert(base, epoch_id=0, query_id="q")
        table_bytes = t.size_stats()["total_bytes"]
        epochs = []
        for e in range(1, EPOCHS + 1):
            batch = updates.select(
                "conv_id", "turn_idx", "role", "tool", "ts",
                (F.col("seq0") + e * 10_000_000).alias("seq"),
                F.lit("update").alias("op"),
                F.md5(F.concat_ws(":", "conv_id", F.lit(str(e)))).alias("text"),
            )
            t0 = time.perf_counter()
            st = t.merge_upsert(batch, epoch_id=e, query_id="q", mode=mode)
            epochs.append(
                {
                    "sec": round(time.perf_counter() - t0, 2),
                    "bytes_written": st.bytes_written,
                    "buckets": st.buckets_touched,
                }
            )
        t0 = time.perf_counter()
        n = t.read().count()
        read_sec = round(time.perf_counter() - t0, 2)
        entry = {
            "base_bytes": table_bytes,
            "base_merge_sec": round(st0.duration_ms / 1000, 2),
            "epochs": epochs,
            "read_sec_with_state": read_sec,
            "rows": n,
        }
        if mode == "mor":
            t0 = time.perf_counter()
            t.compact_deltas()
            entry["compact_sec"] = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            assert t.read().count() == n
            entry["read_sec_after_compact"] = round(time.perf_counter() - t0, 2)
        out[mode] = entry
    cow_b = sum(e["bytes_written"] for e in out["cow"]["epochs"])
    mor_b = sum(e["bytes_written"] for e in out["mor"]["epochs"])
    out["write_amplification_cow_over_mor"] = round(cow_b / max(1, mor_b), 1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
