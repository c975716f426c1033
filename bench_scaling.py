"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

The rule requires ≥0.8 throughput scaling efficiency from N to 4N
executors. No real cluster exists in this sandbox, so the same job runs
at two parallelism levels — local[8] and local[32] — on the SAME
deterministic input (seeded generator, no wall-clock), and efficiency is

    eff = (events_per_sec_4N / events_per_sec_N) / 4

Each level runs in its own subprocess: the JVM is a process singleton,
so a fresh process is the only clean way to change `master`.

Usage:  python bench_scaling.py [num_events]   (default 2_000_000)
Prints one JSON line and (with --write-md) refreshes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = """
import json, os, sys, tempfile, time
sys.path.insert(0, {repo!r})
from sql_graph_visualizer_spark.session import get_spark
from sql_graph_visualizer_spark.lake.snapshot_table import SnapshotTable
from sql_graph_visualizer_spark.sources.cdc_gen import gen_cdc_log
from sql_graph_visualizer_spark.sources.events_cdc import TRANSCRIPT_SCHEMA
from sql_graph_visualizer_spark.streaming.replay import replay_batch

cores = {cores}
events = {events}
spark = get_spark(master=f"local[{{cores}}]", shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
base = tempfile.mkdtemp(prefix=f"scale_{{cores}}_")
# identical input at both levels: deterministic, partition-count-invariant
log = gen_cdc_log(spark, events, num_convs=max(1000, events // 1000), num_partitions=64)
log.count()  # materialize source listing outside the timed region
table = SnapshotTable.create(spark, os.path.join(base, "t"), TRANSCRIPT_SCHEMA,
                             key_cols=["conv_id", "turn_idx"], num_buckets=cores)
t0 = time.perf_counter()
stats = replay_batch(log, table, epochs=4)
dt = time.perf_counter() - t0
rows = table.read().count()
print(json.dumps({{"cores": cores, "events": events, "sec": round(dt, 3),
                   "events_per_sec": round(events / dt, 1), "final_rows": rows}}))
spark.stop()
"""


def run_level(cores: int, events: int) -> dict:
    repo = os.path.dirname(os.path.abspath(__file__))
    code = CHILD.format(repo=repo, cores=cores, events=events)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    events = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 2_000_000
    n = run_level(8, events)
    n4 = run_level(32, events)
    assert n["final_rows"] == n4["final_rows"], "scale levels disagree on final state!"
    eff = (n4["events_per_sec"] / n["events_per_sec"]) / 4
    result = {
        "metric": "CDC replay throughput scaling (local[8] -> local[32])",
        "events": events,
        "n": n,
        "n4": n4,
        "scaling_efficiency": round(eff, 3),
        "final_rows_equal": True,
    }
    print(json.dumps(result))
    if "--write-md" in sys.argv:
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "w") as f:
            f.write(
                "# Scaling evidence — CDC replay at two parallelism levels\n\n"
                "North rule: throughput scaling efficiency >= 0.8 from N to 4N\n"
                "executors; evidenced in-sandbox by the same deterministic job at\n"
                "local[8] vs local[32] (same input, same code, fresh JVM each).\n\n"
                f"- events replayed: {events:,} (seeded generator, 4 MERGE epochs)\n"
                f"- local[8]:  {n['sec']} s -> {n['events_per_sec']:,} events/s\n"
                f"- local[32]: {n4['sec']} s -> {n4['events_per_sec']:,} events/s\n"
                f"- throughput ratio 4N/N: {n4['events_per_sec'] / n['events_per_sec']:.2f}x\n"
                f"- **scaling efficiency: {eff:.3f}**\n"
                f"- final table rows equal at both levels: {n['final_rows']:,}\n\n"
                "Reproduce: `python bench_scaling.py 2000000 --write-md`\n"
            )


if __name__ == "__main__":
    main()
