"""Decompose one flagship epoch's write job into phases (guide §1):
survivors scan+filter, staged union + LWW sort-compact, bucket write,
existing read — plus log re-scan strategies (raw gzip JSON, SQL cache,
parquet respill). Child topology = bench.py's local-cluster[8,4]."""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENTS = int(os.environ.get("SPARK_GRAFT_XBENCH_EVENTS", "8000000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

CODE = f"""
import json, os, sys, time, tempfile
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
from pyspark.sql import functions as F
from sql_graph_visualizer_spark.session import get_spark
from sql_graph_visualizer_spark.lake.snapshot_table import SnapshotTable
from sql_graph_visualizer_spark.operators.compaction import compact_lww
from sql_graph_visualizer_spark.sources.cdc_gen import gen_cdc_log, read_cdc_log
from sql_graph_visualizer_spark.sources.events_cdc import TRANSCRIPT_SCHEMA
from sql_graph_visualizer_spark.streaming.replay import replay_batch

events = {EVENTS}
scratch = tempfile.mkdtemp(prefix="probe_merge_", dir="/dev/shm")
spark = get_spark(master="local-cluster[{max(1, CPUS // 4)},4,6144]",
                  shuffle_partitions=64,
                  extra_conf={{"spark.local.dir": os.path.join(scratch, "spark-local")}})
spark.sparkContext.setLogLevel("ERROR")
log_dir = os.path.join(scratch, "log")
gen_cdc_log(spark, events, num_convs=10_000, num_partitions=256) \\
    .write.mode("overwrite").option("compression", "gzip").json(log_dir)
log = read_cdc_log(spark, log_dir, fmt="json")

res = {{}}
def t(name, fn, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    res[name] = round(best, 3)
    print(f"  {{name}}: {{res[name]}}", file=sys.stderr)

def noop(df):
    df.write.format("noop").mode("overwrite").save()

# epoch-2-like state: replay first half into a table (persist_log off to
# keep this probe independent), then measure epoch phases on 3rd quarter
table = SnapshotTable.create(spark, os.path.join(scratch, "t"), TRANSCRIPT_SCHEMA,
                             key_cols=["conv_id", "turn_idx"], num_buckets=64)
replay_batch(log.filter(f"seq < {{events//2}}"), table, epochs=2,
             bounds=(0, events//2 - 1), persist_log=False)

chunk = log.filter((F.col("seq") >= events//2) & (F.col("seq") < 3*events//4))

# --- phase probes
prep = table.merge_prepare(chunk)
t("prepare(scan+agg+collect)", lambda: table.merge_prepare(chunk).winners.unpersist(), reps=1)

winners = prep.winners
seqs = winners.select("seq")
m = table.manifest()
surv = chunk.join(F.broadcast(seqs), on="seq", how="left_semi")
t("survivors scan (parse+bcast semi)", lambda: noop(surv))
existing = table.read(buckets=prep.affected, manifest=m, system=True)
t("existing read", lambda: noop(existing))
ex_ev = existing.select(*[f.name for f in TRANSCRIPT_SCHEMA.fields],
                        F.col("_seq").alias("seq"),
                        F.when(F.col("_deleted"), F.lit("delete")).otherwise(F.lit("update")).alias("op"))
staged = ex_ev.unionByName(surv.select(*[f.name for f in TRANSCRIPT_SCHEMA.fields], "seq", "op"))
folded = compact_lww(staged, ("conv_id", "turn_idx"), "seq", broadcast_winner_seqs="sort")
t("staged union + sort-compact", lambda: noop(folded))
result = folded.select(*[f.name for f in TRANSCRIPT_SCHEMA.fields],
                       F.col("seq").cast("long").alias("_seq"),
                       (F.col("op") == "delete").alias("_deleted"))
def wr():
    table._write_data(result, m)
t("full write (_write_data)", wr)

# --- log re-scan strategies
t("rescan raw full", lambda: noop(log))
t("rescan raw pruned4", lambda: noop(log.select("seq","op","conv_id","turn_idx")))
lp = log.persist()
t("cache build (noop full)", lambda: noop(lp), reps=1)
t("cache rescan full", lambda: noop(lp))
t("cache rescan pruned4", lambda: noop(lp.select("seq","op","conv_id","turn_idx")))
lp.unpersist()
pq = os.path.join(scratch, "respill")
t("parquet respill write", lambda: log.write.mode("overwrite").parquet(pq), reps=1)
pqdf = spark.read.parquet(pq)
t("parquet rescan full", lambda: noop(pqdf))
t("parquet rescan pruned4", lambda: noop(pqdf.select("seq","op","conv_id","turn_idx")))
winners.unpersist()
print(json.dumps(res))
spark.stop()
"""

import subprocess

out = subprocess.run([sys.executable, "-c", CODE], capture_output=True, text=True, timeout=1800)
sys.stderr.write(out.stderr[-4000:] + "\n")
print(out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "NO OUTPUT")
