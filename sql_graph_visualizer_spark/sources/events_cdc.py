"""Derive a deterministic CDC change log from the driver's `events` table.

The engine's own generator (``sources/cdc_gen.py``) uses xxhash64-derived
randomness that an external SQL oracle cannot reproduce. For the driver's
DuckDB correctness gate (``__spark_entry__.py``), this module instead
derives a binlog-style change log **arithmetically** from the
``events(event_id, ts, user_id, event_type, value, props)`` testdata
table — every derivation is plain integer/string SQL with identical
semantics in Spark and DuckDB, so the oracle can rebuild the exact same
log and independently compute the final table state.

Shape per FIXTURES.md §2: ``seq, op, conv_id, turn_idx, role, text,
tool, ts`` (+ ``model, schema_ver`` for the evolution variant).

Reference analogue: the poll-loop change source (SURVEY §2.1 S14,
``internal/application/services/performance/performance_schema_adapter.go:212-301``)
re-expressed over the sandbox's event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# payload schema of the target transcripts table (BASELINE input_hint)
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

TRANSCRIPT_SCHEMA_V2 = T.StructType(
    list(TRANSCRIPT_SCHEMA.fields) + [T.StructField("model", T.StringType())]
)

NUM_CONVS = 100
NUM_TURNS = 30


def derive_cdc_log(
    spark: SparkSession, sf_dir: str, with_model: bool = False
) -> DataFrame:
    """events → change log (insert/update/delete on (conv_id, turn_idx)).

    - ``seq``        = event_id (the LSN; globally unique, monotone)
    - ``op``         = delete if seq%10==0, insert if seq%10 in 1..3, else update
    - ``conv_id``    = 'conv-' || lpad(user_id % 100, 4, '0')  (hot-key reuse)
    - ``turn_idx``   = seq % 30  → ~3-4 versions per key: real LWW work
    - ``role``       = (seq % 4) → user/assistant/system/tool
    - ``tool``       = event_type when role='tool'
    - ``text``       = reconstructible string incl. seq (the winning version
                       is observable — the per-turn text-equality invariant)
    - deletes carry NULL payload (tombstones)
    - ``with_model``: events in the upper half of the seq range carry a
      ``model`` column (schema_ver=2) — the schema-evolution segment.
    """
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    seq = F.col("event_id").cast("long")
    m = seq % 10
    op = (
        F.when(m == 0, F.lit("delete")).when(m <= 3, F.lit("insert")).otherwise(F.lit("update"))
    )
    conv_id = F.concat(F.lit("conv-"), F.lpad((F.col("user_id") % NUM_CONVS).cast("string"), 4, "0"))
    turn_idx = (seq % NUM_TURNS).cast("int")
    role0 = (
        F.when(seq % 4 == 0, F.lit("user"))
        .when(seq % 4 == 1, F.lit("assistant"))
        .when(seq % 4 == 2, F.lit("system"))
        .otherwise(F.lit("tool"))
    )
    text0 = F.concat(
        F.lit("turn "),
        turn_idx.cast("string"),
        F.lit(" of "),
        conv_id,
        F.lit(" v"),
        seq.cast("string"),
        F.lit(" "),
        F.col("props"),
    )
    is_del = op == "delete"
    out = ev.select(
        seq.alias("seq"),
        op.alias("op"),
        conv_id.alias("conv_id"),
        turn_idx.alias("turn_idx"),
        F.when(~is_del, role0).alias("role"),
        F.when(~is_del, text0).alias("text"),
        F.when(~is_del & (role0 == "tool"), F.col("event_type")).alias("tool"),
        # parquet TIMESTAMP(isAdjustedToUTC=false) reads as TIMESTAMP_NTZ in
        # Spark 4; the table schema (input_hint) is TimestampType — cast is
        # value-preserving under the engine's fixed UTC session timezone
        F.col("ts").cast("timestamp").alias("ts"),
    )
    if with_model:
        half = _model_from_seq(spark, sf_dir)
        out = out.withColumn(
            "model",
            F.when(
                (F.col("seq") >= half) & (F.col("op") != "delete"),
                F.concat(F.lit("model-"), (F.col("seq") % 3).cast("string")),
            ),
        ).withColumn(
            "schema_ver", F.when(F.col("seq") >= half, F.lit(2)).otherwise(F.lit(1))
        )
    return out


def _model_from_seq(spark: SparkSession, sf_dir: str) -> int:
    """seq threshold where the evolved `model` column appears: half the
    log (computed from data so every sf works). Pure integer arithmetic —
    ``(hi + 1) // 2`` — so the oracle's DuckDB expression is identical;
    float*0.5 would truncate here but round half-away-from-zero in a
    DuckDB CAST whenever ``hi`` is even."""
    hi = spark.read.parquet(f"{sf_dir}/events.parquet").agg(F.max("event_id")).collect()[0][0]
    return (int(hi) + 1) // 2


# --------------------------------------------------------------- oracle SQL

# the same derivation as ANSI SQL over the pre-registered `events` view —
# DuckDB rebuilds the identical log and computes final state independently.
CDC_LOG_CTE = """
log0 AS (
  SELECT
    CAST(event_id AS BIGINT) AS seq,
    CASE WHEN event_id % 10 = 0 THEN 'delete'
         WHEN event_id % 10 <= 3 THEN 'insert'
         ELSE 'update' END AS op,
    'conv-' || lpad(CAST(user_id % 100 AS VARCHAR), 4, '0') AS conv_id,
    CAST(event_id % 30 AS INTEGER) AS turn_idx,
    CASE CAST(event_id % 4 AS INTEGER)
         WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
         WHEN 2 THEN 'system' ELSE 'tool' END AS role0,
    event_type, props, ts
  FROM events
),
cdc AS (
  SELECT seq, op, conv_id, turn_idx,
    CASE WHEN op = 'delete' THEN NULL ELSE role0 END AS role,
    CASE WHEN op = 'delete' THEN NULL
         ELSE 'turn ' || CAST(turn_idx AS VARCHAR) || ' of ' || conv_id
              || ' v' || CAST(seq AS VARCHAR) || ' ' || props END AS text,
    CASE WHEN op = 'delete' OR role0 <> 'tool' THEN NULL ELSE event_type END AS tool,
    ts
  FROM log0
)
"""

# LWW winners per key (the MERGE oracle): max-seq event decides
CDC_WINNERS_CTE = (
    CDC_LOG_CTE
    + """,
winners AS (
  SELECT * FROM cdc
  QUALIFY row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) = 1
)
"""
)

FINAL_STATE_SQL = (
    "WITH "
    + CDC_WINNERS_CTE
    + """
SELECT conv_id, turn_idx, role, text, tool, ts
FROM winners WHERE op <> 'delete'
"""
)

# evolution variant: same winners, plus the evolved `model` column whose
# values exist only for events in the upper half of the seq range
FINAL_STATE_MODEL_SQL = (
    "WITH "
    + CDC_WINNERS_CTE
    + """,
half AS (SELECT (max(event_id) + 1) // 2 AS h FROM events)
SELECT w.conv_id, w.turn_idx, w.role, w.text, w.tool, w.ts,
       CASE WHEN w.seq >= half.h AND w.op <> 'delete'
            THEN 'model-' || CAST(w.seq % 3 AS VARCHAR) END AS model
FROM winners w, half WHERE w.op <> 'delete'
"""
)
