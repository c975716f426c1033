"""sql_graph_visualizer_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of
peter7775/sql-graph-visualizer (reference at /root/reference, Go) as an
idiomatic Spark engine:

- binlog/WAL-style change-event replay (insert/update/delete on
  conversation turns) with Structured Streaming,
- key-partitioned MERGE upserts on ``(conv_id, turn_idx)`` into
  snapshot-transactional lake tables (Iceberg when the runtime jar is on
  the classpath; a self-contained parquet snapshot format otherwise),
- exactly-once sinks via epoch-id commit fencing recorded atomically in
  the table commit,
- schema evolution (added columns, int widening) via a merge-schema
  resolver,
- explicit salted repartitioning for hot-conversation skew,
- the reference's signature row→graph mapping (conv→turn ``HAS_TURN``
  edges, turn→tool ``USES_TOOL`` edges) as derived node/edge DataFrames,
- per-epoch lineage/metrics checkpoints.

Everything is DataFrame/SQL-first; Python appears only in vectorized
pandas/Arrow UDFs (grouped-map graph shaping), never per-row.
"""

__version__ = "0.1.0"

from sql_graph_visualizer_spark.session import get_spark  # noqa: F401
