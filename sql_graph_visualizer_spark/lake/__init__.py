"""Lake layer: snapshot-transactional tables with MERGE upsert + epoch fencing."""

from sql_graph_visualizer_spark.lake.snapshot_table import SnapshotTable  # noqa: F401
