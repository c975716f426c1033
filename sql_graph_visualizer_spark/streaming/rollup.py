"""Continuous aggregate (hypertable-rollup analogue): an incrementally
maintained time-bucketed rollup of the transcript state.

The reference recomputes its per-tick metrics from scratch every poll
(``realtime_performance_monitor.go:370-419``). At 10^10 events a
recompute-per-epoch of "turns per hour" scans the world; the continuous
aggregate instead applies **retraction deltas**: for the conversations an
epoch touched, read their rows BEFORE the merge (snapshot time travel to
the merge's parent version — both reads bucket-pruned) and AFTER, count
each slice per time bucket, and add (after − before) into the rollup
table through the same epoch-fenced LWW MERGE the data uses — so the
rollup inherits exactly-once semantics and crash-replay idempotence.
Work per epoch ∝ touched conversations + touched buckets of the rollup,
never state size. This is textbook incremental materialized-view
maintenance (TimescaleDB continuous aggregates / Materialize-style
retractions) restated on Spark + the snapshot table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sql_graph_visualizer_spark.lake.snapshot_table import MergeStats, SnapshotTable

ROLLUP_SCHEMA = T.StructType(
    [
        T.StructField("bucket_start", T.TimestampType()),
        T.StructField("n_turns", T.LongType()),
    ]
)


class RollupSync:
    """Maintains ``n_turns per time bucket`` over the transcript state.

    Wire ``sync`` after each ``merge_upsert`` (same contract as
    GraphSync). ``bucket``: any ``date_trunc`` unit (hour/day/...)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        transcripts: SnapshotTable,
        bucket: str = "hour",
        num_buckets: int = 8,
        source_query_id: str | None = None,
    ):
        self.spark = spark
        self.transcripts = transcripts
        self.bucket = bucket
        # the transcript WRITER's query_id: crash-recovery looks up the
        # snapshot that carried an epoch by manifest summary, and on a
        # table written by several queries an epoch number alone is
        # ambiguous — summaries record (query_id, epoch), so matching
        # both picks the right writer's commit
        self.source_query_id = source_query_id
        if SnapshotTable.exists(path):
            self.table = SnapshotTable(spark, path)
        else:
            self.table = SnapshotTable.create(
                spark,
                path,
                ROLLUP_SCHEMA,
                key_cols=["bucket_start"],
                num_buckets=num_buckets,
            )

    def _find_epoch_version(self, epoch_id: int) -> int | None:
        """Snapshot version of the transcript commit that carried this
        epoch (manifest summaries record it), newest first."""
        for v in reversed(self.transcripts.versions()):
            s = self.transcripts.manifest(v).get("summary", {})
            if (
                s.get("operation") == "merge"
                and s.get("epoch") == epoch_id
                and (
                    self.source_query_id is None
                    or s.get("query_id") == self.source_query_id
                )
            ):
                return int(v)
        return None

    def _counts(self, state: DataFrame) -> DataFrame:
        return (
            state.filter(F.col("ts").isNotNull())
            .groupBy(F.date_trunc(self.bucket, F.col("ts")).alias("bucket_start"))
            .agg(F.count("*").alias("n"))
        )

    def sync(self, batch: DataFrame, epoch_id: int, st: MergeStats) -> MergeStats:
        """Apply the epoch's retraction delta to the rollup."""
        touched = batch.select("conv_id").distinct().persist()
        try:
            version = int(st.snapshot_version)
            if st.skipped:
                # crash-recovery window: the DATA epoch already committed
                # (fenced skip) but this rollup epoch may not have — the
                # delta must be computed against the snapshot pair of the
                # ORIGINAL commit, found by its epoch id in the manifest
                # summaries (requires that snapshot to still be retained;
                # expire_snapshots keep_last must cover the replay
                # re-delivery horizon)
                found = self._find_epoch_version(int(st.epoch_id))
                if found is None:
                    # original snapshot expired -> can only fence this
                    # epoch (if the rollup already committed it, this is
                    # the normal duplicate-delivery no-op)
                    empty = self.spark.createDataFrame(
                        [], "bucket_start timestamp, n_turns long, op string, seq long"
                    )
                    return self.table.merge_upsert(
                        empty, epoch_id=int(epoch_id), query_id="rollup-sync"
                    )
                version = found
            parent = self.transcripts.manifest(version).get("parent")

            def slice_at(v):
                if v is None:
                    return self.spark.createDataFrame([], self.transcripts.schema())
                # bucket ids must come from THIS version's manifest: the
                # before/after snapshots can straddle a rebucket
                # migration, where the two layouts share no bucket
                # numbering (and resolving the spec separately from the
                # read races a concurrent migration)
                vm = self.transcripts.manifest(int(v))
                vb = touched.agg(
                    F.collect_set(
                        self.transcripts.bucket_id("conv_id", manifest=vm)
                    ).alias("vb")
                ).collect()[0]
                return self.transcripts.read(
                    version=int(v), buckets=sorted(int(x) for x in vb["vb"])
                ).join(F.broadcast(touched), on="conv_id", how="left_semi")

            after = self._counts(slice_at(version)).withColumnRenamed("n", "n_after")
            before = self._counts(slice_at(parent)).withColumnRenamed("n", "n_before")
            delta = (
                after.join(before, on="bucket_start", how="full_outer")
                .select(
                    "bucket_start",
                    (F.coalesce("n_after", F.lit(0)) - F.coalesce("n_before", F.lit(0))).alias(
                        "delta"
                    ),
                )
                .filter(F.col("delta") != 0)
            )
            # additive apply: current rollup rows for the touched time
            # buckets (bucket-pruned) + delta -> new totals, MERGEd with
            # LWW replace; zero totals become tombstones so the rollup
            # never accretes dead buckets
            rm = self.table.manifest()  # one resolution for ids AND read
            rb = delta.agg(
                F.collect_set(self.table.bucket_id("bucket_start", manifest=rm)).alias("bs")
            ).collect()[0]
            r_buckets = sorted(int(x) for x in rb["bs"])
            current = self.table.read(buckets=r_buckets, manifest=rm).join(
                F.broadcast(delta.select("bucket_start")), on="bucket_start", how="left_semi"
            )
            merged = (
                delta.join(current, on="bucket_start", how="left_outer")
                .select(
                    "bucket_start",
                    (F.coalesce("n_turns", F.lit(0)) + F.col("delta")).alias("n_turns"),
                )
            )
            events = merged.select(
                "bucket_start",
                "n_turns",
                F.when(F.col("n_turns") <= 0, F.lit("delete")).otherwise(F.lit("update")).alias("op"),
                F.lit(version).cast("long").alias("seq"),
            )
            return self.table.merge_upsert(events, epoch_id=int(epoch_id), query_id="rollup-sync")
        finally:
            touched.unpersist()

    def read(self) -> DataFrame:
        return self.table.read()
