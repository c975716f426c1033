"""Streaming corpus ingest with online near-duplicate detection.

Ties the incremental MinHash index
(:class:`~sql_graph_visualizer_spark.operators.dedup_index.MinHashIndex`)
into Structured Streaming the same way ``replay_stream`` ties in the
transcripts table: documents arrive as files, each micro-batch is
probed against the index state BEFORE the batch and then indexed, and
the probe's matches are MERGEd into a second lake table — so the
dedup *decisions* are themselves queryable, time-travelable, and
exactly-once.

Two tables, two epoch fences, one crash window: the index commit and
the matches commit are separate transactions, so a crash between them
re-delivers an epoch whose index write is fenced (skipped) but whose
matches were never recorded. ``MinHashIndex.add_batch`` returns empty
matches for a fenced epoch (re-probing AFTER the batch was indexed
would re-report every batch document against itself and its own batch
siblings), so the matches cannot be taken from the live probe — they
are recomputed against the index snapshot the ORIGINAL commit saw:
the manifest summary records each commit's epoch id, the summary walk
finds that version, and the probe runs against its parent (the
pre-batch state), exactly the RollupSync crash-recovery discipline
(``streaming/rollup.py``). Requires the snapshot to still be retained
— ``expire_snapshots(keep_last=...)`` must cover the stream's
re-delivery horizon, same caveat as the rollup.

At scale the per-epoch cost is the index probe's (batch text shingled
once, corpus signatures never shuffle — see ``dedup_index``) plus two
∝-batch merges; nothing in the loop scans the corpus or the
accumulated matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sql_graph_visualizer_spark.lake.snapshot_table import MergeStats, SnapshotTable
from sql_graph_visualizer_spark.operators.dedup_index import MinHashIndex

DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)

MATCH_SCHEMA = T.StructType(
    [
        T.StructField("new_id", T.LongType(), False),
        T.StructField("match_id", T.LongType(), False),
        T.StructField("est_jaccard", T.DoubleType(), True),
    ]
)


class DedupIngest:
    """Probe-then-index one document micro-batch into ``index``, and
    record the near-dup matches in a ``matches`` SnapshotTable keyed by
    ``(new_id, match_id)``.

    ``process`` is the ``foreachBatch`` body; it is also directly
    callable for batch-mode ingest. Returns ``(index_stats,
    matches_stats)``.
    """

    def __init__(
        self,
        spark: SparkSession,
        index: MinHashIndex,
        matches_path: str,
        threshold: float = 0.7,
        num_buckets: int = 16,
        query_id: str = "dedup-ingest",
    ):
        self.spark = spark
        self.index = index
        self.threshold = threshold
        self.query_id = query_id
        if SnapshotTable.exists(matches_path):
            self.matches = SnapshotTable(spark, matches_path)
        else:
            self.matches = SnapshotTable.create(
                spark,
                matches_path,
                MATCH_SCHEMA,
                key_cols=["new_id", "match_id"],
                num_buckets=num_buckets,
            )

    def _find_epoch_version(self, epoch_id: int) -> int | None:
        """Index-table snapshot version of the commit that carried this
        epoch (manifest summaries record it), newest first."""
        t = self.index.table
        for v in reversed(t.versions()):
            s = t.manifest(v).get("summary", {})
            if (
                s.get("operation") == "merge"
                and s.get("epoch") == epoch_id
                and s.get("query_id") == self.query_id
            ):
                return int(v)
        return None

    def _empty_matches(self) -> DataFrame:
        return self.spark.createDataFrame([], MATCH_SCHEMA)

    def process(self, batch: DataFrame, epoch_id: int) -> tuple[MergeStats, MergeStats]:
        epoch_id = int(epoch_id)
        matches, st = self.index.add_batch(
            batch,
            epoch_id=epoch_id,
            query_id=self.query_id,
            threshold=self.threshold,
        )
        seq = int(st.snapshot_version)
        if st.skipped:
            # crash-recovery window: the INDEX epoch already committed but
            # the matches epoch may not have. The live probe is useless
            # now (the batch is already indexed), so recompute it against
            # the pre-batch snapshot of the original commit.
            found = self._find_epoch_version(epoch_id)
            parent = (
                self.index.table.manifest(found).get("parent") if found is not None else None
            )
            if found is None:
                # original snapshot expired → can only fence this epoch
                # in the matches table (if it already committed there,
                # this is the normal duplicate-delivery no-op)
                matches = self._empty_matches()
            else:
                seq = int(found)
                if parent is None:
                    matches = self._empty_matches()  # epoch 0: empty index
                else:
                    sigs = self.index.signatures(batch)
                    matches = self.index._probe_sigs(sigs, version=int(parent)).filter(
                        F.col("est_jaccard") >= self.threshold
                    )
        # seq = the index snapshot version (monotone in application
        # order): under out-of-order re-delivery a later-applied epoch
        # observed newer index state and must win LWW
        events = matches.select(
            "new_id",
            "match_id",
            "est_jaccard",
            F.lit("update").alias("op"),
            F.lit(seq).cast("long").alias("seq"),
        )
        mst = self.matches.merge_upsert(
            events, epoch_id=epoch_id, query_id=self.query_id + "-matches"
        )
        return st, mst

    def read(self) -> DataFrame:
        return self.matches.read()


def dedup_ingest_stream(
    spark: SparkSession,
    doc_dir: str,
    ingest: DedupIngest,
    checkpoint_dir: str,
    fmt: str = "json",
    schema: T.StructType = DOC_STREAM_SCHEMA,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    processing_time: str | None = None,
):
    """Drive ``ingest`` from a file-backed document stream.

    Bounded mode (default): drains the directory, returns
    ``list[(index_stats, matches_stats)]``. Sustained mode: returns the
    live ``StreamingQuery`` (stats fill on its ``ingest_stats``
    attribute); the caller stops it."""
    stats: list[tuple[MergeStats, MergeStats]] = []

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        stats.append(ingest.process(batch, int(epoch_id)))

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.format(fmt).load(doc_dir)
    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer.trigger(availableNow=True).start().awaitTermination()
        return stats
    if processing_time:
        writer = writer.trigger(processingTime=processing_time)
    query = writer.start()
    setattr(query, "ingest_stats", stats)
    return query
