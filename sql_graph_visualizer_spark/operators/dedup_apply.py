"""Apply near-dup survivor decisions to the corpus — the close-the-loop
MERGE of the dedup pipeline.

The indexes (``operators/dedup_index.py``) and the streaming ingest
(``streaming/dedup_stream.py``) *record* near-dup matches; the component
pass (``operators/dedup.py::dedup_canonical``) *decides* which document
per duplicate cluster survives. This operator performs the final arc: an
exactly-once MERGE that tombstones the losers out of the corpus
:class:`~sql_graph_visualizer_spark.lake.snapshot_table.SnapshotTable`.
Reference analogue: the delete-then-create upsert loop that closes the
reference's own ingest cycle (``simple_metrics_injector.go:170-213``) —
here the DELETE arm of the same MERGE the rest of the engine uses, so
the decision rides epoch fencing, LWW ordering, time travel and
tombstone-watermark safety like every other write.

Scale notes (the 100 TB design point):

- the connected-components pass runs on the PAIR GRAPH, never the
  corpus: near-dup pairs are a tiny fraction of corpus rows (a corpus
  that is mostly duplicates of itself has bigger problems than this
  operator), and each component round shuffles only fixed-width
  ``(long, long)`` label rows. The full-pair-graph recompute per epoch
  is deliberate: a new pair can bridge two arbitrarily old components,
  so "incremental" component maintenance still has to walk the merged
  component's whole membership — the global pass costs the same
  O(|pairs|)-per-round and is simpler to prove correct. What IS
  incremental is the write: deletes are restricted to components
  touched by this epoch's documents (``touched_ids``), so corpus bucket
  rewrites stay proportional to the epoch's blast radius, not the
  accumulated pair graph.
- decisions are MONOTONE: pairs only accumulate, components only merge,
  and the survivor (min id) per component only decreases — so a doc
  tombstoned as a loser can never silently need resurrection. (The one
  exception — a re-ingested UPDATED document whose stale pairs are
  retired — re-enters through the normal ingest path with a higher LSN
  and is re-evaluated from scratch; see ``DedupIngest``.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sql_graph_visualizer_spark.lake.snapshot_table import MergeStats, SnapshotTable
from sql_graph_visualizer_spark.operators.dedup import connected_components


def survivor_decisions(
    pairs: DataFrame,
    a_col: str = "new_id",
    b_col: str = "match_id",
    algorithm: str = "hashmin",
    valid_ids: DataFrame | None = None,
) -> DataFrame:
    """``(id, component, keep)`` for every id in the pair graph.

    ``keep`` is the component's survivor: the min id, restricted to
    ``valid_ids`` when given (same orphan-pair guard as
    ``dedup_canonical`` — a pair referencing an id that was never a
    corpus document must not be able to out-rank every real document
    and delete a whole cluster)."""
    comp = connected_components(pairs, a_col=a_col, b_col=b_col, algorithm=algorithm)
    ranked = comp
    if valid_ids is not None:
        vids = valid_ids.select(F.col(valid_ids.columns[0]).alias("id")).distinct()
        ranked = comp.join(vids, "id", "left_semi")
    mins = ranked.groupBy("component").agg(F.min("id").alias("keep"))
    return comp.join(mins, "component").select("id", "component", "keep")


def apply_survivors(
    corpus: SnapshotTable,
    pairs: DataFrame,
    seq: int,
    epoch_id: int = -1,
    query_id: str = "dedup-apply",
    id_col: str = "doc_id",
    a_col: str = "new_id",
    b_col: str = "match_id",
    touched_ids: DataFrame | None = None,
    algorithm: str = "hashmin",
    merge_mode: str = "cow",
    validate_ids: bool = True,
) -> MergeStats:
    """Tombstone every non-survivor of the near-dup pair graph out of
    ``corpus`` in ONE exactly-once MERGE.

    - ``pairs``: the full live pair graph (e.g. ``DedupIngest.read()``
      or any ``(a_col, b_col)`` frame).
    - ``seq``: the LSN the delete events carry. Must exceed the ingest
      LSN of every document it may delete, or the corpus LWW keeps the
      doc (by design — a stale decision can never beat fresher data).
    - ``touched_ids``: one-column frame of doc ids; when given, deletes
      are restricted to components containing at least one of them (the
      incremental per-epoch shape — this epoch's batch ids). ``None``
      applies the full decision set (one-shot / backfill shape).
    - ``validate_ids``: guard survivors against orphan pair ids by
      ranking only ids ever ingested into ``corpus`` (one narrow
      key-column scan incl. tombstones). Disable when the caller can
      prove every pair id was corpus-merged (``DedupIngest`` does —
      every indexed doc is corpus-merged in the same ``process`` call).

    Epoch-fenced via ``(query_id, epoch_id)`` like every merge: a
    re-delivered epoch skips the write. Deletes are idempotent under
    LWW, so a crash AFTER this commit but before the driver records
    progress re-derives the same decision set harmlessly.
    """
    valid = (
        corpus.read(system=True).select(F.col(id_col)) if validate_ids else None
    )
    decisions = survivor_decisions(
        pairs, a_col=a_col, b_col=b_col, algorithm=algorithm, valid_ids=valid
    )
    if touched_ids is not None:
        touched = (
            decisions.join(
                touched_ids.select(
                    F.col(touched_ids.columns[0]).alias("id")
                ).distinct(),
                "id",
                "left_semi",
            )
            .select("component")
            .distinct()
        )
        decisions = decisions.join(touched, "component", "left_semi")
    losers = decisions.filter(F.col("id") != F.col("keep"))
    events = losers.select(
        F.col("id").alias(id_col),
        F.lit("delete").alias("op"),
        F.lit(int(seq)).cast("long").alias("seq"),
    )
    return corpus.merge_upsert(
        events, epoch_id=epoch_id, query_id=query_id, mode=merge_mode
    )
