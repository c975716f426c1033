"""Last-writer-wins compaction of a change-event batch.

This is the engine's core window op (SURVEY.md §2.5 W5): the reference's
``GraphAggregate.AddNode`` overwrites the properties of an existing node
with the same ``(Type, id)`` — arrival-order last-writer-wins
(``internal/domain/aggregates/graph/graph_aggregate.go:46-59``). Our keys
are ``(conv_id, turn_idx)`` and "arrival order" is the total order given
by ``seq`` (the LSN), tie-broken deterministically.

It is also a *hard requirement* of MERGE semantics, not an optimization:
a MERGE source with two rows matching one target key is ambiguous
(Iceberg/Delta raise; our snapshot format would silently duplicate), so
every batch is compacted to exactly one event per key first.

Scale note: implemented with ``max_by`` hash aggregation rather than a
row_number window — groupBy gets map-side partial aggregation (an update
storm on a hot key collapses locally before the shuffle), while a window
shuffles every version of every key to one task and sorts. At 10^10
events with Zipf-hot conversations that difference is the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY_COLS = ("conv_id", "turn_idx")
META_COLS = ("seq", "op")


def compact_lww(
    batch: DataFrame,
    key_cols: tuple[str, ...] = KEY_COLS,
    order_col: str = "seq",
) -> DataFrame:
    """Reduce a change batch to the single winning event per key.

    Output schema = input schema; exactly one row per key — the event with
    the greatest ``order_col``. Deletes survive compaction as rows with
    ``op='delete'`` (the MERGE arm decides to drop them); a delete followed
    by a later re-insert within one batch correctly resolves to the insert.
    """
    payload = [c for c in batch.columns if c not in key_cols]
    winner = F.max_by(F.struct(*payload), F.col(order_col)).alias("_w")
    compacted = batch.groupBy(*[F.col(k) for k in key_cols]).agg(winner)
    return compacted.select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in payload])


def final_state(
    log: DataFrame,
    key_cols: tuple[str, ...] = KEY_COLS,
    order_col: str = "seq",
    payload_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Batch oracle: final table state as a pure function of the full log.

    Mirrors the reference's wipe-and-rebuild semantics
    (``cmd/main.go:165-177``: every run recomputes final state from current
    source state) — the correctness contract incremental replay must match:
    per key, the payload of the max-seq event, excluding keys whose max-seq
    event is a delete (FIXTURES.md §5).
    """
    compacted = compact_lww(log, key_cols, order_col)
    live = compacted.filter(F.col("op") != F.lit("delete"))
    if payload_cols is None:
        payload_cols = tuple(c for c in log.columns if c not in key_cols and c not in META_COLS)
    return live.select(*key_cols, *payload_cols)
