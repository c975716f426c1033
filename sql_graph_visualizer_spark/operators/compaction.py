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

Scale note — why NOT ``max_by(struct(payload))`` or a row_number window:
both carry the full payload through the aggregation. A struct with
string fields is not a fixed-width aggregation buffer, so Catalyst
compiles that to **SortAggregate** — every map task fully sorts its
partition, and so does the reduce side; a window does the same and also
forgoes partial aggregation. Measured on a 32-core box this capped
compaction at ~3M events/s regardless of parallelism. The form here
keeps everything hash-based:

1. ``max(order)`` per key — fixed-width buffer → HashAggregateExec with
   map-side partial aggregation (an update storm on a hot key collapses
   locally before the shuffle), shuffling only (key, long) rows;
2. join the winners back (AQE picks a shuffled-hash join; the payload is
   shuffled once, never sorted);
3. a thin ``max_by`` pass over the ~|keys| surviving rows — only to
   collapse byte-identical duplicate deliveries of the winning event
   (same ``seq`` twice) — which reuses the join's partitioning, so it
   adds no exchange, and its sort sees |keys| rows, not |events|.
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
    broadcast_winner_seqs: bool | str = True,
) -> DataFrame:
    """Reduce a change batch to the single winning event per key.

    Output schema = input schema; exactly one row per key — the event with
    the greatest ``order_col``. Deletes survive compaction as rows with
    ``op='delete'`` (the MERGE arm decides to drop them); a delete followed
    by a later re-insert within one batch correctly resolves to the insert.
    Duplicate delivery of the winning event (same key, same ``order_col``)
    collapses to one row.

    ``broadcast_winner_seqs``: because ``order_col`` is an LSN — globally
    unique across keys — the winning rows are exactly the rows whose
    ``order_col`` is in the (narrow) winner set, so the payload can be
    filtered by a **broadcast semi-join on the longs alone** and never
    shuffles at this stage at all. One epoch's winner set is bounded by
    the trigger's backpressure cap (~8 bytes/key); pass False for
    unbounded batches and the filter becomes a keyed shuffle join.
    """
    keys = list(key_cols)
    payload = [c for c in batch.columns if c not in key_cols]
    if broadcast_winner_seqs == "sort":
        # single-shuffle sort-based form: right call when the input is
        # already ∝ |keys| (e.g. the in-merge staged union) — one job, no
        # driver broadcast round-trip; never use on a raw event batch
        # (SortAggregate would sort the full payload on every partition)
        winner = F.max_by(F.struct(*payload), F.col(order_col)).alias("_w")
        compacted = batch.groupBy(*keys).agg(winner)
        return compacted.select(*keys, *[F.col(f"_w.{c}").alias(c) for c in payload])
    winners = batch.groupBy(*keys).agg(F.max(order_col).alias("__max_ord"))
    if broadcast_winner_seqs:
        seqs = winners.select(F.col("__max_ord").alias(order_col))
        survivors = batch.join(F.broadcast(seqs), on=order_col, how="left_semi")
    else:
        survivors = (
            batch.join(winners, on=keys)
            .where(F.col(order_col) == F.col("__max_ord"))
            .drop("__max_ord")
        )
    winner = F.max_by(F.struct(*payload), F.col(order_col)).alias("_w")
    compacted = survivors.groupBy(*keys).agg(winner)
    return compacted.select(*keys, *[F.col(f"_w.{c}").alias(c) for c in payload])


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
