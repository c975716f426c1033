"""Streaming dedup ingest (streaming/dedup_stream.py): online
probe-then-index over a file stream, matches table exactly-once, crash
window between index commit and matches commit recovered via snapshot
time travel."""

from __future__ import annotations

import json
import os

from sql_graph_visualizer_spark.operators.dedup import minhash_lsh_pairs
from sql_graph_visualizer_spark.operators.dedup_index import MinHashIndex
from sql_graph_visualizer_spark.streaming.dedup_stream import (
    DedupIngest,
    dedup_ingest_stream,
)

DOCS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (3, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
    (4, "one two three four five six seven eight nine ten"),
    (5, "one two three four five six seven eight nine ten"),
    (6, "completely different words with no overlap whatsoever here now"),
    (7, "the quick brown fox jumps over the lazy dog tonight again"),
    (8, "the quick brown fox jumps over the lazy dog tonight again"),
]
PARAMS = dict(num_hashes=64, bands=16, shingle_n=3)
THRESHOLD = 0.5


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _expected_pairs(spark):
    """One-shot LSH pairs over the full corpus, as unordered pairs."""
    full = minhash_lsh_pairs(_docs_df(spark, DOCS), threshold=THRESHOLD, **PARAMS)
    return {(frozenset((r.a_id, r.b_id)), r.est_jaccard) for r in full.collect()}


def test_stream_singleton_epochs_find_all_pairs(spark, tmp_path):
    """One document per micro-batch (maxFilesPerTrigger=1) → no
    intra-batch pairs exist, so the accumulated matches table must
    equal the full one-shot pair set as UNORDERED pairs, regardless of
    the file stream's (non-deterministic) processing order."""
    doc_dir = tmp_path / "docs"
    doc_dir.mkdir()
    for i, (doc_id, text) in enumerate(DOCS):
        (doc_dir / f"doc-{i}.json").write_text(
            json.dumps({"doc_id": doc_id, "text": text}) + "\n"
        )
    idx = MinHashIndex.create(spark, str(tmp_path / "ix"), **PARAMS)
    ingest = DedupIngest(spark, idx, str(tmp_path / "matches"), threshold=THRESHOLD)
    stats = dedup_ingest_stream(
        spark,
        str(doc_dir),
        ingest,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    assert len(stats) == len(DOCS)
    assert all(not ist.skipped and not mst.skipped for ist, mst in stats)
    got = {
        (frozenset((r.new_id, r.match_id)), r.est_jaccard)
        for r in ingest.read().collect()
    }
    exp = _expected_pairs(spark)
    assert exp, "fixture must contain near-dups"
    assert got == exp
    assert idx.table.read().count() == len(DOCS)


def test_crash_window_recovers_matches_from_snapshot(spark, tmp_path):
    """Index commit landed, matches commit did not (crash between the
    two): the re-delivered epoch's live probe is fenced empty, so the
    matches are recomputed against the pre-batch index snapshot found
    by epoch id in the manifest summaries."""
    idx = MinHashIndex.create(spark, str(tmp_path / "ix"), **PARAMS)
    ingest = DedupIngest(spark, idx, str(tmp_path / "matches"), threshold=THRESHOLD)
    batch0 = _docs_df(spark, DOCS[:4])
    batch1 = _docs_df(spark, DOCS[4:])
    ingest.process(batch0, 0)
    expected = {
        (r.new_id, r.match_id, r.est_jaccard)
        for r in idx.probe(batch1, threshold=THRESHOLD).collect()
    }
    assert expected, "fixture must produce cross-epoch matches"
    # simulate the crash window: index epoch 1 commits OUTSIDE the
    # ingest loop (same query_id), matches table never sees epoch 1
    idx.add_batch(batch1, epoch_id=1, query_id=ingest.query_id, threshold=THRESHOLD)
    st, mst = ingest.process(batch1, 1)  # re-delivery after "restart"
    assert st.skipped and not mst.skipped
    got = {
        (r.new_id, r.match_id, r.est_jaccard)
        for r in ingest.read()
        .filter("new_id in (5, 6, 7, 8)")
        .collect()
    }
    assert got == expected


def test_redelivered_epoch_is_fully_fenced(spark, tmp_path):
    idx = MinHashIndex.create(spark, str(tmp_path / "ix"), **PARAMS)
    ingest = DedupIngest(spark, idx, str(tmp_path / "matches"), threshold=THRESHOLD)
    batch = _docs_df(spark, DOCS)
    st0, mst0 = ingest.process(batch, 0)
    assert not st0.skipped and not mst0.skipped
    n = ingest.read().count()
    st1, mst1 = ingest.process(batch, 0)
    assert st1.skipped and mst1.skipped
    assert ingest.read().count() == n


def test_crash_window_with_expired_snapshot_fences_without_crashing(spark, tmp_path):
    """If the original commit's snapshot aged out of retention before
    the re-delivery, the matches cannot be recomputed — the epoch is
    fenced in the matches table (empty merge) rather than crashing or
    re-reporting wrong pairs. This is the documented keep_last caveat."""
    idx = MinHashIndex.create(spark, str(tmp_path / "ix"), **PARAMS)
    ingest = DedupIngest(spark, idx, str(tmp_path / "matches"), threshold=THRESHOLD)
    ingest.process(_docs_df(spark, DOCS[:4]), 0)
    # index epoch 1 commits outside the loop (crash window), then the
    # manifest history is truncated past it
    idx.add_batch(
        _docs_df(spark, DOCS[4:]), epoch_id=1, query_id=ingest.query_id, threshold=THRESHOLD
    )
    idx.add_batch(
        _docs_df(spark, [(100, "fresh unrelated filler text for another epoch entirely")]),
        epoch_id=2,
        query_id=ingest.query_id,
        threshold=THRESHOLD,
    )
    idx.table.expire_snapshots(keep_last=1, older_than_seconds=0)
    assert ingest._find_epoch_version(1) is None  # history truly gone
    before = ingest.read().count()
    st, mst = ingest.process(_docs_df(spark, DOCS[4:]), 1)
    assert st.skipped and not mst.skipped  # fenced empty merge commits the epoch
    assert ingest.read().count() == before  # nothing (wrong) was written
    # the fence holds on the next duplicate delivery
    st2, mst2 = ingest.process(_docs_df(spark, DOCS[4:]), 1)
    assert st2.skipped and mst2.skipped


def test_resume_from_checkpoint_is_noop(spark, tmp_path):
    """Re-running the drained stream with the same checkpoint processes
    nothing new."""
    doc_dir = tmp_path / "docs"
    doc_dir.mkdir()
    (doc_dir / "d.json").write_text(
        "".join(json.dumps({"doc_id": d, "text": t}) + "\n" for d, t in DOCS)
    )
    idx = MinHashIndex.create(spark, str(tmp_path / "ix"), **PARAMS)
    ingest = DedupIngest(spark, idx, str(tmp_path / "matches"), threshold=THRESHOLD)
    s1 = dedup_ingest_stream(spark, str(doc_dir), ingest, str(tmp_path / "ckpt"))
    assert len(s1) == 1
    s2 = dedup_ingest_stream(spark, str(doc_dir), ingest, str(tmp_path / "ckpt"))
    assert s2 == []
