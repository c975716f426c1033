"""Incremental MinHash signature index (operators/dedup_index.py):
probe-then-index per batch, exactly-once via the lake's epoch fence,
probe results value-equal to a full one-shot recompute."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sql_graph_visualizer_spark.operators.dedup import minhash_lsh_pairs
from sql_graph_visualizer_spark.operators.dedup_index import MinHashIndex

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def _cross_pairs_from_full(full_pairs, batch_ids: set[int]):
    """Project a one-shot pair frame (a_id < b_id) onto the incremental
    shape: exactly one side in the batch → (new_id, match_id)."""
    out = set()
    for r in full_pairs.collect():
        a_in, b_in = r.a_id in batch_ids, r.b_id in batch_ids
        if a_in == b_in:
            continue  # both-in-batch (intra-batch) or both-in-corpus
        new, match = (r.a_id, r.b_id) if a_in else (r.b_id, r.a_id)
        out.add((new, match, r.est_jaccard))
    return out


def test_index_probe_equals_full_recompute(spark, tmp_path):
    """The contract that makes the index trustworthy: probing batch B
    against an index of corpus C returns exactly the (B × C) subset of
    ``minhash_lsh_pairs(C ∪ B)`` — same family, same banding, same
    estimated Jaccard values."""
    docs = _docs(spark)
    corpus = docs.filter("doc_id % 3 <> 0")
    batch = docs.filter("doc_id % 3 = 0")
    batch_ids = {r.doc_id for r in batch.select("doc_id").collect()}

    idx = MinHashIndex.create(spark, str(tmp_path / "ix"), num_hashes=64, bands=16)
    seeded, st0 = idx.add_batch(corpus, epoch_id=0, threshold=0.5)
    assert seeded.count() == 0  # empty index: nothing to match
    assert not st0.skipped and st0.rows_in > 0
    assert idx.stats()["total_files"] > 0

    matches, st1 = idx.add_batch(batch, epoch_id=1, threshold=0.5)
    got = {(r.new_id, r.match_id, r.est_jaccard) for r in matches.collect()}

    expected = _cross_pairs_from_full(
        minhash_lsh_pairs(docs, threshold=0.5, num_hashes=64, bands=16), batch_ids
    )
    assert expected, "fixture must contain cross near-dups"
    assert got == expected


def test_add_batch_redelivery_is_fenced(spark, tmp_path):
    """A re-delivered epoch neither re-writes signatures nor re-reports
    the batch's near-dups (which would now include its own documents)."""
    docs = _docs(spark).limit(40)
    idx = MinHashIndex.create(spark, str(tmp_path / "ix"))
    _, st = idx.add_batch(docs, epoch_id=0)
    assert not st.skipped
    n = idx.table.read().count()
    again, st2 = idx.add_batch(docs, epoch_id=0)
    assert st2.skipped and again.count() == 0
    assert idx.table.read().count() == n


def test_updated_document_overwrites_signature(spark, tmp_path):
    """Same doc_id, new text in a later epoch → the signature row is
    LWW-replaced (one row per key), and probes match the NEW text."""
    idx = MinHashIndex.create(spark, str(tmp_path / "ix"), num_hashes=64, bands=16)
    v1 = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    idx.add_batch(v1, epoch_id=0)
    v2 = spark.createDataFrame(
        [(1, "completely different replacement text with no overlap at all here")],
        "doc_id long, text string",
    )
    idx.add_batch(v2, epoch_id=1)
    assert idx.table.read().count() == 1
    probe_old = idx.probe(
        spark.createDataFrame(
            [(99, "the quick brown fox jumps over the lazy dog tonight")],
            "doc_id long, text string",
        ),
        threshold=0.5,
    )
    assert probe_old.count() == 0  # old text's signature is gone
    probe_new = idx.probe(
        spark.createDataFrame(
            [(99, "completely different replacement text with no overlap at all here")],
            "doc_id long, text string",
        ),
        threshold=0.5,
    )
    rows = probe_new.collect()
    assert [(r.new_id, r.match_id) for r in rows] == [(99, 1)]
    assert rows[0].est_jaccard == 1.0


def test_cold_open_pins_family_and_probe_broadcasts_batch(spark, tmp_path):
    """The sidecar config survives a cold open (hash-family params are
    not per-call knobs), and the probe plan broadcasts the BATCH side —
    the corpus signatures never shuffle (the 100 TB contract)."""
    path = str(tmp_path / "ix")
    MinHashIndex.create(spark, path, num_hashes=32, bands=8, shingle_n=2, portable=True)
    assert MinHashIndex.exists(path)
    idx = MinHashIndex(spark, path)
    assert (idx.num_hashes, idx.bands, idx.shingle_n, idx.portable) == (32, 8, 2, True)
    docs = _docs(spark).limit(60)
    idx.add_batch(docs, epoch_id=0)
    plan = idx.probe(docs.limit(5))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "BroadcastExchange" in plan


def test_probe_with_wrong_family_never_mixes(spark, tmp_path):
    """create() rejects a band count that does not divide num_hashes."""
    with pytest.raises(ValueError):
        MinHashIndex.create(spark, str(tmp_path / "bad"), num_hashes=64, bands=13)


def test_mor_mode_and_compaction_preserve_probe(spark, tmp_path):
    """MoR signature merges + a delta fold don't change probe results."""
    docs = _docs(spark)
    corpus = docs.filter("doc_id % 3 <> 0")
    batch = docs.filter("doc_id % 3 = 0")
    idx = MinHashIndex.create(spark, str(tmp_path / "ix"))
    half = corpus.filter("doc_id % 2 = 0")
    rest = corpus.filter("doc_id % 2 = 1")
    idx.add_batch(half, epoch_id=0, mode="mor")
    idx.add_batch(rest, epoch_id=1, mode="mor")
    before = {
        (r.new_id, r.match_id, r.est_jaccard)
        for r in idx.probe(batch, threshold=0.5).collect()
    }
    idx.table.compact_deltas()
    after = {
        (r.new_id, r.match_id, r.est_jaccard)
        for r in idx.probe(batch, threshold=0.5).collect()
    }
    assert before == after and before
    full = _cross_pairs_from_full(
        minhash_lsh_pairs(docs, threshold=0.5),
        {r.doc_id for r in batch.select("doc_id").collect()},
    )
    assert after == full


def test_probe_and_add_batch_mid_progressive_migration(spark, tmp_path):
    """The index's lake table is exactly the table an operator would
    grow-rebucket at corpus scale — probe and add_batch must be correct
    WHILE a progressive migration frontier is mid-table (readers route
    per-bucket via the frontier CASE; the new batch's merge lands on the
    evolving spec), and after rebucket_finish."""
    docs = _docs(spark)
    corpus = docs.filter("doc_id % 3 <> 0")
    batch = docs.filter("doc_id % 3 = 0")
    batch_ids = {r.doc_id for r in batch.select("doc_id").collect()}
    full = _cross_pairs_from_full(minhash_lsh_pairs(docs, threshold=0.5), batch_ids)
    assert full, "fixture must contain cross near-dups"

    idx = MinHashIndex.create(spark, str(tmp_path / "ix"), num_buckets=4)
    idx.add_batch(corpus, epoch_id=0, threshold=0.5)

    idx.table.rebucket_start(8)
    idx.table.rebucket_step(max_buckets=1)  # frontier mid-table: 1 of 4 migrated
    mid = {
        (r.new_id, r.match_id, r.est_jaccard)
        for r in idx.probe(batch, threshold=0.5).collect()
    }
    assert mid == full

    # indexing a batch mid-migration: the merge routes via the same
    # frontier spec; the probe half of add_batch stays pre-batch-scoped
    matches, st = idx.add_batch(batch, epoch_id=1, threshold=0.5)
    got = {(r.new_id, r.match_id, r.est_jaccard) for r in matches.collect()}
    assert not st.skipped and got == full

    idx.table.rebucket_step(max_buckets=4)
    idx.table.rebucket_finish()
    # post-migration: the batch is now corpus too, so re-probing it
    # finds the cross pairs PLUS intra-batch pairs (both orientations —
    # each batch doc reports the other); self-matches stay excluded
    intra = {
        (r.a_id, r.b_id, r.est_jaccard)
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
        if r.a_id in batch_ids and r.b_id in batch_ids
    }
    expected_after = full | {(a, b, j) for a, b, j in intra} | {
        (b, a, j) for a, b, j in intra
    }
    after = {
        (r.new_id, r.match_id, r.est_jaccard)
        for r in idx.probe(batch, threshold=0.5).collect()
    }
    assert after == expected_after
    assert idx.table.manifest()["num_buckets"] == 8


def test_probe_pin_survives_snapshot_gc(spark, tmp_path):
    """VERDICT r6 #5: a caller holding add_batch's lazily-returned
    matches frame across an expire_snapshots sweep must still be able
    to evaluate it — the pre-batch version is pinned against GC until
    the next add_batch (or an explicit release), never file-not-found."""
    docs = _docs(spark).limit(60)
    idx = MinHashIndex.create(spark, str(tmp_path / "ix"), num_hashes=32, bands=8)
    # several epochs of history so aggressive retention WOULD collect
    # the pre-batch snapshot without the pin
    for e in range(3):
        m, _ = idx.add_batch(docs.filter(f"doc_id % 3 = {e}"), epoch_id=e, threshold=0.5)
        m.collect()
    pre = int(idx.table.manifest()["version"])
    matches, st = idx.add_batch(
        docs.filter("doc_id % 2 = 0"), epoch_id=3, threshold=0.5
    )
    assert not st.skipped
    # maintenance races the unconsumed probe: keep only the newest
    # snapshot — the pinned pre-batch version must survive
    idx.table.expire_snapshots(keep_last=1, older_than_seconds=0)
    assert pre in idx.table.versions()  # pinned
    rows = matches.collect()  # evaluates the pre-batch-scoped plan
    assert {r.new_id for r in rows} <= {r.doc_id for r in docs.collect()}
    # released pin → the old snapshot is collectable again
    idx.release_probe_pin()
    idx.table.expire_snapshots(keep_last=1, older_than_seconds=0)
    assert pre not in idx.table.versions()
    # and the rotation: the NEXT add_batch retires the previous pin
    m2, _ = idx.add_batch(
        spark.createDataFrame([(999, "fresh text for pin rotation check")],
                              "doc_id long, text string"),
        epoch_id=4, threshold=0.5,
    )
    first_pin = idx._probe_pin
    idx.add_batch(
        spark.createDataFrame([(1000, "another fresh text rotating the pin")],
                              "doc_id long, text string"),
        epoch_id=5, threshold=0.5,
    )
    assert idx._probe_pin != first_pin
    idx.table.expire_snapshots(keep_last=1, older_than_seconds=0)
    assert first_pin not in idx.table.versions()
