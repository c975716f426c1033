"""Incremental MinHash signature index — corpus-scale near-dup detection
without recomputing the corpus.

``minhash_lsh_pairs`` is the right shape for a one-shot pass, but a
continuously-ingesting 100 TB corpus cannot re-shingle 100 TB of text
per batch. The index persists each document's MinHash signature ONCE
(in a :class:`~sql_graph_visualizer_spark.lake.snapshot_table.SnapshotTable`
— epoch-fenced, exactly-once, time-travelable like every other table in
the lake) and answers "which already-indexed documents is this new
batch near-duplicating?" with work proportional to

    |batch| text  (shingle + hash the NEW docs only)
  + corpus signature scan  (narrow: id + k longs ≈ 0.1-1% of corpus bytes)
  + band-collision pairs   (the LSH candidate set, never all-pairs)

The probe is a banded equi-join with the BATCH side broadcast, so the
corpus signatures never shuffle — on a 1000-executor cluster each
executor scans its local signature partitions and joins against the
broadcast batch bands map-side. Signature computation, banding and the
estimated-Jaccard verify reuse the exact functions of the one-shot path
(``minhash_signatures`` / ``banded_signatures`` / ``est_jaccard_col``),
so index probes and full recomputes agree value-for-value — which is
also what makes the DuckDB oracle for the incremental path possible:
recompute the full banded pipeline and keep only the cross
(new × indexed) pairs.

Reference analogue: none (training-pipeline addition, same family as
``operators/dedup.py``). The lake table underneath carries the reference
CDC semantics (epoch fencing, LWW upsert on re-delivery).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sql_graph_visualizer_spark.lake.file_io import LocalFileIO
from sql_graph_visualizer_spark.lake.snapshot_table import MergeStats, SnapshotTable
from sql_graph_visualizer_spark.operators.dedup import (
    banded_signatures,
    est_jaccard_col,
    minhash_signatures,
)

_CONFIG = "index.json"
_TABLE = "table"


class MinHashIndex:
    """A persisted, incrementally-updatable MinHash LSH index.

    The hash-family parameters (``num_hashes``/``bands``/``shingle_n``/
    ``portable``) are pinned in a sidecar config at ``create`` time and
    re-loaded on open — signatures from different families must never
    mix, so they are not per-call knobs.
    """

    def __init__(self, spark: SparkSession, path: str, io: LocalFileIO | None = None):
        self.spark = spark
        self.path = path
        self.io = io or LocalFileIO()
        cfg = json.loads(self.io.read_text(os.path.join(path, _CONFIG)))
        self.num_hashes = int(cfg["num_hashes"])
        self.bands = int(cfg["bands"])
        self.shingle_n = int(cfg["shingle_n"])
        self.portable = bool(cfg["portable"])
        self.table = SnapshotTable(spark, os.path.join(path, _TABLE), io=self.io)
        # the pre-batch version the latest add_batch probe reads; pinned
        # against snapshot GC until the next add_batch (or an explicit
        # release) so the lazily-returned matches frame stays evaluable
        self._probe_pin: int | None = None

    def release_probe_pin(self) -> None:
        """Declare the last ``add_batch`` probe consumed: its pre-batch
        snapshot may be garbage-collected again."""
        if self._probe_pin is not None:
            self.table.unpin_version(self._probe_pin)
            self._probe_pin = None

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        num_hashes: int = 64,
        bands: int = 16,
        shingle_n: int = 3,
        portable: bool = False,
        num_buckets: int = 32,
        io: LocalFileIO | None = None,
    ) -> "MinHashIndex":
        if num_hashes % bands != 0:
            raise ValueError(f"num_hashes {num_hashes} must divide into {bands} bands")
        fio = io or LocalFileIO()
        fio.makedirs(path)
        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("sig", T.ArrayType(T.LongType()), True),
            ]
        )
        SnapshotTable.create(
            spark,
            os.path.join(path, _TABLE),
            schema,
            key_cols=["doc_id"],
            num_buckets=num_buckets,
            io=fio,
        )
        # config after the table: an interrupted create leaves no
        # openable (config-bearing) index behind
        fio.create_exclusive(
            os.path.join(path, _CONFIG),
            json.dumps(
                {
                    "num_hashes": num_hashes,
                    "bands": bands,
                    "shingle_n": shingle_n,
                    "portable": portable,
                }
            ),
        )
        return cls(spark, path, io=fio)

    @classmethod
    def exists(cls, path: str, io: LocalFileIO | None = None) -> bool:
        return (io or LocalFileIO()).exists(os.path.join(path, _CONFIG))

    # -------------------------------------------------------------- pipeline

    def signatures(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> DataFrame:
        """``(id, sig)`` for a document frame under THIS index's pinned
        hash family (explode → hash-agg; map-side combined)."""
        return minhash_signatures(
            docs.filter(F.length(F.col(text_col)) > 0),
            id_col,
            text_col,
            self.num_hashes,
            self.shingle_n,
            portable=self.portable,
        )

    def _probe_sigs(self, batch_sigs: DataFrame, version: int | None = None) -> DataFrame:
        """Near-dup matches of ``batch_sigs`` against the INDEXED corpus:
        ``(new_id, match_id, est_jaccard)``. Banded equi-join, batch side
        broadcast — the corpus side never shuffles."""
        corpus = self.table.read(version=version).select(
            F.col("doc_id").alias("id"), "sig"
        )
        bb, join_keys = banded_signatures(
            batch_sigs, self.num_hashes, self.bands, portable=self.portable
        )
        cb, _ = banded_signatures(corpus, self.num_hashes, self.bands, portable=self.portable)
        # estimate before deduping band collisions (r8, guide §2.3 — see
        # minhash_lsh_pairs): identical estimate per collision, so the
        # dedupe aggregates (new_id, match_id, est) fixed-width rows
        # instead of carrying two k-long signature arrays
        est = est_jaccard_col(self.num_hashes, "n.sig", "c.sig")
        return (
            cb.alias("c")
            .join(F.broadcast(bb.alias("n")), on=join_keys)
            # a re-delivered (already-indexed) doc must not match itself
            .filter(F.col("c.id") != F.col("n.id"))
            .select(
                F.col("n.id").alias("new_id"),
                F.col("c.id").alias("match_id"),
                est.alias("est_jaccard"),
            )
            .dropDuplicates(["new_id", "match_id"])
            .select("new_id", "match_id", F.round("est_jaccard", 6).alias("est_jaccard"))
        )

    def probe(
        self,
        docs: DataFrame,
        threshold: float = 0.7,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """Read-only lookup: which indexed documents does each doc in
        ``docs`` near-duplicate (estimated Jaccard ≥ ``threshold``)?
        Intra-``docs`` pairs are NOT emitted — run ``minhash_lsh_pairs``
        on the batch for those (same family ⇒ consistent decisions)."""
        sigs = self.signatures(docs, id_col, text_col)
        return self._probe_sigs(sigs).filter(F.col("est_jaccard") >= threshold)

    def add_batch(
        self,
        docs: DataFrame,
        epoch_id: int,
        query_id: str = "minhash-index",
        threshold: float = 0.7,
        id_col: str = "doc_id",
        text_col: str = "text",
        mode: str = "cow",
    ) -> tuple[DataFrame, MergeStats]:
        """Probe-then-index one ingest batch: returns ``(matches,
        MergeStats)`` where ``matches`` is the new-vs-indexed near-dup
        frame (computed against the index state BEFORE this batch) and
        the stats are the signature MERGE's.

        Exactly-once: the merge rides the lake's epoch fence, so a
        re-delivered epoch skips the write (``stats.skipped``) — and the
        probe is fenced the same way (returns empty), because re-probing
        after the batch was indexed would re-report every near-dup of
        the batch's own documents. Signatures are computed ONCE and feed
        both the probe and the merge; an updated document (same id,
        changed text) overwrites its signature via the table's LWW
        upsert (seq = epoch)."""
        if epoch_id >= 0 and self.table.last_committed_epoch(query_id) >= epoch_id:
            empty = self.spark.createDataFrame(
                [], "new_id long, match_id long, est_jaccard double"
            )
            return empty, MergeStats(
                epoch_id, 0, 0, 0, 0, True, 0, self.table.manifest()["version"]
            )
        # persist: signatures feed both the probe and the merge — without
        # it the shingle pipeline would run twice. Unpersisted by the
        # caller's session LRU; (id, k longs) is tiny relative to text.
        sigs = self.signatures(docs, id_col, text_col).persist()
        # the probe plan pins the PRE-batch manifest at build time (file
        # lists are resolved eagerly, data files are immutable), so it
        # stays valid — and pre-batch-scoped — even when evaluated after
        # the merge below commits. The pre-batch VERSION is additionally
        # pinned against expire_snapshots (VERDICT r6 #5: without the
        # pin, a caller holding the matches frame across a maintenance
        # sweep got file-not-found at evaluation); the pin rotates on
        # the next add_batch and is droppable via release_probe_pin().
        pre_version = int(self.table.manifest()["version"])
        self.table.pin_version(pre_version)
        if self._probe_pin is not None and self._probe_pin != pre_version:
            self.table.unpin_version(self._probe_pin)
        self._probe_pin = pre_version
        matches = self._probe_sigs(sigs).filter(F.col("est_jaccard") >= threshold)
        batch = sigs.select(
            F.col("id").alias("doc_id"),
            "sig",
            F.lit("update").alias("op"),
            F.lit(epoch_id).cast("long").alias("seq"),
        )
        stats = self.table.merge_upsert(
            batch, epoch_id=epoch_id, query_id=query_id, mode=mode
        )
        return matches, stats

    def stats(self) -> dict[str, int]:
        """Indexed-corpus size from manifest metadata (no data IO)."""
        return self.table.size_stats()
