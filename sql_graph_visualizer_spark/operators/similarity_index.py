"""Incremental IVF (inverted-file) ANN index — embedding search at
corpus scale without re-assigning the corpus per query batch.

``ivf_topk`` (operators/similarity.py) is the one-shot shape: it
coarse-quantizes the whole corpus on every call. A continuously-
ingesting 100 TB embedding store cannot afford that — cell assignment
is an Arrow matmul over EVERY corpus vector. The index persists each
vector's cell assignment ONCE, at ingest, in a
:class:`~sql_graph_visualizer_spark.lake.snapshot_table.SnapshotTable`
(epoch-fenced, exactly-once, LWW on re-ingested ids, MoR-compatible —
the same lake contract as every other table), so a search costs

    |queries| assignment        (tiny — the probe side)
  + corpus scan of probed cells (``cell IN (...)`` pushed to the
                                 parquet scan; columns pruned to
                                 id + cell + embedding)
  + exact re-rank of candidates (cosine over cell members only)

The candidate join broadcasts the QUERY side, so corpus rows never
shuffle — on a 1000-executor cluster each executor scans its local
buckets, skips row groups whose ``cell`` stats miss the probe set, and
joins map-side. Assignment reuses ``ivf_cells`` / centroid math from
the one-shot path, so index search equals ``ivf_topk`` with the same
pinned centroids value-for-value — which is what makes an external SQL
oracle for the incremental path possible.

The coarse quantizer is pinned at ``create`` time (cells × dim doubles
in a sidecar JSON — kilobytes; the model-artifact deployment shape:
train k-means offline, load here). Mixing assignments from different
quantizers would silently destroy recall, so centroids never change
silently — re-quantizing is the explicit RETRAIN protocol (new in r7,
VERDICT r6 #4): ``retrain_begin(new_centroids)`` stages the new
quantizer as a pending generation, ``retrain_step`` re-assigns one
slice of old-generation rows per conflict-validated merge (racing
ingest wins the optimistic-concurrency race and the step retries),
and ``retrain_finish`` promotes the pending quantizer once no
old-generation row remains. Every row carries its quantizer
generation (``qgen``; pre-retrain rows read as generation 0), so
``search`` stays CORRECT mid-retrain: each query probes cells under
BOTH quantizers and each corpus row is matched only against the probe
set of the generation that assigned it.

Reference analogue: none (training-pipeline addition, same family as
``operators/similarity.py``).
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sql_graph_visualizer_spark.lake.file_io import LocalFileIO
from sql_graph_visualizer_spark.lake.snapshot_table import MergeStats, SnapshotTable
from sql_graph_visualizer_spark.operators.similarity import cosine, ivf_cells

_CONFIG = "index.json"
_TABLE = "table"


class IvfIndex:
    """A persisted, incrementally-updatable IVF ANN index.

    Rows are ``(vec_id, cell, embedding)`` keyed by ``vec_id``; ``cell``
    is assigned exactly once per ingested vector against the pinned
    centroids. ``search`` probes each query's nearest cells and
    exactly re-ranks only those cells' members.
    """

    def __init__(self, spark: SparkSession, path: str, io: LocalFileIO | None = None):
        self.spark = spark
        self.path = path
        self.io = io or LocalFileIO()
        self._load_config()
        self.table = SnapshotTable(spark, os.path.join(path, _TABLE), io=self.io)

    def _load_config(self) -> None:
        cfg = json.loads(self.io.read_text(os.path.join(self.path, _CONFIG)))
        C = np.asarray(cfg["centroids"], dtype=np.float64)
        self.centroids = C / np.linalg.norm(C, axis=1, keepdims=True)
        self.dim = int(cfg["dim"])
        self.generation = int(cfg.get("generation", 0))
        pend = cfg.get("pending")
        if pend is not None:
            P = np.asarray(pend["centroids"], dtype=np.float64)
            self.pending_centroids: np.ndarray | None = P / np.linalg.norm(
                P, axis=1, keepdims=True
            )
            self.pending_generation: int | None = int(pend["generation"])
        else:
            self.pending_centroids = None
            self.pending_generation = None
        self._raw_cfg = cfg

    @property
    def cells(self) -> int:
        return self.centroids.shape[0]

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        centroids,
        num_buckets: int = 32,
        io: LocalFileIO | None = None,
    ) -> "IvfIndex":
        C = np.asarray(centroids, dtype=np.float64)
        if C.ndim != 2 or C.shape[0] < 1:
            raise ValueError(f"centroids must be a (cells × dim) matrix, got {C.shape}")
        norms = np.linalg.norm(C, axis=1)
        if not np.all(norms > 0):
            raise ValueError("centroids must be non-zero vectors")
        fio = io or LocalFileIO()
        fio.makedirs(path)
        schema = T.StructType(
            [
                T.StructField("vec_id", T.LongType(), False),
                T.StructField("cell", T.IntegerType(), True),
                T.StructField("embedding", T.ArrayType(T.DoubleType()), True),
                # quantizer generation that assigned `cell` (pre-qgen
                # rows read as NULL == generation 0) — what keeps search
                # correct while a retrain is mid-flight
                T.StructField("qgen", T.IntegerType(), True),
            ]
        )
        SnapshotTable.create(
            spark,
            os.path.join(path, _TABLE),
            schema,
            key_cols=["vec_id"],
            num_buckets=num_buckets,
            io=fio,
        )
        # config after the table: an interrupted create leaves no
        # openable (config-bearing) index behind
        fio.create_exclusive(
            os.path.join(path, _CONFIG),
            json.dumps(
                {"centroids": C.tolist(), "dim": int(C.shape[1]), "generation": 0}
            ),
        )
        return cls(spark, path, io=fio)

    @classmethod
    def exists(cls, path: str, io: LocalFileIO | None = None) -> bool:
        return (io or LocalFileIO()).exists(os.path.join(path, _CONFIG))

    # -------------------------------------------------------------- pipeline

    def _assign(
        self,
        embeddings: DataFrame,
        id_col: str,
        vec_col: str,
        centroids: np.ndarray | None = None,
    ) -> DataFrame:
        """``(vec_id, cell, embedding)`` under the given quantizer
        (default: the pinned current one) — one Arrow-batch matmul per
        batch (``ivf_cells``)."""
        src = embeddings.select(
            F.col(id_col).cast("long").alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("embedding"),
        )
        C = self.centroids if centroids is None else centroids
        return ivf_cells(src, "embedding", C, probes=1).select(
            "vec_id", F.element_at("cell", 1).alias("cell"), "embedding"
        )

    def _ingest_quantizer(self) -> tuple[np.ndarray, int]:
        """(centroids, generation) new rows are assigned under: the
        PENDING quantizer while a retrain is staged — a row written
        under the new generation never needs migrating."""
        if self.pending_centroids is not None:
            return self.pending_centroids, int(self.pending_generation)  # type: ignore[arg-type]
        return self.centroids, self.generation

    def _gen_expr(self, df: DataFrame) -> F.Column:
        """Per-row quantizer generation (pre-qgen rows == 0)."""
        if "qgen" in df.columns:
            return F.coalesce(F.col("qgen"), F.lit(0))
        return F.lit(0)

    def add_batch(
        self,
        embeddings: DataFrame,
        epoch_id: int,
        query_id: str = "ivf-index",
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        mode: str = "cow",
    ) -> MergeStats:
        """Assign-and-index one ingest batch, exactly-once via the
        lake's epoch fence (a re-delivered epoch skips the write). A
        re-ingested ``vec_id`` (changed embedding) LWW-overwrites its
        row, so its cell assignment always reflects the latest vector.
        While a retrain is staged, new rows are assigned under the
        PENDING quantizer (tagged with its generation) so ingest never
        grows the migration backlog."""
        C, gen = self._ingest_quantizer()
        batch = self._assign(embeddings, id_col, vec_col, centroids=C).select(
            "vec_id",
            "cell",
            "embedding",
            F.lit(gen).cast("int").alias("qgen"),
            F.lit("update").alias("op"),
            F.lit(epoch_id).cast("long").alias("seq"),
        )
        return self.table.merge_upsert(batch, epoch_id=epoch_id, query_id=query_id, mode=mode)

    def search(
        self,
        queries: DataFrame,
        k: int = 5,
        probes: int = 1,
        query_id_col: str = "query_id",
        query_vec_col: str = "query_vec",
        version: int | None = None,
    ) -> DataFrame:
        """ANN top-k per query against the indexed corpus.

        The query side is assigned its ``probes`` nearest cells and
        broadcast; the corpus side reads ONLY the probed cells (the
        ``cell IN (...)`` filter reaches the parquet scan, pruning row
        groups and — with cell-clustered layout — whole files) and is
        exactly re-ranked by cosine. Ties broken by ``vec_id`` for
        determinism, same as ``ivf_topk``.

        MID-RETRAIN a second candidate arm runs under the pending
        quantizer: each corpus row is matched only against the probe
        set of the generation that assigned its cell, so a half-
        migrated index returns exactly what either fully-assigned state
        would (tested against the brute-force oracle)."""
        from pyspark.sql.window import Window

        corpus_all = self.table.read(version=version)
        cand = self._candidates(
            queries, corpus_all, self.centroids, self.generation,
            probes, query_id_col, query_vec_col,
        )
        if self.pending_centroids is not None:
            cand = cand.unionByName(
                self._candidates(
                    queries, corpus_all, self.pending_centroids,
                    int(self.pending_generation),  # type: ignore[arg-type]
                    probes, query_id_col, query_vec_col,
                )
            )
        cand = cand.withColumn("cosine", cosine("embedding", "query_vec"))
        w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("vec_id"))
        return (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
        )

    def _candidates(
        self,
        queries: DataFrame,
        corpus_all: DataFrame,
        centroids: np.ndarray,
        gen: int,
        probes: int,
        query_id_col: str,
        query_vec_col: str,
    ) -> DataFrame:
        """One generation's candidate arm: probe cells under this
        quantizer, match only corpus rows THIS generation assigned."""
        q = ivf_cells(
            queries.select(
                F.col(query_id_col).alias("query_id"),
                F.col(query_vec_col).cast("array<double>").alias("query_vec"),
            ),
            "query_vec",
            centroids,
            probes=probes,
        ).select("query_id", "query_vec", F.explode("cell").alias("cell"))
        # the probe-cell union is tiny (≤ queries × probes ints): collect
        # it driver-side so the corpus scan gets a pushable IN filter —
        # WITHOUT it the filter side of the join only prunes post-scan
        probe_cells = sorted({r["cell"] for r in q.select("cell").distinct().collect()})
        corpus = corpus_all.filter(self._gen_expr(corpus_all) == gen).select(
            "vec_id", "cell", "embedding"
        )
        if probe_cells:
            corpus = corpus.filter(F.col("cell").isin(probe_cells))
        return corpus.join(F.broadcast(q), on="cell")

    # -------------------------------------------------------------- retrain

    def retrain_begin(self, new_centroids) -> int:
        """Stage ``new_centroids`` as the pending quantizer generation.

        From this commit on, INGEST assigns under the new quantizer and
        SEARCH runs both generations' candidate arms; old-generation
        rows migrate via ``retrain_step``. Staging is an atomic config
        replace; re-staging while a retrain is active is an error (the
        protocol completes forward — resume with
        ``retrain_progressive``). Returns the pending generation."""
        if self.pending_centroids is not None:
            raise ValueError(
                f"retrain to generation {self.pending_generation} already active; "
                "finish or resume it (retrain_progressive) first"
            )
        P = np.asarray(new_centroids, dtype=np.float64)
        if P.ndim != 2 or P.shape[1] != self.dim:
            raise ValueError(f"new centroids must be (cells × {self.dim}), got {P.shape}")
        norms = np.linalg.norm(P, axis=1)
        if not np.all(norms > 0):
            raise ValueError("centroids must be non-zero vectors")
        cfg = dict(self._raw_cfg)
        cfg["pending"] = {
            "generation": self.generation + 1,
            "centroids": P.tolist(),
        }
        self.io.replace_atomic(os.path.join(self.path, _CONFIG), json.dumps(cfg))
        self._load_config()
        return int(self.pending_generation)  # type: ignore[return-value]

    def retrain_remaining(self) -> list[int]:
        """Old-generation cells still holding rows (the migration
        backlog, self-describing — no frontier bookkeeping to corrupt)."""
        if self.pending_centroids is None:
            return []
        df = self.table.read()
        old = df.filter(self._gen_expr(df) == self.generation)
        return sorted(r["cell"] for r in old.select("cell").distinct().collect())

    def retrain_step(
        self, cells: list[int], query_id: str = "ivf-retrain"
    ) -> MergeStats:
        """Re-assign the old-generation rows of ``cells`` under the
        pending quantizer, one conflict-validated CoW merge.

        Each row keeps its ORIGINAL LSN: re-assignment is not a data
        update, and a racing ingest of the same vec_id must still win —
        it either commits first (this step's optimistic validation
        fails with ``CommitConflictError``; retry re-reads the fresh
        row) or commits after (full-row replace on the rewritten
        bucket). ``ordered_writer=False``: step LSNs are historic, so
        this writer must pin the tombstone horizon rather than falsely
        claim ordering; ``retrain_finish`` retires the pin."""
        if self.pending_centroids is None:
            raise ValueError("no retrain active (call retrain_begin first)")
        df = self.table.read(system=True)
        old = df.filter(
            (self._gen_expr(df) == self.generation)
            & (~F.col("_deleted"))
            & F.col("cell").isin(list(cells))
        )
        batch = self._assign(old, "vec_id", "embedding", centroids=self.pending_centroids).select(
            "vec_id",
            "cell",
            "embedding",
            F.lit(int(self.pending_generation)).cast("int").alias("qgen"),
            F.lit("update").alias("op"),
        ).join(old.select("vec_id", F.col("_seq").alias("seq")), "vec_id")
        return self.table.merge_upsert(
            batch, epoch_id=-1, query_id=query_id, ordered_writer=False
        )

    def retrain_finish(self, query_id: str = "ivf-retrain") -> None:
        """Promote the pending quantizer once migration is complete.

        Refuses (loudly) while any old-generation row remains; on
        success the config flips atomically, the retrain writer's
        tombstone-horizon pin is retired, and the index reloads."""
        if self.pending_centroids is None:
            raise ValueError("no retrain active")
        left = self.retrain_remaining()
        if left:
            raise ValueError(
                f"retrain incomplete: generation {self.generation} rows remain in "
                f"cells {left[:10]}{'...' if len(left) > 10 else ''}"
            )
        cfg = dict(self._raw_cfg)
        pend = cfg.pop("pending")
        cfg["centroids"] = pend["centroids"]
        cfg["generation"] = int(pend["generation"])
        self.io.replace_atomic(os.path.join(self.path, _CONFIG), json.dumps(cfg))
        # the retrain writer is provably dead: its pin must not hold the
        # table's tombstone horizon at 0 forever (no-op if no step ran)
        self.table.drop_watermark(query_id, force=True)
        self._load_config()

    def retrain_progressive(
        self,
        new_centroids=None,
        cells_per_step: int = 8,
        query_id: str = "ivf-retrain",
        max_conflict_retries: int = 5,
    ) -> int:
        """Run (or RESUME, with ``new_centroids=None``) a retrain to
        completion in bounded slices: begin if needed, migrate
        ``cells_per_step`` old cells per merge — yielding to racing
        ingest on conflicts — then finish. Returns the number of merge
        steps executed. Search and ingest stay fully available (and
        correct) throughout; this is the rebucket machinery's
        progressive-migration discipline applied to the quantizer."""
        from sql_graph_visualizer_spark.lake.snapshot_table import CommitConflictError

        if self.pending_centroids is None:
            if new_centroids is None:
                raise ValueError("no retrain active and no new_centroids given")
            self.retrain_begin(new_centroids)
        steps = 0
        while True:
            backlog = self.retrain_remaining()
            if not backlog:
                break
            chunk = backlog[:cells_per_step]
            for attempt in range(max_conflict_retries + 1):
                try:
                    self.retrain_step(chunk, query_id=query_id)
                    break
                except CommitConflictError:
                    if attempt == max_conflict_retries:
                        raise
            steps += 1
        self.retrain_finish(query_id=query_id)
        return steps

    def cell_stats(self) -> DataFrame:
        """Vectors per cell — the skew diagnostic (a hot cell means the
        quantizer under-fits that region; re-train and rebuild)."""
        return self.table.read().groupBy("cell").agg(F.count("*").alias("n_vectors"))

    def stats(self) -> dict[str, int]:
        """Indexed-corpus size from manifest metadata (no data IO)."""
        return self.table.size_stats()

    def maybe_retrain(
        self,
        hot_share: float = 0.5,
        iterations: int = 2,
        sample_mod: int | None = None,
        cells_per_step: int = 8,
        query_id: str = "ivf-auto-retrain",
    ) -> int:
        """Maintenance hook closing the hot-cell loop OPERATIONALLY —
        the ``maybe_compact_deltas`` shape applied to the quantizer:
        call it on a timer / every N epochs, and a quantizer that has
        drifted under the corpus fixes itself.

        If the hottest cell holds more than ``hot_share`` of the
        indexed corpus (the under-fit signature ``cell_stats``
        diagnoses), fit fresh centroids over the indexed embeddings
        with :func:`~sql_graph_visualizer_spark.operators.similarity.
        train_centroids` (same k, deterministic; ``sample_mod``
        subsamples at large corpus sizes) and run the progressive
        retrain protocol to completion. A retrain already in flight is
        RESUMED rather than re-diagnosed — the protocol completes
        forward. Returns the number of migration steps executed
        (0 = balanced, nothing to do).

        Search and ingest stay available and correct throughout — this
        is pure maintenance, safe to fire from the same place as delta
        compaction. The skew scan is one hash-agg over the index table
        (fixed-width cell column); training only runs once the
        threshold trips."""
        from sql_graph_visualizer_spark.operators.similarity import (
            centroids_matrix,
            train_centroids,
        )

        if self.pending_centroids is not None:
            return self.retrain_progressive(
                cells_per_step=cells_per_step, query_id=query_id
            )
        counts = self.cell_stats().collect()
        total = sum(r["n_vectors"] for r in counts)
        if total == 0 or max(r["n_vectors"] for r in counts) <= hot_share * total:
            return 0
        k = self.cells
        trained = train_centroids(
            self.table.read().select("vec_id", "embedding"),
            k=k,
            iterations=iterations,
            sample_mod=sample_mod,
        )
        return self.retrain_progressive(
            centroids_matrix(trained),
            cells_per_step=cells_per_step,
            query_id=query_id,
        )
