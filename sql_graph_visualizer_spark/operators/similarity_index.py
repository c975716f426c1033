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
quantizers would silently destroy recall, so centroids are immutable;
re-quantizing is a new index built from the raw embedding table.

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
        cfg = json.loads(self.io.read_text(os.path.join(path, _CONFIG)))
        C = np.asarray(cfg["centroids"], dtype=np.float64)
        self.centroids = C / np.linalg.norm(C, axis=1, keepdims=True)
        self.dim = int(cfg["dim"])
        self.table = SnapshotTable(spark, os.path.join(path, _TABLE), io=self.io)

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
            json.dumps({"centroids": C.tolist(), "dim": int(C.shape[1])}),
        )
        return cls(spark, path, io=fio)

    @classmethod
    def exists(cls, path: str, io: LocalFileIO | None = None) -> bool:
        return (io or LocalFileIO()).exists(os.path.join(path, _CONFIG))

    # -------------------------------------------------------------- pipeline

    def _assign(self, embeddings: DataFrame, id_col: str, vec_col: str) -> DataFrame:
        """``(vec_id, cell, embedding)`` under the pinned quantizer —
        one Arrow-batch matmul per batch (``ivf_cells``)."""
        src = embeddings.select(
            F.col(id_col).cast("long").alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("embedding"),
        )
        return ivf_cells(src, "embedding", self.centroids, probes=1).select(
            "vec_id", F.element_at("cell", 1).alias("cell"), "embedding"
        )

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
        row, so its cell assignment always reflects the latest vector."""
        batch = self._assign(embeddings, id_col, vec_col).select(
            "vec_id",
            "cell",
            "embedding",
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
        determinism, same as ``ivf_topk``."""
        from pyspark.sql.window import Window

        q = ivf_cells(
            queries.select(
                F.col(query_id_col).alias("query_id"),
                F.col(query_vec_col).cast("array<double>").alias("query_vec"),
            ),
            "query_vec",
            self.centroids,
            probes=probes,
        ).select("query_id", "query_vec", F.explode("cell").alias("cell"))
        # the probe-cell union is tiny (≤ queries × probes ints): collect
        # it driver-side so the corpus scan gets a pushable IN filter —
        # WITHOUT it the filter side of the join only prunes post-scan
        probe_cells = sorted({r["cell"] for r in q.select("cell").distinct().collect()})
        corpus = self.table.read(version=version).select("vec_id", "cell", "embedding")
        if probe_cells:
            corpus = corpus.filter(F.col("cell").isin(probe_cells))
        cand = corpus.join(F.broadcast(q), on="cell").withColumn(
            "cosine", cosine("embedding", "query_vec")
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("vec_id"))
        return (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
        )

    def cell_stats(self) -> DataFrame:
        """Vectors per cell — the skew diagnostic (a hot cell means the
        quantizer under-fits that region; re-train and rebuild)."""
        return self.table.read().groupBy("cell").agg(F.count("*").alias("n_vectors"))

    def stats(self) -> dict[str, int]:
        """Indexed-corpus size from manifest metadata (no data IO)."""
        return self.table.size_stats()
