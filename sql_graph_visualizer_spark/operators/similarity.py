"""Similarity search over an embedding column (array<float>).

Three paths over ``embeddings(vec_id, embedding, …)``:

- **brute-force cosine top-k** (`cosine_topk`): exact baseline. The dot
  product is a sequential ``F.aggregate`` fold over zipped arrays —
  JVM-side, deterministic order (reproducible float sums). Queries are
  broadcast; candidates never shuffle. Cost O(|Q|·N·d) — correct tool
  for small |Q|, the verification oracle for the scale path.
- **LSH-bucketed ANN** (`lsh_topk`): random-hyperplane signatures (bits
  from sign(v·h_p) for seeded deterministic hyperplanes), candidates
  from matching any of ``tables`` banded signature chunks, exact cosine
  re-rank on candidates only. Scale path: cost ∝ collisions, recall
  tunable via bits/tables.
- **IVF** (`ivf_topk`): coarse quantizer — every corpus vector is
  assigned ONCE to its nearest of ``cells`` centroids; a query probes
  its ``probes`` nearest cells and exactly re-ranks only those cells'
  members. Scale path: corpus work is one assignment pass + a join on
  cell id; recall tunable via probes/cells.

Hyperplanes are derived from xxhash64 (deterministic, no RNG state), so
results are stable across runs/partitionings — same rule as the CDC
generator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: str | Column, b: str | Column) -> Column:
    """Deterministic sequential-fold dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: str | Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: str | Column, b: str | Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k neighbours per query vector (broadcast the queries —
    the embedding table streams through, no shuffle of the corpus)."""
    from pyspark.sql.window import Window

    q = F.broadcast(queries.select(F.col(query_id_col), F.col(query_vec_col)))
    scored = (
        embeddings.select(F.col(id_col), F.col(vec_col))
        .crossJoin(q)
        .withColumn("cosine", cosine(vec_col, query_vec_col))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("cosine", 6).alias("cosine"), "rank")
    )


def _hyperplane_bit(vec: Column, plane: int, dim: int) -> Column:
    """Sign bit of v·h where h components are deterministic pseudo-randoms
    in [-1,1) derived from xxhash64(plane, dim_index).

    This is the *definition* of the hash family as a column expression;
    the hot path is ``hyperplane_buckets`` below — Spark evaluates
    higher-order functions interpreted (outside codegen), so folding
    tables×bits×dim per row this way is ~50× slower than one Arrow-batch
    matmul against the same (deterministic) plane matrix."""
    comps = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (F.pmod(F.xxhash64(F.lit(plane), i), F.lit(2_000_001)) - 1_000_000) / 1_000_000.0,
    )
    return (F.aggregate(F.zip_with(vec, comps, lambda x, h: x.cast("double") * h), F.lit(0.0), lambda a, v: a + v) > 0).cast("int")


def hyperplane_matrix(spark, dim: int, planes: int):
    """The deterministic hyperplane components as a dim×planes numpy
    matrix — EXACTLY the values `_hyperplane_bit` derives (same
    xxhash64(plane:int, i:int) formula, computed by one tiny Spark job),
    so both paths define the same hash family. ~dim×planes doubles:
    kilobytes, shipped to executors inside the UDF closure."""
    rows = (
        spark.range(planes)
        .select(
            F.col("id").cast("int").alias("p"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: (F.pmod(F.xxhash64(F.col("id").cast("int"), i), F.lit(2_000_001)) - 1_000_000)
                / 1_000_000.0,
            ).alias("h"),
        )
        .collect()
    )
    H = np.array([r["h"] for r in sorted(rows, key=lambda r: r["p"])], dtype=np.float64)
    return H.T  # dim × planes


def hyperplane_buckets(
    df: DataFrame, vec_col: str, dim: int, bits: int, tables: int, out_col: str = "buckets"
) -> DataFrame:
    """All ``tables`` LSH bucket ids per row as one array<long> column,
    computed by a single Arrow-batched pandas UDF: (batch×dim) @
    (dim×tables·bits) matmul → sign bits → per-table packing. One numpy
    GEMM per Arrow batch replaces tables×bits interpreted HOF folds per
    row — the vectorized-UDF discipline for work built-ins can't
    express efficiently."""
    from pyspark.sql.functions import pandas_udf

    H = hyperplane_matrix(df.sparkSession, dim, tables * bits)
    weights = (1 << np.arange(bits)).astype(np.int64)

    @pandas_udf("array<long>")
    def buckets(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy()).astype(np.float64)  # batch × dim
        S = (M @ H) > 0  # batch × tables·bits sign bits
        packed = S.reshape(len(M), tables, bits).astype(np.int64) @ weights  # batch × tables
        return pd.Series(list(packed))

    return df.withColumn(out_col, buckets(F.col(vec_col)))


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    bits: int = 12,
    tables: int = 4,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """ANN top-k: candidates from any of `tables` LSH bucket matches,
    exact cosine re-rank on candidates.

    Multi-probe: the *query* side also probes every bucket within
    Hamming distance ``probe_hamming`` (0, 1 or 2) of its own signature
    (flip each bit, then each bit pair) — recall rises steeply at the
    cost of up to ``1 + bits + C(bits,2)``× more broadcast query rows,
    never more corpus-side work. Corpus rows are bucketed exactly once;
    only the tiny broadcast side fans out.
    """
    from pyspark.sql.window import Window

    emb = hyperplane_buckets(
        embeddings.select(id_col, vec_col), vec_col, dim, bits, tables
    )
    qs = hyperplane_buckets(
        queries.select(query_id_col, query_vec_col), query_vec_col, dim, bits, tables
    )
    emb_b = emb.select(
        id_col,
        vec_col,
        F.posexplode("buckets").alias("t", "bk"),
    )
    probes: list[int] = [0]
    if probe_hamming >= 1:
        probes += [1 << b for b in range(bits)]
    if probe_hamming >= 2:
        probes += [(1 << b1) | (1 << b2) for b1 in range(bits) for b2 in range(b1 + 1, bits)]
    q_b = (
        qs.select(
            query_id_col,
            query_vec_col,
            F.posexplode("buckets").alias("t", "bk0"),
        )
        .select(
            query_id_col,
            query_vec_col,
            "t",
            F.explode(F.array(*[F.col("bk0").bitwiseXOR(F.lit(p)) for p in probes])).alias("bk"),
        )
        .dropDuplicates([query_id_col, "t", "bk"])
    )

    # score BEFORE deduping multi-table collisions (r8, guide §2.3): a
    # pair colliding in several tables/probes has the same two vectors
    # each time, so its cosine is identical — computing it inline lets
    # the dedupe aggregate (query, id, cosine) fixed-width rows instead
    # of carrying both embedding arrays through the exchange (~2·dim·8 B
    # per candidate, and an array first() buffer = SortAggregate)
    cand = (
        emb_b.join(F.broadcast(q_b), on=["t", "bk"])
        .select(query_id_col, id_col, cosine(vec_col, query_vec_col).alias("cosine"))
        .dropDuplicates([query_id_col, id_col])
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("cosine", 6).alias("cosine"), "rank")
    )


# ------------------------------------------------------------------- IVF


def ivf_centroids(embeddings: DataFrame, cells: int, id_col: str, vec_col: str):
    """Deterministic seeded centroids: the ``cells`` corpus vectors with
    the smallest xxhash64(id) — reproducible across runs/partitionings
    (the same no-RNG rule as the LSH hyperplanes and the CDC generator).
    A production pipeline would refine these with a few k-means
    iterations (pyspark.ml KMeans); refinement changes RECALL only,
    never correctness — candidates are always exactly re-ranked — and
    seeded k-means depends on input partitioning, which would break
    run-to-run reproducibility here. Returns an L2-normalized
    (cells × dim) float64 matrix (kilobytes; rides in UDF closures)."""
    rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(cells)
        .collect()
    )
    C = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    return C / np.linalg.norm(C, axis=1, keepdims=True)


def ivf_cells(df: DataFrame, vec_col: str, centroids, probes: int = 1, out_col: str = "cell") -> DataFrame:
    """Nearest-``probes`` centroid ids per row as array<int>, via one
    Arrow-batch matmul per batch (same vectorized-UDF discipline as
    hyperplane_buckets). With probes=1 this is the corpus assignment;
    with probes=P it is the query-side multi-probe list."""
    from pyspark.sql.functions import pandas_udf

    C = centroids  # cells × dim, normalized

    @pandas_udf("array<int>")
    def nearest(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy()).astype(np.float64)  # batch × dim
        sims = M @ C.T  # batch × cells (argmax over cosine: ||m|| constant per row)
        top = np.argsort(-sims, axis=1)[:, :probes].astype(np.int32)
        return pd.Series(list(top))

    return df.withColumn(out_col, nearest(F.col(vec_col)))


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    cells: int = 16,
    probes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    centroids=None,
) -> DataFrame:
    """IVF ANN top-k: coarse-quantize the corpus once (cell id per row),
    probe the query's ``probes`` nearest cells, exact-cosine re-rank the
    members of those cells only.

    Plan shape at scale: the corpus is scanned once for assignment and
    shuffles only on (cell) for the candidate join; query side is tiny
    and broadcast. Cost ∝ corpus/cells × probes per query — the
    inverted-file trade every vector database makes.

    ``centroids``: optionally supply the coarse quantizer directly as a
    (cells × dim) matrix — the production deployment shape, where the
    quantizer is trained offline (k-means over a sample) and loaded like
    a model artifact. When omitted, deterministic seeded centroids are
    drawn from the corpus (``ivf_centroids``)."""
    from pyspark.sql.window import Window

    if centroids is not None:
        C = np.asarray(centroids, dtype=np.float64)
        cent = C / np.linalg.norm(C, axis=1, keepdims=True)
        cells = cent.shape[0]
    else:
        cent = ivf_centroids(embeddings, cells, id_col, vec_col)
    corpus = ivf_cells(embeddings.select(id_col, vec_col), vec_col, cent, probes=1)
    corpus = corpus.select(id_col, vec_col, F.element_at("cell", 1).alias("cell"))
    q = ivf_cells(
        queries.select(query_id_col, query_vec_col), query_vec_col, cent, probes=probes
    ).select(query_id_col, query_vec_col, F.explode("cell").alias("cell"))
    cand = corpus.join(F.broadcast(q), on="cell").withColumn(
        "cosine", cosine(vec_col, query_vec_col)
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("cosine", 6).alias("cosine"), "rank")
    )


# ----------------------------------------------------- quantizer training


def train_centroids(
    embeddings: DataFrame,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = None,
    round_digits: int = 9,
) -> DataFrame:
    """Deterministic Lloyd's k-means over an embedding column — the
    missing first arc of the IVF lifecycle. ``cell_stats`` diagnoses a
    hot cell ("the quantizer under-fits; re-train and rebuild"),
    :meth:`IvfIndex.retrain_progressive` migrates to a new quantizer —
    this operator TRAINS that quantizer, closing the loop:

        cell_stats → train_centroids → retrain_progressive → search

    Returns one row per (cell, dimension):
    ``(cell long, pos long, centroid double, n_members long)`` where
    ``n_members`` is the cell's population under the assignment that
    produced the final means. Feed :func:`centroids_matrix` to get the
    (k × dim) ndarray ``retrain_begin`` / ``ivf_topk`` expect.

    Everything is deliberately RELATIONAL — no Arrow round-trip, no
    higher-order folds in the hot path (HOFs evaluate interpreted
    per-row; explode + hash-agg is the codegen path):

    - vectors are ``posexplode``d once to fixed-width ``(id, pos, val)``
      rows; every later step is a hash aggregate or an equi-join;
    - the distance step joins that exploded table to the k×dim centroid
      rows — BROADCAST (kilobytes) — and hash-aggregates
      ``sum((val-cval)²)`` per (id, cell): map-side combinable,
      corpus never shuffles on anything wider than the agg keys;
    - per-term squares are summed as ``DECIMAL(28,16)`` so the sum is
      summation-order invariant → bit-stable across partitionings and
      engines (argmin over floats would otherwise be plan-dependent);
    - new means are decimal sums cast to double, divided by the count
      and rounded to ``round_digits`` — each iteration's centroids are
      therefore EXACTLY representable inputs to the next iteration,
      which is what makes an external SQL oracle possible for the whole
      training run, not just one step.

    Determinism contract: seeds are the ``k`` smallest ids' vectors
    (cell i = rank-i id); argmin ties break toward the smaller cell id;
    a cell that loses all members keeps its previous centroid. Fixed
    ``iterations`` (a coarse quantizer wants a handful of Lloyd rounds,
    not convergence detection — at 10^10 vectors each extra round is a
    full corpus pass).

    100 TB design: train on a deterministic sample (``sample_mod=m``
    keeps ids with ``id % m == 0`` — arithmetic, so an oracle can
    reproduce it; k-means for a coarse quantizer NEVER needs the full
    corpus), then assign the full corpus once via the index's Arrow
    GEMM path. The k-row seed lookup is a sort-limit (TakeOrdered, no
    global sort); the collect is k ids — bounded, like the IVF probe
    set. Reference analogue: none (training-pipeline addition, same
    family as ``ivf_topk``).
    """
    from pyspark.sql.window import Window

    base = embeddings.select(
        F.col(id_col).cast("long").alias("id"),
        F.posexplode(vec_col).alias("pos", "val"),
    ).select("id", F.col("pos").cast("long").alias("pos"), F.col("val").cast("double").alias("val"))
    if sample_mod is not None:
        base = base.filter(F.pmod(F.col("id"), F.lit(sample_mod)) == 0)

    # seeds: the k smallest sampled ids, cell = rank. Driver-side k ids
    # (bounded — same justified-collect shape as the IVF probe-cell set).
    seed_ids = [r[0] for r in base.select("id").distinct().orderBy("id").limit(k).collect()]
    if len(seed_ids) < k:
        raise ValueError(f"need >= {k} distinct ids to seed {k} cells, got {len(seed_ids)}")
    spark = embeddings.sparkSession
    seeds = spark.createDataFrame(
        [(int(i), int(c)) for c, i in enumerate(seed_ids)], "id long, cell long"
    )
    cent = (
        base.join(F.broadcast(seeds), "id")
        .select("cell", "pos", F.col("val").alias("cval"))
    )

    members = None
    for _ in range(iterations):
        dists = (
            base.join(F.broadcast(cent), "pos")
            .groupBy("id", "cell")
            .agg(
                F.sum(
                    ((F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval"))).cast(
                        "decimal(28,16)"
                    )
                ).alias("dist")
            )
        )
        w = Window.partitionBy("id").orderBy("dist", "cell")
        assign = (
            dists.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
            .select("id", "cell")
        )
        upd = (
            assign.join(base, "id")
            .groupBy("cell", "pos")
            .agg(
                F.round(
                    F.sum(F.col("val").cast("decimal(28,16)")).cast("double") / F.count("val"),
                    round_digits,
                ).alias("nval")
            )
        )
        # empty-cell guard: a cell with no members keeps its previous
        # centroid (deterministic; the alternative — dropping the cell —
        # would silently change k mid-run)
        cent = (
            cent.join(upd, ["cell", "pos"], "left")
            .select("cell", "pos", F.coalesce("nval", "cval").alias("cval"))
        )
        members = assign.groupBy("cell").agg(F.count("id").alias("n_members"))

    return (
        cent.join(members, "cell", "left")
        .select(
            "cell",
            "pos",
            F.col("cval").alias("centroid"),
            F.coalesce("n_members", F.lit(0)).alias("n_members"),
        )
    )


def centroids_matrix(trained: DataFrame) -> np.ndarray:
    """Collect a ``train_centroids`` result into the (k × dim) float64
    ndarray that ``ivf_topk(centroids=...)`` / ``IvfIndex.create`` /
    ``retrain_begin`` take. k × dim doubles — kilobytes, the
    model-artifact handoff."""
    rows = trained.select("cell", "pos", "centroid").collect()
    k = max(r["cell"] for r in rows) + 1
    dim = max(r["pos"] for r in rows) + 1
    C = np.zeros((k, dim), dtype=np.float64)
    for r in rows:
        C[r["cell"], r["pos"]] = r["centroid"]
    return C
