"""Similarity search over an embedding column (array<float>).

Two paths over ``embeddings(vec_id, embedding, …)``:

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

Hyperplanes are derived from xxhash64 (deterministic, no RNG state), so
results are stable across runs/partitionings — same rule as the CDC
generator.
"""

from __future__ import annotations

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
    in [-1,1) derived from xxhash64(plane, dim_index)."""
    comps = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (F.pmod(F.xxhash64(F.lit(plane), i), F.lit(2_000_001)) - 1_000_000) / 1_000_000.0,
    )
    return (F.aggregate(F.zip_with(vec, comps, lambda x, h: x.cast("double") * h), F.lit(0.0), lambda a, v: a + v) > 0).cast("int")


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

    def sig_cols(df: DataFrame, vcol: str) -> DataFrame:
        # bit positions are static → fold with literal weights (shiftleft
        # needs a literal int for numBits, not a Column)
        for t in range(tables):
            terms = [
                _hyperplane_bit(F.col(vcol), t * bits + b, dim).cast("long") * F.lit(1 << b)
                for b in range(bits)
            ]
            bucket = terms[0]
            for term in terms[1:]:
                bucket = bucket + term
            df = df.withColumn(f"bucket_{t}", bucket)
        return df

    emb = sig_cols(embeddings.select(id_col, vec_col), vec_col)
    qs = sig_cols(queries.select(query_id_col, query_vec_col), query_vec_col)
    emb_b = emb.select(
        id_col,
        vec_col,
        F.explode(
            F.array(*[F.struct(F.lit(t).alias("t"), F.col(f"bucket_{t}").alias("bk")) for t in range(tables)])
        ).alias("tb"),
    ).select(id_col, vec_col, F.col("tb.t").alias("t"), F.col("tb.bk").alias("bk"))
    probes: list[int] = [0]
    if probe_hamming >= 1:
        probes += [1 << b for b in range(bits)]
    if probe_hamming >= 2:
        probes += [(1 << b1) | (1 << b2) for b1 in range(bits) for b2 in range(b1 + 1, bits)]
    q_b = (
        qs.select(
            query_id_col,
            query_vec_col,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("t"),
                            F.col(f"bucket_{t}").bitwiseXOR(F.lit(p)).alias("bk"),
                        )
                        for t in range(tables)
                        for p in probes
                    ]
                )
            ).alias("tb"),
        )
        .select(query_id_col, query_vec_col, F.col("tb.t").alias("t"), F.col("tb.bk").alias("bk"))
        .dropDuplicates([query_id_col, "t", "bk"])
    )

    cand = (
        emb_b.join(F.broadcast(q_b), on=["t", "bk"])
        .dropDuplicates([query_id_col, id_col])
        .withColumn("cosine", cosine(vec_col, query_vec_col))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("cosine", 6).alias("cosine"), "rank")
    )
