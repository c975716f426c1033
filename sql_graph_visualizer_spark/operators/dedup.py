"""Document deduplication operators for large-scale training-data pipelines.

Five strategies over a ``documents(doc_id, text, …)`` table, all
expression-first (JVM/codegen hot path; zero per-row Python):

- **exact**: hash-groupBy on a normalized text digest — one shuffle,
  map-side combined.
- **n-gram Jaccard**: word-shingle explode → self-join on shingle →
  pair-count / union-size. Exact but quadratic-ish in shared shingles —
  the small-scale oracle for the approximate methods.
- **MinHash + LSH**: per-doc minhash signature (k independent hash
  slots via xxhash64 with k salts — built-in, vectorized), banded into
  LSH buckets, candidate pairs from bucket join, verified by signature
  similarity. The 100 TB scale path: cost ∝ docs × k + bucket
  collisions, never all-pairs.
- **SimHash**: 64-bit weighted-token fingerprint via explode +
  bit-position aggregation; near-dups = signatures within small Hamming
  distance, found by banding the 64 bits into chunks (exact-match join
  per chunk).
- **embedding cosine**: see operators/similarity.py (near-dup = cosine
  above threshold).

Reference analogue: none (the reference dedupes only node identities —
``graph_aggregate.go:46-59``); these are the training-pipeline additions
the graft calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_text(col: F.Column) -> F.Column:
    """Canonical form for exact dedup: collapse whitespace, lowercase."""
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))


def spread(docs: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Ensure enough input partitions before CPU-heavy per-doc work
    (shingling/hashing). A small corpus read from one parquet file is one
    partition — every downstream explode+aggregate then runs map-side on
    a single core. On a real cluster inputs arrive in many splits and
    this is a no-op; locally it unlocks the other N-1 cores."""
    sc = docs.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if docs.rdd.getNumPartitions() >= target:
        return docs
    return docs.repartition(target)


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one representative (min id) per distinct normalized text.

    Single hash aggregation; at 100 TB the digest groupBy shuffles only
    (digest, id) pairs, not the documents themselves.
    """
    digest = F.md5(normalize_text(F.col(text_col))).alias("text_hash")
    return (
        docs.select(F.col(id_col), digest)
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
    )


def shingles(text_col: str, n: int = 3) -> F.Column:
    """Distinct word n-gram shingles as an array column (expression-only:
    split → sliding windows via transform over index range)."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    k = F.greatest(F.size(words) - (n - 1), F.lit(0))
    idx = F.sequence(F.lit(0), k - 1)
    gram = lambda i: F.concat_ws(" ", *[F.element_at(words, i + j + 1) for j in range(n)])  # noqa: E731
    return F.when(k > 0, F.array_distinct(F.transform(idx, gram))).otherwise(
        F.array().cast("array<string>")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact Jaccard-similar pairs (a_id < b_id) on word n-gram shingle sets.

    Plan shape: explode → self-equi-join on shingle (Catalyst hash join)
    → pair aggregation → |A∪B| = |A|+|B|-|A∩B|. The shingle join is the
    scale limiter (hot shingles fan out) — at 100 TB use minhash_lsh_pairs
    and verify survivors with this on the candidate set only.
    """
    # the shingle set feeds three plan branches (a-side, b-side, sizes);
    # persist so the explode+normalize runs once, not three times
    sh = (
        spread(docs)
        .select(
            F.col(id_col).alias("id"),
            F.explode(shingles(text_col, n)).alias("shingle"),
        )
        .persist()
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("a_id"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("b_id"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signature(text_col: str, num_hashes: int = 64, shingle_n: int = 3) -> F.Column:
    """MinHash signature as array<long>: slot i = min over shingles of
    xxhash64(shingle, salt=i), as a single column expression.

    Note: Spark evaluates higher-order functions (transform/array_min)
    interpreted, outside whole-stage codegen — fine for ad-hoc use, but
    the scale path is ``minhash_signatures`` below (explode + hash
    aggregation, codegen'd and map-side combined)."""
    sh = shingles(text_col, shingle_n)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(F.transform(sh, lambda s: F.xxhash64(s, i))),
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-doc MinHash signatures the scalable way: explode shingles, one
    groupBy(doc) computing all ``num_hashes`` mins at once — stays inside
    whole-stage codegen and gets map-side partial aggregation, so an
    update-heavy 100 TB corpus shuffles only (id, 64 longs) per doc.
    Same values as ``minhash_signature`` (min over an identical hash set);
    docs with no shingles (< n words) drop out instead of producing
    all-NULL signatures that spuriously collide."""
    # hash the shingle string ONCE to a long, then derive the k slots by
    # re-mixing the 8-byte value — k× cheaper than k string hashes, same
    # uniformity (xxhash64 of independent salts over a hash value)
    toks = (
        spread(docs)
        .select(F.col(id_col).alias("id"), F.explode(shingles(text_col, shingle_n)).alias("s"))
        .select("id", F.xxhash64("s").alias("sh"))
    )
    aggs = [F.min(F.xxhash64("sh", F.lit(i))).alias(f"h{i}") for i in range(num_hashes)]
    return (
        toks.groupBy("id")
        .agg(*aggs)
        .select("id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Approximate Jaccard-similar pairs via banded MinHash LSH.

    rows-per-band r = num_hashes/bands; a pair collides in a band iff all
    r slots match → P(candidate) ≈ 1-(1-j^r)^bands. Candidates are
    verified by estimated similarity (matching signature slots / k) and
    filtered at ``threshold``.

    Scale path: signatures are one narrow row per doc; the bucket join
    shuffles only (band, bucket-hash, id); no all-pairs stage exists.
    """
    r = num_hashes // bands
    # persist: the self-join's two aliases would otherwise recompute the
    # whole shingle→hash→aggregate pipeline twice. Signatures are
    # (id, k longs) — a fraction of a percent of corpus bytes, so this is
    # also the right call at 100 TB (or materialize them to a table).
    sig = minhash_signatures(
        docs.filter(F.length(F.col(text_col)) > 0), id_col, text_col, num_hashes, shingle_n
    ).persist()
    banded = sig.select(
        "id",
        "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"), F.xxhash64(F.slice("sig", b * r + 1, r), b).alias("bucket")
                ),
            )
        ).alias("bb"),
    ).select("id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["a_id", "b_id"])
    )
    matches = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")), lambda m: m == 1
        )
    )
    return (
        cand.withColumn("est_jaccard", matches / F.lit(num_hashes))
        .filter(F.col("est_jaccard") >= threshold)
        .select("a_id", "b_id", F.round("est_jaccard", 6).alias("est_jaccard"))
    )


def simhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc 64-bit SimHash computed the scalable way: explode tokens,
    one groupBy(doc) aggregating 64 signed bit-sums at once (map-side
    combine), then pack bits. One shuffle of (id, 64 ints)."""
    toks = spread(docs).select(
        F.col(id_col).alias("id"), F.explode(shingles(text_col, 1)).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    sums = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(64)
        ]
    )
    packed = sums.select(
        "id",
        F.aggregate(
            F.array(*[F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long") * (2**b if b < 63 else -(2**63))).otherwise(F.lit(0).cast("long")) for b in range(64)]),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("simhash"),
    )
    return packed


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs by SimHash banding: split 64 bits into 4 16-bit
    chunks — any pair within Hamming distance 3 shares ≥1 exact chunk
    (pigeonhole), so candidates come from 4 equi-joins, then exact
    Hamming verification via bit_count(xor)."""
    sigs = simhash_signatures(docs, id_col, text_col).persist()
    # chunk offsets are static → plain Python loop (shiftright needs a
    # literal int for numBits, not a Column)
    chunks = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cc"),
    ).select("id", "simhash", F.col("cc.chunk").alias("chunk"), F.col("cc.val").alias("val"))
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(b, on=["chunk", "val"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .dropDuplicates(["a_id", "b_id"])
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )
