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


# ------------------------------------------------ portable hash family
# The default signatures hash with Spark's xxhash64 (fastest JVM path),
# which no external SQL engine reproduces — so hash-based outputs would
# be unverifiable by an independent oracle. The *portable* family below
# is computable identically in Spark and ANSI-ish SQL (DuckDB syntax
# shown), so an oracle can recompute the full LSH pipeline — signatures,
# banding, candidate set, similarity values — bit for bit:
#
#   base  H(s): Spark  conv(substring(md5(s),1,15),16,10)::long
#               DuckDB CAST('0x' || substr(md5(s),1,15) AS BIGINT)
#         (60-bit, non-negative — identical in both engines)
#   slots h_i(x) = (a_i * (H mod p) + b_i) mod p, p = 2^31-1
#         (the classic universal family; products < 2^62, so the
#         arithmetic overflows in neither engine)
#
# Statistical quality is equivalent; the JVM cost is ~2× xxhash64 (md5 +
# string slice), so the default stays xxhash64 and `portable=True` is the
# verification twin with the SAME plan shape (explode → hash-agg → band
# join) — what the driver's DuckDB gate checks end to end.

MINHASH_P = 2_147_483_647  # 2^31 - 1 (prime)
SIMHASH_PORTABLE_BITS = 48  # bits 0..47 of the 60-bit portable hash


def mh_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs for h_i(x) = (a_i*x + b_i) mod p —
    fixed literals shared by the Spark plan and the oracle SQL."""
    return [
        (((2 * i + 1) * 1_299_721) % MINHASH_P, (i * 7_919 + 1) % MINHASH_P)
        for i in range(num_hashes)
    ]


def portable_hash60(col: F.Column) -> F.Column:
    """60-bit cross-engine hash (see module comment for the DuckDB twin)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


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
    portable: bool = False,
) -> DataFrame:
    """Per-doc MinHash signatures the scalable way: explode shingles, one
    groupBy(doc) computing all ``num_hashes`` mins at once — stays inside
    whole-stage codegen and gets map-side partial aggregation, so an
    update-heavy 100 TB corpus shuffles only (id, 64 longs) per doc.
    The slots form a different (re-mixed) hash family than
    ``minhash_signature`` — xxhash64(xxhash64(s), i) vs xxhash64(s, i) —
    with equivalent statistical properties but NOT equal values; don't mix
    signatures from the two paths. Docs with no shingles (< n words) drop
    out instead of producing all-NULL signatures that spuriously collide.

    ``portable=True`` swaps in the cross-engine hash family (see module
    comment) — same plan shape, oracle-recomputable values."""
    # hash the shingle string ONCE to a long, then derive the k slots by
    # re-mixing the 8-byte value — k× cheaper than k string hashes, same
    # uniformity (xxhash64 of independent salts over a hash value)
    base = (
        (portable_hash60(F.col("s")) % MINHASH_P) if portable else F.xxhash64("s")
    )
    toks = (
        spread(docs)
        .select(F.col(id_col).alias("id"), F.explode(shingles(text_col, shingle_n)).alias("s"))
        .select("id", base.alias("sh"))
    )
    if portable:
        aggs = [
            F.min((F.lit(a) * F.col("sh") + F.lit(b)) % MINHASH_P).alias(f"h{i}")
            for i, (a, b) in enumerate(mh_coeffs(num_hashes))
        ]
    else:
        aggs = [F.min(F.xxhash64("sh", F.lit(i))).alias(f"h{i}") for i in range(num_hashes)]
    return (
        toks.groupBy("id")
        .agg(*aggs)
        .select("id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"))
    )


def banded_signatures(
    sig: DataFrame, num_hashes: int, bands: int, portable: bool = False
) -> tuple[DataFrame, list[str]]:
    """Explode a ``(id, sig)`` signature frame into LSH band rows and
    return ``(banded, join_keys)`` — the shared banding step of the
    self-join (``minhash_lsh_pairs``) and the incremental index probe
    (``dedup_index.MinHashIndex``), so both sides of an index lookup are
    guaranteed the identical band keys.

    Default family: band key = xxhash64 of the band's slot slice (one
    long). ``portable=True``: the band key is the r raw slot values
    themselves — wider, but recomputable by an external SQL oracle."""
    r = num_hashes // bands
    if portable:
        # oracle-recomputable banding: the band key is the r raw slot
        # values themselves (no bucket hash an external engine would have
        # to reproduce). Join-key width is r longs instead of one — fine:
        # the banded row is still ∝ docs × bands.
        slot_keys = [f"k{j}" for j in range(r)]
        banded = sig.select(
            "id",
            "sig",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda b: F.struct(
                        b.alias("band"),
                        *[
                            F.element_at("sig", b * r + j + 1).alias(f"k{j}")
                            for j in range(r)
                        ],
                    ),
                )
            ).alias("bb"),
        ).select("id", "sig", "bb.*")
        return banded, ["band", *slot_keys]
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
    return banded, ["band", "bucket"]


def est_jaccard_col(num_hashes: int, a: str = "sig_a", b: str = "sig_b") -> F.Column:
    """Estimated Jaccard from two signature columns (default
    ``sig_a``/``sig_b``): matching slots / k. HOF (interpreted) —
    applied to CANDIDATES only, never the corpus."""
    matches = F.size(
        F.filter(
            F.zip_with(a, b, lambda x, y: (x == y).cast("int")), lambda m: m == 1
        )
    )
    return matches / F.lit(num_hashes)


def _capped_bucket_pairs(
    banded: DataFrame,
    join_keys: list[str],
    sig_by_id: DataFrame,
    sig_col: str,
    out_a: str,
    out_b: str,
    bucket_cap: int,
    metric,
) -> DataFrame:
    """Candidate pairs from LSH buckets with a per-bucket explosion guard.

    A degenerate corpus (millions of byte-near-identical docs) collapses
    into ONE bucket, whose self-join is ~n²/2 pairs — the only quadratic
    cliff in the dedup family. Buckets over ``bucket_cap`` members
    short-circuit: emit only the star (min-id representative, member) —
    n-1 pairs — bounding work at O(Σ min(n_bucket, cap)·n_bucket).
    Verification (est-similarity / Hamming filter) still runs on every
    emitted pair.

    ``metric(col_a, col_b) -> Column`` computes the caller's
    verification metric from two signature columns; it is evaluated
    INLINE, before the pair dedupe (r8, guide §2.3) — a pair emitted by
    several buckets has identical signatures each time, so deduping
    ``(out_a, out_b, __metric)`` is exact while shuffling fixed-width
    rows instead of signature payloads (and keeps the dedupe a
    HashAggregate). Output columns: ``out_a, out_b, __metric``.

    The cap is a RECALL-LOSING approximation, not an exact rewrite: an
    LSH bucket only certifies agreement on ONE band/bit-chunk, so two
    members of an oversized bucket can be true near-duplicates of each
    other while each of their rep-pairs fails the downstream similarity
    verification — those member↔member pairs are dropped. The trade is
    deliberate: a bucket only exceeds a sane cap when its members are
    *overwhelmingly* near-identical (the degenerate-corpus case, where
    the star decision is right for virtually every member), and the
    alternative is the n² cliff. Callers needing exact recall on a
    suspect bucket can re-run the family with more bands / a larger cap
    over that slice.
    """
    sizes = banded.groupBy(*join_keys).agg(F.count("*").alias("__n"))
    sized = banded.join(sizes, on=join_keys)
    small = sized.filter(F.col("__n") <= bucket_cap).drop("__n")
    big = sized.filter(F.col("__n") > bucket_cap).drop("__n")
    a, b = small.alias("a"), small.alias("b")
    pairs_small = (
        a.join(b, on=join_keys)
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias(out_a),
            F.col("b.id").alias(out_b),
            metric(F.col(f"a.{sig_col}"), F.col(f"b.{sig_col}")).alias("__metric"),
        )
    )
    reps = big.groupBy(*join_keys).agg(F.min("id").alias("__rep"))
    rep_sig = reps.join(
        sig_by_id.select(F.col("id").alias("__rep"), F.col(sig_col).alias("__sa")),
        on="__rep",
    )
    pairs_big = (
        big.join(rep_sig, on=join_keys)
        .filter(F.col("id") != F.col("__rep"))
        .select(
            F.col("__rep").alias(out_a),
            F.col("id").alias(out_b),
            metric(F.col("__sa"), F.col(sig_col)).alias("__metric"),
        )
    )
    return pairs_small.unionByName(pairs_big).dropDuplicates([out_a, out_b])


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable: bool = False,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Approximate Jaccard-similar pairs via banded MinHash LSH.

    rows-per-band r = num_hashes/bands; a pair collides in a band iff all
    r slots match → P(candidate) ≈ 1-(1-j^r)^bands. Candidates are
    verified by estimated similarity (matching signature slots / k) and
    filtered at ``threshold``.

    Scale path: signatures are one narrow row per doc; the bucket join
    shuffles only (band, bucket-hash, id); no all-pairs stage exists.
    ``bucket_cap`` guards the one quadratic cliff left — a degenerate
    corpus collapsing into one bucket — by short-circuiting oversized
    buckets to representative-star pairs (see ``_capped_bucket_pairs``);
    None (default) keeps the exact banded semantics the oracle recomputes.

    Cache lifetime: the signature DataFrame is ``persist()``-ed because
    the self-join would otherwise recompute the shingle pipeline twice;
    the blocks live until the session evicts them (LRU) or the caller
    calls ``spark.catalog.clearCache()``. Long-lived sessions running
    many dedup passes should materialize signatures to a table instead.
    """
    # persist: the self-join's two aliases would otherwise recompute the
    # whole shingle→hash→aggregate pipeline twice. Signatures are
    # (id, k longs) — a fraction of a percent of corpus bytes, so this is
    # also the right call at 100 TB (or materialize them to a table).
    sig = minhash_signatures(
        docs.filter(F.length(F.col(text_col)) > 0),
        id_col,
        text_col,
        num_hashes,
        shingle_n,
        portable=portable,
    ).persist()
    banded, join_keys = banded_signatures(sig, num_hashes, bands, portable=portable)
    if bucket_cap is not None:
        cand = _capped_bucket_pairs(
            banded, join_keys, sig, "sig", "a_id", "b_id", bucket_cap,
            metric=lambda x, y: est_jaccard_col(num_hashes, x, y),
        )
        return (
            cand.filter(F.col("__metric") >= threshold)
            .select("a_id", "b_id", F.round("__metric", 6).alias("est_jaccard"))
        )
    # Verify BEFORE deduping band collisions (r8, guide §2.3): a pair
    # colliding in several bands has the same signatures each time, so
    # its estimate is identical — computing it inline and deduping
    # (a_id, b_id, est) shuffles ~24 bytes per candidate instead of two
    # k-long signature arrays, the threshold filter drops non-pairs
    # before the exchange, and the fixed-width first(est) buffer keeps
    # the dedupe a HashAggregate (carrying the arrays through
    # dropDuplicates compiled to a SortAggregate pair).
    a, b = banded.alias("a"), banded.alias("b")
    est = est_jaccard_col(num_hashes, "a.sig", "b.sig")
    return (
        a.join(b, on=join_keys)
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            est.alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .dropDuplicates(["a_id", "b_id"])
        .select("a_id", "b_id", F.round("est_jaccard", 6).alias("est_jaccard"))
    )


def simhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", portable: bool = False
) -> DataFrame:
    """Per-doc SimHash computed the scalable way: explode tokens, one
    groupBy(doc) aggregating all signed bit-sums at once (map-side
    combine), then pack bits. One shuffle of (id, nbits ints).

    Default: 64 bits from xxhash64. ``portable=True``: 48 bits from the
    cross-engine hash family (see module comment) — every step (token
    hash, bit sums, sign packing) is integer arithmetic an external SQL
    oracle recomputes exactly. Empty texts are dropped in portable mode
    (their single empty token carries no signal)."""
    nbits = SIMHASH_PORTABLE_BITS if portable else 64
    src = docs.filter(F.length(F.col(text_col)) > 0) if portable else docs
    toks = spread(src).select(
        F.col(id_col).alias("id"), F.explode(shingles(text_col, 1)).alias("tok")
    ).withColumn("h", portable_hash60(F.col("tok")) if portable else F.xxhash64("tok"))
    sums = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(nbits)
        ]
    )
    weight = lambda b: 2**b if (portable or b < 63) else -(2**63)  # noqa: E731
    packed = sums.select(
        "id",
        F.aggregate(
            F.array(*[F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long") * weight(b)).otherwise(F.lit(0).cast("long")) for b in range(nbits)]),
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
    portable: bool = False,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash banding: split the signature into 4
    equal chunks (16 bits each for the 64-bit default, 12 for the 48-bit
    portable family) — any pair within Hamming distance 3 shares ≥1 exact
    chunk (pigeonhole), so candidates come from 4 equi-joins, then exact
    Hamming verification via bit_count(xor)."""
    sigs = simhash_signatures(docs, id_col, text_col, portable=portable).persist()
    nbits = SIMHASH_PORTABLE_BITS if portable else 64
    chunk_bits = nbits // 4
    mask = (1 << chunk_bits) - 1
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
                        F.shiftright(F.col("simhash"), c * chunk_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cc"),
    ).select("id", "simhash", F.col("cc.chunk").alias("chunk"), F.col("cc.val").alias("val"))
    if bucket_cap is not None:
        cand = _capped_bucket_pairs(
            chunks, ["chunk", "val"], sigs, "simhash", "a_id", "b_id", bucket_cap,
            metric=lambda x, y: F.bit_count(x.bitwiseXOR(y)),
        )
        return (
            cand.filter(F.col("__metric") <= max_hamming)
            .select("a_id", "b_id", F.col("__metric").alias("hamming"))
        )
    # verify before dedupe (r8, guide §2.3 — see minhash_lsh_pairs): a
    # pair colliding in several chunks gets the same Hamming distance
    # each time, so the distance filter runs inline and the chunk-
    # collision dedupe aggregates (a_id, b_id, hamming) — fewer, narrower
    # rows through the exchange, nothing changed in the output
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(b, on=["chunk", "val"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["a_id", "b_id"])
        .select("a_id", "b_id", "hamming")
    )


# ------------------------------------------------------------ oracle SQL
# ANSI-ish (DuckDB-dialect) recomputations of the *portable* pipelines —
# the independent verification twins the driver's correctness gate runs.
# Generated from the same constants (mh_coeffs, MINHASH_P,
# SIMHASH_PORTABLE_BITS) as the Spark plans, so the two can never drift.

_NORM_CTE = r"""
norm AS (
  SELECT doc_id AS id, lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS t
  FROM documents WHERE length(text) > 0
)"""


def minhash_lsh_oracle_sql(
    threshold: float = 0.7, num_hashes: int = 64, bands: int = 16, shingle_n: int = 3
) -> str:
    """DuckDB SQL computing exactly minhash_lsh_pairs(..., portable=True)."""
    assert shingle_n == 3, "oracle template is written for 3-gram shingles"
    r = num_hashes // bands
    p = MINHASH_P
    slot_mins = ",\n    ".join(
        f"min(({a} * hm + {b}) % {p}) AS h{i}" for i, (a, b) in enumerate(mh_coeffs(num_hashes))
    )
    sig_list = ", ".join(f"h{i}" for i in range(num_hashes))
    band_keys = ",\n    ".join(f"sig[{r}*band + {j + 1}] AS k{j}" for j in range(r))
    join_keys = ", ".join(["band"] + [f"k{j}" for j in range(r)])
    return rf"""
WITH {_NORM_CTE.strip()}, words AS (
  SELECT id, regexp_split_to_array(t, ' ') AS w FROM norm
), grams AS (
  SELECT id, list_distinct(list_transform(range(1, greatest(len(w) - 1, 1)),
      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
  FROM words WHERE len(w) >= 3
), sh AS (
  SELECT id, unnest(g) AS s FROM grams
), hashed AS (
  SELECT id, CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % {p} AS hm FROM sh
), slots AS (
  SELECT id,
    {slot_mins}
  FROM hashed GROUP BY id
), sigs AS (
  SELECT id, [{sig_list}] AS sig FROM slots
), banded AS (
  SELECT id, sig, band,
    {band_keys}
  FROM sigs, (SELECT unnest(generate_series(0, {bands - 1})) AS band)
), cand AS (
  SELECT DISTINCT a.id AS a_id, b.id AS b_id, a.sig AS sa, b.sig AS sb
  FROM banded a JOIN banded b USING ({join_keys})
  WHERE a.id < b.id
)
SELECT a_id, b_id,
  round(len(list_filter(list_zip(sa, sb), pr -> pr[1] = pr[2])) / {num_hashes}.0, 6)
    AS est_jaccard
FROM cand
WHERE len(list_filter(list_zip(sa, sb), pr -> pr[1] = pr[2])) / {num_hashes}.0 >= {threshold}
"""


def simhash_oracle_sql(max_hamming: int = 3) -> str:
    """DuckDB SQL computing exactly simhash_near_pairs(..., portable=True)."""
    nbits = SIMHASH_PORTABLE_BITS
    chunk_bits = nbits // 4
    chunk_mod = 1 << chunk_bits
    bit_sums = ",\n    ".join(
        f"sum(CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(nbits)
    )
    pack = " + ".join(f"(CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(nbits))
    chunk_div = " ".join(
        f"WHEN {c} THEN {chunk_mod ** c}" for c in range(4)
    )
    return rf"""
WITH {_NORM_CTE.strip()}, toks AS (
  SELECT id, unnest(list_distinct(regexp_split_to_array(t, ' '))) AS tok FROM norm
), hashed AS (
  SELECT id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM toks
), bitsums AS (
  SELECT id,
    {bit_sums}
  FROM hashed GROUP BY id
), packed AS (
  SELECT id, CAST({pack} AS BIGINT) AS s FROM bitsums
), chunks AS (
  SELECT id, s, chunk, (s // (CASE chunk {chunk_div} END)) % {chunk_mod} AS val
  FROM packed, (SELECT unnest(generate_series(0, 3)) AS chunk)
), cand AS (
  SELECT DISTINCT a.id AS a_id, b.id AS b_id, a.s AS sa, b.s AS sb
  FROM chunks a JOIN chunks b USING (chunk, val)
  WHERE a.id < b.id
)
SELECT a_id, b_id, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
"""


def minhash_incremental_oracle_sql(
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    batch_mod: int = 3,
) -> str:
    """DuckDB SQL for the INCREMENTAL index probe
    (``dedup_index.MinHashIndex``): recompute the full one-shot banded
    pipeline over all documents, keep exactly the cross pairs — one side
    in the probe batch (``doc_id % batch_mod = 0``), the other in the
    indexed corpus — reshaped to (new_id, match_id). Valid because the
    index reuses the one-shot path's signature/banding/verify functions
    value-for-value, and candidate generation is per-pair (corpus-corpus
    and batch-batch collisions cannot affect cross pairs)."""
    full = minhash_lsh_oracle_sql(threshold, num_hashes, bands, shingle_n)
    return f"""
SELECT CASE WHEN a_id % {batch_mod} = 0 THEN a_id ELSE b_id END AS new_id,
       CASE WHEN a_id % {batch_mod} = 0 THEN b_id ELSE a_id END AS match_id,
       est_jaccard
FROM ({full}) pairs
WHERE (a_id % {batch_mod} = 0) <> (b_id % {batch_mod} = 0)
"""


# ------------------------------------------------- connected components


def _free_checkpoint(df: DataFrame) -> bool:
    """Deterministically release a ``localCheckpoint``'s executor blocks.
    ``DataFrame.unpersist()`` does NOT free them (the blocks belong to
    the checkpointed RDD inside the plan's LogicalRDD, otherwise
    reclaimed only when the JVM eventually GCs the reference) — without
    this, an iterative loop pins one full table copy per round instead
    of O(1). MUST be handed the checkpointed DataFrame itself — a
    projection of it is a Project plan whose ``logical().rdd()`` does
    not exist, so the block would silently survive (the exact leak this
    returns False for; tests assert on it). Callers must not use ``df``
    afterwards."""
    try:
        df._jdf.queryExecution().logical().rdd().unpersist(False)
        return True
    except Exception:
        return False


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iterations: int = 50,
    algorithm: str = "hashmin",
) -> DataFrame:
    """Connected components over an undirected near-dup pair graph via
    hash-min label propagation: every node starts labelled with its own
    id; each round every node takes the min label among itself and its
    neighbours; fixpoint = per-component min id.

    This is the stage every real dedup pipeline needs between *pairs*
    (what MinHash/SimHash/Jaccard emit) and *decisions* (which doc to
    keep): duplicate relations are not transitive per-pair, so survivors
    must be picked per connected component, not per pair.

    Scale design (100 TB / 10^9 nodes):

    - the edge list is shuffled ONCE onto the join key and persisted;
      every round's ``edges ⋈ labels`` is then co-partitioned, so a
      round costs two shuffles of the (fixed-width) label table only —
      the payload-free ``(id, component)`` pairs, never document text.
    - labels are ``localCheckpoint``-ed every round: lineage stays O(1)
      instead of growing by two joins per round (the classic iterative-
      algorithm OOM on long chains). On a real cluster with executor
      loss to survive, swap in reliable ``checkpoint()`` against the
      checkpoint dir — same call site.
    - convergence is detected from the SAME materialized round (count of
      strictly-decreased labels — labels are monotone non-increasing),
      no extra join.
    - rounds needed = graph diameter (hash-min). Near-dup components
      are overwhelmingly small/dense (dup clusters), so diameter is
      small in practice; for adversarial long-chain graphs pass
      ``algorithm="star"`` — the alternating large-star/small-star
      algorithm (``_star_components``) converges in O(log^2 n) rounds
      regardless of diameter, same output contract.

    Returns ``(id, component)`` for every id present in ``pairs``
    (isolated docs are absent — callers union them back, see
    ``dedup_canonical``).
    """
    half = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    if algorithm == "star":
        return _star_components(half, max_iterations)
    if algorithm != "hashmin":
        raise ValueError(f"unknown algorithm {algorithm!r} (hashmin | star)")
    edges = (
        half.unionByName(half.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .repartition("src")
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    # handle to the ACTUAL checkpointed plan: freeing must go through it —
    # a projection of it hides the LogicalRDD from _free_checkpoint and
    # the blocks would accumulate O(rounds) instead of O(1)
    labels_ckpt = labels
    try:
        for _ in range(max_iterations):
            nbr_min = (
                edges.join(
                    labels.select(F.col("id").alias("src"), F.col("component").alias("lbl")),
                    "src",
                )
                .groupBy("dst")
                .agg(F.min("lbl").alias("nbr"))
            )
            nxt = (
                labels.join(nbr_min, labels["id"] == nbr_min["dst"], "left")
                .select(
                    labels["id"],
                    labels["component"].alias("prev"),
                    F.least(
                        labels["component"], F.coalesce(F.col("nbr"), labels["component"])
                    ).alias("component"),
                )
                .localCheckpoint(eager=True)
            )
            changed = nxt.filter(F.col("component") < F.col("prev")).count()
            # nxt is fully materialized — the previous round's checkpoint
            # blocks are dead weight from here; free them so peak storage
            # is O(1) table copies, not O(rounds)
            prev_ckpt, labels_ckpt = labels_ckpt, nxt
            labels = nxt.select("id", "component")
            _free_checkpoint(prev_ckpt)
            if changed == 0:
                break
        else:
            _free_checkpoint(labels_ckpt)
            # unconverged labels can SPLIT a component (docs silently land
            # in different clusters) — that is a wrong answer, never
            # return it
            raise RuntimeError(
                f"connected_components did not converge in {max_iterations} rounds "
                "(graph diameter exceeds the bound); raise max_iterations"
            )
    finally:
        edges.unpersist()
    return labels


def _star_edges_once(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One large-star + small-star round over a canonical (a > b) edge
    set; returns (large_star_output, small_star_output)."""
    nb = edges.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    mins = nb.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.withColumn("mn", F.least("mn", F.col("u")))
    large = (
        nb.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("a"), F.col("mn").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    sm = large.groupBy("a").agg(F.min("b").alias("mn"))
    small = (
        sm.select("a", F.col("mn").alias("b"))
        .unionByName(
            large.join(sm, "a")
            .filter(F.col("b") != F.col("mn"))
            .select(F.col("b").alias("a"), F.col("mn").alias("b"))
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    return large, small


def _star_components(half: DataFrame, max_iterations: int) -> DataFrame:
    """Alternating large-star / small-star connected components
    (Kiveris et al., "Connected Components in MapReduce and Beyond"):
    each round, large-star hangs every strictly-larger neighbour of a
    node onto its neighbourhood minimum, then small-star re-hangs the
    smaller neighbours — O(log^2 n) rounds regardless of graph
    DIAMETER, unlike hash-min propagation whose round count is the
    diameter. Same per-round plan shape: narrow (long, long) edge
    frames only, fixed-width hash aggregations, no per-node neighbour
    lists collected (hot nodes never build an in-memory adjacency).
    Fixpoint: the edge set is a union of stars centred at each
    component's min id. Output contract identical to hash-min."""
    nodes = (
        half.select(F.col("src").alias("id"))
        .unionByName(half.select(F.col("dst").alias("id")))
        .distinct()
    )
    edges = (
        half.filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("a"), F.least("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()
    for _ in range(max_iterations):
        _, small = _star_edges_once(edges)
        small = small.localCheckpoint(eager=True)
        # both sides are distinct sets, so equal counts + one-sided
        # containment == set equality; the previous round's count is
        # carried forward, so a typical (non-final) round costs ONE
        # Spark action — the exceptAll only runs when counts agree
        n_small = small.count()
        converged = n_small == n_edges and small.exceptAll(edges).isEmpty()
        n_edges = n_small
        prev_ckpt, edges = edges, small
        _free_checkpoint(prev_ckpt)  # comparison done; round k-1 is dead
        if converged:
            break
    else:
        _free_checkpoint(edges)
        raise RuntimeError(
            f"star connected_components did not converge in {max_iterations} "
            "rounds; raise max_iterations"
        )
    stars = edges.select(F.col("a").alias("id"), F.col("b").alias("component"))
    return (
        nodes.join(stars, "id", "left")
        .groupBy("id")
        .agg(F.min(F.coalesce("component", F.col("id"))).alias("component"))
    )


def dedup_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> DataFrame:
    """Per-document dedup decision: assign every document its near-dup
    component id and flag the canonical survivor (min doc id in the
    component; isolated docs are their own canonical singleton).

    Output: ``(doc_id, component, is_canonical)`` — downstream keeps
    ``is_canonical`` rows and drops the rest. The component table is
    tiny relative to the corpus (only docs that appear in a pair), so
    the final join is broadcast-or-shuffle per AQE; document text never
    moves.

    The survivor is the min doc id PRESENT IN ``docs`` per component —
    not the raw min label — so a pair referencing an id absent from
    ``docs`` (stale index, pairs computed before a filter) can never
    leave a component with zero canonical rows and silently delete the
    whole cluster downstream. Costs one extra narrow shuffle on
    (component, id) pairs."""
    comp = connected_components(pairs, a_col=a_col, b_col=b_col)
    component = F.coalesce(comp["component"], docs[id_col])
    assigned = docs.join(comp, docs[id_col] == comp["id"], "left").select(
        docs[id_col], component.alias("component")
    )
    mins = assigned.groupBy("component").agg(F.min(id_col).alias("__cmin"))
    return assigned.join(mins, "component").select(
        F.col(id_col),
        F.col("component"),
        (F.col(id_col) == F.col("__cmin")).alias("is_canonical"),
    )


def components_oracle_sql(pairs_sql: str) -> str:
    """DuckDB oracle for ``dedup_canonical`` over the ``documents``
    table: transitive closure of the (tiny) pair set via a recursive
    CTE, component = min reachable id, LEFT JOIN back to all docs.
    ``pairs_sql`` is any full SELECT producing (a_id, b_id, ...) —
    e.g. ``minhash_lsh_oracle_sql(...)`` — evaluated as a subquery."""
    return f"""
WITH RECURSIVE pairs AS (
  SELECT a_id, b_id FROM ({pairs_sql}) q
), edges AS (
  SELECT a_id AS u, b_id AS v FROM pairs
  UNION
  SELECT b_id, a_id FROM pairs
), reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
), comp AS (
  SELECT u AS id, least(u, min(v)) AS component FROM reach GROUP BY u
)
SELECT doc_id, component,
       doc_id = min(doc_id) OVER (PARTITION BY component) AS is_canonical
FROM (
  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
) assigned
"""
