"""Dedup / similarity / text-analysis operators over the testdata tables."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sql_graph_visualizer_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingles,
    simhash_near_pairs,
)
from sql_graph_visualizer_spark.operators.similarity import cosine, cosine_topk, lsh_topk
from sql_graph_visualizer_spark.operators.text import analyze_documents

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_dedup_exact_counts(spark):
    docs = _docs(spark)
    groups = dedup_exact(docs)
    assert groups.agg(F.sum("dup_count")).collect()[0][0] == docs.count()
    # with duplicates injected, the duplicate collapses onto the min id
    dup = docs.unionByName(docs.limit(3).withColumn("doc_id", F.col("doc_id") + 100000))
    g2 = dedup_exact(dup)
    assert g2.filter(F.col("dup_count") >= 2).count() >= 3
    assert g2.count() == groups.count()  # same distinct texts


def test_shingles_and_jaccard_identity(spark):
    docs = _docs(spark).limit(50)
    # identical copy of each doc must appear as a jaccard=1.0 pair
    copies = docs.withColumn("doc_id", F.col("doc_id") + 100000)
    pairs = ngram_jaccard_pairs(docs.unionByName(copies), threshold=0.999)
    assert pairs.count() >= 50
    assert pairs.filter(F.col("jaccard") < 1.0).count() == 0


def test_minhash_lsh_finds_near_duplicates(spark):
    docs = _docs(spark).limit(100)
    # append a slightly perturbed copy (drop last 2 words) of each doc
    words = F.split(F.col("text"), " ")
    near = docs.withColumn("doc_id", F.col("doc_id") + 100000).withColumn(
        "text", F.concat_ws(" ", F.slice(words, 1, F.greatest(F.size(words) - 2, F.lit(1))))
    )
    pairs = minhash_lsh_pairs(docs.unionByName(near), threshold=0.5)
    found = {(r.a_id, r.b_id) for r in pairs.collect()}
    hits = sum((i, i + 100000) in found for i in range(100))
    assert hits >= 80  # high recall on near-identical docs
    # and it should NOT claim everything is similar
    assert len(found) < 100 * 5


def test_minhash_portable_matches_default_recall(spark):
    """The portable (oracle-recomputable) hash family is a drop-in for the
    xxhash64 default: same recall property on near-identical docs, and the
    banding emits the same COLUMNS so the two paths are interchangeable."""
    docs = _docs(spark).limit(60)
    words = F.split(F.col("text"), " ")
    near = docs.withColumn("doc_id", F.col("doc_id") + 100000).withColumn(
        "text", F.concat_ws(" ", F.slice(words, 1, F.greatest(F.size(words) - 2, F.lit(1))))
    )
    pairs = minhash_lsh_pairs(docs.unionByName(near), threshold=0.5, portable=True)
    found = {(r.a_id, r.b_id) for r in pairs.collect()}
    assert sum((i, i + 100000) in found for i in range(60)) >= 48
    assert pairs.columns == ["a_id", "b_id", "est_jaccard"]


def test_simhash_portable_exact_copies(spark):
    docs = _docs(spark).limit(40)
    exact_copies = docs.withColumn("doc_id", F.col("doc_id") + 100000)
    pairs = simhash_near_pairs(docs.unionByName(exact_copies), max_hamming=3, portable=True)
    found = {(r.a_id, r.b_id): r.hamming for r in pairs.collect()}
    assert sum(found.get((i, i + 100000)) == 0 for i in range(40)) == 40


def test_repetition_profile_signals(spark):
    """Gopher-style repetition metrics: exact fractions on constructed
    docs, including the 1-word bigram edge (Spark sequence(1,0) counts
    DOWN — guarded)."""
    from sql_graph_visualizer_spark.operators.text import repetition_profile

    docs = spark.createDataFrame(
        [
            (1, "a b a b\na b a b\nunique line"),  # dup lines + repeated grams
            (2, "all words differ here now"),
            (3, "solo"),  # 1 word: no bigrams
            (4, "  "),  # blank: dropped
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_profile(docs).collect()}
    assert set(rows) == {1, 2, 3}
    # doc 1: 3 lines, 2 distinct -> 1/3; words: a=4,b=4 of 10 -> 0.4;
    # bigrams: "a b"=4 ("a b a b\na b a b..." word seq a b a b a b a b unique line) of 9 -> 0.444444
    assert rows[1].dup_line_frac == round(1 - 2 / 3, 6)
    assert rows[1].top_word_frac == 0.4
    assert rows[1].top_bigram_frac == round(4 / 9, 6)
    assert rows[2].dup_line_frac == 0.0
    assert rows[2].top_word_frac == 0.2
    assert rows[3].top_bigram_frac is None  # no bigrams in a 1-word doc


def test_bucket_cap_bounds_degenerate_corpus(spark):
    """The LSH explosion guard (VERDICT r3 #6): 10k byte-identical docs
    collapse into ONE bucket per band — uncapped, that is ~5·10⁷
    candidate pairs; with ``bucket_cap`` the output is the n-1
    representative star, computed in O(n)."""
    n = 10_000
    docs = spark.range(n).select(
        F.col("id").cast("long").alias("doc_id"),
        F.lit("the same document text repeated verbatim everywhere").alias("text"),
    )
    pairs = minhash_lsh_pairs(docs, threshold=0.5, bucket_cap=64).collect()
    assert len(pairs) == n - 1  # star, not n²/2
    assert all(r.a_id == 0 for r in pairs)  # anchored at the min-id rep
    assert all(r.est_jaccard == 1.0 for r in pairs)
    sh = simhash_near_pairs(docs, max_hamming=3, bucket_cap=64).collect()
    assert len(sh) == n - 1
    assert all(r.a_id == 0 and r.hamming == 0 for r in sh)


def test_bucket_cap_no_op_on_normal_corpus(spark):
    """A cap above every real bucket size must not change results —
    the capped path stays oracle-exact for non-degenerate corpora."""
    docs = _docs(spark).limit(60)
    copies = docs.withColumn("doc_id", F.col("doc_id") + 100000)
    corpus = docs.unionByName(copies)
    base = {(r.a_id, r.b_id, r.est_jaccard) for r in minhash_lsh_pairs(corpus, threshold=0.5).collect()}
    capped = {(r.a_id, r.b_id, r.est_jaccard) for r in minhash_lsh_pairs(corpus, threshold=0.5, bucket_cap=10_000).collect()}
    assert base == capped


def test_dedup_oracle_sql_generators():
    """The oracle SQL embeds the same constants as the Spark plans."""
    from sql_graph_visualizer_spark.operators.dedup import (
        MINHASH_P,
        mh_coeffs,
        minhash_lsh_oracle_sql,
        simhash_oracle_sql,
    )

    sql = minhash_lsh_oracle_sql(threshold=0.5)
    a0, b0 = mh_coeffs(1)[0]
    assert f"({a0} * hm + {b0}) % {MINHASH_P}" in sql
    assert ">= 0.5" in sql
    assert "bit_count(xor(sa, sb))" in simhash_oracle_sql(max_hamming=3)


def test_simhash_near_pairs(spark):
    docs = _docs(spark).limit(80)
    exact_copies = docs.withColumn("doc_id", F.col("doc_id") + 100000)
    pairs = simhash_near_pairs(docs.unionByName(exact_copies), max_hamming=3)
    found = {(r.a_id, r.b_id): r.hamming for r in pairs.collect()}
    assert sum(found.get((i, i + 100000)) == 0 for i in range(80)) == 80


def test_cosine_topk_matches_numpy(spark):
    import numpy as np

    emb = _emb(spark)
    queries = emb.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = cosine_topk(emb, queries, k=5).collect()
    pdf = emb.toPandas()
    mat = np.stack(pdf["embedding"].to_numpy())
    ids = pdf["vec_id"].to_numpy()
    for qrow in queries.collect():
        qv = np.array(qrow.query_vec)
        sims = mat @ qv / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qv))
        order = sorted(zip(-sims, ids))[:5]
        expected = [int(i) for _, i in order]
        mine = [r.vec_id for r in got if r.query_id == qrow.query_id]
        assert mine == expected
        # self is its own nearest neighbour
        assert mine[0] == qrow.query_id


def test_lsh_topk_recall(spark):
    emb = _emb(spark)
    queries = emb.limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = cosine_topk(emb, queries, k=3).collect()
    approx = lsh_topk(emb, queries, dim=64, k=3, bits=8, tables=8).collect()
    exact_set = {(r.query_id, r.vec_id) for r in exact}
    approx_set = {(r.query_id, r.vec_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.6
    # the query vector always finds itself (it collides with itself in every table)
    assert all(any(r.query_id == r.vec_id == q.query_id for r in approx) for q in queries.collect())


def test_ivf_topk_pruned_probes_on_clustered_data(spark):
    """IVF's value proposition: on CLUSTERED data, probing a few cells
    finds the true neighbours. Plant 8 clusters (base vector + small
    perturbations, deterministic), query cluster members, and require
    the pruned search (probes=2 of cells=8) to find the same top-3 as
    brute force — neighbours share the query's cell by construction."""
    from sql_graph_visualizer_spark.operators.similarity import cosine_topk, ivf_topk

    dim, per_cluster = 16, 12
    rows = []
    for c in range(8):
        base = [(1.0 if i == (c % dim) else 0.0) + 0.05 * ((c * 31 + i) % 7) for i in range(dim)]
        for j in range(per_cluster):
            vec = [v + 0.01 * ((c * 97 + j * 13 + i) % 5) for i, v in enumerate(base)]
            rows.append((c * per_cluster + j, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") % per_cluster == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {(r.query_id, r.rank): r.vec_id for r in cosine_topk(emb, queries, k=3).collect()}
    pruned = {
        (r.query_id, r.rank): r.vec_id
        for r in ivf_topk(emb, queries, k=3, cells=8, probes=2).collect()
    }
    assert pruned == exact
    # determinism across partitionings (seeded centroids, no RNG)
    again = {
        (r.query_id, r.rank): r.vec_id
        for r in ivf_topk(emb.repartition(7), queries, k=3, cells=8, probes=2).collect()
    }
    assert again == pruned


def test_analyze_documents_profile(spark):
    prof = analyze_documents(_docs(spark)).limit(200)
    rows = prof.collect()
    for r in rows:
        assert r.n_tokens_ws > 0 and r.n_tokens_bpe >= r.n_tokens_ws
        assert 0.0 <= r.quality <= 1.0
        assert 0.0 <= r.punct_ratio <= 1.0
        assert len(r.fingerprint) == 32
    langs = {r.lang_pred for r in rows}
    assert langs <= {"en", "de", "es", "fr", "zh", "und"}


def test_cosine_expression_precision(spark):
    df = spark.createDataFrame([([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])], "a array<float>, b array<float>")
    vals = [r[0] for r in df.select(cosine("a", "b")).collect()]
    assert math.isclose(vals[0], 1.0) and math.isclose(vals[1], 0.0)


def test_ngram_contamination_scores(spark):
    """Benchmark decontamination: a verbatim copy scores 1.0, a partial
    overlap scores its exact distinct-n-gram fraction, clean and
    too-short docs are absent, and repetition cannot inflate a score
    (per-doc n-grams are distinct)."""
    from sql_graph_visualizer_spark.operators.decontam import ngram_contamination

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # verbatim benchmark copy -> 1.0
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            # 5 words prepended: 10 distinct 5-grams... wait compute below
            (2, "totally novel opening words here the quick brown fox jumps"),
            # clean doc, same vocabulary but no shared 5-gram
            (3, "dog lazy the over jumps fox brown quick the tonight"),
            # shorter than n words -> no n-grams -> absent
            (4, "too short for five"),
            # repetition of one contaminated gram + novel tail: distinct
            # grams keep the denominator honest
            (5, "the quick brown fox jumps the quick brown fox jumps "
                "completely unrelated trailing words continue here now"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in ngram_contamination(corpus, bench, n=5).collect()
    }
    assert rows[1].contamination == 1.0 and rows[1].n_matched == rows[1].n_ngrams
    # doc 2: words = 10 -> 6 grams, of which exactly 1 ("the quick brown
    # fox jumps") is in the benchmark
    assert rows[2].n_ngrams == 6 and rows[2].n_matched == 1
    assert abs(rows[2].contamination - round(1 / 6, 6)) < 1e-9
    assert 3 not in rows and 4 not in rows
    # doc 5: 17 words -> 13 gram positions, but the repeated benchmark
    # gram dedups to one -> 12 distinct; exactly one matches
    assert rows[5].n_matched == 1 and rows[5].n_ngrams == 12
    # shuffle-join fallback is value-identical to the broadcast path
    nb = {
        r.doc_id: r
        for r in ngram_contamination(
            corpus, bench, n=5, broadcast_benchmark=False
        ).collect()
    }
    assert {k: (v.n_ngrams, v.n_matched) for k, v in rows.items()} == {
        k: (v.n_ngrams, v.n_matched) for k, v in nb.items()
    }


def test_ngram_contamination_normalized_catches_punct_variants(spark):
    """GPT-3-style normalization (VERDICT r5 #5b): a quote/punctuation
    variant of a benchmark passage is invisible to the plain
    whitespace tokenizer but collides after punctuation-stripping —
    and normalization never creates empty-token grams."""
    from sql_graph_visualizer_spark.operators.decontam import ngram_contamination

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # punctuation variant of the benchmark passage
            (1, '"The quick, brown fox -- jumps over the lazy dog," tonight.'),
            # clean doc with punctuation noise
            (2, "completely unrelated; words... only (nothing) shared here!"),
        ],
        "doc_id long, text string",
    )
    plain = {r.doc_id: r for r in ngram_contamination(corpus, bench, n=5).collect()}
    # plain mode: tokens like '"the' and 'quick,' never match -> absent
    assert 1 not in plain
    norm = {
        r.doc_id: r
        for r in ngram_contamination(corpus, bench, n=5, normalize=True).collect()
    }
    # normalized: the variant is a verbatim hit (10 words -> 6 grams, all match)
    assert norm[1].contamination == 1.0 and norm[1].n_ngrams == 6
    assert 2 not in norm


def test_connected_components_chain_clique_isolated(spark):
    """Hash-min CC: a 4-chain (1-2-3-4), a triangle clique (10,11,12), a
    2-clique (20,21) sharing no nodes — component = min id; chain proves
    multi-hop propagation (pairs alone never connect 1 and 4)."""
    from sql_graph_visualizer_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (21, 20)],
        "a_id long, b_id long",
    )
    got = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_dedup_canonical_flags_and_singletons(spark):
    """dedup_canonical: every doc gets a component; isolated docs are
    their own canonical; exactly one canonical (the min id) per
    component; long path converges (diameter 7)."""
    from sql_graph_visualizer_spark.operators.dedup import dedup_canonical

    docs = spark.createDataFrame([(i,) for i in range(1, 11)], "doc_id long")
    # path 3-4-5-6-7-8-9-10 (diameter 7), docs 1 and 2 isolated
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(3, 10)], "a_id long, b_id long"
    )
    rows = dedup_canonical(docs, pairs).collect()
    assert len(rows) == 10
    by_id = {r["doc_id"]: r for r in rows}
    for i in (1, 2):
        assert by_id[i]["component"] == i and by_id[i]["is_canonical"]
    for i in range(3, 11):
        assert by_id[i]["component"] == 3
        assert by_id[i]["is_canonical"] == (i == 3)


def test_connected_components_guards(spark):
    """Empty pair set → every doc is its own canonical singleton; an
    iteration budget smaller than the diameter must raise, never return
    silently-split components."""
    import pytest as _pytest

    from sql_graph_visualizer_spark.operators.dedup import (
        connected_components,
        dedup_canonical,
    )

    docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
    empty = spark.createDataFrame([], "a_id long, b_id long")
    rows = {r["doc_id"]: r for r in dedup_canonical(docs, empty).collect()}
    assert all(rows[i]["component"] == i and rows[i]["is_canonical"] for i in (1, 2))

    path = spark.createDataFrame([(i, i + 1) for i in range(1, 8)], "a_id long, b_id long")
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(path, max_iterations=2)


def test_connected_components_frees_checkpoint_blocks_per_round(spark):
    """ADVICE r6: freeing must go through the CHECKPOINTED DataFrame —
    a projection of it hides the LogicalRDD from _free_checkpoint, the
    unpersist silently no-ops, and blocks accumulate O(rounds). A
    diameter-12 path forces ~12 hash-min rounds; afterwards at most ONE
    checkpoint (the returned final labels) may remain persisted."""
    from sql_graph_visualizer_spark.operators.dedup import connected_components

    jsc = spark.sparkContext._jsc.sc()
    base = jsc.getPersistentRDDs().size()
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 13)], "a_id long, b_id long"
    )
    out = connected_components(path)
    assert {r.component for r in out.collect()} == {1}
    leaked = jsc.getPersistentRDDs().size() - base
    assert leaked <= 1, f"{leaked} checkpoint blocks leaked (O(rounds) pin)"

    # star variant: same contract
    base = jsc.getPersistentRDDs().size()
    out = connected_components(path, algorithm="star", max_iterations=12)
    assert {r.component for r in out.collect()} == {1}
    leaked = jsc.getPersistentRDDs().size() - base
    assert leaked <= 1, f"star: {leaked} checkpoint blocks leaked"


def test_star_components_equal_hashmin(spark):
    """The large-star/small-star variant must produce the identical
    (id, component) table as hash-min on: chain+clique mix, a diameter-40
    path (where hash-min would need 40 rounds but star stays in its
    O(log^2 n) budget), and a seeded random graph."""
    import random

    from sql_graph_visualizer_spark.operators.dedup import connected_components

    rng = random.Random(7)
    rand_edges = [(rng.randrange(0, 60), rng.randrange(0, 60)) for _ in range(45)]
    cases = [
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (21, 20)],
        [(i, i + 1) for i in range(100, 140)],  # path, diameter 40
        rand_edges,  # includes self-pairs and duplicates
    ]
    for pairs in cases:
        df = spark.createDataFrame(pairs, "a_id long, b_id long")
        hm = {(r.id, r.component) for r in connected_components(df).collect()}
        st = {
            (r.id, r.component)
            for r in connected_components(df, algorithm="star", max_iterations=12).collect()
        }
        assert st == hm and st


def test_dedup_canonical_orphan_pair_ids_never_orphan_a_component(spark):
    """A pair referencing an id absent from docs (stale index, pairs
    computed pre-filter) must not leave a component with zero canonical
    rows: the survivor is the min id PRESENT in docs, even when the
    component label itself is the absent id."""
    from sql_graph_visualizer_spark.operators.dedup import dedup_canonical

    docs = spark.createDataFrame([(2,), (3,)], "doc_id long")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "a_id long, b_id long")
    rows = {r["doc_id"]: r for r in dedup_canonical(docs, pairs).collect()}
    assert rows[2]["component"] == 1 and rows[3]["component"] == 1
    assert rows[2]["is_canonical"] is True  # min PRESENT id survives
    assert rows[3]["is_canonical"] is False


def test_redact_pii_patterns_and_order(spark):
    """Emails, IPv4s (valid octets only) and phone-shaped runs become
    typed placeholders; invalid octets survive; redaction order keeps
    email digits from leaking into the phone pattern."""
    from sql_graph_visualizer_spark.operators.text import pii_counts, redact_pii

    rows = [
        (0, "mail a.b+c@foo-bar.example.com or x@y.io now"),
        (1, "server 10.3.0.1 and 256.1.1.1 and 8.8.8.8."),
        (2, "call +1 (555) 010-1234 or 5550101234 end"),
        (3, "no pii here 1.2 only"),
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    n_email, n_ip, n_phone = pii_counts("t")
    got = {
        r.i: (r.red, r.n_email, r.n_ip, r.n_phone)
        for r in df.select("i", redact_pii("t").alias("red"), n_email, n_ip, n_phone).collect()
    }
    assert got[0] == ("mail [EMAIL] or [EMAIL] now", 2, 0, 0)
    # 256.1.1.1 is not a valid IPv4 and survives WHOLE: the leading \b
    # means the 56.1.1.1 tail can't match mid-digit-run either
    assert got[1] == ("server [IP] and 256.1.1.1 and [IP].", 0, 2, 0)
    assert got[2] == ("call [PHONE] or [PHONE] end", 0, 0, 2)
    assert got[3] == ("no pii here 1.2 only", 0, 0, 0)


def test_lsh_pair_dedupe_plan_stays_hash_aggregated(spark):
    """r8 plan contract: candidate verification runs BEFORE the
    band-collision dedupe, so the dedupe aggregates fixed-width
    (a_id, b_id, metric) rows — no SortAggregate, no signature arrays
    through the exchange — for both the MinHash and SimHash families."""
    docs = _docs(spark).limit(100)
    for pairs in (
        minhash_lsh_pairs(docs, threshold=0.5),
        simhash_near_pairs(docs, max_hamming=10),
    ):
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "SortAggregate" not in plan
        assert "HashAggregate" in plan
