"""Benchmark decontamination: n-gram overlap between a training corpus
and an evaluation benchmark.

The standard LLM-pretraining hygiene step (GPT-3 appendix C / PaLM /
Llama use 8- to 13-gram collision checks): a training document that
shares long word n-grams with a benchmark document leaks the benchmark
into the training set and inflates eval scores. This is the
set-membership twin of the dedup family — overlap against a FIXED
external corpus instead of self-similarity.

Scale shape (100 TB corpus, ~10^5-10^6 benchmark docs): the benchmark's
distinct n-gram set is small relative to the corpus (benchmarks are
curated eval sets, not crawls) — build it once, broadcast it, and the
corpus side streams through map-side: explode → per-doc distinct
(hash-agg) → broadcast left join → per-doc ratio. The corpus text
never shuffles; the only shuffled rows are (doc_id, gram) pairs for
the per-doc distinct, and that shuffle is what any exact per-doc set
metric costs. For a benchmark too big to broadcast, pass
``broadcast_benchmark=False`` to fall back to a shuffle join on the
gram — same result, one more exchange.

Zero Python UDFs: n-grams are array expressions (the guarded
``sequence``/``transform`` pattern shared with ``repetition_profile``
— Spark ``sequence(1, 0)`` counts DOWN, so short docs need the
explicit guard), matching DuckDB ``regexp_split_to_array`` +
``list_transform(range(...))`` token for token so the whole operator
is value-hash oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _word_ngrams(text_col: str, n: int, normalize: bool = False) -> Column:
    """Distinct-ready array of space-joined word n-grams (1-based
    positions, empty for docs shorter than n words).

    ``normalize``: GPT-3-style pre-tokenization (appendix C) — strip
    punctuation to spaces and collapse whitespace before n-gramming, so
    a quote/punctuation variant of a benchmark passage ("foo, bar!" vs
    "foo bar") still collides. Plain mode under-matches those variants
    (ADVICE/VERDICT r5 #5); both modes are codegen expressions with
    exact DuckDB twins."""
    src = F.lower(F.col(text_col))
    if normalize:
        # punctuation → space FIRST, then trim (the replacement can
        # create new leading/trailing spaces; \s+ split collapses runs)
        src = F.trim(F.regexp_replace(src, r"[^a-z0-9\s]", " "))
    else:
        src = F.lower(F.trim(F.col(text_col)))
    ws = F.split(src, r"\s+")
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(ws, i + j) for j in range(n)]
    )
    return F.when(
        F.size(ws) >= n,
        F.transform(F.sequence(F.lit(1), F.size(ws) - (n - 1)), gram),
    ).otherwise(F.array().cast("array<string>"))


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_benchmark: bool = True,
    normalize: bool = False,
) -> DataFrame:
    """Per-document contamination scores vs a benchmark corpus.

    Returns ``(doc_id, n_ngrams, n_matched, contamination)`` for every
    corpus document sharing at least one word ``n``-gram with ANY
    benchmark document, where ``contamination`` = |distinct doc n-grams
    ∩ benchmark n-gram set| / |distinct doc n-grams| (distinct per doc,
    so a repetitive document cannot inflate its own score). A full copy
    of a benchmark doc scores 1.0; untouched documents are absent
    (filter or anti-join on this result to decontaminate)."""
    grams = (
        corpus.select(
            F.col(id_col).alias("doc_id"),
            _word_ngrams(text_col, n, normalize=normalize).alias("gs"),
        )
        .select("doc_id", F.explode("gs").alias("g"))
        .dropDuplicates(["doc_id", "g"])
    )
    bench = (
        benchmark.select(_word_ngrams(text_col, n, normalize=normalize).alias("gs"))
        .select(F.explode("gs").alias("g"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    return (
        grams.join(bench, on="g", how="left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_ngrams"),
            F.count("__hit").alias("n_matched"),
            F.round(F.count("__hit") / F.count("*"), 6).alias("contamination"),
        )
        .filter(F.col("n_matched") > 0)
    )
