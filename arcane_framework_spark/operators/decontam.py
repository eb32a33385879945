"""Benchmark decontamination: token-n-gram overlap between a small eval
set and the training corpus.

The standard LLM-training hygiene step (the reference framework has no
analog — it is an ingestion library, SURVEY.md §0): any training document
sharing ≥ `min_matches` verbatim token n-grams with an eval/benchmark
document is flagged as contaminated and dropped before training.

Shape at 100 TB:

- the eval side is tiny (benchmarks are KBs–MBs) → its n-gram table is
  **broadcast**; the corpus side never shuffles for the probe;
- corpus n-grams are built map-side (slice + array_join over a
  materialized token array) and immediately hash-joined against the
  broadcast probe — no corpus-side n-gram aggregation, no all-pairs;
- only matching (doc, eval, gram) triples survive the join, so the
  per-doc aggregation that follows sees a vanishingly small row count;
- grams are compared via md5 (bit-identical in DuckDB for the oracle);
  at production scale the hash also keeps the broadcast table compact
  (16 bytes/gram instead of the gram text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arcane_framework_spark.operators.text import tokens_expr

#: Token n-gram width used for contamination checks (8 is the common
#: choice in published decontamination pipelines).
NGRAM_WIDTH = 8


def ngram_hashes(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", n: int = NGRAM_WIDTH) -> DataFrame:
    """(id, gram_hash) for every token n-gram — NOT deduplicated: keeping
    this map-only is the whole scale story; callers needing distinct grams
    dedup after whatever join has already shrunk the stream.

    The token array is materialized behind a Generate barrier (explode
    of the start-position sequence) so the tokenizer regex runs once per
    row, and the md5 runs inside codegen on the joined gram string.
    """
    toks = tokens_expr(text_col)
    with_toks = docs.select(
        id_col, F.explode(F.array(toks)).alias("__toks")
    ).filter(F.size("__toks") >= n)
    starts = F.sequence(F.lit(1), F.size("__toks") - F.lit(n - 1))
    grams = with_toks.select(
        id_col,
        F.explode(starts).alias("__i"),
        F.col("__toks"),
    ).select(
        id_col,
        F.md5(F.array_join(F.slice("__toks", F.col("__i"), n), " ")).alias(
            "gram_hash"
        ),
    )
    return grams


def contamination_pairs(corpus: DataFrame, evalset: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = NGRAM_WIDTH,
                        min_matches: int = 1) -> DataFrame:
    """(doc_id, eval_id, n_shared) for corpus docs sharing ≥ min_matches
    distinct token n-grams with an eval document.

    ``n_shared`` counts DISTINCT shared grams. The corpus side stays
    map-only end-to-end: dedup happens per (doc, eval) pair AFTER the
    broadcast probe join has discarded every non-matching gram, never as a
    corpus-wide distinct. ``evalset``'s id column is renamed ``eval_id``
    in the output; corpus rows whose id equals an eval id are excluded
    (self-matches are not contamination).
    """
    eval_grams = ngram_hashes(evalset, id_col, text_col, n).distinct().select(
        F.col(id_col).alias("eval_id"), "gram_hash"
    )
    return contamination_probe(
        corpus, eval_grams, id_col=id_col, text_col=text_col, n=n,
        min_matches=min_matches,
    )


def contamination_probe(corpus: DataFrame, eval_grams: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = NGRAM_WIDTH,
                        min_matches: int = 1) -> DataFrame:
    """The probe half of ``contamination_pairs`` against a PREBUILT
    ``(eval_id, gram_hash)`` table — the seam the streaming twin uses:
    a stream persists the benchmark gram table ONCE before the first
    micro-batch instead of re-deriving it per tick (the
    streaming_incremental_dedup lesson: a stream re-evaluates its
    static side every batch otherwise).

    Per-doc stateless: a document's verdict depends only on its own
    text and the static probe table, so the result is independent of
    how a stream slices the corpus into batches — which is what lets
    the streaming twin share the batch oracle verbatim.
    """
    corpus_grams = ngram_hashes(corpus, id_col, text_col, n)
    return (
        corpus_grams.join(F.broadcast(eval_grams), "gram_hash")
        .filter(F.col(id_col) != F.col("eval_id"))
        .groupBy(id_col, "eval_id")
        .agg(F.count_distinct(F.col("gram_hash")).alias("n_shared"))
        .filter(F.col("n_shared") >= min_matches)
    )


def repeated_spans(corpus: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", n: int = 16,
                   min_docs: int = 2) -> DataFrame:
    """(gram_hash, n_docs, example_doc) for verbatim token n-grams that
    appear in at least ``min_docs`` DISTINCT documents — the counting side
    of exact-substring dedup (Lee et al.'s "Deduplicating Training Data
    Makes Language Models Better" screens exactly these spans).

    One shuffle of the gram table keyed by gram hash — the information-
    theoretic minimum for cross-document span counting. ``count_distinct``
    plans as a two-phase aggregate, so per-partition partial aggregation
    still compacts the stream before the exchange; at 100 TB the gram
    table is the corpus ×≈n tokens, so use a wide ``n`` (16+) and consider
    pre-filtering docs (this module's `contamination_pairs` broadcast
    probe shape is the cheap alternative when one side is small).
    """
    grams = ngram_hashes(corpus, id_col, text_col, n)
    return (
        grams.groupBy("gram_hash")
        .agg(
            F.count_distinct(F.col(id_col)).alias("n_docs"),
            F.min(id_col).alias("example_doc"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


#: N-gram width for the cross-source overlap matrix. Narrower than the
#: decontamination width (8): the matrix measures stylistic/content
#: similarity between whole sources, where 3-grams give a dense, stable
#: signal; 8-grams would measure only verbatim duplication.
OVERLAP_NGRAM_WIDTH = 3


def source_overlap(docs: DataFrame, group_col: str = "source",
                   text_col: str = "text",
                   n: int = OVERLAP_NGRAM_WIDTH) -> DataFrame:
    """Pairwise corpus-overlap matrix: (source_a, source_b, shared_ngrams,
    overlap_frac) for every unordered source pair, where ``overlap_frac``
    = |shared distinct n-grams| / min(|A|, |B|) (containment of the
    smaller side).

    Scale shape: the corpus collapses to DISTINCT (source, gram_hash)
    first — ONE shuffle with two-phase aggregation, output is
    gram-TYPE x source scale. The pair join then keys on gram_hash; a
    gram present in g sources expands to C(g,2) <= C(S,2) pairs, so the
    join fan-out is bounded by the (small, fixed) source count S, never
    by corpus size. Per-source distinct totals are S rows -> broadcast.
    """
    from arcane_framework_spark.operators.cache import scoped_persist

    # Persisted: consumed by the totals aggregate AND both sides of the
    # pair join — without it the corpus tokenize + gram + distinct
    # pipeline runs three times.
    grams = (
        ngram_hashes(docs, id_col=group_col, text_col=text_col, n=n)
        .select(F.col(group_col).alias("src"), "gram_hash")
        .distinct()
        .transform(scoped_persist)
    )
    totals = grams.groupBy("src").agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    a = grams.select(F.col("src").alias("source_a"), "gram_hash")
    b = grams.select(F.col("src").alias("source_b"), "gram_hash")
    shared = (
        a.join(b, "gram_hash")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_ngrams"))
    )
    ta = totals.select(
        F.col("src").alias("source_a"), F.col("n_grams").alias("__na")
    )
    tb = totals.select(
        F.col("src").alias("source_b"), F.col("n_grams").alias("__nb")
    )
    return (
        shared.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a",
            "source_b",
            "shared_ngrams",
            (
                F.floor(
                    F.col("shared_ngrams")
                    / F.least("__na", "__nb") * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("overlap_frac"),
        )
    )


def semantic_contamination_pairs(corpus: DataFrame, benchmark: DataFrame,
                                 id_col: str = "vec_id",
                                 vec_col: str = "embedding",
                                 min_cosine: float = 0.8) -> DataFrame:
    """Embedding-space decontamination: ``(id, eval_id, cosine)`` for
    corpus vectors within ``min_cosine`` of a benchmark vector — the
    semantic complement to the verbatim n-gram probe above, catching
    paraphrased/reformatted benchmark leakage that shares no 8-gram
    (the published decontamination playbooks run both).

    Scale shape = the n-gram probe's, transposed to vectors: the
    benchmark side is tiny → broadcast; the corpus side is scanned
    once, each row scored against the broadcast set (a
    BroadcastNestedLoopJoin by construction — benchmark-bounded, the
    ``knn_bruteforce`` plan class), and only above-threshold pairs
    survive. Norms are computed ONCE per side before the cross, so the
    per-pair work is a single dot product. Cosine is rounded to 6
    decimals before the threshold compare (engine-identical given the
    IEEE-exact sqrt/division and the shared left-to-right dot fold).
    """
    from arcane_framework_spark.operators.similarity import (
        dot_expr,
        norm_expr,
    )

    bench = benchmark.select(
        F.col(id_col).alias("eval_id"),
        F.col(vec_col).alias("__bv"),
        norm_expr(F.col(vec_col)).alias("__bn"),
    )
    scored = (
        corpus.select(
            id_col,
            F.col(vec_col).alias("__cv"),
            norm_expr(F.col(vec_col)).alias("__cn"),
        )
        .crossJoin(F.broadcast(bench))
        .select(
            id_col,
            "eval_id",
            F.round(
                dot_expr(F.col("__cv"), F.col("__bv"))
                / (F.col("__cn") * F.col("__bn")),
                6,
            ).alias("cosine"),
        )
    )
    return scored.filter(F.col("cosine") >= F.lit(min_cosine))
