"""Session-level shared corpus prep for catalog runs.

The query catalog re-derives the same expensive intermediate tables in
many entries: the MinHash signature table, the shingle table, and the
verified near-dup pair list over the shared planted corpus
(``queries._planted_neardup_docs``). Run standalone, each entry pays that
prep again — fine for a single query, pure waste across a 100+-entry
bench or an interactive session exploring the same corpus.

``shared_prep`` persists those derived tables ONCE. Consumers need no
changes at all: every catalog entry builds the byte-identical logical
subtree through the shared helpers, and Spark's CacheManager substitutes
a cached table into any plan whose canonicalized subtree matches —
substitution by plan equality, not by handle. ``scoped_persist`` skips
(and therefore never unpersists) plans that are already cached, so a
query's per-scope cache cleanup cannot evict the shared entries.

At 100 TB the same sharing is a *materialized* signature/shingle side
table (parquet/Delta, incrementally maintained — see
``operators.dedup.incremental_minhash_pairs``); in-session block-manager
persistence is the bench-scale analog of that design, not a local trick.
The committed scale decision (round-12 verdict #3): past ~1M docs the
MinHash prep must come from ``minhash_lsh_pairs_bucketed``'s bucketed
side tables, not this in-memory layout — the in-memory path OOMs an
8 GiB heap at 5M docs and its per-row cost grows 2.09x per 10x input
(measured boundary documented on ``minhash_lsh_pairs``). This module
stays in-memory BY DESIGN: gate/bench corpora are orders of magnitude
below the boundary, and keeping both layouts exercised keeps the
bit-identical-output contract tested.

Correctness note: the driver's oracle gate runs each query WITHOUT this
prep (tools/check_correctness.py never calls it), so cached and uncached
plans are both exercised round over round; results are identical because
substitution only ever replaces a subtree with that same subtree's
materialized output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Registry of the prep tables persisted for the current session, so a
#: long-lived caller (bench) can release them deterministically.
_PREPPED: list[DataFrame] = []

#: Keyed handles for prep tables that canonicalized-plan matching CANNOT
#: substitute — results of eager iterative computations (connected
#: components ends in a localCheckpoint → ExistingRDD, a fresh lineage on
#: every construction). Consumers opt in explicitly via ``get_prepped``;
#: with no prep active (the correctness gate) they get None and build
#: the table themselves, so both paths stay exercised.
_HANDLES: dict = {}


def get_prepped(key, spark: SparkSession | None = None) -> DataFrame | None:
    """The shared prepped DataFrame registered under ``key``, or None
    when no shared prep is active for it.

    Pass the consumer's ``spark`` to guard against a handle left over
    from a PREVIOUS session (prep warmed, session stopped, new session
    started without release): a DataFrame bound to a different session
    is treated as absent rather than handed to a consumer that would
    fail on it. A handle may also be a LIST of DataFrames (the BPE
    per-step merge winners); the session guard then checks the first
    element."""
    df = _HANDLES.get(key)
    probe = df[0] if isinstance(df, (list, tuple)) and df else df
    if (probe is not None and spark is not None
            and probe.sparkSession is not spark):
        return None
    return df


def shared_prep(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Build + persist the catalog's hot shared derived tables.

    Persisted (all lazy; first consumer materializes, ``eager=True``
    materializes here so timings attribute prep cost to prep):

    - ``sigs_corpus``   — MinHash signatures of the planted corpus
    - ``shingles``      — (id, shingle array) of the planted corpus
    - ``pairs``         — verified MinHash-LSH near-dup pairs
    - ``sigs_docs``     — MinHash signatures of the raw documents table
                          (the incremental-dedup entries' side table)
    - ``tf_docs``       — the (doc, term, tf) table both BM25 entries
                          index from
    - ``components``    — connected components of the pair graph,
                          registered as a KEYED handle (plan matching
                          cannot substitute an ExistingRDD lineage);
                          dedup_clusters / canonical accounting /
                          leakage splits read it via ``get_prepped``
    """
    from arcane_framework_spark.operators.dedup import (
        _with_tokens,
        minhash_lsh_pairs,
        minhash_signatures,
        norm_grams,
        shingles_from_tokens,
    )
    from arcane_framework_spark.operators.retrieval import term_frequencies
    from arcane_framework_spark.queries import _planted_neardup_docs
    from arcane_framework_spark.session import load_tables

    from arcane_framework_spark.operators.cache import cache_scope

    existing = _HANDLES.get(("components", sf_dir))
    if existing is not None:
        if existing.sparkSession is spark:
            return {}  # already warmed for this sf_dir — idempotent
        # Handle left over from a stopped session (warmed, session
        # restarted without release_shared_prep): the registry is stale.
        # Clear it and rebuild against the live session, otherwise the
        # shared-prep optimization silently disappears (consumers'
        # session guard makes them fall back to per-entry rebuilds).
        release_shared_prep()

    corpus = _planted_neardup_docs(spark, sf_dir)
    docs = load_tables(spark, sf_dir, "documents")["documents"].select(
        "doc_id", "text"
    )

    # Build inside a cache_scope, then TRANSFER ownership of everything it
    # tracked (minhash_lsh_pairs scoped_persists its band/shingle tables
    # internally) to the session-level registry instead of letting the
    # scope release it on exit.
    with cache_scope() as tracked:
        from arcane_framework_spark.queries_wave4 import _dhash_hashes

        out = {
            "sigs_corpus": minhash_signatures(corpus),
            "shingles": _with_tokens(corpus, "text", "doc_id").select(
                "id", shingles_from_tokens(F.col("toks")).alias("shingles")
            ),
            "pairs": minhash_lsh_pairs(corpus),
            "sigs_docs": minhash_signatures(docs),
            "tf_docs": term_frequencies(docs),
            # (doc_id, hash_hi, hash_lo) of the synthetic image assets:
            # the decode+hash mapInArrow pass is the dominant cost of
            # BOTH dHash entries and their subtree is byte-identical
            # (_dhash_hashes), so plan matching substitutes this table
            # into each (r14 optimization).
            "dhash_hashes": _dhash_hashes(spark, sf_dir),
            # (id, s, grams) over the planted corpus: the char-gram build
            # (O(len) substring transform + distinct per doc) is the
            # shared base of ngram_jaccard and sorted_neighborhood; both
            # consumers construct this exact subtree (operators/dedup.py
            # norm_grams) so plan matching serves it from here.
            "norm_grams_corpus": norm_grams(corpus),
        }
        for df in out.values():
            df.persist()
            _PREPPED.append(df)
        # Connected components of the near-dup pair graph: the ONE shared
        # stage plan-matching cannot carry across entries (the iterative
        # loop ends in a localCheckpoint → fresh ExistingRDD lineage each
        # build). Registered as a keyed handle instead; dedup_clusters /
        # canonical accounting / leakage splits all read this same table —
        # exactly how a production corpus build shares it.
        from arcane_framework_spark.operators.graph import (
            connected_components,
        )

        comps = connected_components(out["pairs"]).persist()
        out["components"] = comps
        _PREPPED.append(comps)
        _HANDLES[("components", sf_dir)] = comps
        # PQ codebooks + codes: trained once per session and shared by
        # keyed handle (the pq and ivfpq entries would otherwise each
        # rerun the joint Lloyd fit) — the codebook-as-side-table story,
        # same pattern as components. Entries fall back to training
        # their own when no prep is active (the oracle gate's path).
        from arcane_framework_spark.operators.similarity import (
            pq_codebooks,
            pq_encode,
        )

        emb = load_tables(spark, sf_dir, "embeddings")["embeddings"].select(
            "vec_id", "embedding"
        )
        cb = pq_codebooks(emb).persist()
        codes = pq_encode(emb, cb).persist()
        out["pq_codebooks"] = cb
        out["pq_codes"] = codes
        _PREPPED.extend([cb, codes])
        _HANDLES[("pq_codebooks", sf_dir)] = cb
        _HANDLES[("pq_codes", sf_dir)] = codes
        # Exact-cosine ground truth for the PQ family: pq_recall and
        # ivfpq_recall measure against the byte-identical
        # knn_bruteforce subtree (same emb projection, query set, k), so
        # one persisted run serves both via plan matching.
        from arcane_framework_spark.operators.similarity import (
            knn_bruteforce,
        )
        from arcane_framework_spark.queries_ext import PQ_QUERIES, PQ_TOPK

        pq_exact = knn_bruteforce(
            emb, emb.filter(F.col("vec_id") < PQ_QUERIES), k=PQ_TOPK
        ).persist()
        out["pq_exact_knn"] = pq_exact
        _PREPPED.append(pq_exact)
        # SemDeDup centroids: the governed k-means fit over the planted
        # near-dup embedding corpus is the dominant cost of every
        # semantic_dedup_* entry (exact fit measured 2-4s, routed 6.5-8s
        # at sf0.1) and the catalog runs it five times across the four
        # twins without sharing. Train each mode ONCE here and register
        # keyed handles (the pq_codebooks pattern — kmeans_fit ends in
        # per-iteration materializations, so plan matching cannot
        # substitute it). The fit is deterministic: consumers get the
        # identical table they would have trained, and the oracle gate
        # (which never warms prep) still exercises the full in-entry
        # training path every round.
        from arcane_framework_spark.operators.similarity import kmeans_fit
        from arcane_framework_spark.queries_ext import (
            SEMDEDUP_CELL,
            SEMDEDUP_ITERS,
            _neardup_corpus,
        )

        ndc = _neardup_corpus(spark, sf_dir)
        cent_exact = kmeans_fit(
            ndc, k=None, iterations=SEMDEDUP_ITERS,
            target_cell_size=SEMDEDUP_CELL,
        ).persist()
        cent_routed = kmeans_fit(
            ndc, k=None, iterations=SEMDEDUP_ITERS,
            target_cell_size=SEMDEDUP_CELL, routed=True,
        ).persist()
        out["semdedup_cent_exact"] = cent_exact
        out["semdedup_cent_routed"] = cent_routed
        _PREPPED.extend([cent_exact, cent_routed])
        _HANDLES[("semdedup_cent_exact", sf_dir)] = cent_exact
        _HANDLES[("semdedup_cent_routed", sf_dir)] = cent_routed
        # Full SemDeDup decision tables (exact + routed): each is read by
        # its standalone twin AND by the agreement diagnostic, which
        # otherwise re-runs both full pipelines. The entries build the
        # byte-identical subtree (same semantic_dedup call, same centroid
        # handle), so CacheManager plan matching substitutes these — no
        # keyed handle needed. The forced-split twin differs (its own
        # split windows) and keeps its own run.
        from arcane_framework_spark.operators.similarity import (
            semantic_dedup,
        )
        from arcane_framework_spark.queries_ext import SEMDEDUP_TAU

        sdd_exact = semantic_dedup(
            ndc, k=None, threshold=SEMDEDUP_TAU,
            iterations=SEMDEDUP_ITERS, target_cell_size=SEMDEDUP_CELL,
            centroids=cent_exact,
        ).persist()
        sdd_routed = semantic_dedup(
            ndc, k=None, threshold=SEMDEDUP_TAU,
            iterations=SEMDEDUP_ITERS, target_cell_size=SEMDEDUP_CELL,
            routed=True, centroids=cent_routed,
        ).persist()
        out["semdedup_exact"] = sdd_exact
        out["semdedup_routed"] = sdd_routed
        _PREPPED.extend([sdd_exact, sdd_routed])
        # BPE merge winners: one deterministic training pass shared by
        # bpe_train_documents and bpe_fertility_by_source (training reads
        # only the text column, so both entries' tops are identical; the
        # per-step 1-row DataFrames are the model). Already persisted by
        # bpe_train_tops via scoped_persist — ownership transfers with
        # `tracked` below.
        from arcane_framework_spark.operators.bpe import bpe_train_tops

        tops = bpe_train_tops(docs)
        _HANDLES[("bpe_tops", sf_dir)] = tops
        # Pooled literal-query rankings: the BM25 and query-likelihood
        # top-RETRIEVAL_POOL_K tables are each read by the single-ranker
        # entry (which cuts its own k on top) AND by the RRF fusion —
        # byte-identical subtrees, plan-matched like the SemDeDup tables.
        from arcane_framework_spark.operators.retrieval import (
            RETRIEVAL_POOL_K,
            bm25_topk,
            query_likelihood_topk,
        )
        from arcane_framework_spark.queries_eval import QL_ENTRY_MU

        bm25_pool = bm25_topk(spark, docs, k=RETRIEVAL_POOL_K).persist()
        ql_pool = query_likelihood_topk(
            spark, docs, k=RETRIEVAL_POOL_K, mu=QL_ENTRY_MU
        ).persist()
        out["bm25_pool"] = bm25_pool
        out["ql_pool"] = ql_pool
        _PREPPED.extend([bm25_pool, ql_pool])
        _PREPPED.extend(tracked)
        tracked.clear()
    return out


def warm_shared_prep_itemized(spark: SparkSession,
                              sf_dir: str) -> dict[str, float]:
    """``shared_prep`` + eager materialization; returns seconds spent PER
    TABLE (in materialization order — a later table reuses whatever the
    earlier ones already cached, so each number is the marginal cost of
    adding that table, which is the attribution that makes prep growth
    explainable round-over-round)."""
    import time

    breakdown: dict[str, float] = {}
    t0 = time.perf_counter()
    tables = shared_prep(spark, sf_dir)
    # eager work that runs INSIDE the build (per-iteration Lloyd
    # materializations of the PQ codebooks, the connected-components
    # fixpoint) — attributed explicitly instead of vanishing
    breakdown["__build"] = round(time.perf_counter() - t0, 3)
    for name, df in tables.items():
        t0 = time.perf_counter()
        df.count()
        breakdown[name] = round(time.perf_counter() - t0, 3)
    return breakdown


def warm_shared_prep(spark: SparkSession, sf_dir: str) -> float:
    """``shared_prep`` + eager materialization; returns total seconds."""
    return round(sum(warm_shared_prep_itemized(spark, sf_dir).values()), 3)


def release_shared_prep() -> None:
    """Unpersist everything ``shared_prep`` cached (idempotent)."""
    _HANDLES.clear()
    while _PREPPED:
        df = _PREPPED.pop()
        try:
            df.unpersist()
        except Exception:
            pass
