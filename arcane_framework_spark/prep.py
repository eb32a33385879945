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

import os

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
    docs_full = load_tables(spark, sf_dir, "documents")["documents"]
    docs = docs_full.select("doc_id", "text")

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
        # Exact-substring dedup family (r14 wave 3): the corpus segment
        # tables are each rebuilt by several entries — the batch
        # incremental twins AND the streaming entries' pre-stream seed
        # writes (the bucketed seen-state seed reads the byte-identical
        # index subtree, so plan matching serves the segmentation from
        # cache and the entry pays only the write). Measured at sf0.1:
        # anchored corpus index ~1.4s x 3 consumers, positioned ~0.6s x
        # 2, plus the planted/offset segment tables at ~1-1.3s x 2 each.
        from arcane_framework_spark.operators.dedup import (
            anchored_corpus_segment_hashes,
            anchored_substring_segments,
            corpus_segment_hashes,
            exact_substring_segments,
        )
        from arcane_framework_spark.operators.text import (
            anchored_segment_hashes,
        )
        from arcane_framework_spark.queries_wave6 import (
            _planted_substring_docs,
        )
        from arcane_framework_spark.queries_wave7 import _planted_offset_docs

        # full (doc, seg) anchored table over the raw documents: consumed
        # directly by anchored_width_stats and as the base subtree of the
        # distinct presence index below
        out["seg_anchored_docs"] = anchored_segment_hashes(docs)
        # distinct presence indexes: the side tables the incremental batch
        # twins join against and the streaming entries seed their
        # bucketed seen-state from
        out["seg_anchored_index"] = anchored_corpus_segment_hashes(docs)
        out["seg_positioned_index"] = corpus_segment_hashes(docs)
        # flagged segment tables over the two planted corpora: shared by
        # (substring_dedup_documents, substring_span_stats_documents) and
        # (substring_dedup_unaligned, substring_recall_aligned_vs_anchored)
        out["substr_segments_planted"] = exact_substring_segments(
            _planted_substring_docs(spark, sf_dir)
        )
        out["substr_segments_offset"] = anchored_substring_segments(
            _planted_offset_docs(spark, sf_dir)
        )
        for df in out.values():
            df.persist()
            _PREPPED.append(df)
        # --- Eager phase: independent training/materialization chains run
        # CONCURRENTLY (guide §2.6 "overlap independent jobs"): each chain
        # below is a driver loop of many tiny jobs (Lloyd iterations, the
        # CC fixpoint, BPE merge rounds) that leaves most of local[N]
        # idle when run alone; Spark's FIFO scheduler back-fills the idle
        # executors with the next chain's tasks. Chains are mutually
        # independent (disjoint outputs); within a chain, steps run in
        # dependency order so each reuses the previous step's cache. Each
        # chain runs inside its OWN cache_scope on its thread (the scope
        # stack is thread-local) and transfers every persist it takes to
        # the session registry before the scope exits.
        from arcane_framework_spark.operators.graph import (
            connected_components,
        )
        from arcane_framework_spark.operators.similarity import (
            kmeans_fit,
            knn_bruteforce,
            pq_codebooks,
            pq_encode,
            semantic_dedup,
        )
        from arcane_framework_spark.operators.bpe import bpe_train_tops
        from arcane_framework_spark.operators.retrieval import (
            RETRIEVAL_POOL_K,
            bm25_topk,
            query_likelihood_topk,
        )
        from arcane_framework_spark.queries_eval import QL_ENTRY_MU
        from arcane_framework_spark.queries_ext import (
            PQ_QUERIES,
            PQ_TOPK,
            SEMDEDUP_CELL,
            SEMDEDUP_ITERS,
            SEMDEDUP_TAU,
            _neardup_corpus,
        )

        emb = load_tables(spark, sf_dir, "embeddings")["embeddings"].select(
            "vec_id", "embedding"
        )
        ndc = _neardup_corpus(spark, sf_dir)

        def _register(name: str, df: DataFrame, handle: bool = False):
            out[name] = df
            _PREPPED.append(df)
            if handle:
                _HANDLES[(name, sf_dir)] = df

        def chain_graph():
            # minhash chain in dependency order, then the CC fixpoint
            # over the cached pair list (plan matching cannot carry an
            # ExistingRDD lineage across entries → keyed handle).
            out["sigs_corpus"].count()
            out["pairs"].count()
            comps = connected_components(out["pairs"]).persist()
            comps.count()
            _register("components", comps, handle=True)

        def chain_semdedup_exact():
            # Governed k-means fit + full decision table: the fit is the
            # dominant cost of every semantic_dedup_* twin and is
            # deterministic, so consumers get the identical table they
            # would have trained (keyed handle; the gate never warms prep
            # and still exercises in-entry training every round). The
            # decision table is read by the standalone twin AND the
            # agreement diagnostic via plan matching.
            cent = kmeans_fit(
                ndc, k=None, iterations=SEMDEDUP_ITERS,
                target_cell_size=SEMDEDUP_CELL,
            ).persist()
            _register("semdedup_cent_exact", cent, handle=True)
            sdd = semantic_dedup(
                ndc, k=None, threshold=SEMDEDUP_TAU,
                iterations=SEMDEDUP_ITERS, target_cell_size=SEMDEDUP_CELL,
                centroids=cent,
            ).persist()
            sdd.count()
            _register("semdedup_exact", sdd)

        def chain_semdedup_routed():
            cent = kmeans_fit(
                ndc, k=None, iterations=SEMDEDUP_ITERS,
                target_cell_size=SEMDEDUP_CELL, routed=True,
            ).persist()
            _register("semdedup_cent_routed", cent, handle=True)
            sdd = semantic_dedup(
                ndc, k=None, threshold=SEMDEDUP_TAU,
                iterations=SEMDEDUP_ITERS, target_cell_size=SEMDEDUP_CELL,
                routed=True, centroids=cent,
            ).persist()
            sdd.count()
            _register("semdedup_routed", sdd)

        def chain_pq():
            # PQ codebooks + codes + the exact-cosine ground truth the
            # recall twins measure against (byte-identical knn_bruteforce
            # subtree → one persisted run serves both).
            cb = pq_codebooks(emb).persist()
            _register("pq_codebooks", cb, handle=True)
            codes = pq_encode(emb, cb).persist()
            codes.count()
            _register("pq_codes", codes, handle=True)
            pq_exact = knn_bruteforce(
                emb, emb.filter(F.col("vec_id") < PQ_QUERIES), k=PQ_TOPK
            ).persist()
            pq_exact.count()
            _register("pq_exact_knn", pq_exact)

        def chain_bpe():
            # one deterministic BPE training shared by bpe_train_documents
            # and bpe_fertility_by_source (the per-step 1-row DataFrames
            # ARE the model; training is eager).
            _HANDLES[("bpe_tops", sf_dir)] = bpe_train_tops(docs)

        def chain_retrieval():
            # tf first so both pooled rankings reuse it; each pool is read
            # by its single-ranker entry AND the RRF fusion.
            out["tf_docs"].count()
            bm25_pool = bm25_topk(spark, docs, k=RETRIEVAL_POOL_K).persist()
            bm25_pool.count()
            _register("bm25_pool", bm25_pool)
            ql_pool = query_likelihood_topk(
                spark, docs, k=RETRIEVAL_POOL_K, mu=QL_ENTRY_MU
            ).persist()
            ql_pool.count()
            _register("ql_pool", ql_pool)

        def chain_dhash():
            out["dhash_hashes"].count()

        def chain_substr():
            # dependency order: the distinct anchored index reuses the
            # full anchored table's cache.
            out["seg_anchored_docs"].count()
            out["seg_anchored_index"].count()
            out["seg_positioned_index"].count()
            out["substr_segments_planted"].count()
            out["substr_segments_offset"].count()

        def chain_misc():
            out["shingles"].count()
            out["sigs_docs"].count()
            out["norm_grams_corpus"].count()

        def chain_nb():
            # One NB training for the whole family: quality score,
            # confusion card, the scoring stream (frozen (lp, prior)),
            # and the incremental twin's corpus-side sufficient
            # statistics (vocab counts + class counts). Deterministic
            # integer model — consumers score byte-identically against
            # it; the gate never warms prep and trains in-entry.
            from arcane_framework_spark.operators.classify import (
                nb_doc_counts,
                nb_model_from_counts,
                nb_token_counts,
            )
            from arcane_framework_spark.queries_wave9 import _nb_label

            lab_docs = docs_full.select("doc_id", "text", _nb_label())
            dpos, dneg = nb_doc_counts(lab_docs)
            vocab = nb_token_counts(lab_docs).persist()
            vocab.count()
            _register("nb_vocab", vocab)
            lp, prior_micro = nb_model_from_counts(vocab, dpos, dneg)
            lp = lp.persist()
            lp.count()
            _register("nb_lp", lp)
            # lp FIRST so get_prepped's session guard probes a DataFrame
            _HANDLES[("nb_model", sf_dir)] = (lp, prior_micro, dpos, dneg)

        # NOTE (r15 opt): prep-sharing the semantic twins' frozen corpus
        # cell table (ivf_assign over the embeddings) and the DSIR
        # bucket-weight/scored tables was tried and A/B-measured
        # NEUTRAL: same-session stash A/B, 3 passes — entries flat
        # (dsir_weights 1.13-1.14 vs 1.15-1.21, incremental_semantic
        # 1.24-1.28 vs 1.11-1.14, streaming_semantic 1.74-1.83 both)
        # while prep grew ~1.4s. Those subtrees are ~0.3s each at gate
        # scale; substitution verified working (cache-hit probe) but
        # the savings drown in per-entry fixed costs. Reverted — do not
        # re-add without a measured catalog-total win.

        def chain_decontam():
            # the benchmark 8-gram probe table: built identically by the
            # batch decontam entry and the decontam stream's static side
            from arcane_framework_spark.operators.decontam import (
                ngram_hashes,
            )
            from arcane_framework_spark.queries_ext import (
                DECONTAM_EVAL_MOD,
            )

            evalset = docs.filter(F.col("doc_id") % DECONTAM_EVAL_MOD == 0)
            eg = (
                ngram_hashes(evalset)
                .distinct()
                .select(F.col("doc_id").alias("eval_id"), "gram_hash")
                .persist()
            )
            eg.count()
            _register("decontam_eval_grams", eg)

        # Longest chains first so the tail of the pool is short ones.
        chains = {
            "semdedup_routed": chain_semdedup_routed,
            "graph": chain_graph,
            "semdedup_exact": chain_semdedup_exact,
            "pq": chain_pq,
            "substr": chain_substr,
            "retrieval": chain_retrieval,
            "nb": chain_nb,
            "bpe": chain_bpe,
            "dhash": chain_dhash,
            "decontam": chain_decontam,
            "misc": chain_misc,
        }

        def _run_owned(fn):
            # fresh scope on THIS thread; transfer its persists to the
            # session registry BEFORE the scope exit would release them
            import time as _time

            t0 = _time.perf_counter()
            with cache_scope() as tr:
                try:
                    fn()
                finally:
                    _PREPPED.extend(tr)
                    tr.clear()
            return round(_time.perf_counter() - t0, 3)

        from concurrent.futures import ThreadPoolExecutor

        # Measured on local[32] at sf0.1: the chains are driver-bound
        # (Catalyst planning + py4j round-trips of many tiny jobs), so
        # concurrency well past the chain count only adds contention —
        # 9 workers ran the r14 9-chain build in 57s, 3 and 5 workers in
        # 35s, sequential in 62s. With r15's 11 chains the pool is
        # packing-bound rather than contention-bound and 5 workers beat
        # 3 by ~3-5s (23.8-26.5s vs 28.7-31.4s, repeated A/B).
        # Parameterised for bigger drivers; behaves identically at low
        # core counts (FIFO back-fill just serializes).
        n_workers = int(os.environ.get("SPARK_GRAFT_PREP_WORKERS", "5"))
        with ThreadPoolExecutor(max_workers=max(1, n_workers)) as pool:
            futures = {
                name: pool.submit(_run_owned, fn)
                for name, fn in chains.items()
            }
            # re-raise the first failure (bench treats prep as optional;
            # the catalog still runs without it)
            LAST_BUILD_TASK_SECONDS.clear()
            for name, fut in futures.items():
                LAST_BUILD_TASK_SECONDS[name] = fut.result()
        _PREPPED.extend(tracked)
        tracked.clear()
    return out


#: Wall seconds per eager build chain of the LAST shared_prep run —
#: diagnostics for prep-growth attribution now that the chains overlap
#: (the per-table marginal numbers in warm_shared_prep_itemized are ~0
#: for anything a chain already materialized).
LAST_BUILD_TASK_SECONDS: dict[str, float] = {}


def warm_shared_prep_itemized(spark: SparkSession,
                              sf_dir: str) -> dict[str, float]:
    """``shared_prep`` + eager materialization; returns seconds spent PER
    TABLE (marginal cost in materialization order). Since r14 wave 3 the
    eager build chains inside ``shared_prep`` run concurrently and
    already materialize most tables, so ``__build`` carries nearly all
    of the wall time and the per-table numbers are the (near-zero)
    residuals; per-CHAIN wall seconds for attribution live in
    ``LAST_BUILD_TASK_SECONDS``."""
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
