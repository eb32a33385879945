"""Round-14 wave-9 catalog tests: the NB quality classifier, label
propagation, and the streaming decontamination twin.

1. ``nb_quality_scores`` learns the obvious separator on a hand-built
   corpus (seed-class tokens score positive, the rest negative) and
   REFUSES a one-class training set loudly (a mis-wired label would
   otherwise produce a silently one-sided "trained" filter).
2. ``nb_confusion`` is an exact integer card: cell counts sum to the
   doc count, shares are floor-ppm of the total.
3. ``label_propagation`` is the synchronous, min-tie variant: a clique
   converges to its min id, disjoint cliques never merge, and an
   isolated bridge keeps chained components apart where connected
   components would glue them.
4. The streaming decontamination twin equals the batch entry across a
   FORCED multi-file batch split (per-doc stateless claim, executed),
   and the K1 parquet production sink carries the identical rows.
"""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, is_pos int"
    )


def test_nb_learns_seed_tokens(spark):
    from arcane_framework_spark.operators.classify import nb_quality_scores

    docs = _docs(spark, [
        (1, "clean prose clean prose", 1),
        (2, "clean prose tidy text", 1),
        (3, "spam junk spam junk", 0),
        (4, "junk noise spam noise", 0),
        (5, "clean tidy prose text", 1),
        (6, "noise junk noise spam", 0),
    ])
    out = {r["doc_id"]: r for r in nb_quality_scores(docs).collect()}
    assert len(out) == 6
    for i in (1, 2, 5):
        assert out[i]["pred_pos"] == 1 and out[i]["llr_micro"] > 0
    for i in (3, 4, 6):
        assert out[i]["pred_pos"] == 0 and out[i]["llr_micro"] < 0
    assert out[1]["n_tokens"] == 4


def test_nb_refuses_one_class_training(spark):
    from arcane_framework_spark.operators.classify import nb_quality_scores

    allpos = _docs(spark, [(1, "a b", 1), (2, "c d", 1)])
    with pytest.raises(ValueError, match="non-empty"):
        nb_quality_scores(allpos)
    allneg = _docs(spark, [(1, "a b", 0), (2, "c d", 0)])
    with pytest.raises(ValueError, match="non-empty"):
        nb_quality_scores(allneg)


def test_nb_confusion_is_exact_floor_ppm(spark):
    from arcane_framework_spark.operators.classify import (
        nb_confusion,
        nb_quality_scores,
    )

    docs = _docs(spark, [
        (1, "good text good", 1),
        (2, "good words", 1),
        (3, "bad stuff bad", 0),
        (4, "bad words", 0),
        (5, "good text words", 1),
        (6, "bad stuff words", 0),
        (7, "good bad", 1),
    ])
    cells = nb_confusion(nb_quality_scores(docs)).collect()
    total = sum(r["n_docs"] for r in cells)
    assert total == 7
    for r in cells:
        assert r["share_ppm"] == r["n_docs"] * 1_000_000 // total


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def test_lpa_clique_converges_to_min_id(spark):
    from arcane_framework_spark.operators.graph import label_propagation

    clique = [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12)]
    out = {
        r["doc_id"]: (r["community"], r["community_size"])
        for r in label_propagation(_pairs(spark, clique)).collect()
    }
    assert out == {
        1: (1, 3), 2: (1, 3), 3: (1, 3),
        10: (10, 3), 11: (10, 3), 12: (10, 3),
    }


def test_lpa_splits_where_cc_glues(spark):
    from arcane_framework_spark.operators.graph import (
        connected_components,
        label_propagation,
    )

    # two 4-cliques joined by one bridge edge 4-10: transitive closure
    # makes one blob; LPA keeps two dense cores (the bridge endpoints
    # are each outvoted by their own clique every round).
    k4 = lambda a, b, c, d: [
        (a, b), (a, c), (a, d), (b, c), (b, d), (c, d)
    ]
    edges = k4(1, 2, 3, 4) + k4(10, 11, 12, 13) + [(4, 10)]
    pairs = _pairs(spark, edges)
    cc = {
        r[0]: r[1]
        for r in connected_components(pairs).collect()
    }
    assert len(set(cc.values())) == 1  # CC: one glued blob
    lpa = {
        r["doc_id"]: r["community"]
        for r in label_propagation(pairs).collect()
    }
    assert set(lpa.values()) == {1, 10}
    assert all(lpa[i] == 1 for i in (1, 2, 3, 4))
    assert all(lpa[i] == 10 for i in (10, 11, 12, 13))


def test_streaming_decontam_multibatch_equals_batch(spark, tmp_path):
    """X195: per-doc stateless ⇒ the stream's verdicts are independent
    of the batch split — 4 single-slice arrival files must reproduce
    the batch entry row-for-row."""
    from arcane_framework_spark.queries_ext import (
        decontam_overlap_documents,
    )
    from arcane_framework_spark.queries_wave9 import run_decontam_stream

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    arrivals_dir = str(tmp_path / "arrivals")
    for i in range(4):
        docs.filter(F.col("doc_id") % 4 == i).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(arrivals_dir)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(arrivals_dir)
    )
    acc, bids = [], []
    run_decontam_stream(
        spark,
        SF_DIR,
        lambda out, bid: (acc.extend(out.collect()), bids.append(bid)),
        stream=stream,
    )
    assert len(bids) >= 2  # genuinely multi-batch
    streamed = sorted((r["doc_id"], r["eval_id"], r["n_shared"]) for r in acc)
    batch = sorted(
        (r["doc_id"], r["eval_id"], r["n_shared"])
        for r in decontam_overlap_documents(spark, SF_DIR).collect()
    )
    assert streamed == batch and len(batch) > 0


def test_streaming_decontam_k1_parquet_sink(spark, tmp_path):
    """The production sink path, executed: run_decontam_stream routed
    through K1's ParquetStreamSink.foreach_batch() writes the identical
    pairs under the protocol layout."""
    from arcane_framework_spark.queries_wave9 import (
        run_decontam_stream,
        streaming_decontam,
    )
    from arcane_framework_spark.sinks.parquet_sink import ParquetStreamSink

    expected = {
        (r["doc_id"], r["eval_id"], r["n_shared"])
        for r in streaming_decontam(spark, SF_DIR).collect()
    }
    assert expected  # non-trivial stream

    base = str(tmp_path / "pairs")
    sink = ParquetStreamSink(base)
    run_decontam_stream(spark, SF_DIR, sink.foreach_batch())
    token = sink.finish()

    got = {
        (r["doc_id"], r["eval_id"], r["n_shared"])
        for r in spark.read.parquet(os.path.join(base, "data")).collect()
    }
    assert got == expected
    assert token is not None and token.endswith(".COMPLETED")


def test_streaming_nb_multibatch_equals_batch(spark, tmp_path):
    """X196: scoring against the frozen model is per-doc stateless —
    4 single-slice arrival files must reproduce the batch scores
    row-for-row."""
    from arcane_framework_spark.queries_wave9 import (
        nb_quality_score_documents,
        run_nb_score_stream,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    arrivals_dir = str(tmp_path / "arrivals")
    for i in range(4):
        docs.filter(F.col("doc_id") % 4 == i).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(arrivals_dir)

    stream = (
        spark.readStream.schema("doc_id long, text string, lang string")
        .option("maxFilesPerTrigger", "1")
        .parquet(arrivals_dir)
    )
    acc, bids = [], []
    run_nb_score_stream(
        spark,
        SF_DIR,
        lambda out, bid: (acc.extend(out.collect()), bids.append(bid)),
        stream=stream,
    )
    assert len(bids) >= 2  # genuinely multi-batch
    streamed = sorted(tuple(r) for r in acc)
    batch = sorted(
        tuple(r) for r in nb_quality_score_documents(spark, SF_DIR).collect()
    )
    assert streamed == batch and len(batch) > 0


def test_semantic_decontam_flags_every_planted_copy(spark):
    """X197: each planted perturbed benchmark copy must be flagged
    against its origin vector (guaranteed recall), and benchmark
    vectors themselves are excluded from the corpus side."""
    from arcane_framework_spark.queries_wave9 import (
        SEM_DECONTAM_EVAL_MOD,
        SEM_DECONTAM_TAU,
        semantic_decontam_embeddings,
    )
    from arcane_framework_spark.queries_ext import _DUP_OFFSET

    rows = semantic_decontam_embeddings(spark, SF_DIR).collect()
    flagged = {(r["vec_id"], r["eval_id"]): r["cosine"] for r in rows}
    bench_ids = [
        r["vec_id"]
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(F.col("vec_id") % SEM_DECONTAM_EVAL_MOD == 0)
        .collect()
    ]
    assert bench_ids
    for b in bench_ids:
        cos = flagged.get((b + _DUP_OFFSET, b))
        assert cos is not None and cos >= SEM_DECONTAM_TAU
    # no benchmark vector appears on the corpus side
    assert all(
        vid % SEM_DECONTAM_EVAL_MOD != 0 or vid >= _DUP_OFFSET
        for vid, _ in flagged
    )


def test_quality_weighted_sample_contract(spark):
    """X198: k rows drawn, every weight is the clamped NB llr
    (max(llr_micro, 1) — so the negative-scoring docs in this corpus
    exercise the clamp), and the estimator weights are consistent with
    ONE threshold: est_w == max(weight, τ) for a single τ (rows where
    the estimator exceeds the weight all expose the same τ)."""
    from arcane_framework_spark.queries_wave9 import (
        QUALITY_SAMPLE_K,
        nb_quality_score_documents,
        quality_weighted_sample_documents,
    )

    scores = {
        r["doc_id"]: r["llr_micro"]
        for r in nb_quality_score_documents(spark, SF_DIR).collect()
    }
    assert any(v < 0 for v in scores.values())  # clamp material
    rows = quality_weighted_sample_documents(spark, SF_DIR).collect()
    assert len(rows) == QUALITY_SAMPLE_K
    taus = set()
    for r in rows:
        assert r["weight"] == max(scores[r["doc_id"]], 1)
        assert r["est_w"] >= float(r["weight"]) or r["est_w"] == round(
            r["weight"], 4
        )
        if r["est_w"] != float(r["weight"]):
            taus.add(r["est_w"])
    assert len(taus) <= 1


def test_nb_merge_counts_is_exact_and_associative(spark):
    """X199's correctness core: NB count merging is exact integer
    addition — merging two delta slices sequentially equals counting
    the full union in one shot, token for token."""
    from arcane_framework_spark.operators.classify import (
        nb_merge_counts,
        nb_token_counts,
    )

    base = _docs(spark, [(1, "a b a", 1), (2, "b c", 0)])
    d1 = _docs(spark, [(3, "a c c", 1)])
    d2 = _docs(spark, [(4, "b b d", 0), (5, "a d", 1)])
    merged = nb_merge_counts(
        nb_merge_counts(nb_token_counts(base), nb_token_counts(d1)),
        nb_token_counts(d2),
    )
    full = nb_token_counts(
        base.unionByName(d1).unionByName(d2)
    )
    got = sorted(tuple(r) for r in merged.collect())
    want = sorted(tuple(r) for r in full.collect())
    assert got == want and len(want) == 4  # tokens a b c d


def test_incremental_nb_reads_counts_bucket_aligned(spark):
    """X199's scale claim: the persisted count table is consumed
    bucket-aligned on the token key — the corpus-sized side of the
    merge join carries no Exchange, only the arriving batch shuffles."""
    from arcane_framework_spark.queries_wave9 import incremental_nb_documents

    df = incremental_nb_documents(spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "incr_nb_counts_side" in plan
    assert "Bucketed: true" in plan


def test_nb_label_null_lang_is_negative_class(spark):
    """Cross-engine NULL-handling pin: a NULL lang must label 0 (the
    oracle's CASE ... ELSE 0) — a bare equality cast would yield NULL
    and silently drop the doc from BOTH class counts on the Spark side
    while DuckDB counted it negative."""
    from arcane_framework_spark.operators.classify import nb_quality_scores
    from arcane_framework_spark.queries_wave9 import _nb_label

    docs = spark.createDataFrame(
        [
            (1, "good clean text", "en"),
            (2, "junk spam", "de"),
            (3, "mystery words junk", None),
        ],
        "doc_id long, text string, lang string",
    )
    out = nb_quality_scores(docs.select("doc_id", "text", _nb_label()))
    rows = {r["doc_id"]: r["is_pos"] for r in out.collect()}
    assert rows == {1: 1, 2: 0, 3: 0}


def _nb_reference(corpus):
    """Pure-Python NB reference: the exact integer/micro-nat spec,
    independent of Spark and DuckDB (the randomized third-opinion
    cross-check the substring family established)."""
    import math
    from collections import Counter

    cpos, cneg = Counter(), Counter()
    dpos = dneg = 0
    docs_toks = {}
    for doc_id, text, is_pos in corpus:
        toks = text.strip().lower().split()
        toks = toks if toks else [""]
        docs_toks[doc_id] = (toks, is_pos)
        if is_pos:
            dpos += 1
            cpos.update(toks)
        else:
            dneg += 1
            cneg.update(toks)
    vocab = set(cpos) | set(cneg)
    npos, nneg, v = sum(cpos.values()), sum(cneg.values()), len(vocab)
    lp = {
        t: math.floor(1e6 * math.log((cpos[t] + 1) / (npos + v)) + 0.5)
        - math.floor(1e6 * math.log((cneg[t] + 1) / (nneg + v)) + 0.5)
        for t in vocab
    }
    prior = math.floor(1e6 * math.log(dpos / dneg) + 0.5)
    out = {}
    for doc_id, (toks, is_pos) in docs_toks.items():
        s = sum(lp[t] for t in toks) + prior
        out[doc_id] = (is_pos, len(toks), s, 1 if s > 0 else 0)
    return out


def test_nb_matches_python_reference_randomized(spark):
    """Exact third-opinion: the Spark operator's integer scores equal a
    pure-Python implementation of the spec on randomized corpora
    (words drawn from a small alphabet so class vocabularies overlap)."""
    import random

    from arcane_framework_spark.operators.classify import nb_quality_scores

    rng = random.Random(20260817)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    for trial in range(4):
        corpus = []
        for i in range(rng.randint(6, 14)):
            n = rng.randint(1, 9)
            text = " ".join(rng.choice(words) for _ in range(n))
            corpus.append((i, text, rng.randint(0, 1)))
        # ensure both classes present
        corpus[0] = (corpus[0][0], corpus[0][1], 1)
        corpus[1] = (corpus[1][0], corpus[1][1], 0)
        want = _nb_reference(corpus)
        got = {
            r["doc_id"]: (
                r["is_pos"], r["n_tokens"], r["llr_micro"], r["pred_pos"]
            )
            for r in nb_quality_scores(_docs(spark, corpus)).collect()
        }
        assert got == want, f"trial {trial}: {got} != {want}"


def _lpa_reference(edges, iterations=3):
    """Pure-Python synchronous min-tie label propagation."""
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    labels = {n: n for n in adj}
    for _ in range(iterations):
        nxt = {}
        for n in adj:
            votes = Counter(labels[m] for m in adj[n])
            votes[labels[n]] += 1
            best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[n] = best[0]
        labels = nxt
    return labels


def test_lpa_matches_python_reference_randomized(spark):
    """Exact third-opinion for X194: the Spark operator's final labels
    equal a pure-Python synchronous LPA on randomized sparse graphs."""
    import random

    from arcane_framework_spark.operators.graph import label_propagation

    rng = random.Random(20260817)
    for trial in range(4):
        n = rng.randint(6, 16)
        edges = set()
        for _ in range(rng.randint(n, 2 * n)):
            a, b = rng.randint(0, n - 1), rng.randint(0, n - 1)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        if not edges:
            continue
        want = _lpa_reference(edges)
        got = {
            r["doc_id"]: r["community"]
            for r in label_propagation(
                _pairs(spark, sorted(edges))
            ).collect()
        }
        assert got == want, f"trial {trial}: {got} != {want}"


def test_semantic_dedup_accepts_pretrained_centroids(spark):
    """The round-14 shared-prep path: passing a centroid table trained
    with the same parameters must yield byte-identical decisions to
    training inside semantic_dedup (both modes) — the invariant that
    lets prep.shared_prep fit once and every twin consume the handle."""
    import random

    from arcane_framework_spark.operators.similarity import (
        kmeans_fit,
        semantic_dedup,
    )

    rng = random.Random(20260814)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    # plant exact-ish duplicates so pruning actually fires
    rows += [(100 + i, [x + 1e-4 for x in rows[i][1]]) for i in range(0, 20, 4)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    for routed in (False, True):
        cent = kmeans_fit(
            vecs, k=None, iterations=2, target_cell_size=16, routed=routed
        )
        inline = semantic_dedup(
            vecs, k=None, threshold=0.9, iterations=2,
            target_cell_size=16, routed=routed,
        ).orderBy("vec_id").collect()
        shared = semantic_dedup(
            vecs, k=None, threshold=0.9, iterations=2,
            target_cell_size=16, routed=routed, centroids=cent,
        ).orderBy("vec_id").collect()
        assert inline == shared, f"routed={routed}"
        assert any(r["pruned"] for r in inline), f"routed={routed}"
