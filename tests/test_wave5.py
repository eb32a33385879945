"""Semantic invariants for the wave-5 data-selection operators
(queries_wave5.py): properties the oracle hash-compare cannot distinguish
from a consistently-wrong implementation in both engines."""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_dsir_weights_enrich_target_cohort(spark):
    """DSIR's whole point: the target cohort must score at least as high
    as the rest of the corpus on average (its own tokens define the
    high-weight buckets), and every weight-derived quantity must be a
    positive exact long."""
    from arcane_framework_spark.queries_wave5 import (
        DSIR_TARGET_MOD,
        dsir_weights_documents,
    )

    rows = dsir_weights_documents(spark, SF_DIR).collect()
    assert rows and all(
        r["score"] > 0 and r["n_tokens"] > 0 and r["score_per_token"] >= 0
        for r in rows
    )
    tgt = [
        r["score_per_token"] for r in rows if r["doc_id"] % DSIR_TARGET_MOD == 0
    ]
    rest = [
        r["score_per_token"] for r in rows if r["doc_id"] % DSIR_TARGET_MOD != 0
    ]
    assert tgt and rest
    assert sum(tgt) / len(tgt) >= sum(rest) / len(rest)


def test_dsir_select_budget_and_exact_predicate(spark):
    """PPS selection must land near the expected budget (binomial noise
    band) AND match a from-scratch Python recomputation of the selection
    predicate doc-by-doc — a third independent implementation (hashlib
    md5, exact ints, one float compare) alongside Spark and the DuckDB
    oracle. (A cohort-enrichment assertion would be statistically unsound
    here: the synthetic corpus is homogeneous, so the target cohort's
    score edge is ~0.5% — real but far below selection noise.)"""
    import hashlib

    from arcane_framework_spark.queries_wave5 import (
        DSIR_BUDGET_PCT,
        DSIR_U_BITS,
        dsir_select_documents,
        dsir_weights_documents,
    )

    all_rows = dsir_weights_documents(spark, SF_DIR).collect()
    sel = {r["doc_id"] for r in dsir_select_documents(spark, SF_DIR).collect()}
    n, k = len(all_rows), len(sel)
    assert 0 < k < n
    # expected k = n * PCT/100; allow a wide binomial band (4 sigma-ish)
    exp = n * DSIR_BUDGET_PCT / 100
    assert abs(k - exp) <= max(8, 4 * (exp ** 0.5)), (k, exp)

    t = sum(r["score_per_token"] for r in all_rows)
    b = n * DSIR_BUDGET_PCT // 100
    expected = {
        r["doc_id"]
        for r in all_rows
        if (
            int(
                hashlib.md5(f"sel|{r['doc_id']}".encode()).hexdigest()[:8],
                16,
            )
            % DSIR_U_BITS
        )
        * float(t)
        < float(r["score_per_token"]) * float(b) * float(DSIR_U_BITS)
    }
    assert sel == expected


def test_dedup_rate_by_source_counts_planted(spark):
    """The planted corpus re-inserts every 7th doc as a near-dup, so the
    aggregate dup membership must be positive, every source's members
    must not exceed its docs, and total docs must equal the corpus."""
    from arcane_framework_spark.queries_wave5 import (
        dedup_rate_by_source_documents,
    )

    rows = dedup_rate_by_source_documents(spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert all(0 <= r["n_dup_docs"] <= r["n_docs"] for r in rows)
    assert sum(r["n_dup_docs"] for r in rows) > 0
    for r in rows:
        assert r["dup_rate_ppm"] == r["n_dup_docs"] * 1_000_000 // r["n_docs"]


def test_streaming_dsir_matches_batch(spark):
    """The streaming scorer must emit the IDENTICAL exact longs as the
    batch scorer for every doc (same buckets, same smoothed ratios) —
    the property that lets the twin share the batch oracle verbatim."""
    from arcane_framework_spark.queries_wave5 import (
        dsir_weights_documents,
        streaming_dsir_scoring,
    )

    batch = {
        r["doc_id"]: (r["n_tokens"], r["score"])
        for r in dsir_weights_documents(spark, SF_DIR).collect()
    }
    stream = {
        r["doc_id"]: (r["n_tokens"], r["score"])
        for r in streaming_dsir_scoring(spark, SF_DIR).collect()
    }
    assert batch == stream


def test_incremental_rollup_equals_recompute(spark):
    """The maintained rollup must equal a from-scratch Spark recompute
    over the effective row set — the same equivalence the DuckDB oracle
    checks, asserted engine-internally so a symmetric cross-engine bug
    cannot hide it."""
    from arcane_framework_spark.queries_wave5 import (
        ROLLUP_DEL_MOD,
        ROLLUP_INS_MOD,
        incremental_rollup_events,
    )

    inc = {
        r["event_type"]: (r["n_events"], r["total_cents"], r["avg_cents"])
        for r in incremental_rollup_events(spark, SF_DIR).collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").selectExpr(
        "event_id", "event_type",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents",
    )
    eff = ev.filter(
        (
            (F.col("event_id") % ROLLUP_INS_MOD != 0)
            & (F.col("event_id") % ROLLUP_DEL_MOD != 0)
        )
        | (F.col("event_id") % ROLLUP_INS_MOD == 0)
    )
    direct = {
        r["event_type"]: (r["n"], r["s"], r["s"] // r["n"])
        for r in eff.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("s"),
        )
        .collect()
    }
    assert inc == direct and inc


def test_ivf_multiprobe_recall_monotone(spark):
    """Probing more cells can only ADD candidates (corpus vectors hold
    fixed probe-1 assignments), so recall must be non-decreasing in the
    probe count, bounded by possible, and probe counts must match the
    configured sweep."""
    from arcane_framework_spark.queries_wave5 import (
        IVF_PROBE_SET,
        ivf_multiprobe_recall_embeddings,
    )

    rows = sorted(
        ivf_multiprobe_recall_embeddings(spark, SF_DIR).collect(),
        key=lambda r: r["probes"],
    )
    assert [r["probes"] for r in rows] == sorted(IVF_PROBE_SET)
    hits = [r["hits"] for r in rows]
    assert hits == sorted(hits)  # non-decreasing
    assert all(0 <= r["hits"] <= r["possible"] for r in rows)
    assert all(
        r["recall_ppm"] == r["hits"] * 1_000_000 // r["possible"]
        for r in rows
    )


def test_incremental_semantic_dedup_prunes_planted_twins(spark):
    """Arrivals are planted near-dups of corpus vectors, so MOST must be
    pruned (their twin shares the cell and cosine ~0.99+), none may be
    judged against vectors outside their cell, and corpus members are
    never emitted (only arrivals are questioned)."""
    from arcane_framework_spark.queries_ext import _DUP_OFFSET
    from arcane_framework_spark.queries_wave5 import (
        incremental_semantic_dedup_embeddings,
    )

    rows = incremental_semantic_dedup_embeddings(spark, SF_DIR).collect()
    assert rows and all(r["vec_id"] >= _DUP_OFFSET for r in rows)
    n_pruned = sum(1 for r in rows if r["pruned"])
    assert n_pruned > len(rows) // 2  # planted twins mostly found


def test_streaming_semantic_dedup_batch_split_independent(spark, tmp_path):
    """foreachBatch decisions depend only on (arrival, static corpus), so
    slicing the arrival stream into MANY micro-batches must give the
    identical decision table as the batch operator — the property that
    lets the twin share the batch oracle. Forced here: arrivals written
    as 5 separate files, maxFilesPerTrigger=1 (5 micro-batches)."""
    from pyspark.sql import functions as F

    from arcane_framework_spark.operators.similarity import (
        dot_expr,
        ivf_assign,
        norm_expr,
    )
    from arcane_framework_spark.queries_ext import (
        IVF_STRIDE,
        SEMDEDUP_TAU,
    )
    from arcane_framework_spark.queries_wave5 import (
        incremental_semantic_dedup_embeddings,
    )

    batch = {
        r["vec_id"]: (r["cid"], r["pruned"])
        for r in incremental_semantic_dedup_embeddings(
            spark, SF_DIR
        ).collect()
    }

    # rebuild the same arrivals, write as 5 files, re-judge per micro-batch
    from arcane_framework_spark.queries_ext import (
        EMBEDDING_DIM,
        NEARDUP_DELTA,
        NEARDUP_EVERY,
        _DUP_OFFSET,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cent = emb.filter(F.col("vec_id") % IVF_STRIDE == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    corpus_cells = (
        ivf_assign(emb, cent)
        .withColumn("__n", norm_expr(F.col("vec")))
        .select("cid", F.col("vec").alias("cv"), F.col("__n").alias("cn"))
        .persist()
    )
    arrivals = emb.filter(F.col("vec_id") % NEARDUP_EVERY == 0).select(
        (F.col("vec_id") + F.lit(_DUP_OFFSET)).alias("vec_id"),
        F.concat(
            F.array(F.get(F.col("embedding"), 0) + F.lit(NEARDUP_DELTA)),
            F.slice(F.col("embedding"), 2, EMBEDDING_DIM - 1),
        ).alias("embedding"),
    )
    src = str(tmp_path / "arrivals")
    arrivals.repartition(5).write.parquet(src)

    stream = spark.readStream.schema(
        "vec_id long, embedding array<double>"
    ).option("maxFilesPerTrigger", "1").parquet(src)
    acc = []
    n_batches = []

    def judge(bdf, bid):
        n_batches.append(bid)
        nc = ivf_assign(bdf, cent).withColumn("__n", norm_expr(F.col("vec")))
        pc = F.round(
            dot_expr(F.col("nv"), F.col("cv")) / (F.col("nn") * F.col("cn")),
            6,
        )
        pruned = (
            nc.select(
                F.col("id").alias("vec_id"), "cid",
                F.col("vec").alias("nv"), F.col("__n").alias("nn"),
            )
            .join(corpus_cells, "cid")
            .filter(pc >= F.lit(SEMDEDUP_TAU))
            .select("vec_id").distinct().withColumn("__p", F.lit(True))
        )
        acc.extend(
            nc.select(F.col("id").alias("vec_id"), "cid")
            .join(pruned, "vec_id", "left")
            .select(
                "vec_id", "cid",
                F.coalesce("__p", F.lit(False)).alias("pruned"),
            )
            .collect()
        )

    q = (
        stream.writeStream.foreachBatch(judge)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    corpus_cells.unpersist()
    assert len(n_batches) >= 2  # the split actually happened
    stream_result = {r["vec_id"]: (r["cid"], r["pruned"]) for r in acc}
    assert stream_result == batch


def test_lsh_precision_monotone_and_bounded(spark):
    """Precision must be non-increasing as the threshold rises (fewer
    pairs verify at stricter Jaccard), candidates are constant across
    thresholds, and verified <= candidates."""
    from arcane_framework_spark.queries_wave5 import lsh_precision_documents

    rows = sorted(
        lsh_precision_documents(spark, SF_DIR).collect(),
        key=lambda r: r["threshold_pct"],
    )
    assert len({r["n_candidates"] for r in rows}) == 1
    ver = [r["n_verified"] for r in rows]
    assert ver == sorted(ver, reverse=True)
    assert all(0 <= r["n_verified"] <= r["n_candidates"] for r in rows)


def test_embedding_norm_audit_counts(spark):
    """Audit fields must be internally consistent and match a direct
    recount of the raw table."""
    from arcane_framework_spark.queries_wave5 import embedding_norm_audit

    row = embedding_norm_audit(spark, SF_DIR).collect()[0]
    n = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert row["n_vectors"] == n
    assert 0 <= row["n_zero_norm"] <= n and 0 <= row["n_unit"] <= n
    assert row["unit_ppm"] == row["n_unit"] * 1_000_000 // n
    assert row["min_norm"] <= row["max_norm"]


def test_pretrain_funnel_monotone(spark):
    """Each stage can only shrink the corpus: docs and tokens must be
    non-increasing through the funnel, stage1 must equal the planted
    corpus size, and the near-dup stage must drop at least one planted
    twin (the planting guarantees verified pairs exist)."""
    from arcane_framework_spark.queries import _planted_neardup_docs
    from arcane_framework_spark.queries_wave5 import (
        pretrain_funnel_documents,
    )

    rows = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in pretrain_funnel_documents(spark, SF_DIR).collect()
    }
    order = ["stage1_raw", "stage2_quality", "stage3_exact",
             "stage4_neardup"]
    assert list(rows) and set(rows) == set(order)
    docs = [rows[s][0] for s in order]
    toks = [rows[s][1] for s in order]
    assert docs == sorted(docs, reverse=True)
    assert toks == sorted(toks, reverse=True)
    assert docs[0] == _planted_neardup_docs(spark, SF_DIR).count()
    assert docs[3] < docs[2]  # near-dup stage actually pruned


def test_token_histogram_partitions_corpus(spark):
    """Histogram buckets must partition the corpus exactly: doc and token
    totals equal direct recounts, and each bucket's lengths satisfy
    2^b <= n_tokens < 2^(b+1) (b=0 also holds empty docs)."""
    from arcane_framework_spark.queries_wave5 import (
        token_histogram_documents,
    )

    rows = token_histogram_documents(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    assert all(r["log2_bucket"] >= 0 for r in rows)
    # token total cross-check against the catalog's own counter
    from arcane_framework_spark.operators.text import token_count_expr

    total = docs.select(token_count_expr("text").alias("n")).agg(
        F.sum("n")
    ).collect()[0][0]
    assert sum(r["n_tokens"] for r in rows) == total


def test_minhash_calibration_estimator_monotone(spark):
    """Mean exact Jaccard must be (weakly) monotone in the agreement
    count — more matching permutations must not imply LESS similarity on
    average — and every implied estimate is agree/16 exactly."""
    from arcane_framework_spark.operators.dedup import NUM_HASHES
    from arcane_framework_spark.queries_wave5 import (
        minhash_calibration_documents,
    )

    rows = sorted(
        minhash_calibration_documents(spark, SF_DIR).collect(),
        key=lambda r: r["agree16"],
    )
    assert rows
    for r in rows:
        assert r["est_jaccard_ppm"] == r["agree16"] * 1_000_000 // NUM_HASHES
        assert 0 <= r["mean_true_jaccard_ppm"] <= 1_000_000
    means = [r["mean_true_jaccard_ppm"] for r in rows]
    assert means == sorted(means)


def test_streaming_semantic_dedup_k1_parquet_sink(spark, tmp_path):
    """The PRODUCTION sink path, executed: the same
    run_semantic_dedup_stream seam the gate entry drives with a driver
    accumulator is routed through K1's ParquetStreamSink.foreach_batch()
    adapter, and the protocol parquet output must equal the accumulator
    result row-for-row (plus carry K1's schema sidecar + schema-hash
    part naming)."""
    import os

    from arcane_framework_spark.queries_wave5 import (
        run_semantic_dedup_stream,
        streaming_semantic_dedup,
    )
    from arcane_framework_spark.sinks.parquet_sink import ParquetStreamSink

    expected = {
        (r["vec_id"], r["cid"], r["pruned"])
        for r in streaming_semantic_dedup(spark, SF_DIR).collect()
    }
    assert expected  # non-trivial stream

    base = str(tmp_path / "decisions")
    sink = ParquetStreamSink(base)
    run_semantic_dedup_stream(spark, SF_DIR, sink.foreach_batch())
    token = sink.finish()

    got = {
        (r["vec_id"], r["cid"], r["pruned"])
        for r in spark.read.parquet(os.path.join(base, "data")).collect()
    }
    assert got == expected  # parquet path == accumulator path, bit-for-bit

    # the K1 protocol around the data: schema sidecar, hash-named parts,
    # completion token for the drained (availableNow) stream
    parts = os.listdir(os.path.join(base, "data"))
    assert parts and all(
        p.startswith("part-") and p.endswith("-chunk.parquet") for p in parts
    )
    assert os.listdir(os.path.join(base, "schema"))
    assert token is not None and token.endswith(".COMPLETED")
