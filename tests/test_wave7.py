"""Round-12 wave: bucketed batch MinHash + content-defined anchored
exact-substring dedup."""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F


def _py_anchored_segments(text: str, k: int,
                          prime: int, coef, mod: int):
    """Independent pure-Python reference of anchored_segment_hashes."""
    toks = text.lower().strip().split()
    if not text.strip() or not toks:
        return []
    n = len(toks)
    th = [
        int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % prime
        for t in toks
    ]
    anchors = [
        i
        for i in range(2, n - k + 2)  # 1-based gram positions 2..n-k+1
        if sum(th[i - 1 + j] * coef[j] for j in range(k)) % mod == 0
    ]
    cuts = [1] + anchors
    segs = []
    for j, c in enumerate(cuts):
        end = cuts[j + 1] - 1 if j + 1 < len(cuts) else n
        segs.append(tuple(toks[c - 1: end]))
    return segs


def test_anchored_segments_offset_invariant(spark):
    """A verbatim span planted at token offsets 0..7 must yield identical
    interior segments at every offset — the property the aligned
    fixed-width variant lacks by construction."""
    from arcane_framework_spark.operators.text import (
        ANCHOR_COEF,
        ANCHOR_K,
        ANCHOR_MOD,
        ANCHOR_PRIME,
        anchored_segment_hashes,
    )

    span = " ".join(f"spanword{i}" for i in range(40))
    docs = [
        (m, (" ".join(f"pre{m}x{j}" for j in range(m)) + " " + span).strip())
        for m in range(8)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = anchored_segment_hashes(df).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["seg_hash"])

    # reference interior segments: the pure-Python segmentation of the
    # bare span, minus its first and last segment (edges absorb the
    # doc-specific prefix / have no following anchor context)
    interior = {
        hashlib.md5(" ".join(s).encode()).hexdigest()
        for s in _py_anchored_segments(span, ANCHOR_K, ANCHOR_PRIME, ANCHOR_COEF, ANCHOR_MOD)[1:-1]
    }
    assert len(interior) >= 2  # the span is long enough to be catchable
    for m in range(8):
        assert interior <= by_doc[m], f"offset {m} lost interior segments"


def test_unaligned_copies_removed_at_every_offset(spark):
    """Keep-first removal over offset-planted copies: every copy (offset
    1..7) of a 40-token base doc loses its span interior; the aligned
    variant removes nothing for cross-offset copies of the same base."""
    from arcane_framework_spark.operators.dedup import (
        anchored_substring_stats,
        substring_dedup_stats,
    )

    base = " ".join(f"body{i}" for i in range(40))
    docs = [(0, base)] + [
        (m, " ".join(f"fill{m}q{j}" for j in range(m)) + " " + base)
        for m in range(1, 8)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    anchored = {
        r["doc_id"]: r["removed_tokens"]
        for r in anchored_substring_stats(df).collect()
    }
    assert anchored[0] == 0  # the first occurrence is the kept copy
    for m in range(1, 8):
        assert anchored[m] > 0, f"offset {m} copy escaped anchored removal"

    aligned = {
        r["doc_id"]: r["removed_tokens"]
        for r in substring_dedup_stats(df).collect()
    }
    # the adversarial property the verdict named: fixed-width windows
    # never line up across distinct offsets, so the aligned variant
    # misses every copy here
    assert all(aligned[m] == 0 for m in range(8))


def test_anchored_matches_pure_python_reference(spark):
    """Randomized corpora vs an independent pure-Python implementation of
    anchored segmentation + keep-first removal — a third opinion besides
    the DuckDB oracle on exactly the semantics."""
    from arcane_framework_spark.operators.dedup import (
        anchored_substring_stats,
    )
    from arcane_framework_spark.operators.text import (
        ANCHOR_COEF,
        ANCHOR_K,
        ANCHOR_MOD,
        ANCHOR_PRIME,
    )

    rng = random.Random(12)
    vocab = [f"w{i}" for i in range(12)]
    for trial in range(3):
        docs = [
            (i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(0, 30))))
            for i in range(40)
        ]
        seen: set = set()
        expected = {}
        for doc_id, text in sorted(docs):
            segs = _py_anchored_segments(text, ANCHOR_K, ANCHOR_PRIME, ANCHOR_COEF, ANCHOR_MOD)
            if not segs:
                continue  # operator drops blank docs pre-barrier
            removed_idx = []
            kept = removed = 0
            for idx, seg in enumerate(segs):
                if seg in seen:
                    removed_idx.append(idx)
                    removed += len(seg)
                else:
                    seen.add(seg)
                    kept += len(seg)
            expected[doc_id] = (
                len(segs), len(removed_idx), removed, kept,
                ",".join(str(i) for i in removed_idx),
            )
        got = {
            r["doc_id"]: (
                r["n_segments"], r["n_removed_segments"],
                r["removed_tokens"], r["kept_tokens"], r["removed_idxs"],
            )
            for r in anchored_substring_stats(
                spark.createDataFrame(docs, "doc_id long, text string")
            ).collect()
        }
        assert got == expected, f"trial {trial}"


def test_streaming_seen_state_bucketed_join_exchange_free(spark, tmp_path):
    """The streaming substring-dedup seen-state (round-11 verdict #3):
    seeded+appended as a bucketed external table on seg_hash, the
    per-tick presence join and new-hash anti-join must consume the
    bucketing — no Exchange on the state side, strictly fewer exchanges
    than the same join against a flat (unbucketed) state."""
    from arcane_framework_spark.operators.dedup import (
        corpus_segment_hashes,
        incremental_substring_stats,
    )
    from arcane_framework_spark.operators.text import (
        positioned_segment_hashes,
    )
    from arcane_framework_spark.queries_wave6 import _SEEN_STATE_BUCKETS

    corpus = spark.createDataFrame(
        [(i, " ".join(f"c{i}w{j}" for j in range(20))) for i in range(30)],
        "doc_id long, text string",
    )
    seen_dir = str(tmp_path / "seen")
    (
        corpus_segment_hashes(corpus)
        .write.mode("overwrite")
        .bucketBy(_SEEN_STATE_BUCKETS, "seg_hash")
        .sortBy("seg_hash")
        .option("path", seen_dir)
        .saveAsTable("t_seen_state_plan")
    )
    batch = spark.createDataFrame(
        [(100, " ".join(f"c1w{j}" for j in range(20)))],
        "doc_id long, text string",
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        index = spark.table("t_seen_state_plan").select("seg_hash")
        bucketed_plan = (
            incremental_substring_stats(batch, index)
            ._jdf.queryExecution().executedPlan().toString()
        )
        anti_plan = (
            positioned_segment_hashes(batch)
            .select("seg_hash").distinct()
            .join(index, "seg_hash", "left_anti")
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def state_scan_join_path(plan: str) -> list[str]:
        """The ancestor chain from the state-table scan up to its first
        Join — the path the state's bytes travel before joining."""
        lines = plan.splitlines()
        scan_i = next(
            i for i, line in enumerate(lines)
            if "t_seen_state_plan" in line and "FileScan" in line
        )

        def depth(line: str) -> int:
            return len(line) - len(line.lstrip(" :+-"))

        path, cur = [], depth(lines[scan_i])
        for i in range(scan_i - 1, -1, -1):
            if depth(lines[i]) < cur:
                cur = depth(lines[i])
                path.append(lines[i])
                if "Join" in lines[i]:
                    return path
        return path

    for plan in (bucketed_plan, anti_plan):
        assert "Bucketed: true" in plan
        path = state_scan_join_path(plan)
        assert any("Join" in p for p in path), plan
        # the state side — the thing that grows without bound — never
        # moves: no Exchange between its scan and the join (a
        # partition-local Sort is allowed; re-exchanges of the
        # batch-proportional OUTPUT are fine and not on this path)
        assert not any("Exchange" in p for p in path), path
    # every exchange in the anti-join plan is batch-proportional (the
    # distinct's own shuffle + landing on the bucket layout); the state
    # side was asserted exchange-free above
    assert anti_plan.count("Exchange") <= 2, anti_plan


def test_minhash_bucketed_matches_memory_path_and_plan(spark):
    """The bucketed side-table plan must (a) produce bit-identical pairs
    to the in-memory path, and (b) run the band self-join and both
    shingle verification joins WITHOUT an exchange on the bucketed
    sides — the only shuffles left are the pair stream's own (distinct +
    the two verification probes)."""
    from arcane_framework_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_bucketed,
    )

    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(50)]
    base = [
        " ".join(rng.choice(vocab) for _ in range(25)) for _ in range(30)
    ]
    docs = [(i, t) for i, t in enumerate(base)] + [
        (100 + i, t + " extra") for i, t in enumerate(base[:10])
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    mem = sorted(
        (r.id_a, r.id_b, r.jaccard) for r in minhash_lsh_pairs(df).collect()
    )
    out = minhash_lsh_pairs_bucketed(df, table_prefix="t_mh_bucketed")
    bkt = sorted((r.id_a, r.id_b, r.jaccard) for r in out.collect())
    assert mem == bkt and len(mem) >= 10

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = (
            minhash_lsh_pairs_bucketed(df, table_prefix="t_mh_bucketed2")
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # only the candidate-pair stream shuffles: the distinct, then once
    # onto id_a, once onto id_b — never the band table, never the
    # shingle arrays
    assert plan.count("Exchange") == 3, plan
    assert plan.count("Bucketed: true") == 4, plan  # 2x bands + 2x shingles

def test_semdedup_gemm_incell_matches_join_path(spark):
    """The GEMM in-cell dominance (round-11 verdict #5) must make
    bit-identical decisions to the left-semi join path it replaces —
    including pairs engineered to sit in the rounding-boundary band
    where the exact-fold re-check fires."""
    import math
    import random

    from arcane_framework_spark.operators.similarity import semantic_dedup

    rng = random.Random(42)
    rows = []
    # random cluster structure: 12 clusters of near-dups
    for c in range(12):
        base = [rng.gauss(0, 1) for _ in range(16)]
        for j in range(6):
            rows.append((c * 100 + j,
                         [x + rng.gauss(0, 0.01 * j) for x in base]))
    # a boundary-band pair: cosine exactly at the 0.9 half-up boundary
    b = 0.8999995
    rows.append((9001, [1.0] + [0.0] * 15))
    rows.append((9002, [b, math.sqrt(1 - b * b)] + [0.0] * 14))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    for routed in (False, True):
        join_out = sorted(
            (r.vec_id, r.cid, r.cent_cos, r.pruned)
            for r in semantic_dedup(
                df, k=None, threshold=0.9, iterations=2,
                target_cell_size=8, routed=routed, incell="join",
            ).collect()
        )
        gemm_out = sorted(
            (r.vec_id, r.cid, r.cent_cos, r.pruned)
            for r in semantic_dedup(
                df, k=None, threshold=0.9, iterations=2,
                target_cell_size=8, routed=routed, incell="gemm",
            ).collect()
        )
        assert join_out == gemm_out and len(join_out) == len(rows)
        assert any(r[3] for r in gemm_out)  # something actually pruned
