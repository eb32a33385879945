"""Semantic invariants for the wave-6 exact-substring dedup entries
(queries_wave6.py): properties the oracle hash-compare cannot distinguish
from a consistently-wrong implementation in both engines."""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_substring_dedup_removes_planted_spans(spark):
    """Every planted doc except the globally-first one must lose BOTH of
    its span segments (the 16-token span = segments 0 and 1), and the
    one copy kept is the first in (doc_id, seg_idx) order — exactly the
    Lee et al. keep-one-copy policy."""
    from arcane_framework_spark.queries import _DUP_OFFSET
    from arcane_framework_spark.queries_wave6 import (
        SUBSTR_EVERY,
        substring_dedup_documents,
    )

    rows = {
        r["doc_id"]: r
        for r in substring_dedup_documents(spark, SF_DIR).collect()
    }
    planted_ids = sorted(i for i in rows if i >= _DUP_OFFSET)
    assert planted_ids and all(
        (i - _DUP_OFFSET) % SUBSTR_EVERY == 0 for i in planted_ids
    )
    first = planted_ids[0]
    # the first planted doc KEEPS the span (it is the corpus's one copy)
    fr = rows[first]
    assert not fr["removed_idxs"].startswith("0,1")
    # every later planted doc loses segments 0 and 1 (the span) AND its
    # aligned body (a verbatim repeat of its original, which sits earlier)
    for pid in planted_ids[1:]:
        r = rows[pid]
        removed = set(r["removed_idxs"].split(","))
        assert {"0", "1"} <= removed, (pid, r["removed_idxs"])
        assert r["n_removed_segments"] == r["n_segments"], (
            "planted doc is span + verbatim original body: fully removed"
        )
    # originals keep their text unless it repeats elsewhere naturally;
    # accounting must balance per doc
    for r in rows.values():
        assert r["removed_tokens"] + r["kept_tokens"] > 0
        assert r["n_removed_segments"] <= r["n_segments"]
        n_idxs = len([x for x in r["removed_idxs"].split(",") if x != ""])
        assert n_idxs == r["n_removed_segments"]


def test_substring_dedup_by_source_balances(spark):
    """The per-source rollup must sum to the per-doc table exactly, and
    the ppm is the exact integer ratio."""
    from arcane_framework_spark.queries_wave6 import (
        substring_dedup_by_source,
        substring_dedup_documents,
    )

    per_doc = substring_dedup_documents(spark, SF_DIR)
    by_source = {r["source"]: r for r in
                 substring_dedup_by_source(spark, SF_DIR).collect()}
    tot = per_doc.agg(
        F.sum("n_segments").alias("s"),
        F.sum("n_removed_segments").alias("r"),
        F.sum("removed_tokens").alias("rt"),
        F.sum("kept_tokens").alias("kt"),
    ).collect()[0]
    assert sum(r["n_segments"] for r in by_source.values()) == tot["s"]
    assert sum(r["n_removed_segments"] for r in by_source.values()) == tot["r"]
    assert sum(r["removed_tokens"] for r in by_source.values()) == tot["rt"]
    assert sum(r["kept_tokens"] for r in by_source.values()) == tot["kt"]
    for r in by_source.values():
        assert r["removal_ppm"] == r["removed_tokens"] * 1_000_000 // (
            r["removed_tokens"] + r["kept_tokens"]
        )
        assert r["removed_tokens"] > 0  # planting touches every source


def test_exact_substring_first_occurrence_kept_minimal(spark):
    """Hand-built corpus: the repeated 8-token block survives only in
    the earliest (doc_id, seg_idx) position; unique segments are never
    removed; intra-doc repeats of the same block are removed too."""
    from arcane_framework_spark.operators.dedup import (
        exact_substring_segments,
    )

    block = "a b c d e f g h"
    docs = spark.createDataFrame(
        [
            # doc 1: block at seg 0 AND seg 1 (intra-doc repeat)
            (1, f"{block} {block}"),
            # doc 2: unique text then nothing shared
            (2, "p q r s t u v w"),
            # doc 3: the block again (cross-doc repeat)
            (3, f"{block} x y z"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["seg_idx"]): r["removed"]
        for r in exact_substring_segments(docs).collect()
    }
    assert got[(1, 0)] is False   # the one kept copy
    assert got[(1, 1)] is True    # intra-doc repeat removed
    assert got[(2, 0)] is False   # unique text untouched
    assert got[(3, 0)] is True    # cross-doc repeat removed
    assert got[(3, 1)] is False   # doc 3's own tail ("x y z") kept


def test_incremental_substring_matches_batch_restriction(spark):
    """The incremental path (corpus index + within-batch firsts) must
    equal the batch operator run on (corpus UNION batch) restricted to
    the batch rows — the id-ordering equivalence the shared oracle
    relies on."""
    from arcane_framework_spark.queries import _DUP_OFFSET
    from arcane_framework_spark.queries_wave6 import (
        incremental_substring_dedup_documents,
        substring_dedup_documents,
    )

    batch_view = {
        r["doc_id"]: (r["n_removed_segments"], r["kept_tokens"],
                      r["removed_idxs"])
        for r in substring_dedup_documents(spark, SF_DIR).collect()
        if r["doc_id"] >= _DUP_OFFSET
    }
    inc_view = {
        r["doc_id"]: (r["n_removed_segments"], r["kept_tokens"],
                      r["removed_idxs"])
        for r in incremental_substring_dedup_documents(
            spark, SF_DIR
        ).collect()
    }
    assert inc_view == batch_view and inc_view


def test_streaming_substring_dedup_split_state(spark, tmp_path):
    """The streaming twin's cross-batch side-table state: slicing the
    ordered arrival stream into many micro-batches must give identical
    decisions to the single-batch drain AND to the incremental batch
    operator — a later batch repeating an earlier batch's NEW content
    must see it in the seen-side table (this is exactly what the
    stateless X169 pattern cannot express)."""
    import os

    from arcane_framework_spark.queries import _DUP_OFFSET
    from arcane_framework_spark.queries_wave6 import (
        SUBSTR_EVERY,
        SUBSTR_SPAN,
        incremental_substring_dedup_documents,
        run_substring_dedup_stream,
    )

    expected = {
        r["doc_id"]: (r["n_removed_segments"], r["kept_tokens"],
                      r["removed_idxs"])
        for r in incremental_substring_dedup_documents(
            spark, SF_DIR
        ).collect()
    }

    # the same planted arrivals, written as 5 doc_id-ordered files so
    # arrival order == doc_id order across micro-batches
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    arrivals = docs.filter(F.col("doc_id") % SUBSTR_EVERY == 0).select(
        (F.col("doc_id") + F.lit(_DUP_OFFSET)).alias("doc_id"),
        F.concat(F.lit(SUBSTR_SPAN + " "), F.col("text")).alias("text"),
    ).orderBy("doc_id").collect()
    src = str(tmp_path / "arrivals")
    chunk = (len(arrivals) + 4) // 5
    for i in range(5):
        part = arrivals[i * chunk:(i + 1) * chunk]
        if part:
            spark.createDataFrame(
                part, "doc_id long, text string"
            ).coalesce(1).write.parquet(src, mode="append")
    # ordered ingestion: one file per trigger, files named by write order
    acc = []
    bids = []
    run_substring_dedup_stream(
        spark, SF_DIR, str(tmp_path / "seen"),
        lambda out, bid: (acc.extend(out.collect()), bids.append(bid)),
        max_files_per_trigger=1, arrival_source=src,
    )
    assert len(bids) >= 2  # genuinely multi-batch
    got = {
        r["doc_id"]: (r["n_removed_segments"], r["kept_tokens"],
                      r["removed_idxs"])
        for r in acc
    }
    assert got == expected and got
    # the seen state grew: side table holds the arrivals' new content
    seen = str(tmp_path / "seen")
    assert os.path.isdir(seen) and any(
        f.endswith(".parquet") for f in os.listdir(seen)
    )


def test_exact_substring_matches_pure_python_reference(spark):
    """Randomized corpora vs an independent pure-Python reference
    implementation of the keep-first rule — a third opinion besides the
    DuckDB oracle (which shares the SQL-ish formulation) on exactly the
    semantics: non-overlapping 8-token segments, removal iff an earlier
    (doc_id, seg_idx) occurrence of the same content exists."""
    import random

    from arcane_framework_spark.operators.dedup import (
        substring_dedup_stats,
    )
    from arcane_framework_spark.operators.text import SEGMENT_WIDTH

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(12)]  # small vocab → natural repeats
    for trial in range(3):
        docs = [
            (i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(0, 30))))
            for i in range(40)
        ]

        # pure-Python reference
        def segments(text):
            toks = text.lower().strip().split()
            if not text.strip():
                return []
            return [
                tuple(toks[i:i + SEGMENT_WIDTH])
                for i in range(0, len(toks), SEGMENT_WIDTH)
            ]

        seen: set = set()
        expected = {}
        for doc_id, text in sorted(docs):
            segs = segments(text)
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

        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: (
                r["n_segments"], r["n_removed_segments"],
                r["removed_tokens"], r["kept_tokens"], r["removed_idxs"],
            )
            for r in substring_dedup_stats(df).collect()
        }
        assert got == expected, f"trial {trial}"


def test_repetition_stats_gopher_semantics(spark):
    """Hand-built docs: a fully-templated page maxes the duplicate
    fraction, unique text scores zero, and ppms are exact occurrence
    ratios."""
    from arcane_framework_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam"),        # 4 identical bigrams
            (2, "a b c d e"),                        # all unique
            (3, "x y x y x y"),                      # alternating
            (4, "one"),                              # too short for any n-gram
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    r1 = got[1]
    assert r1["n_bigrams"] == 4 and r1["dup_bigram_ppm"] == 1_000_000
    assert r1["top_bigram_ppm"] == 1_000_000
    assert r1["dup_trigram_ppm"] == 1_000_000
    r2 = got[2]
    assert r2["dup_bigram_ppm"] == 0 and r2["top_bigram_ppm"] == 250_000
    r3 = got[3]
    # bigrams: "x y" x3, "y x" x2 → all 5 duplicated; top = 3/5
    assert r3["n_bigrams"] == 5
    assert r3["dup_bigram_ppm"] == 1_000_000
    assert r3["top_bigram_ppm"] == 600_000
    r4 = got[4]
    assert r4["n_tokens"] == 1 and r4["n_bigrams"] == 0
    assert r4["dup_bigram_ppm"] == 0 and r4["n_trigrams"] == 0


def test_streaming_substring_dedup_out_of_order_arrivals(spark, tmp_path):
    """When arrivals do NOT come in doc_id order, the stream's
    first-ARRIVED-wins policy diverges from the batch operator's
    (doc_id, seg_idx) order by design — but the core dedup guarantee
    must still hold: for every segment content, exactly ONE occurrence
    is kept corpus-wide (corpus copy if the corpus has it, else exactly
    one arrival), and the kept arrival is the earliest-arrived batch's.
    """
    import os

    from arcane_framework_spark.operators.text import (
        positioned_segment_hashes,
    )
    from arcane_framework_spark.queries import _DUP_OFFSET
    from arcane_framework_spark.queries_wave6 import (
        SUBSTR_EVERY,
        SUBSTR_SPAN,
        run_substring_dedup_stream,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    arrivals = docs.filter(F.col("doc_id") % SUBSTR_EVERY == 0).select(
        (F.col("doc_id") + F.lit(_DUP_OFFSET)).alias("doc_id"),
        F.concat(F.lit(SUBSTR_SPAN + " "), F.col("text")).alias("text"),
    ).orderBy("doc_id").collect()

    # REVERSED doc_id order across 4 files: highest ids arrive first
    src = str(tmp_path / "arrivals")
    rev = list(reversed(arrivals))
    chunk = (len(rev) + 3) // 4
    batch_of = {}
    for i in range(4):
        part = rev[i * chunk:(i + 1) * chunk]
        if part:
            spark.createDataFrame(
                part, "doc_id long, text string"
            ).coalesce(1).write.parquet(src, mode="append")
            for r in part:
                batch_of[r["doc_id"]] = i

    acc = []
    run_substring_dedup_stream(
        spark, SF_DIR, str(tmp_path / "seen"),
        lambda out, bid: acc.extend(out.collect()),
        max_files_per_trigger=1, arrival_source=src,
    )
    assert len(acc) == len(arrivals)

    # the span segments (content shared by ALL arrivals, absent from the
    # corpus): kept by exactly one arrival, and that keeper belongs to
    # the FIRST batch (earliest arrived), i.e. a HIGH doc_id
    span_keepers = [
        r["doc_id"] for r in acc if not r["removed_idxs"].startswith("0,1")
    ]
    assert len(span_keepers) == 1
    assert batch_of[span_keepers[0]] == 0  # first-arrived wins

    # global single-copy guarantee: count kept occurrences per segment
    # content across corpus + arrivals — every content kept at most once
    # among arrivals, and never kept by an arrival when the corpus has it
    corpus_hashes = {
        r["seg_hash"]
        for r in positioned_segment_hashes(docs).select(
            "seg_hash"
        ).distinct().collect()
    }
    kept_by_content: dict = {}
    arrival_df = spark.createDataFrame(
        arrivals, "doc_id long, text string"
    )
    segs = {
        (r["doc_id"], r["seg_idx"]): r["seg_hash"]
        for r in positioned_segment_hashes(arrival_df).collect()
    }
    for r in acc:
        removed = set(
            int(x) for x in r["removed_idxs"].split(",") if x != ""
        )
        for (doc, idx), h in segs.items():
            if doc != r["doc_id"] or idx in removed:
                continue
            assert h not in corpus_hashes, (doc, idx)
            kept_by_content.setdefault(h, []).append((doc, idx))
    assert kept_by_content  # some new content was kept
    dup_contents = [h for h, occ in kept_by_content.items() if len(occ) > 1]
    assert dup_contents == []  # exactly one kept copy per content
