"""Unit tests for the round-5 training-pipeline operators: segment
boilerplate dedup, source-overlap matrix, interleaved training order,
vocab coverage, hourly anomaly z-scores, and epoch allocation."""

import pyspark.sql.functions as F
import pytest

from arcane_framework_spark.operators.decontam import source_overlap
from arcane_framework_spark.operators.sampling import (
    epoch_allocation,
    interleaved_order,
)
from arcane_framework_spark.operators.temporal import hourly_anomaly
from arcane_framework_spark.operators.text import (
    boilerplate_segment_stats,
    segment_hashes,
    vocab_coverage,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


class TestBoilerplateSegments:
    def test_planted_boilerplate_flagged(self, spark):
        footer = "subscribe to our newsletter for more updates now"  # exactly 8 tokens
        rows = [
            (i, "s", footer + " " + " ".join(f"w{i}x{j}" for j in range(8)))
            for i in range(4)
        ] + [(99, "s", " ".join(f"u{j}" for j in range(8)))]
        out = boilerplate_segment_stats(_docs(spark, rows)).collect()
        by_id = {r["doc_id"]: r for r in out}
        # Each planted doc: seg0 = footer (shared by 4 >= 3 docs), seg1 unique.
        for i in range(4):
            r = by_id[i]
            assert r["n_segments"] == 2
            assert r["n_boiler_segments"] == 1
            assert r["kept_tokens"] == 8
            assert r["boiler_token_frac"] == 0.5
        assert by_id[99]["n_boiler_segments"] == 0
        assert by_id[99]["kept_tokens"] == 8

    def test_short_tail_segment_counted(self, spark):
        # 10 tokens -> segments of 8 and 2.
        rows = [(1, "s", " ".join(f"t{j}" for j in range(10)))]
        segs = segment_hashes(_docs(spark, rows)).collect()
        assert sorted(s["seg_tokens"] for s in segs) == [2, 8]

    def test_empty_text_emits_no_segments(self, spark):
        rows = [(1, "s", ""), (2, "s", "a b c")]
        out = boilerplate_segment_stats(_docs(spark, rows)).collect()
        assert {r["doc_id"] for r in out} == {2}


class TestSourceOverlap:
    def test_known_containment(self, spark):
        # a: tokens 1..6 -> 4 distinct 3-grams; b shares the first 3 tokens
        # (1 shared gram); c disjoint.
        rows = [
            (1, "a", "t1 t2 t3 t4 t5 t6"),
            (2, "b", "t1 t2 t3 zz zz2 zz3"),
            (3, "c", "q1 q2 q3 q4"),
        ]
        out = source_overlap(_docs(spark, rows)).collect()
        pairs = {(r["source_a"], r["source_b"]): r for r in out}
        ab = pairs[("a", "b")]
        assert ab["shared_ngrams"] == 1
        # b has 4 grams, a has 4 grams -> containment 1/4.
        assert ab["overlap_frac"] == 0.25
        assert ("a", "c") not in pairs and ("b", "c") not in pairs

    def test_gram_multiplicity_ignored(self, spark):
        # The same gram repeated within a source counts once (DISTINCT).
        rows = [
            (1, "a", "x y z x y z"),
            (2, "b", "x y z"),
        ]
        out = source_overlap(_docs(spark, rows)).collect()
        ab = {(r["source_a"], r["source_b"]): r for r in out}[("a", "b")]
        assert ab["shared_ngrams"] == 1
        assert ab["overlap_frac"] == 1.0


class TestInterleavedOrder:
    def test_positions_unique_and_round_robin(self, spark):
        rows = [(i, f"s{i % 3}", "x") for i in range(30)]
        out = interleaved_order(_docs(spark, rows)).collect()
        positions = [r["position"] for r in out]
        assert len(set(positions)) == 30
        # position % n_sources recovers the alphabetical source index.
        for r in out:
            assert r["position"] % 3 == int(r["source"][1:])

    def test_deterministic_across_partitioning(self, spark):
        rows = [(i, f"s{i % 4}", "x") for i in range(40)]
        d1 = _docs(spark, rows)
        d2 = _docs(spark, rows).repartition(7, "doc_id")
        o1 = sorted(map(tuple, interleaved_order(d1).collect()))
        o2 = sorted(map(tuple, interleaved_order(d2).collect()))
        assert o1 == o2

    def test_seed_changes_order(self, spark):
        rows = [(i, "s", "x") for i in range(20)]
        d = _docs(spark, rows)
        o1 = {r["doc_id"]: r["position"]
              for r in interleaved_order(d, seed="e0").collect()}
        o2 = {r["doc_id"]: r["position"]
              for r in interleaved_order(d, seed="e1").collect()}
        assert o1 != o2
        assert set(o1.values()) == set(o2.values())


class TestVocabCoverage:
    def test_top_v_cut_and_coverage(self, spark):
        rows = [
            (1, "a", "hot hot hot cold"),
            (2, "b", "hot rare"),
        ]
        out = {r["source"]: r
               for r in vocab_coverage(_docs(spark, rows), vocab_size=1)
               .collect()}
        # vocab = {hot}; a: 3/4 covered, b: 1/2.
        assert out["a"]["vocab_tokens"] == 3
        assert out["a"]["coverage"] == 0.75
        assert out["b"]["coverage"] == 0.5

    def test_tie_break_alphabetical(self, spark):
        rows = [(1, "a", "bb aa bb aa")]
        out = vocab_coverage(_docs(spark, rows), vocab_size=1).collect()[0]
        # aa and bb tie at 2; aa wins the cut.
        assert out["vocab_tokens"] == 2


class TestHourlyAnomaly:
    def test_z_score_exact(self, spark):
        import datetime as dt

        # Type 'a': hour counts [1, 1, 4] -> n=3, S=6, Q=18,
        # z(4) = (4*3-6)/sqrt(3*18-36) = 6/sqrt(18).
        base = dt.datetime(2024, 1, 1)
        rows = (
            [(base, "a")] + [(base + dt.timedelta(hours=1), "a")]
            + [(base + dt.timedelta(hours=2), "a")] * 4
        )
        df = spark.createDataFrame(rows, "ts timestamp, event_type string")
        out = hourly_anomaly(df, F.col("ts")).collect()
        top = [r for r in out if r["rank"] == 1][0]
        assert top["n_events"] == 4
        import math

        expected = math.floor(6 / math.sqrt(18) * 1e4 + 0.5) / 1e4
        assert top["z_score"] == expected

    def test_constant_series_zero_z(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = [(base + dt.timedelta(hours=h), "a") for h in range(4)]
        df = spark.createDataFrame(rows, "ts timestamp, event_type string")
        out = hourly_anomaly(df, F.col("ts")).collect()
        assert all(r["z_score"] == 0.0 for r in out)


class TestEpochAllocation:
    def test_sqrt_weights(self, spark):
        rows = [(1, "a", 100), (2, "b", 400)]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
        out = {r["source"]: r
               for r in epoch_allocation(df, 3_000_000).collect()}
        # sqrt weights 10:20 -> 1/3 and 2/3 of the budget.
        assert out["a"]["target_tokens"] == 1_000_000
        assert out["b"]["target_tokens"] == 2_000_000
        assert out["a"]["repeat_factor"] == 10_000.0
        assert out["b"]["repeat_factor"] == 5_000.0

    def test_weights_sum_to_one(self, spark):
        rows = [(i, f"s{i}", 50 + i * 13) for i in range(8)]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
        out = epoch_allocation(df, 10_000).collect()
        assert abs(sum(r["weight"] for r in out) - 1.0) < 1e-4


class TestDistributionDrift:
    def test_known_shift(self, spark):
        import datetime as dt

        from arcane_framework_spark.operators.drift import distribution_drift

        base = dt.datetime(2024, 1, 1)
        # Early half: 3 a, 1 b. Late half: 1 a, 3 b.
        rows = (
            [(base, "a")] * 3 + [(base, "b")]
            + [(base + dt.timedelta(hours=10), "a")]
            + [(base + dt.timedelta(hours=10), "b")] * 3
        )
        df = spark.createDataFrame(rows, "ts timestamp, event_type string")
        out = {r["event_type"]: r
               for r in distribution_drift(df, F.unix_micros("ts")).collect()}
        assert out["a"]["n_early"] == 3 and out["a"]["n_late"] == 1
        assert out["a"]["share_early"] == 0.75
        assert out["a"]["tvd_contrib"] == 0.5
        assert out["b"]["tvd_contrib"] == 0.5

    def test_midpoint_lands_late(self, spark):
        from arcane_framework_spark.operators.drift import distribution_drift

        # Timestamps 0 and 2 us -> midpoint 1 is "late"; row at 1 late.
        df = spark.createDataFrame(
            [(0, "a"), (1, "a"), (2, "a")], "us long, event_type string"
        )
        out = distribution_drift(df, F.col("us")).collect()[0]
        assert out["n_early"] == 1 and out["n_late"] == 2


class TestBigramLift:
    def test_collocation_ranked_first(self, spark):
        from arcane_framework_spark.operators.text import bigram_lift

        # "x y" always adjacent (perfect collocation); filler is diffuse.
        rows = [(i, "s", "x y " + " ".join(f"f{j % 7} g{i % 5}" for j in range(6)))
                for i in range(10)]
        out = bigram_lift(_docs(spark, rows), min_count=5, top_k=5).collect()
        assert out[0]["rank"] == 1
        top = (out[0]["w1"], out[0]["w2"])
        assert top == ("x", "y")
        # lift of a perfect pair: N * c_xy / (c_x * c_y) = N * 10 / 100.
        assert out[0]["n_pair"] == 10

    def test_min_count_filters(self, spark):
        from arcane_framework_spark.operators.text import bigram_lift

        rows = [(1, "s", "a b"), (2, "s", "c d")]
        assert bigram_lift(_docs(spark, rows), min_count=2).count() == 0


class TestGroupedMedian:
    def test_odd_and_even_groups(self, spark):
        from arcane_framework_spark.operators.scale import grouped_median

        rows = [("a", v) for v in [1, 3, 5]] + [("b", v) for v in [2, 4, 6, 8]]
        df = spark.createDataFrame(rows, "g string, v long")
        out = {r["g"]: r for r in grouped_median(df, "g", "v").collect()}
        assert out["a"]["median_v"] == 3       # odd: middle element
        assert out["b"]["median_v"] == 4       # even: lower median
        assert out["a"]["n_rows"] == 3 and out["b"]["n_rows"] == 4

    def test_duplicated_values(self, spark):
        from arcane_framework_spark.operators.scale import grouped_median

        rows = [("a", 7)] * 5 + [("a", 1)] * 2
        df = spark.createDataFrame(rows, "g string, v long")
        out = grouped_median(df, "g", "v").collect()[0]
        assert out["median_v"] == 7


class TestGroupedQuantiles:
    def test_matches_python_lower_quantiles(self, spark):
        from arcane_framework_spark.operators.scale import grouped_quantiles

        vals = {"a": [5, 1, 9, 3, 7, 11, 2, 8, 6, 4], "b": [10] * 3 + [20]}
        rows = [(g, v) for g, vs in vals.items() for v in vs]
        df = spark.createDataFrame(rows, "g string, v long")
        out = {
            r["g"]: r
            for r in grouped_quantiles(
                df, "g", "v", percents=(50, 90, 99)
            ).collect()
        }

        def lower_q(vs, p):
            s = sorted(vs)
            import math

            return s[max(0, math.ceil(p / 100 * len(s)) - 1)]

        for g, vs in vals.items():
            assert out[g]["n_rows"] == len(vs)
            for p in (50, 90, 99):
                assert out[g][f"p{p}_v"] == lower_q(vs, p), (g, p)

    def test_nulls_excluded(self, spark):
        from arcane_framework_spark.operators.scale import grouped_quantiles

        df = spark.createDataFrame(
            [("a", 1), ("a", None), ("a", 3)], "g string, v long"
        )
        out = grouped_quantiles(df, "g", "v").collect()[0]
        assert out["n_rows"] == 2 and out["p50_v"] == 1


class TestSharedPrep:
    def test_substitution_and_release(self, spark):
        """warm_shared_prep persists the dedup prep tables; a catalog
        entry built afterwards gets them substituted into its PHYSICAL
        plan (InMemoryTableScan), a per-query cache_scope cannot evict
        them, and release_shared_prep drops them again."""
        from arcane_framework_spark.operators.cache import cache_scope
        from arcane_framework_spark.prep import (
            release_shared_prep,
            warm_shared_prep,
        )
        from arcane_framework_spark.queries import QUERIES

        sf = "/root/testdata/sf0.001"
        try:
            warm_shared_prep(spark, sf)
            with cache_scope():
                q = QUERIES["minhash_pairs_documents"](spark, sf)
                plan = q._jdf.queryExecution().executedPlan().toString()
                assert "InMemoryTableScan" in plan
                q.write.format("noop").mode("overwrite").save()
            # the scope exit above must NOT have evicted the shared prep:
            # a freshly built consumer still reads the cached tables
            q2 = QUERIES["minhash_pairs_documents"](spark, sf)
            plan2 = q2._jdf.queryExecution().executedPlan().toString()
            assert "InMemoryTableScan" in plan2
        finally:
            release_shared_prep()
        # release dropped the prep's cache entries — probe by building the
        # equivalent plan and asking the CacheManager for it (storageLevel
        # does a canonicalized-plan lookup). Checking cm.isEmpty() would be
        # wrong here: other tests in the shared session own caches too.
        from arcane_framework_spark.operators.dedup import (
            minhash_signatures,
        )
        from arcane_framework_spark.queries import _planted_neardup_docs

        lvl = minhash_signatures(
            _planted_neardup_docs(spark, sf)
        ).storageLevel
        assert not (lvl.useMemory or lvl.useDisk)

    def test_substring_prep_substitution_and_equality(self, spark):
        """r14 wave 3: the substring-family prep tables (corpus segment
        indexes + planted flagged-segment tables) substitute into the
        batch consumers' physical plans, and results are byte-identical
        with and without prep (substitution only ever replaces a subtree
        with that subtree's own materialized output)."""
        from arcane_framework_spark.operators.cache import cache_scope
        from arcane_framework_spark.prep import (
            release_shared_prep,
            warm_shared_prep,
        )
        from arcane_framework_spark.queries import QUERIES

        sf = "/root/testdata/sf0.001"
        entries = (
            "substring_dedup_documents",
            "incremental_substring_unaligned_documents",
            "anchored_width_stats_documents",
        )
        baseline = {}
        for name in entries:
            with cache_scope():
                baseline[name] = sorted(
                    map(repr, QUERIES[name](spark, sf).collect())
                )
        try:
            warm_shared_prep(spark, sf)
            for name in entries:
                with cache_scope():
                    q = QUERIES[name](spark, sf)
                    plan = q._jdf.queryExecution().executedPlan().toString()
                    assert "InMemoryTableScan" in plan, name
                    assert sorted(map(repr, q.collect())) == baseline[name]
        finally:
            release_shared_prep()

    def test_nb_decontam_prep_equality(self, spark):
        """r15: the NB family scores against the prep-trained frozen
        model and the decontam pair reads the prep'd eval-gram table;
        results are identical with and without prep (deterministic
        integer model / substitution by the subtree's own output)."""
        from arcane_framework_spark.operators.cache import cache_scope
        from arcane_framework_spark.prep import (
            get_prepped,
            release_shared_prep,
            warm_shared_prep,
        )
        from arcane_framework_spark.queries import QUERIES

        sf = "/root/testdata/sf0.001"
        entries = (
            "nb_quality_score_documents",
            "nb_classifier_eval_documents",
            "streaming_nb_scoring",
            "incremental_nb_documents",
            "decontam_overlap_documents",
            "streaming_decontam",
        )
        baseline = {}
        for name in entries:
            with cache_scope():
                baseline[name] = sorted(
                    map(repr, QUERIES[name](spark, sf).collect())
                )
        try:
            warm_shared_prep(spark, sf)
            assert get_prepped(("nb_model", sf), spark) is not None
            for name in entries:
                with cache_scope():
                    q = QUERIES[name](spark, sf)
                    assert sorted(map(repr, q.collect())) == baseline[name], (
                        name
                    )
        finally:
            release_shared_prep()

    def test_stale_session_handle_rebuilt(self, spark):
        """A handle left over from a STOPPED session (warmed, session
        restarted, release never called) must not make shared_prep no-op:
        the stale registry is cleared and prep rebuilds against the live
        session — otherwise the optimization silently disappears while
        every consumer falls back to per-entry rebuilds."""
        from arcane_framework_spark import prep as prep_mod
        from arcane_framework_spark.prep import (
            get_prepped,
            release_shared_prep,
            shared_prep,
        )

        sf = "/root/testdata/sf0.001"

        class _DeadSessionDF:
            sparkSession = object()  # not the live session

            def unpersist(self):
                pass

        try:
            prep_mod._HANDLES[("components", sf)] = _DeadSessionDF()
            out = shared_prep(spark, sf)
            assert out, "stale handle must trigger a rebuild, not a no-op"
            live = get_prepped(("components", sf), spark)
            assert live is not None and live.sparkSession is spark
            # idempotent once live: second call is a no-op
            assert shared_prep(spark, sf) == {}
        finally:
            release_shared_prep()


class TestWavAudio:
    def test_roundtrip_and_chunk_walk(self, spark):
        import struct

        import numpy as np

        from arcane_framework_spark.operators.multimodal import (
            decode_wav,
            synthesize_wav,
        )

        b = synthesize_wav(3, 40)
        rate, ch, s = decode_wav(b)
        assert (rate, ch, len(s)) == (8000, 1, 296)
        # Insert a LIST metadata chunk before data: the parser must walk
        # chunks, not assume fixed offsets.
        extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
        patched = b[:12] + extra + b[12:]
        patched = b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
        rate2, _, s2 = decode_wav(patched)
        assert rate2 == 8000 and np.array_equal(s, s2)

    def test_malformed_rejected(self, spark):
        import struct

        from arcane_framework_spark.operators.multimodal import (
            decode_wav,
            synthesize_wav,
        )

        with pytest.raises(ValueError):
            decode_wav(b"nope")
        with pytest.raises(ValueError):
            decode_wav(b"RIFF\x00\x00\x00\x00WAVE")  # no chunks
        # A lying chunk size must be a ValueError, not silent truncation
        # or a downstream struct/numpy error.
        good = synthesize_wav(1, 10)
        lying = good[:40] + struct.pack("<I", 10_000_000) + good[44:]
        with pytest.raises(ValueError):
            decode_wav(lying)

    def test_features_distributed(self, spark):
        from arcane_framework_spark.operators.multimodal import (
            documents_as_wav_assets,
            wav_audio_features,
        )

        df = spark.createDataFrame(
            [(i, 10 + i * 37) for i in range(20)],
            "doc_id long, n_chars long",
        )
        out = wav_audio_features(documents_as_wav_assets(df)).collect()
        assert len(out) == 20
        for r in out:
            n = 256 + (10 + r["doc_id"] * 37) % 256
            assert r["n_samples"] == n
            assert r["rms"] == float(8192 + r["doc_id"] % 8192)
            assert r["duration_ms"] == n * 1000 // 8000


class TestWinnowing:
    def test_winnowing_guarantee(self, spark):
        """The winnowing theorem: any shared token run of >= k + w - 1
        tokens yields at least one shared fingerprint."""
        from arcane_framework_spark.operators.dedup import (
            WINNOW_K,
            WINNOW_W,
            winnow_fingerprints,
        )

        run = " ".join(f"shared{j}" for j in range(WINNOW_K + WINNOW_W - 1))
        rows = [
            (1, "s", "p1a p1b p1c " + run + " t1a t1b t1c"),
            (2, "s", "p2a p2b p2c p2d " + run + " t2a"),
        ]
        fps = winnow_fingerprints(_docs(spark, rows)).collect()
        by_doc = {}
        for r in fps:
            by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
        assert by_doc[1] & by_doc[2]

    def test_pairs_found_and_capped(self, spark):
        from arcane_framework_spark.operators.dedup import winnow_pairs

        shared = " ".join(f"w{j}" for j in range(20))
        rows = [(i, "s", shared + f" uniq{i}a uniq{i}b") for i in range(4)]
        # All 6 pairs share fingerprints...
        assert winnow_pairs(_docs(spark, rows), min_shared=1).count() == 6
        # ...but a stop-fingerprint cap below the doc count kills the
        # boilerplate fingerprints (all fps here are in all 4 docs).
        assert winnow_pairs(
            _docs(spark, rows), min_shared=1, max_docs_per_fp=3
        ).count() == 0

    def test_short_doc_single_fingerprint(self, spark):
        from arcane_framework_spark.operators.dedup import (
            winnow_fingerprints,
        )

        # 5 tokens, k=4 -> 2 grams < w: one global-min fingerprint.
        rows = [(1, "s", "a b c d e")]
        assert winnow_fingerprints(_docs(spark, rows)).count() == 1
        # shorter than k: nothing.
        rows2 = [(2, "s", "a b c")]
        assert winnow_fingerprints(_docs(spark, rows2)).count() == 0


class TestAudit:
    def test_orphan_and_constraint_checks(self, spark):
        from arcane_framework_spark.operators.audit import (
            count_check,
            integrity_report,
            orphan_check,
        )

        child = spark.createDataFrame(
            [(1, 10.0), (2, -1.0), (99, 5.0), (None, 3.0)],
            "fk long, amount double",
        )
        parent = spark.createDataFrame([(1,), (2,)], "pk long")
        report = {r["check"]: r["violations"] for r in integrity_report([
            orphan_check(child, parent, "orphans", "fk", "pk"),
            count_check(child, "neg_amount", F.col("amount") < 0),
        ]).collect()}
        # 99 has no parent; the null FK also counts as an orphan.
        assert report["orphans"] == 2
        assert report["neg_amount"] == 1

    def test_checks_report_zero_on_clean_and_empty(self, spark):
        from arcane_framework_spark.operators.audit import (
            count_check,
            orphan_check,
        )

        clean = spark.createDataFrame([(1, 1.0)], "fk long, amount double")
        parent = spark.createDataFrame([(1,)], "pk long")
        assert orphan_check(clean, parent, "o", "fk", "pk").collect()[0][
            "violations"] == 0
        empty = clean.filter(F.lit(False))
        assert count_check(empty, "c", F.lit(True)).collect()[0][
            "violations"] == 0

    def test_coverage_gaps_exact(self, spark):
        import datetime as dt

        from arcane_framework_spark.operators.audit import coverage_gaps

        base = dt.datetime(2024, 1, 1)
        # Global range spans 4 hours (h0..h3). Type a present h0,h3
        # (missing h1,h2); type b present h1 only (missing h0,h2,h3).
        rows = [
            (base, "a"), (base + dt.timedelta(hours=3), "a"),
            (base + dt.timedelta(hours=1), "b"),
        ]
        df = spark.createDataFrame(rows, "ts timestamp, event_type string")
        out = {r["event_type"]: r
               for r in coverage_gaps(df, F.col("ts")).collect()}
        assert out["a"]["n_expected"] == 4 and out["a"]["n_missing"] == 2
        assert out["a"]["first_missing_hour"] == "2024-01-01 01:00:00"
        assert out["b"]["n_missing"] == 3
        assert out["b"]["first_missing_hour"] == "2024-01-01 00:00:00"


class TestReviewHardening:
    def test_compaction_with_string_file_ids(self, spark):
        from arcane_framework_spark.operators.maintenance import (
            plan_compaction,
        )

        rows = [("p0", f"part-{i:05d}.parquet", 100) for i in range(20)]
        df = spark.createDataFrame(rows, "part string, file_id string, size long")
        out = plan_compaction(df, target_bytes=1000)
        # All 20 small files must land in the plan (not a silently
        # empty result from a nulled string % int group key).
        assert out.count() == 20

    def test_grouped_median_ignores_nulls(self, spark):
        from arcane_framework_spark.operators.scale import grouped_median

        rows = [("a", 1), ("a", None), ("a", 3), ("a", None), ("a", 5)]
        df = spark.createDataFrame(rows, "g string, v long")
        out = grouped_median(df, "g", "v").collect()[0]
        assert out["median_v"] == 3 and out["n_rows"] == 3

    def test_wav_zero_rate_rejected(self, spark):
        import struct

        from arcane_framework_spark.operators.multimodal import (
            decode_wav,
            synthesize_wav,
        )

        good = bytearray(synthesize_wav(1, 10))
        struct.pack_into("<I", good, 24, 0)  # fmt.sample_rate = 0
        with pytest.raises(ValueError):
            decode_wav(bytes(good))

    def test_table_cache_resets_for_new_session_object(self, spark):
        from arcane_framework_spark.session import _TABLE_CACHE, load_tables

        load_tables(spark, "/root/testdata/sf0.001", "region")
        assert _TABLE_CACHE["session"] is spark
        s2 = spark.newSession()
        t = load_tables(s2, "/root/testdata/sf0.001", "region")
        # the clone got its own DataFrame and its own temp view
        assert _TABLE_CACHE["session"] is s2
        assert s2.sql("SELECT count(*) FROM region").collect()[0][0] == \
            t["region"].count()


class TestJLProjection:
    def test_projection_exact_small_case(self, spark):
        from arcane_framework_spark.operators.similarity import (
            EMBEDDING_DIM,
            hyperplane_weights,
            jl_project,
        )

        # One-hot vector at dim d: projection = column d of the matrix
        # (scaled by 1e6 fixed-point).
        d = 7
        vec = [0.0] * EMBEDDING_DIM
        vec[d] = 1.0
        df = spark.createDataFrame(
            [(1, vec)], "vec_id long, embedding array<double>"
        )
        out = jl_project(df).collect()[0]["proj"]
        w = hyperplane_weights(16, EMBEDDING_DIM)
        assert list(out) == [w[p][d] * 1_000_000 for p in range(16)]

    def test_distortion_mean_near_one(self, spark):
        import random

        from arcane_framework_spark.operators.similarity import (
            EMBEDDING_DIM,
            jl_distortion,
        )

        rng = random.Random(7)
        rows = [
            (i * 41, [rng.uniform(-1, 1) for _ in range(EMBEDDING_DIM)])
            for i in range(40)
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        out = jl_distortion(df).collect()[0]
        assert out["n_pairs"] == 39
        # E[distortion] = 1 for Rademacher projections; k=16 gives a
        # loose but meaningful band.
        assert 0.5 < out["mean_distortion"] < 1.5
        assert out["min_distortion"] <= out["mean_distortion"] <= \
            out["max_distortion"]

    def test_identical_vectors_excluded(self, spark):
        from arcane_framework_spark.operators.similarity import (
            EMBEDDING_DIM,
            jl_distortion,
        )

        rows = [(0, [1.0] * EMBEDDING_DIM), (41, [1.0] * EMBEDDING_DIM)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        # zero original distance -> pair dropped, empty aggregate.
        out = jl_distortion(df).collect()[0]
        assert out["n_pairs"] == 0


class TestPostingLists:
    def test_positions_and_cap(self, spark):
        from arcane_framework_spark.operators.retrieval import posting_lists

        rows = [(1, "s", "a b a"), (2, "s", "b a"), (3, "s", "a")]
        out = {r["token"]: r
               for r in posting_lists(_docs(spark, rows), max_postings=2)
               .collect()}
        # True df survives the cap; postings keep only the 2 lowest ids.
        assert out["a"]["n_docs"] == 3
        assert out["a"]["postings"] == "1:0|2;2:1"
        assert out["b"]["postings"] == "1:1;2:0"

    def test_deterministic_across_partitioning(self, spark):
        from arcane_framework_spark.operators.retrieval import posting_lists

        rows = [(i, "s", f"tok{i % 5} common tok{i % 3}")
                for i in range(30)]
        d1 = _docs(spark, rows)
        d2 = _docs(spark, rows).repartition(7, "doc_id")
        o1 = sorted(map(tuple, posting_lists(d1).collect()))
        o2 = sorted(map(tuple, posting_lists(d2).collect()))
        assert o1 == o2


class TestBpeMerges:
    def test_weighted_pair_counting(self, spark):
        from arcane_framework_spark.operators.text import (
            bpe_merge_candidates,
        )

        # "ab" appears 3x as a word type occurrence and inside "abc".
        rows = [(1, "s", "ab ab abc"), (2, "s", "ab xy")]
        out = {r["pair"]: r
               for r in bpe_merge_candidates(_docs(spark, rows)).collect()}
        # weight(ab) = count('ab')=3 + count('abc')=1 = 4.
        assert out["ab"]["weight"] == 4
        assert out["ab"]["rank"] == 1
        assert out["bc"]["weight"] == 1
        assert out["xy"]["weight"] == 1

    def test_single_char_words_ignored(self, spark):
        from arcane_framework_spark.operators.text import (
            bpe_merge_candidates,
        )

        rows = [(1, "s", "a b c")]
        assert bpe_merge_candidates(_docs(spark, rows)).count() == 0


class TestCvFolds:
    def test_deterministic_and_partitioned(self, spark):
        from arcane_framework_spark.operators.sampling import cv_fold_stats

        rows = [(i, f"s{i % 3}", "w " * 5) for i in range(200)]
        d1 = _docs(spark, rows)
        d2 = _docs(spark, rows).repartition(7, "doc_id")
        o1 = sorted(map(tuple, cv_fold_stats(d1).collect()))
        o2 = sorted(map(tuple, cv_fold_stats(d2).collect()))
        assert o1 == o2
        assert sum(r[1] for r in o1) == 200
        assert len(o1) == 5
        # hash assignment is roughly balanced
        assert all(20 <= r[1] <= 60 for r in o1)


class TestSelfRetrieval:
    def test_distinctive_docs_retrieved_rank_one(self, spark):
        from arcane_framework_spark.operators.retrieval import (
            bm25_self_retrieval,
        )

        # Distinctive vocabulary per doc: every sampled query must
        # retrieve its source at rank 1 -> MRR = 1.
        rows = [(i * 25, "s", " ".join(f"only{i}tok{j}" for j in range(8)))
                for i in range(6)]
        out = bm25_self_retrieval(_docs(spark, rows)).collect()[0]
        assert out["n_queries"] == 6
        assert out["n_hits"] == 6
        assert out["mrr"] == 1.0

    def test_unmatchable_queries_score_zero(self, spark):
        from arcane_framework_spark.operators.retrieval import (
            bm25_self_retrieval,
        )

        # All docs identical: each query ties against every doc and the
        # tie-break is doc_id asc, so only the lowest-id sampled doc can
        # be rank-1 for itself; MRR reflects partial hits.
        rows = [(i * 25, "s", "same words for all docs here now")
                for i in range(4)]
        out = bm25_self_retrieval(_docs(spark, rows)).collect()[0]
        assert out["n_queries"] == 4
        assert 0 < out["n_hits"] <= 4

    def test_governed_query_budget_fixed_across_corpus_sizes(self, spark):
        """target_queries mode: the modulus is derived in-plan from the
        corpus count, so 4x the corpus still evaluates ~target queries —
        linear total cost, the quadratic-growth fix from the 10x stress."""
        import pytest as _pytest

        from arcane_framework_spark.operators.retrieval import (
            bm25_self_retrieval,
        )

        def corpus(n):
            return _docs(
                spark,
                [(i, "s", " ".join(f"tok{i}x{j}" for j in range(8)))
                 for i in range(n)],
            )

        for n in (40, 160):
            out = bm25_self_retrieval(
                corpus(n), sample_mod=None, target_queries=20
            ).collect()[0]
            # budget held: mod = n // 20, queries = ceil(n / mod) ~ 20
            assert 20 <= out["n_queries"] <= 27, (n, out)
        with _pytest.raises(ValueError):
            bm25_self_retrieval(corpus(10), sample_mod=5, target_queries=5)
        with _pytest.raises(ValueError):
            bm25_self_retrieval(corpus(10), sample_mod=None)


class TestIntervalUnion:
    def test_merges_overlaps_counts_segments(self, spark):
        from arcane_framework_spark.operators.temporal import interval_union

        rows = [
            # key "a": [0,10) ∪ [5,15) ∪ [20,25) -> covered 20, 2 segments
            ("a", 0, 10), ("a", 5, 15), ("a", 20, 25),
            # key "b": contained interval adds nothing
            ("b", 0, 100), ("b", 10, 20),
            # key "c": touching intervals merge ([0,5) + [5,9) = one segment)
            ("c", 0, 5), ("c", 5, 9),
        ]
        df = spark.createDataFrame(rows, "k string, s long, e long")
        out = {r["k"]: r for r in interval_union(df, "k", "s", "e").collect()}
        assert (out["a"]["covered"], out["a"]["n_segments"]) == (20, 2)
        assert (out["b"]["covered"], out["b"]["n_segments"]) == (100, 1)
        assert (out["c"]["covered"], out["c"]["n_segments"]) == (9, 1)
        assert out["a"]["n_intervals"] == 3
