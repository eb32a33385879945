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
        footer = "subscribe to our newsletter for more updates every day"  # 9 tokens -> 2 segs? no: width 8 -> seg0 = 8 tokens
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
