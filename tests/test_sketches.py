"""Unit/property tests for operators/sketches.py (HLL, Count-Min, Bloom).

The module's contract is ENGINE-REPRODUCIBLE state: md5-hashed buckets,
integer registers, dyadic-rational estimate arithmetic. These tests pin
that contract three ways: (1) the register tables match an independent
pure-Python (hashlib) recomputation bit-for-bit, (2) sketches merge
associatively (union+reaggregate == sketch of the union), and (3) the
estimates obey the published accuracy/one-sided-error bounds.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from arcane_framework_spark.operators.sketches import (
    CMS_D,
    CMS_W,
    HLL_B,
    HLL_M,
    HLL_RANK_BITS,
    cms_counts,
    cms_estimate,
    cms_heavy_hitters,
    hll_distinct,
    hll_estimate,
    hll_registers,
)


def _py_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_hll_registers(values: list[str]) -> dict[int, int]:
    regs: dict[int, int] = {}
    for v in values:
        h = _py_hash60(v)
        bucket = h % HLL_M
        rest = h >> HLL_B
        rank = (HLL_RANK_BITS + 1) - rest.bit_length() if rest else (
            HLL_RANK_BITS + 1
        )
        regs[bucket] = max(regs.get(bucket, 0), rank)
    return regs


def _py_cms_counts(values: list[str]) -> dict[tuple[int, int], int]:
    counts: dict[tuple[int, int], int] = {}
    for v in values:
        for row in range(CMS_D):
            bucket = _py_hash60(f"{row}|{v}") % CMS_W
            counts[(row, bucket)] = counts.get((row, bucket), 0) + 1
    return counts


@pytest.fixture(scope="module")
def values():
    # Duplicates on purpose: v0..v299, each repeated (i % 7) + 1 times.
    out = []
    for i in range(300):
        out.extend([f"v{i}"] * ((i % 7) + 1))
    return out


def test_hll_registers_match_pure_python(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = {
        (r["bucket"], r["rank"])
        for r in hll_registers(df, "v").collect()
    }
    want = set(_py_hll_registers(values).items())
    assert got == want


def test_hll_merge_associativity(spark, values):
    """union(regA, regB) + max-reagg == registers(A union B), and the
    estimates (incl. checksum) are identical — the mergeable-state
    contract that makes the register table a valid incremental side
    table."""
    a, b = values[: len(values) // 2], values[len(values) // 2:]
    df_a = spark.createDataFrame([(v,) for v in a], "v string")
    df_b = spark.createDataFrame([(v,) for v in b], "v string")
    df_all = spark.createDataFrame([(v,) for v in values], "v string")

    merged = (
        hll_registers(df_a, "v").union(hll_registers(df_b, "v"))
        .groupBy("bucket").agg(F.max("rank").alias("rank"))
    )
    whole = hll_registers(df_all, "v")
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in whole.collect()
    }
    assert hll_estimate(merged).collect() == hll_estimate(whole).collect()


def test_hll_estimate_accuracy_large_n(spark):
    """n >> m: the raw FFGM07 estimate applies (no small-range
    correction needed); rsd for m=1024 is ~3.25%, assert within 10%."""
    n = 20_000
    df = spark.createDataFrame([(f"item-{i}",) for i in range(n)],
                               "v string")
    row = hll_distinct(df, "v").collect()[0]
    assert abs(row["hll_estimate"] - n) / n < 0.10
    # duplicates never change the sketch
    row2 = hll_distinct(df.union(df), "v").collect()[0]
    assert row2["hll_estimate"] == row["hll_estimate"]
    assert row2["register_checksum"] == row["register_checksum"]


def test_hll_grouped_registers_independent(spark):
    """Grouped sketches are per-group: each group's register table
    equals the ungrouped sketch of that group's values alone."""
    df = spark.createDataFrame(
        [("g1", f"x{i}") for i in range(50)]
        + [("g2", f"x{i}") for i in range(20, 120)],
        "g string, v string",
    )
    grouped = hll_registers(df, "v", ["g"]).collect()
    for g, n in (("g1", 50), ("g2", 100)):
        got = {(r["bucket"], r["rank"]) for r in grouped if r["g"] == g}
        vals = [f"x{i}" for i in range(50)] if g == "g1" else [
            f"x{i}" for i in range(20, 120)
        ]
        assert got == set(_py_hll_registers(vals).items()), g
        del n


def test_cms_counts_match_pure_python(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_counts(df, "v").collect()
    }
    assert got == _py_cms_counts(values)


def test_cms_merge_is_elementwise_add(spark, values):
    a, b = values[: len(values) // 3], values[len(values) // 3:]
    df_a = spark.createDataFrame([(v,) for v in a], "v string")
    df_b = spark.createDataFrame([(v,) for v in b], "v string")
    df_all = spark.createDataFrame([(v,) for v in values], "v string")
    merged = (
        cms_counts(df_a, "v").union(cms_counts(df_b, "v"))
        .groupBy("row", "bucket").agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in cms_counts(df_all, "v").collect()
    }


def test_cms_estimate_one_sided_error(spark, values):
    """CMS never underestimates: estimate(v) >= true count(v) for every
    value, with equality when no row collides."""
    df = spark.createDataFrame([(v,) for v in values], "v string")
    est = {
        r["value"]: r["cms_count"]
        for r in cms_estimate(df, cms_counts(df, "v"), "v").collect()
    }
    truth: dict[str, int] = {}
    for v in values:
        truth[v] = truth.get(v, 0) + 1
    assert set(est) == set(truth)
    assert all(est[v] >= truth[v] for v in truth)


def test_cms_heavy_hitters_top_k_contains_true_heavy(spark):
    """A value holding 30% of the mass must surface in the top-k (CMS
    one-sided error can only promote it)."""
    vals = ["heavy"] * 300 + [f"tail{i}" for i in range(700)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    top = cms_heavy_hitters(df, "v", top_k=5).collect()
    assert top[0]["value"] == "heavy"
    assert top[0]["cms_count"] >= 300


def _py_bloom_words(values: list[str]) -> dict[int, int]:
    from arcane_framework_spark.operators.sketches import BLOOM_K, BLOOM_M

    words: dict[int, int] = {}
    for v in values:
        for j in range(BLOOM_K):
            bit = _py_hash60(f"bloom{j}|{v}") % BLOOM_M
            words[bit >> 5] = words.get(bit >> 5, 0) | (1 << (bit % 32))
    return words


def test_bloom_bitmap_matches_pure_python(spark):
    from arcane_framework_spark.operators.sketches import bloom_build

    vals = [f"key-{i}" for i in range(120)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {r["word_idx"]: r["word"] for r in bloom_build(df, "v").collect()}
    assert got == _py_bloom_words(vals)


def test_bloom_no_false_negatives_and_bounded_fpr(spark):
    from arcane_framework_spark.operators.sketches import (
        bloom_build, bloom_probe,
    )

    members = [f"m{i}" for i in range(200)]
    others = [f"x{i}" for i in range(2000)]
    bloom = bloom_build(
        spark.createDataFrame([(v,) for v in members], "v string"), "v"
    )
    probed = bloom_probe(
        spark.createDataFrame([(v,) for v in members + others], "v string"),
        bloom, "v",
    ).collect()
    res = {r["v"]: r["bloom_passed"] for r in probed}
    assert all(res[v] for v in members), "Bloom must never drop a member"
    fpr = sum(res[v] for v in others) / len(others)
    # m=4096, k=4, n=200 -> theoretical FPR ~0.12%; assert a loose 2%
    assert fpr < 0.02, fpr


def test_bloom_merge_is_bit_or(spark):
    from pyspark.sql import functions as F

    from arcane_framework_spark.operators.sketches import bloom_build

    a = [f"a{i}" for i in range(80)]
    b = [f"b{i}" for i in range(80)]
    df_a = spark.createDataFrame([(v,) for v in a], "v string")
    df_b = spark.createDataFrame([(v,) for v in b], "v string")
    df_all = spark.createDataFrame([(v,) for v in a + b], "v string")
    merged = (
        bloom_build(df_a, "v").union(bloom_build(df_b, "v"))
        .groupBy("word_idx").agg(F.bit_or("word").alias("word"))
    )
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in bloom_build(df_all, "v").collect()
    }


def test_bloom_probe_plan_has_no_probe_side_shuffle(spark):
    """Pruning must not cost what it saves: every non-broadcast Exchange
    in the probe plan belongs to the (tiny) word-table BUILD aggregation
    — i.e. partitions on word_idx — and the probe stream itself is never
    shuffled. The word table is persisted, so the k broadcast joins
    reuse one materialization."""
    import re

    from arcane_framework_spark.operators.cache import cache_scope
    from arcane_framework_spark.operators.sketches import (
        bloom_build, bloom_probe,
    )

    build = spark.createDataFrame([(f"m{i}",) for i in range(50)],
                                  "v string")
    probe = spark.range(0, 10_000).selectExpr("CAST(id AS STRING) AS v")
    with cache_scope():
        df = bloom_probe(probe, bloom_build(build, "v"), "v")
        plan = df._jdf.queryExecution().executedPlan().toString()
        non_broadcast = [
            ln for ln in plan.splitlines()
            if re.search(r"\bExchange\b", ln) and "Broadcast" not in ln
        ]
        assert all("word_idx" in ln for ln in non_broadcast), non_broadcast
        # persisted word table: each scan site prints the cached plan
        # inline, so dedupe by plan_id — ONE distinct build aggregation
        # exchange executes, not one per join
        distinct_ids = {
            m.group(1)
            for ln in non_broadcast
            for m in [re.search(r"plan_id=(\d+)", ln)]
            if m
        }
        assert len(distinct_ids) <= 1, non_broadcast
        assert "InMemory" in plan or "TableCacheQueryStage" in plan


def test_cms_weighted_counts_match_pure_python(spark):
    """weight_col: the counters accumulate weights, not row counts —
    replicated against a pure-python recomputation."""
    rows = [(f"v{i % 5}", i % 3 + 1) for i in range(60)]
    df = spark.createDataFrame(rows, "v string, w long")
    got = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_counts(df, "v", weight_col="w").collect()
    }
    want: dict[tuple[int, int], int] = {}
    for v, w in rows:
        for row in range(CMS_D):
            b = _py_hash60(f"{row}|{v}") % CMS_W
            want[(row, b)] = want.get((row, b), 0) + w
    assert got == want


def test_bottomk_sample_merge_and_quantiles(spark):
    """Bottom-k merge law (bottom-k of a union == bottom-k of the union
    of bottom-ks) and the quantile estimate's accuracy on a known
    distribution."""
    rows = [(i, float((i * 37) % 1000)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, v double")
    from arcane_framework_spark.operators.sketches import (
        BOTTOMK_K, bottomk_quantiles, bottomk_sample,
    )

    a = df.filter(F.col("id") % 2 == 0)
    b = df.filter(F.col("id") % 2 == 1)
    merged = (
        bottomk_sample(a, "v", "id").union(bottomk_sample(b, "v", "id"))
    )
    # re-take the bottom-k of the union of bottom-ks
    from pyspark.sql import Window

    w = Window.orderBy("__rk")
    remerged = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= BOTTOMK_K)
        .select("value", "__rk")
    )
    whole = bottomk_sample(df, "v", "id").select("value", "__rk")
    assert {tuple(r) for r in remerged.collect()} == {
        tuple(r) for r in whole.collect()
    }

    est = bottomk_quantiles(bottomk_sample(df, "v", "id"), [0.5]).collect()
    # values are ~uniform on [0, 1000): the 64-sample median lands well
    # inside the central half
    assert 250 <= est[0]["q50"] <= 750, est


def test_kmv_intersection_estimates_and_merge(spark):
    """KMV set algebra: with sets SMALLER than k the sketch is exact
    (theta = H, estimate == exact intersection); with sets larger than
    k the estimate lands within the published KMV error band; sketches
    merge by union + re-bottom-k."""
    from arcane_framework_spark.operators.sketches import (
        KMV_H, KMV_K, kmv_intersection, kmv_sketch,
    )

    # small sets: exact
    rows = (
        [("a", f"u{i}") for i in range(30)]
        + [("b", f"u{i}") for i in range(20, 50)]
    )
    df = spark.createDataFrame(rows, "g string, v string")
    out = kmv_intersection(kmv_sketch(df, "v", ["g"]), "g").collect()
    assert len(out) == 1
    r = out[0]
    assert r["theta"] == KMV_H
    assert r["n_common"] == 10
    assert r["est_intersection"] == 10.0

    # large sets: estimate within a loose band of the true 500 overlap
    rows = (
        [("a", f"x{i}") for i in range(1500)]
        + [("b", f"x{i}") for i in range(1000, 2500)]
    )
    df = spark.createDataFrame(rows, "g string, v string")
    r = kmv_intersection(kmv_sketch(df, "v", ["g"]), "g").collect()[0]
    assert r["theta"] < KMV_H  # sketches are full
    assert 100 <= r["est_intersection"] <= 1500, r

    # merge law: bottom-k of union == re-bottom-k of union of bottom-ks
    from pyspark.sql import Window

    half1 = df.filter(F.length("v") % 2 == 0)
    half2 = df.filter(F.length("v") % 2 == 1)
    merged = kmv_sketch(half1, "v", ["g"]).union(
        kmv_sketch(half2, "v", ["g"])
    )
    w = Window.partitionBy("g").orderBy("h")
    remerged = (
        merged.distinct().withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K).drop("rn")
    )
    whole = kmv_sketch(df, "v", ["g"])
    assert {tuple(r) for r in remerged.collect()} == {
        tuple(r) for r in whole.collect()
    }


def test_cms_stream_state_equals_batch_counters(spark, tmp_path):
    """Replay a small parquet through cms_stream; final state must equal
    the batch cms_counts table counter-for-counter."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from arcane_framework_spark.operators.sketches import cms_counts
    from arcane_framework_spark.streaming.stateful import cms_stream

    src = tmp_path / "stream_src"
    items = spark.createDataFrame(
        [(str(i % 17),) for i in range(300)], ["uid"]
    )
    items.repartition(3).write.parquet(str(src))

    stream = spark.readStream.schema("uid string").parquet(str(src))
    q = (
        cms_stream(stream)
        .writeStream.format("memory")
        .queryName("cms_state_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sink = spark.table("cms_state_test")
    w = Window.partitionBy("row")
    got = {
        (r.row, r.bucket): r.cnt
        for r in sink.withColumn("__m", F.max("ver").over(w))
        .filter(F.col("ver") == F.col("__m"))
        .collect()
    }
    want = {
        (r.row, r.bucket): r.cnt for r in cms_counts(items, "uid").collect()
    }
    assert got == want
