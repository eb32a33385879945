"""Streaming plan guards.

`tools/explain_audit.py` audits the 83 batch plans but SKIPs the
streaming-executed catalog entries (no batch physical plan to grep).
These tests close that gap at the operator level — the catalog's
streaming queries are thin wrappers over these operators, so a dropped
watermark or an accidentally-stateful rewrite fails here first:

- every watermarked operator's ANALYZED plan must carry its
  EventTimeWatermark node(s) — removing `withWatermark` silently
  converts bounded state into state that grows forever;
- the stateful-operator inventory per plan is pinned (exactly one
  dedup/session/aggregate node — a rewrite that doubles state surfaces
  as a count change);
- the stream-static incremental-dedup path is pinned STATELESS: its
  contract is that continuous ingest needs no watermark at all.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def rate_events(spark):
    """A synthetic unbounded stream with event-time, key, and value."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "1")
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % 5).cast("string").alias("event_type"),
            (F.col("value") % 100).cast("long").alias("user_id"),
            F.col("value").cast("double").alias("value"),
        )
    )


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def test_windowed_rollup_plan_has_watermark_and_single_agg(rate_events):
    from arcane_framework_spark.streaming.stateful import windowed_rollup

    plan = _analyzed(
        windowed_rollup(rate_events, window="1 hour", watermark="2 hours")
    )
    assert plan.count("EventTimeWatermark") == 1
    assert plan.count("Aggregate") == 1  # one stateful agg, not a re-agg
    assert "window" in plan


def test_dedup_stream_plan_has_watermark_and_dedup_node(rate_events):
    from arcane_framework_spark.streaming.stateful import dedup_stream

    plan = _analyzed(
        dedup_stream(rate_events, keys=["user_id", "event_type"],
                     watermark="1 hour")
    )
    assert plan.count("EventTimeWatermark") == 1
    # dropDuplicatesWithinWatermark analyzes to this dedicated node; a
    # plain dropDuplicates here would be UNBOUNDED state on a stream
    assert plan.count("DeduplicateWithinWatermark") == 1
    assert "Deduplicate [" not in plan


def test_sessionize_stream_plan_is_single_stateful_map(rate_events):
    from arcane_framework_spark.streaming.stateful import sessionize_stream

    plan = _analyzed(sessionize_stream(rate_events))
    assert plan.count("FlatMapGroupsInPandasWithState") == 1


def test_interval_join_plan_watermarks_both_sides_and_bounds_time(
        spark, rate_events):
    from arcane_framework_spark.streaming.stateful import interval_join_stream

    right = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "1")
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % 100).cast("long").alias("user_id"),
            F.col("value").cast("double").alias("amount"),
        )
    )
    joined = interval_join_stream(rate_events, right)
    plan = _analyzed(joined)
    # BOTH buffers need an eviction horizon: one watermark per side plus
    # a two-sided time-bound join condition, else state grows forever
    assert plan.count("EventTimeWatermark") == 2
    assert plan.count("Join Inner") == 1
    assert "r_ts" in plan and "l_ts" in plan


def test_stream_static_band_join_is_stateless(spark, tmp_path):
    """The streaming incremental-dedup shape: per-row signing + a
    stream-static join must introduce NO stateful operator and NO
    watermark requirement — that statelessness is the design."""
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "b c d e")], "doc_id: long, text: string"
    )
    path = str(tmp_path / "docs")
    docs.write.parquet(path)

    from arcane_framework_spark.operators.dedup import (
        minhash_band_rows,
        minhash_signatures,
    )

    static_bands = minhash_band_rows(minhash_signatures(docs))
    stream = spark.readStream.schema(docs.schema).parquet(path)
    # The catalog signs per-row (map-side); the guard targets the JOIN
    # shape, so a minimal map-side banding stands in here.
    streamed = stream.select(
        "doc_id", F.md5("text").alias("band_hash"), F.lit(0).alias("band_id")
    )
    joined = streamed.join(static_bands, ["band_id", "band_hash"])
    plan = _analyzed(joined)
    assert joined.isStreaming
    assert "EventTimeWatermark" not in plan
    for stateful in ("Deduplicate", "FlatMapGroupsWithState"):
        assert stateful not in plan, f"unexpected stateful op: {stateful}"
    # the STREAM side must stay map-side only (an Aggregate on the static
    # side is fine — it re-evaluates against static data, holding no
    # streaming state)
    assert "Aggregate" not in _analyzed(streamed)


def test_streaming_corpus_diff_classification_is_stateless(spark, tmp_path):
    """The streaming corpus-diff shape: the insert/update/unchanged
    classification is a stream-static LEFT join with no watermark and no
    stateful op — only the final count aggregation (complete mode) holds
    state. A watermark or dedup sneaking into the classify path would
    mean the stream buffers rows it never needs."""
    docs = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id: long, fp: string"
    )
    path = str(tmp_path / "v2")
    docs.write.parquet(path)
    static_v1 = docs.withColumnRenamed("fp", "__old_fp")
    stream = spark.readStream.schema(docs.schema).parquet(path)
    classified = stream.join(static_v1, "doc_id", "left").select(
        F.when(F.col("__old_fp").isNull(), "insert")
        .when(F.col("__old_fp") != F.col("fp"), "update")
        .otherwise("unchanged")
        .alias("change_type")
    )
    plan = _analyzed(classified)
    assert classified.isStreaming
    assert "EventTimeWatermark" not in plan
    for stateful in ("Deduplicate", "FlatMapGroupsWithState"):
        assert stateful not in plan, f"unexpected stateful op: {stateful}"
