"""Physical-plan shape guards for headline queries.

The scale story rests on plan properties (filters pushed to the parquet
scan, dims broadcast, no accidental cartesians, codegen in the hot path).
tools/explain_audit.py sweeps the whole catalog; these tests pin the
specific load-bearing shapes so a regression fails CI, not a benchmark.
"""

import os

import pytest

from tests.conftest import SF_DIR

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _plan(spark, name):
    from arcane_framework_spark.queries import QUERIES

    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_q1_filter_pushdown_and_pruning(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [" in plan and "l_shipdate" in plan
    # projection pruned to the 7 needed columns — comment/key column names
    # appear in ReadSchema, absent ones prove pruning
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "l_comment" not in read_schema[0]
    # (codegen markers only appear in the FINAL adaptive plan post-action;
    # the exchange-free merge_key test below pins the codegen property.)


def test_q5_broadcasts_dims_no_cartesian(spark):
    plan = _plan(spark, "q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 3  # region/nation/customer+
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_pairs_no_cartesian_single_band_shuffle(spark):
    plan = _plan(spark, "minhash_pairs_documents")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_merge_key_stays_in_codegen(spark):
    plan = _plan(spark, "merge_key_lineitem")
    assert "codegen id" in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python UDF
    assert "Exchange" not in plan  # pure map-side projection, zero shuffles


def test_source_capped_uses_window_group_limit(spark):
    plan = _plan(spark, "source_capped_documents")
    assert "WindowGroupLimit" in plan  # partial top-k before the exchange


def test_audio_features_pure_map(spark):
    # Synthesis + decode + features is one Arrow-batched map pipeline:
    # no shuffle anywhere, and Python execution is Arrow (mapInPandas),
    # never row-at-a-time.
    plan = _plan(spark, "audio_features_documents")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_vocab_coverage_broadcast_probe(spark):
    # The corpus token stream must probe the vocabulary via broadcast —
    # a shuffled join here would re-shuffle the whole token stream.
    plan = _plan(spark, "vocab_coverage_documents")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_winnow_pairs_no_cartesian(spark):
    plan = _plan(spark, "winnow_pairs_documents")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_boilerplate_scan_pruned_to_two_columns(spark):
    # Segment accounting needs doc_id + text only; lang/source/n_chars
    # must not reach the parquet scan.
    plan = _plan(spark, "boilerplate_segments_documents")
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema
    assert all("n_chars" not in ln and "lang" not in ln
               for ln in read_schema)


def test_bigram_lift_takeordered_no_global_sort(spark):
    # The top-k cut must plan as TakeOrderedAndProject, not a full Sort
    # of the scored pair table.
    plan = _plan(spark, "bigram_lift_documents")
    assert "TakeOrderedAndProject" in plan


def test_posting_lists_map_side_group_limit(spark):
    # The per-token doc cap must trim map-side (partial WindowGroupLimit)
    # so hot tokens don't funnel all postings through one window task.
    plan = _plan(spark, "posting_lists_documents")
    assert "WindowGroupLimit" in plan


def test_cube_rollup_locale_free_dow(spark):
    # The day-of-week label must come from dayofweek() + a literal map,
    # never date_format(ts, 'E'): date_format renders in the JVM default
    # locale and silently diverges from the C-locale oracle on clusters
    # running a non-English locale.
    plan = _plan(spark, "events_cube_rollup")
    assert "date_format" not in plan, "locale-sensitive dow expression"
    assert "dayofweek" in plan


def test_incremental_disk_twin_bucketed_scan_no_corpus_exchange(spark):
    # The materialized-side-table story: the corpus band table is read
    # bucket-aligned on the (band_id, band_hash) join key, so the corpus
    # side of the band join carries NO Exchange — only the arriving
    # batch shuffles. "Bucketed: true" appears only when the join
    # actually consumed the bucketing (autoBucketedScan disables it
    # otherwise), and the storage path must plan strictly fewer
    # exchanges than the in-memory path it twins.
    disk = _plan(spark, "incremental_dedup_disk_documents")
    assert "incr_dedup_band_side" in disk
    assert "Bucketed: true" in disk
    mem = _plan(spark, "incremental_dedup_documents")
    assert disk.count("Exchange") < mem.count("Exchange"), (
        disk.count("Exchange"), mem.count("Exchange"))


def test_bucketed_big_big_join_exchange_free(spark):
    # The recurring-fact-join story: both sides written bucketed on the
    # join key, so the SortMergeJoin consumes the bucketing and neither
    # scan shuffles — the ONLY Exchange left in the plan is the final
    # 5-group aggregate, never the orders x lineitem join. At test scale
    # Catalyst (rightly) broadcasts the tiny orders side, which is the
    # correct SMALL plan but not the property under test — disable
    # broadcast to see the 100 TB big-big shape.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, "bucketed_join_orders")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert plan.count("Bucketed: true") == 2, plan.count("Bucketed: true")
    assert "SortMergeJoin" in plan
    # formatted mode prints each node once in the tree and once in the
    # details — count the "(N) Exchange" detail headers.
    import re

    exchanges = re.findall(r"\(\d+\) Exchange", plan)
    assert len(exchanges) == 1, exchanges
