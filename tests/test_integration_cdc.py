"""End-to-end CDC integration: change-tracking source → commit-protocol
sink → downstream MERGE, across two ticks with a checkpointed watermark.

This is the reference's whole production story in one test
(SURVEY.md §3.2): backfill, then an incremental tick carrying an update,
an insert, and a delete; the consumer folds both into latest state by
merge key, and re-delivery is absorbed idempotently (T9).
"""

import os

from pyspark.sql import functions as F

from arcane_framework_spark.operators.relational import upsert_parquet_snapshot
from arcane_framework_spark.sinks.parquet_sink import ParquetStreamSink
from arcane_framework_spark.sources.jdbc_ct import (
    ChangeTrackingSource,
    VersionCheckpoint,
)


def test_cdc_two_ticks_to_merged_snapshot(spark, tmp_path):
    table_path = str(tmp_path / "source_table")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id: long, v: string"
    ).write.parquet(table_path)

    changes_path = str(tmp_path / "changes")
    spark.createDataFrame(
        [], "id long, sys_change_version long, sys_change_operation string"
    ).write.parquet(changes_path)

    source = ChangeTrackingSource(
        table_provider=lambda: spark.read.parquet(table_path),
        changes_provider=lambda: spark.read.parquet(changes_path),
        pk_columns=["id"],
        checkpoint=VersionCheckpoint(str(tmp_path / "ckpt" / "version.json")),
    )
    sink = ParquetStreamSink(str(tmp_path / "landing"))
    state_path = str(tmp_path / "state")

    def tick(backfill: bool) -> int:
        def write(batch):
            sink.write_batch(batch)
            upsert_parquet_snapshot(spark, state_path, batch)

        return source.run_once(write, backfill=backfill)

    # tick 1: backfill — all rows land as version-0 inserts
    assert tick(backfill=True) == 0
    state = spark.read.parquet(state_path)
    assert {r.id: r.v for r in state.collect()} == {1: "a", 2: "b", 3: "c"}
    assert "ARCANE_MERGE_KEY" in state.columns

    # source mutates: row 2 updated, row 3 deleted, row 4 inserted
    spark.createDataFrame(
        [(1, "a"), (2, "b2"), (4, "d")], "id: long, v: string"
    ).write.mode("overwrite").parquet(table_path)
    spark.createDataFrame(
        [(2, 10, "U"), (3, 11, "D"), (4, 12, "I")],
        "id: long, sys_change_version: long, sys_change_operation: string",
    ).write.mode("overwrite").parquet(changes_path)

    # tick 2: delta join back to the live table, delete-preserving
    assert tick(backfill=False) == 12
    assert source.checkpoint.read() == 12
    state = spark.read.parquet(state_path)
    assert {r.id: r.v for r in state.collect()} == {1: "a", 2: "b2", 4: "d"}

    # tick 3: re-delivery of the same changes is absorbed idempotently
    # (reset the watermark to simulate a crash after write, before advance)
    source.checkpoint.write(9)
    assert tick(backfill=False) == 12
    state = spark.read.parquet(state_path)
    assert {r.id: r.v for r in state.collect()} == {1: "a", 2: "b2", 4: "d"}

    # landing zone carries the commit protocol artifacts; with no declared
    # partitions, partitions.json is absent by design (K4: the reference's
    # PartitionsWriter removes it when no partitions are configured)
    landing = str(tmp_path / "landing")
    assert os.path.isdir(os.path.join(landing, "data"))
    assert os.path.isdir(os.path.join(landing, "schema"))
    assert not os.path.exists(
        os.path.join(landing, "metadata", "v0", "partitions.json")
    )


def test_cdc_partition_expression_flows_through(spark, tmp_path):
    table_path = str(tmp_path / "t")
    spark.createDataFrame([(1, "x")], "id: long, v: string").write.parquet(
        table_path
    )
    source = ChangeTrackingSource(
        table_provider=lambda: spark.read.parquet(table_path),
        changes_provider=lambda: spark.read.parquet(table_path).limit(0),
        pk_columns=["id"],
        checkpoint=VersionCheckpoint(str(tmp_path / "v.json")),
        partitioning_expression="date_format(current_date(), 'yyyyMM')",
    )
    row = source.full_load().head()
    assert row.DATE_PARTITION_KEY is not None
    assert len(row.DATE_PARTITION_KEY) == 6
    assert row.SYS_CHANGE_VERSION == 0 and row.SYS_CHANGE_OPERATION == "I"


def test_delta_merge_gating(spark, tmp_path):
    """The Delta MERGE consumer is import-gated: available() reports the
    truth and the upsert raises ImportError (not something weirder) when
    delta-spark is absent. When delta IS present, two CDC ticks folded via
    MERGE must equal the window-fold path."""
    from arcane_framework_spark.operators.relational import (
        apply_changes_to_snapshot,
        delta_merge_available,
        upsert_delta_snapshot,
    )

    base = spark.createDataFrame(
        [(1, "a", 0, "I"), (2, "b", 0, "I"), (3, "c", 0, "I")],
        "id long, v string, sys_change_version long, sys_change_operation string",
    )
    batch = spark.createDataFrame(
        [(2, "b2", 10, "U"), (3, None, 11, "D"), (4, "d", 12, "I")],
        "id long, v string, sys_change_version long, sys_change_operation string",
    )
    if not delta_merge_available():
        import pytest

        with pytest.raises(ImportError):
            upsert_delta_snapshot(spark, str(tmp_path / "tbl"), base, "id")
        return

    path = str(tmp_path / "tbl")
    upsert_delta_snapshot(spark, path, base, merge_key="id")
    merged = upsert_delta_snapshot(spark, path, batch, merge_key="id")
    expected = apply_changes_to_snapshot(base, batch, merge_key="id")
    assert {(r.id, r.v) for r in merged.collect()} == {
        (r.id, r.v) for r in expected.collect()
    }
    # replayed/out-of-order STALE delete (version 5 < the v10 update
    # already applied) must NOT remove the newer row — both matched
    # clauses carry the version guard, so the higher version wins.
    stale = spark.createDataFrame(
        [(2, None, 5, "D")],
        "id long, v string, sys_change_version long, sys_change_operation string",
    )
    replayed = upsert_delta_snapshot(spark, path, stale, merge_key="id")
    assert (2, "b2") in {(r.id, r.v) for r in replayed.collect()}


def test_apply_changes_batch_split_invariance(spark):
    """R11 fold law: folding one big change batch equals folding it as two
    version-ordered batches — the property that makes tick-by-tick CDC
    equal a full replay (delete→reinsert and update chains included)."""
    import random

    from arcane_framework_spark.operators.relational import (
        apply_changes_to_snapshot,
        latest_state,
    )

    rng = random.Random(7)
    rows = []
    version = 0
    for key in range(1, 30):
        alive = False
        for _ in range(rng.randint(1, 6)):
            version += 1
            if not alive:
                rows.append((key, f"v{version}", version, "I")); alive = True
            elif rng.random() < 0.3:
                rows.append((key, None, version, "D")); alive = False
            else:
                rows.append((key, f"v{version}", version, "U"))
    schema = ("id long, payload string, sys_change_version long, "
              "sys_change_operation string")
    all_changes = spark.createDataFrame(rows, schema)
    cut = version // 2
    b1 = all_changes.filter(F.col("sys_change_version") <= cut)
    b2 = all_changes.filter(F.col("sys_change_version") > cut)

    replay = latest_state(all_changes, merge_key="id").select("id", "payload")
    snap1 = apply_changes_to_snapshot(
        latest_state(b1, merge_key="id"), b2, merge_key="id"
    ).select("id", "payload")
    assert {tuple(r) for r in replay.collect()} == {
        tuple(r) for r in snap1.collect()
    }
