"""Streaming lifecycle tests: exit codes, backfill duality, end-to-end stream.

Mirrors the reference's host lifecycle tests (SURVEY.md §5 category 6:
test/Providers/Hosting/HostBuilderExtensionsTests.cs:22-128).
"""

import json
import os

from pyspark.sql import types as T

from arcane_framework_spark.contracts.schema import (
    SchemaInconsistentError,
    SchemaMismatchError,
)
from arcane_framework_spark.sinks.parquet_sink import ParquetStreamSink
from arcane_framework_spark.streaming.runner import (
    EXIT_FATAL,
    EXIT_RESTART,
    EXIT_SUCCESS,
    SCHEMA_MISMATCH_ANNOTATION,
    STATE_ANNOTATION_KEY,
    StreamRunner,
    classify_exception,
)

_S = T.StructType([T.StructField("x", T.IntegerType())])
_S2 = T.StructType([T.StructField("x", T.LongType())])


def test_exit_code_mapping():
    # SchemaMismatch -> SUCCESS + annotation (ArcaneExceptionHandler.cs:41-47)
    code, ann = classify_exception(SchemaMismatchError(_S, _S2))
    assert code == EXIT_SUCCESS
    assert ann == {STATE_ANNOTATION_KEY: SCHEMA_MISMATCH_ANNOTATION}
    # SchemaInconsistent -> RESTART
    code, ann = classify_exception(SchemaInconsistentError(2, 3))
    assert code == EXIT_RESTART and ann == {}
    # unknown -> FATAL
    code, ann = classify_exception(RuntimeError("boom"))
    assert code == EXIT_FATAL and ann == {}


def test_run_batch_success_and_failure_codes():
    runner = StreamRunner()
    assert runner.run_batch(lambda: None).exit_code == EXIT_SUCCESS

    annotations = {}
    runner = StreamRunner(annotate=annotations.update)

    def raise_mismatch():
        raise SchemaMismatchError(_S, _S2)

    result = runner.run_batch(raise_mismatch)
    assert result.exit_code == EXIT_SUCCESS
    assert annotations == {STATE_ANNOTATION_KEY: SCHEMA_MISMATCH_ANNOTATION}

    def raise_fatal():
        raise RuntimeError("boom")

    assert StreamRunner().run_batch(raise_fatal).exit_code == EXIT_FATAL


def test_run_batch_interrupted_backfill_restarts():
    runner = StreamRunner()

    def job():
        runner.request_stop()  # SIGTERM mid-backfill

    result = runner.run_batch(job)
    # interrupted backfill -> RESTART (HostBuilderExtensions.cs:187-191)
    assert result.exit_code == EXIT_RESTART and result.interrupted


def test_stream_end_to_end_backfill_drain(spark, tmp_path):
    """File stream -> foreachBatch parquet sink -> availableNow drain -> token."""
    src_dir = tmp_path / "incoming"
    src_dir.mkdir()
    for i in range(3):
        (src_dir / f"f{i}.json").write_text(
            "\n".join(json.dumps({"id": i * 10 + j, "v": f"r{j}"}) for j in range(4))
        )
    stream = (
        spark.readStream.schema("id INT, v STRING").json(str(src_dir))
    )
    base = str(tmp_path / "out")
    sink = ParquetStreamSink(base)
    runner = StreamRunner()
    result = runner.run_stream(
        stream,
        sink.foreach_batch(),
        checkpoint_dir=str(tmp_path / "ckpt"),
        backfill=True,
        on_finish=lambda interrupted: (
            setattr(sink, "interrupted", interrupted),
            sink.finish(),
        ),
    )
    assert result.exit_code == EXIT_SUCCESS and not result.interrupted
    back = spark.read.parquet(os.path.join(base, "data"))
    assert back.count() == 12
    assert [f for f in os.listdir(base) if f.endswith(".COMPLETED")]


def test_stream_drift_mid_stream_maps_to_exit_code(spark, tmp_path):
    """A foreachBatch body raising SchemaInconsistentError -> RESTART."""
    src_dir = tmp_path / "incoming"
    src_dir.mkdir()
    (src_dir / "f.json").write_text(json.dumps({"id": 1}))
    stream = spark.readStream.schema("id INT").json(str(src_dir))

    def bad_batch(df, batch_id):
        raise SchemaInconsistentError(1, 2)

    result = StreamRunner().run_stream(
        stream,
        bad_batch,
        checkpoint_dir=str(tmp_path / "ckpt"),
        backfill=True,
    )
    assert result.exit_code == EXIT_RESTART
