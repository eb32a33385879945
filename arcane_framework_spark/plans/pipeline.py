"""Hosted-pipeline builder: ``StreamSpec`` → running job (SURVEY §3.1).

The reference's production path is: env JSON → ``IStreamContext`` → DI →
``IStreamGraphBuilder.BuildGraph`` → ``StreamRunnerService.RunStream`` →
exit code (src/Providers/Hosting/HostBuilderExtensions.cs:175-210). The Spark
equivalent implemented here:

    spec = plans.spec.from_env()              # STREAMCONTEXT__* env
    result = run_pipeline(spark, spec)        # build DataFrame, run, exit code
    sys.exit(result.exit_code)

``stream_kind`` selects a source builder from a registry (the plugin
``IStreamGraphBuilder`` analog); the column contracts (merge key, date
partitions) and the parquet commit protocol are applied uniformly. Backfill
specs run as a batch (or drain with ``Trigger.availableNow``); streaming
specs poll with ``Trigger.processingTime(changeCaptureInterval)``.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arcane_framework_spark.contracts.columns import (
    MERGE_KEY_ENCODING,
    with_merge_key,
)
from arcane_framework_spark.plans.spec import StreamSpec
from arcane_framework_spark.sinks.parquet_sink import ParquetStreamSink
from arcane_framework_spark.streaming.runner import RunResult, StreamRunner

#: stream_kind → source builder. Builders receive (spark, spec) and return a
#: batch or streaming DataFrame; registering a new kind is the extension
#: point (the reference's plugin graph builders, SURVEY §2.7).
SOURCE_BUILDERS: dict[str, Callable[[SparkSession, StreamSpec], DataFrame]] = {}


def register_source(kind: str):
    """Decorator: register a source builder for a ``stream_kind``."""

    def _register(fn: Callable[[SparkSession, StreamSpec], DataFrame]):
        SOURCE_BUILDERS[kind] = fn
        return fn

    return _register


@register_source("file")
def _file_source(spark: SparkSession, spec: StreamSpec) -> DataFrame:
    """Generic file source: options ``path``, ``format``, ``schema`` (DDL).

    Backfill mode reads a bounded batch; stream mode tails the directory for
    new files (the blob-listing/change-feed shape, S3/S5).
    """
    opts = spec.options
    fmt = opts.get("format", "json")
    path = opts["path"]
    schema = opts.get("schema")
    reader_opts = opts.get("reader_options", {})
    if spec.backfill:
        reader = spark.read.format(fmt).options(**reader_opts)
        if schema:
            reader = reader.schema(schema)
        return reader.load(path)
    reader = spark.readStream.format(fmt).options(**reader_opts)
    if schema:
        reader = reader.schema(schema)
    return reader.load(path)


@register_source("cdm-change-feed")
def _cdm_source(spark: SparkSession, spec: StreamSpec) -> DataFrame:
    """CDM change feed (S3): options ``root_path``, ``entity_name``."""
    from arcane_framework_spark.sources.cdm import CdmChangeFeedSource

    source = CdmChangeFeedSource(
        spark, spec.options["root_path"], spec.options["entity_name"]
    )
    return source.read(backfill=spec.backfill)


def apply_contracts(df: DataFrame, spec: StreamSpec) -> DataFrame:
    """Attach the §1.4 column contracts declared by the spec."""
    merge_keys = spec.options.get("merge_key_columns")
    if merge_keys:
        # Encoding is a single pipeline-level setting so the Spark-computed
        # key always matches the JDBC-pushdown key (sources/tsql.py); the
        # default (UTF-16LE) is reference parity.
        df = with_merge_key(
            df, merge_keys,
            encoding=spec.options.get("merge_key_encoding",
                                      MERGE_KEY_ENCODING),
        )
    for p in spec.partitions:
        if p.field_expression:
            df = df.withColumn(p.field_name, F.expr(p.field_expression))
    return df


def build_sink(spec: StreamSpec) -> ParquetStreamSink:
    sink_path = spec.options["sink_path"]
    partition_cols = [
        p.field_name for p in spec.partitions if p.field_expression
    ]
    return ParquetStreamSink(
        sink_path,
        partitions=spec.partitions,
        partition_by=partition_cols,
        row_groups_per_file=spec.row_groups_per_file,
    )


def run_pipeline(spark: SparkSession, spec: StreamSpec,
                 runner: StreamRunner | None = None,
                 checkpoint_dir: str | None = None) -> RunResult:
    """Build the pipeline a spec describes and run it to an exit code."""
    try:
        builder = SOURCE_BUILDERS[spec.stream_kind]
    except KeyError:
        raise ValueError(
            f"no source builder registered for stream kind "
            f"{spec.stream_kind!r}; known: {sorted(SOURCE_BUILDERS)}"
        ) from None
    runner = runner or StreamRunner()
    df = apply_contracts(builder(spark, spec), spec)
    sink = build_sink(spec)

    def on_finish(interrupted: bool) -> None:
        sink.interrupted = interrupted
        sink.finish()

    if not df.isStreaming:
        return runner.run_batch(lambda: sink.write_batch(df), on_finish=on_finish)
    checkpoint_dir = checkpoint_dir or os.path.join(
        spec.options["sink_path"], "_checkpoint"
    )
    return runner.run_stream(
        df,
        sink.foreach_batch(),
        checkpoint_dir=checkpoint_dir,
        backfill=spec.stop_after_backfill,
        trigger_interval=spec.change_capture_interval,
        on_finish=on_finish,
    )
