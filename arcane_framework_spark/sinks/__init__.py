"""Commit-protocol sinks (SURVEY.md §2.3)."""

from arcane_framework_spark.sinks.json_sink import JsonStreamSink  # noqa: F401
from arcane_framework_spark.sinks.metadata import write_partitions_metadata  # noqa: F401
from arcane_framework_spark.sinks.parquet_sink import ParquetStreamSink  # noqa: F401
