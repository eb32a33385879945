"""JSONL sinks (K2/K3, SURVEY.md §2.3).

``JsonStreamSink`` mirrors MultilineJsonSink
(src/Sinks/Json/MultilineJsonSink.cs:28-305): one JSONL file per incoming
batch named ``part-{uuid}-{hash}.json``, schema advertised as an **empty
parquet file** under ``schema/``, completion token on finish.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame

from arcane_framework_spark.contracts.schema import short_schema_hash
from arcane_framework_spark.plans.spec import PartitionSpec
from arcane_framework_spark.sinks.metadata import write_partitions_metadata
from arcane_framework_spark.sinks.parquet_sink import _clear_dir, _move_parts


class JsonStreamSink:
    """One JSONL file per batch, with the schema/metadata/token protocol."""

    def __init__(self, base_path: str,
                 partitions: list[PartitionSpec] | None = None,
                 single_file_per_batch: bool = True):
        self.base_path = base_path
        self.partitions = partitions or []
        self.single_file_per_batch = single_file_per_batch
        self.interrupted = False
        self._schema_hash: str | None = None
        self._metadata_written = False

    @property
    def data_path(self) -> str:
        return os.path.join(self.base_path, "data")

    def _ensure_sidecars(self, df: DataFrame, schema_hash: str) -> None:
        if not self._metadata_written:
            write_partitions_metadata(self.base_path, self.partitions)
            self._metadata_written = True
        if self._schema_hash != schema_hash:
            tmp = os.path.join(self.base_path, f"_schema_tmp_{uuid.uuid4().hex}")
            df.limit(0).coalesce(1).write.mode("overwrite").parquet(tmp)
            name = f"schema-{uuid.uuid4()}-{schema_hash}.parquet"
            _move_parts(tmp, os.path.join(self.base_path, "schema"),
                        lambda entry: name)
            _clear_dir(tmp)
            self._schema_hash = schema_hash

    def write_batch(self, df: DataFrame, batch_id: int = 0) -> list[str]:
        schema_hash = short_schema_hash(df.schema)
        self._ensure_sidecars(df, schema_hash)
        tmp = os.path.join(self.base_path, f"_stage_tmp_{uuid.uuid4().hex}")
        out = df.coalesce(1) if self.single_file_per_batch else df
        out.write.mode("overwrite").json(tmp)
        moved = _move_parts(
            tmp,
            self.data_path,
            lambda entry: f"part-{uuid.uuid4()}-{schema_hash}.json",
        )
        _clear_dir(tmp)
        return moved

    def foreach_batch(self):
        def _write(df: DataFrame, batch_id: int) -> None:
            self.write_batch(df, batch_id)

        return _write

    def finish(self) -> str | None:
        if self.interrupted or self._schema_hash is None:
            return None
        token = os.path.join(self.base_path, f"{self._schema_hash}.COMPLETED")
        with open(token, "w", encoding="utf-8"):
            pass
        return token


class DynamicPathJsonSink:
    """K3: per-element dynamic output paths with a ``{timestamp, body}``
    envelope (reference src/Sinks/Json/JsonSink.cs:18-200, envelope
    :135-144).

    Input rows carry (``path``, ``timestamp``, ``body``); each distinct
    ``path`` value lands in its own directory under ``base_path`` as a
    ``part-{uuid}.json`` JSONL file of envelope objects. Implemented with a
    partitioned executor write (one shuffle-free pass; the path column is a
    Hive partition) and driver-side renames into the protocol layout.
    """

    def __init__(self, base_path: str,
                 path_col: str = "path",
                 timestamp_col: str = "timestamp",
                 body_col: str = "body"):
        self.base_path = base_path
        self.path_col = path_col
        self.timestamp_col = timestamp_col
        self.body_col = body_col

    def write_batch(self, df: DataFrame, batch_id: int = 0) -> list[str]:
        from pyspark.sql import functions as F

        enveloped = df.select(
            F.col(self.path_col).alias("__path"),
            F.to_json(
                F.struct(
                    F.col(self.timestamp_col).alias("timestamp"),
                    F.col(self.body_col).alias("body"),
                )
            ).alias("value"),
        )
        tmp = os.path.join(self.base_path, f"_stage_tmp_{uuid.uuid4().hex}")
        enveloped.write.mode("overwrite").partitionBy("__path").text(tmp)
        moved: list[str] = []
        for entry in sorted(os.listdir(tmp)):
            if not entry.startswith("__path="):
                continue
            suffix = entry.split("=", 1)[1]
            moved.extend(
                _move_parts(
                    os.path.join(tmp, entry),
                    os.path.join(self.base_path, suffix),
                    lambda e: f"part-{uuid.uuid4()}.json",
                )
            )
        _clear_dir(tmp)
        return moved

    def foreach_batch(self):
        def _write(df: DataFrame, batch_id: int) -> None:
            self.write_batch(df, batch_id)

        return _write
