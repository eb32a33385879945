"""Parquet sink with the Arcane commit protocol (K1, SURVEY.md §2.3).

Reference semantics (src/Sinks/Parquet/ParquetSink.cs:29-374):

- data files under ``data/`` named ``part-{uuid}-{schemaHash}-chunk.parquet``
- an (empty) schema-advertisement parquet under ``schema/schema-{uuid}-{hash}.parquet``
  (plus a copy in ``data/`` when ``partition_overwrite`` consumers need it)
- partition metadata sidecar written first (``metadata/v0/partitions.json``)
- on successful completion a ``{schemaHash}.COMPLETED`` token — suppressed if
  the stream was interrupted
- optional per-day folder ``_batch_date=yyyy-MM-dd``

Spark mapping: executors write the data (distributed, any scale); the driver
performs the cheap protocol steps (schema file, sidecars, token, renames).
Delivery is at-least-once with unique file names per batch — identical to the
reference (T9), made effectively exactly-once by downstream MERGE on
``ARCANE_MERGE_KEY``.
"""

from __future__ import annotations

import os
import uuid
from datetime import datetime, timezone

from pyspark.sql import DataFrame

from arcane_framework_spark.contracts.schema import short_schema_hash
from arcane_framework_spark.plans.spec import PartitionSpec
from arcane_framework_spark.sinks.metadata import write_partitions_metadata


def _move_parts(tmp_dir: str, dest_dir: str, rename_fn) -> list[str]:
    """Move Spark part-files out of a staging dir with protocol names."""
    os.makedirs(dest_dir, exist_ok=True)
    moved = []
    for entry in sorted(os.listdir(tmp_dir)):
        src = os.path.join(tmp_dir, entry)
        if not entry.startswith("part-") or entry.endswith(".crc"):
            continue
        dest = os.path.join(dest_dir, rename_fn(entry))
        os.replace(src, dest)
        moved.append(dest)
    return moved


def _clear_dir(path: str) -> None:
    import shutil

    shutil.rmtree(path, ignore_errors=True)


class ParquetStreamSink:
    """Batch/stream parquet sink implementing the commit protocol.

    Use standalone for batch backfills (``write_batch`` + ``finish``) or as a
    ``foreachBatch`` target for Structured Streaming queries.
    """

    def __init__(self, base_path: str,
                 partitions: list[PartitionSpec] | None = None,
                 partition_by: list[str] | None = None,
                 row_groups_per_file: int = 1,
                 rows_per_group: int | None = None,
                 create_schema_file: bool = True,
                 partition_by_date: bool = False):
        if row_groups_per_file < 1:
            # Reference enforces > 0 (ParquetSink.cs:63-66).
            raise ValueError("row_groups_per_file must be a positive integer")
        self.base_path = base_path
        self.partitions = partitions or []
        self.partition_by = partition_by or []
        self.row_groups_per_file = row_groups_per_file
        self.rows_per_group = rows_per_group
        self.create_schema_file = create_schema_file
        self.partition_by_date = partition_by_date
        self.interrupted = False
        self._schema_hash: str | None = None
        self._metadata_written = False

    # -- protocol pieces ----------------------------------------------------

    @property
    def data_path(self) -> str:
        return os.path.join(self.base_path, "data")

    def _ensure_metadata(self) -> None:
        """Partition metadata is written before any data (ParquetSink.cs:180-186)."""
        if not self._metadata_written:
            write_partitions_metadata(self.base_path, self.partitions)
            self._metadata_written = True

    def _ensure_schema_file(self, df: DataFrame, schema_hash: str) -> None:
        if not self.create_schema_file or self._schema_hash == schema_hash:
            return
        tmp = os.path.join(self.base_path, f"_schema_tmp_{uuid.uuid4().hex}")
        # An empty parquet file advertising the schema, like the reference's
        # schema/schema-{uuid}-{hash}.parquet (ParquetSink.cs:217-232).
        df.limit(0).coalesce(1).write.mode("overwrite").parquet(tmp)
        name = f"schema-{uuid.uuid4()}-{schema_hash}.parquet"
        _move_parts(tmp, os.path.join(self.base_path, "schema"),
                    lambda entry: name)
        _clear_dir(tmp)
        self._schema_hash = schema_hash

    # -- write paths --------------------------------------------------------

    def write_batch(self, df: DataFrame, batch_id: int = 0) -> list[str]:
        """Write one micro-batch (or a whole backfill) under ``data/``.

        Executors write parquet into a staging dir (fully distributed); the
        driver renames the part files into the protocol naming scheme —
        renames are metadata-only operations on any real object store layout.
        """
        schema_hash = short_schema_hash(df.schema)
        self._ensure_metadata()
        self._ensure_schema_file(df, schema_hash)

        dest_dir = self.data_path
        if self.partition_by_date:
            # _batch_date=yyyy-MM-dd folder (ParquetSink.cs:199-205).
            today = datetime.now(timezone.utc).strftime("%Y-%m-%d")
            dest_dir = os.path.join(dest_dir, f"_batch_date={today}")

        tmp = os.path.join(self.base_path, f"_stage_tmp_{uuid.uuid4().hex}")
        writer = df.write.mode("overwrite")
        if self.rows_per_group:
            writer = writer.option(
                "maxRecordsPerFile",
                self.rows_per_group * self.row_groups_per_file,
            )
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(tmp)

        moved = _move_parts(
            tmp,
            dest_dir,
            lambda entry: f"part-{uuid.uuid4()}-{schema_hash}-chunk.parquet",
        )
        if self.partition_by:
            # Partitioned layout: Spark stages a Hive-style tree that is one
            # directory level per partition column (p1=a/p2=x/part-*.parquet).
            # Walk the whole tree and move every part file, preserving the
            # relative partition path — a single-level listdir silently skips
            # nested partition dirs when len(partition_by) > 1.
            for root, _dirs, files in sorted(os.walk(tmp)):
                rel = os.path.relpath(root, tmp)
                if rel == ".":
                    continue
                if any(seg.startswith(("_", ".")) for seg in rel.split(os.sep)):
                    continue
                if not any(f.startswith("part-") for f in files):
                    continue
                moved.extend(
                    _move_parts(
                        root,
                        os.path.join(dest_dir, rel),
                        lambda e: f"part-{uuid.uuid4()}-{schema_hash}-chunk.parquet",
                    )
                )
        # Guard against a silent drop: nothing named part-* may remain in the
        # staging tree once the move completes.
        leftover = [
            os.path.join(os.path.relpath(root, tmp), f)
            for root, _dirs, files in os.walk(tmp)
            for f in files
            if f.startswith("part-") and not f.endswith(".crc")
        ]
        if leftover:
            raise RuntimeError(
                f"parquet sink failed to move staged part files: {leftover[:5]}"
            )
        _clear_dir(tmp)
        return moved

    def foreach_batch(self):
        """Adapter for ``df.writeStream.foreachBatch(...)``."""

        def _write(df: DataFrame, batch_id: int) -> None:
            self.write_batch(df, batch_id)

        return _write

    def finish(self) -> str | None:
        """Drop the ``{schemaHash}.COMPLETED`` token unless interrupted.

        Reference: ParquetSink.cs:244-261 — the token signals a completed
        (backfill) stream; an interrupted stream must not signal completion.
        """
        if self.interrupted or self._schema_hash is None:
            return None
        token = os.path.join(self.base_path, f"{self._schema_hash}.COMPLETED")
        with open(token, "w", encoding="utf-8"):
            pass
        return token
