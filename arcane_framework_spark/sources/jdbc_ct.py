"""SQL-Server-style change-tracking source (S1/S2, SURVEY.md §2.1).

Reference: src/Sources/SqlServer/SqlServerChangeTrackingSource.cs:31-521.
The reference generates T-SQL (CHANGETABLE joins) executed by SQL Server;
here the same *semantics* are expressed over any Spark-readable
change-feed relation, with the version watermark checkpointed by the engine:

- full load (backfill): whole-table read + synthesized ``SYS_CHANGE_VERSION=0``
  / ``SYS_CHANGE_OPERATION='I'`` + merge key (GetSelectAllQuery.sql:1-7)
- incremental tick: changes with ``version > last_version`` joined back to
  the current table state, delete-preserving (GetSelectDeltaQuery.sql:7-8)
- watermark: max version seen per batch → next tick's lower bound
  (SqlServerChangeTrackingSource.cs:271-287,455-459)

The table/changes relations are provided by a ``TableProvider`` so the same
driver loop runs against JDBC (``spark.read.jdbc`` with pushdown — the join
collapses into the source query exactly like the reference), parquet/Delta
CDF, or test fixtures.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arcane_framework_spark.contracts.columns import (
    SYS_CHANGE_OPERATION,
    SYS_CHANGE_VERSION,
    with_change_defaults,
    with_merge_key,
)
from arcane_framework_spark.operators.relational import changes_since, delta_join


@dataclass
class VersionCheckpoint:
    """Durable last-processed-version offset (T2).

    File-backed like a Structured Streaming checkpoint; swap the path for an
    object-store URI in production.
    """

    path: str

    def read(self) -> int:
        if os.path.exists(self.path):
            with open(self.path, encoding="utf-8") as fh:
                return int(json.load(fh)["version"])
        return -1

    def write(self, version: int) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump({"version": version}, fh)
        os.replace(tmp, self.path)


class ChangeTrackingSource:
    """Driver-managed incremental CDC loop with checkpointed version offsets.

    ``table_provider()`` → current table snapshot DataFrame;
    ``changes_provider()`` → change rows carrying the PKs, a version column,
    and an operation column ('I'/'U'/'D').
    """

    def __init__(self,
                 table_provider: Callable[[], DataFrame],
                 changes_provider: Callable[[], DataFrame],
                 pk_columns: list[str],
                 checkpoint: VersionCheckpoint,
                 version_column: str = SYS_CHANGE_VERSION,
                 op_column: str = SYS_CHANGE_OPERATION,
                 partitioning_expression: str | None = None,
                 version_query_executor:
                 Callable[[str], int | None] | None = None,
                 lookback_seconds: int = 86400):
        self.table_provider = table_provider
        self.changes_provider = changes_provider
        self.pk_columns = pk_columns
        self.checkpoint = checkpoint
        self.version_column = version_column
        self.op_column = op_column
        self.partitioning_expression = partitioning_expression
        # Optional server-side watermark discovery: a callable that runs
        # the generated T-SQL against the source and returns the scalar
        # (or None for DBNull). Lookback default 86400 s mirrors the
        # reference ctor default (SqlServerChangeTrackingSource.cs:128).
        self.version_query_executor = version_query_executor
        self.lookback_seconds = lookback_seconds

    def _finalize(self, df: DataFrame) -> DataFrame:
        from arcane_framework_spark.plans.spec import validate_source_columns

        validate_source_columns(df.columns)
        df = with_merge_key(df, self.pk_columns)
        if self.partitioning_expression:
            from arcane_framework_spark.contracts.columns import with_date_partition

            df = with_date_partition(df, self.partitioning_expression)
        return df

    def full_load(self) -> DataFrame:
        """Backfill: whole table with synthesized version 0 / op 'I'."""
        return self._finalize(with_change_defaults(self.table_provider()))

    def resolve_start_version(self) -> int:
        """Lower bound for this tick's ``version > bound`` change scan.

        Without a ``version_query_executor`` this is the checkpointed
        version (file-watermark mode). With one, it mirrors the
        reference's per-tick watermark discovery
        (SqlServerChangeTrackingSource.cs:271-287,389-408): run
        ``min_commit_version_query`` (lookback-bounded on cold start),
        take MIN(commit_ts) as the next version to fetch, and scan
        CHANGETABLE from ``newVersion - 1`` so that exact version is
        included (cs:408 passes ``newVersion - 1``). A None scalar means
        no commits to fetch — return ``2**63 - 2`` so the tick reads
        nothing (cs:408 ``GetValueOrDefault(long.MaxValue) - 1``).
        """
        last = self.checkpoint.read()
        if self.version_query_executor is None:
            return last
        from arcane_framework_spark.sources.tsql import (
            min_commit_version_query,
        )

        query = min_commit_version_query(last, self.lookback_seconds)
        new_version = self.version_query_executor(query)
        if new_version is None:
            return 2**63 - 2
        return new_version - 1

    def delta(self) -> DataFrame:
        """One incremental tick: changes after the resolved start version,
        joined delete-preserving to the current table state."""
        last = self.resolve_start_version()
        changes = changes_since(
            self.changes_provider(), self.version_column, last
        )
        joined = delta_join(
            changes,
            self.table_provider(),
            self.pk_columns,
            op_column=self.op_column,
            broadcast_changes=True,
        )
        return self._finalize(joined)

    def advance(self, batch: DataFrame) -> int:
        """Commit the watermark from a drained batch; returns new version.

        Call *after* the batch is durably written (at-least-once pairing:
        if the write succeeded but advance didn't, the next tick re-emits
        rows that downstream MERGE on the merge key absorbs — the same
        idempotence story as the reference, T9).
        """
        row = batch.agg(F.max(self.version_column).alias("v")).head()
        if row and row.v is not None:
            new_version = int(row.v)
            if new_version > self.checkpoint.read():
                self.checkpoint.write(new_version)
            return new_version
        return self.checkpoint.read()

    def run_once(self, sink_fn: Callable[[DataFrame], None],
                 backfill: bool = False) -> int:
        """One tick: read → write via sink_fn → advance the watermark.

        Transient provider errors retry with the reference's 1 s backoff
        (SqlServerChangeTrackingSource.cs:225-229, C11); non-transient ones
        propagate to the runner → FATAL.
        """
        from arcane_framework_spark.streaming.retry import with_retry

        batch = with_retry(self.full_load if backfill else self.delta)
        sink_fn(batch)
        return self.advance(batch)
