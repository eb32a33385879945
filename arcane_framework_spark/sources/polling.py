"""Polling full-table source (S1, SURVEY.md §2.1).

Reference: ``src/Sources/SqlServer/SqlServerSource.cs:28-210`` — the simple
source that re-reads the WHOLE table every ``changeCaptureInterval``; no
backfill/incremental duality, no watermark. Its error decider restarts the
poll on ``TimeoutException`` and stops on anything else
(``SqlServerSource.cs:118-123``).

Spark mapping:

- one poll = one batch read of the provider relation (for JDBC providers the
  generated ``SELECT *`` pushes down server-side via
  ``tsql.plain_select_query``, like the reference's ``GetQuery()``);
- the *timer* is Structured Streaming's ``rate`` source driven by the
  runner's ProcessingTime trigger: each micro-batch tick re-reads the table
  and hands the fresh snapshot to the sink. The rate rows themselves are
  discarded — they are the clock, not the data — so the poll loop inherits
  the runner's whole lifecycle (graceful stop, exit codes, checkpointed
  restart) with zero custom thread code;
- the transient decider is ``streaming.retry.with_retry`` around each poll.
"""

from __future__ import annotations

from collections.abc import Callable
from datetime import timedelta

from pyspark.sql import DataFrame, SparkSession

from arcane_framework_spark.contracts.columns import with_merge_key
from arcane_framework_spark.streaming.retry import with_retry
from arcane_framework_spark.streaming.runner import RunResult, StreamRunner


class PollingTableSource:
    """Re-reads a full table per tick (no watermark, no CDC bookkeeping).

    ``table_provider()`` returns the current table snapshot as a DataFrame —
    a JDBC read, a parquet dir, or a test fixture. ``pk_columns`` (optional)
    attaches ``ARCANE_MERGE_KEY`` so downstream MERGE consumers can still
    absorb the repeated snapshots idempotently.
    """

    def __init__(self,
                 table_provider: Callable[[], DataFrame],
                 pk_columns: list[str] | None = None,
                 partitioning_expression: str | None = None,
                 max_retry_attempts: int = 3,
                 retry_backoff_seconds: float = 1.0,
                 sleep: Callable[[float], None] | None = None):
        self.table_provider = table_provider
        self.pk_columns = pk_columns
        self.partitioning_expression = partitioning_expression
        self.max_retry_attempts = max_retry_attempts
        self.retry_backoff_seconds = retry_backoff_seconds
        self._sleep = sleep

    @classmethod
    def from_jdbc(cls, spark: SparkSession, url: str, catalog: str,
                  schema: str, table: str,
                  pk_columns: list[str] | None = None,
                  options: dict[str, str] | None = None,
                  **kwargs) -> "PollingTableSource":
        """JDBC-backed provider using the generated plain SELECT (pushdown).

        Mirrors ``SqlServerSource.GetQuery()`` (SqlServerSource.cs:103-107).
        """
        from arcane_framework_spark.sources.tsql import plain_select_query

        query = plain_select_query(catalog, schema, table)

        def provider() -> DataFrame:
            reader = spark.read.format("jdbc").option("url", url).option(
                "query", query
            )
            for k, v in (options or {}).items():
                reader = reader.option(k, v)
            return reader.load()

        return cls(provider, pk_columns=pk_columns, **kwargs)

    # -- one tick -----------------------------------------------------------

    def poll(self) -> DataFrame:
        """One poll: the whole current table, with contracts attached.

        Transient provider errors (timeouts, IO) retry with fixed backoff
        like the reference decider; others propagate → runner FATAL.
        """
        kwargs = {} if self._sleep is None else {"sleep": self._sleep}
        df = with_retry(
            self.table_provider,
            max_attempts=self.max_retry_attempts,
            backoff_seconds=self.retry_backoff_seconds,
            **kwargs,
        )
        if self.pk_columns:
            df = with_merge_key(df, self.pk_columns)
        if self.partitioning_expression:
            from arcane_framework_spark.contracts.columns import (
                with_date_partition,
            )

            df = with_date_partition(df, self.partitioning_expression)
        return df

    # -- the poll loop on the runner ----------------------------------------

    def run(self, spark: SparkSession,
            sink_fn: Callable[[DataFrame, int], None],
            checkpoint_dir: str,
            runner: StreamRunner | None = None,
            tick_interval: timedelta = timedelta(seconds=15),
            max_ticks: int | None = None) -> RunResult:
        """Poll forever (or ``max_ticks``) on the runner's ProcessingTime
        trigger; each tick hands a fresh full snapshot to ``sink_fn``.

        The ``rate`` stream is purely the clock — 1 row/tick, discarded.
        ``max_ticks`` is for tests/bounded drains; production passes None and
        stops via the runner's kill switch (SIGTERM → graceful stop).
        """
        runner = runner or StreamRunner()
        ticks = spark.readStream.format("rate").option(
            "rowsPerSecond", 1
        ).load()
        seen = {"n": 0}

        def per_tick(_tick_df: DataFrame, batch_id: int) -> None:
            if max_ticks is not None and seen["n"] >= max_ticks:
                runner.request_stop()
                return
            seen["n"] += 1
            sink_fn(self.poll(), batch_id)
            if max_ticks is not None and seen["n"] >= max_ticks:
                runner.request_stop()

        return runner.run_stream(
            ticks,
            per_tick,
            checkpoint_dir=checkpoint_dir,
            backfill=False,
            trigger_interval=tick_interval,
        )
