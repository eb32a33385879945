"""Spark-4 streaming DataSource face of the change-tracking source (S2/T2).

The driver-loop ``ChangeTrackingSource`` (jdbc_ct.py) manages its version
watermark in its own file checkpoint; this module puts the SAME watermark in
Spark's native Structured Streaming commit log instead — the reference's
checkpointed-offset semantics (SqlServerChangeTrackingSource.cs:455-459:
the highest ``SYS_CHANGE_VERSION`` fully emitted is durably committed, and
a restarted stream resumes strictly after it, never re-reading a delta).

``format("arcane_ct")`` reads a change-FEED relation: an append-only
directory of parquet change rows carrying the PKs, a version column, and an
operation column ('I'/'U'/'D') — the shape ``ChangeTrackingSource`` consumes
from its ``changes_provider`` and CDM/Delta CDF materialize on disk. Each
micro-batch emits the rows with ``version > committed`` and commits
``max(version)`` as the new offset:

- offset JSON: ``{"version": V}`` — directly comparable to the reference's
  ChangeTrackingVersion watermark (T2)
- empty tick (no rows past V): offset UNCHANGED, re-polled next trigger —
  the reference's empty-change-feed behavior
- ``readBetweenOffsets`` replays ``(start, end]`` from the immutable feed,
  so a crash between batches recovers the exact committed batch (the test
  kills the query mid-stream and restarts on the same checkpoint: no
  duplicate delta, no gap)

The delete-preserving join to current table state (R2) is deliberately NOT
inside the source: it stays a downstream stream-static ``delta_join`` —
Spark's own machinery for it — keeping the source a pure watermarked change
feed exactly like CHANGETABLE(CHANGES ...) is on the server.

Options:
- ``path``            change-feed parquet directory (append-only)
- ``version_column``  default SYS_CHANGE_VERSION
- ``start_version``   initial watermark (default -1: everything; the
  backfill/stream duality is the runner's concern — a backfill writes the
  snapshot with synthesized version 0, then the stream starts at 0)
- ``unreadable_policy``  what an in-flight/truncated file does to the
  tick: ``hold`` (default — consume the feed only up to the first
  unreadable file, never committing past it; see ``_feed_rows``) or
  ``fail`` (raise, for feeds where truncation means corruption)

Driver-side reads use pyarrow directly (a SimpleDataSourceStreamReader
prefetches on the driver by design — per-tick deltas are version-bounded
and small; the 100 TB table itself never flows through this source, only
its change rows, exactly like the reference's CHANGETABLE scans).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

from arcane_framework_spark.contracts.columns import SYS_CHANGE_VERSION


def _footer_version_bounds(md, version_col: str):
    """(min, max) of ``version_col`` from the parquet FOOTER row-group
    statistics — no data pages touched. Returns None when any row group
    lacks min/max stats (caller falls back to reading the column);
    (None, None) for a zero-row-group file."""
    vmin = vmax = None
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        stats = None
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            if col.path_in_schema == version_col:
                stats = col.statistics
                break
        if stats is None or not stats.has_min_max:
            return None
        vmin = stats.min if vmin is None else min(vmin, stats.min)
        vmax = stats.max if vmax is None else max(vmax, stats.max)
    return vmin, vmax


def _feed_rows(path: str, version_col: str, schema_fields: list[str],
               lo: int, hi: int | None,
               unreadable_policy: str = "hold") -> tuple[list[tuple], int]:
    """Rows with ``lo < version <= hi`` (hi=None: no upper bound) from the
    parquet feed at ``path``; returns (tuples, max version seen overall).

    Listing + filtering happens per call: the feed is append-only, so new
    files between calls are exactly the new deltas. Missing/empty dir is a
    cold feed, not an error.

    Per-tick cost is bounded by DELTA size, not feed age (the reference's
    CHANGETABLE scans are delta-bounded too): each file's version range is
    read from its parquet footer statistics, and files entirely at or below
    the committed watermark (``max <= lo``) — i.e. the ever-growing history
    — are skipped without touching their data pages.

    **Unreadable (in-flight / truncated) files stop the scan** — the feed
    is consumed as a PREFIX in filename order: rows and the watermark come
    only from files strictly BEFORE the first unreadable one; everything at
    or after it waits for a later tick. This is what makes in-flight
    tolerance safe under overlapping writers: skipping the unreadable file
    while advancing the watermark from files sorted after it would lose the
    file forever if it completes with ``max(version) <= committed``. The
    prefix rule never commits past an incomplete file, so a late completion
    always lands ABOVE the offset. The feed contract this relies on is
    explicit and minimal: **filename sort order must not run ahead of
    version order across files** (each file's versions exceed every version
    in files that sort before it) — naturally true for zero-padded sequence
    names from a serial writer, and the contract concurrent writers must
    arrange (claim the name before writing). ``unreadable_policy="fail"``
    raises instead of holding, for feeds where a truncated file is always
    corruption rather than a writer mid-append.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if not os.path.isdir(path):
        return [], lo
    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    if not files:
        return [], lo

    max_seen: int | None = None
    candidates: list[str] = []
    for f in files:
        try:
            pf = pq.ParquetFile(f)
            bounds = _footer_version_bounds(pf.metadata, version_col)
            if bounds is None:  # stats absent: bound from the one column
                versions = pf.read(columns=[version_col]).column(version_col)
                fmin = pc.min(versions).as_py()
                fmax = pc.max(versions).as_py()
            else:
                fmin, fmax = bounds
        except (OSError, pa.ArrowInvalid):
            if unreadable_policy == "fail":
                raise
            break  # prefix rule: nothing at/after an in-flight file
        if fmax is None:
            continue  # zero-row file
        max_seen = fmax if max_seen is None else max(max_seen, fmax)
        if fmax <= lo:
            continue  # fully below the watermark: committed history
        if hi is not None and fmin > hi:
            continue  # fully above a bounded replay range
        candidates.append(f)

    if max_seen is None:
        return [], lo
    if not candidates:
        return [], int(max_seen)
    table = pq.ParquetDataset(candidates).read()
    versions = table.column(version_col)
    mask = pc.greater(versions, lo)
    if hi is not None:
        mask = pc.and_(mask, pc.less_equal(versions, hi))
    picked = table.filter(mask)
    cols = [picked.column(name).to_pylist() for name in schema_fields]
    return list(zip(*cols)) if picked.num_rows else [], int(max_seen)


class CtStreamReader(SimpleDataSourceStreamReader):
    """Version-watermarked change-feed reader; offset = {"version": V}."""

    def __init__(self, schema: StructType, options: dict):
        self.path = options["path"]
        self.version_col = options.get("version_column", SYS_CHANGE_VERSION)
        self.start_version = int(options.get("start_version", "-1"))
        self.unreadable_policy = options.get("unreadable_policy", "hold")
        if self.unreadable_policy not in ("hold", "fail"):
            raise ValueError(
                "unreadable_policy must be 'hold' (wait for the in-flight "
                "file; default) or 'fail' (raise on a truncated file), got "
                f"{self.unreadable_policy!r}"
            )
        self.schema_fields = [f.name for f in schema.fields]
        if self.version_col not in self.schema_fields:
            raise ValueError(
                f"schema must include the version column "
                f"{self.version_col!r} (it IS the watermark)"
            )

    def initialOffset(self) -> dict:  # noqa: N802 (Spark API)
        return {"version": self.start_version}

    def read(self, start: dict) -> tuple:
        lo = int(start["version"])
        rows, max_seen = _feed_rows(
            self.path, self.version_col, self.schema_fields, lo, None,
            unreadable_policy=self.unreadable_policy,
        )
        if not rows:
            return iter([]), start  # empty tick: watermark holds
        return iter(rows), {"version": max_seen}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:  # noqa: N802
        # Deterministic replay of a committed range from the immutable
        # feed: version-bounded on BOTH sides, so rows appended after the
        # original read can never leak into a recovered batch.
        rows, _ = _feed_rows(
            self.path, self.version_col, self.schema_fields,
            int(start["version"]), int(end["version"]),
            unreadable_policy=self.unreadable_policy,
        )
        return iter(rows)


class CtDataSource(DataSource):
    """``format("arcane_ct")`` — change feed with commit-logged versions."""

    @classmethod
    def name(cls) -> str:
        return "arcane_ct"

    def simpleStreamReader(self, schema: StructType) -> CtStreamReader:  # noqa: N802
        return CtStreamReader(schema, self.options)
