"""PySpark DataSource API implementation of the REST source (S4).

The driver-loop ``RestApiSource`` (rest.py) covers stateful pagination and
auth token caching; this module is the Spark-4-native face of the same
source: ``spark.read.format("arcane_rest")`` with page-parallel partitions,
so a bounded paginated API is fetched by executors concurrently instead of
serially on the driver (reference behavior: one-page-at-a-time pull loop,
RestApiSource.cs:400-447 — parallel pages are the Spark-scale upgrade).

Options:
- ``url_template``   URL containing ``@page`` (F8-style placeholder)
- ``pages``          total page count (one Spark partition per page)
- ``schema``         handled by ``.schema(...)`` on the reader
- ``key_chain``      dot-path to the row array in the response (F4)
- ``header.<Name>``  static request headers (P6)
- ``timeout_seconds`` per-request timeout
- ``max_retry_attempts`` / ``retry_backoff_seconds`` — transient-retry
  policy (C11): timeouts, connection errors, and HTTP 5xx are retried
  with fixed backoff, matching the driver-loop source's ``with_retry``
  wrapping (reference RestApiSource.cs:444-447). Other 4xx raise.
- ``requests_per_second`` — executor-side token-bucket rate limit (T5).
  The bucket is shared per Python worker PROCESS (module-level, keyed by
  the configured rate), so with ``E`` concurrent executor workers the
  fleet-wide ceiling is ``E × requests_per_second``; size the option as
  ``api_budget / expected_concurrent_tasks``. HTTP 429/408 are retried
  with backoff like other transients (reference RestApiSource.cs:
  355-361); if still throttled after all attempts, the STREAMING reader
  returns an empty batch with the offset UNCHANGED (re-polled next
  trigger, and never mistaken for an exhausted date-range slice), while
  the BATCH reader fails the task — an empty page there would silently
  truncate the result.

Usage::

    spark.dataSource.register(RestDataSource)
    df = (spark.read.format("arcane_rest")
          .schema("id LONG, name STRING")
          .option("url_template", "https://api/items?page=@page")
          .option("pages", "10")
          .load())
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from collections.abc import Iterator, Sequence
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType


class _PagePartition(InputPartition):
    def __init__(self, page: int):
        self.page = page


#: Per-process rate-limiter registry. The reader object is re-deserialized
#: per task, but the Python worker process survives across tasks — keying
#: the bucket on the configured rate makes every task in the same worker
#: share one bucket, which is the tightest coordination available without
#: an external service.
_RATE_LIMITERS: dict = {}


def _limiter_for(requests_per_second: float | None):
    if not requests_per_second:
        return None
    limiter = _RATE_LIMITERS.get(requests_per_second)
    if limiter is None:
        from arcane_framework_spark.sources.rest import TokenBucketRateLimiter

        # Preserve fractional rates exactly: rate/per_seconds is scaled so
        # the ratio equals requests_per_second (int(2.5) would silently
        # throttle at 2 rps and waste 20% of the API budget). Burst size
        # stays ceil(rps), matching the integer behavior.
        import math

        burst = max(1, math.ceil(requests_per_second))
        limiter = TokenBucketRateLimiter(
            rate=burst, per_seconds=burst / requests_per_second
        )
        _RATE_LIMITERS[requests_per_second] = limiter
    return limiter


class RateLimitedError(Exception):
    """HTTP 408/429 persisted across every retry attempt."""


def _http_transient(exc: BaseException) -> bool:
    """Retry decider: throttle statuses, HTTP 5xx, and transport-level
    errors are transient; other HTTP statuses are not (HTTPError ⊂
    OSError, so it must be checked before the generic transient tuple)."""
    from arcane_framework_spark.streaming.retry import is_transient

    if isinstance(exc, RateLimitedError):
        return True
    if isinstance(exc, urllib.error.HTTPError):
        return exc.code >= 500
    return is_transient(exc)


def _fetch_doc(url: str, headers: dict[str, str], timeout: float, *,
               max_attempts: int = 3, backoff_seconds: float = 1.0,
               requests_per_second: float | None = None):
    """One page fetch returning the PARSED response document, with the same
    resilience contract as the driver-loop source: token-bucket acquire
    before each attempt, bounded fixed-backoff retry on transient failures
    (timeouts, connection errors, 5xx, and throttle statuses 408/429 —
    reference RestApiSource.cs:355-361, 503-515). A still-throttled fetch
    raises :class:`RateLimitedError` so callers can tell "no data" from
    "no progress"."""
    from arcane_framework_spark.streaming.retry import with_retry

    limiter = _limiter_for(requests_per_second)

    def once() -> str:
        if limiter is not None:
            limiter.acquire()
        req = urllib.request.Request(url, headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return resp.read().decode("utf-8")
        except urllib.error.HTTPError as exc:
            if exc.code in (408, 429):
                raise RateLimitedError(f"HTTP {exc.code}: {url}") from exc
            raise

    body = with_retry(
        once,
        max_attempts=max_attempts,
        backoff_seconds=backoff_seconds,
        decider=_http_transient,
    )
    return json.loads(body) if body else {}


def _rows_in(doc, key_chain: Sequence[str]) -> list[dict]:
    """Row array at ``key_chain`` inside a parsed response (F4 semantics)."""
    for key in key_chain:
        if not isinstance(doc, dict) or key not in doc:
            return []
        doc = doc[key]
    if isinstance(doc, list):
        return [r if isinstance(r, dict) else {"value": r} for r in doc]
    return []


def _fetch_rows(url: str, headers: dict[str, str], timeout: float,
                key_chain: Sequence[str], *,
                max_attempts: int = 3, backoff_seconds: float = 1.0,
                requests_per_second: float | None = None) -> list[dict]:
    """:func:`_fetch_doc` + :func:`_rows_in` (the batch reader's path)."""
    doc = _fetch_doc(
        url, headers, timeout,
        max_attempts=max_attempts, backoff_seconds=backoff_seconds,
        requests_per_second=requests_per_second,
    )
    return _rows_in(doc, key_chain)


class RestReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_fields = [f.name for f in schema.fields]
        self.url_template = options["url_template"]
        self.num_pages = int(options.get("pages", "1"))
        self.key_chain = [
            k for k in options.get("key_chain", "").split(".") if k
        ]
        self.timeout = float(options.get("timeout_seconds", "30"))
        self.max_attempts = int(options.get("max_retry_attempts", "3"))
        self.backoff = float(options.get("retry_backoff_seconds", "1"))
        rps = options.get("requests_per_second")
        self.requests_per_second = float(rps) if rps else None
        self.headers = {
            name[len("header."):]: value
            for name, value in options.items()
            if name.startswith("header.")
        }

    def partitions(self) -> list[InputPartition]:
        return [_PagePartition(p) for p in range(1, self.num_pages + 1)]

    def _fetch(self, url: str) -> list[dict]:
        return _fetch_rows(
            url, self.headers, self.timeout, self.key_chain,
            max_attempts=self.max_attempts,
            backoff_seconds=self.backoff,
            requests_per_second=self.requests_per_second,
        )

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        url = self.url_template.replace("@page", str(partition.page))
        for row in self._fetch(url):
            yield tuple(row.get(name) for name in self.schema_fields)


class RestStreamReader(SimpleDataSourceStreamReader):
    """Streaming face: page cursor — optionally a date-range sweep — as the
    checkpointed offset.

    Page mode (default): offset {"page": N}; one page per micro-batch. A
    restarted query resumes at the exact page — the page-token analog of
    the reference's ChangeTrackingVersion watermark (T2). An empty page
    leaves the offset unchanged (the next trigger re-polls, matching the
    reference's empty-batch-then-retry behavior).

    Date-range mode (``range_start`` + ``range_step_seconds`` options, with
    ``@from``/``@to``/``@page`` in the template): offset
    {"slice": S, "page": P} — the streaming form of the reference's
    PagedUriProvider date sweep (PagedUriProvider.cs:119-146): pages
    advance within a slice; an exhausted slice advances the slice cursor;
    a slice whose end is still in the future is not read (no partial
    slices). Both cursors live in the stream checkpoint, so kill/restart
    resumes mid-slice, mid-page.

    Continuation-token mode (``next_token_key_chain`` option, with
    ``@token`` in the template): offset {"token": T} — parity with the
    reference's PageNextTokenResolver (PageNextTokenResolver.cs:11-60).
    The first request renders ``@token`` as the empty string (the
    reference resets its page pointer to "" at start); each response's
    token at the configured key chain becomes the NEXT offset, so a
    kill/restart resumes at the exact committed token. A response with a
    null/missing token ends pagination: its rows are emitted and the
    offset moves to the terminal {"token": T, "done": 1}, which every
    later trigger holds (re-polling with a consumed token would re-emit
    the final page forever — "done" is what distinguishes "no more pages"
    from "page not yet readable", the same distinction the 429 hold makes
    in the other direction).
    """

    def __init__(self, schema: StructType, options: dict):
        self.inner = RestReader(schema, options)
        self.token_chain = [
            k for k in options.get("next_token_key_chain", "").split(".") if k
        ]
        self.range_start: datetime | None = None
        if "range_start" in options:
            self.range_start = datetime.fromisoformat(options["range_start"])
            if self.range_start.tzinfo is None:
                self.range_start = self.range_start.replace(
                    tzinfo=timezone.utc
                )
            self.range_step = timedelta(
                seconds=float(options.get("range_step_seconds", "86400"))
            )
            self.date_format = options.get("date_format", "%Y-%m-%dT%H:%M:%S")

    def initialOffset(self) -> dict:  # noqa: N802 (Spark API)
        if self.token_chain:
            return {"token": ""}
        if self.range_start is not None:
            return {"slice": 0, "page": 0}
        return {"page": 0}

    def read(self, start: dict) -> tuple:
        try:
            if self.token_chain:
                return self._read_token(start)
            if self.range_start is not None:
                return self._read_range(start)
            next_page = int(start["page"]) + 1
            rows = self._rows_for(next_page)
        except RateLimitedError:
            # Throttled through every retry: emit nothing and leave the
            # offset UNCHANGED — distinct from an empty page, which in
            # range mode would (wrongly) advance the slice cursor.
            return iter([]), start
        if not rows:
            return iter([]), start
        return iter(rows), {"page": next_page}

    def _read_token(self, start: dict) -> tuple:
        if start.get("done"):
            return iter([]), start  # pagination exhausted — hold forever
        try:
            rows, next_token = self._token_page(start.get("token", ""))
        except RateLimitedError:
            return iter([]), start  # throttled: no data, no progress
        if next_token in (None, ""):
            # Reference PageNextTokenResolver.cs:30-35: a missing/null
            # token property stops pagination immediately.
            return iter(rows), {"token": start.get("token", ""), "done": 1}
        return iter(rows), {"token": str(next_token)}

    def _token_page(self, token: str) -> tuple:
        """Fetch the page for ``token``; returns (row tuples, next token)."""
        from arcane_framework_spark.sources.rest import extract_by_key_chain

        url = self.inner.url_template.replace("@token", str(token))
        doc = _fetch_doc(
            url, self.inner.headers, self.inner.timeout,
            max_attempts=self.inner.max_attempts,
            backoff_seconds=self.inner.backoff,
            requests_per_second=self.inner.requests_per_second,
        )
        rows = [
            tuple(row.get(name) for name in self.inner.schema_fields)
            for row in _rows_in(doc, self.inner.key_chain)
        ]
        found = extract_by_key_chain(doc, self.token_chain)
        return rows, (found[0] if found else None)

    def _read_range(self, start: dict) -> tuple:
        slice_idx, page = int(start["slice"]), int(start["page"])
        slice_from = self.range_start + slice_idx * self.range_step
        slice_to = slice_from + self.range_step
        if slice_to > datetime.now(timezone.utc):
            return iter([]), start  # slice incomplete — re-poll next trigger
        rows = self._rows_for(page + 1, slice_from, slice_to)
        if rows:
            return iter(rows), {"slice": slice_idx, "page": page + 1}
        # slice exhausted → advance the date cursor, restart page numbering
        return iter([]), {"slice": slice_idx + 1, "page": 0}

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        if self.token_chain:
            # Replay by re-walking the token chain from `start` until the
            # offsets meet `end`; a committed micro-batch spans one page,
            # so this is one fetch in practice. Tokens are deterministic
            # for already-served pages, so the replayed rows match.
            rows: list[tuple] = []
            cur = dict(start)
            while cur != end and not cur.get("done"):
                batch, nxt = self._read_token(cur)
                rows.extend(batch)
                if nxt == cur:
                    # Throttled mid-replay. Returning the partial batch
                    # here would COMMIT a truncated row set for an
                    # already-committed offset range (silent data loss on
                    # restart recovery); raising fails the task so Spark
                    # retries the whole replay instead.
                    raise RateLimitedError(
                        f"throttled replaying committed range {start}..{end}"
                    )
                cur = nxt
            return iter(rows)
        if self.range_start is not None:
            # Replay by stepping the same cursor logic until `end`; pages
            # are deterministic for completed slices, so the replayed batch
            # matches what was originally read.
            rows: list[tuple] = []
            cur = dict(start)
            while (int(cur["slice"]), int(cur["page"])) < (
                int(end["slice"]), int(end["page"])
            ):
                batch, nxt = self._read_range(cur)
                rows.extend(batch)
                if nxt == cur:
                    # A committed range can only contain completed slices
                    # (time advances monotonically), so a stuck cursor
                    # mid-replay means the environment changed under us.
                    # Fail the task rather than commit a truncated batch.
                    raise RuntimeError(
                        f"replay stalled at {cur} inside committed range "
                        f"{start}..{end}"
                    )
                cur = nxt
            return iter(rows)
        rows = []
        for page in range(int(start["page"]) + 1, int(end["page"]) + 1):
            rows.extend(self._rows_for(page))
        return iter(rows)

    def _rows_for(self, page: int, slice_from: datetime | None = None,
                  slice_to: datetime | None = None) -> list[tuple]:
        url = self.inner.url_template.replace("@page", str(page))
        if slice_from is not None:
            url = url.replace(
                "@from", slice_from.strftime(self.date_format)
            ).replace("@to", slice_to.strftime(self.date_format))
        return [
            tuple(row.get(name) for name in self.inner.schema_fields)
            for row in self.inner._fetch(url)
        ]


class RestDataSource(DataSource):
    """``format("arcane_rest")`` — page-parallel batch + page-cursor stream."""

    @classmethod
    def name(cls) -> str:
        return "arcane_rest"

    def schema(self) -> str:
        # A declared .schema(...) always takes precedence; this default
        # covers schemaless exploration.
        return "value STRING"

    def reader(self, schema: StructType) -> RestReader:
        return RestReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> RestStreamReader:  # noqa: N802
        return RestStreamReader(schema, self.options)
