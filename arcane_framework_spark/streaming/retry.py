"""Transient-error retry deciders (C11, SURVEY.md §2.2).

The reference restarts a polling stage with a fixed backoff when the error
is transient, and fails the stream otherwise:

- ``SqlServerSource.cs:118-123`` — ``TimeoutException → Directive.Restart``,
  anything else → ``Directive.Stop``
- ``SqlServerChangeTrackingSource.cs:225-229`` — Timeout/SqlException/
  IOException → restart with 1 s backoff (``RestartSettings``)
- ``RestApiSource.cs:355-361,404-415`` — HTTP timeout/429 → wait and retry

Spark mapping: the driver-side tick (REST fetch, CT poll, full-table poll)
is a plain Python callable, so the decider is a bounded
retry-with-fixed-backoff wrapper around it. Non-transient errors propagate
immediately and reach the runner's ``classify_exception`` → FATAL, exactly
like ``Directive.Stop``.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")

#: Error types the reference treats as transient (restart-able).
TRANSIENT_EXCEPTIONS: tuple[type[BaseException], ...] = (
    TimeoutError,
    ConnectionError,
    InterruptedError,
    OSError,  # IOException analog
)

#: Reference backoff: RestartSettings(1s, ...) in both polling sources.
DEFAULT_BACKOFF_SECONDS = 1.0
DEFAULT_MAX_ATTEMPTS = 3


def is_transient(exc: BaseException) -> bool:
    """True when the reference's deciders would Restart instead of Stop."""
    return isinstance(exc, TRANSIENT_EXCEPTIONS)


def with_retry(fn: Callable[[], T],
               max_attempts: int = DEFAULT_MAX_ATTEMPTS,
               backoff_seconds: float = DEFAULT_BACKOFF_SECONDS,
               decider: Callable[[BaseException], bool] = is_transient,
               sleep: Callable[[float], None] = time.sleep) -> T:
    """Run ``fn`` retrying transient failures with fixed backoff.

    ``decider(exc) → True`` = transient (retry, up to ``max_attempts`` total
    tries); False or attempts exhausted = raise. ``sleep`` is injectable for
    deterministic tests.
    """
    attempt = 0
    while True:
        attempt += 1
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001 — decider boundary
            if not decider(exc) or attempt >= max_attempts:
                raise
            sleep(backoff_seconds)
