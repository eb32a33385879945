"""Persist-lifecycle management for operator pipelines.

Several operators (MinHash/SimHash/ngram dedup, banded ANN, k-means) persist
intermediate tables that are consumed more than once inside the returned
DataFrame's DAG — signature tables, shingle tables, band buckets. The
operator cannot unpersist them itself: the caller has not run its action
yet. Left alone, a long-lived session (a query catalog run, an iterative
job) accumulates block-manager cache without bound.

``cache_scope`` makes the lifecycle explicit: every persist an operator
takes inside the ``with`` block is tracked, and released when the block
exits — callers wrap *one query + its action* per scope::

    with cache_scope():
        pairs = minhash_lsh_pairs(docs)
        pairs.count()          # caches live here
    # signature/band tables unpersisted

Outside any scope, ``scoped_persist`` behaves exactly like ``persist()`` and
the caller owns cleanup (``spark.catalog.clearCache()`` or per-handle
``unpersist``) — the right default for notebooks that reuse the cached
tables across actions.
"""

from __future__ import annotations

import contextlib
import threading

from pyspark.sql import DataFrame

_scopes = threading.local()


def scoped_persist(df: DataFrame) -> DataFrame:
    """``df.persist()``, registered with the innermost active cache_scope.

    If an EQUIVALENT plan is already cached (``df.storageLevel`` does a
    CacheManager lookup by canonicalized-plan equality, not by handle),
    the DataFrame is returned untouched and NOT tracked: the cache
    belongs to whoever created it. This is what lets a session-level
    shared prep (``prep.shared_prep``) persist the catalog's hot derived
    tables once — without the guard, the first query to re-derive the
    same subtree would re-persist it, and its scope exit would UNPERSIST
    the shared entry out from under every later query (DataFrame.unpersist
    also evicts by plan equality)."""
    if df.storageLevel.useMemory or df.storageLevel.useDisk:
        return df
    out = df.persist()
    stack = getattr(_scopes, "stack", None)
    if stack:
        stack[-1].append(out)
    return out


@contextlib.contextmanager
def cache_scope():
    """Track every ``scoped_persist`` in the block; unpersist all on exit.

    Scopes nest: an inner scope releases only its own persists. Exceptions
    still release (``finally``), so a failed query cannot leak cache.
    """
    stack = getattr(_scopes, "stack", None)
    if stack is None:
        stack = []
        _scopes.stack = stack
    tracked: list[DataFrame] = []
    stack.append(tracked)
    try:
        yield tracked
    finally:
        stack.pop()
        for df in tracked:
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped — nothing to release
