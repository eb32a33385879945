"""Stateful streaming operators (T7/T8 extension surface).

The reference has no stateful streaming ops (SURVEY §2.6 T7) — these are the
Spark-native extensions a large-scale ingestion pipeline needs on top of it:

- ``windowed_rollup`` — watermarked tumbling-window aggregation (the
  streaming twin of the batch ``events_hourly_rollup`` query).
- ``dedup_stream`` — exactly-once-per-key within the watermark horizon
  (state is bounded by the watermark, so it runs forever at scale).
- ``sessionize_stream`` — custom per-key session state via
  ``applyInPandasWithState``: Arrow-batched, partitioned by key, state
  evicted on processing-time timeout. The streaming twin of the batch
  ``events_sessionize`` query.

All three shuffle once on the grouping key and hold per-key state on
executors — no driver state, so a 1000-executor cluster scales linearly in
keys.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

if TYPE_CHECKING:
    import pandas as pd

#: Session gap default — matches the batch events_sessionize query.
DEFAULT_GAP_SECONDS = 30 * 60

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
    ]
)

_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
    ]
)


def windowed_rollup(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours",
                    ts_col: str = "ts", key_col: str = "event_type",
                    value_col: str = "value") -> DataFrame:
    """Watermarked tumbling-window rollup: (window, key, n_events, sum_value).

    Late rows beyond ``watermark`` are dropped and the window state is
    evicted — state size stays bounded by (horizon / window) × keys.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(df: DataFrame, keys: list[str], ts_col: str = "ts",
                 watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup with bounded state.

    ``dropDuplicatesWithinWatermark`` keeps one row per key within the
    watermark horizon and then forgets the key — the only way exact dedup
    runs indefinitely on an unbounded stream.
    """
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def sessionize_stream(events: DataFrame, gap_seconds: int = DEFAULT_GAP_SECONDS,
                      state_timeout_ms: int = 60_000,
                      key_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Per-user sessionization with custom state (applyInPandasWithState).

    Emits one row per *closed* session (gap exceeded within a batch, or the
    key's processing-time timeout fires). State per key is three longs —
    O(keys) memory across the cluster, evicted on timeout.
    """
    gap_us = gap_seconds * 1_000_000

    def fn(key: tuple, pdfs: Iterator["pd.DataFrame"],
           state: GroupState) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            n, start_us, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                }
            )
            return

        ts_us = pd.concat(
            [pdf[ts_col] for pdf in pdfs], ignore_index=True
        ).astype("int64").sort_values()
        # incoming ts is long microseconds (cast upstream)
        n, start_us, last_us = state.get if state.exists else (0, None, None)
        out = []
        for t in ts_us:
            t = int(t)
            if last_us is not None and t - last_us > gap_us:
                out.append((n, start_us, last_us))
                n, start_us = 0, t
            if start_us is None:
                start_us = t
            n += 1
            last_us = t
        state.update((n, start_us, last_us))
        state.setTimeoutDuration(state_timeout_ms)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out),
                    "n_events": [o[0] for o in out],
                    "session_start": [pd.Timestamp(o[1], unit="us") for o in out],
                    "session_end": [pd.Timestamp(o[2], unit="us") for o in out],
                }
            )

    # The state machine works in epoch MICROSECONDS. A bare cast('long') on a
    # TimestampType column yields epoch SECONDS in Spark — gaps would be
    # under-measured 1e6× and sessions would never close — so convert
    # explicitly by input type instead of trusting the caller to pre-convert.
    ts_type = events.schema[ts_col].dataType
    if isinstance(ts_type, TimestampType):
        ts_expr = F.unix_micros(F.col(ts_col))
    elif isinstance(ts_type, TimestampNTZType):
        ts_expr = F.unix_micros(F.col(ts_col).cast("timestamp"))
    else:  # integer epochs are taken as already-microseconds
        ts_expr = F.col(ts_col).cast("long")
    prepared = events.select(
        F.col(key_col).cast("long").alias(key_col),
        ts_expr.alias(ts_col),
    )
    return prepared.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def interval_join_stream(left: DataFrame, right: DataFrame,
                         key: str = "user_id", ts_col: str = "ts",
                         max_delay: str = "30 minutes",
                         watermark: str = "2 hours") -> DataFrame:
    """Stream-stream inner interval join: each left event matched to right
    events of the same key with ``left.ts <= right.ts <= left.ts +
    max_delay`` (attribution joins: click→purchase, impression→install).

    Both sides carry watermarks, and the join condition bounds right
    relative to left, so Spark derives a state-eviction horizon for BOTH
    join buffers — state stays bounded forever (the unbounded-state
    stream-stream join trap is exactly what the time bound avoids). One
    shuffle on the key each side; append output mode.

    Column names are prefixed ``l_``/``r_`` (except the shared key) so the
    joined schema never collides.
    """
    lw = left.withWatermark(ts_col, watermark)
    rw = right.withWatermark(ts_col, watermark)
    lsel = lw.select(
        F.col(key),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c != key],
    )
    rsel = rw.select(
        F.col(key).alias("__rkey"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c != key],
    )
    cond = (
        (F.col(key) == F.col("__rkey"))
        & (F.col(f"r_{ts_col}") >= F.col(f"l_{ts_col}"))
        & (
            F.col(f"r_{ts_col}")
            <= F.col(f"l_{ts_col}") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    return lsel.join(rsel, cond, "inner").drop("__rkey")


def kmv_stream(events: DataFrame, key_col: str = "event_type",
               value_col: str = "uid", k: int = 64) -> DataFrame:
    """KMV (theta) sketch maintained as CUSTOM streaming state
    (``applyInPandasWithState``): per key, the state is the bottom-k
    distinct 60-bit md5 hashes of the values seen so far — bounded at
    ``k`` longs per key no matter how much data streams through, the
    textbook shape for always-current distinct/overlap estimation over
    an unbounded stream.

    Every micro-batch folds the arriving values into the state (union +
    re-bottom-k, the sketch's merge law) and emits the FULL current
    sketch tagged with a state version; the consumer keeps each key's
    max-version rows. The hash is bit-identical to the batch
    ``operators/sketches.kmv_sketch`` (md5 hex prefix -> int), so
    streaming state == batch sketch == SQL oracle, three ways.
    """

    def fn(key: tuple, pdfs: Iterator["pd.DataFrame"],
           state: GroupState) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        (group,) = key
        hashes, ver = (
            (list(state.get[0]), int(state.get[1]))
            if state.exists
            else ([], 0)
        )
        s = set(hashes)
        for pdf in pdfs:
            for v in pdf[value_col]:
                s.add(int(hashlib.md5(
                    str(v).encode()).hexdigest()[:15], 16))
        merged = sorted(s)[:k]
        ver += 1
        state.update((merged, ver))
        yield pd.DataFrame(
            {
                key_col: [group] * len(merged),
                "h": merged,
                "ver": [ver] * len(merged),
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=f"{key_col} string, h long, ver int",
        stateStructType="hashes array<long>, ver int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cms_stream(items: DataFrame, value_col: str = "uid") -> DataFrame:
    """Count-Min registers maintained as CUSTOM streaming state
    (``applyInPandasWithState``): the stream pre-explodes every value
    into its ``CMS_D`` hash rows, the state key IS the row index, and
    each group's state is that row's ``CMS_W`` BIGINT counters — the
    whole sketch is d bounded arrays no matter how much data streams
    through (d·w longs total, forever).

    Every micro-batch adds the arriving values' buckets into the
    counters (element-wise add — the CMS merge law) and emits the row's
    full nonzero counter set tagged with a state version; the consumer
    keeps each row's max-version slice. Hashing is bit-identical to the
    batch ``operators/sketches.cms_counts`` (md5('row|value') 60-bit
    prefix mod w), so streaming state == batch counters == SQL oracle.
    """
    from arcane_framework_spark.operators.sketches import CMS_D, CMS_W

    exploded = items.select(
        F.col(value_col).alias("__v"),
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(CMS_D - 1).cast("long"))
        ).alias("row"),
    )

    def fn(key: tuple, pdfs: Iterator["pd.DataFrame"],
           state: GroupState) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        (row,) = key
        counters, ver = (
            (list(state.get[0]), int(state.get[1]))
            if state.exists
            else ([0] * CMS_W, 0)
        )
        prefix = f"{row}|"
        for pdf in pdfs:
            for v in pdf["__v"]:
                b = int(
                    hashlib.md5((prefix + str(v)).encode()).hexdigest()[:15],
                    16,
                ) % CMS_W
                counters[b] += 1
        ver += 1
        state.update((counters, ver))
        nz = [(b, c) for b, c in enumerate(counters) if c > 0]
        yield pd.DataFrame(
            {
                "row": [row] * len(nz),
                "bucket": [b for b, _ in nz],
                "cnt": [c for _, c in nz],
                "ver": [ver] * len(nz),
            }
        )

    return exploded.groupBy("row").applyInPandasWithState(
        fn,
        outputStructType="row long, bucket long, cnt long, ver int",
        stateStructType="counters array<long>, ver int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def transitions_stream(events: DataFrame, user_col: str = "user_id",
                       type_col: str = "event_type",
                       ts_col: str = "ts_us",
                       id_col: str = "event_id") -> DataFrame:
    """Per-user event-transition counting as CUSTOM streaming state: the
    state is just each user's LAST (event_type, ts) — scalar state, the
    smallest possible footprint (contrast with the sketch twins' array
    state) — and each micro-batch emits the transition-count increments
    its rows produce. Downstream sums increments per (prev, next):
    additive, so any micro-batch slicing yields the same totals as the
    batch ``event_transitions`` as long as batches arrive in time order
    (replay of a static parquet under availableNow does; a live
    out-of-order stream would add a watermark + buffer here).

    Rows are sorted by (ts, id) INSIDE the batch (pandas sort — the
    state fn sees each user's whole batch slice), so the sequences are
    identical to the batch operator's lag-window order.
    """

    def fn(key: tuple, pdfs: Iterator["pd.DataFrame"],
           state: GroupState) -> Iterator[\
            "pd.DataFrame"]:
        import pandas as pd

        (user,) = key
        last_type, ver = (
            (state.get[0], int(state.get[1])) if state.exists else (None, 0)
        )
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values([ts_col, id_col])
        counts: dict = {}
        for t in rows[type_col]:
            if last_type is not None:
                k = (last_type, t)
                counts[k] = counts.get(k, 0) + 1
            last_type = t
        ver += 1
        state.update((last_type, ver))
        yield pd.DataFrame(
            {
                "prev_type": [k[0] for k in counts],
                "next_type": [k[1] for k in counts],
                "inc": list(counts.values()),
            }
        )

    return events.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType="prev_type string, next_type string, inc long",
        stateStructType="last_type string, ver int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
