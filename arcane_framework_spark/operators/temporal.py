"""Temporal join operators: as-of (backward-looking point-in-time) join.

Spark has no native ASOF JOIN; the scalable composition is the union-tag
pattern rather than a range join:

1. tag right rows 0 and left rows 1, union them on a common layout;
2. one shuffle+sort on (key, ts, tag);
3. a running ``last(right payload, ignorenulls)`` window carries the most
   recent right row forward onto every left row.

Cost: ONE exchange + sort over |L|+|R| rows — no per-row range probe, no
candidate explosion, skew bounded by the hottest key like any keyed window.
(A join-based formulation L ⋈ R on key with ts filter + argmax would shuffle
|L|×matches rows; the union-tag form is strictly better at scale.)

DuckDB's native ``ASOF JOIN`` computes the same relation — the oracle for
``asof_attribution_events``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_tag"


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              right_payload: list[str] | None = None,
              suffix: str = "_right") -> DataFrame:
    """Backward as-of join: each left row gets the latest right row with
    ``right_ts <= left_ts`` for the same ``on`` key (inclusive on ties).

    Returns all left columns plus ``<right_ts><suffix>`` and each payload
    column as ``<name><suffix>`` (NULL when no right row precedes).
    """
    right_payload = right_payload or []
    l_cols = [c for c in left.columns]
    tagged_left = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias(_TAG),
        *[F.col(c).alias(f"__l_{c}") for c in l_cols if c != on],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in right_payload
        ],
    )
    tagged_right = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias(_TAG),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
            for c in l_cols
            if c != on
        ],
        F.col(right_ts).alias("__r_ts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
    )
    # Sort ties (equal ts) right-before-left so an exactly-simultaneous
    # right row IS visible to the left row (inclusive backward join).
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts"), F.col(_TAG))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_left.unionByName(tagged_right).select(
        "*",
        F.last("__r_ts", ignorenulls=True).over(w).alias("__asof_ts"),
        *[
            F.last(f"__r_{c}", ignorenulls=True)
            .over(w)
            .alias(f"__asof_{c}")
            for c in right_payload
        ],
    )
    return carried.filter(F.col(_TAG) == 1).select(
        F.col(on),
        F.col("__ts").alias(left_ts),
        *[F.col(f"__l_{c}").alias(c) for c in l_cols if c not in (on, left_ts)],
        F.col("__asof_ts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"__asof_{c}").alias(f"{c}{suffix}") for c in right_payload],
    )


def window_funnel(events: DataFrame, steps: list[str],
                  window_us: int, user_col: str = "user_id",
                  ts_col: str = "ts_us",
                  type_col: str = "event_type") -> DataFrame:
    """Ordered-step funnel: deepest step each user reaches in sequence
    within ``window_us`` microseconds of their FIRST step-1 event.

    Semantics (ClickHouse ``windowFunnel``-style, anchored at the earliest
    step-1 event): ``t1 = min ts of steps[0]``; ``t_i = min ts of
    steps[i-1] with t_{i-1} <= ts <= t1 + window``. Returns one row per
    user that reached step 1: ``(user, level)`` with level in 1..len(steps).

    Scale: one filtered aggregate per step plus equi-joins on the user key —
    every join is co-partitioned on ``user_col`` (the aggregates already
    hash-partition by it), so AQE coalesces this into a single exchange
    lineage; no windows, no range explosion. Timestamps are integer
    microseconds to keep the arithmetic engine-portable.
    """
    ev = events.select(user_col, type_col, ts_col)
    reached = (
        ev.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__prev"))
        .withColumn("__deadline", F.col("__prev") + F.lit(window_us))
    )
    # Each step's survivor set is a subset of the previous one, so tagging
    # every survivor set with its level and taking max(level) per user
    # yields the deepest step reached.
    tagged = [reached.select(user_col, F.lit(1).alias("level"))]
    for i, step in enumerate(steps[1:], start=2):
        reached = (
            ev.filter(F.col(type_col) == step)
            .join(reached, user_col)
            .filter(
                (F.col(ts_col) >= F.col("__prev"))
                & (F.col(ts_col) <= F.col("__deadline"))
            )
            .groupBy(user_col)
            .agg(
                F.min(ts_col).alias("__prev"),
                F.max("__deadline").alias("__deadline"),
            )
        )
        tagged.append(reached.select(user_col, F.lit(i).alias("level")))
    allsets = tagged[0]
    for t in tagged[1:]:
        allsets = allsets.unionByName(t)
    return allsets.groupBy(user_col).agg(F.max("level").alias("level"))


def rolling_active_users(events: DataFrame, ts_us_col: str = "ts_us",
                         user_col: str = "user_id",
                         window_days: int = 7) -> DataFrame:
    """Exact ``window_days``-rolling distinct actives (WAU) per day next
    to daily actives (DAU) and the DAU/WAU stickiness ratio.

    Sliding-window DISTINCT without rescanning ``window_days`` of raw
    events per day: each distinct (user, day) pair fans out to the
    ≤ ``window_days`` window-END days it supports (clipped to the last
    observed day), then one distinct-count per window end. The fan-out
    is bounded ``window_days``× of the user-day AGGREGATE — which is
    already the DAU table — never of raw events; at 100 TB the shuffle
    moves user-day pairs, not events. Returns (day_us, dau, wau,
    stickiness)."""
    from arcane_framework_spark.operators.scale import with_broadcast_scalar

    day_us = 86_400_000_000
    ud = events.select(
        F.expr(f"{ts_us_col} div {day_us}").alias("day"),
        F.col(user_col).alias("__u"),
    ).distinct()
    mx = ud.agg(F.max("day").alias("__mx"))
    fan = with_broadcast_scalar(ud, mx).select(
        "__u",
        F.explode(
            F.sequence(
                F.col("day"),
                F.least(F.col("day") + (window_days - 1), F.col("__mx")),
            )
        ).alias("wd"),
    )
    wau = fan.groupBy("wd").agg(
        F.countDistinct("__u").cast("long").alias("wau")
    )
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    # LEFT join: a calendar day with WAU>0 but zero events that day (gap
    # day) must surface as dau=0 / stickiness=0.0, not silently vanish
    # from the engagement series.
    return wau.join(dau, wau["wd"] == dau["day"], "left").select(
        (F.col("wd") * day_us).alias("day_us"),
        F.coalesce(F.col("dau"), F.lit(0).cast("long")).alias("dau"),
        "wau",
        F.round(
            F.coalesce(F.col("dau"), F.lit(0)).cast("double")
            / F.col("wau").cast("double"),
            6,
        ).alias("stickiness"),
    )


def retention_cohorts(events: DataFrame, user_col: str = "user_id",
                      date_col: str = "event_date") -> DataFrame:
    """Classic cohort retention: users bucketed by first-seen date, counted
    per whole-week offset of each later active day.

    Returns ``(cohort_date, week_offset, n_users)`` where ``n_users`` is the
    count of distinct cohort members active during that offset week.

    Scale: first-seen is one aggregate by user; the join back is
    co-partitioned on the user key; the final count-distinct aggregates
    (cohort, offset, user) partially before the exchange.
    """
    first_seen = events.groupBy(user_col).agg(
        F.min(date_col).alias("cohort_date")
    )
    return (
        events.select(user_col, date_col)
        .join(first_seen, user_col)
        .select(
            "cohort_date",
            F.floor(
                F.datediff(F.col(date_col), F.col("cohort_date")) / 7
            ).cast("int").alias("week_offset"),
            user_col,
        )
        .groupBy("cohort_date", "week_offset")
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Hourly volume anomaly detection
# ---------------------------------------------------------------------------

ANOMALY_TOP_K = 3


def hourly_anomaly(events: DataFrame, ts_col, type_col: str = "event_type",
                   top_k: int = ANOMALY_TOP_K) -> DataFrame:
    """Per-type hourly volume anomalies: the ``top_k`` hours whose event
    count deviates most (|z-score|) from that type's hourly mean:
    (event_type, hour, n_events, z_score, rank).

    ``ts_col`` is a timestamp Column (callers pass ``ts_timestamp(df)`` so
    the dtype dispatch survives testdata drift).

    The z-score is computed from integer moments, not stddev_samp/avg
    accumulators: with n hours, S = sum(count), Q = sum(count^2),
    ``z = (c*n - S) / sqrt(n*Q - S*S)`` — algebraically
    (c - mean)/std_pop. The moments are exact int64 sums; the products
    are taken in doubles (identical operand order in both engines —
    double multiply and sqrt are IEEE-exactly-rounded, so the engines
    still agree bit-for-bit, without the int64 wrap a hot event type
    would hit).

    Scale shape: the corpus-scale work is ONE groupBy(type, hour) with
    map-side combine; everything downstream (per-type windows, the top-k
    rank) runs on the hourly rollup, which is metadata-scale (hours x
    types) by construction.
    """
    return anomaly_scores(hourly_rollup(events, ts_col, type_col), top_k)


def hourly_rollup(events: DataFrame, ts_col,
                  type_col: str = "event_type") -> DataFrame:
    """(event_type, hour, n_events) — the corpus-scale rollup shared by
    the batch anomaly query and its streaming twin (which runs this very
    aggregation under Structured Streaming)."""
    return (
        events.select(
            F.col(type_col).alias("event_type"),
            F.date_trunc("hour", ts_col).alias("hour"),
        )
        .groupBy("event_type", "hour")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )


def anomaly_scores(hourly: DataFrame,
                   top_k: int = ANOMALY_TOP_K) -> DataFrame:
    """Score a (event_type, hour, n_events) rollup — the metadata-scale
    half of ``hourly_anomaly``, shared with the streaming twin (whose
    rollup comes from a drained streaming aggregation)."""
    w_type = Window.partitionBy("event_type")
    stats = (
        hourly.withColumn("__n", F.count(F.lit(1)).over(w_type))
        .withColumn("__s", F.sum("n_events").over(w_type))
        .withColumn(
            "__q", F.sum(F.col("n_events") * F.col("n_events")).over(w_type)
        )
    )
    # Doubles BEFORE the products: n*Q and S*S as int64 wrap once an
    # event type's total count passes ~3e9 (silently, ANSI off) — NaN
    # z-scores. Double multiply + sqrt are IEEE-exactly-rounded, so with
    # identical operand order the oracle still matches bit-for-bit.
    denom = F.sqrt(
        F.col("__n").cast("double") * F.col("__q")
        - F.col("__s").cast("double") * F.col("__s")
    )
    z = F.when(
        denom > 0,
        (F.col("n_events").cast("double") * F.col("__n") - F.col("__s"))
        / denom,
    ).otherwise(F.lit(0.0))
    scored = stats.withColumn("__z", z)
    w_rank = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("__z")).desc(), "hour"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= top_k)
        .select(
            "event_type",
            "hour",
            "n_events",
            (F.floor(F.col("__z") * 1e4 + F.lit(0.5)) / 1e4).alias("z_score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def interval_union(df: DataFrame, key_col: str, start_col: str,
                   end_col: str) -> DataFrame:
    """Per-key length of the UNION of (possibly overlapping) intervals —
    plus the count of disjoint merged segments.

    The classic merge-overlapping-intervals problem as pure window
    algebra: sort each key's intervals by (start, end), track the
    running max end over PRECEDING rows, and each row contributes
    ``max(0, end - max(start, running_end))`` covered units; a row whose
    start exceeds the running end opens a new disjoint segment. One
    shuffle on the key, one sort per key partition, all integer
    arithmetic — the shape that computes user active-time or machine
    busy-time over 100 TB of events without ever materializing merged
    intervals. Expects integer start/end (epoch micros); returns
    (key, n_intervals, n_segments, covered).

    This is also batch sessionization: intervals of ``[ts, ts + gap)``
    make ``n_segments`` the session count under a ``gap`` inactivity
    timeout — the batch twin of the streaming
    ``applyInPandasWithState`` sessionizer, checkable against plain SQL.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key_col)
        .orderBy(start_col, end_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run_end = F.max(end_col).over(w)
    contribution = F.greatest(
        F.col(end_col)
        - F.greatest(F.col(start_col), F.coalesce(run_end, F.col(start_col))),
        F.lit(0),
    )
    new_segment = (
        run_end.isNull() | (F.col(start_col) > run_end)
    ).cast("long")
    return (
        df.select(
            F.col(key_col).alias("key"),
            contribution.alias("__c"),
            new_segment.alias("__new"),
        )
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("__new").cast("long").alias("n_segments"),
            F.sum("__c").cast("long").alias("covered"),
        )
        .withColumnRenamed("key", key_col)
    )


def event_transitions(events: DataFrame, user_col: str = "user_id",
                      type_col: str = "event_type",
                      ts_col: str = "ts_micros",
                      id_col: str = "event_id") -> DataFrame:
    """First-order Markov transition matrix of user journeys:
    ``P(next_type | prev_type)`` from per-user time-ordered event
    sequences — the session-flow model behind funnel design and
    next-action prediction.

    One per-user lag window (user-sized partitions, no global sort; the
    ``(ts, id)`` tie-break makes the order total, so both engines build
    identical sequences), then a transition-pair count aggregate —
    output is |types|² rows, metadata-scale. ``prob`` is the row-
    normalized rational count, fixed-point 6dp.

    Returns (prev_type, next_type, cnt, prob).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    seq = events.select(
        user_col,
        F.col(type_col).alias("next_type"),
        F.lag(type_col).over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.groupBy("prev_type").agg(F.sum("cnt").alias("__tot"))
    return counts.join(F.broadcast(totals), "prev_type").select(
        "prev_type",
        "next_type",
        "cnt",
        (
            F.floor(
                F.col("cnt").cast("double")
                * F.lit(1e6)
                / F.col("__tot").cast("double")
                + F.lit(0.5)
            )
            / 1e6
        ).alias("prob"),
    )


def kaplan_meier(units: DataFrame, duration_col: str = "duration",
                 event_col: str = "event") -> DataFrame:
    """Kaplan-Meier survival table from (duration, event∈{0,1}) units
    (event=0 ⇒ right-censored at ``duration``): per distinct duration
    the risk-set size, events, censorings, and the cumulative hazard in
    micro-nats — ``S(t) = exp(−cum_lp_micro/1e6)``, left in integer
    fixed point so both engines agree bit-for-bit (a cross-engine
    cumulative PRODUCT of doubles would drift; a sum of pre-floored
    per-step logs cannot).

    The duration-grouped table is span-sized (days observed), so the
    ordering windows run over metadata-scale rows — the group-offsets
    window pattern, not a corpus window. If the risk set is ever fully
    consumed by events (``d = n_risk`` ⇒ S hits exactly 0, infinite
    hazard), ``cum_lp_micro`` is NULL from that point on — identically
    in both engines; the integer d/c/n_risk columns stay exact
    regardless.

    Returns (t, n_risk, d, c, cum_lp_micro) ordered by nothing (the
    caller sorts); one row per distinct duration.
    """
    from arcane_framework_spark.operators.scale import with_broadcast_scalar

    ev = F.col(event_col).cast("long")
    counts = units.groupBy(F.col(duration_col).alias("t")).agg(
        F.sum(ev).alias("d"),
        F.sum(F.lit(1) - ev).alias("c"),
    )
    total = counts.agg(F.sum(F.col("d") + F.col("c")).alias("__tot"))
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_incl = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risked = with_broadcast_scalar(counts, total).withColumn(
        "n_risk",
        F.col("__tot")
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)),
    )
    step = F.when(F.col("d") == 0, F.lit(0)).when(
        F.col("d") < F.col("n_risk"),
        F.floor(
            F.lit(-1e6)
            * F.log(
                F.lit(1.0)
                - F.col("d").cast("double") / F.col("n_risk").cast("double")
            )
            + F.lit(0.5)
        ).cast("long"),
    )
    out = (
        risked.withColumn("__step", step)
        .withColumn(
            "__dead",
            F.max(
                F.when(F.col("d") == F.col("n_risk"), 1).otherwise(0)
            ).over(w_incl),
        )
        .withColumn(
            "cum_lp_micro",
            F.when(
                F.col("__dead") == 0, F.sum("__step").over(w_incl)
            ).cast("long"),
        )
    )
    return out.select(
        "t",
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("d"),
        F.col("c").cast("long").alias("c"),
        "cum_lp_micro",
    )
