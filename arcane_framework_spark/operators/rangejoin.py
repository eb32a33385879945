"""Bucketed range (interval-containment) join.

``points ⋈ intervals ON p.ts BETWEEN i.start AND i.end`` has no equi-key, so
Catalyst plans a BroadcastNestedLoopJoin — fine when intervals broadcast,
fatal when both sides are big (|P|×|I| comparisons). The scale shape is
BUCKETING: quantize time into fixed-width buckets, explode each interval
over the buckets it overlaps, and equi-join on the bucket id — candidates
drop from |P|×|I| to pairs sharing a bucket, then the exact BETWEEN filter
verifies. One shuffle on the bucket key; interval duplication is bounded by
``interval_length / bucket_width + 1``, so pick a width near the median
interval length.

This is the generate-then-verify pattern the dedup/ANN operators use,
applied to 1-D time. The arithmetic (floor division into buckets) is
deterministic, so a DuckDB inequality join is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(points: DataFrame, intervals: DataFrame,
               point_ts: str, start_col: str, end_col: str,
               bucket_width: int) -> DataFrame:
    """Inner interval-containment join (inclusive bounds), bucketed.

    ``point_ts``/``start_col``/``end_col`` must be numeric (epoch units —
    cast timestamps first); ``bucket_width`` is in the same units. Returns
    all point columns + all interval columns for each containment match.
    """
    p = points.withColumn(
        "__bucket", F.floor(F.col(point_ts) / bucket_width)
    )
    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_width),
                F.floor(F.col(end_col) / bucket_width),
            )
        ),
    )
    return (
        p.join(i, "__bucket")
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("__bucket")
    )


def interval_overlap(left: DataFrame, right: DataFrame,
                     l_start: str = "s_us", l_end: str = "e_us",
                     r_start: str = "h_us", r_end: str = "hend_us",
                     broadcast_right: bool = True) -> DataFrame:
    """Interval-overlap join: pair every left interval [l_start, l_end]
    (closed) with each right interval [r_start, r_end) (half-open) it
    intersects — the impact-analysis join (sessions × incident windows,
    jobs × maintenance windows).

    ``broadcast_right=True`` is the common case: the right side is a
    small derived window set, so the join is map-side with the range
    predicate applied in the stream — zero shuffle of the left side
    beyond its own lineage. For two BIG interval sets, pre-bucket both
    by time bin and equi-join on the bin instead (the blocking trick
    every distributed interval join uses); this helper is the
    broadcast-sized path. ``overlap_us`` is exact integer micros.
    """
    r = F.broadcast(right) if broadcast_right else right
    cond = (F.col(l_start) < F.col(r_end)) & (
        F.col(l_end) >= F.col(r_start)
    )
    return left.join(r, cond).withColumn(
        "overlap_us",
        F.greatest(
            F.lit(0),
            F.least(F.col(l_end), F.col(r_end) - F.lit(1))
            - F.greatest(F.col(l_start), F.col(r_start))
            + F.lit(1),
        ).cast("long"),
    )
