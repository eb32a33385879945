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
