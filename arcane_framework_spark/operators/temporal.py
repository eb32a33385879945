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
