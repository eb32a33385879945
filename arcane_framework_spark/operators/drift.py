"""Distribution-drift monitoring between two time windows of a stream.

The datacard question "did the event mix change?" answered without
transcendental math: the per-key drift metric is the total-variation
contribution |p_early - p_late| (KL/PSI need log(), whose last-ulp
behavior differs across libms and would break oracle parity; TVD is
exact rational arithmetic until the final fixed-point rounding).

Scale shape: ONE corpus-scale aggregation (groupBy key x window-half
with map-side combine); the midpoint boundary and the per-half totals
are computed IN-PLAN (broadcast scalars), so there is no driver-side
action and the plan is replayable/incremental.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from arcane_framework_spark.operators.scale import with_broadcast_scalar


def distribution_drift(events: DataFrame, ts_micros_col: Column,
                       key_col: str = "event_type") -> DataFrame:
    """Per-key drift between the early and late half of the time range:
    (key, n_early, n_late, share_early, share_late, tvd_contrib).

    The boundary is the midpoint of [min(ts), max(ts)] in epoch micros —
    integer arithmetic, so both engines agree exactly. An event at the
    exact midpoint lands in the late half. ``tvd_contrib`` halves sum to
    the total-variation distance between the two empirical distributions.
    """
    base = events.select(
        F.col(key_col).alias("key"), ts_micros_col.alias("__us")
    )
    bounds = base.select(
        F.min("__us").alias("__mn"), F.max("__us").alias("__mx")
    )
    # 2*us < mn+mx avoids division entirely — pure int64 comparison, no
    # engine-specific integer-vs-float division semantics in the oracle.
    halves = with_broadcast_scalar(base, bounds).select(
        "key",
        (
            F.lit(2) * F.col("__us") < F.col("__mn") + F.col("__mx")
        ).alias("__early"),
    )
    counts = halves.groupBy("key").agg(
        F.sum(F.when(F.col("__early"), 1).otherwise(0)).cast("long").alias(
            "n_early"
        ),
        F.sum(F.when(F.col("__early"), 0).otherwise(1)).cast("long").alias(
            "n_late"
        ),
    )
    return drift_finalize(counts.withColumnRenamed("key", key_col), key_col)


def drift_finalize(counts: DataFrame,
                   key_col: str = "event_type") -> DataFrame:
    """Shares + TVD contributions from a (key, n_early, n_late) table.

    Shared by the batch operator and the streaming twin (whose counts
    come from a drained streaming aggregation) so the fixed-point
    contract lives in exactly one place. ``counts`` is key-cardinality
    rows, so the totals scalar and the final select are metadata-scale.
    """
    totals = counts.groupBy().agg(
        F.sum("n_early").alias("__te"), F.sum("n_late").alias("__tl")
    )
    p = F.col("n_early") / F.col("__te")
    q = F.col("n_late") / F.col("__tl")
    return with_broadcast_scalar(counts, totals).select(
        F.col(key_col),
        "n_early",
        "n_late",
        (F.floor(p * 1e6 + F.lit(0.5)) / 1e6).alias("share_early"),
        (F.floor(q * 1e6 + F.lit(0.5)) / 1e6).alias("share_late"),
        (F.floor(F.abs(p - q) * 1e6 + F.lit(0.5)) / 1e6).alias(
            "tvd_contrib"
        ),
    )


#: Iglewicz–Hoaglin robust z-score: consistency constant and flag cutoff.
MAD_CONSISTENCY = 0.6745
MAD_CUTOFF = 3.5


def mad_outliers(df: DataFrame, value_col: str = "value",
                 key_col: str = "event_type",
                 id_col: str = "event_id",
                 cutoff: float = MAD_CUTOFF) -> DataFrame:
    """Robust per-group outlier flags: modified z-score
    ``0.6745·(x − median) / MAD`` with |z| > cutoff (Iglewicz & Hoaglin
    1993). Mean/stddev anomaly scores break down exactly when outliers
    are present (masking); median/MAD have a 50% breakdown point — this
    is the quality-filter a metrics stream or a reward-signal column
    gets before training on it.

    Two exact-percentile passes (per-group sort aggregates — right up to
    millions of rows per group, swap in approx_percentile's t-digest
    beyond), each joined back via broadcast (group-cardinality tables).
    Groups with MAD = 0 (>50% identical values) flag nothing — the
    z-score is undefined there, identically in both engines. The cutoff
    compares the UNROUNDED score; output z is fixed-point 6dp (floor
    half-up, negative-safe).

    Returns flagged rows only: (id, key, value, z).
    """
    med = df.groupBy(key_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("__med")
    )
    dev = df.join(F.broadcast(med), key_col)
    mad = dev.groupBy(key_col).agg(
        F.expr(f"percentile(abs({value_col} - __med), 0.5)").alias("__mad")
    )
    z = (
        F.lit(MAD_CONSISTENCY)
        * (F.col(value_col) - F.col("__med"))
        / F.col("__mad")
    )
    return (
        dev.join(F.broadcast(mad), key_col)
        .filter((F.col("__mad") > 0) & (F.abs(z) > F.lit(cutoff)))
        .select(
            id_col,
            key_col,
            value_col,
            (F.floor(z * F.lit(1e6) + F.lit(0.5)) / 1e6).alias("z"),
        )
    )


#: Winsorization clip quantiles.
WINSOR_LO = 0.01
WINSOR_HI = 0.99


def winsorized_stats(df: DataFrame, value_col: str = "value",
                     key_col: str = "event_type",
                     lo_q: float = WINSOR_LO,
                     hi_q: float = WINSOR_HI) -> DataFrame:
    """Per-group raw vs winsorized mean: clip at the [lo_q, hi_q]
    exact percentiles, report both means + how many rows were clipped —
    the standard heavy-tail-robust aggregate for reward/metric columns
    (one fat-fingered value stops moving the mean).

    One percentile pass (group-cardinality output, broadcast back), one
    value pass. Both means are fixed-pointed to micro-units PER ROW and
    summed as longs, so the result is partitioning-independent and
    engine-exact. Returns (key, n, lo, hi, n_clipped, mean_raw,
    mean_winsorized).
    """
    cuts = df.groupBy(key_col).agg(
        F.expr(f"percentile({value_col}, {lo_q!r})").alias("__lo"),
        F.expr(f"percentile({value_col}, {hi_q!r})").alias("__hi"),
    )
    v = F.col(value_col)
    clipped = F.least(F.greatest(v, F.col("__lo")), F.col("__hi"))
    fp = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("long")  # noqa: E731
    agg = (
        df.join(F.broadcast(cuts), key_col)
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("__lo").alias("__lo"),
            F.min("__hi").alias("__hi"),
            F.sum(
                F.when((v < F.col("__lo")) | (v > F.col("__hi")), 1)
                .otherwise(0)
            ).cast("long").alias("n_clipped"),
            F.sum(fp(v)).alias("__sr"),
            F.sum(fp(clipped)).alias("__sw"),
        )
    )
    mean6 = lambda s: (  # noqa: E731
        F.floor(F.col(s).cast("double") / F.col("n").cast("double") + F.lit(0.5))
        / 1e6
    )
    return agg.select(
        key_col,
        "n",
        (F.floor(F.col("__lo") * F.lit(1e6) + F.lit(0.5)) / 1e6).alias("lo"),
        (F.floor(F.col("__hi") * F.lit(1e6) + F.lit(0.5)) / 1e6).alias("hi"),
        "n_clipped",
        mean6("__sr").alias("mean_raw"),
        mean6("__sw").alias("mean_winsorized"),
    )
