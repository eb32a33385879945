"""Data-quality audits: referential integrity, constraint checks, and
time-coverage gap detection.

The dbt-test / Great-Expectations role re-expressed for 100 TB inputs:
every check is a plain DataFrame aggregation or anti-join, so the whole
audit suite is a handful of shuffles and the report is check-cardinality
rows — safe to run as a gate before every downstream consumer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def count_check(df: DataFrame, name: str, predicate: Column) -> DataFrame:
    """One-row (check, violations) counting rows where ``predicate``
    holds (rows matching the predicate are VIOLATIONS). Map-side
    conditional sum + global aggregate — a scan-bounded constraint
    test."""
    return df.agg(
        F.sum(F.when(predicate, 1).otherwise(0)).alias("__v")
    ).select(
        F.lit(name).alias("check"),
        F.coalesce("__v", F.lit(0)).cast("long").alias("violations"),
    )


def orphan_check(child: DataFrame, parent: DataFrame, name: str,
                 child_key: str, parent_key: str) -> DataFrame:
    """One-row (check, violations): child rows whose key has no parent.

    A left-anti join keyed on the FK — one shuffle (or broadcast when
    the parent is a dimension); the canonical referential-integrity
    probe. Null child keys count as orphans (a null FK is a violation
    for required relationships)."""
    orphans = child.select(
        F.col(child_key).alias("__k")
    ).join(
        parent.select(F.col(parent_key).alias("__k")).distinct(),
        "__k",
        "left_anti",
    )
    return orphans.agg(F.count(F.lit(1)).alias("__v")).select(
        F.lit(name).alias("check"),
        F.coalesce("__v", F.lit(0)).cast("long").alias("violations"),
    )


def integrity_report(checks: Sequence[DataFrame]) -> DataFrame:
    """Union the one-row check outputs into the audit report
    (check, violations) — check-cardinality rows, any corpus size."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def coverage_gaps(events: DataFrame, ts_col: Column,
                  type_col: str = "event_type") -> DataFrame:
    """Per-type hourly coverage audit: (event_type, n_expected,
    n_observed, n_missing, first_missing_hour) against the GLOBAL
    [min, max] hour range.

    The freshness/completeness check a streaming ingest publishes: a
    missing hour means the pipeline dropped or stalled on that type.
    Scale shape: ONE corpus-scale rollup (type x hour, map-side
    combine); the expected-hour spine is generated per type FROM the
    global bounds (metadata-scale sequence explode, |types| x |hours|
    rows) and anti-joined against observed hours — the corpus is
    never rescanned."""
    hourly = (
        events.select(
            F.col(type_col).alias("event_type"),
            F.date_trunc("hour", ts_col).alias("hour"),
        )
        .groupBy("event_type", "hour")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    from arcane_framework_spark.operators.cache import scoped_persist
    from arcane_framework_spark.operators.scale import with_broadcast_scalar

    hourly = scoped_persist(hourly)
    bounds = hourly.groupBy().agg(
        F.min("hour").alias("__mn"), F.max("hour").alias("__mx")
    )
    types = hourly.select("event_type").distinct()
    spine = with_broadcast_scalar(types, bounds).select(
        "event_type",
        F.explode(
            F.sequence("__mn", "__mx", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    missing = spine.join(hourly, ["event_type", "hour"], "left_anti")
    per_type_missing = missing.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_missing"),
        F.min("hour").alias("first_missing_hour"),
    )
    per_type_observed = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_observed")
    )
    expected = with_broadcast_scalar(per_type_observed, bounds).select(
        "event_type",
        "n_observed",
        (
            F.floor(
                (F.unix_micros("__mx") - F.unix_micros("__mn"))
                / 3_600_000_000
            )
            + 1
        ).cast("long").alias("n_expected"),
    )
    return (
        expected.join(per_type_missing, "event_type", "left")
        .select(
            "event_type",
            "n_expected",
            "n_observed",
            F.coalesce("n_missing", F.lit(0)).cast("long").alias(
                "n_missing"
            ),
            F.date_format("first_missing_hour", "yyyy-MM-dd HH:00:00")
            .alias("first_missing_hour"),
        )
    )


#: Types whose min/max stringify identically across engines. Doubles are
#: EXCLUDED on purpose: '1.0' vs '1' formatting differs, and a profile
#: column is for humans — n_distinct still covers them.
PROFILE_MINMAX_TYPES = {"int", "bigint", "string"}


def profile_columns(df: DataFrame) -> DataFrame:
    """Schema profile: one row per column with null count, exact
    distinct count, and (for safely-stringifiable types) min/max — the
    first thing a pipeline runs against an unfamiliar 100 TB table
    (reference parity: extends the C7 field-count / C9 schema-hash
    contracts from a structural check to a content profile).

    ONE per-column aggregate, unioned: each branch scans exactly one
    parquet column (columnar pruning makes the total I/O one full-scan
    equivalent) and runs a standard two-phase distinct aggregate. This
    beats the single-aggregate multi-countDistinct form by ~8x: that
    plan Expands every row N_cols times into one wide sort-aggregate
    (measured 27.9s vs 3.4s on 600k-row lineitem). Branches execute as
    independent narrow jobs — at 100 TB each is a column scan, and the
    union output is N_cols rows. Timestamps stringify through an
    explicit UTC format so both engines render identically.

    Returns (col_name, n_null, n_distinct, min_val, max_val).
    """
    parts = []
    for f in df.schema.fields:
        c, t = f.name, f.dataType.simpleString()
        if t in PROFILE_MINMAX_TYPES:
            mn = F.min(c).cast("string")
            mx = F.max(c).cast("string")
        elif t in ("timestamp", "timestamp_ntz"):
            fmt = "yyyy-MM-dd HH:mm:ss"
            mn = F.date_format(F.min(c), fmt)
            mx = F.date_format(F.max(c), fmt)
        else:
            mn = F.lit(None).cast("string")
            mx = F.lit(None).cast("string")
        parts.append(
            df.select(c).agg(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_null"),
                F.countDistinct(c).cast("long").alias("n_distinct"),
                mn.alias("min_val"),
                mx.alias("max_val"),
            ).select(
                F.lit(c).alias("col_name"),
                "n_null",
                "n_distinct",
                "min_val",
                "max_val",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


#: k-anonymity threshold for the governance report.
K_ANON_K = 5


def k_anonymity_report(df: DataFrame, qi_cols: Sequence[Column],
                       k: int = K_ANON_K) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination: how many
    equivalence classes (distinct QI tuples) exist, and how many
    classes/rows sit below the ``k`` re-identification floor — the
    release gate a governance pipeline runs before publishing
    event-level data.

    One hash-aggregate onto class-cardinality rows, one 1-row summary
    aggregate — scan-bounded. Returns a single row (n_rows, n_classes,
    min_class_size, classes_below_k, rows_below_k).
    """
    classes = df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("__n"))
    return classes.agg(
        F.sum("__n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("__n").cast("long").alias("min_class_size"),
        F.sum(F.when(F.col("__n") < k, 1).otherwise(0))
        .cast("long")
        .alias("classes_below_k"),
        F.sum(F.when(F.col("__n") < k, F.col("__n")).otherwise(0))
        .cast("long")
        .alias("rows_below_k"),
    )
