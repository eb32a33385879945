"""Deterministic sampling / dataset splitting for training pipelines.

``sample()``/``randomSplit()`` are seed-dependent and partition-order
sensitive — rerunning on a re-partitioned corpus moves documents between
train and validation, which silently contaminates evals. The pipeline-grade
primitive is HASH splitting: the split is a pure function of the row's key,
so it is stable across runs, engines, partitionings, and incremental
arrivals (a new doc lands in the same split forever).

Mechanics: ``md5(salt || '#' || key)`` is uniform over hex strings; the
first 8 hex chars compared LEXICALLY against precomputed hex thresholds
partition [0, 16^8) into the requested fractions. String comparison on hex
is identical in every engine — the DuckDB oracle replays it verbatim.
Map-side only: no shuffle, no state, any scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default corpus split — tweak per pipeline.
DEFAULT_SPLITS: dict[str, float] = {"train": 0.8, "val": 0.1, "test": 0.1}


def _hex_thresholds(splits: dict[str, float]) -> list[tuple[str, str]]:
    """[(split_name, upper_hex_bound)] with cumulative 8-hex-digit bounds."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    out, acc = [], 0.0
    for name, frac in splits.items():
        acc += frac
        bound = min(int(acc * 16 ** 8), 16 ** 8 - 1)
        out.append((name, format(bound, "08x")))
    return out


def split_expr(key_cols: Sequence[str | Column],
               splits: dict[str, float] | None = None,
               salt: str = "split") -> Column:
    """Split-name column from a deterministic hash of the key columns.

    ``salt`` namespaces independent splits of the same corpus (choose a new
    salt to re-shuffle); same salt + key ⇒ same split, forever.
    """
    splits = splits or DEFAULT_SPLITS
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    bucket = F.substring(
        F.md5(F.concat_ws("#", F.lit(salt), *[c.cast("string") for c in cols])),
        1,
        8,
    )
    # Build the when-chain inside-out: the innermost branch is the LAST
    # split; each earlier split claims buckets below its upper bound.
    expr: Column | None = None
    for name, bound in reversed(_hex_thresholds(splits)):
        expr = (
            F.lit(name)
            if expr is None
            else F.when(bucket >= F.lit(bound), expr).otherwise(F.lit(name))
        )
    return expr


def with_split(df: DataFrame, key_cols: Sequence[str],
               splits: dict[str, float] | None = None,
               salt: str = "split", column_name: str = "split") -> DataFrame:
    """Attach the deterministic split assignment (map-side projection)."""
    return df.withColumn(column_name, split_expr(key_cols, splits, salt))


def split_sql(key_sql: str, splits: dict[str, float] | None = None,
              salt: str = "split") -> str:
    """The identical assignment as a SQL CASE (the DuckDB oracle half)."""
    splits = splits or DEFAULT_SPLITS
    bucket = f"substr(md5('{salt}' || '#' || {key_sql}), 1, 8)"
    thresholds = _hex_thresholds(splits)
    cases = " ".join(
        f"WHEN {bucket} < '{bound}' THEN '{name}'"
        for name, bound in thresholds[:-1]
    )
    return f"CASE {cases} ELSE '{thresholds[-1][0]}' END"
