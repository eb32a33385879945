"""Well-known column contracts (SURVEY.md §1.4).

The reference engine's core data contract is a handful of synthesized columns
that make downstream MERGE consumers possible:

- ``ARCANE_MERGE_KEY`` — deterministic upsert key:
  ``lower(hex(sha2_256(concat_ws('#', cast(pk_i as string)...))))``
  (reference: src/Sources/SqlServer/SqlSnippets/GetSelectAllQuery.sql:6,
  src/Sources/SqlServer/SqlServerChangeTrackingSource.cs:312-319; golden hash
  test test/Sources/SqlServerChangeTrackingSourceTests.cs:73-91).
- ``DATE_PARTITION_KEY`` — value of a user-supplied SQL expression
  (reference: src/Sinks/Parquet/Models/Constants.cs:21,
  SqlSnippets/GetSelectAllQuery_date_partitioned.sql:7).
- ``SYS_CHANGE_VERSION`` / ``SYS_CHANGE_OPERATION`` — CDC version + op
  (I/U/D); full loads synthesize ``0`` / ``'I'``
  (reference: SqlServerChangeTrackingSource.cs:321-349).

All are plain Column expressions — they stay inside whole-stage codegen and
cost one projection, no shuffle, at any scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ARCANE_MERGE_KEY = "ARCANE_MERGE_KEY"
ARCANE_MERGE_KEY_NAME = "ARCANE_MERGE_KEY_NAME"  # parquet metadata key (Constants.cs:11)
DATE_PARTITION_KEY = "DATE_PARTITION_KEY"
SYS_CHANGE_VERSION = "SYS_CHANGE_VERSION"
SYS_CHANGE_OPERATION = "SYS_CHANGE_OPERATION"

#: Default merge-key separator, matching the reference's `+ '#' +` concat
#: (SqlServerChangeTrackingSource.cs:312-319).
MERGE_KEY_SEPARATOR = "#"


def merge_key_expr(pk_columns: Sequence[str | Column],
                   encoding: str = "UTF-8") -> Column:
    """SHA-256 upsert key over the primary-key columns.

    Equivalent to the reference T-SQL
    ``lower(convert(nvarchar(128), HashBytes('SHA2_256', cast(pk1 as
    nvarchar(128)) + '#' + ...), 2))``.

    ``encoding``: T-SQL hashes the *nvarchar* bytes, i.e. UTF-16LE — pass
    ``encoding="UTF-16LE"`` for bit-exact parity with the reference (golden:
    sha256(UTF-16LE('88888')) =
    ``cc2b36e9f63cdbf5baa90d8eeb0d8edfae3017b137ff2c94ef9d9436bac760f0``,
    reference test/Sources/SqlServerChangeTrackingSourceTests.cs:73-91).
    The default UTF-8 produces the same key universe with the portable
    ``lower(sha256(concat_ws('#', ...)))`` formula any engine can recompute.
    """
    casts = [
        (F.col(c) if isinstance(c, str) else c).cast("string")
        for c in pk_columns
    ]
    concat = F.concat_ws(MERGE_KEY_SEPARATOR, *casts)
    if encoding.upper().replace("-", "") == "UTF8":
        # sha2 already yields lowercase hex; lower() kept for contract clarity.
        return F.lower(F.sha2(concat, 256))
    return F.lower(F.sha2(F.encode(concat, encoding), 256))


def with_merge_key(df: DataFrame, pk_columns: Sequence[str],
                   column_name: str = ARCANE_MERGE_KEY,
                   encoding: str = "UTF-8") -> DataFrame:
    """Attach the deterministic merge key (narrow projection, no shuffle)."""
    return df.withColumn(column_name, merge_key_expr(pk_columns, encoding))


def with_date_partition(df: DataFrame, expression: str,
                        column_name: str = DATE_PARTITION_KEY) -> DataFrame:
    """Attach ``DATE_PARTITION_KEY`` from an arbitrary SQL expression.

    The reference evaluates a user-supplied T-SQL expression per-row (e.g.
    ``format(getdate(), 'yyyyMM')``); here it's any Spark SQL expression,
    e.g. ``date_format(current_date(), 'yyyyMM')`` or
    ``date_format(o_orderdate, 'yyyyMM')``.
    """
    return df.withColumn(column_name, F.expr(expression))


def with_change_defaults(df: DataFrame, version: int = 0,
                         operation: str = "I") -> DataFrame:
    """Synthesize CDC bookkeeping columns for a full (backfill) load.

    Mirrors the reference's full-load query which emits ``0`` /
    ``'I'`` constants (SqlServerChangeTrackingSource.cs:321-349).
    """
    out = df
    if SYS_CHANGE_VERSION not in df.columns:
        out = out.withColumn(SYS_CHANGE_VERSION, F.lit(version).cast("long"))
    if SYS_CHANGE_OPERATION not in out.columns:
        out = out.withColumn(SYS_CHANGE_OPERATION, F.lit(operation))
    return out
