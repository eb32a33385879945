"""T-SQL generators for the JDBC pushdown path (S2 on a real SQL Server).

The reference executes its CDC semantics as generated T-SQL inside SQL
Server (templates under src/Sources/SqlServer/SqlSnippets/, expression
builders SqlServerChangeTrackingSource.cs:289-335); with Spark the same
pushdown is achieved by handing these generated queries to
``spark.read.jdbc(query=...)`` — the changes⋈table join, merge-key hash and
partition expression all evaluate server-side and Spark sees only the
result relation. Semantics (not text) follow the reference:

- merge key = ``lower(hex(sha2_256('#'-joined nvarchar casts of the PKs)))``
  — nvarchar means the hashed bytes are UTF-16LE, which is also the default
  encoding of the engine-side ``merge_key_expr`` (contracts/columns.py), so
  the two paths are byte-identical out of the box (golden hash test in
  tests/test_contracts.py pins both to the same value)
- full load synthesizes version 0 / operation 'I'
- delta reads ``CHANGETABLE(CHANGES ..., last_version)`` left-joined to the
  live table so deletes survive with NULL payload
- PK discovery joins INFORMATION_SCHEMA constraint views
"""

from __future__ import annotations


def _bracket(name: str) -> str:
    return f"[{name}]"


def _qualified(schema: str, table: str) -> str:
    return f"{_bracket(schema)}.{_bracket(table)}"


def merge_key_sql(pk_columns: list[str], alias: str = "") -> str:
    """T-SQL expression for ARCANE_MERGE_KEY over the PK columns."""
    prefix = f"{alias}." if alias else ""
    casts = " + '#' + ".join(
        f"cast({prefix}{_bracket(c)} as nvarchar(128))" for c in pk_columns
    )
    return f"lower(convert(nvarchar(128), HashBytes('SHA2_256', {casts}), 2))"


def plain_select_query(catalog: str, schema: str, table: str) -> str:
    """S1 polling query: plain ``SELECT *`` over the three-part table name.

    Mirrors ``SqlServerSource.GetQuery()`` (SqlServerSource.cs:103-107) —
    the simple source has no merge key, CDC columns, or watermark; it just
    re-reads the table per tick.
    """
    return f"SELECT * FROM {_bracket(catalog)}.{_qualified(schema, table)}"


def select_all_query(schema: str, table: str, pk_columns: list[str],
                     columns: list[str],
                     partition_expression: str | None = None) -> str:
    """Full-load (backfill) query: table snapshot + synthesized CDC columns."""
    cols = ", ".join(_bracket(c) for c in columns)
    parts = [
        f"SELECT {cols}",
        f"{merge_key_sql(pk_columns)} as [ARCANE_MERGE_KEY]",
        "0 as [SYS_CHANGE_VERSION]",
        "'I' as [SYS_CHANGE_OPERATION]",
    ]
    if partition_expression:
        parts.append(f"{partition_expression} as [DATE_PARTITION_KEY]")
    return ", ".join(parts) + f" FROM {_qualified(schema, table)}"


def select_delta_query(schema: str, table: str, pk_columns: list[str],
                       payload_columns: list[str], last_version: int,
                       partition_expression: str | None = None) -> str:
    """Incremental query: CHANGETABLE delta left-joined to live rows.

    Delete rows keep NULL payload (the join misses); the change side always
    supplies the PKs, version, and operation.
    """
    on = " AND ".join(
        f"ct.{_bracket(c)} = tq.{_bracket(c)}" for c in pk_columns
    )
    pk_cols = ", ".join(f"ct.{_bracket(c)}" for c in pk_columns)
    payload = ", ".join(f"tq.{_bracket(c)}" for c in payload_columns)
    parts = [
        f"SELECT {pk_cols}",
        payload,
        "ct.[SYS_CHANGE_VERSION] as [SYS_CHANGE_VERSION]",
        "ct.[SYS_CHANGE_OPERATION] as [SYS_CHANGE_OPERATION]",
        f"{merge_key_sql(pk_columns, 'ct')} as [ARCANE_MERGE_KEY]",
        "CHANGE_TRACKING_CURRENT_VERSION() as [ChangeTrackingVersion]",
    ]
    if partition_expression:
        parts.append(f"{partition_expression} as [DATE_PARTITION_KEY]")
    select = ", ".join(p for p in parts if p)
    return (
        f"{select} FROM CHANGETABLE(CHANGES {_qualified(schema, table)}, "
        f"{last_version}) as ct LEFT JOIN {_qualified(schema, table)} as tq "
        f"ON {on}"
    )


def pk_discovery_query(schema: str, table: str) -> str:
    """PK-column discovery via INFORMATION_SCHEMA (R9), one row per PK col."""
    return (
        "SELECT kcu.COLUMN_NAME FROM "
        "INFORMATION_SCHEMA.TABLE_CONSTRAINTS tc "
        "JOIN INFORMATION_SCHEMA.KEY_COLUMN_USAGE kcu "
        "ON tc.CONSTRAINT_NAME = kcu.CONSTRAINT_NAME "
        "AND tc.TABLE_SCHEMA = kcu.TABLE_SCHEMA "
        "AND tc.TABLE_NAME = kcu.TABLE_NAME "
        "WHERE tc.CONSTRAINT_TYPE = 'PRIMARY KEY' "
        f"AND tc.TABLE_SCHEMA = '{schema}' AND tc.TABLE_NAME = '{table}' "
        "ORDER BY kcu.ORDINAL_POSITION"
    )


def min_commit_version_query(last_version: int, lookback_seconds: int) -> str:
    """Watermark discovery: earliest commit after the checkpoint (T2/T3).

    Two-branch shape mirroring the reference's
    ``GetChangeTrackingVersion`` (SqlServerChangeTrackingSource.cs:271-287):
    cold start (``last_version <= 0``) bounds the scan by the lookback
    window on ``commit_time``; a warm tick filters ``commit_ts`` strictly
    past the checkpoint. Executed by
    ``ChangeTrackingSource.resolve_start_version`` each tick; a NULL/None
    result means "no commits yet" and the tick reads nothing.
    """
    if last_version <= 0:
        return (
            "SELECT MIN(commit_ts) FROM sys.dm_tran_commit_table "
            "WHERE commit_time > "
            f"DATEADD(second, -{lookback_seconds}, SYSUTCDATETIME())"
        )
    return (
        "SELECT MIN(commit_ts) FROM sys.dm_tran_commit_table "
        f"WHERE commit_ts > {last_version}"
    )
