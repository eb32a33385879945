"""Relational CDC operators (SURVEY.md §2.4, R1–R11), Spark-native.

The reference pushes all of these down as generated T-SQL to SQL Server
(src/Sources/SqlServer/SqlSnippets/GetSelectDeltaQuery.sql); here they are
first-class DataFrame operators so they run on any source at any scale.

Scale notes
-----------
- ``changes_since`` is a plain filter → predicate-pushdown eligible, no shuffle.
- ``delta_join`` shuffles both sides on the PK unless the change side is small
  enough to broadcast — callers pass ``broadcast_changes=True`` for
  low-change-rate ticks (the common CDC case), which turns a 100 TB-side
  shuffle into a map-side join.
- ``latest_state`` is a window dedup: one shuffle on the merge key. At scale
  prefer partitioned storage bucketed by merge key so AQE can skip the
  exchange; skew on hot keys is handled by AQE skew-join/salting upstream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from arcane_framework_spark.contracts.columns import (
    ARCANE_MERGE_KEY,
    SYS_CHANGE_OPERATION,
    SYS_CHANGE_VERSION,
)


def changes_since(df: DataFrame, version_column: str, last_version: int) -> DataFrame:
    """R1 — incremental scan filter: all changes with version > last_version.

    Reference form: ``CHANGETABLE (CHANGES t, {lastId})``
    (GetSelectDeltaQuery.sql:8). Expressed as a filter so Catalyst pushes it
    into the scan (parquet/JDBC ``PushedFilters``).
    """
    return df.filter(F.col(version_column) > F.lit(last_version))


def delta_join(changes: DataFrame, table: DataFrame, pk_columns: Sequence[str],
               op_column: str = SYS_CHANGE_OPERATION,
               broadcast_changes: bool = False) -> DataFrame:
    """R2 — delete-preserving equi-join of a change feed back to the table.

    The reference's delta query right-outer-joins CHANGETABLE rows to current
    row values so deleted keys survive with NULL payload
    (GetSelectDeltaQuery.sql:7-8, match builder
    SqlServerChangeTrackingSource.cs:289-310). From the change side that is a
    LEFT join: every change row is kept; 'D' rows keep NULL payload columns.

    Columns: PKs + bookkeeping from ``changes``, payload from ``table``.

    ``broadcast_changes=True`` is the scale path for the common CDC shape
    (small change tick, huge table): Spark cannot broadcast the *preserved*
    side of an outer join, so instead we shrink the table with a broadcast
    LEFT SEMI join on the PKs (map-side, no shuffle of the big table) and
    left-join the changes to that small matched subset — AQE then broadcasts
    the residual join too. Net cost: one pass over the table, zero big-side
    shuffles.
    """
    payload_cols = [c for c in table.columns if c not in set(pk_columns)]
    change_cols = list(changes.columns)
    if broadcast_changes:
        keys = F.broadcast(changes.select(*pk_columns).distinct())
        table = table.join(keys, on=list(pk_columns), how="left_semi")
    joined = changes.join(table, on=list(pk_columns), how="left")
    # Delete rows must not leak stale payload values (the reference emits NULL
    # payload for 'D' ops).
    is_delete = F.col(op_column) == F.lit("D")
    projected = [
        F.when(is_delete, F.lit(None)).otherwise(F.col(c)).alias(c)
        if c in payload_cols else F.col(c)
        for c in change_cols + payload_cols
    ]
    return joined.select(*projected)


def latest_state(df: DataFrame,
                 merge_key: str | Sequence[str] = ARCANE_MERGE_KEY,
                 version_column: str = SYS_CHANGE_VERSION,
                 op_column: str = SYS_CHANGE_OPERATION,
                 tie_breakers: Sequence[Column] | None = None,
                 drop_deletes: bool = True) -> DataFrame:
    """R11 — fold a change stream to latest state per merge key.

    The reference defines this contract for downstream MERGE consumers
    (merge key + SYS_CHANGE_VERSION/DML_Action, SURVEY.md §1.4); here it is
    executed natively: window by merge key, order by version desc, keep row 1,
    drop deletes.

    One shuffle on the merge key; with AQE the post-shuffle partition count
    adapts to the fold's actual output size.
    """
    keys = [merge_key] if isinstance(merge_key, str) else list(merge_key)
    order = [F.col(version_column).desc()]
    if tie_breakers:
        order.extend(tie_breakers)
    w = Window.partitionBy(*keys).orderBy(*order)
    folded = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    # Membership must be case-insensitive like Spark's own column resolution,
    # else the delete-filter silently no-ops on lowercase feeds.
    has_op = op_column.lower() in {c.lower() for c in df.columns}
    if drop_deletes and has_op:
        folded = folded.filter(F.col(op_column) != F.lit("D"))
    return folded


def project(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """R3/R10 — explicit projection & column alignment (order matters)."""
    return df.select(*columns)


def apply_changes_to_snapshot(snapshot: DataFrame, changes: DataFrame,
                              merge_key: str | Sequence[str] = ARCANE_MERGE_KEY,
                              version_column: str = SYS_CHANGE_VERSION,
                              op_column: str = SYS_CHANGE_OPERATION) -> DataFrame:
    """R11 consumer side — the MERGE the reference leaves to downstream.

    New snapshot = latest surviving row per merge key across (current
    snapshot ∪ change batch): updates replace, inserts append, deletes
    remove. Implemented as a union + ``latest_state`` fold, so it is the
    same one-shuffle window dedup regardless of change-batch size; snapshot
    rows that lack CDC columns are treated as version −1 inserts (any real
    change outranks them).

    On Delta/Iceberg storage this maps to a native ``MERGE INTO``; for plain
    parquet use ``upsert_parquet_snapshot`` which rewrites atomically.
    """
    cols = set(snapshot.columns)
    if version_column not in cols:
        snapshot = snapshot.withColumn(version_column, F.lit(-1).cast("long"))
    if op_column not in cols:
        snapshot = snapshot.withColumn(op_column, F.lit("I"))
    ordered = changes.select(*snapshot.columns)
    return latest_state(
        snapshot.unionByName(ordered),
        merge_key=merge_key,
        version_column=version_column,
        op_column=op_column,
        drop_deletes=True,
    )


def upsert_parquet_snapshot(spark, path: str, changes: DataFrame,
                            merge_key: str | Sequence[str] = ARCANE_MERGE_KEY,
                            version_column: str = SYS_CHANGE_VERSION,
                            op_column: str = SYS_CHANGE_OPERATION) -> DataFrame:
    """Fold a change batch into a parquet snapshot directory via full rewrite.

    Writes the merged state to a staging dir, then swaps it in with
    ``os.replace``. HONEST LIMITS: the swap is atomic only on a POSIX
    filesystem — on S3-style object stores a directory "rename" is a
    copy-then-delete and is NOT atomic, and the rewrite itself is
    O(snapshot) per batch. This is the dependency-free fallback for tests
    and small snapshots. In production, point the pipeline at a table format
    with a real MERGE: the (merge_key, version, op) contract here maps 1:1
    onto Delta Lake's ``MERGE INTO target USING changes ON
    target.key = changes.key WHEN MATCHED AND changes.op = 'D' THEN DELETE
    WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED AND changes.op <> 'D'
    THEN INSERT *`` (or the Iceberg equivalent) — O(changed files),
    snapshot-isolated, object-store safe. delta-spark is not installable in
    this environment, so that path ships as documentation + the identical
    fold semantics in ``apply_changes_to_snapshot`` (oracle-checked).
    For date-partitioned snapshots, ``upsert_partitioned_snapshot`` below
    rewrites only the touched partitions — use it whenever the layout
    allows. Returns the new snapshot.
    """
    import os
    import shutil
    import uuid

    if os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    ):
        current = spark.read.parquet(path)
        merged = apply_changes_to_snapshot(
            current, changes, merge_key, version_column, op_column
        )
    else:
        merged = latest_state(
            changes, merge_key=merge_key, version_column=version_column,
            op_column=op_column, drop_deletes=True,
        )
    staging = f"{path.rstrip('/')}__stage_{uuid.uuid4().hex}"
    merged.write.mode("overwrite").parquet(staging)
    backup = f"{path.rstrip('/')}__old_{uuid.uuid4().hex}"
    if os.path.exists(path):
        os.replace(path, backup)
    os.replace(staging, path)
    shutil.rmtree(backup, ignore_errors=True)
    return spark.read.parquet(path)


def scd2_history(changes: DataFrame,
                 merge_key: str | Sequence[str] = ARCANE_MERGE_KEY,
                 version_column: str = SYS_CHANGE_VERSION,
                 op_column: str = SYS_CHANGE_OPERATION) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change feed.

    The canonical warehouse CONSUMER of the reference's merge-key contract
    (§1.4): every non-delete change becomes a history row valid over
    ``[valid_from, valid_to)`` in version space; the next change for the
    key (update OR delete) closes the interval; ``valid_to`` null marks
    the current row, and a closing delete leaves the key with no current
    row. One shuffle (the per-key version window) regardless of history
    depth.
    """
    keys = [merge_key] if isinstance(merge_key, str) else list(merge_key)
    w = Window.partitionBy(*keys).orderBy(version_column)
    return (
        changes.withColumn(
            "valid_from", F.col(version_column)
        )
        .withColumn("valid_to", F.lead(version_column).over(w))
        .filter(F.col(op_column) != "D")
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def delta_merge_available() -> bool:
    """True when the delta-spark package (and its JVM jars) are importable."""
    try:
        import delta  # noqa: F401
        return True
    except ImportError:
        return False


def upsert_delta_snapshot(spark, path: str, changes: DataFrame,
                          merge_key: str | Sequence[str] = ARCANE_MERGE_KEY,
                          version_column: str = SYS_CHANGE_VERSION,
                          op_column: str = SYS_CHANGE_OPERATION) -> DataFrame:
    """R11 consumer via a REAL ``MERGE INTO`` on a Delta table.

    The (merge_key, version, op) contract maps 1:1 onto Delta's MERGE:

    - matched ∧ op='D' ∧ newer-or-equal version → DELETE
    - matched ∧ newer-or-equal version → UPDATE SET *
    - not matched ∧ op≠'D' → INSERT *

    BOTH matched clauses carry the version guard: a replayed or
    out-of-order batch containing a stale delete must not remove a row a
    newer batch already wrote — the higher version wins, exactly as in
    ``latest_state``/``apply_changes_to_snapshot``.

    Unlike ``upsert_parquet_snapshot`` (full rewrite, POSIX-rename
    atomicity) this is O(changed files), snapshot-isolated, and
    object-store safe — the production path whenever Delta is on the
    classpath (reference SqlServerChangeTrackingSource.cs:312-319 leaves
    exactly this merge to the downstream table format).

    The change batch is pre-folded with ``latest_state`` (keeping delete
    markers) so at most one row per key reaches the MERGE — Delta rejects
    multi-match sources, and the fold is the same one-shuffle window dedup
    the batch consumer already uses. Raises ImportError when delta-spark
    is absent (see ``delta_merge_available``); callers fall back to the
    parquet rewrite paths.
    """
    from delta.tables import DeltaTable  # ImportError → caller falls back

    keys = [merge_key] if isinstance(merge_key, str) else list(merge_key)
    batch = latest_state(
        changes, merge_key=merge_key, version_column=version_column,
        op_column=op_column, drop_deletes=False,
    )
    if not DeltaTable.isDeltaTable(spark, path):
        batch.filter(F.col(op_column) != "D").write.format("delta").mode(
            "overwrite"
        ).save(path)
        return spark.read.format("delta").load(path)
    target = DeltaTable.forPath(spark, path)
    cond = " AND ".join(f"t.`{k}` = s.`{k}`" for k in keys)
    (
        target.alias("t")
        .merge(batch.alias("s"), cond)
        .whenMatchedDelete(
            condition=(
                f"s.`{op_column}` = 'D'"
                f" AND s.`{version_column}` >= t.`{version_column}`"
            )
        )
        .whenMatchedUpdateAll(
            condition=f"s.`{version_column}` >= t.`{version_column}`"
        )
        .whenNotMatchedInsertAll(condition=f"s.`{op_column}` <> 'D'")
        .execute()
    )
    return spark.read.format("delta").load(path)


def upsert_partitioned_snapshot(spark, path: str, changes: DataFrame,
                                partition_col: str,
                                merge_key: str | Sequence[str] = ARCANE_MERGE_KEY,
                                version_column: str = SYS_CHANGE_VERSION,
                                op_column: str = SYS_CHANGE_OPERATION) -> DataFrame:
    """Fold a change batch into a *partitioned* parquet snapshot, rewriting
    only the partitions the batch touches — O(changed partitions) per tick,
    not O(snapshot) like ``upsert_parquet_snapshot``.

    How the pruning works, end to end:

    1. the snapshot read is semi-joined to the batch's distinct partition
       values (broadcast) — Spark's dynamic partition pruning turns that
       into a partition-directory skip at scan time, so untouched
       partitions are never read;
    2. the merge itself is ``apply_changes_to_snapshot`` (the oracle-checked
       R11 fold) over the pruned snapshot only;
    3. the write uses ``partitionOverwriteMode=dynamic``, Spark's native
       partition-scoped commit: only partitions present in the merged
       output are replaced, untouched partition directories are not
       rewritten (their files keep their identity — asserted in tests);
    4. partitions whose rows were ALL deleted produce no output rows, which
       dynamic overwrite would leave stale — they are removed explicitly.

    The partition-value lists collected here are plan-time metadata bounded
    by the partition layout (the same cardinality a Hive metastore listing
    returns), never row data — the data path stays fully distributed.

    Requires ``changes`` to carry ``partition_col`` (CDC feeds built by
    ``with_date_partition`` do; see contracts/columns.py R5). Same
    honest-atomicity caveats as ``upsert_parquet_snapshot``: per-partition
    replacement is atomic on POSIX renames, not on S3-style stores — route
    production through a table format with a real MERGE.
    """
    import os
    import shutil

    affected = changes.select(partition_col).distinct()
    exists = os.path.isdir(path) and any(
        not f.startswith(("_", ".")) for f in os.listdir(path)
    )
    if exists:
        current = spark.read.parquet(path).join(
            F.broadcast(affected), partition_col, "semi"
        )
        merged = apply_changes_to_snapshot(
            current, changes, merge_key, version_column, op_column
        )
    else:
        merged = latest_state(
            changes, merge_key=merge_key, version_column=version_column,
            op_column=op_column, drop_deletes=True,
        )

    merged = merged.persist()
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)

    # Plan-time metadata (≤ #affected partitions values each, not row data):
    # partitions that lost all rows must be dropped explicitly, because
    # dynamic overwrite only replaces partitions it writes. Surviving
    # partitions come from the MERGED output (computed before looking at
    # the rewritten directory — a fully-deleted partition's stale files
    # would otherwise masquerade as survivors).
    touched = {r[0] for r in affected.collect()}
    surviving = {r[0] for r in merged.select(partition_col).distinct().collect()}
    merged.unpersist()
    for value in touched - surviving:
        shutil.rmtree(
            os.path.join(path, f"{partition_col}={value}"), ignore_errors=True
        )
    return spark.read.parquet(path)


def snapshot_diff(old: DataFrame, new: DataFrame,
                  keys: Sequence[str],
                  compare_cols: Sequence[str] | None = None) -> DataFrame:
    """Derive a change feed by diffing two snapshots of the same table:
    one row per inserted / deleted / updated key (unchanged rows are
    dropped). The inverse of `apply_changes_to_snapshot` — produces the
    change stream the reference *consumes* (SqlServerChangeTrackingSource,
    `src/Sources/SqlServer/SqlServerChangeTrackingSource.cs`) when the
    upstream system can't emit one itself.

    Output: key columns, ``change_type`` ('insert'|'update'|'delete'),
    then the compared columns valued from NEW for insert/update and OLD
    for delete.

    Scale shape: ONE full-outer shuffle join co-partitioned on the key —
    the minimum possible data movement for a diff; AQE handles skewed
    keys. Column comparison is null-safe (`eqNullSafe` / IS NOT DISTINCT
    FROM) and happens post-join in codegen.
    """
    compare_cols = list(
        compare_cols
        if compare_cols is not None
        else [c for c in new.columns if c not in keys]
    )
    o = old.select(*keys, *compare_cols).alias("o")
    n = new.select(*keys, *compare_cols).alias("n")
    cond = [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in keys]
    joined = o.join(n, cond, "full_outer")
    new_present = F.col(f"n.{keys[0]}").isNotNull()
    old_present = F.col(f"o.{keys[0]}").isNotNull()
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    change_type = (
        F.when(~old_present, F.lit("insert"))
        .when(~new_present, F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    return (
        joined.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k)
                for k in keys
            ],
            "change_type",
            *[
                F.when(new_present, F.col(f"n.{c}"))
                .otherwise(F.col(f"o.{c}"))
                .alias(c)
                for c in compare_cols
            ],
        )
    )
