"""Table-maintenance planning: small-file compaction over file metadata.

At 100 TB the silent killer is not one big query but millions of small
files: every incremental sink commit (reference: the ParquetSink's
per-batch ``part-*`` files, ``src/Sinks/Parquet/ParquetSink.cs``) adds a
few, and scan tasks, driver listing memory, and open-file overhead all
scale with file COUNT, not bytes. The fix is periodic compaction:
rewrite groups of small files into ~target-size files, partition by
partition.

This module plans that rewrite from a file-metadata table — (partition,
file id, size) rows, i.e. what a transaction log or ``LIST`` returns —
without touching data. Planning is pure window algebra, so it runs
distributed and the DuckDB oracle replays it exactly:

1. only files below ``small_file_threshold`` participate (already-compact
   files are left in place);
2. within a partition, eligible files are ordered ``(id % G, id)`` — the
   same deterministic-but-arbitrary order ``pack_documents`` uses — and
   a two-level prefix sum assigns ``group = floor(bytes_before /
   target_bytes)``: local windows per ``(partition, id % G)`` slice, a
   per-partition offset window over G-row totals, broadcast join back;
3. singleton groups are dropped (rewriting one file is a no-op).

Each surviving ``(partition, compaction_group)`` is one rewrite task of
~target_bytes input. No global sort, no driver listing: the widest
window sorts ``|partition|/G`` rows, offsets are metadata-scale
(partitions × G rows, windowed per partition — parallel across
partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from arcane_framework_spark.operators.packing import DEFAULT_PREFIX_GROUPS


def plan_compaction(files: DataFrame, target_bytes: int,
                    partition_col: str = "part",
                    id_col: str = "file_id",
                    size_col: str = "size",
                    small_file_threshold: int | None = None,
                    num_groups: int = DEFAULT_PREFIX_GROUPS) -> DataFrame:
    """Assign small files to ~target_bytes compaction groups per partition.

    Returns one row per file to rewrite: (partition, id, size,
    compaction_group, group_files, group_bytes), where ``group_files`` /
    ``group_bytes`` describe the file's whole group. Files at or above
    ``small_file_threshold`` (default: ``target_bytes``) and files whose
    group would contain only themselves are excluded — the plan lists
    exactly the work a compactor must do and nothing else.
    """
    threshold = (
        target_bytes if small_file_threshold is None else small_file_threshold
    )
    # File ids in the wild are PATH STRINGS ("part-00000.parquet"), not
    # numbers — `string % int` casts to null with ANSI off, nulling every
    # group and silently emptying the plan. Dispatch on the actual dtype:
    # numeric ids keep the cheap modulo (and the established oracle);
    # anything else hashes (md5-prefix -> int, bit-identical in DuckDB
    # as CAST(concat('0x', substring(md5(id), 1, 8)) AS BIGINT)).
    from pyspark.sql.types import (
        ByteType,
        IntegerType,
        LongType,
        ShortType,
    )

    id_dt = files.schema[id_col].dataType
    if isinstance(id_dt, (ByteType, ShortType, IntegerType, LongType)):
        grp = F.col(id_col) % num_groups
    else:
        grp = F.pmod(
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                16, 10,
            ).cast("long"),
            F.lit(num_groups),
        )
    base = files.select(
        F.col(partition_col).alias("part"),
        F.col(id_col).alias("id"),
        F.col(size_col).cast("long").alias("size"),
        grp.alias("__grp"),
    ).filter(F.col("size") < threshold)
    w_local = (
        Window.partitionBy("part", "__grp")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = base.withColumn(
        "__local_before", F.coalesce(F.sum("size").over(w_local), F.lit(0))
    )
    # Per-partition group offsets: G rows per table partition, windowed
    # per partition — parallel across partitions, tiny within one.
    from arcane_framework_spark.operators.scale import bucket_offsets

    offsets = bucket_offsets(
        base, ["part"], ["__grp"], ["__grp"], value=F.col("size")
    ).withColumnRenamed("__off", "__offset")
    assigned = local.join(F.broadcast(offsets), ["part", "__grp"]).select(
        "part",
        "id",
        "size",
        F.floor(
            (F.col("__local_before") + F.col("__offset")) / target_bytes
        ).cast("long").alias("compaction_group"),
    )
    groups = assigned.groupBy("part", "compaction_group").agg(
        F.count(F.lit(1)).alias("group_files"),
        F.sum("size").alias("group_bytes"),
    )
    return (
        assigned.join(groups, ["part", "compaction_group"])
        .filter(F.col("group_files") > 1)
        .select(
            F.col("part").alias(partition_col),
            F.col("id").alias(id_col),
            "size",
            "compaction_group",
            "group_files",
            "group_bytes",
        )
    )
