"""Blob/file-listing source (S5, SURVEY.md §2.1).

Reference: src/Sources/BlobStorage/BlobStorageSource.cs:19-139 — emits blob
*names* under a prefix, re-listing every interval, dedup left to the
consumer. In Spark the name-only listing is a metadata-column projection over
the file source; streaming discovery+checkpointing of new files is native.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def blob_listing(spark: SparkSession, path: str,
                 glob: str | None = None,
                 modified_after: str | None = None) -> DataFrame:
    """Batch listing: (path, size, modification_time) under a prefix.

    Uses the ``binaryFile`` source but projects only ``_metadata`` columns —
    Spark prunes the content column, so no file bytes are read (R7/R8
    filters map to ``pathGlobFilter``/``modifiedAfter`` scan options).
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if modified_after:
        reader = reader.option("modifiedAfter", modified_after)
    return reader.load(path).select(
        F.col("path").alias("blob_name"),
        F.col("length").alias("size"),
        F.col("modificationTime").alias("last_modified"),
    )


def blob_listing_stream(spark: SparkSession, path: str,
                        glob: str | None = None) -> DataFrame:
    """Streaming listing: new files under the prefix per micro-batch.

    The file source's checkpoint replaces the reference's re-poll loop and
    its client-side max(LastModified) watermark (CdmChangeFeedSource.cs:302).
    """
    reader = spark.readStream.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path).select(
        F.col("path").alias("blob_name"),
        F.col("length").alias("size"),
        F.col("modificationTime").alias("last_modified"),
    )
