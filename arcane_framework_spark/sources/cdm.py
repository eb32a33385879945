"""Microsoft CDM change-feed source (S3, SURVEY.md §2.1).

Reference: src/Sources/CdmChangeFeedSource/CdmChangeFeedSource.cs:34-419.
Layout on (blob) storage::

    <root>/ChangeFeed/<entity>.cdm.json      entity schema (change-feed shape)
    <root>/ChangeFeed/<entity>/*.csv         change-feed entries
    <root>/Tables/**/<ENTITY>_*.csv          base-entity backfill files

Semantics reproduced natively in Spark:

- schema derived from the ``.cdm.json`` attribute list (§1.2 type table)
- backfill: parse base CSVs, rename ``LSN``→``Start_LSN``, drop ``_SysRowId``,
  append change-feed default columns (``DML_Action='INSERT'``, zero masks),
  reorder to the change-feed schema (CdmChangeFeedSource.cs:222-276)
- stream: new CSVs under ``ChangeFeed/<entity>/`` — Spark's file streaming
  source does new-file discovery + checkpointing natively, replacing the
  reference's ``LastModified > lastProcessedTimestamp`` listing loop
  (CdmChangeFeedSource.cs:296-346)
- merge key = ``RECID`` as string (CdmChangeFeedSource.cs:36,266-273)
- schema drift: ``check_schema_drift()`` re-reads the ``.cdm.json`` and
  raises ``SchemaMismatchError`` on any attribute change
  (CdmChangeFeedSource.cs:374-404); the runner maps it to a restart-backfill
  exit (§3.1)

CSV quirks (quoted newlines, embedded delimiters) are handled by Spark's
``multiLine``/``quote`` options instead of the reference's hand-rolled parser
(CsvOperations.cs) — same semantics, vectorized reader.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from arcane_framework_spark.contracts.columns import ARCANE_MERGE_KEY
from arcane_framework_spark.contracts.schema import SchemaMismatchError
from arcane_framework_spark.contracts.types import cdm_type_to_spark

#: change-feed bookkeeping columns appended to backfill rows with defaults
#: (CdmChangeFeedSource.cs:244-264)
BACKFILL_DEFAULTS = {
    "End_LSN": None,
    "DML_Action": "INSERT",
    "Seq_Val": "0x00000000000000000000",
    "Update_Mask": "0x00000000000000000000",
}
MERGE_KEY_COLUMN = "RECID"
SYSTEM_COLUMNS_NOT_IN_FEED = ("_SysRowId",)


@dataclass(frozen=True)
class CdmEntitySchema:
    """Parsed `.cdm.json` entity: ordered (name, cdm_type) attributes."""

    entity_name: str
    attributes: tuple[tuple[str, str], ...]

    @property
    def spark_schema(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField(name, cdm_type_to_spark(tp), True)
                for name, tp in self.attributes
            ]
        )

    @property
    def field_names(self) -> list[str]:
        return [name for name, _ in self.attributes]


def load_cdm_schema(path: str, entity_name: str | None = None) -> CdmEntitySchema:
    """Parse a ``.cdm.json`` file into an ordered attribute schema.

    Raises ``UnknownPrimitiveTypeError`` for unmapped CDM primitives, like the
    reference (test/Sources/CdmChangeFeedSourceTests.cs:286-301).
    """
    with open(path, encoding="utf-8") as fh:
        doc = json.load(fh)
    definitions = doc.get("definitions", [])
    entity = None
    for d in definitions:
        if entity_name is None or d.get("entityName") in (entity_name, "Entity"):
            entity = d
            break
    if entity is None:
        raise ValueError(f"No entity definition found in {path}")
    attrs = tuple(
        (a["name"], a.get("dataFormat") or a.get("dataType") or "string")
        for a in entity.get("hasAttributes", [])
    )
    return CdmEntitySchema(entity.get("entityName", "Entity"), attrs)


class CdmChangeFeedSource:
    """CDM change-feed source with backfill/stream duality."""

    def __init__(self, spark: SparkSession, root_path: str, entity_name: str):
        self.spark = spark
        self.root_path = root_path
        self.entity_name = entity_name
        self.schema_path = os.path.join(
            root_path, "ChangeFeed", f"{entity_name}.cdm.json"
        )
        self.schema = load_cdm_schema(self.schema_path, entity_name)

    # -- schema drift (CdmChangeFeedSource.cs:374-404) ----------------------

    def check_schema_drift(self) -> None:
        """Re-read the entity schema; raise SchemaMismatchError on any change."""
        current = load_cdm_schema(self.schema_path, self.entity_name)
        if current.attributes != self.schema.attributes:
            raise SchemaMismatchError(
                self.schema.spark_schema, current.spark_schema
            )

    # -- shared projection --------------------------------------------------

    def _with_merge_key(self, df: DataFrame) -> DataFrame:
        # CDM merge key = RECID cast to string (CdmChangeFeedSource.cs:266-273).
        return df.withColumn(
            ARCANE_MERGE_KEY, F.col(MERGE_KEY_COLUMN).cast("string")
        )

    def _csv_options(self) -> dict[str, str]:
        return {
            "header": "false",
            "multiLine": "true",  # quoted newlines (CsvOperations.cs:94-97)
            "quote": '"',
            "escape": '"',
            "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss[.SSSSSSS]['Z']",
        }

    # -- stream path --------------------------------------------------------

    def stream(self) -> DataFrame:
        """Unbounded change-feed: new CSVs under ChangeFeed/<entity>/."""
        feed_dir = os.path.join(self.root_path, "ChangeFeed", self.entity_name)
        df = (
            self.spark.readStream.options(**self._csv_options())
            .schema(self.schema.spark_schema)
            .csv(feed_dir + "/", pathGlobFilter="*.csv")
        )
        return self._with_merge_key(df)

    def stream_batch(self) -> DataFrame:
        """Bounded read of the same change-feed directory (tests/backfill+)."""
        feed_dir = os.path.join(self.root_path, "ChangeFeed", self.entity_name)
        df = (
            self.spark.read.options(**self._csv_options())
            .schema(self.schema.spark_schema)
            .csv(feed_dir + "/", pathGlobFilter="*.csv")
        )
        return self._with_merge_key(df)

    # -- backfill path (CdmChangeFeedSource.cs:222-276) ---------------------

    def backfill(self, base_schema: CdmEntitySchema | None = None) -> DataFrame:
        """Read base-entity CSVs aligned to the change-feed schema.

        The base entity carries ``LSN`` (renamed to ``Start_LSN``) and a
        ``_SysRowId`` system column (dropped); change-feed bookkeeping columns
        are appended with defaults, then columns are reordered to the
        change-feed schema (R10 — order matters for downstream parquet).
        """
        base_schema = base_schema or self._derive_base_schema()
        tables_glob = os.path.join(
            self.root_path, "Tables", "*", f"{self.entity_name.upper()}_*.csv"
        )
        df = (
            self.spark.read.options(**self._csv_options())
            .schema(base_schema.spark_schema)
            .csv(tables_glob)
        )
        if "LSN" in df.columns:
            df = df.withColumnRenamed("LSN", "Start_LSN")
        df = df.drop(*[c for c in SYSTEM_COLUMNS_NOT_IN_FEED if c in df.columns])
        for name, default in BACKFILL_DEFAULTS.items():
            if name not in df.columns:
                feed_type = dict(self.schema.attributes).get(name, "string")
                df = df.withColumn(
                    name, F.lit(default).cast(cdm_type_to_spark(feed_type))
                )
        ordered = [c for c in self.schema.field_names if c in df.columns]
        return self._with_merge_key(df.select(*ordered))

    def _derive_base_schema(self) -> CdmEntitySchema:
        """Base-entity schema = change-feed schema minus feed-only columns,
        with Start_LSN appearing as LSN and _SysRowId re-inserted after it."""
        feed_only = set(BACKFILL_DEFAULTS)
        attrs: list[tuple[str, str]] = []
        for name, tp in self.schema.attributes:
            if name in feed_only:
                continue
            if name == "Start_LSN":
                attrs.append(("LSN", tp))
                attrs.append(("_SysRowId", "string"))
            else:
                attrs.append((name, tp))
        return CdmEntitySchema(self.schema.entity_name, tuple(attrs))

    # -- mode dispatch (T4) -------------------------------------------------

    def read(self, backfill: bool) -> DataFrame:
        return self.backfill() if backfill else self.stream()
