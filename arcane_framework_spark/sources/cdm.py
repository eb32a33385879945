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
from datetime import timedelta  # noqa: F401 — stream(lookback=...) signature

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
    #: entity version from the ``is.CDM.entityVersion`` trait (F5), when present
    version: str | None = None

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


# -- JSON document navigation (F5) ------------------------------------------
# Reference: JsonDocumentOperations.cs:17-53 (GetArrayElement both overloads,
# FilterArray) and SimpleCdmEntity.FromJson (SimpleCdmEntity.cs:41-61).


def get_array_element(document: dict, search_from: str, search_for: str,
                      search_for_value: str | None = None):
    """Navigate a JSON array property like the reference's GetArrayElement.

    Two-arg form: first element of ``document[search_from]`` that HAS the
    ``search_for`` property → that property's value. Three-arg form: first
    element whose ``search_for`` property EQUALS ``search_for_value`` → the
    element itself. Returns None when nothing matches (the C# default).
    """
    arr = document.get(search_from) or []
    if search_for_value is None:
        for item in arr:
            if isinstance(item, dict) and search_for in item:
                return item[search_for]
        return None
    for item in arr:
        if isinstance(item, dict) and item.get(search_for) == search_for_value:
            return item
    return None


def filter_array(array: list, array_property: str, filter_value: str):
    """First array element whose property equals the value (FilterArray)."""
    for item in array or []:
        if isinstance(item, dict) and item.get(array_property) == filter_value:
            return item
    return None


def entity_version(doc: dict) -> str | None:
    """Entity version from the ``is.CDM.entityVersion`` trait.

    Navigation chain per SimpleCdmEntity.cs:50-54:
    definitions → element with exhibitsTraits → trait with
    traitReference == "is.CDM.entityVersion" → arguments element with
    name == "versionNumber" → its value.
    """
    traits = get_array_element(doc, "definitions", "exhibitsTraits")
    trait = filter_array(traits or [], "traitReference", "is.CDM.entityVersion")
    if not trait:
        return None
    arg = get_array_element(trait, "arguments", "name", "versionNumber")
    return arg.get("value") if arg else None


def _resolve_complex_types(definitions: list, cdm_type: str) -> str:
    """Follow ``dataTypeName``/``extendsDataType`` chains to a primitive.

    Reference: SimpleCdmAttribute.ResolveComplexTypes — custom data types
    (definitions entries with ``dataTypeName``) extend one another until a
    CDM primitive; attributes referencing them resolve transitively.
    """
    by_name = {
        d["dataTypeName"]: d.get("extendsDataType", "string")
        for d in definitions
        if isinstance(d, dict) and "dataTypeName" in d
    }
    seen = set()
    while cdm_type in by_name and cdm_type not in seen:
        seen.add(cdm_type)
        cdm_type = by_name[cdm_type]
    return cdm_type


def load_cdm_schema(path: str, entity_name: str | None = None) -> CdmEntitySchema:
    """Parse a ``.cdm.json`` file into an ordered attribute schema.

    Resolves custom data types through their ``extendsDataType`` chain and
    extracts the version trait. Raises ``UnknownPrimitiveTypeError`` for
    unmapped CDM primitives, like the reference
    (test/Sources/CdmChangeFeedSourceTests.cs:286-301).
    """
    with open(path, encoding="utf-8") as fh:
        doc = json.load(fh)
    return parse_cdm_entity(doc, entity_name, source=path)


def parse_cdm_entity(doc: dict, entity_name: str | None = None,
                     source: str = "<dict>") -> CdmEntitySchema:
    """SimpleCdmEntity.FromJson parity over an already-loaded document."""
    definitions = doc.get("definitions", [])
    entity = None
    for d in definitions:
        if "entityName" not in d:
            continue
        if entity_name is None or d.get("entityName") in (entity_name, "Entity"):
            entity = d
            break
    if entity is None:
        raise ValueError(f"No entity definition found in {source}")
    attrs = tuple(
        (
            a["name"],
            _resolve_complex_types(
                definitions,
                a.get("dataFormat") or a.get("dataType") or "string",
            ),
        )
        for a in entity.get("hasAttributes", [])
    )
    return CdmEntitySchema(
        entity.get("entityName", "Entity"), attrs, version=entity_version(doc)
    )


def find_model_entity(model: dict, entity_name: str) -> dict | None:
    """Locate an entity descriptor in a ``model.json``/manifest document.

    model.json lists entities under ``entities`` with ``name``/
    ``attributes``; the same 3-arg GetArrayElement navigation the reference
    uses applies.
    """
    return get_array_element(model, "entities", "name", entity_name)


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

    def stream(self, lookback: "timedelta | None" = None) -> DataFrame:
        """Unbounded change-feed: new CSVs under ChangeFeed/<entity>/.

        ``lookback`` reproduces the reference's cold-start watermark
        ``lastProcessedTimestamp = now - lookBackRange``
        (CdmChangeFeedSource.cs:165,296-346): files last modified before the
        cutoff are never ingested. Implemented as a filter on the hidden
        ``_metadata.file_modification_time`` column, which file-streaming
        sources expose per input file — the cutoff is fixed at stream
        construction, matching the reference's cold-start semantics, while
        already-processed newer files stay deduplicated by the stream's own
        file checkpoint.
        """
        feed_dir = os.path.join(self.root_path, "ChangeFeed", self.entity_name)
        df = (
            self.spark.readStream.options(**self._csv_options())
            .schema(self.schema.spark_schema)
            .csv(feed_dir + "/", pathGlobFilter="*.csv")
        )
        if lookback is not None:
            from datetime import datetime, timezone

            cutoff = datetime.now(timezone.utc) - lookback
            df = df.filter(
                F.col("_metadata.file_modification_time") >= F.lit(cutoff)
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
