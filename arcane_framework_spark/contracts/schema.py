"""Schema hashing, validation, and drift classification (SURVEY.md §1.3, C7/C9).

The reference derives schemas at startup, validates them per-batch (field
count only — src/Sources/SqlServer/FastParquetSchemaValidator.cs:27-46), and
drives the control plane with two typed exceptions
(src/Sources/Exceptions/SchemaMismatchException.cs,
SchemaInconsistentException.cs) that the runner maps to exit codes. We keep
the same taxonomy on Spark ``StructType``.
"""

from __future__ import annotations

import base64
import hashlib
import json

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


class SchemaMismatchError(Exception):
    """Source schema changed vs. the expected schema → restart in backfill mode.

    Reference: SchemaMismatchException → K8s annotation
    ``arcane/state=schema-mismatch`` + exit SUCCESS(0)
    (src/Services/ArcaneExceptionHandler.cs:41-47).
    """

    def __init__(self, expected: StructType, actual: StructType):
        self.expected = expected
        self.actual = actual
        super().__init__(
            f"Source schema drifted: expected {len(expected.fields)} fields "
            f"{[f.name for f in expected.fields]}, got {len(actual.fields)} "
            f"fields {[f.name for f in actual.fields]}"
        )


class SchemaInconsistentError(Exception):
    """Source/sink schema divergence mid-stream → exit RESTART(2).

    Reference: SchemaInconsistentException
    (src/Sources/Exceptions/SchemaInconsistentException.cs:10-29). Message
    shape mirrors FastParquetSchemaValidator.cs:38-44.
    """

    def __init__(self, expected_count: int, actual_count: int):
        self.expected_count = expected_count
        self.actual_count = actual_count
        super().__init__(
            "Number of fields in the source schema does not match the number "
            f"of fields in the sink schema: {actual_count} != {expected_count}"
        )


def assert_field_count(df: DataFrame, expected: StructType | int) -> DataFrame:
    """Fast schema validator: field-count equality, pass-through on success.

    The reference's only concrete validator compares column counts
    (FastParquetSchemaValidator.cs:27-46); richer equality is available via
    ``df.schema == expected`` where callers want it.
    """
    expected_count = expected if isinstance(expected, int) else len(expected.fields)
    actual_count = len(df.columns)
    if actual_count != expected_count:
        raise SchemaInconsistentError(expected_count, actual_count)
    return df


def assert_schema(df: DataFrame, expected: StructType) -> DataFrame:
    """Strict drift check: name+type equality (nullable-insensitive)."""
    actual = df.schema
    exp = [(f.name, f.dataType.simpleString()) for f in expected.fields]
    act = [(f.name, f.dataType.simpleString()) for f in actual.fields]
    if exp != act:
        raise SchemaMismatchError(expected, actual)
    return df


def schema_hash(schema: StructType) -> str:
    """Stable fingerprint of a schema, embedded in output file names.

    Same role as the reference's GetSchemaHash (base64(sha256(empty parquet
    bytes)) with ``/``→``0`` — src/Sinks/Parquet/ParquetOperations.cs:126-149)
    but computed from the canonical JSON of the StructType, which is simpler
    and equally stable.
    """
    canonical = json.dumps(schema.jsonValue(), sort_keys=True).encode()
    digest = hashlib.sha256(canonical).digest()
    return base64.b64encode(digest).decode().replace("/", "0")


def short_schema_hash(schema: StructType) -> str:
    """First 7 chars — the reference's short hash (ParquetOperations.cs:147)."""
    return schema_hash(schema)[:7]
