"""OpenAPI v3 schema fragment → Spark StructType (F7).

The reference parses a base64-encoded OpenAPI fragment into its sink schema
(src/Sources/RestApi/Extensions/StringExtensions.cs:73-86, nested-struct
goldens in test/Operations/ParquetOperationsTests.cs:47-90). Here the target
is a ``StructType``: ``object`` properties become nested structs (recursive),
``array`` becomes ``ArrayType``, scalar types map per the OpenAPI data-type
table. YAML input is supported when a YAML parser is importable; JSON input
(every JSON document is valid YAML) always works.
"""

from __future__ import annotations

import base64
import binascii
import json

from pyspark.sql import types as T

_SCALARS = {
    ("string", None): T.StringType(),
    ("string", "date-time"): T.TimestampType(),
    ("string", "date"): T.DateType(),
    ("string", "byte"): T.BinaryType(),
    ("string", "binary"): T.BinaryType(),
    ("integer", None): T.LongType(),
    ("integer", "int32"): T.IntegerType(),
    ("integer", "int64"): T.LongType(),
    ("number", None): T.DoubleType(),
    ("number", "float"): T.FloatType(),
    ("number", "double"): T.DoubleType(),
    ("boolean", None): T.BooleanType(),
}


def _to_spark_type(node: dict) -> T.DataType:
    kind = node.get("type", "object" if "properties" in node else "string")
    if kind == "object":
        props = node.get("properties", {})
        return T.StructType(
            [T.StructField(name, _to_spark_type(sub), True)
             for name, sub in props.items()]
        )
    if kind == "array":
        return T.ArrayType(_to_spark_type(node.get("items", {"type": "string"})))
    fmt = node.get("format")
    return _SCALARS.get((kind, fmt), _SCALARS.get((kind, None), T.StringType()))


def _loads(text: str) -> dict:
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        try:
            import yaml  # optional; not guaranteed in this container
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise ValueError(
                "OpenAPI fragment is not JSON and no YAML parser is available"
            ) from exc
        return yaml.safe_load(text)


def parse_openapi_schema(fragment: str) -> T.StructType:
    """Parse an OpenAPI v3 schema fragment (plain or base64) to a StructType.

    The fragment is the schema node itself (``type: object`` with
    ``properties``), matching the reference's apiSchema input.
    """
    text = fragment
    try:
        decoded = base64.b64decode(fragment, validate=True).decode("utf-8")
        text = decoded
    except (binascii.Error, UnicodeDecodeError, ValueError):
        pass
    node = _loads(text)
    result = _to_spark_type(node)
    if not isinstance(result, T.StructType):
        raise ValueError("top-level OpenAPI schema must be an object")
    return result
