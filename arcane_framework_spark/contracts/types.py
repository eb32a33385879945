"""Type-system mapping (SURVEY.md §1.2).

Three mapping tables exist in the reference; the load-bearing one for a
file-based change feed is CDM attribute type → engine type
(src/Sources/CdmChangeFeedSource/Models/SimpleCdmAttribute.cs:14-29). Unknown
primitives raise, matching the reference's InvalidOperationException
("Unknown primitive type" — test test/Sources/CdmChangeFeedSourceTests.cs:286-301).
"""

from __future__ import annotations

from pyspark.sql import types as T

#: CDM primitive → Spark type (SimpleCdmAttribute.cs:14-29). ``guid`` and
#: ``binary`` map to string exactly as the reference does; ``noyes`` is the
#: CDM boolean-as-int; ``time`` is seconds-of-day as int.
CDM_TO_SPARK: dict[str, T.DataType] = {
    "string": T.StringType(),
    "datetime": T.TimestampType(),
    "date": T.DateType(),
    "time": T.IntegerType(),
    "int64": T.LongType(),
    "biginteger": T.LongType(),
    "int32": T.IntegerType(),
    "integer": T.IntegerType(),
    "decimal": T.DecimalType(38, 18),
    "noyes": T.IntegerType(),
    "guid": T.StringType(),
    "binary": T.StringType(),
    "listlookupwellknown": T.StringType(),
}


class UnknownPrimitiveTypeError(ValueError):
    """Raised for CDM types outside the mapping table."""

    def __init__(self, type_name: str):
        super().__init__(f"Unknown primitive type: {type_name}")
        self.type_name = type_name


def cdm_type_to_spark(type_name: str) -> T.DataType:
    """Resolve a CDM dataFormat/dataType name to a Spark type (case-insensitive)."""
    try:
        return CDM_TO_SPARK[type_name.strip().lower()]
    except KeyError:
        raise UnknownPrimitiveTypeError(type_name) from None


def cdm_attributes_to_schema(attributes: list[dict]) -> T.StructType:
    """Build a StructType from CDM attribute dicts ``{name, dataFormat|dataType}``.

    All fields nullable — the reference wraps every CLR type nullable
    (ParquetOperations.cs:157-170).
    """
    fields = []
    for attr in attributes:
        type_name = attr.get("dataFormat") or attr.get("dataType") or ""
        fields.append(T.StructField(attr["name"], cdm_type_to_spark(type_name), True))
    return T.StructType(fields)
