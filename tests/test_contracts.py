"""Contract tests: merge key golden, schema hash/validators, type mapping.

Mirrors the reference's test strategy (SURVEY.md §5): the golden merge-key
hash pins the sha2/concat semantics
(reference test/Sources/SqlServerChangeTrackingSourceTests.cs:73-91).
"""

import hashlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from arcane_framework_spark.contracts.columns import (
    merge_key_expr,
    with_change_defaults,
    with_date_partition,
    with_merge_key,
)
from arcane_framework_spark.contracts.schema import (
    SchemaInconsistentError,
    SchemaMismatchError,
    assert_field_count,
    assert_schema,
    schema_hash,
    short_schema_hash,
)
from arcane_framework_spark.contracts.types import (
    UnknownPrimitiveTypeError,
    cdm_attributes_to_schema,
    cdm_type_to_spark,
)

#: Reference golden: merge key of the deleted row x=88888 (single int PK),
#: T-SQL HashBytes('SHA2_256', cast(88888 as nvarchar(128))) over UTF-16LE.
GOLDEN_88888 = "cc2b36e9f63cdbf5baa90d8eeb0d8edfae3017b137ff2c94ef9d9436bac760f0"


def test_merge_key_reference_golden_utf16(spark):
    df = spark.createDataFrame([(88888,)], "x: int")
    got = df.select(
        merge_key_expr(["x"], encoding="UTF-16LE").alias("k")
    ).head()[0]
    assert got == GOLDEN_88888


def test_merge_key_default_is_reference_utf16(spark):
    """The DEFAULT encoding must be reference parity (UTF-16LE) so every
    code path — pushdown, backfill, spec contracts — emits the same key."""
    df = spark.createDataFrame([(88888,)], "x: int")
    got = df.select(merge_key_expr(["x"]).alias("k")).head()[0]
    assert got == GOLDEN_88888


def test_merge_key_utf8_matches_hashlib(spark):
    df = spark.createDataFrame([(42, 7)], "a: bigint, b: int")
    got = df.select(
        merge_key_expr(["a", "b"], encoding="UTF-8").alias("k")
    ).head()[0]
    assert got == hashlib.sha256(b"42#7").hexdigest()


def test_merge_key_multi_pk_separator(spark):
    df = spark.createDataFrame([("x", "y")], "a: string, b: string")
    got = df.select(merge_key_expr(["a", "b"]).alias("k")).head()[0]
    assert got == hashlib.sha256("x#y".encode("utf-16-le")).hexdigest()


def test_with_merge_key_and_defaults(spark):
    df = spark.createDataFrame([(1, "p")], "id: int, payload: string")
    out = with_change_defaults(with_merge_key(df, ["id"]))
    row = out.head()
    assert row.ARCANE_MERGE_KEY == hashlib.sha256("1".encode("utf-16-le")).hexdigest()
    assert row.SYS_CHANGE_VERSION == 0
    assert row.SYS_CHANGE_OPERATION == "I"


def test_with_date_partition_expression(spark):
    df = spark.createDataFrame([("2024-03-15",)], "d: string")
    out = with_date_partition(
        df.withColumn("d", F.to_date("d")), "date_format(d, 'yyyyMM')"
    )
    assert out.head().DATE_PARTITION_KEY == "202403"


def test_field_count_validator_passthrough_and_error(spark):
    df = spark.createDataFrame([(1, "a")], "x: int, y: string")
    assert assert_field_count(df, 2) is df
    with pytest.raises(SchemaInconsistentError) as exc:
        assert_field_count(df, 3)
    # Message shape mirrors the reference validator
    # (FastParquetSchemaValidator.cs:38-44).
    assert "does not match" in str(exc.value)
    assert "2 != 3" in str(exc.value)


def test_schema_drift_detection(spark):
    df = spark.createDataFrame([(1, "a")], "x: int, y: string")
    assert assert_schema(df, df.schema) is df
    drifted = T.StructType(
        [T.StructField("x", T.IntegerType()), T.StructField("y", T.LongType())]
    )
    with pytest.raises(SchemaMismatchError):
        assert_schema(df, drifted)


def test_schema_hash_stable_and_short():
    s1 = T.StructType([T.StructField("a", T.IntegerType())])
    s2 = T.StructType([T.StructField("a", T.IntegerType())])
    s3 = T.StructType([T.StructField("a", T.LongType())])
    assert schema_hash(s1) == schema_hash(s2)
    assert schema_hash(s1) != schema_hash(s3)
    assert "/" not in schema_hash(s1)
    assert short_schema_hash(s1) == schema_hash(s1)[:7]
    assert len(short_schema_hash(s1)) == 7


def test_cdm_type_mapping():
    # Reference table: SimpleCdmAttribute.cs:14-29.
    assert cdm_type_to_spark("string") == T.StringType()
    assert cdm_type_to_spark("DateTime") == T.TimestampType()
    assert cdm_type_to_spark("int64") == T.LongType()
    assert cdm_type_to_spark("decimal") == T.DecimalType(38, 18)
    assert cdm_type_to_spark("guid") == T.StringType()
    assert cdm_type_to_spark("noyes") == T.IntegerType()


def test_cdm_unknown_type_raises():
    # Reference behavior: InvalidOperationException("Unknown primitive type")
    # (test/Sources/CdmChangeFeedSourceTests.cs:286-301).
    with pytest.raises(UnknownPrimitiveTypeError, match="Unknown primitive type"):
        cdm_type_to_spark("hyperloglog")


def test_cdm_attributes_to_schema():
    schema = cdm_attributes_to_schema(
        [
            {"name": "RECID", "dataFormat": "int64"},
            {"name": "NAME", "dataFormat": "string"},
        ]
    )
    assert [f.name for f in schema.fields] == ["RECID", "NAME"]
    assert all(f.nullable for f in schema.fields)


def test_ts_helpers_dispatch_on_dtype(spark):
    """ts_micros/ts_timestamp normalize timestamp[us], timestamp_ntz and
    legacy long-nanos columns to identical values (the r3 schema-drift
    class: testdata shipped both int64-nanos and timestamp[us])."""
    import datetime

    import pytest

    from arcane_framework_spark.session import ts_micros, ts_timestamp

    epoch_us = 1_700_000_000_123_456
    dt = datetime.datetime.fromtimestamp(
        epoch_us / 1e6, tz=datetime.timezone.utc
    )
    as_ts = spark.createDataFrame([(dt,)], "ts: timestamp")
    as_ntz = spark.createDataFrame(
        [(dt.replace(tzinfo=None),)], "ts: timestamp_ntz"
    )
    as_nanos = spark.createDataFrame([(epoch_us * 1000,)], "ts: long")

    for df in (as_ts, as_ntz, as_nanos):
        assert df.select(ts_micros(df).alias("us")).head().us == epoch_us
        got = df.select(ts_timestamp(df).alias("t")).head().t
        assert got.replace(tzinfo=datetime.timezone.utc) == dt

    bad = spark.createDataFrame([("x",)], "ts: string")
    with pytest.raises(TypeError):
        ts_micros(bad)
    with pytest.raises(TypeError):
        ts_timestamp(bad)
