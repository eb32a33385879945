"""Column/schema contracts of the engine (SURVEY.md §1)."""

from arcane_framework_spark.contracts.columns import (  # noqa: F401
    ARCANE_MERGE_KEY,
    DATE_PARTITION_KEY,
    SYS_CHANGE_OPERATION,
    SYS_CHANGE_VERSION,
    merge_key_expr,
    with_change_defaults,
    with_date_partition,
    with_merge_key,
)
from arcane_framework_spark.contracts.schema import (  # noqa: F401
    SchemaInconsistentError,
    SchemaMismatchError,
    assert_field_count,
    schema_hash,
    short_schema_hash,
)
