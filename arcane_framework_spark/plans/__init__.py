"""Pipeline specification layer (the engine's 'logical plan' input)."""

from arcane_framework_spark.plans.spec import (  # noqa: F401
    PartitionSpec,
    StreamSpec,
    from_env,
    parse_seconds,
    parse_unix_millis,
)
