"""Streaming runtime: runner, exit codes, stateful operators, metrics."""

from arcane_framework_spark.streaming.metrics import (  # noqa: F401
    CustomPropertiesFilter,
    RowsIncomingListener,
    SourceTags,
    custom_log_properties,
)
from arcane_framework_spark.streaming.runner import (  # noqa: F401
    EXIT_FATAL,
    EXIT_RESTART,
    EXIT_SUCCESS,
    StreamRunner,
    classify_exception,
)
from arcane_framework_spark.streaming.stateful import (  # noqa: F401
    dedup_stream,
    sessionize_stream,
    windowed_rollup,
)
