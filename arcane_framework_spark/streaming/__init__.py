"""Streaming runtime: runner, exit codes, triggers, drift choreography."""

from arcane_framework_spark.streaming.runner import (  # noqa: F401
    EXIT_FATAL,
    EXIT_RESTART,
    EXIT_SUCCESS,
    StreamRunner,
    classify_exception,
)
