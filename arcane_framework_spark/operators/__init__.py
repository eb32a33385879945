"""Operator surface: relational CDC ops + large-scale data-pipeline operators."""

from arcane_framework_spark.operators.relational import (  # noqa: F401
    changes_since,
    delta_join,
    latest_state,
)
