"""Driver contract for the spark-graft builder (PySpark target).

Backed by ``arcane_framework_spark`` — see SURVEY.md for the blueprint and
``arcane_framework_spark/queries.py`` for the catalog (Spark implementation +
DuckDB oracle SQL per operator).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from arcane_framework_spark.queries import ORACLE_SQL, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q5 shape: 6-way join (broadcast dims) + aggregation — exercises the
    relational surface end-to-end.
    """
    return QUERIES["q5_local_supplier_volume"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (same column names/rounding)."""
    return dict(ORACLE_SQL)
