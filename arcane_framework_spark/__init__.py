"""arcane_framework_spark — a PySpark-native streaming-ingestion + analytics engine.

A ground-up re-expression of the capabilities of SneaksAndData/arcane-framework
(an Akka.NET CDC/ingestion framework; see SURVEY.md) on Apache Spark:

- batch + Structured Streaming sources (file change feeds, JDBC CDC loops,
  paginated REST, blob listings) — ``arcane_framework_spark.sources``
- commit-protocol sinks (schema-hash part names, .COMPLETED tokens, metadata
  sidecars) — ``arcane_framework_spark.sinks``
- the column contracts (ARCANE_MERGE_KEY, DATE_PARTITION_KEY, change-op
  columns) — ``arcane_framework_spark.contracts``
- the relational surface (CDC delta joins, latest-state folding) plus
  large-scale training-data operators (dedup, similarity search, text
  analysis, multimodal plumbing) — ``arcane_framework_spark.operators``

Everything is declarative DataFrame/SQL first so Catalyst/AQE handle physical
planning; Python UDFs appear only where semantics genuinely require them.
"""

__version__ = "0.1.0"

from arcane_framework_spark.session import get_spark  # noqa: F401
