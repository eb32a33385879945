"""PySpark DataSource API implementation of the REST source (S4).

The driver-loop ``RestApiSource`` (rest.py) covers stateful pagination and
auth token caching; this module is the Spark-4-native face of the same
source: ``spark.read.format("arcane_rest")`` with page-parallel partitions,
so a bounded paginated API is fetched by executors concurrently instead of
serially on the driver (reference behavior: one-page-at-a-time pull loop,
RestApiSource.cs:400-447 — parallel pages are the Spark-scale upgrade).

Options:
- ``url_template``   URL containing ``@page`` (F8-style placeholder)
- ``pages``          total page count (one Spark partition per page)
- ``schema``         handled by ``.schema(...)`` on the reader
- ``key_chain``      dot-path to the row array in the response (F4)
- ``header.<Name>``  static request headers (P6)
- ``timeout_seconds`` per-request timeout

Usage::

    spark.dataSource.register(RestDataSource)
    df = (spark.read.format("arcane_rest")
          .schema("id LONG, name STRING")
          .option("url_template", "https://api/items?page=@page")
          .option("pages", "10")
          .load())
"""

from __future__ import annotations

import json
import urllib.request
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType


class _PagePartition(InputPartition):
    def __init__(self, page: int):
        self.page = page


def _fetch_rows(url: str, headers: dict[str, str], timeout: float,
                key_chain: Sequence[str]) -> list[dict]:
    req = urllib.request.Request(url, headers=headers)
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        body = resp.read().decode("utf-8")
    doc = json.loads(body) if body else {}
    for key in key_chain:
        if not isinstance(doc, dict) or key not in doc:
            return []
        doc = doc[key]
    if isinstance(doc, list):
        return [r if isinstance(r, dict) else {"value": r} for r in doc]
    return []


class RestReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_fields = [f.name for f in schema.fields]
        self.url_template = options["url_template"]
        self.num_pages = int(options.get("pages", "1"))
        self.key_chain = [
            k for k in options.get("key_chain", "").split(".") if k
        ]
        self.timeout = float(options.get("timeout_seconds", "30"))
        self.headers = {
            name[len("header."):]: value
            for name, value in options.items()
            if name.startswith("header.")
        }

    def partitions(self) -> list[InputPartition]:
        return [_PagePartition(p) for p in range(1, self.num_pages + 1)]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        url = self.url_template.replace("@page", str(partition.page))
        for row in _fetch_rows(url, self.headers, self.timeout, self.key_chain):
            yield tuple(row.get(name) for name in self.schema_fields)


class RestStreamReader(SimpleDataSourceStreamReader):
    """Streaming face: one page per micro-batch, page cursor as the offset.

    The offset dict {"page": N} is checkpointed by Structured Streaming, so
    a restarted query resumes at the exact page — the page-token analog of
    the reference's ChangeTrackingVersion watermark (T2). An empty page
    leaves the offset unchanged (the next trigger re-polls, matching the
    reference's empty-batch-then-retry behavior).
    """

    def __init__(self, schema: StructType, options: dict):
        self.inner = RestReader(schema, options)

    def initialOffset(self) -> dict:  # noqa: N802 (Spark API)
        return {"page": 0}

    def read(self, start: dict) -> tuple:
        next_page = int(start["page"]) + 1
        rows = self._rows_for(next_page)
        if not rows:
            return iter([]), start
        return iter(rows), {"page": next_page}

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        rows: list[tuple] = []
        for page in range(int(start["page"]) + 1, int(end["page"]) + 1):
            rows.extend(self._rows_for(page))
        return iter(rows)

    def _rows_for(self, page: int) -> list[tuple]:
        url = self.inner.url_template.replace("@page", str(page))
        return [
            tuple(row.get(name) for name in self.inner.schema_fields)
            for row in _fetch_rows(
                url, self.inner.headers, self.inner.timeout, self.inner.key_chain
            )
        ]


class RestDataSource(DataSource):
    """``format("arcane_rest")`` — page-parallel batch + page-cursor stream."""

    @classmethod
    def name(cls) -> str:
        return "arcane_rest"

    def schema(self) -> str:
        # A declared .schema(...) always takes precedence; this default
        # covers schemaless exploration.
        return "value STRING"

    def reader(self, schema: StructType) -> RestReader:
        return RestReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> RestStreamReader:  # noqa: N802
        return RestStreamReader(schema, self.options)
