"""Stream-metadata sidecar writer (K4, SURVEY.md §2.3).

Writes ``metadata/v0/partitions.json`` describing the output partitioning for
downstream consumers, and *removes* it when no partitions are configured —
matching the reference PartitionsWriter
(src/Sinks/Services/StreamMetadata/V1/PartitionsWriter.cs:14-47; golden JSON
in test/SinkTests/ParquetSinkTests.cs:142-145).
"""

from __future__ import annotations

import json
import os

from arcane_framework_spark.plans.spec import PartitionSpec

METADATA_RELATIVE_PATH = os.path.join("metadata", "v0", "partitions.json")


def write_partitions_metadata(base_path: str,
                              partitions: list[PartitionSpec]) -> str | None:
    """Write (or remove) the partitions sidecar; returns the path written."""
    target = os.path.join(base_path, METADATA_RELATIVE_PATH)
    if not partitions:
        if os.path.exists(target):
            os.remove(target)
        return None
    os.makedirs(os.path.dirname(target), exist_ok=True)
    payload = json.dumps([p.to_json_dict() for p in partitions], separators=(",", ":"))
    with open(target, "w", encoding="utf-8") as fh:
        fh.write(payload)
    return target


def read_partitions_metadata(base_path: str) -> list[dict] | None:
    target = os.path.join(base_path, METADATA_RELATIVE_PATH)
    if not os.path.exists(target):
        return None
    with open(target, encoding="utf-8") as fh:
        return json.load(fh)
