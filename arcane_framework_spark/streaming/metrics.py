"""Stream metrics (T10): rows.incoming counter + source tags.

The reference declares a single metric, ``rows.incoming``, tagged with the
stream's identity (src/Contracts/DeclaredMetrics.cs:11,
src/Contracts/SourceTags.cs:12-63; sources contribute their default tags,
e.g. SqlServerSource.cs:71-79). Spark already measures per-batch input rows
(``StreamingQueryProgress.numInputRows``); this listener maps that stream of
progress events onto the reference's metric contract and hands each
observation to a pluggable emitter (log, statsd, prometheus — anything
callable).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener

ROWS_INCOMING = "rows.incoming"  # DeclaredMetrics.cs:11


@dataclass(frozen=True)
class SourceTags:
    """Stream identity tags attached to every metric observation.

    Field names follow the reference's SourceTags (arcane_stream_id,
    arcane_stream_kind, source location/entity).
    """

    stream_id: str = ""
    stream_kind: str = ""
    source_location: str = ""
    source_entity: str = ""

    def as_dict(self) -> dict[str, str]:
        return {
            "arcane.stream_id": self.stream_id,
            "arcane.stream_kind": self.stream_kind,
            "arcane.source_location": self.source_location,
            "arcane.source_entity": self.source_entity,
        }


@dataclass
class MetricObservation:
    name: str
    value: float
    tags: dict[str, str] = field(default_factory=dict)


class RowsIncomingListener(StreamingQueryListener):
    """Emits ``rows.incoming`` per micro-batch from query progress events.

    Attach with ``spark.streams.addListener(listener)``; every progress
    event becomes one observation: numInputRows tagged with the stream
    identity plus the Spark query id.
    """

    def __init__(self, tags: SourceTags | None = None,
                 emit: Callable[[MetricObservation], None] | None = None):
        self.tags = tags or SourceTags()
        self.observations: list[MetricObservation] = []
        self._emit = emit or self.observations.append

    # StreamingQueryListener interface -------------------------------------

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802 (Spark API)
        progress = event.progress
        tags = dict(self.tags.as_dict())
        tags["spark.query_id"] = str(progress.id)
        self._emit(
            MetricObservation(ROWS_INCOMING, float(progress.numInputRows), tags)
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802 (Spark API)
        pass
