"""Per-micro-batch metrics — the PrintTransformStats analog.

The reference counts attempted/failed/successful per run
(/root/reference/cmd/command_utils.go:90-103) and logs skipped rows
(internal/utils/logger.go:17-23). We attach a StreamingQueryListener
that captures every micro-batch's progress (rows, rates, durations,
state size, watermark) and summarizes throughput + p95 latency — the
numbers BENCH reports.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchMetric:
    batch_id: int
    num_input_rows: int
    process_rate: float
    duration_ms: int
    state_rows: int
    watermark: str


@dataclass
class MetricsCollector:
    batches: list[BatchMetric] = field(default_factory=list)

    def total_rows(self) -> int:
        return sum(b.num_input_rows for b in self.batches)

    def total_duration_s(self) -> float:
        return sum(b.duration_ms for b in self.batches) / 1000.0

    def throughput(self) -> float:
        d = self.total_duration_s()
        return self.total_rows() / d if d > 0 else float("nan")

    def p95_batch_ms(self) -> float:
        if not self.batches:
            return float("nan")
        xs = sorted(b.duration_ms for b in self.batches)
        k = max(0, math.ceil(0.95 * len(xs)) - 1)
        return float(xs[k])

    def summary(self) -> dict:
        return {
            "batches": len(self.batches),
            "rows": self.total_rows(),
            "throughput_rows_per_s": round(self.throughput(), 2),
            "p95_batch_ms": self.p95_batch_ms(),
        }


class EngineQueryListener(StreamingQueryListener):
    """Collects per-batch progress into a MetricsCollector."""

    def __init__(self):
        self.collector = MetricsCollector()

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = json.loads(event.progress.json)
        state = p.get("stateOperators") or []
        self.collector.batches.append(
            BatchMetric(
                batch_id=p.get("batchId", -1),
                num_input_rows=p.get("numInputRows", 0),
                process_rate=p.get("processedRowsPerSecond", 0.0),
                duration_ms=p.get("durationMs", {}).get("triggerExecution", 0),
                state_rows=sum(s.get("numRowsTotal", 0) for s in state),
                watermark=p.get("eventTime", {}).get("watermark", ""),
            )
        )

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass
