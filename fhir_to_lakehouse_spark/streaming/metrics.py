"""Streaming observability — reference metrics.py parity.

The reference (/root/reference/src/metrics.py:37-127) registers a
StreamingQueryListener that exports processedRowsPerSecond and Kafka
start/end/latest offsets per topic/partition as Prometheus gauges.
OpenTelemetry/Prometheus clients aren't in this container, so the
listener keeps the same measurements in-process (inspectable dict +
optional callback); the export hook is the one seam a deployment
plugs its metrics client into.
"""

from __future__ import annotations

import json
from collections import defaultdict
from typing import Callable

from pyspark.sql.streaming import StreamingQueryListener


class ThroughputListener(StreamingQueryListener):
    """Tracks per-query throughput + source offsets (reference
    QueryProgressListener, /root/reference/src/metrics.py:70-127)."""

    def __init__(self, export: Callable[[str, str, float], None] | None = None):
        self.rows_per_second: dict[str, float] = {}
        self.input_rows: dict[str, int] = defaultdict(int)
        self.batches: dict[str, int] = defaultdict(int)
        self.offsets: dict[str, dict] = {}
        self._export = export or (lambda name, metric, value: None)

    # -- listener API ----------------------------------------------------

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        name = p.name or str(p.id)
        self.rows_per_second[name] = p.processedRowsPerSecond or 0.0
        self.input_rows[name] += int(p.numInputRows or 0)
        self.batches[name] += 1
        self._export(name, "processedRowsPerSecond", self.rows_per_second[name])
        # source offsets (Kafka: {"topic":{"0":offset,...}}; file sources
        # expose logOffset) — keep raw like the reference exports per
        # topic/partition gauges (/root/reference/src/metrics.py:100-127)
        for i, src in enumerate(p.sources or []):
            for kind in ("startOffset", "endOffset", "latestOffset"):
                raw = getattr(src, kind, None)
                if raw is None:
                    continue
                try:
                    parsed = json.loads(raw) if isinstance(raw, str) else raw
                except (TypeError, ValueError):
                    parsed = raw
                self.offsets[f"{name}/src{i}/{kind}"] = parsed

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
