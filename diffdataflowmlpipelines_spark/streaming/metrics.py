"""Streaming metrics: a StreamingQueryListener that appends every
batch's progress (rows, rates, watermark, state-store metrics, per-
source offsets) as JSON lines — the per-partition lineage file from the
sink (sink.py) plus this progress log together give the "per-partition
lineage and metrics" the north rule requires. The reference's only
observability is stdout ``inspect`` (``src/main.rs:59``).
"""

from __future__ import annotations

import json
import os
import threading

from pyspark.sql.streaming import StreamingQueryListener


class ProgressLogListener(StreamingQueryListener):
    """Appends QueryProgress JSON to ``path`` (one line per batch)."""

    def __init__(self, path: str):
        self.path = path
        self._lock = threading.Lock()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def onQueryStarted(self, event):
        self._write({"event": "started", "id": str(event.id), "name": event.name})

    def onQueryProgress(self, event):
        p = json.loads(event.progress.json)
        p["event"] = "progress"
        self._write(p)

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        self._write(
            {
                "event": "terminated",
                "id": str(event.id),
                "exception": event.exception,
            }
        )

    def _write(self, obj: dict) -> None:
        with self._lock:
            with open(self.path, "a") as f:
                f.write(json.dumps(obj) + "\n")


def attach_progress_log(spark, path: str) -> ProgressLogListener:
    listener = ProgressLogListener(path)
    spark.streams.addListener(listener)
    return listener
