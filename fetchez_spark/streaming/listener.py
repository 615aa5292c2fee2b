"""Streaming metrics listener -- the ``fetches_callback`` analog.

The reference exposes a per-fetch callback surface
(/root/reference/src/fetchez/core.py:71-76, invoked per completed fetch);
the Structured-Streaming-native equivalent is a
:class:`~pyspark.sql.streaming.StreamingQueryListener`: the engine's
rows/sec + batch progress arrive PUSH-style from Spark's own event bus,
with zero cost on the batch path (unlike the foreachBatch ``on_batch``
closure, which runs inside the commit).

Use::

    listener = MetricsListener(out_dir="/data/stream-metrics")
    spark.streams.addListener(listener)
    ... run_stream(...) ...
    listener.progress   # list of dicts, also one JSON file per event
"""

from __future__ import annotations

import json
import os
import threading
import uuid

from pyspark.sql.streaming import StreamingQueryListener


class MetricsListener(StreamingQueryListener):
    def __init__(self, out_dir: str | None = None) -> None:
        self.out_dir = out_dir
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
        self._lock = threading.Lock()
        self.started: list[dict] = []
        self.progress: list[dict] = []
        self.terminated: list[dict] = []

    # -- events (delivered on Spark's listener-bus thread) -----------------
    def onQueryStarted(self, event) -> None:
        with self._lock:
            self.started.append({"id": str(event.id), "name": event.name})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        rec = {
            "query_id": str(p.id),
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "input_rows_per_second": p.inputRowsPerSecond,
            "processed_rows_per_second": p.processedRowsPerSecond,
            "timestamp": p.timestamp,
        }
        with self._lock:
            self.progress.append(rec)
        if self.out_dir:
            path = os.path.join(
                self.out_dir, f"progress-{p.batchId:010d}-{uuid.uuid4().hex[:8]}.json"
            )
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(rec, f)
            os.replace(tmp, path)

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            self.terminated.append({"id": str(event.id)})
