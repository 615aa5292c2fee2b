"""Stage-level shuffle/IO byte accounting (the scaling lever that
transfers to a real cluster).

On a 1000-executor cluster the replay's cost model is dominated by
bytes moved across the network per event; this module harvests
cumulative stage metrics (shuffle read/write, input/output bytes) from
Spark's own status REST API so the bench can report BYTES PER EVENT per
phase and regressions show up as numbers, not vibes.

Requires the Spark UI (``spark.ui.enabled=true`` -- the bench enables it
for its sessions; the engine default keeps it off).  When the UI is off,
every call degrades to ``None`` rather than failing the caller.
"""

from __future__ import annotations

import json
import urllib.request

METRIC_KEYS = (
    "shuffleWriteBytes",
    "shuffleReadBytes",
    "inputBytes",
    "outputBytes",
)


class ShuffleMetrics:
    """Cumulative stage-metric snapshots; ``delta()`` between two
    snapshots isolates one bench phase."""

    def __init__(self, spark) -> None:
        self.spark = spark
        self.ui = spark.sparkContext.uiWebUrl
        self.app = spark.sparkContext.applicationId

    def available(self) -> bool:
        return self.ui is not None

    def snapshot(self) -> dict[str, int] | None:
        """Sum of each metric over all completed stages so far."""
        if not self.ui:
            return None
        try:
            with urllib.request.urlopen(
                f"{self.ui}/api/v1/applications/{self.app}/stages?status=complete",
                timeout=10,
            ) as r:
                stages = json.load(r)
        except Exception:
            return None
        return {k: sum(int(s.get(k, 0) or 0) for s in stages) for k in METRIC_KEYS}

    @staticmethod
    def delta(before: dict | None, after: dict | None) -> dict[str, int] | None:
        if before is None or after is None:
            return None
        return {k: after.get(k, 0) - before.get(k, 0) for k in METRIC_KEYS}
