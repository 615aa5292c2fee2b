"""Shared machinery for the incrementally-maintained view family.

``MaterializedAggregate`` (group-grain aggregates), ``TokenIndexView``
(inverted postings) and ``ConversationView`` (assembled transcripts) all
follow the same CDC-consumer contract: the view rides the source table's
typed change feed, the cursor is the ``offsets["upstream"]`` entry in the
view store's own manifest (committed atomically with the rows), and a
``follow`` loop polls the source's O(1) commit pointer and refreshes on
every observed advance.  That contract lives here ONCE so the three views
cannot drift on poll/stop/cursor semantics.

A subclass provides ``self.source`` (the upstream ``LocalSnapshotSink``),
``self.store`` (the view's own sink) and ``refresh(spark) -> dict``.
"""

from __future__ import annotations

import time as _time
from datetime import datetime, timedelta
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

ROOT_SNAPSHOT = "snap-0000000000"
EPOCH = datetime(2020, 1, 1)

__all__ = ["ROOT_SNAPSHOT", "EPOCH", "snap_num", "snap_ts_lit", "IncrementalView"]


def snap_num(snapshot_id: str) -> int:
    """Monotone integer embedded in a snapshot id (0 for the root)."""
    return int("".join(ch for ch in str(snapshot_id) if ch.isdigit()) or 0)


def snap_ts_lit(snapshot_id: str):
    """Deterministic per-snapshot timestamp literal for view envelope rows
    (the view's LWW order must follow the upstream commit order, not wall
    clock)."""
    return F.lit(EPOCH + timedelta(seconds=snap_num(snapshot_id))).cast("timestamp")


class IncrementalView:
    """Cursor + follow contract shared by the incremental views."""

    source: Any
    store: Any

    # -------------------------------------------------------------- cursor
    def last_applied(self) -> str:
        """Upstream snapshot the view has fully applied (the cursor rides
        the view store's manifest ``offsets``, committed atomically with
        the view rows, so crash replays are idempotent)."""
        off = self.store.manifest().get("offsets") or {}
        return off.get("upstream", ROOT_SNAPSHOT)

    def refresh(self, spark: SparkSession) -> dict[str, Any]:  # pragma: no cover
        raise NotImplementedError

    # ------------------------------------------------------------- follow
    def follow(
        self,
        spark: SparkSession,
        poll_seconds: float = 2.0,
        stop_event=None,
        timeout_seconds: float | None = None,
    ):
        """Generator keeping the view CONTINUOUSLY current: polls the
        source's commit pointer (O(1) driver-side VERSION read, same as
        ``follow_changes``) and refreshes on every observed advance,
        yielding each refresh's metrics dict.  Multiple commits between
        polls coalesce into one refresh over the combined range -- the
        view is eventually consistent with commit-level granularity.
        Stop via ``stop_event`` (threading.Event) or ``timeout_seconds``."""
        deadline = (_time.monotonic() + timeout_seconds) if timeout_seconds else None
        while True:
            if stop_event is not None and stop_event.is_set():
                return
            if deadline is not None and _time.monotonic() >= deadline:
                return
            if self.source.current_snapshot_id != self.last_applied():
                yield self.refresh(spark)
            else:
                _time.sleep(poll_seconds)
