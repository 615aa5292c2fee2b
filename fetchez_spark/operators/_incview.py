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

__all__ = [
    "ROOT_SNAPSHOT",
    "EPOCH",
    "snap_num",
    "snap_ts_lit",
    "ord_ts_lit",
    "IncrementalView",
]


def snap_num(snapshot_id: str) -> int:
    """Integer embedded in a snapshot id (0 for the root).  NOT monotone
    along the commit chain under multi-writer sources -- sid CLAIM order
    can differ from commit order -- so it must never be used as a merge
    token or an LWW ordering basis (see IncrementalView._refresh_ordinal)."""
    return int("".join(ch for ch in str(snapshot_id) if ch.isdigit()) or 0)


def snap_ts_lit(snapshot_id: str):
    """Deterministic per-snapshot timestamp literal (legacy basis --
    prefer :func:`ord_ts_lit` on the refresh ordinal, which follows the
    chain by construction)."""
    return F.lit(EPOCH + timedelta(seconds=snap_num(snapshot_id))).cast("timestamp")


def ord_ts_lit(ordinal: int):
    """Deterministic timestamp literal from a view's refresh ordinal: the
    view rows' LWW order must follow the order REFRESHES APPLY (which is
    chain order), not the upstream snapshot numbering or wall clock."""
    return F.lit(EPOCH + timedelta(seconds=int(ordinal))).cast("timestamp")


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

    def _refresh_ordinal(self, store: Any | None = None) -> int:
        """Strictly increasing per-refresh sequence for a view store,
        persisted in its ``offsets`` atomically with the cursor (commit
        ``offsets={"upstream": to, "refresh_seq": <this value>}``).

        Snapshot NUMBERS are not monotone along the commit chain under
        multi-writer sources (claim order != commit order), so neither
        merge tokens nor the view rows' LWW (ts, seq) basis may derive
        from them: a chain-later range ending at a lower-numbered head
        would lose last-writer-wins to the refresh before it.  Refreshes
        apply strictly in chain order, so this ordinal is monotone by
        construction.  Legacy stores (no ``refresh_seq`` yet) seed from
        the snapshot-number basis their existing rows carry, so new
        refreshes keep dominating old rows."""
        s = store if store is not None else self.store
        off = s.manifest().get("offsets") or {}
        if "refresh_seq" in off:
            return int(off["refresh_seq"]) + 1
        return snap_num(off.get("upstream", ROOT_SNAPSHOT)) + 1

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
