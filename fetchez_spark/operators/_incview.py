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
``self.store`` (the view's own sink) and ``_refresh(spark) -> dict``;
the base ``refresh()`` wraps it with the source retention pin.
"""

from __future__ import annotations

import hashlib as _hashlib
import logging as _logging
import os as _os
import time as _time
from datetime import datetime, timedelta
from typing import Any

_LOG = _logging.getLogger("fetchez_spark.incview")

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
    "atomic_write",
    "IncrementalView",
]


def atomic_write(path: str, text: str) -> None:
    """tmp + fsync + rename: the single-file atomic-publish primitive the
    non-sink view stores (parquet export, outbox) build their metadata
    swaps from."""
    tmp = f"{path}.tmp.{_os.getpid()}"
    with open(tmp, "w") as f:
        f.write(text)
        f.flush()
        _os.fsync(f.fileno())
    _os.rename(tmp, path)


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


class RetentionPinMixin:
    """Durable source-side retention pin shared by every table-derived
    incremental consumer (the view family below, and TableMirror)."""

    source: Any
    store: Any

    # ------------------------------------------------------ retention pin
    # A view IS a CDC subscriber: its next refresh needs the source's
    # manifest chain back to its applied cursor, and without protection an
    # aggressive `expire_snapshots` on the source trims that chain out
    # from under a lagging view (mirror resyncs from scratch; the others
    # fail loudly).  Each refresh therefore stamps a durable consumer
    # cursor on the SOURCE (see LocalSnapshotSink.register_consumer) at
    # the view's applied position -- expiry then retains exactly the
    # head->cursor chain the view still needs, and the source's
    # table_report/fsck surface the view as a named lagging subscriber
    # instead of an invisible time bomb.  Same trade as any consumer
    # group: an ABANDONED view pins history until its pin is dropped
    # (`release_retention_pin()`, or `drop_consumer` on the source).
    # Set ``pin_retention = False`` on an instance to opt out.
    pin_retention: bool = True
    PIN_PREFIX: str = "view"

    def retention_pin_name(self) -> str:
        """Stable per-store consumer name on the source table."""
        h = _hashlib.sha1(
            _os.path.abspath(self.store.table_dir).encode()
        ).hexdigest()[:12]
        return f"{self.PIN_PREFIX}-{h}"

    def pin_source_retention(self, snapshot_id: str | None = None) -> str | None:
        """Stamp the retention pin at ``snapshot_id`` (default: the view's
        applied cursor).  Idempotent; auto-registers; force=True because a
        crash-replayed refresh may legitimately re-stamp an older position.
        Best-effort: a source without that manifest (already expired, or
        not a cursor-capable sink) logs and moves on -- the refresh itself
        still fails loudly if the chain it NEEDS is gone."""
        if not self.pin_retention:
            return None
        sid = snapshot_id or self.last_applied()
        try:
            # fast path: an unchanged stamp (every idle follow poll) must
            # not take the source's commit lock
            if self.source.consumer_cursor(self.retention_pin_name()) == sid:
                return sid
            return self.source.advance_consumer(
                self.retention_pin_name(), sid, force=True
            )
        except AttributeError:
            return None  # source has no consumer surface
        except (FileNotFoundError, ValueError) as e:
            _LOG.warning(
                "view retention pin %r not stamped at %s: %s",
                self.retention_pin_name(), sid, e,
            )
            return None

    def release_retention_pin(self) -> None:
        """Drop the view's consumer cursor on the source (stop pinning
        history; an abandoned view should call this or be dropped via
        ``drop_consumer`` source-side)."""
        try:
            self.source.drop_consumer(self.retention_pin_name())
        except (AttributeError, ValueError):
            pass


class IncrementalView(RetentionPinMixin):
    """Cursor + follow contract shared by the incremental views."""

    source: Any
    store: Any

    def refresh(self, spark: SparkSession) -> dict[str, Any]:
        """Advance the view to the source's current snapshot (subclass
        logic in ``_refresh``), bracketed by the retention pin: stamped at
        the applied cursor BEFORE reading (a racing source expire cannot
        trim the range mid-refresh beyond what the pin allows) and at the
        newly-applied snapshot after."""
        self.pin_source_retention()
        out = self._refresh(spark)
        to = out.get("to")
        if to:
            self.pin_source_retention(to)
        return out

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

    def _refresh(self, spark: SparkSession) -> dict[str, Any]:  # pragma: no cover
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
