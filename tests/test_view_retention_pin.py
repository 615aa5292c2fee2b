"""Incremental views pin source retention (operators/_incview.py
RetentionPinMixin): a view IS a CDC subscriber, so each refresh stamps a
durable consumer cursor on the source and aggressive expire_snapshots can
no longer trim the chain a lagging view still needs.
"""

from __future__ import annotations

import datetime as dt

import pytest

from fetchez_spark.operators.mirror import TableMirror
from fetchez_spark.operators.scd_view import SCD2View
from fetchez_spark.sinks.local_snapshot import (
    HistoryExpiredError,
    LocalSnapshotSink,
)


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def _env(spark, rows):
    return spark.createDataFrame(
        [(op, k, a, _ts(m), m, m % 4) for (k, op, a, m) in rows],
        "op string, k string, attr string, ts timestamp, seq long, src_partition int",
    )


def _src(tmp_path, name="src"):
    return LocalSnapshotSink(str(tmp_path / name), num_buckets=4, key=["k"])


BATCHES = [
    [("a", "U", "x", 1), ("b", "U", "p", 2)],
    [("a", "U", "y", 3)],
    [("b", "D", "p", 4), ("c", "U", "z", 5)],
    [("a", "U", "z", 6)],
]


def _commit_all(spark, src, start=0, batches=None):
    for i, b in enumerate(batches or BATCHES):
        src.merge(_env(spark, b), batch_token=f"b-{start + i}")


def test_refresh_registers_and_advances_the_pin(spark, tmp_path):
    src = _src(tmp_path)
    view = SCD2View(str(tmp_path / "scd2"), src, attrs=["attr"])
    _commit_all(spark, src)
    view.refresh(spark)
    name = view.retention_pin_name()
    assert name.startswith("view-")
    assert src.consumer_cursor(name) == src.current_snapshot_id
    lag = src.consumer_lag(name)
    assert lag["behind"] == 0 and lag["resumable"]


def test_lagging_view_survives_aggressive_expire(spark, tmp_path):
    src = _src(tmp_path)
    view = SCD2View(str(tmp_path / "scd2"), src, attrs=["attr"])
    src.merge(_env(spark, BATCHES[0]), batch_token="b-0")
    view.refresh(spark)  # pin now at commit 1
    for i, b in enumerate(BATCHES[1:], start=1):
        src.merge(_env(spark, b), batch_token=f"b-{i}")
    # hostile maintenance while the view lags 3 commits behind
    src.expire_snapshots(keep_last=1, min_age_seconds=0)
    view.refresh(spark)  # must walk the pinned chain, not die
    cur = {(r.k, r.attr) for r in view.current(spark).collect()}
    assert cur == {("a", "z"), ("c", "z")}


def test_without_pin_the_same_lag_is_fatal(spark, tmp_path):
    src = _src(tmp_path)
    view = SCD2View(str(tmp_path / "scd2"), src, attrs=["attr"])
    view.pin_retention = False
    src.merge(_env(spark, BATCHES[0]), batch_token="b-0")
    view.refresh(spark)
    for i, b in enumerate(BATCHES[1:], start=1):
        src.merge(_env(spark, b), batch_token=f"b-{i}")
    src.expire_snapshots(keep_last=1, min_age_seconds=0)
    assert src.consumers() == {}
    with pytest.raises((HistoryExpiredError, ValueError)):
        view.refresh(spark)


def test_release_pin_drops_the_cursor(spark, tmp_path):
    src = _src(tmp_path)
    view = SCD2View(str(tmp_path / "scd2"), src, attrs=["attr"])
    _commit_all(spark, src)
    view.refresh(spark)
    assert view.retention_pin_name() in src.consumers()
    view.release_retention_pin()
    assert view.retention_pin_name() not in src.consumers()


def test_mirror_stays_incremental_through_expire(spark, tmp_path):
    src = _src(tmp_path)
    mirror = TableMirror(src, str(tmp_path / "replica"))
    src.merge(_env(spark, BATCHES[0]), batch_token="b-0")
    assert mirror.sync_once(spark)["mode"] == "snapshot"
    for i, b in enumerate(BATCHES[1:], start=1):
        src.merge(_env(spark, b), batch_token=f"b-{i}")
    src.expire_snapshots(keep_last=1, min_age_seconds=0)
    out = mirror.sync_once(spark)
    # the pin kept the replica's range readable: NO resync fallback
    assert out["mode"] == "incremental"
    got = {
        (r.k, r.attr) for r in mirror.read_replica(spark).select("k", "attr").collect()
    }
    assert got == {("a", "z"), ("c", "z")}


def test_mirror_pin_name_is_mirror_prefixed(spark, tmp_path):
    src = _src(tmp_path)
    mirror = TableMirror(src, str(tmp_path / "replica"))
    src.merge(_env(spark, BATCHES[0]), batch_token="b-0")
    mirror.sync_once(spark)
    assert mirror.retention_pin_name().startswith("mirror-")
    assert mirror.retention_pin_name() in src.consumers()
