"""Online bucket-count evolution (round 4, late session).

rebucket() rewrites the table into a new hash-bucket layout in one
maintenance commit while writers keep committing: state is bit-identical,
tombstones survive, time travel reads old snapshots under their own
layout, bucket-pruned point reads work under the new layout, change scans
skip the rebucket commit and never prune across a layout change.
"""

from __future__ import annotations

import datetime as dt
import threading

import pytest
from pyspark.sql import functions as F

from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

UTC = dt.timezone.utc


def _batch(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, op string, seq long",
    )


def _ts(h: int) -> dt.datetime:
    return dt.datetime(2025, 1, 1, tzinfo=UTC) + dt.timedelta(hours=h)


def _state(sink, spark):
    return {
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in sink.read(spark).select("conv_id", "turn_idx", "text").collect()
    }


def test_rebucket_preserves_state_tombstones_and_time_travel(spark, tmp_path):
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    rows = [(f"c{i}", 0, "user", f"v{i}", None, _ts(1), "insert", i) for i in range(40)]
    sink.merge(_batch(spark, rows), "b-0")
    sink.merge(
        _batch(spark, [
            ("c1", 0, "user", "v1b", None, _ts(2), "update", 100),
            ("c2", 0, "user", None, None, _ts(2), "D", 101),
        ]),
        "b-1",
    )
    before_sid = sink.current_snapshot_id
    before = _state(sink, spark)

    res = sink.rebucket(spark, 9)
    assert res["rebucketed"] and res["num_buckets"] == 9
    assert sink.manifest()["num_buckets"] == 9
    assert _state(sink, spark) == before, "rebucket must not change state"
    # tombstone survived the rewrite: a LATE pre-delete update cannot
    # resurrect c2
    sink.merge(
        _batch(spark, [("c2", 0, "user", "zombie", None, _ts(1), "update", 102)]),
        "b-2",
    )
    assert sink.read(spark).filter(F.col("conv_id") == "c2").count() == 0
    # time travel: the pre-rebucket snapshot reads under its OWN layout
    assert {
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in sink.read(spark, snapshot_id=before_sid)
        .select("conv_id", "turn_idx", "text")
        .collect()
    } == before
    # bucket-pruned point read under the new layout
    got = sink.lookup(spark, "c1").collect()
    assert len(got) == 1 and got[0]["text"] == "v1b"
    # post-rebucket merges cluster under the new layout and read back
    sink.merge(
        _batch(spark, [("c99", 0, "user", "new", None, _ts(3), "insert", 103)]),
        "b-3",
    )
    assert sink.lookup(spark, "c99").collect()[0]["text"] == "new"


def test_rebucket_noop_and_validation(spark, tmp_path):
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    sink.merge(_batch(spark, [("c1", 0, "u", "x", None, _ts(1), "insert", 1)]), "b-0")
    sid = sink.current_snapshot_id
    assert sink.rebucket(spark, 4) == {"snapshot_id": sid, "rebucketed": False}
    with pytest.raises(ValueError):
        sink.rebucket(spark, 0)


def test_rebucket_under_concurrent_writers(spark, tmp_path):
    """Three writer threads keep merging while the table is rebucketed
    4 -> 8 mid-stream: every committed row must survive (LWW oracle),
    the final layout is 8, deltas landed under the old layout ride the
    flat list until compaction, and a full compact converges the table."""
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    sink.merge(
        _batch(spark, [(f"c{i}", 0, "u", "seed", None, _ts(0), "insert", i) for i in range(30)]),
        "seed-0",
    )
    errs: list[Exception] = []

    def writer(w: int):
        try:
            s = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
            for j in range(4):
                rows = [
                    (f"c{(w * 10 + k) % 30}", 0, "u", f"w{w}j{j}", None, _ts(j + 1), "update", 1000 + w * 100 + j * 10 + k)
                    for k in range(5)
                ]
                s.merge(_batch(spark, rows), f"w{w}-{j}")
        except Exception as e:  # pragma: no cover - surfaced below
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(3)]
    for t in threads:
        t.start()
    rb = sink.rebucket(spark, 8)
    for t in threads:
        t.join()
    assert not errs, errs
    assert rb["rebucketed"]
    assert sink.manifest()["num_buckets"] == 8
    # oracle: LWW over everything every writer committed plus the seed
    all_rows = [(f"c{i}", 0, "u", "seed", None, _ts(0), "insert", i) for i in range(30)]
    for w in range(3):
        for j in range(4):
            all_rows += [
                (f"c{(w * 10 + k) % 30}", 0, "u", f"w{w}j{j}", None, _ts(j + 1), "update", 1000 + w * 100 + j * 10 + k)
                for k in range(5)
            ]
    from fetchez_spark.operators.dedup import dedup_latest

    oracle = {
        (r["conv_id"], r["text"])
        for r in dedup_latest(
            _batch(spark, all_rows), key=["conv_id", "turn_idx"], order=["ts", "seq"]
        ).collect()
    }
    assert {
        (r["conv_id"], r["text"]) for r in sink.read(spark).collect()
    } == oracle
    # compaction re-clusters any flat-listed stragglers under the new layout
    sink.compact(spark)
    m = sink.manifest()
    assert not m.get("deltas") or not m["deltas"].get("*")
    assert {
        (r["conv_id"], r["text"]) for r in sink.read(spark).collect()
    } == oracle


def test_change_feed_across_rebucket(spark, tmp_path):
    """A change range spanning a rebucket: the rebucket commit itself is
    maintenance (re-emits nothing), bucket pruning of the pre-state is
    disabled across the layout change, and classifications stay exact."""
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    sink.merge(
        _batch(spark, [
            ("keep", 0, "u", "old", None, _ts(1), "insert", 1),
            ("gone", 0, "u", "bye", None, _ts(1), "insert", 2),
        ]),
        "b-0",
    )
    frm = sink.current_snapshot_id
    sink.merge(
        _batch(spark, [("keep", 0, "u", "new", None, _ts(2), "update", 10)]), "b-1"
    )
    sink.rebucket(spark, 8)
    sink.merge(
        _batch(spark, [
            ("gone", 0, "u", None, None, _ts(3), "D", 20),
            ("born", 0, "u", "hi", None, _ts(3), "insert", 21),
        ]),
        "b-2",
    )
    added, buckets, _tss = sink._added_change_files(frm, sink.current_snapshot_id)
    assert buckets is None, "pruning must be disabled across a layout change"
    feed = sink.change_feed(spark, frm).toPandas().set_index("conv_id")
    assert len(feed) == 3
    assert feed.loc["keep", "_change_type"] == "update"
    assert feed.loc["gone", "_change_type"] == "delete"
    assert feed.loc["born", "_change_type"] == "insert"
