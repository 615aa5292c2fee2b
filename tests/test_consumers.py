"""Durable CDC subscriber cursors (round 4, eleventh session).

The Kafka consumer-group analog, table-side: ``register_consumer``
creates a named movable ref; ``expire_snapshots`` retains the manifest
chain from the head back to every cursor so a LAGGING subscriber's
``read_changes(from=cursor)`` survives maintenance; ``follow_changes
(consumer=...)`` and the ``fetchez_changes`` streaming source resume
from and advance the cursor.  (Reference analog: fetchez's
resume-from-.part bookkeeping, /root/reference/src/fetchez/core.py:
862-905 -- lifted from one process's download queue to durable
multi-subscriber positions.)
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

UTC = dt.timezone.utc


def _batch(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, op string, seq long",
    )


def _ts(h: int) -> dt.datetime:
    return dt.datetime(2025, 1, 1, 0, 0, 0, tzinfo=UTC) + dt.timedelta(minutes=h)


def _seed(spark, tmp_path, n: int = 1) -> LocalSnapshotSink:
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    for i in range(n):
        sink.merge(
            _batch(spark, [(f"c{i}", 0, "user", f"v{i}", None, _ts(i), "I", i)]),
            f"b-{i}",
        )
    return sink


def test_register_advance_drop_roundtrip(spark, tmp_path):
    sink = _seed(spark, tmp_path, n=2)
    start = sink.register_consumer("etl")
    assert start == sink.current_snapshot_id
    assert sink.consumers() == {"etl": start}
    assert sink.consumer_cursor("etl") == start
    sink.merge(_batch(spark, [("c9", 0, "user", "x", None, _ts(9), "I", 9)]), "b-9")
    head = sink.current_snapshot_id
    assert sink.advance_consumer("etl", head) == head
    assert sink.consumer_lag("etl") == {
        "snapshot": head, "behind": 0, "resumable": True,
    }
    sink.drop_consumer("etl")
    assert sink.consumers() == {}
    with pytest.raises(ValueError, match="no consumer"):
        sink.drop_consumer("etl")
    with pytest.raises(ValueError, match="no consumer"):
        sink.consumer_lag("etl")
    with pytest.raises(ValueError, match="invalid consumer name"):
        sink.register_consumer("has/slash")


def test_register_is_exclusive_and_ref_checked(spark, tmp_path):
    sink = _seed(spark, tmp_path)
    sink.register_consumer("etl")
    with pytest.raises(ValueError, match="already exists"):
        sink.register_consumer("etl")
    with pytest.raises(ValueError, match="unknown ref"):
        sink.register_consumer("other", "nonsense")
    # refs resolve: register at a tag
    tagged = sink.create_tag("v1")
    assert sink.register_consumer("from-tag", "v1") == tagged


def test_advance_refuses_rewind_without_force(spark, tmp_path):
    sink = _seed(spark, tmp_path, n=3)
    old = sink.current_snapshot_id
    sink.merge(_batch(spark, [("c9", 0, "user", "x", None, _ts(9), "I", 9)]), "b-9")
    head = sink.current_snapshot_id
    sink.register_consumer("etl")  # at head
    with pytest.raises(ValueError, match="REWIND"):
        sink.advance_consumer("etl", old)
    assert sink.consumer_cursor("etl") == head
    # deliberate reprocess
    assert sink.advance_consumer("etl", old, force=True) == old
    # advancing back forward (not an ancestor of old) is allowed
    assert sink.advance_consumer("etl", head) == head
    # auto-registration: the streaming source's commit callback path
    assert sink.advance_consumer("fresh", head) == head
    assert sink.consumer_cursor("fresh") == head


def test_expire_retains_lagging_consumer_chain(spark, tmp_path):
    sink = _seed(spark, tmp_path, n=2)
    cursor = sink.register_consumer("lagging")
    expected = []
    for i in range(10, 16):
        sink.merge(
            _batch(spark, [(f"c{i}", 0, "user", f"v{i}", None, _ts(i), "I", i)]),
            f"b-{i}",
        )
        expected.append(f"v{i}")
    # aggressive expiry: without the cursor this trims to 1 manifest
    sink.expire_snapshots(keep_last=1, min_age_seconds=0)
    # the head->cursor chain survived (6 merge commits + cursor manifest)
    assert len(sink.snapshots()) >= 7
    got = sorted(
        r["text"] for r in sink.read_changes(spark, cursor).collect()
    )
    assert got == expected
    # the subscriber catches up; the pin releases on the next expire
    sink.advance_consumer("lagging", sink.current_snapshot_id)
    sink.expire_snapshots(keep_last=1, min_age_seconds=0)
    assert len(sink.snapshots()) == 1
    with pytest.raises(ValueError, match="expired"):
        sink.read_changes(spark, cursor).collect()


def test_expire_warns_but_proceeds_on_dead_cursor(spark, tmp_path, caplog):
    sink = _seed(spark, tmp_path, n=2)
    # a cursor pointing at a manifest that no longer exists (registered
    # before retention discipline, or state restored from backup)
    sink._write_consumer("zombie", "snap-9999999999")
    for i in range(10, 13):
        sink.merge(
            _batch(spark, [(f"c{i}", 0, "user", f"v{i}", None, _ts(i), "I", i)]),
            f"b-{i}",
        )
    import logging

    with caplog.at_level(logging.WARNING):
        sink.expire_snapshots(keep_last=1, min_age_seconds=0)
    assert any("zombie" in r.message for r in caplog.records)
    assert len(sink.snapshots()) == 1  # the dead cursor pins nothing
    # fsck reports it as a warning, not an error
    report = sink.fsck()
    assert not report["errors"]
    assert any("zombie" in w for w in report["warnings"])


def test_table_report_surfaces_consumer_lag(spark, tmp_path):
    sink = _seed(spark, tmp_path, n=1)
    sink.register_consumer("slow")
    for i in range(10, 14):
        sink.merge(
            _batch(spark, [(f"c{i}", 0, "user", f"v{i}", None, _ts(i), "I", i)]),
            f"b-{i}",
        )
    sink.set_properties(snapshot_keep_last=2)
    report = sink.table_report()
    lag = report["consumers"]["slow"]
    assert lag["behind"] == 5  # 4 merges + the set_properties commit
    assert lag["resumable"]
    assert any(
        r["action"] == "investigate_consumer" and r["consumer"] == "slow"
        for r in report["recommendations"]
    )
    # an unresumable cursor gets the drop recommendation instead
    sink._write_consumer("zombie", "snap-9999999999")
    report = sink.table_report()
    assert not report["consumers"]["zombie"]["resumable"]
    assert any(
        r["action"] == "drop_consumer" and r["consumer"] == "zombie"
        for r in report["recommendations"]
    )


def test_follow_changes_with_consumer_resumes_across_restarts(spark, tmp_path):
    sink = _seed(spark, tmp_path, n=1)
    sink.merge(_batch(spark, [("c10", 0, "user", "v10", None, _ts(10), "I", 10)]), "b-10")
    seen: list[str] = []
    # explicit registration pins the position BEFORE the subscriber's
    # process even starts (generators run lazily on first next())
    sink.register_consumer("sub")
    sink.merge(_batch(spark, [("c11", 0, "user", "v11", None, _ts(11), "I", 11)]), "b-11")
    gen = sink.follow_changes(
        spark, poll_seconds=0.05, timeout_seconds=10, consumer="sub"
    )
    step = next(gen)
    seen.extend(r["text"] for r in step["changes"].collect())
    sink.merge(_batch(spark, [("c12", 0, "user", "v12", None, _ts(12), "I", 12)]), "b-12")
    step = next(gen)  # advancing to this range persists the previous one
    seen.extend(r["text"] for r in step["changes"].collect())
    gen.close()  # subscriber dies WITHOUT finishing the second range
    assert seen == ["v11", "v12"]
    assert sink.consumer_cursor("sub") == step["from"]
    # restart: no from_snapshot, no caller bookkeeping -- the stored
    # cursor re-delivers the unfinished range (at-least-once), then new
    # commits, exactly in order
    sink.merge(_batch(spark, [("c13", 0, "user", "v13", None, _ts(13), "I", 13)]), "b-13")
    seen2: list[str] = []
    gen = sink.follow_changes(
        spark, poll_seconds=0.05, timeout_seconds=10, consumer="sub"
    )
    step = next(gen)
    seen2.extend(sorted(r["text"] for r in step["changes"].collect()))
    assert seen2 == ["v12", "v13"]
    gen.close()


def test_streaming_source_consumer_option_advances_cursor(spark, tmp_path):
    from fetchez_spark.sources.change_stream import register

    sink = _seed(spark, tmp_path, n=1)
    start = sink.register_consumer("replica")
    sink.merge(_batch(spark, [("c10", 0, "user", "v10", None, _ts(10), "I", 10)]), "b-10")
    sink.merge(_batch(spark, [("c11", 0, "user", "v11", None, _ts(11), "I", 11)]), "b-11")
    register(spark)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("fetchez_changes")
            .option("table_dir", sink.table_dir)
            .option("consumer", "replica")
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    # the stream started from the cursor (not the head): both rows
    # committed after registration came through
    texts = sorted(
        r["text"]
        for r in spark.read.parquet(out_dir).collect()
        if r["text"].startswith("v1")
    )
    assert texts == ["v10", "v11"]
    # a second drain proves the durable cursor tracks progress: its
    # read(start) stamps the previous drain's checkpointed offset even
    # when availableNow shutdown races the final commit() callback
    sink.merge(_batch(spark, [("c12", 0, "user", "v12", None, _ts(12), "I", 12)]), "b-12")
    drain()
    lag = sink.consumer_lag("replica")
    assert lag["resumable"] and lag["behind"] is not None and lag["behind"] <= 1
    assert sink.consumer_cursor("replica") != start
    # retention now follows the subscription: aggressive expiry keeps
    # exactly the chain the consumer still needs
    sink.expire_snapshots(keep_last=1, min_age_seconds=0)
    sink.read_changes(spark, sink.consumer_cursor("replica")).collect()


def test_cli_consumer_roundtrip(spark, tmp_path, capsys):
    import json

    from fetchez_spark.cli import main

    sink = _seed(spark, tmp_path, n=2)
    table = sink.table_dir
    assert main(["consumer", table, "--register", "etl"]) == 0
    reg = json.loads(capsys.readouterr().out)
    assert reg["registered"]["consumer"] == "etl"
    sink.merge(_batch(spark, [("c9", 0, "user", "x", None, _ts(9), "I", 9)]), "b-9")
    head = sink.current_snapshot_id
    assert main(["consumer", table, "--advance", "etl", "--at", head]) == 0
    assert json.loads(capsys.readouterr().out)["advanced"]["snapshot"] == head
    assert main(["consumer", table]) == 0
    listed = json.loads(capsys.readouterr().out)["consumers"]
    assert listed["etl"]["behind"] == 0
    assert main(["consumer", table, "--drop", "etl"]) == 0
    assert json.loads(capsys.readouterr().out)["dropped"] == "etl"
    assert sink.consumers() == {}
