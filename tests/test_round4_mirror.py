"""Table-to-table CDC replication (operators/mirror.py).

A TableMirror keeps a replica snapshot table current against a source
table by shipping the source's commit ranges through the ordinary
exactly-once MERGE -- the downstream half of the CDC story.  Covered:

1. first sync is a snapshot copy (tombstones included);
2. incremental sync replays RAW change rows, so cross-cycle late events
   lose last-writer-wins in the replica exactly as in the source;
3. position tracking is atomic with the data (offsets ride the commit)
   and replayed ranges are skipped by their batch token;
4. a source whose applied snapshot expired out from under the mirror
   falls back to a resync, including tombstoning replica-only keys;
5. additive schema evolution flows through;
6. the definition persists in the target catalog: load() from the
   target dir alone; 7. follow() converges a live replica.
"""

from __future__ import annotations

import datetime as dt
import threading

import pytest

from fetchez_spark.operators.mirror import TableMirror
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

UTC = dt.timezone.utc


def _ts(h: int, m: int = 0) -> dt.datetime:
    return dt.datetime(2025, 3, 1, h, m, tzinfo=UTC)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows,
        "op string, conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp, seq long, src_partition int",
    )


def _state(spark, sink: LocalSnapshotSink):
    return sorted(
        tuple(r) for r in sink.read(spark).select(
            "conv_id", "turn_idx", "role", "text", "tool", "ts"
        ).collect()
    )


@pytest.fixture()
def source(spark, tmp_path):
    sink = LocalSnapshotSink(str(tmp_path / "src"), num_buckets=4)
    sink.merge(
        _batch(spark, [
            ("I", "c1", 0, "user", "hello", None, _ts(1), 1, 0),
            ("I", "c1", 1, "assistant", "hi", "search", _ts(1, 5), 2, 0),
            ("I", "c2", 0, "user", "doomed", None, _ts(2), 3, 1),
        ]),
        "b-0",
    )
    sink.merge(
        _batch(spark, [
            ("U", "c1", 1, "assistant", "hi (edited)", "search", _ts(3), 4, 0),
            ("D", "c2", 0, None, None, None, _ts(3, 30), 5, 1),
        ]),
        "b-1",
    )
    return sink


def test_first_sync_is_snapshot_copy_with_tombstones(spark, source, tmp_path):
    mirror = TableMirror(source, str(tmp_path / "replica"))
    res = mirror.sync_once(spark)
    assert res["mode"] == "snapshot" and not res["skipped"]
    assert _state(spark, mirror.target) == _state(spark, source)
    # the c2 tombstone was copied, not just the live rows: a late
    # pre-delete replay into the REPLICA must still lose LWW
    mirror.target.merge(
        _batch(spark, [("U", "c2", 0, "user", "necromancy", None, _ts(2, 30), 99, 0)]),
        "late-1",
    )
    assert _state(spark, mirror.target) == _state(spark, source)


def test_incremental_sync_and_cross_cycle_late_events(spark, source, tmp_path):
    mirror = TableMirror(source, str(tmp_path / "replica"))
    mirror.sync_once(spark)
    # advance the source: new conv, an update, a LATE event for c1/1 that
    # must lose to the b-1 update, and a delete of c1/0
    source.merge(
        _batch(spark, [
            ("I", "c3", 0, "user", "new conv", None, _ts(4), 6, 2),
            ("U", "c1", 1, "assistant", "stale straggler", "search", _ts(2, 45), 7, 0),
            ("D", "c1", 0, None, None, None, _ts(4, 10), 8, 0),
        ]),
        "b-2",
    )
    res = mirror.sync_once(spark)
    assert res["mode"] == "incremental" and not res["skipped"]
    assert _state(spark, mirror.target) == _state(spark, source)
    rows = {(r["conv_id"], r["turn_idx"]): r["text"]
            for r in mirror.target.read(spark).collect()}
    assert rows[("c1", 1)] == "hi (edited)"  # straggler lost LWW
    assert ("c1", 0) not in rows  # delete shipped


def test_sync_skips_when_current_and_replayed_range_is_exactly_once(
    spark, source, tmp_path
):
    mirror = TableMirror(source, str(tmp_path / "replica"))
    first = mirror.sync_once(spark)
    assert mirror.last_applied() == source.current_snapshot_id
    # already current -> no-op
    again = mirror.sync_once(spark)
    assert again["skipped"] is True
    # a replayed cycle (crash after merge, retry of the same range) is
    # skipped by its batch token: same token, no new snapshot
    cb = mirror.target.manifest()["committed_batches"]
    token = next(t for t, s in cb.items() if s == first.get("snapshot_id"))
    replay = mirror.target.merge(
        _batch(spark, [("U", "c1", 0, "user", "dup", None, _ts(9), 50, 0)]),
        token,
    )
    assert replay["skipped"] is True
    assert replay["snapshot_id"] == first.get("snapshot_id", replay["snapshot_id"])
    assert _state(spark, mirror.target) == _state(spark, source)


def test_resync_after_source_history_expired(spark, source, tmp_path):
    mirror = TableMirror(source, str(tmp_path / "replica"))
    # opt out of the retention pin: this test exercises the resync repair
    # that fires when the pin is absent/dropped and expiry outruns the
    # replica (test_view_retention_pin covers the pinned no-resync path)
    mirror.pin_retention = False
    mirror.sync_once(spark)
    # replica drifts: a key the source never had (simulates divergence the
    # resync must repair by tombstoning)
    mirror.target.merge(
        _batch(spark, [("I", "zz", 0, "user", "replica-only", None, _ts(1), 1, 0)]),
        "drift-1",
    )
    # source advances and its history is expired past the applied snapshot
    source.merge(
        _batch(spark, [("U", "c1", 0, "user", "hello v2", None, _ts(5), 9, 0)]),
        "b-2",
    )
    source.merge(
        _batch(spark, [("I", "c4", 0, "user", "fresh", None, _ts(6), 10, 1)]),
        "b-3",
    )
    source.compact(spark)
    assert source.expire_snapshots(keep_last=1, min_age_seconds=0) > 0
    res = mirror.sync_once(spark)
    assert res["mode"] == "resync" and not res["skipped"]
    assert _state(spark, mirror.target) == _state(spark, source)
    # the replica-only key was tombstoned deterministically (its own
    # (ts, _seq+1)), not merely filtered: a replay of the drift row loses
    mirror.target.merge(
        _batch(spark, [("I", "zz", 0, "user", "replica-only", None, _ts(1), 1, 0)]),
        "drift-replay",
    )
    assert _state(spark, mirror.target) == _state(spark, source)


def test_additive_schema_evolution_flows_through(spark, source, tmp_path):
    mirror = TableMirror(source, str(tmp_path / "replica"))
    mirror.sync_once(spark)
    wide = spark.createDataFrame(
        [("U", "c1", 0, "user", "hello", None, _ts(7), 20, 0, 0.93)],
        "op string, conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp, seq long, src_partition int, quality double",
    )
    source.merge(wide, "b-2")
    mirror.sync_once(spark)
    tgt = mirror.target.read(spark)
    assert "quality" in tgt.columns
    got = {(r["conv_id"], r["turn_idx"]): r["quality"] for r in tgt.collect()}
    assert got[("c1", 0)] == pytest.approx(0.93)
    assert got[("c1", 1)] is None  # untouched rows null-fill


def test_load_from_persisted_definition(spark, source, tmp_path):
    target_dir = str(tmp_path / "replica")
    TableMirror(source, target_dir).sync_once(spark)
    source.merge(
        _batch(spark, [("I", "c9", 0, "user", "later", None, _ts(8), 30, 0)]),
        "b-2",
    )
    # fresh object from the target dir alone (the CLI/ops resume path)
    loaded = TableMirror.load(target_dir)
    assert loaded.source.table_dir == source.table_dir
    res = loaded.sync_once(spark)
    assert res["mode"] == "incremental"
    assert _state(spark, loaded.target) == _state(spark, source)


def test_load_without_definition_raises(spark, tmp_path):
    plain = LocalSnapshotSink(str(tmp_path / "plain"), num_buckets=2)
    with pytest.raises(KeyError):
        TableMirror.load(plain.table_dir)


def test_cli_mirror_create_then_bare_sync(spark, source, tmp_path, capsys):
    """CLI drive: --create defines + copies, a later bare --sync
    reconstructs the mirror from the persisted definition alone."""
    import json

    from fetchez_spark.cli import main

    target = str(tmp_path / "replica")
    rc = main(["mirror", target, "--create", source.table_dir])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["sync"]["mode"] == "snapshot"
    source.merge(
        _batch(spark, [("I", "c7", 0, "user", "cli", None, _ts(11), 60, 0)]),
        "b-2",
    )
    rc = main(["mirror", target, "--sync"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["sync"]["mode"] == "incremental"
    assert out["applied"] == source.current_snapshot_id
    assert _state(spark, LocalSnapshotSink(target)) == _state(spark, source)


def test_follow_converges_live_replica(spark, source, tmp_path):
    mirror = TableMirror(source, str(tmp_path / "replica"))
    mirror.sync_once(spark)  # initial copy; follow then ships ranges only
    stop = threading.Event()
    seen: list[dict] = []

    def run():
        for m in mirror.follow(
            spark, poll_seconds=0.2, stop_event=stop, timeout_seconds=60
        ):
            seen.append(m)
            if len(seen) >= 2:
                stop.set()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    try:
        source.merge(
            _batch(spark, [("I", "c5", 0, "user", "live 1", None, _ts(9), 40, 0)]),
            "b-2",
        )
        # wait for the first sync before committing the second range
        deadline = dt.datetime.now() + dt.timedelta(seconds=60)
        while not seen and dt.datetime.now() < deadline:
            stop.wait(0.1)
        source.merge(
            _batch(spark, [("U", "c5", 0, "user", "live 2", None, _ts(10), 41, 0)]),
            "b-3",
        )
        t.join(90)
    finally:
        stop.set()
        t.join(10)
    assert not t.is_alive()
    assert len(seen) >= 2 and all(not m.get("skipped") for m in seen)
    assert all(m["mode"] == "incremental" for m in seen)
    assert _state(spark, mirror.target) == _state(spark, source)
