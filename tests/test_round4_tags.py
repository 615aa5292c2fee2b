"""Snapshot tags (round 4, third session).

``create_tag(name)`` is the Iceberg TAG analog: an immutable named ref to
a snapshot ("v1.0", "train-set-2025-01"), one pointer file, readable
anywhere a snapshot id is accepted (``manifest()`` resolves named refs),
retained by expiry with its reachable chain, droppable to release.
(Reference analog: FRED's named snapshot listings,
/root/reference/src/fetchez/fred.py:88-133 -- lifted to immutable table
refs.)
"""

from __future__ import annotations

import datetime as dt

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
    return dt.datetime(2025, 1, 1, h, tzinfo=UTC)


def _seed(spark, tmp_path):
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    sink.merge(_batch(spark, [("c1", 0, "user", "v1", None, _ts(1), "I", 1)]), "b-0")
    return sink


def test_tag_reads_like_a_snapshot_id(spark, tmp_path):
    sink = _seed(spark, tmp_path)
    sid = sink.create_tag("v1.0")
    assert sink.tags() == {"v1.0": sid}
    sink.merge(_batch(spark, [("c1", 0, "user", "v2", None, _ts(2), "U", 2)]), "b-1")
    # head moved; the tag still reads the old state by NAME
    assert [r["text"] for r in sink.read(spark, snapshot_id="v1.0").collect()] == ["v1"]
    assert [r["text"] for r in sink.read(spark).collect()] == ["v2"]
    # incremental read from the tag
    got = sink.read_changes(spark, sink.resolve_ref("v1.0")).collect()
    assert [r["text"] for r in got] == ["v2"]


def test_tags_are_immutable_and_collision_checked(spark, tmp_path):
    sink = _seed(spark, tmp_path)
    sink.create_tag("v1.0")
    with pytest.raises(ValueError, match="already exists"):
        sink.create_tag("v1.0")
    sink.create_branch("audit")
    with pytest.raises(ValueError, match="already exists"):
        sink.create_tag("audit")  # tag/branch namespaces collide loudly
    with pytest.raises(ValueError, match="already exists"):
        sink.create_branch("v1.0")
    with pytest.raises(ValueError, match="invalid tag name"):
        sink.create_tag("main")
    sink.drop_tag("v1.0")
    assert sink.tags() == {}
    with pytest.raises(ValueError, match="no tag"):
        sink.drop_tag("v1.0")


def test_expiry_retains_tagged_history(spark, tmp_path):
    sink = _seed(spark, tmp_path)
    tagged = sink.create_tag("keepme")
    for i in range(1, 6):
        sink.merge(
            _batch(spark, [("c1", 0, "user", f"v{i+1}", None, _ts(i + 1), "U", i + 1)]),
            f"b-{i}",
        )
    sink.expire_snapshots(keep_last=1, min_age_seconds=0)
    # the tagged snapshot survived aggressive expiry and still reads
    assert [r["text"] for r in sink.read(spark, snapshot_id="keepme").collect()] == ["v1"]
    assert tagged in sink.snapshots()
    # dropping the tag releases it on the next expire
    sink.drop_tag("keepme")
    sink.expire_snapshots(keep_last=1, min_age_seconds=0)
    assert tagged not in sink.snapshots()


def test_unknown_ref_is_a_loud_error(spark, tmp_path):
    sink = _seed(spark, tmp_path)
    with pytest.raises(ValueError, match="unknown ref"):
        sink.read(spark, snapshot_id="nope")


def test_cli_tag_roundtrip(spark, tmp_path, capsys):
    import json as _json

    from fetchez_spark.cli import main

    _seed(spark, tmp_path)
    assert main(["branch", str(tmp_path / "t"), "--tag", "v1"]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["tagged"]["tag"] == "v1"
    assert main(["branch", str(tmp_path / "t"), "--list"]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert "v1" in out["tags"]
    assert main(["branch", str(tmp_path / "t"), "--drop-tag", "v1"]) == 0
