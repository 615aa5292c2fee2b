"""General MERGE INTO (sinks/local_snapshot.py merge_into): the
Delta/Iceberg MERGE analog expressed as one change-event commit --
matched deletes, matched updates over s./t. expressions, not-matched
inserts -- with the LWW contract (a MERGE is a change event, not a
barrier) and Delta's multiple-match error semantics."""

from __future__ import annotations

import datetime as dt

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
    return dt.datetime(2025, 1, 1, h, tzinfo=UTC)


def _seed(spark, tmp_path):
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    sink.merge(
        _batch(
            spark,
            [
                ("c1", 0, "user", "a", None, _ts(1), "I", 1),
                ("c2", 0, "user", "b", None, _ts(1), "I", 2),
                ("c3", 0, "user", "c", None, _ts(1), "I", 3),
            ],
        ),
        "b-0",
    )
    return sink


def _src(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, new_text string, kill boolean, "
        "ts timestamp",
    )


def _state(spark, sink):
    return {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in sink.read(spark).collect()
    }


def test_update_delete_insert_in_one_commit(spark, tmp_path):
    sink = _seed(spark, tmp_path)
    src = _src(
        spark,
        [
            ("c1", 0, "A2", False, _ts(2)),   # matched -> update
            ("c2", 0, None, True, _ts(2)),    # matched -> delete
            ("c4", 0, "NEW", False, _ts(2)),  # not matched -> insert
        ],
    )
    before = len(sink.snapshots())
    out = sink.merge_into(
        spark,
        src,
        when_matched_update={"text": "s.new_text"},
        when_matched_delete="s.kill",
        when_not_matched_insert={
            "conv_id": "s.conv_id", "turn_idx": "s.turn_idx",
            "role": "'user'", "text": "s.new_text", "ts": "s.ts",
        },
    )
    assert _state(spark, sink) == {
        ("c1", 0): "A2", ("c3", 0): "c", ("c4", 0): "NEW",
    }
    # ONE commit for all three clauses
    assert len(sink.snapshots()) == before + 1
    assert out["rows_in"] == 3


def test_merge_is_a_change_event_not_a_barrier(spark, tmp_path):
    """A genuinely NEWER change event beats the merge's update; a LATE
    event older than the patched winner loses to it."""
    sink = _seed(spark, tmp_path)
    sink.merge_into(
        spark,
        _src(spark, [("c1", 0, "patched", False, _ts(2))]),
        when_matched_update={"text": "s.new_text"},
    )
    late = _batch(spark, [("c1", 0, "user", "too-late", None, _ts(0), "U", 9)])
    newer = _batch(spark, [("c3", 0, "user", "newer", None, _ts(9), "U", 10)])
    sink.merge(late, "b-late")
    sink.merge(newer, "b-newer")
    got = _state(spark, sink)
    assert got[("c1", 0)] == "patched"  # late loser
    assert got[("c3", 0)] == "newer"    # genuine newer winner


def test_all_shorthands(spark, tmp_path):
    """update='all' copies every same-named non-key source column;
    insert='all' copies every same-named column."""
    sink = _seed(spark, tmp_path)
    src = spark.createDataFrame(
        [
            ("c1", 0, "assist", "A*", _ts(3)),
            ("c5", 1, "assist", "N*", _ts(3)),
        ],
        "conv_id string, turn_idx int, role string, text string, ts timestamp",
    )
    sink.merge_into(
        spark, src, when_matched_update="all", when_not_matched_insert="all"
    )
    got = {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"])
        for r in sink.read(spark).collect()
    }
    assert got[("c1", 0)] == ("assist", "A*")
    assert got[("c5", 1)] == ("assist", "N*")
    assert got[("c2", 0)] == ("user", "b")


def test_multiple_source_matches_raise(spark, tmp_path):
    sink = _seed(spark, tmp_path)
    src = _src(
        spark,
        [("c1", 0, "x", False, _ts(2)), ("c1", 0, "y", False, _ts(3))],
    )
    with pytest.raises(ValueError, match="multiple source rows"):
        sink.merge_into(spark, src, when_matched_update={"text": "s.new_text"})
    # inserts alone are not ambiguous: both rows become events, LWW settles
    sink.merge_into(
        spark,
        _src(spark, [("c9", 0, "i1", False, _ts(2)),
                     ("c9", 0, "i2", False, _ts(3))]),
        when_not_matched_insert={
            "conv_id": "s.conv_id", "turn_idx": "s.turn_idx",
            "text": "s.new_text", "ts": "s.ts",
        },
    )
    assert _state(spark, sink)[("c9", 0)] == "i2"


def test_arbitrary_on_condition(spark, tmp_path):
    """Non-key join: patch every turn of a conversation from one source
    row (explicit `on`, full-winner read)."""
    sink = _seed(spark, tmp_path)
    sink.merge(
        _batch(spark, [("c1", 1, "user", "a1", None, _ts(1), "I", 4)]), "b-1"
    )
    src = spark.createDataFrame(
        [("c1", "REDACTED")], "cid string, replacement string"
    )
    sink.merge_into(
        spark,
        src,
        on="t.conv_id = s.cid",
        when_matched_update={"text": "s.replacement"},
    )
    got = _state(spark, sink)
    assert got[("c1", 0)] == "REDACTED" and got[("c1", 1)] == "REDACTED"
    assert got[("c2", 0)] == "b"


def test_validation_errors(spark, tmp_path):
    sink = _seed(spark, tmp_path)
    src = _src(spark, [("c1", 0, "x", False, _ts(2))])
    with pytest.raises(ValueError, match="at least one WHEN clause"):
        sink.merge_into(spark, src)
    with pytest.raises(ValueError, match="key/ordering"):
        sink.merge_into(spark, src, when_matched_update={"conv_id": "'z'"})
    with pytest.raises(ValueError, match="missing: \\['ts'\\]"):
        sink.merge_into(
            spark, src,
            when_not_matched_insert={"conv_id": "s.conv_id",
                                     "turn_idx": "s.turn_idx"},
        )
    with pytest.raises(ValueError, match="not in the table schema"):
        sink.merge_into(spark, src, when_matched_update={"nope": "s.new_text"})
    with pytest.raises(ValueError, match="carry the key"):
        sink.merge_into(
            spark,
            src.drop("turn_idx"),
            when_matched_update={"text": "s.new_text"},
        )


def test_matched_delete_true_and_replayed_token(spark, tmp_path):
    """when_matched_delete=True deletes every matched key; an explicit
    batch_token makes the whole MERGE replay-idempotent."""
    sink = _seed(spark, tmp_path)
    src = _src(spark, [("c2", 0, None, True, _ts(2))])
    for _ in range(2):  # replay: second call must be a committed-token no-op
        sink.merge_into(
            spark, src, when_matched_delete=True, batch_token="purge-c2x"
        )
    got = _state(spark, sink)
    assert ("c2", 0) not in got and len(got) == 2


def test_insert_resurrects_over_a_newer_tombstone(spark, tmp_path):
    """A tombstoned key is 'not matched' (Delta semantics) and the insert
    must actually LAND even when the tombstone is newer than the assigned
    ts -- the event commits at the tombstone's own (ts, seq+1)."""
    sink = _seed(spark, tmp_path)
    # delete c2 at hour 5 (newer than the insert's assigned ts below)
    sink.merge(
        _batch(spark, [("c2", 0, "user", None, None, _ts(5), "D", 7)]), "b-del"
    )
    assert ("c2", 0) not in _state(spark, sink)
    sink.merge_into(
        spark,
        _src(spark, [("c2", 0, "REBORN", False, _ts(2))]),  # ts older than D
        when_not_matched_insert={
            "conv_id": "s.conv_id", "turn_idx": "s.turn_idx",
            "text": "s.new_text", "ts": "s.ts",
        },
    )
    got = {
        (r["conv_id"], r["turn_idx"]): (r["text"], r["ts"])
        for r in sink.read(spark).collect()
    }
    text, ts = got[("c2", 0)]
    assert text == "REBORN"
    # visibility won over strict event time: the row adopted the
    # tombstone's ts (documented trade-off)
    assert ts == _ts(5).replace(tzinfo=None) or ts == _ts(5)
    # an insert whose assigned ts already beats the tombstone keeps it
    sink.merge(
        _batch(spark, [("c3", 0, "user", None, None, _ts(5), "D", 8)]), "b-del3"
    )
    sink.merge_into(
        spark,
        _src(spark, [("c3", 0, "FRESH", False, _ts(9))]),
        when_not_matched_insert={
            "conv_id": "s.conv_id", "turn_idx": "s.turn_idx",
            "text": "s.new_text", "ts": "s.ts",
        },
    )
    got = {
        (r["conv_id"], r["turn_idx"]): (r["text"], r["ts"])
        for r in sink.read(spark).collect()
    }
    text3, ts3 = got[("c3", 0)]
    assert text3 == "FRESH"
    assert ts3 == _ts(9).replace(tzinfo=None) or ts3 == _ts(9)


def test_not_matched_by_source_full_snapshot_sync(spark, tmp_path):
    # the Delta WHEN NOT MATCHED BY SOURCE clause: one MERGE makes the
    # table equal the source snapshot -- update matches, insert new
    # keys, delete everything the source no longer carries
    sink = _seed(spark, tmp_path)
    src = _src(
        spark,
        [
            ("c1", 0, "A2", False, _ts(2)),   # matched -> update
            ("c4", 0, "NEW", False, _ts(2)),  # not matched -> insert
        ],
    )
    sink.merge_into(
        spark,
        src,
        when_matched_update={"text": "s.new_text"},
        when_not_matched_insert={
            "conv_id": "s.conv_id", "turn_idx": "s.turn_idx",
            "role": "'user'", "text": "s.new_text", "ts": "s.ts",
        },
        when_not_matched_by_source_delete=True,  # c2, c3 vanish
    )
    assert _state(spark, sink) == {("c1", 0): "A2", ("c4", 0): "NEW"}


def test_not_matched_by_source_update_and_conditional_delete(spark, tmp_path):
    # delete only the by-source rows the condition selects; mark the
    # rest stale via t.-expressions -- and the events stay ordinary
    # change events: a genuinely newer upsert later still wins
    sink = _seed(spark, tmp_path)
    src = _src(spark, [("c1", 0, "A2", False, _ts(2))])
    sink.merge_into(
        spark,
        src,
        when_matched_update={"text": "s.new_text"},
        when_not_matched_by_source_delete="t.conv_id = 'c2'",
        when_not_matched_by_source_update={"text": "concat(t.text, '-stale')"},
    )
    assert _state(spark, sink) == {("c1", 0): "A2", ("c3", 0): "c-stale"}
    # LWW: a newer real event beats the by-source delete's (ts, seq+1)
    sink.merge(
        _batch(spark, [("c2", 0, "user", "back", None, _ts(3), "U", 9)]), "b-2"
    )
    assert _state(spark, sink)[("c2", 0)] == "back"


def test_by_source_update_validation(spark, tmp_path):
    sink = _seed(spark, tmp_path)
    src = _src(spark, [("c1", 0, "A2", False, _ts(2))])
    with pytest.raises(ValueError, match="key/ordering"):
        sink.merge_into(
            spark, src, when_not_matched_by_source_update={"conv_id": "'x'"}
        )
    with pytest.raises(ValueError, match="not in the table schema"):
        sink.merge_into(
            spark, src, when_not_matched_by_source_update={"nope": "'x'"}
        )
