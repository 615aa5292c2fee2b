"""Predicate updates (round 4, third session).

``update_where`` / ``update_keys`` patch the CURRENT winner rows of
matching keys through the ordinary merge path: one commit of synthesized
upsert events carrying the winner's payload with the SET assignments
applied, at the winner's own ts with ``_seq + 1`` -- so the patch beats
the winner deterministically while genuinely newer events beat the patch
(an UPDATE is a change event, not a barrier; the same LWW contract as
``delete_where``).  (Reference analog: entry re-fetch with rewritten
metadata, /root/reference/src/fetchez/core.py:557-562.)
"""

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


def _seed(spark, tmp_path, name="t", **kw):
    sink = LocalSnapshotSink(str(tmp_path / name), num_buckets=4, **kw)
    sink.merge(
        _batch(
            spark,
            [
                ("c1", 0, "user", "hello", None, _ts(1), "I", 1),
                ("c1", 1, "assistant", "hi", None, _ts(2), "I", 2),
                ("c2", 0, "user", "secret", None, _ts(3), "I", 3),
                ("c3", 0, "tool", "ok", "bash", _ts(4), "I", 4),
            ],
        ),
        "seed-0",
    )
    return sink


def _state(spark, sink):
    return {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"])
        for r in sink.read(spark).collect()
    }


def test_update_where_patches_matching_winners(spark, tmp_path):
    sink = _seed(spark, tmp_path)
    sink.update_where(
        spark, "role = 'user'", {"text": "upper(text)", "tool": "'redacted'"}
    )
    assert _state(spark, sink) == {
        ("c1", 0): ("user", "HELLO", "redacted"),
        ("c1", 1): ("assistant", "hi", None),
        ("c2", 0): ("user", "SECRET", "redacted"),
        ("c3", 0): ("tool", "ok", "bash"),
    }


def test_update_where_assignments_see_the_whole_winner_row(spark, tmp_path):
    """SET expressions evaluate over the winner row: any payload column is
    in scope, not just the assigned one."""
    sink = _seed(spark, tmp_path)
    sink.update_where(
        spark, F.col("conv_id") == "c3", {"text": "concat(role, ':', text)"}
    )
    assert _state(spark, sink)[("c3", 0)] == ("tool", "tool:ok", "bash")


def test_update_where_lww_against_late_and_new_events(spark, tmp_path):
    sink = _seed(spark, tmp_path)
    sink.update_where(spark, "conv_id = 'c2'", {"text": "'patched'"})
    # a LATE event (older ts than the patched winner) must lose to the patch
    sink.merge(
        _batch(spark, [("c2", 0, "user", "late", None, _ts(2), "U", 99)]), "late-0"
    )
    assert _state(spark, sink)[("c2", 0)][1] == "patched"
    # a genuinely NEWER event legitimately beats the patch
    sink.merge(
        _batch(spark, [("c2", 0, "user", "newer", None, _ts(9), "U", 100)]), "new-0"
    )
    assert _state(spark, sink)[("c2", 0)][1] == "newer"


def test_update_where_skips_tombstoned_keys(spark, tmp_path):
    """Only LIVE winners are patched: a deleted key must not be
    resurrected by an update whose predicate would have matched it."""
    sink = _seed(spark, tmp_path)
    sink.delete_where(spark, "conv_id = 'c2'")
    sink.update_where(spark, "role = 'user'", {"text": "'patched'"})
    assert ("c2", 0) not in _state(spark, sink)


def test_update_keys_list_and_dataframe(spark, tmp_path):
    sink = _seed(spark, tmp_path)
    sink.update_keys(spark, [("c1", 0), ("c3", 0)], {"text": "'k'"})
    st = _state(spark, sink)
    assert st[("c1", 0)][1] == "k" and st[("c3", 0)][1] == "k"
    assert st[("c1", 1)][1] == "hi" and st[("c2", 0)][1] == "secret"
    keys = spark.createDataFrame(
        [("c2", 0), ("nope", 7)], "conv_id string, turn_idx int"
    )
    sink.update_keys(spark, keys, {"text": "'k2'"})
    st = _state(spark, sink)
    assert st[("c2", 0)][1] == "k2"
    assert ("nope", 7) not in st  # patching an absent key is a no-op


def test_update_where_feed_classifies_update(spark, tmp_path):
    sink = _seed(spark, tmp_path)
    pre = sink.current_snapshot_id
    sink.update_where(spark, "conv_id = 'c2'", {"text": "'patched'"})
    feed = sink.change_feed(spark, pre).collect()
    assert [(r["conv_id"], r["turn_idx"], r["_change_type"]) for r in feed] == [
        ("c2", 0, "update")
    ]


def test_update_where_rejects_bad_assignments(spark, tmp_path):
    sink = _seed(spark, tmp_path)
    with pytest.raises(ValueError, match="key/ordering"):
        sink.update_where(spark, "1=1", {"conv_id": "'x'"})
    with pytest.raises(ValueError, match="key/ordering"):
        sink.update_where(spark, "1=1", {"ts": "ts"})
    with pytest.raises(ValueError, match="not in the table schema"):
        sink.update_where(spark, "1=1", {"nope": "'x'"})


def test_update_where_is_replay_idempotent(spark, tmp_path):
    sink = _seed(spark, tmp_path)
    sink.update_where(spark, "conv_id = 'c2'", {"text": "'once'"}, batch_token="patch-1x")
    res = sink.update_where(
        spark, "conv_id = 'c1'", {"text": "'twice'"}, batch_token="patch-1x"
    )
    assert res["skipped"] is True
    st = _state(spark, sink)
    assert st[("c2", 0)][1] == "once" and st[("c1", 0)][1] == "hello"


def test_cli_update_where(spark, tmp_path, capsys):
    import json as _json

    from fetchez_spark.cli import main

    sink = _seed(spark, tmp_path)
    rc = main(
        [
            "maintain",
            str(tmp_path / "t"),
            "--update-where",
            "role = 'tool'",
            "--set",
            "text=upper(text)",
            "--cores",
            "2",
        ]
    )
    assert rc == 0
    out = _json.loads(capsys.readouterr().out)
    assert "update_where" in out
    assert _state(spark, sink)[("c3", 0)][1] == "OK"


def test_cli_update_where_requires_set(tmp_path, spark, capsys):
    from fetchez_spark.cli import main

    _seed(spark, tmp_path)
    rc = main(["maintain", str(tmp_path / "t"), "--update-where", "1=1"])
    assert rc == 1
