"""Column renames (round 4, third session).

``rename_column(old, new)`` is the Iceberg ``RENAME COLUMN`` analog
WITHOUT column ids: data files keep their original (physical) names
forever; the manifest carries a physical->logical map (one metadata
commit, zero data movement) applied at the API boundary -- read outputs,
incoming merge batches, predicate/hint parameters, the change feed.
Time travel shows each snapshot under its own names; the old name is
RESERVED (a batch reusing it for a new column errors loudly); mirrors
ship the physical layer and adopt the map.  (Reference analog: the
rename hook, hooks/builtins/strip/rename.py -- lifted from per-fetch
field rewriting to table-level schema evolution.)
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
                ("c2", 0, "tool", "ok", "bash", _ts(2), "I", 2),
            ],
        ),
        "seed-0",
    )
    return sink


def test_rename_is_metadata_only_and_preserves_data(spark, tmp_path):
    sink = _seed(spark, tmp_path)
    res = sink.rename_column("text", "body")
    assert res["physical"] == "text"
    assert "body" in sink.read(spark).columns
    assert "text" not in sink.read(spark).columns
    assert sorted(
        (r["conv_id"], r["body"]) for r in sink.read(spark).collect()
    ) == [("c1", "hello"), ("c2", "ok")]


def test_merge_speaks_the_new_name_and_old_name_is_reserved(spark, tmp_path):
    sink = _seed(spark, tmp_path)
    sink.rename_column("text", "body")
    sink.merge(
        _batch(spark, [("c1", 0, "user", "v2", None, _ts(3), "U", 3)])
        .withColumnRenamed("text", "body"),
        "b-1",
    )
    assert sorted(
        (r["conv_id"], r["body"]) for r in sink.read(spark).collect()
    ) == [("c1", "v2"), ("c2", "ok")]
    # a batch reusing the retired physical name must error, never corrupt
    with pytest.raises(ValueError, match="reserved physical"):
        sink.merge(
            _batch(spark, [("c3", 0, "user", "bad", None, _ts(4), "I", 4)]),
            "b-2",
        )


def test_time_travel_shows_each_snapshots_own_names(spark, tmp_path):
    sink = _seed(spark, tmp_path)
    pre = sink.current_snapshot_id
    sink.rename_column("text", "body")
    assert "text" in sink.read(spark, snapshot_id=pre).columns
    assert "body" in sink.read(spark).columns


def test_predicates_feed_and_row_ops_use_new_names(spark, tmp_path):
    sink = _seed(spark, tmp_path)
    pre = sink.current_snapshot_id
    sink.rename_column("text", "body")
    sink.update_where(spark, "body = 'hello'", {"body": "upper(body)"})
    assert sorted(
        (r["conv_id"], r["body"]) for r in sink.read(spark).collect()
    ) == [("c1", "HELLO"), ("c2", "ok")]
    feed = sink.change_feed(spark, pre, include_pre_image=True).collect()
    by_key = {r["conv_id"]: r for r in feed}
    assert by_key["c1"]["_change_type"] == "update"
    assert by_key["c1"]["body"] == "HELLO"
    assert by_key["c1"]["_pre_image"]["body"] == "hello"
    sink.delete_where(spark, "body = 'ok'")
    assert [r["conv_id"] for r in sink.read(spark).collect()] == ["c1"]


def test_rename_key_column(spark, tmp_path):
    sink = _seed(spark, tmp_path)
    sink.rename_column("conv_id", "conversation")
    assert "conversation" in sink.read(spark).columns
    sink.merge(
        _batch(spark, [("c9", 0, "user", "n", None, _ts(9), "I", 9)])
        .withColumnRenamed("conv_id", "conversation"),
        "b-9",
    )
    assert sorted(r["conversation"] for r in sink.read(spark).collect()) == [
        "c1",
        "c2",
        "c9",
    ]
    # LWW still keys correctly across the rename
    sink.merge(
        _batch(spark, [("c1", 0, "user", "vv", None, _ts(10), "U", 10)])
        .withColumnRenamed("conv_id", "conversation"),
        "b-10",
    )
    rows = {
        (r["conversation"], r["turn_idx"]): r["text"]
        for r in sink.read(spark).collect()
    }
    assert rows[("c1", 0)] == "vv"


def test_rename_survives_compaction_and_fresh_session_open(spark, tmp_path):
    sink = _seed(spark, tmp_path)
    sink.rename_column("text", "body")
    sink.compact(spark)
    assert "body" in sink.read(spark).columns
    reopened = LocalSnapshotSink(str(tmp_path / "t"))
    assert "body" in reopened.read(spark).columns


def test_rename_validations(spark, tmp_path):
    sink = _seed(spark, tmp_path)
    with pytest.raises(ValueError, match="no column"):
        sink.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        sink.rename_column("text", "role")
    with pytest.raises(ValueError, match="cannot be renamed"):
        sink.rename_column("ts", "event_time")
    with pytest.raises(ValueError, match="invalid column name"):
        sink.rename_column("text", "bad name")
    # chained renames + rename-back restores identity
    sink.rename_column("text", "body")
    sink.rename_column("body", "content")
    assert "content" in sink.read(spark).columns
    sink.rename_column("content", "text")
    assert sink.manifest().get("logical_names") == {}
    assert "text" in sink.read(spark).columns


def test_range_hints_and_key_in_accept_logical_names(spark, tmp_path):
    sink = _seed(spark, tmp_path)
    sink.rename_column("turn_idx", "turn")
    out = sink.read(spark, range_hints={"turn": (0, 5)}).collect()
    assert len(out) == 2
    keys = spark.createDataFrame([("c1", 0)], "conv_id string, turn int")
    got = sink.read(spark, key_in=keys).collect()
    assert [r["conv_id"] for r in got] == ["c1"]


def test_mirror_ships_physical_layer_and_adopts_the_map(spark, tmp_path):
    from fetchez_spark.operators.mirror import TableMirror

    sink = _seed(spark, tmp_path)
    sink.rename_column("text", "body")
    mirror = TableMirror(sink, str(tmp_path / "replica"))
    mirror.sync_once(spark)
    rep = mirror.read_replica(spark)
    assert "body" in rep.columns  # map adopted
    assert sorted((r["conv_id"], r["body"]) for r in rep.collect()) == [
        ("c1", "hello"),
        ("c2", "ok"),
    ]
    # a post-rename source commit still replicates coherently
    sink.merge(
        _batch(spark, [("c1", 0, "user", "v2", None, _ts(5), "U", 5)])
        .withColumnRenamed("text", "body"),
        "b-5",
    )
    mirror.sync_once(spark)
    assert sorted(
        (r["conv_id"], r["body"]) for r in mirror.read_replica(spark).collect()
    ) == [("c1", "v2"), ("c2", "ok")]


def test_cli_rename_column(spark, tmp_path, capsys):
    import json as _json

    from fetchez_spark.cli import main

    sink = _seed(spark, tmp_path)
    rc = main(
        ["maintain", str(tmp_path / "t"), "--rename-column", "text=body"]
    )
    assert rc == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["rename_column"]["renamed"] == {"text": "body"}
    assert "body" in sink.read(spark).columns
