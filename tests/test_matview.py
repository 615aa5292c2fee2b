"""Incremental materialized aggregate views (round 4, late session).

The invariant under test everywhere: after any sequence of refreshes, the
view's contents EQUAL the full re-aggregation of the source's current
state -- incremental delta maintenance must be indistinguishable from
recompute, across inserts, updates, group-moves, deletes (including
min/max-contributor deletes), late LWW losers, null group values, and
the expired-snapshot rebuild fallback.

Also pins the change_feed state-transition fix this feature exposed: a
late row that LOSES cross-batch last-writer-wins changed nothing and must
emit nothing (previously a phantom 'update' with a stale post-image), and
an 'insert' arriving under a newer tombstone must emit nothing.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fetchez_spark.operators.matview import MaterializedAggregate
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

UTC = dt.timezone.utc

PAYLOAD = T.StructType(
    [
        T.StructField("uid", T.LongType()),
        T.StructField("grp", T.StringType()),
        T.StructField("sub", T.StringType()),
        T.StructField("val", T.DoubleType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
ENV = (
    "op string, uid long, grp string, sub string, val double, n int, "
    "ts timestamp, seq long"
)


def _ts(h: int) -> dt.datetime:
    return dt.datetime(2025, 1, 1, 0, tzinfo=UTC) + dt.timedelta(hours=h)


def _sink(spark, path) -> LocalSnapshotSink:
    return LocalSnapshotSink(str(path), num_buckets=4, key=["uid"], base_schema=PAYLOAD)


def _merge(spark, sink, rows, token):
    sink.merge(spark.createDataFrame(rows, schema=ENV), batch_token=token)


def _expected(sink, spark, group_by):
    return {
        tuple(r)
        for r in sink.read(spark)
        .groupBy(*group_by)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("val").cast("double")).alias("total"),
            F.avg("val").alias("mean"),
            F.min("n").alias("lo"),
            F.max("n").alias("hi"),
        )
        .collect()
    }


def _got(mv, spark):
    return {tuple(r) for r in mv.read_view(spark).collect()}


AGGS = {
    "n_rows": ("count", None),
    "total": ("sum", "val"),
    "mean": ("avg", "val"),
    "lo": ("min", "n"),
    "hi": ("max", "n"),
}


def test_matview_incremental_matches_full_recompute(spark, tmp_path):
    """Inserts, value updates, group-move updates, deletes (including the
    group-min contributor and a fully-emptied group), null group values,
    all-null aggregate inputs, and a late LWW loser: after every refresh
    the view equals the full recompute of the source's state."""
    sink = _sink(spark, tmp_path / "t")
    mv = MaterializedAggregate(sink, str(tmp_path / "mv"), ["grp"], AGGS)

    _merge(spark, sink, [
        ("U", 1, "a", "x", 10.0, 5, _ts(0), 1),
        ("U", 2, "a", "x", 20.0, 1, _ts(0), 2),
        ("U", 3, "b", "y", 7.0, 9, _ts(0), 3),
        ("U", 4, None, "y", None, 2, _ts(0), 4),  # null group, null val
    ], "b1")
    mv.refresh(spark)
    assert _got(mv, spark) == _expected(sink, spark, ["grp"])

    # update uid2's value, MOVE uid3 from b to a, insert uid5 into b
    _merge(spark, sink, [
        ("U", 2, "a", "x", 25.0, 0, _ts(1), 5),
        ("U", 3, "a", "y", 8.0, 3, _ts(1), 6),
        ("U", 5, "b", "y", 1.5, 4, _ts(1), 7),
    ], "b2")
    mv.refresh(spark)
    assert _got(mv, spark) == _expected(sink, spark, ["grp"])

    # delete a's min contributor (n=0), empty group b, drop the null group
    _merge(spark, sink, [
        ("D", 2, "a", "x", 0.0, 0, _ts(2), 8),
        ("D", 5, "b", "y", 0.0, 0, _ts(2), 9),
        ("D", 4, None, "y", None, 0, _ts(2), 10),
    ], "b3")
    mv.refresh(spark)
    assert _got(mv, spark) == _expected(sink, spark, ["grp"])
    view = mv.read_view(spark)
    assert view.filter(F.col("grp") == "b").count() == 0, "emptied group must vanish"
    assert view.filter(F.col("grp").isNull()).count() == 0

    # a LATE update (older ts) loses cross-batch LWW: state unchanged
    _merge(spark, sink, [
        ("U", 1, "a", "x", 999.0, 99, _ts(-5), 0),
        ("U", 6, "c", "z", 3.0, 3, _ts(2), 11),
    ], "b4")
    mv.refresh(spark)
    assert _got(mv, spark) == _expected(sink, spark, ["grp"])
    assert {r["grp"] for r in mv.read_view(spark).collect()} == {"a", "c"}


def test_matview_refresh_is_idempotent_and_exactly_once(spark, tmp_path):
    """A refresh with no upstream advance is a no-op; replaying the same
    range (crash-after-commit) is skipped by the store's token window."""
    sink = _sink(spark, tmp_path / "t")
    mv = MaterializedAggregate(sink, str(tmp_path / "mv"), ["grp"], AGGS)
    _merge(spark, sink, [("U", 1, "a", "x", 1.0, 1, _ts(0), 1)], "b1")
    r1 = mv.refresh(spark)
    assert not r1["skipped"]
    assert mv.refresh(spark)["skipped"], "no upstream advance -> no-op"
    # simulate a crashed refresh retry: re-apply the identical range with
    # the refresh's actual committed token (format-agnostic) and ordinal
    cb = mv.store.manifest()["committed_batches"]
    token = next(t for t, s in cb.items() if s == r1.get("snapshot_id"))
    off = mv.store.manifest().get("offsets") or {}
    deltas = mv._group_deltas(spark, r1["from"], r1["to"])
    rows = mv._combined_rows(spark, deltas, r1["to"], int(off["refresh_seq"]))
    res = mv.store.merge(rows, batch_token=token)
    assert res["skipped"], "same-token replay must be skipped"
    assert _got(mv, spark) == _expected(sink, spark, ["grp"])


def test_matview_multi_column_group_with_nulls(spark, tmp_path):
    """Composite group keys (one nullable) maintain correctly: the
    refresh join and upsert are null-SAFE on every group column."""
    sink = _sink(spark, tmp_path / "t")
    mv = MaterializedAggregate(
        sink, str(tmp_path / "mv"), ["grp", "sub"], {"n_rows": ("count", None), "total": ("sum", "val")}
    )
    _merge(spark, sink, [
        ("U", 1, "a", None, 1.0, 1, _ts(0), 1),
        ("U", 2, "a", "x", 2.0, 1, _ts(0), 2),
        ("U", 3, "a", None, 4.0, 1, _ts(0), 3),
    ], "b1")
    mv.refresh(spark)
    # update the (a, NULL) member; its old partial must be found (null-safe)
    _merge(spark, sink, [("U", 1, "a", None, 10.0, 1, _ts(1), 4)], "b2")
    mv.refresh(spark)
    exp = {
        tuple(r)
        for r in sink.read(spark)
        .groupBy("grp", "sub")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum(F.col("val").cast("double")).alias("total"))
        .collect()
    }
    assert _got(mv, spark) == exp
    assert ("a", None, 2, 14.0) in exp  # sanity: the null subgroup updated


def test_matview_rebuild_after_source_expiry(spark, tmp_path):
    """If the last-applied source snapshot has been expired (retention
    outlived), refresh falls back to a full rebuild -- including
    tombstoning groups that vanished since the stale view state."""
    sink = _sink(spark, tmp_path / "t")
    mv = MaterializedAggregate(sink, str(tmp_path / "mv"), ["grp"], AGGS)
    # opt out of the retention pin: this test exercises the fallback that
    # fires when the pin is absent/dropped and expiry outruns the view
    mv.pin_retention = False
    _merge(spark, sink, [
        ("U", 1, "a", "x", 1.0, 1, _ts(0), 1),
        ("U", 2, "gone", "x", 5.0, 5, _ts(0), 2),
    ], "b1")
    mv.refresh(spark)
    _merge(spark, sink, [
        ("D", 2, "gone", "x", 0.0, 0, _ts(1), 3),
        ("U", 3, "c", "y", 2.0, 2, _ts(1), 4),
    ], "b2")
    sink.compact(spark)
    sink.expire_snapshots(keep_last=1, min_age_seconds=0)
    with pytest.raises(FileNotFoundError):
        sink.manifest(mv.last_applied())
    mv.refresh(spark)
    assert _got(mv, spark) == _expected(sink, spark, ["grp"])
    assert {r["grp"] for r in mv.read_view(spark).collect()} == {"a", "c"}


def test_matview_view_is_itself_a_snapshot_table(spark, tmp_path):
    """The view's store is a first-class snapshot table: time travel to
    the state after the first refresh still works after later refreshes."""
    sink = _sink(spark, tmp_path / "t")
    mv = MaterializedAggregate(sink, str(tmp_path / "mv"), ["grp"], {"n_rows": ("count", None)})
    _merge(spark, sink, [("U", 1, "a", "x", 1.0, 1, _ts(0), 1)], "b1")
    mv.refresh(spark)
    first = mv.store.current_snapshot_id
    _merge(spark, sink, [("U", 2, "a", "x", 2.0, 2, _ts(1), 2)], "b2")
    mv.refresh(spark)
    assert mv.read_view(spark).collect()[0]["n_rows"] == 2
    old = mv.store.read(spark, snapshot_id=first)
    assert old.collect()[0]["n_rows"] == 1


def test_matview_minmax_recompute_only_on_extremum_threat(spark, tmp_path):
    """The min/max source rescan is restricted to groups where a REMOVED
    value tied the stored extremum: deleting a mid-range row must not put
    its group in the recompute set (steady-state refreshes stay free of
    any O(table) scan), while deleting the actual min contributor must."""
    sink = _sink(spark, tmp_path / "t")
    mv = MaterializedAggregate(sink, str(tmp_path / "mv"), ["grp"], AGGS)
    _merge(spark, sink, [
        ("U", 1, "a", "x", 1.0, 1, _ts(0), 1),
        ("U", 2, "a", "x", 2.0, 5, _ts(0), 2),
        ("U", 3, "a", "x", 3.0, 9, _ts(0), 3),
        ("U", 4, "b", "y", 4.0, 2, _ts(0), 4),
        ("U", 5, "b", "y", 5.0, 4, _ts(0), 5),
    ], "b1")
    mv.refresh(spark)

    captured: list[str] = []
    orig = mv._override_minmax

    def spy(rows, to):
        captured.extend(
            r["grp"]
            for r in rows.filter(F.col("__recompute") == 1).select("grp").collect()
        )
        return orig(rows, to)

    mv._override_minmax = spy
    # delete a's MID row (n=5: neither lo=1 nor hi=9) and b's MIN row (n=2)
    _merge(spark, sink, [
        ("D", 2, "a", "x", 0.0, 0, _ts(1), 6),
        ("D", 4, "b", "y", 0.0, 0, _ts(1), 7),
    ], "b2")
    mv.refresh(spark)
    assert captured == ["b"], f"recompute set should be exactly b, got {captured}"
    assert _got(mv, spark) == _expected(sink, spark, ["grp"])


def test_matview_follow_keeps_view_current(spark, tmp_path):
    """follow() refreshes on every observed source commit (coalescing
    commits between polls) until stopped."""
    import threading

    sink = _sink(spark, tmp_path / "t")
    mv = MaterializedAggregate(sink, str(tmp_path / "mv"), ["grp"], {"n_rows": ("count", None)})
    stop = threading.Event()
    seen: list[dict] = []

    def run():
        for m in mv.follow(spark, poll_seconds=0.2, stop_event=stop, timeout_seconds=60):
            seen.append(m)

    t = threading.Thread(target=run)
    t.start()
    try:
        _merge(spark, sink, [("U", 1, "a", "x", 1.0, 1, _ts(0), 1)], "b1")
        deadline = dt.datetime.now() + dt.timedelta(seconds=50)
        while mv.last_applied() != sink.current_snapshot_id:
            assert dt.datetime.now() < deadline, "follower never caught up"
            stop.wait(0.2)
        _merge(spark, sink, [("D", 1, "a", "x", 0.0, 0, _ts(1), 2),
                             ("U", 2, "b", "y", 2.0, 2, _ts(1), 3)], "b2")
        while mv.last_applied() != sink.current_snapshot_id:
            assert dt.datetime.now() < deadline, "follower never caught up (2)"
            stop.wait(0.2)
    finally:
        stop.set()
        t.join(timeout=30)
    assert not t.is_alive()
    assert len(seen) >= 2
    exp = {
        tuple(r)
        for r in sink.read(spark).groupBy("grp").agg(F.count(F.lit(1)).alias("n_rows")).collect()
    }
    assert _got(mv, spark) == exp == {("b", 1)}


# ------------------------- change_feed state-transition fix (regression)
def test_change_feed_late_lww_loser_emits_nothing(spark, tmp_path):
    """A row added in the range that LOSES cross-batch last-writer-wins
    against the pre-state produced no state transition and must not
    appear in the typed feed (previously: phantom 'update' whose
    post-image was not the table's state)."""
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    sink.merge(
        spark.createDataFrame(
            [("c1", 0, "user", "current", None, _ts(5), "insert", 10)],
            "conv_id string, turn_idx int, role string, text string, tool string, "
            "ts timestamp, op string, seq long",
        ),
        "b-0",
    )
    frm = sink.current_snapshot_id
    sink.merge(
        spark.createDataFrame(
            [
                ("c1", 0, "user", "stale-late", None, _ts(1), "update", 11),
                ("c2", 0, "user", "real", None, _ts(6), "insert", 12),
            ],
            "conv_id string, turn_idx int, role string, text string, tool string, "
            "ts timestamp, op string, seq long",
        ),
        "b-1",
    )
    feed = sink.change_feed(spark, frm).toPandas()
    assert set(feed["conv_id"]) == {"c2"}, "late LWW loser must emit nothing"
    # and the table state is indeed unchanged for c1
    live = sink.read(spark).filter(F.col("conv_id") == "c1").collect()
    assert live[0]["text"] == "current"


def test_change_feed_insert_under_newer_tombstone_emits_nothing(spark, tmp_path):
    """A key tombstoned at ts=5: a late 'insert' at ts=2 arriving in the
    range cannot resurrect it (tombstone wins LWW) -- no transition."""
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    sink.merge(
        spark.createDataFrame(
            [("c1", 0, "user", None, None, _ts(5), "D", 10)],
            "conv_id string, turn_idx int, role string, text string, tool string, "
            "ts timestamp, op string, seq long",
        ),
        "b-0",
    )
    frm = sink.current_snapshot_id
    sink.merge(
        spark.createDataFrame(
            [("c1", 0, "user", "zombie", None, _ts(2), "insert", 11)],
            "conv_id string, turn_idx int, role string, text string, tool string, "
            "ts timestamp, op string, seq long",
        ),
        "b-1",
    )
    assert sink.change_feed(spark, frm).count() == 0
    assert sink.read(spark).filter(F.col("conv_id") == "c1").count() == 0


def test_matview_load_from_persisted_definition(spark, tmp_path):
    """The first refresh persists the view definition into the store's
    catalog (carried forward by merges, kept alive by expiry); a FRESH
    MaterializedAggregate.load(store_dir) must reconstruct the view --
    source, groups, aggs, min/max index -- and keep refreshing it."""
    sink = _sink(spark, tmp_path / "t")
    mv = MaterializedAggregate(sink, str(tmp_path / "mv"), ["grp"], AGGS)
    _merge(spark, sink, [
        ("U", 1, "a", "x", 1.0, 1, _ts(0), 1),
        ("U", 2, "b", "y", 2.0, 2, _ts(0), 2),
    ], "b1")
    mv.refresh(spark)

    mv2 = MaterializedAggregate.load(str(tmp_path / "mv"))
    assert mv2.source.table_dir == sink.table_dir
    assert mv2.group_by == ["grp"]
    assert mv2.aggs == mv.aggs
    assert (mv2._aux_sink is None) == (mv._aux_sink is None)
    # the loaded view continues incremental maintenance (incl. a
    # min-contributor delete routed through the projection index)
    _merge(spark, sink, [
        ("D", 1, "a", "x", 0.0, 0, _ts(1), 3),
        ("U", 3, "b", "y", 3.0, 0, _ts(1), 4),
    ], "b2")
    res = mv2.refresh(spark)
    assert not res.get("rebuild"), "loaded view must refresh incrementally"
    assert _got(mv2, spark) == _expected(sink, spark, ["grp"])
    # load on a store with no definition is a loud error
    with pytest.raises(KeyError):
        MaterializedAggregate.load(str(tmp_path / "t"))


def test_cli_matview_create_refresh_show(spark, tmp_path, capsys):
    """CLI drive: --create defines + builds the view, a later bare
    --refresh reconstructs it from the persisted definition alone."""
    import json as _json

    from fetchez_spark.cli import main

    sink = _sink(spark, tmp_path / "t")
    _merge(spark, sink, [
        ("U", 1, "a", "x", 1.0, 1, _ts(0), 1),
        ("U", 2, "a", "x", 2.0, 5, _ts(0), 2),
        ("U", 3, "b", "y", 3.0, 9, _ts(0), 3),
    ], "b1")
    rc = main([
        "matview", str(tmp_path / "mv"), "--create", str(tmp_path / "t"),
        "--group", "grp",
        "--agg", "n_rows=count",
        "--agg", "hi=max:n",
        "--show",
    ])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 2
    # second batch, then a bare refresh with NO --create: definition
    # comes from the view catalog
    _merge(spark, sink, [("D", 3, "b", "y", 0.0, 0, _ts(1), 4)], "b2")
    rc = main(["matview", str(tmp_path / "mv"), "--refresh", "--show"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 1
    assert out["applied"] == sink.current_snapshot_id


def test_table_key_recorded_and_adopted(spark, tmp_path):
    """The table key is part of its metadata: recorded at bootstrap,
    carried by every commit, adopted by a fresh-session open that names
    only the dir, and a CONFLICTING explicit key is a loud error (a
    mis-keyed writer would corrupt the LWW reduction)."""
    sink = _sink(spark, tmp_path / "t")  # key=["uid"], non-default
    _merge(spark, sink, [("U", 1, "a", "x", 1.0, 1, _ts(0), 1)], "b1")
    assert sink.manifest().get("key") == ["uid"]

    fresh = LocalSnapshotSink(str(tmp_path / "t"))
    assert fresh.key == ["uid"]
    assert fresh.read(spark).count() == 1

    with pytest.raises(ValueError, match="keyed"):
        LocalSnapshotSink(str(tmp_path / "t"), key=["grp"])
