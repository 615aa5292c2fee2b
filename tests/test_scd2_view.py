"""Incrementally-maintained SCD-2 view (operators/scd_view.py).

The structural claim under test: ANY batching/ordering of the source
change log, refreshed incrementally, yields exactly the one-shot batch
projection (scd2_history) of the full log -- including the late-arrival
case where a suppressed upsert becomes a change point, which is why the
store keeps every event.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fetchez_spark.operators.scd import scd2_history
from fetchez_spark.operators.scd_view import SCD2View
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def _env(spark, rows):
    """rows: (key, op, attr, minute) -> engine change-event frame.

    seq mirrors the minute so (ts, seq) is a stable total order no matter
    which batch a row arrives in."""
    return spark.createDataFrame(
        [(op, k, a, _ts(m), m, m % 4) for (k, op, a, m) in rows],
        "op string, k string, attr string, ts timestamp, seq long, src_partition int",
    )


def _mk_source(tmp_path, name="src"):
    return LocalSnapshotSink(
        str(tmp_path / name), num_buckets=4, key=["k"]
    )


def _mk_view(tmp_path, source, **kw):
    return SCD2View(str(tmp_path / "scd2"), source, attrs=["attr"], **kw)


def _hist_set(df):
    return {
        (
            r.k,
            r.attr,
            r.valid_from.minute,
            r.valid_to.minute if r.valid_to is not None else None,
            r.is_current,
        )
        for r in df.collect()
    }


def _oracle_set(spark, rows):
    log = spark.createDataFrame(
        [(k, op, a, _ts(m), m) for (k, op, a, m) in rows],
        "k string, op string, attr string, ts timestamp, seq long",
    )
    return _hist_set(
        scd2_history(log, key=["k"], attrs=["attr"], order=["ts", "seq"])
    )


def _drive(spark, tmp_path, batches):
    """Merge each batch, refresh after each, return the view."""
    src = _mk_source(tmp_path)
    view = _mk_view(tmp_path, src)
    for i, b in enumerate(batches):
        src.merge(_env(spark, b), batch_token=f"b-{i}")
        view.refresh(spark)
    return view


ALL_ROWS = [
    ("a", "U", "x", 1),
    ("a", "U", "x", 2),   # suppressed
    ("a", "U", "y", 4),
    ("a", "D", "y", 6),   # closes y
    ("a", "U", "x", 8),   # reopen
    ("b", "U", "p", 3),
    ("b", "U", "q", 5),
    ("c", "D", "z", 2),   # leading delete: no-op
    ("c", "U", "z", 7),
]


def test_incremental_equals_batch_in_order(spark, tmp_path):
    batches = [ALL_ROWS[:3], ALL_ROWS[3:6], ALL_ROWS[6:]]
    view = _drive(spark, tmp_path, batches)
    assert _hist_set(view.history(spark)) == _oracle_set(spark, ALL_ROWS)


def test_incremental_equals_batch_interleaved_late(spark, tmp_path):
    # round-robin split: every batch carries LATE rows relative to the
    # previous refresh (out-of-order arrival across the key's timeline)
    batches = [ALL_ROWS[0::3], ALL_ROWS[1::3], ALL_ROWS[2::3]]
    view = _drive(spark, tmp_path, batches)
    assert _hist_set(view.history(spark)) == _oracle_set(spark, ALL_ROWS)


def test_late_event_turns_suppressed_upsert_into_change_point(spark, tmp_path):
    # e1(A)@1, e2(A)@5 -> e2 suppressed; late B@3 must REOPEN A at :05.
    # This is the case that proves suppressed events are retained.
    src = _mk_source(tmp_path)
    view = _mk_view(tmp_path, src)
    src.merge(_env(spark, [("a", "U", "A", 1), ("a", "U", "A", 5)]), batch_token="b-0")
    view.refresh(spark)
    assert _hist_set(view.history(spark)) == {("a", "A", 1, None, True)}
    src.merge(_env(spark, [("a", "U", "B", 3)]), batch_token="b-1")
    view.refresh(spark)
    assert _hist_set(view.history(spark)) == {
        ("a", "A", 1, 3, False),
        ("a", "B", 3, 5, False),
        ("a", "A", 5, None, True),
    }


def test_delete_closes_open_interval_across_refreshes(spark, tmp_path):
    src = _mk_source(tmp_path)
    view = _mk_view(tmp_path, src)
    src.merge(_env(spark, [("a", "U", "x", 1)]), batch_token="b-0")
    view.refresh(spark)
    assert _hist_set(view.current(spark)) == {("a", "x", 1, None, True)}
    src.merge(_env(spark, [("a", "D", "x", 4)]), batch_token="b-1")
    view.refresh(spark)
    assert _hist_set(view.history(spark)) == {("a", "x", 1, 4, False)}
    assert view.current(spark).count() == 0


def test_replayed_events_are_idempotent(spark, tmp_path):
    src = _mk_source(tmp_path)
    view = _mk_view(tmp_path, src)
    rows = [("a", "U", "x", 1), ("a", "U", "y", 3)]
    src.merge(_env(spark, rows), batch_token="b-0")
    view.refresh(spark)
    before = _hist_set(view.history(spark))
    # the same events re-delivered in a LATER commit (a CDC replay that
    # escaped the source's token window) must change nothing
    src.merge(_env(spark, rows), batch_token="b-replay")
    view.refresh(spark)
    assert _hist_set(view.history(spark)) == before == _oracle_set(spark, rows)


def test_refresh_is_exactly_once_per_range(spark, tmp_path):
    src = _mk_source(tmp_path)
    view = _mk_view(tmp_path, src)
    src.merge(_env(spark, [("a", "U", "x", 1)]), batch_token="b-0")
    r1 = view.refresh(spark)
    assert not r1.get("skipped")
    r2 = view.refresh(spark)  # nothing new
    assert r2["skipped"]
    assert _hist_set(view.history(spark)) == {("a", "x", 1, None, True)}


def test_untouched_keys_not_rewritten(spark, tmp_path):
    src = _mk_source(tmp_path)
    view = _mk_view(tmp_path, src)
    src.merge(_env(spark, [("a", "U", "x", 1), ("b", "U", "p", 2)]), batch_token="b-0")
    view.refresh(spark)
    snap_b = {
        (r.evt_ts, r.evt_seq, r.ts)
        for r in view.store.read(spark, include_internal=True)
        .filter(F.col("k") == "b")
        .select("evt_ts", "evt_seq", "ts")
        .collect()
    }
    src.merge(_env(spark, [("a", "U", "y", 5)]), batch_token="b-1")
    view.refresh(spark)
    after_b = {
        (r.evt_ts, r.evt_seq, r.ts)
        for r in view.store.read(spark, include_internal=True)
        .filter(F.col("k") == "b")
        .select("evt_ts", "evt_seq", "ts")
        .collect()
    }
    # key b was untouched by the second range: its stored rows keep the
    # FIRST refresh's LWW stamp (no rewrite happened)
    assert after_b == snap_b


def test_lookup_point_history(spark, tmp_path):
    view = _drive(spark, tmp_path, [ALL_ROWS])
    got = _hist_set(view.lookup(spark, "a"))
    want = {t for t in _oracle_set(spark, ALL_ROWS) if t[0] == "a"}
    assert got == want


def test_load_from_persisted_definition(spark, tmp_path):
    view = _drive(spark, tmp_path, [ALL_ROWS[:5]])
    reloaded = SCD2View.load(view.store.table_dir)
    # continues incrementally where the original left off
    reloaded.source.merge(_env(spark, ALL_ROWS[5:]), batch_token="b-more")
    reloaded.refresh(spark)
    assert _hist_set(reloaded.history(spark)) == _oracle_set(spark, ALL_ROWS)


def test_additive_source_evolution_flows_through(spark, tmp_path):
    src = _mk_source(tmp_path)
    view = SCD2View(str(tmp_path / "scd2"), src)  # attrs=None: track all
    src.merge(_env(spark, [("a", "U", "x", 1)]), batch_token="b-0")
    view.refresh(spark)
    wide = _env(spark, [("a", "U", "x", 3)]).withColumn("extra", F.lit("E"))
    src.merge(wide, batch_token="b-1")
    view.refresh(spark)
    hist = view.history(spark)
    assert "extra" in hist.columns
    # the store's own LWW ordinal column must never leak into the face
    assert "ts" not in hist.columns and "evt_op" not in hist.columns
    rows = {
        (r.attr, r.extra, r.valid_from.minute, r.is_current)
        for r in hist.collect()
    }
    # (x, null) -> (x, 'E') is an attribute CHANGE: new version opens
    assert rows == {("x", None, 1, False), ("x", "E", 3, True)}


def test_partial_mode_source_refused(spark, tmp_path):
    from pyspark.sql import types as T

    src = LocalSnapshotSink(
        str(tmp_path / "psrc"),
        num_buckets=4,
        key=["k"],
        merge_mode="partial",
        base_schema=T.StructType(
            [
                T.StructField("k", T.StringType()),
                T.StructField("attr", T.StringType()),
                T.StructField("ts", T.TimestampType()),
            ]
        ),
    )
    with pytest.raises(ValueError, match="partial"):
        SCD2View(str(tmp_path / "scd2"), src)


def test_api_and_cli_surface(spark, tmp_path):
    import json
    import subprocess
    import sys

    from fetchez_spark import api

    src = _mk_source(tmp_path)
    src.merge(_env(spark, ALL_ROWS[:5]), batch_token="b-0")
    store = str(tmp_path / "scd2")
    view = api.scd2_view(store, src.table_dir, attrs=["attr"])
    view.refresh(spark)
    # re-open WITHOUT the table dir: persisted definition
    reopened = api.scd2_view(store)
    assert reopened.source.table_dir == src.table_dir
    out = subprocess.run(
        [sys.executable, "-m", "fetchez_spark.cli", "scd2", store,
         "--refresh", "--show", "--limit", "50", "--cores", "2"],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["rows"] == len(_oracle_set(spark, ALL_ROWS[:5]))


def test_reserved_name_collisions_are_loud(spark, tmp_path):
    src = _mk_source(tmp_path)
    with pytest.raises(ValueError, match="reserved"):
        SCD2View(str(tmp_path / "scd2a"), src, attrs=["opens"])
    # attrs=None resolving to a reserved source column is equally loud
    src.merge(
        _env(spark, [("a", "U", "x", 1)]).withColumn("valid_to", F.lit("v")),
        batch_token="b-0",
    )
    view = SCD2View(str(tmp_path / "scd2b"), src)
    with pytest.raises(ValueError, match="reserved"):
        view.refresh(spark)


def test_wrong_source_for_existing_store_is_loud(spark, tmp_path):
    src = _mk_source(tmp_path)
    SCD2View(str(tmp_path / "scd2"), src, attrs=["attr"])
    other = _mk_source(tmp_path, name="other")
    with pytest.raises(ValueError, match="SCD-2 store over"):
        SCD2View(str(tmp_path / "scd2"), other, attrs=["attr"])


def test_store_survives_compaction_and_expiry(spark, tmp_path):
    src = _mk_source(tmp_path)
    view = _mk_view(tmp_path, src)
    for i, b in enumerate([ALL_ROWS[0::3], ALL_ROWS[1::3], ALL_ROWS[2::3]]):
        src.merge(_env(spark, b), batch_token=f"b-{i}")
        view.refresh(spark)
    view.store.compact(spark)
    view.store.expire_snapshots(keep_last=1, min_age_seconds=0)
    assert _hist_set(view.history(spark)) == _oracle_set(spark, ALL_ROWS)


# --------------------------------------------------------------- renames
def _hist_set_named(df, key="k", attr="attr"):
    return {
        (
            r[key],
            r[attr],
            r["valid_from"].minute,
            r["valid_to"].minute if r["valid_to"] is not None else None,
            r["is_current"],
        )
        for r in df.collect()
    }


def test_attr_rename_mid_life_keeps_history_exact(spark, tmp_path):
    """rename_column on a tracked source attribute must not corrupt the
    touched keys' stored history: a post-rename upsert carrying the SAME
    value stays suppressed (pre-fix, the prior events lost their values
    to the new column name and the unchanged upsert opened a spurious
    null->x interval)."""
    src = _mk_source(tmp_path)
    view = SCD2View(str(tmp_path / "scd2"), src)  # auto attrs
    src.merge(_env(spark, ALL_ROWS[:5]), batch_token="b-0")
    view.refresh(spark)
    src.rename_column("attr", "attribute")
    # ("a","U","x",9): same value as the open interval -> must suppress
    late = [("a", "U", "x", 9), ("b", "U", "r", 9)]
    env2 = _env(spark, late).withColumnRenamed("attr", "attribute")
    src.merge(env2, batch_token="b-1")
    view.refresh(spark)
    got = _hist_set_named(view.history(spark), attr="attribute")
    assert got == _oracle_set(spark, ALL_ROWS[:5] + late)
    # the presented frame speaks the CURRENT logical name
    assert "attribute" in view.history(spark).columns
    assert "attr" not in view.history(spark).columns


def test_key_rename_mid_life_flows_through(spark, tmp_path):
    src = _mk_source(tmp_path)
    view = SCD2View(str(tmp_path / "scd2"), src)
    src.merge(_env(spark, ALL_ROWS[:5]), batch_token="b-0")
    view.refresh(spark)
    src.rename_column("k", "kid")
    env2 = _env(spark, ALL_ROWS[5:]).withColumnRenamed("k", "kid")
    src.merge(env2, batch_token="b-1")
    view.refresh(spark)
    got = _hist_set_named(view.history(spark), key="kid")
    assert got == _oracle_set(spark, ALL_ROWS)
    assert view.lookup(spark, "a").count() > 0  # bucket-pruned path intact


def test_view_over_already_renamed_source(spark, tmp_path):
    """Creating the view AFTER the source renamed its key and attr must
    anchor to physical names and present logical ones."""
    src = _mk_source(tmp_path)
    src.merge(_env(spark, ALL_ROWS[:5]), batch_token="b-0")
    src.rename_column("k", "kid")
    src.rename_column("attr", "attribute")
    view = SCD2View(str(tmp_path / "scd2"), src, attrs=["attribute"])
    view.refresh(spark)
    got = _hist_set_named(view.history(spark), key="kid", attr="attribute")
    assert got == _oracle_set(spark, ALL_ROWS[:5])
    # load() maps the persisted physical set forward across the rename
    again = SCD2View.load(str(tmp_path / "scd2"))
    assert again._attrs_physical == ["attr"]
    assert _hist_set_named(
        again.history(spark), key="kid", attr="attribute"
    ) == _oracle_set(spark, ALL_ROWS[:5])


def test_reopen_with_conflicting_definition_is_loud(spark, tmp_path):
    src = _mk_source(tmp_path)
    src.merge(_env(spark, ALL_ROWS[:3]), batch_token="b-0")
    SCD2View(str(tmp_path / "scd2"), src, attrs=["attr"])
    with pytest.raises(ValueError, match="persists tracked attrs"):
        SCD2View(str(tmp_path / "scd2"), src)  # auto vs pinned
    with pytest.raises(ValueError, match="suppress_unchanged"):
        SCD2View(
            str(tmp_path / "scd2"), src, attrs=["attr"],
            suppress_unchanged=False,
        )
    # same definition reopens fine
    SCD2View(str(tmp_path / "scd2"), src, attrs=["attr"])


def test_rename_onto_interval_column_is_loud(spark, tmp_path):
    src = _mk_source(tmp_path)
    view = SCD2View(str(tmp_path / "scd2"), src)
    src.merge(_env(spark, ALL_ROWS[:3]), batch_token="b-0")
    view.refresh(spark)
    src.rename_column("attr", "valid_from")
    with pytest.raises(ValueError, match="interval columns"):
        view.history(spark).collect()
