"""Write-time expectations (round 4, third session).

``LocalSnapshotSink(expectations=[(name, sql_condition, action)])`` is
the Delta-Live-Tables-shaped data-quality gate at the merge boundary:
``fail`` aborts the whole commit before the manifest swap (all-or-
nothing), ``drop`` silently excludes violating rows, ``quarantine``
excludes them AND persists them with the violated-expectation names to
the table's quarantine area for triage.  fail/drop ride the existing
merge Observation (zero extra passes over the batch); quarantine adds
one job over violating rows only.  (Reference analog: per-entry status
validation in the audit hook, hooks/builtins/metadata/audit.py:23-81 --
lifted to write-time enforcement.)
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fetchez_spark.sinks.local_snapshot import ExpectationFailed, LocalSnapshotSink

UTC = dt.timezone.utc


def _batch(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, op string, seq long",
    )


def _ts(h: int) -> dt.datetime:
    return dt.datetime(2025, 1, 1, h, tzinfo=UTC)


ROWS = [
    ("c1", 0, "user", "hello", None, _ts(1), "I", 1),
    ("c1", 1, "assistant", None, None, _ts(2), "I", 2),  # null text
    ("c2", 0, "user", "x" * 20, None, _ts(3), "I", 3),  # long text
    ("c3", 0, None, "ok", "bash", _ts(4), "I", 4),  # null role
]


def _sink(tmp_path, expectations, name="t"):
    return LocalSnapshotSink(
        str(tmp_path / name), num_buckets=4, expectations=expectations
    )


def test_drop_excludes_violating_rows_and_counts_them(spark, tmp_path):
    sink = _sink(tmp_path, [("text_present", "text IS NOT NULL", "drop")])
    res = sink.merge(_batch(spark, ROWS), "b-0")
    assert res["rows_dropped_expectations"] == 1
    assert res["rows_failed_expectations"] == 0
    assert res["rows_quarantined"] == 0
    keys = {(r["conv_id"], r["turn_idx"]) for r in sink.read(spark).collect()}
    assert keys == {("c1", 0), ("c2", 0), ("c3", 0)}


def test_fail_aborts_the_whole_commit(spark, tmp_path):
    sink = _sink(tmp_path, [("role_present", "role IS NOT NULL", "fail")])
    pre = sink.current_snapshot_id
    with pytest.raises(ExpectationFailed, match="role_present"):
        sink.merge(_batch(spark, ROWS), "b-0")
    # all-or-nothing: even the CLEAN rows of the batch never landed
    assert sink.current_snapshot_id == pre
    assert sink.read(spark).count() == 0
    # and the table remains writable afterwards
    clean = [r for r in ROWS if r[2] is not None]
    sink.merge(_batch(spark, clean), "b-1")
    assert sink.read(spark).count() == 3


def test_quarantine_preserves_violations_for_triage(spark, tmp_path):
    sink = _sink(
        tmp_path,
        [
            ("text_present", "text IS NOT NULL", "quarantine"),
            ("text_short", "length(text) <= 10", "quarantine"),
        ],
    )
    res = sink.merge(_batch(spark, ROWS), "b-0")
    assert res["rows_quarantined"] == 2
    keys = {(r["conv_id"], r["turn_idx"]) for r in sink.read(spark).collect()}
    assert keys == {("c1", 0), ("c3", 0)}
    quar = sink.read_quarantine(spark).collect()
    by_key = {(r["conv_id"], r["turn_idx"]): r for r in quar}
    assert set(by_key) == {("c1", 1), ("c2", 0)}
    # null text violates BOTH (a null condition is a violation)
    assert by_key[("c1", 1)]["_violations"] == ["text_present", "text_short"]
    assert by_key[("c2", 0)]["_violations"] == ["text_short"]
    assert by_key[("c2", 0)]["_batch_token"] == "b-0"


def test_null_condition_counts_as_violation(spark, tmp_path):
    """A condition evaluating to NULL (e.g. comparison against a null
    column) is a violation -- nulls don't get the benefit of the doubt."""
    sink = _sink(tmp_path, [("short", "length(text) <= 10", "drop")])
    res = sink.merge(_batch(spark, ROWS), "b-0")
    assert res["rows_dropped_expectations"] == 2  # null text AND long text
    assert sink.read(spark).count() == 2


def test_quarantine_wins_over_drop_for_the_same_row(spark, tmp_path):
    sink = _sink(
        tmp_path,
        [
            ("text_present", "text IS NOT NULL", "drop"),
            ("role_known", "role IN ('user','assistant','tool')", "quarantine"),
        ],
    )
    # c3 violates role_known (quarantine); c1/1 violates text_present (drop)
    res = sink.merge(_batch(spark, ROWS), "b-0")
    assert res["rows_quarantined"] == 1
    assert res["rows_dropped_expectations"] == 1
    quar_keys = {
        (r["conv_id"], r["turn_idx"])
        for r in sink.read_quarantine(spark).collect()
    }
    assert quar_keys == {("c3", 0)}


def test_clean_batches_skip_the_quarantine_job(spark, tmp_path):
    sink = _sink(tmp_path, [("text_present", "text IS NOT NULL", "quarantine")])
    clean = [r for r in ROWS if r[3] is not None]
    res = sink.merge(_batch(spark, clean), "b-0")
    assert res["rows_quarantined"] == 0
    assert "quarantine_dir" not in res
    assert sink.read_quarantine(spark).count() == 0


def test_expectations_compose_with_lww_merge(spark, tmp_path):
    """Dropped rows are dropped as CHANGE EVENTS: an earlier clean event
    for the same key stays visible when a later violating event is
    rejected."""
    sink = _sink(tmp_path, [("text_present", "text IS NOT NULL", "drop")])
    sink.merge(_batch(spark, [("c1", 0, "user", "v1", None, _ts(1), "I", 1)]), "b-0")
    sink.merge(_batch(spark, [("c1", 0, "user", None, None, _ts(2), "U", 2)]), "b-1")
    assert [r["text"] for r in sink.read(spark).collect()] == ["v1"]


def test_invalid_action_rejected(tmp_path):
    with pytest.raises(ValueError, match="fail/drop/quarantine"):
        LocalSnapshotSink(
            str(tmp_path / "t"), expectations=[("x", "1=1", "explode")]
        )


def test_fail_leaves_no_uncommitted_payload(spark, tmp_path):
    """The aborted commit's payload dir is removed (the sid claim dir
    persists, same contract as a crashed write)."""
    import os

    sink = _sink(tmp_path, [("role_present", "role IS NOT NULL", "fail")])
    with pytest.raises(ExpectationFailed):
        sink.merge(_batch(spark, ROWS), "b-0")
    data = str(tmp_path / "t" / "data")
    for sid in os.listdir(data):
        assert not os.path.isdir(os.path.join(data, sid, "d")), sid


def test_excluded_rows_never_advance_the_watermark(spark, tmp_path):
    """A quarantined/dropped row with a bogus FUTURE ts must not push the
    event-time high watermark past committed data — the horizons keyed
    off it (late rejection, row TTL, tombstone purge) would start
    discarding legitimate rows.  Junk timestamps are exactly what the
    gates catch."""
    t = str(tmp_path / "hwm")
    sink = LocalSnapshotSink(
        t, num_buckets=2, compact_every=10**9,
        expectations=[("text_present", "text IS NOT NULL", "quarantine")],
        late_tolerance_seconds=3600.0,
    )
    far_future = dt.datetime(2099, 1, 1, tzinfo=UTC)
    sink.merge(
        _batch(spark, [
            ("c1", 0, "user", "ok", None, _ts(5), "insert", 1),
            ("junk", 0, "user", None, None, far_future, "insert", 2),
        ]),
        "b-0",
    )
    hwm = sink.manifest().get("high_watermark")
    assert hwm is not None and hwm.startswith("2025-01-01 05:00")
    # a legitimate slightly-later event still lands (it would have been
    # rejected as too-late against a 2099 watermark)
    sink.merge(
        _batch(spark, [("c2", 0, "user", "later", None, _ts(6), "insert", 3)]),
        "b-1",
    )
    got = sink.read(spark)
    assert got.filter("text = 'later'").count() == 1
    assert got.count() == 2
    assert sink.read_quarantine(spark).count() == 1


# ------------------------------------------------ dead-letter requeue

def test_requeue_after_gate_drop_lands_rows_and_clears_quarantine(
    spark, tmp_path
):
    sink = _sink(tmp_path, [("text_present", "text IS NOT NULL", "quarantine")])
    sink.merge(_batch(spark, ROWS), "b-0")
    assert sink.read_quarantine(spark).count() == 1
    # operator drops the gate (decides null text is fine), then requeues
    sink.drop_expectation("text_present")
    out = sink.requeue_quarantine(spark)
    assert out == {
        "batches": 1, "requeued_rows": 1, "skipped_committed": 0,
        "still_quarantined": [],
    }
    assert sink.read_quarantine(spark).count() == 0
    keys = {(r["conv_id"], r["turn_idx"]) for r in sink.read(spark).collect()}
    assert ("c1", 1) in keys  # the quarantined row landed
    # idempotent: nothing left to do
    again = sink.requeue_quarantine(spark)
    assert again["batches"] == 0 and again["requeued_rows"] == 0


def test_requeue_with_transform_repairs_rows_under_live_gate(spark, tmp_path):
    sink = _sink(tmp_path, [("text_present", "text IS NOT NULL", "quarantine")])
    sink.merge(_batch(spark, ROWS), "b-0")
    out = sink.requeue_quarantine(
        spark, transform=lambda df: df.withColumn(
            "text", F.coalesce(F.col("text"), F.lit("[redacted]"))
        )
    )
    assert out["requeued_rows"] == 1 and out["still_quarantined"] == []
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in sink.read(spark).collect()
    }
    assert got[("c1", 1)] == "[redacted]"


def test_requeue_still_violating_rows_requarantine(spark, tmp_path):
    sink = _sink(tmp_path, [("text_present", "text IS NOT NULL", "quarantine")])
    sink.merge(_batch(spark, ROWS), "b-0")
    out = sink.requeue_quarantine(spark)  # no fix: the row re-gates
    assert out["requeued_rows"] == 1
    assert len(out["still_quarantined"]) == 1  # new dir, old one gone
    q = sink.read_quarantine(spark)
    assert q.count() == 1
    assert q.collect()[0]["conv_id"] == "c1"


def test_requeue_does_not_resurrect_stale_events(spark, tmp_path):
    sink = _sink(tmp_path, [("text_present", "text IS NOT NULL", "quarantine")])
    sink.merge(_batch(spark, ROWS), "b-0")
    # while quarantined, a NEWER event for the same key commits
    sink.merge(
        _batch(spark, [("c1", 1, "assistant", "newer", None, _ts(9), "I", 9)]),
        "b-1",
    )
    sink.drop_expectation("text_present")
    sink.requeue_quarantine(spark)
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in sink.read(spark).collect()
    }
    assert got[("c1", 1)] == "newer"  # the old (ts 2) event lost LWW


def test_requeue_aborts_on_still_failing_fail_gate(spark, tmp_path):
    sink = _sink(tmp_path, [("text_present", "text IS NOT NULL", "quarantine")])
    sink.merge(_batch(spark, ROWS), "b-0")
    sink.drop_expectation("text_present")
    sink.add_expectation("text_hard", "text IS NOT NULL", "fail")
    with pytest.raises(ExpectationFailed):
        sink.requeue_quarantine(spark)
    # source dir intact: nothing was lost
    assert sink.read_quarantine(spark).count() == 1


def test_cli_maintain_requeue_quarantine(spark, tmp_path, capsys):
    import json as _json

    from fetchez_spark.cli import main as cli_main

    sink = _sink(tmp_path, [("text_present", "text IS NOT NULL", "quarantine")])
    sink.merge(_batch(spark, ROWS), "b-0")
    sink.drop_expectation("text_present")
    rc = cli_main(["maintain", sink.table_dir, "--requeue-quarantine"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["requeue_quarantine"]["requeued_rows"] == 1
