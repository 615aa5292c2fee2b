"""Unit fixtures from FIXTURES.md section 5: tiny hand-written change logs
with known final states (modeled on the reference's golden test style,
/root/reference/tests/test_nasadem.py:17-41)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fetchez_spark.operators.dedup import dedup_latest, detect_hot_keys
from fetchez_spark.operators.merge import batch_to_target_rows, merge_into
from fetchez_spark.schema import CHANGE_EVENT_SCHEMA

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def ev(op, conv, turn, text, ts_s, seq, role="user", tool=None, part=0):
    return (op, conv, turn, role, text, tool, T0 + dt.timedelta(seconds=ts_s), seq, part)


def events_df(spark, rows):
    return spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)


def final_state(spark, rows, batches=None):
    """Apply rows (optionally split into batches) through merge_into."""
    if batches is None:
        batches = [rows]
    acc = None
    for batch_rows in batches:
        batch = dedup_latest(events_df(spark, batch_rows))
        rows_t = batch_to_target_rows(batch)
        acc = merge_into(acc, rows_t)
    live = acc.filter(~F.col("_deleted"))
    return {
        (r["conv_id"], r["turn_idx"]): (r["text"], r["role"]) for r in live.collect()
    }


def test_insert_only(spark):
    state = final_state(
        spark,
        [ev("I", "c1", 0, "hello", 0, 0), ev("I", "c1", 1, "world", 1, 1)],
    )
    assert state == {("c1", 0): ("hello", "user"), ("c1", 1): ("world", "user")}


def test_update_overwrites_older(spark):
    state = final_state(
        spark,
        [ev("I", "c1", 0, "v1", 0, 0), ev("U", "c1", 0, "v2", 5, 1)],
    )
    assert state == {("c1", 0): ("v2", "user")}


def test_late_update_loses_to_newer_ts(spark):
    # seq 2 arrives later in the log but carries an OLDER ts -> must lose.
    state = final_state(
        spark,
        [ev("I", "c1", 0, "v1", 10, 0), ev("U", "c1", 0, "late", 3, 2)],
    )
    assert state == {("c1", 0): ("v1", "user")}


def test_late_update_loses_across_batches(spark):
    rows = [ev("I", "c1", 0, "v-new", 10, 0)]
    late = [ev("U", "c1", 0, "v-late", 3, 2)]
    state = final_state(spark, None, batches=[rows, late])
    assert state == {("c1", 0): ("v-new", "user")}


def test_duplicate_replay_is_noop(spark):
    e = ev("I", "c1", 0, "once", 0, 0)
    state = final_state(spark, [e, e, e])
    assert state == {("c1", 0): ("once", "user")}


def test_delete_then_reinsert(spark):
    state = final_state(
        spark,
        [
            ev("I", "c1", 0, "v1", 0, 0),
            ev("D", "c1", 0, None, 5, 1),
            ev("I", "c1", 0, "v2", 9, 2),
        ],
    )
    assert state == {("c1", 0): ("v2", "user")}


def test_delete_wins_and_blocks_late_update_across_batches(spark):
    b1 = [ev("I", "c1", 0, "v1", 0, 0), ev("D", "c1", 0, None, 9, 1)]
    late = [ev("U", "c1", 0, "zombie", 4, 2)]  # older than the delete
    state = final_state(spark, None, batches=[b1, late])
    assert state == {}  # tombstone must block resurrection


def test_tie_on_ts_broken_by_seq(spark):
    state = final_state(
        spark,
        [ev("U", "c1", 0, "first", 7, 10), ev("U", "c1", 0, "second", 7, 11)],
    )
    assert state == {("c1", 0): ("second", "user")}


def test_salted_dedup_equals_plain(spark):
    rows = [
        ev("I", "hot", i % 3, f"t{i}", i % 13, i) for i in range(200)
    ] + [ev("U", "cold", 0, "x", 500, 999)]
    plain = dedup_latest(events_df(spark, rows), salt=0)
    salted = dedup_latest(events_df(spark, rows), salt=8)
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in salted.collect()}
    assert a == b


def test_detect_hot_keys(spark):
    rows = [ev("I", "hot", i, "t", i, i) for i in range(50)] + [
        ev("I", "cold", 0, "t", 0, 100)
    ]
    hot = detect_hot_keys(events_df(spark, rows), threshold=10).collect()
    assert [r["conv_id"] for r in hot] == ["hot"]


def test_new_column_appears_mid_log_and_backfills_null(spark):
    b1 = events_df(spark, [ev("I", "c1", 0, "v1", 0, 0)])
    b2 = (
        events_df(spark, [ev("I", "c2", 0, "v2", 5, 1)])
        .withColumn("model", F.lit("m-large"))
    )
    acc = merge_into(None, batch_to_target_rows(dedup_latest(b1)))
    acc = merge_into(acc, batch_to_target_rows(dedup_latest(b2)))
    got = {r["conv_id"]: r["model"] for r in acc.collect()}
    assert got == {"c1": None, "c2": "m-large"}


def test_dedup_plan_is_hash_aggregate_not_window(spark):
    """Scale guard: the reduction must be a partial-agg hash aggregate
    (map-side combine), not a sort-the-world window plan."""
    df = events_df(spark, [ev("I", "c1", 0, "v", 0, 0)])
    plan = dedup_latest(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan
