"""SCD Type-2 history projection (operators/scd.py).

Planted-sequence edge cases (leading/double deletes, delete-reopen,
unchanged-run suppression, exact-replay dedup), the
suppress_unchanged=False variant, and the one-Exchange plan pin.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from fetchez_spark.operators.scd import scd2_history


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def _log(spark, rows):
    """rows: (key, op, attr, minute, seq)"""
    return spark.createDataFrame(
        [(k, op, a, _ts(m), s) for (k, op, a, m, s) in rows],
        "k string, op string, attr string, ts timestamp, seq long",
    )


def _hist(spark, rows, **kw):
    df = scd2_history(
        _log(spark, rows), key=["k"], attrs=["attr"], order=["ts", "seq"], **kw
    )
    out = [
        (
            r.k,
            r.attr,
            r.valid_from.minute,
            r.valid_to.minute if r.valid_to is not None else None,
            r.is_current,
        )
        for r in df.collect()
    ]
    return set(out)


def test_basic_versions_and_current(spark):
    rows = [
        ("a", "U", "x", 1, 1),
        ("a", "U", "y", 3, 2),  # attr change -> new version, closes x at :03
        ("a", "U", "z", 5, 3),
    ]
    assert _hist(spark, rows) == {
        ("a", "x", 1, 3, False),
        ("a", "y", 3, 5, False),
        ("a", "z", 5, None, True),
    }


def test_unchanged_runs_suppressed(spark):
    rows = [
        ("a", "U", "x", 1, 1),
        ("a", "U", "x", 2, 2),  # same attr -> suppressed
        ("a", "U", "x", 3, 3),  # suppressed
        ("a", "U", "y", 4, 4),
        ("a", "U", "x", 5, 5),  # back to x -> NEW version (type 2, not dedup)
    ]
    assert _hist(spark, rows) == {
        ("a", "x", 1, 4, False),
        ("a", "x", 5, None, True),
        ("a", "y", 4, 5, False),
    }


def test_delete_closes_without_opening(spark):
    rows = [
        ("a", "U", "x", 1, 1),
        ("a", "D", "x", 3, 2),  # closes [1,3); no open version remains
        ("a", "U", "x", 5, 3),  # reopen SAME attr after delete -> new version
    ]
    assert _hist(spark, rows) == {
        ("a", "x", 1, 3, False),
        ("a", "x", 5, None, True),
    }


def test_leading_and_repeated_deletes_are_noops(spark):
    rows = [
        ("a", "D", "x", 1, 1),  # nothing open -> no-op
        ("a", "U", "x", 2, 2),
        ("a", "D", "x", 4, 3),
        ("a", "D", "x", 5, 4),  # already closed -> no-op (must NOT close at :05)
    ]
    assert _hist(spark, rows) == {("a", "x", 2, 4, False)}


def test_delete_sees_suppressed_predecessor(spark):
    # the run x,x is suppressed to one version, but the delete must still
    # close it (op transition is detected on the raw sequence)
    rows = [
        ("a", "U", "x", 1, 1),
        ("a", "U", "x", 2, 2),
        ("a", "D", "x", 3, 3),
    ]
    assert _hist(spark, rows) == {("a", "x", 1, 3, False)}


def test_exact_replays_dropped(spark):
    # CDC replays: identical (order) tuple appears twice; without the
    # replay-dedup pass the duplicate would break suppression
    rows = [
        ("a", "U", "x", 1, 1),
        ("a", "U", "x", 1, 1),  # exact replay
        ("a", "U", "y", 2, 2),
        ("a", "U", "y", 2, 2),  # exact replay
    ]
    assert _hist(spark, rows) == {
        ("a", "x", 1, 2, False),
        ("a", "y", 2, None, True),
    }


def test_null_attrs_null_safe(spark):
    rows = [
        ("a", "U", None, 1, 1),
        ("a", "U", None, 2, 2),  # null == null -> suppressed
        ("a", "U", "x", 3, 3),
        ("a", "U", None, 4, 4),  # x -> null is a change
    ]
    assert _hist(spark, rows) == {
        ("a", None, 1, 3, False),
        ("a", None, 4, None, True),
        ("a", "x", 3, 4, False),
    }


def test_keys_independent(spark):
    rows = [
        ("a", "U", "x", 1, 1),
        ("b", "U", "x", 2, 2),
        ("a", "D", "x", 3, 3),
    ]
    assert _hist(spark, rows) == {
        ("a", "x", 1, 3, False),
        ("b", "x", 2, None, True),
    }


def test_no_suppression_every_upsert_versions(spark):
    rows = [
        ("a", "U", "x", 1, 1),
        ("a", "U", "x", 2, 2),
        ("a", "D", "x", 3, 3),
    ]
    assert _hist(spark, rows, suppress_unchanged=False) == {
        ("a", "x", 1, 2, False),
        ("a", "x", 2, 3, False),
    }


def test_default_attrs_are_all_remaining_columns(spark):
    df = _log(spark, [("a", "U", "x", 1, 1)]).withColumn("extra", F.lit(7))
    out = scd2_history(df, key=["k"], order=["ts", "seq"])
    assert set(out.columns) == {
        "k", "attr", "extra", "valid_from", "valid_to", "is_current"
    }


def test_single_exchange_plan(spark):
    df = _log(spark, [("a", "U", "x", 1, 1), ("a", "U", "y", 2, 2)])
    plan = (
        scd2_history(df, key=["k"], attrs=["attr"], order=["ts", "seq"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert plan.lower().count("sort") <= 2, plan  # one physical sort (+ref)
