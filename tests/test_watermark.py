"""Late-tolerance watermark at the sink: events older than the committed
high-watermark minus the tolerance are rejected (bounded late acceptance,
the streaming-watermark guarantee expressed at the MERGE)."""

from __future__ import annotations

import datetime as dt

from fetchez_spark.schema import CHANGE_EVENT_SCHEMA
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def ev(op, conv, turn, text, ts_s, seq):
    return (op, conv, turn, "user", text, None, T0 + dt.timedelta(seconds=ts_s), seq, 0)


def _df(spark, rows):
    return spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)


def test_watermark_rejects_too_late_events(spark, tmp_path):
    sink = LocalSnapshotSink(
        str(tmp_path / "t"), num_buckets=4, late_tolerance_seconds=60
    )
    m1 = sink.merge(_df(spark, [ev("I", "c1", 0, "v1", 1000, 0)]), "b1")
    assert m1["rows_too_late"] == 0
    assert m1["high_watermark"].startswith("2024-01-01 12:16:40")  # T0+1000s

    # next batch: one fresh event, one 2-minutes-stale event (beyond the
    # 60s tolerance relative to the committed high watermark)
    m2 = sink.merge(
        _df(
            spark,
            [
                ev("U", "c1", 1, "fresh", 1010, 1),
                ev("U", "c1", 0, "stale", 800, 2),  # 200s older than hwm
            ],
        ),
        "b2",
    )
    assert m2["rows_too_late"] == 1
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in sink.read(spark).collect()}
    assert got == {("c1", 0): "v1", ("c1", 1): "fresh"}


def test_watermark_accepts_within_tolerance(spark, tmp_path):
    sink = LocalSnapshotSink(
        str(tmp_path / "t"), num_buckets=4, late_tolerance_seconds=3600
    )
    sink.merge(_df(spark, [ev("I", "c1", 0, "v1", 1000, 0)]), "b1")
    m2 = sink.merge(_df(spark, [ev("U", "c1", 0, "late-ok", 900, 1)]), "b2")
    assert m2["rows_too_late"] == 0
    # late event is accepted into the merge -- and then LOSES to the newer
    # row by max-(ts, seq), as CDC semantics require
    got = {r["turn_idx"]: r["text"] for r in sink.read(spark).collect()}
    assert got == {0: "v1"}


def test_no_tolerance_accepts_everything(spark, tmp_path):
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    sink.merge(_df(spark, [ev("I", "c1", 0, "v1", 1000, 0)]), "b1")
    m2 = sink.merge(_df(spark, [ev("I", "c2", 0, "ancient", 0, 1)]), "b2")
    assert m2["rows_too_late"] == 0
    assert sink.read(spark).count() == 2


def test_watermark_survives_compaction(spark, tmp_path):
    sink = LocalSnapshotSink(
        str(tmp_path / "t"), num_buckets=4, late_tolerance_seconds=60
    )
    sink.merge(_df(spark, [ev("I", "c1", 0, "v1", 1000, 0)]), "b1")
    sink.compact(spark)
    assert sink.manifest().get("high_watermark") is not None
    m = sink.merge(_df(spark, [ev("U", "c1", 0, "stale", 100, 1)]), "b2")
    assert m["rows_too_late"] == 1
