"""Footer-statistics min/max(ts): ``ts_range`` answers the live
event-time range from parquet footers for buckets with no pending
deltas, matching stats signature, and zero tombstone winners (a dead
row's ts would pollute the bounds); per-bucket scan fallback otherwise.
The Iceberg min/max-aggregate-pushdown-from-manifests shape, on top of
the ``count_rows`` machinery."""

from __future__ import annotations

import datetime as dt

import pytest

from fetchez_spark.schema import CHANGE_EVENT_SCHEMA
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

T0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def ev(op, conv, turn, text, ts_s, seq, part=0):
    return (op, conv, turn, "user", text, None, T0 + dt.timedelta(seconds=ts_s), seq, part)


def _df(spark, rows):
    return spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)


def _scan_range(spark, sink):
    from pyspark.sql import functions as F

    row = sink.read(spark).agg(F.min("ts"), F.max("ts")).collect()[0]
    return row[0], row[1]


def test_ts_range_from_footers_after_purged_compact(spark, tmp_path):
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4, compact_every=10**9)
    rows = [ev("U", f"c{i:04d}", 0, f"v{i}", 10 + i, i) for i in range(60)]
    sink.merge(_df(spark, rows), "b1")
    # delete the extremes: the live range must EXCLUDE the tombstoned keys
    dels = [ev("D", "c0000", 0, None, 5000, 1000), ev("D", "c0059", 0, None, 5001, 1001)]
    sink.merge(_df(spark, dels), "b2")
    with pytest.raises(ValueError, match="not footer-answerable"):
        sink.ts_range()  # pre-compact: deltas pending
    # spark fallback is exact even pre-compact
    assert sink.ts_range(spark) == _scan_range(spark, sink)
    sink.compact(spark, purge_tombstones_before=dt.datetime(9999, 1, 1))
    lo, hi = sink.ts_range()  # NO SparkSession: footers only
    assert (lo, hi) == _scan_range(spark, sink)
    assert lo == (T0 + dt.timedelta(seconds=11)).replace(tzinfo=None)
    assert hi == (T0 + dt.timedelta(seconds=10 + 58)).replace(tzinfo=None)


def test_ts_range_refuses_on_retained_tombstone_winners(spark, tmp_path):
    # long retention keeps tombstone winners as dead rows in the base
    # files: their ts WOULD pollute footer bounds, so the shortcut refuses
    sink = LocalSnapshotSink(
        str(tmp_path / "t"), num_buckets=4, compact_every=10**9,
        tombstone_retention_seconds=10**9,
    )
    sink.merge(_df(spark, [ev("U", f"c{i}", 0, "v", 10 + i, i) for i in range(20)]), "b1")
    sink.merge(_df(spark, [ev("D", "c3", 0, None, 9000, 100)]), "b2")
    sink.compact(spark)
    with pytest.raises(ValueError, match="not footer-answerable"):
        sink.ts_range()
    assert sink.ts_range(spark) == _scan_range(spark, sink)


def test_ts_range_partial_fallback_scans_only_stale_buckets(spark, tmp_path):
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4, compact_every=10**9)
    sink.merge(_df(spark, [ev("U", f"c{i:04d}", 0, "v", 100 + i, i) for i in range(40)]), "b1")
    sink.compact(spark)
    assert sink.ts_range() == _scan_range(spark, sink)
    # one late update dirties SOME buckets; footer shortcut refuses,
    # spark fallback merges footer buckets with the scanned remainder
    sink.merge(_df(spark, [ev("U", "c0001", 0, "upd", 9999, 5000)]), "b2")
    with pytest.raises(ValueError, match="not footer-answerable"):
        sink.ts_range()
    assert sink.ts_range(spark) == _scan_range(spark, sink)


def test_ts_range_empty_table(spark, tmp_path):
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=2)
    assert sink.ts_range() == (None, None)


def test_ts_range_refuses_under_active_ttl(spark, tmp_path):
    sink = LocalSnapshotSink(
        str(tmp_path / "t"), num_buckets=2, compact_every=10**9,
        row_ttl_seconds=3600,
    )
    sink.merge(_df(spark, [ev("U", "a", 0, "old", 0, 0), ev("U", "b", 0, "new", 10**6, 1)]), "b1")
    sink.compact(spark)
    with pytest.raises(ValueError, match="row"):
        sink.ts_range()
    # spark path applies the logical expiry like read() does
    assert sink.ts_range(spark) == _scan_range(spark, sink)


def test_cli_count_ts_range(spark, tmp_path, capsys):
    import json as _json

    from fetchez_spark.cli import main

    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4, compact_every=10**9)
    sink.merge(_df(spark, [ev("U", f"c{i}", 0, "v", 10 + i, i) for i in range(20)]), "b1")
    sink.compact(spark)
    rc = main(["count", str(tmp_path / "t"), "--ts-range"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["rows"] == 20 and out["metadata_only"] is True
    lo, hi = out["ts_range"]
    assert lo.startswith("2024-01-01 00:00:10") and hi.startswith("2024-01-01 00:00:29")
