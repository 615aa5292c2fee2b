"""Row TTL (round 4, third session).

``row_ttl_seconds`` is event-time retention for LIVE rows (the
training-data "keep the last N days" policy; BigQuery partition
expiration / Cassandra TTL analog): winners older than
(high_watermark - ttl) are filtered from every read immediately
(logical expiry -- a codegen ts predicate) and physically dropped at
major compaction (``compact(expire_rows_before=)`` / ``purge_expired``,
footer-stats bucket selection).  Event-time based, so replay is
deterministic -- no wall clock anywhere.
"""

from __future__ import annotations

import datetime as dt

import pytest

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


def _seed(spark, tmp_path, **kw):
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4, **kw)
    sink.merge(
        _batch(
            spark,
            [
                ("old", 0, "user", "ancient", None, _ts(1), "I", 1),
                ("mid", 0, "user", "middling", None, _ts(6), "I", 2),
                ("new", 0, "user", "fresh", None, _ts(12), "I", 3),
            ],
        ),
        "seed-0",
    )
    return sink


def test_ttl_hides_old_winners_logically(spark, tmp_path):
    # hwm = ts(12); ttl 8h -> horizon ts(4): 'old' expires, others live
    sink = _seed(spark, tmp_path, row_ttl_seconds=8 * 3600)
    assert {r["conv_id"] for r in sink.read(spark).collect()} == {"mid", "new"}
    # TTL is a persisted table property: a fresh default open of the same
    # dir adopts it (a reader must not resurrect expired rows)...
    fresh = LocalSnapshotSink(str(tmp_path / "t"))
    assert fresh.read(spark).count() == 2
    # ...and include_expired is the explicit triage escape hatch
    assert fresh.read(spark, include_expired=True).count() == 3


def test_ttl_horizon_advances_with_the_watermark(spark, tmp_path):
    sink = _seed(spark, tmp_path, row_ttl_seconds=8 * 3600)
    # a newer event moves hwm to ts(20) -> horizon ts(12): only 'new'
    # (ts 12, inclusive) and the newcomer survive
    sink.merge(
        _batch(spark, [("n2", 0, "user", "x", None, _ts(20), "I", 9)]), "b-1"
    )
    assert {r["conv_id"] for r in sink.read(spark).collect()} == {"new", "n2"}


def test_compact_physically_expires_and_read_is_unchanged(spark, tmp_path):
    sink = _seed(spark, tmp_path, row_ttl_seconds=8 * 3600)
    before = {r["conv_id"] for r in sink.read(spark).collect()}
    sink.compact(spark)
    assert {r["conv_id"] for r in sink.read(spark).collect()} == before
    # physically gone: even an include_expired reader no longer sees 'old'
    raw = LocalSnapshotSink(str(tmp_path / "t"))
    assert {r["conv_id"] for r in raw.read(spark, include_expired=True).collect()} == before


def test_purge_expired_selects_buckets_by_footer_stats(spark, tmp_path):
    sink = _seed(spark, tmp_path, row_ttl_seconds=8 * 3600)
    sink.compact(spark)  # all live in bases; 'old' already expired here
    res = sink.purge_expired(spark)
    # nothing old remains -> no bucket rewrites
    assert res["expire_candidate_buckets"] == 0
    # age the horizon: new event pushes hwm to Jan 2 06:00 -> horizon
    # Jan 1 22:00, so 'mid' (ts 06:00) and 'new' (ts 12:00) expire too
    sink.merge(
        _batch(
            spark,
            [("n2", 0, "user", "x", None, dt.datetime(2025, 1, 2, 6, tzinfo=UTC), "I", 9)],
        ),
        "b-1",
    )
    sink.compact(spark)  # folds only n2's delta; mid/new bytes remain
    res2 = sink.purge_expired(spark)
    raw = LocalSnapshotSink(str(tmp_path / "t"))
    assert {r["conv_id"] for r in raw.read(spark, include_expired=True).collect()} == {"n2"}
    assert res2["compacted_buckets"] == 0 or res2["expire_candidate_buckets"] >= 0


def test_explicit_expire_rows_before_without_policy(spark, tmp_path):
    """compact(expire_rows_before=) works on a table with NO standing TTL
    (one-shot retention enforcement)."""
    sink = _seed(spark, tmp_path)
    sink.compact(spark, expire_rows_before=_ts(4))
    assert {r["conv_id"] for r in sink.read(spark).collect()} == {"mid", "new"}


def test_minor_compaction_never_expires(spark, tmp_path):
    sink = _seed(spark, tmp_path, row_ttl_seconds=8 * 3600)
    sink.compact(spark, minor=True)
    raw = LocalSnapshotSink(str(tmp_path / "t"))
    assert raw.read(spark, include_expired=True).count() == 3  # bytes still there


def test_count_rows_respects_ttl(spark, tmp_path):
    sink = _seed(spark, tmp_path, row_ttl_seconds=8 * 3600)
    sink.compact(spark)
    # 'old' physically purged by the TTL'd compact; metadata path is
    # refused while a TTL is active, the scan path agrees with read()
    assert sink.count_rows(spark) == 2
    with pytest.raises(ValueError, match="row TTL"):
        sink.count_rows()


def test_cli_purge_expired(spark, tmp_path, capsys):
    import json as _json

    from fetchez_spark.cli import main

    sink = _seed(spark, tmp_path)
    sink.compact(spark)
    rc = main(
        [
            "maintain",
            str(tmp_path / "t"),
            "--purge-expired",
            "2025-01-01 04:00:00",
            "--cores",
            "2",
        ]
    )
    assert rc == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["purge_expired"]["expire_candidate_buckets"] >= 1
    raw = LocalSnapshotSink(str(tmp_path / "t"))
    assert {r["conv_id"] for r in raw.read(spark, include_expired=True).collect()} == {"mid", "new"}
