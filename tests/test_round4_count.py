"""Metadata-only row counts: compaction records per-bucket {rows, dead,
sig} (footer row counts + a tombstone job gated by footer boolean
stats); ``count_rows`` answers ``read().count()`` from the manifest for
buckets with no pending deltas and a matching file-list signature, and
scan-falls-back per bucket otherwise.  The Iceberg count(*)-from-
manifests shape."""

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


def _mk(spark, tmp_path, n_keys=60, deletes=6):
    # long retention: tombstone winners survive the fold, so the "dead"
    # counter is actually exercised
    sink = LocalSnapshotSink(
        str(tmp_path / "t"), num_buckets=4, compact_every=10**9,
        tombstone_retention_seconds=10**9,
    )
    rows = [ev("U", f"c{i:04d}", 0, f"v{i}", i, i) for i in range(n_keys)]
    sink.merge(_df(spark, rows), "b1")
    dels = [ev("D", f"c{i:04d}", 0, None, 1000 + i, 1000 + i) for i in range(deletes)]
    sink.merge(_df(spark, dels), "b2")
    return sink


def test_count_from_metadata_after_full_compact(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="not metadata-answerable"):
        sink.count_rows()  # pre-compact: deltas pending, no stats
    sink.compact(spark)
    n_meta = sink.count_rows()  # NO SparkSession: manifest-only
    assert n_meta == 54 == sink.read(spark).count()
    assert sink.manifest()["bucket_rows"]  # stats recorded
    # tombstone winners kept by retention are counted out via "dead"
    assert any(int(e["dead"]) > 0 for e in sink.manifest()["bucket_rows"].values())


def test_count_falls_back_per_bucket_on_new_deltas(spark, tmp_path):
    sink = _mk(spark, tmp_path, deletes=0)
    sink.compact(spark)
    assert sink.count_rows() == 60
    # a new merge adds a delta to SOME buckets: metadata-only now refuses,
    # spark fallback scans only the stale buckets and stays exact
    sink.merge(_df(spark, [ev("U", "c0001", 0, "upd", 5000, 5000),
                           ev("U", "cNEW1", 0, "new", 5001, 5001)]), "b3")
    with pytest.raises(ValueError, match="not metadata-answerable"):
        sink.count_rows()
    assert sink.count_rows(spark) == 61 == sink.read(spark).count()
    # re-compact restores the pure-metadata answer
    sink.compact(spark)
    assert sink.count_rows() == 61


def test_count_sig_invalidates_on_rewrite(spark, tmp_path):
    sink = _mk(spark, tmp_path, deletes=0)
    sink.compact(spark)
    assert sink.count_rows() == 60
    sink.rebucket(spark, 8)  # every base rewritten, stats dropped
    with pytest.raises(ValueError):
        sink.count_rows()
    assert sink.count_rows(spark) == 60


def test_count_respects_snapshot_pin(spark, tmp_path):
    sink = _mk(spark, tmp_path, deletes=0)
    sink.compact(spark)
    pinned = sink.current_snapshot_id
    sink.merge(_df(spark, [ev("U", "cNEW9", 0, "x", 9000, 9000)]), "b9")
    sink.compact(spark)
    assert sink.count_rows() == 61
    assert sink.count_rows(snapshot_id=pinned) == 60


def test_cli_count(spark, tmp_path, capsys):
    import json as _json

    from fetchez_spark.cli import main

    sink = _mk(spark, tmp_path, deletes=0)
    sink.compact(spark)
    rc = main(["count", str(tmp_path / "t")])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out)
    assert out == {"rows": 60, "metadata_only": True}
