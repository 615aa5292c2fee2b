"""Persisted table properties (the Iceberg TBLPROPERTIES analog).

The maintenance/retention policy knobs (auto-compaction thresholds,
sort-on-compact, row TTL, tombstone retention, delta compression) are part
of the TABLE's metadata, not the session's: recorded at bootstrap when the
creating constructor sets them, adopted by every fresh-session open that
leaves them at the default, settable later via one metadata-only commit.
Persisting them is a correctness matter, not convenience — row_ttl_seconds
changes what a READER sees, and CLI/cron maintenance must see the table's
own policy from the dir alone.
"""

from __future__ import annotations

import datetime as dt
import json

import pytest

from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

UTC = dt.timezone.utc

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, op string, seq long"
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _ts(h: int, d: int = 1) -> dt.datetime:
    return dt.datetime(2025, 1, d, h, tzinfo=UTC)


def test_properties_recorded_at_bootstrap_and_adopted(spark, tmp_path):
    """A creating constructor's non-default policy knobs land in the root
    manifest; a fresh-session open with a default constructor adopts them
    — so the CLI/report path sees the table's own policy."""
    t = str(tmp_path / "t")
    sink = LocalSnapshotSink(
        t, num_buckets=2, compact_every=10**9,
        compact_min_bucket_bytes=123, sort_on_compact=True,
        tombstone_retention_seconds=3600.0,
    )
    sink.merge(
        _batch(spark, [("c1", 0, "user", "hi", None, _ts(1), "insert", 1)]),
        "b-0",
    )
    assert sink.properties() == {
        "compact_min_bucket_bytes": 123,
        "sort_on_compact": True,
        "tombstone_retention_seconds": 3600.0,
    }

    fresh = LocalSnapshotSink(t)
    assert fresh.compact_min_bucket_bytes == 123
    assert fresh.sort_on_compact is True
    assert fresh.tombstone_retention_seconds == 3600.0
    assert fresh.auto_compact_bytes is None  # unset stays default
    # and the health report recommends by the recorded policy
    rep = fresh.table_report()
    assert rep["properties"]["compact_min_bucket_bytes"] == 123
    assert "purge_tombstones" in {r["action"] for r in rep["recommendations"]}


def test_row_ttl_property_reaches_a_fresh_reader(spark, tmp_path):
    """The correctness case: a plain reader that only knows the dir must
    apply the table's row TTL — without persistence it would resurrect
    expired rows."""
    t = str(tmp_path / "ttl")
    day = 86_400.0
    sink = LocalSnapshotSink(
        t, num_buckets=2, compact_every=10**9, row_ttl_seconds=2 * day
    )
    sink.merge(
        _batch(spark, [
            ("old", 0, "user", "stale", None, _ts(0, d=1), "insert", 1),
            ("new", 0, "user", "live", None, _ts(0, d=5), "insert", 2),
        ]),
        "b-0",
    )
    assert sink.read(spark).count() == 1  # policy session filters
    fresh = LocalSnapshotSink(t)
    assert fresh.row_ttl_seconds == 2 * day
    got = [r["conv_id"] for r in fresh.read(spark).collect()]
    assert got == ["new"], "fresh reader must apply the persisted TTL"


def test_set_properties_is_a_metadata_commit(spark, tmp_path):
    """set_properties commits once (no change set of its own), updates the
    live sink, unsets with None, and rejects unknown names loudly."""
    t = str(tmp_path / "p")
    sink = LocalSnapshotSink(t, num_buckets=2, compact_every=10**9)
    sink.merge(
        _batch(spark, [("c1", 0, "user", "hi", None, _ts(1), "insert", 1)]),
        "b-0",
    )
    head = sink.manifest()["snapshot_id"]

    out = sink.set_properties(auto_compact_bytes=10_000, sort_on_compact=True)
    assert out == {"auto_compact_bytes": 10_000, "sort_on_compact": True}
    assert sink.auto_compact_bytes == 10_000  # live sink adopted
    m = sink.manifest()
    assert m["parent"] == head and m["stats"]["properties_set"] == [
        "auto_compact_bytes", "sort_on_compact"
    ]
    # metadata-only: the typed change feed across the commit is empty
    feed = sink.change_feed(spark, head)
    assert feed.count() == 0

    sink.set_properties(sort_on_compact=None)
    assert sink.properties() == {"auto_compact_bytes": 10_000}
    assert sink.sort_on_compact is False  # reverted to the default

    with pytest.raises(ValueError, match="unknown table properties"):
        sink.set_properties(compact_every=3)


def test_properties_survive_merges_and_compaction(spark, tmp_path):
    """Properties ride every commit shape: merge (from-scratch manifest via
    CATALOG_KEYS), minor and major compaction, and expiry keeps them on
    the surviving head."""
    t = str(tmp_path / "carry")
    sink = LocalSnapshotSink(
        t, num_buckets=2, compact_every=10**9, target_file_bytes=1 << 20
    )
    for i in range(3):
        sink.merge(
            _batch(spark, [(f"c{i}", 0, "user", "x", None, _ts(1 + i), "insert", i)]),
            f"b-{i}",
        )
    assert sink.properties() == {"target_file_bytes": 1 << 20}
    sink.compact(spark, minor=True)
    assert sink.properties() == {"target_file_bytes": 1 << 20}
    sink.compact(spark)
    assert sink.properties() == {"target_file_bytes": 1 << 20}
    sink.expire_snapshots(keep_last=1, min_age_seconds=0)
    assert LocalSnapshotSink(t).properties() == {"target_file_bytes": 1 << 20}


def test_constructor_override_is_session_only(spark, tmp_path):
    """An explicit constructor value wins over the recorded property for
    that session but does NOT rewrite the table's metadata."""
    t = str(tmp_path / "ovr")
    LocalSnapshotSink(
        t, num_buckets=2, compact_every=10**9, row_ttl_seconds=100.0
    ).merge(
        _batch(spark, [("c1", 0, "user", "hi", None, _ts(1), "insert", 1)]),
        "b-0",
    )
    override = LocalSnapshotSink(t, row_ttl_seconds=999.0)
    assert override.row_ttl_seconds == 999.0
    assert override.properties() == {"row_ttl_seconds": 100.0}
    assert LocalSnapshotSink(t).row_ttl_seconds == 100.0


def test_cli_properties_and_policy_aware_auto(spark, tmp_path, capsys):
    """CLI: --set-property records policy, --properties prints it, and
    `maintain --auto` then compacts by the table's OWN recorded threshold
    from a fresh process-style open."""
    from fetchez_spark.cli import main

    t = str(tmp_path / "cli")
    sink = LocalSnapshotSink(t, num_buckets=2, compact_every=10**9)
    for i in range(2):
        sink.merge(
            _batch(spark, [(f"c{i}", 0, "user", "x" * 50, None, _ts(1), "insert", i)]),
            f"b-{i}",
        )
    assert main(["maintain", t, "--set-property", "compact_min_bucket_bytes=1",
                 "--set-property", "tombstone_retention_seconds=60"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["properties"]["compact_min_bucket_bytes"] == 1

    assert main(["maintain", t, "--properties"]) == 0
    props = json.loads(capsys.readouterr().out)
    assert props == {"compact_min_bucket_bytes": 1,
                     "tombstone_retention_seconds": 60.0}

    assert main(["maintain", t, "--auto", "--cores", "2"]) == 0
    res = json.loads(capsys.readouterr().out)
    acts = {e["action"] for e in res["executed"]}
    assert "compact" in acts and "purge_tombstones" in acts
    assert LocalSnapshotSink(t).delta_lists() in ({}, {"0": [], "1": []}) or all(
        not v for v in LocalSnapshotSink(t).delta_lists().values()
    )
    assert sink.read(spark).count() == 2
