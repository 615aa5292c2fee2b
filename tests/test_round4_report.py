"""Table health report + one-button maintenance.

table_report() is the driver-side, no-Spark-job health summary an operator
of a 100 TB table reads before deciding maintenance (per-bucket base/delta
bytes + file counts, size skew, retained history) with concrete
recommendations keyed to the table's own policy knobs; auto_maintain()
executes exactly those recommendations plus the always-safe sweeps.
"""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest

from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

UTC = dt.timezone.utc

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, op string, seq long"
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _ts(h: int) -> dt.datetime:
    return dt.datetime(2025, 1, 1, h, tzinfo=UTC)


def _bucket_of(spark, ids, nb):
    from pyspark.sql import functions as F

    rows = (
        spark.createDataFrame([(i,) for i in ids], "conv_id string")
        .select("conv_id", F.pmod(F.hash("conv_id"), F.lit(nb)).alias("b"))
        .collect()
    )
    return {r["conv_id"]: r["b"] for r in rows}


def _hot_cold_table(spark, tmp_path, **sink_kwargs):
    """A 4-bucket table with one delta-heavy bucket and three light ones."""
    sink = LocalSnapshotSink(
        str(tmp_path / "t"), num_buckets=4, compact_every=10**9, **sink_kwargs
    )
    ids = [f"c{i:03d}" for i in range(80)]
    b_of = _bucket_of(spark, ids, 4)
    hot_bucket = b_of[ids[0]]
    hot = [i for i in ids if b_of[i] == hot_bucket]
    cold = [i for i in ids if b_of[i] != hot_bucket][:3]
    sink.merge(
        _batch(spark, [
            (c, t, "user", "x" * 300, None, _ts(1), "insert", k * 100 + t)
            for k, c in enumerate(hot) for t in range(6)
        ]),
        "b-0",
    )
    sink.merge(
        _batch(spark, [
            (c, 0, "user", "y", None, _ts(2), "insert", 90_000 + k)
            for k, c in enumerate(cold)
        ]),
        "b-1",
    )
    return sink, str(hot_bucket), sorted({str(b_of[c]) for c in cold}), hot, cold


# ------------------------------------------------------------- the report
def test_table_report_numbers_match_filesystem(spark, tmp_path):
    """Per-bucket file counts and byte totals come from the manifest +
    os.path.getsize — no Spark job — and agree with a direct walk of the
    resolved file lists."""
    sink, hot_b, cold_bs, _, _ = _hot_cold_table(spark, tmp_path)
    rep = sink.table_report()

    assert rep["snapshot_id"] == sink.manifest()["snapshot_id"]
    assert rep["num_buckets"] == 4
    # every bucket with data appears; counts match the resolved lists
    deltas = sink.delta_lists()
    for b, lst in deltas.items():
        if lst:
            assert rep["buckets"][b]["delta_files"] == len(lst)
    walked = sum(
        os.path.getsize(f) for fs in deltas.values() for f in fs
    )
    assert rep["total_delta_bytes"] == walked
    assert rep["buckets"][hot_b]["delta_bytes"] > max(
        rep["buckets"][b]["delta_bytes"] for b in cold_bs
    )
    # no policy knobs configured -> no compact recommendation, few files
    acts = {r["action"] for r in rep["recommendations"]}
    assert "compact" not in acts and "minor_compact" not in acts


def test_table_report_recommends_by_the_tables_own_policy(spark, tmp_path):
    """With compact_min_bucket_bytes set, only over-threshold buckets are
    recommended — the same derivation the post-merge size trigger uses —
    and a configured tombstone retention recommends the purge sweep."""
    sink, hot_b, cold_bs, _, _ = _hot_cold_table(spark, tmp_path)
    db = {k: int(v) for k, v in sink.manifest()["delta_bytes"].items()}
    threshold = max(db[b] for b in cold_bs) + 1

    policy = LocalSnapshotSink(
        str(tmp_path / "t"),
        compact_min_bucket_bytes=threshold,
        tombstone_retention_seconds=3600,
        compact_every=10**9,
    )
    rep = policy.table_report()
    by_act = {r["action"]: r for r in rep["recommendations"]}
    assert by_act["compact"]["buckets"] == [hot_b]
    assert "purge_tombstones" in by_act

    # auto_compact_bytes alone derives the per-bucket threshold by
    # spreading the table trigger across the buckets (engine parity)
    spread = LocalSnapshotSink(
        str(tmp_path / "t"), auto_compact_bytes=threshold * 4, compact_every=10**9
    )
    assert spread._per_bucket_compact_threshold() == threshold
    rep2 = spread.table_report()
    assert {r["action"] for r in rep2["recommendations"]} >= {"compact"}


def test_table_report_flags_skew_and_many_delta_files(spark, tmp_path):
    """A dominant bucket (>=4x the mean of present buckets) recommends a
    rebucket — reported only, never auto-executed — and >=16 delta files
    in one bucket recommends a minor compaction."""
    sink = LocalSnapshotSink(
        str(tmp_path / "skew"), num_buckets=8, compact_every=10**9
    )
    import random

    rng = random.Random(11)
    ids = [f"s{i:02d}" for i in range(64)]
    b_of = _bucket_of(spark, ids, 8)
    fat_bucket = b_of[ids[0]]
    fat = [i for i in ids if b_of[i] == fat_bucket]
    thin = [i for i in ids if b_of[i] != fat_bucket]
    # incompressible payloads: constant strings dictionary-encode to ~0
    # bytes and file sizes stop reflecting content at toy scale
    sink.merge(
        _batch(spark, [
            (c, t, "user", "%01000x" % rng.getrandbits(4000), None,
             _ts(1), "insert", k * 10 + t)
            for k, c in enumerate(fat) for t in range(4)
        ]),
        "b-0",
    )
    sink.merge(
        _batch(spark, [
            (c, 0, "user", "t", None, _ts(2), "insert", 50_000 + k)
            for k, c in enumerate(thin)
        ]),
        "b-1",
    )
    rep = sink.table_report()
    assert rep["bucket_size_skew"] >= 4.0
    by_act = {r["action"]: r for r in rep["recommendations"]}
    assert "rebucket" in by_act

    # 16 one-row merges into one bucket -> minor_compact recommendation
    many = LocalSnapshotSink(
        str(tmp_path / "many"), num_buckets=1, compact_every=10**9
    )
    for i in range(16):
        many.merge(
            _batch(spark, [("m", i, "user", "w", None, _ts(3), "insert", i)]),
            f"n-{i}",
        )
    rep2 = many.table_report()
    assert rep2["max_delta_files_per_bucket"] >= 16
    assert "minor_compact" in {r["action"] for r in rep2["recommendations"]}


# --------------------------------------------------------- auto_maintain
def test_auto_maintain_executes_recommended_plan(spark, tmp_path):
    """auto_maintain folds exactly the recommended hot buckets, trims the
    snapshot history to keep_last, sweeps orphans — and leaves the visible
    state bit-identical.  Layout changes (rebucket) are reported but
    skipped as a manual action."""
    sink, hot_b, cold_bs, hot, cold = _hot_cold_table(spark, tmp_path)
    db = {k: int(v) for k, v in sink.manifest()["delta_bytes"].items()}
    threshold = max(db[b] for b in cold_bs) + 1
    policy = LocalSnapshotSink(
        str(tmp_path / "t"), compact_min_bucket_bytes=threshold, compact_every=10**9
    )
    before = sorted(
        policy.read(spark).select("conv_id", "turn_idx", "text").collect()
    )

    out = policy.auto_maintain(spark, keep_last=1, min_age_seconds=0)
    by_act = {e["action"]: e for e in out["executed"]}
    assert by_act["compact"]["result"]["compacted_buckets"] == 1
    assert "expire_snapshots" in by_act
    assert "vacuum_orphans" in by_act
    for e in out["executed"]:
        if e["action"] == "rebucket":
            assert e["result"] == {"skipped": "manual action"}

    assert policy.delta_lists().get(hot_b, []) == []
    for b in cold_bs:
        assert policy.delta_lists().get(b), "cold buckets must stay untouched"
    assert len(policy.snapshots()) <= 2  # keep_last=1 (+ the compact commit)
    after = sorted(
        policy.read(spark).select("conv_id", "turn_idx", "text").collect()
    )
    assert after == before


def test_auto_maintain_dry_run_is_pure_and_spark_is_required(spark, tmp_path):
    """dry_run returns the plan without committing anything; executing a
    plan that needs Spark without a session is a loud error, not a silent
    skip."""
    sink, hot_b, cold_bs, _, _ = _hot_cold_table(spark, tmp_path)
    db = {k: int(v) for k, v in sink.manifest()["delta_bytes"].items()}
    policy = LocalSnapshotSink(
        str(tmp_path / "t"),
        compact_min_bucket_bytes=max(db[b] for b in cold_bs) + 1,
        compact_every=10**9,
    )
    head = policy.manifest()["snapshot_id"]
    out = policy.auto_maintain(dry_run=True, keep_last=1)
    assert out["executed"] == []
    assert {s["action"] for s in out["plan"]} >= {
        "compact", "expire_snapshots", "vacuum_orphans"
    }
    assert policy.manifest()["snapshot_id"] == head, "dry_run must not commit"

    with pytest.raises(ValueError, match="needs a SparkSession"):
        policy.auto_maintain(spark=None, min_age_seconds=0)


# ------------------------------------------------------------------- CLI
def test_cli_maintain_report_and_auto(spark, tmp_path, capsys):
    """`maintain --report` prints the health report (no Spark job);
    `maintain --auto --dry-run` prints the plan without executing;
    `maintain --auto` runs the metadata-safe sweeps."""
    from fetchez_spark.cli import main

    sink, hot_b, _, _, _ = _hot_cold_table(spark, tmp_path)
    t = str(tmp_path / "t")

    assert main(["maintain", t, "--report"]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["buckets"][hot_b]["delta_files"] >= 1
    assert rep["total_delta_bytes"] > 0

    assert main(["maintain", t, "--auto", "--dry-run", "--expire", "1"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["executed"] == []
    assert {s["action"] for s in out["plan"]} >= {
        "expire_snapshots", "vacuum_orphans"
    }

    assert main(["maintain", t, "--auto"]) == 0
    out2 = json.loads(capsys.readouterr().out)
    assert {e["action"] for e in out2["executed"]} >= {"vacuum_orphans"}
    assert sink.read(spark).count() > 0


def test_table_report_freshness_block(spark, tmp_path):
    """The report carries the CDC-lag surface: wall-clock commit lag of
    the head plus the event-time high watermark (a live tail replaying
    an old backlog shows small lag + old watermark)."""
    import time

    t = str(tmp_path / "fresh")
    sink = LocalSnapshotSink(t, num_buckets=2, compact_every=10**9)
    sink.merge(
        _batch(
            spark,
            [("c1", 0, "user", "x", None,
              dt.datetime(2025, 1, 1, 5, tzinfo=UTC), "insert", 1)],
        ),
        "b-0",
    )
    fresh = LocalSnapshotSink(t).table_report()["freshness"]
    assert fresh["head_committed_at"] is not None
    assert 0 <= fresh["commit_lag_seconds"] < 120
    assert fresh["event_time_high_watermark"].startswith("2025-01-01 05:00")
    time.sleep(0.05)
    again = LocalSnapshotSink(t).table_report()["freshness"]
    assert again["commit_lag_seconds"] > fresh["commit_lag_seconds"]
