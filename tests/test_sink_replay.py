"""End-to-end: generated change log -> replay -> final state equals the
independent pandas oracle (SURVEY.md section 5 "golden final-state
equality"); sink atomicity, idempotence, time travel, bucket CoW."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from fetchez_spark.changegen import ChangeLogSpec, generate_change_log, oracle_final_state, write_change_log
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink
from fetchez_spark.streaming.engine import replay_batches
from fetchez_spark.streaming.lineage import LineageLog

SPEC = ChangeLogSpec(num_events=6_000, num_convs=150, max_turns=8, seed=42, evolve_at=0.5)


def _final_pdf(spark, sink):
    df = sink.read(spark)
    pdf = df.toPandas().sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    return pdf


def _assert_equals_oracle(got: pd.DataFrame, expected: pd.DataFrame):
    assert len(got) == len(expected)
    # per-turn text byte-equality under stable (conv_id, turn_idx) ordering
    for col in ["conv_id", "turn_idx", "role", "text", "tool"]:
        pd.testing.assert_series_equal(
            got[col].reset_index(drop=True),
            expected[col].reset_index(drop=True),
            check_names=False,
        )
    assert (got["ts"].values == expected["ts"].values).all()


def test_replay_matches_oracle_with_schema_evolution(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    chunks = write_change_log(SPEC, log_dir, num_chunks=6)
    sink = LocalSnapshotSink(str(tmp_path / "table"), num_buckets=16)
    lineage = LineageLog(str(tmp_path / "lineage"))
    results = replay_batches(spark, chunks, sink, lineage=lineage)
    assert all(not r["skipped"] for r in results)

    log = generate_change_log(SPEC)
    expected = oracle_final_state(log)
    got = _final_pdf(spark, sink)
    assert "model" in got.columns  # additive evolution landed
    _assert_equals_oracle(got, expected)
    # evolved column values match oracle too
    pd.testing.assert_series_equal(
        got["model"].reset_index(drop=True),
        expected["model"].reset_index(drop=True),
        check_names=False,
    )

    # lineage recorded every batch with per-src-partition counts
    recs = lineage.records()
    assert len(recs) == 6
    assert sum(r["rows_in"] for r in recs) == SPEC.num_events
    assert all(len(r["rows_in_per_src_partition"]) == SPEC.src_partitions for r in recs)
    ldf = lineage.read(spark)
    assert ldf.count() == 6 * SPEC.src_partitions


def test_replay_is_idempotent_exactly_once(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    chunks = write_change_log(SPEC, log_dir, num_chunks=4)
    sink = LocalSnapshotSink(str(tmp_path / "table"), num_buckets=8)
    replay_batches(spark, chunks, sink)
    before = _final_pdf(spark, sink)
    sid_before = sink.current_snapshot_id
    # full re-replay: every batch token already committed -> all no-ops
    results = replay_batches(spark, chunks, sink)
    assert all(r["skipped"] for r in results)
    assert sink.current_snapshot_id == sid_before
    after = _final_pdf(spark, sink)
    pd.testing.assert_frame_equal(before, after)


def test_partial_replay_resumes(spark, tmp_path):
    """Crash-after-batch-2 simulation: resume replays from the top; committed
    batches skip, the rest apply; final state identical to one-shot."""
    chunks = write_change_log(SPEC, str(tmp_path / "log"), num_chunks=5)
    sink = LocalSnapshotSink(str(tmp_path / "t1"), num_buckets=8)
    replay_batches(spark, chunks[:2], sink)  # "crash" here
    results = replay_batches(spark, chunks, sink)  # restart from checkpoint
    assert [r["skipped"] for r in results] == [True, True, False, False, False]

    oneshot = LocalSnapshotSink(str(tmp_path / "t2"), num_buckets=8)
    replay_batches(spark, chunks, oneshot)
    pd.testing.assert_frame_equal(_final_pdf(spark, sink), _final_pdf(spark, oneshot))


def test_time_travel_and_rollback(spark, tmp_path):
    chunks = write_change_log(SPEC, str(tmp_path / "log"), num_chunks=3)
    sink = LocalSnapshotSink(str(tmp_path / "table"), num_buckets=8)
    results = replay_batches(spark, chunks, sink)
    sids = [r["snapshot_id"] for r in results]
    n_mid = sink.read(spark, snapshot_id=sids[1]).count()
    n_final = sink.read(spark).count()
    assert n_mid != n_final or sids[1] != sids[2]
    sink.rollback(sids[1])
    assert sink.read(spark).count() == n_mid
    sink.rollback(sids[2])
    assert sink.read(spark).count() == n_final


def test_bucket_copy_on_write_carries_untouched_files(spark, tmp_path):
    """A batch touching one conv_id must rewrite only that key's bucket;
    every other bucket's files carry forward by reference (manifest CoW)."""
    chunks = write_change_log(SPEC, str(tmp_path / "log"), num_chunks=2)
    sink = LocalSnapshotSink(str(tmp_path / "table"), num_buckets=16, mode="cow")
    replay_batches(spark, chunks, sink)
    m1 = sink.manifest()
    # single-key batch
    import datetime as dt
    from fetchez_spark.schema import CHANGE_EVENT_SCHEMA
    one = spark.createDataFrame(
        [("U", "conv_00000000", 0, "user", "patched", None, dt.datetime(2030, 1, 1), 10**9, 0)],
        CHANGE_EVENT_SCHEMA,
    )
    metrics = sink.merge(one, batch_token="single")
    assert metrics["touched_buckets"] == 1
    m2 = sink.manifest()
    unchanged = [b for b in m1["files"] if m1["files"][b] == m2["files"].get(b)]
    assert len(unchanged) >= len(m1["files"]) - 1
    # and the patch is visible
    got = sink.read(spark).filter("conv_id = 'conv_00000000' and turn_idx = 0").collect()
    assert got[0]["text"] == "patched"


def test_expire_snapshots_keeps_current_readable(spark, tmp_path):
    chunks = write_change_log(SPEC, str(tmp_path / "log"), num_chunks=3)
    sink = LocalSnapshotSink(str(tmp_path / "table"), num_buckets=8)
    replay_batches(spark, chunks, sink)
    n = sink.read(spark).count()
    removed = sink.expire_snapshots(keep_last=1)
    assert removed >= 0
    assert sink.read(spark).count() == n


def test_crash_between_manifest_and_version_is_safe(spark, tmp_path):
    """Simulate dying after manifest write but before VERSION swap: the
    batch is uncommitted, replay re-merges, state converges."""
    chunks = write_change_log(SPEC, str(tmp_path / "log"), num_chunks=2)
    sink = LocalSnapshotSink(str(tmp_path / "table"), num_buckets=8)
    orig = sink._set_version

    calls = {"n": 0}

    def dying_set_version(sid):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash before pointer swap")
        orig(sid)

    sink._set_version = dying_set_version
    with pytest.raises(RuntimeError):
        sink.merge(spark.read.parquet(chunks[0]), batch_token="b0")
    sink._set_version = orig
    assert not sink.is_committed("b0")  # not committed -> replay re-merges
    m = sink.merge(spark.read.parquet(chunks[0]), batch_token="b0")
    assert not m["skipped"]
    m2 = sink.merge(spark.read.parquet(chunks[0]), batch_token="b0")
    assert m2["skipped"]
    # re-merge after the simulated crash converges to the same row set as
    # a clean single apply (merge is value-idempotent, not just token-)
    clean = LocalSnapshotSink(str(tmp_path / "clean"), num_buckets=8)
    clean.merge(spark.read.parquet(chunks[0]), batch_token="b0")
    a = sink.read(spark).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = clean.read(spark).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_vacuum_orphans_removes_only_unreferenced(spark, tmp_path):
    import os

    chunks = write_change_log(SPEC, str(tmp_path / "log"), num_chunks=2)
    sink = LocalSnapshotSink(str(tmp_path / "table"), num_buckets=8)
    replay_batches(spark, chunks, sink)
    n = sink.read(spark).count()
    # simulate a crashed commit: orphan data dir with no manifest
    orphan = os.path.join(str(tmp_path / "table"), "data", "snap-9999999999")
    os.makedirs(orphan)
    open(os.path.join(orphan, "part-zzz.parquet"), "wb").write(b"junk")
    # the default min_age guard protects IN-FLIGHT commits (data files
    # are written outside the commit lock, so a fresh unreferenced dir is
    # indistinguishable from one) -- the young orphan must survive...
    assert sink.vacuum_orphans() == 0
    assert os.path.exists(orphan)
    # ...and an explicit age of 0 (operator knows no writer is running)
    # removes it once the dir is past the hard claim-age floor (a
    # seconds-old dir is indistinguishable from a claim whose CLAIM.json
    # hasn't landed yet, so even age 0 retains it for one cycle)
    import time as _time

    old = _time.time() - 60
    os.utime(os.path.join(orphan, "part-zzz.parquet"), (old, old))
    os.utime(orphan, (old, old))
    removed = sink.vacuum_orphans(min_age_seconds=0)
    assert removed == 1
    assert not os.path.exists(orphan)
    assert sink.read(spark).count() == n  # live data untouched


def test_sql_view_and_offsets_in_manifest(spark, tmp_path):
    chunks = write_change_log(SPEC, str(tmp_path / "log"), num_chunks=2)
    sink = LocalSnapshotSink(str(tmp_path / "table"), num_buckets=8)
    replay_batches(spark, chunks, sink)
    # offsets recorded per commit (self-contained resume bookkeeping)
    assert sink.manifest()["offsets"]["files"] == [chunks[1]]
    # ... and carried FORWARD dict-merged: a commit that doesn't speak for
    # a key must not clobber another consumer's position (mirror/matview
    # positions survive unrelated merges and maintenance commits)
    df = sink.read(spark, include_internal=True).limit(0)
    sink.merge(
        df.selectExpr(
            "'U' AS op", "conv_id", "turn_idx", "role", "text", "tool",
            "ts", "_seq AS seq", "0 AS src_partition"
        ),
        "other-writer-1",
        offsets={"upstream": "snap-42"},
    )
    off = sink.manifest()["offsets"]
    assert off["files"] == [chunks[1]] and off["upstream"] == "snap-42"
    sink.create_view(spark, "transcripts")
    n = spark.sql("SELECT count(*) AS n FROM transcripts").collect()[0]["n"]
    assert n == sink.read(spark).count()
    top = spark.sql(
        "SELECT conv_id, count(*) AS turns FROM transcripts GROUP BY conv_id ORDER BY turns DESC, conv_id LIMIT 1"
    ).collect()[0]
    assert top["turns"] >= 1
