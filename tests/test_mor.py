"""Merge-on-read mode: ingest appends deltas, readers reduce, compaction
folds -- final state must be identical to copy-on-write at every point."""

from __future__ import annotations

import pandas as pd

from fetchez_spark.changegen import ChangeLogSpec, generate_change_log, oracle_final_state, write_change_log
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink
from fetchez_spark.streaming.engine import replay_batches

SPEC = ChangeLogSpec(num_events=5_000, num_convs=120, max_turns=8, seed=11, evolve_at=0.6)


def _pdf(spark, sink):
    return (
        sink.read(spark)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )


def test_mor_equals_cow_and_oracle(spark, tmp_path):
    chunks = write_change_log(SPEC, str(tmp_path / "log"), num_chunks=5)
    mor = LocalSnapshotSink(str(tmp_path / "mor"), num_buckets=8, mode="mor", compact_every=100)
    cow = LocalSnapshotSink(str(tmp_path / "cow"), num_buckets=8, mode="cow")
    replay_batches(spark, chunks, mor)
    replay_batches(spark, chunks, cow)
    a, b = _pdf(spark, mor), _pdf(spark, cow)
    pd.testing.assert_frame_equal(a, b)
    expected = oracle_final_state(generate_change_log(SPEC))
    assert len(a) == len(expected)
    assert (a["text"].values == expected["text"].values).all()
    # deltas actually accumulated (no auto-compaction at threshold 100)
    assert any(fs for fs in mor.manifest()["deltas"].values())


def test_mor_compaction_preserves_state(spark, tmp_path):
    chunks = write_change_log(SPEC, str(tmp_path / "log"), num_chunks=4)
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=8, mode="mor", compact_every=100)
    replay_batches(spark, chunks, sink)
    before = _pdf(spark, sink)
    res = sink.compact(spark)
    assert res["compacted_buckets"] > 0
    after = _pdf(spark, sink)
    pd.testing.assert_frame_equal(before, after)
    # all deltas folded; a second compact is a no-op commit
    assert all(not fs for fs in sink.manifest()["deltas"].values())
    sid = sink.current_snapshot_id
    res2 = sink.compact(spark)
    assert res2["compacted_buckets"] == 0 and sink.current_snapshot_id == sid


def test_mor_auto_compaction_triggers(spark, tmp_path):
    chunks = write_change_log(SPEC, str(tmp_path / "log"), num_chunks=6)
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4, mode="mor", compact_every=3)
    results = replay_batches(spark, chunks, sink)
    assert any("compacted" in r for r in results)
    # state still equals oracle after auto-compaction
    expected = oracle_final_state(generate_change_log(SPEC))
    got = _pdf(spark, sink)
    assert len(got) == len(expected)
    assert (got["text"].values == expected["text"].values).all()


def test_mor_idempotent_replay(spark, tmp_path):
    chunks = write_change_log(SPEC, str(tmp_path / "log"), num_chunks=3)
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=8, mode="mor")
    replay_batches(spark, chunks, sink)
    before = _pdf(spark, sink)
    results = replay_batches(spark, chunks, sink)
    assert all(r["skipped"] for r in results)
    pd.testing.assert_frame_equal(before, _pdf(spark, sink))
