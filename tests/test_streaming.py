"""Structured Streaming: availableNow replay, checkpoint resume, exactly-once.

The crash/resume protocol under test (SURVEY.md section 7 step 4): kill the
query mid-replay, restart with the same checkpoint, assert no batch was
double-applied and the final state equals the oracle."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import types as T

from fetchez_spark.changegen import ChangeLogSpec, generate_change_log, oracle_final_state, write_change_log
from fetchez_spark.schema import CHANGE_EVENT_SCHEMA
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink
from fetchez_spark.streaming.engine import make_batch_fn, run_stream
from fetchez_spark.streaming.lineage import LineageLog

SPEC = ChangeLogSpec(num_events=4_000, num_convs=120, max_turns=6, seed=7)
FULL_SCHEMA = CHANGE_EVENT_SCHEMA  # no mid-stream evolution in stream tests


def _expected():
    return oracle_final_state(generate_change_log(SPEC))


def _got(spark, sink):
    return (
        sink.read(spark)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )


def _assert_matches(got, expected):
    assert len(got) == len(expected)
    for col in ["conv_id", "turn_idx", "role", "text", "tool"]:
        pd.testing.assert_series_equal(
            got[col].reset_index(drop=True),
            expected[col].reset_index(drop=True),
            check_names=False,
        )


def test_stream_available_now_full_replay(spark, tmp_path):
    write_change_log(SPEC, str(tmp_path / "log"), num_chunks=8)
    sink = LocalSnapshotSink(str(tmp_path / "table"), num_buckets=8)
    lineage = LineageLog(str(tmp_path / "lineage"))
    seen: list[int] = []
    q = run_stream(
        spark,
        str(tmp_path / "log"),
        sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
        lineage=lineage,
        on_batch=lambda bid, m: seen.append(bid),
    )
    q.awaitTermination(300)
    assert len(seen) >= 2  # multiple micro-batches
    _assert_matches(_got(spark, sink), _expected())
    recs = lineage.records()
    assert sum(r["rows_in"] for r in recs) == SPEC.num_events


def test_stream_crash_resume_exactly_once(spark, tmp_path):
    write_change_log(SPEC, str(tmp_path / "log"), num_chunks=8)
    sink = LocalSnapshotSink(str(tmp_path / "table"), num_buckets=8)
    ckpt = str(tmp_path / "ckpt")

    applied: list[int] = []

    def dying(bid: int, metrics: dict) -> None:
        applied.append(bid)
        if len(applied) == 2:
            raise RuntimeError("simulated crash after commit of batch 2")

    # NOTE: the exception fires AFTER sink.merge committed the snapshot but
    # BEFORE Spark records the batch in the checkpoint -- the worst-case
    # window.  On restart Spark replays that batch; the sink's
    # committed-token check must skip it (no double apply).
    q = run_stream(
        spark, str(tmp_path / "log"), sink, ckpt, max_files_per_trigger=2, on_batch=dying
    )
    with pytest.raises(Exception):
        q.awaitTermination(300)
        raise RuntimeError("query should have failed")

    committed_after_crash = set(sink.manifest()["committed_batches"])

    skipped: list[int] = []
    q2 = run_stream(
        spark,
        str(tmp_path / "log"),
        sink,
        ckpt,
        max_files_per_trigger=2,
        on_batch=lambda bid, m: skipped.append(bid) if m.get("skipped") else None,
    )
    q2.awaitTermination(300)

    # the batch committed-but-not-checkpointed was replayed and skipped
    # (tokens are namespaced per checkpoint dir: "<prefix>-<batch_id>")
    assert any(
        any(t == str(b) or t.endswith(f"-{b}") for t in committed_after_crash)
        for b in skipped
    )
    # every batch token committed exactly once
    tokens = list(sink.manifest()["committed_batches"])
    assert len(tokens) == len(set(tokens))
    _assert_matches(_got(spark, sink), _expected())


def test_batch_fn_transform_chain(spark, tmp_path):
    """pre-stage transform chain analog (fetchez pre-hooks): a filter
    transform drops 'system' rows before the merge."""
    write_change_log(SPEC, str(tmp_path / "log"), num_chunks=2)
    sink = LocalSnapshotSink(str(tmp_path / "table"), num_buckets=8)
    fn = make_batch_fn(sink, transforms=[lambda df: df.filter("role <> 'system' or op = 'D'")])
    log = spark.read.schema(FULL_SCHEMA).parquet(str(tmp_path / "log"))
    fn(log, 0)
    got = _got(spark, sink)
    assert not (got["role"] == "system").any()
