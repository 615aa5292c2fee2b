"""Engine-level property test: the FULL sink (MoR, flat deltas, tombstones,
compaction at arbitrary points) matches the oracle for any log + batching."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fetchez_spark.schema import CHANGE_EVENT_SCHEMA
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

T0 = dt.datetime(2024, 1, 1)

event_st = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.integers(0, 2),
    st.integers(0, 1),
    st.integers(0, 4),
)
log_st = st.lists(event_st, min_size=1, max_size=16)


def _rows(events):
    out = []
    for seq, (op, c, t, ts_s) in enumerate(events):
        d = op == "D"
        out.append(
            (op, f"c{c}", t, None if d else "user", None if d else f"v{seq}",
             None, T0 + dt.timedelta(seconds=ts_s), seq, 0)
        )
    return out


def _oracle(rows):
    df = pd.DataFrame(rows, columns=["op", "conv_id", "turn_idx", "role", "text",
                                     "tool", "ts", "seq", "src_partition"])
    w = df.sort_values(["ts", "seq"], kind="mergesort").drop_duplicates(
        subset=["conv_id", "turn_idx"], keep="last")
    return {(r.conv_id, r.turn_idx): r.text for r in w[w["op"] != "D"].itertuples()}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    events=log_st,
    split=st.integers(1, 15),
    compact_mid=st.booleans(),
    mode=st.sampled_from(["mor", "cow"]),
)
def test_sink_matches_oracle_any_batching_any_mode(spark, tmp_path_factory, events, split, compact_mid, mode):
    rows = _rows(events)
    cut = min(split, len(rows))
    table = tmp_path_factory.mktemp("sinkprop")
    sink = LocalSnapshotSink(str(table), num_buckets=4, mode=mode, compact_every=10**9)
    b1 = spark.createDataFrame(rows[:cut], CHANGE_EVENT_SCHEMA)
    sink.merge(b1, "b1")
    if compact_mid:
        sink.compact(spark)
    if rows[cut:]:
        sink.merge(spark.createDataFrame(rows[cut:], CHANGE_EVENT_SCHEMA), "b2")
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in sink.read(spark).collect()}
    assert got == _oracle(rows)


def test_lookup_prunes_to_one_bucket(spark, tmp_path):
    from fetchez_spark.changegen import ChangeLogSpec, write_change_log
    from fetchez_spark.streaming.engine import replay_batches

    chunks = write_change_log(
        ChangeLogSpec(num_events=3000, num_convs=60, seed=17), str(tmp_path / "log"), 2
    )
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=16)
    replay_batches(spark, chunks, sink)
    sink.compact(spark)  # cluster into buckets so pruning is visible
    hit = sink.lookup(spark, "conv_00000000")
    rows = hit.collect()
    assert rows and all(r["conv_id"] == "conv_00000000" for r in rows)
    # pruning: the scan reads at most 1/16th of the base files
    fl = sink.file_lists()
    total_files = sum(len(fs) for fs in fl.values())
    one_bucket = max(len(fs) for fs in fl.values())
    assert one_bucket < total_files  # manifest really is bucket-partitioned
    # cross-check against a full-scan read
    full = sink.read(spark).filter("conv_id = 'conv_00000000'").collect()
    assert {tuple(r) for r in rows} == {tuple(r) for r in full}
