"""Property-based check (hypothesis): for ANY small change log and ANY
batching of it, the engine's final state equals the independent pandas
reduction -- covering interleavings the fixed fixtures can't."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fetchez_spark.operators.merge import batch_to_target_rows, merge_into
from fetchez_spark.operators.dedup import dedup_latest
from fetchez_spark.schema import CHANGE_EVENT_SCHEMA

T0 = dt.datetime(2024, 1, 1)

# one event: (op, conv i, turn, ts seconds, payload version)
event_st = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.integers(0, 2),       # 3 conversations
    st.integers(0, 1),       # 2 turns
    st.integers(0, 5),       # coarse ts -> plenty of ties
)

log_st = st.lists(event_st, min_size=1, max_size=24)
# where to split the log into consecutive batches
splits_st = st.sets(st.integers(1, 23), max_size=3)


def _to_rows(events):
    rows = []
    for seq, (op, c, t, ts_s) in enumerate(events):
        deleted = op == "D"
        rows.append(
            (
                op,
                f"c{c}",
                t,
                None if deleted else "user",
                None if deleted else f"v{seq}",
                None,
                T0 + dt.timedelta(seconds=ts_s),
                seq,
                0,
            )
        )
    return rows


def _oracle(rows):
    df = pd.DataFrame(
        rows,
        columns=["op", "conv_id", "turn_idx", "role", "text", "tool", "ts", "seq", "src_partition"],
    )
    ordered = df.sort_values(["ts", "seq"], kind="mergesort")
    winners = ordered.drop_duplicates(subset=["conv_id", "turn_idx"], keep="last")
    live = winners[winners["op"] != "D"]
    return {(r.conv_id, r.turn_idx): r.text for r in live.itertuples()}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(events=log_st, splits=splits_st)
def test_any_log_any_batching_matches_oracle(spark, events, splits):
    rows = _to_rows(events)
    cuts = sorted(s for s in splits if s < len(rows))
    bounds = [0, *cuts, len(rows)]
    acc = None
    for a, b in zip(bounds, bounds[1:]):
        if a == b:
            continue
        batch = spark.createDataFrame(rows[a:b], CHANGE_EVENT_SCHEMA)
        acc = merge_into(acc, batch_to_target_rows(dedup_latest(batch)))
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in acc.filter("not _deleted").collect()
    }
    assert got == _oracle(rows)
