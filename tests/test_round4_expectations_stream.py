"""Expectations compose with the streaming engine and with recipes
(round 4, third session): the gate lives on the sink, so every merge —
foreachBatch micro-batches included — enforces it with no engine change.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd

from fetchez_spark.changegen import ChangeLogSpec, generate_change_log, write_change_log
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink
from fetchez_spark.streaming.engine import run_stream


def test_stream_quarantines_mid_replay(spark, tmp_path):
    spec = ChangeLogSpec(num_events=2_000, num_convs=80, max_turns=6, seed=9)
    write_change_log(spec, str(tmp_path / "log"), num_chunks=4)
    sink = LocalSnapshotSink(
        str(tmp_path / "table"),
        num_buckets=4,
        expectations=[("role_known", "role IN ('user','assistant','tool')", "quarantine")],
    )
    q = run_stream(
        spark, str(tmp_path / "log"), sink, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(300)
    log = generate_change_log(spec)
    n_bad = int((~log["role"].isin(["user", "assistant", "tool"])).sum())
    quar = sink.read_quarantine(spark)
    if n_bad == 0:
        # generator only emits known roles: the gate must be a no-op and
        # quarantine empty -- still a meaningful composition check
        assert quar.count() == 0
    else:
        assert quar.count() == n_bad
    # every surviving visible row satisfies the expectation
    assert (
        sink.read(spark)
        .filter("role NOT IN ('user','assistant','tool')")
        .count()
        == 0
    )


def test_stream_drop_expectation_filters_events(spark, tmp_path):
    """A drop expectation on turn_idx removes those CHANGE EVENTS: keys
    whose every event violates never exist; keys with a surviving older
    event keep it."""
    spec = ChangeLogSpec(num_events=2_000, num_convs=80, max_turns=6, seed=9)
    write_change_log(spec, str(tmp_path / "log"), num_chunks=4)
    sink = LocalSnapshotSink(
        str(tmp_path / "table"),
        num_buckets=4,
        expectations=[("early_turns", "turn_idx < 3", "drop")],
    )
    q = run_stream(
        spark, str(tmp_path / "log"), sink, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(300)
    # oracle: LWW over the filtered log
    log = generate_change_log(spec)
    kept = log[log["turn_idx"] < 3]
    ordered = kept.sort_values(["ts", "seq"], kind="mergesort")
    winners = ordered.drop_duplicates(subset=["conv_id", "turn_idx"], keep="last")
    expected = winners[winners["op"] != "D"]
    got = sink.read(spark).toPandas()
    assert len(got) == len(expected)
    assert got["turn_idx"].max() < 3
    g = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    e = expected.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_series_equal(g["text"], e["text"], check_names=False)


def test_recipe_configures_expectations_via_sink_args(spark, tmp_path):
    """Recipes pass sink args verbatim, so YAML-shaped config reaches the
    gate: expectations arrive as 3-element lists."""
    spec = ChangeLogSpec(num_events=1_000, num_convs=40, max_turns=6, seed=3)
    write_change_log(spec, str(tmp_path / "log"), num_chunks=2)
    from fetchez_spark.recipe import Recipe

    cfg = {
        "project": "gated",
        "source": {"name": "parquet_log", "args": {"log_dir": str(tmp_path / "log")}},
        "sink": {
            "name": "local_snapshot",
            "args": {
                "table_dir": str(tmp_path / "table"),
                "num_buckets": 4,
                "expectations": [["early_turns", "turn_idx < 3", "drop"]],
            },
        },
        "run": {"mode": "replay"},
    }
    Recipe(cfg).run(spark=spark)
    sink = LocalSnapshotSink(str(tmp_path / "table"))
    assert sink.read(spark).filter("turn_idx >= 3").count() == 0
    assert sink.read(spark).count() > 0
