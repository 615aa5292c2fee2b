"""Conversation-grain operators (functions/conversations.py) over the REAL
transcript shape (conv_id, turn_idx, role, text, tool, ts) — pandas-verified
semantics plus plan hygiene (no Python UDFs, bounded Exchanges)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from pyspark.sql import functions as F

from fetchez_spark.functions.conversations import (
    alternation_violations,
    assemble_conversations,
    context_windows,
    dedup_conversations,
    session_stats,
    sessionize,
)

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def transcript(spark):
    rows = [
        # conv a: clean 3-turn conversation
        ("a", 0, "user", "hi", None, _ts(0)),
        ("a", 1, "assistant", "hello", None, _ts(1)),
        ("a", 2, "user", "bye", None, _ts(2)),
        # conv b: same first 3 roles/texts as a (prefix dup), diverges after
        ("b", 0, "user", "hi", None, _ts(0)),
        ("b", 1, "assistant", "hello", None, _ts(1)),
        ("b", 2, "user", "bye", None, _ts(90)),  # 89-min gap -> new session
        ("b", 3, "assistant", "late", "search", _ts(91)),
        # conv c: double-assistant corruption
        ("c", 0, "user", "q", None, _ts(0)),
        ("c", 1, "assistant", "a1", None, _ts(1)),
        ("c", 2, "assistant", "a2", None, _ts(2)),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )


def test_assembly_orders_turns_and_counts(transcript):
    out = assemble_conversations(transcript, sep=" | ").orderBy("conv_id").collect()
    by = {r["conv_id"]: r for r in out}
    assert by["a"]["n_turns"] == 3
    assert by["a"]["transcript"] == "user:hi | assistant:hello | user:bye"
    assert by["b"]["transcript"].endswith("assistant:late")
    # fingerprint is a function of the rendered transcript only
    assert by["a"]["convo_fp"] != by["b"]["convo_fp"]
    assert len(by["a"]["convo_fp"]) == 32


def test_assembly_order_is_turn_idx_not_input_order(spark):
    # feed turns in reverse input order; assembly must sort by turn_idx
    rows = [("x", 2, "user", "third", None, _ts(2)),
            ("x", 0, "user", "first", None, _ts(0)),
            ("x", 1, "assistant", "second", None, _ts(1))]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    out = assemble_conversations(df, sep="|").collect()[0]
    assert out["transcript"] == "user:first|assistant:second|user:third"


def test_prefix_dedup_groups_boilerplate_starts(transcript):
    groups = dedup_conversations(transcript, first_k=3).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["n_convs"] == 2
    assert g["canonical_conv"] == "a"
    # full-conversation dedup keeps them apart (b diverges at turn 3)
    assert dedup_conversations(transcript, first_k=None).count() == 0


def test_context_windows_trailing_k(transcript):
    out = context_windows(transcript, k=2, sep=" >> ").orderBy("conv_id", "turn_idx")
    rows = out.collect()
    # every turn with >=1 predecessor yields a window: a has 2, b has 3, c has 2
    assert len(rows) == 7
    a1 = [r for r in rows if r["conv_id"] == "a" and r["turn_idx"] == 1][0]
    assert a1["context"] == "user:hi >> assistant:hello"
    b3 = [r for r in rows if r["conv_id"] == "b" and r["turn_idx"] == 3][0]
    assert b3["context"] == "user:bye >> assistant:late"


def test_sessionize_splits_on_gap(transcript):
    s = sessionize(transcript, gap_seconds=1800, order_cols=("turn_idx",))
    got = {(r["conv_id"], r["turn_idx"]): r["session_idx"] for r in s.collect()}
    assert got[("a", 0)] == got[("a", 2)] == 1
    assert got[("b", 1)] == 1 and got[("b", 2)] == 2 and got[("b", 3)] == 2
    stats = session_stats(transcript, gap_seconds=1800, order_cols=("turn_idx",))
    by = {(r["conv_id"], r["session_idx"]): r for r in stats.collect()}
    assert by[("b", 1)]["n_events"] == 2
    assert by[("b", 2)]["n_events"] == 2
    assert by[("b", 2)]["duration_us"] == 60_000_000


def test_alternation_violations_finds_double_assistant(transcript):
    v = alternation_violations(transcript).collect()
    assert {(r["conv_id"], r["n_repeats"]) for r in v} == {("c", 1)}


def test_conversation_ops_on_replayed_changelog(spark, tmp_path):
    """End-to-end over the engine's own payload: replay a changegen log to
    final state, then assemble — fingerprints must match a pandas-side
    reduction of the same log (per-turn text equality, stable order)."""
    from fetchez_spark.changegen import ChangeLogSpec, generate_change_log

    pdf = generate_change_log(ChangeLogSpec(num_events=3000, num_convs=30, seed=7))
    df = spark.createDataFrame(pdf)
    latest = df.groupBy("conv_id", "turn_idx").agg(
        F.max_by(F.struct("op", "role", "text"), F.struct("ts", "seq")).alias("w")
    )
    final = latest.filter(F.col("w.op") != "D").select(
        "conv_id", "turn_idx", F.col("w.role").alias("role"), F.col("w.text").alias("text")
    )
    out = assemble_conversations(final, sep="\x1f")
    got = {r["conv_id"]: (r["n_turns"], r["transcript"]) for r in out.collect()}

    # pandas oracle: last-writer-wins by (ts, seq), deletes drop the key
    p = pdf.sort_values(["ts", "seq"]).groupby(["conv_id", "turn_idx"]).tail(1)
    p = p[p["op"] != "D"].sort_values("turn_idx")
    exp = {
        conv: (len(g), "\x1f".join(g["role"] + ":" + g["text"]))
        for conv, g in p.groupby("conv_id")
    }
    assert got == exp


def test_conversation_plans_are_codegen_only(transcript):
    for df in (
        assemble_conversations(transcript),
        dedup_conversations(transcript, first_k=2),
        context_windows(transcript, k=2),
        session_stats(transcript),
        alternation_violations(transcript),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # assembly is ONE exchange (the conv-key hash aggregate)
    plan = assemble_conversations(transcript)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1


def test_sessionize_single_exchange(transcript):
    # lag + running sum + rollup all share PARTITION BY conv -> one Exchange
    plan = (
        session_stats(transcript)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") <= 1


def test_api_conversations_and_sessions(spark, tmp_path):
    """api.conversations / api.sessions read through the sink (live +
    AS-OF) and assemble at the conversation grain."""
    from pyspark.sql import types as T

    from fetchez_spark import api
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    schema = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=2,
                             key=["conv_id", "turn_idx"], base_schema=schema)
    env = spark.createDataFrame(
        [("U", "a", 0, "user", "hi", _ts(0), 0, 0),
         ("U", "a", 1, "assistant", "yo", _ts(50), 1, 0)],
        "op string, conv_id string, turn_idx int, role string, text string, "
        "ts timestamp, seq long, src_partition int",
    )
    first = sink.merge(env, batch_token="b0")
    env2 = spark.createDataFrame(
        [("U", "a", 1, "assistant", "yo2", _ts(51), 2, 0)],
        "op string, conv_id string, turn_idx int, role string, text string, "
        "ts timestamp, seq long, src_partition int",
    )
    sink.merge(env2, batch_token="b1")

    conv = api.conversations(spark, str(tmp_path / "t"), sep="|").collect()
    assert conv[0]["transcript"] == "user:hi|assistant:yo2"
    old = api.conversations(
        spark, str(tmp_path / "t"), sep="|", snapshot_id=first["snapshot_id"]
    ).collect()
    assert old[0]["transcript"] == "user:hi|assistant:yo"
    sess = api.sessions(spark, str(tmp_path / "t"), gap_seconds=1800).collect()
    assert {(r["conv_id"], r["session_idx"], r["n_events"]) for r in sess} == {("a", 1, 1), ("a", 2, 1)}
