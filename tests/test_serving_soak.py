"""Serving-layer soak: the parquet export (with Delta log) AND the
change outbox following ONE contended table while concurrent writers
commit mixed upsert/delete traffic and cadence compaction runs
underneath.

The unit tests pin each publisher's mechanics in isolation; this soak
asserts the serving contract holds under sustained contention: every
published version/batch rides a pinned consistent range, cursors never
skip or double-publish, and after the writers drain (a) the export's
plain-parquet state equals the table's live LWW state, (b) an
independent Delta-log replay equals the published file set, and (c)
re-ingesting EVERY outbox file through the Debezium decode path into a
fresh replica reproduces the table exactly — duplicates from
at-least-once delivery folded away by LWW, nothing lost."""

from __future__ import annotations

import datetime as dt
import json
import os
import threading
import traceback

import pytest
from pyspark.sql import functions as F

from fetchez_spark.functions.cdc_formats import (
    debezium_envelope_schema,
    from_debezium,
)
from fetchez_spark.operators.export_view import ParquetExportView
from fetchez_spark.operators.outbox import ChangeOutbox
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

UTC = dt.timezone.utc
T0 = dt.datetime(2025, 1, 1, tzinfo=UTC)

N_WRITERS = 2
COMMITS_PER_WRITER = 10
CONVS_PER_WRITER = 5


def _batch(spark, w: int, i: int):
    rows = []
    for c in range(CONVS_PER_WRITER):
        conv = f"w{w}c{c}"
        rows.append(
            ("U", conv, i % 4, "user", f"alpha{i} beta{w}",
             T0 + dt.timedelta(minutes=i, seconds=c), i * 10 + c)
        )
        if i >= 4 and i % 3 == 0:
            rows.append(
                ("D", conv, (i - 3) % 4, None, None,
                 T0 + dt.timedelta(minutes=i, seconds=30 + c), i * 10 + 5 + c)
            )
    return spark.createDataFrame(
        rows,
        "op string, conv_id string, turn_idx int, role string, text string, "
        "ts timestamp, seq long",
    ).withColumn("src_partition", F.lit(0))


@pytest.mark.slow
def test_export_and_outbox_follow_one_contended_table(spark, tmp_path):
    source = LocalSnapshotSink(
        str(tmp_path / "t"), num_buckets=8, key=["conv_id", "turn_idx"],
        compact_every=5,
    )
    source.merge(_batch(spark, 0, 0), batch_token="seed-0")

    exp = ParquetExportView(str(tmp_path / "exp"), source, delta_log=True)
    box = ChangeOutbox(str(tmp_path / "box"), source)

    stop = threading.Event()
    errors: list[str] = []

    def writer(w: int):
        s = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=8, compact_every=5)
        try:
            for i in range(1, COMMITS_PER_WRITER):
                s.merge(_batch(spark, w, i), batch_token=f"w{w}-{i}")
        except BaseException:  # pragma: no cover
            errors.append(f"writer {w}:\n{traceback.format_exc()}")

    def follower(view, name: str):
        try:
            for _ in view.follow(spark, poll_seconds=0.2, stop_event=stop):
                pass
        except BaseException:  # pragma: no cover
            errors.append(f"{name}:\n{traceback.format_exc()}")

    writers = [threading.Thread(target=writer, args=(w,)) for w in range(N_WRITERS)]
    followers = [
        threading.Thread(target=follower, args=(v, n), daemon=True)
        for v, n in [(exp, "export"), (box, "outbox")]
    ]
    for t in writers + followers:
        t.start()
    for t in writers:
        t.join(600)
        assert not t.is_alive(), "writer hung"
    stop.set()
    for t in followers:
        t.join(120)
        assert not t.is_alive(), "follower hung"
    assert not errors, f"soak failed: {errors[0]!r}"

    exp.refresh(spark)
    box.refresh(spark)
    final = source.current_snapshot_id
    assert exp.last_applied() == final
    assert box.last_applied() == final

    cols = ["conv_id", "turn_idx", "role", "text"]
    state = source.read(spark).select(*cols).localCheckpoint(eager=True)

    # (a) exported plain parquet == live LWW state, and fsck is clean
    got = exp.read(spark).select(*cols)
    assert got.exceptAll(state).count() == 0
    assert state.exceptAll(got).count() == 0
    assert exp.fsck()["errors"] == []

    # (b) independent Delta replay == the published file set
    live: dict[str, dict] = {}
    logdir = os.path.join(exp.export_dir, "_delta_log")
    for fname in sorted(os.listdir(logdir)):
        if fname.endswith(".json"):
            with open(os.path.join(logdir, fname)) as fh:
                for line in fh:
                    a = json.loads(line)
                    if "add" in a:
                        live[a["add"]["path"]] = a["add"]
                    elif "remove" in a:
                        live.pop(a["remove"]["path"], None)
    assert {os.path.join(exp.export_dir, p) for p in live} == set(
        exp.current_files()
    )

    # (c) the complete outbox replays into an equal replica
    payload = source.read(spark).select(
        "conv_id", "turn_idx", "role", "text", "ts"
    ).schema
    wire = spark.read.schema(debezium_envelope_schema(payload)).options(
        timestampFormat="yyyy-MM-dd HH:mm:ss.SSSSSS"
    ).json(box.data_dir())
    replica = LocalSnapshotSink(
        str(tmp_path / "replica"), num_buckets=8,
        key=["conv_id", "turn_idx"], base_schema=payload,
    )
    replica.merge(from_debezium(wire), batch_token="consume-0")
    rep = replica.read(spark).select(*cols)
    assert rep.exceptAll(state).count() == 0
    assert state.exceptAll(rep).count() == 0
