"""ChangeOutbox: the table's typed change feed published as wire-format
JSON-lines files.  The full round trip (table -> debezium files ->
replica table) is oracle-checked in test_entry_oracle (outbox_roundtrip);
these pin the mechanics: cursor advance, crash-leftover cleanup, format
conflict, the streaming consumer tail, maxwell/typed encodings, recipe
follow, CLI."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fetchez_spark.operators.outbox import ChangeOutbox
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

PAYLOAD = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
T0 = dt.datetime(2024, 1, 1)


def _env(spark, rows):
    return spark.createDataFrame(
        [(op, c, tx, T0 + dt.timedelta(seconds=s), s, 0) for op, c, tx, s in rows],
        "op string, conv_id string, text string, ts timestamp, seq long, src_partition int",
    )


@pytest.fixture()
def pair(spark, tmp_path):
    sink = LocalSnapshotSink(
        str(tmp_path / "table"), num_buckets=4, key=["conv_id"],
        base_schema=PAYLOAD, compact_every=10**9,
    )
    box = ChangeOutbox(str(tmp_path / "box"), sink)
    return sink, box


def _lines(box):
    out = []
    for f in sorted(os.listdir(box.data_dir())):
        with open(os.path.join(box.data_dir(), f)) as fh:
            out += [json.loads(line) for line in fh if line.strip()]
    return out


def test_publish_emits_envelopes_and_advances_cursor(spark, pair):
    sink, box = pair
    sink.merge(_env(spark, [("U", "c1", "t1", 1), ("U", "c2", "t2", 2)]), "b0")
    out = box.refresh(spark)
    assert out["ordinal"] == 1 and out["files"] == 1
    assert box.last_applied() == sink.current_snapshot_id
    recs = _lines(box)
    assert {r["after"]["conv_id"] for r in recs} == {"c1", "c2"}
    assert all(r["op"] == "c" for r in recs)  # fresh keys -> inserts
    # caught up: nothing published
    assert box.refresh(spark).get("skipped")

    sink.merge(_env(spark, [("U", "c1", "t1x", 9), ("D", "c2", None, 10)]), "b1")
    box.refresh(spark)
    recs = _lines(box)
    # to_json drops null fields: a delete envelope has no "after" key
    ops = {(r["op"], (r.get("after") or r.get("before"))["conv_id"]) for r in recs}
    assert ("u", "c1") in ops and ("d", "c2") in ops
    upd = next(r for r in recs if r["op"] == "u")
    assert upd["before"]["text"] == "t1" and upd["after"]["text"] == "t1x"


def test_crashed_attempt_superseded_without_reusing_or_deleting_names(
    spark, pair
):
    """A crashed attempt's files stay (a consumer may have ingested
    them), the retry publishes the SAME pinned range under a fresh
    attempt id, and commits that landed meanwhile go to the NEXT
    ordinal -- so a stale published insert can never be silently netted
    out of a widened range."""
    sink, box = pair
    sink.merge(_env(spark, [("U", "c1", "t1", 1)]), "b0")
    pinned_to = sink.current_snapshot_id
    # simulate the crash: partial attempt-a00 file + INTENT landed, STATE
    # never swapped
    stale = os.path.join(box.data_dir(), "batch-00000001-a00-00000.jsonl")
    with open(stale, "w") as f:
        f.write('{"marker": "stale-attempt"}\n')
    with open(os.path.join(box.outbox_dir, "_outbox", "INTENT.json"), "w") as f:
        json.dump({"ordinal": 1, "to": pinned_to}, f)
    # a commit lands BETWEEN the crash and the retry
    sink.merge(_env(spark, [("U", "c2", "t2", 2)]), "b1")
    out = box.refresh(spark)
    assert out["ordinal"] == 1 and out["to"] == pinned_to  # range pinned
    assert os.path.exists(stale)  # published names never deleted
    fresh = [
        f for f in os.listdir(box.data_dir())
        if f.startswith("batch-00000001-a01-")
    ]
    assert fresh, "retry must publish under a fresh attempt id"
    for f in fresh:
        with open(os.path.join(box.data_dir(), f)) as fh:
            recs = [json.loads(l) for l in fh]
        assert {r["after"]["conv_id"] for r in recs} == {"c1"}  # not c2
    out2 = box.refresh(spark)  # the meanwhile-commit publishes next
    assert out2["ordinal"] == 2 and out2["to"] == sink.current_snapshot_id


def test_conflicting_source_or_format_refused_and_load(spark, pair, tmp_path):
    sink, box = pair
    other = LocalSnapshotSink(
        str(tmp_path / "other"), num_buckets=2, key=["conv_id"], base_schema=PAYLOAD
    )
    with pytest.raises(ValueError, match="conflicting source"):
        ChangeOutbox(str(tmp_path / "box"), other)
    with pytest.raises(ValueError, match="conflicting 'maxwell'"):
        ChangeOutbox(str(tmp_path / "box"), sink, format="maxwell")
    sink.merge(_env(spark, [("U", "c1", "t1", 1)]), "b0")
    box.refresh(spark)
    again = ChangeOutbox.load(str(tmp_path / "box"))
    assert again.format == "debezium"
    assert again.last_applied() == sink.current_snapshot_id


def test_maxwell_and_typed_formats_encode(spark, tmp_path):
    sink = LocalSnapshotSink(
        str(tmp_path / "t"), num_buckets=4, key=["conv_id"],
        base_schema=PAYLOAD, compact_every=10**9,
    )
    sink.merge(_env(spark, [("U", "c1", "t1", 1), ("U", "c2", "t2", 2)]), "b0")
    mx = ChangeOutbox(str(tmp_path / "mx"), sink, format="maxwell",
                      source_name="shop")
    mx.refresh(spark)
    # c1 dies, c9 is born AND dies inside the next range: the net feed
    # publishes c1's delete but nothing at all for c9
    sink.merge(_env(spark, [("D", "c1", None, 3), ("U", "c9", "t9", 4)]), "b1")
    sink.merge(_env(spark, [("D", "c9", None, 5)]), "b2")
    mx.refresh(spark)
    recs = _lines(mx)
    assert {(r["type"], r["data"]["conv_id"]) for r in recs} == {
        ("insert", "c1"), ("insert", "c2"), ("delete", "c1"),
    }
    assert all(r["database"] == "shop" for r in recs)
    ty = ChangeOutbox(str(tmp_path / "ty"), sink, format="typed")
    ty.refresh(spark)
    tr = _lines(ty)
    assert tr and all("_change_type" in r for r in tr)


def test_streaming_consumer_tails_the_outbox(spark, pair, tmp_path):
    """Full circle: outbox files re-ingested by run_stream's json tail
    reproduce the source table."""
    from fetchez_spark.functions.cdc_formats import (
        debezium_envelope_schema,
        from_debezium,
    )
    from fetchez_spark.streaming.engine import run_stream

    sink, box = pair
    sink.merge(
        _env(spark, [("U", f"c{i}", f"t{i}", i) for i in range(12)]), "b0"
    )
    box.refresh(spark)
    sink.merge(_env(spark, [("U", "c3", "t3x", 50), ("D", "c5", None, 51)]), "b1")
    box.refresh(spark)
    replica = LocalSnapshotSink(
        str(tmp_path / "replica"), num_buckets=4, key=["conv_id"],
        base_schema=PAYLOAD,
    )
    q = run_stream(
        spark, box.data_dir(), replica, str(tmp_path / "ckpt"),
        schema=debezium_envelope_schema(PAYLOAD),
        log_format="json", transforms=[from_debezium],
        source_options={"timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS"},
    )
    q.awaitTermination(300)
    a = {(r["conv_id"], r["text"]) for r in sink.read(spark).select("conv_id", "text").collect()}
    b = {(r["conv_id"], r["text"]) for r in replica.read(spark).select("conv_id", "text").collect()}
    assert a == b and len(a) == 11


def test_recipe_follow_outbox(spark, pair):
    from fetchez_spark.recipe import Recipe

    sink, box = pair
    sink.merge(_env(spark, [("U", "c1", "t1", 1)]), "b0")
    box.refresh(spark)
    sink.merge(_env(spark, [("U", "c2", "t2", 2)]), "b1")
    out = Recipe(
        {
            "view": {"kind": "outbox", "store_dir": box.outbox_dir},
            "run": {"mode": "follow", "poll_seconds": 0.2, "timeout_sec": 4},
        }
    ).run(spark)
    assert out["kind"] == "outbox" and len(out["refreshes"]) >= 1
    assert out["applied"] == sink.current_snapshot_id


def test_cli_outbox_round_trip(spark, pair, capsys):
    from fetchez_spark.cli import main as cli_main

    sink, box = pair
    sink.merge(_env(spark, [("U", "c1", "t1", 1)]), "b0")
    rc = cli_main(["outbox", box.outbox_dir, "--create", sink.table_dir])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["refresh"]["ordinal"] == 1
    assert out["applied"] == sink.current_snapshot_id


def test_compaction_only_range_publishes_nothing_but_advances(spark, pair):
    sink, box = pair
    sink.merge(_env(spark, [("U", "c1", "t1", 1)]), "b0")
    box.refresh(spark)
    before = sorted(os.listdir(box.data_dir()))
    sink.compact(spark)
    out = box.refresh(spark)
    assert out["files"] == 0
    assert box.last_applied() == sink.current_snapshot_id
    assert sorted(os.listdir(box.data_dir())) == before
    # an empty publish must NOT claim an ordinal: fsck would otherwise
    # report a permanent fake coverage gap for it, and the next real
    # refresh must reuse the slot
    assert out["ordinal"] == 1
    assert box.fsck()["errors"] == []
    sink.merge(_env(spark, [("U", "c2", "t2", 2)]), "b1")
    out2 = box.refresh(spark)
    assert out2["ordinal"] == 2 and out2["files"] >= 1
    assert box.fsck()["errors"] == []


def test_rebase_bootstraps_new_consumers_and_retires_history(spark, pair, tmp_path):
    from fetchez_spark.functions.cdc_formats import (
        debezium_envelope_schema,
        from_debezium,
    )

    sink, box = pair
    sink.merge(_env(spark, [("U", f"c{i}", f"t{i}", i) for i in range(8)]), "b0")
    box.refresh(spark)
    sink.merge(_env(spark, [("U", "c3", "t3x", 50), ("D", "c5", None, 51)]), "b1")
    box.refresh(spark)
    sink.merge(_env(spark, [("U", "c9", "t9", 60)]), "b2")
    box.refresh(spark)

    out = box.rebase(spark, keep_batches=1)
    assert out["snapshot_ordinal"] == 3 and out["files"] >= 1
    names = sorted(os.listdir(box.data_dir()))
    # batches 1 and 2 retired, batch 3 kept, one snapshot present
    assert not any(n.startswith("batch-00000001-") for n in names)
    assert not any(n.startswith("batch-00000002-") for n in names)
    assert any(n.startswith("batch-00000003-") for n in names)
    assert any(n.startswith("snapshot-00000003-a00-") for n in names)

    # a brand-new consumer replays ONLY what remains and lands exactly
    # the live state (snapshot op 'r' + the kept batch)
    payload = sink.read(spark).select("conv_id", "text", "ts").schema
    wire = spark.read.schema(debezium_envelope_schema(payload)).options(
        timestampFormat="yyyy-MM-dd HH:mm:ss.SSSSSS"
    ).json(box.data_dir())
    replica = LocalSnapshotSink(
        str(tmp_path / "replica"), num_buckets=4, key=["conv_id"],
        base_schema=payload,
    )
    replica.merge(from_debezium(wire), batch_token="boot-0")
    a = {(r["conv_id"], r["text"]) for r in sink.read(spark).select("conv_id", "text").collect()}
    b = {(r["conv_id"], r["text"]) for r in replica.read(spark).select("conv_id", "text").collect()}
    assert a == b and ("c5", "t5") not in b  # the delete held

    # the cursor keeps working after a rebase
    sink.merge(_env(spark, [("U", "c10", "t10", 70)]), "b3")
    assert box.refresh(spark)["ordinal"] == 4

    # re-rebase retires the previous snapshot (never reuses its name)
    box.rebase(spark, keep_batches=1)
    names = sorted(os.listdir(box.data_dir()))
    assert not any(n.startswith("snapshot-00000003-") for n in names)
    assert any(n.startswith("snapshot-00000004-a00-") for n in names)


def test_outbox_fsck_coverage_and_leftovers(spark, pair, capsys):
    from fetchez_spark.cli import main as cli_main

    sink, box = pair
    for i in range(3):
        sink.merge(_env(spark, [("U", f"c{i}", f"t{i}", i)]), f"b{i}")
        box.refresh(spark)
    assert box.fsck() == {"errors": [], "warnings": []}
    # delete a covering batch file outside rebase -> coverage gap error
    victim = next(
        f for f in os.listdir(box.data_dir())
        if f.startswith("batch-00000002-")
    )
    os.remove(os.path.join(box.data_dir(), victim))
    errs = box.fsck()["errors"]
    assert errs and "coverage gap" in errs[0]
    rc = cli_main(["outbox", box.outbox_dir, "--fsck"])
    assert rc == 1
    # a rebase REPAIRS the gap: the snapshot re-covers the lost range
    box.rebase(spark, keep_batches=0)
    assert box.fsck()["errors"] == []
    # crash leftovers beyond the cursor are warnings, not errors
    with open(os.path.join(box.data_dir(), "batch-00000009-a00-00000.jsonl"), "w") as f:
        f.write("{}\n")
    w = box.fsck()["warnings"]
    assert any("beyond the cursor" in x for x in w)


def test_follow_with_rebase_cadence(spark, pair):
    import threading

    sink, box = pair
    stop = threading.Event()
    results = []

    def daemon():
        for r in box.follow(
            spark, poll_seconds=0.1, stop_event=stop, rebase_every=2,
            keep_batches=0,
        ):
            results.append(r)

    t = threading.Thread(target=daemon, daemon=True)
    t.start()
    import time
    for i in range(4):
        sink.merge(_env(spark, [("U", f"c{i}", f"t{i}", i)]), f"b{i}")
        time.sleep(0.6)
    deadline = time.time() + 30
    while time.time() < deadline and sum("rebase" in r for r in results) < 2:
        time.sleep(0.3)
    stop.set()
    t.join(30)
    assert not t.is_alive()
    assert sum("rebase" in r for r in results) >= 1
    assert any(f.startswith("snapshot-") for f in os.listdir(box.data_dir()))
    assert box.fsck()["errors"] == []


def test_rebase_refused_before_first_refresh(spark, pair):
    sink, box = pair
    sink.merge(_env(spark, [("U", "c1", "t1", 1)]), "b0")
    with pytest.raises(ValueError, match="refresh\\(\\) first"):
        box.rebase(spark)


def test_multi_view_follow_honors_outbox_rebase_options(spark, pair, tmp_path):
    from fetchez_spark.recipe import Recipe

    sink, box = pair
    sink.merge(_env(spark, [("U", "c1", "t1", 1)]), "b0")
    box.refresh(spark)
    sink.merge(_env(spark, [("U", "c2", "t2", 2)]), "b1")
    out = Recipe(
        {
            "views": [
                {"kind": "outbox", "store_dir": box.outbox_dir,
                 "options": {"rebase_every": 1, "keep_batches": 0}},
                {"kind": "outbox", "store_dir": box.outbox_dir},
            ],
            "run": {"mode": "follow", "poll_seconds": 0.2, "timeout_sec": 3},
        }
    ).run(spark)
    assert any("rebase" in r for r in out["refreshes"])
    assert any(f.startswith("snapshot-") for f in os.listdir(box.data_dir()))
    # options on a non-outbox kind are a loud recipe error
    with pytest.raises(ValueError, match="only supported for outbox"):
        Recipe(
            {
                "views": [{"kind": "export", "store_dir": str(tmp_path / "x"),
                           "options": {"rebase_every": 1}}],
                "run": {"mode": "follow"},
            }
        ).run(spark)
    with pytest.raises(ValueError, match="unknown outbox options"):
        Recipe(
            {
                "view": {"kind": "outbox", "store_dir": box.outbox_dir,
                         "options": {"rebase_ever": 1}},
                "run": {"mode": "follow"},
            }
        ).run(spark)


def test_rebase_at_unchanged_cursor_bounds_stale_snapshot_attempts(spark, pair):
    """ADVICE r4 (+ r5 review): re-running rebase at an unchanged cursor
    must not accumulate a full-state copy per stale attempt — but the
    immediately-previous attempt keeps one generation of headroom for a
    consumer mid-bootstrap, so accumulation is BOUNDED AT TWO, and
    keep_batches=0 retires unconditionally."""
    sink, box = pair
    sink.merge(_env(spark, [("U", f"c{i}", f"t{i}", i) for i in range(4)]), "b0")
    box.refresh(spark)
    for _ in range(4):  # four rebases at the SAME cursor
        box.rebase(spark, keep_batches=2)
    snaps = sorted(
        {f.split("-")[2] for f in os.listdir(box.data_dir())
         if f.startswith("snapshot-")}
    )
    assert snaps == ["a02", "a03"], snaps  # current + one headroom, no more
    box.rebase(spark, keep_batches=0)  # explicit no-headroom mode
    snaps = sorted(
        {f.split("-")[2] for f in os.listdir(box.data_dir())
         if f.startswith("snapshot-")}
    )
    assert snaps == ["a04"], snaps


def test_change_outbox_reopen_explicit_format_conflict(spark, pair, tmp_path):
    """ADVICE r4: an EXPLICIT format='debezium' against a persisted
    maxwell outbox must fail on re-open (None adopts the persisted
    definition)."""
    from fetchez_spark.api import change_outbox

    sink, _ = pair
    mx_dir = str(tmp_path / "mx")
    change_outbox(mx_dir, table_dir=sink.table_dir, format="maxwell")
    assert change_outbox(mx_dir).format == "maxwell"  # None adopts
    with pytest.raises(ValueError, match="refusing the conflicting 'debezium'"):
        change_outbox(mx_dir, format="debezium")
    with pytest.raises(ValueError, match="conflicting"):
        change_outbox(mx_dir, source_name="other")


def test_change_outbox_reopen_with_table_dir_adopts_persisted_format(spark, pair, tmp_path):
    """r5 review: re-opening WITH table_dir and format=None must adopt a
    persisted maxwell/typed definition instead of resolving None to the
    debezium default and spuriously conflicting."""
    from fetchez_spark.api import change_outbox

    sink, _ = pair
    mx_dir = str(tmp_path / "mx2")
    change_outbox(mx_dir, table_dir=sink.table_dir, format="maxwell",
                  source_name="shop")
    again = change_outbox(mx_dir, table_dir=sink.table_dir)  # None adopts
    assert again.format == "maxwell" and again.source_name == "shop"
    with pytest.raises(ValueError, match="conflicting 'debezium'"):
        change_outbox(mx_dir, table_dir=sink.table_dir, format="debezium")
    with pytest.raises(ValueError, match="conflicting 'other'"):
        change_outbox(mx_dir, table_dir=sink.table_dir, source_name="other")
