"""Malformed-line handling for JSON/CSV change-log tails
(run_stream(bad_records=), streaming/engine.py).

Spark's PERMISSIVE default parses a corrupt line into an ALL-NULL row --
which the engine would merge into the table as garbage (a null-key LWW
event).  The engine therefore never runs PERMISSIVE bare: text tails are
FAILFAST by default, with 'drop' and 'quarantine' as the audited recovery
modes.  (Reference analog: fetchez surfaces per-entry fetch failures in
the results/status channel instead of silently emitting empty entries,
/root/reference/src/fetchez/core.py:860-905.)
"""

from __future__ import annotations

import json

import pytest

from fetchez_spark.schema import CHANGE_EVENT_SCHEMA
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink
from fetchez_spark.streaming.engine import read_bad_records, run_stream


def _line(conv, turn, text, minute, seq):
    return json.dumps(
        {
            "op": "U",
            "conv_id": conv,
            "turn_idx": turn,
            "role": "user",
            "text": text,
            "tool": None,
            "ts": f"2024-01-01T00:{minute:02d}:00Z",
            "seq": seq,
            "src_partition": 0,
        }
    )


def _write_log(log_dir, with_corruption=True):
    log_dir.mkdir()
    good0 = [_line("a", 0, "hello", 0, 1), _line("b", 0, "world", 1, 2)]
    bad = ["{this is not json", '{"op": "U", "conv_id": "x", "turn_idx": }']
    chunk0 = good0 + (bad if with_corruption else [])
    (log_dir / "c0.json").write_text("\n".join(chunk0))
    (log_dir / "c1.json").write_text(_line("a", 0, "hello2", 2, 3))


def _final(spark, sink):
    return {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in sink.read(spark).collect()
    }


CLEAN_FINAL = {("a", 0): "hello2", ("b", 0): "world"}


def test_default_fail_stops_before_anything_commits(spark, tmp_path):
    """bad_records='fail' (the default): the stream dies on the corrupt
    batch BEFORE its merge -- no all-null garbage row ever lands."""
    log = tmp_path / "log"
    _write_log(log)
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    q = run_stream(
        spark, str(log), sink, str(tmp_path / "ckpt"),
        schema=CHANGE_EVENT_SCHEMA, log_format="json",
        max_files_per_trigger=1,
    )
    with pytest.raises(Exception):  # StreamingQueryException(FAILFAST)
        q.awaitTermination(300)
        q.awaitTermination()
    rows = sink.read(spark).collect()
    assert all(r["conv_id"] is not None for r in rows)
    # c0 (the corrupt batch) never committed: b/0 lives only in c0
    assert ("b", 0) not in _final(spark, sink)


def test_drop_mode_excludes_corrupt_lines_and_counts_them(spark, tmp_path):
    log = tmp_path / "log"
    _write_log(log)
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    seen: list[dict] = []
    q = run_stream(
        spark, str(log), sink, str(tmp_path / "ckpt"),
        schema=CHANGE_EVENT_SCHEMA, log_format="json",
        bad_records="drop", max_files_per_trigger=1,
        on_batch=lambda bid, m: seen.append(m),
    )
    q.awaitTermination(300)
    assert _final(spark, sink) == CLEAN_FINAL
    # no null-key garbage row
    assert all(
        r["conv_id"] is not None for r in sink.read(spark).collect()
    )
    # exact per-batch malformed counts: 2 in c0's batch, 0 in c1's
    counts = sorted(m.get("malformed_rows", 0) for m in seen)
    assert counts == [0, 2]


def test_quarantine_mode_persists_raw_lines(spark, tmp_path):
    log = tmp_path / "log"
    _write_log(log)
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    seen: list[dict] = []
    bdir = str(tmp_path / "bad")
    q = run_stream(
        spark, str(log), sink, str(tmp_path / "ckpt"),
        schema=CHANGE_EVENT_SCHEMA, log_format="json",
        bad_records="quarantine", bad_records_dir=bdir,
        max_files_per_trigger=1,
        on_batch=lambda bid, m: seen.append(m),
    )
    q.awaitTermination(300)
    assert _final(spark, sink) == CLEAN_FINAL
    bad = read_bad_records(spark, bdir)
    rows = bad.collect()
    assert len(rows) == 2
    raws = {r["_corrupt_record"] for r in rows}
    assert "{this is not json" in raws
    # every quarantined row names the batch token that hit it
    assert all(r["_batch_token"] for r in rows)
    # the clean batch wrote NO quarantine dir (no empty-litter)
    import os

    assert len(os.listdir(bdir)) == 1
    # metrics carry the path for triage
    qm = [m for m in seen if m.get("malformed_rows")]
    assert len(qm) == 1 and qm[0]["bad_records_path"].startswith(bdir)


def test_quarantine_replay_is_idempotent(spark, tmp_path):
    """Restarting the same checkpoint neither duplicates quarantined rows
    nor re-merges the batch (crash-replay safety on both sides)."""
    log = tmp_path / "log"
    _write_log(log)
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    bdir = str(tmp_path / "bad")
    for _ in range(2):
        q = run_stream(
            spark, str(log), sink, str(tmp_path / "ckpt"),
            schema=CHANGE_EVENT_SCHEMA, log_format="json",
            bad_records="quarantine", bad_records_dir=bdir,
        )
        q.awaitTermination(300)
    assert _final(spark, sink) == CLEAN_FINAL
    assert read_bad_records(spark, bdir).count() == 2


def test_csv_partial_row_quarantined_with_fragments(spark, tmp_path):
    """CSV keeps the well-typed fields of a partially-bad row alongside
    the raw line -- useful triage context."""
    log = tmp_path / "log"
    log.mkdir()
    hdr = "op,conv_id,turn_idx,role,text,tool,ts,seq,src_partition"
    (log / "c0.csv").write_text(
        f"{hdr}\n"
        "U,a,0,user,hi,,2024-01-01T00:00:00Z,1,0\n"
        "U,badrow,notanint,user,oops,,2024-01-01T00:01:00Z,2,0\n"
    )
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    bdir = str(tmp_path / "bad")
    q = run_stream(
        spark, str(log), sink, str(tmp_path / "ckpt"),
        schema=CHANGE_EVENT_SCHEMA, log_format="csv",
        bad_records="quarantine", bad_records_dir=bdir,
    )
    q.awaitTermination(300)
    assert _final(spark, sink) == {("a", 0): "hi"}
    bad = read_bad_records(spark, bdir).collect()
    assert len(bad) == 1
    assert bad[0]["conv_id"] == "badrow"  # parsed fragment survives
    assert "notanint" in bad[0]["_corrupt_record"]


def test_bad_records_validation(spark, tmp_path):
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    with pytest.raises(ValueError, match="text logs only"):
        run_stream(spark, str(tmp_path), sink, str(tmp_path / "c1"),
                   bad_records="drop")
    with pytest.raises(ValueError, match="fail\\|drop\\|quarantine"):
        run_stream(spark, str(tmp_path), sink, str(tmp_path / "c2"),
                   schema=CHANGE_EVENT_SCHEMA, log_format="json",
                   bad_records="ignore")
    import pyspark.sql.types as T

    reserved = T.StructType(
        list(CHANGE_EVENT_SCHEMA.fields)
        + [T.StructField("_corrupt_record", T.StringType())]
    )
    with pytest.raises(ValueError, match="reserved"):
        run_stream(spark, str(tmp_path), sink, str(tmp_path / "c3"),
                   schema=reserved, log_format="json", bad_records="drop")
