"""File-source knobs on run_stream: the allowlisted ``source_options``
pass-through and the ``trigger_interval`` live-tail cadence.

``cleanSource`` retires PROCESSED log files after their batch commits
(the ingest log stops growing without an external janitor racing the
tail); ``latestFirst`` backfills newest-first -- and because the sink's
LWW merge orders on (ts, seq), not arrival, the final state must be
IDENTICAL either way, which is exactly what the backfill test pins.
"""

from __future__ import annotations

import datetime as dt
import os
import time

import pytest

from fetchez_spark.schema import CHANGE_EVENT_SCHEMA
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink
from fetchez_spark.streaming.engine import run_stream


def _write_chunk(spark, rows, dest):
    import shutil

    scratch = str(dest) + ".scratch"
    spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(scratch)
    part = next(n for n in os.listdir(scratch) if n.endswith(".parquet"))
    shutil.move(os.path.join(scratch, part), str(dest))
    shutil.rmtree(scratch)


def _ts(minute):
    return dt.datetime(2025, 1, 1, 0, minute)


CHUNK1 = [
    ("I", "a", 0, "user", "v1", None, _ts(0), 1, 0),
    ("I", "b", 0, "user", "keep", None, _ts(1), 2, 1),
]
CHUNK2 = [
    ("U", "a", 0, "user", "v2", None, _ts(2), 3, 0),
    ("D", "b", 0, None, None, None, _ts(3), 4, 1),
    ("I", "c", 0, "assistant", "new", None, _ts(4), 5, 2),
]
FINAL = {("a", 0): "v2", ("c", 0): "new"}


# ---------------------------------------------------------------- validation

def test_unknown_source_option_is_a_loud_error(tmp_path):
    """A typo'd retention knob silently ignored would be data loss --
    the allowlist rejects it before any Spark object is touched."""
    with pytest.raises(ValueError, match="cleanSourse"):
        run_stream(
            None, str(tmp_path / "log"), None, str(tmp_path / "ckpt"),
            source_options={"cleanSourse": "delete"},
        )


def test_archive_mode_needs_a_dir_outside_the_log(tmp_path):
    with pytest.raises(ValueError, match="sourceArchiveDir"):
        run_stream(
            None, str(tmp_path / "log"), None, str(tmp_path / "ckpt"),
            source_options={"cleanSource": "archive"},
        )
    with pytest.raises(ValueError, match="OUTSIDE"):
        run_stream(
            None, str(tmp_path / "log"), None, str(tmp_path / "ckpt"),
            source_options={
                "cleanSource": "archive",
                # inside the tailed dir: would re-ingest what it archives
                "sourceArchiveDir": str(tmp_path / "log" / "archive"),
            },
        )


def test_trigger_interval_rejected_on_available_now(tmp_path):
    with pytest.raises(ValueError, match="live-tail"):
        run_stream(
            None, str(tmp_path / "log"), None, str(tmp_path / "ckpt"),
            available_now=True, trigger_interval="30 seconds",
        )


# ------------------------------------------------------------- end to end

def test_latest_first_backfill_reaches_the_same_final_state(spark, tmp_path):
    """latestFirst=true processes chunk-00001 BEFORE chunk-00000
    (maxFilesPerTrigger=1 forces distinct batches); the (ts, seq) LWW
    merge is arrival-order independent, so the final table matches the
    in-order replay exactly."""
    log = tmp_path / "log"
    log.mkdir()
    _write_chunk(spark, CHUNK1, log / "chunk-00000.parquet")
    # ensure a strictly newer mtime so latestFirst has an order to invert
    time.sleep(0.05)
    _write_chunk(spark, CHUNK2, log / "chunk-00001.parquet")

    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    q = run_stream(
        spark, str(log), sink, str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        source_options={"latestFirst": "true"},
    )
    q.awaitTermination(300)
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in sink.read(spark).collect()
    }
    assert got == FINAL


def test_clean_source_delete_retires_processed_log_files(spark, tmp_path):
    """A live tail with cleanSource=delete: Spark retires batch N's
    files when batch N+1 commits, so after a THIRD chunk lands and
    commits, the first batch's files are gone -- the ingest log is
    self-pruning one batch behind the head.  trigger_interval rides
    along to exercise the processing-time writer wiring."""
    log = tmp_path / "log"
    log.mkdir()
    _write_chunk(spark, CHUNK1, log / "chunk-00000.parquet")
    _write_chunk(spark, CHUNK2, log / "chunk-00001.parquet")

    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    q = run_stream(
        spark, str(log), sink, str(tmp_path / "ckpt"),
        available_now=False,
        trigger_interval="1 second",
        source_options={"cleanSource": "delete"},
    )

    def _state():
        return {
            (r["conv_id"], r["turn_idx"]): r["text"]
            for r in sink.read(spark).collect()
        }

    try:
        deadline = time.time() + 120
        # first: the initial chunks land
        while time.time() < deadline and _state() != FINAL:
            time.sleep(0.5)
        assert _state() == FINAL
        # a later chunk forms batch N+1; committing it retires batch N's files
        _write_chunk(
            spark,
            [("I", "d", 0, "user", "later", None, _ts(5), 6, 0)],
            log / "chunk-00002.parquet",
        )
        while time.time() < deadline and ("d", 0) not in _state():
            time.sleep(0.5)
        assert ("d", 0) in _state()
        # then: the async cleaner removes the PROCESSED earlier files
        old = {"chunk-00000.parquet", "chunk-00001.parquet"}
        while time.time() < deadline:
            left = old & set(os.listdir(log))
            if not left:
                break
            time.sleep(0.5)
        assert not left, f"cleanSource=delete left {sorted(left)} in the log"
    finally:
        q.stop()
        q.awaitTermination(60)


# ---------------------------------------------------------------- recipe

def test_recipe_stream_passes_source_options_through(spark, tmp_path):
    """The declarative surface reaches the retention/ordering knobs:
    `run.source_options` and `run.trigger_interval` flow into
    run_stream -- latestFirst backfill through a recipe reaches the same
    final state, and a typo'd option name is a loud error, not a
    silently-ignored YAML key."""
    from fetchez_spark.recipe import Recipe

    log = tmp_path / "log"
    log.mkdir()
    _write_chunk(spark, CHUNK1, log / "chunk-00000.parquet")
    time.sleep(0.05)
    _write_chunk(spark, CHUNK2, log / "chunk-00001.parquet")

    def cfg(table, run):
        return {
            "project": "source-options",
            "sources": [{"name": "parquet_log", "args": {
                "log_dir": str(log), "max_files_per_trigger": 1,
            }}],
            "sink": {"name": "local_snapshot", "args": {
                "table_dir": str(table), "num_buckets": 4,
            }},
            "run": {"mode": "stream", "available_now": True,
                    "timeout_sec": 300, **run},
        }

    Recipe(cfg(tmp_path / "t", {
        "checkpoint_dir": str(tmp_path / "ckpt"),
        "source_options": {"latestFirst": "true"},
    })).run(spark=spark)
    sink = LocalSnapshotSink(str(tmp_path / "t"))
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in sink.read(spark).collect()
    }
    assert got == FINAL

    with pytest.raises(ValueError, match="cleanSourse"):
        Recipe(cfg(tmp_path / "t2", {
            "checkpoint_dir": str(tmp_path / "ckpt2"),
            "source_options": {"cleanSourse": "delete"},
        })).run(spark=spark)


# -------------------------------------------------------- size rate limit

def test_max_bytes_per_trigger_excludes_count_limit(tmp_path):
    with pytest.raises(ValueError, match="mutually exclusive"):
        run_stream(
            None, str(tmp_path / "log"), None, str(tmp_path / "ckpt"),
            source_options={"maxBytesPerTrigger": "64m"},
        )


def test_max_bytes_per_trigger_paces_the_replay(spark, tmp_path):
    """Size-based rate limiting: with maxBytesPerTrigger smaller than one
    chunk, each batch admits exactly one file (Spark always takes at
    least one), so the replay runs as multiple batches and still reaches
    the oracle state."""
    log = tmp_path / "log"
    log.mkdir()
    _write_chunk(spark, CHUNK1, log / "chunk-00000.parquet")
    _write_chunk(spark, CHUNK2, log / "chunk-00001.parquet")

    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    batches = []
    q = run_stream(
        spark, str(log), sink, str(tmp_path / "ckpt"),
        max_files_per_trigger=None,
        source_options={"maxBytesPerTrigger": "1"},
        on_batch=lambda bid, m: batches.append(bid),
    )
    q.awaitTermination(300)
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in sink.read(spark).collect()
    }
    assert got == FINAL
    assert len(batches) >= 2  # the byte cap actually split the replay
