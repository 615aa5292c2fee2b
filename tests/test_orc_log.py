"""ORC change logs: run_stream(log_format='orc') -- the other
self-describing columnar format, with the same inference / evolution /
watch_schema behavior as the native parquet log.

Chunks are written THROUGH Spark (not pyarrow.orc): pyarrow emits ORC
TIMESTAMP_INSTANT ("timestamp with local time zone"), which Spark's ORC
schema parser rejects -- the realistic producer of an ORC change log is
another Spark/Hive job anyway.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil

import pytest
from pyspark.sql import types as T

from fetchez_spark.schema import CHANGE_EVENT_SCHEMA
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink
from fetchez_spark.streaming.engine import run_stream, run_stream_supervised

WIDE_SCHEMA = T.StructType(
    CHANGE_EVENT_SCHEMA.fields + [T.StructField("model", T.StringType(), True)]
)


def _write_orc_chunk(spark, rows, dest, with_model=False):
    """One standalone .orc file at ``dest`` (file streams want files, not
    Spark output dirs -- write to a scratch dir, lift out the part file)."""
    schema = WIDE_SCHEMA if with_model else CHANGE_EVENT_SCHEMA
    scratch = str(dest) + ".scratch"
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").orc(scratch)
    part = next(n for n in os.listdir(scratch) if n.endswith(".orc"))
    shutil.move(os.path.join(scratch, part), str(dest))
    shutil.rmtree(scratch)


def _ts(minute):
    return dt.datetime(2025, 1, 1, 0, minute)


def test_orc_tail_inferred_schema_end_to_end(spark, tmp_path):
    """Two ORC chunks tail through run_stream with NO explicit schema --
    footer inference + LWW merge behave exactly like the parquet log."""
    log = tmp_path / "log"
    log.mkdir()
    _write_orc_chunk(spark, [
        ("I", "a", 0, "user", "v1", None, _ts(0), 1, 0),
        ("I", "b", 0, "user", "keep", None, _ts(1), 2, 1),
    ], log / "chunk-00000.orc")
    _write_orc_chunk(spark, [
        ("U", "a", 0, "user", "v2", None, _ts(2), 3, 0),
        ("D", "b", 0, None, None, None, _ts(3), 4, 1),
        ("I", "c", 0, "assistant", "new", None, _ts(4), 5, 2),
    ], log / "chunk-00001.orc")

    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    q = run_stream(
        spark, str(log), sink, str(tmp_path / "ckpt"),
        log_format="orc", max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in sink.read(spark).collect()
    }
    # a updated, b deleted (tombstone wins), c inserted
    assert got == {("a", 0): "v2", ("c", 0): "new"}


def test_orc_supervised_mid_log_evolution_restarts_once(spark, tmp_path):
    """A 'model' column appearing in a LATER ORC chunk than the schema the
    stream started with trips the footer guard before the merge; the
    supervisor restarts with the widened schema and the re-offered batch
    lands losslessly -- same protocol as the parquet log, ORC footers."""
    log = tmp_path / "log"
    log.mkdir()
    _write_orc_chunk(spark, [
        ("I", "a", 0, "user", "hi", None, _ts(0), 1, 0),
    ], log / "chunk-00000.orc")
    _write_orc_chunk(spark, [
        ("I", "b", 0, "assistant", "new", None, _ts(1), 2, 1, "m-4"),
        ("U", "a", 0, "user", "hi2", None, _ts(2), 3, 0, "m-4"),
    ], log / "chunk-00001.orc", with_model=True)

    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    # explicit narrow schema: the wide chunk exists before start, so with
    # inference there would be nothing to evolve -- pinning the narrow
    # schema makes the availableNow drain hit the guard deterministically
    result = run_stream_supervised(
        spark, str(log), sink, str(tmp_path / "ckpt"),
        schema=CHANGE_EVENT_SCHEMA, log_format="orc",
        max_files_per_trigger=1,
    )
    assert result["restarts"] == 1
    assert result["evolved_columns"] == ["model"]
    got = sink.read(spark).toPandas().sort_values("conv_id").reset_index(drop=True)
    assert list(got["conv_id"]) == ["a", "b"]
    assert got.loc[0, "text"] == "hi2" and got.loc[0, "model"] == "m-4"
    assert got.loc[1, "model"] == "m-4"


def test_recipe_orc_log_replay_and_stream(spark, tmp_path):
    """The declarative surface reaches ORC logs: `orc_log` source in
    replay mode AND stream mode, same final LWW state both ways."""
    from fetchez_spark.recipe import Recipe

    log = tmp_path / "log"
    log.mkdir()
    _write_orc_chunk(spark, [
        ("I", "a", 0, "user", "v1", None, _ts(0), 1, 0),
        ("I", "b", 0, "user", "gone", None, _ts(1), 2, 1),
    ], log / "chunk-00000.orc")
    _write_orc_chunk(spark, [
        ("U", "a", 0, "user", "v2", None, _ts(2), 3, 0),
        ("D", "b", 0, None, None, None, _ts(3), 4, 1),
    ], log / "chunk-00001.orc")

    def cfg(mode, table, extra_run=None):
        run = {"mode": mode, **(extra_run or {})}
        return {
            "project": f"orc-{mode}",
            # batch_files=2: one replay batch reading BOTH orc files pins
            # the multi-path read (DataFrameReader.orc is not *paths)
            "sources": [{"name": "orc_log", "args": {
                "log_dir": str(log), "batch_files": 2,
                "max_files_per_trigger": 1,
            }}],
            "sink": {"name": "local_snapshot", "args": {
                "table_dir": str(table), "num_buckets": 4,
            }},
            "run": run,
        }

    Recipe(cfg("replay", tmp_path / "t_replay")).run(spark=spark)
    Recipe(cfg("stream", tmp_path / "t_stream", {
        "checkpoint_dir": str(tmp_path / "ckpt"),
        "available_now": True, "timeout_sec": 300,
    })).run(spark=spark)

    for table in ("t_replay", "t_stream"):
        sink = LocalSnapshotSink(str(tmp_path / table))
        got = {
            (r["conv_id"], r["turn_idx"]): r["text"]
            for r in sink.read(spark).collect()
        }
        assert got == {("a", 0): "v2"}, table


def test_orc_rejects_per_row_bad_records_modes(spark, tmp_path):
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    for mode in ("drop", "quarantine"):
        with pytest.raises(ValueError, match="malformed orc"):
            run_stream(
                spark, str(tmp_path), sink, str(tmp_path / "c"),
                log_format="orc", bad_records=mode,
            )
