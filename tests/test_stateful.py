"""Custom stateful streaming (applyInPandasWithState) + session windows."""

from __future__ import annotations

import pytest

from fetchez_spark.changegen import ChangeLogSpec, generate_change_log, write_change_log
from fetchez_spark.schema import CHANGE_EVENT_SCHEMA
from fetchez_spark.streaming.stateful import conversation_progress, windowed_turn_counts

SPEC = ChangeLogSpec(num_events=2_000, num_convs=30, max_turns=6, seed=21)


def test_conversation_progress_state_accumulates_across_batches(spark, tmp_path):
    write_change_log(SPEC, str(tmp_path / "log"), num_chunks=4)
    stream = (
        spark.readStream.schema(CHANGE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # 4 micro-batches -> state must carry over
        .parquet(str(tmp_path / "log"))
    )
    q = (
        conversation_progress(stream)
        .writeStream.format("memory")
        .queryName("conv_progress")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # latest update per conversation = totals over the whole log
    rows = spark.sql(
        """
        SELECT conv_id, max(n_events) AS n_events, max(max_turn) AS max_turn
        FROM conv_progress GROUP BY conv_id
        """
    ).collect()
    got = {r["conv_id"]: (r["n_events"], r["max_turn"]) for r in rows}

    log = generate_change_log(SPEC)
    expected = {
        conv: (int(g["seq"].size), int(g["turn_idx"].max()))
        for conv, g in log.groupby("conv_id")
    }
    assert got == expected
    # and updates were emitted across multiple batches (state carried over)
    n_updates = spark.table("conv_progress").count()
    assert n_updates > len(expected)


def test_windowed_turn_counts_batch_semantics(spark, tmp_path):
    """session_window semantics validated in batch mode (same operator
    works under a stream with watermark-bounded state)."""
    import datetime as dt

    T0 = dt.datetime(2024, 1, 1)
    rows = [
        ("I", "c1", 0, "user", "a", None, T0, 0, 0),
        ("I", "c1", 1, "user", "b", None, T0 + dt.timedelta(minutes=2), 1, 0),
        # > 5 min gap -> new session
        ("I", "c1", 2, "user", "c", None, T0 + dt.timedelta(minutes=20), 2, 0),
        ("I", "c2", 0, "user", "d", None, T0, 3, 0),
    ]
    df = spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)
    got = windowed_turn_counts(df).collect()
    by_conv = {}
    for r in got:
        by_conv.setdefault(r["conv_id"], []).append(r["n_events"])
    assert sorted(by_conv["c1"]) == [1, 2]  # two sessions
    assert by_conv["c2"] == [1]


def test_windowed_turn_counts_streaming_with_watermark(spark, tmp_path):
    write_change_log(SPEC, str(tmp_path / "log"), num_chunks=2)
    stream = (
        spark.readStream.schema(CHANGE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "log"))
    )
    q = (
        windowed_turn_counts(stream, gap="1 minute", watermark="2 minutes")
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # append mode only emits sessions finalized by the watermark; the tail
    # sessions stay in state -- emitted count is bounded by total sessions
    assert spark.table("sessions").count() >= 0
    assert {f.name for f in spark.table("sessions").schema.fields} >= {
        "session_start", "session_end", "conv_id", "n_events"
    }


def test_stateful_query_runs_on_rocksdb_state_store(spark, tmp_path):
    """Production state backend: Spark's bundled RocksDB state store
    (spill-to-disk, bounded JVM heap -- the backend a 10^10-event stream
    with millions of live conversation states needs; the default HDFS-
    backed store keeps all state on-heap).  Same operator, same results:
    only the provider conf changes."""
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        write_change_log(SPEC, str(tmp_path / "log"), num_chunks=3)
        stream = (
            spark.readStream.schema(CHANGE_EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(tmp_path / "log"))
        )
        q = (
            conversation_progress(stream)
            .writeStream.format("memory")
            .queryName("conv_progress_rocks")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        rows = spark.sql(
            "SELECT conv_id, max(n_events) AS n FROM conv_progress_rocks GROUP BY conv_id"
        ).collect()
        got = {r["conv_id"]: r["n"] for r in rows}
        log = generate_change_log(SPEC)
        expected = {c: int(g["seq"].size) for c, g in log.groupby("conv_id")}
        assert got == expected
        # the checkpoint really used RocksDB (sst/log layout under state/)
        import glob

        assert glob.glob(str(tmp_path / "ckpt" / "state" / "**" / "*.zip"), recursive=True) or glob.glob(
            str(tmp_path / "ckpt" / "state" / "**" / "*.sst"), recursive=True
        ) or glob.glob(str(tmp_path / "ckpt" / "state" / "**" / "*.changelog"), recursive=True)
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)
