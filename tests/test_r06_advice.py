"""Regression pins for the round-5 ADVICE defects fixed in round 6."""

from __future__ import annotations

import pytest

from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink


def test_epoch_floor_div_exact_beyond_double_precision(spark):
    """ms/s derivation must agree with exact integer floor division even
    for |epoch_us| > 2^53 (year 1 / year 2500 NTZ), where the old
    long `/` long path routed through double and lost bits."""
    from fetchez_spark.functions.epoch import epoch_ms, epoch_s, epoch_us

    df = spark.sql(
        """SELECT * FROM VALUES
        (TIMESTAMP_NTZ'0001-01-01 00:00:00.000001'),
        (TIMESTAMP_NTZ'2500-06-15 12:34:56.789123'),
        (TIMESTAMP_NTZ'1969-12-31 23:59:59.999999') AS t(ts)"""
    )
    rows = df.select(
        epoch_us(df, "ts").alias("us"),
        epoch_ms(df, "ts").alias("ms"),
        epoch_s(df, "ts").alias("s"),
    ).collect()
    for r in rows:
        assert r["ms"] == r["us"] // 1_000, r
        assert r["s"] == r["us"] // 1_000_000, r


def test_outbox_reopen_adopts_persisted_format(spark, tmp_path):
    """A bare ChangeOutbox(dir, source) re-open of a persisted
    non-debezium outbox must adopt the recorded format (the constructor
    default used to be an implicit-explicit 'debezium' that conflicted)."""
    from fetchez_spark.operators.outbox import ChangeOutbox

    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=2)
    box = ChangeOutbox(str(tmp_path / "box"), sink, format="maxwell")
    assert box.format == "maxwell"
    reopened = ChangeOutbox(str(tmp_path / "box"), sink)  # no format arg
    assert reopened.format == "maxwell"
    with pytest.raises(ValueError, match="conflicting"):
        ChangeOutbox(str(tmp_path / "box"), sink, format="debezium")


def test_iceberg_merge_into_refuses_duplicate_source_keys(spark):
    """Duplicate NEW keys in a merge_into source would insert one row per
    duplicate under native MERGE (which only errors on multiple matches
    of a TARGET row); the adapter must refuse loudly before emitting."""
    from fetchez_spark.sinks.iceberg import IcebergSink

    sink = object.__new__(IcebergSink)
    sink.spark = spark
    sink.table = "tgt"
    sink.key = ["conv_id", "turn_idx"]
    sink.max_committed_tokens = 64
    sink._target_columns = lambda: ["conv_id", "turn_idx", "text", "ts"]
    src = spark.createDataFrame(
        [("c1", 0, "a", "2025-01-01 00:00:00"), ("c1", 0, "b", "2025-01-01 01:00:00")],
        "conv_id string, turn_idx int, text string, ts string",
    )
    with pytest.raises(ValueError, match="duplicate key"):
        sink.merge_into(
            spark,
            src,
            when_not_matched_insert={
                "conv_id": "s.conv_id",
                "turn_idx": "s.turn_idx",
                "text": "s.text",
                "ts": "s.ts",
            },
        )
