"""Column drops (round 4, third session).

``drop_column(name)`` is the Iceberg ``DROP COLUMN`` semantic without
column ids: the field leaves the table schema in one metadata commit
(zero data movement -- every read projects the current schema, so old
files' bytes simply stop being read); compaction folds write the current
schema, so the bytes physically disappear as buckets rewrite; the name
is RETIRED (reuse would resurrect stale values under parquet name-based
projection -- loud error instead).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

UTC = dt.timezone.utc


def _batch(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, op string, seq long",
    )


def _ts(h: int) -> dt.datetime:
    return dt.datetime(2025, 1, 1, h, tzinfo=UTC)


def _seed(spark, tmp_path):
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    sink.merge(
        _batch(
            spark,
            [
                ("c1", 0, "user", "hello", "bash", _ts(1), "I", 1),
                ("c2", 0, "tool", "ok", "grep", _ts(2), "I", 2),
            ],
        ),
        "seed-0",
    )
    return sink


def test_drop_is_metadata_only_and_hides_the_column(spark, tmp_path):
    sink = _seed(spark, tmp_path)
    pre = sink.current_snapshot_id
    res = sink.drop_column("tool")
    assert res["dropped"] == "tool"
    assert "tool" not in sink.read(spark).columns
    # time travel still shows it
    assert "tool" in sink.read(spark, snapshot_id=pre).columns
    # data unchanged otherwise
    assert sorted(
        (r["conv_id"], r["text"]) for r in sink.read(spark).collect()
    ) == [("c1", "hello"), ("c2", "ok")]


def test_dropped_name_is_retired_for_merges_and_renames(spark, tmp_path):
    sink = _seed(spark, tmp_path)
    sink.drop_column("tool")
    with pytest.raises(ValueError, match="DROPPED"):
        sink.merge(
            _batch(spark, [("c3", 0, "user", "x", "nope", _ts(3), "I", 3)]),
            "b-1",
        )
    with pytest.raises(ValueError, match="retired"):
        sink.rename_column("text", "tool")
    # a batch WITHOUT the dropped column merges fine
    sink.merge(
        _batch(spark, [("c3", 0, "user", "x", None, _ts(3), "I", 3)]).drop("tool"),
        "b-2",
    )
    assert sink.read(spark).count() == 3


def test_drop_respects_key_and_ts(spark, tmp_path):
    sink = _seed(spark, tmp_path)
    for col in ("conv_id", "turn_idx", "ts"):
        with pytest.raises(ValueError, match="cannot drop"):
            sink.drop_column(col)
    with pytest.raises(ValueError, match="no column"):
        sink.drop_column("nope")


def test_compaction_physically_purges_dropped_bytes(spark, tmp_path):
    import pyarrow.parquet as pq

    sink = _seed(spark, tmp_path)
    sink.drop_column("tool")
    sink.compact(spark)
    m = sink.manifest()
    files = [
        f
        for v in m["files"].values()
        for f in sink._resolve_list(v)
    ]
    assert files
    for f in files:
        assert "tool" not in pq.read_schema(f).names


def test_drop_composes_with_rename(spark, tmp_path):
    sink = _seed(spark, tmp_path)
    sink.rename_column("tool", "utility")
    sink.drop_column("utility")  # drop by its CURRENT (logical) name
    assert "utility" not in sink.read(spark).columns
    assert "tool" not in sink.read(spark).columns
    # both the logical and the physical name are now unusable
    with pytest.raises(ValueError, match="DROPPED"):
        sink.merge(
            _batch(spark, [("c3", 0, "user", "x", "v", _ts(3), "I", 3)]), "b-1"
        )
    # the freed LOGICAL name is reusable for a genuinely new column
    sink.merge(
        _batch(spark, [("c3", 0, "user", "x", None, _ts(3), "I", 3)])
        .drop("tool")
        .withColumn("utility", F.lit("new")),
        "b-2",
    )
    got = {r["conv_id"]: r["utility"] for r in sink.read(spark).collect()}
    assert got == {"c1": None, "c2": None, "c3": "new"}


def test_cli_drop_column(spark, tmp_path, capsys):
    import json as _json

    from fetchez_spark.cli import main

    sink = _seed(spark, tmp_path)
    rc = main(["maintain", str(tmp_path / "t"), "--drop-column", "tool"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["drop_column"]["dropped"] == "tool"
    assert "tool" not in sink.read(spark).columns
