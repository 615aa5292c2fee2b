"""api facade: ingest / tail / search (fetchez api.get analog)."""

from __future__ import annotations

from fetchez_spark import api
from fetchez_spark.changegen import ChangeLogSpec, write_change_log
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink


def test_ingest_with_registry_specs_and_selection(spark, tmp_path):
    write_change_log(ChangeLogSpec(num_events=2000, num_convs=40, seed=13), str(tmp_path / "log"), 2)
    results = api.ingest(
        spark,
        source={"name": "parquet_log", "args": {"log_dir": str(tmp_path / "log"), "batch_files": 1}},
        sink={"name": "local_snapshot", "args": {"table_dir": str(tmp_path / "t"), "num_buckets": 4}},
        transforms=[{"transform": "filter_regex", "args": {"column": "role", "pattern": "tool", "keep": False}}],
        selection="key:conv_00000000/conv_00000020",
        lineage_dir=str(tmp_path / "lineage"),
    )
    assert len(results) == 2 and all(not r["skipped"] for r in results)
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    got = sink.read(spark)
    assert got.count() > 0
    assert got.filter("conv_id >= 'conv_00000020'").count() == 0  # selection
    assert got.filter("role = 'tool'").count() == 0  # transform
    # idempotent re-ingest
    again = api.ingest(
        spark,
        source={"name": "parquet_log", "args": {"log_dir": str(tmp_path / "log"), "batch_files": 1}},
        sink=sink,
        selection="key:conv_00000000/conv_00000020",
    )
    assert all(r["skipped"] for r in again)


def test_tail_available_now(spark, tmp_path):
    write_change_log(ChangeLogSpec(num_events=1000, num_convs=20, seed=14), str(tmp_path / "log"), 2)
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    q = api.tail(
        spark,
        source={"name": "parquet_log", "args": {"log_dir": str(tmp_path / "log")}},
        sink=sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(200)
    assert sink.read(spark).count() > 0


def test_search_spans_registries():
    names = {r["name"] for r in api.search("merge")}
    assert "local_snapshot" in names or "iceberg" in names
    kinds = {r["kind"] for r in api.search("filter")}
    assert any(k.startswith("transform") for k in kinds)
