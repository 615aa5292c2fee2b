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


def test_api_two_tails_one_table_with_prefixes(spark, tmp_path):
    """api.tail's token_prefix enables N tails -> one table (round-2
    verdict: api.tail could not supply the prefixes its own error message
    promised)."""
    write_change_log(ChangeLogSpec(num_events=600, num_convs=12, seed=31),
                     str(tmp_path / "log_a"), 2)
    write_change_log(ChangeLogSpec(num_events=600, num_convs=12, seed=32),
                     str(tmp_path / "log_b"), 2)
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    qa = api.tail(
        spark, source={"name": "parquet_log", "args": {"log_dir": str(tmp_path / "log_a")}},
        sink=sink, checkpoint_dir=str(tmp_path / "ck_a"),
        available_now=True, token_prefix="a",
    )
    qb = api.tail(
        spark, source={"name": "parquet_log", "args": {"log_dir": str(tmp_path / "log_b")}},
        sink=sink, checkpoint_dir=str(tmp_path / "ck_b"),
        available_now=True, token_prefix="b",
    )
    qa.awaitTermination(200)
    qb.awaitTermination(200)
    toks = set(sink.manifest()["committed_batches"])
    assert any(t.startswith("a-") for t in toks) and any(t.startswith("b-") for t in toks)
    seq = sink.manifest()["token_seq"]
    assert seq["a-"] >= 0 and seq["b-"] >= 0
    assert sink.read(spark).count() > 0


def test_api_ingest_and_search_index(tmp_path):
    csvf = tmp_path / "inv.csv"
    csvf.write_text("name,link,rows\nx,/d/x,5\ny,/d/y,50\n")
    LocalSnapshotSink(str(tmp_path / "t"), num_buckets=2)
    res = api.ingest_index(str(tmp_path / "t"), str(csvf))
    assert res["ingested"] == 2
    hits = api.search_index(str(tmp_path / "t"), ranges={"rows": (10, None)})
    assert [h["name"] for h in hits] == ["y"] and hits[0]["location"] == "/d/y"
