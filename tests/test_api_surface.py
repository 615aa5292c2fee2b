"""Registry / transforms / selection / recipe / CLI surface tests --
the reference's own test strategy (CLI smoke via subprocess asserting
listings + an end-to-end dry run, /root/reference/tests/test_cli.py:1-58)."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest
import yaml

from fetchez_spark import registry
from fetchez_spark.changegen import ChangeLogSpec, write_change_log
from fetchez_spark.selection import Selection
from fetchez_spark.transforms import build_chain, get_transform, list_transforms, search_transforms


def _cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "fetchez_spark", *args],
        capture_output=True, text=True, cwd="/root/repo",
    )


def test_cli_version_and_listings():
    assert "fetchez-spark" in _cli("--version").stdout
    out = _cli("sources").stdout
    assert "parquet_log" in out and "synthetic" in out
    out = _cli("sinks").stdout
    assert "local_snapshot" in out and "iceberg" in out
    out = _cli("transforms").stdout
    assert "dry_run" in out and "checksum" in out
    out = _cli("search", "dedup").stdout + _cli("search", "snapshot").stdout
    assert "local_snapshot" in out
    out = _cli("info", "parquet_log").stdout
    assert "offset-partitioned" in out


def test_registry_lazy_load_and_aliases():
    cls = registry.get_source_class("file")  # alias
    from fetchez_spark.sources.parquet_log import ParquetLogSource

    assert cls is ParquetLogSource
    with pytest.raises(KeyError):
        registry.get_source_class("nope")
    # dangling class reference errors at load time, not registration
    registry.register_source(
        registry.SourceInfo("broken", "fetchez_spark.sources.parquet_log:Missing", "x", "d")
    )
    with pytest.raises(ImportError):
        registry.get_source_class("broken")


def test_transform_chain_dedups_and_filters(spark):
    chain = build_chain(
        [
            {"transform": "filter_regex", "args": {"column": "role", "pattern": "user"}},
            {"transform": "filter_regex", "args": {"column": "role", "pattern": "user"}},
            "enrich",
        ]
    )
    assert len(chain) == 2  # value-equal duplicate eliminated
    df = spark.createDataFrame([("user", "a"), ("tool", "b")], ["role", "text"])
    out = chain[0](df)
    assert [r["role"] for r in out.collect()] == ["user"]
    assert "ingested_at" in chain[1](df).columns


def test_apply_rules_and_checksum(spark):
    df = spark.createDataFrame([("bash",), ("search",), ("other",)], ["tool"])
    t = get_transform("apply_rules", column="tool", rules={"bash": 2, "search": 1}, default=0)
    got = {r["tool"]: r["weight"] for r in t(df).collect()}
    assert got == {"bash": 2, "search": 1, "other": 0}
    c = get_transform("checksum", columns=["tool"])
    rows = c(df).collect()
    assert len({r["row_hash"] for r in rows}) == 3


def test_selection_parse_buffer_chunk(spark):
    sel = Selection.parse("key:conv_00000100/conv_00000200 ts:2024-01-01/2024-01-02")
    assert sel.key_min == "conv_00000100" and sel.ts_max.day == 2
    wide = sel.buffer(3600)
    assert (sel.ts_min - wide.ts_min).total_seconds() == 3600
    parts = sel.chunk(4)
    assert len(parts) == 4
    assert parts[0].key_min == "conv_00000100" and parts[-1].key_max == "conv_00000200"
    # predicate pushes to the scan
    df = spark.createDataFrame(
        [("conv_00000150", 1), ("conv_00000250", 2)], ["conv_id", "turn_idx"]
    ).withColumn("ts", __import__("pyspark").sql.functions.lit("2024-01-01 12:00:00").cast("timestamp"))
    assert df.filter(sel.predicate()).count() == 1


def test_recipe_end_to_end_and_dry_run(spark, tmp_path):
    spec = ChangeLogSpec(num_events=2000, num_convs=50, max_turns=5, seed=3)
    write_change_log(spec, str(tmp_path / "log"), num_chunks=2)
    recipe_cfg = {
        "project": "t",
        "min_engine_version": "0.1.0",
        "source": {"name": "parquet_log", "args": {"log_dir": str(tmp_path / "log"), "batch_files": 1}},
        "selection": "key:conv_00000000/conv_00000030",
        "transforms": [
            {"transform": "filter_regex", "args": {"column": "role", "pattern": "system", "keep": False}}
        ],
        "sink": {"name": "local_snapshot", "args": {"table_dir": str(tmp_path / "table"), "num_buckets": 4}},
        "run": {"mode": "replay", "lineage_dir": str(tmp_path / "lineage")},
    }
    path = tmp_path / "job.yaml"
    path.write_text(yaml.safe_dump(recipe_cfg))

    from fetchez_spark.recipe import Recipe

    dry = Recipe.from_file(str(path)).run(spark=spark, dry_run=True)
    assert dry["mode"] == "dry_run" and "Parsed Logical Plan" in dry["plan"]

    result = Recipe.from_file(str(path)).run(spark=spark)
    assert len(result["batches"]) == 2
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    sink = LocalSnapshotSink(str(tmp_path / "table"), num_buckets=4)
    got = sink.read(spark)
    assert got.count() > 0
    assert got.filter("role = 'system'").count() == 0  # transform applied
    assert got.filter("conv_id >= 'conv_00000030'").count() == 0  # selection applied


def test_recipe_version_gate(tmp_path):
    from fetchez_spark.recipe import Recipe

    with pytest.raises(RuntimeError, match="requires engine"):
        Recipe({"min_engine_version": "99.0.0", "source": {}, "sink": {}})


def test_recipe_schema_mutator():
    from fetchez_spark.recipe import Recipe

    r = Recipe(
        {
            "schema": "throughput",
            "source": {"name": "parquet_log", "args": {}},
            "sink": {"name": "local_snapshot", "args": {}},
        }
    )
    assert r.config["sink"]["args"]["mode"] == "mor"
    assert r.config["source"]["args"]["batch_files"] == 16


def test_plugin_discovery(tmp_path):
    plugin = tmp_path / "myplugin.py"
    plugin.write_text(
        "def setup_fetchez_spark(reg):\n"
        "    reg.register_source(reg.SourceInfo('custom_src', "
        "'fetchez_spark.sources.parquet_log:ParquetLogSource', 'log', 'custom'))\n"
    )
    loaded = registry.load_plugins(str(tmp_path))
    assert loaded == ["myplugin"]
    assert registry.info("custom_src") is not None
    # broken plugins are skipped, not fatal
    (tmp_path / "broken.py").write_text("raise RuntimeError('boom')\n")
    assert "broken" not in registry.load_plugins(str(tmp_path))


def test_presets_expand_and_unknown_rejected(spark):
    from fetchez_spark.transforms import build_chain, expand_presets

    chain = build_chain(expand_presets([], ["audit"]))
    assert len(chain) == 2  # checksum + enrich
    df = spark.createDataFrame([("user", "hello")], ["role", "text"])
    out = df
    for t in chain:
        out = t(out)
    assert {"row_hash", "ingested_at", "engine_version"} <= set(out.columns)
    with pytest.raises(KeyError, match="unknown preset"):
        expand_presets([], ["nope"])


def test_live_tail_picks_up_new_files(spark, tmp_path):
    """True tailing: a processingTime stream ingests files that arrive
    AFTER the query starts."""
    import time as _time

    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink
    from fetchez_spark.streaming.engine import run_stream

    spec1 = ChangeLogSpec(num_events=500, num_convs=10, seed=31)
    write_change_log(spec1, str(tmp_path / "log"), num_chunks=1)
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    q = run_stream(
        spark, str(tmp_path / "log"), sink, str(tmp_path / "ckpt"),
        max_files_per_trigger=2, available_now=False,
    )
    try:
        deadline = _time.time() + 120
        while not sink.manifest()["committed_batches"] and _time.time() < deadline:
            _time.sleep(1)
        n1 = sink.read(spark).count()
        assert n1 > 0
        # new chunk arrives while the query is live (fresh keys, later seq)
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq
        from fetchez_spark.changegen import generate_change_log

        late = generate_change_log(ChangeLogSpec(num_events=300, num_convs=10, seed=32))
        late["conv_id"] = "late_" + late["conv_id"]
        late["seq"] = late["seq"] + 10_000
        pq.write_table(
            pa.Table.from_pandas(late, preserve_index=False),
            str(tmp_path / "log" / "chunk-99999.parquet"),
        )
        deadline = _time.time() + 120
        while _time.time() < deadline:
            if sink.read(spark).filter("conv_id like 'late_%'").count() > 0:
                break
            _time.sleep(2)
        assert sink.read(spark).filter("conv_id like 'late_%'").count() > 0
    finally:
        q.stop()
