"""Round-3 surface additions: IVF index persistence, the shipped example
plugin, and the engine-level user config file."""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# --------------------------------------------------------- IVF persistence
def test_ivf_save_load_roundtrip_identical_assignments(spark, tmp_path):
    """A probe-serving flow must not refit per session: centroids persist
    to a JSON sidecar and a fresh-session load reproduces cell assignments
    bit-for-bit (round-2 verdict #7)."""
    from pyspark.sql import functions as F

    from fetchez_spark.functions.similarity import IVFIndex

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = IVFIndex(k=8, seed=42).fit(e)
    path = str(tmp_path / "ivf.json")
    idx.save(path)
    loaded = IVFIndex.load(path)
    assert loaded.centroids == idx.centroids
    assert (loaded.k, loaded.seed, loaded.vec_col) == (idx.k, idx.seed, idx.vec_col)
    a = idx.assign(e, id_col="vec_id").select("vec_id", "_cell")
    b = loaded.assign(e, id_col="vec_id").select("vec_id", "_cell")
    diff = a.alias("a").join(b.alias("b"), on="vec_id").filter(
        F.col("a._cell") != F.col("b._cell")
    )
    assert diff.count() == 0
    # and topk through the loaded index matches
    qv = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    assigned = loaded.assign(e, id_col="vec_id")
    got = [r["vec_id"] for r in loaded.topk(assigned, qv, k=5, nprobe=8).collect()]
    want = [r["vec_id"] for r in idx.topk(idx.assign(e, id_col="vec_id"), qv, k=5, nprobe=8).collect()]
    assert got == want

    import pytest

    with pytest.raises(ValueError, match="index_version"):
        bad = dict(json.load(open(path)), index_version=99)
        bad_path = str(tmp_path / "bad.json")
        json.dump(bad, open(bad_path, "w"))
        IVFIndex.load(bad_path)


# ---------------------------------------------------------- example plugin
def test_example_plugin_loads_and_runs(spark, tmp_path):
    """The shipped examples/plugin_redaction.py is the plugin template
    (reference examples/hook_reproject.py role): it must load through the
    normal plugin-dir discovery, register a working source AND transform,
    and run end-to-end into a sink."""
    from fetchez_spark import registry
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink
    from fetchez_spark.streaming.engine import replay_batches
    from fetchez_spark.transforms import get_transform

    loaded = registry.load_plugins(os.path.join(REPO, "examples"))
    assert "plugin_redaction" in loaded
    assert registry.info("csv_log") is not None

    csv = tmp_path / "changes.csv"
    csv.write_text(
        "conv_id,turn_idx,role,text,tool,ts,op,seq\n"
        "c1,0,user,mail me at bob@example.org please,,2025-01-01T09:00:00Z,upsert,1\n"
        "c1,1,assistant,sure thing,,2025-01-01T09:01:00Z,upsert,2\n"
    )
    src = registry.make_source("csv_log", path=str(csv))
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=2)
    redact = get_transform("redact_emails")
    replay_batches(spark, src.batches(spark), sink, transforms=[redact])
    rows = {r["turn_idx"]: r["text"] for r in sink.read(spark).collect()}
    assert rows[0] == "mail me at [email] please"
    assert rows[1] == "sure thing"


# ------------------------------------------------------------- user config
def test_user_config_file_respected(tmp_path, monkeypatch):
    import fetchez_spark.config as cfg
    from fetchez_spark import registry
    from fetchez_spark.transforms import PRESETS, load_preset_files

    conf = tmp_path / "config.yaml"
    plug = tmp_path / "plugs"
    presets = tmp_path / "presets"
    plug.mkdir()
    presets.mkdir()
    (plug / "my_plugin.py").write_text(
        "def setup_fetchez_spark(registry):\n"
        "    registry.register_source(registry.SourceInfo(\n"
        "        'cfg_src', 'fetchez_spark.sources.inline:InlineSource',\n"
        "        'test', 'from user-config plugin dir'))\n"
    )
    (presets / "mine.yaml").write_text(
        "cfg_preset:\n  - transform: dry_run\n    args: {}\n"
    )
    conf.write_text(
        f"plugin_dir: {plug}\npreset_dir: {presets}\n"
        "sink:\n  num_buckets: 7\n  compact_every: 99\n"
        "session:\n  spark.sql.shuffle.partitions: '13'\n"
    )
    monkeypatch.setenv("FETCHEZ_SPARK_CONFIG", str(conf))
    cfg._cache = None  # drop the per-process cache
    try:
        assert cfg.plugin_dir() == str(plug)
        assert cfg.sink_defaults() == {"num_buckets": 7, "compact_every": 99}
        assert cfg.session_conf() == {"spark.sql.shuffle.partitions": "13"}

        loaded = registry.load_plugins()
        assert "my_plugin" in loaded and registry.info("cfg_src") is not None

        load_preset_files()
        assert "cfg_preset" in PRESETS

        # registry-made sinks pick up config defaults; explicit args win
        sink = registry.make_sink("local_snapshot", table_dir=str(tmp_path / "t"))
        assert sink.compact_every == 99
        assert sink.manifest()["num_buckets"] == 7
        sink2 = registry.make_sink(
            "local_snapshot", table_dir=str(tmp_path / "t2"), num_buckets=3
        )
        assert sink2.manifest()["num_buckets"] == 3
    finally:
        cfg._cache = None
        PRESETS.pop("cfg_preset", None)
