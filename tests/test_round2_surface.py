"""Round-2 user-surface additions (VERDICT 'What's missing' items):
multi-source recipes, CLI ingest with source-signature introspection,
CLI snapshot search, preset YAML files, pip entry-point plugins,
registry metadata inheritance, inventory output formats, and the
StreamingQueryListener metrics hook."""

from __future__ import annotations

import json
import os
import time

import yaml

from fetchez_spark.changegen import ChangeLogSpec, write_change_log


def _mklog(tmp_path, name, num_events=600, seed=1):
    spec = ChangeLogSpec(num_events=num_events, num_convs=40, max_turns=5, seed=seed)
    return write_change_log(spec, str(tmp_path / name), num_chunks=2), spec


# --------------------------------------------------------------- multi-source
def test_recipe_multi_source_union(spark, tmp_path):
    """Two change logs, per-source selections, ONE target table -- the
    reference `modules[]` recipe shape (recipe.py:207-237)."""
    _mklog(tmp_path, "log_a", seed=1)
    _mklog(tmp_path, "log_b", seed=2)
    cfg = {
        "project": "multi",
        "sources": [
            {
                "name": "parquet_log",
                "args": {"log_dir": str(tmp_path / "log_a"), "batch_files": 1},
            },
            {
                "name": "parquet_log",
                "args": {"log_dir": str(tmp_path / "log_b"), "batch_files": 1},
                # per-source override: only the first half of the key space
                "selection": "key:conv_00000000/conv_00000020",
            },
        ],
        "sink": {
            "name": "local_snapshot",
            "args": {"table_dir": str(tmp_path / "table"), "num_buckets": 4},
        },
        "run": {"mode": "replay"},
    }
    from fetchez_spark.recipe import Recipe
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    result = Recipe(cfg).run(spark=spark)
    assert len(result["batches"]) == 4  # 2 chunks per source
    tokens = {b["batch_token"] for b in result["batches"]}
    assert any(t.startswith("replay-s0-") for t in tokens)
    assert any(t.startswith("replay-s1-") for t in tokens)
    sink = LocalSnapshotSink(str(tmp_path / "table"))
    rows = sink.read(spark).collect()
    assert rows, "union landed"
    # source B rows beyond its selection must NOT appear unless A had them:
    # every conv >= conv_00000020 must trace to log A's seq range (seed 1
    # and 2 share key space; check via per-source replay of A alone)
    table_a = LocalSnapshotSink(str(tmp_path / "table_a"), num_buckets=4)
    Recipe(
        {
            "project": "only-a",
            "source": {"name": "parquet_log", "args": {"log_dir": str(tmp_path / "log_a")}},
            "sink": {
                "name": "local_snapshot",
                "args": {"table_dir": str(tmp_path / "table_a"), "num_buckets": 4},
            },
            "run": {"mode": "replay"},
        }
    ).run(spark=spark)
    keys_a = {
        (r["conv_id"], r["turn_idx"]) for r in table_a.read(spark).collect()
    }
    high = [
        (r["conv_id"], r["turn_idx"])
        for r in rows
        if r["conv_id"] >= "conv_00000020"
    ]
    assert high and set(high) <= keys_a, "selection pruned source B's high keys"


# ------------------------------------------------------------------ CLI forms
def test_cli_ingest_introspected_args(spark, tmp_path, capsys):
    from fetchez_spark.cli import main

    _mklog(tmp_path, "log", num_events=400)
    rc = main(
        [
            "ingest",
            "parquet_log",
            f"log_dir={tmp_path}/log",
            "batch_files=1",
            "--table",
            str(tmp_path / "t"),
            "--sink-arg",
            "num_buckets=4",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    res = json.loads(out.strip().splitlines()[-1])
    assert res["batches"] == 2 and res["snapshot"].startswith("snap-")


def test_cli_ingest_show_args_and_bad_arg(capsys):
    from fetchez_spark.cli import main

    rc = main(["ingest", "parquet_log", "--table", "/dev/null", "--show-args"])
    assert rc == 0
    spec = json.loads(capsys.readouterr().out)
    assert spec["log_dir"]["required"] is True
    assert spec["batch_files"]["default"] == 4
    import pytest

    with pytest.raises(SystemExit, match="unknown arg"):
        main(["ingest", "parquet_log", "nope=1", "--table", "/tmp/x"])
    with pytest.raises(SystemExit, match="missing required"):
        main(["ingest", "parquet_log", "--table", "/tmp/x"])


def test_cli_snapshots_search(spark, tmp_path, capsys):
    import datetime as dt

    from fetchez_spark.cli import main
    from fetchez_spark.schema import CHANGE_EVENT_SCHEMA
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=2)
    rows = [
        ("I", f"c{i}", 0, "user", "x", None, dt.datetime(2024, 1, 1, 12, 0, i), i, 0)
        for i in range(7)
    ]
    sink.merge(spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA), "b1")
    rc = main(["snapshots", str(tmp_path / "t"), "--range", "rows_in=5:"])
    assert rc == 0
    recs = [json.loads(line) for line in capsys.readouterr().out.strip().splitlines()]
    assert len(recs) == 1 and recs[0]["rows_in"] == 7
    assert main(["snapshots", str(tmp_path / "nope")]) == 1


# --------------------------------------------------------------- preset files
def test_preset_yaml_files(tmp_path):
    from fetchez_spark.transforms import PRESETS, expand_presets, load_preset_files

    pdir = tmp_path / "presets"
    pdir.mkdir()
    (pdir / "mine.yaml").write_text(
        yaml.safe_dump(
            {
                "strip_system": [
                    {
                        "transform": "filter_values",
                        "args": {"column": "role", "values": ["system"], "keep": False},
                    }
                ]
            }
        )
    )
    loaded = load_preset_files(str(pdir))
    assert loaded == ["strip_system"] and "strip_system" in PRESETS
    chain = expand_presets([], ["strip_system"])
    assert chain[0]["transform"] == "filter_values"
    PRESETS.pop("strip_system", None)


# --------------------------------------------------------------- entry points
def test_entry_point_plugin_discovery(monkeypatch):
    from fetchez_spark import registry

    calls = []

    class FakeEp:
        name = "my_plugin"

        @staticmethod
        def load():
            def setup(reg):
                calls.append(reg.__name__)
                reg.register_source(
                    registry.SourceInfo(
                        "ep_source", "fetchez_spark.sources.parquet_log:ParquetLogSource",
                        "log", "from entry point",
                    )
                )

            return setup

    import importlib.metadata as md

    monkeypatch.setattr(md, "entry_points", lambda group=None: [FakeEp()])
    loaded = registry.load_entry_point_plugins()
    assert loaded == ["my_plugin"]
    assert calls == ["fetchez_spark.registry"]
    assert registry.info("ep_source").desc == "from entry point"
    registry._SOURCES.pop("ep_source", None)


def test_registry_metadata_inheritance():
    from fetchez_spark import registry

    registry.register_source(
        registry.SourceInfo("child_log", "", "", "", tags=["extra"]),
        extends="parquet_log",
    )
    try:
        child = registry.info("child_log")
        parent = registry.info("parquet_log")
        assert child.cls == parent.cls and child.category == parent.category
        assert set(parent.tags) <= set(child.tags) and "extra" in child.tags
    finally:
        registry._SOURCES.pop("child_log", None)


# ----------------------------------------------------------- inventory formats
def test_inventory_formats(spark, tmp_path):
    import datetime as dt

    from fetchez_spark.schema import CHANGE_EVENT_SCHEMA
    from fetchez_spark.transforms import get_transform

    df = spark.createDataFrame(
        [("I", "c1", 0, "user", "x", None, dt.datetime(2024, 1, 1), 0, 0)],
        CHANGE_EVENT_SCHEMA,
    )
    for fmt, probe in (("json", '"op":"I"'), ("csv", "op,conv_id"), ("text", "I|c1|0")):
        out = tmp_path / fmt
        get_transform("inventory", out_dir=str(out), fmt=fmt)(df)
        body = "".join(
            (out / f).read_text()
            for f in os.listdir(out)
            if not f.startswith(("_", "."))
        )
        assert probe in body, f"{fmt}: {body[:200]}"
    import pytest

    with pytest.raises(ValueError, match="fmt"):
        get_transform("inventory", out_dir="/tmp/x", fmt="xml")


# -------------------------------------------------------------- query listener
def test_streaming_metrics_listener(spark, tmp_path):
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink
    from fetchez_spark.streaming.engine import run_stream
    from fetchez_spark.streaming.listener import MetricsListener

    _mklog(tmp_path, "log", num_events=500)
    listener = MetricsListener(out_dir=str(tmp_path / "metrics"))
    spark.streams.addListener(listener)
    try:
        sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=2)
        q = run_stream(
            spark,
            str(tmp_path / "log"),
            sink,
            checkpoint_dir=str(tmp_path / "ckpt"),
            max_files_per_trigger=1,
        )
        q.awaitTermination(120)
        # listener events are delivered async on the bus thread: poll until
        # every batch's progress landed
        deadline = time.monotonic() + 30
        total = 0
        while time.monotonic() < deadline and total < 500:
            total = sum(p["num_input_rows"] for p in listener.progress)
            time.sleep(0.5)
        assert total == 500
        files = os.listdir(tmp_path / "metrics")
        assert len(files) >= len(listener.progress) > 0
    finally:
        spark.streams.removeListener(listener)


def test_console_and_focus_transforms(spark, capsys):
    from pyspark.sql import functions as F

    from fetchez_spark.transforms import get_transform

    df = spark.createDataFrame(
        [("c1", 0, ["a", "b", "a"]), ("c1", 1, ["a"])],
        ["conv_id", "turn_idx", "tags"],
    )
    out = get_transform("console", n=5)(df)
    assert out is df  # passthrough
    assert "conv_id" in capsys.readouterr().out
    focused = get_transform("focus", column="tags")(df).orderBy(
        "conv_id", "turn_idx", "item"
    )
    rows = [(r["conv_id"], r["turn_idx"], r["item"]) for r in focused.collect()]
    assert rows == [("c1", 0, "a"), ("c1", 0, "b"), ("c1", 1, "a")]


def test_inline_source_merges_like_any_source(spark, tmp_path):
    import datetime as dt

    from fetchez_spark.schema import CHANGE_EVENT_SCHEMA
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink
    from fetchez_spark.sources.inline import InlineSource
    from fetchez_spark.streaming.engine import replay_batches

    rows = [
        ("I", "c1", 0, "user", "manual fix", None, dt.datetime(2024, 1, 2), 99, 0)
    ]
    src = InlineSource(rows, schema=CHANGE_EVENT_SCHEMA)
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=2)
    out = replay_batches(spark, src.batches(spark), sink, token_prefix="inline")
    assert out[0]["rows_in"] == 1
    assert sink.read(spark).first()["text"] == "manual fix"


def test_selection_chunk_key_codec():
    from fetchez_spark.selection import Selection

    chunks = Selection(key_min="0000000000000000", key_max="0000000000000100").chunk(
        4,
        key_format=lambda i: f"{i:016x}",
        key_parse=lambda s: int(s, 16),
    )
    assert chunks[0].key_min == f"{0:016x}"
    assert chunks[-1].key_max == "0000000000000100"
    assert len(chunks) == 4


def test_api_snapshots_search(spark, tmp_path):
    import datetime as dt

    from fetchez_spark import api
    from fetchez_spark.schema import CHANGE_EVENT_SCHEMA
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=2)
    rows = [
        ("I", f"c{i}", 0, "user", "x", None, dt.datetime(2024, 1, 1, 12, 0, i), i, 0)
        for i in range(5)
    ]
    sink.merge(spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA), "b1")
    recs = api.snapshots(str(tmp_path / "t"), ranges={"rows_in": (1, None)})
    assert len(recs) == 1 and recs[0]["rows_in"] == 5


def test_neardup_clusters_min_label(spark):
    """Planted graph: component {0,1,2} (chain via high-cos pairs) plus an
    isolated vector -- every member must get cluster_id = min id."""
    import numpy as np

    from fetchez_spark.functions.similarity import neardup_clusters

    rng = np.random.default_rng(5)
    base = rng.normal(size=16)
    rows = []
    for i, eps in ((0, 0.0), (1, 0.05), (2, 0.08)):
        v = base + eps * rng.normal(size=16)
        rows.append((i, [float(x) for x in v]))
    rows.append((3, [float(x) for x in rng.normal(size=16)]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = neardup_clusters(
        df, dim=16, bands=4, planes_per_band=2, threshold=0.9, seed=7
    ).collect()
    got = {r["vec_id"]: r["cluster_id"] for r in out}
    assert got.get(0) == 0 and got.get(1) == 0 and got.get(2) == 0
    assert 3 not in got, "isolated vector joins no cluster"


def test_cli_changes(spark, tmp_path, capsys):
    import datetime as dt

    from fetchez_spark.cli import main
    from fetchez_spark.schema import CHANGE_EVENT_SCHEMA
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=2)
    rows1 = [("I", "c1", 0, "user", "a", None, dt.datetime(2024, 1, 1), 0, 0)]
    rows2 = [("I", "c2", 0, "user", "b", None, dt.datetime(2024, 1, 2), 1, 0)]
    sink.merge(spark.createDataFrame(rows1, CHANGE_EVENT_SCHEMA), "b1")
    s1 = sink.current_snapshot_id
    sink.merge(spark.createDataFrame(rows2, CHANGE_EVENT_SCHEMA), "b2")
    rc = main(["changes", str(tmp_path / "t"), s1])
    assert rc == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert lines[-1] == {"total_changed_rows": 1}
    assert lines[0]["conv_id"] == "c2"


def test_semantic_dedup_keeps_the_most_diverse_member(spark):
    # SemDeDup rule: within a near-dup group the survivor is the member
    # FARTHEST from the group centroid (lowest cosine), not the most
    # typical one; singletons always keep with cos_centroid 1.0
    import numpy as np

    from fetchez_spark.functions.similarity import semantic_dedup

    vecs = {
        1: [1.0, 0.0, 0.0, 0.0],
        2: [0.999, 0.045, 0.0, 0.0],
        3: [0.99, -0.14, 0.0, 0.0],  # farthest from the trio centroid
        4: [0.0, 1.0, 0.0, 0.0],  # singleton
    }
    df = spark.createDataFrame(
        [(k, [float(x) for x in v]) for k, v in vecs.items()],
        "vec_id: long, embedding: array<float>",
    )
    rows = {
        r["vec_id"]: r
        for r in semantic_dedup(
            df, dim=4, bands=4, planes_per_band=2, threshold=0.9, seed=7
        ).collect()
    }
    assert len(rows) == 4  # one verdict per input doc
    assert all(rows[k]["cluster_id"] == 1 for k in (1, 2, 3))
    assert rows[4]["keep"] and rows[4]["cluster_id"] == 4
    assert rows[4]["cos_centroid"] == 1.0
    # the keeper matches an independent numpy argmin over the centroid
    c = np.mean([vecs[1], vecs[2], vecs[3]], axis=0)
    cos = {
        k: round(
            float(np.dot(vecs[k], c) / (np.linalg.norm(vecs[k]) * np.linalg.norm(c))),
            6,
        )
        for k in (1, 2, 3)
    }
    expect = min((v, k) for k, v in cos.items())[1]
    assert [k for k in (1, 2, 3) if rows[k]["keep"]] == [expect]
    assert rows[expect]["cos_centroid"] == cos[expect]


def test_profile_columns_exact_and_approx(spark):
    from fetchez_spark.transforms import profile_columns

    df = spark.createDataFrame(
        [(1, "aa", 2.0), (2, None, 2.0), (3, "bbb", None), (4, "aa", 5.5)],
        "id: long, s: string, v: double",
    )
    rows = {r["column"]: r for r in profile_columns(df).collect()}
    assert set(rows) == {"id", "s", "v"}
    assert all(r["n_rows"] == 4 for r in rows.values())
    assert (rows["s"]["n_nulls"], rows["s"]["n_distinct"]) == (1, 2)
    assert (rows["v"]["n_nulls"], rows["v"]["n_distinct"]) == (1, 2)
    assert (rows["s"]["min_str"], rows["s"]["max_str"]) == ("aa", "bbb")
    assert rows["s"]["avg_len"] == round((2 + 3 + 2) / 3, 4)
    # non-string columns never string-format min/max (engine-portable)
    assert rows["v"]["min_str"] is None and rows["v"]["avg_len"] is None
    # approx path: HLL distinct, everything else identical
    ap = {r["column"]: r for r in profile_columns(df, approx=True).collect()}
    assert ap["s"]["n_nulls"] == 1 and ap["s"]["min_str"] == "aa"
    assert 1 <= ap["s"]["n_distinct"] <= 3
    # column subset respected
    sub = profile_columns(df, ["id"]).collect()
    assert [r["column"] for r in sub] == ["id"]


def test_cli_profile(spark, tmp_path, capsys):
    import json

    from fetchez_spark.cli import main
    from fetchez_spark.schema import CHANGE_EVENT_SCHEMA
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=2)
    rows = [("U", f"c{i}", 0, "user", f"txt-{i}", None if i % 2 else "grep",
             t0, i, 0) for i in range(10)]
    sink.merge(spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA), "b0")
    rc = main(["profile", sink.table_dir, "--columns", "conv_id,tool", "--cores", "2"])
    assert rc == 0
    recs = {json.loads(l)["column"]: json.loads(l)
            for l in capsys.readouterr().out.strip().splitlines()}
    assert set(recs) == {"conv_id", "tool"}
    assert recs["conv_id"]["n_rows"] == 10 and recs["conv_id"]["n_distinct"] == 10
    assert recs["tool"]["n_nulls"] == 5 and recs["tool"]["n_distinct"] == 1
    assert recs["conv_id"]["min_str"] == "c0"
