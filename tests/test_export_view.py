"""ParquetExportView: incrementally-maintained plain-parquet serving
copy of a table's live state.  Equality-vs-DuckDB is oracle-checked in
test_entry_oracle (parquet_export_read); these pin the mechanics:
touched-bucket-only rewrites with hardlink reuse, tombstone exclusion,
atomic version swap + retention, schema-change full re-export, the
symlink-manifest file, and load()-from-dir."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fetchez_spark.operators.export_view import ParquetExportView
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

PAYLOAD = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
T0 = dt.datetime(2024, 1, 1)


def _env(spark, rows):
    # rows: (op, conv_id, text, seq)
    return spark.createDataFrame(
        [
            (op, c, tx, T0 + dt.timedelta(seconds=s), s, 0)
            for op, c, tx, s in rows
        ],
        "op string, conv_id string, text string, ts timestamp, seq long, src_partition int",
    )


@pytest.fixture()
def pair(spark, tmp_path):
    sink = LocalSnapshotSink(
        str(tmp_path / "table"), num_buckets=4, key=["conv_id"],
        base_schema=PAYLOAD, compact_every=10**9,
    )
    exp = ParquetExportView(str(tmp_path / "exp"), sink)
    return sink, exp


def _state(spark, exp):
    return {
        (r["conv_id"], r["text"])
        for r in exp.read(spark).select("conv_id", "text").collect()
    }


def test_full_then_incremental_matches_live_state(spark, pair):
    sink, exp = pair
    sink.merge(
        _env(spark, [("U", f"c{i}", f"t{i}", i) for i in range(20)]),
        batch_token="b0",
    )
    out = exp.refresh(spark)
    assert out["mode"] == "full"
    assert _state(spark, exp) == {(f"c{i}", f"t{i}") for i in range(20)}

    # second batch: rewrite c3, delete c4, insert c99
    sink.merge(
        _env(spark, [("U", "c3", "t3x", 100), ("D", "c4", None, 101),
                     ("U", "c99", "t99", 102)]),
        batch_token="b1",
    )
    out = exp.refresh(spark)
    assert out["mode"] == "incremental"
    assert out["buckets_written"] < 4  # strictly fewer than all buckets
    want = {(f"c{i}", f"t{i}") for i in range(20) if i not in (3, 4)}
    want |= {("c3", "t3x"), ("c99", "t99")}
    assert _state(spark, exp) == want


def test_untouched_buckets_are_hardlinked_not_rewritten(spark, pair):
    sink, exp = pair
    sink.merge(
        _env(spark, [("U", f"c{i}", f"t{i}", i) for i in range(20)]),
        batch_token="b0",
    )
    exp.refresh(spark)
    v1 = exp._current()
    sink.merge(_env(spark, [("U", "c3", "t3x", 100)]), batch_token="b1")
    exp.refresh(spark)
    v2 = exp._current()
    d1 = os.path.join(exp.export_dir, "data", v1["vname"])
    d2 = os.path.join(exp.export_dir, "data", v2["vname"])
    touched, linked = 0, 0
    for b, files in v2["buckets"].items():
        prev = v1["buckets"].get(b, [])
        for rel in files:
            if any(
                os.path.exists(os.path.join(d1, p))
                and os.path.samefile(os.path.join(d1, p), os.path.join(d2, rel))
                for p in prev
            ):
                linked += 1
            else:
                touched += 1
    assert linked > 0, "no untouched bucket reused its files via hardlink"
    assert touched > 0, "the touched bucket must have fresh files"


def test_noop_range_advances_cursor_without_io(spark, pair):
    sink, exp = pair
    sink.merge(_env(spark, [("U", "c1", "t1", 1)]), batch_token="b0")
    exp.refresh(spark)
    v = exp._current()
    sink.compact(spark)  # metadata/compaction-only commit
    out = exp.refresh(spark)
    assert out["mode"] == "noop"
    v2 = exp._current()
    assert v2["vname"] == v["vname"]  # same data, cursor advanced
    assert v2["upstream"] == sink.current_snapshot_id
    assert exp.refresh(spark).get("skipped")  # now fully caught up


def test_schema_change_triggers_full_reexport(spark, pair):
    sink, exp = pair
    sink.merge(_env(spark, [("U", "c1", "t1", 1)]), batch_token="b0")
    exp.refresh(spark)
    wide = _env(spark, [("U", "c2", "t2", 2)]).withColumn(
        "tool", F.lit("search")
    )
    sink.merge(wide, batch_token="b1")
    out = exp.refresh(spark)
    assert out["mode"] == "full"
    df = exp.read(spark)
    assert "tool" in df.columns
    rows = {(r["conv_id"], r["tool"]) for r in df.collect()}
    assert rows == {("c1", None), ("c2", "search")}


def test_version_retention_prunes_old_dirs(spark, pair):
    sink, exp = pair
    for i in range(4):
        sink.merge(_env(spark, [("U", f"c{i}", f"t{i}", i)]), batch_token=f"b{i}")
        exp.refresh(spark)
    meta = os.path.join(exp.export_dir, "_export")
    versions = sorted(f for f in os.listdir(meta) if f.endswith(".json") and f[0] == "v")
    assert len(versions) == exp.keep_versions
    data = sorted(os.listdir(os.path.join(exp.export_dir, "data")))
    assert data == [v[:-5] for v in versions]
    # current symlink resolves and reads green after pruning
    assert exp.read(spark).count() == 4


def test_manifest_file_names_exactly_the_current_files(spark, pair):
    sink, exp = pair
    sink.merge(
        _env(spark, [("U", f"c{i}", f"t{i}", i) for i in range(8)]),
        batch_token="b0",
    )
    exp.refresh(spark)
    files = exp.current_files()
    assert files and all(os.path.exists(f) for f in files)
    got = {
        (r["conv_id"], r["text"])
        for r in spark.read.parquet(*files).select("conv_id", "text").collect()
    }
    assert got == {(f"c{i}", f"t{i}") for i in range(8)}


def test_load_from_dir_and_conflicting_source_refused(spark, pair, tmp_path):
    sink, exp = pair
    sink.merge(_env(spark, [("U", "c1", "t1", 1)]), batch_token="b0")
    exp.refresh(spark)
    again = ParquetExportView.load(exp.export_dir)
    assert again.last_applied() == sink.current_snapshot_id
    assert again.refresh(spark).get("skipped")
    other = LocalSnapshotSink(
        str(tmp_path / "other"), num_buckets=2, key=["conv_id"],
        base_schema=PAYLOAD,
    )
    with pytest.raises(ValueError, match="conflicting source"):
        ParquetExportView(exp.export_dir, other)


def test_expired_range_falls_back_to_full_reexport(spark, pair):
    sink, exp = pair
    sink.merge(_env(spark, [("U", "c1", "t1", 1)]), batch_token="b0")
    exp.refresh(spark)
    exp.release_retention_pin()  # an unpinned lagging export CAN lose its range
    for i in range(2, 6):
        sink.merge(_env(spark, [("U", f"c{i}", f"t{i}", i)]), batch_token=f"b{i}")
    sink.expire_snapshots(keep_last=1, min_age_seconds=0)
    out = exp.refresh(spark)
    assert out["mode"] == "full"
    assert _state(spark, exp) == {(f"c{i}", f"t{i}") for i in range(1, 6)}


def test_retention_pin_protects_lagging_export(spark, pair):
    sink, exp = pair
    sink.merge(_env(spark, [("U", "c1", "t1", 1)]), batch_token="b0")
    exp.refresh(spark)
    for i in range(2, 6):
        sink.merge(_env(spark, [("U", f"c{i}", f"t{i}", i)]), batch_token=f"b{i}")
    sink.expire_snapshots(keep_last=1, min_age_seconds=0)
    out = exp.refresh(spark)  # pinned chain -> increment still possible
    assert out["mode"] == "incremental"
    assert _state(spark, exp) == {(f"c{i}", f"t{i}") for i in range(1, 6)}


def test_recipe_follow_export(spark, pair):
    from fetchez_spark.recipe import Recipe

    sink, exp = pair
    sink.merge(_env(spark, [("U", "c1", "t1", 1)]), batch_token="b0")
    exp.refresh(spark)
    sink.merge(
        _env(spark, [("U", "c2", "t2", 2), ("D", "c1", None, 3)]),
        batch_token="b1",
    )
    out = Recipe(
        {
            "project": "export-follow",
            "view": {"kind": "export", "store_dir": exp.export_dir},
            "run": {"mode": "follow", "poll_seconds": 0.2, "timeout_sec": 4},
        }
    ).run(spark)
    assert out["kind"] == "export" and len(out["refreshes"]) >= 1
    assert out["applied"] == sink.current_snapshot_id
    assert _state(spark, exp) == {("c2", "t2")}


def test_cli_export_round_trip(spark, pair, capsys):
    from fetchez_spark.cli import main as cli_main

    sink, exp = pair
    sink.merge(_env(spark, [("U", "c1", "t1", 1)]), batch_token="b0")
    rc = cli_main(
        ["export", exp.export_dir, "--create", sink.table_dir, "--files"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["refresh"]["mode"] == "full"
    assert out["applied"] == sink.current_snapshot_id
    assert out["files"] and all(os.path.exists(f) for f in out["files"])


def test_empty_live_state_exports_and_reads_back_empty(spark, pair):
    sink, exp = pair
    sink.merge(
        _env(spark, [("U", "c1", "t1", 1), ("D", "c1", None, 2)]),
        batch_token="b0",
    )
    out = exp.refresh(spark)
    assert out["mode"] == "full"
    df = exp.read(spark)  # no files to infer from: schema off the manifest
    assert df.count() == 0
    assert set(df.columns) == {"conv_id", "text", "ts"}
    assert exp.current_files() == []


# --------------------------------------------------- Delta transaction log

def _delta_replay(root):
    """Independent pure-python replay of the public Delta log protocol:
    apply add/remove in version order, return (protocol, metaData,
    {path: add})."""
    logdir = os.path.join(root, "_delta_log")
    live, meta, proto = {}, None, None
    for fname in sorted(os.listdir(logdir)):
        if not fname.endswith(".json"):
            continue
        with open(os.path.join(logdir, fname)) as fh:
            for line in fh:
                a = json.loads(line)
                if "add" in a:
                    live[a["add"]["path"]] = a["add"]
                elif "remove" in a:
                    live.pop(a["remove"]["path"], None)
                elif "metaData" in a:
                    meta = a["metaData"]
                elif "protocol" in a:
                    proto = a["protocol"]
    return proto, meta, live


@pytest.fixture()
def dpair(spark, tmp_path):
    sink = LocalSnapshotSink(
        str(tmp_path / "table"), num_buckets=4, key=["conv_id"],
        base_schema=PAYLOAD, compact_every=10**9,
    )
    exp = ParquetExportView(str(tmp_path / "exp"), sink, delta_log=True)
    return sink, exp


def test_delta_log_replay_matches_published_state(spark, dpair):
    sink, exp = dpair
    sink.merge(
        _env(spark, [("U", f"c{i}", f"t{i}", i) for i in range(20)]),
        batch_token="b0",
    )
    out = exp.refresh(spark)
    assert out["delta_version"] == 0
    sink.merge(_env(spark, [("U", "c3", "t3x", 100), ("D", "c4", None, 101)]),
               batch_token="b1")
    out = exp.refresh(spark)
    assert out["delta_version"] == 1

    proto, meta, live = _delta_replay(exp.export_dir)
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}
    schema = json.loads(meta["schemaString"])
    assert [f["name"] for f in schema["fields"]] == [
        "conv_id", "text", "ts", "_fz_bucket",
    ]
    assert meta["partitionColumns"] == ["_fz_bucket"]
    # the live file set IS the current published set
    cur_files = {
        os.path.relpath(f, exp.export_dir) for f in exp.current_files()
    }
    assert set(live) == cur_files
    for path, add in live.items():
        full = os.path.join(exp.export_dir, path)
        assert os.path.getsize(full) == add["size"]
        assert f"_fz_bucket={add['partitionValues']['_fz_bucket']}" in path
    # a Delta reader's view: read each add with its partition value attached
    dfs = None
    for path, add in live.items():
        part = spark.read.parquet(os.path.join(exp.export_dir, path)).withColumn(
            "_fz_bucket", F.lit(int(add["partitionValues"]["_fz_bucket"]))
        )
        dfs = part if dfs is None else dfs.unionByName(part)
    got = {(r["conv_id"], r["text"]) for r in dfs.collect()}
    want = {
        (r["conv_id"], r["text"])
        for r in sink.read(spark).select("conv_id", "text").collect()
    }
    assert got == want


def test_delta_datachange_false_on_carried_buckets(spark, dpair):
    sink, exp = dpair
    sink.merge(
        _env(spark, [("U", f"c{i}", f"t{i}", i) for i in range(20)]),
        batch_token="b0",
    )
    exp.refresh(spark)
    sink.merge(_env(spark, [("U", "c3", "t3x", 100)]), batch_token="b1")
    exp.refresh(spark)
    with open(os.path.join(exp.export_dir, "_delta_log",
                           f"{1:020d}.json")) as fh:
        adds = [json.loads(l)["add"] for l in fh if '"add"' in l]
    flags = {a["dataChange"] for a in adds}
    assert flags == {True, False}, "carried buckets must be dataChange=false"


def test_delta_schema_evolution_emits_new_metadata(spark, dpair):
    sink, exp = dpair
    sink.merge(_env(spark, [("U", "c1", "t1", 1)]), batch_token="b0")
    exp.refresh(spark)
    sink.merge(
        _env(spark, [("U", "c2", "t2", 2)]).withColumn("tool", F.lit("x")),
        batch_token="b1",
    )
    exp.refresh(spark)
    with open(os.path.join(exp.export_dir, "_delta_log",
                           f"{1:020d}.json")) as fh:
        metas = [json.loads(l)["metaData"] for l in fh if '"metaData"' in l]
    assert len(metas) == 1
    assert "tool" in [f["name"] for f in json.loads(metas[0]["schemaString"])["fields"]]


def test_delta_flag_conflicts_and_load_adopts(spark, dpair, tmp_path):
    sink, exp = dpair
    sink.merge(_env(spark, [("U", "c1", "t1", 1)]), batch_token="b0")
    exp.refresh(spark)
    again = ParquetExportView.load(exp.export_dir)
    assert again.delta_log and again._delta_id == exp._delta_id
    plain = ParquetExportView(str(tmp_path / "plain"), sink)
    with pytest.raises(ValueError, match="without a Delta log"):
        ParquetExportView(str(tmp_path / "plain"), sink, delta_log=True)
    assert not plain.delta_log


def test_zstd_codec_and_multi_view_follow_recipe(spark, pair, tmp_path):
    from fetchez_spark.operators.outbox import ChangeOutbox
    from fetchez_spark.recipe import Recipe

    sink, _ = pair
    exp = ParquetExportView(str(tmp_path / "zexp"), sink, parquet_codec="zstd")
    box = ChangeOutbox(str(tmp_path / "box"), sink)
    sink.merge(_env(spark, [("U", "c1", "t1", 1)]), batch_token="b0")
    exp.refresh(spark)
    box.refresh(spark)
    assert all(".zstd." in f for f in exp.current_files())  # codec applied
    # zstd parquet reads back fine
    assert exp.read(spark).count() == 1
    sink.merge(_env(spark, [("U", "c2", "t2", 2)]), batch_token="b1")
    out = Recipe(
        {
            "views": [
                {"kind": "export", "store_dir": exp.export_dir},
                {"kind": "outbox", "store_dir": box.outbox_dir},
            ],
            "run": {"mode": "follow", "poll_seconds": 0.2, "timeout_sec": 3},
        }
    ).run(spark)
    kinds = {r["kind"] for r in out["refreshes"]}
    assert kinds == {"export", "outbox"}
    assert out["applied"] == [sink.current_snapshot_id] * 2
    assert _state(spark, exp) == {("c1", "t1"), ("c2", "t2")}


def test_codec_persists_through_load_and_conflicts_are_loud(spark, pair, tmp_path):
    sink, _ = pair
    exp = ParquetExportView(str(tmp_path / "zx"), sink, parquet_codec="zstd")
    sink.merge(_env(spark, [("U", "c1", "t1", 1)]), batch_token="b0")
    exp.refresh(spark)
    again = ParquetExportView.load(str(tmp_path / "zx"))
    assert again.parquet_codec == "zstd"  # cron re-open keeps publishing zstd
    sink.merge(_env(spark, [("U", "c2", "t2", 2)]), batch_token="b1")
    again.refresh(spark)
    assert all(".zstd." in f for f in again.current_files())
    with pytest.raises(ValueError, match="conflicting 'gzip'"):
        ParquetExportView(str(tmp_path / "zx"), sink, parquet_codec="gzip")


def test_export_fsck_clean_and_detects_tampering(spark, pair, tmp_path):
    sink, _ = pair
    exp = ParquetExportView(str(tmp_path / "fx"), sink, delta_log=True)
    sink.merge(
        _env(spark, [("U", f"c{i}", f"t{i}", i) for i in range(8)]),
        batch_token="b0",
    )
    exp.refresh(spark)
    out = exp.fsck()
    assert out["errors"] == [] and out["warnings"] == []
    # crash debris is a warning, not an error
    os.makedirs(os.path.join(exp.export_dir, "data", "v99999999"))
    assert any("unreferenced" in w for w in exp.fsck()["warnings"])
    # delete a published data file: missing-file AND delta-replay errors
    victim = exp.current_files()[0]
    os.remove(victim)
    errs = exp.fsck()["errors"]
    assert any("missing data file" in e for e in errs)


def test_cli_export_fsck_exit_codes(spark, pair, capsys, tmp_path):
    from fetchez_spark.cli import main as cli_main

    sink, exp = pair
    sink.merge(_env(spark, [("U", "c1", "t1", 1)]), batch_token="b0")
    exp.refresh(spark)
    assert cli_main(["export", exp.export_dir, "--fsck"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["fsck"]["errors"] == []
    os.remove(exp.current_files()[0])
    assert cli_main(["export", exp.export_dir, "--fsck"]) == 1


def test_version_pinned_reads_time_travel_the_export(spark, pair):
    sink, exp = pair
    sink.merge(_env(spark, [("U", "c1", "t1", 1)]), batch_token="b0")
    exp.refresh(spark)
    sink.merge(_env(spark, [("U", "c1", "t1x", 9), ("U", "c2", "t2", 10)]),
               batch_token="b1")
    exp.refresh(spark)
    v1 = {(r["conv_id"], r["text"])
          for r in exp.read(spark, version=1).select("conv_id", "text").collect()}
    v2 = {(r["conv_id"], r["text"])
          for r in exp.read(spark, version=2).select("conv_id", "text").collect()}
    assert v1 == {("c1", "t1")}
    assert v2 == {("c1", "t1x"), ("c2", "t2")} == _state(spark, exp)
    # prune past the retention window -> loud error
    for i in range(3, 5):
        sink.merge(_env(spark, [("U", f"c{i}", f"t{i}", i * 10)]),
                   batch_token=f"b{i}")
        exp.refresh(spark)
    with pytest.raises(ValueError, match="not retained"):
        exp.read(spark, version=1)


def test_read_never_published_export_is_a_clear_error(spark, pair):
    """ADVICE r4: read() before the first refresh() must name the actual
    problem, not surface a raw AnalysisException from the nonexistent
    'current' symlink."""
    _, exp = pair
    with pytest.raises(ValueError, match="never been published"):
        exp.read(spark)
