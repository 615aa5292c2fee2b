"""WAP (write-audit-publish) branches: stage commits on a branch,
audit with ordinary reads, publish with one atomic fast-forward of the
main pointer.  Branches share the table's snapshot space (globally
collision-free sid claims), so a branch is exactly one pointer file.
Reference analog: the Iceberg branch/WAP pattern the north rule's sink
models.
"""

from __future__ import annotations

import datetime as dt
import json

import pytest

from fetchez_spark.schema import CHANGE_EVENT_SCHEMA
from fetchez_spark.sinks.local_snapshot import (
    ConcurrentWriteConflict,
    LocalSnapshotSink,
)

T0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def ev(op, conv, turn, text, ts_s, seq, part=0):
    return (op, conv, turn, "user", text, None, T0 + dt.timedelta(seconds=ts_s), seq, part)


def _df(spark, rows, schema=CHANGE_EVENT_SCHEMA):
    return spark.createDataFrame(rows, schema)


def _base_table(spark, tmp_path):
    main = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=2, compact_every=10**9)
    main.merge(_df(spark, [ev("U", f"c{i}", 0, "base", i, i) for i in range(6)]), "m1")
    return main


def test_wap_stage_audit_publish(spark, tmp_path):
    main = _base_table(spark, tmp_path)
    stage = LocalSnapshotSink(str(tmp_path / "t"), branch="audit")
    # auto-fork: the branch starts with main's data
    assert stage.read(spark).count() == 6
    stage.merge(_df(spark, [ev("U", "c0", 0, "STAGED", 100, 100)]), "a1")
    # staged commit invisible on main, visible on the branch
    assert {r["text"] for r in main.read(spark).collect()} == {"base"}
    assert "STAGED" in {r["text"] for r in stage.read(spark).collect()}
    staged_head = stage.current_snapshot_id
    out = stage.publish()
    assert out["branch"] == "audit" and out["published"] == staged_head
    # publish is atomic: main now sees every staged commit
    got = {r["conv_id"]: r["text"] for r in main.read(spark).collect()}
    assert got["c0"] == "STAGED" and got["c1"] == "base"
    # default publish drops the branch pointer
    assert "audit" not in main.branches()


def test_publish_refuses_non_fast_forward(spark, tmp_path):
    main = _base_table(spark, tmp_path)
    stage = LocalSnapshotSink(str(tmp_path / "t"), branch="audit")
    stage.merge(_df(spark, [ev("U", "c0", 0, "STAGED", 100, 100)]), "a1")
    # main advances past the fork point
    main.merge(_df(spark, [ev("U", "c1", 0, "MAIN-MOVED", 101, 101)]), "m2")
    with pytest.raises(ConcurrentWriteConflict):
        stage.publish()
    # main unharmed
    assert {r["text"] for r in main.read(spark).collect()} >= {"MAIN-MOVED"}


def test_expire_retains_unpublished_branch_chain(spark, tmp_path):
    main = _base_table(spark, tmp_path)
    stage = LocalSnapshotSink(str(tmp_path / "t"), branch="audit")
    stage.merge(_df(spark, [ev("U", "c0", 0, "S1", 100, 100)]), "a1")
    stage.merge(_df(spark, [ev("U", "c5", 0, "S2", 101, 101)]), "a2")
    main.expire_snapshots(keep_last=1, min_age_seconds=0)
    # the branch's staged state AND its publishability survive expiry
    texts = {r["text"] for r in stage.read(spark).collect()}
    assert {"S1", "S2"} <= texts
    stage.publish()
    got = {r["text"] for r in main.read(spark).collect()}
    assert {"S1", "S2"} <= got


def test_branch_api_guards(spark, tmp_path):
    main = _base_table(spark, tmp_path)
    main.create_branch("x")
    with pytest.raises(ValueError):
        main.create_branch("x")  # duplicate
    with pytest.raises(ValueError):
        main.create_branch("main")
    with pytest.raises(ValueError):
        main.drop_branch("main")
    with pytest.raises(ValueError):
        main.publish("main")
    with pytest.raises(FileNotFoundError):
        main.publish("nope")
    main.drop_branch("x")
    assert set(main.branches()) == {"main"}


def test_cli_branch_roundtrip(spark, tmp_path, capsys):
    from fetchez_spark.cli import main as cli_main

    t = _base_table(spark, tmp_path)
    tdir = str(tmp_path / "t")
    assert cli_main(["branch", tdir, "--create", "audit"]) == 0
    created = json.loads(capsys.readouterr().out)
    assert created["created"]["branch"] == "audit"
    stage = LocalSnapshotSink(tdir, branch="audit")
    stage.merge(_df(spark, [ev("U", "c9", 0, "VIA-CLI", 200, 200)]), "a1")
    staged_head = stage.current_snapshot_id
    assert cli_main(["branch", tdir, "--publish", "audit"]) == 0
    pub = json.loads(capsys.readouterr().out)
    assert pub["publish"]["published"] == staged_head
    assert any(r["text"] == "VIA-CLI" for r in t.read(spark).collect())
    assert cli_main(["branch", tdir, "--list"]) == 0
    listed = json.loads(capsys.readouterr().out)
    assert set(listed["branches"]) == {"main"}
