"""Zero-copy table clone (Delta SHALLOW CLONE / Iceberg snapshot-export
analog): ``clone_to`` creates an independently-writable table whose first
snapshot references the source's data files.  The tests pin the three
contracts that make that safe: isolation (writes/maintenance on either
side never affect the other), protection (the auto-created source tag
keeps the cloned snapshot alive through aggressive expiry), and
localization (a full compaction rewrites every referenced byte into the
clone's own dir, after which the tag can be dropped)."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

UTC = dt.timezone.utc


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2025, 4, 1, 0, 0, 0, tzinfo=UTC) + dt.timedelta(seconds=s)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows,
        "op string, conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp, seq long",
    )


def _seed(spark, tmp_path, name="src", n=30, **kw):
    sink = LocalSnapshotSink(str(tmp_path / name), num_buckets=4, **kw)
    rows = [
        ("U", f"c{i % 7}", i % 3, "user", f"text-{i}", None, _ts(i), i)
        for i in range(n)
    ]
    sink.merge(_batch(spark, rows), "seed-0")
    return sink


def _state(spark, sink):
    return {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"])
        for r in sink.read(spark).collect()
    }


def _referenced(sink):
    m = sink.manifest()
    out = []
    for mp in (m["files"], m.get("deltas", {})):
        for fs in mp.values():
            out.extend(sink._resolve_list(fs))
    return out


def test_clone_matches_source_then_diverges(spark, tmp_path):
    src = _seed(spark, tmp_path)
    at_clone = _state(spark, src)
    clone = src.clone_to(str(tmp_path / "clone"))
    assert _state(spark, clone) == at_clone
    # zero copy: every referenced file still lives under the SOURCE
    assert all(f.startswith(str(tmp_path / "src")) for f in _referenced(clone))
    # source evolves; the clone stays at the clone point
    src.merge(
        _batch(spark, [("U", "c0", 0, "asst", "after-clone", None, _ts(99), 99)]),
        "post-0",
    )
    assert _state(spark, clone) == at_clone
    # clone evolves; the source never sees it
    before_src = _state(spark, src)
    clone.merge(
        _batch(spark, [("U", "c1", 1, "tool", "clone-only", "bash", _ts(98), 98)]),
        "clone-0",
    )
    assert _state(spark, src) == before_src
    assert _state(spark, clone)[("c1", 1)] == ("tool", "clone-only", "bash")


def test_clone_survives_aggressive_source_expiry(spark, tmp_path):
    src = _seed(spark, tmp_path)
    at_clone = _state(spark, src)
    clone = src.clone_to(str(tmp_path / "clone"), tag_name="dev-sandbox")
    for i in range(3):
        src.merge(
            _batch(spark, [("U", "c0", 0, "u", f"r{i}", None, _ts(50 + i), 50 + i)]),
            f"more-{i}",
        )
    src.compact(spark)
    src.expire_snapshots(keep_last=1, min_age_seconds=0)
    # the tag pinned the cloned snapshot's files through expiry
    assert _state(spark, clone) == at_clone
    assert src.tags().get("dev-sandbox")


def test_clone_compaction_localizes_then_tag_droppable(spark, tmp_path):
    src = _seed(spark, tmp_path)
    at_clone = _state(spark, src)
    clone = src.clone_to(str(tmp_path / "clone"), tag_name="sandbox")
    clone.compact(spark)
    # a full fold rewrote every bucket into clone-local files
    assert all(
        f.startswith(str(tmp_path / "clone")) for f in _referenced(clone)
    ), _referenced(clone)
    # the clone is now self-contained: release the pin, expire the source
    src.drop_tag("sandbox")
    src.merge(
        _batch(spark, [("U", "c9", 0, "u", "x", None, _ts(70), 70)]), "m-0"
    )
    src.compact(spark)
    src.expire_snapshots(keep_last=1, min_age_seconds=0)
    assert _state(spark, clone) == at_clone


def test_clone_maintenance_never_touches_source(spark, tmp_path):
    src = _seed(spark, tmp_path)
    clone = src.clone_to(str(tmp_path / "clone"))
    clone.merge(
        _batch(spark, [("U", "c2", 2, "u", "cl", None, _ts(60), 60)]), "cl-0"
    )
    clone.compact(spark)
    clone.expire_snapshots(keep_last=1, min_age_seconds=0)
    clone.vacuum_orphans(min_age_seconds=0)
    # the source's files are all still on disk and the source reads clean
    assert all(os.path.exists(f) for f in _referenced(src))
    assert len(_state(spark, src)) > 0


def test_clone_carries_metadata_and_token_state(spark, tmp_path):
    src = _seed(spark, tmp_path, snapshot_keep_last=7)
    src.add_expectation("role_set", "role IS NOT NULL", "drop")
    clone = src.clone_to(str(tmp_path / "clone"))
    assert clone.key == src.key
    assert clone.snapshot_keep_last == 7
    assert [e[0] for e in clone.expectations] == ["role_set"]
    # a replayed source batch token is idempotent against the clone
    res = clone.merge(
        _batch(spark, [("U", "zz", 0, "u", "dup", None, _ts(1), 1)]), "seed-0"
    )
    assert res["skipped"]
    assert ("zz", 0) not in _state(spark, clone)


def test_clone_of_partial_mode_table(spark, tmp_path):
    src = _seed(spark, tmp_path, merge_mode="partial")
    src.merge(
        _batch(spark, [("U", "c0", 0, None, None, "patched-tool", _ts(40), 40)]),
        "sparse-0",
    )
    at_clone = _state(spark, src)
    clone = src.clone_to(str(tmp_path / "clone"))
    assert clone.merge_mode == "partial"
    assert _state(spark, clone) == at_clone
    # sparse updates keep coalescing on the clone
    clone.merge(
        _batch(spark, [("U", "c0", 0, None, "new-text", None, _ts(41), 41)]),
        "sparse-1",
    )
    got = _state(spark, clone)[("c0", 0)]
    assert got[1] == "new-text" and got[2] == "patched-tool"


def test_clone_guards(spark, tmp_path):
    src = _seed(spark, tmp_path)
    clone = src.clone_to(str(tmp_path / "clone"))
    with pytest.raises(ValueError, match="already holds"):
        src.clone_to(str(tmp_path / "clone"))
    with pytest.raises(ValueError, match="data/ root"):
        src.clone_to(os.path.join(src.table_dir, "data", "nested"))
    # a tag collision fails the clone up front and leaks nothing
    tags_before = set(src.tags())  # the first clone's auto tag
    src.create_tag("busy")
    with pytest.raises(ValueError, match="already exists"):
        src.clone_to(str(tmp_path / "c2"), tag_name="busy")
    assert set(src.tags()) == tags_before | {"busy"}
    assert not os.path.exists(str(tmp_path / "c2" / "VERSION"))


def test_clone_as_of_ref(spark, tmp_path):
    src = _seed(spark, tmp_path)
    early = _state(spark, src)
    early_sid = src.current_snapshot_id
    src.merge(
        _batch(spark, [("U", "c0", 0, "u", "later", None, _ts(80), 80)]), "l-0"
    )
    clone = src.clone_to(str(tmp_path / "clone"), ref=early_sid)
    assert _state(spark, clone) == early


def test_cli_clone(spark, tmp_path, capsys):
    import json

    from fetchez_spark.cli import main as cli_main

    src = _seed(spark, tmp_path)
    at_clone = _state(spark, src)
    rc = cli_main(
        ["clone", str(tmp_path / "src"), str(tmp_path / "cli-clone"),
         "--tag-name", "cli-pin"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["tag"] == "cli-pin" and out["snapshot_id"] == src.current_snapshot_id
    clone = LocalSnapshotSink(str(tmp_path / "cli-clone"))
    assert _state(spark, clone) == at_clone
