"""Zero-copy file onboarding (``import_files`` -- the Iceberg ``add_files``
analog; reference analog: fetchez's local file injection, which registers
already-present files instead of re-fetching, /root/reference/src/fetchez/
path.py).  Pins the contracts that make adopting foreign parquet in place
safe: imported rows behave as backfill inserts under the LWW fold
(``_seq=-1`` loses same-ts ties to any engine event), the commit is
metadata-only (no copy -- referenced paths stay external), validation
refuses every shape that would corrupt silently (missing/null keys,
internal-name collisions, key widening, own files, duplicates), and the
files flow through compaction / change feed / maintenance like any other
deltas while the source bytes are never deleted."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

UTC = dt.timezone.utc
PAYLOAD = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2025, 4, 1, 0, 0, 0, tzinfo=UTC) + dt.timedelta(seconds=s)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows,
        "op string, conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp, seq long",
    )


def _seed(spark, tmp_path, name="t", n=30, **kw):
    sink = LocalSnapshotSink(str(tmp_path / name), num_buckets=4, **kw)
    rows = [
        ("U", f"c{i % 7}", i % 3, "user", f"text-{i}", None, _ts(i), i)
        for i in range(n)
    ]
    sink.merge(_batch(spark, rows), "seed-0")
    return sink


def _ext(spark, tmp_path, rows, name="ext", schema=PAYLOAD):
    path = str(tmp_path / name)
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(path)
    return path


def _state(spark, sink):
    return {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"])
        for r in sink.read(spark).collect()
    }


def test_import_zero_copy_basic(spark, tmp_path):
    sink = _seed(spark, tmp_path)
    before = _state(spark, sink)
    ext = _ext(
        spark,
        tmp_path,
        [(f"x{i}", 0, "user", f"imported-{i}", None, _ts(100 + i)) for i in range(5)],
    )
    res = sink.import_files(spark, ext)
    assert res["skipped"] is False and res["imported_files"] == 1
    after = _state(spark, sink)
    assert after[("x3", 0)] == ("user", "imported-3")
    assert {k: v for k, v in after.items() if not k[0].startswith("x")} == before
    # ZERO COPY: the registered delta files ARE the external files
    flat = sink._resolve_list(sink.manifest().get("deltas", {}).get("*", []))
    assert any(f.startswith(ext) for f in flat)
    assert not any(
        f.startswith(ext) for fs in sink.manifest()["files"].values()
        for f in sink._resolve_list(fs)
    )
    # content-addressed token: the same import replays as a skip
    again = sink.import_files(spark, ext)
    assert again["skipped"] is True
    assert sink.count_rows(spark) == len(after)


def test_import_lww_backfill_semantics(spark, tmp_path):
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=2)
    sink.merge(
        _batch(
            spark,
            [
                ("U", "a", 0, "user", "engine-tie", None, _ts(5), 0),
                ("U", "a", 1, "user", "engine-old", None, _ts(3), 0),
            ],
        ),
        "seed-0",
    )
    ext = _ext(
        spark,
        tmp_path,
        [
            ("a", 0, "imp", "import-tie", None, _ts(5)),   # same ts: engine wins
            ("a", 1, "imp", "import-new", None, _ts(10)),  # newer ts: import wins
            ("a", 2, "imp", "import-only", None, _ts(7)),  # fresh key
        ],
    )
    sink.import_files(spark, ext)
    st = _state(spark, sink)
    assert st[("a", 0)] == ("user", "engine-tie")  # _seq=-1 loses the tie
    assert st[("a", 1)] == ("imp", "import-new")
    assert st[("a", 2)] == ("imp", "import-only")
    # a post-import engine event (newer ts) supersedes the imported row,
    # and a delete tombstones it
    sink.merge(
        _batch(
            spark,
            [
                ("U", "a", 1, "user", "engine-after", None, _ts(11), 1),
                ("D", "a", 2, None, None, None, _ts(12), 2),
            ],
        ),
        "post-0",
    )
    st = _state(spark, sink)
    assert st[("a", 1)] == ("user", "engine-after")
    assert ("a", 2) not in st


def test_import_validations(spark, tmp_path):
    sink = _seed(spark, tmp_path)
    # missing required columns
    no_key = _ext(
        spark, tmp_path,
        [("user", "x", _ts(1))], name="nokey",
        schema="role string, text string, ts timestamp",
    )
    with pytest.raises(ValueError, match="required column"):
        sink.import_files(spark, no_key)
    # ts must be a timestamp
    bad_ts = _ext(
        spark, tmp_path,
        [("k", 0, "2025-01-01")], name="badts",
        schema="conv_id string, turn_idx int, ts string",
    )
    with pytest.raises(TypeError, match="timestamp"):
        sink.import_files(spark, bad_ts)
    # engine-internal names are refused
    internal = _ext(
        spark, tmp_path,
        [("k", 0, _ts(1), 3)], name="internal",
        schema="conv_id string, turn_idx int, ts timestamp, _seq long",
    )
    with pytest.raises(ValueError, match="engine-internal"):
        sink.import_files(spark, internal)
    # a WIDER key type is refused (bucket hash is type-sensitive)
    wide_key = _ext(
        spark, tmp_path,
        [("k", 1, _ts(1))], name="widekey",
        schema="conv_id string, turn_idx long, ts timestamp",
    )
    with pytest.raises(TypeError, match="WIDER"):
        sink.import_files(spark, wide_key)
    # null keys are caught by the validate scan (and skippable)
    null_key = _ext(
        spark, tmp_path,
        [(None, 0, "user", "x", None, _ts(1))], name="nullkey",
    )
    with pytest.raises(ValueError, match="null key"):
        sink.import_files(spark, null_key)
    # the table's own files can never be re-imported
    own = sink._resolve_list(sink.manifest().get("deltas", {}).get("1", []))
    own = own or [
        f for fs in sink.manifest()["files"].values()
        for f in sink._resolve_list(fs)
    ]
    with pytest.raises(ValueError, match="own files"):
        sink.import_files(spark, own[:1])
    # double-import of a still-pending file is refused
    ok = _ext(spark, tmp_path, [("k", 0, "user", "x", None, _ts(1))], name="ok")
    sink.import_files(spark, ok)
    with pytest.raises(ValueError, match="already imported"):
        sink.import_files(spark, ok, batch_token="another-token")
    # nothing-to-import is loud
    with pytest.raises(FileNotFoundError):
        sink.import_files(spark, str(tmp_path / "nope"))


def test_import_refused_on_partial_tables(spark, tmp_path):
    sink = LocalSnapshotSink(str(tmp_path / "p"), num_buckets=2, merge_mode="partial")
    ext = _ext(spark, tmp_path, [("k", 0, "user", "x", None, _ts(1))])
    with pytest.raises(ValueError, match="partial"):
        sink.import_files(spark, ext)


def test_import_additive_schema_evolution(spark, tmp_path):
    sink = _seed(spark, tmp_path, n=6)
    ext = _ext(
        spark, tmp_path,
        [("z", 0, "user", "hola", None, _ts(50), "es")],
        schema=PAYLOAD + ", lang string",
    )
    sink.import_files(spark, ext)
    df = sink.read(spark)
    assert "lang" in df.columns
    rows = {(r["conv_id"], r["turn_idx"]): r["lang"] for r in df.collect()}
    assert rows[("z", 0)] == "es"
    assert rows[("c0", 0)] is None  # pre-evolution rows null-backfill


def test_import_flows_through_compaction_and_maintenance(spark, tmp_path):
    sink = _seed(spark, tmp_path, compact_every=10_000)
    ext = _ext(
        spark, tmp_path,
        [(f"y{i}", 0, "user", f"v{i}", None, _ts(60 + i)) for i in range(4)],
    )
    sink.import_files(spark, ext)
    before = _state(spark, sink)
    sink.compact(spark)
    assert _state(spark, sink) == before
    m = sink.manifest()
    assert not any(sink._resolve_list(v) for v in m.get("deltas", {}).values())
    # the fold localized every referenced byte into the table's own dir...
    refs = [
        f for mp in (m["files"], m.get("deltas", {}))
        for fs in mp.values() for f in sink._resolve_list(fs)
    ]
    assert all(f.startswith(str(tmp_path / "t")) for f in refs)
    # ...and maintenance never deletes the user-owned source files
    sink.expire_snapshots(keep_last=1, min_age_seconds=0)
    sink.vacuum_orphans(min_age_seconds=0)
    ext_files = [fn for fn in os.listdir(ext) if fn.endswith(".parquet")]
    assert ext_files, "external source files must survive table maintenance"
    check = sink.fsck(deep=True)
    assert check["ok"], check["errors"]
    assert _state(spark, sink) == before


def test_import_lands_in_change_feeds(spark, tmp_path):
    sink = _seed(spark, tmp_path, n=5)
    pre = sink.manifest()["snapshot_id"]
    ext = _ext(spark, tmp_path, [("w", 9, "user", "cdc", None, _ts(70))])
    sink.import_files(spark, ext)
    raw = sink.read_changes(spark, pre).collect()
    assert {(r["conv_id"], r["turn_idx"]) for r in raw} == {("w", 9)}
    typed = sink.change_feed(spark, pre).collect()
    assert [(r["conv_id"], r["_change_type"]) for r in typed] == [("w", "insert")]


def test_import_incremental_drop_folder(spark, tmp_path):
    sink = _seed(spark, tmp_path, n=5)
    drop = tmp_path / "drop"
    drop.mkdir()
    _ext(spark, tmp_path, [("d1", 0, "user", "one", None, _ts(1))],
         name="drop/a")
    r1 = sink.import_files(spark, str(drop), incremental=True)
    assert r1["imported_files"] == 1 and r1["files_skipped"] == 0
    # quiet poll: nothing new -> no commit at all
    head = sink.manifest()["snapshot_id"]
    r2 = sink.import_files(spark, str(drop), incremental=True)
    assert r2["skipped"] is True and r2["imported_files"] == 0
    assert sink.manifest()["snapshot_id"] == head
    # a new file lands; the next poll adopts ONLY it
    _ext(spark, tmp_path, [("d2", 0, "user", "two", None, _ts(2))],
         name="drop/b")
    r3 = sink.import_files(spark, str(drop), incremental=True)
    assert r3["imported_files"] == 1 and r3["files_skipped"] >= 1
    st = _state(spark, sink)
    assert st[("d1", 0)] == ("user", "one") and st[("d2", 0)] == ("user", "two")
    # ...even after compaction localized the earlier adoption (the
    # EVER-imported set, not the pending flat list, drives the skip)
    sink.compact(spark)
    _ext(spark, tmp_path, [("d3", 0, "user", "three", None, _ts(3))],
         name="drop/c")
    r4 = sink.import_files(spark, str(drop), incremental=True)
    assert r4["imported_files"] == 1
    assert _state(spark, sink)[("d3", 0)] == ("user", "three")


def test_import_collect_stats_prunes_lookups(spark, tmp_path):
    sink = _seed(spark, tmp_path, n=5)
    # two disjoint-key-range foreign files
    a = _ext(spark, tmp_path, [(f"aa{i}", 0, "user", "a", None, _ts(i)) for i in range(3)], name="exta")
    b = _ext(spark, tmp_path, [(f"zz{i}", 0, "user", "z", None, _ts(i)) for i in range(3)], name="extb")
    sink.import_files(spark, [a, b], collect_stats=True)
    ks = sink.key_stats()
    flat = sink._resolve_list(sink.manifest().get("deltas", {}).get("*", []))
    assert set(flat) <= set(ks), "every imported file gets a key range"
    m = sink.manifest()
    pruned = sink._prune_by_key_stats(m, flat, "aa1")
    assert len(pruned) == 1 and pruned[0].startswith(a)
    # and the pruned read still answers correctly
    row = sink.lookup(spark, "zz2").collect()
    assert [r["text"] for r in row] == ["z"]


def test_import_commit_failure_reclaims_claim(spark, tmp_path, monkeypatch):
    """A failure between the sid claim and the manifest swap must not
    leave a live-pid-shielded claim dir behind (vacuum could never age
    it out while this driver lives) -- same contract as merge()."""
    sink = _seed(spark, tmp_path, n=5)
    ext = _ext(spark, tmp_path, [("k", 0, "user", "x", None, _ts(1))])
    head = sink.manifest()["snapshot_id"]

    def boom(manifest):
        raise RuntimeError("injected commit failure")

    monkeypatch.setattr(sink, "_commit", boom)
    with pytest.raises(RuntimeError, match="injected"):
        sink.import_files(spark, ext)
    monkeypatch.undo()
    data_root = tmp_path / "t" / "data"
    referenced = [
        f
        for mp in (sink.manifest()["files"], sink.manifest().get("deltas", {}))
        for fs in mp.values()
        for f in sink._resolve_list(fs)
    ]
    leftover = [
        d for d in os.listdir(data_root)
        if not any(f.startswith(str(data_root / d) + os.sep) for f in referenced)
    ]
    assert leftover == [], f"orphan claim dirs: {leftover}"
    assert sink.manifest()["snapshot_id"] == head  # nothing committed
    # and the table still imports fine afterwards
    assert sink.import_files(spark, ext)["skipped"] is False


def test_import_is_covered_by_auto_maintenance(spark, tmp_path):
    """A many-file adoption must surface in table_report (read
    amplification) and be localized by the one-button auto_maintain --
    imports join the table's normal maintenance lifecycle, they are not
    a parallel universe of files."""
    sink = _seed(spark, tmp_path, n=5, compact_every=10_000)
    drop = tmp_path / "many"
    drop.mkdir()
    for i in range(17):
        _ext(spark, tmp_path, [(f"mf{i}", 0, "user", f"v{i}", None, _ts(i))],
             name=f"many/f{i}")
    sink.import_files(spark, str(drop), incremental=True)
    rep = sink.table_report()
    assert any(
        r["action"] in ("minor_compact", "compact")
        for r in rep["recommendations"]
    ), rep["recommendations"]
    before = _state(spark, sink)
    sink.auto_maintain(spark)
    assert _state(spark, sink) == before
    m = sink.manifest()
    assert not m.get("deltas", {}).get("*"), "flat imports were localized"


def test_import_recipe_mode(spark, tmp_path):
    """`run: {mode: import}` — the declarative zero-copy adoption; a
    recipe with no source section is legal only for this mode, and
    re-running an incremental recipe is the drop-folder poll."""
    from fetchez_spark.recipe import Recipe

    sink = _seed(spark, tmp_path, n=5)
    ext = _ext(spark, tmp_path, [("rc", 0, "user", "via-recipe", None, _ts(90))])
    cfg = {
        "project": "import-test",
        "sink": {"name": "local_snapshot", "args": {"table_dir": str(tmp_path / "t")}},
        "run": {"mode": "import", "paths": [ext], "incremental": True},
    }
    out = Recipe(cfg, base_dir=str(tmp_path)).run(spark)
    assert out["mode"] == "import" and out["imported_files"] == 1
    assert _state(spark, sink)[("rc", 0)] == ("user", "via-recipe")
    again = Recipe(cfg, base_dir=str(tmp_path)).run(spark)
    assert again["skipped"] is True and again["imported_files"] == 0
    # non-import recipes still demand a source section
    bad = {
        "sink": {"name": "local_snapshot", "args": {"table_dir": str(tmp_path / "t")}},
        "run": {"mode": "replay"},
    }
    with pytest.raises(KeyError, match="source"):
        Recipe(bad, base_dir=str(tmp_path)).run(spark)


def test_import_cli_round_trip(spark, tmp_path, capsys):
    import json

    from fetchez_spark.cli import main

    sink = _seed(spark, tmp_path, n=5)
    ext = _ext(spark, tmp_path, [("cli", 0, "user", "via-cli", None, _ts(80))])
    rc = main(["import", str(tmp_path / "t"), ext, "--cores", "4"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["skipped"] is False and out["imported_files"] == 1
    assert _state(spark, sink)[("cli", 0)] == ("user", "via-cli")
