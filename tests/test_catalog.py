"""Multi-table catalog: consistent pinned reads + atomic multi-table publish.

The catalog is the Nessie-shaped layer over single-table snapshots: a
versioned name→(dir, snapshot_id) map with one atomic VERSION flip per
commit, table tags protecting every pin from table-side expiry, and
catalog-grain time travel.
"""
from __future__ import annotations

import datetime as dt
import json
import os

import pytest

from fetchez_spark.catalog import TableCatalog
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

UTC = dt.timezone.utc
SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, op string, seq long"
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _ts(h: int) -> dt.datetime:
    return dt.datetime(2025, 1, 1, h, tzinfo=UTC)


def _mk_table(spark, path: str, text: str, n: int = 2) -> LocalSnapshotSink:
    sink = LocalSnapshotSink(path, num_buckets=2, compact_every=10**9)
    sink.merge(
        _batch(
            spark,
            [(f"c{i}", 0, "user", text, None, _ts(1), "insert", i) for i in range(n)],
        ),
        f"{text}-b0",
    )
    return sink


def test_register_snapshot_and_pinned_reads(spark, tmp_path):
    """A catalog version pins every table; later table commits are
    invisible at that version and picked up by the next snapshot()."""
    a = _mk_table(spark, str(tmp_path / "a"), "a-v1")
    b = _mk_table(spark, str(tmp_path / "b"), "b-v1")
    cat = TableCatalog(str(tmp_path / "cat"))
    cat.register("convs", a.table_dir)
    cat.register("docs", b.table_dir)
    v = cat.snapshot(note="train-run-1")["version"]

    # table A moves on; the pinned catalog version does not
    a.merge(
        _batch(spark, [("c0", 0, "user", "a-v2", None, _ts(2), "update", 99)]),
        "a-b1",
    )
    assert cat.read(spark, "convs", version=v).filter(
        "text = 'a-v2'"
    ).count() == 0
    assert LocalSnapshotSink(a.table_dir).read(spark).filter(
        "text = 'a-v2'"
    ).count() == 1

    v2 = cat.snapshot(note="train-run-2")["version"]
    assert v2 == v + 1
    assert cat.read(spark, "convs", version=v2).filter(
        "text = 'a-v2'"
    ).count() == 1
    # current read defaults to the newest version
    assert cat.read(spark, "docs").count() == 2
    # history lists newest first with notes
    vs = cat.versions()
    assert [x["note"] for x in vs[:2]] == ["train-run-2", "train-run-1"]


def test_atomic_multitable_publish_via_branch_pins(spark, tmp_path):
    """Stage two tables on WAP branches, publish BOTH in one catalog
    commit: catalog readers see the pair flip together while each
    table's main stays unpublished."""
    a = _mk_table(spark, str(tmp_path / "a"), "a-main")
    b = _mk_table(spark, str(tmp_path / "b"), "b-main")
    cat = TableCatalog(str(tmp_path / "cat"))
    cat.register("a", a.table_dir)
    cat.register("b", b.table_dir)
    v_before = cat.snapshot(note="before")["version"]

    for sink, tag in ((a, "a"), (b, "b")):
        sink.create_branch("audit")
        staged = LocalSnapshotSink(sink.table_dir, branch="audit")
        staged.merge(
            _batch(
                spark,
                [("cX", 0, "user", f"{tag}-staged", None, _ts(3), "insert", 7)],
            ),
            f"{tag}-staged-b0",
        )

    v_pub = cat.snapshot(
        note="publish both", pins={"a": "audit", "b": "audit"}
    )["version"]
    for name in ("a", "b"):
        assert cat.read(spark, name, version=v_pub).filter(
            f"text = '{name}-staged'"
        ).count() == 1
        assert cat.read(spark, name, version=v_before).filter(
            f"text = '{name}-staged'"
        ).count() == 0
    # each table's MAIN is untouched — the catalog was the publish point
    assert LocalSnapshotSink(a.table_dir).read(spark).filter(
        "text = 'a-staged'"
    ).count() == 0


def test_pins_survive_table_expiry_until_catalog_releases(spark, tmp_path):
    """Aggressive table expiry retains catalog-pinned snapshots (tag
    ref-retention); expiring the catalog version releases the tag and the
    next table expiry reclaims the history."""
    a = _mk_table(spark, str(tmp_path / "a"), "v1")
    cat = TableCatalog(str(tmp_path / "cat"))
    cat.register("a", a.table_dir)
    v1 = cat.snapshot()["version"]
    pinned_sid = cat.manifest(v1)["tables"]["a"]["snapshot_id"]

    a.merge(
        _batch(spark, [("c0", 0, "user", "v2", None, _ts(2), "update", 50)]),
        "a-b1",
    )
    v2 = cat.snapshot()["version"]
    a.expire_snapshots(keep_last=1, min_age_seconds=0)
    # the v1 pin is still readable through the catalog
    assert cat.read(spark, "a", version=v1).filter("text = 'v1'").count() == 2
    assert cat.read(spark, "a", version=v2).filter("text = 'v2'").count() == 1

    out = cat.expire(keep_last=1)
    assert v1 in out["dropped_versions"]
    assert any(f"cat-{cat.catalog_id}-v{v1}" in t for t in out["released_tags"])
    with pytest.raises(ValueError, match="does not exist"):
        cat.manifest(v1)
    a.expire_snapshots(keep_last=1, min_age_seconds=0)
    assert pinned_sid not in LocalSnapshotSink(a.table_dir).snapshots()
    # the kept version still reads fine
    assert cat.read(spark, "a", version=v2).count() == 2


def test_catalog_as_of_and_loud_errors(spark, tmp_path):
    a = _mk_table(spark, str(tmp_path / "a"), "x")
    cat = TableCatalog(str(tmp_path / "cat"))
    cat.register("a", a.table_dir)
    v1 = cat.snapshot()["version"]
    t_between = cat.manifest(v1)["committed_at"] + 0.0001
    v2 = cat.snapshot()["version"]
    assert cat.as_of(t_between) == v1
    assert cat.as_of(cat.manifest(v2)["committed_at"] + 1) == v2
    with pytest.raises(ValueError, match="no retained catalog version"):
        cat.as_of(0.5)
    with pytest.raises(ValueError, match="already registered"):
        cat.register("a", a.table_dir)
    with pytest.raises(ValueError, match="not an engine table"):
        cat.register("b", str(tmp_path / "nope"))
    with pytest.raises(ValueError, match="unregistered tables"):
        cat.snapshot(pins={"ghost": "main"})
    with pytest.raises(ValueError, match="no table"):
        cat.read(spark, "ghost")
    cat.unregister("a")
    # older versions still resolve the name; the new one does not
    assert cat.read(spark, "a", version=v1).count() == 2
    with pytest.raises(ValueError, match="no table"):
        cat.read(spark, "a")


def test_crash_leftover_tag_is_replaced(spark, tmp_path):
    """A tag left by a crash between tagging and the catalog commit (its
    version never published) is replaced, not fatal."""
    a = _mk_table(spark, str(tmp_path / "a"), "v1")
    cat = TableCatalog(str(tmp_path / "cat"))
    cat.register("a", a.table_dir)
    cur = cat.manifest()
    old_sid = cur["tables"]["a"]["snapshot_id"]
    a.merge(
        _batch(spark, [("c0", 0, "user", "v2", None, _ts(2), "update", 9)]),
        "a-b1",
    )
    # simulate the crash leftover: the NEXT version's tag name, stale sid
    leftover = f"cat-{cat.catalog_id}-v{cur['version'] + 1}"
    a.create_tag(leftover, old_sid)
    v = cat.snapshot()["version"]
    assert v == cur["version"] + 1
    new_sid = cat.manifest(v)["tables"]["a"]["snapshot_id"]
    assert new_sid != old_sid
    assert LocalSnapshotSink(a.table_dir).tags()[leftover] == new_sid


def test_cli_catalog_roundtrip(spark, tmp_path, capsys):
    from fetchez_spark.cli import main

    a = _mk_table(spark, str(tmp_path / "a"), "a1")
    b = _mk_table(spark, str(tmp_path / "b"), "b1")
    cdir = str(tmp_path / "cat")
    assert main(["catalog", cdir, "--register", f"convs={a.table_dir}",
                 "--register", f"docs={b.table_dir}"]) == 0
    json.loads(capsys.readouterr().out)
    assert main(["catalog", cdir, "--snapshot", "--note", "run-1"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert set(out["tables"]) == {"convs", "docs"}
    assert main(["catalog", cdir, "--list"]) == 0
    vs = json.loads(capsys.readouterr().out)["versions"]
    assert vs[0]["note"] == "run-1" and len(vs) >= 3
    assert main(["catalog", cdir, "--show", str(out["version"])]) == 0
    shown = json.loads(capsys.readouterr().out)["manifest"]
    assert shown["tables"]["convs"]["snapshot_id"] == out["tables"]["convs"]
    # bad specs fail loudly
    assert main(["catalog", cdir, "--register", "broken"]) == 1
    capsys.readouterr()
    assert main(["catalog", cdir, "--snapshot", "--pin", "convs"]) == 1


def test_carried_forward_pins_stay_protected_across_catalog_expire(
    spark, tmp_path
):
    """Every catalog commit tags ALL its pins — including ones carried
    forward unchanged — so expiring an OLD catalog version never strips
    protection from a snapshot a NEWER version still references."""
    a = _mk_table(spark, str(tmp_path / "a"), "a-v1")
    cat = TableCatalog(str(tmp_path / "cat"))
    cat.register("a", a.table_dir)          # v1: pins a@s1
    s1 = cat.manifest()["tables"]["a"]["snapshot_id"]
    b = _mk_table(spark, str(tmp_path / "b"), "b-v1")
    cat.register("b", b.table_dir)          # v2: carries a@s1 forward
    cat.expire(keep_last=1)                 # drops v1 AND v1's tags
    a.merge(
        _batch(spark, [("c0", 0, "user", "a-v2", None, _ts(2), "update", 9)]),
        "a-b1",
    )
    a.expire_snapshots(keep_last=1, min_age_seconds=0)
    # s1 must survive the table expiry: the CURRENT catalog version (v2)
    # still pins it, and v2 carries its own tag for it
    assert s1 in LocalSnapshotSink(a.table_dir).snapshots()
    assert cat.read(spark, "a").filter("text = 'a-v1'").count() == 2


def test_single_table_pin_moves_only_that_table(spark, tmp_path):
    a = _mk_table(spark, str(tmp_path / "a"), "a1")
    b = _mk_table(spark, str(tmp_path / "b"), "b1")
    cat = TableCatalog(str(tmp_path / "cat"))
    cat.register("a", a.table_dir)
    cat.register("b", b.table_dir)
    b_pin = cat.manifest()["tables"]["b"]["snapshot_id"]
    for s, txt in ((a, "a2"), (b, "b2")):
        s.merge(
            _batch(spark, [("c0", 0, "user", txt, None, _ts(2), "update", 9)]),
            f"{txt}-b1",
        )
    m = cat.pin("a", note="after-run")
    assert m["tables"]["b"]["snapshot_id"] == b_pin  # untouched
    assert cat.read(spark, "a").filter("text = 'a2'").count() == 1
    assert cat.read(spark, "b").filter("text = 'b2'").count() == 0
    with pytest.raises(ValueError, match="no table"):
        cat.pin("ghost")


def test_recipe_catalog_pin_publishes_each_run(spark, tmp_path):
    """A recipe with a ``catalog:`` key registers its output table on the
    first run and re-pins it on every later run — each successful run IS
    a reproducible catalog version."""
    from fetchez_spark.changegen import ChangeLogSpec, write_change_log
    from fetchez_spark.recipe import Recipe

    write_change_log(
        ChangeLogSpec(num_events=400, num_convs=20, seed=3),
        str(tmp_path / "log"),
        num_chunks=2,
    )
    cfg = {
        "project": "nightly",
        "source": {
            "name": "parquet_log",
            "args": {"log_dir": str(tmp_path / "log"), "batch_files": 1},
        },
        "sink": {
            "name": "local_snapshot",
            "args": {"table_dir": str(tmp_path / "table"), "num_buckets": 2},
        },
        "run": {"mode": "replay"},
        "catalog": {"dir": str(tmp_path / "cat"), "note": "nightly run"},
    }
    r1 = Recipe(cfg).run(spark=spark)
    assert r1["catalog"]["name"] == "nightly"
    cat = TableCatalog(str(tmp_path / "cat"))
    pinned = cat.manifest(r1["catalog"]["version"])["tables"]["nightly"]
    assert pinned["snapshot_id"] == LocalSnapshotSink(
        str(tmp_path / "table")
    ).current_snapshot_id
    r2 = Recipe(cfg).run(spark=spark)  # replay is idempotent; still re-pins
    assert r2["catalog"]["version"] > r1["catalog"]["version"]
    # same name at a DIFFERENT dir is a loud error
    cfg_other = {
        **cfg,
        "sink": {
            "name": "local_snapshot",
            "args": {"table_dir": str(tmp_path / "other"), "num_buckets": 2},
        },
    }
    with pytest.raises(ValueError, match="registered at"):
        Recipe(cfg_other).run(spark=spark)


# ------------------------------------------------- self-review regressions
def test_vanished_table_dir_refuses_to_pin(spark, tmp_path):
    """A registered table whose dir vanished must FAIL a catalog op, not
    silently bootstrap an empty table and pin its 0-row root."""
    import shutil

    a = _mk_table(spark, str(tmp_path / "a"), "x")
    cat = TableCatalog(str(tmp_path / "cat"))
    cat.register("a", a.table_dir)
    shutil.rmtree(a.table_dir)
    with pytest.raises(ValueError, match="refusing to pin"):
        cat.snapshot()
    with pytest.raises(ValueError, match="refusing to pin"):
        cat.pin("a")
    assert not os.path.exists(a.table_dir)  # nothing resurrected
    # expire skips the vanished dir without recreating it
    cat.expire(keep_last=1)
    assert not os.path.exists(a.table_dir)


def test_cli_pin_without_snapshot_re_pins_one_table(spark, tmp_path, capsys):
    from fetchez_spark.cli import main

    a = _mk_table(spark, str(tmp_path / "a"), "a1")
    b = _mk_table(spark, str(tmp_path / "b"), "b1")
    cdir = str(tmp_path / "cat")
    cat = TableCatalog(cdir)
    cat.register("a", a.table_dir)
    cat.register("b", b.table_dir)
    b_pin = cat.manifest()["tables"]["b"]["snapshot_id"]
    a.merge(
        _batch(spark, [("c0", 0, "user", "a2", None, _ts(2), "update", 9)]),
        "a-b1",
    )
    assert main(["catalog", cdir, "--pin", "a"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["pinned"]["a"] == LocalSnapshotSink(a.table_dir).current_snapshot_id
    m = cat.manifest()
    assert m["tables"]["a"]["snapshot_id"] == out["pinned"]["a"]
    assert m["tables"]["b"]["snapshot_id"] == b_pin  # carried forward


def test_recipe_branch_sink_pins_the_branch_head(spark, tmp_path):
    """A recipe whose sink writes to a WAP branch must pin the BRANCH
    head (the run's actual output), not the unpublished main."""
    from fetchez_spark.changegen import ChangeLogSpec, write_change_log
    from fetchez_spark.recipe import Recipe

    write_change_log(
        ChangeLogSpec(num_events=300, num_convs=15, seed=4),
        str(tmp_path / "log"),
        num_chunks=1,
    )
    cfg = {
        "project": "staged",
        "source": {"name": "parquet_log",
                   "args": {"log_dir": str(tmp_path / "log")}},
        "sink": {"name": "local_snapshot",
                 "args": {"table_dir": str(tmp_path / "table"),
                          "num_buckets": 2, "branch": "audit"}},
        "run": {"mode": "replay"},
        "catalog": {"dir": str(tmp_path / "cat")},
    }
    r = Recipe(cfg).run(spark=spark)
    cat = TableCatalog(str(tmp_path / "cat"))
    # the catalog read sees the staged data; the table's main does not
    assert cat.read(spark, "staged").count() > 0
    assert LocalSnapshotSink(str(tmp_path / "table")).read(spark).count() == 0
    assert r["catalog"]["version"] == cat.manifest()["version"]


def test_recipe_catalog_config_fails_before_the_run(spark, tmp_path):
    """A catalog config typo must abort BEFORE replay starts, not after
    hours of work."""
    from fetchez_spark.changegen import ChangeLogSpec, write_change_log
    from fetchez_spark.recipe import Recipe

    write_change_log(
        ChangeLogSpec(num_events=300, num_convs=15, seed=4),
        str(tmp_path / "log"),
        num_chunks=1,
    )
    cfg = {
        "project": "oops",
        "source": {"name": "parquet_log",
                   "args": {"log_dir": str(tmp_path / "log")}},
        "sink": {"name": "local_snapshot",
                 "args": {"table_dir": str(tmp_path / "table"),
                          "num_buckets": 2}},
        "run": {"mode": "replay"},
        "catalog": {"note": "missing dir key"},
    }
    with pytest.raises(ValueError, match="'dir' key"):
        Recipe(cfg).run(spark=spark)
    # nothing replayed: the failure happened before the first batch
    assert LocalSnapshotSink(str(tmp_path / "table")).manifest()[
        "committed_batches"
    ] == {}


def test_catalog_versions_stay_readable_under_writer_and_expiry_races(
    spark, tmp_path
):
    """Catalog snapshots racing a live writer AND aggressive table expiry:
    every retained catalog version must keep resolving to a live, readable
    snapshot (exercises _pin_table's head-expired retry and create_tag's
    serialization with expire's keep-set listing)."""
    import threading

    a = _mk_table(spark, str(tmp_path / "a"), "seed")
    cat = TableCatalog(str(tmp_path / "cat"))
    cat.register("a", a.table_dir)
    stop = threading.Event()
    errs: list[BaseException] = []

    def writer():
        w = LocalSnapshotSink(a.table_dir)
        for i in range(25):
            if stop.is_set():
                break
            try:
                w.merge(
                    _batch(
                        spark,
                        [(f"w{i}", 0, "user", f"t{i}", None, _ts(1 + i % 20),
                          "insert", i)],
                    ),
                    f"race-b{i}",
                )
            except BaseException as e:  # surfaced below
                errs.append(e)
                break

    def expirer():
        m = LocalSnapshotSink(a.table_dir)
        while not stop.is_set():
            try:
                m.expire_snapshots(keep_last=1, min_age_seconds=0)
            except BaseException as e:
                errs.append(e)
                break

    threads = [threading.Thread(target=writer), threading.Thread(target=expirer)]
    for t in threads:
        t.start()
    versions = []
    try:
        for _ in range(8):
            versions.append(cat.snapshot()["version"])
    finally:
        stop.set()
        for t in threads:
            t.join(120)
    assert not errs, errs
    # every retained catalog version resolves and reads
    for v in versions:
        m = cat.manifest(v)
        sid = m["tables"]["a"]["snapshot_id"]
        sink = LocalSnapshotSink(a.table_dir)
        assert sid in sink.snapshots(), f"v{v} pin {sid} was expired away"
        assert cat.read(spark, "a", version=v).count() >= 1
