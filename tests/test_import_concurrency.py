"""Concurrency contracts of zero-copy import: racing incremental pollers
adopt every file EXACTLY once (the under-lock re-filter makes the loser a
no-op, never a duplicate), content-addressed tokens collapse non-
incremental racers on the same file set, and imports commute with a live
streaming replay into the same table (both are flat-delta appends under
the commit lock)."""

from __future__ import annotations

import datetime as dt
import threading

from pyspark.sql import functions as F

from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

UTC = dt.timezone.utc


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2025, 4, 1, tzinfo=UTC) + dt.timedelta(seconds=s)


def _ext(spark, path, rows):
    spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    ).coalesce(1).write.parquet(str(path))


def test_racing_incremental_pollers_adopt_exactly_once(spark, tmp_path):
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    sink.merge(
        spark.createDataFrame(
            [("U", "seed", 0, "user", "s", None, _ts(0), 0)],
            "op string, conv_id string, turn_idx int, role string, "
            "text string, tool string, ts timestamp, seq long",
        ),
        "seed-0",
    )
    drop = tmp_path / "drop"
    for i in range(6):
        _ext(spark, drop / f"f{i}", [(f"k{i}", 0, "user", f"v{i}", None, _ts(i))])

    results: list[dict] = []
    errs: list[BaseException] = []

    def poll():
        # each racer gets its own sink instance (separate manifest cache),
        # same table dir -- the cross-process shape
        s = LocalSnapshotSink(str(tmp_path / "t"))
        try:
            results.append(s.import_files(spark, str(drop), incremental=True))
        except BaseException as e:  # noqa: BLE001 - collected for assert
            errs.append(e)

    threads = [threading.Thread(target=poll) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    assert sum(r["imported_files"] for r in results) == 6, results
    rows = {r["conv_id"]: r["text"] for r in sink.read(spark).collect()}
    assert {f"k{i}": f"v{i}" for i in range(6)}.items() <= rows.items()
    assert sink.read(spark).count() == 7  # seed + 6, no double-adoption


def test_nonincremental_racers_collapse_on_content_token(spark, tmp_path):
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    sink.merge(
        spark.createDataFrame(
            [("U", "seed", 0, "user", "s", None, _ts(0), 0)],
            "op string, conv_id string, turn_idx int, role string, "
            "text string, tool string, ts timestamp, seq long",
        ),
        "seed-0",
    )
    drop = tmp_path / "one"
    _ext(spark, drop, [("k", 0, "user", "v", None, _ts(1))])
    results: list[dict] = []
    errs: list[BaseException] = []

    def go():
        s = LocalSnapshotSink(str(tmp_path / "t"))
        try:
            results.append(s.import_files(spark, str(drop)))
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=go) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    assert sum(1 for r in results if not r["skipped"]) == 1
    assert sum(1 for r in results if r["skipped"]) == 2
    assert sink.read(spark).count() == 2


def test_import_commutes_with_concurrent_merges(spark, tmp_path):
    """Interleave merge commits and imports from two threads: both are
    commit-lock-serialized flat/clustered delta appends, so every commit
    lands and the final LWW state is exactly the union's reduction."""
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4, compact_every=4)
    errs: list[BaseException] = []

    def merger():
        s = LocalSnapshotSink(str(tmp_path / "t"))
        try:
            for i in range(5):
                s.merge(
                    spark.createDataFrame(
                        [("U", f"m{i}", 0, "user", f"merged-{i}", None, _ts(100 + i), i)],
                        "op string, conv_id string, turn_idx int, role string, "
                        "text string, tool string, ts timestamp, seq long",
                    ),
                    f"stream-{i}",
                )
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    def importer():
        s = LocalSnapshotSink(str(tmp_path / "t"))
        try:
            for i in range(5):
                d = tmp_path / f"imp{i}"
                _ext(spark, d, [(f"i{i}", 0, "user", f"imported-{i}", None, _ts(200 + i))])
                s.import_files(spark, str(d))
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    t1, t2 = threading.Thread(target=merger), threading.Thread(target=importer)
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs
    rows = {r["conv_id"]: r["text"] for r in sink.read(spark).collect()}
    expect = {f"m{i}": f"merged-{i}" for i in range(5)}
    expect.update({f"i{i}": f"imported-{i}" for i in range(5)})
    assert rows == expect
    assert sink.fsck(deep=True)["ok"]
