"""Sorted compaction + per-file key-range stats + stats-pruned lookups.

``sort_on_compact`` / ``compact(sort=True)`` is the Iceberg sort-order
analog: major compaction range-clusters each bucket's output on the
table key (ONE range Exchange -- RangePartitioning on the grouping
columns satisfies the grouped reduction), records per-file min/max of
the leading key in the manifest, and point lookups prune FILES within
the bucket, not just buckets.  Files are immutable, so carried-forward
stats can never be wrong -- only absent.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from fetchez_spark.schema import CHANGE_EVENT_SCHEMA
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

T0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def ev(op, conv, turn, text, ts_s, seq, part=0):
    return (op, conv, turn, "user", text, None, T0 + dt.timedelta(seconds=ts_s), seq, part)


def _df(spark, rows, schema=CHANGE_EVENT_SCHEMA):
    return spark.createDataFrame(rows, schema)


def _mk_sorted_table(spark, tmp_path, n_keys=120, per_key=2):
    sink = LocalSnapshotSink(
        str(tmp_path / "t"),
        num_buckets=2,
        compact_every=10**9,
        sort_on_compact=True,
    )
    rows = [
        ev("U", f"c{i:04d}", t, f"v{i}-{t}", i * 10 + t, i * per_key + t)
        for i in range(n_keys)
        for t in range(per_key)
    ]
    half = len(rows) // 2
    sink.merge(_df(spark, rows[:half]), "b1")
    sink.merge(_df(spark, rows[half:]), "b2")
    return sink


def test_sorted_compaction_state_unchanged_and_stats_disjoint(spark, tmp_path):
    sink = _mk_sorted_table(spark, tmp_path)
    before = sink.read(spark).orderBy("conv_id", "turn_idx").collect()
    # small target -> several range-chunk files per bucket
    sink.compact(spark, target_file_bytes=4096)
    after = sink.read(spark).orderBy("conv_id", "turn_idx").collect()
    assert after == before

    stats = sink.key_stats()
    files = sink.file_lists()
    assert stats, "sorted compaction must record key stats"
    # every base file has stats; within a bucket the ranges are DISJOINT
    for b, fs in files.items():
        assert all(f in stats for f in fs)
        ranges = sorted(stats[f] for f in fs)
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2, f"bucket {b} overlapping file ranges"
    # at least one bucket actually split into multiple files
    assert any(len(fs) > 1 for fs in files.values())


def test_sorted_files_are_key_ordered_within(spark, tmp_path):
    sink = _mk_sorted_table(spark, tmp_path)
    sink.compact(spark, target_file_bytes=4096)
    f = next(
        f for fs in sink.file_lists().values() for f in fs
    )
    pdf = pd.read_parquet(f, columns=["conv_id", "turn_idx"])
    assert len(pdf) > 1
    keys = list(zip(pdf["conv_id"], pdf["turn_idx"]))
    assert keys == sorted(keys), "rows inside a sorted file must be key-ordered"


def test_lookup_prunes_files_and_stays_correct(spark, tmp_path):
    sink = _mk_sorted_table(spark, tmp_path)
    sink.compact(spark, target_file_bytes=4096)
    m = sink.manifest()
    # pick a key from a multi-file bucket and show the pruner drops files
    files = sink.file_lists()
    b, fs = next((b, fs) for b, fs in files.items() if len(fs) > 1)
    key = "c0037"
    pruned = sink._prune_by_key_stats(m, fs, key)
    assert 0 < len(pruned) < len(fs), "stats must skip at least one file"
    got = sink.lookup(spark, key).collect()
    assert len(got) == 2 and all(r["conv_id"] == key for r in got)
    # and equals the unpruned read
    full = sink.read(spark).filter(F.col("conv_id") == key).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, full))


def test_stats_survive_merges_and_deltas_are_never_pruned(spark, tmp_path):
    sink = _mk_sorted_table(spark, tmp_path)
    sink.compact(spark, target_file_bytes=4096)
    assert sink.key_stats()
    # a post-compact MoR merge updates a key; its delta file has no stats
    # and must reach the lookup scan
    sink.merge(_df(spark, [ev("U", "c0037", 0, "UPDATED", 99999, 99999)]), "b3")
    assert sink.key_stats(), "stats must ride along through merge commits"
    got = {(r["turn_idx"]): r["text"] for r in sink.lookup(spark, "c0037").collect()}
    assert got[0] == "UPDATED" and got[1] == "v37-1"


def test_sorted_compaction_is_single_exchange(spark, tmp_path):
    """The sorted variant must still move the table ONCE: a single RANGE
    Exchange; the grouped reduction and the local sort add no second
    shuffle (RangePartitioning on the grouping columns satisfies
    ClusteredDistribution)."""
    from pyspark.sql import types as T

    from fetchez_spark.schema import INTERNAL_SEQ
    from fetchez_spark.sinks.local_snapshot import _BUCKET

    sink = _mk_sorted_table(spark, tmp_path)
    m = sink.manifest()
    schema = T.StructType.fromJson(m["schema"])
    files = [f for fs in sink.delta_lists().values() for f in fs]
    df = sink._read_files(spark, files, schema).withColumn(
        _BUCKET, sink._bucket_expr(m["num_buckets"])
    )
    aligned = sink._align(df, schema)
    order = ["ts", INTERNAL_SEQ]
    others = [f.name for f in schema.fields if f.name not in order]
    big = F.struct(*[F.col(c) for c in order], *[F.col(c) for c in others])
    key_cols = [F.col(k) for k in sink.key]
    won = (
        aligned.repartitionByRange(8, F.col(_BUCKET), *key_cols)
        .groupBy(F.col(_BUCKET), *key_cols)
        .agg(F.max(big).alias("_w"))
        .sortWithinPartitions(F.col(_BUCKET), *key_cols)
    )
    plan = won._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange rangepartitioning") == 1, plan[:2000]
    assert plan.count("Exchange hashpartitioning") == 0, plan[:2000]


def test_key_stats_blob_survives_expire(spark, tmp_path):
    sink = _mk_sorted_table(spark, tmp_path, n_keys=400)
    # small target => >16 files => stats pack as a content-addressed blob
    sink.compact(spark, target_file_bytes=1024)
    m = sink.manifest()
    assert isinstance(m.get("key_stats"), str) and m["key_stats"].startswith("ref:"), (
        "large stats maps must pack as a blob"
    )
    sink.merge(_df(spark, [ev("U", "c0001", 0, "post", 88888, 88888)]), "b4")
    sink.expire_snapshots(keep_last=1, min_age_seconds=0)
    stats = sink.key_stats()
    assert stats, "expire must retain the key_stats blob of kept manifests"
    got = sink.lookup(spark, "c0001").collect()
    assert any(r["text"] == "post" for r in got)


def test_files_metadata_table(spark, tmp_path):
    # the $files analog: one record per referenced file, deltas before
    # compaction, base files with key ranges after sorted compaction,
    # AS-OF any retained snapshot -- all driver-side, no Spark job
    import os

    from fetchez_spark import api

    sink = _mk_sorted_table(spark, tmp_path)
    pre_sid = sink.current_snapshot_id
    pre = sink.files()
    assert pre and all(r["kind"] in ("base", "delta", "flat") for r in pre)
    assert any(r["kind"] != "base" for r in pre)  # uncompacted deltas visible
    assert all(r["bytes"] and r["bytes"] > 0 for r in pre)
    assert not any(r["imported"] for r in pre)

    sink.compact(spark, target_file_bytes=4096)
    post = sink.files()
    assert all(r["kind"] == "base" for r in post)
    assert all(r["bucket"] in (0, 1) for r in post)
    # sorted compaction recorded leading-key ranges on every base file
    assert all(r["key_min"] is not None and r["key_max"] <= "c0119" for r in post)
    # the record set matches the manifest's resolved lists exactly
    assert sorted(r["path"] for r in post) == sorted(
        f for fl in sink.file_lists().values() for f in fl
    )
    # AS-OF the pre-compaction snapshot reproduces the old breakdown
    assert sorted(r["path"] for r in sink.files(pre_sid)) == sorted(
        r["path"] for r in pre
    )
    # api twin + a missing file reports bytes=None (fsck is the loud path)
    os.remove(post[0]["path"])
    rec = [r for r in api.files(str(tmp_path / "t")) if r["path"] == post[0]["path"]]
    assert rec and rec[0]["bytes"] is None


def test_cli_files_listing(spark, tmp_path, capsys):
    import json

    from fetchez_spark.cli import main

    sink = _mk_sorted_table(spark, tmp_path, n_keys=20)
    pre_sid = sink.current_snapshot_id
    sink.compact(spark)
    rc = main(["snapshots", sink.table_dir, "--files"])
    assert rc == 0
    recs = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert recs == sink.files()
    rc = main(["snapshots", sink.table_dir, "--files", pre_sid])
    assert rc == 0
    recs = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert sorted(r["path"] for r in recs) == sorted(
        r["path"] for r in sink.files(pre_sid)
    )
