"""Z-order clustering compaction + multi-column file-stats pruning.

``compact(cluster_by=[...])`` Morton-interleaves quantile-cell ids of
the cluster columns, range-clusters each bucket's winners on the key,
and records per-file min/max (exact parquet footer stats) for EVERY
cluster column in the manifest.  ``read(range_hints={col: (lo, hi)})``
then skips files whose recorded ranges exclude the slab -- but only for
buckets with zero pending deltas, because pruning on a non-key column
is sound only when no other in-scope file can hold a row of the same
key.  The residual slab filter applies to the FINAL (post-LWW) state.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fetchez_spark.schema import CHANGE_EVENT_SCHEMA
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

T0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def ev(op, conv, turn, text, ts_s, seq, part=0):
    return (op, conv, turn, "user", text, None, T0 + dt.timedelta(seconds=ts_s), seq, part)


def _df(spark, rows):
    return spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)


def _mk_table(spark, tmp_path, n_keys=160, turns=4):
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=2, compact_every=10**9)
    rows = [
        ev("U", f"c{i:04d}", t, f"v{i}-{t}", i * 7 + t, i * turns + t)
        for i in range(n_keys)
        for t in range(turns)
    ]
    half = len(rows) // 2
    sink.merge(_df(spark, rows[:half]), "b1")
    sink.merge(_df(spark, rows[half:]), "b2")
    return sink


def _slab(df, lo_turn, hi_turn, lo_ts, hi_ts):
    return df.filter(
        (F.col("turn_idx") >= lo_turn) & (F.col("turn_idx") <= hi_turn)
        & (F.col("ts") >= F.lit(lo_ts)) & (F.col("ts") <= F.lit(hi_ts))
    )


def test_zorder_state_unchanged_and_stats_recorded(spark, tmp_path):
    sink = _mk_table(spark, tmp_path)
    before = sink.read(spark).orderBy("conv_id", "turn_idx").collect()
    res = sink.compact(spark, cluster_by=["turn_idx", "ts"])
    assert res["compacted_buckets"] == 2
    after = sink.read(spark).orderBy("conv_id", "turn_idx").collect()
    assert after == before

    stats = sink.col_stats()
    files = sink.file_lists()
    base = [f for fs in files.values() for f in fs]
    assert base and set(base) <= set(stats)
    for entry in stats.values():
        assert set(entry) == {"turn_idx", "ts"}
        lo, hi = entry["turn_idx"]
        assert 0 <= lo <= hi <= 3


def test_zorder_slab_read_prunes_files_and_matches(spark, tmp_path):
    sink = _mk_table(spark, tmp_path)
    # small range chunks -> several files per bucket so pruning has grain
    sink.compact(spark, cluster_by=["turn_idx", "ts"], target_file_bytes=4096)
    lo_ts, hi_ts = T0 + dt.timedelta(seconds=0), T0 + dt.timedelta(seconds=400)
    hints = {"turn_idx": (0, 1), "ts": (lo_ts, hi_ts)}
    pruned = sink.read(spark, range_hints=hints)
    oracle = _slab(sink.read(spark), 0, 1, lo_ts, hi_ts)
    assert sorted(map(tuple, pruned.collect())) == sorted(map(tuple, oracle.collect()))
    n_all = len(sink.read(spark).inputFiles())
    n_pruned = len(pruned.inputFiles())
    assert 0 < n_pruned < n_all


def test_open_ended_and_iso_string_bounds(spark, tmp_path):
    sink = _mk_table(spark, tmp_path, n_keys=40)
    sink.compact(spark, cluster_by=["turn_idx", "ts"])
    iso = (T0 + dt.timedelta(seconds=100)).replace(tzinfo=None).isoformat(sep=" ")
    got = sink.read(spark, range_hints={"ts": (iso, None)})
    want = sink.read(spark).filter(F.col("ts") >= F.lit(iso))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_range_hints_with_deltas_stay_correct_and_unpruned(spark, tmp_path):
    sink = _mk_table(spark, tmp_path)
    sink.compact(spark, cluster_by=["turn_idx", "ts"])
    lo_ts, hi_ts = T0, T0 + dt.timedelta(seconds=10**6)
    hints = {"turn_idx": (0, 1), "ts": (lo_ts, hi_ts)}
    before_files = len(sink.read(spark, range_hints=hints).inputFiles())
    # a delta moves one key's winner OUT of the slab: same key, new ts
    # beyond the hint's hi bound -- the stale in-slab base row must lose
    sink.merge(_df(spark, [ev("U", "c0000", 0, "moved", 2 * 10**6, 10**9)]), "b-late")
    pruned = sink.read(spark, range_hints=hints)
    oracle = _slab(sink.read(spark), 0, 1, lo_ts, hi_ts)
    got = sorted(map(tuple, pruned.collect()))
    assert got == sorted(map(tuple, oracle.collect()))
    # the moved key's winner is outside the slab: it must NOT appear even
    # though its STALE turn-0 row (in-slab) still sits in a base file
    assert not any(r[0] == "c0000" and r[1] == 0 for r in got)
    # pruning is disabled for the delta-bearing bucket: the slab read now
    # touches at least as many files as before plus the delta
    assert len(pruned.inputFiles()) > before_files


def test_zorder_stats_trimmed_on_recompact(spark, tmp_path):
    sink = _mk_table(spark, tmp_path, n_keys=60)
    sink.compact(spark, cluster_by=["turn_idx", "ts"])
    assert sink.col_stats()
    zfiles = set(sink.col_stats())
    sink.merge(_df(spark, [ev("U", "c0001", 0, "upd", 900, 10**6)]), "b3")
    sink.compact(spark)  # plain fold replaces the delta bucket's z files
    stats = sink.col_stats()
    live = {f for fs in sink.file_lists().values() for f in fs}
    assert not set(stats) - live  # no dangling entries
    # the folded bucket's entries are gone; the untouched bucket's z files
    # survive WITH their (still-valid) stats
    assert set(stats) == zfiles & live and stats
    # a full rewrite (rebucket) drops every z entry
    sink.rebucket(spark, 4)
    assert sink.col_stats() == {}


def test_cluster_by_rejects_strings_and_sort_combo(spark, tmp_path):
    sink = _mk_table(spark, tmp_path, n_keys=10)
    with pytest.raises(ValueError, match="numeric/timestamp/date"):
        sink.compact(spark, cluster_by=["text"])
    with pytest.raises(ValueError, match="mutually exclusive"):
        sink.compact(spark, cluster_by=["turn_idx"], sort=True)
    with pytest.raises(ValueError, match="not in table schema"):
        sink.compact(spark, cluster_by=["nope"])


def test_cli_maintain_cluster_by(spark, tmp_path, capsys):
    import json as _json

    from fetchez_spark.cli import main

    sink = _mk_table(spark, tmp_path, n_keys=30)
    rc = main(
        [
            "maintain", str(tmp_path / "t"),
            "--compact", "--cluster-by", "turn_idx,ts", "--cores", "2",
        ]
    )
    assert rc == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["compact"]["compacted_buckets"] == 2
    stats = sink.col_stats()
    assert stats and all(set(e) == {"turn_idx", "ts"} for e in stats.values())


def test_morton_interleave_expression(spark):
    from fetchez_spark.plans.zorder import interleave_bits

    df = spark.range(1).select(
        interleave_bits([F.lit(3), F.lit(1)], bits=2).alias("z2"),
        interleave_bits([F.lit(0b101)], bits=3).alias("z1"),
    )
    row = df.collect()[0]
    # ranks (3, 1), k=2: dim0 bits 0,1 -> z bits 0,2; dim1 bit 0 -> z bit 1
    assert row["z2"] == 0b111
    assert row["z1"] == 0b101  # single dim passes through


def test_rank_expr_counts_boundaries_and_handles_nulls(spark):
    from pyspark.sql import types as T

    from fetchez_spark.plans.zorder import rank_expr

    df = spark.createDataFrame(
        [(0.5,), (1.0,), (2.5,), (None,)], T.StructType(
            [T.StructField("v", T.DoubleType(), True)]
        )
    ).select(rank_expr(F.col("v"), T.DoubleType(), [1.0, 2.0]).alias("r"))
    # raw counts 0/1/2 over 2 cuts stretch to the full 8-bit range so a
    # low-cardinality dimension keeps bit parity with a continuous one
    assert [r["r"] for r in df.collect()] == [0, 127, 255, 0]
