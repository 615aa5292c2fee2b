"""compact(min_dead_fraction=...): the live-fraction-aware major fold
(VERDICT r4 #6 — the deletion-vector/anti-join alternative to full-bucket
rewrite).  Base files still mostly live are kept VERBATIM — their bytes
never enter the fold's shuffle or rewrite — while reads stay bit-exact
because every read LWW-folds across base and delta files.  These pin:
state invariance across the fold, kept-file accounting, multi-version
bucket bookkeeping (metadata count disabled until a full fold), refusal
combinations, and a second incremental round."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

PAYLOAD = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("v", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
T0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _env(spark, rows):
    return spark.createDataFrame(
        [
            (op, c, tx, v, T0 + dt.timedelta(seconds=s), s, 0)
            for op, c, tx, v, s in rows
        ],
        "op string, conv_id string, text string, v long, ts timestamp, "
        "seq long, src_partition int",
    )


def _state(spark, sink):
    return {
        (r["conv_id"], r["text"], r["v"])
        for r in sink.read(spark).select("conv_id", "text", "v").collect()
    }


@pytest.fixture()
def sink(tmp_path):
    return LocalSnapshotSink(
        str(tmp_path / "t"), num_buckets=4, key=["conv_id"],
        base_schema=PAYLOAD, compact_every=10**9,
    )


def test_dv_compact_keeps_live_files_and_state_is_invariant(spark, sink):
    # 200 keys, fully compacted -> one-row-per-key base
    sink.merge(
        _env(spark, [("U", f"c{i}", f"t{i}", i, i) for i in range(200)]), "b0"
    )
    sink.compact(spark)
    base_before = dict(sink.file_lists())
    # update 6 keys, insert 2, delete 1 -- a tiny dead fraction per file
    sink.merge(
        _env(
            spark,
            [("U", f"c{i}", f"t{i}x", i + 1000, 300 + i) for i in range(6)]
            + [("U", "n1", "new1", 1, 400), ("U", "n2", "new2", 2, 401),
               ("D", "c7", None, None, 402)],
        ),
        "b1",
    )
    before = _state(spark, sink)
    out = sink.compact(spark, min_dead_fraction=0.5)
    assert out["kept_files"] > 0, out  # mostly-live bases kept verbatim
    after = _state(spark, sink)
    assert before == after
    # kept files are THE SAME file paths (no rewrite), the manifest says
    # which buckets are multi-version
    base_after = dict(sink.file_lists())
    kept = set()
    for b, fs in base_before.items():
        kept |= set(fs) & set(base_after.get(b, []))
    assert len(kept) == out["kept_files"]
    m = sink.manifest()
    assert m.get("mv_buckets"), "buckets with superseded kept rows must be recorded"
    # updated keys resolve to the NEW values even though stale rows remain
    got = {r["conv_id"]: r["v"] for r in sink.read(spark).collect()}
    assert got["c0"] == 1000 and got["c5"] == 1005
    assert "c7" not in got and got["n1"] == 1


def test_dv_compact_metadata_count_and_full_fold_recovery(spark, sink):
    sink.merge(
        _env(spark, [("U", f"c{i}", f"t{i}", i, i) for i in range(100)]), "b0"
    )
    sink.compact(spark)
    sink.merge(_env(spark, [("U", "c1", "up", 999, 500)]), "b1")
    sink.compact(spark, min_dead_fraction=0.9)
    live = sink.read(spark).count()
    # mv buckets are NOT metadata-answerable (rows-minus-dead would
    # double-count the superseded key) -- but a scan agrees exactly
    assert sink.count_rows(spark) == live == 100
    with pytest.raises(ValueError, match="not metadata-answerable"):
        sink.count_rows(None)
    # a later FULL fold re-establishes one-row-per-key: mv cleared,
    # metadata count restored
    sink.merge(_env(spark, [("U", "c2", "up2", 998, 501)]), "b2")
    sink.compact(spark)
    assert not sink.manifest().get("mv_buckets")
    assert sink.count_rows(None) == 100


def test_dv_compact_second_round_stays_correct(spark, sink):
    sink.merge(
        _env(spark, [("U", f"c{i}", f"t{i}", i, i) for i in range(80)]), "b0"
    )
    sink.compact(spark)
    for j in range(3):
        sink.merge(
            _env(
                spark,
                [("U", f"c{i}", f"r{j}-{i}", j * 100 + i, 1000 + j * 10 + i)
                 for i in range(j, j + 3)],
            ),
            f"u{j}",
        )
        sink.compact(spark, min_dead_fraction=0.5)
    got = {r["conv_id"]: r["text"] for r in sink.read(spark).collect()}
    assert len(got) == 80
    # last writer per key: c2 touched by rounds 0(i=2),1(i=2? no: rounds
    # j=0 covers c0..c2, j=1 covers c1..c3, j=2 covers c2..c4 -- c2 ends
    # at round 2
    assert got["c2"] == "r2-2" and got["c0"] == "r0-0" and got["c4"] == "r2-4"
    # slab read over the mv buckets is winner-exact
    slab = {
        r["conv_id"]
        for r in sink.read(spark, range_hints={"v": (200, 300)}).collect()
    }
    assert slab == {"c2", "c3", "c4"}  # round-2 winners (v = 202..204)


def test_dv_compact_refusals(spark, sink):
    sink.merge(_env(spark, [("U", "c1", "t1", 1, 1)]), "b0")
    with pytest.raises(ValueError, match="purg"):
        sink.compact(
            spark, min_dead_fraction=0.5,
            purge_tombstones_before="2030-01-01",
        )
    with pytest.raises(ValueError, match="cluster_by"):
        sink.compact(spark, min_dead_fraction=0.5, cluster_by=["v"])


def test_dv_compact_mv_bucket_never_regains_metadata_count(spark, sink):
    """r5 review (confirmed repro): a bucket that STAYS multi-version
    across a SECOND min_dead_fraction fold (its kept file has dead=0
    against the new deltas) must not regain a bucket_rows entry — the
    entry's rows would count both the superseded key and its winner and
    the sig would match, so count_rows would trust the overcount."""
    sink.merge(
        _env(spark, [("U", f"c{i}", f"t{i}", i, i) for i in range(100)]), "b0"
    )
    sink.compact(spark)
    sink.merge(_env(spark, [("U", "c1", "up", 999, 500)]), "b1")
    sink.compact(spark, min_dead_fraction=0.5)  # bucket of c1 -> mv
    # a second DV round whose delta does NOT touch the kept file's keys:
    # dead=0 for the kept file, bucket must STAY mv and STAY unentered
    sink.merge(_env(spark, [("U", "zz-new", "n", 1, 501)]), "b2")
    sink.compact(spark, min_dead_fraction=0.5)
    live = sink.read(spark).count()
    assert sink.count_rows(spark) == live == 101
    with pytest.raises(ValueError, match="not metadata-answerable"):
        sink.count_rows(None)


def test_dv_knob_refused_with_partial_mode_at_construction(tmp_path):
    """r5 review: the incompatible combination must fail at CONSTRUCTION,
    not at the first auto-compaction N batches into a stream."""
    with pytest.raises(ValueError, match="full-row LWW"):
        LocalSnapshotSink(
            str(tmp_path / "p"), num_buckets=2, key=["conv_id"],
            base_schema=PAYLOAD, merge_mode="partial",
            compact_min_dead_fraction=0.5,
        )
