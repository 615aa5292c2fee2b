"""Exchange-free bucket-local major compaction (compact(local=True)).

The scale story: a cadence fold that re-shuffles already-bucket-clustered
base files moves the whole table across the network per fold; the local
path folds each bucket's file group in its own task (coalesce -> sort
within partition -> Arrow streaming keep-last) with ZERO Exchange, so
steady-state bytes-shuffled-per-event is O(event bytes) -- each event's
bytes shuffle once (flat-delta clustering) regardless of table size.

Covered: (1) plan has zero Exchange nodes; (2) state equality vs the
read-side reduction AND vs the exchange path on tricky data (deletes,
exact duplicates, equal-(ts,seq) payload ties with nulls, multi-file
buckets, schema evolution); (3) flat-delta tables cluster via a minor
pass then fold locally; (4) sorted stats + file pruning still work;
(5) branch balancing groups many buckets onto few branches.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

from fetchez_spark.sinks.local_snapshot import _BUCKET, LocalSnapshotSink

UTC = dt.timezone.utc


def _ts(h: int, m: int = 0) -> dt.datetime:
    return dt.datetime(2025, 4, 1, h, m, tzinfo=UTC)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows,
        "op string, conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp, seq long, src_partition int",
    )


def _fill(spark, sink, n=60, batches=3):
    """n keys over `batches` merges: updates, deletes, exact duplicates,
    and equal-(ts,seq) ties with differing null payloads."""
    for b in range(batches):
        rows = []
        for i in range(n):
            op = "D" if (b == batches - 1 and i % 7 == 0) else ("U" if b else "I")
            rows.append(
                (op, f"c{i}", i % 3, "user", f"v{b}-{i}", None, _ts(b + 1), b * 1000 + i, 0)
            )
        if b == 1:
            # exact duplicate row + a same-(ts,seq) tie with null text:
            # the fold's total sort order must break the tie exactly like
            # max(struct(ts, _seq, payload...))
            rows.append(("U", "c1", 1, "user", "v1-1", None, _ts(2), 1001, 0))
            rows.append(("U", "c1", 1, "user", None, "t", _ts(2), 1001, 0))
        sink.merge(_batch(spark, rows), f"b-{b}")


def _state(spark, sink):
    return sorted(
        tuple(r)
        for r in sink.read(spark)
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .collect()
    )


def test_local_fold_plan_has_zero_exchanges(spark, tmp_path):
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4, compact_every=10**9)
    _fill(spark, sink)
    m = sink.manifest()
    schema = T.StructType.fromJson(m["schema"])
    delta_map = sink._resolve_map(m.get("deltas", {}))
    base_map = sink._resolve_map(m["files"])
    groups = {
        b: base_map.get(b, []) + fs for b, fs in delta_map.items() if fs and b != "*"
    }
    frame = sink._bucket_local_fold_frame(spark, groups, schema, m["num_buckets"])
    plan = frame._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"fold plan shuffles:\n{plan[:2000]}"
    assert "MapInPandas" in plan  # the sanctioned vectorized reduce


@pytest.mark.parametrize("clustered", [True, False])
def test_local_compaction_matches_exchange_path(spark, tmp_path, clustered):
    a = LocalSnapshotSink(
        str(tmp_path / "a"), num_buckets=4, compact_every=10**9,
        cluster_deltas=clustered,
    )
    b = LocalSnapshotSink(
        str(tmp_path / "b"), num_buckets=4, compact_every=10**9,
        cluster_deltas=clustered,
    )
    _fill(spark, a)
    _fill(spark, b)
    before = _state(spark, a)
    ra = a.compact(spark, local=True)
    rb = b.compact(spark)
    assert ra["compacted_buckets"] >= 1 and rb["compacted_buckets"] >= 1
    assert _state(spark, a) == before == _state(spark, b)
    # fully folded: no deltas (incl. flats) remain in either
    assert not any(a.delta_lists().values())
    assert not any(b.delta_lists().values())
    # tombstones survive the fold (late replays must still lose)
    dead = a.read(spark, include_internal=True, include_deleted=True).filter(
        "_deleted"
    )
    assert dead.count() > 0


def test_local_compaction_after_schema_evolution(spark, tmp_path):
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4, compact_every=10**9)
    _fill(spark, sink, n=20, batches=2)
    wide = spark.createDataFrame(
        [("U", "c1", 1, "user", "wide", None, _ts(9), 9001, 0, 0.5)],
        "op string, conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp, seq long, src_partition int, quality double",
    )
    sink.merge(wide, "b-wide")
    before = sorted(
        tuple(r)
        for r in sink.read(spark).select("conv_id", "turn_idx", "text", "quality").collect()
    )
    sink.compact(spark, local=True)
    after = sorted(
        tuple(r)
        for r in sink.read(spark).select("conv_id", "turn_idx", "text", "quality").collect()
    )
    assert after == before
    got = {(r["conv_id"], r["turn_idx"]): r["quality"] for r in sink.read(spark).collect()}
    assert got[("c1", 1)] == pytest.approx(0.5)


def test_sink_option_and_sorted_stats(spark, tmp_path):
    sink = LocalSnapshotSink(
        str(tmp_path / "t"), num_buckets=4, compact_every=10**9,
        compact_bucket_local=True, sort_on_compact=True,
    )
    _fill(spark, sink)
    before = _state(spark, sink)
    sink.compact(spark)  # takes the local path via the sink option
    assert _state(spark, sink) == before
    # per-file key-range stats recorded (output is key-sorted by
    # construction) and a point read prunes to stat-matching files
    ks = sink.key_stats(sink.manifest())
    assert ks and all(len(v) == 2 for v in ks.values())
    one = sink.read(spark, key_eq="c5").collect()
    assert {r["conv_id"] for r in one} == {"c5"}


def test_branch_balancing_groups_buckets(spark, tmp_path):
    """More buckets than max_branches: buckets bin-pack onto branches,
    the fold still writes every bucket, state unchanged."""
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=8, compact_every=10**9)
    _fill(spark, sink, n=40, batches=2)
    m = sink.manifest()
    schema = T.StructType.fromJson(m["schema"])
    delta_map = sink._resolve_map(m.get("deltas", {}))
    base_map = sink._resolve_map(m["files"])
    groups = {
        b: base_map.get(b, []) + fs for b, fs in delta_map.items() if fs and b != "*"
    }
    assert len(groups) > 3
    frame = sink._bucket_local_fold_frame(
        spark, groups, schema, m["num_buckets"], max_branches=3
    )
    assert frame.rdd.getNumPartitions() <= 3
    folded = sorted(
        tuple(r)
        for r in frame.filter("NOT _deleted")
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .collect()
    )
    assert folded == _state(spark, sink)
    assert {int(b) for b in groups} == {
        r[_BUCKET] for r in frame.select(_BUCKET).distinct().collect()
    }
