"""read(include_provenance=True): the Iceberg ``_file`` metadata-column
analog — every visible row carries the data file its LWW WINNER was read
from (``_file``) and the snapshot id that wrote that file (``_sid``).

The provenance column is attached at the scan and rides the MoR
reduction inside the winner struct, so under deltas it names the file of
the WINNING version; after compaction it names the compaction's output
file (where the bytes really live — same as Iceberg after a rewrite).
(Reference analog: per-entry fetch lineage — each downloaded file's
source URL recorded in results, /root/reference/src/fetchez/core.py —
lifted to row-grain table provenance.)
"""

from __future__ import annotations

import datetime as dt

import pytest

from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

UTC = dt.timezone.utc


def _batch(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, op string, seq long",
    )


def _ts(h: int) -> dt.datetime:
    return dt.datetime(2025, 1, 1, h, tzinfo=UTC)


def _prov(sink, spark):
    rows = sink.read(spark, include_provenance=True).collect()
    return {(r["conv_id"], r["turn_idx"]): r for r in rows}


def test_winner_provenance_under_deltas(spark, tmp_path):
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=2)
    sink.merge(
        _batch(
            spark,
            [
                ("a", 0, "user", "v1", None, _ts(1), "I", 1),
                ("b", 0, "user", "v1", None, _ts(1), "I", 2),
            ],
        ),
        "b-0",
    )
    sid1 = sink.current_snapshot_id
    sink.merge(
        _batch(spark, [("b", 0, "user", "v2", None, _ts(2), "U", 3)]), "b-1"
    )
    sid2 = sink.current_snapshot_id
    assert sid1 != sid2
    got = _prov(sink, spark)
    # untouched key still reads from commit 1's file; the updated key's
    # winner comes from commit 2's delta
    assert got[("a", 0)]["_sid"] == sid1
    assert got[("b", 0)]["_sid"] == sid2
    assert got[("b", 0)]["text"] == "v2"
    for r in got.values():
        assert f"data/{r['_sid']}/d" in r["_file"]
    # the plain read is unchanged: no provenance columns leak
    assert "_file" not in sink.read(spark).columns
    assert "_sid" not in sink.read(spark).columns


def test_provenance_after_compaction_names_the_rewrite(spark, tmp_path):
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=2)
    sink.merge(
        _batch(spark, [("a", 0, "user", "v1", None, _ts(1), "I", 1)]), "b-0"
    )
    sink.merge(
        _batch(spark, [("a", 1, "user", "v1", None, _ts(2), "I", 2)]), "b-1"
    )
    sink.compact(spark)
    csid = sink.current_snapshot_id
    got = _prov(sink, spark)
    assert {r["_sid"] for r in got.values()} == {csid}


def test_provenance_composes_with_pruned_point_read(spark, tmp_path):
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    rows = [("c%d" % i, 0, "user", "t%d" % i, None, _ts(1), "I", i) for i in range(8)]
    sink.merge(_batch(spark, rows), "b-0")
    sid = sink.current_snapshot_id
    out = sink.read(spark, key_eq="c3", include_provenance=True).collect()
    assert len(out) == 1 and out[0]["_sid"] == sid


def test_provenance_refused_on_partial_tables(spark, tmp_path):
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=2, merge_mode="partial")
    sink.merge(
        _batch(spark, [("a", 0, "user", "v1", None, _ts(1), "I", 1)]), "b-0"
    )
    with pytest.raises(ValueError, match="partial"):
        sink.read(spark, include_provenance=True)


def test_provenance_name_clash_is_loud(spark, tmp_path):
    sink = LocalSnapshotSink(
        str(tmp_path / "t"), num_buckets=2, key=["conv_id", "turn_idx"]
    )
    batch = spark.createDataFrame(
        [("a", 0, "x", _ts(1), "I", 1)],
        "conv_id string, turn_idx int, _sid string, ts timestamp, op string, seq long",
    )
    sink.merge(batch, "b-0")
    with pytest.raises(ValueError, match="_sid"):
        sink.read(spark, include_provenance=True)
