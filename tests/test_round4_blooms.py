"""Per-file key bloom sidecars: point-lookup file skipping on the files
key-range sorting never covers (minor-consolidated MoR deltas and
hash-mode bases).

``compact(bloom=True)`` builds a bloom of the leading key for each
output file (bit positions from Spark's own xxhash64, bitmap OR as a
vectorized numpy fold); ``read(key_eq=...)`` probes with the SAME
xxhash64 expressions over a one-row frame, so build/probe consistency
holds by construction.  No false negatives: a pruned file provably
holds no row of the key, so the per-key LWW reduction is unaffected.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from fetchez_spark.schema import CHANGE_EVENT_SCHEMA
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

T0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def ev(op, conv, turn, text, ts_s, seq, part=0):
    return (op, conv, turn, "user", text, None, T0 + dt.timedelta(seconds=ts_s), seq, part)


def _df(spark, rows):
    return spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)


def _mk(spark, tmp_path, n_keys=96):
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4, compact_every=10**9)
    rows = [ev("U", f"c{i:04d}", 0, f"v{i}", i, i) for i in range(n_keys)]
    third = len(rows) // 3
    sink.merge(_df(spark, rows[:third]), "b1")
    sink.merge(_df(spark, rows[third: 2 * third]), "b2")
    sink.merge(_df(spark, rows[2 * third:]), "b3")
    return sink


def test_minor_bloom_prunes_consolidated_deltas(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    sink.compact(spark, minor=True, bloom=True)
    blooms = sink.key_blooms()
    deltas = {f for fs in sink.delta_lists().values() for f in fs}
    assert deltas and deltas <= set(blooms)
    # every key still resolves (no false negatives), sampled across range
    for key in ("c0000", "c0031", "c0064", "c0095"):
        got = sink.read(spark, key_eq=key).collect()
        assert len(got) == 1 and got[0]["conv_id"] == key
    # the point read skips delta files of other buckets' keys: strictly
    # fewer input files than the full read
    full = len(sink.read(spark).inputFiles())
    pruned = len(sink.read(spark, key_eq="c0000").inputFiles())
    assert 0 < pruned < full


def test_major_bloom_on_hash_mode_bases(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    sink.compact(spark, bloom=True, sort=False)
    blooms = sink.key_blooms()
    bases = {f for fs in sink.file_lists().values() for f in fs}
    assert bases <= set(blooms) and not {
        f for fs in sink.delta_lists().values() for f in fs
    }
    got = sink.read(spark, key_eq="c0042").collect()
    assert len(got) == 1
    assert len(sink.read(spark, key_eq="c0042").inputFiles()) < len(bases)


def test_bloom_entries_trimmed_when_files_fold(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    sink.compact(spark, minor=True, bloom=True)
    delta_blooms = set(sink.key_blooms())
    # a plain major fold consumes the bloom'd deltas: entries must go
    sink.compact(spark)
    blooms = sink.key_blooms()
    assert not set(blooms) & delta_blooms
    assert blooms == {}  # plain fold built no new blooms
    # state unchanged end to end
    assert sink.read(spark).count() == 96


def test_bloom_probe_matches_build_for_long_keys(spark, tmp_path):
    # integer leading key: the xxhash64 input type differs from strings,
    # and the probe must hash the SAME type the build hashed
    from pyspark.sql import types as T

    payload = T.StructType(
        [
            T.StructField("uid", T.LongType(), False),
            T.StructField("val", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), False),
        ]
    )
    sink = LocalSnapshotSink(
        str(tmp_path / "t"), num_buckets=2, key=["uid"],
        base_schema=payload, compact_every=10**9,
    )
    rows = [
        ("U", i, f"v{i}", T0 + dt.timedelta(seconds=i), i, 0)
        for i in range(50)
    ]
    env_schema = T.StructType(
        [T.StructField("op", T.StringType(), False)]
        + payload.fields[:2]
        + [payload.fields[2]]
        + [
            T.StructField("seq", T.LongType(), False),
            T.StructField("src_partition", T.IntegerType(), False),
        ]
    )
    sink.merge(spark.createDataFrame(rows, env_schema), "b1")
    sink.compact(spark, bloom=True)
    assert sink.key_blooms()
    got = sink.read(spark, key_eq=7).collect()
    assert len(got) == 1 and got[0]["uid"] == 7


def test_oversized_files_get_no_bloom_and_stay_readable(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(LocalSnapshotSink, "_BLOOM_MAX_ROWS", 10)
    sink = _mk(spark, tmp_path)  # 32 rows per batch > 10
    sink.compact(spark, minor=True, bloom=True)
    assert sink.key_blooms() == {}
    assert len(sink.read(spark, key_eq="c0001").collect()) == 1


def test_cli_maintain_bloom(spark, tmp_path, capsys):
    import json as _json

    from fetchez_spark.cli import main

    sink = _mk(spark, tmp_path)
    rc = main(
        ["maintain", str(tmp_path / "t"), "--minor", "--bloom", "--cores", "2"]
    )
    assert rc == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["minor_compact"]["minor"] is True
    assert sink.key_blooms()
