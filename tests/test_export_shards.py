"""Deterministic shard export: exact sizes in rank mode, even-ish
spread in hash mode, reproducible across runs, one file per shard.
The rank-mode assignment itself is DuckDB-oracle-checked in
test_entry_oracle (shard_assignment)."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from fetchez_spark.functions.export import export_shards, shard_assignment


def _docs(spark, n=137):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"),
    )


def test_rank_mode_exact_shard_sizes(spark):
    a = shard_assignment(_docs(spark), shard_rows=50, mode="rank")
    sizes = {r["shard"]: r["n"] for r in a.groupBy("shard").count().withColumnRenamed("count", "n").collect()}
    assert sizes == {0: 50, 1: 50, 2: 37}
    # pos is a permutation of 0..size-1 inside each shard
    mx = {r["shard"]: r["mx"] for r in a.groupBy("shard").agg(F.max("pos").alias("mx")).collect()}
    assert mx == {0: 49, 1: 49, 2: 36}
    assert a.select("doc_id").distinct().count() == 137


def test_rank_assignment_deterministic_across_runs(spark):
    d = _docs(spark)
    a1 = sorted(map(tuple, shard_assignment(d, shard_rows=40).collect()))
    a2 = sorted(map(tuple, shard_assignment(d, shard_rows=40, num_range_partitions=5).collect()))
    # partition count must not change the global order
    assert a1 == a2


def test_hash_mode_deterministic_and_spread(spark):
    a = shard_assignment(_docs(spark, 1000), num_shards=8, mode="hash")
    sizes = [r["count"] for r in a.groupBy("shard").count().collect()]
    assert len(sizes) == 8 and min(sizes) > 60  # even-ish, all shards hit
    b = shard_assignment(_docs(spark, 1000), num_shards=8, mode="hash")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_export_writes_one_file_per_shard_with_manifest(spark, tmp_path):
    out = str(tmp_path / "shards")
    m = export_shards(_docs(spark), out, shard_rows=50, mode="rank")
    assert m["rows"] == 137 and m["shards"] == {"0": 50, "1": 50, "2": 37}
    for k in (0, 1, 2):
        files = glob.glob(os.path.join(out, f"shard={k}", "*.parquet"))
        assert len(files) == 1, f"shard {k}: {files}"
    disk = json.load(open(os.path.join(out, "_shards.json")))
    assert disk["shards"] == m["shards"]
    # shard files carry the payload in shuffle order (pos ascending)
    s0 = spark.read.parquet(os.path.join(out, "shard=0")).collect()
    assert [r["pos"] for r in s0] == sorted(r["pos"] for r in s0)
    assert {r["text"] for r in s0} == {f"doc {r['doc_id']}" for r in s0}


def test_export_reproducible(spark, tmp_path):
    d = _docs(spark)
    m1 = export_shards(d, str(tmp_path / "a"), shard_rows=60)
    m2 = export_shards(d, str(tmp_path / "b"), shard_rows=60)
    assert m1["shards"] == m2["shards"]
    r1 = sorted(map(tuple, spark.read.parquet(str(tmp_path / "a")).collect()))
    r2 = sorted(map(tuple, spark.read.parquet(str(tmp_path / "b")).collect()))
    assert r1 == r2


def test_bad_args_raise(spark):
    d = _docs(spark, 5)
    with pytest.raises(ValueError):
        shard_assignment(d, mode="rank")
    with pytest.raises(ValueError):
        shard_assignment(d, mode="hash")
    with pytest.raises(ValueError):
        shard_assignment(d, mode="zip", shard_rows=5)


def test_export_empty_frame(spark, tmp_path):
    d = _docs(spark, 0)
    m = export_shards(d, str(tmp_path / "empty"), shard_rows=10)
    assert m["rows"] == 0 and m["shards"] == {}
