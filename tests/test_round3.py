"""Round-3 regression tests: bucket-size caps on every banded similarity
join (the last quadratic-at-scale class), the 64-bit Manku simhash shape,
and the round-2 ADVICE defects (watermark fast path, minor-compact stats,
list-blob cache canonicalization, CLI sink-arg coercion, IVF duplicate
preservation)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

UTC = dt.timezone.utc


def _ts(h: int, m: int = 0) -> dt.datetime:
    return dt.datetime(2025, 1, 1, h, m, tzinfo=UTC)


# ------------------------------------------------------- bucket caps (LSH)
NEAR_A = (0, "abcdefghijklmnopqrstuvwxyz0123456789ABCDEFGHIJKLMNOPQRSTUV")
NEAR_B = (1, "abcdefghijklmnopqrstuvwxyz0123456789ABCDEFGHIJKLMNOPQRSTUW")


def test_minhash_cap_drops_hot_bucket_keeps_rare_pair(spark):
    """Planted degenerate corpus: 30 byte-identical boilerplate docs land
    in ONE bucket per band (the quadratic blowup); the genuine near-dup
    pair lives in its own size-2 buckets.  cap=10 must kill the 435
    boilerplate pairs and keep the rare pair."""
    from fetchez_spark.functions.dedup import minhash_lsh_candidates

    boiler = "the same boilerplate preamble repeated in every generated doc"
    df = spark.createDataFrame(
        [NEAR_A, NEAR_B] + [(i, boiler) for i in range(2, 32)], ["doc_id", "text"]
    )
    uncapped = minhash_lsh_candidates(df).count()
    assert uncapped >= 1 + (30 * 29) // 2, "hot bucket really is quadratic uncapped"
    capped = minhash_lsh_candidates(df, max_bucket_size=10).collect()
    assert [(r["id_a"], r["id_b"]) for r in capped] == [(0, 1)]


def test_minhash_portable_cap_drops_hot_bucket(spark):
    from fetchez_spark.functions.dedup import minhash_lsh_candidates_portable

    boiler = "identical filler text for the degenerate bucket scenario here"
    df = spark.createDataFrame(
        [NEAR_A, NEAR_B] + [(i, boiler) for i in range(2, 32)], ["doc_id", "text"]
    )
    capped = minhash_lsh_candidates_portable(df, max_bucket_size=10).collect()
    assert [(r["id_a"], r["id_b"]) for r in capped] == [(0, 1)]


def test_simhash_cap_drops_hot_bucket_keeps_pair(spark):
    from fetchez_spark.functions.dedup import simhash_hamming_pairs

    boiler = "boilerplate header every scraped page shares verbatim today"
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again"),
    ] + [(i, boiler) for i in range(2, 32)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    uncapped = simhash_hamming_pairs(df, max_hamming=3).count()
    assert uncapped >= 1 + (30 * 29) // 2
    capped = simhash_hamming_pairs(df, max_hamming=3, max_bucket_size=10).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"])
            for r in capped] == [(0, 1, 0)]


def test_embedding_lsh_cap_drops_hot_bucket_keeps_pair(spark):
    """30 identical vectors = one hot bucket in EVERY band; the genuine
    near-pair points elsewhere.  The cap bounds candidate mass at
    bands*cap*n while the near pair (colliding in many bands) survives."""
    from fetchez_spark.functions.similarity import embedding_neardup_pairs

    dim = 16
    hot = [1.0] + [0.0] * (dim - 1)
    va = [0.0] * (dim - 1) + [1.0]
    vb = [0.0] * (dim - 2) + [0.05, 1.0]
    df = spark.createDataFrame(
        [(0, va), (1, vb)] + [(i, hot) for i in range(2, 32)],
        ["vec_id", "embedding"],
    )
    kwargs = dict(dim=dim, bands=4, planes_per_band=4, threshold=0.9, seed=7)
    uncapped = embedding_neardup_pairs(df, **kwargs).count()
    assert uncapped >= 1 + (30 * 29) // 2
    capped = embedding_neardup_pairs(df, max_bucket_size=10, **kwargs).collect()
    assert [(r["id_a"], r["id_b"]) for r in capped] == [(0, 1)]


def test_simhash64_band_key_space(spark):
    """The Manku shape: 64-bit fingerprints split into 4 x 16-bit blocks.
    Every block value must lie in [0, 65535] (65k join-key values per
    band, vs 256 for byte bands) and real corpora must populate the upper
    32 fingerprint bits (the widening is not vacuous)."""
    from fetchez_spark.functions.dedup import simhash_portable

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    hashes = [
        r["sh"] for r in docs.select(simhash_portable("text", bits=64).alias("sh")).collect()
    ]
    assert any(h < 0 or h >= (1 << 32) for h in hashes), "upper 32 bits populated"
    for h in hashes:
        u = h & 0xFFFFFFFFFFFFFFFF
        for i in range(4):
            v = (u >> (16 * i)) & 0xFFFF
            assert 0 <= v <= 0xFFFF
    # and the 32-bit portable family is unchanged (oracle compat): low
    # 32 bits of the 64-bit fingerprint == the 32-bit fingerprint
    h32 = [
        r["sh"] for r in docs.select(simhash_portable("text", bits=32).alias("sh")).collect()
    ]
    assert [h & 0xFFFFFFFF for h in hashes] == [h & 0xFFFFFFFF for h in h32]


# ------------------------------------------------------------ ADVICE defects
def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp, op string, seq long"
    )


def test_high_watermark_advances_with_metrics_off(spark, tmp_path):
    """Regression (round-2 ADVICE): default-MoR + collect_metrics=False hit
    the observation-free fast path AND skipped the stats job, so the
    high_watermark never advanced -- a later reader with late tolerance
    then silently applied no late-event rejection."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4, collect_metrics=False)
    sink.merge(
        _batch(spark, [("c1", 0, "user", "hi", None, _ts(9), "upsert", 1),
                       ("c1", 1, "asst", "yo", None, _ts(10, 30), "upsert", 2)]),
        "b0",
    )
    hwm = sink.manifest()["high_watermark"]
    assert hwm is not None and hwm.startswith("2025-01-01 10:30")
    # and a second batch advances it monotonically
    sink.merge(_batch(spark, [("c2", 0, "user", "x", None, _ts(12), "upsert", 3)]), "b1")
    assert sink.manifest()["high_watermark"].startswith("2025-01-01 12:00")


def test_minor_compact_stats_not_inherited(spark, tmp_path):
    """Regression (round-2 ADVICE): minor-compaction manifests spread the
    parent merge's stats, so catalog range filters like rows_in>=1 wrongly
    matched pure maintenance snapshots."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    sink.merge(_batch(spark, [("c1", 0, "user", "hi", None, _ts(9), "upsert", 1)]), "b0")
    res = sink.compact(spark, minor=True)
    assert res["minor"]
    rec = next(r for r in sink.snapshot_records() if r["snapshot_id"] == res["snapshot_id"])
    assert "rows_in" not in rec and "rows_upserted" not in rec
    assert rec["minor_compacted_files"] >= 1
    hits = {r["snapshot_id"] for r in sink.search(ranges={"rows_in": (1, None)})}
    assert res["snapshot_id"] not in hits, "maintenance snapshot must not match row filters"


def test_pack_list_cache_is_canonical(tmp_path):
    """Regression (round-2 ADVICE): _pack_list cached the UNSORTED input
    under the canonical blob name, so cache hits and disk reads returned
    different orderings."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    sink = LocalSnapshotSink.__new__(LocalSnapshotSink)
    sink.table_dir = str(tmp_path / "t")
    sink._list_cache = {}
    ref = sink._pack_list(["b.parquet", "a.parquet"])
    from_cache = sink._resolve_list(ref)
    sink._list_cache = {}  # force the disk read
    from_disk = sink._resolve_list(ref)
    assert from_cache == from_disk == ["a.parquet", "b.parquet"]


def test_cli_sink_arg_typed_coercion():
    """Regression (round-2 ADVICE): sink args coerced by a digit-test
    heuristic, so dedup_on_write=false arrived as the truthy string
    'false' and late_tolerance_seconds=1.5 stayed a string."""
    from fetchez_spark.cli import _parse_kv
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    got = _parse_kv(
        ["dedup_on_write=false", "late_tolerance_seconds=1.5", "num_buckets=8",
         "cluster_deltas=true", "mode=cow"],
        LocalSnapshotSink,
        check_required=False,
    )
    assert got == {
        "dedup_on_write": False,
        "late_tolerance_seconds": 1.5,
        "num_buckets": 8,
        "cluster_deltas": True,
        "mode": "cow",
    }
    with pytest.raises(SystemExit):
        _parse_kv(["not_a_knob=1"], LocalSnapshotSink, check_required=False)


def test_ivf_assign_broadcast_path_preserves_duplicates(spark):
    """Regression (round-2 ADVICE): the broadcast assign path with
    id_col=None grouped by ALL payload columns, collapsing exact-duplicate
    rows; the expression path preserved them."""
    from fetchez_spark.functions.similarity import IVFIndex

    v = [1.0, 0.0, 0.0, 0.0]
    w = [0.0, 1.0, 0.0, 0.0]
    df = spark.createDataFrame([(v,), (v,), (v,), (w,)], ["embedding"])
    idx = IVFIndex(k=2, seed=1).fit(df)
    old = IVFIndex.EXPR_PATH_MAX_K
    try:
        IVFIndex.EXPR_PATH_MAX_K = 1  # force the broadcast path
        assigned = idx.assign(df)
    finally:
        IVFIndex.EXPR_PATH_MAX_K = old
    assert assigned.count() == 4, "exact-duplicate rows keep their cardinality"
    assert assigned.columns == ["embedding", "_cell"]
    cells = assigned.withColumn("_k", F.col("embedding")[0]).groupBy("_k").agg(
        F.count_distinct("_cell").alias("n")
    ).collect()
    assert all(r["n"] == 1 for r in cells), "identical vectors share a cell"


# ------------------------------------------------------------ catalog ingest
def test_ingest_index_csv_with_field_map_and_heuristics(spark, tmp_path):
    """FRED `ingest` analog (fred.py:256-356): CSV import with explicit
    field mapping, heuristic location detection from url/link/path-ish
    headers, numeric coercion for range search, skip-counting for
    unlocatable records."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    csv_file = tmp_path / "inventory.csv"
    csv_file.write_text(
        "file_name,file_url,size_mb\n"
        "a.parquet,https://example.org/a.parquet,12\n"
        "b.parquet,https://example.org/b.parquet,900\n"
        "orphan,,3\n"
    )
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=2)
    res = sink.ingest_index(str(csv_file), field_map={"file_name": "name"})
    assert res["ingested"] == 3 and res["skipped"] == 0  # empty url is still a field
    recs = sink.search_index(eq={"name": "a.parquet"})
    assert len(recs) == 1
    assert recs[0]["location"] == "https://example.org/a.parquet"
    assert recs[0]["size_mb"] == 12  # coerced, so ranges compare numerically
    big = sink.search_index(ranges={"size_mb": (100, None)})
    assert [r["name"] for r in big] == ["b.parquet"]
    # the index survives subsequent data commits (manifest carries the ref)
    import datetime as dt

    sink.merge(
        spark.createDataFrame(
            [("c1", 0, "u", "x", None, dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc), "upsert", 1)],
            "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp, op string, seq long",
        ),
        "m-0",
    )
    assert len(sink.index_records()) == 3
    # wipe replaces
    res2 = sink.ingest_index(str(csv_file), field_map={"file_name": "name"}, wipe=True)
    assert res2["total_records"] == 3


def test_ingest_index_json_and_cli_roundtrip(tmp_path, capsys):
    import json as _json

    from fetchez_spark.cli import main
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    jf = tmp_path / "inv.json"
    jf.write_text(_json.dumps({"files": [
        {"name": "x", "path": "/data/x", "rows": "10"},
        {"name": "y", "rows": "20"},
    ]}))
    LocalSnapshotSink(str(tmp_path / "t"), num_buckets=2)
    rc = main(["ingest-index", str(tmp_path / "t"), str(jf)])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["ingested"] == 1 and out["skipped"] == 1  # y has no location-ish field
    rc = main(["index", str(tmp_path / "t"), "--where", "name=x"])
    assert rc == 0
    recs = [_json.loads(line) for line in capsys.readouterr().out.strip().splitlines()]
    assert recs == [{"name": "x", "path": "/data/x", "rows": 10, "location": "/data/x"}]
