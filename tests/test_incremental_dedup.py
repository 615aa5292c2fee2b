"""IncrementalNearDupIndex: CDC-fed MinHash-LSH postings over a
snapshot table.  The exactness invariant (union of per-batch outputs ==
batch LSH) is oracle-checked in test_entry_oracle; these tests pin the
CDC behaviors the oracle can't express: deletes, updates, replay."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fetchez_spark.functions.incremental_dedup import IncrementalNearDupIndex

DOC = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = DOC.replace("today", "tonight")
FAR = "completely unrelated content about spark shuffles and parquet footers here"


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _opdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, op string")


def test_batch_finds_pairs_against_prior_batches(spark, tmp_path):
    idx = IncrementalNearDupIndex(str(tmp_path / "idx"), num_hashes=16, bands=4, k=5)
    p1 = idx.update(spark, _docs(spark, [(1, DOC), (2, FAR)]), "b1", seq=1)
    assert p1.count() == 0  # nothing similar within batch 1
    p2 = idx.update(spark, _docs(spark, [(3, NEAR)]), "b2", seq=2)
    got = {(r["id_a"], r["id_b"]) for r in p2.collect()}
    assert got == {(1, 3)}
    row = p2.collect()[0]
    assert 1 <= row["n_shared_bands"] <= 4


def test_within_batch_pairs_counted_once(spark, tmp_path):
    idx = IncrementalNearDupIndex(str(tmp_path / "idx"), num_hashes=16, bands=4, k=5)
    p = idx.update(spark, _docs(spark, [(1, DOC), (2, DOC)]), "b1", seq=1)
    rows = p.collect()
    assert [(r["id_a"], r["id_b"], r["n_shared_bands"]) for r in rows] == [(1, 2, 4)]


def test_delete_stops_future_matches(spark, tmp_path):
    idx = IncrementalNearDupIndex(str(tmp_path / "idx"), num_hashes=16, bands=4, k=5)
    idx.update(spark, _opdocs(spark, [(1, DOC, "U")]), "b1", seq=1, op_col="op")
    idx.update(spark, _opdocs(spark, [(1, None, "D")]), "b2", seq=2, op_col="op")
    assert idx.postings(spark).count() == 0
    p3 = idx.update(spark, _opdocs(spark, [(3, DOC, "U")]), "b3", seq=3, op_col="op")
    assert p3.count() == 0  # the deleted doc no longer matches


def test_update_replaces_postings(spark, tmp_path):
    idx = IncrementalNearDupIndex(str(tmp_path / "idx"), num_hashes=16, bands=4, k=5)
    idx.update(spark, _docs(spark, [(1, FAR)]), "b1", seq=1)
    # doc 1 rewritten to DOC: postings are LWW-replaced, not appended
    idx.update(spark, _docs(spark, [(1, DOC)]), "b2", seq=2)
    assert idx.postings(spark).count() == 4  # one live posting per band
    p3 = idx.update(spark, _docs(spark, [(2, DOC)]), "b3", seq=3)
    assert {(r["id_a"], r["id_b"]) for r in p3.collect()} == {(1, 2)}


def test_replay_same_token_is_idempotent(spark, tmp_path):
    idx = IncrementalNearDupIndex(str(tmp_path / "idx"), num_buckets=4)
    idx.update(spark, _docs(spark, [(1, DOC)]), "b1", seq=1)
    p2a = idx.update(spark, _docs(spark, [(2, NEAR)]), "b2", seq=2)
    before = idx.sink.manifest()["snapshot_id"]
    p2b = idx.update(spark, _docs(spark, [(2, NEAR)]), "b2", seq=2)
    assert idx.sink.manifest()["snapshot_id"] == before  # no-op merge
    assert sorted(map(tuple, p2a.collect())) == sorted(map(tuple, p2b.collect()))
    assert idx.postings(spark).count() == 8


def test_outputs_stay_stable_after_later_updates(spark, tmp_path):
    # the returned frame is pinned to its post-merge snapshot: collecting
    # it AFTER later batches must not pick up their postings
    idx = IncrementalNearDupIndex(str(tmp_path / "idx"))
    p1 = idx.update(spark, _docs(spark, [(1, DOC)]), "b1", seq=1)
    p2 = idx.update(spark, _docs(spark, [(2, NEAR)]), "b2", seq=2)
    idx.update(spark, _docs(spark, [(3, DOC)]), "b3", seq=3)
    assert p1.count() == 0
    assert {(r["id_a"], r["id_b"]) for r in p2.collect()} == {(1, 2)}


def test_max_bucket_size_caps_degenerate_buckets(spark, tmp_path):
    idx = IncrementalNearDupIndex(
        str(tmp_path / "idx"), num_hashes=16, bands=4, k=5, max_bucket_size=3
    )
    # 6 identical docs: every band bucket holds 6 > 3 -> capped, no pairs
    idx.update(spark, _docs(spark, [(i, DOC) for i in range(6)]), "b1", seq=1)
    p2 = idx.update(spark, _docs(spark, [(9, DOC)]), "b2", seq=2)
    assert p2.count() == 0
