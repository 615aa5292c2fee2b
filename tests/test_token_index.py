"""TokenIndexView: inverted index maintained from the typed change
feed.  Equality-vs-batch-rebuild is oracle-checked in test_entry_oracle
(token_index_state); these pin the mechanics: lost-token tombstones,
cursor idempotence, bucket-pruned lookups."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fetchez_spark.operators.token_index import TokenIndexView
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

PAYLOAD = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
T0 = dt.datetime(2024, 1, 1)


def _env(spark, rows):
    # rows: (op, doc_id, text, seq)
    return spark.createDataFrame(
        [(op, i, tx, T0 + dt.timedelta(seconds=s), s, int(i % 4)) for op, i, tx, s in rows],
        "op string, doc_id long, text string, ts timestamp, seq long, src_partition int",
    )


@pytest.fixture()
def pair(spark, tmp_path):
    docs = LocalSnapshotSink(
        str(tmp_path / "docs"), num_buckets=4, key=["doc_id"],
        base_schema=PAYLOAD, compact_every=10**9,
    )
    idx = TokenIndexView(str(tmp_path / "tok"), docs, num_buckets=8)
    return docs, idx


def _postings(spark, idx):
    return {(r["token"], r["doc_id"]) for r in idx.postings(spark).collect()}


def test_insert_update_delete_maintenance(spark, pair):
    docs, idx = pair
    docs.merge(_env(spark, [("U", 1, "red fox", 1), ("U", 2, "blue fox", 2)]), "b0")
    idx.refresh(spark)
    assert _postings(spark, idx) == {("red", 1), ("fox", 1), ("blue", 2), ("fox", 2)}
    # update: doc 1 loses "red", keeps "fox", gains "grey"
    docs.merge(_env(spark, [("U", 1, "grey fox", 3)]), "b1")
    idx.refresh(spark)
    assert _postings(spark, idx) == {("grey", 1), ("fox", 1), ("blue", 2), ("fox", 2)}
    # delete: doc 2's postings tombstoned via the pre-image
    docs.merge(_env(spark, [("D", 2, None, 4)]), "b2")
    idx.refresh(spark)
    assert _postings(spark, idx) == {("grey", 1), ("fox", 1)}


def test_refresh_is_idempotent_and_cursor_advances(spark, pair):
    docs, idx = pair
    docs.merge(_env(spark, [("U", 1, "a b", 1)]), "b0")
    r1 = idx.refresh(spark)
    assert r1["to"] == docs.current_snapshot_id
    r2 = idx.refresh(spark)  # nothing new
    assert r2.get("skipped") is True
    # replaying the same range (crash before cursor write is impossible --
    # cursor and postings commit atomically -- but a caller-level retry
    # re-merges with the same token and is skipped)
    before = idx.store.manifest()["snapshot_id"]
    # the refresh's actual committed token (format-agnostic)
    cb = idx.store.manifest()["committed_batches"]
    token = next(t for t, s in cb.items() if s == r1["snapshot_id"])
    idx.store.merge(
        _env(spark, []).limit(0).selectExpr(
            "op", "cast(null as string) as token", "doc_id", "ts", "seq", "src_partition"
        ),
        batch_token=token,
    )
    assert idx.store.manifest()["snapshot_id"] == before


def test_lookup_prunes_to_one_bucket(spark, pair):
    docs, idx = pair
    rows = [("U", i, f"tok{i} common", i + 1) for i in range(40)]
    docs.merge(_env(spark, rows), "b0")
    idx.refresh(spark)
    idx.store.compact(spark)
    hit = idx.lookup(spark, "tok7")
    assert {r["doc_id"] for r in hit.collect()} == {7}
    # manifest-level pruning: the lookup plan reads at most one bucket's
    # files out of 8
    nb = idx.store.manifest()["num_buckets"]
    per_bucket = max(
        1, len(idx.store.read(spark).inputFiles()) // nb
    )
    assert len(hit.inputFiles()) <= per_bucket + 1
    common = idx.lookup(spark, "common")
    assert common.count() == 40


def test_token_in_both_pre_and_post_keeps_posting(spark, pair):
    docs, idx = pair
    docs.merge(_env(spark, [("U", 5, "keep drop", 1)]), "b0")
    idx.refresh(spark)
    docs.merge(_env(spark, [("U", 5, "keep added", 2)]), "b1")
    idx.refresh(spark)
    assert _postings(spark, idx) == {("keep", 5), ("added", 5)}
