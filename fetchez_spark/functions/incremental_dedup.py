"""Incremental (streaming) near-duplicate detection: a MinHash-LSH
postings index maintained as a snapshot table, fed batch-by-batch from
the change stream.

The batch-mode dedup (:mod:`fetchez_spark.functions.dedup`) answers
"what are the near-dup pairs of this corpus"; this module answers the
CDC-shaped question a continuously-ingesting pipeline actually asks:
"which already-ingested documents does THIS micro-batch nearly
duplicate" -- without ever re-scanning the corpus.  (Reference analog:
the skip-if-exists checksum cache consulted per fetched entry,
/root/reference/src/fetchez/core.py:673-692, lifted from exact to
near-duplicate identity.)

Design:

* The index is an ordinary :class:`LocalSnapshotSink` keyed on
  ``(doc_id, band)`` holding one posting row ``(doc_id, band, bucket)``
  per band -- so it inherits snapshots, exactly-once batch tokens,
  compaction, expiry, and time travel for free, and a crashed updater
  resumes idempotently.
* ``update(batch)`` merges the batch's postings (upsert; deletes
  tombstone all bands of a doc), then equi-joins the BATCH's postings
  against the index state on the band-bucket key.  The index side is
  pre-filtered with a broadcast semi-join on the batch's bucket set, so
  the shuffle is proportional to the batch's candidate mass -- never to
  the corpus.  At 10^10 docs the state side reads bucket-pruned parquet
  and the per-batch cost is O(batch x bucket occupancy).
* Insert-only feeds satisfy an exact invariant, oracle-checked in
  ``__spark_entry__``: the union of per-batch pair outputs over any
  split of the corpus EQUALS the batch-mode banded-LSH pair set (each
  pair surfaces exactly once -- in the batch where its later member
  arrives -- with its full shared-band count, because both members'
  postings are in the state by then).

Hash family: the portable md5 family (``portable_minhash_sigs``), so
the invariant is checkable against DuckDB with the same SQL as the
batch query.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fetchez_spark.functions.dedup import cap_bucket_size, portable_minhash_sigs

_EPOCH = datetime(2020, 1, 1)

_POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("bucket", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


class IncrementalNearDupIndex:
    """MinHash-LSH postings index over a snapshot table, updated per
    micro-batch; see module docstring.

    Parameters mirror :func:`minhash_lsh_candidates_portable`
    (``num_hashes``/``bands``/``k``); ``max_bucket_size`` caps
    degenerate band buckets at PAIRING time (the postings themselves
    are always complete, so the cap can be tuned per query)."""

    def __init__(
        self,
        store_dir: str,
        num_hashes: int = 16,
        bands: int = 4,
        k: int = 5,
        num_buckets: int = 8,
        max_bucket_size: int | None = None,
    ) -> None:
        from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

        self.num_hashes = num_hashes
        self.bands = bands
        self.k = k
        self.max_bucket_size = max_bucket_size
        self.sink = LocalSnapshotSink(
            store_dir,
            num_buckets=num_buckets,
            key=["doc_id", "band"],
            base_schema=_POSTINGS_SCHEMA,
            compact_every=64,
        )

    # ------------------------------------------------------------ postings
    def _band_cols(self, text_col: str):
        rows = self.num_hashes // self.bands
        sigs = portable_minhash_sigs(text_col, self.num_hashes, self.k)
        return [
            F.md5(
                F.encode(
                    F.concat_ws("|", *sigs[b * rows : (b + 1) * rows]), "UTF-8"
                )
            )
            for b in range(self.bands)
        ]

    def _batch_postings(
        self, docs: DataFrame, id_col: str, text_col: str
    ) -> DataFrame:
        return docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.posexplode(F.array(*self._band_cols(text_col))).alias(
                "band", "bucket"
            ),
        )

    def postings(
        self, spark: SparkSession, snapshot_id: str | None = None
    ) -> DataFrame:
        """Index state: one live (doc_id, band, bucket) per band."""
        return self.sink.read(spark, snapshot_id=snapshot_id).select(
            "doc_id", "band", "bucket"
        )

    def _next_seq(self) -> int:
        sid = self.sink.manifest().get("snapshot_id", "snap-0")
        return int("".join(ch for ch in str(sid) if ch.isdigit()) or 0) + 1

    # -------------------------------------------------------------- update
    def update(
        self,
        spark: SparkSession,
        docs: DataFrame,
        batch_token: str,
        seq: int | None = None,
        id_col: str = "doc_id",
        text_col: str = "text",
        op_col: str | None = None,
    ) -> DataFrame:
        """Merge one micro-batch into the index and return the NEW
        near-dup candidate pairs ``(id_a, id_b, n_shared_bands)`` it
        creates against everything indexed so far (itself included).

        ``op_col`` (values 'U'/'D') marks deletions: a deleted doc's
        postings are tombstoned band-by-band and it stops matching
        future batches.  Replaying the same ``batch_token`` is a no-op
        merge and returns the identical pair frame (the state already
        contains the batch), so a crashed caller can safely re-run."""
        if seq is None:
            seq = self._next_seq()
        ts = F.lit(_EPOCH + timedelta(seconds=seq)).cast("timestamp")
        is_del = (
            F.col(op_col) == F.lit("D") if op_col else F.lit(False)
        )
        live = docs.filter(~is_del)
        batch_p = self._batch_postings(live, id_col, text_col)
        env = batch_p.select(
            F.lit("U").alias("op"),
            "doc_id",
            "band",
            "bucket",
            ts.alias("ts"),
            F.lit(seq).cast("long").alias("seq"),
            F.pmod(F.col("doc_id"), F.lit(4)).cast("int").alias("src_partition"),
        )
        if op_col:
            dels = (
                docs.filter(is_del)
                .select(F.col(id_col).cast("long").alias("doc_id"))
                .crossJoin(
                    spark.range(self.bands).select(
                        F.col("id").cast("int").alias("band")
                    )
                )
                .select(
                    F.lit("D").alias("op"),
                    "doc_id",
                    "band",
                    F.lit(None).cast("string").alias("bucket"),
                    ts.alias("ts"),
                    F.lit(seq).cast("long").alias("seq"),
                    F.pmod(F.col("doc_id"), F.lit(4))
                    .cast("int")
                    .alias("src_partition"),
                )
            )
            env = env.unionByName(dels)
        self.sink.merge(env, batch_token=batch_token)

        # pair the batch against the post-merge state, PINNED to the
        # post-merge snapshot: the returned frame is lazy, and without the
        # pin a caller collecting it after further updates would see later
        # batches' postings and double-count their pairs.  The broadcast
        # bucket semi-join keeps the state-side scan + shuffle bounded by
        # the batch's candidate mass.
        sid = self.sink.manifest()["snapshot_id"]
        state = self.postings(spark, snapshot_id=sid)
        hot = batch_p.select("bucket").distinct()
        state = state.join(F.broadcast(hot), on="bucket")
        if self.max_bucket_size is not None:
            state = cap_bucket_size(state, ["bucket"], self.max_bucket_size)
        j = (
            batch_p.alias("l")
            .join(state.alias("r"), on="bucket")
            .filter(F.col("l.doc_id") != F.col("r.doc_id"))
        )
        a_first = F.col("l.doc_id") < F.col("r.doc_id")
        return (
            j.select(
                F.least("l.doc_id", "r.doc_id").alias("id_a"),
                F.greatest("l.doc_id", "r.doc_id").alias("id_b"),
                F.when(a_first, F.col("l.band"))
                .otherwise(F.col("r.band"))
                .alias("_band_a"),
                F.when(a_first, F.col("r.band"))
                .otherwise(F.col("l.band"))
                .alias("_band_b"),
            )
            .distinct()
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_shared_bands"))
        )
