"""Parquet + JSON-manifest sink with Iceberg snapshot semantics.

Layout (one directory per table)::

    <table_dir>/
      VERSION                      # name of current manifest (atomic os.replace)
      manifests/snap-0000000001.json
      data/snap-0000000001/_bucket=<b>/part-*.parquet

Manifest (the "snapshot"): schema, parent pointer, per-bucket data-file
lists, committed batch tokens, row stats.  A commit is:

1. write new data files under a snapshot-unique directory (never mutates
   existing files -- crash mid-write leaves unreferenced orphans only);
2. write ``manifests/snap-N.json.tmp`` then ``os.replace`` to final;
3. write ``VERSION.tmp`` then ``os.replace`` onto ``VERSION``.

``os.replace`` is atomic on POSIX, mirroring fetchez's download commit
(write ``.part``, verify, ``os.rename`` -- /root/reference/src/fetchez/
core.py:673-692).  If the process dies between (2) and (3) the snapshot is
orphaned and the batch is NOT committed; streaming replay re-merges it.

Scale design -- bucket-level copy-on-write:

* Target rows are hash-bucketed on ``conv_id`` (``pmod(hash(conv_id), B)``,
  deterministic Murmur3).  A micro-batch only rewrites the buckets it
  touches; untouched buckets carry their file references forward in the
  new manifest unchanged.  At 100 TB with B in the thousands, a batch
  touching k buckets costs O(k/B * table) IO, not O(table).
* Reads prune at the manifest level: only the file list for requested
  buckets is handed to the parquet scan (Iceberg-style manifest pruning).
* Schema evolution is metadata-only: old files are never rewritten; reads
  pass the current (union) schema and parquet null-backfills missing
  columns.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fetchez_spark.operators.dedup import dedup_latest
from fetchez_spark.operators.merge import batch_to_target_rows, merge_into
from fetchez_spark.schema import (
    INTERNAL_DELETED,
    INTERNAL_SEQ,
    KEY_COLUMNS,
    TRANSCRIPT_SCHEMA,
    merge_schemas,
)
from fetchez_spark.sinks.base import SnapshotSink

_BUCKET = "_bucket"


def _internal_fields() -> list[T.StructField]:
    return [
        T.StructField(INTERNAL_SEQ, T.LongType(), True),
        T.StructField(INTERNAL_DELETED, T.BooleanType(), True),
    ]


class LocalSnapshotSink(SnapshotSink):
    def __init__(
        self,
        table_dir: str,
        num_buckets: int = 32,
        key: list[str] | None = None,
        base_schema: T.StructType | None = None,
        dedup_salt: int = 0,
        collect_metrics: bool = True,
    ) -> None:
        self.table_dir = table_dir
        self.key = key or KEY_COLUMNS
        self.dedup_salt = dedup_salt
        self.collect_metrics = collect_metrics
        os.makedirs(os.path.join(table_dir, "manifests"), exist_ok=True)
        os.makedirs(os.path.join(table_dir, "data"), exist_ok=True)
        if self._version() is None:
            schema = T.StructType(
                list((base_schema or TRANSCRIPT_SCHEMA).fields) + _internal_fields()
            )
            root = {
                "snapshot_id": "snap-0000000000",
                "parent": None,
                "schema": schema.jsonValue(),
                "num_buckets": num_buckets,
                "files": {},
                "committed_batches": {},
                "stats": {"rows": 0},
                "offsets": None,
            }
            self._write_manifest(root)
            self._set_version(root["snapshot_id"])

    # ---------------------------------------------------------- manifest io
    def _version_path(self) -> str:
        return os.path.join(self.table_dir, "VERSION")

    def _version(self) -> str | None:
        try:
            with open(self._version_path()) as f:
                return f.read().strip()
        except FileNotFoundError:
            return None

    def _set_version(self, snapshot_id: str) -> None:
        tmp = self._version_path() + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(snapshot_id)
        os.replace(tmp, self._version_path())

    def _manifest_path(self, snapshot_id: str) -> str:
        return os.path.join(self.table_dir, "manifests", f"{snapshot_id}.json")

    def _write_manifest(self, manifest: dict) -> None:
        path = self._manifest_path(manifest["snapshot_id"])
        tmp = path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, path)

    def manifest(self, snapshot_id: str | None = None) -> dict:
        sid = snapshot_id or self._version()
        with open(self._manifest_path(sid)) as f:
            return json.load(f)

    @property
    def current_snapshot_id(self) -> str:
        return self._version()

    def schema(self, include_internal: bool = False) -> T.StructType:
        full = T.StructType.fromJson(self.manifest()["schema"])
        if include_internal:
            return full
        skip = {INTERNAL_SEQ, INTERNAL_DELETED}
        return T.StructType([f for f in full.fields if f.name not in skip])

    def is_committed(self, batch_token: str) -> bool:
        return str(batch_token) in self.manifest()["committed_batches"]

    # -------------------------------------------------------------- reading
    def _bucket_expr(self, num_buckets: int):
        return F.pmod(F.hash(F.col(self.key[0])), F.lit(num_buckets))

    def _read_files(
        self, spark: SparkSession, files: list[str], schema: T.StructType
    ) -> DataFrame:
        if not files:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(*files)

    def read(
        self,
        spark: SparkSession,
        snapshot_id: str | None = None,
        include_internal: bool = False,
        buckets: list[int] | None = None,
    ) -> DataFrame:
        m = self.manifest(snapshot_id)
        schema = T.StructType.fromJson(m["schema"])
        file_map = m["files"]
        keys = [str(b) for b in buckets] if buckets is not None else list(file_map)
        files = [f for b in keys for f in file_map.get(b, [])]
        df = self._read_files(spark, files, schema).filter(~F.col(INTERNAL_DELETED))
        if not include_internal:
            df = df.drop(INTERNAL_SEQ, INTERNAL_DELETED)
        return df

    # -------------------------------------------------------------- merging
    def merge(
        self,
        batch: DataFrame,
        batch_token: str,
        offsets: dict[str, Any] | None = None,
    ) -> dict[str, Any]:
        t0 = time.monotonic()
        token = str(batch_token)
        cur = self.manifest()
        if token in cur["committed_batches"]:
            return {
                "snapshot_id": cur["committed_batches"][token],
                "skipped": True,
                "batch_token": token,
            }
        spark = batch.sparkSession
        nb = cur["num_buckets"]
        cur_schema = T.StructType.fromJson(cur["schema"])

        # 1. within-batch dedup (salted two-phase if configured) + reshape.
        deduped = dedup_latest(batch, key=self.key, order=["ts", "seq"], salt=self.dedup_salt)
        rows = batch_to_target_rows(deduped).withColumn(_BUCKET, self._bucket_expr(nb))

        # 2. additive schema evolution (metadata-only).
        batch_payload_schema = T.StructType(
            [f for f in rows.schema.fields if f.name != _BUCKET]
        )
        new_schema = merge_schemas(cur_schema, batch_payload_schema)

        metrics: dict[str, Any] = {"batch_token": token, "skipped": False}
        if self.collect_metrics:
            agg = rows.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col(INTERNAL_DELETED).cast("long")).alias("d"),
            ).collect()[0]
            metrics["rows_deduped"] = agg["n"]
            metrics["rows_deleted"] = agg["d"] or 0
            metrics["rows_upserted"] = agg["n"] - metrics["rows_deleted"]

        # 3. manifest-level pruning: only buckets present in this batch.
        touched = [r[0] for r in rows.select(_BUCKET).distinct().collect()]
        existing_files = [
            f for b in touched for f in cur["files"].get(str(b), [])
        ]
        read_schema = T.StructType(list(new_schema.fields))  # null-backfill old files
        existing = (
            self._read_files(spark, existing_files, read_schema).withColumn(
                _BUCKET, self._bucket_expr(nb)
            )
            if existing_files
            else None
        )

        # 4. bucket-local merge = union + max-(ts,_seq) per key.
        merged = merge_into(existing, rows, key=self.key)

        # 5. write new files for touched buckets only (snapshot-unique dir).
        sid = f"snap-{int(cur['snapshot_id'].split('-')[1]) + 1:010d}"
        snap_dir = os.path.join(self.table_dir, "data", sid)
        out_cols = [f.name for f in new_schema.fields] + [_BUCKET]
        (
            merged.select(*out_cols)
            .repartition(max(len(touched), 1), F.col(_BUCKET))
            .write.partitionBy(_BUCKET)
            .mode("overwrite")
            .parquet(snap_dir)
        )

        # 6. new manifest: carry untouched buckets forward by reference.
        new_files = dict(cur["files"])
        for b in touched:
            new_files[str(b)] = []
        for entry in os.scandir(snap_dir):
            if entry.is_dir() and entry.name.startswith(f"{_BUCKET}="):
                b = entry.name.split("=", 1)[1]
                new_files[b] = [
                    os.path.join(entry.path, fn)
                    for fn in sorted(os.listdir(entry.path))
                    if fn.endswith(".parquet")
                ]
        committed = dict(cur["committed_batches"])
        committed[token] = sid
        manifest = {
            "snapshot_id": sid,
            "parent": cur["snapshot_id"],
            "schema": new_schema.jsonValue(),
            "num_buckets": nb,
            "files": new_files,
            "committed_batches": committed,
            "stats": {"touched_buckets": len(touched)},
            "offsets": offsets,
        }
        self._write_manifest(manifest)
        self._set_version(sid)  # <- the atomic commit point
        metrics["snapshot_id"] = sid
        metrics["touched_buckets"] = len(touched)
        metrics["seconds"] = time.monotonic() - t0
        return metrics

    # ------------------------------------------------------------- maintain
    def rollback(self, snapshot_id: str) -> None:
        # Validate it exists before moving the pointer.
        self.manifest(snapshot_id)
        self._set_version(snapshot_id)

    def snapshots(self) -> list[str]:
        return sorted(
            fn[:-5]
            for fn in os.listdir(os.path.join(self.table_dir, "manifests"))
            if fn.endswith(".json")
        )

    def expire_snapshots(self, keep_last: int = 1) -> int:
        """Delete data dirs not referenced by the newest ``keep_last`` manifests."""
        keep = self.snapshots()[-keep_last:]
        if self.current_snapshot_id not in keep:
            keep.append(self.current_snapshot_id)
        referenced: set[str] = set()
        for sid in keep:
            for files in self.manifest(sid)["files"].values():
                referenced.update(files)
        removed = 0
        data_root = os.path.join(self.table_dir, "data")
        for snap in os.listdir(data_root):
            snap_dir = os.path.join(data_root, snap)
            live = any(f.startswith(snap_dir + os.sep) for f in referenced)
            if not live:
                shutil.rmtree(snap_dir)
                removed += 1
        for sid in self.snapshots():
            if sid not in keep:
                os.remove(self._manifest_path(sid))
        return removed
