"""The table AS a stream: a PySpark Python DataSource whose streaming
reader tails a :class:`LocalSnapshotSink` table's COMMITS -- the
Delta/Iceberg "streaming source over a table" analog, so downstream
pipelines consume the CDC feed with ordinary Structured Streaming
(watermarks, windowed aggs, their own checkpoints)::

    from fetchez_spark.sources.change_stream import register
    register(spark)
    feed = (spark.readStream.format("fetchez_changes")
                 .option("table_dir", "/data/table").load())
    feed.writeStream... # exactly-once from the consumer's checkpoint

Offsets are SNAPSHOT IDS: each micro-batch covers one commit range via
the same manifest walk as :meth:`LocalSnapshotSink.read_changes`
(maintenance commits contribute nothing; CoW uses the change sidecars),
so a consumer restart replays from its checkpointed snapshot exactly.

Implementation notes (honest limits):

* built on ``SimpleDataSourceStreamReader``: rows are produced
  DRIVER-side via pyarrow over the range's change files.  That is the
  right shape for CHANGE traffic (O(batch), small next to the table);
  a full-history backfill should use :meth:`read_changes` as a batch
  DataFrame instead.
* tombstones are dropped (upserts-only feed) unless
  ``include_deletes=true``, in which case ``_deleted`` is exposed.
* deployment: Python data sources are planned in separate python
  worker processes that import the source by MODULE PATH -- the
  package must be importable there (pip-installed, or PYTHONPATH /
  ``spark.executorEnv.PYTHONPATH`` pointing at the repo).  A bare
  ``spark-submit --py-files fetchez_spark.zip`` is NOT enough for this
  one format (verified: the planner worker misses runtime-added
  py-files); every other engine feature works from the zip alone.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

from fetchez_spark.schema import INTERNAL_DELETED
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink, _is_internal_name

FORMAT_NAME = "fetchez_changes"


def register(spark) -> None:
    """Register the ``fetchez_changes`` streaming format on a session."""
    spark.dataSource.register(ChangesDataSource)


class ChangesDataSource(DataSource):
    """``format("fetchez_changes")`` -- options:

    * ``table_dir`` (required): the snapshot table;
    * ``from_snapshot``: start offset (default: current -- new changes
      only; use the oldest retained snapshot id for history);
    * ``include_deletes``: 'true' exposes tombstones with ``_deleted``;
    * ``consumer``: a durable cursor name (see
      ``LocalSnapshotSink.register_consumer``) -- the reader starts from
      the stored cursor when no ``from_snapshot``/checkpoint says
      otherwise, and Spark's ``commit(end)`` callback advances it after
      each epoch completes, so the table's ``expire_snapshots`` retains
      the chain this subscription still needs even while it lags.
      Exactly-once delivery is still the consumer-side checkpoint's job;
      the cursor is the TABLE-side retention contract.
    """

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        sink = LocalSnapshotSink(self.options["table_dir"])
        full = sink.schema(include_internal=True)
        include_deletes = str(self.options.get("include_deletes", "")).lower() == "true"
        keep = [
            f
            for f in full.fields
            if not _is_internal_name(f.name)
            or (include_deletes and f.name == INTERNAL_DELETED)
        ]
        return T.StructType(keep)

    def simpleStreamReader(self, schema: T.StructType):
        return _ChangesStreamReader(schema, self.options)


class _ChangesStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, schema: T.StructType, options) -> None:
        self.table_dir = options["table_dir"]
        self.from_snapshot = options.get("from_snapshot")
        self.consumer = options.get("consumer")
        self.include_deletes = (
            str(options.get("include_deletes", "")).lower() == "true"
        )
        self.fields = [f.name for f in schema.fields]

    def _sink(self) -> LocalSnapshotSink:
        # cheap: metadata-only construction (the table already exists)
        return LocalSnapshotSink(self.table_dir)

    # ---- offsets are snapshot ids -------------------------------------
    def initialOffset(self) -> dict:
        # only consulted on a FRESH checkpoint; precedence: explicit
        # option, then the durable cursor, then the current head
        sink = self._sink()
        sid = self.from_snapshot
        if sid is None and self.consumer:
            sid = sink.consumer_cursor(self.consumer)
        sid = sid or sink.current_snapshot_id
        if self.consumer:
            # pin retention NOW: without this, history between the start
            # offset and the first commit() could expire mid-first-epoch
            sink.advance_consumer(self.consumer, sid, force=True)
        return {"snapshot": sid}

    def read(self, start: dict) -> tuple[list[tuple], dict]:
        sink = self._sink()
        if self.consumer:
            # `start` is durable progress by construction: everything
            # before it is either committed downstream or carried in
            # Spark's own checkpoint (the simple-reader prefetch cache),
            # so the table no longer needs to serve it.  Advancing here
            # (not just in commit()) keeps the cursor honest even under
            # the availableNow single-batch fallback, where the final
            # commit() can race query shutdown.
            try:
                sink.advance_consumer(self.consumer, start["snapshot"], force=True)
            except FileNotFoundError:
                pass  # start already expired: _rows_between raises the loud error
        cur = sink.current_snapshot_id
        if cur == start["snapshot"]:
            return [], start
        rows = self._rows_between(sink, start["snapshot"], cur)
        return rows, {"snapshot": cur}

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
        # replay of a checkpointed-but-unprocessed batch after restart
        return self._rows_between(self._sink(), start["snapshot"], end["snapshot"])

    def commit(self, end: dict) -> None:
        # offsets themselves are immutable snapshot ids (nothing to
        # release), but a named consumer advances its durable cursor here
        # so table-side retention tracks what this subscription has
        # actually finished.  force=True: Spark may replay commit() for
        # an epoch the cursor already passed (restart races), and a
        # no-op/backward stamp must not kill the stream.
        if self.consumer:
            try:
                self._sink().advance_consumer(
                    self.consumer, end["snapshot"], force=True
                )
            except FileNotFoundError:
                # a replayed commit() for an epoch so old its manifest is
                # gone: the cursor is already past it; never kill the
                # stream over a bookkeeping stamp
                pass

    # ---- driver-side row production over the range's change files -----
    # Returns a LIST: Spark pickles the prefetched batch for replay-after
    # -restart, and generators cannot pickle.  Change batches are O(batch)
    # by construction, so materializing them driver-side is the same cost
    # shape foreachBatch already pays.
    def _rows_between(self, sink, from_sid: str, to_sid: str) -> list[tuple]:
        import pyarrow as pa
        import pyarrow.parquet as pq

        files, _buckets, _tss = sink._added_change_files(from_sid, to_sid)
        out: list[tuple] = []
        for path in sorted(set(files)):
            if not os.path.exists(path):  # expired under us mid-iteration
                continue
            table = pq.read_table(path)
            # Spark's TimestampType wants tz-aware datetimes; files may
            # carry tz-naive instants (session-UTC by engine convention)
            for idx, f in enumerate(table.schema):
                if pa.types.is_timestamp(f.type) and f.type.tz is None:
                    table = table.set_column(
                        idx, f.name,
                        table.column(idx).cast(pa.timestamp(f.type.unit, tz="UTC")),
                    )
            cols = set(table.column_names)
            deleted = (
                table.column(INTERNAL_DELETED).to_pylist()
                if INTERNAL_DELETED in cols
                else [False] * table.num_rows
            )
            data = {
                name: (
                    table.column(name).to_pylist()
                    if name in cols
                    else [None] * table.num_rows
                )
                for name in self.fields
            }
            for i in range(table.num_rows):
                if deleted[i] and not self.include_deletes:
                    continue
                out.append(tuple(data[name][i] for name in self.fields))
        return out


def offsets_json(offset: dict) -> str:  # pragma: no cover - debugging aid
    return json.dumps(offset)
