"""fetchez_spark -- a PySpark-native CDC / incremental-ingest engine.

A from-scratch reimagining of ``continuous-dems/fetchez`` (a fetch-and-apply
download orchestrator) as a change-data-capture engine: tail a binlog/WAL
style change stream of conversation-transcript events and continuously
upsert it into an Iceberg-semantics table via Structured Streaming
``foreachBatch`` MERGE, keyed on (conv_id, turn_idx), with max-(ts, seq)
last-writer-wins dedup, hot-key salting, additive schema evolution,
exactly-once resumable replay, and per-partition lineage/metrics.

Public facade (analog of fetchez's ``api.get`` /
/root/reference/src/fetchez/api.py:55-125):

    from fetchez_spark import get_spark, LocalSnapshotSink, replay, stream

"""

from __future__ import annotations

__version__ = "0.4.0"

from fetchez_spark.changegen import ChangeLogSpec, generate_change_log, write_change_log  # noqa: F401
from fetchez_spark.operators import dedup_latest, detect_hot_keys, merge_into  # noqa: F401
from fetchez_spark.schema import CHANGE_EVENT_SCHEMA, TRANSCRIPT_SCHEMA  # noqa: F401
from fetchez_spark.session import get_spark  # noqa: F401
from fetchez_spark.sinks import LocalSnapshotSink, SnapshotSink  # noqa: F401
from fetchez_spark.streaming import (  # noqa: F401
    LineageLog,
    SchemaEvolvedError,
    read_bad_records,
    replay_batches,
    run_stream,
    run_stream_supervised,
)

# short aliases matching the reference's api surface (get/search)
replay = replay_batches
stream = run_stream
