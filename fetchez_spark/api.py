"""One-call Python API -- the ``fetchez.get()`` facade reimagined.

Reference: ``api.get(module, region=..., hooks=[...], **kwargs)`` resolves
registries, builds the module, runs the engine, returns results
(/root/reference/src/fetchez/api.py:55-125), plus ``api.search(term)``
(api.py:35-52).  Here:

* :func:`ingest` -- one bounded replay of a source into a sink, returning
  per-batch commit metrics.
* :func:`tail` -- start the streaming query (caller owns the handle).
* :func:`search` -- registry full-text search across sources/sinks/
  transforms.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession

from fetchez_spark import registry as _registry
from fetchez_spark.selection import Selection
from fetchez_spark.streaming.engine import replay_batches, run_stream
from fetchez_spark.streaming.lineage import LineageLog
from fetchez_spark.transforms import build_chain


def _build(source, sink, spark):
    if isinstance(source, dict):
        source = _registry.make_source(source["name"], **source.get("args", {}))
    if isinstance(sink, dict):
        sink = _registry.make_sink(sink["name"], **sink.get("args", {}))
    return source, sink


def ingest(
    spark: SparkSession,
    source,
    sink,
    transforms: list | None = None,
    selection: str | Selection | None = None,
    lineage_dir: str | None = None,
    token_prefix: str = "replay",
) -> list[dict[str, Any]]:
    """Bounded replay of everything currently in ``source`` into ``sink``.

    ``source``/``sink`` may be instances or ``{"name": ..., "args": {...}}``
    registry specs; ``transforms`` a chain spec (see transforms.build_chain);
    ``selection`` a Selection or its string form.  Idempotent on re-run
    (committed batch tokens skip).  Returns per-batch commit metrics.
    """
    source, sink = _build(source, sink, spark)
    if isinstance(selection, str):
        selection = Selection.parse(selection)
    chain = build_chain(transforms or []) if not callable(transforms) else [transforms]
    if selection is not None:
        # the replay path reads batch files directly (not source.read()),
        # so the selection rides the transform chain; the predicate still
        # pushes down to the scan because it's the first op on the batch
        source.selection = selection
        pred = selection.predicate()
        chain = [lambda df: df.filter(pred)] + chain
    lineage = LineageLog(lineage_dir) if lineage_dir else None
    return replay_batches(
        spark, source.batches(spark), sink,
        lineage=lineage, transforms=chain, token_prefix=token_prefix,
    )


def tail(
    spark: SparkSession,
    source,
    sink,
    checkpoint_dir: str,
    transforms: list | None = None,
    lineage_dir: str | None = None,
    available_now: bool = False,
    token_prefix: str | None = None,
):
    """Tail the source continuously (or drain it once with
    ``available_now=True``); returns the StreamingQuery.

    N tails into ONE sink table are safe by default: ``token_prefix``
    defaults to a stable hash of the checkpoint dir (always distinct per
    query), so batch tokens are namespaced per stream and the sink's
    commit protocol interleaves the commits safely (see
    streaming/engine.py:run_stream)."""
    source, sink = _build(source, sink, spark)
    return run_stream(
        spark,
        source.log_dir,
        sink,
        checkpoint_dir=checkpoint_dir,
        schema=getattr(source, "schema", None),
        max_files_per_trigger=getattr(source, "max_files_per_trigger", 4),
        lineage=LineageLog(lineage_dir) if lineage_dir else None,
        transforms=build_chain(transforms or []),
        available_now=available_now,
        token_prefix=token_prefix,
    )


def search(term: str) -> list[dict[str, Any]]:
    from fetchez_spark.transforms import search_transforms

    out = [
        {"name": s.name, "kind": "source/sink", "desc": s.desc}
        for s in _registry.search(term)
    ]
    out += [
        {"name": t.name, "kind": f"transform/{t.stage}", "desc": t.desc}
        for t in search_transforms(term)
    ]
    return out


def snapshots(
    table_dir: str,
    eq: dict[str, Any] | None = None,
    ranges: dict[str, tuple[Any, Any]] | None = None,
) -> list[dict[str, Any]]:
    """Catalog search over a table's snapshot metadata (the FRED ``search``
    analog, fred.py:153-221): equality + range filters over snapshot id,
    file counts, row stats, and watermark."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    return LocalSnapshotSink(table_dir).search(eq=eq, ranges=ranges)


def ingest_index(
    table_dir: str,
    source_file: str,
    field_map: dict[str, str] | None = None,
    wipe: bool = False,
) -> dict[str, Any]:
    """Import an external CSV/JSON inventory into a table's catalog (the
    FRED ``ingest`` analog, fred.py:256-356); records become searchable
    via :func:`search_index`."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    return LocalSnapshotSink(table_dir).ingest_index(
        source_file, field_map=field_map, wipe=wipe
    )


def search_index(
    table_dir: str,
    eq: dict[str, Any] | None = None,
    ranges: dict[str, tuple[Any, Any]] | None = None,
) -> list[dict[str, Any]]:
    """Attribute search over a table's ingested catalog index records."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    return LocalSnapshotSink(table_dir).search_index(eq=eq, ranges=ranges)


def changes(
    spark: SparkSession,
    table_dir: str,
    from_snapshot: str,
    to_snapshot: str | None = None,
    include_internal: bool = False,
    ts_min=None,
    ts_max=None,
):
    """Incremental scan facade: rows merged after ``from_snapshot`` (see
    LocalSnapshotSink.read_changes -- the Iceberg incremental-read analog).
    ``ts_min``/``ts_max`` restrict to an event-time window with
    footer-stats file skipping."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    return LocalSnapshotSink(table_dir).read_changes(
        spark,
        from_snapshot,
        to_snapshot,
        include_internal=include_internal,
        ts_min=ts_min,
        ts_max=ts_max,
    )


def change_feed(
    spark: SparkSession,
    table_dir: str,
    from_snapshot: str,
    to_snapshot: str | None = None,
    include_pre_image: bool = False,
):
    """Typed change-data-feed facade: net insert/update/delete per key
    over the range (see LocalSnapshotSink.change_feed -- the
    Iceberg/Delta CDF analog)."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    return LocalSnapshotSink(table_dir).change_feed(
        spark, from_snapshot, to_snapshot, include_pre_image=include_pre_image
    )


def delete_where(spark: SparkSession, table_dir: str, condition) -> dict[str, Any]:
    """Predicate-delete facade (GDPR erasure step 1): tombstone every
    visible key whose winner row matches ``condition`` in one merge
    commit (see LocalSnapshotSink.delete_where)."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    return LocalSnapshotSink(table_dir).delete_where(spark, condition)


def update_where(
    spark: SparkSession, table_dir: str, condition, set: dict[str, Any]
) -> dict[str, Any]:
    """Predicate-update facade: patch every visible key whose winner row
    matches ``condition`` with the ``set`` assignments ({col: SQL expr})
    in one merge commit (see LocalSnapshotSink.update_where)."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    return LocalSnapshotSink(table_dir).update_where(spark, condition, set)


def merge_into(
    spark: SparkSession,
    table_dir: str,
    source,
    on=None,
    when_matched_update=None,
    when_matched_delete=None,
    when_not_matched_insert=None,
    when_not_matched_by_source_update=None,
    when_not_matched_by_source_delete=None,
) -> dict[str, Any]:
    """General MERGE INTO facade (the Delta/Iceberg analog): matched
    deletes, matched updates over ``s.``/``t.`` expressions, not-matched
    inserts, and NOT MATCHED BY SOURCE delete/update over ``t.``
    (full-snapshot sync) -- all in one change-event commit (see
    LocalSnapshotSink.merge_into)."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    return LocalSnapshotSink(table_dir).merge_into(
        spark,
        source,
        on=on,
        when_matched_update=when_matched_update,
        when_matched_delete=when_matched_delete,
        when_not_matched_insert=when_not_matched_insert,
        when_not_matched_by_source_update=when_not_matched_by_source_update,
        when_not_matched_by_source_delete=when_not_matched_by_source_delete,
    )


def import_files(
    spark: SparkSession,
    table_dir: str,
    paths,
    batch_token: str | None = None,
    validate: bool = True,
    incremental: bool = False,
    collect_stats: bool = False,
) -> dict[str, Any]:
    """Zero-copy onboarding of existing parquet files (the Iceberg
    ``add_files`` analog): register them as flat delta files in one
    metadata commit -- no rewrite, no copy.  ``incremental=True`` is the
    drop-folder tail (only never-imported files register);
    ``collect_stats=True`` records per-file key ranges so point lookups
    prune imported files (see LocalSnapshotSink.import_files)."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    return LocalSnapshotSink(table_dir).import_files(
        spark,
        paths,
        batch_token=batch_token,
        validate=validate,
        incremental=incremental,
        collect_stats=collect_stats,
    )


def purge_tombstones(spark: SparkSession, table_dir: str, before=None) -> dict[str, Any]:
    """Physical tombstone GC facade (GDPR erasure step 2): rewrite only
    the buckets whose parquet footer stats admit a tombstone older than
    ``before`` (see LocalSnapshotSink.purge_tombstones)."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    return LocalSnapshotSink(table_dir).purge_tombstones(spark, before=before)


def rename_column(table_dir: str, old: str, new: str) -> dict[str, Any]:
    """Metadata-only column rename (zero data movement; see
    LocalSnapshotSink.rename_column)."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    return LocalSnapshotSink(table_dir).rename_column(old, new)


def drop_column(table_dir: str, name: str) -> dict[str, Any]:
    """Metadata-only column drop (bytes leave as buckets compact; see
    LocalSnapshotSink.drop_column)."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    return LocalSnapshotSink(table_dir).drop_column(name)


def read_quarantine(spark: SparkSession, table_dir: str):
    """Rows quarantined by write-time expectations, with ``_violations``
    and ``_batch_token`` (see LocalSnapshotSink.read_quarantine)."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    return LocalSnapshotSink(table_dir).read_quarantine(spark)


def requeue_quarantine(
    spark: SparkSession, table_dir: str, transform=None
) -> dict[str, Any]:
    """Dead-letter replay: re-submit quarantined rows through the merge
    with today's gates, optionally after ``transform(df) -> df`` repairs
    them (see LocalSnapshotSink.requeue_quarantine)."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    return LocalSnapshotSink(table_dir).requeue_quarantine(
        spark, transform=transform
    )


def count_rows(
    table_dir: str,
    spark: SparkSession | None = None,
    snapshot_id: str | None = None,
) -> int:
    """Live row count, metadata-only where possible (see
    LocalSnapshotSink.count_rows): a fully compacted table answers from
    manifest statistics with NO Spark job; buckets with pending deltas
    fall back to a bucket-pruned scan (requires ``spark``)."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    return LocalSnapshotSink(table_dir).count_rows(spark, snapshot_id=snapshot_id)


def ts_range(
    table_dir: str,
    spark: SparkSession | None = None,
    snapshot_id: str | None = None,
):
    """Live event-time range (min ts, max ts), footer-statistics-only
    where possible (see LocalSnapshotSink.ts_range): a compacted,
    tombstone-purged table answers from parquet footers with NO Spark
    job; other buckets fall back to a bucket-pruned scan (requires
    ``spark``)."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    return LocalSnapshotSink(table_dir).ts_range(spark, snapshot_id=snapshot_id)


def conversations(
    spark: SparkSession,
    table_dir: str,
    sep: str = "\x1f",
    snapshot_id: str | None = None,
):
    """Conversation-grain view of a replayed transcript table: one row
    per conv_id with ordered turns joined into ``transcript``, ``n_turns``
    and an md5 ``convo_fp`` (functions/conversations.py).  Reads the live
    (or AS-OF) state through the sink, so bucket pruning and tombstone
    filtering apply before the one conv-key aggregate."""
    from fetchez_spark.functions.conversations import assemble_conversations
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    state = LocalSnapshotSink(table_dir).read(spark, snapshot_id=snapshot_id)
    return assemble_conversations(state, sep=sep)


def sessions(
    spark: SparkSession,
    table_dir: str,
    gap_seconds: int = 1800,
    snapshot_id: str | None = None,
):
    """Per-conversation session rollup (gap-based split on ``ts``) over a
    replayed transcript table; one Exchange total."""
    from fetchez_spark.functions.conversations import session_stats
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    state = LocalSnapshotSink(table_dir).read(spark, snapshot_id=snapshot_id)
    return session_stats(
        state, "conv_id", "ts", ("turn_idx",), gap_seconds=gap_seconds
    )


def history(table_dir: str, limit: int | None = None) -> list[dict[str, Any]]:
    """Commit history of a table's current branch, newest first — the
    Iceberg ``$history`` metadata-table analog (snapshot id, parent,
    wall-clock commit stamp, row stats).  Driver-side metadata walk, no
    Spark session needed."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    return LocalSnapshotSink(table_dir).history(limit=limit)


def files(table_dir: str, snapshot: str | None = None) -> list[dict[str, Any]]:
    """One record per data file a snapshot references — the Iceberg
    ``$files`` metadata-table analog (path, kind, bucket, bytes, import
    marker, recorded key/column ranges).  Driver-side from the manifest,
    no Spark session needed."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    return LocalSnapshotSink(table_dir).files(snapshot_id=snapshot)


def snapshot_as_of(table_dir: str, ts) -> str:
    """Resolve a wall-clock timestamp (epoch float, ISO-8601 string, or
    datetime) to the newest snapshot committed at-or-before it — the
    ``TIMESTAMP AS OF`` form of time travel.  Pass the result anywhere a
    ``snapshot_id`` is accepted."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    return LocalSnapshotSink(table_dir).snapshot_as_of(ts)


def clone(
    table_dir: str,
    target_dir: str,
    ref: str | None = None,
    tag_name: str | None = None,
) -> dict[str, Any]:
    """Zero-copy clone of a table (Delta SHALLOW CLONE analog): a new
    independently-writable table at ``target_dir`` referencing the
    source's data files, pinned against source expiry by an engine tag.
    Metadata-only — no Spark session, no data movement.  See
    :meth:`LocalSnapshotSink.clone_to`."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    c = LocalSnapshotSink(table_dir).clone_to(target_dir, ref=ref, tag_name=tag_name)
    return dict(c.manifest()["cloned_from"], target_dir=target_dir)


def scd2_view(
    store_dir: str,
    table_dir: str | None = None,
    attrs: list[str] | None = None,
    num_buckets: int = 16,
):
    """Incrementally-maintained SCD Type-2 dimension view: with
    ``table_dir``, define (or re-open) the view over that table; without
    it, reconstruct from the store's persisted definition.  Call
    ``.refresh(spark)`` per advance, read with ``.history(spark)`` /
    ``.current(spark)`` / ``.lookup(spark, key)``.  See
    :class:`fetchez_spark.operators.scd_view.SCD2View`."""
    from fetchez_spark.operators.scd_view import SCD2View
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    if table_dir is None:
        return SCD2View.load(store_dir)
    return SCD2View(
        store_dir, LocalSnapshotSink(table_dir), attrs=attrs, num_buckets=num_buckets
    )


def vector_index_view(
    store_dir: str,
    table_dir: str | None = None,
    index=None,
    vec_col: str | None = None,
    num_buckets: int = 16,
):
    """Incrementally-maintained IVF vector index: with ``table_dir`` (and
    a fitted :class:`~fetchez_spark.functions.similarity.IVFIndex` on
    first build), define or re-open the view over that table; without it,
    reconstruct from the store's persisted definition.  Call
    ``.refresh(spark)`` per advance, probe with ``.search(spark,
    query_vec, k, nprobe)``.  See
    :class:`fetchez_spark.operators.vector_index.VectorIndexView`."""
    from fetchez_spark.operators.vector_index import VectorIndexView
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    if table_dir is None:
        return VectorIndexView.load(store_dir)
    return VectorIndexView(
        store_dir,
        LocalSnapshotSink(table_dir),
        index=index,
        vec_col=vec_col,
        num_buckets=num_buckets,
    )


def parquet_export(
    export_dir: str,
    table_dir: str | None = None,
    keep_versions: int = 2,
    delta_log: bool = False,
    parquet_codec: str | None = None,
):
    """Incrementally-maintained PLAIN-PARQUET serving copy of a table's
    live state (the Delta symlink-manifest analog for engine-less
    consumers): with ``table_dir``, define (or re-open) the export over
    that table; without it, reconstruct from the export dir's persisted
    definition.  Call ``.refresh(spark)`` per advance; consumers glob
    ``<export_dir>/current/*/*.parquet`` or read the files named in
    ``manifest-current.txt``.  See
    :class:`fetchez_spark.operators.export_view.ParquetExportView`."""
    from fetchez_spark.operators.export_view import ParquetExportView
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    if table_dir is None:
        if delta_log or parquet_codec is not None:
            raise ValueError(
                "re-opening an export adopts its persisted definition; "
                "delta_log/parquet_codec only apply with table_dir "
                "(at creation)"
            )
        return ParquetExportView.load(export_dir, keep_versions=keep_versions)
    return ParquetExportView(
        export_dir, LocalSnapshotSink(table_dir), keep_versions=keep_versions,
        delta_log=delta_log, parquet_codec=parquet_codec,
    )


def change_outbox(
    outbox_dir: str,
    table_dir: str | None = None,
    format: str | None = None,
    source_name: str | None = None,
):
    """Change-data outbox: publish a table's typed change feed as
    wire-format JSON-lines files (Debezium/Maxwell/typed) a downstream
    system tails without the engine.  With ``table_dir``, define (or
    re-open) the outbox; without it, reconstruct from the outbox dir's
    persisted definition.  ``format``/``source_name`` left ``None`` adopt
    the persisted definition (or the ``'debezium'`` default at creation);
    any explicit value that conflicts with a persisted definition is
    refused — including an explicit ``format='debezium'`` against a
    maxwell/typed outbox, which a defaulted parameter could not detect.
    Call ``.refresh(spark)`` per advance or ``.follow(spark)`` to
    daemonize.  See :class:`fetchez_spark.operators.outbox.ChangeOutbox`."""
    from fetchez_spark.operators.outbox import ChangeOutbox
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    if table_dir is None:
        box = ChangeOutbox.load(outbox_dir)
        # a conflicting re-open request must fail like the constructor
        # does, not silently publish the persisted format
        if format is not None and format != box.format:
            raise ValueError(
                f"{outbox_dir} publishes format {box.format!r}; refusing "
                f"the conflicting {format!r}"
            )
        if source_name is not None and source_name != box.source_name:
            raise ValueError(
                f"{outbox_dir} publishes source_name {box.source_name!r}; "
                f"refusing the conflicting {source_name!r}"
            )
        return box
    # the constructor itself treats None as adopt-persisted-or-default,
    # so re-opening a maxwell/typed outbox WITH table_dir and format=None
    # adopts rather than spuriously conflicting with the debezium default
    return ChangeOutbox(
        outbox_dir, LocalSnapshotSink(table_dir), format=format,
        source_name=source_name,
    )


def register_consumer(
    table_dir: str, name: str, from_snapshot: str | None = None
) -> str:
    """Create a durable CDC subscriber cursor (the Kafka consumer-group
    analog): ``expire_snapshots`` retains the history the subscriber
    still needs, ``follow_changes(consumer=name)`` and the
    ``fetchez_changes`` streaming source (option ``consumer``) resume
    from it.  Returns the starting snapshot id.  No Spark session
    needed."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    return LocalSnapshotSink(table_dir).register_consumer(name, from_snapshot)


def advance_consumer(
    table_dir: str, name: str, snapshot_id: str, force: bool = False
) -> str:
    """Move a subscriber cursor forward (refuses rewinds unless
    ``force=True``), releasing retention pins on the history before it."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    return LocalSnapshotSink(table_dir).advance_consumer(
        name, snapshot_id, force=force
    )


def drop_consumer(table_dir: str, name: str) -> None:
    """Forget a subscriber cursor and release its retention pin."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    LocalSnapshotSink(table_dir).drop_consumer(name)


def consumers(table_dir: str) -> dict[str, dict[str, Any]]:
    """Every registered subscriber cursor with its lag:
    ``{name: {"snapshot", "behind", "resumable"}}``."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    sink = LocalSnapshotSink(table_dir)
    return {name: sink.consumer_lag(name) for name in sink.consumers()}


def table_report(table_dir: str) -> dict[str, Any]:
    """Driver-side table health report (per-bucket base/delta bytes and
    file counts, size skew, retained history) plus concrete maintenance
    recommendations — manifest + filesystem metadata only, no Spark job."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    return LocalSnapshotSink(table_dir).table_report()


def fsck(table_dir: str, deep: bool = False) -> dict[str, Any]:
    """Read-only structural integrity check: refs resolve, manifests and
    blobs parse, every referenced data file exists (``deep=True`` also
    opens the head snapshot's parquet footers).  Returns
    ``{"ok", "errors", "warnings", "checked"}``; never mutates the
    table."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    return LocalSnapshotSink(table_dir).fsck(deep=deep)


def auto_maintain(
    table_dir: str,
    spark: SparkSession | None = None,
    keep_last: int | None = None,
    min_age_seconds: float = 3600,
    dry_run: bool = False,
) -> dict[str, Any]:
    """One-button maintenance: run exactly what :func:`table_report`
    recommends (size-aware compaction, tombstone purge) plus the
    always-safe sweeps (orphan vacuum; snapshot expiry when ``keep_last``
    is given).  ``dry_run`` returns the plan without executing."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    return LocalSnapshotSink(table_dir).auto_maintain(
        spark=spark,
        keep_last=keep_last,
        min_age_seconds=min_age_seconds,
        dry_run=dry_run,
    )


def table_properties(table_dir: str) -> dict[str, Any]:
    """The table's recorded properties — the persisted maintenance/
    retention policy (auto-compaction thresholds, sort-on-compact, row
    TTL, tombstone retention) every fresh-session open adopts."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    return LocalSnapshotSink(table_dir).properties()


def set_table_properties(table_dir: str, **props: Any) -> dict[str, Any]:
    """Record table properties in one metadata-only commit (the
    ``ALTER TABLE ... SET TBLPROPERTIES`` analog); ``name=None`` unsets.
    Returns the full recorded map after the change."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    return LocalSnapshotSink(table_dir).set_properties(**props)


def add_expectation(
    table_dir: str, name: str, condition: str, action: str = "fail"
) -> dict[str, Any]:
    """Record a write-time data-quality gate on the TABLE (the Delta
    ``ALTER TABLE ADD CONSTRAINT`` analog): every writer that opens the
    dir enforces it from its next commit on."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    return LocalSnapshotSink(table_dir).add_expectation(name, condition, action)


def drop_expectation(table_dir: str, name: str) -> dict[str, Any]:
    """Remove a recorded write-time expectation (one metadata-only commit)."""
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    return LocalSnapshotSink(table_dir).drop_expectation(name)


def catalog(catalog_dir: str):
    """Open (or bootstrap) a multi-table catalog: versioned name→snapshot
    pins for reproducible multi-table reads and atomic multi-table
    publish.  Returns a :class:`fetchez_spark.catalog.TableCatalog`."""
    from fetchez_spark.catalog import TableCatalog

    return TableCatalog(catalog_dir)
