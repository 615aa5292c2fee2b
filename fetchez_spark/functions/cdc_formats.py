"""CDC wire-format adapters: Debezium, Maxwell and Canal change envelopes
-> the engine's change-event rows.

The engine's native log is parquet rows already in ``CHANGE_EVENT_SCHEMA``
shape; real binlog/WAL tails usually arrive as the Debezium envelope
(https://debezium.io/documentation — the de-facto public CDC wire format):

    {"before": {...}|null, "after": {...}|null,
     "op": "c"|"u"|"d"|"r", "ts_ms": 1699999999999,
     "source": {"partition": 3, ...}}

:func:`from_debezium` maps that envelope to engine rows with pure codegen
expressions (CASE/COALESCE over struct fields — no Python UDF, no shuffle),
so it slots into ``run_stream(transforms=[...])`` as an ordinary row-level
transform and the JSON-lines tail becomes a first-class source via
``run_stream(log_format="json", schema=debezium_envelope_schema(...))``.

Mapping rules (each only when the payload doesn't already carry the
column — a payload owning ``ts``/``seq``/``src_partition`` wins):

* ``op``: ``d`` -> ``'D'``; ``c``/``u``/``r`` (snapshot read) -> ``'U'``
  (the engine's merge is an upsert, so create/update/read collapse);
* payload columns: ``before`` for deletes (the last row image), ``after``
  otherwise;
* ``ts``: the payload's own event time if present, else
  ``timestamp_millis(ts_ms)``;
* ``seq``: ``ts_ms`` (the binlog position proxy — monotone per source);
* ``src_partition``: ``source.partition`` if the envelope carries it,
  else a hash of the leading payload column.

(Reference analog: fetchez normalizes each module's entry dict to the
three mandatory keys + extras, /root/reference/src/fetchez/core.py:999-1002;
here the normalization is a declarative column mapping.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fetchez_spark.functions.epoch import epoch_ms, epoch_s, epoch_us

__all__ = [
    "debezium_envelope_schema",
    "from_debezium",
    "to_debezium",
    "maxwell_envelope_schema",
    "from_maxwell",
    "to_maxwell",
    "canal_envelope_schema",
    "from_canal",
    "dms_envelope_schema",
    "from_dms",
    "connect_envelope_schema",
    "unwrap_connect",
]


def debezium_envelope_schema(payload_schema: T.StructType) -> T.StructType:
    """The envelope StructType for a given payload row shape — pass as the
    explicit ``schema`` of a ``run_stream(log_format='json')`` tail (file
    streams cannot infer schema reliably; timestamps inside the payload
    parse from ISO strings under this schema)."""
    nullable = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in payload_schema.fields]
    )
    return T.StructType(
        [
            T.StructField("before", nullable, True),
            T.StructField("after", nullable, True),
            T.StructField("op", T.StringType(), False),
            T.StructField("ts_ms", T.LongType(), False),
            T.StructField(
                "source",
                T.StructType(
                    [
                        T.StructField("name", T.StringType(), True),
                        T.StructField("partition", T.IntegerType(), True),
                    ]
                ),
                True,
            ),
        ]
    )


def from_debezium(df: DataFrame, partitions: int = 4) -> DataFrame:
    """Decode a Debezium-enveloped frame into engine change-event rows.
    Pure codegen (struct field selection + CASE), row-local — usable both
    as a batch transform and inside a streaming ``foreachBatch`` chain."""
    after_t = df.schema["after"].dataType
    if not isinstance(after_t, T.StructType):
        raise TypeError(f"'after' must be a struct payload; got {after_t}")
    fields = [f.name for f in after_t.fields]
    is_del = F.col("op") == F.lit("d")
    payload = F.when(is_del, F.col("before")).otherwise(F.col("after"))
    cols = [F.when(is_del, F.lit("D")).otherwise(F.lit("U")).alias("op")]
    cols += [payload.getField(f).alias(f) for f in fields]
    if "ts" not in fields:
        cols.append(F.timestamp_millis(F.col("ts_ms")).alias("ts"))
    if "seq" not in fields:
        cols.append(F.col("ts_ms").cast("long").alias("seq"))
    if "src_partition" not in fields:
        fallback = F.pmod(
            F.xxhash64(payload.getField(fields[0])), F.lit(partitions)
        ).cast("int")
        part = (
            F.coalesce(F.col("source.partition"), fallback)
            if "source" in df.columns
            else fallback
        )
        cols.append(part.alias("src_partition"))
    return df.select(*cols)


def to_debezium(feed: DataFrame, source_name: str | None = None) -> DataFrame:
    """Encode a typed change feed (``LocalSnapshotSink.change_feed`` shape:
    payload columns + ``_change_type`` + optional ``_pre_image``) as
    Debezium envelopes — the outbound half of the wire format, for
    publishing a table's CDC feed to downstream consumers.

    * ``insert``/``update``/``delete`` -> op ``c``/``u``/``d``;
    * ``after``: the post-image payload (NULL for deletes);
    * ``before``: the ``_pre_image`` when the feed carries one (key
      columns — identical pre/post by construction — are filled from the
      row); without pre-images, deletes carry their tombstone payload as
      ``before`` and inserts/updates leave it NULL;
    * ``ts_ms``: epoch millis of the post-image ``ts`` (NTZ-safe:
      :func:`fetchez_spark.functions.epoch.epoch_ms`).

    Pure codegen; ``from_debezium(to_debezium(feed))`` recovers the same
    row images.
    """
    payload_fields = [
        c for c in feed.columns if c not in ("_change_type", "_pre_image")
    ]
    after_payload = F.struct(*[F.col(c) for c in payload_fields])
    is_del = F.col("_change_type") == F.lit("delete")
    if "_pre_image" in feed.columns:
        pre_t = feed.schema["_pre_image"].dataType
        pre_fields = {f.name for f in pre_t.fields}
        before_payload = F.struct(
            *[
                (
                    F.col("_pre_image").getField(c)
                    if c in pre_fields
                    else F.col(c)  # key columns: identical pre/post
                ).alias(c)
                for c in payload_fields
            ]
        )
        before = F.when(F.col("_pre_image").isNotNull(), before_payload)
    else:
        before = F.when(is_del, after_payload)
    op = (
        F.when(is_del, F.lit("d"))
        .when(F.col("_change_type") == F.lit("update"), F.lit("u"))
        .otherwise(F.lit("c"))
    )
    cols = [
        before.alias("before"),
        F.when(~is_del, after_payload).alias("after"),
        op.alias("op"),
        (
            epoch_ms(feed, "ts")
            if "ts" in payload_fields
            else F.lit(None).cast("long")
        ).alias("ts_ms"),
    ]
    if source_name is not None:
        cols.append(
            F.struct(
                F.lit(source_name).alias("name"),
                F.lit(None).cast("int").alias("partition"),
            ).alias("source")
        )
    return feed.select(*cols)


# ---------------------------------------------------------------------------
# Maxwell (maxwells-daemon.io) — the Zendesk MySQL binlog JSON format
# ---------------------------------------------------------------------------

def maxwell_envelope_schema(payload_schema: T.StructType) -> T.StructType:
    """The Maxwell JSON envelope for a given payload row shape:

        {"database": "shop", "table": "orders", "type": "insert",
         "ts": 1449786310, "xid": 940752, "xoffset": 3, "commit": true,
         "data": {...full row...}, "old": {...changed columns' priors...}}

    ``ts`` is epoch SECONDS (Maxwell, unlike Debezium's ``ts_ms``); the
    row image — including for deletes — always rides ``data``; ``old``
    carries only the changed columns of an update."""
    nullable = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in payload_schema.fields]
    )
    return T.StructType(
        [
            T.StructField("database", T.StringType(), True),
            T.StructField("table", T.StringType(), True),
            T.StructField("type", T.StringType(), False),
            T.StructField("ts", T.LongType(), False),
            T.StructField("xid", T.LongType(), True),
            T.StructField("xoffset", T.LongType(), True),
            T.StructField("commit", T.BooleanType(), True),
            T.StructField("data", nullable, True),
            T.StructField("old", nullable, True),
        ]
    )


_MAXWELL_ROW_TYPES = ("insert", "update", "delete", "bootstrap-insert")


def from_maxwell(df: DataFrame, partitions: int = 4) -> DataFrame:
    """Decode a Maxwell-enveloped frame into engine change-event rows.
    Pure codegen, row-local (batch transform or ``run_stream`` chain).

    Mapping rules (payload-owned columns win, as in :func:`from_debezium`):

    * ``type``: ``delete`` -> ``'D'``; ``insert``/``update``/
      ``bootstrap-insert`` -> ``'U'``; control rows (``bootstrap-start``/
      ``-complete``, DDL) and null ``data`` are dropped — they carry no
      row image;
    * payload: always ``data`` (Maxwell deletes carry the deleted row in
      ``data``, not in a before-image field);
    * ``ts``: the payload's own event time if present, else
      ``timestamp_seconds(ts)`` (Maxwell stamps SECONDS);
    * ``seq``: ``xid`` (binlog transaction id — monotone per server) when
      the envelope carries it, else ``ts``;
    * ``src_partition``: hash of the leading payload column (the envelope
      has no partition field).
    """
    data_t = df.schema["data"].dataType
    if not isinstance(data_t, T.StructType):
        raise TypeError(f"'data' must be a struct payload; got {data_t}")
    fields = [f.name for f in data_t.fields]
    rows = df.filter(
        F.col("data").isNotNull() & F.col("type").isin(*_MAXWELL_ROW_TYPES)
    )
    is_del = F.col("type") == F.lit("delete")
    payload = F.col("data")
    cols = [F.when(is_del, F.lit("D")).otherwise(F.lit("U")).alias("op")]
    cols += [payload.getField(f).alias(f) for f in fields]
    if "ts" not in fields:
        cols.append(F.timestamp_seconds(F.col("ts")).alias("ts"))
    if "seq" not in fields:
        seq = (
            F.coalesce(F.col("xid"), F.col("ts"))
            if "xid" in df.columns
            else F.col("ts")
        )
        cols.append(seq.cast("long").alias("seq"))
    if "src_partition" not in fields:
        cols.append(
            F.pmod(F.xxhash64(payload.getField(fields[0])), F.lit(partitions))
            .cast("int")
            .alias("src_partition")
        )
    return rows.select(*cols)


def to_maxwell(
    feed: DataFrame, database: str | None = None, table: str | None = None
) -> DataFrame:
    """Encode a typed change feed (``change_feed`` shape) as Maxwell
    envelopes — the outbound half.  ``data`` carries the row image — for
    deletes that is the DELETED row (the pre-image when the feed has one,
    the tombstone payload otherwise), per the wire format; ``old`` carries
    ONLY the changed columns of an update (unchanged columns are NULL in
    the struct, which ``to_json`` drops, matching Maxwell's omit-unchanged
    JSON); ``ts`` is epoch seconds.  ``from_maxwell(to_maxwell(feed))``
    recovers the same row images."""
    payload_fields = [
        c for c in feed.columns if c not in ("_change_type", "_pre_image")
    ]
    data = F.struct(*[F.col(c) for c in payload_fields])
    is_upd = F.col("_change_type") == F.lit("update")
    is_del = F.col("_change_type") == F.lit("delete")
    old = F.lit(None)
    if "_pre_image" in feed.columns:
        pre_t = feed.schema["_pre_image"].dataType
        pre_fields = {f.name for f in pre_t.fields}
        pre_image = F.struct(
            *[
                (
                    F.col("_pre_image").getField(c)
                    if c in pre_fields
                    else F.col(c)  # key columns: identical pre/post
                ).alias(c)
                for c in payload_fields
            ]
        )
        data = F.when(is_del & F.col("_pre_image").isNotNull(), pre_image).otherwise(
            data
        )
        changed = F.struct(
            *[
                (
                    F.when(
                        ~F.col("_pre_image").getField(c).eqNullSafe(F.col(c)),
                        F.col("_pre_image").getField(c),
                    )
                    if c in pre_fields
                    else F.lit(None).cast(feed.schema[c].dataType)
                ).alias(c)
                for c in payload_fields
            ]
        )
        old = F.when(is_upd & F.col("_pre_image").isNotNull(), changed)
    op = (
        F.when(F.col("_change_type") == F.lit("delete"), F.lit("delete"))
        .when(is_upd, F.lit("update"))
        .otherwise(F.lit("insert"))
    )
    cols = [
        F.lit(database).cast("string").alias("database"),
        F.lit(table).cast("string").alias("table"),
        op.alias("type"),
        (
            epoch_s(feed, "ts")
            if "ts" in payload_fields
            else F.lit(None).cast("long")
        ).alias("ts"),
        data.alias("data"),
        old.alias("old"),
    ]
    return feed.select(*cols)


# ---------------------------------------------------------------------------
# Canal (github.com/alibaba/canal) — the Alibaba MySQL binlog flat message
# ---------------------------------------------------------------------------

def canal_envelope_schema() -> T.StructType:
    """The Canal *flat message* JSON envelope (the canal-adapter MQ shape):

        {"data": [{"id": "1", ...}], "old": [{"value": "9.5"}],
         "database": "db", "table": "t", "type": "UPDATE",
         "isDdl": false, "es": 1589373515000, "ts": 1589373515477,
         "id": 3, "pkNames": ["id"], "sql": "",
         "mysqlType": {...}, "sqlType": {...}}

    Flat messages STRING-type every cell and batch MULTIPLE rows per
    envelope in the ``data`` array, so this schema is payload-independent:
    pass the real payload shape to :func:`from_canal` for the casts."""
    m = T.MapType(T.StringType(), T.StringType())
    return T.StructType(
        [
            T.StructField("data", T.ArrayType(m), True),
            T.StructField("old", T.ArrayType(m), True),
            T.StructField("database", T.StringType(), True),
            T.StructField("table", T.StringType(), True),
            T.StructField("type", T.StringType(), False),
            T.StructField("isDdl", T.BooleanType(), True),
            T.StructField("es", T.LongType(), False),
            T.StructField("ts", T.LongType(), True),
            T.StructField("id", T.LongType(), True),
            T.StructField("pkNames", T.ArrayType(T.StringType()), True),
            T.StructField("sql", T.StringType(), True),
            T.StructField("mysqlType", m, True),
            T.StructField("sqlType", m, True),
        ]
    )


def from_canal(
    df: DataFrame, payload_schema: T.StructType, partitions: int = 4
) -> DataFrame:
    """Decode Canal flat messages into engine change-event rows.  Pure
    codegen: one ``posexplode`` over the per-message row array (row-local,
    no shuffle), then per-column casts from the all-strings cells.

    Mapping rules:

    * ``type``: ``DELETE`` -> ``'D'``; ``INSERT``/``UPDATE`` -> ``'U'``;
      DDL messages (``isDdl``) and null ``data`` are dropped;
    * payload: each ``data[i]`` map, cast cell-by-cell to
      ``payload_schema`` (Canal deletes carry the deleted row in ``data``);
    * ``ts``: the payload's own event time if present (string-cast), else
      ``timestamp_millis(es)`` (``es`` is the source binlog event time;
      ``ts`` on the envelope is canal's processing time);
    * ``seq``: ``id * 65536 + pos`` — the canal batch id orders messages
      per instance, ``pos`` orders rows within a message's array — unless
      the payload carries ``seq``;
    * ``src_partition``: hash of the leading payload column.
    """
    fields = [f.name for f in payload_schema.fields]
    rows = df.filter(
        F.col("data").isNotNull()
        & ~F.coalesce(F.col("isDdl"), F.lit(False))
        & F.upper(F.col("type")).isin("INSERT", "UPDATE", "DELETE")
    ).select("*", F.posexplode("data").alias("pos", "_row"))
    is_del = F.upper(F.col("type")) == F.lit("DELETE")
    cols = [F.when(is_del, F.lit("D")).otherwise(F.lit("U")).alias("op")]
    cols += [
        F.element_at(F.col("_row"), f.name).cast(f.dataType).alias(f.name)
        for f in payload_schema.fields
    ]
    if "ts" not in fields:
        cols.append(F.timestamp_millis(F.col("es")).alias("ts"))
    if "seq" not in fields:
        cols.append(
            (F.coalesce(F.col("id"), F.lit(0)) * F.lit(65536) + F.col("pos"))
            .cast("long")
            .alias("seq")
        )
    if "src_partition" not in fields:
        cols.append(
            F.pmod(
                F.xxhash64(F.element_at(F.col("_row"), fields[0])),
                F.lit(partitions),
            )
            .cast("int")
            .alias("src_partition")
        )
    return rows.select(*cols)


# ---------------------------------------------------------------------------
# AWS DMS (S3/Kinesis target JSON) -- the managed-migration envelope
# ---------------------------------------------------------------------------

def dms_envelope_schema(payload_schema: T.StructType) -> T.StructType:
    """The AWS DMS JSON envelope for a given payload row shape (the
    documented S3/Kinesis target record format):

        {"data": {...full row image...},
         "metadata": {"timestamp": "2023-05-03T12:34:56.123456Z",
                      "record-type": "data", "operation": "update",
                      "partition-key-type": "schema-table",
                      "schema-name": "public", "table-name": "events",
                      "transaction-id": 1234}}

    ``operation`` is ``load`` during the full-load phase and
    ``insert``/``update``/``delete`` during CDC; ``record-type`` is
    ``control`` for DDL/checkpoint records (no row image)."""
    nullable = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in payload_schema.fields]
    )
    return T.StructType(
        [
            T.StructField("data", nullable, True),
            T.StructField(
                "metadata",
                T.StructType(
                    [
                        T.StructField("timestamp", T.StringType(), True),
                        T.StructField("record-type", T.StringType(), True),
                        T.StructField("operation", T.StringType(), True),
                        T.StructField("partition-key-type", T.StringType(), True),
                        T.StructField("schema-name", T.StringType(), True),
                        T.StructField("table-name", T.StringType(), True),
                        T.StructField("transaction-id", T.LongType(), True),
                    ]
                ),
                True,
            ),
        ]
    )


def from_dms(df: DataFrame, partitions: int = 4) -> DataFrame:
    """Decode an AWS-DMS-enveloped frame into engine change-event rows.
    Pure codegen, row-local (batch transform or ``run_stream`` chain).

    Mapping rules (payload-owned columns win, as in :func:`from_debezium`):

    * ``operation``: ``delete`` -> ``'D'``; ``load`` (full-load phase) /
      ``insert`` / ``update`` -> ``'U'`` (the merge is an upsert, so the
      snapshot phase collapses like Debezium's ``r``); ``control``
      records and null ``data`` are dropped -- no row image;
    * payload: always ``data`` (DMS deletes carry the key image there);
    * ``ts``: the payload's own event time if present, else the metadata
      ``timestamp`` (ISO-8601 with fractional seconds, parsed);
    * ``seq``: ``transaction-id`` when present, else the metadata
      timestamp in microseconds;
    * ``src_partition``: hash of the leading payload column (the
      envelope partitions by schema-table, not by a numeric id).
    """
    data_t = df.schema["data"].dataType
    if not isinstance(data_t, T.StructType):
        raise TypeError(f"'data' must be a struct payload; got {data_t}")
    fields = [f.name for f in data_t.fields]
    meta = F.col("metadata")
    rows = df.filter(
        F.col("data").isNotNull()
        & (
            F.coalesce(meta.getField("record-type"), F.lit("data"))
            == F.lit("data")
        )
        & F.lower(F.coalesce(meta.getField("operation"), F.lit(""))).isin(
            "load", "insert", "update", "delete"
        )
    )
    is_del = F.lower(meta.getField("operation")) == F.lit("delete")
    payload = F.col("data")
    meta_ts = F.to_timestamp(meta.getField("timestamp"))
    cols = [F.when(is_del, F.lit("D")).otherwise(F.lit("U")).alias("op")]
    cols += [payload.getField(f).alias(f) for f in fields]
    if "ts" not in fields:
        cols.append(meta_ts.alias("ts"))
    if "seq" not in fields:
        cols.append(
            F.coalesce(
                meta.getField("transaction-id"), epoch_us(rows, meta_ts)
            )
            .cast("long")
            .alias("seq")
        )
    if "src_partition" not in fields:
        cols.append(
            F.pmod(F.xxhash64(payload.getField(fields[0])), F.lit(partitions))
            .cast("int")
            .alias("src_partition")
        )
    return rows.select(*cols)


# ---------------------------------------------------------------------------
# Kafka Connect JSON converter wrapper (schemas.enable=true)
# ---------------------------------------------------------------------------

def connect_envelope_schema(inner_schema: T.StructType) -> T.StructType:
    """The Kafka Connect ``JsonConverter`` wrapper (``schemas.enable``
    defaults to true): every record value arrives as

        {"schema": {"type": "struct", "fields": [...],
                    "optional": false, "name": "..."},
         "payload": {...the actual envelope...}}

    -- which is how Debezium/Maxwell streams usually look ON THE WIRE.
    ``inner_schema`` is the payload's shape (e.g.
    :func:`debezium_envelope_schema` of the row schema).  The ``schema``
    descriptor is typed minimally (Spark ignores JSON keys absent from an
    explicit schema, so the recursive ``fields`` array costs nothing);
    dynamic typing from it is deliberately NOT attempted -- a text tail
    needs a declared schema anyway (inference would corrupt the (ts,seq)
    LWW order, the same rule as ``run_stream(log_format='json')``)."""
    return T.StructType(
        [
            T.StructField(
                "schema",
                T.StructType(
                    [
                        T.StructField("type", T.StringType(), True),
                        T.StructField("name", T.StringType(), True),
                        T.StructField("optional", T.BooleanType(), True),
                    ]
                ),
                True,
            ),
            T.StructField("payload", inner_schema, True),
        ]
    )


def unwrap_connect(df: DataFrame, expect_name: str | None = None) -> DataFrame:
    """Strip the Connect wrapper: project ``payload.*`` (pure codegen,
    struct-field projection -- composes as
    ``from_debezium(unwrap_connect(df))``).  Rows with a null payload
    (Kafka tombstone records, which carry key-only deletion markers for
    log compaction, not row images) are dropped.  With ``expect_name``,
    rows whose ``schema.name`` differs are dropped too -- the multi-topic
    guard for a stream carrying several record types."""
    if "payload" not in df.columns:
        raise TypeError(
            f"no 'payload' column to unwrap (columns: {df.columns}); "
            "parse with connect_envelope_schema(...) first"
        )
    rows = df.filter(F.col("payload").isNotNull())
    if expect_name is not None:
        if "schema" not in df.columns:
            raise TypeError(
                "expect_name needs the 'schema' descriptor column "
                f"(columns: {df.columns}); a frame without it cannot "
                "honor the multi-topic guard"
            )
        rows = rows.filter(
            F.col("schema").getField("name") == F.lit(expect_name)
        )
    return rows.select("payload.*")
