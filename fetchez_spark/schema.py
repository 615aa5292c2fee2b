"""Core schemas for the CDC/incremental-ingest engine.

The reference (``continuous-dems/fetchez``) uses an open dict-per-entry data
model with three mandatory keys (``/root/reference/src/fetchez/core.py:999-1002``)
plus arbitrary additive extras (``core.py:1128-1137``).  Here that becomes a
fixed core ``StructType`` for the change event (the ``input_hint`` transcript
shape plus a CDC envelope) with *additive schema evolution* handled by the
sink (see :mod:`fetchez_spark.sinks.local_snapshot`).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Target table: multi-turn conversation/agent transcripts.
# Primary key: (conv_id, turn_idx).  Matches BASELINE.json input_hint exactly.
# ---------------------------------------------------------------------------
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Change event: binlog/WAL-style envelope around a transcript row.
#   op  : 'I' | 'U' | 'D'
#   ts  : event timestamp -- max-(ts, seq)-per-key wins
#   seq : monotone tie-breaker for equal ts (deterministic replay order)
#   src_partition : source partition id (per-partition lineage)
# Mirrors fetchez's entry dict (url/dst_fn/data_type + extras) reimagined as a
# CDC record; the version-preference dedup ancestor is multibeam.py:217-253.
# ---------------------------------------------------------------------------
CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("src_partition", T.IntegerType(), False),
    ]
)

# Columns that form the primary key of the target table.
KEY_COLUMNS = ["conv_id", "turn_idx"]

# Ordering columns: larger wins (last-writer-wins with deterministic seq
# tie-break).  SURVEY.md section 4 "Top-1-per-key dedup".
ORDER_COLUMNS = ["ts", "seq"]

# Envelope columns that never land in the target table.
ENVELOPE_COLUMNS = ["op", "src_partition"]

# Internal columns the sink persists alongside the payload so that
# cross-batch late events still lose to earlier-arriving-but-newer rows,
# and so deletes act as tombstones rather than physical absence.
# ``_src`` carries the source partition id into the data files: row-level
# provenance (the Iceberg _file/_pos analog) AND the source of per-
# partition lineage counts -- a column-pruned scan of the just-written
# delta files replaces a second pass over the batch.
INTERNAL_SEQ = "_seq"
INTERNAL_DELETED = "_deleted"
INTERNAL_SRC = "_src"


def payload_columns(event_schema: T.StructType) -> list[str]:
    """Columns of a change-event schema that belong to the target payload.

    Everything except the CDC envelope (op, src_partition) and the ordering
    seq (which is persisted under the internal name ``_seq``).
    """
    skip = set(ENVELOPE_COLUMNS) | {"seq"}
    return [f.name for f in event_schema.fields if f.name not in skip]


# Safe widening promotions (Iceberg's type-promotion table): reading an
# old parquet file written with the narrow type under the widened schema
# upcasts losslessly -- verified on this Spark build for both pairs.
_WIDENINGS: dict[tuple[str, str], T.DataType] = {
    ("int", "bigint"): T.LongType(),
    ("float", "double"): T.DoubleType(),
}


def merge_schemas(base: T.StructType, extra: T.StructType) -> T.StructType:
    """Schema union: keep ``base`` order, append unseen fields, WIDEN on
    safe numeric promotions (int->long, float->double -- the Iceberg
    type-promotion set; old files stay valid, parquet upcasts on read).

    Any other type conflict on the same name raises -- evolution is
    additive-or-widening only, mirroring fetchez's entry.update(kwargs)
    open-schema behavior (core.py:1128-1137) with the safety Iceberg's
    schema merge gives.
    """
    fields = list(base.fields)
    names = {f.name: i for i, f in enumerate(base.fields)}
    for f in extra.fields:
        if isinstance(f.dataType, T.NullType):
            # an all-null column (arrow/parquet writers emit it as the
            # null type) carries NO type evidence: skipping it is lossless
            # (its values are null either way) and avoids poisoning the
            # union with a void type; the first file with real values
            # establishes the type and triggers the evolution
            continue
        i = names.get(f.name)
        if i is None:
            fields.append(T.StructField(f.name, f.dataType, True))
            continue
        cur = fields[i]
        if isinstance(cur.dataType, T.NullType):
            fields[i] = T.StructField(cur.name, f.dataType, True)
            continue
        if cur.dataType == f.dataType:
            continue
        pair = (cur.dataType.simpleString(), f.dataType.simpleString())
        if pair in _WIDENINGS:
            fields[i] = T.StructField(cur.name, _WIDENINGS[pair], cur.nullable)
        elif (pair[1], pair[0]) in _WIDENINGS:
            pass  # batch is NARROWER than the table: table type already wide
        else:
            raise TypeError(
                f"schema evolution type conflict on {f.name!r}: "
                f"{cur.dataType} vs {f.dataType}"
            )
    return T.StructType(fields)
