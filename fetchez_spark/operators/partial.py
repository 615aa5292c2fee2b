"""Partial-update (sparse CDC event) merge mode -- per-COLUMN last-writer-wins.

The default merge mode replaces the whole row per key (full-row LWW): an
update event must carry every payload column.  Real CDC streams often do
not -- a source emits only the columns that changed (Kafka-compacted
partial payloads, column-sparse app events, "patch" semantics).  This
module gives the snapshot sink a second, recorded-at-bootstrap merge mode
(``merge_mode="partial"``) where a NULL payload column on an update event
means "unchanged" and the table coalesces per column:

* per key and per payload column, the value of the LATEST event (by the
  usual (ts, seq) order) that set the column non-null wins;
* a delete event tombstones the key AND resets every column: an event
  older than the latest delete can never contribute a value (so a late
  partial update after a delete starts from an empty row);
* a key is live iff its latest event overall is not a delete.

The lakehouse ancestors are Apache Paimon's ``partial-update`` merge
engine and Hudi's partial-update payloads; the exactness trick is
Cassandra's: per-CELL versions.  Each stored row carries, per payload
column ``c``, the (ts, seq) of the event that set it (``_pv_ts__c`` /
``_pv_seq__c``) plus the key's latest-delete watermark (``_dts`` /
``_dseq``).  Because that state is a LOSSLESS summary of the event set
under the semantics above, the fold is ASSOCIATIVE and COMMUTATIVE over
consolidated rows: merging batches in any grouping or order -- MoR
read-time reduction, compaction folds, CoW rewrites, multi-writer
reconcile -- produces the same table as one global fold of the raw log.
That is what makes the mode safe to thread through the sink's existing
machinery instead of needing its own write path.  (The default LWW mode
cannot simply reuse "coalesce at merge time": without per-column
versions a late partial update would coalesce against a consolidated row
whose version postdates it, silently resurrecting overwritten values.)

Cost: 2 extra internal columns per payload column (a timestamp + a
long) and, in the fold, one conditional max-struct aggregate per column
instead of a single max-struct -- still ONE grouped aggregation with
ONE Exchange and map-side partial aggregation (plan-identical in shape
to the default mode's ``max(struct)`` reduction: Spark plans struct-max
as a partial SortAggregate -> Exchange -> final SortAggregate; the
duplicate/hot-key mass still collapses before the shuffle).

Known limits (documented contract, same as Paimon's partial-update
engine): an explicit NULL cannot be written in partial mode (null means
"unchanged"); write a sentinel or use delete + re-insert.  Expectations
evaluate per EVENT, so a gate over a column an event did not carry sees
NULL for that event.

Reference analog: fetchez entries accept partial metadata updates --
``entry.update(kwargs)`` merges new keys into the existing dict without
clearing absent ones (/root/reference/src/fetchez/core.py:1128-1137);
this lifts that dict-merge semantic to column-level CDC.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fetchez_spark.schema import INTERNAL_DELETED, INTERNAL_SEQ, INTERNAL_SRC

INTERNAL_DTS = "_dts"
INTERNAL_DSEQ = "_dseq"
PV_TS_PREFIX = "_pv_ts__"
PV_SEQ_PREFIX = "_pv_seq__"

_STATIC = (INTERNAL_SEQ, INTERNAL_DELETED, INTERNAL_SRC)


def pv_ts(col: str) -> str:
    return PV_TS_PREFIX + col


def pv_seq(col: str) -> str:
    return PV_SEQ_PREFIX + col


def is_partial_internal(name: str) -> bool:
    return (
        name in (INTERNAL_DTS, INTERNAL_DSEQ)
        or name.startswith(PV_TS_PREFIX)
        or name.startswith(PV_SEQ_PREFIX)
    )


def partial_cols_of(columns: list[str]) -> list[str]:
    """Payload columns tracked per-column in this frame/schema: exactly
    those with a ``_pv_ts__`` twin present (derived, never configured --
    schema evolution adds the twin together with the column)."""
    have = set(columns)
    return [c[len(PV_TS_PREFIX):] for c in columns
            if c.startswith(PV_TS_PREFIX) and c[len(PV_TS_PREFIX):] in have]


def partial_payload_cols(columns: list[str], key: list[str]) -> list[str]:
    """Columns that get a per-column version pair: every payload column
    except the key (identity) and ``ts`` (it IS the version)."""
    skip = set(key) | {"ts"}
    return [
        c
        for c in columns
        if c not in skip and c not in _STATIC and not is_partial_internal(c)
    ]


def partial_internal_fields(
    payload_cols: list[str], ts_type: T.DataType
) -> list[T.StructField]:
    """The mode's internal fields for a table whose payload is
    ``payload_cols``: the delete watermark pair + one (ts, seq) pair per
    column.  ``ts_type`` follows the table's own ts column (Timestamp or
    TimestampNTZ, depending on the session that bootstrapped it)."""
    out = [
        T.StructField(INTERNAL_DTS, ts_type, True),
        T.StructField(INTERNAL_DSEQ, T.LongType(), True),
    ]
    for c in payload_cols:
        out.append(T.StructField(pv_ts(c), ts_type, True))
        out.append(T.StructField(pv_seq(c), T.LongType(), True))
    return out


def events_to_partial_state(rows: DataFrame, key: list[str]) -> DataFrame:
    """Target-shaped batch rows (the output of ``batch_to_target_rows``:
    payload + ``_seq``/``_deleted``/``_src``) -> single-event partial
    states: per-column version pairs for the columns the event SET,
    the delete watermark for tombstones, payload nulled on tombstones
    (a delete resets the row; its payload is not state)."""
    cols = partial_payload_cols(rows.columns, key)
    dead = F.col(INTERNAL_DELETED)
    new: dict[str, Column] = {
        INTERNAL_DTS: F.when(dead, F.col("ts")),
        INTERNAL_DSEQ: F.when(dead, F.col(INTERNAL_SEQ)),
    }
    for c in cols:
        set_here = ~dead & F.col(c).isNotNull()
        new[pv_ts(c)] = F.when(set_here, F.col("ts"))
        new[pv_seq(c)] = F.when(set_here, F.col(INTERNAL_SEQ))
    for c in cols:
        new[c] = F.when(~dead, F.col(c))
    return rows.withColumns(new)


def _ver(ts_col: Column, seq_col: Column) -> Column:
    """A comparable (ts, seq) version struct; field names are fixed so
    struct-vs-struct comparisons resolve."""
    return F.struct(ts_col.alias("ts"), seq_col.alias("seq"))


def partial_agg_exprs(cols: list[str]) -> list[Column]:
    """The fold's aggregate list (ONE grouped aggregation):

    * ``_D``  -- max delete-watermark version across rows;
    * ``_Lv`` -- max version among LIVE rows (liveness candidate);
    * ``_O``  -- overall max-version row's (ts, seq, _src) (row attrs);
    * ``_T_<c>`` -- per column, the max-version (ts, seq, value) triple
      among rows that carry a version for it.

    Conditional ``max(when(...))`` aggregates ignore rows where the
    condition is false (the when yields NULL and max skips it)."""
    aggs = [
        F.max(
            F.when(
                F.col(INTERNAL_DTS).isNotNull(),
                _ver(F.col(INTERNAL_DTS), F.col(INTERNAL_DSEQ)),
            )
        ).alias("_D"),
        F.max(
            F.when(
                ~F.col(INTERNAL_DELETED), _ver(F.col("ts"), F.col(INTERNAL_SEQ))
            )
        ).alias("_Lv"),
        F.max(
            F.struct(
                F.col("ts").alias("ts"),
                F.col(INTERNAL_SEQ).alias("seq"),
                F.col(INTERNAL_SRC).alias("src"),
            )
        ).alias("_O"),
    ]
    for c in cols:
        aggs.append(
            F.max(
                F.when(
                    F.col(pv_ts(c)).isNotNull(),
                    F.struct(
                        F.col(pv_ts(c)).alias("ts"),
                        F.col(pv_seq(c)).alias("seq"),
                        F.col(c).alias("v"),
                    ),
                )
            ).alias(f"_T_{c}")
        )
    return aggs


def partial_finish_exprs(cols: list[str]) -> dict[str, Column]:
    """Post-aggregate reconstruction of the consolidated state row from
    the ``_D``/``_Lv``/``_O``/``_T_*`` aggregates.  A column's triple
    survives only when its version beats the delete watermark (a value
    set before the latest delete was reset by it)."""
    d = F.col("_D")
    out: dict[str, Column] = {
        "ts": F.col("_O.ts"),
        INTERNAL_SEQ: F.col("_O.seq"),
        INTERNAL_SRC: F.col("_O.src"),
        INTERNAL_DELETED: d.isNotNull()
        & (F.col("_Lv").isNull() | (d > F.col("_Lv"))),
        INTERNAL_DTS: F.col("_D.ts"),
        INTERNAL_DSEQ: F.col("_D.seq"),
    }
    for c in cols:
        t = F.col(f"_T_{c}")
        keep = t.isNotNull() & (
            d.isNull() | (_ver(F.col(f"_T_{c}.ts"), F.col(f"_T_{c}.seq")) > d)
        )
        out[c] = F.when(keep, F.col(f"_T_{c}.v"))
        out[pv_ts(c)] = F.when(keep, F.col(f"_T_{c}.ts"))
        out[pv_seq(c)] = F.when(keep, F.col(f"_T_{c}.seq"))
    return out


def _fold_once(df: DataFrame, key: list[str], salt_col: Column | None) -> DataFrame:
    cols = partial_cols_of(df.columns)
    grouping = [F.col(k) for k in key]
    if salt_col is not None:
        grouping.append(salt_col.alias("_salt"))
    won = df.groupBy(*grouping).agg(*partial_agg_exprs(cols))
    finish = partial_finish_exprs(cols)
    sel = [F.col(k) for k in key] + [expr.alias(name) for name, expr in finish.items()]
    named = set(key) | set(finish)
    field_types = {f.name: f.dataType for f in df.schema.fields}
    for c in df.columns:
        if c in named:
            continue
        if is_partial_internal(c):
            # orphan version pair: its base column never earned a type
            # (all-null evolution batch) -- null by construction
            sel.append(F.lit(None).cast(field_types[c]).alias(c))
        else:
            raise ValueError(
                f"partial fold cannot reconstruct column {c!r} (no "
                f"version pair in the frame)"
            )
    return won.select(*sel).select(*df.columns)


def fold_partial_states(df: DataFrame, key: list[str], salt: int = 0) -> DataFrame:
    """Consolidate partial-state rows per key -- the mode's counterpart
    of :func:`fetchez_spark.operators.dedup.dedup_latest`, with the same
    plan shape (one hash aggregate with map-side combine; ``salt > 1``
    adds the explicit two-phase reduction for hot keys, sound because the
    fold is associative)."""
    if salt and salt > 1:
        salt_col = F.pmod(
            F.xxhash64(F.col("ts"), F.col(INTERNAL_SEQ)), F.lit(salt)
        )
        return _fold_once(_fold_once(df, key, salt_col), key, None)
    return _fold_once(df, key, None)


def fold_partial_updates(
    events: DataFrame, key: list[str] | None = None
) -> DataFrame:
    """Public one-shot operator: raw CDC events (op/ts/seq envelope,
    sparse payload -- NULL column = unchanged) -> final visible rows
    under partial-update semantics.  The batch/streaming equivalent is a
    ``LocalSnapshotSink(merge_mode="partial")`` replay; this is the
    single-pass form for bootstrap backfills and the correctness oracle.

    Output: key columns + coalesced payload columns + ``ts`` of the
    latest live event per key; tombstoned keys (latest event is a
    delete) are dropped."""
    key = key or ["conv_id", "turn_idx"]
    rows = (
        events.withColumn(INTERNAL_SEQ, F.col("seq"))
        .withColumn(INTERNAL_DELETED, F.col("op") == F.lit("D"))
        .withColumn(
            INTERNAL_SRC,
            F.col("src_partition").cast("int")
            if "src_partition" in events.columns
            else F.lit(None).cast("int"),
        )
        .drop("op", "seq", "src_partition")
    )
    state = events_to_partial_state(rows, key)
    folded = fold_partial_states(state, key)
    payload = [
        c
        for c in folded.columns
        if c not in _STATIC and not is_partial_internal(c)
    ]
    return folded.filter(~F.col(INTERNAL_DELETED)).select(*payload)
