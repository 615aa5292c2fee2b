"""Real Apache Iceberg sink adapter (MERGE INTO), config-selected.

No ``iceberg-spark-runtime`` jar ships in this sandbox's pyspark install
and no network is assumed (verified -- SURVEY.md section 7 step 3), so
this adapter cannot execute end-to-end here; it exists so a deployment
with the jar on the classpath gets identical semantics behind the same
:class:`~fetchez_spark.sinks.base.SnapshotSink` interface as the tested
:class:`~fetchez_spark.sinks.local_snapshot.LocalSnapshotSink`.  What IS
tested in-sandbox (tests/test_iceberg_adapter.py): every SQL statement
this adapter emits parses under Spark's own SQL parser, and the
batch-token bookkeeping round-trips against a stubbed property store.

Activation (spark-submit):
    --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
    --conf spark.sql.catalog.fz=org.apache.iceberg.spark.SparkCatalog
    --conf spark.sql.catalog.fz.type=hadoop
    --conf spark.sql.catalog.fz.warehouse=<warehouse dir>

Exactly-once: each merged batch records its token as the table property
``fetchez.committed.<token>``; :meth:`is_committed` reads the SAME store
(SHOW TBLPROPERTIES), so replays after restart are skipped.  The MERGE
and the property write are two commits, but the crash window between
them is safe because the MERGE is IDEMPOTENT: every clause is guarded by
``struct(s.ts, s._seq) > struct(t.ts, t._seq)`` (strictly newer wins), so
re-merging an applied batch matches only equal-version rows and changes
nothing, and tombstones are kept as rows (``_deleted``), so a replayed
delete neither fails nor resurrects.  The token window is trimmed like
the local sink's manifest window (bounded metadata growth).
"""

from __future__ import annotations

import re
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from fetchez_spark.operators.dedup import dedup_latest
from fetchez_spark.operators.merge import batch_to_target_rows
from fetchez_spark.schema import (
    INTERNAL_DELETED,
    INTERNAL_SEQ,
    INTERNAL_SRC,
    KEY_COLUMNS,
    TRANSCRIPT_SCHEMA,
)
from fetchez_spark.sinks.base import SnapshotSink

_TOKEN_PREFIX = "fetchez.committed."


def _q(name: str) -> str:
    """Backtick-quote one identifier (column, or one table-name part);
    reserved words ('timestamp', 'order') and unusual names survive DDL."""
    return "`" + str(name).replace("`", "``") + "`"


def _qt(table: str) -> str:
    """Quote a possibly multi-part table name (catalog.db.table)."""
    return ".".join(_q(p) for p in table.split("."))


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def create_table_sql(table: str, schema=None, num_buckets: int = 32, key: list[str] | None = None) -> str:
    """DDL for the target: payload + internal columns, v2 MoR, bucketed on
    the leading key (the Iceberg twin of LocalSnapshotSink's layout)."""
    schema = schema or TRANSCRIPT_SCHEMA
    key = key or KEY_COLUMNS
    cols = ", ".join(f"{_q(f.name)} {f.dataType.simpleString()}" for f in schema.fields)
    internal = (
        f"{_q(INTERNAL_SEQ)} bigint, {_q(INTERNAL_DELETED)} boolean, "
        f"{_q(INTERNAL_SRC)} int"
    )
    return (
        f"CREATE TABLE IF NOT EXISTS {_qt(table)} ({cols}, {internal}) "
        f"USING iceberg PARTITIONED BY (bucket({num_buckets}, {_q(key[0])})) "
        f"TBLPROPERTIES ('format-version' = '2', "
        f"'write.delete.mode' = 'merge-on-read', "
        f"'write.update.mode' = 'merge-on-read', "
        f"'write.merge.mode' = 'merge-on-read')"
    )


def alter_add_columns_sql(table: str, new_fields) -> str:
    """Additive schema evolution DDL: Iceberg supports ALTER TABLE ADD
    COLUMNS natively (metadata-only, no rewrite) -- the Iceberg twin of
    LocalSnapshotSink's ``merge_schemas`` manifest update, and of the
    reference's entry extra-keys widening
    (/root/reference/src/fetchez/core.py:1128-1137)."""
    cols = ", ".join(f"{_q(f.name)} {f.dataType.simpleString()}" for f in new_fields)
    return f"ALTER TABLE {_qt(table)} ADD COLUMNS ({cols})"


def alter_widen_column_sql(table: str, name: str, dtype) -> str:
    """Type-promotion DDL (int->long, float->double): metadata-only in
    Iceberg; old data files stay valid and upcast on read."""
    return f"ALTER TABLE {_qt(table)} ALTER COLUMN {_q(name)} TYPE {dtype.simpleString()}"


def merge_into_sql(
    table: str,
    source_view: str,
    key: list[str],
    payload_cols: list[str],
    when_matched_update: dict[str, str] | None = None,
    when_matched_delete: str | bool | None = None,
    when_not_matched_insert: dict[str, str] | None = None,
    when_not_matched_by_source_update: dict[str, str] | None = None,
    when_not_matched_by_source_delete: str | bool | None = None,
) -> str:
    """ONE Iceberg MERGE statement with the same clause semantics as
    :meth:`LocalSnapshotSink.merge_into` on the materialized-row model:

    * tombstones are ROWS (``_deleted``), so every matched/by-source
      clause carries ``NOT t._deleted`` and updates/deletes bump the
      row's version (``_seq + 1`` at unchanged ``ts``) exactly like the
      local sink's synthesized change events;
    * a tombstoned key is "not matched" semantically but IS matched by
      the key-equality ON, so inserts get a dedicated resurrection
      clause (``WHEN MATCHED AND t._deleted``) that lands at the
      assigned ts when it beats the tombstone and at the tombstone's
      ``(ts, _seq + 1)`` otherwise -- the local sink's documented
      resurrection contract, byte for byte.

    All condition/assignment expressions are SQL text over ``s.``/``t.``
    (the adapter's wire format is SQL; Column objects are refused
    upstream).  Clause order in the emitted text IS the semantics:
    SQL MERGE applies the first matching clause per row."""
    dcol, scol = _q(INTERNAL_DELETED), _q(INTERNAL_SEQ)
    on = " AND ".join(f"t.{_q(k)} = s.{_q(k)}" for k in key)
    clauses: list[str] = []
    if when_matched_delete is not None:
        cond = "true" if when_matched_delete is True else f"({when_matched_delete})"
        clauses.append(
            f"WHEN MATCHED AND NOT t.{dcol} AND {cond} THEN UPDATE SET "
            f"t.{dcol} = true, t.{scol} = t.{scol} + 1"
        )
    if when_matched_update is not None:
        sets = ", ".join(
            f"t.{_q(c)} = ({v})" for c, v in when_matched_update.items()
        )
        clauses.append(
            f"WHEN MATCHED AND NOT t.{dcol} THEN UPDATE SET {sets}, "
            f"t.{scol} = t.{scol} + 1"
        )
    if when_not_matched_insert is not None:
        ins = when_not_matched_insert
        ins_ts = f"({ins['ts']})"
        ins_seq = f"({ins.get('seq', '0')})"
        beats = f"(t.ts IS NULL OR {ins_ts} > t.ts)"
        res_sets = ", ".join(
            f"t.{_q(c)} = ({ins[c]})" if c in ins else f"t.{_q(c)} = NULL"
            for c in payload_cols
            if c != "ts"
        )
        clauses.append(
            f"WHEN MATCHED AND t.{dcol} THEN UPDATE SET {res_sets}, "
            f"t.ts = CASE WHEN {beats} THEN {ins_ts} ELSE t.ts END, "
            f"t.{scol} = CASE WHEN {beats} THEN CAST({ins_seq} AS BIGINT) "
            f"ELSE t.{scol} + 1 END, "
            f"t.{dcol} = false"
        )
        icols = ", ".join(
            [_q(c) for c in payload_cols]
            + [scol, dcol, _q(INTERNAL_SRC)]
        )
        ivals = ", ".join(
            [f"({ins[c]})" if c in ins else "NULL" for c in payload_cols]
            + [f"CAST({ins_seq} AS BIGINT)", "false", "NULL"]
        )
        clauses.append(
            f"WHEN NOT MATCHED THEN INSERT ({icols}) VALUES ({ivals})"
        )
    if when_not_matched_by_source_delete is not None:
        cond = (
            "true"
            if when_not_matched_by_source_delete is True
            else f"({when_not_matched_by_source_delete})"
        )
        clauses.append(
            f"WHEN NOT MATCHED BY SOURCE AND NOT t.{dcol} AND {cond} "
            f"THEN UPDATE SET t.{dcol} = true, t.{scol} = t.{scol} + 1"
        )
    if when_not_matched_by_source_update is not None:
        sets = ", ".join(
            f"t.{_q(c)} = ({v})"
            for c, v in when_not_matched_by_source_update.items()
        )
        clauses.append(
            f"WHEN NOT MATCHED BY SOURCE AND NOT t.{dcol} THEN UPDATE SET "
            f"{sets}, t.{scol} = t.{scol} + 1"
        )
    return (
        f"MERGE INTO {_qt(table)} t USING {_q(source_view)} s ON {on} "
        + " ".join(clauses)
    )


def merge_sql(table: str, source_view: str, key: list[str], columns: list[str]) -> str:
    """MERGE text with EXPLICIT column lists (no ``UPDATE SET *``: the
    source is projected to the exact target shape by batch_to_target_rows,
    and explicit lists survive target tables with extra columns) and
    struct() version comparison (row-constructor ``(a, b) > (c, d)`` is
    not valid Spark SQL)."""
    on = " AND ".join(f"t.{_q(k)} = s.{_q(k)}" for k in key)
    newer = f"struct(s.ts, s.{_q(INTERNAL_SEQ)}) > struct(t.ts, t.{_q(INTERNAL_SEQ)})"
    sets = ", ".join(f"t.{_q(c)} = s.{_q(c)}" for c in columns)
    ins_cols = ", ".join(_q(c) for c in columns)
    ins_vals = ", ".join(f"s.{_q(c)}" for c in columns)
    # Tombstones are kept as rows (_deleted = true), mirroring the local
    # sink: a late pre-delete update must LOSE to the tombstone's version,
    # which physical DELETE cannot express.
    return (
        f"MERGE INTO {_qt(table)} t USING {_q(source_view)} s ON {on} "
        f"WHEN MATCHED AND {newer} THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
    )


class IcebergSink(SnapshotSink):
    """MERGE INTO an Iceberg v2 table; batch tokens in table properties
    for exactly-once (see module docstring for the idempotence argument).

    Surface parity with :class:`LocalSnapshotSink`: everything the local
    sink does that Iceberg expresses natively is implemented (``merge``,
    ``merge_into`` with the full clause set, schema evolution, time
    travel, ``rollback``); everything Iceberg covers with its OWN
    machinery refuses loudly and names that machinery (``UNSUPPORTED``
    below -- compaction is ``rewrite_data_files``, retention is
    ``expire_snapshots``, the change feed is the changelog scan, ...),
    so a user never gets a silent no-op where the local sink would have
    acted."""

    #: local-sink methods whose Iceberg twin is a NATIVE procedure /
    #: feature rather than adapter code -- calling them raises
    #: NotImplementedError naming the replacement.
    UNSUPPORTED: dict[str, str] = {
        "compact": "CALL <catalog>.system.rewrite_data_files('<table>')",
        "rebucket": "ALTER TABLE ... REPLACE PARTITION FIELD + rewrite_data_files",
        "expire_snapshots": "CALL <catalog>.system.expire_snapshots('<table>')",
        "vacuum_orphans": "CALL <catalog>.system.remove_orphan_files('<table>')",
        "change_feed": "Iceberg changelog scan: CALL <catalog>.system.create_changelog_view",
        "read_changes": "Iceberg changelog scan: CALL <catalog>.system.create_changelog_view",
        "follow_changes": "Structured Streaming over the Iceberg source (streaming read)",
        "clone_to": "Iceberg snapshot/branch: ALTER TABLE ... CREATE BRANCH, or CTAS",
        "import_files": "CALL <catalog>.system.add_files('<table>', '<path>')",
        "create_branch": "ALTER TABLE ... CREATE BRANCH <name>",
        "drop_branch": "ALTER TABLE ... DROP BRANCH <name>",
        "publish": "Iceberg branch fast-forward: CALL <catalog>.system.fast_forward",
        "create_tag": "ALTER TABLE ... CREATE TAG <name>",
        "drop_tag": "ALTER TABLE ... DROP TAG <name>",
        "register_consumer": "track consumer cursors beside the table (Kafka-style), not in it",
        "advance_consumer": "track consumer cursors beside the table",
        "drop_consumer": "track consumer cursors beside the table",
        "consumer_lag": "track consumer cursors beside the table",
        "purge_tombstones": "DELETE FROM ... WHERE _deleted + rewrite_data_files",
        "purge_expired": "DELETE FROM with the TTL predicate",
        "add_expectation": "Iceberg has no table-level expectations; validate in the stream",
        "drop_expectation": "Iceberg has no table-level expectations",
        "update_where": "plain Iceberg SQL: UPDATE <table> SET ... WHERE ...",
        "delete_where": "plain Iceberg SQL: DELETE FROM <table> WHERE ...",
        "fsck": "Iceberg metadata is self-validating; inspect the metadata tables",
    }

    def __init__(
        self,
        spark: SparkSession,
        table: str,
        key: list[str] | None = None,
        num_buckets: int = 32,
        max_committed_tokens: int = 1024,
        create: bool = True,
        merge_mode: str | None = None,
    ) -> None:
        if merge_mode not in (None, "lww"):
            # the local sink's partial-update mode consolidates per-key
            # state column-wise at read time (MoR); one Iceberg MERGE
            # cannot express "newest non-null per column" without a
            # per-column CASE fan-out the adapter does not generate
            raise NotImplementedError(
                f"merge_mode={merge_mode!r} is not supported by the "
                "Iceberg adapter (LWW only); use LocalSnapshotSink for "
                "partial-update tables, or express column-wise merges "
                "with merge_into(when_matched_update={...coalesce(s.c, t.c)...})"
            )
        if not iceberg_available(spark):
            raise RuntimeError(
                "iceberg-spark-runtime is not on the classpath; use "
                "LocalSnapshotSink (identical semantics) or add the jar"
            )
        self.spark = spark
        self.table = table
        self.key = key or KEY_COLUMNS
        self.max_committed_tokens = max_committed_tokens
        if create:
            spark.sql(create_table_sql(table, num_buckets=num_buckets, key=self.key))

    def __getattr__(self, name: str):
        # executes-or-loudly-refuses, for the WHOLE local-sink surface: a
        # method the adapter does not implement raises NotImplementedError
        # naming the Iceberg-native replacement (UNSUPPORTED) -- never an
        # AttributeError a caller could mistake for a typo, never a
        # silent no-op where LocalSnapshotSink would have acted.
        if name.startswith("_"):
            raise AttributeError(name)  # dunder/internal lookups stay honest
        from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

        local_surface = {
            n for n in vars(LocalSnapshotSink) if not n.startswith("_")
        }
        if name not in type(self).UNSUPPORTED and name not in local_surface:
            # unknown names keep normal AttributeError semantics so
            # getattr(sink, x, default) duck-typing probes still work
            raise AttributeError(name)
        hint = type(self).UNSUPPORTED.get(
            name, "see the Iceberg spec/procedures for the native equivalent"
        )

        def _refuse(*_a, **_k):
            raise NotImplementedError(
                f"IcebergSink.{name} is intentionally not implemented: "
                f"Iceberg covers this natively -- {hint}"
            )

        return _refuse

    # ------------------------------------------------------------- tokens
    def _properties(self) -> dict[str, str]:
        rows = self.spark.sql(f"SHOW TBLPROPERTIES {_qt(self.table)}").collect()
        return {r[0]: r[1] for r in rows}

    def _committed_tokens(self) -> set[str]:
        return {
            k[len(_TOKEN_PREFIX):]
            for k in self._properties()
            if k.startswith(_TOKEN_PREFIX)
        }

    def is_committed(self, batch_token: str) -> bool:
        return str(batch_token) in self._committed_tokens()

    def _record_token(self, batch_token: str) -> None:
        self.spark.sql(
            f"ALTER TABLE {_qt(self.table)} SET TBLPROPERTIES "
            f"('{_TOKEN_PREFIX}{batch_token}' = '{time.time_ns()}')"
        )
        # bounded metadata: trim the oldest tokens past the window
        toks = sorted(
            (
                (v, k)
                for k, v in self._properties().items()
                if k.startswith(_TOKEN_PREFIX)
            )
        )
        excess = len(toks) - self.max_committed_tokens
        if excess > 0:
            drop = ", ".join(f"'{k}'" for _, k in toks[:excess])
            self.spark.sql(f"ALTER TABLE {_qt(self.table)} UNSET TBLPROPERTIES ({drop})")

    # ------------------------------------------------------------- schema
    def _target_columns(self) -> list[str]:
        return self.spark.read.table(self.table).columns

    def _target_schema(self):
        """Target schema via the catalog, or ``None`` when the session
        cannot read tables at all (the stubbed property-store spark in
        tests exposes only ``sql``).  Returning None instead of raising
        keeps the distinction explicit: a REAL read failure (analysis
        error, missing table) propagates loudly from the caller rather
        than silently downgrading widening to additive-only evolution."""
        reader = getattr(self.spark, "read", None)
        if reader is None:
            return None
        return reader.table(self.table).schema

    def _evolve_schema(self, rows: DataFrame) -> list[str]:
        """Schema evolution before the MERGE: any batch column the target
        lacks becomes an ALTER TABLE ADD COLUMNS (a batch naming unknown
        columns would otherwise fail the MERGE's explicit column lists),
        and safe numeric promotions (int->long, float->double) become
        ALTER COLUMN TYPE -- the same additive-or-widening contract as the
        local sink's merge_schemas.  Returns the evolved column names."""
        from fetchez_spark.schema import _WIDENINGS

        target_schema = self._target_schema()
        if target_schema is not None:
            target = {f.name: f.dataType for f in target_schema.fields}
            existing = set(target)
        else:  # schema-less stub store: additive-only (documented)
            target = None
            existing = set(self._target_columns())
        new_fields = [f for f in rows.schema.fields if f.name not in existing]
        if new_fields:
            self.spark.sql(alter_add_columns_sql(self.table, new_fields))
        evolved = [f.name for f in new_fields]
        if target is not None:
            for f in rows.schema.fields:
                cur = target.get(f.name)
                if cur is None or cur == f.dataType:
                    continue
                pair = (cur.simpleString(), f.dataType.simpleString())
                if pair in _WIDENINGS:
                    self.spark.sql(
                        alter_widen_column_sql(self.table, f.name, _WIDENINGS[pair])
                    )
                    evolved.append(f.name)
        return evolved

    # -------------------------------------------------------------- merge
    def merge(self, batch: DataFrame, batch_token: str, offsets: dict[str, Any] | None = None):
        t0 = time.monotonic()
        token = str(batch_token)
        if self.is_committed(token):
            return {"skipped": True, "batch_token": token}
        rows = dedup_latest(
            batch_to_target_rows(batch), key=self.key, order=["ts", INTERNAL_SEQ]
        )
        added = self._evolve_schema(rows)
        # per-call view name (derived from the token, which exactly-once
        # delivery already makes unique per in-flight batch): two
        # concurrent merges on one SparkSession can no longer overwrite
        # each other's source between view registration and the MERGE
        view = f"_fz_batch_{re.sub(r'[^A-Za-z0-9_]', '_', token)}"
        rows.createOrReplaceTempView(view)
        try:
            self.spark.sql(merge_sql(self.table, view, self.key, rows.columns))
        finally:
            try:  # best-effort cleanup; the view is session-scoped anyway
                self.spark.catalog.dropTempView(view)
            except Exception:
                pass
        self._record_token(token)
        return {
            "skipped": False,
            "batch_token": token,
            "columns_added": added,
            "seconds": time.monotonic() - t0,
        }

    # --------------------------------------------------------- merge_into
    def merge_into(
        self,
        spark: SparkSession,
        source: DataFrame,
        on=None,
        when_matched_update=None,
        when_matched_delete=None,
        when_not_matched_insert=None,
        when_not_matched_by_source_update=None,
        when_not_matched_by_source_delete=None,
        batch_token: str | None = None,
        error_on_multiple_matches: bool = True,
    ) -> dict[str, Any]:
        """General MERGE with :meth:`LocalSnapshotSink.merge_into`'s
        clause surface, emitted as ONE native Iceberg MERGE statement
        (see :func:`merge_into_sql` for the tombstone/resurrection
        mapping).  Same validations as the local sink; adapter-specific
        refusals are loud: expressions must be SQL strings (the wire
        format IS SQL), ``on`` must be the default key equality (an
        arbitrary ON cannot express the by-key tombstone-resurrection
        contract in one statement), and ``error_on_multiple_matches``
        cannot be disabled (native MERGE always errors on multiple
        matches -- the safe default, enforced by the engine).

        **Delivery contract with** ``batch_token``: AT-LEAST-ONCE across
        a crash, unlike :meth:`merge`.  The replay-merge's clauses are
        version-guarded and therefore idempotent, which is what makes
        its MERGE-then-record-token sequence exactly-once; a general
        ``merge_into`` clause spec need not be (``t._seq`` bumps
        unconditionally, and assignments like ``t.value + s.delta``
        re-apply on replay).  A crash in the window between the MERGE
        commit and the token-property commit therefore re-runs the MERGE
        on retry.  Make the clause spec self-idempotent (pure ``s.``
        assignments re-apply harmlessly up to ``_seq``), or use
        :class:`LocalSnapshotSink` (whose merge_into is one atomic
        change-event commit) when exactly-once matters across crashes --
        open-source Iceberg offers no way to couple a MERGE and a
        property write in one commit from SQL."""
        if (
            when_matched_update is None
            and when_matched_delete is None
            and when_not_matched_insert is None
            and when_not_matched_by_source_update is None
            and when_not_matched_by_source_delete is None
        ):
            raise ValueError("merge_into needs at least one WHEN clause")
        if on is not None:
            raise NotImplementedError(
                "the Iceberg adapter supports key-equality merge_into only "
                "(on=None): an arbitrary ON condition cannot express the "
                "by-key tombstone-resurrection contract in one MERGE; run "
                "plain Iceberg SQL for ad-hoc conditions"
            )
        if not error_on_multiple_matches:
            raise NotImplementedError(
                "error_on_multiple_matches=False is not supported: native "
                "MERGE always errors on multiple source matches"
            )

        def _sqlify(spec, what):
            if spec is None or spec is True or isinstance(spec, str):
                return spec
            if isinstance(spec, dict):
                bad = [c for c, v in spec.items() if not isinstance(v, str)]
                if bad:
                    raise NotImplementedError(
                        f"{what} assignments must be SQL strings for the "
                        f"Iceberg adapter (Column objects at {bad})"
                    )
                return spec
            raise NotImplementedError(
                f"{what} must be a SQL string for the Iceberg adapter"
            )

        payload_cols = [
            c
            for c in self._target_columns()
            if c not in (INTERNAL_SEQ, INTERNAL_DELETED, INTERNAL_SRC)
        ]
        lkey = list(self.key)
        upd = _sqlify(when_matched_update, "when_matched_update")
        if upd == "all":
            upd = {
                c: f"s.{c}"
                for c in payload_cols
                if c not in lkey and c != "ts" and c in source.columns
            }
        ins = _sqlify(when_not_matched_insert, "when_not_matched_insert")
        if ins == "all":
            ins = {c: f"s.{c}" for c in payload_cols if c in source.columns}
        bupd = _sqlify(
            when_not_matched_by_source_update, "when_not_matched_by_source_update"
        )
        for spec, what in ((upd, "update"), (bupd, "by-source update")):
            if spec is None:
                continue
            bad = [c for c in spec if c in lkey or c == "ts"]
            if bad:
                raise ValueError(
                    f"cannot assign key/ordering columns {bad}: they define "
                    "row identity (key) and LWW ordering (ts)"
                )
            unknown = [c for c in spec if c not in payload_cols]
            if unknown:
                raise ValueError(
                    f"{what} targets not in the table schema: {unknown} "
                    f"(columns: {sorted(payload_cols)})"
                )
        if ins is not None:
            unknown = [c for c in ins if c not in payload_cols and c != "seq"]
            if unknown:
                raise ValueError(
                    f"insert targets not in the table schema: {unknown} "
                    f"(columns: {sorted(payload_cols)})"
                )
            missing = [c for c in [*lkey, "ts"] if c not in ins]
            if missing:
                raise ValueError(
                    f"when_not_matched_insert must assign the key and ts; "
                    f"missing: {missing}"
                )
        token = str(batch_token) if batch_token is not None else None
        if token is not None and self.is_committed(token):
            return {"skipped": True, "batch_token": token}
        if (
            ins is not None
            and hasattr(source, "groupBy")  # real DataFrame sources only
            and all(k in source.columns for k in lkey)
        ):
            # native MERGE only errors on multiple source rows matching
            # one TARGET row; duplicate NEW keys would silently insert
            # one row per duplicate, permanently breaking the
            # one-row-per-key model (the local sink collapses the same
            # duplicates through its LWW change-event fold).  Refuse
            # loudly -- the error_on_multiple_matches contract extended
            # to the not-matched side.  One bounded job (first offender).
            dup = (
                source.groupBy(*[source[k] for k in lkey])
                .count()
                .filter("count > 1")
                .limit(1)
                .collect()
            )
            if dup:
                key_vals = {k: dup[0][k] for k in lkey}
                raise ValueError(
                    "merge_into source carries duplicate key rows (e.g. "
                    f"{key_vals}): native MERGE would insert one row per "
                    "duplicate for not-matched keys, permanently breaking "
                    "the one-row-per-key model.  Collapse the source to "
                    "one row per key first (e.g. dedup_latest on "
                    "(ts, seq)), as LocalSnapshotSink.merge_into does "
                    "through its LWW fold."
                )
        # per-call view name: concurrent merge_into calls on one
        # SparkSession must not overwrite each other's source between
        # createOrReplaceTempView and the MERGE
        view = f"_fz_merge_src_{uuid.uuid4().hex[:12]}"
        source.createOrReplaceTempView(view)
        try:
            self.spark.sql(
                merge_into_sql(
                    self.table,
                    view,
                    lkey,
                    payload_cols,
                    when_matched_update=upd,
                    when_matched_delete=_sqlify(
                        when_matched_delete, "when_matched_delete"
                    ),
                    when_not_matched_insert=ins,
                    when_not_matched_by_source_update=bupd,
                    when_not_matched_by_source_delete=_sqlify(
                        when_not_matched_by_source_delete,
                        "when_not_matched_by_source_delete",
                    ),
                )
            )
        finally:
            try:  # best-effort cleanup; the view is session-scoped anyway
                self.spark.catalog.dropTempView(view)
            except Exception:
                pass
        if token is not None:
            self._record_token(token)
        return {"skipped": False, "batch_token": token}

    # --------------------------------------------------------------- read
    def read(self, spark: SparkSession, snapshot_id: str | None = None, include_internal: bool = False) -> DataFrame:
        from pyspark.sql import functions as F

        reader = spark.read
        if snapshot_id:
            reader = reader.option("snapshot-id", snapshot_id)
        df = reader.table(self.table).filter(~F.col(INTERNAL_DELETED))
        if not include_internal:
            df = df.drop(INTERNAL_SEQ, INTERNAL_DELETED, INTERNAL_SRC)
        return df

    def rollback(self, snapshot_id: str) -> None:
        self.spark.sql(
            f"CALL fz.system.rollback_to_snapshot('{self.table}', {snapshot_id})"
        )
