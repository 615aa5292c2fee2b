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

import time
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
    for exactly-once (see module docstring for the idempotence argument)."""

    def __init__(
        self,
        spark: SparkSession,
        table: str,
        key: list[str] | None = None,
        num_buckets: int = 32,
        max_committed_tokens: int = 1024,
        create: bool = True,
    ) -> None:
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
        view = "_fz_batch"
        rows.createOrReplaceTempView(view)
        self.spark.sql(merge_sql(self.table, view, self.key, rows.columns))
        self._record_token(token)
        return {
            "skipped": False,
            "batch_token": token,
            "columns_added": added,
            "seconds": time.monotonic() - t0,
        }

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
