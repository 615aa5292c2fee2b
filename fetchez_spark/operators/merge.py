"""MERGE semantics: apply a deduped change batch onto existing target rows.

Design: the merge IS the same reduction as the dedup -- union existing rows
(with their persisted ``_seq`` and ``_deleted`` tombstone flags) with the
batch winners, then take max-(ts, _seq) per key.  Consequences:

* a late update (older ts) arriving in a LATER micro-batch still loses to
  the row already in the table (cross-batch last-writer-wins);
* an exact replay of an already-applied batch is a no-op (identical rows,
  idempotent MERGE -- fetchez's skip-if-exists cache,
  /root/reference/src/fetchez/core.py:557-562);
* deletes are retained as tombstones (``_deleted = true``) so that a
  late pre-delete update cannot resurrect a deleted key; user-facing
  reads filter tombstones out.

Missing columns on either side (additive schema evolution) are
null-backfilled via unionByName(allowMissingColumns=True).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fetchez_spark.operators.dedup import dedup_latest
from fetchez_spark.schema import INTERNAL_DELETED, INTERNAL_SEQ, INTERNAL_SRC, KEY_COLUMNS


def batch_to_target_rows(batch: DataFrame) -> DataFrame:
    """Change events -> target-row shape (+ _seq, _deleted, _src), envelope
    dropped.  ``src_partition`` survives as the internal ``_src`` column:
    row-level provenance, and the one-column source of per-partition
    lineage counts (no second scan of the batch)."""
    out = (
        batch.withColumn(INTERNAL_SEQ, F.col("seq"))
        .withColumn(INTERNAL_DELETED, F.col("op") == F.lit("D"))
        .withColumn(
            INTERNAL_SRC,
            F.col("src_partition").cast("int")
            if "src_partition" in batch.columns
            else F.lit(None).cast("int"),
        )
        .drop("op", "seq", "src_partition")
    )
    return out


def merge_into(
    existing: DataFrame | None,
    batch_rows: DataFrame,
    key: list[str] | None = None,
) -> DataFrame:
    """Merge target-shaped batch rows into existing target rows.

    Both inputs carry ``_seq``/``_deleted``.  Returns the new row set for
    the touched partitions (tombstones included -- the sink persists them).
    """
    key = key or KEY_COLUMNS
    if existing is None:
        unioned = batch_rows
    else:
        unioned = existing.unionByName(batch_rows, allowMissingColumns=True)
    return dedup_latest(unioned, key=key, order=["ts", INTERNAL_SEQ])
