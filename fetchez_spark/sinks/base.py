"""Sink interface with Iceberg snapshot semantics.

Two implementations are intended:

* :class:`fetchez_spark.sinks.local_snapshot.LocalSnapshotSink` -- parquet
  data files + JSON manifest chain with an atomic pointer swap.  This is
  what tests and the sandbox bench run: no Iceberg runtime jar ships with
  this pyspark install and no network is assumed (verified; SURVEY.md
  section 7 step 3).
* An Iceberg adapter (``MERGE INTO`` via spark.sql against a HadoopCatalog
  warehouse) selected by config when ``iceberg-spark-runtime`` is on the
  classpath -- same interface, so the engine code does not change.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class SnapshotSink(ABC):
    """Atomic, idempotent, schema-evolving upsert target."""

    @abstractmethod
    def merge(
        self,
        batch: DataFrame,
        batch_token: str,
        offsets: dict[str, Any] | None = None,
    ) -> dict[str, Any]:
        """Dedup + MERGE a change-event batch; commit atomically.

        Must be idempotent on ``batch_token``: re-invoking with a token
        already committed is a no-op (exactly-once under streaming
        restart).  Returns commit metrics (snapshot_id, row counts).
        """

    @abstractmethod
    def is_committed(self, batch_token: str) -> bool: ...

    @abstractmethod
    def read(
        self, spark: SparkSession, snapshot_id: str | None = None, include_internal: bool = False
    ) -> DataFrame:
        """Current (or time-travel) user-facing table state, tombstones filtered."""

    @abstractmethod
    def rollback(self, snapshot_id: str) -> None: ...
