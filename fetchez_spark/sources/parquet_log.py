"""Built-in change sources: parquet-backed log + deterministic synthetic.

``ParquetLogSource`` is the offset-partitioned change-log reader (the
engine's `file` module analog, /root/reference/src/fetchez/modules/
path.py:26-86): chunk files sort lexicographically in event order, a
selection prunes files/rows, and ``batches()`` groups files into
deterministic replay batches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from fetchez_spark.schema import CHANGE_EVENT_SCHEMA
from fetchez_spark.sources.base import ChangeSource


class ParquetLogSource(ChangeSource):
    supports_pushdown = True

    def __init__(
        self,
        log_dir: str,
        schema=None,
        batch_files: int = 4,
        max_files_per_trigger: int = 4,
        selection=None,
    ) -> None:
        self.log_dir = log_dir
        self.schema = schema
        self.batch_files = batch_files
        self.max_files_per_trigger = max_files_per_trigger
        self.selection = selection

    def _files(self) -> list[str]:
        return sorted(
            os.path.join(self.log_dir, f)
            for f in os.listdir(self.log_dir)
            if f.endswith(".parquet")
        )

    def _apply_selection(self, df: DataFrame) -> DataFrame:
        if self.selection is not None:
            # pushed into the scan by Catalyst (shows up as PushedFilters)
            df = df.filter(self.selection.predicate())
        return df

    def read(self, spark: SparkSession) -> DataFrame:
        reader = spark.read
        if self.schema is not None:
            reader = reader.schema(self.schema)
        return self._apply_selection(reader.parquet(*self._files()))

    def read_stream(self, spark: SparkSession) -> DataFrame:
        stream = (
            spark.readStream.schema(self.schema or CHANGE_EVENT_SCHEMA)
            .option("maxFilesPerTrigger", self.max_files_per_trigger)
            .parquet(self.log_dir)
        )
        return self._apply_selection(stream)

    def batches(self, spark: SparkSession) -> list[list[str]]:
        files = self._files()
        k = max(self.batch_files, 1)
        return [files[i : i + k] for i in range(0, len(files), k)]


class SyntheticSource(ParquetLogSource):
    """Deterministic generated change log (no external data): writes the
    log on first use, then behaves as a ParquetLogSource."""

    def __init__(self, out_dir: str, num_events: int = 100_000, seed: int = 42,
                 num_chunks: int = 16, **log_kwargs) -> None:
        super().__init__(out_dir, **log_kwargs)
        self.num_events = num_events
        self.seed = seed
        self.num_chunks = num_chunks

    def _ensure(self) -> None:
        from fetchez_spark.changegen import ChangeLogSpec, write_change_log

        if not (os.path.isdir(self.log_dir) and self._files()):
            spec = ChangeLogSpec(num_events=self.num_events, seed=self.seed)
            write_change_log(spec, self.log_dir, num_chunks=self.num_chunks)

    def _files(self) -> list[str]:
        if not os.path.isdir(self.log_dir):
            return []
        return super()._files()

    def read(self, spark):
        self._ensure()
        return super().read(spark)

    def read_stream(self, spark):
        self._ensure()
        return super().read_stream(spark)

    def batches(self, spark):
        self._ensure()
        return super().batches(spark)
