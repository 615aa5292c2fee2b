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
        log_format: str = "parquet",
    ) -> None:
        if log_format not in ("parquet", "orc"):
            raise ValueError(
                f"log_format must be parquet|orc, got {log_format!r} "
                "(text logs go through run_stream(log_format='json'|'csv') "
                "with an explicit schema)"
            )
        self.log_dir = log_dir
        self.schema = schema
        self.batch_files = batch_files
        self.max_files_per_trigger = max_files_per_trigger
        self.selection = selection
        self.log_format = log_format

    def _files(self) -> list[str]:
        return sorted(
            os.path.join(self.log_dir, f)
            for f in os.listdir(self.log_dir)
            if f.endswith(f".{self.log_format}")
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
        # .format().load(list): DataFrameReader.orc does not take *paths
        return self._apply_selection(
            reader.format(self.log_format).load(self._files())
        )

    def read_stream(self, spark: SparkSession) -> DataFrame:
        reader = spark.readStream.schema(self.schema or CHANGE_EVENT_SCHEMA).option(
            "maxFilesPerTrigger", self.max_files_per_trigger
        )
        return self._apply_selection(getattr(reader, self.log_format)(self.log_dir))

    def batches(self, spark: SparkSession) -> list[list[str]]:
        files = self._files()
        k = max(self.batch_files, 1)
        return [files[i : i + k] for i in range(0, len(files), k)]


class OrcLogSource(ParquetLogSource):
    """ORC-files change log: same offset-partitioned tail, ORC footers.

    The realistic producer is another Spark/Hive job (pyarrow's ORC writer
    emits TIMESTAMP_INSTANT, which Spark's ORC reader rejects)."""

    def __init__(self, log_dir: str, **kwargs) -> None:
        kwargs.setdefault("log_format", "orc")
        super().__init__(log_dir, **kwargs)


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
