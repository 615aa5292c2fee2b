"""Inline single-entry source -- the ``https`` passthrough module analog.

The reference's ``https`` module turns ONE caller-supplied URL into one
entry dict with no discovery step (HttpDataset,
/root/reference/src/fetchez/core.py:1142-1150 -- it lives in core, not
modules/); the engine analog is a source whose rows come from the recipe
or CLI itself (no storage, no network).  Useful for injecting control
rows, manual corrections, or tiny lookup feeds into the same merge path
as real change logs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fetchez_spark.sources.base import ChangeSource


class InlineSource(ChangeSource):
    """Rows given literally (list of dicts or tuples + optional schema)."""

    def __init__(self, entries: list, schema=None) -> None:
        if not entries:
            raise ValueError("InlineSource needs at least one entry")
        self.entries = entries
        self.schema = schema

    def read(self, spark: SparkSession) -> DataFrame:
        if self.schema is not None:
            return spark.createDataFrame(self.entries, self.schema)
        return spark.createDataFrame(self.entries)

    def batches(self, spark: SparkSession) -> list:
        # one logical batch, already materialized as a DataFrame --
        # replay_batches accepts DataFrames alongside file lists
        return [self.read(spark)]
