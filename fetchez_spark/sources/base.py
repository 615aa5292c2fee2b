"""Change-source contract -- ``FetchModule`` reimagined.

The reference's module contract is: subclass ``FetchModule``, implement
``run()`` to populate ``self.results`` with entry dicts
(/root/reference/src/fetchez/core.py:1004-1137).  Here a source yields
DataFrames of change events instead of driver-side dict lists: ``read``
for bounded batches, ``read_stream`` for a Structured Streaming tail.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession


class ChangeSource(ABC):
    """A registered producer of change-event DataFrames."""

    #: selection pushdown: keys/time ranges the source can apply natively
    #: (the bbox/time params fetchez ships to servers, e.g. gmrt.py:104-110)
    supports_pushdown = False

    @abstractmethod
    def read(self, spark: SparkSession) -> DataFrame:
        """Bounded read of everything currently available."""

    def read_stream(self, spark: SparkSession) -> DataFrame:
        raise NotImplementedError(f"{type(self).__name__} is batch-only")

    def batches(self, spark: SparkSession) -> list[list[str]]:
        """Optional: deterministic replay batching (file groups)."""
        raise NotImplementedError
